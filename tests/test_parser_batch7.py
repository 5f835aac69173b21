"""HtmlParserTest tranche 7 — case preservation / frames / error
tracking, translated from reference HtmlParserTest.kt. Error messages
are engine-specific; counts and key substrings are asserted."""

from ksoup_ray.engine import parser as KP
from ksoup_ray.engine.dom import Comment, normalise_whitespace
from ksoup_ray.engine.treebuilder import PRESERVE_CASE, ParseSettings


def _strip(s: str) -> str:
    return "".join(line.lstrip(" ") for line in s.split("\n"))


def test_retains_attributes_of_different_case_if_sensitive():
    html = "<p One=One One=Two one=Three two=Four two=Five Two=Six>Text</p>"
    doc = KP.parse(html, settings=PRESERVE_CASE)
    assert doc.select_first("p").outer_html() == \
        '<p One="One" one="Three" two="Four" Two="Six">Text</p>'


def test_all_dash_comments_are_not_parse_errors():
    doc = KP.parse("<!------>", track_errors=True)
    comment = doc.child_nodes()[0]
    assert isinstance(comment, Comment)
    assert comment.get_data() == "--"
    assert len(doc.error_list) == 0


def test_handles_whatwg_expenses_table_example():
    doc = KP.parse(
        "<table> <colgroup> <col> <colgroup> <col> <col> <col> <thead> "
        "<tr> <th> <th>2008 <th>2007 <th>2006 <tbody> <tr> <th "
        "scope=rowgroup> Research and development <td> $ 1,109 <td> $ 782 "
        "<td> $ 712 <tr> <th scope=row> Percentage of net sales <td> 3.4% "
        "<td> 3.3% <td> 3.7% <tbody> <tr> <th scope=rowgroup> Selling, "
        "general, and administrative <td> $ 3,761 <td> $ 2,963 <td> "
        "$ 2,433 <tr> <th scope=row> Percentage of net sales <td> 11.6% "
        "<td> 12.3% <td> 12.6% </table>")
    assert _strip(doc.body().html()) == (
        "<table><colgroup><col></colgroup><colgroup><col><col><col>"
        "</colgroup><thead><tr><th></th><th>2008</th><th>2007</th>"
        '<th>2006</th></tr></thead><tbody><tr><th scope="rowgroup">'
        "Research and development</th><td>$ 1,109</td><td>$ 782</td>"
        '<td>$ 712</td></tr><tr><th scope="row">Percentage of net sales'
        "</th><td>3.4%</td><td>3.3%</td><td>3.7%</td></tr></tbody><tbody>"
        '<tr><th scope="rowgroup">Selling, general, and administrative'
        "</th><td>$ 3,761</td><td>$ 2,963</td><td>$ 2,433</td></tr><tr>"
        '<th scope="row">Percentage of net sales</th><td>11.6%</td>'
        "<td>12.3%</td><td>12.6%</td></tr></tbody></table>")


def test_handles_frames():
    h = ("<html><head><script></script><noscript></noscript></head>"
         "<frameset><frame src=foo></frame><frame src=foo></frameset>"
         "</html>")
    doc = KP.parse(h)
    assert _strip(doc.html()) == (
        "<html><head><script></script><noscript></noscript></head>"
        '<frameset><frame src="foo"><frame src="foo"></frameset></html>')
    # no body auto vivification


def test_ignores_content_after_frameset():
    h = ("<html><head><title>One</title></head><frameset><frame />"
         "<frame /></frameset><table></table></html>")
    doc = KP.parse(h)
    assert _strip(doc.html()) == (
        "<html><head><title>One</title></head><frameset><frame><frame>"
        "</frameset></html>")


def test_normalised_body_after_content():
    doc = KP.parse(
        "<font face=Arial><body class=name><div>One</div></body></font>")
    assert _strip(doc.html()) == (
        '<html><head></head><body class="name"><font face="Arial">'
        "<div>One</div></font></body></html>")


def test_tracks_errors_when_requested():
    html = ("<p>One</p href='no'>\n<!DOCTYPE html>\n&arrgh;<font />&#33 "
            "&amp &#x110000;<br /></div><foo")
    doc = KP.parse(html, "http://example.com", track_errors=True)
    errors = doc.error_list
    assert len(errors) == 9
    joined = "\n".join(errors)
    assert "Attributes incorrectly present on end tag" in joined
    assert "invalid named reference [arrgh]" in joined
    assert "cannot be self closing" in joined
    assert "missing semicolon on [&#33]" in joined
    assert "missing semicolon on [&amp]" in joined


def test_no_errors_by_default():
    html = "<p>One</p href='no'>&arrgh;<font /><br /><foo"
    doc = KP.parse(html, "http://example.com")
    assert len(doc.error_list) == 0


def test_optional_p_closers_are_not_errors():
    doc = KP.parse("<body><div><p>One<p>Two</div></body>",
                   track_errors=True)
    assert len(doc.error_list) == 0


def test_can_preserve_tag_case():
    doc = KP.parse("<div id=1><SPAN ID=2>",
                   settings=ParseSettings(True, False))
    assert normalise_whitespace(doc.outer_html()) == (
        '<html> <head></head> <body> <div id="1"> <SPAN id="2"></SPAN> '
        "</div> </body> </html>")
    div = doc.select_first("#1")
    div.after_html("<TaG ID=one>One</TaG>")
    assert _strip(div.next_element_sibling().outer_html()) == \
        '<TaG id="one">One</TaG>'


def test_can_preserve_attribute_case():
    doc = KP.parse("<div id=1><SPAN ID=2>",
                   settings=ParseSettings(False, True))
    assert normalise_whitespace(doc.outer_html()) == (
        '<html> <head></head> <body> <div id="1"> <span ID="2"></span> '
        "</div> </body> </html>")
    div = doc.select_first("#1")
    div.after_html("<TaG ID=one>One</TaG>")
    assert _strip(div.next_element_sibling().outer_html()) == \
        '<tag ID="one">One</tag>'


def test_can_preserve_both_case():
    doc = KP.parse("<div id=1><SPAN ID=2>",
                   settings=ParseSettings(True, True))
    assert normalise_whitespace(doc.outer_html()) == (
        '<html> <head></head> <body> <div id="1"> <SPAN ID="2"></SPAN> '
        "</div> </body> </html>")
    div = doc.select_first("#1")
    div.after_html("<TaG ID=one>One</TaG>")
    assert _strip(div.next_element_sibling().outer_html()) == \
        '<TaG ID="one">One</TaG>'


def test_case_sensitive_parse_tree():
    doc = KP.parse("<r><X>A</X><y>B</y></r>", settings=PRESERVE_CASE)
    assert normalise_whitespace(doc.body().html()) == \
        "<r> <X> A </X> <y> B </y> </r>"


def test_case_insensitive_parse_tree():
    doc = KP.parse("<r><X>A</X><y>B</y></r>")
    assert normalise_whitespace(doc.body().html()) == \
        "<r> <x> A </x> <y> B </y> </r>"


def test_preserved_case_links_cant_nest():
    doc = KP.parse("<A>ONE <A>Two</A></A>", settings=PRESERVE_CASE)
    assert doc.body().html() == "<A>ONE </A><A>Two</A>"


def test_handle_content_after_body():
    html = "<body>One</body>  <p>Hello!</p></html> <p>There</p>"
    doc = KP.parse(html)
    doc.output_settings.pretty_print = False
    assert doc.outer_html() == ("<html><head></head><body>One<p>Hello!</p>"
                                "<p>There</p></body>  </html> ")


def test_errors_before_html():
    doc = KP.parse("<!doctype html><!doctype something></div>",
                   track_errors=True)
    assert len(doc.error_list) == 2
    assert _strip(doc.html()) == \
        "<!doctype html><html><head></head><body></body></html>"


def test_error_on_eof_if_open():
    doc = KP.parse("<div>", track_errors=True)
    assert len(doc.error_list) == 1
