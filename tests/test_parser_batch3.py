"""HtmlParserTest tranche 3 — translated from reference
ksoup-test/.../parser/HtmlParserTest.kt (handlesUnclosedAnchors:834
through handlesManyChildren:1274 and selected later cases)."""

import re
import time

from ksoup_ray.engine import parser as KP
from ksoup_ray.engine import entities as E
from ksoup_ray.engine.dom import FormElement


def _strip(s: str) -> str:
    return "".join(line.lstrip(" ") for line in s.split("\n"))


def _norm(s: str) -> str:
    return re.sub(r"\s+", " ", s).strip()


def test_handles_unclosed_anchors():
    doc = KP.parse("<a href='http://example.com/'>Link<p>Error link</a>")
    assert doc.body().html() == (
        '<a href="http://example.com/">Link</a>\n'
        '<p><a href="http://example.com/">Error link</a></p>')


def test_reconstruct_formatting_elements_in_table():
    h = ("<p><b>One</p> <table><tr><td><p><i>Three<p>Four</i></td></tr>"
         "</table> <p>Five</p>")
    doc = KP.parse(h)
    assert _strip(doc.body().html()) == (
        "<p><b>One</b></p><b><table><tbody><tr><td><p><i>Three</i></p>"
        "<p><i>Four</i></p></td></tr></tbody></table><p>Five</p></b>")


def test_comment_before_html():
    doc = KP.parse("<!-- comment --><!-- comment 2 --><p>One</p>")
    assert _strip(doc.outer_html()) == (
        "<!-- comment --><!-- comment 2 --><html><head></head><body>"
        "<p>One</p></body></html>")


def test_handles_solidus_in_a():
    doc = KP.parse("<a class=lp href=/lib/14160711/>link text</a>")
    a = doc.select("a")[0]
    assert a.text() == "link text"
    assert a.attr("href") == "/lib/14160711/"


def test_handles_span_in_tbody():
    doc = KP.parse("<table><tbody><span class='1'><tr><td>One</td></tr>"
                   "<tr><td>Two</td></tr></span></tbody></table>")
    assert doc.select("span")[0].children() == []
    assert len(doc.select("table")) == 1


def test_handles_unclosed_title_at_eof():
    assert KP.parse("<title>Data").title() == "Data"
    assert KP.parse("<title>Data<").title() == "Data<"
    assert KP.parse("<title>Data</").title() == "Data</"
    assert KP.parse("<title>Data</t").title() == "Data</t"
    assert KP.parse("<title>Data</ti").title() == "Data</ti"
    assert KP.parse("<title>Data</title>").title() == "Data"
    assert KP.parse("<title>Data</title >").title() == "Data"


def test_handles_unclosed_title():
    one = KP.parse("<title>One <b>Two <b>Three</TITLE><p>Test</p>")
    assert one.title() == "One <b>Two <b>Three"
    assert one.select("p")[0].text() == "Test"
    two = KP.parse("<title>One<b>Two <p>Test</p>")
    assert two.title() == "One"
    assert two.body().html() == "<b>Two \n <p>Test</p></b>"


def test_handles_unclosed_script_at_eof():
    def data(h):
        return KP.parse(h).select("script")[0].data()
    assert data("<script>Data") == "Data"
    assert data("<script>Data<") == "Data<"
    assert data("<script>Data</sc") == "Data</sc"
    assert data("<script>Data</-sc") == "Data</-sc"
    assert data("<script>Data</sc-") == "Data</sc-"
    assert data("<script>Data</sc--") == "Data</sc--"
    assert data("<script>Data</script>") == "Data"
    assert data("<script>Data</script ") == "Data"


def test_no_implicit_form_for_textareas():
    doc = KP.parse("<textarea>One</textarea>")
    assert doc.body().html() == "<textarea>One</textarea>"


def test_handles_escaped_script():
    doc = KP.parse("<script><!-- one <script>Blah</script> --></script>")
    assert doc.select("script")[0].data() == \
        "<!-- one <script>Blah</script> -->"


def test_handles_0_character_as_text():
    doc = KP.parse("0<p>0</p>")
    assert doc.body().html() == "0\n<p>0</p>"


def test_handles_null_in_comments():
    doc = KP.parse("<body><!-- \x00 \x00 -->")
    assert doc.body().html() == "<!-- � � -->"


def test_handles_newlines_and_whitespace_in_tag():
    doc = KP.parse('<a \n href="one" \r\n id="two" \f >')
    assert doc.body().html() == '<a href="one" id="two"></a>'


def test_handles_whitespace_in_doctype():
    html = ('<!DOCTYPE html\n'
            '      PUBLIC "-//W3C//DTD XHTML 1.0 Transitional//EN"\n'
            '      "http://www.w3.org/TR/xhtml1/DTD/'
            'xhtml1-transitional.dtd">')
    doc = KP.parse(html)
    assert doc.child_nodes()[0].outer_html() == (
        '<!DOCTYPE html PUBLIC "-//W3C//DTD XHTML 1.0 Transitional//EN" '
        '"http://www.w3.org/TR/xhtml1/DTD/xhtml1-transitional.dtd">')


def test_handles_comments_in_table():
    node = KP.parse_body_fragment(
        "<table><tr><td>text</td><!-- Comment --></tr></table>")
    assert _strip(node.outer_html()) == (
        "<html><head></head><body><table><tbody><tr><td>text</td>"
        "<!-- Comment --></tr></tbody></table></body></html>")


def test_handles_quotes_in_comments_in_scripts():
    html = ("<script>\n  <!--\n    document.write('</scr' + 'ipt>');\n"
            "  // -->\n</script>")
    node = KP.parse_body_fragment(html)
    assert node.body().html() == html


def test_handle_null_context_in_parse_fragment():
    nodes = KP.parse_fragment("<ol><li>One</li></ol><p>Two</p>", None,
                              "http://example.com/")
    assert len(nodes) == 1
    assert nodes[0].node_name() == "html"
    assert _norm(nodes[0].outer_html()) == (
        "<html> <head></head> <body> <ol> <li>One</li> </ol> "
        "<p>Two</p> </body> </html>")


def test_does_not_find_shortest_matching_entity():
    doc = KP.parse("One &clubsuite; &clubsuit;")
    assert _norm(doc.body().html()) == "One &amp;clubsuite; ♣"


def test_relaxed_base_entity_match_and_strict_extended_match():
    doc = KP.parse("&amp &quot &reg &icy &hopf &icy; &hopf;")
    doc.output_settings.escape_mode = E.ESCAPE_EXTENDED
    doc.output_settings.charset = "ISO-8859-1"
    assert doc.body().html() == '&amp; " ® &amp;icy &amp;hopf &icy; &hopf;'


def test_handles_xml_declaration_as_bogus_comment():
    doc = KP.parse("<?xml encoding='UTF-8' ?><body>One</body>")
    assert _norm(doc.outer_html()) == (
        "<!--?xml encoding='UTF-8' ?--> <html> <head></head> <body> "
        "One </body> </html>")


def test_handles_tags_in_textarea():
    doc = KP.parse("<textarea><p>Ksoup</p></textarea>")
    assert doc.body().html() == \
        "<textarea>&lt;p&gt;Ksoup&lt;/p&gt;</textarea>"


def test_creates_form_elements():
    doc = KP.parse("<body><form><input id=1><input id=2></form></body>")
    el = doc.select("form")[0]
    assert isinstance(el, FormElement)
    assert [c.id() for c in el.form_elements] == ["1", "2"]


def test_associated_form_controls_with_disjoint_forms():
    doc = KP.parse("<table><tr><form><input type=hidden id=1><td>"
                   "<input type=text id=2></td><tr></table>")
    el = doc.select("form")[0]
    assert isinstance(el, FormElement)
    assert [c.id() for c in el.form_elements] == ["1", "2"]
    assert _strip(doc.body().html()) == (
        '<table><tbody><tr><form></form><input type="hidden" id="1">'
        '<td><input type="text" id="2"></td></tr><tr></tr></tbody>'
        '</table>')


def test_handles_input_in_table():
    h = ('<body>\n<input type="hidden" name="a" value="">\n<table>\n'
         '<input type="hidden" name="b" value="" />\n</table>\n</body>')
    doc = KP.parse(h)
    assert len(doc.select("table input")) == 1
    assert len(doc.select("input")) == 2


def test_converts_image_to_img():
    doc = KP.parse("<body><image><svg><image /></svg></body>")
    assert doc.body().html() == "<img>\n<svg>\n <image />\n</svg>"


def test_handles_invalid_doctypes():
    doc = KP.parse("<!DOCTYPE>")
    assert _norm(doc.outer_html()) == \
        "<!doctype> <html> <head></head> <body></body> </html>"
    doc = KP.parse("<!DOCTYPE><html><p>Foo</p></html>")
    assert _norm(doc.outer_html()) == \
        "<!doctype> <html> <head></head> <body> <p>Foo</p> </body> </html>"
    doc = KP.parse("<!DOCTYPE \x00>")
    assert _norm(doc.outer_html()) == \
        "<!doctype �> <html> <head></head> <body></body> </html>"


def test_handles_many_children():
    long_body = "".join(f"{i}<br>" for i in range(25000))
    t0 = time.time()
    doc = KP.parse_body_fragment(long_body)
    assert doc.body().child_node_size() == 50000
    assert time.time() - t0 < 3.0


def test_empty_td_tag():
    doc = KP.parse("<table><tr><td>One</td><td id='2' /></tr></table>")
    assert doc.select("tr")[0].html() == '<td>One</td>\n<td id="2"></td>'


def test_self_closing_void_is_not_an_error():
    from ksoup_ray.engine.safety import Safelist
    html = "<p>test<br/>test<br/></p>"
    doc = KP.parse(html, track_errors=True)
    assert doc.parse_errors == 0
    assert KP.is_valid(html, Safelist.basic())
    assert KP.clean(html, Safelist.basic()) == "<p>test<br>\n test<br></p>"


def test_self_closing_on_nonvoid_is_error():
    from ksoup_ray.engine.safety import Safelist
    html = "<p>test</p>\n\n<div /><div>Two</div>"
    doc = KP.parse(html, track_errors=True)
    assert doc.parse_errors == 1
    assert not KP.is_valid(html, Safelist.relaxed())
    assert _norm(KP.clean(html, Safelist.relaxed())) == \
        "<p>test</p> <div></div> <div> Two </div>"


def test_normalizes_discordant_tags():
    doc = KP.parse("<div>test</DIV><p></p>")
    assert doc.body().html() == "<div>\n test\n</div>\n<p></p>"


def test_html_close():
    doc = KP.parse("<body><div>one</div></body></html><p>Hello")
    assert doc.select("p")[0].text() == "Hello"


def test_whole_text_treats_br_as_newline():
    doc = KP.parse("<div>One<br>Two<p>Three</p></div>")
    assert doc.whole_text() == "One\nTwoThree"
