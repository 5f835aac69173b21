"""Second batch of HtmlParserTest translations (expected strings verbatim
from the reference corpus)."""

import re

from ksoup_ray.engine import parser as P


def strip_newlines(text: str) -> str:
    return re.sub(r"\n\s*", "", text)


def test_space_after_tag():
    # HtmlParserTest.kt:163
    doc = P.parse('<div > <a name="top"></a ><p id=1 >Hello</p></div>')
    assert strip_newlines(doc.body().html()) == \
        '<div><a name="top"></a><p id="1">Hello</p></div>'


def test_creates_document_structure():
    # HtmlParserTest.kt:169
    html = ("<meta name=keywords /><link rel=stylesheet /><title>ksoup"
            "</title><p>Hello world</p>")
    doc = P.parse(html)
    head = doc.head()
    body = doc.body()
    assert len(doc.children()) == 1
    assert len(doc.child(0).children()) == 2
    assert len(head.children()) == 3
    assert len(body.children()) == 1


def test_no_table_direct_in_table():
    # HtmlParserTest.kt:329
    doc = P.parse("<table> <td>One <td><table><td>Two</table> "
                  "<table><td>Three")
    assert strip_newlines(doc.body().html()) == (
        "<table><tbody><tr><td>One</td><td><table><tbody><tr><td>Two"
        "</td></tr></tbody></table><table><tbody><tr><td>Three</td>"
        "</tr></tbody></table></td></tr></tbody></table>")


def test_ignores_dupe_end_tr_tag():
    # HtmlParserTest.kt:338
    doc = P.parse("<table><tr><td>One</td><td><table><tr><td>Two</td>"
                  "</tr></tr></table></td><td>Three</td></tr></table>")
    assert strip_newlines(doc.body().html()) == (
        "<table><tbody><tr><td>One</td><td><table><tbody><tr><td>Two"
        "</td></tr></tbody></table></td><td>Three</td></tr></tbody>"
        "</table>")


def test_handles_base_tags():
    # HtmlParserTest.kt:349 — only first base href wins
    h = ("<a href=1>#</a><base href='/2/'><a href='3'>#</a>"
         "<base href='http://bar'><a href=/4>#</a>")
    doc = P.parse(h, "http://foo/")
    anchors = doc.select("a")
    assert len(anchors) == 3
    assert anchors[0].abs_url("href") == "http://foo/2/1"
    assert anchors[1].abs_url("href") == "http://foo/2/3"
    assert anchors[2].abs_url("href") == "http://foo/4"


def test_parses_body_fragment():
    # HtmlParserTest.kt:484
    h = "<!-- comment --><p><a href='foo'>One</a></p>"
    doc = P.parse_body_fragment(h, "http://example.com")
    assert strip_newlines(doc.body().outer_html()) == \
        '<body><!-- comment --><p><a href="foo">One</a></p></body>'
    assert doc.select_first("a").abs_url("href") == \
        "http://example.com/foo"


def test_handles_known_empty_blocks():
    # HtmlParserTest.kt:520 — known tags force end-tag on self-close;
    # unknown tags may self-close
    h = ("<div id='1' /><script src='/foo' /><div id=2><img /><img>"
         "</div><a id=3 /><i /><foo /><foo>One</foo> <hr /> hr text "
         "<hr> hr text two")
    doc = P.parse(h)
    assert strip_newlines(doc.body().html()) == (
        '<div id="1"></div><script src="/foo"></script>'
        '<div id="2"><img><img></div><a id="3"></a><i></i>'
        "<foo /><foo>One</foo><hr> hr text <hr> hr text two")


def test_handles_solidus_at_attribute_end():
    # HtmlParserTest.kt:571
    doc = P.parse("<a href=/>link</a>")
    assert doc.body().html() == '<a href="/">link</a>'


def test_handles_multi_closing_body():
    # HtmlParserTest.kt:579
    doc = P.parse("<body><p>Hello</body><p>there</p></body></body>"
                  "</html><p>now")
    assert len(doc.select("p")) == 3
    assert len(doc.body().children()) == 3


def test_handles_unclosed_definition_lists():
    # HtmlParserTest.kt:587
    doc = P.parse("<dt>Foo<dd>Bar<dt>Qux<dd>Zug")
    assert len(doc.select("dl")) == 0
    assert len(doc.select("dt, dd")) == 4


def test_normalises_document():
    # HtmlParserTest.kt:654
    h = ("<!doctype html>One<html>Two<head>Three<link></head>Four"
         "<body>Five </body>Six </html>Seven ")
    doc = P.parse(h)
    assert strip_newlines(doc.outer_html()) == (
        "<!doctype html><html><head></head><body>OneTwoThree<link>"
        "FourFive Six Seven</body></html>")


def test_normalises_empty_document():
    # HtmlParserTest.kt:664
    doc = P.parse("")
    assert strip_newlines(doc.outer_html()) == \
        "<html><head></head><body></body></html>"


def test_normalises_headless_body():
    # HtmlParserTest.kt:670
    doc = P.parse('<html><body><span class="foo">bar</span>')
    assert strip_newlines(doc.outer_html()) == (
        '<html><head></head><body><span class="foo">bar</span>'
        "</body></html>")


def test_misnested_a_in_divs():
    # HtmlParserTest.kt:783 (whitespace-normalized compare as reference)
    from ksoup_ray.engine.dom import normalise_whitespace
    h = "<a href='#1'><div><div><a href='#2'>child</a></div</div></a>"
    w = ('<a href="#1"></a> <div> <a href="#1"></a> <div> '
         '<a href="#1"></a><a href="#2">child</a> </div> </div>')
    doc = P.parse(h)
    assert normalise_whitespace(doc.body().html()) == \
        normalise_whitespace(w)


def test_handles_misnested_tags_bi():
    # HtmlParserTest.kt:767 — whatwg <b><i></b></i>
    doc = P.parse("<p>1<b>2<i>3</b>4</i>5</p>")
    assert doc.body().html() == "<p>1<b>2<i>3</i></b><i>4</i>5</p>"


def test_handles_misnested_tags_bp():
    # HtmlParserTest.kt:776 — whatwg <b><p></b></p>
    doc = P.parse("<b>1<p>2</b>3</p>")
    assert doc.body().html() == "<b>1</b>\n<p><b>2</b>3</p>"


def test_font_flow_contents():
    # HtmlParserTest.kt:760
    doc = P.parse("<font>Hello <div>there</div> <span>now</span></font>")
    assert strip_newlines(doc.body().html()) == \
        "<font>Hello <div>there</div><span>now</span></font>"


def test_span_positions_roundtrip():
    # spans: source offsets of text nodes in the decoded document
    html = "<p>One</p><div>Two <b>Three</b></div>"
    doc = P.parse(html)
    from ksoup_ray.engine.dom import TextNode
    texts = [n for n in doc.body().node_stream() if isinstance(n, TextNode)]
    for n in texts:
        assert n.span is not None
        start, end = n.span
        assert html[start:end] == n.get_whole_text()


def test_span_positions_entities():
    # spans cover the SOURCE (entity-encoded) range
    html = "<p>A&amp;B</p>"
    doc = P.parse(html)
    from ksoup_ray.engine.dom import TextNode
    tn = [n for n in doc.body().node_stream()
          if isinstance(n, TextNode)][0]
    assert tn.get_whole_text() == "A&B"
    start, end = tn.span
    assert html[start:end] == "A&amp;B"
