"""HtmlParserTest tranche 9 — foreign-content namespaces, quirks mode,
charset fallback/output, and real-fixture cases (reference
parser/HtmlParserTest.kt; fixtures read in place from the reference's
own testResources, never copied)."""

import gzip
import re

from ksoup_ray.engine import parser as KP
from ksoup_ray.engine.dom import normalise_whitespace
from ksoup_ray.engine.tags import (NAMESPACE_HTML, NAMESPACE_MATHML,
                                   NAMESPACE_SVG)

RES = "/root/reference/ksoup-test/testResources/htmltests"


def _strip(s: str) -> str:
    return "".join(line.lstrip(" ") for line in s.split("\n"))


def _nw(s: str) -> str:
    # mirror reference StringUtil.normaliseWhitespace (collapse runs)
    return normalise_whitespace(s.replace("\n", " ")).strip()


def _norm(s: str) -> str:
    # mirror reference TextUtil.normalizeSpaces (strip lines, collapse
    # runs, and collapse inter-tag whitespace: ">\s+<" -> "><")
    return re.sub(r">\s+<", "><", _nw(s))


def test_svg_parse_namespaces():
    html = ("<div><svg viewBox=2><foreignObject><p>One</p>"
            "</foreignObject></svg></div>")
    doc = KP.parse(html)
    assert doc.expect_first("div").tag.namespace == NAMESPACE_HTML
    svg = doc.expect_first("svg")
    assert svg.attributes().has_key("viewBox")
    assert svg.tag.namespace == NAMESPACE_SVG
    assert doc.expect_first("foreignObject").tag.namespace == NAMESPACE_SVG
    assert doc.expect_first("p").tag.namespace == NAMESPACE_HTML
    assert doc.expect_first("div").html() == (
        '<svg viewBox="2">\n <foreignObject>\n  <p>One</p>\n'
        " </foreignObject>\n</svg>")


def test_math_svg_style():
    html = ("<style><img></style><math><svg><style><img></img></style>"
            "</svg></math>")
    doc = KP.parse(html)
    html_style = doc.expect_first("style")
    assert html_style.tag.namespace == NAMESPACE_HTML
    assert html_style.data() == "<img>"  # data, not an element
    svg_style = doc.expect_first("svg style")
    # inherited math namespace: not an HTML integration point
    assert svg_style.tag.namespace == NAMESPACE_MATHML
    img = svg_style.expect_first("img")
    assert img.tag.namespace == NAMESPACE_HTML
    assert doc.expect_first("svg").tag.namespace == NAMESPACE_MATHML
    assert doc.expect_first("math").tag.namespace == NAMESPACE_MATHML


def test_xmlns_attribute_error():
    doc = KP.parse("<p><svg></svg></body>", track_errors=True)
    assert len(doc.error_list) == 0
    doc2 = KP.parse(
        "<html xmlns='http://www.w3.org/1999/xhtml'>"
        "<p xmlns='http://www.w3.org/1999/xhtml'>"
        "<i xmlns='xhtml'></i></body>", track_errors=True)
    assert len(doc2.error_list) == 1


def test_table_in_p_in_quirks_mode():
    html = ("<p><span><table><tbody><tr><td><span>Hello table data"
            "</span></td></tr></tbody></table></span></p>")
    doc = KP.parse(html)
    assert doc.quirks_mode == "quirks"
    assert _norm(doc.body().html()) == html  # quirks allows table in p

    doc = KP.parse("<!DOCTYPE html>" + html)
    assert doc.quirks_mode == "noQuirks"
    assert _norm(doc.body().html()) == (
        "<p><span></span></p><table><tbody><tr><td><span>Hello table "
        "data</span></td></tr></tbody></table><p></p>")


def test_parse_emoji_from_multipoint_encoded():
    html = ("<img multi='&#55357;&#56495;' single='&#128175;' "
            "hexsingle='&#x1f4af;'>")
    doc = KP.parse(html)
    img = doc.expect_first("img")
    assert img.attr("multi") == "\U0001f4af"
    assert img.attr("single") == "\U0001f4af"
    assert img.attr("hexsingle") == "\U0001f4af"
    assert img.outer_html() == ('<img multi="\U0001f4af" '
                                'single="\U0001f4af" '
                                'hexsingle="\U0001f4af">')
    img.owner_document().output_settings.charset = "ISO-8859-1"
    assert img.outer_html() == ('<img multi="&#x1f4af;" '
                                'single="&#x1f4af;" '
                                'hexsingle="&#x1f4af;">')


def test_fallback_to_utf_if_cant_encode():
    raw = b'<html><meta charset="ISO-SSS"/>One</html>'
    doc = KP.parse_bytes(raw)
    assert doc.output_settings.charset.upper() == "UTF-8"
    assert doc.text() == "One"
    assert _strip(doc.outer_html()) == (
        '<html><head><meta charset="ISO-SSS"></head><body>One'
        "</body></html>")


def test_invalid_table_contents_fixture():
    raw = open(f"{RES}/table-invalid-elements.html", "rb").read()
    doc = KP.parse_bytes(raw, charset="UTF-8")
    rendered = doc.outer_html()
    end_of_email = rendered.find("Comment")
    guarantee = rendered.find("Why am I here?")
    assert end_of_email > -1
    assert guarantee > -1
    assert guarantee > end_of_email


def test_xml_decl_and_comments_before_doctype_fixture():
    raw = open(f"{RES}/comments.html", "rb").read()
    doc = KP.parse_bytes(raw, charset="UTF-8")
    assert _nw(doc.html()) == (
        '<!--?xml version="1.0" encoding="utf-8"?--><!-- so --> '
        '<!DOCTYPE html PUBLIC "-//W3C//DTD XHTML 1.0 Transitional//EN" '
        '"http://www.w3.org/TR/xhtml1/DTD/xhtml1-transitional.dtd">'
        '<!-- what --> <html xml:lang="en" lang="en" '
        'xmlns="http://www.w3.org/1999/xhtml"> <!-- now --> <head> '
        "<!-- then --> <meta http-equiv=\"Content-type\" "
        'content="text/html; charset=utf-8"> <title>A Certain Kind of '
        "Test</title> </head> <body> <h1>Hello</h1>h1&gt; (There is a "
        "UTF8 hidden BOM at the top of this file.) </body> </html>")
    assert doc.head().select("title")[0].text() == "A Certain Kind of Test"


def test_character_reader_buffer_fixture():
    raw = gzip.decompress(
        open(f"{RES}/character-reader-buffer.html.gz", "rb").read())
    doc = KP.parse_bytes(raw, charset="UTF-8")
    expected_href = "http://www.domain.com/path?param_one=value&param_two=value"
    links = doc.select("a")
    assert len(links) == 2
    assert links[0].attr("href") == expected_href
    assert links[1].attr("href") == expected_href
