"""DocumentTest tranche 2 — accessor vivification, syntax switching,
meta-charset updates (html+xml), equality/clone, frameset body
(reference ksoup-test/.../nodes/DocumentTest.kt remainder)."""

import pytest

from ksoup_ray.engine import parser as KP
from ksoup_ray.engine.dom import Document, XmlDeclaration
from ksoup_ray.engine.treebuilder import ParseSettings

UTF8 = "UTF-8"
ISO = "ISO-8859-1"


def _strip(s: str) -> str:
    return "".join(line.lstrip(" ") for line in s.split("\n"))


def _create_html_document(charset: str) -> Document:
    doc = Document.create_shell("")
    doc.head().append_element("meta").set_attr("charset", charset)
    doc.head().append_element("meta").set_attr("name", "charset") \
        .set_attr("content", charset)
    return doc


def _create_xml_document(version: str, charset: str,
                         add_decl: bool) -> Document:
    doc = Document("")
    doc.append_element("root").set_text("node")
    doc.output_settings.syntax = "xml"
    if add_decl:
        decl = XmlDeclaration("xml", False)
        decl._ensure_attrs().put("version", version)
        decl._ensure_attrs().put("encoding", charset)
        doc.prepend_child(decl)
    return doc


def test_accessors_will_normalize_structure():
    doc = Document("")
    assert doc.html() == ""
    body = doc.body()
    assert body.tag_name() == "body"
    assert doc.head_or_null() is None
    head = doc.head()
    assert head.tag_name() == "head"
    assert _strip(doc.html()) == "<html><head></head><body></body></html>"


def test_accessors_are_case_insensitive():
    doc = KP.parse("<!DOCTYPE html><HTML><HEAD><TITLE>SHOUTY</TITLE>"
                   "</HEAD><BODY>HELLO</BODY></HTML>",
                   settings=ParseSettings(True, True))
    body = doc.body()
    assert body.tag_name() == "BODY"
    assert body.normal_name() == "body"
    head = doc.head()
    assert head.tag_name() == "HEAD"
    root = doc.select_first("html")
    assert root.tag_name() == "HTML"
    assert root.normal_name() == "html"
    assert doc.title() == "SHOUTY"


def test_basic_indent():
    doc = KP.parse("<title>Hello</title> <p>One<p>Two")
    assert doc.html() == (
        "<html>\n <head>\n  <title>Hello</title>\n </head>\n <body>\n"
        "  <p>One</p>\n  <p>Two</p>\n </body>\n</html>")


def test_clones_declarations():
    doc = KP.parse("<!DOCTYPE html><html><head><title>Doctype test")
    clone = doc.clone()
    assert doc.html() == clone.html()
    assert _strip(clone.html()) == (
        "<!doctype html><html><head><title>Doctype test</title></head>"
        "<body></body></html>")


def test_location():
    raw = open("/root/reference/ksoup-test/testResources/htmltests/"
               "basehref.html", "rb").read()
    doc = KP.parse_bytes(raw, base_uri="http://example.com/",
                         charset="UTF-8")
    assert doc.location == "http://example.com/"
    assert doc.base_uri() == "https://example.com/path/file.html?query"
    a = doc.expect_first("a")
    assert a.attr("href") == "./anotherfile.html"
    assert a.abs_url("href") == "https://example.com/path/anotherfile.html"


def test_location_from_string():
    doc = KP.parse("<p>Hello")
    assert doc.location == ""


def test_html_and_xml_syntax():
    h = ("<!DOCTYPE html><body><img async checked='checked' "
         "src='&<>\"'>&lt;&gt;&amp;&quot;<foo />bar")
    doc = KP.parse(h)
    doc.output_settings.syntax = "html"
    assert doc.html() == (
        "<!doctype html>\n<html>\n <head></head>\n <body>\n"
        '  <img async checked src="&amp;<>&quot;">&lt;&gt;&amp;"'
        "<foo />bar\n </body>\n</html>")
    doc.output_settings.syntax = "xml"
    assert doc.html() == (
        "<!DOCTYPE html>\n<html>\n <head></head>\n <body>\n"
        '  <img async="" checked="checked" src="&amp;&lt;>&quot;" />'
        '&lt;&gt;&amp;"<foo />bar\n </body>\n</html>')


def test_html_parse_defaults_to_html_output_syntax():
    doc = KP.parse("x")
    assert doc.output_settings.syntax == "html"


def test_html_no_pretty_print_roundtrip():
    content = ("<html><head><title>Hello</title></head><body><p>One</p>"
               "<p>Two</p></body></html>")
    doc = KP.parse(content)
    doc.output_settings.pretty_print = False
    assert doc.html() == content


def test_overflow_clone():
    parts = ["<head><base href='https://ksoup.org/'>"]
    parts.extend("<div>" for _ in range(100000))
    parts.append("<p>Hello <a href='/example.html'>there</a>")
    doc = KP.parse("".join(parts))
    expected = "https://ksoup.org/example.html"
    assert doc.select_first("a").abs_url("href") == expected
    clone = doc.clone()
    assert doc.has_same_value(clone)
    assert clone.select_first("a").abs_url("href") == expected


def test_documents_with_same_content_are_equal():
    doc_a = KP.parse("<div/>One")
    doc_b = KP.parse("<div/>One")
    doc_c = KP.parse("<div/>Two")
    assert doc_a != doc_b          # identity equality
    assert doc_a == doc_a
    assert hash(doc_a) == hash(doc_a)
    assert hash(doc_a) != hash(doc_c)


def test_documents_with_same_content_are_verifiable():
    doc_a = KP.parse("<div/>One")
    doc_b = KP.parse("<div/>One")
    doc_c = KP.parse("<div/>Two")
    assert doc_a.has_same_value(doc_b)
    assert not doc_a.has_same_value(doc_c)


def test_meta_charset_update_enabled_after_charset_change():
    doc = _create_html_document("dontTouch")
    doc.set_charset(UTF8)
    el = doc.select("meta[charset]")[0]
    assert el.attr("charset") == UTF8
    assert doc.select("meta[name=charset]") == []


def test_meta_charset_update_xml_iso_8859():
    doc = _create_xml_document("1.0", "changeThis", True)
    doc.update_meta_charset_element(True)
    doc.set_charset(ISO)
    assert doc.outer_html() == (
        f'<?xml version="1.0" encoding="{ISO}"?>\n<root>\n node\n</root>')
    decl = doc.child_nodes()[0]
    assert isinstance(decl, XmlDeclaration)
    assert doc.charset().upper() == ISO
    assert decl.attr("encoding") == ISO
    assert doc.charset() == doc.output_settings.charset


def test_meta_charset_update_xml_disabled():
    doc = _create_xml_document("none", "none", False)
    assert doc.outer_html() == "<root>\n node\n</root>"


def test_meta_charset_update_xml_disabled_no_changes():
    doc = _create_xml_document("dontTouch", "dontTouch", True)
    assert doc.outer_html() == (
        '<?xml version="dontTouch" encoding="dontTouch"?>\n'
        "<root>\n node\n</root>")
    decl = doc.child_nodes()[0]
    assert isinstance(decl, XmlDeclaration)
    assert decl.attr("encoding") == "dontTouch"
    assert decl.attr("version") == "dontTouch"


def test_meta_charset_update_disabled_per_default():
    doc = _create_html_document("none")
    assert doc.update_meta_charset is False


def test_shift_jis_roundtrip():
    raw = ('<html><head><meta http-equiv="content-type" '
           'content="text/html; charset=Shift_JIS" /></head><body>'
           "before&nbsp;after</body></html>").encode()
    doc = KP.parse_bytes(raw, base_uri="http://example.com")
    doc.output_settings.escape_mode = "xhtml"
    output = doc.html().encode(doc.charset(), errors="replace").decode(
        doc.charset())
    assert "?" not in output, "Should not have contained a '?'."
    assert "&#xa0;" in output or "&nbsp;" in output


def test_frameset_supports_body_method():
    doc = KP.parse("<html><head><title>Frame Test</title></head>"
                   "<frameset id=id><frame src=foo.html></frameset>")
    assert doc.head() is not None
    assert doc.title() == "Frame Test"
    assert doc.select_first("body") is None
    frameset = doc.select_first("frameset")
    assert frameset is not None
    body = doc.body()
    assert body is frameset
    assert body.children()[0].tag_name() == "frame"
    assert doc.select_first("body") is None  # did not vivify a body
    assert doc.html() == (
        "<html>\n <head>\n  <title>Frame Test</title>\n </head>\n"
        ' <frameset id="id">\n  <frame src="foo.html">\n </frameset>\n'
        "</html>")


def test_expect_form():
    doc = KP.parse("<body><div name=form></div><form id=1 name=form>"
                   "<input name=foo></form><form id=2><input name=bar>")
    assert doc.expect_form("[name=form]").id() == "1"  # not the div
    assert doc.expect_form("form").id() == "1"
    assert doc.expect_form("form:has([name=bar])").id() == "2"
    with pytest.raises(ValueError):
        doc.expect_form("div")
