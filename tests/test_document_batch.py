"""DocumentTest tranche — translated from reference
ksoup-test/.../nodes/DocumentTest.kt."""

from ksoup_ray.engine import parser as KP
from ksoup_ray.engine import entities as E
from ksoup_ray.engine.dom import Document, XmlDeclaration


def test_set_text_preserves_document_structure():
    doc = KP.parse("<p>Hello</p>")
    doc.set_text("Replaced")
    assert doc.text() == "Replaced"
    assert doc.body().text() == "Replaced"
    assert len(doc.select("head")) == 1


def test_titles():
    no_title = KP.parse("<p>Hello</p>")
    with_title = KP.parse("<title>First</title><title>Ignore</title>"
                          "<p>Hello</p>")
    assert no_title.title() == ""
    no_title.set_title("Hello")
    assert no_title.title() == "Hello"
    assert no_title.select("title")[0].text() == "Hello"
    assert with_title.title() == "First"
    with_title.set_title("Hello")
    assert with_title.title() == "Hello"
    assert with_title.select("title")[0].text() == "Hello"
    normalise = KP.parse("<title>   Hello\nthere   \n   now   \n")
    assert normalise.title() == "Hello there now"


def test_output_encoding():
    doc = KP.parse("<p title=π>π & < > </p>")
    assert doc.body().html() == '<p title="π">π &amp; &lt; &gt;</p>'
    assert doc.output_settings.charset.upper() == "UTF-8"
    doc.output_settings.charset = "ISO-8859-1"
    assert doc.output_settings.escape_mode == E.ESCAPE_BASE
    assert doc.body().html() == \
        '<p title="&#x3c0;">&#x3c0; &amp; &lt; &gt;</p>'
    doc.output_settings.escape_mode = E.ESCAPE_EXTENDED
    assert doc.body().html() == '<p title="&pi;">&pi; &amp; &lt; &gt;</p>'


def test_xhtml_references():
    doc = KP.parse("&lt; &gt; &amp; &quot; &apos; &times;")
    doc.output_settings.escape_mode = E.ESCAPE_XHTML
    assert doc.body().html() == "&lt; &gt; &amp; \" ' ×"


def test_normalises_structure():
    doc = KP.parse("<html><head><script>one</script><noscript><p>two</p>"
                   "</noscript></head><body><p>three</p></body>"
                   "<p>four</p></html>")
    assert "".join(line.lstrip(" ") for line in doc.html().split("\n")) \
        == ("<html><head><script>one</script><noscript>&lt;p&gt;two"
            "</noscript></head><body><p>three</p><p>four</p></body>"
            "</html>")


def test_meta_charset_update_utf8():
    doc = _create_html_document("changeThis")
    doc.update_meta_charset_element(True)
    doc.set_charset("UTF-8")
    expect = ('<html>\n <head>\n  <meta charset="UTF-8">\n </head>\n'
              " <body></body>\n</html>")
    assert doc.outer_html() == expect
    meta = doc.select("meta[charset]")[0]
    assert doc.charset() == "UTF-8"
    assert meta.attr("charset") == "UTF-8"


def test_meta_charset_update_iso8859():
    doc = _create_html_document("changeThis")
    doc.update_meta_charset_element(True)
    doc.set_charset("ISO-8859-1")
    expect = ('<html>\n <head>\n  <meta charset="ISO-8859-1">\n </head>\n'
              " <body></body>\n</html>")
    assert doc.outer_html() == expect
    meta = doc.select("meta[charset]")[0]
    assert doc.charset() == "ISO-8859-1"
    assert meta.attr("charset") == "ISO-8859-1"


def test_meta_charset_update_no_charset():
    doc = Document.create_shell("")
    doc.update_meta_charset_element(True)
    doc.set_charset("UTF-8")
    assert doc.select("meta[charset]")[0].attr("charset") == "UTF-8"
    expect = ('<html>\n <head>\n  <meta charset="UTF-8">\n </head>\n'
              " <body></body>\n</html>")
    assert doc.outer_html() == expect


def test_meta_charset_update_disabled():
    doc = Document.create_shell("")
    expect = "<html>\n <head></head>\n <body></body>\n</html>"
    assert doc.outer_html() == expect
    assert doc.select("meta[charset]") == []


def test_meta_charset_update_disabled_no_changes():
    doc = _create_html_document("dontTouch")
    expect = ('<html>\n <head>\n  <meta charset="dontTouch">\n'
              '  <meta name="charset" content="dontTouch">\n </head>\n'
              " <body></body>\n</html>")
    assert doc.outer_html() == expect
    meta = doc.select("meta[charset]")[0]
    assert meta.attr("charset") == "dontTouch"
    meta = doc.select("meta[name=charset]")[0]
    assert meta.attr("content") == "dontTouch"


def test_meta_charset_update_cleanup():
    doc = _create_html_document("dontTouch")
    doc.update_meta_charset_element(True)
    doc.set_charset("UTF-8")
    expect = ('<html>\n <head>\n  <meta charset="UTF-8">\n </head>\n'
              " <body></body>\n</html>")
    assert doc.outer_html() == expect


def test_meta_charset_update_xml_utf8():
    doc = _create_xml_document("1.0", "changeThis", True)
    doc.update_meta_charset_element(True)
    doc.set_charset("UTF-8")
    expect = ('<?xml version="1.0" encoding="UTF-8"?>\n'
              "<root>\n node\n</root>")
    assert doc.outer_html() == expect
    decl = doc.child_nodes()[0]
    assert decl.attr("encoding") == "UTF-8"
    assert decl.attr("version") == "1.0"


def test_meta_charset_update_xml_no_charset():
    doc = _create_xml_document("none", "none", False)
    doc.update_meta_charset_element(True)
    doc.set_charset("UTF-8")
    expect = ('<?xml version="1.0" encoding="UTF-8"?>\n'
              "<root>\n node\n</root>")
    assert doc.outer_html() == expect
    decl = doc.child_nodes()[0]
    assert decl.attr("encoding") == "UTF-8"
    assert decl.attr("version") == "1.0"


def _create_html_document(charset: str) -> Document:
    doc = Document.create_shell("")
    head = doc.head()
    head.append_element("meta").set_attr("charset", charset)
    m = head.append_element("meta")
    m.set_attr("name", "charset")
    m.set_attr("content", charset)
    return doc


def _create_xml_document(version, charset, with_decl) -> Document:
    doc = Document("")
    doc.append_element("root").set_text("node")
    doc.output_settings.syntax = "xml"
    doc.output_settings.pretty_print = True
    if with_decl:
        decl = XmlDeclaration("xml", False)
        decl._ensure_attrs().put("version", version)
        decl._ensure_attrs().put("encoding", charset)
        doc.prepend_child(decl)
    return doc


def test_document_type_get():
    html = "<!DOCTYPE html><p>One</p>"
    doc = KP.parse(html)
    dt = doc.document_type()
    assert dt is not None
    assert dt.name == "html"


def test_forms():
    doc = KP.parse("<body><form id=1><input name=one></form>"
                   "<form id=2><input name=two></form></body>")
    forms = doc.forms()
    assert len(forms) == 2
    assert forms[0].id() == "1"


def test_clone_document():
    doc = KP.parse("<title>Hello</title> <p>One<p>Two")
    clone = doc.clone()
    assert "".join(line.lstrip(" ") for line in clone.html().split("\n")) \
        == ("<html><head><title>Hello</title></head><body><p>One</p>"
            "<p>Two</p></body></html>")
    clone.set_title("Hello there")
    clone.expect_first("p").set_text("One more").set_attr("id", "1")
    assert "".join(line.lstrip(" ") for line in doc.html().split("\n")) \
        == ("<html><head><title>Hello</title></head><body><p>One</p>"
            "<p>Two</p></body></html>")
