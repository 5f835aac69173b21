"""XmlTreeBuilderTest tranche — translated from reference
ksoup-test/.../parser/XmlTreeBuilderTest.kt."""

from ksoup_ray.engine import parser as KP
from ksoup_ray.engine.dom import CDataNode, TextNode


def _strip(s: str) -> str:
    return "".join(line.lstrip(" ") for line in s.split("\n"))


def test_simple_xml_parse_abs():
    xml = ("<doc id=2 href='/bar'>Foo <br /><link>One</link>"
           "<link>Two</link></doc>")
    doc = KP.parse_xml(xml, "http://foo.com/")
    assert _strip(doc.html()) == (
        '<doc id="2" href="/bar">Foo <br /><link>One</link>'
        "<link>Two</link></doc>")
    assert doc.get_element_by_id("2").abs_url("href") == \
        "http://foo.com/bar"


def test_pop_to_close():
    doc = KP.parse_xml("<doc><val>One<val>Two</val></bar>Three</doc>")
    assert _strip(doc.html()) == \
        "<doc><val>One<val>Two</val>Three</val></doc>"


def test_comment_and_doctype():
    doc = KP.parse_xml("<!DOCTYPE HTML><!-- a comment -->One <qux />Two")
    assert _strip(doc.html()) == \
        "<!DOCTYPE HTML><!-- a comment -->One <qux />Two"


def test_does_not_force_self_closing_known_tags():
    html_doc = KP.parse("<br>one</br>")
    assert html_doc.body().html() == "<br>\none\n<br>"
    xml_doc = KP.parse_xml("<br>one</br>")
    assert xml_doc.html() == "<br>one</br>"


def test_handles_xml_declaration_as_declaration():
    doc = KP.parse_xml("<?xml encoding='UTF-8' ?><body>One</body>"
                       "<!-- comment -->")
    assert doc.outer_html() == \
        '<?xml encoding="UTF-8"?><body>One</body><!-- comment -->'
    assert doc.child_nodes()[0].node_name() == "#declaration"
    assert doc.child_nodes()[2].node_name() == "#comment"


def test_does_handle_eof_in_tag():
    doc = KP.parse_xml('<img src=asdf onerror="alert(1)" x=')
    assert doc.html() == '<img src="asdf" onerror="alert(1)" x=""></img>'


def test_parse_declaration_attributes():
    doc = KP.parse_xml("<?xml version='1' encoding='UTF-8' "
                       "something='else'?><val>One</val>")
    decl = doc.child_nodes()[0]
    assert decl.attr("version") == "1"
    assert decl.attr("encoding") == "UTF-8"
    assert decl.attr("something") == "else"
    assert decl.outer_html() == \
        '<?xml version="1" encoding="UTF-8" something="else"?>'


def test_case_sensitive_declaration():
    doc = KP.parse_xml("<?XML version='1' encoding='UTF-8' "
                       "something='else'?>")
    assert doc.outer_html() == \
        '<?XML version="1" encoding="UTF-8" something="else"?>'


def test_preserves_case_by_default():
    doc = KP.parse_xml("<CHECK>One</CHECK><TEST ID=1>Check</TEST>")
    assert _strip(doc.html()) == \
        '<CHECK>One</CHECK><TEST ID="1">Check</TEST>'


def test_disables_pretty_printing_by_default():
    xml = "\n\n<div><one>One</one><one>\n Two</one>\n</div>\n "
    doc = KP.parse_xml(xml)
    assert doc.html() == xml


def test_round_trips_cdata():
    xml = "<div id=1><![CDATA[\n<html>\n <foo><&amp;]]></div>"
    doc = KP.parse_xml(xml)
    div = doc.get_element_by_id("1")
    assert div.text() == "<html>\n <foo><&amp;"
    assert div.children() == []
    assert div.child_node_size() == 1
    assert div.outer_html() == \
        '<div id="1"><![CDATA[\n<html>\n <foo><&amp;]]></div>'
    cdata = div.text_nodes()[0]
    assert isinstance(cdata, CDataNode)
    assert cdata.text() == "\n<html>\n <foo><&amp;"


def test_cdata_preserves_whitespace():
    xml = ('<script type="text/javascript">//<![CDATA[\n\n  foo();\n'
           "//]]></script>")
    doc = KP.parse_xml(xml)
    assert doc.outer_html() == xml
    assert doc.select_first("script").text() == "//\n\n  foo();\n//"


def test_handles_dodgy_xml_decl():
    doc = KP.parse_xml("<?xml version='1.0'><val>One</val>")
    assert doc.select("val")[0].text() == "One"


def test_handles_lt_in_script():
    doc = KP.parse_xml('<script> var a="<?"; var b="?>"; </script>')
    assert doc.html() == \
        '<script> var a="<!--?"; var b="?-->"; </script>'


def test_drops_duplicate_attributes_case_sensitive():
    html = ("<p One=One ONE=Two one=Three One=Four ONE=Five two=Six "
            "two=Seven Two=Eight>Text</p>")
    doc = KP.parse_xml(html)
    assert doc.select_first("p").outer_html() == (
        '<p One="One" ONE="Two" one="Three" two="Six" Two="Eight">'
        "Text</p>")


def test_xml_parser_enables_xml_output_and_escapes():
    doc = KP.parse_xml("<p one='&lt;two&gt;&copy'>Three</p>")
    assert doc.output_settings.syntax == "xml"
    assert doc.html() == '<p one="&lt;two>©">Three</p>'


def test_xml_syntax_escapes_lt_in_attributes():
    from ksoup_ray.engine import entities as E
    doc = KP.parse_xml("<p one='&lt;two&gt;&copy'>Three</p>")
    doc.output_settings.escape_mode = E.ESCAPE_EXTENDED
    doc.output_settings.charset = "ISO-8859-1"
    assert doc.html() == '<p one="&lt;two>©">Three</p>'


def test_custom_tags_are_flyweights():
    doc = KP.parse_xml("<foo>Foo</foo><foo>Foo</foo><FOO>FOO</FOO>"
                       "<FOO>FOO</FOO>")
    els = doc.children()
    t1, t2, t3, t4 = (e.tag for e in els)
    assert t1.name == "foo"
    assert t3.name == "FOO"
    assert t1 is t2
    assert t3 is t4


def test_xml_fragment():
    from ksoup_ray.engine.xmlbuilder import XmlTreeBuilder
    nodes = XmlTreeBuilder().parse_fragment(
        "<one src='/foo/' />Two<three><four /></three>",
        "http://example.com/")
    assert len(nodes) == 3
    assert nodes[0].abs_url("src") == "http://example.com/foo/"
    assert nodes[0].node_name() == "one"
    assert isinstance(nodes[1], TextNode)
    assert nodes[1].text() == "Two"
