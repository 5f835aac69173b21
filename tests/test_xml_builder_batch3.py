"""XmlTreeBuilderTest batch 3 — remaining cases translated from
reference ksoup-test/.../parser/XmlTreeBuilderTest.kt."""

from ksoup_ray.engine import parser as KP
from ksoup_ray.engine.charset import decode_html, detect_charset
from ksoup_ray.engine.dom import Document, XmlDeclaration
from ksoup_ray.engine.elements import Elements
from ksoup_ray.engine.parser import parse_xml
from ksoup_ray.engine.tags import NAMESPACE_XML
from ksoup_ray.engine.treebuilder import HTML_DEFAULT
from ksoup_ray.engine.xmlbuilder import XmlTreeBuilder


def _strip(s: str) -> str:
    return "".join(line.lstrip(" ") for line in s.split("\n"))


def test_xml_parse_defaults_to_xml_output_syntax():
    doc = parse_xml("x")
    assert doc.output_settings.syntax == "xml"


def test_detect_charset_encoding_declaration():
    xml_charset = ('<?xml version="1.0" encoding="ISO-8859-1"?>\n'
                   "<data>äöåéü</data>")
    raw = xml_charset.encode("iso-8859-1")
    charset, bom_len = detect_charset(raw)
    assert charset.upper() == "ISO-8859-1"
    text, used = decode_html(raw)
    doc = parse_xml(text, "http://example.com/")
    doc.output_settings.charset = used
    assert doc.charset().upper() == "ISO-8859-1"
    assert _strip(doc.html()) == \
        '<?xml version="1.0" encoding="ISO-8859-1"?><data>äöåéü</data>'


def test_parse_declaration_without_attributes():
    xml = ('<?xml version="1.0" encoding="utf-8"?>\n'
           "<?myProcessingInstruction My Processing instruction.?>")
    doc = parse_xml(xml)
    decl = doc.child_nodes()[2]
    assert isinstance(decl, XmlDeclaration)
    assert decl.value == "myProcessingInstruction"
    assert decl.has_attr("My")
    assert decl.outer_html() == \
        "<?myProcessingInstruction My Processing instruction.?>"


def test_creates_valid_prolog():
    document = Document.create_shell("")
    document.output_settings.syntax = "xml"
    document.set_charset("UTF-8")
    assert document.outer_html() == (
        '<?xml version="1.0" encoding="UTF-8"?>\n'
        "<html>\n"
        " <head></head>\n"
        " <body></body>\n"
        "</html>")


def test_append_preserves_case_by_default():
    doc = parse_xml("<One>One</One>")
    one = Elements(doc.select("One"))
    one.append('<Two ID=2>Two</Two>')
    assert _strip(doc.html()) == '<One>One<Two ID="2">Two</Two></One>'


def test_can_normalize_case():
    tb = XmlTreeBuilder(settings=HTML_DEFAULT)
    doc = tb.parse("<TEST ID=1>Check</TEST>")
    assert _strip(doc.html()) == '<test id="1">Check</test>'


def test_normalizes_discordant_tags():
    tb = XmlTreeBuilder(settings=HTML_DEFAULT)
    doc = tb.parse("<div>test</DIV><p></p>")
    assert doc.html() == "<div>test</div><p></p>"


def test_xml_output_corrects_invalid_attribute_names():
    xml = '<body style="color: red" " name"><div =""></div></body>'
    doc = parse_xml(xml)
    assert doc.output_settings.syntax == "xml"
    assert doc.html() == \
        '<body style="color: red" _="" name_=""><div _=""></div></body>'


def test_root_has_xml_settings():
    doc = parse_xml("<foo>")
    settings = doc.parser.settings
    assert settings.preserve_tag_case
    assert settings.preserve_attr_case


def test_xml_namespace():
    xml = "<foo><bar><div><svg><math>Qux</bar></foo>"
    doc = parse_xml(xml)

    def assert_ns(el):
        assert el.tag.namespace == NAMESPACE_XML, \
            f"Element {el.tag_name()} not in XML namespace"

    for el in doc.select("*"):
        assert_ns(el)
    clone = doc.clone()
    assert_ns(clone.expect_first("bar"))


def test_supply_parser_to_data_stream():
    # XmlTreeBuilderTest testSupplyParserToDataStream: bytes -> XML doc
    raw = '<doc><val>One<val>Two</val></bar>Three</doc>'.encode()
    from ksoup_ray.engine.charset import decode_html
    text, _ = decode_html(raw)
    doc = parse_xml(text, "http://foo.com")
    assert "".join(line.lstrip(" ") for line in doc.html().split("\n")) == \
        "<doc><val>One<val>Two</val>Three</val></doc>"


def test_tokenizer_fully_consumed_after_parse():
    # readerClosedAfterParse analogue: the tokenizer has consumed the
    # full input once parse returns
    from ksoup_ray.engine.xmlbuilder import XmlTreeBuilder
    tb = XmlTreeBuilder()
    tb.parse("<a><b>c</b></a>", "")
    assert tb.tokeniser.pos >= tb.tokeniser.n
