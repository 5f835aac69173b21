"""ElementTest misc tranche — translated from reference
ksoup-test/.../nodes/ElementTest.kt (vivify guards, clone owner docs,
hasSameValue, script/style data handling, CDATA output, escape modes)."""

import pytest

from ksoup_ray.engine import parser as KP
from ksoup_ray.engine.dom import (
    CDataNode,
    DataNode,
    Element,
    TextNode,
)
from ksoup_ray.engine.entities import ESCAPE_EXTENDED
from ksoup_ray.engine.parser import parse_xml


def _norm_spaces(s: str) -> str:
    # TextUtil.normalizeSpaces (ksoup-test TextUtil.kt)
    import re
    s = re.sub(r"\r?\n?", "", s)
    s = re.sub(r"\s{2,}", " ", s)
    s = re.sub(r">\s+<", "><", s)
    return s


def test_element_is_not_a_sibling_of_itself():
    doc = KP.parse("<div><p>One<p>Two<p>Three</div>")
    p2 = doc.select("p")[1]
    assert p2.text() == "Two"
    els = p2.sibling_elements()
    assert len(els) == 2
    assert els[0].outer_html() == "<p>One</p>"
    assert els[1].outer_html() == "<p>Three</p>"


def test_child_throws_index_out_of_bounds_on_missing():
    doc = KP.parse("<div><p>One</p><p>Two</p></div>")
    div = doc.select("div")[0]
    assert len(div.children()) == 2
    assert div.child(0).text() == "One"
    with pytest.raises(IndexError):
        div.child(3)


def test_hash_and_equals_and_value():
    doc1 = ("<div id=1><p class=one>One</p><p class=one>One</p>"
            "<p class=one>Two</p><p class=two>One</p></div>"
            "<div id=2><p class=one>One</p><p class=one>One</p>"
            "<p class=one>Two</p><p class=two>One</p></div>")
    doc = KP.parse(doc1)
    els = doc.select("p")
    assert len(els) == 8
    e0, e1, e2, e3, e4, e5, e6, e7 = els
    assert e0 == e0
    assert e0.has_same_value(e1)
    assert e0.has_same_value(e4)
    assert e0.has_same_value(e5)
    assert e0 != e2
    assert not e0.has_same_value(e2)
    assert not e0.has_same_value(e3)
    assert not e0.has_same_value(e6)
    assert not e0.has_same_value(e7)
    assert hash(e0) == hash(e0)


def test_hashcode_is_stable_with_content_changes():
    root = Element("root")
    s = {root}
    root.append_child(Element("a"))
    assert root in s


def test_doesnt_delete_zwj_when_normalizing_text():
    text = "\U0001F469‍\U0001F4BB\U0001F926\U0001F3FB‍♂️"
    doc = KP.parse(f"<p>{text}</p><div>One&zwj;Two</div>")
    p = doc.select_first("p")
    d = doc.select_first("div")
    # reference asserts 12 UTF-16 code units; in codepoints that is 8
    assert len(p.text()) == 8
    assert p.text() == text
    assert len(d.text()) == 7
    assert d.text() == "One‍Two"
    found = doc.select_first("div:contains(One‍Two)")
    assert found.has_same_value(d)


def test_child_size_with_mixed_content():
    doc = KP.parse("<table><tbody>\n<tr>\n<td>15:00</td>\n<td>sport</td>\n"
                   "</tr>\n</tbody></table>")
    row = doc.select_first("table tbody tr")
    assert row.children_size() == 2
    assert row.child_node_size() == 5


def test_is_block():
    doc = KP.parse("<div><p><span>Hello</span>")
    assert doc.select_first("div").is_block()
    assert doc.select_first("p").is_block()
    assert not doc.select_first("span").is_block()


def test_script_text_html_set_as_data():
    src = "var foo = 5 < 2;\nvar bar = 1 && 2;"
    html = f"<script>{src}</script>"
    doc = KP.parse(html)
    el = doc.select_first("script")

    def validate(expect, e):
        assert e.data() == expect
        assert e.text() == ""
        assert e.html() == expect
        assert isinstance(e.child_nodes()[0], DataNode)

    validate(src, el)
    src = "var foo = 4 < 2;\nvar bar > 1 && 2;"
    el.set_html(src)
    validate(src, el)
    el.set_text(src)
    validate(src, el)

    # XML: no special treatment, escaped as regular text
    xml = parse_xml(html)
    x_el = xml.select_first("script")

    def validate_xml(e):
        assert e.data() == ""
        assert isinstance(e.child_nodes()[0], TextNode)

    src = "var foo = 5 < 2;\nvar bar = 1 && 2;"
    escaped = "var foo = 5 &lt; 2;\nvar bar = 1 &amp;&amp; 2;"
    validate_xml(x_el)
    x_el.set_text(src)
    validate_xml(x_el)
    x_el.set_html(src)
    validate_xml(x_el)
    assert el.outer_html() == \
        "<script>var foo = 4 < 2;\nvar bar > 1 && 2;</script>"
    assert x_el.outer_html() == f"<script>{escaped}</script>"


def test_shallow_clone_to_string():
    doc = KP.parse("<p><i>Hello</i></p>")
    p = doc.select_first("p")
    i = doc.select_first("i")
    assert p.shallow_clone().outer_html() == "<p></p>"
    assert i.shallow_clone().outer_html() == "<i></i>"


def test_style_html_round_trips():
    style_contents = "foo < bar > qux {color:white;}"
    html = f"<head><style>{style_contents}</style></head>"
    doc = KP.parse(html)
    style = doc.head().select_first("style")
    assert style.html() == style_contents
    style.set_html(style_contents)
    assert style.html() == style_contents
    assert style.text() == ""
    style.set_text(style_contents)  # pushes the HTML, not the Text
    assert style.text() == ""
    assert style.html() == style_contents


def test_accessors_do_not_vivify_attributes():
    doc = KP.parse("<div><p><a href=foo>One</a>")
    div = doc.select_first("div")
    p = doc.select_first("p")
    a = doc.select_first("a")
    assert div.attr("href") == ""
    p.remove_attr("href")
    hrefs = doc.select("[href]")
    assert len(hrefs) == 1
    assert not div.has_attributes()
    assert not p.has_attributes()
    assert a.has_attributes()


def test_child_nodes_accessor_does_not_vivify():
    doc = KP.parse("<p></p>")
    p = doc.select_first("p")
    assert not p.has_child_nodes()
    assert p.child_node_size() == 0
    assert p.children_size() == 0
    assert len(p.child_nodes()) == 0
    assert len(p.children()) == 0
    assert not p.has_child_nodes()


def test_empty_children_elements_is_modifiable():
    p = Element("p")
    els = p.children()
    assert len(els) == 0
    els.append(Element("a"))
    assert len(els) == 1


def test_attribute_size_does_not_auto_vivify():
    doc = KP.parse("<p></p>")
    p = doc.select_first("p")
    assert not p.has_attributes()
    assert p.attributes_size() == 0
    assert not p.has_attributes()
    p.set_attr("foo", "bar")
    assert p.attributes_size() == 1
    assert p.has_attributes()
    p.remove_attr("foo")
    assert p.attributes_size() == 0


def test_cloned_elements_have_owner_docs_and_independent_settings():
    doc = KP.parse("<div>Text</div><div>Two</div>")
    doc.output_settings.pretty_print = False
    div = doc.select_first("div")
    div_clone = div.clone()
    doc_clone = div_clone.owner_document()
    assert doc_clone is not None
    assert not doc_clone.output_settings.pretty_print
    assert doc_clone is not doc
    assert div_clone.child_nodes()[0].owner_document() is doc_clone
    doc.output_settings.pretty_print = True
    assert doc.output_settings.pretty_print
    assert not doc_clone.output_settings.pretty_print
    # clone shell did not get the second div as its children
    assert len(doc_clone.children()) == 1
    assert doc_clone.child(0) is div_clone


def test_expect_first():
    doc = KP.parse("<p>One</p><p>Two <span>Three</span> <span>Four</span>")
    span = doc.expect_first("span")
    assert span.text() == "Three"
    assert doc.select_first("div") is None
    with pytest.raises(ValueError):
        doc.expect_first("div")


def test_orphan_siblings():
    el = Element("div")
    assert len(el.sibling_elements()) == 0
    assert len(el.next_element_siblings()) == 0
    assert len(el.previous_element_siblings()) == 0
    assert el.next_element_sibling() is None
    assert el.previous_element_sibling() is None


def test_has_text():
    doc = KP.parse("<div id=1><p><i>One</i></p></div><div id=2>Two</div>"
                   "<div id=3><script>data</script> </div>")
    assert doc.get_element_by_id("1").has_text()
    assert doc.get_element_by_id("2").has_text()
    assert not doc.get_element_by_id("3").has_text()


def test_data_in_cdata_node():
    el = Element("div")
    cdata = CDataNode("Some CData")
    el.append_child(cdata)
    assert el.data() == "Some CData"
    parsed = KP.parse("One <![CDATA[Hello]]>")
    assert parsed.body().data() == "Hello"


def test_datanodes_output_cdata_in_xhtml():
    html = "<p><script>1 && 2</script><style>3 && 4</style> 5 &amp;&amp; 6</p>"
    doc = KP.parse(html)
    assert _norm_spaces(doc.body().html()) == html
    script_el = doc.expect_first("script")
    script_data = script_el.child_nodes()[0]
    assert isinstance(script_data, DataNode)
    assert script_data.get_whole_data() == "1 && 2"

    doc.output_settings.syntax = "xml"
    p = doc.expect_first("p")
    xml = p.html()
    assert xml == ("<script>//<![CDATA[\n"
                   "1 && 2\n"
                   "//]]></script>\n"
                   "<style>/*<![CDATA[*/\n"
                   "3 && 4\n"
                   "/*]]>*/</style> 5 &amp;&amp; 6")

    xml_doc = parse_xml(xml)
    assert xml_doc.html() == xml
    script_xml_el = xml_doc.expect_first("script")
    script_text = script_xml_el.child_nodes()[0]
    assert isinstance(script_text, TextNode)
    assert script_text.get_whole_text() == "//"
    script_cdata = script_xml_el.child_nodes()[1]
    assert isinstance(script_cdata, CDataNode)
    assert script_cdata.text() == "\n1 && 2\n//"


def test_datanodes_output_existing_cdata_in_xhtml():
    html = ("<p><script>//<![CDATA[\n1 && 2\n//]]></script>"
            "<style>\n/*<![CDATA[*/3 && 4\n/*]]>*/</style> 5 &amp;&amp; 6</p>")
    doc = KP.parse(html)
    assert _norm_spaces(doc.body().html()) == (
        "<p><script>//<![CDATA[1 && 2//]]></script>"
        "<style>/*<![CDATA[*/3 && 4/*]]>*/</style> 5 &amp;&amp; 6</p>")
    script_el = doc.expect_first("script")
    script_data = script_el.child_nodes()[0]
    assert isinstance(script_data, DataNode)
    assert script_data.get_whole_data() == "//<![CDATA[\n1 && 2\n//]]>"

    doc.output_settings.syntax = "xml"
    p = doc.expect_first("p")
    xml = p.html()
    assert xml == ("<script>//<![CDATA[\n"
                   "1 && 2\n"
                   "//]]></script>\n"
                   "<style>\n"
                   "/*<![CDATA[*/3 && 4\n"
                   "/*]]>*/</style> 5 &amp;&amp; 6")

    xml_doc = parse_xml(xml)
    assert xml_doc.html() == xml


def test_xml_syntax_sets_escape_mode():
    html = "Foo&nbsp;&Succeeds;"
    doc = KP.parse(html)
    doc.output_settings.charset = "ISO-8859-1"
    assert doc.body().html() == "Foo&nbsp;&#x227b;"
    doc.output_settings.syntax = "xml"
    assert doc.body().html() == "Foo&#xa0;&#x227b;"
    # can set back if desired
    doc.output_settings.escape_mode = ESCAPE_EXTENDED
    assert doc.body().html() == "Foo&nbsp;&succ;"
