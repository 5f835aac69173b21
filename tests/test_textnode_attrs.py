"""TextNodeTest + AttributesTest tranches — translated from reference
ksoup-test/.../nodes/TextNodeTest.kt and AttributesTest.kt."""

import pytest

from ksoup_ray.engine import parser as KP
from ksoup_ray.engine.dom import Attributes, Element, TextNode


def _strip(s: str) -> str:
    return "".join(line.lstrip(" ") for line in s.split("\n"))


# --- TextNodeTest -----------------------------------------------------------

def test_blank():
    assert TextNode("").is_blank()
    assert TextNode("     ").is_blank()
    assert TextNode("  \n\n   ").is_blank()
    assert not TextNode("Hello").is_blank()
    assert not TextNode("  \nHello ").is_blank()


def test_split_text():
    doc = KP.parse("<div>Hello there</div>")
    div = doc.select("div")[0]
    tn = div.child_nodes()[0]
    tail = tn.split_text(6)
    assert tn.get_whole_text() == "Hello "
    assert tail.get_whole_text() == "there"
    assert tn.parent() is tail.parent()


def test_split_an_embolden():
    doc = KP.parse("<div>Hello there</div>")
    div = doc.select("div")[0]
    tn = div.child_nodes()[0]
    tail = tn.split_text(6)
    tail.wrap("<b></b>")
    assert _strip(div.html()) == "Hello <b>there</b>"


def test_split_text_validation():
    doc = KP.parse("<div>Hello there</div>")
    tn = doc.expect_first("div").child_nodes()[0]
    with pytest.raises(Exception):
        tn.split_text(-5)
    with pytest.raises(Exception):
        tn.split_text(500)


def test_supplementary_character_text_node():
    ch = chr(135361)
    doc = KP.parse(ch)
    t = doc.body().text_nodes()[0]
    assert t.outer_html().strip() == ch


def test_leaf_nodes_have_no_children():
    doc = KP.parse("<div>Hello there</div>")
    tn = doc.select("div")[0].child_nodes()[0]
    assert tn.child_nodes() == []


def test_space_normalise():
    whole = "Two  spaces"
    norm = "Two spaces"
    tn = TextNode(whole)
    assert tn.get_whole_text() == whole
    assert tn.text() == norm
    assert tn.outer_html() == norm
    el = Element("p")
    el.append_child(tn)
    assert tn.get_whole_text() == whole
    assert tn.text() == norm
    assert tn.outer_html() == norm
    assert el.outer_html() == f"<p>{norm}</p>"


def test_text_bean():
    doc = KP.parse("<p>One <span>two &amp;</span> three &amp;</p>")
    p = doc.select("p")[0]
    span = doc.select("span")[0]
    assert span.text() == "two &"
    span_text = span.child_nodes()[0]
    assert span_text.text() == "two &"
    tn = p.child_nodes()[2]
    assert tn.text() == " three &"


# --- AttributesTest ---------------------------------------------------------

def test_attributes_html():
    a = Attributes()
    a.put("Tot", "a&p")
    a.put("Hello", "There")
    a.put("data-name", "Ksoup")
    assert a.size() == 3
    assert a.has_key_ignore_case("Tot")
    assert a.has_key_ignore_case("tot")
    assert a.get_ignore_case("tot") == "a&p"


def test_attributes_iterator():
    a = Attributes()
    data = [("Tot", "raul"), ("Hello", "pismuth"), ("data-name", "Ksoup")]
    for k, v in data:
        a.put(k, v)
    got = list(a)
    assert got == data


def test_attributes_remove():
    a = Attributes()
    a.put("Tot", "one")
    a.put("Hello", "two")
    a.remove("Tot")
    assert a.size() == 1
    assert a.get_ignore_case("tot") == ""


def test_boolean_attribute_output():
    doc = KP.parse("<div hidden>one</div>")
    div = doc.select("div")[0]
    assert div.has_attr("hidden")
    assert div.attr("hidden") == ""
    assert _strip(div.outer_html()) == "<div hidden>one</div>"


def test_attribute_case_retained_in_output():
    doc = KP.parse('<div Data-Name="x">one</div>')
    # HTML parse settings lowercase attribute names
    div = doc.select("div")[0]
    assert div.attr("data-name") == "x"
    assert _strip(div.outer_html()) == '<div data-name="x">one</div>'


def test_dataset_read():
    doc = KP.parse("<div id=1 data-name=ksoup class=new data-package=tag>"
                   "Hello</div>")
    d = doc.select("div")[0].attributes().dataset()
    assert d == {"name": "ksoup", "package": "tag"}
