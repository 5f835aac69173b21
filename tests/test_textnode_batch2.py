"""TextNodeTest tranche 2 — supplementary chars, leaf-node attribute
vivification, clone-after-attributes (reference
ksoup-test/.../nodes/TextNodeTest.kt remainder)."""

from ksoup_ray.engine import parser as KP
from ksoup_ray.engine.dom import Element, TextNode
from ksoup_ray.engine.entities import unescape


def test_with_supplementary_character():
    s = chr(135361)
    doc = KP.parse(s)
    t = doc.body().text_nodes()[0]
    assert t.outer_html().strip() == s


def test_leaf_nodes_have_no_children():
    doc = KP.parse("<div>Hello there</div>")
    div = doc.select("div")[0]
    tn = div.child_nodes()[0]
    assert isinstance(tn, TextNode)
    assert tn.child_nodes() == []


def test_clone_after_attributes_hit():
    x = TextNode("zzz")
    x.attributes()  # vivifies: core value moves to the attribute slot
    y = x.clone()
    y.set_text("xxx")
    assert x.text() == "zzz"
    assert y.text() == "xxx"


def test_has_text_when_iterating():
    doc = KP.parse("<div>One <p>Two <p>Three")
    found_first = False
    for el in doc.get_all_elements():
        for node in el.child_nodes():
            if isinstance(node, TextNode):
                assert node.text().strip(" \t\n\f\r") != ""
                if not found_first:
                    found_first = True
                    assert node.text() == "One "
                    assert node.get_whole_text() == "One "
    assert found_first


def test_create_from_encoded():
    tn = TextNode(unescape("&lt;One&gt;"))
    assert tn.text() == "<One>"


def test_strip_leading_whitespace():
    # TextNode.stripLeadingWhitespace semantics
    assert "\n One Two  ".lstrip(" \t\n\f\r") == "One Two  "


def test_leaf_node_attributes():
    t = TextNode("First")
    # hits the !hasAttributes flow
    t.set_attr(t.node_name(), "One")
    assert t.attr(t.node_name()) == "One"
    assert not t.has_attributes()
    attr = t.attributes()
    assert len(attr.as_list()) == 1  # vivifies 'One' as an attribute
    assert attr.get(t.node_name()) == "One"
    t.set_core_value("Two")
    assert t.text() == "Two"
    # arbitrary attributes
    assert not t.has_attr("foo")
    t.set_attr("foo", "bar")
    assert t.has_attr("foo")
    t.remove_attr("foo")
    assert not t.has_attr("foo")
    assert t.base_uri() == ""
    t.set_attr("href", "/foo.html")
    assert t.abs_url("href") == ""  # cannot abs
    p = Element("p")
    p.set_base_uri("https://example.com/")
    p.append_child(t)
    assert t.abs_url("href") == "https://example.com/foo.html"
    assert len(t.child_nodes()) == 0
    assert t.empty() is t
    clone = t.clone()
    assert t.has_same_value(clone)
    assert clone.attr("href") == "/foo.html"
    assert clone.text() == "Two"
