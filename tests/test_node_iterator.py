"""NodeIteratorTest tranche — translated from reference
ksoup-test/.../nodes/NodeIteratorTest.kt (document-order iteration with
structural mutation support)."""

import pytest

from ksoup_ray.engine import parser as KP
from ksoup_ray.engine.dom import Element, NodeIterator, TextNode

HTML = "<div id=1><p>One<p>Two</div><div id=2><p>Three<p>Four</div>"


def track_seen(node, actual):
    if isinstance(node, Element):
        actual.append(node.tag_name())
        if node.has_attr("id"):
            actual.append("#" + node.id())
    elif isinstance(node, TextNode):
        actual.append(node.text())
    else:
        actual.append(node.node_name())
    actual.append(";")


def assert_iterates(it, expected):
    previous = None
    actual = []
    while it.has_next():
        node = it.next()
        assert node is not None
        assert node is not previous
        track_seen(node, actual)
        previous = node
    assert "".join(actual) == expected


def assert_contents(el, expected):
    assert_iterates(NodeIterator.from_node(el), expected)


def test_can_iterate_nodes():
    doc = KP.parse(HTML)
    it = NodeIterator.from_node(doc)
    assert_iterates(
        it, "#root;html;head;body;div#1;p;One;p;Two;div#2;p;Three;p;Four;")
    assert not it.has_next()
    with pytest.raises(StopIteration):
        it.next()


def test_has_next_is_pure():
    doc = KP.parse(HTML)
    it = NodeIterator.from_node(doc)
    assert it.has_next()
    assert it.has_next()
    assert_iterates(
        it, "#root;html;head;body;div#1;p;One;p;Two;div#2;p;Three;p;Four;")
    assert not it.has_next()


def test_iterate_sub_tree():
    doc = KP.parse(HTML)
    div1 = doc.expect_first("div#1")
    it = NodeIterator.from_node(div1)
    assert_iterates(it, "div#1;p;One;p;Two;")
    assert not it.has_next()

    div2 = doc.expect_first("div#2")
    it2 = NodeIterator.from_node(div2)
    assert_iterates(it2, "div#2;p;Three;p;Four;")
    assert not it2.has_next()


def test_can_restart():
    doc = KP.parse(HTML)
    it = NodeIterator.from_node(doc)
    assert_iterates(
        it, "#root;html;head;body;div#1;p;One;p;Two;div#2;p;Three;p;Four;")
    it.restart(doc.expect_first("div#2"))
    assert_iterates(it, "div#2;p;Three;p;Four;")


def test_can_iterate_just_one_sibling():
    doc = KP.parse(HTML)
    p2 = doc.expect_first("p:contains(Two)")
    assert p2.text() == "Two"

    it = NodeIterator.from_node(p2)
    assert_iterates(it, "p;Two;")

    el_it = NodeIterator(p2, Element)
    found = el_it.next()
    assert found is p2
    assert not el_it.has_next()


def test_can_iterate_first_empty_sibling():
    doc = KP.parse("<div><p id=1></p><p id=2>.</p><p id=3>..</p>")
    p1 = doc.expect_first("p#1")
    assert p1.own_text() == ""

    it = NodeIterator.from_node(p1)
    assert it.has_next()
    node = it.next()
    assert node is p1
    assert not it.has_next()


REMOVE_HTML = ("<div id=out1><div id=1><p>One<p>Two</div>"
               "<div id=2><p>Three<p>Four</div></div><div id=out2>Out2")


def test_can_remove_via_iterator():
    doc = KP.parse(REMOVE_HTML)

    it = NodeIterator.from_node(doc)
    seen = []
    while it.has_next():
        node = it.next()
        if node.attr("id") == "1":
            it.remove()
        track_seen(node, seen)
    assert "".join(seen) == ("#root;html;head;body;div#out1;div#1;div#2;"
                             "p;Three;p;Four;div#out2;Out2;")
    assert_contents(doc, "#root;html;head;body;div#out1;div#2;"
                         "p;Three;p;Four;div#out2;Out2;")

    it = NodeIterator.from_node(doc)
    seen = []
    while it.has_next():
        node = it.next()
        if node.attr("id") == "2":
            it.remove()
        track_seen(node, seen)
    assert "".join(seen) == "#root;html;head;body;div#out1;div#2;div#out2;Out2;"
    assert_contents(doc, "#root;html;head;body;div#out1;div#out2;Out2;")


def test_can_remove_via_node():
    doc = KP.parse(REMOVE_HTML)

    it = NodeIterator.from_node(doc)
    seen = []
    while it.has_next():
        node = it.next()
        if node.attr("id") == "1":
            node.remove()
        track_seen(node, seen)
    assert "".join(seen) == ("#root;html;head;body;div#out1;div#1;div#2;"
                             "p;Three;p;Four;div#out2;Out2;")
    assert_contents(doc, "#root;html;head;body;div#out1;div#2;"
                         "p;Three;p;Four;div#out2;Out2;")

    it = NodeIterator.from_node(doc)
    seen = []
    while it.has_next():
        node = it.next()
        if node.attr("id") == "2":
            node.remove()
        track_seen(node, seen)
    assert "".join(seen) == "#root;html;head;body;div#out1;div#2;div#out2;Out2;"
    assert_contents(doc, "#root;html;head;body;div#out1;div#out2;Out2;")


def test_can_replace():
    doc = KP.parse(REMOVE_HTML)

    it = NodeIterator.from_node(doc)
    seen = []
    while it.has_next():
        node = it.next()
        track_seen(node, seen)
        if node.attr("id") == "1":
            node.replace_with(Element("span").set_text("Foo"))
    assert "".join(seen) == ("#root;html;head;body;div#out1;div#1;span;Foo;"
                             "div#2;p;Three;p;Four;div#out2;Out2;")
    # we don't see <p>One, do see the replacement span, and what follows
    assert_contents(doc, "#root;html;head;body;div#out1;span;Foo;div#2;"
                         "p;Three;p;Four;div#out2;Out2;")

    it = NodeIterator.from_node(doc)
    seen = []
    while it.has_next():
        node = it.next()
        track_seen(node, seen)
        if node.attr("id") == "2":
            node.replace_with(Element("span").set_text("Bar"))
    assert "".join(seen) == ("#root;html;head;body;div#out1;span;Foo;div#2;"
                             "span;Bar;div#out2;Out2;")
    assert_contents(doc,
                    "#root;html;head;body;div#out1;span;Foo;span;Bar;"
                    "div#out2;Out2;")


def test_can_wrap():
    doc = KP.parse(HTML)
    it = NodeIterator.from_node(doc)
    saw_inner = False
    while it.has_next():
        node = it.next()
        if node.attr("id") == "1":
            node.wrap("<div id=outer>")
        if isinstance(node, TextNode) and node.text() == "One":
            saw_inner = True
    assert_contents(doc, "#root;html;head;body;div#outer;div#1;p;One;p;Two;"
                         "div#2;p;Three;p;Four;")
    assert saw_inner


def test_can_filter_for_elements():
    doc = KP.parse(HTML)
    it = NodeIterator(doc, Element)
    seen = []
    while it.has_next():
        el = it.next()
        assert el is not None
        track_seen(el, seen)
    assert "".join(seen) == "#root;html;head;body;div#1;p;p;div#2;p;p;"


def test_can_filter_for_text_nodes():
    doc = KP.parse(HTML)
    it = NodeIterator(doc, TextNode)
    seen = []
    while it.has_next():
        text = it.next()
        assert text is not None
        track_seen(text, seen)
    assert "".join(seen) == "One;Two;Three;Four;"
    assert_contents(
        doc, "#root;html;head;body;div#1;p;One;p;Two;div#2;p;Three;p;Four;")


def test_can_modify_filtered_elements():
    doc = KP.parse(HTML)
    it = NodeIterator(doc, Element)
    seen = []
    while it.has_next():
        el = it.next()
        if el.own_text():
            el.set_text(el.own_text() + "++")
        track_seen(el, seen)
    assert "".join(seen) == "#root;html;head;body;div#1;p;p;div#2;p;p;"
    assert_contents(doc, "#root;html;head;body;div#1;p;One++;p;Two++;"
                         "div#2;p;Three++;p;Four++;")


def test_python_iterator_protocol():
    doc = KP.parse(HTML)
    names = [n.tag_name() for n in NodeIterator(doc, Element)]
    assert names == ["#root", "html", "head", "body", "div", "p", "p",
                     "div", "p", "p"]
