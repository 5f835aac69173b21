"""ElementTest children/move/insert tranche — translated from reference
ksoup-test/.../nodes/ElementTest.kt (insertChildren / addChildren /
append/prependChildren / empty semantics)."""

import pytest

from ksoup_ray.engine import parser as KP
from ksoup_ray.engine.dom import Document, Element, TextNode


def _strip(s: str) -> str:
    return "".join(line.lstrip(" ") for line in s.split("\n"))


def test_append_row_to_table():
    doc = KP.parse("<table><tr><td>1</td></tr></table>")
    table = doc.select("tbody")[0]
    table.append_html("<tr><td>2</td></tr>")
    assert _strip(doc.body().html()) == \
        "<table><tbody><tr><td>1</td></tr><tr><td>2</td></tr></tbody></table>"


def test_prepend_row_to_table():
    doc = KP.parse("<table><tr><td>1</td></tr></table>")
    table = doc.select("tbody")[0]
    table.prepend_html("<tr><td>2</td></tr>")
    assert _strip(doc.body().html()) == \
        "<table><tbody><tr><td>2</td></tr><tr><td>1</td></tr></tbody></table>"
    # check sibling index (reindexChildren)
    ps = doc.select("tr")
    for i, p in enumerate(ps):
        assert p.sibling_index == i


def test_prepend_element():
    doc = KP.parse("<div id=1><p>Hello</p></div>")
    div = doc.get_element_by_id("1")
    div.prepend_element("p").set_text("Before")
    assert div.child(0).text() == "Before"
    assert div.child(1).text() == "Hello"


def test_move_by_append():
    # can empty an element and append its children to another element
    doc = KP.parse(
        "<div id=1>Text <p>One</p> Text <p>Two</p></div><div id=2></div>")
    div1 = doc.select("div")[0]
    div2 = doc.select("div")[1]
    assert div1.child_node_size() == 4
    children = list(div1.child_nodes())
    assert len(children) == 4
    div2.insert_children(0, children)
    assert len(children) == 4  # a copy, still 4 (but re-parented)
    assert div1.child_node_size() == 0
    assert div2.child_node_size() == 4
    assert doc.body().html() == (
        '<div id="1"></div>\n<div id="2">\n Text \n <p>One</p> Text \n'
        " <p>Two</p>\n</div>")


def test_insert_children_argument_validation():
    doc = KP.parse(
        "<div id=1>Text <p>One</p> Text <p>Two</p></div><div id=2></div>")
    div1 = doc.select("div")[0]
    div2 = doc.select("div")[1]
    children = list(div1.child_nodes())
    with pytest.raises(ValueError):
        div2.insert_children(6, children)
    with pytest.raises(ValueError):
        div2.insert_children(-5, children)


def test_insert_children_at_position():
    doc = KP.parse("<div id=1>Text1 <p>One</p> Text2 <p>Two</p></div>"
                   "<div id=2>Text3 <p>Three</p></div>")
    div1 = doc.select("div")[0]
    p1s = div1.select("p")
    div2 = doc.select("div")[1]
    assert div2.child_node_size() == 2
    div2.insert_children(-1, p1s)
    assert div1.child_node_size() == 2  # moved two out
    assert div2.child_node_size() == 4
    assert p1s[1].sibling_index == 3  # should be last

    el1 = Element("span").set_text("Span1")
    el2 = Element("span").set_text("Span2")
    tn1 = TextNode("Text4")
    els = [el1, el2, tn1]
    assert el1.parent() is None
    div2.insert_children(-2, els)
    assert el1.parent() is div2
    assert div2.child_node_size() == 7
    assert el1.sibling_index == 3
    assert el2.sibling_index == 4
    assert tn1.sibling_index == 5


def test_insert_children_as_copy():
    doc = KP.parse(
        "<div id=1>Text <p>One</p> Text <p>Two</p></div><div id=2></div>")
    div1 = doc.select("div")[0]
    div2 = doc.select("div")[1]
    ps = [p.clone() for p in doc.select("p")]
    ps[0].set_text("One cloned")
    div2.insert_children(-1, ps)
    assert div1.child_node_size() == 4  # not moved -- cloned
    assert div2.child_node_size() == 2
    assert _strip(doc.body().html()) == (
        '<div id="1">Text <p>One</p> Text <p>Two</p></div>'
        '<div id="2"><p>One cloned</p><p>Two</p></div>')


def test_append_must_correctly_move_children_inside_one_parent():
    doc = Document("")
    body = doc.append_element("body")
    body.append_element("div1")
    body.append_element("div2")
    div3 = body.append_element("div3")
    div3.set_text("Check")
    div4 = body.append_element("div4")
    body.insert_children(0, [div3, div4])
    import re
    result = re.sub(r"\s+", "", doc.outer_html())
    assert result == \
        "<body><div3>Check</div3><div4></div4><div1></div1><div2></div2></body>"


def test_reparent_separate_nodes():
    doc = KP.parse("<div><p>One<p>Two")
    new1 = Element("p").set_text("Three")
    new2 = Element("p").set_text("Four")
    doc.body().insert_children(-1, [new1, new2])
    assert _strip(doc.body().html()) == \
        "<div><p>One</p><p>Two</p></div><p>Three</p><p>Four</p>"

    # these get moved from the above - not copied
    doc.body().insert_children(0, [new1, new2])
    assert _strip(doc.body().html()) == \
        "<p>Three</p><p>Four</p><div><p>One</p><p>Two</p></div>"

    doc.body().insert_children(0, [new2.clone(), new1.clone()])
    assert _strip(doc.body().html()) == (
        "<p>Four</p><p>Three</p><p>Three</p><p>Four</p>"
        "<div><p>One</p><p>Two</p></div>")

    # shifted to end
    doc.body().append_child(new1)
    assert _strip(doc.body().html()) == (
        "<p>Four</p><p>Three</p><p>Four</p>"
        "<div><p>One</p><p>Two</p></div><p>Three</p>")


def test_not_actually_a_reparent():
    doc = KP.parse("<div>")
    div = doc.select_first("div")
    new1 = Element("p").set_text("One")
    new2 = Element("p").set_text("Two")
    div.add_children(new1, new2)
    assert _strip(div.outer_html()) == "<div><p>One</p><p>Two</p></div>"

    new3 = Element("p").set_text("Three")
    wrap = Element("nav")
    wrap.insert_children(0, [new1, new3])
    assert _strip(wrap.outer_html()) == "<nav><p>One</p><p>Three</p></nav>"
    div.add_children(wrap)
    # One moved into wrap, leaving Two in div
    assert _strip(div.outer_html()) == \
        "<div><p>Two</p><nav><p>One</p><p>Three</p></nav></div>"


def test_move_children():
    doc = KP.parse("<div><p>One<p>Two<p>Three</div><div></div>")
    divs = doc.select("div")
    a, b = divs[0], divs[1]
    b.insert_children(-1, list(a.child_nodes()))
    assert doc.body().html() == \
        "<div></div>\n<div>\n <p>One</p>\n <p>Two</p>\n <p>Three</p>\n</div>"


def test_move_children_to_outer():
    doc = KP.parse("<div><p>One<p>Two<p>Three</div><div></div>")
    divs = doc.select("div")
    a = divs[0]
    b = doc.body()
    b.insert_children(-1, list(a.child_nodes()))
    assert doc.body().html() == \
        "<div></div>\n<div></div>\n<p>One</p>\n<p>Two</p>\n<p>Three</p>"


def test_append_children():
    doc = KP.parse("<div><p>One<p>Two<p>Three</div><div><p>Four</div>")
    divs = doc.select("div")
    a, b = divs[0], divs[1]
    b.append_children(list(a.child_nodes()))
    assert doc.body().html() == ("<div></div>\n<div>\n <p>Four</p>\n"
                                 " <p>One</p>\n <p>Two</p>\n <p>Three</p>\n"
                                 "</div>")


def test_prepend_children():
    doc = KP.parse("<div><p>One<p>Two<p>Three</div><div><p>Four</div>")
    divs = doc.select("div")
    a, b = divs[0], divs[1]
    b.prepend_children(list(a.child_nodes()))
    assert doc.body().html() == ("<div></div>\n<div>\n <p>One</p>\n"
                                 " <p>Two</p>\n <p>Three</p>\n <p>Four</p>\n"
                                 "</div>")


def test_loop_move_children():
    doc = KP.parse("<div><p>One<p>Two<p>Three</div><div><p>Four</div>")
    divs = doc.select("div")
    a, b = divs[0], divs[1]
    outer = b.parent()
    assert outer is not None
    for node in list(a.child_nodes()):
        outer.append_child(node)
    assert doc.body().html() == ("<div></div>\n<div>\n <p>Four</p>\n</div>\n"
                                 "<p>One</p>\n<p>Two</p>\n<p>Three</p>")


def test_replace_with_self():
    doc = KP.parse("<p>One<p>Two")
    ps = doc.select("p")
    first = ps[0]
    first.replace_with(first)
    assert first.next_sibling() is ps[1]
    assert first.parent().html() == "<p>One</p>\n<p>Two</p>"


def test_empty_detaches_children():
    doc = KP.parse("<div><p>One<p>Two</p>Three</div>")
    div = doc.expect_first("div")
    assert div.child_node_size() == 3
    child_nodes = list(div.child_nodes())
    div.empty()
    assert div.child_node_size() == 0
    assert len(child_nodes) == 3  # copied before removing
    for child in child_nodes:
        assert child.parent_node is None
    p = child_nodes[0]
    # TextNode "One" still has parent p: detachment is only on div
    assert p.child_nodes()[0].parent_node is p


def test_empty_and_add_previous_child():
    doc = KP.parse("<div><p>One<p>Two<p>Three</div>")
    div = doc.expect_first("div")
    p = div.expect_first("p")
    div.empty().append_child(p)
    assert div.html() == "<p>One</p>"


def test_empty_and_add_previous_descendant():
    doc = KP.parse("<header><div><p>One<p>Two<p>Three</div></header>")
    header = doc.expect_first("header")
    p = header.expect_first("p")
    header.empty().append_child(p)
    assert header.html() == "<p>One</p>"
