"""ElementTest tranche 3 — DOM manipulation + clone, translated from
reference ksoup-test/.../nodes/ElementTest.kt (testSetText:618,
testAddNewElement:629, testAddNewText:699, testPrependText:711,
testAddNewHtml:723, testPrependNewHtml:740, prependNodes:757,
appendNodes:768, testSetHtml:779, testWrap:803 .. before:858, after:874,
testWrapWithRemainder:890, testClone:975, testClonesClassnames:1003,
testShallowClone:1026, testTagNameSet:1052)."""

from ksoup_ray.engine import parser as KP
from ksoup_ray.engine.dom import Element, TextNode


def _strip(s: str) -> str:
    return "".join(line.lstrip(" ") for line in s.split("\n"))


def test_set_text():
    doc = KP.parse("<div id=1>Hello <p>there <b>now</b></p></div>")
    assert doc.text() == "Hello there now"
    assert doc.select("p")[0].text() == "there now"
    div = doc.get_element_by_id("1").set_text("Gone")
    assert div.text() == "Gone"
    assert doc.select("p") == []


def test_add_new_element():
    doc = KP.parse("<div id=1><p>Hello</p></div>")
    div = doc.get_element_by_id("1")
    div.append_element("p").set_text("there")
    el = div.append_element("P")
    el.set_attr("CLASS", "second")
    el.set_text("now")
    # html parser normalizes manually-specified tag and attr case per
    # settings at creation (we normalize at tag_value_of)
    assert _strip(doc.html()) == (
        '<html><head></head><body><div id="1"><p>Hello</p><p>there</p>'
        '<p class="second">now</p></div></body></html>')
    for i, p in enumerate(doc.select("p")):
        assert p.sibling_index == i


def test_add_new_text():
    doc = KP.parse("<div id=1><p>Hello</p></div>")
    div = doc.get_element_by_id("1")
    div.append_text(" there & now >")
    assert div.text() == "Hello there & now >"
    assert _strip(div.html()) == "<p>Hello</p> there &amp; now &gt;"


def test_prepend_text():
    doc = KP.parse("<div id=1><p>Hello</p></div>")
    div = doc.get_element_by_id("1")
    div.prepend_text("there & now > ")
    assert div.text() == "there & now > Hello"
    assert _strip(div.html()) == "there &amp; now &gt; <p>Hello</p>"


def test_add_new_html():
    doc = KP.parse("<div id=1><p>Hello</p></div>")
    div = doc.get_element_by_id("1")
    div.append_html("<p>there</p><p>now</p>")
    assert _strip(div.html()) == "<p>Hello</p><p>there</p><p>now</p>"
    for i, p in enumerate(doc.select("p")):
        assert p.sibling_index == i


def test_prepend_new_html():
    doc = KP.parse("<div id=1><p>Hello</p></div>")
    div = doc.get_element_by_id("1")
    div.prepend_html("<p>there</p><p>now</p>")
    assert _strip(div.html()) == "<p>there</p><p>now</p><p>Hello</p>"
    for i, p in enumerate(doc.select("p")):
        assert p.sibling_index == i


def test_prepend_nodes():
    doc = KP.parse("<div id=1><p>Hello</p></div>")
    p = doc.expect_first("p")
    p.prepend_html("Text <!-- comment --> ")
    assert _strip(p.html()) == "Text <!-- comment --> Hello"


def test_append_nodes():
    doc = KP.parse("<div id=1><p>Hello</p></div>")
    p = doc.expect_first("p")
    p.append_html(" Text <!-- comment -->")
    assert _strip(p.html()) == "Hello Text <!-- comment -->"


def test_set_html():
    doc = KP.parse("<div id=1><p>Hello</p></div>")
    div = doc.get_element_by_id("1")
    div.set_html("<p>there</p><p>now</p>")
    assert _strip(div.html()) == "<p>there</p><p>now</p>"


def test_wrap():
    doc = KP.parse("<div><p>Hello</p><p>There</p></div>")
    p = doc.select("p")[0]
    p.wrap("<div class='head'></div>")
    assert _strip(doc.body().html()) == \
        '<div><div class="head"><p>Hello</p></div><p>There</p></div>'
    ret = p.wrap("<div><div class=foo></div><p>What?</p></div>")
    assert _strip(doc.body().html()) == (
        '<div><div class="head"><div><div class="foo"><p>Hello</p></div>'
        '<p>What?</p></div></div><p>There</p></div>')
    assert ret is p


def test_wrap_noop():
    doc = KP.parse("<div><p>Hello</p></div>")
    p = doc.select("p")[0]
    wrapped = p.wrap("Some junk")
    assert wrapped is p
    assert _strip(doc.body().html()) == "<div><p>Hello</p></div>"


def test_wrap_on_orphan():
    orphan = Element("span").set_text("Hello!")
    assert not orphan.has_parent()
    wrapped = orphan.wrap("<div></div> There!")
    assert wrapped is orphan
    assert orphan.has_parent()
    assert orphan.parent().tag_name() == "div"
    assert orphan.parent().outer_html() == \
        "<div>\n <span>Hello!</span>\n</div>"


def test_wrap_artificial_structure():
    doc = KP.parse("<p>Hello <i>there</i> now.")
    i = doc.select_first("i")
    i.wrap("<div id=id1></div> quite")
    assert i.parent().tag_name() == "div"
    assert _strip(doc.body().html()) == \
        '<p>Hello <div id="id1"><i>there</i></div> quite now.</p>'


def test_before_html():
    doc = KP.parse("<div><p>Hello</p><p>There</p></div>")
    p1 = doc.select("p")[0]
    p1.before_html("<div>one</div><div>two</div>")
    assert _strip(doc.body().html()) == \
        "<div><div>one</div><div>two</div><p>Hello</p><p>There</p></div>"
    doc.select("p")[-1].before_html("<p>Three</p><!-- four -->")
    assert _strip(doc.body().html()) == (
        "<div><div>one</div><div>two</div><p>Hello</p><p>Three</p>"
        "<!-- four --><p>There</p></div>")


def test_after_html():
    doc = KP.parse("<div><p>Hello</p><p>There</p></div>")
    p1 = doc.select("p")[0]
    p1.after_html("<div>one</div><div>two</div>")
    assert _strip(doc.body().html()) == \
        "<div><p>Hello</p><div>one</div><div>two</div><p>There</p></div>"
    doc.select("p")[-1].after_html("<p>Three</p><!-- four -->")
    assert _strip(doc.body().html()) == (
        "<div><p>Hello</p><div>one</div><div>two</div><p>There</p>"
        "<p>Three</p><!-- four --></div>")


def test_wrap_with_remainder():
    doc = KP.parse("<div><p>Hello</p></div>")
    p = doc.select("p")[0]
    p.wrap("<div class='head'></div><p>There!</p>")
    assert _strip(doc.body().html()) == \
        '<div><div class="head"><p>Hello</p></div><p>There!</p></div>'


def test_wrap_with_simple_remainder():
    doc = KP.parse("<p>Hello")
    p = doc.select_first("p")
    body = p.parent()
    assert body.tag_name() == "body"
    p.wrap("<div></div> There")
    div = p.parent()
    assert div is not None and div.tag_name() == "div"
    assert p.parent() is div
    assert div.parent() is body
    assert _strip(doc.body().html()) == "<div><p>Hello</p></div> There"


def test_clone():
    doc = KP.parse("<div><p>One<p><span>Two</div>")
    p = doc.select("p")[1]
    clone = p.clone()
    # clone lives in a shallow-cloned owner-Document shell
    assert clone.parent_node is not None
    assert clone.parent_node.child_node_size() == 1
    assert clone.owner_document() is clone.parent_node
    assert clone.sibling_index == 0
    assert p.sibling_index == 1
    assert p.parent() is not None
    clone.append_html("<span>Three")
    assert _strip(clone.outer_html()) == \
        "<p><span>Two</span><span>Three</span></p>"
    assert _strip(doc.body().html()) == \
        "<div><p>One</p><p><span>Two</span></p></div>"  # not modified
    doc.body().append_child(clone)  # adopt
    assert clone.parent() is not None
    assert _strip(doc.body().html()) == (
        "<div><p>One</p><p><span>Two</span></p></div>"
        "<p><span>Two</span><span>Three</span></p>")


def test_clones_classnames():
    doc = KP.parse("<div class='one two'></div>")
    div = doc.select("div")[0]
    classes = set(div.class_names())
    assert classes == {"one", "two"}
    copy = div.clone()
    copy_classes = set(copy.class_names())
    assert copy_classes == {"one", "two"}
    copy_classes.add("three")
    copy_classes.remove("one")
    assert "one" in div.class_names()
    assert "three" not in div.class_names()
    assert div.html() == ""
    assert copy.html() == ""


def test_shallow_clone():
    base = "http://example.com/"
    doc = KP.parse("<div id=1 class=one><p id=2 class=two>One", base)
    d = doc.select_first("div")
    p = doc.select_first("p")
    t = p.text_nodes()[0]
    d2 = d.shallow_clone()
    p2 = p.shallow_clone()
    t2 = t.shallow_clone()
    assert d.child_node_size() == 1
    assert d2.child_node_size() == 0
    assert p.child_node_size() == 1
    assert p2.child_node_size() == 0
    assert p2.text() == ""
    assert isinstance(t2, TextNode)
    assert t2.text() == "One"
    assert p2.attr("class") == "two"
    p2.remove_class("two")
    assert p.attr("class") == "two"
    d2.append_html("<p id=3>Three")
    assert d2.child_node_size() == 1
    assert d2.text() == "Three"
    assert d.text() == "One"
    assert d2.base_uri() == base


def test_tag_name_set():
    doc = KP.parse("<div><i>Hello</i>")
    doc.select("i")[0].set_tag_name("em")
    assert doc.select("i") == []
    assert len(doc.select("em")) == 1
    assert doc.select("div")[0].html() == "<em>Hello</em>"
