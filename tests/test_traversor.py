"""TraversorTest tranche — translated from reference
ksoup-test/.../select/TraversorTest.kt (NodeTraversor traverse/filter
semantics, including structural mutation mid-walk)."""

from ksoup_ray.engine import parser as KP
from ksoup_ray.engine.dom import Element, TextNode
from ksoup_ray.engine.elements import (
    CONTINUE,
    REMOVE,
    SKIP_CHILDREN,
    SKIP_ENTIRELY,
    STOP,
    Elements,
    filter_all,
    traverse,
)


def _strip(s: str) -> str:
    return "".join(line.lstrip(" ") for line in s.split("\n"))


class _TagFilter:
    """Accumulates <name>…</name> around head/tail visits."""

    def __init__(self, head_fn=None, tail_fn=None):
        self.accum = []
        self._head = head_fn
        self._tail = tail_fn

    def head(self, node, depth):
        if self._head is not None:
            r = self._head(node, depth)
            if r is not None:
                return r
        self.accum.append("<" + node.node_name() + ">")
        return CONTINUE

    def tail(self, node, depth):
        self.accum.append("</" + node.node_name() + ">")
        if self._tail is not None:
            r = self._tail(node, depth)
            if r is not None:
                return r
        return CONTINUE


def test_filter_visit():
    doc = KP.parse("<div><p>Hello</p></div><div>There</div>")
    f = _TagFilter()
    filter_all(f, doc.select("div"))
    assert "".join(f.accum) == \
        "<div><p><#text></#text></p></div><div><#text></#text></div>"


def test_filter_skip_children():
    doc = KP.parse("<div><p>Hello</p></div><div>There</div>")
    f = _TagFilter(
        head_fn=lambda n, d: SKIP_CHILDREN if n.node_name() == "p" else None)
    # _TagFilter appends BEFORE returning SKIP_CHILDREN would skip the
    # append, so order the append first:

    class F:
        accum = []

        def head(self, node, depth):
            self.accum.append("<" + node.node_name() + ">")
            return SKIP_CHILDREN if node.node_name() == "p" else CONTINUE

        def tail(self, node, depth):
            self.accum.append("</" + node.node_name() + ">")
            return CONTINUE

    f = F()
    filter_all(f, doc.select("div"))
    assert "".join(f.accum) == \
        "<div><p></p></div><div><#text></#text></div>"


def test_filter_skip_entirely():
    doc = KP.parse("<div><p>Hello</p></div><div>There</div>")

    class F:
        accum = []

        def head(self, node, depth):
            if node.node_name() == "p":
                return SKIP_ENTIRELY
            self.accum.append("<" + node.node_name() + ">")
            return CONTINUE

        def tail(self, node, depth):
            self.accum.append("</" + node.node_name() + ">")
            return CONTINUE

    f = F()
    filter_all(f, doc.select("div"))
    assert "".join(f.accum) == "<div></div><div><#text></#text></div>"


def test_filter_remove():
    doc = KP.parse("<div><p>Hello</p></div><div>There be <b>bold</b></div>")

    class F:
        def head(self, node, depth):
            return REMOVE if node.node_name() == "p" else CONTINUE

        def tail(self, node, depth):
            return REMOVE if node.node_name() == "b" else CONTINUE

    filter_all(F(), doc.select("div"))
    assert Elements(doc.select("body")).html() == \
        "<div></div>\n<div>\n There be\n</div>"


def test_filter_stop():
    doc = KP.parse("<div><p>Hello</p></div><div>There</div>")

    class F:
        accum = []

        def head(self, node, depth):
            self.accum.append("<" + node.node_name() + ">")
            return CONTINUE

        def tail(self, node, depth):
            self.accum.append("</" + node.node_name() + ">")
            return STOP if node.node_name() == "p" else CONTINUE

    f = F()
    filter_all(f, doc.select("div"))
    assert "".join(f.accum) == "<div><p><#text></#text></p>"


def test_replace_element():
    # we can replace an element during traversal
    html = "<div><p>One <i>two</i> <i>three</i> four.</p></div>"
    doc = KP.parse(html)

    def head(node, depth):
        if isinstance(node, Element) and node.name_is("i"):
            u = Element("u")
            u.add_children_at(0, list(node.child_nodes()))
            node.replace_with(u)

    doc.traverse(head)
    p = doc.select_first("p")
    assert p is not None
    assert p.outer_html() == "<p>One <u>two</u> <u>three</u> four.</p>"


def test_can_add_children():
    doc = KP.parse("<div><p></p><p></p></div>")

    class V:
        i = 0

        def head(self, node, depth):
            if node.node_name() == "p":
                node.append_html(f"<span>{self.i}</span>")
                self.i += 1

        def tail(self, node, depth):
            if node.node_name() == "p":
                node.append_html(f"<span>{self.i}</span>")
                self.i += 1

    v = V()
    doc.traverse(v.head, v.tail)
    assert doc.body().html() == (
        "<div>\n"
        " <p><span>0</span><span>1</span></p>\n"
        " <p><span>2</span><span>3</span></p>\n"
        "</div>")


def test_can_specify_only_head():
    doc = KP.parse("<div><p>One</p></div>")
    count = [0]

    def head(node, depth):
        count[0] += 1

    doc.traverse(head)
    assert count[0] == 7


def test_can_remove_during_head():
    doc = KP.parse("<div><p id=1>Zero<p id=1>One<p id=2>Two<p>Three</div>")

    def head(node, depth):
        if node.attr("id") == "1":
            node.remove()
        elif isinstance(node, TextNode) and node.text() == "Three":
            node.remove()

    doc.traverse(head)
    assert _strip(doc.body().html()) == '<div><p id="2">Two</p><p></p></div>'


def test_element_functional_traverse():
    doc = KP.parse("<div><p>1<p>2<p>3")
    body = doc.body()
    seen = [0]
    deepest = [0]

    def head(node, depth):
        seen[0] += 1
        if depth > deepest[0]:
            deepest[0] = depth

    body.traverse(head)
    assert seen[0] == 8  # body and contents
    assert deepest[0] == 3


def test_sees_doc_root():
    doc = KP.parse("<p>One")
    seen = [False]

    def head(node, depth):
        if node is doc:
            seen[0] = True

    doc.traverse(head)
    assert seen[0]


def test_elements_traverse():
    # ElementsTest#traverse (the visitor variant referenced by the
    # TraversorTest header comment)
    doc = KP.parse("<div><p>Hello</p></div><div>There</div>")

    class V:
        accum = []

        def head(self, node, depth):
            self.accum.append("<" + node.node_name() + ">")

        def tail(self, node, depth):
            self.accum.append("</" + node.node_name() + ">")

    v = V()
    traverse(v, doc.select("div"))
    assert "".join(v.accum) == \
        "<div><p><#text></#text></p></div><div><#text></#text></div>"
