"""Elements — list of Element with bulk operations.

Semantics per reference ``select/Elements.kt`` (attr :58, eachAttr :84,
removeAttr :113, class ops :125-161, val :173, text :201 space-joined,
eachText :222 skips textless, html :232, tagName :264, prepend/append/
before/after :290-329, wrap :345, unwrap :372, empty :391, remove :415,
select :428, not :444, eq :457, is :466, next/prev :487-538, parents
:587, first/last :602, removeIf :775) — plus ``NodeTraversor.filter``
(NodeFilter.FilterResult) which the reference drives bulk removal with.
"""

from __future__ import annotations

from typing import Callable, Iterable

from .dom import Element, Node
from .parser import parse_fragment
from .select import filter_out, parse_query, select_in_roots

# NodeFilter.FilterResult (select/NodeFilter.kt)
CONTINUE = 0
SKIP_CHILDREN = 1
SKIP_ENTIRELY = 2
REMOVE = 3
STOP = 4


def traverse(visitor, nodes) -> None:
    """NodeTraversor.traverse(visitor, nodes) — visitor has
    ``head(node, depth)`` and optional ``tail(node, depth)``."""
    tail = getattr(visitor, "tail", None)
    for node in nodes:
        node.traverse(visitor.head, tail)


def filter_traverse(node_filter, root: Node) -> int:
    """NodeTraversor.filter (NodeTraversor.kt:87-129): DFS with head and
    optional tail filters, supporting node removal mid-walk (REMOVE from
    either visit). ``node_filter`` is either a plain callable
    ``head(node, depth) -> FilterResult`` or an object with ``head`` and
    optionally ``tail`` methods. Returns the root's final FilterResult
    (STOP or CONTINUE)."""
    head = getattr(node_filter, "head", node_filter)
    tail = getattr(node_filter, "tail", None)

    node: Node | None = root
    depth = 0
    while node is not None:
        result = head(node, depth)
        if result == STOP:
            return STOP
        # Descend into child nodes:
        if result == CONTINUE and node.child_nodes():
            node = node.child_nodes()[0]
            depth += 1
            continue
        # No siblings, move upwards:
        while node.next_sibling() is None and depth > 0:
            # 'tail' current node:
            if result in (CONTINUE, SKIP_CHILDREN):
                if tail is not None:
                    result = tail(node, depth)
                    if result == STOP:
                        return STOP
                else:
                    result = CONTINUE
            prev = node  # in case we need to remove it below
            node = node.parent_node
            depth -= 1
            if result == REMOVE:
                prev.remove()  # remove AFTER finding parent
            result = CONTINUE  # parent was not pruned
        # 'tail' current node, then proceed with siblings:
        if result in (CONTINUE, SKIP_CHILDREN):
            if tail is not None:
                result = tail(node, depth)
                if result == STOP:
                    return STOP
            else:
                result = CONTINUE
        if node is root:
            return result
        prev = node
        node = node.next_sibling()
        if result == REMOVE:
            prev.remove()  # remove AFTER finding sibling
    return CONTINUE


def filter_all(node_filter, nodes) -> None:
    """NodeTraversor.filter over a collection (NodeTraversor.kt:136-143):
    stops at the first root whose filter result is STOP."""
    for el in nodes:
        if filter_traverse(node_filter, el) == STOP:
            return


class Elements(list):
    """``list[Element]`` + the reference's bulk API."""

    def __init__(self, elements: Iterable[Element] = ()):
        super().__init__(elements)

    # -- attributes
    def attr(self, key: str) -> str:
        """First matching element's attr (Elements.kt:58)."""
        for el in self:
            if el.has_attr(key):
                return el.attr(key)
        return ""

    def each_attr(self, key: str) -> list[str]:
        return [el.attr(key) for el in self if el.has_attr(key)]

    def set_attr(self, key: str, value: str) -> "Elements":
        for el in self:
            el.set_attr(key, value)
        return self

    def remove_attr(self, key: str) -> "Elements":
        for el in self:
            attrs = el.attributes()
            if attrs is not None:
                attrs.remove_ignore_case(key)
        return self

    def has_attr(self, key: str) -> bool:
        return any(el.has_attr(key) for el in self)

    # -- classes
    def add_class(self, cls: str) -> "Elements":
        for el in self:
            el.add_class(cls)
        return self

    def remove_class(self, cls: str) -> "Elements":
        for el in self:
            el.remove_class(cls)
        return self

    def toggle_class(self, cls: str) -> "Elements":
        for el in self:
            el.toggle_class(cls)
        return self

    def has_class(self, cls: str) -> bool:
        return any(el.has_class(cls) for el in self)

    # -- value
    def value(self) -> str:
        return self[0].value() if self else ""

    def set_value(self, value: str) -> "Elements":
        """Elements.val(value) — set on every element."""
        for el in self:
            el.set_value(value)
        return self

    def clear(self) -> None:  # type: ignore[override]
        """Elements.clear() — remove each element from the DOM, then
        empty the list (reference semantics; plain list.clear would
        leave the elements attached)."""
        for el in self:
            el.remove()
        super().clear()

    # -- text / html
    def text(self) -> str:
        """Space-joined text of all elements (Elements.kt:201)."""
        return " ".join(el.text() for el in self)

    def has_text(self) -> bool:
        return any(el.has_text() for el in self)

    def each_text(self) -> list[str]:
        """Texts, skipping elements with no text (Elements.kt:222)."""
        return [el.text() for el in self if el.has_text()]

    def html(self) -> str:
        return "\n".join(el.html() for el in self)

    def outer_html(self) -> str:
        return "\n".join(el.outer_html() for el in self)

    # -- tree mutation
    def tag_name(self, name: str) -> "Elements":
        from .tags import value_of
        for el in self:
            el.tag = value_of(name, el.tag.namespace)
        return self

    def prepend(self, html: str) -> "Elements":
        for el in self:
            nodes = parse_fragment(html, el, el.base_uri())
            el.add_children_at(0, list(nodes))
        return self

    def append(self, html: str) -> "Elements":
        for el in self:
            nodes = parse_fragment(html, el, el.base_uri())
            for n in list(nodes):
                n.remove()
                el.append_child(n)
        return self

    def before(self, html: str) -> "Elements":
        for el in self:
            parent = el.parent_node
            if parent is None:
                continue
            nodes = parse_fragment(html, parent, el.base_uri())
            parent.add_children_at(el.sibling_index, list(nodes))
        return self

    def after(self, html: str) -> "Elements":
        for el in self:
            parent = el.parent_node
            if parent is None:
                continue
            nodes = parse_fragment(html, parent, el.base_uri())
            parent.add_children_at(el.sibling_index + 1, list(nodes))
        return self

    def wrap(self, html: str) -> "Elements":
        """Wrap each element in the given HTML (Elements.kt:345)."""
        for el in self:
            parent = el.parent_node
            if parent is None:
                continue
            nodes = parse_fragment(html, parent, el.base_uri())
            wrapper = next((n for n in nodes if isinstance(n, Element)),
                           None)
            if wrapper is None:
                continue
            # deepest first-element descendant receives the element
            deepest = wrapper
            while deepest.first_element_child() is not None:
                deepest = deepest.first_element_child()
            parent.replace_child(el, wrapper)
            deepest.append_child(el)
        return self

    def unwrap(self) -> "Elements":
        for el in list(self):
            el.unwrap()
        return self

    def set_html(self, html: str) -> "Elements":
        """Elements.html(String) — replace every element's inner HTML."""
        for el in self:
            el.set_html(html)
        return self

    def traverse(self, visitor) -> "Elements":
        """NodeTraversor.traverse over each element (Elements.kt
        traverse)."""
        traverse(visitor, self)
        return self

    def empty(self) -> "Elements":
        for el in self:
            el.empty()
        return self

    def remove(self) -> "Elements":  # type: ignore[override]
        for el in self:
            el.remove()
        return self

    def remove_if(self, pred: Callable[[Element], bool]) -> bool:
        """Elements.removeIf — DOM-aware; concurrent-read safe (the
        predicate may read the list while it runs). Returns whether any
        element was removed (ElementsTest removeIfSupportsConcurrentRead)."""
        to_drop = [e for e in self if pred(e)]
        for el in to_drop:
            el.remove()
            super().remove(el)
        return bool(to_drop)

    # -- DOM-aware list mutators (Elements.kt set/remove/retain family:
    # changes to the list write through to the DOM)
    def set_at(self, index: int, el: Element) -> Element:
        """Elements.set(i, el): replace in list AND in DOM; returns the
        old element."""
        old = self[index]
        old.replace_with(el)
        super().__setitem__(index, el)
        return old

    def remove_at(self, index: int) -> Element:
        """Elements.removeAt(i): remove from list and DOM."""
        old = self[index]
        old.remove()
        super().__delitem__(index)
        return old

    def remove_element(self, el: Element) -> bool:
        """Elements.remove(Object): identity match; removes from DOM."""
        for i, e in enumerate(self):
            if e is el:
                e.remove()
                super().__delitem__(i)
                return True
        return False

    def remove_all(self, coll) -> bool:
        """Elements.removeAll(collection) — DOM-aware."""
        any_removed = False
        for el in list(coll):
            any_removed |= self.remove_element(el)
        return any_removed

    def retain_all(self, coll) -> bool:
        """Elements.retainAll(collection) — DOM-aware."""
        keep = {id(e) for e in coll}
        to_drop = [e for e in self if id(e) not in keep]
        for el in to_drop:
            self.remove_element(el)
        return bool(to_drop)

    def replace_all(self, op: Callable[[Element], Element]) -> "Elements":
        """Elements.replaceAll(op) — replaces in list and DOM."""
        for i, el in enumerate(self):
            new = op(el)
            if new is not el:
                el.replace_with(new)
                super().__setitem__(i, new)
        return self

    # -- filtering / navigation
    def select(self, query: str) -> "Elements":
        return Elements(select_in_roots(query, list(self)))

    def not_(self, query: str) -> "Elements":
        out = select_in_roots(query, list(self))
        return Elements(filter_out(list(self), out))

    def eq(self, index: int) -> "Elements":
        return Elements([self[index]] if 0 <= index < len(self) else [])

    def is_(self, query: str) -> bool:
        ev = parse_query(query)
        return any(el.css_is(query) for el in self)

    def next_all(self, query: str | None = None) -> "Elements":
        return self._siblings(query, next_=True, all_=True)

    def next(self, query: str | None = None) -> "Elements":
        return self._siblings(query, next_=True, all_=False)

    def prev_all(self, query: str | None = None) -> "Elements":
        return self._siblings(query, next_=False, all_=True)

    def prev(self, query: str | None = None) -> "Elements":
        return self._siblings(query, next_=False, all_=False)

    def _siblings(self, query, next_, all_):
        ev = parse_query(query) if query else None
        out: list[Element] = []
        seen: set[int] = set()
        for el in self:
            sib = el.next_element_sibling() if next_ \
                else el.previous_element_sibling()
            while sib is not None:
                r = sib.root()
                root = r if isinstance(r, Element) else sib
                if ev is None or ev.matches(root, sib):
                    if id(sib) not in seen:
                        seen.add(id(sib))
                        out.append(sib)
                    if not all_:
                        break
                sib = sib.next_element_sibling() if next_ \
                    else sib.previous_element_sibling()
        return Elements(out)

    def parents(self) -> "Elements":
        out: list[Element] = []
        seen: set[int] = set()
        for el in self:
            for p in el.parents():
                if id(p) not in seen:
                    seen.add(id(p))
                    out.append(p)
        return Elements(out)

    def first(self) -> Element | None:
        return self[0] if self else None

    def last(self) -> Element | None:
        return self[-1] if self else None

    # -- typed node accessors
    def forms(self) -> list:
        from .dom import FormElement
        return [el for el in self if isinstance(el, FormElement)]

    def comments(self) -> list:
        from .dom import Comment
        return [n for el in self for n in el.child_nodes()
                if isinstance(n, Comment)]

    def text_nodes(self) -> list:
        return [n for el in self for n in el.text_nodes()]

    def data_nodes(self) -> list:
        return [n for el in self for n in el.data_nodes()]
