"""DOM node tree + text extraction + HTML serialization.

A from-scratch Python DOM with the semantics of the reference's
``ksoup/src/com/fleeksoft/ksoup/nodes/*`` — Node/Element/TextNode/DataNode/
Comment/CDataNode/DocumentType/XmlDeclaration/Document/Attributes.

Key byte-identical behaviors (reference file:line cited inline):

* ``Element.text()`` — DFS with TextAccumulator (Element.kt:1312-1351):
  whitespace-normalized text, single space inserted at block/``br``
  boundaries, final trim.
* ``StringUtil.appendNormalisedWhitespace`` (StringUtil.kt:165-191):
  collapse runs of {space, tab, LF, FF, CR, U+00A0}; drop U+200B/U+00AD.
* ``Element.wholeText()`` — raw TextNode contents, ``br`` → ``\\n``.
* serialization — pretty-print indenting per Element.kt:1645-1694 and
  TextNode.kt:61-92; attribute collapse per Attribute.kt:167-233.

DOM trees are transient worker-local state inside map_batches UDFs —
they are never serialized between Ray stages (SURVEY.md §1).

All traversals are iterative (no recursion) so pathologically deep
documents (fuzz corpus: 10k-deep nesting) cannot overflow the Python
stack inside a Ray worker.
"""

from __future__ import annotations

import re
from typing import Callable, Iterator

from . import entities as E
from .tags import (
    NAMESPACE_HTML,
    Tag,
    value_of as tag_value_of,
)

_WS_RE = re.compile(r"\s+")

# StringUtil.isActuallyWhitespace (StringUtil.kt:137-141): &nbsp; counts
_ACTUAL_WS = frozenset(" \t\n\f\r\xa0")
_INVISIBLE = frozenset("​­")


# vectorized equivalents of the reference's per-char loop
# (StringUtil.kt:165-191): invisible chars are dropped FIRST (they don't
# break a whitespace run), then runs of actual-whitespace collapse to a
# single space; strip_leading removes a resulting leading space.
_INVISIBLE_DEL = {0x200B: None, 0xAD: None}
_WS_RUN_RE = re.compile(r"[ \t\n\f\r\xa0]+")


# matches only whitespace runs that normalization would CHANGE (any run
# containing a non-space ws char, or 2+ spaces) — a zero-match sub
# returns the original string without a rebuild, and typical prose text
# (single spaces between words) has zero matches
_WS_CHANGE_RE = re.compile(r" *[\t\n\f\r\xa0][ \t\n\f\r\xa0]*| {2,}")
_MULTI_SPACE_RE = re.compile(r" {2,}")


def _collapse_ws(s: str) -> str:
    """Collapse runs of {space,\\t,\\n,\\f,\\r,\\xa0} to one space —
    identical to ``_WS_CHANGE_RE.sub(" ", s)`` but via C-level
    ``str.replace`` scans (memchr-fast, no-op when a char is absent)
    plus one simple-class regex: ~5× faster on separator-laden text,
    ~25× on already-clean prose."""
    if "\n" in s:
        s = s.replace("\n", " ")
    if "\t" in s:
        s = s.replace("\t", " ")
    if "\f" in s:
        s = s.replace("\f", " ")
    if "\r" in s:
        s = s.replace("\r", " ")
    if "\xa0" in s:
        s = s.replace("\xa0", " ")
    if "  " in s:
        s = _MULTI_SPACE_RE.sub(" ", s)
    return s


def normalise_whitespace(string: str) -> str:
    if "​" in string or "\xad" in string:
        string = string.translate(_INVISIBLE_DEL)
    return _collapse_ws(string)


def append_normalised_whitespace(accum: list[str], string: str,
                                 strip_leading: bool) -> None:
    """StringUtil.appendNormalisedWhitespace (StringUtil.kt:165-191).

    ``accum`` is a list of str fragments (our StringBuilder).
    """
    out = normalise_whitespace(string)
    if strip_leading and out.startswith(" "):
        out = out[1:]
    accum.append(out)


def _last_char_is_whitespace(accum: list[str]) -> bool:
    for frag in reversed(accum):
        if frag:
            return frag[-1] == " "
    return False


def _accum_nonempty(accum: list[str]) -> bool:
    return any(accum)


# ---------------------------------------------------------------------------
# Attributes

_INTERNAL_PREFIX = "/ksoup."

_BOOLEAN_ATTRIBUTES = frozenset((
    "allowfullscreen", "async", "autofocus", "checked", "compact", "declare",
    "default", "defer", "disabled", "formnovalidate", "hidden", "inert",
    "ismap", "itemscope", "multiple", "muted", "nohref", "noresize",
    "noshade", "novalidate", "nowrap", "open", "readonly", "required",
    "reversed", "seamless", "selected", "sortable", "truespeed",
    "typemustmatch",
))

_XML_KEY_VALID = re.compile(r"[a-zA-Z_:][-a-zA-Z0-9_:.]*$")
_XML_KEY_REPLACE = re.compile(r"[^-a-zA-Z0-9_:.]+")
_HTML_KEY_INVALID = re.compile(r"[\x00-\x1f\x7f-\x9f \"'/=]+")


def is_boolean_attribute(key: str) -> bool:
    """Attribute.isBooleanAttribute (Attribute.kt) — case-insensitive."""
    return key.lower() in _BOOLEAN_ATTRIBUTES


def _valid_attr_key(key: str, syntax: str) -> str | None:
    """Attribute.getValidKey (Attribute.kt:256-...)."""
    if syntax == "xml":
        if _XML_KEY_VALID.match(key):
            return key
        new = _XML_KEY_REPLACE.sub("_", key)
        return new if _XML_KEY_VALID.match(new) else None
    # html
    if not key:
        return None
    if _HTML_KEY_INVALID.search(key):
        new = _HTML_KEY_INVALID.sub("_", key)
        return new if new and not _HTML_KEY_INVALID.search(new) else None
    return key


def _should_collapse_attribute(key: str, val: str | None, syntax: str) -> bool:
    """Attribute.shouldCollapseAttribute (Attribute.kt:167-233)."""
    return syntax == "html" and (
        val is None
        or ((val == "" or val.lower() == key.lower())
            and key.lower() in _BOOLEAN_ATTRIBUTES)
    )


class Attribute:
    """A single key+value attribute view (reference Attribute.kt — used
    for presentation; an optional parent Attributes receives writes)."""

    __slots__ = ("_key", "_value", "parent")

    def __init__(self, key: str, value: str | None,
                 parent: "Attributes | None" = None):
        key = key.strip()
        if not key:
            raise ValueError("String must not be empty")
        self._key = key
        self._value = value
        self.parent = parent

    @property
    def key(self) -> str:
        return self._key

    @property
    def value(self) -> str:
        return self._value if self._value is not None else ""

    def set_key(self, key: str) -> None:
        key = key.strip()
        if not key:
            raise ValueError("String must not be empty")
        if self.parent is not None:
            self.parent.rename(self._key, key)
        self._key = key

    def set_value(self, value: str | None) -> str:
        """Sets the value; returns the PREVIOUS value ("" for None —
        Attribute.kt setValue returns the old value, never null)."""
        old = self._value
        if self.parent is not None:
            if self.parent.has_key(self._key):
                old = self.parent._d.get(self._key)
            self.parent.put(self._key, value)
        self._value = value
        return old if old is not None else ""

    def has_declared_value(self) -> bool:
        return self._value is not None

    def html(self) -> str:
        accum: list[str] = []
        out = OutputSettings()
        valid = _valid_attr_key(self._key, out.syntax)
        if valid is not None:
            accum.append(valid)
            if not _should_collapse_attribute(valid, self._value,
                                              out.syntax):
                accum.append('="')
                accum.append(E.escape(self._value or "", out.escape_mode,
                                      out.syntax, out.charset,
                                      E.FOR_ATTRIBUTE))
                accum.append('"')
        return "".join(accum)

    def clone(self) -> "Attribute":
        return Attribute(self._key, self._value)

    def __eq__(self, other: object) -> bool:
        if not isinstance(other, Attribute):
            return NotImplemented
        return self._key == other._key and self._value == other._value

    def __hash__(self) -> int:
        return hash((self._key, self._value))

    def __repr__(self) -> str:  # pragma: no cover
        return self.html()


class Attributes:
    """Insertion-ordered attribute map (reference Attributes.kt).

    Values may be None (attribute declared with no value). Internal keys
    (prefixed ``/ksoup.``) are get-able but never serialized.
    """

    __slots__ = ("_d", "_ranges")

    def __init__(self) -> None:
        self._d: dict[str, str | None] = {}
        # key -> (name_start, name_end, val_start, val_end) source
        # offsets (Range.AttributeRange); lazily created
        self._ranges: dict[str, tuple[int, int, int, int]] | None = None

    # -- core map ops
    def get(self, key: str) -> str:
        v = self._d.get(key)
        return v if v is not None else ""

    def get_ignore_case(self, key: str) -> str:
        lk = key.lower()
        for k, v in self._d.items():
            if k.lower() == lk:
                return v if v is not None else ""
        return ""

    def has_key(self, key: str) -> bool:
        return key in self._d

    def has_key_ignore_case(self, key: str) -> bool:
        lk = key.lower()
        return any(k.lower() == lk for k in self._d)

    def has_declared_value(self, key: str) -> bool:
        return self._d.get(key) is not None

    def has_declared_value_ignore_case(self, key: str) -> bool:
        """Attributes.hasDeclaredValueForKeyIgnoreCase."""
        lk = key.lower()
        return any(k.lower() == lk and v is not None
                   for k, v in self._d.items())

    @staticmethod
    def internal_key(key: str) -> str:
        """Attributes.internalKey — keys carried on the node but never
        iterated or serialized (Attributes.kt)."""
        return _INTERNAL_PREFIX + key

    def as_list(self) -> list[tuple[str, str | None]]:
        """Attributes.asList() — external attributes only, raw values."""
        return [(k, v) for k, v in self._d.items()
                if not k.startswith(_INTERNAL_PREFIX)]

    def put(self, key: str, value: str | None) -> "Attributes":
        self._d[key] = value
        return self

    def put_ignore_case(self, key: str, value: str | None) -> None:
        lk = key.lower()
        for k in self._d:
            if k.lower() == lk:
                self._d[k] = value
                if k != key:
                    # replace key in place, preserving order
                    self._d = {key if kk == k else kk: vv
                               for kk, vv in self._d.items()}
                return
        self._d[key] = value

    def add(self, key: str, value: str | None) -> None:
        """Append without dedup-check (tokenizer has already deduped)."""
        self._d[key] = value

    def remove(self, key: str) -> None:
        self._d.pop(key, None)

    def remove_ignore_case(self, key: str) -> None:
        lk = key.lower()
        for k in list(self._d):
            if k.lower() == lk:
                del self._d[k]

    def rename(self, old: str, new: str) -> None:
        if old == new:
            return
        if old in self._d:
            self._d = {(new if k == old else k): v for k, v in self._d.items()}
            if self._ranges is not None and old in self._ranges:
                # Attribute.setKey keeps the source range (PositionTest
                # updateKeyMaintainsRange)
                self._ranges[new] = self._ranges.pop(old)

    def __len__(self) -> int:
        return sum(1 for k in self._d if not k.startswith(_INTERNAL_PREFIX))

    def size(self) -> int:
        """Attributes.size() — reference-named alias of len()."""
        return len(self)

    def __iter__(self) -> Iterator[tuple[str, str]]:
        for k, v in self._d.items():
            if not k.startswith(_INTERNAL_PREFIX):
                yield k, (v if v is not None else "")

    def items_raw(self) -> Iterator[tuple[str, str | None]]:
        return iter(self._d.items())

    def normalize(self) -> None:
        """Lowercase all keys (ParseSettings html default)."""
        if any(k != k.lower() for k in self._d):
            nd: dict[str, str | None] = {}
            for k, v in self._d.items():
                lk = k.lower()
                if lk not in nd:
                    nd[lk] = v
                    if self._ranges is not None and k in self._ranges:
                        self._ranges[lk] = self._ranges.pop(k)
            self._d = nd

    def clone(self) -> "Attributes":
        a = Attributes()
        a._d = dict(self._d)
        if self._ranges is not None:
            a._ranges = dict(self._ranges)
        return a

    def set_source_range(self, key: str,
                         rng: tuple[int, int, int, int]) -> None:
        if self._ranges is None:
            self._ranges = {}
        self._ranges[key] = rng

    def source_range(self, key: str) -> tuple[int, int, int, int] | None:
        """Attributes.sourceRange(key) — (name_start, name_end,
        val_start, val_end) offsets, or None if untracked."""
        if self._ranges is None:
            return None
        return self._ranges.get(key)

    def dataset(self) -> dict[str, str]:
        return {k[5:]: (v or "") for k, v in self._d.items()
                if k.startswith("data-") and len(k) > 5}

    # -- serialization (Attributes.kt:444-455)
    def html_to(self, accum: list[str], out: "OutputSettings") -> None:
        for k, v in self._d.items():
            if k.startswith(_INTERNAL_PREFIX):
                continue
            valid = _valid_attr_key(k, out.syntax)
            if valid is None:
                continue
            accum.append(" ")
            accum.append(valid)
            if not _should_collapse_attribute(valid, v, out.syntax):
                accum.append('="')
                accum.append(E.escape(v or "", out.escape_mode, out.syntax,
                                      out.charset, E.FOR_ATTRIBUTE))
                accum.append('"')

    def html(self) -> str:
        accum: list[str] = []
        self.html_to(accum, OutputSettings())
        return "".join(accum)

    def __repr__(self) -> str:  # pragma: no cover
        return f"Attributes({self._d!r})"

    def __eq__(self, other: object) -> bool:
        if not isinstance(other, Attributes):
            return NotImplemented
        return self._d == other._d

    def __hash__(self) -> int:
        return hash(tuple(self._d.items()))


# ---------------------------------------------------------------------------
# Output settings

class OutputSettings:
    """Document.OutputSettings (Document.kt:368-560). Defaults match.
    Setting ``syntax = "xml"`` switches escape mode to xhtml, as the
    reference's syntax() setter does."""

    __slots__ = ("escape_mode", "charset", "_syntax", "pretty_print",
                 "outline", "indent_amount", "max_padding_width")

    def __init__(self) -> None:
        self.escape_mode = E.ESCAPE_BASE
        self.charset = "UTF-8"
        self._syntax = "html"
        self.pretty_print = True
        self.outline = False
        self.indent_amount = 1
        self.max_padding_width = 30

    @property
    def syntax(self) -> str:
        return self._syntax

    @syntax.setter
    def syntax(self, value: str) -> None:
        self._syntax = value
        if value == "xml":
            self.escape_mode = E.ESCAPE_XHTML

    def clone(self) -> "OutputSettings":
        o = OutputSettings()
        for s in OutputSettings.__slots__:
            setattr(o, s, getattr(self, s))
        return o


def _padding(width: int, max_width: int) -> str:
    if max_width != -1:
        width = min(width, max_width)
    return " " * width


# ---------------------------------------------------------------------------
# Nodes

class Node:
    """Base DOM node (reference Node.kt:28)."""

    __slots__ = ("parent_node", "sibling_index")

    def __init__(self) -> None:
        self.parent_node: Element | None = None
        self.sibling_index: int = 0

    # -- identity
    def node_name(self) -> str:
        raise NotImplementedError

    def normal_name(self) -> str:
        return self.node_name()

    def name_is(self, name: str) -> bool:
        return self.normal_name() == name

    def element_is(self, name: str, namespace: str) -> bool:
        """Node.elementIs(normalName, namespace) (Node.kt)."""
        from .dom import Element  # self-reference safe at runtime
        return (isinstance(self, Element)
                and self.normal_name() == name
                and self.tag.namespace == namespace)

    # -- attributes (base: none)
    def attributes(self) -> Attributes | None:
        return None

    def has_same_value(self, other: "Node") -> bool:
        """Node.hasSameValue — content equality (outerHtml), while
        ==/hash stay identity (Node.kt hasSameValue)."""
        if self is other:
            return True
        return self.outer_html() == other.outer_html()

    def attributes_size(self) -> int:
        """Node.attributesSize — 0 without vivifying the map."""
        a = self.attributes()
        return a.size() if a is not None else 0

    def has_child_nodes(self) -> bool:
        return self.child_node_size() > 0

    def is_effectively_first(self) -> bool:
        """Node.isEffectivelyFirst (Node.kt:747-754): first child, or
        second behind a blank text node."""
        if self.sibling_index == 0:
            return True
        if self.sibling_index == 1:
            prev = self.previous_sibling()
            return isinstance(prev, TextNode) and prev.is_blank()
        return False

    def has_attributes(self) -> bool:
        """Node.hasAttributes — without materializing a lazy map."""
        a = self.attributes()
        return a is not None and a.size() > 0

    def clear_attributes(self) -> "Node":
        """Node.clearAttributes — remove every (external) attribute."""
        a = self.attributes()
        if a is not None:
            for k, _ in list(a):
                a.remove(k)
        return self

    def attr(self, key: str) -> str:
        a = self.attributes()
        if a is None:
            return ""
        # a LITERAL "abs:xxx" attribute wins over resolution
        # (Node.kt:102-113 getIgnoreCase first)
        if a.has_key(key):
            return a.get(key)
        if key.startswith("abs:"):
            return self.abs_url(key[4:])
        return ""

    def has_attr(self, key: str) -> bool:
        a = self.attributes()
        if a is None:
            return False
        if key.startswith("abs:"):
            k = key[4:]
            if a.has_key_ignore_case(k) and self.abs_url(k) != "":
                return True
            # fall through: a literal "abs:xxx" attribute also counts
        return a.has_key_ignore_case(key)

    def base_uri(self) -> str:
        n: Node | None = self
        while n is not None:
            if isinstance(n, Element):
                a = n.attributes()
                if a is not None and a.has_key(_BASE_URI_KEY):
                    return a.get(_BASE_URI_KEY)
            n = n.parent_node
        return ""

    def set_base_uri(self, base_uri: str) -> None:
        """Node.setBaseUri — recursive: this subtree resolves against the
        new base (Node.kt doSetBaseUri traverses; our storage walks up,
        so set here and clear any overriding descendant keys)."""
        for n in self.node_stream():
            if isinstance(n, Element) and n._attrs is not None:
                n._attrs.remove(_BASE_URI_KEY)
        target = self if isinstance(self, Element) else self.parent_node
        if isinstance(target, Element):
            target._ensure_attrs().put(_BASE_URI_KEY, base_uri)

    def abs_url(self, attribute_key: str) -> str:
        from .urlutil import resolve  # lazy import to avoid cycle
        if not self.has_attr(attribute_key):
            return ""
        rel = self.attributes().get_ignore_case(attribute_key)  # type: ignore[union-attr]
        return resolve(self.base_uri(), rel)

    def for_each_node(self, action) -> "Node":
        """Node.forEachNode: apply ``action`` to this node and every
        descendant node (snapshot order — mutation-safe)."""
        for n in list(self.node_stream()):
            action(n)
        return self

    def child_nodes_copy(self) -> list["Node"]:
        """Node.childNodesCopy — independent deep clones of children."""
        return [c.clone() for c in self.child_nodes()]

    # -- tree
    def child_nodes(self) -> list["Node"]:
        return []

    def child_node_size(self) -> int:
        return 0

    def parent(self) -> "Element | None":
        return self.parent_node

    def root(self) -> "Node":
        n: Node = self
        while n.parent_node is not None:
            n = n.parent_node
        return n

    def owner_document(self) -> "Document | None":
        r = self.root()
        return r if isinstance(r, Document) else None

    def next_sibling(self) -> "Node | None":
        if self.parent_node is None:
            return None
        sibs = self.parent_node.child_nodes()
        i = self.sibling_index + 1
        return sibs[i] if i < len(sibs) else None

    def previous_sibling(self) -> "Node | None":
        if self.parent_node is None or self.sibling_index == 0:
            return None
        return self.parent_node.child_nodes()[self.sibling_index - 1]

    def remove(self) -> None:
        if self.parent_node is not None:
            self.parent_node.remove_child(self)

    def replace_with(self, replacement: "Node") -> None:
        assert self.parent_node is not None
        self.parent_node.replace_child(self, replacement)

    def before(self, node: "Node | str") -> None:
        assert self.parent_node is not None
        if isinstance(node, str):
            # reference Node.before(html) overload: parse + insert
            self.before_html(node)
            return
        # unlink FIRST so self.sibling_index reflects the post-removal
        # list when moving a node within the same parent (NodeTest
        # beforeShuffle: moving an already-preceding sibling is a no-op)
        if node.parent_node is not None:
            node.parent_node.remove_child(node)
        self.parent_node.add_children_at(self.sibling_index, [node])

    def after(self, node: "Node | str") -> None:
        assert self.parent_node is not None
        if isinstance(node, str):
            self.after_html(node)
            return
        if node.parent_node is not None:
            node.parent_node.remove_child(node)
        self.parent_node.add_children_at(self.sibling_index + 1, [node])

    def sibling_nodes(self) -> list["Node"]:
        """Node.siblingNodes — all of the parent's children except self."""
        if self.parent_node is None:
            return []
        return [n for n in self.parent_node.child_nodes() if n is not self]

    def unwrap(self) -> "Node | None":
        """Remove this node, promoting its children (Node.kt:422-...)."""
        assert self.parent_node is not None
        kids = list(self.child_nodes())
        first = kids[0] if kids else None
        self.parent_node.add_children_at(self.sibling_index, kids)
        self.remove()
        return first

    # -- clone (reference Node.kt clone/shallowClone/doClone:817-872)
    def _copy_node(self) -> "Node":
        """Raw per-node copy: slots duplicated, attrs cloned, no parent,
        no children."""
        cls = self.__class__
        new = cls.__new__(cls)
        for klass in cls.__mro__:
            for slot in getattr(klass, "__slots__", ()):
                if hasattr(self, slot):
                    setattr(new, slot, getattr(self, slot))
        new.parent_node = None
        new.sibling_index = 0
        attrs = getattr(self, "_attrs", None)
        if attrs is not None:
            new._attrs = attrs.clone()
        if isinstance(new, Element):
            new._child_nodes = []
        if isinstance(new, Document):
            new.output_settings = self.output_settings.clone()
        return new

    def shallow_clone(self) -> "Node":
        """Copy of this node only, no children. Like the reference, a
        non-Document clone is placed in a shallow-cloned owner-Document
        shell so base URI and output settings survive (doClone:860-868)."""
        new = self._copy_node()
        if not isinstance(self, Document):
            doc = self.owner_document()
            if doc is not None:
                shell = doc._copy_node()
                shell.append_child(new)
        return new

    def clone(self) -> "Node":
        """Deep copy of this node and its descendants (iterative — deep
        DOMs don't recurse), in an owner-Document shell when applicable."""
        root = self.shallow_clone()
        if not isinstance(self, Element):
            return root
        stack: list = [(self, root)]
        while stack:
            src, dst = stack.pop()
            for child in src._child_nodes:
                c = child._copy_node()
                c.parent_node = dst
                c.sibling_index = len(dst._child_nodes)
                dst._child_nodes.append(c)
                if isinstance(child, Element):
                    stack.append((child, c))
        return root

    # -- html-string insertion variants (reference Node.kt / Element.kt)
    def _parse_frag(self, html: str) -> list["Node"]:
        from . import parser
        context = self.parent_node if isinstance(self.parent_node, Element) \
            else (self if isinstance(self, Element) else None)
        return list(parser.parse_fragment(html, context, self.base_uri()))

    def before_html(self, html: str) -> "Node":
        assert self.parent_node is not None
        self.parent_node.add_children_at(self.sibling_index,
                                         self._parse_frag(html))
        return self

    def after_html(self, html: str) -> "Node":
        assert self.parent_node is not None
        self.parent_node.add_children_at(self.sibling_index + 1,
                                         self._parse_frag(html))
        return self

    def wrap(self, html: str) -> "Node":
        """Wrap this node in the given HTML (Node.kt wrap): the fragment's
        first element becomes the wrapper; this node moves into its
        deepest first-element descendant; trailing fragment nodes are
        inserted after the wrapper."""
        nodes = self._parse_frag(html)
        wrapper = nodes[0] if nodes else None
        if not isinstance(wrapper, Element):
            return self
        deepest = wrapper
        while True:
            nxt = deepest.first_element_child()
            if nxt is None:
                break
            deepest = nxt
        parent = self.parent_node
        if parent is not None:
            parent.replace_child(self, wrapper)
        deepest.append_child(self)
        # remainder nodes ride along after the wrapper
        for rem in nodes[1:]:
            if rem is wrapper:
                continue
            if rem.parent_node is not None:
                rem.parent_node.remove_child(rem)
            wrapper.after(rem)
        return self

    # -- traversal
    def node_stream(self) -> Iterator["Node"]:
        """DFS pre-order over this node + descendants (iterative)."""
        stack: list[Node] = [self]
        while stack:
            n = stack.pop()
            yield n
            kids = n.child_nodes()
            if kids:
                stack.extend(reversed(kids))

    def traverse(self, head: Callable[["Node", int], None],
                 tail: Callable[["Node", int], None] | None = None) -> None:
        """NodeTraversor.traverse (NodeTraversor.kt:22-66), iterative
        pointer walk — structural changes (remove / replaceWith / append
        of children) during ``head`` are supported, exactly as in the
        reference: a node removed in head is not tailed; a replaced node
        resumes at its replacement; children appended in head ARE
        visited, children appended in tail are not.
        """
        root = self
        node: Node | None = root
        depth = 0
        while node is not None:
            parent = node.parent_node
            orig_size = len(parent.child_nodes()) if parent is not None else 0
            nxt = node.next_sibling()
            head(node, depth)
            if parent is not None and node.parent_node is None:
                # removed or replaced during head
                if orig_size == len(parent.child_nodes()):  # replaced
                    node = parent.child_nodes()[node.sibling_index]
                else:  # removed
                    node = nxt
                    if node is None:  # last one, go up
                        node = parent
                        depth -= 1
                    continue  # don't tail removed
            if node.child_nodes():  # descend
                node = node.child_nodes()[0]
                depth += 1
            else:
                while node.next_sibling() is None and depth > 0:
                    if tail is not None:
                        tail(node, depth)
                    node = node.parent_node
                    depth -= 1
                if tail is not None:
                    tail(node, depth)
                if node is root:
                    break
                node = node.next_sibling()

    # -- output
    def outer_html(self) -> str:
        accum: list[str] = []
        out = _output_settings_of(self)
        self._outer_html_to(accum, out)
        return "".join(accum)

    def _outer_html_to(self, accum: list[str], out: OutputSettings) -> None:
        """Iterative head/tail serialization walk (Node.kt:698-741)."""
        stack: list[tuple[Node, int, int]] = [(self, 0, 0)]
        self.outer_html_head(accum, 0, out)
        while stack:
            node, idx, depth = stack[-1]
            kids = node.child_nodes()
            if idx < len(kids):
                stack[-1] = (node, idx + 1, depth)
                child = kids[idx]
                child.outer_html_head(accum, depth + 1, out)
                stack.append((child, 0, depth + 1))
            else:
                stack.pop()
                node.outer_html_tail(accum, depth, out)

    def outer_html_head(self, accum: list[str], depth: int,
                        out: OutputSettings) -> None:
        raise NotImplementedError

    def outer_html_tail(self, accum: list[str], depth: int,
                        out: OutputSettings) -> None:
        pass

    def _indent(self, accum: list[str], depth: int, out: OutputSettings) -> None:
        accum.append("\n")
        accum.append(_padding(depth * out.indent_amount, out.max_padding_width))

    def __repr__(self) -> str:  # pragma: no cover
        return f"{type(self).__name__}({self.node_name()!r})"


_BASE_URI_KEY = _INTERNAL_PREFIX + "baseUri"


def _output_settings_of(node: Node) -> OutputSettings:
    doc = node.owner_document()
    return doc.output_settings if doc is not None else OutputSettings()


class LeafNode(Node):
    """Value-holding node without children (reference LeafNode.kt)."""

    __slots__ = ("value", "_attrs", "span")

    def __init__(self, value: str):
        super().__init__()
        self.value = value
        self._attrs: Attributes | None = None
        # (start, end) offsets into the decoded source document, stamped
        # by the tree builder (reference Range tracking, Range.kt) —
        # None for synthetic nodes
        self.span: tuple | None = None

    def attributes(self) -> Attributes:
        """LeafNode.attributes() — vivifies, moving the core value into
        the map under the node name (LeafNode.kt ensureAttributes)."""
        if self._attrs is None:
            self._attrs = Attributes()
            self._attrs.put(self.node_name(), self.value)
        return self._attrs

    def has_attributes(self) -> bool:
        return self._attrs is not None

    def _ensure_attrs(self) -> Attributes:
        if self._attrs is None:
            self._attrs = Attributes()
        return self._attrs

    def core_value(self) -> str:
        return self.value

    def set_core_value(self, value: str) -> None:
        """LeafNode.coreValue(String) — kept in sync with the vivified
        attribute slot when present."""
        self.value = value
        if self._attrs is not None:
            self._attrs.put(self.node_name(), value)

    def attr(self, key: str) -> str:
        if self._attrs is None:
            return self.value if key == self.node_name() else ""
        if self._attrs.has_key(key):
            return self._attrs.get(key)
        if key.startswith("abs:"):
            return self.abs_url(key[4:])
        return ""

    def set_attr(self, key: str, value) -> "LeafNode":
        """Node.attr(key, value) on a leaf: the node-name key routes to
        the core value (LeafNode.kt attr)."""
        if self._attrs is None and key == self.node_name():
            self.value = value if value is not None else ""
        else:
            self.attributes().put(key, value)
            if key == self.node_name():
                self.value = value if value is not None else ""
        return self

    def has_attr(self, key: str) -> bool:
        if self._attrs is None:
            return key == self.node_name()
        return super().has_attr(key)

    def remove_attr(self, key: str) -> "LeafNode":
        if self._attrs is not None:
            self._attrs.remove(key)
        return self

    def empty(self) -> "LeafNode":
        return self


class TextNode(LeafNode):
    """nodes/TextNode.kt:11"""

    __slots__ = ()

    def node_name(self) -> str:
        return "#text"

    def text(self) -> str:
        return normalise_whitespace(self.get_whole_text())

    def set_text(self, text: str) -> "TextNode":
        """TextNode.text(String) setter (TextNode.kt)."""
        self.set_core_value(text)
        return self

    def get_whole_text(self) -> str:
        return self.value

    def is_blank(self) -> bool:
        # StringUtil.isBlank: spec whitespace only (nbsp is NOT blank)
        return self.value.strip(" \t\n\f\r") == ""

    def split_text(self, offset: int) -> "TextNode":
        if offset < 0:
            raise ValueError("Split offset must be not be negative")
        if offset > len(self.value):
            raise ValueError(
                "Split offset must not be greater than current text length")
        head, tail = self.value[:offset], self.value[offset:]
        self.set_core_value(head)
        tail_node = TextNode(tail)
        if self.parent_node is not None:
            self.parent_node.add_children_at(self.sibling_index + 1, [tail_node])
        return tail_node

    def outer_html_head(self, accum: list[str], depth: int,
                        out: OutputSettings) -> None:
        # TextNode.kt:61-92
        pretty = out.pretty_print
        parent = self.parent_node
        normalise_white = pretty and not Element.preserve_whitespace(parent)
        options = E.FOR_TEXT
        if normalise_white:
            options |= E.NORMALISE
            trim_like_block = parent is not None and (
                parent.tag.is_block or parent.tag.format_as_block)
            if (trim_like_block and self.sibling_index == 0) or \
                    isinstance(parent, Document):
                options |= E.TRIM_LEADING
            if trim_like_block and self.next_sibling() is None:
                options |= E.TRIM_TRAILING
            nxt = self.next_sibling()
            prev = self.previous_sibling()
            is_blank = self.is_blank()
            could_skip = (
                (isinstance(nxt, Element) and nxt.should_indent(out))
                or (isinstance(nxt, TextNode) and nxt.is_blank())
                or (isinstance(prev, Element)
                    and (prev.is_block() or prev.name_is("br")))
            )
            if could_skip and is_blank:
                return
            if ((prev is None and parent is not None
                 and parent.tag.format_as_block and not is_blank)
                    or (out.outline and self._has_siblings() and not is_blank)
                    or (prev is not None and prev.name_is("br"))):
                self._indent(accum, depth, out)
        accum.append(E.escape(self.value, out.escape_mode, out.syntax,
                              out.charset, options))

    def _has_siblings(self) -> bool:
        return self.parent_node is not None and \
            len(self.parent_node.child_nodes()) > 1


class CDataNode(TextNode):
    """nodes/CDataNode.kt"""

    __slots__ = ()

    def node_name(self) -> str:
        return "#cdata"

    def text(self) -> str:
        return self.get_whole_text()

    def outer_html_head(self, accum: list[str], depth: int,
                        out: OutputSettings) -> None:
        accum.append("<![CDATA[")
        accum.append(self.get_whole_text())

    def outer_html_tail(self, accum: list[str], depth: int,
                        out: OutputSettings) -> None:
        accum.append("]]>")


class DataNode(LeafNode):
    """script/style body (nodes/DataNode.kt)."""

    __slots__ = ()

    def node_name(self) -> str:
        return "#data"

    def get_whole_data(self) -> str:
        return self.value

    @property
    def is_packed(self) -> bool:
        """True for p,a,c,k,e,d-obfuscated script bodies (DataNode.kt
        isPacked)."""
        return (self.parent_node is not None
                and self.parent_node.normal_name() == "script"
                and _PACKED_RE.search(self.value) is not None)

    def get_unpacked_data(self) -> str:
        """De-obfuscate a packed script body (DataNode.kt
        getUnpackedData + internal/Unbaser.kt)."""
        data = self.value
        if not self.is_packed:
            return data

        def unpack(m: "re.Match[str]") -> str:
            out = []
            for em in _PACKED_EXTRACT_RE.finditer(m.group(0)):
                payload, radix_s, count_s, symtab_s = em.groups()
                symtab = symtab_s.split("|")
                radix = int(radix_s) if radix_s.isdigit() else 10
                if not count_s.isdigit() or len(symtab) != int(count_s):
                    continue
                unbase = _unbaser(radix)
                out.append(re.sub(
                    r"\b\w+\b",
                    lambda wm: symtab[unbase(wm.group(0))] or wm.group(0),
                    payload))
            return "".join(out)

        return _PACKED_RE.sub(unpack, data)

    def outer_html_head(self, accum: list[str], depth: int,
                        out: OutputSettings) -> None:
        # For XML output, escape the DataNode in a CDATA section unless it
        # already holds pseudo-CData (DataNode.kt outerHtmlHead); in HTML,
        # data is NOT escaped (raw script/style bodies).
        data = self.value
        if out.syntax == "xml" and "<![CDATA[" not in data:
            parent = self.parent_node
            pname = parent.normal_name() if parent is not None else ""
            if pname == "script":
                accum.append("//<![CDATA[\n")
                accum.append(data)
                accum.append("\n//]]>")
            elif pname == "style":
                accum.append("/*<![CDATA[*/\n")
                accum.append(data)
                accum.append("\n/*]]>*/")
            else:
                accum.append("<![CDATA[")
                accum.append(data)
                accum.append("]]>")
            return
        accum.append(data)


# packed-JS detection/unpacking (DataNode.kt companion + internal/Unbaser.kt)
_PACKED_RE = re.compile(
    r"eval[(]function[(]p,a,c,k,e,[rd][)][{].*?[}][)]{2}",
    re.IGNORECASE | re.DOTALL)
_PACKED_EXTRACT_RE = re.compile(
    r"[}][(]'(.*)', *(\d+), *(\d+), *'(.*?)'[.]split[(]'[|]'[)]",
    re.IGNORECASE | re.DOTALL)

_UNBASE_ALPHABET = {
    52: "0123456789abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOP",
    54: "0123456789abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQR",
    62: "0123456789abcdefghijklmnopqrstuvwxyz"
        "ABCDEFGHIJKLMNOPQRSTUVWXYZ",
    95: " !\"#$%&\\'()*+,-./0123456789:;<=>?@"
        "ABCDEFGHIJKLMNOPQRSTUVWXYZ[\\]^_`abcdefghijklmnopqrstuvwxyz{|}~",
}


def _unbaser(base: int):
    """internal/Unbaser.kt — base-N string → int decoder."""
    if 2 <= base <= 36:
        def unbase(value: str) -> int:
            try:
                return int(value, base)
            except ValueError:
                return 0
        return unbase
    selector = 95 if base > 62 else 62 if base > 54 else \
        54 if base > 52 else 52
    dict_ = {c: i for i, c in enumerate(_UNBASE_ALPHABET[selector])}

    def unbase(value: str) -> int:
        total = 0
        for i, cipher in enumerate(reversed(value)):
            total += int(float(base) ** i * dict_.get(cipher, 0))
        return total
    return unbase


class Comment(LeafNode):
    """nodes/Comment.kt"""

    __slots__ = ()

    def node_name(self) -> str:
        return "#comment"

    def get_data(self) -> str:
        return self.value

    def set_data(self, data: str) -> "Comment":
        self.value = data
        return self

    def is_xml_declaration(self) -> bool:
        return _is_xml_declaration_data(self.value)

    def as_xml_declaration(self) -> "XmlDeclaration | None":
        """Cast a bogus comment to an XML declaration if it parses as one
        (Comment.kt asXmlDeclaration)."""
        data = self.value
        decl_content = data[1:-1]
        # bogus comment immediately followed by another: stay a comment
        if _is_xml_declaration_data(decl_content):
            return None
        from . import parser as _parser
        from .treebuilder import PRESERVE_CASE
        doc = _parser.parse(f"<{decl_content}>", self.base_uri(),
                            settings=PRESERVE_CASE)
        body = doc.body()
        if body is not None and body.children():
            el = body.children()[0]
            decl = XmlDeclaration(el.normal_name(), data.startswith("!"))
            attrs = el.attributes()
            if attrs is not None:
                for k, v in attrs.items_raw():
                    decl._ensure_attrs().put(k, v)
            return decl
        return None

    def outer_html_head(self, accum: list[str], depth: int,
                        out: OutputSettings) -> None:
        if (out.pretty_print
                and ((self.is_effectively_first()
                      and isinstance(self.parent_node, Element)
                      and self.parent_node.tag.format_as_block)
                     or out.outline)):
            self._indent(accum, depth, out)
        accum.append("<!--")
        accum.append(self.value)
        accum.append("-->")


def _is_xml_declaration_data(data: str) -> bool:
    return len(data) > 1 and (data.startswith("!") or data.startswith("?"))


class DocumentType(LeafNode):
    """nodes/DocumentType.kt"""

    __slots__ = ("name", "public_id", "system_id")

    def __init__(self, name: str, public_id: str, system_id: str):
        super().__init__(name)
        self.name = name
        self.public_id = public_id
        self.system_id = system_id

    def node_name(self) -> str:
        return "#doctype"

    def outer_html_head(self, accum: list[str], depth: int,
                        out: OutputSettings) -> None:
        # DocumentType.kt outerHtmlHead
        # newline when the doctype has a preceding node (a comment)
        if self.sibling_index > 0 and out.pretty_print:
            accum.append("\n")
        if out.syntax == "html" and not self.public_id and not self.system_id:
            accum.append("<!doctype")
        else:
            accum.append("<!DOCTYPE")
        if self.name:
            accum.append(" ")
            accum.append(self.name)
        if self.public_id:
            accum.append(' PUBLIC "')
            accum.append(self.public_id)
            accum.append('"')
        if self.system_id:
            if not self.public_id:
                accum.append(" SYSTEM")
            accum.append(' "')
            accum.append(self.system_id)
            accum.append('"')
        accum.append(">")


class XmlDeclaration(LeafNode):
    """nodes/XmlDeclaration.kt"""

    __slots__ = ("is_processing_instruction",)

    def __init__(self, name: str, is_processing_instruction: bool):
        super().__init__(name)
        self.is_processing_instruction = is_processing_instruction

    def node_name(self) -> str:
        return "#declaration"

    def name(self) -> str:
        return self.value

    def get_whole_declaration(self, out: OutputSettings | None = None) -> str:
        """Attribute section of the declaration; empty values render
        bare (XmlDeclaration.kt getWholeDeclaration)."""
        out = out or OutputSettings()
        accum: list[str] = []
        self._whole_declaration_to(accum, out)
        return "".join(accum).strip()

    def _whole_declaration_to(self, accum: list[str],
                              out: OutputSettings) -> None:
        if self._attrs is None:
            return
        for key, value in self._attrs:
            if key == self.node_name():
                continue  # vivified core-value slot is not an attribute
            accum.append(" ")
            accum.append(key)
            if value:
                accum.append('="')
                accum.append(E.escape(value, out.escape_mode, out.syntax,
                                      out.charset, E.FOR_ATTRIBUTE))
                accum.append('"')

    def outer_html_head(self, accum: list[str], depth: int,
                        out: OutputSettings) -> None:
        accum.append("<")
        accum.append("!" if self.is_processing_instruction else "?")
        accum.append(self.value)
        self._whole_declaration_to(accum, out)
        accum.append("!" if self.is_processing_instruction else "?")
        accum.append(">")


class Element(Node):
    """Tag + attributes + children (reference Element.kt:28)."""

    __slots__ = ("tag", "_attrs", "_child_nodes", "span", "end_span")

    def __init__(self, tag: Tag | str, base_uri: str | None = None,
                 attrs: Attributes | None = None):
        super().__init__()
        if isinstance(tag, str):
            # Element(String) ctor uses preserve-case settings
            # (Element.kt:58-66: Tag.valueOf(tag, preserveCase))
            tag = tag_value_of(tag, preserve_case=True)
        self.tag: Tag = tag
        self._attrs: Attributes | None = attrs
        self._child_nodes: list[Node] = []
        # source offsets of the start/end tags (reference Range
        # tracking, nodes/Range.kt); None = implicit/synthetic
        self.span: tuple | None = None
        self.end_span: tuple | None = None
        if base_uri:
            self._ensure_attrs().put(_BASE_URI_KEY, base_uri)

    # -- identity / attributes
    def node_name(self) -> str:
        return self.tag.name

    def normal_name(self) -> str:
        return self.tag.normal_name

    def tag_name(self) -> str:
        return self.tag.name

    def attributes(self) -> Attributes | None:
        return self._attrs

    def _ensure_attrs(self) -> Attributes:
        if self._attrs is None:
            self._attrs = Attributes()
        return self._attrs

    def set_attr(self, key: str, value) -> "Element":
        """Node.attr(key, value) — the key is normalized per the owning
        parser's settings (HTML default lowercases; XML/preserve-case
        keeps it), then putIgnoreCase (Node.kt:137-144). A bool value is
        the Element.attr(key, Boolean) overload: True sets a boolean
        (valueless) attribute, False removes it (Element.kt)."""
        if value is True:
            value = None
        elif value is False:
            if self._attrs is not None:
                self._attrs.remove_ignore_case(key.strip().lower())
            return self
        doc = self.owner_document()
        settings = getattr(getattr(doc, "parser", None), "settings", None)
        if settings is not None:
            key = settings.normalize_attr(key)
        else:
            key = key.strip().lower()
        self._ensure_attrs().put_ignore_case(key, value)
        return self

    def id(self) -> str:
        return self._attrs.get_ignore_case("id") if self._attrs else ""

    def set_id(self, id_: str) -> "Element":
        """Element.id(String) setter overload (Element.kt)."""
        self.set_attr("id", id_)
        return self

    def class_name(self) -> str:
        return self._attrs.get_ignore_case("class").strip() if self._attrs else ""

    def class_names(self) -> list[str]:
        cn = self.class_name()
        return [c for c in _WS_RE.split(cn) if c] if cn else []

    def has_class(self, cls: str) -> bool:
        # Element.hasClass: case-insensitive per reference
        if self._attrs is None:
            return False
        v = self._attrs.get_ignore_case("class")
        if not v:
            return False
        lc = cls.lower()
        return any(c.lower() == lc for c in _WS_RE.split(v))

    def is_block(self) -> bool:
        return self.tag.is_block

    # -- children
    def child_nodes(self) -> list[Node]:
        return self._child_nodes

    def child_node_size(self) -> int:
        return len(self._child_nodes)

    def children(self) -> list["Element"]:
        return [n for n in self._child_nodes if isinstance(n, Element)]

    def child(self, i: int) -> "Element":
        return self.children()[i]

    def children_size(self) -> int:
        """Element.childrenSize — element children only."""
        return sum(1 for n in self._child_nodes if isinstance(n, Element))

    def first_element_child(self) -> "Element | None":
        for n in self._child_nodes:
            if isinstance(n, Element):
                return n
        return None

    def last_element_child(self) -> "Element | None":
        for n in reversed(self._child_nodes):
            if isinstance(n, Element):
                return n
        return None

    def first_child(self) -> Node | None:
        return self._child_nodes[0] if self._child_nodes else None

    def last_child(self) -> Node | None:
        return self._child_nodes[-1] if self._child_nodes else None

    def _reindex(self, start: int = 0) -> None:
        for i in range(start, len(self._child_nodes)):
            self._child_nodes[i].sibling_index = i

    def append_child(self, node: Node) -> "Element":
        if node.parent_node is not None:
            node.parent_node.remove_child(node)
        node.parent_node = self
        node.sibling_index = len(self._child_nodes)
        self._child_nodes.append(node)
        return self

    def prepend_child(self, node: Node) -> "Element":
        self.add_children_at(0, [node])
        return self

    def insert_children(self, index: int, children) -> "Element":
        """Element.insertChildren: negative index rolls around from the
        end (-1 == append); out-of-bounds raises (Element.kt)."""
        size = len(self._child_nodes)
        if index < 0:
            index += size + 1
        if not 0 <= index <= size:
            raise ValueError("Insert position out of bounds.")
        self.add_children_at(index, list(children))
        return self

    def add_children(self, *children: Node) -> "Element":
        """Element.addChildren(*nodes) — append, reparenting."""
        for node in children:
            self.append_child(node)
        return self

    def append_children(self, children) -> "Element":
        """Element.appendChildren(list)."""
        return self.insert_children(-1, children)

    def prepend_children(self, children) -> "Element":
        """Element.prependChildren(list)."""
        return self.insert_children(0, children)

    def prepend_element(self, tag_name: str) -> "Element":
        """Element.prependElement — new child element at position 0."""
        child = Element(tag_value_of(tag_name,
                                     namespace=self.tag.namespace))
        self.prepend_child(child)
        return child

    def add_children_at(self, index: int, children: list[Node]) -> None:
        # Bulk path (Element.kt addChildren fast reparent): unlink per
        # source parent with ONE filter + reindex, then ONE splice here
        # — O(n) total, not O(n^2) of per-node remove_child/insert
        # (ElementIT testFastReparent).
        by_parent: dict[int, Element] = {}
        for node in children:
            p = node.parent_node
            if p is not None:
                by_parent.setdefault(id(p), p)
        if by_parent:
            moving = {id(n) for n in children}
            for p in by_parent.values():
                kept = [n for n in p._child_nodes if id(n) not in moving]
                if len(kept) != len(p._child_nodes):
                    p._child_nodes = kept
                    p._reindex(0)
            for node in children:
                node.parent_node = None
        for node in children:
            node.parent_node = self
        self._child_nodes[index:index] = children
        self._reindex(index)

    def remove_child(self, node: Node) -> None:
        idx = node.sibling_index
        if idx < len(self._child_nodes) and self._child_nodes[idx] is node:
            del self._child_nodes[idx]
        else:  # defensive: find by identity
            for i, n in enumerate(self._child_nodes):
                if n is node:
                    del self._child_nodes[i]
                    idx = i
                    break
            else:
                return
        node.parent_node = None
        self._reindex(idx)

    def replace_child(self, out_node: Node, in_node: Node) -> None:
        if out_node is in_node:
            return  # no-op self replacement (Node.kt:483)
        if in_node.parent_node is not None:
            in_node.parent_node.remove_child(in_node)
        idx = out_node.sibling_index
        self._child_nodes[idx] = in_node
        in_node.parent_node = self
        in_node.sibling_index = idx
        out_node.parent_node = None

    def empty(self) -> "Element":
        for n in self._child_nodes:
            n.parent_node = None
        self._child_nodes.clear()
        return self

    # -- sibling / ancestor helpers
    def parents(self) -> list["Element"]:
        out: list[Element] = []
        p = self.parent()
        while p is not None and not isinstance(p, Document):
            out.append(p)
            p = p.parent()
        return out

    def sibling_elements(self) -> list["Element"]:
        if self.parent_node is None:
            return []
        return [e for e in self.parent_node.children() if e is not self]

    def next_element_sibling(self) -> "Element | None":
        n = self.next_sibling()
        while n is not None:
            if isinstance(n, Element):
                return n
            n = n.next_sibling()
        return None

    def previous_element_sibling(self) -> "Element | None":
        n = self.previous_sibling()
        while n is not None:
            if isinstance(n, Element):
                return n
            n = n.previous_sibling()
        return None

    def first_element_sibling(self) -> "Element":
        """First element child of the parent, or self when orphaned
        (reference nodes/Element.kt firstElementSibling)."""
        p = self.parent_node
        if isinstance(p, Element):
            first = p.first_element_child()
            if first is not None:
                return first
        return self

    def last_element_sibling(self) -> "Element":
        p = self.parent_node
        if isinstance(p, Element):
            for n in reversed(p._child_nodes):
                if isinstance(n, Element):
                    return n
        return self

    def element_sibling_index(self) -> int:
        if self.parent_node is None:
            return 0
        i = 0
        for e in self.parent_node.children():
            if e is self:
                return i
            i += 1
        return 0


    # -- descendants
    def descendants(self) -> Iterator["Element"]:
        """All descendant elements in document order, self excluded."""
        for n in self.node_stream():
            if n is not self and isinstance(n, Element):
                yield n

    def stream(self) -> Iterator["Element"]:
        """Self + descendant elements in document order."""
        for n in self.node_stream():
            if isinstance(n, Element):
                yield n

    def get_all_elements(self) -> list["Element"]:
        return list(self.stream())

    # -- text (the golden functions)
    def text(self, spans_out: list | None = None) -> str:
        """Element.text() — Element.kt:1312-1351 TextAccumulator.

        Specialized iterative walk (hot path of the extraction stage):
        same head/tail semantics as NodeTraversor + TextAccumulator but
        with incremental last-char tracking and no per-node closures.

        ``spans_out``: when a list is passed, the source spans of every
        non-blank TextNode visited are appended as FLAT int pairs
        ``start, end, start, end, ...`` IN DOCUMENT ORDER — fusing
        provenance collection into the text walk (one DFS instead of
        two for the extraction stage; the flat layout feeds a
        zero-copy Arrow StructArray build with no per-span dict).
        """
        # Fast path valid when no preserve-whitespace element and no
        # CData is in play: append RAW text-node values plus separator
        # spaces per the block rules, then collapse whitespace ONCE over
        # the joined string.  normalise(A)+" "+normalise(B) with the
        # per-node leading-space dedup equals one global collapse of
        # A+" "+B, so the result is identical — at one C-level regex
        # scan instead of one per text node.
        anc: Node | None = self
        while anc is not None:
            if isinstance(anc, Element) and anc.tag.preserve_whitespace:
                return self._text_fallback(spans_out)
            anc = anc.parent()
        accum: list[str] = []
        nonempty = False
        last_ws = False  # raw tail already whitespace → separator folds
        # index frames [element, kids, next_index]: the next sibling of
        # any child is kids[i] directly — no parent_node/child_nodes/
        # sibling_index round-trip per tail (the old next_sibling()
        # calls were ~10% of the extraction profile)
        stack: list = [[self, self._child_nodes, 0]]
        push = stack.append
        pop = stack.pop
        ws = _ACTUAL_WS
        while stack:
            frame = stack[-1]
            fkids = frame[1]
            i = frame[2]
            if i == len(fkids):
                pop()
                # tail(Element): its next sibling is the parent frame's
                # next unvisited child (None past the end). The root
                # frame's tail could only append a trailing space,
                # which the final .strip() removes — skip it.
                if nonempty and not last_ws and stack \
                        and frame[0].tag.is_block:
                    pf = stack[-1]
                    j = pf[2]
                    pk = pf[1]
                    nxt = pk[j] if j < len(pk) else None
                    if isinstance(nxt, TextNode) or (
                            isinstance(nxt, Element)
                            and not nxt.tag.format_as_block):
                        accum.append(" ")
                        last_ws = True
                continue
            child = fkids[i]
            frame[2] = i + 1
            ccls = child.__class__
            if ccls is TextNode:
                s = child.value
                if s:
                    accum.append(s)
                    nonempty = True
                    last_ws = s[-1] in ws
                    if spans_out is not None and child.span is not None \
                            and s.strip(" \t\n\f\r"):
                        spans_out.append(child.span[0])
                        spans_out.append(child.span[1])
            elif isinstance(child, Element):
                tag = child.tag
                if tag.preserve_whitespace:
                    return self._text_fallback(spans_out)
                if nonempty and not last_ws and \
                        (tag.is_block or tag.normal_name == "br"):
                    accum.append(" ")
                    last_ws = True
                kids = child._child_nodes
                # single-text-child elements (a paragraph) fold inline:
                # head + text + tail without a stack frame
                if len(kids) == 1 and kids[0].__class__ is TextNode:
                    tn = kids[0]
                    s = tn.value
                    if s:
                        accum.append(s)
                        nonempty = True
                        last_ws = s[-1] in ws
                        if spans_out is not None and tn.span is not None \
                                and s.strip(" \t\n\f\r"):
                            spans_out.append(tn.span[0])
                            spans_out.append(tn.span[1])
                    if nonempty and not last_ws and tag.is_block:
                        nxt = fkids[i + 1] if i + 1 < len(fkids) \
                            else None
                        if isinstance(nxt, TextNode) or (
                                isinstance(nxt, Element)
                                and not nxt.tag.format_as_block):
                            accum.append(" ")
                            last_ws = True
                elif kids:
                    push([child, kids, 0])
                else:
                    # childless element: tail only
                    if nonempty and not last_ws and tag.is_block:
                        nxt = fkids[i + 1] if i + 1 < len(fkids) \
                            else None
                        if isinstance(nxt, TextNode) or (
                                isinstance(nxt, Element)
                                and not nxt.tag.format_as_block):
                            accum.append(" ")
                            last_ws = True
            elif ccls is CDataNode:
                return self._text_fallback(spans_out)
            # other leaf nodes (Comment, DataNode...): no text
        s = "".join(accum)
        if "​" in s or "\xad" in s:
            s = s.translate(_INVISIBLE_DEL)
        return _collapse_ws(s).strip()

    def _text_fallback(self, spans_out: list | None = None) -> str:
        """Exact-walk path (preserve-whitespace / CData in scope): run
        the reference algorithm, and when span collection was requested
        rebuild ``spans_out`` from scratch with a dedicated walk (the
        fast path may have appended a partial prefix before bailing)."""
        out = self._text_exact()
        if spans_out is not None:
            del spans_out[:]
            for n in self.node_stream():
                if isinstance(n, TextNode) \
                        and n.span is not None and not n.is_blank():
                    spans_out.append(n.span[0])
                    spans_out.append(n.span[1])
        return out

    def _text_exact(self) -> str:
        """Per-node TextAccumulator walk — the reference algorithm
        verbatim; used when preserve-whitespace or CData regions make
        the single-pass collapse in text() inapplicable."""
        accum: list[str] = []
        nonempty = False
        last_space = False
        # per-frame third slot: does ANY in-scope ancestor (unbounded)
        # preserve whitespace? False → the reference's ≤6-ancestor check
        # is certainly False too, so the per-text-node walk is skipped on
        # the (overwhelmingly common) non-<pre> path; True → run the
        # exact capped check for fidelity.
        any_pres = False
        anc: Node | None = self
        while anc is not None:
            if isinstance(anc, Element) and anc.tag.preserve_whitespace:
                any_pres = True
                break
            anc = anc.parent()
        # (node, child-iterator, any_pres); tail runs at pop. head(self)
        # is a no-op (accum empty).
        stack: list = [(self, iter(self._child_nodes), any_pres)]
        push = stack.append
        pop = stack.pop
        ws_sub = _collapse_ws
        while stack:
            frame = stack[-1]
            child = next(frame[1], None)
            if child is None:
                pop()
                # tail(Element)
                node = frame[0]
                if node.tag.is_block and not last_space:
                    nxt = node.next_sibling()
                    if isinstance(nxt, TextNode) or (
                            isinstance(nxt, Element)
                            and not nxt.tag.format_as_block):
                        accum.append(" ")
                        last_space = True
                continue
            ccls = child.__class__
            if ccls is TextNode:
                # head(TextNode) = appendNormalisedText
                if frame[2] and Element.preserve_whitespace(frame[0]):
                    s = child.value
                else:
                    s = child.value
                    if "​" in s or "\xad" in s:
                        s = s.translate(_INVISIBLE_DEL)
                    s = ws_sub(s)
                    if last_space and s.startswith(" "):
                        s = s[1:]
                if s:
                    accum.append(s)
                    nonempty = True
                    last_space = s[-1] == " "
            elif isinstance(child, Element):
                tag = child.tag
                if nonempty and not last_space and \
                        (tag.is_block or tag.normal_name == "br"):
                    accum.append(" ")
                    last_space = True
                push((child, iter(child._child_nodes),
                      frame[2] or tag.preserve_whitespace))
            elif ccls is CDataNode:
                s = child.value
                if s:
                    accum.append(s)
                    nonempty = True
                    last_space = s[-1] == " "
            # other leaf nodes (Comment, DataNode...): no text
        return "".join(accum).strip()

    def whole_text(self) -> str:
        return _whole_text_of(self.node_stream())

    def whole_own_text(self) -> str:
        return _whole_text_of(iter(self._child_nodes))

    def own_text(self) -> str:
        accum: list[str] = []
        for child in self._child_nodes:
            if isinstance(child, TextNode):
                _append_normalised_text(accum, child)
            elif child.name_is("br") and not _last_char_is_whitespace(accum):
                accum.append(" ")
        return "".join(accum).strip()

    def has_text(self) -> bool:
        for n in self.node_stream():
            if isinstance(n, TextNode) and not n.is_blank():
                return True
        return False

    def data(self) -> str:
        """script/style/comment/CDATA raw contents (Element.kt:1463-1483)."""
        out: list[str] = []
        for n in self.node_stream():
            if isinstance(n, DataNode):
                out.append(n.get_whole_data())
            elif isinstance(n, Comment):
                out.append(n.get_data())
            elif isinstance(n, CDataNode):
                out.append(n.get_whole_text())
        return "".join(out)

    def text_nodes(self) -> list[TextNode]:
        # includes CDataNode (a TextNode subclass), like the reference's
        # filterNodes(TextNode::class)
        return [n for n in self._child_nodes if isinstance(n, TextNode)]

    def data_nodes(self) -> list[DataNode]:
        return [n for n in self._child_nodes if isinstance(n, DataNode)]

    # -- select (delegates to engine.select; imported lazily)
    def select(self, query: str) -> list["Element"]:
        from .select import select
        return select(query, self)

    def select_first(self, query: str) -> "Element | None":
        from .select import select_first
        return select_first(query, self)

    def expect_first(self, query: str) -> "Element":
        el = self.select_first(query)
        if el is None:
            # Element.kt expectFirst: message names the context element,
            # or "the document" when called on a Document
            if isinstance(self, Document):
                raise ValueError(f"No elements matched the query "
                                 f"'{query}' in the document.")
            raise ValueError(f"No elements matched the query '{query}' "
                             f"on element '{self.tag_name()}'.")
        return el

    def filter(self, node_filter) -> "Element":
        """NodeFilter walk rooted at this element (Element.kt filter) —
        ``node_filter`` is ``head(node, depth) -> FilterResult`` or an
        object with head/tail methods; supports REMOVE/STOP."""
        from .elements import filter_traverse
        filter_traverse(node_filter, self)
        return self

    def for_each(self, action) -> "Element":
        """Element.forEach: apply ``action`` to this element and every
        descendant element (snapshot order — mutation-safe)."""
        for el in list(self.stream()):
            action(el)
        return self

    def css_is(self, query) -> bool:
        """Element.is(query) — query is a CSS string or an Evaluator."""
        from .select import parse_query
        ev = parse_query(query) if isinstance(query, str) else query
        r = self.root()
        root = r if isinstance(r, Element) else self
        return ev.matches(root, self)

    def closest(self, query) -> "Element | None":
        """Element.closest — walk up from this element (inclusive) to the
        first that matches (Element.kt closest)."""
        from .select import parse_query
        ev = parse_query(query) if isinstance(query, str) else query
        el: Element | None = self
        r = self.root()
        root = r if isinstance(r, Element) else self
        while el is not None:
            if ev.matches(root, el):
                return el
            p = el.parent()
            el = p if isinstance(p, Element) else None
        return None

    def next_element_siblings(self) -> list["Element"]:
        """Element.nextElementSiblings (closest-first order)."""
        out: list[Element] = []
        el = self.next_element_sibling()
        while el is not None:
            out.append(el)
            el = el.next_element_sibling()
        return out

    def previous_element_siblings(self) -> list["Element"]:
        """Element.previousElementSiblings (closest-first order)."""
        out: list[Element] = []
        el = self.previous_element_sibling()
        while el is not None:
            out.append(el)
            el = el.previous_element_sibling()
        return out

    def append_to(self, parent: "Element") -> "Element":
        """Element.appendTo — append self to parent, return self."""
        parent.append_child(self)
        return self

    def remove_attr(self, key: str) -> "Element":
        """Element.removeAttr — chainable."""
        if self._attrs is not None:
            self._attrs.remove_ignore_case(key)
        return self

    # -- cssSelector (reference nodes/Element.kt:836-879)
    def css_selector(self) -> str:
        """A CSS selector that uniquely selects this element: #id if
        unique in the owning document, else the ancestor chain of
        tag.class.class:nth-child(n) components joined by ' > '."""
        from .select import TokenQueue
        if self.id():
            id_sel = "#" + TokenQueue.escape_css_identifier(self.id())
            doc = self.owner_document()
            if doc is None:
                return id_sel
            els = doc.select(id_sel)
            if len(els) == 1 and els[0] is self:
                return id_sel
        parts: list[str] = []
        el: Element | None = self
        while el is not None and not isinstance(el, Document):
            parts.insert(0, el._css_selector_component())
            el = el.parent()
        return "".join(parts)

    def _css_selector_component(self) -> str:
        from .select import TokenQueue
        esc = TokenQueue.escape_css_identifier
        tag = esc(self.tag_name()).replace("\\:", "|")
        sel = tag
        classes = ".".join(esc(c) for c in self.class_names())
        if classes:
            sel += "." + classes
        parent = self.parent()
        if parent is None or isinstance(parent, Document):
            return sel
        prefix = " > "
        if len(parent.select(prefix + sel)) > 1:
            sel += f":nth-child({self.element_sibling_index() + 1})"
        return prefix + sel

    # -- named getElementsBy* family (reference nodes/Element.kt:1031-1291)
    def get_elements_by_tag(self, tag_name: str) -> list["Element"]:
        from . import select as S
        return S.collect(S.TagIs(tag_name.strip().lower()), self)

    def get_element_by_id(self, id_: str) -> "Element | None":
        from . import select as S
        return S.find_first(S.IdIs(id_), self)

    def get_elements_by_class(self, class_name: str) -> list["Element"]:
        from . import select as S
        return S.collect(S.ClassIs(class_name), self)

    def get_elements_by_attribute(self, key: str) -> list["Element"]:
        from . import select as S
        return S.collect(S.HasAttr(key.strip().lower()), self)

    def get_elements_by_attribute_starting(
            self, key_prefix: str) -> list["Element"]:
        from . import select as S
        return S.collect(S.AttrStarting(key_prefix.strip()), self)

    def get_elements_by_attribute_value(
            self, key: str, value: str) -> list["Element"]:
        from . import select as S
        return S.collect(S.AttrValue(key, value), self)

    def get_elements_by_attribute_value_not(
            self, key: str, value: str) -> list["Element"]:
        from . import select as S
        return S.collect(S.AttrValueNot(key, value), self)

    def get_elements_by_attribute_value_starting(
            self, key: str, prefix: str) -> list["Element"]:
        from . import select as S
        return S.collect(S.AttrValueStarting(key, prefix), self)

    def get_elements_by_attribute_value_ending(
            self, key: str, suffix: str) -> list["Element"]:
        from . import select as S
        return S.collect(S.AttrValueEnding(key, suffix), self)

    def get_elements_by_attribute_value_containing(
            self, key: str, match: str) -> list["Element"]:
        from . import select as S
        return S.collect(S.AttrValueContaining(key, match), self)

    def get_elements_by_attribute_value_matching(
            self, key: str, regex: "str | re.Pattern") -> list["Element"]:
        import re as _re
        from . import select as S
        pattern = _re.compile(regex) if isinstance(regex, str) else regex
        return S.collect(S.AttrValueMatching(key, pattern), self)

    def get_elements_by_index_less_than(self, index: int) -> list["Element"]:
        from . import select as S
        return S.collect(S.IndexLessThan(index), self)

    def get_elements_by_index_greater_than(
            self, index: int) -> list["Element"]:
        from . import select as S
        return S.collect(S.IndexGreaterThan(index), self)

    def get_elements_by_index_equals(self, index: int) -> list["Element"]:
        from . import select as S
        return S.collect(S.IndexEquals(index), self)

    def get_elements_containing_text(self, text: str) -> list["Element"]:
        from . import select as S
        return S.collect(S.ContainsText(text), self)

    def get_elements_containing_own_text(self, text: str) -> list["Element"]:
        from . import select as S
        return S.collect(S.ContainsOwnText(text), self)

    def get_elements_matching_text(
            self, regex: "str | re.Pattern") -> list["Element"]:
        import re as _re
        from . import select as S
        pattern = _re.compile(regex) if isinstance(regex, str) else regex
        return S.collect(S.MatchesRe(pattern), self)

    def get_elements_matching_own_text(
            self, regex: "str | re.Pattern") -> list["Element"]:
        import re as _re
        from . import select as S
        pattern = _re.compile(regex) if isinstance(regex, str) else regex
        return S.collect(S.MatchesOwnRe(pattern), self)

    # -- serialization
    @staticmethod
    def preserve_whitespace(node: Node | None) -> bool:
        """Element.kt:1886-1898 — checks self + ≤5 ancestors."""
        if isinstance(node, Element):
            el: Element | None = node
            i = 0
            while el is not None and i < 6:
                if el.tag.preserve_whitespace:
                    return True
                el = el.parent()
                i += 1
        return False

    def _is_format_as_block(self, out: OutputSettings) -> bool:
        p = self.parent()
        return self.tag.is_block or \
            (p is not None and p.tag.format_as_block) or out.outline

    def _is_inlineable(self, out: OutputSettings) -> bool:
        if not self.tag.is_inline:
            return False
        p = self.parent()
        return ((p is None or p.is_block())
                and not self.is_effectively_first()
                and not out.outline
                and not self.name_is("br"))

    def should_indent(self, out: OutputSettings) -> bool:
        return (out.pretty_print and self._is_format_as_block(out)
                and not self._is_inlineable(out)
                and not Element.preserve_whitespace(self.parent_node))

    def outer_html_head(self, accum: list[str], depth: int,
                        out: OutputSettings) -> None:
        if self.should_indent(out) and _accum_nonempty(accum):
            self._indent(accum, depth, out)
        accum.append("<")
        accum.append(self.tag_name())
        if self._attrs is not None:
            self._attrs.html_to(accum, out)
        if not self._child_nodes and self.tag.is_self_closing():
            if out.syntax == "html" and self.tag.is_empty:
                accum.append(">")
            else:
                accum.append(" />")
        else:
            accum.append(">")

    def outer_html_tail(self, accum: list[str], depth: int,
                        out: OutputSettings) -> None:
        if not (not self._child_nodes and self.tag.is_self_closing()):
            if (out.pretty_print and self._child_nodes
                    and ((self.tag.format_as_block
                          and not Element.preserve_whitespace(self.parent_node))
                         or (out.outline
                             and (len(self._child_nodes) > 1
                                  or (len(self._child_nodes) == 1
                                      and isinstance(self._child_nodes[0],
                                                     Element)))))):
                self._indent(accum, depth, out)
            accum.append("</")
            accum.append(self.tag_name())
            accum.append(">")

    def html(self) -> str:
        """Inner HTML."""
        accum: list[str] = []
        out = _output_settings_of(self)
        for child in self._child_nodes:
            child._outer_html_to(accum, out)
        html = "".join(accum)
        return html.strip() if out.pretty_print else html

    # -- misc API parity
    def append_text(self, text: str) -> "Element":
        self.append_child(TextNode(text))
        return self

    def prepend_text(self, text: str) -> "Element":
        self.add_children_at(0, [TextNode(text)])
        return self

    def set_tag_name(self, name: str) -> "Element":
        """Element.tagName(String) — re-tag in place."""
        self.tag = tag_value_of(name)
        return self

    def has_parent(self) -> bool:
        return self.parent_node is not None

    def append_html(self, html: str) -> "Element":
        """Element.append(html) — parse fragment in this context and
        append (Element.kt append)."""
        from . import parser
        for n in list(parser.parse_fragment(html, self, self.base_uri())):
            if n.parent_node is not None:
                n.parent_node.remove_child(n)
            self.append_child(n)
        return self

    def prepend_html(self, html: str) -> "Element":
        from . import parser
        nodes = list(parser.parse_fragment(html, self, self.base_uri()))
        for n in nodes:
            if n.parent_node is not None:
                n.parent_node.remove_child(n)
        self.add_children_at(0, nodes)
        return self

    def set_html(self, html: str) -> "Element":
        """Element.html(html) — empty then append the parsed fragment."""
        self.empty()
        return self.append_html(html)

    def set_text(self, text: str) -> "Element":
        """Element.text(text) — replace content with one text node; a
        data node for script/style only under an HTML parser
        (Parser.isContentForTagData via NodeUtils, Element.kt
        text(String))."""
        self.empty()
        if self.normal_name() in ("script", "style") \
                and not self._xml_parsed():
            self.append_child(DataNode(text))
        else:
            self.append_child(TextNode(text))
        return self

    def _xml_parsed(self) -> bool:
        """True when the owning document was built by the XML parser."""
        doc = self.owner_document()
        parser = getattr(doc, "parser", None) if doc is not None else None
        return type(parser).__name__ == "XmlTreeBuilder"

    def append_element(self, tag_name: str) -> "Element":
        child = Element(tag_value_of(tag_name))
        self.append_child(child)
        return child

    def wrap_with(self, wrapper: "Element") -> "Element":
        """Wrap this element in the given (childless) wrapper element."""
        parent = self.parent_node
        assert parent is not None
        parent.replace_child(self, wrapper)
        wrapper.append_child(self)
        return self

    def class_set(self, names: set[str]) -> "Element":
        if names:
            self._ensure_attrs().put("class", " ".join(sorted(names)))
        elif self._attrs is not None:
            self._attrs.remove("class")
        return self

    def add_class(self, cls: str) -> "Element":
        names = self.class_names()
        if cls not in names:
            names.append(cls)
        self._ensure_attrs().put("class", " ".join(names))
        return self

    def remove_class(self, cls: str) -> "Element":
        names = [c for c in self.class_names() if c != cls]
        if names:
            self._ensure_attrs().put("class", " ".join(names))
        elif self._attrs is not None:
            self._attrs.remove("class")
        return self

    def toggle_class(self, cls: str) -> "Element":
        if cls in self.class_names():
            return self.remove_class(cls)
        return self.add_class(cls)

    def value(self) -> str:
        if self.normal_name() == "textarea":
            return self.text()
        return self.attr("value")

    def set_value(self, value: str) -> "Element":
        """Element.val(value) — textarea sets text, others the value
        attribute."""
        if self.normal_name() == "textarea":
            self.set_text(value)
        else:
            self.set_attr("value", value)
        return self


def _append_normalised_text(accum: list[str], text_node: TextNode) -> None:
    """Element.appendNormalisedText (Element.kt:1870-1884)."""
    text = text_node.get_whole_text()
    if Element.preserve_whitespace(text_node.parent_node) or \
            isinstance(text_node, CDataNode):
        accum.append(text)
    else:
        append_normalised_whitespace(accum, text,
                                     _last_char_is_whitespace(accum))


def _whole_text_of(nodes: Iterator[Node]) -> str:
    out: list[str] = []
    for node in nodes:
        if isinstance(node, TextNode):
            out.append(node.get_whole_text())
        elif node.name_is("br"):
            out.append("\n")
    return "".join(out)


class FormElement(Element):
    """nodes/FormElement.kt:18 — tracks associated form controls."""

    __slots__ = ("form_elements",)

    def __init__(self, tag: Tag, base_uri: str | None = None,
                 attrs: Attributes | None = None):
        super().__init__(tag, base_uri, attrs)
        self.form_elements: list[Element] = []

    def add_element(self, element: Element) -> None:
        self.form_elements.append(element)

    def elements(self) -> list[Element]:
        """Form controls associated with this form
        (FormElement.kt:28-37): current submittable descendants, plus
        parse-time linked controls that the parse rules moved outside
        the form but are still attached to a document."""
        els = [e for e in self.stream()
               if e is not self and e.tag.is_form_submittable]
        for linked in self.form_elements:
            if linked.owner_document() is not None and linked not in els:
                els.append(linked)
        return els

    def form_data(self) -> list[tuple[str, str]]:
        """Assemble the (name, value) pairs this form would submit —
        jsoup's FormElement.formData() semantics (the reference dropped
        the helper with its network-module split; the node type and
        control linking at FormElement.kt:18 are what it builds on):
        skip disabled/unnamed/button/image controls; selects emit every
        selected option (first option as fallback); checkbox/radio only
        when checked, defaulting to 'on'."""
        data: list[tuple[str, str]] = []
        for el in self.elements():
            if not el.tag.is_form_submittable:
                continue
            if el.has_attr("disabled"):
                continue
            name = el.attr("name")
            if not name:
                continue
            typ = el.attr("type").lower()
            if typ in ("button", "image"):
                continue
            if el.normal_name() == "select":
                had_selected = False
                for opt in el.select("option[selected]"):
                    data.append((name, opt.value()))
                    had_selected = True
                if not had_selected:
                    opt = el.select_first("option")
                    if opt is not None:
                        data.append((name, opt.value()))
            elif typ in ("checkbox", "radio"):
                if el.has_attr("checked"):
                    data.append((name, el.value() or "on"))
            else:
                data.append((name, el.value()))
        return data


class PseudoTextElement(Element):
    """Elements inserted by :matchText (Element.kt PseudoTextElement)."""

    __slots__ = ()

    def outer_html_head(self, accum, depth, out):  # renders nothing
        pass

    def outer_html_tail(self, accum, depth, out):
        pass


class Document(Element):
    """nodes/Document.kt:27"""

    __slots__ = ("output_settings", "quirks_mode", "location", "parser",
                 "parse_errors", "error_list", "truncated",
                 "update_meta_charset", "source_text")

    def __init__(self, base_uri: str = ""):
        super().__init__(tag_value_of("#root"), base_uri)
        self.output_settings = OutputSettings()
        self.update_meta_charset = False
        self.quirks_mode = "noQuirks"  # noQuirks | quirks | limitedQuirks
        self.location = base_uri
        self.parser = None  # set by the Parser that built this doc
        self.parse_errors = 0
        self.error_list: list[str] = []
        self.truncated = False  # set by the DOM size guard (DomSizeLimit)
        # decoded source, retained for line/col position mapping
        # (set by the tree builders; a reference, not a copy)
        self.source_text: str | None = None

    def node_name(self) -> str:
        return "#document"

    def head(self) -> Element:
        """Document.head() — vivifies the html/head structure if absent
        (Document.kt:91-99 side effect)."""
        html = self._html_el()
        for e in html.children():
            if e.name_is("head"):
                return e
        return html.prepend_element("head")

    def head_or_null(self) -> Element | None:
        """Document.headOrNull() (Document.kt:109-117)."""
        html = self._html_el()
        for e in html.children():
            if e.name_is("head"):
                return e
        return None

    def body(self) -> Element:
        """Document.body() — body or outermost frameset; vivifies a body
        (and html shell) if absent (Document.kt:128-136)."""
        html = self._html_el()
        for e in html.children():
            if e.name_is("body") or e.name_is("frameset"):
                return e
        return html.append_element("body")

    def _html_el(self) -> Element:
        for e in self.children():
            if e.name_is("html"):
                return e
        return self.append_element("html")

    def title(self) -> str:
        t = self.select_first("head > title")
        if t is None:
            # fall back to any title el (parser places it in head normally)
            t = self.select_first("title")
        return normalise_whitespace(t.text()).strip() if t is not None else ""

    def charset(self) -> str:
        return self.output_settings.charset

    def set_title(self, title: str) -> None:
        """Document.title(String) — update or create head > title."""
        head = self.head()
        if head is None:
            return
        title_el = head.select_first("title")
        if title_el is None:
            title_el = head.append_element("title")
        title_el.set_text(title)

    def set_charset(self, charset: str) -> None:
        """Document.charset(Charset) — sets the output charset and (per
        the reference, Document.kt:248-252) enables + applies the meta
        charset element update."""
        self.update_meta_charset = True
        self.output_settings.charset = charset
        self._ensure_meta_charset_element()

    def update_meta_charset_element(self, update: bool) -> None:
        self.update_meta_charset = update

    def _ensure_meta_charset_element(self) -> None:
        """Document.kt ensureMetaCharsetElement:331-363."""
        if not self.update_meta_charset:
            return
        if self.output_settings.syntax == "html":
            meta = self.select_first("meta[charset]")
            if meta is not None:
                meta.set_attr("charset", self.charset())
            else:
                head = self.head()
                if head is not None:
                    head.append_element("meta") \
                        .set_attr("charset", self.charset())
            for obsolete in self.select("meta[name=charset]"):
                obsolete.remove()
        else:  # xml
            kids = self._child_nodes
            first = kids[0] if kids else None
            if isinstance(first, XmlDeclaration) and first.value == "xml":
                first._ensure_attrs().put("encoding", self.charset())
                if first.has_attr("version"):
                    first._ensure_attrs().put("version", "1.0")
            else:
                decl = XmlDeclaration("xml", False)
                decl._ensure_attrs().put("version", "1.0")
                decl._ensure_attrs().put("encoding", self.charset())
                self.prepend_child(decl)

    def create_element(self, tag_name: str) -> Element:
        """Document.createElement — a new standalone element with this
        doc's base URI (Document.kt createElement)."""
        return Element(tag_value_of(tag_name, preserve_case=True),
                       self.base_uri())

    def document_type(self) -> "DocumentType | None":
        """Document.documentType — the doc's DOCTYPE node if present."""
        for n in self._child_nodes:
            if isinstance(n, DocumentType):
                return n
            if isinstance(n, Element):
                break  # doctype must precede the root element
        return None

    def forms(self) -> list["FormElement"]:
        """Document.forms — all FormElements in the document."""
        return [e for e in self.stream() if isinstance(e, FormElement)]

    def expect_form(self, query: str) -> "FormElement":
        """Document.expectForm — FIRST FormElement among the query's
        matches (a non-form match is skipped, Document.kt expectForm)."""
        for el in self.select(query):
            if isinstance(el, FormElement):
                return el
        raise ValueError(f"No form elements matched the query "
                         f"'{query}' in the document.")

    def outer_html(self) -> str:
        return self.html()  # no outer #document tag

    def text(self) -> str:
        b = self.body()
        return b.text() if b is not None else super().text()

    def set_text(self, text: str) -> "Element":
        """Document.text(String) applies to the body, preserving the
        document structure (DocumentTest setTextPreservesDocumentStructure)."""
        b = self.body()
        if b is not None:
            b.set_text(text)
            return self
        return super().set_text(text)

    @staticmethod
    def create_shell(base_uri: str = "") -> "Document":
        doc = Document(base_uri)
        html = doc.append_element("html")
        html.append_element("head")
        html.append_element("body")
        return doc


class NodeIterator:
    """Document-order node iterator that supports structural changes
    (remove / replaceWith / wrap) mid-iteration (nodes/NodeIterator.kt).

    ``node_type`` filters emitted nodes (e.g. Element, TextNode); the
    walk still descends through non-matching nodes. Python iterator
    protocol plus the reference's has_next/next/restart/remove surface.
    """

    __slots__ = ("_type", "_root", "_next", "_current", "_previous",
                 "_current_parent")

    def __init__(self, start: Node, node_type: type = Node):
        self._type = node_type
        self.restart(start)

    @staticmethod
    def from_node(start: Node) -> "NodeIterator":
        return NodeIterator(start, Node)

    def restart(self, start: Node) -> None:
        self._next: Node | None = (
            start if isinstance(start, self._type) else None)
        self._current: Node | None = start
        self._previous: Node | None = start
        self._root: Node | None = start
        self._current_parent = start.parent_node

    def has_next(self) -> bool:
        self._maybe_find_next()
        return self._next is not None

    def next(self) -> Node:
        self._maybe_find_next()
        if self._next is None:
            raise StopIteration
        result = self._next
        self._previous = self._current
        self._current = result
        self._current_parent = result.parent_node
        self._next = None
        return result

    __next__ = next

    def __iter__(self) -> "NodeIterator":
        return self

    def remove(self) -> None:
        if self._current is not None:
            self._current.remove()

    def _maybe_find_next(self) -> None:
        if self._next is not None:
            return
        # change detected (removed or replaced): redo from previous
        if (self._current_parent is not None
                and (self._current is None
                     or self._current.parent_node is None)):
            self._current = self._previous
        self._next = self._find_next_node()

    def _find_next_node(self) -> Node | None:
        node = self._current
        while True:
            if node.child_nodes():
                node = node.child_nodes()[0]  # descend children
            elif self._root is node:
                node = None  # all children of root fully visited
            elif node.next_sibling() is not None:
                node = node.next_sibling()  # no more children; traverse
            else:
                while True:
                    node = node.parent_node  # pop out of descendants
                    if node is None or self._root is node:
                        return None  # back at root; complete
                    if node.next_sibling() is not None:
                        node = node.next_sibling()
                        break
            if node is None:
                return None
            if isinstance(node, self._type):
                return node
