"""HTML sanitization — Safelist presets + Cleaner.

Semantics per reference ``safety/Safelist.kt:92-658`` (presets at
:550-656) and ``safety/Cleaner.kt:38-185`` (CleaningVisitor DFS copy):
unsafe elements are dropped but their children still traverse into the
current destination; text nodes always copy; data nodes copy only under
safe tags; attribute protocol checks resolve ``abs:`` first and rewrite
relative links to absolute unless ``preserve_relative_links``.
"""

from __future__ import annotations

import re

from .dom import (
    Attributes,
    DataNode,
    Document,
    Element,
    Node,
    TextNode,
)

_WS_IN_ANCHOR = re.compile(r"\s")
_ALL = ":all"


class Safelist:
    def __init__(self, copy: "Safelist | None" = None) -> None:
        self.tag_names: set[str] = set()
        self.attributes: dict[str, set[str]] = {}
        self.enforced: dict[str, dict[str, str]] = {}
        self.protocols: dict[str, dict[str, set[str]]] = {}
        self.preserve_relative_links = False
        if copy is not None:
            # deep copy-constructor (Safelist.kt:116-130) — no aliasing
            self.tag_names = set(copy.tag_names)
            self.attributes = {k: set(v) for k, v in copy.attributes.items()}
            self.enforced = {k: dict(v) for k, v in copy.enforced.items()}
            self.protocols = {t: {a: set(p) for a, p in attrs.items()}
                              for t, attrs in copy.protocols.items()}
            self.preserve_relative_links = copy.preserve_relative_links

    # -- builders (Safelist.kt add/remove API)
    def add_tags(self, *tags: str) -> "Safelist":
        for tag in tags:
            # Safelist.kt addTags: noscript is unsupported (XSS risk when
            # cleaned output is viewed with scripting off)
            if tag.lower() == "noscript":
                raise ValueError("noscript is unsupported in Safelists, "
                                 "due to incompatibilities between parsers "
                                 "with and without script-mode enabled")
        # TagName.valueOf lowercases (Safelist.kt:475-479)
        self.tag_names.update(t.lower() for t in tags)
        return self

    def remove_tags(self, *tags: str) -> "Safelist":
        for tag in (t.lower() for t in tags):
            self.tag_names.discard(tag)
            self.attributes.pop(tag, None)
            self.enforced.pop(tag, None)
            self.protocols.pop(tag, None)
        return self

    def add_attributes(self, tag: str, *attrs: str) -> "Safelist":
        tag = tag.lower()
        if tag != _ALL:
            self.tag_names.add(tag)
        self.attributes.setdefault(tag, set()).update(a.lower() for a in attrs)
        return self

    def remove_attributes(self, tag: str, *attrs: str) -> "Safelist":
        tag = tag.lower()
        keys = {a.lower() for a in attrs}
        if tag in self.attributes:
            self.attributes[tag] -= keys
            if not self.attributes[tag]:
                del self.attributes[tag]
        if tag == _ALL:
            for t in list(self.attributes):
                self.attributes[t] -= keys
                if not self.attributes[t]:
                    del self.attributes[t]
        return self

    def add_enforced_attribute(self, tag: str, attr: str,
                               value: str) -> "Safelist":
        tag = tag.lower()
        self.tag_names.add(tag)
        self.enforced.setdefault(tag, {})[attr.lower()] = value
        return self

    def remove_enforced_attribute(self, tag: str, attr: str) -> "Safelist":
        tag = tag.lower()
        if tag in self.enforced:
            self.enforced[tag].pop(attr.lower(), None)
            if not self.enforced[tag]:
                del self.enforced[tag]
        return self

    def preserve_relative_links_(self, preserve: bool) -> "Safelist":
        self.preserve_relative_links = preserve
        return self

    def add_protocols(self, tag: str, attr: str, *protocols: str) -> "Safelist":
        tag = tag.lower()
        self.protocols.setdefault(tag, {}).setdefault(
            attr.lower(), set()).update(p.lower() for p in protocols)
        return self

    def remove_protocols(self, tag: str, attr: str, *protocols: str) -> "Safelist":
        tag = tag.lower()
        attr = attr.lower()
        # Safelist.kt removeProtocols: validates the attribute actually
        # has protocols set (removal would otherwise silently no-op)
        if tag not in self.protocols or attr not in self.protocols[tag]:
            raise ValueError(
                f"Cannot remove a protocol that is not set.")
        self.protocols[tag][attr] -= {p.lower() for p in protocols}
        if not self.protocols[tag][attr]:
            del self.protocols[tag][attr]
        return self

    # -- checks (Safelist.kt:437-520)
    def is_safe_tag(self, tag: str) -> bool:
        return tag.lower() in self.tag_names

    def is_safe_attribute(self, tag_name: str, el: Element,
                          key: str, value: str | None) -> bool:
        tag_name = tag_name.lower()
        key = key.lower()
        okset = self.attributes.get(tag_name)
        if okset is not None and key in okset:
            protos = self.protocols.get(tag_name, {}).get(key)
            if protos is None:
                return True
            return self._test_valid_protocol(el, key, value or "", protos)
        # an enforced attribute is safe ONLY with exactly the enforced
        # value (Safelist.kt:410-418: rel='nofollowme' on <a> is unsafe)
        enforced_val = self.enforced.get(tag_name, {}).get(key)
        if enforced_val is not None:
            return enforced_val == (value or "")
        # :all catch, unless looking at :all itself
        return tag_name != _ALL and \
            self.is_safe_attribute(_ALL, el, key, value)

    def _test_valid_protocol(self, el: Element, key: str, value: str,
                             protocols: set[str]) -> bool:
        abs_val = el.abs_url(key)
        if not abs_val:
            abs_val = value
        if not self.preserve_relative_links:
            el._ensure_attrs().put(key, abs_val)
        lower = abs_val.lower()
        for prot in protocols:
            if prot == "#":
                # isValidAnchor (Safelist.kt:453-455): starts with # and
                # contains no whitespace, tested on the resolved value
                if abs_val.startswith("#") and \
                        not _WS_IN_ANCHOR.search(abs_val):
                    return True
                continue
            if lower.startswith(prot + ":"):
                return True
        return False

    def get_enforced_attributes(self, tag_name: str) -> dict[str, str]:
        tag_name = tag_name.lower()
        return dict(self.enforced.get(tag_name, {}))

    # -- presets (Safelist.kt:550-656)
    @staticmethod
    def none() -> "Safelist":
        return Safelist()

    @staticmethod
    def simple_text() -> "Safelist":
        return Safelist().add_tags("b", "em", "i", "strong", "u")

    @staticmethod
    def basic() -> "Safelist":
        return (
            Safelist()
            .add_tags("a", "b", "blockquote", "br", "cite", "code", "dd",
                      "dl", "dt", "em", "i", "li", "ol", "p", "pre", "q",
                      "small", "span", "strike", "strong", "sub", "sup",
                      "u", "ul")
            .add_attributes("a", "href")
            .add_attributes("blockquote", "cite")
            .add_attributes("q", "cite")
            .add_protocols("a", "href", "ftp", "http", "https", "mailto")
            .add_protocols("blockquote", "cite", "http", "https")
            .add_protocols("cite", "cite", "http", "https")
            .add_enforced_attribute("a", "rel", "nofollow")
        )

    @staticmethod
    def basic_with_images() -> "Safelist":
        return (
            Safelist.basic()
            .add_tags("img")
            .add_attributes("img", "align", "alt", "height", "src", "title",
                            "width")
            .add_protocols("img", "src", "http", "https")
        )

    @staticmethod
    def relaxed() -> "Safelist":
        return (
            Safelist()
            .add_tags("a", "b", "blockquote", "br", "caption", "cite",
                      "code", "col", "colgroup", "dd", "div", "dl", "dt",
                      "em", "h1", "h2", "h3", "h4", "h5", "h6", "i", "img",
                      "li", "ol", "p", "pre", "q", "small", "span", "strike",
                      "strong", "sub", "sup", "table", "tbody", "td",
                      "tfoot", "th", "thead", "tr", "u", "ul")
            .add_attributes("a", "href", "title")
            .add_attributes("blockquote", "cite")
            .add_attributes("col", "span", "width")
            .add_attributes("colgroup", "span", "width")
            .add_attributes("img", "align", "alt", "height", "src", "title",
                            "width")
            .add_attributes("ol", "start", "type")
            .add_attributes("q", "cite")
            .add_attributes("table", "summary", "width")
            .add_attributes("td", "abbr", "axis", "colspan", "rowspan",
                            "width")
            .add_attributes("th", "abbr", "axis", "colspan", "rowspan",
                            "scope", "width")
            .add_attributes("ul", "type")
            .add_protocols("a", "href", "ftp", "http", "https", "mailto")
            .add_protocols("blockquote", "cite", "http", "https")
            .add_protocols("cite", "cite", "http", "https")
            .add_protocols("img", "src", "http", "https")
            .add_protocols("q", "cite", "http", "https")
        )


class Cleaner:
    """safety/Cleaner.kt:30-185"""

    def __init__(self, safelist: Safelist):
        self.safelist = safelist

    def clean(self, dirty: Document) -> Document:
        clean = Document.create_shell(dirty.base_uri())
        body = dirty.body()
        if body is not None:
            self._copy_safe_nodes(body, clean.body())
        clean.output_settings = dirty.output_settings.clone()
        return clean

    def is_valid(self, dirty: Document) -> bool:
        clean = Document.create_shell(dirty.base_uri())
        body = dirty.body()
        discarded = self._copy_safe_nodes(body, clean.body()) \
            if body is not None else 0
        head = dirty.head()
        return discarded == 0 and \
            (head is None or not head.child_nodes())

    def _copy_safe_nodes(self, source: Element, dest: Element) -> int:
        num_discarded = 0
        safelist = self.safelist
        # iterative head/tail walk mirroring CleaningVisitor
        destination = dest
        stack: list[tuple[Node, int, bool]] = []  # (node, child idx, descended)

        def visit_head(node: Node) -> bool:
            """Returns True if we descended (pushed a new destination)."""
            nonlocal destination, num_discarded
            if isinstance(node, Element):
                if safelist.is_safe_tag(node.normal_name()):
                    el, discarded = self._create_safe_element(node)
                    destination.append_child(el)
                    num_discarded += discarded
                    destination = el
                    return True
                elif node is not source:
                    num_discarded += 1
            elif isinstance(node, TextNode):
                destination.append_child(TextNode(node.get_whole_text()))
            elif isinstance(node, DataNode) and node.parent_node is not None \
                    and safelist.is_safe_tag(node.parent_node.normal_name()):
                destination.append_child(DataNode(node.get_whole_data()))
            else:
                num_discarded += 1
            return False

        # source itself: visit (root not counted), then children
        descended_root = visit_head(source)
        work: list[tuple[Node, int]] = [(source, 0)]
        descent_flags = [descended_root]
        while work:
            node, idx = work[-1]
            kids = node.child_nodes()
            if idx < len(kids):
                work[-1] = (node, idx + 1)
                child = kids[idx]
                descended = visit_head(child)
                work.append((child, 0))
                descent_flags.append(descended)
            else:
                work.pop()
                if descent_flags.pop():
                    destination = destination.parent()
        return num_discarded

    def _create_safe_element(self, source_el: Element) -> tuple[Element, int]:
        source_tag = source_el.tag_name()
        dest = Element(source_el.tag)
        # source positions survive the clean (Cleaner.kt preserves
        # ranges via userData; PositionTest preservesSourcePosition)
        dest.span = source_el.span
        dest.end_span = source_el.end_span
        num_discarded = 0
        attrs = source_el.attributes()
        if attrs is not None:
            for key, value in list(attrs):
                if self.safelist.is_safe_attribute(
                        source_tag, source_el, key,
                        value):
                    # re-read: protocol test may have absolutized the value
                    dest._ensure_attrs().put(key, source_el.attr(key))
                    rng = attrs.source_range(key)
                    if rng is not None:
                        dest._ensure_attrs().set_source_range(key, rng)
                else:
                    num_discarded += 1
        for key, value in self.safelist.get_enforced_attributes(
                source_tag).items():
            dest._ensure_attrs().put(key, value)
        return dest, num_discarded
