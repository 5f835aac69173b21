"""XML tree builder — namespace-free direct build, case preserved.

Semantics per reference ``parser/XmlTreeBuilder.kt:16-160``: every start
tag pushes, end tags pop to the nearest matching open element (scan
capped at 256), bogus comments that look like XML declarations are
re-parsed into ``XmlDeclaration`` nodes, output settings switch to
xml syntax / xhtml escapes / no pretty print.
"""

from __future__ import annotations

from .dom import (
    Attributes,
    CDataNode,
    Comment,
    Document,
    DocumentType,
    Element,
    Node,
    TextNode,
    XmlDeclaration,
)
from .tags import NAMESPACE_XML, Tag
from . import entities as E
from . import tokenizer as tk
from .tokenizer import Tokeniser, TagTok
from .treebuilder import PRESERVE_CASE, ParseSettings

MAX_QUEUE_DEPTH = 256


class XmlTreeBuilder:
    def __init__(self, settings: ParseSettings = PRESERVE_CASE,
                 track_errors: bool = False, node_listener=None):
        self.settings = settings
        self.track_errors = track_errors
        self.errors: list[str] = []
        self.doc: Document | None = None
        self.stack: list[Element] = []
        self.seen_tags: dict[str, Tag] = {}
        self.base_uri = ""
        self.node_listener = node_listener
        self.tokeniser: Tokeniser | None = None

    def initialise(self, xml: str, base_uri: str = "") -> None:
        self.doc = Document(base_uri)
        # the XML parser's document root lives in the XML namespace
        # (Parser.defaultNamespace, XmlTreeBuilder.kt)
        self.doc.tag = Tag("#root", NAMESPACE_XML)
        self.doc.parser = self
        self.base_uri = base_uri
        out = self.doc.output_settings
        out.syntax = "xml"
        out.escape_mode = E.ESCAPE_XHTML
        out.pretty_print = False
        self.stack = []
        self.tokeniser = Tokeniser(xml, self.track_errors)
        self.doc.span = (0, 0)
        self.doc.source_text = xml

    def step(self) -> bool:
        """Process ONE token; False once EOF was processed (the
        incremental drive for StreamParser)."""
        token = self.tokeniser.read()
        self._process(token)
        if token.kind == tk.EOF_TOKEN:
            self.errors.extend(self.tokeniser.errors)
            p = self.tokeniser.n
            for el in self.stack:
                if el.end_span is None:
                    el.end_span = (p, p)
            if self.doc.end_span is None:
                self.doc.end_span = (p, p)
            return False
        if token.kind in (tk.START_TAG, tk.END_TAG):
            token.reset()
        return True

    def parse(self, xml: str, base_uri: str = "") -> Document:
        self.initialise(xml, base_uri)
        while self.step():
            pass
        return self.doc

    def parse_fragment(self, xml: str, base_uri: str = "") -> list[Node]:
        doc = self.parse(xml, base_uri)
        return list(doc.child_nodes())

    def _current(self) -> Element:
        return self.stack[-1] if self.stack else self.doc

    def _tag_for(self, name: str) -> Tag:
        cached = self.seen_tags.get(name)
        if cached is None:
            cached = Tag(self.settings.normalize_tag(name), NAMESPACE_XML)
            self.seen_tags[name] = cached
        return cached

    def _process(self, token) -> None:
        kind = token.kind
        if kind == tk.START_TAG:
            self._insert_element(token)
        elif kind == tk.END_TAG:
            self._pop_to_close(token)
        elif kind == tk.COMMENT:
            self._insert_comment(token)
        elif kind in (tk.CHARACTER, tk.CDATA):
            data = token.data
            node = CDataNode(data) if kind == tk.CDATA else TextNode(data)
            if token.start_pos >= 0:
                node.span = (token.start_pos, token.end_pos)
            self._current().append_child(node)
        elif kind == tk.DOCTYPE:
            node = DocumentType(self.settings.normalize_tag(token.get_name()),
                                token.get_public_identifier(),
                                token.get_system_identifier())
            if token.start_pos >= 0:
                node.span = (token.start_pos, token.end_pos)
            self._current().append_child(node)

    def _attrs_from(self, token: TagTok) -> Attributes | None:
        if not token.attrs:
            return None
        attrs = Attributes()
        d = attrs._d
        ranges = token.attr_ranges
        for i, (k, v) in enumerate(token.attrs):
            k = self.settings.normalize_attr(k)
            if k not in d:
                d[k] = v
                if i < len(ranges) and ranges[i][0] >= 0:
                    attrs.set_source_range(k, ranges[i])
        return attrs

    def _insert_element(self, start: TagTok) -> None:
        tag = self._tag_for(start.name)
        el = Element(tag, None, self._attrs_from(start))
        if start.start_pos >= 0:
            el.span = (start.start_pos, start.end_pos)
        self._current().append_child(el)
        if self.node_listener is not None:
            self.node_listener.head(el, len(self.stack))
        self.stack.append(el)
        if start.self_closing:
            tag.self_closing = True
            self.stack.pop()
            if self.node_listener is not None:
                self.node_listener.tail(el, len(self.stack))

    def _insert_comment(self, token) -> None:
        data = token.get_data()
        node: Node = Comment(data)
        if token.bogus and len(data) > 1 and data[0] in "!?":
            decl = _as_xml_declaration(data)
            if decl is not None:
                node = decl
        if token.start_pos >= 0:
            node.span = (token.start_pos, token.end_pos)
        self._current().append_child(node)

    def _pop_to_close(self, end: TagTok) -> None:
        el_name = self.settings.normalize_tag(end.name)
        first_found: Element | None = None
        bottom = len(self.stack) - 1
        upper = bottom - MAX_QUEUE_DEPTH if bottom >= MAX_QUEUE_DEPTH else 0
        for pos in range(bottom, upper - 1, -1):
            if self.stack[pos].node_name() == el_name:
                first_found = self.stack[pos]
                break
        if first_found is None:
            return
        if end.start_pos >= 0:
            first_found.end_span = (end.start_pos, end.end_pos)
        while self.stack:
            popped = self.stack.pop()
            if self.node_listener is not None:
                self.node_listener.tail(popped, len(self.stack))
            if popped is first_found:
                break


def _as_xml_declaration(data: str) -> XmlDeclaration | None:
    """Comment.asXmlDeclaration — re-tokenize '<' + data[1:-1] + '>' to pull
    name + attributes out of a bogus-comment XML declaration."""
    declaration = data[1:]
    if declaration.endswith("?") or declaration.endswith("!"):
        declaration = declaration[:-1]
    tokeniser = Tokeniser("<" + declaration + ">")
    tok = tokeniser.read()
    if tok.kind != tk.START_TAG:
        return None
    decl = XmlDeclaration(tok.name, data.startswith("!"))
    if tok.attrs:
        attrs = decl._ensure_attrs()
        for k, v in tok.attrs:
            if k not in attrs._d:
                attrs._d[k] = v
    return decl
