"""StreamParser — progressive parse with element-by-element emission
(reference ``parser/StreamParser.kt``).

Elements are emitted in document order as they complete: an element is
queued once its NEXT sibling is inserted (so consumers see the empty
sibling), or — for last children — when its parent closes; the final
close chain (open stack at EOF, then the document root) flushes the
rest. The parse advances one token per pull, so the tokenizer never
reads past what the consumer has asked for (StreamParser.kt
ElementIterator head/tail scheme, doesNotReadPastParse).

At 100-TB scale this is the in-worker counterpart to Ray's streaming
executor: a pathological single document can be walked element-wise
and pruned (``Element.remove()`` during the stream) without ever
holding its full DOM.
"""

from __future__ import annotations

from collections import deque

from .dom import Document, Element, Node
from .treebuilder import HTML_DEFAULT, HtmlTreeBuilder, ParseSettings
from .xmlbuilder import XmlTreeBuilder


class StreamParser:
    def __init__(self, xml: bool = False,
                 settings: ParseSettings | None = None,
                 track_errors: bool = False):
        self.xml = xml
        self.settings = settings
        self.track_errors = track_errors
        self.tree_builder = None
        self._doc: Document | None = None
        self._fragment = False
        self._queue: deque[Element] = deque()
        self._tail: Element | None = None
        self._current: Element | None = None
        self._stopped = False
        self._closed = False
        self._eof_flushed = False

    # -- input -----------------------------------------------------------
    def parse(self, html, base_uri: str = "") -> "StreamParser":
        """Provide the input (a string or a ported-io Reader); nothing
        is read until a consuming call."""
        from .io import Reader
        if isinstance(html, Reader):
            html = html.read_string(len(html._s) - html._pos)
        self.close()
        self._reset()
        if self.xml:
            tb = XmlTreeBuilder(track_errors=self.track_errors,
                                node_listener=self) \
                if self.settings is None else \
                XmlTreeBuilder(self.settings, self.track_errors,
                               node_listener=self)
            tb.initialise(html, base_uri)
        else:
            tb = HtmlTreeBuilder(self.settings or HTML_DEFAULT,
                                 self.track_errors, node_listener=self)
            tb._initialise(html, base_uri)
        self.tree_builder = tb
        self._doc = tb.doc
        self._fragment = False
        return self

    def parse_fragment(self, html: str, context: Element | None,
                       base_uri: str = "") -> "StreamParser":
        self.parse(html, base_uri)
        if not self.xml:
            self.tree_builder._initialise_fragment(context)
        self._fragment = True
        return self

    def _reset(self) -> None:
        self._queue.clear()
        self._tail = None
        self._current = None
        self._stopped = False
        self._closed = False
        self._eof_flushed = False

    # -- lifecycle -------------------------------------------------------
    def stop(self) -> "StreamParser":
        self._stopped = True
        return self

    def close(self) -> None:
        self._stopped = True
        self._closed = True

    @property
    def closed(self) -> bool:
        return self._closed

    def __enter__(self) -> "StreamParser":
        return self

    def __exit__(self, *exc) -> None:
        self.close()

    def document(self) -> Document:
        if self._doc is None:
            raise ValueError("Must run parse() before consuming")
        return self._doc

    # -- node listener (TreeBuilder hooks) -------------------------------
    def head(self, node: Node, depth: int) -> None:
        if isinstance(node, Element):
            prev = node.previous_element_sibling()
            # emit an element only once its next sibling exists
            if prev is not None:
                self._queue.append(prev)

    def tail(self, node: Node, depth: int) -> None:
        if isinstance(node, Element):
            self._tail = node  # held for the final pop
            last_child = node.last_element_child()
            if last_child is not None:
                self._queue.append(last_child)

    # -- iteration -------------------------------------------------------
    def __iter__(self):
        return self

    def __next__(self) -> Element:
        el = self._advance()
        if el is None:
            raise StopIteration
        self._current = el
        return el

    def stream(self):
        return iter(self)

    def _advance(self) -> Element | None:
        if self._stopped:
            return None
        if self._queue:
            return self._queue.popleft()
        tb = self.tree_builder
        while not self._eof_flushed and tb.step():
            if self._queue:
                return self._queue.popleft()
        if not self._eof_flushed:
            self._flush_eof()
            if self._queue:
                return self._queue.popleft()
        self.stop()
        self.close()
        out, self._tail = self._tail, None
        return out

    def _flush_eof(self) -> None:
        # completeParse: remaining stack pops (top -> bottom) then the
        # document root itself, firing the close listeners
        self._eof_flushed = True
        tb = self.tree_builder
        # stamp implicit zero-width EOF end ranges exactly as
        # Parser.parse does, so positions output is identical between
        # the two entry points (XmlTreeBuilder stamps inside step())
        stamp = getattr(tb, "stamp_eof_spans", None)
        if stamp is not None:
            stamp()
        for el in reversed(tb.stack):
            self.tail(el, 0)
        self.tail(self._doc, 0)

    # -- select ----------------------------------------------------------
    def select_first(self, query: str) -> Element | None:
        """First already-parsed match, else parse forward until found."""
        hit = self.document().select_first(query)
        return hit if hit is not None else self.select_next(query)

    def expect_first(self, query: str) -> Element:
        el = self.select_first(query)
        if el is None:
            raise ValueError(f"No elements matched the query '{query}' "
                             f"in the document.")
        return el

    def select_next(self, query: str) -> Element | None:
        from .select import parse_query
        ev = parse_query(query)
        doc = self.document()
        for el in self:
            if ev.matches(doc, el):
                return el
        return None

    def expect_next(self, query: str) -> Element:
        el = self.select_next(query)
        if el is None:
            raise ValueError(f"No elements matched the query '{query}' "
                             f"in the document.")
        return el

    # -- completion ------------------------------------------------------
    def complete(self) -> Document:
        """Run the parse to completion and return the Document."""
        doc = self.document()
        tb = self.tree_builder
        if not self._eof_flushed:
            while tb.step():
                pass
            self._flush_eof()
        self.stop()
        self.close()
        return doc

    def complete_fragment(self) -> list[Node]:
        """Run to completion and return the fragment's root nodes."""
        self.complete()
        if self.xml:
            return list(self._doc.child_nodes())
        return self.tree_builder.fragment_nodes()
