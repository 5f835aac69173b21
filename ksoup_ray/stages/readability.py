"""MainContent — readability-style main-content extraction.

The flagship extraction stage (``stages/extract.py``) strips
boilerplate by TAG allowlist (script/style/nav…). Real crawl pages
bury the article under tag-agnostic chrome — link farms in ``<div>``
sidebars, related-story boxes, cookie banners — so large-scale webtext
curation uses *text-density* scoring instead (the approach published
as Readability / Boilerpipe / jusText): an element whose subtree is
mostly plain text is content; one whose text lives inside anchors is
navigation, whatever its tag.

Algorithm (pure function of the DOM, no tag allowlist):

* one DFS over the ``<body>`` subtree maintaining the ancestor path;
  every ``TextNode`` adds its whitespace-collapsed length to EVERY
  element on the path (``O(text_nodes × depth)``), split into total
  vs inside-``<a>`` chars (``link_depth`` counter on the path);
* ``score(el) = text_chars(el) - 2 * link_chars(el)`` — link text is
  penalized past zero, so a nav block scores negative while an
  article block scores its full length;
* winner = max score, ties broken by GREATER depth (prefer the
  tightest subtree — body and the article div tie when the page has
  no links at all), then by FIRST document order. Fully deterministic.
* output = ``winner.text()`` — exact reference ``Element.text()``
  semantics (``engine/dom.py:1591``), so the emitted string is
  byte-identical to what a reference user would get calling
  ``.text()`` on the node Readability selected.

Scale shape: embarrassingly parallel actor-pool ``map_batches`` — one
parse per document (inherent), one extra O(text_nodes × depth) pass,
no shuffle, no driver state. Comments / CDATA / script ``DataNode``
payloads contribute nothing to the score (and nothing to ``text()``).
"""

from __future__ import annotations

import pyarrow as pa

from ..engine import parser as P
from ..engine.charset import decode_html
from ..engine.dom import CDataNode, Element, TextNode


def _collapsed_len(s: str) -> int:
    """Length of ``s`` with whitespace runs collapsed and ends trimmed
    — the same mass ``Element.text()`` would surface for this node."""
    return len(" ".join(s.split()))


def main_content_of(doc) -> str:
    """Pick the highest text-density element under <body> and return
    its exact ``Element.text()``. Empty string when there is no body
    or no text."""
    body = doc.body()
    if body is None:
        return ""

    # per-element accumulators, keyed by traversal order index
    elems: list[Element] = []
    depths: list[int] = []
    tchars: list[int] = []
    lchars: list[int] = []

    # DFS with explicit stack; path holds indices into the arrays above
    path: list[int] = []
    link_depth = 0
    POST = object()
    stack: list = [(body, 0)]
    while stack:
        item = stack.pop()
        if item is POST:
            idx = path.pop()
            if elems[idx].tag_name() == "a":
                link_depth -= 1
            continue
        node, depth = item
        if isinstance(node, Element):
            idx = len(elems)
            elems.append(node)
            depths.append(depth)
            tchars.append(0)
            lchars.append(0)
            path.append(idx)
            if node.tag_name() == "a":
                link_depth += 1
            stack.append(POST)
            for child in reversed(node.child_nodes()):
                stack.append((child, depth + 1))
        elif isinstance(node, TextNode) and not isinstance(node, CDataNode):
            n = _collapsed_len(node.get_whole_text())
            if n:
                in_link = link_depth > 0
                for idx in path:
                    tchars[idx] += n
                    if in_link:
                        lchars[idx] += n
        # DataNode (script/style payloads) and Comment: no text mass

    best = -1
    best_score = None
    for i in range(len(elems)):
        score = tchars[i] - 2 * lchars[i]
        key = (score, depths[i], -i)
        if best_score is None or key > best_score:
            best_score = key
            best = i
    if best < 0:
        return ""
    return elems[best].text()


def main_content_bytes(raw: bytes, max_nodes: int = 0) -> str:
    """bytes → main-content text (charset detect + parse + score)."""
    text, _charset = decode_html(raw)
    doc = P.parse(text, "", max_nodes=max_nodes)
    return main_content_of(doc)


class MainContent:
    """Actor-pool stage: CC-page batch (``url``, ``html`` binary) →
    (``url``, ``main_text``). Module-level parser tables are built once
    per worker process; the per-batch loop is per-row because parsing
    is inherently per-document (same rationale as ``ParseExtract``)."""

    def __init__(self, max_nodes: int = 0):
        self.max_nodes = max_nodes

    def __call__(self, batch: pa.Table) -> pa.Table:
        urls = batch.column("url")
        texts = [main_content_bytes(raw, self.max_nodes)
                 for raw in batch.column("html").to_pylist()]
        return pa.table({"url": urls,
                         "main_text": pa.array(texts, pa.string())})


def extract_main_content(ds, *, concurrency=(1, 8), batch_size: int = 64,
                         max_nodes: int = 0):
    """``map_batches(MainContent)`` over a CC-page Dataset."""
    return ds.map_batches(MainContent,
                          fn_constructor_kwargs={"max_nodes": max_nodes},
                          concurrency=concurrency, batch_size=batch_size,
                          batch_format="pyarrow")
