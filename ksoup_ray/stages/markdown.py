"""HTML → Markdown conversion over the real DOM — the extraction
format most LLM pretraining pipelines want next to plain text (it
keeps document STRUCTURE: headings, lists, links, emphasis, tables)
without any of HTML's noise. Runs through the full engine parse
(engine/parser.py), so every tokenizer/tree-construction guarantee
applies; the serializer is a CommonMark-flavored subset:

* ``h1..h6`` → ``#``·n heading lines
* ``p`` / stray inline runs → paragraphs, blank-line separated
* ``ul``/``ol`` → ``- `` / ``1. `` items (nested lists indented)
* ``a`` → ``[text](href)``, ``img`` → ``![alt](src)``
* ``strong``/``b`` → ``**x**``, ``em``/``i`` → ``*x*``,
  ``code`` → `` `x` ``
* ``pre`` → fenced block (verbatim whole_text)
* ``blockquote`` → ``> `` prefixed lines
* ``table`` → pipe table with a ``---`` separator row after row 1
* ``hr`` → ``---``; ``br`` → hard line break
* ``script``/``style``/``head`` content dropped

Text runs use the engine's whitespace normalization, so the markdown
inherits Element.text()'s exact collapse semantics. Stateless
per-batch stage — no shuffle, parser instantiated per actor.
"""

from __future__ import annotations

import pyarrow as pa

from ..engine import parser as KP

_HEADINGS = {"h1": 1, "h2": 2, "h3": 3, "h4": 4, "h5": 5, "h6": 6}
_BLOCKS = {"p", "ul", "ol", "pre", "blockquote", "table", "hr",
           "div", "section", "article", "main", "aside", "header",
           "footer", "nav", "figure", "body"} | set(_HEADINGS)
_SKIP = {"script", "style", "template", "noscript"}


def _wrap_inline(tag: str, node, inner: str) -> str:
    """Close-time wrapper for an inline container's rendered body."""
    if tag == "a":
        return f"[{inner}]({node.attr('href')})"
    if tag in ("strong", "b"):
        return f"**{inner}**" if inner.strip() else inner
    if tag in ("em", "i"):
        return f"*{inner}*" if inner.strip() else inner
    if tag == "code":
        return f"`{inner}`" if inner.strip() else inner
    return inner


def _inline(node) -> str:
    """Render a node as inline markdown — ITERATIVE (explicit
    enter/close stack with output-position markers), so hostile
    nesting depth can't blow the Python stack; the engine's own
    traversals hold the same guarantee."""
    out: list[str] = []
    stack = [("enter", node)]
    while stack:
        op, item = stack.pop()
        if op == "close":
            n, start = item
            inner = "".join(out[start:])
            del out[start:]
            out.append(_wrap_inline(n.node_name(), n, inner))
            continue
        name = item.node_name()
        if name == "#text":
            out.append(item.text())
            continue
        if name in ("#comment", "#data", "#cdata", "#doctype") \
                or name in _SKIP:
            continue
        if name == "br":
            out.append("\n")
            continue
        if name == "img":
            out.append(f"![{item.attr('alt')}]({item.attr('src')})")
            continue
        stack.append(("close", (item, len(out))))
        for c in reversed(item.child_nodes()):
            stack.append(("enter", c))
    return "".join(out)


def _list_items(el, ordered: bool, depth: int) -> list[str]:
    """Render a ul/ol subtree as item lines — ITERATIVE over an
    explicit frame stack (a 'list' frame walks li elements, an 'li'
    frame walks one item's child nodes), so arbitrarily nested lists
    can't blow the Python stack."""
    out: list[str] = []
    # list frame: ["list", lis, pos, ordered, depth, idx]
    # li frame:   ["li", nodes, pos, parts, marker, pad, dep, done]
    # done: the marker line was already emitted — text AFTER a nested
    # list becomes an INDENTED continuation line, never a phantom
    # second item with a stale marker
    stack = [["list", el.children(), 0, ordered, depth, 0]]

    def flush_item(fr):
        txt = "".join(fr[3]).strip()
        fr[3] = []
        if not txt:
            return
        if fr[7]:                           # continuation
            out.append(f"{fr[5]}  {txt}")
        else:
            out.append(f"{fr[5]}{fr[4]} {txt}")
            fr[7] = True

    while stack:
        fr = stack[-1]
        if fr[0] == "list":
            _, lis, pos, is_ord, dep, idx = fr
            if pos >= len(lis):
                stack.pop()
                continue
            fr[2] += 1
            li = lis[pos]
            if li.tag_name() != "li":
                continue
            fr[5] = idx = idx + 1
            marker = f"{idx}." if is_ord else "-"
            stack.append(["li", li.child_nodes(), 0, [],
                          marker, "  " * dep, dep, False])
        else:
            nodes, pos, dep = fr[1], fr[2], fr[6]
            if pos >= len(nodes):
                flush_item(fr)
                stack.pop()
                continue
            fr[2] += 1
            c = nodes[pos]
            nm = c.node_name()
            if nm in ("ul", "ol"):
                flush_item(fr)
                fr[7] = True      # nested list also claims the marker
                stack.append(["list", c.children(), 0, nm == "ol",
                              dep + 1, 0])
            else:
                fr[3].append(_inline(c))
    return out


def _table(el) -> list[str]:
    # DIRECT rows only (tr children of the table or of its
    # thead/tbody/tfoot) — a descendant select would re-emit nested
    # tables' rows at the outer level, duplicating their content
    trs = []
    for c in el.children():
        t = c.tag_name()
        if t == "tr":
            trs.append(c)
        elif t in ("thead", "tbody", "tfoot"):
            trs.extend(g for g in c.children()
                       if g.tag_name() == "tr")
    rows = []
    for tr in trs:
        cells = [c for c in tr.children()
                 if c.tag_name() in ("td", "th")]
        rows.append([
            "".join(_inline(n) for n in c.child_nodes()).strip()
            for c in cells])
    if not rows:
        return []
    out = ["| " + " | ".join(rows[0]) + " |",
           "| " + " | ".join("---" for _ in rows[0]) + " |"]
    for r in rows[1:]:
        out.append("| " + " | ".join(r) + " |")
    return out


def _blocks(el) -> list[str]:
    """Render an element's children as a list of markdown blocks —
    ITERATIVE: generic containers splice their children into the
    work stack (with a run-flush marker after them) and blockquotes
    close via an output-position marker, so hostile div/blockquote
    nesting depth can't blow the Python stack."""
    out: list[str] = []
    run: list[str] = []

    def flush():
        txt = "".join(run).strip()
        if txt:
            out.append(txt)
        run.clear()

    stack: list[tuple] = [("node", n)
                          for n in reversed(el.child_nodes())]
    while stack:
        op, item = stack.pop()
        if op == "flush":
            flush()
            continue
        if op == "bq_close":
            flush()
            inner = out[item:]
            del out[item:]
            if inner:
                out.append("\n".join(
                    "> " + line
                    for blk in inner for line in blk.split("\n")))
            continue
        node = item
        name = node.node_name()
        if name == "#text" or name not in _BLOCKS:
            if name in _SKIP:
                continue
            run.append(_inline(node))
            continue
        flush()
        tag = name
        if tag in _HEADINGS:
            txt = "".join(_inline(c)
                          for c in node.child_nodes()).strip()
            out.append("#" * _HEADINGS[tag] + " " + txt)
        elif tag == "p":
            txt = "".join(_inline(c)
                          for c in node.child_nodes()).strip()
            if txt:
                out.append(txt)
        elif tag in ("ul", "ol"):
            items = _list_items(node, tag == "ol", 0)
            if items:
                out.append("\n".join(items))
        elif tag == "pre":
            out.append("```\n" + node.whole_text().strip("\n")
                       + "\n```")
        elif tag == "blockquote":
            stack.append(("bq_close", len(out)))
            for c in reversed(node.child_nodes()):
                stack.append(("node", c))
        elif tag == "table":
            t = _table(node)
            if t:
                out.append("\n".join(t))
        elif tag == "hr":
            out.append("---")
        else:            # div/section/...: splice children in place
            stack.append(("flush", None))
            for c in reversed(node.child_nodes()):
                stack.append(("node", c))
    flush()
    return out


def to_markdown(html: str, base_uri: str = "") -> str:
    """Parse ``html`` with the full engine and serialize the body as
    markdown (blocks joined by blank lines)."""
    doc = KP.parse(html, base_uri)
    body = doc.body()
    if body is None:
        return ""
    return "\n\n".join(_blocks(body))


class MarkdownStage:
    """Actor-pool stage: (id, html) → (id, markdown). Parser state is
    per-actor; the per-batch loop is the parse itself (the work)."""

    def __init__(self, html_col: str = "html",
                 id_col: str = "doc_id"):
        self.html_col = html_col
        self.id_col = id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        mds = [to_markdown(h or "")
               for h in batch.column(self.html_col).to_pylist()]
        return pa.table({
            self.id_col: batch.column(self.id_col),
            "markdown": pa.array(mds, pa.string())})
