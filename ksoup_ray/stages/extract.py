"""ParseExtract — the flagship actor-pool stage.

``map_batches(ParseExtract, batch_format="pyarrow", concurrency=(a,b),
batch_size=B)`` over the CC-page table: per row, decode bytes (charset
precedence BOM → meta → UTF-8), HTML5-parse, strip boilerplate
(script/style/nav…), and emit the whitespace-normalized body text
(byte-identical to reference ``Element.text()``), plus title, meta
struct, resolved links, parse-error count and doc size.

Actor-pool rationale (SURVEY.md §2.6): tag/entity trait tables and
compiled selectors are module-level (built once per worker process);
the actor instance holds the compiled removal selector and per-actor
counters — amortized across every batch the actor processes, mirroring
the reference's SoftPool / ThreadLocal reuse discipline.

Scale notes:
* zero-copy in: Arrow binary column → Python bytes per row (unavoidable
  for parsing); out: plain Arrow arrays.
* the per-batch loop is per-ROW because an HTML5 parse is inherently
  per-document; all *cross-row* work stays vectorized/Arrow.
* oversized rows: rows above ``big_doc_bytes`` are parsed with the same
  code but counted separately; pair with byte-budget batching at the
  pipeline level so one 2 MB page doesn't stall a 4096-row batch.
"""

from __future__ import annotations

import pyarrow as pa

from ..engine import parser as P
from ..engine.charset import decode_html
from ..engine.select import parse_query

# north_star boilerplate-strip recipe: script/style/nav removal + chrome
DEFAULT_STRIP = "script, style, nav, noscript, template, iframe, svg, form"

# the full ~18-field parseMetaData surface (engine/parser.py:133-182,
# reference Ksoup.kt:192-288 + model/MetaData.kt:3-22) — field order
# matches parse_metadata's dict order
META_STRUCT = pa.struct([
    ("og_title", pa.string()),
    ("og_site_name", pa.string()),
    ("og_type", pa.string()),
    ("og_locale", pa.string()),
    ("og_description", pa.string()),
    ("og_image", pa.string()),
    ("og_url", pa.string()),
    ("twitter_title", pa.string()),
    ("twitter_card", pa.string()),
    ("twitter_description", pa.string()),
    ("twitter_image", pa.string()),
    ("title", pa.string()),
    ("description", pa.string()),
    ("author", pa.string()),
    ("canonical", pa.string()),
    ("html_title", pa.string()),
    ("favicon", pa.string()),
    ("shortcut_icon", pa.string()),
])
LINKS_TYPE = pa.list_(pa.struct([("href", pa.string()),
                                 ("text", pa.string())]))
SPANS_TYPE = pa.list_(pa.struct([("start", pa.int64()),
                                 ("end", pa.int64())]))

OUT_SCHEMA = pa.schema([
    ("url", pa.string()),
    ("extracted_text", pa.string()),
    ("title", pa.string()),
    ("meta", META_STRUCT),
    ("links", LINKS_TYPE),
    ("spans", SPANS_TYPE),
    ("lang", pa.string()),
    ("parse_errors", pa.int32()),
    ("doc_bytes", pa.int64()),
    ("partition_id", pa.int32()),
])


def extract_document(raw: bytes, base_uri: str = "",
                     strip_query=None, want_links: bool = True,
                     want_meta: bool = True, want_spans: bool = False,
                     max_nodes: int = 0, strip_tags=None):
    """Pure per-document kernel: bytes → extraction dict. Reusable from
    tests and from non-Ray callers. ``max_nodes`` > 0 arms the DOM size
    guard: a pathological document parses to at most that many nodes and
    comes back truncated (counted in parse_errors) instead of OOMing the
    worker — the StreamParser-substitute promised in SURVEY §2.1."""
    text, _charset = decode_html(raw)
    doc = P.parse(text, base_uri, max_nodes=max_nodes)
    n_errors = doc.parse_errors + (1 if doc.truncated else 0)

    title = doc.title()

    meta = None
    if want_meta:
        # the COMPLETE parseMetaData struct (all OG/Twitter/standard
        # fields + favicon/shortcut), not a 3-field subset — a crawl
        # user wants twitter/og image/url/card in the Parquet output
        meta = P.parse_metadata(doc)

    body = doc.body()
    links = []
    spans = []
    if body is not None:
        if strip_tags is not None:
            # FUSED pre-removal walk: one pre-order DFS collects BOTH the
            # a[href] link rows and the boilerplate-strip matches (the
            # strip selector is a pure tag-name union here), replacing
            # two full selector traversals. Link rows are gathered
            # before any removal — identical to the two-select order.
            from ..engine.dom import Element, TextNode
            to_remove = []
            stack = [body]
            pop = stack.pop
            while stack:
                node = pop()
                if isinstance(node, Element):
                    nm = node.tag.normal_name
                    if want_links and nm == "a" and node.has_attr("href"):
                        links.append(
                            {"href": node.abs_url("href")
                             or node.attr("href"),
                             "text": node.text()})
                    if nm in strip_tags:
                        to_remove.append(node)
                    kids = node._child_nodes
                    # single-text-child elements (most paragraphs)
                    # cannot contain an <a> or a strip target — skip
                    # the push/pop/isinstance round-trip for them
                    if kids and not (len(kids) == 1 and
                                     kids[0].__class__ is TextNode):
                        stack.extend(reversed(kids))
            for el in to_remove:
                el.remove()
        else:
            if want_links:
                for a in body.select("a[href]"):
                    links.append({"href": a.abs_url("href")
                                  or a.attr("href"),
                                  "text": a.text()})
            if strip_query is not None:
                for el in body.select(strip_query):
                    el.remove()
        # provenance spans (source offsets of contributing text nodes,
        # Range tracking — reference nodes/Range.kt / TreeBuilder.kt:
        # 295-333) are collected INSIDE the text walk: one DFS total
        extracted = body.text(spans_out=spans if want_spans else None)
    else:
        extracted = ""
    return {
        "extracted_text": extracted,
        "title": title,
        "meta": meta,
        "links": links,
        "spans": spans,
        "parse_errors": n_errors,
    }


class ParseExtract:
    """Callable class for ``map_batches`` (actor pool)."""

    def __init__(self, strip: str = DEFAULT_STRIP, num_partitions: int = 64,
                 want_links: bool = True, want_meta: bool = True,
                 want_spans: bool = True, big_doc_bytes: int = 1 << 20,
                 max_nodes: int = 2_000_000):
        # compiled once per actor (reference: ThreadLocal selector memo)
        self.strip_eval = parse_query(strip) if strip else None
        # pure tag-name strip unions take the fused single-walk path
        from ..engine.select import _tag_union
        self.strip_tags = (_tag_union(self.strip_eval)
                           if self.strip_eval is not None else None)
        self.num_partitions = num_partitions
        self.want_links = want_links
        self.want_meta = want_meta
        self.want_spans = want_spans
        self.big_doc_bytes = big_doc_bytes
        # ~100s parse / few-GB DOM worst case per doc; beyond this a doc
        # is truncated, flagged, and the pipeline keeps streaming
        self.max_nodes = max_nodes
        # per-actor counters (read via ds.stats() / lineage aggregation)
        self.docs = 0
        self.bytes = 0
        self.big_docs = 0

    def __call__(self, batch: pa.Table) -> pa.Table:
        urls = batch.column("url").to_pylist()
        htmls = batch.column("html").to_pylist()
        langs = (batch.column("lang").to_pylist()
                 if "lang" in batch.column_names else [None] * len(urls))
        n = len(urls)
        out_text: list[str] = []
        out_title: list[str] = []
        out_meta: list[dict | None] = []
        out_links: list[list] = []
        span_flat: list[int] = []   # start,end,start,end,... all docs
        span_counts: list[int] = []  # spans per doc (list offsets)
        out_errors: list[int] = []
        out_bytes: list[int] = []
        for url, raw in zip(urls, htmls):
            raw = raw or b""
            size = len(raw)
            if size > self.big_doc_bytes:
                self.big_docs += 1
            rec = extract_document(raw, url, self.strip_eval,
                                   self.want_links, self.want_meta,
                                   self.want_spans, self.max_nodes,
                                   strip_tags=self.strip_tags)
            out_text.append(rec["extracted_text"])
            out_title.append(rec["title"])
            out_meta.append(rec["meta"])
            out_links.append(rec["links"])
            sp = rec["spans"]
            span_flat.extend(sp)
            span_counts.append(len(sp) >> 1)
            out_errors.append(rec["parse_errors"])
            out_bytes.append(size)
            self.docs += 1
            self.bytes += size
        # spans column from the flat int pairs: one numpy reshape + a
        # StructArray/ListArray build — no per-span Python dict on
        # either side of the Arrow boundary
        import numpy as np
        flat = np.asarray(span_flat, np.int64).reshape(-1, 2)
        offs = np.zeros(n + 1, np.int32)
        np.cumsum(span_counts, out=offs[1:])
        spans_col = pa.ListArray.from_arrays(
            pa.array(offs, pa.int32()),
            pa.StructArray.from_arrays(
                [pa.array(flat[:, 0], pa.int64()),
                 pa.array(flat[:, 1], pa.int64())],
                names=["start", "end"]))
        # partition_id / doc_bytes are computed ONCE at ingest
        # (_add_ingest_columns) and passed through; fall back to local
        # computation only when the stage runs standalone
        if "partition_id" in batch.column_names:
            part_col = batch.column("partition_id").cast(pa.int32())
        else:
            part_col = pa.array(
                [_partition_of(u, self.num_partitions) for u in urls],
                pa.int32())
        if "doc_bytes" in batch.column_names:
            bytes_col = batch.column("doc_bytes").cast(pa.int64())
        else:
            bytes_col = pa.array(out_bytes, pa.int64())
        return pa.table({
            "url": batch.column("url"),
            "extracted_text": pa.array(out_text, pa.string()),
            "title": pa.array(out_title, pa.string()),
            "meta": pa.array(out_meta, META_STRUCT),
            "links": pa.array(out_links, LINKS_TYPE),
            "spans": spans_col,
            "lang": pa.array(langs, pa.string()),
            "parse_errors": pa.array(out_errors, pa.int32()),
            "doc_bytes": bytes_col,
            "partition_id": part_col,
        })


def _partition_of(url: str, num_partitions: int) -> int:
    """Deterministic partition id (checkpoint/lineage granularity).
    Stable across runs and processes — NOT Python hash() (salted)."""
    import zlib
    return zlib.crc32(url.encode()) % num_partitions


class SelectStage:
    """Generic CSS-select stage: per row, run a compiled query over the
    parsed doc and emit match count + first-match text/attr. Demonstrates
    the query/predicate engine as a distributed operator."""

    def __init__(self, query: str, attr: str | None = None):
        self.eval = parse_query(query)
        self.query = query
        self.attr = attr

    def __call__(self, batch: pa.Table) -> pa.Table:
        htmls = batch.column("html").to_pylist()
        counts: list[int] = []
        firsts: list[str | None] = []
        for raw in htmls:
            text, _ = decode_html(raw or b"")
            doc = P.parse(text)
            matches = doc.select(self.eval)
            counts.append(len(matches))
            if matches:
                el = matches[0]
                firsts.append(el.attr(self.attr) if self.attr else el.text())
            else:
                firsts.append(None)
        out = {
            "url": batch.column("url"),
            "n_matches": pa.array(counts, pa.int64()),
            "first_match": pa.array(firsts, pa.string()),
        }
        return pa.table(out)


class ParagraphStage:
    """Paragraph-expansion stage (flat-map shape): per page, parse the
    DOM, select the content paragraphs with the compiled query (once
    per actor), and emit ONE OUTPUT ROW PER PARAGRAPH — the row
    granularity every paragraph-level curation pipeline (line dedup,
    per-paragraph quality filters, RefinedWeb-style repetition
    removal) operates at. Output: (url, para_idx, para_text,
    is_aninfo) — para order is document order; entity-encoded runs
    decode through the tokenizer like any text."""

    def __init__(self, query: str = "#content > p",
                 flag_class: str = "an-info"):
        self.eval = parse_query(query)
        self.flag_class = flag_class

    def __call__(self, batch: pa.Table) -> pa.Table:
        urls_in = batch.column("url").to_pylist()
        htmls = batch.column("html").to_pylist()
        urls: list[str] = []
        idxs: list[int] = []
        texts: list[str] = []
        flags: list[bool] = []
        for url, raw in zip(urls_in, htmls):
            text, _ = decode_html(raw or b"")
            doc = P.parse(text)
            for i, el in enumerate(doc.select(self.eval)):
                urls.append(url)
                idxs.append(i)
                texts.append(el.text())
                flags.append(self.flag_class in
                             (el.attr("class") or "").split())
        return pa.table({
            "url": pa.array(urls, pa.string()),
            "para_idx": pa.array(idxs, pa.int64()),
            "para_text": pa.array(texts, pa.string()),
            "is_aninfo": pa.array(flags, pa.bool_()),
        })


class TableExtractStage:
    """Classic scrape-a-table operator (the single most common jsoup
    recipe: ``doc.select("tr")`` then walk cells — reference
    Element.kt select/children/text surface): per page, emit one
    output row per table CELL as (doc_id, row_idx, col_idx, cell,
    is_header) — row order is document order (thead first), cell text
    through full ``Element.text()`` normalization (bold wrappers
    collapse). Actor-pool stage: the selector compiles once per actor;
    html arrives as a string column (query-local synth)."""

    def __init__(self):
        self.tr = parse_query("tr")

    def __call__(self, batch: pa.Table) -> pa.Table:
        doc_ids: list[int] = []
        row_idx: list[int] = []
        col_idx: list[int] = []
        cells: list[str] = []
        is_hdr: list[bool] = []
        for did, html in zip(batch.column("doc_id").to_pylist(),
                             batch.column("html").to_pylist()):
            doc = P.parse(html or "")
            for ri, tr in enumerate(doc.select(self.tr)):
                cs = [ch for ch in tr.children()
                      if ch.normal_name() in ("td", "th")]
                for ci, cell in enumerate(cs):
                    doc_ids.append(did)
                    row_idx.append(ri)
                    col_idx.append(ci)
                    cells.append(cell.text())
                    is_hdr.append(cell.normal_name() == "th")
        return pa.table({
            "doc_id": pa.array(doc_ids, pa.int64()),
            "row_idx": pa.array(row_idx, pa.int64()),
            "col_idx": pa.array(col_idx, pa.int64()),
            "cell": pa.array(cells, pa.string()),
            "is_header": pa.array(is_hdr, pa.bool_()),
        })


class FormExtractStage:
    """Form scraping through ``FormElement.form_data()`` (dom.py:2272,
    jsoup formData semantics: disabled/unnamed skipped, checkbox only
    when checked defaulting 'on', select emits selected options with
    first-option fallback, textarea value = text): per page, one
    output row per submitted field as (doc_id, field_idx, field,
    value) in submission order. Actor-pool stage; selector compiled
    once per actor."""

    def __init__(self):
        self.form = parse_query("form")

    def __call__(self, batch: pa.Table) -> pa.Table:
        doc_ids: list[int] = []
        idxs: list[int] = []
        fields: list[str] = []
        values: list[str] = []
        for did, html in zip(batch.column("doc_id").to_pylist(),
                             batch.column("html").to_pylist()):
            doc = P.parse(html or "")
            forms = doc.select(self.form)
            if not forms:
                continue
            for i, (name, val) in enumerate(forms[0].form_data()):
                doc_ids.append(did)
                idxs.append(i)
                fields.append(name)
                values.append(val)
        return pa.table({
            "doc_id": pa.array(doc_ids, pa.int64()),
            "field_idx": pa.array(idxs, pa.int64()),
            "field": pa.array(fields, pa.string()),
            "value": pa.array(values, pa.string()),
        })


class MicrodataStage:
    """schema.org microdata extraction (select('[itemprop]') + per-tag
    value rule: <time> reads its datetime ATTRIBUTE, everything else
    Element.text() — jsoup's recommended recipe for structured data):
    one output row per (doc_id, prop, value) in document order.
    Actor-pool stage; attribute selector compiled once per actor."""

    def __init__(self):
        self.props = parse_query("[itemprop]")

    def __call__(self, batch: pa.Table) -> pa.Table:
        doc_ids: list[int] = []
        props: list[str] = []
        values: list[str] = []
        for did, html in zip(batch.column("doc_id").to_pylist(),
                             batch.column("html").to_pylist()):
            doc = P.parse(html or "")
            for el in doc.select(self.props):
                doc_ids.append(did)
                props.append(el.attr("itemprop"))
                values.append(el.attr("datetime")
                              if el.normal_name() == "time"
                              else el.text())
        return pa.table({
            "doc_id": pa.array(doc_ids, pa.int64()),
            "prop": pa.array(props, pa.string()),
            "value": pa.array(values, pa.string()),
        })


class OutlineStage:
    """Document heading outline (select('h1, h2, h3') in document
    order — the table-of-contents scrape): one row per heading with
    its position, level and text. Actor-pool stage; the multi-tag OR
    selector is compiled once per actor."""

    def __init__(self):
        self.headings = parse_query("h1, h2, h3")

    def __call__(self, batch: pa.Table) -> pa.Table:
        doc_ids: list[int] = []
        pos: list[int] = []
        levels: list[int] = []
        texts: list[str] = []
        for did, html in zip(batch.column("doc_id").to_pylist(),
                             batch.column("html").to_pylist()):
            doc = P.parse(html or "")
            for i, el in enumerate(doc.select(self.headings)):
                doc_ids.append(did)
                pos.append(i)
                levels.append(int(el.normal_name()[1]))
                texts.append(el.text())
        return pa.table({
            "doc_id": pa.array(doc_ids, pa.int64()),
            "pos": pa.array(pos, pa.int64()),
            "level": pa.array(levels, pa.int64()),
            "text": pa.array(texts, pa.string()),
        })


class ImgAuditStage:
    """Image accessibility audit (select('img') + hasAttr('alt') —
    the classic jsoup alt-text sweep): per document, total images and
    how many lack an alt attribute. Attribute PRESENCE, not value —
    alt=\"\" counts as present."""

    def __init__(self):
        self.imgs = parse_query("img")

    def __call__(self, batch: pa.Table) -> pa.Table:
        doc_ids: list[int] = []
        n_imgs: list[int] = []
        n_missing: list[int] = []
        for did, html in zip(batch.column("doc_id").to_pylist(),
                             batch.column("html").to_pylist()):
            doc = P.parse(html or "")
            els = doc.select(self.imgs)
            doc_ids.append(did)
            n_imgs.append(len(els))
            n_missing.append(sum(1 for el in els
                                 if not el.has_attr("alt")))
        return pa.table({
            "doc_id": pa.array(doc_ids, pa.int64()),
            "n_imgs": pa.array(n_imgs, pa.int64()),
            "n_missing_alt": pa.array(n_missing, pa.int64()),
        })


class MetaRobotsStage:
    """Crawl-directive extraction (select('meta[name=robots]') +
    content token scan): per document, whether the tag exists and its
    noindex/nofollow flags as 0/1 ints (int, not bool, for oracle
    hash parity)."""

    def __init__(self):
        self.meta = parse_query("meta[name=robots]")

    def __call__(self, batch: pa.Table) -> pa.Table:
        doc_ids: list[int] = []
        has_meta: list[int] = []
        noindex: list[int] = []
        nofollow: list[int] = []
        for did, html in zip(batch.column("doc_id").to_pylist(),
                             batch.column("html").to_pylist()):
            doc = P.parse(html or "")
            el = doc.select_first(self.meta)
            tokens = ([t.strip() for t in
                       el.attr("content").lower().split(",")]
                      if el is not None else [])
            doc_ids.append(did)
            has_meta.append(int(el is not None))
            noindex.append(int("noindex" in tokens))
            nofollow.append(int("nofollow" in tokens))
        return pa.table({
            "doc_id": pa.array(doc_ids, pa.int64()),
            "has_meta": pa.array(has_meta, pa.int64()),
            "noindex": pa.array(noindex, pa.int64()),
            "nofollow": pa.array(nofollow, pa.int64()),
        })


class DomDepthStage:
    """DOM-shape profile (iterative element walk — NodeTraversor
    semantics without recursion, so adversarially deep pages can't
    blow the stack): per document, the maximum ELEMENT depth
    (html = 1) and the total element count. The structure-complexity
    signal a boilerplate classifier feeds on."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        doc_ids: list[int] = []
        depths: list[int] = []
        counts: list[int] = []
        for did, html in zip(batch.column("doc_id").to_pylist(),
                             batch.column("html").to_pylist()):
            doc = P.parse(html or "")
            stack = [(el, 1) for el in doc.children()]
            max_d = 0
            n = 0
            while stack:
                el, d = stack.pop()
                n += 1
                if d > max_d:
                    max_d = d
                stack.extend((c, d + 1) for c in el.children())
            doc_ids.append(did)
            depths.append(max_d)
            counts.append(n)
        return pa.table({
            "doc_id": pa.array(doc_ids, pa.int64()),
            "max_depth": pa.array(depths, pa.int64()),
            "n_elements": pa.array(counts, pa.int64()),
        })


class StructuralCssStage:
    """Structural-pseudo-class selector counts (nth-child families +
    sibling combinators — the part of the CSS grammar a tag/attr
    index can't answer): per document, match counts for four
    compiled-once-per-actor structural selectors."""

    _SELECTORS = (("n_odd", "li:nth-child(odd)"),
                  ("n_even", "li:nth-child(2n)"),
                  ("n_adj", "li + li"),
                  ("n_sib", "li:first-child ~ li"))

    def __init__(self):
        self.evals = [(name, parse_query(q))
                      for name, q in self._SELECTORS]

    def __call__(self, batch: pa.Table) -> pa.Table:
        out: dict[str, list[int]] = {name: []
                                     for name, _ in self.evals}
        doc_ids: list[int] = []
        for did, html in zip(batch.column("doc_id").to_pylist(),
                             batch.column("html").to_pylist()):
            doc = P.parse(html or "")
            doc_ids.append(did)
            for name, ev in self.evals:
                out[name].append(len(doc.select(ev)))
        cols: dict[str, pa.Array] = {
            "doc_id": pa.array(doc_ids, pa.int64())}
        for name, _ in self.evals:
            cols[name] = pa.array(out[name], pa.int64())
        return pa.table(cols)
