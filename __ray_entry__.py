"""Driver contract for the graft builder (Ray Data target).

Ray is initialised by the driver BEFORE this module is imported; nothing
here (or in ksoup_ray) calls ray.init()/ray.shutdown().

Each ``queries()`` entry is an implemented operator/pipeline from
SURVEY.md §2 (+ the training-data ops); ``oracle_sql()`` gives the
equivalent DuckDB SQL over the same parquet views. Extraction queries
run over pages SYNTHESIZED deterministically from the ``documents``
table (ksoup_ray.sources.synth) — the synthesis is invertible, so the
oracle states the expected extraction output in terms of the original
columns (byte-identical ``extracted_text`` == ``text``).
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

SYNTH_URL_SQL = ("'https://synth.invalid/' || lang || '/' || "
                 "lpad(CAST(doc_id AS VARCHAR), 8, '0')")
TITLE_SQL = "'Doc ' || lpad(CAST(doc_id AS VARCHAR), 8, '0')"

# exact 5-word-shingle Jaccard pairs at threshold 0.5 — the ground truth
# the LSH+verify pipeline must reproduce (corpus pairs sit at J≥0.8 or
# J<0.1, so 0.5 lies in a wide gap; see _q_minhash_dedup recall note)
# Shared BPE merge-application replay (greedy left-to-right ==
# run-parity window rule, same as the bpe_learn oracle) for the FIXED
# merges ('t','h') ('a','t') ('e','r'): expects a CTE ``dw`` with the
# DISTINCT words, defines ``wn(w, ntoks)`` — post-merge token counts.
_BPE_APPLY_CTES = """
            t0 AS (
              SELECT w, CAST(i AS INTEGER) AS pos,
                     substr(w, CAST(i AS INTEGER), 1) AS tok
              FROM dw, UNNEST(range(1, LENGTH(w) + 1)) AS t(i)),
            mk1 AS (
              SELECT w, pos, tok,
                     (tok = 't' AND
                      LEAD(tok) OVER (PARTITION BY w ORDER BY pos)
                        = 'h') AS is_mark
              FROM t0),
            sel1 AS (
              SELECT w, pos FROM (
                SELECT w, pos,
                       ROW_NUMBER() OVER (PARTITION BY w, grp
                                          ORDER BY pos) AS off
                FROM (SELECT w, pos,
                             pos - ROW_NUMBER() OVER (
                               PARTITION BY w ORDER BY pos) AS grp
                      FROM mk1 WHERE is_mark))
              WHERE off % 2 = 1),
            t1 AS (
              SELECT w, ROW_NUMBER() OVER (PARTITION BY w
                                           ORDER BY opos) AS pos,
                     tok
              FROM (
                SELECT t.w, t.pos AS opos,
                       CASE WHEN s.pos IS NOT NULL
                            THEN 'th' ELSE t.tok END AS tok
                FROM mk1 t
                LEFT JOIN sel1 s ON s.w = t.w AND s.pos = t.pos
                LEFT JOIN sel1 sp ON sp.w = t.w AND sp.pos = t.pos - 1
                WHERE sp.pos IS NULL)),
            mk2 AS (
              SELECT w, pos, tok,
                     (tok = 'a' AND
                      LEAD(tok) OVER (PARTITION BY w ORDER BY pos)
                        = 't') AS is_mark
              FROM t1),
            sel2 AS (
              SELECT w, pos FROM (
                SELECT w, pos,
                       ROW_NUMBER() OVER (PARTITION BY w, grp
                                          ORDER BY pos) AS off
                FROM (SELECT w, pos,
                             pos - ROW_NUMBER() OVER (
                               PARTITION BY w ORDER BY pos) AS grp
                      FROM mk2 WHERE is_mark))
              WHERE off % 2 = 1),
            t2 AS (
              SELECT w, ROW_NUMBER() OVER (PARTITION BY w
                                           ORDER BY opos) AS pos,
                     tok
              FROM (
                SELECT t.w, t.pos AS opos,
                       CASE WHEN s.pos IS NOT NULL
                            THEN 'at' ELSE t.tok END AS tok
                FROM mk2 t
                LEFT JOIN sel2 s ON s.w = t.w AND s.pos = t.pos
                LEFT JOIN sel2 sp ON sp.w = t.w AND sp.pos = t.pos - 1
                WHERE sp.pos IS NULL)),
            mk3 AS (
              SELECT w, pos, tok,
                     (tok = 'e' AND
                      LEAD(tok) OVER (PARTITION BY w ORDER BY pos)
                        = 'r') AS is_mark
              FROM t2),
            sel3 AS (
              SELECT w, pos FROM (
                SELECT w, pos,
                       ROW_NUMBER() OVER (PARTITION BY w, grp
                                          ORDER BY pos) AS off
                FROM (SELECT w, pos,
                             pos - ROW_NUMBER() OVER (
                               PARTITION BY w ORDER BY pos) AS grp
                      FROM mk3 WHERE is_mark))
              WHERE off % 2 = 1),
            t3 AS (
              SELECT w, ROW_NUMBER() OVER (PARTITION BY w
                                           ORDER BY opos) AS pos,
                     tok
              FROM (
                SELECT t.w, t.pos AS opos,
                       CASE WHEN s.pos IS NOT NULL
                            THEN 'er' ELSE t.tok END AS tok
                FROM mk3 t
                LEFT JOIN sel3 s ON s.w = t.w AND s.pos = t.pos
                LEFT JOIN sel3 sp ON sp.w = t.w AND sp.pos = t.pos - 1
                WHERE sp.pos IS NULL)),
            wn AS (SELECT w, count(*) AS ntoks FROM t3 GROUP BY w)
"""

_JACCARD_PAIRS_SQL = """
    WITH sh AS (
      SELECT doc_id, list_distinct(CASE WHEN len(words) < 5
               THEN [array_to_string(words, ' ')]
               ELSE list_transform(range(1, len(words) - 3),
                                   i -> array_to_string(words[i:i+4], ' '))
               END) AS s
      FROM (SELECT doc_id, string_split(text, ' ') AS words FROM documents)
    ), ex AS (SELECT doc_id, unnest(s) AS g FROM sh),
    inter AS (
      SELECT a.doc_id AS ia, b.doc_id AS ib, count(*) AS i
      FROM ex a JOIN ex b ON a.g = b.g AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    ), sizes AS (SELECT doc_id, len(s) AS n FROM sh)
    SELECT ia, ib
    FROM inter
    JOIN sizes sa ON sa.doc_id = ia
    JOIN sizes sb ON sb.doc_id = ib
    WHERE i::DOUBLE / (sa.n + sb.n - i) >= 0.5
"""



def _read(*args, **kwargs):
    """``ray.data.read_parquet`` with the parquet footer's pandas
    schema metadata stripped BLOCK-WISE (batch_size=None → no concat):
    a ``pa.Schema`` carrying a metadata dict is unhashable, which
    defeats Ray's shuffle schema-dedup fast path and logs a
    ``Failed to hash the schemas`` warning from every reducer fed by
    such blocks. Zero-copy; shared by every registry query."""
    import ray.data as rd
    ds = rd.read_parquet(*args, **kwargs)
    return ds.map_batches(lambda b: b.replace_schema_metadata(None),
                          batch_format="pyarrow", batch_size=None)

def _pages(sf_dir: str):
    from ksoup_ray.sources.synth import cc_pages
    return cc_pages(sf_dir)


def _extracted(sf_dir: str):
    from ksoup_ray.pipelines.extract import run_extraction
    return run_extraction(_pages(sf_dir), out_dir="", write=False,
                          concurrency=(2, 8), batch_size=64)


def _corr_matrix_sql() -> str:
    """Mirror of functions/agg.corr_pairs over lineitem: HUGEINT
    sufficient statistics (the squared-cents sums overflow BIGINT at
    sf>=0.01), then the SAME float nesting as the Python fold —
    num/den product first, *1e6 last."""
    cols = [("l_quantity", "ROUND(l_quantity)"),
            ("l_extendedprice", "ROUND(l_extendedprice * 100)"),
            ("l_discount", "ROUND(l_discount * 10000)"),
            ("l_tax", "ROUND(l_tax * 10000)")]
    sums = ["COUNT(*) AS n"]
    for i, (_, e) in enumerate(cols):
        h = f"CAST({e} AS HUGEINT)"
        sums.append(f"SUM({h}) AS s{i}")
        sums.append(f"SUM({h} * {h}) AS q{i}")
    pairs = [(i, j) for i in range(len(cols))
             for j in range(i + 1, len(cols))]
    for i, j in pairs:
        hi = f"CAST({cols[i][1]} AS HUGEINT)"
        hj = f"CAST({cols[j][1]} AS HUGEINT)"
        sums.append(f"SUM({hi} * {hj}) AS p{i}_{j}")
    sel = []
    for i, j in pairs:
        sel.append(
            f"SELECT '{cols[i][0]}' AS x_col, "
            f"'{cols[j][0]}' AS y_col, CAST(n AS BIGINT) AS n, "
            f"CAST(ROUND(CAST(n * p{i}_{j} - s{i} * s{j} AS DOUBLE)"
            f" / (sqrt(CAST(n * q{i} - s{i} * s{i} AS DOUBLE))"
            f" * sqrt(CAST(n * q{j} - s{j} * s{j} AS DOUBLE)))"
            f" * 1000000.0) AS BIGINT) AS corr_micros FROM s")
    return ("WITH s AS (SELECT " + ", ".join(sums)
            + " FROM lineitem) " + " UNION ALL ".join(sel))


def entry() -> Any:
    """Flagship: synth CC pages from sf0.001 → ParseExtract actor pool."""
    ds = _extracted("/root/testdata/sf0.001")
    return ds.select_columns(["url", "extracted_text", "title", "lang",
                              "parse_errors", "doc_bytes", "partition_id"])


# ---------------------------------------------------------------------------

def _q_extract_text(sf_dir: str):
    return _extracted(sf_dir).select_columns(["url", "extracted_text",
                                              "title"])


def _q_extract_from_files(sf_dir: str):
    """The reference's parseFile / gzip-file surface
    (`helper/DataUtil.kt:49-51`) as a Ray source: the synth corpus is
    materialized ONCE (cached) as sharded .html / .html.gz files, read
    back via ray.data.read_binary_files (gzip detected by magic
    bytes), and run through the SAME extraction pipeline — oracle =
    the extract_text SQL, so the file round-trip is value-checked
    byte-identically."""
    import os
    from ksoup_ray.pipelines.extract import run_extraction
    from ksoup_ray.sources.files import read_html_files, write_html_shards

    cache = f"/tmp/ksoup_file_corpus/{os.path.basename(sf_dir.rstrip('/'))}"
    marker = os.path.join(cache, "_COMPLETE")
    if not os.path.exists(marker):
        n = write_html_shards(_pages(sf_dir), cache, num_shards=16,
                              gzip_every=2)
        with open(marker, "w") as f:
            f.write(str(n))
    ds = read_html_files(cache)
    out = run_extraction(ds, out_dir="", write=False,
                         concurrency=(2, 8), batch_size=64)
    return out.select_columns(["url", "extracted_text", "title"])


def _q_extract_from_warc(sf_dir: str):
    """Common-Crawl's actual container: WARC shards of per-record gzip
    members (sources/warc.py). The synth corpus is materialized once
    as .warc.gz shards, streamed back whole-shard via
    read_binary_files, member-split + header-parsed in workers, and
    run through the SAME extraction pipeline — oracle = extract_text,
    so the WARC round-trip is value-checked byte-identically."""
    import os
    from ksoup_ray.pipelines.extract import run_extraction
    from ksoup_ray.sources.warc import read_warc, write_warc_shards

    cache = f"/tmp/ksoup_warc_corpus/{os.path.basename(sf_dir.rstrip('/'))}"
    marker = os.path.join(cache, "_COMPLETE")
    if not os.path.exists(marker):
        n = write_warc_shards(_pages(sf_dir), cache,
                              records_per_file=64)
        with open(marker, "w") as f:
            f.write(str(n))
    ds = read_warc(cache)
    out = run_extraction(ds, out_dir="", write=False,
                         concurrency=(2, 8), batch_size=64)
    return out.select_columns(["url", "extracted_text", "title"])


def _q_cdx_lookup(sf_dir: str):
    """CDX RANDOM ACCESS (sources/warc.py read_cdx/fetch_records):
    shards are written once with .cdx sidecars (surt-sorted
    offset/length lines), then every 10th document is point-looked-up
    — seek to the member's byte range, inflate ONE gzip member, parse
    the record, and run the full extraction on just those pages.
    Oracle = the original text of the sampled docs, so a wrong
    offset, length, member boundary, or SURT key breaks the hash.
    This is how a 100 TB corpus serves per-URL reads without
    streaming shards."""
    import os
    from ksoup_ray.pipelines.extract import run_extraction
    from ksoup_ray.sources.warc import (fetch_records, read_cdx,
                                        write_warc_shards)

    cache = f"/tmp/ksoup_cdx_corpus/{os.path.basename(sf_dir.rstrip('/'))}"
    marker = os.path.join(cache, "_COMPLETE")
    if not os.path.exists(marker):
        os.makedirs(cache, exist_ok=True)
        n = write_warc_shards(_pages(sf_dir), cache,
                              records_per_file=64, cdx=True)
        with open(marker, "w") as f:
            f.write(str(n))

    idx = read_cdx(cache)

    def sample(batch: pa.Table) -> pa.Table:
        # url tail is the zero-padded doc_id (synth url_for layout)
        return batch.filter(pa.array(
            [int(u[-8:]) % 10 == 0
             for u in batch.column("url").to_pylist()]))

    picked = idx.map_batches(sample, batch_format="pyarrow")
    pages = fetch_records(cache, picked)
    out = run_extraction(pages, out_dir="", write=False,
                         concurrency=(1, 4), batch_size=64)
    return out.select_columns(["url", "extracted_text"])


def _q_extract_links(sf_dir: str):
    ds = _extracted(sf_dir)

    def count_links(batch: pa.Table) -> pa.Table:
        return pa.table({
            "url": batch.column("url"),
            "n_links": pc.cast(pc.list_value_length(batch.column("links")),
                               pa.int64()),
        })

    return ds.map_batches(count_links, batch_format="pyarrow")


def _q_link_edges(sf_dir: str):
    """Web-graph edge list: per page, every <a href> resolved to an
    absolute url (abs: semantics, engine/urlutil.py) and mapped back
    to a doc_id — the building block for link-graph analytics over a
    crawl. Vectorized: one list-flatten + offset-repeat per batch, no
    per-row Python. Oracle: the synth convention emits link k of doc d
    as (d + k + 1) % 1e8 in the SAME language (sources/synth.py), so
    every resolved edge is value-checked, not just counted."""
    import numpy as np
    ds = _extracted(sf_dir)

    def edges(batch: pa.Table) -> pa.Table:
        col = batch.column("links").combine_chunks()
        urls = batch.column("url").to_pylist()
        src = np.array([int(u.rsplit("/", 1)[1]) for u in urls],
                       dtype=np.int64)
        n_links = pc.list_value_length(col).to_numpy(
            zero_copy_only=False).astype(np.int64)
        flat = col.flatten()
        hrefs = pc.struct_field(flat, "href").to_pylist()
        dst = np.array([int(h.rsplit("/", 1)[1]) for h in hrefs],
                       dtype=np.int64)
        return pa.table({
            "src": pa.array(np.repeat(src, n_links), pa.int64()),
            "dst": pa.array(dst, pa.int64()),
        })

    return ds.map_batches(edges, batch_format="pyarrow")


def _q_pagerank(sf_dir: str):
    """PageRank over the crawl's link graph, VALUE-CHECKED float
    surface (functions/graph.py pagerank_picos): 2 power iterations
    in exact int64 pico-rank arithmetic (floor divisions, damping
    85/100) followed by ONE float division rank = rank_picos / 10^12.
    Every pico rank is ≤ 10^12 < 2^53, so the division is a single
    exact-input IEEE op — order-free and reproduced bit-for-bit by
    the DuckDB oracle (the unrolled 2-round CTE + the same division).
    The general float ``pagerank(iters=k)`` API stays available in
    functions/graph.py (pytest-pinned on a 5-node graph + rank-sum≈1
    invariant); this registry entry uses the exact form so the driver
    artifact value-checks the whole family instead of reporting
    no_oracle."""
    from ksoup_ray.functions.graph import pagerank_picos
    edges = _q_link_edges(sf_dir)
    ranks = pagerank_picos(edges, iters=2)

    def to_float(batch: pa.Table) -> pa.Table:
        picos = batch.column("rank_picos").to_numpy(
            zero_copy_only=False).astype(np.int64)
        return pa.table({
            "node": batch.column("node"),
            "rank": pa.array(picos / 1.0e12, pa.float64()),
        })

    return ranks.map_batches(to_float, batch_format="pyarrow")


def _q_pagerank_2iter(sf_dir: str):
    """VALUE-CHECKED PageRank (functions/graph.py pagerank_picos):
    2 power iterations in EXACT int64 pico-rank arithmetic — floor
    divisions, damping 85/100 — so the DuckDB oracle (two unrolled
    join+group-by CTE rounds over the reconstructed edge list)
    reproduces every rank bit-for-bit. Same distributed shape as the
    float ``pagerank`` (bucket-block spread, join-free rounds); this
    query closes the iterative family's oracle gap."""
    from ksoup_ray.functions.graph import pagerank_picos
    edges = _q_link_edges(sf_dir)
    return pagerank_picos(edges, iters=2)


def _q_labelprop_2iter(sf_dir: str):
    """Community detection by synchronous min-label propagation over
    the UNDIRECTED link graph, 2 fixed rounds
    (functions/graph.labelprop_rounds) — same co-partitioned
    join-free round shape as pagerank_picos, folded with a NATIVE
    Min aggregate. The DuckDB oracle unrolls both rounds over the
    doubled edge list, so every intermediate label is on the hash."""
    from ksoup_ray.functions.graph import labelprop_rounds
    edges = _q_link_edges(sf_dir)
    return labelprop_rounds(edges, iters=2)


def _q_extract_spans(sf_dir: str):
    """Source-range provenance (north rule "text/spans"): per url, the
    count of text-node spans contributing to extracted_text and the
    total SOURCE chars they cover. Closed-form on synth pages: 13-word
    paragraph chunks; docs with doc_id%7==3 entity-encode the first
    word, which widens its source span ('&#'+digits+';' per char) — the
    SQL oracle reproduces both."""
    import numpy as np
    ds = _extracted(sf_dir)

    def span_stats(batch: pa.Table) -> pa.Table:
        col = batch.column("spans").combine_chunks()
        n = pc.cast(pc.list_value_length(col), pa.int64())
        flat = col.flatten()
        diff = pc.subtract(pc.struct_field(flat, "end"),
                           pc.struct_field(flat, "start")) \
            .to_numpy(zero_copy_only=False)
        offsets = np.asarray(col.offsets)
        rel = offsets - offsets[0]
        cs = np.concatenate([[0], np.cumsum(diff)])
        sums = (cs[rel[1:]] - cs[rel[:-1]]).astype("int64")
        return pa.table({
            "url": batch.column("url"),
            "n_spans": n,
            "span_len_sum": pa.array(sums, pa.int64()),
        })

    return ds.map_batches(span_stats, batch_format="pyarrow")


def _q_extract_meta(sf_dir: str):
    """The FULL ~18-field parseMetaData struct (engine/parser.py:133-
    182, reference Ksoup.kt:192-288) flattened to columns — every
    OG/Twitter/standard field plus favicon precedence (rel~=icon is a
    regex-contains matcher, so a 'shortcut icon' link can BE the
    favicon when no rel=icon link precedes it) is value-checked
    against a flat CASE oracle over the synth page generator. The
    meta[name=title] field flattens as ``meta_title`` (the top-level
    ``title`` column is the <title> element)."""
    ds = _extracted(sf_dir)

    def meta_cols(batch: pa.Table) -> pa.Table:
        meta = batch.column("meta")
        out = {"url": batch.column("url")}
        for f in ("og_title", "og_site_name", "og_type", "og_locale",
                  "og_description", "og_image", "og_url",
                  "twitter_title", "twitter_card",
                  "twitter_description", "twitter_image",
                  "description", "author", "canonical", "html_title",
                  "favicon", "shortcut_icon"):
            out[f] = pc.struct_field(meta, f)
        out["meta_title"] = pc.struct_field(meta, "title")
        return pa.table(out)

    return ds.map_batches(meta_cols, batch_format="pyarrow")


def _q_select_css(sf_dir: str):
    """CSS-selector engine as a distributed stage: count p.an-info."""
    from ksoup_ray.stages.extract import SelectStage
    ds = _pages(sf_dir)
    out = ds.map_batches(
        SelectStage, fn_constructor_kwargs=dict(query="p.an-info"),
        batch_format="pyarrow", concurrency=(1, 4))
    return out.select_columns(["url", "n_matches"])


def _q_charset_decode(sf_dir: str):
    """Charset sniff/decode coverage: lang passthrough after decode."""
    ds = _extracted(sf_dir)
    return ds.select_columns(["url", "lang"])


def _mutated_snapshot(sf_dir: str):
    """The deterministic recrawl mutation shared by crawl_diff and
    incremental_extract: docs with id%17==0 removed, id%10==0
    re-texted (' v2'), id%23==0 cloned to id+1e6 (' new')."""

    old = _read(f"{sf_dir}/documents.parquet",
                columns=["doc_id", "text"])

    def mutate(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pandas()
        text = batch.column("text").to_pandas().fillna("")
        keep = (ids % 17) != 0
        base_ids = ids[keep]
        base_text = text[keep].where((base_ids % 10) != 0,
                                     text[keep] + " v2")
        clone = (ids % 23) == 0
        out_ids = pd.concat([base_ids, ids[clone] + 1_000_000])
        out_text = pd.concat([base_text, text[clone] + " new"])
        return pa.table({
            "doc_id": pa.array(out_ids.to_numpy(), pa.int64()),
            "text": pa.array(out_text.to_numpy(dtype=object),
                             pa.string()),
        })

    return old, old.map_batches(mutate, batch_format="pyarrow")


def _q_crawl_diff(sf_dir: str):
    """Recrawl delta (functions/snapshot.py): old = documents; new =
    a deterministic mutation (docs with id%17==0 removed, id%10==0
    re-texted, id%23==0 cloned to id+1e6) — diffed via md5-fingerprint
    rows and ONE full-outer join; payloads never ride the shuffle.
    The oracle reconstructs the same snapshot in SQL."""
    from ksoup_ray.functions.snapshot import snapshot_diff
    old, new = _mutated_snapshot(sf_dir)
    return snapshot_diff(old, new)


def _q_incremental_extract(sf_dir: str):
    """INCREMENTAL crawl-refresh pipeline — the end-to-end composition
    a recurring 100 TB crawl actually runs: snapshot diff → extract
    ONLY the added/changed pages → re-attach the delta status. Shuffle
    inventory: the diff moves md5 fingerprints (snapshot_diff, one
    full-outer join of id-sized rows); the page payloads ride exactly
    ONE semi-join (functions/joins.semi_join — the delta id set never
    ships values); parse is the same ParseExtract actor pool as the
    headline; one final id-keyed join re-attaches status to the
    id+text rows. Unchanged ('same') and removed pages are never
    rendered, parsed, or shuffled — at a 1% daily delta that is a
    ~100× saving over re-extracting the crawl. Returns
    ``(doc_id, status, extracted_text)``."""
    import pyarrow.compute as _pc
    from ksoup_ray.functions.dedup import strip_schema_metadata
    from ksoup_ray.functions.joins import semi_join
    from ksoup_ray.pipelines.extract import run_extraction
    from ksoup_ray.sources.synth import render_batch

    _old, new = _mutated_snapshot(sf_dir)
    diff = _q_crawl_diff(sf_dir)
    delta = diff.map_batches(
        lambda b: b.filter(_pc.is_in(
            b.column("status"),
            value_set=pa.array(["added", "changed"]))),
        batch_format="pyarrow")

    docs = semi_join(new, delta.select_columns(["doc_id"]),
                     left_on="doc_id", right_on="doc_id")

    def to_pages(batch: pa.Table) -> pa.Table:
        b2 = pa.table({
            "doc_id": batch.column("doc_id").cast(pa.int64()),
            "text": batch.column("text"),
            "lang": pa.array(["en"] * batch.num_rows, pa.string()),
        })
        return render_batch(b2)

    pages = docs.map_batches(to_pages, batch_format="pyarrow")
    extracted = run_extraction(pages, "", write=False,
                               concurrency=(1, 4), batch_size=64)

    def keyed(batch: pa.Table) -> pa.Table:
        urls = batch.column("url").to_pylist()
        ids = [int(u.rsplit("/", 1)[1]) for u in urls]
        return pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "extracted_text": batch.column("extracted_text"),
        })

    keyed_ds = extracted.map_batches(keyed, batch_format="pyarrow")
    joined = strip_schema_metadata(keyed_ds).join(
        strip_schema_metadata(delta).repartition(4),
        join_type="inner", num_partitions=4, on=("doc_id",))
    return joined.map_batches(
        lambda b: b.select(["doc_id", "status", "extracted_text"]),
        batch_format="pyarrow")


def _q_exact_dedup(sf_dir: str):
    import ray.data as rd
    from ksoup_ray.functions.dedup import exact_dedup
    ds = _read(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    kept = exact_dedup(ds, text_col="text", key_col="doc_id")
    return kept.select_columns(["doc_id", "text"])


def _q_minhash_dedup(sf_dir: str):
    """MinHash-LSH + exact-Jaccard verification: docs to DROP.

    128 hashes / 32 bands×4 rows → candidate recall ≈ 1 − 5e-8 at
    J ≥ 0.8; the corpus' near-dup pairs all sit at J ≥ 0.8 with the
    next-highest pair < 0.1, so the verified drop set equals the exact
    Jaccard oracle's (threshold 0.5 in the gap)."""
    import ray.data as rd
    from ksoup_ray.functions.dedup import minhash_lsh_dedup
    ds = _read(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    return minhash_lsh_dedup(ds, num_hashes=128, num_bands=32,
                             shingle_size=5, threshold=0.5)


def _q_simhash(sf_dir: str):
    """64-bit SimHash; word hash = md5 top-8-bytes so the DuckDB oracle
    recomputes the identical signature in SQL. Hex-string output keeps
    the comparison dtype-exact (bit 63 would overflow int64)."""
    import ray.data as rd
    from ksoup_ray.functions.dedup import SimHasher
    ds = _read(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    out = ds.map_batches(SimHasher, batch_format="pyarrow", concurrency=(1, 4))
    return out.select_columns(["doc_id", "simhash_hex"])


def _q_simhash_pairs(sf_dir: str):
    """EXACT Hamming<=3 SimHash pair mining (functions/dedup
    .simhash_pairs): the Manku WWW'07 pigeonhole — 4 16-bit signature
    blocks, a pair within 3 bits must share one block exactly, so ONE
    equality shuffle on (block_id, value) co-locates every true pair
    with 100% recall (no MinHash-style probability). Shuffle payload
    is 4 skinny 24-byte rows per doc; pair generation is repeat/cumsum
    index algebra + LUT popcount inside O(num_partitions) bucket
    kernels; cross-block dedup via first-agreeing-block ownership, so
    no distinct shuffle. Oracle = O(n^2) self-join on the in-SQL md5
    signature recomputation."""
    import ray.data as rd
    from ksoup_ray.functions.dedup import simhash_pairs
    ds = _read(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    return simhash_pairs(ds, max_hamming=3)


def _q_token_count(sf_dir: str):
    import ray.data as rd
    from ksoup_ray.functions.textstats import token_count_batch
    ds = _read(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    out = ds.map_batches(token_count_batch, batch_format="pyarrow")
    return out.select_columns(["doc_id", "token_count"])


def _q_quality(sf_dir: str):
    import ray.data as rd
    from ksoup_ray.functions.textstats import quality_score_batch
    ds = _read(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    out = ds.map_batches(quality_score_batch, batch_format="pyarrow")
    return out.select_columns(["doc_id", "n_chars_q", "n_words"])


def _q_gopher_quality(sf_dir: str):
    """Gopher-style repetition filters (functions/curation.py):
    distinct-word fraction, top-word fraction, duplicate-bigram
    fraction — per-batch factorize + bincount, no shuffle, no per-row
    Python. The DuckDB oracle recomputes the same fractions from
    unnested word/bigram streams."""
    import ray.data as rd
    from ksoup_ray.functions.curation import gopher_quality_batch
    ds = _read(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    out = ds.map_batches(gopher_quality_batch, batch_format="pyarrow")
    return out.select_columns(["doc_id", "n_words", "distinct_word_frac",
                               "top_word_frac", "dup_2gram_frac"])


def _q_decontaminate(sf_dir: str):
    """Benchmark decontamination: the 'benchmark' is the src0 slice of
    the corpus (deterministic stand-in for an eval suite); its distinct
    word-3-grams broadcast once via ray.put, every other document gets
    ONE vectorized isin over its exploded shingles — the corpus never
    shuffles (functions/curation.py)."""
    import pyarrow.compute as _pc
    import ray.data as rd
    from ksoup_ray.functions.curation import decontaminate
    ds = _read(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text", "source"])
    bench = ds.map_batches(
        lambda b: b.filter(_pc.equal(b.column("source"), "src0")),
        batch_format="pyarrow")
    corpus = ds.map_batches(
        lambda b: b.filter(_pc.not_equal(b.column("source"), "src0")),
        batch_format="pyarrow")
    return decontaminate(corpus, bench, ngram=3)


def _q_main_content(sf_dir: str):
    """Readability-style text-density main-content extraction — no tag
    allowlist: link-dense blocks (the synth <nav> farm) score negative
    and the article div wins, so the oracle distinguishes this from a
    naive body.text() (which would include the nav anchor text).
    (stages/readability.py; Readability/Boilerpipe-class algorithm.)"""
    from ksoup_ray.stages.readability import extract_main_content
    return extract_main_content(_pages(sf_dir), concurrency=(2, 8),
                                batch_size=64)


def _q_inverted_index(sf_dir: str):
    """Search-engine posting lists over the corpus: term -> (true df,
    first-8 sorted doc ids). One hash shuffle on a bounded bucket key;
    per-block vectorized merge (functions/index.py)."""
    import ray.data as rd
    from ksoup_ray.functions.index import inverted_index
    ds = _read(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    return inverted_index(ds, k=8)


def _q_url_canonical(sf_dir: str):
    """Crawl URL canonicalization (functions/urls.py): messy variants
    (host case, default port, fragments, utm/gclid params) are derived
    deterministically from doc_id, then normalized by the REAL
    canonicalizer — the oracle is the closed-form canonical URL."""
    import pandas as pd
    import ray.data as rd
    from ksoup_ray.functions.urls import canonicalize_urls
    from ksoup_ray.sources.synth import BASE_URL

    def mess(batch):
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        langs = batch.column("lang").to_pandas().fillna("en")
        path = "/" + langs + "/" + pd.Series(ids).astype(str).str.zfill(8)
        v = ids % 5
        base = BASE_URL + path
        messy = base.copy()
        messy[v == 1] = (BASE_URL.upper() + path + "#sec1")[v == 1]
        messy[v == 2] = (base + "?utm_source=x&utm_campaign=y")[v == 2]
        messy[v == 3] = (BASE_URL + ":443" + path
                         + "?id=7&utm_medium=z")[v == 3]
        messy[v == 4] = (base + "#frag")[v == 4]
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "url": pa.array(messy.to_numpy(dtype=object), pa.string()),
        })

    ds = _read(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "lang"]) \
        .map_batches(mess, batch_format="pyarrow")
    return canonicalize_urls(ds).select_columns(["doc_id", "url_canon"])


def _q_chunk_windows(sf_dir: str):
    """Overlapping context-window chunking (size=8, stride=4) — the
    retrieval/long-doc training chunker (functions/packing.py
    chunk_windows). Stateless, shuffle-free, fully vectorized."""
    import ray.data as rd
    from ksoup_ray.functions.packing import chunk_windows
    ds = _read(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    return chunk_windows(ds, size=8, stride=4)


def _q_funnel(sf_dir: str):
    """Ordered funnel over the event stream: users completing
    view -> click -> purchase in strict time order (min-time
    semantics). One bounded-bucket shuffle (functions/agg.py
    funnel_counts)."""
    import ray.data as rd
    from ksoup_ray.functions.agg import funnel_counts
    ds = _read(f"{sf_dir}/events.parquet",
                         columns=["user_id", "ts", "event_type"])
    return funnel_counts(ds, steps=("view", "click", "purchase"))


def _q_jsonl_roundtrip(sf_dir: str):
    """JSONL shard source/sink — the de-facto webtext interchange
    format: the documents table is written once (cached) as
    newline-delimited JSON shards via the Dataset sink, read back with
    ray.data.read_json (streaming, one task per shard), and
    value-checked against the original table. Exercises type fidelity
    (int64 ids/counts, unicode text) through the JSON boundary."""
    import os
    import ray.data as rd

    cache = f"/tmp/ksoup_jsonl_corpus/{os.path.basename(sf_dir.rstrip('/'))}"
    marker = os.path.join(cache, "_COMPLETE")
    if not os.path.exists(marker):
        os.makedirs(cache, exist_ok=True)
        _read(f"{sf_dir}/documents.parquet") \
            .repartition(8).write_json(cache)
        with open(marker, "w") as f:
            f.write("ok")
    files = [os.path.join(cache, f) for f in sorted(os.listdir(cache))
             if f.endswith(".json")]
    return rd.read_json(files).select_columns(
        ["doc_id", "text", "lang", "source", "n_chars"])


def _q_decontaminate_bloom(sf_dir: str):
    """Same contamination semantics as `decontaminate`, at the scale
    where the exact shingle set is too big to broadcast: a packed Bloom
    bitset (12 bits/key vs ~40 B/key for a Python set) prefilters each
    corpus batch vectorized; only candidate (doc_id, gram) pairs enter
    a distributed verify join that kills false positives — results are
    EXACT, so the oracle is the same SQL as the exact path
    (functions/curation.py decontaminate_bloom)."""
    import pyarrow.compute as _pc
    import ray.data as rd
    from ksoup_ray.functions.curation import decontaminate_bloom
    ds = _read(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text", "source"])
    bench = ds.map_batches(
        lambda b: b.filter(_pc.equal(b.column("source"), "src0")),
        batch_format="pyarrow")
    corpus = ds.map_batches(
        lambda b: b.filter(_pc.not_equal(b.column("source"), "src0")),
        batch_format="pyarrow")
    return decontaminate_bloom(corpus, bench, ngram=3)


def _q_ngram_topk(sf_dir: str):
    """Global boilerplate mining: top-20 word trigrams corpus-wide.
    Map-side value_counts combine -> one groupby(ngram) Sum ->
    block-local top-k -> tiny final sort; deterministic tie-break on
    the ngram string (functions/curation.py)."""
    import ray.data as rd
    from ksoup_ray.functions.curation import ngram_topk
    ds = _read(f"{sf_dir}/documents.parquet", columns=["text"])
    return ngram_topk(ds, n=3, k=20)


def _q_pack_sequences(sf_dir: str):
    """GPT-style sequence packing (functions/packing.py): the corpus
    token stream in doc_id order, cut every 256 tokens — distributed
    ordered prefix sum (per-bucket partials -> driver cumsums one
    scalar per bucket -> co-partitioned pass adds bases). Oracle:
    window cumsum + generate_series over the straddle spans."""
    import ray.data as rd
    from ksoup_ray.functions.packing import pack_sequences
    ds = _read(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    return pack_sequences(ds, capacity=256)


def _q_token_quantiles(sf_dir: str):
    """Exact per-language token-count quantiles from a bounded value
    histogram (|langs| x |distinct counts| rows after ONE groupby) —
    never a corpus sort. Discrete rule matches DuckDB quantile_disc
    (functions/curation.py)."""
    import ray.data as rd
    from ksoup_ray.functions.curation import token_quantiles
    ds = _read(f"{sf_dir}/documents.parquet",
                         columns=["text", "lang"])
    return token_quantiles(ds, qs=(0.25, 0.5, 0.75, 0.9))


def _q_normalize_text(sf_dir: str):
    """Unicode canonicalization with REAL normalization work: each
    text gets a decomposed suffix (e + COMBINING ACUTE, padded spaces)
    appended, then NFC + trim (functions/curation.py). The oracle
    mirrors the injection (chr(769) = the combining acute) and applies
    trim(nfc_normalize(...)) — value-checked composition, not a no-op
    on the ASCII corpus."""
    import ray.data as rd
    from ksoup_ray.functions.curation import normalize_text_batch

    def inject(batch: pa.Table) -> pa.Table:
        text = batch.column("text").to_pandas().fillna("")
        salted = "  " + text + " cafe\u0301  "
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "text": pa.array(salted.to_numpy(dtype=object), pa.string()),
        })

    ds = _read(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    out = ds.map_batches(inject, batch_format="pyarrow") \
            .map_batches(normalize_text_batch, batch_format="pyarrow")
    return out.select_columns(["doc_id", "norm_text"])


def _q_pii_redact(sf_dir: str):
    """PII scrubbing with REAL hits: deterministic synthetic PII
    (email / IPv4 / phone derived from doc_id) is appended to each
    text, then redacted by the vectorized pattern chain
    (functions/curation.py PII_PATTERNS). The DuckDB oracle performs
    the identical injection and regexp_replace chain, so the
    redaction semantics — not just the plumbing — are value-checked."""
    import ray.data as rd
    from ksoup_ray.functions.curation import pii_redact_batch

    def inject(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pandas()
        text = batch.column("text").to_pandas().fillna("")
        salted = (text + " contact user" + ids.astype(str)
                  + "@mail.example from 10.0." + (ids % 256).astype(str)
                  + "." + (ids % 100).astype(str) + " call 555-"
                  + (ids % 1000).map("{:03d}".format) + "-"
                  + (ids % 10000).map("{:04d}".format))
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "text": pa.array(salted.to_numpy(dtype=object), pa.string()),
        })

    ds = _read(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    out = ds.map_batches(inject, batch_format="pyarrow") \
            .map_batches(pii_redact_batch, batch_format="pyarrow")
    return out.select_columns(["doc_id", "redacted"])


def _q_bm25(sf_dir: str):
    """BM25 relevance scores for a fixed 3-term query over the corpus
    (functions/curation.py bm25_score): two streaming passes (fused
    stats+df partials, then scoring), per-(doc,term) contributions
    rounded to integer micros BEFORE the per-doc sum so the result is
    accumulation-order-free and the DuckDB oracle (identical
    expression tree) matches exactly."""
    import ray.data as rd
    from ksoup_ray.functions.curation import bm25_score
    ds = _read(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    return bm25_score(ds, ("spark", "window", "merge"))


def _q_unigram_logprob(sf_dir: str):
    """Corpus-LM document quality (functions/curation.py
    unigram_logprob): the vocab-scale count table CO-PARTITIONS with
    doc term frequencies on the word (never broadcast); integer-micro
    contributions make the sum order-free for exact oracle parity."""
    import ray.data as rd
    from ksoup_ray.functions.curation import unigram_logprob
    ds = _read(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    return unigram_logprob(ds)


def _q_langid(sf_dir: str):
    import ray.data as rd
    from ksoup_ray.functions.textstats import LangId
    ds = _read(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text", "lang"])
    out = ds.map_batches(LangId, batch_format="pyarrow", concurrency=(1, 4))
    return out.select_columns(["doc_id", "pred_lang"])


def _q_dedup_components(sf_dir: str):
    """Composed near-dup pipeline: LSH candidates -> exact 5-gram
    Jaccard verify (hash-join, no broadcast) -> distributed connected
    components. Value-checked against a DuckDB recursive-CTE closure
    over the exact-Jaccard pair graph."""
    import ray.data as rd
    from ksoup_ray.functions.dedup import (
        connected_components, minhash_candidate_pairs,
        verify_pairs_jaccard)
    ds = _read(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    pairs = minhash_candidate_pairs(ds, num_hashes=128, num_bands=32,
                                    shingle_size=5)
    verified = verify_pairs_jaccard(
        pairs, ds, threshold=0.5, ngram=5).select_columns(["id_a", "id_b"])
    return connected_components(verified)


def _q_jaccard_pairs(sf_dir: str):
    """EXACT n-gram Jaccard similarity join (no LSH): distributed
    shingle inverted index → partial intersection counts → one
    aggregate merge → vectorized Jaccard threshold. The ground-truth
    pair set the LSH pipelines approximate, value-checked against the
    same DuckDB exact-Jaccard SQL they are."""
    import ray.data as rd
    from ksoup_ray.functions.dedup import jaccard_pairs_exact
    ds = _read(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    # max_df=None: the ORACLE form — the DuckDB SQL computes uncapped
    # exact Jaccard, so the Ray side must too. Production default is
    # max_df=1000 with the drop count surfaced (see jaccard_pairs_exact).
    return jaccard_pairs_exact(ds, shingle_size=5, threshold=0.5,
                               max_df=None)


def _q_containment_pairs(sf_dir: str):
    """EXACT shingle CONTAINMENT join (functions/dedup
    .containment_pairs): Broder's asymmetric |A∩B|/|A| — the
    subset-duplicate detector Jaccard misses (short doc quoted whole
    in a long one). Same one-shuffle inverted-index plan as
    jaccard_pairs (shared _shingle_pair_stats); floored-ppm int64
    score so the oracle matches bit-exactly. max_df=None = the
    uncapped oracle form (production default caps hot shingles with
    recorded drops)."""
    import ray.data as rd
    from ksoup_ray.functions.dedup import containment_pairs
    ds = _read(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    return containment_pairs(ds, shingle_size=5,
                             threshold_ppm=600_000, max_df=None)


def _q_simhash_components(sf_dir: str):
    """SimHash dedup CLUSTERS: the exact pigeonhole pair join
    (simhash_pairs) closed under transitivity by the distributed
    min-label components (functions/dedup.connected_components) —
    completing the SimHash family to the same pairs→components shape
    the MinHash family has. Oracle: recursive-CTE closure over the
    same in-SQL signature pair graph."""
    import ray.data as rd
    from ksoup_ray.functions.dedup import (connected_components,
                                           simhash_pairs)
    ds = _read(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    pairs = simhash_pairs(ds, max_hamming=3) \
        .select_columns(["id_a", "id_b"])
    return connected_components(pairs)


def _q_embed_neardup(sf_dir: str):
    """Embedding-cosine near-dup pairs: 24-table 2-bit hyperplane LSH
    candidates + exact float64 in-bucket cosine (recall at the 0.465
    operating point ≈ 1 − 2e-6 per pair; the corpus' qualifying pairs
    clear the threshold by ≥1.6e-3, so the verified pair set equals the
    DuckDB exact all-pairs oracle's)."""
    import ray.data as rd
    from ksoup_ray.functions.dedup import cosine_near_dup_pairs
    ds = _read(f"{sf_dir}/embeddings.parquet",
                         columns=["vec_id", "embedding"])
    return cosine_near_dup_pairs(ds, threshold=0.465, bits=2,
                                 num_tables=24)


def _q_bpe_token_count(sf_dir: str):
    import ray.data as rd
    from ksoup_ray.functions.textstats import bpe_token_count_batch
    ds = _read(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    out = ds.map_batches(bpe_token_count_batch, batch_format="pyarrow")
    return out.select_columns(["doc_id", "bpe_token_count"])


def _q_xml_roundtrip(sf_dir: str):
    """XML mode as a distributed stage: synthesize an XML doc per row,
    parse with the XmlTreeBuilder, extract text + attribute back."""
    import ray.data as rd
    from ksoup_ray.engine import parser as KP

    ds = _read(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])

    def roundtrip(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        texts = batch.column("text").to_pylist()
        out_ids, out_texts = [], []
        for i, t in zip(ids, texts):
            esc = ((t or "").replace("&", "&amp;").replace("<", "&lt;")
                   .replace(">", "&gt;"))
            xml = (f'<?xml version="1.0"?><doc id="{i}">'
                   f"<body>{esc}</body></doc>")
            doc = KP.parse_xml(xml)
            el = doc.select_first("doc")
            out_ids.append(int(el.attr("id")))
            out_texts.append(el.select_first("body").text())
        return pa.table({"doc_id": pa.array(out_ids, pa.int64()),
                         "xml_text": pa.array(out_texts, pa.string())})

    return ds.map_batches(roundtrip, batch_format="pyarrow")


def _q_curate(sf_dir: str):
    """End-to-end training-data curation (pipelines/curate.py): exact
    dedup → verified MinHash-LSH near-dup drop (full-corpus drop sets,
    anti-joined) → lang filter → whitespace-token bounds. The DuckDB
    oracle runs the identical composition in SQL, so every stage's
    semantics are value-checked THROUGH the composition, not just in
    isolation."""
    import ray.data as rd
    from ksoup_ray.pipelines.curate import curate_documents
    ds = _read(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text", "lang"])
    return curate_documents(ds, langs=("en",), min_tokens=20,
                            max_tokens=90, near_threshold=0.5)


def _q_web_curate(sf_dir: str):
    """THE north-star composition: CC pages → HTML5 parse/extract →
    CHECKPOINT (the pipeline's own partitioned parquet sink + lineage,
    resumable — the production shape for a 100 TB run: extraction job,
    then curation job, each streaming) → exact dedup → verified
    near-dup drop → lang/token filters. Checkpointing between the two
    also keeps the extraction actor pool and the curation joins from
    competing for the same slots in one DAG (Ray 2.49 join aggregators
    reserve CPUs up front). The oracle is the curate SQL over the
    original documents — valid because extraction is value-checked
    byte-identical (extract_text), so extraction drift breaks this
    hash too."""
    import os
    import ray.data as rd
    from ksoup_ray.pipelines.curate import curate_documents
    from ksoup_ray.pipelines.extract import DATA_DIR, run_extraction

    base = os.path.basename(sf_dir.rstrip("/"))
    out_dir = f"/tmp/ksoup_web_curate/{base}"
    run_extraction(_pages(sf_dir), out_dir, write=True, resume=True,
                   concurrency=(2, 8), batch_size=64)
    ex = _read(os.path.join(out_dir, DATA_DIR),
                         columns=["url", "extracted_text", "lang"])

    def to_docs(batch: pa.Table) -> pa.Table:
        urls = batch.column("url").to_pylist()
        ids = [int(u.rsplit("/", 1)[1]) for u in urls]
        return pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "text": batch.column("extracted_text"),
            "lang": batch.column("lang"),
        })

    docs = ex.map_batches(to_docs, batch_format="pyarrow")
    return curate_documents(docs, langs=("en",), min_tokens=20,
                            max_tokens=90, near_threshold=0.5)


def _q_fingerprint(sf_dir: str):
    import ray.data as rd
    from ksoup_ray.functions.textstats import fingerprint_batch
    ds = _read(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    out = ds.map_batches(fingerprint_batch, batch_format="pyarrow")
    return out.select_columns(["doc_id", "fingerprint"])


_ANN_K = 10
_ANN_NQ = 4
_IVF_CELLS = 8

# marker-word language-ID rule, shared by the `langid` oracle and the
# `langid_confusion` cross-tab (kept a module constant so both oracles
# stay literally the same prediction)
_LANGID_SQL = """
            WITH m(lang, w, pri) AS (VALUES
              ('en','the',1),('en','and',1),('en','of',1),('en','to',1),
              ('en','a',1),('en','in',1),('en','is',1),('en','it',1),
              ('en','that',1),
              ('de','der',2),('de','die',2),('de','das',2),('de','und',2),
              ('de','ist',2),('de','nicht',2),('de','ein',2),('de','zu',2),
              ('fr','le',3),('fr','la',3),('fr','les',3),('fr','et',3),
              ('fr','est',3),('fr','un',3),('fr','une',3),('fr','que',3),
              ('es','el',4),('es','la',4),('es','los',4),('es','y',4),
              ('es','es',4),('es','un',4),('es','una',4),('es','que',4),
              ('es','de',4)
            ), words AS (
              SELECT doc_id, unnest(string_split(lower(text), ' ')) AS w
              FROM documents
            ), sc AS (
              SELECT words.doc_id, m.lang, min(m.pri) AS pri,
                     count(*) AS score
              FROM words JOIN m ON words.w = m.w
              GROUP BY words.doc_id, m.lang
            ), best AS (
              SELECT doc_id, lang,
                     row_number() OVER (PARTITION BY doc_id
                         ORDER BY score DESC, pri ASC) AS rn
              FROM sc
            )
            SELECT d.doc_id,
                   CASE WHEN regexp_matches(d.text,
                        '[\\x{4E00}-\\x{9FFF}\\x{3040}-\\x{30FF}\\x{AC00}-\\x{D7AF}]')
                        THEN 'zh'
                        WHEN b.lang IS NOT NULL THEN b.lang
                        ELSE 'und' END AS pred_lang
            FROM documents d
            LEFT JOIN best b ON b.doc_id = d.doc_id AND b.rn = 1
"""
_IVF_NPROBE = 2


def _head_embeddings(sf_dir: str, n: int) -> np.ndarray:
    """First n embeddings by vec_id — BOUNDED driver-side prep: a
    streaming DuckDB ORDER BY ... LIMIT n keeps only n rows in memory
    (top-k heap), never the table (the pq.read_table-the-whole-file
    prep this replaces was unbounded at corpus scale)."""
    import duckdb
    rows = duckdb.connect().execute(
        "SELECT embedding FROM read_parquet(?) ORDER BY vec_id LIMIT ?",
        [f"{sf_dir}/embeddings.parquet", n]).fetchall()
    return np.array([r[0] for r in rows], dtype=np.float64)


def _q_ann_topk(sf_dir: str):
    import ray.data as rd
    from ksoup_ray.functions.similarity import brute_force_topk
    queries = _head_embeddings(sf_dir, _ANN_NQ)
    ds = _read(f"{sf_dir}/embeddings.parquet",
                         columns=["vec_id", "embedding"])
    top = brute_force_topk(ds, queries, k=_ANN_K, concurrency=(1, 4))
    return top.select_columns(["query_id", "vec_id"])


def _q_ann_ivf(sf_dir: str):
    """Deterministic seeded-Voronoi IVF with nprobe=2 of 8 cells — the
    approximation path is genuinely exercised (unprobed cells are
    invisible) and the DuckDB oracle recomputes the identical cell
    structure in SQL. The k-means variant (``ivf_topk``) is covered by
    a pytest recall bound instead (non-SQL-expressible centroids)."""
    import ray.data as rd
    from ksoup_ray.functions.similarity import ivf_topk_seeded
    queries = _head_embeddings(sf_dir, _ANN_NQ)
    centroids = _head_embeddings(sf_dir, _IVF_CELLS)
    ds = _read(f"{sf_dir}/embeddings.parquet",
                         columns=["vec_id", "embedding"])
    top = ivf_topk_seeded(ds, queries, centroids, k=_ANN_K,
                          nprobe=_IVF_NPROBE)
    return top.select_columns(["query_id", "vec_id"])


def _q_q1_pricing(sf_dir: str):
    """TPC-H Q1-style grouped aggregate with per-batch pre-aggregation
    (combiner) before the small groupby — the partial-agg pattern."""
    import ray.data as rd

    ds = _read(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_returnflag", "l_linestatus", "l_quantity",
                 "l_extendedprice", "l_discount", "l_shipdate"])

    def partial(batch: pa.Table) -> pa.Table:
        batch = batch.filter(
            pc.less_equal(batch.column("l_shipdate"),
                          pa.scalar(pd.Timestamp("1998-09-02"))))
        df = batch.to_pandas()
        # exact integer arithmetic: prices/discounts are 2-decimal, so
        # cents are exact int64 — immune to float summation order and
        # to banker's-vs-half-away rounding differences vs the oracle
        price_cents = (df["l_extendedprice"] * 100).round().astype("int64")
        disc_pct = ((1 - df["l_discount"]) * 100).round().astype("int64")
        df["sum_qty"] = df["l_quantity"].round().astype("int64")
        df["sum_base_price_cents"] = price_cents
        df["revenue_e4"] = price_cents * disc_pct
        g = df.groupby(["l_returnflag", "l_linestatus"], as_index=False).agg(
            sum_qty=("sum_qty", "sum"),
            sum_base_price_cents=("sum_base_price_cents", "sum"),
            revenue_e4=("revenue_e4", "sum"),
            n_rows=("l_quantity", "size"),
        )
        return pa.Table.from_pandas(g, preserve_index=False)

    partials = ds.map_batches(partial, batch_format="pyarrow",
                              batch_size=65536)

    def merge(group: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "l_returnflag": [group["l_returnflag"].iloc[0]],
            "l_linestatus": [group["l_linestatus"].iloc[0]],
            "sum_qty": [int(group["sum_qty"].sum())],
            "sum_base_price_cents": [int(group["sum_base_price_cents"].sum())],
            "revenue_e4": [int(group["revenue_e4"].sum())],
            "n_rows": [int(group["n_rows"].sum())],
        })

    return partials.groupby(["l_returnflag", "l_linestatus"]).map_groups(
        merge, batch_format="pandas")


def _q_top_customers(sf_dir: str):
    """Broadcast join (small customer side via ray.put) + groupby + top-k."""
    import pyarrow.parquet as pq
    import ray
    import ray.data as rd

    cust = pq.read_table(f"{sf_dir}/customer.parquet").to_pandas()
    name_col = "c_name" if "c_name" in cust.columns else cust.columns[1]
    lookup_ref = ray.put(dict(zip(cust["c_custkey"], cust[name_col])))

    ds = _read(f"{sf_dir}/orders.parquet",
                         columns=["o_custkey", "o_totalprice"])

    from ray.data.aggregate import Sum

    class JoinName:
        def __init__(self):
            self.lookup = ray.get(lookup_ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            df = batch.to_pandas()
            df["total_spent_cents"] = (df["o_totalprice"] * 100) \
                .round().astype("int64")
            g = df.groupby("o_custkey", as_index=False).agg(
                total_spent_cents=("total_spent_cents", "sum"))
            g["c_name"] = g["o_custkey"].map(self.lookup)
            return pa.Table.from_pandas(g, preserve_index=False)

    partials = ds.map_batches(JoinName, batch_format="pyarrow",
                              batch_size=65536, concurrency=(1, 2))
    # merge partials with the NATIVE vectorized aggregate (per-group
    # pandas map_groups is ~3ms/group — too slow for many tiny groups)
    merged = partials.groupby("o_custkey").aggregate(
        Sum("total_spent_cents", alias_name="total_spent_cents"))
    top = merged.sort(["total_spent_cents", "o_custkey"],
                      descending=[True, False]).limit(10)

    class AddName:
        def __init__(self):
            self.lookup = ray.get(lookup_ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            keys = batch.column("o_custkey").to_pylist()
            names = [self.lookup.get(k) for k in keys]
            return batch.append_column("c_name", pa.array(names, pa.string()))

    return top.map_batches(AddName, batch_format="pyarrow",
                           concurrency=1)


def _q_event_windows(sf_dir: str):
    """Tumbling 60 s windows per user over the events log (stream-shaped
    op as groupby(key, window) — ray_guide streaming section)."""
    import ray.data as rd

    ds = _read(f"{sf_dir}/events.parquet",
                         columns=["user_id", "ts", "value"])

    from ray.data.aggregate import Sum

    def windowed(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        df["window_start"] = df["ts"].dt.floor("60s").astype("datetime64[us]")
        # exact integer micros: immune to float summation order
        df["value_micros"] = (df["value"] * 1e6).round().astype("int64")
        g = df.groupby(["user_id", "window_start"], as_index=False).agg(
            n_events=("value_micros", "size"),
            sum_value_micros=("value_micros", "sum"))
        g["n_events"] = g["n_events"].astype("int64")
        return pa.Table.from_pandas(g, preserve_index=False)

    partials = ds.map_batches(windowed, batch_format="pyarrow",
                              batch_size=65536)
    return partials.groupby(["user_id", "window_start"]).aggregate(
        Sum("n_events", alias_name="n_events"),
        Sum("sum_value_micros", alias_name="sum_value_micros"))


def _q_sanitize(sf_dir: str):
    """Cleaner/Safelist as a distributed stage, value-checked: decode →
    full HTML5 parse → select div#content → Ksoup.clean(basic) of its
    inner HTML. On synth pages the cleaned output is closed-form
    ('<p>'+13-word chunk+'</p>' joined by newline: class attrs dropped
    by the safelist, entities decoded by the parser), so the DuckDB
    oracle reconstructs it from the documents table
    (reference safety/CleanerTest.kt exact-string style)."""
    from ksoup_ray.engine.charset import decode_html
    from ksoup_ray.engine import parser as KP
    from ksoup_ray.engine.safety import Safelist

    ds = _pages(sf_dir)

    class CleanStage:
        def __init__(self):
            self.safelist = Safelist.basic()

        def __call__(self, batch: pa.Table) -> pa.Table:
            urls = batch.column("url").to_pylist()
            htmls = batch.column("html").to_pylist()
            outs = []
            for raw in htmls:
                text, _ = decode_html(raw or b"")
                doc = KP.parse(text)
                content = doc.select_first("div#content")
                inner = content.html() if content is not None else ""
                outs.append(KP.clean(inner, self.safelist))
            return pa.table({"url": pa.array(urls, pa.string()),
                             "clean_html": pa.array(outs, pa.string())})

    return ds.map_batches(CleanStage, batch_format="pyarrow",
                          concurrency=(1, 4))


def _q_media_features(sf_dir: str):
    """Multimodal decode, value-checked END-TO-END for the formats this
    container can really decode: the synthetic generator emits genuine
    PPM images, PCM WAVs AND YUV4MPEG2 video clips whose decoded
    width/height/duration are closed-form in doc_id, and the
    MediaFeatures actor stage REALLY decodes all three modalities
    (functions/codecs.py + functions/video.py — pure numpy/stdlib).
    The oracle recomputes the closed forms, so a broken decoder in
    any modality fails the hash check."""
    import ray.data as rd
    from ksoup_ray.functions.multimodal import MediaFeatures, synth_media_batch

    ds = _read(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    media = ds.map_batches(synth_media_batch, batch_format="pyarrow")
    out = media.map_batches(MediaFeatures, batch_format="pyarrow",
                            batch_size=32, concurrency=(1, 2))

    def finalize(batch: pa.Table) -> pa.Table:
        meta = batch.column("meta")
        return pa.table({
            "media_id": batch.column("media_id"),
            "width": batch.column("decoded_width"),
            "height": batch.column("decoded_height"),
            "duration_ms": batch.column("decoded_duration_ms"),
            "n_bytes": pc.cast(pc.binary_length(batch.column("media")),
                               pa.int64()),
            "media_type": pc.struct_field(meta, "media_type"),
            "format": pc.struct_field(meta, "format"),
        })

    return out.map_batches(finalize, batch_format="pyarrow")


def _q_pdf_roundtrip(sf_dir: str):
    """PDF/layout parse leg of the north star, value-checked END-TO-END:
    word-wrap each document's text (8 words/line, 5 lines/page), render
    a REAL multi-page FlateDecode PDF with the from-scratch writer
    (engine/pdf.py), then parse it back with the from-scratch PDF
    object/content-stream interpreter in an actor-pool stage. The
    unwrapped extracted text must equal the source text byte-for-byte
    and the page/line counts match their closed forms — so the object
    scanner, zlib stream decode, page-tree walk and BT/ET text
    interpreter are all on the hash path."""
    import ray.data as rd
    from ksoup_ray.functions.multimodal import PdfExtract, synth_pdf_batch

    ds = _read(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    pdfs = ds.map_batches(synth_pdf_batch, batch_format="pyarrow")
    return pdfs.map_batches(PdfExtract, batch_format="pyarrow",
                            fn_constructor_kwargs={"unwrap_lines": True},
                            batch_size=64, concurrency=(1, 4))


def _q_stream_first_paras(sf_dir: str):
    """StreamParser as a distributed stage: progressively parse each
    page and STOP after the first two <p> elements — the tokenizer
    never reads the rest of the document (engine/streamparser.py; the
    scale story for pathological single documents). Closed-form oracle:
    paragraphs are 13-word chunks of `text`, so two paragraphs = the
    first 26 words."""
    ds = _pages(sf_dir)

    class StreamFirstParas:
        def __init__(self):
            from ksoup_ray.engine.charset import decode_html
            from ksoup_ray.engine.streamparser import StreamParser
            self._decode = decode_html
            self._sp = StreamParser()

        def __call__(self, batch: pa.Table) -> pa.Table:
            outs = []
            sp = self._sp
            for raw in batch.column("html").to_pylist():
                text, _ = self._decode(raw)
                sp.parse(text, "")
                texts = []
                for _ in range(2):
                    el = sp.select_next("p")
                    if el is None:
                        break
                    texts.append(el.text())
                sp.stop()
                outs.append(" ".join(texts))
            return pa.table({
                "url": batch.column("url"),
                "first_paras": pa.array(outs, pa.string()),
            })

    return ds.map_batches(StreamFirstParas, batch_format="pyarrow",
                          concurrency=(2, 8), batch_size=128)


def _q_cluster_assign(sf_dir: str):
    """Nearest-centroid assignment (the k-means map step) over the
    embeddings table: centroids = the first 8 vectors by vec_id
    (deterministic), broadcast once; one matmul per batch, NO shuffle.
    The DuckDB oracle recomputes the argmax with the same tie-break."""
    import ray.data as rd
    from ksoup_ray.functions.similarity import centroid_assign
    centroids = _head_embeddings(sf_dir, _IVF_CELLS)
    ds = _read(f"{sf_dir}/embeddings.parquet",
                         columns=["vec_id", "embedding"])
    return centroid_assign(ds, centroids)


def _q_kmeans(sf_dir: str):
    """Distributed Lloyd k-means (functions/similarity.py
    kmeans_train): 3 iterations over the full embeddings table —
    per-batch matmul+argmin collapsing to k partial (sum, count,
    inertia) rows, driver folds k×d numbers, centroids re-broadcast
    each round. Iterative → no SQL oracle (rows-only check); the
    algorithm is pinned by pytest (monotone inertia, blob recovery).
    Returns the final euclidean assignment per vector."""
    import ray
    import ray.data as rd
    from ksoup_ray.functions.similarity import (kmeans_train,
                                                vecs_from_arrow)
    ds = _read(f"{sf_dir}/embeddings.parquet",
                         columns=["vec_id", "embedding"])
    cents, _ = kmeans_train(ds, k=_IVF_CELLS, iters=3,
                            init=_head_embeddings(sf_dir, _IVF_CELLS))
    cref = ray.put(cents)

    def assign(batch: pa.Table) -> pa.Table:
        c = ray.get(cref)
        v = vecs_from_arrow(batch.column("embedding"))
        d2 = (-2.0 * v @ c.T + (c * c).sum(axis=1)[None, :])
        return pa.table({
            "vec_id": batch.column("vec_id").cast(pa.int64()),
            "cluster": pa.array(d2.argmin(axis=1).astype(np.int64)),
        })

    return ds.map_batches(assign, batch_format="pyarrow")


def _q_kmeans_1step(sf_dir: str):
    """VALUE-CHECKED Lloyd step (functions/similarity.py
    kmeans_mean_step): cosine-assign to the 8 fixed lowest-id
    centroids, new centroid = per-dim mean of floor(coord·10⁶) int
    micros (truncating division, DuckDB ``//`` semantics) — exact,
    order-free, so the SQL oracle reproduces every mean bit-for-bit.
    Closes the k-means side of the iterative-family oracle gap
    (the full ``kmeans`` query remains the production multi-iteration
    path, rows-only)."""
    import ray.data as rd
    from ksoup_ray.functions.similarity import kmeans_mean_step
    centroids = _head_embeddings(sf_dir, _IVF_CELLS)
    ds = _read(f"{sf_dir}/embeddings.parquet",
                         columns=["vec_id", "embedding"])
    return kmeans_mean_step(ds, centroids)


def _q_project_fixed(sf_dir: str):
    """VALUE-CHECKED fixed-component projection (functions/
    similarity.py quantized_project): vectors AND the 4 lowest-id
    component rows quantize to floor(x·10³) ints, projection = one
    integer matmul per batch (broadcast components, no shuffle) —
    exact and order-free, so the SQL oracle (zipped unnest product +
    integer SUM) matches bit-for-bit. The value-checked companion to
    the iterative ``pca_project`` (rows-only)."""
    import ray.data as rd
    from ksoup_ray.functions.similarity import quantized_project
    comps = _head_embeddings(sf_dir, 4)
    ds = _read(f"{sf_dir}/embeddings.parquet",
                         columns=["vec_id", "embedding"])
    return quantized_project(ds, comps)


def _q_stratified_sample(sf_dir: str):
    """Deterministic per-stratum 10% sample (functions/agg.py):
    id%100 < 10 — reproducible, no RNG, rate logged per batch (the
    ray_guide sampling rule: log what was sampled, no silent caps)."""
    import ray.data as rd
    from ksoup_ray.functions.agg import stratified_sample
    ds = _read(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "lang"])
    return stratified_sample(ds, rate_pct=10)


def _q_top_docs_per_lang(sf_dir: str):
    """Grouped top-k (the ROW_NUMBER window pattern, functions/agg.py
    grouped_topk): 3 longest docs per language, token-count metric;
    map-side per-batch top-k combine so only k x keys x batches rows
    shuffle. Oracle: ROW_NUMBER() OVER (PARTITION BY ... ORDER BY)."""
    import ray.data as rd
    from ksoup_ray.functions.agg import grouped_topk
    from ksoup_ray.functions.textstats import token_count_batch
    ds = _read(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text", "lang"])
    counted = ds.map_batches(token_count_batch, batch_format="pyarrow") \
        .select_columns(["doc_id", "lang", "token_count"])
    return grouped_topk(counted, key_col="lang",
                        val_col="token_count", id_col="doc_id", k=3)


def _q_pca_project(sf_dir: str):
    """Distributed PCA (functions/similarity.py pca_project): one
    streaming pass folds (n, sum, X^T X) partials — d x d numbers per
    batch — the driver eigendecomposes the covariance, and the
    projection pass broadcasts the components. Eigendecomposition is
    not SQL-expressible -> rows-only; pinned by pytest vs numpy PCA
    with a deterministic sign convention."""
    import ray.data as rd
    from ksoup_ray.functions.similarity import pca_project
    ds = _read(f"{sf_dir}/embeddings.parquet",
                         columns=["vec_id", "embedding"])
    out, _fit = pca_project(ds, k=4)
    return out


def _q_lang_counts(sf_dir: str):
    """Salted hot-key count: 4 languages over the whole corpus is the
    canonical skew case — a plain groupby(lang) funnels everything
    through 4 reducers; the salted shape map-side-combines each batch
    then spreads each key over 16 reducers (functions/agg.py)."""
    import ray.data as rd
    from ksoup_ray.functions.agg import salted_count
    ds = _read(f"{sf_dir}/documents.parquet", columns=["lang"])
    return salted_count(ds, "lang", salt=16)


def _q_asof_join(sf_dir: str):
    """As-of join (functions/joins.py): each click matched to the
    user's latest purchase at or before it — ONE shuffle on user_id
    over the tagged union of both sides, numpy searchsorted per group.
    Oracle: DuckDB's native ASOF LEFT JOIN (ties included via >=)."""
    import pyarrow.compute as _pc
    import ray.data as rd
    from ksoup_ray.functions.joins import asof_join
    ds = _read(f"{sf_dir}/events.parquet",
                         columns=["event_id", "user_id", "ts",
                                  "event_type", "value"])

    def keep(ev_type):
        return lambda b: b.filter(
            _pc.equal(b.column("event_type"), ev_type))

    clicks = ds.map_batches(keep("click"), batch_format="pyarrow")
    purchases = ds.map_batches(keep("purchase"), batch_format="pyarrow")
    return asof_join(clicks, purchases)


def _q_hopping_windows(sf_dir: str):
    """Hopping-window aggregate (1 h windows every 15 min): each event
    explodes into its 4 windows map-side and immediately collapses to
    (event_type, window_start) partials — only partials shuffle
    (functions/agg.py). Oracle recomputes the window arithmetic with
    integer division + generate_series."""
    import ray.data as rd
    from ksoup_ray.functions.agg import hopping_window_count
    ds = _read(f"{sf_dir}/events.parquet",
                         columns=["event_type", "ts"])
    return hopping_window_count(ds, key_col="event_type",
                                window_us=3_600_000_000,
                                hop_us=900_000_000)


def _q_session_attribution(sf_dir: str):
    """Interval (range) join composed with sessionize: each purchase
    attributed to the user session containing it (functions/joins.py
    interval_join — one shuffle on user, searchsorted per group).
    Oracle: the sessionize window-function CTE + a BETWEEN join."""
    import pyarrow.compute as _pc
    import ray.data as rd
    from ksoup_ray.functions.agg import sessionize
    from ksoup_ray.functions.joins import interval_join
    ev = _read(f"{sf_dir}/events.parquet",
                         columns=["event_id", "user_id", "ts",
                                  "event_type"])
    sessions = sessionize(
        ev.select_columns(["user_id", "ts"]), gap_seconds=1800)
    purchases = ev.map_batches(
        lambda b: b.filter(_pc.equal(b.column("event_type"),
                                     "purchase")),
        batch_format="pyarrow")
    return interval_join(purchases, sessions)


def _q_sessionize(sf_dir: str):
    """Gap sessionization of the event log (30-min gap): one shuffle on
    user_id, vectorized per-group split (functions/agg.py)."""
    import ray.data as rd
    from ksoup_ray.functions.agg import sessionize
    ds = _read(f"{sf_dir}/events.parquet",
                         columns=["user_id", "ts"])
    out = sessionize(ds, gap_seconds=1800)

    def fmt(batch: pa.Table) -> pa.Table:
        # timestamps -> epoch micros for a dtype-stable oracle compare
        return pa.table({
            "user_id": batch.column("user_id"),
            "session_start": pc.cast(batch.column("session_start"),
                                     pa.int64()),
            "session_end": pc.cast(batch.column("session_end"),
                                   pa.int64()),
            "n_events": batch.column("n_events"),
        })

    return out.map_batches(fmt, batch_format="pyarrow")


def _q_scd2_intervals(sf_dir: str):
    """SCD type-2 intervalization of the event stream (functions/agg
    .scd2_intervals): per user, consecutive runs of the same
    event_type collapse to (valid_from, valid_to) rows, valid_to NULL
    on the open run — the CDC-to-warehouse history build that feeds
    as-of joins. Same bounded-bucket one-shuffle shape as sessionize;
    oracle = LAG change-point detection + LEAD over the change rows.
    Epoch-micro output for a dtype-stable compare (valid_to
    nullable)."""
    import ray.data as rd
    from ksoup_ray.functions.agg import scd2_intervals
    ds = _read(f"{sf_dir}/events.parquet",
                         columns=["user_id", "event_type", "ts",
                                  "event_id"])
    out = scd2_intervals(ds)

    def fmt(batch: pa.Table) -> pa.Table:
        return pa.table({
            "user_id": batch.column("user_id"),
            "event_type": batch.column("event_type"),
            "valid_from": pc.cast(batch.column("valid_from"),
                                  pa.int64()),
            "valid_to": pc.cast(batch.column("valid_to"), pa.int64()),
        })

    return out.map_batches(fmt, batch_format="pyarrow")


def _q_segment_dedup(sf_dir: str):
    """FineWeb/CCNet-style sub-document dedup (functions/dedup.py
    segment_dedup): split every document into 10-word segments, keep
    only each distinct segment's FIRST corpus occurrence (min
    (doc_id, seg_idx)), reassemble docs from survivors. Two
    bounded-bucket shuffles, per-BLOCK vectorized kernels (128-bit
    segment hash; Arrow ListArray+binary_join reassembly). The oracle
    replays the same rule with unnest + window-min in DuckDB."""
    import ray.data as rd
    from ksoup_ray.functions.dedup import segment_dedup
    ds = _read(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    return segment_dedup(ds, window=10)


def _q_anchor_texts(sf_dir: str):
    """Per-target anchor-text aggregation over the crawl's link graph
    (functions/graph.py anchor_texts): for every destination page, the
    '|'-joined anchor texts of all inbound links, ordered (src,
    anchor). One bounded-bucket shuffle on hash(dst); per-block
    ListArray+binary_join concat. Synth anchors are 'more k'
    (sources/synth.py nav links), so every concat is value-checked."""
    ds = _extracted(sf_dir)
    from ksoup_ray.functions.graph import anchor_texts

    def edges(batch: pa.Table) -> pa.Table:
        col = batch.column("links").combine_chunks()
        urls = batch.column("url").to_pylist()
        src = np.array([int(u.rsplit("/", 1)[1]) for u in urls],
                       dtype=np.int64)
        n_links = pc.list_value_length(col).to_numpy(
            zero_copy_only=False).astype(np.int64)
        flat = col.flatten()
        hrefs = pc.struct_field(flat, "href").to_pylist()
        dst = np.array([int(h.rsplit("/", 1)[1]) for h in hrefs],
                       dtype=np.int64)
        return pa.table({
            "src": pa.array(np.repeat(src, n_links), pa.int64()),
            "dst": pa.array(dst, pa.int64()),
            "anchor": pc.struct_field(flat, "text"),
        })

    return anchor_texts(ds.map_batches(edges, batch_format="pyarrow"))


def _q_latest_event(sf_dir: str):
    """Keep-newest compaction (functions/agg.py latest_per_key): each
    user's latest event by (ts desc, event_id desc) — the snapshot/CDC
    primitive. One bounded-bucket shuffle; per-block segment-end
    selection."""
    import ray.data as rd
    from ksoup_ray.functions.agg import latest_per_key
    ds = _read(
        f"{sf_dir}/events.parquet",
        columns=["user_id", "event_id", "ts", "event_type", "value"])
    out = latest_per_key(ds, key_col="user_id", ts_col="ts",
                         tie_col="event_id")

    def fmt(batch: pa.Table) -> pa.Table:
        return batch.set_column(
            batch.column_names.index("ts"), "ts",
            pc.cast(batch.column("ts"), pa.int64()))

    return out.map_batches(fmt, batch_format="pyarrow")


def _q_per_source_cap(sf_dir: str):
    """Quota sampling (functions/agg.py per_key_cap): at most 20 docs
    per source (lowest doc_ids win) — the anti-spam host cap. Dropped
    counts are recorded (no silent caps); one bounded-bucket shuffle,
    per-block segmented rank."""
    import ray.data as rd
    from ksoup_ray.functions.agg import per_key_cap
    ds = _read(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "source"])
    return per_key_cap(ds, key_col="source", id_col="doc_id", cap=20)


def _q_dsir_weights(sf_dir: str):
    """DSIR importance log-weights (functions/curation.py
    dsir_logweight): target distribution = the 'en' slice, raw = the
    whole corpus, unigram features with add-one smoothing, per-word
    deltas in int micros (order-free → exact SQL oracle). Same
    co-partitioned vocab shape as unigram_logprob — nothing
    vocabulary-scale is broadcast or driver-held."""
    import ray.data as rd
    from ksoup_ray.functions.curation import dsir_logweight
    ds = _read(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text", "lang"])
    return dsir_logweight(ds, target_lang="en")


def _q_region_counts(sf_dir: str):
    """Customers per region via BROADCAST dimension lookups
    (functions/joins.py broadcast_lookup): nation and region are
    KB-sized at any corpus scale, so the fact table never shuffles —
    one ray.put dict, a vectorized gather per batch, then a salted
    count on the 5 hot region keys."""
    import ray.data as rd
    from ksoup_ray.functions.agg import salted_count
    from ksoup_ray.functions.joins import broadcast_lookup
    nation = _read(f"{sf_dir}/nation.parquet",
                             columns=["n_nationkey", "n_regionkey"]) \
        .take_all()
    region = _read(f"{sf_dir}/region.parquet").take_all()
    rname = {r["r_regionkey"]: r["r_name"] for r in region}
    nat_to_region = {n["n_nationkey"]: rname[n["n_regionkey"]]
                     for n in nation}
    cust = _read(f"{sf_dir}/customer.parquet",
                           columns=["c_custkey", "c_nationkey"])
    enriched = broadcast_lookup(cust, nat_to_region,
                                src_col="c_nationkey",
                                out_col="r_name")
    out = salted_count(enriched, "r_name", salt=8)

    def fmt(batch: pa.Table) -> pa.Table:
        return batch.rename_columns(["r_name", "n_customers"])

    return out.map_batches(fmt, batch_format="pyarrow")


def _q_running_total(sf_dir: str):
    """Per-user running total of event value in int cents
    (functions/agg.py running_total) — the ordered-window primitive,
    computed as a segmented prefix sum per bucket block (never a
    per-user Python dispatch). Cents are exact, so the window sum is
    association-order-free and hash-matches SQL."""
    import ray.data as rd
    from ksoup_ray.functions.agg import running_total
    ds = _read(f"{sf_dir}/events.parquet",
                         columns=["user_id", "event_id", "ts",
                                  "value"])
    out = running_total(ds)

    def fmt(batch: pa.Table) -> pa.Table:
        return batch.set_column(
            batch.column_names.index("ts"), "ts",
            pc.cast(batch.column("ts"), pa.int64()))

    return out.map_batches(fmt, batch_format="pyarrow")


def _q_tfidf_topk(sf_dir: str):
    """Per-document top-3 tf-idf terms (functions/curation.py
    tfidf_topk): keyword extraction with int-micro scores (exact SQL
    oracle), idf table co-partitioned with doc term frequencies (the
    unigram_logprob shape), final per-doc ranking as a segmented
    per-block pass on a doc-bucket shuffle."""
    import ray.data as rd
    from ksoup_ray.functions.curation import tfidf_topk
    ds = _read(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    return tfidf_topk(ds, k=3)


def _q_distinct_texts(sf_dir: str):
    """Exact distributed distinct count (functions/sketch.py
    distinct_count): per-batch DISTINCT partials, one groupby on the
    value, scalar out. The exact companion to the HLL sketch."""
    import ray.data as rd
    from ksoup_ray.functions.sketch import distinct_count
    ds = _read(f"{sf_dir}/documents.parquet",
                         columns=["text"])
    return distinct_count(ds, "text")


def _q_hll_distinct(sf_dir: str):
    """HyperLogLog cardinality sketch (functions/sketch.py, p=12,
    ~1.6% std error): per-batch register partials folded by ONE native
    Max groupby over 4096 keys — network cost independent of
    cardinality, the way a 100-TB pipeline counts distinct urls.
    Deterministic fixed-key SipHash → reproducible estimate; pytest
    pins it against the exact count (no SQL oracle — DuckDB cannot
    replay SipHash), driver check is rows-only."""
    import ray.data as rd
    from ksoup_ray.functions.sketch import hll_distinct
    ds = _read(f"{sf_dir}/documents.parquet",
                         columns=["text"])
    return hll_distinct(ds, "text")


def _q_word_entropy(sf_dir: str):
    """Per-document word-distribution Shannon entropy in integer
    micro-nats (functions/textstats.word_entropy_batch) — a
    redundancy/quality signal; pure per-batch numpy (explode +
    factorize + unique), NO shuffle. Integer per-term rounding makes
    the sum order-free, so the DuckDB oracle matches exactly."""
    import ray.data as rd
    from ksoup_ray.functions.textstats import word_entropy_batch
    ds = _read(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    return ds.map_batches(word_entropy_batch, batch_format="pyarrow")


def _q_split_assign(sf_dir: str):
    """Deterministic train/val/test split assignment from the md5
    bucket of each doc_id (functions/splits.assign_splits): pure
    per-batch, no shuffle, no RNG — a resumed or re-partitioned run
    assigns every row identically, which is what makes hash splits
    the standard at crawl scale. Oracle recomputes the same md5
    bucket in SQL."""
    import ray.data as rd
    from ksoup_ray.functions.splits import assign_splits
    ds = _read(f"{sf_dir}/documents.parquet",
                         columns=["doc_id"])
    return assign_splits(ds, train_frac=0.8, val_frac=0.1)


def _q_zscore_by_lang(sf_dir: str):
    """Per-language z-score of document length
    (functions/agg.grouped_zscore): moment partials combine map-side,
    one bounded groupby (|langs| rows), moments broadcast in the
    scoring closure — the corpus itself never shuffles. Population
    std, int64 sums exact in double, same expression tree as the
    oracle."""
    import ray.data as rd
    from ksoup_ray.functions.agg import grouped_zscore
    ds = _read(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "lang", "n_chars"])
    return grouped_zscore(ds, key_col="lang", val_col="n_chars")


def _q_cocitation(sf_dir: str):
    """Co-citation pair counts over the crawl link graph
    (functions/graph.cocitation_counts): pairs of urls cited by the
    same page, counted corpus-wide. One bounded-bucket shuffle +
    map-side pair combine; degree-capped hubs are counted drops.
    Edges come from the same resolved-href extraction as link_edges,
    so the oracle value-checks the whole path parse → resolve →
    pair → count."""
    from ksoup_ray.functions.graph import cocitation_counts
    edges = _q_link_edges(sf_dir)
    return cocitation_counts(edges, max_degree=64)


def _q_bm25_search(sf_dir: str):
    """Top-k BM25 retrieval for a fixed query
    (functions/curation.bm25_search): block-local top-k then a tiny
    final sort — the corpus is scored in one streaming pass and never
    globally sorted. Deterministic doc_id tie-break ⇒ the oracle's
    ORDER BY ... LIMIT k selects the identical row set."""
    import ray.data as rd
    from ksoup_ray.functions.curation import bm25_search
    ds = _read(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    return bm25_search(ds, ("spark", "window", "merge"), k=10)


def _q_length_band(sf_dir: str):
    """Exact [p10, p90] token-length band filter
    (functions/curation.length_band_filter): quantiles from a bounded
    value histogram (the token_quantiles shape), cutoffs ride the
    filter closure, the corpus never shuffles. quantile_disc rule on
    both sides."""
    import ray.data as rd
    from ksoup_ray.functions.curation import length_band_filter
    ds = _read(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    return length_band_filter(ds, lo_q=0.1, hi_q=0.9)


def _q_label_centroids(sf_dir: str):
    """Per-label centroid sums over the embeddings table
    (functions/similarity.label_centroids): elements quantized to
    integer micros before any sum, so the (label, dim) totals are
    order-free and exactly reproducible in SQL. Per-batch np.add.at
    partials; ONE groupby bounded by |labels| x d."""
    import ray.data as rd
    from ksoup_ray.functions.similarity import label_centroids
    ds = _read(f"{sf_dir}/embeddings.parquet",
                         columns=["label", "embedding"])
    return label_centroids(ds)


def _q_lang_rebalance(sf_dir: str):
    """Language-rebalancing resample (functions/splits.
    resample_by_weight): non-en docs thinned to 25% by a
    deterministic md5-bucket Bernoulli — no RNG, no coordination,
    stable under resume. The keep probability is a per-row column, so
    the same operator applies DSIR-style importance weights
    unchanged; here the weights are the tiny lang map (broadcast in
    the closure)."""
    import pyarrow as _pa
    import pyarrow.compute as _pc
    import ray.data as rd
    from ksoup_ray.functions.splits import resample_by_weight

    def add_weight(batch):
        w = _pc.if_else(_pc.equal(batch.column("lang"), "en"),
                        _pa.scalar(1_000_000, _pa.int64()),
                        _pa.scalar(250_000, _pa.int64()))
        return batch.append_column("keep_micros", w)

    ds = _read(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "lang"])
    kept = resample_by_weight(
        ds.map_batches(add_weight, batch_format="pyarrow"))
    return kept.select_columns(["doc_id", "lang"])


def _q_bigram_pmi(sf_dir: str):
    """Collocation mining: PMI for the corpus's top-30 bigrams
    (functions/curation.bigram_pmi). Two streaming passes — bigram
    counts ride the one groupby shuffle as (gram, partial) pairs and
    reduce to block-local top-k; only k rows + 2k targeted unigram
    counts ever reach the driver."""
    import ray.data as rd
    from ksoup_ray.functions.curation import bigram_pmi
    ds = _read(f"{sf_dir}/documents.parquet",
                         columns=["text"])
    return bigram_pmi(ds, k=30)


def _q_q3_shipping(sf_dir: str):
    """TPC-H Q3-style shipping priority: one genuine LARGE-LARGE
    distributed hash join (pre-aggregated lineitem revenue ⋈ filtered
    orders on orderkey, partitions auto-sized to the cluster like
    pipelines/curate.py), with the small dimension (BUILDING
    customers) broadcast as a key set — never shuffled. Exact integer
    cents x discount-pct arithmetic (the q1_pricing convention), so
    the top-10 by revenue is value-exact."""
    import pyarrow.parquet as pq
    import ray.data as rd
    from ray.data.aggregate import Sum
    from ksoup_ray.pipelines.curate import _auto_partitions

    cutoff = pd.Timestamp("1998-06-15")
    cust = pq.read_table(f"{sf_dir}/customer.parquet",
                         columns=["c_custkey", "c_mktsegment"])
    keys_arr = pa.array(sorted(cust.filter(
        pc.equal(cust.column("c_mktsegment"), "BUILDING"))
        .column("c_custkey").to_pylist()), pa.int64())

    orders = _read(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_orderdate",
                 "o_orderpriority"])

    def filter_orders(batch: pa.Table) -> pa.Table:
        batch = batch.filter(
            pc.less(batch.column("o_orderdate"), pa.scalar(cutoff)))
        mask = pc.is_in(batch.column("o_custkey"),
                        value_set=keys_arr)
        return batch.filter(mask).select(
            ["o_orderkey", "o_orderdate", "o_orderpriority"])

    sel_orders = orders.map_batches(filter_orders,
                                    batch_format="pyarrow")

    li = _read(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_extendedprice", "l_discount",
                 "l_shipdate"])

    def revenue_partial(batch: pa.Table) -> pa.Table:
        batch = batch.filter(
            pc.greater(batch.column("l_shipdate"), pa.scalar(cutoff)))
        df = batch.to_pandas()
        cents = (df["l_extendedprice"] * 100).round().astype("int64")
        pct = ((1 - df["l_discount"]) * 100).round().astype("int64")
        df["revenue_e4"] = cents * pct
        g = df.groupby("l_orderkey", as_index=False).agg(
            revenue_e4=("revenue_e4", "sum"))
        return pa.Table.from_pandas(g, preserve_index=False)

    revenue = (li.map_batches(revenue_partial, batch_format="pyarrow",
                              batch_size=65536)
               .groupby("l_orderkey")
               .aggregate(Sum("revenue_e4", alias_name="revenue_e4")))

    joined = revenue.join(sel_orders, join_type="inner",
                          num_partitions=_auto_partitions(),
                          on=("l_orderkey",), right_on=("o_orderkey",))
    return (joined
            .select_columns(["l_orderkey", "revenue_e4",
                             "o_orderdate", "o_orderpriority"])
            .sort(["revenue_e4", "l_orderkey"],
                  descending=[True, False])
            .limit(10))


def _q_span_stats(sf_dir: str):
    """Repeated sliding-span statistics (functions/dedup.span_stats)
    — the window-granularity form of exact substring dedup (Lee et
    al. 2022). Only 128-bit span hashes + ids ride the ONE bucket
    shuffle; per-block segment flags, then one native Sum groupby."""
    import ray.data as rd
    from ksoup_ray.functions.dedup import span_stats
    ds = _read(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    return span_stats(ds, window=8, num_partitions=32)


def _q_dup_span_trim(sf_dir: str):
    """ExactSubstr-style repeated-span TRIMMING (functions/dedup.
    dup_span_trim) — the transform half of Lee et al. 2022 where
    span_stats is the statistic half: every word covered by an 8-word
    sliding span occurring >= 2 times anywhere in the corpus is
    removed (symmetric all-occurrences variant — order-free, so SQL
    can replay it exactly). Two bounded-bucket shuffles; span text
    never shuffles, only 128-bit hashes + (doc, pos) ids."""
    import ray.data as rd
    from ksoup_ray.functions.dedup import dup_span_trim
    ds = _read(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    return dup_span_trim(ds, window=8, num_partitions=32)


def _q_top_words_per_lang(sf_dir: str):
    """Per-language top-10 words (functions/curation.
    top_words_per_lang): map-side combine, one (lang, word) groupby,
    lossless block-local per-lang pruning before the tiny driver
    head(k)."""
    import ray.data as rd
    from ksoup_ray.functions.curation import top_words_per_lang
    ds = _read(f"{sf_dir}/documents.parquet",
                         columns=["lang", "text"])
    return top_words_per_lang(ds, k=10)


def _q_length_pct_rank(sf_dir: str):
    """Exact PERCENT_RANK of every doc's token count WITHOUT a global
    sort (functions/curation.length_pct_rank): bounded value
    histogram folded once, cumulative counts broadcast, per-batch
    searchsorted — the histogram-replaces-sort pattern for windowed
    analytics at corpus scale."""
    import ray.data as rd
    from ksoup_ray.functions.curation import length_pct_rank
    ds = _read(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    return length_pct_rank(ds)


def _q_heavy_hitters(sf_dir: str):
    """EXACT >=1%-frequency words via Misra-Gries candidates + a
    targeted verify pass (functions/sketch.heavy_hitters): bounded
    candidate state, vectorized is_in verify, native Dataset.sum for
    the grand total — identical to a full groupby with nothing
    vocabulary-scale shuffled."""
    import ray.data as rd
    from ksoup_ray.functions.sketch import heavy_hitters
    ds = _read(f"{sf_dir}/documents.parquet",
                         columns=["text"])
    return heavy_hitters(ds, "text", phi=0.01, text_split=True)


def _q_degree_hist(sf_dir: str):
    """Out-degree distribution of the crawl link graph
    (functions/graph.degree_histogram): id-only groupby(node), then a
    bounded histogram combine over the degree VALUES — the power-law
    diagnostic without ever collecting nodes."""
    from ksoup_ray.functions.graph import degree_histogram
    edges = _q_link_edges(sf_dir)
    return degree_histogram(edges, node_col="src")


def _q_triangle_support(sf_dir: str):
    """Per-closing-edge triangle counts over the crawl link graph
    (functions/graph.triangle_support): oriented node-iterator —
    wedges at the lowest node via the shared bounded-bucket pair
    kernel, closed by a union + ONE (a, b) groupby (no hash-join
    operator). The DuckDB oracle is the textbook 3-way self-join over
    the reconstructed canonical edge set."""
    from ksoup_ray.functions.graph import triangle_support
    edges = _q_link_edges(sf_dir)
    return triangle_support(edges)


def _q_embed_quantize(sf_dir: str):
    """Symmetric int8 quantization of the embeddings table
    (functions/similarity.quantize_int8): per-batch float64 numpy
    over the zero-copy matrix view, TRUNC semantics so DuckDB's
    list_transform reproduces every code exactly. Zero shuffles."""
    import ray.data as rd
    from ksoup_ray.functions.similarity import quantize_int8
    ds = _read(f"{sf_dir}/embeddings.parquet",
                         columns=["vec_id", "embedding"])
    return quantize_int8(ds)


def _q_distinct_words(sf_dir: str):
    """Exact per-language vocabulary size
    (functions/curation.distinct_words_per_lang): local pair dedup →
    one distinct-pair groupby → tiny per-lang Sum."""
    import ray.data as rd
    from ksoup_ray.functions.curation import distinct_words_per_lang
    ds = _read(f"{sf_dir}/documents.parquet",
                         columns=["lang", "text"])
    return distinct_words_per_lang(ds)


def _q_median_chars(sf_dir: str):
    """Exact per-language lower median of n_chars
    (functions/curation.grouped_median): bounded (lang × value)
    histogram replaces any sort; ceil(N/2)-th smallest matches the
    DuckDB row_number rule deterministically."""
    import ray.data as rd
    from ksoup_ray.functions.curation import grouped_median
    ds = _read(f"{sf_dir}/documents.parquet",
                         columns=["lang", "n_chars"])
    return grouped_median(ds, key_col="lang", val_col="n_chars")


def _q_langid_confusion(sf_dir: str):
    """Language-ID confusion matrix: the LangId actor pool
    (functions/textstats.py) scores each doc, then a map-side-combined
    cross-tab (functions/agg.crosstab_counts) counts (labeled lang ×
    predicted lang) — the classifier-evaluation primitive. The oracle
    reuses the langid SQL verbatim as a subquery."""
    import ray.data as rd
    from ksoup_ray.functions.agg import crosstab_counts
    from ksoup_ray.functions.textstats import LangId
    ds = _read(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text", "lang"])
    pred = ds.map_batches(LangId, batch_format="pyarrow",
                          concurrency=(1, 4))
    return crosstab_counts(pred, ["lang", "pred_lang"])


def _q_image_dhash(sf_dir: str):
    """Image perceptual hashing (functions/multimodal.ImageDHash):
    REAL PPM decode (functions/codecs.py) → integer luma → 8×9
    nearest-neighbor → 64-bit dHash, the visual near-dup fingerprint.
    Integer-exact end to end; pytest pins it against an independent
    per-pixel reference. No SQL oracle — the hash is a function of the
    decoded pixel payload, which SQL cannot decode (rows-only driver
    check by design, like the iterative family)."""
    import ray.data as rd
    from ksoup_ray.functions.multimodal import (ImageDHash,
                                                synth_media_batch)
    ds = _read(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    media = ds.map_batches(synth_media_batch, batch_format="pyarrow")
    out = media.map_batches(ImageDHash, batch_format="pyarrow",
                            batch_size=64, concurrency=(1, 2))

    def finalize(batch: pa.Table) -> pa.Table:
        keep = pc.is_valid(batch.column("dhash_hex"))
        batch = batch.filter(keep)
        return pa.table({"media_id": batch.column("media_id"),
                         "dhash_hex": batch.column("dhash_hex")})

    return out.map_batches(finalize, batch_format="pyarrow")


def _q_dhash_pairs(sf_dir: str):
    """Visual near-dup PAIRS: image dHash signatures through the SAME
    exact pigeonhole Hamming join as simhash_pairs (functions/dedup
    .hamming_pairs — signature-agnostic by design): all image pairs
    within 3 bits of 64-bit perceptual distance. Input is the
    deterministic near-dup variant corpus (synth_variant_images:
    groups of 4 ids share a base image with one-pixel perturbations —
    the re-encoded-thumbnail shape). PPM decode → dHash is pixel math
    SQL cannot replay, so rows-only driver check; the pair mining
    itself is pytest-pinned against an O(n^2) brute force over the
    same signatures."""
    import ray.data as rd
    from ksoup_ray.functions.dedup import hamming_pairs
    from ksoup_ray.functions.multimodal import (ImageDHash,
                                                synth_variant_images)
    ds = _read(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    media = ds.map_batches(synth_variant_images,
                           batch_format="pyarrow")
    hashed = media.map_batches(ImageDHash, batch_format="pyarrow",
                               batch_size=64, concurrency=(1, 2))

    def to_sig(batch: pa.Table) -> pa.Table:
        batch = batch.filter(pc.is_valid(batch.column("dhash_hex")))
        hexes = batch.column("dhash_hex").to_pylist()
        return pa.table({
            "media_id": batch.column("media_id"),
            "sig": pa.array([int(h, 16) for h in hexes], pa.uint64())})

    sigs = hashed.map_batches(to_sig, batch_format="pyarrow")
    return hamming_pairs(sigs, sig_col="sig", id_col="media_id",
                         max_hamming=3, metric_prefix="dhash_pairs")


def _q_png_decode(sf_dir: str):
    """COMPRESSED image decode, value-checked END-TO-END: the synth
    generator renders PNGs (from-scratch stdlib-zlib codec —
    functions/codecs.encode_png/decode_png, chunk CRCs + DEFLATE +
    all five scanline filters rotating per row) whose pixels are
    closed-form arithmetic in (doc_id, x, y, c); the PngDecodeStats
    actor stage decodes each payload and sums every channel value.
    The DuckDB oracle replays the sum with generate_series, so a
    wrong unfilter path, skipped CRC, or short inflate breaks the
    hash match. Interop with an external encoder is pinned in pytest
    (libpng-encoded fixtures under tests/fixtures/png)."""
    import ray.data as rd
    from ksoup_ray.functions.multimodal import (PngDecodeStats,
                                                synth_png_batch)
    ds = _read(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    media = ds.map_batches(synth_png_batch, batch_format="pyarrow")
    out = media.map_batches(PngDecodeStats, batch_format="pyarrow",
                            batch_size=64, concurrency=(1, 2))

    def finalize(batch: pa.Table) -> pa.Table:
        return pa.table({
            "media_id": batch.column("media_id"),
            "width": batch.column("width"),
            "height": batch.column("height"),
            "pixel_sum": batch.column("pixel_sum"),
        })

    return out.map_batches(finalize, batch_format="pyarrow")


def _q_gif_decode(sf_dir: str):
    """GIF decode value-checked END-TO-END (functions/codecs
    .decode_gif — from-the-spec variable-code-width LZW both
    directions): synthetic GIFs whose 64-entry palette and index grid
    are closed-form arithmetic in (doc_id, x, y); interlacing
    alternates by parity. The oracle replays the per-image RGB pixel
    sum with generate_series, so the LZW decompress, sub-block
    reassembly, de-interlace and palette mapping are all on the hash
    path. External-encoder interop is pinned in pytest (CPython's
    python.gif vs the lossless PPM ground truth)."""
    import ray.data as rd
    from ksoup_ray.functions.multimodal import (GifDecodeStats,
                                                synth_gif_batch)
    ds = _read(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    media = ds.map_batches(synth_gif_batch, batch_format="pyarrow")
    out = media.map_batches(GifDecodeStats, batch_format="pyarrow",
                            batch_size=64, concurrency=(1, 2))

    def finalize(batch: pa.Table) -> pa.Table:
        return pa.table({
            "media_id": batch.column("media_id"),
            "width": batch.column("width"),
            "height": batch.column("height"),
            "pixel_sum": batch.column("pixel_sum"),
        })

    return out.map_batches(finalize, batch_format="pyarrow")


def _q_jpeg_codec(sf_dir: str):
    """BASELINE JPEG encode→decode (functions/jpeg.py — from-scratch
    huffman entropy coding, DCT, Annex K tables; no Pillow/cv2),
    value-checked as far as a LOSSY codec allows: decoded dimensions
    must match the closed forms exactly and the round-trip error must
    sit inside a 2x-margin bound (any real defect — wrong zigzag,
    table, IDCT scale, MCU alignment — produces garbage, not +-2).
    Subsampling alternates 4:4:4 / 4:2:0 by doc parity so both MCU
    interleave shapes are on the hash. Pixel-exact external evidence
    lives in pytest: the codec decodes CPython's baseline python.jpg
    to the same logo as the PPM ground truth (independent decoder)."""
    import ray.data as rd
    from ksoup_ray.functions.multimodal import JpegRoundTrip
    ds = _read(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    return ds.map_batches(JpegRoundTrip, batch_format="pyarrow",
                          batch_size=64, concurrency=(1, 2))


def _q_audio_stats(sf_dir: str):
    """Audio signal features (functions/multimodal.AudioStats): REAL
    PCM-WAV decode → integer sample count / zero-crossing count /
    energy Σs². Pytest pins the values against direct numpy over the
    same payloads; rows-only driver check (binary decode is not
    SQL-expressible)."""
    import ray.data as rd
    from ksoup_ray.functions.multimodal import (AudioStats,
                                                synth_media_batch)
    ds = _read(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    media = ds.map_batches(synth_media_batch, batch_format="pyarrow")
    out = media.map_batches(AudioStats, batch_format="pyarrow",
                            batch_size=64, concurrency=(1, 2))

    def finalize(batch: pa.Table) -> pa.Table:
        keep = pc.is_valid(batch.column("n_samples"))
        batch = batch.filter(keep)
        return pa.table({
            "media_id": batch.column("media_id"),
            "n_samples": batch.column("n_samples"),
            "zero_crossings": batch.column("zero_crossings"),
            "energy_sumsq": batch.column("energy_sumsq"),
        })

    return out.map_batches(finalize, batch_format="pyarrow")


def _q_y4m_decode(sf_dir: str):
    """VIDEO decode value-checked END-TO-END — closes the last
    multimodal decode gap: the synth generator renders real
    YUV4MPEG2 clips (functions/video.encode_y4m — stream header +
    FRAME markers + raw planes) whose every plane value is closed-form
    arithmetic in (doc_id, x, y, t), including a +128 luma scene-cut
    jump; the VideoFrameStats actor stage decodes every frame and
    sums the Y and U+V planes. The oracle replays both sums with
    range joins, so a skipped frame, swapped plane, or misparsed
    header breaks the hash."""
    import ray.data as rd
    from ksoup_ray.functions.video import (VideoFrameStats,
                                           synth_y4m_batch)
    ds = _read(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    media = ds.map_batches(synth_y4m_batch, batch_format="pyarrow")
    out = media.map_batches(VideoFrameStats, batch_format="pyarrow",
                            batch_size=32, concurrency=(1, 2))

    def finalize(batch: pa.Table) -> pa.Table:
        return pa.table({
            "media_id": batch.column("media_id"),
            "n_frames": batch.column("n_frames"),
            "width": batch.column("width"),
            "height": batch.column("height"),
            "y_sum": batch.column("y_sum"),
            "uv_sum": batch.column("uv_sum"),
        })

    return out.map_batches(finalize, batch_format="pyarrow")


def _q_frame_sample(sf_dir: str):
    """Real video FRAME SAMPLING (functions/video.FrameSampleY4M —
    replaces the r1-era stubbed sampler): decode each Y4M clip, keep
    every 2nd frame, emit one row per sampled frame with its luma
    sum. The flat-map row-expansion shape downstream per-frame image
    ops consume; the per-frame y_sum puts every sampled frame's
    pixels on the oracle's hash."""
    import ray.data as rd
    from ksoup_ray.functions.video import (FrameSampleY4M,
                                           synth_y4m_batch)
    ds = _read(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    media = ds.map_batches(synth_y4m_batch, batch_format="pyarrow")
    return media.map_batches(FrameSampleY4M, batch_format="pyarrow",
                             fn_constructor_kwargs={"every": 2},
                             batch_size=32, concurrency=(1, 2))


def _q_scene_cuts(sf_dir: str):
    """Shot-boundary detection over decoded video (functions/video
    .SceneCutStats): per adjacent frame pair, the int64 sum of
    absolute luma differences; a cut where mean per-pixel change
    exceeds 64 (integer compare, sad > 64*w*h). The synth clips carry
    a deterministic +128 luma jump at a closed-form frame, so the
    oracle replays both the SAD values and the cut decisions term
    for term."""
    import ray.data as rd
    from ksoup_ray.functions.video import (SceneCutStats,
                                           synth_y4m_batch)
    ds = _read(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    media = ds.map_batches(synth_y4m_batch, batch_format="pyarrow")
    return media.map_batches(SceneCutStats, batch_format="pyarrow",
                             batch_size=32, concurrency=(1, 2))


def _q_avi_mjpeg(sf_dir: str):
    """MJPEG-in-AVI container round trip (functions/video
    .encode_avi_mjpeg/decode_avi_mjpeg — RIFF hdrl/movi/idx1 tree,
    one baseline JPEG per 00dc chunk through functions/jpeg.py):
    per doc, a smooth closed-form clip is encoded (4:4:4 / 4:2:0
    alternating by parity), the container re-parsed, every frame
    re-decoded, and the jpeg_codec-style error-bound witness
    emitted. Dims + frame count are exact closed forms; TRUE on the
    witness is only reachable by actually walking RIFF and decoding
    every frame."""
    import ray.data as rd
    from ksoup_ray.functions.video import AviRoundTrip
    ds = _read(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    return ds.map_batches(AviRoundTrip, batch_format="pyarrow",
                          batch_size=32, concurrency=(1, 2))


_MIX_WEIGHTS = {"en": 400, "de": 200, "fr": 200, "es": 120, "zh": 80}


def _q_mix_sample(sf_dir: str):
    """EXACT data-mixing sampler (functions/mixing.py): keep exactly
    largest_remainder(floor(N·10%), {en:40%, de:20%, fr:20%, es:12%,
    zh:8%}) docs per language, chosen by smallest (md5(str(id)), id)
    — the pretraining mixture step done exactly, not in expectation.
    Distributed order-statistic selection: ONE bounded (lang,
    16-bit-md5-prefix) histogram fold, driver pins each language's
    boundary bucket, ONE boundary-members-only collect (corpus/65536
    rows), one pure keep map — no corpus sort, payloads never
    shuffle. Oracle: ROW_NUMBER per lang over the same md5 ordering
    + the largest-remainder quotas replayed in SQL."""
    from ksoup_ray.functions.mixing import mix_sample
    ds = _read(f"{sf_dir}/documents.parquet",
               columns=["doc_id", "lang"])
    return mix_sample(ds, _MIX_WEIGHTS, frac_permille=100)


def _q_mp4_mjpeg(sf_dir: str):
    """MP4 (ISO-BMFF) container round trip (functions/mp4.py — a
    from-scratch standards-layout muxer, generic box walker with
    64-bit/to-EOF size handling, and a demuxer that extracts samples
    through the REAL stsc/stco/stsz chunk maps; Motion-JPEG samples
    decoded by functions/jpeg.py). Per doc the avi_mjpeg closed-form
    clip muxes, demuxes, and re-decodes; the oracle checks the exact
    dims/frame-count closed forms, the fixed 19-box pre-order count,
    and the jpeg_codec-style error-bound witness — TRUE is only
    reachable by walking the box tree and decoding every sample.
    Closes the 'real MP4 is a plug-in point' gap at the container
    level (compressed avc1/av01 sample DATA still needs external
    codecs and raises NotImplementedError with the demux intact)."""
    from ksoup_ray.functions.mp4 import Mp4RoundTrip
    ds = _read(f"{sf_dir}/documents.parquet",
               columns=["doc_id", "text"])
    return ds.map_batches(Mp4RoundTrip, batch_format="pyarrow",
                          batch_size=32, concurrency=(1, 2))


def _q_retention_cohorts(sf_dir: str):
    """Weekly retention cohorts over the event log
    (functions/agg.retention_cohorts): local (user, week) dedup → ONE
    bounded-bucket shuffle on hash(user) → per-block sorted segment
    scan (cohort = per-user min week) → tiny (cohort, offset) Sum.
    Exact integer epoch_us // week arithmetic on both sides."""
    import ray.data as rd
    from ksoup_ray.functions.agg import retention_cohorts
    ds = _read(f"{sf_dir}/events.parquet",
                         columns=["user_id", "ts"])
    return retention_cohorts(ds)


def _q_q5_local_supplier(sf_dir: str):
    """TPC-H Q5-style local-supplier volume: revenue per nation where
    customer and supplier share a nation inside one region. The
    Ray-Data-first join plan: the TINY dimensions (region→nation map,
    supplier→nation map — orders of magnitude smaller than the fact
    tables) ride along as broadcast lookups inside map_batches (the
    q3_shipping convention); the ONE genuine large-large hash join is
    filtered-orders ⋈ per-(order, supplier-nation) pre-aggregated
    lineitem revenue, partitions auto-sized to the cluster. Exact
    integer cents × discount-pct arithmetic (q1_pricing convention)."""
    import pyarrow.parquet as pq
    import ray.data as rd
    from ray.data.aggregate import Sum
    from ksoup_ray.pipelines.curate import _auto_partitions

    lo = pd.Timestamp("1996-01-01")
    hi = pd.Timestamp("1997-01-01")

    nation = pq.read_table(f"{sf_dir}/nation.parquet")
    region = pq.read_table(f"{sf_dir}/region.parquet")
    asia_key = region.filter(
        pc.equal(region.column("r_name"), "ASIA")) \
        .column("r_regionkey")[0].as_py()
    nat = nation.filter(
        pc.equal(nation.column("n_regionkey"), asia_key))
    nat_keys = set(nat.column("n_nationkey").to_pylist())
    nat_names = dict(zip(nat.column("n_nationkey").to_pylist(),
                         nat.column("n_name").to_pylist()))
    supp = pq.read_table(f"{sf_dir}/supplier.parquet",
                         columns=["s_suppkey", "s_nationkey"])
    supp_nat = {k: v for k, v in
                zip(supp.column("s_suppkey").to_pylist(),
                    supp.column("s_nationkey").to_pylist())
                if v in nat_keys}
    cust = pq.read_table(f"{sf_dir}/customer.parquet",
                         columns=["c_custkey", "c_nationkey"])
    cust_nat = {k: v for k, v in
                zip(cust.column("c_custkey").to_pylist(),
                    cust.column("c_nationkey").to_pylist())
                if v in nat_keys}

    orders = _read(f"{sf_dir}/orders.parquet",
                             columns=["o_orderkey", "o_custkey",
                                      "o_orderdate"])

    def order_nation(batch: pa.Table) -> pa.Table:
        batch = batch.filter(pc.and_(
            pc.greater_equal(batch.column("o_orderdate"),
                             pa.scalar(lo)),
            pc.less(batch.column("o_orderdate"), pa.scalar(hi))))
        keys = batch.column("o_custkey").to_pylist()
        cn = np.array([cust_nat.get(k, -1) for k in keys], np.int64)
        out = pa.table({
            "o_orderkey": batch.column("o_orderkey"),
            "c_nationkey": pa.array(cn, pa.int64()),
        })
        return out.filter(pc.greater_equal(out.column("c_nationkey"),
                                           0))

    sel_orders = orders.map_batches(order_nation,
                                    batch_format="pyarrow")

    li = _read(f"{sf_dir}/lineitem.parquet",
                         columns=["l_orderkey", "l_suppkey",
                                  "l_extendedprice", "l_discount"])

    def revenue_partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        sn = df["l_suppkey"].map(supp_nat)
        df = df[sn.notna()]
        df["s_nationkey"] = sn[sn.notna()].astype(np.int64)
        cents = (df["l_extendedprice"] * 100).round().astype("int64")
        pct = ((1 - df["l_discount"]) * 100).round().astype("int64")
        df["revenue_e4"] = cents * pct
        g = df.groupby(["l_orderkey", "s_nationkey"],
                       as_index=False).agg(
            revenue_e4=("revenue_e4", "sum"))
        return pa.Table.from_pandas(g, preserve_index=False)

    revenue = (li.map_batches(revenue_partial, batch_format="pyarrow",
                              batch_size=65536)
               .groupby(["l_orderkey", "s_nationkey"])
               .aggregate(Sum("revenue_e4",
                              alias_name="revenue_e4")))

    joined = revenue.join(sel_orders, join_type="inner",
                          num_partitions=_auto_partitions(),
                          on=("l_orderkey",),
                          right_on=("o_orderkey",))

    def local_only(batch: pa.Table) -> pa.Table:
        batch = batch.filter(pc.equal(batch.column("s_nationkey"),
                                      batch.column("c_nationkey")))
        names = [nat_names[k] for k in
                 batch.column("s_nationkey").to_pylist()]
        return pa.table({
            "n_name": pa.array(names, pa.string()),
            "revenue_e4": batch.column("revenue_e4"),
        })

    def name_partial(batch: pa.Table) -> pa.Table:
        g = batch.group_by(["n_name"]).aggregate(
            [("revenue_e4", "sum")])
        return pa.table({
            "n_name": g.column("n_name"),
            "partial": g.column("revenue_e4_sum").cast(pa.int64()),
        })

    return (joined.map_batches(local_only, batch_format="pyarrow")
            .map_batches(name_partial, batch_format="pyarrow")
            .groupby("n_name")
            .aggregate(Sum("partial", alias_name="revenue_e4"))
            .sort(["revenue_e4", "n_name"], descending=[True, False]))


def _q_extract_paragraphs(sf_dir: str):
    """Paragraph-granularity extraction (stages/extract.ParagraphStage,
    flat-map shape): parse the DOM, select `#content > p`, ONE ROW PER
    PARAGRAPH with its document-order index, decoded text, and class
    flag — the row granularity of paragraph-level curation. Oracle:
    the synth corpus chunks text into 13-word paragraphs with class
    an-info on every 5th, so the SQL reconstructs every row."""
    from ksoup_ray.stages.extract import ParagraphStage
    ds = _pages(sf_dir)
    return ds.map_batches(ParagraphStage, batch_format="pyarrow",
                          concurrency=(1, 4))


def _q_para_dedup(sf_dir: str):
    """Paragraph-level exact dedup across documents (the RefinedWeb /
    CCNet line-dedup analogue at paragraph granularity): md5 every
    extracted paragraph, keep the first occurrence by (doc_id,
    para_idx), count copies. Map-side combine collapses each batch to
    its distinct hashes; ONE groupby over the hash with native
    Min/Sum — paragraph TEXT never rides the shuffle, only 32-char
    hashes + one packed int64 keeper key."""
    import hashlib
    from ray.data.aggregate import Min, Sum

    paras = _q_extract_paragraphs(sf_dir)

    def hash_partial(batch: pa.Table) -> pa.Table:
        urls = batch.column("url").to_pylist()
        idxs = batch.column("para_idx").to_numpy(zero_copy_only=False)
        texts = batch.column("para_text").to_pylist()
        doc_ids = np.array([int(u.rsplit("/", 1)[1]) for u in urls],
                           np.int64)
        h = [hashlib.md5(t.encode()).hexdigest() for t in texts]
        df = pd.DataFrame({
            "para_md5": h,
            "keeper_key": doc_ids * 1_000_000 + idxs,
        })
        g = df.groupby("para_md5", as_index=False).agg(
            keeper_key=("keeper_key", "min"),
            partial=("keeper_key", "size"))
        g["partial"] = g["partial"].astype(np.int64)
        return pa.Table.from_pandas(g, preserve_index=False)

    agg = (paras.map_batches(hash_partial, batch_format="pyarrow")
           .groupby("para_md5")
           .aggregate(Min("keeper_key", alias_name="keeper_key"),
                      Sum("partial", alias_name="n_copies")))

    def unpack(batch: pa.Table) -> pa.Table:
        kk = batch.column("keeper_key").to_numpy(zero_copy_only=False)
        return pa.table({
            "para_md5": batch.column("para_md5"),
            "keeper_doc_id": pa.array(kk // 1_000_000, pa.int64()),
            "keeper_para_idx": pa.array(kk % 1_000_000, pa.int64()),
            "n_copies": batch.column("n_copies"),
        })

    return agg.map_batches(unpack, batch_format="pyarrow")


def _q_csv_roundtrip(sf_dir: str):
    """CSV shard source/sink: the documents table written once
    (cached) as CSV shards via the Dataset sink, read back with
    ray.data.read_csv (one task per shard), value-checked against the
    original — quoting/escaping fidelity through the text boundary,
    the jsonl_roundtrip pattern for the other interchange format."""
    import os
    import ray.data as rd

    cache = (f"/tmp/ksoup_csv_corpus/"
             f"{os.path.basename(sf_dir.rstrip('/'))}")
    marker = os.path.join(cache, "_COMPLETE")
    if not os.path.exists(marker):
        os.makedirs(cache, exist_ok=True)
        _read(f"{sf_dir}/documents.parquet") \
            .repartition(8).write_csv(cache)
        with open(marker, "w") as f:
            f.write("ok")
    files = [os.path.join(cache, f) for f in sorted(os.listdir(cache))
             if f.endswith(".csv")]
    return rd.read_csv(files).select_columns(
        ["doc_id", "text", "lang", "source", "n_chars"])


def _q_wet_roundtrip(sf_dir: str):
    """WET artifact round-trip (sources/warc.write_wet_shards /
    read_wet): Common Crawl's extracted-text format — WARC
    'conversion' records, text/plain payloads, per-record gzip
    members — written once (cached) from the documents table and read
    back through the truncation-counting record walker. Identity
    oracle on (url, text): a header, length, member-boundary, or
    UTF-8 bug breaks the hash."""
    import os
    import ray.data as rd
    from ksoup_ray.sources.synth import url_for
    from ksoup_ray.sources.warc import read_wet, write_wet_shards

    cache = (f"/tmp/ksoup_wet_corpus/"
             f"{os.path.basename(sf_dir.rstrip('/'))}")
    marker = os.path.join(cache, "_COMPLETE")
    if not os.path.exists(marker):
        os.makedirs(cache, exist_ok=True)
        docs = _read(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "text", "lang"])

        def with_url(batch: pa.Table) -> pa.Table:
            ids = batch.column("doc_id").to_pylist()
            langs = batch.column("lang").to_pylist()
            return pa.table({
                "url": pa.array(
                    [url_for(d, l) for d, l in zip(ids, langs)],
                    pa.string()),
                "text": batch.column("text")})

        write_wet_shards(
            docs.map_batches(with_url, batch_format="pyarrow"),
            cache)
        with open(marker, "w") as f:
            f.write("ok")
    return read_wet(cache)


def _q_orc_roundtrip(sf_dir: str):
    """ORC shard source/sink (sources/orc.py — Ray 2.49 has no ORC
    reader, so both directions run on pyarrow.orc inside map_batches):
    documents written once (cached) as one ORC file per block via a
    tmp-then-rename task-parallel sink, read back with ONE TASK PER
    STRIPE (driver touches footers only) and column pruning pushed
    into the ORC decoder. Identity oracle — a lost stripe, dropped
    column, or type drift breaks the hash."""
    import os
    import ray.data as rd
    from ksoup_ray.sources.orc import read_orc, write_orc_shards

    cache = (f"/tmp/ksoup_orc_corpus/"
             f"{os.path.basename(sf_dir.rstrip('/'))}")
    marker = os.path.join(cache, "_COMPLETE")
    if not os.path.exists(marker):
        os.makedirs(cache, exist_ok=True)
        manifest = write_orc_shards(
            _read(f"{sf_dir}/documents.parquet")
            .repartition(8), cache)
        manifest.count()                      # drive the write
        with open(marker, "w") as f:
            f.write("ok")
    return read_orc(cache, columns=["doc_id", "text", "lang",
                                    "source", "n_chars"])


def _q_rollup_counts(sf_dir: str):
    """GROUP BY ROLLUP over (lang, source)
    (functions/agg.rollup_counts): one distributed cross-tab, every
    subtotal level derived from the bounded detail grid — mirrors
    DuckDB ROLLUP + GROUPING() exactly."""
    import ray.data as rd
    from ksoup_ray.functions.agg import rollup_counts
    ds = _read(f"{sf_dir}/documents.parquet",
                         columns=["lang", "source"])
    return rollup_counts(ds, ["lang", "source"])


def _q_hash_sample(sf_dir: str):
    """Exact-k deterministic per-language sample
    (functions/splits.topk_hash_sample): k smallest md5 buckets per
    lang — stable under re-runs/resume, lossless block-local pruning
    before the bounded-key merge."""
    import ray.data as rd
    from ksoup_ray.functions.splits import topk_hash_sample
    ds = _read(f"{sf_dir}/documents.parquet",
                         columns=["lang", "doc_id"])
    return topk_hash_sample(ds, k=5)


def _q_length_gini(sf_dir: str):
    """Exact per-language Gini of doc lengths in floored ppm
    (functions/curation.grouped_gini): bounded histogram replaces the
    sort, rank-weighted sums folded per value run in Python ints —
    overflow-free at any corpus size."""
    import ray.data as rd
    from ksoup_ray.functions.curation import grouped_gini
    ds = _read(f"{sf_dir}/documents.parquet",
                         columns=["lang", "n_chars"])
    return grouped_gini(ds)


def _q_html_tables(sf_dir: str):
    """Scrape-a-table (stages/extract.TableExtractStage): parse a
    deterministic table page per doc and emit one row per CELL through
    full Element.text() normalization (bold wrappers collapse, thead
    row first). The oracle reconstructs every cell with
    generate_series arithmetic."""
    import ray.data as rd
    from ksoup_ray.sources.synth import render_table_page
    from ksoup_ray.stages.extract import TableExtractStage
    ds = _read(f"{sf_dir}/documents.parquet",
                         columns=["doc_id"])

    def render(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "html": pa.array([render_table_page(i) for i in ids],
                             pa.string())})

    pages = ds.map_batches(render, batch_format="pyarrow")
    return pages.map_batches(TableExtractStage, batch_format="pyarrow",
                             concurrency=(1, 4))


def _q_form_fields(sf_dir: str):
    """FormElement.form_data() as a distributed stage
    (stages/extract.FormExtractStage): one row per SUBMITTED field in
    submission order — disabled inputs skipped, checkbox only when
    checked ('on'), select falls back to its first option, textarea
    value = text. The oracle enumerates the same branch logic as flat
    CASE/WHERE rows (field_idx shifts when the checkbox is absent)."""
    import ray.data as rd
    from ksoup_ray.sources.synth import render_form_page
    from ksoup_ray.stages.extract import FormExtractStage
    ds = _read(f"{sf_dir}/documents.parquet",
                         columns=["doc_id"])

    def render(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "html": pa.array([render_form_page(i) for i in ids],
                             pa.string())})

    pages = ds.map_batches(render, batch_format="pyarrow")
    return pages.map_batches(FormExtractStage, batch_format="pyarrow",
                             concurrency=(1, 4))


def _q_grouped_mode(sf_dir: str):
    """Exact per-language mode of doc length
    (functions/curation.grouped_mode): bounded histogram groupby,
    driver argmax, ties toward the smallest value."""
    import ray.data as rd
    from ksoup_ray.functions.curation import grouped_mode
    ds = _read(f"{sf_dir}/documents.parquet",
                         columns=["lang", "n_chars"])
    return grouped_mode(ds)


def _q_cov_qty_price(sf_dir: str):
    """Exact per-returnflag covariance numerator between quantity
    (whole units) and extended price (cents)
    (functions/agg.grouped_cov): streaming sufficient statistics,
    arbitrary-precision driver fold — order-free bit-exact vs the
    DuckDB BIGINT oracle."""
    import ray.data as rd
    from ksoup_ray.functions.agg import grouped_cov
    ds = _read(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_returnflag", "l_quantity", "l_extendedprice"])
    return grouped_cov(ds, key_col="l_returnflag", x_col="l_quantity",
                       y_col="l_extendedprice", x_scale=1, y_scale=100)


def _q_source_langs(sf_dir: str):
    """Ordered string_agg of DISTINCT langs per source
    (functions/agg.group_string_agg): one cross-tab shuffle, ordered
    concat on the bounded grid."""
    import ray.data as rd
    from ksoup_ray.functions.agg import group_string_agg
    ds = _read(f"{sf_dir}/documents.parquet",
                         columns=["source", "lang"])
    return group_string_agg(ds, key_col="source", val_col="lang")


def _q_stale_orders(sf_dir: str):
    """Distributed ANTI join (functions/joins.anti_join): orders with
    NO lineitem shipped on/after 1996-01-01 — right side collapses to
    distinct keys map-side, one left-outer hash join + null filter."""
    import datetime
    import ray.data as rd
    from ksoup_ray.functions.joins import anti_join
    orders = _read(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_orderstatus"])
    cutoff = pa.scalar(datetime.datetime(1996, 1, 1),
                       pa.timestamp("us"))
    recent = _read(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_shipdate"],
    ).map_batches(
        lambda b: b.filter(
            pc.greater_equal(b.column("l_shipdate"), cutoff)),
        batch_format="pyarrow")
    return anti_join(orders, recent, left_on="o_orderkey",
                     right_on="l_orderkey")


def _q_json_props(sf_dir: str):
    """Vectorized JSON field extraction (functions/jsonx.py): pull
    int field $.k out of the events props payload via polars'
    Rust-native json_path_match — no per-row Python loads loop;
    DuckDB json_extract parity on nulls."""
    import ray.data as rd
    from ksoup_ray.functions.jsonx import json_int_field
    ds = _read(f"{sf_dir}/events.parquet",
                         columns=["event_id", "props"])
    return json_int_field(ds, col="props", path="$.k", out_col="k",
                          keep=["event_id"])


def _q_sitemap_urls(sf_dir: str):
    """Sitemap XML round-trip through the XmlTreeBuilder as a
    distributed stage: render one sitemap per source (bounded group
    count), parse it back with Ksoup.parse-xml semantics, explode to
    one row per <url> entry. Proves the XML parse path at pipeline
    level (engine/xmlbuilder.py; reference Ksoup.kt parse(xml))."""
    import ray.data as rd
    from ksoup_ray.engine import parser as KP
    ds = _read(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "lang", "source"])

    def render(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values("doc_id")
        entries = "".join(
            f"<url><loc>https://synth.invalid/{l}/{d:08d}</loc>"
            f"<lastmod>day{d % 30}</lastmod></url>"
            for d, l in zip(g["doc_id"], g["lang"]))
        xml = f'<?xml version="1.0"?><urlset>{entries}</urlset>'
        return pd.DataFrame({"source": [g["source"].iloc[0]],
                             "xml": [xml]})

    maps = ds.groupby("source").map_groups(render,
                                           batch_format="pandas")

    def parse(batch: pa.Table) -> pa.Table:
        srcs: list[str] = []
        locs: list[str] = []
        mods: list[str] = []
        for s, xml in zip(batch.column("source").to_pylist(),
                          batch.column("xml").to_pylist()):
            doc = KP.parse_xml(xml)
            for u in doc.select("url"):
                srcs.append(s)
                locs.append(u.select_first("loc").text())
                mods.append(u.select_first("lastmod").text())
        return pa.table({"source": pa.array(srcs, pa.string()),
                         "loc": pa.array(locs, pa.string()),
                         "lastmod": pa.array(mods, pa.string())})

    return maps.map_batches(parse, batch_format="pyarrow")


def _q_event_pivot(sf_dir: str):
    """PIVOT events to a per-user feature row
    (functions/agg.pivot_counts): fixed wide count columns per event
    type, map-side-combined partials, one groupby."""
    import ray.data as rd
    from ksoup_ray.functions.agg import pivot_counts
    ds = _read(f"{sf_dir}/events.parquet",
                         columns=["user_id", "event_type"])
    return pivot_counts(
        ds, key_col="user_id", cat_col="event_type",
        categories=["click", "error", "purchase", "signup", "view"])


def _q_users_both(sf_dir: str):
    """Distributed set INTERSECTION: users with BOTH a click and a
    purchase — the same one-shuffle pivot (functions/agg.pivot_counts)
    filtered on both counts positive; no second shuffle, no
    driver-side sets."""
    import ray.data as rd
    from ksoup_ray.functions.agg import pivot_counts
    ds = _read(f"{sf_dir}/events.parquet",
                         columns=["user_id", "event_type"])
    wide = pivot_counts(ds, key_col="user_id", cat_col="event_type",
                        categories=["click", "purchase"])
    return wide.map_batches(
        lambda b: b.filter(pc.and_(
            pc.greater(b.column("n_click"), 0),
            pc.greater(b.column("n_purchase"), 0))),
        batch_format="pyarrow").select_columns(["user_id"])


def _q_microdata(sf_dir: str):
    """schema.org microdata extraction
    (stages/extract.MicrodataStage): one row per itemprop in document
    order; <time> values come from the datetime ATTRIBUTE (the
    attribute-vs-text rule the oracle checks on even ids only)."""
    import ray.data as rd
    from ksoup_ray.sources.synth import render_microdata_page
    from ksoup_ray.stages.extract import MicrodataStage
    ds = _read(f"{sf_dir}/documents.parquet",
                         columns=["doc_id"])

    def render(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "html": pa.array([render_microdata_page(i) for i in ids],
                             pa.string())})

    pages = ds.map_batches(render, batch_format="pyarrow")
    return pages.map_batches(MicrodataStage, batch_format="pyarrow",
                             concurrency=(1, 4))


def _q_event_gaps(sf_dir: str):
    """Per-user LAG inter-arrival deltas in exact integer microseconds
    (functions/agg.lag_gaps): one bounded-bucket shuffle, per-block
    vectorized diff with segment guards; each user's first event is
    excluded (LAG null)."""
    import ray.data as rd
    from ksoup_ray.functions.agg import lag_gaps
    ds = _read(f"{sf_dir}/events.parquet",
                         columns=["event_id", "user_id", "ts"])
    return lag_gaps(ds, num_partitions=32)


def _q_ohlc_hourly(sf_dir: str):
    """Per-(user, hour) OPEN/HIGH/LOW/CLOSE bars
    (functions/agg.ohlc_bars): the time-series downsampling
    primitive; per-row ROUND(value*1e6) micros so every bar value is
    an exact int64, (ts, event_id) ordering so duplicate timestamps
    are deterministic. One bounded-bucket shuffle + segmented
    reduceat kernel — never per-key dispatch."""
    import ray.data as rd
    from ksoup_ray.functions.agg import ohlc_bars
    ds = _read(f"{sf_dir}/events.parquet",
                         columns=["event_id", "user_id", "ts",
                                  "value"])
    return ohlc_bars(ds, num_partitions=32)


def _q_monthly_revenue(sf_dir: str):
    """Calendar-month revenue rollup: vectorized Arrow year/month
    extraction + exact int64 cents, ONE partial-combining groupby
    (q1_pricing's cents convention over the date dimension)."""
    import ray.data as rd
    from ray.data.aggregate import Count, Sum
    ds = _read(f"{sf_dir}/orders.parquet",
                         columns=["o_orderdate", "o_totalprice"])

    def keyed(batch: pa.Table) -> pa.Table:
        d = batch.column("o_orderdate")
        cents = np.round(batch.column("o_totalprice")
                         .to_numpy(zero_copy_only=False)
                         * 100).astype(np.int64)
        return pa.table({
            "o_year": pc.cast(pc.year(d), pa.int64()),
            "o_month": pc.cast(pc.month(d), pa.int64()),
            "cents": pa.array(cents, pa.int64()),
        })

    return (ds.map_batches(keyed, batch_format="pyarrow")
            .groupby(["o_year", "o_month"])
            .aggregate(Sum("cents", alias_name="revenue_cents"),
                       Count(alias_name="n_orders")))


def _q_length_histogram(sf_dir: str):
    """Fixed-width document-length histogram (256-char bins): exact
    integer bin arithmetic, per-batch combine, one bounded groupby —
    the corpus-profiling first look."""
    import ray.data as rd
    from ray.data.aggregate import Count, Sum
    ds = _read(f"{sf_dir}/documents.parquet",
                         columns=["n_chars"])

    def binned(batch: pa.Table) -> pa.Table:
        n = batch.column("n_chars")
        return pa.table({
            "bin": pc.divide(n, pa.scalar(256, pa.int64())),
            "n_chars": n,
        })

    return (ds.map_batches(binned, batch_format="pyarrow")
            .groupby("bin")
            .aggregate(Count(alias_name="n"),
                       Sum("n_chars", alias_name="total_chars")))


def _q_cube_counts(sf_dir: str):
    """GROUP BY CUBE over (lang, source)
    (functions/agg.cube_counts): one distributed cross-tab, all 2^k
    grouping sets derived from the bounded grid — mirrors DuckDB
    CUBE + GROUPING() bitmask exactly."""
    import ray.data as rd
    from ksoup_ray.functions.agg import cube_counts
    ds = _read(f"{sf_dir}/documents.parquet",
                         columns=["lang", "source"])
    return cube_counts(ds, ["lang", "source"])


def _q_group_checksum(sf_dir: str):
    """Per-language order-free content checksum
    (functions/agg.group_xor_checksum): bit_xor of 60-bit md5
    prefixes + counts — the cross-engine partition-verification
    primitive (equal iff both engines saw the same row multiset)."""
    import ray.data as rd
    from ksoup_ray.functions.agg import group_xor_checksum
    ds = _read(f"{sf_dir}/documents.parquet",
                         columns=["lang", "text"])
    return group_xor_checksum(ds, key_col="lang", text_col="text")


def _q_ntile_bands(sf_dir: str):
    """Sort-free NTILE(4) per language over (n_chars, doc_id)
    (functions/agg.ntile_by_group): equi-depth quartile banding with
    NO per-group global sort — one bounded cross-tab gives each
    (lang, n_chars)'s below-count, one co-partitioned block kernel
    ranks ties by doc_id; DuckDB's first-r-tiles-get-one-extra rule
    reproduced closed-form."""
    import ray.data as rd
    from ksoup_ray.functions.agg import ntile_by_group
    ds = _read(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "lang", "n_chars"])
    return ntile_by_group(ds, key_col="lang", val_col="n_chars",
                          tie_col="doc_id", n_tiles=4,
                          num_partitions=32)


def _q_mutual_links(sf_dir: str):
    """Reciprocal-link pairs over crawl edges + a backlink feed
    (functions/graph.mutual_edges): parsed <a href> edges, plus the
    reversed edge for every doc_id%5==0 source (modelling an external
    backlink table), packed into canonical int64 pair keys — one
    bounded groupby finds every pair present in BOTH directions."""
    from ksoup_ray.functions.graph import mutual_edges
    edges = _q_link_edges(sf_dir)

    def with_backlinks(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as _pc
        back = batch.filter(
            _pc.equal(_pc.subtract(
                batch.column("src"),
                _pc.multiply(_pc.divide(batch.column("src"),
                                        pa.scalar(5, pa.int64())),
                             pa.scalar(5, pa.int64()))), 0))
        rev = pa.table({"src": back.column("dst"),
                        "dst": back.column("src")})
        return pa.concat_tables([batch, rev])

    return mutual_edges(
        edges.map_batches(with_backlinks, batch_format="pyarrow"))


def _q_regex_density(sf_dir: str):
    """Per-document RE2 match counts (textstats.regex_count_batch):
    Arrow count_substring_regex, zero-copy, no shuffle — semantics
    identical to DuckDB regexp_extract_all length."""
    import ray.data as rd
    from ksoup_ray.functions.textstats import regex_count_batch
    ds = _read(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    return ds.map_batches(regex_count_batch, batch_format="pyarrow")


def _q_lineitem_melt(sf_dir: str):
    """UNPIVOT lineitem measures to long form
    (functions/agg.melt_measures): pure map-side reshape — four
    stacked column slices per batch, exact int64 micros, no
    shuffle."""
    import ray.data as rd
    from ksoup_ray.functions.agg import melt_measures
    ds = _read(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_linenumber", "l_quantity",
                 "l_extendedprice", "l_discount", "l_tax"])
    return melt_measures(
        ds, id_cols=["l_orderkey", "l_linenumber"],
        measure_cols=["l_quantity", "l_extendedprice", "l_discount",
                      "l_tax"])


def _q_fuzzy_neardup(sf_dir: str):
    """Prefix-blocked Levenshtein near-duplicate pairs
    (functions/dedup.fuzzy_neardup_pairs): exact-match on the first
    6 chars blocks candidates; chars 7–24 scored by BATCHED
    vectorized edit-distance DP (324 numpy steps for the whole pair
    set, never per-pair Python); dist ≤ 6 survives. The typo-dedup
    primitive MinHash misses."""
    import ray.data as rd
    from ksoup_ray.functions.dedup import fuzzy_neardup_pairs
    ds = _read(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    return fuzzy_neardup_pairs(ds, num_partitions=16)


def _q_orders_heavy(sf_dir: str):
    """SEMI join (SQL EXISTS): orders having at least one lineitem
    with quantity > 45 (functions/joins.semi_join) — right side
    collapses to distinct keys map-side, one inner hash join against
    the key-only marker, no right payload ever ships. Price emitted
    as exact cents."""
    import ray.data as rd
    from ksoup_ray.functions.joins import semi_join
    orders = _read(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_orderpriority", "o_totalprice"])
    items = _read(f"{sf_dir}/lineitem.parquet",
                            columns=["l_orderkey", "l_quantity"])
    heavy = items.map_batches(
        lambda b: b.filter(pc.greater(b.column("l_quantity"), 45.0))
        .select(["l_orderkey"]), batch_format="pyarrow")
    out = semi_join(orders, heavy, left_on="o_orderkey",
                    right_on="l_orderkey")

    def cents(batch: pa.Table) -> pa.Table:
        c = np.round(batch.column("o_totalprice")
                     .to_numpy(zero_copy_only=False)
                     * 100).astype(np.int64)
        return pa.table({
            "o_orderkey": batch.column("o_orderkey"),
            "o_orderpriority": batch.column("o_orderpriority"),
            "cents": pa.array(c, pa.int64()),
        })

    return out.map_batches(cents, batch_format="pyarrow")


def _q_rolling_value_sum(sf_dir: str):
    """Bounded window frame — SUM(value) OVER (PARTITION BY user
    ORDER BY ts, event_id ROWS 3 PRECEDING..CURRENT)
    (functions/agg.window_frame_sum): per-row int micros, segment-
    clamped cumulative-sum kernel per co-partitioned block."""
    import ray.data as rd
    from ksoup_ray.functions.agg import window_frame_sum
    ds = _read(f"{sf_dir}/events.parquet",
                         columns=["event_id", "user_id", "ts",
                                  "value"])
    return window_frame_sum(ds, num_partitions=32)


def _q_longest_docs(sf_dir: str):
    """Per-(lang, source) ARGMAX row (functions/agg.grouped_argmax):
    the longest document per stratum, ties toward the smallest
    doc_id — one best row per key per batch rides the fold, never
    the corpus."""
    import ray.data as rd
    from ksoup_ray.functions.agg import grouped_argmax
    ds = _read(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "lang", "source",
                                  "n_chars"])
    return grouped_argmax(ds, key_cols=["lang", "source"],
                          val_col="n_chars", id_col="doc_id")


def _q_bfs_2hop(sf_dir: str):
    """Broadcast BFS seed expansion (functions/graph.bfs_frontier):
    min-hop labels within 2 hops of the doc_id%97==0 seed set over
    parsed crawl edges. The id-only edge list is materialized ONCE so
    the per-hop membership filters never re-run the HTML parse."""
    from ksoup_ray.functions.graph import bfs_frontier
    edges = _q_link_edges(sf_dir).materialize()
    import pyarrow.parquet as pq
    ids = pq.read_table(f"{sf_dir}/documents.parquet",
                        columns=["doc_id"]).column("doc_id")
    seeds = [i for i in ids.to_pylist() if i % 97 == 0]
    return bfs_frontier(edges, seeds, max_hops=2)


def _q_bpe_pairs(sf_dir: str):
    """First BPE-training iteration (functions/curation.
    bpe_pair_counts): top-20 adjacent in-word character pairs — each
    batch ships one fixed 64Ki histogram (map-side combine to
    constant size), driver ranks (count desc, pair asc)."""
    import ray.data as rd
    from ksoup_ray.functions.curation import bpe_pair_counts
    ds = _read(f"{sf_dir}/documents.parquet",
                         columns=["text"])
    return bpe_pair_counts(ds, k=20)


def _q_dedup_reps(sf_dir: str):
    """Cluster-representative selection — the step AFTER near-dup
    clustering: per connected component, keep the best document
    (longest, ties to smallest id). Composed: LSH → verified pairs →
    components (the dedup_components pipeline) → id-only hash join to
    fetch n_chars → functions/agg.argmax_per_key (component keys are
    corpus-scale, so the winner is picked by a bounded-bucket block
    kernel, never a driver fold)."""
    import ray.data as rd
    from ksoup_ray.functions.agg import argmax_per_key
    from ksoup_ray.pipelines.curate import _auto_partitions
    comp = _q_dedup_components(sf_dir)
    docs = _read(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "n_chars"])
    joined = comp.join(docs, join_type="inner",
                       num_partitions=_auto_partitions(),
                       on=("node_id",), right_on=("doc_id",))
    best = argmax_per_key(joined, key_col="component_id",
                          val_col="n_chars", id_col="node_id",
                          num_partitions=32)
    return best.map_batches(
        lambda b: b.rename_columns(["component_id", "rep_id",
                                    "n_chars"]),
        batch_format="pyarrow")


def _q_length_quartiles(sf_dir: str):
    """Exact per-language discrete quartiles
    (functions/curation.grouped_quantiles): ceil(q·N)-th smallest via
    ONE bounded (lang × n_chars) histogram — no sort anywhere, no
    interpolation hazard."""
    import ray.data as rd
    from ksoup_ray.functions.curation import grouped_quantiles
    ds = _read(f"{sf_dir}/documents.parquet",
                         columns=["lang", "n_chars"])
    return grouped_quantiles(ds, key_col="lang", val_col="n_chars")


def _q_window_uniques(sf_dir: str):
    """Distinct users per (event_type, tumbling hour)
    (functions/agg.windowed_distinct): exact two-stage distinct —
    map-side triple dedup, one triple groupby, one bounded count
    groupby; only id-sized rows ride either shuffle."""
    import ray.data as rd
    from ksoup_ray.functions.agg import windowed_distinct
    ds = _read(f"{sf_dir}/events.parquet",
                         columns=["event_type", "ts", "user_id"])
    return windowed_distinct(ds)


def _outline_pages(sf_dir: str):
    import ray.data as rd
    from ksoup_ray.sources.synth import render_outline_page
    ds = _read(f"{sf_dir}/documents.parquet",
                         columns=["doc_id"])

    def render(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "html": pa.array([render_outline_page(i) for i in ids],
                             pa.string())})

    return ds.map_batches(render, batch_format="pyarrow")


def _q_headings_outline(sf_dir: str):
    """Heading outline scrape (stages/extract.OutlineStage): one row
    per h1/h2/h3 in document order with position, level, text — the
    jsoup table-of-contents recipe, value-checked closed-form."""
    from ksoup_ray.stages.extract import OutlineStage
    return _outline_pages(sf_dir).map_batches(
        OutlineStage, batch_format="pyarrow", concurrency=(1, 4))


def _q_img_alt_audit(sf_dir: str):
    """Image alt-text accessibility audit (stages/extract.
    ImgAuditStage): per doc, total <img> count and how many lack the
    alt ATTRIBUTE (presence test, alt=\"\" counts as present)."""
    from ksoup_ray.stages.extract import ImgAuditStage
    return _outline_pages(sf_dir).map_batches(
        ImgAuditStage, batch_format="pyarrow", concurrency=(1, 4))


def _q_meta_robots(sf_dir: str):
    """Crawl-directive flags (stages/extract.MetaRobotsStage):
    meta[name=robots] presence + noindex/nofollow token scan — the
    indexability sweep a crawl pipeline runs before training-data
    selection."""
    from ksoup_ray.stages.extract import MetaRobotsStage
    return _outline_pages(sf_dir).map_batches(
        MetaRobotsStage, batch_format="pyarrow", concurrency=(1, 4))


def _q_median_interp(sf_dir: str):
    """Interpolated (PERCENTILE_CONT) per-language median, kept
    EXACT: report v_lo + v_hi (the two middle elements; equal when N
    is odd) so 2×median = v_lo + v_hi with no float division —
    DuckDB's quantile_cont(0.5)*2 matches bit-for-bit for integer
    inputs. Same bounded-histogram machinery as grouped_quantiles."""
    import math

    import ray.data as rd
    from ray.data.aggregate import Sum
    ds = _read(f"{sf_dir}/documents.parquet",
                         columns=["lang", "n_chars"])

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.select(["lang", "n_chars"]).to_pandas()
        g = df.groupby(["lang", "n_chars"], sort=False).size() \
            .reset_index(name="partial")
        g["partial"] = g["partial"].astype(np.int64)
        return pa.Table.from_pandas(g, preserve_index=False)

    hist = (ds.map_batches(partial, batch_format="pyarrow")
            .groupby(["lang", "n_chars"])
            .aggregate(Sum("partial", alias_name="n"))
            .to_pandas())
    out = []
    for lang, grp in hist.groupby("lang", sort=True):
        grp = grp.sort_values("n_chars")
        total = int(grp["n"].sum())
        cum = grp["n"].cumsum()
        # 0-indexed middle positions (N-1)//2 and N//2
        lo = int(grp.loc[cum >= (total - 1) // 2 + 1,
                         "n_chars"].iloc[0])
        hi = int(grp.loc[cum >= total // 2 + 1, "n_chars"].iloc[0])
        out.append((lang, lo + hi))
    return pd.DataFrame(out, columns=["lang", "median_x2"]) \
        .astype({"median_x2": np.int64})


def _q_emb_stats(sf_dir: str):
    """Per-vector list-column statistics (dim, min, max, L1 norm in
    exact trunc-micros) — the embedding-hygiene sweep (NaN/dim
    audits) as pure Arrow list kernels: one flatten + offset-segmented
    numpy reduceat per batch, no shuffle, no Python per row."""
    import ray.data as rd
    ds = _read(f"{sf_dir}/embeddings.parquet",
                         columns=["vec_id", "embedding"])

    def stats(batch: pa.Table) -> pa.Table:
        col = batch.column("embedding").combine_chunks()
        flat = col.flatten().to_numpy(zero_copy_only=False)
        offsets = np.asarray(col.offsets)[:-1].astype(np.int64)
        dim = pc.cast(pc.list_value_length(col), pa.int64())
        # trunc-micros per element BEFORE the segmented sums (the
        # scaled-float32 TRUNC convention — no half-tie hazard)
        e6 = np.trunc(flat.astype(np.float64) * 10**6).astype(np.int64)
        return pa.table({
            "vec_id": batch.column("vec_id"),
            "dim": dim,
            "min_e6": pa.array(np.minimum.reduceat(e6, offsets),
                               pa.int64()),
            "max_e6": pa.array(np.maximum.reduceat(e6, offsets),
                               pa.int64()),
            "l1_e6": pa.array(np.add.reduceat(np.abs(e6), offsets),
                              pa.int64()),
        })

    return ds.map_batches(stats, batch_format="pyarrow")


def _q_hash_features(sf_dir: str):
    """Hashing-trick featurization (the sklearn HashingVectorizer /
    Vowpal-Wabbit primitive): per document, word counts folded into a
    FIXED 64-bucket space via md5 — long-form (doc_id, bucket, n)
    output, schema static at any vocabulary size. Per batch: one
    pandas split+explode, md5 on the batch's UNIQUE words only
    (vocabulary-sized, not token-sized), vectorized bucket map +
    groupby. No shuffle — doc-local counts."""
    import hashlib

    import ray.data as rd
    ds = _read(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])

    def featurize(batch: pa.Table) -> pa.Table:
        df = batch.select(["doc_id", "text"]).to_pandas()
        words = df["text"].str.split(" ")
        long = df[["doc_id"]].join(words.rename("w")).explode("w")
        long = long[long["w"].astype(str).str.len() > 0]
        uniq = long["w"].unique()
        bucket_of = {
            w: int(hashlib.md5(w.encode()).hexdigest()[:8], 16) % 64
            for w in uniq}
        long["bucket"] = long["w"].map(bucket_of).astype(np.int64)
        out = long.groupby(["doc_id", "bucket"], sort=False) \
            .size().reset_index(name="n")
        out["n"] = out["n"].astype(np.int64)
        return pa.Table.from_pandas(out, preserve_index=False)

    return ds.map_batches(featurize, batch_format="pyarrow")


def _q_length_outliers(sf_dir: str):
    """Per-group 1.5σ outlier filter — the anomaly-screening step a
    curation pipeline runs after normalization: keep docs whose
    per-language length z-score magnitude exceeds 1.5 (in the exact
    int-micro convention of zscore_by_lang, so the filter boundary is
    bit-identical on both sides). Composes grouped_zscore (broadcast
    moments, zero corpus shuffles) with one vectorized filter."""
    import ray.data as rd
    from ksoup_ray.functions.agg import grouped_zscore
    ds = _read(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "lang", "n_chars"])
    scored = grouped_zscore(ds, key_col="lang", val_col="n_chars")
    return scored.map_batches(
        lambda b: b.filter(pc.greater(
            pc.abs(b.column("z_micros")), 1_500_000)),
        batch_format="pyarrow")


def _q_dense_ranks(sf_dir: str):
    """Per-language DENSE_RANK of document length
    (functions/agg.grouped_dense_rank): 1 + count of smaller distinct
    values, read off the bounded cross-tab grid broadcast once — no
    per-group sort, no corpus shuffle."""
    import ray.data as rd
    from ksoup_ray.functions.agg import grouped_dense_rank
    ds = _read(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "lang", "n_chars"])
    return grouped_dense_rank(ds, key_col="lang", val_col="n_chars",
                              id_col="doc_id")


def _q_page2_docs(sf_dir: str):
    """Keyset-free pagination — global ORDER BY (n_chars DESC,
    doc_id) LIMIT 10 OFFSET 10, i.e. result page 2: each block keeps
    only its own top-20 (lossless — a global top-20 row is a top-20
    row of its block), the driver merges the tiny survivors and
    slices rows 10..19. No global sort of the corpus; the shuffle
    carries ≤ 20 × blocks id-rows."""
    import ray.data as rd
    ds = _read(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "n_chars"])

    def local_top(batch: pa.Table) -> pa.Table:
        idx = pc.select_k_unstable(
            batch, k=min(20, batch.num_rows),
            sort_keys=[("n_chars", "descending"),
                       ("doc_id", "ascending")])
        return batch.take(idx)

    parts = ds.map_batches(local_top,
                           batch_format="pyarrow").to_pandas()
    parts = parts.sort_values(["n_chars", "doc_id"],
                              ascending=[False, True],
                              kind="mergesort")
    return parts.iloc[10:20].reset_index(drop=True)


def _q_revenue_share(sf_dir: str):
    """Percent-of-total window (SUM / SUM() OVER ()) in exact integer
    parts-per-million: monthly revenue cents over one bounded
    groupby, grand total folded on the driver (|months| rows), share
    = cents*1e6 // total with the same floor division on both
    sides."""
    total_e6 = 10**6
    monthly = _q_monthly_revenue(sf_dir).to_pandas()
    total = int(monthly["revenue_cents"].sum())
    monthly["share_ppm"] = (
        monthly["revenue_cents"].astype(object) * total_e6 // total
    ).astype(np.int64)
    out = monthly[["o_year", "o_month", "revenue_cents",
                   "share_ppm"]]
    return out.reset_index(drop=True)


def _q_regex_extract(sf_dir: str):
    """First-match capture-group extraction (Arrow
    ``pc.extract_regex`` — RE2 leftmost first match, same as DuckDB
    ``regexp_extract``): per doc, the first vowel run and a matched
    flag; Arrow's no-match null is mapped to '' to mirror DuckDB's
    empty-string convention. Zero-copy, no shuffle."""
    import ray.data as rd
    ds = _read(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])

    def extract(batch: pa.Table) -> pa.Table:
        m = pc.extract_regex(batch.column("text"),
                             pattern="(?P<m>[aeiou]{2,})")
        run = pc.fill_null(pc.struct_field(m, "m"), "")
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "first_run": run,
            "matched": pc.cast(pc.not_equal(run, ""), pa.int64()),
        })

    return ds.map_batches(extract, batch_format="pyarrow")


def _q_drift_union(sf_dir: str):
    """Schema-drift-tolerant union — the multi-generation crawl-shard
    reality: shard A carries (doc_id, text, lang), shard B the same
    data REORDERED plus an extra crawl_ts column. Both are written to
    a fresh scratch dir, read back independently, normalized to the
    common column set AT THE READ (select_columns before union — Ray
    requires congruent schemas, and at 100 TB you normalize per shard
    generation, never rewrite old shards), then unioned. Oracle: the
    union must reproduce documents(doc_id, lang) exactly."""
    import tempfile

    import ray.data as rd
    base = _read(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text", "lang"])
    root = tempfile.mkdtemp(prefix="ksoup_drift_")

    def even(batch: pa.Table) -> pa.Table:
        keep = batch.filter(pc.equal(
            pc.bit_wise_and(batch.column("doc_id"),
                            pa.scalar(1, pa.int64())), 0))
        return keep.select(["doc_id", "text", "lang"])

    def odd(batch: pa.Table) -> pa.Table:
        keep = batch.filter(pc.equal(
            pc.bit_wise_and(batch.column("doc_id"),
                            pa.scalar(1, pa.int64())), 1))
        return pa.table({
            "lang": keep.column("lang"),
            "crawl_ts": pc.multiply(keep.column("doc_id"),
                                    pa.scalar(1000, pa.int64())),
            "doc_id": keep.column("doc_id"),
            "text": keep.column("text"),
        })

    base.map_batches(even, batch_format="pyarrow") \
        .write_parquet(f"{root}/gen_a")
    base.map_batches(odd, batch_format="pyarrow") \
        .write_parquet(f"{root}/gen_b")
    a = _read(f"{root}/gen_a", columns=["doc_id", "lang"])
    b = _read(f"{root}/gen_b", columns=["doc_id", "lang"])
    return a.select_columns(["doc_id", "lang"]) \
        .union(b.select_columns(["doc_id", "lang"]))


def _q_q6_forecast(sf_dir: str):
    """TPC-H Q6 revenue-change forecast — the predicate-pushdown
    showcase: the date/discount/quantity filters are passed to
    ``read_parquet`` as a pyarrow dataset expression, so row groups
    that can't match never leave storage (the brief's prune-at-the-
    read rule); the surviving rows reduce to one exact-integer sum
    (cents × discount-bp per row, then one global fold)."""
    import pyarrow.dataset as pads
    import ray.data as rd
    f = ((pads.field("l_shipdate") >= pa.scalar(
        np.datetime64("1996-01-01", "us")))
        & (pads.field("l_shipdate") < pa.scalar(
            np.datetime64("1997-01-01", "us")))
        & (pads.field("l_discount") >= 0.05)
        & (pads.field("l_discount") <= 0.07)
        & (pads.field("l_quantity") < 24.0))
    ds = _read(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_extendedprice", "l_discount"], filter=f)

    def partial(batch: pa.Table) -> pa.Table:
        cents = np.round(batch.column("l_extendedprice")
                         .to_numpy(zero_copy_only=False)
                         * 100).astype(np.int64)
        bp = np.round(batch.column("l_discount")
                      .to_numpy(zero_copy_only=False)
                      * 100).astype(np.int64)
        return pa.table({"partial": pa.array([int((cents * bp).sum())],
                                             pa.int64())})

    parts = ds.map_batches(partial, batch_format="pyarrow") \
        .to_pandas()
    return pd.DataFrame({
        "revenue_e4": [np.int64(parts["partial"].sum())]})


def _q_events_heatmap(sf_dir: str):
    """Calendar heatmap counts — events per (ISO weekday, hour):
    vectorized Arrow temporal kernels + the one bounded cross-tab
    (168 cells max at any corpus size)."""
    import ray.data as rd
    from ksoup_ray.functions.agg import crosstab_counts
    ds = _read(f"{sf_dir}/events.parquet", columns=["ts"])

    def parts(batch: pa.Table) -> pa.Table:
        ts = batch.column("ts")
        return pa.table({
            "dow": pc.cast(pc.day_of_week(ts), pa.int64()),
            "hour": pc.cast(pc.hour(ts), pa.int64()),
        })

    return crosstab_counts(ds.map_batches(parts,
                                          batch_format="pyarrow"),
                           ["dow", "hour"])


def _q_q19_disjunctive(sf_dir: str):
    """TPC-H Q19-style disjunctive-predicate join: revenue over
    lineitem × part where EITHER of two (brand, size-range,
    quantity-range) conjunctions holds. The part side is a dimension
    table at any scale, so it broadcasts once (``ray.put`` of two
    dense partkey→attr arrays) and every lineitem batch evaluates the
    OR-of-ANDs as one vectorized boolean expression — ZERO shuffles;
    the fact table is read once with pruned columns. Exact
    cents×(100−discount-bp) revenue convention."""
    import ray

    import pyarrow.parquet as pq
    import ray.data as rd
    part = pq.read_table(f"{sf_dir}/part.parquet",
                         columns=["p_partkey", "p_brand", "p_size"])
    pk = part.column("p_partkey").to_numpy()
    cap = int(pk.max()) + 1
    brand = np.zeros(cap, np.int32)
    size = np.zeros(cap, np.int32)
    bmap = {"Brand#1": 1, "Brand#2": 2}
    brand[pk] = [bmap.get(b, 0)
                 for b in part.column("p_brand").to_pylist()]
    size[pk] = part.column("p_size").to_numpy()
    dim_ref = ray.put((brand, size))

    ds = _read(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_partkey", "l_quantity", "l_extendedprice",
                 "l_discount"])

    def partial(batch: pa.Table) -> pa.Table:
        b, s = ray.get(dim_ref)
        keys = batch.column("l_partkey").to_numpy()
        qty = batch.column("l_quantity").to_numpy()
        pb, ps = b[keys], s[keys]
        m1 = (pb == 1) & (ps >= 1) & (ps <= 15) \
            & (qty >= 1) & (qty <= 20)
        m2 = (pb == 2) & (ps >= 10) & (ps <= 30) \
            & (qty >= 10) & (qty <= 30)
        m = m1 | m2
        cents = np.round(batch.column("l_extendedprice")
                         .to_numpy(zero_copy_only=False)[m]
                         * 100).astype(np.int64)
        keep_bp = 100 - np.round(
            batch.column("l_discount")
            .to_numpy(zero_copy_only=False)[m] * 100).astype(np.int64)
        return pa.table({
            "partial": pa.array([int((cents * keep_bp).sum())],
                                pa.int64()),
            "n": pa.array([int(m.sum())], pa.int64()),
        })

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    return pd.DataFrame({
        "revenue_e4": [np.int64(parts["partial"].sum())],
        "n_items": [np.int64(parts["n"].sum())]})


_CATALOG_TABLES = ("region", "nation", "customer", "supplier",
                   "part", "orders", "lineitem", "events",
                   "documents", "embeddings")


def _q_catalog_audit(sf_dir: str):
    """Metadata-only catalog audit — row and column counts for every
    table from Parquet FOOTERS alone (``pq.read_metadata``): zero data
    bytes leave storage, the audit cost is O(files), not O(corpus).
    The first thing a 100 TB job runs to sanity-check its inputs."""
    import pyarrow.parquet as pq
    rows = []
    for t in _CATALOG_TABLES:
        md = pq.read_metadata(f"{sf_dir}/{t}.parquet")
        rows.append((t, md.num_rows, md.num_columns))
    out = pd.DataFrame(rows, columns=["tbl", "n_rows", "n_cols"])
    return out.astype({"n_rows": np.int64, "n_cols": np.int64})


def _q_winsorize_lengths(sf_dir: str):
    """Per-group winsorization — clip each document's length at its
    language's P90 (the outlier-capping step before length-sensitive
    training statistics). Composes grouped_quantiles' exact
    ceil(q·N)-rule P90 (one bounded histogram) broadcast into a
    vectorized per-batch LEAST — the corpus never shuffles."""
    import ray

    import ray.data as rd
    from ksoup_ray.functions.curation import grouped_quantiles
    ds = _read(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "lang", "n_chars"])
    q90 = grouped_quantiles(ds, key_col="lang", val_col="n_chars",
                            qs=(0.9,))
    cap_ref = ray.put(dict(zip(q90["lang"], q90["q90"].astype(int))))

    def clip(batch: pa.Table) -> pa.Table:
        caps = ray.get(cap_ref)
        langs = batch.column("lang").to_pylist()
        cap = np.fromiter((caps[l] for l in langs), np.int64,
                          len(langs))
        n = batch.column("n_chars").to_numpy(zero_copy_only=False)
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "lang": batch.column("lang"),
            "n_clipped": pa.array(np.minimum(n, cap), pa.int64()),
        })

    return ds.map_batches(clip, batch_format="pyarrow")


def _q_cumulative_users(sf_dir: str):
    """Cumulative user-growth curve: per day, how many users appear
    for the FIRST time and the running total — the adoption-curve
    primitive. One id-only groupby (per-user min event time), one
    bounded per-day histogram, a driver cumsum over |days| rows."""
    import ray.data as rd
    from ray.data.aggregate import Min
    ds = _read(f"{sf_dir}/events.parquet",
                         columns=["user_id", "ts"])

    def keyed(batch: pa.Table) -> pa.Table:
        us = batch.column("ts").cast(pa.timestamp("us")) \
            .cast(pa.int64())
        return pa.table({"user_id": batch.column("user_id"),
                         "t": us})

    first = (ds.map_batches(keyed, batch_format="pyarrow")
             .groupby("user_id").aggregate(Min("t", alias_name="t0")))

    def day_partial(batch: pa.Table) -> pa.Table:
        day = pc.divide(batch.column("t0"),
                        pa.scalar(86_400_000_000, pa.int64()))
        t = pa.table({"day": day})
        g = t.group_by(["day"]).aggregate([("day", "count")])
        return pa.table({
            "day": g.column("day"),
            "partial": g.column("day_count").cast(pa.int64()),
        })

    from ray.data.aggregate import Sum
    per_day = (first.map_batches(day_partial, batch_format="pyarrow")
               .groupby("day")
               .aggregate(Sum("partial", alias_name="n_new"))
               .to_pandas().sort_values("day"))
    per_day["n_cum"] = per_day["n_new"].cumsum().astype(np.int64)
    per_day["n_new"] = per_day["n_new"].astype(np.int64)
    return per_day.reset_index(drop=True)


def _q_bigram_logprob(sf_dir: str):
    """Joint bigram corpus-LM score (functions/curation.
    bigram_logprob): the order-sensitive LM signal — same
    co-partitioned vocab shape as unigram_logprob with the (larger)
    bigram vocabulary; per-gram int-micro contributions, order-free
    sums, exact SQL parity."""
    import ray.data as rd
    from ksoup_ray.functions.curation import bigram_logprob
    ds = _read(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    return bigram_logprob(ds)


def _q_prep_report(sf_dir: str):
    """End-to-end training-data prep report — the number a data lead
    actually signs off on: CURATED survivors (exact dedup → verified
    near-dup drop → lang/token filters, pipelines/curate) are
    assigned their md5 train/val/test split and reduced to per-split
    document and token budgets. One lazy DAG: the curation pipeline's
    single payload anti-join plus one bounded 3-row groupby."""
    import ray.data as rd
    from ray.data.aggregate import Count, Sum
    from ksoup_ray.functions.splits import _md5_bucket_fraction
    from ksoup_ray.pipelines.curate import curate_documents
    ds = _read(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text", "lang"])
    survivors = curate_documents(ds)

    def tag_split(batch: pa.Table) -> pa.Table:
        bf = _md5_bucket_fraction(
            batch.column("doc_id").to_pylist())
        split = np.where(bf < 0.8, "train",
                         np.where(bf < 0.9, "val", "test"))
        return pa.table({
            "split": pa.array(split, pa.string()),
            "token_count": batch.column("token_count"),
        })

    return (survivors.map_batches(tag_split, batch_format="pyarrow")
            .groupby("split")
            .aggregate(Count(alias_name="n_docs"),
                       Sum("token_count", alias_name="total_tokens")))


def _q_first_occurrence(sf_dir: str):
    """First-occurrence offset of a literal substring per document
    (Arrow ``pc.find_substring`` — byte-vectorized two-way search, -1
    when absent, mirroring DuckDB ``strpos - 1``). The
    snippet-anchoring primitive. No shuffle."""
    import ray.data as rd
    ds = _read(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])

    def find(batch: pa.Table) -> pa.Table:
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "idx_data": pc.cast(pc.find_substring(
                batch.column("text"), "data"), pa.int64()),
            "idx_join": pc.cast(pc.find_substring(
                batch.column("text"), "join"), pa.int64()),
        })

    return ds.map_batches(find, batch_format="pyarrow")


def _q_word_len_hist(sf_dir: str):
    """Corpus-wide word-length histogram — the tokenizer-sizing
    diagnostic. Each batch collapses to a bounded (length, count)
    partial via one explode + bincount; ONE groupby over the tiny
    length domain finishes."""
    import ray.data as rd
    from ray.data.aggregate import Sum
    ds = _read(f"{sf_dir}/documents.parquet",
                         columns=["text"])

    def partial(batch: pa.Table) -> pa.Table:
        s = batch.column("text").to_pandas().fillna("")
        lens = s.str.split(" ").explode().str.len() \
            .to_numpy(dtype=np.int64)
        counts = np.bincount(lens)
        nz = np.flatnonzero(counts)
        return pa.table({
            "wlen": pa.array(nz.astype(np.int64)),
            "partial": pa.array(counts[nz], pa.int64()),
        })

    return (ds.map_batches(partial, batch_format="pyarrow")
            .groupby("wlen")
            .aggregate(Sum("partial", alias_name="n")))


def _q_incremental_dedup(sf_dir: str):
    """Cross-snapshot incremental dedup over a SHARDED MUTABLE INDEX
    (state/index.py — the brief's raw-Ray-actors case): snapshot A
    (even docs) registers fingerprints into N index actors; snapshot
    B (odd docs, with every doc_id%5==1 row carrying the PREVIOUS
    doc's text — known overlap) streams through a vectorized
    membership filter, then the join-free drop-set kernel picks
    min-id winners within B. Test-harness note: B's overlap rewrite
    is query-local synthesis (a ray.put dict of the few replaced
    texts); the operator under test is state/index.incremental_dedup."""
    import ray

    import pyarrow.parquet as pq
    import ray.data as rd
    from ksoup_ray.state.index import incremental_dedup

    full = pq.read_table(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    ids = full.column("doc_id").to_numpy()
    texts = full.column("text").to_pylist()
    by_id = dict(zip(ids.tolist(), texts))
    repl = {int(i): by_id[int(i) - 1] for i in ids
            if i % 2 == 1 and i % 5 == 1 and int(i) - 1 in by_id}
    repl_ref = ray.put(repl)

    base = _read(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text"])
    prev = base.map_batches(
        lambda b: b.filter(pc.equal(pc.bit_wise_and(
            b.column("doc_id"), pa.scalar(1, pa.int64())), 0)),
        batch_format="pyarrow")

    def make_new(batch: pa.Table) -> pa.Table:
        rep = ray.get(repl_ref)
        keep = batch.filter(pc.equal(pc.bit_wise_and(
            batch.column("doc_id"), pa.scalar(1, pa.int64())), 1))
        ids = keep.column("doc_id").to_pylist()
        txt = keep.column("text").to_pylist()
        txt = [rep.get(i, t) for i, t in zip(ids, txt)]
        return pa.table({"doc_id": pa.array(ids, pa.int64()),
                         "text": pa.array(txt, pa.string())})

    new = base.map_batches(make_new, batch_format="pyarrow")
    return incremental_dedup(prev, new, n_shards=4,
                             num_partitions=16)


def _q_minmax_scale(sf_dir: str):
    """Per-group MIN-MAX normalization to [0, 1e6] in exact integer
    arithmetic — the bounded-feature companion of zscore_by_lang:
    scaled = (x - min) * 1e6 // (max - min), floor division on both
    sides. Group extrema come from ONE bounded groupby (Min/Max of
    int64), broadcast in the scoring closure; the corpus never
    shuffles."""
    import ray

    import ray.data as rd
    from ray.data.aggregate import Max, Min
    ds = _read(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "lang", "n_chars"])
    ext = ds.groupby("lang").aggregate(
        Min("n_chars", alias_name="lo"),
        Max("n_chars", alias_name="hi")).to_pandas()
    ext_ref = ray.put({
        r["lang"]: (int(r["lo"]), int(r["hi"]))
        for _, r in ext.iterrows()})

    def scale(batch: pa.Table) -> pa.Table:
        m = ray.get(ext_ref)
        langs = batch.column("lang").to_pylist()
        lo = np.fromiter((m[l][0] for l in langs), np.int64,
                         len(langs))
        hi = np.fromiter((m[l][1] for l in langs), np.int64,
                         len(langs))
        x = batch.column("n_chars").to_numpy(zero_copy_only=False)
        span = np.maximum(hi - lo, 1)
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "lang": batch.column("lang"),
            "scaled_ppm": pa.array((x - lo) * 10**6 // span,
                                   pa.int64()),
        })

    return ds.map_batches(scale, batch_format="pyarrow")


def _q_event_transitions(sf_dir: str):
    """Behavioral Markov transitions: global counts of (previous
    event_type → event_type) per user stream ordered by (ts,
    event_id) — the session-model training statistic. Same
    one-bucket-shuffle segmented shape as lag_gaps, then each block's
    transitions collapse to a bounded (from, to) partial and ONE tiny
    cross-tab groupby finishes."""
    import ray.data as rd
    from ray.data.aggregate import Sum
    from ksoup_ray.functions._blocks import pk_column
    ds = _read(f"{sf_dir}/events.parquet",
                         columns=["event_id", "user_id", "ts",
                                  "event_type"])

    def add_pk(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "_pk", pk_column(batch.column("user_id"), 32))

    def trans_block(block: pd.DataFrame) -> pd.DataFrame:
        block = block.sort_values(["user_id", "ts", "event_id"],
                                  kind="mergesort")
        users = block["user_id"].to_numpy()
        types = block["event_type"].to_numpy(dtype=object)
        same = users[1:] == users[:-1]
        g = pd.DataFrame({
            "from_type": types[:-1][same],
            "to_type": types[1:][same],
        }).groupby(["from_type", "to_type"], sort=False) \
            .size().reset_index(name="partial")
        g["partial"] = g["partial"].astype(np.int64)
        return g

    return (ds.map_batches(add_pk, batch_format="pyarrow")
            .groupby("_pk")
            .map_groups(trans_block, batch_format="pandas")
            .groupby(["from_type", "to_type"])
            .aggregate(Sum("partial", alias_name="n")))


def _q_time_to_purchase(sf_dir: str):
    """Time-to-first-purchase per user in exact integer microseconds
    (first purchase ts − first event ts; users who never purchase are
    excluded) — the conversion-latency metric. Map-side partials
    carry two int64 minima per (user, batch) (missing purchase =
    int64 max sentinel), ONE groupby(Min, Min) folds them, a final
    vectorized filter drops the sentinels."""
    import ray.data as rd
    from ray.data.aggregate import Min
    ds = _read(f"{sf_dir}/events.parquet",
                         columns=["user_id", "ts", "event_type"])
    SENT = np.iinfo(np.int64).max

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        tus = df["ts"].to_numpy().astype("datetime64[us]") \
            .astype(np.int64)
        df = pd.DataFrame({
            "user_id": df["user_id"].to_numpy(),
            "t_all": tus,
            "t_buy": np.where(
                (df["event_type"] == "purchase").to_numpy(),
                tus, SENT),
        })
        g = df.groupby("user_id", sort=False).min().reset_index()
        return pa.Table.from_pandas(g, preserve_index=False)

    folded = (ds.map_batches(partial, batch_format="pyarrow")
              .groupby("user_id")
              .aggregate(Min("t_all", alias_name="t_all"),
                         Min("t_buy", alias_name="t_buy")))

    def finish(batch: pa.Table) -> pa.Table:
        keep = batch.filter(pc.not_equal(batch.column("t_buy"),
                                         pa.scalar(SENT, pa.int64())))
        return pa.table({
            "user_id": keep.column("user_id"),
            "delta_us": pc.subtract(keep.column("t_buy"),
                                    keep.column("t_all")),
        })

    return folded.map_batches(finish, batch_format="pyarrow")


def _q_sessions_per_user_hist(sf_dir: str):
    """Engagement distribution: histogram of session counts per user
    — composes the sessionize kernel (one bounded bucket shuffle)
    with two bounded aggregations (sessions → per-user count →
    count-of-counts). The DAU/engagement-tiering primitive."""
    import ray.data as rd
    from ray.data.aggregate import Count, Sum
    from ksoup_ray.functions.agg import sessionize
    ds = _read(f"{sf_dir}/events.parquet",
                         columns=["user_id", "ts"])
    sessions = sessionize(ds, num_partitions=32)
    per_user = sessions.groupby("user_id").aggregate(
        Count(alias_name="n_sessions"))

    def hist_partial(batch: pa.Table) -> pa.Table:
        g = pa.table({"n_sessions": batch.column("n_sessions")}) \
            .group_by(["n_sessions"]) \
            .aggregate([("n_sessions", "count")])
        return pa.table({
            "n_sessions": g.column("n_sessions"),
            "partial": g.column("n_sessions_count").cast(pa.int64()),
        })

    return (per_user.map_batches(hist_partial, batch_format="pyarrow")
            .groupby("n_sessions")
            .aggregate(Sum("partial", alias_name="n_users")))


def _q_mom_change(sf_dir: str):
    """Month-over-month revenue delta — LAG over the calendar series:
    the distributed work is the one bounded monthly groupby
    (_q_monthly_revenue); the |months|-row LAG runs on the driver in
    exact cents. First month is excluded (LAG null), matching the
    SQL."""
    monthly = _q_monthly_revenue(sf_dir).to_pandas() \
        .sort_values(["o_year", "o_month"]).reset_index(drop=True)
    prev = monthly["revenue_cents"].shift(1)
    out = monthly.assign(
        delta_cents=(monthly["revenue_cents"] - prev)).iloc[1:]
    out = out[["o_year", "o_month", "revenue_cents", "delta_cents"]]
    return out.astype({"delta_cents": np.int64}) \
        .reset_index(drop=True)


def _q_doc_vocab_richness(sf_dir: str):
    """Per-document vocabulary richness — distinct words and the
    type/token ratio in exact integer ppm (distinct·1e6 // total):
    the lexical-diversity quality signal. Doc-local: one explode +
    per-doc nunique per batch, no shuffle."""
    import ray.data as rd
    ds = _read(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])

    def richness(batch: pa.Table) -> pa.Table:
        df = batch.select(["doc_id", "text"]).to_pandas()
        words = df["text"].fillna("").str.split(" ")
        total = words.str.len().to_numpy(dtype=np.int64)
        long = df[["doc_id"]].join(words.rename("w")).explode("w")
        nuniq = long.groupby("doc_id", sort=False)["w"].nunique() \
            .reindex(df["doc_id"]).to_numpy(dtype=np.int64)
        ttr = nuniq * 10**6 // np.maximum(total, 1)
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "n_distinct": pa.array(nuniq, pa.int64()),
            "n_words": pa.array(total, pa.int64()),
            "ttr_ppm": pa.array(ttr, pa.int64()),
        })

    return ds.map_batches(richness, batch_format="pyarrow")


def _q_q4_priority(sf_dir: str):
    """TPC-H Q4-style order-priority check: how many orders in a
    half-year window had at least one line shipped >90 days after the
    order date. The EXISTS semijoin is algebrized as an AGGREGATE —
    ``EXISTS(shipdate > cutoff)`` ⟺ ``MAX(shipdate) > cutoff`` — so
    lineitem collapses map-side to one (orderkey, max_ship) row per
    key before the ONE large-large hash join; dates ride as int64
    epoch-micros so every comparison is exact integer math. Output is
    5 bounded rows (one per priority)."""
    import ray.data as rd
    from ray.data.aggregate import Max, Sum
    from ksoup_ray.pipelines.curate import _auto_partitions

    lo = pd.Timestamp("1996-07-01").value // 1000
    hi = pd.Timestamp("1997-01-01").value // 1000
    lag_us = 90 * 86400 * 1_000_000

    orders = _read(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_orderdate", "o_orderpriority"])

    def filter_orders(batch: pa.Table) -> pa.Table:
        date_us = batch.column("o_orderdate").cast(pa.int64())
        batch = batch.append_column("o_date_us", date_us)
        mask = pc.and_(pc.greater_equal(date_us, lo),
                       pc.less(date_us, hi))
        return batch.filter(mask).select(
            ["o_orderkey", "o_date_us", "o_orderpriority"])

    sel_orders = orders.map_batches(filter_orders,
                                    batch_format="pyarrow")

    li = _read(f"{sf_dir}/lineitem.parquet",
                         columns=["l_orderkey", "l_shipdate"])

    def ship_partial(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "l_orderkey": batch.column("l_orderkey").to_numpy(),
            "ship_us": batch.column("l_shipdate").cast(pa.int64())
            .to_numpy()})
        g = df.groupby("l_orderkey", as_index=False)["ship_us"].max()
        return pa.Table.from_pandas(g, preserve_index=False)

    max_ship = (li.map_batches(ship_partial, batch_format="pyarrow",
                               batch_size=65536)
                .groupby("l_orderkey")
                .aggregate(Max("ship_us", alias_name="ship_us")))

    joined = max_ship.join(sel_orders, join_type="inner",
                           num_partitions=_auto_partitions(),
                           on=("l_orderkey",),
                           right_on=("o_orderkey",))

    def late_partial(batch: pa.Table) -> pa.Table:
        late = pc.greater(batch.column("ship_us"),
                          pc.add(batch.column("o_date_us"),
                                 pa.scalar(lag_us, pa.int64())))
        df = pd.DataFrame({
            "o_orderpriority":
                batch.column("o_orderpriority").to_pylist(),
            "order_count": late.to_numpy(zero_copy_only=False)
            .astype(np.int64)})
        g = df.groupby("o_orderpriority", as_index=False).sum()
        return pa.Table.from_pandas(g[g["order_count"] > 0],
                                    preserve_index=False)

    counted = (joined.map_batches(late_partial, batch_format="pyarrow")
               .groupby("o_orderpriority")
               .aggregate(Sum("order_count",
                              alias_name="order_count")))
    return counted.sort("o_orderpriority")


def _q_q10_returns(sf_dir: str):
    """TPC-H Q10-style returned-item report: revenue lost to 'R'
    returns per customer in a quarter, top 20. Lineitem collapses
    map-side to exact (orderkey, revenue_e4) partials, ONE large-large
    hash join maps orderkey→custkey, a second bounded groupby folds to
    per-customer revenue, and the customer/nation DIMENSIONS broadcast
    once as a custkey→(name, nation) lookup (``ray.put``) — they never
    shuffle. Top-20 via sort on the already-tiny aggregate."""
    import ray

    import pyarrow.parquet as pq
    import ray.data as rd
    from ray.data.aggregate import Sum
    from ksoup_ray.pipelines.curate import _auto_partitions

    lo = pd.Timestamp("1996-01-01").value // 1000
    hi = pd.Timestamp("1996-04-01").value // 1000

    cust = pq.read_table(f"{sf_dir}/customer.parquet",
                         columns=["c_custkey", "c_name",
                                  "c_nationkey"])
    nation = pq.read_table(f"{sf_dir}/nation.parquet",
                           columns=["n_nationkey", "n_name"])
    nmap = dict(zip(nation.column("n_nationkey").to_pylist(),
                    nation.column("n_name").to_pylist()))
    dim_ref = ray.put({
        int(k): (nm, nmap[nk]) for k, nm, nk in
        zip(cust.column("c_custkey").to_pylist(),
            cust.column("c_name").to_pylist(),
            cust.column("c_nationkey").to_pylist())})

    li = _read(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_returnflag", "l_extendedprice",
                 "l_discount"])

    def rev_partial(batch: pa.Table) -> pa.Table:
        batch = batch.filter(
            pc.equal(batch.column("l_returnflag"), "R"))
        cents = np.round(batch.column("l_extendedprice")
                         .to_numpy(zero_copy_only=False)
                         * 100).astype(np.int64)
        keep = 100 - np.round(batch.column("l_discount")
                              .to_numpy(zero_copy_only=False)
                              * 100).astype(np.int64)
        df = pd.DataFrame({
            "l_orderkey": batch.column("l_orderkey").to_numpy(),
            "revenue_e4": cents * keep})
        g = df.groupby("l_orderkey", as_index=False).sum()
        return pa.Table.from_pandas(g, preserve_index=False)

    revenue = (li.map_batches(rev_partial, batch_format="pyarrow",
                              batch_size=65536)
               .groupby("l_orderkey")
               .aggregate(Sum("revenue_e4", alias_name="revenue_e4")))

    orders = _read(f"{sf_dir}/orders.parquet",
                             columns=["o_orderkey", "o_custkey",
                                      "o_orderdate"])

    def filter_orders(batch: pa.Table) -> pa.Table:
        date_us = batch.column("o_orderdate").cast(pa.int64())
        mask = pc.and_(pc.greater_equal(date_us, lo),
                       pc.less(date_us, hi))
        return batch.filter(mask).select(["o_orderkey", "o_custkey"])

    sel_orders = orders.map_batches(filter_orders,
                                    batch_format="pyarrow")

    joined = revenue.join(sel_orders, join_type="inner",
                          num_partitions=_auto_partitions(),
                          on=("l_orderkey",),
                          right_on=("o_orderkey",))
    per_cust = (joined.groupby("o_custkey")
                .aggregate(Sum("revenue_e4",
                               alias_name="revenue_e4")))

    def enrich(batch: pa.Table) -> pa.Table:
        dims = ray.get(dim_ref)
        keys = batch.column("o_custkey").to_pylist()
        names, nations = zip(*(dims[int(k)] for k in keys)) \
            if keys else ((), ())
        return pa.table({
            "c_custkey": batch.column("o_custkey").cast(pa.int64()),
            "c_name": pa.array(list(names), pa.string()),
            "n_name": pa.array(list(nations), pa.string()),
            "revenue_e4": batch.column("revenue_e4"),
        })

    return (per_cust.map_batches(enrich, batch_format="pyarrow")
            .sort(["revenue_e4", "c_custkey"],
                  descending=[True, False])
            .limit(20))


def _q_q12_priority_mix(sf_dir: str):
    """TPC-H Q12-style shipping/priority cross-check: per return
    flag, how many 1997-shipped lines belong to critical
    (URGENT/HIGH) vs other orders. Lineitem pre-aggregates map-side
    to (orderkey, flag, n_lines) — the join shuffle carries counts,
    never raw lines — then ONE large-large hash join attaches the
    order priority and a conditional partial sum folds to the bounded
    3-row answer."""
    import ray.data as rd
    from ray.data.aggregate import Sum
    from ksoup_ray.pipelines.curate import _auto_partitions

    lo = pd.Timestamp("1997-01-01").value // 1000
    hi = pd.Timestamp("1998-01-01").value // 1000

    li = _read(f"{sf_dir}/lineitem.parquet",
                         columns=["l_orderkey", "l_returnflag",
                                  "l_shipdate"])

    def line_partial(batch: pa.Table) -> pa.Table:
        ship_us = batch.column("l_shipdate").cast(pa.int64())
        mask = pc.and_(pc.greater_equal(ship_us, lo),
                       pc.less(ship_us, hi))
        batch = batch.filter(mask)
        df = pd.DataFrame({
            "l_orderkey": batch.column("l_orderkey").to_numpy(),
            "l_returnflag": batch.column("l_returnflag").to_pylist(),
            "n_lines": np.int64(1)})
        g = df.groupby(["l_orderkey", "l_returnflag"],
                       as_index=False).sum()
        return pa.Table.from_pandas(g, preserve_index=False)

    lines = li.map_batches(line_partial, batch_format="pyarrow",
                           batch_size=65536)

    orders = _read(f"{sf_dir}/orders.parquet",
                             columns=["o_orderkey",
                                      "o_orderpriority"])
    joined = lines.join(orders, join_type="inner",
                        num_partitions=_auto_partitions(),
                        on=("l_orderkey",), right_on=("o_orderkey",))

    def mix_partial(batch: pa.Table) -> pa.Table:
        prio = batch.column("o_orderpriority")
        high = pc.is_in(prio, value_set=pa.array(
            ["1-URGENT", "2-HIGH"])).to_numpy(zero_copy_only=False)
        n = batch.column("n_lines").to_numpy()
        df = pd.DataFrame({
            "l_returnflag": batch.column("l_returnflag").to_pylist(),
            "high_lines": np.where(high, n, 0).astype(np.int64),
            "low_lines": np.where(high, 0, n).astype(np.int64)})
        g = df.groupby("l_returnflag", as_index=False).sum()
        return pa.Table.from_pandas(g, preserve_index=False)

    return (joined.map_batches(mix_partial, batch_format="pyarrow")
            .groupby("l_returnflag")
            .aggregate(Sum("high_lines", alias_name="high_lines"),
                       Sum("low_lines", alias_name="low_lines"))
            .sort("l_returnflag"))


def _q_q14_promo_share(sf_dir: str):
    """TPC-H Q14-style promo-revenue split for one month: part is a
    DIMENSION, so the PROMO partkey set broadcasts once as a dense
    bool array (``ray.put``) and every lineitem batch folds to a
    single (promo_e4, total_e4) exact-integer partial — ZERO shuffles,
    the month's answer is one driver fold over O(#batches) rows."""
    import ray

    import pyarrow.parquet as pq
    import ray.data as rd

    lo = pd.Timestamp("1997-09-01").value // 1000
    hi = pd.Timestamp("1997-10-01").value // 1000

    part = pq.read_table(f"{sf_dir}/part.parquet",
                         columns=["p_partkey", "p_type"])
    pk = part.column("p_partkey").to_numpy()
    promo = np.zeros(int(pk.max()) + 1, bool)
    promo[pk] = np.asarray(part.column("p_type").to_pylist()) \
        == "PROMO"
    promo_ref = ray.put(promo)

    ds = _read(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_partkey", "l_shipdate", "l_extendedprice",
                 "l_discount"])

    def partial(batch: pa.Table) -> pa.Table:
        ship_us = batch.column("l_shipdate").cast(pa.int64())
        mask = pc.and_(pc.greater_equal(ship_us, lo),
                       pc.less(ship_us, hi))
        batch = batch.filter(mask)
        cents = np.round(batch.column("l_extendedprice")
                         .to_numpy(zero_copy_only=False)
                         * 100).astype(np.int64)
        keep = 100 - np.round(batch.column("l_discount")
                              .to_numpy(zero_copy_only=False)
                              * 100).astype(np.int64)
        rev = cents * keep
        is_promo = ray.get(promo_ref)[
            batch.column("l_partkey").to_numpy()]
        return pa.table({
            "promo_e4": pa.array([int(rev[is_promo].sum())],
                                 pa.int64()),
            "total_e4": pa.array([int(rev.sum())], pa.int64())})

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    return pd.DataFrame({
        "promo_revenue_e4": [np.int64(parts["promo_e4"].sum())],
        "total_revenue_e4": [np.int64(parts["total_e4"].sum())]})


def _q_q18_big_orders(sf_dir: str):
    """TPC-H Q18-style large-volume orders: orders whose total line
    quantity exceeds 150 units, with customer names, top 20 by
    volume. The HAVING filter runs on the exact integer-unit groupby
    BEFORE any join — only qualifying keys (a tiny fraction) enter
    the hash join with orders — and customer broadcasts as a
    custkey→name map."""
    import ray

    import pyarrow.parquet as pq
    import ray.data as rd
    from ray.data.aggregate import Sum
    from ksoup_ray.pipelines.curate import _auto_partitions

    cust = pq.read_table(f"{sf_dir}/customer.parquet",
                         columns=["c_custkey", "c_name"])
    name_ref = ray.put(dict(
        zip(cust.column("c_custkey").to_pylist(),
            cust.column("c_name").to_pylist())))

    li = _read(f"{sf_dir}/lineitem.parquet",
                         columns=["l_orderkey", "l_quantity"])

    def qty_partial(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "l_orderkey": batch.column("l_orderkey").to_numpy(),
            "sum_qty": np.round(batch.column("l_quantity")
                                .to_numpy(zero_copy_only=False))
            .astype(np.int64)})
        g = df.groupby("l_orderkey", as_index=False).sum()
        return pa.Table.from_pandas(g, preserve_index=False)

    big = (li.map_batches(qty_partial, batch_format="pyarrow",
                          batch_size=65536)
           .groupby("l_orderkey")
           .aggregate(Sum("sum_qty", alias_name="sum_qty"))
           .filter(lambda r: r["sum_qty"] > 150))

    orders = _read(f"{sf_dir}/orders.parquet",
                             columns=["o_orderkey", "o_custkey",
                                      "o_orderdate", "o_totalprice"])
    joined = big.join(orders, join_type="inner",
                      num_partitions=_auto_partitions(),
                      on=("l_orderkey",), right_on=("o_orderkey",))

    def finish(batch: pa.Table) -> pa.Table:
        names = ray.get(name_ref)
        total_cents = np.round(batch.column("o_totalprice")
                               .to_numpy(zero_copy_only=False)
                               * 100).astype(np.int64)
        return pa.table({
            "l_orderkey": batch.column("l_orderkey"),
            "sum_qty": batch.column("sum_qty"),
            "o_orderdate": batch.column("o_orderdate"),
            "total_cents": pa.array(total_cents, pa.int64()),
            "c_name": pa.array(
                [names[int(k)] for k in
                 batch.column("o_custkey").to_pylist()],
                pa.string())})

    return (joined.map_batches(finish, batch_format="pyarrow")
            .sort(["sum_qty", "l_orderkey"], descending=[True, False])
            .limit(20))


def _q_corr_matrix(sf_dir: str):
    """Pairwise Pearson correlations across four lineitem measures in
    ONE streaming pass (functions/agg.corr_pairs): per-row integer
    scaling, one partial-moment row per batch, arbitrary-precision
    driver fold, SQL-mirrored float nesting → exact micros."""
    import ray.data as rd
    from ksoup_ray.functions.agg import corr_pairs
    ds = _read(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_quantity", "l_extendedprice", "l_discount",
                 "l_tax"])
    return corr_pairs(ds, {"l_quantity": 1, "l_extendedprice": 100,
                           "l_discount": 10000, "l_tax": 10000})


def _q_pareto_front(sf_dir: str):
    """2-D skyline over lineitem (quantity ↑, price ↑)
    (functions/agg.pareto_front): each batch prunes to its local
    frontier, only candidate points reach the driver, one final merge
    — the canonical local-prune/global-merge reduction."""
    import ray.data as rd
    from ksoup_ray.functions.agg import pareto_front
    ds = _read(f"{sf_dir}/lineitem.parquet",
                         columns=["l_quantity", "l_extendedprice"])
    return pareto_front(ds, x_col="l_quantity",
                        y_col="l_extendedprice", y_scale=100)


def _depth_pages(sf_dir: str):
    import ray.data as rd
    from ksoup_ray.sources.synth import render_depth_page
    ds = _read(f"{sf_dir}/documents.parquet",
                         columns=["doc_id"])

    def render(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "html": pa.array([render_depth_page(i) for i in ids],
                             pa.string())})

    return ds.map_batches(render, batch_format="pyarrow")


def _q_dom_depth(sf_dir: str):
    """DOM-shape profile (stages/extract.DomDepthStage): per doc the
    max element depth + element count via an ITERATIVE walk (no
    recursion — hostile deep pages can't blow the stack), value-
    checked against the nest-chain closed form."""
    from ksoup_ray.stages.extract import DomDepthStage
    return _depth_pages(sf_dir).map_batches(
        DomDepthStage, batch_format="pyarrow", concurrency=(1, 4))


def _q_css_structural(sf_dir: str):
    """Structural pseudo-class + sibling-combinator counts
    (stages/extract.StructuralCssStage): nth-child(odd)/(2n),
    `li + li`, `li:first-child ~ li` — the selector-grammar corner a
    tag index can't serve, each compiled once per actor and
    value-checked against the item-count closed form."""
    from ksoup_ray.stages.extract import StructuralCssStage
    return _depth_pages(sf_dir).map_batches(
        StructuralCssStage, batch_format="pyarrow",
        concurrency=(1, 4))


def _q_weighted_median(sf_dir: str):
    """Revenue-weighted median order quantity per return flag
    (functions/agg.grouped_weighted_median): bounded (key × value)
    histogram rides the ONE shuffle, integer 2·cumw ≥ W rule on the
    driver-side grid."""
    import ray.data as rd
    from ksoup_ray.functions.agg import grouped_weighted_median
    ds = _read(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_returnflag", "l_quantity", "l_extendedprice"])
    return grouped_weighted_median(
        ds, key_col="l_returnflag", val_col="l_quantity",
        weight_col="l_extendedprice", weight_scale=100)


def _q_ols_price_qty(sf_dir: str):
    """Per-return-flag OLS of price-cents on quantity
    (functions/agg.grouped_ols): one streaming pass of exact integer
    moments (squared sums as object-dtype strings past int64), SQL-
    mirrored float nesting -> slope/intercept in exact micros."""
    import ray.data as rd
    from ksoup_ray.functions.agg import grouped_ols
    ds = _read(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_returnflag", "l_quantity", "l_extendedprice"])
    return grouped_ols(ds, key_col="l_returnflag", x_col="l_quantity",
                       y_col="l_extendedprice", x_scale=1,
                       y_scale=100)


def _q_q7_nation_volume(sf_dir: str):
    """TPC-H Q7-style volume shipping between two trading nations:
    revenue per (supp_nation, cust_nation, year) for the NATION_3 /
    NATION_12 pair. Both nation maps are DIMENSIONS and broadcast as
    key→nation lookups restricted to the pair (everything else is
    filtered map-side before the shuffle); lineitem pre-aggregates to
    exact (orderkey, supp_nation, year, revenue_e4) partials; the ONE
    large-large hash join attaches the customer nation, a bounded
    4-row groupby finishes."""
    import pyarrow.parquet as pq
    import ray.data as rd
    from ray.data.aggregate import Sum
    from ksoup_ray.pipelines.curate import _auto_partitions

    pair = ("NATION_3", "NATION_12")
    lo = pd.Timestamp("1996-01-01").value // 1000
    hi = pd.Timestamp("1998-01-01").value // 1000

    nation = pq.read_table(f"{sf_dir}/nation.parquet",
                           columns=["n_nationkey", "n_name"])
    nmap = dict(zip(nation.column("n_nationkey").to_pylist(),
                    nation.column("n_name").to_pylist()))
    supp = pq.read_table(f"{sf_dir}/supplier.parquet",
                         columns=["s_suppkey", "s_nationkey"])
    supp_nat = {k: nmap[n] for k, n in
                zip(supp.column("s_suppkey").to_pylist(),
                    supp.column("s_nationkey").to_pylist())
                if nmap[n] in pair}
    cust = pq.read_table(f"{sf_dir}/customer.parquet",
                         columns=["c_custkey", "c_nationkey"])
    cust_nat = {k: nmap[n] for k, n in
                zip(cust.column("c_custkey").to_pylist(),
                    cust.column("c_nationkey").to_pylist())
                if nmap[n] in pair}

    li = _read(f"{sf_dir}/lineitem.parquet",
                         columns=["l_orderkey", "l_suppkey",
                                  "l_shipdate", "l_extendedprice",
                                  "l_discount"])

    def line_partial(batch: pa.Table) -> pa.Table:
        ship_us = batch.column("l_shipdate").cast(pa.int64())
        batch = batch.filter(pc.and_(
            pc.greater_equal(ship_us, lo), pc.less(ship_us, hi)))
        df = batch.to_pandas()
        sn = df["l_suppkey"].map(supp_nat)
        df = df[sn.notna()].copy()
        df["supp_nation"] = sn[sn.notna()]
        df["l_year"] = df["l_shipdate"].dt.year.astype(np.int64)
        cents = (df["l_extendedprice"] * 100).round().astype("int64")
        keep = 100 - (df["l_discount"] * 100).round().astype("int64")
        df["revenue_e4"] = cents * keep
        g = df.groupby(["l_orderkey", "supp_nation", "l_year"],
                       as_index=False).agg(
            revenue_e4=("revenue_e4", "sum"))
        return pa.Table.from_pandas(g, preserve_index=False)

    revenue = li.map_batches(line_partial, batch_format="pyarrow",
                             batch_size=65536)

    orders = _read(f"{sf_dir}/orders.parquet",
                             columns=["o_orderkey", "o_custkey"])

    def order_nation(batch: pa.Table) -> pa.Table:
        keys = batch.column("o_custkey").to_pylist()
        cn = [cust_nat.get(k) for k in keys]
        out = pa.table({
            "o_orderkey": batch.column("o_orderkey"),
            "cust_nation": pa.array(cn, pa.string())})
        return out.filter(pc.is_valid(out.column("cust_nation")))

    sel_orders = orders.map_batches(order_nation,
                                    batch_format="pyarrow")

    joined = revenue.join(sel_orders, join_type="inner",
                          num_partitions=_auto_partitions(),
                          on=("l_orderkey",), right_on=("o_orderkey",))

    def cross_only(batch: pa.Table) -> pa.Table:
        mask = pc.invert(pc.equal(batch.column("supp_nation"),
                                  batch.column("cust_nation")))
        return batch.filter(mask).select(
            ["supp_nation", "cust_nation", "l_year", "revenue_e4"])

    return (joined.map_batches(cross_only, batch_format="pyarrow")
            .groupby(["supp_nation", "cust_nation", "l_year"])
            .aggregate(Sum("revenue_e4", alias_name="revenue_e4"))
            .sort(["supp_nation", "cust_nation", "l_year"]))


def _q_q8_market_share(sf_dir: str):
    """TPC-H Q8-style market share: NATION_3 suppliers' slice of
    MEDIUM-part revenue sold to ASIA customers, per order year. Share
    is returned as two EXACT integer columns (nation_rev_e4,
    total_rev_e4) — no float division anywhere, so the oracle matches
    bit-for-bit. part/supplier/customer-region are dimension
    broadcasts folded into the lineitem partial; the ONE large-large
    hash join attaches the order year."""
    import pyarrow.parquet as pq
    import ray.data as rd
    from ray.data.aggregate import Sum
    from ksoup_ray.pipelines.curate import _auto_partitions

    part = pq.read_table(f"{sf_dir}/part.parquet",
                         columns=["p_partkey", "p_type"])
    pk = part.column("p_partkey").to_numpy()
    medium = np.zeros(int(pk.max()) + 1, bool)
    medium[pk] = np.asarray(part.column("p_type").to_pylist()) \
        == "MEDIUM"

    supp = pq.read_table(f"{sf_dir}/supplier.parquet",
                         columns=["s_suppkey", "s_nationkey"])
    nation = pq.read_table(f"{sf_dir}/nation.parquet")
    region = pq.read_table(f"{sf_dir}/region.parquet")
    n3_key = nation.filter(
        pc.equal(nation.column("n_name"), "NATION_3")) \
        .column("n_nationkey")[0].as_py()
    supp_is_n3 = {k: (n == n3_key) for k, n in
                  zip(supp.column("s_suppkey").to_pylist(),
                      supp.column("s_nationkey").to_pylist())}
    asia_key = region.filter(
        pc.equal(region.column("r_name"), "ASIA")) \
        .column("r_regionkey")[0].as_py()
    asia_nations = set(nation.filter(
        pc.equal(nation.column("n_regionkey"), asia_key))
        .column("n_nationkey").to_pylist())
    cust = pq.read_table(f"{sf_dir}/customer.parquet",
                         columns=["c_custkey", "c_nationkey"])
    asia_cust = {k for k, n in
                 zip(cust.column("c_custkey").to_pylist(),
                     cust.column("c_nationkey").to_pylist())
                 if n in asia_nations}

    li = _read(f"{sf_dir}/lineitem.parquet",
                         columns=["l_orderkey", "l_partkey",
                                  "l_suppkey", "l_extendedprice",
                                  "l_discount"])

    def line_partial(batch: pa.Table) -> pa.Table:
        keep_part = medium[batch.column("l_partkey").to_numpy()]
        batch = batch.filter(pa.array(keep_part))
        cents = np.round(batch.column("l_extendedprice")
                         .to_numpy(zero_copy_only=False)
                         * 100).astype(np.int64)
        keep = 100 - np.round(batch.column("l_discount")
                              .to_numpy(zero_copy_only=False)
                              * 100).astype(np.int64)
        rev = cents * keep
        is_n3 = np.array([supp_is_n3.get(k, False) for k in
                          batch.column("l_suppkey").to_pylist()])
        df = pd.DataFrame({
            "l_orderkey": batch.column("l_orderkey").to_numpy(),
            "nation_rev_e4": np.where(is_n3, rev, 0),
            "total_rev_e4": rev})
        g = df.groupby("l_orderkey", as_index=False).sum()
        return pa.Table.from_pandas(g, preserve_index=False)

    revenue = li.map_batches(line_partial, batch_format="pyarrow",
                             batch_size=65536)

    orders = _read(f"{sf_dir}/orders.parquet",
                             columns=["o_orderkey", "o_custkey",
                                      "o_orderdate"])

    def asia_orders(batch: pa.Table) -> pa.Table:
        keep = pa.array([k in asia_cust for k in
                         batch.column("o_custkey").to_pylist()])
        batch = batch.filter(keep)
        years = pd.to_datetime(
            batch.column("o_orderdate").to_pandas()).dt.year \
            .to_numpy(dtype=np.int64)
        return pa.table({
            "o_orderkey": batch.column("o_orderkey"),
            "o_year": pa.array(years, pa.int64())})

    sel_orders = orders.map_batches(asia_orders,
                                    batch_format="pyarrow")

    joined = revenue.join(sel_orders, join_type="inner",
                          num_partitions=_auto_partitions(),
                          on=("l_orderkey",), right_on=("o_orderkey",))
    return (joined.groupby("o_year")
            .aggregate(Sum("nation_rev_e4",
                           alias_name="nation_rev_e4"),
                       Sum("total_rev_e4",
                           alias_name="total_rev_e4"))
            .sort("o_year"))


def _q_q13_order_dist(sf_dir: str):
    """TPC-H Q13-style customer order-count distribution — the
    classic left-join histogram WITHOUT the join: orders collapse
    map-side to per-custkey partial counts, ONE id-only groupby Sum
    gives each active customer's count, a second bounded histogram
    groupby folds counts→custdist, and the zero bucket is computed
    from Parquet FOOTER metadata (total customers) minus the active
    count — no customer data is ever read."""
    import pyarrow.parquet as pq
    import ray.data as rd
    from ray.data.aggregate import Sum

    orders = _read(f"{sf_dir}/orders.parquet",
                             columns=["o_custkey"])

    def cust_partial(batch: pa.Table) -> pa.Table:
        g = batch.group_by(["o_custkey"]).aggregate(
            [("o_custkey", "count")])
        return pa.table({
            "o_custkey": g.column("o_custkey"),
            "partial": g.column("o_custkey_count").cast(pa.int64())})

    per_cust = (orders.map_batches(cust_partial,
                                   batch_format="pyarrow")
                .groupby("o_custkey")
                .aggregate(Sum("partial", alias_name="c_count")))

    def hist_partial(batch: pa.Table) -> pa.Table:
        g = pa.table({"c_count": batch.column("c_count")}) \
            .group_by(["c_count"]).aggregate([("c_count", "count")])
        return pa.table({
            "c_count": g.column("c_count"),
            "partial": g.column("c_count_count").cast(pa.int64())})

    hist = (per_cust.map_batches(hist_partial,
                                 batch_format="pyarrow")
            .groupby("c_count")
            .aggregate(Sum("partial", alias_name="custdist"))
            .to_pandas())

    n_cust = pq.read_metadata(f"{sf_dir}/customer.parquet").num_rows
    n_zero = n_cust - int(hist["custdist"].sum())
    if n_zero > 0:
        hist = pd.concat([hist, pd.DataFrame(
            {"c_count": [0], "custdist": [n_zero]})],
            ignore_index=True)
    hist = hist.astype({"c_count": np.int64, "custdist": np.int64})
    return hist.sort_values(["custdist", "c_count"],
                            ascending=[False, False]) \
        .reset_index(drop=True)


def _q_q15_top_supplier(sf_dir: str):
    """TPC-H Q15-style top supplier: the supplier(s) with MAX revenue
    in 1997Q1 (ties all returned, like the reference view). Lineitem
    folds map-side to exact (suppkey, revenue_e4) partials → ONE
    bounded groupby (suppliers are a dimension) → the max is a native
    Dataset aggregate, the equality filter streams, and s_name comes
    from a broadcast suppkey→name map — zero large joins."""
    import pyarrow.parquet as pq
    import ray.data as rd
    from ray.data.aggregate import Sum

    lo = pd.Timestamp("1997-01-01").value // 1000
    hi = pd.Timestamp("1997-04-01").value // 1000

    supp = pq.read_table(f"{sf_dir}/supplier.parquet",
                         columns=["s_suppkey", "s_name"])
    names = dict(zip(supp.column("s_suppkey").to_pylist(),
                     supp.column("s_name").to_pylist()))

    li = _read(f"{sf_dir}/lineitem.parquet",
                         columns=["l_suppkey", "l_shipdate",
                                  "l_extendedprice", "l_discount"])

    def rev_partial(batch: pa.Table) -> pa.Table:
        ship_us = batch.column("l_shipdate").cast(pa.int64())
        batch = batch.filter(pc.and_(
            pc.greater_equal(ship_us, lo), pc.less(ship_us, hi)))
        cents = np.round(batch.column("l_extendedprice")
                         .to_numpy(zero_copy_only=False)
                         * 100).astype(np.int64)
        keep = 100 - np.round(batch.column("l_discount")
                              .to_numpy(zero_copy_only=False)
                              * 100).astype(np.int64)
        df = pd.DataFrame({
            "l_suppkey": batch.column("l_suppkey").to_numpy(),
            "total_rev_e4": cents * keep})
        g = df.groupby("l_suppkey", as_index=False).sum()
        return pa.Table.from_pandas(g, preserve_index=False)

    rev = (li.map_batches(rev_partial, batch_format="pyarrow",
                          batch_size=65536)
           .groupby("l_suppkey")
           .aggregate(Sum("total_rev_e4",
                          alias_name="total_rev_e4"))
           .materialize())
    best = rev.max("total_rev_e4")

    def finish(batch: pa.Table) -> pa.Table:
        batch = batch.filter(pc.equal(
            batch.column("total_rev_e4"), pa.scalar(best)))
        return pa.table({
            "s_suppkey": batch.column("l_suppkey"),
            "s_name": pa.array(
                [names[int(k)] for k in
                 batch.column("l_suppkey").to_pylist()], pa.string()),
            "total_rev_e4": batch.column("total_rev_e4")})

    return rev.map_batches(finish, batch_format="pyarrow") \
        .sort("s_suppkey")


def _q_q17_small_qty(sf_dir: str):
    """TPC-H Q17-style small-quantity revenue: lines of Brand#4 parts
    whose quantity is below 0.2x the part's average — the classic
    correlated-subquery self-join, done as TWO streaming passes over
    a brand-pruned scan: pass 1 folds exact per-part (sum_qty, n)
    stats through one bounded groupby (brand parts are a dimension
    slice); the stats broadcast back via ``ray.put`` and pass 2
    applies the EXACT integer rule qty*5*n < sum_qty per batch,
    folding to one (n_small, loss_cents) row. No join, no floats."""
    import ray

    import pyarrow.parquet as pq
    import ray.data as rd
    from ray.data.aggregate import Sum

    part = pq.read_table(f"{sf_dir}/part.parquet",
                         columns=["p_partkey", "p_brand"])
    pk = part.column("p_partkey").to_numpy()
    brand = np.zeros(int(pk.max()) + 1, bool)
    brand[pk] = np.asarray(part.column("p_brand").to_pylist()) \
        == "Brand#4"

    li = _read(f"{sf_dir}/lineitem.parquet",
                         columns=["l_partkey", "l_quantity",
                                  "l_extendedprice"])

    def stats_partial(batch: pa.Table) -> pa.Table:
        keep = brand[batch.column("l_partkey").to_numpy()]
        batch = batch.filter(pa.array(keep))
        qty = np.round(batch.column("l_quantity")
                       .to_numpy(zero_copy_only=False)) \
            .astype(np.int64)
        df = pd.DataFrame({
            "l_partkey": batch.column("l_partkey").to_numpy(),
            "sq": qty, "n": np.int64(1)})
        g = df.groupby("l_partkey", as_index=False).sum()
        return pa.Table.from_pandas(g, preserve_index=False)

    stats = (li.map_batches(stats_partial, batch_format="pyarrow",
                            batch_size=65536)
             .groupby("l_partkey")
             .aggregate(Sum("sq", alias_name="sq"),
                        Sum("n", alias_name="n"))
             .to_pandas())
    sq_map = np.zeros(len(brand), np.int64)
    n_map = np.zeros(len(brand), np.int64)
    keys = stats["l_partkey"].to_numpy()
    sq_map[keys] = stats["sq"].to_numpy()
    n_map[keys] = stats["n"].to_numpy()
    maps_ref = ray.put((brand, sq_map, n_map))

    def small_partial(batch: pa.Table) -> pa.Table:
        b, sq, n = ray.get(maps_ref)
        pkeys = batch.column("l_partkey").to_numpy()
        batch = batch.filter(pa.array(b[pkeys]))
        pkeys = batch.column("l_partkey").to_numpy()
        qty = np.round(batch.column("l_quantity")
                       .to_numpy(zero_copy_only=False)) \
            .astype(np.int64)
        small = qty * 5 * n[pkeys] < sq[pkeys]
        cents = np.round(batch.column("l_extendedprice")
                         .to_numpy(zero_copy_only=False)
                         * 100).astype(np.int64)
        return pa.table({
            "n_small": pa.array([int(small.sum())], pa.int64()),
            "loss_cents": pa.array([int(cents[small].sum())],
                                   pa.int64())})

    parts = li.map_batches(small_partial,
                           batch_format="pyarrow").to_pandas()
    return pd.DataFrame({
        "n_small": [np.int64(parts["n_small"].sum())],
        "loss_cents": [np.int64(parts["loss_cents"].sum())]})


def _q_q22_idle_rich(sf_dir: str):
    """TPC-H Q22-style global sales opportunity, recency variant:
    customers with an above-average POSITIVE balance and NO order
    since 1999-01-01, grouped by nation. The threshold is the exact
    RATIONAL rule bal_cents*n_pos > sum_pos_cents (no float average);
    the no-recent-order test is a distributed ANTI join
    (functions/joins.anti_join — right side collapses to distinct
    keys map-side, left-outer + null filter); the final groupby is
    bounded by the 25 nations."""
    import ray.data as rd
    from ray.data.aggregate import Count, Sum
    from ksoup_ray.functions.joins import anti_join

    cust = _read(f"{sf_dir}/customer.parquet",
                           columns=["c_custkey", "c_nationkey",
                                    "c_acctbal"])

    def with_cents(batch: pa.Table) -> pa.Table:
        cents = np.round(batch.column("c_acctbal")
                         .to_numpy(zero_copy_only=False)
                         * 100).astype(np.int64)
        return pa.table({
            "c_custkey": batch.column("c_custkey"),
            "nationkey": batch.column("c_nationkey").cast(pa.int64()),
            "bal_cents": pa.array(cents, pa.int64())})

    bal = cust.map_batches(with_cents, batch_format="pyarrow")
    pos = bal.filter(expr="bal_cents > 0") \
        .aggregate(Sum("bal_cents", alias_name="tot"),
                   Count(alias_name="cnt"))
    tot, cnt = int(pos["tot"]), int(pos["cnt"])

    rich = bal.filter(
        lambda r: r["bal_cents"] * cnt > tot)

    cutoff = pd.Timestamp("1999-01-01").value // 1000
    recent = _read(
        f"{sf_dir}/orders.parquet",
        columns=["o_custkey", "o_orderdate"],
    ).map_batches(
        lambda b: b.filter(pc.greater_equal(
            b.column("o_orderdate").cast(pa.int64()), cutoff))
        .select(["o_custkey"]),
        batch_format="pyarrow")

    idle = anti_join(rich, recent, left_on="c_custkey",
                     right_on="o_custkey")

    def nat_partial(batch: pa.Table) -> pa.Table:
        g = batch.select(["nationkey", "bal_cents"]) \
            .group_by(["nationkey"]).aggregate(
                [("bal_cents", "sum"), ("bal_cents", "count")])
        return pa.table({
            "nationkey": g.column("nationkey"),
            "n_part": g.column("bal_cents_count").cast(pa.int64()),
            "bal_part": g.column("bal_cents_sum").cast(pa.int64())})

    return (idle.map_batches(nat_partial, batch_format="pyarrow")
            .groupby("nationkey")
            .aggregate(Sum("n_part", alias_name="numcust"),
                       Sum("bal_part",
                           alias_name="total_bal_cents"))
            .sort("nationkey"))


def _q_hits_2iter(sf_dir: str):
    """VALUE-CHECKED HITS hub/authority over the crawl link graph
    (functions/graph.hits_ints): 2 unnormalized Kleinberg iterations
    in EXACT int64 arithmetic — order-free sums, so the DuckDB oracle
    (four unrolled join+group-by CTE half-steps) reproduces every
    score bit-for-bit. Same join-free bucket-block rounds as
    pagerank_picos; second value-checked member of the iterative
    graph family."""
    from ksoup_ray.functions.graph import hits_ints
    edges = _q_link_edges(sf_dir)
    return hits_ints(edges, iters=2)


def _q_knn_graph(sf_dir: str):
    """Exact cosine 5-NN graph of the embedding corpus against itself
    (functions/similarity.knn_graph): reference matrix broadcast once
    via ``ray.put`` (a dimension at this scale; the >10^6-vector path
    blocks by IVF cell), one float64 matmul per batch, self excluded,
    ties to the lowest neighbor id — mirrored by the SQL oracle's
    ORDER BY."""
    import pyarrow.parquet as pq
    import ray.data as rd
    from ksoup_ray.functions.similarity import knn_graph, \
        vecs_from_arrow

    ref = pq.read_table(f"{sf_dir}/embeddings.parquet",
                        columns=["vec_id", "embedding"])
    ids = ref.column("vec_id").to_numpy()
    mat = vecs_from_arrow(ref.column("embedding"), np.float64)
    ds = _read(f"{sf_dir}/embeddings.parquet",
                         columns=["vec_id", "embedding"])
    return knn_graph(ds, ids, mat, k=5)


def _q_q21_waiting(sf_dir: str):
    """TPC-H Q21-style "suppliers who kept orders waiting": in every
    multi-supplier order with final status 'F', blame the supplier
    holding the order's UNIQUE latest ship date. (The synthetic
    lineitem carries no commit/receipt dates, so sole-latest-shipper
    stands in for Q21's sole receipt>commit offender — the same
    sole-blame-in-a-multi-supplier-order shape and the same
    EXISTS / NOT-EXISTS algebra, both collapsed to per-order counts.)
    Distributed shape: lineitem pre-aggregates map-side to
    (orderkey, suppkey, max_ship) partials; ONE bounded-bucket shuffle
    on hash(orderkey) resolves every order entirely inside one block
    (functions/_blocks contract — segmented kernels, O(buckets) Python
    dispatches, never per-order); the surviving one-id-pair-per-blamed-
    order rows ride ONE hash join against the F-status order keys; a
    bounded per-supplier Count plus a broadcast name map finishes.
    Completes the partsupp-free TPC-H set (Q2/9/11/16/20 need the
    partsupp table, which the synthetic schema does not carry)."""
    import pyarrow.parquet as pq
    import ray.data as rd
    from ray.data.aggregate import Count
    from ksoup_ray.functions._blocks import pk_column
    from ksoup_ray.pipelines.curate import _auto_partitions

    sup = pq.read_table(f"{sf_dir}/supplier.parquet",
                        columns=["s_suppkey", "s_name"])
    name_map = dict(zip(sup.column("s_suppkey").to_pylist(),
                        sup.column("s_name").to_pylist()))

    NPART = 64
    li = _read(f"{sf_dir}/lineitem.parquet",
                         columns=["l_orderkey", "l_suppkey",
                                  "l_shipdate"])

    def partial(batch: pa.Table) -> pa.Table:
        df = pa.table({
            "l_orderkey": batch.column("l_orderkey"),
            "l_suppkey": batch.column("l_suppkey"),
            "ship_us": batch.column("l_shipdate").cast(pa.int64()),
        }).to_pandas()
        g = df.groupby(["l_orderkey", "l_suppkey"],
                       as_index=False).agg(ship_us=("ship_us", "max"))
        t = pa.Table.from_pandas(g, preserve_index=False)
        return t.append_column(
            "_pk", pk_column(t.column("l_orderkey"), NPART))

    partials = li.map_batches(partial, batch_format="pyarrow",
                              batch_size=65536)

    def blockers_block(block: pd.DataFrame) -> pd.DataFrame:
        # merge cross-batch partials, then per-order segment logic —
        # every row of an order is in this block by construction
        g = block.groupby(["l_orderkey", "l_suppkey"],
                          as_index=False).agg(ship_us=("ship_us",
                                                       "max"))
        stats = g.groupby("l_orderkey")["ship_us"].agg(
            n_supp="size", m1="max")
        g = g.join(stats, on="l_orderkey")
        at_max = g[g["ship_us"] == g["m1"]]
        n_at_max = at_max.groupby("l_orderkey")["l_suppkey"].size()
        at_max = at_max.join(n_at_max.rename("n_at_max"),
                             on="l_orderkey")
        win = at_max[(at_max["n_supp"] >= 2)
                     & (at_max["n_at_max"] == 1)]
        out = win[["l_orderkey", "l_suppkey"]]
        return out.astype({"l_orderkey": np.int64,
                           "l_suppkey": np.int64})

    blockers = partials.groupby("_pk").map_groups(
        blockers_block, batch_format="pandas")
    # Ray 2.49 join guard (see pipelines/curate._anti_join): seed one
    # impossible-key row so an all-empty map_groups side still carries
    # a schema through the join shuffle; inner join drops it.
    seed = rd.from_arrow(pa.table({
        "l_orderkey": pa.array([-1], pa.int64()),
        "l_suppkey": pa.array([-1], pa.int64())}))
    blockers = blockers.union(seed)

    orders = _read(f"{sf_dir}/orders.parquet",
                             columns=["o_orderkey", "o_orderstatus"])

    def f_only(batch: pa.Table) -> pa.Table:
        mask = pc.equal(batch.column("o_orderstatus"), "F")
        return batch.filter(mask).select(["o_orderkey"])

    f_orders = orders.map_batches(f_only, batch_format="pyarrow")

    joined = blockers.join(f_orders, join_type="inner",
                           num_partitions=_auto_partitions(),
                           on=("l_orderkey",),
                           right_on=("o_orderkey",))
    counts = joined.groupby("l_suppkey").aggregate(
        Count(alias_name="numwait"))

    def finish(batch: pa.Table) -> pa.Table:
        keys = batch.column("l_suppkey").to_pylist()
        return pa.table({
            "s_name": pa.array([name_map[k] for k in keys],
                               pa.string()),
            "numwait": batch.column("numwait").cast(pa.int64())})

    out = counts.map_batches(finish, batch_format="pyarrow")
    return out.sort(["numwait", "s_name"],
                    descending=[True, False]).limit(100)


def _q_boilerplate_lines(sf_dir: str):
    """CCNet-style per-host boilerplate LINE stripping
    (functions/curation.boilerplate_strip): every doc gets its host's
    header/footer chrome plus a unique body line (and a rare NOTE
    line on 1/7 of docs); lines in ≥50% of a host's pages are
    template and must be removed, rare lines must survive. Docs never
    shuffle — only (host, line_md5) count rows do; the bounded
    template table broadcasts. The oracle states the cleaned text in
    closed form, so a frequency, threshold, or reassembly bug breaks
    the hash."""
    import ray.data as rd
    from ksoup_ray.functions.curation import boilerplate_strip
    ds = _read(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text", "source"])

    def templated(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        texts = batch.column("text").to_pylist()
        hosts = batch.column("source").to_pylist()
        out = []
        for d, t, h in zip(ids, texts, hosts):
            s = (f"HDR {h}\nB{d} {t or ''}\nFTR {h}")
            if d % 7 == 0:
                s += f"\nNOTE n{d}"
            out.append(s)
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "host": batch.column("source"),
            "text": pa.array(out, pa.string())})

    pages = ds.map_batches(templated, batch_format="pyarrow")
    return boilerplate_strip(pages)


def _q_neardup_decontaminate(sf_dir: str):
    """NEAR-dup decontamination (functions/dedup.neardup_decontaminate)
    — flag corpus docs whose 5-word-shingle Jaccard vs ANY benchmark
    doc (here: doc_id % 50 == 0) reaches 0.5, the paraphrase-tolerant
    relaxation of exact decontamination. Benchmark shingle sets
    broadcast once via ray.put; exact integer Jaccard (ppm) per
    (doc × eval) probe, corpus never shuffles. The oracle replays
    every probe with list_intersect."""
    import ray.data as rd
    from ksoup_ray.functions.dedup import neardup_decontaminate
    ds = _read(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    ev = ds.filter(
        lambda r: r["doc_id"] % 50 == 0)
    return neardup_decontaminate(ds, ev)


def _q_mojibake_fix(sf_dir: str):
    """Encoding REPAIR (functions/curation.fix_mojibake — ftfy-style):
    each doc gets a unicode suffix, then two thirds are corrupted by
    re-reading their UTF-8 bytes as latin-1 or cp1252 (the classic
    double-decode crawl defect). The stage must repair EXACTLY the
    corrupted docs back to the original text — repairing nothing,
    over-repairing the clean third, or missing the cp1252 variant
    all break the identity hash."""
    import ray.data as rd
    from ksoup_ray.functions.curation import mojibake_repair
    ds = _read(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])

    SUFFIX = " café n№"

    def corrupt(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        texts = batch.column("text").to_pylist()
        out = []
        for d, t in zip(ids, texts):
            s = (t or "") + SUFFIX
            v = d % 3
            if v == 1:
                s = s.encode("utf-8").decode("latin-1")
            elif v == 2:
                s = s.encode("utf-8").decode("cp1252")
            out.append(s)
        return pa.table({"doc_id": batch.column("doc_id"),
                         "text": pa.array(out, pa.string())})

    return mojibake_repair(
        ds.map_batches(corrupt, batch_format="pyarrow"))


def _q_compression_ratio(sf_dir: str):
    """zlib compression-ratio quality signal
    (functions/curation.compression_ratio_batch): exact-integer
    (raw_len, comp_len, ratio_permille) per doc — the redundancy
    heuristic C4-family curation thresholds on. rows-only by nature
    (DuckDB has no zlib); pytest pins exact recomputation and the
    repetitive-vs-random ordering."""
    import ray.data as rd
    from ksoup_ray.functions.curation import compression_ratio_batch
    ds = _read(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    return ds.map_batches(compression_ratio_batch,
                          batch_format="pyarrow")


def _q_html_markdown(sf_dir: str):
    """HTML → Markdown conversion THROUGH the full engine parse
    (stages/markdown.py): deterministic structured pages (headings,
    bold, link, list, pre, trailing paragraph) are parsed by the real
    tokenizer/TreeBuilder and serialized as CommonMark-subset
    markdown. The oracle reconstructs the markdown string
    character-for-character, so a parse, traversal, inline-nesting,
    or list-marker bug breaks the hash."""
    import ray.data as rd
    from ksoup_ray.sources.synth import render_markdown_page
    from ksoup_ray.stages.markdown import MarkdownStage
    ds = _read(f"{sf_dir}/documents.parquet",
                         columns=["doc_id"])

    def render(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "html": pa.array([render_markdown_page(i) for i in ids],
                             pa.string())})

    pages = ds.map_batches(render, batch_format="pyarrow")
    return pages.map_batches(MarkdownStage, batch_format="pyarrow",
                             concurrency=(1, 4))


def _q_epoch_shuffle(sf_dir: str):
    """Deterministic training-epoch shuffle into shards
    (functions/splits.epoch_shuffle, epoch=1, 16 shards): key =
    md5(epoch:id) permutes the corpus reproducibly per epoch, shard =
    4 key hex digits mod 16, pos = rank by (key, id) within the
    shard. One bounded-key shuffle; ids only. The oracle replays key,
    shard, and within-shard rank verbatim."""
    import ray.data as rd
    from ksoup_ray.functions.splits import epoch_shuffle
    ds = _read(f"{sf_dir}/documents.parquet",
                         columns=["doc_id"])
    return epoch_shuffle(ds, epoch=1, n_shards=16)


def _q_etld1_domains(sf_dir: str):
    """Registered-domain (eTLD+1) extraction under public-suffix-list
    LONGEST-match (functions/urls.registered_domains): synthetic hosts
    mix subdomain depths and 1- and 2-label public suffixes (the PSL
    holds both 'uk' and 'co.uk', so a shortest-match bug yields a
    different registered domain and breaks the hash). The per-domain
    grouping key every domain-quota/reputation stage needs."""
    import ray.data as rd
    from ksoup_ray.functions.urls import registered_domains
    ds = _read(f"{sf_dir}/documents.parquet",
                         columns=["doc_id"])

    def to_hosts(batch: pa.Table) -> pa.Table:
        hosts = []
        for d in batch.column("doc_id").to_pylist():
            sub = ("", "www.", "a.b.")[d % 3]
            suf = ("com", "org", "co.uk", "ac.uk", "com.au")[d % 5]
            hosts.append(f"{sub}d{d % 7}.{suf}")
        return pa.table({"doc_id": batch.column("doc_id"),
                         "host": pa.array(hosts, pa.string())})

    return registered_domains(
        ds.map_batches(to_hosts, batch_format="pyarrow"))


def _q_surt_index(sf_dir: str):
    """SURT keys (functions/urls.surt_key) — the CDX-index sort key
    that clusters every subdomain of a registrable domain into one
    contiguous range: scheme dropped, host labels reversed
    comma-joined, fragment dropped, query kept. Synth URLs mix
    subdomain depth, queries, and fragments; the oracle spells the
    reversed-label key out in closed form, so a label-order, port,
    query, or fragment bug breaks the hash."""
    import ray.data as rd
    from ksoup_ray.functions.urls import surt_keys
    ds = _read(f"{sf_dir}/documents.parquet",
                         columns=["doc_id"])

    def to_urls(batch: pa.Table) -> pa.Table:
        urls = []
        for d in batch.column("doc_id").to_pylist():
            sub = ("", "www.", "a.b.")[d % 3]
            suf = ("com", "org", "co.uk", "ac.uk", "com.au")[d % 5]
            u = f"https://{sub}d{d % 7}.{suf}/p/{d}"
            if d % 2 == 1:
                u += f"?q={d % 3}"
            if d % 4 == 0:
                u += "#s"
            urls.append(u)
        return pa.table({"doc_id": batch.column("doc_id"),
                         "url": pa.array(urls, pa.string())})

    return surt_keys(ds.map_batches(to_urls, batch_format="pyarrow"))


def _q_bpe_learn(sf_dir: str):
    """BPE tokenizer TRAINING, 3 merge rounds end-to-end
    (functions/curation.bpe_learn) — the iterative trainer put on the
    VALUE-CHECKED path: each round one corpus pass (per-batch word
    dedup + merge application + bounded pair-partial combine), argmax
    adopted with the (count desc, pair asc) tie rule. The DuckDB
    oracle replays all 3 rounds, including greedy left-to-right merge
    application via the run-parity window rule, so a wrong tie-break,
    overlap handling, or stale-merge bug breaks the hash."""
    import ray.data as rd
    from ksoup_ray.functions.curation import bpe_learn
    ds = _read(f"{sf_dir}/documents.parquet",
                         columns=["text"])
    return bpe_learn(ds, rounds=3)


def _q_weighted_sample(sf_dir: str):
    """Deterministic WEIGHTED sampling without replacement
    (functions/splits.weighted_topk_sample) — the data-mixing draw
    (pick k docs ∝ weight) as an exponential-race over hash clocks:
    each row's key is the min of ``weight`` md5 draws, global k
    smallest win. Pairwise win odds are w/(w+v) (Efraimidis–Spirakis
    semantics) with NO float ln/pow on the compare path, so the
    DuckDB replay is bit-exact. Weight here: 1 + n_chars % 32."""
    import ray.data as rd
    from ksoup_ray.functions.splits import weighted_topk_sample
    ds = _read(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "n_chars"])

    def w(batch: pa.Table) -> pa.Table:
        n = batch.column("n_chars").to_numpy(zero_copy_only=False)
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "weight": pa.array(1 + (n % 32), pa.int64())})

    return weighted_topk_sample(ds.map_batches(w,
                                               batch_format="pyarrow"),
                                k=100)


def _q_blocklist_hits(sf_dir: str):
    """Blocklist phrase matching (functions/curation.blocklist_match,
    ``substring`` engine — one Arrow count_substring kernel pass per
    pattern): one row per (doc, banned phrase) with the
    non-overlapping occurrence count. The ``aho`` engine (from-scratch
    Aho–Corasick, the 10^5-pattern scale path) is pytest-pinned equal
    to this oracle-checked path."""
    import ray.data as rd
    from ksoup_ray.functions.curation import blocklist_match
    ds = _read(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    return blocklist_match(ds, patterns=BLOCKLIST_PATTERNS,
                           engine="substring")


BLOCKLIST_PATTERNS = ["batch batch", "slow join", "window window",
                      "spark", "dup", "merge part"]


def _q_robots_filter(sf_dir: str):
    """Crawl-politeness gate: per-host robots.txt (rendered
    deterministically per source host, PARSED by the real RFC 9309
    group-selection parser — functions/urls.parse_robots picks the
    ``*`` group over the decoy ``trainbot`` group) applied to every
    URL with longest-prefix-wins / Allow-wins-ties semantics
    (functions/urls.robots_decide). The bounded host→rules table is
    closure-broadcast; the URL side is one vectorized starts_with
    pass per rule, no shuffle. A parser or tie-rule bug changes
    decisions and breaks the hash."""
    import ray.data as rd
    from ksoup_ray.functions.urls import parse_robots, robots_decide
    ds = _read(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "lang", "source"])

    # bounded host list (sources are an enumerated handful) — one
    # distinct aggregate, then render + parse robots.txt per host
    hosts = sorted(
        r["source"]
        for r in ds.groupby("source").count().take_all())
    rules_by_host = {}
    for src in hosts:
        h = int(src[3:])
        txt = (f"# synthetic robots for {src}\n"
               "User-agent: trainbot\n"
               "Disallow: /tmp\n"
               "\n"
               "User-agent: *\n"
               f"Crawl-delay: {1 + h % 3}\n"
               "Disallow: /private\n")
        if h % 2 == 0:
            txt += "Allow: /private/pub\n"
        if h % 5 == 0:
            txt += "Disallow: /\n"
        rules_by_host[src] = parse_robots(txt)

    def to_urls(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        langs = batch.column("lang").to_pylist()
        paths = []
        for d, lang in zip(ids, langs):
            v = d % 4
            if v == 0:
                paths.append(f"/private/pub/{d}")
            elif v == 1:
                paths.append(f"/private/{d}")
            elif v == 2:
                paths.append(f"/public/{d}")
            else:
                paths.append(f"/{lang}/{d}")
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "host": batch.column("source"),
            "path": pa.array(paths, pa.string())})

    urls = ds.map_batches(to_urls, batch_format="pyarrow")
    decided = robots_decide(urls, rules_by_host)

    def finish(batch: pa.Table) -> pa.Table:
        full = pc.binary_join_element_wise(
            "https://", batch.column("host").cast(pa.string()),
            ".synth.invalid", batch.column("path").cast(pa.string()),
            "")
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "url": full,
            "matched_rule": batch.column("matched_rule"),
            "allowed": batch.column("allowed")})

    return decided.map_batches(finish, batch_format="pyarrow")


def _q_split_leakage(sf_dir: str):
    """Cross-split host-leakage audit (functions/splits.py
    split_leakage): md5 doc-level splits vs a synthetic host grouping
    (``host = 'h' || doc_id % 53``) — hosts whose pages straddle >1
    split, with doc counts. Pure per-batch assignment, two bounded
    partial/fold aggregations (hosts-scale rows only)."""
    import ray.data as rd
    from ksoup_ray.functions.splits import split_leakage
    ds = _read(f"{sf_dir}/documents.parquet",
                         columns=["doc_id"])

    def add_host(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        host = pc.binary_join_element_wise(
            "h", pc.cast(pa.array(ids % 53, pa.int64()), pa.string()),
            "")
        return batch.append_column("host", host)

    return split_leakage(ds.map_batches(add_host,
                                        batch_format="pyarrow"))


def _q_phrase_search(sf_dir: str):
    """Positional phrase search (functions/index.py phrase_hits):
    per-doc occurrence counts of the token-adjacent phrase
    "spark window" — tokenize-and-prune postings (id-sized rows for
    the phrase's terms only), ONE bounded doc-bucket shuffle, one
    lexsort segment kernel per block."""
    import ray.data as rd
    from ksoup_ray.functions.index import phrase_hits
    ds = _read(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    return phrase_hits(ds, ("spark", "window"))


def _q_semdedup(sf_dir: str):
    """SemDeDup semantic dedup (functions/dedup.py semdedup, Abbas
    et al. 2023): cosine-assign every embedding to the 8 fixed
    lowest-id centroids (broadcast once), then within each cluster
    drop vectors with a lower-id mate at cosine >= 0.465 — the
    keep-one-per-ε-ball rule, replayed exactly by the NOT-EXISTS
    oracle. Cluster ids are the BOUNDED shuffle key; in-cluster
    dominance runs in column chunks (m x chunk memory, never m²)."""
    import ray.data as rd
    from ksoup_ray.functions.dedup import semdedup
    centroids = _head_embeddings(sf_dir, _IVF_CELLS)
    ds = _read(f"{sf_dir}/embeddings.parquet",
                         columns=["vec_id", "embedding"])
    return semdedup(ds, centroids, threshold=0.465)


def _q_ccnet_buckets(sf_dir: str):
    """CCNet perplexity tiering (functions/curation.py
    ccnet_ppl_buckets, Wenzek et al. 2020 §4.3): per-doc corpus-LM
    perplexity (integer micros, from the co-partitioned unigram pass
    with token counts riding the same aggregate) quantized to
    bounded bins, then sort-free equi-depth head/middle/tail
    banding. The full CCNet quality-tier recipe as one lazy DAG."""
    import ray.data as rd
    from ksoup_ray.functions.curation import ccnet_ppl_buckets
    ds = _read(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    return ccnet_ppl_buckets(ds)


def _q_bpe_encode(sf_dir: str):
    """BPE tokenizer APPLICATION (functions/curation.py
    bpe_encode_counts): per-doc post-BPE token counts under a frozen
    3-merge list — the apply side of ``bpe_learn``, same greedy
    run-parity rule, replayed merge-for-merge by the window-function
    oracle. Actor pool with a persistent word->count cache; no
    shuffle (token budgets are doc-local)."""
    import ray.data as rd
    from ksoup_ray.functions.curation import bpe_encode_counts
    ds = _read(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    return bpe_encode_counts(ds, [("t", "h"), ("a", "t"),
                                  ("e", "r")])


def _q_quality_classifier(sf_dir: str):
    """fastText-style linear quality filter INFERENCE
    (functions/curation.py hashed_linear_score): md5 hashing-trick
    buckets x a fixed int64 weight vector (w[b] = b%7 - 3 — in
    production the trained model's quantized linear layer), integer
    dot per doc, keep/drop gate at score > 0. Actor pool with a
    persistent word->bucket cache; no shuffle."""
    import ray.data as rd
    from ksoup_ray.functions.curation import hashed_linear_score
    ds = _read(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    weights = [(b % 7) - 3 for b in range(64)]
    return hashed_linear_score(ds, weights)


def _q_host_reputation(sf_dir: str):
    """Host-level quality prior (functions/curation.py
    host_reputation): per-host mean classifier score (trunc int
    micros) broadcast back onto every document — site-level
    filtering, the RefinedWeb practice. Hosts-scale aggregates only;
    the corpus rides one id-keyed fold, no joins."""
    import ray.data as rd
    from ksoup_ray.functions.curation import host_reputation
    ds = _read(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text", "source"])
    weights = [(b % 7) - 3 for b in range(64)]
    return host_reputation(ds, weights, host_col="source")


def _q_canonical_dedup(sf_dir: str):
    """Canonical-URL dedup — the crawl-frontier primitive composing
    two existing operators: canonicalize messy URL variants
    (functions/urls.py), then keep the FIRST crawl (lowest doc_id)
    per canonical form (functions/dedup.py exact_dedup keyed on the
    canonical string). Groups are real: every 3 docs share a path
    (doc_id // 3), their variants (case, fragments, utm params,
    default port) collapse under canonicalization; the kept id per
    canonical is the closed-form MIN the oracle computes."""
    import pandas as pd
    import ray.data as rd
    from ksoup_ray.functions.dedup import exact_dedup
    from ksoup_ray.functions.urls import canonicalize_urls
    from ksoup_ray.sources.synth import BASE_URL

    def mess(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        path = "/p/" + pd.Series(ids // 3).astype(str).str.zfill(8)
        v = ids % 5
        base = BASE_URL + path
        messy = base.copy()
        messy[v == 1] = (BASE_URL.upper() + path + "#sec1")[v == 1]
        messy[v == 2] = (base + "?utm_source=x&utm_campaign=y")[v == 2]
        messy[v == 3] = (BASE_URL + ":443" + path
                         + "?id=7&utm_medium=z")[v == 3]
        messy[v == 4] = (base + "#frag")[v == 4]
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "url": pa.array(messy.to_numpy(dtype=object),
                            pa.string()),
        })

    ds = _read(f"{sf_dir}/documents.parquet",
                         columns=["doc_id"]) \
        .map_batches(mess, batch_format="pyarrow")
    canon = canonicalize_urls(ds) \
        .select_columns(["doc_id", "url_canon"])
    return exact_dedup(canon, text_col="url_canon",
                       key_col="doc_id") \
        .select_columns(["doc_id", "url_canon"])


def _q_hll_by_source(sf_dir: str):
    """Grouped HyperLogLog (functions/sketch.py hll_registers_by_key):
    per-source distinct-text registers folded in EXACT integers —
    per-batch (key, register) rho partials, one native Max groupby,
    bounded per-key combine; md5 hashing so the oracle replays every
    register and the scaled harmonic denominator bit-for-bit."""
    import ray.data as rd
    from ksoup_ray.functions.sketch import hll_registers_by_key
    ds = _read(f"{sf_dir}/documents.parquet",
                         columns=["source", "text"])
    return hll_registers_by_key(ds, key_col="source",
                                val_col="text", p=8)


def _q_redirect_resolve(sf_dir: str):
    """Redirect-chain resolution (functions/graph.py
    resolve_redirects): pointer jumping — 3 join-free co-partitioned
    rounds resolve chains up to 8 hops (m' = m∘m per round). Synth
    redirect map: every doc_id%5 != 0 redirects to doc_id-1, so
    chains of length <= 4 terminate at multiples of 5; the oracle
    unrolls the same 3 self-joins."""
    import ray.data as rd
    from ksoup_ray.functions.graph import resolve_redirects
    ds = _read(f"{sf_dir}/documents.parquet",
                         columns=["doc_id"])

    def to_redirects(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        m = ids % 5 != 0
        return pa.table({
            "src": pa.array(ids[m], pa.int64()),
            "dst": pa.array(ids[m] - 1, pa.int64()),
        })

    redirects = ds.map_batches(to_redirects, batch_format="pyarrow")
    return resolve_redirects(redirects, rounds=3)


def _q_cms_counts(sf_dir: str):
    """Count-Min sketch point estimates (functions/sketch.py
    cms_point_estimates): 4x1024 md5-hashed registers built from
    per-batch partials folded by ONE bounded groupby Sum; the driver
    answers a fixed 5-word query set off the bounded grid. Every
    register and estimate replayed bit-for-bit by the oracle."""
    import ray.data as rd
    from ksoup_ray.functions.sketch import cms_point_estimates
    ds = _read(f"{sf_dir}/documents.parquet",
                         columns=["text"])
    return cms_point_estimates(
        ds, ("spark", "window", "merge", "the", "qqqabsent"))


def _q_c4_filter(sf_dir: str):
    """C4 line-level cleaning (functions/curation.py c4_line_filter,
    Raffel et al. 2020 §2.2): terminal-punctuation / min-words /
    banned-phrase line rules + lorem-ipsum & min-kept page rules.
    Pages are synthesized deterministically from the word stream
    (6-word lines; ~1/3 lack punctuation; 'javascript' injected at
    (7·doc+line)%11==0; a lorem-ipsum line prepended at doc%17==0)
    so every rule fires and the SQL oracle rebuilds the same pages
    from the word-position CTE — no string surgery."""
    import ray.data as rd
    from ksoup_ray.functions.curation import c4_line_filter
    ds = _read(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])

    def build_pages(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        texts = batch.column("text").to_pylist()
        pages = []
        for did, text in zip(ids, texts):
            words = (text or "").split(" ")
            lines = []
            if did % 17 == 0:
                lines.append("lorem ipsum dolor")
            for k in range(0, len(words), 6):
                idx = k // 6
                t = " ".join(words[k:k + 6])
                if (did * 7 + idx) % 11 == 0:
                    t += " javascript"
                if (did + idx) % 3 != 0:
                    t += "."
                lines.append(t)
            pages.append("\n".join(lines))
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "page_text": pa.array(pages, pa.string()),
        })

    pages = ds.map_batches(build_pages, batch_format="pyarrow")
    return c4_line_filter(pages)


def _q_curate_tiered(sf_dir: str):
    """FineWeb-style tiered curation (pipelines/curate.py
    curate_tiered): exact-dedup winners ∩ linear-classifier keeps ∩
    CCNet head/middle tiers, composed with ZERO joins — the three
    gates reduce to id-keyed integer rows folded by ONE groupby Sum.
    Returns (doc_id, tier, score) for shipping docs."""
    import ray.data as rd
    from ksoup_ray.pipelines.curate import curate_tiered
    ds = _read(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    weights = [(b % 7) - 3 for b in range(64)]
    return curate_tiered(ds, weights)


def _q_tokenizer_fertility(sf_dir: str):
    """Per-language tokenizer fertility (functions/curation.py
    tokenizer_fertility): BPE tokens per whitespace word under the
    frozen 3-merge list, the multilingual-tokenizer equity metric.
    Batches collapse straight to per-lang integer partials — a
    languages-sized table rides the one bounded groupby."""
    import ray.data as rd
    from ksoup_ray.functions.curation import tokenizer_fertility
    ds = _read(f"{sf_dir}/documents.parquet",
                         columns=["text", "lang"])
    return tokenizer_fertility(ds, [("t", "h"), ("a", "t"),
                                    ("e", "r")])


def _q_charclass_profile(sf_dir: str):
    """Character-class permille profile (functions/textstats.py
    charclass_profile_batch): alpha/digit/space/other fractions per
    doc — the cheap garbage/mojibake/table-dump prefilter. One
    C-backed str.count per class, exact integer permille; the oracle
    computes each count as a regexp_replace length difference."""
    import ray.data as rd
    from ksoup_ray.functions.textstats import charclass_profile_batch
    ds = _read(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    return ds.map_batches(charclass_profile_batch,
                          batch_format="pyarrow")


def _q_novelty_frac(sf_dir: str):
    """First-introducer n-gram novelty (functions/curation.py
    novelty_frac): per doc, the ppm fraction of its distinct word
    3-grams whose corpus-wide minimal doc_id is this doc — the
    order-free "what does this document add" data-mixing signal. ONE
    bounded ngram-bucket shuffle of distinct (ngram, doc) pairs +
    one native Sum fold per doc; the oracle rebuilds the 3-grams
    with lead() windows and replays min-doc attribution exactly."""
    import ray.data as rd
    from ksoup_ray.functions.curation import novelty_frac
    ds = _read(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    return novelty_frac(ds, n=3)


def _q_ccn_luhn(sf_dir: str):
    """PAN (credit-card-number) detection with Luhn verification
    (functions/curation.luhn_pan_batch) — the PII class a bare regex
    cannot gate: most 16-digit runs fail the mod-10 checksum. The
    query synthesizes a deterministic payment field per doc
    (``pay <16-digit pan> ref <doc_id>``, pan = (doc_id·9973 +
    123457) zero-padded — closed-form, so the oracle rebuilds it with
    lpad and verifies Luhn with an unnested 16-term digit sum). The
    detector itself is generic: one RE2-compatible ``\\d+`` findall
    per batch, fixed-width numpy Luhn over all candidates at once,
    no per-row Python and no shuffle."""
    import ray.data as rd
    from ksoup_ray.functions.curation import luhn_pan_batch
    ds = _read(f"{sf_dir}/documents.parquet",
                         columns=["doc_id"])

    def field(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        pans = pd.Series((ids * 9973 + 123457) % 10 ** 16) \
            .astype(str).str.zfill(16)
        s = "pay " + pans + " ref " + pd.Series(ids).astype(str)
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "text": pa.array(s.to_numpy(dtype=object), pa.string()),
        })

    return ds.map_batches(field, batch_format="pyarrow") \
        .map_batches(luhn_pan_batch, batch_format="pyarrow")


def _q_dedup_best_keeper(sf_dir: str):
    """Quality-weighted dedup keeper (functions/dedup.py
    best_keeper_ids): per template-fingerprint cluster (2-word
    prefix, as in dup_host_spread) keep the LONGEST copy
    (n_chars argmax, min-id tie-break) — the RefinedWeb keeper rule,
    vs exact_dedup's MIN-id rule. One bounded key-bucket shuffle of
    (key, score, id) rows; ROW_NUMBER window oracle."""
    import hashlib as _hl
    from ksoup_ray.functions.dedup import best_keeper_ids
    ds = _read(f"{sf_dir}/documents.parquet",
               columns=["doc_id", "text", "n_chars"])

    def sig(batch: pa.Table) -> pa.Table:
        s = batch.column("text").to_pandas().fillna("")
        p = s.str.split(" ").str[:2].str.join(" ")
        md5s = [_hl.md5(x.encode()).hexdigest() for x in
                p.to_numpy(dtype=object)]
        return pa.table({
            "content_md5": pa.array(md5s, pa.string()),
            "n_chars": batch.column("n_chars").cast(pa.int64()),
            "doc_id": batch.column("doc_id").cast(pa.int64()),
        })

    return best_keeper_ids(ds.map_batches(sig, batch_format="pyarrow"))


def _q_dup_host_spread(sf_dir: str):
    """Host spread of template-fingerprint duplicate clusters
    (functions/dedup.dup_host_spread): texts sharing the same 2-word
    prefix (the synth corpus's template signature — the corpus has no
    full-text duplicates at sf0.001, so the fingerprint stands in for
    content_md5 exactly as a shingle fingerprint would on a real
    crawl) grouped into clusters; per cluster ≥ 2, its size and its
    DISTINCT host count — template-vs-mirror diagnosis. One bounded
    md5-bucket shuffle of (md5, host, n) partials; payloads never
    move."""
    import ray.data as rd
    from ksoup_ray.functions.dedup import dup_host_spread
    ds = _read(f"{sf_dir}/documents.parquet",
                         columns=["text", "source"])

    def prefix2(batch: pa.Table) -> pa.Table:
        s = batch.column("text").to_pandas().fillna("")
        p = s.str.split(" ").str[:2].str.join(" ")
        return pa.table({
            "text": pa.array(p.to_numpy(dtype=object), pa.string()),
            "source": batch.column("source"),
        })

    return dup_host_spread(ds.map_batches(prefix2,
                                          batch_format="pyarrow"))



def _q_late_data_audit(sf_dir: str):
    """Watermark late-data audit (functions/agg.late_data_audit):
    per tumbling day, event count and how many events a streaming job
    with a 7-day watermark off the global max event time would have
    dropped as late — the backfill analysis run before fixing a
    production allowed-lateness. One scalar max fold + bounded
    (window, n, n_late) partials; exact epoch-us integer arithmetic
    both sides."""
    from ksoup_ray.functions.agg import late_data_audit
    ds = _read(f"{sf_dir}/events.parquet", columns=["ts"])
    return late_data_audit(ds)



def _q_langid_margin(sf_dir: str):
    """Language-ID confidence margin (functions/textstats.py
    LangIdMargin): best-vs-runner-up marker-count gap per doc — the
    mixed-language / too-short-to-trust gate (the integer analogue of
    thresholding fastText-lid's top-1/top-2 probability gap). Same
    actor-pool scores matrix as langid; pred_lang keeps the CJK
    override; the oracle extracts best and second-best by value over
    the complete language vector (absent languages are zero)."""
    from ksoup_ray.functions.textstats import LangIdMargin
    ds = _read(f"{sf_dir}/documents.parquet",
               columns=["doc_id", "text"])
    return ds.map_batches(LangIdMargin, batch_format="pyarrow",
                          concurrency=(1, 4))


def queries() -> dict[str, Callable[[str], Any]]:
    return {
        "extract_text": _q_extract_text,
        "extract_from_files": _q_extract_from_files,
        "extract_from_warc": _q_extract_from_warc,
        "extract_links": _q_extract_links,
        "extract_spans": _q_extract_spans,
        "link_edges": _q_link_edges,
        "pagerank": _q_pagerank,
        "pagerank_2iter": _q_pagerank_2iter,
        "extract_meta": _q_extract_meta,
        "select_css": _q_select_css,
        "charset_decode": _q_charset_decode,
        "crawl_diff": _q_crawl_diff,
        "exact_dedup": _q_exact_dedup,
        "minhash_dedup": _q_minhash_dedup,
        "simhash": _q_simhash,
        "simhash_pairs": _q_simhash_pairs,
        "token_count": _q_token_count,
        "quality": _q_quality,
        "gopher_quality": _q_gopher_quality,
        "decontaminate": _q_decontaminate,
        "decontaminate_bloom": _q_decontaminate_bloom,
        "main_content": _q_main_content,
        "inverted_index": _q_inverted_index,
        "url_canonical": _q_url_canonical,
        "chunk_windows": _q_chunk_windows,
        "funnel": _q_funnel,
        "jsonl_roundtrip": _q_jsonl_roundtrip,
        "ngram_topk": _q_ngram_topk,
        "token_quantiles": _q_token_quantiles,
        "pack_sequences": _q_pack_sequences,
        "normalize_text": _q_normalize_text,
        "pii_redact": _q_pii_redact,
        "bm25": _q_bm25,
        "unigram_logprob": _q_unigram_logprob,
        "bigram_logprob": _q_bigram_logprob,
        "langid": _q_langid,
        "fingerprint": _q_fingerprint,
        "curate": _q_curate,
        "web_curate": _q_web_curate,
        "xml_roundtrip": _q_xml_roundtrip,
        "dedup_components": _q_dedup_components,
        "jaccard_pairs": _q_jaccard_pairs,
        "containment_pairs": _q_containment_pairs,
        "simhash_components": _q_simhash_components,
        "embed_neardup": _q_embed_neardup,
        "bpe_token_count": _q_bpe_token_count,
        "ann_topk": _q_ann_topk,
        "ann_ivf": _q_ann_ivf,
        "q1_pricing": _q_q1_pricing,
        "top_customers": _q_top_customers,
        "event_windows": _q_event_windows,
        "sanitize": _q_sanitize,
        "media_features": _q_media_features,
        "pdf_roundtrip": _q_pdf_roundtrip,
        "stream_first_paras": _q_stream_first_paras,
        "cluster_assign": _q_cluster_assign,
        "kmeans": _q_kmeans,
        "kmeans_1step": _q_kmeans_1step,
        "project_fixed": _q_project_fixed,
        "pca_project": _q_pca_project,
        "stratified_sample": _q_stratified_sample,
        "top_docs_per_lang": _q_top_docs_per_lang,
        "lang_counts": _q_lang_counts,
        "asof_join": _q_asof_join,
        "hopping_windows": _q_hopping_windows,
        "session_attribution": _q_session_attribution,
        "sessionize": _q_sessionize,
        "scd2_intervals": _q_scd2_intervals,
        "segment_dedup": _q_segment_dedup,
        "anchor_texts": _q_anchor_texts,
        "latest_event": _q_latest_event,
        "per_source_cap": _q_per_source_cap,
        "dsir_weights": _q_dsir_weights,
        "region_counts": _q_region_counts,
        "running_total": _q_running_total,
        "tfidf_topk": _q_tfidf_topk,
        "distinct_texts": _q_distinct_texts,
        "hll_distinct": _q_hll_distinct,
        "word_entropy": _q_word_entropy,
        "split_assign": _q_split_assign,
        "zscore_by_lang": _q_zscore_by_lang,
        "cocitation": _q_cocitation,
        "bm25_search": _q_bm25_search,
        "length_band": _q_length_band,
        "label_centroids": _q_label_centroids,
        "lang_rebalance": _q_lang_rebalance,
        "bigram_pmi": _q_bigram_pmi,
        "q3_shipping": _q_q3_shipping,
        "span_stats": _q_span_stats,
        "dup_span_trim": _q_dup_span_trim,
        "top_words_per_lang": _q_top_words_per_lang,
        "length_pct_rank": _q_length_pct_rank,
        "heavy_hitters": _q_heavy_hitters,
        "degree_hist": _q_degree_hist,
        "triangle_support": _q_triangle_support,
        "embed_quantize": _q_embed_quantize,
        "distinct_words": _q_distinct_words,
        "median_chars": _q_median_chars,
        "langid_confusion": _q_langid_confusion,
        "image_dhash": _q_image_dhash,
        "dhash_pairs": _q_dhash_pairs,
        "png_decode": _q_png_decode,
        "gif_decode": _q_gif_decode,
        "jpeg_codec": _q_jpeg_codec,
        "y4m_decode": _q_y4m_decode,
        "frame_sample": _q_frame_sample,
        "scene_cuts": _q_scene_cuts,
        "avi_mjpeg": _q_avi_mjpeg,
        "mp4_mjpeg": _q_mp4_mjpeg,
        "mix_sample": _q_mix_sample,
        "incremental_extract": _q_incremental_extract,
        "late_data_audit": _q_late_data_audit,
        "langid_margin": _q_langid_margin,
        "audio_stats": _q_audio_stats,
        "retention_cohorts": _q_retention_cohorts,
        "q5_local_supplier": _q_q5_local_supplier,
        "extract_paragraphs": _q_extract_paragraphs,
        "para_dedup": _q_para_dedup,
        "csv_roundtrip": _q_csv_roundtrip,
        "rollup_counts": _q_rollup_counts,
        "hash_sample": _q_hash_sample,
        "length_gini": _q_length_gini,
        "html_tables": _q_html_tables,
        "form_fields": _q_form_fields,
        "grouped_mode": _q_grouped_mode,
        "cov_qty_price": _q_cov_qty_price,
        "source_langs": _q_source_langs,
        "stale_orders": _q_stale_orders,
        "json_props": _q_json_props,
        "sitemap_urls": _q_sitemap_urls,
        "event_pivot": _q_event_pivot,
        "users_both": _q_users_both,
        "hash_features": _q_hash_features,
        "length_outliers": _q_length_outliers,
        "dense_ranks": _q_dense_ranks,
        "page2_docs": _q_page2_docs,
        "regex_extract": _q_regex_extract,
        "drift_union": _q_drift_union,
        "q6_forecast": _q_q6_forecast,
        "events_heatmap": _q_events_heatmap,
        "q19_disjunctive": _q_q19_disjunctive,
        "q4_priority": _q_q4_priority,
        "q10_returns": _q_q10_returns,
        "q12_priority_mix": _q_q12_priority_mix,
        "q14_promo_share": _q_q14_promo_share,
        "q18_big_orders": _q_q18_big_orders,
        "corr_matrix": _q_corr_matrix,
        "pareto_front": _q_pareto_front,
        "dom_depth": _q_dom_depth,
        "css_structural": _q_css_structural,
        "weighted_median": _q_weighted_median,
        "ols_price_qty": _q_ols_price_qty,
        "catalog_audit": _q_catalog_audit,
        "prep_report": _q_prep_report,
        "first_occurrence": _q_first_occurrence,
        "incremental_dedup": _q_incremental_dedup,
        "minmax_scale": _q_minmax_scale,
        "event_transitions": _q_event_transitions,
        "time_to_purchase": _q_time_to_purchase,
        "sessions_per_user_hist": _q_sessions_per_user_hist,
        "mom_change": _q_mom_change,
        "doc_vocab_richness": _q_doc_vocab_richness,
        "word_len_hist": _q_word_len_hist,
        "winsorize_lengths": _q_winsorize_lengths,
        "cumulative_users": _q_cumulative_users,
        "revenue_share": _q_revenue_share,
        "microdata": _q_microdata,
        "event_gaps": _q_event_gaps,
        "ohlc_hourly": _q_ohlc_hourly,
        "monthly_revenue": _q_monthly_revenue,
        "length_histogram": _q_length_histogram,
        "cube_counts": _q_cube_counts,
        "group_checksum": _q_group_checksum,
        "ntile_bands": _q_ntile_bands,
        "mutual_links": _q_mutual_links,
        "regex_density": _q_regex_density,
        "lineitem_melt": _q_lineitem_melt,
        "fuzzy_neardup": _q_fuzzy_neardup,
        "orders_heavy": _q_orders_heavy,
        "rolling_value_sum": _q_rolling_value_sum,
        "longest_docs": _q_longest_docs,
        "bfs_2hop": _q_bfs_2hop,
        "bpe_pairs": _q_bpe_pairs,
        "dedup_reps": _q_dedup_reps,
        "length_quartiles": _q_length_quartiles,
        "window_uniques": _q_window_uniques,
        "headings_outline": _q_headings_outline,
        "img_alt_audit": _q_img_alt_audit,
        "meta_robots": _q_meta_robots,
        "median_interp": _q_median_interp,
        "emb_stats": _q_emb_stats,
        "q7_nation_volume": _q_q7_nation_volume,
        "q8_market_share": _q_q8_market_share,
        "q13_order_dist": _q_q13_order_dist,
        "q15_top_supplier": _q_q15_top_supplier,
        "q17_small_qty": _q_q17_small_qty,
        "q22_idle_rich": _q_q22_idle_rich,
        "q21_waiting": _q_q21_waiting,
        "hits_2iter": _q_hits_2iter,
        "knn_graph": _q_knn_graph,
        "weighted_sample": _q_weighted_sample,
        "bpe_learn": _q_bpe_learn,
        "orc_roundtrip": _q_orc_roundtrip,
        "wet_roundtrip": _q_wet_roundtrip,
        "epoch_shuffle": _q_epoch_shuffle,
        "html_markdown": _q_html_markdown,
        "compression_ratio": _q_compression_ratio,
        "mojibake_fix": _q_mojibake_fix,
        "neardup_decontaminate": _q_neardup_decontaminate,
        "boilerplate_lines": _q_boilerplate_lines,
        "etld1_domains": _q_etld1_domains,
        "surt_index": _q_surt_index,
        "cdx_lookup": _q_cdx_lookup,
        "labelprop_2iter": _q_labelprop_2iter,
        "blocklist_hits": _q_blocklist_hits,
        "robots_filter": _q_robots_filter,
        "split_leakage": _q_split_leakage,
        "phrase_search": _q_phrase_search,
        "semdedup": _q_semdedup,
        "ccnet_buckets": _q_ccnet_buckets,
        "bpe_encode": _q_bpe_encode,
        "quality_classifier": _q_quality_classifier,
        "tokenizer_fertility": _q_tokenizer_fertility,
        "curate_tiered": _q_curate_tiered,
        "c4_filter": _q_c4_filter,
        "cms_counts": _q_cms_counts,
        "redirect_resolve": _q_redirect_resolve,
        "hll_by_source": _q_hll_by_source,
        "canonical_dedup": _q_canonical_dedup,
        "host_reputation": _q_host_reputation,
        "ccn_luhn": _q_ccn_luhn,
        "dup_host_spread": _q_dup_host_spread,
        "dedup_best_keeper": _q_dedup_best_keeper,
        "charclass_profile": _q_charclass_profile,
        "novelty_frac": _q_novelty_frac,
    }


# Registry entries with NO oracle_sql() row are rows-only BY DESIGN,
# not oracle gaps. Each maps to (reason, value-checked companion or
# None). Exposed to the driver/judge via queries_manifest().
_ROWS_ONLY_BY_DESIGN = {
    "kmeans": ("iterative float Lloyd k-means (3 rounds of matmul + "
               "argmin); not SQL-expressible", "kmeans_1step"),
    "pca_project": ("driver-side eigendecomposition of the streamed "
                    "covariance; not SQL-expressible", "project_fixed"),
    "hll_distinct": ("float HLL estimate over SipHash registers; "
                     "DuckDB cannot replay SipHash", "hll_by_source"),
    "compression_ratio": ("zlib compression; DuckDB has no zlib",
                          None),
    "audio_stats": ("WAV binary decode (from-scratch codec); not "
                    "SQL-expressible", None),
    "image_dhash": ("image binary decode (from-scratch PPM/BMP/PNG "
                    "codecs); not SQL-expressible", None),
    "dhash_pairs": ("image binary decode upstream of the Hamming "
                    "pair mine; not SQL-expressible", None),
}


def queries_manifest() -> dict[str, dict]:
    """Machine-readable registry metadata, one row per ``queries()``
    entry, so the driver/judge can iterate the FULL registry and
    distinguish designed rows-only checks from oracle gaps:

    ``{"value_checked": bool, "rows_only_reason": str | None,
    "companion": str | None}``

    ``value_checked`` ⇔ the name has an ``oracle_sql()`` entry.
    Every rows-only entry carries a reason and, where one exists, the
    name of its exact value-checked companion query (same distributed
    shape, integer arithmetic, hash-checked)."""
    oracles = oracle_sql()
    out = {}
    for name in queries():
        reason, companion = _ROWS_ONLY_BY_DESIGN.get(name, (None, None))
        out[name] = {
            "value_checked": name in oracles,
            "rows_only_reason": reason,
            "companion": companion,
        }
    return out


# EXACT-integer PageRank, 2 unrolled rounds, shared by the
# ``pagerank_2iter`` oracle and (via a float division wrapper) the
# ``pagerank`` oracle: every term is a BIGINT floor division, so the
# sums are order-free and match functions/graph.pagerank_picos
# bit-for-bit (PICO = 10^12, damping 85/100). Dangling mass = ranks
# of zero-out-degree nodes, redistributed uniformly (floored), same
# as the engine.
_PAGERANK_PICOS_2ITER_SQL = """
    WITH edges AS (
      SELECT doc_id AS src,
             CAST((doc_id + k + 1) % 100000000 AS BIGINT) AS dst
      FROM documents,
      LATERAL unnest(generate_series(0, doc_id % 4 - 1)) AS t(k)
    ), nodes AS (
      SELECT DISTINCT node FROM (
        SELECT src AS node FROM edges
        UNION ALL SELECT dst FROM edges)
    ), nn AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n FROM nodes
    ), deg AS (
      SELECT src, CAST(COUNT(*) AS BIGINT) AS d
      FROM edges GROUP BY src
    ), r0 AS (
      SELECT node,
             CAST(1000000000000 AS BIGINT) // (SELECT n FROM nn)
               AS r
      FROM nodes
    ), c1 AS (
      SELECT e.dst AS node,
             CAST(SUM(r0.r // deg.d) AS BIGINT) AS s
      FROM edges e
      JOIN r0 ON e.src = r0.node
      JOIN deg ON e.src = deg.src
      GROUP BY e.dst
    ), dang1 AS (
      SELECT CAST(COALESCE(SUM(r0.r), 0) AS BIGINT) AS dang
      FROM r0 LEFT JOIN deg ON r0.node = deg.src
      WHERE deg.src IS NULL
    ), r1 AS (
      SELECT nodes.node,
             (15 * (CAST(1000000000000 AS BIGINT)
                    // (SELECT n FROM nn))) // 100
             + (85 * (COALESCE(c1.s, 0)
                      + (SELECT dang FROM dang1)
                        // (SELECT n FROM nn))) // 100 AS r
      FROM nodes LEFT JOIN c1 ON nodes.node = c1.node
    ), c2 AS (
      SELECT e.dst AS node,
             CAST(SUM(r1.r // deg.d) AS BIGINT) AS s
      FROM edges e
      JOIN r1 ON e.src = r1.node
      JOIN deg ON e.src = deg.src
      GROUP BY e.dst
    ), dang2 AS (
      SELECT CAST(COALESCE(SUM(r1.r), 0) AS BIGINT) AS dang
      FROM r1 LEFT JOIN deg ON r1.node = deg.src
      WHERE deg.src IS NULL
    )
    SELECT nodes.node,
           (15 * (CAST(1000000000000 AS BIGINT)
                  // (SELECT n FROM nn))) // 100
           + (85 * (COALESCE(c2.s, 0)
                    + (SELECT dang FROM dang2)
                      // (SELECT n FROM nn))) // 100
             AS rank_picos
    FROM nodes LEFT JOIN c2 ON nodes.node = c2.node
"""


def oracle_sql() -> dict[str, str]:
    return {
        "extract_text": f"""
            SELECT {SYNTH_URL_SQL} AS url,
                   text AS extracted_text,
                   {TITLE_SQL} AS title
            FROM documents
        """,
        "extract_from_warc": f"""
            SELECT {SYNTH_URL_SQL} AS url,
                   text AS extracted_text,
                   {TITLE_SQL} AS title
            FROM documents
        """,
        "extract_from_files": f"""
            SELECT {SYNTH_URL_SQL} AS url,
                   text AS extracted_text,
                   {TITLE_SQL} AS title
            FROM documents
        """,
        "extract_links": f"""
            SELECT {SYNTH_URL_SQL} AS url,
                   CAST(doc_id % 4 AS BIGINT) AS n_links
            FROM documents
        """,
        "link_edges": """
            SELECT doc_id AS src,
                   CAST((doc_id + k + 1) % 100000000 AS BIGINT) AS dst
            FROM documents,
            LATERAL unnest(generate_series(0, doc_id % 4 - 1)) AS t(k)
        """,
        "charclass_profile": """
            WITH c AS (
              SELECT doc_id,
                     CAST(length(text) AS BIGINT) AS n_chars,
                     CAST(length(text) - length(regexp_replace(
                          text, '[A-Za-z]', '', 'g')) AS BIGINT)
                       AS alpha,
                     CAST(length(text) - length(regexp_replace(
                          text, '[0-9]', '', 'g')) AS BIGINT)
                       AS digit,
                     CAST(length(text) - length(replace(
                          text, ' ', '')) AS BIGINT) AS space
              FROM documents
            )
            SELECT doc_id, n_chars,
                   CASE WHEN n_chars > 0
                        THEN alpha * 1000 // n_chars ELSE 0 END
                     AS alpha_pm,
                   CASE WHEN n_chars > 0
                        THEN digit * 1000 // n_chars ELSE 0 END
                     AS digit_pm,
                   CASE WHEN n_chars > 0
                        THEN space * 1000 // n_chars ELSE 0 END
                     AS space_pm,
                   CASE WHEN n_chars > 0
                        THEN (n_chars - alpha - digit - space)
                             * 1000 // n_chars ELSE 0 END
                     AS other_pm
            FROM c
        """,
        # 3-gram first-introducer novelty: lead() windows rebuild the
        # n-grams (QUALIFY drops the <n-word tails), distinct
        # (doc, g) pairs, min-doc per g, per-doc totals — integer ppm
        # exactly as functions/curation.novelty_frac computes it.
        "novelty_frac": """
            WITH wl AS (
              SELECT doc_id, string_split(text, ' ') AS l
              FROM documents
            ), grams AS (
              SELECT DISTINCT doc_id,
                     l[i] || ' ' || l[i + 1] || ' ' || l[i + 2] AS g
              FROM wl,
              LATERAL unnest(generate_series(1, len(l) - 2)) AS t(i)
            ), mins AS (
              SELECT g, MIN(doc_id) AS md FROM grams GROUP BY g
            )
            SELECT grams.doc_id,
                   CAST(COUNT(*) AS BIGINT) AS n_ngrams,
                   CAST(SUM(CASE WHEN grams.doc_id = mins.md
                                 THEN 1 ELSE 0 END) AS BIGINT)
                     AS n_first,
                   CAST(SUM(CASE WHEN grams.doc_id = mins.md
                                 THEN 1 ELSE 0 END) * 1000000
                        // COUNT(*) AS BIGINT) AS novelty_ppm
            FROM grams JOIN mins ON grams.g = mins.g
            GROUP BY grams.doc_id
        """,
        # Luhn mod-10 over the closed-form synthetic PAN: positions
        # 1,3,...,15 (1-indexed) double-and-fold — same rule as the
        # numpy kernel (every second digit from the right of an
        # even-length number). n_digit_runs/n_pan16 are closed-form
        # on the controlled field "pay <pan16> ref <doc_id>".
        "ccn_luhn": """
            WITH base AS (
              SELECT doc_id,
                     lpad(CAST((doc_id * 9973 + 123457)
                               % 10000000000000000 AS VARCHAR),
                          16, '0') AS pan
              FROM documents
            ), digits AS (
              SELECT doc_id, i,
                     CAST(substr(pan, i, 1) AS BIGINT) AS d
              FROM base,
              LATERAL unnest(generate_series(1, 16)) AS t(i)
            ), luhn AS (
              SELECT doc_id,
                     SUM(CASE WHEN i % 2 = 1
                              THEN CASE WHEN 2 * d > 9
                                   THEN 2 * d - 9 ELSE 2 * d END
                              ELSE d END) AS s
              FROM digits GROUP BY doc_id
            )
            SELECT doc_id,
                   CAST(2 AS BIGINT) AS n_digit_runs,
                   CAST(1 AS BIGINT) AS n_pan16,
                   CAST(CASE WHEN s % 10 = 0 THEN 1 ELSE 0 END
                        AS BIGINT) AS n_luhn_valid
            FROM luhn
        """,
        "dedup_best_keeper": """
            WITH sig AS (
              SELECT doc_id, CAST(n_chars AS BIGINT) AS n_chars,
                     md5(array_to_string(
                       list_slice(string_split(text, ' '), 1, 2),
                       ' ')) AS content_md5
              FROM documents
            ), ranked AS (
              SELECT content_md5, doc_id, n_chars,
                     ROW_NUMBER() OVER (
                       PARTITION BY content_md5
                       ORDER BY n_chars DESC, doc_id ASC) AS rn,
                     CAST(COUNT(*) OVER (
                       PARTITION BY content_md5) AS BIGINT)
                       AS cluster_size
              FROM sig
            )
            SELECT content_md5, doc_id AS keep_id,
                   n_chars AS best_score, cluster_size
            FROM ranked WHERE rn = 1
        """,
        "dup_host_spread": """
            WITH sig AS (
              SELECT md5(array_to_string(
                       list_slice(string_split(text, ' '), 1, 2),
                       ' ')) AS content_md5,
                     source AS host
              FROM documents
            ), pairs AS (
              SELECT content_md5, host,
                     CAST(COUNT(*) AS BIGINT) AS n
              FROM sig GROUP BY content_md5, host
            )
            SELECT content_md5,
                   CAST(SUM(n) AS BIGINT) AS cluster_size,
                   CAST(COUNT(*) AS BIGINT) AS n_hosts
            FROM pairs GROUP BY content_md5
            HAVING SUM(n) >= 2
        """,
        "pagerank_2iter": _PAGERANK_PICOS_2ITER_SQL,
        # pagerank = the same exact 2-iter integer ranks with ONE
        # final float division (rank_picos / 10^12). int64 ≤ 10^12 is
        # exactly representable in a double and / is a single IEEE op,
        # so the float surface is order-free and hash-checkable too.
        "pagerank": f"""
            SELECT node,
                   rank_picos / 1000000000000.0 AS rank
            FROM ({_PAGERANK_PICOS_2ITER_SQL})
        """,
        "stream_first_paras": f"""
            SELECT {SYNTH_URL_SQL} AS url,
                   array_to_string(list_slice(string_split(text, ' '),
                                              1, 26), ' ') AS first_paras
            FROM documents
        """,
        "extract_spans": f"""
            WITH base AS (
                SELECT doc_id, lang, text,
                       CASE WHEN text = '' THEN 0
                            ELSE length(text)
                                 - length(replace(text, ' ', '')) + 1
                       END AS n_words,
                       split_part(text, ' ', 1) AS w1
                FROM documents
            ), calc AS (
                SELECT *,
                       CASE WHEN text = '' THEN 0
                            ELSE CAST(ceil(n_words / 13.0) AS BIGINT)
                       END AS n_paras
                FROM base
            )
            SELECT {SYNTH_URL_SQL} AS url,
                   n_paras AS n_spans,
                   CASE WHEN text = '' THEN 0
                        ELSE length(text) - (n_paras - 1)
                             + CASE WHEN doc_id % 7 = 3 THEN
                                 5 * length(w1)
                                 - (length(w1) - length(regexp_replace(
                                       w1, '[abc]', '', 'g')))
                               ELSE 0 END
                   END AS span_len_sum
            FROM calc
        """,
        "extract_meta": f"""
            SELECT {SYNTH_URL_SQL} AS url,
                   {TITLE_SQL} AS og_title,
                   'Synth' AS og_site_name,
                   CASE WHEN doc_id % 3 = 0 THEN 'article'
                        ELSE 'website' END AS og_type,
                   lang || '_SY' AS og_locale,
                   CASE WHEN doc_id % 9 = 2
                        THEN 'og about ' || doc_id END AS og_description,
                   CASE WHEN doc_id % 3 = 0
                        THEN 'https://synth.invalid/img/' ||
                             lpad(CAST(doc_id AS VARCHAR), 8, '0') ||
                             '.png' END AS og_image,
                   {SYNTH_URL_SQL} AS og_url,
                   CASE WHEN doc_id % 5 = 0
                        THEN {TITLE_SQL} END AS twitter_title,
                   CASE WHEN doc_id % 2 = 0
                        THEN 'summary' END AS twitter_card,
                   CASE WHEN doc_id % 9 = 2
                        THEN 'tw about ' || doc_id
                        END AS twitter_description,
                   CASE WHEN doc_id % 6 = 0
                        THEN 'https://synth.invalid/img/' ||
                             lpad(CAST(doc_id AS VARCHAR), 8, '0') ||
                             't.png' END AS twitter_image,
                   CASE WHEN doc_id % 8 = 5
                        THEN {TITLE_SQL} END AS meta_title,
                   'synthetic page ' || doc_id AS description,
                   CASE WHEN doc_id % 4 = 1
                        THEN 'Author ' || (doc_id % 50) END AS author,
                   {SYNTH_URL_SQL} AS canonical,
                   {TITLE_SQL} AS html_title,
                   CASE WHEN doc_id % 2 = 1
                        THEN {SYNTH_URL_SQL} || '/favicon.ico'
                        WHEN doc_id % 10 = 6
                        THEN 'http://cdn.synth.invalid/ico/' ||
                             lpad(CAST(doc_id AS VARCHAR), 8, '0') ||
                             '.ico' END AS favicon,
                   CASE WHEN doc_id % 10 = 6
                        THEN 'http://cdn.synth.invalid/ico/' ||
                             lpad(CAST(doc_id AS VARCHAR), 8, '0') ||
                             '.ico' END AS shortcut_icon
            FROM documents
        """,
        "select_css": f"""
            SELECT {SYNTH_URL_SQL} AS url,
                   CAST(CEIL(GREATEST(CASE WHEN text = '' THEN 0
                         ELSE length(text) - length(replace(text, ' ', '')) + 1
                         END, 1) / 13.0 / 5.0) AS BIGINT) AS n_matches
            FROM documents
        """,
        "charset_decode": f"""
            SELECT {SYNTH_URL_SQL} AS url, lang FROM documents
        """,
        "incremental_extract": """
            WITH new AS (
              SELECT doc_id,
                     CASE WHEN doc_id % 10 = 0 THEN text || ' v2'
                          ELSE text END AS text
              FROM documents WHERE doc_id % 17 <> 0
              UNION ALL
              SELECT doc_id + 1000000 AS doc_id, text || ' new' AS text
              FROM documents WHERE doc_id % 23 = 0
            ), diff AS (
              SELECT COALESCE(o.doc_id, n.doc_id) AS doc_id,
                     CASE WHEN o.doc_id IS NULL THEN 'added'
                          WHEN n.doc_id IS NULL THEN 'removed'
                          WHEN md5(o.text) = md5(n.text) THEN 'same'
                          ELSE 'changed' END AS status
              FROM documents o FULL OUTER JOIN new n USING (doc_id)
            )
            SELECT n.doc_id, d.status, n.text AS extracted_text
            FROM new n JOIN diff d ON n.doc_id = d.doc_id
            WHERE d.status IN ('added', 'changed')
        """,
        "crawl_diff": """
            WITH new AS (
              SELECT doc_id,
                     CASE WHEN doc_id % 10 = 0 THEN text || ' v2'
                          ELSE text END AS text
              FROM documents WHERE doc_id % 17 <> 0
              UNION ALL
              SELECT doc_id + 1000000 AS doc_id, text || ' new' AS text
              FROM documents WHERE doc_id % 23 = 0
            )
            SELECT COALESCE(o.doc_id, n.doc_id) AS doc_id,
                   CASE WHEN o.doc_id IS NULL THEN 'added'
                        WHEN n.doc_id IS NULL THEN 'removed'
                        WHEN md5(o.text) = md5(n.text) THEN 'same'
                        ELSE 'changed' END AS status
            FROM documents o FULL OUTER JOIN new n USING (doc_id)
        """,
        "exact_dedup": """
            SELECT MIN(doc_id) AS doc_id, text
            FROM documents GROUP BY text
        """,
        "token_count": """
            SELECT doc_id,
                   CAST(CASE WHEN text = '' OR text IS NULL THEN 0
                        ELSE length(text) - length(replace(text, ' ', '')) + 1
                        END AS BIGINT) AS token_count
            FROM documents
        """,
        "quality": """
            SELECT doc_id,
                   CAST(length(text) AS BIGINT) AS n_chars_q,
                   CAST(CASE WHEN text = '' OR text IS NULL THEN 0
                        ELSE length(text) - length(replace(text, ' ', '')) + 1
                        END AS BIGINT) AS n_words
            FROM documents
        """,
        "fingerprint": """
            SELECT doc_id, md5(text) AS fingerprint FROM documents
        """,
        "gopher_quality": """
            WITH ws AS (SELECT doc_id, string_split(text, ' ') AS w
                        FROM documents),
            wc AS (SELECT doc_id, x, count(*) AS c
                   FROM (SELECT doc_id, unnest(w) AS x FROM ws)
                   GROUP BY doc_id, x),
            wstats AS (SELECT doc_id, SUM(c) AS t, COUNT(*) AS d,
                              MAX(c) AS m
                       FROM wc GROUP BY doc_id),
            bg AS (SELECT doc_id, array_to_string(w[i:i+1], ' ') AS g
                   FROM ws,
                   LATERAL unnest(generate_series(1, len(w)-1)) AS u(i)),
            bstats AS (SELECT doc_id, COUNT(*) AS bt,
                              COUNT(DISTINCT g) AS bd
                       FROM bg GROUP BY doc_id)
            SELECT w.doc_id, CAST(w.t AS BIGINT) AS n_words,
                   w.d / CAST(w.t AS DOUBLE) AS distinct_word_frac,
                   w.m / CAST(w.t AS DOUBLE) AS top_word_frac,
                   COALESCE(1.0 - b.bd / CAST(b.bt AS DOUBLE), 0.0)
                     AS dup_2gram_frac
            FROM wstats w LEFT JOIN bstats b USING (doc_id)
        """,
        "decontaminate": """
            WITH ws AS (SELECT doc_id, source, string_split(text, ' ')
                               AS w FROM documents),
            sh AS (SELECT doc_id, source,
                          array_to_string(w[i:i+2], ' ') AS g
                   FROM ws,
                   LATERAL unnest(generate_series(1, len(w)-2)) AS u(i)),
            bset AS (SELECT DISTINCT g FROM sh WHERE source = 'src0')
            SELECT d.doc_id,
                   CAST(COALESCE(MAX(CASE WHEN s.g IN
                            (SELECT g FROM bset) THEN 1 ELSE 0 END),
                        0) AS BIGINT) AS contaminated
            FROM documents d LEFT JOIN sh s ON s.doc_id = d.doc_id
            WHERE d.source <> 'src0' GROUP BY d.doc_id
        """,
        # density scoring must land exactly on the content div: nav
        # anchor text scores negative, so main_text == the text column
        # (a naive body.text() would prepend the nav 'more k' anchors)
        "main_content": f"""
            SELECT {SYNTH_URL_SQL} AS url,
                   text AS main_text
            FROM documents
        """,
        # identity: the JSONL boundary must preserve every column
        "jsonl_roundtrip": """
            SELECT doc_id, text, lang, source, n_chars FROM documents
        """,
        # strict '>' cascade: step k's clock is the user's MIN step-k
        # event time after their step-(k-1) completion
        "funnel": """
            WITH t1 AS (SELECT user_id, min(ts) AS ts FROM events
                        WHERE event_type = 'view' GROUP BY user_id),
            t2 AS (SELECT e.user_id, min(e.ts) AS ts
                   FROM events e JOIN t1 ON e.user_id = t1.user_id
                        AND e.ts > t1.ts
                   WHERE e.event_type = 'click' GROUP BY e.user_id),
            t3 AS (SELECT e.user_id, min(e.ts) AS ts
                   FROM events e JOIN t2 ON e.user_id = t2.user_id
                        AND e.ts > t2.ts
                   WHERE e.event_type = 'purchase' GROUP BY e.user_id)
            SELECT * FROM (VALUES
                (CAST(1 AS BIGINT), 'view',
                 (SELECT CAST(count(*) AS BIGINT) FROM t1)),
                (CAST(2 AS BIGINT), 'click',
                 (SELECT CAST(count(*) AS BIGINT) FROM t2)),
                (CAST(3 AS BIGINT), 'purchase',
                 (SELECT CAST(count(*) AS BIGINT) FROM t3)))
                AS v(step, event_type, users)
        """,
        # '' splits to [''] (1 token) in BOTH engines; slice is 1-based
        # inclusive; window starts at j*stride while inside the doc
        "chunk_windows": """
            WITH ws AS (SELECT doc_id, string_split(text, ' ') AS w
                        FROM documents),
            n AS (SELECT doc_id, w, len(w) AS n FROM ws),
            j AS (SELECT doc_id, w, n, u.j
                  FROM n, LATERAL unnest(generate_series(0, (n-1)//4))
                       AS u(j))
            SELECT doc_id,
                   CAST(j AS BIGINT) AS chunk_id,
                   CAST(least(8, n - j*4) AS BIGINT) AS n_tokens,
                   array_to_string(w[j*4+1 : least(j*4+8, n)], ' ')
                       AS chunk_text
            FROM j
        """,
        # messy variant (doc_id%5) -> canonical closed form: every rule
        # (host case, :443, fragment, utm strip) must fire to match
        "url_canonical": f"""
            SELECT doc_id,
                   {SYNTH_URL_SQL}
                   || CASE WHEN doc_id % 5 = 3 THEN '?id=7' ELSE '' END
                   AS url_canon
            FROM documents
        """,
        # postings cap at k=8 smallest doc ids; df is the TRUE distinct
        # doc count (list slice [1:8] is 1-based inclusive in DuckDB)
        "inverted_index": """
            WITH ws AS (SELECT doc_id, string_split(text, ' ') AS w
                        FROM documents),
            tok AS (SELECT DISTINCT doc_id, u.t AS term
                    FROM ws, LATERAL unnest(w) AS u(t)
                    WHERE u.t <> ''),
            ag AS (SELECT term, COUNT(*) AS df,
                          list(doc_id ORDER BY doc_id) AS ds
                   FROM tok GROUP BY term)
            SELECT term, CAST(df AS BIGINT) AS df,
                   array_to_string(ds[1:8], ',') AS postings
            FROM ag
        """,
        # bloom prefilter + exact verify join == exact semantics, so
        # the oracle is the SAME query as the exact path
        "decontaminate_bloom": """
            WITH ws AS (SELECT doc_id, source, string_split(text, ' ')
                               AS w FROM documents),
            sh AS (SELECT doc_id, source,
                          array_to_string(w[i:i+2], ' ') AS g
                   FROM ws,
                   LATERAL unnest(generate_series(1, len(w)-2)) AS u(i)),
            bset AS (SELECT DISTINCT g FROM sh WHERE source = 'src0')
            SELECT d.doc_id,
                   CAST(COALESCE(MAX(CASE WHEN s.g IN
                            (SELECT g FROM bset) THEN 1 ELSE 0 END),
                        0) AS BIGINT) AS contaminated
            FROM documents d LEFT JOIN sh s ON s.doc_id = d.doc_id
            WHERE d.source <> 'src0' GROUP BY d.doc_id
        """,
        "normalize_text": """
            SELECT doc_id,
                   trim(nfc_normalize(
                     '  ' || text || ' cafe' || chr(769) || '  '))
                     AS norm_text
            FROM documents
        """,
        "unigram_logprob": """
            WITH words AS (
              SELECT doc_id, unnest(string_split(text, ' ')) AS w
              FROM documents),
            cnt AS (SELECT w, count(*) AS c FROM words GROUP BY w),
            tot AS (SELECT CAST(count(*) AS DOUBLE) AS t FROM words),
            tf AS (SELECT doc_id, w, count(*) AS tf FROM words
                   GROUP BY doc_id, w)
            SELECT tf.doc_id,
                   CAST(SUM(tf.tf * CAST(ROUND(
                       ln(cnt.c / tot.t) * 1000000.0) AS BIGINT))
                     AS BIGINT) AS logprob_micros
            FROM tf JOIN cnt USING (w) CROSS JOIN tot
            GROUP BY tf.doc_id
        """,
        "bm25": """
            WITH words AS (
              SELECT doc_id, unnest(string_split(text, ' ')) AS w
              FROM documents),
            dl AS (SELECT doc_id, CAST(count(*) AS DOUBLE) AS len
                   FROM words GROUP BY doc_id),
            stats AS (SELECT CAST((SELECT count(*) FROM documents)
                                  AS DOUBLE) AS n,
                             (SELECT SUM(len) / count(*) FROM dl)
                               AS avgdl),
            tf AS (SELECT doc_id, w, CAST(count(*) AS DOUBLE) AS tf
                   FROM words WHERE w IN ('spark', 'window', 'merge')
                   GROUP BY doc_id, w),
            df AS (SELECT w, CAST(count(DISTINCT doc_id) AS DOUBLE)
                            AS df
                   FROM words WHERE w IN ('spark', 'window', 'merge')
                   GROUP BY w)
            SELECT t.doc_id,
                   CAST(SUM(CAST(ROUND(
                     ln(1.0 + (s.n - f.df + 0.5) / (f.df + 0.5))
                     * (t.tf * 2.2)
                     / (t.tf + 1.2 * (1.0 - 0.75 + 0.75 * d.len
                                      / s.avgdl))
                     * 1000000.0) AS BIGINT)) AS BIGINT) AS score_micros
            FROM tf t
            JOIN df f ON f.w = t.w
            JOIN dl d ON d.doc_id = t.doc_id
            CROSS JOIN stats s
            GROUP BY t.doc_id
        """,
        "pii_redact": """
            WITH salted AS (
              SELECT doc_id,
                     text || ' contact user' || doc_id ||
                     '@mail.example from 10.0.' || (doc_id % 256) ||
                     '.' || (doc_id % 100) || ' call 555-' ||
                     lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0') ||
                     '-' ||
                     lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
                       AS text
              FROM documents)
            SELECT doc_id,
                   regexp_replace(regexp_replace(regexp_replace(text,
                     '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}',
                     '<EMAIL>', 'g'),
                     '\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b',
                     '<IP>', 'g'),
                     '\\b\\d{3}-\\d{3}-\\d{4}\\b', '<PHONE>', 'g')
                   AS redacted
            FROM salted
        """,
        "ngram_topk": """
            WITH ws AS (SELECT string_split(text, ' ') AS w
                        FROM documents),
            sh AS (SELECT array_to_string(w[i:i+2], ' ') AS g
                   FROM ws,
                   LATERAL unnest(generate_series(1, len(w)-2)) AS u(i))
            SELECT g AS ngram, CAST(count(*) AS BIGINT) AS n FROM sh
            GROUP BY g ORDER BY n DESC, g LIMIT 20
        """,
        "pack_sequences": """
            WITH tok AS (
              SELECT doc_id,
                     CAST(CASE WHEN text = '' OR text IS NULL THEN 0
                          ELSE length(text)
                               - length(replace(text, ' ', '')) + 1
                          END AS BIGINT) AS tc
              FROM documents),
            off AS (
              SELECT doc_id, tc,
                     SUM(tc) OVER (ORDER BY doc_id
                                   ROWS UNBOUNDED PRECEDING) - tc AS o
              FROM tok),
            spans AS (
              SELECT doc_id, tc, o, o // 256 AS b0,
                     (o + tc - 1) // 256 AS b1
              FROM off WHERE tc > 0)
            SELECT CAST(b0 + j AS BIGINT) AS bin_id, doc_id,
                   CAST(LEAST(o + tc, (b0 + j + 1) * 256)
                        - GREATEST(o, (b0 + j) * 256) AS BIGINT)
                     AS tokens_in_bin
            FROM spans,
            LATERAL unnest(generate_series(0, CAST(b1 - b0 AS BIGINT)))
              AS t(j)
        """,
        "token_quantiles": """
            WITH tok AS (SELECT lang,
              CAST(CASE WHEN text = '' OR text IS NULL THEN 0
                   ELSE length(text) - length(replace(text, ' ', '')) + 1
                   END AS BIGINT) AS tc
              FROM documents)
            SELECT lang,
                   CAST(quantile_disc(tc, 0.25) AS BIGINT) AS p25,
                   CAST(quantile_disc(tc, 0.5)  AS BIGINT) AS p50,
                   CAST(quantile_disc(tc, 0.75) AS BIGINT) AS p75,
                   CAST(quantile_disc(tc, 0.9)  AS BIGINT) AS p90
            FROM tok GROUP BY lang
        """,
        "curate": f"""
            -- the full curation composition: exact-dup keepers MINUS
            -- verified near-dups, lang = en, 20 <= tokens <= 90
            WITH keepers AS (
              SELECT MIN(doc_id) AS doc_id FROM documents GROUP BY text
            ), pairs AS ({_JACCARD_PAIRS_SQL}),
            near_dropped AS (SELECT DISTINCT ib AS doc_id FROM pairs),
            tok AS (
              SELECT doc_id, lang,
                     CAST(CASE WHEN text = '' OR text IS NULL THEN 0
                          ELSE length(text)
                               - length(replace(text, ' ', '')) + 1
                          END AS BIGINT) AS token_count
              FROM documents
            )
            SELECT t.doc_id, t.lang, t.token_count
            FROM tok t
            JOIN keepers k ON k.doc_id = t.doc_id
            LEFT JOIN near_dropped d ON d.doc_id = t.doc_id
            WHERE d.doc_id IS NULL
              AND t.lang = 'en'
              AND t.token_count BETWEEN 20 AND 90
        """,
        "web_curate": f"""
            -- the full curation composition: exact-dup keepers MINUS
            -- verified near-dups, lang = en, 20 <= tokens <= 90
            WITH keepers AS (
              SELECT MIN(doc_id) AS doc_id FROM documents GROUP BY text
            ), pairs AS ({_JACCARD_PAIRS_SQL}),
            near_dropped AS (SELECT DISTINCT ib AS doc_id FROM pairs),
            tok AS (
              SELECT doc_id, lang,
                     CAST(CASE WHEN text = '' OR text IS NULL THEN 0
                          ELSE length(text)
                               - length(replace(text, ' ', '')) + 1
                          END AS BIGINT) AS token_count
              FROM documents
            )
            SELECT t.doc_id, t.lang, t.token_count
            FROM tok t
            JOIN keepers k ON k.doc_id = t.doc_id
            LEFT JOIN near_dropped d ON d.doc_id = t.doc_id
            WHERE d.doc_id IS NULL
              AND t.lang = 'en'
              AND t.token_count BETWEEN 20 AND 90
        """,
        "prep_report": f"""
            WITH keepers AS (
              SELECT MIN(doc_id) AS doc_id FROM documents GROUP BY text
            ), pairs AS ({_JACCARD_PAIRS_SQL}),
            near_dropped AS (SELECT DISTINCT ib AS doc_id FROM pairs),
            tok AS (
              SELECT doc_id, lang,
                     CAST(CASE WHEN text = '' OR text IS NULL THEN 0
                          ELSE length(text)
                               - length(replace(text, ' ', '')) + 1
                          END AS BIGINT) AS token_count
              FROM documents
            ), surv AS (
              SELECT t.doc_id, t.token_count
              FROM tok t
              JOIN keepers k ON k.doc_id = t.doc_id
              LEFT JOIN near_dropped d ON d.doc_id = t.doc_id
              WHERE d.doc_id IS NULL
                AND t.lang = 'en'
                AND t.token_count BETWEEN 20 AND 90
            ), sp AS (
              SELECT CAST('0x' || substr(
                       md5(CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT)
                       / 4294967296.0 AS bf,
                     token_count
              FROM surv
            )
            SELECT CASE WHEN bf < 0.8 THEN 'train'
                        WHEN bf < 0.9 THEN 'val'
                        ELSE 'test' END AS split,
                   CAST(count(*) AS BIGINT) AS n_docs,
                   CAST(SUM(token_count) AS BIGINT) AS total_tokens
            FROM sp GROUP BY 1
        """,
        "first_occurrence": """
            SELECT doc_id,
                   CAST(strpos(text, 'data') - 1 AS BIGINT)
                     AS idx_data,
                   CAST(strpos(text, 'join') - 1 AS BIGINT)
                     AS idx_join
            FROM documents
        """,
        "word_len_hist": """
            WITH w AS (
              SELECT unnest(string_split(text, ' ')) AS w
              FROM documents)
            SELECT CAST(length(w) AS BIGINT) AS wlen,
                   CAST(count(*) AS BIGINT) AS n
            FROM w GROUP BY 1
        """,
        "incremental_dedup": """
            WITH a AS (
              SELECT text FROM documents WHERE doc_id % 2 = 0
            ), b AS (
              SELECT d.doc_id,
                     CASE WHEN d.doc_id % 5 = 1 THEN p.text
                          ELSE d.text END AS text
              FROM documents d
              LEFT JOIN documents p ON p.doc_id = d.doc_id - 1
              WHERE d.doc_id % 2 = 1
            ), keep AS (
              SELECT doc_id, text FROM b
              WHERE text NOT IN (SELECT text FROM a)
            ), winners AS (
              SELECT min(doc_id) AS doc_id FROM keep GROUP BY text
            )
            SELECT k.doc_id, k.text
            FROM keep k JOIN winners w ON k.doc_id = w.doc_id
        """,
        "minmax_scale": """
            WITH m AS (
              SELECT lang, CAST(min(n_chars) AS BIGINT) AS lo,
                     CAST(max(n_chars) AS BIGINT) AS hi
              FROM documents GROUP BY lang)
            SELECT d.doc_id, d.lang,
                   CAST((d.n_chars - m.lo) * 1000000
                        // GREATEST(m.hi - m.lo, 1) AS BIGINT)
                     AS scaled_ppm
            FROM documents d JOIN m USING (lang)
        """,
        "event_transitions": """
            WITH o AS (
              SELECT user_id, event_type,
                     lag(event_type) OVER (
                       PARTITION BY user_id
                       ORDER BY ts, event_id) AS prev_type
              FROM events)
            SELECT prev_type AS from_type, event_type AS to_type,
                   CAST(count(*) AS BIGINT) AS n
            FROM o WHERE prev_type IS NOT NULL
            GROUP BY 1, 2
        """,
        "time_to_purchase": """
            WITH m AS (
              SELECT user_id,
                     min(epoch_us(ts)) AS t_all,
                     min(CASE WHEN event_type = 'purchase'
                              THEN epoch_us(ts) END) AS t_buy
              FROM events GROUP BY user_id)
            SELECT user_id,
                   CAST(t_buy - t_all AS BIGINT) AS delta_us
            FROM m WHERE t_buy IS NOT NULL
        """,
        "sessions_per_user_hist": """
            WITH ordered AS (
                SELECT user_id, ts,
                       CASE WHEN ts - lag(ts) OVER w
                                 > INTERVAL 30 MINUTE
                            OR lag(ts) OVER w IS NULL THEN 1 ELSE 0
                       END AS new_session
                FROM events
                WINDOW w AS (PARTITION BY user_id ORDER BY ts)
            ), per_user AS (
                SELECT user_id,
                       CAST(SUM(new_session) AS BIGINT) AS n_sessions
                FROM ordered GROUP BY user_id
            )
            SELECT n_sessions, CAST(count(*) AS BIGINT) AS n_users
            FROM per_user GROUP BY n_sessions
        """,
        "mom_change": """
            WITH m AS (
              SELECT CAST(EXTRACT(year FROM o_orderdate) AS BIGINT)
                       AS o_year,
                     CAST(EXTRACT(month FROM o_orderdate) AS BIGINT)
                       AS o_month,
                     CAST(SUM(CAST(ROUND(o_totalprice * 100)
                                   AS BIGINT)) AS BIGINT)
                       AS revenue_cents
              FROM orders GROUP BY 1, 2),
            d AS (
              SELECT o_year, o_month, revenue_cents,
                     revenue_cents - lag(revenue_cents) OVER (
                       ORDER BY o_year, o_month) AS delta
              FROM m)
            SELECT o_year, o_month, revenue_cents,
                   CAST(delta AS BIGINT) AS delta_cents
            FROM d WHERE delta IS NOT NULL
        """,
        "doc_vocab_richness": """
            WITH w AS (
              SELECT doc_id, unnest(string_split(text, ' ')) AS w
              FROM documents),
            s AS (
              SELECT doc_id,
                     CAST(count(DISTINCT w) AS BIGINT) AS n_distinct,
                     CAST(count(*) AS BIGINT) AS n_words
              FROM w GROUP BY doc_id)
            SELECT doc_id, n_distinct, n_words,
                   CAST(n_distinct * 1000000
                        // GREATEST(n_words, 1) AS BIGINT) AS ttr_ppm
            FROM s
        """,
        "xml_roundtrip": """
            SELECT doc_id, text AS xml_text FROM documents
        """,
        "bpe_token_count": """
            SELECT doc_id,
                   CAST(length(regexp_extract_all(text,
                        '[A-Za-z]+|[0-9]+|[^\\sA-Za-z0-9]')) AS BIGINT)
                       AS bpe_token_count
            FROM documents
        """,
        "ann_topk": f"""
            WITH q AS (
                SELECT row_number() OVER (ORDER BY vec_id) - 1 AS query_idx,
                       embedding AS qe
                FROM embeddings ORDER BY vec_id LIMIT {_ANN_NQ}
            ), ranked AS (
                SELECT CAST(q.query_idx AS INTEGER) AS query_id, e.vec_id,
                       row_number() OVER (
                           PARTITION BY q.query_idx
                           ORDER BY list_cosine_similarity(
                               CAST(q.qe AS DOUBLE[]),
                               CAST(e.embedding AS DOUBLE[])) DESC,
                           e.vec_id) AS rn
                FROM q CROSS JOIN embeddings e
            )
            SELECT query_id, vec_id FROM ranked WHERE rn <= {_ANN_K}
        """,
        "cluster_assign": f"""
            WITH c AS (
                SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cid,
                       embedding AS ce
                FROM embeddings ORDER BY vec_id LIMIT {_IVF_CELLS}
            ), ranked AS (
                SELECT e.vec_id,
                       CAST(c.cid AS INTEGER) AS cluster_id,
                       row_number() OVER (
                           PARTITION BY e.vec_id
                           ORDER BY list_cosine_similarity(
                               CAST(c.ce AS DOUBLE[]),
                               CAST(e.embedding AS DOUBLE[])) DESC,
                           c.cid) AS rn
                FROM embeddings e CROSS JOIN c
            )
            SELECT vec_id, cluster_id FROM ranked WHERE rn = 1
        """,
        # ONE Lloyd step in exact int64 micros: same assignment CTEs
        # as cluster_assign, then per-(cluster, dim) mean of
        # floor(coord*1e6) with truncating // (DuckDB semantics,
        # mirrored by kmeans_mean_step's sign*abs// kernel)
        "kmeans_1step": f"""
            WITH c AS (
                SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cid,
                       embedding AS ce
                FROM embeddings ORDER BY vec_id LIMIT {_IVF_CELLS}
            ), ranked AS (
                SELECT e.vec_id,
                       CAST(c.cid AS INTEGER) AS cluster_id,
                       row_number() OVER (
                           PARTITION BY e.vec_id
                           ORDER BY list_cosine_similarity(
                               CAST(c.ce AS DOUBLE[]),
                               CAST(e.embedding AS DOUBLE[])) DESC,
                           c.cid) AS rn
                FROM embeddings e CROSS JOIN c
            ), a AS (
                SELECT vec_id, cluster_id FROM ranked WHERE rn = 1
            ), ex AS (
                SELECT a.cluster_id,
                       CAST(generate_subscripts(e.embedding, 1)
                            AS BIGINT) AS dim,
                       CAST(FLOOR(CAST(unnest(e.embedding) AS DOUBLE)
                                  * 1000000.0) AS BIGINT) AS v
                FROM embeddings e JOIN a ON e.vec_id = a.vec_id
            )
            SELECT cluster_id, dim,
                   CAST(SUM(v) AS BIGINT) // CAST(COUNT(*) AS BIGINT)
                     AS mean_micros,
                   CAST(COUNT(*) AS BIGINT) AS n
            FROM ex GROUP BY cluster_id, dim
        """,
        # quantized fixed-component projection: zipped unnests of the
        # vector and component lists multiply int-quantized terms,
        # integer SUM -> exact (mirrors quantized_project's int matmul)
        "project_fixed": """
            WITH c AS (
                SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cid,
                       embedding AS ce
                FROM embeddings ORDER BY vec_id LIMIT 4
            ), prods AS (
                SELECT e.vec_id, c.cid,
                       CAST(FLOOR(CAST(unnest(e.embedding) AS DOUBLE)
                                  * 1000.0) AS BIGINT)
                       * CAST(FLOOR(CAST(unnest(c.ce) AS DOUBLE)
                                    * 1000.0) AS BIGINT) AS p
                FROM embeddings e CROSS JOIN c
            )
            SELECT vec_id, CAST(cid AS BIGINT) AS component,
                   CAST(SUM(p) AS BIGINT) AS proj_q
            FROM prods GROUP BY vec_id, cid
        """,
        "stratified_sample": """
            SELECT doc_id, lang FROM documents WHERE doc_id % 100 < 10
        """,
        "top_docs_per_lang": """
            WITH tok AS (
              SELECT doc_id, lang,
                     CAST(CASE WHEN text = '' OR text IS NULL THEN 0
                          ELSE length(text)
                               - length(replace(text, ' ', '')) + 1
                          END AS BIGINT) AS token_count
              FROM documents),
            ranked AS (
              SELECT doc_id, lang, token_count,
                     ROW_NUMBER() OVER (PARTITION BY lang
                         ORDER BY token_count DESC, doc_id) AS r
              FROM tok)
            SELECT doc_id, lang, token_count FROM ranked WHERE r <= 3
        """,
        "lang_counts": """
            SELECT lang, CAST(COUNT(*) AS BIGINT) AS n
            FROM documents GROUP BY lang
        """,
        "hopping_windows": """
            WITH ev AS (SELECT event_type,
                               CAST(epoch_us(ts) AS BIGINT) AS tu
                        FROM events),
            w AS (SELECT event_type,
                         ((tu // 900000000) - j) * 900000000
                           AS window_start
                  FROM ev,
                  LATERAL unnest(generate_series(0, 3)) AS t(j))
            SELECT event_type, window_start,
                   CAST(count(*) AS BIGINT) AS n
            FROM w GROUP BY event_type, window_start
        """,
        "session_attribution": """
            WITH ordered AS (
                SELECT user_id, ts,
                       CASE WHEN ts - lag(ts) OVER w > INTERVAL 30 MINUTE
                            OR lag(ts) OVER w IS NULL THEN 1 ELSE 0
                       END AS new_session
                FROM events
                WINDOW w AS (PARTITION BY user_id ORDER BY ts)
            ), tagged AS (
                SELECT user_id, ts,
                       SUM(new_session) OVER (
                           PARTITION BY user_id ORDER BY ts
                           ROWS UNBOUNDED PRECEDING) AS session_id
                FROM ordered
            ), sessions AS (
                SELECT user_id, MIN(ts) AS s0, MAX(ts) AS s1
                FROM tagged GROUP BY user_id, session_id
            )
            SELECT p.event_id AS left_row_id, p.user_id,
                   CAST(epoch_us(p.ts) AS BIGINT) AS ts_us,
                   CAST(COALESCE(epoch_us(s.s0), -1) AS BIGINT)
                     AS interval_start_us,
                   CAST(COALESCE(epoch_us(s.s1), -1) AS BIGINT)
                     AS interval_end_us
            FROM (SELECT * FROM events WHERE event_type = 'purchase') p
            LEFT JOIN sessions s
              ON s.user_id = p.user_id AND p.ts BETWEEN s.s0 AND s.s1
        """,
        "asof_join": """
            SELECT c.event_id AS left_row_id, c.user_id,
                   CAST(epoch_us(c.ts) AS BIGINT) AS ts_us,
                   CAST(COALESCE(p.event_id, -1) AS BIGINT)
                     AS matched_id,
                   COALESCE(p.value, 0.0) AS matched_val
            FROM (SELECT * FROM events WHERE event_type = 'click') c
            ASOF LEFT JOIN
                 (SELECT * FROM events WHERE event_type = 'purchase') p
              ON c.user_id = p.user_id AND c.ts >= p.ts
        """,
        "sessionize": """
            WITH ordered AS (
                SELECT user_id, ts,
                       CASE WHEN ts - lag(ts) OVER w > INTERVAL 30 MINUTE
                            OR lag(ts) OVER w IS NULL THEN 1 ELSE 0
                       END AS new_session
                FROM events
                WINDOW w AS (PARTITION BY user_id ORDER BY ts)
            ), tagged AS (
                SELECT user_id, ts,
                       SUM(new_session) OVER (
                           PARTITION BY user_id ORDER BY ts
                           ROWS UNBOUNDED PRECEDING) AS session_id
                FROM ordered
            )
            SELECT user_id,
                   CAST(epoch_us(MIN(ts)) AS BIGINT) AS session_start,
                   CAST(epoch_us(MAX(ts)) AS BIGINT) AS session_end,
                   CAST(COUNT(*) AS BIGINT) AS n_events
            FROM tagged GROUP BY user_id, session_id
        """,
        # SCD2: LAG finds the change points, LEAD over the change rows
        # closes each interval; (ts, event_id) tie order matches the
        # Ray kernel's sort
        "scd2_intervals": """
            WITH ordered AS (
                SELECT user_id, event_type, ts, event_id,
                       LAG(event_type) OVER (
                           PARTITION BY user_id
                           ORDER BY ts, event_id) AS prev_attr
                FROM events
            ), runs AS (
                SELECT user_id, event_type, ts AS vf, event_id
                FROM ordered
                WHERE prev_attr IS NULL OR prev_attr <> event_type
            )
            SELECT user_id, event_type,
                   CAST(epoch_us(vf) AS BIGINT) AS valid_from,
                   CAST(epoch_us(LEAD(vf) OVER (
                       PARTITION BY user_id
                       ORDER BY vf, event_id)) AS BIGINT) AS valid_to
            FROM runs
        """,
        "q1_pricing": """
            SELECT l_returnflag, l_linestatus,
                   CAST(SUM(CAST(ROUND(l_quantity) AS BIGINT)) AS BIGINT)
                       AS sum_qty,
                   CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT))
                       AS BIGINT) AS sum_base_price_cents,
                   CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT) *
                            CAST(ROUND((1 - l_discount) * 100) AS BIGINT))
                       AS BIGINT) AS revenue_e4,
                   CAST(COUNT(*) AS BIGINT) AS n_rows
            FROM lineitem
            WHERE l_shipdate <= TIMESTAMP '1998-09-02'
            GROUP BY l_returnflag, l_linestatus
        """,
        "top_customers": """
            SELECT o.o_custkey, ANY_VALUE(c.c_name) AS c_name,
                   CAST(SUM(CAST(ROUND(o.o_totalprice * 100) AS BIGINT))
                       AS BIGINT) AS total_spent_cents
            FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
            GROUP BY o.o_custkey
            ORDER BY total_spent_cents DESC, o.o_custkey
            LIMIT 10
        """,
        "event_windows": """
            SELECT user_id,
                   time_bucket(INTERVAL '60 seconds', ts) AS window_start,
                   CAST(COUNT(*) AS BIGINT) AS n_events,
                   CAST(SUM(CAST(ROUND(value * 1000000) AS BIGINT))
                       AS BIGINT) AS sum_value_micros
            FROM events
            GROUP BY user_id, time_bucket(INTERVAL '60 seconds', ts)
        """,
        "minhash_dedup": f"""
            WITH pairs AS ({_JACCARD_PAIRS_SQL})
            SELECT DISTINCT ib AS doc_id FROM pairs
        """,
        "jaccard_pairs": f"""
            WITH pairs AS ({_JACCARD_PAIRS_SQL})
            SELECT ia AS id_a, ib AS id_b FROM pairs
        """,
        # asymmetric containment over the SAME shingle definition:
        # both directions of each unordered pair, floored-ppm int math
        "containment_pairs": """
            WITH sh AS (
              SELECT doc_id, list_distinct(CASE WHEN len(words) < 5
                       THEN [array_to_string(words, ' ')]
                       ELSE list_transform(range(1, len(words) - 3),
                                i -> array_to_string(words[i:i+4], ' '))
                       END) AS s
              FROM (SELECT doc_id, string_split(text, ' ') AS words
                    FROM documents)
            ), ex AS (SELECT doc_id, unnest(s) AS g FROM sh),
            inter AS (
              SELECT a.doc_id AS ia, b.doc_id AS ib, count(*) AS i
              FROM ex a JOIN ex b ON a.g = b.g AND a.doc_id < b.doc_id
              GROUP BY 1, 2
            ), sizes AS (SELECT doc_id, len(s) AS n FROM sh),
            directed AS (
              SELECT ia AS id_sub, ib AS id_super, i, sa.n AS nsub
              FROM inter JOIN sizes sa ON sa.doc_id = ia
              UNION ALL
              SELECT ib, ia, i, sb.n
              FROM inter JOIN sizes sb ON sb.doc_id = ib
            )
            SELECT id_sub, id_super,
                   CAST(i * 1000000 // nsub AS BIGINT) AS cont_ppm
            FROM directed
            WHERE i * 1000000 >= 600000 * nsub
        """,
        # transitive closure over the exact simhash pair graph —
        # same recursive-CTE shape as dedup_components
        "simhash_components": """
            WITH RECURSIVE words AS (
              SELECT doc_id, unnest(string_split(text, ' ')) AS w
              FROM documents
            ), hashed AS (
              SELECT doc_id,
                     CAST(concat('0x', substr(md5(w), 1, 16)) AS UBIGINT) AS h
              FROM words WHERE w <> ''
            ), bits AS (
              SELECT doc_id, b.bit,
                     SUM(CASE WHEN (h >> b.bit) & 1 = 1 THEN 1 ELSE -1 END)
                         AS acc
              FROM hashed, (SELECT unnest(range(64)) AS bit) b
              GROUP BY doc_id, b.bit
            ), sig AS (
              SELECT doc_id,
                     SUM(CASE WHEN acc > 0
                          THEN (CAST(1 AS UBIGINT) << bit)
                          ELSE CAST(0 AS UBIGINT) END) AS sh
              FROM bits GROUP BY doc_id
            ), sigs AS (
              SELECT d.doc_id, COALESCE(s.sh, CAST(0 AS UBIGINT)) AS sh
              FROM documents d LEFT JOIN sig s ON d.doc_id = s.doc_id
            ), pairs AS (
              SELECT a.doc_id AS ia, b.doc_id AS ib
              FROM sigs a JOIN sigs b ON a.doc_id < b.doc_id
              WHERE bit_count(xor(a.sh, b.sh)) <= 3
            ), edges AS (
              SELECT ia AS n, ib AS m FROM pairs
              UNION SELECT ib, ia FROM pairs
              UNION SELECT ia, ia FROM pairs
              UNION SELECT ib, ib FROM pairs
            ), reach(n, m) AS (
              SELECT n, m FROM edges
              UNION
              SELECT r.n, e.m FROM reach r JOIN edges e ON r.m = e.n
            )
            SELECT n AS node_id, MIN(m) AS component_id
            FROM reach GROUP BY n
        """,
        "embed_neardup": """
            SELECT a.vec_id AS id_a, b.vec_id AS id_b
            FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
            WHERE list_cosine_similarity(a.embedding, b.embedding) >= 0.465
        """,
        "dedup_components": f"""
            WITH RECURSIVE pairs AS ({_JACCARD_PAIRS_SQL}),
            edges AS (
              SELECT ia AS n, ib AS m FROM pairs
              UNION SELECT ib, ia FROM pairs
              UNION SELECT ia, ia FROM pairs
              UNION SELECT ib, ib FROM pairs
            ),
            reach(n, m) AS (
              SELECT n, m FROM edges
              UNION
              SELECT r.n, e.m FROM reach r JOIN edges e ON r.m = e.n
            )
            SELECT n AS node_id, MIN(m) AS component_id FROM reach GROUP BY n
        """,
        "simhash": """
            WITH words AS (
              SELECT doc_id, unnest(string_split(text, ' ')) AS w
              FROM documents
            ), hashed AS (
              SELECT doc_id,
                     CAST(concat('0x', substr(md5(w), 1, 16)) AS UBIGINT) AS h
              FROM words WHERE w <> ''
            ), bits AS (
              SELECT doc_id, b.bit,
                     SUM(CASE WHEN (h >> b.bit) & 1 = 1 THEN 1 ELSE -1 END)
                         AS acc
              FROM hashed, (SELECT unnest(range(64)) AS bit) b
              GROUP BY doc_id, b.bit
            ), sig AS (
              SELECT doc_id,
                     SUM(CASE WHEN acc > 0
                          THEN (CAST(1 AS UBIGINT) << bit)
                          ELSE CAST(0 AS UBIGINT) END) AS sh
              FROM bits GROUP BY doc_id
            )
            SELECT d.doc_id,
                   lower(lpad(to_hex(COALESCE(s.sh, 0)), 16, '0'))
                       AS simhash_hex
            FROM documents d LEFT JOIN sig s ON d.doc_id = s.doc_id
        """,
        # O(n^2) brute-force self-join over the same in-SQL signature
        # recomputation — the Ray side's pigeonhole blocking must
        # reproduce it exactly (100% recall, ownership-deduped)
        "simhash_pairs": """
            WITH words AS (
              SELECT doc_id, unnest(string_split(text, ' ')) AS w
              FROM documents
            ), hashed AS (
              SELECT doc_id,
                     CAST(concat('0x', substr(md5(w), 1, 16)) AS UBIGINT) AS h
              FROM words WHERE w <> ''
            ), bits AS (
              SELECT doc_id, b.bit,
                     SUM(CASE WHEN (h >> b.bit) & 1 = 1 THEN 1 ELSE -1 END)
                         AS acc
              FROM hashed, (SELECT unnest(range(64)) AS bit) b
              GROUP BY doc_id, b.bit
            ), sig AS (
              SELECT doc_id,
                     SUM(CASE WHEN acc > 0
                          THEN (CAST(1 AS UBIGINT) << bit)
                          ELSE CAST(0 AS UBIGINT) END) AS sh
              FROM bits GROUP BY doc_id
            ), sigs AS (
              SELECT d.doc_id, COALESCE(s.sh, CAST(0 AS UBIGINT)) AS sh
              FROM documents d LEFT JOIN sig s ON d.doc_id = s.doc_id
            )
            SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                   CAST(bit_count(xor(a.sh, b.sh)) AS BIGINT) AS hamming
            FROM sigs a JOIN sigs b ON a.doc_id < b.doc_id
            WHERE bit_count(xor(a.sh, b.sh)) <= 3
        """,
        "langid": _LANGID_SQL,
        # confusion matrix = the langid oracle as a subquery joined
        # back to the labeled lang — same prediction rule, cross-tab
        "langid_confusion": """
            WITH pred AS (""" + _LANGID_SQL + """)
            SELECT d.lang, p.pred_lang, CAST(count(*) AS BIGINT) AS n
            FROM pred p JOIN documents d ON d.doc_id = p.doc_id
            GROUP BY d.lang, p.pred_lang
        """,
        "ann_ivf": f"""
            WITH cents AS (
                SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cid,
                       embedding AS ce
                FROM embeddings ORDER BY vec_id LIMIT {_IVF_CELLS}
            ), q AS (
                SELECT row_number() OVER (ORDER BY vec_id) - 1 AS query_idx,
                       embedding AS qe
                FROM embeddings ORDER BY vec_id LIMIT {_ANN_NQ}
            ), assign AS (
                SELECT vec_id, embedding, cid FROM (
                    SELECT e.vec_id, e.embedding, c.cid,
                           row_number() OVER (PARTITION BY e.vec_id
                               ORDER BY list_cosine_similarity(
                                   CAST(e.embedding AS DOUBLE[]),
                                   CAST(c.ce AS DOUBLE[])) DESC,
                               c.cid) AS rn
                    FROM embeddings e CROSS JOIN cents c)
                WHERE rn = 1
            ), probes AS (
                SELECT query_idx, cid FROM (
                    SELECT q.query_idx, c.cid,
                           row_number() OVER (PARTITION BY q.query_idx
                               ORDER BY list_cosine_similarity(
                                   CAST(q.qe AS DOUBLE[]),
                                   CAST(c.ce AS DOUBLE[])) DESC,
                               c.cid) AS rn
                    FROM q CROSS JOIN cents c)
                WHERE rn <= {_IVF_NPROBE}
            ), ranked AS (
                SELECT CAST(q.query_idx AS INTEGER) AS query_id, a.vec_id,
                       row_number() OVER (PARTITION BY q.query_idx
                           ORDER BY list_cosine_similarity(
                               CAST(q.qe AS DOUBLE[]),
                               CAST(a.embedding AS DOUBLE[])) DESC,
                           a.vec_id) AS rn
                FROM q
                JOIN probes p ON p.query_idx = q.query_idx
                JOIN assign a ON a.cid = p.cid
            )
            SELECT query_id, vec_id FROM ranked WHERE rn <= {_ANN_K}
        """,
        "sanitize": f"""
            SELECT {SYNTH_URL_SQL} AS url,
                   CASE WHEN text = '' THEN '<p></p>'
                        ELSE array_to_string(list_transform(
                            range(1, len(string_split(text, ' ')) + 1, 13),
                            i -> '<p>' || array_to_string(
                                string_split(text, ' ')[i:i+12], ' ')
                                 || '</p>'), chr(10))
                   END AS clean_html
            FROM documents
        """,
        "media_features": """
            -- closed forms of the DECODED values: the Ray side gets
            -- width/height by decoding the PPM payload, duration by
            -- parsing the WAV header, and video dims/duration by
            -- parsing the Y4M stream (frames @ 25 fps), so a decoder
            -- bug in any modality breaks the hash match. n_bytes:
            -- PPM = 9 + digits(w) + digits(h) + 3wh; WAV = 44-byte
            -- PCM header + 2 bytes/sample @1000 Hz; Y4M = 33 +
            -- digits(w) + digits(h) + n*(6 + 3wh).
            SELECT doc_id AS media_id,
                   CASE doc_id % 3
                        WHEN 0 THEN CAST(4 + doc_id % 13 AS INTEGER)
                        WHEN 2 THEN CAST(4 + doc_id % 9 AS INTEGER)
                        END AS width,
                   CASE doc_id % 3
                        WHEN 0 THEN CAST(3 + doc_id % 7 AS INTEGER)
                        WHEN 2 THEN CAST(3 + doc_id % 6 AS INTEGER)
                        END AS height,
                   CASE doc_id % 3
                        WHEN 1 THEN CAST(1000 + doc_id % 5000 AS INTEGER)
                        WHEN 2 THEN CAST(40 * (3 + doc_id % 5) AS INTEGER)
                        END AS duration_ms,
                   CASE doc_id % 3
                        WHEN 0 THEN CAST(
                            9 + LENGTH(CAST(4 + doc_id % 13 AS VARCHAR))
                              + LENGTH(CAST(3 + doc_id % 7 AS VARCHAR))
                              + 3 * (4 + doc_id % 13) * (3 + doc_id % 7)
                            AS BIGINT)
                        WHEN 1 THEN CAST(44 + 2 * (1000 + doc_id % 5000)
                                         AS BIGINT)
                        ELSE CAST(
                            33 + LENGTH(CAST(4 + doc_id % 9 AS VARCHAR))
                               + LENGTH(CAST(3 + doc_id % 6 AS VARCHAR))
                               + (3 + doc_id % 5)
                                 * (6 + 3 * (4 + doc_id % 9)
                                          * (3 + doc_id % 6))
                            AS BIGINT) END AS n_bytes,
                   CASE doc_id % 3 WHEN 0 THEN 'image'
                        WHEN 1 THEN 'audio' ELSE 'video' END AS media_type,
                   CASE doc_id % 3 WHEN 0 THEN 'ppm'
                        WHEN 1 THEN 'wav' ELSE 'y4m' END AS format
            FROM documents
        """,
        "png_decode": """
            -- replay the synth PNG pixels in closed form: the Ray
            -- side gets pixel_sum only by actually inflating IDAT and
            -- reversing all five scanline filters, so this hash-checks
            -- the compressed decode byte-for-byte.
            -- pixel[y,x,c] = (doc_id + 7x + 13y + 101c) % 256,
            -- w = 4 + doc_id % 13 (<= 16), h = 3 + doc_id % 7 (<= 9)
            SELECT d.doc_id AS media_id,
                   CAST(4 + d.doc_id % 13 AS INTEGER) AS width,
                   CAST(3 + d.doc_id % 7 AS INTEGER) AS height,
                   CAST(SUM((d.doc_id + 7 * x.r + 13 * y.r + 101 * c.r)
                            % 256) AS BIGINT) AS pixel_sum
            FROM documents d
            JOIN (SELECT UNNEST(range(16)) AS r) x
                 ON x.r < 4 + d.doc_id % 13
            JOIN (SELECT UNNEST(range(9)) AS r) y
                 ON y.r < 3 + d.doc_id % 7
            JOIN (SELECT UNNEST(range(3)) AS r) c ON TRUE
            GROUP BY d.doc_id
        """,
        "gif_decode": """
            -- replay the synth GIF pixels in closed form: the Ray
            -- side gets pixel_sum only by LZW-decompressing the
            -- stream and mapping indices through the palette.
            -- index = (doc_id + 3x + 7y) % 64;
            -- palette[k] = ((3k)%256, (5k+7)%256, (11k+13)%256);
            -- w = 5 + doc_id % 12 (<= 16), h = 4 + doc_id % 9 (<= 12)
            SELECT d.doc_id AS media_id,
                   CAST(5 + d.doc_id % 12 AS INTEGER) AS width,
                   CAST(4 + d.doc_id % 9 AS INTEGER) AS height,
                   CAST(SUM(
                       (3 * ((d.doc_id + 3 * x.r + 7 * y.r) % 64))
                           % 256
                     + (5 * ((d.doc_id + 3 * x.r + 7 * y.r) % 64) + 7)
                           % 256
                     + (11 * ((d.doc_id + 3 * x.r + 7 * y.r) % 64)
                        + 13) % 256) AS BIGINT) AS pixel_sum
            FROM documents d
            JOIN (SELECT UNNEST(range(16)) AS r) x
                 ON x.r < 5 + d.doc_id % 12
            JOIN (SELECT UNNEST(range(12)) AS r) y
                 ON y.r < 4 + d.doc_id % 9
            GROUP BY d.doc_id
        """,
        "jpeg_codec": """
            -- lossy codec: dims are exact closed forms; the error
            -- bound is a boolean witness the Ray side must earn by
            -- actually decoding (TRUE is only reachable when the
            -- huffman/DCT/assembly path reconstructs the image)
            SELECT doc_id AS media_id,
                   CAST(9 + doc_id % 16 AS INTEGER) AS width,
                   CAST(7 + doc_id % 12 AS INTEGER) AS height,
                   CASE WHEN doc_id % 2 = 1 THEN '420' ELSE '444' END
                       AS subsample,
                   TRUE AS roundtrip_ok
            FROM documents
        """,
        "y4m_decode": """
            -- replay the synth Y4M planes in closed form: the Ray
            -- side gets y_sum/uv_sum only by parsing the stream
            -- header, every FRAME marker, and every raw plane.
            -- Y = (d + 3x + 7y + 11t + 128*(t>=cut)) % 256,
            -- U = (2d + 5x + y + 17t) % 256,
            -- V = (3d + x + 9y + 23t) % 256 over
            -- w = 4 + d%9, h = 3 + d%6, n = 3 + d%5,
            -- cut = 1 + d % (n - 1)
            SELECT d.doc_id AS media_id,
                   CAST(3 + d.doc_id % 5 AS INTEGER) AS n_frames,
                   CAST(4 + d.doc_id % 9 AS INTEGER) AS width,
                   CAST(3 + d.doc_id % 6 AS INTEGER) AS height,
                   CAST(SUM((d.doc_id + 3 * x.r + 7 * y.r + 11 * t.r
                             + CASE WHEN t.r >= 1 + d.doc_id
                                              % (2 + d.doc_id % 5)
                                    THEN 128 ELSE 0 END) % 256)
                        AS BIGINT) AS y_sum,
                   CAST(SUM((2 * d.doc_id + 5 * x.r + y.r + 17 * t.r)
                            % 256
                          + (3 * d.doc_id + x.r + 9 * y.r + 23 * t.r)
                            % 256) AS BIGINT) AS uv_sum
            FROM documents d
            JOIN (SELECT UNNEST(range(12)) AS r) x
                 ON x.r < 4 + d.doc_id % 9
            JOIN (SELECT UNNEST(range(8)) AS r) y
                 ON y.r < 3 + d.doc_id % 6
            JOIN (SELECT UNNEST(range(7)) AS r) t
                 ON t.r < 3 + d.doc_id % 5
            GROUP BY d.doc_id
        """,
        "frame_sample": """
            -- every 2nd frame of each clip, one row per sampled
            -- frame with its closed-form luma sum
            SELECT d.doc_id AS media_id,
                   CAST(t.r AS INTEGER) AS frame_idx,
                   CAST(4 + d.doc_id % 9 AS INTEGER) AS width,
                   CAST(3 + d.doc_id % 6 AS INTEGER) AS height,
                   CAST(SUM((d.doc_id + 3 * x.r + 7 * y.r + 11 * t.r
                             + CASE WHEN t.r >= 1 + d.doc_id
                                              % (2 + d.doc_id % 5)
                                    THEN 128 ELSE 0 END) % 256)
                        AS BIGINT) AS y_sum
            FROM documents d
            JOIN (SELECT UNNEST(range(7)) AS r) t
                 ON t.r < 3 + d.doc_id % 5 AND t.r % 2 = 0
            JOIN (SELECT UNNEST(range(12)) AS r) x
                 ON x.r < 4 + d.doc_id % 9
            JOIN (SELECT UNNEST(range(8)) AS r) y
                 ON y.r < 3 + d.doc_id % 6
            GROUP BY d.doc_id, t.r
        """,
        "scene_cuts": """
            -- per adjacent frame pair: sum of absolute luma diffs
            -- replayed term for term (all-integer), and the cut
            -- decision sad > 64 * w * h. frame_idx = the LATER frame.
            SELECT media_id, frame_idx, sad,
                   sad > 64 * width * height AS is_cut
            FROM (
                SELECT d.doc_id AS media_id,
                       CAST(t.r AS INTEGER) AS frame_idx,
                       CAST(4 + d.doc_id % 9 AS INTEGER) AS width,
                       CAST(3 + d.doc_id % 6 AS INTEGER) AS height,
                       CAST(SUM(ABS(
                           (d.doc_id + 3 * x.r + 7 * y.r + 11 * t.r
                            + CASE WHEN t.r >= 1 + d.doc_id
                                             % (2 + d.doc_id % 5)
                                   THEN 128 ELSE 0 END) % 256
                         - (d.doc_id + 3 * x.r + 7 * y.r
                            + 11 * (t.r - 1)
                            + CASE WHEN t.r - 1 >= 1 + d.doc_id
                                             % (2 + d.doc_id % 5)
                                   THEN 128 ELSE 0 END) % 256))
                            AS BIGINT) AS sad
                FROM documents d
                JOIN (SELECT UNNEST(range(7)) AS r) t
                     ON t.r >= 1 AND t.r < 3 + d.doc_id % 5
                JOIN (SELECT UNNEST(range(12)) AS r) x
                     ON x.r < 4 + d.doc_id % 9
                JOIN (SELECT UNNEST(range(8)) AS r) y
                     ON y.r < 3 + d.doc_id % 6
                GROUP BY d.doc_id, t.r
            )
        """,
        "langid_margin": """
            WITH m(lang, w, pri) AS (VALUES
              ('en','the',1),('en','and',1),('en','of',1),('en','to',1),
              ('en','a',1),('en','in',1),('en','is',1),('en','it',1),
              ('en','that',1),
              ('de','der',2),('de','die',2),('de','das',2),('de','und',2),
              ('de','ist',2),('de','nicht',2),('de','ein',2),('de','zu',2),
              ('fr','le',3),('fr','la',3),('fr','les',3),('fr','et',3),
              ('fr','est',3),('fr','un',3),('fr','une',3),('fr','que',3),
              ('es','el',4),('es','la',4),('es','los',4),('es','y',4),
              ('es','es',4),('es','un',4),('es','una',4),('es','que',4),
              ('es','de',4)
            ), words AS (
              SELECT doc_id, unnest(string_split(lower(text), ' ')) AS w
              FROM documents
            ), sc AS (
              SELECT words.doc_id, m.lang, min(m.pri) AS pri,
                     CAST(count(*) AS BIGINT) AS score
              FROM words JOIN m ON words.w = m.w
              GROUP BY words.doc_id, m.lang
            ), ranked AS (
              SELECT doc_id, lang, score, pri,
                     row_number() OVER (PARTITION BY doc_id
                         ORDER BY score DESC, pri ASC) AS rn,
                     row_number() OVER (PARTITION BY doc_id
                         ORDER BY score DESC) AS rnv
              FROM sc
            ), stats AS (
              SELECT doc_id,
                     MAX(CASE WHEN rn = 1 THEN score END) AS best,
                     MAX(CASE WHEN rn = 1 THEN lang END) AS blang,
                     COALESCE(MAX(CASE WHEN rnv = 2 THEN score END),
                              0) AS second
              FROM ranked GROUP BY doc_id
            )
            SELECT d.doc_id,
                   CASE WHEN regexp_matches(d.text,
                        '[\\x{4E00}-\\x{9FFF}\\x{3040}-\\x{30FF}\\x{AC00}-\\x{D7AF}]')
                        THEN 'zh'
                        WHEN s.blang IS NOT NULL THEN s.blang
                        ELSE 'und' END AS pred_lang,
                   COALESCE(s.best, 0) AS best_score,
                   COALESCE(s.best, 0) - COALESCE(s.second, 0)
                     AS margin
            FROM documents d
            LEFT JOIN stats s ON s.doc_id = d.doc_id
        """,
        "late_data_audit": """
            WITH mx AS (
              SELECT MAX(CAST(epoch_us(ts) AS BIGINT)) AS m
              FROM events
            )
            SELECT (CAST(epoch_us(ts) AS BIGINT) // 86400000000)
                     * 86400000000 AS window_start,
                   CAST(COUNT(*) AS BIGINT) AS n_events,
                   CAST(SUM(CASE WHEN CAST(epoch_us(ts) AS BIGINT)
                                 < (SELECT m FROM mx)
                                   - 604800000000
                                 THEN 1 ELSE 0 END) AS BIGINT)
                     AS n_late
            FROM events
            GROUP BY 1
        """,
        "mix_sample": """
            WITH counts AS (
              SELECT CAST(COUNT(*) AS BIGINT) AS n FROM documents
            ), t AS (
              SELECT n * 100 // 1000 AS T FROM counts
            ), w(lang, wpm) AS (
              VALUES ('de', 200), ('en', 400), ('es', 120),
                     ('fr', 200), ('zh', 80)
            ), base AS (
              SELECT lang,
                     (SELECT T FROM t) * wpm // 1000 AS b,
                     ((SELECT T FROM t) * wpm) % 1000 AS fr
              FROM w
            ), rem AS (
              SELECT (SELECT T FROM t) - SUM(b) AS r FROM base
            ), ranked AS (
              SELECT lang, b,
                     ROW_NUMBER() OVER (ORDER BY fr DESC, lang ASC)
                       AS rk
              FROM base
            ), quota AS (
              SELECT lang,
                     b + CASE WHEN rk <= (SELECT r FROM rem)
                              THEN 1 ELSE 0 END AS q
              FROM ranked
            ), ordered AS (
              SELECT doc_id, lang,
                     ROW_NUMBER() OVER (
                       PARTITION BY lang
                       ORDER BY md5(CAST(doc_id AS VARCHAR)),
                                doc_id) AS rn
              FROM documents
            )
            SELECT o.doc_id, o.lang
            FROM ordered o JOIN quota ON o.lang = quota.lang
            WHERE o.rn <= quota.q
        """,
        "mp4_mjpeg": """
            -- MP4/MJPEG: container fields + the 19-box pre-order
            -- count are exact closed forms; the witness is only
            -- reachable by walking ISO-BMFF and JPEG-decoding every
            -- sample through the stsc/stco/stsz chunk maps
            SELECT doc_id AS media_id,
                   CAST(2 + doc_id % 3 AS INTEGER) AS n_frames,
                   CAST(9 + doc_id % 16 AS INTEGER) AS width,
                   CAST(7 + doc_id % 12 AS INTEGER) AS height,
                   CAST(19 AS INTEGER) AS n_boxes,
                   TRUE AS roundtrip_ok
            FROM documents
        """,
        "avi_mjpeg": """
            -- MJPEG-AVI: container fields are exact closed forms;
            -- the error-bound witness is only reachable by walking
            -- the RIFF tree and JPEG-decoding every 00dc chunk
            SELECT doc_id AS media_id,
                   CAST(2 + doc_id % 3 AS INTEGER) AS n_frames,
                   CAST(9 + doc_id % 16 AS INTEGER) AS width,
                   CAST(7 + doc_id % 12 AS INTEGER) AS height,
                   TRUE AS roundtrip_ok
            FROM documents
        """,
        "pdf_roundtrip": """
            -- the PDF write->parse->extract loop must return the text
            -- verbatim; page/line counts are closed-form in the word
            -- count (8 words/line, 5 lines/page; empty text is one
            -- empty line on one page)
            SELECT doc_id,
                   text AS pdf_text,
                   CAST((((LENGTH(text) - LENGTH(REPLACE(text, ' ', ''))
                           + 1) + 7) // 8 + 4) // 5 AS BIGINT) AS n_pages,
                   CAST(((LENGTH(text) - LENGTH(REPLACE(text, ' ', ''))
                          + 1) + 7) // 8 AS BIGINT) AS n_lines
            FROM documents
        """,
        # sub-document dedup replayed in SQL: unnest words, regroup
        # into 10-word segments, a window MIN over packed
        # (doc_id*2^20+seg_idx) picks each distinct segment's first
        # corpus occurrence, survivors re-concatenate in seg order
        "segment_dedup": """
            WITH words AS (
                SELECT doc_id,
                       CAST(generate_subscripts(
                           string_split(text, ' '), 1) AS BIGINT) - 1
                           AS widx,
                       unnest(string_split(text, ' ')) AS w
                FROM documents
            ), segs AS (
                SELECT doc_id, widx // 10 AS seg_idx,
                       string_agg(w, ' ' ORDER BY widx) AS seg
                FROM words GROUP BY doc_id, widx // 10
            ), flagged AS (
                SELECT doc_id, seg_idx, seg,
                       (doc_id * 1048576 + seg_idx) =
                           MIN(doc_id * 1048576 + seg_idx)
                               OVER (PARTITION BY seg) AS keep
                FROM segs
            )
            SELECT doc_id,
                   COALESCE(string_agg(seg, ' ' ORDER BY seg_idx)
                                FILTER (WHERE keep), '') AS dedup_text,
                   CAST(COUNT(*) FILTER (WHERE keep) AS BIGINT)
                       AS n_kept,
                   CAST(COUNT(*) AS BIGINT) AS n_total
            FROM flagged GROUP BY doc_id
        """,
        # synth nav convention: doc d links to (d+k+1)%1e8 with anchor
        # 'more k' (k single-digit, so lexical anchor order == numeric)
        "anchor_texts": """
            WITH e AS (
                SELECT doc_id AS src,
                       CAST((doc_id + k + 1) % 100000000 AS BIGINT)
                           AS dst,
                       'more ' || k AS anchor
                FROM documents,
                LATERAL unnest(generate_series(0, doc_id % 4 - 1))
                    AS t(k)
            )
            SELECT dst,
                   string_agg(anchor, '|' ORDER BY src, anchor)
                       AS anchors,
                   CAST(COUNT(*) AS BIGINT) AS n_inbound
            FROM e GROUP BY dst
        """,
        "latest_event": """
            SELECT user_id, event_id,
                   CAST(epoch_us(ts) AS BIGINT) AS ts,
                   event_type, value
            FROM (SELECT *, row_number() OVER (
                      PARTITION BY user_id
                      ORDER BY ts DESC, event_id DESC) AS rn
                  FROM events)
            WHERE rn = 1
        """,
        "per_source_cap": """
            SELECT doc_id, source
            FROM (SELECT doc_id, source, row_number() OVER (
                      PARTITION BY source ORDER BY doc_id) AS rn
                  FROM documents)
            WHERE rn <= 20
        """,
        # DSIR with unigram features, add-one smoothing: per-word
        # delta = round((ln p_en(w) - ln p_raw(w)) * 1e6) — same
        # int-micro convention as unigram_logprob
        "dsir_weights": """
            WITH words AS (
                SELECT doc_id, lang, unnest(string_split(text, ' '))
                    AS w
                FROM documents
            ), vocab AS (
                SELECT w, CAST(COUNT(*) AS BIGINT) AS cr,
                       CAST(COUNT(*) FILTER (WHERE lang = 'en')
                            AS BIGINT) AS ct
                FROM words GROUP BY w
            ), tot AS (
                SELECT CAST(SUM(cr) AS DOUBLE) AS tr,
                       CAST(SUM(ct) AS DOUBLE) AS tt,
                       CAST(COUNT(*) AS DOUBLE) AS v
                FROM vocab
            ), delta AS (
                SELECT w, CAST(ROUND(
                           (ln((ct + 1.0) / (tt + v))
                            - ln((cr + 1.0) / (tr + v)))
                           * 1000000.0) AS BIGINT) AS lam
                FROM vocab CROSS JOIN tot
            ), tf AS (
                SELECT doc_id, w, CAST(COUNT(*) AS BIGINT) AS tf
                FROM words GROUP BY doc_id, w
            )
            SELECT tf.doc_id,
                   CAST(SUM(tf.tf * delta.lam) AS BIGINT)
                       AS logweight_micros
            FROM tf JOIN delta USING (w) GROUP BY tf.doc_id
        """,
        "region_counts": """
            SELECT r_name, CAST(COUNT(*) AS BIGINT) AS n_customers
            FROM customer
            JOIN nation ON c_nationkey = n_nationkey
            JOIN region ON n_regionkey = r_regionkey
            GROUP BY r_name
        """,
        "running_total": """
            SELECT user_id, event_id,
                   CAST(epoch_us(ts) AS BIGINT) AS ts,
                   CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) OVER (
                       PARTITION BY user_id
                       ORDER BY events.ts, event_id)
                       AS BIGINT) AS cum_cents
            FROM events
        """,
        # tf-idf with int-micro idf (round(ln(N/df)*1e6)), top-3 per
        # doc, ties on the term ascending — same rounding convention
        # as unigram_logprob/dsir_weights
        "tfidf_topk": """
            WITH words AS (
                SELECT doc_id, unnest(string_split(text, ' ')) AS w
                FROM documents
            ), tf AS (
                SELECT doc_id, w, CAST(COUNT(*) AS BIGINT) AS tf
                FROM words GROUP BY doc_id, w
            ), df AS (
                SELECT w, CAST(COUNT(*) AS BIGINT) AS df
                FROM tf GROUP BY w
            ), n AS (
                SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM documents
            ), scored AS (
                SELECT tf.doc_id, tf.w,
                       tf.tf * CAST(ROUND(ln(n.n / df.df) * 1000000.0)
                                    AS BIGINT) AS s
                FROM tf JOIN df USING (w) CROSS JOIN n
            ), ranked AS (
                SELECT doc_id, w, s, row_number() OVER (
                           PARTITION BY doc_id
                           ORDER BY s DESC, w) AS rn
                FROM scored
            )
            SELECT doc_id, w AS term, s AS tfidf_micros,
                   CAST(rn AS BIGINT) AS rank
            FROM ranked WHERE rn <= 3
        """,
        "distinct_texts": """
            SELECT CAST(COUNT(DISTINCT text) AS BIGINT) AS n_distinct
            FROM documents
        """,
        # per-(doc,word) term rounded to integer micro-nats BEFORE the
        # per-doc sum (order-free) — same expression tree as
        # textstats.word_entropy_batch
        "word_entropy": """
            WITH words AS (
              SELECT doc_id, unnest(string_split(text, ' ')) AS w
              FROM documents),
            dl AS (SELECT doc_id, CAST(count(*) AS DOUBLE) AS len
                   FROM words GROUP BY doc_id),
            cw AS (SELECT doc_id, w, CAST(count(*) AS DOUBLE) AS c
                   FROM words GROUP BY doc_id, w)
            SELECT c.doc_id,
                   CAST(SUM(CAST(ROUND(c.c / d.len * ln(d.len / c.c)
                                       * 1000000.0) AS BIGINT))
                        AS BIGINT) AS entropy_micros
            FROM cw c JOIN dl d USING (doc_id)
            GROUP BY c.doc_id
        """,
        # same md5-bucket arithmetic as splits._md5_bucket_fraction:
        # first 8 hex digits / 2^32, thresholds compared in double
        "split_assign": """
            WITH b AS (
              SELECT doc_id,
                     CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)),
                                         1, 8) AS BIGINT)
                       / 4294967296.0 AS bf
              FROM documents)
            SELECT doc_id,
                   CAST(FLOOR(bf * 100) AS BIGINT) AS bucket_pct,
                   CASE WHEN bf < 0.8 THEN 'train'
                        WHEN bf < 0.9 THEN 'val'
                        ELSE 'test' END AS split
            FROM b
        """,
        # distinct-edge self-join on src with a<b — the closed form of
        # graph.cocitation_counts' per-block pair expansion (synth
        # degree ≤ 3, so the max_degree=64 cap never trips here)
        "cocitation": """
            WITH edges AS (
              SELECT DISTINCT doc_id AS src,
                     CAST((doc_id + k + 1) % 100000000 AS BIGINT)
                       AS dst
              FROM documents,
              LATERAL unnest(generate_series(0, doc_id % 4 - 1)) AS t(k))
            SELECT e1.dst AS a, e2.dst AS b,
                   CAST(count(*) AS BIGINT) AS n_srcs
            FROM edges e1
            JOIN edges e2 ON e1.src = e2.src AND e1.dst < e2.dst
            GROUP BY e1.dst, e2.dst
        """,
        # the bm25 scoring CTE verbatim, then ORDER BY score DESC with
        # doc_id tie-break LIMIT 10 — selects the same row set as the
        # engine's block-local top-k + tiny final sort
        "bm25_search": """
            WITH words AS (
              SELECT doc_id, unnest(string_split(text, ' ')) AS w
              FROM documents),
            dl AS (SELECT doc_id, CAST(count(*) AS DOUBLE) AS len
                   FROM words GROUP BY doc_id),
            stats AS (SELECT CAST((SELECT count(*) FROM documents)
                                  AS DOUBLE) AS n,
                             (SELECT SUM(len) / count(*) FROM dl)
                               AS avgdl),
            tf AS (SELECT doc_id, w, CAST(count(*) AS DOUBLE) AS tf
                   FROM words WHERE w IN ('spark', 'window', 'merge')
                   GROUP BY doc_id, w),
            df AS (SELECT w, CAST(count(DISTINCT doc_id) AS DOUBLE)
                            AS df
                   FROM words WHERE w IN ('spark', 'window', 'merge')
                   GROUP BY w),
            scored AS (
              SELECT t.doc_id,
                     CAST(SUM(CAST(ROUND(
                       ln(1.0 + (s.n - f.df + 0.5) / (f.df + 0.5))
                       * (t.tf * 2.2)
                       / (t.tf + 1.2 * (1.0 - 0.75 + 0.75 * d.len
                                        / s.avgdl))
                       * 1000000.0) AS BIGINT)) AS BIGINT)
                       AS score_micros
              FROM tf t
              JOIN df f ON f.w = t.w
              JOIN dl d ON d.doc_id = t.doc_id
              CROSS JOIN stats s
              GROUP BY t.doc_id)
            SELECT doc_id, score_micros FROM scored
            ORDER BY score_micros DESC, doc_id LIMIT 10
        """,
        # quantile_disc rule on both sides (value at rank ceil(q*n))
        "length_band": """
            WITH tok AS (SELECT doc_id,
              CAST(CASE WHEN text = '' OR text IS NULL THEN 0
                   ELSE length(text) - length(replace(text, ' ', ''))
                        + 1 END AS BIGINT) AS token_count
              FROM documents),
            q AS (SELECT quantile_disc(token_count, 0.1) AS lo,
                         quantile_disc(token_count, 0.9) AS hi
                  FROM tok)
            SELECT t.doc_id, t.token_count
            FROM tok t, q WHERE t.token_count BETWEEN q.lo AND q.hi
        """,
        # TRUNC (not ROUND) — a pure function of the double, no
        # half-tie hazard on scaled float32s; sums of int64 micros
        # are order-free
        "label_centroids": """
            WITH ex AS (
              SELECT label, CAST(i - 1 AS BIGINT) AS dim,
                     CAST(TRUNC(CAST(embedding[i] AS DOUBLE)
                                * 1000000.0) AS BIGINT) AS m
              FROM embeddings,
              LATERAL unnest(generate_series(1, len(embedding)))
                AS t(i))
            SELECT CAST(label AS BIGINT) AS label, dim,
                   CAST(SUM(m) AS BIGINT) AS sum_micros,
                   CAST(COUNT(*) AS BIGINT) AS n_vecs
            FROM ex GROUP BY label, dim
        """,
        # md5-bucket Bernoulli thinning: keep iff floor(frac*1e6) <
        # keep_micros (1e6 for en, 25% for the rest) — same
        # arithmetic as splits.resample_by_weight
        "lang_rebalance": """
            SELECT doc_id, lang FROM documents
            WHERE CAST(FLOOR(
                    (CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)),
                                         1, 8) AS BIGINT)
                     / 4294967296.0) * 1000000) AS BIGINT)
                  < CASE WHEN lang = 'en' THEN 1000000
                         ELSE 250000 END
        """,
        # exact >= ceil(phi*N) frequency filter — identical result
        # set to the engine's MG-candidates + verify construction
        "heavy_hitters": """
            WITH words AS (SELECT unnest(string_split(text, ' '))
                             AS value
                           FROM documents),
            tot AS (SELECT CAST(count(*) AS BIGINT) AS n FROM words)
            SELECT value, CAST(count(*) AS BIGINT) AS n
            FROM words, tot
            GROUP BY value, tot.n
            HAVING count(*) >= CAST(CEIL(0.01 * tot.n) AS BIGINT)
        """,
        "degree_hist": """
            WITH edges AS (
              SELECT doc_id AS src,
                     CAST((doc_id + k + 1) % 100000000 AS BIGINT)
                       AS dst
              FROM documents,
              LATERAL unnest(generate_series(0, doc_id % 4 - 1))
                AS t(k)),
            deg AS (SELECT src, CAST(count(*) AS BIGINT) AS degree
                    FROM edges GROUP BY src)
            SELECT degree, CAST(count(*) AS BIGINT) AS n_nodes
            FROM deg GROUP BY degree
        """,
        # textbook 3-way self-join over the canonical (low→high) edge
        # set: wedge (e1, e2) at lowest node, closed by e3 — each
        # triangle counted once at its closing (mid, max) edge
        "triangle_support": """
            WITH e0 AS (
              SELECT doc_id AS src,
                     CAST((doc_id + k + 1) % 100000000 AS BIGINT)
                       AS dst
              FROM documents,
              LATERAL unnest(generate_series(0, doc_id % 4 - 1))
                AS t(k)),
            e AS (SELECT DISTINCT least(src, dst) AS a,
                         greatest(src, dst) AS b
                  FROM e0 WHERE src <> dst)
            SELECT e3.a, e3.b, CAST(count(*) AS BIGINT) AS n_tris
            FROM e e1
            JOIN e e2 ON e2.a = e1.a AND e2.b > e1.b
            JOIN e e3 ON e3.a = e1.b AND e3.b = e2.b
            GROUP BY e3.a, e3.b
        """,
        # same float64 expression nesting as the engine: upcast to
        # DOUBLE, scale = 127/max|x| (0 for all-zero rows), TRUNC
        "embed_quantize": """
            WITH a AS (
              SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e,
                     list_max(list_transform(
                         CAST(embedding AS DOUBLE[]),
                         x -> abs(x))) AS amax
              FROM embeddings)
            SELECT vec_id,
                   CAST(COALESCE(list_sum(list_transform(e,
                        x -> abs(trunc(x * CASE WHEN amax > 0
                                 THEN 127.0 / amax ELSE 0 END)))),
                        0) AS BIGINT) AS l1_q,
                   CAST(COALESCE(list_sum(list_transform(e,
                        x -> CASE WHEN trunc(x * CASE WHEN amax > 0
                                  THEN 127.0 / amax ELSE 0 END) <> 0
                             THEN 1 ELSE 0 END)),
                        0) AS BIGINT) AS nnz_q
            FROM a
        """,
        "distinct_words": """
            SELECT lang, CAST(count(DISTINCT w) AS BIGINT)
                     AS n_distinct
            FROM (SELECT lang,
                         unnest(string_split(COALESCE(text, ''), ' '))
                           AS w
                  FROM documents)
            GROUP BY lang
        """,
        # synth pages chunk text into 13-word <p> runs inside
        # #content, class an-info on every 5th — reconstructed exactly
        "extract_paragraphs": f"""
            WITH w AS (
              SELECT doc_id, lang,
                     string_split(COALESCE(text, ''), ' ') AS ws
              FROM documents),
            x AS (
              SELECT doc_id, lang, unnest(ws) AS word,
                     generate_subscripts(ws, 1) AS i
              FROM w)
            SELECT {SYNTH_URL_SQL} AS url,
                   CAST((i - 1) // 13 AS BIGINT) AS para_idx,
                   string_agg(word, ' ' ORDER BY i) AS para_text,
                   ((i - 1) // 13) % 5 = 0 AS is_aninfo
            FROM x
            GROUP BY doc_id, lang, (i - 1) // 13
        """,
        "para_dedup": """
            WITH w AS (
              SELECT doc_id,
                     string_split(COALESCE(text, ''), ' ') AS ws
              FROM documents),
            x AS (
              SELECT doc_id, unnest(ws) AS word,
                     generate_subscripts(ws, 1) AS i
              FROM w),
            p AS (
              SELECT doc_id, (i - 1) // 13 AS pidx,
                     string_agg(word, ' ' ORDER BY i) AS para
              FROM x GROUP BY doc_id, (i - 1) // 13)
            SELECT md5(para) AS para_md5,
                   CAST(min(doc_id * 1000000 + pidx) // 1000000
                        AS BIGINT) AS keeper_doc_id,
                   CAST(min(doc_id * 1000000 + pidx) % 1000000
                        AS BIGINT) AS keeper_para_idx,
                   CAST(count(*) AS BIGINT) AS n_copies
            FROM p GROUP BY para
        """,
        "csv_roundtrip": """
            SELECT doc_id, text, lang, source, n_chars FROM documents
        """,
        "orc_roundtrip": """
            SELECT doc_id, text, lang, source, n_chars FROM documents
        """,
        "wet_roundtrip": f"""
            SELECT {SYNTH_URL_SQL} AS url, text FROM documents
        """,
        "boilerplate_lines": """
            -- closed-form expectation: host chrome (HDR/FTR, 100%%
            -- frequency) stripped, unique body + rare NOTE survive
            SELECT doc_id,
                   'B' || CAST(doc_id AS VARCHAR) || ' ' || text
                   || CASE WHEN doc_id % 7 = 0
                        THEN chr(10) || 'NOTE n'
                             || CAST(doc_id AS VARCHAR)
                        ELSE '' END AS cleaned,
                   CAST(2 AS BIGINT) AS n_stripped
            FROM documents
        """,
        "neardup_decontaminate": """
            -- replay every corpus-x-eval probe: 5-word shingles,
            -- integer Jaccard ppm, max per corpus doc, 0.5 threshold
            WITH sh AS (
              SELECT doc_id, list_distinct(CASE WHEN len(words) < 5
                       THEN [array_to_string(words, ' ')]
                       ELSE list_transform(range(1, len(words) - 3),
                              i -> array_to_string(words[i:i+4], ' '))
                       END) AS s
              FROM (SELECT doc_id, string_split(text, ' ') AS words
                    FROM documents)),
            ev AS (SELECT s FROM sh WHERE doc_id % 50 = 0),
            probes AS (
              SELECT c.doc_id,
                     len(list_intersect(c.s, e.s)) AS ix,
                     len(c.s) + len(e.s)
                       - len(list_intersect(c.s, e.s)) AS un
              FROM sh c CROSS JOIN ev e),
            scored AS (
              SELECT doc_id,
                     MAX(COALESCE(ix * 1000000 // NULLIF(un, 0), 0))
                       AS max_jppm
              FROM probes GROUP BY doc_id)
            SELECT doc_id, CAST(max_jppm AS BIGINT) AS max_jppm,
                   max_jppm >= 500000 AS contaminated
            FROM scored
        """,
        "mojibake_fix": """
            -- repaired text must equal the original + unicode suffix
            -- for EVERY doc; the corrupted two thirds must be flagged
            SELECT doc_id,
                   text || ' caf' || chr(233) || ' n' || chr(8470)
                     AS fixed,
                   doc_id % 3 <> 0 AS was_mojibake
            FROM documents
        """,
        "html_markdown": """
            -- character-for-character markdown replay: heading,
            -- bold+link paragraph, 1..3 list items, fenced pre,
            -- h2, closing paragraph, blank-line separated
            SELECT doc_id,
                   '# T' || doc_id || chr(10) || chr(10)
                   || 'Intro **w' || CAST(doc_id % 7 AS VARCHAR)
                   || '** and [L' || doc_id || '](/l/' || doc_id
                   || ').' || chr(10) || chr(10)
                   || '- i' || doc_id || '.0'
                   || CASE WHEN doc_id % 3 >= 1
                        THEN chr(10) || '- i' || doc_id || '.1'
                        ELSE '' END
                   || CASE WHEN doc_id % 3 >= 2
                        THEN chr(10) || '- i' || doc_id || '.2'
                        ELSE '' END
                   || chr(10) || chr(10)
                   || '```' || chr(10) || 'raw ' || doc_id
                   || chr(10) || '```' || chr(10) || chr(10)
                   || '## S' || doc_id || chr(10) || chr(10)
                   || 'End p' || doc_id AS markdown
            FROM documents
        """,
        "epoch_shuffle": """
            WITH keyed AS (
              SELECT doc_id,
                     md5('1:' || CAST(doc_id AS VARCHAR)) AS k
              FROM documents)
            SELECT doc_id,
                   CAST(CAST('0x' || substr(k, 1, 4) AS BIGINT) % 16
                        AS BIGINT) AS shard,
                   CAST(ROW_NUMBER() OVER (
                     PARTITION BY
                       CAST('0x' || substr(k, 1, 4) AS BIGINT) % 16
                     ORDER BY k, doc_id) AS BIGINT) AS pos
            FROM keyed
        """,
        "labelprop_2iter": """
            -- two unrolled min-label rounds over the doubled edges
            WITH edges AS (
              SELECT doc_id AS src,
                     CAST((doc_id + k + 1) % 100000000 AS BIGINT)
                       AS dst
              FROM documents,
              LATERAL unnest(generate_series(0, doc_id % 4 - 1))
                AS t(k)
            ), und AS (
              SELECT src AS a, dst AS b FROM edges
              UNION ALL SELECT dst, src FROM edges
            ), nodes AS (
              SELECT DISTINCT node FROM (
                SELECT src AS node FROM edges
                UNION ALL SELECT dst FROM edges)
            ), l0 AS (
              SELECT node, node AS lbl FROM nodes
            ), l1 AS (
              SELECT l0.node,
                     LEAST(l0.lbl, COALESCE(m.minl, l0.lbl)) AS lbl
              FROM l0 LEFT JOIN (
                SELECT u.b AS node, MIN(la.lbl) AS minl
                FROM und u JOIN l0 la ON u.a = la.node
                GROUP BY u.b) m ON l0.node = m.node
            ), l2 AS (
              SELECT l1.node,
                     LEAST(l1.lbl, COALESCE(m.minl, l1.lbl)) AS lbl
              FROM l1 LEFT JOIN (
                SELECT u.b AS node, MIN(la.lbl) AS minl
                FROM und u JOIN l1 la ON u.a = la.node
                GROUP BY u.b) m ON l1.node = m.node
            )
            SELECT node, CAST(lbl AS BIGINT) AS label FROM l2
        """,
        "cdx_lookup": f"""
            -- the point-looked-up sample must extract byte-identical
            SELECT {SYNTH_URL_SQL} AS url, text AS extracted_text
            FROM documents WHERE doc_id % 10 = 0
        """,
        "surt_index": """
            -- closed-form URL and its reversed-label SURT key;
            -- query kept, fragment dropped
            WITH parts AS (
              SELECT doc_id,
                     CASE doc_id % 3 WHEN 0 THEN ''
                          WHEN 1 THEN 'www.' ELSE 'a.b.' END AS sub,
                     CASE doc_id % 3 WHEN 0 THEN ''
                          WHEN 1 THEN ',www' ELSE ',b,a' END
                       AS sub_rev,
                     'd' || CAST(doc_id % 7 AS VARCHAR) AS dom,
                     CASE doc_id % 5 WHEN 0 THEN 'com'
                          WHEN 1 THEN 'org' WHEN 2 THEN 'co.uk'
                          WHEN 3 THEN 'ac.uk' ELSE 'com.au' END
                       AS suf,
                     CASE doc_id % 5 WHEN 0 THEN 'com'
                          WHEN 1 THEN 'org' WHEN 2 THEN 'uk,co'
                          WHEN 3 THEN 'uk,ac' ELSE 'au,com' END
                       AS suf_rev,
                     '/p/' || CAST(doc_id AS VARCHAR)
                     || CASE WHEN doc_id % 2 = 1
                          THEN '?q=' || CAST(doc_id % 3 AS VARCHAR)
                          ELSE '' END AS spath,
                     CASE WHEN doc_id % 4 = 0 THEN '#s' ELSE '' END
                       AS frag
              FROM documents)
            SELECT doc_id,
                   'https://' || sub || dom || '.' || suf || spath
                   || frag AS url,
                   suf_rev || ',' || dom || sub_rev || ')' || spath
                     AS surt
            FROM parts
        """,
        "etld1_domains": """
            -- hosts and their eTLD+1 are closed-form in doc_id; the
            -- Ray side must reproduce them through actual PSL
            -- longest-suffix matching
            SELECT doc_id,
                   CASE doc_id % 3 WHEN 0 THEN '' WHEN 1 THEN 'www.'
                        ELSE 'a.b.' END
                   || 'd' || CAST(doc_id % 7 AS VARCHAR) || '.'
                   || CASE doc_id % 5 WHEN 0 THEN 'com'
                        WHEN 1 THEN 'org' WHEN 2 THEN 'co.uk'
                        WHEN 3 THEN 'ac.uk' ELSE 'com.au' END AS host,
                   'd' || CAST(doc_id % 7 AS VARCHAR) || '.'
                   || CASE doc_id % 5 WHEN 0 THEN 'com'
                        WHEN 1 THEN 'org' WHEN 2 THEN 'co.uk'
                        WHEN 3 THEN 'ac.uk' ELSE 'com.au' END
                   AS registered
            FROM documents
        """,
        "rollup_counts": """
            SELECT lang, source, CAST(count(*) AS BIGINT) AS n,
                   CAST(GROUPING(lang, source) AS BIGINT)
                     AS grouping_id
            FROM documents GROUP BY ROLLUP(lang, source)
        """,
        "hash_sample": """
            WITH h AS (
              SELECT lang, doc_id,
                     md5(CAST(doc_id AS VARCHAR)) AS hx
              FROM documents),
            r AS (
              SELECT lang, doc_id,
                     row_number() OVER (PARTITION BY lang
                                        ORDER BY hx, doc_id) AS rn
              FROM h)
            SELECT lang, doc_id, CAST(rn AS BIGINT) AS rank
            FROM r WHERE rn <= 5
        """,
        # rank-weighted Gini; SUM() over BIGINT is HUGEINT in DuckDB
        # so the 10^6 product and // stay exact, then CAST down
        "length_gini": """
            WITH r AS (
              SELECT lang, n_chars,
                     row_number() OVER (PARTITION BY lang
                                        ORDER BY n_chars) AS rn
              FROM documents)
            SELECT lang,
                   CAST(1000000 * (2 * SUM(rn * n_chars)
                                   - (count(*) + 1) * SUM(n_chars))
                        // (count(*) * SUM(n_chars)) AS BIGINT)
                     AS gini_ppm
            FROM r GROUP BY lang
        """,
        # cells reconstructed by series arithmetic; thead is row 0
        "html_tables": """
            WITH hdr AS (
              SELECT d.doc_id, CAST(0 AS BIGINT) AS row_idx,
                     CAST(c AS BIGINT) AS col_idx,
                     'col' || c AS cell, TRUE AS is_header
              FROM documents d, generate_series(0, 2) AS t(c)),
            body AS (
              SELECT d.doc_id, CAST(r + 1 AS BIGINT) AS row_idx,
                     CAST(c AS BIGINT) AS col_idx,
                     printf('d%d r%d c%d', d.doc_id, r, c) AS cell,
                     FALSE AS is_header
              FROM documents d, generate_series(0, 2) AS t(c),
                   generate_series(0, 2) AS s(r)
              WHERE r <= d.doc_id % 3)
            SELECT * FROM hdr UNION ALL SELECT * FROM body
        """,
        # form_data branch logic as flat rows; field_idx shifts by 1
        # after the checkbox on even ids (it submits only when checked)
        "form_fields": """
            WITH d AS (
              SELECT doc_id,
                     CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 0 END AS b
              FROM documents)
            SELECT doc_id, CAST(0 AS BIGINT) AS field_idx,
                   'q' AS field, 'q' || doc_id AS value FROM d
            UNION ALL
            SELECT doc_id, CAST(1 AS BIGINT), 'opt', 'on'
            FROM d WHERE b = 1
            UNION ALL
            SELECT doc_id, CAST(1 + b AS BIGINT), 'tok',
                   't' || (doc_id % 97) FROM d
            UNION ALL
            SELECT doc_id, CAST(2 + b AS BIGINT), 'pick',
                   CASE WHEN doc_id % 3 = 0 THEN 'b' ELSE 'a' END
            FROM d
            UNION ALL
            SELECT doc_id, CAST(3 + b AS BIGINT), 'note',
                   'note ' || doc_id FROM d
            UNION ALL
            SELECT doc_id, CAST(4 + b AS BIGINT), 'go', 'Go' FROM d
        """,
        "grouped_mode": """
            WITH c AS (
              SELECT lang, n_chars, count(*) AS n
              FROM documents GROUP BY lang, n_chars),
            r AS (
              SELECT lang, n_chars, n,
                     row_number() OVER (PARTITION BY lang
                                        ORDER BY n DESC, n_chars)
                       AS rn
              FROM c)
            SELECT lang, n_chars AS mode_val, CAST(n AS BIGINT) AS n
            FROM r WHERE rn = 1
        """,
        # integer-scaled covariance numerator: SUM(BIGINT) is HUGEINT
        # in DuckDB so the products stay exact, then CAST down
        "cov_qty_price": """
            WITH b AS (
              SELECT l_returnflag AS flag,
                     CAST(ROUND(l_quantity) AS BIGINT) AS q,
                     CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS p
              FROM lineitem)
            SELECT flag AS l_returnflag, CAST(count(*) AS BIGINT) AS n,
                   CAST(count(*) * SUM(q * p) - SUM(q) * SUM(p)
                        AS BIGINT) AS cov_num
            FROM b GROUP BY flag
        """,
        "source_langs": """
            SELECT source,
                   string_agg(DISTINCT lang, ',' ORDER BY lang)
                     AS vals
            FROM documents GROUP BY source
        """,
        "stale_orders": """
            SELECT o_orderkey, o_custkey, o_orderstatus
            FROM orders o
            WHERE NOT EXISTS (
              SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey
                AND l.l_shipdate >= TIMESTAMP '1996-01-01')
        """,
        "json_props": """
            SELECT event_id,
                   CAST(json_extract(props, '$.k') AS BIGINT) AS k
            FROM events
        """,
        "sitemap_urls": """
            SELECT source,
                   'https://synth.invalid/' || lang || '/' ||
                     lpad(CAST(doc_id AS VARCHAR), 8, '0') AS loc,
                   'day' || (doc_id % 30) AS lastmod
            FROM documents
        """,
        "event_pivot": """
            SELECT user_id,
                   CAST(SUM(CASE WHEN event_type = 'click' THEN 1
                       ELSE 0 END) AS BIGINT) AS n_click,
                   CAST(SUM(CASE WHEN event_type = 'error' THEN 1
                       ELSE 0 END) AS BIGINT) AS n_error,
                   CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1
                       ELSE 0 END) AS BIGINT) AS n_purchase,
                   CAST(SUM(CASE WHEN event_type = 'signup' THEN 1
                       ELSE 0 END) AS BIGINT) AS n_signup,
                   CAST(SUM(CASE WHEN event_type = 'view' THEN 1
                       ELSE 0 END) AS BIGINT) AS n_view
            FROM events GROUP BY user_id
        """,
        "users_both": """
            SELECT DISTINCT user_id FROM events
            WHERE event_type = 'click'
            INTERSECT
            SELECT DISTINCT user_id FROM events
            WHERE event_type = 'purchase'
        """,
        "event_gaps": """
            WITH g AS (
              SELECT event_id, user_id,
                     epoch_us(ts) - lag(epoch_us(ts)) OVER (
                       PARTITION BY user_id
                       ORDER BY ts, event_id) AS gap_us
              FROM events)
            SELECT event_id, user_id, CAST(gap_us AS BIGINT) AS gap_us
            FROM g WHERE gap_us IS NOT NULL
        """,
        "microdata": """
            SELECT doc_id, 'headline' AS prop,
                   'Doc ' || lpad(CAST(doc_id AS VARCHAR), 8, '0')
                     AS value
            FROM documents
            UNION ALL
            SELECT doc_id, 'author', 'Author ' || (doc_id % 50)
            FROM documents
            UNION ALL
            SELECT doc_id, 'datePublished',
                   printf('2024-10-%02d', doc_id % 28 + 1)
            FROM documents WHERE doc_id % 2 = 0
        """,
        # exact integer week arithmetic: epoch microseconds // week
        "retention_cohorts": """
            WITH uw AS (
              SELECT DISTINCT user_id,
                     epoch_us(ts) // 604800000000 AS wk
              FROM events),
            c AS (SELECT user_id, min(wk) AS cohort FROM uw
                  GROUP BY user_id)
            SELECT CAST(c.cohort AS BIGINT) AS cohort_week,
                   CAST(uw.wk - c.cohort AS BIGINT) AS offset_week,
                   CAST(count(*) AS BIGINT) AS n_users
            FROM uw JOIN c ON uw.user_id = c.user_id
            GROUP BY c.cohort, uw.wk - c.cohort
        """,
        # Q5 with the q1_pricing exact-cents convention; revenue kept
        # as the int64 cents × pct sum so the sort is value-exact
        "q5_local_supplier": """
            SELECT n.n_name,
                   CAST(SUM(CAST(ROUND(l.l_extendedprice * 100)
                                 AS BIGINT)
                            * CAST(ROUND((1 - l.l_discount) * 100)
                                   AS BIGINT)) AS BIGINT)
                     AS revenue_e4
            FROM customer c
            JOIN orders o ON c.c_custkey = o.o_custkey
            JOIN lineitem l ON l.l_orderkey = o.o_orderkey
            JOIN supplier s ON l.l_suppkey = s.s_suppkey
            JOIN nation n ON s.s_nationkey = n.n_nationkey
            JOIN region r ON n.n_regionkey = r.r_regionkey
            WHERE c.c_nationkey = s.s_nationkey
              AND r.r_name = 'ASIA'
              AND o.o_orderdate >= TIMESTAMP '1996-01-01'
              AND o.o_orderdate < TIMESTAMP '1997-01-01'
            GROUP BY n.n_name
            ORDER BY revenue_e4 DESC, n.n_name
        """,
        # lower median = ceil(N/2)-th smallest — deterministic under
        # ties, no interpolation hazard
        "median_chars": """
            WITH r AS (
              SELECT lang, n_chars,
                     row_number() OVER (PARTITION BY lang
                                        ORDER BY n_chars) AS rn,
                     count(*) OVER (PARTITION BY lang) AS cnt
              FROM documents)
            SELECT lang, CAST(n_chars AS BIGINT) AS median_lo
            FROM r WHERE rn = (cnt + 1) // 2
        """,
        # per-lang row_number with (n DESC, word) tie-break — same
        # rule as the engine's lossless block-local pruning
        "top_words_per_lang": """
            WITH words AS (SELECT lang,
                                  unnest(string_split(text, ' '))
                                    AS word
                           FROM documents),
            wc AS (SELECT lang, word, CAST(count(*) AS BIGINT) AS n
                   FROM words GROUP BY lang, word),
            rk AS (SELECT lang, word, n,
                          row_number() OVER (PARTITION BY lang
                              ORDER BY n DESC, word) AS rn
                   FROM wc)
            SELECT lang, word, n FROM rk WHERE rn <= 10
        """,
        # RANK() min-rank - 1 = count below; both sides positive so
        # DuckDB // == numpy floor division
        "length_pct_rank": """
            WITH tok AS (SELECT doc_id,
              CAST(CASE WHEN text = '' OR text IS NULL THEN 0
                   ELSE length(text) - length(replace(text, ' ', ''))
                        + 1 END AS BIGINT) AS token_count
              FROM documents)
            SELECT doc_id, token_count,
                   CAST((CAST(RANK() OVER (ORDER BY token_count)
                              AS BIGINT) - 1) * 1000000
                        // (SELECT count(*) - 1 FROM tok)
                        AS BIGINT) AS pct_ppm
            FROM tok
        """,
        # sliding 8-word spans; a span is repeated if it occurs >=2
        # times anywhere in the corpus (including the same doc)
        "span_stats": """
            WITH ws AS (SELECT doc_id, string_split(text, ' ') AS w
                        FROM documents),
            win AS (SELECT doc_id, array_to_string(w[i:i+7], ' ') AS g
                    FROM ws,
                    LATERAL unnest(generate_series(1, len(w) - 7))
                      AS u(i)),
            cnt AS (SELECT g, count(*) AS c FROM win GROUP BY g),
            nw AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n
                   FROM win GROUP BY doc_id),
            rep AS (SELECT w2.doc_id, CAST(count(*) AS BIGINT) AS n
                    FROM win w2 JOIN cnt ON cnt.g = w2.g
                    WHERE cnt.c >= 2 GROUP BY w2.doc_id)
            SELECT d.doc_id,
                   CAST(COALESCE(nw.n, 0) AS BIGINT) AS n_windows,
                   CAST(COALESCE(rep.n, 0) AS BIGINT) AS n_repeated
            FROM documents d
            LEFT JOIN nw USING (doc_id)
            LEFT JOIN rep USING (doc_id)
        """,
        # the trim rule replayed declaratively: windows -> global
        # count >= 2 -> expand each repeated window to its 8 covered
        # word indexes -> anti-join kept words -> reassemble in order
        "dup_span_trim": """
            WITH ws AS (SELECT doc_id, string_split(text, ' ') AS w
                        FROM documents),
            win AS (SELECT doc_id, i,
                           array_to_string(w[i:i+7], ' ') AS g
                    FROM ws,
                    LATERAL unnest(generate_series(1, len(w) - 7))
                      AS u(i)),
            cnt AS (SELECT g, count(*) AS c FROM win GROUP BY g),
            rep AS (SELECT w2.doc_id, w2.i FROM win w2
                    JOIN cnt ON cnt.g = w2.g WHERE cnt.c >= 2),
            cov AS (SELECT DISTINCT r.doc_id, r.i + u.k AS widx
                    FROM rep r,
                    LATERAL unnest(generate_series(0, 7)) AS u(k)),
            words AS (SELECT doc_id, i AS widx, w[i] AS word
                      FROM ws,
                      LATERAL unnest(generate_series(1, len(w)))
                        AS u(i)),
            kept AS (SELECT wo.doc_id, wo.widx, wo.word
                     FROM words wo
                     LEFT JOIN cov ON cov.doc_id = wo.doc_id
                          AND cov.widx = wo.widx
                     WHERE cov.doc_id IS NULL),
            agg AS (SELECT doc_id,
                           string_agg(word, ' ' ORDER BY widx)
                               AS trimmed_text
                    FROM kept GROUP BY doc_id),
            nw AS (SELECT doc_id, CAST(len(w) AS BIGINT) AS n_words
                   FROM ws),
            dr AS (SELECT doc_id, CAST(count(*) AS BIGINT)
                              AS n_dropped
                   FROM cov GROUP BY doc_id)
            SELECT d.doc_id,
                   COALESCE(agg.trimmed_text, '') AS trimmed_text,
                   nw.n_words,
                   CAST(COALESCE(dr.n_dropped, 0) AS BIGINT)
                       AS n_dropped
            FROM documents d
            JOIN nw USING (doc_id)
            LEFT JOIN agg USING (doc_id)
            LEFT JOIN dr USING (doc_id)
        """,
        # PMI nesting ln((cab/nb) / ((ca/nw)*(cb/nw))) mirrored
        # exactly by curation.bigram_pmi; top-k ties break on the
        # bigram string
        "bigram_pmi": """
            WITH ws AS (SELECT string_split(text, ' ') AS w
                        FROM documents),
            tot AS (SELECT CAST(SUM(len(w)) AS DOUBLE) AS nw,
                           CAST(SUM(len(w) - 1) AS DOUBLE) AS nb
                    FROM ws),
            uc AS (SELECT t, CAST(count(*) AS DOUBLE) AS c
                   FROM (SELECT unnest(w) AS t FROM ws) GROUP BY t),
            bc AS (SELECT w[i] AS a, w[i+1] AS b,
                          CAST(count(*) AS BIGINT) AS n
                   FROM ws,
                   LATERAL unnest(generate_series(1, len(w) - 1))
                     AS u(i)
                   GROUP BY w[i], w[i+1]),
            top AS (SELECT a, b, n FROM bc
                    ORDER BY n DESC, a || ' ' || b LIMIT 30)
            SELECT t.a || ' ' || t.b AS ngram, t.n,
                   CAST(ROUND(ln((CAST(t.n AS DOUBLE) / tot.nb)
                                 / ((ua.c / tot.nw)
                                    * (ub.c / tot.nw)))
                              * 1000000.0) AS BIGINT) AS pmi_micros
            FROM top t
            JOIN uc ua ON ua.t = t.a
            JOIN uc ub ON ub.t = t.b
            CROSS JOIN tot
        """,
        # q1_pricing money convention (cents x discount-pct int64)
        "q3_shipping": """
            WITH rev AS (
              SELECT l_orderkey,
                     SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
                         * CAST(ROUND((1 - l_discount) * 100)
                                AS BIGINT)) AS revenue_e4
              FROM lineitem
              WHERE l_shipdate > TIMESTAMP '1998-06-15'
              GROUP BY l_orderkey)
            SELECT r.l_orderkey,
                   CAST(r.revenue_e4 AS BIGINT) AS revenue_e4,
                   o.o_orderdate, o.o_orderpriority
            FROM rev r
            JOIN orders o ON o.o_orderkey = r.l_orderkey
            JOIN customer c ON c.c_custkey = o.o_custkey
            WHERE c.c_mktsegment = 'BUILDING'
              AND o.o_orderdate < TIMESTAMP '1998-06-15'
            ORDER BY revenue_e4 DESC, r.l_orderkey LIMIT 10
        """,
        # population std; int64 sums are exact in double < 2^53, so
        # the doubles match agg.grouped_zscore bit for bit
        "zscore_by_lang": """
            WITH m AS (
              SELECT lang, CAST(count(*) AS DOUBLE) AS n,
                     CAST(SUM(n_chars) AS DOUBLE) AS s,
                     CAST(SUM(n_chars * n_chars) AS DOUBLE) AS ss
              FROM documents GROUP BY lang)
            SELECT d.doc_id, d.lang,
                   CAST(ROUND((d.n_chars - m.s / m.n)
                              / sqrt((m.ss - m.s * m.s / m.n) / m.n)
                              * 1000000.0) AS BIGINT) AS z_micros
            FROM documents d JOIN m USING (lang)
        """,
        # per-row ROUND(value*1e6) BEFORE selection (order-free exact);
        # (ts, event_id) ordering makes duplicate timestamps
        # deterministic on both sides
        "ohlc_hourly": """
            WITH e AS (
              SELECT user_id,
                     epoch_us(ts) // 3600000000 AS bucket,
                     epoch_us(ts) AS tus, event_id,
                     CAST(ROUND(value * 1e6) AS BIGINT) AS v
              FROM events),
            r AS (
              SELECT *,
                     row_number() OVER (PARTITION BY user_id, bucket
                                        ORDER BY tus, event_id) AS rn,
                     count(*) OVER (PARTITION BY user_id, bucket)
                       AS cnt
              FROM e)
            SELECT user_id, CAST(bucket AS BIGINT) AS bucket,
                   CAST(max(CASE WHEN rn = 1 THEN v END) AS BIGINT)
                     AS open_e6,
                   CAST(max(v) AS BIGINT) AS high_e6,
                   CAST(min(v) AS BIGINT) AS low_e6,
                   CAST(max(CASE WHEN rn = cnt THEN v END) AS BIGINT)
                     AS close_e6,
                   CAST(count(*) AS BIGINT) AS n
            FROM r GROUP BY user_id, bucket
        """,
        "monthly_revenue": """
            SELECT CAST(EXTRACT(year FROM o_orderdate) AS BIGINT)
                     AS o_year,
                   CAST(EXTRACT(month FROM o_orderdate) AS BIGINT)
                     AS o_month,
                   CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
                        AS BIGINT) AS revenue_cents,
                   CAST(count(*) AS BIGINT) AS n_orders
            FROM orders GROUP BY 1, 2
        """,
        "length_histogram": """
            SELECT CAST(n_chars // 256 AS BIGINT) AS bin,
                   CAST(count(*) AS BIGINT) AS n,
                   CAST(sum(n_chars) AS BIGINT) AS total_chars
            FROM documents GROUP BY 1
        """,
        "cube_counts": """
            SELECT lang, source, CAST(count(*) AS BIGINT) AS n,
                   CAST(GROUPING(lang, source) AS BIGINT)
                     AS grouping_id
            FROM documents GROUP BY CUBE (lang, source)
        """,
        # 15 hex digits = 60 bits: inside signed BIGINT on both sides
        "group_checksum": """
            SELECT lang,
                   CAST(bit_xor(CAST('0x' || substr(md5(text), 1, 15)
                                     AS BIGINT)) AS BIGINT)
                     AS checksum,
                   CAST(count(*) AS BIGINT) AS n
            FROM documents GROUP BY lang
        """,
        "ntile_bands": """
            SELECT doc_id, lang, n_chars,
                   CAST(NTILE(4) OVER (PARTITION BY lang
                                       ORDER BY n_chars, doc_id)
                        AS BIGINT) AS tile
            FROM documents
        """,
        # crawl edges + reversed backlink-feed edges (src%5==0);
        # a pair present in both directions is reciprocal
        "mutual_links": """
            WITH e0 AS (
              SELECT doc_id AS src,
                     CAST((doc_id + k + 1) % 100000000 AS BIGINT)
                       AS dst
              FROM documents,
              LATERAL unnest(generate_series(0, doc_id % 4 - 1)) AS t(k)
            ), e AS (
              SELECT src, dst FROM e0
              UNION ALL
              SELECT dst, src FROM e0 WHERE src % 5 = 0
            )
            SELECT CAST(LEAST(src, dst) AS BIGINT) AS a,
                   CAST(GREATEST(src, dst) AS BIGINT) AS b
            FROM e WHERE src <> dst
            GROUP BY 1, 2 HAVING count(*) = 2
        """,
        "regex_density": """
            SELECT doc_id,
                   CAST(len(regexp_extract_all(text, '[aeiou]{2,}'))
                        AS BIGINT) AS n_matches
            FROM documents
        """,
        "lineitem_melt": """
            SELECT l_orderkey, l_linenumber, 'l_quantity' AS measure,
                   CAST(ROUND(l_quantity * 1e6) AS BIGINT) AS value_e6
            FROM lineitem
            UNION ALL
            SELECT l_orderkey, l_linenumber, 'l_extendedprice',
                   CAST(ROUND(l_extendedprice * 1e6) AS BIGINT)
            FROM lineitem
            UNION ALL
            SELECT l_orderkey, l_linenumber, 'l_discount',
                   CAST(ROUND(l_discount * 1e6) AS BIGINT)
            FROM lineitem
            UNION ALL
            SELECT l_orderkey, l_linenumber, 'l_tax',
                   CAST(ROUND(l_tax * 1e6) AS BIGINT)
            FROM lineitem
        """,
        # blocking (exact first-6-chars match) is part of the operator
        # definition and mirrored here verbatim
        "fuzzy_neardup": """
            WITH t AS (
              SELECT doc_id, substr(text, 1, 6) AS blk,
                     substr(text, 7, 18) AS suf
              FROM documents)
            SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                   CAST(levenshtein(a.suf, b.suf) AS BIGINT) AS dist
            FROM t a JOIN t b ON a.blk = b.blk
                             AND a.doc_id < b.doc_id
            WHERE levenshtein(a.suf, b.suf) <= 6
        """,
        "orders_heavy": """
            SELECT o_orderkey, o_orderpriority,
                   CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
            FROM orders
            WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem
                                 WHERE l_quantity > 45)
        """,
        # window SUM over BIGINT widens to HUGEINT in DuckDB: CAST
        "rolling_value_sum": """
            WITH e AS (
              SELECT event_id, user_id, epoch_us(ts) AS tus,
                     CAST(ROUND(value * 1e6) AS BIGINT) AS v
              FROM events)
            SELECT event_id, user_id,
                   CAST(SUM(v) OVER w AS BIGINT) AS frame_sum_e6,
                   CAST(COUNT(*) OVER w AS BIGINT) AS n_in
            FROM e
            WINDOW w AS (PARTITION BY user_id ORDER BY tus, event_id
                         ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)
        """,
        "longest_docs": """
            WITH r AS (
              SELECT lang, source, doc_id, n_chars,
                     row_number() OVER (PARTITION BY lang, source
                                        ORDER BY n_chars DESC,
                                                 doc_id) AS rn
              FROM documents)
            SELECT lang, source, doc_id, n_chars FROM r WHERE rn = 1
        """,
        # min-hop labels: unrolled 2-round BFS over the synth edge
        # convention from doc_id%97==0 seeds
        "bfs_2hop": """
            WITH e AS (
              SELECT doc_id AS src,
                     CAST((doc_id + k + 1) % 100000000 AS BIGINT)
                       AS dst
              FROM documents,
              LATERAL unnest(generate_series(0, doc_id % 4 - 1)) AS t(k)
            ), s0 AS (
              SELECT doc_id AS node FROM documents
              WHERE doc_id % 97 = 0
            ), h1 AS (
              SELECT DISTINCT e.dst AS node FROM e
              JOIN s0 ON e.src = s0.node
              WHERE e.dst NOT IN (SELECT node FROM s0)
            ), h2 AS (
              SELECT DISTINCT e.dst AS node FROM e
              JOIN h1 ON e.src = h1.node
              WHERE e.dst NOT IN (SELECT node FROM s0)
                AND e.dst NOT IN (SELECT node FROM h1)
            )
            SELECT node, CAST(0 AS BIGINT) AS hop FROM s0
            UNION ALL SELECT node, 1 FROM h1
            UNION ALL SELECT node, 2 FROM h2
        """,
        "bpe_pairs": """
            WITH w AS (
              SELECT unnest(string_split(text, ' ')) AS w
              FROM documents
            ), p AS (
              SELECT substr(w, i, 2) AS pair
              FROM w, LATERAL unnest(
                generate_series(1, len(w) - 1)) AS t(i)
              WHERE len(w) >= 2
            )
            SELECT pair, CAST(count(*) AS BIGINT) AS n
            FROM p GROUP BY pair
            ORDER BY n DESC, pair LIMIT 20
        """,
        # components closure (same as dedup_components) + per-cluster
        # best row: longest doc, ties to smallest id
        "dedup_reps": f"""
            WITH RECURSIVE pairs AS ({_JACCARD_PAIRS_SQL}),
            edges AS (
              SELECT ia AS n, ib AS m FROM pairs
              UNION SELECT ib, ia FROM pairs
              UNION SELECT ia, ia FROM pairs
              UNION SELECT ib, ib FROM pairs
            ),
            reach(n, m) AS (
              SELECT n, m FROM edges
              UNION
              SELECT r.n, e.m FROM reach r JOIN edges e ON r.m = e.n
            ),
            comp AS (
              SELECT n AS node_id, MIN(m) AS component_id
              FROM reach GROUP BY n
            ),
            j AS (
              SELECT c.component_id, c.node_id, d.n_chars,
                     row_number() OVER (PARTITION BY c.component_id
                                        ORDER BY d.n_chars DESC,
                                                 c.node_id) AS rn
              FROM comp c JOIN documents d ON c.node_id = d.doc_id)
            SELECT component_id, node_id AS rep_id,
                   CAST(n_chars AS BIGINT) AS n_chars
            FROM j WHERE rn = 1
        """,
        # discrete quantile = ceil(q*N)-th smallest, a real element
        "length_quartiles": """
            WITH r AS (
              SELECT lang, n_chars,
                     row_number() OVER (PARTITION BY lang
                                        ORDER BY n_chars) AS rn,
                     count(*) OVER (PARTITION BY lang) AS cnt
              FROM documents)
            SELECT lang,
                   CAST(max(CASE WHEN rn = GREATEST(1,
                       CAST(ceil(cnt * 0.25) AS BIGINT))
                       THEN n_chars END) AS BIGINT) AS q25,
                   CAST(max(CASE WHEN rn = GREATEST(1,
                       CAST(ceil(cnt * 0.5) AS BIGINT))
                       THEN n_chars END) AS BIGINT) AS q50,
                   CAST(max(CASE WHEN rn = GREATEST(1,
                       CAST(ceil(cnt * 0.75) AS BIGINT))
                       THEN n_chars END) AS BIGINT) AS q75
            FROM r GROUP BY lang
        """,
        "window_uniques": """
            SELECT event_type,
                   CAST((epoch_us(ts) // 3600000000) * 3600000000
                        AS BIGINT) AS window_start,
                   CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
            FROM events GROUP BY 1, 2
        """,
        # closed-form outline of the synth page: h1, doc_id%3+1 h2s,
        # an h3 on even ids (sources/synth.render_outline_page)
        "headings_outline": """
            SELECT doc_id, CAST(0 AS BIGINT) AS pos,
                   CAST(1 AS BIGINT) AS level,
                   'T' || doc_id AS text
            FROM documents
            UNION ALL
            SELECT doc_id, CAST(k + 1 AS BIGINT), 2,
                   'S' || doc_id || '.' || k
            FROM documents,
            LATERAL unnest(generate_series(0, doc_id % 3)) AS t(k)
            UNION ALL
            SELECT doc_id, CAST(doc_id % 3 + 2 AS BIGINT), 3,
                   'D' || doc_id
            FROM documents WHERE doc_id % 2 = 0
        """,
        # doc_id%4 images; alt omitted when (doc_id+j)%3==0
        "img_alt_audit": """
            SELECT doc_id, CAST(doc_id % 4 AS BIGINT) AS n_imgs,
                   CAST((SELECT count(*) FROM unnest(
                       generate_series(0, doc_id % 4 - 1)) AS t(j)
                       WHERE (doc_id + j) % 3 = 0) AS BIGINT)
                     AS n_missing_alt
            FROM documents
        """,
        # meta robots present when doc_id%3<2; noindex,nofollow at 0
        "meta_robots": """
            SELECT doc_id,
                   CAST(CASE WHEN doc_id % 3 < 2 THEN 1 ELSE 0 END
                        AS BIGINT) AS has_meta,
                   CAST(CASE WHEN doc_id % 3 = 0 THEN 1 ELSE 0 END
                        AS BIGINT) AS noindex,
                   CAST(CASE WHEN doc_id % 3 = 0 THEN 1 ELSE 0 END
                        AS BIGINT) AS nofollow
            FROM documents
        """,
        # PERCENTILE_CONT kept exact: 2*median = v_lo + v_hi (integer)
        "median_interp": """
            SELECT lang,
                   CAST(quantile_cont(n_chars, 0.5) * 2 AS BIGINT)
                     AS median_x2
            FROM documents GROUP BY lang
        """,
        # per-element TRUNC micros BEFORE the per-vector aggregates;
        # abs AFTER trunc (mirrors the numpy kernel exactly)
        "emb_stats": """
            WITH v AS (
              SELECT vec_id,
                     CAST(TRUNC(CAST(x AS DOUBLE) * 1000000)
                          AS BIGINT) AS v
              FROM embeddings, LATERAL unnest(embedding) AS t(x)),
            d AS (
              SELECT vec_id, CAST(len(embedding) AS BIGINT) AS dim
              FROM embeddings)
            SELECT d.vec_id, d.dim,
                   CAST(min(v.v) AS BIGINT) AS min_e6,
                   CAST(max(v.v) AS BIGINT) AS max_e6,
                   CAST(sum(abs(v.v)) AS BIGINT) AS l1_e6
            FROM d JOIN v ON d.vec_id = v.vec_id
            GROUP BY d.vec_id, d.dim
        """,
        # md5-substr bucket convention (same as hash_sample) mod 64
        "hash_features": """
            WITH w AS (
              SELECT doc_id, unnest(string_split(text, ' ')) AS w
              FROM documents
            ), b AS (
              SELECT doc_id,
                     CAST(('0x' || substr(md5(w), 1, 8)) AS BIGINT)
                       % 64 AS bucket
              FROM w WHERE w <> ''
            )
            SELECT doc_id, CAST(bucket AS BIGINT) AS bucket,
                   CAST(count(*) AS BIGINT) AS n
            FROM b GROUP BY doc_id, bucket
        """,
        # zscore_by_lang's exact expression tree + the 1.5σ filter
        "length_outliers": """
            WITH m AS (
              SELECT lang, CAST(count(*) AS DOUBLE) AS n,
                     CAST(SUM(n_chars) AS DOUBLE) AS s,
                     CAST(SUM(n_chars * n_chars) AS DOUBLE) AS ss
              FROM documents GROUP BY lang)
            SELECT d.doc_id, d.lang,
                   CAST(ROUND((d.n_chars - m.s / m.n)
                              / sqrt((m.ss - m.s * m.s / m.n) / m.n)
                              * 1000000.0) AS BIGINT) AS z_micros
            FROM documents d JOIN m USING (lang)
            WHERE abs(CAST(ROUND((d.n_chars - m.s / m.n)
                           / sqrt((m.ss - m.s * m.s / m.n) / m.n)
                           * 1000000.0) AS BIGINT)) > 1500000
        """,
        "dense_ranks": """
            SELECT doc_id, lang, n_chars,
                   CAST(DENSE_RANK() OVER (PARTITION BY lang
                                           ORDER BY n_chars)
                        AS BIGINT) AS dense_rank
            FROM documents
        """,
        "page2_docs": """
            SELECT doc_id, n_chars FROM documents
            ORDER BY n_chars DESC, doc_id
            LIMIT 10 OFFSET 10
        """,
        "regex_extract": """
            SELECT doc_id,
                   regexp_extract(text, '([aeiou]{2,})', 1)
                     AS first_run,
                   CAST(regexp_extract(text, '([aeiou]{2,})', 1)
                        <> '' AS BIGINT) AS matched
            FROM documents
        """,
        "drift_union": """
            SELECT doc_id, lang FROM documents
        """,
        # same float literals both sides; exact cents x basis points
        "q6_forecast": """
            SELECT CAST(SUM(
                     CAST(ROUND(l_extendedprice * 100) AS BIGINT) *
                     CAST(ROUND(l_discount * 100) AS BIGINT))
                   AS BIGINT) AS revenue_e4
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '1996-01-01'
              AND l_shipdate < TIMESTAMP '1997-01-01'
              AND l_discount >= 0.05 AND l_discount <= 0.07
              AND l_quantity < 24
        """,
        "q19_disjunctive": """
            SELECT CAST(SUM(
                     CAST(ROUND(l.l_extendedprice * 100) AS BIGINT) *
                     (100 - CAST(ROUND(l.l_discount * 100) AS BIGINT))
                   ) AS BIGINT) AS revenue_e4,
                   CAST(count(*) AS BIGINT) AS n_items
            FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
            WHERE (p.p_brand = 'Brand#1'
                   AND p.p_size BETWEEN 1 AND 15
                   AND l.l_quantity BETWEEN 1 AND 20)
               OR (p.p_brand = 'Brand#2'
                   AND p.p_size BETWEEN 10 AND 30
                   AND l.l_quantity BETWEEN 10 AND 30)
        """,
        "catalog_audit": """
            SELECT 'region' AS tbl, CAST(count(*) AS BIGINT) AS n_rows,
                   CAST(2 AS BIGINT) AS n_cols FROM region
            UNION ALL SELECT 'nation', count(*), 3 FROM nation
            UNION ALL SELECT 'customer', count(*), 5 FROM customer
            UNION ALL SELECT 'supplier', count(*), 4 FROM supplier
            UNION ALL SELECT 'part', count(*), 6 FROM part
            UNION ALL SELECT 'orders', count(*), 6 FROM orders
            UNION ALL SELECT 'lineitem', count(*), 11 FROM lineitem
            UNION ALL SELECT 'events', count(*), 6 FROM events
            UNION ALL SELECT 'documents', count(*), 5 FROM documents
            UNION ALL SELECT 'embeddings', count(*), 3 FROM embeddings
        """,
        "bigram_logprob": """
            WITH w AS (
              SELECT doc_id, string_split(text, ' ') AS ws
              FROM documents),
            bg AS (
              SELECT doc_id, ws[i] || ' ' || ws[i+1] AS g
              FROM w, LATERAL unnest(
                generate_series(1, len(ws) - 1)) AS t(i)),
            cnt AS (SELECT g, count(*) AS c FROM bg GROUP BY g),
            tot AS (SELECT CAST(count(*) AS DOUBLE) AS t FROM bg),
            tf AS (SELECT doc_id, g, count(*) AS tf FROM bg
                   GROUP BY doc_id, g)
            SELECT tf.doc_id,
                   CAST(SUM(tf.tf * CAST(ROUND(
                       ln(cnt.c / tot.t) * 1000000.0) AS BIGINT))
                     AS BIGINT) AS logprob_micros
            FROM tf JOIN cnt USING (g) CROSS JOIN tot
            GROUP BY tf.doc_id
        """,
        # P90 = ceil(0.9*N)-th smallest (grouped_quantiles rule)
        "winsorize_lengths": """
            WITH r AS (
              SELECT lang, n_chars,
                     row_number() OVER (PARTITION BY lang
                                        ORDER BY n_chars) AS rn,
                     count(*) OVER (PARTITION BY lang) AS cnt
              FROM documents),
            q AS (
              SELECT lang, max(CASE WHEN rn = GREATEST(1,
                         CAST(ceil(cnt * 0.9) AS BIGINT))
                         THEN n_chars END) AS p90
              FROM r GROUP BY lang)
            SELECT d.doc_id, d.lang,
                   CAST(LEAST(d.n_chars, q.p90) AS BIGINT)
                     AS n_clipped
            FROM documents d JOIN q USING (lang)
        """,
        "cumulative_users": """
            WITH f AS (
              SELECT user_id, min(epoch_us(ts)) // 86400000000 AS day
              FROM events GROUP BY user_id),
            d AS (
              SELECT CAST(day AS BIGINT) AS day,
                     CAST(count(*) AS BIGINT) AS n_new
              FROM f GROUP BY day)
            SELECT day, n_new,
                   CAST(SUM(n_new) OVER (ORDER BY day) AS BIGINT)
                     AS n_cum
            FROM d
        """,
        # isodow-1 == Arrow day_of_week (Monday=0)
        "events_heatmap": """
            SELECT CAST(isodow(ts) - 1 AS BIGINT) AS dow,
                   CAST(hour(ts) AS BIGINT) AS hour,
                   CAST(count(*) AS BIGINT) AS n
            FROM events GROUP BY 1, 2
        """,
        # exact ppm share: floor division on both sides
        "revenue_share": """
            WITH m AS (
              SELECT CAST(EXTRACT(year FROM o_orderdate) AS BIGINT)
                       AS o_year,
                     CAST(EXTRACT(month FROM o_orderdate) AS BIGINT)
                       AS o_month,
                     CAST(SUM(CAST(ROUND(o_totalprice * 100)
                                   AS BIGINT)) AS BIGINT)
                       AS revenue_cents
              FROM orders GROUP BY 1, 2)
            SELECT o_year, o_month, revenue_cents,
                   CAST(revenue_cents * 1000000 //
                        (SELECT SUM(revenue_cents) FROM m)
                        AS BIGINT) AS share_ppm
            FROM m
        """,
        # EXISTS(shipdate > orderdate+90d) algebrized as MAX() on both
        # sides; all comparisons on int64 epoch-micros
        "q4_priority": """
            SELECT o_orderpriority,
                   CAST(COUNT(*) AS BIGINT) AS order_count
            FROM orders o
            WHERE o_orderdate >= TIMESTAMP '1996-07-01'
              AND o_orderdate < TIMESTAMP '1997-01-01'
              AND EXISTS (SELECT 1 FROM lineitem
                          WHERE l_orderkey = o.o_orderkey
                            AND l_shipdate > o.o_orderdate
                                + INTERVAL 90 DAY)
            GROUP BY o_orderpriority
            ORDER BY o_orderpriority
        """,
        # q1_pricing money convention; (revenue DESC, custkey) makes
        # the limit-20 cut deterministic on both sides
        "q10_returns": """
            SELECT c.c_custkey, c.c_name, n.n_name,
                   CAST(SUM(CAST(ROUND(l_extendedprice * 100)
                                 AS BIGINT)
                            * (100 - CAST(ROUND(l_discount * 100)
                                          AS BIGINT)))
                        AS BIGINT) AS revenue_e4
            FROM lineitem l
            JOIN orders o ON o.o_orderkey = l.l_orderkey
            JOIN customer c ON c.c_custkey = o.o_custkey
            JOIN nation n ON n.n_nationkey = c.c_nationkey
            WHERE l.l_returnflag = 'R'
              AND o.o_orderdate >= TIMESTAMP '1996-01-01'
              AND o.o_orderdate < TIMESTAMP '1996-04-01'
            GROUP BY 1, 2, 3
            ORDER BY revenue_e4 DESC, c.c_custkey LIMIT 20
        """,
        "q12_priority_mix": """
            SELECT l_returnflag,
                   CAST(SUM(CASE WHEN o_orderpriority IN
                                 ('1-URGENT', '2-HIGH')
                            THEN 1 ELSE 0 END) AS BIGINT)
                       AS high_lines,
                   CAST(SUM(CASE WHEN o_orderpriority IN
                                 ('1-URGENT', '2-HIGH')
                            THEN 0 ELSE 1 END) AS BIGINT)
                       AS low_lines
            FROM lineitem JOIN orders ON o_orderkey = l_orderkey
            WHERE l_shipdate >= TIMESTAMP '1997-01-01'
              AND l_shipdate < TIMESTAMP '1998-01-01'
            GROUP BY l_returnflag ORDER BY l_returnflag
        """,
        "q14_promo_share": """
            SELECT
              CAST(SUM(CASE WHEN p_type = 'PROMO'
                       THEN CAST(ROUND(l_extendedprice * 100)
                                 AS BIGINT)
                            * (100 - CAST(ROUND(l_discount * 100)
                                          AS BIGINT))
                       ELSE 0 END) AS BIGINT) AS promo_revenue_e4,
              CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
                       * (100 - CAST(ROUND(l_discount * 100)
                                     AS BIGINT)))
                   AS BIGINT) AS total_revenue_e4
            FROM lineitem JOIN part ON p_partkey = l_partkey
            WHERE l_shipdate >= TIMESTAMP '1997-09-01'
              AND l_shipdate < TIMESTAMP '1997-10-01'
        """,
        # HAVING on exact integer units BEFORE the join, same as the
        # Ray plan; (sum_qty DESC, orderkey) pins the limit-20 cut
        "q18_big_orders": """
            WITH t AS (
              SELECT l_orderkey,
                     CAST(SUM(CAST(ROUND(l_quantity) AS BIGINT))
                          AS BIGINT) AS sum_qty
              FROM lineitem GROUP BY l_orderkey
              HAVING SUM(CAST(ROUND(l_quantity) AS BIGINT)) > 150)
            SELECT t.l_orderkey, t.sum_qty, o.o_orderdate,
                   CAST(ROUND(o_totalprice * 100) AS BIGINT)
                       AS total_cents,
                   c.c_name
            FROM t
            JOIN orders o ON o.o_orderkey = t.l_orderkey
            JOIN customer c ON c.c_custkey = o.o_custkey
            ORDER BY t.sum_qty DESC, t.l_orderkey LIMIT 20
        """,
        "corr_matrix": _corr_matrix_sql(),
        # skyline = per-x max, then strict running-max from high x
        # down (exactly agg.pareto_front's frontier rule)
        "pareto_front": """
            WITH p AS (
              SELECT CAST(ROUND(l_quantity) AS BIGINT) AS x,
                     CAST(ROUND(l_extendedprice * 100) AS BIGINT)
                         AS y_scaled
              FROM lineitem),
            m AS (SELECT x, MAX(y_scaled) AS y_scaled
                  FROM p GROUP BY x),
            w AS (SELECT x, y_scaled,
                         MAX(y_scaled) OVER (ORDER BY x DESC
                           ROWS BETWEEN UNBOUNDED PRECEDING
                           AND 1 PRECEDING) AS best
                  FROM m)
            SELECT x, y_scaled FROM w
            WHERE best IS NULL OR y_scaled > best
        """,
        # render_depth_page closed forms: depth chain doc_id%7+3 ends
        # in a span (html=1 -> span at %7+6); elements = html, head,
        # title, body, divs, span, ul, lis
        "dom_depth": """
            SELECT doc_id,
                   CAST(doc_id % 7 + 6 AS BIGINT) AS max_depth,
                   CAST(11 + doc_id % 7 + doc_id % 6 AS BIGINT)
                       AS n_elements
            FROM documents
        """,
        # ul of n = doc_id%6+2 items: nth-child(odd) = ceil(n/2),
        # nth-child(2n) = floor(n/2), both sibling forms = n-1
        "css_structural": """
            SELECT doc_id,
                   CAST((doc_id % 6 + 3) // 2 AS BIGINT) AS n_odd,
                   CAST((doc_id % 6 + 2) // 2 AS BIGINT) AS n_even,
                   CAST(doc_id % 6 + 1 AS BIGINT) AS n_adj,
                   CAST(doc_id % 6 + 1 AS BIGINT) AS n_sib
            FROM documents
        """,
        # lower weighted median: smallest v with 2*cumw >= totalw —
        # pure integer rule on both sides
        "weighted_median": """
            WITH g AS (
              SELECT l_returnflag,
                     CAST(ROUND(l_quantity) AS BIGINT) AS v,
                     SUM(CAST(ROUND(l_extendedprice * 100)
                              AS BIGINT)) AS w
              FROM lineitem GROUP BY 1, 2),
            c AS (
              SELECT l_returnflag, v,
                     SUM(w) OVER (PARTITION BY l_returnflag
                                  ORDER BY v) AS cw,
                     SUM(w) OVER (PARTITION BY l_returnflag) AS tw
              FROM g)
            SELECT l_returnflag, CAST(MIN(v) AS BIGINT) AS w_median
            FROM c WHERE 2 * cw >= tw
            GROUP BY l_returnflag ORDER BY l_returnflag
        """,
        # HUGEINT moments (squared cents overflow BIGINT); float
        # nesting mirrors agg.grouped_ols exactly — slope = num/den,
        # intercept = (sy - slope*sx)/n, *1e6 LAST
        "ols_price_qty": """
            WITH s AS (
              SELECT l_returnflag, COUNT(*) AS n,
                SUM(CAST(ROUND(l_quantity) AS HUGEINT)) AS sx,
                SUM(CAST(ROUND(l_extendedprice * 100) AS HUGEINT))
                    AS sy,
                SUM(CAST(ROUND(l_quantity) AS HUGEINT)
                    * CAST(ROUND(l_quantity) AS HUGEINT)) AS sxx,
                SUM(CAST(ROUND(l_quantity) AS HUGEINT)
                    * CAST(ROUND(l_extendedprice * 100) AS HUGEINT))
                    AS sxy
              FROM lineitem GROUP BY 1)
            SELECT l_returnflag, CAST(n AS BIGINT) AS n,
              CAST(ROUND(CAST(n * sxy - sx * sy AS DOUBLE)
                         / CAST(n * sxx - sx * sx AS DOUBLE)
                         * 1000000.0) AS BIGINT) AS slope_micros,
              CAST(ROUND((CAST(sy AS DOUBLE)
                          - CAST(n * sxy - sx * sy AS DOUBLE)
                            / CAST(n * sxx - sx * sx AS DOUBLE)
                            * CAST(sx AS DOUBLE))
                         / CAST(n AS DOUBLE)
                         * 1000000.0) AS BIGINT)
                  AS intercept_micros
            FROM s ORDER BY l_returnflag
        """,
        "q7_nation_volume": """
            SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
                   CAST(year(l_shipdate) AS BIGINT) AS l_year,
                   CAST(SUM(CAST(round(l_extendedprice * 100)
                                 AS BIGINT)
                            * (100 - CAST(round(l_discount * 100)
                                          AS BIGINT)))
                        AS BIGINT) AS revenue_e4
            FROM lineitem
            JOIN orders ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            JOIN supplier ON l_suppkey = s_suppkey
            JOIN nation sn ON s_nationkey = sn.n_nationkey
            JOIN nation cn ON c_nationkey = cn.n_nationkey
            WHERE ((sn.n_name = 'NATION_3'
                    AND cn.n_name = 'NATION_12')
                OR (sn.n_name = 'NATION_12'
                    AND cn.n_name = 'NATION_3'))
              AND l_shipdate >= TIMESTAMP '1996-01-01'
              AND l_shipdate <  TIMESTAMP '1998-01-01'
            GROUP BY 1, 2, 3 ORDER BY 1, 2, 3
        """,
        "q8_market_share": """
            SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
                   CAST(SUM(CASE WHEN sn.n_name = 'NATION_3' THEN
                        CAST(round(l_extendedprice * 100) AS BIGINT)
                        * (100 - CAST(round(l_discount * 100)
                                      AS BIGINT))
                        ELSE 0 END) AS BIGINT) AS nation_rev_e4,
                   CAST(SUM(CAST(round(l_extendedprice * 100)
                                 AS BIGINT)
                            * (100 - CAST(round(l_discount * 100)
                                          AS BIGINT)))
                        AS BIGINT) AS total_rev_e4
            FROM lineitem
            JOIN part ON l_partkey = p_partkey
            JOIN orders ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            JOIN nation cn ON c_nationkey = cn.n_nationkey
            JOIN region ON cn.n_regionkey = r_regionkey
            JOIN supplier ON l_suppkey = s_suppkey
            JOIN nation sn ON s_nationkey = sn.n_nationkey
            WHERE r_name = 'ASIA' AND p_type = 'MEDIUM'
            GROUP BY 1 ORDER BY 1
        """,
        "q13_order_dist": """
            SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
            FROM (
              SELECT c.c_custkey,
                     CAST(COUNT(o.o_orderkey) AS BIGINT) AS c_count
              FROM customer c
              LEFT JOIN orders o ON c.c_custkey = o.o_custkey
              GROUP BY c.c_custkey)
            GROUP BY c_count ORDER BY custdist DESC, c_count DESC
        """,
        "q15_top_supplier": """
            WITH rev AS (
              SELECT l_suppkey,
                     CAST(SUM(CAST(round(l_extendedprice * 100)
                                   AS BIGINT)
                              * (100 - CAST(round(l_discount * 100)
                                            AS BIGINT)))
                          AS BIGINT) AS total_rev_e4
              FROM lineitem
              WHERE l_shipdate >= TIMESTAMP '1997-01-01'
                AND l_shipdate <  TIMESTAMP '1997-04-01'
              GROUP BY 1)
            SELECT s_suppkey, s_name, total_rev_e4
            FROM rev JOIN supplier ON l_suppkey = s_suppkey
            WHERE total_rev_e4 = (SELECT MAX(total_rev_e4) FROM rev)
            ORDER BY s_suppkey
        """,
        "q17_small_qty": """
            WITH bp AS (
              SELECT p_partkey FROM part WHERE p_brand = 'Brand#4'
            ), st AS (
              SELECT l_partkey,
                     CAST(SUM(CAST(round(l_quantity) AS BIGINT))
                          AS BIGINT) AS sq,
                     CAST(COUNT(*) AS BIGINT) AS n
              FROM lineitem JOIN bp ON l_partkey = p_partkey
              GROUP BY 1)
            SELECT CAST(COUNT(*) AS BIGINT) AS n_small,
                   CAST(COALESCE(SUM(CAST(round(l_extendedprice
                                                * 100) AS BIGINT)),
                                 0) AS BIGINT) AS loss_cents
            FROM lineitem JOIN st ON lineitem.l_partkey = st.l_partkey
            WHERE CAST(round(l_quantity) AS BIGINT) * 5 * st.n < st.sq
        """,
        "q22_idle_rich": """
            WITH bal AS (
              SELECT c_custkey, c_nationkey,
                     CAST(round(c_acctbal * 100) AS BIGINT)
                       AS bal_cents
              FROM customer
            ), pos AS (
              SELECT CAST(SUM(bal_cents) AS BIGINT) AS tot,
                     CAST(COUNT(*) AS BIGINT) AS cnt
              FROM bal WHERE bal_cents > 0
            ), active AS (
              SELECT DISTINCT o_custkey FROM orders
              WHERE o_orderdate >= TIMESTAMP '1999-01-01'
            )
            SELECT CAST(bal.c_nationkey AS BIGINT) AS nationkey,
                   CAST(COUNT(*) AS BIGINT) AS numcust,
                   CAST(SUM(bal_cents) AS BIGINT) AS total_bal_cents
            FROM bal LEFT JOIN active
                 ON bal.c_custkey = active.o_custkey
            WHERE active.o_custkey IS NULL
              AND bal.bal_cents * (SELECT cnt FROM pos)
                  > (SELECT tot FROM pos)
            GROUP BY 1 ORDER BY 1
        """,
        # Q21 sole-blame rule in CTEs: per-(order, supplier) last
        # ship, per-order supplier count + unique-max check, F-status
        # filter, per-supplier count — (numwait DESC, s_name) makes
        # the limit-100 cut deterministic on both sides
        "q21_waiting": """
            WITH last_ship AS (
              SELECT l_orderkey, l_suppkey,
                     MAX(CAST(epoch_us(l_shipdate) AS BIGINT))
                       AS ship_us
              FROM lineitem GROUP BY 1, 2
            ), ord AS (
              SELECT l_orderkey, COUNT(*) AS n_supp,
                     MAX(ship_us) AS m1
              FROM last_ship GROUP BY 1
            ), atmax AS (
              SELECT ls.l_orderkey, COUNT(*) AS n_at_max
              FROM last_ship ls JOIN ord USING (l_orderkey)
              WHERE ls.ship_us = ord.m1 GROUP BY 1
            )
            SELECT s_name, CAST(COUNT(*) AS BIGINT) AS numwait
            FROM last_ship ls
            JOIN ord USING (l_orderkey)
            JOIN atmax USING (l_orderkey)
            JOIN orders ON o_orderkey = ls.l_orderkey
                       AND o_orderstatus = 'F'
            JOIN supplier ON s_suppkey = ls.l_suppkey
            WHERE ord.n_supp >= 2 AND ls.ship_us = ord.m1
              AND atmax.n_at_max = 1
            GROUP BY s_name ORDER BY numwait DESC, s_name LIMIT 100
        """,
        # 2 unrolled HITS iterations in exact BIGINT: hub0 = 1, each
        # half-step a join+group-by over the reconstructed edge list —
        # order-free integer sums match functions/graph.hits_ints
        # bit-for-bit (roster left joins keep score-0 nodes present)
        "hits_2iter": """
            WITH edges AS (
              SELECT doc_id AS src,
                     CAST((doc_id + k + 1) % 100000000 AS BIGINT)
                       AS dst
              FROM documents,
              LATERAL unnest(generate_series(0, doc_id % 4 - 1))
                AS t(k)
            ), nodes AS (
              SELECT DISTINCT node FROM (
                SELECT src AS node FROM edges
                UNION ALL SELECT dst FROM edges)
            ), a1 AS (
              SELECT dst AS node, CAST(COUNT(*) AS BIGINT) AS v
              FROM edges GROUP BY 1
            ), h1 AS (
              SELECT e.src AS node,
                     CAST(SUM(COALESCE(a1.v, 0)) AS BIGINT) AS v
              FROM edges e LEFT JOIN a1 ON e.dst = a1.node
              GROUP BY 1
            ), a2 AS (
              SELECT e.dst AS node,
                     CAST(SUM(COALESCE(h1.v, 0)) AS BIGINT) AS v
              FROM edges e LEFT JOIN h1 ON e.src = h1.node
              GROUP BY 1
            ), h2 AS (
              SELECT e.src AS node,
                     CAST(SUM(COALESCE(a2.v, 0)) AS BIGINT) AS v
              FROM edges e LEFT JOIN a2 ON e.dst = a2.node
              GROUP BY 1
            )
            SELECT nodes.node,
                   CAST(COALESCE(a2.v, 0) AS BIGINT) AS auth,
                   CAST(COALESCE(h2.v, 0) AS BIGINT) AS hub
            FROM nodes
            LEFT JOIN a2 ON nodes.node = a2.node
            LEFT JOIN h2 ON nodes.node = h2.node
        """,
        "knn_graph": """
            WITH ranked AS (
              SELECT a.vec_id, b.vec_id AS neighbor_id,
                     row_number() OVER (
                       PARTITION BY a.vec_id
                       ORDER BY list_cosine_similarity(
                                  CAST(a.embedding AS DOUBLE[]),
                                  CAST(b.embedding AS DOUBLE[])) DESC,
                                b.vec_id) AS rnk
              FROM embeddings a
              JOIN embeddings b ON a.vec_id <> b.vec_id)
            SELECT vec_id, neighbor_id, CAST(rnk AS BIGINT) AS rank
            FROM ranked WHERE rnk <= 5
        """,
        "bpe_learn": """
            -- replay 3 BPE training rounds: pair counts from
            -- word-frequency-weighted adjacent tokens; greedy
            -- left-to-right merge application = run-parity rule
            -- (within each run of consecutive matched positions the
            -- 1st, 3rd, ... win), expressed with window functions
            WITH words AS (
              SELECT UNNEST(string_split(text, ' ')) AS w FROM documents),
            wc AS (SELECT w, COUNT(*) AS c FROM words WHERE w <> '' GROUP BY w),
            t0 AS (
              SELECT w, c, CAST(i AS INTEGER) AS pos,
                     substr(w, CAST(i AS INTEGER), 1) AS tok
              FROM wc, UNNEST(range(1, LENGTH(w) + 1)) AS t(i)),
            a1 AS (
              SELECT l, r, SUM(c) AS n FROM (
                SELECT tok AS l, LEAD(tok) OVER (PARTITION BY w ORDER BY pos) AS r, c
                FROM t0) WHERE r IS NOT NULL GROUP BY l, r),
            m1 AS (SELECT l, r, n FROM a1 ORDER BY n DESC, l, r LIMIT 1),
            mk1 AS (
              SELECT t0.w, t0.c, t0.pos, t0.tok,
                     (t0.tok = m1.l AND
                      LEAD(t0.tok) OVER (PARTITION BY t0.w ORDER BY t0.pos) = m1.r)
                     AS is_mark
              FROM t0 CROSS JOIN m1),
            sel1 AS (
              SELECT w, pos FROM (
                SELECT w, pos,
                       ROW_NUMBER() OVER (PARTITION BY w, grp ORDER BY pos) AS off
                FROM (SELECT w, pos,
                             pos - ROW_NUMBER() OVER (PARTITION BY w ORDER BY pos)
                               AS grp
                      FROM mk1 WHERE is_mark))
              WHERE off % 2 = 1),
            t1 AS (
              SELECT w, c, ROW_NUMBER() OVER (PARTITION BY w ORDER BY opos) AS pos,
                     tok
              FROM (
                SELECT t.w, t.c, t.pos AS opos,
                       CASE WHEN s.pos IS NOT NULL
                            THEN (SELECT l || r FROM m1) ELSE t.tok END AS tok
                FROM mk1 t
                LEFT JOIN sel1 s ON s.w = t.w AND s.pos = t.pos
                LEFT JOIN sel1 sp ON sp.w = t.w AND sp.pos = t.pos - 1
                WHERE sp.pos IS NULL)),
            a2 AS (
              SELECT l, r, SUM(c) AS n FROM (
                SELECT tok AS l, LEAD(tok) OVER (PARTITION BY w ORDER BY pos) AS r, c
                FROM t1) WHERE r IS NOT NULL GROUP BY l, r),
            m2 AS (SELECT l, r, n FROM a2 ORDER BY n DESC, l, r LIMIT 1),
            mk2 AS (
              SELECT t1.w, t1.c, t1.pos, t1.tok,
                     (t1.tok = m2.l AND
                      LEAD(t1.tok) OVER (PARTITION BY t1.w ORDER BY t1.pos) = m2.r)
                     AS is_mark
              FROM t1 CROSS JOIN m2),
            sel2 AS (
              SELECT w, pos FROM (
                SELECT w, pos,
                       ROW_NUMBER() OVER (PARTITION BY w, grp ORDER BY pos) AS off
                FROM (SELECT w, pos,
                             pos - ROW_NUMBER() OVER (PARTITION BY w ORDER BY pos)
                               AS grp
                      FROM mk2 WHERE is_mark))
              WHERE off % 2 = 1),
            t2 AS (
              SELECT w, c, ROW_NUMBER() OVER (PARTITION BY w ORDER BY opos) AS pos,
                     tok
              FROM (
                SELECT t.w, t.c, t.pos AS opos,
                       CASE WHEN s.pos IS NOT NULL
                            THEN (SELECT l || r FROM m2) ELSE t.tok END AS tok
                FROM mk2 t
                LEFT JOIN sel2 s ON s.w = t.w AND s.pos = t.pos
                LEFT JOIN sel2 sp ON sp.w = t.w AND sp.pos = t.pos - 1
                WHERE sp.pos IS NULL)),
            a3 AS (
              SELECT l, r, SUM(c) AS n FROM (
                SELECT tok AS l, LEAD(tok) OVER (PARTITION BY w ORDER BY pos) AS r, c
                FROM t2) WHERE r IS NOT NULL GROUP BY l, r),
            m3 AS (SELECT l, r, n FROM a3 ORDER BY n DESC, l, r LIMIT 1)
            SELECT CAST(step AS BIGINT) AS step, lhs, rhs, CAST(n AS BIGINT) AS n
            FROM (
              SELECT 1 AS step, l AS lhs, r AS rhs, n FROM m1
              UNION ALL SELECT 2, l, r, n FROM m2
              UNION ALL SELECT 3, l, r, n FROM m3)
            ORDER BY step
        """,
        "weighted_sample": """
            -- exponential-race weighted draw replayed verbatim:
            -- key = min over j < weight of md5(id || ':' || j),
            -- global 100 smallest (key, id) win
            WITH w AS (
              SELECT doc_id, 1 + n_chars % 32 AS weight
              FROM documents),
            keys AS (
              SELECT w.doc_id, w.weight,
                     MIN(md5(CAST(w.doc_id AS VARCHAR) || ':'
                             || CAST(j.r AS VARCHAR))) AS race_key
              FROM w JOIN (SELECT UNNEST(range(32)) AS r) j
                ON j.r < w.weight
              GROUP BY w.doc_id, w.weight)
            SELECT doc_id, CAST(weight AS BIGINT) AS weight, race_key,
                   CAST(ROW_NUMBER() OVER (ORDER BY race_key, doc_id)
                        AS BIGINT) AS rank
            FROM keys
            QUALIFY rank <= 100
        """,
        "blocklist_hits": """
            -- non-overlapping substring counts per (doc, phrase):
            -- LENGTH/REPLACE greedy-left-to-right semantics match the
            -- Arrow count_substring kernel exactly
            SELECT doc_id, pattern, n FROM (
              SELECT d.doc_id, p.pattern,
                     CAST((LENGTH(d.text)
                           - LENGTH(REPLACE(d.text, p.pattern, '')))
                          / LENGTH(p.pattern) AS BIGINT) AS n
              FROM documents d
              CROSS JOIN (VALUES ('batch batch'), ('slow join'),
                                 ('window window'), ('spark'),
                                 ('dup'), ('merge part'))
                         p(pattern))
            WHERE n > 0
        """,
        "robots_filter": """
            -- per-host robots rules (the * group of the synthetic
            -- robots.txt) applied longest-prefix-wins, Allow wins
            -- ties, no match => allowed
            WITH hosts AS (
              SELECT DISTINCT source,
                     CAST(substr(source, 4) AS INTEGER) AS h
              FROM documents),
            rules AS (
              SELECT source, FALSE AS allow, '/private' AS prefix
              FROM hosts
              UNION ALL
              SELECT source, TRUE, '/private/pub' FROM hosts
              WHERE h % 2 = 0
              UNION ALL
              SELECT source, FALSE, '/' FROM hosts WHERE h % 5 = 0),
            urls AS (
              SELECT doc_id, source,
                     CASE doc_id % 4
                       WHEN 0 THEN '/private/pub/'
                                   || CAST(doc_id AS VARCHAR)
                       WHEN 1 THEN '/private/'
                                   || CAST(doc_id AS VARCHAR)
                       WHEN 2 THEN '/public/'
                                   || CAST(doc_id AS VARCHAR)
                       ELSE '/' || lang || '/'
                            || CAST(doc_id AS VARCHAR)
                     END AS path
              FROM documents),
            decided AS (
              SELECT u.doc_id, r.prefix, r.allow,
                     ROW_NUMBER() OVER (
                       PARTITION BY u.doc_id
                       ORDER BY 2 * LENGTH(r.prefix)
                                + CAST(r.allow AS INTEGER) DESC) AS rn
              FROM urls u
              JOIN rules r ON u.source = r.source
                          AND starts_with(u.path, r.prefix))
            SELECT u.doc_id,
                   'https://' || u.source || '.synth.invalid'
                   || u.path AS url,
                   d.prefix AS matched_rule,
                   COALESCE(d.allow, TRUE) AS allowed
            FROM urls u
            LEFT JOIN (SELECT * FROM decided WHERE rn = 1) d
              USING (doc_id)
        """,
        # same md5 split rule as split_assign, grouped by the
        # synthetic host; >1 distinct split per host == leakage
        "split_leakage": """
            WITH b AS (
              SELECT doc_id,
                     'h' || CAST(doc_id % 53 AS VARCHAR) AS host,
                     CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)),
                                         1, 8) AS BIGINT)
                       / 4294967296.0 AS bf
              FROM documents),
            s AS (
              SELECT host,
                     CASE WHEN bf < 0.8 THEN 'train'
                          WHEN bf < 0.9 THEN 'val'
                          ELSE 'test' END AS split
              FROM b)
            SELECT host,
                   CAST(count(DISTINCT split) AS BIGINT) AS n_splits,
                   CAST(count(*) AS BIGINT) AS n_docs
            FROM s GROUP BY host
            HAVING count(DISTINCT split) > 1
        """,
        # positional self-join: token i = 'spark' and token i+1 =
        # 'window' — the exact adjacency the posting-intersection
        # kernel counts
        "phrase_search": """
            WITH toks AS (
              SELECT doc_id, string_split(text, ' ') AS xs
              FROM documents),
            pos AS (
              SELECT doc_id, xs[i] AS w, i
              FROM toks,
              LATERAL unnest(generate_series(1, len(xs))) AS t(i))
            SELECT p0.doc_id, CAST(count(*) AS BIGINT) AS n_hits
            FROM pos p0
            JOIN pos p1 ON p0.doc_id = p1.doc_id AND p1.i = p0.i + 1
            WHERE p0.w = 'spark' AND p1.w = 'window'
            GROUP BY p0.doc_id
        """,
        # SemDeDup closed form: assign to the nearest of the 8
        # lowest-id centroids (ties to lowest centroid index), keep
        # iff no lower-id cluster-mate is >= the cosine threshold
        "semdedup": """
            WITH cents AS (
              SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cid,
                     embedding
              FROM (SELECT * FROM embeddings ORDER BY vec_id LIMIT 8)),
            sim AS (
              SELECT e.vec_id, c.cid,
                     row_number() OVER (
                       PARTITION BY e.vec_id
                       ORDER BY list_cosine_similarity(
                                  CAST(e.embedding AS DOUBLE[]),
                                  CAST(c.embedding AS DOUBLE[])) DESC,
                                c.cid) AS rnk
              FROM embeddings e CROSS JOIN cents c),
            a AS (SELECT vec_id, cid FROM sim WHERE rnk = 1)
            SELECT a.vec_id, CAST(a.cid AS BIGINT) AS cluster_id,
                   CAST(CASE WHEN EXISTS (
                     SELECT 1 FROM a a2
                     JOIN embeddings e2 ON e2.vec_id = a2.vec_id
                     JOIN embeddings e1 ON e1.vec_id = a.vec_id
                     WHERE a2.cid = a.cid AND a2.vec_id < a.vec_id
                       AND list_cosine_similarity(
                             CAST(e1.embedding AS DOUBLE[]),
                             CAST(e2.embedding AS DOUBLE[])) >= 0.465)
                   THEN 0 ELSE 1 END AS BIGINT) AS keep
            FROM a
        """,
        # the unigram-LM CTE with token counts, per-token neg-logprob
        # quantized by integer floor division, then NTILE(3) over
        # (ppl_q, doc_id) — head/middle/tail
        "ccnet_buckets": """
            WITH words AS (
              SELECT doc_id, unnest(string_split(text, ' ')) AS w
              FROM documents),
            cnt AS (SELECT w, count(*) AS c FROM words GROUP BY w),
            tot AS (SELECT CAST(count(*) AS DOUBLE) AS t FROM words),
            tf AS (SELECT doc_id, w, count(*) AS tf FROM words
                   GROUP BY doc_id, w),
            lp AS (
              SELECT tf.doc_id,
                     CAST(SUM(tf.tf * CAST(ROUND(
                         ln(cnt.c / tot.t) * 1000000.0) AS BIGINT))
                       AS BIGINT) AS lpm,
                     CAST(SUM(tf.tf) AS BIGINT) AS ntok
              FROM tf JOIN cnt USING (w) CROSS JOIN tot
              GROUP BY tf.doc_id),
            q AS (
              SELECT doc_id, (-lpm) // (ntok * 10000) AS ppl_q
              FROM lp WHERE ntok > 0),
            t AS (
              SELECT doc_id, ppl_q,
                     NTILE(3) OVER (ORDER BY ppl_q, doc_id) AS tile
              FROM q)
            SELECT doc_id, CAST(ppl_q AS BIGINT) AS ppl_q,
                   CASE tile WHEN 1 THEN 'head'
                             WHEN 2 THEN 'middle'
                             ELSE 'tail' END AS bucket
            FROM t
        """,
        # apply the FIXED merges via the shared run-parity replay
        # (_BPE_APPLY_CTES), then n_bpe_tokens(doc) = sum tf * ntoks
        "bpe_encode": f"""
            WITH words AS (
              SELECT doc_id, UNNEST(string_split(text, ' ')) AS w
              FROM documents),
            tf AS (SELECT doc_id, w, count(*) AS tf FROM words
                   WHERE w <> '' GROUP BY doc_id, w),
            dw AS (SELECT DISTINCT w FROM tf),
            {_BPE_APPLY_CTES}
            SELECT tf.doc_id,
                   CAST(SUM(tf.tf * wn.ntoks) AS BIGINT)
                     AS n_bpe_tokens
            FROM tf JOIN wn USING (w)
            GROUP BY tf.doc_id
        """,
        # same merge replay grouped per language; fertility as exact
        # integer ppm of bpe tokens per whitespace word
        "tokenizer_fertility": f"""
            WITH words AS (
              SELECT lang, UNNEST(string_split(text, ' ')) AS w
              FROM documents),
            tfl AS (SELECT lang, w, count(*) AS tf FROM words
                    WHERE w <> '' GROUP BY lang, w),
            dw AS (SELECT DISTINCT w FROM tfl),
            {_BPE_APPLY_CTES}
            SELECT tfl.lang,
                   CAST(SUM(tfl.tf * wn.ntoks) AS BIGINT)
                     AS bpe_tokens,
                   CAST(SUM(tfl.tf) AS BIGINT) AS ws_tokens,
                   CAST(SUM(tfl.tf * wn.ntoks) * 1000000
                        // GREATEST(SUM(tfl.tf), 1) AS BIGINT)
                     AS fertility_ppm
            FROM tfl JOIN wn USING (w)
            GROUP BY tfl.lang
        """,
        # per-host trunc-mean of the classifier score (DuckDB //
        # truncates; the engine mirrors with an explicit-sign rule),
        # joined back per doc
        "host_reputation": """
            WITH w AS (
              SELECT doc_id, source,
                     unnest(string_split(text, ' ')) AS w
              FROM documents),
            b AS (
              SELECT doc_id, source,
                     CAST(('0x' || substr(md5(w), 1, 8)) AS BIGINT)
                       % 64 AS bucket
              FROM w WHERE w <> ''),
            sc AS (
              SELECT d.doc_id, d.source,
                     CAST(COALESCE(SUM((bucket % 7) - 3), 0)
                          AS BIGINT) AS score
              FROM documents d LEFT JOIN b USING (doc_id)
              GROUP BY d.doc_id, d.source),
            hm AS (
              SELECT source,
                     (SUM(score) * 1000000) // COUNT(*) AS hsm
              FROM sc GROUP BY source)
            SELECT sc.doc_id, sc.source AS host, sc.score,
                   CAST(hm.hsm AS BIGINT) AS host_score_micros
            FROM sc JOIN hm USING (source)
        """,
        # canonical form closed-form from the variant arithmetic
        # (only v=3 keeps a non-tracking query param), MIN doc per
        # canonical
        "canonical_dedup": """
            WITH canon AS (
              SELECT doc_id,
                     'https://synth.invalid/p/'
                     || lpad(CAST(doc_id // 3 AS VARCHAR), 8, '0')
                     || CASE WHEN doc_id % 5 = 3
                             THEN '?id=7' ELSE '' END AS url_canon
              FROM documents)
            SELECT MIN(doc_id) AS doc_id, url_canon
            FROM canon GROUP BY url_canon
        """,
        # replay every register: j = top 8 md5 bits, rho = leading
        # zeros of the 24-bit remainder + 1 (bit_length via exact
        # power-compare count), Max per register, then the scaled
        # integer harmonic denominator with absent registers at
        # 2^25 each
        "hll_by_source": """
            WITH dv AS (
              SELECT DISTINCT source, text FROM documents),
            h AS (
              SELECT source,
                     CAST(('0x' || substr(md5(text), 1, 8))
                          AS BIGINT) AS hv
              FROM dv),
            reg AS (
              SELECT source, hv // 16777216 AS j,
                     hv % 16777216 AS rem
              FROM h),
            bl AS (
              SELECT source, j, rem,
                     (SELECT count(*)
                      FROM (SELECT unnest(range(24)) AS k) t
                      WHERE rem >= (CAST(1 AS BIGINT) << k))
                       AS bitlen
              FROM reg),
            rr AS (
              SELECT source, j, MAX(24 - bitlen + 1) AS rho
              FROM bl GROUP BY source, j),
            agg AS (
              SELECT source, count(*) AS n_present,
                     SUM(CAST(1 AS BIGINT) << (25 - rho)) AS psum
              FROM rr GROUP BY source)
            SELECT source, CAST(256 AS BIGINT) AS m,
                   CAST(n_present AS BIGINT) AS n_present,
                   CAST(psum + (256 - n_present)
                        * (CAST(1 AS BIGINT) << 25) AS BIGINT)
                     AS denom_scaled
            FROM agg
        """,
        # pointer jumping unrolled: m1 = m0∘m0, m2 = m1∘m1,
        # m3 = m2∘m2 — a miss (target outside the redirect domain)
        # keeps the current target, exactly the block kernel's rule
        "redirect_resolve": """
            WITH m0 AS (
              SELECT doc_id AS src,
                     doc_id - 1 AS dst
              FROM documents WHERE doc_id % 5 <> 0),
            m1 AS (
              SELECT a.src, COALESCE(b.dst, a.dst) AS dst
              FROM m0 a LEFT JOIN m0 b ON a.dst = b.src),
            m2 AS (
              SELECT a.src, COALESCE(b.dst, a.dst) AS dst
              FROM m1 a LEFT JOIN m1 b ON a.dst = b.src),
            m3 AS (
              SELECT a.src, COALESCE(b.dst, a.dst) AS dst
              FROM m2 a LEFT JOIN m2 b ON a.dst = b.src)
            SELECT src, CAST(dst AS BIGINT) AS final_dst FROM m3
        """,
        # replay every CMS register (md5('r:word') % width) and take
        # the min over rows per query word
        "cms_counts": """
            WITH words AS (
              SELECT unnest(string_split(text, ' ')) AS w
              FROM documents),
            regs AS (
              SELECT rr.r,
                     CAST(('0x' || substr(md5(CAST(rr.r AS VARCHAR)
                                              || ':' || w), 1, 8))
                          AS BIGINT) % 1024 AS c,
                     count(*) AS cnt
              FROM words, (SELECT unnest(range(4)) AS r) rr
              WHERE w <> ''
              GROUP BY 1, 2),
            q AS (SELECT unnest(['spark', 'window', 'merge', 'the',
                                 'qqqabsent']) AS word),
            est AS (
              SELECT q.word, rr.r,
                     COALESCE((
                       SELECT cnt FROM regs g
                       WHERE g.r = rr.r
                         AND g.c = CAST(('0x' || substr(
                               md5(CAST(rr.r AS VARCHAR) || ':'
                                   || q.word), 1, 8)) AS BIGINT)
                             % 1024), 0) AS v
              FROM q, (SELECT unnest(range(4)) AS r) rr)
            SELECT word, CAST(MIN(v) AS BIGINT) AS est_count
            FROM est GROUP BY word
        """,
        # rebuild the synthetic pages from the word-position CTE
        # (6-word line groups + the same injection arithmetic), then
        # apply each C4 rule as a boolean column — no string surgery.
        # ASSUMPTION (holds for the driver's synth corpora, probed):
        # corpus words contain no terminal punctuation, no banned
        # phrases, no double spaces — the arithmetic rebuild equals
        # the engine's content-based rules only under that invariant;
        # a corpus violating it fails this oracle loudly (the engine
        # is content-correct either way)
        "c4_filter": """
            WITH toks AS (
              SELECT doc_id, string_split(text, ' ') AS xs
              FROM documents),
            pos AS (
              SELECT doc_id, xs[i] AS w, i
              FROM toks,
              LATERAL unnest(generate_series(1, len(xs))) AS t(i)),
            lines AS (
              SELECT doc_id, (i - 1) // 6 AS line_idx,
                     count(*) AS base_words,
                     string_agg(w, ' ' ORDER BY i) AS base_txt
              FROM pos GROUP BY doc_id, (i - 1) // 6),
            dec AS (
              SELECT doc_id, line_idx,
                     base_words
                       + CASE WHEN (doc_id * 7 + line_idx) % 11 = 0
                              THEN 1 ELSE 0 END AS n_words,
                     (doc_id * 7 + line_idx) % 11 = 0 AS has_js,
                     (doc_id + line_idx) % 3 <> 0 AS has_punct,
                     base_txt
                       || CASE WHEN (doc_id * 7 + line_idx) % 11 = 0
                               THEN ' javascript' ELSE '' END
                       || CASE WHEN (doc_id + line_idx) % 3 <> 0
                               THEN '.' ELSE '' END AS line_txt
              FROM lines),
            keptl AS (
              SELECT * FROM dec
              WHERE has_punct AND NOT has_js AND n_words >= 3),
            agg AS (
              SELECT doc_id,
                     count(*) + CASE WHEN doc_id % 17 = 0
                                     THEN 1 ELSE 0 END AS n_lines
              FROM dec GROUP BY doc_id),
            kagg AS (
              SELECT doc_id, count(*) AS n_kept,
                     string_agg(line_txt, chr(10)
                                ORDER BY line_idx) AS ktext
              FROM keptl GROUP BY doc_id)
            SELECT a.doc_id,
                   CAST(a.n_lines AS BIGINT) AS n_lines,
                   CAST(COALESCE(k.n_kept, 0) AS BIGINT)
                     AS n_kept_lines,
                   CAST(CASE WHEN a.doc_id % 17 <> 0
                              AND COALESCE(k.n_kept, 0) >= 3
                             THEN 1 ELSE 0 END AS BIGINT)
                     AS page_kept,
                   CASE WHEN a.doc_id % 17 <> 0
                         AND COALESCE(k.n_kept, 0) >= 3
                        THEN k.ktext ELSE '' END AS kept_text
            FROM agg a LEFT JOIN kagg k USING (doc_id)
        """,
        # the three gates in SQL: MIN-id-per-text winners, the
        # classifier score CTE, and the ccnet tile CTE — joined,
        # filtered to score>0 AND tile<=2
        "curate_tiered": """
            WITH words AS (
              SELECT doc_id, unnest(string_split(text, ' ')) AS w
              FROM documents),
            cnt AS (SELECT w, count(*) AS c FROM words GROUP BY w),
            tot AS (SELECT CAST(count(*) AS DOUBLE) AS t FROM words),
            tf AS (SELECT doc_id, w, count(*) AS tf FROM words
                   GROUP BY doc_id, w),
            lp AS (
              SELECT tf.doc_id,
                     CAST(SUM(tf.tf * CAST(ROUND(
                         ln(cnt.c / tot.t) * 1000000.0) AS BIGINT))
                       AS BIGINT) AS lpm,
                     CAST(SUM(tf.tf) AS BIGINT) AS ntok
              FROM tf JOIN cnt USING (w) CROSS JOIN tot
              GROUP BY tf.doc_id),
            q AS (
              SELECT doc_id, (-lpm) // (ntok * 10000) AS ppl_q
              FROM lp WHERE ntok > 0),
            t AS (
              SELECT doc_id, ppl_q,
                     NTILE(3) OVER (ORDER BY ppl_q, doc_id) AS tile
              FROM q),
            bkt AS (
              SELECT doc_id,
                     CAST(('0x' || substr(md5(w), 1, 8)) AS BIGINT)
                       % 64 AS bucket
              FROM words WHERE w <> ''),
            sc AS (
              SELECT doc_id,
                     CAST(SUM((bucket % 7) - 3) AS BIGINT) AS score
              FROM bkt GROUP BY doc_id),
            winners AS (
              SELECT MIN(doc_id) AS doc_id
              FROM documents GROUP BY text)
            SELECT t.doc_id,
                   CASE t.tile WHEN 1 THEN 'head'
                               ELSE 'middle' END AS tier,
                   s.score
            FROM t
            JOIN winners USING (doc_id)
            JOIN sc s USING (doc_id)
            WHERE s.score > 0 AND t.tile <= 2
        """,
        # hashing-trick buckets (same md5 rule as hash_features) dot
        # the fixed integer weight vector w[b] = b%7 - 3
        "quality_classifier": """
            WITH w AS (
              SELECT doc_id, unnest(string_split(text, ' ')) AS w
              FROM documents),
            b AS (
              SELECT doc_id,
                     CAST(('0x' || substr(md5(w), 1, 8)) AS BIGINT)
                       % 64 AS bucket
              FROM w WHERE w <> ''),
            s AS (
              SELECT doc_id,
                     CAST(SUM((bucket % 7) - 3) AS BIGINT) AS score
              FROM b GROUP BY doc_id)
            -- token-less docs score 0 (the engine scores every doc)
            SELECT d.doc_id,
                   COALESCE(s.score, 0) AS score,
                   CASE WHEN COALESCE(s.score, 0) > 0 THEN 'keep'
                        ELSE 'drop' END AS label
            FROM documents d LEFT JOIN s USING (doc_id)
        """,
    }
