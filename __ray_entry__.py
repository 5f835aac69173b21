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


def _pages(sf_dir: str):
    from ksoup_ray.sources.synth import cc_pages
    return cc_pages(sf_dir)


def _extracted(sf_dir: str):
    from ksoup_ray.pipelines.extract import run_extraction
    return run_extraction(_pages(sf_dir), out_dir="", write=False,
                          split_by_size=False, concurrency=(2, 8),
                          batch_size=64)


def entry() -> Any:
    """Flagship: synth CC pages from sf0.001 → ParseExtract actor pool."""
    ds = _extracted("/root/testdata/sf0.001")
    return ds.select_columns(["url", "extracted_text", "title", "lang",
                              "parse_errors", "doc_bytes", "partition_id"])


# ---------------------------------------------------------------------------

def _q_extract_text(sf_dir: str):
    return _extracted(sf_dir).select_columns(["url", "extracted_text",
                                              "title"])


def _q_extract_links(sf_dir: str):
    ds = _extracted(sf_dir)

    def count_links(batch: pa.Table) -> pa.Table:
        return pa.table({
            "url": batch.column("url"),
            "n_links": pc.cast(pc.list_value_length(batch.column("links")),
                               pa.int64()),
        })

    return ds.map_batches(count_links, batch_format="pyarrow")


def _q_extract_meta(sf_dir: str):
    ds = _extracted(sf_dir)

    def meta_cols(batch: pa.Table) -> pa.Table:
        meta = batch.column("meta")
        return pa.table({
            "url": batch.column("url"),
            "og_title": pc.struct_field(meta, "og_title"),
            "canonical": pc.struct_field(meta, "canonical"),
        })

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


def _q_exact_dedup(sf_dir: str):
    import ray.data as rd
    from ksoup_ray.functions.dedup import exact_dedup
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    kept = exact_dedup(ds, text_col="text", key_col="doc_id")
    return kept.select_columns(["doc_id", "text"])


def _q_minhash_dedup(sf_dir: str):
    import ray.data as rd
    from ksoup_ray.functions.dedup import minhash_lsh_dedup
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    return minhash_lsh_dedup(ds, num_hashes=64, num_bands=8)


def _q_simhash(sf_dir: str):
    import ray.data as rd
    from ksoup_ray.functions.dedup import SimHasher
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    out = ds.map_batches(SimHasher, batch_format="pyarrow", concurrency=(1, 4))
    return out.select_columns(["doc_id", "simhash"])


def _q_token_count(sf_dir: str):
    import ray.data as rd
    from ksoup_ray.functions.textstats import token_count_batch
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    out = ds.map_batches(token_count_batch, batch_format="pyarrow")
    return out.select_columns(["doc_id", "token_count"])


def _q_quality(sf_dir: str):
    import ray.data as rd
    from ksoup_ray.functions.textstats import quality_score_batch
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    out = ds.map_batches(quality_score_batch, batch_format="pyarrow")
    return out.select_columns(["doc_id", "n_chars_q", "n_words"])


def _q_langid(sf_dir: str):
    import ray.data as rd
    from ksoup_ray.functions.textstats import LangId
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text", "lang"])
    out = ds.map_batches(LangId, batch_format="pyarrow", concurrency=(1, 4))
    return out.select_columns(["doc_id", "pred_lang"])


def _q_dedup_components(sf_dir: str):
    """Composed near-dup pipeline: LSH candidates -> exact n-gram
    Jaccard verify -> connected components (rows-only check)."""
    import ray.data as rd
    from ksoup_ray.functions.dedup import (
        connected_components, minhash_candidate_pairs,
        verify_pairs_jaccard)
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    pairs = minhash_candidate_pairs(ds, num_hashes=64, num_bands=8)
    verified = verify_pairs_jaccard(
        pairs, ds, threshold=0.5).select_columns(["id_a", "id_b"])
    return connected_components(verified)


def _q_bpe_token_count(sf_dir: str):
    import ray.data as rd
    from ksoup_ray.functions.textstats import bpe_token_count_batch
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    out = ds.map_batches(bpe_token_count_batch, batch_format="pyarrow")
    return out.select_columns(["doc_id", "bpe_token_count"])


def _q_xml_roundtrip(sf_dir: str):
    """XML mode as a distributed stage: synthesize an XML doc per row,
    parse with the XmlTreeBuilder, extract text + attribute back."""
    import ray.data as rd
    from ksoup_ray.engine import parser as KP

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])

    def roundtrip(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        texts = batch.column("text").to_pylist()
        out_ids, out_texts = [], []
        for i, t in zip(ids, texts):
            xml = (f'<?xml version="1.0"?><doc id="{i}">'
                   f"<body>{t or ''}</body></doc>")
            doc = KP.parse_xml(xml)
            el = doc.select_first("doc")
            out_ids.append(int(el.attr("id")))
            out_texts.append(el.select_first("body").text())
        return pa.table({"doc_id": pa.array(out_ids, pa.int64()),
                         "xml_text": pa.array(out_texts, pa.string())})

    return ds.map_batches(roundtrip, batch_format="pyarrow")


def _q_fingerprint(sf_dir: str):
    import ray.data as rd
    from ksoup_ray.functions.textstats import fingerprint_batch
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    out = ds.map_batches(fingerprint_batch, batch_format="pyarrow")
    return out.select_columns(["doc_id", "fingerprint"])


_ANN_K = 10
_ANN_NQ = 4


def _q_ann_topk(sf_dir: str):
    import pyarrow.parquet as pq
    import ray.data as rd
    from ksoup_ray.functions.similarity import brute_force_topk
    qt = pq.read_table(f"{sf_dir}/embeddings.parquet",
                       columns=["vec_id", "embedding"])
    qdf = qt.to_pandas().sort_values("vec_id").head(_ANN_NQ)
    queries = np.array(qdf["embedding"].tolist(), dtype=np.float64)
    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                         columns=["vec_id", "embedding"])
    top = brute_force_topk(ds, queries, k=_ANN_K, concurrency=(1, 4))
    return top.select_columns(["query_id", "vec_id"])


def _q_ann_ivf(sf_dir: str):
    import pyarrow.parquet as pq
    import ray.data as rd
    from ksoup_ray.functions.similarity import ivf_topk
    qt = pq.read_table(f"{sf_dir}/embeddings.parquet",
                       columns=["vec_id", "embedding"])
    qdf = qt.to_pandas().sort_values("vec_id").head(_ANN_NQ)
    queries = np.array(qdf["embedding"].tolist(), dtype=np.float64)
    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                         columns=["vec_id", "embedding"])
    top = ivf_topk(ds, queries, k=_ANN_K, num_centroids=8, nprobe=8)
    return top.select_columns(["query_id", "vec_id"])


def _q_q1_pricing(sf_dir: str):
    """TPC-H Q1-style grouped aggregate with per-batch pre-aggregation
    (combiner) before the small groupby — the partial-agg pattern."""
    import ray.data as rd

    ds = rd.read_parquet(
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

    ds = rd.read_parquet(f"{sf_dir}/orders.parquet",
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

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
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
    """Cleaner/Safelist as a distributed stage (rows-only check)."""
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
                body = text.split("<body>", 1)[-1]
                outs.append(KP.clean(body, self.safelist))
            return pa.table({"url": pa.array(urls, pa.string()),
                             "clean_html": pa.array(outs, pa.string())})

    return ds.map_batches(CleanStage, batch_format="pyarrow", concurrency=(1, 4))


def _q_media_features(sf_dir: str):
    """Multimodal plumbing (stubbed decode — rows-only check)."""
    import ray.data as rd
    from ksoup_ray.functions.multimodal import ImageFeatures, synth_media_batch

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    media = ds.map_batches(synth_media_batch, batch_format="pyarrow")
    out = media.map_batches(ImageFeatures, batch_format="pyarrow",
                            batch_size=32, concurrency=(1, 2))
    return out.select_columns(["media_id", "width", "height"])


def queries() -> dict[str, Callable[[str], Any]]:
    return {
        "extract_text": _q_extract_text,
        "extract_links": _q_extract_links,
        "extract_meta": _q_extract_meta,
        "select_css": _q_select_css,
        "charset_decode": _q_charset_decode,
        "exact_dedup": _q_exact_dedup,
        "minhash_dedup": _q_minhash_dedup,
        "simhash": _q_simhash,
        "token_count": _q_token_count,
        "quality": _q_quality,
        "langid": _q_langid,
        "fingerprint": _q_fingerprint,
        "xml_roundtrip": _q_xml_roundtrip,
        "dedup_components": _q_dedup_components,
        "bpe_token_count": _q_bpe_token_count,
        "ann_topk": _q_ann_topk,
        "ann_ivf": _q_ann_ivf,
        "q1_pricing": _q_q1_pricing,
        "top_customers": _q_top_customers,
        "event_windows": _q_event_windows,
        "sanitize": _q_sanitize,
        "media_features": _q_media_features,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "extract_text": f"""
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
        "extract_meta": f"""
            SELECT {SYNTH_URL_SQL} AS url,
                   {TITLE_SQL} AS og_title,
                   {SYNTH_URL_SQL} AS canonical
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
        # minhash_dedup / simhash / langid / ann_ivf / sanitize /
        # media_features: non-SQL-expressible (LSH banding, bit
        # signatures, heuristic argmax, approximate recall, HTML
        # serialization, stubbed decode) → rows-only checks.
    }
