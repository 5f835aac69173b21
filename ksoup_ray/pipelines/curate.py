"""End-to-end training-data curation: the composition a 100 TB corpus
actually runs — exact dedup → verified MinHash-LSH near-dup drop →
language filter → token-length bounds — as ONE lazy Ray Data pipeline.

Shuffle inventory (nothing corpus-scale on the driver):
1. exact-dup DROP SET: one bounded (md5, id) bucket shuffle, zero
   joins — ``functions/dedup.exact_drop_ids``;
2. near-dup DROP SET over the full corpus: bands shuffle ids only,
   verification joins texts for candidate pairs only —
   ``functions/dedup.minhash_lsh_dedup``;
3. BOTH drop sets union into ONE ANTI-JOIN (left-outer on id + null
   filter — Ray 2.49 has no native anti join), so the document
   payloads ride exactly one join; duplicate ids across the two drop
   sets are harmless (they only multiply rows that the null filter
   discards);
4. token counting and the lang/length filters are pure Arrow kernels
   inside ``map_batches`` — no shuffle.

The drop sets are both computed over the FULL corpus (not iteratively
over survivors): an exact duplicate's near-dups are near-dups of its
keeper too (identical text ⇒ identical shingle set), so the surviving
set is the same either way and the two drop sets can be computed
concurrently — one scan each instead of a serialized two-pass.
(Until round-4 session 8 the exact stage returned KEPT rows via a
keeper payload join; the drop-set formulation removed that second
payload shuffle — at 100 TB the payload pass is the cost.)
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from ..functions.dedup import exact_drop_ids, minhash_lsh_dedup


def _anti_join(ds, drop_ids, id_col: str, num_partitions: int = 8):
    """ds rows whose id_col is NOT in drop_ids (a tiny id-only table).
    Left-outer join + null filter (no native anti join in Ray 2.49);
    only the id marker column rides the shuffle on the drop side."""
    import ray.data as rd
    marked = drop_ids.map_batches(
        lambda b: pa.table({"_drop_id": b.column(0).cast(pa.int64()),
                            "_dropped": pa.array([True] * b.num_rows)}),
        batch_format="pyarrow")
    # Ray 2.49 guard: map_groups sources emit schema-LESS empty blocks
    # and the hash join dies when a right-side partition sees no
    # schema at all — which a zero-duplicate drop set guarantees
    # (repartition can't restore a schema no block carries, and a
    # 0-row seed doesn't flow through the shuffle). Seed ONE sentinel
    # row whose key (-1) can never match a real nonnegative id: it
    # carries the schema through the shuffle and joins to nothing.
    seed = rd.from_arrow(pa.table({
        "_drop_id": pa.array([-1], pa.int64()),
        "_dropped": pa.array([True], pa.bool_())}))
    marked = marked.union(seed).repartition(4)
    # strip parquet-footer pandas metadata: a schema with a metadata
    # dict is unhashable, defeating the shuffle's schema-dedup fast
    # path (one warning per aggregator otherwise)
    from ..functions.dedup import strip_schema_metadata
    joined = strip_schema_metadata(ds).join(
        marked, join_type="left_outer",
        num_partitions=num_partitions,
        on=(id_col,), right_on=("_drop_id",))
    return joined.map_batches(
        lambda b: b.filter(pc.is_null(b.column("_dropped")))
        .drop_columns([c for c in ("_dropped", "_drop_id")
                       if c in b.column_names]),
        batch_format="pyarrow")


def curate_to_parquet(ds, out_dir: str, *, num_partitions: int = 64,
                      resume: bool = True, **curate_kwargs) -> dict:
    """Run ``curate_documents`` and land the survivors through the
    shared resumable partitioned sink (``pipelines/sink.py``):
    hive-partitioned by doc_id, per-partition lineage, reruns skip
    finished partitions. Returns the sink's stats dict."""
    from .sink import write_partitioned
    out = curate_documents(ds, **curate_kwargs)
    return write_partitioned(out, out_dir, key_col="doc_id",
                             num_partitions=num_partitions,
                             resume=resume)


def _auto_partitions() -> int:
    """Join partition count sized to the cluster.

    This DAG runs ~3 hash-shuffle joins CONCURRENTLY (the two
    LSH-verify joins and the anti-join; the exact stage is join-free
    since the drop-set rewrite); Ray 2.49 reserves
    ``min(1, cpus/2/num_partitions)`` CPU per aggregator actor per
    join, so a fixed partition count deadlocks when the concurrent
    joins' aggregator pools exceed the cluster (observed: np=8 hangs
    at num_cpus=4). cpus/4 keeps the four pools within the ~cpus/2
    shuffle budget on any cluster size — and scales partitions UP with
    the cluster, which is what a 100 TB run needs anyway."""
    import ray
    cpus = int(ray.cluster_resources().get("CPU", 8)) if \
        ray.is_initialized() else 8
    return max(2, cpus // 4)


def curate_tiered(ds, weights, *, id_col: str = "doc_id",
                  text_col: str = "text",
                  quantum_micros: int = 10_000,
                  keep_tiers: tuple[str, ...] = ("head", "middle")):
    """FineWeb-style TIERED curation: a document ships to training
    iff it is (a) the lowest-id copy of its exact text, (b) scored
    keep by the hashed linear quality classifier, and (c) in the
    CCNet head/middle perplexity tiers — the modern quality-stack
    composition (dedup → model filter → LM tier) as ONE lazy DAG.

    Shuffle inventory — ZERO joins: the three gates each reduce to
    id-keyed integer rows (drop flags, keep flags + scores, tier
    codes) that UNION into ONE groupby(id) Sum; each id carries at
    most 3 tiny rows regardless of corpus size, and the payloadless
    fold replaces the anti-join+two-join shape ``curate_documents``
    needs when payloads must survive. Downstream re-reads payloads by
    id from the source (resumable sink pattern) — this operator
    answers WHICH docs and WHY (tier, score).

    Returns ``(doc_id, tier, score)`` for surviving docs.
    """
    from ray.data.aggregate import Sum

    from ..functions.curation import (ccnet_ppl_buckets,
                                      hashed_linear_score)

    tier_code = {"head": 1, "middle": 2, "tail": 3}
    keep_codes = {tier_code[t] for t in keep_tiers}

    scored = hashed_linear_score(ds, weights, text_col=text_col,
                                 id_col=id_col)

    def tag_scores(batch: pa.Table) -> pa.Table:
        import numpy as np
        keep = pc.equal(batch.column("label"), "keep")
        n = batch.num_rows
        return pa.table({
            id_col: batch.column(id_col),
            "keep": keep.cast(pa.int64()),
            "score": batch.column("score"),
            "tier": pa.array(np.zeros(n, np.int64)),
            "drop": pa.array(np.zeros(n, np.int64)),
        })

    tiers = ccnet_ppl_buckets(ds, text_col=text_col, id_col=id_col,
                              quantum_micros=quantum_micros)

    def tag_tiers(batch: pa.Table) -> pa.Table:
        import numpy as np
        b = batch.column("bucket").to_numpy(zero_copy_only=False)
        n = batch.num_rows
        code = np.array([tier_code.get(x, 3) for x in b], np.int64)
        return pa.table({
            id_col: batch.column(id_col),
            "keep": pa.array(np.zeros(n, np.int64)),
            "score": pa.array(np.zeros(n, np.int64)),
            "tier": pa.array(code),
            "drop": pa.array(np.zeros(n, np.int64)),
        })

    dropped = exact_drop_ids(ds, text_col=text_col, key_col=id_col)

    def tag_drops(batch: pa.Table) -> pa.Table:
        import numpy as np
        n = batch.num_rows
        return pa.table({
            id_col: batch.column(id_col).cast(pa.int64()),
            "keep": pa.array(np.zeros(n, np.int64)),
            "score": pa.array(np.zeros(n, np.int64)),
            "tier": pa.array(np.zeros(n, np.int64)),
            "drop": pa.array(np.ones(n, np.int64)),
        })

    folded = (scored.map_batches(tag_scores, batch_format="pyarrow")
              .union(tiers.map_batches(tag_tiers,
                                       batch_format="pyarrow"))
              .union(dropped.map_batches(tag_drops,
                                         batch_format="pyarrow"))
              .groupby(id_col)
              .aggregate(Sum("keep", alias_name="keep"),
                         Sum("score", alias_name="score"),
                         Sum("tier", alias_name="tier"),
                         Sum("drop", alias_name="drop")))

    inv = {v: k for k, v in tier_code.items()}

    def finish(batch: pa.Table) -> pa.Table:
        import numpy as np
        keep = batch.column("keep").to_numpy(zero_copy_only=False)
        tier = batch.column("tier").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        drop = batch.column("drop").to_numpy(zero_copy_only=False)
        mask = ((drop == 0) & (keep == 1)
                & np.isin(tier, list(keep_codes)))
        ids = batch.column(id_col).to_numpy(zero_copy_only=False) \
            .astype(np.int64)[mask]
        return pa.table({
            id_col: pa.array(ids, pa.int64()),
            "tier": pa.array([inv[t] for t in tier[mask]],
                             pa.string()),
            "score": pa.array(
                batch.column("score").to_numpy(
                    zero_copy_only=False)[mask].astype("int64"),
                pa.int64()),
        })

    return folded.map_batches(finish, batch_format="pyarrow")


def curate_documents(ds, *, id_col: str = "doc_id",
                     text_col: str = "text", lang_col: str = "lang",
                     langs: tuple[str, ...] = ("en",),
                     min_tokens: int = 20, max_tokens: int = 90,
                     near_threshold: float = 0.5, shingle_size: int = 5,
                     num_hashes: int = 128, num_bands: int = 32,
                     num_partitions: int | None = None):
    """Curate a documents Dataset for training: returns the surviving
    rows as ``(doc_id, lang, token_count)``.

    A row survives iff it is (a) the lowest-id copy of its exact text,
    (b) not a verified (Jaccard ≥ ``near_threshold``) near-duplicate
    of any lower-id document, (c) in ``langs``, and (d) within the
    whitespace-token bounds. Value-checked end-to-end by the driver's
    ``curate`` oracle (the same composition in SQL).
    """
    if num_partitions is None:
        num_partitions = _auto_partitions()
    # DROP-SET formulation (round-4 session 8): exact dedup as a
    # join-free loser list (functions/dedup.exact_drop_ids — one
    # bounded (md5, id) shuffle) unioned with the near-dup drop set,
    # so the document payloads ride exactly ONE join (the anti-join
    # below) instead of two (the old keeper join + anti-join). Same
    # survivor set: a row survives iff it is in neither drop set.
    exact_dropped = exact_drop_ids(ds, text_col=text_col,
                                   key_col=id_col,
                                   num_partitions=num_partitions)
    near_dropped = minhash_lsh_dedup(
        ds, num_hashes=num_hashes, num_bands=num_bands,
        shingle_size=shingle_size, text_col=text_col, id_col=id_col,
        threshold=near_threshold, num_partitions=num_partitions)
    drops = exact_dropped.select_columns([id_col]).union(
        near_dropped.map_batches(
            lambda b: pa.table({id_col: b.column(0).cast(pa.int64())}),
            batch_format="pyarrow"))
    survivors = _anti_join(ds, drops, id_col,
                           num_partitions=num_partitions)

    lang_set = set(langs)

    def finish(batch: pa.Table) -> pa.Table:
        text = batch.column(text_col)
        # whitespace token count == spaces + 1 on non-empty text
        # (mirrors functions/textstats.token_count_batch and its oracle)
        n_spaces = pc.count_substring(text, " ")
        nonempty = pc.and_(pc.is_valid(text),
                           pc.not_equal(text, ""))
        tokens = pc.if_else(nonempty, pc.add(n_spaces, 1),
                            pa.scalar(0, pa.int32())).cast(pa.int64())
        lang = batch.column(lang_col)
        mask = pc.and_(
            pc.and_(pc.is_in(lang, value_set=pa.array(sorted(lang_set))),
                    pc.greater_equal(tokens, min_tokens)),
            pc.less_equal(tokens, max_tokens))
        out = pa.table({
            id_col: batch.column(id_col).cast(pa.int64()),
            lang_col: lang,
            "token_count": tokens,
        })
        return out.filter(mask)

    return survivors.map_batches(finish, batch_format="pyarrow")
