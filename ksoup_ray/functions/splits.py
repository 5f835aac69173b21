"""Deterministic dataset splitting and hash-based resampling — the
operators that turn a curated corpus into train/val/test shards and
importance-resampled mixtures.

Scale shapes:
* ``assign_splits``: pure per-batch — the split is a function of the
  row's own id (md5 bucket), so ANY re-run, re-partitioning, or
  partial resume assigns the same row to the same split. No shuffle,
  no driver state, no RNG to coordinate across nodes.
* ``resample_by_weight``: deterministic Bernoulli thinning — keep a
  row iff its md5 bucket fraction falls below its (per-row) keep
  probability. Same hash ⇒ reproducible across retries; no
  coordination. This is how DSIR-style importance resampling is
  applied at scale (Xie et al. 2023): weights stream in as a column,
  the decision is local.

md5 was chosen over a faster hash because the DuckDB oracle can
recompute it exactly (``md5(CAST(id AS VARCHAR))``), making the split
assignment value-checkable end to end. The per-row hashlib call is a
C-backed loop over small strings — measured ~1.5 µs/row, noise next
to any downstream transform.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

from ._blocks import from_pandas_clean as _from_pandas_clean


def _md5_bucket_fraction(ids) -> np.ndarray:
    """fraction in [0, 1): first 8 md5 hex digits of str(id) / 2^32 —
    mirrors DuckDB ``CAST('0x' || substr(md5(CAST(id AS VARCHAR)),
    1, 8) AS BIGINT) / 4294967296.0``."""
    return np.array(
        [int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16)
         for i in ids],
        dtype=np.float64) / 4294967296.0


def _split_of(ids, train_frac: float, val_frac: float):
    """Shared ids -> (frac, split-label) rule for ``assign_splits``
    and ``split_leakage`` — ONE implementation so the leakage audit
    can never drift from the assignment it audits (both oracles
    replay this exact rule)."""
    frac = _md5_bucket_fraction(ids)
    t_hi = float(train_frac)
    v_hi = float(train_frac) + float(val_frac)
    split = np.where(frac < t_hi, "train",
                     np.where(frac < v_hi, "val", "test"))
    return frac, split


def assign_splits(ds, *, id_col: str = "doc_id",
                  train_frac: float = 0.8, val_frac: float = 0.1):
    """Assign every row a stable ``split`` ∈ {train, val, test} from
    the md5-bucket fraction of its id: [0, train) → train,
    [train, train+val) → val, rest → test. Returns a Dataset of
    (id_col, bucket_pct, split) — bucket_pct is the integer percent
    bucket (floor(frac*100)) so the assignment itself is auditable."""
    def assign(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_pylist()
        frac, split = _split_of(ids, train_frac, val_frac)
        return pa.table({
            id_col: batch.column(id_col),
            "bucket_pct": pa.array((frac * 100).astype(np.int64),
                                   pa.int64()),
            "split": pa.array(split.tolist(), pa.string()),
        })

    return ds.map_batches(assign, batch_format="pyarrow")


def split_leakage(ds, *, id_col: str = "doc_id",
                  host_col: str = "host",
                  train_frac: float = 0.8, val_frac: float = 0.1):
    """Cross-split leakage audit: the hosts (or any grouping entity —
    site, author, near-dup cluster) whose documents land in MORE THAN
    ONE of the md5-assigned train/val/test splits. Doc-level splits
    leak host-level signal (a model can memorize a site's style from
    train and look artificially good on its val pages — the reason
    CC-derived corpora split by host, not by page); this operator is
    the audit that QUANTIFIES that leakage before anyone trains.

    Scale shape: split assignment is the pure per-batch md5 rule of
    :func:`assign_splits` (no coordination); each batch pre-combines
    to DISTINCT ``(host, split, partial_docs)`` rows, ONE
    groupby(host, split) folds the partials (hosts-scale rows, never
    doc-scale), then a second bounded combine per host counts its
    distinct splits. Output: ``(host, n_splits, n_docs)`` for every
    host present in >1 split — empty means the split is host-clean.
    """
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        import pandas as pd
        ids = batch.column(id_col).to_pylist()
        _, split = _split_of(ids, train_frac, val_frac)
        df = pd.DataFrame({
            "host": batch.column(host_col).to_numpy(
                zero_copy_only=False),
            "split": split})
        g = df.groupby(["host", "split"], sort=False).size() \
            .reset_index(name="partial_docs")
        return pa.table({
            "host": pa.array(g["host"].to_numpy(object), pa.string()),
            "split": pa.array(g["split"].to_numpy(object),
                              pa.string()),
            "partial_docs": pa.array(
                g["partial_docs"].to_numpy(np.int64), pa.int64()),
        })

    per_split = (ds.select_columns([id_col, host_col])
                 .map_batches(partial, batch_format="pyarrow")
                 .groupby(["host", "split"])
                 .aggregate(Sum("partial_docs", alias_name="docs")))

    def host_partial(batch: pa.Table) -> pa.Table:
        # each (host, split) row is globally unique after the fold,
        # so counting rows per host == counting distinct splits
        import pandas as pd
        df = batch.select(["host", "docs"]).to_pandas()
        g = df.groupby("host", sort=False).agg(
            n_splits=("docs", "size"), n_docs=("docs", "sum"))
        g = g.reset_index()
        return pa.table({
            "host": pa.array(g["host"].to_numpy(object), pa.string()),
            "p_splits": pa.array(g["n_splits"].to_numpy(np.int64),
                                 pa.int64()),
            "p_docs": pa.array(g["n_docs"].to_numpy(np.int64),
                               pa.int64()),
        })

    folded = (per_split.map_batches(host_partial,
                                    batch_format="pyarrow")
              .groupby("host")
              .aggregate(Sum("p_splits", alias_name="n_splits"),
                         Sum("p_docs", alias_name="n_docs")))

    def leaky(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        return batch.filter(pc.greater(batch.column("n_splits"), 1))

    return folded.map_batches(leaky, batch_format="pyarrow")


def resample_by_weight(ds, *, id_col: str = "doc_id",
                       weight_col: str = "keep_micros"):
    """Deterministic weighted thinning: keep a row iff
    ``md5_fraction(id) * 1e6 < weight_micros`` (keep probability in
    integer micros, 1e6 = always keep). The comparison is integer-vs-
    integer on the oracle side (floor(frac*1e6) < w), so we floor the
    scaled fraction here too. Returns the kept rows of ``ds``."""
    def keep(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_pylist()
        frac = _md5_bucket_fraction(ids)
        thresh = np.floor(frac * 1_000_000.0).astype(np.int64)
        w = np.asarray(batch.column(weight_col).to_pylist(),
                       dtype=np.int64)
        return batch.filter(pa.array(thresh < w))

    return ds.map_batches(keep, batch_format="pyarrow")


def topk_hash_sample(ds, *, key_col: str = "lang",
                     id_col: str = "doc_id", k: int = 5):
    """EXACT-size deterministic per-group sample: the k rows with the
    SMALLEST md5-bucket hex per group — a uniform without-replacement
    sample whose membership is a pure function of the ids (stable
    under re-runs, resumes and repartitioning; fraction-based
    sampling can't promise an exact k). Two lossless stages: each
    block prunes to its local per-group top-k (anything deeper can
    never reach the global top-k), then one groupby over the BOUNDED
    group key merges the survivors. Returns (key, id, rank) with
    rank 1..k ordered by (md5hex, id) — matching the SQL row_number
    rule exactly."""
    import pandas as pd

    def local_topk(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_pylist()
        hx = [hashlib.md5(str(i).encode()).hexdigest() for i in ids]
        df = batch.select([key_col, id_col]).to_pandas()
        df["hx"] = hx
        df = df.sort_values(["hx", id_col]).groupby(
            key_col, sort=False).head(k)
        return _from_pandas_clean(df, preserve_index=False)

    def merge_topk(group: "pd.DataFrame") -> "pd.DataFrame":
        g = group.sort_values(["hx", id_col]).head(k).copy()
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
        return g[[key_col, id_col, "rank"]]

    return (ds.select_columns([key_col, id_col])
            .map_batches(local_topk, batch_format="pyarrow")
            .groupby(key_col)
            .map_groups(merge_topk, batch_format="pandas"))


def weighted_topk_sample(ds, *, id_col: str = "doc_id",
                         weight_col: str = "weight", k: int = 100,
                         max_weight: int = 64):
    """EXACT-size deterministic WEIGHTED sample without replacement —
    the data-mixing primitive (upweight high-quality sources, sample
    k docs ∝ weight) done so the draw is a pure function of the ids.

    Semantics: exponential-race sampling discretized onto hashes —
    each row holds ``weight`` (integer, ≥1) independent race clocks
    ``md5(f"{id}:{j}")`` for ``j < weight`` and its key is the
    MINIMUM; the global k smallest keys win. Pairwise,
    P(min of w uniforms < min of v uniforms) = w/(w+v), the
    Efraimidis–Spirakis weighted-sampling race with the float
    ``u^(1/w)`` key replaced by a discrete clock a SQL oracle can
    recompute verbatim (``min(md5(id || ':' || j))`` over
    ``range(weight)``) — no libm ``ln``/``pow`` whose last-ulp
    differences between numpy and DuckDB could flip an ordering.

    Scale shape: the per-row key costs ``weight`` C-backed md5 calls
    (``max_weight`` caps it; raise deliberately), each block prunes
    to its local k smallest (lossless — a key deeper than block-local
    rank k can never reach the global top-k), and only those ≤
    k-per-block survivors ride the single bounded merge. Returns
    (id, weight, race_key, rank) with rank 1..k by (race_key, id)."""
    import pandas as pd

    def local_topk(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_pylist()
        ws = batch.column(weight_col).to_pylist()
        keys = []
        for i, w in zip(ids, ws):
            w = int(w)
            if w < 1 or w > max_weight:
                raise ValueError(
                    f"weight {w} outside [1, {max_weight}] for id "
                    f"{i}; raise max_weight deliberately")
            keys.append(min(
                hashlib.md5(f"{i}:{j}".encode()).hexdigest()
                for j in range(w)))
        df = pd.DataFrame({id_col: ids, "weight": ws,
                           "race_key": keys})
        df["weight"] = df["weight"].astype(np.int64)
        df = df.sort_values(["race_key", id_col]).head(k)
        return _from_pandas_clean(df, preserve_index=False)

    def merge_topk(group: "pd.DataFrame") -> "pd.DataFrame":
        g = group.sort_values(["race_key", id_col]).head(k).copy()
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
        return g[[id_col, "weight", "race_key", "rank"]]

    def tag(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "_one", pa.array(np.zeros(batch.num_rows, np.int8)))

    return (ds.map_batches(local_topk, batch_format="pyarrow")
            .map_batches(tag, batch_format="pyarrow")
            .groupby("_one")
            .map_groups(merge_topk, batch_format="pandas"))


def epoch_shuffle(ds, *, id_col: str = "doc_id", epoch: int = 0,
                  n_shards: int = 16):
    """Deterministic TRAINING-EPOCH shuffle into shards — the step
    between a curated corpus and a dataloader: every epoch must see
    the data in a different but REPRODUCIBLE order, sharded so each
    worker streams its own files.

    Key = ``md5(f"{epoch}:{id}")``: changing ``epoch`` permutes the
    whole corpus, same epoch always replays identically (resume-safe,
    no RNG state to checkpoint). Shard = first 4 key hex digits mod
    ``n_shards`` (hash-partitioning — shards are uniform to ~1/256
    without needing a global rank), position-in-shard = rank by
    (key, id) within the shard.

    Scale shape: one hash-partition shuffle on the BOUNDED shard key;
    within-shard ordering happens per shard group (``n_shards``
    groups, each a single sorted block write in a real pipeline —
    the per-group dispatch is bounded by construction). Returns
    (id, shard, pos) — join back to payloads by id at write time so
    only ids ride the shuffle."""
    import pandas as pd

    def key_rows(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_pylist()
        keys = [hashlib.md5(f"{epoch}:{i}".encode()).hexdigest()
                for i in ids]
        shard = np.array([int(k[:4], 16) for k in keys],
                         np.int64) % n_shards
        return pa.table({
            id_col: batch.column(id_col),
            "shard": pa.array(shard, pa.int64()),
            "_key": pa.array(keys, pa.string())})

    def order_shard(group: "pd.DataFrame") -> "pd.DataFrame":
        g = group.sort_values(["_key", id_col]).copy()
        g["pos"] = np.arange(1, len(g) + 1, dtype=np.int64)
        return g[[id_col, "shard", "pos"]]

    return (ds.select_columns([id_col])
            .map_batches(key_rows, batch_format="pyarrow")
            .groupby("shard")
            .map_groups(order_shard, batch_format="pandas"))
