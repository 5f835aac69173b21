"""Temporal joins Ray Data lacks natively, composed from one shuffle +
per-BLOCK vectorized kernels.

* ``asof_join``: for each left event, the latest right event with
  ``right.ts <= left.ts`` on the same key (DuckDB ``ASOF JOIN``
  semantics, ties included). Both sides union into ONE dataset with a
  side tag and a BOUNDED bucket key ``hash(key) % num_partitions``
  (functions/_blocks.py), shuffle ONCE on the bucket, and each bucket
  block resolves ALL of its keys in one vectorized merged scan:
  lexsort by (key, ts, right-before-left), take the running maximum of
  right-row indices (``np.maximum.accumulate``), and guard it against
  leaking across key segments with the per-row segment start. Python
  dispatches O(num_partitions) times total — never per key, never per
  event. No second shuffle, no broadcast of either side.

Partitioning assumption (documented per the brief's custom-operator
rule): a BUCKET (~corpus/num_partitions rows) fits a worker's heap —
size ``num_partitions`` to the corpus, not to the key cardinality.
Per-key volume no longer matters: a hot key costs O(its rows) inside
one linear pass.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ._blocks import start_of_segment


def asof_join(left, right, *, key_col: str = "user_id",
              ts_col: str = "ts", left_id: str = "event_id",
              right_id: str = "event_id", right_val: str = "value",
              no_match_id: int = -1, no_match_val: float = 0.0,
              num_partitions: int = 64):
    """As-of join: per left row, the latest right row at or before its
    timestamp for the same key.

    Returns ``(left_id AS left_row_id, key_col, ts_us, matched_id,
    matched_val)`` with ``no_match_*`` sentinels instead of nulls (so
    the schema is null-free and oracle-stable). Duplicate right
    timestamps per key resolve to the row LAST in (ts, right_id)
    order — deterministic; the input convention is unique (key, ts)
    on the right, which the driver corpus satisfies."""
    from ._blocks import bucket_of

    def tag(side: int):
        id_col = left_id if side == 0 else right_id
        val_col = None if side == 0 else right_val

        def fn(batch: pa.Table) -> pa.Table:
            n = batch.num_rows
            val = (batch.column(val_col).cast(pa.float64())
                   if val_col else
                   pa.array(np.full(n, no_match_val), pa.float64()))
            keys = batch.column(key_col).cast(pa.int64())
            return pa.table({
                key_col: keys,
                "_pk": pa.array(bucket_of(
                    keys.to_numpy(zero_copy_only=False),
                    num_partitions), pa.int32()),
                "_ts": batch.column(ts_col),
                "_id": batch.column(id_col).cast(pa.int64()),
                "_side": pa.array(np.full(n, side, np.int8)),
                "_val": val,
            })
        return fn

    both = left.map_batches(tag(0), batch_format="pyarrow").union(
        right.map_batches(tag(1), batch_format="pyarrow"))

    def resolve_block(block: pd.DataFrame) -> pd.DataFrame:
        key = block[key_col].to_numpy(dtype=np.int64)
        ts = block["_ts"].to_numpy(dtype="datetime64[us]") \
            .astype(np.int64)
        side = block["_side"].to_numpy(dtype=np.int8)
        ids = block["_id"].to_numpy(dtype=np.int64)
        vals = block["_val"].to_numpy(dtype=np.float64)
        # merged order: key, then ts, then RIGHT before LEFT at equal
        # ts (<= is inclusive), then right ids ascending so the running
        # max lands on the larger id — the documented tie rule
        order = np.lexsort((ids, 1 - side, ts, key))
        key, ts, side, ids, vals = (key[order], ts[order], side[order],
                                    ids[order], vals[order])
        n = len(key)
        pos = np.arange(n)
        ridx = np.where(side == 1, pos, -1)
        latest_right = np.maximum.accumulate(ridx)
        seg_start = start_of_segment(key)
        lmask = side == 0
        midx = latest_right[lmask]
        # a right row from a PREVIOUS key has index < this segment's
        # start, so the bound check is also the key-boundary guard
        hit = midx >= seg_start[lmask]
        safe = np.maximum(midx, 0)
        return pd.DataFrame({
            "left_row_id": ids[lmask],
            key_col: key[lmask],
            "ts_us": ts[lmask],
            "matched_id": np.where(hit, ids[safe],
                                   no_match_id).astype(np.int64),
            "matched_val": np.where(hit, vals[safe],
                                    no_match_val).astype(np.float64),
        })

    return both.groupby("_pk").map_groups(resolve_block,
                                          batch_format="pandas")


def interval_join(left, intervals, *, key_col: str = "user_id",
                  ts_col: str = "ts", left_id: str = "event_id",
                  start_col: str = "session_start",
                  end_col: str = "session_end",
                  no_match: int = -1, num_partitions: int = 64):
    """Interval (range) join: each left row matched to the interval —
    same key, non-overlapping per key — with ``start <= ts <= end``.

    Same shape as ``asof_join``: tagged union, ONE shuffle on the
    bounded bucket key, one merged running-max scan per bucket block
    (latest-starting interval at or before each event, then an
    end-bound check). Returns ``(left_row_id, key_col, ts_us,
    interval_start_us, interval_end_us)`` with ``no_match`` sentinels.
    Overlapping intervals resolve to the latest-starting one (ties on
    equal starts to the largest end — deterministic)."""
    from ._blocks import bucket_of

    def tag_left(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        ts = batch.column(ts_col).cast(pa.timestamp("us")) \
            .cast(pa.int64())
        keys = batch.column(key_col).cast(pa.int64())
        return pa.table({
            key_col: keys,
            "_pk": pa.array(bucket_of(
                keys.to_numpy(zero_copy_only=False), num_partitions),
                pa.int32()),
            "_ts": ts,
            "_end": pa.array(np.zeros(n, np.int64)),
            "_id": batch.column(left_id).cast(pa.int64()),
            "_side": pa.array(np.zeros(n, np.int8)),
        })

    def tag_intervals(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        keys = batch.column(key_col).cast(pa.int64())
        return pa.table({
            key_col: keys,
            "_pk": pa.array(bucket_of(
                keys.to_numpy(zero_copy_only=False), num_partitions),
                pa.int32()),
            "_ts": batch.column(start_col).cast(pa.timestamp("us"))
                   .cast(pa.int64()),
            "_end": batch.column(end_col).cast(pa.timestamp("us"))
                    .cast(pa.int64()),
            "_id": pa.array(np.zeros(n, np.int64)),
            "_side": pa.array(np.ones(n, np.int8)),
        })

    both = left.map_batches(tag_left, batch_format="pyarrow").union(
        intervals.map_batches(tag_intervals, batch_format="pyarrow"))

    def resolve_block(block: pd.DataFrame) -> pd.DataFrame:
        key = block[key_col].to_numpy(dtype=np.int64)
        ts = block["_ts"].to_numpy(dtype=np.int64)
        ends = block["_end"].to_numpy(dtype=np.int64)
        side = block["_side"].to_numpy(dtype=np.int8)
        ids = block["_id"].to_numpy(dtype=np.int64)
        # merged order: key, start/ts, INTERVAL before event at equal
        # ts (start <= ts inclusive), larger ends last (the tie rule)
        order = np.lexsort((ends, 1 - side, ts, key))
        key, ts, ends, side, ids = (key[order], ts[order], ends[order],
                                    side[order], ids[order])
        n = len(key)
        pos = np.arange(n)
        iidx = np.where(side == 1, pos, -1)
        latest_iv = np.maximum.accumulate(iidx)
        seg_start = start_of_segment(key)
        lmask = side == 0
        midx = latest_iv[lmask]
        safe = np.maximum(midx, 0)
        lts = ts[lmask]
        hit = (midx >= seg_start[lmask]) & (lts <= ends[safe])
        return pd.DataFrame({
            "left_row_id": ids[lmask],
            key_col: key[lmask],
            "ts_us": lts,
            "interval_start_us": np.where(hit, ts[safe],
                                          no_match).astype(np.int64),
            "interval_end_us": np.where(hit, ends[safe],
                                        no_match).astype(np.int64),
        })

    return both.groupby("_pk").map_groups(resolve_block,
                                          batch_format="pandas")


def broadcast_lookup(ds, mapping: dict, *, src_col: str,
                     out_col: str, default=None):
    """Map-side dimension enrichment: replace a shuffle join against a
    SMALL keyed table with one ``ray.put`` of the lookup dict and a
    vectorized gather inside every batch — the broadcast-join pattern
    the brief mandates for small sides (dimension tables like
    nation/region stay KBs at any corpus scale; a shuffle join would
    move the whole fact table instead). Integral keys gather through a
    dense numpy array; anything else through a pandas map. Unmatched
    keys get ``default``. Appends ``out_col`` to every row."""
    import ray

    map_ref = ray.put(dict(mapping))

    class Enrich:
        def __init__(self):
            m = ray.get(map_ref)
            keys = np.fromiter(m.keys(), count=len(m), dtype=np.int64) \
                if m and all(isinstance(k, (int, np.integer))
                             for k in m) else None
            # dense gather table only when the key space is actually
            # dense — sparse huge keys (e.g. 64-bit hashes) fall back
            # to the pandas map rather than allocating max(key) slots
            if keys is not None and keys.min() >= 0 \
                    and int(keys.max()) < max(1_000_000, 4 * len(m)):
                size = int(keys.max()) + 1
                table = np.full(size, default, dtype=object)
                table[keys] = list(m.values())
                self.table, self.map = table, None
            else:
                self.table, self.map = None, m

        def __call__(self, batch: pa.Table) -> pa.Table:
            if self.table is not None:
                idx = batch.column(src_col).cast(pa.int64()) \
                    .to_numpy(zero_copy_only=False)
                ok = (idx >= 0) & (idx < len(self.table))
                vals = np.full(len(idx), default, dtype=object)
                vals[ok] = self.table[idx[ok]]
            else:
                import pandas as pd
                vals = pd.Series(
                    batch.column(src_col).to_pandas()).map(self.map) \
                    .where(lambda s: s.notna(), default).to_numpy()
            return batch.append_column(out_col, pa.array(vals))

    return ds.map_batches(Enrich, batch_format="pyarrow",
                          concurrency=(1, 8))


def anti_join(left, right, *, left_on: str, right_on: str,
              num_partitions: int = 16):
    """Distributed ANTI join: rows of ``left`` whose ``left_on`` key
    never appears in ``right[right_on]``. Ray 2.49 has no native anti
    join, so: (1) the right side collapses to DISTINCT keys via a
    map-side-combined groupby (per-batch dedup first, so only unique
    keys per batch ride the shuffle), (2) one left-outer hash join
    against that key-only marker table, (3) a null filter drops the
    matches. Only (key, bool) crosses on the small side; left payloads
    shuffle once — the same shape as pipelines/curate._anti_join,
    exposed as a first-class operator with key-name mapping."""
    import pyarrow.compute as pc

    def distinct_keys(batch: pa.Table) -> pa.Table:
        keys = pc.unique(batch.column(right_on))
        return pa.table({"_aj_key": keys.cast(pa.int64()),
                         "_aj_hit": pa.array([True] * len(keys))})

    from ray.data.aggregate import Count
    marker = (right.select_columns([right_on])
              .map_batches(distinct_keys, batch_format="pyarrow")
              .groupby("_aj_key").aggregate(Count(alias_name="_aj_n"))
              .map_batches(lambda b: pa.table({
                  "_aj_key": b.column("_aj_key"),
                  "_aj_hit": pa.array([True] * b.num_rows)}),
                  batch_format="pyarrow"))
    from .dedup import strip_schema_metadata
    joined = strip_schema_metadata(left).join(
        marker, join_type="left_outer",
        num_partitions=num_partitions,
        on=(left_on,), right_on=("_aj_key",))
    return joined.map_batches(
        lambda b: b.filter(pc.is_null(b.column("_aj_hit")))
        .drop_columns([c for c in ("_aj_hit", "_aj_key")
                       if c in b.column_names]),
        batch_format="pyarrow")


def semi_join(left, right, *, left_on: str, right_on: str,
              num_partitions: int = 16):
    """Distributed SEMI join (SQL EXISTS): rows of ``left`` whose
    ``left_on`` key appears at least once in ``right[right_on]`` —
    each left row at most once, no right payload. Same shape as
    :func:`anti_join` (Ray 2.49 has no native semi join): the right
    side collapses to DISTINCT keys map-side (only unique keys per
    batch ride the shuffle), one inner hash join against the key-only
    marker keeps exactly the matching left rows, and the marker
    column is dropped. Left payloads shuffle once; the right side
    never ships values."""
    import pyarrow.compute as pc

    from ray.data.aggregate import Count

    def distinct_keys(batch: pa.Table) -> pa.Table:
        keys = pc.unique(batch.column(right_on))
        return pa.table({"_sj_key": keys.cast(pa.int64())})

    marker = (right.select_columns([right_on])
              .map_batches(distinct_keys, batch_format="pyarrow")
              .groupby("_sj_key").aggregate(Count(alias_name="_sj_n"))
              .map_batches(lambda b: b.select(["_sj_key"]),
                           batch_format="pyarrow")
              # coalesce schema-less empty aggregate blocks before the
              # hash join (same Ray 2.49 guard as dedup._join_ready)
              .repartition(4))
    from .dedup import strip_schema_metadata
    joined = strip_schema_metadata(left).join(
        marker, join_type="inner",
        num_partitions=num_partitions,
        on=(left_on,), right_on=("_sj_key",))
    return joined.map_batches(
        lambda b: b.drop_columns(
            [c for c in ("_sj_key",) if c in b.column_names]),
        batch_format="pyarrow")
