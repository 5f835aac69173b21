"""Temporal joins Ray Data lacks natively, composed from one shuffle +
vectorized per-group kernels.

* ``asof_join``: for each left event, the latest right event with
  ``right.ts <= left.ts`` on the same key (DuckDB ``ASOF JOIN``
  semantics, ties included). Both sides union into ONE dataset with a
  side tag, shuffle ONCE on the key (``groupby(key).map_groups``), and
  each group resolves matches with a numpy ``searchsorted`` — no
  per-event Python, no second shuffle, no broadcast of either side.
  Skew is bounded by per-key event counts, not corpus size.

Partitioning assumption (documented per the brief's custom-operator
rule): all events of one key fit in one group — the same assumption
``sessionize`` makes; keys here are users/sessions whose per-key
volume is bounded by human activity, not corpus growth.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def asof_join(left, right, *, key_col: str = "user_id",
              ts_col: str = "ts", left_id: str = "event_id",
              right_id: str = "event_id", right_val: str = "value",
              no_match_id: int = -1, no_match_val: float = 0.0):
    """As-of join: per left row, the latest right row at or before its
    timestamp for the same key.

    Returns ``(left_id AS left_row_id, key_col, ts_us, matched_id,
    matched_val)`` with ``no_match_*`` sentinels instead of nulls (so
    the schema is null-free and oracle-stable). Duplicate right
    timestamps per key resolve to the row LAST in (ts, right_id)
    order — deterministic; the input convention is unique (key, ts)
    on the right, which the driver corpus satisfies."""

    def tag(side: int):
        id_col = left_id if side == 0 else right_id
        val_col = None if side == 0 else right_val

        def fn(batch: pa.Table) -> pa.Table:
            n = batch.num_rows
            val = (batch.column(val_col).cast(pa.float64())
                   if val_col else
                   pa.array(np.full(n, no_match_val), pa.float64()))
            return pa.table({
                key_col: batch.column(key_col).cast(pa.int64()),
                "_ts": batch.column(ts_col),
                "_id": batch.column(id_col).cast(pa.int64()),
                "_side": pa.array(np.full(n, side, np.int8)),
                "_val": val,
            })
        return fn

    both = left.map_batches(tag(0), batch_format="pyarrow").union(
        right.map_batches(tag(1), batch_format="pyarrow"))

    def resolve(group: pd.DataFrame) -> pd.DataFrame:
        side = group["_side"].to_numpy()
        ts = group["_ts"].to_numpy(dtype="datetime64[us]")
        ids = group["_id"].to_numpy(dtype=np.int64)
        vals = group["_val"].to_numpy(dtype=np.float64)
        lmask = side == 0
        lts, lids = ts[lmask], ids[lmask]
        rts, rids, rvals = ts[~lmask], ids[~lmask], vals[~lmask]
        # sort right by (ts, id) so equal timestamps resolve to the
        # larger id — the documented deterministic tie rule
        order = np.lexsort((rids, rts))
        rts, rids, rvals = rts[order], rids[order], rvals[order]
        if len(rts):
            idx = np.searchsorted(rts, lts, side="right") - 1
            hit = idx >= 0
            m_id = np.where(hit, rids[np.maximum(idx, 0)], no_match_id)
            m_val = np.where(hit, rvals[np.maximum(idx, 0)],
                             no_match_val)
        else:   # key has no right rows at all — all sentinels
            m_id = np.full(len(lts), no_match_id, np.int64)
            m_val = np.full(len(lts), no_match_val, np.float64)
        return pd.DataFrame({
            "left_row_id": lids,
            key_col: np.full(len(lids), group[key_col].iloc[0],
                             np.int64),
            "ts_us": lts.astype("datetime64[us]").astype(np.int64),
            "matched_id": m_id.astype(np.int64),
            "matched_val": m_val.astype(np.float64),
        })

    return both.groupby(key_col).map_groups(resolve,
                                            batch_format="pandas")


def interval_join(left, intervals, *, key_col: str = "user_id",
                  ts_col: str = "ts", left_id: str = "event_id",
                  start_col: str = "session_start",
                  end_col: str = "session_end",
                  no_match: int = -1):
    """Interval (range) join: each left row matched to the interval —
    same key, non-overlapping per key — with ``start <= ts <= end``.

    Same shape as ``asof_join``: tagged union, ONE shuffle on the key,
    per-group ``searchsorted`` on interval starts followed by an
    end-bound check. Returns ``(left_row_id, key_col, ts_us,
    interval_start_us, interval_end_us)`` with ``no_match`` sentinels.
    Overlapping intervals resolve to the latest-starting one."""

    def tag_left(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        ts = batch.column(ts_col).cast(pa.timestamp("us")) \
            .cast(pa.int64())
        return pa.table({
            key_col: batch.column(key_col).cast(pa.int64()),
            "_ts": ts,
            "_end": pa.array(np.zeros(n, np.int64)),
            "_id": batch.column(left_id).cast(pa.int64()),
            "_side": pa.array(np.zeros(n, np.int8)),
        })

    def tag_intervals(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        return pa.table({
            key_col: batch.column(key_col).cast(pa.int64()),
            "_ts": batch.column(start_col).cast(pa.timestamp("us"))
                   .cast(pa.int64()),
            "_end": batch.column(end_col).cast(pa.timestamp("us"))
                    .cast(pa.int64()),
            "_id": pa.array(np.zeros(n, np.int64)),
            "_side": pa.array(np.ones(n, np.int8)),
        })

    both = left.map_batches(tag_left, batch_format="pyarrow").union(
        intervals.map_batches(tag_intervals, batch_format="pyarrow"))

    def resolve(group: pd.DataFrame) -> pd.DataFrame:
        side = group["_side"].to_numpy()
        ts = group["_ts"].to_numpy(dtype=np.int64)
        lmask = side == 0
        lts = ts[lmask]
        lids = group["_id"].to_numpy(dtype=np.int64)[lmask]
        starts = ts[~lmask]
        ends = group["_end"].to_numpy(dtype=np.int64)[~lmask]
        order = np.argsort(starts, kind="stable")
        starts, ends = starts[order], ends[order]
        if len(starts):
            idx = np.searchsorted(starts, lts, side="right") - 1
            safe = np.maximum(idx, 0)
            hit = (idx >= 0) & (lts <= ends[safe])
            m_start = np.where(hit, starts[safe], no_match)
            m_end = np.where(hit, ends[safe], no_match)
        else:
            m_start = np.full(len(lts), no_match, np.int64)
            m_end = np.full(len(lts), no_match, np.int64)
        return pd.DataFrame({
            "left_row_id": lids,
            key_col: np.full(len(lids), group[key_col].iloc[0],
                             np.int64),
            "ts_us": lts,
            "interval_start_us": m_start.astype(np.int64),
            "interval_end_us": m_end.astype(np.int64),
        })

    return both.groupby(key_col).map_groups(resolve,
                                            batch_format="pandas")
