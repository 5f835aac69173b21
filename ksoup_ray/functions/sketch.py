"""Cardinality sketches: exact distributed distinct count and a
HyperLogLog approximation (Flajolet et al. 2007) — the sketch a
100-TB pipeline actually uses for "how many distinct urls/hosts/
shingles" questions, where an exact count would shuffle every
distinct key.

Scale shapes:
* ``distinct_count``: per-batch DISTINCT partials (so each batch
  contributes each value once) → one groupby shuffle on the value →
  ``count()``. Exact, but the shuffle carries every distinct value —
  O(distinct) network.
* ``hll_distinct``: per-batch HLL register partials — each batch
  collapses to ≤ 2^p (register, max-rho) rows — folded by ONE native
  Max groupby over 2^p keys. Network cost is O(batches × 2^p) tiny
  rows, INDEPENDENT of cardinality; the driver folds 2^p rows into
  the scalar estimate. Standard error ≈ 1.04/√(2^p) (~1.6% at p=12).
  Hashes come from ``pandas.util.hash_array`` (SipHash, fixed key) —
  deterministic across workers and runs, so the estimate itself is
  reproducible bit-for-bit (pytest pins it against the exact count;
  no SQL oracle — DuckDB can't replay SipHash).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def distinct_count(ds, col: str):
    """EXACT distinct count of a column, returned as a one-row
    ``pyarrow.Table`` ``(n_distinct,)``."""

    def local_distinct(batch: pa.Table) -> pa.Table:
        vals = batch.column(col).unique()
        return pa.table({col: vals})

    n = (ds.map_batches(local_distinct, batch_format="pyarrow")
         .groupby(col).count().count())
    return pa.table({"n_distinct": pa.array([n], pa.int64())})


def _hll_partials(col_name: str, p: int):
    m = 1 << p

    def partial(batch: pa.Table) -> pa.Table:
        vals = batch.column(col_name).to_pandas().to_numpy(dtype=object)
        h = pd.util.hash_array(vals).astype(np.uint64)
        reg = (h >> np.uint64(64 - p)).astype(np.int64)
        rest = (h << np.uint64(p)) | np.uint64((1 << p) - 1)
        # rho = leading zeros of the remaining 64-p bits + 1; the OR
        # above caps it at 64-p+1 without a branch
        lz = np.zeros(len(rest), np.int64)
        cur = rest.copy()
        for shift in (32, 16, 8, 4, 2, 1):
            mask = cur < (np.uint64(1) << np.uint64(64 - shift))
            lz[mask] += shift
            cur[mask] = cur[mask] << np.uint64(shift)
        rho = lz + 1
        # per-batch register max (map-side combine to ≤ m rows)
        regs = np.zeros(m, np.int64)
        np.maximum.at(regs, reg, rho)
        nz = np.flatnonzero(regs)
        return pa.table({
            "register": pa.array(nz.astype(np.int64), pa.int64()),
            "rho": pa.array(regs[nz], pa.int64()),
        })

    return partial


def hll_distinct(ds, col: str, *, p: int = 12):
    """HyperLogLog distinct-count estimate, returned as a one-row
    ``pyarrow.Table`` ``(estimate, registers, p)``. Deterministic
    (fixed-key SipHash): same input → same estimate, any partitioning.
    """
    from ray.data.aggregate import Max

    m = 1 << p
    folded = (ds.map_batches(_hll_partials(col, p),
                             batch_format="pyarrow")
              .groupby("register")
              .aggregate(Max("rho", alias_name="rho"))
              .take_all())
    regs = np.zeros(m, np.int64)
    for r in folded:
        regs[r["register"]] = r["rho"]
    alpha = 0.7213 / (1.0 + 1.079 / m)
    est = alpha * m * m / np.sum(np.exp2(-regs.astype(np.float64)))
    zeros = int(np.count_nonzero(regs == 0))
    if est <= 2.5 * m and zeros:             # small-range correction
        est = m * np.log(m / zeros)
    return pa.table({
        "estimate": pa.array([float(est)], pa.float64()),
        "registers": pa.array([m], pa.int64()),
        "p": pa.array([p], pa.int64()),
    })
