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
import pyarrow.compute as pc


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


def heavy_hitters(ds, col: str, *, phi: float = 0.001,
                  text_split: bool = False):
    """EXACT frequency heavy hitters: every value (or word, with
    ``text_split=True``) whose corpus frequency is >= ``phi`` of the
    total count — via the Misra-Gries two-pass construction that
    makes exact answers scale:

    pass 1 (candidates): each batch keeps a Misra-Gries summary of
    ~1/phi counters — the superset guarantee: any value with GLOBAL
    frequency >= phi*N survives SOME batch summary (MG loses at most
    phi*batch mass per batch, so a globally heavy value cannot be
    cancelled in every batch). The driver unions candidate sets
    (bounded by batches x 1/phi rows — corpus-independent).
    pass 2 (verify): exact counts for the candidate set only — one
    vectorized ``is_in`` + value_counts per batch, integer partials
    folded on the driver (|candidates| ints); the grand total comes
    from a native Dataset.sum over per-batch sizes (immune to
    iter_batches re-blocking). The final ``count >= ceil(phi*N)``
    filter yields results IDENTICAL to a full groupby — but nothing
    vocabulary-scale ever shuffles or lands anywhere.

    Returns a pandas DataFrame ``(value, n)`` sorted by
    (n desc, value)."""
    k = max(int(np.ceil(1.0 / phi)), 1)

    def to_values(batch: pa.Table) -> np.ndarray:
        s = batch.column(col).to_pandas().fillna("")
        if text_split:
            s = s.str.split(" ").explode()
        return s.to_numpy(dtype=object)

    def mg_partial(batch: pa.Table) -> pa.Table:
        vals = to_values(batch)
        vc = pd.Series(vals).value_counts()
        # batch Misra-Gries in one shot: keep the top-k counters and
        # drop any tied with the (k+1)-th — survivors are exactly the
        # values that could carry >= phi of this batch's mass
        if len(vc) > k:
            cut = vc.iloc[k]
            vc = vc.iloc[:k]
            vc = vc[vc > cut]
        return pa.table({
            "value": pa.array(vc.index.to_numpy(dtype=object),
                              pa.string()),
        })

    cands: set = set()
    for t in ds.map_batches(mg_partial, batch_format="pyarrow") \
            .iter_batches(batch_format="pyarrow"):
        cands.update(t.column("value").to_pylist())
    cand_arr = pa.array(sorted(cands), pa.string())

    def exact_partial(batch: pa.Table) -> pa.Table:
        vals = to_values(batch)
        arr = pa.array(vals, pa.string())
        mask = pc.is_in(arr, value_set=cand_arr)
        hits = pd.Series(arr.filter(mask).to_pylist()).value_counts()
        return pa.table({
            "value": pa.array(hits.index.to_numpy(dtype=object),
                              pa.string()),
            "n": pa.array(hits.to_numpy(), pa.int64()),
        })

    counts: dict = {}
    for t in ds.map_batches(exact_partial, batch_format="pyarrow") \
            .iter_batches(batch_format="pyarrow"):
        for v, n in zip(t.column("value").to_pylist(),
                        t.column("n").to_pylist()):
            counts[v] = counts.get(v, 0) + n

    grand_total = int(ds.map_batches(
        lambda b: pa.table({"t": pa.array([len(to_values(b))],
                                          pa.int64())}),
        batch_format="pyarrow").sum("t"))
    thresh = int(np.ceil(phi * grand_total))
    out = [(v, n) for v, n in counts.items() if n >= thresh]
    out.sort(key=lambda kv: (-kv[1], kv[0]))
    return pd.DataFrame(out, columns=["value", "n"])


def _cms_buckets(word: str, depth: int, width: int) -> np.ndarray:
    """The CMS register column for ``word`` in each of the ``depth``
    rows: ``md5(f"{row}:{word}") % width``. SINGLE source of truth —
    used by the worker-side partials AND the driver estimate loop, so
    the two can never drift apart (the DuckDB oracle replays this
    exact formula bit-for-bit)."""
    import hashlib
    return np.array(
        [int(hashlib.md5(f"{r}:{word}".encode())
             .hexdigest()[:8], 16) % width
         for r in range(depth)], np.int64)


def cms_point_estimates(ds, query_words, *, depth: int = 4,
                        width: int = 1024, text_col: str = "text",
                        concurrency=(1, 4)):
    """Count-Min sketch (Cormode & Muthukrishnan 2005) point
    frequency estimates — the mergeable counter a 100 TB pipeline
    uses when exact per-token counts would shuffle the vocabulary:
    registers are a fixed depth x width grid, error is additive
    (<= e/width x total tokens with prob 1-e^-depth), and partial
    sketches from any data split SUM into the corpus sketch.

    Scale shape: each batch collapses to its nonzero register
    PARTIALS (<= depth x width rows however many tokens it saw);
    ONE bounded groupby(r, c) Sum folds them; the driver reads the
    BOUNDED grid (depth x width rows) and answers the fixed query
    set with a numpy min-over-rows — the corpus vocabulary never
    shuffles and never reaches the driver. Hashes are
    ``md5(f"{row}:{word}")`` so the DuckDB oracle replays every
    register and estimate bit-for-bit. Estimates OVERCOUNT only
    (classic CMS guarantee) — pytest pins est >= truth. Returns a
    pandas DataFrame ``(word, est_count)``.
    """
    from ray.data.aggregate import Sum

    words = [str(w) for w in query_words]

    class Partials:
        def __init__(self):
            self.cache: dict[str, np.ndarray] = {}

        def _buckets(self, w: str) -> np.ndarray:
            b = self.cache.get(w)
            if b is None:
                b = _cms_buckets(w, depth, width)
                self.cache[w] = b
            return b

        def __call__(self, batch: pa.Table) -> pa.Table:
            s = batch.column(text_col).to_pandas().fillna("")
            ex = s.str.split(" ").explode()
            w = ex.to_numpy(dtype=object)
            w = w[pd.notna(w) & (w != "")]
            reg = np.zeros((depth, width), np.int64)
            if len(w):
                uniq, cnt = np.unique(w, return_counts=True)
                bk = np.stack([self._buckets(u) for u in uniq])
                for r in range(depth):
                    np.add.at(reg[r], bk[:, r], cnt)
            rr, cc = np.nonzero(reg)
            return pa.table({
                "r": pa.array(rr.astype(np.int64), pa.int64()),
                "c": pa.array(cc.astype(np.int64), pa.int64()),
                "partial": pa.array(reg[rr, cc], pa.int64()),
            })

    folded = (ds.map_batches(Partials, batch_format="pyarrow",
                             concurrency=concurrency)
              .groupby(["r", "c"])
              .aggregate(Sum("partial", alias_name="n")))

    # the folded grid is BOUNDED (<= depth*width rows) — driver-safe
    reg = np.zeros((depth, width), np.int64)
    for t in folded.iter_batches(batch_format="pyarrow"):
        reg[t.column("r").to_numpy(zero_copy_only=False),
            t.column("c").to_numpy(zero_copy_only=False)] = \
            t.column("n").to_numpy(zero_copy_only=False)
    out = []
    for w in words:
        bk = _cms_buckets(w, depth, width)
        out.append((w, int(reg[np.arange(depth), bk].min())))
    df = pd.DataFrame(out, columns=["word", "est_count"])
    return df.astype({"est_count": np.int64})


def hll_registers_by_key(ds, *, key_col: str = "source",
                         val_col: str = "text", p: int = 8):
    """GROUPED HyperLogLog — per-key distinct-count registers (how
    many distinct pages/urls/texts per HOST, the per-entity
    cardinality question a 100 TB crawl asks constantly), folded in
    EXACT INTEGERS so a DuckDB oracle replays the sketch bit-for-bit
    (unlike :func:`hll_distinct`, whose SipHash has no SQL replay —
    md5 costs more per distinct value but buys the value-checked
    gate).

    Scale shape: each batch dedups its (key, val) pairs map-side and
    collapses to per-(key, register) rho partials — <= distinct-keys
    x 2^p tiny int rows per batch, INDEPENDENT of per-key
    cardinality; ONE native Max groupby folds them; a second bounded
    combine per key emits the integer register summary. Returns
    ``(key, m, n_present, denom_scaled)`` where ``denom_scaled =
    sum over registers of 2^(R_MAX - rho)`` (absent register ⇒
    2^R_MAX) — the harmonic denominator scaled by 2^R_MAX so the
    fold is order-free int64; the float HLL estimate is
    ``alpha_m * m^2 * 2^R_MAX / denom_scaled`` (pytest pins it within
    the 1.04/sqrt(m) band vs exact counts).
    """
    import hashlib

    from ray.data.aggregate import Max, Sum

    m = 1 << p
    rem_bits = 32 - p
    r_max = rem_bits + 1
    powers = (1 << np.arange(rem_bits + 1)).astype(np.int64)

    def partials(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "k": batch.column(key_col).to_pandas().fillna(""),
            "v": batch.column(val_col).to_pandas().fillna(""),
        }).drop_duplicates()
        if not len(df):
            return pa.table({key_col: pa.array([], pa.string()),
                             "j": pa.array([], pa.int64()),
                             "rho": pa.array([], pa.int64())})
        hv = np.array([int(hashlib.md5(v.encode()).hexdigest()[:8],
                           16) for v in df["v"]], np.int64)
        j = hv >> rem_bits
        rem = hv & ((1 << rem_bits) - 1)
        # exact bit_length via searchsorted on powers (float log2
        # misrounds near boundaries)
        bitlen = np.searchsorted(powers, rem, side="right")
        rho = rem_bits - bitlen + 1
        g = pd.DataFrame({"key": df["k"].to_numpy(object), "j": j,
                          "rho": rho}) \
            .groupby(["key", "j"], sort=False)["rho"].max() \
            .reset_index()
        return pa.table({
            key_col: pa.array(g["key"].to_numpy(object), pa.string()),
            "j": pa.array(g["j"].to_numpy(np.int64), pa.int64()),
            "rho": pa.array(g["rho"].to_numpy(np.int64), pa.int64()),
        })

    folded = (ds.select_columns([key_col, val_col])
              .map_batches(partials, batch_format="pyarrow")
              .groupby([key_col, "j"])
              .aggregate(Max("rho", alias_name="rho")))

    def key_partial(batch: pa.Table) -> pa.Table:
        df = batch.select([key_col, "rho"]).to_pandas()
        rho = df["rho"].to_numpy(np.int64)
        df["term"] = (np.int64(1) << (r_max - rho))
        g = df.groupby(key_col, sort=False).agg(
            n=("term", "size"), s=("term", "sum")).reset_index()
        return pa.table({
            key_col: pa.array(g[key_col].to_numpy(object),
                              pa.string()),
            "pn": pa.array(g["n"].to_numpy(np.int64), pa.int64()),
            "ps": pa.array(g["s"].to_numpy(np.int64), pa.int64()),
        })

    summed = (folded.map_batches(key_partial, batch_format="pyarrow")
              .groupby(key_col)
              .aggregate(Sum("pn", alias_name="n_present"),
                         Sum("ps", alias_name="present_sum")))

    def finish(batch: pa.Table) -> pa.Table:
        npres = batch.column("n_present") \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        psum = batch.column("present_sum") \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        denom = psum + (m - npres) * (np.int64(1) << r_max)
        return pa.table({
            key_col: batch.column(key_col),
            "m": pa.array(np.full(len(npres), m, np.int64),
                          pa.int64()),
            "n_present": pa.array(npres, pa.int64()),
            "denom_scaled": pa.array(denom, pa.int64()),
        })

    return summed.map_batches(finish, batch_format="pyarrow")
