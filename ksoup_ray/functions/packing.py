"""Sequence packing for pretraining: concatenate the corpus's token
stream in doc_id order and cut it every ``capacity`` tokens (the
GPT-style pack-and-split). Each document maps to the bins its tokens
land in — ``(bin_id, doc_id, tokens_in_bin)`` rows, with documents
straddling a cut emitting one row per touched bin.

Distributed global ORDERED prefix sum in two passes (the classic
scan):
  pass A: per-batch map-side combine to (range_bucket, partial token
          sum) → one tiny groupby — the driver cumsums the
          per-bucket totals into exclusive base offsets (one scalar
          per bucket) and broadcasts them;
  pass B: co-partition docs by range bucket
          (``groupby(bucket).map_groups``), sort each bucket by
          doc_id, in-bucket cumsum + the bucket's base = each doc's
          global offset; bin spans are pure arithmetic and the
          straddle explode is a vectorized repeat.

Ordering assumption (documented per the custom-operator rule): global
order is ``doc_id`` ascending and range buckets are ``doc_id //
bucket_size`` — exact for dense ids (this corpus); for sparse ids
pick bucket_size from the id span or pre-rank once.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc


def pack_sequences(ds, *, capacity: int = 256, id_col: str = "doc_id",
                   text_col: str = "text", bucket_size: int = 512):
    """Pack whitespace-token streams into ``capacity``-token bins.
    Returns ``(bin_id, doc_id, tokens_in_bin)``; zero-token docs are
    excluded (they occupy no bin)."""
    import ray
    from ray.data.aggregate import Sum

    def tok(batch: pa.Table) -> pa.Table:
        text = batch.column(text_col)
        spaces = pc.count_substring(text, " ")
        nonempty = pc.and_(pc.is_valid(text), pc.not_equal(text, ""))
        tc = pc.if_else(nonempty, pc.add(spaces, 1),
                        pa.scalar(0, pa.int32())).cast(pa.int64())
        ids = batch.column(id_col).cast(pa.int64())
        bkt = pc.cast(pc.divide(ids, bucket_size), pa.int64())
        return pa.table({id_col: ids, "tc": tc, "bkt": bkt})

    toks = ds.map_batches(tok, batch_format="pyarrow")

    def bucket_partial(batch: pa.Table) -> pa.Table:
        g = batch.group_by("bkt").aggregate([("tc", "sum")])
        return pa.table({"bkt": g.column("bkt"),
                         "partial": g.column("tc_sum")})

    totals = (toks.map_batches(bucket_partial, batch_format="pyarrow")
              .groupby("bkt").aggregate(Sum("partial", alias_name="t"))
              .to_pandas())            # one row per range bucket — tiny
    totals = totals.sort_values("bkt")
    bases = dict(zip(totals["bkt"],
                     np.concatenate([[0],
                                     totals["t"].to_numpy()
                                     .cumsum()[:-1]])))
    bases_ref = ray.put(bases)

    def pack(group: pd.DataFrame) -> pd.DataFrame:
        bases_map = ray.get(bases_ref)
        g = group.sort_values(id_col)
        tc = g["tc"].to_numpy(dtype=np.int64)
        ids = g[id_col].to_numpy(dtype=np.int64)
        keep = tc > 0
        tc, ids = tc[keep], ids[keep]
        if not len(tc):
            return pd.DataFrame({"bin_id": [], id_col: [],
                                 "tokens_in_bin": []}).astype(np.int64)
        base = int(bases_map[int(g["bkt"].iloc[0])])
        off = base + np.concatenate([[0], tc.cumsum()[:-1]])
        b0 = off // capacity
        b1 = (off + tc - 1) // capacity
        reps = (b1 - b0 + 1).astype(np.int64)
        bin_id = np.repeat(b0, reps) + _ranges(reps)
        doc = np.repeat(ids, reps)
        o = np.repeat(off, reps)
        t = np.repeat(tc, reps)
        lo = np.maximum(o, bin_id * capacity)
        hi = np.minimum(o + t, (bin_id + 1) * capacity)
        return pd.DataFrame({"bin_id": bin_id.astype(np.int64),
                             id_col: doc,
                             "tokens_in_bin": (hi - lo)
                             .astype(np.int64)})

    return toks.groupby("bkt").map_groups(pack, batch_format="pandas")


def _ranges(reps: np.ndarray) -> np.ndarray:
    """[0..reps[0]), [0..reps[1]), ... concatenated (vectorized)."""
    total = int(reps.sum())
    out = np.arange(total, dtype=np.int64)
    starts = np.concatenate([[0], reps.cumsum()[:-1]])
    return out - np.repeat(starts, reps)


def chunk_windows(ds, *, size: int = 8, stride: int = 4,
                  text_col: str = "text", id_col: str = "doc_id"):
    """Sliding-window chunking: split each document's token stream into
    overlapping windows of ``size`` tokens every ``stride`` tokens —
    the context-window chunking step of retrieval / long-document
    training pipelines (windows start at 0, stride, 2·stride, … while
    the start is inside the document; the last window may be short).

    Unlike ``pack_sequences`` (a GLOBAL ordered scan), chunking is
    per-document: a stateless ``map_batches`` with no shuffle and no
    driver state. The kernel is fully vectorized — one explode of the
    word stream, window starts/lengths by arithmetic, ONE fancy gather
    for every window's tokens, and a single ``binary_join`` renders
    all chunk texts at once (never a per-window Python join).

    Returns ``(id_col, chunk_id, n_tokens, chunk_text)``.
    """
    if stride <= 0 or size <= 0:
        raise ValueError("size and stride must be positive")

    def chunk_batch(batch: pa.Table) -> pa.Table:
        s = batch.column(text_col).to_pandas().fillna("")
        ids = batch.column(id_col).cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        lists = s.str.split(" ")
        n = lists.str.len().to_numpy(np.int64)       # >= 1 ('' -> [''])
        if len(n) == 0:
            return pa.table({id_col: pa.array([], pa.int64()),
                             "chunk_id": pa.array([], pa.int64()),
                             "n_tokens": pa.array([], pa.int64()),
                             "chunk_text": pa.array([], pa.string())})
        w = lists.explode().to_numpy(dtype=object)   # doc-contiguous
        d0 = np.concatenate([[0], n.cumsum()[:-1]])
        nwin = (n - 1) // stride + 1
        doc_rep = np.repeat(np.arange(len(n)), nwin)
        win_j = _ranges(nwin)
        starts = d0[doc_rep] + win_j * stride
        lens = np.minimum(size, n[doc_rep] - win_j * stride)
        idx = np.repeat(starts, lens) + _ranges(lens)
        offsets = np.concatenate([[0], lens.cumsum()])
        chunks = pc.binary_join(
            pa.ListArray.from_arrays(pa.array(offsets, pa.int32()),
                                     pa.array(w[idx], pa.string())),
            " ")
        return pa.table({
            id_col: pa.array(ids[doc_rep], pa.int64()),
            "chunk_id": pa.array(win_j, pa.int64()),
            "n_tokens": pa.array(lens, pa.int64()),
            "chunk_text": chunks,
        })

    return ds.map_batches(chunk_batch, batch_format="pyarrow")
