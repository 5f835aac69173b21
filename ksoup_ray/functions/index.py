"""Distributed inverted-index construction (search-engine posting
lists) — the classic MapReduce workload, Ray-Data-first.

Shape: one task-pool ``map_batches`` emits per-batch DISTINCT
``(term, doc_id)`` pairs tagged with a BOUNDED bucket key
``_pk = hash(term) % num_partitions``; ONE shuffle co-partitions on
``_pk`` (Python dispatches O(num_partitions) times — never per term,
see ``_blocks.py``); each bucket block then resolves ALL of its terms
in one vectorized pass — lexsort, cross-batch pair dedup, segment
boundaries, ``reduceat``-style df counts, rank-capped postings, and a
single ``pyarrow.compute.binary_join`` to render every posting list at
once.

At 100 TB the vocabulary is billions of terms: nothing here holds it
in one place — pairs shuffle hash-bucketed, postings are CAPPED at
``k`` doc ids (df keeps the true count), and the output streams. Hot
terms (stopwords) are bounded by the cap: a stopword's pairs all land
in one bucket, but the kernel is O(bucket rows), not O(bucket keys).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc


def inverted_index(ds, *, text_col: str = "text", id_col: str = "doc_id",
                   k: int = 8, num_partitions: int = 32):
    """Build capped posting lists: one row per distinct term with
    ``df`` (true distinct-document frequency) and ``postings`` (the
    ``k`` smallest doc ids, comma-joined — deterministic and
    oracle-comparable as a plain string column).
    """

    def pairs(batch: pa.Table) -> pa.Table:
        s = batch.column(text_col).to_pandas().fillna("")
        ids = batch.column(id_col).cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        ex = s.str.split(" ").explode()
        di = ex.index.to_numpy(dtype=np.int64)
        w = ex.to_numpy(dtype=object)
        mask = pd.notna(w) & (w != "")
        w, di = w[mask], di[mask]
        dedup = pd.DataFrame({"term": w, id_col: ids[di]}) \
            .drop_duplicates()
        terms = dedup["term"].to_numpy(dtype=object)
        pk = (pd.util.hash_array(terms)
              % num_partitions).astype(np.int32)
        return pa.table({
            "term": pa.array(terms, pa.string()),
            id_col: pa.array(dedup[id_col].to_numpy(np.int64), pa.int64()),
            "_pk": pa.array(pk, pa.int32()),
        })

    empty = pa.table({"term": pa.array([], pa.string()),
                      "df": pa.array([], pa.int64()),
                      "postings": pa.array([], pa.string())})

    def merge_block(block: pa.Table) -> pa.Table:
        t = block.column("term").to_numpy(zero_copy_only=False)
        d = block.column(id_col).to_numpy(zero_copy_only=False)
        if len(t) == 0:
            return empty
        order = np.lexsort((d, t))
        t, d = t[order], d[order]
        keep = np.ones(len(t), bool)            # same pair from two
        keep[1:] = (t[1:] != t[:-1]) | (d[1:] != d[:-1])  # source batches
        t, d = t[keep], d[keep]
        starts = np.flatnonzero(np.r_[True, t[1:] != t[:-1]])
        df_counts = (np.append(starts[1:], len(t)) - starts)
        rank = np.arange(len(t)) - np.repeat(starts, df_counts)
        capped = rank < k
        offsets = np.r_[0, np.cumsum(np.minimum(df_counts, k))]
        docs_str = pc.cast(pa.array(d[capped], pa.int64()), pa.string())
        lists = pa.ListArray.from_arrays(
            pa.array(offsets, pa.int32()), docs_str)
        return pa.table({
            "term": pa.array(t[starts], pa.string()),
            "df": pa.array(df_counts.astype(np.int64), pa.int64()),
            "postings": pc.binary_join(lists, ","),
        })

    return (ds.map_batches(pairs, batch_format="pyarrow")
            .groupby("_pk")
            .map_groups(merge_block, batch_format="pyarrow"))
