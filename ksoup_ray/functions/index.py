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


def phrase_hits(ds, phrase: tuple[str, ...], *,
                text_col: str = "text", id_col: str = "doc_id",
                num_partitions: int = 32):
    """Exact phrase search — per-document occurrence counts of a
    token-adjacent phrase (the positional-postings intersection every
    search engine runs at query time; Manning et al., IIR §2.4).

    Shape: stage 1 tokenizes and PRUNES to the phrase's terms only —
    each match emits an id-sized ``(doc, slot, apos)`` row where
    ``apos = position - slot`` (a phrase occurrence starting at p
    puts ALL of its slots at apos == p); in a deployed system this
    stage reads the persisted term-sharded positional index (the
    build side is :func:`inverted_index`) instead of re-tokenizing.
    ONE bounded shuffle co-partitions on ``hash(doc) %
    num_partitions`` — only matched-term postings ride it, a tiny
    fraction of the corpus — and each block resolves ALL of its docs
    in one lexsort + segment-count kernel: an (doc, apos) segment
    with len(phrase) rows has every slot present (a slot can match a
    given apos at most once), i.e. one phrase occurrence. Output:
    ``(doc_id, n_hits)`` for documents with >= 1 occurrence.
    """
    from ._blocks import bucket_of, segment_starts, start_of_segment

    terms = list(phrase)
    L = len(terms)
    if L == 0:
        raise ValueError("phrase must have at least one term")

    def postings(batch: pa.Table) -> pa.Table:
        s = batch.column(text_col).to_pandas().fillna("")
        ids = batch.column(id_col).cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        ex = s.str.split(" ").explode()
        di = ex.index.to_numpy(dtype=np.int64)   # sorted (row-major)
        w = ex.to_numpy(dtype=object)
        # 1-based token position within each doc
        pos = np.arange(len(di), dtype=np.int64) \
            - start_of_segment(di) + 1
        out_doc, out_slot, out_apos = [], [], []
        for slot, term in enumerate(terms):
            m = w == term
            out_doc.append(ids[di[m]])
            out_slot.append(np.full(int(m.sum()), slot, np.int8))
            out_apos.append(pos[m] - slot)
        # L >= 1 (checked above), so the member lists are never empty
        # and empty member arrays concatenate to the right dtypes.
        doc = np.concatenate(out_doc)
        return pa.table({
            "doc": pa.array(doc, pa.int64()),
            "slot": pa.array(np.concatenate(out_slot), pa.int8()),
            "apos": pa.array(np.concatenate(out_apos), pa.int64()),
            "_pk": pa.array(bucket_of(doc, num_partitions),
                            pa.int32()),
        })

    def intersect_block(block: pa.Table) -> pa.Table:
        doc = block.column("doc").to_numpy(zero_copy_only=False)
        apos = block.column("apos").to_numpy(zero_copy_only=False)
        if len(doc) == 0:
            return pa.table({id_col: pa.array([], pa.int64()),
                             "n_hits": pa.array([], pa.int64())})
        order = np.lexsort((apos, doc))
        doc, apos = doc[order], apos[order]
        new = np.ones(len(doc), bool)
        new[1:] = (doc[1:] != doc[:-1]) | (apos[1:] != apos[:-1])
        starts = np.flatnonzero(new)
        seg_len = np.append(starts[1:], len(doc)) - starts
        hit = seg_len == L
        hdoc = doc[starts][hit]
        if len(hdoc) == 0:
            return pa.table({id_col: pa.array([], pa.int64()),
                             "n_hits": pa.array([], pa.int64())})
        ud = segment_starts(hdoc)
        n_hits = np.append(ud[1:], len(hdoc)) - ud
        return pa.table({
            id_col: pa.array(hdoc[ud], pa.int64()),
            "n_hits": pa.array(n_hits.astype(np.int64), pa.int64()),
        })

    return (ds.map_batches(postings, batch_format="pyarrow")
            .groupby("_pk")
            .map_groups(intersect_block, batch_format="pyarrow"))
