"""Recrawl snapshot management: diff two crawl snapshots into
added / removed / changed / same — the delta a 100 TB pipeline
computes before reprocessing only what moved.

Shape: each side collapses to ``(id, md5)`` fingerprint rows BEFORE
the shuffle (payloads never ride it — same rule as exact_dedup), ONE
full-outer hash join on the id, then a vectorized status map. The
join partition count auto-sizes to the cluster like
``pipelines.curate`` (a single join, so the aggregator budget is
never the bottleneck here).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def _fingerprints(ds, id_col: str, text_col: str, tag: str):
    def fp(batch: pa.Table) -> pa.Table:
        texts = batch.column(text_col).to_pylist()
        h = [hashlib.md5((t or "").encode()).hexdigest() for t in texts]
        return pa.table({
            f"{tag}_id": batch.column(id_col).cast(pa.int64()),
            f"{tag}_md5": pa.array(h, pa.string()),
        })
    return ds.map_batches(fp, batch_format="pyarrow")


def snapshot_diff(old, new, *, id_col: str = "doc_id",
                  text_col: str = "text",
                  num_partitions: int | None = None):
    """Returns ``(doc_id, status)`` with status ∈ {added, removed,
    changed, same}: rows only in ``new`` are added, only in ``old``
    removed, in both with differing content hashes changed."""
    import ray

    if num_partitions is None:
        cpus = int(ray.cluster_resources().get("CPU", 8)) if \
            ray.is_initialized() else 8
        num_partitions = max(2, cpus // 2)

    a = _fingerprints(old, id_col, text_col, "a")
    b = _fingerprints(new, id_col, text_col, "b")
    joined = a.join(b, join_type="full_outer",
                    num_partitions=num_partitions,
                    on=("a_id",), right_on=("b_id",))

    def status(batch: pa.Table) -> pa.Table:
        # Ray's full-outer join COALESCES the key pair into the left
        # key column, so `a_id` is always populated; presence on each
        # side shows in the md5 columns' validity
        a_md5 = batch.column("a_md5")
        b_md5 = batch.column("b_md5")
        in_a = pc.is_valid(a_md5).to_numpy(zero_copy_only=False)
        in_b = pc.is_valid(b_md5).to_numpy(zero_copy_only=False)
        same = pc.equal(a_md5, b_md5).to_numpy(zero_copy_only=False)
        same = np.array([bool(x) for x in same], dtype=bool) \
            if same.dtype == object else same.astype(bool)
        st = np.where(~in_a, "added",
                      np.where(~in_b, "removed",
                               np.where(same, "same", "changed")))
        return pa.table({
            id_col: batch.column("a_id").cast(pa.int64()),
            "status": pa.array(st.astype(object), pa.string()),
        })

    return joined.map_batches(status, batch_format="pyarrow")
