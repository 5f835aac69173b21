"""Sharded mutable membership index — the brief's "raw Ray actors
only where the Dataset API genuinely can't express the semantics"
case, made concrete.

A cross-PASS registry (text fingerprints seen in snapshot A, consulted
while streaming snapshot B) is a shared mutable state: no composition
of ``map_batches``/``groupby`` expresses "grow this set in pass 1,
read it in pass 2" without materializing the whole set into one block
or re-shuffling both corpora together. The index is therefore N plain
``@ray.remote`` actors, each owning one hash shard of the key space:

* ``add(keys)``  — pass-1 batches register their fingerprints;
* ``contains(keys)`` — pass-2 batches read membership, vectorized.

Keys route to shard ``hash(key) % n_shards`` INSIDE the caller, so
each batch issues at most ``n_shards`` actor calls (never one per
row), and shard memory is ~|A| / n_shards — size ``n_shards`` so one
shard fits an actor heap (at 100 TB that means thousands of shards
or a disk-backed dict per actor; the interface doesn't change).

Determinism note: ``add`` order across batches is NOT deterministic,
so correctness must never depend on WHICH duplicate registered first
— the membership answer ("was this text in snapshot A at all?") is
order-free, which is why incremental dedup phrases its keep-rule as
"not in A, and min-id within B" (the B-side winner picked by the
deterministic drop-set kernel, not by arrival)."""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

import ray


@ray.remote(num_cpus=0)
class _IndexShard:
    """One hash shard of the membership index (a plain set)."""

    def __init__(self):
        self._seen: set[bytes] = set()

    def add(self, keys: list[bytes]) -> int:
        self._seen.update(keys)
        return len(self._seen)

    def contains(self, keys: list[bytes]) -> list[bool]:
        seen = self._seen
        return [k in seen for k in keys]

    def size(self) -> int:
        return len(self._seen)


class ShardedIndex:
    """Driver-side handle over ``n_shards`` index actors. Picklable
    (carries only actor handles); every method is batch-vectorized
    and routes each key to its shard in one numpy pass."""

    def __init__(self, n_shards: int = 8):
        self.n_shards = n_shards
        self._shards = [_IndexShard.remote() for _ in range(n_shards)]

    @staticmethod
    def _digests(texts: list[str]) -> list[bytes]:
        return [hashlib.md5((t or "").encode()).digest()
                for t in texts]

    def _route(self, digests: list[bytes]):
        shard_of = np.fromiter(
            (d[0] % self.n_shards for d in digests), np.int64,
            len(digests))
        return shard_of

    def add_texts(self, texts: list[str]) -> None:
        digests = self._digests(texts)
        shard_of = self._route(digests)
        refs = []
        for s in range(self.n_shards):
            keys = [d for d, sh in zip(digests, shard_of) if sh == s]
            if keys:
                refs.append(self._shards[s].add.remote(keys))
        ray.get(refs)  # barrier: pass-1 batch fully registered

    def contains_texts(self, texts: list[str]) -> np.ndarray:
        digests = self._digests(texts)
        shard_of = self._route(digests)
        out = np.zeros(len(digests), bool)
        refs, slots = [], []
        for s in range(self.n_shards):
            idx = np.flatnonzero(shard_of == s)
            if len(idx):
                refs.append(self._shards[s].contains.remote(
                    [digests[i] for i in idx]))
                slots.append(idx)
        for hits, idx in zip(ray.get(refs), slots):
            out[idx] = hits
        return out

    def total_size(self) -> int:
        return int(sum(ray.get(
            [s.size.remote() for s in self._shards])))


def incremental_dedup(ds_prev, ds_new, *, text_col: str = "text",
                      id_col: str = "doc_id", n_shards: int = 8,
                      num_partitions: int = 32):
    """Cross-snapshot incremental dedup: the rows of ``ds_new`` whose
    text never appeared in ``ds_prev`` AND that are the min-id copy
    within ``ds_new`` — the recrawl-ingest primitive (only genuinely
    new content enters the corpus). Two streamed passes over a
    :class:`ShardedIndex`:

    1. ``ds_prev`` registers fingerprints (order-free set union);
    2. ``ds_new`` filters batches by vectorized membership, then the
       join-free drop-set kernel (``dedup.exact_drop_ids``) picks the
       deterministic min-id winner among ``ds_new``'s own duplicates.

    Returns the surviving (id, text-hash-free) rows of ``ds_new``."""
    from ..functions.dedup import exact_drop_ids
    from ..pipelines.curate import _anti_join

    index = ShardedIndex(n_shards=n_shards)

    def register(batch: pa.Table) -> pa.Table:
        index.add_texts(batch.column(text_col).to_pylist())
        return pa.table({"_n": pa.array([batch.num_rows], pa.int64())})

    # pass 1 — drain fully (the barrier the Dataset API can't express)
    ds_prev.map_batches(register,
                        batch_format="pyarrow").materialize()

    def keep_unseen(batch: pa.Table) -> pa.Table:
        seen = index.contains_texts(
            batch.column(text_col).to_pylist())
        return batch.filter(pa.array(~seen))

    fresh = ds_new.map_batches(keep_unseen, batch_format="pyarrow")
    dropped = exact_drop_ids(fresh, text_col=text_col,
                             key_col=id_col,
                             num_partitions=num_partitions)
    return _anti_join(fresh, dropped, id_col,
                      num_partitions=max(2, num_partitions // 4))
