"""Per-BLOCK dispatch for co-partitioned kernels — the scale-safe
replacement for per-key ``groupby(key).map_groups``.

Ray's ``map_groups`` invokes the UDF once per GROUP; when group keys
are corpus-scale (users, source nodes, vocabulary words) that is
row-at-a-time Python in disguise. The fix keeps the one hash shuffle
but bounds the GROUP COUNT instead of trusting the key: rows get a
``pk = hash(key) % num_partitions`` bucket column, the shuffle runs on
``pk`` (O(num_partitions) Python dispatches total), and each bucket's
kernel resolves ALL of its keys in one vectorized pass — sort +
segment boundaries (``np.flatnonzero(key[1:] != key[:-1])``) +
``searchsorted``/``reduceat``-style numpy, never a per-key loop.

Partitioning contract (document per the brief's custom-operator rule):
a bucket holds ~corpus/num_partitions rows and must fit a worker's
heap — size ``num_partitions`` to total_bytes/target_block_size at
real scale. Hot KEYS are fine (a key's rows land in one bucket
alongside other keys' rows and the kernel is O(bucket)); operators
whose per-key row count itself explodes (stopword postings) must salt
the key before bucketing, as ``unigram_logprob`` does.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

_SIGN_MASK = (1 << 62) - 1


def bucket_of(keys: np.ndarray, num_partitions: int) -> np.ndarray:
    """Deterministic int32 bucket ids for an int64 key array."""
    return ((keys.astype(np.int64) & _SIGN_MASK) % num_partitions) \
        .astype(np.int32)


def pk_column(col, num_partitions: int) -> pa.Array:
    """Bucket-id Arrow array for any key column: integral columns hash
    by value; everything else via ``pandas.util.hash_array`` (SipHash
    with a fixed key — deterministic across worker processes)."""
    try:
        keys = col.cast(pa.int64()).to_numpy(zero_copy_only=False)
        return pa.array(bucket_of(keys, num_partitions), pa.int32())
    except (pa.ArrowInvalid, pa.ArrowNotImplementedError):
        import pandas as pd
        h = pd.util.hash_array(
            col.to_pandas().to_numpy(dtype=object))
        return pa.array((h % num_partitions).astype(np.int32),
                        pa.int32())


def segment_starts(sorted_keys: np.ndarray) -> np.ndarray:
    """Indices where a new key segment begins in a key-sorted array
    (always includes 0). Vectorized; works on any comparable dtype."""
    n = len(sorted_keys)
    if n == 0:
        return np.empty(0, np.intp)
    first = np.empty(n, bool)
    first[0] = True
    first[1:] = sorted_keys[1:] != sorted_keys[:-1]
    return np.flatnonzero(first)


def start_of_segment(sorted_keys: np.ndarray) -> np.ndarray:
    """Per-ROW start index of the segment containing that row, for a
    key-sorted array — the guard that keeps running-scan kernels
    (``np.maximum.accumulate``) from leaking across key boundaries."""
    n = len(sorted_keys)
    if n == 0:
        return np.empty(0, np.intp)
    first = np.empty(n, bool)
    first[0] = True
    first[1:] = sorted_keys[1:] != sorted_keys[:-1]
    starts = np.flatnonzero(first)
    return starts[np.cumsum(first) - 1]
