"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard
verification, embedding-cosine near-dup, connected components.

Scale shapes (ray_guide "Aggregation at scale"):
* exact: vectorized hash column → native ``groupby(hash).aggregate(Min)``
  picks winners (ONE shuffle on a 32-byte key + int id), then a hash-join
  brings the winning rows' payloads back — document bodies never ride the
  dedup shuffle;
* MinHash-LSH: per-batch shingle→minhash (pure uint64 numpy — the
  mod-(2^61−1) product runs in 32-bit limbs, bit-exact, no big-int
  loop), explode to ``(band_id, band_hash, doc_id)`` rows (tiny),
  bucket-partitioned vectorized pairing → candidate pairs → exact
  Jaccard verification by hash-JOINING pair ids against the docs table
  (no whole-corpus broadcast) → drops / components;
* SimHash: 64-bit signature per doc, word hashes cached per actor and
  the bit-vote accumulated vectorized;
* embedding cosine: normalized vectors, per-bucket numpy matmul;
* connected components: distributed min-label propagation — every round
  is ``join + groupby(Min)`` over the (node,label) table; nothing
  corpus-scale ever lands on the driver.
"""

from __future__ import annotations

import functools
import hashlib
import itertools

import numpy as np
import pandas as pd
import pyarrow as pa

P61 = (1 << 61) - 1
_POLY_B = np.uint64(0x9E3779B97F4A7C15)  # odd 64-bit mix constant


def strip_schema_metadata(ds):
    """Drop schema-level metadata (the parquet footer's ``pandas``
    blob) before a hash join: a ``pa.Schema`` carrying a metadata dict
    is UNHASHABLE, which defeats Ray 2.49's ``unify_schemas`` set-dedup
    fast path and logs a ``Failed to hash the schemas`` warning from
    every shuffle aggregator. ``replace_schema_metadata`` is zero-copy
    (same buffers, new schema object) and ``batch_size=None`` keeps
    the map BLOCK-WISE — the default 1024-row rebatching would concat/
    copy every payload block just to touch its schema (measured ~0.7 s
    on the sf0.1 curate path)."""
    return ds.map_batches(lambda b: b.replace_schema_metadata(None),
                          batch_format="pyarrow", batch_size=None)


def _join_ready(ds, num_blocks: int = 4):
    """Coalesce a SMALL keyed table before feeding ``Dataset.join``.

    Ray 2.49's hash-shuffle join builds each partition with an
    ArrowBlockBuilder; a schema-LESS empty block (as emitted by
    groupby/aggregate or map_groups for empty input partitions) yields a
    zero-column partition table and the Arrow join then fails with "No
    match ... FieldRef" on small inputs. Repartitioning concatenates
    those empties into schema-carrying blocks. Only ever applied to
    id-sized tables (aggregate outputs, pair lists) — never to payload
    tables. Also strips schema metadata (see
    :func:`strip_schema_metadata`) so the join's schema dedup stays on
    its fast path."""
    return strip_schema_metadata(ds.repartition(num_blocks))

# ---------------------------------------------------------------------------
# exact dedup

def add_md5(batch: pa.Table, text_col: str = "text") -> pa.Table:
    texts = batch.column(text_col).to_pylist()
    h = [hashlib.md5((t or "").encode()).hexdigest() for t in texts]
    return batch.append_column("content_md5", pa.array(h, pa.string()))


def exact_dedup(ds, text_col: str = "text", key_col: str = "doc_id",
                num_partitions: int = 16):
    """Keep the lowest-key row per identical text. Returns kept Dataset.

    Shuffle inventory: groupby on (md5, id) — payloads do NOT ride it;
    the native ``aggregate(Min)`` replaces per-group pandas (measured
    ~3 ms/group on tiny groups — BASELINE.md §5). Winning payloads come
    back via one hash-join on the id.
    """
    from ray.data.aggregate import Min

    hashed = ds.map_batches(lambda b: add_md5(b, text_col),
                            batch_format="pyarrow") \
        .select_columns(["content_md5", key_col])
    winners = hashed.groupby("content_md5").aggregate(
        Min(key_col, alias_name=key_col))
    return _join_ready(winners.select_columns([key_col])).join(
        strip_schema_metadata(ds), join_type="inner",
        num_partitions=num_partitions, on=(key_col,))


# ---------------------------------------------------------------------------
# MinHash + LSH

def _fold61(v: np.ndarray) -> np.ndarray:
    """Reduce uint64 values mod 2^61-1 (one fold + conditional subtract)."""
    r = (v & np.uint64(P61)) + (v >> np.uint64(61))
    return np.where(r >= P61, r - np.uint64(P61), r)


def _modmul_min(a: np.ndarray, b: np.ndarray, x: np.ndarray,
                offsets: np.ndarray) -> np.ndarray:
    """Per-document min over (a*x + b) mod (2^61-1), exact, pure uint64.

    ``a,b < 2^31`` so the product splits into 32-bit limbs that never
    overflow uint64:  a*x = a*x_hi*2^32 + a*x_lo  with  a*x_lo ≤ 2^63,
    a*x_hi ≤ 2^60;  2^61 ≡ 1 (mod p)  collapses the high limb.
    Bit-identical across workers (no big-int fallback, ~100× the object-
    dtype outer product this replaces). ``offsets`` are the per-doc
    starting indexes into ``x`` (reduceat segments).
    """
    xm = _fold61(x)
    x_lo = xm & np.uint64(0xFFFFFFFF)
    x_hi = xm >> np.uint64(32)
    # Row-at-a-time with in-place ops: the (H, n) outer product version
    # materialized ~8 full H×n uint64 intermediates (hundreds of MB at
    # real batch sizes) and was RAM-bandwidth bound; per-row buffers
    # stay in L2 (~5× measured). Math is bit-identical.
    H = len(a)
    out = np.empty((H, len(offsets)), dtype=np.uint64)
    t = np.empty_like(xm)
    u = np.empty_like(xm)
    tmp = np.empty_like(xm)
    c29, m29 = np.uint64(29), np.uint64((1 << 29) - 1)
    c32, c61, p = np.uint64(32), np.uint64(61), np.uint64(P61)
    for i in range(H):
        ai, bi = a[i], b[i]
        np.multiply(x_lo, ai, out=t)            # ≤ 2^63
        np.multiply(x_hi, ai, out=u)            # ≤ 2^60
        np.right_shift(u, c29, out=tmp)
        np.bitwise_and(u, m29, out=u)
        np.left_shift(u, c32, out=u)            # u_lo * 2^32 ≤ 2^61
        u += tmp
        u += t
        u += bi                                 # total < 2^64
        np.right_shift(u, c61, out=tmp)         # fold61, in place
        np.bitwise_and(u, p, out=u)
        u += tmp
        u[u >= p] -= p
        np.minimum.reduceat(u, offsets, out=out[i])
    return out


class MinHasher:
    """Actor-pool stage: shingle → minhash signature per row.

    Permutation parameters are derived once per actor from a fixed seed
    (deterministic across the cluster); the word-hash cache persists
    across batches (per-actor state — the SoftPool pattern)."""

    def __init__(self, num_hashes: int = 128, shingle_size: int = 5,
                 seed: int = 42, text_col: str = "text"):
        rng = np.random.RandomState(seed)
        # a,b < 2^31: the no-overflow precondition of _modmul_min
        self.a = rng.randint(1, 1 << 31, size=num_hashes).astype(np.uint64)
        self.b = rng.randint(0, 1 << 31, size=num_hashes).astype(np.uint64)
        self.num_hashes = num_hashes
        self.shingle_size = shingle_size
        self.text_col = text_col
        self._word_cache: dict[str, int] = {}
        # bound worker memory at corpus scale: Ray reuses task workers
        # for the process lifetime, so an unbounded vocabulary cache
        # would grow with the whole corpus's distinct words. 1M entries
        # ≈ 100 MB; evicting the oldest half keeps the hot head (Zipf).
        self._word_cache_max = 1_000_000

    def _word_hashes(self, words: list[str]) -> np.ndarray:
        cache = self._word_cache
        out = np.empty(len(words), dtype=np.uint64)
        for i, w in enumerate(words):
            h = cache.get(w)
            if h is None:
                h = int.from_bytes(
                    hashlib.blake2b(w.encode(), digest_size=8).digest(),
                    "big")
                cache[w] = h
            out[i] = h
        if len(cache) > self._word_cache_max:
            # drop the older (insertion-ordered) half; recomputation is
            # cheap and the frequent words re-enter immediately
            for k in list(itertools.islice(cache, len(cache) // 2)):
                del cache[k]
        return out

    def shingle_hashes(self, text: str) -> np.ndarray:
        """64-bit hashes of the ``shingle_size``-word shingle set:
        polynomial combination (wrapping uint64) of cached word hashes —
        same shingle SET as the verification/oracle definition, only the
        hash function differs (minhash recall math is hash-agnostic)."""
        words = text.split()
        if not words:
            return np.zeros(0, dtype=np.uint64)
        wh = self._word_hashes(words)
        k = min(self.shingle_size, len(words))
        n_out = len(words) - k + 1
        acc = np.zeros(n_out, dtype=np.uint64)
        for j in range(k):
            acc = acc * _POLY_B + wh[j:j + n_out]
        return acc

    def signatures(self, texts: list[str]) -> np.ndarray:
        """(n_docs, num_hashes) uint64 — one batched kernel call."""
        per_doc = [self.shingle_hashes(t or "") for t in texts]
        lens = np.array([len(s) for s in per_doc], dtype=np.int64)
        nonempty = lens > 0
        sigs = np.zeros((len(texts), self.num_hashes), dtype=np.uint64)
        if nonempty.any():
            x = np.concatenate([s for s in per_doc if len(s)])
            offsets = np.zeros(int(nonempty.sum()), dtype=np.int64)
            np.cumsum(lens[nonempty][:-1], out=offsets[1:])
            mins = _modmul_min(self.a, self.b, x, offsets)  # (H, docs)
            sigs[nonempty] = mins.T
        return sigs

    def signature(self, text: str) -> np.ndarray:
        return self.signatures([text])[0]

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column(self.text_col).to_pylist()
        sigs = self.signatures(texts)
        arr = pa.FixedSizeListArray.from_arrays(
            pa.array(sigs.ravel(), pa.uint64()), self.num_hashes)
        return batch.append_column("minhash", arr)


def explode_bands(batch: pa.Table, num_bands: int = 16,
                  id_col: str = "doc_id") -> pa.Table:
    """(doc) rows → (band_id, band_hash, doc_id) rows — fully vectorized."""
    col = batch.column("minhash").combine_chunks()
    n = len(col)
    if n == 0:
        return pa.table({"band_id": pa.array([], pa.int32()),
                         "band_hash": pa.array([], pa.int64()),
                         id_col: batch.column(id_col)})
    if isinstance(col, pa.FixedSizeListArray):
        width = col.type.list_size
        flat = col.values.to_numpy(zero_copy_only=False)
    else:
        lists = col.to_pylist()
        width = len(lists[0])
        flat = np.asarray(lists, dtype=np.uint64).ravel()
    sigs = flat.astype(np.uint64).reshape(n, width)
    rows_per = width // num_bands
    seg = sigs[:, :num_bands * rows_per].reshape(n, num_bands, rows_per)
    bh = np.zeros((n, num_bands), dtype=np.uint64)
    for j in range(rows_per):                    # polynomial band hash
        bh = bh * _POLY_B + seg[:, :, j]
    bh >>= np.uint64(1)                          # fits int64
    band_ids = np.tile(np.arange(num_bands, dtype=np.int32), n)
    doc_rep = np.repeat(np.arange(n), num_bands)
    ids = batch.column(id_col).take(pa.array(doc_rep, pa.int64()))
    return pa.table({
        "band_id": pa.array(band_ids, pa.int32()),
        "band_hash": pa.array(bh.ravel().astype(np.int64), pa.int64()),
        id_col: ids,
    })


@functools.lru_cache(maxsize=8)
def _cached_hasher(num_hashes: int, shingle_size: int,
                   text_col: str) -> "MinHasher":
    # Per-worker-process singleton: Ray reuses task workers, so the word
    # cache persists across batches WITHOUT paying actor-pool startup
    # (the hasher's own state is just 256 ints — tasks, not actors).
    return MinHasher(num_hashes=num_hashes, shingle_size=shingle_size,
                     text_col=text_col)


def _band_rows(ds, *, num_hashes, num_bands, shingle_size, text_col,
               id_col, concurrency=None):
    def sig_and_bands(batch: pa.Table) -> pa.Table:
        mh = _cached_hasher(num_hashes, shingle_size, text_col)
        return explode_bands(mh(batch), num_bands, id_col)

    return ds.map_batches(sig_and_bands, batch_format="pyarrow")


def lsh_bucket_dedup(ds, *, num_hashes: int = 128, num_bands: int = 16,
                     shingle_size: int = 5, text_col: str = "text",
                     id_col: str = "doc_id", concurrency=(1, 4),
                     num_partitions: int = 16):
    """Pure-LSH first-pass dedup: DROP any doc sharing a band bucket with
    a lower-id doc (no verification — the recall-oriented scale pass).

    All-aggregate shape: native ``groupby.aggregate(Min)`` finds each
    bucket's keeper, a hash-join tags the losers — zero per-group pandas.
    """
    from ray.data.aggregate import Min

    bands = _band_rows(ds, num_hashes=num_hashes, num_bands=num_bands,
                       shingle_size=shingle_size, text_col=text_col,
                       id_col=id_col, concurrency=concurrency)
    keepers = bands.groupby(["band_id", "band_hash"]).aggregate(
        Min(id_col, alias_name="keep_id"))
    tagged = bands.join(_join_ready(keepers), join_type="inner",
                        num_partitions=num_partitions,
                        on=("band_id", "band_hash"))

    def losers(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        mask = pc.not_equal(batch.column(id_col), batch.column("keep_id"))
        return batch.filter(mask).select([id_col])

    dropped = tagged.map_batches(losers, batch_format="pyarrow")
    return dropped.groupby(id_col).count().select_columns([id_col])


def minhash_candidate_pairs(ds, *, num_hashes: int = 128,
                            num_bands: int = 32, shingle_size: int = 5,
                            text_col: str = "text", id_col: str = "doc_id",
                            concurrency=(1, 4), num_partitions: int = 16,
                            max_bucket: int = 200):
    """LSH candidate PAIRS (id_a < id_b) from shared band buckets —
    the input to Jaccard verification / connected components.

    ALL within-bucket pairs are generated (required for exact-oracle
    parity of the downstream drop set), but vectorized: buckets are
    hash-partitioned by ``band_hash % num_partitions`` and each
    partition self-merges in one pandas op — no per-tiny-bucket
    ``map_groups`` calls. Degenerate buckets larger than ``max_bucket``
    are capped to their ``max_bucket`` smallest ids; every cap trip is
    counted on the session cap-metrics actor under
    ``minhash_candidate_pairs.capped_buckets`` /
    ``minhash_candidate_pairs.dropped_rows`` (read with
    :func:`ksoup_ray.functions.metrics.read_cap_metrics`) and logged —
    never silent.
    """
    bands = _band_rows(ds, num_hashes=num_hashes, num_bands=num_bands,
                       shingle_size=shingle_size, text_col=text_col,
                       id_col=id_col, concurrency=concurrency)

    def add_pk(batch: pa.Table) -> pa.Table:
        bh = batch.column("band_hash").to_numpy(zero_copy_only=False)
        return batch.append_column(
            "pk", pa.array((bh % num_partitions).astype(np.int32)))

    def pairs_in_partition(group: pd.DataFrame) -> pd.DataFrame:
        df = group[["band_id", "band_hash", id_col]]
        sizes = df.groupby(["band_id", "band_hash"])[id_col].transform("size")
        big = sizes > max_bucket
        if big.any():
            # bounded degenerate-bucket guard — NEVER silent: count the
            # capped buckets and dropped rows on the metrics actor
            n_before = len(df)
            n_capped = df.loc[big, ["band_id", "band_hash"]] \
                .drop_duplicates().shape[0]
            df = df.sort_values(id_col).groupby(
                ["band_id", "band_hash"], as_index=False).head(max_bucket)
            from .metrics import record_drop
            record_drop("minhash_candidate_pairs.capped_buckets", n_capped)
            record_drop("minhash_candidate_pairs.dropped_rows",
                        n_before - len(df))
        m = df.merge(df, on=["band_id", "band_hash"])
        m = m[m[f"{id_col}_x"] < m[f"{id_col}_y"]]
        out = pd.DataFrame({"id_a": m[f"{id_col}_x"],
                            "id_b": m[f"{id_col}_y"]})
        return out.drop_duplicates()

    pairs = bands.map_batches(add_pk, batch_format="pyarrow") \
        .groupby("pk").map_groups(pairs_in_partition, batch_format="pandas")
    # distinct across bands/partitions: tiny table, one groupby
    return _join_ready(pairs.groupby(["id_a", "id_b"]).count()
                       .select_columns(["id_a", "id_b"]))


# ---------------------------------------------------------------------------
# n-gram Jaccard verification (for candidate pairs)

def word_shingles(text: str, k: int = 5) -> set[str]:
    """Distinct k-word shingles; shorter texts collapse to one shingle.
    EXACTLY mirrors the DuckDB oracle definition (list_distinct over
    list_transform of string_split)."""
    words = text.split(" ") if text else []
    if len(words) < k:
        return {" ".join(words)} if words else set()
    return {" ".join(words[i:i + k]) for i in range(len(words) - k + 1)}


def ngram_jaccard(a: str, b: str, n: int = 3) -> float:
    ga, gb = word_shingles(a, n), word_shingles(b, n)
    if not ga and not gb:
        return 1.0
    inter = len(ga & gb)
    union = len(ga | gb)
    return inter / union if union else 0.0


def verify_pairs_jaccard(pairs_ds, docs_ds, *, threshold: float = 0.5,
                         ngram: int = 5, text_col: str = "text",
                         id_col: str = "doc_id", num_partitions: int = 8):
    """Verify candidate pairs with exact n-gram Jaccard.

    Texts are attached by TWO HASH-JOINS of the pair table against the
    docs table (id_a then id_b) — only candidate pairs' texts move, and
    nothing is broadcast or driver-materialized (the whole-corpus
    ``ray.put`` lookup this replaces was an OOM at corpus scale)."""
    import pyarrow.compute as pc

    docs = strip_schema_metadata(
        docs_ds.select_columns([id_col, text_col]))
    j1 = pairs_ds.join(docs, join_type="inner",
                       num_partitions=num_partitions,
                       on=("id_a",), right_on=(id_col,))
    j1 = j1.map_batches(
        lambda b: b.rename_columns(
            [("text_a" if c == text_col else c) for c in b.column_names]),
        batch_format="pyarrow")
    j2 = j1.join(docs, join_type="inner", num_partitions=num_partitions,
                 on=("id_b",), right_on=(id_col,))

    def score(batch: pa.Table) -> pa.Table:
        a_texts = batch.column("text_a").to_pylist()
        b_texts = batch.column(text_col).to_pylist()
        jac = pa.array([ngram_jaccard(a or "", b or "", ngram)
                        for a, b in zip(a_texts, b_texts)], pa.float64())
        out = batch.select(["id_a", "id_b"]).append_column("jaccard", jac)
        return out.filter(pc.greater_equal(out.column("jaccard"),
                                           threshold))

    return j2.map_batches(score, batch_format="pyarrow")


def minhash_lsh_dedup(ds, *, num_hashes: int = 128, num_bands: int = 32,
                      shingle_size: int = 5, text_col: str = "text",
                      id_col: str = "doc_id", concurrency=(1, 4),
                      threshold: float = 0.5, num_partitions: int = 8):
    """MinHash-LSH near-dup with exact verification: returns a Dataset
    of doc ids to DROP — every doc having a VERIFIED (Jaccard ≥
    threshold) near-duplicate with a lower id.

    With 32 bands × 4 rows the candidate recall at J ≥ 0.8 is
    1 − (1 − 0.8⁴)³² ≈ 1 − 5e-8, so on corpora whose near-dup pairs sit
    well above the threshold the drop set EQUALS the exact-Jaccard
    oracle's (value-checked by the driver)."""
    pairs = minhash_candidate_pairs(
        ds, num_hashes=num_hashes, num_bands=num_bands,
        shingle_size=shingle_size, text_col=text_col, id_col=id_col,
        concurrency=concurrency, num_partitions=num_partitions)
    verified = verify_pairs_jaccard(
        pairs, ds, threshold=threshold, ngram=shingle_size,
        text_col=text_col, id_col=id_col, num_partitions=num_partitions)
    dropped = verified.select_columns(["id_b"]) \
        .groupby("id_b").count().select_columns(["id_b"])
    return dropped.map_batches(
        lambda b: b.rename_columns([id_col]), batch_format="pyarrow")


# ---------------------------------------------------------------------------
# SimHash

class SimHasher:
    """64-bit SimHash over word features.

    Word hash = top 8 bytes of md5 (big-endian) — chosen so the DuckDB
    oracle can recompute the signature in SQL. Hashes are cached per
    actor; the 64-lane bit vote is one vectorized matmul per document
    over DISTINCT words weighted by count (equivalent to the per-word
    loop, ~50× faster)."""

    def __init__(self, text_col: str = "text"):
        self.text_col = text_col
        self._cache: dict[str, int] = {}

    def _hashes(self, words: list[str]) -> np.ndarray:
        cache = self._cache
        out = np.empty(len(words), dtype=np.uint64)
        for i, w in enumerate(words):
            h = cache.get(w)
            if h is None:
                h = int.from_bytes(hashlib.md5(w.encode()).digest()[:8],
                                   "big")
                cache[w] = h
            out[i] = h
        return out

    def simhash(self, text: str) -> int:
        from collections import Counter
        counts = Counter(text.split())
        if not counts:
            return 0
        words = list(counts)
        h = self._hashes(words)
        c = np.fromiter(counts.values(), dtype=np.int64, count=len(words))
        bits = ((h[:, None] >> np.arange(64, dtype=np.uint64)) &
                np.uint64(1)).astype(np.int64)
        acc = (c[:, None] * (2 * bits - 1)).sum(axis=0)
        weights = (np.uint64(1) << np.arange(64, dtype=np.uint64))
        return int((weights * (acc > 0)).sum(dtype=np.uint64))

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column(self.text_col).to_pylist()
        hs = [self.simhash(t or "") for t in texts]
        out = batch.append_column("simhash",
                                  pa.array(hs, pa.uint64()))
        return out.append_column(
            "simhash_hex", pa.array([f"{h:016x}" for h in hs], pa.string()))


def hamming_distance(a: int, b: int) -> int:
    return bin(a ^ b).count("1")


_POP16: np.ndarray | None = None


def _pop16() -> np.ndarray:
    """16-bit popcount lookup table (numpy<2 has no vectorized
    bit_count); built once per process."""
    global _POP16
    if _POP16 is None:
        t = np.arange(1 << 16, dtype=np.uint16)
        c = np.zeros(1 << 16, dtype=np.uint8)
        while t.any():
            c += (t & 1).astype(np.uint8)
            t >>= 1
        _POP16 = c
    return _POP16


def _popcount64(x: np.ndarray) -> np.ndarray:
    """Vectorized popcount of a uint64 array via four 16-bit LUT
    lookups."""
    t = _pop16()
    x = x.astype(np.uint64, copy=False)
    out = t[(x & np.uint64(0xFFFF)).astype(np.int64)].astype(np.int64)
    for b in (16, 32, 48):
        out += t[((x >> np.uint64(b)) & np.uint64(0xFFFF))
                 .astype(np.int64)]
    return out


def simhash_pairs(ds, *, max_hamming: int = 3, id_col: str = "doc_id",
                  text_col: str = "text", num_partitions: int = 32,
                  max_block_group: int = 4096, concurrency=(1, 4)):
    """ALL document pairs within ``max_hamming`` SimHash bits — EXACT
    (100% recall), unlike probabilistic MinHash banding, via the
    pigeonhole block trick of Manku/Jain/Sarma's WWW'07 crawl-dedup
    paper: split the 64-bit signature into 4 contiguous 16-bit blocks;
    any pair at Hamming distance <= 3 differs in at most 3 blocks, so
    at least one block matches EXACTLY and the pair is co-located by a
    plain equality shuffle on (block_id, block_value).

    Distributed shape (the scale story):
      1. signatures: one actor-pool ``map_batches`` (SimHasher — word
         hashes cached per actor, one matmul per doc);
      2. explode x4: each doc emits 4 (block_key, id, sig) rows —
         pure numpy, output is 4 skinny rows per doc (24 B), never the
         text;
      3. ONE hash shuffle on ``pk = block_key % num_partitions``
         (functions/_blocks contract: O(num_partitions) Python
         dispatches, corpus-scale block_keys never become groups);
      4. per-bucket kernel: sort by block_key, segment boundaries via
         ``flatnonzero(diff)``, pair generation fully vectorized with
         repeat/cumsum index algebra (zero per-segment Python), LUT
         popcount on XOR, keep <= max_hamming;
      5. cross-block dedup WITHOUT a distinct shuffle: a surviving
         pair is emitted only by the FIRST block on which the two
         signatures agree (both sides compute it from the XOR, so
         exactly one bucket claims each pair).

    Degenerate block values (e.g. sig=0 empty docs at crawl scale)
    are capped at ``max_block_group`` ids per (block_id, value) with
    the cap trips recorded on the session cap-metrics actor under
    ``simhash_pairs.capped_blocks`` / ``simhash_pairs.dropped_rows``
    — never silent. Output: (id_a < id_b, hamming), exact vs the
    O(n^2) oracle whenever no cap trips.
    """
    sigs = ds.map_batches(SimHasher,
                          fn_constructor_kwargs={"text_col": text_col},
                          batch_format="pyarrow",
                          concurrency=concurrency)
    return hamming_pairs(sigs, sig_col="simhash", id_col=id_col,
                         max_hamming=max_hamming,
                         num_partitions=num_partitions,
                         max_block_group=max_block_group,
                         metric_prefix="simhash_pairs")


def hamming_pairs(sig_ds, *, sig_col: str = "sig",
                  id_col: str = "doc_id", max_hamming: int = 3,
                  num_partitions: int = 32, max_block_group: int = 4096,
                  metric_prefix: str = "hamming_pairs"):
    """ALL id pairs whose 64-bit signatures are within ``max_hamming``
    bits — the signature-agnostic pigeonhole core behind
    :func:`simhash_pairs`, reusable over ANY 64-bit fingerprint column
    (SimHash, image dHash, audio chromaprints). Requires
    ``max_hamming <= 3``: with 4 contiguous 16-bit blocks a pair
    within 3 bits must share at least one block exactly, so one
    equality shuffle has 100% recall. See :func:`simhash_pairs` for
    the stage-by-stage scale notes."""
    from ._blocks import bucket_of

    if max_hamming > 3:
        raise ValueError(
            "4x16-bit pigeonhole guarantees recall only for "
            f"max_hamming <= 3 (got {max_hamming})")

    def explode_blocks(batch: pa.Table) -> pa.Table:
        sig = batch.column(sig_col).to_numpy(zero_copy_only=False) \
            .astype(np.uint64)
        n = len(sig)
        take = np.repeat(np.arange(n, dtype=np.int64), 4)
        block_id = np.tile(np.arange(4, dtype=np.uint64), n)
        block_val = (sig[take] >> (block_id * np.uint64(16))) \
            & np.uint64(0xFFFF)
        block_key = (block_id.astype(np.int64) << 16) \
            | block_val.astype(np.int64)
        return pa.table({
            id_col: batch.column(id_col).take(pa.array(take)),
            "sig": pa.array(sig[take], pa.uint64()),
            "block_key": pa.array(block_key, pa.int64()),
            "_pk": pa.array(bucket_of(block_key, num_partitions),
                            pa.int32()),
        })

    rows = sig_ds.map_batches(explode_blocks, batch_format="pyarrow")

    def pairs_block(df: pd.DataFrame) -> pd.DataFrame:
        key = df["block_key"].to_numpy()
        order = np.argsort(key, kind="stable")
        key = key[order]
        ids = df[id_col].to_numpy()[order]
        sig = df["sig"].to_numpy().astype(np.uint64)[order]

        starts = np.flatnonzero(np.r_[True, key[1:] != key[:-1]])
        sizes = np.diff(np.r_[starts, len(key)])
        if (sizes > max_block_group).any():
            from .metrics import record_drop
            big = sizes > max_block_group
            record_drop(f"{metric_prefix}.capped_blocks",
                        int(big.sum()))
            record_drop(f"{metric_prefix}.dropped_rows",
                        int((sizes[big] - max_block_group).sum()))
            # keep the max_block_group smallest ids per oversized block
            keep = np.ones(len(key), bool)
            for s, z in zip(starts[big], sizes[big]):
                seg_ids = ids[s:s + z]
                kth = np.sort(seg_ids)[max_block_group - 1]
                keep[s:s + z] = seg_ids <= kth
            key, ids, sig = key[keep], ids[keep], sig[keep]
            starts = np.flatnonzero(np.r_[True, key[1:] != key[:-1]])
            sizes = np.diff(np.r_[starts, len(key)])

        # each row pairs leftward with every earlier row of its
        # segment: rank r at global index g contributes pairs
        # (g-r .. g-1, g) — built with repeat/cumsum, no Python loop
        rank = np.arange(len(key)) - np.repeat(starts, sizes)
        rights = np.repeat(np.arange(len(key)), rank)
        off = np.arange(rank.sum()) - np.repeat(
            np.cumsum(rank) - rank, rank)
        lefts = (rights - rank[rights]) + off
        if len(rights) == 0:
            # Arrow return keeps the block type uniform (pandas blocks
            # from map_groups break a downstream join/repartition on
            # tiny inputs — Ray 2.49 block-type inference)
            return pa.table({
                "id_a": pa.array([], pa.int64()),
                "id_b": pa.array([], pa.int64()),
                "hamming": pa.array([], pa.int64())})

        x = sig[lefts] ^ sig[rights]
        ham = _popcount64(x)
        ok = ham <= max_hamming
        lefts, rights, x, ham = lefts[ok], rights[ok], x[ok], ham[ok]

        # first-agreeing-block ownership: exactly one bucket emits
        first_agree = np.full(len(x), 3, np.int64)
        for b in (2, 1, 0):
            agree = ((x >> np.uint64(16 * b)) & np.uint64(0xFFFF)) == 0
            first_agree = np.where(agree, b, first_agree)
        this_block = key[rights] >> 16
        own = first_agree == this_block
        lefts, rights, ham = lefts[own], rights[own], ham[own]

        ia, ib = ids[lefts], ids[rights]
        return pa.table({
            "id_a": pa.array(np.minimum(ia, ib).astype(np.int64)),
            "id_b": pa.array(np.maximum(ia, ib).astype(np.int64)),
            "hamming": pa.array(ham.astype(np.int64))})

    return rows.groupby("_pk").map_groups(pairs_block,
                                          batch_format="pandas")


# ---------------------------------------------------------------------------
# embedding-cosine near-dup

def embedding_near_dup(ds, threshold: float = 0.95,
                       vec_col: str = "embedding",
                       id_col: str = "vec_id", num_buckets: int = 8,
                       seed: int = 7):
    """Near-dup pairs by cosine similarity.

    Scale path: random-hyperplane LSH bucket (sign of r·v) co-locates
    likely-similar vectors, then an exact numpy matmul within each
    bucket. Pairs spanning buckets on the single hyperplane are missed
    by design (document the recall/bucket tradeoff; raise num_buckets'
    planes for precision).
    """
    planes_holder = {}

    def add_bucket(batch: pa.Table) -> pa.Table:
        from .similarity import vecs_from_arrow
        vecs = vecs_from_arrow(batch.column(vec_col), np.float32)
        if "planes" not in planes_holder:
            rng = np.random.RandomState(seed)
            nbits = max(1, int(np.log2(num_buckets)))
            planes_holder["planes"] = rng.randn(vecs.shape[1], nbits) \
                .astype(np.float32)
        planes = planes_holder["planes"]
        bits = (vecs @ planes) > 0
        bucket = np.zeros(len(vecs), dtype=np.int64)
        for j in range(bits.shape[1]):
            bucket |= bits[:, j].astype(np.int64) << j
        return batch.append_column("sim_bucket", pa.array(bucket, pa.int64()))

    def pairs_in_bucket(group: pd.DataFrame) -> pd.DataFrame:
        vecs = np.stack(group[vec_col].to_numpy()).astype(np.float32)
        ids = group[id_col].to_numpy()
        norms = np.linalg.norm(vecs, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        unit = vecs / norms
        sims = unit @ unit.T
        ii, jj = np.where(np.triu(sims, k=1) >= threshold)
        return pd.DataFrame({
            "id_a": np.minimum(ids[ii], ids[jj]),
            "id_b": np.maximum(ids[ii], ids[jj]),
            "cosine": sims[ii, jj].astype(np.float64),
        })

    with_bucket = ds.map_batches(add_bucket, batch_format="pyarrow")
    return with_bucket.groupby("sim_bucket").map_groups(
        pairs_in_bucket, batch_format="pandas")


# ---------------------------------------------------------------------------
# connected components over candidate pairs (min-label propagation)

def connected_components(pairs_ds, *, id_a: str = "id_a", id_b: str = "id_b",
                         max_rounds: int = 8, num_partitions: int = 8,
                         on_nonconverged: str = "raise"):
    """Cluster candidate duplicate pairs into components: returns a
    Dataset of ``(node_id, component_id)`` where component_id is the
    minimum node id reachable through the pair graph.

    FULLY DISTRIBUTED min-label propagation: each round hash-joins the
    static edge list against the current (node,label) table, unions in
    the old labels, and takes ``groupby(node).aggregate(Min)``. The
    label table lives in the object store (materialized per round — it
    is ids-only, ~16 bytes/node); the driver sees only a scalar
    changed-row count per round. Converges in O(component diameter)
    rounds; duplicate-cluster graphs are shallow.

    If labels are STILL changing after ``max_rounds`` the result would
    be wrong (an over-diameter chain) — never silently: the default
    raises; ``on_nonconverged="warn"`` logs + records the residual
    changed-count under ``connected_components.nonconverged_labels``
    and returns the partial labels.
    """
    from ray.data.aggregate import Min

    pairs_mat = _join_ready(pairs_ds).materialize()

    # undirected edge list (node -> nbr) in both directions
    def to_edges(batch: pa.Table) -> pa.Table:
        a = batch.column(id_a).combine_chunks()
        b = batch.column(id_b).combine_chunks()
        return pa.table({
            "node": pa.concat_arrays([a.cast(pa.int64()),
                                      b.cast(pa.int64())]),
            "nbr": pa.concat_arrays([b.cast(pa.int64()),
                                     a.cast(pa.int64())]),
        })

    edges = pairs_mat.map_batches(to_edges, batch_format="pyarrow") \
        .materialize()

    # init: label(n) = min(n, min neighbor)
    def with_self(batch: pa.Table) -> pa.Table:
        return pa.table({"node": batch.column("node"),
                         "label": pa.compute.min_element_wise(
                             batch.column("node"), batch.column("nbr"))})

    labels = _join_ready(
        edges.map_batches(with_self, batch_format="pyarrow")
        .groupby("node").aggregate(Min("label", alias_name="label"))) \
        .materialize()

    changed = 0
    for _ in range(max_rounds):
        lab_keyed = labels.map_batches(
            lambda b: b.rename_columns(["lnode", "llabel"]),
            batch_format="pyarrow")
        nbr_lab = edges.join(lab_keyed, join_type="inner",
                             num_partitions=num_partitions,
                             on=("nbr",), right_on=("lnode",)) \
            .map_batches(lambda b: pa.table({
                "node": b.column("node"),
                "label": b.column("llabel")}), batch_format="pyarrow")
        new_labels = _join_ready(
            nbr_lab.union(labels).groupby("node").aggregate(
                Min("label", alias_name="label"))).materialize()

        # convergence: scalar changed-count (labels only decrease)
        old_keyed = labels.map_batches(
            lambda b: b.rename_columns(["onode", "old_label"]),
            batch_format="pyarrow")
        changed = new_labels.join(
            old_keyed, join_type="inner", num_partitions=num_partitions,
            on=("node",), right_on=("onode",)) \
            .map_batches(lambda b: b.filter(pa.compute.not_equal(
                b.column("label"), b.column("old_label"))),
                batch_format="pyarrow").count()
        labels = new_labels
        if changed == 0:
            break
    if changed != 0:
        # loop exhausted max_rounds with labels still moving — the
        # labels are WRONG for some over-diameter chain; never silent
        msg = (f"connected_components did not converge in {max_rounds} "
               f"rounds ({changed} labels still changing — component "
               f"diameter exceeds max_rounds); raise max_rounds")
        if on_nonconverged == "raise":
            raise RuntimeError(msg)
        from .metrics import record_drop
        record_drop("connected_components.nonconverged_labels", changed)

    return labels.map_batches(
        lambda b: pa.table({"node_id": b.column("node"),
                            "component_id": b.column("label")}),
        batch_format="pyarrow")


# ---------------------------------------------------------------------------
# exact n-gram Jaccard dedup via a distributed shingle inverted index

def jaccard_pairs_exact(ds, *, shingle_size: int = 5,
                        threshold: float = 0.5, text_col: str = "text",
                        id_col: str = "doc_id", num_partitions: int = 8,
                        max_df: int | None = 1000):
    """EXACT n-gram Jaccard near-dup pairs — no LSH approximation.

    Distributed inverted-index shape (the classic exact-similarity-join
    plan, complementary to ``minhash_candidate_pairs``):

    1. explode each doc to its DISTINCT ``shingle_size``-word shingles,
       hashed to 63-bit ints (rows carry ``(sh, doc_id, n_sh)`` — 24
       bytes, never text);
    2. hash-partition by shingle, self-merge per partition → PARTIAL
       intersection counts per (id_a, id_b);
    3. ONE native ``groupby(id_a, id_b).aggregate(Sum, Min, Min)``
       merges partials into exact ``|A∩B|`` with ``|A|``/``|B|``
       carried alongside (no extra sizes join);
    4. vectorized Jaccard ``i / (n_a + n_b - i)`` + threshold filter.

    Shingle sets EXACTLY mirror :func:`word_shingles` (== the DuckDB
    oracle's list_distinct/list_transform definition), so the output
    pair set is the ground truth that LSH pipelines approximate.

    Scale notes: only fixed-width id rows ride the shuffle; a document
    contributes O(words) rows. Hot shingles (boilerplate n-grams shared
    by k docs) cost k² partial pairs — the quadratic corner of this
    plan — so the PRODUCTION DEFAULT caps them: shingles with
    within-partition document frequency above ``max_df`` (default 1000)
    are dropped, every drop counted on the cap-metrics actor under
    ``jaccard_pairs_exact.dropped_shingle_rows`` and logged (a RECALL
    tradeoff: a true near-dup pair whose overlap is ONLY boilerplate
    can be missed). Pass ``max_df=None`` for the uncapped exact form
    the DuckDB oracle mirrors — required for oracle parity, quadratic
    in the hottest shingle's document frequency.
    """
    merged = _shingle_pair_stats(
        ds, shingle_size=shingle_size, text_col=text_col, id_col=id_col,
        num_partitions=num_partitions, max_df=max_df,
        metric_key="jaccard_pairs_exact.dropped_shingle_rows")

    def finish(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({"id_a": pa.array([], pa.int64()),
                             "id_b": pa.array([], pa.int64())})
        inter = batch.column("inter").to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        na = batch.column("n_a").to_numpy(zero_copy_only=False)
        nb = batch.column("n_b").to_numpy(zero_copy_only=False)
        jac = inter / (na + nb - inter)
        return batch.filter(pa.array(jac >= threshold)) \
            .select(["id_a", "id_b"])

    return merged.map_batches(finish, batch_format="pyarrow")


def _shingle_pair_stats(ds, *, shingle_size: int, text_col: str,
                        id_col: str, num_partitions: int,
                        max_df: int | None, metric_key: str):
    """Shared inverted-index plan of the exact shingle-overlap family:
    dataset of (id_a < id_b, inter=|A∩B|, n_a=|A|, n_b=|B|) per
    document pair with at least one shared shingle. See
    :func:`jaccard_pairs_exact` for the stage-by-stage scale notes."""
    from ray.data.aggregate import Min, Sum

    def explode(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_pylist()
        texts = batch.column(text_col).to_pylist()
        sh: list[int] = []
        did: list[int] = []
        nsh: list[int] = []
        for i, t in zip(ids, texts):
            ss = word_shingles(t or "", shingle_size)
            n = len(ss)
            for s in ss:
                h = int.from_bytes(
                    hashlib.blake2b(s.encode(), digest_size=8).digest(),
                    "big") >> 1
                sh.append(h)
                did.append(i)
                nsh.append(n)
        pk = [h % num_partitions for h in sh]
        return pa.table({
            "sh": pa.array(sh, pa.int64()),
            id_col: pa.array(did, pa.int64()),
            "n_sh": pa.array(nsh, pa.int64()),
            "pk": pa.array(pk, pa.int32()),
        })

    rows = ds.map_batches(explode, batch_format="pyarrow")

    ix, iy = f"{id_col}_x", f"{id_col}_y"

    def partial_pairs(group: pd.DataFrame) -> pd.DataFrame:
        df = group[["sh", id_col, "n_sh"]]
        if max_df is not None:
            sizes = df.groupby("sh")[id_col].transform("size")
            kept = df[sizes <= max_df]
            if len(kept) < len(df):
                from .metrics import record_drop
                record_drop(metric_key, len(df) - len(kept))
            df = kept
        m = df.merge(df, on="sh")
        m = m[m[ix] < m[iy]]
        g = m.groupby([ix, iy, "n_sh_x", "n_sh_y"], as_index=False).size()
        return pd.DataFrame({
            "id_a": g[ix].astype("int64"),
            "id_b": g[iy].astype("int64"),
            "i_part": g["size"].astype("int64"),
            "n_a": g["n_sh_x"].astype("int64"),
            "n_b": g["n_sh_y"].astype("int64"),
        })

    partials = rows.groupby("pk").map_groups(partial_pairs,
                                             batch_format="pandas")
    return partials.groupby(["id_a", "id_b"]).aggregate(
        Sum("i_part", alias_name="inter"),
        Min("n_a", alias_name="n_a"),
        Min("n_b", alias_name="n_b"))


def containment_pairs(ds, *, shingle_size: int = 5,
                      threshold_ppm: int = 600_000,
                      text_col: str = "text", id_col: str = "doc_id",
                      num_partitions: int = 8,
                      max_df: int | None = 1000):
    """EXACT shingle CONTAINMENT near-dup pairs — Broder's asymmetric
    companion to Jaccard: ``C(A in B) = |A∩B| / |A|``. Catches the
    subset-duplicate Jaccard structurally misses (a short doc quoted
    whole inside a much longer one has C ≈ 1 but J ≈ |A|/|B| → 0) —
    the dominant template-page/syndication shape in web corpora.

    Same one-shuffle inverted-index plan as
    :func:`jaccard_pairs_exact` (shared ``_shingle_pair_stats`` —
    skinny hashed-shingle rows, per-partition self-merge, ONE native
    groupby merge; hot-shingle ``max_df`` cap recorded under
    ``containment_pairs.dropped_shingle_rows``); only the final
    vectorized filter differs, emitting BOTH directions of an
    unordered pair when each qualifies. The score is floored ppm in
    pure int64 (``inter * 1e6 // n_sub``) so the DuckDB oracle
    reproduces every value bit-exactly.

    Output: (id_sub, id_super, cont_ppm) — ``id_sub``'s shingle set is
    ``>= threshold_ppm/1e6`` contained in ``id_super``'s.
    """
    merged = _shingle_pair_stats(
        ds, shingle_size=shingle_size, text_col=text_col, id_col=id_col,
        num_partitions=num_partitions, max_df=max_df,
        metric_key="containment_pairs.dropped_shingle_rows")

    def finish(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({
                "id_sub": pa.array([], pa.int64()),
                "id_super": pa.array([], pa.int64()),
                "cont_ppm": pa.array([], pa.int64())})
        ia = batch.column("id_a").to_numpy(zero_copy_only=False)
        ib = batch.column("id_b").to_numpy(zero_copy_only=False)
        inter = batch.column("inter").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        na = batch.column("n_a").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        nb = batch.column("n_b").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        # both directions, int-exact: inter*1e6 < 2^63 for any real doc
        sub = np.concatenate([ia, ib])
        sup = np.concatenate([ib, ia])
        nsub = np.concatenate([na, nb])
        i2 = np.concatenate([inter, inter])
        ppm = i2 * 1_000_000 // nsub
        ok = ppm >= threshold_ppm
        return pa.table({
            "id_sub": pa.array(sub[ok], pa.int64()),
            "id_super": pa.array(sup[ok], pa.int64()),
            "cont_ppm": pa.array(ppm[ok], pa.int64())})

    return merged.map_batches(finish, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# embedding-cosine near-dup pairs (multi-table hyperplane LSH + exact verify)

def cosine_near_dup_pairs(ds, *, threshold: float = 0.465, bits: int = 2,
                          num_tables: int = 24, seed: int = 11,
                          vec_col: str = "embedding",
                          id_col: str = "vec_id", concurrency=(1, 4)):
    """Embedding-cosine near-dup PAIRS: multi-table random-hyperplane
    LSH candidates, exact float64 cosine verification in-bucket.

    Per table t, a vector's bucket is the sign pattern of ``bits``
    hyperplane projections; a pair at cosine c collides in one table
    with p = (1 − acos(c)/π)^bits, and across T OR'd tables recall is
    1 − (1 − p)^T (c = 0.465, bits=2, T=24 → miss ≈ 2e-6 — verified
    exhaustively against the brute-force pair set in tests). In-bucket
    similarity is EXACT cosine (float64 matmul), so precision is 1 and
    the only approximation is candidate recall.

    Scale notes: vectors ride the bucket shuffle once per table — for
    corpus scale raise ``bits`` (smaller buckets, more tables for the
    same recall) and run table ranges in waves; in-bucket work is one
    matmul per (table, bucket) group. Ids-only pairs come back; the
    final cross-table dedup is a groupby on the pair key.
    """
    planes_holder: dict[str, np.ndarray] = {}

    def bucketize(batch: pa.Table) -> pa.Table:
        from .similarity import vecs_from_arrow
        vecs = vecs_from_arrow(batch.column(vec_col), np.float64)
        n = len(vecs)
        if n == 0:
            return pa.table({"t": pa.array([], pa.int32()),
                             "bucket": pa.array([], pa.int64()),
                             id_col: pa.array([], pa.int64()),
                             vec_col: batch.column(vec_col)})
        if "p" not in planes_holder:
            rng = np.random.RandomState(seed)
            planes_holder["p"] = rng.standard_normal(
                (num_tables, vecs.shape[1], bits))
        planes = planes_holder["p"]
        proj = np.einsum("nd,tdb->tnb", vecs, planes) > 0   # (T, n, bits)
        bucket = np.zeros((num_tables, n), dtype=np.int64)
        for j in range(bits):
            bucket |= proj[:, :, j].astype(np.int64) << j
        idx = pa.array(np.tile(np.arange(n), num_tables), pa.int64())
        return pa.table({
            "t": pa.array(np.repeat(np.arange(num_tables, dtype=np.int32),
                                    n), pa.int32()),
            "bucket": pa.array(bucket.ravel(), pa.int64()),
            id_col: batch.column(id_col).combine_chunks().take(idx),
            vec_col: batch.column(vec_col).combine_chunks().take(idx),
        })

    rows = ds.map_batches(bucketize, batch_format="pyarrow")

    def pairs_in_bucket(group: pd.DataFrame) -> pd.DataFrame:
        vecs = np.stack(group[vec_col].to_numpy()).astype(np.float64)
        ids = group[id_col].to_numpy()
        norms = np.linalg.norm(vecs, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        unit = vecs / norms
        sims = unit @ unit.T
        ii, jj = np.where(np.triu(sims >= threshold, k=1))
        return pd.DataFrame({
            "id_a": np.minimum(ids[ii], ids[jj]).astype("int64"),
            "id_b": np.maximum(ids[ii], ids[jj]).astype("int64"),
        })

    pairs = rows.groupby(["t", "bucket"]).map_groups(
        pairs_in_bucket, batch_format="pandas")
    return pairs.groupby(["id_a", "id_b"]).count() \
        .select_columns(["id_a", "id_b"])


def semdedup(ds, centroids, *, threshold: float = 0.465,
             vec_col: str = "embedding", id_col: str = "vec_id",
             col_chunk: int = 4096):
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540): semantic
    deduplication by clustering embeddings and dropping, within each
    cluster, every vector that has a LOWER-id cluster-mate at cosine
    >= ``threshold``. The keep rule is the deterministic closed form
    ``keep(i) = NOT EXISTS j: cluster(j)=cluster(i) AND id(j)<id(i)
    AND cos(i,j) >= t`` — a pure function of the input, so a SQL
    oracle replays it exactly (SemDeDup's "keep one per ε-ball").

    Scale shape: ``centroids`` broadcast ONCE via ``ray.put`` (the
    SemDeDup recipe sizes k ∝ N/target-cluster, so clusters stay
    small — ~1k vectors for the paper's 100k clusters on LAION);
    assignment is one matmul+argmax per batch (ties to the LOWEST
    centroid index, same rule as similarity.CentroidAssigner); the
    pairwise step shuffles each vector ONCE keyed on its cluster id —
    a BOUNDED key set (k), so per-cluster ``map_groups`` dispatch is
    the grouped_topk per-lang shape, not per-row Python. In-cluster
    dominance runs in COLUMN CHUNKS (``col_chunk``): peak memory is
    m x col_chunk floats, never m^2, while flops stay the m^2·d the
    algorithm defines. Cluster rows must fit a worker heap — that is
    the k ∝ N sizing contract, documented per the custom-operator
    rule. Returns ``(vec_id, cluster_id, keep 0/1)`` for every row.
    """
    import ray
    from .similarity import _normalize, vecs_from_arrow

    cents_ref = ray.put(_normalize(
        np.asarray(centroids, dtype=np.float64)))

    def assign(batch: pa.Table) -> pa.Table:
        vecs = vecs_from_arrow(batch.column(vec_col), np.float64)
        if len(vecs) == 0:
            return pa.table({id_col: pa.array([], pa.int64()),
                             "cluster_id": pa.array([], pa.int64()),
                             vec_col: batch.column(vec_col)})
        cents = ray.get(cents_ref)
        cl = (_normalize(vecs) @ cents.T).argmax(axis=1)
        return pa.table({
            id_col: batch.column(id_col).cast(pa.int64()),
            "cluster_id": pa.array(cl.astype(np.int64), pa.int64()),
            vec_col: batch.column(vec_col),
        })

    def prune_cluster(group: pd.DataFrame) -> pd.DataFrame:
        ids = group[id_col].to_numpy(dtype=np.int64)
        order = np.argsort(ids, kind="stable")
        ids = ids[order]
        vecs = np.stack(group[vec_col].to_numpy()[order]) \
            .astype(np.float64)
        unit = _normalize(vecs)
        m = len(ids)
        dup = np.zeros(m, bool)
        rows = np.arange(m)
        for c0 in range(0, m, col_chunk):
            c1 = min(c0 + col_chunk, m)
            sims = unit @ unit[c0:c1].T          # (m, c1-c0)
            strictly_before = rows[:, None] < np.arange(c0, c1)[None, :]
            dup[c0:c1] = ((sims >= threshold)
                          & strictly_before).any(axis=0)
        return pd.DataFrame({
            id_col: ids,
            "cluster_id": group["cluster_id"].to_numpy(
                dtype=np.int64)[order],
            "keep": (~dup).astype(np.int64),
        })

    return (ds.map_batches(assign, batch_format="pyarrow")
            .groupby("cluster_id")
            .map_groups(prune_cluster, batch_format="pandas"))


# ---------------------------------------------------------------------------
# segment-level (paragraph-style) dedup

_SEG_PACK = 1 << 20       # packed uid = doc_id * 2^20 + seg_idx
_H1_KEY = "0123456789abcdef"       # pandas hash_array 16-byte keys —
_H2_KEY = "fedcba9876543210"       # two independent 64-bit hashes


def segment_dedup(ds, *, text_col: str = "text",
                  id_col: str = "doc_id", window: int = 10,
                  num_partitions: int = 64):
    """FineWeb/CCNet-style sub-document exact dedup: split each
    document into fixed ``window``-word segments, keep only the FIRST
    occurrence of every distinct segment across the whole corpus
    (corpus order = ``(doc_id, seg_idx)``), and reassemble each
    document from its surviving segments. Returns one row per input
    document: ``(id_col, dedup_text, n_kept, n_total)`` —
    ``dedup_text`` is '' when every segment was a repeat.

    Scale shape (two bounded-bucket shuffles, per-BLOCK kernels —
    functions/_blocks.py):
      1. explode: per batch, vectorized split/explode to segment rows;
         the dedup key is a 128-bit hash (two independent SipHash-64
         passes, ``pd.util.hash_array`` with fixed keys — vectorized,
         deterministic across workers; 64 bits alone WOULD collide at
         web scale, 128 will not);
      2. shuffle 1 on ``hash % num_partitions``: each bucket block
         sorts (h1, h2, packed_uid) and flags the minimum uid per
         (h1, h2) segment run as the winner — one vectorized pass for
         ALL segments in the bucket;
      3. shuffle 2 on ``doc bucket``: reassembly sorts (doc, seg_idx)
         and rebuilds every doc's text with ONE Arrow kernel
         (``ListArray.from_arrays`` offsets + ``binary_join``) — no
         per-doc Python.
    Segment TEXT rides both shuffles (needed for reassembly); the
    100-TB alternative ships (hash, uid) only and recomputes segments
    from the source at reassembly — same winner rule, one extra read.
    """
    import pandas as pd
    import pyarrow.compute as pc
    from ._blocks import bucket_of, segment_starts

    def explode(batch: pa.Table) -> pa.Table:
        s = batch.column(text_col).to_pandas().fillna("")
        ids = batch.column(id_col).cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        words = s.str.split(" ")                     # list per doc
        n_words = words.str.len().to_numpy().astype(np.int64)
        flat = words.explode().to_numpy(dtype=object) \
            if len(words) else np.empty(0, object)
        # segment id of every word, then join words per segment via
        # Arrow list offsets (no Python join loop)
        doc_rep = np.repeat(ids, n_words)
        widx = np.arange(len(flat), dtype=np.int64) - \
            np.repeat(np.cumsum(n_words) - n_words, n_words)
        seg_idx_w = widx // window
        # offsets of each (doc, seg) run in the flat word array: runs
        # are contiguous because words are emitted in doc order
        run_first = np.empty(len(flat), bool)
        if len(flat):
            run_first[0] = True
            run_first[1:] = (doc_rep[1:] != doc_rep[:-1]) | \
                (seg_idx_w[1:] != seg_idx_w[:-1])
        starts = np.flatnonzero(run_first)
        offsets = np.append(starts, len(flat)).astype(np.int32)
        segs = pc.binary_join(
            pa.ListArray.from_arrays(pa.array(offsets),
                                     pa.array(flat, pa.string())),
            " ")
        h1 = pd.util.hash_array(segs.to_numpy(zero_copy_only=False),
                                hash_key=_H1_KEY).astype(np.int64)
        h2 = pd.util.hash_array(segs.to_numpy(zero_copy_only=False),
                                hash_key=_H2_KEY).astype(np.int64)
        doc_seg = doc_rep[starts]
        idx_seg = seg_idx_w[starts]
        if np.any(idx_seg >= _SEG_PACK):
            raise ValueError("segment_dedup: doc exceeds 2^20 segments")
        return pa.table({
            "_pk": pa.array(bucket_of(h1, num_partitions), pa.int32()),
            "h1": pa.array(h1, pa.int64()),
            "h2": pa.array(h2, pa.int64()),
            "uid": pa.array(doc_seg * _SEG_PACK + idx_seg, pa.int64()),
            "seg": segs,
        })

    def flag_winners(block: pd.DataFrame) -> pd.DataFrame:
        order = np.lexsort((block["uid"].to_numpy(),
                            block["h2"].to_numpy(),
                            block["h1"].to_numpy()))
        h1 = block["h1"].to_numpy()[order]
        h2 = block["h2"].to_numpy()[order]
        uid = block["uid"].to_numpy()[order]
        seg = block["seg"].to_numpy()[order]
        # first row of every (h1, h2) run holds the minimal uid —
        # boundary test on BOTH hash halves (a combined-key scalar
        # could alias two adjacent distinct pairs)
        keep = np.empty(len(uid), bool)
        if len(uid):
            keep[0] = True
            keep[1:] = (h1[1:] != h1[:-1]) | (h2[1:] != h2[:-1])
        doc = uid // _SEG_PACK
        return pd.DataFrame({
            "_dk": bucket_of(doc, num_partitions),
            "uid": uid, "seg": seg, "keep": keep,
        })

    def reassemble(block: pd.DataFrame) -> pd.DataFrame:
        uid = block["uid"].to_numpy()
        order = np.argsort(uid, kind="mergesort")
        uid = uid[order]
        seg = block["seg"].to_numpy()[order]
        keep = block["keep"].to_numpy()[order]
        doc = uid // _SEG_PACK
        dstarts = segment_starts(doc)
        n_total = np.diff(np.append(dstarts, len(doc)))
        n_kept = np.add.reduceat(keep.astype(np.int64), dstarts) \
            if len(doc) else np.empty(0, np.int64)
        # empty docs (all segments dropped) need empty lists — offsets
        # from the cumulative kept count
        offsets = np.concatenate(
            [[0], np.cumsum(n_kept)]).astype(np.int32)
        texts = pc.binary_join(
            pa.ListArray.from_arrays(
                pa.array(offsets), pa.array(seg[keep], pa.string())),
            " ")
        return pa.table({
            id_col: pa.array(doc[dstarts], pa.int64()),
            "dedup_text": texts,
            "n_kept": pa.array(n_kept, pa.int64()),
            "n_total": pa.array(n_total, pa.int64()),
        }).to_pandas()

    exploded = ds.map_batches(explode, batch_format="pyarrow")
    flagged = exploded.groupby("_pk").map_groups(
        flag_winners, batch_format="pandas")
    return flagged.groupby("_dk").map_groups(
        reassemble, batch_format="pandas")


def span_stats(ds, *, text_col: str = "text", id_col: str = "doc_id",
               window: int = 8, num_partitions: int = 64):
    """Repeated-SPAN statistics — the sliding-window form of exact
    substring dedup ("Deduplicating Training Data Makes Language
    Models Better", Lee et al. 2022, the suffix-array criterion at
    window granularity): for every document, how many of its
    ``window``-word sliding spans occur anywhere else in the corpus
    (including other positions of the SAME doc). Downstream filters
    drop or trim docs with a high repeated fraction. Returns one row
    per document: ``(id_col, n_windows, n_repeated)`` —
    ``n_windows = max(len - window + 1, 0)`` and docs shorter than
    ``window`` report (0, 0).

    Scale shape — the only things that ever shuffle are 16-byte
    hashes + int64 ids, never span text:
      1. per batch: flat word array → strided fancy gather builds all
         sliding spans with ONE Arrow ``binary_join`` (no Python
         join loop); spans are keyed by a 128-bit hash (two
         independent fixed-key SipHash-64 passes — the
         ``segment_dedup`` collision argument: 64 bits would collide
         at web scale, 128 will not); per-doc (doc, 0, n_windows)
         base partials are emitted HERE so window-less docs still
         appear in the output;
      2. ONE hash shuffle on ``h1 % num_partitions`` (bounded bucket,
         per-BLOCK kernel): a bucket holds every occurrence of its
         hashes, so one sort + segment-length pass flags global
         repeats; the block collapses to (doc, rep_partial) rows
         before leaving;
      3. ONE final native Sum groupby on doc_id folds base + repeat
         partials.
    """
    import pandas as pd
    import pyarrow.compute as pc
    from ._blocks import bucket_of, segment_starts

    def explode(batch: pa.Table) -> pa.Table:
        s = batch.column(text_col).to_pandas().fillna("")
        ids = batch.column(id_col).cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        words = s.str.split(" ")
        n_words = words.str.len().to_numpy().astype(np.int64)
        nwin = np.maximum(n_words - window + 1, 0)
        # base rows get their OWN bucket range [P, 2P) spread by doc
        # hash — a single shared bucket would collect one row per
        # corpus document in one block
        base = pa.table({
            "_pk": pa.array(bucket_of(ids, num_partitions)
                            + np.int32(num_partitions), pa.int32()),
            id_col: pa.array(ids, pa.int64()),
            "rep": pa.array(np.zeros(len(ids), np.int64), pa.int64()),
            "nwin": pa.array(nwin, pa.int64()),
        })
        total = int(nwin.sum())
        if total == 0:
            return base
        flat = words.explode().to_numpy(dtype=object)
        doc_starts = np.cumsum(n_words) - n_words
        # global flat index of every span start, then a strided gather
        # (total x window) builds all spans in one shot — costs
        # window x word bytes per batch, which is why span batches
        # should stay modest (the caller's batch_size)
        span_doc = np.repeat(ids, nwin)
        span_start = np.repeat(doc_starts, nwin) + \
            (np.arange(total, dtype=np.int64)
             - np.repeat(np.cumsum(nwin) - nwin, nwin))
        gather = (span_start[:, None]
                  + np.arange(window, dtype=np.int64)).ravel()
        offsets = (np.arange(total + 1, dtype=np.int64) * window) \
            .astype(np.int32)
        spans = pc.binary_join(
            pa.ListArray.from_arrays(pa.array(offsets),
                                     pa.array(flat[gather],
                                              pa.string())), " ")
        sarr = spans.to_numpy(zero_copy_only=False)
        h1 = pd.util.hash_array(sarr, hash_key=_H1_KEY) \
            .astype(np.int64)
        h2 = pd.util.hash_array(sarr, hash_key=_H2_KEY) \
            .astype(np.int64)
        occ = pa.table({
            "_pk": pa.array(bucket_of(h1, num_partitions), pa.int32()),
            id_col: pa.array(span_doc, pa.int64()),
            "rep": pa.array(h1, pa.int64()),     # h1 in transit
            "nwin": pa.array(h2, pa.int64()),    # h2 in transit
        })
        return pa.concat_tables([base, occ])

    def flag_block(block: pd.DataFrame) -> pd.DataFrame:
        pk = int(block["_pk"].iloc[0])
        if pk >= num_partitions:
            # base partials pass through: (doc, rep=0, n_windows)
            return block[[id_col, "rep", "nwin"]]
        h1 = block["rep"].to_numpy(dtype=np.int64)
        h2 = block["nwin"].to_numpy(dtype=np.int64)
        doc = block[id_col].to_numpy(dtype=np.int64)
        order = np.lexsort((doc, h2, h1))
        h1s, h2s, docs = h1[order], h2[order], doc[order]
        key_change = np.ones(len(h1s), bool)
        key_change[1:] = (h1s[1:] != h1s[:-1]) | (h2s[1:] != h2s[:-1])
        starts = np.flatnonzero(key_change)
        lens = np.diff(np.append(starts, len(h1s)))
        repeated = np.repeat(lens >= 2, lens)
        g = pd.DataFrame({id_col: docs,
                          "rep": repeated.astype(np.int64)}) \
            .groupby(id_col, sort=False)["rep"].sum().reset_index()
        g["nwin"] = np.int64(0)
        return g[[id_col, "rep", "nwin"]]

    from ray.data.aggregate import Sum
    return (ds.map_batches(explode, batch_format="pyarrow")
            .groupby("_pk")
            .map_groups(flag_block, batch_format="pandas")
            .groupby(id_col)
            .aggregate(Sum("rep", alias_name="n_repeated"),
                       Sum("nwin", alias_name="n_windows")))


def dup_span_trim(ds, *, text_col: str = "text",
                  id_col: str = "doc_id", window: int = 8,
                  num_partitions: int = 64):
    """ExactSubstr-style repeated-span TRIMMING — the transform half
    of "Deduplicating Training Data Makes Language Models Better"
    (Lee et al. 2022) at word-window granularity, where
    :func:`span_stats` is the statistic half: delete every word
    covered by a ``window``-word sliding span that occurs >= 2 times
    anywhere in the corpus. ALL occurrences are trimmed (the
    deterministic symmetric variant — keep-first would need a global
    occurrence order through the hash shuffle; symmetric trimming is
    order-free, so two runs and the SQL oracle can never disagree).
    Returns one row per document:
    ``(id_col, trimmed_text, n_words, n_dropped)``.

    Scale shape (two bounded-bucket shuffles, per-BLOCK kernels):
      1. explode: the :func:`span_stats` strided gather builds every
         sliding span with ONE Arrow ``binary_join``; only 16-byte
         span hashes + (doc, pos) ids leave the batch — span TEXT
         never shuffles;
      2. shuffle 1 on ``h1 % num_partitions``: a bucket holds every
         occurrence of its hashes, so one lexsort + run-length pass
         flags globally-repeated spans and emits just their
         (doc, pos) rows;
      3. shuffle 2 on ``doc % num_partitions``: repeated positions
         meet their document's text row (shipped once per doc, never
         per span); cover marks come from a +1/-1 difference array
         cumsum over the block's flat word array (span intervals
         never cross doc boundaries, so one cumsum serves all docs),
         and surviving words rebuild with one ``binary_join`` —
         no per-doc Python.
    """
    import pandas as pd
    import pyarrow.compute as pc
    from ._blocks import bucket_of, segment_starts

    def explode(batch: pa.Table) -> pa.Table:
        s = batch.column(text_col).to_pandas().fillna("")
        ids = batch.column(id_col).cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        words = s.str.split(" ")
        n_words = words.str.len().to_numpy().astype(np.int64)
        nwin = np.maximum(n_words - window + 1, 0)
        total = int(nwin.sum())
        empty = pa.table({
            "_bk": pa.array([], pa.int32()),
            "doc": pa.array([], pa.int64()),
            "pos": pa.array([], pa.int64()),
            "h1": pa.array([], pa.int64()),
            "h2": pa.array([], pa.int64()),
        })
        if total == 0:
            return empty
        flat = words.explode().to_numpy(dtype=object)
        doc_starts = np.cumsum(n_words) - n_words
        span_doc = np.repeat(ids, nwin)
        span_pos = (np.arange(total, dtype=np.int64)
                    - np.repeat(np.cumsum(nwin) - nwin, nwin))
        span_start = np.repeat(doc_starts, nwin) + span_pos
        gather = (span_start[:, None]
                  + np.arange(window, dtype=np.int64)).ravel()
        offsets = (np.arange(total + 1, dtype=np.int64) * window) \
            .astype(np.int32)
        spans = pc.binary_join(
            pa.ListArray.from_arrays(pa.array(offsets),
                                     pa.array(flat[gather],
                                              pa.string())), " ")
        sarr = spans.to_numpy(zero_copy_only=False)
        h1 = pd.util.hash_array(sarr, hash_key=_H1_KEY) \
            .astype(np.int64)
        h2 = pd.util.hash_array(sarr, hash_key=_H2_KEY) \
            .astype(np.int64)
        return pa.table({
            "_bk": pa.array(bucket_of(h1, num_partitions), pa.int32()),
            "doc": pa.array(span_doc, pa.int64()),
            "pos": pa.array(span_pos, pa.int64()),
            "h1": pa.array(h1, pa.int64()),
            "h2": pa.array(h2, pa.int64()),
        })

    def flag_block(block: pd.DataFrame) -> pd.DataFrame:
        h1 = block["h1"].to_numpy(dtype=np.int64)
        h2 = block["h2"].to_numpy(dtype=np.int64)
        doc = block["doc"].to_numpy(dtype=np.int64)
        pos = block["pos"].to_numpy(dtype=np.int64)
        order = np.lexsort((pos, doc, h2, h1))
        h1s, h2s = h1[order], h2[order]
        key_change = np.ones(len(h1s), bool)
        key_change[1:] = (h1s[1:] != h1s[:-1]) | (h2s[1:] != h2s[:-1])
        starts = np.flatnonzero(key_change)
        lens = np.diff(np.append(starts, len(h1s)))
        repeated = np.repeat(lens >= 2, lens)
        # Arrow return keeps block types uniform through the union
        # with tag_docs' Arrow blocks (pandas blocks would break the
        # downstream Sort's boundary sampling — Ray 2.49)
        return pa.table({
            "_dk": pa.array(bucket_of(doc[order][repeated],
                                      num_partitions), pa.int32()),
            "doc": pa.array(doc[order][repeated], pa.int64()),
            "pos": pa.array(pos[order][repeated], pa.int64()),
            "text": pa.array([""] * int(repeated.sum()), pa.string()),
        })

    def tag_docs(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        return pa.table({
            "_dk": pa.array(bucket_of(ids, num_partitions), pa.int32()),
            "doc": pa.array(ids, pa.int64()),
            "pos": pa.array(np.full(len(ids), -1, np.int64), pa.int64()),
            "text": pc.fill_null(
                batch.column(text_col).cast(pa.string()), ""),
        })

    def rebuild(block: pd.DataFrame) -> pd.DataFrame:
        doc = block["doc"].to_numpy(dtype=np.int64)
        pos = block["pos"].to_numpy(dtype=np.int64)
        text = block["text"].to_numpy(dtype=object)
        is_text = pos == -1
        tdoc = doc[is_text]
        order = np.argsort(tdoc, kind="mergesort")
        tdoc = tdoc[order]
        s = pd.Series(text[is_text][order]).fillna("")
        words = s.str.split(" ")
        n_words = words.str.len().to_numpy().astype(np.int64)
        flat = words.explode().to_numpy(dtype=object) \
            if len(words) else np.empty(0, object)
        doc_starts = np.cumsum(n_words) - n_words
        diff = np.zeros(len(flat) + 1, np.int64)
        rdoc, rpos = doc[~is_text], pos[~is_text]
        if len(rdoc):
            di = np.searchsorted(tdoc, rdoc)
            start = doc_starts[di] + rpos
            np.add.at(diff, start, 1)
            np.add.at(diff, start + window, -1)
        covered = np.cumsum(diff[:-1]) > 0
        keep = ~covered
        dstarts = segment_starts(
            np.repeat(tdoc, n_words)) if len(flat) else \
            np.empty(0, np.int64)
        # docs can be empty-after-split only if n_words == 0, which
        # str.split never yields ('' -> ['']) — every doc has >= 1
        # word, so dstarts aligns 1:1 with tdoc
        n_drop = np.add.reduceat(covered.astype(np.int64), dstarts) \
            if len(flat) else np.empty(0, np.int64)
        n_kept = n_words - n_drop
        offsets = np.concatenate([[0], np.cumsum(n_kept)]) \
            .astype(np.int32)
        texts = pc.binary_join(
            pa.ListArray.from_arrays(
                pa.array(offsets), pa.array(flat[keep], pa.string())),
            " ")
        return pa.table({
            id_col: pa.array(tdoc, pa.int64()),
            "trimmed_text": texts,
            "n_words": pa.array(n_words, pa.int64()),
            "n_dropped": pa.array(n_drop, pa.int64()),
        })

    repeated = (ds.map_batches(explode, batch_format="pyarrow")
                .groupby("_bk")
                .map_groups(flag_block, batch_format="pandas"))
    docs = ds.map_batches(tag_docs, batch_format="pyarrow")
    return (docs.union(repeated)
            .groupby("_dk")
            .map_groups(rebuild, batch_format="pandas"))


# ---------------------------------------------------------------------------
# prefix-blocked Levenshtein near-duplicates

def batched_levenshtein(a: "pd.Series | list[str]",
                        b: "pd.Series | list[str]",
                        max_chars: int = 64) -> np.ndarray:
    """Exact Levenshtein distances for N string PAIRS at once — the
    classic O(la×lb) DP run as ~la×lb vectorized numpy steps over the
    whole pair batch instead of N independent Python DPs (unit
    insert/delete/substitute costs, no transposition — the same
    definition as DuckDB's ``levenshtein``). Strings are padded into
    [N, L] uint8 matrices; variable lengths are handled by snapshotting
    each pair's answer at DP row == len(a). Intended for SHORT keys
    (titles, url tails): cost grows with max_chars², so callers
    truncate first."""
    enc_a = [s.encode("utf-8")[:max_chars] for s in a]
    enc_b = [s.encode("utf-8")[:max_chars] for s in b]
    n = len(enc_a)
    la = np.fromiter((len(s) for s in enc_a), np.int64, n)
    lb = np.fromiter((len(s) for s in enc_b), np.int64, n)
    la_max, lb_max = (int(la.max()) if n else 0,
                      int(lb.max()) if n else 0)
    A = np.zeros((n, la_max), np.uint8)
    B = np.zeros((n, lb_max), np.uint8)
    for i, s in enumerate(enc_a):
        A[i, :len(s)] = np.frombuffer(s, np.uint8)
    for i, s in enumerate(enc_b):
        B[i, :len(s)] = np.frombuffer(s, np.uint8)
    prev = np.broadcast_to(np.arange(lb_max + 1, dtype=np.int32),
                           (n, lb_max + 1)).copy()
    ans = np.where(la == 0, lb, 0).astype(np.int64)
    rows = np.arange(n)
    for i in range(1, la_max + 1):
        cur = np.empty_like(prev)
        cur[:, 0] = i
        ai = A[:, i - 1]
        for j in range(1, lb_max + 1):
            cost = (ai != B[:, j - 1]).astype(np.int32)
            cur[:, j] = np.minimum(
                np.minimum(prev[:, j] + 1, cur[:, j - 1] + 1),
                prev[:, j - 1] + cost)
        done = la == i
        if done.any():
            ans[done] = cur[rows[done], lb[done]]
        prev = cur
    return ans


def fuzzy_neardup_pairs(ds, *, id_col: str = "doc_id",
                        text_col: str = "text", block_chars: int = 6,
                        key_chars: int = 18, max_dist: int = 6,
                        max_bucket: int = 2000,
                        num_partitions: int = 32):
    """Prefix-blocked fuzzy (edit-distance) near-duplicate pairs — the
    title/citation-dedup primitive that exact and MinHash dedup both
    miss (single-character typos). Blocking: two rows are candidates
    iff their first ``block_chars`` chars match EXACTLY; the next
    ``key_chars`` chars are then compared with batched Levenshtein and
    pairs with distance ≤ ``max_dist`` survive. One shuffle on
    ``hash(block) % num_partitions`` (bounded bucket key), then each
    block self-merges its prefix groups (the pairs_in_partition
    pattern) and scores ALL its pairs in one :func:`batched_levenshtein`
    call — no per-pair Python DP. Buckets larger than ``max_bucket``
    are capped with a recorded drop (never silent). Partitioning
    assumption: candidate blocks must fit a worker (true when the
    prefix is selective; widen ``block_chars`` for skewed corpora).
    Returns (id_a, id_b, dist) with id_a < id_b."""
    import pyarrow.compute as pc

    from ._blocks import pk_column

    def keyed(batch: pa.Table) -> pa.Table:
        txt = batch.column(text_col)
        blk = pc.utf8_slice_codeunits(txt, 0, block_chars)
        suf = pc.utf8_slice_codeunits(txt, block_chars,
                                      block_chars + key_chars)
        return pa.table({
            id_col: batch.column(id_col),
            "_blk": blk, "_suf": suf,
            "_pk": pk_column(blk, num_partitions),
        })

    def pairs_block(group: pd.DataFrame) -> pd.DataFrame:
        df = group[[id_col, "_blk", "_suf"]]
        sizes = df.groupby("_blk")[id_col].transform("size")
        big = sizes > max_bucket
        if big.any():
            n_before = len(df)
            n_capped = df.loc[big, "_blk"].nunique()
            df = df.sort_values(id_col).groupby(
                "_blk", as_index=False).head(max_bucket)
            from .metrics import record_drop
            record_drop("fuzzy_neardup.capped_blocks", n_capped)
            record_drop("fuzzy_neardup.dropped_rows",
                        n_before - len(df))
        m = df.merge(df, on="_blk")
        m = m[m[f"{id_col}_x"] < m[f"{id_col}_y"]]
        if not len(m):
            return pd.DataFrame({"id_a": np.empty(0, np.int64),
                                 "id_b": np.empty(0, np.int64),
                                 "dist": np.empty(0, np.int64)})
        d = batched_levenshtein(m["_suf_x"].tolist(),
                                m["_suf_y"].tolist(),
                                max_chars=key_chars)
        keep = d <= max_dist
        return pd.DataFrame({
            "id_a": m[f"{id_col}_x"].to_numpy()[keep],
            "id_b": m[f"{id_col}_y"].to_numpy()[keep],
            "dist": d[keep],
        })

    return (ds.map_batches(keyed, batch_format="pyarrow")
            .groupby("_pk")
            .map_groups(pairs_block, batch_format="pandas"))


def dup_host_spread(ds, *, text_col: str = "text",
                    host_col: str = "source", id_col: str = "doc_id",
                    num_partitions: int = 32):
    """Host spread of exact-duplicate clusters — for every text with
    ≥ 2 copies, how many DISTINCT hosts serve it. The boilerplate-vs-
    mirror diagnostic every large crawl curation wants: a duplicate
    cluster confined to one host is site template, a cluster spread
    over many hosts is syndicated/mirrored content (different removal
    policies apply — RefinedWeb strips the former per-site, keeps one
    canonical copy of the latter).

    Scale shape (functions/_blocks.py contract): per-batch map-side
    dedup of (md5, host) pairs plus per-(md5) row counts, ONE bounded
    ``hash(md5) % num_partitions`` bucket shuffle of those id-sized
    partials (payloads never move), and each bucket block resolves
    ALL of its texts in one vectorized lexsort + segment pass.
    Returns ``(content_md5, cluster_size, n_hosts)``, clusters ≥ 2
    only."""
    import pandas as pd
    from ._blocks import pk_column

    def pairs(batch: pa.Table) -> pa.Table:
        hashed = add_md5(batch, text_col)
        df = pd.DataFrame({
            "content_md5": hashed.column("content_md5").to_numpy(
                zero_copy_only=False),
            "host": batch.column(host_col).to_pandas().fillna(""),
        })
        # map-side combine: one row per (md5, host) with its count
        g = df.groupby(["content_md5", "host"], sort=False) \
            .size().reset_index(name="n")
        t = pa.Table.from_pandas(g, preserve_index=False) \
            .replace_schema_metadata(None)  # pandas meta = unhashable
        return t.append_column(
            "_pk", pk_column(t.column("content_md5"), num_partitions))

    def spread_block(block: pd.DataFrame) -> pd.DataFrame:
        block = block.sort_values(["content_md5", "host"],
                                  kind="mergesort")
        md5s = block["content_md5"].to_numpy()
        hosts = block["host"].to_numpy()
        starts = np.flatnonzero(
            np.concatenate([[True], md5s[1:] != md5s[:-1]]))
        sizes = np.add.reduceat(block["n"].to_numpy(np.int64), starts)
        # a (md5, host) pair can arrive from several batches — count
        # DISTINCT pairs per segment, not rows
        new_pair = np.concatenate(
            [[True], (md5s[1:] != md5s[:-1]) | (hosts[1:] != hosts[:-1])])
        n_hosts = np.add.reduceat(new_pair.astype(np.int64), starts)
        out = pd.DataFrame({
            "content_md5": md5s[starts],
            "cluster_size": sizes,
            "n_hosts": n_hosts.astype(np.int64),
        })
        return out[out["cluster_size"] >= 2].reset_index(drop=True)

    return (ds.map_batches(pairs, batch_format="pyarrow")
            .groupby("_pk")
            .map_groups(spread_block, batch_format="pandas"))


def best_keeper_ids(ds, *, key_col: str = "content_md5",
                    score_col: str = "n_chars",
                    id_col: str = "doc_id",
                    num_partitions: int = 32):
    """QUALITY-WEIGHTED dedup keeper choice: per duplicate cluster,
    keep the copy with the HIGHEST score (longest / cleanest /
    best-classifier copy — the RefinedWeb rule), deterministic
    tie-break on the lowest id. Complements the MIN-id keeper of
    :func:`exact_dedup`: at 100 TB the keeper rule is a policy knob,
    and argmax-by-score needs the score to ride the shuffle while the
    MIN-id rule folds with a native aggregate.

    Map-side combine first: each batch collapses to one (key,
    best_score, best_id, n) partial per DISTINCT key it saw, so only
    keys-per-batch rows ride the ONE bounded ``hash(key) %
    num_partitions`` bucket shuffle (functions/_blocks.py contract)
    — never the corpus; each bucket block folds all of its clusters'
    partials in one lexsort + segment pass (argmax = first row of the
    (key, score DESC, id ASC) sort, size = Σ n). Returns
    ``(key_col, keep_id, best_score, cluster_size)``."""
    import pandas as pd
    from ._blocks import from_pandas_clean, pk_column

    def local_best(batch: pa.Table) -> pa.Table:
        df = batch.select([key_col, score_col, id_col]).to_pandas()
        df = df.sort_values([key_col, score_col, id_col],
                            ascending=[True, False, True],
                            kind="mergesort")
        n = df.groupby(key_col, sort=False)[id_col].transform("size")
        first = ~df[key_col].duplicated()
        out = df[first].copy()
        out["n"] = n[first].to_numpy(np.int64)
        t = from_pandas_clean(out)
        return t.append_column(
            "_pk", pk_column(t.column(key_col), num_partitions))

    def keeper_block(block: pd.DataFrame) -> pd.DataFrame:
        # fold partials: argmax-of-argmaxes is the first row of the
        # (key asc, score DESC, id asc) sort; sizes sum
        block = block.sort_values([key_col, score_col, id_col],
                                  ascending=[True, False, True],
                                  kind="mergesort")
        keys = block[key_col].to_numpy()
        starts = np.flatnonzero(
            np.concatenate([[True], keys[1:] != keys[:-1]]))
        sizes = np.add.reduceat(block["n"].to_numpy(np.int64), starts)
        return pd.DataFrame({
            key_col: keys[starts],
            "keep_id": block[id_col].to_numpy(np.int64)[starts],
            "best_score": block[score_col].to_numpy(np.int64)[starts],
            "cluster_size": sizes.astype(np.int64),
        })

    return (ds.map_batches(local_best, batch_format="pyarrow")
            .groupby("_pk")
            .map_groups(keeper_block, batch_format="pandas"))


def exact_drop_ids(ds, text_col: str = "text",
                   key_col: str = "doc_id",
                   num_partitions: int = 32):
    """DROP-SET formulation of exact dedup: the ids that are NOT the
    lowest-key copy of their text — zero joins, one bounded-bucket
    shuffle of (md5, id) rows. Bucket on ``hash(md5) %
    num_partitions`` co-locates every copy of a text, then a
    segmented block kernel (sort by (md5, id), non-first-of-segment
    mask) emits the losers. Lets a curation pipeline apply exact AND
    near-dup drops in ONE payload anti-join instead of a keeper
    payload join per stage — at corpus scale the payload shuffle is
    the cost, so halving payload passes matters more than the extra
    id-only scan. Complements (not replaces) :func:`exact_dedup`,
    which returns the kept rows directly."""
    from ._blocks import pk_column

    def keyed(batch: pa.Table) -> pa.Table:
        t = add_md5(batch, text_col).select(["content_md5", key_col])
        return t.append_column(
            "_pk", pk_column(t.column("content_md5"), num_partitions)) \
            .replace_schema_metadata(None)

    def losers_block(block: pd.DataFrame) -> pd.DataFrame:
        block = block.sort_values(["content_md5", key_col],
                                  kind="mergesort")
        md5s = block["content_md5"].to_numpy()
        first = np.empty(len(block), bool)
        if len(block):
            first[0] = True
            first[1:] = md5s[1:] != md5s[:-1]
        return pd.DataFrame(
            {key_col: block[key_col].to_numpy()[~first]})

    return (ds.map_batches(keyed, batch_format="pyarrow")
            .groupby("_pk")
            .map_groups(losers_block, batch_format="pandas"))


def neardup_decontaminate(ds, eval_ds, *, text_col: str = "text",
                          id_col: str = "doc_id", k: int = 5,
                          threshold_ppm: int = 500_000,
                          concurrency=(1, 8)):
    """NEAR-duplicate decontamination — flag corpus documents whose
    k-word-shingle Jaccard against ANY benchmark document reaches the
    threshold (the Llama-style relaxation of exact-overlap
    decontamination: paraphrased or lightly-edited eval leakage still
    gets caught).

    Scale shape (shared-shingle-pruned, EXACT): the benchmark side is
    small by definition, so the driver builds, once, (a) the eval
    shingle sets, (b) an inverted index shingle → eval ids, and (c)
    the UNION of all eval shingles, broadcast together via
    ``ray.put`` to an actor pool. Per corpus doc the probe is ONE
    C-level set intersection against the union (not |evals|
    intersections — the round-4 per-row × per-eval loop is gone);
    only the hit shingles fan out through the inverted index to
    candidate eval ids, and only candidates get the exact integer
    Jaccard (jppm = inter·10⁶ // union — no float compare). The
    pruning is RECALL-1.0 by construction, not probabilistic LSH: a
    doc sharing zero shingles with an eval doc has Jaccard exactly 0,
    so skipping it cannot change ``max_jppm`` — outputs are
    bit-identical to the all-pairs baseline (pytest-pinned). The
    corpus never shuffles. For eval suites too big even for a
    broadcast shingle union, drop to ``decontaminate_bloom``'s packed
    bitset + semi-join verify. Emits (id, max_jppm, contaminated)."""
    import ray

    eval_rows = eval_ds.select_columns([id_col, text_col]).take_all()
    eval_sets = [(r[id_col], word_shingles(r[text_col] or "", k))
                 for r in eval_rows]
    inv: dict = {}
    for ei, (_, es) in enumerate(eval_sets):
        for g in es:
            inv.setdefault(g, []).append(ei)
    eval_ref = ray.put((eval_sets, inv, set(inv)))

    class Probe:
        def __init__(self, ref):
            self.eval_sets, self.inv, self.union = ray.get(ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            evs = self.eval_sets
            inv_get = self.inv.__getitem__
            union_all = self.union
            out = []
            for t in batch.column(text_col).to_pylist():
                s = word_shingles(t or "", k)
                best = 0
                hits = s & union_all
                if hits:
                    cand: set = set()
                    for g in hits:
                        cand.update(inv_get(g))
                    ls = len(s)
                    for ei in cand:
                        es = evs[ei][1]
                        inter = len(s & es)
                        union = ls + len(es) - inter
                        jppm = inter * 1_000_000 // union
                        if jppm > best:
                            best = jppm
                out.append(best)
            return pa.table({
                id_col: batch.column(id_col),
                "max_jppm": pa.array(out, pa.int64()),
                "contaminated": pa.array(
                    [v >= threshold_ppm for v in out], pa.bool_()),
            })

    return ds.map_batches(Probe, fn_constructor_args=(eval_ref,),
                          batch_format="pyarrow",
                          concurrency=concurrency)
