"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard
verification, embedding-cosine near-dup.

Scale shapes (ray_guide "Aggregation at scale"):
* exact: vectorized hash column → ``groupby(hash)`` keep-first — ONE
  shuffle on a short key, not on document bodies;
* MinHash-LSH: per-batch shingle→minhash (numpy), explode to
  ``(band_id, band_hash, doc_id)`` rows (tiny), ``groupby`` bands →
  candidate groups → per-group keep-first / pair verification. Document
  bodies never shuffle — only signatures;
* SimHash: 64-bit signature per doc; near-dup = identical bucket on
  rotated prefixes;
* embedding cosine: normalized vectors, per-bucket numpy matmul.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa

# ---------------------------------------------------------------------------
# exact dedup

def add_md5(batch: pa.Table, text_col: str = "text") -> pa.Table:
    texts = batch.column(text_col).to_pylist()
    h = [hashlib.md5((t or "").encode()).hexdigest() for t in texts]
    return batch.append_column("content_md5", pa.array(h, pa.string()))


def exact_dedup(ds, text_col: str = "text", key_col: str = "doc_id"):
    """Keep the lowest-key row per identical text. Returns (kept Dataset).

    Shuffle inventory: one groupby on the 32-byte md5 — the payload
    columns ride along only for the winning rows.
    """
    ds = ds.map_batches(lambda b: add_md5(b, text_col),
                        batch_format="pyarrow")

    def keep_first(group: pd.DataFrame) -> pd.DataFrame:
        return group.nsmallest(1, key_col)

    return ds.groupby("content_md5").map_groups(keep_first,
                                                batch_format="pandas")


# ---------------------------------------------------------------------------
# MinHash + LSH

class MinHasher:
    """Actor-pool stage: shingle → minhash signature per row.

    Permutation parameters are derived once per actor from a fixed seed
    (deterministic across the cluster)."""

    MERSENNE = (1 << 61) - 1

    def __init__(self, num_hashes: int = 128, shingle_size: int = 5,
                 seed: int = 42, text_col: str = "text"):
        rng = np.random.RandomState(seed)
        self.a = rng.randint(1, self.MERSENNE, size=num_hashes,
                             dtype=np.uint64)
        self.b = rng.randint(0, self.MERSENNE, size=num_hashes,
                             dtype=np.uint64)
        self.num_hashes = num_hashes
        self.shingle_size = shingle_size
        self.text_col = text_col

    def shingles(self, text: str) -> np.ndarray:
        words = text.split()
        k = self.shingle_size
        if len(words) < k:
            items = [" ".join(words)] if words else [""]
        else:
            items = [" ".join(words[i:i + k])
                     for i in range(len(words) - k + 1)]
        # stable 64-bit hashes via blake2b (not salted like hash())
        return np.fromiter(
            (int.from_bytes(hashlib.blake2b(s.encode(), digest_size=8).digest(),
                            "big") for s in items),
            dtype=np.uint64, count=len(items))

    def signature(self, text: str) -> np.ndarray:
        sh = self.shingles(text)
        if len(sh) == 0:
            return np.zeros(self.num_hashes, dtype=np.uint64)
        return _modmul_min(self.a, self.b, sh, self.MERSENNE)

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column(self.text_col).to_pylist()
        sigs = [self.signature(t or "").astype(np.uint64) for t in texts]
        arr = pa.array([s.tolist() for s in sigs],
                       pa.list_(pa.uint64(), self.num_hashes))
        return batch.append_column("minhash", arr)


def _modmul_min(a: np.ndarray, b: np.ndarray, x: np.ndarray,
                p: int) -> np.ndarray:
    """min over x of (a*x + b) mod p, exact.

    61-bit operands overflow uint64 products, so the outer product runs
    in object (big-int) dtype, chunked to bound memory. Exactness
    matters: signatures must agree bit-for-bit across workers."""
    x = x % p
    mins = np.full(a.shape, np.iinfo(np.uint64).max, dtype=np.uint64)
    CH = 2048
    ao = a.astype(object)
    bo = b[:, None].astype(object)
    for i in range(0, len(x), CH):
        xs = x[i:i + CH].astype(object)
        prod = (np.multiply.outer(ao, xs) + bo) % p
        cand = np.array(prod.min(axis=1), dtype=np.uint64)
        mins = np.minimum(mins, cand)
    return mins


def explode_bands(batch: pa.Table, num_bands: int = 16,
                  id_col: str = "doc_id") -> pa.Table:
    """(doc) rows → (band_id, band_hash, doc_id) rows."""
    sigs = batch.column("minhash").to_pylist()
    ids = batch.column(id_col).to_pylist()
    rows_per = len(sigs[0]) // num_bands if sigs else 0
    band_ids: list[int] = []
    band_hashes: list[int] = []
    doc_ids: list = []
    for sid, sig in zip(ids, sigs):
        for b in range(num_bands):
            seg = tuple(sig[b * rows_per:(b + 1) * rows_per])
            # stable cross-process band hash (not Python's salted hash())
            bh = int.from_bytes(
                hashlib.blake2b(repr(seg).encode(), digest_size=8).digest(),
                "big") >> 1
            band_ids.append(b)
            band_hashes.append(bh)
            doc_ids.append(sid)
    return pa.table({
        "band_id": pa.array(band_ids, pa.int32()),
        "band_hash": pa.array(band_hashes, pa.int64()),
        id_col: pa.array(doc_ids),
    })


def minhash_lsh_dedup(ds, *, num_hashes: int = 128, num_bands: int = 16,
                      shingle_size: int = 5, text_col: str = "text",
                      id_col: str = "doc_id", concurrency=(1, 4)):
    """MinHash-LSH near-dup: returns a Dataset of doc ids to DROP.

    A doc is dropped if it shares any LSH band-bucket with a lower-id
    doc (keep-lowest-id policy; transitive chains collapse to the
    bucket minimum per band — at 100 TB run 2-3 min-label rounds for
    full connected components; bucket-local keep-first is the standard
    first-pass).
    """
    sigged = ds.map_batches(
        MinHasher, fn_constructor_kwargs=dict(
            num_hashes=num_hashes, shingle_size=shingle_size,
            text_col=text_col),
        batch_format="pyarrow", concurrency=concurrency)
    bands = sigged.map_batches(
        lambda b: explode_bands(b, num_bands, id_col),
        batch_format="pyarrow")

    def drop_in_bucket(group: pd.DataFrame) -> pd.DataFrame:
        keep = group[id_col].min()
        dropped = group[group[id_col] != keep][[id_col]]
        return dropped.drop_duplicates()

    dropped = bands.groupby(["band_id", "band_hash"]).map_groups(
        drop_in_bucket, batch_format="pandas")
    return dropped


# ---------------------------------------------------------------------------
# SimHash

class SimHasher:
    """64-bit SimHash over word features (vectorized bit-count update)."""

    def __init__(self, text_col: str = "text"):
        self.text_col = text_col

    @staticmethod
    def simhash(text: str) -> int:
        words = text.split()
        if not words:
            return 0
        acc = np.zeros(64, dtype=np.int64)
        for w in words:
            h = int.from_bytes(
                hashlib.blake2b(w.encode(), digest_size=8).digest(), "big")
            bits = (h >> np.arange(64, dtype=np.uint64)) & 1
            acc += np.where(bits.astype(bool), 1, -1)
        out = 0
        for i in range(64):
            if acc[i] > 0:
                out |= (1 << i)
        return out

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column(self.text_col).to_pylist()
        hs = [self.simhash(t or "") for t in texts]
        return batch.append_column("simhash",
                                   pa.array(hs, pa.uint64()))


def hamming_distance(a: int, b: int) -> int:
    return bin(a ^ b).count("1")


# ---------------------------------------------------------------------------
# n-gram Jaccard verification (for candidate pairs)

def ngram_jaccard(a: str, b: str, n: int = 3) -> float:
    def grams(s: str) -> set:
        words = s.split()
        if len(words) < n:
            return {tuple(words)} if words else set()
        return {tuple(words[i:i + n]) for i in range(len(words) - n + 1)}

    ga, gb = grams(a), grams(b)
    if not ga and not gb:
        return 1.0
    inter = len(ga & gb)
    union = len(ga | gb)
    return inter / union if union else 0.0


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
    import pyarrow.compute as pc  # noqa: F401

    planes_holder = {}

    def add_bucket(batch: pa.Table) -> pa.Table:
        vecs = np.array(batch.column(vec_col).to_pylist(), dtype=np.float32)
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
        vecs = np.array(group[vec_col].tolist(), dtype=np.float32)
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
                         max_rounds: int = 5):
    """Cluster candidate duplicate pairs into components: returns a
    Dataset of ``(node_id, component_id)`` where component_id is the
    minimum node id reachable through the pair graph.

    Distributed min-label propagation (ray_guide "Near-dup" note): each
    round, every node adopts the smallest label among itself and its
    neighbors — a groupby per round, converging in O(graph diameter)
    rounds. Duplicate-cluster graphs are shallow (dupes of the same
    doc), so ``max_rounds=5`` covers real corpora; raise it for deep
    chains. Rounds run over (node, label) edge projections only —
    document payloads never enter the shuffle.
    """
    import pyarrow as pa
    import pyarrow.compute as pc
    from ray.data.aggregate import Min

    # undirected edge list -> (node, neighbor_label) in both directions
    def to_edges(batch: pa.Table) -> pa.Table:
        a = batch.column(id_a)
        b = batch.column(id_b)
        return pa.table({
            "node": pa.concat_arrays([a.combine_chunks(),
                                      b.combine_chunks()]),
            "label": pa.concat_arrays([b.combine_chunks(),
                                       a.combine_chunks()]),
        })

    # materialize once: the edge projection is tiny (ids only), and the
    # propagation rounds below would otherwise re-execute the whole
    # upstream candidate pipeline once per round
    pairs_mat = pairs_ds.materialize()
    edges = pairs_mat.map_batches(to_edges, batch_format="pyarrow") \
        .materialize()
    # self-edges so isolated-but-listed nodes keep their own label
    self_edges = pairs_mat.map_batches(
        lambda t: pa.table({"node": t.column(id_a),
                            "label": t.column(id_a)}),
        batch_format="pyarrow").materialize()
    labels = edges.union(self_edges).groupby("node").aggregate(
        Min("label", alias_name="label"))

    for _ in range(max_rounds - 1):
        # propagate: join each edge's endpoint with its current label.
        # label tables are small relative to payloads; broadcast-join
        # them through a driver-side dict when they fit, else this
        # becomes a hash-join round (documented tradeoff).
        ldf = labels.to_pandas()  # single execution: row order is only
        # consistent within one materialization
        label_map = dict(zip(ldf["node"], ldf["label"]))

        def relabel(batch: pa.Table) -> pa.Table:
            nodes = batch.column("node").to_pylist()
            labs = batch.column("label").to_pylist()
            new = [label_map.get(l, l) for l in labs]
            return pa.table({"node": nodes, "label": new})

        relabeled = edges.union(self_edges).map_batches(
            relabel, batch_format="pyarrow")
        new_labels = relabeled.groupby("node").aggregate(
            Min("label", alias_name="label"))
        ndf = new_labels.to_pandas()
        new_map = dict(zip(ndf["node"], ndf["label"]))
        if new_map == label_map:
            labels = new_labels
            break
        labels = new_labels

    def rename(batch: pa.Table) -> pa.Table:
        return pa.table({"node_id": batch.column("node"),
                         "component_id": batch.column("label")})

    return labels.map_batches(rename, batch_format="pyarrow")


def minhash_candidate_pairs(ds, *, num_hashes: int = 128,
                            num_bands: int = 16, shingle_size: int = 5,
                            text_col: str = "text", id_col: str = "doc_id",
                            concurrency=(1, 4)):
    """LSH candidate PAIRS (id_a < id_b) from shared band buckets —
    the input to Jaccard verification / connected components."""
    import pyarrow as pa

    sigged = ds.map_batches(
        MinHasher, fn_constructor_kwargs=dict(
            num_hashes=num_hashes, shingle_size=shingle_size,
            text_col=text_col),
        batch_format="pyarrow", concurrency=concurrency)
    bands = sigged.map_batches(
        lambda b: explode_bands(b, num_bands, id_col),
        batch_format="pyarrow")

    def pairs_in_bucket(group: pd.DataFrame) -> pd.DataFrame:
        ids = sorted(set(group[id_col].tolist()))
        if len(ids) < 2:
            return pd.DataFrame({"id_a": [], "id_b": []})
        # pair everything with the bucket minimum (star expansion):
        # transitive closure is the components pass's job; the star
        # keeps pair counts linear in bucket size, not quadratic
        a = ids[0]
        return pd.DataFrame({"id_a": [a] * (len(ids) - 1),
                             "id_b": ids[1:]})

    pairs = bands.groupby(["band_id", "band_hash"]).map_groups(
        pairs_in_bucket, batch_format="pandas")

    def dedup_pairs(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas().drop_duplicates()
        return pa.Table.from_pandas(df, preserve_index=False)

    return pairs.map_batches(dedup_pairs, batch_format="pyarrow")


def verify_pairs_jaccard(pairs_ds, docs_ds, *, threshold: float = 0.5,
                         ngram: int = 3, text_col: str = "text",
                         id_col: str = "doc_id"):
    """Verify candidate pairs with exact n-gram Jaccard.

    The text lookup is broadcast via ray.put (candidate sets are small
    relative to the corpus; at 100 TB scale shard the verification by
    hash-joining pair ids against the docs table instead — documented
    tradeoff)."""
    import pyarrow as pa
    import ray

    texts = docs_ds.select_columns([id_col, text_col]).to_pandas()
    lookup_ref = ray.put(dict(zip(texts[id_col], texts[text_col])))

    class Verify:
        def __init__(self):
            self.lookup = ray.get(lookup_ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            a_ids = batch.column("id_a").to_pylist()
            b_ids = batch.column("id_b").to_pylist()
            keep_a, keep_b, jac = [], [], []
            for a, b in zip(a_ids, b_ids):
                j = ngram_jaccard(self.lookup.get(a, ""),
                                  self.lookup.get(b, ""), ngram)
                if j >= threshold:
                    keep_a.append(a)
                    keep_b.append(b)
                    jac.append(j)
            return pa.table({"id_a": keep_a, "id_b": keep_b,
                             "jaccard": pa.array(jac, pa.float64())})

    return pairs_ds.map_batches(Verify, batch_format="pyarrow",
                                concurrency=(1, 2))
