"""Exact-Jaccard inverted-index join + embedding-cosine near-dup pairs
(the two similarity joins added round 2 beyond the LSH family)."""

import numpy as np
import pyarrow as pa


def _pairs_df(ds):
    df = ds.to_pandas()
    if df.empty:
        return []
    return sorted(map(tuple, df[["id_a", "id_b"]].to_numpy().tolist()))


def test_jaccard_pairs_exact_crafted(ray_session):
    import ray.data as rd
    from ksoup_ray.functions.dedup import jaccard_pairs_exact, ngram_jaccard

    base = "the quick brown fox jumps over the lazy dog again and again"
    near = base + " extra"           # one extra word: high overlap
    far = "completely different words with no shared shingles at all here"
    docs = pa.table({"doc_id": pa.array([1, 2, 3], pa.int64()),
                     "text": [base, near, far]})
    assert ngram_jaccard(base, near, 5) >= 0.5
    assert ngram_jaccard(base, far, 5) < 0.5

    ds = rd.from_arrow(docs)
    got = _pairs_df(jaccard_pairs_exact(ds, shingle_size=5, threshold=0.5))
    assert got == [(1, 2)]


def test_jaccard_pairs_exact_matches_bruteforce(ray_session, sf_dir):
    """Distributed inverted-index result == per-pair ngram_jaccard over
    all pairs of a small slice of the real documents table."""
    import itertools

    import pyarrow.parquet as pq
    import ray.data as rd
    from ksoup_ray.functions.dedup import jaccard_pairs_exact, ngram_jaccard

    t = pq.read_table(f"{sf_dir}/documents.parquet",
                      columns=["doc_id", "text"]).slice(0, 120)
    ids = t.column("doc_id").to_pylist()
    texts = t.column("text").to_pylist()
    want = sorted(
        (min(a, b), max(a, b))
        for (a, ta), (b, tb) in itertools.combinations(zip(ids, texts), 2)
        if ngram_jaccard(ta or "", tb or "", 5) >= 0.5)

    got = _pairs_df(jaccard_pairs_exact(rd.from_arrow(t), shingle_size=5,
                                        threshold=0.5))
    assert got == want
    assert len(got) > 0, "slice should contain at least one near-dup pair"


def test_jaccard_max_df_guard_drops_hot_shingles(ray_session):
    import ray.data as rd
    from ksoup_ray.functions.dedup import jaccard_pairs_exact

    # every doc shares ONE hot 5-gram; identical docs 1/2 share all
    hot = "alpha beta gamma delta epsilon"
    docs = pa.table({
        "doc_id": pa.array(list(range(1, 7)), pa.int64()),
        "text": [f"{hot} unique{w} one two three four five six"
                 for w in range(1, 5)] + [f"{hot} same tail here",
                                          f"{hot} same tail here"]})
    ds = rd.from_arrow(docs)
    uncapped = _pairs_df(jaccard_pairs_exact(ds, threshold=0.9))
    assert uncapped == [(5, 6)]
    # the cap drops the df=6 hot shingle, costing docs 5/6 one of their
    # four shared shingles (J 1.0 → 0.6): the documented RECALL tradeoff
    capped = _pairs_df(jaccard_pairs_exact(ds, threshold=0.9, max_df=5))
    assert capped == []
    # at a threshold below the post-cap overlap the pair survives the cap
    capped_lo = _pairs_df(jaccard_pairs_exact(ds, threshold=0.5, max_df=5))
    assert capped_lo == [(5, 6)]


def test_cosine_near_dup_pairs_matches_bruteforce(ray_session, sf_dir):
    import pyarrow.parquet as pq
    import ray.data as rd
    from ksoup_ray.functions.dedup import cosine_near_dup_pairs

    t = pq.read_table(f"{sf_dir}/embeddings.parquet",
                      columns=["vec_id", "embedding"])
    v = np.array(t.column("embedding").to_pylist(), dtype=np.float64)
    ids = np.asarray(t.column("vec_id").to_pylist())
    u = v / np.linalg.norm(v, axis=1, keepdims=True)
    sims = u @ u.T
    ii, jj = np.where(np.triu(sims >= 0.465, k=1))
    want = sorted((int(min(ids[i], ids[j])), int(max(ids[i], ids[j])))
                  for i, j in zip(ii, jj))
    assert len(want) > 0

    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                         columns=["vec_id", "embedding"])
    got = _pairs_df(cosine_near_dup_pairs(ds, threshold=0.465, bits=2,
                                          num_tables=24))
    assert got == want


def test_cosine_near_dup_planted_duplicates(ray_session):
    """Planted exact + noisy duplicates are found; unrelated vectors are
    not (precision is exact — in-bucket similarity is true cosine)."""
    import ray.data as rd
    from ksoup_ray.functions.dedup import cosine_near_dup_pairs

    rng = np.random.RandomState(3)
    base = rng.standard_normal((40, 32))
    dup = base[5] + 0.01 * rng.standard_normal(32)     # near-exact dup of 5
    vecs = np.vstack([base, dup[None, :]])
    t = pa.table({"vec_id": pa.array(range(41), pa.int64()),
                  "embedding": pa.array([list(map(float, r)) for r in vecs],
                                        pa.list_(pa.float32()))})
    got = _pairs_df(cosine_near_dup_pairs(rd.from_arrow(t), threshold=0.95,
                                          bits=2, num_tables=24))
    assert got == [(5, 40)]


def test_minhasher_word_cache_bounded():
    """Worker memory must stay bounded at corpus scale: the vocabulary
    cache evicts when it exceeds its cap, without changing hashes."""
    import numpy as np
    from ksoup_ray.functions.dedup import MinHasher

    mh = MinHasher(num_hashes=8)
    mh._word_cache_max = 100
    for i in range(300):
        mh.shingle_hashes(f"word{i} filler{i} extra{i}")
    assert len(mh._word_cache) <= 101
    fresh = MinHasher(num_hashes=8)
    text = "alpha beta gamma delta epsilon"
    assert np.array_equal(mh.shingle_hashes(text),
                          fresh.shingle_hashes(text))
