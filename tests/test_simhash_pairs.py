"""Exact Hamming<=k SimHash pair mining via 4x16-bit pigeonhole
blocking (functions/dedup.simhash_pairs): the blocked distributed
result must equal an O(n^2) brute force over the same signatures —
100% recall is the whole point of the pigeonhole vs MinHash banding."""

import itertools

import numpy as np
import pyarrow as pa


def _pairs(ds):
    df = ds.to_pandas()
    if df.empty:
        return []
    return sorted(map(tuple,
                      df[["id_a", "id_b", "hamming"]].to_numpy().tolist()))


def test_popcount64_matches_python():
    from ksoup_ray.functions.dedup import _popcount64
    rng = np.random.RandomState(3)
    x = rng.randint(0, 2 ** 63, 2000, dtype=np.int64).astype(np.uint64)
    x[0] = np.uint64(0)
    x[1] = np.uint64(0xFFFFFFFFFFFFFFFF)
    want = np.array([bin(int(v)).count("1") for v in x])
    assert (_popcount64(x) == want).all()


def test_simhash_pairs_matches_bruteforce(ray_session, sf_dir):
    import pyarrow.parquet as pq
    import ray.data as rd
    from ksoup_ray.functions.dedup import SimHasher, simhash_pairs

    t = pq.read_table(f"{sf_dir}/documents.parquet",
                      columns=["doc_id", "text"]).slice(0, 200)
    hasher = SimHasher()
    sigs = {i: hasher.simhash(x or "")
            for i, x in zip(t.column("doc_id").to_pylist(),
                            t.column("text").to_pylist())}
    want = sorted(
        (min(a, b), max(a, b), bin(sigs[a] ^ sigs[b]).count("1"))
        for a, b in itertools.combinations(sigs, 2)
        if bin(sigs[a] ^ sigs[b]).count("1") <= 3)

    got = _pairs(simhash_pairs(rd.from_arrow(t), max_hamming=3))
    assert got == want
    assert len(got) > 0, "slice should contain at least one near pair"


def test_simhash_pairs_planted_and_ownership(ray_session):
    """Two docs one word apart are within 3 bits; identical docs are at
    0; a pair agreeing on several blocks is emitted exactly once."""
    import ray.data as rd
    from ksoup_ray.functions.dedup import simhash_pairs

    base = " ".join(f"w{i}" for i in range(60))
    near = base + " tail"
    t = pa.table({
        "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
        "text": [base, near, base, "zz qq jj totally other words"],
    })
    got = _pairs(simhash_pairs(rd.from_arrow(t), max_hamming=3))
    assert (1, 3, 0) in got                       # identical -> 0 bits
    assert len(got) == len(set((a, b) for a, b, _ in got)), \
        "a pair must be emitted by exactly one block"
    for a, b, h in got:
        assert 0 <= h <= 3


def test_dhash_pairs_matches_bruteforce(ray_session):
    """hamming_pairs over image dHash signatures (the signature-
    agnostic reuse): distributed pigeonhole == O(n^2) brute force over
    the same decoded perceptual hashes, and the variant corpus
    actually CONTAINS near pairs."""
    import ray.data as rd
    from ksoup_ray.functions.dedup import hamming_pairs
    from ksoup_ray.functions.multimodal import (decode_image, dhash64,
                                                synth_variant_images)

    t = pa.table({"doc_id": pa.array(list(range(80)), pa.int64())})
    media = synth_variant_images(t)
    sigs = {}
    for mid, payload in zip(media.column("media_id").to_pylist(),
                            media.column("media").to_pylist()):
        # variant corpus mixes PPM and PNG encodings of the
        # same pixels — decode through the magic-byte dispatch
        sigs[mid] = dhash64(decode_image(payload))
    want = sorted(
        (a, b, bin(sigs[a] ^ sigs[b]).count("1"))
        for a in sigs for b in sigs
        if a < b and bin(sigs[a] ^ sigs[b]).count("1") <= 3)

    sig_tbl = pa.table({
        "media_id": pa.array(list(sigs), pa.int64()),
        "sig": pa.array([np.uint64(v) for v in sigs.values()],
                        pa.uint64())})
    got = hamming_pairs(rd.from_arrow(sig_tbl), sig_col="sig",
                        id_col="media_id", max_hamming=3).to_pandas()
    got_t = sorted(map(tuple,
                       got[["id_a", "id_b", "hamming"]].to_numpy()))
    assert got_t == want
    assert len(want) > 0


def test_simhash_components_transitive_closure(ray_session):
    """pairs→components composition: A~B and B~C at <=3 bits each puts
    A,B,C in one cluster even when A and C are >3 bits apart."""
    import ray.data as rd
    from ksoup_ray.functions.dedup import (connected_components,
                                           simhash_pairs)

    base = " ".join(f"w{i}" for i in range(80))
    t = pa.table({
        "doc_id": pa.array([1, 2, 3, 9], pa.int64()),
        "text": [base, base, base, "qq zz entirely unrelated doc"],
    })
    pairs = simhash_pairs(rd.from_arrow(t), max_hamming=3) \
        .select_columns(["id_a", "id_b"])
    comp = connected_components(pairs).to_pandas()
    labels = dict(zip(comp["node_id"], comp["component_id"]))
    assert labels[1] == labels[2] == labels[3] == 1
    assert 9 not in labels  # isolated doc never enters the pair graph


def test_simhash_pairs_cap_recorded(ray_session):
    """A degenerate block value (many identical signatures) trips the
    cap and the trip is counted on the metrics actor, never silent."""
    import ray.data as rd
    from ksoup_ray.functions.dedup import simhash_pairs
    from ksoup_ray.functions.metrics import read_cap_metrics

    t = pa.table({
        "doc_id": pa.array(list(range(30)), pa.int64()),
        "text": ["same doc body here"] * 30,
    })
    got = _pairs(simhash_pairs(rd.from_arrow(t), max_hamming=3,
                               max_block_group=10))
    m = read_cap_metrics()
    assert m.get("simhash_pairs.capped_blocks", 0) >= 1
    assert m.get("simhash_pairs.dropped_rows", 0) >= 1
    # capped kernel still yields only pairs among the 10 smallest ids
    kept = {i for a, b, _ in got for i in (a, b)}
    assert kept == set(range(10))
