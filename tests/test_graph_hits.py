"""HITS (functions/graph.hits_ints): exact match against a
from-scratch unnormalized Kleinberg reference; structural sanity
(in-hub authority, out-hub hubness); roster completeness; empty graph;
and the self-kNN graph (functions/similarity.knn_graph) vs a numpy
brute-force reference with id tie-breaks."""

import numpy as np
import pytest


@pytest.fixture(scope="module")
def small_graph(ray_session):
    import ray.data as rd
    # 0 links to everything (pure hub); 4 is linked by many (pure
    # authority, no outlinks); 1-2 form a cycle; 3 isolated-ish
    edges = [(0, 1), (0, 2), (0, 4), (1, 2), (1, 4), (2, 1),
             (2, 4), (3, 4)]
    return edges, rd.from_items(
        [{"src": s, "dst": d} for s, d in edges])


def _naive_hits(edges, iters):
    nodes = sorted({x for e in edges for x in e})
    hub = {u: 1 for u in nodes}
    auth = {u: 0 for u in nodes}
    for _ in range(iters):
        auth = {v: sum(hub[s] for s, d in edges if d == v)
                for v in nodes}
        hub = {u: sum(auth[d] for s, d in edges if s == u)
               for u in nodes}
    return auth, hub


@pytest.mark.parametrize("iters", [1, 2, 3])
def test_hits_matches_reference(small_graph, iters):
    from ksoup_ray.functions.graph import hits_ints
    edges, ds = small_graph
    got = hits_ints(ds, iters=iters, num_partitions=3).to_pandas() \
        .set_index("node").sort_index()
    want_auth, want_hub = _naive_hits(edges, iters)
    assert list(got.index) == sorted(want_auth)
    assert got["auth"].tolist() == [want_auth[u] for u in got.index]
    assert got["hub"].tolist() == [want_hub[u] for u in got.index]


def test_hits_structure(small_graph):
    from ksoup_ray.functions.graph import hits_ints
    _, ds = small_graph
    got = hits_ints(ds, iters=2).to_pandas().set_index("node")
    # 4 has no outlinks -> zero hub; 0 has no inlinks -> zero auth
    assert got.loc[4, "hub"] == 0
    assert got.loc[0, "auth"] == 0
    # the everyone-points-here node is the top authority
    assert got["auth"].idxmax() == 4


def test_hits_empty(ray_session):
    import ray.data as rd
    from ksoup_ray.functions.graph import hits_ints
    ds = rd.from_items([{"src": 1, "dst": 2}]).filter(
        lambda r: False)
    assert hits_ints(ds, iters=2).count() == 0


def test_knn_graph_matches_bruteforce(ray_session):
    import ray.data as rd
    from ksoup_ray.functions.similarity import knn_graph
    rng = np.random.default_rng(7)
    n, d, k = 40, 8, 4
    mat = rng.normal(size=(n, d))
    ids = np.arange(100, 100 + n, dtype=np.int64)
    ds = rd.from_items([
        {"vec_id": int(i),
         "embedding": [float(x) for x in row.astype(np.float32)]}
        for i, row in zip(ids, mat)])
    # reference matrix must be the same float32-rounded values the
    # dataset carries
    mat32 = mat.astype(np.float32).astype(np.float64)
    got = knn_graph(ds, ids, mat32, k=k).to_pandas() \
        .sort_values(["vec_id", "rank"]).reset_index(drop=True)
    unit = mat32 / np.linalg.norm(mat32, axis=1, keepdims=True)
    sims = unit @ unit.T
    np.fill_diagonal(sims, -np.inf)
    for qi, qid in enumerate(ids):
        order = np.lexsort((ids, -sims[qi]))[:k]
        sub = got[got["vec_id"] == qid]
        assert sub["neighbor_id"].tolist() == ids[order].tolist()
        assert sub["rank"].tolist() == list(range(1, k + 1))


def test_knn_graph_k_capped(ray_session):
    """k larger than the corpus: every other vector returned, ranks
    dense from 1."""
    import ray.data as rd
    from ksoup_ray.functions.similarity import knn_graph
    rng = np.random.default_rng(3)
    mat = rng.normal(size=(3, 4))
    ids = np.arange(3, dtype=np.int64)
    ds = rd.from_items([
        {"vec_id": int(i),
         "embedding": [float(x) for x in row.astype(np.float32)]}
        for i, row in zip(ids, mat)])
    got = knn_graph(ds, ids, mat.astype(np.float32), k=10) \
        .to_pandas()
    assert len(got) == 6  # 3 rows x 2 neighbors each
    assert set(got["rank"]) == {1, 2}
    assert (got["vec_id"] != got["neighbor_id"]).all()
