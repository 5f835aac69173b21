"""PageRank (functions/graph.py): exact match against a from-scratch
power-iteration reference on a graph exercising fan-out, cycles and a
dangling node; rank-sum invariant; empty-graph edge case."""

import numpy as np
import pytest


ITERS = 8   # enough to differentiate ranks; keeps the 4-cpu suite fast


@pytest.fixture(scope="module")
def small_graph(ray_session):
    import ray.data as rd
    # 4 dangles (only inbound); 0,1,2 form a cycle; 3 is a root
    edges = [(0, 1), (0, 2), (1, 2), (2, 0), (3, 2), (2, 4)]
    return edges, rd.from_items(
        [{"src": s, "dst": d} for s, d in edges])


@pytest.fixture(scope="module")
def ranks(small_graph):
    from ksoup_ray.functions.graph import pagerank
    _, ds = small_graph
    return pagerank(ds, iters=ITERS).to_pandas() \
        .set_index("node")["rank"].sort_index()


def _naive(edges, iters, damping=0.85):
    nodes = sorted({x for e in edges for x in e})
    n = len(nodes)
    out = {u: [d for s, d in edges if s == u] for u in nodes}
    r = {u: 1.0 / n for u in nodes}
    for _ in range(iters):
        contrib = {u: 0.0 for u in nodes}
        dang = 0.0
        for u in nodes:
            if out[u]:
                for v in out[u]:
                    contrib[v] += r[u] / len(out[u])
            else:
                dang += r[u]
        r = {u: (1 - damping) / n + damping * (contrib[u] + dang / n)
             for u in nodes}
    return r


def test_pagerank_matches_reference(small_graph, ranks):
    edges, _ = small_graph
    got = ranks
    want = _naive(edges, ITERS)
    assert np.allclose([got[u] for u in sorted(want)],
                       [want[u] for u in sorted(want)], atol=1e-9)
    assert abs(got.sum() - 1.0) < 1e-9


def test_pagerank_root_below_cycle(ranks):
    """Structural sanity: the no-inbound root ranks lowest, the
    everyone-points-here hub ranks highest."""
    assert ranks.idxmin() == 3
    assert ranks.idxmax() == 2


def test_pagerank_empty(ray_session):
    import ray.data as rd
    import pyarrow as pa
    from ksoup_ray.functions.graph import pagerank
    empty = rd.from_arrow(pa.table({
        "src": pa.array([], pa.int64()),
        "dst": pa.array([], pa.int64())}))
    assert pagerank(empty, iters=2).count() == 0


def _naive_picos(edges, iters, pct=85, pico=10**12):
    nodes = sorted({x for e in edges for x in e})
    n = len(nodes)
    out = {u: [d for s, d in edges if s == u] for u in nodes}
    r = {u: pico // n for u in nodes}
    for _ in range(iters):
        contrib = {u: 0 for u in nodes}
        dang = 0
        for u in nodes:
            if out[u]:
                for v in out[u]:
                    contrib[v] += r[u] // len(out[u])
            else:
                dang += r[u]
        r = {u: ((100 - pct) * (pico // n)) // 100
             + (pct * (contrib[u] + dang // n)) // 100 for u in nodes}
    return r


def test_pagerank_picos_exact_integer_reference(small_graph):
    """pagerank_picos is EXACT int64 arithmetic — must equal the naive
    integer reference bit-for-bit (the property its SQL oracle needs),
    and multi-key buckets must not cross-talk (num_partitions=2)."""
    from ksoup_ray.functions.graph import pagerank_picos
    edges, ds = small_graph
    got = pagerank_picos(ds, iters=3, num_partitions=2).to_pandas() \
        .set_index("node")["rank_picos"].sort_index()
    want = _naive_picos(edges, 3)
    assert {u: int(got[u]) for u in sorted(want)} == want
