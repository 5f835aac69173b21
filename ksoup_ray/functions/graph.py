"""Link-graph analytics over a crawl's edge list: distributed
PageRank (power iteration).

JOIN-FREE shape: Ray 2.49's hash-join operators reserve aggregator
CPUs up front (deadlock-prone when several joins share a small
cluster), so each iteration uses co-partitioning via
``groupby(key).map_groups`` instead — the same one-shuffle primitive
``sessionize`` uses:

  stage 1: union(ranks tagged R, edges tagged E) keyed on the SOURCE
           node → each group emits (dst, rank/out_degree) contribution
           rows; zero-out-degree nodes emit their whole rank to the
           DANGLING sentinel (-1);
  stage 2: union(contributions, node roster) keyed on the DEST node →
           native vectorized Sum (zero rows from the roster keep
           absent-inbound nodes in the output) — no per-group Python;
  stage 3: pure map: rank' = (1-d)/N + d*(sum + dangling/N).

Cost honesty: stage 1's ``map_groups`` invokes Python once per SOURCE
node per iteration (each call is O(out_degree) numpy). At 10^12 nodes
that per-group dispatch is the dominant constant; on a large cluster
swap stage 1 for a hash join of edges against (rank/deg) — vectorized,
but Ray 2.49's join aggregators reserve CPUs up front, which deadlocks
the small-cluster/test regime this default must also run in.

Ranks are a corpus-scale Dataset MATERIALIZED once per iteration (one
row per node — the object store spills; the driver only ever holds N
and the dangling scalar). Iterative → no SQL oracle (rows-only driver
check); pinned by pytest against a from-scratch reference
implementation and the rank-sum≈1 invariant.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

_DANGLING = -1


def pagerank(edges, *, iters: int = 10, damping: float = 0.85,
             src_col: str = "src", dst_col: str = "dst"):
    """PageRank over an (src, dst) edge Dataset. Returns a Dataset of
    ``(node, rank)`` (float64, sums to ~1). Duplicate edges count with
    multiplicity, matching the textbook definition on multigraphs."""
    import ray.data as rd

    def node_partials(batch: pa.Table) -> pa.Table:
        u = np.union1d(batch.column(src_col).to_numpy(),
                       batch.column(dst_col).to_numpy())
        return pa.table({"node": pa.array(u, pa.int64())})

    nodes = edges.map_batches(node_partials, batch_format="pyarrow") \
        .groupby("node").count().drop_columns(["count()"]) \
        .materialize()
    n = nodes.count()
    if n == 0:
        return nodes.map_batches(
            lambda b: b.append_column("rank",
                                      pa.array([], pa.float64())),
            batch_format="pyarrow")

    ranks = nodes.map_batches(
        lambda b: b.append_column(
            "rank", pa.array(np.full(b.num_rows, 1.0 / n), pa.float64())),
        batch_format="pyarrow").materialize()

    def tag_ranks(batch: pa.Table) -> pa.Table:
        return pa.table({
            "key": batch.column("node"),
            "dst": pa.array(np.full(batch.num_rows, 0, np.int64)),
            "val": batch.column("rank"),
            "is_rank": pa.array(np.ones(batch.num_rows, np.int8)),
        })

    def tag_edges(batch: pa.Table) -> pa.Table:
        nrows = batch.num_rows
        return pa.table({
            "key": batch.column(src_col).cast(pa.int64()),
            "dst": batch.column(dst_col).cast(pa.int64()),
            "val": pa.array(np.zeros(nrows, np.float64)),
            "is_rank": pa.array(np.zeros(nrows, np.int8)),
        })

    def spread(group: pd.DataFrame) -> pd.DataFrame:
        is_rank = group["is_rank"].to_numpy() == 1
        r = float(group["val"].to_numpy()[is_rank][0])
        dsts = group["dst"].to_numpy()[~is_rank]
        deg = len(dsts)
        if deg == 0:
            return pd.DataFrame({"dst": np.array([_DANGLING], np.int64),
                                 "contrib": np.array([r])})
        return pd.DataFrame({"dst": dsts.astype(np.int64),
                             "contrib": np.full(deg, r / deg)})

    def tag_contribs(batch: pa.Table) -> pa.Table:
        return pa.table({
            "key": batch.column("dst"),
            "contrib": batch.column("contrib"),
        })

    def tag_nodes(batch: pa.Table) -> pa.Table:
        return pa.table({
            "key": batch.column("node"),
            "contrib": pa.array(np.zeros(batch.num_rows, np.float64)),
        })

    for _ in range(iters):
        from ray.data.aggregate import Sum
        tagged = ranks.map_batches(tag_ranks, batch_format="pyarrow") \
            .union(edges.map_batches(tag_edges, batch_format="pyarrow"))
        contribs = tagged.groupby("key").map_groups(
            spread, batch_format="pandas")
        # stage 2 is a plain sum per dest — native vectorized hash
        # aggregate, NO per-group Python (the zero rows from the node
        # roster guarantee every node appears in the output)
        folded = contribs.map_batches(tag_contribs,
                                      batch_format="pyarrow") \
            .union(nodes.map_batches(tag_nodes, batch_format="pyarrow")) \
            .groupby("key").aggregate(Sum("contrib", alias_name="s")) \
            .map_batches(lambda b: pa.table(
                {"node": b.column("key"), "s": b.column("s")}),
                batch_format="pyarrow") \
            .materialize()
        # the sentinel group carries the total dangling mass; real
        # nodes never use id -1 (crawl doc_ids are non-negative)
        drow = folded.filter(expr="node == -1").take_all()
        dangling = drow[0]["s"] if drow else 0.0

        def update(batch: pa.Table, _dang=dangling) -> pa.Table:
            node = batch.column("node").to_numpy()
            s = batch.column("s").to_numpy(zero_copy_only=False)
            keep = node != _DANGLING
            rank = (1.0 - damping) / n + damping * (s + _dang / n)
            return pa.table({
                "node": pa.array(node[keep], pa.int64()),
                "rank": pa.array(rank[keep], pa.float64()),
            })

        # `folded` is already materialized; `update` is a cheap pure
        # map, so ranks stays lazy over it (one less copy per round)
        ranks = folded.map_batches(update, batch_format="pyarrow")

    return ranks
