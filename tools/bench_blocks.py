"""Before/after harness for the round-4 per-block dispatch rewrite
(BASELINE.md §2e): times sessionize / asof_join / unigram_logprob /
pagerank over $GRAFT_SF_DIR (default sf0.1), plus — with
``GRAFT_HICARD=1`` — a synthetic 450k-row / 150k-distinct-user case,
the cardinality regime where per-key ``map_groups`` dispatch is the
bottleneck (measured 40 s → 0.37 s for sessionize).

Usage: ``python tools/bench_blocks.py <repo-root>`` — point the root
at a worktree of an older commit to reproduce the "before" column.
Owns its own Ray session (never imported by the driver).
"""

import json
import os
import sys
import time

root = sys.argv[1] if len(sys.argv) > 1 else "/root/repo"
sys.path.insert(0, root)
os.chdir(root)

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray

ray.init(address="local", num_cpus=32, include_dashboard=False,
         logging_level="ERROR")
from ray.data import DataContext
DataContext.get_current().enable_progress_bars = False
import ray.data as rd

SF = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
out = {}

from ksoup_ray.functions.agg import sessionize
t0 = time.time()
ds = rd.read_parquet(f"{SF}/events.parquet", columns=["user_id", "ts"])
n = sessionize(ds, gap_seconds=1800).count()
out["sessionize"] = round(time.time() - t0, 2)
out["sessionize_rows"] = n

from ksoup_ray.functions.joins import asof_join
t0 = time.time()
ev = rd.read_parquet(f"{SF}/events.parquet",
                     columns=["event_id", "user_id", "ts",
                              "event_type", "value"])
clicks = ev.map_batches(
    lambda b: b.filter(pc.equal(b.column("event_type"), "click")),
    batch_format="pyarrow")
purch = ev.map_batches(
    lambda b: b.filter(pc.equal(b.column("event_type"), "purchase")),
    batch_format="pyarrow")
n = asof_join(clicks, purch).count()
out["asof_join"] = round(time.time() - t0, 2)
out["asof_rows"] = n

from ksoup_ray.functions.curation import unigram_logprob
t0 = time.time()
docs = rd.read_parquet(f"{SF}/documents.parquet",
                       columns=["doc_id", "text"])
unigram_logprob(docs).count()
out["unigram_logprob"] = round(time.time() - t0, 2)

from ksoup_ray.functions.graph import pagerank
t0 = time.time()
docs = rd.read_parquet(f"{SF}/documents.parquet", columns=["doc_id"])


def edges(b):
    ids = b.column("doc_id").to_numpy()
    k = (ids % 4).astype(np.int64)
    src = np.repeat(ids, k)
    offs = (np.concatenate([np.arange(x) for x in k])
            if len(k) else np.array([], dtype=np.int64))
    dst = (src + offs + 1) % 100000000
    return pa.table({"src": pa.array(src, pa.int64()),
                     "dst": pa.array(dst, pa.int64())})


e = docs.map_batches(edges, batch_format="pyarrow")
pagerank(e, iters=2).count()
out["pagerank_2rounds"] = round(time.time() - t0, 2)
print(json.dumps(out))

# --- high-cardinality synthetic case (the shape that shows the
# per-key-dispatch asymptote): 450k rows over 150k distinct users ---
if os.environ.get("GRAFT_HICARD"):
    rng = np.random.default_rng(11)
    N_USERS, ROWS = 150_000, 450_000
    users = np.repeat(np.arange(N_USERS, dtype=np.int64),
                      ROWS // N_USERS)
    ts2 = (np.datetime64("2024-01-01", "us")
           + rng.integers(0, 10**10, len(users))
           .astype("timedelta64[us]"))
    t = pa.table({"user_id": pa.array(users, pa.int64()),
                  "ts": pa.array(ts2)})
    hds = rd.from_arrow(t).repartition(32).materialize()
    t0 = time.time()
    out2 = {"sessionize_150k_users_rows":
            sessionize(hds, gap_seconds=1800).count()}
    out2["sessionize_150k_users"] = round(time.time() - t0, 2)
    ev2 = pa.table({
        "event_id": pa.array(np.arange(len(users), dtype=np.int64)),
        "user_id": pa.array(users, pa.int64()),
        "ts": pa.array(ts2),
        "value": pa.array(rng.random(len(users))),
    })
    left = rd.from_arrow(ev2).repartition(32).materialize()
    right = rd.from_arrow(ev2).repartition(32).materialize()
    t0 = time.time()
    asof_join(left, right).count()
    out2["asof_150k_users"] = round(time.time() - t0, 2)
    print(json.dumps(out2))

ray.shutdown()
