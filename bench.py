"""Benchmark driver — headline pipelines over $GRAFT_SF_DIR.

Prints ONE JSON line:
  {"metric": "...", "value": <headline sec>, "unit": "sec",
   "queries": {...}, "sf": ..., "num_cpus": N,
   "docs_per_sec": ..., "mb_per_sec": ...}

``--scaling`` runs the headline pipeline in two fresh processes
(RAY_GRAFT_CPUS=8 and =32) on the same input and reports both
throughputs + efficiency = (T8/T32)/4 — the sandbox stand-in for the
north rule's N vs 4N cluster-size criterion (BASELINE.md).

The bench corpus (FIXTURES.md size mix: 60% 2-20KB, 30% 20-200KB,
9% 200KB-1MB, 1% 1-2MB) is synthesized once per (sf, docs) and cached
as Parquet under /tmp/ksoup_bench — corpus generation is NOT timed;
one untimed read warms the page cache before measurement.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
BENCH_DOCS = int(os.environ.get("GRAFT_BENCH_DOCS", "20000"))
PAD_SCALE = int(os.environ.get("GRAFT_BENCH_PAD_SCALE", "3"))
CACHE_ROOT = os.environ.get("GRAFT_BENCH_CACHE", "/tmp/ksoup_bench")
# --scaling writes its pair-level evidence here; plain bench runs embed
# it into their JSON line so the per-round bench artifact carries it
SCALING_PATH = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "SCALING.json")


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def ensure_corpus(sf_dir: str, n_docs: int) -> str:
    """Synthesize (once) the padded bench corpus → cached parquet dir."""
    from ksoup_ray.sources.synth import SYNTH_VERSION
    key = (f"{os.path.basename(os.path.normpath(sf_dir))}_{n_docs}"
           f"_p{PAD_SCALE}_v{SYNTH_VERSION}")
    out = os.path.join(CACHE_ROOT, key)
    marker = os.path.join(out, "_DONE")
    if os.path.exists(marker):
        return out
    import ray.data as rd
    from ksoup_ray.sources.synth import render_batch

    log(f"bench: generating corpus {key} (not timed)")
    shutil.rmtree(out, ignore_errors=True)
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text", "lang"])
    if n_docs > 0:
        ds = ds.limit(n_docs)
    pages = ds.map_batches(
        lambda b: render_batch(b, pad_mix=True, pad_scale=PAD_SCALE),
        batch_format="pyarrow", batch_size=128)
    # many small files → natural read parallelism (real crawl shards
    # are thousands of files; one fat file would serialize the read)
    pages.repartition(64).write_parquet(out)
    with open(marker, "w") as fh:
        fh.write("ok")
    return out


def run_headline(corpus_dir: str, num_cpus: int) -> dict:
    import pyarrow.compute as pc
    import ray.data as rd
    from ksoup_ray.pipelines.extract import run_extraction

    out_dir = "/tmp/ksoup_bench_out"
    shutil.rmtree(out_dir, ignore_errors=True)

    # untimed warm read (page cache), also gives docs/bytes totals
    warm = rd.read_parquet(corpus_dir, columns=["url", "html"])
    total = warm.map_batches(
        lambda b: {"n": [b.num_rows],
                   "bytes": [pc.sum(pc.binary_length(b.column("html"))).as_py()]},
        batch_format="pyarrow").to_pandas()
    n_docs = int(total["n"].sum())
    n_bytes = int(total["bytes"].sum())

    # pools sized PROPORTIONALLY to the CPU budget (so the 4-vs-16
    # scaling comparison measures scaling, not a pool-size ratio), with
    # headroom for read/write tasks — a pool covering every CPU starves
    # the producers and the pipeline crawls (measured; see BASELINE.md).
    # The budget is clamped to the sandbox's measured deliverable
    # parallelism (~16 of the 32 advertised vCPUs sustain concurrent
    # compute — host overcommit; BASELINE.md "CPU capacity" note).
    workers_env = os.environ.get("GRAFT_SCALE_WORKERS")
    if workers_env:
        # scaling mode: a fixed worker budget (parse pools) with the
        # auxiliary stages (read/decode/repartition/write) on separate
        # slots — models N vs 4N worker nodes with a constant head-node
        # allowance (see BASELINE.md "scaling methodology")
        workers = int(workers_env)
    else:
        # default raised 16 -> 24 in round 5: after the parse-kernel
        # speedup (text() index frames + _fast_p_run stack hoisting)
        # each actor spends a larger share blocked on object-store /
        # Arrow work, so oversubscribing the ~16 deliverable cores
        # wins (measured: 16 actors 13.3s, 24 actors 10.2s, 28 9.1s
        # compute-only; 28+ starves the read/write tasks in the
        # end-to-end run, so 24 is the default)
        workers = min(num_cpus,
                      int(os.environ.get("GRAFT_MAX_WORKERS", "24")))
    # round 2: ONE parse pool gets the whole worker budget (the round-1
    # dual small/big pool split re-executed the read lineage twice and
    # needed per-size-class tuning; byte skew is now bounded by the
    # small row batch inside run_extraction)
    pool = max(1, workers)
    scaling_mode = bool(os.environ.get("GRAFT_SCALE_WORKERS"))
    t0 = time.time()
    # pruned scan: the headline pipeline needs exactly these three
    # columns — warc_ts/text/doc_id never leave storage
    ds = rd.read_parquet(corpus_dir, columns=["url", "html", "lang"])
    if scaling_mode:
        # scaling runs time the COMPUTE pipeline (read -> decode ->
        # parse -> extract), consumed without the Parquet sink: the
        # sandbox has ONE shared disk (~80 MB/s measured), a fixed
        # resource that cannot scale with workers by construction —
        # on a real N -> 4N cluster every node writes locally and the
        # sink scales with the cluster. The end-to-end single-size
        # number (plain `bench.py`) includes the write. (BASELINE.md)
        out = run_extraction(
            ds, out_dir, num_partitions=64, concurrency=pool,
            batch_size=16, resume=False, write=False)
        n_out = out.count()
        stats = {"rows": n_out}
    else:
        # streaming sink (min_rows_per_file bundling, no repartition
        # barrier): the write overlaps compute — measured 11.6s vs
        # 15.3s end-to-end against coalesce_output=16
        stats = run_extraction(
            ds, out_dir, num_partitions=64, concurrency=pool,
            batch_size=16, resume=False)
    wall = time.time() - t0
    return {
        "sec": wall,
        "docs": n_docs,
        "bytes": n_bytes,
        "docs_per_sec": n_docs / wall,
        "mb_per_sec": n_bytes / 1e6 / wall,
        "rows_out": stats["rows"],
    }


def run_secondary(sf_dir: str) -> dict:
    """Secondary operator timings (dedup / textstats / ann)."""
    import numpy as np
    import pyarrow.parquet as pq
    import ray.data as rd
    from ksoup_ray.functions.dedup import minhash_lsh_dedup
    from ksoup_ray.functions.similarity import brute_force_topk
    from ksoup_ray.functions.textstats import token_count_batch

    out = {}

    t0 = time.time()
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    n = ds.map_batches(token_count_batch, batch_format="pyarrow").count()
    out["token_count"] = time.time() - t0

    t0 = time.time()
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    minhash_lsh_dedup(ds, num_hashes=64, num_bands=8,
                      concurrency=(1, 8)).count()
    out["minhash_dedup"] = time.time() - t0

    t0 = time.time()
    qt = pq.read_table(f"{sf_dir}/embeddings.parquet",
                       columns=["vec_id", "embedding"])
    queries = np.array(qt.to_pandas().sort_values("vec_id").head(4)
                       ["embedding"].tolist(), dtype=np.float64)
    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                         columns=["vec_id", "embedding"])
    brute_force_topk(ds, queries, k=10, concurrency=(1, 8)).count()
    out["ann_topk"] = time.time() - t0

    t0 = time.time()
    from ksoup_ray.functions.dedup import simhash_pairs
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    simhash_pairs(ds, max_hamming=3, concurrency=(1, 8)).count()
    out["simhash_pairs"] = time.time() - t0

    t0 = time.time()
    from ksoup_ray.functions.curation import blocklist_match
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    blocklist_match(ds, patterns=["batch batch", "slow join",
                                  "window window", "spark", "dup",
                                  "merge part"]).count()
    out["blocklist"] = time.time() - t0

    t0 = time.time()
    from ksoup_ray.pipelines.curate import curate_documents
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text", "lang"])
    curate_documents(ds, langs=("en",), min_tokens=20,
                     max_tokens=90).count()
    out["curate"] = time.time() - t0
    return out


def bench_once() -> dict:
    import ray
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=NUM_CPUS,
                 include_dashboard=False, ignore_reinit_error=True,
                 logging_level="ERROR")
    from ray.data import DataContext
    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False

    corpus = ensure_corpus(SF_DIR, BENCH_DOCS)
    headline = run_headline(corpus, NUM_CPUS)
    secondary = {}
    if not os.environ.get("GRAFT_SKIP_SECONDARY"):
        secondary = run_secondary(SF_DIR)
    ray.shutdown()

    queries = {"extract": round(headline["sec"], 3)}
    queries.update({k: round(v, 3) for k, v in secondary.items()})
    out = {
        "metric": ("documents/sec (and HTML MB/sec) extracted "
                   "byte-identical on CC-style parquet shards"),
        "value": round(headline["sec"], 3),
        "unit": "sec",
        "queries": queries,
        "sf": os.path.basename(os.path.normpath(SF_DIR)),
        "num_cpus": NUM_CPUS,
        "docs": headline["docs"],
        "input_mb": round(headline["bytes"] / 1e6, 1),
        "docs_per_sec": round(headline["docs_per_sec"], 1),
        "mb_per_sec": round(headline["mb_per_sec"], 2),
    }
    # embed the most recent --scaling artifact (pair-level evidence for
    # the N -> 4N efficiency bar) so the per-round bench JSON carries
    # it; a scaling run is ~25 min and is re-run explicitly, not per
    # bench invocation. Skipped in scaling-mode subprocesses.
    if not os.environ.get("GRAFT_SCALE_WORKERS"):
        try:
            with open(SCALING_PATH) as fh:
                out["scaling"] = json.load(fh)
        except (OSError, ValueError):
            pass
    return out


def bench_scaling() -> dict:
    """Same job with 3 vs 12 extraction workers (N vs 4N) in fresh
    processes, each with a constant 4-slot auxiliary allowance for the
    read/decode/repartition/write stages.

    Why not plain num_cpus 8 vs 32: the sandbox advertises 32 vCPUs but
    sustains ~16 cores of concurrent compute (host overcommit, measured
    — BASELINE.md), and at low num_cpus the auxiliary stages run on
    host slack for free, deflating the ratio. Fixing the worker count
    and the auxiliary allowance makes the two runs differ in exactly
    one dimension — worker parallelism — which is what an N -> 4N
    node scale-out changes. (BASELINE.md "scaling methodology")"""
    results = {}
    LO = int(os.environ.get("GRAFT_SCALING_LO", "2"))
    HI = int(os.environ.get("GRAFT_SCALING_HI", "8"))
    REPEATS = int(os.environ.get("GRAFT_SCALING_REPEATS", "2"))
    # INTERLEAVED best-of-N: the sandbox host's deliverable per-core
    # throughput varies ~2x over tens of minutes (noisy neighbors,
    # measured — BASELINE.md §3). Interleaving lo/hi reps samples the
    # same weather for both levels; best-of estimates capability.
    for rep in range(REPEATS):
        for workers in (LO, HI):
            # aux (read/decode/repartition slots) scales WITH the
            # worker count: an N -> 4N node scale-out multiplies the
            # read parallelism too — a fixed aux would hand the low
            # config proportionally more ingest help and deflate the
            # ratio by construction
            aux = max(1, workers // 2)
            env = dict(os.environ, RAY_GRAFT_CPUS=str(workers + aux),
                       GRAFT_SCALE_WORKERS=str(workers),
                       GRAFT_SKIP_SECONDARY="1")
            log(f"bench --scaling: {workers} workers + {aux} aux "
                f"(rep {rep + 1}/{REPEATS})")
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__)], env=env,
                capture_output=True, text=True, check=True,
                cwd=os.path.dirname(os.path.abspath(__file__)))
            r = json.loads(proc.stdout.strip().splitlines()[-1])
            results.setdefault(workers, []).append(r)
    lo, hi = LO, HI
    # PAIRWISE efficiency: each interleaved rep pairs a lo and a hi run
    # sampled in the same weather window; the ratio must be computed
    # WITHIN a pair (best-of-each-side breaks the pairing: one lucky lo
    # run deflates the ratio even though nothing about scaling changed).
    # The headline statistic is the MEDIAN pair: host weather swings
    # individual pairs by ±0.2 (a throttled lo window can even push a
    # pair above 1.0), and the median is the estimate that neither
    # cherry-picks a lucky pair nor lets one bad window sink the run.
    pairs = [
        round((l["value"] / h["value"]) / (hi / lo), 3)
        for l, h in zip(results[lo], results[hi])
    ]
    order = sorted(range(len(pairs)), key=lambda i: pairs[i])
    best_i = order[len(order) // 2]          # median pair's rep
    l_best, h_best = results[lo][best_i], results[hi][best_i]
    result = {
        "metric": f"scaling efficiency ({lo} -> {hi} extraction workers "
                  "+ proportional aux, sandbox proxy for N -> 4N nodes; "
                  "pairwise over interleaved reps, median pair)",
        f"sec_{lo}": l_best["value"],
        f"sec_{hi}": h_best["value"],
        f"mb_per_sec_{lo}": l_best["mb_per_sec"],
        f"mb_per_sec_{hi}": h_best["mb_per_sec"],
        f"docs_per_sec_{lo}": l_best["docs_per_sec"],
        f"docs_per_sec_{hi}": h_best["docs_per_sec"],
        "scaling_efficiency": pairs[best_i],
        "pair_efficiencies": pairs,
        # pair-level evidence: every interleaved rep's raw seconds +
        # throughput at both levels, in run order, so the efficiency
        # math is re-derivable from this artifact alone
        "reps": [
            {"rep": i + 1,
             f"sec_{lo}": results[lo][i]["value"],
             f"sec_{hi}": results[hi][i]["value"],
             f"mb_per_sec_{lo}": results[lo][i]["mb_per_sec"],
             f"mb_per_sec_{hi}": results[hi][i]["mb_per_sec"],
             "pair_efficiency": pairs[i]}
            for i in range(len(pairs))
        ],
        "workers_lo": lo,
        "workers_hi": hi,
        "docs": h_best["docs"],
        "input_mb": h_best["input_mb"],
        "sf": h_best["sf"],
    }
    with open(SCALING_PATH, "w") as fh:
        json.dump(result, fh, indent=1)
    log(f"bench --scaling: wrote {SCALING_PATH}")
    return result


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        print(json.dumps(bench_scaling()))
    else:
        print(json.dumps(bench_once()))
