"""Generalized resumable partitioned sink — the output contract every
pipeline here shares (extraction established it; curation and any
derived dataset reuse it through this module):

* hive-partitioned Parquet under ``out_dir/data/partition_id=NN/``
  with ``partition_id = key % num_partitions`` (int keys) assigned
  vectorized at write time;
* one lineage JSON per finished partition under ``out_dir/_lineage/``
  — rows + wall-clock, derived from ONE distributed column-pruned scan
  of what was actually written (footer-free, retry-safe);
* resume: a rerun drops rows of partitions whose lineage exists, so a
  failed job continues from the unfinished partitions only.

Never one giant file; never a driver-side data read.
"""

from __future__ import annotations

import json
import os
import time

import pyarrow as pa
import pyarrow.compute as pc

DATA_DIR = "data"
LINEAGE_DIR = "_lineage"
METRICS_FILE = "_metrics.json"


def snapshot_drop_metrics(lin_dir: str) -> dict:
    """Persist the session's cap/drop counters (functions/metrics.py —
    LSH bucket caps, max_df drops, truncated records, bad filenames)
    into ``<lin_dir>/_metrics.json`` so the RUN ARTIFACT carries what
    was dropped, not just a transient actor. Counters are
    session-cumulative and advisory (task retries may re-increment);
    the file answers "did any cap trip during this job, and roughly
    how hard". Returns the snapshot (empty dict when nothing ever
    tripped — the file is still written so its absence is
    distinguishable from an unfinished run)."""
    try:
        from ..functions.metrics import read_cap_metrics
        metrics = read_cap_metrics()
    except Exception:       # no Ray session (unit contexts) — empty
        metrics = {}
    os.makedirs(lin_dir, exist_ok=True)
    tmp = os.path.join(lin_dir, "." + METRICS_FILE)
    with open(tmp, "w") as fh:
        json.dump({"drop_metrics": metrics}, fh)
    os.replace(tmp, os.path.join(lin_dir, METRICS_FILE))
    return metrics


def list_done_partitions(out_dir: str) -> set[int]:
    lin = os.path.join(out_dir, LINEAGE_DIR)
    if not os.path.isdir(lin):
        return set()
    done = set()
    for name in os.listdir(lin):
        if name.endswith(".json"):
            try:
                done.add(int(name[:-5]))
            except ValueError:
                pass
    return done


def clear_stale_partitions(out_dir: str, done: set[int]) -> int:
    """Delete every ``data/partition_id=NN`` dir NOT in the done set.

    The crash-window guarantee: ``write_parquet`` APPENDS files, so a
    rerun must not write alongside leftovers of an interrupted write —
    a partition dir without its lineage JSON (crash mid-write) or a
    full dir whose lineage never landed (crash between write and
    lineage) would otherwise double its rows SILENTLY (the lineage
    scan would faithfully count the duplicates). Lineage is the commit
    record: no lineage ⇒ the partition is re-done from scratch.
    Returns the number of directories cleared."""
    import shutil
    data_dir = os.path.join(out_dir, DATA_DIR)
    if not os.path.isdir(data_dir):
        return 0
    cleared = 0
    for name in os.listdir(data_dir):
        if not name.startswith("partition_id="):
            continue
        try:
            pid = int(name.split("=", 1)[1])
        except ValueError:
            continue
        if pid not in done:
            shutil.rmtree(os.path.join(data_dir, name),
                          ignore_errors=True)
            cleared += 1
    return cleared


def write_partitioned(ds, out_dir: str, *, key_col: str,
                      num_partitions: int = 64, resume: bool = True,
                      coalesce_output: int | None = None) -> dict:
    """Write ``ds`` hive-partitioned by ``key_col % num_partitions``
    with per-partition lineage; skips partitions already completed by
    a previous run. Returns ``{partitions, rows, wall_ms, resumed}``.
    """
    t0 = time.time()
    done = list_done_partitions(out_dir) if resume else set()
    # partition dirs without a lineage record are uncommitted leftovers
    # of a crashed run — clear them so the append-only write below
    # cannot duplicate their rows (with resume=False this clears ALL
    # prior data: a non-resuming rerun is a full overwrite, not an
    # append)
    clear_stale_partitions(out_dir, done)

    def assign(batch: pa.Table) -> pa.Table:
        import numpy as np
        keys = batch.column(key_col).cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        pid = ((keys & ((1 << 62) - 1)) % num_partitions) \
            .astype(np.int32)
        if "partition_id" in batch.column_names:
            batch = batch.drop_columns(["partition_id"])
        return batch.append_column("partition_id",
                                   pa.array(pid, pa.int32()))

    out = ds.map_batches(assign, batch_format="pyarrow")
    if done:
        done_arr = pa.array(sorted(done), pa.int32())

        def not_done(batch: pa.Table) -> pa.Table:
            return batch.filter(pc.invert(pc.is_in(
                batch.column("partition_id"), value_set=done_arr)))

        out = out.map_batches(not_done, batch_format="pyarrow")

    if coalesce_output:
        out = out.repartition(coalesce_output)
    data_dir = os.path.join(out_dir, DATA_DIR)
    out.write_parquet(data_dir, partition_cols=["partition_id"])

    # lineage: per-partition row counts from one distributed pruned
    # scan of the written data (only the partition key column leaves
    # the workers; the driver folds <= num_partitions tiny rows)
    import ray.data as rd
    lin_dir = os.path.join(out_dir, LINEAGE_DIR)
    os.makedirs(lin_dir, exist_ok=True)
    rows_by_pid: dict[int, int] = {}
    if os.path.isdir(data_dir):
        def partial(batch: pa.Table) -> pa.Table:
            g = batch.group_by("partition_id").aggregate(
                [("partition_id", "count")])
            return pa.table({
                "pid": g.column("partition_id").cast(pa.int64()),
                "rows": g.column("partition_id_count").cast(pa.int64()),
            })

        scan = rd.read_parquet(data_dir, columns=["partition_id"]) \
            .map_batches(partial, batch_format="pyarrow")
        for b in scan.iter_batches(batch_format="pyarrow"):
            for pid, n in zip(b.column("pid").to_pylist(),
                              b.column("rows").to_pylist()):
                rows_by_pid[int(pid)] = rows_by_pid.get(int(pid), 0) \
                    + int(n)

    wall_ms = int((time.time() - t0) * 1000)
    total = 0
    for pid, n in sorted(rows_by_pid.items()):
        total += n
        tmp = os.path.join(lin_dir, f".{pid}.json")
        with open(tmp, "w") as f:
            json.dump({"partition_id": pid, "rows": n,
                       "wall_ms": wall_ms}, f)
        os.replace(tmp, os.path.join(lin_dir, f"{pid}.json"))
    drop_metrics = snapshot_drop_metrics(lin_dir)
    return {"partitions": len(rows_by_pid), "rows": total,
            "wall_ms": wall_ms, "resumed": sorted(done),
            "drop_metrics": drop_metrics}
