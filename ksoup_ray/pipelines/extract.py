"""The flagship extraction pipeline: read → parse/extract → partitioned
write, with per-partition lineage and checkpoint resume.

North-rule obligations implemented here (SURVEY.md §4):

* deterministic ``partition_id = crc32(url) % P`` assigned at ingest —
  the checkpoint/resume granularity;
* resume: partitions that already have a lineage record are filtered
  out at the start of the run (vectorized mask, no parse work);
* skew: ``doc_bytes`` computed vectorized (`pc.binary_length`); the
  parse stage runs ONE actor pool with a SMALL row batch (default 16)
  so a megabyte page bounds at most a 16-row batch's latency — the
  dynamic scheduler keeps every actor fed from the shared batch queue.
  (A dedicated big-doc pool was measured in round 1 to starve whichever
  side was under-provisioned, and its dual filter branches executed the
  ReadParquet lineage TWICE — one pool + small batches wins on both);
* output: ``out_dir/data/partition_id=N/...parquet`` (one dir per
  partition — resumable, never one giant file) + ``out_dir/_lineage/
  N.json`` (rows, bytes, errors, wall ms, engine version);
* lineage is derived from the written output: row counts from Parquet
  footers (metadata only), byte/error sums from one DISTRIBUTED
  column-pruned aggregate over the two int64 stat columns — no second
  execution of the pipeline and zero driver-side data decoding.

The whole flow is streaming: one pass over the input, blocks flow
through the object store with backpressure; nothing is materialized.
"""

from __future__ import annotations

import json
import os
import time

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from ..stages.extract import DEFAULT_STRIP, ParseExtract
from .. import __version__

LINEAGE_DIR = "_lineage"
DATA_DIR = "data"


def _list_done_partitions(out_dir: str) -> set[int]:
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


def _add_ingest_columns(num_partitions: int):
    """Vectorized pre-stage: doc_bytes + partition_id (stateless
    tasks). partition_id = crc32(url) % P via the byte-position-walk
    CRC kernel (functions/_blocks.py) — bit-identical to zlib.crc32,
    so resume lineage from runs of the per-row version stays valid,
    with zero per-row Python on the ingest path."""
    from ..functions._blocks import crc32_of_strings

    def fn(batch: pa.Table) -> pa.Table:
        import numpy as np
        if "doc_bytes" not in batch.column_names:
            batch = batch.append_column(
                "doc_bytes",
                pc.cast(pc.binary_length(batch.column("html")), pa.int64()))
        crcs = crc32_of_strings(batch.column("url"))
        pids = pa.array((crcs % num_partitions).astype(np.int32),
                        pa.int32())
        if "partition_id" in batch.column_names:
            batch = batch.drop_columns(["partition_id"])
        # drop the parquet footer's pandas metadata: a schema carrying
        # a metadata dict is unhashable, which defeats Ray's
        # schema-dedup fast path downstream (one warning per worker)
        return batch.append_column("partition_id", pids) \
            .replace_schema_metadata(None)

    return fn


def run_extraction(
    ds,
    out_dir: str,
    *,
    num_partitions: int = 64,
    concurrency=(2, 8),
    batch_size: int = 16,
    big_doc_bytes: int = 2 * 1024 * 1024,
    resume: bool = True,
    strip: str = DEFAULT_STRIP,
    write: bool = True,
    coalesce_output: int | None = None,
    min_rows_per_file: int = 256,
):
    """Run extraction over a CC-page Dataset.

    Returns the output Dataset when ``write=False`` (caller consumes),
    else writes partitioned Parquet + lineage and returns stats dict.
    """
    t_start = time.time()
    done = _list_done_partitions(out_dir) if (resume and write) else set()
    if write:
        # lineage is the commit record: partition dirs without one are
        # uncommitted leftovers of a crashed run — clear them BEFORE the
        # (append-only) write so a rerun can't silently duplicate rows
        # (same semantics as pipelines/sink.clear_stale_partitions)
        from .sink import clear_stale_partitions
        clear_stale_partitions(out_dir, done)

    # batch_size=None: process whole blocks (vectorized CRC doesn't
    # need rebatching) — and since fn strips the parquet footer's
    # pandas metadata, no metadata-carrying schema ever reaches a
    # downstream concat (an unhashable schema defeats Ray's
    # schema-dedup fast path with a warning per worker)
    ds = ds.map_batches(_add_ingest_columns(num_partitions),
                        batch_format="pyarrow", batch_size=None)

    if done:
        done_arr = list(done)

        def not_done(batch: pa.Table) -> pa.Table:
            mask = pc.invert(pc.is_in(batch.column("partition_id"),
                                      value_set=pa.array(done_arr,
                                                         pa.int32())))
            return batch.filter(mask)

        ds = ds.map_batches(not_done, batch_format="pyarrow")

    make_actor_kwargs = dict(strip=strip, num_partitions=num_partitions,
                             big_doc_bytes=big_doc_bytes)

    # SINGLE scan, SINGLE pool: the ingest stage fuses with the parse
    # actors, so the execution plan has exactly one ReadParquet over the
    # input. Byte skew is bounded by the small row batch: one oversized
    # page delays at most (batch_size-1) siblings, and the streaming
    # scheduler keeps the other actors fed — no pool to mis-size.
    out = ds.map_batches(
        ParseExtract, fn_constructor_kwargs=make_actor_kwargs,
        batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency, num_cpus=1)

    if not write:
        return out

    data_dir = os.path.join(out_dir, DATA_DIR)
    if coalesce_output:
        # exact block count via an all-to-all — only when the caller
        # asks for it: the barrier serializes the whole write behind
        # the slowest compute task (measured +3.7s on the 5k-doc
        # bench vs the streaming default below)
        out = out.repartition(coalesce_output)
    # STREAMING write: min_rows_per_file bundles small output blocks
    # into write tasks WITHOUT a repartition barrier, so the sink
    # overlaps compute (measured 11.6s vs 15.3s end-to-end on the
    # 5k-doc bench). zstd: 35% fewer bytes than snappy on extracted
    # text/links/spans and faster wall-clock on the shared disk — at
    # 100 TB the sink is disk/network-bound, so smaller wins twice.
    out.write_parquet(data_dir, partition_cols=["partition_id"],
                      compression="zstd",
                      min_rows_per_file=min_rows_per_file)
    wall_ms = int((time.time() - t_start) * 1000)
    stats = write_lineage(out_dir, wall_ms)
    return stats


def write_lineage(out_dir: str, wall_ms: int) -> dict:
    """Derive per-partition lineage WITHOUT driver-side data reads.

    Per-partition rows / ``doc_bytes`` / ``parse_errors`` sums come
    from ONE distributed column-pruned scan of the written output (two
    int64 stat columns + the hive partition key; RLE/delta-encoded):
    each WORKER block collapses to per-partition partial sums
    (``pa.Table.group_by`` inside ``map_batches`` — no all-to-all; a
    hash aggregate costs seconds of fixed shuffle overhead for a table
    this shape) and the driver folds the tiny partials (O(blocks ×
    partitions-per-block) rows of 4 ints). Exact and retry-safe
    (derived from what was actually written, not from in-flight actor
    counters); the driver touches only directory listings and the
    partial-sum rows — never a data column, never a per-file footer
    (opening 10^3+ footers driver-side measured ~1.5 s at bench scale
    and grows with file count)."""
    import ray.data as rd

    data_dir = os.path.join(out_dir, DATA_DIR)
    lin_dir = os.path.join(out_dir, LINEAGE_DIR)
    os.makedirs(lin_dir, exist_ok=True)

    files_by_pid: dict[int, list[str]] = {}
    for name in sorted(os.listdir(data_dir)):
        if not name.startswith("partition_id="):
            continue
        pid = int(name.split("=", 1)[1])
        pdir = os.path.join(data_dir, name)
        files_by_pid[pid] = [f for f in sorted(os.listdir(pdir))
                             if f.endswith(".parquet")]

    stats_by_pid: dict[int, list[int]] = {}
    if files_by_pid:
        def partial_stats(batch: pa.Table) -> pa.Table:
            g = batch.group_by("partition_id").aggregate(
                [("doc_bytes", "sum"), ("parse_errors", "sum"),
                 ("partition_id", "count")])
            return pa.table({
                "pid": g.column("partition_id").cast(pa.int64()),
                "rows": g.column("partition_id_count"),
                "doc_bytes": g.column("doc_bytes_sum"),
                "parse_errors": g.column("parse_errors_sum"),
            })

        partials = rd.read_parquet(
            data_dir,
            columns=["doc_bytes", "parse_errors", "partition_id"]) \
            .map_batches(partial_stats, batch_format="pyarrow")
        for b in partials.iter_batches(batch_format="pyarrow"):
            for pid, rows, dbytes, errs in zip(
                    b.column("pid").to_pylist(),
                    b.column("rows").to_pylist(),
                    b.column("doc_bytes").to_pylist(),
                    b.column("parse_errors").to_pylist()):
                acc = stats_by_pid.setdefault(int(pid), [0, 0, 0])
                acc[0] += int(rows)
                acc[1] += int(dbytes or 0)
                acc[2] += int(errs or 0)

    total_rows = total_bytes = total_errors = n_parts = 0
    for pid, files in files_by_pid.items():
        rows, doc_bytes, errors = stats_by_pid.get(pid, (0, 0, 0))
        lineage = {
            "partition_id": pid,
            "rows": rows,
            "doc_bytes": doc_bytes,
            "parse_errors": errors,
            "files": files,
            "wall_ms": wall_ms,
            "engine_version": __version__,
        }
        tmp = os.path.join(lin_dir, f".{pid}.json.tmp")
        with open(tmp, "w") as fh:
            json.dump(lineage, fh)
        os.replace(tmp, os.path.join(lin_dir, f"{pid}.json"))
        total_rows += rows
        total_bytes += doc_bytes
        total_errors += errors
        n_parts += 1
    # cap/drop counters (no-silent-caps rule) land in the run artifact
    from .sink import snapshot_drop_metrics
    drop_metrics = snapshot_drop_metrics(lin_dir)
    return {"partitions": n_parts, "rows": total_rows,
            "doc_bytes": total_bytes, "parse_errors": total_errors,
            "wall_ms": wall_ms, "drop_metrics": drop_metrics}
