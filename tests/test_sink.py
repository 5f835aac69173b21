"""Generalized resumable sink (pipelines/sink.py): partitioned layout,
lineage rows, resume-skip semantics, and the curation wrapper."""

import json
import os

import pyarrow.parquet as pq
import pytest


def _read_all(out_dir):
    import glob
    tables = []
    for f in glob.glob(os.path.join(out_dir, "data", "**", "*.parquet"),
                       recursive=True):
        tables.append(pq.read_table(f))
    import pyarrow as pa
    return pa.concat_tables(tables) if tables else None


def test_write_partitioned_layout_and_lineage(ray_session, tmp_path):
    import ray.data as rd
    from ksoup_ray.pipelines.sink import write_partitioned

    ds = rd.from_items([{"doc_id": i, "v": i * 2} for i in range(40)])
    out = str(tmp_path / "out")
    stats = write_partitioned(ds, out, key_col="doc_id",
                              num_partitions=4)
    assert stats["rows"] == 40 and stats["partitions"] == 4
    # hive layout + lineage per partition
    parts = sorted(os.listdir(os.path.join(out, "data")))
    assert parts == [f"partition_id={i}" for i in range(4)]
    lineage = sorted(os.listdir(os.path.join(out, "_lineage")))
    assert lineage == [f"{i}.json" for i in range(4)] + ["_metrics.json"]
    rows = sum(json.load(open(os.path.join(out, "_lineage", f)))["rows"]
               for f in lineage if f != "_metrics.json")
    assert rows == 40
    t = _read_all(out)
    assert sorted(t.column("doc_id").to_pylist()) == list(range(40))


def test_resume_skips_finished_partitions(ray_session, tmp_path):
    import ray.data as rd
    from ksoup_ray.pipelines.sink import write_partitioned

    ds = rd.from_items([{"doc_id": i, "v": i} for i in range(20)])
    out = str(tmp_path / "out")
    write_partitioned(ds, out, key_col="doc_id", num_partitions=4)

    # wipe partition 2's data AND lineage → only it should be redone
    import shutil
    shutil.rmtree(os.path.join(out, "data", "partition_id=2"))
    os.remove(os.path.join(out, "_lineage", "2.json"))

    stats = write_partitioned(ds, out, key_col="doc_id",
                              num_partitions=4)
    assert stats["resumed"] == [0, 1, 3]
    t = _read_all(out)
    # no duplicates: finished partitions were skipped, 2 was rewritten
    assert sorted(t.column("doc_id").to_pylist()) == list(range(20))


def test_curate_to_parquet(ray_session, sf_dir, tmp_path):
    import ray.data as rd
    from ksoup_ray.pipelines.curate import curate_to_parquet

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text", "lang"])
    out = str(tmp_path / "curated")
    stats = curate_to_parquet(ds, out, num_partitions=4,
                              langs=("en",), min_tokens=20,
                              max_tokens=90)
    assert stats["rows"] > 0
    t = _read_all(out)
    assert t.num_rows == stats["rows"]
    assert set(t.column_names) >= {"doc_id", "lang", "token_count"}


def test_resume_clears_uncommitted_partition_leftovers(ray_session,
                                                       tmp_path):
    """The ADVICE crash windows: (a) data files present but lineage
    missing (crash between write and lineage commit), (b) partial
    extra files in a partition dir — a rerun must NOT append
    duplicates alongside them. Lineage is the commit record."""
    import shutil
    import ray.data as rd
    from ksoup_ray.pipelines.sink import write_partitioned

    ds = rd.from_items([{"doc_id": i, "v": i} for i in range(20)])
    out = str(tmp_path / "out")
    write_partitioned(ds, out, key_col="doc_id", num_partitions=4)

    # (a) crash AFTER write_parquet, BEFORE lineage: full data files,
    # no commit record
    os.remove(os.path.join(out, "_lineage", "2.json"))
    # (b) crash MID-write on partition 1: stale extra file, no lineage
    os.remove(os.path.join(out, "_lineage", "1.json"))
    p1 = os.path.join(out, "data", "partition_id=1")
    src = [f for f in os.listdir(p1) if f.endswith(".parquet")][0]
    shutil.copy(os.path.join(p1, src),
                os.path.join(p1, "stale_partial.parquet"))

    stats = write_partitioned(ds, out, key_col="doc_id",
                              num_partitions=4)
    assert stats["resumed"] == [0, 3]
    t = _read_all(out)
    assert sorted(t.column("doc_id").to_pylist()) == list(range(20))


def test_nonresume_rewrite_is_overwrite_not_append(ray_session,
                                                   tmp_path):
    import ray.data as rd
    from ksoup_ray.pipelines.sink import write_partitioned

    ds = rd.from_items([{"doc_id": i, "v": i} for i in range(12)])
    out = str(tmp_path / "out")
    write_partitioned(ds, out, key_col="doc_id", num_partitions=3)
    write_partitioned(ds, out, key_col="doc_id", num_partitions=3,
                      resume=False)
    t = _read_all(out)
    assert sorted(t.column("doc_id").to_pylist()) == list(range(12))
