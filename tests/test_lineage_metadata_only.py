"""Round-3 verdict item 2: lineage must be derived without the driver
decoding data columns — footer metadata + one distributed aggregate.

The guard monkeypatches ``pyarrow.parquet.read_table`` in THIS (driver)
process; Ray workers run in separate processes with their own module
state, so the distributed aggregate inside ``write_lineage`` is
unaffected — any surviving driver-side data read trips the guard.
"""

import json
import os

import pyarrow.parquet as pq
import pytest


def test_lineage_no_driver_data_reads(ray_session, sf_dir, tmp_path,
                                      monkeypatch):
    from ksoup_ray.pipelines.extract import run_extraction
    from ksoup_ray.sources.synth import cc_pages

    def _forbidden(*a, **k):
        raise AssertionError(
            f"driver-side pq.read_table during lineage: {a!r} {k!r}")

    out = str(tmp_path / "extract")
    ds = cc_pages(sf_dir)

    monkeypatch.setattr(pq, "read_table", _forbidden)
    stats = run_extraction(ds, out, num_partitions=4, concurrency=2,
                           batch_size=64)
    monkeypatch.undo()

    # lineage values identical to the data-derived ground truth
    assert stats["rows"] == 500
    assert stats["partitions"] == 4
    truth_rows = 0
    truth_bytes = 0
    truth_errors = 0
    for name in sorted(os.listdir(out + "/data")):
        pdir = os.path.join(out, "data", name)
        pid = int(name.split("=", 1)[1])
        t = pq.read_table(pdir, columns=["doc_bytes", "parse_errors"])
        with open(os.path.join(out, "_lineage", f"{pid}.json")) as fh:
            lin = json.load(fh)
        import pyarrow.compute as pc
        assert lin["rows"] == t.num_rows
        assert lin["doc_bytes"] == (pc.sum(t.column("doc_bytes")).as_py()
                                    or 0)
        assert lin["parse_errors"] == (
            pc.sum(t.column("parse_errors")).as_py() or 0)
        truth_rows += t.num_rows
        truth_bytes += lin["doc_bytes"]
        truth_errors += lin["parse_errors"]
    assert stats["rows"] == truth_rows
    assert stats["doc_bytes"] == truth_bytes
    assert stats["parse_errors"] == truth_errors
