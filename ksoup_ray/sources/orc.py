"""ORC shard source/sink — the third columnar interchange format
(after Parquet and the CSV/JSONL text formats) re-expressed as Ray
Data stages. Ray 2.49 ships no ``read_orc``/``write_orc``, so both
directions are built on ``pyarrow.orc`` directly:

* ``write_orc_shards``: one ORC file per BLOCK, written inside
  ``map_batches`` (task-parallel, no driver data) with a
  tmp-then-rename commit so a killed task never leaves a readable
  half-file; the stage emits (path, rows) manifest rows.
* ``read_orc``: driver reads only file FOOTERS (stripe counts — ORC's
  metadata, bytes not data), then fans out one task per STRIPE
  (``split_stripes=True``, the scale path: a 100 GB shard with 400
  stripes becomes 400 independent tasks instead of one straggler) or
  per file. Column pruning pushes into the ORC reader so only the
  requested columns are decoded.

Scale notes: stripes are ORC's natural parallel unit (like Parquet
row groups); the manifest/footer pass touches O(files) metadata only.
"""

from __future__ import annotations

import os

import pyarrow as pa


def write_orc_shards(ds, out_dir: str):
    """Write ``ds`` as one ORC file per block under ``out_dir``;
    returns the manifest Dataset of (path, rows). Shard names key off
    the block's first value in its first column (unique-id layouts
    give collision-free names; pass pre-repartitioned data)."""
    os.makedirs(out_dir, exist_ok=True)

    def write_block(batch: pa.Table) -> pa.Table:
        import pyarrow.orc as orc
        if batch.num_rows == 0:
            return pa.table({"path": pa.array([], pa.string()),
                             "rows": pa.array([], pa.int64())})
        key = str(batch.column(0)[0].as_py()).replace("/", "_")
        path = os.path.join(out_dir, f"part-{key}.orc")
        tmp = path + ".tmp"
        orc.write_table(batch, tmp)
        os.replace(tmp, path)
        return pa.table({"path": pa.array([path], pa.string()),
                         "rows": pa.array([batch.num_rows],
                                          pa.int64())})

    # batch_size=None: one batch per BLOCK, so files mirror blocks
    return ds.map_batches(write_block, batch_size=None,
                          batch_format="pyarrow")


def read_orc(path_or_paths, *, columns: list[str] | None = None,
             split_stripes: bool = True):
    """Read ORC files as a Ray Dataset. ``path_or_paths`` is a
    directory, one path, or a list. With ``split_stripes`` each ORC
    stripe becomes its own read task (driver touches footers only);
    otherwise one task per file."""
    import ray.data as rd

    if isinstance(path_or_paths, str):
        if os.path.isdir(path_or_paths):
            paths = sorted(
                os.path.join(path_or_paths, f)
                for f in os.listdir(path_or_paths)
                if f.endswith(".orc"))
        else:
            paths = [path_or_paths]
    else:
        paths = sorted(path_or_paths)
    if not paths:
        raise ValueError("no ORC files to read")

    import pyarrow.orc as orc
    items = []
    if split_stripes:
        for p in paths:                      # footer-only metadata
            n = orc.ORCFile(p).nstripes
            items.extend({"path": p, "stripe": s} for s in range(n))
    else:
        items = [{"path": p, "stripe": -1} for p in paths]

    def load(batch: pa.Table) -> pa.Table:
        import pyarrow.orc as orc
        tables = []
        for p, s in zip(batch.column("path").to_pylist(),
                        batch.column("stripe").to_pylist()):
            f = orc.ORCFile(p)
            if s < 0:
                tables.append(f.read(columns=columns))
            else:
                t = f.read_stripe(s, columns=columns)
                if isinstance(t, pa.RecordBatch):
                    t = pa.Table.from_batches([t])
                tables.append(t)
        return pa.concat_tables(tables)

    return rd.from_items(items).map_batches(
        load, batch_size=1, batch_format="pyarrow")
