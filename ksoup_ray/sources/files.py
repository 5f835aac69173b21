"""File-based HTML source: the reference's ``parseFile`` / gzip-stream
surface (`helper/DataUtil.kt:49-51` — files "compressed with gzip (and
end in .gz or .z)" load transparently) re-expressed as a Ray Data
source.

Shape for scale:
* ``read_html_files``: ``ray.data.read_binary_files`` streams the raw
  payloads (Ray parallelizes the listing + reads across the cluster);
  ONE vectorized ``map_batches`` gunzips (detected by the 1f 8b magic,
  not just extension — same effective behavior as the reference, which
  also accepts mis-named members) and derives each page's url from its
  path. No driver-side file loop; no full-corpus materialization.
* ``write_html_shards``: materializes a page Dataset into
  ``shard=NN/`` directories of individual ``.html`` / ``.html.gz``
  files — written INSIDE workers via ``map_batches`` (the driver never
  sees page bytes), resumable at shard granularity like the parquet
  sink.

Together they give the round-trip the reference's users run today:
directory of (possibly gzipped) HTML files → parsed/extracted table.
"""

from __future__ import annotations

import gzip
import os

import pyarrow as pa

from .synth import url_for

_GZ_MAGIC = b"\x1f\x8b"


def _file_name(doc_id: int, lang: str, gz: bool) -> str:
    return f"{lang}_{doc_id:08d}.html" + (".gz" if gz else "")


def _parse_name(path: str) -> tuple[str, int] | None:
    """shard path → (lang, doc_id), or ``None`` when the name doesn't
    follow the ``{lang}_{doc_id}.html[.gz|.z]`` convention (the caller
    COUNTS such files as drops — never a task-killing raise). Inverse
    of ``_file_name``; both gzip suffixes the reference accepts
    (`helper/DataUtil.kt:49-51`: ".gz or .z") strip here."""
    base = os.path.basename(path)
    for suffix in (".gz", ".z"):
        if base.endswith(suffix):
            base = base[:-len(suffix)]
            break
    if not base.endswith(".html"):
        return None
    stem = base[:-len(".html")]
    lang, _, doc_id = stem.rpartition("_")
    if not lang or not doc_id.isdigit():
        return None
    return lang, int(doc_id)


def write_html_shards(pages, out_dir: str, *, num_shards: int = 16,
                      gzip_every: int = 2) -> int:
    """Write a pages Dataset (``url``/``html`` columns, plus the
    ``doc_id``-bearing url convention from sources/synth.py) as
    individual HTML files under ``out_dir/shard=NN/``; every
    ``gzip_every``-th page is gzip-compressed (.html.gz). Workers write
    their own batches — the driver only folds per-batch file counts.
    Returns the number of files written."""

    def write_batch(batch: pa.Table) -> pa.Table:
        urls = batch.column("url").to_pylist()
        payloads = batch.column("html").to_pylist()
        n = 0
        for url, raw in zip(urls, payloads):
            # url = BASE_URL/{lang}/{doc_id:08d} (sources/synth.py)
            parts = url.rsplit("/", 2)
            lang, doc_id = parts[-2], int(parts[-1])
            gz = gzip_every > 0 and doc_id % gzip_every == 0
            shard = doc_id % num_shards
            sdir = os.path.join(out_dir, f"shard={shard:02d}")
            os.makedirs(sdir, exist_ok=True)
            data = gzip.compress(raw, mtime=0) if gz else raw
            tmp = os.path.join(sdir, f".tmp.{doc_id:08d}")
            with open(tmp, "wb") as f:
                f.write(data)
            os.replace(tmp, os.path.join(
                sdir, _file_name(doc_id, lang, gz)))
            n += 1
        return pa.table({"files": pa.array([n], pa.int64())})

    import pyarrow.compute as pc
    total = 0
    for b in pages.map_batches(write_batch, batch_format="pyarrow") \
            .iter_batches(batch_format="pyarrow"):
        if b.num_rows:
            total += int(pc.sum(b.column("files")).as_py())
    return total


def read_html_files(root: str, *, concurrency=None):
    """Directory of ``.html`` / ``.html.gz`` files → Dataset of
    ``(url, html: binary)``. Gzip is detected by MAGIC BYTES (1f 8b),
    mirroring the reference's transparent gzip file loading
    (`helper/DataUtil.kt:49-51`); the url derives from the filename
    convention of ``write_html_shards``."""
    import ray.data as rd

    ds = rd.read_binary_files(root, include_paths=True,
                              file_extensions=["html", "gz", "z"])

    def decode(batch: pa.Table) -> pa.Table:
        import logging
        paths = batch.column("path").to_pylist()
        blobs = batch.column("bytes").to_pylist()
        urls, htmls = [], []
        bad = 0
        for path, raw in zip(paths, blobs):
            parsed = _parse_name(path)
            if parsed is None:       # counted drop, not a task kill
                bad += 1
                continue
            if raw[:2] == _GZ_MAGIC:
                raw = gzip.decompress(raw)
            lang, doc_id = parsed
            urls.append(url_for(doc_id, lang))
            htmls.append(raw)
        if bad:
            logging.getLogger("ksoup_ray.files").warning(
                "read_html_files: skipped %d unparseable filename(s)",
                bad)
            from ..functions.metrics import record_drop
            record_drop("read_html_files.bad_names", bad, block=False)
        return pa.table({
            "url": pa.array(urls, pa.string()),
            "html": pa.array(htmls, pa.binary()),
        })

    kwargs = {"concurrency": concurrency} if concurrency else {}
    return ds.map_batches(decode, batch_format="pyarrow", **kwargs)
