"""CLI: run the two production jobs from a shell (or `ray job
submit -- python -m ksoup_ray ...` on a cluster).

  python -m ksoup_ray extract --input <path> --format parquet|files|warc \
      --out <dir> [--num-partitions 64] [--cpus N]
  python -m ksoup_ray curate --input <documents.parquet> --out <dir> \
      [--langs en,de] [--min-tokens 20] [--max-tokens 90]

Owns its Ray session (the library never calls ray.init); resumable:
rerunning either job skips partitions whose lineage exists.
"""

from __future__ import annotations

import argparse
import json
import sys


def _init_ray(cpus):
    import ray
    if not ray.is_initialized():
        kwargs = dict(address="local", include_dashboard=False,
                      logging_level="ERROR")
        if cpus:
            kwargs["num_cpus"] = cpus
        ray.init(**kwargs)


def _pages_from(path: str, fmt: str):
    import ray.data as rd
    if fmt == "parquet":
        # a documents-style table → synthesized CC pages, or an
        # existing (url, html) page table used as-is
        schema_cols = rd.read_parquet(path).schema().names
        if "html" in schema_cols:
            return rd.read_parquet(path)
        from .sources.synth import cc_pages
        import os
        return cc_pages(os.path.dirname(path) or ".")
    if fmt == "files":
        from .sources.files import read_html_files
        return read_html_files(path)
    if fmt == "warc":
        from .sources.warc import read_warc
        return read_warc(path)
    raise SystemExit(f"unknown --format {fmt}")


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="ksoup_ray")
    sub = p.add_subparsers(dest="cmd", required=True)

    pe = sub.add_parser("extract", help="HTML extraction job")
    pe.add_argument("--input", required=True)
    pe.add_argument("--format", default="parquet",
                    choices=["parquet", "files", "warc"])
    pe.add_argument("--out", required=True)
    pe.add_argument("--num-partitions", type=int, default=64)
    pe.add_argument("--cpus", type=int, default=None)

    pc_ = sub.add_parser("curate", help="dedup + filter curation job")
    pc_.add_argument("--input", required=True,
                     help="documents parquet (doc_id, text, lang)")
    pc_.add_argument("--out", required=True)
    pc_.add_argument("--langs", default="en")
    pc_.add_argument("--min-tokens", type=int, default=20)
    pc_.add_argument("--max-tokens", type=int, default=90)
    pc_.add_argument("--num-partitions", type=int, default=64)
    pc_.add_argument("--cpus", type=int, default=None)

    args = p.parse_args(argv)
    _init_ray(args.cpus)
    import ray

    try:
        if args.cmd == "extract":
            from .pipelines.extract import run_extraction
            stats = run_extraction(
                _pages_from(args.input, args.format), args.out,
                num_partitions=args.num_partitions, write=True,
                resume=True)
        else:
            import ray.data as rd
            from .pipelines.curate import curate_to_parquet
            ds = rd.read_parquet(args.input,
                                 columns=["doc_id", "text", "lang"])
            stats = curate_to_parquet(
                ds, args.out,
                num_partitions=args.num_partitions,
                langs=tuple(args.langs.split(",")),
                min_tokens=args.min_tokens,
                max_tokens=args.max_tokens)
        print(json.dumps(stats))
        return 0
    finally:
        ray.shutdown()


if __name__ == "__main__":
    sys.exit(main())
