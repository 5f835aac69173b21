"""Vectorized JSON field extraction over string columns.

Event/telemetry tables routinely carry a JSON ``props`` payload; the
pipeline primitive is "pull field X out as a typed column" without a
per-row Python ``json.loads`` loop. The kernel here is polars'
Rust-native ``str.json_path_match`` applied per Arrow batch —
zero-copy in/out via ``pl.from_arrow`` / ``to_arrow``, no Python row
dispatch — matching DuckDB's ``json_extract`` (both return null for
missing paths / malformed documents).
"""

from __future__ import annotations

import pyarrow as pa


def json_int_field(ds, *, col: str, path: str, out_col: str,
                   keep: list[str]):
    """Extract an integer JSON field ``path`` (e.g. ``$.k``) from
    string column ``col`` into int64 ``out_col``, keeping ``keep``
    columns. Malformed/missing → null (DuckDB json_extract parity)."""
    import polars as pl

    def extract(batch: pa.Table) -> pa.Table:
        df = pl.from_arrow(batch.select(keep + [col]))
        out = df.with_columns(
            pl.col(col).str.json_path_match(path)
            .cast(pl.Int64).alias(out_col)
        ).select(keep + [out_col])
        tbl = out.to_arrow()
        # polars emits large_string/large_list flavors; normalize back
        # to the input's Arrow types for schema stability
        target = pa.schema(
            [batch.schema.field(k) for k in keep]
            + [pa.field(out_col, pa.int64())])
        return tbl.cast(target)

    return ds.map_batches(extract, batch_format="pyarrow")
