"""Local stand-in for the driver's correctness gate: run each
``queries()`` entry and its DuckDB oracle side-by-side, compare
row-count + column names + order-insensitive values.

Usage: python tools/check_oracle.py [sf_dir] [query ...]
"""

import sys
import time

sys.path.insert(0, "/root/repo")


def normalize(df):
    import pandas as pd
    import numpy as np
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif np.issubdtype(df[c].dtype, np.integer):
            df[c] = df[c].astype("int64")
        elif np.issubdtype(df[c].dtype, np.floating):
            df[c] = df[c].astype("float64")
        elif np.issubdtype(df[c].dtype, np.datetime64):
            df[c] = df[c].astype("datetime64[us]")
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def main():
    import duckdb
    import pandas as pd
    import ray

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])

    ray.init(address="local", num_cpus=8, include_dashboard=False,
             logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False

    import __ray_entry__ as entrymod

    con = duckdb.connect()
    for t in ("region nation customer supplier part orders lineitem events "
              "documents embeddings").split():
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            res = fn(sf_dir)
            if hasattr(res, "to_pandas"):
                got = res.to_pandas()
            elif isinstance(res, pd.DataFrame):
                got = res
            else:
                got = res.to_pandas()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: query raised {type(e).__name__}: {e}")
            failures.append(name)
            continue
        dt = time.time() - t0
        sql = oracles.get(name)
        if sql is None:
            print(f"okR  {name}: rows={len(got)} (rows-only) [{dt:.1f}s]")
            if len(got) == 0 and name not in ("minhash_dedup",):
                print(f"     WARNING: zero rows from {name}")
            continue
        want = con.execute(sql).df()
        ng, nw = normalize(got), normalize(want)
        if list(ng.columns) != list(nw.columns):
            print(f"FAIL {name}: columns {list(ng.columns)} != "
                  f"{list(nw.columns)}")
            failures.append(name)
            continue
        if len(ng) != len(nw):
            print(f"FAIL {name}: rows {len(ng)} != {len(nw)}")
            failures.append(name)
            continue
        if not ng.equals(nw):
            diff = (ng != nw).any(axis=1)
            print(f"FAIL {name}: {diff.sum()} differing rows of {len(ng)}")
            print(ng[diff].head(3))
            print(nw[diff].head(3))
            failures.append(name)
            continue
        print(f"ok   {name}: rows={len(ng)} match [{dt:.1f}s]")
    ray.shutdown()
    if failures:
        print("FAILURES:", failures)
        sys.exit(1)
    print("all oracle checks passed")


if __name__ == "__main__":
    main()
