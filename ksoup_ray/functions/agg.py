"""Skew-aware wide operations: salted aggregation and gap
sessionization.

* ``salted_count``: a hot-key-safe count. A plain
  ``groupby(key).count()`` routes EVERY row of a hot key through one
  reducer — with 4 languages over 100 TB that is 4 reducers doing all
  the work. The salted shape: (1) per-batch combiner collapses each
  batch to at most ``batch_keys`` partial rows (map-side combine — the
  real 1000× reduction), (2) an all-to-all over (key, salt) spreads
  each hot key across ``salt`` reducers, (3) a tiny final groupby(key)
  over ``keys × salt`` rows. Nothing corpus-scale crosses in one
  partition.

* ``sessionize``: gap-based sessions per user (the standard
  training-data event-log primitive). ONE shuffle on a BOUNDED bucket
  key (``hash(user) % num_partitions``, functions/_blocks.py), then
  each bucket block sessionizes ALL of its users in one vectorized
  segmented kernel (sort by (user, ts) → per-row new-user/new-gap
  flags → boundary arithmetic). Python dispatches O(num_partitions)
  times total — never once per user.
"""

from __future__ import annotations

import itertools
import zlib

import numpy as np
import pandas as pd
import pyarrow as pa

from ._blocks import from_pandas_clean as _from_pandas_clean

# per-worker-process batch counter: Ray reuses task workers, so each
# successive batch a worker combines gets a different offset — the
# batch-varying half of the salt derivation below
_SALT_BATCH_COUNTER = itertools.count()


def salted_count(ds, key_col: str, salt: int = 16):
    """Count rows per key with map-side combine + salt spreading.
    Returns a Dataset of (key_col, n)."""
    from ray.data.aggregate import Sum

    def combine(batch: pa.Table) -> pa.Table:
        # per-batch partial counts (vectorized); salt = stable key hash
        # + per-batch counter, so a hot key's partials ROTATE over all
        # `salt` reducers across batches instead of concentrating on
        # the key's first-appearance position (which pyarrow group_by
        # keeps stable batch to batch)
        tbl = batch.group_by(key_col).aggregate([(key_col, "count")])
        offset = next(_SALT_BATCH_COUNTER)
        # post-combine, tbl has at most (distinct keys in batch) rows —
        # tiny, so the per-key crc32 loop is off the hot path
        kh = np.fromiter(
            (zlib.crc32(str(k).encode()) for k in tbl.column(key_col)
             .to_pylist()), dtype=np.int64, count=tbl.num_rows)
        salts = ((kh + offset) % salt).astype(np.int32)
        return pa.table({
            key_col: tbl.column(key_col),
            "partial": tbl.column(f"{key_col}_count"),
            "salt": pa.array(salts, pa.int32()),
        })

    partials = ds.map_batches(combine, batch_format="pyarrow")
    # all-to-all #1: (key, salt) — each hot key lands on `salt` reducers
    salted = partials.groupby([key_col, "salt"]).aggregate(
        Sum("partial", alias_name="n_salted"))
    # all-to-all #2: tiny (keys × salt rows) final fold
    return salted.groupby(key_col).aggregate(
        Sum("n_salted", alias_name="n"))


def hopping_window_count(ds, key_col: str = "event_type",
                         ts_col: str = "ts",
                         window_us: int = 3_600_000_000,
                         hop_us: int = 900_000_000):
    """Hopping (sliding) window count: events per key per
    ``window_us`` window starting every ``hop_us``. Each event belongs
    to exactly ``window_us // hop_us`` windows, so the map side
    EXPLODES each batch by that constant factor and immediately
    collapses to (key, window_start) partial counts — only those
    partials (keys × windows per batch) enter the one groupby shuffle.
    Requires window_us % hop_us == 0. Returns
    ``(key_col, window_start μs int64, n)``."""
    from ray.data.aggregate import Sum

    if window_us % hop_us:
        raise ValueError("window_us must be a multiple of hop_us")
    reps = window_us // hop_us

    def partial(batch: pa.Table) -> pa.Table:
        ts = batch.column(ts_col).cast(pa.timestamp("us")) \
            .cast(pa.int64()).to_numpy()
        keys = batch.column(key_col).to_numpy(zero_copy_only=False)
        base = (ts // hop_us) * hop_us
        # windows containing ts: starts base - j*hop, j = 0..reps-1
        starts = (base[None, :] -
                  (np.arange(reps, dtype=np.int64)[:, None] * hop_us)
                  ).ravel()
        keys_rep = np.tile(keys, reps)
        t = pa.table({
            key_col: pa.array(keys_rep),
            "window_start": pa.array(starts, pa.int64()),
        })
        g = t.group_by([key_col, "window_start"]).aggregate(
            [("window_start", "count")])
        return pa.table({
            key_col: g.column(key_col),
            "window_start": g.column("window_start"),
            "partial": g.column("window_start_count").cast(pa.int64()),
        })

    return (ds.map_batches(partial, batch_format="pyarrow")
            .groupby([key_col, "window_start"])
            .aggregate(Sum("partial", alias_name="n")))


def late_data_audit(ds, *, ts_col: str = "ts",
                    window_us: int = 86_400_000_000,
                    watermark_us: int = 7 * 86_400_000_000):
    """Watermark-semantics audit of an event log: per TUMBLING window
    (``window_us``), the event count and how many events a streaming
    job with watermark ``max_event_time - watermark_us`` would have
    treated as LATE (arrived after their window's watermark passed).
    The batch re-formulation a 100 TB backfill runs before choosing a
    production watermark: late-rate per window tells you how much
    data a given allowed-lateness would drop. Deterministic (late ⇔
    ts < global_max_ts - watermark), so fully SQL-replayable.

    Two passes, both trivial at scale: ONE scalar global-max fold
    (``Dataset.max`` — no shuffle of rows), then a pure per-batch map
    collapsing to bounded (window, n, n_late) partials folded by a
    windows-sized groupby. Returns ``(window_start, n_events,
    n_late)``."""
    from ray.data.aggregate import Sum

    max_ts = ds.max(ts_col)
    max_us = pd.Timestamp(max_ts).value // 1000
    cutoff = max_us - watermark_us

    def partial(batch: pa.Table) -> pa.Table:
        ts = batch.column(ts_col).cast(pa.timestamp("us")) \
            .cast(pa.int64()).to_numpy(zero_copy_only=False)
        win = (ts // window_us) * window_us
        late = (ts < cutoff).astype(np.int64)
        df = pd.DataFrame({"w": win, "late": late})
        g = df.groupby("w", sort=False).agg(
            n=("late", "size"), nl=("late", "sum")).reset_index()
        return pa.table({
            "window_start": pa.array(g["w"].to_numpy(np.int64),
                                     pa.int64()),
            "n": pa.array(g["n"].to_numpy(np.int64), pa.int64()),
            "nl": pa.array(g["nl"].to_numpy(np.int64), pa.int64()),
        })

    return (ds.map_batches(partial, batch_format="pyarrow")
            .groupby("window_start")
            .aggregate(Sum("n", alias_name="n_events"),
                       Sum("nl", alias_name="n_late")))


def stratified_sample(ds, *, key_col: str = "lang",
                      id_col: str = "doc_id", rate_pct: int = 10):
    """Deterministic per-stratum sample: keep rows with
    ``id % 100 < rate_pct`` — reproducible across runs/engines (no
    RNG), uniform within each stratum for ids uncorrelated with the
    key. Emits a per-batch kept/total log line so the sampling rate is
    NEVER silent. Pure vectorized filter — no shuffle."""

    def keep(batch: pa.Table) -> pa.Table:
        import logging
        import pyarrow.compute as pc
        ids = batch.column(id_col).cast(pa.int64())
        mask = pc.less(pc.cast(
            pc.subtract(ids, pc.multiply(pc.divide(ids, 100),
                                         pa.scalar(100, pa.int64()))),
            pa.int64()), rate_pct)
        out = batch.filter(mask)
        logging.getLogger("ksoup_ray.sample").info(
            "stratified_sample: kept %d/%d (rate %d%%)",
            out.num_rows, batch.num_rows, rate_pct)
        return out

    return ds.map_batches(keep, batch_format="pyarrow")


def grouped_topk(ds, *, key_col: str = "lang", val_col: str = "n",
                 id_col: str = "doc_id", k: int = 3,
                 num_partitions: int = 64):
    """Top-``k`` rows per key by (val desc, id asc) — the window
    ROW_NUMBER() pattern. Map-side combine keeps at most k rows per
    key PER BATCH (k × keys × batches rows ride the one shuffle, never
    the corpus), then the final stage shuffles on a BOUNDED
    ``hash(key) % num_partitions`` bucket (functions/_blocks.py
    contract — O(num_partitions) Python dispatches total, safe for an
    unbounded key column) and each bucket block resolves ALL of its
    keys in one vectorized sort + cumcount pass. Deterministic
    tie-break on the id."""
    import pandas as pd
    from ._blocks import pk_column

    def local(batch: pa.Table) -> pa.Table:
        df = batch.select([key_col, val_col, id_col]).to_pandas()
        df = df.sort_values([val_col, id_col],
                            ascending=[False, True])
        out = df.groupby(key_col, sort=False).head(k)
        t = _from_pandas_clean(out)
        return t.append_column(
            "_pk", pk_column(t.column(key_col), num_partitions))

    def block_final(block: pd.DataFrame) -> pd.DataFrame:
        df = block.sort_values([key_col, val_col, id_col],
                               ascending=[True, False, True],
                               kind="mergesort")
        rank = df.groupby(key_col, sort=False).cumcount()
        return df[rank < k].drop(columns=["_pk"])

    return (ds.map_batches(local, batch_format="pyarrow")
            .groupby("_pk").map_groups(block_final,
                                       batch_format="pandas"))


def sessionize(ds, user_col: str = "user_id", ts_col: str = "ts",
               gap_seconds: int = 1800, num_partitions: int = 64):
    """Split each user's event stream into sessions separated by more
    than ``gap_seconds``. Returns one row per session:
    (user_col, session_start, session_end, n_events).

    ONE shuffle on ``hash(user) % num_partitions`` (bounded bucket key,
    so Python dispatches O(num_partitions) times — never per user);
    each bucket block sessionizes all of its users in one vectorized
    pass: a session starts where the user changes OR the gap exceeds
    the threshold, and boundary arithmetic reads start/end/count
    straight off the sorted arrays."""
    import pandas as pd
    from ._blocks import pk_column

    gap_us = np.timedelta64(gap_seconds * 1_000_000, "us")

    def add_pk(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "_pk", pk_column(batch.column(user_col), num_partitions))

    def split_block(block: pd.DataFrame) -> pd.DataFrame:
        block = block.sort_values([user_col, ts_col], kind="mergesort")
        users = block[user_col].to_numpy()
        ts = block[ts_col].to_numpy(dtype="datetime64[us]")
        n = len(ts)
        if n == 0:
            return pd.DataFrame({user_col: users,
                                 "session_start": ts,
                                 "session_end": ts,
                                 "n_events": np.empty(0, np.int64)})
        new_sess = np.empty(n, bool)
        new_sess[0] = True
        new_sess[1:] = (users[1:] != users[:-1]) \
            | ((ts[1:] - ts[:-1]) > gap_us)
        starts = np.flatnonzero(new_sess)
        bounds = np.append(starts[1:], n)
        return pd.DataFrame({
            user_col: users[starts],
            "session_start": ts[starts],
            "session_end": ts[bounds - 1],
            "n_events": (bounds - starts).astype(np.int64),
        })

    return (ds.map_batches(add_pk, batch_format="pyarrow")
            .groupby("_pk")
            .map_groups(split_block, batch_format="pandas"))


def scd2_intervals(ds, *, key_col: str = "user_id",
                   attr_col: str = "event_type", ts_col: str = "ts",
                   tie_col: str = "event_id", num_partitions: int = 64):
    """Build slowly-changing-dimension TYPE-2 history from an event
    stream: per key, collapse consecutive runs of the same attribute
    value into validity intervals — one row per run with
    ``valid_from`` = the run's first event time and ``valid_to`` = the
    NEXT run's start (NaT for the key's open current interval). The
    standard CDC→warehouse intervalization every snapshot-training
    pipeline runs before as-of joins.

    Same scale shape as :func:`sessionize`: ONE shuffle on
    ``hash(key) % num_partitions`` (bounded bucket key — O(partitions)
    Python dispatches, never per key); each bucket block resolves ALL
    of its keys in one vectorized pass — sort by (key, ts, tie), run
    boundaries where the key OR the attribute changes, ``valid_to``
    read off the next boundary with a same-key mask.
    """
    import pandas as pd
    from ._blocks import pk_column

    def add_pk(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "_pk", pk_column(batch.column(key_col), num_partitions))

    def runs_block(block: pd.DataFrame) -> pd.DataFrame:
        block = block.sort_values([key_col, ts_col, tie_col],
                                  kind="mergesort")
        keys = block[key_col].to_numpy()
        attrs = block[attr_col].to_numpy()
        ts = block[ts_col].to_numpy(dtype="datetime64[us]")
        n = len(ts)
        if n == 0:
            return pd.DataFrame({
                key_col: keys, attr_col: attrs,
                "valid_from": ts, "valid_to": ts})
        change = np.empty(n, bool)
        change[0] = True
        change[1:] = (keys[1:] != keys[:-1]) | (attrs[1:] != attrs[:-1])
        starts = np.flatnonzero(change)
        nxt = np.append(starts[1:], n)
        valid_to = np.full(len(starts), np.datetime64("NaT", "us"))
        closed = nxt < n
        same_key = np.zeros(len(starts), bool)
        same_key[closed] = keys[nxt[closed]] == keys[starts[closed]]
        valid_to[same_key] = ts[nxt[same_key]]
        return pd.DataFrame({
            key_col: keys[starts],
            attr_col: attrs[starts],
            "valid_from": ts[starts],
            "valid_to": valid_to,
        })

    return (ds.map_batches(add_pk, batch_format="pyarrow")
            .groupby("_pk")
            .map_groups(runs_block, batch_format="pandas"))


def latest_per_key(ds, *, key_col: str = "user_id", ts_col: str = "ts",
                   tie_col: str = "event_id", num_partitions: int = 64):
    """Keep each key's LATEST row — max (ts, tie) per key, the
    keep-newest compaction every snapshot/CDC pipeline runs before
    training-data extraction. Returns the full surviving rows.

    ONE shuffle on ``hash(key) % num_partitions`` (bounded bucket key,
    functions/_blocks.py); each bucket block resolves all of its keys
    vectorized: sort (key, ts, tie) and take every segment's LAST row
    (the next segment's start − 1). Never a per-key Python dispatch."""
    import pandas as pd
    from ._blocks import pk_column, segment_starts

    def add_pk(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "_pk", pk_column(batch.column(key_col), num_partitions))

    def last_per_key(block: pd.DataFrame) -> pd.DataFrame:
        block = block.sort_values([key_col, ts_col, tie_col],
                                  kind="mergesort")
        keys = block[key_col].to_numpy()
        starts = segment_starts(keys)
        ends = np.append(starts[1:], len(keys)) - 1
        return block.iloc[ends].drop(columns=["_pk"])

    return (ds.map_batches(add_pk, batch_format="pyarrow")
            .groupby("_pk")
            .map_groups(last_per_key, batch_format="pandas"))


def per_key_cap(ds, *, key_col: str = "source", id_col: str = "doc_id",
                cap: int = 20, num_partitions: int = 64):
    """Quota sampling: keep at most ``cap`` rows per key (the lowest
    ``id_col`` values — deterministic, reproducible), the standard
    anti-spam guard against a single host/source flooding a training
    mix. Dropped counts are RECORDED per batch (no silent caps).

    ONE shuffle on ``hash(key) % num_partitions``; each bucket block
    ranks all of its keys in one vectorized pass (sort (key, id), rank
    = position − segment start, keep rank < cap)."""
    import pandas as pd
    from ._blocks import pk_column, start_of_segment

    def add_pk(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "_pk", pk_column(batch.column(key_col), num_partitions))

    def cap_block(block: pd.DataFrame) -> pd.DataFrame:
        block = block.sort_values([key_col, id_col], kind="mergesort")
        keys = block[key_col].to_numpy()
        rank = np.arange(len(keys)) - start_of_segment(keys)
        keep = rank < cap
        dropped = int(len(keys) - keep.sum())
        if dropped:
            from .metrics import record_drop
            record_drop("per_key_cap.dropped_rows", dropped,
                        block=False)
        return block[keep].drop(columns=["_pk"])

    return (ds.map_batches(add_pk, batch_format="pyarrow")
            .groupby("_pk")
            .map_groups(cap_block, batch_format="pandas"))


def running_total(ds, *, key_col: str = "user_id", ts_col: str = "ts",
                  tie_col: str = "event_id", val_col: str = "value",
                  num_partitions: int = 64):
    """Per-key cumulative sum ordered by (ts, tie) — the running-total
    window (``SUM(v) OVER (PARTITION BY key ORDER BY ts)``). Values
    quantize to INT CENTS before accumulating, so the prefix sums are
    order-of-association-free and exactly reproducible by the SQL
    oracle (float window sums may re-associate in a segment tree).
    Returns the input keys plus ``cum_cents``.

    ONE shuffle on ``hash(key) % num_partitions`` (bounded bucket key,
    functions/_blocks.py); each bucket block computes ALL of its keys'
    prefix sums in one vectorized pass: sort (key, ts, tie), global
    cumsum, subtract each segment's starting offset."""
    import pandas as pd
    from ._blocks import pk_column, start_of_segment

    def add_pk(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "_pk", pk_column(batch.column(key_col), num_partitions))

    def prefix_block(block: pd.DataFrame) -> pd.DataFrame:
        block = block.sort_values([key_col, ts_col, tie_col],
                                  kind="mergesort")
        keys = block[key_col].to_numpy()
        cents = np.round(block[val_col].to_numpy(dtype=np.float64)
                         * 100.0).astype(np.int64)
        cs = np.cumsum(cents)
        seg0 = start_of_segment(keys)
        offset = cs[seg0] - cents[seg0]     # sum BEFORE each segment
        out = block.drop(columns=["_pk", val_col])
        out["cum_cents"] = cs - offset
        return out

    return (ds.map_batches(add_pk, batch_format="pyarrow")
            .groupby("_pk")
            .map_groups(prefix_block, batch_format="pandas"))


def funnel_counts(ds, *, steps=("view", "click", "purchase"),
                  user_col: str = "user_id", ts_col: str = "ts",
                  type_col: str = "event_type",
                  num_partitions: int = 64):
    """Ordered funnel analysis: how many users completed each prefix of
    ``steps`` in order — a user counts for step k when an event of type
    ``steps[k]`` exists STRICTLY after their step k-1 completion time
    (min-time semantics, the standard product-analytics funnel).

    ONE shuffle on ``hash(user) % num_partitions`` (bounded bucket key,
    ``_blocks.py`` discipline — a user's events land in one block);
    each block resolves ALL its users per step in one vectorized pass:
    sort by (user, ts), user segment ids, then per step a mask +
    first-qualifying-row-per-segment via ``np.unique``. Per-block
    partial counts fold in a tiny final groupby — driver state is
    O(len(steps)).

    Returns ``(step int64 1-based, event_type, users int64)``.
    """
    import pandas as pd
    from ray.data.aggregate import Sum
    from ._blocks import pk_column

    steps = list(steps)

    def add_pk(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "_pk", pk_column(batch.column(user_col), num_partitions))

    def funnel_block(block: pd.DataFrame) -> pd.DataFrame:
        block = block.sort_values([user_col, ts_col], kind="mergesort")
        users = block[user_col].to_numpy()
        ts = block[ts_col].to_numpy(dtype="datetime64[us]") \
            .astype(np.int64)
        types = block[type_col].to_numpy()
        n = len(users)
        counts = np.zeros(len(steps), np.int64)
        if n:
            seg = np.zeros(n, np.int64)            # per-row user index
            seg[1:] = np.cumsum(users[1:] != users[:-1])
            n_users = seg[-1] + 1
            prev = np.full(n_users, -(2**62), np.int64)   # -inf
            for k, ev in enumerate(steps):
                ok = (types == ev) & (ts > prev[seg])
                rows = np.flatnonzero(ok)
                hit_users, first = np.unique(seg[rows],
                                             return_index=True)
                nxt = np.full(n_users, 2**62, np.int64)   # +inf: out
                nxt[hit_users] = ts[rows[first]]
                prev = nxt
                counts[k] = len(hit_users)
                if not len(hit_users):
                    break
        return pd.DataFrame({
            "step": np.arange(1, len(steps) + 1, dtype=np.int64),
            type_col: steps,
            "partial": counts,
        })

    out = (ds.map_batches(add_pk, batch_format="pyarrow")
           .groupby("_pk")
           .map_groups(funnel_block, batch_format="pandas")
           .groupby(["step", type_col])
           .aggregate(Sum("partial", alias_name="users")))

    def cast(batch: pa.Table) -> pa.Table:
        return pa.table({
            "step": batch.column("step").cast(pa.int64()),
            type_col: batch.column(type_col),
            "users": batch.column("users").cast(pa.int64()),
        })

    return out.map_batches(cast, batch_format="pyarrow")


def grouped_zscore(ds, *, key_col: str = "lang",
                   val_col: str = "n_chars", id_col: str = "doc_id"):
    """Per-group standardization (z-score) of a numeric column — the
    feature-normalization primitive (per-language length norms, per-
    domain quality norms). Two passes, ZERO corpus shuffles:

    pass A: per-batch combine to (key, n, sum, sumsq) int64 partials,
    one groupby over a table bounded by |keys| x |batches|, driver
    folds |keys| rows (4 langs — scalars, not data);
    pass B: broadcast the |keys| moment rows in the closure, per-batch
    vectorized ``round((v - s/n) / sqrt((ss - s*s/n)/n) * 1e6)`` —
    population std, same expression tree as the DuckDB oracle, int64
    sums are exact in double below 2^53 so both sides compute
    identical doubles. Returns (id_col, key_col, z_micros)."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        keys = batch.column(key_col).to_pandas()
        v = np.asarray(batch.column(val_col).to_pylist(),
                       dtype=np.int64)
        g = pd.DataFrame({"k": keys, "v": v, "vv": v * v}).groupby(
            "k", sort=False).agg(n=("v", "size"), s=("v", "sum"),
                                 ss=("vv", "sum")).reset_index()
        return pa.table({key_col: pa.array(g["k"], pa.string()),
                         "n": pa.array(g["n"], pa.int64()),
                         "s": pa.array(g["s"], pa.int64()),
                         "ss": pa.array(g["ss"], pa.int64())})

    moments = (ds.map_batches(partial, batch_format="pyarrow")
               .groupby(key_col)
               .aggregate(Sum("n", alias_name="n"),
                          Sum("s", alias_name="s"),
                          Sum("ss", alias_name="ss"))
               .to_pandas())   # bounded: one row per key
    mom = {r[key_col]: (float(r["n"]), float(r["s"]), float(r["ss"]))
           for _, r in moments.iterrows()}

    def score(batch: pa.Table) -> pa.Table:
        keys = batch.column(key_col).to_pylist()
        v = np.asarray(batch.column(val_col).to_pylist(),
                       dtype=np.float64)
        n = np.array([mom[k][0] for k in keys])
        s = np.array([mom[k][1] for k in keys])
        ss = np.array([mom[k][2] for k in keys])
        z = (v - s / n) / np.sqrt((ss - s * s / n) / n)
        return pa.table({
            id_col: batch.column(id_col),
            key_col: batch.column(key_col),
            "z_micros": pa.array(
                np.round(z * 1_000_000.0).astype(np.int64), pa.int64()),
        })

    return ds.map_batches(score, batch_format="pyarrow")


def crosstab_counts(ds, cols: list[str]):
    """Exact contingency-table counts over a column tuple — the
    confusion-matrix / cross-tab primitive (e.g. labeled lang ×
    predicted lang for classifier evaluation). Map-side combine: each
    batch collapses to its distinct tuples with partial counts (one
    pandas groupby), then ONE groupby over the bounded tuple key —
    rows crossing the shuffle are at most |distinct tuples| per batch,
    never corpus-scale. Returns one row per observed tuple with an
    int64 ``n``."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.select(cols).to_pandas()
        g = df.groupby(cols, sort=False, dropna=False).size() \
            .reset_index(name="partial")
        g["partial"] = g["partial"].astype(np.int64)
        return _from_pandas_clean(g, preserve_index=False)

    return (ds.map_batches(partial, batch_format="pyarrow")
            .groupby(cols)
            .aggregate(Sum("partial", alias_name="n")))


def retention_cohorts(ds, *, user_col: str = "user_id",
                      ts_col: str = "ts", week_secs: int = 604800,
                      num_partitions: int = 32):
    """Cohort retention triangle over an event log: each user's cohort
    is their FIRST active week; the output counts users active in
    every (cohort_week, offset_week) cell — the standard engagement
    report. All week arithmetic is exact integer microseconds
    (epoch_us // week), so the DuckDB oracle matches bit for bit.

    Shuffle inventory: per-batch local (user, week) dedup, then ONE
    bounded-bucket shuffle on ``hash(user) % num_partitions``
    (functions/_blocks.py — all of a user's weeks land in one block,
    completing the dedup and making the per-user min a sorted segment
    scan), then per-block (cohort, offset) partial counts → a tiny
    final groupby over the bounded cohort × offset grid. No join, no
    per-user Python dispatch. Returns (cohort_week, offset_week,
    n_users)."""
    from ray.data.aggregate import Sum

    from ksoup_ray.functions._blocks import (bucket_of,
                                             segment_starts)

    week_us = week_secs * 1_000_000

    def pair_partial(batch: pa.Table) -> pa.Table:
        users = batch.column(user_col).cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        us = batch.column(ts_col).cast(
            pa.timestamp("us")).cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        weeks = us // week_us
        df = pd.DataFrame({"user": users, "week": weeks}) \
            .drop_duplicates()
        df["_pk"] = bucket_of(df["user"].to_numpy(np.int64),
                              num_partitions)
        return _from_pandas_clean(df, preserve_index=False)

    def cohort_block(block: pd.DataFrame) -> pd.DataFrame:
        u = block["user"].to_numpy(np.int64)
        w = block["week"].to_numpy(np.int64)
        order = np.lexsort((w, u))
        u, w = u[order], w[order]
        keep = np.ones(len(u), dtype=bool)           # global dedup
        keep[1:] = (u[1:] != u[:-1]) | (w[1:] != w[:-1])
        u, w = u[keep], w[keep]
        starts = segment_starts(u)
        d = np.diff(np.append(starts, len(u)))
        cohort = np.repeat(w[starts], d)              # per-user min
        g = pd.DataFrame({"cohort_week": cohort,
                          "offset_week": w - cohort}) \
            .groupby(["cohort_week", "offset_week"], sort=False) \
            .size().reset_index(name="partial")
        g["partial"] = g["partial"].astype(np.int64)
        return g

    return (ds.select_columns([user_col, ts_col])
            .map_batches(pair_partial, batch_format="pyarrow")
            .groupby("_pk")
            .map_groups(cohort_block, batch_format="pandas")
            .groupby(["cohort_week", "offset_week"])
            .aggregate(Sum("partial", alias_name="n_users")))


def rollup_counts(ds, cols: list[str]):
    """GROUP BY ROLLUP counts over a low-cardinality column tuple —
    detail rows plus every subtotal level up to the grand total (the
    report/BI primitive). Distributed work is exactly ONE cross-tab
    (:func:`crosstab_counts` — map-side combine, bounded-tuple
    groupby); every rollup level is then derived from that bounded
    detail grid on the driver (|tuples| rows, corpus-independent), so
    no second shuffle. Rolled-up dimensions are NULL and
    ``grouping_id`` carries the DuckDB GROUPING() bitmask (0 =
    detail, …, 2^len(cols)-1 = grand total). Returns a pandas
    DataFrame (cols…, n, grouping_id)."""
    detail = crosstab_counts(ds, cols).to_pandas()
    frames = []
    for level in range(len(cols) + 1):
        keep = cols[:len(cols) - level]
        rolled = cols[len(cols) - level:]
        if keep:
            g = detail.groupby(keep, as_index=False, dropna=False) \
                .agg(n=("n", "sum"))
        else:
            g = pd.DataFrame({"n": [int(detail["n"].sum())]})
        for c in rolled:
            g[c] = None
        g["grouping_id"] = np.int64((1 << level) - 1)
        frames.append(g[cols + ["n", "grouping_id"]])
    out = pd.concat(frames, ignore_index=True)
    out["n"] = out["n"].astype(np.int64)
    return out


def grouped_cov(ds, *, key_col: str, x_col: str, y_col: str,
                x_scale: int = 1, y_scale: int = 100):
    """Exact per-group population-covariance NUMERATOR
    ``n*sum(x*y) - sum(x)*sum(y)`` over integer-scaled columns (floats
    are ROUNDed to x_scale/y_scale units per row BEFORE any sum, so
    the result is order-free exact and matches a DuckDB BIGINT oracle
    bit-for-bit). Streaming sufficient statistics: each batch
    collapses to one (key, n, sx, sy, sxy) int64 row per key — rows
    crossing to the driver are O(#batches x |keys|), payload-free —
    and the fold runs in arbitrary-precision Python ints, so nothing
    overflows at any corpus size (the final int64 cast raises loudly
    if the true value doesn't fit the oracle's BIGINT either).
    Returns a pandas DataFrame (key, n, cov_num)."""
    def partial(batch: pa.Table) -> pa.Table:
        df = batch.select([key_col, x_col, y_col]).to_pandas()
        x = np.round(df[x_col].to_numpy() * x_scale).astype(np.int64)
        y = np.round(df[y_col].to_numpy() * y_scale).astype(np.int64)
        g = pd.DataFrame({key_col: df[key_col], "_x": x, "_y": y,
                          "_xy": x * y, "_n": np.int64(1)}) \
            .groupby(key_col, sort=False).sum().reset_index()
        return _from_pandas_clean(g, preserve_index=False)

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    out = []
    for key, grp in parts.groupby(key_col, sort=True):
        n = int(grp["_n"].sum())
        sx = sum(int(v) for v in grp["_x"])
        sy = sum(int(v) for v in grp["_y"])
        sxy = sum(int(v) for v in grp["_xy"])
        out.append((key, n, n * sxy - sx * sy))
    return pd.DataFrame(out, columns=[key_col, "n", "cov_num"]) \
        .astype({"n": np.int64, "cov_num": np.int64})


def group_string_agg(ds, cols=None, *, key_col: str = "source",
                     val_col: str = "lang", sep: str = ","):
    """Deterministic ``string_agg(DISTINCT val ORDER BY val)`` per
    bounded-cardinality group — the report/export primitive. One
    distributed cross-tab (:func:`crosstab_counts`) collapses the
    corpus to the bounded (key x value) grid; the ordered join runs on
    that grid on the driver, so value strings never ride a
    corpus-scale shuffle and concatenation order is a pure function of
    the values (matching the SQL ORDER BY rule exactly). Returns a
    pandas DataFrame (key, vals)."""
    grid = crosstab_counts(ds, [key_col, val_col]).to_pandas()
    out = (grid.sort_values([key_col, val_col])
           .groupby(key_col, sort=True)[val_col]
           .agg(lambda s: sep.join(s))
           .reset_index(name="vals"))
    return out


def pivot_counts(ds, *, key_col: str, cat_col: str,
                 categories: list[str]):
    """PIVOT a categorical column into FIXED wide count columns
    ``n_<cat>`` per key (the feature-table primitive: one row per
    entity, one column per event type). The category list must be
    given explicitly — schema is static, never data-dependent, so the
    plan stays one pass. Map-side combine: each batch collapses to one
    wide partial row per key it contains (vectorized pandas crosstab),
    then ONE groupby on the key sums the partials — shuffle payload is
    |categories| int64s per (key, batch), never raw events. Keys may
    be corpus-scale (groupby's hash shuffle handles that); category
    count must be small. Returns a Dataset (key, n_<cat>...)."""
    from ray.data.aggregate import Sum

    cols = [f"n_{c}" for c in categories]

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.select([key_col, cat_col]).to_pandas()
        ct = pd.crosstab(df[key_col], df[cat_col])
        out = pd.DataFrame(index=ct.index)
        for c, name in zip(categories, cols):
            if c in ct.columns:
                out[name] = ct[c].astype(np.int64)
            else:
                out[name] = np.int64(0)
        return _from_pandas_clean(out.reset_index(),
                                    preserve_index=False)

    return (ds.map_batches(partial, batch_format="pyarrow")
            .groupby(key_col)
            .aggregate(*[Sum(c, alias_name=c) for c in cols]))


def lag_gaps(ds, *, key_col: str = "user_id", ts_col: str = "ts",
             tie_col: str = "event_id", num_partitions: int = 64):
    """Per-key LAG delta — ``ts - LAG(ts) OVER (PARTITION BY key ORDER
    BY ts, tie)`` in exact integer microseconds, each key's first row
    excluded (LAG is null there). The inter-arrival-time primitive
    behind bot detection and session features. Same one-shuffle shape
    as :func:`running_total`: bucket on ``hash(key) % num_partitions``
    (functions/_blocks.py), then each bucket block computes ALL of its
    keys' deltas in one vectorized pass — sort (key, ts, tie), one
    global diff, segment-start rows dropped so deltas never leak
    across keys. Returns (tie, key, gap_us)."""
    import pandas as pd
    from ._blocks import pk_column, start_of_segment

    def add_pk(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "_pk", pk_column(batch.column(key_col), num_partitions))

    def gap_block(block: pd.DataFrame) -> pd.DataFrame:
        block = block.sort_values([key_col, ts_col, tie_col],
                                  kind="mergesort")
        ts_us = block[ts_col].to_numpy() \
            .astype("datetime64[us]").astype(np.int64)
        keys = block[key_col].to_numpy()
        gap = np.zeros(len(block), np.int64)
        gap[1:] = ts_us[1:] - ts_us[:-1]
        seg0 = start_of_segment(keys)
        is_first = seg0 == np.arange(len(block))
        out = pd.DataFrame({
            tie_col: block[tie_col].to_numpy(),
            key_col: keys,
            "gap_us": gap,
        })
        return out[~is_first]

    return (ds.map_batches(add_pk, batch_format="pyarrow")
            .groupby("_pk")
            .map_groups(gap_block, batch_format="pandas"))


def cube_counts(ds, cols: list[str]):
    """GROUP BY CUBE counts over a low-cardinality column tuple —
    every subset of the dimensions gets its subtotal (the OLAP-cube
    primitive; superset of :func:`rollup_counts`). Distributed work is
    still exactly ONE cross-tab (:func:`crosstab_counts`); all 2^k
    grouping sets are derived from that bounded detail grid on the
    driver, so no second shuffle and no extra corpus pass per level.
    Rolled-up dimensions are NULL and ``grouping_id`` carries the
    DuckDB GROUPING() bitmask (first column = most significant bit;
    0 = detail, 2^k-1 = grand total). Returns a pandas DataFrame
    (cols…, n, grouping_id)."""
    detail = crosstab_counts(ds, cols).to_pandas()
    k = len(cols)
    frames = []
    for mask in range(1 << k):
        rolled = [cols[i] for i in range(k) if mask & (1 << (k - 1 - i))]
        keep = [c for c in cols if c not in rolled]
        if keep:
            g = detail.groupby(keep, as_index=False, dropna=False) \
                .agg(n=("n", "sum"))
        else:
            g = pd.DataFrame({"n": [int(detail["n"].sum())]})
        for c in rolled:
            g[c] = None
        g["grouping_id"] = np.int64(mask)
        frames.append(g[cols + ["n", "grouping_id"]])
    out = pd.concat(frames, ignore_index=True)
    out["n"] = out["n"].astype(np.int64)
    return out


def ohlc_bars(ds, *, key_col: str = "user_id", ts_col: str = "ts",
              tie_col: str = "event_id", val_col: str = "value",
              bucket_us: int = 3_600_000_000, val_scale: int = 10**6,
              num_partitions: int = 64):
    """Per-(key, time-bucket) OPEN/HIGH/LOW/CLOSE bars — first/max/
    min/last of a value within each bucket, ordered by (ts, tie) so
    the result is deterministic under duplicate timestamps. The
    time-series downsampling primitive (metrics rollups, per-user
    rate features). Values are ROUNDed to ``val_scale`` units per row
    BEFORE selection so every output is an exact int64 matching the
    SQL oracle. Same one-shuffle shape as :func:`lag_gaps`: bucket on
    ``hash(key) % num_partitions``, then each bucket block resolves
    ALL of its (key, bucket) bars in one vectorized pass — sort +
    segment boundaries + ``np.{maximum,minimum}.reduceat``. Returns
    (key, bucket, open/high/low/close ``*_e6``, n)."""
    from ._blocks import pk_column

    def add_pk(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "_pk", pk_column(batch.column(key_col), num_partitions))

    def bars_block(block: pd.DataFrame) -> pd.DataFrame:
        ts_us = block[ts_col].to_numpy() \
            .astype("datetime64[us]").astype(np.int64)
        block = block.assign(
            _bkt=ts_us // bucket_us,
            _v=np.round(block[val_col].to_numpy() * val_scale)
            .astype(np.int64))
        block = block.sort_values([key_col, "_bkt", ts_col, tie_col],
                                  kind="mergesort")
        keys = block[key_col].to_numpy()
        bkt = block["_bkt"].to_numpy()
        v = block["_v"].to_numpy()
        n = len(block)
        first = np.empty(n, bool)
        first[0] = True
        first[1:] = (keys[1:] != keys[:-1]) | (bkt[1:] != bkt[:-1])
        starts = np.flatnonzero(first)
        ends = np.append(starts[1:], n)
        return pd.DataFrame({
            key_col: keys[starts],
            "bucket": bkt[starts],
            "open_e6": v[starts],
            "high_e6": np.maximum.reduceat(v, starts),
            "low_e6": np.minimum.reduceat(v, starts),
            "close_e6": v[ends - 1],
            "n": (ends - starts).astype(np.int64),
        })

    return (ds.map_batches(add_pk, batch_format="pyarrow")
            .groupby("_pk")
            .map_groups(bars_block, batch_format="pandas"))


def melt_measures(ds, *, id_cols: list[str], measure_cols: list[str],
                  scale: int = 10**6, name_col: str = "measure",
                  value_col: str = "value_e6"):
    """UNPIVOT — wide measure columns to long (id…, measure, value)
    rows, the inverse of :func:`pivot_counts` and the standard
    normalization step before generic per-measure aggregation. Pure
    map-side reshape: each batch emits ``len(measure_cols)`` stacked
    column slices via one Arrow concat — no shuffle, no Python per
    row. Float measures are ROUNDed to ``scale`` units so the long
    value column is exact int64. Measure order within a row follows
    ``measure_cols`` (DuckDB UNPIVOT emits the ON list in order)."""
    def melt(batch: pa.Table) -> pa.Table:
        pieces = []
        for m in measure_cols:
            vals = np.round(batch.column(m).to_numpy(
                zero_copy_only=False) * scale).astype(np.int64)
            cols = {c: batch.column(c) for c in id_cols}
            cols[name_col] = pa.array([m] * batch.num_rows,
                                      pa.string())
            cols[value_col] = pa.array(vals, pa.int64())
            pieces.append(pa.table(cols))
        return pa.concat_tables(pieces)

    return ds.map_batches(melt, batch_format="pyarrow")


def group_xor_checksum(ds, *, key_col: str, text_col: str):
    """Order-free per-group content checksum: ``bit_xor`` of a 60-bit
    md5 prefix of each row's text, plus the row count — the
    partition-verification primitive (two runs / two engines produce
    equal checksums iff they saw the same multiset of rows, at any
    shuffle order). XOR is associative+commutative, so each batch
    collapses to one partial (key, xor, n) row per key it contains
    (sorted-segment ``np.bitwise_xor.reduceat``) and the driver folds
    the bounded partial grid — shuffle payload is O(keys × batches).
    60 bits (15 hex digits) keeps the value inside a signed BIGINT so
    the DuckDB oracle is ``bit_xor(CAST('0x' || substr(md5(t),1,15)
    AS BIGINT))``. Returns a pandas DataFrame (key, checksum, n)."""
    import hashlib

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.select([key_col, text_col]).to_pandas()
        h = np.fromiter(
            (int.from_bytes(
                hashlib.md5(t.encode()).digest()[:8], "big") >> 4
             for t in df[text_col]),
            np.int64, len(df))
        order = np.argsort(df[key_col].to_numpy(), kind="mergesort")
        keys = df[key_col].to_numpy()[order]
        from ._blocks import start_of_segment
        seg0 = start_of_segment(keys)
        starts = np.unique(seg0)
        return pa.table({
            key_col: pa.array(keys[starts]),
            "_x": pa.array(np.bitwise_xor.reduceat(h[order], starts),
                           pa.int64()),
            "_n": pa.array(
                np.append(starts[1:], len(keys)) - starts, pa.int64()),
        })

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    out = []
    for key, grp in parts.groupby(key_col, sort=True):
        out.append((key, int(np.bitwise_xor.reduce(
            grp["_x"].to_numpy())), int(grp["_n"].sum())))
    return pd.DataFrame(out, columns=[key_col, "checksum", "n"]) \
        .astype({"checksum": np.int64, "n": np.int64})


def ntile_by_group(ds, *, key_col: str, val_col: str, tie_col: str,
                   n_tiles: int = 4, num_partitions: int = 32):
    """SORT-FREE ``NTILE(n) OVER (PARTITION BY key ORDER BY val,
    tie)`` — equi-depth banding per group without a global per-group
    sort (per-group sorts are the classic skew bottleneck when one
    group holds most of the corpus). Two-phase:

    1. ONE bounded cross-tab over (key, val) gives each distinct
       value's count; the driver derives, per (key, val), the count
       of strictly-smaller values (``below``) and each key's total —
       a grid of |keys × distinct vals| rows, corpus-independent for
       discrete vals — and broadcasts it once via ``ray.put``.
    2. ONE shuffle co-locates equal (key, val) rows (bucket on
       ``hash(val)``), and each block ranks its rows WITHIN each
       (key, val) segment by ``tie`` (vectorized argsort + segment
       offsets). row_number = below + within-rank; the NTILE bucket
       is then closed-form: with q = n//t, r = n%t, the first r
       tiles take q+1 rows (exactly DuckDB's rule).

    Returns (tie, key, val, tile). Assumes ``val`` is discrete-ish
    (lengths, scores in fixed units); continuous vals should be
    quantized first or the grid degenerates to one row per row."""
    import ray
    from ._blocks import pk_column

    grid = crosstab_counts(ds.select_columns([key_col, val_col]),
                           [key_col, val_col]).to_pandas()
    grid = grid.sort_values([key_col, val_col], kind="mergesort")
    csum = grid.groupby(key_col, sort=False)["n"].cumsum()
    grid["below"] = (csum - grid["n"]).astype(np.int64)
    totals = grid.groupby(key_col, sort=False)["n"].sum()
    below_ref = ray.put({
        (k, v): int(b) for k, v, b in
        zip(grid[key_col], grid[val_col], grid["below"])})
    total_ref = ray.put({k: int(t) for k, t in totals.items()})

    def add_pk(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "_pk", pk_column(batch.column(val_col), num_partitions))

    def tile_block(block: pd.DataFrame) -> pd.DataFrame:
        below = ray.get(below_ref)
        total = ray.get(total_ref)
        block = block.sort_values([key_col, val_col, tie_col],
                                  kind="mergesort")
        keys = block[key_col].to_numpy()
        vals = block[val_col].to_numpy()
        n = len(block)
        first = np.empty(n, bool)
        first[0] = True
        first[1:] = (keys[1:] != keys[:-1]) | (vals[1:] != vals[:-1])
        seg_start = np.maximum.accumulate(
            np.where(first, np.arange(n), 0))
        within = np.arange(n) - seg_start
        b = np.fromiter((below[(k, v)] for k, v in
                         zip(keys[first], vals[first])),
                        np.int64, int(first.sum()))
        rn = b[np.cumsum(first) - 1] + within + 1
        tot = np.fromiter((total[k] for k in keys[first]),
                          np.int64, int(first.sum()))[
            np.cumsum(first) - 1]
        q, r = tot // n_tiles, tot % n_tiles
        cut = r * (q + 1)
        tile = np.where(
            rn <= cut,
            (rn - 1) // np.maximum(q + 1, 1) + 1,
            r + np.where(q > 0, (rn - cut - 1) // np.maximum(q, 1),
                         0) + 1)
        return pd.DataFrame({
            tie_col: block[tie_col].to_numpy(),
            key_col: keys, val_col: vals,
            "tile": tile.astype(np.int64),
        })

    return (ds.map_batches(add_pk, batch_format="pyarrow")
            .groupby("_pk")
            .map_groups(tile_block, batch_format="pandas"))


def window_frame_sum(ds, *, key_col: str = "user_id",
                     ts_col: str = "ts", tie_col: str = "event_id",
                     val_col: str = "value", preceding: int = 3,
                     val_scale: int = 10**6,
                     num_partitions: int = 64):
    """Bounded window-frame aggregate: ``SUM(v) OVER (PARTITION BY key
    ORDER BY ts, tie ROWS BETWEEN preceding PRECEDING AND CURRENT
    ROW)`` — the rolling-feature primitive (recent-activity signals).
    Values are ROUNDed to ``val_scale`` units per row so the window
    sums are exact int64. One bounded-bucket shuffle, then each block
    computes ALL keys' frames in one vectorized pass: per-segment
    cumulative sums, frame = csum[i] − csum[lo-1] with the frame start
    clamped to the segment start (shorter frames at each key's head,
    exactly the SQL rule). Returns (tie, key, frame_sum_e6, n_in)."""
    from ._blocks import pk_column, start_of_segment

    def add_pk(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "_pk", pk_column(batch.column(key_col), num_partitions))

    def frame_block(block: pd.DataFrame) -> pd.DataFrame:
        block = block.sort_values([key_col, ts_col, tie_col],
                                  kind="mergesort")
        keys = block[key_col].to_numpy()
        v = np.round(block[val_col].to_numpy() * val_scale) \
            .astype(np.int64)
        n = len(block)
        idx = np.arange(n)
        seg0 = start_of_segment(keys)
        lo = np.maximum(seg0, idx - preceding)
        csum = np.concatenate(([0], np.cumsum(v)))
        return pd.DataFrame({
            tie_col: block[tie_col].to_numpy(),
            key_col: keys,
            "frame_sum_e6": csum[idx + 1] - csum[lo],
            "n_in": (idx - lo + 1).astype(np.int64),
        })

    return (ds.map_batches(add_pk, batch_format="pyarrow")
            .groupby("_pk")
            .map_groups(frame_block, batch_format="pandas"))


def grouped_argmax(ds, *, key_cols: list[str], val_col: str,
                   id_col: str):
    """Exact per-group ARGMAX row: the id with the LARGEST value,
    ties broken toward the SMALLEST id — the representative-document
    primitive (longest doc per stratum, best score per query). Pure
    map-side combine: each batch keeps one best (key…, id, val) row
    per key it contains (one vectorized lexsort + first-of-segment
    mask), and the driver folds the bounded partial grid with the
    same rule — group keys must be bounded (strata), ids/values never
    are. Returns a pandas DataFrame (key…, id, val)."""
    def partial(batch: pa.Table) -> pa.Table:
        df = batch.select(key_cols + [id_col, val_col]).to_pandas()
        df = df.sort_values(key_cols + [val_col, id_col],
                            ascending=[True] * len(key_cols)
                            + [False, True], kind="mergesort")
        return _from_pandas_clean(
            df.drop_duplicates(key_cols, keep="first"),
            preserve_index=False)

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    parts = parts.sort_values(
        key_cols + [val_col, id_col],
        ascending=[True] * len(key_cols) + [False, True],
        kind="mergesort")
    return parts.drop_duplicates(key_cols, keep="first") \
        .reset_index(drop=True)


def argmax_per_key(ds, *, key_col: str, val_col: str, id_col: str,
                   num_partitions: int = 64):
    """Per-key ARGMAX row for UNBOUNDED key domains (components,
    users, hosts) — the scale-safe sibling of :func:`grouped_argmax`
    (whose driver fold assumes bounded strata). Two-step: map-side
    combine keeps one best (key, id, val) row per key PER BATCH, then
    ONE bounded-bucket shuffle (``hash(key) % num_partitions``)
    co-locates each key's partials and a segmented block kernel picks
    the winner — largest value, ties toward the SMALLEST id; Python
    dispatches O(num_partitions) times, never per key. Returns a
    Dataset (key, id, val)."""
    from ._blocks import pk_column

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.select([key_col, id_col, val_col]).to_pandas()
        df = df.sort_values([key_col, val_col, id_col],
                            ascending=[True, False, True],
                            kind="mergesort")
        df = df.drop_duplicates(key_col, keep="first")
        t = _from_pandas_clean(df, preserve_index=False)
        return t.append_column(
            "_pk", pk_column(t.column(key_col), num_partitions))

    def best_block(block: pd.DataFrame) -> pd.DataFrame:
        block = block.sort_values([key_col, val_col, id_col],
                                  ascending=[True, False, True],
                                  kind="mergesort")
        return block.drop_duplicates(key_col, keep="first") \
            [[key_col, id_col, val_col]]

    return (ds.map_batches(partial, batch_format="pyarrow")
            .groupby("_pk")
            .map_groups(best_block, batch_format="pandas"))


def windowed_distinct(ds, *, key_col: str = "event_type",
                      ts_col: str = "ts", user_col: str = "user_id",
                      window_us: int = 3_600_000_000):
    """Distinct-entity count per (key, tumbling window) — the
    unique-users-per-hour primitive. Exact two-stage distinct: each
    batch collapses to its distinct (key, window, user) triples
    (map-side dedup), ONE groupby over the triple finishes the global
    dedup, and a second bounded groupby over (key, window) counts —
    both shuffles carry id-only rows, and the triple domain
    (keys × windows × users-active-in-window) is the output's own
    size, never the raw event count. Returns (key, window_start µs,
    n_users)."""
    from ray.data.aggregate import Count

    def triples(batch: pa.Table) -> pa.Table:
        ts = batch.column(ts_col).cast(pa.timestamp("us")) \
            .cast(pa.int64()).to_numpy()
        t = pa.table({
            key_col: batch.column(key_col),
            "window_start": pa.array((ts // window_us) * window_us,
                                     pa.int64()),
            user_col: batch.column(user_col),
        })
        return t.group_by([key_col, "window_start", user_col]) \
            .aggregate([])

    return (ds.map_batches(triples, batch_format="pyarrow")
            .groupby([key_col, "window_start", user_col])
            .count()
            .map_batches(lambda b: b.select(
                [key_col, "window_start", user_col]),
                batch_format="pyarrow")
            .groupby([key_col, "window_start"])
            .aggregate(Count(alias_name="n_users")))


def grouped_dense_rank(ds, *, key_col: str, val_col: str,
                       id_col: str):
    """``DENSE_RANK() OVER (PARTITION BY key ORDER BY val)`` with NO
    per-group sort: the dense rank of a value is 1 + the count of
    strictly-smaller DISTINCT values in its group, which falls out of
    the same bounded (key × distinct-value) cross-tab that powers
    :func:`ntile_by_group` — one distributed cross-tab, a per-key
    cumcount on that bounded grid, one ``ray.put`` broadcast, then a
    per-batch vectorized gather. The corpus itself never shuffles.
    Assumes a discrete-ish value domain (lengths, scores in fixed
    units). Returns (id, key, val, dense_rank)."""
    import ray

    grid = crosstab_counts(ds.select_columns([key_col, val_col]),
                           [key_col, val_col]).to_pandas()
    grid = grid.sort_values([key_col, val_col], kind="mergesort")
    grid["rank"] = grid.groupby(key_col, sort=False).cumcount() + 1
    rank_ref = ray.put({
        (k, v): int(r) for k, v, r in
        zip(grid[key_col], grid[val_col], grid["rank"])})

    def score(batch: pa.Table) -> pa.Table:
        ranks = ray.get(rank_ref)
        keys = batch.column(key_col).to_pylist()
        vals = batch.column(val_col).to_numpy(zero_copy_only=False)
        r = np.fromiter((ranks[(k, v)] for k, v in zip(keys, vals)),
                        np.int64, len(keys))
        return pa.table({
            id_col: batch.column(id_col),
            key_col: batch.column(key_col),
            val_col: batch.column(val_col),
            "dense_rank": pa.array(r, pa.int64()),
        })

    return ds.map_batches(score, batch_format="pyarrow")


def corr_pairs(ds, cols_scales: dict[str, int], *,
               round_to: int = 1_000_000):
    """Exact-reproducible pairwise Pearson correlations over k numeric
    columns in ONE streaming pass (the feature-audit primitive before
    training: "which raw signals are redundant?").

    Every column is integer-scaled per row FIRST (``round(x*scale)``),
    so all sufficient statistics — n, sum(xi), sum(xi*xj) for every
    pair — are order-free exact integer sums; each batch collapses to
    a single partial row (map-side combine, 1 + k + k(k+1)/2 int64s),
    and the fold runs in arbitrary-precision Python ints on the driver
    (O(#batches) rows, payload-free). The final correlation is formed
    with the SAME expression nesting the DuckDB oracle uses —
    float(num) / (sqrt(float(n*sxx-sx²)) * sqrt(float(n*syy-sy²))) —
    so ROUND(corr*1e6) matches the SQL micros bit for bit (both sides
    do one round-to-nearest int→double conversion per term).

    Returns a pandas DataFrame (x_col, y_col, n, corr_micros) with one
    row per unordered pair, sorted by (x_col, y_col).
    """
    import math

    cols = list(cols_scales)
    pairs = [(i, j) for i in range(len(cols))
             for j in range(i + 1, len(cols))]

    def partial(batch: pa.Table) -> pa.Table:
        arrs = [np.round(batch.column(c).to_numpy(zero_copy_only=False)
                         * s).astype(np.int64)
                for c, s in cols_scales.items()]
        out = {"_n": pa.array([batch.num_rows], pa.int64())}
        for i, c in enumerate(cols):
            out[f"_s{i}"] = pa.array([int(arrs[i].sum())], pa.int64())
            # object dtype keeps the squared sums exact past int64
            out[f"_q{i}"] = pa.array(
                [str(int((arrs[i].astype(object) ** 2).sum()))])
        for i, j in pairs:
            out[f"_p{i}_{j}"] = pa.array(
                [str(int((arrs[i].astype(object)
                          * arrs[j].astype(object)).sum()))])
        return pa.table(out)

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    n = int(parts["_n"].sum())
    s = [sum(int(v) for v in parts[f"_s{i}"])
         for i in range(len(cols))]
    q = [sum(int(v) for v in parts[f"_q{i}"])
         for i in range(len(cols))]
    p = {(i, j): sum(int(v) for v in parts[f"_p{i}_{j}"])
         for i, j in pairs}

    rows = []
    for i, j in pairs:
        num = n * p[(i, j)] - s[i] * s[j]
        den = (math.sqrt(float(n * q[i] - s[i] * s[i]))
               * math.sqrt(float(n * q[j] - s[j] * s[j])))
        micros = int(np.round(float(num) / den * round_to)) \
            if den > 0 else 0
        rows.append((cols[i], cols[j], n, micros))
    rows.sort()
    return pd.DataFrame(rows, columns=["x_col", "y_col", "n",
                                       "corr_micros"]) \
        .astype({"n": np.int64, "corr_micros": np.int64})


def pareto_front(ds, *, x_col: str, y_col: str, y_scale: int = 100):
    """2-D skyline (Pareto frontier, maximize both axes) — the
    local-prune-then-global-merge pattern: every batch reduces to its
    OWN frontier (at most |distinct x| points, typically a handful),
    only those candidate points reach the driver, and one final
    frontier pass over the tiny merged set gives the global answer.
    Nothing corpus-scale ever moves — at 100 TB the driver sees
    O(#batches × frontier-size) rows.

    A point survives iff its y is strictly greater than every y at a
    strictly larger x (per-x max first, so ties on x collapse). y is
    integer-scaled per row (order-free exact). Returns a pandas
    DataFrame (x, y_scaled) sorted by x ascending.
    """
    def _frontier(x: np.ndarray, y: np.ndarray):
        # per-x max, then strict running-max filter from high x down
        order = np.argsort(x, kind="mergesort")
        x, y = x[order], y[order]
        ux, idx = np.unique(x, return_index=True)
        ymax = np.maximum.reduceat(y, idx)
        keep = np.empty(len(ux), bool)
        best = np.iinfo(np.int64).min
        for k in range(len(ux) - 1, -1, -1):
            keep[k] = ymax[k] > best
            if ymax[k] > best:
                best = ymax[k]
        return ux[keep], ymax[keep]

    def partial(batch: pa.Table) -> pa.Table:
        x = np.round(batch.column(x_col)
                     .to_numpy(zero_copy_only=False)).astype(np.int64)
        y = np.round(batch.column(y_col)
                     .to_numpy(zero_copy_only=False)
                     * y_scale).astype(np.int64)
        fx, fy = _frontier(x, y)
        return pa.table({"x": pa.array(fx, pa.int64()),
                         "y_scaled": pa.array(fy, pa.int64())})

    cand = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    fx, fy = _frontier(cand["x"].to_numpy(), cand["y_scaled"].to_numpy())
    return pd.DataFrame({"x": fx, "y_scaled": fy}) \
        .astype({"x": np.int64, "y_scaled": np.int64})


def grouped_weighted_median(ds, *, key_col: str, val_col: str,
                            weight_col: str, weight_scale: int = 1):
    """Exact lower weighted median per group over a discrete value
    domain — the robust-center statistic when rows carry unequal mass
    (revenue-weighted "typical order size"). Same bounded-histogram
    shape as grouped quantiles: each batch collapses to (key, value,
    weight-partial) rows, ONE groupby sums them, and the cumulative
    scan runs on the tiny (keys × distinct-values) grid on the
    driver. The median rule is pure integer math — smallest v with
    ``2·cumw(v) ≥ totalw`` — so the DuckDB window oracle matches bit
    for bit. Returns a pandas DataFrame (key, w_median)."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            key_col: batch.column(key_col).to_pylist(),
            "v": np.round(batch.column(val_col)
                          .to_numpy(zero_copy_only=False))
            .astype(np.int64),
            "w": np.round(batch.column(weight_col)
                          .to_numpy(zero_copy_only=False)
                          * weight_scale).astype(np.int64)})
        g = df.groupby([key_col, "v"], as_index=False)["w"].sum()
        return _from_pandas_clean(g, preserve_index=False)

    hist = (ds.map_batches(partial, batch_format="pyarrow")
            .groupby([key_col, "v"])
            .aggregate(Sum("w", alias_name="w"))
            .to_pandas())
    out = []
    for key, grp in hist.groupby(key_col, sort=True):
        grp = grp.sort_values("v")
        total = int(grp["w"].sum())
        cum = grp["w"].cumsum()
        out.append((key, int(grp.loc[2 * cum >= total, "v"].iloc[0])))
    return pd.DataFrame(out, columns=[key_col, "w_median"]) \
        .astype({"w_median": np.int64})


def grouped_ols(ds, *, key_col: str, x_col: str, y_col: str,
                x_scale: int = 1, y_scale: int = 100):
    """Per-group simple linear regression (slope + intercept in exact
    micros) from ONE streaming pass of integer sufficient statistics
    — the drift/trend detector ("is price linear in quantity per
    segment?"). Rows are integer-scaled first; per-batch partials
    carry n, Σx, Σy, Σx², Σxy per key with the overflow-prone squared
    sums as decimal STRINGS (object-dtype math), so the driver fold
    is arbitrary-precision. The float formation mirrors the SQL
    nesting exactly: slope = num/den, intercept =
    (Σy − slope·Σx)/n, each ×1e6 LAST. Returns a pandas DataFrame
    (key, n, slope_micros, intercept_micros)."""
    def partial(batch: pa.Table) -> pa.Table:
        keys = batch.column(key_col).to_pylist()
        x = np.round(batch.column(x_col)
                     .to_numpy(zero_copy_only=False)
                     * x_scale).astype(np.int64).astype(object)
        y = np.round(batch.column(y_col)
                     .to_numpy(zero_copy_only=False)
                     * y_scale).astype(np.int64).astype(object)
        df = pd.DataFrame({key_col: keys, "_n": 1, "_sx": x,
                           "_sy": y, "_sxx": x * x, "_sxy": x * y})
        g = df.groupby(key_col, as_index=False).sum()
        for c in ("_sx", "_sy", "_sxx", "_sxy"):
            g[c] = g[c].map(lambda v: str(int(v)))
        g["_n"] = g["_n"].astype(np.int64)
        return _from_pandas_clean(g, preserve_index=False)

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    out = []
    for key, grp in parts.groupby(key_col, sort=True):
        n = int(grp["_n"].sum())
        sx = sum(int(v) for v in grp["_sx"])
        sy = sum(int(v) for v in grp["_sy"])
        sxx = sum(int(v) for v in grp["_sxx"])
        sxy = sum(int(v) for v in grp["_sxy"])
        num, den = n * sxy - sx * sy, n * sxx - sx * sx
        slope = float(num) / float(den)
        intercept = (float(sy) - slope * float(sx)) / float(n)
        out.append((key, n, int(np.round(slope * 1_000_000)),
                    int(np.round(intercept * 1_000_000))))
    return pd.DataFrame(out, columns=[key_col, "n", "slope_micros",
                                      "intercept_micros"]) \
        .astype({"n": np.int64, "slope_micros": np.int64,
                 "intercept_micros": np.int64})
