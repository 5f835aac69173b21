"""Randomized DuckDB parity for the sort-free window kernels: seeded
random frames (duplicates, ties, skewed groups) run through the Ray
operators AND the equivalent DuckDB window SQL — the results must
match row-for-row. Complements the fixed-corpus oracle sweep with
adversarial shapes (heavy ties, singleton groups, one giant group)."""

import duckdb
import numpy as np
import pandas as pd


def _frame(seed: int, n: int = 400) -> pd.DataFrame:
    rng = np.random.RandomState(seed)
    return pd.DataFrame({
        "id": np.arange(n, dtype=np.int64),
        # few groups, one dominant -> exercises skew
        "g": rng.choice(["a", "b", "c"], size=n,
                        p=[0.7, 0.2, 0.1]),
        # tiny value domain -> heavy ties
        "v": rng.randint(0, 12, size=n).astype(np.int64),
    })


def test_ntile_matches_duckdb_on_random_frames(ray_session):
    import ray.data as rd
    from ksoup_ray.functions.agg import ntile_by_group

    for seed in (1, 7):
        df = _frame(seed)
        got = ntile_by_group(
            rd.from_pandas(df).repartition(5), key_col="g",
            val_col="v", tie_col="id", n_tiles=4,
            num_partitions=3).to_pandas() \
            .sort_values("id").reset_index(drop=True)
        want = duckdb.sql(
            "SELECT id, g, v, CAST(NTILE(4) OVER (PARTITION BY g "
            "ORDER BY v, id) AS BIGINT) AS tile FROM df ORDER BY id"
        ).df()
        assert list(got["tile"]) == list(want["tile"]), seed


def test_dense_rank_matches_duckdb_on_random_frames(ray_session):
    import ray.data as rd
    from ksoup_ray.functions.agg import grouped_dense_rank

    for seed in (2, 9):
        df = _frame(seed)
        got = grouped_dense_rank(
            rd.from_pandas(df).repartition(4), key_col="g",
            val_col="v", id_col="id").to_pandas() \
            .sort_values("id").reset_index(drop=True)
        want = duckdb.sql(
            "SELECT id, CAST(DENSE_RANK() OVER (PARTITION BY g "
            "ORDER BY v) AS BIGINT) AS r FROM df ORDER BY id").df()
        assert list(got["dense_rank"]) == list(want["r"]), seed


def test_window_frame_sum_matches_duckdb_on_random_frames(
        ray_session):
    import ray.data as rd
    from ksoup_ray.functions.agg import window_frame_sum

    for seed in (3,):
        rng = np.random.RandomState(seed)
        n = 300
        df = pd.DataFrame({
            "event_id": np.arange(n, dtype=np.int64),
            "user_id": rng.randint(0, 9, size=n).astype(np.int64),
            # duplicate timestamps on purpose: tie-break on event_id
            "ts": pd.to_datetime(
                rng.randint(0, 50, size=n), unit="s"),
            "value": rng.randint(-5, 6, size=n).astype(float),
        })
        got = window_frame_sum(
            rd.from_pandas(df).repartition(4), preceding=3,
            num_partitions=4).to_pandas() \
            .sort_values("event_id").reset_index(drop=True)
        want = duckdb.sql("""
            WITH e AS (SELECT event_id, user_id, epoch_us(ts) AS tus,
                              CAST(ROUND(value*1e6) AS BIGINT) AS v
                       FROM df)
            SELECT event_id, CAST(SUM(v) OVER w AS BIGINT) AS s,
                   CAST(COUNT(*) OVER w AS BIGINT) AS c
            FROM e WINDOW w AS (PARTITION BY user_id
                ORDER BY tus, event_id
                ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)
            ORDER BY event_id""").df()
        assert list(got["frame_sum_e6"]) == list(want["s"]), seed
        assert list(got["n_in"]) == list(want["c"]), seed


def test_ohlc_matches_duckdb_on_random_frames(ray_session):
    import ray.data as rd
    from ksoup_ray.functions.agg import ohlc_bars

    rng = np.random.RandomState(11)
    n = 300
    df = pd.DataFrame({
        "event_id": np.arange(n, dtype=np.int64),
        "user_id": rng.randint(0, 5, size=n).astype(np.int64),
        "ts": pd.to_datetime(
            rng.randint(0, 3 * 3600, size=n), unit="s"),
        "value": rng.randint(-100, 100, size=n) / 4.0,
    })
    got = ohlc_bars(rd.from_pandas(df).repartition(4),
                    num_partitions=3).to_pandas() \
        .sort_values(["user_id", "bucket"]).reset_index(drop=True)
    want = duckdb.sql("""
        WITH e AS (SELECT user_id,
                          epoch_us(ts) // 3600000000 AS bucket,
                          epoch_us(ts) AS tus, event_id,
                          CAST(ROUND(value*1e6) AS BIGINT) AS v
                   FROM df),
        r AS (SELECT *, row_number() OVER (PARTITION BY user_id,
                  bucket ORDER BY tus, event_id) AS rn,
                  count(*) OVER (PARTITION BY user_id, bucket) AS cnt
              FROM e)
        SELECT user_id, CAST(bucket AS BIGINT) AS bucket,
               CAST(max(CASE WHEN rn = 1 THEN v END) AS BIGINT)
                 AS open_e6,
               CAST(max(v) AS BIGINT) AS high_e6,
               CAST(min(v) AS BIGINT) AS low_e6,
               CAST(max(CASE WHEN rn = cnt THEN v END) AS BIGINT)
                 AS close_e6,
               CAST(count(*) AS BIGINT) AS n
        FROM r GROUP BY user_id, bucket
        ORDER BY user_id, bucket""").df()
    for col in ("open_e6", "high_e6", "low_e6", "close_e6", "n"):
        assert list(got[col]) == list(want[col]), col


def test_fuzzy_neardup_matches_duckdb_on_random_strings(ray_session):
    import ray.data as rd
    from ksoup_ray.functions.dedup import fuzzy_neardup_pairs

    rng = np.random.RandomState(21)
    # forced shared 6-char prefixes (3 blocks) + random suffixes of
    # varying length -> real candidate pairs, ties, zero-distance
    # pairs, and sub-24-char texts (the short-suffix path)
    alph = list("abXY ")
    prefixes = ["blockA", "blockB", "zz  q "]
    texts = [rng.choice(prefixes)
             + "".join(rng.choice(alph, size=rng.randint(0, 24)))
             for _ in range(120)]
    df = pd.DataFrame({"doc_id": np.arange(120, dtype=np.int64),
                       "text": texts})
    got = fuzzy_neardup_pairs(
        rd.from_pandas(df).repartition(5), max_dist=4,
        num_partitions=4).to_pandas() \
        .sort_values(["id_a", "id_b"]).reset_index(drop=True)
    want = duckdb.sql("""
        WITH t AS (SELECT doc_id, substr(text, 1, 6) AS blk,
                          substr(text, 7, 18) AS suf FROM df)
        SELECT a.doc_id AS id_a, b.doc_id AS id_b,
               CAST(levenshtein(a.suf, b.suf) AS BIGINT) AS dist
        FROM t a JOIN t b ON a.blk = b.blk AND a.doc_id < b.doc_id
        WHERE levenshtein(a.suf, b.suf) <= 4
        ORDER BY id_a, id_b""").df()
    assert len(got) == len(want) and len(want) > 0
    for col in ("id_a", "id_b", "dist"):
        assert list(got[col]) == list(want[col]), col


def test_asof_join_matches_duckdb_on_random_frames(ray_session):
    import ray.data as rd
    from ksoup_ray.functions.joins import asof_join

    rng = np.random.RandomState(17)
    nl, nr = 250, 120
    ldf = pd.DataFrame({
        "event_id": np.arange(nl, dtype=np.int64),
        "user_id": rng.randint(0, 8, size=nl).astype(np.int64),
        # duplicate LEFT timestamps are fine (each left row matches
        # independently); some keys have no right rows at all
        "ts": pd.to_datetime(rng.randint(0, 1000, size=nl), unit="s"),
    })
    # unique (key, ts) on the right — the operator's documented
    # input convention (matches DuckDB ASOF determinism)
    pairs = set()
    while len(pairs) < nr:
        pairs.add((int(rng.randint(0, 6)),
                   int(rng.randint(0, 1000))))
    rk, rt = zip(*sorted(pairs))
    rdf = pd.DataFrame({
        "event_id": np.arange(1000, 1000 + nr, dtype=np.int64),
        "user_id": np.asarray(rk, np.int64),
        "ts": pd.to_datetime(np.asarray(rt), unit="s"),
        "value": rng.randint(-50, 50, size=nr).astype(float),
    })
    got = asof_join(rd.from_pandas(ldf).repartition(4),
                    rd.from_pandas(rdf).repartition(3),
                    num_partitions=4).to_pandas() \
        .sort_values("left_row_id").reset_index(drop=True)
    want = duckdb.sql("""
        SELECT l.event_id AS left_row_id,
               COALESCE(r.event_id, -1) AS matched_id,
               COALESCE(r.value, 0.0) AS matched_val
        FROM ldf l ASOF LEFT JOIN rdf r
          ON l.user_id = r.user_id AND l.ts >= r.ts
        ORDER BY left_row_id""").df()
    assert list(got["matched_id"]) == list(want["matched_id"])
    assert list(got["matched_val"]) == list(want["matched_val"])


def test_sessionize_matches_duckdb_on_random_frames(ray_session):
    import ray.data as rd
    from ksoup_ray.functions.agg import sessionize

    rng = np.random.RandomState(23)
    n = 300
    df = pd.DataFrame({
        "user_id": rng.randint(0, 7, size=n).astype(np.int64),
        # seconds drawn so some gaps straddle the 1800 s boundary;
        # duplicate timestamps per user occur
        "ts": pd.to_datetime(np.sort(
            rng.randint(0, 30_000, size=n)), unit="s"),
    })
    got = sessionize(rd.from_pandas(df).repartition(4),
                     gap_seconds=1800, num_partitions=4) \
        .to_pandas() \
        .sort_values(["user_id", "session_start"]) \
        .reset_index(drop=True)
    want = duckdb.sql("""
        WITH ordered AS (
            SELECT user_id, ts,
                   CASE WHEN ts - lag(ts) OVER w > INTERVAL 30 MINUTE
                        OR lag(ts) OVER w IS NULL THEN 1 ELSE 0
                   END AS new_session
            FROM df WINDOW w AS (PARTITION BY user_id ORDER BY ts)
        ), tagged AS (
            SELECT user_id, ts,
                   SUM(new_session) OVER (
                       PARTITION BY user_id ORDER BY ts
                       ROWS UNBOUNDED PRECEDING) AS session_id
            FROM ordered)
        SELECT user_id,
               CAST(epoch_us(MIN(ts)) AS BIGINT) AS session_start,
               CAST(epoch_us(MAX(ts)) AS BIGINT) AS session_end,
               CAST(COUNT(*) AS BIGINT) AS n_events
        FROM tagged GROUP BY user_id, session_id
        ORDER BY user_id, session_start""").df()
    # sessionize returns timestamps; the oracle compares in epoch µs
    for col in ("session_start", "session_end"):
        got[col] = got[col].to_numpy().astype("datetime64[us]") \
            .astype(np.int64)
    got = got.sort_values(["user_id", "session_start"]) \
        .reset_index(drop=True)
    assert len(got) == len(want)
    for col in ("user_id", "session_start", "session_end",
                "n_events"):
        assert list(got[col]) == list(want[col]), col


def test_interval_join_matches_duckdb_on_random_frames(ray_session):
    import ray.data as rd
    from ksoup_ray.functions.joins import interval_join

    rng = np.random.RandomState(29)
    # non-overlapping intervals per key (the operator's contract):
    # carve each key's timeline into alternating in/out stretches
    rows = []
    iid = 0
    for key in range(5):
        t = 0
        while t < 5000:
            length = int(rng.randint(100, 600))
            if rng.rand() < 0.6:
                rows.append({"user_id": key,
                             "session_start": pd.Timestamp(
                                 t, unit="s"),
                             "session_end": pd.Timestamp(
                                 t + length, unit="s")})
                iid += 1
            t += length + int(rng.randint(1, 400))
    intervals = pd.DataFrame(rows)
    nl = 250
    ldf = pd.DataFrame({
        "event_id": np.arange(nl, dtype=np.int64),
        "user_id": rng.randint(0, 6, size=nl).astype(np.int64),
        "ts": pd.to_datetime(rng.randint(0, 6000, size=nl),
                             unit="s"),
    })
    got = interval_join(rd.from_pandas(ldf).repartition(3),
                        rd.from_pandas(intervals).repartition(2),
                        num_partitions=4).to_pandas() \
        .sort_values("left_row_id").reset_index(drop=True)
    want = duckdb.sql("""
        SELECT l.event_id AS left_row_id,
               COALESCE(CAST(epoch_us(i.session_start) AS BIGINT), -1)
                 AS interval_start_us,
               COALESCE(CAST(epoch_us(i.session_end) AS BIGINT), -1)
                 AS interval_end_us
        FROM ldf l LEFT JOIN intervals i
          ON l.user_id = i.user_id
         AND l.ts BETWEEN i.session_start AND i.session_end
        ORDER BY left_row_id""").df()
    assert len(got) == len(want)
    assert list(got["interval_start_us"]) \
        == list(want["interval_start_us"])
    assert list(got["interval_end_us"]) \
        == list(want["interval_end_us"])


def test_corr_pairs_matches_duckdb_on_random_frames(ray_session):
    import ray.data as rd
    from ksoup_ray.functions.agg import corr_pairs

    for seed in (3, 11):
        rng = np.random.RandomState(seed)
        n = 500
        df = pd.DataFrame({
            # b correlated with a, c independent, heavy ties in a
            "a": rng.randint(0, 20, size=n).astype(np.float64),
            "c": rng.rand(n).round(4),
        })
        df["b"] = (df["a"] * 3 + rng.randint(0, 10, size=n)) \
            .astype(np.float64)
        got = corr_pairs(rd.from_pandas(df).repartition(4),
                         {"a": 1, "b": 1, "c": 10000})
        want = duckdb.sql("""
            WITH s AS (SELECT COUNT(*) AS n,
              SUM(CAST(ROUND(a) AS HUGEINT)) AS s0,
              SUM(CAST(ROUND(a) AS HUGEINT)
                  * CAST(ROUND(a) AS HUGEINT)) AS q0,
              SUM(CAST(ROUND(b) AS HUGEINT)) AS s1,
              SUM(CAST(ROUND(b) AS HUGEINT)
                  * CAST(ROUND(b) AS HUGEINT)) AS q1,
              SUM(CAST(ROUND(c * 10000) AS HUGEINT)) AS s2,
              SUM(CAST(ROUND(c * 10000) AS HUGEINT)
                  * CAST(ROUND(c * 10000) AS HUGEINT)) AS q2,
              SUM(CAST(ROUND(a) AS HUGEINT)
                  * CAST(ROUND(b) AS HUGEINT)) AS p01,
              SUM(CAST(ROUND(a) AS HUGEINT)
                  * CAST(ROUND(c * 10000) AS HUGEINT)) AS p02,
              SUM(CAST(ROUND(b) AS HUGEINT)
                  * CAST(ROUND(c * 10000) AS HUGEINT)) AS p12
              FROM df)
            SELECT 'a' AS x_col, 'b' AS y_col,
              CAST(ROUND(CAST(n * p01 - s0 * s1 AS DOUBLE)
                / (sqrt(CAST(n * q0 - s0 * s0 AS DOUBLE))
                   * sqrt(CAST(n * q1 - s1 * s1 AS DOUBLE)))
                * 1000000.0) AS BIGINT) AS m FROM s
            UNION ALL SELECT 'a', 'c',
              CAST(ROUND(CAST(n * p02 - s0 * s2 AS DOUBLE)
                / (sqrt(CAST(n * q0 - s0 * s0 AS DOUBLE))
                   * sqrt(CAST(n * q2 - s2 * s2 AS DOUBLE)))
                * 1000000.0) AS BIGINT) FROM s
            UNION ALL SELECT 'b', 'c',
              CAST(ROUND(CAST(n * p12 - s1 * s2 AS DOUBLE)
                / (sqrt(CAST(n * q1 - s1 * s1 AS DOUBLE))
                   * sqrt(CAST(n * q2 - s2 * s2 AS DOUBLE)))
                * 1000000.0) AS BIGINT) FROM s
            ORDER BY x_col, y_col""").df()
        assert list(got["corr_micros"]) == list(want["m"]), seed
        # sanity: a~b strongly positive, a~c near zero
        ab = got[(got.x_col == "a") & (got.y_col == "b")] \
            ["corr_micros"].iloc[0]
        assert ab > 900_000, seed


def test_corr_pairs_exact_past_int64(ray_session):
    # squared sums overflow int64: values ~1e7, squares 1e14, 400 rows
    # per batch -> partial q ~4e16 fits, but the point is the OBJECT
    # dtype partials and the arbitrary-precision driver fold
    import ray.data as rd
    from ksoup_ray.functions.agg import corr_pairs

    rng = np.random.RandomState(5)
    df = pd.DataFrame({
        "x": (rng.rand(800) * 1e7).round(),
        "y": (rng.rand(800) * 1e7).round(),
    })
    got = corr_pairs(rd.from_pandas(df).repartition(3),
                     {"x": 100, "y": 100})
    # exact reference with python ints
    xs = [int(round(v * 100)) for v in df["x"]]
    ys = [int(round(v * 100)) for v in df["y"]]
    n = len(xs)
    import math
    num = n * sum(a * b for a, b in zip(xs, ys)) \
        - sum(xs) * sum(ys)
    den = (math.sqrt(float(n * sum(a * a for a in xs)
                           - sum(xs) ** 2))
           * math.sqrt(float(n * sum(b * b for b in ys)
                             - sum(ys) ** 2)))
    want = int(np.round(float(num) / den * 1_000_000))
    assert got["corr_micros"].iloc[0] == want


def test_pareto_front_matches_duckdb_on_random_frames(ray_session):
    import ray.data as rd
    from ksoup_ray.functions.agg import pareto_front

    for seed in (4, 13):
        rng = np.random.RandomState(seed)
        n = 600
        df = pd.DataFrame({
            "x": rng.randint(0, 40, size=n).astype(np.float64),
            "y": rng.rand(n).round(2) * 100,
        })
        got = pareto_front(rd.from_pandas(df).repartition(5),
                           x_col="x", y_col="y", y_scale=100)
        want = duckdb.sql("""
            WITH p AS (SELECT CAST(ROUND(x) AS BIGINT) AS x,
                              CAST(ROUND(y * 100) AS BIGINT) AS ys
                       FROM df),
            m AS (SELECT x, MAX(ys) AS ys FROM p GROUP BY x),
            w AS (SELECT x, ys, MAX(ys) OVER (ORDER BY x DESC
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                    AS best FROM m)
            SELECT x, ys FROM w WHERE best IS NULL OR ys > best
            ORDER BY x""").df()
        assert list(got["x"]) == list(want["x"]), seed
        assert list(got["y_scaled"]) == list(want["ys"]), seed


def test_pareto_front_dominance_invariant(ray_session):
    # no returned point may be dominated by ANY input point
    import ray.data as rd
    from ksoup_ray.functions.agg import pareto_front

    rng = np.random.RandomState(21)
    df = pd.DataFrame({"x": rng.randint(0, 15, 300).astype(float),
                       "y": rng.randint(0, 1000, 300).astype(float)})
    got = pareto_front(rd.from_pandas(df).repartition(4),
                       x_col="x", y_col="y", y_scale=1)
    xs = df["x"].astype(np.int64).to_numpy()
    ys = df["y"].astype(np.int64).to_numpy()
    for _, r in got.iterrows():
        # nothing strictly higher-x may tie-or-beat a frontier point
        assert not ((xs > r["x"]) & (ys >= r["y_scaled"])).any()


def test_weighted_median_matches_duckdb_on_random_frames(
        ray_session):
    import ray.data as rd
    from ksoup_ray.functions.agg import grouped_weighted_median

    for seed in (6, 17):
        rng = np.random.RandomState(seed)
        n = 500
        df = pd.DataFrame({
            "g": rng.choice(["a", "b"], size=n, p=[0.8, 0.2]),
            "v": rng.randint(1, 30, size=n).astype(np.float64),
            "w": rng.rand(n).round(2) * 100,
        })
        got = grouped_weighted_median(
            rd.from_pandas(df).repartition(4), key_col="g",
            val_col="v", weight_col="w", weight_scale=100)
        want = duckdb.sql("""
            WITH g AS (SELECT g AS k, CAST(ROUND(v) AS BIGINT) AS v,
                              SUM(CAST(ROUND(w * 100) AS BIGINT))
                                  AS w
                       FROM df GROUP BY 1, 2),
            c AS (SELECT k, v,
                         SUM(w) OVER (PARTITION BY k ORDER BY v)
                             AS cw,
                         SUM(w) OVER (PARTITION BY k) AS tw
                  FROM g)
            SELECT k, CAST(MIN(v) AS BIGINT) AS m
            FROM c WHERE 2 * cw >= tw GROUP BY k ORDER BY k""").df()
        assert list(got["w_median"]) == list(want["m"]), seed


def test_grouped_ols_recovers_known_line(ray_session):
    # exact line y = 7x + 3 -> slope/intercept micros are exact
    import ray.data as rd
    from ksoup_ray.functions.agg import grouped_ols

    x = np.arange(1, 201, dtype=np.float64)
    df = pd.DataFrame({"g": ["k"] * 200, "x": x, "y": 7 * x + 3})
    got = grouped_ols(rd.from_pandas(df).repartition(3),
                      key_col="g", x_col="x", y_col="y",
                      x_scale=1, y_scale=1)
    assert got["slope_micros"].iloc[0] == 7_000_000
    assert got["intercept_micros"].iloc[0] == 3_000_000


def test_grouped_ols_matches_duckdb_on_random_frames(ray_session):
    import ray.data as rd
    from ksoup_ray.functions.agg import grouped_ols

    rng = np.random.RandomState(8)
    n = 600
    df = pd.DataFrame({
        "g": rng.choice(["p", "q", "r"], size=n),
        "x": rng.randint(1, 50, size=n).astype(np.float64),
    })
    df["y"] = (df["x"] * rng.uniform(2, 5)
               + rng.rand(n) * 40).round(2)
    got = grouped_ols(rd.from_pandas(df).repartition(4),
                      key_col="g", x_col="x", y_col="y",
                      x_scale=1, y_scale=100)
    want = duckdb.sql("""
        WITH s AS (SELECT g, COUNT(*) AS n,
          SUM(CAST(ROUND(x) AS HUGEINT)) AS sx,
          SUM(CAST(ROUND(y * 100) AS HUGEINT)) AS sy,
          SUM(CAST(ROUND(x) AS HUGEINT)
              * CAST(ROUND(x) AS HUGEINT)) AS sxx,
          SUM(CAST(ROUND(x) AS HUGEINT)
              * CAST(ROUND(y * 100) AS HUGEINT)) AS sxy
          FROM df GROUP BY 1)
        SELECT g,
          CAST(ROUND(CAST(n * sxy - sx * sy AS DOUBLE)
                     / CAST(n * sxx - sx * sx AS DOUBLE)
                     * 1000000.0) AS BIGINT) AS sm,
          CAST(ROUND((CAST(sy AS DOUBLE)
                      - CAST(n * sxy - sx * sy AS DOUBLE)
                        / CAST(n * sxx - sx * sx AS DOUBLE)
                        * CAST(sx AS DOUBLE))
                     / CAST(n AS DOUBLE) * 1000000.0) AS BIGINT)
              AS im
        FROM s ORDER BY g""").df()
    assert list(got["slope_micros"]) == list(want["sm"])
    assert list(got["intercept_micros"]) == list(want["im"])
