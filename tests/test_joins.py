"""asof_join (functions/joins.py): edge semantics — equal timestamps
match (>=), no prior right row yields the sentinel, keys with no right
rows at all resolve entirely to sentinels, and the deterministic
duplicate-ts tie rule holds."""

import datetime as dt

import pytest


def _ts(sec):
    return dt.datetime(2024, 1, 1) + dt.timedelta(seconds=sec)


@pytest.fixture()
def joined(ray_session):
    import ray.data as rd
    from ksoup_ray.functions.joins import asof_join

    left = rd.from_items([
        {"event_id": 1, "user_id": 10, "ts": _ts(1), "value": 0.0},
        {"event_id": 3, "user_id": 10, "ts": _ts(3), "value": 0.0},
        {"event_id": 5, "user_id": 10, "ts": _ts(9), "value": 0.0},
        {"event_id": 7, "user_id": 11, "ts": _ts(5), "value": 0.0},
    ])
    right = rd.from_items([
        {"event_id": 2, "user_id": 10, "ts": _ts(3), "value": 2.5},
        {"event_id": 4, "user_id": 10, "ts": _ts(3), "value": 4.5},
        {"event_id": 6, "user_id": 10, "ts": _ts(7), "value": 6.5},
    ])
    out = asof_join(left, right).to_pandas() \
        .set_index("left_row_id").sort_index()
    return out


def test_no_prior_right_row_is_sentinel(joined):
    assert joined.loc[1, "matched_id"] == -1
    assert joined.loc[1, "matched_val"] == 0.0


def test_equal_timestamp_matches_and_tie_breaks_on_id(joined):
    # two right rows at ts=3; >= includes them; larger id wins
    assert joined.loc[3, "matched_id"] == 4
    assert joined.loc[3, "matched_val"] == 4.5


def test_latest_at_or_before(joined):
    assert joined.loc[5, "matched_id"] == 6


def test_key_with_no_right_rows(joined):
    assert joined.loc[7, "matched_id"] == -1


def test_interval_join_bounds_and_sentinels(ray_session):
    import ray.data as rd
    from ksoup_ray.functions.joins import interval_join

    left = rd.from_items([
        {"event_id": 1, "user_id": 10, "ts": _ts(5)},    # inside
        {"event_id": 2, "user_id": 10, "ts": _ts(10)},   # == end
        {"event_id": 3, "user_id": 10, "ts": _ts(11)},   # in gap
        {"event_id": 4, "user_id": 10, "ts": _ts(20)},   # == start
        {"event_id": 5, "user_id": 11, "ts": _ts(5)},    # no intervals
    ])
    iv = rd.from_items([
        {"user_id": 10, "session_start": _ts(0),
         "session_end": _ts(10)},
        {"user_id": 10, "session_start": _ts(20),
         "session_end": _ts(30)},
    ])
    out = interval_join(left, iv).to_pandas() \
        .set_index("left_row_id").sort_index()
    us = lambda sec: int(_ts(sec).timestamp() * 1_000_000)
    assert out.loc[1, "interval_start_us"] == us(0)
    assert out.loc[2, "interval_end_us"] == us(10)   # inclusive end
    assert out.loc[3, "interval_start_us"] == -1     # gap
    assert out.loc[4, "interval_start_us"] == us(20)  # inclusive start
    assert out.loc[5, "interval_start_us"] == -1     # keyless


def test_hopping_window_count_matches_naive(ray_session):
    import collections
    import ray.data as rd
    from ksoup_ray.functions.agg import hopping_window_count

    W, H = 40_000_000, 10_000_000   # 40s window hopping 10s
    rows = [{"event_type": t, "ts": _ts(s)}
            for t, s in [("a", 1), ("a", 9), ("a", 41), ("b", 100),
                         ("b", 100), ("a", 100)]]
    got = hopping_window_count(rd.from_items(rows), window_us=W,
                               hop_us=H).to_pandas()
    want = collections.Counter()
    for r in rows:
        tu = int(r["ts"].timestamp() * 1_000_000)
        base = (tu // H) * H
        for j in range(W // H):
            want[(r["event_type"], base - j * H)] += 1
    got_map = {(r.event_type, r.window_start): r.n
               for r in got.itertuples()}
    assert got_map == dict(want)


def test_grouped_topk_combine_correctness(ray_session):
    """The map-side per-batch top-k combine must not lose a global
    winner that was not in its batch's local top-k — exercised by
    forcing batch splits smaller than a key's row count."""
    import ray.data as rd
    from ksoup_ray.functions.agg import grouped_topk

    rows = [{"doc_id": i, "lang": "en", "n": i % 7} for i in range(40)]
    rows += [{"doc_id": 100 + i, "lang": "de", "n": 50 - i}
             for i in range(5)]
    out = grouped_topk(rd.from_items(rows), key_col="lang",
                       val_col="n", id_col="doc_id", k=3).to_pandas()
    en = out[out["lang"] == "en"].sort_values(
        ["n", "doc_id"], ascending=[False, True])
    # global winners: n=6 at doc_ids 6,13,20 (ties break on id asc)
    assert en["doc_id"].tolist() == [6, 13, 20]
    de = out[out["lang"] == "de"]
    assert sorted(de["doc_id"]) == [100, 101, 102]


def _naive_asof(levents, revents, gap_id=-1):
    out = []
    for (lid, k, lts) in levents:
        best = None
        for (rid, rk, rts, rv) in revents:
            if rk == k and rts <= lts and \
                    (best is None or (rts, rid) > (best[2], best[0])):
                best = (rid, rk, rts, rv)
        out.append((lid, k, lts, best[0] if best else gap_id,
                    best[3] if best else 0.0))
    return sorted(out)


def test_asof_block_kernel_many_keys_per_bucket(ray_session):
    """Cross-key leakage guard: with num_partitions=2 every bucket
    holds MANY keys — the running-max scan must reset at each key
    segment. Compared against a naive quadratic reference."""
    import datetime
    import random
    import ray.data as rd
    from ksoup_ray.functions.joins import asof_join

    rng = random.Random(7)
    epoch = datetime.datetime(2024, 1, 1)

    def ts(s):
        return epoch + datetime.timedelta(seconds=s)

    lrows, rrows = [], []
    for i in range(200):
        k = rng.randrange(17)
        lrows.append({"event_id": i, "user_id": k,
                      "ts": ts(rng.randrange(1000))})
    for j in range(120):
        k = rng.randrange(17)
        rrows.append({"event_id": 10_000 + j, "user_id": k,
                      "ts": ts(rng.randrange(1000)),
                      "value": float(j)})
    left = rd.from_items(lrows)
    right = rd.from_items(rrows)
    got = asof_join(left, right, num_partitions=2).to_pandas()
    got_t = sorted(
        (int(r.left_row_id), int(r.user_id), int(r.ts_us),
         int(r.matched_id), float(r.matched_val))
        for r in got.itertuples())
    lev = [(r["event_id"], r["user_id"],
            int(r["ts"].timestamp() * 1e6)) for r in lrows]
    rev = [(r["event_id"], r["user_id"],
            int(r["ts"].timestamp() * 1e6), r["value"])
           for r in rrows]
    assert got_t == _naive_asof(lev, rev)


def test_sessionize_block_kernel_many_users_per_bucket(ray_session):
    """Same guard for sessionize: user-change boundaries must split
    sessions even when several users share one bucket block."""
    import datetime
    import ray.data as rd
    from ksoup_ray.functions.agg import sessionize

    epoch = datetime.datetime(2024, 1, 1)

    def ts(s):
        return epoch + datetime.timedelta(seconds=s)

    rows = []
    # users 0..9 each: 3 events tight, 30-min+ gap, 2 events tight —
    # user boundaries are ALSO < gap apart in time, so a kernel that
    # forgot the user-change flag would fuse adjacent users' sessions
    for u in range(10):
        base = u * 10            # users overlap in time
        rows += [{"user_id": u, "ts": ts(base + d)} for d in (0, 5, 9)]
        rows += [{"user_id": u, "ts": ts(base + 2000 + d)}
                 for d in (0, 3)]
    out = sessionize(rd.from_items(rows), gap_seconds=1800,
                     num_partitions=2).to_pandas()
    assert len(out) == 20
    per_user = out.groupby("user_id").agg(
        n=("n_events", "sum"), sessions=("n_events", "size"))
    assert (per_user["n"] == 5).all()
    assert (per_user["sessions"] == 2).all()
    assert set(out["n_events"]) == {2, 3}
