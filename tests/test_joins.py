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
