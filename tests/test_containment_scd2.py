"""Containment near-dup join (asymmetric |A∩B|/|A|) and SCD type-2
intervalization — round-4 additions to the dedup and event families."""

import numpy as np
import pandas as pd
import pyarrow as pa


def test_containment_catches_subset_dup_jaccard_misses(ray_session):
    """A short doc quoted whole inside a much longer one: containment
    ~1 in that direction, but Jaccard far below 0.5."""
    import ray.data as rd
    from ksoup_ray.functions.dedup import (containment_pairs,
                                           jaccard_pairs_exact,
                                           ngram_jaccard)

    short = " ".join(f"core{i}" for i in range(20))
    long_ = short + " " + " ".join(f"pad{i}" for i in range(200))
    other = " ".join(f"zz{i}" for i in range(30))
    t = pa.table({"doc_id": pa.array([1, 2, 3], pa.int64()),
                  "text": [short, long_, other]})
    assert ngram_jaccard(short, long_, 5) < 0.5  # Jaccard blind spot

    jac = jaccard_pairs_exact(rd.from_arrow(t), shingle_size=5,
                              threshold=0.5, max_df=None).to_pandas()
    assert len(jac) == 0

    got = containment_pairs(rd.from_arrow(t), shingle_size=5,
                            threshold_ppm=600_000,
                            max_df=None).to_pandas()
    rows = set(map(tuple, got[["id_sub", "id_super"]].to_numpy()))
    assert rows == {(1, 2)}  # short contained in long, not vice versa
    assert int(got["cont_ppm"].iloc[0]) == 1_000_000


def test_containment_matches_bruteforce(ray_session, sf_dir):
    import itertools

    import pyarrow.parquet as pq
    import ray.data as rd
    from ksoup_ray.functions.dedup import containment_pairs, word_shingles

    t = pq.read_table(f"{sf_dir}/documents.parquet",
                      columns=["doc_id", "text"]).slice(0, 120)
    sets = {i: set(word_shingles(x or "", 5))
            for i, x in zip(t.column("doc_id").to_pylist(),
                            t.column("text").to_pylist())}
    want = set()
    for a, b in itertools.permutations(sets, 2):
        inter = len(sets[a] & sets[b])
        if inter and inter * 1_000_000 >= 600_000 * len(sets[a]):
            want.add((a, b, inter * 1_000_000 // len(sets[a])))

    got = containment_pairs(rd.from_arrow(t), shingle_size=5,
                            threshold_ppm=600_000,
                            max_df=None).to_pandas()
    assert set(map(tuple, got.to_numpy())) == want
    assert len(want) > 0


def test_scd2_intervals_crafted(ray_session):
    import ray.data as rd
    from ksoup_ray.functions.agg import scd2_intervals

    def us(s):
        return np.datetime64(s, "us")

    t = pa.table({
        "user_id": pa.array([1, 1, 1, 1, 2], pa.int64()),
        "event_type": ["a", "a", "b", "a", "x"],
        "ts": pa.array([us("2024-01-01T00:00"), us("2024-01-01T01:00"),
                        us("2024-01-01T02:00"), us("2024-01-01T03:00"),
                        us("2024-01-02T00:00")],
                       pa.timestamp("us")),
        "event_id": pa.array([10, 11, 12, 13, 14], pa.int64()),
    })
    got = scd2_intervals(rd.from_arrow(t)).to_pandas() \
        .sort_values(["user_id", "valid_from"]).reset_index(drop=True)
    # user 1: run a (00:00-02:00), run b (02:00-03:00), run a (03:00-)
    assert list(got["event_type"]) == ["a", "b", "a", "x"]
    assert got["valid_to"].iloc[0] == pd.Timestamp("2024-01-01T02:00")
    assert got["valid_to"].iloc[1] == pd.Timestamp("2024-01-01T03:00")
    assert pd.isna(got["valid_to"].iloc[2])  # open current interval
    assert pd.isna(got["valid_to"].iloc[3])


def test_scd2_intervals_matches_pandas(ray_session, sf_dir):
    """Distributed runs == a single-process pandas groupby replay over
    the real events table."""
    import pyarrow.parquet as pq
    import ray.data as rd
    from ksoup_ray.functions.agg import scd2_intervals

    t = pq.read_table(f"{sf_dir}/events.parquet",
                      columns=["user_id", "event_type", "ts", "event_id"])
    df = t.to_pandas().sort_values(["user_id", "ts", "event_id"])
    change = (df["user_id"].ne(df["user_id"].shift())
              | df["event_type"].ne(df["event_type"].shift()))
    runs = df[change].copy()
    nxt_from = runs.groupby("user_id")["ts"].shift(-1)
    want = pd.DataFrame({
        "user_id": runs["user_id"].to_numpy(),
        "event_type": runs["event_type"].to_numpy(),
        "valid_from": runs["ts"].to_numpy(),
        "valid_to": nxt_from.to_numpy(),
    }).sort_values(["user_id", "valid_from"]).reset_index(drop=True)

    got = scd2_intervals(rd.from_arrow(t)).to_pandas() \
        .sort_values(["user_id", "valid_from"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want)
