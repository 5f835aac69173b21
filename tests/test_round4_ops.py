"""Unit tests for the session-8 round-4 operators: CUBE, OHLC bars,
UNPIVOT, xor checksums, sort-free NTILE, mutual edges, batched
Levenshtein, fuzzy near-dup, regex counts."""

import numpy as np
import pandas as pd
import pyarrow as pa


def test_cube_counts_all_grouping_sets(ray_session):
    import ray.data as rd
    from ksoup_ray.functions.agg import cube_counts

    rows = [{"lang": l, "source": s}
            for l, s in [("en", "a"), ("en", "a"), ("en", "b"),
                         ("de", "b")]]
    out = cube_counts(rd.from_items(rows).repartition(3),
                      ["lang", "source"])
    # 4 grouping sets: detail(4 distinct->3 rows), lang(2), source(2),
    # grand total(1)
    assert len(out) == 3 + 2 + 2 + 1
    gt = out[out["grouping_id"] == 3]
    assert len(gt) == 1 and int(gt["n"].iloc[0]) == 4
    # grouping_id=1: source rolled (lang kept)
    by_lang = out[out["grouping_id"] == 1].set_index("lang")["n"]
    assert int(by_lang["en"]) == 3 and int(by_lang["de"]) == 1
    # grouping_id=2: lang rolled (source kept)
    by_src = out[out["grouping_id"] == 2].set_index("source")["n"]
    assert int(by_src["a"]) == 2 and int(by_src["b"]) == 2


def test_ohlc_bars_order_and_buckets(ray_session):
    import datetime as dt
    import ray.data as rd
    from ksoup_ray.functions.agg import ohlc_bars

    t0 = dt.datetime(2024, 1, 1)

    def ev(eid, sec, val):
        return {"event_id": eid, "user_id": 7,
                "ts": t0 + dt.timedelta(seconds=sec), "value": val}

    rows = [
        ev(1, 0, 5.0), ev(2, 10, 9.0), ev(3, 20, 1.0), ev(4, 30, 4.0),
        # same ts as event 4 but larger event_id: close must be 6.0
        ev(5, 30, 6.0),
        # next hour bucket
        ev(6, 3700, 2.5),
    ]
    out = ohlc_bars(rd.from_items(rows).repartition(3),
                    num_partitions=2).to_pandas() \
        .sort_values("bucket").reset_index(drop=True)
    assert len(out) == 2
    b0 = out.iloc[0]
    assert (b0["open_e6"], b0["high_e6"], b0["low_e6"],
            b0["close_e6"], b0["n"]) == (5_000_000, 9_000_000,
                                         1_000_000, 6_000_000, 5)
    b1 = out.iloc[1]
    assert b1["open_e6"] == b1["close_e6"] == 2_500_000
    assert b1["n"] == 1


def test_melt_measures_round_trip(ray_session):
    import ray.data as rd
    from ksoup_ray.functions.agg import melt_measures

    rows = [{"k": 1, "x": 1.5, "y": -2.25},
            {"k": 2, "x": 0.0, "y": 10.0}]
    out = melt_measures(rd.from_items(rows), id_cols=["k"],
                        measure_cols=["x", "y"]).to_pandas()
    assert len(out) == 4
    piv = out.pivot(index="k", columns="measure",
                    values="value_e6")
    assert int(piv.loc[1, "x"]) == 1_500_000
    assert int(piv.loc[1, "y"]) == -2_250_000
    assert int(piv.loc[2, "y"]) == 10_000_000


def test_group_xor_checksum_order_free(ray_session):
    import hashlib
    import ray.data as rd
    from ksoup_ray.functions.agg import group_xor_checksum

    texts = ["alpha", "beta", "gamma"]
    rows = [{"lang": "en", "text": t} for t in texts] \
        + [{"lang": "de", "text": "delta"}]
    out = group_xor_checksum(rd.from_items(rows).repartition(4),
                             key_col="lang", text_col="text") \
        .set_index("lang")

    def h60(t):
        return int.from_bytes(
            hashlib.md5(t.encode()).digest()[:8], "big") >> 4

    want = 0
    for t in texts:
        want ^= h60(t)
    assert int(out.loc["en", "checksum"]) == want
    assert int(out.loc["en", "n"]) == 3
    assert int(out.loc["de", "checksum"]) == h60("delta")


def test_ntile_by_group_matches_sql_rule(ray_session):
    import ray.data as rd
    from ksoup_ray.functions.agg import ntile_by_group

    # lang en: 6 rows -> NTILE(4) sizes 2,2,1,1; ties on val broken
    # by id. lang de: 3 rows (< tiles) -> tile == row_number.
    rows = [{"doc_id": i, "lang": "en", "n_chars": v}
            for i, v in [(1, 10), (2, 10), (3, 20), (4, 5), (5, 30),
                         (6, 20)]] \
        + [{"doc_id": i, "lang": "de", "n_chars": 7} for i in
           (10, 11, 12)]
    out = ntile_by_group(rd.from_items(rows).repartition(3),
                         key_col="lang", val_col="n_chars",
                         tie_col="doc_id", n_tiles=4,
                         num_partitions=2).to_pandas() \
        .set_index("doc_id")["tile"]
    # en order by (n_chars, doc_id): 4,1,2,3,6,5 ->
    # tiles 1,1,2,2,3,4
    assert list(out.loc[[4, 1, 2, 3, 6, 5]]) == [1, 1, 2, 2, 3, 4]
    # de: 3 rows over 4 tiles -> rn
    assert list(out.loc[[10, 11, 12]]) == [1, 2, 3]


def test_mutual_edges_detects_reciprocal_only(ray_session):
    import ray.data as rd
    from ksoup_ray.functions.graph import mutual_edges

    rows = [{"src": 1, "dst": 2}, {"src": 2, "dst": 1},   # mutual
            {"src": 3, "dst": 4},                          # one-way
            {"src": 5, "dst": 5},                          # self-loop
            {"src": 6, "dst": 7}, {"src": 7, "dst": 6}]   # mutual
    out = mutual_edges(rd.from_items(rows).repartition(3)) \
        .to_pandas().sort_values("a").reset_index(drop=True)
    assert list(map(tuple, out[["a", "b"]].to_numpy())) \
        == [(1, 2), (6, 7)]


def test_batched_levenshtein_matches_classic():
    from ksoup_ray.functions.dedup import batched_levenshtein

    def ref(a, b):
        la, lb = len(a), len(b)
        dp = list(range(lb + 1))
        for i in range(1, la + 1):
            prev, dp[0] = dp[0], i
            for j in range(1, lb + 1):
                cur = min(dp[j] + 1, dp[j - 1] + 1,
                          prev + (a[i - 1] != b[j - 1]))
                prev, dp[j] = dp[j], cur
        return dp[lb]

    cases = [("kitten", "sitting"), ("", "abc"), ("abc", ""),
             ("same", "same"), ("a", "b"), ("ab", "ba"),
             ("flaw", "lawn"), ("gumbo", "gambol"),
             ("xxxxxxxxxxxxxxxxxx", "yxxxxxxxxxxxxxxxxy")]
    got = batched_levenshtein([a for a, _ in cases],
                              [b for _, b in cases])
    want = [ref(a, b) for a, b in cases]
    assert list(got) == want


def test_fuzzy_neardup_pairs_blocked(ray_session):
    import ray.data as rd
    from ksoup_ray.functions.dedup import fuzzy_neardup_pairs

    # same 6-char block "prefix", suffixes 1 edit apart for (1,2);
    # doc 3 in another block never pairs even though identical suffix
    rows = [
        {"doc_id": 1, "text": "prefixsuffix-aaaa-bbbb"},
        {"doc_id": 2, "text": "prefixsuffix-aaaa-bbbc"},
        {"doc_id": 3, "text": "otherbsuffix-aaaa-bbbb"},
        {"doc_id": 4, "text": "prefixzzzzzzzzzzzzzzzz"},
    ]
    out = fuzzy_neardup_pairs(
        rd.from_items(rows).repartition(2), max_dist=2,
        num_partitions=4).to_pandas()
    assert list(map(tuple, out[["id_a", "id_b", "dist"]]
                    .to_numpy())) == [(1, 2, 1)]


def test_regex_count_batch_re2_semantics():
    from ksoup_ray.functions.textstats import regex_count_batch

    batch = pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "text": pa.array(["aa bee ooze i", "xyz", "aaaa"],
                         pa.string()),
    })
    out = regex_count_batch(batch)
    # non-overlapping: "aaaa" is ONE match of [aeiou]{2,}
    assert out.column("n_matches").to_pylist() == [3, 0, 1]


def test_semi_join_keeps_matches_once(ray_session):
    import ray.data as rd
    from ksoup_ray.functions.joins import semi_join

    left = rd.from_items([{"k": 1, "v": "a"}, {"k": 2, "v": "b"},
                          {"k": 3, "v": "c"}])
    # key 1 appears TWICE on the right: left row must appear ONCE
    right = rd.from_items([{"r": 1}, {"r": 1}, {"r": 9}])
    out = semi_join(left, right, left_on="k", right_on="r",
                    num_partitions=2).to_pandas()
    assert sorted(out["k"]) == [1]
    assert list(out.columns) == ["k", "v"]


def test_window_frame_sum_clamps_at_segment_head(ray_session):
    import datetime as dt
    import ray.data as rd
    from ksoup_ray.functions.agg import window_frame_sum

    t0 = dt.datetime(2024, 1, 1)
    rows = [{"event_id": i, "user_id": 1,
             "ts": t0 + dt.timedelta(seconds=i), "value": float(v)}
            for i, v in enumerate([1, 2, 3, 4, 5, 6])] \
        + [{"event_id": 100, "user_id": 2, "ts": t0, "value": 10.0}]
    out = window_frame_sum(rd.from_items(rows).repartition(3),
                           preceding=3, num_partitions=2) \
        .to_pandas().set_index("event_id")
    # user 1, row i: sum of up to 4 trailing values
    assert int(out.loc[0, "frame_sum_e6"]) == 1_000_000
    assert int(out.loc[2, "frame_sum_e6"]) == 6_000_000   # 1+2+3
    assert int(out.loc[3, "frame_sum_e6"]) == 10_000_000  # 1+2+3+4
    assert int(out.loc[5, "frame_sum_e6"]) == 18_000_000  # 3+4+5+6
    assert int(out.loc[5, "n_in"]) == 4
    # user 2's single row never sees user 1's values
    assert int(out.loc[100, "frame_sum_e6"]) == 10_000_000
    assert int(out.loc[100, "n_in"]) == 1


def test_grouped_argmax_tie_breaks_small_id(ray_session):
    import ray.data as rd
    from ksoup_ray.functions.agg import grouped_argmax

    rows = [{"g": "a", "id": 5, "v": 10}, {"g": "a", "id": 2, "v": 10},
            {"g": "a", "id": 1, "v": 3}, {"g": "b", "id": 9, "v": 1}]
    out = grouped_argmax(rd.from_items(rows).repartition(3),
                         key_cols=["g"], val_col="v", id_col="id") \
        .set_index("g")
    assert int(out.loc["a", "id"]) == 2   # tie at v=10 -> smaller id
    assert int(out.loc["b", "id"]) == 9


def test_bfs_frontier_min_hop_labels(ray_session):
    import ray.data as rd
    from ksoup_ray.functions.graph import bfs_frontier

    # 1 -> 2 -> 3 -> 4; 2 -> 1 (back edge); seed {1}
    edges = rd.from_items([{"src": 1, "dst": 2}, {"src": 2, "dst": 3},
                           {"src": 3, "dst": 4}, {"src": 2, "dst": 1}])
    out = bfs_frontier(edges, [1], max_hops=2).set_index("node")["hop"]
    assert dict(out) == {1: 0, 2: 1, 3: 2}  # 4 is 3 hops: excluded


def test_bpe_pair_counts_in_word_only(ray_session):
    import ray.data as rd
    from ksoup_ray.functions.curation import bpe_pair_counts

    # "ab ab cd" -> pairs: ab x2, cd x1; "bc" never (spans the space)
    rows = [{"text": "ab ab"}, {"text": "cd"}]
    out = bpe_pair_counts(rd.from_items(rows).repartition(2), k=10)
    assert list(map(tuple, out.to_numpy())) == [("ab", 2), ("cd", 1)]


def test_argmax_per_key_unbounded_keys(ray_session):
    import ray.data as rd
    from ksoup_ray.functions.agg import argmax_per_key

    rows = [{"k": 10, "id": 1, "v": 5}, {"k": 10, "id": 7, "v": 9},
            {"k": 10, "id": 3, "v": 9},   # tie at 9 -> id 3 wins
            {"k": 20, "id": 4, "v": 0}]
    out = argmax_per_key(rd.from_items(rows).repartition(3),
                         key_col="k", val_col="v", id_col="id",
                         num_partitions=4) \
        .to_pandas().set_index("k").sort_index()
    assert int(out.loc[10, "id"]) == 3 and int(out.loc[10, "v"]) == 9
    assert int(out.loc[20, "id"]) == 4


def test_grouped_quantiles_discrete_rule(ray_session):
    import ray.data as rd
    from ksoup_ray.functions.curation import grouped_quantiles

    # g=a has 4 values [1,2,3,4]: ceil(.25*4)=1st -> 1,
    # ceil(.5*4)=2nd -> 2, ceil(.75*4)=3rd -> 3
    rows = [{"g": "a", "v": v} for v in (4, 1, 3, 2)] \
        + [{"g": "b", "v": 7}]
    out = grouped_quantiles(rd.from_items(rows).repartition(2),
                            key_col="g", val_col="v").set_index("g")
    assert (int(out.loc["a", "q25"]), int(out.loc["a", "q50"]),
            int(out.loc["a", "q75"])) == (1, 2, 3)
    assert (int(out.loc["b", "q25"]), int(out.loc["b", "q50"]),
            int(out.loc["b", "q75"])) == (7, 7, 7)


def test_windowed_distinct_counts_users_once(ray_session):
    import datetime as dt
    import ray.data as rd
    from ksoup_ray.functions.agg import windowed_distinct

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        # user 1 clicks twice in hour 0: counts once
        {"event_type": "click", "user_id": 1, "ts": t0},
        {"event_type": "click", "user_id": 1,
         "ts": t0 + dt.timedelta(minutes=30)},
        {"event_type": "click", "user_id": 2, "ts": t0},
        # same user next hour: counts again there
        {"event_type": "click", "user_id": 1,
         "ts": t0 + dt.timedelta(hours=1)},
        {"event_type": "view", "user_id": 1, "ts": t0},
    ]
    out = windowed_distinct(rd.from_items(rows).repartition(3)) \
        .to_pandas().sort_values(["event_type", "window_start"]) \
        .reset_index(drop=True)
    assert list(out["n_users"]) == [2, 1, 1]
    assert list(out["event_type"]) == ["click", "click", "view"]


def test_outline_and_audit_stages_direct():
    from ksoup_ray.stages.extract import (ImgAuditStage,
                                          MetaRobotsStage,
                                          OutlineStage)

    html = ('<html><head>'
            '<meta name="robots" content=" NOINDEX , other ">'
            '</head><body><h1>A</h1><h2>B</h2><div><h3>C</h3></div>'
            '<img src="x"><img src="y" alt=""><img src="z" alt="t">'
            '</body></html>')
    batch = pa.table({"doc_id": pa.array([1], pa.int64()),
                      "html": pa.array([html], pa.string())})
    out = OutlineStage()(batch)
    assert out.column("level").to_pylist() == [1, 2, 3]
    assert out.column("text").to_pylist() == ["A", "B", "C"]
    assert out.column("pos").to_pylist() == [0, 1, 2]

    audit = ImgAuditStage()(batch)
    # alt="" counts as PRESENT: only the first img is missing
    assert audit.column("n_imgs").to_pylist() == [3]
    assert audit.column("n_missing_alt").to_pylist() == [1]

    robots = MetaRobotsStage()(batch)
    # case-insensitive, whitespace-tolerant token scan; nofollow absent
    assert robots.column("has_meta").to_pylist() == [1]
    assert robots.column("noindex").to_pylist() == [1]
    assert robots.column("nofollow").to_pylist() == [0]


def test_median_interp_matches_percentile_cont(ray_session):
    import duckdb

    import __ray_entry__ as m

    got = m.queries()["median_interp"]("/root/testdata/sf0.001") \
        .sort_values("lang").reset_index(drop=True)
    con = duckdb.connect()
    con.sql("CREATE VIEW documents AS SELECT * FROM "
            "'/root/testdata/sf0.001/documents.parquet'")
    want = con.sql(
        "SELECT lang, CAST(quantile_cont(n_chars, 0.5) * 2 AS BIGINT)"
        " AS median_x2 FROM documents GROUP BY lang ORDER BY lang"
    ).df()
    assert list(got["median_x2"]) == list(want["median_x2"])


def test_emb_stats_trunc_and_segments(ray_session):
    import pyarrow.parquet as pq

    import __ray_entry__ as m

    out = m.queries()["emb_stats"]("/root/testdata/sf0.001") \
        .to_pandas().set_index("vec_id")
    row = pq.read_table("/root/testdata/sf0.001/embeddings.parquet") \
        .slice(0, 1).to_pylist()[0]
    vec = row["embedding"]
    want = np.trunc(np.asarray(vec, np.float64) * 10**6) \
        .astype(np.int64)
    got = out.loc[row["vec_id"]]
    assert int(got["dim"]) == len(vec)
    assert int(got["min_e6"]) == want.min()
    assert int(got["max_e6"]) == want.max()
    assert int(got["l1_e6"]) == np.abs(want).sum()


def test_grouped_dense_rank_skips_no_numbers(ray_session):
    import ray.data as rd
    from ksoup_ray.functions.agg import grouped_dense_rank

    rows = [{"id": 1, "g": "a", "v": 10}, {"id": 2, "g": "a", "v": 10},
            {"id": 3, "g": "a", "v": 30}, {"id": 4, "g": "b", "v": 99}]
    out = grouped_dense_rank(rd.from_items(rows).repartition(2),
                             key_col="g", val_col="v", id_col="id") \
        .to_pandas().set_index("id")["dense_rank"]
    # dense: ties share a rank and the next distinct value is rank+1
    assert list(out.loc[[1, 2, 3, 4]]) == [1, 1, 2, 1]


def test_batched_levenshtein_property():
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from ksoup_ray.functions.dedup import batched_levenshtein

    def ref(a, b):
        la, lb = len(a), len(b)
        dp = list(range(lb + 1))
        for i in range(1, la + 1):
            prev, dp[0] = dp[0], i
            for j in range(1, lb + 1):
                cur = min(dp[j] + 1, dp[j - 1] + 1,
                          prev + (a[i - 1] != b[j - 1]))
                prev, dp[j] = dp[j], cur
        return dp[lb]

    pair = st.tuples(st.text("abcdef", max_size=12),
                     st.text("abcdef", max_size=12))

    @settings(max_examples=50, deadline=None)
    @given(st.lists(pair, min_size=1, max_size=20))
    def check(pairs):
        got = batched_levenshtein([a for a, _ in pairs],
                                  [b for _, b in pairs])
        assert list(got) == [ref(a, b) for a, b in pairs]

    check()


def test_exact_drop_ids_losers_only(ray_session):
    import ray.data as rd
    from ksoup_ray.functions.dedup import exact_drop_ids

    rows = [{"doc_id": 3, "text": "aaa"}, {"doc_id": 1, "text": "aaa"},
            {"doc_id": 2, "text": "bbb"}, {"doc_id": 9, "text": "aaa"}]
    out = exact_drop_ids(rd.from_items(rows).repartition(3),
                         num_partitions=4).to_pandas()
    # keep lowest id per text: 1 (aaa), 2 (bbb); losers = 3, 9
    assert sorted(out["doc_id"]) == [3, 9]


def test_explode_bigrams_contract():
    from ksoup_ray.functions.curation import _explode_bigrams

    s = pd.Series(["a b c", "x", "", "p q"])
    doc_idx, codes, vocab, n_grams = _explode_bigrams(s)
    grams = [vocab[c] for c in codes]
    assert list(doc_idx) == [0, 0, 3]
    assert grams == ["a b", "b c", "p q"]
    # single-word and empty docs emit nothing; counts floor at 0
    assert list(n_grams) == [2, 0, 0, 1]


def test_sharded_index_membership_and_incremental(ray_session):
    import ray.data as rd
    from ksoup_ray.state.index import ShardedIndex, incremental_dedup

    idx = ShardedIndex(n_shards=3)
    idx.add_texts(["aaa", "bbb"])
    idx.add_texts(["ccc"])
    got = idx.contains_texts(["aaa", "zzz", "ccc", "bbb"])
    assert list(got) == [True, False, True, True]
    assert idx.total_size() == 3

    prev = rd.from_items([{"doc_id": 0, "text": "old1"},
                          {"doc_id": 2, "text": "old2"}])
    # doc 5 repeats snapshot-A content; docs 7/9 duplicate each
    # other within B -> min-id 7 wins
    new = rd.from_items([{"doc_id": 5, "text": "old2"},
                         {"doc_id": 7, "text": "fresh"},
                         {"doc_id": 9, "text": "fresh"},
                         {"doc_id": 11, "text": "alone"}])
    out = incremental_dedup(prev.repartition(2), new.repartition(3),
                            n_shards=2, num_partitions=4) \
        .to_pandas().sort_values("doc_id")
    assert list(out["doc_id"]) == [7, 11]


def test_dom_depth_and_structural_stages_direct():
    import pyarrow as pa
    from ksoup_ray.sources.synth import render_depth_page
    from ksoup_ray.stages.extract import (DomDepthStage,
                                          StructuralCssStage)

    ids = list(range(14))
    batch = pa.table({
        "doc_id": pa.array(ids, pa.int64()),
        "html": pa.array([render_depth_page(i) for i in ids],
                         pa.string())})
    out = DomDepthStage()(batch)
    assert out.column("max_depth").to_pylist() \
        == [i % 7 + 6 for i in ids]
    assert out.column("n_elements").to_pylist() \
        == [11 + i % 7 + i % 6 for i in ids]

    css = StructuralCssStage()(batch)
    n = [i % 6 + 2 for i in ids]
    assert css.column("n_odd").to_pylist() == [(v + 1) // 2
                                               for v in n]
    assert css.column("n_even").to_pylist() == [v // 2 for v in n]
    assert css.column("n_adj").to_pylist() == [v - 1 for v in n]
    assert css.column("n_sib").to_pylist() == [v - 1 for v in n]


def test_dom_depth_stage_hostile_inputs():
    # deep nesting far past any recursion limit + degenerate docs
    import pyarrow as pa
    from ksoup_ray.stages.extract import DomDepthStage

    deep = "<div>" * 5000 + "x" + "</div>" * 5000
    batch = pa.table({
        "doc_id": pa.array([0, 1, 2], pa.int64()),
        "html": pa.array([deep, "", "plain text"], pa.string())})
    out = DomDepthStage()(batch)
    d = out.column("max_depth").to_pylist()
    # html > body > 5000 divs
    assert d[0] >= 5000
    # empty/bare inputs still produce the implied html/head/body shell
    assert d[1] >= 1 and d[2] >= 1
