"""Round-4 operators: word entropy, hash splits, weighted resampling,
grouped z-score, co-citation pairs, BM25 top-k search, length band
filter, per-label centroids. Kernel differentials vs naive Python; the
value-level gate is the driver's DuckDB oracles."""

import hashlib
import math

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from ksoup_ray.functions.textstats import word_entropy_batch


def _naive_entropy_micros(text: str) -> int:
    words = text.split(" ")
    n = len(words)
    from collections import Counter
    total = 0
    for c in Counter(words).values():
        total += int(np.round(c / n * math.log(n / c) * 1_000_000.0))
    return total


def test_word_entropy_matches_naive():
    texts = ["a b a b", "x", "", "one two three", "z z z z z",
             "the the the cat sat on the mat"]
    b = pa.table({"doc_id": list(range(len(texts))), "text": texts})
    out = word_entropy_batch(b).to_pydict()
    assert out["entropy_micros"] == [
        _naive_entropy_micros(t) for t in texts]
    # single-word and empty docs have zero entropy by convention
    assert out["entropy_micros"][1] == 0
    assert out["entropy_micros"][2] == 0


def test_md5_bucket_fraction_matches_hashlib():
    from ksoup_ray.functions.splits import _md5_bucket_fraction
    ids = [0, 1, 42, 999999, -7]
    frac = _md5_bucket_fraction(ids)
    for i, f in zip(ids, frac):
        want = int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16) \
            / 4294967296.0
        assert f == want
    assert ((frac >= 0) & (frac < 1)).all()


def test_assign_splits_stable_and_proportional(ray_session):
    import ray.data as rd
    from ksoup_ray.functions.splits import assign_splits
    ds = rd.from_items([{"doc_id": i} for i in range(2000)])
    df = assign_splits(ds).to_pandas()
    # deterministic: a second run assigns identically
    df2 = assign_splits(
        rd.from_items([{"doc_id": i} for i in range(2000)])).to_pandas()
    m = df.set_index("doc_id")["split"]
    m2 = df2.set_index("doc_id")["split"]
    assert m.sort_index().equals(m2.sort_index())
    frac = df["split"].value_counts(normalize=True)
    assert abs(frac["train"] - 0.8) < 0.04
    assert abs(frac["val"] - 0.1) < 0.03
    assert abs(frac["test"] - 0.1) < 0.03


def test_resample_by_weight_extremes(ray_session):
    import ray.data as rd
    from ksoup_ray.functions.splits import resample_by_weight
    rows = [{"doc_id": i,
             "keep_micros": 1_000_000 if i % 2 == 0 else 0}
            for i in range(500)]
    kept = resample_by_weight(rd.from_items(rows)).to_pandas()
    # prob 1.0 keeps everything, prob 0.0 keeps nothing
    assert set(kept["doc_id"]) == set(range(0, 500, 2))


def test_grouped_zscore_matches_numpy(ray_session):
    import ray.data as rd
    from ksoup_ray.functions.agg import grouped_zscore
    rng = np.random.RandomState(7)
    langs = np.repeat(["en", "de", "fr"], 200)
    vals = rng.randint(10, 5000, size=len(langs))
    rows = [{"doc_id": i, "lang": l, "n_chars": int(v)}
            for i, (l, v) in enumerate(zip(langs, vals))]
    out = grouped_zscore(rd.from_items(rows)).to_pandas() \
        .set_index("doc_id").sort_index()
    df = pd.DataFrame(rows)
    for lang, grp in df.groupby("lang"):
        v = grp["n_chars"].to_numpy(dtype=np.float64)
        n, s, ss = float(len(v)), float(v.sum()), float((v * v).sum())
        z = (v - s / n) / np.sqrt((ss - s * s / n) / n)
        want = np.round(z * 1_000_000.0).astype(np.int64)
        got = out.loc[grp["doc_id"], "z_micros"].to_numpy()
        assert (got == want).all()
    # z-scores within each group are standardized (mean ~0, std ~1)
    zs = out["z_micros"].to_numpy() / 1e6
    assert abs(zs.mean()) < 0.01


def test_cocitation_matches_naive(ray_session):
    import ray.data as rd
    from itertools import combinations
    from collections import Counter
    from ksoup_ray.functions.graph import cocitation_counts
    edges = [(0, 10), (0, 11), (0, 12), (1, 10), (1, 12),
             (2, 10), (2, 10),        # duplicate edge collapses
             (3, 11), (3, 12), (4, 99)]
    want = Counter()
    for s in set(e[0] for e in edges):
        dsts = sorted(set(d for ss, d in edges if ss == s))
        for a, b in combinations(dsts, 2):
            want[(a, b)] += 1
    ds = rd.from_items([{"src": s, "dst": d} for s, d in edges])
    out = cocitation_counts(ds, num_partitions=4).to_pandas()
    got = {(r.a, r.b): r.n_srcs for r in out.itertuples()}
    assert got == dict(want)


def test_cocitation_degree_cap_drops_hubs(ray_session):
    import ray.data as rd
    from ksoup_ray.functions.graph import cocitation_counts
    from ksoup_ray.functions.metrics import (read_cap_metrics,
                                             reset_cap_metrics)
    reset_cap_metrics()
    # a hub with degree 5 > cap 3 contributes nothing; the pair from
    # the small source survives
    edges = [{"src": 1, "dst": d} for d in range(5)] + \
        [{"src": 2, "dst": 100}, {"src": 2, "dst": 101}]
    out = cocitation_counts(rd.from_items(edges), max_degree=3,
                            num_partitions=2).to_pandas()
    assert len(out) == 1
    assert (int(out.a[0]), int(out.b[0]), int(out.n_srcs[0])) == \
        (100, 101, 1)
    assert read_cap_metrics().get(
        "cocitation.max_degree_dropped_sources") == 1


def test_bm25_search_topk_subset_of_scores(ray_session):
    import ray.data as rd
    from ksoup_ray.functions.curation import bm25_score, bm25_search
    texts = [f"spark window {'pad ' * (i % 7)}merge doc {i}"
             for i in range(60)] + ["no query terms here"] * 10
    rows = [{"doc_id": i, "text": t} for i, t in enumerate(texts)]
    ds = rd.from_items(rows)
    all_scores = bm25_score(
        rd.from_items(rows), ("spark", "merge")).to_pandas()
    top = bm25_search(ds, ("spark", "merge"), k=5).to_pandas()
    assert len(top) == 5
    want = all_scores.sort_values(
        ["score_micros", "doc_id"], ascending=[False, True]).head(5)
    assert list(top["doc_id"]) == list(want["doc_id"])


def test_length_band_filter_quantile_rule(ray_session):
    import ray.data as rd
    from ksoup_ray.functions.curation import length_band_filter
    rng = np.random.RandomState(3)
    lens = rng.randint(1, 200, size=400)
    rows = [{"doc_id": i, "text": " ".join(["w"] * int(n))}
            for i, n in enumerate(lens)]
    out = length_band_filter(rd.from_items(rows),
                             lo_q=0.1, hi_q=0.9).to_pandas()
    sv = np.sort(lens)
    lo = sv[max(1, int(np.ceil(0.1 * len(sv)))) - 1]
    hi = sv[max(1, int(np.ceil(0.9 * len(sv)))) - 1]
    want = {i for i, n in enumerate(lens) if lo <= n <= hi}
    assert set(out["doc_id"]) == want
    assert (out["token_count"] >= lo).all()
    assert (out["token_count"] <= hi).all()


def test_label_centroids_matches_numpy(ray_session):
    import ray.data as rd
    from ksoup_ray.functions.similarity import label_centroids
    rng = np.random.RandomState(11)
    vecs = rng.randn(120, 8).astype(np.float32)
    labels = rng.randint(0, 4, size=120)
    rows = [{"label": int(l), "embedding": v.tolist()}
            for l, v in zip(labels, vecs)]
    out = label_centroids(rd.from_items(rows)).to_pandas()
    micros = np.trunc(vecs.astype(np.float64) * 1e6).astype(np.int64)
    for lab in range(4):
        sums = micros[labels == lab].sum(axis=0)
        n = int((labels == lab).sum())
        sub = out[out["label"] == lab].sort_values("dim")
        assert (sub["sum_micros"].to_numpy() == sums).all()
        assert (sub["n_vecs"] == n).all()


def test_bigram_pmi_matches_naive(ray_session):
    import ray.data as rd
    from collections import Counter
    from ksoup_ray.functions.curation import bigram_pmi
    texts = ["the quick fox", "the quick dog", "a quick fox jumps",
             "the slow fox", "", "one"]
    out = bigram_pmi(rd.from_items([{"text": t} for t in texts]),
                     k=5)
    words = [t.split(" ") for t in texts]
    uni = Counter(w for ws in words for w in ws)
    big = Counter(" ".join(p) for ws in words
                  for p in zip(ws, ws[1:]))
    nw = sum(uni.values())
    nb = sum(big.values())
    want = sorted(big.items(), key=lambda kv: (-kv[1], kv[0]))[:5]
    assert list(out["ngram"]) == [g for g, _ in want]
    for g, n, pm in zip(out["ngram"], out["n"], out["pmi_micros"]):
        a, b = g.split(" ")
        expect = math.log((big[g] / nb)
                          / ((uni[a] / nw) * (uni[b] / nw)))
        assert pm == int(np.round(expect * 1e6))
        assert n == big[g]


def test_q3_shipping_matches_duckdb(ray_session):
    import duckdb
    import __ray_entry__ as entrymod
    sf = "/root/testdata/sf0.001"
    got = entrymod.queries()["q3_shipping"](sf).to_pandas()
    con = duckdb.connect()
    for t in ("orders", "lineitem", "customer"):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{sf}/{t}.parquet')")
    want = con.execute(
        entrymod.oracle_sql()["q3_shipping"]).df()
    got = got.sort_values("l_orderkey").reset_index(drop=True)
    want = want.sort_values("l_orderkey").reset_index(drop=True)
    assert list(got["l_orderkey"]) == list(want["l_orderkey"])
    assert list(got["revenue_e4"]) == list(want["revenue_e4"])
    assert list(got["o_orderpriority"]) == \
        list(want["o_orderpriority"])


def test_span_stats_matches_naive(ray_session):
    import ray.data as rd
    from collections import Counter
    from ksoup_ray.functions.dedup import span_stats
    W = 3
    texts = [
        "a b c d e",            # spans: abc bcd cde
        "x y a b c d",          # shares 'a b c' and 'b c d'
        "short",                # len < W -> (0, 0)
        "r r r r",              # self-repeat: 'r r r' twice
        "",
    ]
    rows = [{"doc_id": i, "text": t} for i, t in enumerate(texts)]
    out = span_stats(rd.from_items(rows), window=W,
                     num_partitions=4).to_pandas() \
        .set_index("doc_id").sort_index()
    spans = {i: [" ".join(t.split(" ")[j:j + W])
                 for j in range(max(len(t.split(" ")) - W + 1, 0))]
             for i, t in enumerate(texts)}
    corpus = Counter(s for ss in spans.values() for s in ss)
    for i, ss in spans.items():
        assert out.loc[i, "n_windows"] == len(ss)
        assert out.loc[i, "n_repeated"] == \
            sum(1 for s in ss if corpus[s] >= 2)
    assert out.loc[2, "n_windows"] == 0
    assert out.loc[4, "n_windows"] == 0
    assert out.loc[3, "n_repeated"] == 2


def test_top_words_per_lang_matches_naive(ray_session):
    import ray.data as rd
    from collections import Counter
    from ksoup_ray.functions.curation import top_words_per_lang
    rng = np.random.RandomState(5)
    vocab = [f"w{i}" for i in range(30)]
    rows = []
    for i in range(200):
        lang = ["en", "de"][i % 2]
        words = rng.choice(vocab, size=20,
                           p=np.linspace(1, 3, 30) / np.linspace(
                               1, 3, 30).sum())
        rows.append({"lang": lang, "text": " ".join(words)})
    out = top_words_per_lang(rd.from_items(rows), k=7)
    for lang in ("en", "de"):
        c = Counter(w for r in rows if r["lang"] == lang
                    for w in r["text"].split(" "))
        want = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[:7]
        sub = out[out["lang"] == lang]
        assert list(zip(sub["word"], sub["n"])) == want


def test_length_pct_rank_matches_rank_rule(ray_session):
    import ray.data as rd
    from ksoup_ray.functions.curation import length_pct_rank
    rng = np.random.RandomState(9)
    lens = rng.randint(1, 40, size=300)
    rows = [{"doc_id": i, "text": " ".join(["w"] * int(n))}
            for i, n in enumerate(lens)]
    out = length_pct_rank(rd.from_items(rows)).to_pandas() \
        .set_index("doc_id").sort_index()
    n = len(lens)
    for i in (0, 17, 123, 299):
        below = int((lens < lens[i]).sum())
        assert out.loc[i, "pct_ppm"] == below * 1_000_000 // (n - 1)
    # extremes: the min has rank 0, the max is < 1.0 unless unique
    assert out["pct_ppm"].min() == 0
    assert out["pct_ppm"].max() <= 1_000_000


def test_heavy_hitters_exact_vs_full_count(ray_session):
    import ray.data as rd
    from collections import Counter
    from ksoup_ray.functions.sketch import heavy_hitters
    rng = np.random.RandomState(13)
    # zipf-ish: a few hot words, a long tail
    vocab = ["hot1", "hot2", "hot3"] + [f"tail{i}" for i in range(500)]
    p = np.array([0.2, 0.12, 0.05] + [0.63 / 500] * 500)
    texts = [" ".join(rng.choice(vocab, size=50, p=p / p.sum()))
             for _ in range(100)]
    out = heavy_hitters(rd.from_items([{"text": t} for t in texts]),
                        "text", phi=0.04, text_split=True)
    c = Counter(w for t in texts for w in t.split(" "))
    total = sum(c.values())
    thresh = int(np.ceil(0.04 * total))
    want = sorted(((v, n) for v, n in c.items() if n >= thresh),
                  key=lambda kv: (-kv[1], kv[0]))
    assert list(zip(out["value"], out["n"])) == want
    assert len(want) >= 2     # the test exercises a non-empty result


def test_degree_histogram_matches_naive(ray_session):
    import ray.data as rd
    from collections import Counter
    from ksoup_ray.functions.graph import degree_histogram
    edges = [(1, 10), (1, 11), (2, 10), (3, 10), (3, 11), (3, 12),
             (4, 99)]
    deg = Counter(s for s, _ in edges)
    want = Counter(deg.values())
    out = degree_histogram(
        rd.from_items([{"src": s, "dst": d} for s, d in edges])) \
        .to_pandas()
    got = dict(zip(out["degree"], out["n_nodes"]))
    assert got == dict(want)


def test_triangle_support_matches_naive(ray_session):
    import ray.data as rd
    from collections import Counter
    from itertools import combinations
    from ksoup_ray.functions.graph import triangle_support
    rng = np.random.RandomState(7)
    edges = {(int(a), int(b)) for a, b in rng.randint(0, 20, (60, 2))}
    undirected = {(min(a, b), max(a, b)) for a, b in edges if a != b}
    adj = {}
    for a, b in undirected:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    want = Counter()
    for u, v, w in combinations(sorted(adj), 3):
        if v in adj[u] and w in adj[u] and w in adj[v]:
            want[(v, w)] += 1          # closing (mid, max) edge
    out = triangle_support(
        rd.from_items([{"src": a, "dst": b} for a, b in edges])) \
        .to_pandas()
    got = {(int(r.a), int(r.b)): int(r.n_tris)
           for r in out.itertuples()}
    assert got == dict(want)
    assert sum(want.values()) > 0      # the graph has triangles


def test_quantize_int8_matches_numpy(ray_session):
    import ray.data as rd
    from ksoup_ray.functions.similarity import quantize_int8
    rng = np.random.RandomState(3)
    vecs = rng.randn(40, 8).astype(np.float32)
    vecs[5] = 0.0                      # all-zero row → scale 0
    items = [{"vec_id": i, "embedding": v.tolist()}
             for i, v in enumerate(vecs)]
    out = quantize_int8(rd.from_items(items)).to_pandas() \
        .sort_values("vec_id").reset_index(drop=True)
    m = vecs.astype(np.float64)
    amax = np.abs(m).max(axis=1)
    scale = np.where(amax > 0, 127.0 / np.where(amax == 0, 1, amax),
                     0.0)
    q = np.trunc(m * scale[:, None]).astype(np.int64)
    assert (out["l1_q"].to_numpy() == np.abs(q).sum(axis=1)).all()
    assert (out["nnz_q"].to_numpy() == (q != 0).sum(axis=1)).all()
    assert out.loc[5, "l1_q"] == 0 and out.loc[5, "nnz_q"] == 0
    assert np.abs(q).max() <= 127      # codes actually fit int8


def test_distinct_words_per_lang(ray_session):
    import ray.data as rd
    from ksoup_ray.functions.curation import distinct_words_per_lang
    rows = [{"lang": "en", "text": "a b a c"},
            {"lang": "en", "text": "b d"},
            {"lang": "de", "text": "x x y"},
            {"lang": "de", "text": ""}]
    out = distinct_words_per_lang(rd.from_items(rows)).to_pandas()
    got = dict(zip(out["lang"], out["n_distinct"]))
    # '' counts as a word of the empty doc (string_split semantics)
    assert got == {"en": 4, "de": 3}


def test_grouped_median_lower_rule(ray_session):
    import ray.data as rd
    from ksoup_ray.functions.curation import grouped_median
    rows = ([{"k": "a", "v": v} for v in [1, 3, 5, 7]]      # even: 3
            + [{"k": "b", "v": v} for v in [10, 20, 30]]    # odd: 20
            + [{"k": "c", "v": v} for v in [2, 2, 9]])      # ties: 2
    out = grouped_median(rd.from_items(rows), key_col="k",
                         val_col="v")
    assert dict(zip(out["k"], out["median_lo"])) == \
        {"a": 3, "b": 20, "c": 2}


def test_crosstab_counts(ray_session):
    import ray.data as rd
    from ksoup_ray.functions.agg import crosstab_counts
    rows = [{"x": "a", "y": 1}, {"x": "a", "y": 1},
            {"x": "a", "y": 2}, {"x": "b", "y": 1}]
    out = crosstab_counts(rd.from_items(rows), ["x", "y"]).to_pandas()
    got = {(r.x, int(r.y)): int(r.n) for r in out.itertuples()}
    assert got == {("a", 1): 2, ("a", 2): 1, ("b", 1): 1}


def test_image_dhash_matches_naive(ray_session):
    import ray.data as rd
    from ksoup_ray.functions.codecs import decode_ppm
    from ksoup_ray.functions.multimodal import (ImageDHash,
                                                synth_media_batch)

    docs = pa.table({"doc_id": pa.array(list(range(30)), pa.int64()),
                     "text": pa.array(["x"] * 30, pa.string())})
    media = synth_media_batch(docs)

    def naive_dhash(img):
        # independent per-pixel reference: luma, NN 8x9, adjacent bits
        h, w = img.shape[:2]
        small = [[0] * 9 for _ in range(8)]
        for r in range(8):
            for c in range(9):
                y = min(r * h // 8, h - 1)
                x = min(c * w // 9, w - 1)
                p = img[y, x]
                small[r][c] = (299 * int(p[0]) + 587 * int(p[1])
                               + 114 * int(p[2])) // 1000
        out = 0
        for r in range(8):
            for c in range(8):
                out = (out << 1) | int(small[r][c + 1] < small[r][c])
        return format(out, "016x")

    want = {}
    for i in range(media.num_rows):
        meta = media.column("meta")[i].as_py()
        if meta["media_type"] == "image":
            img = decode_ppm(media.column("media")[i].as_py())
            want[media.column("media_id")[i].as_py()] = naive_dhash(img)

    out = rd.from_arrow(media).map_batches(
        ImageDHash, batch_format="pyarrow",
        concurrency=(1, 2)).to_pandas()
    got = {int(r.media_id): r.dhash_hex for r in out.itertuples()
           if r.dhash_hex is not None}
    assert got == want and len(want) == 10


def test_audio_stats_matches_numpy(ray_session):
    import ray.data as rd
    from ksoup_ray.functions.codecs import decode_wav
    from ksoup_ray.functions.multimodal import (AudioStats,
                                                synth_media_batch)

    docs = pa.table({"doc_id": pa.array(list(range(30)), pa.int64()),
                     "text": pa.array(["x"] * 30, pa.string())})
    media = synth_media_batch(docs)
    want = {}
    for i in range(media.num_rows):
        meta = media.column("meta")[i].as_py()
        if meta["media_type"] == "audio":
            s, rate = decode_wav(media.column("media")[i].as_py())
            s64 = s.astype(np.int64)
            want[media.column("media_id")[i].as_py()] = (
                len(s64),
                int(np.count_nonzero(np.signbit(s64[:-1])
                                     != np.signbit(s64[1:]))),
                int((s64 * s64).sum()))
    out = rd.from_arrow(media).map_batches(
        AudioStats, batch_format="pyarrow",
        concurrency=(1, 2)).to_pandas()
    got = {int(r.media_id): (int(r.n_samples), int(r.zero_crossings),
                             int(r.energy_sumsq))
           for r in out.itertuples() if not pd.isna(r.n_samples)}
    assert got == want and len(want) == 10
    # real signals have energy and crossings
    assert all(v[2] > 0 for v in want.values())


def test_retention_cohorts_matches_naive(ray_session):
    import ray.data as rd
    from collections import Counter
    from ksoup_ray.functions.agg import retention_cohorts

    rng = np.random.RandomState(11)
    base = pd.Timestamp("2024-01-01").value // 1000   # us
    rows = []
    for _ in range(300):
        u = int(rng.randint(0, 12))
        ts_us = base + int(rng.randint(0, 6 * 604800)) * 1_000_000
        rows.append({"user_id": u,
                     "ts": pd.Timestamp(ts_us * 1000)})
    df = pd.DataFrame(rows)
    wk = df["ts"].astype("int64") // 1000 // (604800 * 1_000_000)
    uw = pd.DataFrame({"u": df["user_id"], "w": wk}).drop_duplicates()
    cohort = uw.groupby("u")["w"].transform("min")
    want = Counter(zip(cohort, uw["w"] - cohort))
    out = retention_cohorts(rd.from_pandas(df),
                            num_partitions=4).to_pandas()
    got = {(int(r.cohort_week), int(r.offset_week)): int(r.n_users)
           for r in out.itertuples()}
    assert got == dict(want)
    # offset 0 cell count per cohort == new users that week
    assert all(k[1] >= 0 for k in got)


def test_paragraph_stage_rows_and_flags(ray_session):
    import ray.data as rd
    from ksoup_ray.stages.extract import ParagraphStage
    html = (b"<html><head><title>t</title></head><body>"
            b'<nav><a href="/x">skip</a></nav>'
            b'<div id="content">'
            b'<p class="an-info">alpha &#98;eta</p>'
            b"<p></p>"
            b"<p>gamma delta</p>"
            b"</div><p>outside</p></body></html>")
    ds = rd.from_items([{"url": "https://s/en/00000042", "html": html}])
    out = ds.map_batches(ParagraphStage, batch_format="pyarrow",
                         concurrency=(1, 2)).to_pandas() \
        .sort_values("para_idx").reset_index(drop=True)
    # only #content > p children, document order, entities decoded
    assert list(out["para_text"]) == ["alpha beta", "", "gamma delta"]
    assert list(out["para_idx"]) == [0, 1, 2]
    assert list(out["is_aninfo"]) == [True, False, False]
    assert (out["url"] == "https://s/en/00000042").all()


def test_rollup_counts_levels(ray_session):
    import ray.data as rd
    from ksoup_ray.functions.agg import rollup_counts
    rows = [{"lang": "en", "source": "a"}, {"lang": "en", "source": "a"},
            {"lang": "en", "source": "b"}, {"lang": "de", "source": "a"}]
    out = rollup_counts(rd.from_items(rows), ["lang", "source"])
    got = {(r.lang, r.source, int(r.grouping_id)): int(r.n)
           for r in out.itertuples()}
    assert got == {("en", "a", 0): 2, ("en", "b", 0): 1,
                   ("de", "a", 0): 1,
                   ("en", None, 1): 3, ("de", None, 1): 1,
                   (None, None, 3): 4}


def test_topk_hash_sample_exact_and_stable(ray_session):
    import hashlib
    import ray.data as rd
    from ksoup_ray.functions.splits import topk_hash_sample
    rows = [{"lang": l, "doc_id": i} for i, l in
            enumerate(["en", "de"] * 40)]
    out = topk_hash_sample(rd.from_items(rows), k=3).to_pandas()
    for lang in ("en", "de"):
        ids = [i for i, l in enumerate(["en", "de"] * 40) if l == lang]
        want = sorted(ids, key=lambda i: (
            hashlib.md5(str(i).encode()).hexdigest(), i))[:3]
        sub = out[out["lang"] == lang].sort_values("rank")
        assert list(sub["doc_id"]) == want
        assert list(sub["rank"]) == [1, 2, 3]
    # re-run → identical membership (pure function of ids)
    out2 = topk_hash_sample(rd.from_items(rows), k=3).to_pandas()
    a = out.sort_values(["lang", "rank"]).reset_index(drop=True)
    b = out2.sort_values(["lang", "rank"]).reset_index(drop=True)
    assert a.equals(b)


def test_grouped_gini_matches_definition(ray_session):
    import ray.data as rd
    from ksoup_ray.functions.curation import grouped_gini
    rng = np.random.RandomState(5)
    rows = ([{"lang": "en", "n_chars": int(v)}
             for v in rng.randint(1, 500, 60)]
            + [{"lang": "de", "n_chars": 7} for _ in range(10)])
    out = grouped_gini(rd.from_items(rows))
    got = dict(zip(out["lang"], out["gini_ppm"]))

    def ref_gini_ppm(vals):
        xs = sorted(vals)
        n = len(xs)
        s = sum(xs)
        s1 = sum((i + 1) * x for i, x in enumerate(xs))
        return 1_000_000 * (2 * s1 - (n + 1) * s) // (n * s)

    en = [r["n_chars"] for r in rows if r["lang"] == "en"]
    assert got["en"] == ref_gini_ppm(en)
    assert got["de"] == 0          # all-equal group → zero inequality


def test_table_extract_cells(ray_session):
    import ray.data as rd
    from ksoup_ray.sources.synth import render_table_page
    from ksoup_ray.stages.extract import TableExtractStage
    ds = rd.from_items([{"doc_id": 5, "html": render_table_page(5)}])
    out = ds.map_batches(TableExtractStage, batch_format="pyarrow",
                         concurrency=1).to_pandas()
    # doc 5: 1 header row + 5%3+1 = 3 body rows, 3 cols each
    assert len(out) == 12
    hdr = out[out["is_header"]]
    assert list(hdr["cell"]) == ["col0", "col1", "col2"]
    assert (hdr["row_idx"] == 0).all()
    body = out[~out["is_header"]].sort_values(["row_idx", "col_idx"])
    assert body.iloc[0]["cell"] == "d5 r0 c0"      # <b>-wrapped cell
    assert body.iloc[-1]["cell"] == "d5 r2 c2"
    assert list(body["row_idx"].unique()) == [1, 2, 3]


def test_form_extract_branches(ray_session):
    import ray.data as rd
    from ksoup_ray.sources.synth import render_form_page
    from ksoup_ray.stages.extract import FormExtractStage
    ds = rd.from_items([{"doc_id": d, "html": render_form_page(d)}
                        for d in (6, 7)])
    out = ds.map_batches(FormExtractStage, batch_format="pyarrow",
                         concurrency=1).to_pandas()
    d6 = out[out["doc_id"] == 6].sort_values("field_idx")
    # even id: checkbox submits 'on'; %3==0: second option selected
    assert list(zip(d6["field"], d6["value"])) == [
        ("q", "q6"), ("opt", "on"), ("tok", "t6"), ("pick", "b"),
        ("note", "note 6"), ("go", "Go")]
    d7 = out[out["doc_id"] == 7].sort_values("field_idx")
    # odd id: checkbox unchecked (absent), select falls back to 'a';
    # the disabled 'skip' input never appears
    assert list(zip(d7["field"], d7["value"])) == [
        ("q", "q7"), ("tok", "t7"), ("pick", "a"),
        ("note", "note 7"), ("go", "Go")]
    assert "skip" not in set(out["field"])


def test_grouped_mode_tie_break(ray_session):
    import ray.data as rd
    from ksoup_ray.functions.curation import grouped_mode
    rows = ([{"lang": "en", "n_chars": 9}] * 3
            + [{"lang": "en", "n_chars": 4}] * 3     # tie -> smaller
            + [{"lang": "en", "n_chars": 100}]
            + [{"lang": "de", "n_chars": 2}] * 2
            + [{"lang": "de", "n_chars": 50}])
    out = grouped_mode(rd.from_items(rows))
    got = {r.lang: (int(r.mode_val), int(r.n)) for r in out.itertuples()}
    assert got == {"en": (4, 3), "de": (2, 2)}


def test_grouped_cov_exact(ray_session):
    import ray.data as rd
    from ksoup_ray.functions.agg import grouped_cov
    rows = [{"k": "a", "x": 2.0, "y": 1.25}, {"k": "a", "x": 3.0, "y": 0.75},
            {"k": "a", "x": 5.0, "y": 2.00}, {"k": "b", "x": 1.0, "y": 9.99}]
    out = grouped_cov(rd.from_items(rows), key_col="k", x_col="x",
                      y_col="y", x_scale=1, y_scale=100)
    got = {r.k: (int(r.n), int(r.cov_num)) for r in out.itertuples()}
    # a: q=(2,3,5) p=(125,75,200); n*sum(qp)-sum(q)*sum(p)
    qp = 2 * 125 + 3 * 75 + 5 * 200
    assert got["a"] == (3, 3 * qp - 10 * 400)
    assert got["b"] == (1, 0)


def test_group_string_agg_ordered(ray_session):
    import ray.data as rd
    from ksoup_ray.functions.agg import group_string_agg
    rows = [{"source": "s1", "lang": "zh"}, {"source": "s1", "lang": "en"},
            {"source": "s1", "lang": "en"}, {"source": "s2", "lang": "de"}]
    out = group_string_agg(rd.from_items(rows))
    got = dict(zip(out["source"], out["vals"]))
    assert got == {"s1": "en,zh", "s2": "de"}


def test_anti_join_drops_matches(ray_session):
    import ray.data as rd
    from ksoup_ray.functions.joins import anti_join
    left = rd.from_items([{"k": i, "v": f"v{i}"} for i in range(10)])
    right = rd.from_items([{"rk": i} for i in (1, 3, 3, 5, 7, 9, 42)])
    out = anti_join(left, right, left_on="k", right_on="rk",
                    num_partitions=2).to_pandas()
    assert sorted(out["k"]) == [0, 2, 4, 6, 8]
    assert sorted(out.columns) == ["k", "v"]


def test_json_int_field_nulls(ray_session):
    import ray.data as rd
    from ksoup_ray.functions.jsonx import json_int_field
    rows = [{"event_id": 1, "props": '{"k": 87}'},
            {"event_id": 2, "props": '{"k": 0}'},
            {"event_id": 3, "props": "not json"},
            {"event_id": 4, "props": '{"other": 1}'}]
    out = json_int_field(rd.from_items(rows), col="props", path="$.k",
                         out_col="k", keep=["event_id"]).to_pandas()
    got = dict(zip(out["event_id"], out["k"]))
    assert got[1] == 87 and got[2] == 0
    assert pd.isna(got[3]) and pd.isna(got[4])


def test_pivot_counts_fixed_schema(ray_session):
    import ray.data as rd
    from ksoup_ray.functions.agg import pivot_counts
    rows = [{"u": 1, "t": "a"}, {"u": 1, "t": "a"}, {"u": 1, "t": "b"},
            {"u": 2, "t": "b"}]
    out = pivot_counts(rd.from_items(rows), key_col="u", cat_col="t",
                       categories=["a", "b", "c"]).to_pandas()
    out = out.set_index("u").sort_index()
    # 'c' never occurs but the column must exist (static schema)
    assert list(out.columns) == ["n_a", "n_b", "n_c"]
    assert list(out.loc[1]) == [2, 1, 0]
    assert list(out.loc[2]) == [0, 1, 0]


def test_sitemap_urls_roundtrip(ray_session):
    import __ray_entry__ as entrymod
    out = entrymod.queries()["sitemap_urls"]("/root/testdata/sf0.001")
    df = out.to_pandas()
    assert len(df) == 500
    row = df[df["loc"].str.endswith("/00000042")].iloc[0]
    assert row["lastmod"] == "day12"          # 42 % 30
    assert row["loc"].startswith("https://synth.invalid/")


def test_microdata_attribute_rule(ray_session):
    import ray.data as rd
    from ksoup_ray.sources.synth import render_microdata_page
    from ksoup_ray.stages.extract import MicrodataStage
    ds = rd.from_items([{"doc_id": d, "html": render_microdata_page(d)}
                        for d in (4, 5)])
    out = ds.map_batches(MicrodataStage, batch_format="pyarrow",
                         concurrency=1).to_pandas()
    d4 = dict(zip(out[out["doc_id"] == 4]["prop"],
                  out[out["doc_id"] == 4]["value"]))
    # <time> reads its datetime attribute, not its text ('x')
    assert d4 == {"headline": "Doc 00000004", "author": "Author 4",
                  "datePublished": "2024-10-05"}
    d5 = dict(zip(out[out["doc_id"] == 5]["prop"],
                  out[out["doc_id"] == 5]["value"]))
    assert d5 == {"headline": "Doc 00000005", "author": "Author 5"}


def test_lag_gaps_matches_pandas(ray_session):
    import ray.data as rd
    from ksoup_ray.functions.agg import lag_gaps
    rng = np.random.RandomState(9)
    rows = [{"event_id": i, "user_id": int(rng.randint(0, 7)),
             "ts": pd.Timestamp("2024-01-01")
             + pd.Timedelta(microseconds=int(rng.randint(0, 10**9)))}
            for i in range(300)]
    out = lag_gaps(rd.from_items(rows), num_partitions=4).to_pandas()
    df = pd.DataFrame(rows).sort_values(["user_id", "ts", "event_id"])
    us = df["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
    want = df.assign(_us=us)
    want["gap"] = want.groupby("user_id")["_us"].diff()
    want = want.dropna(subset=["gap"])
    got = out.set_index("event_id")["gap_us"].sort_index()
    exp = want.set_index("event_id")["gap"].astype(np.int64).sort_index()
    assert got.equals(exp)
