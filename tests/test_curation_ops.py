"""Curation operators (functions/curation.py): Gopher repetition
signals, benchmark decontamination, global n-gram top-k, exact
per-language token quantiles. Kernel-level differentials against naive
Python plus Ray-level shape/property checks; the value-level gate is
the driver's DuckDB oracles (gopher_quality / decontaminate /
ngram_topk / token_quantiles)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from ksoup_ray.functions.curation import (
    _ngram_strings,
    gopher_quality_batch,
    ngram_topk,
    token_quantiles,
)


@pytest.fixture(scope="module")
def documents_path(sf_dir):
    return f"{sf_dir}/documents.parquet"


def _naive_gopher(text: str):
    words = text.split(" ")
    t = len(words)
    from collections import Counter
    wc = Counter(words)
    bigrams = [f"{a} {b}" for a, b in zip(words, words[1:])]
    dup2 = 1.0 - len(set(bigrams)) / len(bigrams) if bigrams else 0.0
    return (t, len(wc) / t, max(wc.values()) / t, dup2)


def test_gopher_quality_matches_naive():
    texts = [
        "a b c a b c a",
        "x",
        "same same same same",
        "one two three four five",
        "",                      # '' splits to [''] — 1 word, like SQL
        "a a b b a a b b",
    ]
    batch = pa.table({"doc_id": list(range(len(texts))),
                      "text": pa.array(texts, pa.string())})
    out = gopher_quality_batch(batch).to_pandas()
    for i, t in enumerate(texts):
        nw, df_, tf, d2 = _naive_gopher(t)
        assert out["n_words"][i] == nw
        assert out["distinct_word_frac"][i] == pytest.approx(df_)
        assert out["top_word_frac"][i] == pytest.approx(tf)
        assert out["dup_2gram_frac"][i] == pytest.approx(d2)


def test_ngram_strings_matches_naive():
    texts = pd.Series(["a b c d", "x y", "z", "p q r"])
    di, grams = _ngram_strings(texts, 3)
    got = sorted(zip(di.tolist(), grams.tolist()))
    want = []
    for i, t in enumerate(texts):
        ws = t.split(" ")
        want += [(i, " ".join(ws[j:j + 3]))
                 for j in range(len(ws) - 2)]
    assert got == sorted(want)
    # no cross-document windows
    assert (0, "c d x") not in got and (1, "x y z") not in got


def test_ngram_topk_exact(ray_session, documents_path):
    import ray.data as rd
    ds = rd.read_parquet(documents_path, columns=["text"])
    got = ngram_topk(ds, n=3, k=15).to_pandas()
    # naive recount over the full corpus
    texts = rd.read_parquet(documents_path).to_pandas()["text"]
    from collections import Counter
    c = Counter()
    for t in texts:
        ws = t.split(" ")
        c.update(" ".join(ws[j:j + 3]) for j in range(len(ws) - 2))
    want = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[:15]
    assert list(zip(got["ngram"], got["n"])) == want


def test_token_quantiles_matches_duckdb_rule(ray_session,
                                             documents_path):
    import ray.data as rd
    ds = rd.read_parquet(documents_path, columns=["text", "lang"])
    got = token_quantiles(ds, qs=(0.25, 0.5, 0.9)) \
        .sort_values("lang").reset_index(drop=True)
    docs = rd.read_parquet(documents_path).to_pandas()
    docs["tc"] = docs["text"].map(
        lambda t: 0 if not t else t.count(" ") + 1)
    for _, row in got.iterrows():
        tcs = np.sort(docs[docs["lang"] == row["lang"]]["tc"].to_numpy())
        for q, col in ((0.25, "p25"), (0.5, "p50"), (0.9, "p90")):
            rank = max(1, int(np.ceil(q * len(tcs))))  # quantile_disc
            assert row[col] == tcs[rank - 1], (row["lang"], q)


def test_bm25_matches_naive(ray_session, documents_path):
    """BM25 against a from-scratch recount (math.log, per-doc loops) —
    independent of the vectorized implementation's code paths."""
    import math
    from collections import Counter
    import ray.data as rd
    from ksoup_ray.functions.curation import bm25_score

    terms = ("spark", "window", "merge")
    ds = rd.read_parquet(documents_path, columns=["doc_id", "text"])
    got = bm25_score(ds, terms).to_pandas() \
        .set_index("doc_id")["score_micros"].to_dict()

    docs = rd.read_parquet(documents_path).to_pandas()
    words = {r.doc_id: r.text.split(" ") for r in docs.itertuples()}
    n = len(words)
    avgdl = sum(len(w) for w in words.values()) / n
    df = {t: sum(t in set(w) for w in words.values()) for t in terms}
    want = {}
    for doc_id, ws in words.items():
        c = Counter(ws)
        score = 0
        hit = False
        for t in terms:
            tf = c.get(t, 0)
            if not tf:
                continue
            hit = True
            idf = math.log(1.0 + (n - df[t] + 0.5) / (df[t] + 0.5))
            score += int(round(idf * (tf * 2.2)
                               / (tf + 1.2 * (1.0 - 0.75
                                              + 0.75 * len(ws) / avgdl))
                               * 1_000_000.0))
        if hit:
            want[doc_id] = score
    assert got == want


def test_unigram_logprob_matches_naive(ray_session, documents_path):
    import math
    from collections import Counter
    import ray.data as rd
    from ksoup_ray.functions.curation import unigram_logprob

    ds = rd.read_parquet(documents_path, columns=["doc_id", "text"])
    got = unigram_logprob(ds, salt=4).to_pandas() \
        .set_index("doc_id")["logprob_micros"].to_dict()

    docs = rd.read_parquet(documents_path).to_pandas()
    words = {r.doc_id: r.text.split(" ") for r in docs.itertuples()}
    cnt = Counter(w for ws in words.values() for w in ws)
    total = float(sum(cnt.values()))
    want = {}
    for doc_id, ws in words.items():
        want[doc_id] = sum(
            tf * int(round(math.log(cnt[w] / total) * 1_000_000.0))
            for w, tf in Counter(ws).items())
    assert got == want


def test_kmeans_monotone_inertia_and_blob_recovery(ray_session):
    import numpy as np
    import ray.data as rd
    from ksoup_ray.functions.similarity import kmeans_train

    # 3 well-separated blobs, deterministic jitter
    rng_pts = []
    centers = np.array([[0.0, 0.0], [10.0, 10.0], [-10.0, 5.0]])
    for i in range(60):
        c = centers[i % 3]
        jit = np.array([((i * 37) % 7) / 10.0, ((i * 61) % 5) / 10.0])
        rng_pts.append({"vec_id": i, "embedding": (c + jit).tolist()})
    ds = rd.from_items(rng_pts)
    init = np.array([p["embedding"] for p in rng_pts[:3]])
    cents, inertia = kmeans_train(ds, k=3, iters=4, init=init)
    assert all(b <= a + 1e-9 for a, b in zip(inertia, inertia[1:]))
    # every final centroid sits inside one blob's jitter box
    d = np.linalg.norm(cents[:, None, :] - centers[None, :, :], axis=2)
    assert (d.min(axis=1) < 1.0).all()
    assert len(set(d.argmin(axis=1))) == 3   # one centroid per blob


def test_pii_redact_patterns():
    from ksoup_ray.functions.curation import pii_redact_batch
    cases = {
        "mail me at jo.doe+x@sub.example.org today":
            "mail me at <EMAIL> today",
        "server 192.168.001.1 and 8.8.8.8 up":
            "server <IP> and <IP> up",
        "call 555-867-5309 now": "call <PHONE> now",
        "no pii here 1234": "no pii here 1234",
        # phone-like inside a longer digit run is NOT a phone (\b)
        "id 1555-867-53091": "id 1555-867-53091",
        "": "",
    }
    batch = pa.table({"text": pa.array(list(cases), pa.string())})
    got = pii_redact_batch(batch)["redacted"].to_pylist()
    assert got == list(cases.values())


def test_decontaminate_flags_shared_ngrams(ray_session):
    import ray.data as rd
    from ksoup_ray.functions.curation import decontaminate
    bench = rd.from_items([{"doc_id": 100, "text": "the quick brown fox"}])
    corpus = rd.from_items([
        {"doc_id": 1, "text": "a quick brown fox ran"},   # shares 3-gram
        {"doc_id": 2, "text": "totally unrelated words here"},
        {"doc_id": 3, "text": "quick brown"},             # too short
    ])
    out = decontaminate(corpus, bench, ngram=3).to_pandas() \
        .set_index("doc_id")["contaminated"]
    assert out[1] == 1 and out[2] == 0 and out[3] == 0


def test_decontaminate_bloom_matches_exact(ray_session):
    """Bloom-prefiltered path must be EXACT: false positives are killed
    by the verify join, and Bloom has no false negatives — so results
    equal the broadcast-set path on any input."""
    import ray.data as rd
    from ksoup_ray.functions.curation import decontaminate, decontaminate_bloom
    rng = __import__("random").Random(7)
    words = [f"w{i}" for i in range(40)]
    bench = rd.from_items([
        {"doc_id": 100 + i, "text": " ".join(rng.choices(words, k=12))}
        for i in range(5)])
    corpus = rd.from_items([
        {"doc_id": i, "text": " ".join(rng.choices(words, k=15))}
        for i in range(30)] + [{"doc_id": 99, "text": ""}])
    exact = decontaminate(corpus, bench, ngram=3).to_pandas() \
        .set_index("doc_id")["contaminated"].sort_index()
    # tiny bitset (2 bits/key) forces a high FP rate so the verify
    # join's FP-kill path is actually exercised
    bloom = decontaminate_bloom(corpus, bench, ngram=3,
                                bits_per_key=2, n_hashes=1).to_pandas() \
        .set_index("doc_id")["contaminated"].sort_index()
    assert exact.to_dict() == bloom.to_dict()
    assert exact.sum() > 0            # test is vacuous if nothing hits


def test_snapshot_diff_statuses(ray_session):
    import ray.data as rd
    from ksoup_ray.functions.snapshot import snapshot_diff

    old = rd.from_items([
        {"doc_id": 1, "text": "alpha"},
        {"doc_id": 2, "text": "beta"},
        {"doc_id": 3, "text": "gamma"},
    ])
    new = rd.from_items([
        {"doc_id": 1, "text": "alpha"},       # same
        {"doc_id": 2, "text": "beta prime"},  # changed
        {"doc_id": 4, "text": "delta"},       # added; 3 removed
    ])
    out = snapshot_diff(old, new).to_pandas() \
        .set_index("doc_id")["status"].to_dict()
    assert out == {1: "same", 2: "changed", 3: "removed", 4: "added"}


def test_normalize_text_nfc_and_trim():
    from ksoup_ray.functions.curation import normalize_text_batch
    batch = pa.table({"text": pa.array(
        ["  café  ", "plain", "", "é already composed "],
        pa.string())})
    got = normalize_text_batch(batch)["norm_text"].to_pylist()
    assert got == ["café", "plain", "", "é already composed"]


def test_pack_sequences_invariants(ray_session):
    import ray.data as rd
    from ksoup_ray.functions.packing import pack_sequences

    docs = [{"doc_id": i, "text": " ".join(["w"] * n)}
            for i, n in enumerate([10, 300, 5, 250, 256, 1, 0, 100])]
    out = pack_sequences(rd.from_items(docs), capacity=256,
                         bucket_size=3).to_pandas()
    # per-doc token mass is conserved
    per_doc = out.groupby("doc_id")["tokens_in_bin"].sum().to_dict()
    assert per_doc == {0: 10, 1: 300, 2: 5, 3: 250, 4: 256, 5: 1,
                       7: 100}         # doc 6 (0 tokens) absent
    # every bin except the last is exactly full
    per_bin = out.groupby("bin_id")["tokens_in_bin"].sum()
    total = sum(v for v in per_doc.values())
    assert (per_bin.iloc[:-1] == 256).all()
    assert per_bin.sum() == total
    assert per_bin.index.tolist() == list(range(len(per_bin)))
    # doc 1 (300 tokens at offset 10) straddles bins 0 and 1
    d1 = out[out["doc_id"] == 1].sort_values("bin_id")
    assert d1["bin_id"].tolist() == [0, 1]
    assert d1["tokens_in_bin"].tolist() == [246, 54]


def test_pca_project_matches_numpy(ray_session):
    import numpy as np
    import ray.data as rd
    from ksoup_ray.functions.similarity import pca_project

    rng_free = [(i, [((i * 13) % 7) - 3.0, ((i * 29) % 11) * 2.0,
                     ((i * 7) % 5) * 0.5]) for i in range(50)]
    ds = rd.from_items([{"vec_id": i, "embedding": v}
                        for i, v in rng_free])
    out, (mean, comps) = pca_project(ds, k=2)
    got = out.to_pandas().set_index("vec_id")["proj"].to_dict()

    X = np.array([v for _, v in rng_free])
    mu = X.mean(axis=0)
    cov = np.cov(X, rowvar=False)
    evals, evecs = np.linalg.eigh(cov)
    W = evecs[:, ::-1][:, :2].T
    flip = W[np.arange(2), np.abs(W).argmax(axis=1)] < 0
    W = np.where(flip[:, None], -W, W)
    want = (X - mu) @ W.T
    assert np.allclose(mean, mu, atol=1e-9)
    assert np.allclose(comps, W, atol=1e-9)
    for i in range(50):
        assert np.allclose(got[i], want[i], atol=1e-8), i
    # variance ordering: first component carries the most variance
    v = np.array([got[i] for i in range(50)])
    assert v[:, 0].var() >= v[:, 1].var()
