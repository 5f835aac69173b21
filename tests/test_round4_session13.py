"""Session-13 operators: phrase search (positional posting
intersection), cross-split leakage audit, SemDeDup, CCNet perplexity
buckets."""

import hashlib
import math

import numpy as np
import pyarrow as pa


# ---------------------------------------------------------------- phrase


def _naive_phrase_count(text: str, phrase: tuple) -> int:
    toks = text.split(" ")
    L = len(phrase)
    return sum(1 for i in range(len(toks) - L + 1)
               if tuple(toks[i:i + L]) == tuple(phrase))


def test_phrase_hits_basic(ray_session):
    import ray.data as rd
    from ksoup_ray.functions.index import phrase_hits
    docs = [
        {"doc_id": 1, "text": "big data spark window spark window"},
        {"doc_id": 2, "text": "spark spark window"},
        {"doc_id": 3, "text": "window spark"},          # wrong order
        {"doc_id": 4, "text": "spark"},                 # incomplete
        {"doc_id": 5, "text": ""},
    ]
    out = phrase_hits(rd.from_items(docs, override_num_blocks=3),
                      ("spark", "window")).to_pandas() \
        .set_index("doc_id")["n_hits"].to_dict()
    expect = {d["doc_id"]: _naive_phrase_count(d["text"],
                                               ("spark", "window"))
              for d in docs}
    expect = {k: v for k, v in expect.items() if v > 0}
    assert out == expect == {1: 2, 2: 1}


def test_phrase_hits_overlapping_and_repeated_terms(ray_session):
    import ray.data as rd
    from ksoup_ray.functions.index import phrase_hits
    # phrase with a repeated token: overlapping occurrences count
    docs = [{"doc_id": 7, "text": "window window window"},
            {"doc_id": 8, "text": "window pane window window"}]
    out = phrase_hits(rd.from_items(docs),
                      ("window", "window")).to_pandas() \
        .set_index("doc_id")["n_hits"].to_dict()
    assert out == {7: 2, 8: 1}


def test_phrase_hits_three_terms(ray_session):
    import ray.data as rd
    from ksoup_ray.functions.index import phrase_hits
    docs = [{"doc_id": 1, "text": "a b c a b c a b"},
            {"doc_id": 2, "text": "a b x c"}]
    out = phrase_hits(rd.from_items(docs),
                      ("a", "b", "c")).to_pandas() \
        .set_index("doc_id")["n_hits"].to_dict()
    assert out == {1: 2}


# ---------------------------------------------------------------- splits


def _md5_split(i: int) -> str:
    f = int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16) \
        / 4294967296.0
    return "train" if f < 0.8 else ("val" if f < 0.9 else "test")


def test_split_leakage_finds_straddling_hosts(ray_session):
    import ray.data as rd
    from ksoup_ray.functions.splits import split_leakage
    # 40 docs over 4 hosts; leakage = hosts whose ids md5 into >1
    # split
    rows = [{"doc_id": i, "host": f"h{i % 4}"} for i in range(40)]
    out = split_leakage(rd.from_items(rows, override_num_blocks=4)) \
        .to_pandas().set_index("host")
    by_host = {}
    for r in rows:
        by_host.setdefault(r["host"], []).append(
            _md5_split(r["doc_id"]))
    for host, splits in by_host.items():
        if len(set(splits)) > 1:
            assert out.loc[host, "n_splits"] == len(set(splits))
            assert out.loc[host, "n_docs"] == len(splits)
        else:
            assert host not in out.index


def test_split_leakage_clean_split_is_empty(ray_session):
    import ray.data as rd
    from ksoup_ray.functions.splits import split_leakage
    # one host per doc → no host can straddle
    rows = [{"doc_id": i, "host": f"only{i}"} for i in range(20)]
    out = split_leakage(rd.from_items(rows)).to_pandas()
    assert len(out) == 0


# ---------------------------------------------------------------- semdedup


def _naive_semdedup(ids, vecs, cents, threshold):
    def unit(m):
        n = np.linalg.norm(m, axis=1, keepdims=True)
        n[n == 0] = 1.0
        return m / n
    u, cu = unit(np.asarray(vecs, float)), unit(np.asarray(cents,
                                                           float))
    assign = (u @ cu.T).argmax(axis=1)
    keep = {}
    for i, vid in enumerate(ids):
        dup = any(assign[j] == assign[i] and ids[j] < vid
                  and float(u[i] @ u[j]) >= threshold
                  for j in range(len(ids)))
        keep[vid] = (int(assign[i]), 0 if dup else 1)
    return keep


def test_semdedup_matches_naive(ray_session):
    import ray.data as rd
    from ksoup_ray.functions.dedup import semdedup
    rng = np.random.RandomState(3)
    cents = rng.standard_normal((4, 8))
    vecs, ids = [], []
    for i in range(60):
        base = cents[i % 4] + rng.standard_normal(8) * 0.05
        vecs.append(base)
        ids.append(i)
    # exact duplicates of a few rows → certain drops
    for k, src in enumerate([0, 1, 2]):
        vecs.append(vecs[src])
        ids.append(100 + k)
    ds = rd.from_items([{"vec_id": i, "embedding": list(map(float, v))}
                        for i, v in zip(ids, vecs)],
                       override_num_blocks=5)
    out = semdedup(ds, cents, threshold=0.9).to_pandas() \
        .set_index("vec_id")
    expect = _naive_semdedup(ids, vecs, cents, 0.9)
    assert len(out) == len(ids)
    for vid, (cl, keep) in expect.items():
        assert out.loc[vid, "cluster_id"] == cl
        assert out.loc[vid, "keep"] == keep
    assert (out["keep"] == 0).sum() >= 3     # the planted dups


def test_semdedup_column_chunking_is_equivalent(ray_session):
    import ray.data as rd
    from ksoup_ray.functions.dedup import semdedup
    rng = np.random.RandomState(7)
    cents = rng.standard_normal((2, 6))
    items = [{"vec_id": i,
              "embedding": list(map(float, rng.standard_normal(6)))}
             for i in range(30)]
    ds = rd.from_items(items)
    full = semdedup(ds, cents, threshold=0.2).to_pandas() \
        .sort_values("vec_id").reset_index(drop=True)
    chunked = semdedup(rd.from_items(items), cents, threshold=0.2,
                       col_chunk=4).to_pandas() \
        .sort_values("vec_id").reset_index(drop=True)
    assert full.equals(chunked)


# ---------------------------------------------------------------- ccnet


def test_ccnet_buckets_orders_by_perplexity(ray_session):
    import ray.data as rd
    from ksoup_ray.functions.curation import ccnet_ppl_buckets
    # 6 docs: two of common words (low ppl), two mixed, two of rare
    # words (high ppl) — equal thirds land them head/middle/tail
    docs = [
        {"doc_id": 0, "text": "the the the the the the the the"},
        {"doc_id": 1, "text": "the the the the the the the cat"},
        {"doc_id": 2, "text": "the cat the cat the cat sat sat"},
        {"doc_id": 3, "text": "cat sat cat sat mat mat the the"},
        {"doc_id": 4, "text": "zap qik vex wub zap qik vex wub"},
        {"doc_id": 5, "text": "zap qik vex wub jyn kro plu trz"},
    ]
    out = ccnet_ppl_buckets(rd.from_items(docs,
                                          override_num_blocks=3)) \
        .to_pandas().set_index("doc_id")
    assert len(out) == 6
    # naive replay: integer-micro unigram LM, quantized ppl, thirds
    from collections import Counter
    words = [w for d in docs for w in d["text"].split(" ")]
    cnt, tot = Counter(words), len(words)
    ppl = {}
    for d in docs:
        toks = d["text"].split(" ")
        lp = sum(round(math.log(cnt[w] / tot) * 1e6) for w in toks)
        ppl[d["doc_id"]] = (-lp) // (len(toks) * 10_000)
    for did, p in ppl.items():
        assert out.loc[did, "ppl_q"] == p
    ranked = sorted(ppl, key=lambda d: (ppl[d], d))
    expect = {}
    for r, did in enumerate(ranked):
        expect[did] = ("head", "middle", "tail")[r // 2]
    for did, b in expect.items():
        assert out.loc[did, "bucket"] == b


# ------------------------------------------------------------ host rep


def test_host_reputation_trunc_mean(ray_session):
    import ray.data as rd
    from ksoup_ray.functions.curation import host_reputation
    def bucket(w):
        return int(hashlib.md5(w.encode()).hexdigest()[:8], 16) % 64
    weights = [0] * 64
    weights[bucket("good")] = 2
    weights[bucket("bad")] = -3
    docs = [{"doc_id": 1, "source": "h1", "text": "good good"},
            {"doc_id": 2, "source": "h1", "text": "bad"},
            {"doc_id": 3, "source": "h2", "text": "bad bad"},
            {"doc_id": 4, "source": "h2", "text": "bad"}]
    out = host_reputation(rd.from_items(docs, override_num_blocks=2),
                          weights).to_pandas().set_index("doc_id")
    # h1: scores 4, -3 -> mean trunc((1*1e6)//2) = 500000
    assert out.loc[1, "host_score_micros"] == 500_000
    assert out.loc[1, "score"] == 4 and out.loc[2, "score"] == -3
    # h2: scores -6, -3 -> trunc toward zero of -9e6/2 = -4500000
    assert out.loc[3, "host_score_micros"] == -4_500_000
    assert (out.loc[[3, 4], "host"] == "h2").all()
    assert len(out) == 4


# ------------------------------------------------------------ hll


def test_hll_registers_by_key_estimate_within_band(ray_session):
    import ray.data as rd
    from ksoup_ray.functions.sketch import hll_registers_by_key
    # 3 keys with known distinct counts (plus cross-block repeats)
    rows = []
    for k, n in (("a", 300), ("b", 60), ("c", 5)):
        rows += [{"source": k, "text": f"{k}-doc-{i % n}"}
                 for i in range(n * 2)]
    out = hll_registers_by_key(
        rd.from_items(rows, override_num_blocks=4),
        key_col="source", val_col="text", p=8).to_pandas() \
        .set_index("source")
    m = 256
    alpha = 0.7182725932495458     # alpha_256 = 0.7213/(1+1.079/m)
    for k, n in (("a", 300), ("b", 60), ("c", 5)):
        denom = out.loc[k, "denom_scaled"] / (1 << 25)
        est = alpha * m * m / denom
        zeros = m - out.loc[k, "n_present"]
        if est <= 2.5 * m and zeros:
            import math
            est = m * math.log(m / zeros)   # linear counting regime
        assert abs(est - n) <= max(5.0, 4 * 1.04 / (m ** 0.5) * n), \
            (k, est, n)


# ------------------------------------------------------------ redirects


def test_resolve_redirects_chains_cycles_terminals(ray_session):
    import ray.data as rd
    from ksoup_ray.functions.graph import resolve_redirects
    # chain 1->2->3->4->5 (5 terminal), isolated 10->11,
    # 2-cycle 20<->21
    edges = [(1, 2), (2, 3), (3, 4), (4, 5), (10, 11),
             (20, 21), (21, 20)]
    ds = rd.from_items([{"src": s, "dst": d} for s, d in edges],
                       override_num_blocks=3)
    out = resolve_redirects(ds, rounds=3).to_pandas() \
        .set_index("src")["final_dst"].to_dict()
    assert out[1] == 5 and out[2] == 5 and out[3] == 5 \
        and out[4] == 5
    assert out[10] == 11
    # 2-cycle: m∘m of a swap is the identity, so one doubling round
    # settles each member on ITSELF — deterministic, replayed by the
    # oracle's unrolled self-joins
    assert out[20] == 20 and out[21] == 21
    assert len(out) == 7


# ---------------------------------------------------------------- cms


def test_cms_overcounts_only_and_exact_on_sparse(ray_session):
    import ray.data as rd
    from collections import Counter
    from ksoup_ray.functions.sketch import cms_point_estimates
    docs = [{"text": "a a a b b c"}, {"text": "a b d"},
            {"text": ""}]
    truth = Counter(w for d in docs for w in d["text"].split(" ")
                    if w)
    out = cms_point_estimates(
        rd.from_items(docs, override_num_blocks=2),
        ("a", "b", "c", "d", "nothere"),
        depth=4, width=1024).set_index("word")["est_count"]
    for w in ("a", "b", "c", "d", "nothere"):
        assert out[w] >= truth.get(w, 0)       # CMS never undercounts
    # 7 distinct tokens in 4x1024 registers: collisions are
    # essentially impossible, estimates are exact
    for w in ("a", "b", "c", "d"):
        assert out[w] == truth[w]
    assert out["nothere"] == 0


# ---------------------------------------------------------------- c4


def test_c4_line_filter_rules(ray_session):
    import ray.data as rd
    from ksoup_ray.functions.curation import c4_line_filter
    pages = [
        # 4 good lines -> kept page
        {"doc_id": 1, "page_text":
            "one two three.\nfour five six!\nseven eight nine?\n"
            'ten eleven twelve"'},
        # line rules: no punct / too short / banned
        {"doc_id": 2, "page_text":
            "one two three\nshort one.\nuses javascript today.\n"
            "good line here.\nmore good words.\nthird good line."},
        # page ban: lorem ipsum anywhere drops the page
        {"doc_id": 3, "page_text":
            "lorem ipsum dolor\ngood line one.\ngood line two.\n"
            "good line three."},
        # < 3 kept lines -> page dropped, audit row survives
        {"doc_id": 4, "page_text": "only good line here.\nbad"},
    ]
    out = c4_line_filter(rd.from_items(pages,
                                       override_num_blocks=2)) \
        .to_pandas().set_index("doc_id")
    assert out.loc[1, "page_kept"] == 1
    assert out.loc[1, "n_kept_lines"] == 4
    assert out.loc[1, "kept_text"].count("\n") == 3
    assert out.loc[2, "page_kept"] == 1
    assert out.loc[2, "n_lines"] == 6
    assert out.loc[2, "n_kept_lines"] == 3   # 3 rule-violating lines
    assert "javascript" not in out.loc[2, "kept_text"]
    assert out.loc[3, "page_kept"] == 0
    assert out.loc[3, "kept_text"] == ""
    assert out.loc[3, "n_kept_lines"] == 3   # lines passed, page ban
    assert out.loc[4, "page_kept"] == 0
    assert len(out) == 4                     # every page audited


# ---------------------------------------------------------------- bpe/clf


def test_bpe_encode_counts_matches_sequential_apply(ray_session):
    import ray.data as rd
    from ksoup_ray.functions.curation import (_apply_bpe_merges,
                                              bpe_encode_counts)
    merges = [("t", "h"), ("a", "t"), ("e", "r")]
    docs = [{"doc_id": 1, "text": "thatther the"},
            {"doc_id": 2, "text": "water later"},
            {"doc_id": 3, "text": "xyz"},
            {"doc_id": 4, "text": ""}]           # token-less: absent
    out = bpe_encode_counts(rd.from_items(docs,
                                          override_num_blocks=2),
                            merges).to_pandas() \
        .set_index("doc_id")["n_bpe_tokens"].to_dict()
    expect = {}
    for d in docs:
        n = sum(len(_apply_bpe_merges(w, merges))
                for w in d["text"].split(" ") if w)
        if n:
            expect[d["doc_id"]] = n
    assert out == expect
    # spot-check the run-parity rule end to end: 'that' -> th|at
    assert _apply_bpe_merges("that", merges) == ["th", "at"]
    assert _apply_bpe_merges("ttth", merges) == ["t", "t", "th"]


def test_bpe_first_merge_equals_str_replace_property():
    """Property: the FIRST merge pass of the greedy left-to-right
    run-parity rule over a word's characters is exactly Python
    ``str.replace`` on the raw string (replace is greedy
    left-to-right non-overlapping) — an independent formulation of
    the contract the SQL oracle replays with window functions.
    (Chained merges have no replace analogue: a merged token like
    'ba' must not match a later single-char 'b' — the explicit
    multi-merge examples below pin that case.)"""
    from hypothesis import given, settings
    from hypothesis import strategies as st
    from ksoup_ray.functions.curation import _apply_bpe_merges

    word = st.text(alphabet=st.sampled_from("abct"),
                   min_size=1, max_size=14)
    pair = st.tuples(st.sampled_from("abct"), st.sampled_from("abct"))

    @settings(max_examples=300, deadline=None)
    @given(word, pair)
    def prop(w, m):
        a, b = m
        marked = w.replace(a + b, "\x01")
        expect = [a + b if ch == "\x01" else ch for ch in marked]
        assert _apply_bpe_merges(w, [m]) == expect

    prop()
    # chained-merge boundary case the property can't express: the
    # merged token 'ba' must NOT satisfy a later ('c','b') merge
    assert _apply_bpe_merges("cba", [("b", "a"), ("c", "b")]) == \
        ["c", "ba"]


def test_tokenizer_fertility_exact(ray_session):
    import ray.data as rd
    from ksoup_ray.functions.curation import (_apply_bpe_merges,
                                              tokenizer_fertility)
    merges = [("t", "h"), ("a", "t"), ("e", "r")]
    docs = [{"lang": "en", "text": "that there the"},
            {"lang": "en", "text": "water"},
            {"lang": "de", "text": "zzz yy"},
            {"lang": "de", "text": ""}]
    out = tokenizer_fertility(rd.from_items(docs,
                                            override_num_blocks=2),
                              merges).to_pandas().set_index("lang")
    per_lang = {}
    for d in docs:
        ws = [w for w in d["text"].split(" ") if w]
        b, n = per_lang.get(d["lang"], (0, 0))
        per_lang[d["lang"]] = (
            b + sum(len(_apply_bpe_merges(w, merges)) for w in ws),
            n + len(ws))
    for lang, (b, n) in per_lang.items():
        if n == 0:
            continue
        assert out.loc[lang, "bpe_tokens"] == b
        assert out.loc[lang, "ws_tokens"] == n
        assert out.loc[lang, "fertility_ppm"] == b * 10**6 // n


def test_tokenizer_fertility_null_lang_survives(ray_session):
    import ray.data as rd
    from ksoup_ray.functions.curation import tokenizer_fertility
    docs = [{"lang": "en", "text": "the the"},
            {"lang": None, "text": "that water"}]
    out = tokenizer_fertility(rd.from_items(docs),
                              [("t", "h")]).to_pandas() \
        .set_index("lang")
    assert out.loc["en", "ws_tokens"] == 2
    assert out.loc["", "ws_tokens"] == 2     # null lang -> "" bucket


def test_hashed_linear_score_matches_naive(ray_session):
    import ray.data as rd
    from ksoup_ray.functions.curation import hashed_linear_score
    weights = [(b % 7) - 3 for b in range(64)]
    docs = [{"doc_id": 1, "text": "spark window merge"},
            {"doc_id": 2, "text": "the the the"},
            {"doc_id": 3, "text": ""}]
    out = hashed_linear_score(rd.from_items(docs), weights) \
        .to_pandas().set_index("doc_id")
    for d in docs:
        s = sum(weights[int(hashlib.md5(w.encode()).hexdigest()[:8],
                            16) % 64]
                for w in d["text"].split(" ") if w)
        assert out.loc[d["doc_id"], "score"] == s
        assert out.loc[d["doc_id"], "label"] == \
            ("keep" if s > 0 else "drop")
    assert len(out) == 3                 # every doc is scored


def test_curate_tiered_gates_compose(ray_session):
    import ray.data as rd
    from ksoup_ray.pipelines.curate import curate_tiered
    # weights that keep docs containing 'good' (bucket weight +3) and
    # drop docs of 'bad' words: derive buckets first, then weights
    def bucket(w):
        return int(hashlib.md5(w.encode()).hexdigest()[:8], 16) % 64
    weights = [0] * 64
    weights[bucket("good")] = 3
    weights[bucket("bad")] = -5
    docs = [
        {"doc_id": 0, "text": "good good common common"},
        {"doc_id": 1, "text": "good good common common"},  # exact dup
        {"doc_id": 2, "text": "bad bad common common"},    # clf drop
        {"doc_id": 3, "text": "good rare1 rare2 rare3"},   # high ppl
        {"doc_id": 4, "text": "good common common common"},
    ]
    out = curate_tiered(rd.from_items(docs, override_num_blocks=2),
                        weights).to_pandas().set_index("doc_id")
    assert 1 not in out.index          # dup of 0
    assert 2 not in out.index          # classifier drop
    surviving = set(out.index)
    # doc 3 is the tail tercile (rarest words) -> excluded
    assert surviving <= {0, 3, 4}
    assert {0, 4} <= surviving
    assert (out["tier"].isin(["head", "middle"])).all()
    assert out.loc[0, "score"] == 6    # two 'good' hits


def test_unigram_logprob_with_tokens_counts(ray_session):
    import ray.data as rd
    from ksoup_ray.functions.curation import unigram_logprob
    docs = [{"doc_id": 1, "text": "a b a"},
            {"doc_id": 2, "text": "b"}]
    out = unigram_logprob(rd.from_items(docs), with_tokens=True) \
        .to_pandas().set_index("doc_id")
    assert out.loc[1, "n_tokens"] == 3
    assert out.loc[2, "n_tokens"] == 1
    # backward-compat: default shape unchanged
    out2 = unigram_logprob(rd.from_items(docs)).to_pandas()
    assert sorted(out2.columns) == ["doc_id", "logprob_micros"]
