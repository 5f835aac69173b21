"""Unit tests for the session-12 operators: weighted sampling via
hash race clocks, Aho–Corasick blocklist matching (both engines),
and robots.txt parsing + longest-prefix decisions."""

import hashlib

import pyarrow as pa
import pytest


def _race_key(i, w):
    return min(hashlib.md5(f"{i}:{j}".encode()).hexdigest()
               for j in range(w))


def test_weighted_sample_matches_bruteforce(ray_session):
    import ray.data as rd
    from ksoup_ray.functions.splits import weighted_topk_sample

    rows = [{"doc_id": i, "weight": 1 + (i * 7) % 9}
            for i in range(200)]
    out = weighted_topk_sample(
        rd.from_items(rows).repartition(7), k=25).to_pandas()
    expect = sorted(((_race_key(r["doc_id"], r["weight"]),
                      r["doc_id"], r["weight"]) for r in rows))[:25]
    got = out.sort_values("rank")
    assert list(got["doc_id"]) == [d for _, d, _ in expect]
    assert list(got["race_key"]) == [k for k, _, _ in expect]
    assert list(got["weight"]) == [w for _, _, w in expect]
    assert list(got["rank"]) == list(range(1, 26))


def test_weighted_sample_partition_invariance(ray_session):
    import ray.data as rd
    from ksoup_ray.functions.splits import weighted_topk_sample

    rows = [{"doc_id": i, "weight": 1 + i % 5} for i in range(120)]
    a = weighted_topk_sample(rd.from_items(rows).repartition(2),
                             k=10).to_pandas().sort_values("rank")
    b = weighted_topk_sample(rd.from_items(rows).repartition(13),
                             k=10).to_pandas().sort_values("rank")
    assert list(a["doc_id"]) == list(b["doc_id"])
    assert list(a["race_key"]) == list(b["race_key"])


def test_weighted_sample_rejects_bad_weight(ray_session):
    import ray.data as rd
    from ray.exceptions import RayTaskError
    from ksoup_ray.functions.splits import weighted_topk_sample

    ds = rd.from_items([{"doc_id": 1, "weight": 0}])
    with pytest.raises((ValueError, RayTaskError)):
        weighted_topk_sample(ds, k=5).to_pandas()


def test_aho_corasick_classic_hers():
    from ksoup_ray.functions.curation import AhoCorasick

    ac = AhoCorasick(["he", "she", "his", "hers"])
    text = "ushers"
    hits = sorted((pi, end) for end, pi in ac.iter_matches(text))
    # she ends at 4, he ends at 4, hers ends at 6
    by_pat = {}
    for end, pi in ac.iter_matches(text):
        by_pat.setdefault(ac.patterns[pi], []).append(end)
    assert by_pat == {"she": [4], "he": [4], "hers": [6]}
    assert hits  # sanity


def test_aho_counts_equal_str_count_property():
    from ksoup_ray.functions.curation import AhoCorasick

    pats = ["a", "ab", "aa", "aba", "bb"]
    ac = AhoCorasick(pats)
    import random
    rng = random.Random(42)
    for _ in range(300):
        s = "".join(rng.choice("ab") for _ in range(rng.randint(0, 30)))
        got = ac.count_nonoverlapping(s)
        for pi, p in enumerate(pats):
            # str.count is non-overlapping greedy left-to-right
            assert got.get(pi, 0) == s.count(p), (s, p)


def test_blocklist_engines_agree(ray_session):
    import ray.data as rd
    from ksoup_ray.functions.curation import blocklist_match

    pats = ["batch batch", "spark", "dup", "slow join"]
    rows = [
        {"doc_id": 0, "text": "batch batch batch spark and spark"},
        {"doc_id": 1, "text": "no hits here"},
        {"doc_id": 2, "text": "dup dup slow join dup"},
        {"doc_id": 3, "text": ""},
    ]
    ds = rd.from_items(rows).repartition(2)
    a = blocklist_match(ds, patterns=pats, engine="substring") \
        .to_pandas().sort_values(["doc_id", "pattern"]) \
        .reset_index(drop=True)
    b = blocklist_match(ds, patterns=pats, engine="aho") \
        .to_pandas().sort_values(["doc_id", "pattern"]) \
        .reset_index(drop=True)
    assert a.equals(b)
    byk = {(r.doc_id, r.pattern): r.n for r in a.itertuples()}
    # 'batch batch batch' -> ONE non-overlapping 'batch batch'
    assert byk[(0, "batch batch")] == 1
    assert byk[(0, "spark")] == 2
    assert byk[(2, "dup")] == 3
    assert byk[(2, "slow join")] == 1
    assert (1 not in {k for k, _ in byk}) and (3 not in
                                               {k for k, _ in byk})


def test_parse_robots_group_selection():
    from ksoup_ray.functions.urls import parse_robots

    txt = (
        "# comment\n"
        "User-agent: trainbot\n"
        "Disallow: /tmp\n"
        "\n"
        "User-agent: otherbot\n"
        "User-agent: ksoupbot\n"
        "Crawl-delay: 9\n"
        "Disallow: /mine\n"
        "Allow: /mine/ok\n"
        "\n"
        "User-agent: *\n"
        "Disallow: /\n")
    # exact agent match beats '*'; consecutive UA lines share a group
    assert parse_robots(txt, agent="ksoupbot") == [
        (False, "/mine"), (True, "/mine/ok")]
    assert parse_robots(txt, agent="OTHERBOT") == [
        (False, "/mine"), (True, "/mine/ok")]
    # unknown agent falls back to '*'
    assert parse_robots(txt, agent="nobody") == [(False, "/")]
    # empty Disallow contributes no rule
    assert parse_robots("User-agent: *\nDisallow:\n") == []
    # no matching group at all
    assert parse_robots("User-agent: x\nDisallow: /a\n",
                        agent="y") == []


def test_robots_decide_longest_prefix_allow_ties(ray_session):
    import ray.data as rd
    from ksoup_ray.functions.urls import robots_decide

    rules = {"h1": [(False, "/private"), (True, "/private/pub"),
                    (False, "/private/pub")],   # tie -> Allow wins
             "h2": [(False, "/")]}
    rows = [
        {"doc_id": 0, "host": "h1", "path": "/private/pub/x"},
        {"doc_id": 1, "host": "h1", "path": "/private/secret"},
        {"doc_id": 2, "host": "h1", "path": "/open"},
        {"doc_id": 3, "host": "h2", "path": "/anything"},
        {"doc_id": 4, "host": "h3", "path": "/private/pub/x"},
    ]
    out = robots_decide(rd.from_items(rows), rules) \
        .to_pandas().set_index("doc_id")
    assert bool(out.loc[0, "allowed"]) is True          # tie -> Allow
    assert out.loc[0, "matched_rule"] == "/private/pub"
    assert bool(out.loc[1, "allowed"]) is False
    assert out.loc[1, "matched_rule"] == "/private"
    assert bool(out.loc[2, "allowed"]) is True          # no match
    assert out.loc[2, "matched_rule"] is None
    assert bool(out.loc[3, "allowed"]) is False
    assert bool(out.loc[4, "allowed"]) is True          # unknown host


def test_apply_bpe_merges_run_parity():
    from ksoup_ray.functions.curation import _apply_bpe_merges

    # greedy left-to-right in same-pair runs: 1st, 3rd, ... win
    assert _apply_bpe_merges("aaaa", [("a", "a")]) == ["aa", "aa"]
    assert _apply_bpe_merges("aaa", [("a", "a")]) == ["aa", "a"]
    assert _apply_bpe_merges("ababa", [("a", "b")]) == \
        ["ab", "ab", "a"]
    # merges apply IN ORDER, later merges see earlier tokens
    assert _apply_bpe_merges("abab", [("a", "b"), ("ab", "ab")]) == \
        ["abab"]
    # a merge never crosses what an earlier merge consumed
    assert _apply_bpe_merges("abc", [("b", "c"), ("a", "b")]) == \
        ["a", "bc"]


def _brute_bpe(texts, rounds):
    from ksoup_ray.functions.curation import _apply_bpe_merges
    from collections import Counter
    wc = Counter(w for t in texts for w in t.split(" ") if w)
    merges, rows = [], []
    for step in range(1, rounds + 1):
        pairs = Counter()
        for w, c in wc.items():
            toks = _apply_bpe_merges(w, merges)
            for a, b in zip(toks, toks[1:]):
                pairs[(a, b)] += c
        if not pairs:
            break
        (a, b), n = sorted(pairs.items(),
                           key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append((a, b))
        rows.append((step, a, b, n))
    return rows


def test_bpe_learn_matches_bruteforce(ray_session):
    import ray.data as rd
    from ksoup_ray.functions.curation import bpe_learn

    texts = ["low lower lowest", "new newer newest newest",
             "wide wider widest low low", "", "banana bandana"]
    ds = rd.from_items([{"text": t} for t in texts]).repartition(3)
    got = bpe_learn(ds, rounds=4)
    expect = _brute_bpe(texts, 4)
    assert [tuple(r) for r in
            got[["step", "lhs", "rhs", "n"]].itertuples(index=False)] \
        == expect


def test_orc_roundtrip_and_stripe_split(ray_session, tmp_path):
    import pyarrow.orc as orc
    import ray.data as rd
    from ksoup_ray.sources.orc import read_orc, write_orc_shards

    rows = [{"doc_id": i, "text": f"t{i}", "val": i * 2}
            for i in range(100)]
    out = str(tmp_path / "orc")
    manifest = write_orc_shards(rd.from_items(rows).repartition(4),
                                out).to_pandas()
    assert manifest["rows"].sum() == 100
    assert all(p.endswith(".orc") for p in manifest["path"])
    # whole-file and per-stripe reads agree with the source
    a = read_orc(out, split_stripes=False).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    b = read_orc(out, split_stripes=True).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert a.equals(b)
    assert len(a) == 100
    assert list(a["val"]) == [i * 2 for i in sorted(a["doc_id"])]
    # column pruning reaches the decoder
    c = read_orc(out, columns=["doc_id"]).to_pandas()
    assert list(c.columns) == ["doc_id"]
    # multi-stripe file splits into >1 task item
    big = str(tmp_path / "big.orc")
    t = rd.from_items(rows).to_pandas()
    import pyarrow as pa2
    orc.write_table(pa2.Table.from_pandas(t, preserve_index=False),
                    big, stripe_size=1024)
    n_stripes = orc.ORCFile(big).nstripes
    assert n_stripes >= 1
    d = read_orc(big).to_pandas().sort_values("doc_id") \
        .reset_index(drop=True)
    assert d["doc_id"].tolist() == sorted(t["doc_id"])


def test_read_orc_empty_raises(tmp_path):
    import pytest as _pt
    from ksoup_ray.sources.orc import read_orc
    with _pt.raises(ValueError):
        read_orc(str(tmp_path))


def test_epoch_shuffle_reproducible_and_permuting(ray_session):
    import ray.data as rd
    from ksoup_ray.functions.splits import epoch_shuffle

    rows = [{"doc_id": i} for i in range(300)]
    ds = rd.from_items(rows).repartition(5)
    a = epoch_shuffle(ds, epoch=0, n_shards=8).to_pandas()
    b = epoch_shuffle(ds, epoch=0, n_shards=8).to_pandas()
    c = epoch_shuffle(ds, epoch=1, n_shards=8).to_pandas()
    key = lambda df: df.sort_values(["shard", "pos"]) \
        .reset_index(drop=True)
    # same epoch replays identically; all docs exactly once
    assert key(a).equals(key(b))
    assert sorted(a["doc_id"]) == list(range(300))
    assert sorted(c["doc_id"]) == list(range(300))
    # different epoch is a different permutation
    assert list(key(a)["doc_id"]) != list(key(c)["doc_id"])
    # positions are 1..len contiguous within every shard
    for _, g in a.groupby("shard"):
        assert sorted(g["pos"]) == list(range(1, len(g) + 1))
    assert set(a["shard"]) <= set(range(8))


def test_registered_domain_longest_match():
    from ksoup_ray.functions.urls import registered_domain

    assert registered_domain("www.x.co.uk") == "x.co.uk"
    assert registered_domain("x.co.uk") == "x.co.uk"
    assert registered_domain("co.uk") is None        # is a suffix
    assert registered_domain("deep.a.b.d1.com.au") == "d1.com.au"
    assert registered_domain("EXAMPLE.COM") == "example.com"
    assert registered_domain("example.com.") == "example.com"
    assert registered_domain("localhost") is None    # no match
    # 'uk' alone is also a suffix: one label above it registers
    assert registered_domain("direct.uk") == "direct.uk"


def test_to_markdown_block_and_inline_shapes():
    from ksoup_ray.stages.markdown import to_markdown

    html = ("<html><head><title>x</title><style>p{}</style></head>"
            "<body><h1>Title</h1>"
            "<p>Hello <strong>bold</strong> and <em>it</em> and "
            '<a href="/x">link</a>.</p>'
            "<ul><li>one</li><li>two <code>c()</code></li>"
            "<li>three<ul><li>n1</li></ul></li></ul>"
            "<ol><li>a</li><li>b</li></ol>"
            "<pre>raw  text\nline2</pre>"
            "<blockquote><p>quoted</p></blockquote>"
            "<table><tr><th>A</th><th>B</th></tr>"
            "<tr><td>1</td><td>2</td></tr></table>"
            "<hr>loose <b>t</b> run"
            '<img src="/i.png" alt="pic"></body></html>')
    md = to_markdown(html)
    assert md.split("\n\n") == [
        "# Title",
        "Hello **bold** and *it* and [link](/x).",
        "- one\n- two `c()`\n- three\n  - n1",
        "1. a\n2. b",
        "```\nraw  text\nline2\n```",
        "> quoted",
        "| A | B |\n| --- | --- |\n| 1 | 2 |",
        "---",
        "loose **t** run![pic](/i.png)",
    ]


def test_to_markdown_hostile_inputs():
    from ksoup_ray.stages.markdown import to_markdown

    assert to_markdown("") == ""
    assert to_markdown("plain words") == "plain words"
    # script/style content never leaks
    assert "evil" not in to_markdown(
        "<body><script>evil()</script><p>ok</p></body>")
    # unclosed tags still serialize (tree builder recovers)
    assert to_markdown("<h2>hi") == "## hi"
    # empty emphasis collapses instead of emitting '****'
    assert to_markdown("<p>a<strong> </strong>b</p>") == "a b"


def test_markdown_stage_batch(ray_session):
    import ray.data as rd
    from ksoup_ray.stages.markdown import MarkdownStage

    rows = [{"doc_id": i, "html": f"<h1>T{i}</h1><p>p{i}</p>"}
            for i in range(20)]
    out = rd.from_items(rows).map_batches(
        MarkdownStage, batch_format="pyarrow",
        concurrency=(1, 2)).to_pandas().sort_values("doc_id")
    assert list(out["markdown"]) == [
        f"# T{i}\n\np{i}" for i in range(20)]


def test_compression_ratio_exact_and_ordering(ray_session):
    import zlib
    import ray.data as rd
    from ksoup_ray.functions.curation import compression_ratio_batch

    rep = "spam " * 200                     # highly redundant
    h, parts = b"seed", []
    for _ in range(64):                     # 2 KB of md5-hex entropy
        h = hashlib.md5(h).digest()
        parts.append(h.hex())
    rnd = "".join(parts)
    rows = [{"doc_id": 0, "text": rep},
            {"doc_id": 1, "text": rnd},
            {"doc_id": 2, "text": ""}]
    out = rd.from_items(rows).map_batches(
        compression_ratio_batch, batch_format="pyarrow") \
        .to_pandas().set_index("doc_id")
    for i, t in ((0, rep), (1, rnd)):
        b = t.encode()
        c = len(zlib.compress(b, 6))
        assert out.loc[i, "raw_len"] == len(b)
        assert out.loc[i, "comp_len"] == c
        assert out.loc[i, "ratio_permille"] == c * 1000 // len(b)
    # redundancy compresses far below near-random text
    assert out.loc[0, "ratio_permille"] < out.loc[1, "ratio_permille"]
    assert out.loc[0, "ratio_permille"] < 100
    assert out.loc[1, "ratio_permille"] > 400
    assert out.loc[2, "ratio_permille"] == 0     # empty guard


def test_fix_mojibake_variants():
    from ksoup_ray.functions.curation import fix_mojibake

    s = "hello café n№ – ok"
    lat = s.encode("utf-8").decode("latin-1")
    cp = s.encode("utf-8").decode("cp1252")
    dbl = lat.encode("utf-8").decode("latin-1")   # double-encoded
    assert fix_mojibake(lat) == (s, True)
    assert fix_mojibake(cp) == (s, True)
    assert fix_mojibake(dbl) == (s, True)         # unwinds twice
    # never touches clean text
    assert fix_mojibake("plain ascii") == ("plain ascii", False)
    assert fix_mojibake(s) == (s, False)          # genuine unicode
    assert fix_mojibake("café") == ("café", False)  # latin-1-able
    assert fix_mojibake("") == ("", False)


def test_mojibake_repair_stage(ray_session):
    import ray.data as rd
    from ksoup_ray.functions.curation import mojibake_repair

    s = "text café"
    rows = [{"doc_id": 0, "text": s},
            {"doc_id": 1,
             "text": s.encode("utf-8").decode("latin-1")}]
    out = mojibake_repair(rd.from_items(rows)).to_pandas() \
        .set_index("doc_id")
    assert out.loc[0, "fixed"] == s
    assert not out.loc[0, "was_mojibake"]
    assert out.loc[1, "fixed"] == s
    assert out.loc[1, "was_mojibake"]


def test_neardup_decontaminate_thresholds(ray_session):
    import ray.data as rd
    from ksoup_ray.functions.dedup import neardup_decontaminate

    bench = "the quick brown fox jumps over the lazy dog today"
    near = bench.replace("today", "now")       # high overlap
    far = "completely different words in every position here"
    rows = [{"doc_id": 0, "text": bench},
            {"doc_id": 1, "text": near},
            {"doc_id": 2, "text": far}]
    ds = rd.from_items(rows)
    ev = rd.from_items([{"doc_id": 100, "text": bench}])
    out = neardup_decontaminate(ds, ev).to_pandas() \
        .set_index("doc_id")
    assert out.loc[0, "max_jppm"] == 1_000_000   # exact copy
    assert bool(out.loc[0, "contaminated"])
    assert 0 < out.loc[1, "max_jppm"] < 1_000_000
    assert bool(out.loc[1, "contaminated"]) == \
        (out.loc[1, "max_jppm"] >= 500_000)
    assert out.loc[2, "max_jppm"] == 0
    assert not bool(out.loc[2, "contaminated"])


def test_to_markdown_hostile_depth_iterative():
    from ksoup_ray.stages.markdown import to_markdown

    # none of these may hit Python's recursion limit
    assert to_markdown("<div>" * 3000 + "<p>x</p>"
                       + "</div>" * 3000) == "x"
    deep_em = to_markdown("<p>" + "<em>" * 2000 + "x"
                          + "</em>" * 2000 + "</p>")
    assert deep_em == "*" * 2000 + "x" + "*" * 2000
    deep_bq = to_markdown("<blockquote>" * 1200 + "<p>q</p>"
                          + "</blockquote>" * 1200)
    assert deep_bq == "> " * 1200 + "q"
    deep_list = to_markdown("<ul><li>a" + "<ul><li>b" * 1500
                            + "</li></ul>" * 1500 + "</li></ul>")
    lines = deep_list.split("\n")
    assert len(lines) == 1501
    assert lines[0] == "- a" and lines[1] == "  - b"
    assert lines[1500] == "  " * 1500 + "- b"


def test_wet_roundtrip_and_truncation(ray_session, tmp_path):
    import gzip
    import os
    import ray.data as rd
    from ksoup_ray.sources.warc import (read_wet, write_wet_shards,
                                        _wet_record_bytes)

    rows = [{"url": f"https://x.test/{i}", "text": f"text {i} é№"}
            for i in range(40)]
    out = str(tmp_path / "wet")
    n = write_wet_shards(rd.from_items(rows).repartition(3), out,
                         records_per_file=16)
    assert n == 40
    assert all(f.endswith(".warc.wet.gz")
               for f in os.listdir(out) if not f.startswith("."))
    back = read_wet(out).to_pandas().sort_values("url") \
        .reset_index(drop=True)
    import pandas as pd
    expect = pd.DataFrame(rows).sort_values("url") \
        .reset_index(drop=True)
    assert back.equals(expect)

    # a record cut mid-payload is COUNTED, never a silently-short
    # text (gzip a truncated RECORD — Arrow inflates the .gz, the
    # worker walks plain records and must drop the short one)
    good = _wet_record_bytes("https://x.test/ok", "k")
    cut = _wet_record_bytes("https://x.test/bad",
                            "long text body that gets cut")[:-12]
    trunc_dir = str(tmp_path / "trunc")
    os.makedirs(trunc_dir)
    with open(os.path.join(trunc_dir, "wet-z.warc.wet.gz"),
              "wb") as f:
        f.write(gzip.compress(good + cut, mtime=0))
    got = read_wet(trunc_dir).to_pandas()
    assert list(got["url"]) == ["https://x.test/ok"]
    assert list(got["text"]) == ["k"]


def test_surt_key_shapes():
    from ksoup_ray.functions.urls import surt_key

    assert surt_key("https://WWW.Example.com/a/b?q=1#f") == \
        "com,example,www)/a/b?q=1"
    assert surt_key("http://a.b.c:8080/x") == "c,b,a:8080)/x"
    assert surt_key("https://host.com") == "com,host)/"
    assert surt_key("https://u:p@h.org/p") == "org,h)/p"
    # sort-order property: all subdomains of one domain are one
    # contiguous range, disjoint from a later domain
    keys = sorted(surt_key(u) for u in [
        "https://a.x.com/1", "https://b.x.com/2", "https://x.com/3",
        "https://y.com/0"])
    assert keys[0].startswith("com,x)") and \
        keys[1].startswith("com,x,") and keys[2].startswith("com,x,")
    assert keys[3].startswith("com,y)")


def test_cdx_sidecar_and_point_fetch(ray_session, tmp_path):
    import os
    import ray.data as rd
    from ksoup_ray.sources.warc import (fetch_records, read_cdx,
                                        write_warc_shards)

    rows = [{"url": f"https://s{i % 3}.test/p/{i}",
             "html": f"<p>body {i}</p>".encode()} for i in range(30)]
    out = str(tmp_path / "warc")
    n = write_warc_shards(rd.from_items(rows).repartition(2), out,
                          records_per_file=8, cdx=True)
    assert n == 30
    shards = [f for f in os.listdir(out) if f.endswith(".warc.gz")]
    sidecars = [f for f in os.listdir(out) if f.endswith(".cdx")]
    assert len(shards) == len(sidecars) >= 2

    idx = read_cdx(out).to_pandas()
    assert len(idx) == 30
    # sidecar lines are SURT-sorted per shard
    for _, g in idx.groupby("shard"):
        pass  # read order within a file is the written (sorted) order
    with open(os.path.join(out, sidecars[0])) as f:
        keys = [l.split("\t")[0] for l in f]
    assert keys == sorted(keys)

    # point-fetch a subset: exact payloads back, no shard streaming
    pick = idx[idx["url"].str.endswith(("/3", "/17", "/29"))]
    got = fetch_records(out, rd.from_items(
        pick.to_dict("records"))).to_pandas().sort_values("url")
    assert len(got) == 3
    for _, r in got.iterrows():
        i = int(r["url"].rsplit("/", 1)[1])
        assert bytes(r["html"]) == f"<p>body {i}</p>".encode()


def test_labelprop_rounds_vs_bruteforce(ray_session):
    import ray.data as rd
    from ksoup_ray.functions.graph import labelprop_rounds

    # two chains and an isolated self-contained pair
    edges = [(10, 11), (11, 12), (12, 13),
             (20, 21), (30, 31), (31, 20)]
    ds = rd.from_items([{"src": s, "dst": d} for s, d in edges]) \
        .repartition(3)

    def brute(iters):
        und = {}
        for s, d in edges:
            und.setdefault(s, set()).add(d)
            und.setdefault(d, set()).add(s)
        lbl = {n: n for n in und}
        for _ in range(iters):
            lbl = {n: min([lbl[n]] + [lbl[u] for u in und[n]])
                   for n in und}
        return lbl

    for iters in (1, 2, 3):
        got = labelprop_rounds(ds, iters=iters).to_pandas()
        assert dict(zip(got["node"], got["label"])) == brute(iters)
    # 3 rounds fully converge these components
    conv = labelprop_rounds(ds, iters=3).to_pandas()
    comp = dict(zip(conv["node"], conv["label"]))
    assert comp[13] == 10 and comp[21] == 20 and comp[31] == 20


def test_boilerplate_strip_threshold_semantics(ray_session):
    import ray.data as rd
    from ksoup_ray.functions.curation import boilerplate_strip

    rows = [
        # host A: 4 pages; 'nav' on all, 'promo' on exactly 2 (50%
        # -> boilerplate at min_ratio_pct=50), unique bodies
        {"doc_id": 0, "host": "A", "text": "nav\npromo\nbody0"},
        {"doc_id": 1, "host": "A", "text": "nav\npromo\nbody1"},
        {"doc_id": 2, "host": "A", "text": "nav\nbody2"},
        # same line TWICE in one doc counts that doc once
        {"doc_id": 3, "host": "A", "text": "nav\nbody3\nbody3"},
        # host B: 1 page; everything is 100% -> fully stripped
        {"doc_id": 4, "host": "B", "text": "only\nlines"},
        # 'nav' on host C is NOT boilerplate: 1 of 3 pages < 50%
        {"doc_id": 5, "host": "C", "text": "nav\nbodyC"},
        {"doc_id": 6, "host": "C", "text": "other\nbodyC2"},
        {"doc_id": 7, "host": "C", "text": "third\nbodyC3"},
    ]
    out = boilerplate_strip(rd.from_items(rows).repartition(3)) \
        .to_pandas().set_index("doc_id")
    assert out.loc[0, "cleaned"] == "body0"
    assert out.loc[0, "n_stripped"] == 2          # nav + promo
    assert out.loc[2, "cleaned"] == "body2"
    assert out.loc[2, "n_stripped"] == 1
    assert out.loc[3, "cleaned"] == "body3\nbody3"
    # single-page host: below the min_pages floor -> untouched (with
    # 1 page every line is 100% frequent; stripping would erase it)
    assert out.loc[4, "cleaned"] == "only\nlines"
    assert out.loc[4, "n_stripped"] == 0
    assert out.loc[5, "cleaned"] == "nav\nbodyC"  # host-scoped
    assert out.loc[5, "n_stripped"] == 0


def test_fetch_records_counts_truncated_member(ray_session, tmp_path):
    import gzip
    import os
    import ray.data as rd
    from ksoup_ray.sources.warc import (_record_bytes, fetch_records)

    good = gzip.compress(_record_bytes("https://x.test/ok",
                                       b"<p>k</p>"), mtime=0)
    bad = gzip.compress(_record_bytes("https://x.test/bad",
                                      b"<p>gone</p>"), mtime=0)
    root = str(tmp_path)
    with open(os.path.join(root, "shard-a.warc.gz"), "wb") as f:
        f.write(good + bad)
    idx = [
        {"shard": "shard-a.warc.gz", "offset": 0,
         "length": len(good)},
        # stale CDX length: member cut short -> EOFError inside gzip,
        # must be a COUNTED drop, not a task crash
        {"shard": "shard-a.warc.gz", "offset": len(good),
         "length": len(bad) - 6},
    ]
    out = fetch_records(root, rd.from_items(idx)).to_pandas()
    assert list(out["url"]) == ["https://x.test/ok"]


def test_cdx_escapes_hostile_urls(ray_session, tmp_path):
    import ray.data as rd
    from ksoup_ray.sources.warc import (read_cdx, write_warc_shards)

    rows = [{"url": "https://x.test/a\tb\nc", "html": b"<p>t</p>"},
            {"url": "https://x.test/plain", "html": b"<p>p</p>"}]
    out = str(tmp_path / "w")
    write_warc_shards(rd.from_items(rows), out,
                      records_per_file=8, cdx=True)
    idx = read_cdx(out).to_pandas()
    assert sorted(idx["url"]) == sorted(r["url"] for r in rows)


def test_parse_robots_rfc_group_merging():
    from ksoup_ray.functions.urls import parse_robots

    # two separate groups for the same agent MERGE (RFC 9309)
    txt = ("User-agent: ksoupbot\nDisallow: /a\n\n"
           "User-agent: ksoupbot\nDisallow: /b\n")
    assert parse_robots(txt) == [(False, "/a"), (False, "/b")]
    # unknown directives are ignored entirely: they split neither a
    # UA line run nor a group
    txt2 = ("User-agent: a\nCrawl-delay: 1\nUser-agent: b\n"
            "Disallow: /x\n")
    assert parse_robots(txt2, agent="a") == [(False, "/x")]
    assert parse_robots(txt2, agent="b") == [(False, "/x")]
    # a rule-less exact group still suppresses the * fallback
    txt3 = ("User-agent: ksoupbot\nDisallow:\n\n"
            "User-agent: *\nDisallow: /\n")
    assert parse_robots(txt3) == []


def test_surt_key_query_without_path():
    from ksoup_ray.functions.urls import surt_key

    assert surt_key("https://example.com?q=1") == "com,example)/?q=1"
    assert surt_key("https://example.com/?q=1") == "com,example)/?q=1"


def test_markdown_list_continuation_and_nested_table():
    from ksoup_ray.stages.markdown import to_markdown

    # text after a nested list is an indented continuation, never a
    # phantom item with a duplicate ordinal
    assert to_markdown(
        "<ol><li>a<ul><li>x</li></ul>b</li><li>c</li></ol>") == \
        "1. a\n  - x\n  b\n2. c"
    # nested tables' rows are not re-emitted at the outer level
    md = to_markdown("<table><tr><td>o<table><tr><td>n</td></tr>"
                     "</table></td></tr></table>")
    assert md == "| on |\n| --- |"
