"""Round-5 additions: the shared-shingle-pruned neardup_decontaminate
must be BIT-IDENTICAL to the all-pairs broadcast-exact baseline, the
registry manifest must stay consistent, and the value-checked pagerank
registry entry must equal the exact integer form divided once."""

import numpy as np
import pyarrow as pa


def _baseline_neardup(rows, eval_rows, k=5):
    """The round-4 all-pairs kernel, reimplemented verbatim as the
    oracle: per doc, exact integer Jaccard against EVERY eval doc."""
    from ksoup_ray.functions.dedup import word_shingles
    evals = [(r["doc_id"], word_shingles(r["text"] or "", k))
             for r in eval_rows]
    out = {}
    for r in rows:
        s = word_shingles(r["text"] or "", k)
        best = 0
        for _, es in evals:
            inter = len(s & es)
            if not inter:
                continue
            union = len(s) + len(es) - inter
            jppm = inter * 1_000_000 // union
            if jppm > best:
                best = jppm
        out[r["doc_id"]] = best
    return out


def test_neardup_decontaminate_matches_allpairs_baseline(ray_session):
    import ray.data as rd
    from ksoup_ray.functions.dedup import neardup_decontaminate

    rng = np.random.default_rng(7)
    vocab = [f"w{i}" for i in range(60)]
    eval_rows = []
    for i in range(8):
        words = rng.choice(vocab, size=rng.integers(6, 20)).tolist()
        eval_rows.append({"doc_id": 100 + i, "text": " ".join(words)})
    rows = []
    for i in range(60):
        mode = i % 4
        if mode == 0:        # verbatim eval copy
            text = eval_rows[i % 8]["text"]
        elif mode == 1:      # partial overlap: eval prefix + noise
            ev = eval_rows[i % 8]["text"].split()
            noise = rng.choice(vocab, size=6).tolist()
            text = " ".join(ev[: len(ev) // 2] + noise)
        elif mode == 2:      # random (may share shingles by chance)
            text = " ".join(
                rng.choice(vocab, size=rng.integers(3, 25)).tolist())
        else:                # short doc (< k words -> whole-text shingle)
            text = " ".join(rng.choice(vocab, size=2).tolist())
        rows.append({"doc_id": i, "text": text})
    rows.append({"doc_id": 999, "text": ""})  # empty doc

    expect = _baseline_neardup(rows, eval_rows)
    out = neardup_decontaminate(
        rd.from_items(rows), rd.from_items(eval_rows)).to_pandas() \
        .set_index("doc_id")
    assert len(out) == len(rows)
    for doc_id, jppm in expect.items():
        assert int(out.loc[doc_id, "max_jppm"]) == jppm, doc_id
        assert bool(out.loc[doc_id, "contaminated"]) == \
            (jppm >= 500_000), doc_id


def test_queries_manifest_consistent():
    import __ray_entry__ as e
    m = e.queries_manifest()
    q = e.queries()
    o = e.oracle_sql()
    assert set(m) == set(q)
    for name, row in m.items():
        assert row["value_checked"] == (name in o), name
        if row["value_checked"]:
            assert row["rows_only_reason"] is None, name
        else:
            assert row["rows_only_reason"], name
        comp = row["companion"]
        if comp is not None:
            assert comp in q and comp in o, name


def test_pagerank_entry_is_exact_picos_divided(ray_session):
    """The registered float pagerank must equal pagerank_picos / 1e12
    term for term (the order-free value-checked construction)."""
    q = None
    import __ray_entry__ as e
    q = e.queries()
    sf = "/root/testdata/sf0.001"
    pr = q["pagerank"](sf).to_pandas().set_index("node")
    p2 = q["pagerank_2iter"](sf).to_pandas().set_index("node")
    assert len(pr) == len(p2)
    joined = pr.join(p2)
    assert (joined["rank"] ==
            joined["rank_picos"].to_numpy(np.int64) / 1.0e12).all()


def test_spans_flat_arrow_layout(ray_session):
    """ParseExtract's spans column must be list<struct<start,end>>
    int64 with per-text-node source ranges in document order."""
    from ksoup_ray.stages.extract import ParseExtract, SPANS_TYPE
    html = b"<html><body><p>alpha beta</p><p>gamma</p></body></html>"
    batch = pa.table({
        "url": pa.array(["http://x/1"]),
        "html": pa.array([html], pa.binary()),
    })
    out = ParseExtract()(batch)
    spans = out.column("spans")
    assert spans.type == SPANS_TYPE
    rows = spans.to_pylist()[0]
    assert len(rows) == 2
    s0, s1 = rows
    text = html.decode()
    assert text[s0["start"]:s0["end"]] == "alpha beta"
    assert text[s1["start"]:s1["end"]] == "gamma"


def test_luhn_pan_batch_kernel():
    from ksoup_ray.functions.curation import luhn_pan_batch
    rows = pa.table({
        "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
        "text": pa.array([
            "pay 4539578763621486 now",        # valid Luhn
            "pay 4539578763621487 now",        # last digit off
            "ref 123 and 99 no pan",           # runs but no 16-digit
            "",                                # empty
        ]),
    })
    out = luhn_pan_batch(rows).to_pydict()
    assert out["n_digit_runs"] == [1, 1, 2, 0]
    assert out["n_pan16"] == [1, 1, 0, 0]
    assert out["n_luhn_valid"] == [1, 0, 0, 0]


def test_dup_host_spread(ray_session):
    import ray.data as rd
    from ksoup_ray.functions.dedup import dup_host_spread
    rows = [
        {"doc_id": 0, "text": "mirrored article", "source": "a.com"},
        {"doc_id": 1, "text": "mirrored article", "source": "b.com"},
        {"doc_id": 2, "text": "mirrored article", "source": "a.com"},
        {"doc_id": 3, "text": "site template", "source": "c.com"},
        {"doc_id": 4, "text": "site template", "source": "c.com"},
        {"doc_id": 5, "text": "unique page", "source": "d.com"},
    ]
    out = dup_host_spread(rd.from_items(rows)).to_pandas() \
        .set_index("content_md5")
    import hashlib
    mirrored = hashlib.md5(b"mirrored article").hexdigest()
    template = hashlib.md5(b"site template").hexdigest()
    assert len(out) == 2
    assert out.loc[mirrored, "cluster_size"] == 3
    assert out.loc[mirrored, "n_hosts"] == 2
    assert out.loc[template, "cluster_size"] == 2
    assert out.loc[template, "n_hosts"] == 1


def test_charclass_profile_batch():
    from ksoup_ray.functions.textstats import charclass_profile_batch
    rows = pa.table({
        "doc_id": pa.array([0, 1, 2], pa.int64()),
        "text": pa.array(["ab 12!", "", "aaaa"]),
    })
    out = charclass_profile_batch(rows).to_pydict()
    # "ab 12!": 6 chars, 2 alpha, 2 digit, 1 space, 1 other
    assert out["n_chars"] == [6, 0, 4]
    assert out["alpha_pm"] == [2 * 1000 // 6, 0, 1000]
    assert out["digit_pm"] == [2 * 1000 // 6, 0, 0]
    assert out["space_pm"] == [1000 // 6, 0, 0]
    assert out["other_pm"] == [1000 // 6, 0, 0]


def test_novelty_frac(ray_session):
    import ray.data as rd
    from ksoup_ray.functions.curation import novelty_frac
    rows = [
        {"doc_id": 0, "text": "a b c d"},        # grams: abc, bcd
        {"doc_id": 1, "text": "a b c e"},        # abc (doc0 first), bce
        {"doc_id": 2, "text": "x y"},            # no 3-grams
        {"doc_id": 3, "text": "a b c d"},        # all introduced earlier
    ]
    out = novelty_frac(rd.from_items(rows), n=3).to_pandas() \
        .set_index("doc_id")
    assert 2 not in out.index
    assert out.loc[0, "n_ngrams"] == 2 and out.loc[0, "n_first"] == 2
    assert out.loc[0, "novelty_ppm"] == 1_000_000
    assert out.loc[1, "n_ngrams"] == 2 and out.loc[1, "n_first"] == 1
    assert out.loc[1, "novelty_ppm"] == 500_000
    assert out.loc[3, "n_ngrams"] == 2 and out.loc[3, "n_first"] == 0
    assert out.loc[3, "novelty_ppm"] == 0


def test_best_keeper_ids(ray_session):
    import ray.data as rd
    from ksoup_ray.functions.dedup import best_keeper_ids
    rows = [
        {"content_md5": "k1", "n_chars": 10, "doc_id": 5},
        {"content_md5": "k1", "n_chars": 30, "doc_id": 9},
        {"content_md5": "k1", "n_chars": 30, "doc_id": 3},  # tie -> min id
        {"content_md5": "k2", "n_chars": 7, "doc_id": 1},
    ]
    out = best_keeper_ids(rd.from_items(rows)).to_pandas() \
        .set_index("content_md5")
    assert out.loc["k1", "keep_id"] == 3
    assert out.loc["k1", "best_score"] == 30
    assert out.loc["k1", "cluster_size"] == 3
    assert out.loc["k2", "keep_id"] == 1
    assert out.loc["k2", "cluster_size"] == 1


def test_mp4_container_roundtrip():
    import numpy as np
    from ksoup_ray.functions.mp4 import (box_types, decode_mp4_mjpeg,
                                         demux_mp4, encode_mp4_mjpeg)
    rng = np.random.default_rng(0)
    h, w = 16, 24
    base = (np.linspace(0, 200, h * w * 3).reshape(h, w, 3)
            .astype(np.uint8))
    frames = [np.clip(base.astype(np.int64) + 9 * t, 0, 255)
              .astype(np.uint8) for t in range(4)]
    data = encode_mp4_mjpeg(frames, fps=30, quality=92)
    assert box_types(data)[:3] == ["ftyp", "mdat", "moov"]
    assert len(box_types(data)) == 19
    samples, fps, ww, hh, fourcc = demux_mp4(data)
    assert (len(samples), fps, ww, hh, fourcc) == (4, 30, w, h,
                                                   b"jpeg")
    # every sample is a standalone JPEG (SOI marker)
    assert all(s[:2] == b"\xff\xd8" for s in samples)
    dec, fps2 = decode_mp4_mjpeg(data)
    assert fps2 == 30 and len(dec) == 4
    for orig, got in zip(frames, dec):
        assert got.shape == orig.shape
        err = np.abs(got.astype(np.int64) - orig.astype(np.int64))
        assert err.max() <= 12


def test_mp4_box_walker_malformed():
    import pytest
    from ksoup_ray.functions.mp4 import parse_boxes
    import struct
    # truncated size field larger than the buffer
    bad = struct.pack(">I", 100) + b"free" + b"xx"
    with pytest.raises(ValueError):
        parse_boxes(bad)
    # 64-bit largesize box parses
    big = struct.pack(">I", 1) + b"free" + struct.pack(">Q", 16)
    assert parse_boxes(big)[0][0] == b"free"


def test_mp4_compressed_codec_guard():
    import pytest
    import struct
    from ksoup_ray.functions.mp4 import (decode_mp4_mjpeg, demux_mp4,
                                         encode_mp4_mjpeg)
    import numpy as np
    frames = [np.zeros((8, 8, 3), np.uint8)]
    data = bytearray(encode_mp4_mjpeg(frames))
    i = data.find(b"jpeg", data.find(b"stsd"))
    data[i:i + 4] = b"avc1"          # pretend H.264 sample entry
    samples, _fps, _w, _h, fourcc = demux_mp4(bytes(data))
    assert fourcc == b"avc1" and len(samples) == 1  # demux still works
    with pytest.raises(NotImplementedError):
        decode_mp4_mjpeg(bytes(data))


def test_largest_remainder():
    from ksoup_ray.functions.mixing import largest_remainder
    q = largest_remainder(50, {"en": 400, "de": 200, "fr": 200,
                               "es": 120, "zh": 80})
    assert sum(q.values()) == 50
    assert q == {"en": 20, "de": 10, "fr": 10, "es": 6, "zh": 4}
    # remainder distribution: 7 into permille thirds
    q2 = largest_remainder(7, {"a": 334, "b": 333, "c": 333})
    assert sum(q2.values()) == 7 and q2["a"] >= q2["b"] >= q2["c"] - 1
    import pytest
    with pytest.raises(ValueError):
        largest_remainder(10, {"a": 500})


def test_mix_sample_exact_quotas(ray_session):
    import hashlib
    import ray.data as rd
    from ksoup_ray.functions.mixing import largest_remainder, mix_sample
    rows = [{"doc_id": i, "lang": ["en", "de"][i % 2]}
            for i in range(200)]
    weights = {"en": 600, "de": 400}
    out = mix_sample(rd.from_items(rows), weights,
                     frac_permille=250).to_pandas()
    quotas = largest_remainder(50, weights)
    got = out.groupby("lang")["doc_id"].count().to_dict()
    assert got == quotas
    # kept docs are exactly the smallest md5 keys per lang
    for lang, q in quotas.items():
        ids = [r["doc_id"] for r in rows if r["lang"] == lang]
        ranked = sorted(ids, key=lambda i: (
            hashlib.md5(str(i).encode()).hexdigest(), i))
        assert set(out[out["lang"] == lang]["doc_id"]) == \
            set(ranked[:q])


def test_late_data_audit(ray_session):
    import ray.data as rd
    import pandas as pd
    from ksoup_ray.functions.agg import late_data_audit
    base = pd.Timestamp("2024-01-01").value // 1000
    day = 86_400_000_000
    rows = [
        {"ts": pd.Timestamp(base * 1000)},                # day 0, late
        {"ts": pd.Timestamp((base + day) * 1000)},        # day 1, late
        {"ts": pd.Timestamp((base + 9 * day) * 1000)},    # day 9, ok
        {"ts": pd.Timestamp((base + 10 * day) * 1000)},   # max, ok
    ]
    # watermark cutoff = day10 - 7d = day3: days 0 and 1 are late
    out = late_data_audit(rd.from_items(rows)).to_pandas() \
        .set_index("window_start")
    w0 = (base // day) * day
    assert out.loc[w0, "n_events"] == 1 and out.loc[w0, "n_late"] == 1
    assert out.loc[w0 + 9 * day, "n_late"] == 0
    assert out["n_events"].sum() == 4 and out["n_late"].sum() == 2


def test_langid_margin(ray_session):
    import pyarrow as _pa
    from ksoup_ray.functions.textstats import LangIdMargin
    batch = _pa.table({
        "doc_id": _pa.array([0, 1, 2, 3], _pa.int64()),
        "text": _pa.array([
            "the cat and the dog is in that house",  # strongly en
            "la de que el un",                       # es/fr mix
            "xyzzy plugh nothing",                   # no markers
            "你好 world the the",            # CJK override
        ]),
    })
    out = LangIdMargin()(batch).to_pydict()
    assert out["pred_lang"][0] == "en"
    assert out["margin"][0] == out["best_score"][0]  # only en hits? no:
    # 'in'/'is'/'that' are en; 'the' en; no other lang markers here
    assert out["pred_lang"][2] == "und"
    assert out["best_score"][2] == 0 and out["margin"][2] == 0
    assert out["pred_lang"][3] == "zh"               # CJK override
    assert out["best_score"][3] == 2                 # 'the' x2 markers
    # mixed-lang doc has a small margin
    assert out["margin"][1] < out["best_score"][1] or \
        out["margin"][1] == 0
