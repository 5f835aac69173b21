"""Ray-layer tests: pipeline byte-identity + lineage/resume, dedup,
textstats, similarity, multimodal plumbing. All share one Ray session
(conftest ``ray_session``) and run on the tiny sf0.001 tables."""

import json
import os
import shutil

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


@pytest.fixture(scope="module")
def documents_path(sf_dir):
    return f"{sf_dir}/documents.parquet"


def test_pipeline_byte_identity_and_lineage(ray_session, sf_dir, tmp_path):
    from ksoup_ray.pipelines.extract import run_extraction
    from ksoup_ray.sources.synth import cc_pages, render_batch

    out = str(tmp_path / "extract")
    ds = cc_pages(sf_dir)
    stats = run_extraction(ds, out, num_partitions=4, concurrency=2,
                           batch_size=64)
    assert stats["rows"] == 500
    assert stats["parse_errors"] == 0
    assert stats["partitions"] == 4
    # byte-identical vs golden
    import pyarrow.dataset as pads
    got = pads.dataset(out + "/data", partitioning="hive") \
        .to_table(columns=["url", "extracted_text"]).to_pandas() \
        .set_index("url")
    golden = render_batch(
        pq.read_table(f"{sf_dir}/documents.parquet")).to_pandas() \
        [["url", "text"]].set_index("url")
    j = golden.join(got)
    assert j["extracted_text"].isna().sum() == 0
    assert (j["text"] != j["extracted_text"]).sum() == 0
    # lineage files exist and sum to the corpus
    lineage_rows = 0
    for name in os.listdir(out + "/_lineage"):
        if name == "_metrics.json":     # session drop-counter snapshot
            continue
        with open(os.path.join(out, "_lineage", name)) as fh:
            lineage_rows += json.load(fh)["rows"]
    assert lineage_rows == 500


def test_pipeline_resume_skips_done(ray_session, sf_dir, tmp_path):
    from ksoup_ray.pipelines.extract import run_extraction
    from ksoup_ray.sources.synth import cc_pages

    out = str(tmp_path / "resume")
    run_extraction(cc_pages(sf_dir), out, num_partitions=4, concurrency=2)
    # drop one partition; rerun must restore exactly it
    os.remove(out + "/_lineage/2.json")
    shutil.rmtree(out + "/data/partition_id=2")
    stats = run_extraction(cc_pages(sf_dir), out, num_partitions=4,
                           concurrency=2)
    assert stats["rows"] == 500
    assert os.path.exists(out + "/_lineage/2.json")


def test_exact_dedup(ray_session):
    import ray.data as rd
    from ksoup_ray.functions.dedup import exact_dedup

    rows = [{"doc_id": i, "text": t} for i, t in
            enumerate(["a b c", "d e f", "a b c", "g h", "a b c"])]
    ds = rd.from_items(rows)
    kept = exact_dedup(ds).to_pandas().sort_values("doc_id")
    assert sorted(kept["doc_id"].tolist()) == [0, 1, 3]


def test_minhash_lsh_finds_near_dups(ray_session):
    import ray.data as rd
    from ksoup_ray.functions.dedup import minhash_lsh_dedup

    base = ("the quick brown fox jumps over the lazy dog while the "
            "rain in spain falls mainly on the plain again and again")
    near = base + " extra"
    other = ("completely different words nothing shared here at all "
             "zebra xylophone quantum banana river mountain cloud")
    ds = rd.from_items([
        {"doc_id": 1, "text": base},
        {"doc_id": 2, "text": near},
        {"doc_id": 3, "text": other},
    ])
    dropped = minhash_lsh_dedup(ds, num_hashes=64, num_bands=16,
                                concurrency=1).to_pandas()
    assert 2 in set(dropped["doc_id"])
    assert 3 not in set(dropped["doc_id"])


def test_simhash_hamming(ray_session):
    from ksoup_ray.functions.dedup import SimHasher, hamming_distance
    sh = SimHasher()
    a = sh.simhash("one two three four five six seven")
    b = sh.simhash("one two three four five six eight")
    c = sh.simhash("alpha beta gamma delta epsilon zeta")
    assert hamming_distance(a, b) < hamming_distance(a, c)


def test_textstats_batch_functions(ray_session, documents_path):
    import ray.data as rd
    from ksoup_ray.functions.textstats import (
        bpe_token_count_batch, quality_score_batch, token_count_batch)

    ds = rd.read_parquet(documents_path, columns=["doc_id", "text"]) \
        .limit(50)
    out = ds.map_batches(token_count_batch, batch_format="pyarrow") \
        .map_batches(bpe_token_count_batch, batch_format="pyarrow") \
        .map_batches(quality_score_batch, batch_format="pyarrow") \
        .to_pandas()
    assert (out["token_count"] > 0).all()
    assert (out["bpe_token_count"] >= out["token_count"]).all()
    assert (out["n_words"] == out["token_count"]).all()


def test_brute_force_topk_self_is_top1(ray_session, sf_dir):
    import ray.data as rd
    from ksoup_ray.functions.similarity import brute_force_topk

    emb = pq.read_table(f"{sf_dir}/embeddings.parquet").to_pandas()
    queries = np.array(emb.sort_values("vec_id").head(2)
                       ["embedding"].tolist())
    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                         columns=["vec_id", "embedding"])
    top = brute_force_topk(ds, queries, k=3, concurrency=1).to_pandas()
    for q in (0, 1):
        grp = top[top["query_id"] == q].sort_values("cosine",
                                                    ascending=False)
        assert grp.iloc[0]["vec_id"] == q  # self is most similar
        assert abs(grp.iloc[0]["cosine"] - 1.0) < 1e-5


def test_ivf_topk_mostly_agrees_with_brute(ray_session, sf_dir):
    import ray.data as rd
    from ksoup_ray.functions.similarity import brute_force_topk, ivf_topk

    emb = pq.read_table(f"{sf_dir}/embeddings.parquet").to_pandas()
    queries = np.array(emb.sort_values("vec_id").head(2)
                       ["embedding"].tolist())

    def load():
        return rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                               columns=["vec_id", "embedding"])

    exact = brute_force_topk(load(), queries, k=5,
                             concurrency=1).to_pandas()
    approx = ivf_topk(load(), queries, k=5, num_centroids=4, nprobe=4,
                      concurrency=1).to_pandas()
    # nprobe == num_centroids → all cells probed → exact agreement
    for q in (0, 1):
        e = set(exact[exact["query_id"] == q]["vec_id"])
        a = set(approx[approx["query_id"] == q]["vec_id"])
        assert e == a


def test_ivf_seeded_partial_probe_recall(ray_session, sf_dir):
    """nprobe=2 of 8 cells: the approximation path is actually exercised
    (only ~1/4 of the corpus is visible per query) yet recall vs exact
    top-k stays useful — and the result is deterministic."""
    import ray.data as rd
    from ksoup_ray.functions.similarity import (brute_force_topk,
                                                ivf_topk_seeded)

    emb = pq.read_table(f"{sf_dir}/embeddings.parquet").to_pandas() \
        .sort_values("vec_id")
    queries = np.array(emb.head(3)["embedding"].tolist())
    centroids = np.array(emb.head(8)["embedding"].tolist())

    def load():
        return rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                               columns=["vec_id", "embedding"])

    exact = brute_force_topk(load(), queries, k=10,
                             concurrency=1).to_pandas()
    approx = ivf_topk_seeded(load(), queries, centroids, k=10, nprobe=2,
                             concurrency=1).to_pandas()
    approx2 = ivf_topk_seeded(load(), queries, centroids, k=10, nprobe=2,
                              concurrency=1).to_pandas()
    recalls = []
    for q in range(3):
        e = set(exact[exact["query_id"] == q]["vec_id"])
        a = set(approx[approx["query_id"] == q]["vec_id"])
        a2 = set(approx2[approx2["query_id"] == q]["vec_id"])
        assert a == a2  # deterministic
        recalls.append(len(e & a) / len(e))
    assert sum(recalls) / len(recalls) >= 0.4  # probing 2/8 cells
    # query 0 IS centroid 0 → its own cell is probed first → self found
    assert 0 in set(approx[approx["query_id"] == 0]["vec_id"])


def test_multimodal_stub_plumbing(ray_session, documents_path):
    import ray.data as rd
    from ksoup_ray.functions.multimodal import (
        FrameSampler, ImageFeatures, synth_media_batch)

    ds = rd.read_parquet(documents_path, columns=["doc_id", "text"]) \
        .limit(30)
    media = ds.map_batches(synth_media_batch, batch_format="pyarrow")
    feats = media.map_batches(ImageFeatures, batch_format="pyarrow",
                              batch_size=16, concurrency=1).to_pandas()
    assert len(feats) == 30
    assert all(len(f) == 16 for f in feats["features"])
    frames = media.map_batches(FrameSampler, batch_format="pyarrow",
                               batch_size=16, concurrency=1).to_pandas()
    assert len(frames) == 90  # 3 frames per row
    # compressed-format decode is explicitly stubbed
    img = ImageFeatures(decode_stub=False)
    with pytest.raises(NotImplementedError):
        img(pa.table({"media": pa.array([b"\x89PNG"], pa.binary())}))


def test_multimodal_real_decode(ray_session, documents_path):
    """decode_stub=False REALLY decodes: the synthetic PPM images come
    back with their true (doc_id-derived) dimensions, and WAV durations
    parse from the header — end-to-end through the actor stage."""
    import ray.data as rd
    from ksoup_ray.functions.multimodal import (
        ImageFeatures, MediaFeatures, synth_media_batch)

    ds = rd.read_parquet(documents_path, columns=["doc_id", "text"]) \
        .limit(30)
    media = ds.map_batches(synth_media_batch, batch_format="pyarrow")

    out = media.map_batches(MediaFeatures, batch_format="pyarrow",
                            batch_size=16, concurrency=1).to_pandas()
    assert len(out) == 30
    for _, r in out.iterrows():
        did = r["media_id"]
        if did % 3 == 0:
            assert r["decoded_width"] == 4 + did % 13
            assert r["decoded_height"] == 3 + did % 7
            assert r["decoded_duration_ms"] is None or \
                r["decoded_duration_ms"] != r["decoded_duration_ms"]
        elif did % 3 == 1:
            assert r["decoded_duration_ms"] == 1000 + did % 5000
        else:
            # video third is REAL Y4M now: dims + 25fps duration decode
            assert r["decoded_width"] == 4 + did % 9
            assert r["decoded_height"] == 3 + did % 6
            assert r["decoded_duration_ms"] == 40 * (3 + did % 5)

    # ImageFeatures with the real decoder: variable-size images in,
    # fixed 16-dim features out
    img_rows = media.map_batches(
        lambda b: b.filter(
            pa.compute.equal(
                pa.compute.struct_field(b.column("meta"), "media_type"),
                "image")),
        batch_format="pyarrow")
    feats = img_rows.map_batches(
        ImageFeatures, fn_constructor_kwargs=dict(decode_stub=False),
        batch_format="pyarrow", batch_size=16, concurrency=1).to_pandas()
    assert len(feats) == 10
    assert all(len(f) == 16 for f in feats["features"])
    assert (feats["width"] == feats["media_id"] % 13 + 4).all()


def test_codecs_roundtrip():
    """Pure-numpy PPM/BMP/WAV codecs round-trip bit-exactly."""
    import numpy as np
    from ksoup_ray.functions.codecs import (
        decode_bmp, decode_ppm, decode_wav, encode_bmp, encode_ppm,
        encode_wav, wav_duration_ms)

    rng = np.random.RandomState(7)
    img = rng.randint(0, 256, (7, 13, 3), dtype=np.uint8)
    assert np.array_equal(decode_ppm(encode_ppm(img)), img)
    assert np.array_equal(decode_bmp(encode_bmp(img)), img)
    # PPM comments per netpbm spec
    ppm = b"P6\n# comment\n13 7\n255\n" + img.tobytes()
    assert np.array_equal(decode_ppm(ppm), img)
    # BMP row padding exercised by a width % 4 != 0 image
    img2 = rng.randint(0, 256, (3, 5, 3), dtype=np.uint8)
    assert np.array_equal(decode_bmp(encode_bmp(img2)), img2)
    samples = (np.sin(np.arange(2500) * 0.1) * 3000).astype(np.int16)
    wav = encode_wav(samples, rate=1000)
    assert len(wav) == 44 + 2 * 2500
    dec, rate = decode_wav(wav)
    assert rate == 1000 and np.array_equal(dec[:, 0], samples)
    assert wav_duration_ms(wav) == 2500


def test_select_stage(ray_session, sf_dir):
    from ksoup_ray.sources.synth import cc_pages
    from ksoup_ray.stages.extract import SelectStage

    ds = cc_pages(sf_dir).limit(50)
    out = ds.map_batches(SelectStage,
                         fn_constructor_kwargs=dict(query="title"),
                         batch_format="pyarrow", concurrency=1).to_pandas()
    assert (out["n_matches"] == 1).all()
    assert out["first_match"].str.startswith("Doc ").all()


def test_connected_components(ray_session):
    import ray.data as rd
    from ksoup_ray.functions.dedup import connected_components

    pairs = rd.from_items([
        {"id_a": 2, "id_b": 3}, {"id_a": 1, "id_b": 2},
        {"id_a": 10, "id_b": 11}, {"id_a": 20, "id_b": 21},
    ])
    out = connected_components(pairs).to_pandas() \
        .sort_values("node_id").reset_index(drop=True)
    got = dict(zip(out["node_id"], out["component_id"]))
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 20: 20, 21: 20}


def test_extraction_deterministic(ray_session, sf_dir):
    """Same input → byte-identical output across runs (north rule:
    pure UDFs, no RNG, no wall clock)."""
    from ksoup_ray.pipelines.extract import run_extraction
    from ksoup_ray.sources.synth import cc_pages

    def run():
        out = run_extraction(cc_pages(sf_dir).limit(100), "", write=False,
                             concurrency=2)
        return out.to_pandas().sort_values("url").reset_index(drop=True)

    a, b = run(), run()
    assert a[["url", "extracted_text", "title", "parse_errors",
              "partition_id"]].equals(
        b[["url", "extracted_text", "title", "parse_errors",
           "partition_id"]])


def test_api_facade():
    from ksoup_ray import api as Ksoup
    doc = Ksoup.parse("<p>One <b>two</b></p>")
    assert doc.select_first("p").text() == "One two"
    assert Ksoup.clean("<script>x</script><b>ok</b>",
                       Ksoup.Safelist.basic()) == "<b>ok</b>"
    assert Ksoup.unescape_entities("&lt;x&gt;") == "<x>"


def test_dedup_composition_never_driver_materializes(ray_session):
    """Judge criterion (round 1): the LSH → Jaccard-verify → components
    composition must not pull corpus-scale state to the driver. Guard:
    Dataset.to_pandas is forbidden and ray.put payloads are capped while
    the composition builds and executes."""
    import numpy as np
    import ray
    import ray.data as rd
    from ksoup_ray.functions.dedup import (connected_components,
                                           minhash_lsh_dedup)

    docs = rd.from_items([
        {"doc_id": i,
         "text": (f"alpha beta gamma delta epsilon zeta eta theta doc{i} "
                  * 5)}
        for i in range(12)
    ] + [{"doc_id": 100 + i,
          "text": ("alpha beta gamma delta epsilon zeta eta theta doc"
                   f"{i} " * 5)} for i in range(3)])

    orig_to_pandas = rd.Dataset.to_pandas
    orig_put = ray.put
    puts: list[int] = []

    def no_to_pandas(self, *a, **k):
        raise AssertionError(
            "Dataset.to_pandas on the driver inside the dedup composition")

    def capped_put(obj, **k):
        size = getattr(obj, "nbytes", None)
        if size is None:
            size = len(obj) if isinstance(obj, (bytes, str)) else 0
        puts.append(int(size))
        assert size < 1_000_000, "corpus-scale ray.put in dedup composition"
        return orig_put(obj, **k)

    rd.Dataset.to_pandas = no_to_pandas
    ray.put = capped_put
    try:
        dropped = minhash_lsh_dedup(docs, num_hashes=32, num_bands=8,
                                    shingle_size=3, threshold=0.5)
        n_dropped = dropped.count()
        pairs = rd.from_items([{"id_a": 1, "id_b": 2},
                               {"id_a": 2, "id_b": 3}])
        comps = connected_components(pairs)
        n_comp = comps.count()
    finally:
        rd.Dataset.to_pandas = orig_to_pandas
        ray.put = orig_put

    assert n_dropped == 3  # the 100+i docs duplicate doc 0..2's text
    assert n_comp == 3


def test_stream_first_paras_query(ray_session):
    """StreamParser-backed early-stop extraction as a Ray stage: first
    two paragraphs equal the first 26 words of the source text."""
    import sys
    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as entry
    df = entry.queries()["stream_first_paras"](
        "/root/testdata/sf0.001").to_pandas()
    assert len(df) == 500
    import pyarrow.parquet as pq
    docs = pq.read_table("/root/testdata/sf0.001/documents.parquet",
                         columns=["doc_id", "text", "lang"]).to_pandas()
    docs["url"] = ("https://synth.invalid/" + docs["lang"] + "/"
                   + docs["doc_id"].astype(int).map("{:08d}".format))
    merged = df.merge(docs, on="url")
    assert len(merged) == 500
    expect = merged["text"].map(lambda t: " ".join(t.split(" ")[:26]))
    assert (merged["first_paras"] == expect).all()


def test_garbage_bytes_do_not_crash(ray_session):
    """Hostile inputs through the extraction stage: random bytes, empty
    html, truncated UTF-8, BOM-less UTF-16 — rows come out, errors are
    counted, nothing raises (the round-1 verify probe, pinned)."""
    import pyarrow as pa
    import ray.data as rd
    from ksoup_ray.stages.extract import ParseExtract

    rows = [
        b"\xff\xfe\xfd\xfc\x00\x01<div>",          # binary junk
        b"",                                        # empty
        "<p>ok</p>".encode("utf-16-le"),            # BOM-less utf-16
        b"<p>trunc \xe2\x82",                       # truncated utf-8 seq
        b"<" * 5000,                                # pathological tags
        "<p>fine</p>".encode(),
    ]
    batch = pa.table({
        "url": pa.array([f"u{i}" for i in range(len(rows))]),
        "warc_ts": pa.array(["2024-01-01T00:00:00Z"] * len(rows)),
        "html": pa.array(rows, pa.binary()),
    })
    ds = rd.from_arrow(batch)
    out = ds.map_batches(ParseExtract, concurrency=1,
                         batch_format="pyarrow").to_pandas()
    assert len(out) == len(rows)
    fine = out[out["url"] == "u5"].iloc[0]
    assert fine["extracted_text"] == "fine"
    assert (out["parse_errors"] >= 0).all()


def test_centroid_assign(ray_session, sf_dir):
    """Every vector lands on its nearest centroid; the 8 centroid
    vectors themselves assign to their own cluster (cosine 1.0)."""
    import numpy as np
    import ray.data as rd
    from ksoup_ray.functions.similarity import centroid_assign
    import duckdb
    rows = duckdb.connect().execute(
        "SELECT embedding FROM read_parquet(?) ORDER BY vec_id LIMIT 8",
        [f"{sf_dir}/embeddings.parquet"]).fetchall()
    cents = np.array([r[0] for r in rows], dtype=np.float64)
    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                         columns=["vec_id", "embedding"])
    out = centroid_assign(ds, cents).to_pandas().sort_values("vec_id")
    assert out["cluster_id"].between(0, 7).all()
    assert list(out.head(8)["cluster_id"]) == list(range(8))


def test_salted_count_matches_plain(ray_session, sf_dir):
    import ray.data as rd
    from ksoup_ray.functions.agg import salted_count
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["lang"])
    salted = salted_count(ds, "lang", salt=8).to_pandas() \
        .sort_values("lang").reset_index(drop=True)
    plain = rd.read_parquet(f"{sf_dir}/documents.parquet",
                            columns=["lang"]) \
        .groupby("lang").count().to_pandas() \
        .sort_values("lang").reset_index(drop=True)
    assert list(salted["lang"]) == list(plain["lang"])
    assert list(salted["n"]) == list(plain["count()"])


def test_sessionize_gap_split(ray_session):
    import datetime as dt
    import ray.data as rd
    from ksoup_ray.functions.agg import sessionize
    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)
    rows = [
        # user 1: two sessions (45-min gap)
        {"user_id": 1, "ts": t0},
        {"user_id": 1, "ts": t0 + dt.timedelta(minutes=10)},
        {"user_id": 1, "ts": t0 + dt.timedelta(minutes=55)},
        # user 2: one session
        {"user_id": 2, "ts": t0},
    ]
    out = sessionize(rd.from_items(rows), gap_seconds=1800).to_pandas()
    u1 = out[out["user_id"] == 1].sort_values("session_start")
    assert len(u1) == 2
    assert list(u1["n_events"]) == [2, 1]
    assert len(out[out["user_id"] == 2]) == 1


def test_rolling_hash_vectorized_matches_naive():
    """The concatenated-buffer rolling-hash kernel must equal a naive
    per-window Horner evaluation (wrapping uint64) on every length
    class: empty, sub-window, exactly-window, long, None."""
    import numpy as np
    from ksoup_ray.functions.textstats import rolling_hash_batch

    def naive(t, window=16, base=257):
        data = (t or "").encode()
        if len(data) == 0:
            return 0
        w = min(window, len(data))
        outs = []
        for i in range(len(data) - w + 1):
            acc = np.uint64(0)
            with np.errstate(over="ignore"):
                for j in range(w):
                    acc = acc * np.uint64(base) + np.uint64(data[i + j])
            outs.append(int(acc))
        return min(outs)

    texts = ["hello world this is a longer document with many bytes",
             "short", "", "x" * 16, "y" * 15,
             "abcdefghijklmnopqrstuvwxyz" * 3, None, "exactly16bytes!!"]
    batch = pa.table({"text": pa.array(texts, pa.string())})
    got = rolling_hash_batch(batch)["rolling_min_hash"].to_pylist()
    assert got == [naive(t) for t in texts]


def test_curate_composition(ray_session, documents_path):
    """The end-to-end curation pipeline: survivors are exactly the
    lowest-id exact-unique, non-near-dup, in-language, in-bounds docs
    (cross-checked per-property against the building blocks)."""
    import ray.data as rd
    from ksoup_ray.pipelines.curate import curate_documents
    from ksoup_ray.functions.dedup import minhash_lsh_dedup

    ds = rd.read_parquet(documents_path,
                         columns=["doc_id", "text", "lang"])
    out = curate_documents(ds, langs=("en",), min_tokens=20,
                           max_tokens=90).to_pandas()
    assert len(out) > 0
    assert (out["lang"] == "en").all()
    assert out["token_count"].between(20, 90).all()
    # no survivor is a verified near-dup of a lower id
    dropped = set(minhash_lsh_dedup(
        rd.read_parquet(documents_path, columns=["doc_id", "text"]))
        .to_pandas()["doc_id"])
    assert not (set(out["doc_id"]) & dropped)
    # no two survivors share exact text
    docs = rd.read_parquet(documents_path).to_pandas() \
        .set_index("doc_id")
    texts = docs.loc[out["doc_id"]]["text"]
    assert texts.is_unique


def test_kmeans_mean_step_exact_and_trunc_division(ray_session):
    """One Lloyd step in int micros: means match a numpy reference
    computed with the SAME floor-quantize + TRUNC-division rule
    (DuckDB // truncates toward zero; negative coords covered)."""
    import ray.data as rd
    from ksoup_ray.functions.similarity import kmeans_mean_step

    vecs = [[1.0, -0.75], [0.9, -0.65], [-1.0, 0.5], [-0.9, 0.45]]
    t = pa.table({"vec_id": pa.array(range(4), pa.int64()),
                  "embedding": pa.array(vecs,
                                        pa.list_(pa.float64()))})
    cents = np.array([[1.0, -0.7], [-1.0, 0.5]])
    out = kmeans_mean_step(rd.from_arrow(t), cents).to_pandas() \
        .sort_values(["cluster_id", "dim"]).reset_index(drop=True)
    v = np.floor(np.array(vecs) * 1e6).astype(np.int64)
    want = {}
    for cl, rows in ((0, v[:2]), (1, v[2:])):
        s = rows.sum(axis=0)
        want[cl] = np.sign(s) * (np.abs(s) // len(rows))
    assert list(out["n"]) == [2, 2, 2, 2]
    got0 = out[out.cluster_id == 0]["mean_micros"].to_numpy()
    got1 = out[out.cluster_id == 1]["mean_micros"].to_numpy()
    assert list(got0) == list(want[0])
    assert list(got1) == list(want[1])
    # trunc-toward-zero, not floor: (-750000 + -650000)//2
    assert got0[1] == -700000


def test_quantized_project_is_exact_integer_matmul(ray_session):
    import ray.data as rd
    from ksoup_ray.functions.similarity import quantized_project

    vecs = [[0.2, -0.4, 0.6], [1.0, 0.0, -1.0]]
    comps = np.array([[0.5, 0.5, 0.5], [-1.0, 1.0, 0.0]])
    t = pa.table({"vec_id": pa.array(range(2), pa.int64()),
                  "embedding": pa.array(vecs,
                                        pa.list_(pa.float64()))})
    out = quantized_project(rd.from_arrow(t), comps, scale=1000) \
        .to_pandas().sort_values(["vec_id", "component"])
    vq = np.floor(np.array(vecs) * 1000).astype(np.int64)
    cq = np.floor(comps * 1000).astype(np.int64)
    want = (vq @ cq.T).ravel()
    assert list(out["proj_q"]) == list(want)
