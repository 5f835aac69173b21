"""URL canonicalization (functions/urls.py) and sliding-window
chunking (functions/packing.py chunk_windows)."""

import pandas as pd
import pyarrow as pa

from ksoup_ray.functions.urls import canonicalize_series


def test_canonicalize_rules():
    cases = {
        "https://synth.invalid/en/00000001":
            "https://synth.invalid/en/00000001",
        "HTTPS://SYNTH.INVALID/en/MixedPath#frag":
            "https://synth.invalid/en/MixedPath",   # path case preserved
        "https://a.b/p?utm_source=x&utm_campaign=y": "https://a.b/p",
        "https://a.b:443/p?id=7&utm_medium=z": "https://a.b/p?id=7",
        "http://A.B:80/Q?ref=r&id=2&gclid=g": "http://a.b/Q?id=2",
        "https://a.b/p?utm_a=1&utm_b=2&id=3#z": "https://a.b/p?id=3",
        "https://a.b/p?id=1&id=2": "https://a.b/p?id=1&id=2",  # order kept
        "https://a.b:8443/p": "https://a.b:8443/p",  # non-default port
        "http://a.b:443/p": "http://a.b:443/p",      # wrong-scheme port
        "no-scheme/path?utm_source=x": "no-scheme/path?utm_source=x",
        "": "",
        "ftp://Host.X/file": "ftp://host.x/file",
        "https://a.b/p?refresh=1": "https://a.b/p?refresh=1",  # not 'ref'
    }
    got = canonicalize_series(pd.Series(list(cases))).tolist()
    assert got == list(cases.values())


def test_canonicalize_urls_stage(ray_session):
    import ray.data as rd
    from ksoup_ray.functions.urls import canonicalize_urls
    ds = rd.from_items([{"url": "HTTP://X.Y:80/a?utm_q=1#f"},
                        {"url": None}])
    out = canonicalize_urls(ds).to_pandas()
    assert sorted(out["url_canon"]) == ["", "http://x.y/a"]


def test_chunk_windows_shapes(ray_session):
    import ray.data as rd
    from ksoup_ray.functions.packing import chunk_windows
    docs = [{"doc_id": 1, "text": "a b c d e f g h i j"},
            {"doc_id": 2, "text": "x"},
            {"doc_id": 3, "text": ""}]
    out = chunk_windows(rd.from_items(docs), size=4, stride=3) \
        .to_pandas().sort_values(["doc_id", "chunk_id"])
    d1 = out[out.doc_id == 1]
    assert list(d1["chunk_text"]) == ["a b c d", "d e f g", "g h i j", "j"]
    assert list(d1["n_tokens"]) == [4, 4, 4, 1]
    # one-token and empty docs both emit exactly one window
    assert list(out[out.doc_id == 2]["chunk_text"]) == ["x"]
    assert list(out[out.doc_id == 3]["chunk_text"]) == [""]


def test_chunk_windows_exact_tiling_no_short_tail(ray_session):
    import ray.data as rd
    from ksoup_ray.functions.packing import chunk_windows
    # n divisible: last window ends exactly at n, no extra empty window
    docs = [{"doc_id": 1, "text": "a b c d e f g h"}]
    out = chunk_windows(rd.from_items(docs), size=4, stride=4).to_pandas()
    assert list(out["chunk_text"]) == ["a b c d", "e f g h"]


def test_chunk_windows_rejects_bad_params(ray_session):
    import pytest
    import ray.data as rd
    from ksoup_ray.functions.packing import chunk_windows
    with pytest.raises(ValueError):
        chunk_windows(rd.from_items([{"doc_id": 1, "text": "a"}]),
                      size=4, stride=0)
