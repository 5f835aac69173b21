"""Inverted-index construction (functions/index.py): capped posting
lists with true df, one bounded-bucket shuffle."""

import numpy as np
import pyarrow as pa


def test_inverted_index_basic(ray_session):
    import ray.data as rd
    from ksoup_ray.functions.index import inverted_index
    docs = [
        {"doc_id": 1, "text": "apple banana apple"},
        {"doc_id": 2, "text": "banana cherry"},
        {"doc_id": 3, "text": "apple"},
        {"doc_id": 4, "text": ""},                       # no tokens
    ]
    out = inverted_index(rd.from_items(docs), k=8).to_pandas() \
        .set_index("term").sort_index()
    assert out.loc["apple", "df"] == 2
    assert out.loc["apple", "postings"] == "1,3"
    assert out.loc["banana", "postings"] == "1,2"
    assert out.loc["cherry", "df"] == 1
    assert len(out) == 3


def test_inverted_index_cap_and_cross_batch_dedup(ray_session):
    import ray.data as rd
    from ksoup_ray.functions.index import inverted_index
    # 'hot' appears in 20 docs spread over many input blocks (so its
    # pairs arrive from several stage-1 batches); repeat it within each
    # doc so per-batch dedup matters too
    docs = [{"doc_id": i, "text": "hot hot " + (f"rare{i}" if i % 2
                                                else "")}
            for i in range(20)]
    out = inverted_index(rd.from_items(docs).repartition(7), k=5) \
        .to_pandas().set_index("term")
    assert out.loc["hot", "df"] == 20                 # true df, uncapped
    assert out.loc["hot", "postings"] == "0,1,2,3,4"  # k smallest only
    assert out.loc["rare3", "postings"] == "3"
    # every rare term has df 1
    rare = out[out.index.str.startswith("rare")]
    assert (rare["df"] == 1).all() and len(rare) == 10


def test_inverted_index_empty_corpus(ray_session):
    import ray.data as rd
    from ksoup_ray.functions.index import inverted_index
    ds = rd.from_arrow(pa.table({"doc_id": pa.array([], pa.int64()),
                                 "text": pa.array([], pa.string())}))
    assert inverted_index(ds).count() == 0
