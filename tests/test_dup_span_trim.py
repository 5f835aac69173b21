"""ExactSubstr-style repeated-span trimming
(functions/dedup.dup_span_trim): brute-force parity, self-repeats,
window edge cases, and determinism across partition counts."""

from collections import Counter

import numpy as np
import pyarrow as pa
import pytest


def _brute(docs: dict[int, str], window: int):
    spans = Counter()
    for txt in docs.values():
        ws = txt.split(" ")
        for i in range(len(ws) - window + 1):
            spans[" ".join(ws[i:i + window])] += 1
    out = {}
    for d, txt in docs.items():
        ws = txt.split(" ")
        cov = [False] * len(ws)
        for i in range(len(ws) - window + 1):
            if spans[" ".join(ws[i:i + window])] >= 2:
                for j in range(i, i + window):
                    cov[j] = True
        out[d] = (" ".join(w for w, c in zip(ws, cov) if not c),
                  len(ws), sum(cov))
    return out


def _run(docs: dict[int, str], window: int, num_partitions: int = 4):
    import ray.data as rd
    from ksoup_ray.functions.dedup import dup_span_trim
    t = pa.table({"doc_id": pa.array(list(docs), pa.int64()),
                  "text": pa.array(list(docs.values()), pa.string())})
    df = dup_span_trim(rd.from_arrow(t), window=window,
                       num_partitions=num_partitions).to_pandas()
    return {int(r.doc_id): (r.trimmed_text, int(r.n_words),
                            int(r.n_dropped))
            for r in df.itertuples()}


def test_cross_doc_self_and_edge_cases(ray_session):
    docs = {
        0: "a b c d e f g",           # shares 'a b c' with doc 1
        1: "x a b c y z w",
        2: "p q r p q r p q",         # overlapping self-repeat
        3: "short one",               # shorter than window
        4: "",                        # empty text
        5: "u n i q u e t o k s",     # all unique
        6: "a b c d e f g",           # exact dup of doc 0: fully covered
    }
    got = _run(docs, window=3)
    want = _brute(docs, window=3)
    assert got == want
    # exact-dup pair is fully trimmed on BOTH sides (symmetric rule)
    assert got[0][0] == "" and got[6][0] == ""
    assert got[2][0] == ""            # overlapping covers drop all
    assert got[3] == ("short one", 2, 0)
    assert got[4] == ("", 1, 0)       # '' splits to one empty word


def test_randomized_brute_force_parity(ray_session):
    rng = np.random.RandomState(11)
    vocab = [f"w{i}" for i in range(12)]   # small vocab forces repeats
    docs = {i: " ".join(rng.choice(vocab, size=rng.randint(1, 40)))
            for i in range(60)}
    for window in (2, 5):
        assert _run(docs, window=window) == _brute(docs, window)


def test_partition_count_invariance(ray_session):
    rng = np.random.RandomState(3)
    vocab = [f"t{i}" for i in range(9)]
    docs = {i: " ".join(rng.choice(vocab, size=rng.randint(4, 25)))
            for i in range(30)}
    a = _run(docs, window=4, num_partitions=2)
    b = _run(docs, window=4, num_partitions=16)
    assert a == b == _brute(docs, 4)
