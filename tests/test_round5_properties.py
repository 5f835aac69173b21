"""Property tests pinning the round-5 vectorized kernels against
straightforward per-row Python reimplementations."""

import numpy as np
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st


def _luhn_ok(digits: str) -> bool:
    total = 0
    for i, ch in enumerate(digits):        # 1-indexed odd positions
        d = ord(ch) - 48                   # double (len-16 rule)
        if i % 2 == 0:
            d *= 2
            if d > 9:
                d -= 9
        total += d
    return total % 10 == 0


@settings(max_examples=60, deadline=None)
@given(st.lists(st.text(alphabet="ab 0123456789", max_size=40),
                min_size=1, max_size=8))
def test_luhn_pan_matches_bruteforce(texts):
    import re
    from ksoup_ray.functions.curation import luhn_pan_batch
    batch = pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string()),
    })
    out = luhn_pan_batch(batch).to_pydict()
    for i, t in enumerate(texts):
        runs = re.findall(r"\d+", t)
        pans = [r for r in runs if len(r) == 16]
        assert out["n_digit_runs"][i] == len(runs)
        assert out["n_pan16"][i] == len(pans)
        assert out["n_luhn_valid"][i] == sum(_luhn_ok(p) for p in pans)


@settings(max_examples=60, deadline=None)
@given(st.lists(st.text(alphabet="aZ9 !é.", max_size=50),
                min_size=1, max_size=8))
def test_charclass_profile_matches_bruteforce(texts):
    from ksoup_ray.functions.textstats import charclass_profile_batch
    batch = pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string()),
    })
    out = charclass_profile_batch(batch).to_pydict()
    for i, t in enumerate(texts):
        n = len(t)
        alpha = sum(c.isascii() and c.isalpha() for c in t)
        digit = sum(c.isdigit() and c.isascii() for c in t)
        space = t.count(" ")
        other = n - alpha - digit - space
        assert out["n_chars"][i] == n
        if n:
            assert out["alpha_pm"][i] == alpha * 1000 // n
            assert out["digit_pm"][i] == digit * 1000 // n
            assert out["space_pm"][i] == space * 1000 // n
            assert out["other_pm"][i] == other * 1000 // n
        else:
            assert out["alpha_pm"][i] == 0


def test_novelty_frac_matches_bruteforce(ray_session):
    import ray.data as rd
    from ksoup_ray.functions.curation import novelty_frac

    rng = np.random.default_rng(3)
    vocab = [f"w{i}" for i in range(12)]
    rows = [{"doc_id": i,
             "text": " ".join(rng.choice(vocab,
                                         size=rng.integers(1, 15)))}
            for i in range(40)]

    def grams(text, n=3):
        w = text.split(" ")
        return {" ".join(w[j:j + n]) for j in range(len(w) - n + 1)}

    mins: dict = {}
    per_doc = {}
    for r in rows:
        gs = grams(r["text"])
        per_doc[r["doc_id"]] = gs
        for g in gs:
            mins[g] = min(mins.get(g, r["doc_id"]), r["doc_id"])

    out = novelty_frac(rd.from_items(rows), n=3).to_pandas() \
        .set_index("doc_id")
    for doc_id, gs in per_doc.items():
        if not gs:
            assert doc_id not in out.index
            continue
        first = sum(mins[g] == doc_id for g in gs)
        assert out.loc[doc_id, "n_ngrams"] == len(gs)
        assert out.loc[doc_id, "n_first"] == first
        assert out.loc[doc_id, "novelty_ppm"] == \
            first * 1_000_000 // len(gs)


# -- fast-tag tokenizer path: differential vs the generic state machine

_TAG_CASES = [
    '<div class="c">x</div>',
    '<a href="/p/1" rel="nofollow">link</a>',
    '<p id="">empty value</p>',
    '<img src="a.png" alt="a b c"/>',
    '<div CLASS="UP">case</div>',
    '<div data-x="1" data-x="2">dup attr first wins</div>',
    '<div class="a&amp;b">entity in value falls back</div>',
    "<div class='single'>single quotes fall back</div>",
    '<div class=unquoted>unquoted falls back</div>',
    '<div  class="two spaces">ws variants</div>',
    '<div class="c" >trailing space</div>',
    '<span a="1" b="2" c="3">many</span>',
    '</div class="x">attrs on end tag error</div>',
    '<div class="v<w">lt in value falls back</div>',
]


def _parse_both_tags(html):
    import ksoup_ray.engine.tokenizer as tk
    from ksoup_ray.engine import parser as KP
    orig = tk._FAST_TAG
    try:
        tk._FAST_TAG = __import__("re").compile(r"(?!x)x(n)(e)(v)(r)")
        ref = KP.parse(html)
    finally:
        tk._FAST_TAG = orig
    fast = KP.parse(html)
    return ref, fast


def _tag_attr_ranges(doc):
    out = []
    for el in doc.select("*"):
        attrs = el.attributes()
        if attrs is None:
            continue
        for k, _ in attrs:
            out.append((el.tag_name(), k, attrs.get_ignore_case(k),
                        attrs.source_range(k)))
    return out


def test_fast_tag_differential():
    for html in _TAG_CASES:
        ref, fast = _parse_both_tags(html)
        assert fast.outer_html() == ref.outer_html(), html
        assert _tag_attr_ranges(fast) == _tag_attr_ranges(ref), html
        assert fast.parse_errors == ref.parse_errors, html
