"""Text analysis operators: token counting, quality scoring, language
ID, document fingerprinting. All vectorized (pandas str / numpy) inside
``map_batches`` — no per-row Python in the hot path except where a
C-backed kernel doesn't exist.

Each operator is exposed two ways:
* a batch function for ``ds.map_batches`` (the scale path);
* the SQL used by the DuckDB oracle documents the exact semantics.
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

# BPE-ish word splitter: runs of letters, digits, or single non-space
# punctuation — a deterministic stand-in for a real tokenizer's pre-split.
BPE_SPLIT_RE = re.compile(r"[A-Za-z]+|[0-9]+|[^\sA-Za-z0-9]")

# tiny per-language stopword marker sets (public, standard lists)
_LANG_MARKERS = {
    "en": {"the", "and", "of", "to", "a", "in", "is", "it", "that"},
    "de": {"der", "die", "das", "und", "ist", "nicht", "ein", "zu"},
    "fr": {"le", "la", "les", "et", "est", "un", "une", "que"},
    "es": {"el", "la", "los", "y", "es", "un", "una", "que", "de"},
    "zh": set(),  # no-space langs fall through to the CJK-ratio check
}

_CJK_RE = re.compile(r"[一-鿿぀-ヿ가-힯]")
_PUNCT_RE = re.compile(r"[^\w\s]")


def charclass_profile_batch(batch: pa.Table, text_col: str = "text",
                            id_col: str = "doc_id") -> pa.Table:
    """Character-class profile per document — the cheap garbage /
    mojibake / machine-text detector: permille fractions of
    ``[A-Za-z]``, ``[0-9]``, space, and everything else. A page that
    is 40% digits is a table dump; one that is 30% "other" is likely
    mojibake or markup leakage — the C4/Gopher-family prefilters gate
    on exactly these ratios before any model-based scoring.

    All counting is one C-backed ``pandas.str.count`` regex per class
    over the whole column (no per-row Python); fractions are exact
    integer permille (``count · 1000 // n_chars``, 0 for empty docs)
    so the DuckDB oracle (length-difference regexp_replace counts)
    matches bit-for-bit. Pure per-batch stage, no shuffle."""
    s = batch.column(text_col).to_pandas().fillna("")
    n = s.str.len().to_numpy(dtype=np.int64)
    alpha = s.str.count(r"[A-Za-z]").to_numpy(dtype=np.int64)
    digit = s.str.count(r"[0-9]").to_numpy(dtype=np.int64)
    space = s.str.count(r" ").to_numpy(dtype=np.int64)
    other = n - alpha - digit - space
    safe = np.maximum(n, 1)

    def pm(c):
        return pa.array(np.where(n > 0, c * 1000 // safe, 0),
                        pa.int64())

    return pa.table({
        id_col: batch.column(id_col),
        "n_chars": pa.array(n, pa.int64()),
        "alpha_pm": pm(alpha),
        "digit_pm": pm(digit),
        "space_pm": pm(space),
        "other_pm": pm(other),
    })


def token_count_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Whitespace token count — pure Arrow kernels (zero Python loop).

    Oracle SQL: length(string_split(text, ' ')) adjusted for empties.
    """
    text = batch.column(text_col)
    # count spaces + 1 on non-empty; 0 on empty/null
    spaces = pc.count_substring(text, " ")
    nonempty = pc.not_equal(pc.binary_length(text), 0)
    counts = pc.if_else(nonempty, pc.add(spaces, 1), pa.scalar(0, pa.int32()))
    return batch.append_column("token_count", pc.cast(counts, pa.int64()))


def bpe_token_count_batch(batch: pa.Table,
                          text_col: str = "text") -> pa.Table:
    """Regex BPE-ish pre-tokenizer count (vectorized via pandas str)."""
    s = batch.column(text_col).to_pandas()
    counts = s.fillna("").str.count(BPE_SPLIT_RE)
    return batch.append_column("bpe_token_count",
                               pa.array(counts.astype("int64")))


def quality_score_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Heuristic quality signals: char length, word count, mean word
    length, punct ratio, stopword ratio — the usual pre-training filters.
    """
    s = batch.column(text_col).to_pandas().fillna("")
    n_chars = s.str.len().astype("int64")
    n_words = s.str.count(" ").astype("int64") + (n_chars > 0).astype("int64")
    n_punct = s.str.count(_PUNCT_RE).astype("int64")
    mean_word_len = np.where(n_words > 0, (n_chars - (n_words - 1).clip(lower=0)) / n_words.clip(lower=1), 0.0)
    punct_ratio = np.where(n_chars > 0, n_punct / n_chars.clip(lower=1), 0.0)
    stop = _LANG_MARKERS["en"]
    stop_counts = s.str.lower().str.split(" ").map(
        lambda ws: sum(1 for w in ws if w in stop) if isinstance(ws, list) else 0)
    stop_ratio = np.where(n_words > 0, stop_counts / n_words.clip(lower=1), 0.0)
    out = batch
    out = out.append_column("n_chars_q", pa.array(n_chars))
    out = out.append_column("n_words", pa.array(n_words))
    out = out.append_column("mean_word_len", pa.array(mean_word_len, pa.float64()))
    out = out.append_column("punct_ratio", pa.array(punct_ratio, pa.float64()))
    out = out.append_column("stopword_ratio", pa.array(stop_ratio, pa.float64()))
    return out


class LangId:
    """Marker-word language heuristic (actor-pool stage: marker tables
    built once per actor). Semantics (mirrored exactly by the DuckDB
    oracle): CJK characters → ``zh``; else the FIRST language in probe
    order whose marker-word count is strictly maximal and ≥ 1; ties go
    to the earlier language; no markers → ``und``.

    Vectorized: one explode + per-language ``isin`` membership over the
    whole batch — no per-row Python loop."""

    def __init__(self, langs=("en", "de", "fr", "es")):
        self.langs = tuple(langs)
        self.markers = {lg: _LANG_MARKERS[lg] for lg in langs}

    def __call__(self, batch: pa.Table) -> pa.Table:
        s = batch.column("text").to_pandas().fillna("").str.lower()
        n = len(s)
        exploded = s.str.split().explode()
        scores = np.zeros((n, len(self.langs)), dtype=np.int64)
        if len(exploded):
            for j, lg in enumerate(self.langs):
                hits = exploded.isin(self.markers[lg]) \
                    .groupby(level=0).sum()
                scores[hits.index.to_numpy(), j] = hits.to_numpy()
        best_j = scores.argmax(axis=1)          # first max wins (tie rule)
        best_score = scores[np.arange(n), best_j]
        langs_arr = np.array(self.langs, dtype=object)
        out = np.where(best_score >= 1, langs_arr[best_j], "und")
        is_cjk = s.str.contains(_CJK_RE).to_numpy()
        out = np.where(is_cjk, "zh", out)
        return batch.append_column("pred_lang",
                                   pa.array(out.tolist(), pa.string()))


class LangIdMargin(LangId):
    """Language-ID with a CONFIDENCE MARGIN — the standard filter
    companion to :class:`LangId`: a doc whose best-language marker
    count barely beats the runner-up is mixed-language or too short
    to trust, and curation pipelines gate on exactly this margin
    (fastText-lid users threshold the top-1/top-2 probability gap;
    this is the integer marker-count analogue, SQL-replayable).

    Same vectorized scores matrix as LangId; per row the margin is
    ``best_count - second_best_count`` over the full language vector
    (absent languages count 0, so a single-language doc's margin is
    its whole best count; no markers → 0/0). ``pred_lang`` follows
    LangId exactly, including the CJK → zh override (the margin
    still reports the marker-table values — the detector the
    override bypassed). Returns ``(doc_id, pred_lang, best_score,
    margin)``."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        s = batch.column("text").to_pandas().fillna("").str.lower()
        n = len(s)
        exploded = s.str.split().explode()
        scores = np.zeros((n, len(self.langs)), dtype=np.int64)
        if len(exploded):
            for j, lg in enumerate(self.langs):
                hits = exploded.isin(self.markers[lg]) \
                    .groupby(level=0).sum()
                scores[hits.index.to_numpy(), j] = hits.to_numpy()
        order = np.sort(scores, axis=1)
        best = order[:, -1]
        second = order[:, -2] if scores.shape[1] >= 2 \
            else np.zeros(n, np.int64)
        best_j = scores.argmax(axis=1)
        langs_arr = np.array(self.langs, dtype=object)
        pred = np.where(best >= 1, langs_arr[best_j], "und")
        is_cjk = s.str.contains(_CJK_RE).to_numpy()
        pred = np.where(is_cjk, "zh", pred)
        return pa.table({
            "doc_id": batch.column("doc_id").cast(pa.int64()),
            "pred_lang": pa.array(pred.tolist(), pa.string()),
            "best_score": pa.array(best, pa.int64()),
            "margin": pa.array(best - second, pa.int64()),
        })


def fingerprint_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Content fingerprint: md5 of the text (exact-dup key; md5 chosen so
    the DuckDB oracle can recompute it)."""
    texts = batch.column(text_col).to_pylist()
    fps = [hashlib.md5((t or "").encode()).hexdigest() for t in texts]
    return batch.append_column("fingerprint", pa.array(fps, pa.string()))


def rolling_hash_batch(batch: pa.Table, text_col: str = "text",
                       window: int = 16, base: int = 257) -> pa.Table:
    """Polynomial rolling-hash fingerprint (Rabin-Karp style) over bytes
    — the winnowing building block: min window-hash per document.

    FULLY VECTORIZED: all documents' bytes concatenate into ONE numpy
    buffer; ``window`` shifted multiply-adds compute every window hash
    (wrapping uint64 polynomial — deterministic everywhere), and one
    ``minimum.reduceat`` takes each document's min over its own valid
    windows (windows crossing document boundaries are excluded by the
    segment math). Documents shorter than ``window`` hash whole.
    Deterministic; no SQL oracle (rows-only check)."""
    texts = batch.column(text_col).to_pylist()
    n_docs = len(texts)
    if n_docs == 0:
        return batch.append_column("rolling_min_hash",
                                   pa.array([], pa.uint64()))
    b = np.uint64(base)
    payloads = [(t or "").encode() for t in texts]
    lens = np.array([len(p) for p in payloads], dtype=np.int64)
    mins = np.zeros(n_docs, dtype=np.uint64)

    # short docs (len < window): whole-doc polynomial, padded matrix
    short = lens < window
    if short.any():
        sidx = np.nonzero(short)[0]
        w = int(lens[sidx].max()) if len(sidx) else 0
        mat = np.zeros((len(sidx), w), dtype=np.uint64)
        for r, i in enumerate(sidx):
            d = np.frombuffer(payloads[i], dtype=np.uint8)
            mat[r, :len(d)] = d
        acc = np.zeros(len(sidx), dtype=np.uint64)
        # zero-padding right of the payload would change the hash —
        # run the Horner step only while j < len (mask the rest)
        for j in range(w):
            live = j < lens[sidx]
            acc[live] = acc[live] * b + mat[live.nonzero()[0], j]
        mins[sidx] = acc

    long_idx = np.nonzero(~short)[0]
    if len(long_idx):
        data = np.frombuffer(b"".join(payloads[i] for i in long_idx),
                             dtype=np.uint8).astype(np.uint64)
        starts = np.zeros(len(long_idx), dtype=np.int64)
        np.cumsum(lens[long_idx][:-1], out=starts[1:])
        n_out = len(data) - window + 1
        acc = np.zeros(n_out, dtype=np.uint64)
        for j in range(window):
            acc = acc * b + data[j:j + n_out]
        # valid windows of doc i: [starts[i], starts[i] + len_i - w]
        # — reduceat over [valid_start, invalid_tail) pairs, keeping
        # only the even segments (the odd ones cover boundary windows)
        valid_ends = starts + lens[long_idx] - window + 1
        bounds = np.empty(2 * len(long_idx), dtype=np.int64)
        bounds[0::2] = starts
        bounds[1::2] = valid_ends
        segs = np.minimum.reduceat(acc, np.minimum(bounds[:-1], n_out - 1))
        mins[long_idx] = segs[0::2]

    return batch.append_column("rolling_min_hash",
                               pa.array(mins, pa.uint64()))


def word_entropy_batch(batch: pa.Table, text_col: str = "text",
                       id_col: str = "doc_id") -> pa.Table:
    """Shannon entropy of each document's word distribution, in
    integer micro-nats — a standard redundancy/quality signal (a
    keyword-stuffed or template page has low entropy for its length).

    Per-(doc, word) term ``ROUND(c/len * ln(len/c) * 1e6)`` summed as
    int64 — integer summation makes the per-doc total independent of
    accumulation order, so the DuckDB oracle (same expression tree,
    same rounding) matches exactly (the bm25_score trick). Pure
    per-batch numpy: one explode + factorize + unique over pair codes;
    NO shuffle, no per-row Python. A single-word (or empty) document
    has entropy 0 on both sides ('' splits to [''])."""
    texts = batch.column(text_col).to_pandas().fillna("")
    words_list = texts.str.split(" ")
    n_words = words_list.str.len().to_numpy(dtype=np.int64)
    ex = words_list.explode()
    doc_idx = ex.index.to_numpy(dtype=np.int64)
    codes, vocab = pd.factorize(ex.to_numpy())
    # per-(doc, word) counts without a hash map: unique over the
    # combined code (doc_idx is batch-local so the product is small)
    pair = doc_idx * np.int64(len(vocab)) + codes
    upair, counts = np.unique(pair, return_counts=True)
    pdoc = (upair // np.int64(len(vocab))).astype(np.int64)
    dl = n_words[pdoc].astype(np.float64)
    c = counts.astype(np.float64)
    term = np.round(c / dl * np.log(dl / c) * 1_000_000.0).astype(np.int64)
    out = np.zeros(len(texts), dtype=np.int64)
    np.add.at(out, pdoc, term)
    return pa.table({
        id_col: batch.column(id_col),
        "entropy_micros": pa.array(out, pa.int64()),
    })


def regex_count_batch(batch: pa.Table, *, pattern: str = "[aeiou]{2,}",
                      text_col: str = "text",
                      out_col: str = "n_matches") -> pa.Table:
    """Per-document count of non-overlapping RE2 matches — the
    pattern-density feature (PII density, leftover markup, vowel-run
    language signals). Stays entirely in Arrow: ``count_substring_regex``
    is re2 leftmost, continue-after-match — the same global-match
    semantics as DuckDB's ``regexp_extract_all``, so the count is
    oracle-exact. No shuffle, no Python per row."""
    return pa.table({
        "doc_id": batch.column("doc_id"),
        out_col: pc.cast(pc.count_substring_regex(
            batch.column(text_col), pattern), pa.int64()),
    })
