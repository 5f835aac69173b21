"""Corpus-curation operators a 100 TB training-data pipeline runs
beyond dedup: Gopher-style repetition quality signals, benchmark
decontamination, global boilerplate n-gram mining, per-language
exact token-length quantiles, BM25 relevance scoring, corpus-LM
unigram log-prob scoring, and PII redaction.

Scale shapes (what rides which shuffle):
* ``gopher_quality_batch``: pure per-batch numpy (factorize + bincount
  + maximum.at) — NO shuffle, no per-row Python.
* ``decontaminate``: the benchmark set is SMALL by definition (an eval
  suite, not the corpus) — its shingle set is built once, broadcast
  via ``ray.put``, and membership-tested per batch with one vectorized
  ``isin``; the corpus side never shuffles.
* ``ngram_topk``: per-batch map-side combine (value_counts) so only
  (ngram, partial_count) pairs enter the ONE groupby shuffle; the
  grouped totals are reduced block-locally to k rows per block before
  the final tiny sort — the full aggregated table is never sorted.
* ``token_quantiles``: per-batch combine to (lang, token_count, n)
  partials; the groupby output is bounded by |langs| x |distinct
  counts| (token counts are small ints), so exact quantiles come from
  a value-histogram, never from sorting the corpus.
* ``bm25_score``: two streaming passes; only the QUERY terms' document
  frequencies are ever collected, never the corpus vocabulary.
* ``pii_redact_batch``: one C-backed regex pass per pattern over the
  whole column; no shuffle.
* ``unigram_logprob``: the vocab-scale count table CO-PARTITIONS with
  doc term frequencies (salted against stopword skew) — never
  broadcast, never a hash-join.

Reference semantics: these extend the reference's extraction surface
(ksoup has no corpus ops); word boundaries follow the same
single-space convention as ``textstats.token_count_batch`` so the
DuckDB oracles can mirror each operator exactly.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa

from ._blocks import from_pandas_clean as _from_pandas_clean
import pyarrow.compute as pc


def _explode_words(texts: pd.Series):
    """Factorized word stream: (doc_index int64[], word_code int64[],
    vocab). Splits on single space — the corpus/oracle convention
    (DuckDB ``string_split(text, ' ')``); '' splits to [''] on both
    sides."""
    words_list = texts.str.split(" ")
    n_words = words_list.str.len().to_numpy(dtype=np.int64)
    ex = words_list.explode()
    doc_idx = ex.index.to_numpy(dtype=np.int64)
    codes, vocab = pd.factorize(ex.to_numpy())
    return doc_idx, codes.astype(np.int64), np.asarray(vocab), n_words


def gopher_quality_batch(batch: pa.Table,
                         text_col: str = "text") -> pa.Table:
    """Gopher-style repetition signals per document:

    * ``n_words`` — word count (single-space split);
    * ``distinct_word_frac`` — distinct words / words;
    * ``top_word_frac`` — most-frequent word's count / words;
    * ``dup_2gram_frac`` — 1 - distinct bigrams / bigrams (0 when the
      doc has < 2 words).

    All counting is factorize + ``np.unique``/``bincount`` over the
    whole batch — no per-row Python loop.
    """
    s = batch.column(text_col).to_pandas().fillna("")
    n = len(s)
    if n == 0:
        empty = pa.array([], pa.float64())
        out = batch.append_column("n_words", pa.array([], pa.int64()))
        for c in ("distinct_word_frac", "top_word_frac",
                  "dup_2gram_frac"):
            out = out.append_column(c, empty)
        return out
    doc_idx, codes, vocab, n_words = _explode_words(s)
    v = np.int64(len(vocab))

    # per (doc, word) counts via one np.unique over a combined key
    key = doc_idx * v + codes
    uk, counts = np.unique(key, return_counts=True)
    udoc = (uk // v).astype(np.intp)
    distinct = np.bincount(udoc, minlength=n).astype(np.int64)
    topc = np.zeros(n, dtype=np.int64)
    np.maximum.at(topc, udoc, counts)

    # bigrams: adjacent word-code pairs within the same doc
    adj = doc_idx[:-1] == doc_idx[1:]
    bkey = (doc_idx[:-1] * v + codes[:-1]) * v + codes[1:]
    ubk = np.unique(bkey[adj])
    bdoc = (ubk // (v * v)).astype(np.intp)
    bdistinct = np.bincount(bdoc, minlength=n).astype(np.int64)
    btotal = np.maximum(n_words - 1, 0)

    tot = n_words.astype(np.float64)
    dup2 = np.where(btotal > 0,
                    1.0 - bdistinct / np.maximum(btotal, 1), 0.0)
    out = batch.append_column("n_words", pa.array(n_words, pa.int64()))
    out = out.append_column("distinct_word_frac",
                            pa.array(distinct / tot, pa.float64()))
    out = out.append_column("top_word_frac",
                            pa.array(topc / tot, pa.float64()))
    out = out.append_column("dup_2gram_frac",
                            pa.array(dup2, pa.float64()))
    return out


def _ngram_strings(texts: pd.Series, n: int):
    """(doc_index int64[], ngram str[]) for word n-grams of each text —
    vectorized sliding join over the exploded word stream (cross-doc
    windows masked out)."""
    words_list = texts.str.split(" ")
    ex = words_list.explode()
    doc_idx = ex.index.to_numpy(dtype=np.int64)
    w = ex.to_numpy(dtype=object)
    if len(w) < n:
        return np.array([], np.int64), np.array([], object)
    m = len(w) - n + 1
    same = doc_idx[:m] == doc_idx[n - 1:]
    grams = w[:m].copy()
    for j in range(1, n):
        grams = grams + " "
        grams = grams + w[j:m + j]
    return doc_idx[:m][same], grams[same]


def decontaminate(ds, benchmark_ds, *, text_col: str = "text",
                  id_col: str = "doc_id", ngram: int = 3):
    """Flag corpus documents sharing any word ``ngram`` with a
    benchmark set (eval-suite decontamination).

    The benchmark's distinct shingles are computed distributed, pulled
    once (a benchmark is small by definition — NOT corpus-scale), and
    broadcast via ``ray.put``; each corpus batch then does ONE
    vectorized ``isin`` over its exploded shingles. Returns
    ``(doc_id, contaminated int64)``. No corpus-side shuffle.
    """
    import ray

    def bench_shingles(batch: pa.Table) -> pa.Table:
        s = batch.column(text_col).to_pandas().fillna("")
        _, grams = _ngram_strings(s, ngram)
        return pa.table({"g": pa.array(pd.unique(grams), pa.string())})

    bench = benchmark_ds.map_batches(bench_shingles,
                                     batch_format="pyarrow")
    gset: set = set()
    for b in bench.iter_batches(batch_format="pyarrow"):
        gset.update(b.column("g").to_pylist())
    gref = ray.put(frozenset(gset))

    class Contaminated:
        def __init__(self, ref):
            self.gset = ray.get(ref)   # once per actor

        def __call__(self, batch: pa.Table) -> pa.Table:
            s = batch.column(text_col).to_pandas().fillna("")
            di, grams = _ngram_strings(s, ngram)
            flag = np.zeros(len(s), dtype=bool)
            if len(grams):
                hit = pd.Series(grams).isin(self.gset).to_numpy()
                np.logical_or.at(flag, di[hit], True)
            return pa.table({
                id_col: batch.column(id_col).cast(pa.int64()),
                "contaminated": pa.array(flag.astype(np.int64),
                                         pa.int64()),
            })

    return ds.map_batches(Contaminated, fn_constructor_args=(gref,),
                          concurrency=(1, 8), batch_format="pyarrow")


_BLOOM_K1 = "bloomfilterkeyA!"          # 16-byte pd.util.hash_array keys
_BLOOM_K2 = "bloomfilterkeyB!"


def _bloom_positions(grams: np.ndarray, m_bits: int, n_hashes: int):
    """(n_hashes, len(grams)) bit positions via double hashing —
    pd.util.hash_array twice (vectorized C), then h1 + i*h2 mod m."""
    h1 = pd.util.hash_array(grams, hash_key=_BLOOM_K1)
    h2 = pd.util.hash_array(grams, hash_key=_BLOOM_K2) | np.uint64(1)
    i = np.arange(n_hashes, dtype=np.uint64)[:, None]
    return ((h1[None, :] + i * h2[None, :])
            % np.uint64(m_bits)).astype(np.int64)


def decontaminate_bloom(ds, benchmark_ds, *, text_col: str = "text",
                        id_col: str = "doc_id", ngram: int = 3,
                        bits_per_key: int = 12, n_hashes: int = 7,
                        num_partitions: int | None = None):
    """Decontamination at the scale where the EXACT shingle set is too
    big to broadcast: a packed Bloom bitset prefilters the corpus, then
    only the (rare) candidate shingles are exactly verified with a
    distributed semi-join — results are EXACT (identical to
    ``decontaminate``; Bloom false positives are killed by the verify
    join, and Bloom has no false negatives).

    Scale shape: the broadcast side shrinks from ~40 B/shingle (Python
    set) to ``bits_per_key``/8 bytes/shingle (packed uint8 bits,
    zero-copy out of the object store per actor); the corpus side still
    never shuffles — only candidate ``(doc_id, gram)`` pairs (bounded
    by true hits + FP rate × corpus grams, with FP ≈ 0.6185^
    (bits_per_key) ≈ 0.3 % at the default 12 bits/key) enter the
    verify join against the benchmark shingle table.
    """
    import ray
    from ray.data.aggregate import Count

    from .dedup import _join_ready

    if num_partitions is None:
        cpus = int(ray.cluster_resources().get("CPU", 8))
        num_partitions = max(2, cpus // 2)

    def bench_shingles(batch: pa.Table) -> pa.Table:
        s = batch.column(text_col).to_pandas().fillna("")
        _, grams = _ngram_strings(s, ngram)
        return pa.table({"g": pa.array(pd.unique(grams), pa.string())})

    bench = benchmark_ds.map_batches(bench_shingles,
                                     batch_format="pyarrow").materialize()

    # driver folds the benchmark's hashes into a packed bitset — O(bench)
    # driver work, same budget class as decontaminate's set pull, but the
    # SHIPPED artifact is bits_per_key/8 bytes per key instead of a set
    h_parts: list[np.ndarray] = []
    for b in bench.iter_batches(batch_format="pyarrow"):
        g = b.column("g").to_numpy(zero_copy_only=False)
        if len(g):
            h_parts.append(pd.util.hash_array(g, hash_key=_BLOOM_K1))
            h_parts.append(pd.util.hash_array(g, hash_key=_BLOOM_K2))
    n_keys = sum(len(h) for h in h_parts) // 2 if h_parts else 0
    m_bits = 1 << max(8, int(np.ceil(np.log2(max(1, n_keys)
                                             * bits_per_key))))
    bits = np.zeros(m_bits // 8, dtype=np.uint8)
    for j in range(0, len(h_parts), 2):
        h1, h2 = h_parts[j], h_parts[j + 1] | np.uint64(1)
        for i in range(n_hashes):
            pos = ((h1 + np.uint64(i) * h2)
                   % np.uint64(m_bits)).astype(np.int64)
            np.bitwise_or.at(bits, pos >> 3,
                             np.left_shift(np.uint8(1),
                                           (pos & 7).astype(np.uint8)))
    bloom_ref = ray.put((bits, m_bits))

    class BloomCandidates:
        """Per-batch vectorized Bloom probe → candidate (id, gram) rows
        only; clean documents produce zero output rows."""

        def __init__(self, ref):
            self.bits, self.m_bits = ray.get(ref)   # zero-copy buffer

        def __call__(self, batch: pa.Table) -> pa.Table:
            s = batch.column(text_col).to_pandas().fillna("")
            di, grams = _ngram_strings(s, ngram)
            ids = batch.column(id_col).cast(pa.int64()) \
                .to_numpy(zero_copy_only=False)
            if len(grams) == 0:
                return pa.table({id_col: pa.array([], pa.int64()),
                                 "g": pa.array([], pa.string())})
            hit = np.ones(len(grams), dtype=bool)
            h1 = pd.util.hash_array(grams, hash_key=_BLOOM_K1)
            h2 = pd.util.hash_array(grams, hash_key=_BLOOM_K2) \
                | np.uint64(1)
            for i in range(n_hashes):
                pos = ((h1 + np.uint64(i) * h2)
                       % np.uint64(self.m_bits)).astype(np.int64)
                hit &= (self.bits[pos >> 3]
                        >> (pos & 7).astype(np.uint8)) & 1 > 0
                if not hit.any():
                    break
            cand = pd.DataFrame({id_col: ids[di[hit]],
                                 "g": grams[hit]}).drop_duplicates()
            return pa.table({id_col: pa.array(cand[id_col], pa.int64()),
                             "g": pa.array(cand["g"], pa.string())})

    cands = ds.map_batches(BloomCandidates, fn_constructor_args=(bloom_ref,),
                           concurrency=(1, 8), batch_format="pyarrow")

    # exact verify: semi-join the tiny candidate set against the
    # benchmark shingle table — kills Bloom false positives
    verified = _join_ready(cands).join(
        _join_ready(bench), join_type="inner",
        num_partitions=num_partitions, on=("g",)) \
        .groupby(id_col).aggregate(Count(alias_name="nhits"))

    def flag(batch: pa.Table) -> pa.Table:
        if batch.num_columns == 0 or batch.num_rows == 0:
            return pa.table({id_col: pa.array([], pa.int64()),
                             "contaminated": pa.array([], pa.int64())})
        return pa.table({
            id_col: batch.column(id_col).cast(pa.int64()),
            "contaminated": pa.array(np.ones(batch.num_rows, np.int64)),
        })

    flagged = verified.map_batches(flag, batch_format="pyarrow")
    ids_only = ds.map_batches(
        lambda b: b.select([id_col]).set_column(
            0, id_col, b.column(id_col).cast(pa.int64()))
        .replace_schema_metadata(None),
        batch_format="pyarrow")
    joined = ids_only.join(_join_ready(flagged), join_type="left_outer",
                           num_partitions=num_partitions, on=(id_col,))

    def finalize(batch: pa.Table) -> pa.Table:
        flagc = batch.column("contaminated")
        return pa.table({
            id_col: batch.column(id_col),
            "contaminated": pc.coalesce(flagc, pa.scalar(0, pa.int64())),
        })

    return joined.map_batches(finalize, batch_format="pyarrow")


def ngram_topk(ds, *, text_col: str = "text", n: int = 3, k: int = 20):
    """Global top-``k`` most frequent word ``n``-grams (boilerplate
    mining). Map-side value_counts combine → one groupby(ngram) Sum →
    block-local top-k (k rows per block) → tiny final sort. Ties break
    on the ngram string so the result is deterministic."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        s = batch.column(text_col).to_pandas().fillna("")
        _, grams = _ngram_strings(s, n)
        vc = pd.Series(grams).value_counts()
        return pa.table({
            "ngram": pa.array(vc.index.to_numpy(dtype=object),
                              pa.string()),
            "partial": pa.array(vc.to_numpy(), pa.int64()),
        })

    totals = (ds.map_batches(partial, batch_format="pyarrow")
              .groupby("ngram")
              .aggregate(Sum("partial", alias_name="n")))

    def local_topk(batch: pa.Table) -> pa.Table:
        # each ngram's TOTAL lives in exactly one post-groupby block,
        # so per-block top-k is lossless for the global top-k
        idx = pc.select_k_unstable(
            batch, k, [("n", "descending"), ("ngram", "ascending")])
        return batch.take(idx)

    small = totals.map_batches(local_topk, batch_format="pyarrow")
    return small.sort(["n", "ngram"],
                      descending=[True, False]).limit(k)


def bm25_score(ds, query_terms: tuple[str, ...], *,
               text_col: str = "text", id_col: str = "doc_id",
               k1: float = 1.2, b: float = 0.75):
    """Corpus-wide BM25 scores for a fixed query-term set — TWO
    streaming passes, no corpus-scale driver state:

    pass A (fused stats+df): each batch emits partial (doc count, word
    count) AND per-query-term partial document frequencies — the
    driver folds |terms|+2 numbers per batch;
    pass B (score): per batch, term frequencies via one factorize +
    |terms| bincounts, then per-(doc,term) contributions ROUNDED TO
    INTEGER MICROS before the per-doc sum — integer summation makes
    the result independent of accumulation order, so the DuckDB
    oracle (same expression tree, same rounding) matches exactly.

    Only query-term df's are ever collected (a query is small by
    definition) — never the corpus vocabulary. Returns
    ``(doc_id, score_micros)`` for docs containing ≥1 query term.
    """
    terms = tuple(query_terms)

    def stats_partial(batch: pa.Table) -> pa.Table:
        s = batch.column(text_col).to_pandas().fillna("")
        doc_idx, codes, vocab, n_words = _explode_words(s)
        vs = pd.Series(np.arange(len(vocab)), index=vocab)
        dfs = []
        for t in terms:
            code = vs.get(t, -1)
            dfs.append(int(np.unique(doc_idx[codes == code]).size)
                       if code >= 0 else 0)
        return pa.table({
            "n_docs": pa.array([len(s)], pa.int64()),
            "len_sum": pa.array([int(n_words.sum())], pa.int64()),
            "df": pa.array([dfs], pa.list_(pa.int64())),
        })

    n_docs = 0
    len_sum = 0
    df = np.zeros(len(terms), dtype=np.int64)
    for t in ds.map_batches(stats_partial, batch_format="pyarrow") \
            .iter_batches(batch_format="pyarrow"):
        for i in range(t.num_rows):
            n_docs += t.column("n_docs")[i].as_py()
            len_sum += t.column("len_sum")[i].as_py()
            df += np.array(t.column("df")[i].as_py(), dtype=np.int64)

    avgdl = len_sum / n_docs
    idf = np.log(1.0 + (n_docs - df + 0.5) / (df + 0.5))

    def score(batch: pa.Table) -> pa.Table:
        s = batch.column(text_col).to_pandas().fillna("")
        ids = batch.column(id_col).to_numpy()
        doc_idx, codes, vocab, n_words = _explode_words(s)
        vs = pd.Series(np.arange(len(vocab)), index=vocab)
        n = len(s)
        total = np.zeros(n, dtype=np.int64)
        hit = np.zeros(n, dtype=bool)   # contains ≥1 query term (the
        dl = n_words.astype(np.float64)  # oracle's inner-join set)
        for j, t in enumerate(terms):
            code = vs.get(t, -1)
            if code < 0:
                continue
            tf = np.bincount(doc_idx[codes == code],
                             minlength=n).astype(np.float64)
            # same expression tree as the SQL oracle, term by term
            contrib = np.round(
                idf[j] * (tf * (k1 + 1.0))
                / (tf + k1 * (1.0 - b + b * dl / avgdl))
                * 1_000_000.0)
            total += np.where(tf > 0, contrib, 0.0).astype(np.int64)
            hit |= tf > 0
        return pa.table({
            id_col: pa.array(ids[hit], pa.int64()),
            "score_micros": pa.array(total[hit], pa.int64()),
        })

    return ds.map_batches(score, batch_format="pyarrow")


def _explode_bigrams(texts: pd.Series):
    """Factorized word-BIGRAM stream, same contract as
    :func:`_explode_words`: (doc_index, gram_code, vocab, n_grams).
    Bigram = consecutive word pair joined with one space — identical
    to the DuckDB ``ws[i] || ' ' || ws[i+1]`` convention; documents
    with fewer than two words emit nothing."""
    words_list = texts.str.split(" ")
    ex = words_list.explode()
    doc_idx = ex.index.to_numpy(dtype=np.int64)
    ws = ex.to_numpy(dtype=object)
    if len(ws) < 2:
        return (np.empty(0, np.int64), np.empty(0, np.int64),
                np.empty(0, object), np.zeros(len(texts), np.int64))
    same_doc = doc_idx[1:] == doc_idx[:-1]
    grams = (pd.Series(ws[:-1]) + " " + pd.Series(ws[1:])) \
        .to_numpy(dtype=object)[same_doc]
    g_doc = doc_idx[:-1][same_doc]
    codes, vocab = pd.factorize(grams)
    n_grams = np.maximum(words_list.str.len()
                         .to_numpy(dtype=np.int64) - 1, 0)
    return g_doc, codes.astype(np.int64), np.asarray(vocab), n_grams


def novelty_frac(ds, *, text_col: str = "text",
                 id_col: str = "doc_id", n: int = 3,
                 num_partitions: int = 32):
    """First-introducer novelty per document — for each doc, the
    fraction of its DISTINCT word ``n``-grams whose minimal doc_id
    across the corpus is this doc (the "what does this document add"
    signal used for data-mixing/value scoring; an order-free
    formulation of incremental n-gram novelty, so it needs no ordered
    corpus scan). Docs with fewer than ``n`` words have no n-grams
    and do not appear.

    Scale shape: per batch, DISTINCT (ngram, doc) pairs built
    vectorized (explode + shifted-array concat); ONE bounded
    ``hash(ngram) % num_partitions`` bucket shuffle of those pairs
    (functions/_blocks.py contract); each bucket block computes every
    ngram's min-doc and per-doc (total, first) partial counts in one
    lexsort + segment pass; a final NATIVE Sum groupby(doc) folds the
    ≤ num_partitions partials per doc. Novelty is exact integer ppm
    (``n_first · 10⁶ // n_ngrams``). Returns
    ``(id, n_ngrams, n_first, novelty_ppm)``."""
    from ray.data.aggregate import Sum

    from ._blocks import pk_column

    def pairs(batch: pa.Table) -> pa.Table:
        s = batch.column(text_col).to_pandas().fillna("")
        ids = batch.column(id_col).cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        ex = s.str.split(" ").explode()
        di = ex.index.to_numpy(dtype=np.int64)
        w = ex.to_numpy(dtype=object)
        if len(w) < n:
            t = pa.table({"g": pa.array([], pa.string()),
                          id_col: pa.array([], pa.int64())})
            return t.append_column("_pk", pa.array([], pa.int32()))
        # n-gram strings from shifted object arrays (elementwise str
        # concat in one C loop each); windows crossing doc boundaries
        # masked out
        g = w[: len(w) - n + 1]
        for j in range(1, n):
            g = g + " "
            g = g + w[j: len(w) - n + 1 + j]
        valid = di[: len(di) - n + 1] == di[n - 1:]
        df = pd.DataFrame({
            "g": g[valid],
            id_col: ids[di[: len(di) - n + 1][valid]],
        }).drop_duplicates()
        t = _from_pandas_clean(df)
        return t.append_column(
            "_pk", pk_column(t.column("g"), num_partitions))

    def block(bl: pd.DataFrame) -> pd.DataFrame:
        bl = bl.sort_values(["g", id_col], kind="mergesort")
        gs = bl["g"].to_numpy()
        docs = bl[id_col].to_numpy(np.int64)
        new_g = np.concatenate([[True], gs[1:] != gs[:-1]])
        # a (g, doc) pair can arrive from several batches — distinct
        # pairs only
        new_pair = new_g | np.concatenate(
            [[True], docs[1:] != docs[:-1]])
        docs_d = docs[new_pair]
        # sorted by (g, doc): the first row of each g segment holds
        # that ngram's min doc, and it is always a distinct pair
        first_of_g = new_g[new_pair]
        udocs, inv = np.unique(docs_d, return_inverse=True)
        total = np.bincount(inv).astype(np.int64)
        firsts = np.bincount(inv[first_of_g],
                             minlength=len(udocs)).astype(np.int64)
        return pd.DataFrame({id_col: udocs, "t": total, "f": firsts})

    folded = (ds.map_batches(pairs, batch_format="pyarrow")
              .groupby("_pk")
              .map_groups(block, batch_format="pandas")
              .groupby(id_col)
              .aggregate(Sum("t", alias_name="n_ngrams"),
                         Sum("f", alias_name="n_first")))

    def finish(batch: pa.Table) -> pa.Table:
        t = batch.column("n_ngrams").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        f = batch.column("n_first").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        return pa.table({
            id_col: batch.column(id_col),
            "n_ngrams": pa.array(t, pa.int64()),
            "n_first": pa.array(f, pa.int64()),
            "novelty_ppm": pa.array(f * 1_000_000 // t, pa.int64()),
        })

    return folded.map_batches(finish, batch_format="pyarrow")


def unigram_logprob(ds, *, text_col: str = "text",
                    id_col: str = "doc_id", salt: int = 16,
                    num_word_partitions: int = 32,
                    explode_fn=None, with_tokens: bool = False):
    """Corpus-LM quality score: per-document unigram log-likelihood
    (Σ tf(w) · ln P(w)) in integer micros — the CCNet-style "how
    typical of the corpus is this document" signal.

    Unlike ``bm25_score`` (whose df side is a tiny QUERY-term set),
    the side table here is the CORPUS VOCABULARY — potentially
    billions of rows at 100 TB — so it is NOT broadcast: doc term
    frequencies and vocab counts CO-PARTITION on a BOUNDED bucket key
    ``(hash(word) % num_word_partitions, doc_salt)`` (the same
    per-block shape as ``graph.pagerank``); each bucket BLOCK resolves
    ALL of its words in one vectorized kernel (``pd.factorize`` codes
    → log-prob lookup table → one multiply), and one final
    groupby(doc) sums integers. Python dispatches
    O(num_word_partitions × salt) times total — never per word.
    Per-(doc,word) contributions round to int micros before summing →
    accumulation-order-free, mirrored exactly by the DuckDB oracle.

    Hot-word skew: a stopword's postings would swamp its word bucket,
    so doc rows additionally SALT on ``doc_id % salt`` (vocab rows
    replicate to all ``salt`` buckets — a vocab×salt blowup of tiny
    rows) bounding each bucket to ~1/salt of its words' postings.
    Word hashes come from ``pandas.util.hash_array`` (SipHash, fixed
    key — identical across worker processes).

    Returns ``(doc_id, logprob_micros int64)``; with
    ``with_tokens=True`` also ``n_tokens`` (the doc's token count in
    the LM's own tokenization — Σ tf rides the same aggregate, no
    second corpus pass).
    """
    from ray.data.aggregate import Sum

    if explode_fn is None:
        explode_fn = _explode_words

    def count_partial(batch: pa.Table) -> pa.Table:
        s = batch.column(text_col).to_pandas().fillna("")
        _, codes, vocab, _ = explode_fn(s)
        return pa.table({
            "w": pa.array(vocab, pa.string()),
            "partial": pa.array(np.bincount(codes,
                                            minlength=len(vocab)),
                                pa.int64()),
        })

    counts = (ds.map_batches(count_partial, batch_format="pyarrow")
              .groupby("w").aggregate(Sum("partial", alias_name="c"))
              .materialize())
    total = counts.sum("c")

    def _wpk(words: np.ndarray) -> np.ndarray:
        h = pd.util.hash_array(np.asarray(words, dtype=object))
        return (h % num_word_partitions).astype(np.int32)

    def tag_counts(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        # replicate each vocab row into every salt bucket
        reps = salt
        words = batch.column("w").to_numpy(zero_copy_only=False)
        return pa.table({
            "w": pa.array(np.repeat(words, reps)),
            "wpk": pa.array(np.repeat(_wpk(words), reps), pa.int32()),
            "bkt": pa.array(np.tile(np.arange(reps, dtype=np.int32), n),
                            pa.int32()),
            id_col: pa.array(np.full(n * reps, -1, np.int64)),
            "v": pa.array(np.repeat(
                batch.column("c").cast(pa.int64()).to_numpy(), reps),
                pa.int64()),
            "is_vocab": pa.array(np.ones(n * reps, np.int8)),
        })

    def doc_tf(batch: pa.Table) -> pa.Table:
        s = batch.column(text_col).to_pandas().fillna("")
        ids = batch.column(id_col).to_numpy()
        doc_idx, codes, vocab, _ = explode_fn(s)
        v = np.int64(len(vocab))
        key = doc_idx * v + codes
        uk, tf = np.unique(key, return_counts=True)
        doc_ids = ids[(uk // v).astype(np.intp)]
        wcodes = (uk % v).astype(np.intp)
        # hash once per DISTINCT word in the batch, then gather
        wpk_by_code = _wpk(np.asarray(vocab, object))
        return pa.table({
            "w": pa.array(np.asarray(vocab, object)[wcodes],
                          pa.string()),
            "wpk": pa.array(wpk_by_code[wcodes], pa.int32()),
            "bkt": pa.array((doc_ids % salt).astype(np.int32),
                            pa.int32()),
            id_col: pa.array(doc_ids, pa.int64()),
            "v": pa.array(tf, pa.int64()),
            "is_vocab": pa.array(np.zeros(len(uk), np.int8)),
        })

    both = counts.map_batches(tag_counts, batch_format="pyarrow") \
        .union(ds.map_batches(doc_tf, batch_format="pyarrow"))

    def contribs_block(block: pd.DataFrame) -> pd.DataFrame:
        # ONE kernel for every word in the bucket: factorize to codes,
        # build the per-word log-prob table from the vocab rows (each
        # word's count row is replicated into every salt bucket, so
        # it is present here), gather + multiply for the doc rows
        w = block["w"].to_numpy(dtype=object)
        is_v = block["is_vocab"].to_numpy() == 1
        v = block["v"].to_numpy(dtype=np.int64)
        codes, uniques = pd.factorize(w)
        lp = np.zeros(len(uniques), np.int64)
        # same expression tree as the SQL oracle (per-word rounding)
        lp[codes[is_v]] = np.round(
            np.log(v[is_v].astype(np.float64) / total)
            * 1_000_000.0).astype(np.int64)
        dmask = ~is_v
        out = {
            id_col: block[id_col].to_numpy(dtype=np.int64)[dmask],
            "contrib": v[dmask] * lp[codes[dmask]],
        }
        if with_tokens:
            out["tf"] = v[dmask]
        return pd.DataFrame(out)

    contribs = both.groupby(["wpk", "bkt"]) \
        .map_groups(contribs_block, batch_format="pandas")
    aggs = [Sum("contrib", alias_name="logprob_micros")]
    if with_tokens:
        aggs.append(Sum("tf", alias_name="n_tokens"))
    return contribs.groupby(id_col).aggregate(*aggs)


def ccnet_ppl_buckets(ds, *, text_col: str = "text",
                      id_col: str = "doc_id",
                      quantum_micros: int = 10_000, n_tiles: int = 3,
                      salt: int = 16, num_word_partitions: int = 32,
                      num_partitions: int = 32):
    """CCNet-style perplexity bucketing (Wenzek et al. 2020,
    arXiv:1911.00359 §4.3): score every document by its corpus-LM
    perplexity, then band the corpus into equi-depth head / middle /
    tail thirds — the standard quality tiering that decides which
    web text trains a model and which is discarded.

    Exact + scale-safe composition of two existing primitives:

    1. :func:`unigram_logprob` ``with_tokens=True`` — per-doc integer
       log-likelihood AND token count from ONE co-partitioned pass
       (vocab never broadcast, never collected);
    2. per-token negative log-prob quantized to
       ``quantum_micros``-sized bins: ``ppl_q = (-logprob_micros) //
       (n_tokens * quantum_micros)`` — integer floor division, exact
       on both sides. The quantization is what keeps the banding
       histogram BOUNDED: distinct ppl_q values number ~(max mean
       neg-logprob / quantum), a few hundred bins at any corpus
       size, so :func:`~ksoup_ray.functions.agg.ntile_by_group`'s
       bounded cross-tab applies (per-doc raw micros would put one
       grid row per document — corpus-scale driver state);
    3. sort-free NTILE(``n_tiles``) over (ppl_q, doc_id) — no global
       sort, DuckDB's first-r-tiles rule closed-form.

    Empty docs (0 tokens) are excluded (perplexity undefined), same
    as the oracle's ``WHERE n_tokens > 0``. Returns
    ``(doc_id, ppl_q, bucket)`` with bucket ∈ {head, middle, tail}
    for ``n_tiles=3``, else the 1-based tile number as a string.
    """
    from .agg import ntile_by_group

    lp = unigram_logprob(ds, text_col=text_col, id_col=id_col,
                         salt=salt,
                         num_word_partitions=num_word_partitions,
                         with_tokens=True)

    def quantize(batch: pa.Table) -> pa.Table:
        lpm = batch.column("logprob_micros") \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        ntok = batch.column("n_tokens") \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        ids = batch.column(id_col).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        keep = ntok > 0
        ppl_q = (-lpm[keep]) // (ntok[keep] * quantum_micros)
        return pa.table({
            id_col: pa.array(ids[keep], pa.int64()),
            "corpus": pa.array(np.zeros(int(keep.sum()), np.int64),
                               pa.int64()),
            "ppl_q": pa.array(ppl_q, pa.int64()),
        })

    # MATERIALIZE the quantized scores (3 int64 cols, object-store
    # resident): ntile_by_group consumes its input twice (the bounded
    # cross-tab, then the ranking pass) — without this the whole
    # corpus-LM DAG above would execute twice (review finding,
    # session 13: halves the operator's dominant cost)
    quantized = lp.map_batches(quantize, batch_format="pyarrow") \
        .materialize()
    tiles = ntile_by_group(
        quantized, key_col="corpus", val_col="ppl_q", tie_col=id_col,
        n_tiles=n_tiles, num_partitions=num_partitions)

    names = {1: "head", 2: "middle", 3: "tail"} if n_tiles == 3 \
        else {i: str(i) for i in range(1, n_tiles + 1)}

    def label(batch: pa.Table) -> pa.Table:
        t = batch.column("tile").to_numpy(zero_copy_only=False)
        lut = np.array([names.get(i, str(i))
                        for i in range(n_tiles + 1)], dtype=object)
        return pa.table({
            id_col: batch.column(id_col),
            "ppl_q": batch.column("ppl_q"),
            "bucket": pa.array(lut[t], pa.string()),
        })

    return tiles.map_batches(label, batch_format="pyarrow")


def bigram_logprob(ds, *, text_col: str = "text",
                   id_col: str = "doc_id", salt: int = 16,
                   num_word_partitions: int = 32):
    """Joint word-BIGRAM corpus-LM score — Σ tf(b) · ln P(b) in int
    micros: the order-sensitive companion of :func:`unigram_logprob`
    (word-salad that matches unigram statistics but scrambles order
    scores low). Same co-partitioned vocab machinery (the bigram
    vocabulary is larger still, so broadcasting is even less an
    option); documents with fewer than two words emit no row."""
    return unigram_logprob(ds, text_col=text_col, id_col=id_col,
                           salt=salt,
                           num_word_partitions=num_word_partitions,
                           explode_fn=_explode_bigrams)


# PII patterns chosen to behave IDENTICALLY in Python `re` and DuckDB
# RE2 (no lookarounds, ASCII classes); applied in this order.
PII_PATTERNS: tuple[tuple[str, str], ...] = (
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    (r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    (r"\b\d{3}-\d{3}-\d{4}\b", "<PHONE>"),
)


def luhn_pan_batch(batch: pa.Table, text_col: str = "text",
                  id_col: str = "doc_id") -> pa.Table:
    """Credit-card-number (PAN) detection with Luhn verification — the
    PII class a bare regex cannot gate (most 16-digit runs are NOT
    card numbers; the Luhn mod-10 checksum is the standard filter
    real redaction pipelines apply before masking).

    Per batch: ONE vectorized ``str.findall(r"\\d+")`` over the column
    (RE2-compatible — no lookarounds, so the DuckDB oracle can replay
    the run extraction verbatim), keep the length-16 runs, then Luhn
    over ALL candidates at once: the fixed width makes the digit
    matrix a single ``np.frombuffer`` reshape, doubling/folding is
    two numpy ops, and validity is a vectorized mod-10. No per-row
    Python. Returns ``(id, n_digit_runs, n_pan16, n_luhn_valid)``.

    For a 16-digit PAN d1..d16, Luhn doubles d1,d3,...,d15 (every
    second digit from the RIGHT in an even-length number), subtracts
    9 from doubles > 9, and requires the total sum ≡ 0 (mod 10).
    """
    import re
    s = batch.column(text_col).to_pandas().fillna("")
    runs = s.str.findall(re.compile(r"\d+"))
    n_runs = runs.str.len().to_numpy(dtype=np.int64)
    ex = runs.explode().dropna()
    cand = ex[ex.str.len() == 16]
    n = len(s)
    n_pan = np.zeros(n, np.int64)
    n_valid = np.zeros(n, np.int64)
    if len(cand):
        di = cand.index.to_numpy(dtype=np.int64)
        digits = (np.frombuffer(
            "".join(cand.to_numpy(dtype=object)).encode(), np.uint8)
            .reshape(-1, 16).astype(np.int64) - 48)
        doubled = digits.copy()
        doubled[:, 0::2] *= 2                    # d1,d3,...,d15
        doubled[doubled > 9] -= 9
        ok = (doubled.sum(axis=1) % 10 == 0)
        np.add.at(n_pan, di, 1)
        np.add.at(n_valid, di, ok.astype(np.int64))
    return pa.table({
        id_col: batch.column(id_col),
        "n_digit_runs": pa.array(n_runs, pa.int64()),
        "n_pan16": pa.array(n_pan, pa.int64()),
        "n_luhn_valid": pa.array(n_valid, pa.int64()),
    })


def normalize_text_batch(batch: pa.Table, text_col: str = "text",
                         out_col: str = "norm_text") -> pa.Table:
    """Unicode NFC normalization + edge-whitespace trim — the standard
    pre-tokenization canonicalization (decomposed e+COMBINING ACUTE →
    é, etc.). One pyarrow utf8_trim_whitespace kernel; NFC itself via
    ``unicodedata.normalize`` per string (C-implemented; ASCII strings
    short-circuit inside CPython). Mirrored by DuckDB
    ``trim(nfc_normalize(text))``."""
    import unicodedata
    s = batch.column(text_col).to_pylist()
    norm = pa.array([unicodedata.normalize("NFC", t) if t is not None
                     else None for t in s], pa.string())
    return batch.append_column(out_col, pc.utf8_trim_whitespace(norm))


def pii_redact_batch(batch: pa.Table, text_col: str = "text",
                     out_col: str = "redacted") -> pa.Table:
    """Redact emails / IPv4s / phone numbers with typed placeholders —
    one vectorized ``pandas.str.replace`` per pattern (C-backed regex
    over the whole column, no per-row Python). Patterns are
    RE2-compatible so the DuckDB oracle applies the identical chain
    with ``regexp_replace(..., 'g')``."""
    s = batch.column(text_col).to_pandas().fillna("")
    for pat, repl in PII_PATTERNS:
        s = s.str.replace(pat, repl, regex=True)
    return batch.append_column(out_col,
                               pa.array(s.to_numpy(dtype=object),
                                        pa.string()))


def token_quantiles(ds, *, text_col: str = "text",
                    lang_col: str = "lang",
                    qs: tuple[float, ...] = (0.25, 0.5, 0.75, 0.9)):
    """Exact per-language whitespace-token-count quantiles from a
    value histogram: per-batch combine to (lang, token_count, n)
    partials, one groupby over a table bounded by |langs| x |distinct
    counts| (token counts are small integers at ANY corpus size), then
    the discrete quantile is read off the cumulative counts.

    Discrete rule matches DuckDB ``quantile_disc``: the value at
    1-based rank ``ceil(q * n)``. Returns a pandas DataFrame
    ``(lang, p25, p50, p75, p90)``.
    """
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        text = batch.column(text_col)
        spaces = pc.count_substring(text, " ")
        nonempty = pc.and_(pc.is_valid(text), pc.not_equal(text, ""))
        tc = pc.if_else(nonempty, pc.add(spaces, 1),
                        pa.scalar(0, pa.int32())).cast(pa.int64())
        t = pa.table({lang_col: batch.column(lang_col),
                      "token_count": tc})
        g = t.group_by([lang_col, "token_count"]).aggregate(
            [("token_count", "count")])
        return pa.table({
            lang_col: g.column(lang_col),
            "token_count": g.column("token_count"),
            "partial": g.column("token_count_count").cast(pa.int64()),
        })

    hist = (ds.map_batches(partial, batch_format="pyarrow")
            .groupby([lang_col, "token_count"])
            .aggregate(Sum("partial", alias_name="n"))
            .to_pandas())   # bounded: |langs| x |distinct counts|

    rows = []
    for lang, grp in hist.groupby(lang_col, sort=True):
        grp = grp.sort_values("token_count")
        vals = grp["token_count"].to_numpy()
        cum = grp["n"].to_numpy().cumsum()
        total = int(cum[-1])
        row = {"lang": lang}
        for q in qs:
            rank = max(1, int(np.ceil(q * total)))
            row[f"p{int(q * 100)}"] = int(
                vals[np.searchsorted(cum, rank)])
        rows.append(row)
    return pd.DataFrame(rows)


def dsir_logweight(ds, *, text_col: str = "text",
                   lang_col: str = "lang", target_lang: str = "en",
                   id_col: str = "doc_id", salt: int = 16,
                   num_word_partitions: int = 32):
    """DSIR-style importance log-weight (Xie et al. 2023, "Data
    Selection for Language Models via Importance Resampling"):
    ``log w(x) = Σ_w tf(w,x) · (ln p_target(w) − ln p_raw(w))`` with
    unigram features and add-one smoothing — here the target
    distribution is the ``target_lang`` slice of the corpus and raw is
    the whole corpus. Per-word deltas round to INT MICROS before the
    sum, so the result is accumulation-order-free and the DuckDB
    oracle reproduces it exactly.

    Distributed shape: identical to :func:`unigram_logprob` (whose
    docstring has the full scale argument) with a two-count vocabulary
    — ONE counting pass emits (word, raw_partial, target_partial),
    one native Sum groupby folds it, and the per-word delta table
    co-partitions with doc term frequencies on the bounded
    ``(word bucket, doc salt)`` key; each bucket block resolves all
    its words in one factorize+gather kernel. Returns
    ``(doc_id, logweight_micros int64)``.
    """
    from ray.data.aggregate import Sum

    def count_partial(batch: pa.Table) -> pa.Table:
        s = batch.column(text_col).to_pandas().fillna("")
        is_t = (batch.column(lang_col).to_pandas() == target_lang) \
            .to_numpy()
        doc_idx, codes, vocab, _ = _explode_words(s)
        cr = np.bincount(codes, minlength=len(vocab))
        ct = np.bincount(codes[is_t[doc_idx]], minlength=len(vocab))
        return pa.table({
            "w": pa.array(vocab, pa.string()),
            "pr": pa.array(cr, pa.int64()),
            "pt": pa.array(ct, pa.int64()),
        })

    counts = (ds.map_batches(count_partial, batch_format="pyarrow")
              .groupby("w").aggregate(Sum("pr", alias_name="cr"),
                                      Sum("pt", alias_name="ct"))
              .materialize())
    total_raw = counts.sum("cr")
    total_tgt = counts.sum("ct")
    vocab_size = counts.count()

    def _wpk(words: np.ndarray) -> np.ndarray:
        h = pd.util.hash_array(np.asarray(words, dtype=object))
        return (h % num_word_partitions).astype(np.int32)

    def tag_deltas(batch: pa.Table) -> pa.Table:
        # per-word λ = round((ln p_t − ln p_r)·1e6), replicated into
        # every salt bucket (tiny rows: word + int64)
        n = batch.num_rows
        words = batch.column("w").to_numpy(zero_copy_only=False)
        cr = batch.column("cr").cast(pa.int64()).to_numpy()
        ct = batch.column("ct").cast(pa.int64()).to_numpy()
        lam = np.round(
            (np.log((ct + 1.0) / (total_tgt + vocab_size))
             - np.log((cr + 1.0) / (total_raw + vocab_size)))
            * 1_000_000.0).astype(np.int64)
        return pa.table({
            "w": pa.array(np.repeat(words, salt)),
            "wpk": pa.array(np.repeat(_wpk(words), salt), pa.int32()),
            "bkt": pa.array(np.tile(np.arange(salt, dtype=np.int32), n),
                            pa.int32()),
            id_col: pa.array(np.full(n * salt, -1, np.int64)),
            "v": pa.array(np.repeat(lam, salt), pa.int64()),
            "is_vocab": pa.array(np.ones(n * salt, np.int8)),
        })

    def doc_tf(batch: pa.Table) -> pa.Table:
        s = batch.column(text_col).to_pandas().fillna("")
        ids = batch.column(id_col).to_numpy()
        doc_idx, codes, vocab, _ = _explode_words(s)
        v = np.int64(len(vocab))
        key = doc_idx * v + codes
        uk, tf = np.unique(key, return_counts=True)
        doc_ids = ids[(uk // v).astype(np.intp)]
        wcodes = (uk % v).astype(np.intp)
        wpk_by_code = _wpk(np.asarray(vocab, object))
        return pa.table({
            "w": pa.array(np.asarray(vocab, object)[wcodes],
                          pa.string()),
            "wpk": pa.array(wpk_by_code[wcodes], pa.int32()),
            "bkt": pa.array((doc_ids % salt).astype(np.int32),
                            pa.int32()),
            id_col: pa.array(doc_ids, pa.int64()),
            "v": pa.array(tf, pa.int64()),
            "is_vocab": pa.array(np.zeros(len(uk), np.int8)),
        })

    both = counts.map_batches(tag_deltas, batch_format="pyarrow") \
        .union(ds.map_batches(doc_tf, batch_format="pyarrow"))

    def contribs_block(block: pd.DataFrame) -> pd.DataFrame:
        w = block["w"].to_numpy(dtype=object)
        is_v = block["is_vocab"].to_numpy() == 1
        v = block["v"].to_numpy(dtype=np.int64)
        codes, uniques = pd.factorize(w)
        lam = np.zeros(len(uniques), np.int64)
        lam[codes[is_v]] = v[is_v]
        dmask = ~is_v
        return pd.DataFrame({
            id_col: block[id_col].to_numpy(dtype=np.int64)[dmask],
            "contrib": v[dmask] * lam[codes[dmask]],
        })

    return (both.groupby(["wpk", "bkt"])
            .map_groups(contribs_block, batch_format="pandas")
            .groupby(id_col)
            .aggregate(Sum("contrib", alias_name="logweight_micros")))


def tfidf_topk(ds, *, text_col: str = "text", id_col: str = "doc_id",
               k: int = 3, salt: int = 16,
               num_word_partitions: int = 32,
               num_doc_partitions: int = 64):
    """Per-document top-``k`` terms by tf-idf — keyword extraction /
    sparse doc representation. ``score = tf(w,d) · round(ln(N/df_w)
    · 1e6)`` (int micros — order-free, exact SQL oracle); ties break
    on the term ascending. Returns ``(doc_id, term, tfidf_micros,
    rank 1-based)``.

    Scale shape: (1) one counting pass folds per-batch DISTINCT
    (doc, word) partials into the df table (native Sum groupby;
    nothing vocabulary-scale on the driver); (2) the idf table
    co-partitions with doc term frequencies on the bounded
    ``(word bucket, doc salt)`` key exactly like
    :func:`unigram_logprob` (hot stopwords salt across buckets);
    (3) scored rows shuffle ONCE on ``hash(doc) % num_doc_partitions``
    and each bucket block ranks ALL of its docs in one sorted
    segmented pass. Python dispatch is O(partitions) everywhere."""
    from ray.data.aggregate import Sum
    from ._blocks import bucket_of, start_of_segment

    n_docs = ds.count()

    def df_partial(batch: pa.Table) -> pa.Table:
        s = batch.column(text_col).to_pandas().fillna("")
        doc_idx, codes, vocab, _ = _explode_words(s)
        v = np.int64(len(vocab))
        uk = np.unique(doc_idx * v + codes)
        wcodes = (uk % v).astype(np.intp)
        cnt = np.bincount(wcodes, minlength=len(vocab))
        return pa.table({
            "w": pa.array(vocab, pa.string()),
            "partial": pa.array(cnt, pa.int64()),
        })

    dfs = (ds.map_batches(df_partial, batch_format="pyarrow")
           .groupby("w").aggregate(Sum("partial", alias_name="df"))
           .materialize())

    def _wpk(words: np.ndarray) -> np.ndarray:
        h = pd.util.hash_array(np.asarray(words, dtype=object))
        return (h % num_word_partitions).astype(np.int32)

    def tag_idf(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        words = batch.column("w").to_numpy(zero_copy_only=False)
        df = batch.column("df").cast(pa.int64()).to_numpy()
        idf = np.round(np.log(float(n_docs) / df.astype(np.float64))
                       * 1_000_000.0).astype(np.int64)
        return pa.table({
            "w": pa.array(np.repeat(words, salt)),
            "wpk": pa.array(np.repeat(_wpk(words), salt), pa.int32()),
            "bkt": pa.array(np.tile(np.arange(salt, dtype=np.int32), n),
                            pa.int32()),
            id_col: pa.array(np.full(n * salt, -1, np.int64)),
            "v": pa.array(np.repeat(idf, salt), pa.int64()),
            "is_vocab": pa.array(np.ones(n * salt, np.int8)),
        })

    def doc_tf(batch: pa.Table) -> pa.Table:
        s = batch.column(text_col).to_pandas().fillna("")
        ids = batch.column(id_col).to_numpy()
        doc_idx, codes, vocab, _ = _explode_words(s)
        v = np.int64(len(vocab))
        key = doc_idx * v + codes
        uk, tf = np.unique(key, return_counts=True)
        doc_ids = ids[(uk // v).astype(np.intp)]
        wcodes = (uk % v).astype(np.intp)
        wpk_by_code = _wpk(np.asarray(vocab, object))
        return pa.table({
            "w": pa.array(np.asarray(vocab, object)[wcodes],
                          pa.string()),
            "wpk": pa.array(wpk_by_code[wcodes], pa.int32()),
            "bkt": pa.array((doc_ids % salt).astype(np.int32),
                            pa.int32()),
            id_col: pa.array(doc_ids, pa.int64()),
            "v": pa.array(tf, pa.int64()),
            "is_vocab": pa.array(np.zeros(len(uk), np.int8)),
        })

    both = dfs.map_batches(tag_idf, batch_format="pyarrow") \
        .union(ds.map_batches(doc_tf, batch_format="pyarrow"))

    def score_block(block: pd.DataFrame) -> pd.DataFrame:
        w = block["w"].to_numpy(dtype=object)
        is_v = block["is_vocab"].to_numpy() == 1
        v = block["v"].to_numpy(dtype=np.int64)
        codes, uniques = pd.factorize(w)
        idf = np.zeros(len(uniques), np.int64)
        idf[codes[is_v]] = v[is_v]
        dmask = ~is_v
        doc = block[id_col].to_numpy(dtype=np.int64)[dmask]
        return pd.DataFrame({
            id_col: doc,
            "_dk": bucket_of(doc, num_doc_partitions),
            "term": w[dmask],
            "s": v[dmask] * idf[codes[dmask]],
        })

    scored = both.groupby(["wpk", "bkt"]).map_groups(
        score_block, batch_format="pandas")

    def topk_block(block: pd.DataFrame) -> pd.DataFrame:
        block = block.sort_values([id_col, "s", "term"],
                                  ascending=[True, False, True],
                                  kind="mergesort")
        doc = block[id_col].to_numpy()
        rank = np.arange(len(doc)) - start_of_segment(doc)
        keep = rank < k
        return pd.DataFrame({
            id_col: doc[keep],
            "term": block["term"].to_numpy()[keep],
            "tfidf_micros": block["s"].to_numpy()[keep],
            "rank": (rank[keep] + 1).astype(np.int64),
        })

    return scored.groupby("_dk").map_groups(
        topk_block, batch_format="pandas")


def bm25_search(ds, query_terms: tuple[str, ...], *, k: int = 10,
                text_col: str = "text", id_col: str = "doc_id"):
    """Top-``k`` retrieval for a fixed query: BM25-score the corpus
    (``bm25_score`` — two streaming passes, integer-micro scores) and
    keep the k best documents. The ranking never sorts the corpus:
    each scored block reduces to its LOCAL top-k (``select_k_unstable``
    — k rows per block), and only those k-per-block rows enter the
    tiny final sort. Ties break on doc_id ascending, so the result
    set is deterministic and the SQL oracle (ORDER BY score DESC,
    doc_id LIMIT k) selects the identical rows."""
    scored = bm25_score(ds, query_terms, text_col=text_col,
                        id_col=id_col)

    def local_topk(batch: pa.Table) -> pa.Table:
        idx = pc.select_k_unstable(
            batch, k, [("score_micros", "descending"),
                       (id_col, "ascending")])
        return batch.take(idx)

    small = scored.map_batches(local_topk, batch_format="pyarrow")
    return small.sort(["score_micros", id_col],
                      descending=[True, False]).limit(k)


def length_band_filter(ds, *, text_col: str = "text",
                       id_col: str = "doc_id",
                       lo_q: float = 0.1, hi_q: float = 0.9):
    """Keep documents whose whitespace-token count lies inside the
    corpus's exact [lo_q, hi_q] quantile band — the standard
    outlier-length curation filter (too-short fragments, too-long
    concatenation artifacts). The quantiles are EXACT and come from a
    value histogram (the ``token_quantiles`` shape): per-batch
    (token_count, n) partials, one groupby bounded by |distinct
    counts| (small integers at any corpus size), cumulative-count
    read-off with the DuckDB ``quantile_disc`` rule (value at 1-based
    rank ``ceil(q*n)``). The two scalar cutoffs ride the filter
    closure; the corpus itself never shuffles. Returns the kept
    (id_col, token_count) rows."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        text = batch.column(text_col)
        spaces = pc.count_substring(text, " ")
        nonempty = pc.and_(pc.is_valid(text), pc.not_equal(text, ""))
        tc = pc.if_else(nonempty, pc.add(spaces, 1),
                        pa.scalar(0, pa.int32())).cast(pa.int64())
        t = pa.table({"token_count": tc})
        g = t.group_by(["token_count"]).aggregate(
            [("token_count", "count")])
        return pa.table({
            "token_count": g.column("token_count"),
            "partial": g.column("token_count_count").cast(pa.int64()),
        })

    hist = (ds.map_batches(partial, batch_format="pyarrow")
            .groupby("token_count")
            .aggregate(Sum("partial", alias_name="n"))
            .to_pandas().sort_values("token_count"))
    vals = hist["token_count"].to_numpy()
    cum = hist["n"].to_numpy().cumsum()
    total = int(cum[-1])
    lo = int(vals[np.searchsorted(
        cum, max(1, int(np.ceil(lo_q * total))))])
    hi = int(vals[np.searchsorted(
        cum, max(1, int(np.ceil(hi_q * total))))])

    def keep(batch: pa.Table) -> pa.Table:
        text = batch.column(text_col)
        spaces = pc.count_substring(text, " ")
        nonempty = pc.and_(pc.is_valid(text), pc.not_equal(text, ""))
        tc = pc.if_else(nonempty, pc.add(spaces, 1),
                        pa.scalar(0, pa.int32())).cast(pa.int64())
        mask = pc.and_(pc.greater_equal(tc, pa.scalar(lo, pa.int64())),
                       pc.less_equal(tc, pa.scalar(hi, pa.int64())))
        out = pa.table({id_col: batch.column(id_col),
                        "token_count": tc})
        return out.filter(mask)

    return ds.map_batches(keep, batch_format="pyarrow")


def bigram_pmi(ds, *, text_col: str = "text", k: int = 30):
    """Pointwise mutual information for the corpus's top-``k`` word
    bigrams — the standard collocation-mining signal (Church & Hanks
    1990). Two streaming passes, driver state bounded by k:

    pass A: bigram counts with map-side value_counts combine → ONE
    groupby(bigram) Sum → block-local top-k → tiny final sort; only
    the k winners reach the driver (the full bigram vocabulary rides
    the shuffle as (gram, partial) pairs — the ngram_topk shape —
    never the driver).
    pass B: corpus totals (words, bigrams) and targeted unigram
    counts for the ≤2k component words (broadcast in the closure,
    the bm25 df-pass shape).

    ``pmi_micros = round(ln((c_ab/N_b) / ((c_a/N_w) * (c_b/N_w))) *
    1e6)`` with the exact expression nesting mirrored by the SQL
    oracle. Ties in the top-k break on the bigram string. Returns a
    k-row pandas DataFrame (ngram, n, pmi_micros)."""
    from ray.data.aggregate import Sum

    def bigram_partial(batch: pa.Table) -> pa.Table:
        s = batch.column(text_col).to_pandas().fillna("")
        _, grams = _ngram_strings(s, 2)
        vc = pd.Series(grams).value_counts()
        return pa.table({
            "ngram": pa.array(vc.index.to_numpy(dtype=object),
                              pa.string()),
            "partial": pa.array(vc.to_numpy(), pa.int64()),
        })

    totals = (ds.map_batches(bigram_partial, batch_format="pyarrow")
              .groupby("ngram")
              .aggregate(Sum("partial", alias_name="n")))

    def local_topk(batch: pa.Table) -> pa.Table:
        idx = pc.select_k_unstable(
            batch, k, [("n", "descending"), ("ngram", "ascending")])
        return batch.take(idx)

    top = (totals.map_batches(local_topk, batch_format="pyarrow")
           .sort(["n", "ngram"], descending=[True, False])
           .limit(k).to_pandas())
    words = sorted({w for g in top["ngram"] for w in g.split(" ")})
    widx = {w: i for i, w in enumerate(words)}

    def stats_partial(batch: pa.Table) -> pa.Table:
        s = batch.column(text_col).to_pandas().fillna("")
        doc_idx, codes, vocab, n_words = _explode_words(s)
        vs = pd.Series(np.arange(len(vocab)), index=vocab)
        counts = np.zeros(len(words), dtype=np.int64)
        for w, i in widx.items():
            code = vs.get(w, -1)
            if code >= 0:
                counts[i] = int((codes == code).sum())
        return pa.table({
            "n_words": pa.array([int(n_words.sum())], pa.int64()),
            "n_bigrams": pa.array([int((n_words - 1).sum())],
                                  pa.int64()),
            "wc": pa.array([counts.tolist()], pa.list_(pa.int64())),
        })

    nw = 0
    nb = 0
    wc = np.zeros(len(words), dtype=np.int64)
    for t in ds.map_batches(stats_partial, batch_format="pyarrow") \
            .iter_batches(batch_format="pyarrow"):
        for i in range(t.num_rows):
            nw += t.column("n_words")[i].as_py()
            nb += t.column("n_bigrams")[i].as_py()
            wc += np.array(t.column("wc")[i].as_py(), dtype=np.int64)

    nw_f, nb_f = float(nw), float(nb)
    a = np.array([widx[g.split(" ")[0]] for g in top["ngram"]])
    b = np.array([widx[g.split(" ")[1]] for g in top["ngram"]])
    cab = top["n"].to_numpy(dtype=np.float64)
    ca = wc[a].astype(np.float64)
    cb = wc[b].astype(np.float64)
    # SAME nesting as the SQL oracle — parenthesization is part of
    # the exactness contract
    pmi = np.log((cab / nb_f) / ((ca / nw_f) * (cb / nw_f)))
    return pd.DataFrame({
        "ngram": top["ngram"],
        "n": top["n"].astype(np.int64),
        "pmi_micros": np.round(pmi * 1_000_000.0).astype(np.int64),
    })


def top_words_per_lang(ds, *, text_col: str = "text",
                       lang_col: str = "lang", k: int = 10):
    """Per-language top-``k`` most frequent words — the grouped form
    of ``ngram_topk`` (corpus diagnostics: per-lang stopword mix).
    Map-side (lang, word) value_counts combine → ONE groupby Sum over
    (lang, word) → block-local per-lang top-k (each pair's total
    lives in exactly one post-groupby block, so per-block pruning is
    lossless) → final per-lang head(k) over the tiny survivor set
    (≤ k x |langs| x blocks rows). Ties break on the word string.
    Returns a pandas DataFrame (lang, word, n)."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            lang_col: batch.column(lang_col).to_pandas(),
            "word": batch.column(text_col).to_pandas().fillna("")
                    .str.split(" "),
        }).explode("word")
        g = df.groupby([lang_col, "word"], sort=False) \
            .size().reset_index(name="partial")
        g["partial"] = g["partial"].astype(np.int64)
        return _from_pandas_clean(g, preserve_index=False)

    totals = (ds.map_batches(partial, batch_format="pyarrow")
              .groupby([lang_col, "word"])
              .aggregate(Sum("partial", alias_name="n")))

    def local_topk(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        df = df.sort_values(["n", "word"], ascending=[False, True])
        return _from_pandas_clean(
            df.groupby(lang_col, sort=False).head(k),
            preserve_index=False)

    small = totals.map_batches(local_topk,
                               batch_format="pyarrow").to_pandas()
    small = small.sort_values(["n", "word"], ascending=[False, True])
    out = small.groupby(lang_col, sort=True).head(k)
    return out.sort_values([lang_col, "n", "word"],
                           ascending=[True, False, True]) \
        .reset_index(drop=True)


def length_pct_rank(ds, *, text_col: str = "text",
                    id_col: str = "doc_id"):
    """Exact PERCENT_RANK of every document's token count WITHOUT a
    global sort: the corpus-wide value histogram (bounded — token
    counts are small integers at any scale) is folded once, its
    cumulative counts broadcast in the scoring closure, and each
    batch reads its ranks off with one ``searchsorted``. Matches SQL
    ``PERCENT_RANK() OVER (ORDER BY token_count)`` = (min_rank - 1)
    / (n - 1), emitted as exact integer ``pct_ppm = cnt_below * 1e6
    // (n - 1)`` (both sides positive → floor == DuckDB ``//``).
    Returns (id_col, token_count, pct_ppm)."""
    from ray.data.aggregate import Sum

    def tc_col(batch: pa.Table):
        text = batch.column(text_col)
        spaces = pc.count_substring(text, " ")
        nonempty = pc.and_(pc.is_valid(text), pc.not_equal(text, ""))
        return pc.if_else(nonempty, pc.add(spaces, 1),
                          pa.scalar(0, pa.int32())).cast(pa.int64())

    def partial(batch: pa.Table) -> pa.Table:
        t = pa.table({"token_count": tc_col(batch)})
        g = t.group_by(["token_count"]).aggregate(
            [("token_count", "count")])
        return pa.table({
            "token_count": g.column("token_count"),
            "partial": g.column("token_count_count").cast(pa.int64()),
        })

    hist = (ds.map_batches(partial, batch_format="pyarrow")
            .groupby("token_count")
            .aggregate(Sum("partial", alias_name="n"))
            .to_pandas().sort_values("token_count"))
    vals = hist["token_count"].to_numpy(dtype=np.int64)
    counts = hist["n"].to_numpy(dtype=np.int64)
    below = np.concatenate(([0], np.cumsum(counts)[:-1]))
    total = int(counts.sum())

    def score(batch: pa.Table) -> pa.Table:
        tc = tc_col(batch).to_numpy(zero_copy_only=False)
        idx = np.searchsorted(vals, tc)
        ppm = below[idx] * 1_000_000 // max(total - 1, 1)
        return pa.table({
            id_col: batch.column(id_col),
            "token_count": pa.array(tc, pa.int64()),
            "pct_ppm": pa.array(ppm.astype(np.int64), pa.int64()),
        })

    return ds.map_batches(score, batch_format="pyarrow")


def distinct_words_per_lang(ds, *, text_col: str = "text",
                            lang_col: str = "lang"):
    """Exact per-language distinct-word (vocabulary-size) counts —
    the corpus-diversity diagnostic. Canonical exact-distinct-per-
    group shape: per-batch LOCAL (lang, word) dedup (one pandas
    drop_duplicates — the map-side combine that makes the shuffle
    proportional to the batch's distinct pairs, not its token count)
    → ONE groupby over the distinct-pair key → per-block count
    partials → a tiny groupby(lang) Sum. The word strings ride
    exactly one shuffle, already deduplicated; nothing corpus-scale
    lands on the driver. Returns (lang, n_distinct)."""
    from ray.data.aggregate import Count, Sum

    def pair_partial(batch: pa.Table) -> pa.Table:
        df = batch.select([lang_col, text_col]).to_pandas()
        w = df[text_col].fillna("").str.split(" ").explode()
        pairs = pd.DataFrame({
            "lang": df[lang_col].to_numpy(dtype=object)[
                w.index.to_numpy()],
            "word": w.to_numpy(dtype=object),
        }).drop_duplicates()
        return pa.table({
            "lang": pa.array(pairs["lang"], pa.string()),
            "word": pa.array(pairs["word"], pa.string()),
        })

    distinct_pairs = (ds.map_batches(pair_partial,
                                     batch_format="pyarrow")
                      .groupby(["lang", "word"])
                      .aggregate(Count(alias_name="_c")))

    def lang_partial(batch: pa.Table) -> pa.Table:
        g = pa.table({"lang": batch.column("lang")}) \
            .group_by(["lang"]).aggregate([("lang", "count")])
        return pa.table({
            "lang": g.column("lang"),
            "partial": g.column("lang_count").cast(pa.int64()),
        })

    return (distinct_pairs.map_batches(lang_partial,
                                       batch_format="pyarrow")
            .groupby("lang")
            .aggregate(Sum("partial", alias_name="n_distinct")))


def grouped_median(ds, *, key_col: str, val_col: str):
    """Exact per-group LOWER median of an integer column with no sort
    anywhere: map-side (key, value) partial counts → ONE groupby over
    the bounded (key × distinct-value) histogram → per-key cumulative
    scan over that bounded table (the only driver-side work). The
    lower median is the ceil(N/2)-th smallest — a deterministic
    element of the data, so the DuckDB row_number oracle matches
    exactly with no interpolation hazard. Same
    histogram-replaces-sort contract as ``length_pct_rank``: the
    histogram is |keys| × |distinct values| rows, independent of the
    corpus row count. Returns a pandas DataFrame (key, median_lo)
    sorted by key."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.select([key_col, val_col]).to_pandas()
        g = df.groupby([key_col, val_col], sort=False).size() \
            .reset_index(name="partial")
        g["partial"] = g["partial"].astype(np.int64)
        return _from_pandas_clean(g, preserve_index=False)

    hist = (ds.map_batches(partial, batch_format="pyarrow")
            .groupby([key_col, val_col])
            .aggregate(Sum("partial", alias_name="n"))
            .to_pandas())
    out = []
    for key, grp in hist.groupby(key_col, sort=True):
        grp = grp.sort_values(val_col)
        target = (int(grp["n"].sum()) + 1) // 2
        cum = grp["n"].cumsum()
        med = int(grp.loc[cum >= target, val_col].iloc[0])
        out.append((key, med))
    return pd.DataFrame(out, columns=[key_col, "median_lo"])


def grouped_gini(ds, *, key_col: str = "lang",
                 val_col: str = "n_chars"):
    """Exact per-group Gini coefficient (in floored ppm) of an integer
    column — the inequality diagnostic for corpus length balance —
    with NO sort anywhere: the same bounded (key × distinct-value)
    histogram as :func:`grouped_median`, then the rank-weighted sum
    folded per value run (a run of c copies of v starting after rank
    s contributes v·(c·s + c(c+1)/2)), all in arbitrary-precision
    Python ints on the bounded table, so nothing overflows at any
    corpus size. gini_ppm = 10^6·(2·Σrnᵢxᵢ − (n+1)·Σx) // (n·Σx) —
    tie order cannot change the sum, so the DuckDB row_number oracle
    matches exactly. Returns a pandas DataFrame (key, gini_ppm)."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.select([key_col, val_col]).to_pandas()
        g = df.groupby([key_col, val_col], sort=False).size() \
            .reset_index(name="partial")
        g["partial"] = g["partial"].astype(np.int64)
        return _from_pandas_clean(g, preserve_index=False)

    hist = (ds.map_batches(partial, batch_format="pyarrow")
            .groupby([key_col, val_col])
            .aggregate(Sum("partial", alias_name="n"))
            .to_pandas())
    out = []
    for key, grp in hist.groupby(key_col, sort=True):
        grp = grp.sort_values(val_col)
        n_total = 0
        s = 0
        s1 = 0
        for v, c in zip(grp[val_col], grp["n"]):
            v, c = int(v), int(c)
            s1 += v * (c * n_total + c * (c + 1) // 2)
            n_total += c
            s += v * c
        if s == 0:
            out.append((key, 0))
            continue
        num = 2 * s1 - (n_total + 1) * s
        out.append((key, 1_000_000 * num // (n_total * s)))
    return pd.DataFrame(out, columns=[key_col, "gini_ppm"]) \
        .astype({"gini_ppm": np.int64})


def grouped_mode(ds, *, key_col: str = "lang",
                 val_col: str = "n_chars"):
    """Exact per-group mode of an integer column (ties broken toward
    the SMALLEST value, mirroring a deterministic row_number oracle).
    Same scale shape as :func:`grouped_median`: one map-side-combined
    groupby over the bounded (key x distinct-value) histogram; the
    argmax runs on that bounded table on the driver — no corpus sort,
    no per-key Python dispatch. Returns (key, mode_val, n)."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.select([key_col, val_col]).to_pandas()
        g = df.groupby([key_col, val_col], sort=False).size() \
            .reset_index(name="partial")
        g["partial"] = g["partial"].astype(np.int64)
        return _from_pandas_clean(g, preserve_index=False)

    hist = (ds.map_batches(partial, batch_format="pyarrow")
            .groupby([key_col, val_col])
            .aggregate(Sum("partial", alias_name="n"))
            .to_pandas())
    top = (hist.sort_values([key_col, "n", val_col],
                            ascending=[True, False, True])
           .groupby(key_col, sort=True).head(1)
           .reset_index(drop=True))
    out = top.rename(columns={val_col: "mode_val"})
    out["n"] = out["n"].astype(np.int64)
    return out[[key_col, "mode_val", "n"]]


def bpe_pair_counts(ds, *, text_col: str = "text", k: int = 20):
    """First BPE-training iteration statistic: global counts of
    adjacent CHARACTER pairs within words, top-``k`` by (count desc,
    pair asc) — the merge-candidate table a byte-pair-encoding
    tokenizer trainer computes each round. Fully vectorized and
    sketch-shaped: each batch views its text as one uint8 byte array,
    masks the pairs that touch a space (so pairs never span word
    boundaries — identical to per-word adjacent pairs for
    single-space-separated ASCII text), packs survivors into
    ``a*256+b`` codes and bincounts them into a FIXED 64Ki-slot
    histogram. Batches ship one bounded histogram each (map-side
    combine to constant size — nothing corpus-scale moves); the
    driver folds and ranks. Returns a pandas DataFrame (pair, n)."""
    SPACE = 32

    def hist_partial(batch: pa.Table) -> pa.Table:
        joined = " ".join(batch.column(text_col).to_pylist())
        s = np.frombuffer(joined.encode("utf-8"), np.uint8)
        if len(s) < 2:
            counts = np.zeros(65536, np.int64)
        else:
            a, b = s[:-1], s[1:]
            mask = (a != SPACE) & (b != SPACE)
            codes = (a[mask].astype(np.int32) << 8) | b[mask]
            counts = np.bincount(codes, minlength=65536) \
                .astype(np.int64)
        nz = np.flatnonzero(counts)
        return pa.table({"code": pa.array(nz.astype(np.int64)),
                         "partial": pa.array(counts[nz], pa.int64())})

    from ray.data.aggregate import Sum
    folded = (ds.map_batches(hist_partial, batch_format="pyarrow")
              .groupby("code")
              .aggregate(Sum("partial", alias_name="n"))).to_pandas()
    folded["pair"] = [chr(c >> 8) + chr(c & 0xFF)
                      for c in folded["code"]]
    out = folded.sort_values(["n", "pair"],
                             ascending=[False, True]).head(k)
    return out[["pair", "n"]].astype({"n": np.int64}) \
        .reset_index(drop=True)


def grouped_quantiles(ds, *, key_col: str, val_col: str,
                      qs: tuple[float, ...] = (0.25, 0.5, 0.75)):
    """Exact per-group DISCRETE quantiles of an integer column with no
    sort anywhere — same histogram-replaces-sort contract as
    :func:`grouped_median`, generalized to a quantile list. The
    q-quantile is the ceil(q·N)-th smallest element (a real element
    of the data, no interpolation), so the DuckDB row_number oracle
    matches bit-for-bit. One bounded (key × distinct-value) histogram
    rides the shuffle; the per-key cumulative scan over that bounded
    grid is the only driver-side work. Returns a pandas DataFrame
    (key, q<pct>…) sorted by key."""
    import math

    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.select([key_col, val_col]).to_pandas()
        g = df.groupby([key_col, val_col], sort=False).size() \
            .reset_index(name="partial")
        g["partial"] = g["partial"].astype(np.int64)
        return _from_pandas_clean(g, preserve_index=False)

    hist = (ds.map_batches(partial, batch_format="pyarrow")
            .groupby([key_col, val_col])
            .aggregate(Sum("partial", alias_name="n"))
            .to_pandas())
    cols = [f"q{int(round(q * 100))}" for q in qs]
    out = []
    for key, grp in hist.groupby(key_col, sort=True):
        grp = grp.sort_values(val_col)
        total = int(grp["n"].sum())
        cum = grp["n"].cumsum()
        row = [key]
        for q in qs:
            target = max(1, math.ceil(q * total))
            row.append(int(grp.loc[cum >= target, val_col].iloc[0]))
        out.append(tuple(row))
    df = pd.DataFrame(out, columns=[key_col] + cols)
    return df.astype({c: np.int64 for c in cols})


class AhoCorasick:
    """From-scratch Aho–Corasick automaton (Aho & Corasick, CACM 1975)
    — multi-pattern literal matching in ONE pass over the text,
    O(len(text) + matches) regardless of how many patterns the
    blocklist holds. This is the scale path for UT1-style blocklists
    (10^5–10^6 phrases), where the per-pattern Arrow kernel's
    O(patterns × text) scan stops being viable; the automaton is
    built ONCE per actor and shared across batches.

    Counting semantics: ALL occurrences (including overlapping ones
    across DIFFERENT patterns — 'he' inside 'she' counts for both),
    then per-pattern totals are reduced to the same NON-overlapping
    count the substring kernel reports via floor division by the
    pattern's self-overlap period when needed — instead we simply
    re-count non-overlapping matches per pattern from the match
    positions (greedy left-to-right), so both engines agree exactly.
    """

    def __init__(self, patterns: list[str]):
        if len(set(patterns)) != len(patterns):
            raise ValueError("duplicate patterns in blocklist")
        self.patterns = list(patterns)
        # trie: list of dicts char -> state; output: pattern indexes
        self.goto: list[dict[str, int]] = [{}]
        self.out: list[list[int]] = [[]]
        for pi, p in enumerate(self.patterns):
            if not p:
                raise ValueError("empty pattern")
            s = 0
            for ch in p:
                nxt = self.goto[s].get(ch)
                if nxt is None:
                    nxt = len(self.goto)
                    self.goto[s][ch] = nxt
                    self.goto.append({})
                    self.out.append([])
                s = nxt
            self.out[s].append(pi)
        # BFS failure links; merge output sets along failures
        from collections import deque
        self.fail = [0] * len(self.goto)
        q = deque(self.goto[0].values())
        while q:
            s = q.popleft()
            for ch, t in self.goto[s].items():
                q.append(t)
                f = self.fail[s]
                while f and ch not in self.goto[f]:
                    f = self.fail[f]
                self.fail[t] = self.goto[f].get(ch, 0) \
                    if self.goto[f].get(ch, 0) != t else 0
                self.out[t] = self.out[t] + self.out[self.fail[t]]
        self._plen = [len(p) for p in self.patterns]

    def iter_matches(self, text: str):
        """Yield (end_index_exclusive, pattern_index) for EVERY
        occurrence of every pattern."""
        s = 0
        for i, ch in enumerate(text):
            while s and ch not in self.goto[s]:
                s = self.fail[s]
            s = self.goto[s].get(ch, 0)
            for pi in self.out[s]:
                yield i + 1, pi

    def count_nonoverlapping(self, text: str) -> dict[int, int]:
        """Per-pattern NON-overlapping occurrence counts (greedy
        left-to-right — REPLACE()/count_substring semantics): from
        the all-occurrence stream, accept a match only if it starts
        at or after the previous accepted match's end FOR THE SAME
        pattern."""
        counts: dict[int, int] = {}
        next_ok: dict[int, int] = {}
        for end, pi in self.iter_matches(text):
            start = end - self._plen[pi]
            if start >= next_ok.get(pi, 0):
                counts[pi] = counts.get(pi, 0) + 1
                next_ok[pi] = end
        return counts


def blocklist_match(ds, *, text_col: str = "text",
                    id_col: str = "doc_id",
                    patterns: list[str],
                    engine: str = "substring"):
    """Blocklist phrase matching — the curation gate that drops or
    flags documents containing banned phrases (UT1 blocklists, spam
    markers, boilerplate signatures). One output row per (doc,
    pattern) with the NON-overlapping occurrence count, hits only.

    Two engines, identical results (pytest pins their equality):
    * ``substring`` — one zero-copy Arrow ``pc.count_substring``
      kernel pass per pattern. Right for bounded blocklists (each
      pass is C over the whole column); this is the oracle-checked
      path since DuckDB's LENGTH/REPLACE replay is exact.
    * ``aho`` — the from-scratch :class:`AhoCorasick` automaton,
      built once per ACTOR (not per batch), one pass over the text
      regardless of pattern count. The scale path when the blocklist
      is 10^5+ phrases and per-pattern passes stop being viable.

    No shuffle either way — the decision is per-row; compose with a
    semi/anti join on doc_id to actually drop documents."""
    pats = list(patterns)
    if engine == "substring":
        def hits(batch: pa.Table) -> pa.Table:
            ids = batch.column(id_col)
            col = batch.column(text_col)
            out_ids, out_pat, out_n = [], [], []
            for p in pats:
                n = pc.count_substring(col, p)
                mask = pc.greater(n, 0)
                if pc.any(mask).as_py():
                    out_ids.append(pc.filter(ids, mask))
                    kept = pc.filter(n, mask).cast(pa.int64())
                    out_pat.append(pa.array([p] * len(kept)))
                    out_n.append(kept)
            if not out_ids:
                return pa.table({id_col: pa.array([], ids.type),
                                 "pattern": pa.array([], pa.string()),
                                 "n": pa.array([], pa.int64())})
            return pa.table({
                id_col: pa.concat_arrays(
                    [a.combine_chunks() if isinstance(a, pa.ChunkedArray)
                     else a for a in out_ids]),
                "pattern": pa.concat_arrays(out_pat),
                "n": pa.concat_arrays(
                    [a.combine_chunks() if isinstance(a, pa.ChunkedArray)
                     else a for a in out_n]),
            })

        return ds.map_batches(hits, batch_format="pyarrow")

    if engine != "aho":
        raise ValueError(f"unknown engine {engine!r}")

    class AhoStage:
        def __init__(self):
            self.ac = AhoCorasick(pats)      # once per actor

        def __call__(self, batch: pa.Table) -> pa.Table:
            out_ids, out_pat, out_n = [], [], []
            for i, t in zip(batch.column(id_col).to_pylist(),
                            batch.column(text_col).to_pylist()):
                for pi, n in sorted(
                        self.ac.count_nonoverlapping(t or "").items()):
                    out_ids.append(i)
                    out_pat.append(pats[pi])
                    out_n.append(n)
            return pa.table({
                id_col: pa.array(out_ids,
                                 batch.column(id_col).type),
                "pattern": pa.array(out_pat, pa.string()),
                "n": pa.array(out_n, pa.int64()),
            })

    return ds.map_batches(AhoStage, batch_format="pyarrow",
                          concurrency=(1, 4))


def _apply_bpe_merges(word: str, merges: list[tuple[str, str]]) \
        -> list[str]:
    """Greedy left-to-right application of ``merges`` IN ORDER to a
    word's character sequence — one full pass per merge, a matched
    pair consumed and scanning resumed AFTER it (so in a run of
    overlapping matches the 1st, 3rd, ... win: the run-parity rule
    the SQL oracle replays with window functions)."""
    toks: list[str] = list(word)
    for a, b in merges:
        out: list[str] = []
        i = 0
        n = len(toks)
        while i < n:
            if i + 1 < n and toks[i] == a and toks[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(toks[i])
                i += 1
        toks = out
    return toks


def bpe_learn(ds, *, text_col: str = "text", rounds: int = 3):
    """Distributed BPE tokenizer TRAINING (Sennrich et al. 2016) for a
    fixed number of merge rounds — the step beyond
    :func:`bpe_pair_counts`' single statistic: each round counts
    adjacent token pairs over the whole corpus (with all merges so
    far applied), adopts the argmax (count desc, pair asc), and the
    next round re-tokenizes with the grown merge list. Returns a
    pandas DataFrame (step, lhs, rhs, n) — one row per adopted merge.

    Scale shape per round: ONE streaming pass over the corpus; each
    batch dedups its words (np.unique — Zipf makes distinct words per
    batch ≪ tokens), applies the ≤ ``rounds`` merges to the distinct
    words only, and emits a map-side-combined (lhs, rhs, partial)
    table bounded by the token-pair vocabulary; the groupby shuffles
    only those bounded partials and the driver holds one aggregated
    pair table per round (same contract as ``ngram_topk``). Merges
    broadcast via closure (a handful of strings). ``rounds``
    sequential passes total — the trainer is inherently iterative;
    at 100 TB you cache the word-count table once and iterate over
    THAT (a vocab-bounded dataset), which this shape degrades to
    when ``ds`` is already a (word, count) table."""
    from ray.data.aggregate import Sum

    merges: list[tuple[str, str]] = []
    out_rows = []
    for step in range(1, rounds + 1):
        frozen = list(merges)

        def pair_partials(batch: pa.Table,
                          _m=frozen) -> pa.Table:
            texts = batch.column(text_col).to_pylist()
            all_words = " ".join(t or "" for t in texts).split(" ")
            words, counts = np.unique(
                [w for w in all_words if w], return_counts=True)
            acc: dict[tuple[str, str], int] = {}
            for w, cnt in zip(words, counts):
                toks = _apply_bpe_merges(w, _m)
                for a, b in zip(toks, toks[1:]):
                    acc[(a, b)] = acc.get((a, b), 0) + int(cnt)
            if not acc:
                return pa.table({"lhs": pa.array([], pa.string()),
                                 "rhs": pa.array([], pa.string()),
                                 "partial": pa.array([], pa.int64())})
            ks = list(acc)
            return pa.table({
                "lhs": pa.array([k[0] for k in ks], pa.string()),
                "rhs": pa.array([k[1] for k in ks], pa.string()),
                "partial": pa.array([acc[k] for k in ks], pa.int64()),
            })

        folded = (ds.map_batches(pair_partials, batch_format="pyarrow")
                  .groupby(["lhs", "rhs"])
                  .aggregate(Sum("partial", alias_name="n"))
                  .to_pandas())
        if folded.empty:
            break
        folded = folded.sort_values(["n", "lhs", "rhs"],
                                    ascending=[False, True, True])
        top = folded.iloc[0]
        merges.append((str(top["lhs"]), str(top["rhs"])))
        out_rows.append((step, str(top["lhs"]), str(top["rhs"]),
                         int(top["n"])))
    df = pd.DataFrame(out_rows, columns=["step", "lhs", "rhs", "n"])
    return df.astype({"step": np.int64, "n": np.int64})


class _CachedMergeLens:
    """Per-actor ``word -> post-BPE token count`` cache around
    ``_apply_bpe_merges`` — shared by :func:`bpe_encode_counts` and
    :func:`tokenizer_fertility` so the cached-apply rule has exactly
    one implementation."""

    def __init__(self, merges):
        self.merges = [(str(a), str(b)) for a, b in merges]
        self.cache: dict[str, int] = {}

    def ntoks(self, w: str) -> int:
        n = self.cache.get(w)
        if n is None:
            n = len(_apply_bpe_merges(w, self.merges))
            self.cache[w] = n
        return n

    def ntoks_of(self, uniq: np.ndarray) -> np.ndarray:
        return np.fromiter((self.ntoks(u) for u in uniq),
                           np.int64, len(uniq))


def bpe_encode_counts(ds, merges, *, text_col: str = "text",
                      id_col: str = "doc_id", concurrency=(1, 4)):
    """Distributed BPE ENCODING — the apply side of
    :func:`bpe_learn` (Sennrich et al. 2016): tokenize every document
    with a FIXED ordered merge list and emit its post-BPE token
    count — the token-budget accounting a training pipeline runs over
    the whole corpus once the tokenizer is frozen.

    Scale shape: NO shuffle — the merge list broadcasts by closure (a
    frozen tokenizer is a few 10k strings) and the decision is
    doc-local. The stage is an ACTOR POOL whose per-actor
    ``word -> token-count`` cache persists across batches: each batch
    tokenizes only its UNSEEN distinct words (Zipf: after warmup the
    cache absorbs nearly everything), then one ``np.bincount`` sums
    per-doc counts vectorized. Same greedy left-to-right run-parity
    application as training (``_apply_bpe_merges``), so the SQL
    oracle replays it with the identical window-function rule.
    Returns ``(doc_id, n_bpe_tokens)`` for docs with >= 1 token.
    """
    frozen = [(str(a), str(b)) for a, b in merges]

    class Encoder:
        def __init__(self):
            self.lens = _CachedMergeLens(frozen)

        def __call__(self, batch: pa.Table) -> pa.Table:
            s = batch.column(text_col).to_pandas().fillna("")
            ids = batch.column(id_col).cast(pa.int64()) \
                .to_numpy(zero_copy_only=False)
            ex = s.str.split(" ").explode()
            di = ex.index.to_numpy(dtype=np.int64)
            w = ex.to_numpy(dtype=object)
            mask = pd.notna(w) & (w != "")
            w, di = w[mask], di[mask]
            if len(w) == 0:
                return pa.table({
                    id_col: pa.array([], pa.int64()),
                    "n_bpe_tokens": pa.array([], pa.int64())})
            uniq, inv = np.unique(w, return_inverse=True)
            ntoks = self.lens.ntoks_of(uniq)
            per_doc = np.bincount(di, weights=ntoks[inv],
                                  minlength=len(s)).astype(np.int64)
            keep = per_doc > 0
            return pa.table({
                id_col: pa.array(ids[keep], pa.int64()),
                "n_bpe_tokens": pa.array(per_doc[keep], pa.int64()),
            })

    return ds.map_batches(Encoder, batch_format="pyarrow",
                          concurrency=concurrency)


def host_reputation(ds, weights, *, host_col: str = "source",
                    text_col: str = "text", id_col: str = "doc_id"):
    """Host-level quality prior (the RefinedWeb/C4 practice of
    filtering by SITE, not just page: a page inherits its host's
    aggregate quality) — every document annotated with its host's
    mean classifier score in exact integer micros.

    Two stages, both bounded: (1) the hashed linear classifier kernel
    carries the host column THROUGH its output (one corpus scan — no
    id-keyed re-attach fold), then per-batch (host, score-sum, n)
    partials fold through ONE hosts-scale groupby; (2) the host table
    (hosts × 3 ints — tiny next to the corpus by definition)
    broadcasts once via ``ray.put`` and a pure map annotates each
    doc. A null host normalizes to ``''`` EXPLICITLY (one documented
    bucket — never a silent merge through a sentinel). Mean is
    ``(sum · 10^6) // n`` — exact, order-free, oracle-replayable.
    Returns ``(doc_id, host, score, host_score_micros)``.
    """
    import ray
    from ray.data.aggregate import Sum

    scored = hashed_linear_score(ds, weights, text_col=text_col,
                                 id_col=id_col,
                                 passthrough_cols=(host_col,))

    def project(batch: pa.Table) -> pa.Table:
        host = batch.column(host_col).cast(pa.string())
        if isinstance(host, pa.ChunkedArray):
            host = host.combine_chunks()
        return pa.table({
            id_col: batch.column(id_col),
            "score": batch.column("score"),
            "host": host.fill_null(""),
        })

    # 3 int/str columns; materialized so the host fold and the final
    # annotate pass don't each re-run the classifier scan
    both = scored.map_batches(project, batch_format="pyarrow") \
        .materialize()

    def host_partial(batch: pa.Table) -> pa.Table:
        import pandas as pd
        df = pd.DataFrame({
            "host": batch.column("host").to_numpy(
                zero_copy_only=False),
            "s": batch.column("score").to_numpy(
                zero_copy_only=False).astype(np.int64)})
        g = df.groupby("host", sort=False).agg(
            ps=("s", "sum"), pn=("s", "size")).reset_index()
        return pa.table({
            "host": pa.array(g["host"].to_numpy(object),
                             pa.string()),
            "ps": pa.array(g["ps"].to_numpy(np.int64), pa.int64()),
            "pn": pa.array(g["pn"].to_numpy(np.int64), pa.int64()),
        })

    folded = both.map_batches(host_partial, batch_format="pyarrow") \
        .groupby("host") \
        .aggregate(Sum("ps", alias_name="s"),
                   Sum("pn", alias_name="n"))

    table = {}
    for t in folded.iter_batches(batch_format="pyarrow"):
        for h, s, n in zip(t.column("host").to_pylist(),
                           t.column("s").to_pylist(),
                           t.column("n").to_pylist()):
            # TRUNC-toward-zero division: DuckDB's integer //
            # truncates (-7//2 = -3) while python floors — same
            # explicit-sign rule as similarity.kmeans_mean_step
            q = (abs(s) * 1_000_000) // n
            table[h] = q if s >= 0 else -q
    means_ref = ray.put(table)

    def annotate(batch: pa.Table, _m=means_ref) -> pa.Table:
        lut = ray.get(_m)
        hs = batch.column("host").to_pylist()
        return pa.table({
            id_col: batch.column(id_col),
            "host": batch.column("host"),
            "score": batch.column("score"),
            "host_score_micros": pa.array(
                [lut[h] for h in hs], pa.int64()),
        })

    return both.map_batches(annotate, batch_format="pyarrow")


def c4_line_filter(ds, *, text_col: str = "page_text",
                   id_col: str = "doc_id", min_words: int = 3,
                   min_kept_lines: int = 3,
                   banned_line: tuple[str, ...] = ("javascript",),
                   banned_page: tuple[str, ...] = ("lorem ipsum",),
                   terminal: tuple[str, ...] = (".", "!", "?", '"')):
    """C4 line-level cleaning (Raffel et al. 2020 §2.2) — the rule
    set that produced C4 from Common Crawl: keep a LINE only if it
    ends in terminal punctuation, has at least ``min_words`` words,
    and contains no banned phrase; drop the whole PAGE if its raw
    text contains a page-level banned phrase ("lorem ipsum") or
    fewer than ``min_kept_lines`` lines survive.

    Pure per-batch stage, NO shuffle (every rule is a function of the
    row): one pandas line explode, vectorized endswith / wordcount /
    contains masks, one ``np.bincount`` per doc, and an index-grouped
    join to rebuild the cleaned text. Returns one row per input doc:
    ``(doc_id, n_lines, n_kept_lines, page_kept 0/1, kept_text)``
    (kept_text is '' for dropped pages — the audit row survives so
    drop rates are countable downstream).
    """

    def fn(batch: pa.Table) -> pa.Table:
        s = batch.column(text_col).to_pandas().fillna("")
        ids = batch.column(id_col).cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        n = len(s)
        lines = s.str.split("\n").explode()
        li = lines.index.to_numpy(dtype=np.int64)
        lv = lines.fillna("").astype(str)
        ends_ok = np.zeros(len(lv), bool)
        for t in terminal:
            ends_ok |= lv.str.endswith(t).to_numpy()
        nonempty = (lv.str.len() > 0).to_numpy()
        nw = lv.str.count(" ").to_numpy(dtype=np.int64) + nonempty
        banned = np.zeros(len(lv), bool)
        for b in banned_line:
            banned |= lv.str.contains(b, regex=False).to_numpy()
        keep_line = ends_ok & (nw >= min_words) & ~banned
        page_banned = np.zeros(n, bool)
        for b in banned_page:
            page_banned |= s.str.contains(b, regex=False).to_numpy()
        n_lines = np.bincount(li, minlength=n).astype(np.int64)
        n_kept = np.bincount(li[keep_line],
                             minlength=n).astype(np.int64)
        page_kept = (~page_banned) & (n_kept >= min_kept_lines)
        joined = lv[keep_line].groupby(level=0).agg("\n".join)
        ktext = np.full(n, "", dtype=object)
        ktext[joined.index.to_numpy(dtype=np.int64)] = \
            joined.to_numpy(dtype=object)
        ktext[~page_kept] = ""
        return pa.table({
            id_col: pa.array(ids, pa.int64()),
            "n_lines": pa.array(n_lines, pa.int64()),
            "n_kept_lines": pa.array(n_kept, pa.int64()),
            "page_kept": pa.array(page_kept.astype(np.int64),
                                  pa.int64()),
            "kept_text": pa.array(ktext, pa.string()),
        })

    return ds.map_batches(fn, batch_format="pyarrow")


def tokenizer_fertility(ds, merges, *, text_col: str = "text",
                        lang_col: str = "lang", concurrency=(1, 4)):
    """Per-language tokenizer FERTILITY — BPE tokens emitted per
    whitespace word (the standard multilingual-tokenizer equity
    metric: a tokenizer trained on English over-segments other
    languages, inflating their effective sequence length and
    training cost; fertility per language is how that bias is
    measured and reported).

    Scale shape: the same per-actor cached merge application as
    :func:`bpe_encode_counts`, but each batch collapses straight to
    per-LANGUAGE integer partials (bpe token sum, word sum) — a
    languages-sized table rides the ONE bounded groupby, never
    doc-scale rows. Fertility is reported as exact integer ppm
    (``bpe·10^6 // words``) so the SQL oracle matches bit-for-bit.
    Returns ``(lang, bpe_tokens, ws_tokens, fertility_ppm)``.
    """
    from ray.data.aggregate import Sum

    frozen = [(str(a), str(b)) for a, b in merges]

    class Partials:
        def __init__(self):
            self.lens = _CachedMergeLens(frozen)

        def __call__(self, batch: pa.Table) -> pa.Table:
            s = batch.column(text_col).to_pandas().fillna("")
            # null langs -> "" (factorize would code them -1 and
            # np.bincount rejects negative indices)
            langs = batch.column(lang_col).to_pandas().fillna("") \
                .to_numpy(dtype=object)
            ex = s.str.split(" ").explode()
            di = ex.index.to_numpy(dtype=np.int64)
            w = ex.to_numpy(dtype=object)
            mask = pd.notna(w) & (w != "")
            w, di = w[mask], di[mask]
            if len(w) == 0:
                return pa.table({
                    lang_col: pa.array([], pa.string()),
                    "bpe_partial": pa.array([], pa.int64()),
                    "ws_partial": pa.array([], pa.int64())})
            uniq, inv = np.unique(w, return_inverse=True)
            ntoks = self.lens.ntoks_of(uniq)
            lcodes, luniq = pd.factorize(langs[di])
            bpe = np.bincount(lcodes, weights=ntoks[inv],
                              minlength=len(luniq)).astype(np.int64)
            ws = np.bincount(lcodes, minlength=len(luniq)) \
                .astype(np.int64)
            return pa.table({
                lang_col: pa.array(np.asarray(luniq, object),
                                   pa.string()),
                "bpe_partial": pa.array(bpe, pa.int64()),
                "ws_partial": pa.array(ws, pa.int64()),
            })

    folded = (ds.map_batches(Partials, batch_format="pyarrow",
                             concurrency=concurrency)
              .groupby(lang_col)
              .aggregate(Sum("bpe_partial", alias_name="bpe_tokens"),
                         Sum("ws_partial", alias_name="ws_tokens")))

    def ratio(batch: pa.Table) -> pa.Table:
        b = batch.column("bpe_tokens").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        w = batch.column("ws_tokens").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        return batch.append_column(
            "fertility_ppm",
            pa.array(b * 1_000_000 // np.maximum(w, 1), pa.int64()))

    return folded.map_batches(ratio, batch_format="pyarrow")


def hashed_linear_score(ds, weights, *, text_col: str = "text",
                        id_col: str = "doc_id",
                        threshold: int = 0, concurrency=(1, 4),
                        passthrough_cols: tuple = ()):
    """fastText-style linear quality-classifier INFERENCE (Joulin et
    al. 2016, arXiv:1607.01759): hash every token into the weight
    vector's bucket space (md5, the hashing trick), score the doc as
    the INTEGER dot product of its bucket counts with ``weights``,
    and gate on ``score > threshold`` — the shape of every learned
    quality filter (CCNet's fastText LM filter, RefinedWeb's URL
    scorer) at inference time. Weights here stream in as a plain
    int64 vector (in production the trained model's quantized linear
    layer); integer arithmetic keeps the score order-free and
    bit-reproducible by the SQL oracle.

    Scale shape: NO shuffle — the decision is doc-local; the weight
    vector broadcasts by closure; the stage is an ACTOR POOL whose
    per-actor ``word -> bucket`` md5 cache persists across batches
    (Zipf). Per batch: one explode, md5 on unseen distinct words
    only, one weighted ``np.bincount`` per doc. Returns
    ``(doc_id, score, label)`` with label keep/drop;
    ``passthrough_cols`` ride along unchanged (so a caller needing
    score + another source column — host_reputation — gets both in
    ONE corpus scan instead of re-attaching via an id-keyed fold).
    """
    wvec = np.asarray(weights, dtype=np.int64)
    n_buckets = len(wvec)

    class Scorer:
        def __init__(self):
            self.cache: dict[str, int] = {}

        def _bucket(self, w: str) -> int:
            b = self.cache.get(w)
            if b is None:
                b = int(hashlib.md5(w.encode()).hexdigest()[:8],
                        16) % n_buckets
                self.cache[w] = b
            return b

        def __call__(self, batch: pa.Table) -> pa.Table:
            s = batch.column(text_col).to_pandas().fillna("")
            ids = batch.column(id_col).cast(pa.int64()) \
                .to_numpy(zero_copy_only=False)
            ex = s.str.split(" ").explode()
            di = ex.index.to_numpy(dtype=np.int64)
            w = ex.to_numpy(dtype=object)
            mask = pd.notna(w) & (w != "")
            w, di = w[mask], di[mask]
            score = np.zeros(len(s), np.int64)
            if len(w):
                uniq, inv = np.unique(w, return_inverse=True)
                wb = np.fromiter((wvec[self._bucket(u)]
                                  for u in uniq),
                                 np.int64, len(uniq))
                score = np.bincount(di, weights=wb[inv],
                                    minlength=len(s)) \
                    .astype(np.int64)
            label = np.where(score > threshold, "keep", "drop")
            out = {
                id_col: pa.array(ids, pa.int64()),
                "score": pa.array(score, pa.int64()),
                "label": pa.array(label.tolist(), pa.string()),
            }
            for c in passthrough_cols:
                out[c] = batch.column(c)
            return pa.table(out)

    return ds.map_batches(Scorer, batch_format="pyarrow",
                          concurrency=concurrency)


def compression_ratio_batch(batch: pa.Table, *,
                            text_col: str = "text",
                            id_col: str = "doc_id",
                            level: int = 6) -> pa.Table:
    """zlib compression-ratio quality signal (the C4/RefinedWeb-family
    heuristic: highly repetitive or templated text compresses far
    below ~smaller-is-more-redundant thresholds; near-random text
    approaches or exceeds 1.0). Emits exact integers only —
    ``raw_len``, ``comp_len`` (zlib level ``level``), and
    ``ratio_permille = comp_len * 1000 // raw_len`` — so results are
    bit-stable across runs and partitionings (floats never enter).
    Pure per-batch stage, no shuffle; the per-row zlib call IS the
    work (C-backed DEFLATE). No SQL oracle by nature (DuckDB has no
    zlib) — the driver records rows-only and pytest pins exact
    recomputation plus the repetitive-vs-random ordering."""
    import zlib
    texts = batch.column(text_col).to_pylist()
    raw, comp, perm = [], [], []
    for t in texts:
        b = (t or "").encode("utf-8")
        c = len(zlib.compress(b, level))
        raw.append(len(b))
        comp.append(c)
        perm.append(c * 1000 // len(b) if b else 0)
    return pa.table({
        id_col: batch.column(id_col),
        "raw_len": pa.array(raw, pa.int64()),
        "comp_len": pa.array(comp, pa.int64()),
        "ratio_permille": pa.array(perm, pa.int64()),
    })


def fix_mojibake(s: str, *, max_rounds: int = 3) \
        -> tuple[str, bool]:
    """ftfy-style repair of UTF-8-read-as-legacy-charset mojibake
    ('cafÃ©' → 'café'): if the string survives a latin-1 (then
    cp1252) re-encode AND those bytes decode as valid UTF-8 to a
    STRICTLY SHORTER string (real multi-byte sequences were present —
    pure ASCII round-trips equal-length and is never touched),
    adopt the decode. Iterates to fixpoint (``max_rounds``) so
    double-encoded text unwinds too. Deterministic; the ambiguity
    (text that legitimately spells 'Ã©') resolves toward repair, the
    standard ftfy trade-off."""
    fixed = False
    for _ in range(max_rounds):
        repaired = None
        for enc in ("latin-1", "cp1252"):
            try:
                b = s.encode(enc)
            except UnicodeEncodeError:
                continue
            try:
                d = b.decode("utf-8")
            except UnicodeDecodeError:
                continue
            if len(d) < len(s):
                repaired = d
            break          # encodable but not shorter: genuine text
        if repaired is None:
            return s, fixed
        s, fixed = repaired, True
    return s, fixed


def mojibake_repair(ds, *, text_col: str = "text",
                    id_col: str = "doc_id"):
    """Per-batch mojibake detection + repair over a text column —
    the encoding-repair gate a crawl corpus needs before tokenization
    (double-decoded pages are common in CC). No shuffle; emits
    (id, fixed, was_mojibake)."""

    def fn(batch: pa.Table) -> pa.Table:
        outs, flags = [], []
        for t in batch.column(text_col).to_pylist():
            f, was = fix_mojibake(t or "")
            outs.append(f)
            flags.append(was)
        return pa.table({
            id_col: batch.column(id_col),
            "fixed": pa.array(outs, pa.string()),
            "was_mojibake": pa.array(flags, pa.bool_()),
        })

    return ds.map_batches(fn, batch_format="pyarrow")


def boilerplate_strip(ds, *, host_col: str = "host",
                      text_col: str = "text",
                      id_col: str = "doc_id",
                      min_ratio_pct: int = 50,
                      min_pages: int = 3):
    """CCNet-style per-host boilerplate LINE removal: a line occurring
    in at least ``min_ratio_pct``% of a host's pages is template
    chrome (nav, header, footer, cookie banner) and is stripped from
    every page of that host; rare lines — the content — survive.

    Scale shape: the document side NEVER shuffles. Two skinny
    aggregates build the template table — (host, line_md5) DISTINCT-
    document counts and per-host page counts (map-side per-doc dedup
    first, so only hash rows ride the shuffles) — then the template
    table (hosts × ~template size, tiny next to the corpus by
    construction: it's the repeated chrome) is collected and
    broadcast via ``ray.put``; a second pass filters each doc's lines
    locally and rejoins with newline. For corpora where even the
    template table outgrows broadcast, replace the broadcast with a
    (host, hash) hash-join — the counts plumbing is unchanged.

    ``min_pages`` floors the statistics: a host with fewer pages has
    no reliable template signal (with 1 page EVERY line is 100%
    frequent and the whole document would vanish; long-tail
    single-page hosts dominate real crawls), so such hosts pass
    through untouched. Returns (id, cleaned, n_stripped)."""
    import hashlib

    import ray
    from ray.data.aggregate import Sum

    def line_hash_rows(batch: pa.Table) -> pa.Table:
        hosts_out, hashes = [], []
        for h, t in zip(batch.column(host_col).to_pylist(),
                        batch.column(text_col).to_pylist()):
            for ln in set((t or "").split("\n")):   # per-doc dedup
                hosts_out.append(h)
                hashes.append(hashlib.md5(
                    ln.encode("utf-8")).hexdigest())
        return pa.table({
            "host": pa.array(hosts_out, pa.string()),
            "lh": pa.array(hashes, pa.string()),
            "n": pa.array(np.ones(len(hashes), np.int64)),
        })

    line_counts = (ds.map_batches(line_hash_rows,
                                  batch_format="pyarrow")
                   .groupby(["host", "lh"])
                   .aggregate(Sum("n", alias_name="docs")))

    def page_rows(batch: pa.Table) -> pa.Table:
        return pa.table({
            "host": batch.column(host_col),
            "p": pa.array(np.ones(batch.num_rows, np.int64)),
        })

    page_counts = {
        r["host"]: r["p_sum"] if "p_sum" in r else r["sum(p)"]
        for r in (ds.map_batches(page_rows, batch_format="pyarrow")
                  .groupby("host")
                  .aggregate(Sum("p", alias_name="p_sum"))
                  .take_all())}

    # threshold DISTRIBUTED (the full (host, line) count table is
    # corpus-scale — only the bounded template survivors reach the
    # driver); page_counts is host-scale, broadcast once
    pages_ref = ray.put(page_counts)

    def thresh(batch: pa.Table) -> pa.Table:
        pages = ray.get(pages_ref)
        hosts = batch.column("host").to_pylist()
        docs = batch.column("docs").to_numpy(zero_copy_only=False)
        keep = [bool(pages.get(h, 0) >= min_pages
                     and 100 * int(d) >= min_ratio_pct * pages[h])
                for h, d in zip(hosts, docs)]
        return batch.filter(pa.array(keep))

    template = {(r["host"], r["lh"])
                for r in line_counts.map_batches(
                    thresh, batch_format="pyarrow").take_all()}
    template_ref = ray.put(template)

    def strip(batch: pa.Table) -> pa.Table:
        tpl = ray.get(template_ref)
        cleaned, stripped = [], []
        for h, t in zip(batch.column(host_col).to_pylist(),
                        batch.column(text_col).to_pylist()):
            kept, n_drop = [], 0
            for ln in (t or "").split("\n"):
                lh = hashlib.md5(ln.encode("utf-8")).hexdigest()
                if (h, lh) in tpl:
                    n_drop += 1
                else:
                    kept.append(ln)
            cleaned.append("\n".join(kept))
            stripped.append(n_drop)
        return pa.table({
            id_col: batch.column(id_col),
            "cleaned": pa.array(cleaned, pa.string()),
            "n_stripped": pa.array(stripped, pa.int64()),
        })

    return ds.map_batches(strip, batch_format="pyarrow")
