"""Exact data-mixing: largest-remainder quota allocation + a
DISTRIBUTED ORDER-STATISTIC sampler that keeps exactly ``quota[lang]``
documents per language — the "mix 40% en / 25 de / ..." step every
pretraining data plan ends with, done exactly (not in expectation)
and WITHOUT a corpus sort.

The selection rule is deterministic: per language, keep the quota
documents with the SMALLEST ``(md5(str(doc_id)) hexdigest, doc_id)``
key — reproducible across runs/engines and uniform over docs, and
expressible as ``ROW_NUMBER() OVER (PARTITION BY lang ORDER BY
md5(CAST(doc_id AS VARCHAR)), doc_id) <= quota`` for the oracle.

Scale shape — the classic two-pass threshold selection (exact
distributed order statistics; cf. Munro-Paterson style selection),
no shuffle of payloads and NO global sort anywhere:

1. one pass of per-batch (lang, 16-bit-md5-prefix) count partials →
   a BOUNDED fold (≤ |langs| × 65536 int rows);
2. the driver walks each language's prefix histogram to the bucket
   containing the quota boundary;
3. one pass collects ONLY the boundary bucket's members
   (≈ corpus/65536 rows per language — driver-safe at any corpus
   size; widen the prefix to 24 bits at 10^12 docs) and sorts them
   exactly to pin the threshold key;
4. a final pure map keeps rows below the per-language threshold.

Every kept set is EXACTLY quota-sized; quotas come from the
largest-remainder method over integer permille weights (the standard
apportionment rule: floor allocations, then +1 to the largest
fractional remainders, ties by language name) — also replayed
exactly by the SQL oracle.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa


def largest_remainder(total: int, weights_permille: dict[str, int]
                      ) -> dict[str, int]:
    """Apportion ``total`` into integer quotas proportional to
    permille weights: base = floor(total·w/1000); the remainder goes
    +1 at a time to the largest ``(total·w) % 1000`` (tie: language
    name ascending). Weights must sum to 1000."""
    if sum(weights_permille.values()) != 1000:
        raise ValueError("weights must sum to 1000 permille")
    base = {k: total * w // 1000 for k, w in weights_permille.items()}
    fr = sorted(weights_permille,
                key=lambda k: (-(total * weights_permille[k] % 1000),
                               k))
    rem = total - sum(base.values())
    for k in fr[:rem]:
        base[k] += 1
    return base


def _md5_prefix_and_hex(ids: np.ndarray):
    hexes = [hashlib.md5(str(i).encode()).hexdigest() for i in ids]
    pref = np.array([int(h[:4], 16) for h in hexes], np.int64)
    return pref, hexes


def mix_sample(ds, weights_permille: dict[str, int], *,
               frac_permille: int = 100, lang_col: str = "lang",
               id_col: str = "doc_id"):
    """Keep EXACTLY ``largest_remainder(floor(N·frac/1000), weights)``
    docs per language, chosen by smallest (md5 hex, id). Returns the
    kept ``(id, lang)`` rows. Raises if a language's quota exceeds
    its availability (choose weights/frac inside the corpus mix —
    silent capping would skew the mixture)."""
    from ray.data.aggregate import Sum

    # pass 1: (lang, prefix) histogram partials → bounded fold
    def partial(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        langs = batch.column(lang_col).to_pandas().fillna("")
        pref, _ = _md5_prefix_and_hex(ids)
        df = pd.DataFrame({"lang": langs, "pref": pref})
        g = df.groupby(["lang", "pref"], sort=False) \
            .size().reset_index(name="n")
        return pa.table({
            "lang": pa.array(g["lang"].to_numpy(object), pa.string()),
            "pref": pa.array(g["pref"].to_numpy(np.int64), pa.int64()),
            "partial": pa.array(g["n"].to_numpy(np.int64), pa.int64()),
        })

    hist = ds.map_batches(partial, batch_format="pyarrow") \
        .groupby(["lang", "pref"]) \
        .aggregate(Sum("partial", alias_name="n")).to_pandas()

    counts = hist.groupby("lang")["n"].sum().to_dict()
    total = int(sum(counts.values()))
    target = total * frac_permille // 1000
    quotas = largest_remainder(target, weights_permille)
    for lang, q in quotas.items():
        if q > counts.get(lang, 0):
            raise ValueError(
                f"quota {q} for {lang!r} exceeds availability "
                f"{counts.get(lang, 0)} — pick weights inside the mix")

    # driver: boundary bucket + how many needed from it, per language
    bounds: dict[str, tuple[int, int]] = {}
    for lang, q in quotas.items():
        grp = hist[hist["lang"] == lang].sort_values("pref")
        cum = 0
        b, need = -1, 0
        for pref, n in zip(grp["pref"], grp["n"]):
            if cum + n >= q:
                b, need = int(pref), int(q - cum)
                break
            cum += int(n)
        bounds[lang] = (b, need)

    # pass 2: exact threshold key from the boundary bucket's members
    def boundary_members(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        langs = batch.column(lang_col).to_pandas().fillna("") \
            .to_numpy(dtype=object)
        pref, hexes = _md5_prefix_and_hex(ids)
        keep = np.array([bounds.get(lg, (-2, 0))[0] == p
                         for lg, p in zip(langs, pref)], bool)
        return pa.table({
            "lang": pa.array(langs[keep], pa.string()),
            id_col: pa.array(ids[keep], pa.int64()),
            "h": pa.array([hexes[i] for i in np.flatnonzero(keep)],
                          pa.string()),
        })

    members = ds.map_batches(boundary_members,
                             batch_format="pyarrow").to_pandas()
    thresholds: dict[str, tuple[str, int]] = {}
    for lang, (b, need) in bounds.items():
        if need <= 0:
            thresholds[lang] = ("", -1)       # below every real key
            continue
        grp = members[members["lang"] == lang] \
            .sort_values(["h", id_col], kind="mergesort")
        row = grp.iloc[need - 1]
        thresholds[lang] = (str(row["h"]), int(row[id_col]))

    # pass 3: pure keep map against the broadcast thresholds
    def keep_map(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        langs = batch.column(lang_col).to_pandas().fillna("") \
            .to_numpy(dtype=object)
        pref, hexes = _md5_prefix_and_hex(ids)
        out = np.zeros(len(ids), bool)
        for i, (lg, p) in enumerate(zip(langs, pref)):
            b, _need = bounds.get(lg, (-2, 0))
            if p < b:
                out[i] = True
            elif p == b:
                th, tid = thresholds[lg]
                key = (hexes[i], int(ids[i]))
                out[i] = key <= (th, tid)
        return pa.table({
            id_col: pa.array(ids[out], pa.int64()),
            lang_col: pa.array(langs[out], pa.string()),
        })

    return ds.map_batches(keep_map, batch_format="pyarrow")
