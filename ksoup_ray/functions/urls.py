"""URL canonicalization — crawl-frequency normalization so that
near-identical URLs dedup to one key (the first step of every crawl
pipeline: scheme/host case, default ports, fragments, and tracking
parameters all vary freely across link sources).

Rules (RFC 3986 syntax-based normalization + the de-facto
tracking-param strip):

1. scheme and host lowercased (path/query case preserved);
2. default port dropped (``:80`` for http, ``:443`` for https);
3. fragment stripped;
4. tracking query parameters removed (``utm_*``, ``fbclid``,
   ``gclid``, ``msclkid``, ``mc_cid``, ``mc_eid``, ``ref``), other
   parameters kept in original order; a query left empty drops its
   ``?``.

Implementation is a fixed number of compiled-regex C passes over the
whole column (pandas ``str.replace`` / ``str.extract`` — no per-row
Python), so the stage is a plain stateless ``map_batches`` with no
shuffle and no driver state: embarrassingly parallel at any scale.
"""

from __future__ import annotations

import re

import pandas as pd
import pyarrow as pa

_SCHEME_HOST = re.compile(r"^(?P<sh>[A-Za-z][A-Za-z0-9+.\-]*://[^/?#]*)"
                          r"(?P<rest>.*)$", re.DOTALL)
_TRACK = r"(?:utm_[^=&#]*|fbclid|gclid|msclkid|mc_cid|mc_eid|ref)"
_FRAGMENT = re.compile(r"#.*$", re.DOTALL)
_AMP_TRACK = re.compile(rf"&{_TRACK}=[^&]*")
_LEAD_TRACK_MORE = re.compile(rf"\?{_TRACK}=[^&]*&")
_LEAD_TRACK_ONLY = re.compile(rf"\?{_TRACK}=[^&]*$")
_HTTP_PORT = re.compile(r"^(http://[^/?#:]*):80$")
_HTTPS_PORT = re.compile(r"^(https://[^/?#:]*):443$")


def canonicalize_series(s: pd.Series) -> pd.Series:
    """Vectorized canonicalization of a string Series of URLs."""
    s = s.fillna("")
    # 3. fragment first (so port/param regexes never see '#...')
    s = s.str.replace(_FRAGMENT, "", regex=True)
    parts = s.str.extract(_SCHEME_HOST)
    sh, rest = parts["sh"], parts["rest"]
    has = sh.notna()
    # 1. lowercase scheme://host  2. drop default port
    sh = sh.str.lower() \
        .str.replace(_HTTP_PORT, r"\1", regex=True) \
        .str.replace(_HTTPS_PORT, r"\1", regex=True)
    # 4. tracking params: strip '&k=v' occurrences globally, then fix a
    #    leading '?k=v&' -> '?' and a lone '?k=v' -> '' (after the
    #    global '&' pass at most one tracking param can lead)
    rest = rest.str.replace(_AMP_TRACK, "", regex=True) \
        .str.replace(_LEAD_TRACK_MORE, "?", regex=True) \
        .str.replace(_LEAD_TRACK_ONLY, "", regex=True)
    out = (sh + rest).where(has, s)   # schemeless inputs pass through
    return out


def canonicalize_urls(ds, *, url_col: str = "url",
                      out_col: str = "url_canon"):
    """Append ``out_col`` with the canonical form of ``url_col``."""

    def fn(batch: pa.Table) -> pa.Table:
        canon = canonicalize_series(batch.column(url_col).to_pandas())
        return batch.append_column(
            out_col, pa.array(canon.to_numpy(dtype=object), pa.string()))

    return ds.map_batches(fn, batch_format="pyarrow")
