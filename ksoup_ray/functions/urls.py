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


def parse_robots(txt: str, *, agent: str = "ksoupbot") \
        -> list[tuple[bool, str]]:
    """Parse a robots.txt body into the (allow, path_prefix) rules
    that apply to ``agent`` — the REP group-selection algorithm
    (RFC 9309 §2.2.1): rules come from EVERY matching ``User-agent``
    group MERGED in file order (the RFC's multiple-groups rule; exact
    token match beats ``*``, and an exact group existing — even
    rule-less — suppresses the ``*`` fallback); consecutive UA lines
    share one group; unknown directives (Crawl-delay, Sitemap) and
    comments are IGNORED entirely, so they neither split a UA line
    run nor a group; empty Disallow means allow-everything and
    contributes no rule."""
    agent = agent.lower()
    groups: list[tuple[list[str], list[tuple[bool, str]]]] = []
    cur_agents: list[str] = []
    cur_rules: list[tuple[bool, str]] = []
    in_agents = True
    for raw in txt.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        key, _, val = line.partition(":")
        key = key.strip().lower()
        val = val.strip()
        if key == "user-agent":
            if not in_agents and cur_agents:
                groups.append((cur_agents, cur_rules))
                cur_agents, cur_rules = [], []
            cur_agents.append(val.lower())
            in_agents = True
        elif key in ("allow", "disallow"):
            in_agents = False
            if val:
                cur_rules.append((key == "allow", val))
        # crawl-delay / sitemap / unknown: ignored per RFC 9309 —
        # MUST NOT split a group or a user-agent line run
    if cur_agents:
        groups.append((cur_agents, cur_rules))
    if any(agent in agents for agents, _ in groups):
        return [r for agents, rules in groups
                if agent in agents for r in rules]
    if any("*" in agents for agents, _ in groups):
        return [r for agents, rules in groups
                if "*" in agents for r in rules]
    return []


def robots_decide(ds, rules_by_host: dict[str, list[tuple[bool, str]]],
                  *, host_col: str = "host", path_col: str = "path"):
    """Apply per-host robots rules to a URL table: longest-matching
    prefix wins; on equal length Allow wins (Google/RFC 9309 tie
    rule); no matching rule ⇒ allowed. Appends (matched_rule,
    allowed).

    Scale shape: the rule table is host-bounded and SMALL next to the
    URL corpus — callers broadcast it once (``ray.put`` /
    closure-capture) and the decision is a per-batch loop over RULES
    (bounded), each a vectorized ``starts_with`` + host-equality mask
    over the whole column; the URL side never shuffles. Score
    encoding: ``2*len(prefix) + allow`` maximized per row makes the
    tie rule an integer argmax."""
    flat = [(h, allow, prefix)
            for h, rules in sorted(rules_by_host.items())
            for allow, prefix in rules]

    def decide(batch: pa.Table) -> pa.Table:
        import numpy as np
        import pyarrow.compute as pc
        n = batch.num_rows
        hosts = batch.column(host_col)
        paths = batch.column(path_col)
        best_score = np.full(n, -1, np.int64)
        best_idx = np.full(n, -1, np.int64)
        for ri, (h, allow, prefix) in enumerate(flat):
            m = pc.and_(pc.equal(hosts, h),
                        pc.starts_with(paths, prefix)) \
                .to_numpy(zero_copy_only=False)
            m = np.asarray(m, bool)
            score = 2 * len(prefix) + int(allow)
            upd = m & (score > best_score)
            best_score[upd] = score
            best_idx[upd] = ri
        matched = [flat[i][2] if i >= 0 else None for i in best_idx]
        allowed = [bool(flat[i][1]) if i >= 0 else True
                   for i in best_idx]
        return batch.append_column(
            "matched_rule", pa.array(matched, pa.string())) \
            .append_column("allowed", pa.array(allowed, pa.bool_()))

    return ds.map_batches(decide, batch_format="pyarrow")


# mini public-suffix list for tests/synthetic hosts — swap in the
# real PSL snapshot at deploy time (same longest-match semantics);
# includes both 'uk' and 'co.uk' so a shortest-match bug is visible
_DEFAULT_PSL = frozenset({
    "com", "org", "net", "io", "uk", "co.uk", "ac.uk",
    "au", "com.au",
})


def registered_domain(host: str,
                      psl: frozenset[str] = _DEFAULT_PSL) \
        -> str | None:
    """eTLD+1 (registered domain) of ``host`` under the
    public-suffix-list longest-match rule: find the LONGEST suffix of
    the host's label sequence present in ``psl``; the registered
    domain is that suffix plus one more label. Returns None when the
    host IS a public suffix or nothing matches — per-domain quotas
    and reputation scores group on this key, so getting
    'x.co.uk' -> 'x.co.uk' (not 'co.uk') right is what keeps a whole
    ccTLD from collapsing into one group."""
    labels = host.lower().rstrip(".").split(".")
    for i in range(len(labels)):          # i=0 is the longest suffix
        if ".".join(labels[i:]) in psl:
            if i == 0:
                return None               # host is itself a suffix
            return ".".join(labels[i - 1:])
    return None


def registered_domains(ds, *, host_col: str = "host",
                       out_col: str = "registered",
                       psl: frozenset[str] = _DEFAULT_PSL):
    """Append ``out_col`` = eTLD+1 of ``host_col``. Per-batch label
    matching against the broadcast PSL set (bounded; the real PSL is
    ~9k entries — a frozenset membership probe per label suffix, ≤
    label-count probes per host). No shuffle."""

    def fn(batch: pa.Table) -> pa.Table:
        regs = [registered_domain(h or "", psl)
                for h in batch.column(host_col).to_pylist()]
        return batch.append_column(out_col,
                                   pa.array(regs, pa.string()))

    return ds.map_batches(fn, batch_format="pyarrow")


def surt_key(url: str) -> str:
    """SURT (Sort-friendly URI Reordering Transform) of a URL — the
    key Common Crawl's CDX index sorts on: scheme dropped, host
    lowercased and its labels REVERSED comma-joined, then ')' and the
    path (query kept, fragment dropped). 'https://WWW.Example.com/a/b?q=1#f'
    → 'com,example,www)/a/b?q=1'. Reversed-host ordering clusters a
    registrable domain's every subdomain into one contiguous key
    range — the property that makes per-domain index scans a range
    read instead of a full scan."""
    rest = url
    if "://" in rest:
        rest = rest.split("://", 1)[1]
    rest = rest.split("#", 1)[0]
    # the authority ends at the FIRST '/' or '?' — a query with no
    # path slash ('host.com?q=1') must not leak into the host labels
    cut = min((i for i in (rest.find("/"), rest.find("?"))
               if i >= 0), default=-1)
    if cut < 0:
        hostport, path = rest, "/"
    elif rest[cut] == "/":
        hostport, path = rest[:cut], rest[cut:]
    else:
        hostport, path = rest[:cut], "/" + rest[cut:]
    host = hostport.split("@", 1)[-1]        # strip userinfo
    port = ""
    if ":" in host:
        host, port = host.split(":", 1)
        port = ":" + port
    labels = [l for l in host.lower().split(".") if l]
    return ",".join(reversed(labels)) + port + ")" + path


def surt_keys(ds, *, url_col: str = "url", out_col: str = "surt"):
    """Append ``out_col`` = SURT key of ``url_col``. Pure per-batch
    string splits — no shuffle; downstream CDX-style index builds
    sort on this key so each domain is one contiguous range."""

    def fn(batch: pa.Table) -> pa.Table:
        keys = [surt_key(u or "")
                for u in batch.column(url_col).to_pylist()]
        return batch.append_column(out_col,
                                   pa.array(keys, pa.string()))

    return ds.map_batches(fn, batch_format="pyarrow")
