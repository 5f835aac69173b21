"""Relative → absolute URL resolution for ``abs:`` attributes.

Semantics per reference ``internal/StringUtil.kt:226-237`` +
``internal/URLUtil.kt`` (RFC 3986-style resolution with leniencies:
control chars stripped from URLs, whitespace trimmed, a valid absolute
rel URL wins over an invalid base). Implemented on ``urllib.parse``
(the stdlib's public RFC 3986 resolver) rather than porting the
reference's hand-rolled resolver.
"""

from __future__ import annotations

import re
from urllib.parse import urljoin, urlsplit

_CONTROL = re.compile(r"[\x00-\x1f\x7f]")
_SCHEME = re.compile(r"^[a-zA-Z][a-zA-Z0-9+.-]*:")

# schemes urllib resolves natively; anything else gets the http stand-in
from urllib.parse import uses_relative as _uses_relative  # noqa: E402
_RELATIVE_SCHEMES = frozenset(s for s in _uses_relative if s)


def _clean(url: str) -> str:
    return _CONTROL.sub("", url).strip()


def is_absolute(url: str) -> bool:
    return bool(_SCHEME.match(_clean(url)))


def resolve(base_uri: str, rel_url: str) -> str:
    """Resolve ``rel_url`` against ``base_uri``; '' when impossible."""
    base_uri = _clean(base_uri)
    rel_url = _clean(rel_url)
    if not rel_url:
        return base_uri if is_absolute(base_uri) else ""
    if is_absolute(rel_url):
        return rel_url
    if not is_absolute(base_uri):
        return ""
    # urljoin refuses to resolve against unknown schemes (uses_relative
    # gating); the reference resolves any scheme ("wtf://x/" + "/foo").
    # Resolve under a stand-in http scheme, then restore the original.
    m = _SCHEME.match(base_uri)
    scheme = m.group(0)[:-1].lower() if m else ""
    swap = scheme and scheme not in _RELATIVE_SCHEMES
    work_base = "http:" + base_uri[len(scheme) + 1:] if swap else base_uri
    try:
        out = urljoin(work_base, rel_url)
    except ValueError:
        return ""
    if swap and out.startswith("http:") and not rel_url.startswith("http:"):
        out = scheme + out[4:]
    # reference keeps only results with a scheme
    try:
        if not urlsplit(out).scheme:
            return ""
    except ValueError:
        return ""
    if scheme == "file" and out.startswith("file:///"):
        # match the reference resolver's file: forms (NodeTest
        # handleAbsOnFileUris / handleAbsOnLocalhostFileUris):
        # a no-authority base ("file:/etc/") keeps the single-slash
        # form; a triple-slash base promotes the first path segment
        # to the authority ("file:///localhost/.." -> "file://localhost/..")
        path = out[len("file://"):]
        if re.match(r"^file:///[^/]", base_uri):
            out = "file://" + path.lstrip("/")
        elif re.match(r"^file:/[^/]", base_uri):
            out = "file:" + path
    return out
