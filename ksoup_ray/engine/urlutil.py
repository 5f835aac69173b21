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
    try:
        out = urljoin(base_uri, rel_url)
    except ValueError:
        return ""
    # reference keeps only results with a scheme
    try:
        if not urlsplit(out).scheme:
            return ""
    except ValueError:
        return ""
    return out
