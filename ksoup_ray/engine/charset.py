"""Charset detection + decode for raw page bytes.

Semantics per reference ``helper/DataUtil.kt:92-259``: precedence is
BOM (UTF-8 / UTF-16 LE/BE / UTF-32 LE/BE) → caller-supplied header
charset → pre-parse sniff of the first 5 KB for
``meta[http-equiv=content-type] / meta[charset]`` and the XML
declaration → UTF-8 default. Unknown/undecodable charset names fall
back to UTF-8.

Used as a pure vectorizable function inside the Ray parse stage — the
``html`` input column is ``binary`` and is decoded here per row.
"""

from __future__ import annotations

import codecs
import re

FIRST_READ_SIZE = 5 * 1024  # DataUtil.kt:26
DEFAULT_CHARSET = "UTF-8"

_CHARSET_PATTERN = re.compile(
    r"(?i)\bcharset=\s*(?:[\"'])?([^\s,;\"']*)")

# BOM table (DataUtil.kt:235-259). Order matters: UTF-32 before UTF-16.
_BOMS = (
    (b"\x00\x00\xfe\xff", "UTF-32BE", 4),
    (b"\xff\xfe\x00\x00", "UTF-32LE", 4),
    (b"\xfe\xff", "UTF-16BE", 2),
    (b"\xff\xfe", "UTF-16LE", 2),
    (b"\xef\xbb\xbf", "UTF-8", 3),
)


def _validate_charset(name: str | None) -> str | None:
    if not name:
        return None
    name = name.strip().strip('"\'')
    if not name:
        return None
    try:
        codecs.lookup(name)
        return name
    except (LookupError, ValueError):
        return None


def charset_from_content_type(content_type: str | None) -> str | None:
    """DataUtil.getCharsetFromContentType (DataUtil.kt:198-207)."""
    if not content_type:
        return None
    m = _CHARSET_PATTERN.search(content_type)
    if m:
        # "charset=charset=iso-8859-1" self-heal (DataUtil.kt:201)
        name = m.group(1).strip().replace("charset=", "")
        return _validate_charset(name)
    return None


def detect_bom(data: bytes) -> tuple[str, int] | None:
    for bom, name, length in _BOMS:
        if data.startswith(bom):
            return name, length
    return None


_META_SNIFF = re.compile(
    rb"(?is)<meta[^>]+>")
_XML_DECL = re.compile(rb"(?is)^\s*<\?xml[^>]*encoding\s*=\s*"
                       rb"[\"']([^\"']+)[\"']")


def sniff_meta_charset(head_bytes: bytes) -> str | None:
    """Pre-parse sniff of meta charset in the first 5 KB.

    The reference does a full speculative UTF-8 parse and selects
    ``meta[http-equiv=content-type], meta[charset]`` (DataUtil.kt:105-127);
    we scan the raw bytes with the same precedence (first matching meta
    wins, XML declaration as fallback) — single pass, no throwaway DOM.
    """
    for m in _META_SNIFF.finditer(head_bytes[:FIRST_READ_SIZE]):
        tag = m.group(0)
        # meta charset=X
        cm = re.search(rb"(?is)\bcharset\s*=\s*[\"']?([^\s\"'/>;]+)", tag)
        if cm is not None:
            # distinguish <meta charset=X> from http-equiv content attr —
            # both are accepted by the reference's selector, and a
            # content="...charset=x" also matches via the same regex
            name = _remap_unreadable(
                _validate_charset(cm.group(1).decode("ascii", "ignore")))
            if name:
                return name
    xm = _XML_DECL.search(head_bytes)
    if xm is not None:
        return _remap_unreadable(
            _validate_charset(xm.group(1).decode("ascii", "ignore")))
    return None


def _remap_unreadable(name: str | None) -> str | None:
    """WHATWG encoding-sniff rule: a meta-declared UTF-16/UTF-32 label
    is self-contradictory (we just READ the meta as ASCII-compatible
    bytes) — browsers decode as UTF-8 instead. Real pages do this (the
    reference's own 448 KB bench page declares charset=UTF-32 over
    UTF-8 bytes)."""
    if name is None:
        return None
    up = name.upper().replace("_", "-")
    if up.startswith("UTF-16") or up.startswith("UTF-32"):
        return "UTF-8"
    return name


def detect_charset(data: bytes, header_charset: str | None = None) -> tuple[str, int]:
    """Return (charset_name, bom_length) for a raw page.

    Precedence: BOM → header charset → meta sniff → UTF-8
    (DataUtil.kt:92-167).
    """
    bom = detect_bom(data)
    if bom is not None:
        return bom
    header = _validate_charset(header_charset)
    if header is not None:
        return header, 0
    sniffed = sniff_meta_charset(data)
    if sniffed is not None:
        return sniffed, 0
    return DEFAULT_CHARSET, 0


def decode_html(data: bytes, header_charset: str | None = None) -> tuple[str, str]:
    """Decode raw page bytes → (text, charset_used). Never raises."""
    charset, bom_len = detect_charset(data, header_charset)
    try:
        text = data[bom_len:].decode(charset, errors="replace")
    except (LookupError, ValueError):
        charset = DEFAULT_CHARSET
        text = data[bom_len:].decode(DEFAULT_CHARSET, errors="replace")
    # a decoded doc may still carry a UTF-8 BOM decoded as
    if text.startswith("﻿"):
        text = text[1:]
    return text, charset
