"""HTML named/numeric character references — escape + unescape.

Semantics per reference ``ksoup/src/com/fleeksoft/ksoup/nodes/Entities.kt``
and ``parser/Tokeniser.kt:150-227`` (consumeCharacterReference):

* full WHATWG table (2231 entries incl. 106 legacy no-semicolon names) —
  Python's ``html.entities.html5`` is that exact public table, verified
  equal to the reference's packed ``EntitiesData`` base set;
* base (106) names match without a trailing semicolon; extended names
  require the semicolon to be present in the input;
* in attributes, a matched name followed by ``=``, ``-`` or ``_`` is NOT
  decoded (Tokeniser.kt:205-208);
* numeric refs: out-of-range → U+FFFD; 0x80–0x9F remapped via the
  windows-1252 extension table (Tokeniser.kt:345-353);
* escape: mode xhtml/base/extended, text-vs-attribute rules
  (Entities.kt:185-302), charset-aware encodability, ``&nbsp;`` special
  case, optional whitespace normalisation for pretty-printing.

Tables are module-level: built once per worker process (the Ray-native
equivalent of the reference's static entity tables).
"""

from __future__ import annotations

from html.entities import html5 as _HTML5

# ---- tables ---------------------------------------------------------------

# name (no trailing ';') -> replacement string (1-2 codepoints)
NAMED_FULL: dict[str, str] = {}
BASE_NAMES: frozenset[str]
_base = set()
for _k, _v in _HTML5.items():
    if _k.endswith(";"):
        NAMED_FULL[_k[:-1]] = _v
    else:
        _base.add(_k)
        NAMED_FULL.setdefault(_k, _v)
BASE_NAMES = frozenset(_base)
del _base

XHTML_NAMES = {"amp": "&", "lt": "<", "gt": ">", "quot": '"'}

REPLACEMENT_CHAR = "�"

# windows-1252 remap of numeric refs 0x80-0x9F (Tokeniser.kt:348-353; the
# table itself is the public windows-1252 extension mapping)
WIN1252_EXTENSIONS = (
    0x20AC, 0x0081, 0x201A, 0x0192, 0x201E, 0x2026, 0x2020, 0x2021,
    0x02C6, 0x2030, 0x0160, 0x2039, 0x0152, 0x008D, 0x017D, 0x008F,
    0x0090, 0x2018, 0x2019, 0x201C, 0x201D, 0x2022, 0x2013, 0x2014,
    0x02DC, 0x2122, 0x0161, 0x203A, 0x0153, 0x009D, 0x017E, 0x0178,
)

ESCAPE_XHTML = "xhtml"
ESCAPE_BASE = "base"
ESCAPE_EXTENDED = "extended"


def _build_reverse(names: dict[str, str] | set[str]) -> dict[int, str]:
    """codepoint -> canonical entity name, replicating the reference's
    packed-table lookup exactly (Entities.kt nameForCodepoint:427-438):
    the table is sorted by (codepoint, multipoint-entries-first by
    second-codepoint, then longest-name-first, then name), looked up by
    midpoint binary search, preferring index+1 when the next entry has
    the same codepoint. Verified equal to the reference table for every
    duplicated codepoint (e.g. 8811→Gt not gg, 197→angst in extended)."""
    items = (
        names.items() if isinstance(names, dict)
        else ((n, NAMED_FULL[n]) for n in names)
    )
    entries = []
    for name, val in items:
        cp1 = ord(val[0])
        cp2 = ord(val[1]) if len(val) > 1 else None
        if cp2 is not None:
            k = (cp1, 0, cp2, name)
        else:
            k = (cp1, 1, -len(name), name)
        entries.append((k, name, cp1))
    entries.sort(key=lambda e: e[0])
    code_keys = [e[2] for e in entries]
    name_vals = [e[1] for e in entries]
    size = len(entries)
    rev: dict[int, str] = {}
    for cp in set(code_keys):
        lo, hi = 0, size - 1
        idx = -1
        while lo <= hi:
            mid = (lo + hi) // 2
            if code_keys[mid] < cp:
                lo = mid + 1
            elif code_keys[mid] > cp:
                hi = mid - 1
            else:
                idx = mid
                break
        if idx < size - 1 and code_keys[idx + 1] == cp:
            idx += 1
        # deviation: for 7 rare codepoints (fj, 8808-8810, 10877,
        # 10955-6) the reference's canonical name is a MULTIPOINT
        # entity, so its escape would not round-trip; we fall back to a
        # numeric escape for those instead
        if len(NAMED_FULL[name_vals[idx]]) == 1:
            rev[cp] = name_vals[idx]
    return rev


REVERSE_BASE: dict[int, str] = _build_reverse(set(BASE_NAMES))
REVERSE_EXTENDED: dict[int, str] = _build_reverse(NAMED_FULL)
REVERSE_XHTML: dict[int, str] = {ord(v): k for k, v in XHTML_NAMES.items()}

_REVERSE_BY_MODE = {
    ESCAPE_XHTML: REVERSE_XHTML,
    ESCAPE_BASE: REVERSE_BASE,
    ESCAPE_EXTENDED: REVERSE_EXTENDED,
}


def is_named_entity(name: str) -> bool:
    return name in NAMED_FULL


def is_base_named_entity(name: str) -> bool:
    return name in BASE_NAMES


def codepoints_for_name(name: str) -> str:
    """The replacement string for a known entity name ('' if unknown)."""
    return NAMED_FULL.get(name, "")


# ---- unescape -------------------------------------------------------------

_NOT_CHARREF = frozenset("\t\n\r\f <&")


def _consume_letter_then_digit(s: str, i: int) -> int:
    """End index of a [A-Za-z]+[0-9]* run starting at i (CharacterReader
    consumeLetterThenDigitSequence semantics)."""
    n = len(s)
    j = i
    while j < n and s[j].isascii() and s[j].isalpha():
        j += 1
    while j < n and s[j].isdigit() and s[j].isascii():
        j += 1
    return j


def _parse_numeric_ref(s: str, i: int) -> tuple[int, int] | None:
    """Parse ``#[xX]?digits[;]?`` at ``s[i]`` (``s[i] == '#'``). Returns
    (codepoint or -1 on overflow, index-after) or None if no digits."""
    n = len(s)
    j = i + 1
    hex_mode = j < n and s[j] in "xX"
    if hex_mode:
        j += 1
    k = j
    if hex_mode:
        while k < n and (s[k].isdigit() or s[k] in "abcdefABCDEF"):
            k += 1
    else:
        while k < n and s[k].isascii() and s[k].isdigit():
            k += 1
    if k == j:
        return None
    end = k + 1 if k < n and s[k] == ";" else k
    try:
        cp = int(s[j:k], 16 if hex_mode else 10)
    except ValueError:
        cp = -1
    return cp, end


def match_char_ref(s: str, i: int, in_attribute: bool,
                   additional_allowed: str | None = None) -> tuple[str, int] | None:
    """Try to match a character reference at ``s[i]`` where ``s[i-1] == '&'``.

    Returns (replacement, new_index) or None (emit the '&' literally).
    Mirrors Tokeniser.consumeCharacterReference (Tokeniser.kt:150-227).
    """
    n = len(s)
    if i >= n:
        return None
    c = s[i]
    if additional_allowed is not None and c == additional_allowed:
        return None
    if c in _NOT_CHARREF:
        return None
    if c == "#":
        parsed = _parse_numeric_ref(s, i)
        if parsed is None:
            return None  # numeric ref with no numerals → rewind
        cp, end = parsed
        if cp < 0 or cp > 0x10FFFF:
            return REPLACEMENT_CHAR, end
        if 0x80 <= cp < 0x80 + len(WIN1252_EXTENSIONS):
            cp = WIN1252_EXTENSIONS[cp - 0x80]
        if 0xD800 <= cp <= 0xDBFF:
            # high surrogate: the reference operates in UTF-16, so a
            # following low-surrogate numeric ref pairs naturally into
            # one character (&#55357;&#56495; → U+1F4AF). Combine here.
            if end + 1 < n and s[end] == "&" and s[end + 1] == "#":
                nxt = _parse_numeric_ref(s, end + 1)
                if nxt is not None and 0xDC00 <= nxt[0] <= 0xDFFF:
                    combined = (0x10000 + ((cp - 0xD800) << 10)
                                + (nxt[0] - 0xDC00))
                    return chr(combined), nxt[1]
            return REPLACEMENT_CHAR, end  # unpaired → replacement
        if 0xDC00 <= cp <= 0xDFFF:  # lone low surrogate → replacement
            return REPLACEMENT_CHAR, end
        return chr(cp), end
    # named
    j = _consume_letter_then_digit(s, i)
    if j == i:
        return None
    name = s[i:j]
    looks_legit = j < n and s[j] == ";"
    found = is_base_named_entity(name) or (is_named_entity(name) and looks_legit)
    if not found:
        return None
    if in_attribute and j < n and s[j] in "=-_":
        return None
    end = j + 1 if looks_legit else j
    return NAMED_FULL[name], end


def unescape(string: str, strict: bool = False) -> str:
    """Unescape character references in a whole string.

    ``strict=True`` requires a trailing ';' on all named refs (matches
    reference ``Parser.unescapeEntities`` attribute-ish strictness used by
    Entities.unescape(string, strict)).
    """
    if "&" not in string:
        return string
    out: list[str] = []
    i = 0
    n = len(string)
    while True:
        amp = string.find("&", i)
        if amp == -1:
            out.append(string[i:])
            break
        out.append(string[i:amp])
        m = match_char_ref(string, amp + 1, in_attribute=strict)
        if m is None:
            out.append("&")
            i = amp + 1
        else:
            out.append(m[0])
            i = m[1]
    return "".join(out)


# ---- escape ---------------------------------------------------------------

# option bits, matching the reference's doEscape options
FOR_TEXT = 1
FOR_ATTRIBUTE = 2
NORMALISE = 4
TRIM_LEADING = 8
TRIM_TRAILING = 16

_WHITESPACE = frozenset(" \t\n\f\r")


def _can_encode(cp: int, charset: str) -> bool:
    cs = charset.upper()
    if cs in ("US-ASCII", "ASCII"):
        return cp < 0x80
    if cs == "ISO-8859-1":
        return cp < 0x100
    if cs.startswith("UTF-"):
        return True
    try:
        chr(cp).encode(charset)
        return True
    except (UnicodeEncodeError, LookupError):
        return False


def _append_encoded(out: list[str], mode: str, cp: int) -> None:
    name = _REVERSE_BY_MODE[mode].get(cp)
    if name is not None:
        out.append(f"&{name};")
    else:
        out.append(f"&#x{cp:x};")


def escape(data: str | None, mode: str = ESCAPE_BASE, syntax: str = "html",
           charset: str = "UTF-8",
           options: int = FOR_TEXT | FOR_ATTRIBUTE) -> str:
    """Escape per reference Entities.doEscape (Entities.kt:185-302)."""
    if data is None:
        return ""
    out: list[str] = []
    last_was_white = False
    reached_non_white = False
    skipped = False
    normalise = options & NORMALISE
    for ch in data:
        if normalise:
            if ch in _WHITESPACE:
                if (options & TRIM_LEADING) and not reached_non_white:
                    continue
                if last_was_white:
                    continue
                if options & TRIM_TRAILING:
                    skipped = True
                    continue
                out.append(" ")
                last_was_white = True
                continue
            else:
                last_was_white = False
                reached_non_white = True
                if skipped:
                    out.append(" ")
                    skipped = False
        cp = ord(ch)
        if ch == "&":
            out.append("&amp;")
        elif cp == 0xA0:
            out.append("&nbsp;" if mode != ESCAPE_XHTML else "&#xa0;")
        elif ch == "<":
            if (options & FOR_TEXT) or mode == ESCAPE_XHTML or syntax == "xml":
                out.append("&lt;")
            else:
                out.append("<")
        elif ch == ">":
            out.append("&gt;" if (options & FOR_TEXT) else ">")
        elif ch == '"':
            out.append("&quot;" if (options & FOR_ATTRIBUTE) else '"')
        elif ch == "'":
            if (options & FOR_ATTRIBUTE) and (options & FOR_TEXT):
                out.append("&#x27;" if mode == ESCAPE_XHTML else "&apos;")
            else:
                out.append("'")
        elif cp in (0x9, 0xA, 0xD):
            out.append(ch)
        elif cp < 0x20 or not _can_encode(cp, charset):
            _append_encoded(out, mode, cp)
        else:
            out.append(ch)
    return "".join(out)
