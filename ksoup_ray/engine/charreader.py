"""CharacterReader — the reference's low-level scan cursor
(``parser/CharacterReader.kt``), re-expressed over a fully-decoded
string.

The reference streams through a ring buffer (BufferSize chunks,
bufferUp/unconsume bookkeeping); this engine decodes the whole document
up front (documents arrive as Arrow-backed strings from Parquet), so
the reader is a plain cursor with O(1) position math and C-level
``str.find`` scans. The buffer-boundary behaviors (RefillPoint, mark
loss) are therefore structurally absent — the API surface and every
observable scan semantic match the reference's tests.
"""

from __future__ import annotations

from bisect import bisect_right

EOF = "￿"
# API-compat constant (reference CharacterReader.BufferSize); no ring
# buffer exists here, tests use it only to size generated inputs.
BUFFER_SIZE = 2048
REFILL_POINT = BUFFER_SIZE // 2

_SPEC_WS = "\t\n\r\f "
_TAG_TERMINATORS = "\t\n\r\f /<>\x00"


class CharacterReader:
    __slots__ = ("s", "n", "_pos", "_mark", "_newlines", "_cache",
                 "_closed")

    def __init__(self, input_str: str):
        self.s = input_str
        self.n = len(input_str)
        self._pos = 0          # may reach n+1 after consuming EOF
        self._mark = -1
        self._newlines: list[int] | None = None
        self._cache: dict[str, str] = {}
        self._closed = False

    # -- lifecycle
    def close(self) -> None:
        self._closed = True

    def is_closed(self) -> bool:
        return self._closed

    def read_fully(self) -> bool:
        return True  # whole input always in memory

    # -- position / line tracking
    def pos(self) -> int:
        return min(self._pos, self.n)

    def is_empty(self) -> bool:
        return self._pos >= self.n

    def track_newlines(self, track: bool) -> None:
        if track and self._newlines is None:
            self._newlines = [i for i, c in enumerate(self.s) if c == "\n"]
        elif not track:
            self._newlines = None

    def is_track_newlines(self) -> bool:
        return self._newlines is not None

    def line_number(self, pos: int | None = None) -> int:
        if self._newlines is None:
            return 1
        p = self.pos() if pos is None else pos
        return bisect_right(self._newlines, p - 1) + 1

    def column_number(self, pos: int | None = None) -> int:
        p = self.pos() if pos is None else pos
        if self._newlines is None:
            return p + 1
        i = bisect_right(self._newlines, p - 1)
        return p + 1 if i == 0 else p - self._newlines[i - 1]

    def pos_line_col(self) -> str:
        return f"{self.line_number()}:{self.column_number()}"

    # -- cursor
    def current(self) -> str:
        return self.s[self._pos] if self._pos < self.n else EOF

    def consume(self) -> str:
        if self._pos >= self.n:
            # consuming EOF advances a virtual slot so a later
            # unconsume first "un-reads" the EOF (CharacterReader.kt)
            self._pos = self.n + 1
            return EOF
        c = self.s[self._pos]
        self._pos += 1
        return c

    def unconsume(self) -> None:
        if self._pos <= 0:
            raise IOError("WTF: no buffer left to unconsume")
        self._pos -= 1

    def advance(self) -> None:
        self._pos += 1

    def mark(self) -> None:
        self._mark = self._pos

    def unmark(self) -> None:
        self._mark = -1

    def rewind_to_mark(self) -> None:
        if self._mark == -1:
            raise IOError("Mark invalid")
        self._pos = self._mark
        self.unmark()

    # -- scans
    def next_index_of(self, seq: str) -> int:
        i = self.s.find(seq, self.pos())
        return -1 if i == -1 else i - self.pos()

    def _cached(self, out: str) -> str:
        # reference interns short scan results (cachesStrings test)
        if len(out) <= 16:
            hit = self._cache.get(out)
            if hit is not None:
                return hit
            self._cache[out] = out
        return out

    def consume_to(self, seq: str) -> str:
        offset = self.next_index_of(seq)
        if offset == -1:
            return self.consume_to_end()
        out = self.s[self.pos():self.pos() + offset]
        self._pos = self.pos() + offset
        return self._cached(out)

    def consume_to_any(self, *chars: str) -> str:
        start = self.pos()
        p = start
        s, n = self.s, self.n
        cs = frozenset(chars)
        while p < n and s[p] not in cs:
            p += 1
        self._pos = p
        return self._cached(s[start:p])

    def consume_to_any_sorted(self, *chars: str) -> str:
        return self.consume_to_any(*chars)

    def consume_data(self) -> str:
        return self.consume_to_any("&", "<", "\x00")

    def consume_raw_data(self) -> str:
        return self.consume_to_any("<", "\x00")

    def consume_attribute_quoted(self, single: bool) -> str:
        quote = "'" if single else '"'
        return self.consume_to_any(quote, "&", "\x00")

    def consume_tag_name(self) -> str:
        start = self.pos()
        p = start
        s, n = self.s, self.n
        while p < n and s[p] not in _TAG_TERMINATORS:
            p += 1
        self._pos = p
        return self._cached(s[start:p])

    def consume_to_end(self) -> str:
        out = self.s[self.pos():]
        self._pos = self.n
        return self._cached(out)

    def consume_letter_sequence(self) -> str:
        start = self.pos()
        p = start
        s, n = self.s, self.n
        while p < n and s[p].isalpha():
            p += 1
        self._pos = p
        return self._cached(s[start:p])

    def consume_letter_then_digit_sequence(self) -> str:
        start = self.pos()
        p = start
        s, n = self.s, self.n
        while p < n and s[p].isalpha():
            p += 1
        while p < n and s[p].isdigit():
            p += 1
        self._pos = p
        return self._cached(s[start:p])

    def consume_hex_sequence(self) -> str:
        start = self.pos()
        p = start
        s, n = self.s, self.n
        while p < n and (("0" <= s[p] <= "9") or ("a" <= s[p] <= "f")
                         or ("A" <= s[p] <= "F")):
            p += 1
        self._pos = p
        return self._cached(s[start:p])

    def consume_digit_sequence(self) -> str:
        start = self.pos()
        p = start
        s, n = self.s, self.n
        while p < n and "0" <= s[p] <= "9":
            p += 1
        self._pos = p
        return self._cached(s[start:p])

    # -- matches
    def matches(self, seq: str) -> bool:
        if len(seq) == 1:
            return self._pos < self.n and self.s[self._pos] == seq
        return self.s.startswith(seq, self.pos())

    def matches_ignore_case(self, seq: str) -> bool:
        end = self.pos() + len(seq)
        return end <= self.n and \
            self.s[self.pos():end].lower() == seq.lower()

    def matches_any(self, *chars: str) -> bool:
        return self._pos < self.n and self.s[self._pos] in chars

    def matches_any_sorted(self, chars) -> bool:
        return self.matches_any(*chars)

    def matches_letter(self) -> bool:
        return self._pos < self.n and self.s[self._pos].isalpha()

    def matches_ascii_alpha(self) -> bool:
        if self._pos >= self.n:
            return False
        c = self.s[self._pos]
        return "a" <= c <= "z" or "A" <= c <= "Z"

    def matches_digit(self) -> bool:
        return self._pos < self.n and "0" <= self.s[self._pos] <= "9"

    def match_consume(self, seq: str) -> bool:
        if self.matches(seq):
            self._pos = self.pos() + len(seq)
            return True
        return False

    def match_consume_ignore_case(self, seq: str) -> bool:
        if self.matches_ignore_case(seq):
            self._pos = self.pos() + len(seq)
            return True
        return False

    def contains_ignore_case(self, seq: str) -> bool:
        """Scans for consistent-case variants only, like the reference
        (CharacterReader.kt containsIgnoreCase: lo/hi scan)."""
        rest = self.s[self.pos():]
        return seq.lower() in rest or seq.upper() in rest

    def range_equals(self, start: int, count: int, cached: str) -> bool:
        return self.s[start:start + count] == cached

    def __str__(self) -> str:
        return self.s[self.pos():]
