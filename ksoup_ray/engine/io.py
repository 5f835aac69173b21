"""Reader compatibility shims (reference ``ported/io`` surface).

The engine itself consumes fully-decoded strings (Arrow string/binary
columns), so these are thin adapters for drop-in familiarity: a ksoup
caller holding a ``Reader`` can hand it to ``parse``/``StreamParser``.
``InputSourceReader`` performs the same BOM/charset-aware decode as
``charset.decode_html``; ``BufferedReader`` adds mark/reset/skip over
any reader (the reference buffers in DefaultBufferSize chunks — here
the backing data is resident, so buffering is positional only).
"""

from __future__ import annotations

DEFAULT_BUFFER_SIZE = 8192


class Reader:
    """Positional character reader over a decoded string (base class —
    reference ported/io/Reader.kt API: read / read-into / skip /
    mark / reset / close)."""

    def __init__(self, s: str):
        self._s = s
        self._pos = 0
        self._mark = 0
        self._closed = False

    # -- core API
    def read(self, buf: list | None = None, off: int = 0,
             length: int | None = None) -> int:
        """``read()`` → next char code or -1; ``read(buf, off, len)`` →
        chars copied into ``buf`` (a list), -1 at EOF."""
        if buf is None:
            if self._pos >= len(self._s):
                return -1
            c = self._s[self._pos]
            self._pos += 1
            return ord(c)
        if length is None:
            length = len(buf) - off
        if self._pos >= len(self._s):
            return -1
        chunk = self._s[self._pos:self._pos + length]
        for i, ch in enumerate(chunk):
            buf[off + i] = ch
        self._pos += len(chunk)
        return len(chunk)

    def read_string(self, n: int) -> str:
        out = self._s[self._pos:self._pos + n]
        self._pos += len(out)
        return out

    def skip(self, n: int) -> int:
        avail = min(n, len(self._s) - self._pos)
        self._pos += avail
        return avail

    def mark(self, read_ahead_limit: int = 0) -> None:
        self._mark = self._pos

    def reset(self) -> None:
        self._pos = self._mark

    def markSupported(self) -> bool:  # noqa: N802 (reference name)
        return True

    def ready(self) -> bool:
        return self._pos < len(self._s)

    def close(self) -> None:
        self._closed = True

    def is_closed(self) -> bool:
        return self._closed

    def __enter__(self) -> "Reader":
        return self

    def __exit__(self, *exc) -> None:
        self.close()


class StringReader(Reader):
    """Reader over an in-memory string (ported/io/StringReader.kt)."""


class InputSourceReader(Reader):
    """Byte source → characters with BOM/meta/header charset detection
    (ported/io/InputSourceReader.kt + the DataUtil decode chain)."""

    def __init__(self, data: bytes, charset: str | None = None):
        from .charset import decode_html
        text, used = decode_html(data, charset)
        super().__init__(text)
        self.charset = used


class BufferedReader(Reader):
    """Mark/reset/skip wrapper (ported/io/BufferedReader.kt). The
    backing reader's remaining content is adopted positionally — the
    data is already resident, so no chunk copies occur."""

    def __init__(self, reader: Reader, buffer_size: int = DEFAULT_BUFFER_SIZE):
        super().__init__(reader._s)
        self._pos = reader._pos
        self.buffer_size = buffer_size
