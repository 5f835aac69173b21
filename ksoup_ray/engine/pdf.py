"""Minimal from-scratch PDF text/layout parser + deterministic writer.

The north-star pipeline covers "HTML boilerplate strip, PDF/layout
parse, DOM heuristics"; this module is the PDF leg. It is a genuine
(small) PDF implementation built only from the published PDF 1.4/1.7
spec structure — no external PDF library:

* ``write_text_pdf(text)`` — emits a real, valid PDF: classic xref
  table, catalog → page tree, Helvetica font, one FlateDecode-compressed
  content stream per page. Lines are shown with ``Tj`` + ``T*`` leading
  advances; latin-1-safe lines become escaped literal strings, anything
  else a UTF-16BE hex string (the PDF "text string" convention).
* ``PdfDocument`` / ``extract_pdf_text(data)`` — parses arbitrary
  simple PDFs back: object map (scan-based, so broken xref tables don't
  kill the parse; the trailer/xref path is used for the /Root lookup
  when intact), dict/array/name/string lexer, FlateDecode streams,
  page-tree walk (nested /Kids), and a BT/ET content-stream text
  interpreter covering Tj, TJ (kerning arrays), ', ", Td, TD, T*, TL,
  Tm and Tf.

Round-trip contract (value-checked by the ``pdf_roundtrip`` oracle):
``extract_pdf_text(write_text_pdf(t)) == t`` for any ``str`` without
carriage returns. Layout comes back too: ``extract_pdf_pages`` returns
per-page line lists with the (x, y) pen position of each line.

Scale shape: parsing is per-document CPU work exactly like the HTML
engine — it runs inside actor-pool ``map_batches`` stages; nothing here
touches the driver.
"""

from __future__ import annotations

import re
import zlib

__all__ = [
    "write_text_pdf",
    "extract_pdf_text",
    "extract_pdf_pages",
    "PdfDocument",
    "PdfError",
]


class PdfError(ValueError):
    """Raised when the payload is not parseable as a PDF."""


# --------------------------------------------------------------------
# Writer
# --------------------------------------------------------------------

_LIT_ESCAPE = {ord("("): b"\\(", ord(")"): b"\\)", ord("\\"): b"\\\\",
               0x0A: b"\\n", 0x0D: b"\\r", 0x09: b"\\t",
               0x08: b"\\b", 0x0C: b"\\f"}


def _pdf_string(line: str) -> bytes:
    """Encode one text-show operand: literal string when latin-1-safe,
    UTF-16BE hex string (BOM-prefixed, per the spec's text-string
    convention) otherwise."""
    try:
        raw = line.encode("latin-1")
    except UnicodeEncodeError:
        return b"<" + (b"\xfe\xff" + line.encode("utf-16-be")).hex() \
            .encode("ascii") + b">"
    out = bytearray(b"(")
    for b in raw:
        esc = _LIT_ESCAPE.get(b)
        if esc is not None:
            out += esc
        elif 32 <= b < 127:
            out.append(b)
        else:
            out += b"\\%03o" % b
    out += b")"
    return bytes(out)


def write_text_pdf(text: str, *, lines_per_page: int = 40,
                   compress: bool = True) -> bytes:
    """Render ``text`` into a minimal but fully valid PDF.

    One ``Tj`` per line, ``T*`` between lines, ``ceil(n/lines_per_page)``
    pages. The output round-trips exactly through this module's reader.
    """
    lines = text.split("\n")
    pages = [lines[i:i + lines_per_page]
             for i in range(0, len(lines), lines_per_page)] or [[""]]

    objs: dict[int, bytes] = {}
    font_num = 3
    first_page_num = 4
    page_nums = []
    num = first_page_num
    for page_lines in pages:
        content = bytearray(b"BT /F1 11 Tf 13 TL 72 756 Td\n")
        for i, ln in enumerate(page_lines):
            if i:
                content += b"T* "
            content += _pdf_string(ln) + b" Tj\n"
        content += b"ET"
        data = bytes(content)
        if compress:
            comp = zlib.compress(data, 6)
            stream_obj = (b"<< /Length %d /Filter /FlateDecode >>\n"
                          b"stream\n" % len(comp)) + comp + b"\nendstream"
        else:
            stream_obj = (b"<< /Length %d >>\nstream\n"
                          % len(data)) + data + b"\nendstream"
        objs[num + 1] = stream_obj
        objs[num] = (b"<< /Type /Page /Parent 2 0 R "
                     b"/MediaBox [0 0 612 792] "
                     b"/Resources << /Font << /F1 %d 0 R >> >> "
                     b"/Contents %d 0 R >>" % (font_num, num + 1))
        page_nums.append(num)
        num += 2

    objs[1] = b"<< /Type /Catalog /Pages 2 0 R >>"
    kids = b" ".join(b"%d 0 R" % p for p in page_nums)
    objs[2] = (b"<< /Type /Pages /Kids [%s] /Count %d >>"
               % (kids, len(page_nums)))
    objs[font_num] = (b"<< /Type /Font /Subtype /Type1 "
                      b"/BaseFont /Helvetica >>")

    buf = bytearray(b"%PDF-1.4\n%\xe2\xe3\xcf\xd3\n")
    offsets: dict[int, int] = {}
    for onum in sorted(objs):
        offsets[onum] = len(buf)
        buf += b"%d 0 obj\n" % onum + objs[onum] + b"\nendobj\n"
    xref_pos = len(buf)
    n = max(objs) + 1
    buf += b"xref\n0 %d\n" % n
    buf += b"0000000000 65535 f \n"
    for onum in range(1, n):
        buf += b"%010d 00000 n \n" % offsets[onum]
    buf += (b"trailer\n<< /Size %d /Root 1 0 R >>\nstartxref\n%d\n"
            b"%%%%EOF\n" % (n, xref_pos))
    return bytes(buf)


# --------------------------------------------------------------------
# Object-level reader
# --------------------------------------------------------------------

_WS = b"\x00\t\n\x0c\r "
_DELIM = b"()<>[]{}/%"
_OBJ_RE = re.compile(rb"(\d+)\s+(\d+)\s+obj\b")
_NAME_RE = re.compile(rb"/([^\x00\t\n\x0c\r ()<>\[\]{}/%]*)")
_NUM_RE = re.compile(rb"[+-]?(?:\d+\.?\d*|\.\d+)")
_REF_RE = re.compile(rb"(\d+)\s+(\d+)\s+R\b")


class _Ref:
    __slots__ = ("num",)

    def __init__(self, num: int):
        self.num = num

    def __repr__(self):  # pragma: no cover - debug aid
        return f"Ref({self.num})"


class _PdfString(bytes):
    """String object — a bytes subclass so the content interpreter can
    tell ``(BT)`` the STRING apart from ``BT`` the OPERATOR (operator
    tokens are exactly ``bytes``, strings are ``_PdfString``)."""


class _Lexer:
    """Cursor over PDF object syntax: dicts, arrays, names, numbers,
    strings, refs. Shared by the object map and the content streams."""

    def __init__(self, data: bytes, pos: int = 0):
        self.data = data
        self.pos = pos

    def skip_ws(self) -> None:
        d, n = self.data, len(self.data)
        while self.pos < n:
            c = d[self.pos]
            if c in _WS:
                self.pos += 1
            elif c == 0x25:                      # % comment to EOL
                nl = d.find(b"\n", self.pos)
                self.pos = n if nl < 0 else nl + 1
            else:
                return

    def read_object(self):
        """Parse ONE object at the cursor; returns python value.
        Operators (content streams) come back as bytes tokens."""
        self.skip_ws()
        d = self.data
        if self.pos >= len(d):
            return None
        c = d[self.pos]
        if c == 0x3C:                             # '<'
            if d[self.pos + 1:self.pos + 2] == b"<":
                return self._read_dict()
            return self._read_hex_string()
        if c == 0x28:                             # '('
            return self._read_literal_string()
        if c == 0x2F:                             # '/'
            m = _NAME_RE.match(d, self.pos)
            self.pos = m.end()
            return "/" + m.group(1).decode("latin-1")
        if c == 0x5B:                             # '['
            self.pos += 1
            arr = []
            while True:
                self.skip_ws()
                if self.pos >= len(d) or d[self.pos] == 0x5D:
                    self.pos += 1
                    return arr
                arr.append(self.read_object())
        if c == 0x5D:                             # stray ']'
            self.pos += 1
            return b"]"
        if (0x30 <= c <= 0x39) or c in (0x2B, 0x2D, 0x2E):
            m = _REF_RE.match(d, self.pos)
            if m:
                self.pos = m.end()
                return _Ref(int(m.group(1)))
            m = _NUM_RE.match(d, self.pos)
            self.pos = m.end()
            tok = m.group(0)
            return float(tok) if b"." in tok else int(tok)
        # keyword / operator token
        start = self.pos
        while self.pos < len(d) and d[self.pos] not in _WS \
                and d[self.pos] not in _DELIM:
            self.pos += 1
        if self.pos == start:                     # lone delimiter
            self.pos += 1
            return d[start:self.pos]
        tok = d[start:self.pos]
        if tok == b"true":
            return True
        if tok == b"false":
            return False
        if tok == b"null":
            return None
        return tok

    def _read_dict(self) -> dict:
        self.pos += 2
        out: dict = {}
        d = self.data
        while True:
            self.skip_ws()
            if d[self.pos:self.pos + 2] == b">>":
                self.pos += 2
                return out
            if self.pos >= len(d):
                raise PdfError("unterminated dictionary")
            key = self.read_object()
            if not isinstance(key, str) or not key.startswith("/"):
                raise PdfError("dictionary key is not a name")
            out[key] = self.read_object()

    def _read_hex_string(self) -> bytes:
        end = self.data.find(b">", self.pos)
        if end < 0:
            raise PdfError("unterminated hex string")
        hx = re.sub(rb"\s+", b"", self.data[self.pos + 1:end])
        self.pos = end + 1
        if len(hx) % 2:
            hx += b"0"
        return _PdfString(bytes.fromhex(hx.decode("ascii")))

    def _read_literal_string(self) -> bytes:
        d = self.data
        i = self.pos + 1
        depth = 1
        out = bytearray()
        while i < len(d):
            c = d[i]
            if c == 0x5C:                         # backslash
                i += 1
                e = d[i:i + 1]
                if e == b"n":
                    out += b"\n"
                elif e == b"r":
                    out += b"\r"
                elif e == b"t":
                    out += b"\t"
                elif e == b"b":
                    out += b"\b"
                elif e == b"f":
                    out += b"\x0c"
                elif e in (b"(", b")", b"\\"):
                    out += e
                elif e and e in b"01234567":      # octal, 1-3 digits
                    oct_s = e
                    while len(oct_s) < 3 and d[i + 1:i + 2] in \
                            (b"0", b"1", b"2", b"3", b"4", b"5", b"6", b"7"):
                        i += 1
                        oct_s += d[i:i + 1]
                    out.append(int(oct_s, 8) & 0xFF)
                elif e == b"\n":                  # line continuation
                    pass
                elif e == b"\r":
                    if d[i + 1:i + 2] == b"\n":
                        i += 1
                else:
                    out += e
                i += 1
            elif c == 0x28:
                depth += 1
                out.append(c)
                i += 1
            elif c == 0x29:
                depth -= 1
                if depth == 0:
                    self.pos = i + 1
                    return _PdfString(out)
                out.append(c)
                i += 1
            else:
                out.append(c)
                i += 1
        raise PdfError("unterminated literal string")


def _decode_text_string(raw: bytes) -> str:
    """PDF text-string convention: UTF-16BE when BOM-prefixed, else
    treat as latin-1 (a practical superset of PDFDocEncoding's
    printable range, and exact for this module's own writer)."""
    if raw[:2] == b"\xfe\xff":
        return raw[2:].decode("utf-16-be", errors="replace")
    return raw.decode("latin-1")


class PdfDocument:
    """Parsed PDF: object map + page tree + text interpreter."""

    def __init__(self, data: bytes):
        if not data.startswith(b"%PDF-"):
            raise PdfError("missing %PDF header")
        self.data = data
        self._objects: dict[int, tuple[object, bytes | None]] = {}
        self._scan_objects()
        if not self._objects:
            raise PdfError("no indirect objects found")

    # -- object map ---------------------------------------------------

    def _scan_objects(self) -> None:
        """Build the object map by scanning ``N 0 obj`` headers — robust
        to damaged/absent xref tables (the spec-preferred xref walk
        degenerates to the same map for well-formed files)."""
        data = self.data
        for m in _OBJ_RE.finditer(data):
            # guard against matches inside streams: previous non-ws
            # byte must not be part of a larger token — obj headers in
            # real files start a line; accept when preceded by ws/BOF.
            s = m.start()
            if s and data[s - 1] not in _WS:
                continue
            lex = _Lexer(data, m.end())
            try:
                val = lex.read_object()
            except (PdfError, AttributeError, IndexError, ValueError):
                continue
            stream = None
            lex.skip_ws()
            if data[lex.pos:lex.pos + 6] == b"stream":
                p = lex.pos + 6
                if data[p:p + 2] == b"\r\n":
                    p += 2
                elif data[p:p + 1] in (b"\n", b"\r"):
                    p += 1
                length = val.get("/Length") if isinstance(val, dict) else None
                if isinstance(length, _Ref):
                    length = None                 # resolve after full scan
                if isinstance(length, (int, float)):
                    stream = data[p:p + int(length)]
                    if data[p + int(length):p + int(length) + 32] \
                            .lstrip(bytes(_WS)).startswith(b"endstream"):
                        pass                      # length was truthful
                    else:
                        stream = None
                if stream is None:                # fall back to scan
                    e = data.find(b"endstream", p)
                    if e < 0:
                        continue
                    stream = data[p:e].rstrip(b"\r\n")
            self._objects[int(m.group(1))] = (val, stream)

    def _resolve(self, obj):
        while isinstance(obj, _Ref):
            obj = self._objects.get(obj.num, (None, None))[0]
        return obj

    def _stream_bytes(self, num: int) -> bytes:
        val, stream = self._objects.get(num, (None, None))
        if stream is None:
            return b""
        filt = self._resolve(val.get("/Filter")) if isinstance(val, dict) \
            else None
        filters = filt if isinstance(filt, list) else [filt] if filt else []
        out = stream
        for f in filters:
            f = self._resolve(f)
            if f == "/FlateDecode":
                try:
                    out = zlib.decompress(out)
                except zlib.error as exc:
                    raise PdfError(f"bad FlateDecode stream: {exc}") from exc
            elif f == "/ASCIIHexDecode":
                hx = re.sub(rb"[^0-9A-Fa-f]", b"",
                            out.split(b">", 1)[0])
                if len(hx) % 2:
                    hx += b"0"
                out = bytes.fromhex(hx.decode("ascii"))
            else:
                raise PdfError(f"unsupported stream filter {f!r}")
        return out

    # -- page tree ----------------------------------------------------

    def _root_pages(self):
        """Locate the page-tree root: trailer /Root when present, else
        scan for the catalog, else None (flat /Type /Page scan)."""
        m = None
        for m in re.finditer(rb"trailer", self.data):
            pass
        if m is not None:
            lex = _Lexer(self.data, m.end())
            try:
                trailer = lex.read_object()
            except (PdfError, AttributeError, IndexError, ValueError):
                trailer = None
            if isinstance(trailer, dict):
                root = self._resolve(trailer.get("/Root"))
                if isinstance(root, dict):
                    return self._resolve(root.get("/Pages"))
        for _num, (val, _s) in sorted(self._objects.items()):
            if isinstance(val, dict) and val.get("/Type") == "/Catalog":
                return self._resolve(val.get("/Pages"))
        return None

    def pages(self) -> list[dict]:
        """Page dicts in document order (nested /Kids flattened)."""
        root = self._root_pages()
        out: list[dict] = []
        if isinstance(root, dict):
            stack = [root]
            seen = 0
            while stack:
                node = stack.pop(0)
                if not isinstance(node, dict):
                    continue
                seen += 1
                if seen > 100_000:
                    raise PdfError("page tree too deep/cyclic")
                if node.get("/Type") == "/Page":
                    out.append(node)
                else:
                    kids = self._resolve(node.get("/Kids")) or []
                    stack = [self._resolve(k) for k in kids] + stack
        if not out:                               # damaged tree: flat scan
            out = [v for _n, (v, _s) in sorted(self._objects.items())
                   if isinstance(v, dict) and v.get("/Type") == "/Page"]
        return out

    def _page_content(self, page: dict) -> bytes:
        contents = page.get("/Contents")
        refs = contents if isinstance(contents, list) else [contents]
        parts = []
        for r in refs:
            if isinstance(r, _Ref):
                parts.append(self._stream_bytes(r.num))
        return b"\n".join(parts)

    # -- content-stream text interpreter -------------------------------

    def page_lines(self, page: dict) -> list[tuple[float, float, str]]:
        """Interpret the page's content stream(s): returns one entry per
        text line as ``(x, y, text)`` — the pen position where the line
        started. Line breaks come from T*, ', \", and Td/TD/Tm moves."""
        content = self._page_content(page)
        lex = _Lexer(content)
        stack: list = []
        lines: list[tuple[float, float, str]] = []
        cur: list[str] = []
        x = y = 0.0
        line_x = line_y = 0.0
        leading = 0.0
        shown = False

        def flush():
            nonlocal shown
            if shown or cur:
                lines.append((line_x, line_y, "".join(cur)))
            cur.clear()
            shown = False

        def show(raw):
            nonlocal shown
            cur.append(_decode_text_string(raw))
            shown = True

        def newline(dx: float, dy: float):
            nonlocal x, y, line_x, line_y
            flush()
            x += dx
            y += dy
            line_x, line_y = x, y

        while lex.pos < len(content):
            obj = lex.read_object()
            if obj is None and lex.pos >= len(content):
                break
            if type(obj) is bytes:                # operator token
                op = obj
                if op == b"BT":
                    x = y = line_x = line_y = 0.0
                    stack.clear()
                elif op == b"ET":
                    flush()
                    stack.clear()
                elif op == b"Td":
                    if len(stack) >= 2:
                        newline(float(stack[-2]), float(stack[-1]))
                    stack.clear()
                elif op == b"TD":
                    if len(stack) >= 2:
                        leading = -float(stack[-1])
                        newline(float(stack[-2]), float(stack[-1]))
                    stack.clear()
                elif op == b"Tm":
                    if len(stack) >= 6:
                        flush()
                        x, y = float(stack[-2]), float(stack[-1])
                        line_x, line_y = x, y
                    stack.clear()
                elif op == b"T*":
                    newline(0.0, -leading)
                    stack.clear()
                elif op == b"TL":
                    if stack:
                        leading = float(stack[-1])
                    stack.clear()
                elif op == b"Tj":
                    if stack and isinstance(stack[-1], _PdfString):
                        show(stack[-1])
                    stack.clear()
                elif op == b"TJ":
                    if stack and isinstance(stack[-1], list):
                        for el in stack[-1]:
                            if isinstance(el, _PdfString):
                                show(el)
                    stack.clear()
                elif op == b"'":
                    newline(0.0, -leading)
                    if stack and isinstance(stack[-1], _PdfString):
                        show(stack[-1])
                    stack.clear()
                elif op == b'"':
                    newline(0.0, -leading)
                    if stack and isinstance(stack[-1], _PdfString):
                        show(stack[-1])
                    stack.clear()
                else:
                    # any other operator consumes its operands
                    stack.clear()
            else:
                stack.append(obj)
        flush()
        return lines

    def extract_pages(self) -> list[dict]:
        """Layout extraction: per page ``{"page": i, "lines": [(x, y,
        text), ...], "text": joined}``."""
        out = []
        for i, page in enumerate(self.pages()):
            lines = self.page_lines(page)
            out.append({
                "page": i,
                "lines": lines,
                "text": "\n".join(t for _x, _y, t in lines),
            })
        return out

    def extract_text(self) -> str:
        return "\n".join(p["text"] for p in self.extract_pages())


def extract_pdf_text(data: bytes) -> str:
    """Full-document text: pages joined with newlines."""
    return PdfDocument(data).extract_text()


def extract_pdf_pages(data: bytes) -> list[dict]:
    return PdfDocument(data).extract_pages()
