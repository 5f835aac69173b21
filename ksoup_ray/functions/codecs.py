"""Pure-stdlib/numpy media codecs — every format here has a REAL
encode+decode path with zero third-party dependencies (no Pillow/cv2/
ffmpeg in this container; the formats that genuinely need them — JPEG,
MP4 — stay honestly stubbed in multimodal.py).

* PPM (P6 binary): header ``P6\\n<w> <h>\\n255\\n`` + raw RGB rows.
* BMP (BITMAPINFOHEADER, 24-bit BI_RGB): bottom-up BGR rows padded to
  4 bytes.
* WAV (PCM 16-bit): via the stdlib ``wave`` module.
* PNG (8-bit gray/RGB/RGBA, non-interlaced): a COMPRESSED format,
  implemented from the spec with stdlib ``zlib`` + numpy — chunk
  framing with CRC-32 validation, DEFLATE via zlib, and all five
  scanline filters (None/Sub/Up/Average/Paeth) on both sides.

Encoders exist so the synthetic media generator can emit REAL payloads
whose decoded width/height/duration are closed-form functions of
doc_id — which makes the decode step value-checkable by the DuckDB
oracle end-to-end.
"""

from __future__ import annotations

import io
import struct
import wave
import zlib

import numpy as np


# ---------------------------------------------------------------------------
# PPM (P6)

def encode_ppm(arr: np.ndarray) -> bytes:
    """(h, w, 3) uint8 → binary PPM."""
    if arr.ndim != 3 or arr.shape[2] != 3:
        raise ValueError(f"expected (h, w, 3), got {arr.shape}")
    h, w = arr.shape[:2]
    return f"P6\n{w} {h}\n255\n".encode() + \
        np.ascontiguousarray(arr, dtype=np.uint8).tobytes()


def decode_ppm(data: bytes) -> np.ndarray:
    """Binary PPM → (h, w, 3) uint8. Handles ``#`` comments and any
    whitespace between header tokens, per the netpbm spec."""
    if data[:2] != b"P6":
        raise ValueError("not a P6 PPM")
    pos = 2
    fields: list[int] = []
    while len(fields) < 3:
        # skip whitespace and comment lines
        while pos < len(data) and data[pos:pos + 1].isspace():
            pos += 1
        if data[pos:pos + 1] == b"#":
            nl = data.index(b"\n", pos)
            pos = nl + 1
            continue
        start = pos
        while pos < len(data) and not data[pos:pos + 1].isspace():
            pos += 1
        fields.append(int(data[start:pos]))
    pos += 1  # single whitespace byte after maxval
    w, h, maxval = fields
    if maxval != 255:
        raise ValueError(f"unsupported maxval {maxval}")
    n = w * h * 3
    arr = np.frombuffer(data, dtype=np.uint8, count=n, offset=pos)
    return arr.reshape(h, w, 3)


# ---------------------------------------------------------------------------
# BMP (24-bit BI_RGB)

def encode_bmp(arr: np.ndarray) -> bytes:
    """(h, w, 3) uint8 RGB → 24-bit uncompressed BMP."""
    if arr.ndim != 3 or arr.shape[2] != 3:
        raise ValueError(f"expected (h, w, 3), got {arr.shape}")
    h, w = arr.shape[:2]
    row_bytes = (w * 3 + 3) & ~3          # rows pad to 4-byte boundary
    img_size = row_bytes * h
    # pixel data: bottom-up, BGR
    bgr = np.ascontiguousarray(arr[::-1, :, ::-1], dtype=np.uint8)
    rows = np.zeros((h, row_bytes), dtype=np.uint8)
    rows[:, :w * 3] = bgr.reshape(h, w * 3)
    header = struct.pack("<2sIHHI", b"BM", 14 + 40 + img_size, 0, 0,
                         14 + 40)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, img_size,
                       2835, 2835, 0, 0)
    return header + info + rows.tobytes()


def decode_bmp(data: bytes) -> np.ndarray:
    """24-bit uncompressed BMP → (h, w, 3) uint8 RGB."""
    if data[:2] != b"BM":
        raise ValueError("not a BMP")
    (pixel_off,) = struct.unpack_from("<I", data, 10)
    hdr_size, w, h = struct.unpack_from("<Iii", data, 14)
    bpp, compression = struct.unpack_from("<HI", data, 28)[0], \
        struct.unpack_from("<I", data, 30)[0]
    if hdr_size < 40 or bpp != 24 or compression != 0:
        raise ValueError(
            f"unsupported BMP (hdr={hdr_size}, bpp={bpp}, "
            f"compression={compression})")
    flip = h > 0                           # positive height = bottom-up
    h = abs(h)
    row_bytes = (w * 3 + 3) & ~3
    rows = np.frombuffer(data, dtype=np.uint8, count=row_bytes * h,
                         offset=pixel_off).reshape(h, row_bytes)
    bgr = rows[:, :w * 3].reshape(h, w, 3)
    rgb = bgr[:, :, ::-1]
    return rgb[::-1] if flip else rgb


# ---------------------------------------------------------------------------
# WAV (PCM 16-bit)

def encode_wav(samples: np.ndarray, rate: int = 1000) -> bytes:
    """1-D int16 samples → mono PCM WAV (standard 44-byte header)."""
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(np.asarray(samples, dtype="<i2").tobytes())
    return buf.getvalue()


def decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """PCM WAV → ((frames, channels) int16 array, sample_rate)."""
    with wave.open(io.BytesIO(data), "rb") as w:
        if w.getsampwidth() != 2:
            raise ValueError(f"unsupported sample width "
                             f"{w.getsampwidth()} (16-bit PCM only)")
        rate = w.getframerate()
        ch = w.getnchannels()
        raw = w.readframes(w.getnframes())
    return np.frombuffer(raw, dtype="<i2").reshape(-1, ch), rate


def wav_duration_ms(data: bytes) -> int:
    """Duration in ms from the WAV header (frames / rate)."""
    with wave.open(io.BytesIO(data)) as w:
        return w.getnframes() * 1000 // w.getframerate()


# ---------------------------------------------------------------------------
# PNG (8-bit depth, color types 0 gray / 2 RGB / 6 RGBA, interlace 0)
#
# From-the-spec implementation (RFC 2083 / W3C PNG): the container's
# one REAL compressed-image path. DEFLATE comes from stdlib zlib; the
# work here is the chunk layer (length/tag/payload/CRC-32) and the
# five scanline filters. Filters predict each byte from reconstructed
# neighbours (left a, up b, upper-left c, at one-pixel stride), so:
#   None/Up      decode fully vectorized per row;
#   Sub          decode is a per-channel-lane prefix sum (cumsum mod
#                256 — modular addition commutes with the final mod);
#   Average/Paeth carry a loop over pixels (true sequential data
#                dependency on the freshly-reconstructed left pixel)
#                with the channel lane vectorized — the encoder side
#                of all five is fully vectorized because it predicts
#                from ORIGINAL bytes, which equal reconstructed bytes
#                in a lossless format.

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
_PNG_CHANNELS = {0: 1, 2: 3, 6: 4}


def _png_chunk(tag: bytes, payload: bytes) -> bytes:
    return (struct.pack(">I", len(payload)) + tag + payload
            + struct.pack(">I", zlib.crc32(tag + payload)))


def _paeth(a: np.ndarray, b: np.ndarray, c: np.ndarray) -> np.ndarray:
    """Vectorized Paeth predictor (PNG spec 6.6): pick the neighbour
    closest to a + b - c, ties broken left → up → upper-left."""
    p = a + b - c
    pa = np.abs(p - a)
    pb = np.abs(p - b)
    pc_ = np.abs(p - c)
    return np.where((pa <= pb) & (pa <= pc_), a,
                    np.where(pb <= pc_, b, c))


def encode_png(arr: np.ndarray, filters: str | int = "mixed",
               level: int = 6) -> bytes:
    """uint8 image → PNG bytes. (h, w) → grayscale (color type 0),
    (h, w, 3) → RGB (2), (h, w, 4) → RGBA (6). ``filters="mixed"``
    rotates the scanline filter ``y % 5`` so every decoder filter path
    is exercised by any image ≥ 5 rows; an int forces one filter."""
    arr = np.ascontiguousarray(arr, dtype=np.uint8)
    if arr.ndim == 2:
        color_type = 0
    elif arr.ndim == 3 and arr.shape[2] in (3, 4):
        color_type = {3: 2, 4: 6}[arr.shape[2]]
    else:
        raise ValueError(f"expected (h,w), (h,w,3) or (h,w,4), "
                         f"got {arr.shape}")
    ch = _PNG_CHANNELS[color_type]
    h, w = arr.shape[:2]
    if h == 0 or w == 0:
        raise ValueError("empty image")
    raw = arr.reshape(h, w * ch).astype(np.int16)
    zero_px = np.zeros(ch, dtype=np.int16)
    lines: list[bytes] = []
    prev = np.zeros(w * ch, dtype=np.int16)
    for y in range(h):
        row = raw[y]
        f = y % 5 if filters == "mixed" else int(filters)
        if f == 0:
            filt = row
        else:
            left = np.concatenate([zero_px, row[:-ch]])
            if f == 1:
                filt = row - left
            elif f == 2:
                filt = row - prev
            elif f == 3:
                filt = row - (left + prev) // 2
            elif f == 4:
                ul = np.concatenate([zero_px, prev[:-ch]])
                filt = row - _paeth(left, prev, ul)
            else:
                raise ValueError(f"bad filter {f}")
        lines.append(bytes([f])
                     + (filt & 0xFF).astype(np.uint8).tobytes())
        prev = row
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    idat = zlib.compress(b"".join(lines), level)
    return (_PNG_SIG + _png_chunk(b"IHDR", ihdr)
            + _png_chunk(b"IDAT", idat) + _png_chunk(b"IEND", b""))


def decode_png(data: bytes) -> np.ndarray:
    """PNG bytes → uint8 array: (h, w) for grayscale, (h, w, 3) RGB
    (including palette images), (h, w, 4) RGBA (including palette +
    tRNS). Validates the signature, every chunk's CRC-32 and the
    decompressed pixel-payload length, so truncation/corruption
    raises instead of yielding silently-short images (same contract as
    the WARC reader). Supports bit depth 8, color types 0/2/3/6,
    interlace 0; 16-bit/sub-byte depths/Adam7 raise ValueError."""
    if data[:8] != _PNG_SIG:
        raise ValueError("not a PNG")
    pos = 8
    ihdr: bytes | None = None
    idat = bytearray()
    plte: bytes | None = None
    trns: bytes | None = None
    while pos + 12 <= len(data):
        (ln,) = struct.unpack_from(">I", data, pos)
        tag = data[pos + 4:pos + 8]
        payload = data[pos + 8:pos + 8 + ln]
        if len(payload) != ln or pos + 12 + ln > len(data):
            raise ValueError("truncated PNG chunk")
        (crc,) = struct.unpack_from(">I", data, pos + 8 + ln)
        if zlib.crc32(tag + payload) != crc:
            raise ValueError(f"PNG chunk CRC mismatch in {tag!r}")
        pos += 12 + ln
        if tag == b"IHDR":
            ihdr = payload
        elif tag == b"IDAT":
            idat += payload
        elif tag == b"PLTE":
            plte = payload
        elif tag == b"tRNS":
            trns = payload
        elif tag == b"IEND":
            break
    if ihdr is None or not idat:
        raise ValueError("PNG missing IHDR/IDAT")
    w, h, depth, color_type, comp, filt, interlace = \
        struct.unpack(">IIBBBBB", ihdr)
    if depth != 8 or (color_type not in _PNG_CHANNELS
                      and color_type != 3) or comp != 0 \
            or filt != 0 or interlace != 0:
        raise ValueError(
            f"unsupported PNG (depth={depth}, color={color_type}, "
            f"interlace={interlace}) — 8-bit gray/RGB/RGBA/palette "
            "only")
    if color_type == 3 and (plte is None or len(plte) % 3):
        raise ValueError("palette PNG missing/invalid PLTE")
    ch = 1 if color_type == 3 else _PNG_CHANNELS[color_type]
    stride = w * ch
    raw = zlib.decompress(bytes(idat))
    if len(raw) != h * (1 + stride):
        raise ValueError("PNG pixel payload truncated")
    rows = np.frombuffer(raw, dtype=np.uint8).reshape(h, 1 + stride)
    ftypes = rows[:, 0]
    filt_rows = rows[:, 1:].astype(np.int16)
    out = np.empty((h, stride), dtype=np.int16)
    prev = np.zeros(stride, dtype=np.int16)
    zero_px = np.zeros(ch, dtype=np.int16)
    for y in range(h):
        f = ftypes[y]
        row = filt_rows[y]
        if f == 0:
            rec = row
        elif f == 1:
            # rec[x] = filt[x] + rec[x - ch]: prefix sum per lane
            rec = (np.cumsum(row.reshape(w, ch), axis=0, dtype=np.int64)
                   & 0xFF).astype(np.int16).reshape(stride)
        elif f == 2:
            rec = (row + prev) & 0xFF
        elif f in (3, 4):
            lanes = row.reshape(w, ch)
            prevl = prev.reshape(w, ch)
            recl = np.empty((w, ch), dtype=np.int16)
            left = zero_px
            ul = zero_px
            for x in range(w):
                if f == 3:
                    left = (lanes[x] + (left + prevl[x]) // 2) & 0xFF
                else:
                    left = (lanes[x]
                            + _paeth(left, prevl[x], ul)) & 0xFF
                    ul = prevl[x]
                recl[x] = left
            rec = recl.reshape(stride)
        else:
            raise ValueError(f"bad PNG filter type {f}")
        out[y] = rec
        prev = rec
    img = out.astype(np.uint8).reshape(h, w, ch)
    if color_type == 3:
        idx = img[:, :, 0]
        pal = np.frombuffer(plte, np.uint8).reshape(-1, 3)
        if idx.max(initial=0) >= len(pal):
            raise ValueError("PNG palette index out of range")
        rgb = pal[idx]
        if trns is None:
            return rgb
        alpha = np.full(len(pal), 255, np.uint8)
        alpha[:len(trns)] = np.frombuffer(trns, np.uint8)
        return np.concatenate([rgb, alpha[idx][:, :, None]], axis=2)
    return img[:, :, 0] if ch == 1 else img


# ---------------------------------------------------------------------------
# GIF (87a/89a, single image frame)
#
# From-the-spec implementation of the one format here whose
# compression is NOT in the stdlib: variable-code-width LZW, written
# both directions. Decoder handles global/local color tables,
# interlacing, sub-block framing, and the GCE transparent index
# (returned as an alpha channel); encoder writes GIF89a with a real
# growing-dictionary LZW (clear codes on table overflow).

def _gif_lzw_decode(data: bytes, min_code_size: int,
                    n_pixels: int) -> np.ndarray:
    """GIF LZW stream → uint8 index array of exactly n_pixels."""
    clear = 1 << min_code_size
    eoi = clear + 1
    # bit reader: GIF packs codes LSB-first
    out = np.empty(n_pixels, np.uint8)
    n_out = 0
    table: list[bytes] = [bytes([i]) for i in range(clear)] + [b"", b""]
    code_size = min_code_size + 1
    prev: bytes | None = None
    acc = 0
    nbits = 0
    pos = 0
    while True:
        while nbits < code_size:
            if pos >= len(data):
                raise ValueError("GIF LZW stream exhausted mid-code")
            acc |= data[pos] << nbits
            nbits += 8
            pos += 1
        code = acc & ((1 << code_size) - 1)
        acc >>= code_size
        nbits -= code_size
        if code == clear:
            table = [bytes([i]) for i in range(clear)] + [b"", b""]
            code_size = min_code_size + 1
            prev = None
            continue
        if code == eoi:
            break
        if prev is None:
            if code >= len(table):
                raise ValueError("GIF LZW: first code not a literal")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + entry[:1])
        elif code == len(table):                 # KwKwK case
            entry = prev + prev[:1]
            table.append(entry)
        else:
            raise ValueError("GIF LZW code out of range")
        if n_out + len(entry) > n_pixels:
            raise ValueError("GIF LZW produced too many pixels")
        out[n_out:n_out + len(entry)] = np.frombuffer(entry, np.uint8)
        n_out += len(entry)
        prev = entry
        if len(table) == (1 << code_size) and code_size < 12:
            code_size += 1
        if n_out == n_pixels:
            break
    if n_out != n_pixels:
        raise ValueError(
            f"GIF LZW short: {n_out} of {n_pixels} pixels")
    return out


def _gif_lzw_encode(indices: np.ndarray, min_code_size: int) -> bytes:
    """uint8 index array → GIF LZW stream (growing dictionary,
    clear code emitted on table overflow)."""
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()
    acc = 0
    nbits = 0

    def emit(code: int, size: int):
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += size
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    table: dict[bytes, int] = {bytes([i]): i for i in range(clear)}
    next_code = eoi + 1
    code_size = min_code_size + 1
    emit(clear, code_size)
    data = indices.tobytes()
    if not data:
        raise ValueError("empty GIF frame")
    w = data[0:1]
    for i in range(1, len(data)):
        c = data[i:i + 1]
        if w + c in table:
            w = w + c
            continue
        emit(table[w], code_size)
        table[w + c] = next_code
        next_code += 1
        if next_code > (1 << code_size) and code_size < 12:
            code_size += 1
        if next_code >= 4096:
            emit(clear, code_size)
            table = {bytes([j]): j for j in range(clear)}
            next_code = eoi + 1
            code_size = min_code_size + 1
        w = c
    emit(table[w], code_size)
    emit(eoi, code_size)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


_GIF_INTERLACE = ((0, 8), (4, 8), (2, 4), (1, 2))


def decode_gif(data: bytes) -> np.ndarray:
    """GIF bytes → uint8 (h, w, 3) RGB, or (h, w, 4) RGBA when the
    first frame's graphic-control extension declares a transparent
    index. Decodes the FIRST image block (animation frames beyond it
    are out of scope for the still-image pipeline). Truncated or
    corrupt payloads raise ValueError, never silently short images."""
    if data[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF")
    try:
        return _decode_gif_body(data)
    except (struct.error, IndexError) as e:
        raise ValueError(f"truncated/corrupt GIF: {e}") from e


def _decode_gif_body(data: bytes) -> np.ndarray:
    sw, sh, flags, _bg, _ar = struct.unpack_from("<HHBBB", data, 6)
    pos = 13
    gct = None
    if flags & 0x80:
        n = 2 << (flags & 0x07)
        gct = np.frombuffer(data, np.uint8, 3 * n, pos).reshape(n, 3)
        pos += 3 * n
    transparent = None
    while pos < len(data):
        b = data[pos]
        if b == 0x21:                            # extension
            label = data[pos + 1]
            pos += 2
            if label == 0xF9:                    # graphic control
                size = data[pos]
                if size >= 4 and data[pos + 1] & 0x01:
                    transparent = data[pos + 4]
            while data[pos]:                     # skip sub-blocks
                pos += 1 + data[pos]
            pos += 1
        elif b == 0x2C:                          # image descriptor
            x, y, iw, ih, f = struct.unpack_from("<HHHHB", data,
                                                 pos + 1)
            pos += 10
            pal = gct
            if f & 0x80:                         # local color table
                n = 2 << (f & 0x07)
                pal = np.frombuffer(data, np.uint8, 3 * n,
                                    pos).reshape(n, 3)
                pos += 3 * n
            if pal is None:
                raise ValueError("GIF image has no color table")
            min_code = data[pos]
            pos += 1
            lzw = bytearray()
            while data[pos]:
                n = data[pos]
                lzw += data[pos + 1:pos + 1 + n]
                pos += 1 + n
            pos += 1
            idx = _gif_lzw_decode(bytes(lzw), min_code, iw * ih) \
                .reshape(ih, iw)
            if f & 0x40:                         # de-interlace
                ordered = np.empty_like(idx)
                src = 0
                for start, step in _GIF_INTERLACE:
                    rows = range(start, ih, step)
                    ordered[list(rows)] = idx[src:src + len(rows)]
                    src += len(rows)
                idx = ordered
            if idx.max(initial=0) >= len(pal):
                raise ValueError("GIF palette index out of range")
            rgb = pal[idx]
            if transparent is not None:
                alpha = np.where(idx == transparent, 0, 255) \
                    .astype(np.uint8)
                return np.concatenate([rgb, alpha[:, :, None]], axis=2)
            return rgb
        elif b == 0x3B:                          # trailer
            break
        else:
            raise ValueError(f"unknown GIF block 0x{b:02X}")
    raise ValueError("GIF contained no image block")


def encode_gif(indices: np.ndarray, palette: np.ndarray,
               interlace: bool = False) -> bytes:
    """(h, w) uint8 palette indices + (n, 3) uint8 palette → GIF89a.
    Palette size is padded to the next power of two (>= 2)."""
    if indices.ndim != 2:
        raise ValueError(f"expected (h, w) indices, got {indices.shape}")
    h, w = indices.shape
    n = len(palette)
    bits = max(1, (n - 1).bit_length())
    size = 1 << bits
    pal = np.zeros((size, 3), np.uint8)
    pal[:n] = palette
    if indices.max(initial=0) >= n:
        raise ValueError("index out of palette range")
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80 | ((bits - 1) << 4)
                       | (bits - 1), 0, 0)
    out += pal.tobytes()
    ilflag = 0x40 if interlace else 0
    out += b"\x2C" + struct.pack("<HHHHB", 0, 0, w, h, ilflag)
    rows = indices
    if interlace:
        order = []
        for start, step in _GIF_INTERLACE:
            order.extend(range(start, h, step))
        rows = indices[order]
    min_code = max(2, bits)
    out.append(min_code)
    lzw = _gif_lzw_encode(rows.ravel(), min_code)
    for i in range(0, len(lzw), 255):
        chunk = lzw[i:i + 255]
        out.append(len(chunk))
        out += chunk
    out += b"\x00\x3B"
    return bytes(out)
