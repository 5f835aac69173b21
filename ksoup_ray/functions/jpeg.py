"""From-scratch BASELINE JPEG codec (ITU-T T.81 sequential DCT,
huffman entropy coding) in pure numpy + stdlib — no Pillow/cv2.

Decoder: SOF0/SOF1 frames, grayscale or YCbCr, component sampling
factors h, v in {1, 2} (4:4:4 / 4:2:2 / 4:2:0), 8- and 16-bit DQT,
multiple DHT segments, DRI/RSTn restart intervals, 0xFF00 byte
unstuffing. Entropy decode is a per-symbol Python walk (JPEG huffman
is inherently sequential); everything after the symbol stream —
dequantize, un-zigzag, IDCT, plane assembly, upsample, color
convert — is vectorized numpy over ALL blocks at once.

Encoder: baseline JFIF with the Annex K quantization tables scaled by
the IJG quality formula and the Annex K huffman tables; 4:4:4 or
4:2:0 (box-filtered chroma). Deterministic: pure integer/float numpy,
no dithering.

JPEG is lossy, so unlike the PNG codec there is no byte-exact oracle;
the witnesses are (a) round-trip error bounds on smooth images wide
enough to catch any real defect (a wrong zigzag, table, or IDCT
scaling produces garbage, not +-2), (b) unit tests of each table /
transform against published constants and an O(N^4) direct DCT, and
(c) decoding externally-encoded baseline fixtures (CPython's test
python.jpg, IPython's 2x2.jpg) to the right dimensions with pinned
pixel checksums.
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------------------
# constants (ITU-T T.81 Annex K — public tables)

# zigzag[k] = natural (row-major) index of the k-th zigzag coefficient
ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10,
    17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63], dtype=np.int64)

QUANT_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99], dtype=np.int64)

QUANT_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99], dtype=np.int64)

DC_LUMA_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_LUMA_VALS = list(range(12))
DC_CHROMA_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
DC_CHROMA_VALS = list(range(12))

AC_LUMA_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
AC_LUMA_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
    0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
    0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
    0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
    0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
    0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA]

AC_CHROMA_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
AC_CHROMA_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
    0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
    0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
    0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
    0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
    0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
    0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
    0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
    0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
    0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
    0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA]

# orthonormal 8x8 DCT-II basis: A @ A.T == I, and S = A s A^T is
# exactly T.81's FDCT (1/4 C(u)C(v) sum ...) scaling
_A = np.zeros((8, 8))
for _u in range(8):
    _c = np.sqrt(0.5) if _u == 0 else 1.0
    for _x in range(8):
        _A[_u, _x] = 0.5 * _c * np.cos((2 * _x + 1) * _u * np.pi / 16)
del _u, _x, _c


def fdct2d(blocks: np.ndarray) -> np.ndarray:
    """(n, 8, 8) level-shifted samples → (n, 8, 8) DCT coefficients."""
    return np.einsum("ux,nxy,vy->nuv", _A, blocks, _A)


def idct2d(coefs: np.ndarray) -> np.ndarray:
    """(n, 8, 8) DCT coefficients → (n, 8, 8) samples (pre-shift)."""
    return np.einsum("xu,nuv,yv->nxy", _A.T, coefs, _A.T)


# ---------------------------------------------------------------------------
# huffman tables

def _build_decode_table(bits: list[int], vals: list[int]) -> dict:
    """Canonical JPEG code assignment: {(length, code): symbol}."""
    table = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return table


def _build_encode_table(bits: list[int], vals: list[int]) -> dict:
    """{symbol: (code, length)} — inverse of the decode assignment."""
    out = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


class _BitReader:
    """MSB-first bit reader over an unstuffed entropy segment."""

    __slots__ = ("data", "pos", "bit")

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.bit = 0

    def read_bit(self) -> int:
        if self.pos >= len(self.data):
            raise ValueError("JPEG entropy data exhausted mid-symbol")
        b = (self.data[self.pos] >> (7 - self.bit)) & 1
        self.bit += 1
        if self.bit == 8:
            self.bit = 0
            self.pos += 1
        return b

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def decode_symbol(self, table: dict) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.read_bit()
            sym = table.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid JPEG huffman code (>16 bits)")


def _extend(v: int, s: int) -> int:
    """T.81 F.2.2.1 EXTEND: map magnitude bits to a signed value."""
    return v if v >= (1 << (s - 1)) else v - (1 << s) + 1


# ---------------------------------------------------------------------------
# decoder

def decode_jpeg(data: bytes) -> np.ndarray:
    """Baseline JPEG → uint8 array: (h, w) grayscale or (h, w, 3)
    RGB. Progressive (SOF2) and arithmetic coding raise ValueError."""
    if data[:2] != b"\xFF\xD8":
        raise ValueError("not a JPEG (no SOI)")
    pos = 2
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict] = {}   # (class 0=DC/1=AC, id)
    frame = None
    restart_interval = 0
    while pos + 4 <= len(data):
        if data[pos] != 0xFF:
            raise ValueError(f"JPEG marker sync lost at {pos}")
        marker = data[pos + 1]
        if marker == 0xD9:                       # EOI
            break
        (ln,) = struct.unpack_from(">H", data, pos + 2)
        seg = data[pos + 4:pos + 2 + ln]
        if len(seg) != ln - 2:
            raise ValueError("truncated JPEG segment")
        if marker == 0xDB:                       # DQT
            s = 0
            while s < len(seg):
                prec, tid = seg[s] >> 4, seg[s] & 0x0F
                s += 1
                if prec == 0:
                    qt[tid] = np.frombuffer(
                        seg, np.uint8, 64, s).astype(np.int64)
                    s += 64
                else:
                    qt[tid] = np.frombuffer(
                        seg, ">u2", 64, s).astype(np.int64)
                    s += 128
        elif marker == 0xC4:                     # DHT
            s = 0
            while s < len(seg):
                cls, tid = seg[s] >> 4, seg[s] & 0x0F
                bits = list(seg[s + 1:s + 17])
                n = sum(bits)
                vals = list(seg[s + 17:s + 17 + n])
                huff[(cls, tid)] = _build_decode_table(bits, vals)
                s += 17 + n
        elif marker in (0xC0, 0xC1):             # SOF0/SOF1 baseline
            prec = seg[0]
            if prec != 8:
                raise ValueError(f"unsupported precision {prec}")
            h, w = struct.unpack_from(">HH", seg, 1)
            ncomp = seg[5]
            comps = []
            for c in range(ncomp):
                cid = seg[6 + 3 * c]
                hv = seg[7 + 3 * c]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0x0F,
                              "tq": seg[8 + 3 * c]})
            frame = {"w": w, "h": h, "comps": comps}
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
                        0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError(
                f"unsupported JPEG frame type FF{marker:02X} "
                "(baseline sequential only)")
        elif marker == 0xDD:                     # DRI
            (restart_interval,) = struct.unpack_from(">H", seg, 0)
        elif marker == 0xDA:                     # SOS — scan follows
            if frame is None:
                raise ValueError("JPEG SOS before SOF")
            ns = seg[0]
            scan_tables = {}
            for c in range(ns):
                cid = seg[1 + 2 * c]
                td, ta = seg[2 + 2 * c] >> 4, seg[2 + 2 * c] & 0x0F
                scan_tables[cid] = (td, ta)
            return _decode_scan(data, pos + 2 + ln, frame, qt, huff,
                                scan_tables, restart_interval)
        pos += 2 + ln
    raise ValueError("JPEG ended without a scan")


def _decode_scan(data: bytes, pos: int, frame, qt, huff, scan_tables,
                 restart_interval: int) -> np.ndarray:
    # split entropy bytes into restart segments, unstuffing FF00
    segments: list[bytes] = []
    cur = bytearray()
    i = pos
    while i < len(data):
        b = data[i]
        if b != 0xFF:
            cur.append(b)
            i += 1
            continue
        nxt = data[i + 1] if i + 1 < len(data) else 0xD9
        if nxt == 0x00:
            cur.append(0xFF)
            i += 2
        elif 0xD0 <= nxt <= 0xD7:                # RSTn
            segments.append(bytes(cur))
            cur = bytearray()
            i += 2
        else:                                    # EOI or next marker
            break
    segments.append(bytes(cur))

    comps = frame["comps"]
    w, h = frame["w"], frame["h"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    n_mcu = mcux * mcuy
    # coefficient store per component: (blocks_y, blocks_x, 64)
    store = [np.zeros((mcuy * c["v"], mcux * c["h"], 64), np.int64)
             for c in comps]
    preds = [0] * len(comps)
    reader = _BitReader(segments[0])
    seg_idx = 0
    for m in range(n_mcu):
        if restart_interval and m and m % restart_interval == 0:
            seg_idx += 1
            if seg_idx >= len(segments):
                raise ValueError("missing JPEG restart segment")
            reader = _BitReader(segments[seg_idx])
            preds = [0] * len(comps)
        my, mx = divmod(m, mcux)
        for ci, c in enumerate(comps):
            td, ta = scan_tables[c["id"]]
            dc_tab = huff[(0, td)]
            ac_tab = huff[(1, ta)]
            for by in range(c["v"]):
                for bx in range(c["h"]):
                    blk = np.zeros(64, np.int64)
                    s = reader.decode_symbol(dc_tab)
                    diff = _extend(reader.read_bits(s), s) if s else 0
                    preds[ci] += diff
                    blk[0] = preds[ci]
                    k = 1
                    while k < 64:
                        rs = reader.decode_symbol(ac_tab)
                        r, s = rs >> 4, rs & 0x0F
                        if s == 0:
                            if r == 15:          # ZRL: 16 zeros
                                k += 16
                                continue
                            break                # EOB
                        k += r
                        if k > 63:
                            raise ValueError("JPEG AC run overflow")
                        blk[k] = _extend(reader.read_bits(s), s)
                        k += 1
                    store[ci][my * c["v"] + by, mx * c["h"] + bx] = blk

    # vectorized back half: dequantize -> un-zigzag -> IDCT -> planes
    planes = []
    for ci, c in enumerate(comps):
        zz = store[ci].reshape(-1, 64) * qt[c["tq"]][None, :]
        nat = np.zeros_like(zz)
        nat[:, ZIGZAG] = zz
        px = idct2d(nat.reshape(-1, 8, 8).astype(np.float64)) + 128.0
        by, bx = store[ci].shape[:2]
        plane = px.reshape(by, bx, 8, 8).transpose(0, 2, 1, 3) \
            .reshape(by * 8, bx * 8)
        # crop to the component's true size, then upsample to full res
        cw = -(-w * c["h"] // hmax)
        ch = -(-h * c["v"] // vmax)
        plane = plane[:ch, :cw]
        if c["h"] != hmax or c["v"] != vmax:
            plane = np.repeat(np.repeat(plane, vmax // c["v"], axis=0),
                              hmax // c["h"], axis=1)
        planes.append(plane[:h, :w])
    if len(planes) == 1:
        return np.clip(np.round(planes[0]), 0, 255).astype(np.uint8)
    y, cb, cr = planes[0], planes[1] - 128.0, planes[2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    rgb = np.stack([r, g, b], axis=2)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)


# ---------------------------------------------------------------------------
# encoder

class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int):
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            byte = (self.acc >> (self.nbits - 8)) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:
                self.out.append(0x00)            # byte stuffing
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def flush(self):
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)      # pad with 1-bits


def _quality_scale(tbl: np.ndarray, quality: int) -> np.ndarray:
    """IJG quality scaling of an Annex K table."""
    quality = min(100, max(1, quality))
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    return np.clip((tbl * scale + 50) // 100, 1, 255)


def _encode_blocks(writer: _BitWriter, blocks: np.ndarray,
                   q: np.ndarray, dc_tab: dict, ac_tab: dict,
                   pred: int) -> int:
    """Quantize + entropy-encode (n, 8, 8) level-shifted blocks with
    one shared DC predictor; returns the updated predictor."""
    coefs = fdct2d(blocks)
    # q is in natural (row-major) order, same as the coefficients
    quant = np.round(coefs.reshape(-1, 64) / q[None, :]) \
        .astype(np.int64)
    # reorder each block into zigzag sequence
    zz = quant[:, ZIGZAG]
    for row in zz:
        diff = int(row[0]) - pred
        pred = int(row[0])
        s = int(abs(diff)).bit_length()
        code, ln = dc_tab[s]
        writer.write(code, ln)
        if s:
            writer.write(diff if diff >= 0 else diff + (1 << s) - 1, s)
        run = 0
        nz = np.flatnonzero(row[1:]) + 1
        last = nz[-1] if len(nz) else 0
        k = 1
        while k <= last:
            v = int(row[k])
            if v == 0:
                run += 1
                k += 1
                continue
            while run >= 16:
                code, ln = ac_tab[0xF0]          # ZRL
                writer.write(code, ln)
                run -= 16
            s = abs(v).bit_length()
            code, ln = ac_tab[(run << 4) | s]
            writer.write(code, ln)
            writer.write(v if v >= 0 else v + (1 << s) - 1, s)
            run = 0
            k += 1
        if last < 63:
            code, ln = ac_tab[0x00]              # EOB
            writer.write(code, ln)
    return pred


def _plane_blocks(plane: np.ndarray) -> np.ndarray:
    """Edge-pad a float plane to 8-multiples and cut into
    (by, bx, 8, 8) blocks."""
    h, w = plane.shape
    ph, pw = -(-h // 8) * 8, -(-w // 8) * 8
    padded = np.pad(plane, ((0, ph - h), (0, pw - w)), mode="edge")
    return padded.reshape(ph // 8, 8, pw // 8, 8).transpose(0, 2, 1, 3)


def encode_jpeg(arr: np.ndarray, quality: int = 90,
                subsample: str = "444") -> bytes:
    """uint8 image → baseline JFIF bytes. (h, w) grayscale or
    (h, w, 3) RGB; ``subsample`` '444' or '420' (RGB only)."""
    arr = np.asarray(arr, dtype=np.uint8)
    gray = arr.ndim == 2
    if not gray and (arr.ndim != 3 or arr.shape[2] != 3):
        raise ValueError(f"expected (h,w) or (h,w,3), got {arr.shape}")
    h, w = arr.shape[:2]
    if h == 0 or w == 0:
        raise ValueError("empty image")
    if gray:
        subsample = "444"
    if subsample not in ("444", "420"):
        raise ValueError(f"unsupported subsampling {subsample!r}")

    ql = _quality_scale(QUANT_LUMA, quality)
    qc = _quality_scale(QUANT_CHROMA, quality)
    dc_l = _build_encode_table(DC_LUMA_BITS, DC_LUMA_VALS)
    ac_l = _build_encode_table(AC_LUMA_BITS, AC_LUMA_VALS)
    dc_c = _build_encode_table(DC_CHROMA_BITS, DC_CHROMA_VALS)
    ac_c = _build_encode_table(AC_CHROMA_BITS, AC_CHROMA_VALS)

    if gray:
        y = arr.astype(np.float64)
        planes = [y]
    else:
        px = arr.astype(np.float64)
        r, g, b = px[:, :, 0], px[:, :, 1], px[:, :, 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        if subsample == "420":
            # box-filter chroma over 2x2 (pad odd dims by edge first)
            def down(p):
                ph, pw = -(-p.shape[0] // 2) * 2, -(-p.shape[1] // 2) * 2
                p = np.pad(p, ((0, ph - p.shape[0]),
                               (0, pw - p.shape[1])), mode="edge")
                return (p[0::2, 0::2] + p[0::2, 1::2]
                        + p[1::2, 0::2] + p[1::2, 1::2]) / 4.0
            cb, cr = down(cb), down(cr)
        planes = [y, cb, cr]

    # header
    out = bytearray(b"\xFF\xD8")
    out += b"\xFF\xE0" + struct.pack(">H", 16) + b"JFIF\x00" \
        + bytes([1, 1, 0]) + struct.pack(">HH", 1, 1) + bytes([0, 0])

    def dqt(tid: int, tbl: np.ndarray) -> bytes:
        return (b"\xFF\xDB" + struct.pack(">H", 67) + bytes([tid])
                + bytes(int(v) for v in tbl))

    # DQT payload is in zigzag order
    out += dqt(0, ql[ZIGZAG])
    if not gray:
        out += dqt(1, qc[ZIGZAG])

    sampling = (2, 2) if subsample == "420" else (1, 1)
    ncomp = 1 if gray else 3
    sof = bytearray(struct.pack(">BHHB", 8, h, w, ncomp))
    comp_meta = [(1, sampling if not gray else (1, 1), 0)]
    if not gray:
        comp_meta += [(2, (1, 1), 1), (3, (1, 1), 1)]
    for cid, (ch_, cv_), tq in comp_meta:
        sof += bytes([cid, (ch_ << 4) | cv_, tq])
    out += b"\xFF\xC0" + struct.pack(">H", len(sof) + 2) + sof

    def dht(cls: int, tid: int, bits: list[int],
            vals: list[int]) -> bytes:
        payload = bytes([(cls << 4) | tid]) + bytes(bits) + bytes(vals)
        return b"\xFF\xC4" + struct.pack(">H", len(payload) + 2) \
            + payload

    out += dht(0, 0, DC_LUMA_BITS, DC_LUMA_VALS)
    out += dht(1, 0, AC_LUMA_BITS, AC_LUMA_VALS)
    if not gray:
        out += dht(0, 1, DC_CHROMA_BITS, DC_CHROMA_VALS)
        out += dht(1, 1, AC_CHROMA_BITS, AC_CHROMA_VALS)

    sos = bytearray([ncomp])
    for cid, _, tq in comp_meta:
        sos += bytes([cid, 0x00 if tq == 0 else 0x11])
    sos += bytes([0, 63, 0])
    out += b"\xFF\xDA" + struct.pack(">H", len(sos) + 2) + sos

    # entropy-coded data: interleaved MCUs
    writer = _BitWriter()
    hmax, vmax = (sampling if not gray else (1, 1))
    blocks = [_plane_blocks(p - 128.0) for p in planes]
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    # pad block grids so every MCU is complete
    grids = []
    for ci, bl in enumerate(blocks):
        want_y = mcuy * (vmax if ci == 0 else 1)
        want_x = mcux * (hmax if ci == 0 else 1)
        by, bx = bl.shape[:2]
        if by < want_y or bx < want_x:
            bl = np.pad(bl, ((0, want_y - by), (0, want_x - bx),
                             (0, 0), (0, 0)), mode="edge")
        grids.append(bl)
    preds = [0] * ncomp
    tabs = [(ql, dc_l, ac_l)] + [(qc, dc_c, ac_c)] * (ncomp - 1)
    for m in range(mcux * mcuy):
        my, mx = divmod(m, mcux)
        for ci in range(ncomp):
            ch_ = hmax if ci == 0 else 1
            cv_ = vmax if ci == 0 else 1
            mb = grids[ci][my * cv_:(my + 1) * cv_,
                           mx * ch_:(mx + 1) * ch_].reshape(-1, 8, 8)
            q, dct_, act_ = tabs[ci]
            preds[ci] = _encode_blocks(writer, mb, q, dct_, act_,
                                       preds[ci])
    writer.flush()
    out += writer.out
    out += b"\xFF\xD9"
    return bytes(out)
