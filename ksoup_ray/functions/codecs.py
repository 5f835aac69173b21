"""Pure-stdlib/numpy media codecs for UNCOMPRESSED formats — the one
real decode path the container supports (no Pillow/cv2/ffmpeg here;
compressed formats stay honestly stubbed in multimodal.py).

* PPM (P6 binary): header ``P6\\n<w> <h>\\n255\\n`` + raw RGB rows.
* BMP (BITMAPINFOHEADER, 24-bit BI_RGB): bottom-up BGR rows padded to
  4 bytes.
* WAV (PCM 16-bit): via the stdlib ``wave`` module.

Encoders exist so the synthetic media generator can emit REAL payloads
whose decoded width/height/duration are closed-form functions of
doc_id — which makes the decode step value-checkable by the DuckDB
oracle end-to-end.
"""

from __future__ import annotations

import io
import struct
import wave

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
