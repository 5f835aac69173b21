"""Multimodal column plumbing: opaque ``binary`` payloads + typed
metadata, processed by actor-pool stages.

Decode status (honest accounting):

* UNCOMPRESSED formats — binary PPM, 24-bit BMP, PCM WAV — have REAL
  pure-numpy/stdlib decoders (``functions/codecs.py``) and are decoded
  end-to-end: the synthetic generator emits genuine PPM/WAV payloads
  whose decoded width/height/duration are closed-form in doc_id, so
  the decode step itself is value-checked by the DuckDB oracle.
* PNG is REAL too — a from-the-spec stdlib-zlib + numpy codec
  (``codecs.encode_png/decode_png``: chunk CRCs, DEFLATE, all five
  scanline filters). ``synth_png_batch`` emits PNGs whose pixels are
  closed-form arithmetic in (doc_id, x, y, c), so the full
  inflate→unfilter path is on the DuckDB oracle's hash
  (``png_decode``), and ``synth_variant_images`` mixes PNG and PPM
  encodings of the same pixels so the visual-dedup family proves the
  two decoders agree byte-exactly.
* JPEG is REAL (``functions/jpeg.py`` — from-scratch baseline
  huffman+DCT codec), GIF is REAL (``codecs.decode_gif`` — LZW), and
  VIDEO is REAL for YUV4MPEG2 and MJPEG-AVI (``functions/video.py`` —
  from-the-spec stream/RIFF containers; the mixed media table's video
  third is genuine Y4M whose planes are closed-form in doc_id, so
  video decode is on the DuckDB hash path too).
* Only formats needing external codecs this container lacks
  (webp/avif/H.264-MP4/...) raise ``NotImplementedError`` at the
  decode call (clearly marked below), which is where Pillow/cv2/
  ffmpeg plugs in. ``decode_stub=True`` substitutes a deterministic
  fake so the Ray-side plumbing stays exercised regardless.

Scale notes: binary payloads are large → run these stages with a SMALL
``batch_size`` (16-64) and let ``DataContext.target_max_block_size``
keep blocks bounded; payloads stay in Arrow binary buffers end-to-end
(no per-row Python copies beyond the decode call itself).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

from .codecs import (_PNG_SIG, decode_bmp, decode_png, decode_ppm,
                     decode_wav, encode_png, encode_ppm, encode_wav,
                     wav_duration_ms)
from ..engine.pdf import extract_pdf_pages, write_text_pdf

MEDIA_META = pa.struct([
    ("media_type", pa.string()),    # image | audio | video
    ("format", pa.string()),        # ppm/bmp/wav/png/mp4/...
    ("width", pa.int32()),
    ("height", pa.int32()),
    ("duration_ms", pa.int32()),
])


def _fake_decode_image(data: bytes) -> np.ndarray:
    """Deterministic stand-in for a COMPRESSED-format image decoder:
    derives a tiny pseudo-'pixel' array from the payload bytes."""
    h = hashlib.blake2b(data, digest_size=16).digest()
    side = 4
    arr = np.frombuffer((h * (side * side * 3 // 16 + 1))[: side * side * 3],
                        dtype=np.uint8)
    return arr.reshape(side, side, 3)


def decode_image(data: bytes) -> np.ndarray:
    """REAL image decode dispatched on magic bytes — P6 PPM, 24-bit
    BMP, PNG (from-scratch stdlib-zlib codec, incl. palette), and
    baseline JPEG (from-scratch huffman+DCT codec, functions/jpeg.py)
    — normalized to an (h, w, 3) RGB array: grayscale broadcasts to 3
    channels, RGBA drops alpha. Formats beyond these (webp/avif/...)
    are where Pillow/cv2 plugs in."""
    def to_rgb(img: np.ndarray) -> np.ndarray:
        if img.ndim == 2:
            return np.repeat(img[:, :, None], 3, axis=2)
        return img[:, :, :3]

    if data[:2] == b"P6":
        return decode_ppm(data)
    if data[:2] == b"BM":
        return decode_bmp(data)
    if data[:8] == _PNG_SIG:
        return to_rgb(decode_png(data))
    if data[:2] == b"\xFF\xD8":
        from .jpeg import decode_jpeg
        return to_rgb(decode_jpeg(data))
    raise NotImplementedError(
        "image decode beyond ppm/bmp/png/jpeg requires Pillow/cv2 — "
        "not in this container; plug the decoder in here")


def _resample_to(img: np.ndarray, side: int) -> np.ndarray:
    """Nearest-neighbor resize to (side, side, 3) — pure index math,
    the fixed-size front end of the feature projection."""
    h, w = img.shape[:2]
    ys = np.minimum((np.arange(side) * h) // side, h - 1)
    xs = np.minimum((np.arange(side) * w) // side, w - 1)
    return img[np.ix_(ys, xs)]


class ImageFeatures:
    """Actor-pool stage: binary image column → feature vector + shape.

    Real decoder + projection 'model' load once per actor in __init__
    (model-load pattern). With ``decode_stub=False`` the stage REALLY
    decodes PPM/BMP payloads (variable size; nearest-neighbor
    resampled to 4×4 before projection); compressed formats raise at
    the decode call. ``decode_stub=True`` keeps the fixed fake."""

    def __init__(self, media_col: str = "media", dim: int = 16,
                 decode_stub: bool = True, seed: int = 5):
        self.media_col = media_col
        self.decode_stub = decode_stub
        rng = np.random.RandomState(seed)
        self.side = 4
        self.projection = rng.randn(self.side * self.side * 3,
                                    dim).astype(np.float32)

    def _decode(self, data: bytes) -> np.ndarray:
        if self.decode_stub:
            return _fake_decode_image(data)
        return decode_image(data)

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch.column(self.media_col).to_pylist()
        feats: list[list[float]] = []
        shapes: list[tuple[int, int]] = []
        for data in payloads:
            img = self._decode(data or b"")
            shapes.append((img.shape[1], img.shape[0]))
            small = _resample_to(img, self.side)
            flat = small.astype(np.float32).ravel() / 255.0
            feats.append((flat @ self.projection).tolist())
        out = batch.append_column(
            "features", pa.array(feats, pa.list_(pa.float32())))
        out = out.append_column(
            "width", pa.array([s[0] for s in shapes], pa.int32()))
        out = out.append_column(
            "height", pa.array([s[1] for s in shapes], pa.int32()))
        return out


class MediaFeatures:
    """Actor-pool stage over a MIXED media table: dispatch on the typed
    metadata and decode what the container really can — images
    (PPM/BMP/PNG/GIF/JPEG) → decoded width/height, PCM WAV audio →
    decoded duration, Y4M video → decoded dims + frame-count duration
    — leaving NULLs only for formats whose codecs this container
    genuinely lacks. The decoded columns are the oracle-checked proof
    the decode path runs."""

    def __init__(self, media_col: str = "media", meta_col: str = "meta"):
        self.media_col = media_col
        self.meta_col = meta_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch.column(self.media_col).to_pylist()
        metas = batch.column(self.meta_col).to_pylist()
        widths: list[int | None] = []
        heights: list[int | None] = []
        durations: list[int | None] = []
        for data, meta in zip(payloads, metas):
            meta = meta or {}
            mt = meta.get("media_type")
            w = h = d = None
            if mt == "image":
                img = decode_image(data or b"")
                h_, w_ = img.shape[:2]
                w, h = int(w_), int(h_)
            elif mt == "audio":
                d = wav_duration_ms(data or b"")
            elif mt == "video" and meta.get("format") == "y4m":
                from .video import decode_y4m
                frames, (num, den) = decode_y4m(data or b"")
                t, h_, w_ = frames.shape[:3]
                w, h = int(w_), int(h_)
                d = t * 1000 * den // num
            # other video containers (H.264 mp4 etc.): no codec in
            # this container — decode stays stubbed, NULLs out
            widths.append(w)
            heights.append(h)
            durations.append(d)
        out = batch.append_column("decoded_width",
                                  pa.array(widths, pa.int32()))
        out = out.append_column("decoded_height",
                                pa.array(heights, pa.int32()))
        out = out.append_column("decoded_duration_ms",
                                pa.array(durations, pa.int32()))
        return out


class FrameSampler:
    """Video frame-sampling stage (stubbed decode): emits ``n_frames``
    per row via flat-map-style row expansion — one output row per
    sampled frame, payload sliced deterministically."""

    def __init__(self, media_col: str = "media", n_frames: int = 3,
                 decode_stub: bool = True):
        self.media_col = media_col
        self.n_frames = n_frames
        self.decode_stub = decode_stub

    def __call__(self, batch: pa.Table) -> pa.Table:
        if not self.decode_stub:
            raise NotImplementedError(
                "real frame sampling requires ffmpeg/av — plug in here")
        payloads = batch.column(self.media_col).to_pylist()
        ids = batch.column("media_id").to_pylist() \
            if "media_id" in batch.column_names else list(range(len(payloads)))
        out_ids: list = []
        frame_idx: list[int] = []
        frames: list[bytes] = []
        for mid, data in zip(ids, payloads):
            data = data or b""
            step = max(1, len(data) // max(1, self.n_frames))
            for f in range(self.n_frames):
                out_ids.append(mid)
                frame_idx.append(f)
                frames.append(data[f * step:(f + 1) * step][:64])
        return pa.table({
            "media_id": pa.array(out_ids),
            "frame_idx": pa.array(frame_idx, pa.int32()),
            "frame": pa.array(frames, pa.binary()),
        })


def synth_pdf_batch(batch: pa.Table, *, words_per_line: int = 8,
                    lines_per_page: int = 5) -> pa.Table:
    """Deterministic PDF payloads from the documents table: word-wrap
    ``text`` (fixed words-per-line) and render with the from-scratch
    writer (engine/pdf.py) — real multi-page FlateDecode PDFs whose
    page count is closed-form in the word count, so the whole
    write→parse→extract path is value-checkable by a SQL oracle."""
    ids = batch.column("doc_id")
    texts = batch.column("text").to_pylist()
    pdfs: list[bytes] = []
    for t in texts:
        words = (t or "").split(" ")
        wrapped = "\n".join(
            " ".join(words[i:i + words_per_line])
            for i in range(0, len(words), words_per_line))
        pdfs.append(write_text_pdf(wrapped, lines_per_page=lines_per_page))
    return pa.table({"doc_id": ids, "pdf": pa.array(pdfs, pa.binary())})


class PdfExtract:
    """Actor-pool stage: binary PDF column → extracted text + layout
    counts. The PDF grammar tables / regexes compile once per actor
    (module import), per-doc parse work happens in __call__ — the same
    shape as the HTML ParseExtract stage."""

    def __init__(self, pdf_col: str = "pdf", unwrap_lines: bool = False):
        self.pdf_col = pdf_col
        self.unwrap_lines = unwrap_lines

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch.column(self.pdf_col).to_pylist()
        texts: list[str] = []
        n_pages: list[int] = []
        n_lines: list[int] = []
        for data in payloads:
            pages = extract_pdf_pages(data or b"")
            txt = "\n".join(p["text"] for p in pages)
            if self.unwrap_lines:
                txt = txt.replace("\n", " ")
            texts.append(txt)
            n_pages.append(len(pages))
            n_lines.append(sum(len(p["lines"]) for p in pages))
        out = batch.drop_columns([self.pdf_col])
        out = out.append_column("pdf_text", pa.array(texts, pa.string()))
        out = out.append_column("n_pages", pa.array(n_pages, pa.int64()))
        out = out.append_column("n_lines", pa.array(n_lines, pa.int64()))
        return out


def _pixels(doc_id: int, n: int) -> np.ndarray:
    """n deterministic bytes from a doc_id-keyed blake2b stream."""
    out = bytearray()
    counter = 0
    while len(out) < n:
        out += hashlib.blake2b(f"{doc_id}:{counter}".encode(),
                               digest_size=64).digest()
        counter += 1
    return np.frombuffer(bytes(out[:n]), dtype=np.uint8)


def synth_media_batch(batch: pa.Table) -> pa.Table:
    """Deterministic media payloads from the documents table — the
    test/bench stand-in for real crawled bytes. Image and audio rows
    are REAL PPM / PCM-WAV payloads (decodable by functions/codecs.py)
    whose decoded dimensions are closed-form in doc_id:

    * image (doc_id%3==0): PPM, width = 4 + doc_id%13,
      height = 3 + doc_id%7 → n_bytes = 9 + len(str(w)) + len(str(h))
      + 3*w*h;
    * audio (doc_id%3==1): mono 16-bit WAV @ 1000 Hz,
      duration_ms = 1000 + doc_id%5000 → n_bytes = 44 + 2*duration_ms;
    * video (doc_id%3==2): REAL YUV4MPEG2 clip (functions/video.py)
      with the synth_y4m_batch closed-form planes over
      w = 4 + doc_id%9, h = 3 + doc_id%6, n = 3 + doc_id%5 frames
      @ 25 fps → duration_ms = 40*n, n_bytes = 33 + digits(w)
      + digits(h) + n*(6 + 3*w*h).
    """
    from .video import _y4m_dims, encode_y4m
    doc_ids = batch.column("doc_id").to_pylist()
    payloads: list[bytes] = []
    metas: list[dict] = []
    for doc_id in doc_ids:
        kind = doc_id % 3
        if kind == 0:
            w = 4 + doc_id % 13
            h = 3 + doc_id % 7
            img = _pixels(doc_id, w * h * 3).reshape(h, w, 3)
            payloads.append(encode_ppm(img))
            metas.append({"media_type": "image", "format": "ppm",
                          "width": w, "height": h, "duration_ms": None})
        elif kind == 1:
            duration_ms = 1000 + doc_id % 5000
            samples = _pixels(doc_id, duration_ms * 2).view(np.int16)
            payloads.append(encode_wav(samples, rate=1000))
            metas.append({"media_type": "audio", "format": "wav",
                          "width": None, "height": None,
                          "duration_ms": duration_ms})
        else:
            w, h, n, cut = _y4m_dims(doc_id)
            x = np.arange(w)[None, None, :]
            y = np.arange(h)[None, :, None]
            t = np.arange(n)[:, None, None]
            frames = np.stack([
                (doc_id + 3 * x + 7 * y + 11 * t
                 + 128 * (t >= cut)) % 256,
                (2 * doc_id + 5 * x + y + 17 * t) % 256,
                (3 * doc_id + x + 9 * y + 23 * t) % 256,
            ], axis=3).astype(np.uint8)
            payloads.append(encode_y4m(frames, rate=(25, 1),
                                       colorspace="444"))
            metas.append({"media_type": "video", "format": "y4m",
                          "width": w, "height": h,
                          "duration_ms": 40 * n})
    return pa.table({
        "media_id": batch.column("doc_id"),
        "media": pa.array(payloads, pa.binary()),
        "meta": pa.array(metas, MEDIA_META),
    })


def synth_variant_images(batch: pa.Table) -> pa.Table:
    """Deterministic NEAR-DUP image corpus for the visual-dedup
    family (re-hosted/re-encoded thumbnail stand-in): groups of 4
    consecutive doc_ids share one base image (dims and pixels seeded
    by ``doc_id // 4``); variant ``k = doc_id % 4`` bumps a single
    pixel's red channel by ``3k``, so in-group dHash distances sit at
    0-3 bits (whatever the luma rounding yields) while cross-group
    images stay far apart. Odd variants are encoded as PNG, even ones
    as PPM — the literal re-encoded-thumbnail scenario — so the pair
    mining only works if the two REAL decoders agree pixel-exactly."""
    doc_ids = batch.column("doc_id").to_pylist()
    payloads: list[bytes] = []
    metas: list[dict] = []
    for doc_id in doc_ids:
        base = doc_id // 4
        k = doc_id % 4
        w = 6 + base % 11
        h = 5 + base % 5
        img = _pixels(base, w * h * 3).reshape(h, w, 3).copy()
        img[0, 0, 0] = np.uint8((int(img[0, 0, 0]) + 3 * k) % 256)
        if k % 2:
            payloads.append(encode_png(img))
            fmt = "png"
        else:
            payloads.append(encode_ppm(img))
            fmt = "ppm"
        metas.append({"media_type": "image", "format": fmt,
                      "width": w, "height": h, "duration_ms": None})
    return pa.table({
        "media_id": batch.column("doc_id"),
        "media": pa.array(payloads, pa.binary()),
        "meta": pa.array(metas, MEDIA_META),
    })


def synth_png_batch(batch: pa.Table) -> pa.Table:
    """Deterministic PNG payloads whose PIXELS (not just dims) are
    SQL-computable: pixel[y, x, c] = (doc_id + 7x + 13y + 101c) % 256
    over w = 4 + doc_id % 13, h = 3 + doc_id % 7. Encoded with the
    rotating y % 5 scanline filter, so decoding back to the closed-form
    pixel sum exercises chunk CRCs, DEFLATE, and ALL FIVE unfilter
    paths — a DuckDB oracle can replay the sum with generate_series,
    putting the entire compressed decode on the hash path."""
    doc_ids = batch.column("doc_id").to_pylist()
    payloads: list[bytes] = []
    metas: list[dict] = []
    for doc_id in doc_ids:
        w = 4 + doc_id % 13
        h = 3 + doc_id % 7
        img = ((doc_id
                + 7 * np.arange(w)[None, :, None]
                + 13 * np.arange(h)[:, None, None]
                + 101 * np.arange(3)[None, None, :]) % 256
               ).astype(np.uint8)
        payloads.append(encode_png(img, filters="mixed"))
        metas.append({"media_type": "image", "format": "png",
                      "width": w, "height": h, "duration_ms": None})
    return pa.table({
        "media_id": batch.column("doc_id"),
        "media": pa.array(payloads, pa.binary()),
        "meta": pa.array(metas, MEDIA_META),
    })


def _synth_smooth_image(doc_id: int) -> np.ndarray:
    """Deterministic smooth test image for the lossy-codec family:
    w = 9 + doc_id % 16, h = 7 + doc_id % 12 (mostly NOT 8-multiples,
    so MCU padding/cropping is always on the path), low-frequency
    cosine gradients per channel."""
    w = 9 + doc_id % 16
    h = 7 + doc_id % 12
    yy, xx = np.mgrid[0:h, 0:w]
    img = np.stack([
        128 + 80 * np.cos(xx / 9.0 + doc_id % 7) * np.cos(yy / 8.0),
        128 + 60 * np.sin(xx / 11.0) * np.cos(yy / 10.0 + doc_id % 5),
        128 + 50 * np.cos((xx + yy) / 13.0 + doc_id % 3)], axis=2)
    return np.clip(np.round(img), 0, 255).astype(np.uint8)


class JpegRoundTrip:
    """Actor-pool stage proving the from-scratch BASELINE JPEG codec
    (functions/jpeg.py) end-to-end under the driver's oracle: per doc,
    synthesize the smooth closed-form image, encode (quality 90,
    subsampling alternating 4:4:4 / 4:2:0 by doc parity), DECODE with
    the full huffman+IDCT path, and emit the decoded dimensions plus
    a boolean error-bound witness. JPEG is lossy so there is no
    byte-exact replay, but the bound is tight enough (measured worst
    case 5 / 12 across the corpus shapes; asserted at 2x margin) that
    any real decoder defect — wrong zigzag, table mixup, IDCT scale,
    plane misalignment — blows through it and breaks the hash."""

    MAX_ERR_444 = 12
    MAX_ERR_420 = 24
    MAX_MEAN = 6.0

    def __call__(self, batch: pa.Table) -> pa.Table:
        from .jpeg import decode_jpeg, encode_jpeg
        doc_ids = batch.column("doc_id").to_pylist()
        widths: list[int] = []
        heights: list[int] = []
        subs: list[str] = []
        n_bytes: list[int] = []
        ok: list[bool] = []
        for doc_id in doc_ids:
            img = _synth_smooth_image(doc_id)
            sub = "420" if doc_id % 2 else "444"
            data = encode_jpeg(img, quality=90, subsample=sub)
            dec = decode_jpeg(data)
            err = np.abs(dec.astype(np.int64) - img.astype(np.int64))
            bound = self.MAX_ERR_420 if sub == "420" \
                else self.MAX_ERR_444
            widths.append(int(dec.shape[1]))
            heights.append(int(dec.shape[0]))
            subs.append(sub)
            n_bytes.append(len(data))
            ok.append(bool(err.max() <= bound
                           and err.mean() <= self.MAX_MEAN))
        return pa.table({
            "media_id": pa.array(doc_ids, pa.int64()),
            "width": pa.array(widths, pa.int32()),
            "height": pa.array(heights, pa.int32()),
            "subsample": pa.array(subs, pa.string()),
            "roundtrip_ok": pa.array(ok, pa.bool_()),
        })


def synth_gif_batch(batch: pa.Table) -> pa.Table:
    """Deterministic GIF payloads whose palette AND indices are
    SQL-computable: palette[k] = ((3k)%256, (5k+7)%256, (11k+13)%256)
    over 64 entries; index[y, x] = (doc_id + 3x + 7y) % 64 over
    w = 5 + doc_id % 12, h = 4 + doc_id % 9. Interlacing alternates
    by doc parity, so decoding back to the closed-form pixel sum
    exercises the LZW decoder, sub-block framing, palette mapping and
    BOTH row orders."""
    from .codecs import encode_gif
    doc_ids = batch.column("doc_id").to_pylist()
    k = np.arange(64, dtype=np.int64)
    palette = np.stack([(3 * k) % 256, (5 * k + 7) % 256,
                        (11 * k + 13) % 256], axis=1).astype(np.uint8)
    payloads: list[bytes] = []
    metas: list[dict] = []
    for doc_id in doc_ids:
        w = 5 + doc_id % 12
        h = 4 + doc_id % 9
        idx = ((doc_id + 3 * np.arange(w)[None, :]
                + 7 * np.arange(h)[:, None]) % 64).astype(np.uint8)
        payloads.append(encode_gif(idx, palette,
                                   interlace=bool(doc_id % 2)))
        metas.append({"media_type": "image", "format": "gif",
                      "width": w, "height": h, "duration_ms": None})
    return pa.table({
        "media_id": batch.column("doc_id"),
        "media": pa.array(payloads, pa.binary()),
        "meta": pa.array(metas, MEDIA_META),
    })


class GifDecodeStats:
    """Actor-pool stage: GIF column → decoded width/height + int64 sum
    of every RGB channel value — the oracle's closed-form witness that
    the LZW stream really decompressed and mapped through the palette
    (any mis-decode shifts the sum)."""

    def __init__(self, media_col: str = "media"):
        self.media_col = media_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        from .codecs import decode_gif
        payloads = batch.column(self.media_col).to_pylist()
        widths: list[int] = []
        heights: list[int] = []
        sums: list[int] = []
        for data in payloads:
            img = decode_gif(data or b"")
            rgb = img[:, :, :3]
            heights.append(int(img.shape[0]))
            widths.append(int(img.shape[1]))
            sums.append(int(rgb.astype(np.int64).sum()))
        out = batch.drop_columns([self.media_col])
        out = out.append_column("width", pa.array(widths, pa.int32()))
        out = out.append_column("height",
                                pa.array(heights, pa.int32()))
        return out.append_column("pixel_sum",
                                 pa.array(sums, pa.int64()))


class PngDecodeStats:
    """Actor-pool stage: PNG column → decoded width/height and the
    int64 sum of every channel value — the value the oracle recomputes
    in closed form. A wrong filter implementation, a skipped CRC, or a
    truncated inflate all shift the sum, so this is the strongest
    SQL-checkable witness the decode is byte-exact."""

    def __init__(self, media_col: str = "media"):
        self.media_col = media_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch.column(self.media_col).to_pylist()
        widths: list[int] = []
        heights: list[int] = []
        sums: list[int] = []
        for data in payloads:
            img = decode_png(data or b"")
            heights.append(int(img.shape[0]))
            widths.append(int(img.shape[1]))
            sums.append(int(img.astype(np.int64).sum()))
        out = batch.drop_columns([self.media_col])
        out = out.append_column("width", pa.array(widths, pa.int32()))
        out = out.append_column("height",
                                pa.array(heights, pa.int32()))
        return out.append_column("pixel_sum",
                                 pa.array(sums, pa.int64()))


def _luma_int(img: np.ndarray) -> np.ndarray:
    """Integer ITU-R 601 luma: (299 R + 587 G + 114 B) // 1000 —
    exact integer arithmetic, no float rounding to disagree about."""
    px = img.astype(np.int64)
    return (299 * px[..., 0] + 587 * px[..., 1]
            + 114 * px[..., 2]) // 1000


def _resample_rect(img: np.ndarray, rows: int, cols: int) -> np.ndarray:
    """Nearest-neighbor resize to (rows, cols, ...) — pure index math
    (the rectangular form of ``_resample_to``)."""
    h, w = img.shape[:2]
    ys = np.minimum((np.arange(rows) * h) // rows, h - 1)
    xs = np.minimum((np.arange(cols) * w) // cols, w - 1)
    return img[np.ix_(ys, xs)]


def dhash64(img: np.ndarray) -> int:
    """64-bit difference hash (dHash) of a decoded H×W×3 image: luma →
    nearest-neighbor 8×9 → one bit per horizontally-adjacent pair
    (left < right), row-major MSB-first. The standard perceptual
    near-dup fingerprint for images (Krawetz 2013) — integer-exact,
    so two workers can never disagree about a hash."""
    small = _luma_int(_resample_rect(img, 8, 9))
    bits = (small[:, 1:] < small[:, :-1]).ravel()
    out = 0
    for b in bits:
        out = (out << 1) | int(b)
    return out


class ImageDHash:
    """Actor-pool stage: binary image column → 64-bit perceptual hash
    (hex). REAL decode for the formats this container can handle
    (PPM/BMP via functions/codecs.py); rows whose metadata is not an
    image pass through with a NULL hash. Grouping equal/near dhashes
    downstream is image near-dup — the visual analogue of simhash."""

    def __init__(self, media_col: str = "media",
                 meta_col: str = "meta"):
        self.media_col = media_col
        self.meta_col = meta_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch.column(self.media_col).to_pylist()
        metas = batch.column(self.meta_col).to_pylist()
        hashes: list[str | None] = []
        for data, meta in zip(payloads, metas):
            if (meta or {}).get("media_type") != "image":
                hashes.append(None)
                continue
            img = decode_image(data or b"")
            hashes.append(format(dhash64(img), "016x"))
        return batch.append_column("dhash_hex",
                                   pa.array(hashes, pa.string()))


class AudioStats:
    """Actor-pool stage: PCM-WAV column → integer signal features —
    sample count, zero-crossing count (signbit flips between adjacent
    samples) and the int64 energy sum Σ s². All-integer outputs: two
    runs (or the pytest reference) can never drift. Non-audio rows
    pass through with NULLs."""

    def __init__(self, media_col: str = "media",
                 meta_col: str = "meta"):
        self.media_col = media_col
        self.meta_col = meta_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch.column(self.media_col).to_pylist()
        metas = batch.column(self.meta_col).to_pylist()
        ns: list[int | None] = []
        zcs: list[int | None] = []
        sumsqs: list[int | None] = []
        for data, meta in zip(payloads, metas):
            if (meta or {}).get("media_type") != "audio":
                ns.append(None)
                zcs.append(None)
                sumsqs.append(None)
                continue
            samples, _rate = decode_wav(data or b"")
            s = samples.astype(np.int64)
            ns.append(len(s))
            zcs.append(int(np.count_nonzero(
                np.signbit(s[:-1]) != np.signbit(s[1:]))))
            sumsqs.append(int((s * s).sum()))
        out = batch.append_column("n_samples",
                                  pa.array(ns, pa.int64()))
        out = out.append_column("zero_crossings",
                                pa.array(zcs, pa.int64()))
        return out.append_column("energy_sumsq",
                                 pa.array(sumsqs, pa.int64()))
