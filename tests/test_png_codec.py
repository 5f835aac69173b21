"""From-scratch PNG codec (functions/codecs.encode_png/decode_png):
round-trips across every filter and color type, interop with
externally-encoded (libpng-family) fixtures, corruption rejection,
and cross-codec pixel agreement with the PPM path that the visual
near-dup family relies on."""

import os

import numpy as np
import pyarrow as pa
import pytest

from ksoup_ray.functions.codecs import (decode_png, decode_ppm,
                                        encode_png, encode_ppm)
from ksoup_ray.functions.multimodal import (PngDecodeStats, decode_image,
                                            dhash64, synth_png_batch,
                                            synth_variant_images)

FIXTURES = os.path.join(os.path.dirname(__file__), "fixtures", "png")


@pytest.mark.parametrize("shape", [(7, 11, 3), (5, 4, 4), (6, 9),
                                   (1, 1, 3), (12, 3, 3), (3, 17),
                                   (1, 40), (40, 1, 4)])
@pytest.mark.parametrize("filt", ["mixed", 0, 1, 2, 3, 4])
def test_round_trip_all_filters_and_color_types(shape, filt):
    rng = np.random.RandomState(hash((shape, str(filt))) % 2**31)
    a = rng.randint(0, 256, size=shape, dtype=np.uint8)
    b = decode_png(encode_png(a, filters=filt))
    assert b.shape == a.shape
    assert (b == a).all()


def test_mixed_filter_rotation_hits_all_five():
    # y % 5 rotation: a 10-row image carries every filter type twice
    a = np.arange(10 * 6 * 3, dtype=np.uint8).reshape(10, 6, 3)
    data = encode_png(a, filters="mixed")
    import zlib as _z
    import struct as _s
    # walk chunks to the IDAT payload
    pos, idat = 8, b""
    while pos + 12 <= len(data):
        (ln,) = _s.unpack_from(">I", data, pos)
        tag = data[pos + 4:pos + 8]
        if tag == b"IDAT":
            idat += data[pos + 8:pos + 8 + ln]
        pos += 12 + ln
    raw = _z.decompress(idat)
    stride = 6 * 3 + 1
    ftypes = [raw[y * stride] for y in range(10)]
    assert ftypes == [0, 1, 2, 3, 4, 0, 1, 2, 3, 4]
    assert (decode_png(data) == a).all()


def test_external_encoder_interop_fixtures():
    """Decode PNGs produced by a REAL external encoder (Sphinx doc
    icons shipped with python3-doc, libpng-family output): pins
    shape, dtype, total pixel sum, and corner pixels. This is the
    independent-reference check that the from-scratch decoder
    implements the spec, not just its own encoder."""
    img = decode_png(open(os.path.join(FIXTURES, "file.png"), "rb").read())
    assert img.shape == (16, 16, 4) and img.dtype == np.uint8
    assert int(img.astype(np.int64).sum()) == 176330
    assert img[0, 0].tolist() == [153, 153, 153, 172]

    minus = decode_png(open(os.path.join(FIXTURES, "minus.png"), "rb").read())
    plus = decode_png(open(os.path.join(FIXTURES, "plus.png"), "rb").read())
    assert minus.shape == (11, 11) and plus.shape == (11, 11)
    assert int(minus.astype(np.int64).sum()) == 26161
    assert int(plus.astype(np.int64).sum()) == 24979
    # plus is minus with the vertical bar added: strictly darker
    assert int(plus.astype(np.int64).sum()) < int(minus.astype(np.int64).sum())


def test_corruption_and_truncation_rejected():
    a = np.arange(60, dtype=np.uint8).reshape(4, 5, 3)
    data = encode_png(a)
    bad = bytearray(data)
    bad[40] ^= 0xFF                       # flip a byte inside IDAT
    with pytest.raises(ValueError, match="CRC"):
        decode_png(bytes(bad))
    with pytest.raises(ValueError):
        decode_png(data[:-20])            # truncated chunk
    with pytest.raises(ValueError, match="not a PNG"):
        decode_png(b"\x89PNX" + data[4:])
    # unsupported/invalid configurations raise, never mis-decode
    import struct as _s
    import zlib as _z

    def synth_png(depth, color_type, raw):
        ihdr = _s.pack(">IIBBBBB", 4, 4, depth, color_type, 0, 0, 0)
        c1 = (_s.pack(">I", len(ihdr)) + b"IHDR" + ihdr
              + _s.pack(">I", _z.crc32(b"IHDR" + ihdr)))
        idat = _z.compress(raw)
        c2 = (_s.pack(">I", len(idat)) + b"IDAT" + idat
              + _s.pack(">I", _z.crc32(b"IDAT" + idat)))
        return b"\x89PNG\r\n\x1a\n" + c1 + c2

    with pytest.raises(ValueError, match="unsupported"):
        decode_png(synth_png(16, 2, b"\x00" * 100))   # 16-bit depth
    with pytest.raises(ValueError, match="PLTE"):
        decode_png(synth_png(8, 3, b"\x00" * 20))     # palette, no PLTE


def test_palette_png_decodes_via_plte():
    """Palette (color type 3) support: index pixels map through PLTE;
    the external python.png fixture (same logo as the lossless PPM)
    is byte-checked in test_jpeg_codec against the PPM decoder."""
    import struct as _s
    import zlib as _z
    idx = np.array([[0, 1], [2, 1]], np.uint8)
    pal = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255])   # R, G, B entries
    ihdr = _s.pack(">IIBBBBB", 2, 2, 8, 3, 0, 0, 0)
    raw = b"".join(b"\x00" + idx[y].tobytes() for y in range(2))

    def chunk(tag, payload):
        return (_s.pack(">I", len(payload)) + tag + payload
                + _s.pack(">I", _z.crc32(tag + payload)))

    data = (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
            + chunk(b"PLTE", pal)
            + chunk(b"IDAT", _z.compress(raw)) + chunk(b"IEND", b""))
    img = decode_png(data)
    assert img.shape == (2, 2, 3)
    assert img[0, 0].tolist() == [255, 0, 0]
    assert img[0, 1].tolist() == [0, 255, 0]
    assert img[1, 0].tolist() == [0, 0, 255]


def test_decode_image_normalizes_png_shapes():
    gray = np.arange(30, dtype=np.uint8).reshape(5, 6)
    out = decode_image(encode_png(gray))
    assert out.shape == (5, 6, 3)
    assert (out[:, :, 0] == gray).all() and (out[:, :, 2] == gray).all()
    rgba = np.arange(5 * 6 * 4, dtype=np.uint8).reshape(5, 6, 4)
    out = decode_image(encode_png(rgba))
    assert out.shape == (5, 6, 3)
    assert (out == rgba[:, :, :3]).all()


def test_cross_codec_pixel_and_dhash_agreement():
    """The re-encoded-thumbnail scenario: the SAME pixels through PPM
    and PNG must decode identically and therefore share a dHash —
    otherwise the visual near-dup join is meaningless."""
    rng = np.random.RandomState(7)
    for _ in range(5):
        h, w = rng.randint(5, 14, size=2)
        a = rng.randint(0, 256, size=(h, w, 3), dtype=np.uint8)
        via_ppm = decode_image(encode_ppm(a))
        via_png = decode_image(encode_png(a))
        assert (via_ppm == via_png).all()
        assert dhash64(via_ppm) == dhash64(via_png)


def test_variant_corpus_mixes_encodings_losslessly():
    batch = pa.table({"doc_id": pa.array(list(range(8)), pa.int64())})
    media = synth_variant_images(batch)
    fmts = [m["format"] for m in media.column("meta").to_pylist()]
    assert fmts == ["ppm", "png", "ppm", "png"] * 2
    # variants 0 and 1 of group 0 differ ONLY in the bumped pixel,
    # across the two encodings
    payloads = media.column("media").to_pylist()
    img0 = decode_image(payloads[0])
    img1 = decode_image(payloads[1])
    assert img0.shape == img1.shape
    diff = (img0.astype(np.int64) - img1.astype(np.int64)) != 0
    assert diff.sum() == 1 and diff[0, 0, 0]


def test_png_decode_stats_stage_matches_closed_form():
    ids = [0, 1, 5, 42, 99]
    batch = pa.table({"doc_id": pa.array(ids, pa.int64()),
                      "text": pa.array([""] * len(ids))})
    media = synth_png_batch(batch)
    out = PngDecodeStats()(media)
    for i, doc_id in enumerate(ids):
        w, h = 4 + doc_id % 13, 3 + doc_id % 7
        expect = sum((doc_id + 7 * x + 13 * y + 101 * c) % 256
                     for x in range(w) for y in range(h)
                     for c in range(3))
        assert out.column("width")[i].as_py() == w
        assert out.column("height")[i].as_py() == h
        assert out.column("pixel_sum")[i].as_py() == expect
