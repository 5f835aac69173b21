"""From-scratch baseline JPEG codec (functions/jpeg.py): table and
transform unit checks against published constants, round-trip error
bounds across shapes/subsampling/gray, interop with externally-encoded
baseline files cross-checked against a lossless ground truth decoded
by an INDEPENDENT from-scratch decoder (PPM), and failure modes."""

import os

import numpy as np
import pyarrow as pa
import pytest

from ksoup_ray.functions.codecs import decode_png, decode_ppm
from ksoup_ray.functions.jpeg import (AC_CHROMA_BITS, AC_CHROMA_VALS,
                                      AC_LUMA_BITS, AC_LUMA_VALS,
                                      DC_LUMA_BITS, DC_LUMA_VALS,
                                      ZIGZAG, _build_decode_table,
                                      _build_encode_table, decode_jpeg,
                                      encode_jpeg, fdct2d, idct2d)
from ksoup_ray.functions.multimodal import (JpegRoundTrip, decode_image,
                                            _synth_smooth_image)

FIXTURES = os.path.join(os.path.dirname(__file__), "fixtures", "jpeg")


# ---------------------------------------------------------------------------
# tables / transforms vs published definitions

def test_zigzag_is_a_permutation_walking_antidiagonals():
    assert sorted(ZIGZAG.tolist()) == list(range(64))
    # anti-diagonal index (row+col) must be non-decreasing along the walk
    diag = [z // 8 + z % 8 for z in ZIGZAG.tolist()]
    assert all(b - a in (0, 1) for a, b in zip(diag, diag[1:]))
    # the published corner values
    assert ZIGZAG[0] == 0 and ZIGZAG[1] == 1 and ZIGZAG[2] == 8
    assert ZIGZAG[63] == 63


@pytest.mark.parametrize("bits,vals", [
    (DC_LUMA_BITS, DC_LUMA_VALS), (AC_LUMA_BITS, AC_LUMA_VALS),
    (AC_CHROMA_BITS, AC_CHROMA_VALS)])
def test_huffman_tables_are_valid_canonical_codes(bits, vals):
    assert sum(bits) == len(vals)
    table = _build_decode_table(bits, vals)
    # Kraft inequality must hold strictly below 1 (JPEG reserves the
    # all-ones code), and every (length, code) must fit its length
    kraft = sum(2.0 ** -length for (length, _code) in table)
    assert kraft < 1.0
    for (length, code) in table:
        assert 0 <= code < (1 << length)
    # encode table is the exact inverse
    enc = _build_encode_table(bits, vals)
    for (length, code), sym in table.items():
        assert enc[sym] == (code, length)


def test_dct_matches_direct_cosine_sum_and_inverts():
    rng = np.random.RandomState(1)
    x = rng.randn(3, 8, 8) * 60
    # direct O(N^4) T.81 A.3.3 FDCT
    direct = np.zeros_like(x)
    for u in range(8):
        for v in range(8):
            cu = np.sqrt(0.5) if u == 0 else 1.0
            cv = np.sqrt(0.5) if v == 0 else 1.0
            acc = np.zeros(x.shape[0])
            for xx in range(8):
                for yy in range(8):
                    acc += (x[:, xx, yy]
                            * np.cos((2 * xx + 1) * u * np.pi / 16)
                            * np.cos((2 * yy + 1) * v * np.pi / 16))
            direct[:, u, v] = 0.25 * cu * cv * acc
    assert np.abs(fdct2d(x) - direct).max() < 1e-9
    assert np.abs(idct2d(fdct2d(x)) - x).max() < 1e-9


# ---------------------------------------------------------------------------
# round trips

@pytest.mark.parametrize("shape", [(8, 8), (23, 37), (7, 9), (16, 24),
                                   (1, 1), (9, 40)])
@pytest.mark.parametrize("sub", ["444", "420"])
def test_round_trip_error_bounds(shape, sub):
    h, w = shape
    yy, xx = np.mgrid[0:h, 0:w]
    img = np.stack([128 + 80 * np.cos(xx / 9) * np.cos(yy / 8),
                    128 + 60 * np.sin(xx / 11),
                    128 + 50 * np.cos((xx + yy) / 13)], axis=2)
    img = np.clip(np.round(img), 0, 255).astype(np.uint8)
    dec = decode_jpeg(encode_jpeg(img, quality=90, subsample=sub))
    assert dec.shape == img.shape
    err = np.abs(dec.astype(int) - img.astype(int))
    assert err.max() <= (24 if sub == "420" else 12)
    assert err.mean() <= 6.0


def test_gray_round_trip_and_flat_image():
    yy, xx = np.mgrid[0:19, 0:26]
    g = np.clip(np.round(128 + 90 * np.cos(xx / 7) * np.sin(yy / 11)),
                0, 255).astype(np.uint8)
    dec = decode_jpeg(encode_jpeg(g, quality=90))
    assert dec.shape == g.shape and dec.ndim == 2
    assert np.abs(dec.astype(int) - g.astype(int)).max() <= 8
    # perfectly flat image survives exactly (DC-only blocks)
    flat = np.full((16, 16, 3), 77, np.uint8)
    assert (decode_jpeg(encode_jpeg(flat, quality=90)) == flat).all()


def test_quality_monotonicity():
    img = _synth_smooth_image(42)
    sizes, errs = [], []
    for q in (30, 60, 95):
        data = encode_jpeg(img, quality=q)
        dec = decode_jpeg(data)
        sizes.append(len(data))
        errs.append(np.abs(dec.astype(int) - img.astype(int)).mean())
    assert sizes[0] < sizes[2]          # higher quality = more bytes
    assert errs[0] > errs[2]            # and less error


# ---------------------------------------------------------------------------
# external-encoder interop, cross-checked against lossless ground truth

def test_external_baseline_jpeg_matches_ppm_ground_truth():
    """CPython ships the SAME 16x16 Python-logo image as python.jpg
    (external baseline JPEG encoder) and python.ppm (lossless). Our
    JPEG decoder's output must sit within compression distance of the
    PPM decoded by our independent netpbm decoder — a from-scratch
    decoder with any structural defect lands nowhere near it."""
    jpg = decode_jpeg(
        open(os.path.join(FIXTURES, "python.jpg"), "rb").read())
    ppm = decode_ppm(
        open(os.path.join(FIXTURES, "python.ppm"), "rb").read())
    assert jpg.shape == ppm.shape == (16, 16, 3)
    a, b = jpg.astype(float), ppm.astype(float)
    luma = lambda x: (0.299 * x[:, :, 0] + 0.587 * x[:, :, 1]
                      + 0.114 * x[:, :, 2])
    assert np.abs(luma(a) - luma(b)).mean() < 5.0
    for c in range(3):
        corr = np.corrcoef(a[:, :, c].ravel(), b[:, :, c].ravel())[0, 1]
        assert corr > 0.9, f"channel {c} corr {corr}"
    # pin the decode for regression (deterministic)
    assert int(jpg.astype(np.int64).sum()) == 70796

    # palette PNG of the same logo decodes BYTE-IDENTICAL to the PPM
    png = decode_png(
        open(os.path.join(FIXTURES, "python.png"), "rb").read())
    assert png.shape == (16, 16, 4)
    assert (png[:, :, :3] == ppm).all()


def test_external_tiny_gray_jpeg():
    img = decode_jpeg(
        open(os.path.join(FIXTURES, "2x2.jpg"), "rb").read())
    assert img.shape == (2, 2)
    assert int(img.astype(np.int64).sum()) == 512   # mid-gray 4x128


# ---------------------------------------------------------------------------
# failure modes + dispatch + driver stage

def test_unsupported_and_corrupt_inputs_raise():
    img = _synth_smooth_image(7)
    data = encode_jpeg(img)
    with pytest.raises(ValueError, match="not a JPEG"):
        decode_jpeg(b"\x89PNG" + data)
    with pytest.raises(ValueError):
        decode_jpeg(data[:40])          # truncated in headers
    # progressive frames are refused, not mis-decoded
    prog = bytearray(data)
    sof = prog.find(b"\xFF\xC0")
    prog[sof + 1] = 0xC2
    with pytest.raises(ValueError, match="baseline"):
        decode_jpeg(bytes(prog))


def test_decode_image_dispatches_jpeg():
    img = _synth_smooth_image(3)
    out = decode_image(encode_jpeg(img, quality=95))
    assert out.shape == img.shape
    assert np.abs(out.astype(int) - img.astype(int)).max() <= 8


def test_jpeg_roundtrip_stage_contract():
    ids = [0, 1, 2, 3, 50, 101]
    batch = pa.table({"doc_id": pa.array(ids, pa.int64()),
                      "text": pa.array([""] * len(ids))})
    out = JpegRoundTrip()(batch)
    for i, d in enumerate(ids):
        assert out.column("width")[i].as_py() == 9 + d % 16
        assert out.column("height")[i].as_py() == 7 + d % 12
        assert out.column("subsample")[i].as_py() == \
            ("420" if d % 2 else "444")
        assert out.column("roundtrip_ok")[i].as_py() is True
