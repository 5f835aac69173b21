"""From-scratch GIF codec (functions/codecs.encode_gif/decode_gif):
LZW round-trips (growing dictionary, clear-code overflow, KwKwK),
interlacing, transparency, and interop with an externally-encoded
fixture cross-checked against lossless PPM ground truth."""

import os
import struct

import numpy as np
import pyarrow as pa
import pytest

from ksoup_ray.functions.codecs import (_gif_lzw_decode,
                                        _gif_lzw_encode, decode_gif,
                                        decode_ppm, encode_gif)
from ksoup_ray.functions.multimodal import (GifDecodeStats,
                                            synth_gif_batch)

FIXTURES = os.path.join(os.path.dirname(__file__), "fixtures", "gif")


@pytest.mark.parametrize("shape,npal", [((7, 11), 5), ((16, 16), 128),
                                        ((1, 1), 2), ((33, 9), 256),
                                        ((5, 64), 3)])
@pytest.mark.parametrize("interlace", [False, True])
def test_round_trip(shape, npal, interlace):
    rng = np.random.RandomState(hash((shape, npal)) % 2**31)
    pal = rng.randint(0, 256, size=(npal, 3), dtype=np.uint8)
    idx = rng.randint(0, npal, size=shape, dtype=np.uint8)
    dec = decode_gif(encode_gif(idx, pal, interlace=interlace))
    assert dec.shape == shape + (3,)
    assert (dec == pal[idx]).all()


def test_lzw_dictionary_overflow_and_kwkwk():
    # long low-entropy stream forces dictionary growth past several
    # code-width bumps and through the 4096-entry clear-code reset
    rng = np.random.RandomState(5)
    idx = rng.randint(0, 4, size=120_000).astype(np.uint8)
    enc = _gif_lzw_encode(idx, 2)
    out = _gif_lzw_decode(enc, 2, len(idx))
    assert (out == idx).all()
    # KwKwK pattern: 'aaaa...' exercises the code==len(table) branch
    run = np.zeros(1000, np.uint8)
    assert (_gif_lzw_decode(_gif_lzw_encode(run, 2), 2, 1000)
            == run).all()


def test_external_gif_vs_ppm_ground_truth():
    """CPython's python.gif is the SAME 16x16 logo as the lossless
    python.ppm, quantized to a 128-color palette by its creator and
    carrying a transparent index. Opaque pixels must sit within
    quantization distance of the PPM decoded by the independent
    netpbm decoder; transparent pixels surface as alpha 0."""
    gif = decode_gif(open(os.path.join(FIXTURES, "python.gif"),
                          "rb").read())
    ppm_path = os.path.join(os.path.dirname(__file__), "fixtures",
                            "jpeg", "python.ppm")
    ppm = decode_ppm(open(ppm_path, "rb").read())
    assert gif.shape == (16, 16, 4)
    rgb = gif[:, :, :3].astype(int)
    opaque = gif[:, :, 3] > 0
    err = np.abs(rgb - ppm.astype(int)).sum(axis=2)
    assert err[opaque].mean() < 20           # creator-side quantization
    for c in range(3):
        corr = np.corrcoef(rgb[:, :, c][opaque].ravel(),
                           ppm[:, :, c][opaque].astype(int).ravel())[0, 1]
        assert corr > 0.95
    # pin the decode for regression
    assert int(gif[:, :, :3].astype(np.int64).sum()) == 65587
    assert int(gif[:, :, 3].astype(np.int64).sum()) == 37995


def test_corrupt_and_unsupported_inputs():
    pal = np.array([[1, 2, 3], [4, 5, 6]], np.uint8)
    idx = np.array([[0, 1], [1, 0]], np.uint8)
    data = encode_gif(idx, pal)
    with pytest.raises(ValueError, match="not a GIF"):
        decode_gif(b"JIF89a" + data[6:])
    with pytest.raises(ValueError):
        decode_gif(data[:20])                 # truncated
    # oversized index rejected at encode time
    with pytest.raises(ValueError, match="palette"):
        encode_gif(np.array([[9]], np.uint8), pal)


def test_transparency_roundtrip_alpha():
    # hand-build a GIF89a with a GCE transparent index
    pal = np.array([[10, 20, 30], [200, 100, 50]], np.uint8)
    idx = np.array([[0, 1], [1, 0]], np.uint8)
    data = bytearray(encode_gif(idx, pal))
    # splice a graphic control extension before the image descriptor
    img_at = data.index(0x2C, 13)
    gce = bytes([0x21, 0xF9, 0x04, 0x01, 0x00, 0x00, 0x00, 0x00])
    data[img_at:img_at] = gce                 # transparent index 0
    out = decode_gif(bytes(data))
    assert out.shape == (2, 2, 4)
    assert (out[:, :, 3] == np.where(idx == 0, 0, 255)).all()
    assert (out[:, :, :3] == pal[idx]).all()


def test_gif_decode_stats_stage_matches_closed_form(ray_session):
    ids = [0, 1, 2, 7, 42, 99]
    batch = pa.table({"doc_id": pa.array(ids, pa.int64()),
                      "text": pa.array([""] * len(ids))})
    media = synth_gif_batch(batch)
    out = GifDecodeStats()(media)
    for i, d in enumerate(ids):
        w, h = 5 + d % 12, 4 + d % 9
        expect = 0
        for x in range(w):
            for y in range(h):
                k = (d + 3 * x + 7 * y) % 64
                expect += (3 * k) % 256 + (5 * k + 7) % 256 \
                    + (11 * k + 13) % 256
        assert out.column("width")[i].as_py() == w
        assert out.column("height")[i].as_py() == h
        assert out.column("pixel_sum")[i].as_py() == expect
