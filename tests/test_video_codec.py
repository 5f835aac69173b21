"""From-scratch video container tests: YUV4MPEG2 codec, MJPEG-AVI
(RIFF) codec, and the Ray-side frame stages (functions/video.py)."""

import numpy as np
import pyarrow as pa
import pytest

from ksoup_ray.functions.video import (AviRoundTrip, FrameSampleY4M,
                                       SceneCutStats, VideoFrameStats,
                                       _y4m_dims, decode_avi_mjpeg,
                                       decode_y4m, encode_avi_mjpeg,
                                       encode_y4m, synth_y4m_batch)


def _rand_frames(t, h, w, seed=0):
    rng = np.random.RandomState(seed)
    return rng.randint(0, 256, (t, h, w, 3), dtype=np.uint8)


class TestY4M:
    def test_roundtrip_444_exact(self):
        fr = _rand_frames(4, 6, 8)
        dec, rate = decode_y4m(encode_y4m(fr, rate=(30, 1001),
                                          colorspace="444"))
        assert rate == (30, 1001)
        assert np.array_equal(dec, fr)

    def test_roundtrip_1x1_single_frame(self):
        fr = np.full((1, 1, 1, 3), 200, np.uint8)
        dec, _ = decode_y4m(encode_y4m(fr))
        assert np.array_equal(dec, fr)

    def test_zero_frames(self):
        fr = np.empty((0, 4, 4, 3), np.uint8)
        dec, _ = decode_y4m(encode_y4m(fr))
        assert dec.shape == (0, 4, 4, 3)

    def test_420_luma_exact_chroma_boxmean(self):
        fr = _rand_frames(2, 4, 6, seed=1)
        dec, _ = decode_y4m(encode_y4m(fr, colorspace="420jpeg"))
        assert np.array_equal(dec[:, :, :, 0], fr[:, :, :, 0])
        # chroma: each 2x2 cell replaced by its floor-mean
        for c in (1, 2):
            plane = fr[0, :, :, c].astype(np.uint32)
            mean = (plane.reshape(2, 2, 3, 2).sum(axis=(1, 3)) // 4)
            up = np.repeat(np.repeat(mean, 2, axis=0), 2, axis=1)
            assert np.array_equal(dec[0, :, :, c], up.astype(np.uint8))

    def test_422_shapes(self):
        fr = _rand_frames(3, 5, 6, seed=2)
        dec, _ = decode_y4m(encode_y4m(fr, colorspace="422"))
        assert dec.shape == fr.shape
        assert np.array_equal(dec[:, :, :, 0], fr[:, :, :, 0])

    def test_header_default_colorspace_and_extensions(self):
        # C absent -> 420jpeg per spec; unknown X params skipped
        fr = _rand_frames(1, 2, 2, seed=3)
        data = encode_y4m(fr, colorspace="420jpeg")
        hdr_end = data.find(b"\n")
        hdr = data[:hdr_end].replace(b" C420jpeg", b"") + b" Xext=1"
        dec, _ = decode_y4m(hdr + data[hdr_end:])
        assert dec.shape == fr.shape

    def test_bad_magic_raises(self):
        with pytest.raises(ValueError):
            decode_y4m(b"NOTAY4M W2 H2\nFRAME\n" + b"\x00" * 12)

    def test_truncated_frame_raises(self):
        data = encode_y4m(_rand_frames(2, 4, 4, seed=4))
        with pytest.raises(ValueError, match="truncated"):
            decode_y4m(data[:-3])

    def test_bad_frame_marker_raises(self):
        data = encode_y4m(_rand_frames(1, 2, 2, seed=5))
        nl = data.find(b"\n")
        with pytest.raises(ValueError, match="FRAME"):
            decode_y4m(data[:nl + 1] + b"JUNK!\n" + data[nl + 7:])

    def test_odd_dims_subsample_rejected(self):
        fr = _rand_frames(1, 3, 5, seed=6)
        with pytest.raises(ValueError, match="divisible"):
            encode_y4m(fr, colorspace="420jpeg")


def _smooth_clip(n=3, h=16, w=24):
    base = (128 + 60 * np.cos(np.mgrid[0:h, 0:w][1] / 7.0))
    img = np.stack([base, base / 2 + 40, 255 - base],
                   axis=2).astype(np.uint8)
    return [np.clip(img.astype(int) + 7 * t, 0, 255).astype(np.uint8)
            for t in range(n)]


class TestAviMjpeg:
    def test_roundtrip_counts_and_bound(self):
        frames = _smooth_clip(3)
        for sub, bound in (("444", 12), ("420", 24)):
            dec, fps = decode_avi_mjpeg(
                encode_avi_mjpeg(frames, fps=25, quality=90,
                                 subsample=sub))
            assert fps == 25 and len(dec) == 3
            for orig, got in zip(frames, dec):
                assert got.shape == orig.shape
                err = np.abs(got.astype(int) - orig.astype(int))
                assert err.max() <= bound

    def test_fps_survives(self):
        frames = _smooth_clip(2)
        _, fps = decode_avi_mjpeg(encode_avi_mjpeg(frames, fps=12))
        assert fps == 12

    def test_odd_chunk_padding(self):
        # force many frame sizes; RIFF word-alignment must hold for
        # odd-length JPEG payloads (pad byte not part of the frame)
        frames = _smooth_clip(5, h=9, w=13)
        dec, _ = decode_avi_mjpeg(encode_avi_mjpeg(frames))
        assert len(dec) == 5

    def test_rejects_non_avi(self):
        with pytest.raises(ValueError):
            decode_avi_mjpeg(b"RIFF\x04\x00\x00\x00WAVE")
        with pytest.raises(ValueError):
            decode_avi_mjpeg(b"\xFF\xD8junk")

    def test_needs_one_frame(self):
        with pytest.raises(ValueError):
            encode_avi_mjpeg([])


class TestStages:
    def _media(self, ids):
        return synth_y4m_batch(
            pa.table({"doc_id": pa.array(ids, pa.int64())}))

    def test_frame_stats_closed_form(self):
        m = self._media([0, 5, 11, 17])
        out = VideoFrameStats()(m).to_pydict()
        for i, doc_id in enumerate(out["media_id"]):
            w, h, n, cut = _y4m_dims(doc_id)
            x = np.arange(w)[None, None, :]
            y = np.arange(h)[None, :, None]
            t = np.arange(n)[:, None, None]
            ysum = int(((doc_id + 3 * x + 7 * y + 11 * t
                         + 128 * (t >= cut)) % 256).sum())
            uv = int(((2 * doc_id + 5 * x + y + 17 * t) % 256).sum()
                     + ((3 * doc_id + x + 9 * y + 23 * t) % 256).sum())
            assert (out["n_frames"][i], out["width"][i],
                    out["height"][i]) == (n, w, h)
            assert out["y_sum"][i] == ysum
            assert out["uv_sum"][i] == uv

    def test_scene_cut_detects_injected_jump(self):
        # handcrafted clip: constant luma, one +128 jump at frame 2
        fr = np.zeros((4, 8, 8, 3), np.uint8)
        fr[:, :, :, 0] = 30
        fr[2:, :, :, 0] = 158
        media = pa.table({
            "media_id": pa.array([1], pa.int64()),
            "media": pa.array([encode_y4m(fr)], pa.binary()),
        })
        out = SceneCutStats()(media).to_pydict()
        assert out["frame_idx"] == [1, 2, 3]
        assert out["is_cut"] == [False, True, False]
        assert out["sad"] == [0, 128 * 64, 0]

    def test_frame_sampler_stride_and_ppm(self):
        from ksoup_ray.functions.codecs import decode_ppm
        m = self._media([6])  # n_frames = 3 + 6%5 = 4 -> samples 0, 2
        out = FrameSampleY4M(every=2, emit_ppm=True)(m)
        d = out.to_pydict()
        assert d["frame_idx"] == [0, 2]
        frames, _ = decode_y4m(m.column("media")[0].as_py())
        for row, f in enumerate(d["frame_idx"]):
            img = decode_ppm(d["frame"][row])
            assert np.array_equal(img[:, :, 0], frames[f, :, :, 0])
            assert d["y_sum"][row] == int(
                frames[f, :, :, 0].astype(np.int64).sum())

    def test_frame_sampler_rejects_bad_stride(self):
        with pytest.raises(ValueError):
            FrameSampleY4M(every=0)

    def test_avi_roundtrip_stage_all_ok(self):
        batch = pa.table({"doc_id": pa.array(list(range(8)), pa.int64()),
                          "text": pa.array([""] * 8)})
        out = AviRoundTrip()(batch).to_pydict()
        assert all(out["roundtrip_ok"])
        for i, doc_id in enumerate(out["media_id"]):
            assert out["n_frames"][i] == 2 + doc_id % 3
            assert out["width"][i] == 9 + doc_id % 16
            assert out["height"][i] == 7 + doc_id % 12
