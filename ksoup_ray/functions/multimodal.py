"""Multimodal column plumbing: opaque ``binary`` payloads + typed
metadata, processed by actor-pool stages.

The image/audio decode libraries are NOT in this container, so the
decode kernels are STUBS (clearly marked): ``decode_stub=True`` (the
default) runs a deterministic fake that exercises the real Ray-side
plumbing — schema, batch sizing, actor signature, output layout — and
is what the tests cover. Setting ``decode_stub=False`` raises
``NotImplementedError`` at the decode step, which is where a real
Pillow/torchaudio/ffmpeg call plugs in.

Scale notes: binary payloads are large → run these stages with a SMALL
``batch_size`` (16-64) and let ``DataContext.target_max_block_size``
keep blocks bounded; payloads stay in Arrow binary buffers end-to-end
(no per-row Python copies beyond the decode call itself).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

MEDIA_META = pa.struct([
    ("media_type", pa.string()),    # image | audio | video
    ("format", pa.string()),        # png/jpeg/wav/...
    ("width", pa.int32()),
    ("height", pa.int32()),
    ("duration_ms", pa.int32()),
])


def _fake_decode_image(data: bytes) -> np.ndarray:
    """Deterministic stand-in for an image decoder: derives a tiny
    pseudo-'pixel' array from the payload bytes."""
    h = hashlib.blake2b(data, digest_size=16).digest()
    side = 4
    arr = np.frombuffer((h * (side * side * 3 // 16 + 1))[: side * side * 3],
                        dtype=np.uint8)
    return arr.reshape(side, side, 3)


class ImageFeatures:
    """Actor-pool stage: binary image column → feature vector + shape.

    Real decoder loads once per actor in __init__ (model-load pattern);
    here the stub 'model' is a fixed projection matrix.
    """

    def __init__(self, media_col: str = "media", dim: int = 16,
                 decode_stub: bool = True, seed: int = 5):
        self.media_col = media_col
        self.decode_stub = decode_stub
        rng = np.random.RandomState(seed)
        self.projection = rng.randn(4 * 4 * 3, dim).astype(np.float32)

    def _decode(self, data: bytes) -> np.ndarray:
        if self.decode_stub:
            return _fake_decode_image(data)
        raise NotImplementedError(
            "real image decode requires Pillow/cv2 — not in this container; "
            "plug the decoder in here")

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch.column(self.media_col).to_pylist()
        feats: list[list[float]] = []
        shapes: list[tuple[int, int]] = []
        for data in payloads:
            img = self._decode(data or b"")
            flat = img.astype(np.float32).ravel() / 255.0
            feats.append((flat @ self.projection).tolist())
            shapes.append((img.shape[1], img.shape[0]))
        out = batch.append_column(
            "features", pa.array(feats, pa.list_(pa.float32())))
        out = out.append_column(
            "width", pa.array([s[0] for s in shapes], pa.int32()))
        out = out.append_column(
            "height", pa.array([s[1] for s in shapes], pa.int32()))
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


def synth_media_batch(batch: pa.Table) -> pa.Table:
    """Deterministic opaque media payloads from the documents table —
    the test/bench stand-in for real crawled bytes."""
    doc_ids = batch.column("doc_id").to_pylist()
    texts = batch.column("text").to_pylist()
    payloads: list[bytes] = []
    metas: list[dict] = []
    for doc_id, text in zip(doc_ids, texts):
        seed = f"{doc_id}:{len(text or '')}".encode()
        blob = hashlib.blake2b(seed, digest_size=32).digest() * 8
        payloads.append(blob)
        metas.append({
            "media_type": ("image", "audio", "video")[doc_id % 3],
            "format": ("png", "wav", "mp4")[doc_id % 3],
            "width": 4 if doc_id % 3 == 0 else None,
            "height": 4 if doc_id % 3 == 0 else None,
            "duration_ms": 1000 + doc_id % 5000 if doc_id % 3 else None,
        })
    return pa.table({
        "media_id": batch.column("doc_id"),
        "media": pa.array(payloads, pa.binary()),
        "meta": pa.array(metas, MEDIA_META),
    })
