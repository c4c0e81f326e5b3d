"""Multimodal columns: opaque binary payloads + typed metadata, processed by
actor-pool map_batches stages.

The Ray-side plumbing (schema, batch sizing, actor signature, output layout)
is real and tested; the actual media decoding is STUBBED behind
``NotImplementedError`` / a deterministic fake because image/audio libraries
are not available in this container — swap ``_decode_image_real`` /
``_decode_audio_real`` for Pillow/torchaudio implementations in production.

Batch-size guidance (SURVEY §4 memory-aware): binary payloads dominate block
size — these stages use small ``batch_size`` (64) and ``batch_format=
"pyarrow"`` so payload bytes stay zero-copy in Arrow buffers until the decode
kernel touches them.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

IMAGE_FEATURE_DIM = 14  # 3ch mean+std (6) + 2x2 luma grid (4) + h,w,bytes,hash (4)


def _decode_image_real(payload: bytes) -> np.ndarray:  # pragma: no cover
    raise NotImplementedError(
        "image decoding requires Pillow/opencv — not available in this "
        "container; the pipeline plumbing uses the deterministic fake below"
    )


def _decode_image_fake(payload: bytes) -> np.ndarray:
    """Deterministic stand-in 'decoded image': pseudo-pixels from md5(payload).
    Keeps the stage's dataflow (bytes → HxWxC array) honest and testable."""
    h = hashlib.md5(payload).digest()
    side = 4
    vals = np.frombuffer((h * ((side * side * 3) // len(h) + 1))[: side * side * 3],
                         dtype=np.uint8)
    return vals.reshape(side, side, 3)


class ImageFeatures:
    """Actor-pool stage: (id, image binary) → fixed-dim feature vector +
    basic metadata. Model/codec state loads ONCE per actor in __init__.

    Usage::

        ds.map_batches(ImageFeatures(), batch_format="pyarrow",
                       batch_size=64, concurrency=8, num_cpus=1)
    """

    def __init__(self, payload_col: str = "payload", id_col: str = "item_id",
                 use_fake_decoder: bool = True):
        self.payload_col = payload_col
        self.id_col = id_col
        # per-actor one-time setup (the model-load analog)
        self.decode = _decode_image_fake if use_fake_decoder else _decode_image_real

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column(self.id_col)
        feats: list[list[float]] = []
        heights: list[int] = []
        widths: list[int] = []
        n_bytes: list[int] = []
        for v in batch.column(self.payload_col):
            payload = v.as_py() or b""
            img = self.decode(payload)
            hh, ww, _c = img.shape
            # 16-dim feature: per-channel mean/std + coarse 2x2 luma grid
            f = []
            fimg = img.astype(np.float64)
            for c in range(3):
                f.append(float(fimg[:, :, c].mean()))
                f.append(float(fimg[:, :, c].std()))
            luma = fimg.mean(axis=2)
            for qi in range(2):
                for qj in range(2):
                    f.append(float(luma[qi * hh // 2:(qi + 1) * hh // 2,
                                        qj * ww // 2:(qj + 1) * ww // 2].mean()))
            f.extend([float(hh), float(ww), float(len(payload)),
                      float(int.from_bytes(hashlib.md5(payload).digest()[:4], "big"))])
            feats.append(f[:IMAGE_FEATURE_DIM])
            heights.append(hh)
            widths.append(ww)
            n_bytes.append(len(payload))
        return pa.table(
            {
                "item_id": ids,
                "height": pa.array(heights, type=pa.int32()),
                "width": pa.array(widths, type=pa.int32()),
                "n_bytes": pa.array(n_bytes, type=pa.int64()),
                "features": pa.array(feats, type=pa.list_(pa.float32())),
            }
        )


class AudioFrames:
    """Actor-pool stage: (id, audio binary) → frame-sampled 'windows'.

    Stub decode: treats the payload as PCM16 mono and emits per-window RMS
    energies — the real decoder would go through soundfile/torchaudio. The
    windowing/flat-output layout (one row per window, ``flat_map`` shape) is
    the production dataflow."""

    def __init__(self, payload_col: str = "payload", id_col: str = "item_id",
                 window: int = 256):
        self.payload_col = payload_col
        self.id_col = id_col
        self.window = window

    def __call__(self, batch: pa.Table) -> pa.Table:
        out_id: list[int] = []
        out_win: list[int] = []
        out_rms: list[float] = []
        ids = batch.column(self.id_col).to_pylist()
        for did, v in zip(ids, batch.column(self.payload_col)):
            payload = v.as_py() or b""
            pcm = np.frombuffer(payload[: len(payload) // 2 * 2], dtype=np.int16)
            n = len(pcm) // self.window
            for w in range(n):
                seg = pcm[w * self.window:(w + 1) * self.window].astype(np.float64)
                out_id.append(did)
                out_win.append(w)
                out_rms.append(float(np.sqrt((seg * seg).mean()) if len(seg) else 0.0))
        return pa.table(
            {
                "item_id": pa.array(out_id, type=pa.int64()),
                "window": pa.array(out_win, type=pa.int32()),
                "rms": pa.array(out_rms, type=pa.float64()),
            }
        )


class ImageResize:
    """Actor-pool stage: decoded-image resize to a fixed side (the
    preprocessing-for-batched-inference shape). Stub decode, real nearest-
    neighbor resample over the fake pixels — swap the decoder for Pillow in
    production; the resample math is library-free numpy."""

    def __init__(self, side: int = 2, payload_col: str = "payload",
                 id_col: str = "item_id"):
        self.side = side
        self.payload_col = payload_col
        self.id_col = id_col
        self.decode = _decode_image_fake

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column(self.id_col)
        out: list[bytes] = []
        for v in batch.column(self.payload_col):
            img = self.decode(v.as_py() or b"")
            h, w, _ = img.shape
            yi = (np.arange(self.side) * h // self.side)
            xi = (np.arange(self.side) * w // self.side)
            out.append(img[np.ix_(yi, xi)].tobytes())
        return pa.table({
            "item_id": ids,
            "pixels": pa.array(out, type=pa.binary()),
            "side": pa.array([self.side] * len(out), type=pa.int32()),
        })


class VideoFrameSample:
    """Actor-pool stage: (id, video binary) → every k-th 'frame' feature row
    (flat_map shape: one output row per sampled frame). Stub decode treats
    the payload as a sequence of fixed-size fake frames; the real stage
    would wrap pyav/ffmpeg — the sampling stride, per-frame feature layout
    and row explosion are the production dataflow."""

    FRAME_BYTES = 48  # fake 4x4x3 frame

    def __init__(self, stride: int = 5, payload_col: str = "payload",
                 id_col: str = "item_id"):
        self.stride = stride
        self.payload_col = payload_col
        self.id_col = id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        out_id: list[int] = []
        out_fr: list[int] = []
        out_mean: list[float] = []
        ids = batch.column(self.id_col).to_pylist()
        for did, v in zip(ids, batch.column(self.payload_col)):
            payload = v.as_py() or b""
            n_frames = len(payload) // self.FRAME_BYTES
            for f in range(0, n_frames, self.stride):
                frame = np.frombuffer(
                    payload[f * self.FRAME_BYTES:(f + 1) * self.FRAME_BYTES],
                    dtype=np.uint8)
                out_id.append(did)
                out_fr.append(f)
                out_mean.append(float(frame.mean()))
        return pa.table({
            "item_id": pa.array(out_id, type=pa.int64()),
            "frame": pa.array(out_fr, type=pa.int32()),
            "luma_mean": pa.array(out_mean, type=pa.float64()),
        })


def synthesize_media_table(n: int = 64, seed: int = 42) -> pa.Table:
    """Deterministic fake media table (binary payloads + metadata) for tests."""
    rng = np.random.default_rng(seed)
    ids = list(range(n))
    payloads = [rng.integers(0, 256, size=int(rng.integers(512, 4096)),
                             dtype=np.uint8).tobytes() for _ in ids]
    kinds = ["image" if i % 2 == 0 else "audio" for i in ids]
    return pa.table(
        {
            "item_id": pa.array(ids, type=pa.int64()),
            "kind": pa.array(kinds, type=pa.string()),
            "payload": pa.array(payloads, type=pa.binary()),
        }
    )
