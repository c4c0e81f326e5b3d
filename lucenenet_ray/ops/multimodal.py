"""Multimodal columns: opaque binary payloads + typed metadata, processed by
actor-pool map_batches stages.

The Ray-side plumbing (schema, batch sizing, actor signature, output layout)
is real and tested. Decoding comes in two tiers:

* REAL, dependency-free decoders: PNG — a genuinely COMPRESSED
  container (stdlib zlib DEFLATE + all five scanline filters,
  ``ops/png.py``; gate-proven bit-exact via ``png_decode_stats``) —
  plus binary PPM/PGM and uncompressed 24-bit BMP (pure numpy), PCM16
  WAV (stdlib ``wave``) — see :func:`decode_image` /
  :func:`decode_wav_pcm16` and the oracle-checked :class:`ImageStats` /
  :class:`AudioStats` stages;
* remaining codecs (JPEG/MP3/H.264) raise ``ValueError`` from the
  dispatcher — those libraries are not in this container; swap
  :func:`decode_image` for Pillow/pyav in production.

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


def _decode_image_real(payload: bytes) -> np.ndarray:
    """REAL magic-dispatched decode (PNG/PPM/BMP — see decode_image).
    JPEG/H.264 still require Pillow/pyav (not in this container) and
    raise ValueError through the dispatcher."""
    return decode_image(payload)


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
                 id_col: str = "item_id", use_fake_decoder: bool = True):
        self.side = side
        self.payload_col = payload_col
        self.id_col = id_col
        self.decode = _decode_image_fake if use_fake_decoder else decode_image

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


# ---------------------------------------------------------------------------
# REAL decoders — dependency-free formats (no Pillow/torchaudio needed):
# P6/P5 PPM and 24-bit BMP decode with numpy alone; WAV with stdlib `wave`.
# These make the decode step genuinely real for those containers; exotic
# codecs (JPEG/MP3/H.264) remain the documented swap-in.


def decode_ppm(payload: bytes) -> np.ndarray:
    """Binary PPM/PGM (P6 RGB / P5 gray) → HxWx3 uint8. Pure parsing:
    whitespace-separated header tokens (comments allowed), then raw bytes."""
    if payload[:2] not in (b"P6", b"P5"):
        raise ValueError("not a binary PPM/PGM payload")
    # header = magic, width, height, maxval; '#' comments legal between
    tokens: list[bytes] = []
    i = 2
    while len(tokens) < 3:
        while i < len(payload) and payload[i:i + 1].isspace():
            i += 1
        if payload[i:i + 1] == b"#":
            while i < len(payload) and payload[i:i + 1] != b"\n":
                i += 1
            continue
        j = i
        while j < len(payload) and not payload[j:j + 1].isspace():
            j += 1
        tokens.append(payload[i:j])
        i = j
    i += 1  # single whitespace after maxval
    w, h, maxval = int(tokens[0]), int(tokens[1]), int(tokens[2])
    if maxval > 255:
        raise ValueError("16-bit PPM unsupported")
    ch = 3 if payload[:2] == b"P6" else 1
    data = np.frombuffer(payload, dtype=np.uint8,
                         count=w * h * ch, offset=i).reshape(h, w, ch)
    return np.repeat(data, 3, axis=2) if ch == 1 else data.copy()


def encode_ppm(img: np.ndarray) -> bytes:
    h, w, _ = img.shape
    return b"P6\n%d %d\n255\n" % (w, h) + img.astype(np.uint8).tobytes()


def decode_bmp(payload: bytes) -> np.ndarray:
    """Uncompressed 24-bit BMP → HxWx3 uint8 (RGB). Handles the 4-byte row
    padding and bottom-up row order of the BITMAPINFOHEADER format."""
    if payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    off = int.from_bytes(payload[10:14], "little")
    w = int.from_bytes(payload[18:22], "little", signed=True)
    h = int.from_bytes(payload[22:26], "little", signed=True)
    bpp = int.from_bytes(payload[28:30], "little")
    comp = int.from_bytes(payload[30:34], "little")
    if bpp != 24 or comp != 0:
        raise ValueError("only uncompressed 24-bit BMP supported")
    bottom_up = h > 0
    h = abs(h)
    stride = (w * 3 + 3) // 4 * 4
    rows = np.frombuffer(payload, dtype=np.uint8, count=stride * h,
                         offset=off).reshape(h, stride)[:, : w * 3]
    img = rows.reshape(h, w, 3)[:, :, ::-1]  # BGR → RGB
    return img[::-1].copy() if bottom_up else img.copy()


def encode_bmp(img: np.ndarray) -> bytes:
    h, w, _ = img.shape
    stride = (w * 3 + 3) // 4 * 4
    body = np.zeros((h, stride), dtype=np.uint8)
    body[:, : w * 3] = img[::-1, :, ::-1].reshape(h, w * 3)  # bottom-up BGR
    data = body.tobytes()
    header = (b"BM" + (54 + len(data)).to_bytes(4, "little") + b"\x00" * 4
              + (54).to_bytes(4, "little")
              + (40).to_bytes(4, "little")
              + w.to_bytes(4, "little") + h.to_bytes(4, "little")
              + (1).to_bytes(2, "little") + (24).to_bytes(2, "little")
              + (0).to_bytes(4, "little") + len(data).to_bytes(4, "little")
              + b"\x00" * 16)
    return header + data


def decode_image(payload: bytes) -> np.ndarray:
    """Magic-dispatched REAL decode (PNG/PPM/PGM/BMP). PNG is the one
    genuinely COMPRESSED container decodable dependency-free (stdlib
    zlib DEFLATE + all five scanline filters — ops/png.py)."""
    if payload[:8] == b"\x89PNG\r\n\x1a\n":
        from lucenenet_ray.ops.png import png_decode

        return png_decode(payload)
    if payload[:2] in (b"P6", b"P5"):
        return decode_ppm(payload)
    if payload[:2] == b"BM":
        return decode_bmp(payload)
    raise ValueError(
        "unsupported image container (real decoders: PNG/PPM/BMP)")


def decode_wav_pcm16(payload: bytes) -> np.ndarray:
    """WAV container → mono int32 samples (stdlib `wave`; stereo averaged
    with exact integer floor-division so oracles stay integral)."""
    import io
    import wave

    with wave.open(io.BytesIO(payload), "rb") as f:
        if f.getsampwidth() != 2:
            raise ValueError("only PCM16 WAV supported")
        nch = f.getnchannels()
        raw = f.readframes(f.getnframes())
    pcm = np.frombuffer(raw, dtype="<i2").astype(np.int32)
    if nch > 1:
        pcm = pcm[: len(pcm) // nch * nch].reshape(-1, nch).sum(axis=1) // nch
    return pcm


def encode_wav_pcm16(samples: np.ndarray, framerate: int = 8000) -> bytes:
    import io
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as f:
        f.setnchannels(1)
        f.setsampwidth(2)
        f.setframerate(framerate)
        f.writeframes(samples.astype("<i2").tobytes())
    return buf.getvalue()


class ImageStats:
    """Actor-pool stage with the REAL decoder: (id, PPM/BMP binary) →
    integer per-image statistics — exact-oracle-friendly (no float math):
    height, width, per-channel byte sums, total sum, max byte, and the
    2x2-quadrant luma sums (sum of r+g+b per quadrant)."""

    def __init__(self, payload_col: str = "payload", id_col: str = "item_id"):
        self.payload_col = payload_col
        self.id_col = id_col
        self.decode = decode_image  # once per actor

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column(self.id_col)
        cols: dict[str, list[int]] = {k: [] for k in (
            "height", "width", "sum_r", "sum_g", "sum_b", "sum_all",
            "max_byte", "q00", "q01", "q10", "q11")}
        for v in batch.column(self.payload_col):
            img = self.decode(v.as_py() or b"").astype(np.int64)
            hh, ww, _ = img.shape
            luma = img.sum(axis=2)
            cols["height"].append(hh)
            cols["width"].append(ww)
            for i, c in enumerate("rgb"):
                cols[f"sum_{c}"].append(int(img[:, :, i].sum()))
            cols["sum_all"].append(int(img.sum()))
            cols["max_byte"].append(int(img.max()))
            for qi in range(2):
                for qj in range(2):
                    cols[f"q{qi}{qj}"].append(int(
                        luma[qi * hh // 2:(qi + 1) * hh // 2,
                             qj * ww // 2:(qj + 1) * ww // 2].sum()))
        out = {"item_id": ids}
        out.update({k: pa.array(v, type=pa.int64()) for k, v in cols.items()})
        return pa.table(out)


class AudioStats:
    """Actor-pool stage with the REAL WAV decoder: (id, WAV binary) →
    integer per-clip statistics: n_samples, sum of |sample|, max, min."""

    def __init__(self, payload_col: str = "payload", id_col: str = "item_id"):
        self.payload_col = payload_col
        self.id_col = id_col
        self.decode = decode_wav_pcm16

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column(self.id_col)
        ns, sa, mx, mn = [], [], [], []
        for v in batch.column(self.payload_col):
            pcm = self.decode(v.as_py() or b"").astype(np.int64)
            ns.append(int(pcm.size))
            sa.append(int(np.abs(pcm).sum()))
            mx.append(int(pcm.max()) if pcm.size else 0)
            mn.append(int(pcm.min()) if pcm.size else 0)
        return pa.table({
            "item_id": ids,
            "n_samples": pa.array(ns, type=pa.int64()),
            "sum_abs": pa.array(sa, type=pa.int64()),
            "max_sample": pa.array(mx, type=pa.int64()),
            "min_sample": pa.array(mn, type=pa.int64()),
        })


def decode_ppm_stream(payload: bytes) -> list[np.ndarray]:
    """Concatenated-P6 'video' container (MJPEG-in-spirit: one raw PPM per
    frame, back to back): parse frames until the buffer is exhausted."""
    frames = []
    off = 0
    while off < len(payload):
        if payload[off:off + 2] != b"P6":
            raise ValueError(f"bad frame magic at byte {off}")
        # reuse the single-image parser on the remaining buffer, then
        # advance by the exact bytes it consumed: re-scan the 3 header
        # tokens (width, height, maxval) + the single whitespace after
        rest = payload[off:]
        img = decode_ppm(rest)
        h, w, _ = img.shape
        j = off + 2
        for _tok in range(3):
            while payload[j:j + 1].isspace():
                j += 1
            while j < len(payload) and not payload[j:j + 1].isspace():
                j += 1
        off = j + 1 + w * h * 3
        frames.append(img)
    return frames


class VideoLumaSample:
    """Actor-pool stage with REAL frame decode: (id, concatenated-PPM
    clip) → every ``stride``-th frame's integer luma sum (one output row
    per sampled frame — the flat_map/keyframe-sampling dataflow)."""

    def __init__(self, stride: int = 5, payload_col: str = "payload",
                 id_col: str = "item_id"):
        self.stride = stride
        self.payload_col = payload_col
        self.id_col = id_col
        self.decode = decode_ppm_stream

    def __call__(self, batch: pa.Table) -> pa.Table:
        out_id, out_fr, out_sum = [], [], []
        ids = batch.column(self.id_col).to_pylist()
        for did, v in zip(ids, batch.column(self.payload_col)):
            frames = self.decode(v.as_py() or b"")
            for f in range(0, len(frames), self.stride):
                out_id.append(did)
                out_fr.append(f)
                out_sum.append(int(frames[f].astype(np.int64).sum()))
        return pa.table({
            "item_id": pa.array(out_id, type=pa.int64()),
            "frame": pa.array(out_fr, type=pa.int32()),
            "luma_sum": pa.array(out_sum, type=pa.int64()),
        })


def synthesize_video_table(n: int = 16, n_frames: int = 12,
                           side: int = 4) -> pa.Table:
    """REAL video clips with SQL-re-derivable frames: clip i's frame f has
    pixel bytes md5(f"{i}:vid:{f}:{m}") — concatenated P6 frames."""
    ids, payloads = [], []
    for i in range(n):
        clip = b"".join(
            encode_ppm(_md5_bytes(f"{i}:vid:{f}", side * side * 3)
                       .reshape(side, side, 3))
            for f in range(n_frames))
        ids.append(i)
        payloads.append(clip)
    return pa.table({
        "item_id": pa.array(ids, type=pa.int64()),
        "payload": pa.array(payloads, type=pa.binary()),
    })


def _md5_bytes(seed: str, n: int) -> np.ndarray:
    """n deterministic bytes: concat of md5(f"{seed}:{m}") digests —
    byte-reproducible in SQL (substr of the hex digest)."""
    out = b"".join(
        hashlib.md5(f"{seed}:{m}".encode()).digest()
        for m in range((n + 15) // 16))
    return np.frombuffer(out[:n], dtype=np.uint8)


def synthesize_real_media_table(n: int = 64, side: int = 4,
                                n_samples: int = 128) -> pa.Table:
    """REAL media payloads with SQL-re-derivable content: item 2i = a P6
    PPM whose pixel bytes are md5(f"{id}:img:{m}") digests; item 2i+1 = a
    PCM16 WAV whose little-endian sample bytes are md5(f"{id}:aud:{m}")
    digests."""
    ids, kinds, payloads = [], [], []
    for i in range(n):
        if i % 2 == 0:
            px = _md5_bytes(f"{i}:img", side * side * 3) \
                .reshape(side, side, 3)
            payloads.append(encode_ppm(px))
            kinds.append("image")
        else:
            raw = _md5_bytes(f"{i}:aud", n_samples * 2)
            pcm = raw.view("<i2").astype(np.int16)
            payloads.append(encode_wav_pcm16(pcm))
            kinds.append("audio")
        ids.append(i)
    return pa.table({
        "item_id": pa.array(ids, type=pa.int64()),
        "kind": pa.array(kinds, type=pa.string()),
        "payload": pa.array(payloads, type=pa.binary()),
    })


def synthesize_png_table(n: int = 48) -> pa.Table:
    """Deterministic REAL PNGs: image i is h×w×3 with h = 4 + H%5,
    w = 3 + H%3 (H = md5_int31(f"{i}:pngd")) and row r's w*3 sample
    bytes taken from md5(f"png:{i}:{r}").digest() — every formula is
    SQL-mirrorable (the png_decode_stats oracle recomputes the expected
    channel sums WITHOUT zlib). Scanline filters cycle r % 5 so a
    decoder that mishandles ANY of the five filters changes the sums."""
    import hashlib as _hl

    from lucenenet_ray.ops.neardup import md5_int31
    from lucenenet_ray.ops.png import png_encode

    ids, payloads = [], []
    for i in range(n):
        hh = md5_int31(f"{i}:pngd")
        h = 4 + hh % 5
        w = 3 + hh % 3
        rows = []
        for r in range(h):
            d = _hl.md5(f"png:{i}:{r}".encode()).digest()
            rows.append(np.frombuffer(d[:w * 3], dtype=np.uint8))
        arr = np.stack(rows).reshape(h, w, 3)
        ids.append(i)
        payloads.append(png_encode(arr, filters=[r % 5 for r in range(h)]))
    return pa.table({
        "item_id": pa.array(ids, type=pa.int64()),
        "payload": pa.array(payloads, type=pa.binary()),
    })


class PNGStats:
    """Actor-pool stage: REAL PNG decode → (item_id, height, width,
    sum_r, sum_g, sum_b). Per-actor state (nothing to load here, but the
    shape matches the model-load stages)."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, hs, ws, s0, s1, s2 = [], [], [], [], [], []
        for i, v in zip(batch.column("item_id").to_pylist(),
                        batch.column("payload")):
            img = decode_image(v.as_py()).astype(np.int64)
            ids.append(i)
            hs.append(img.shape[0])
            ws.append(img.shape[1])
            s0.append(int(img[:, :, 0].sum()))
            s1.append(int(img[:, :, 1].sum()))
            s2.append(int(img[:, :, 2].sum()))
        return pa.table({
            "item_id": pa.array(ids, type=pa.int64()),
            "height": pa.array(hs, type=pa.int64()),
            "width": pa.array(ws, type=pa.int64()),
            "sum_r": pa.array(s0, type=pa.int64()),
            "sum_g": pa.array(s1, type=pa.int64()),
            "sum_b": pa.array(s2, type=pa.int64()),
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
