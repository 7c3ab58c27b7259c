"""Multimodal (image/audio/video) operators — Ray-side plumbing is real
and tested; codec work is stubbed because the decode libraries (PIL,
ffmpeg, torchaudio…) are not in this container.

Contract: media payloads are opaque ``binary`` columns with typed
metadata (north_rule "interleaved text + media documents"; the documents
table carries ``media_ref`` pointers, and this module processes the
referenced blobs).  Every operator is an actor-pool ``map_batches``
stage with:

* real schema in / schema out (binary payloads + struct metadata);
* small ``batch_size`` guidance (large payload rows — see ray_guide
  "Memory-aware" notes);
* the decode kernel isolated behind ``_decode`` so a real codec drops in
  by overriding one method.  With ``fake=True`` the stage produces a
  deterministic fake decode (seeded from the payload bytes) so the
  pipeline shape, schema and tests are end-to-end real.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

MEDIA_SCHEMA = pa.schema([
    ("media_ref", pa.string()),
    ("media_type", pa.string()),     # "image" | "audio" | "video"
    ("payload", pa.binary()),
    ("width", pa.int32()),           # -1 when unknown
    ("height", pa.int32()),
    ("duration_ms", pa.int32()),
])


def synth_media_table(refs: list[str], seed: int = 5) -> pa.Table:
    """Deterministic fake media blobs for the given refs (tests/bench)."""
    types = ["image", "audio", "video"]
    rows_type, rows_payload, w, h, d = [], [], [], [], []
    for i, r in enumerate(refs):
        t = types[i % 3]
        payload = hashlib.sha256(f"{seed}:{r}".encode()).digest() * 8
        rows_type.append(t)
        rows_payload.append(payload)
        w.append(64 if t == "image" else -1)
        h.append(48 if t == "image" else -1)
        d.append(1000 + 10 * i if t != "image" else -1)
    return pa.Table.from_arrays(
        [pa.array(refs, pa.string()), pa.array(rows_type, pa.string()),
         pa.array(rows_payload, pa.binary()), pa.array(w, pa.int32()),
         pa.array(h, pa.int32()), pa.array(d, pa.int32())],
        schema=MEDIA_SCHEMA)


class MediaDecoder:
    """Actor-pool stage: decode → fixed-size feature vector.

    ``__init__`` is where a real model/codec would load (once per actor).
    Feature output: ``list<float32>[feat_dim]`` — the embedding-column
    shape the ANN/dedup operators consume downstream.
    """

    def __init__(self, feat_dim: int = 16, fake: bool = True):
        self.feat_dim = feat_dim
        self.fake = fake

    def _png_features(self, payload: bytes) -> np.ndarray:
        """REAL decode path: PNG payloads (container + zlib + filters,
        all stdlib/numpy — see ops/png.py) → pixel-derived features."""
        from .png import decode_png

        return self._pixel_features(decode_png(payload))

    def _jpeg_features(self, payload: bytes) -> np.ndarray:
        """REAL decode path: baseline JPEG payloads (markers + Huffman +
        IDCT, all stdlib/numpy — see ops/jpeg.py) → pixel features."""
        from .jpeg import decode_jpeg

        return self._pixel_features(decode_jpeg(payload))

    def _pixel_features(self, img: np.ndarray) -> np.ndarray:
        """(h, w, c) uint8 pixels → per-channel mean/std then coarse
        luminance-grid means, padded to feat_dim."""
        img = img.astype(np.float32)
        c = img.shape[2]
        feats = []
        for ch in range(min(c, 3)):
            feats.append(float(img[:, :, ch].mean()) / 255.0)
            feats.append(float(img[:, :, ch].std()) / 255.0)
        lum = img[:, :, :3].mean(axis=2)
        g = max(1, int(np.sqrt(max(0, self.feat_dim - len(feats)))))
        h_, w_ = lum.shape
        for gy in range(g):
            for gx in range(g):
                cell = lum[gy * h_ // g:(gy + 1) * h_ // g or 1,
                           gx * w_ // g:(gx + 1) * w_ // g or 1]
                feats.append(float(cell.mean()) / 255.0
                             if cell.size else 0.0)
        out = np.zeros(self.feat_dim, np.float32)
        out[:min(len(feats), self.feat_dim)] = \
            feats[:self.feat_dim]
        return out

    def _bmp_features(self, payload: bytes) -> np.ndarray:
        """REAL decode path: 24-bit BI_RGB BMP payloads (stdlib struct
        + numpy row decode — see ops/bmp.py) → pixel features."""
        from .bmp import decode_bmp

        return self._pixel_features(decode_bmp(payload))

    def _wav_features(self, payload: bytes) -> np.ndarray:
        """REAL decode path: PCM WAV payloads (RIFF chunks + numpy
        sample decode — see ops/wav.py) → waveform-derived features."""
        from .wav import decode_wav, wav_features

        samples, rate = decode_wav(payload)
        return wav_features(samples, rate, feat_dim=self.feat_dim)

    def _decode(self, payload: bytes, media_type: str) -> np.ndarray:
        from .jpeg import JPEG_MAGIC
        from .png import PNG_MAGIC
        from .wav import WAV_MAGIC

        if payload[:8] == PNG_MAGIC:
            return self._png_features(payload)      # REAL codec path
        if payload[:2] == JPEG_MAGIC:
            return self._jpeg_features(payload)     # REAL codec path
        if payload[:4] == WAV_MAGIC:
            return self._wav_features(payload)      # REAL codec path
        if payload[:2] == b"BM":
            return self._bmp_features(payload)      # REAL codec path
        if not self.fake:
            raise NotImplementedError(
                "non-PNG/JPEG/WAV compressed decode needs PIL/ffmpeg — "
                "not available in this container; PNG (ops/png.py), "
                "baseline JPEG (ops/jpeg.py) and PCM WAV (ops/wav.py) "
                "payloads decode for real, others need fake=True")
        # deterministic fake: bytes → seeded feature vector
        h = hashlib.sha256(payload).digest()
        seed = int.from_bytes(h[:4], "little")
        rng = np.random.RandomState(seed)
        return rng.normal(size=self.feat_dim).astype(np.float32)

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats = [self._decode(p, t) for p, t in
                 zip(batch["payload"].to_pylist(),
                     batch["media_type"].to_pylist())]
        return pa.Table.from_arrays(
            [batch["media_ref"], batch["media_type"],
             pa.array([f.tolist() for f in feats],
                      pa.list_(pa.float32()))],
            names=["media_ref", "media_type", "features"])


class FrameSampler:
    """Video container → sampled frame payloads (1 row in, N rows out).

    REAL path (default): MJPEG/AVI payloads are RIFF-chunk-walked
    (ops/avi.py, the ops/wav.py precedent) and each sampled frame is
    emitted as its embedded baseline-JPEG bytes — sampling slices the
    CONTAINER only (unsampled frames are never decoded), and downstream
    featurization decodes true pixels through ops/jpeg.py.  Frames are
    evenly spaced: stride = ceil(n / max_frames).  Non-AVI video
    payloads reject LOUDLY (inter-frame codecs genuinely need ffmpeg);
    ``fake=True`` keeps the legacy deterministic stub for container-less
    synthetic payloads."""

    def __init__(self, fps_divisor: int = 10, max_frames: int = 4,
                 fake: bool = False):
        from .avi import AVI_MAGIC, avi_mjpeg_frame_chunks

        self._chunks = avi_mjpeg_frame_chunks
        self._magic = AVI_MAGIC
        self.fps_divisor = fps_divisor
        self.max_frames = max_frames
        self.fake = fake

    def __call__(self, batch: pa.Table) -> pa.Table:
        refs, frames, payloads = [], [], []
        for r, t, p, dur in zip(batch["media_ref"].to_pylist(),
                                batch["media_type"].to_pylist(),
                                batch["payload"].to_pylist(),
                                batch["duration_ms"].to_pylist()):
            if t != "video":
                continue
            if p[:4] == self._magic and p[8:12] == b"AVI ":
                jpegs = self._chunks(p)
                stride = -(-len(jpegs) // self.max_frames)
                for fi in range(0, len(jpegs), stride):
                    refs.append(r)
                    frames.append(fi)
                    payloads.append(jpegs[fi])
                continue
            if not self.fake:
                raise NotImplementedError(
                    "non-MJPEG-AVI frame sampling needs ffmpeg — "
                    "synthesize MJPEG/AVI (ops/media.py:synth_avi_table) "
                    "or animated GIF (GifFrameSampler) for real frames")
            n = min(self.max_frames, max(1, dur // (100 * self.fps_divisor)))
            for fi in range(n):
                refs.append(r)
                frames.append(fi)
                payloads.append(hashlib.sha256(p + bytes([fi])).digest())
        return pa.Table.from_arrays(
            [pa.array(refs, pa.string()), pa.array(frames, pa.int32()),
             pa.array(payloads, pa.binary())],
            names=["media_ref", "frame_index", "frame_payload"])


def decode_features(media_ds, feat_dim: int = 16, concurrency=None,
                    batch_size: int = 64):
    """Media Dataset → feature Dataset (actor pool; small batches because
    payload rows are wide).  Pool bounds scale with the cluster
    (``runtime.pool_range``), never a host constant."""
    from ..runtime import pool_range

    return media_ds.map_batches(
        MediaDecoder, fn_constructor_kwargs={"feat_dim": feat_dim},
        batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency or pool_range(frac=0.25, lo=1),
        num_cpus=1)


class FrameFeaturizer(MediaDecoder):
    """Actor-pool stage over sampled frame payloads.  Decoder state is
    built ONCE per actor in ``__init__`` (inherited) — never inside the
    batch function, so a real model load stays a per-actor cost."""

    def __call__(self, batch: pa.Table) -> pa.Table:  # type: ignore[override]
        feats = [self._decode(p, "image")
                 for p in batch["frame_payload"].to_pylist()]
        return pa.Table.from_arrays(
            [batch["media_ref"], batch["frame_index"],
             pa.array([f.tolist() for f in feats],
                      pa.list_(pa.float32()))],
            names=["media_ref", "frame_index", "features"])


def frame_features(frames_ds, feat_dim: int = 8, concurrency=None,
                   batch_size: int = 32):
    """Sampled frames → per-frame feature vectors (actor pool)."""
    from ..runtime import pool_range

    return frames_ds.map_batches(
        FrameFeaturizer, fn_constructor_kwargs={"feat_dim": feat_dim},
        batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency or pool_range(frac=0.25, lo=1),
        num_cpus=1)


def sample_frames(media_ds, concurrency=None, batch_size: int = 32,
                  fake: bool = False):
    from ..runtime import pool_range

    return media_ds.map_batches(
        FrameSampler, fn_constructor_kwargs={"fake": fake},
        batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency or pool_range(frac=0.25, lo=1),
        num_cpus=1)


# --- raw-RGB kernels: REAL compute, no codec needed -----------------------
#
# Compressed formats need PIL/ffmpeg (absent here — stubbed above), but a
# raw uint8 RGB buffer is just bytes: the resize / feature math below is a
# real, tested numpy kernel, so the media path is only stubbed at the
# codec boundary, not at the compute.

def synth_raw_images(refs: list[str], width: int = 32, height: int = 24,
                     seed: int = 9) -> pa.Table:
    """Deterministic raw RGB test images: a per-image gradient + seeded
    noise, payload = height×width×3 uint8 bytes (row-major)."""
    rows = []
    for r in refs:
        s = int.from_bytes(hashlib.sha256(f"{seed}:{r}".encode())
                           .digest()[:4], "little")
        rng = np.random.RandomState(s)
        yy, xx = np.mgrid[0:height, 0:width]
        img = np.stack([
            (xx * 255 // max(1, width - 1)),
            (yy * 255 // max(1, height - 1)),
            rng.randint(0, 256, size=(height, width)),
        ], axis=-1).astype(np.uint8)
        rows.append(img.tobytes())
    return pa.Table.from_arrays(
        [pa.array(refs, pa.string()),
         pa.array(["image"] * len(refs), pa.string()),
         pa.array(rows, pa.binary()),
         pa.array([width] * len(refs), pa.int32()),
         pa.array([height] * len(refs), pa.int32()),
         pa.array([-1] * len(refs), pa.int32())],
        schema=MEDIA_SCHEMA)


def _bilinear_grid(src_h: int, src_w: int, out_h: int, out_w: int):
    """Sampling grid (align_corners=False convention):
    src = (dst + 0.5) · scale − 0.5, clipped to the image."""
    def axis(src_n, out_n):
        pos = (np.arange(out_n, dtype=np.float64) + 0.5) * (src_n / out_n) \
            - 0.5
        pos = np.clip(pos, 0.0, src_n - 1.0)
        lo = np.floor(pos).astype(np.int64)
        hi = np.minimum(lo + 1, src_n - 1)
        frac = pos - lo
        return lo, hi, frac
    ylo, yhi, fy = axis(src_h, out_h)
    xlo, xhi, fx = axis(src_w, out_w)
    return (ylo, yhi, fy), (xlo, xhi, fx)


class RawImageOps:
    """Actor-pool stage over raw RGB payloads: bilinear resize to a fixed
    (out_w, out_h) + per-channel mean/std features.  The per-(src,dst)
    sampling grids are cached in the actor (computed once, reused for
    every image of that geometry)."""

    def __init__(self, out_w: int = 16, out_h: int = 16):
        self.out_w = out_w
        self.out_h = out_h
        self._grids: dict = {}

    def _grid(self, h: int, w: int):
        g = self._grids.get((h, w))
        if g is None:
            g = _bilinear_grid(h, w, self.out_h, self.out_w)
            self._grids[(h, w)] = g
        return g

    def resize(self, img: np.ndarray) -> np.ndarray:
        (ylo, yhi, fy), (xlo, xhi, fx) = self._grid(*img.shape[:2])
        f = img.astype(np.float64)
        top = f[ylo][:, xlo] * (1 - fx)[None, :, None] \
            + f[ylo][:, xhi] * fx[None, :, None]
        bot = f[yhi][:, xlo] * (1 - fx)[None, :, None] \
            + f[yhi][:, xhi] * fx[None, :, None]
        out = top * (1 - fy)[:, None, None] + bot * fy[:, None, None]
        return np.clip(np.rint(out), 0, 255).astype(np.uint8)

    def __call__(self, batch: pa.Table) -> pa.Table:
        refs, payloads, means, stds = [], [], [], []
        for r, t, p, w, h in zip(batch["media_ref"].to_pylist(),
                                 batch["media_type"].to_pylist(),
                                 batch["payload"].to_pylist(),
                                 batch["width"].to_pylist(),
                                 batch["height"].to_pylist()):
            if t != "image" or w <= 0 or h <= 0 or len(p) < w * h * 3:
                continue
            img = np.frombuffer(p, np.uint8)[:w * h * 3].reshape(h, w, 3)
            small = self.resize(img)
            refs.append(r)
            payloads.append(small.tobytes())
            means.append(img.reshape(-1, 3).mean(axis=0)
                         .astype(np.float32).tolist())
            stds.append(img.reshape(-1, 3).std(axis=0)
                        .astype(np.float32).tolist())
        return pa.Table.from_arrays(
            [pa.array(refs, pa.string()),
             pa.array([self.out_w] * len(refs), pa.int32()),
             pa.array([self.out_h] * len(refs), pa.int32()),
             pa.array(payloads, pa.binary()),
             pa.array(means, pa.list_(pa.float32())),
             pa.array(stds, pa.list_(pa.float32()))],
            names=["media_ref", "width", "height", "payload",
                   "channel_mean", "channel_std"])


def resize_raw_images(media_ds, out_w: int = 16, out_h: int = 16,
                      concurrency=None, batch_size: int = 64):
    """Raw-RGB resize + features (actor pool, small batches — payload
    rows are wide).  Real kernel: only compressed-codec decode is
    stubbed in this container."""
    from ..runtime import pool_range

    return media_ds.map_batches(
        RawImageOps, fn_constructor_kwargs={"out_w": out_w, "out_h": out_h},
        batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency or pool_range(frac=0.25, lo=1),
        num_cpus=1)


def synth_png_table(refs: list[str], w: int = 32, h: int = 24,
                    seed: int = 7) -> pa.Table:
    """Media table whose payloads are REAL PNG bytes (per-ref seeded
    pixels, encoded by ops/png.py) — exercises the genuine codec path
    end-to-end in this container."""
    from .png import encode_png

    payloads = []
    for r in refs:
        rseed = int.from_bytes(
            hashlib.sha256(f"{seed}:{r}".encode()).digest()[:4], "little")
        rng = np.random.RandomState(rseed)
        payloads.append(encode_png(
            rng.randint(0, 256, (h, w, 3)).astype(np.uint8)))
    return pa.Table.from_arrays(
        [pa.array(refs, pa.string()),
         pa.array(["image"] * len(refs), pa.string()),
         pa.array(payloads, pa.binary()),
         pa.array([w] * len(refs), pa.int32()),
         pa.array([h] * len(refs), pa.int32()),
         pa.array([-1] * len(refs), pa.int32())],
        schema=MEDIA_SCHEMA)


def synth_bmp_table(refs: list[str], w: int = 32, h: int = 24,
                    seed: int = 11) -> pa.Table:
    """Media table whose payloads are REAL 24-bit BMP bytes (per-ref
    seeded pixels, encoded by ops/bmp.py) — exercises the genuine
    uncompressed codec path end-to-end in this container."""
    from .bmp import encode_bmp

    payloads = []
    for r in refs:
        rseed = int.from_bytes(
            hashlib.sha256(f"{seed}:{r}".encode()).digest()[:4], "little")
        rng = np.random.RandomState(rseed)
        payloads.append(encode_bmp(
            rng.randint(0, 256, (h, w, 3)).astype(np.uint8)))
    return pa.Table.from_arrays(
        [pa.array(refs, pa.string()),
         pa.array(["image"] * len(refs), pa.string()),
         pa.array(payloads, pa.binary()),
         pa.array([w] * len(refs), pa.int32()),
         pa.array([h] * len(refs), pa.int32()),
         pa.array([-1] * len(refs), pa.int32())],
        schema=MEDIA_SCHEMA)


def synth_jpeg_table(refs: list[str], w: int = 32, h: int = 24,
                     seed: int = 9) -> pa.Table:
    """Media table whose payloads are REAL baseline JPEG bytes (per-ref
    seeded smooth images, encoded by ops/jpeg.py; sampling mode cycles
    4:4:4 / 4:2:0 / 4:2:2 per ref) — exercises the genuine lossy codec
    path end-to-end in this container."""
    from .jpeg import encode_jpeg

    modes = [False, "420", "422"]
    payloads = []
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float64)
    for i, r in enumerate(refs):
        rseed = int.from_bytes(
            hashlib.sha256(f"{seed}:{r}".encode()).digest()[:4], "little")
        rng = np.random.RandomState(rseed)
        f = rng.uniform(4.0, 12.0, 6)
        img = np.stack([
            128 + 100 * np.sin(xx / f[0]) * np.cos(yy / f[1]),
            128 + 90 * np.cos(xx / f[2] + yy / f[3]),
            128 + 80 * np.sin((xx + yy) / f[4]) * np.cos(yy / f[5]),
        ], axis=2)
        img = np.clip(img, 0, 255).astype(np.uint8)
        payloads.append(encode_jpeg(img, quality=88,
                                    subsample=modes[i % 3]))
    return pa.Table.from_arrays(
        [pa.array(refs, pa.string()),
         pa.array(["image"] * len(refs), pa.string()),
         pa.array(payloads, pa.binary()),
         pa.array([w] * len(refs), pa.int32()),
         pa.array([h] * len(refs), pa.int32()),
         pa.array([-1] * len(refs), pa.int32())],
        schema=MEDIA_SCHEMA)


def synth_wav_table(refs: list[str], rate: int = 8000,
                    seed: int = 11) -> pa.Table:
    """Media table whose payloads are REAL PCM WAV bytes (per-ref seeded
    sine mixtures, encoded by ops/wav.py) — exercises the genuine audio
    codec path end-to-end in this container.  Durations vary per ref so
    the frame math sees ragged clip lengths."""
    from .wav import synth_wav

    payloads, durs = [], []
    for i, r in enumerate(refs):
        dur_ms = 150 + 40 * (i % 5)
        payloads.append(synth_wav(r, seed=seed, rate=rate,
                                  dur_ms=dur_ms))
        durs.append(dur_ms)
    return pa.Table.from_arrays(
        [pa.array(refs, pa.string()),
         pa.array(["audio"] * len(refs), pa.string()),
         pa.array(payloads, pa.binary()),
         pa.array([-1] * len(refs), pa.int32()),
         pa.array([-1] * len(refs), pa.int32()),
         pa.array(durs, pa.int32())],
        schema=MEDIA_SCHEMA)


def synth_gif_table(refs: list[str], w: int = 32, h: int = 24,
                    seed: int = 17) -> pa.Table:
    """Media table whose payloads are REAL animated-GIF bytes (per-ref
    seeded moving-gradient frames over a 64-color global palette,
    encoded by ops/gif.py) — the genuine MULTI-FRAME codec path: frame
    sampling downstream decodes true pixel frames, not fakes.  Frame
    counts vary per ref so sampling sees ragged clip lengths."""
    from .gif import encode_gif

    yy, xx = np.mgrid[0:h, 0:w]
    payloads, durs = [], []
    for i, r in enumerate(refs):
        rs = int.from_bytes(
            hashlib.sha256(f"{seed}:{r}".encode()).digest()[:4], "big")
        rng = np.random.RandomState(rs)
        palette = rng.randint(0, 256, size=(64, 3)).astype(np.uint8)
        n_frames = 2 + i % 5
        phase = rng.randint(0, 64)
        frames = []
        for f in range(n_frames):
            # drifting diagonal gradient, quantized to the palette
            idx = ((xx + yy + phase + 5 * f) % 64).astype(np.uint8)
            frames.append(idx)
        payloads.append(encode_gif(frames, palette))
        durs.append(n_frames * 100)
    return pa.Table.from_arrays(
        [pa.array(refs, pa.string()),
         pa.array(["video"] * len(refs), pa.string()),
         pa.array(payloads, pa.binary()),
         pa.array([w] * len(refs), pa.int32()),
         pa.array([h] * len(refs), pa.int32()),
         pa.array(durs, pa.int32())],
        schema=MEDIA_SCHEMA)


def synth_avi_table(refs: list[str], w: int = 32, h: int = 24,
                    seed: int = 23) -> pa.Table:
    """Media table whose payloads are REAL MJPEG AVI bytes (per-ref
    seeded drifting-gradient RGB frames, each an independent baseline
    JPEG inside a RIFF/AVI container — ops/avi.py + ops/jpeg.py): frame
    sampling downstream walks the true container and featurization
    decodes true pixels.  Frame counts vary per ref so sampling sees
    ragged clip lengths."""
    from .avi import encode_avi_mjpeg

    yy, xx = np.mgrid[0:h, 0:w]
    payloads, durs = [], []
    for i, r in enumerate(refs):
        rs = int.from_bytes(
            hashlib.sha256(f"{seed}:{r}".encode()).digest()[:4], "big")
        rng = np.random.RandomState(rs)
        base = rng.randint(0, 64, size=3)
        n_frames = 2 + i % 6
        frames = []
        for f in range(n_frames):
            img = np.empty((h, w, 3), np.uint8)
            for c in range(3):
                img[:, :, c] = ((xx * (c + 1) + yy + 7 * f + base[c])
                                % 192 + 32).astype(np.uint8)
            frames.append(img)
        payloads.append(encode_avi_mjpeg(frames, fps=10))
        durs.append(n_frames * 100)
    return pa.Table.from_arrays(
        [pa.array(refs, pa.string()),
         pa.array(["video"] * len(refs), pa.string()),
         pa.array(payloads, pa.binary()),
         pa.array([w] * len(refs), pa.int32()),
         pa.array([h] * len(refs), pa.int32()),
         pa.array(durs, pa.int32())],
        schema=MEDIA_SCHEMA)


class GifFrameSampler:
    """Actor-pool stage: animated-GIF payload → every ``stride``-th REAL
    decoded frame as raw RGB bytes + per-frame pixel features.  The
    codec (palette walk + LZW tables) lives in ``__init__``-scoped
    state per actor; 1 row in, ≤ max_frames rows out."""

    def __init__(self, stride: int = 2, max_frames: int = 4,
                 feat_dim: int = 8):
        from .gif import decode_gif
        self._decode = decode_gif
        self._feat = MediaDecoder(feat_dim=feat_dim)
        self.stride = stride
        self.max_frames = max_frames

    def __call__(self, batch: pa.Table) -> pa.Table:
        refs, fidx, wcol, hcol, payloads, feats = [], [], [], [], [], []
        for r, p in zip(batch["media_ref"].to_pylist(),
                        batch["payload"].to_pylist()):
            frames = self._decode(p)
            sel = list(range(0, len(frames), self.stride))
            for fi in sel[:self.max_frames]:
                img = frames[fi]
                refs.append(r)
                fidx.append(fi)
                hcol.append(img.shape[0])
                wcol.append(img.shape[1])
                payloads.append(img.tobytes())
                feats.append(
                    self._feat._pixel_features(img).tolist())
        return pa.Table.from_arrays(
            [pa.array(refs, pa.string()), pa.array(fidx, pa.int32()),
             pa.array(wcol, pa.int32()), pa.array(hcol, pa.int32()),
             pa.array(payloads, pa.binary()),
             pa.array(feats, pa.list_(pa.float32()))],
            names=["media_ref", "frame_index", "width", "height",
                   "frame_rgb", "features"])


def gif_frame_features(media_ds, stride: int = 2, max_frames: int = 4,
                       feat_dim: int = 8, concurrency=None,
                       batch_size: int = 16):
    """Animated GIF Dataset → sampled real-pixel frames + features
    (actor pool; small batches — multi-frame payload rows are wide)."""
    from ..runtime import pool_range

    return media_ds.map_batches(
        GifFrameSampler,
        fn_constructor_kwargs={"stride": stride, "max_frames": max_frames,
                               "feat_dim": feat_dim},
        batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency or pool_range(frac=0.25, lo=1),
        num_cpus=1)


# ---------------------------------------------------------------------------
# perceptual-hash (dHash) near-duplicate detection over decoded pixels
# ---------------------------------------------------------------------------

def synth_png_neardup_table(n_groups: int = 20, variants: int = 3,
                            w: int = 32, h: int = 24,
                            seed: int = 11) -> pa.Table:
    """Near-dup media corpus: ``n_groups`` base images, each encoded
    ``variants`` times with a tiny deterministic per-variant
    perturbation (±1 on a sparse pixel subset) — visually identical,
    byte-distinct PNGs, so exact dedup misses them but dHash keeps
    them within a few bits."""
    from .png import encode_png

    refs, payloads = [], []
    for g in range(n_groups):
        rng = np.random.RandomState(seed * 1000 + g)
        base = rng.randint(0, 255, (h, w, 3)).astype(np.int16)
        for v in range(variants):
            img = base.copy()
            if v:
                vr = np.random.RandomState(seed * 9000 + g * 10 + v)
                mask = vr.rand(h, w) < 0.02
                img[mask] += vr.choice([-1, 1], mask.sum())[:, None]
            refs.append(f"media://group-{g:04d}/v{v}")
            payloads.append(encode_png(
                np.clip(img, 0, 255).astype(np.uint8)))
    n = len(refs)
    return pa.Table.from_arrays(
        [pa.array(refs, pa.string()),
         pa.array(["image"] * n, pa.string()),
         pa.array(payloads, pa.binary()),
         pa.array([w] * n, pa.int32()),
         pa.array([h] * n, pa.int32()),
         pa.array([-1] * n, pa.int32())],
        schema=MEDIA_SCHEMA)


def _dhash64(img: np.ndarray) -> int:
    """64-bit difference hash, all-integer: luma = (299R+587G+114B)//
    1000, floor-index block partition to an 8×9 mean grid (integer
    ``sum // count``), bit = left > right per row."""
    gray = (img[:, :, 0].astype(np.int64) * 299
            + img[:, :, 1].astype(np.int64) * 587
            + img[:, :, 2].astype(np.int64) * 114) // 1000
    hh, ww = gray.shape
    re = (np.arange(9) * hh) // 8          # 8 row blocks
    ce = (np.arange(10) * ww) // 9         # 9 col blocks
    cum = np.zeros((hh + 1, ww + 1), np.int64)
    cum[1:, 1:] = gray.cumsum(0).cumsum(1)
    blk = np.empty((8, 9), np.int64)
    for i in range(8):
        for j in range(9):
            s = (cum[re[i + 1], ce[j + 1]] - cum[re[i], ce[j + 1]]
                 - cum[re[i + 1], ce[j]] + cum[re[i], ce[j]])
            blk[i, j] = s // ((re[i + 1] - re[i]) * (ce[j + 1] - ce[j]))
    bits = (blk[:, :-1] > blk[:, 1:]).ravel()
    return int(bits.astype(np.uint64)
               @ (np.uint64(1) << np.arange(64, dtype=np.uint64)))


class _DHasher:
    """Actor-pool stage: PNG decode + dHash per payload.  State (the
    codec entry point) binds in ``__init__`` once per actor."""

    def __init__(self):
        from .png import decode_png

        self._decode = decode_png

    def __call__(self, batch: pa.Table) -> pa.Table:
        hashes = []
        for p in batch["payload"].to_pylist():
            img = self._decode(p)
            if img.shape[2] == 4:
                img = img[:, :, :3]
            hashes.append(_dhash64(img))
        return pa.table({
            "media_ref": batch["media_ref"],
            "dhash": pa.array(np.array(hashes, np.uint64)
                              .astype(np.int64), pa.int64())})


def phash_near_dups(media_ds, max_hamming: int = 6,
                    concurrency=None, batch_size: int = 32):
    """Perceptual near-duplicate image pairs: decode → 64-bit dHash in
    an actor pool, then band the hash into four 16-bit LSH bands
    (pigeonhole: ≤6 differing bits leave ≥1 of 4 bands identical —
    the SimHash banding argument), ``groupby(band)`` buckets
    candidates, and an exact vectorized Hamming check keeps pairs ≤
    ``max_hamming``.  Output (ref_a, ref_b, hamming); only 16-byte
    hash rows cross the exchange — pixels never leave the decode
    stage.  Rows-only: inputs are synthesized binaries.
    """
    from ray.data.aggregate import Min

    from ..runtime import pool_range

    hashed = media_ds.map_batches(
        _DHasher, batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency or pool_range(frac=0.25, lo=1),
        num_cpus=1)

    _band_schema = pa.schema([("band", pa.int64()),
                              ("key", pa.int64()),
                              ("media_ref", pa.string()),
                              ("dhash", pa.int64())])

    def explode_bands(t: pa.Table) -> pa.Table:
        hv = t["dhash"].combine_chunks() \
            .to_numpy(zero_copy_only=False).astype(np.uint64)
        refs = t["media_ref"]
        cols_b, cols_k, cols_r, cols_h = [], [], [], []
        for b in range(4):
            band_val = ((hv >> np.uint64(16 * b))
                        & np.uint64(0xFFFF)).astype(np.int64)
            cols_b.append(np.full(len(hv), b, np.int64))
            cols_k.append(band_val)
            cols_r.append(refs)
            cols_h.append(hv.astype(np.int64))
        return pa.table({
            "band": np.concatenate(cols_b),
            "key": np.concatenate(cols_k),
            "media_ref": pa.concat_arrays(
                [c.combine_chunks() if isinstance(c, pa.ChunkedArray)
                 else c for c in cols_r]),
            "dhash": np.concatenate(cols_h)}, schema=_band_schema)

    _pair_schema = pa.schema([("ref_a", pa.string()),
                              ("ref_b", pa.string()),
                              ("hamming", pa.int64())])

    def bucket_pairs(g: pa.Table) -> pa.Table:
        if g.num_rows < 2:
            return _pair_schema.empty_table()
        import pyarrow.compute as pc

        order = pc.sort_indices(g["media_ref"])
        refs = pc.take(g["media_ref"], order).to_pylist()
        hv = pc.take(g["dhash"], order).to_numpy(zero_copy_only=False) \
            .astype(np.uint64)
        ii, jj = np.triu_indices(len(refs), k=1)
        x = hv[ii] ^ hv[jj]
        ham = np.zeros(len(x), np.int64)
        while x.any():
            ham += (x & np.uint64(1)).astype(np.int64)
            x >>= np.uint64(1)
        keep = ham <= max_hamming
        return pa.table({
            "ref_a": pa.array([refs[i] for i in ii[keep]], pa.string()),
            "ref_b": pa.array([refs[j] for j in jj[keep]], pa.string()),
            "hamming": pa.array(ham[keep], pa.int64())},
            schema=_pair_schema)

    from .groups import coarse_group_map

    exploded = hashed.map_batches(explode_bands, batch_format="pyarrow",
                                  zero_copy_batch=True)
    return coarse_group_map(exploded, ["band", "key"], bucket_pairs,
                            min_group_size=2) \
        .groupby(["ref_a", "ref_b"]) \
        .aggregate(Min("hamming", alias_name="hamming"))
