"""Real WAV (RIFF/PCM) audio codec — stdlib ``struct`` + numpy, no
torchaudio/soundfile (absent from this container).  Same precedent as
the PNG (``ops/png.py``) and baseline-JPEG (``ops/jpeg.py``) codecs:
the container format and sample decode are REAL, so audio features
downstream derive from true waveforms, not hashes.

Scope: canonical PCM WAVE — 8-bit unsigned / 16-bit signed LE samples,
any channel count, arbitrary extra chunks (``LIST``/``fact``/…) skipped
with correct word alignment.  Compressed codecs (MP3/AAC/FLAC) would
need external libraries and raise loudly, mirroring the JPEG/video
policy in ``ops/media.py``.

Reference behavior parity note: the reference engine
(/root/reference, turtle-syntax) has no audio path; this module is part
of the beyond-reference training-data operator surface (north_rule
"interleaved text + media documents").
"""

from __future__ import annotations

import struct

import numpy as np

WAV_MAGIC = b"RIFF"


def encode_wav(samples: np.ndarray, rate: int = 8000) -> bytes:
    """int16 samples ``(n,)`` or ``(n, ch)`` → canonical PCM WAV bytes
    (RIFF header + fmt + data, word-aligned)."""
    s = np.asarray(samples, dtype=np.int16)
    if s.ndim == 1:
        s = s[:, None]
    n, ch = s.shape
    payload = s.reshape(-1).tobytes()        # interleaved frames
    if len(payload) % 2:                     # 16-bit: never, but keep
        payload += b"\x00"                   # the RIFF alignment rule
    fmt = struct.pack("<HHIIHH", 1, ch, rate, rate * ch * 2, ch * 2, 16)
    body = (b"WAVEfmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", n * ch * 2) + payload)
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """PCM WAV bytes → (int16 samples ``(n, ch)``, sample rate).

    Walks the RIFF chunk list (word-aligned), takes the first ``fmt ``
    and ``data`` chunks, and vectorizes sample decode with
    ``np.frombuffer`` (8-bit unsigned is re-centered to int16 range the
    canonical way: ``(u8 - 128) << 8``)."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, end = 12, 8 + struct.unpack("<I", payload[4:8])[0]
    end = min(end, len(payload))
    fmt = data = None
    while pos + 8 <= end and (fmt is None or data is None):
        cid = payload[pos:pos + 4]
        size = struct.unpack("<I", payload[pos + 4:pos + 8])[0]
        chunk = payload[pos + 8:pos + 8 + size]
        if cid == b"fmt " and fmt is None:
            fmt = chunk
        elif cid == b"data" and data is None:
            data = chunk
        pos += 8 + size + (size & 1)         # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("WAV missing fmt/data chunk")
    audio_fmt, ch, rate, _, _, bits = struct.unpack("<HHIIHH", fmt[:16])
    if audio_fmt != 1:
        raise NotImplementedError(
            f"compressed WAV (format tag {audio_fmt}) needs an external "
            "codec library — only PCM decodes in this container")
    if bits == 16:
        s = np.frombuffer(data, dtype="<i2")
    elif bits == 8:
        s = ((np.frombuffer(data, dtype=np.uint8).astype(np.int16)
              - 128) << 8)
    else:
        raise NotImplementedError(f"{bits}-bit PCM not supported")
    n = len(s) // ch
    return s[:n * ch].reshape(n, ch).astype(np.int16, copy=False), rate


def synth_wav(key: str, seed: int = 5, rate: int = 8000,
              dur_ms: int = 250) -> bytes:
    """Deterministic mono test clip: a 3-sine mixture + fade envelope,
    frequencies/phases seeded from ``key`` — every worker and test
    regenerates byte-identical audio (repo determinism rule)."""
    import hashlib

    h = hashlib.sha256(f"{seed}:{key}".encode()).digest()
    rng = np.random.RandomState(int.from_bytes(h[:4], "little"))
    n = rate * dur_ms // 1000
    t = np.arange(n, dtype=np.float64) / rate
    x = np.zeros(n)
    for _ in range(3):
        f = 100.0 + rng.randint(0, 3000)
        x += rng.uniform(0.2, 1.0) * np.sin(
            2 * np.pi * f * t + rng.uniform(0, 2 * np.pi))
    x *= np.minimum(1.0, np.minimum(t, t[::-1] + 1e-9) * 40)  # fade
    x /= max(1e-9, np.abs(x).max())
    return encode_wav((x * 32000).astype(np.int16), rate)


def wav_features(samples: np.ndarray, rate: int, feat_dim: int = 16,
                 frame: int = 512, hop: int = 256) -> np.ndarray:
    """True-waveform per-clip features: duration, global RMS, peak,
    zero-crossing rate, mean/std of framed RMS, and 8 rFFT band
    energies (log1p, normalized) — padded/truncated to ``feat_dim``.
    All numpy-vectorized (no Python per-sample loops)."""
    x = samples.astype(np.float64).mean(axis=1) / 32768.0  # downmix
    n = len(x)
    if n == 0:
        return np.zeros(feat_dim, np.float32)
    rms = float(np.sqrt(np.mean(x * x)))
    peak = float(np.abs(x).max())
    zcr = float(np.mean(np.signbit(x[1:]) != np.signbit(x[:-1]))) \
        if n > 1 else 0.0
    n_frames = max(1, 1 + (n - frame) // hop) if n >= frame else 1
    idx = (np.arange(n_frames)[:, None] * hop
           + np.arange(min(frame, n))[None, :])
    idx = np.minimum(idx, n - 1)
    frames_rms = np.sqrt((x[idx] ** 2).mean(axis=1))
    spec = np.abs(np.fft.rfft(x))
    bands = np.array_split(spec, 8)
    band_e = np.log1p(np.array([float((b * b).sum()) for b in bands]))
    band_e = band_e / max(1e-9, band_e.max())
    feats = np.concatenate([
        [n / rate, rms, peak, zcr,
         float(frames_rms.mean()), float(frames_rms.std())],
        band_e])
    out = np.zeros(feat_dim, np.float32)
    m = min(feat_dim, len(feats))
    out[:m] = feats[:m]
    return out
