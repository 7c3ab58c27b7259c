"""Round-4 additions: vectorized PNG Average/Paeth decode, pool-range
headroom invariant, decayed-value overflow guard, frame-feature pool
stage."""

import numpy as np
import pyarrow as pa
import pytest


def _filter_row(f: int, raw: np.ndarray, prev: np.ndarray,
                c: int) -> bytes:
    """Forward PNG filter (encoder side) — independent reference used to
    build fixture rows for every filter type."""
    stride = len(raw)
    out = bytearray(stride)
    for i in range(stride):
        a = int(raw[i - c]) if i >= c else 0
        b = int(prev[i])
        cc = int(prev[i - c]) if i >= c else 0
        if f == 0:
            pred = 0
        elif f == 1:
            pred = a
        elif f == 2:
            pred = b
        elif f == 3:
            pred = (a + b) >> 1
        else:
            pp = a + b - cc
            pa_, pb_, pc_ = abs(pp - a), abs(pp - b), abs(pp - cc)
            pred = a if (pa_ <= pb_ and pa_ <= pc_) else \
                (b if pb_ <= pc_ else cc)
        out[i] = (int(raw[i]) - pred) & 0xFF
    return bytes(out)


def _build_png(img: np.ndarray, filters: list[int]) -> bytes:
    import struct
    import zlib

    from kgruntime.ops.png import PNG_MAGIC

    h, w, c = img.shape
    raw = b""
    prev = np.zeros(w * c, np.uint8)
    for y in range(h):
        row = img[y].reshape(-1)
        raw += bytes([filters[y]]) + _filter_row(filters[y], row, prev, c)
        prev = row

    def chunk(tag, body):
        return (struct.pack(">I", len(body)) + tag + body
                + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF))

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2 if c == 3 else 6, 0, 0, 0)
    return (PNG_MAGIC + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(raw))
            + chunk(b"IEND", b""))


def test_png_avg_paeth_vectorized_exact():
    from kgruntime.ops.png import decode_png

    rng = np.random.RandomState(11)
    img = rng.randint(0, 256, (12, 20, 3)).astype(np.uint8)
    for filters in ([3] * 12, [4] * 12, [0, 1, 2, 3, 4] * 2 + [3, 4]):
        data = _build_png(img, list(filters))
        assert np.array_equal(decode_png(data), img), filters


def test_png_paeth_pathological_fallback():
    # prev-row = 0 makes Paeth predict `left` for every byte — the
    # longest possible dependency chain; with w > _FP_MAX_PASSES the
    # fixed-point sweep hits its cap and must take the exact sequential
    # fallback.  The smooth gradient also drives Average's worst case.
    from kgruntime.ops.png import _FP_MAX_PASSES, decode_png

    w = _FP_MAX_PASSES * 2 + 10
    grad = (np.arange(w)[None, :, None] // 2 + np.arange(3)[None, None, :])
    img = np.broadcast_to(grad % 256, (3, w, 3)).astype(np.uint8).copy()
    for f in (3, 4):
        data = _build_png(img, [f] * 3)
        assert np.array_equal(decode_png(data), img), f


def test_png_rgba_all_filters():
    from kgruntime.ops.png import decode_png

    rng = np.random.RandomState(13)
    img = rng.randint(0, 256, (7, 9, 4)).astype(np.uint8)
    data = _build_png(img, [4, 3, 2, 1, 0, 3, 4])
    assert np.array_equal(decode_png(data), img)


def test_pool_range_headroom_small_hosts(monkeypatch):
    from kgruntime import runtime

    for cpus, frac in [(2, 0.25), (4, 0.25), (4, 1.0), (8, 1.0),
                       (32, 0.25), (256, 0.25)]:
        monkeypatch.setattr(runtime, "cluster_cpus", lambda c=cpus: c)
        lo, hi = runtime.pool_range(frac=frac)
        assert lo < hi
        # headroom invariant: never hand the pool every CPU (unless the
        # host is so small that lo+1 already exceeds it)
        assert hi < cpus or hi == lo + 1


def test_decayed_value_overflow_raises(ray_session):
    import ray.data as rd

    from kgruntime.ops.sessions import decayed_user_value

    t = pa.table({
        "user_id": pa.array([1, 2], pa.int64()),
        "event_type": ["purchase", "purchase"],
        "value": pa.array([1.0, 1e9], pa.float64()),
        "ts": pa.array([1_700_000_000_000_000] * 2,
                       pa.timestamp("us")),
    })
    with pytest.raises(Exception) as ei:
        decayed_user_value(rd.from_arrow(t)).to_pandas()
    # the ValueError sits a few links down Ray's exception chain
    msgs, e, seen = [], ei.value, set()
    while e is not None and id(e) not in seen:
        seen.add(id(e))
        msgs.append(str(e))
        e = (getattr(e, "cause", None) or e.__cause__ or e.__context__)
    assert any("exact-int64 bound" in m for m in msgs), msgs[-1][:200]


def test_frame_features_pool_stage(ray_session):
    import ray.data as rd

    from kgruntime.ops.media import (frame_features, sample_frames,
                                     synth_media_table)

    refs = [f"media://doc-{i:04d}/0" for i in range(30)]
    frames = sample_frames(rd.from_arrow(synth_media_table(refs)))
    out = frame_features(frames, feat_dim=8).take_all()
    assert len(out) > 0
    assert all(len(r["features"]) == 8 for r in out)
    # deterministic across runs
    out2 = frame_features(
        sample_frames(rd.from_arrow(synth_media_table(refs))),
        feat_dim=8).take_all()
    key = lambda r: (r["media_ref"], r["frame_index"])  # noqa: E731
    assert sorted(out, key=key) == sorted(out2, key=key)
