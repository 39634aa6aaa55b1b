"""Property-based tests (hypothesis) for the pure-NumPy codecs and the
sessionizer.

The codecs round-trip under arbitrary generated inputs (many fast
examples, no Spark); the batch sessionizer is checked against an
independent pure-Python reference on randomized event sets (few
examples — each pays a Spark job)."""

from __future__ import annotations

import numpy as np
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


@settings(max_examples=50, deadline=None)
@given(
    n_frames=st.integers(1, 400),
    n_ch=st.integers(1, 3),
    rate=st.sampled_from([8000, 16000, 44100]),
    seed=st.integers(0, 2**31 - 1),
)
def test_wav_roundtrip_property(n_frames, n_ch, rate, seed):
    from efficient_graph_algorithms_spark.operators.multimodal import (
        decode_wav,
        encode_wav_pcm16,
    )

    rng = np.random.default_rng(seed)
    x = rng.uniform(-1.0, 1.0, size=(n_frames, n_ch))
    r, ch, out = decode_wav(encode_wav_pcm16(x, rate))
    assert (r, ch) == (rate, n_ch)
    assert out.shape == (n_frames, n_ch)
    # 16-bit quantization: worst-case error is one step
    assert np.max(np.abs(out - x)) <= 1.5 / 32767


@settings(max_examples=50, deadline=None)
@given(
    w=st.integers(1, 40),
    h=st.integers(1, 25),
    seed=st.integers(0, 2**31 - 1),
)
def test_bmp_roundtrip_property(w, h, seed):
    from efficient_graph_algorithms_spark.operators.multimodal import (
        decode_bmp,
        encode_bmp24,
    )

    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    ww, hh, out = decode_bmp(encode_bmp24(img))
    assert (ww, hh) == (w, h)
    assert np.array_equal(np.round(out * 255).astype(np.uint8), img)


def _sessions_reference(events, gap_sec):
    """Independent pure-Python sessionizer: (user, [ts]) -> session tuples."""
    by_user: dict[int, list[tuple[int, float]]] = {}
    for uid, ts, val in events:
        by_user.setdefault(uid, []).append((ts, val))
    out = set()
    for uid, evs in by_user.items():
        evs.sort()
        cur = None
        for ts, val in evs:
            if cur is not None and ts - cur[1] <= gap_sec:
                cur[1] = ts
                cur[2] += 1
                cur[3] += val
            else:
                if cur is not None:
                    out.add((uid, cur[0], cur[1], cur[2], round(cur[3], 6)))
                cur = [ts, ts, 1, val]
        out.add((uid, cur[0], cur[1], cur[2], round(cur[3], 6)))
    return out


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    data=st.lists(
        st.tuples(
            st.integers(0, 5),            # user_id
            st.integers(0, 100_000),      # ts offset seconds (whole — exact)
            st.integers(-100, 100),       # value in half units (exact double)
        ),
        min_size=1,
        max_size=60,
    ),
    gap=st.sampled_from([60, 600, 3600]),
)
def test_sessionize_batch_matches_reference(spark, data, gap):
    from datetime import datetime, timedelta

    from efficient_graph_algorithms_spark.streaming.sessions import sessionize

    base = datetime(2024, 1, 1)
    rows = [
        (uid, base + timedelta(seconds=off), v / 2.0)
        for uid, off, v in data
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, value double")
    got = {
        (
            r["user_id"],
            int((r["session_start"].replace(tzinfo=None) - base).total_seconds()),
            int((r["session_end"].replace(tzinfo=None) - base).total_seconds()),
            r["n_events"],
            r["sum_value"],
        )
        for r in sessionize(df, gap_sec=gap).collect()
    }
    want = _sessions_reference(
        [(uid, off, v / 2.0) for uid, off, v in data], gap
    )
    assert got == want


@given(
    r1=st.floats(min_value=0.0, max_value=1.0),
    r2=st.floats(min_value=0.0, max_value=1.0),
    seed=st.integers(min_value=0, max_value=2**31),
)
@settings(max_examples=50, deadline=None)
def test_hash_sample_threshold_monotone(r1, r2, seed):
    """The hash gate is monotone in rate: every id kept at the lower
    rate is kept at the higher one (same seed) — the property that lets
    a pipeline re-run with a larger budget keep its old sample as a
    strict subset. Pure-Python face of operators/sampling.py (the Spark
    expression computes the identical md5 integers; tests/test_sampling
    pins that equivalence)."""
    import hashlib

    from efficient_graph_algorithms_spark.operators.sampling import rate_threshold

    lo, hi = sorted((r1, r2))
    t_lo, t_hi = rate_threshold(lo), rate_threshold(hi)
    assert t_lo <= t_hi
    kept = {
        i
        for i in range(300)
        if int(hashlib.md5(f"smpl:{seed}:{i}".encode()).hexdigest()[:15], 16) < t_lo
    }
    kept_hi = {
        i
        for i in range(300)
        if int(hashlib.md5(f"smpl:{seed}:{i}".encode()).hexdigest()[:15], 16) < t_hi
    }
    assert kept <= kept_hi


def _png_forward_filter(img, filters):
    """Test-side forward filtering (the encoder's dual): produce the
    raw scanline stream for the given per-row filter types."""
    import numpy as np

    h, w, ch = img.shape
    stride = w * ch
    flat = img.reshape(h, stride).astype(np.int32)
    out = []
    prev = np.zeros(stride, dtype=np.int32)
    for y in range(h):
        cur = flat[y]
        f = filters[y % len(filters)]
        filt = np.zeros(stride, dtype=np.int32)
        for x in range(stride):
            a = cur[x - ch] if x >= ch else 0
            b = prev[x]
            c = prev[x - ch] if x >= ch else 0
            if f == 0:
                pred = 0
            elif f == 1:
                pred = a
            elif f == 2:
                pred = b
            elif f == 3:
                pred = (a + b) // 2
            else:
                pa, pb, pc = abs(b - c), abs(a - c), abs(a + b - 2 * c)
                pred = a if pa <= pb and pa <= pc else (b if pb <= pc else c)
            filt[x] = (cur[x] - pred) % 256
        out.append(bytes([f]) + bytes(filt.astype(np.uint8)))
        prev = cur
    return b"".join(out)


def _png_wrap(w, h, ctype, raw):
    import zlib

    def chunk(typ, data):
        return (len(data).to_bytes(4, "big") + typ + data
                + (zlib.crc32(typ + data) & 0xFFFFFFFF).to_bytes(4, "big"))

    ihdr = w.to_bytes(4, "big") + h.to_bytes(4, "big") + bytes([8, ctype, 0, 0, 0])
    return (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(raw)) + chunk(b"IEND", b""))


def test_png_all_filters_decode():
    """Every PNG row filter (None/Sub/Up/Average/Paeth) undone exactly."""
    import numpy as np

    from efficient_graph_algorithms_spark.operators.multimodal import decode_png

    rng = np.random.default_rng(9)
    img = rng.integers(0, 256, (10, 7, 3)).astype(np.uint8)
    raw = _png_forward_filter(img, filters=[0, 1, 2, 3, 4])
    w, h, out = decode_png(_png_wrap(7, 10, 2, raw))
    assert (w, h) == (7, 10)
    np.testing.assert_allclose(out, img.astype(np.float32) / 255.0, atol=1e-7)


def test_png_gray_and_rgba():
    import numpy as np

    from efficient_graph_algorithms_spark.operators.multimodal import decode_png

    rng = np.random.default_rng(4)
    gray = rng.integers(0, 256, (5, 6, 1)).astype(np.uint8)
    w, h, out = decode_png(_png_wrap(6, 5, 0, _png_forward_filter(gray, [0, 2])))
    assert out.shape == (5, 6, 3)
    np.testing.assert_allclose(out[:, :, 0], gray[:, :, 0] / 255.0, atol=1e-7)
    np.testing.assert_allclose(out[:, :, 1], out[:, :, 0])  # replicated

    rgba = rng.integers(0, 256, (4, 3, 4)).astype(np.uint8)
    w, h, out = decode_png(_png_wrap(3, 4, 6, _png_forward_filter(rgba, [1, 4])))
    np.testing.assert_allclose(out, rgba[:, :, :3] / 255.0, atol=1e-7)  # alpha dropped


def test_png_malformed_fails_loudly():
    import pytest as _pytest

    from efficient_graph_algorithms_spark.operators.multimodal import (
        decode_png, encode_png)
    import numpy as np

    good = encode_png(np.zeros((3, 3, 3), dtype=np.uint8))
    bad = bytearray(good)
    bad[20] ^= 0xFF  # corrupt IHDR payload -> CRC mismatch
    with _pytest.raises(ValueError, match="CRC"):
        decode_png(bytes(bad))
    with _pytest.raises(ValueError):
        decode_png(b"\x89PNG\r\n\x1a\nnot-a-chunk")


@given(
    w=st.integers(min_value=1, max_value=12),
    h=st.integers(min_value=1, max_value=12),
    seed=st.integers(min_value=0, max_value=2**31),
)
@settings(max_examples=30, deadline=None)
def test_png_roundtrip_property(w, h, seed):
    import numpy as np

    from efficient_graph_algorithms_spark.operators.multimodal import (
        decode_png, encode_png)

    img = np.random.default_rng(seed).integers(0, 256, (h, w, 3)).astype(np.uint8)
    ww, hh, out = decode_png(encode_png(img))
    assert (ww, hh) == (w, h)
    np.testing.assert_allclose(out, img.astype(np.float32) / 255.0, atol=1e-7)
