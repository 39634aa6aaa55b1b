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
