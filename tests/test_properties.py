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


# ---------------------------------------------------------------------------
# JPEG codec (pure-NumPy baseline DCT)
# ---------------------------------------------------------------------------

def test_jpeg_flat_field_exact():
    """A flat field has zero AC energy: DC-only round-trip at quant=1
    reconstructs the exact level."""
    import numpy as np

    from efficient_graph_algorithms_spark.operators.multimodal import (
        decode_jpeg, encode_jpeg)

    flat = np.full((16, 24), 128, dtype=np.uint8)
    w, h, img = decode_jpeg(encode_jpeg(flat, quant=1))
    assert (w, h) == (24, 16)
    np.testing.assert_allclose(img, 128.0 / 255.0, atol=1e-6)


def test_jpeg_near_lossless_roundtrip_444():
    """quant=1 4:4:4: only YCbCr rounding + float DCT error remains —
    every channel within 3/255 of the source."""
    import numpy as np

    from efficient_graph_algorithms_spark.operators.multimodal import (
        decode_jpeg, encode_jpeg)

    rng = np.random.default_rng(3)
    a = rng.integers(0, 256, size=(24, 17, 3), dtype=np.uint8)
    w, h, img = decode_jpeg(encode_jpeg(a, quant=1))
    assert (w, h) == (17, 24)
    assert np.abs(img * 255.0 - a.astype(np.float64)).max() < 3.0


def test_jpeg_grayscale_roundtrip():
    import numpy as np

    from efficient_graph_algorithms_spark.operators.multimodal import (
        decode_jpeg, encode_jpeg)

    rng = np.random.default_rng(5)
    g = rng.integers(0, 256, size=(9, 13), dtype=np.uint8)
    w, h, img = decode_jpeg(encode_jpeg(g, quant=1))
    assert (w, h) == (13, 9)
    assert img.shape == (9, 13, 3)
    assert np.abs(img[:, :, 0] * 255.0 - g).max() < 2.0
    np.testing.assert_allclose(img[:, :, 0], img[:, :, 1])  # replicated


def test_jpeg_420_subsampled_luma_bounded():
    """4:2:0 decode: luma (not subsampled) stays within quantization
    error of the source luma; the MCU interleave (4 Y blocks + Cb +
    Cr) is exercised on a non-multiple-of-16 image."""
    import numpy as np

    from efficient_graph_algorithms_spark.operators.multimodal import (
        decode_jpeg, encode_jpeg)

    rng = np.random.default_rng(7)
    a = rng.integers(0, 256, size=(24, 17, 3), dtype=np.uint8)
    w, h, img = decode_jpeg(encode_jpeg(a, quant=2, subsample=True))
    assert (w, h) == (17, 24)
    got_y = 0.299 * img[:, :, 0] + 0.587 * img[:, :, 1] + 0.114 * img[:, :, 2]
    src_y = (0.299 * a[:, :, 0] + 0.587 * a[:, :, 1] + 0.114 * a[:, :, 2]) / 255.0
    # clipping after chroma upsample can push decoded luma a few levels
    assert np.abs(got_y - src_y).max() * 255.0 < 20.0
    assert np.abs(got_y - src_y).mean() * 255.0 < 3.0


def test_jpeg_malformed_fails_loudly():
    import numpy as np
    import pytest as _pytest

    from efficient_graph_algorithms_spark.operators.multimodal import (
        decode_jpeg, encode_jpeg)

    good = encode_jpeg(np.zeros((8, 8), dtype=np.uint8))
    with _pytest.raises(ValueError):
        decode_jpeg(b"\x00\x01not a jpeg")
    with _pytest.raises(ValueError):
        decode_jpeg(good[:20])  # truncated before SOS
    # progressive SOF2 must be rejected, not mis-decoded
    prog = bytearray(good)
    sof = prog.find(b"\xff\xc0")
    prog[sof + 1] = 0xC2
    with _pytest.raises(NotImplementedError):
        decode_jpeg(bytes(prog))


@given(
    w=st.integers(min_value=1, max_value=20),
    h=st.integers(min_value=1, max_value=20),
    seed=st.integers(min_value=0, max_value=2**31),
)
@settings(max_examples=20, deadline=None)
def test_jpeg_roundtrip_property(w, h, seed):
    """Any size (including non-multiples of 8, 1-pixel edges): decode
    returns the exact declared dimensions and stays within the
    near-lossless quant=1 error bound."""
    import numpy as np

    from efficient_graph_algorithms_spark.operators.multimodal import (
        decode_jpeg, encode_jpeg)

    img = np.random.default_rng(seed).integers(0, 256, (h, w, 3)).astype(np.uint8)
    ww, hh, out = decode_jpeg(encode_jpeg(img, quant=1))
    assert (ww, hh) == (w, h)
    assert np.abs(out * 255.0 - img.astype(np.float64)).max() < 3.0


@settings(max_examples=60, deadline=None)
@given(
    frames=st.lists(
        st.tuples(
            st.sampled_from([3, 2, 0]),  # MPEG version bits (1, 2, 2.5)
            st.integers(1, 3),           # layer
            st.integers(1, 14),          # bitrate index
            st.integers(0, 2),           # samplerate index
            st.booleans(),               # padding
            st.booleans(),               # mono
        ),
        min_size=2,
        max_size=12,
    ),
    id3_len=st.one_of(st.none(), st.integers(0, 100)),
)
def test_mp3_frame_walker_property(frames, id3_len):
    """The walker's (frame count, duration, mean bitrate, vbr) must
    equal the generator's arithmetic for ANY chained frame sequence
    across versions/layers/bitrates, with or without an ID3v2 tag.
    The first frame pins (rate, channels); later frames vary bitrate
    only (real VBR streams hold rate/layer constant, and the walker's
    chain arithmetic needs frame lengths to be self-consistent)."""
    from efficient_graph_algorithms_spark.operators.multimodal import (
        _mp3_frame,
        decode_mp3_meta,
    )

    ver, layer, _, sr_idx, _, mono = frames[0]
    payload = b""
    if id3_len is not None:
        payload = b"ID3\x04\x00\x00" + bytes(
            [0, 0, id3_len >> 7, id3_len & 0x7F]
        ) + b"\x00" * id3_len
    total_samples = 0
    kbps_list = []
    rate = None
    for _, _, br_idx, _, padding, _ in frames:
        b1 = 0xE0 | (ver << 3) | ((4 - layer) << 1) | 1
        b2 = (br_idx << 4) | (sr_idx << 2) | (int(padding) << 1)
        b3 = 0xC0 if mono else 0x00
        hdr = bytes([0xFF, b1, b2, b3])
        flen, spf, r, kbps, ch = _mp3_frame(hdr, 0)
        payload += hdr + b"\x00" * (flen - 4)
        total_samples += spf
        kbps_list.append(kbps)
        rate = r
    meta = decode_mp3_meta(payload)
    assert meta["n_frames"] == len(frames)
    assert meta["sample_rate"] == rate
    assert meta["n_channels"] == (1 if mono else 2)
    assert meta["duration_sec"] == total_samples / rate
    assert meta["bitrate_kbps_mean"] == sum(kbps_list) / len(kbps_list)
    assert meta["vbr"] == (len(set(kbps_list)) > 1)
    assert meta["has_id3"] == (id3_len is not None)


_WORDS = ["alpha", "beta", "gamma", "delta", "eps"]


@settings(max_examples=6, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    docs=st.lists(
        st.lists(  # a doc = list of lines; a line = list of word indices
            st.lists(st.integers(0, 4), min_size=0, max_size=4),
            min_size=1,
            max_size=5,
        ),
        min_size=1,
        max_size=12,
    ),
    min_count=st.sampled_from([2, 3]),
)
def test_boilerplate_matches_reference(spark, docs, min_count):
    """Random tiny corpora over a 5-word vocabulary (so hot lines occur
    by construction) vs an independent pure-Python sweep."""
    import re as _re

    from efficient_graph_algorithms_spark.operators.boilerplate import (
        remove_boilerplate_lines,
    )

    rows = [
        (i, "\n".join(" ".join(_WORDS[w] for w in line) for line in doc))
        for i, doc in enumerate(docs)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")

    def norm(line):
        return _re.sub(r"\s+", " ", line.lower()).strip()

    counts: dict[str, int] = {}
    for _, text in rows:
        for line in text.split("\n"):
            k = norm(line)
            if k:
                counts[k] = counts.get(k, 0) + 1
    hot = {k for k, c in counts.items() if c >= min_count}
    want = {}
    for i, text in rows:
        lines = text.split("\n")
        kept = [ln for ln in lines if norm(ln) not in hot]
        want[i] = (len(lines), len(lines) - len(kept), "\n".join(kept))
    got = {
        r["doc_id"]: (r["n_lines"], r["n_removed"], r["clean_text"])
        for r in remove_boilerplate_lines(df, min_count=min_count).collect()
    }
    assert got == want


@settings(max_examples=6, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    docs=st.lists(
        st.lists(st.integers(0, 4), min_size=0, max_size=14),
        min_size=1,
        max_size=10,
    ),
    width=st.sampled_from([2, 3]),
)
def test_dup_spans_matches_reference(spark, docs, width):
    """Random token sequences over a 5-word vocabulary vs an
    independent pure-Python window counter."""
    from collections import Counter

    from efficient_graph_algorithms_spark.operators.dupspans import dup_span_stats

    rows = [(i, " ".join(_WORDS[w] for w in doc)) for i, doc in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    wins = []
    for i, doc in enumerate(docs):
        if len(doc) >= width:
            for s in range(len(doc) - width + 1):
                wins.append((i, tuple(doc[s : s + width])))
    c = Counter(w for _, w in wins)
    want = {}
    for i, doc in enumerate(docs):
        mine = [w for d, w in wins if d == i]
        nd = sum(1 for w in mine if c[w] >= 2)
        want[i] = (len(mine), nd, round(nd / len(mine), 6) if mine else 0.0)
    got = {
        r["doc_id"]: (r["n_windows"], r["n_dup_windows"], r["dup_window_frac"])
        for r in dup_span_stats(df, width=width, min_count=2).collect()
    }
    assert got == want
