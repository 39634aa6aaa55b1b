"""Image dHash + near-dup pairs: closed forms, cross-format stability,
banded join vs brute force."""

from __future__ import annotations

import numpy as np
import pytest

from efficient_graph_algorithms_spark.operators.imagehash import (
    dhash64,
    image_dhashes,
    image_near_dups,
)
from efficient_graph_algorithms_spark.operators.multimodal import (
    encode_bmp24,
    encode_png,
)


def _img(seed, h=32, w=36):
    rng = np.random.default_rng(seed)
    return rng.random((h, w, 3)).astype(np.float32)


def test_closed_form_gradients():
    w, h = 18, 16
    inc = np.tile(np.linspace(0.0, 1.0, w), (h, 1))  # brighter to the right
    dec = inc[:, ::-1]
    assert dhash64(inc) == 0  # left cell always darker -> every bit 0
    assert dhash64(dec) == -1  # all 64 bits set == -1 in two's complement
    flat = np.zeros((h, w))
    assert dhash64(flat) == 0  # ties are not '>'


def test_small_image_rejected():
    with pytest.raises(ValueError, match="dhash grid"):
        dhash64(np.zeros((4, 4)))


def test_cross_format_stability_and_robustness():
    """Same pixels as BMP and PNG hash identically (both lossless);
    mild brightness shift stays near, random image is far."""
    base = _img(1)
    h_bmp = dhash64(base)
    # dHash depends only on luminance ordering -> +0.08 brightness
    # (clipped) flips at most a few cells near saturation
    bright = np.clip(base + 0.08, 0.0, 1.0)
    other = _img(2)
    d_bright = bin((h_bmp ^ dhash64(bright)) & (1 << 64) - 1).count("1")
    d_other = bin((h_bmp ^ dhash64(other)) & (1 << 64) - 1).count("1")
    assert d_bright <= 8
    assert d_other > 16  # two random orderings agree ~50% of 64 bits


def test_spark_hashes_match_local(spark):
    imgs = {i: _img(i) for i in range(6)}
    rows = []
    for i, a in imgs.items():
        payload = encode_bmp24(a) if i % 2 == 0 else encode_png(a)
        rows.append((i, "image", bytearray(payload)))
    rows.append((99, "image", bytearray(b"not an image")))  # dropped
    media = spark.createDataFrame(
        rows, "media_id long, kind string, payload binary"
    )
    got = {r["media_id"]: r["dhash"] for r in image_dhashes(media).collect()}
    # byte-encode/decode round trip quantizes to uint8 — hash the
    # quantized pixels, exactly what the executors decoded
    want = {
        i: dhash64(np.round(a * 255.0).astype(np.uint8).astype(np.float32) / 255.0)
        for i, a in imgs.items()
    }
    assert got == want
    assert 99 not in got


def test_near_dups_banded_equals_bruteforce(spark):
    base = _img(7)
    variants = {
        0: base,
        1: np.clip(base + 0.05, 0, 1),   # near-dup of 0
        2: base[:, ::-1].copy(),          # mirrored: far
        3: _img(8),
        4: np.clip(_img(8) + 0.04, 0, 1),  # near-dup of 3
    }
    media = spark.createDataFrame(
        [(i, "image", bytearray(encode_bmp24(a))) for i, a in variants.items()],
        "media_id long, kind string, payload binary",
    )
    max_ham = 10
    got = {
        (r["a"], r["b"]): r["hamming"]
        for r in image_near_dups(media, max_hamming=max_ham).collect()
    }
    hashes = {r["media_id"]: r["dhash"] for r in image_dhashes(media).collect()}
    want = {}
    for a in sorted(hashes):
        for b in sorted(hashes):
            if a < b:
                d = bin((hashes[a] ^ hashes[b]) & (1 << 64) - 1).count("1")
                if d <= max_ham:
                    want[(a, b)] = d
    assert got == want
    assert (0, 1) in got and (3, 4) in got
    assert (0, 2) not in got


def _vid_frames(ms, h=16, w=18):
    """One step-gradient frame per m in ms (bright x<2m, dark after)."""
    out = np.zeros((len(ms), h, w), dtype=np.float32)
    for f, m in enumerate(ms):
        out[f, :, : 2 * m] = 1.0
    return out


def test_video_frame_dhashes_closed_form(spark):
    from efficient_graph_algorithms_spark.operators.imagehash import (
        video_frame_dhashes,
    )
    from efficient_graph_algorithms_spark.operators.multimodal import encode_y4m

    STRIPE = 72340172838076673  # 0x0101010101010101
    ms = [1, 4, 7, 2]
    media = spark.createDataFrame(
        [(5, bytearray(encode_y4m(_vid_frames(ms)))),
         (6, bytearray(b"junk"))],
        "media_id long, payload binary",
    )
    got = {
        (r["media_id"], r["frame_idx"]): r["dhash"]
        for r in video_frame_dhashes(media, every_n=2).collect()
    }
    # sampled frames 0 and 2: one bright->dark boundary at cell m-1
    assert got == {(5, 0): (1 << 0) * STRIPE, (5, 2): (1 << 6) * STRIPE}


def test_video_near_dups_shared_frames_and_hot_cap(spark):
    from efficient_graph_algorithms_spark.operators.imagehash import (
        video_near_dups,
    )
    from efficient_graph_algorithms_spark.operators.multimodal import encode_y4m

    flat = 0  # all-dark frame: hashes to 0, planted in EVERY video
    vids = {
        0: [1, 2, 3, flat],
        1: [1, 2, 5, flat],   # shares gradients 1,2 with video 0
        2: [6, 7, 5, flat],   # shares only gradient 5 with video 1
        3: [4, 4, 4, flat],
    }
    media = spark.createDataFrame(
        [(i, bytearray(encode_y4m(_vid_frames(ms)))) for i, ms in vids.items()],
        "media_id long, payload binary",
    )
    got = {
        (r["a"], r["b"]): r["shared"]
        for r in video_near_dups(media, every_n=1, min_shared=2, hot_cap=3).collect()
    }
    # the flat frame appears in all 4 videos > hot_cap=3 -> dropped, so
    # only (0,1) clears min_shared=2 via the two shared gradients
    assert got == {(0, 1): 2}


def test_image_near_dups_hot_band_cap(spark):
    """r6 skew guard: a planted flat-image corpus (every flat image
    hashes to the constant 0, so ALL its bands are hot) must not pair
    quadratically once the band group exceeds band_cap, while distinct
    near-dup pairs outside the hot bands survive."""
    base = _img(7)
    rows = [(0, base), (1, np.clip(base + 0.05, 0, 1))]  # a real near-dup pair
    n_flat = 6
    flat = np.zeros((32, 36, 3))
    rows += [(10 + i, flat) for i in range(n_flat)]  # all dhash to 0
    media = spark.createDataFrame(
        [(i, "image", bytearray(encode_bmp24(a))) for i, a in rows],
        "media_id long, kind string, payload binary",
    )
    # cap below the flat-group size: every band of the flat hash is hot
    # and dropped -> zero flat-flat pairs; the gradient pair survives
    capped = {
        (r["a"], r["b"])
        for r in image_near_dups(media, max_hamming=10, band_cap=n_flat - 1).collect()
    }
    assert capped == {(0, 1)}
    # cap at the group size (not hot): the exact join reappears —
    # all C(6,2) flat pairs at hamming 0 plus the gradient pair
    uncapped = {
        (r["a"], r["b"])
        for r in image_near_dups(media, max_hamming=10, band_cap=n_flat).collect()
    }
    flat_ids = [10 + i for i in range(n_flat)]
    want = {(a, b) for a in flat_ids for b in flat_ids if a < b} | {(0, 1)}
    assert uncapped == want
