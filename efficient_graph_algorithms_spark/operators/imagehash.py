"""Perceptual image hashing (dHash) and image near-duplicate pairs.

The difference hash (Krawetz 2013, "Kind of Like That" — the public
pHash-family baseline): downscale the luminance plane to a 9×8 grid
of cell means, emit one bit per horizontally adjacent cell pair
(left > right), 64 bits total. Robust to re-encoding, scaling, and
mild brightness shifts — the standard first pass for image dedup in
web-scale corpora (same role MinHash/SimHash play for text).

Composes the engine's REAL pure-NumPy decoders (BMP/PNG/JPEG,
operators/multimodal.py) with the text family's pigeonhole banded
Hamming join (operators/dedup.py::hamming_pairs) — no new join
machinery, no all-pairs anywhere.

Determinism: cell boundaries are the integer grid floor(i·W/9) /
floor(j·H/8); luma is the Rec.709 weighting `_image_features` already
uses; bits pack row-major LSB-first. Same bytes → same hash on any
partitioning.

Plan shape: one mapInPandas over (media_id, kind, payload) — payloads
never leave the executors — then the banded fingerprint equi-join.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from efficient_graph_algorithms_spark.operators.dedup import hamming_pairs
from efficient_graph_algorithms_spark.operators.multimodal import (
    _is_bmp,
    _is_jpeg,
    _is_png,
    decode_bmp,
    decode_jpeg,
    decode_png,
)

DHASH_GRID = (9, 8)  # cols x rows of cell means -> 8x8 = 64 difference bits


def dhash64(img: np.ndarray) -> int:
    """64-bit difference hash of an image array (H×W grayscale or
    H×W×3 RGB, any real dtype). Requires W ≥ 9 and H ≥ 8 (every grid
    cell must be non-empty)."""
    if img.ndim == 3:
        lum = (
            0.2126 * img[:, :, 0] + 0.7152 * img[:, :, 1] + 0.0722 * img[:, :, 2]
        )
    else:
        lum = np.asarray(img, dtype=np.float64)
    h, w = lum.shape
    cols, rows = DHASH_GRID
    if w < cols or h < rows:
        raise ValueError(f"image {w}x{h} smaller than the {cols}x{rows} dhash grid")
    xs = [(i * w) // cols for i in range(cols + 1)]
    ys = [(j * h) // rows for j in range(rows + 1)]
    cells = np.empty((rows, cols), dtype=np.float64)
    for j in range(rows):
        for i in range(cols):
            cells[j, i] = lum[ys[j] : ys[j + 1], xs[i] : xs[i + 1]].mean()
    out = 0
    bit = 0
    for j in range(rows):
        for i in range(cols - 1):
            if cells[j, i] > cells[j, i + 1]:
                out |= 1 << bit
            bit += 1
    # 64 bits in a signed int64: wrap the top bit
    if out >= 1 << 63:
        out -= 1 << 64
    return out


def _decode_image(payload: bytes) -> np.ndarray | None:
    if _is_bmp(payload):
        return decode_bmp(payload)[2]
    if _is_png(payload):
        return decode_png(payload)[2]
    if _is_jpeg(payload):
        return decode_jpeg(payload)[2]
    return None


def image_dhashes(media: DataFrame) -> DataFrame:
    """(media_id, dhash) for every row whose payload parses as a real
    image (BMP/PNG/JPEG). Non-image / unrecognized / undersized
    payloads are dropped (this is a similarity signal, not a
    validation pass — ``extract_media_features`` is the strict face)."""

    import pandas as pd

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for b in batches:
            ids, hs = [], []
            for mid, payload in zip(b["media_id"], b["payload"]):
                try:
                    img = _decode_image(bytes(payload))
                    if img is None:
                        continue
                    h = dhash64(img)
                # NotImplementedError too: recognized-but-unsupported
                # variants (progressive JPEG, 24-bit WAV, exotic Y4M
                # colourspaces) must DROP, not kill the job — the
                # permissive contract, matching decode_media's list
                except (ValueError, NotImplementedError):
                    continue
                ids.append(mid)
                hs.append(h)
            yield pd.DataFrame({"media_id": ids, "dhash": hs})

    return media.select("media_id", "payload").mapInPandas(
        run, "media_id long, dhash long"
    )


def image_near_dups(
    media: DataFrame, max_hamming: int = 6, band_cap: int = 1024
) -> DataFrame:
    """(a, b, hamming) image pairs with dHash Hamming distance ≤
    max_hamming — the banded pigeonhole join, never all-pairs.

    band_cap (r6): hot fingerprint bands are dropped before pairing —
    flat/solid images (spacers, backgrounds) all hash to a constant, so
    one band group is corpus-sized at web scale and would pair O(n²);
    the same rationale as the video face's hot_cap. Pass None for the
    exact cap-free join at test scale."""
    fp = image_dhashes(media)
    return hamming_pairs(
        fp, "dhash", max_hamming, bits=64, id_col="media_id", band_cap=band_cap
    )


# --- the video face: per-sampled-frame dHash + shared-frame pairing --------


def video_frame_dhashes(media: DataFrame, every_n: int = 30) -> DataFrame:
    """(media_id, frame_idx, dhash) — dHash of every ``every_n``-th
    luma frame of the REAL Y4M decode (frame 0 always included), the
    frame-fingerprint table behind video near-dup. Non-Y4M / undersized
    payloads are dropped (the image_dhashes contract). Same posture as
    sample_video_frames: mapInPandas, payloads stay on executors,
    output rows are tiny scalars."""
    import pandas as pd

    from efficient_graph_algorithms_spark.operators.multimodal import (
        _is_y4m,
        decode_y4m,
    )

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for b in batches:
            rows = []
            for mid, payload in zip(b["media_id"], b["payload"]):
                data = bytes(payload)
                try:
                    if not _is_y4m(data):
                        continue
                    _fps, frames = decode_y4m(data)
                    for i in range(0, len(frames), every_n):
                        rows.append((mid, i, dhash64(frames[i])))
                # NotImplementedError too: recognized-but-unsupported
                # variants (progressive JPEG, 24-bit WAV, exotic Y4M
                # colourspaces) must DROP, not kill the job — the
                # permissive contract, matching decode_media's list
                except (ValueError, NotImplementedError):
                    continue
            yield pd.DataFrame(rows, columns=["media_id", "frame_idx", "dhash"])

    return media.select("media_id", "payload").mapInPandas(
        run, "media_id long, frame_idx long, dhash long"
    )


def video_near_dups(
    media: DataFrame,
    every_n: int = 30,
    min_shared: int = 2,
    hot_cap: int = 64,
) -> DataFrame:
    """(a, b, shared) video pairs sharing ≥ min_shared distinct sampled
    frame hashes — the inverted-index equi-join of the mirror-detection
    family (cocite.py): videos join on EXACT frame dhash (the hash
    already absorbs the near-duplication), hashes appearing in more
    than ``hot_cap`` videos are dropped before pairing (black/flat
    frames are the hot keys of video corpora; an uncapped hot hash
    would pair quadratically). Never all-pairs."""
    fp = video_frame_dhashes(media, every_n).select("media_id", "dhash").distinct()
    hot = (
        fp.groupBy("dhash")
        .count()
        .where(F.col("count") > hot_cap)
        .select("dhash")
    )
    cold = fp.join(hot, "dhash", "left_anti")
    a = cold.select(F.col("media_id").alias("a"), "dhash")
    b = cold.select(F.col("media_id").alias("b"), "dhash")
    return (
        a.join(b, "dhash")
        .where(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count("*").alias("shared"))
        .where(F.col("shared") >= min_shared)
    )
