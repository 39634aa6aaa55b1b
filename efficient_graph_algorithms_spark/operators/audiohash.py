"""Audio fingerprinting (band-energy hash) and audio near-dup pairs.

The Haitsma–Kalker fingerprint (2002, "A Highly Robust Audio
Fingerprinting System" — the public Philips scheme behind most audio
dedup/ID stacks): frame the signal, take per-frame FFT band energies,
and emit one bit per (frame transition, adjacent band pair) from the
sign of the time-difference of the band-energy difference —
`bit(t,b) = 1 iff (E[t,b]−E[t,b+1]) − (E[t−1,b]−E[t−1,b+1]) > τ`.
Robust to re-encoding, level changes, and mild noise — the audio
counterpart of SimHash (text) and dHash (images), completing the
engine's cross-modal near-dup family.

This clip-level face packs 8 band-pair bits × 8 frame transitions
into ONE 64-bit fingerprint (9 bands over bins 1..N/2, 9 frames of
N=2048 mono samples), so pairs reuse the pigeonhole banded Hamming
join (`operators/dedup.py::hamming_pairs`) unchanged. τ is a relative
noise floor (1e-4 of the frame's total energy): the classic strict
`> 0` flips bits at random in bands holding only numerical/
quantization noise (≈1e-9 of frame energy for 16-bit PCM) while real
band transitions move O(1) of the frame energy — documented deviation,
same spirit.

Plan shape: one mapInPandas over (media_id, payload) — payloads stay
on the executors; NumPy rfft per frame, O(frames · N log N) per clip.

No reference counterpart; engine extension in the §2.12 family.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
from pyspark.sql import DataFrame

from efficient_graph_algorithms_spark.operators.dedup import hamming_pairs
from efficient_graph_algorithms_spark.operators.multimodal import (
    _is_wav,
    decode_wav,
)

AFP_FRAME = 2048
AFP_BANDS = 9  # 9 bands -> 8 adjacent pairs -> 8 bits per transition
AFP_FRAMES = 9  # 9 frames -> 8 transitions -> 64 bits total
AFP_TAU_REL = 1e-4  # noise floor as a fraction of frame energy


def band_energies(samples: np.ndarray, frame: int = AFP_FRAME,
                  bands: int = AFP_BANDS) -> np.ndarray:
    """(n_frames, bands) spectral energies: non-overlapping frames,
    |rfft|² summed over ``bands`` equal contiguous bin ranges of bins
    1..frame/2 (DC excluded). Mono input (average channels first)."""
    x = np.asarray(samples, dtype=np.float64)
    if x.ndim == 2:
        x = x.mean(axis=1)
    n = (len(x) // frame) * frame
    if n == 0:
        return np.zeros((0, bands))
    spec = np.abs(np.fft.rfft(x[:n].reshape(-1, frame), axis=1)) ** 2
    usable = spec[:, 1 : frame // 2 + 1]  # drop DC
    per = usable.shape[1] // bands
    return np.add.reduceat(usable[:, : per * bands],
                           np.arange(0, per * bands, per), axis=1)


def afp64(samples: np.ndarray, frame: int = AFP_FRAME) -> int:
    """64-bit clip fingerprint from the first AFP_FRAMES frames.
    Requires ≥ AFP_FRAMES·frame mono samples (ValueError otherwise).
    Bit order: transition-major, band-pair-minor, LSB first."""
    e = band_energies(samples, frame, AFP_BANDS)
    if e.shape[0] < AFP_FRAMES:
        raise ValueError(
            f"need >= {AFP_FRAMES * frame} samples for the clip fingerprint"
        )
    e = e[:AFP_FRAMES]
    d = e[:, :-1] - e[:, 1:]  # (frames, bands-1) adjacent-band diffs
    tau = AFP_TAU_REL * np.maximum(e.sum(axis=1)[1:, None], 1e-300)
    bits = (d[1:] - d[:-1]) > tau  # (transitions, bands-1)
    out = 0
    for t in range(bits.shape[0]):
        for b in range(bits.shape[1]):
            if bits[t, b]:
                out |= 1 << (t * bits.shape[1] + b)
    if out >= 1 << 63:
        out -= 1 << 64
    return out


def audio_afps(media: DataFrame) -> DataFrame:
    """(media_id, afp) for every row whose payload parses as WAV with
    enough samples; other payloads are dropped (similarity signal, not
    a validation pass — the imagehash.py contract)."""
    import pandas as pd

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for b in batches:
            ids, hs = [], []
            for mid, payload in zip(b["media_id"], b["payload"]):
                data = bytes(payload)
                try:
                    if not _is_wav(data):
                        continue
                    _rate, _n_ch, samples = decode_wav(data)
                    h = afp64(samples)
                # NotImplementedError too: recognized-but-unsupported
                # variants (progressive JPEG, 24-bit WAV, exotic Y4M
                # colourspaces) must DROP, not kill the job — the
                # permissive contract, matching decode_media's list
                except (ValueError, NotImplementedError):
                    continue
                ids.append(mid)
                hs.append(h)
            yield pd.DataFrame({"media_id": ids, "afp": hs})

    return media.select("media_id", "payload").mapInPandas(
        run, "media_id long, afp long"
    )


def audio_near_dups(
    media: DataFrame, max_hamming: int = 8, band_cap: int = 1024
) -> DataFrame:
    """(a, b, hamming) audio pairs with fingerprint Hamming distance ≤
    max_hamming — the banded pigeonhole join, never all-pairs.

    band_cap (r6): hot fingerprint bands are dropped before pairing —
    silent/constant clips all fingerprint to the same value, the audio
    analogue of the flat-image hot key (see image_near_dups). Pass None
    for the exact cap-free join at test scale."""
    fp = audio_afps(media)
    return hamming_pairs(
        fp, "afp", max_hamming, bits=64, id_col="media_id", band_cap=band_cap
    )
