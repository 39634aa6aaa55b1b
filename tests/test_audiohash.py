"""Audio fingerprint: schedule closed forms, quantization robustness,
Spark plumbing, banded join vs brute force."""

from __future__ import annotations

import numpy as np
import pytest

from efficient_graph_algorithms_spark.operators.audiohash import (
    AFP_BANDS,
    AFP_FRAME,
    AFP_FRAMES,
    afp64,
    audio_afps,
    audio_near_dups,
    band_energies,
)
from efficient_graph_algorithms_spark.operators.multimodal import encode_wav_pcm16

PER = (AFP_FRAME // 2) // AFP_BANDS  # usable bins per band


def band_center_bin(b):
    return 1 + b * PER + PER // 2


def chirp(schedule, amp=0.5):
    """Per-frame sine at the center bin of band schedule[t] — integer
    cycles per frame, so energy lands in exactly one band."""
    i = np.arange(AFP_FRAME)
    return np.concatenate(
        [amp * np.sin(2 * np.pi * band_center_bin(b) * i / AFP_FRAME) for b in schedule]
    )


def expected_bits(schedule):
    """Closed form from the SCHEDULE (independent of the FFT path):
    bit(t,b) = 1 iff [b==s_t] - [b+1==s_t] - [b==s_{t-1}] + [b+1==s_{t-1}] >= 1."""
    out = 0
    for t in range(1, AFP_FRAMES):
        st, sp = schedule[t], schedule[t - 1]
        for b in range(AFP_BANDS - 1):
            v = (b == st) - (b + 1 == st) - (b == sp) + (b + 1 == sp)
            if v >= 1:
                out |= 1 << ((t - 1) * (AFP_BANDS - 1) + b)
    if out >= 1 << 63:
        out -= 1 << 64
    return out


def test_band_energies_land_in_scheduled_band():
    sched = [(2 + 3 * t) % AFP_BANDS for t in range(AFP_FRAMES)]
    e = band_energies(chirp(sched))
    assert e.shape == (AFP_FRAMES, AFP_BANDS)
    assert [int(r.argmax()) for r in e] == sched
    # scheduled band carries essentially all the energy
    assert all(e[t, sched[t]] / e[t].sum() > 0.999 for t in range(AFP_FRAMES))


@pytest.mark.parametrize("seed", [0, 1, 5])
def test_fingerprint_matches_schedule_closed_form(seed):
    sched = [(seed + 3 * t) % AFP_BANDS for t in range(AFP_FRAMES)]
    assert afp64(chirp(sched)) == expected_bits(sched)


def test_stationary_tone_hashes_to_zero():
    # constant spectrum -> every time-delta is below the noise floor
    x = chirp([4] * AFP_FRAMES)
    assert afp64(x) == 0


def test_survives_pcm16_roundtrip():
    from efficient_graph_algorithms_spark.operators.multimodal import decode_wav

    sched = [(1 + 3 * t) % AFP_BANDS for t in range(AFP_FRAMES)]
    x = chirp(sched)
    _r, _c, back = decode_wav(encode_wav_pcm16(x, 16000))
    assert afp64(back[:, 0]) == afp64(x) == expected_bits(sched)


def test_too_short_rejected():
    with pytest.raises(ValueError, match="samples"):
        afp64(np.zeros(AFP_FRAME * 2))


def test_spark_hashes_and_pairs(spark):
    scheds = {
        0: [(0 + 3 * t) % 9 for t in range(AFP_FRAMES)],
        1: [(0 + 3 * t) % 9 for t in range(AFP_FRAMES)],  # dup of 0
        2: [(4 + 3 * t) % 9 for t in range(AFP_FRAMES)],
        3: [(7 + 5 * t) % 9 for t in range(AFP_FRAMES)],
    }
    rows = [
        (i, bytearray(encode_wav_pcm16(chirp(s), 16000))) for i, s in scheds.items()
    ]
    rows.append((99, bytearray(b"RIFFjunk")))  # dropped
    media = spark.createDataFrame(rows, "media_id long, payload binary")
    got = {r["media_id"]: r["afp"] for r in audio_afps(media).collect()}
    assert got == {i: expected_bits(s) for i, s in scheds.items()}
    pairs = {
        (r["a"], r["b"]): r["hamming"]
        for r in audio_near_dups(media, max_hamming=4).collect()
    }
    assert pairs == {(0, 1): 0}  # only the planted duplicate
