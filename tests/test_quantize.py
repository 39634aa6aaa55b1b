"""Int8 scalar quantization vs a NumPy mirror."""

from __future__ import annotations

import numpy as np

from efficient_graph_algorithms_spark.operators.quantize import (
    LEVELS,
    collect_scales,
    encode_int8,
    fit_absmax_scales,
    quantization_report,
)


def _emb(spark, n=30, d=8, seed=13, zero_dim=None):
    rng = np.random.default_rng(seed)
    x = rng.normal(size=(n, d)).astype(np.float32)
    if zero_dim is not None:
        x[:, zero_dim] = 0.0
    rows = [(i, [float(v) for v in x[i]]) for i in range(n)]
    return (
        spark.createDataFrame(rows, "vec_id long, embedding array<float>"),
        x.astype(np.float64),
    )


def _np_round_half_away(y):
    return np.sign(y) * np.floor(np.abs(y) + 0.5)


def test_scales_and_codes_match_numpy(spark):
    emb, x = _emb(spark)
    scales = collect_scales(fit_absmax_scales(emb))
    assert np.allclose(scales, np.abs(x).max(axis=0), atol=0, rtol=0)
    codes = {
        r["vec_id"]: r["codes"] for r in encode_int8(emb, scales).collect()
    }
    s = np.array(scales)
    want = _np_round_half_away(x / s * LEVELS).astype(int)
    for i in range(x.shape[0]):
        assert codes[i] == list(want[i]), i
        assert max(abs(c) for c in codes[i]) <= LEVELS


def test_zero_scale_dimension_encodes_zero(spark):
    emb, x = _emb(spark, zero_dim=3)
    scales = collect_scales(fit_absmax_scales(emb))
    assert scales[3] == 0.0
    codes = {r["vec_id"]: r["codes"] for r in encode_int8(emb, scales).collect()}
    assert all(c[3] == 0 for c in codes.values())


def test_report_matches_numpy(spark):
    emb, x = _emb(spark, n=20, d=6, seed=5)
    rep = {
        r["vec_id"]: (r["code_sum"], r["mse"])
        for r in quantization_report(emb).collect()
    }
    s = np.abs(x).max(axis=0)
    codes = _np_round_half_away(x / s * LEVELS)
    recon = codes * s / LEVELS
    mse = ((x - recon) ** 2).mean(axis=1)
    for i in range(x.shape[0]):
        assert rep[i][0] == int(codes[i].sum()), i
        assert abs(rep[i][1] - mse[i]) < 1e-6, i
    # int8 absmax on gaussian data: relative error well under 1%
    assert max(m for _, m in rep.values()) < (np.abs(x).max() / LEVELS) ** 2 * 3
