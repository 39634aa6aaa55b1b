"""Pluggable f_fun kernel registry.

The reference parameterizes every graph-field integrator by a scalar
kernel ``f_fun`` applied to distances (``reference
src/ega/algorithms/gf_integrator.py``; exp kernels in
``graph_kernels.py``). Here a kernel is a named factory returning a
Column→Column function, so operators (tree GFI, DSD, interpolation
weighting) accept any registered kernel instead of hard-coding one.

Kernels are pure JVM column expressions — whole-stage codegen, no
Python in the hot path. ``exp_literal`` additionally supports
pre-evaluated Python-side values for the (few) driver-contract queries
that need bit-identical parity with a SQL oracle across libm
implementations.
"""

from __future__ import annotations

import math
from collections.abc import Callable

from pyspark.sql import Column
from pyspark.sql import functions as F

FFun = Callable[[Column], Column]


def exp_kernel(a: float) -> FFun:
    """f(x) = exp(a·x) — the kernel under which tree-GFI is exact."""
    return lambda x: F.exp(F.lit(a) * x)


def gaussian_kernel(sigma: float) -> FFun:
    """f(x) = exp(-x²/(2σ²))."""
    return lambda x: F.exp(-(x * x) / F.lit(2.0 * sigma * sigma))


def inverse_poly_kernel(c: float = 1.0, p: float = 1.0) -> FFun:
    """f(x) = 1/(c + x)^p."""
    return lambda x: F.lit(1.0) / F.pow(F.lit(c) + x, F.lit(p))


def identity_kernel() -> FFun:
    return lambda x: x


def exp_literal(a: float, values: list[float]) -> FFun:
    """exp(a·x) evaluated in PYTHON for a known finite set of x values,
    injected as a when-chain of exact double literals. Use when a SQL
    oracle must reproduce the kernel bit-identically (java.lang.Math.exp
    and libm exp may differ in the last ulp)."""
    pairs = [(v, math.exp(a * v)) for v in sorted(set(values))]

    def f(x: Column) -> Column:
        expr = F.lit(None).cast("double")
        for v, fv in reversed(pairs):
            expr = F.when(x == F.lit(v), F.lit(fv)).otherwise(expr)
        return expr

    return f


FFUN_REGISTRY: dict[str, Callable[..., FFun]] = {
    "exp": exp_kernel,
    "gaussian": gaussian_kernel,
    "inverse_poly": inverse_poly_kernel,
    "identity": identity_kernel,
}
