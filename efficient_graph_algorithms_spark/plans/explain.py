"""Opt-in physical-plan capture for optimization evidence.

Set ``EGA_PLAN_DUMP_DIR`` to a directory and iterative operators dump
their loop-body ``explain("formatted")`` once (first iteration) under
``<dir>/<name>.txt``; non-loop call sites can use :func:`dump_plan`
directly. Zero cost when the env var is unset — this is measurement
instrumentation only, never on a query path.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame


def _explain_str(df: DataFrame, mode: str = "formatted") -> str:
    jqe = df._jdf.queryExecution()  # noqa: SLF001 — mirrors DataFrame.explain
    return df.sparkSession._jvm.PythonSQLUtils.explainString(jqe, mode)  # noqa: SLF001


def dump_plan(df: DataFrame, name: str) -> None:
    """Write df's formatted physical plan to $EGA_PLAN_DUMP_DIR/<name>.txt
    (no-op when the env var is unset; never raises on capture failure)."""
    out_dir = os.environ.get("EGA_PLAN_DUMP_DIR")
    if not out_dir:
        return
    name = name + os.environ.get("EGA_PLAN_DUMP_SUFFIX", "")
    try:
        os.makedirs(out_dir, exist_ok=True)
        with open(os.path.join(out_dir, f"{name}.txt"), "w") as f:
            f.write(_explain_str(df))
    except Exception:  # noqa: BLE001 — diagnostics must never kill a query
        pass
