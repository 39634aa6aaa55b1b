"""The engine's one core physical primitive.

The reference's single abstract method — ``integrate_graph_field``
(``reference src/ega/algorithms/gf_integrator.py:35-37``), a kernel
matvec ``i(v) = Σ_w K(w,v)·F(w)`` — becomes one declarative plan:

    edges ⋈ field (on src) → groupBy(dst) → sum(weight * value)

Catalyst picks the physical strategy: broadcast-hash join while the
field fits (AQE demotes when it stops fitting), sort-merge otherwise;
the aggregate gets a map-side partial combine for free. One shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def integrate(
    edges: DataFrame,
    field: DataFrame,
    weight_col: str | None = None,
    value_col: str = "value",
) -> DataFrame:
    """Gather-scatter: out(dst) = Σ_{(src,dst)∈E} w(src,dst)·field(src).

    edges: (src, dst[, weight]); field: (id, <value_col>).
    Returns (id, <value_col>) — reusable as the next iteration's field.
    """
    w = F.col(weight_col) if weight_col else F.lit(1.0)
    return (
        edges.join(field, edges["src"] == field["id"], "inner")
        .groupBy(edges["dst"].alias("id"))
        .agg(F.sum(w * F.col(value_col)).alias(value_col))
    )


def integrate_masked_ratio(
    edges: DataFrame,
    field: DataFrame,
    known_ids: DataFrame,
    value_col: str = "value",
) -> DataFrame:
    """Kernel-regression interpolation: integrate the field with unknown
    vertices zeroed, divide by the integrated indicator of known
    vertices (``reference src/ega/util/interpolator.py:21-32`` +
    normalized ratio ``reference scripts/experiments/vertex_normal_prediction.py:204-205``).
    """
    marked = field.join(known_ids.select(F.col("id").alias("kid")), field["id"] == F.col("kid"), "left").select(
        field["id"],
        F.when(F.col("kid").isNotNull(), F.col(value_col)).otherwise(F.lit(0.0)).alias(value_col),
        F.when(F.col("kid").isNotNull(), F.lit(1.0)).otherwise(F.lit(0.0)).alias("ind"),
    )
    num = integrate(edges, marked.select("id", value_col), value_col=value_col)
    den = integrate(edges, marked.select("id", F.col("ind").alias(value_col)), value_col=value_col)
    return (
        num.withColumnRenamed(value_col, "num")
        .join(den.withColumnRenamed(value_col, "den"), "id")
        .select("id", (F.col("num") / F.when(F.col("den") > 0, F.col("den"))).alias(value_col))
    )
