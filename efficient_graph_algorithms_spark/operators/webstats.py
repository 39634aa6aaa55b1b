"""Whole-graph structural statistics of the link graph.

The three numbers every web-crawl characterization reports (Broder et
al. 2000, Leskovec's SNAP datasets, Common Crawl's own graph releases
— all public):

* reciprocity — fraction of directed edges whose reverse also exists
  (link exchanges / navigation bars vs one-way citations),
* degree assortativity — Pearson correlation of endpoint degrees over
  the undirected edge list (the web is disassortative: hubs link to
  leaves),
* global clustering coefficient — 3·triangles / wedges (how much of
  the neighborhood structure closes into triangles).

No reference counterpart (``reference src/ega`` has no whole-graph
descriptive statistics); engine extension in the §2.9-additions
family. All three are single-pass aggregates over JVM-side column
expressions — no UDFs, no iteration:

* reciprocity: one left-semi self-join + two counts,
* assortativity: degree table joined onto the symmetrized edge list
  (each undirected edge contributes both orientations — the standard
  symmetric estimator), then one corr() aggregate,
* clustering: the degree-ordered wedge-join triangle count from
  operators/triangles.py (oriented out-degree O(sqrt |E|)) over the
  wedge total sum(d·(d-1)/2).

Scale shape: two aggregate shuffles and the triangle wedge join —
each individually the plan the dedicated operators already use; the
result is a single row, so nothing accumulates on the driver.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from efficient_graph_algorithms_spark.operators.triangles import (
    simple_undirected,
    triangle_count,
)


def web_stats(
    spark: SparkSession,
    edges: DataFrame,
    decimals: int = 9,
) -> tuple[DataFrame, dict[str, Any]]:
    """Returns (stats, info): ``stats`` is ONE row
    (reciprocity, assortativity, clustering) rounded to ``decimals``
    (cross-engine float agreement); info carries the integer raw
    ingredients (n_edges_directed, n_reciprocal, triangles, wedges).

    Conventions: self-loops dropped; reciprocity over the DISTINCT
    directed edge set; assortativity = sample Pearson corr of
    (deg(u), deg(v)) with every undirected edge contributing both
    orientations; clustering = 3*triangles / wedges, wedges =
    sum over vertices of d*(d-1)/2 on the undirected simple graph.
    NULL assortativity (degree-regular graph) and NULL clustering
    (no wedges) are returned as-is, not coerced to 0.
    """
    e = edges.select("src", "dst").where(F.col("src") != F.col("dst")).distinct()
    e = e.persist()
    n_dir = e.count()

    rev = e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    n_recip = e.join(rev, ["src", "dst"], "left_semi").count()

    und = simple_undirected(e)
    deg = (
        und.select(F.col("lo").alias("id"))
        .unionByName(und.select(F.col("hi").alias("id")))
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    sym = und.select(F.col("lo").alias("a"), F.col("hi").alias("b")).unionByName(
        und.select(F.col("hi").alias("a"), F.col("lo").alias("b"))
    )
    pairs = (
        sym.join(deg.withColumnRenamed("id", "a").withColumnRenamed("deg", "da"), "a")
        .join(deg.withColumnRenamed("id", "b").withColumnRenamed("deg", "db"), "b")
    )
    # Pearson r spelled as try_divide(covar, sd*sd): identical to corr()
    # (the n-1 factors cancel) but NULL instead of an ANSI-mode
    # DIVIDE_BY_ZERO on degree-regular graphs (zero variance)
    assort_row = pairs.selectExpr(
        "CAST(da AS DOUBLE) AS da", "CAST(db AS DOUBLE) AS db"
    ).agg(
        F.expr(
            "try_divide(covar_samp(da, db), "
            "stddev_samp(da) * stddev_samp(db))"
        ).alias("r")
    ).first()

    tri = int(triangle_count(e).first()["triangles"])
    # exact LONG arithmetic end-to-end (`div`, not double `/`): past 2^53
    # total wedges the double sum rounds and the "integer" wedge count
    # silently drifts; deg*(deg-1) is always even so div 2 per row is exact
    wedge_row = deg.agg(
        F.sum(F.expr("deg * (deg - 1L) div 2")).alias("w")
    ).first()
    wedges = int(wedge_row["w"] or 0)
    e.unpersist()

    reciprocity = n_recip / n_dir if n_dir else None
    assort = assort_row["r"]
    clustering = 3.0 * tri / wedges if wedges else None

    def _r(x):
        return None if x is None else round(float(x), decimals)

    stats = spark.createDataFrame(
        [(_r(reciprocity), _r(assort), _r(clustering))],
        "reciprocity double, assortativity double, clustering double",
    )
    info = {
        "n_edges_directed": n_dir,
        "n_reciprocal": n_recip,
        "triangles": tri,
        "wedges": wedges,
    }
    return stats, info


def degree_powerlaw(
    edges: DataFrame, xmin: int = 2, decimals: int = 6
) -> DataFrame:
    """Continuous-MLE power-law exponent of the undirected degree
    distribution (the Hill estimator; Clauset–Shalizi–Newman 2009's
    alpha-hat) over the tail deg >= xmin:

        alpha = 1 + n_tail / sum over tail of ln(deg / xmin)

    — the number every web-crawl characterization reports next to the
    Broder bowtie. Returns ONE row (xmin, n_tail, alpha), alpha NULL
    when the tail is empty or degree-constant at xmin (zero log-sum).
    Plan: the degree aggregate plus one single-row aggregate — two
    map-side-combining shuffles, nothing driver-side.
    """
    if xmin < 1:
        raise ValueError(f"xmin must be >= 1, got {xmin}")
    und = simple_undirected(edges)
    deg = (
        und.select(F.col("lo").alias("id"))
        .unionByName(und.select(F.col("hi").alias("id")))
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    tail = deg.where(F.col("deg") >= xmin)
    return tail.agg(
        F.lit(xmin).cast("long").alias("xmin"),
        F.count(F.lit(1)).alias("n_tail"),
        F.round(
            F.lit(1.0)
            + F.expr(
                f"try_divide(CAST(count(1) AS DOUBLE), "
                f"sum(ln(deg / CAST({xmin} AS DOUBLE))))"
            ),
            decimals,
        ).alias("alpha"),
    )
