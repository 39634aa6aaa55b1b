"""Graph-construction operators beyond html extraction.

- ``epsilon_nn_graph``: edge iff dist(x_i, x_j) <= eps — the
  reference's ε-NN construction (``reference
  scripts/experiments/vertex_normal_prediction.py:326`` ``cdist <
  epsilon``; DFGF assumes an ε-graph, ``reference
  src/ega/algorithms/graph_diffusion_gf_integrator.py:18-25``).
  A theta join (cross product + distance predicate) — the small-N
  test path, exactly as SURVEY §2.1 scopes it. The at-scale variant
  would bucket by RP-LSH first (operators/similarity.py).

- ``induced_subgraph``: row/col submatrix selection (``reference
  src/ega/algorithms/gromov_wasserstein_graphs.py:906-917``
  ``cost_s[indices,:][:,indices]``) — semi-join of edges against a
  vertex subset on BOTH endpoints.

- ``greedy_matching``: assign each target its best unmatched source by
  score, highest score first (``reference
  src/ega/algorithms/gromov_wasserstein_graphs.py:753-802``
  ``node_pair_assignment``) — iterative window-argmax + anti-join;
  matching is inherently sequential, so rounds are driver-looped
  (small-data operator, as in the reference).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def epsilon_nn_graph(
    points: DataFrame, eps: float, id_col: str = "id", vec_col: str = "vec"
) -> DataFrame:
    """points(id, vec array<double>) → edges (src, dst, weight) with
    weight = Euclidean distance, for all pairs with 0 < dist <= eps.
    Symmetric (both directions), no self-loops."""
    a = points.select(F.col(id_col).alias("src"), F.col(vec_col).alias("va"))
    b = points.select(F.col(id_col).alias("dst"), F.col(vec_col).alias("vb"))
    dist = F.sqrt(
        F.aggregate(
            F.zip_with(F.col("va"), F.col("vb"), lambda x, y: (x - y) * (x - y)),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )
    return (
        a.join(b, F.col("src") != F.col("dst"))
        .select("src", "dst", dist.alias("weight"))
        .where(F.col("weight") <= eps)
    )


def induced_subgraph(edges: DataFrame, vertex_subset: DataFrame) -> DataFrame:
    """edges restricted to pairs with BOTH endpoints in vertex_subset(id)."""
    vs = vertex_subset.select("id")
    return (
        edges.join(vs.withColumnRenamed("id", "src"), "src", "left_semi")
        .join(vs.withColumnRenamed("id", "dst"), "dst", "left_semi")
        .select("src", "dst")
    )


def greedy_matching(
    scores: DataFrame,
    max_rounds: int = 100,
) -> DataFrame:
    """scores(src, dst, score) → (src, dst, score) one-to-one matching.

    Greedy by descending score with (src, dst) tie-break — each round
    takes the best remaining pair per src that doesn't collide on dst;
    collisions resolve to the globally better pair and losers retry
    next round. Equivalent to the reference's sequential greedy scan
    because every selection round is a deterministic argmax.
    """
    remaining = scores
    matched = None
    for _ in range(max_rounds):
        if remaining.isEmpty():
            break
        w_src = Window.partitionBy("src").orderBy(F.desc("score"), F.asc("dst"))
        best_per_src = remaining.withColumn("rn", F.row_number().over(w_src)).where(
            F.col("rn") == 1
        ).drop("rn")
        w_dst = Window.partitionBy("dst").orderBy(F.desc("score"), F.asc("src"))
        winners = (
            best_per_src.withColumn("rn", F.row_number().over(w_dst))
            .where(F.col("rn") == 1)
            .drop("rn")
            .localCheckpoint(eager=True)
        )
        matched = winners if matched is None else matched.unionByName(winners)
        remaining = (
            remaining.join(winners.select("src"), "src", "left_anti")
            .join(winners.select("dst"), "dst", "left_anti")
            .localCheckpoint(eager=True)
        )
    return matched if matched is not None else scores.limit(0)
