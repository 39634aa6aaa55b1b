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
    points: DataFrame,
    eps: float,
    id_col: str = "id",
    vec_col: str = "vec",
    method: str = "grid",
    dim: int | None = None,
    n_proj: int = 2,
) -> DataFrame:
    """points(id, vec array<double>) → edges (src, dst, weight) with
    weight = Euclidean distance, for all pairs with 0 < dist <= eps.
    Symmetric (both directions), no self-loops.

    method="grid" (default): candidates from eps-width grid cells over
    n_proj unit projections with full ±1 probing — an equi-join plan
    (no CartesianProduct) whose candidate set provably contains every
    within-eps pair, so results are EXACT and identical to brute force
    (operators/ann.py). dim = vector length (inferred when None).
    method="brute": the all-pairs theta join (reference-shaped small-N
    path, kept for plan comparison)."""
    dist = F.sqrt(
        F.aggregate(
            F.zip_with(F.col("va"), F.col("vb"), lambda x, y: (x - y) * (x - y)),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )
    if method == "grid":
        from efficient_graph_algorithms_spark.operators.ann import grid_candidate_pairs

        if dim is None:
            dim = len(points.select(vec_col).first()[0])
        cand = grid_candidate_pairs(
            points, eps, n_proj=n_proj, dim=dim, id_col=id_col, vec_col=vec_col
        ).select(F.col("a").alias("src"), "va", F.col("b").alias("dst"), "vb")
    elif method == "brute":
        a = points.select(F.col(id_col).alias("src"), F.col(vec_col).alias("va"))
        b = points.select(F.col(id_col).alias("dst"), F.col(vec_col).alias("vb"))
        cand = a.join(b, F.col("src") != F.col("dst"))
    else:
        raise ValueError(f"unknown method {method!r}")
    return cand.select("src", "dst", dist.alias("weight")).where(F.col("weight") <= eps)


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

    Greedy by descending score with (src, dst) tie-break. Each round
    matches every *locally dominant* pair: a pair that is simultaneously
    the best remaining pair for BOTH its src and its dst (rank-1 under
    the src window AND the dst window, each computed over ALL remaining
    pairs). Losers retry next round against the shrunken pool. For a
    total score order this is provably equal to the sequential greedy
    scan: the globally best remaining pair is always locally dominant,
    and a locally dominant pair can never be displaced by any later
    selection.
    """
    remaining = scores
    matched = None
    for _ in range(max_rounds):
        if remaining.isEmpty():
            break
        w_src = Window.partitionBy("src").orderBy(
            F.desc("score"), F.asc("dst"), F.asc("src")
        )
        w_dst = Window.partitionBy("dst").orderBy(
            F.desc("score"), F.asc("src"), F.asc("dst")
        )
        winners = (
            remaining.withColumn("rn_src", F.row_number().over(w_src))
            .withColumn("rn_dst", F.row_number().over(w_dst))
            .where((F.col("rn_src") == 1) & (F.col("rn_dst") == 1))
            .drop("rn_src", "rn_dst")
            .localCheckpoint(eager=True)
        )
        matched = winners if matched is None else matched.unionByName(winners)
        remaining = (
            remaining.join(winners.select("src"), "src", "left_anti")
            .join(winners.select("dst"), "dst", "left_anti")
            .localCheckpoint(eager=True)
        )
    return matched if matched is not None else scores.limit(0)
