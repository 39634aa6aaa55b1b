"""Driver contract for the spark-graft builder (PySpark target).

``queries()`` exposes one DataFrame query per implemented operator
family from SURVEY.md §2; ``oracle_sql()`` gives the exact DuckDB
equivalent (same column names, floats rounded identically on both
sides so the driver's order-insensitive value-hash matches).

Graph queries run on a deterministic edge table derived from
``lineitem`` (src = l_orderkey % V, dst = l_partkey % V) so Spark and
DuckDB construct byte-identical graphs with zero RNG.

The only query without an oracle entry is full-convergence PageRank
(data-dependent iteration count is not SQL-expressible) — it gets a
rows-only check here and exact verification in tests/ against the
NumPy oracle. Fixed-round iterative queries (3-step PageRank/PPR,
5-round LPA, 3-round greedy matching) unroll into CTE chains.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

GRAPH_V = 2000  # vertex-id space of the derived graph
PR_ALPHA = 0.85
PR_SQL_ITERS = 3
# Measured converged iteration count (tol=1e-6) on the fixed sf0.01
# derived graph — q_graph_pagerank_full asserts the operator lands here
# and its unrolled SQL oracle is built to exactly this depth. The
# boundary is comfortable on both sides (delta_7 = 1.95e-6, delta_8 =
# 3.05e-7 — each ~2-3x away from tol, far beyond float noise).
PR_FULL_ITERS = 8
WARM_PR_ITERS = 2  # unrolled warm-start steps in graph_pr_warm
LPA_SQL_ITERS = 5
MATCH_SQL_ROUNDS = 3
MINHASH_K = 16
LSH_BANDS = 4
SIMHASH_BITS = 60
SIMHASH_MAXHAM = 3
COS_THRESHOLD = 0.3  # embeddings are near-orthogonal; 0.3 ≈ p99 pairs


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# ---------------------------------------------------------------------------
# derived graph (identical construction in Spark and DuckDB)
# ---------------------------------------------------------------------------

def _graph_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.select(
            (F.col("l_orderkey") % GRAPH_V).cast("long").alias("src"),
            (F.col("l_partkey") % GRAPH_V).cast("long").alias("dst"),
        )
        .where(F.col("src") != F.col("dst"))
        .distinct()
    )


_E_SQL = (
    f"SELECT DISTINCT CAST(l_orderkey % {GRAPH_V} AS BIGINT) AS src, "
    f"CAST(l_partkey % {GRAPH_V} AS BIGINT) AS dst FROM lineitem "
    f"WHERE l_orderkey % {GRAPH_V} <> l_partkey % {GRAPH_V}"
)
_V_SQL = "SELECT src AS id FROM e UNION SELECT dst FROM e"
_UND_SQL = "SELECT DISTINCT least(src,dst) AS lo, greatest(src,dst) AS hi FROM e"


def _vertices(edges: DataFrame) -> DataFrame:
    return (
        edges.select(F.col("src").alias("id"))
        .unionByName(edges.select(F.col("dst").alias("id")))
        .distinct()
    )


# ---------------------------------------------------------------------------
# graph queries
# ---------------------------------------------------------------------------

def q_graph_degree_topk(spark, sf_dir):
    e = _graph_edges(spark, sf_dir)
    return (
        e.groupBy(F.col("dst").alias("id"))
        .agg(F.count("*").alias("in_degree"))
        .orderBy(F.desc("in_degree"), F.asc("id"))
        .limit(20)
    )


def q_graph_gather_scatter(spark, sf_dir):
    """One SpMV: field(v) = ((v*37+11) % 97)/97.0, weight 1."""
    e = _graph_edges(spark, sf_dir)
    field = _vertices(e).select(
        "id", (((F.col("id") * 37 + 11) % 97) / F.lit(97.0)).alias("value")
    )
    out = (
        e.join(field, e["src"] == field["id"])
        .groupBy(e["dst"].alias("id"))
        .agg(F.round(F.sum("value"), 6).alias("integrated"))
    )
    return out


def q_graph_pagerank_3iter(spark, sf_dir):
    """PR_SQL_ITERS unrolled synchronous PageRank steps (same update
    rule as operators.pagerank), fully SQL-expressible."""
    e = _graph_edges(spark, sf_dir).persist()
    v = _vertices(e).persist()
    n = v.count()
    deg = e.groupBy("src").agg(F.count("*").alias("d"))
    r = v.select("id", F.lit(1.0 / n).alias("r"))
    for _ in range(PR_SQL_ITERS):
        # dangling mass rides the plan as a broadcast 1-row aggregate —
        # no per-iteration driver collect (the real operator folds it
        # into the snapshot job the same way)
        dm_df = (
            r.join(deg.select(F.col("src").alias("id")), "id", "left_anti")
            .agg(F.coalesce(F.sum("r"), F.lit(0.0)).alias("dm"))
        )
        contrib = (
            e.join(deg, "src")
            .join(r.withColumnRenamed("id", "src"), "src")
            .groupBy(F.col("dst").alias("id"))
            .agg(F.sum(F.col("r") / F.col("d")).alias("c"))
        )
        r = (
            v.join(contrib, "id", "left")
            .crossJoin(F.broadcast(dm_df))
            .select(
                "id",
                (
                    F.lit((1.0 - PR_ALPHA) / n)
                    + F.lit(PR_ALPHA)
                    * (F.coalesce(F.col("c"), F.lit(0.0)) + F.col("dm") / F.lit(float(n)))
                ).alias("r"),
            )
            .localCheckpoint(eager=True)
        )
    out = r.select("id", F.round("r", 9).alias("rank"))
    e.unpersist()
    v.unpersist()
    return out


def _pr3_oracle_sql() -> str:
    lines = [
        f"WITH e AS ({_E_SQL}),",
        f"v AS ({_V_SQL}),",
        "n AS (SELECT count(*)::DOUBLE AS n FROM v),",
        "deg AS (SELECT src, count(*)::DOUBLE AS d FROM e GROUP BY src),",
        "r0 AS (SELECT id, 1.0/(SELECT n FROM n) AS r FROM v),",
    ]
    for i in range(1, PR_SQL_ITERS + 1):
        p = i - 1
        lines += [
            f"dm{i} AS (SELECT coalesce(sum(r.r), 0.0) AS m FROM r{p} r "
            f"LEFT JOIN deg ON r.id = deg.src WHERE deg.src IS NULL),",
            f"c{i} AS (SELECT e.dst AS id, sum(r.r / deg.d) AS c FROM e "
            f"JOIN deg ON e.src = deg.src JOIN r{p} r ON e.src = r.id GROUP BY e.dst),",
            f"r{i} AS (SELECT v.id, {1.0 - PR_ALPHA}/(SELECT n FROM n) "
            f"+ {PR_ALPHA}*(coalesce(c.c, 0.0) + (SELECT m FROM dm{i})/(SELECT n FROM n)) AS r "
            f"FROM v LEFT JOIN c{i} c ON v.id = c.id),",
        ]
    lines.append(f"fin AS (SELECT id, round(r, 9) AS rank FROM r{PR_SQL_ITERS})")
    return "\n".join(lines) + "\nSELECT id, rank FROM fin"


def q_graph_components(spark, sf_dir):
    from efficient_graph_algorithms_spark.operators.components import connected_components

    e = _graph_edges(spark, sf_dir)
    labels, _ = connected_components(spark, e, vertices=_vertices(e))
    return labels.select("id", "component")


_CC_ORACLE_SQL = f"""
WITH RECURSIVE e AS ({_E_SQL}),
sym AS (SELECT src, dst FROM e UNION SELECT dst, src FROM e),
v AS (SELECT DISTINCT src AS id FROM sym),
r(id, comp) AS (
  SELECT id, id FROM v
  UNION
  SELECT s.dst, r.comp FROM r JOIN sym s ON s.src = r.id
)
SELECT id, min(comp) AS component FROM r GROUP BY id
"""


def q_graph_triangle_count(spark, sf_dir):
    from efficient_graph_algorithms_spark.operators.triangles import triangle_count

    return triangle_count(_graph_edges(spark, sf_dir))


_TRI_SQL_BASE = f"""WITH e AS ({_E_SQL}),
und AS ({_UND_SQL}),
tri AS (
  SELECT e1.lo AS a, e1.hi AS b, e2.hi AS c
  FROM und e1 JOIN und e2 ON e1.hi = e2.lo
  JOIN und e3 ON e3.lo = e1.lo AND e3.hi = e2.hi
)"""


def q_graph_triangles_per_vertex(spark, sf_dir):
    from efficient_graph_algorithms_spark.operators.triangles import triangles_per_vertex

    return triangles_per_vertex(_graph_edges(spark, sf_dir)).select(
        "id", F.col("triangles").cast("long").alias("triangles")
    )


def q_graph_pagerank_full(spark, sf_dir):
    """Full convergent PageRank through the REAL operator (tol=1e-6).
    On the fixed sf0.01 graph the converged iteration count is a
    constant (PR_FULL_ITERS, measured once and asserted here), so the
    oracle unrolls exactly that many CTE steps of the identical update
    rule and gates its own output on an in-SQL `delta < tol` check —
    if either side ever stops converging at that count, the row-count
    mismatch trips the driver. This closes the engine's last
    no-oracle driver row (r4 verdict #6)."""
    from efficient_graph_algorithms_spark.operators.pagerank import pagerank

    e = _graph_edges(spark, sf_dir)
    ranks, info = pagerank(spark, e, vertices=_vertices(e), tol=1e-6)
    assert info["converged"] and info["iterations"] == PR_FULL_ITERS, (
        f"sf0.01 PageRank convergence drifted: {info['iterations']} iters "
        f"(expected {PR_FULL_ITERS}) converged={info['converged']} — "
        "re-measure PR_FULL_ITERS"
    )
    return ranks.select("id", F.round("rank", 9).alias("rank"))


def _pr_full_oracle_sql() -> str:
    """The _pr3_oracle_sql update rule unrolled to the measured
    convergence count, with the convergence itself asserted in SQL:
    the final SELECT returns zero rows unless the last step's L1 delta
    is below tol — a silent-divergence alarm, not just a value check."""
    lines = [
        f"WITH e AS ({_E_SQL}),",
        f"v AS ({_V_SQL}),",
        "n AS (SELECT count(*)::DOUBLE AS n FROM v),",
        "deg AS (SELECT src, count(*)::DOUBLE AS d FROM e GROUP BY src),",
        "r0 AS (SELECT id, 1.0/(SELECT n FROM n) AS r FROM v),",
    ]
    for i in range(1, PR_FULL_ITERS + 1):
        p = i - 1
        lines += [
            f"dm{i} AS (SELECT coalesce(sum(r.r), 0.0) AS m FROM r{p} r "
            f"LEFT JOIN deg ON r.id = deg.src WHERE deg.src IS NULL),",
            f"c{i} AS (SELECT e.dst AS id, sum(r.r / deg.d) AS c FROM e "
            f"JOIN deg ON e.src = deg.src JOIN r{p} r ON e.src = r.id GROUP BY e.dst),",
            f"r{i} AS (SELECT v.id, {1.0 - PR_ALPHA}/(SELECT n FROM n) "
            f"+ {PR_ALPHA}*(coalesce(c.c, 0.0) + (SELECT m FROM dm{i})/(SELECT n FROM n)) AS r "
            f"FROM v LEFT JOIN c{i} c ON v.id = c.id),",
        ]
    k = PR_FULL_ITERS
    lines.append(
        f"chk AS (SELECT sum(abs(a.r - b.r)) AS delta FROM r{k} a "
        f"JOIN r{k - 1} b ON a.id = b.id)"
    )
    return "\n".join(lines) + (
        f"\nSELECT id, round(r, 9) AS rank FROM r{k} "
        f"WHERE (SELECT delta FROM chk) < 1e-6"
    )


def q_graph_lpa(spark, sf_dir):
    from efficient_graph_algorithms_spark.operators.lpa import label_propagation

    e = _graph_edges(spark, sf_dir)
    labels, _ = label_propagation(spark, e, vertices=_vertices(e), max_iter=LPA_SQL_ITERS)
    return labels.select("id", "label")


def _lpa_oracle_sql() -> str:
    """LPA_SQL_ITERS unrolled synchronous LPA rounds (vote-count argmax,
    min-label tie-break) — the exact semantics of operators.lpa. The
    engine may stop earlier when a round changes nothing; extra unrolled
    rounds are then fixpoint no-ops, so the results coincide."""
    lines = [
        f"WITH e AS ({_E_SQL}),",
        "sym AS (SELECT src, dst FROM e UNION SELECT dst AS src, src AS dst FROM e),",
        f"v AS ({_V_SQL}),",
        "l0 AS (SELECT id, id AS label FROM v),",
    ]
    for i in range(1, LPA_SQL_ITERS + 1):
        p = i - 1
        lines += [
            f"vt{i} AS (SELECT s.dst AS id, l.label, count(*) AS cnt "
            f"FROM sym s JOIN l{p} l ON s.src = l.id GROUP BY s.dst, l.label),",
            f"wn{i} AS (SELECT id, label FROM (SELECT id, label, row_number() OVER "
            f"(PARTITION BY id ORDER BY cnt DESC, label ASC) AS rn FROM vt{i}) WHERE rn = 1),",
            f"l{i} AS (SELECT l.id, coalesce(w.label, l.label) AS label "
            f"FROM l{p} l LEFT JOIN wn{i} w ON l.id = w.id),",
        ]
    lines[-1] = lines[-1].rstrip(",")
    return "\n".join(lines) + f"\nSELECT id, label FROM l{LPA_SQL_ITERS}"


KCORE_SQL_PEELS = 3
# k chosen against the sf0.01 degree distribution (min 31, median 59):
# at 48 the 3 unrolled peels remove ~17% of vertices with real cascade
# (a smaller k peels nothing at the driver's scale and would verify
# only a degree computation)
KCORE_SQL_K = 48


def q_graph_kcore3(spark, sf_dir):
    """k-core peel (engine extension, no reference counterpart — the
    standard web-graph quality filter): the real operator pinned to
    KCORE_SQL_PEELS synchronous peel rounds so the unrolled SQL oracle
    reproduces it exactly. The operator may stop earlier at the peel
    fixpoint; extra unrolled rounds are then no-ops, so results
    coincide (same contract as graph_lpa / graph_pagerank_3iter)."""
    from efficient_graph_algorithms_spark.operators.kcore import k_core

    e = _graph_edges(spark, sf_dir)
    core, _ = k_core(spark, e, KCORE_SQL_K, max_iter=KCORE_SQL_PEELS)
    return core.select("id", "degree")


def _kcore_oracle_sql() -> str:
    """KCORE_SQL_PEELS unrolled synchronous peel rounds at k=KCORE_SQL_K:
    each round recomputes degrees on the surviving symmetrized edge set
    and drops every vertex below k. Output = survivor degrees after the
    last round — the exact semantics of operators.kcore.k_core."""
    lines = [
        f"WITH e AS ({_E_SQL}),",
        "l0 AS (SELECT src, dst FROM e UNION SELECT dst AS src, src AS dst FROM e),",
    ]
    for i in range(1, KCORE_SQL_PEELS + 1):
        p = i - 1
        lines += [
            f"r{i} AS (SELECT src AS id FROM l{p} GROUP BY src "
            f"HAVING count(*) < {KCORE_SQL_K}),",
            f"l{i} AS (SELECT src, dst FROM l{p} "
            f"WHERE src NOT IN (SELECT id FROM r{i}) "
            f"AND dst NOT IN (SELECT id FROM r{i})),",
        ]
    lines[-1] = lines[-1].rstrip(",")
    return (
        "\n".join(lines)
        + f"\nSELECT src AS id, count(*) AS degree FROM l{KCORE_SQL_PEELS} GROUP BY src"
    )


# Sparsify the dense driver graph for SCC: the full 59k-edge graph is ONE
# giant SCC (every vertex reaches every vertex) — a degenerate test. Keeping
# 1/12 of the edges by hash gives real bowtie structure at sf0.01: 4,893
# edges, 1,978 vertices, 366 SCCs, giant component 285 (1/20 gives even
# more fragments but triples the engine's hop count for the same coverage —
# the multi-outer-round extract/partition path is pytest-covered instead).
SCC_EDGE_MOD = 12


def q_graph_scc(spark, sf_dir):
    """Strongly connected components (engine extension, no reference
    counterpart — the directed face of the link graph; Broder bowtie):
    FULL-convergence run. No round pinning needed: the SCC fixpoint is
    schedule-independent and scc(v) = min member id is deterministic,
    so the oracle is a transitive-closure recursive CTE rather than an
    unrolled trajectory (contrast graph_pagerank_3iter)."""
    from efficient_graph_algorithms_spark.operators.scc import (
        strongly_connected_components,
    )

    e = _graph_edges(spark, sf_dir).where(
        (F.col("src") * 31 + F.col("dst") * 7) % SCC_EDGE_MOD == 0
    )
    labels, _ = strongly_connected_components(spark, e)
    return labels.select("id", "scc")


def _scc_oracle_sql() -> str:
    """scc(v) = least(v, min{u : v→*u and u→*v}) via a recursive-CTE
    transitive closure — the schedule-independent fixpoint the operator
    converges to."""
    return f"""
WITH RECURSIVE e0 AS ({_E_SQL}),
e AS (SELECT src, dst FROM e0 WHERE (src * 31 + dst * 7) % {SCC_EDGE_MOD} = 0),
v AS (SELECT src AS id FROM e UNION SELECT dst FROM e),
reach(a, b) AS (
  SELECT src, dst FROM e
  UNION
  SELECT r.a, e.dst FROM reach r JOIN e ON e.src = r.b
),
mut AS (SELECT r1.a AS mv, r1.b AS mu FROM reach r1
        JOIN reach r2 ON r1.a = r2.b AND r1.b = r2.a)
SELECT v.id, least(v.id, coalesce(min(m.mu), v.id)) AS scc
FROM v LEFT JOIN mut m ON m.mv = v.id GROUP BY v.id
"""


def q_graph_bowtie(spark, sf_dir):
    """Broder bowtie decomposition (WWW 2000) on the same
    hash-sparsified graph as graph_scc: CORE / IN / OUT / TEND / DISC
    per vertex. Full convergence — every constituent fixpoint (SCC,
    reachability, weak components) is schedule-independent, so the
    oracle is recursive-CTE closures, no round pinning."""
    from efficient_graph_algorithms_spark.operators.scc import bowtie_classes

    e = _graph_edges(spark, sf_dir).where(
        (F.col("src") * 31 + F.col("dst") * 7) % SCC_EDGE_MOD == 0
    )
    labels, _ = bowtie_classes(spark, e)
    return labels.select("id", "scc", "cls")


def _bowtie_oracle_sql() -> str:
    """scc labels via the mutual-closure CTE (as _scc_oracle_sql), then
    single-column frontier closures from the core member set along
    forward / backward / undirected edges."""
    return f"""
WITH RECURSIVE e0 AS ({_E_SQL}),
e AS (SELECT src, dst FROM e0 WHERE (src * 31 + dst * 7) % {SCC_EDGE_MOD} = 0),
v AS (SELECT src AS id FROM e UNION SELECT dst FROM e),
reach(a, b) AS (
  SELECT src, dst FROM e
  UNION
  SELECT r.a, e.dst FROM reach r JOIN e ON e.src = r.b
),
mut AS (SELECT r1.a AS mv, r1.b AS mu FROM reach r1
        JOIN reach r2 ON r1.a = r2.b AND r1.b = r2.a),
scc AS (SELECT v.id, least(v.id, coalesce(min(m.mu), v.id)) AS scc
        FROM v LEFT JOIN mut m ON m.mv = v.id GROUP BY v.id),
core AS (SELECT scc FROM (SELECT scc, count(*) AS n FROM scc GROUP BY scc
         ORDER BY n DESC, scc LIMIT 1)),
corev AS (SELECT id FROM scc WHERE scc = (SELECT scc FROM core)),
fwd(id) AS (SELECT id FROM corev UNION SELECT e.dst FROM fwd f JOIN e ON e.src = f.id),
bwd(id) AS (SELECT id FROM corev UNION SELECT e.src FROM bwd b JOIN e ON e.dst = b.id),
ue AS (SELECT src, dst FROM e UNION SELECT dst AS src, src AS dst FROM e),
weak(id) AS (SELECT id FROM corev UNION SELECT ue.dst FROM weak w JOIN ue ON ue.src = w.id)
SELECT s.id, s.scc,
  CASE WHEN s.scc = (SELECT scc FROM core) THEN 'CORE'
       WHEN s.id IN (SELECT id FROM bwd) THEN 'IN'
       WHEN s.id IN (SELECT id FROM fwd) THEN 'OUT'
       WHEN s.id IN (SELECT id FROM weak) THEN 'TEND'
       ELSE 'DISC' END AS cls
FROM scc s
"""


def q_graph_webstats(spark, sf_dir):
    """Whole-graph web statistics (engine extension, no reference
    counterpart): reciprocity, degree assortativity, global clustering
    coefficient — single-pass aggregates, rounded to 9 decimals for
    cross-engine float agreement."""
    from efficient_graph_algorithms_spark.operators.webstats import web_stats

    e = _graph_edges(spark, sf_dir)
    stats, _ = web_stats(spark, e)
    return stats.select("reciprocity", "assortativity", "clustering")


def _webstats_oracle_sql() -> str:
    """The three statistics as plain SQL aggregates: reciprocity via an
    EXISTS reverse-edge probe, assortativity as corr() of endpoint
    degrees over both orientations of the undirected edge list,
    clustering as 3*triangles / sum(d*(d-1)/2)."""
    return f"""
WITH e AS ({_E_SQL}),
und AS ({_UND_SQL}),
deg AS (SELECT id, count(*) AS deg FROM
        (SELECT lo AS id FROM und UNION ALL SELECT hi FROM und) GROUP BY id),
sym AS (SELECT lo AS a, hi AS b FROM und UNION ALL SELECT hi, lo FROM und),
tri AS (SELECT a.lo AS x, a.hi AS y, b.hi AS z FROM und a
        JOIN und b ON a.lo = b.lo AND a.hi < b.hi
        JOIN und c ON c.lo = a.hi AND c.hi = b.hi)
SELECT
  round((SELECT count(*) FROM e x WHERE EXISTS
         (SELECT 1 FROM e r WHERE r.src = x.dst AND r.dst = x.src))
        / (SELECT count(*) FROM e)::DOUBLE, 9) AS reciprocity,
  round((SELECT corr(d1.deg::DOUBLE, d2.deg::DOUBLE) FROM sym
         JOIN deg d1 ON d1.id = sym.a JOIN deg d2 ON d2.id = sym.b), 9)
        AS assortativity,
  round(3.0 * (SELECT count(*) FROM tri)
        / (SELECT sum(deg * (deg - 1) / 2.0) FROM deg), 9) AS clustering
"""


WALKS_SQL_STEPS = 2
WALKS_SEED = 42


def q_graph_walks2(spark, sf_dir):
    """Deterministic random-walk corpus (engine extension — the
    DeepWalk/node2vec training-data generator; the reference's walk
    KERNEL computes distribution vectors, this materializes walks):
    WALKS_SQL_STEPS steps, 1 walk per vertex. Every step choice is the
    argmin of a portable 60-bit md5 hash, so the SQL oracle replays the
    corpus bit-for-bit (same portability trick as the MinHash family)."""
    from efficient_graph_algorithms_spark.operators.walks import random_walks

    e = _graph_edges(spark, sf_dir)
    corpus, _ = random_walks(
        spark, e, walk_length=WALKS_SQL_STEPS, walks_per_vertex=1, seed=WALKS_SEED
    )
    return corpus.select("walk", "step", "id")


N2V_WEIGHTS = (1, 4, 2)  # (w_return, w_in, w_out) ~ p=4, q=2


def q_graph_n2v2(spark, sf_dir):
    """node2vec-biased walk corpus (the second-order extension of the
    driver-rowed graph_walks2): 2 steps, integer weights (1, 4, 2) —
    weighted sampling as argmin over an integer-replicated candidate
    set, so the SQL oracle replays the biased corpus bit-for-bit."""
    from efficient_graph_algorithms_spark.operators.walks import node2vec_walks

    e = _graph_edges(spark, sf_dir)
    wr, wi, wo = N2V_WEIGHTS
    corpus, _ = node2vec_walks(
        spark,
        e,
        walk_length=WALKS_SQL_STEPS,
        w_return=wr,
        w_in=wi,
        w_out=wo,
        walks_per_vertex=1,
        seed=WALKS_SEED,
    )
    return corpus.select("walk", "step", "id")


def _n2v_oracle_sql() -> str:
    """Replay of the biased hash-argmin walk: candidate weights by the
    node2vec CASE (return / in-neighborhood / outward), each candidate
    replicated weight times as (dst, j), argmin choice hash with dst as
    tie-break — the exact semantics of operators.walks.node2vec_walks
    (prev initialized to the start, making step 1 the degenerate
    all-w_in uniform case in both engines)."""
    from efficient_graph_algorithms_spark.operators.walks import n2v_choice_duck_sql

    wr, wi, wo = N2V_WEIGHTS
    lines = [
        f"WITH e AS ({_E_SQL}),",
        f"v AS ({_V_SQL}),",
        "s0 AS (SELECT id AS walk, id AS prev, id AS cur FROM v),",
    ]
    selects = ["SELECT walk, 0 AS step, cur AS id FROM s0"]
    for t in range(1, WALKS_SQL_STEPS + 1):
        h = n2v_choice_duck_sql("walk", t, "dst", "j", WALKS_SEED)
        lines += [
            f"w{t} AS (SELECT s.walk, s.cur, e.dst, "
            f"CASE WHEN e.dst = s.prev THEN {wr} "
            f"WHEN EXISTS (SELECT 1 FROM e pe WHERE pe.src = s.prev "
            f"AND pe.dst = e.dst) THEN {wi} ELSE {wo} END AS w "
            f"FROM s{t-1} s JOIN e ON e.src = s.cur),",
            f"x{t} AS (SELECT walk, cur, dst, "
            f"unnest(generate_series(0, w - 1)) AS j FROM w{t} WHERE w > 0),",
            f"c{t} AS (SELECT walk, cur, dst, row_number() OVER "
            f"(PARTITION BY walk ORDER BY {h}, dst) AS rn FROM x{t}),",
            f"s{t} AS (SELECT walk, cur AS prev, dst AS cur FROM c{t} WHERE rn = 1),",
        ]
        selects.append(f"SELECT walk, {t} AS step, cur AS id FROM s{t}")
    lines[-1] = lines[-1].rstrip(",")
    return "\n".join(lines) + "\n" + "\nUNION ALL\n".join(selects)


def _walks_oracle_sql() -> str:
    """Replay of the hash-argmin walk: at step t the walker at ``cur``
    moves to the out-neighbor with the smallest choice hash (dst as
    tie-break) — the exact semantics of operators.walks.random_walks."""
    from efficient_graph_algorithms_spark.operators.walks import walk_choice_duck_sql

    lines = [
        f"WITH e AS ({_E_SQL}),",
        f"v AS ({_V_SQL}),",
        "s0 AS (SELECT id AS walk, id AS cur FROM v),",
    ]
    selects = ["SELECT walk, 0 AS step, cur AS id FROM s0"]
    for t in range(1, WALKS_SQL_STEPS + 1):
        h = walk_choice_duck_sql("walk", t, "dst", WALKS_SEED)
        lines += [
            f"c{t} AS (SELECT walk, dst, row_number() OVER "
            f"(PARTITION BY walk ORDER BY {h}, dst) AS rn "
            f"FROM s{t-1} JOIN e ON e.src = s{t-1}.cur),",
            f"s{t} AS (SELECT walk, dst AS cur FROM c{t} WHERE rn = 1),",
        ]
        selects.append(f"SELECT walk, {t} AS step, cur AS id FROM s{t}")
    lines[-1] = lines[-1].rstrip(",")
    return "\n".join(lines) + "\n" + "\nUNION ALL\n".join(selects)


KTRUSS_SQL_PEELS = 2
# k=4 (support threshold 2) against the sf0.01 edge-support distribution
# (max 9, median 2, 10k of 59k edges triangle-free): the first peel
# removes ~2/3 of the edges and the second cascades further — both
# unrolled rounds do real work
KTRUSS_SQL_K = 4


def q_graph_ktruss2(spark, sf_dir):
    """k-truss peel (engine extension, no reference counterpart — the
    edge-level sharpening of k-core: a link farm's star edges have high
    degree but zero triangle support): the real operator pinned to
    KTRUSS_SQL_PEELS peel rounds so the unrolled SQL oracle reproduces
    it exactly. Support in the output is the one computed at the start
    of the final round — the operator's documented contract — which the
    oracle mirrors. Early fixpoint => extra unrolled rounds are no-ops
    (same contract as graph_kcore3)."""
    from efficient_graph_algorithms_spark.operators.ktruss import k_truss

    e = _graph_edges(spark, sf_dir)
    truss, _ = k_truss(spark, e, KTRUSS_SQL_K, max_iter=KTRUSS_SQL_PEELS)
    return truss.select("lo", "hi", "support")


def _ktruss_oracle_sql() -> str:
    """KTRUSS_SQL_PEELS unrolled synchronous truss peels at
    k=KTRUSS_SQL_K: each round counts per-edge triangle support on the
    surviving canonical edge set and drops edges below k-2. Output =
    survivors of the last round with that round's support — the exact
    semantics of operators.ktruss.k_truss."""
    t = KTRUSS_SQL_K - 2
    lines = [
        f"WITH e AS ({_E_SQL}),",
        f"l0 AS ({_UND_SQL}),",
    ]
    for i in range(1, KTRUSS_SQL_PEELS + 1):
        p = i - 1
        lines += [
            f"tri{i} AS (SELECT a.lo AS x, a.hi AS y, b.hi AS z "
            f"FROM l{p} a JOIN l{p} b ON a.lo = b.lo AND a.hi < b.hi "
            f"JOIN l{p} c ON c.lo = a.hi AND c.hi = b.hi),",
            f"sup{i} AS (SELECT lo, hi, count(*) AS support FROM ("
            f"SELECT x AS lo, y AS hi FROM tri{i} UNION ALL "
            f"SELECT x, z FROM tri{i} UNION ALL "
            f"SELECT y, z FROM tri{i}) GROUP BY lo, hi),",
            f"l{i} AS (SELECT lo, hi, support FROM sup{i} WHERE support >= {t}),",
        ]
    lines[-1] = lines[-1].rstrip(",")
    return "\n".join(lines) + f"\nSELECT lo, hi, support FROM l{KTRUSS_SQL_PEELS}"


ANF_SQL_RADIUS = 2
ANF_SEED_MOD = 50  # ~40 sampled sources at the driver's 2000-vertex graph


def q_graph_anf2(spark, sf_dir):
    """Neighborhood function (engine extension, no reference counterpart
    — the HyperBall/ANF statistic of web-graph analysis): EXACT ball
    sizes N(v, r) for r = 1..ANF_SQL_RADIUS from sampled sources
    (id % ANF_SEED_MOD == 0), pinned rounds (stop_early=False) so the
    unrolled SQL oracle reproduces it exactly. The HLL-sketch mode (the
    100 TB path) is pytest-verified against this exact mode."""
    from efficient_graph_algorithms_spark.operators.anf import neighborhood_function

    e = _graph_edges(spark, sf_dir)
    seeds = _vertices(e).where(F.col("id") % ANF_SEED_MOD == 0)
    res, _ = neighborhood_function(
        spark, e, max_radius=ANF_SQL_RADIUS, mode="exact",
        sources=seeds, stop_early=False,
    )
    return res.select("id", "r", "nf")


def _anf2_oracle_sql() -> str:
    """Unrolled r-hop reachable-set counts on the symmetrized simple
    graph: b0 = {(v, v)}, b_{i+1} = b_i U (b_i o E); nf = count distinct
    members per source after each hop — the exact semantics of
    operators.anf.neighborhood_function(mode='exact')."""
    lines = [
        f"WITH e AS ({_E_SQL}),",
        "sym AS (SELECT src, dst FROM e UNION SELECT dst AS src, src AS dst FROM e),",
        f"seeds AS (SELECT DISTINCT src AS id FROM sym WHERE src % {ANF_SEED_MOD} = 0),",
        "b0 AS (SELECT id, id AS m FROM seeds),",
    ]
    for i in range(1, ANF_SQL_RADIUS + 1):
        p = i - 1
        lines.append(
            f"b{i} AS (SELECT id, m FROM b{p} UNION "
            f"SELECT b.id, y.dst AS m FROM b{p} b JOIN sym y ON y.src = b.m),"
        )
    lines[-1] = lines[-1].rstrip(",")
    selects = [
        f"SELECT id, {i} AS r, count(*) AS nf FROM b{i} GROUP BY id"
        for i in range(1, ANF_SQL_RADIUS + 1)
    ]
    return "\n".join(lines) + "\n" + "\nUNION ALL\n".join(selects)


WPR_ALPHA = 0.85
WPR_STEPS = 3


def q_graph_wpr3(spark, sf_dir):
    """3 pinned steps of weighted personalized PageRank (damped walk
    over the weight-normalized transition — anchor/link-weighted
    ranking). Weights synthesized deterministically from the edge key;
    seeds = ids divisible by 50."""
    from efficient_graph_algorithms_spark.operators.kernels import (
        damped_weighted_walk,
    )

    e = _graph_edges(spark, sf_dir).withColumn(
        "wt", (F.lit(1) + (F.col("src") * 7 + F.col("dst") * 13) % 5).cast("long")
    )
    field = _vertices(e).select(
        "id", F.when(F.col("id") % 50 == 0, F.lit(1.0)).otherwise(F.lit(0.0)).alias("value")
    )
    out = damped_weighted_walk(e, field, alpha=WPR_ALPHA, k=WPR_STEPS, weight_col="wt")
    return out.select("id", F.round("value", 9).alias("value"))


def _wpr3_oracle_sql() -> str:
    """WPR_STEPS unrolled damped weighted-walk rounds; the (1.0 - 0.85)
    subtraction is written out so both engines produce the identical
    IEEE double coefficient."""
    lines = [
        f"WITH e AS (SELECT src, dst, 1 + (src * 7 + dst * 13) % 5 AS wt FROM ({_E_SQL})),",
        f"v AS ({_V_SQL}),",
        "tw AS (SELECT src, sum(wt)::DOUBLE AS t FROM e GROUP BY src),",
        "p AS (SELECT e.src, e.dst, e.wt / tw.t AS w FROM e JOIN tw ON e.src = tw.src),",
        "x0 AS (SELECT id, CASE WHEN id % 50 = 0 THEN 1.0 ELSE 0.0 END AS x FROM v),",
    ]
    for i in range(1, WPR_STEPS + 1):
        prv = i - 1
        lines.append(
            f"x{i} AS (SELECT x0.id, (1.0 - {WPR_ALPHA}) * x0.x + {WPR_ALPHA} * coalesce(mv.m, 0.0) AS x "
            f"FROM x0 LEFT JOIN (SELECT p.dst AS id, sum(p.w * x{prv}.x) AS m "
            f"FROM p JOIN x{prv} ON x{prv}.id = p.src GROUP BY p.dst) mv ON mv.id = x0.id),"
        )
    lines[-1] = lines[-1].rstrip(",")
    return "\n".join(lines) + f"\nSELECT id, round(x, 9) AS value FROM x{WPR_STEPS}"


COCITE_CAP = 64
COCITE_MIN = 2
COCITE_K = 20


def q_graph_cocitation(spark, sf_dir):
    """Top-20 most co-cited page pairs (shared in-link sources, Small
    1973) with the hub degree cap that bounds pair volume at scale;
    total order (n_common desc, a, b) makes the top-k deterministic."""
    from efficient_graph_algorithms_spark.operators.cocite import cocitation_topk

    out, _ = cocitation_topk(
        _graph_edges(spark, sf_dir), k=COCITE_K,
        min_count=COCITE_MIN, degree_cap=COCITE_CAP,
    )
    return out


def q_graph_coupling(spark, sf_dir):
    """Top-20 bibliographic-coupling pairs (shared out-link targets,
    Kessler 1963) — the dual wedge join, capped on target in-degree."""
    from efficient_graph_algorithms_spark.operators.cocite import cocitation_topk

    out, _ = cocitation_topk(
        _graph_edges(spark, sf_dir), k=COCITE_K,
        min_count=COCITE_MIN, degree_cap=COCITE_CAP, mode="coupling",
    )
    return out


LINKPRED_K = 20
LINKPRED_MIN = 2
LINKPRED_CAP = 64


def q_graph_linkpred(spark, sf_dir):
    """Top-20 predicted links (Adamic–Adar over the undirected simple
    graph, common-neighbor + Jaccard scores, hub-capped wedge centers,
    existing edges anti-joined out); total order (aa desc, a, b)."""
    from efficient_graph_algorithms_spark.operators.linkpred import (
        link_prediction_topk,
    )

    out, _ = link_prediction_topk(
        _graph_edges(spark, sf_dir), k=LINKPRED_K,
        min_common=LINKPRED_MIN, degree_cap=LINKPRED_CAP,
    )
    return out


def q_graph_local_cc(spark, sf_dir):
    """Per-vertex local clustering coefficient (Watts–Strogatz) on the
    undirected simple graph: (id, deg, triangles, lcc) for every
    incident vertex."""
    from efficient_graph_algorithms_spark.operators.linkpred import (
        local_clustering,
    )

    return local_clustering(_graph_edges(spark, sf_dir))


def _linkpred_oracle_sql() -> str:
    """Adamic–Adar top-k mirror: same symmetrized adjacency, the same
    2 <= deg <= cap center filter, anti-join against the edge set, and
    the same rounded sort key."""
    return f"""
WITH e AS ({_E_SQL}),
und AS ({_UND_SQL}),
adj AS (SELECT lo AS id, hi AS nbr FROM und UNION ALL SELECT hi AS id, lo AS nbr FROM und),
deg AS (SELECT id, count(*) AS d FROM adj GROUP BY id),
centers AS (SELECT adj.id, adj.nbr, 1.0 / ln(deg.d) AS w_aa
            FROM adj JOIN deg ON deg.id = adj.id
            WHERE deg.d >= 2 AND deg.d <= {LINKPRED_CAP}),
scored AS (SELECT x.nbr AS a, y.nbr AS b, count(*) AS n_common, sum(x.w_aa) AS aa_raw
           FROM centers x JOIN centers y ON x.id = y.id AND x.nbr < y.nbr
           GROUP BY x.nbr, y.nbr HAVING count(*) >= {LINKPRED_MIN}),
non_edges AS (SELECT s.* FROM scored s LEFT JOIN und ON und.lo = s.a AND und.hi = s.b
              WHERE und.lo IS NULL)
SELECT n.a, n.b, n.n_common, round(n.aa_raw, 9) AS aa,
       round(CAST(n.n_common AS DOUBLE) / (da.d + db.d - n.n_common), 9) AS jaccard
FROM non_edges n JOIN deg da ON da.id = n.a JOIN deg db ON db.id = n.b
ORDER BY round(n.aa_raw, 9) DESC, n.a, n.b LIMIT {LINKPRED_K}
"""


def _local_cc_oracle_sql() -> str:
    """Per-vertex triangles over degree-choose-2, 0 below degree 2."""
    return f"""
WITH e AS ({_E_SQL}),
und AS ({_UND_SQL}),
adj AS (SELECT lo AS id, hi AS nbr FROM und UNION ALL SELECT hi AS id, lo AS nbr FROM und),
deg AS (SELECT id, count(*) AS deg FROM adj GROUP BY id),
tri AS (
  SELECT e1.lo AS a, e1.hi AS b, e2.hi AS c
  FROM und e1 JOIN und e2 ON e1.hi = e2.lo
  JOIN und e3 ON e3.lo = e1.lo AND e3.hi = e2.hi
),
m AS (SELECT a AS id FROM tri UNION ALL SELECT b FROM tri UNION ALL SELECT c FROM tri),
pv AS (SELECT id, count(*) AS triangles FROM m GROUP BY id)
SELECT deg.id, deg.deg, coalesce(pv.triangles, 0) AS triangles,
       CASE WHEN deg.deg >= 2
            THEN round(2.0 * coalesce(pv.triangles, 0) / (deg.deg * (deg.deg - 1.0)), 9)
            ELSE 0.0 END AS lcc
FROM deg LEFT JOIN pv ON pv.id = deg.id
"""


def q_emb_quantize(spark, sf_dir):
    """Int8 absmax scalar quantization of the embedding column
    (Faiss-SQ8-style): per-vector exact code checksum + reconstruction
    MSE — the codes themselves are parity-checked, not just stats."""
    from efficient_graph_algorithms_spark.operators.quantize import (
        quantization_report,
    )

    return quantization_report(_t(spark, sf_dir, "embeddings"))


def _emb_quantize_oracle_sql() -> str:
    """Same absmax scales, same round-half-away codes (verified to
    match Spark's round), same reconstruction arithmetic."""
    return """
WITH x AS (
  SELECT vec_id, r.i AS i, embedding[r.i]::DOUBLE AS v
  FROM embeddings,
       LATERAL (SELECT unnest(generate_series(1, len(embedding)))) r(i)
),
sc AS (SELECT i, max(abs(v)) AS s FROM x GROUP BY i),
c AS (SELECT x.vec_id, x.i, x.v, sc.s,
             CASE WHEN sc.s > 0 THEN round(x.v / sc.s * 127.0) ELSE 0.0 END
             AS code
      FROM x JOIN sc USING (i)),
r AS (SELECT vec_id, code,
             CASE WHEN s > 0 THEN code * s / 127.0 ELSE 0.0 END AS recon, v
      FROM c)
SELECT vec_id, sum(code)::BIGINT AS code_sum,
       round(sum((v - recon) * (v - recon)) / count(*), 6) AS mse
FROM r GROUP BY vec_id
"""


def q_text_anchors(spark, sf_dir):
    """Inlink anchor-term index (the classic web-search anchor-text
    signal; reference parity face of sources/edges.py:146). Html is
    synthesized deterministically from the documents table — every doc
    links to a derived target with a 40-char snippet of its own text as
    the anchor, plus a fixed relative-href anchor — so the REAL JVM
    extraction path (element regex → href normalize → anchor clean →
    tokenize → count) is parity-checked end-to-end against a pure-SQL
    reconstruction of the same synthesis."""
    from efficient_graph_algorithms_spark.sources.edges import anchor_term_counts

    d = _t(spark, sf_dir, "documents")
    # snippet charset restricted to [a-zA-Z0-9 ] so the html stays
    # well-formed and the oracle's tokenization is trivially identical
    snippet = F.regexp_replace(
        F.substring(F.coalesce(F.col("text"), F.lit("")), 1, 40),
        "[^a-zA-Z0-9 ]",
        " ",
    )
    html = F.concat(
        F.lit('<html><body><a href="http://site'),
        ((F.col("doc_id") + 1) % 7).cast("string"),
        F.lit(".test/p/"),
        ((F.col("doc_id") * 13 + 1) % 997).cast("string"),
        F.lit('">'),
        snippet,
        F.lit('</a> <a href="/rel">Skip Me</a></body></html>'),
    )
    pages = d.select(
        F.concat(F.lit("http://d"), F.col("doc_id").cast("string")).alias("url"),
        F.encode(html, "UTF-8").alias("html"),
    )
    return anchor_term_counts(pages)


def _text_anchors_oracle_sql() -> str:
    """Mirrors the synthesis, then tokenizes the snippet the way the
    extraction+normalized_text chain does (whitespace-only cleaning on
    a [a-zA-Z0-9 ] snippet reduces to lower+trim+split)."""
    return """
WITH d AS (
  SELECT 'http://site' || CAST((doc_id + 1) % 7 AS VARCHAR)
           || '.test/p/' || CAST((doc_id * 13 + 1) % 997 AS VARCHAR) AS dst_url,
         regexp_replace(substr(coalesce(text, ''), 1, 40),
                        '[^a-zA-Z0-9 ]', ' ', 'g') AS snippet
  FROM documents
),
toks AS (
  SELECT d.dst_url, t.term
  FROM d, LATERAL unnest(string_split_regex(trim(lower(d.snippet)), ' +')) AS t(term)
  WHERE trim(d.snippet) <> '' AND t.term <> ''
)
SELECT dst_url, term, count(*)::BIGINT AS n FROM toks GROUP BY dst_url, term
UNION ALL
SELECT '/rel', 'skip', count(*)::BIGINT FROM documents
UNION ALL
SELECT '/rel', 'me', count(*)::BIGINT FROM documents
"""


def q_graph_pr_warm(spark, sf_dir):
    """Warm-start (incremental-crawl) PageRank through the REAL
    operator: the previous crawl's rank vector — synthesized here as a
    closed-form positive vector over the OLD graph's vertex set —
    seeds the iteration on the NEW snapshot (the l_suppkey graph of
    graph_diff). Exercises the full init_ranks path: partial vertex
    overlap (new pages fall back to their teleport weight), vector
    renormalization, then WARM_PR_ITERS exact update steps. The oracle
    unrolls the identical arithmetic."""
    from efficient_graph_algorithms_spark.operators.pagerank import pagerank

    li = _t(spark, sf_dir, "lineitem")
    e_new = (
        li.select(
            (F.col("l_orderkey") % GRAPH_V).cast("long").alias("src"),
            (F.col("l_suppkey") % GRAPH_V).cast("long").alias("dst"),
        )
        .where(F.col("src") != F.col("dst"))
        .distinct()
    )
    warm = _vertices(_graph_edges(spark, sf_dir)).select(
        "id", (((F.col("id") * 37 + 11) % 97) / 97.0 + 0.01).alias("rank")
    )
    ranks, info = pagerank(
        spark,
        e_new,
        vertices=_vertices(e_new),
        alpha=PR_ALPHA,
        tol=0.0,  # never converges early: exactly WARM_PR_ITERS steps
        max_iter=WARM_PR_ITERS,
        init_ranks=warm,
    )
    assert info["warm_start"] and info["iterations"] == WARM_PR_ITERS
    return ranks.select("id", F.round("rank", 9).alias("rank"))


def _pr_warm_oracle_sql() -> str:
    """Same synthesis: warm vector over the old vertex set; on the new
    set, provided vertices get r/S and missing ones 1/n, all divided by
    (1+Pm) — the operator's scale-invariant normalization — then the
    standard unrolled damped update on the new snapshot's edges."""
    lines = [
        f"WITH e AS ({_E_NEW_SQL}),",
        "v AS (SELECT src AS id FROM e UNION SELECT dst FROM e),",
        "n AS (SELECT count(*)::DOUBLE AS n FROM v),",
        f"eold AS ({_E_SQL}),",
        "vold AS (SELECT src AS id FROM eold UNION SELECT dst FROM eold),",
        "w AS (SELECT id, ((id * 37 + 11) % 97) / 97.0 + 0.01 AS r FROM vold),",
        "raw AS (SELECT v.id, w.r FROM v LEFT JOIN w ON v.id = w.id),",
        "s AS (SELECT sum(coalesce(r, 0.0)) AS s,"
        " sum(CASE WHEN r IS NULL THEN 1.0 / (SELECT n FROM n) ELSE 0.0 END) AS pm"
        " FROM raw),",
        "r0 AS (SELECT id, coalesce(r / (SELECT s FROM s), 1.0 / (SELECT n FROM n))"
        " / (1.0 + (SELECT pm FROM s)) AS r FROM raw),",
        "deg AS (SELECT src, count(*)::DOUBLE AS d FROM e GROUP BY src),",
    ]
    for i in range(1, WARM_PR_ITERS + 1):
        p = i - 1
        lines += [
            f"dm{i} AS (SELECT coalesce(sum(r.r), 0.0) AS m FROM r{p} r "
            f"LEFT JOIN deg ON r.id = deg.src WHERE deg.src IS NULL),",
            f"c{i} AS (SELECT e.dst AS id, sum(r.r / deg.d) AS c FROM e "
            f"JOIN deg ON e.src = deg.src JOIN r{p} r ON e.src = r.id GROUP BY e.dst),",
            f"r{i} AS (SELECT v.id, {1.0 - PR_ALPHA}/(SELECT n FROM n) "
            f"+ {PR_ALPHA}*(coalesce(c.c, 0.0) + (SELECT m FROM dm{i})/(SELECT n FROM n)) AS r "
            f"FROM v LEFT JOIN c{i} c ON v.id = c.id),",
        ]
    lines.append(f"fin AS (SELECT id, round(r, 9) AS rank FROM r{WARM_PR_ITERS})")
    return "\n".join(lines) + "\nSELECT id, rank FROM fin"


CMS_DEPTH = 3
CMS_WIDTH = 512
CMS_MIN_COUNT = 50


def q_text_cms(spark, sf_dir):
    """Count-min sketch heavy hitters over the documents corpus: the
    full two-pass plan (build d×w sketch → sketch-filter distinct
    terms → exact counts for survivors). The sketch hash family is the
    portable 60-bit md5, so every counter — and therefore every
    estimate — is reproduced bit-exactly by the SQL oracle; the
    (estimate >= exact) CMS invariant is hash-checked row by row."""
    from efficient_graph_algorithms_spark.operators.cms import (
        cms_build,
        cms_heavy_hitters,
    )

    d = _t(spark, sf_dir, "documents")
    sketch = cms_build(d, depth=CMS_DEPTH, width=CMS_WIDTH)
    return cms_heavy_hitters(d, sketch, CMS_MIN_COUNT, width=CMS_WIDTH)


def _text_cms_oracle_sql() -> str:
    from efficient_graph_algorithms_spark.operators.cms import (
        duck_cms_bucket,
        duck_corpus_terms,
    )

    occ = duck_corpus_terms("documents")
    depths = f"(SELECT unnest(generate_series(0, {CMS_DEPTH - 1})) AS d)"
    return f"""
WITH occ AS ({occ}),
fan AS (SELECT occ.term, dd.d,
               {duck_cms_bucket('occ.term', 'dd.d', CMS_WIDTH)} AS bucket
        FROM occ CROSS JOIN {depths} dd),
sk AS (SELECT d, bucket, count(*)::BIGINT AS cnt FROM fan GROUP BY d, bucket),
exact AS (SELECT term, count(*)::BIGINT AS exact FROM occ GROUP BY term),
probe AS (SELECT e.term, dd.d,
                 {duck_cms_bucket('e.term', 'dd.d', CMS_WIDTH)} AS bucket
          FROM exact e CROSS JOIN {depths} dd),
est AS (SELECT p.term, min(sk.cnt) AS estimate
        FROM probe p JOIN sk USING (d, bucket) GROUP BY p.term)
SELECT est.term, est.estimate, exact.exact
FROM est JOIN exact USING (term)
WHERE est.estimate >= {CMS_MIN_COUNT}
"""


HASHVEC_DIM = 256


def q_text_hashvec(spark, sf_dir):
    """Feature-hashing (hashing-trick) vectorizer: every sparse COO
    entry of the signed dim-256 hashed term-count vectors over the
    documents corpus, bit-exact vs the SQL oracle (portable-md5 bucket
    and sign hashes)."""
    from efficient_graph_algorithms_spark.operators.hashvec import hashed_features

    return hashed_features(_t(spark, sf_dir, "documents"), dim=HASHVEC_DIM)


def _text_hashvec_oracle_sql() -> str:
    from efficient_graph_algorithms_spark.operators.hashvec import (
        duck_hashed_features,
    )

    return duck_hashed_features("documents", dim=HASHVEC_DIM)


FRONTIER_SHARDS = 7


def q_graph_frontier(spark, sf_dir):
    """Crawl-frontier politeness sharding through the REAL url-parsing
    path: vertices get synthetic urls with a skewed host distribution
    (ids < 1000 spread over 50 hosts, ids >= 1000 concentrated on 10 —
    so the size-desc ranking is genuinely exercised, not just the
    tie-break), Spark parses the host back out with try_parse_url,
    ranks, and deals the serpentine; the oracle reproduces host, rank
    and shard arithmetically."""
    from efficient_graph_algorithms_spark.operators.frontier import frontier_shards

    e = _graph_edges(spark, sf_dir)
    hostk = F.when(F.col("id") < 1000, F.col("id") % 50).otherwise(
        F.col("id") % 10
    )
    url_dict = _vertices(e).select(
        F.concat(
            F.lit("https://host-"),
            hostk.cast("string"),
            F.lit(".example/p/"),
            F.col("id").cast("string"),
        ).alias("url")
    )
    return frontier_shards(url_dict, FRONTIER_SHARDS)


def _frontier_oracle_sql() -> str:
    s = FRONTIER_SHARDS
    return f"""
WITH e AS ({_E_SQL}),
v AS ({_V_SQL}),
h AS (SELECT 'host-' || CAST(CASE WHEN id < 1000 THEN id % 50 ELSE id % 10 END
              AS VARCHAR) || '.example' AS host
      FROM v),
loads AS (SELECT host, count(*)::BIGINT AS n_pages FROM h GROUP BY host),
ranked AS (SELECT host, n_pages,
                  row_number() OVER (ORDER BY n_pages DESC, host ASC) - 1 AS rank
           FROM loads)
SELECT host, n_pages, rank,
       CASE WHEN (rank // {s}) % 2 = 0 THEN rank % {s}
            ELSE {s} - 1 - (rank % {s}) END::INTEGER AS shard
FROM ranked
"""


BLOOM_M = 4096
BLOOM_K = 3


def q_graph_bloom_seen(spark, sf_dir):
    """Crawl-dedup Bloom filter: build the filter over the OLD
    snapshot's vertex urls, probe with the NEW snapshot's (the
    graph_diff pairing) — 'have we crawled this url already'. The
    4096-bit filter is deliberately tight, and only a third of the old
    urls (id % 3 == 0) enter it, so all three verdict classes occur —
    true members, true negatives, AND hash-collision false positives —
    and every per-url verdict is hash-checked against the oracle's
    bit-set reconstruction."""
    from efficient_graph_algorithms_spark.operators.bloom import (
        bloom_build,
        bloom_contains,
    )

    li = _t(spark, sf_dir, "lineitem")
    e_new = (
        li.select(
            (F.col("l_orderkey") % GRAPH_V).cast("long").alias("src"),
            (F.col("l_suppkey") % GRAPH_V).cast("long").alias("dst"),
        )
        .where(F.col("src") != F.col("dst"))
        .distinct()
    )
    url = lambda df: df.select(
        F.concat(F.lit("https://p/"), F.col("id").cast("string")).alias("key")
    )
    bloom = bloom_build(
        url(_vertices(_graph_edges(spark, sf_dir)).where(F.col("id") % 3 == 0)),
        m_bits=BLOOM_M,
        n_hashes=BLOOM_K,
    )
    return bloom_contains(
        url(_vertices(e_new)), bloom, m_bits=BLOOM_M, n_hashes=BLOOM_K
    )


def _bloom_seen_oracle_sql() -> str:
    from efficient_graph_algorithms_spark.operators.bloom import (
        duck_bloom_positions,
    )

    pos = duck_bloom_positions("key", BLOOM_K, BLOOM_M)
    return f"""
WITH eold AS ({_E_SQL}),
vold AS (SELECT id FROM (SELECT src AS id FROM eold UNION SELECT dst FROM eold)
         WHERE id % 3 = 0),
e AS ({_E_NEW_SQL}),
vnew AS ({_V_SQL}),
bits AS (SELECT DISTINCT p.pos
         FROM (SELECT 'https://p/' || CAST(id AS VARCHAR) AS key FROM vold) k,
              LATERAL unnest({pos}) AS p(pos)),
probe AS (SELECT k.key, p.pos
          FROM (SELECT 'https://p/' || CAST(id AS VARCHAR) AS key FROM vnew) k,
               LATERAL unnest({pos}) AS p(pos))
SELECT probe.key,
       (count(bits.pos) = {BLOOM_K}) AS maybe_member
FROM probe LEFT JOIN bits ON probe.pos = bits.pos
GROUP BY probe.key
"""


SSSP_SQL_ROUNDS = 2
SSSP_SRC_MOD = 400


def q_graph_sssp2(spark, sf_dir):
    """Weighted multi-source SSSP, 2 exact Bellman-Ford relaxation
    rounds through the real operator (bounded-hop contract: after r
    rounds the state is exactly min-cost-over-<=r-edge paths, so the
    oracle unrolls the identical arithmetic). Deterministic integer
    weights w = 1 + (src+dst) % 5; sources = ids % 400 == 0."""
    import warnings as _w

    from efficient_graph_algorithms_spark.operators.sssp import shortest_paths

    e = _graph_edges(spark, sf_dir).select(
        "src", "dst", (1 + (F.col("src") + F.col("dst")) % 5).cast("double").alias("w")
    )
    sources = _vertices(_graph_edges(spark, sf_dir)).where(
        F.col("id") % SSSP_SRC_MOD == 0
    )
    with _w.catch_warnings():
        _w.simplefilter("ignore", UserWarning)  # expected max_iter stop
        dist, info = shortest_paths(spark, e, sources, max_iter=SSSP_SQL_ROUNDS)
    assert info["rounds"] == SSSP_SQL_ROUNDS
    return dist.select("id", "dist")


def _sssp_oracle_sql() -> str:
    inf = "1e308"
    lines = [
        f"WITH e AS ({_E_SQL}),",
        f"w AS (SELECT src, dst, (1 + (src + dst) % 5)::DOUBLE AS w FROM e),",
        f"v AS ({_V_SQL}),",
        f"d0 AS (SELECT id, 0.0::DOUBLE AS dist FROM v WHERE id % {SSSP_SRC_MOD} = 0),",
    ]
    for i in range(1, SSSP_SQL_ROUNDS + 1):
        p = i - 1
        lines += [
            f"c{i} AS (SELECT w.dst AS id, min(d{p}.dist + w.w) AS c "
            f"FROM w JOIN d{p} ON w.src = d{p}.id GROUP BY w.dst),",
            f"d{i} AS (SELECT coalesce(d{p}.id, c{i}.id) AS id, "
            f"least(coalesce(d{p}.dist, {inf}), coalesce(c{i}.c, {inf})) AS dist "
            f"FROM d{p} FULL JOIN c{i} ON d{p}.id = c{i}.id),",
        ]
    lines.append(f"fin AS (SELECT id, dist FROM d{SSSP_SQL_ROUNDS})")
    return "\n".join(lines) + "\nSELECT id, dist FROM fin"


REDIR_ROUNDS = 4  # 2^4 = 16 >= the max chain length 8 of the derived map
REDIR_KEY_MOD = 3  # 3 is coprime to GRAPH_V, so the affine target map
# (13*id + 6) % GRAPH_V does NOT preserve id % 3 — targets land back in
# the key set ~1/3 of the time and chains of up to 8 hops form
# (measured on the fixed sf0.01 derived graph; a modulus dividing
# GRAPH_V would make every chain length exactly 1).


def q_graph_redirects(spark, sf_dir):
    """Redirect-chain resolution (url canonicalization) by pointer
    doubling through the real operator: redirect sources are derived
    vertices with id % 3 == 1, target = (13*id + 6) % GRAPH_V; after
    REDIR_ROUNDS doubling rounds every chain (max measured length 8)
    is resolved to its terminal with exact hop count. The oracle
    unrolls the identical doubling arithmetic — the fixed-round state
    is deterministic even for cycles (none in this map; the cycle path
    is pytest-covered)."""
    from efficient_graph_algorithms_spark.operators.redirects import (
        resolve_redirects,
    )

    v = _vertices(_graph_edges(spark, sf_dir))
    red = v.where(F.col("id") % REDIR_KEY_MOD == 1).select(
        "id", ((F.col("id") * 13 + 6) % GRAPH_V).alias("target")
    )
    out, info = resolve_redirects(spark, red, rounds=REDIR_ROUNDS)
    assert info["n_unresolved"] == 0, info
    return out.select("id", "terminal", "hops", "resolved")


def _redirects_oracle_sql() -> str:
    lines = [
        f"WITH e AS ({_E_SQL}),",
        f"v AS ({_V_SQL}),",
        f"r AS (SELECT id, (id * 13 + 6) % {GRAPH_V} AS target FROM v "
        f"WHERE id % {REDIR_KEY_MOD} = 1),",
        "s0 AS (SELECT r.id, r.target AS ptr, CAST(1 AS BIGINT) AS hops, "
        "CASE WHEN t.id IS NULL THEN 1 ELSE 0 END AS done "
        "FROM r LEFT JOIN r t ON r.target = t.id),",
    ]
    for i in range(1, REDIR_ROUNDS + 1):
        p = i - 1
        lines.append(
            f"s{i} AS (SELECT s.id, "
            "CASE WHEN s.done = 1 THEN s.ptr ELSE t.ptr END AS ptr, "
            "CASE WHEN s.done = 1 THEN s.hops ELSE s.hops + t.hops END AS hops, "
            "CASE WHEN s.done = 1 THEN 1 ELSE t.done END AS done "
            f"FROM s{p} s LEFT JOIN s{p} t ON s.ptr = t.id),"
        )
    lines[-1] = lines[-1].rstrip(",")
    return (
        "\n".join(lines)
        + f"\nSELECT id, ptr AS terminal, hops, CAST(done AS INT) AS resolved "
        f"FROM s{REDIR_ROUNDS}"
    )


def q_text_robots(spark, sf_dir):
    """robots.txt crawl-permission verdicts through the REAL parser +
    matcher, oracled by a closed form: host h (= id % 50) publishes
    'Disallow: /pDD' / 'Allow: /pDD/ok' for DD = h % 13 zero-padded,
    plus 'Disallow: /*.bin$' on h % 5 == 0 hosts; url id gets path
    /pXX for XX = id % 17, suffixed /ok on id % 3 == 0 else .bin on
    id % 7 == 1. Longest-match + allow-wins-tie then reduce to pure
    arithmetic on id (the image_dhash planted-closed-form pattern):
    /ok rows always allowed; .bin rows blocked on wildcard hosts or
    digit-equal; bare rows blocked iff digit-equal."""
    from efficient_graph_algorithms_spark.operators.robots import (
        parse_robots,
        robots_filter,
    )

    v = _vertices(_graph_edges(spark, sf_dir))
    dd = F.lpad((F.col("h") % 13).cast("string"), 2, "0")
    robots = (
        v.select((F.col("id") % 50).alias("h"))
        .distinct()
        .select(
            F.concat(F.lit("h"), F.col("h").cast("string")).alias("host"),
            F.concat(
                F.lit("User-agent: *\nDisallow: /p"), dd,
                F.lit("\nAllow: /p"), dd, F.lit("/ok"),
                F.when(F.col("h") % 5 == 0, F.lit("\nDisallow: /*.bin$"))
                .otherwise(F.lit("")),
            ).alias("robots_txt"),
        )
    )
    urls = v.select(
        F.col("id").cast("string").alias("url"),
        F.concat(F.lit("h"), (F.col("id") % 50).cast("string")).alias("host"),
        F.concat(
            F.lit("/p"),
            F.lpad((F.col("id") % 17).cast("string"), 2, "0"),
            F.when(F.col("id") % 3 == 0, F.lit("/ok"))
            .when(F.col("id") % 7 == 1, F.lit(".bin"))
            .otherwise(F.lit("")),
        ).alias("path"),
    )
    out = robots_filter(urls, parse_robots(robots, user_agent="egabot"))
    return out.select("url", "host", "path", "allowed")


_ROBOTS_ORACLE_SQL = f"""
WITH e AS ({_E_SQL}),
v AS ({_V_SQL}),
u AS (SELECT id, id % 50 AS h, id % 17 AS x,
  '/p' || lpad(CAST(id % 17 AS VARCHAR), 2, '0') ||
  CASE WHEN id % 3 = 0 THEN '/ok'
       WHEN id % 7 = 1 THEN '.bin' ELSE '' END AS path
 FROM v)
SELECT CAST(id AS VARCHAR) AS url,
 'h' || CAST(h AS VARCHAR) AS host, path,
 CAST(CASE WHEN id % 3 = 0 THEN 1
      WHEN id % 7 = 1 THEN
        CASE WHEN h % 5 = 0 OR x = h % 13 THEN 0 ELSE 1 END
      ELSE CASE WHEN x = h % 13 THEN 0 ELSE 1 END END AS INT) AS allowed
FROM u
"""


def q_text_sitemaps(spark, sf_dir):
    """Sitemap XML parsing through the REAL regex operator over
    deterministically synthesized bodies: h % 4 == 0 hosts publish a
    2-child <sitemapindex>, the rest a <urlset> with 1 + h % 3 page
    entries (even-indexed ones carrying <lastmod>) plus an
    entity-escaped query url on h % 5 == 1 hosts. The oracle emits
    the same rows by pure arithmetic — incl. the &amp;→& unescape."""
    from efficient_graph_algorithms_spark.operators.sitemaps import (
        parse_sitemaps,
    )

    v = _vertices(_graph_edges(spark, sf_dir))
    hosts = v.select((F.col("id") % 50).alias("h")).distinct()
    h = F.col("h")
    hn = h.cast("string")
    lm = F.concat(F.lit("2026-03-"), F.lpad((h % 28 + 1).cast("string"), 2, "0"))

    def url_entry(j):
        mod = (
            F.concat(F.lit("<lastmod>"), lm, F.lit("</lastmod>"))
            if j % 2 == 0
            else F.lit("")
        )
        return F.concat(
            F.lit("<url><loc>https://h"), hn, F.lit(f"/p{j}</loc>"),
            mod, F.lit("</url>"),
        )

    urlset = F.concat(
        F.lit("<urlset>"),
        url_entry(0),
        F.when(h % 3 >= 1, url_entry(1)).otherwise(F.lit("")),
        F.when(h % 3 >= 2, url_entry(2)).otherwise(F.lit("")),
        F.when(
            h % 5 == 1,
            F.concat(
                F.lit("<url><loc>https://h"), hn,
                F.lit("/q?a=1&amp;b=2</loc></url>"),
            ),
        ).otherwise(F.lit("")),
        F.lit("</urlset>"),
    )
    index = F.concat(
        F.lit("<sitemapindex><sitemap><loc>https://h"), hn,
        F.lit("/s0.xml</loc></sitemap><sitemap><loc>https://h"), hn,
        F.lit("/s1.xml</loc></sitemap></sitemapindex>"),
    )
    bodies = hosts.select(
        F.concat(F.lit("h"), hn).alias("host"),
        F.when(h % 4 == 0, index).otherwise(urlset).alias("sitemap_xml"),
    )
    return parse_sitemaps(bodies).select("host", "kind", "url", "lastmod")


_SITEMAPS_ORACLE_SQL = f"""
WITH e AS ({_E_SQL}),
v AS ({_V_SQL}),
hs AS (SELECT DISTINCT id % 50 AS h FROM v)
SELECT 'h' || CAST(h AS VARCHAR) AS host, 'url' AS kind,
  'https://h' || CAST(h AS VARCHAR) || '/p' || CAST(j AS VARCHAR) AS url,
  CASE WHEN j % 2 = 0
       THEN '2026-03-' || lpad(CAST(h % 28 + 1 AS VARCHAR), 2, '0')
  END AS lastmod
FROM hs, range(0, 3) t(j) WHERE h % 4 <> 0 AND j <= h % 3
UNION ALL
SELECT 'h' || CAST(h AS VARCHAR), 'url',
  'https://h' || CAST(h AS VARCHAR) || '/q?a=1&b=2', NULL
FROM hs WHERE h % 4 <> 0 AND h % 5 = 1
UNION ALL
SELECT 'h' || CAST(h AS VARCHAR), 'sitemap',
  'https://h' || CAST(h AS VARCHAR) || '/s' || CAST(j AS VARCHAR) || '.xml',
  NULL
FROM hs, range(0, 2) t(j) WHERE h % 4 = 0
"""


def q_image_dhash(spark, sf_dir):
    """REAL BMP decode → perceptual dHash, hash-verified via a closed
    form: doc_id % 4 == 1 rows carry an 18×16 step-gradient BMP
    (bright for x < 2m, dark after, m = 1 + doc_id % 7). Every cell
    row sees exactly one bright→dark cell boundary at column m−1, so
    dhash = 2^(m−1) · 0x0101010101010101 — pure arithmetic on doc_id
    for the oracle while Spark actually decodes the bytes and averages
    the 9×8 cell grid."""
    from efficient_graph_algorithms_spark.operators.imagehash import image_dhashes

    d = _t(spark, sf_dir, "documents").where(F.col("doc_id") % 4 == 1)

    def gen(batches):
        import numpy as np
        import pandas as pd

        from efficient_graph_algorithms_spark.operators.multimodal import (
            encode_bmp24,
        )

        for b in batches:
            rows = []
            for did in b["doc_id"]:
                did = int(did)
                m = 1 + did % 7
                img = np.zeros((16, 18, 3), dtype=np.uint8)
                img[:, : 2 * m, :] = 255
                rows.append((did, "image", encode_bmp24(img)))
            yield pd.DataFrame(rows, columns=["media_id", "kind", "payload"])

    media = d.select("doc_id").mapInPandas(
        gen, "media_id long, kind string, payload binary"
    )
    return image_dhashes(media)


def _image_dhash_oracle_sql() -> str:
    # 0x0101010101010101: one set bit per 8-bit row stripe
    return """
SELECT doc_id AS media_id,
       (CAST(1 AS BIGINT) << (doc_id % 7)) * 72340172838076673 AS dhash
FROM documents WHERE doc_id % 4 = 1
"""


def q_audio_afp(spark, sf_dir):
    """REAL WAV decode → FFT band energies → Haitsma-Kalker clip
    fingerprint, verified via a closed form: doc_id % 4 == 2 rows carry
    a 9-frame chirp stepping its exact-bin sine through band schedule
    s_t = (doc_id + 3t) % 9. With a +3 step no band pair ever
    interacts, so bit(t,b) = 1 iff b == s_t (band gains the energy) or
    b == s_{t-1} - 1 (pair below the band that lost it) — pure
    arithmetic on doc_id for the oracle while Spark actually parses
    the RIFF bytes and runs the rfft."""
    from efficient_graph_algorithms_spark.operators.audiohash import audio_afps

    d = _t(spark, sf_dir, "documents").where(F.col("doc_id") % 4 == 2)

    def gen(batches):
        import numpy as np
        import pandas as pd

        from efficient_graph_algorithms_spark.operators.audiohash import (
            AFP_BANDS,
            AFP_FRAME,
            AFP_FRAMES,
        )
        from efficient_graph_algorithms_spark.operators.multimodal import (
            encode_wav_pcm16,
        )

        per = (AFP_FRAME // 2) // AFP_BANDS
        i = np.arange(AFP_FRAME)
        for b in batches:
            rows = []
            for did in b["doc_id"]:
                did = int(did)
                sched = [(did + 3 * t) % AFP_BANDS for t in range(AFP_FRAMES)]
                x = np.concatenate(
                    [
                        0.5 * np.sin(2 * np.pi * (1 + s * per + per // 2) * i / AFP_FRAME)
                        for s in sched
                    ]
                )
                rows.append((did, "audio", encode_wav_pcm16(x, 16000)))
            yield pd.DataFrame(rows, columns=["media_id", "kind", "payload"])

    media = d.select("doc_id").mapInPandas(
        gen, "media_id long, kind string, payload binary"
    )
    return audio_afps(media)


def _audio_afp_oracle_sql() -> str:
    return """
WITH f AS (
  SELECT doc_id, g.t,
         (doc_id + 3 * g.t) % 9 AS s_t,
         (doc_id + 3 * (g.t - 1)) % 9 AS s_p
  FROM documents, LATERAL unnest(generate_series(1, 8)) AS g(t)
  WHERE doc_id % 4 = 2
),
raw AS (
  SELECT doc_id,
         sum(CASE WHEN s_t <= 7 THEN (1::HUGEINT << (8 * (t - 1) + s_t))
                  ELSE 0::HUGEINT END
           + CASE WHEN s_p >= 1 THEN (1::HUGEINT << (8 * (t - 1) + s_p - 1))
                  ELSE 0::HUGEINT END) AS v
  FROM f GROUP BY doc_id
)
SELECT doc_id AS media_id,
       (CASE WHEN v >= (1::HUGEINT << 63) THEN v - (1::HUGEINT << 64)
             ELSE v END)::BIGINT AS afp
FROM raw
"""


def q_video_dhash(spark, sf_dir):
    """REAL Y4M decode → per-sampled-frame perceptual dHash: doc_id %
    4 == 3 rows carry a 6-frame step-gradient video (frame f bright
    for x < 2m, m = 1 + (doc_id + f) % 7); sampling every_n=2 keeps
    frames 0/2/4, each hashing to the image_dhash closed form
    2^((doc_id+f)%7) · 0x0101010101010101."""
    from efficient_graph_algorithms_spark.operators.imagehash import (
        video_frame_dhashes,
    )

    d = _t(spark, sf_dir, "documents").where(F.col("doc_id") % 4 == 3)

    def gen(batches):
        import numpy as np
        import pandas as pd

        from efficient_graph_algorithms_spark.operators.multimodal import (
            encode_y4m,
        )

        for b in batches:
            rows = []
            for did in b["doc_id"]:
                did = int(did)
                frames = np.zeros((6, 16, 18), dtype=np.uint8)
                for f in range(6):
                    frames[f, :, : 2 * (1 + (did + f) % 7)] = 255
                rows.append((did, "video", encode_y4m(frames)))
            yield pd.DataFrame(rows, columns=["media_id", "kind", "payload"])

    media = d.select("doc_id").mapInPandas(
        gen, "media_id long, kind string, payload binary"
    )
    return video_frame_dhashes(media, every_n=2)


def _video_dhash_oracle_sql() -> str:
    return """
SELECT doc_id AS media_id, g.f AS frame_idx,
       (CAST(1 AS BIGINT) << ((doc_id + g.f) % 7)) * 72340172838076673 AS dhash
FROM documents, LATERAL unnest([0, 2, 4]) AS g(f)
WHERE doc_id % 4 = 3
"""


def q_graph_modularity(spark, sf_dir):
    """Leicht-Newman directed modularity of the synthetic host
    partition (id % HOST_MOD — the same deterministic partition the
    host-graph contraction query uses), decomposed per community so
    every per-community stub count and contribution is hash-checked,
    not just the scalar Q."""
    from efficient_graph_algorithms_spark.operators.modularity import (
        community_contributions,
    )

    e = _graph_edges(spark, sf_dir)
    assignment = _vertices(e).select(
        "id", (F.col("id") % HOST_MOD).cast("string").alias("community")
    )
    return community_contributions(e, assignment)


def _modularity_oracle_sql() -> str:
    return f"""
WITH e AS ({_E_SQL}),
v AS ({_V_SQL}),
a AS (SELECT id, CAST(id % {HOST_MOD} AS VARCHAR) AS c FROM v),
e2 AS (SELECT sa.c AS cs, da.c AS cd
       FROM e JOIN a sa ON e.src = sa.id JOIN a da ON e.dst = da.id),
m AS (SELECT count(*)::DOUBLE AS m FROM e2),
douts AS (SELECT cs AS community, count(*)::BIGINT AS dout,
                 sum(CASE WHEN cs = cd THEN 1 ELSE 0 END)::BIGINT AS internal_edges
          FROM e2 GROUP BY cs),
dins AS (SELECT cd AS community, count(*)::BIGINT AS din FROM e2 GROUP BY cd)
SELECT coalesce(douts.community, dins.community) AS community,
       coalesce(internal_edges, 0) AS internal_edges,
       coalesce(dout, 0) AS dout,
       coalesce(din, 0) AS din,
       round(coalesce(internal_edges, 0) / (SELECT m FROM m)
             - (coalesce(dout, 0) * coalesce(din, 0))
               / ((SELECT m FROM m) * (SELECT m FROM m)), 9) AS contribution
FROM douts FULL JOIN dins ON douts.community = dins.community
"""


def q_graph_diff(spark, sf_dir):
    """Crawl-snapshot diff (the Common Crawl monthly-delta question):
    per-vertex added/removed in/out edge counts between the standard
    lineitem part-edge graph and a second synthetic snapshot built
    from l_suppkey — same CTEs in both engines."""
    from efficient_graph_algorithms_spark.operators.snapshot import snapshot_diff

    li = _t(spark, sf_dir, "lineitem")
    new = (
        li.select(
            (F.col("l_orderkey") % GRAPH_V).cast("long").alias("src"),
            (F.col("l_suppkey") % GRAPH_V).cast("long").alias("dst"),
        )
        .where(F.col("src") != F.col("dst"))
        .distinct()
    )
    _, vertex_diff = snapshot_diff(_graph_edges(spark, sf_dir), new)
    return vertex_diff


_E_NEW_SQL = (
    f"SELECT DISTINCT CAST(l_orderkey % {GRAPH_V} AS BIGINT) AS src, "
    f"CAST(l_suppkey % {GRAPH_V} AS BIGINT) AS dst FROM lineitem "
    f"WHERE l_orderkey % {GRAPH_V} <> l_suppkey % {GRAPH_V}"
)


def _graph_diff_oracle_sql() -> str:
    """Set-difference edge deltas folded into one per-vertex aggregate."""
    return f"""
WITH old AS ({_E_SQL}),
new AS ({_E_NEW_SQL}),
added AS (SELECT n.src, n.dst FROM new n LEFT JOIN old o
          ON o.src = n.src AND o.dst = n.dst WHERE o.src IS NULL),
removed AS (SELECT o.src, o.dst FROM old o LEFT JOIN new n
            ON n.src = o.src AND n.dst = o.dst WHERE n.src IS NULL),
contrib AS (
  SELECT src AS id, 1 AS oa, 0 AS orr, 0 AS ia, 0 AS ir FROM added
  UNION ALL SELECT dst, 0, 0, 1, 0 FROM added
  UNION ALL SELECT src, 0, 1, 0, 0 FROM removed
  UNION ALL SELECT dst, 0, 0, 0, 1 FROM removed)
SELECT id, sum(oa)::BIGINT AS out_added, sum(orr)::BIGINT AS out_removed,
       sum(ia)::BIGINT AS in_added, sum(ir)::BIGINT AS in_removed
FROM contrib GROUP BY id
"""


def q_graph_powerlaw(spark, sf_dir):
    """Degree-distribution power-law exponent (Hill / CSN continuous
    MLE) of the undirected simple graph at xmin=2 — the web-crawl
    characterization number next to the Broder bowtie."""
    from efficient_graph_algorithms_spark.operators.webstats import (
        degree_powerlaw,
    )

    return degree_powerlaw(_graph_edges(spark, sf_dir), xmin=2)


def _powerlaw_oracle_sql() -> str:
    """Same tail filter and MLE arithmetic; zero log-sum (degree-
    constant tail) and empty tail both yield NULL alpha, as the
    operator's try_divide does."""
    return f"""
WITH e AS ({_E_SQL}),
und AS ({_UND_SQL}),
adj AS (SELECT lo AS id FROM und UNION ALL SELECT hi FROM und),
deg AS (SELECT id, count(*) AS deg FROM adj GROUP BY id),
tail AS (SELECT deg FROM deg WHERE deg >= 2)
SELECT CAST(2 AS BIGINT) AS xmin, count(*)::BIGINT AS n_tail,
       round(1.0 + CASE WHEN sum(ln(deg / 2.0)) > 0
                        THEN count(*)::DOUBLE / sum(ln(deg / 2.0)) END,
             6) AS alpha
FROM tail
"""


def q_graph_harmonic2(spark, sf_dir):
    """Truncated harmonic centrality (Boldi–Vigna 2014's preferred
    centrality for web graphs) from the graph_anf2/closeness2 sampled
    sources at radius 2: exact sum of 1/d over the truncated ball —
    the exact face of the sketch-mode harmonic estimate."""
    from efficient_graph_algorithms_spark.operators.anf import truncated_closeness

    e = _graph_edges(spark, sf_dir)
    seeds = _vertices(e).where(F.col("id") % ANF_SEED_MOD == 0)
    res, _ = truncated_closeness(
        spark, e, max_radius=ANF_SQL_RADIUS, sources=seeds, with_harmonic=True
    )
    return res.select("id", "n_reached", "harmonic")


def _harmonic2_oracle_sql() -> str:
    """Same 2-hop first-hit sets as the closeness2 oracle; harmonic =
    n1/1 + n2/2 (exact binary halves, so round-6 parity is exact)."""
    return f"""
WITH e AS ({_E_SQL}),
sym AS (SELECT src, dst FROM e UNION SELECT dst AS src, src AS dst FROM e),
seeds AS (SELECT DISTINCT src AS id FROM sym WHERE src % {ANF_SEED_MOD} = 0),
d1 AS (SELECT DISTINCT s.id, y.dst AS m FROM seeds s JOIN sym y ON y.src = s.id
       WHERE y.dst <> s.id),
d2 AS (SELECT DISTINCT d.id, y.dst AS m FROM d1 d JOIN sym y ON y.src = d.m
       WHERE y.dst <> d.id
       AND NOT EXISTS (SELECT 1 FROM d1 p WHERE p.id = d.id AND p.m = y.dst)),
cnt AS (SELECT s.id,
        (SELECT count(*) FROM d1 WHERE d1.id = s.id) AS n1,
        (SELECT count(*) FROM d2 WHERE d2.id = s.id) AS n2
        FROM seeds s)
SELECT id, (n1 + n2)::BIGINT AS n_reached,
       round(n1 + 0.5 * n2, 6) AS harmonic
FROM cnt
"""


def q_graph_mis2(spark, sf_dir):
    """Luby/greedy-permutation maximal independent set, 2 synchronous
    rounds (the kcore3 fixed-unroll pattern): per-vertex class
    ('mis'/'out'/'live') + decision round, priorities = the portable
    60-bit md5 hash so the SQL oracle reproduces them bit-exactly."""
    import warnings as _w

    from efficient_graph_algorithms_spark.operators.mis import (
        maximal_independent_set,
    )

    with _w.catch_warnings():
        _w.simplefilter("ignore")  # 2 rounds is a deliberate partial run
        out, _ = maximal_independent_set(
            spark, _graph_edges(spark, sf_dir), max_rounds=2
        )
    return out


def _mis2_oracle_sql() -> str:
    """Two unrolled Luby rounds; (p, id) struct minima mirror the
    operator's total order, DuckDB struct comparison is lexicographic
    like Spark's."""
    pr_expr = "('0x' || substr(md5('mis:' || CAST(id AS VARCHAR)), 1, 15))::BIGINT"
    return f"""
WITH e AS ({_E_SQL}),
sym AS (SELECT DISTINCT src, dst FROM
        (SELECT src, dst FROM e UNION ALL SELECT dst, src FROM e)
        WHERE src <> dst),
v AS (SELECT DISTINCT src AS id FROM sym),
pr AS (SELECT id, {pr_expr} AS p FROM v),
mn1 AS (SELECT s.src AS id, min(struct_pack(p := q.p, i := s.dst)) AS mn
        FROM sym s JOIN pr q ON q.id = s.dst GROUP BY s.src),
w1 AS (SELECT pr.id FROM pr LEFT JOIN mn1 USING (id)
       WHERE mn1.mn IS NULL OR struct_pack(p := pr.p, i := pr.id) < mn1.mn),
r1 AS (SELECT DISTINCT s.dst AS id FROM sym s
       WHERE s.src IN (SELECT id FROM w1)),
live1 AS (SELECT id FROM v WHERE id NOT IN (SELECT id FROM w1)
                             AND id NOT IN (SELECT id FROM r1)),
e1 AS (SELECT * FROM sym WHERE src IN (SELECT id FROM live1)
                           AND dst IN (SELECT id FROM live1)),
mn2 AS (SELECT s.src AS id, min(struct_pack(p := q.p, i := s.dst)) AS mn
        FROM e1 s JOIN pr q ON q.id = s.dst GROUP BY s.src),
w2 AS (SELECT l.id FROM live1 l JOIN pr USING (id) LEFT JOIN mn2 USING (id)
       WHERE mn2.mn IS NULL OR struct_pack(p := pr.p, i := l.id) < mn2.mn),
r2 AS (SELECT DISTINCT s.dst AS id FROM e1 s
       WHERE s.src IN (SELECT id FROM w2))
SELECT v.id,
       CASE WHEN v.id IN (SELECT id FROM w1) THEN 'mis'
            WHEN v.id IN (SELECT id FROM r1) THEN 'out'
            WHEN v.id IN (SELECT id FROM w2) THEN 'mis'
            WHEN v.id IN (SELECT id FROM r2) THEN 'out'
            ELSE 'live' END AS cls,
       CASE WHEN v.id IN (SELECT id FROM w1) OR v.id IN (SELECT id FROM r1)
            THEN 1
            WHEN v.id IN (SELECT id FROM w2) OR v.id IN (SELECT id FROM r2)
            THEN 2
            ELSE 0 END AS round
FROM v
"""


BM25_TERMS = ("join", "spark", "window")
BM25_K = 25


def q_text_bm25(spark, sf_dir):
    """Top-25 documents by BM25 score for a fixed 3-term keyword query
    (Robertson–Zaragoza / Lucene-default scoring; query-term pushdown
    at scan stage); total order (score desc, doc_id)."""
    from efficient_graph_algorithms_spark.operators.bm25 import bm25_topk

    return bm25_topk(
        _t(spark, sf_dir, "documents"), list(BM25_TERMS), k=BM25_K
    )


def q_text_nb_quality(spark, sf_dir):
    """Multinomial Naive Bayes quality scoring (the GPT-3-style corpus
    classifier face): train on doc_id < 250 with label = (lang = 'en'),
    score EVERY document; (doc_id, n_tokens, llr, pred)."""
    from efficient_graph_algorithms_spark.operators.classifier import nb_classify

    docs = _t(spark, sf_dir, "documents")
    labeled = docs.where(F.col("doc_id") < 250).select(
        "doc_id",
        "text",
        F.when(F.col("lang") == "en", F.lit(1)).otherwise(F.lit(0)).alias("label"),
    )
    return nb_classify(labeled, docs.select("doc_id", "text"))


_TOKENS_SQL = (
    "SELECT doc_id, unnest(string_split("
    "regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ')) AS w "
    "FROM documents"
)


def _bm25_oracle_sql() -> str:
    """Same scalar arithmetic and association order as the operator."""
    terms = ", ".join(f"('{t}')" for t in sorted(BM25_TERMS))
    return f"""
WITH tk AS (SELECT * FROM ({_TOKENS_SQL}) u WHERE w <> ''),
dl AS (SELECT d.doc_id, count(tk.w) AS dl
       FROM documents d LEFT JOIN tk ON tk.doc_id = d.doc_id
       GROUP BY d.doc_id),
st AS (SELECT count(*)::DOUBLE AS n_docs, avg(dl::DOUBLE) AS avgdl FROM dl),
q(w) AS (VALUES {terms}),
tf AS (SELECT doc_id, w, count(*) AS tf FROM tk
       WHERE w IN (SELECT w FROM q) GROUP BY doc_id, w),
dfq AS (SELECT w, count(*) AS df FROM tf GROUP BY w),
sc AS (SELECT tf.doc_id,
              ln(1.0 + (st.n_docs - dfq.df + 0.5) / (dfq.df + 0.5))
              * (tf.tf * (1.2 + 1.0))
              / (tf.tf + 1.2 * (1.0 - 0.75 + 0.75 * dl.dl / st.avgdl)) AS s
       FROM tf JOIN dfq USING (w) JOIN dl USING (doc_id) CROSS JOIN st)
SELECT doc_id, count(*) AS n_terms, round(sum(s), 6) AS score
FROM sc GROUP BY doc_id ORDER BY score DESC, doc_id LIMIT {BM25_K}
"""


def _nb_quality_oracle_sql() -> str:
    """Same add-1 multinomial NB arithmetic as the operator."""
    return f"""
WITH tk AS (SELECT * FROM ({_TOKENS_SQL}) u WHERE w <> ''),
lab AS (SELECT doc_id, CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y
        FROM documents WHERE doc_id < 250),
ttk AS (SELECT tk.doc_id, tk.w, lab.y FROM tk JOIN lab USING (doc_id)),
cnt AS (SELECT w,
               sum(CASE WHEN y = 0 THEN 1 ELSE 0 END) AS c0,
               sum(CASE WHEN y = 1 THEN 1 ELSE 0 END) AS c1
        FROM ttk GROUP BY w),
st AS (SELECT sum(c0)::DOUBLE AS tot0, sum(c1)::DOUBLE AS tot1,
              count(*)::DOUBLE AS v FROM cnt),
pri AS (SELECT sum(CASE WHEN y = 0 THEN 1 ELSE 0 END)::DOUBLE AS n0,
               sum(CASE WHEN y = 1 THEN 1 ELSE 0 END)::DOUBLE AS n1
        FROM lab),
pt AS (SELECT tk.doc_id,
              ln((coalesce(cnt.c1, 0) + 1.0) / (st.tot1 + 1.0 * st.v))
              - ln((coalesce(cnt.c0, 0) + 1.0) / (st.tot0 + 1.0 * st.v)) AS d
       FROM tk LEFT JOIN cnt USING (w) CROSS JOIN st),
pd AS (SELECT doc_id, count(*) AS n_tokens, sum(d) AS s FROM pt GROUP BY doc_id)
SELECT d.doc_id, coalesce(pd.n_tokens, 0)::BIGINT AS n_tokens,
       round(coalesce(pd.s, 0.0) + ln(pri.n1 / pri.n0), 6) AS llr,
       CASE WHEN round(coalesce(pd.s, 0.0) + ln(pri.n1 / pri.n0), 6) > 0
            THEN 1 ELSE 0 END AS pred
FROM documents d LEFT JOIN pd ON pd.doc_id = d.doc_id CROSS JOIN pri
"""


def _cocite_oracle_sql(key: str, item: str) -> str:
    """Shared-key pair counts with the hub cap, deterministic top-k."""
    return f"""
WITH e AS ({_E_SQL}),
base AS (SELECT DISTINCT {key} AS k, {item} AS it FROM e),
hot AS (SELECT k FROM base GROUP BY k HAVING count(*) > {COCITE_CAP}),
cold AS (SELECT * FROM base WHERE k NOT IN (SELECT k FROM hot)),
pairs AS (SELECT x.it AS a, y.it AS b, count(*) AS n_common
          FROM cold x JOIN cold y ON x.k = y.k AND x.it < y.it
          GROUP BY x.it, y.it HAVING count(*) >= {COCITE_MIN})
SELECT a, b, n_common FROM pairs ORDER BY n_common DESC, a, b LIMIT {COCITE_K}
"""


_MIRROR_DOCS_SQL = (
    "SELECT doc_id, text, source FROM documents "
    "UNION ALL SELECT doc_id + 100000 AS doc_id, text, 'mirror-' || source AS source "
    "FROM documents WHERE doc_id < 60"
)


def q_mirror_sources(spark, sf_dir):
    """Mirror / template detection: pairs of sources sharing >= 2 exact
    content fingerprints (site-level dedup face). Documents are
    augmented with a planted mirror of the first 60 docs under
    'mirror-<source>' names — same CTE in both engines."""
    from efficient_graph_algorithms_spark.operators.cocite import mirror_pairs

    d = _t(spark, sf_dir, "documents").select("doc_id", "text", "source")
    docs = d.unionByName(
        d.where(F.col("doc_id") < 60).select(
            (F.col("doc_id") + 100000).alias("doc_id"),
            "text",
            F.concat(F.lit("mirror-"), F.col("source")).alias("source"),
        )
    )
    return mirror_pairs(docs, min_shared=2)


def _mirror_sources_sql(min_shared: int = 2, df_cap: int = 256) -> str:
    from efficient_graph_algorithms_spark.functions.text import duck_fingerprint60

    return f"""
WITH md AS ({_MIRROR_DOCS_SQL}),
bip AS (SELECT DISTINCT {duck_fingerprint60('text')} AS fp, source FROM md),
hot AS (SELECT fp FROM bip GROUP BY fp HAVING count(*) > {df_cap}),
cold AS (SELECT * FROM bip WHERE fp NOT IN (SELECT fp FROM hot))
SELECT x.source AS a, y.source AS b, count(*) AS n_common
FROM cold x JOIN cold y ON x.fp = y.fp AND x.source < y.source
GROUP BY x.source, y.source HAVING count(*) >= {min_shared}
"""


def q_graph_betweenness2(spark, sf_dir):
    """Truncated-Brandes betweenness (engine extension — the sampled
    dependency-accumulation estimator, Brandes 2001 / Bader et al.
    2007) from the same sampled sources as graph_anf2/closeness2,
    radius 2: forward sigma counting + backward delta accumulation,
    both level-synchronous; oracle is the unrolled 2-level Brandes
    recurrence in SQL."""
    from efficient_graph_algorithms_spark.operators.betweenness import betweenness

    e = _graph_edges(spark, sf_dir)
    seeds = _vertices(e).where(F.col("id") % ANF_SEED_MOD == 0)
    res, _ = betweenness(spark, e, sources=seeds, max_radius=ANF_SQL_RADIUS)
    return res


def _betweenness2_oracle_sql() -> str:
    """Unrolled radius-2 Brandes on the symmetrized simple graph:
    sigma1(s,v) = 1 per distinct 1-hop neighbor; sigma2(s,w) = number
    of 1-hop predecessors of each strictly-2-hop vertex; with the
    deepest level's delta pinned to 0 by truncation, only level-1
    vertices accumulate: delta1(s,v) = sum over 2-hop successors w of
    1/sigma2(s,w); bc(v) = round(sum over s of delta1, 6)."""
    return f"""
WITH e AS ({_E_SQL}),
sym AS (SELECT src, dst FROM e WHERE src <> dst
        UNION SELECT dst AS src, src AS dst FROM e WHERE src <> dst),
seeds AS (SELECT DISTINCT src AS id FROM sym WHERE src % {ANF_SEED_MOD} = 0),
n1 AS (SELECT DISTINCT s.id, y.dst AS v FROM seeds s JOIN sym y ON y.src = s.id
       WHERE y.dst <> s.id),
n2 AS (
  SELECT d.id, y.dst AS w, count(*) AS sigma2
  FROM n1 d JOIN sym y ON y.src = d.v
  WHERE y.dst <> d.id
    AND NOT EXISTS (SELECT 1 FROM n1 x WHERE x.id = d.id AND x.v = y.dst)
  GROUP BY d.id, y.dst),
d1 AS (
  SELECT d.id, d.v, sum(1.0 / n2.sigma2) AS delta
  FROM n1 d JOIN sym y ON y.src = d.v
  JOIN n2 ON n2.id = d.id AND n2.w = y.dst
  GROUP BY d.id, d.v)
SELECT v AS id, round(sum(delta), 6) AS bc FROM d1 GROUP BY v
HAVING round(sum(delta), 6) > 0
"""


def q_graph_closeness2(spark, sf_dir):
    """Truncated closeness centrality (engine extension — the sampled
    centrality statistic of web-graph analysis) from the same sampled
    sources as graph_anf2, radius 2: exact first-hit BFS distances,
    n_reached / sum_dist / round-6 closeness per source."""
    from efficient_graph_algorithms_spark.operators.anf import truncated_closeness

    e = _graph_edges(spark, sf_dir)
    seeds = _vertices(e).where(F.col("id") % ANF_SEED_MOD == 0)
    res, _ = truncated_closeness(
        spark, e, max_radius=ANF_SQL_RADIUS, sources=seeds
    )
    return res


def _closeness2_oracle_sql() -> str:
    """Unrolled 2-hop first-hit distances on the symmetrized simple
    graph: d1 = 1-hop targets (excl. source), d2 = 2-hop targets not in
    {source} U d1; closeness = round((|d1|+|d2|) / (|d1|+2|d2|), 6)."""
    return f"""
WITH e AS ({_E_SQL}),
sym AS (SELECT src, dst FROM e UNION SELECT dst AS src, src AS dst FROM e),
seeds AS (SELECT DISTINCT src AS id FROM sym WHERE src % {ANF_SEED_MOD} = 0),
d1 AS (SELECT DISTINCT s.id, y.dst AS m FROM seeds s JOIN sym y ON y.src = s.id
       WHERE y.dst <> s.id),
d2 AS (SELECT DISTINCT d.id, y.dst AS m FROM d1 d JOIN sym y ON y.src = d.m
       WHERE y.dst <> d.id
       AND NOT EXISTS (SELECT 1 FROM d1 p WHERE p.id = d.id AND p.m = y.dst)),
cnt AS (SELECT s.id,
        (SELECT count(*) FROM d1 WHERE d1.id = s.id) AS n1,
        (SELECT count(*) FROM d2 WHERE d2.id = s.id) AS n2
        FROM seeds s)
SELECT id, (n1 + n2)::BIGINT AS n_reached, (n1 + 2 * n2)::BIGINT AS sum_dist,
       CASE WHEN n1 + 2 * n2 > 0
            THEN round((n1 + n2) / (n1 + 2.0 * n2), 6) ELSE 0.0 END AS closeness
FROM cnt
"""


def q_graph_ppr_3iter(spark, sf_dir):
    """Personalized PageRank (reference random_walk_with_restart_kernel,
    ``reference src/ega/algorithms/graph_kernels.py:72-79``): the real
    operator, pinned to PR_SQL_ITERS synchronous steps so the unrolled
    SQL oracle reproduces it exactly. Seeds: ids divisible by 50."""
    from efficient_graph_algorithms_spark.operators.pagerank import pagerank

    e = _graph_edges(spark, sf_dir)
    v = _vertices(e)
    pers = v.where(F.col("id") % 50 == 0).select("id", F.lit(1.0).alias("p"))
    ranks, _ = pagerank(
        spark, e, vertices=v, personalization=pers, max_iter=PR_SQL_ITERS, tol=0.0
    )
    return ranks.select("id", F.round("rank", 9).alias("rank"))


def _ppr3_oracle_sql() -> str:
    """Unrolled PPR: p_v = 1/|seeds| on seeds else 0; r0 = p;
    r_{t+1} = (1-a)*p + a*(P^T r_t + dm_t * p)."""
    a = PR_ALPHA
    lines = [
        f"WITH e AS ({_E_SQL}),",
        f"v AS ({_V_SQL}),",
        "ns AS (SELECT count(*)::DOUBLE AS ns FROM v WHERE id % 50 = 0),",
        "pv AS (SELECT id, CASE WHEN id % 50 = 0 THEN 1.0/(SELECT ns FROM ns) ELSE 0.0 END AS p FROM v),",
        "deg AS (SELECT src, count(*)::DOUBLE AS d FROM e GROUP BY src),",
        "r0 AS (SELECT id, p AS r FROM pv),",
    ]
    for i in range(1, PR_SQL_ITERS + 1):
        p = i - 1
        lines += [
            f"dm{i} AS (SELECT coalesce(sum(r.r), 0.0) AS m FROM r{p} r "
            f"LEFT JOIN deg ON r.id = deg.src WHERE deg.src IS NULL),",
            f"c{i} AS (SELECT e.dst AS id, sum(r.r / deg.d) AS c FROM e "
            f"JOIN deg ON e.src = deg.src JOIN r{p} r ON e.src = r.id GROUP BY e.dst),",
            f"r{i} AS (SELECT pv.id, {1.0 - a}*pv.p "
            f"+ {a}*(coalesce(c.c, 0.0) + (SELECT m FROM dm{i})*pv.p) AS r "
            f"FROM pv LEFT JOIN c{i} c ON pv.id = c.id),",
        ]
    lines.append(f"fin AS (SELECT id, round(r, 9) AS rank FROM r{PR_SQL_ITERS})")
    return "\n".join(lines) + "\nSELECT id, rank FROM fin"


def q_graph_spam_mass3(spark, sf_dir):
    """TrustRank + relative spam mass (Gyongyi et al. 2004/2006): the
    real spam_mass composition (two pagerank runs + one join), pinned
    to PR_SQL_ITERS steps each; trusted seeds = ids divisible by 50
    (the graph_ppr_3iter seed set, so trust == that query's ranks)."""
    from efficient_graph_algorithms_spark.operators.trustrank import spam_mass

    e = _graph_edges(spark, sf_dir)
    v = _vertices(e)
    seeds = v.where(F.col("id") % 50 == 0)
    out, _ = spam_mass(spark, e, seeds, vertices=v, max_iter=PR_SQL_ITERS, tol=0.0)
    return out.select(
        "id",
        F.round("rank", 9).alias("rank"),
        F.round("trust", 9).alias("trust"),
        F.round("spam_mass", 6).alias("spam_mass"),
    )


def _spam_mass3_oracle_sql() -> str:
    """Both unrolled damped walks (uniform teleport and seed teleport)
    in one WITH chain; spam_mass = (r - t)/r, total since r carries the
    (1-a)/n floor."""
    a = PR_ALPHA
    lines = [
        f"WITH e AS ({_E_SQL}),",
        f"v AS ({_V_SQL}),",
        "n AS (SELECT count(*)::DOUBLE AS n FROM v),",
        "ns AS (SELECT count(*)::DOUBLE AS ns FROM v WHERE id % 50 = 0),",
        "pv AS (SELECT id, CASE WHEN id % 50 = 0 THEN 1.0/(SELECT ns FROM ns) ELSE 0.0 END AS p FROM v),",
        "deg AS (SELECT src, count(*)::DOUBLE AS d FROM e GROUP BY src),",
        "r0 AS (SELECT id, 1.0/(SELECT n FROM n) AS r FROM v),",
        "t0 AS (SELECT id, p AS r FROM pv),",
    ]
    for i in range(1, PR_SQL_ITERS + 1):
        p = i - 1
        lines += [
            # uniform-teleport chain (PageRank)
            f"dm{i} AS (SELECT coalesce(sum(r.r), 0.0) AS m FROM r{p} r "
            f"LEFT JOIN deg ON r.id = deg.src WHERE deg.src IS NULL),",
            f"c{i} AS (SELECT e.dst AS id, sum(r.r / deg.d) AS c FROM e "
            f"JOIN deg ON e.src = deg.src JOIN r{p} r ON e.src = r.id GROUP BY e.dst),",
            f"r{i} AS (SELECT v.id, {1.0 - a}/(SELECT n FROM n) "
            f"+ {a}*(coalesce(c.c, 0.0) + (SELECT m FROM dm{i})/(SELECT n FROM n)) AS r "
            f"FROM v LEFT JOIN c{i} c ON v.id = c.id),",
            # seed-teleport chain (TrustRank)
            f"tdm{i} AS (SELECT coalesce(sum(r.r), 0.0) AS m FROM t{p} r "
            f"LEFT JOIN deg ON r.id = deg.src WHERE deg.src IS NULL),",
            f"tc{i} AS (SELECT e.dst AS id, sum(r.r / deg.d) AS c FROM e "
            f"JOIN deg ON e.src = deg.src JOIN t{p} r ON e.src = r.id GROUP BY e.dst),",
            f"t{i} AS (SELECT pv.id, {1.0 - a}*pv.p "
            f"+ {a}*(coalesce(c.c, 0.0) + (SELECT m FROM tdm{i})*pv.p) AS r "
            f"FROM pv LEFT JOIN tc{i} c ON pv.id = c.id),",
        ]
    k = PR_SQL_ITERS
    lines[-1] = lines[-1].rstrip(",")
    return "\n".join(lines) + (
        f"\nSELECT r.id, round(r.r, 9) AS rank, round(t.r, 9) AS trust,"
        f"\n       round((r.r - t.r) / r.r, 6) AS spam_mass"
        f"\nFROM r{k} r JOIN t{k} t ON r.id = t.id"
    )


def q_graph_matching(spark, sf_dir):
    """Greedy one-to-one matching (reference's sequential greedy
    assignment, ``reference src/ega/algorithms/
    gromov_wasserstein_graphs.py:753-802``) over deterministic scores,
    pinned to MATCH_SQL_ROUNDS locally-dominant-pair rounds so the
    unrolled SQL oracle coincides."""
    from efficient_graph_algorithms_spark.operators.graph_build import greedy_matching

    e = _graph_edges(spark, sf_dir)
    scores = e.select(
        "src", "dst",
        (((F.col("src") * 31 + F.col("dst") * 17) % 1009) / F.lit(1009.0)).alias("score"),
    )
    m = greedy_matching(scores, max_rounds=MATCH_SQL_ROUNDS)
    return m.select("src", "dst", F.round("score", 6).alias("score"))


def _matching_oracle_sql() -> str:
    lines = [
        f"WITH e AS ({_E_SQL}),",
        "rem0 AS (SELECT src, dst, ((src*31 + dst*17) % 1009) / 1009.0 AS score FROM e),",
    ]
    for i in range(1, MATCH_SQL_ROUNDS + 1):
        p = i - 1
        lines += [
            f"wn{i} AS (SELECT src, dst, score FROM (SELECT *, "
            "row_number() OVER (PARTITION BY src ORDER BY score DESC, dst ASC, src ASC) AS rs, "
            "row_number() OVER (PARTITION BY dst ORDER BY score DESC, src ASC, dst ASC) AS rd "
            f"FROM rem{p}) WHERE rs = 1 AND rd = 1),",
            f"rem{i} AS (SELECT r.* FROM rem{p} r "
            f"WHERE r.src NOT IN (SELECT src FROM wn{i}) "
            f"AND r.dst NOT IN (SELECT dst FROM wn{i})),",
        ]
    u = " UNION ALL ".join(f"SELECT * FROM wn{i}" for i in range(1, MATCH_SQL_ROUNDS + 1))
    lines.append(f"m AS ({u})")
    return "\n".join(lines) + "\nSELECT src, dst, round(score, 6) AS score FROM m"


KNN_K = 5
KNN_EXACT_N = 150  # small-N exact slice for the full-pairs oracle
KNN_TABLES = 4
KNN_PLANES = 6
EMB_DIM = 64


def _knn_rank_sql(scored_cte: str, k: int) -> str:
    """scored_cte must yield sc(a, b, cos) with a < b. Appends the
    shared both-directions → per-vertex top-k → symmetrize tail."""
    return f"""{scored_cte},
bidir AS (SELECT a, b, cos FROM sc UNION ALL SELECT b AS a, a AS b, cos FROM sc),
topk AS (SELECT a AS src, b AS dst, cos FROM (
  SELECT *, row_number() OVER (PARTITION BY a ORDER BY cos DESC, b ASC) AS rn FROM bidir)
  WHERE rn <= {k}),
sym AS (SELECT src, dst, cos FROM topk UNION ALL SELECT dst AS src, src AS dst, cos FROM topk)
SELECT src, dst, max(cos) AS cos FROM sym GROUP BY src, dst"""


def q_graph_knn(spark, sf_dir):
    """Symmetrized k-NN graph, exact small-N slice (reference
    ``scripts/experiments/vertex_normal_prediction.py:250-251``) —
    full-pairs DuckDB oracle; the scale path is q_graph_knn_lsh."""
    from efficient_graph_algorithms_spark.operators.ann import knn_graph

    emb = _t(spark, sf_dir, "embeddings").where(F.col("vec_id") < KNN_EXACT_N)
    return knn_graph(emb, k=KNN_K, method="exact")


def _knn_exact_oracle_sql() -> str:
    return _knn_rank_sql(
        f"""WITH v AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < {KNN_EXACT_N}),
sc AS (SELECT x.vec_id AS a, y.vec_id AS b, round({_COS_EXPR}, 4) AS cos
       FROM v x JOIN v y ON x.vec_id < y.vec_id)""",
        KNN_K,
    )


def q_graph_knn_lsh(spark, sf_dir):
    """k-NN graph via multi-table RP-LSH candidates — the 100 TB path
    (bucket equi-joins only). The oracle mirrors the algorithm (same
    deterministic hyperplanes as exact SQL literals); exactness vs
    brute force is covered by q_graph_knn and the pytest recall test."""
    from efficient_graph_algorithms_spark.operators.ann import knn_graph

    emb = _t(spark, sf_dir, "embeddings")
    return knn_graph(
        emb, k=KNN_K, method="lsh", n_tables=KNN_TABLES, n_planes=KNN_PLANES, dim=EMB_DIM
    )


def _knn_lsh_oracle_sql() -> str:
    from efficient_graph_algorithms_spark.operators.ann import unit_projections

    table_ctes = []
    for t in range(KNN_TABLES):
        planes = unit_projections(KNN_PLANES, EMB_DIM, 42, stream0=1000 + t * KNN_PLANES)
        bits = " + ".join(
            f"(CASE WHEN list_dot_product(embedding::DOUBLE[], {p!r}) > 0 "
            f"THEN {1 << i} ELSE 0 END)"
            for i, p in enumerate(planes)
        )
        table_ctes.append(
            f"bt{t} AS (SELECT vec_id, {t} AS tbl, {bits} AS bucket FROM embeddings)"
        )
    union = " UNION ALL ".join(f"SELECT * FROM bt{t}" for t in range(KNN_TABLES))
    head = f"""WITH {', '.join(table_ctes)},
bk AS ({union}),
cand AS (SELECT DISTINCT x.vec_id AS a, y.vec_id AS b FROM bk x
         JOIN bk y ON x.tbl = y.tbl AND x.bucket = y.bucket AND x.vec_id < y.vec_id),
sc AS (SELECT c.a, c.b, round({_COS_EXPR}, 4) AS cos FROM cand c
       JOIN embeddings x ON x.vec_id = c.a JOIN embeddings y ON y.vec_id = c.b)"""
    return _knn_rank_sql(head, KNN_K)


FRT_N = 40
FRT_SEED = 7


def _frt_fixture_edges() -> list[tuple[int, int, float]]:
    """Deterministic connected graph: ring + stride-7 chords with DYADIC
    (quarter-unit) weights — every shortest-path sum is then exactly
    representable, so Spark and DuckDB agree bit-for-bit on distances
    regardless of relaxation order."""
    agg: dict[tuple[int, int], float] = {}
    for i in range(FRT_N):
        for a, b, w in (
            (i, (i + 1) % FRT_N, (1 + (i % 5)) / 4.0),
            *(((i, (i + 7) % FRT_N, (1 + ((i * 3 + 1) % 5)) / 4.0),) if i % 3 == 0 else ()),
        ):
            k = (min(a, b), max(a, b))
            agg[k] = min(agg.get(k, float("inf")), w)
    return [(a, b, w) for (a, b), w in sorted(agg.items())]


def _frt_constants() -> dict:
    """Python-side Dijkstra on the fixture: ecc/δ/radii as literals shared
    by the Spark query and the SQL oracle (keeps log2/ceil out of SQL)."""
    import heapq
    import math

    from efficient_graph_algorithms_spark.functions.hashing import md5_60bit
    from efficient_graph_algorithms_spark.operators.trees import frt_beta

    ew = _frt_fixture_edges()
    adj: dict[int, list[tuple[int, float]]] = {v: [] for v in range(FRT_N)}
    for s, t, w in ew:
        adj[s].append((t, w))
        adj[t].append((s, w))
    dist = [float("inf")] * FRT_N
    dist[0] = 0.0
    pq = [(0.0, 0)]
    while pq:
        d, u = heapq.heappop(pq)
        if d > dist[u]:
            continue
        for v, w in adj[u]:
            if d + w < dist[v]:
                dist[v] = d + w
                heapq.heappush(pq, (d + w, v))
    ecc = max(dist)
    wmin = min(w for _, _, w in ew)
    beta = frt_beta(FRT_SEED)
    delta = max(0, math.ceil(math.log2(max(2.0 * ecc, wmin) / wmin)))
    radii = {i: beta * (2.0**i) * wmin for i in range(delta, -1, -1)}
    return {
        "ew": ew,
        "wmin": wmin,
        "delta": delta,
        "radii": radii,
        "root": -md5_60bit(f"frtroot{FRT_SEED}") - 1,
    }


def q_graph_frt_tree(spark, sf_dir):
    """One seeded FRT low-stretch tree of the dyadic fixture graph
    (reference frt_trees.py:47-115) — Pareto-frontier parallel
    construction; the oracle recomputes the same tree from the direct
    definition (APSP by min-plus squaring + per-level argmin-π)."""
    from efficient_graph_algorithms_spark.operators.trees import frt_tree

    edges = spark.createDataFrame(_frt_fixture_edges(), "src long, dst long, w double")
    tree, _ = frt_tree(spark, edges, seed=FRT_SEED)
    return tree.select("id", "parent", F.round("w", 6).alias("w"), "depth")


def _frt_oracle_sql() -> str:
    from efficient_graph_algorithms_spark.functions.hashing import duckdb_md5_60bit_sql

    c = _frt_constants()
    delta, radii, root = c["delta"], c["radii"], c["root"]
    wmin = c["wmin"]
    vals = ", ".join(f"({a}, {b}, {w!r})" for a, b, w in c["ew"])
    rmax = radii[delta]
    # min-plus squaring: K rounds cover 2^K hops
    import math

    k_rounds = max(1, math.ceil(math.log2(FRT_N)))
    lines = [
        f"WITH e(src, dst, w) AS (VALUES {vals}),",
        "sym AS (SELECT src, dst, w FROM e UNION ALL SELECT dst, src, w FROM e),",
        "d0 AS (SELECT src AS a, dst AS b, min(w) AS d FROM sym GROUP BY src, dst"
        f" UNION ALL SELECT range, range, 0.0 FROM range({FRT_N})),",
    ]
    for r in range(1, k_rounds + 1):
        lines.append(
            f"d{r} AS MATERIALIZED (SELECT a, b, min(d) AS d FROM ("
            f"SELECT a, b, d FROM d{r - 1} UNION ALL "
            f"SELECT x.a, y.b, x.d + y.d AS d FROM d{r - 1} x JOIN d{r - 1} y ON x.b = y.a "
            f"WHERE x.d + y.d <= {rmax!r}) GROUP BY a, b),"
        )
    pri_expr = duckdb_md5_60bit_sql("concat('frt', CAST({s} AS VARCHAR), ':', CAST(range AS VARCHAR))").format(
        s=FRT_SEED
    )
    lines.append(
        f"pri AS (SELECT range AS id, {pri_expr} AS pri FROM range({FRT_N})),"
    )
    apsp = f"d{k_rounds}"
    for i in range(delta, -1, -1):
        lines.append(
            f"c{i} AS MATERIALIZED (SELECT d.b AS v, arg_min(d.a, p.pri) AS c FROM {apsp} d "
            f"JOIN pri p ON p.id = d.a WHERE d.d <= {radii[i]!r} GROUP BY d.b),"
        )
    joins = " ".join(f"JOIN c{i} ON c{i}.v = v0.v" for i in range(delta, -1, -1))
    cols = ", ".join(f"c{i}.c AS c{i}" for i in range(delta, -1, -1))
    lines.append(f"asg AS (SELECT v0.v AS id, {cols} FROM c{delta} v0 {joins}),")
    melt_parts = []
    for i in range(delta, -1, -1):
        pathcat = " || '/' || ".join(
            f"CAST(c{j} AS VARCHAR)" for j in range(delta, i - 1, -1)
        )
        ppath = (
            "'ROOT'"
            if i == delta
            else " || '/' || ".join(f"CAST(c{j} AS VARCHAR)" for j in range(delta, i, -1))
        )
        melt_parts.append(
            f"SELECT id, {i} AS level, {pathcat} AS path, {ppath} AS ppath, "
            f"{wmin * (2.0 ** i)!r} AS w, {delta - i + 1} AS depth FROM asg"
        )
    lines.append("melted AS (" + " UNION ALL ".join(melt_parts) + "),")
    node = duckdb_md5_60bit_sql("concat('frtnode', CAST({s} AS VARCHAR), ':', {p})")
    node_path = "-(" + node.format(s=FRT_SEED, p="path") + ") - 1"
    node_ppath = (
        f"CASE WHEN ppath = 'ROOT' THEN {root} ELSE -("
        + node.format(s=FRT_SEED, p="ppath")
        + ") - 1 END"
    )
    lines += [
        "sizes AS (SELECT level, path, count(*) AS n_members, min(ppath) AS ppath, "
        "min(w) AS w, min(depth) AS depth, min(id) AS solo FROM melted GROUP BY level, path),",
        f"internal AS (SELECT {node_path} AS id, {node_ppath} AS parent, w, depth "
        "FROM sizes WHERE n_members >= 2),",
        "single AS (SELECT m.id, max(m.level) AS slevel FROM melted m "
        "JOIN sizes s ON s.level = m.level AND s.path = m.path "
        "WHERE s.n_members = 1 GROUP BY m.id),",
        f"leaves AS (SELECT m.id, {node_ppath} AS parent, m.w AS w, m.depth AS depth "
        "FROM melted m JOIN single s ON s.id = m.id AND s.slevel = m.level)",
    ]
    return (
        "\n".join(lines)
        + "\nSELECT id, parent, round(w, 6) AS w, depth FROM internal"
        + "\nUNION ALL SELECT id, parent, round(w, 6) AS w, depth FROM leaves"
    )


TREE_N = 2000  # binary-heap tree: parent(i) = (i-1)//2, depth <= 10
TREE_A = -0.7
TREE_DEPTH = 10  # floor(log2(TREE_N)) for TREE_N = 2000


def _tree_w_and_f():
    """Deterministic edge weights from a 5-value set + PYTHON-evaluated
    exp kernel literals, so Spark and DuckDB multiply identical doubles
    (java Math.exp vs libm exp can differ in the last ulp)."""
    import math

    ws = [(1 + r) / 4.0 for r in range(5)]  # exact quarters
    fw = {w: math.exp(TREE_A * w) for w in ws}
    f2w = {w: math.exp(TREE_A * 2.0 * w) for w in ws}
    return ws, fw, f2w


def q_graph_tree_gfi(spark, sf_dir):
    """Tree-GFI 2-pass DP (reference trees.py:93-125) on a fixed
    binary-heap tree: out[i] = Σ_j exp(a·dist_T(i,j))·field[j],
    exact via bottom-up/top-down message passing by level."""
    from efficient_graph_algorithms_spark.operators.trees import (
        tree_depths,
        tree_gfi_matvec,
    )

    _, fw, f2w = _tree_w_and_f()

    def f_fun(x):
        expr = F.lit(None).cast("double")
        for w, v in fw.items():
            expr = F.when(x == F.lit(w), F.lit(v)).otherwise(expr)
        for w, v in f2w.items():
            expr = F.when(x == F.lit(2.0 * w), F.lit(v)).otherwise(expr)
        return expr

    ids = spark.range(1, TREE_N).select(F.col("id"))
    tree = ids.select(
        "id",
        ((F.col("id") - 1) / 2).cast("long").alias("parent"),
        ((1 + F.col("id") % 5) / F.lit(4.0)).alias("w"),
    )
    field = spark.range(TREE_N).select(
        "id", (((F.col("id") * 37 + 11) % 97) / F.lit(97.0)).alias("value")
    )
    twd = tree_depths(tree, root=0, max_depth=TREE_DEPTH + 1)
    out = tree_gfi_matvec(twd, field, f_fun=f_fun, root=0)
    return out.select("id", F.round("value", 6).alias("value"))


def _tree_gfi_oracle_sql() -> str:
    ws, fw, f2w = _tree_w_and_f()
    fw_case = "CASE id % 5 " + " ".join(
        f"WHEN {r} THEN {fw[(1 + r) / 4.0]!r}" for r in range(5)
    ) + " END"
    f2w_case = "CASE id % 5 " + " ".join(
        f"WHEN {r} THEN {f2w[(1 + r) / 4.0]!r}" for r in range(5)
    ) + " END"
    depth_case = "CASE " + " ".join(
        f"WHEN id + 1 >= {1 << d} THEN {d}" for d in range(TREE_DEPTH, 0, -1)
    ) + " ELSE 0 END"
    lines = [
        f"WITH t AS (SELECT range AS id, (range - 1) // 2 AS parent, "
        f"{fw_case} AS fw, 1.0 - {f2w_case} AS omf, {depth_case} AS depth "
        f"FROM range(1, {TREE_N})),",
        f"p{TREE_DEPTH + 1} AS MATERIALIZED (SELECT range AS id, "
        f"((range * 37 + 11) % 97) / 97.0 AS partial FROM range(0, {TREE_N})),",
    ]
    for lvl in range(TREE_DEPTH, 0, -1):
        lines.append(
            f"p{lvl} AS MATERIALIZED (SELECT p.id, p.partial + coalesce(m.up, 0.0) AS partial "
            f"FROM p{lvl + 1} p LEFT JOIN ("
            f"SELECT t.parent AS id, sum(t.fw * c.partial) AS up FROM t "
            f"JOIN p{lvl + 1} c ON t.id = c.id WHERE t.depth = {lvl} "
            f"GROUP BY t.parent) m ON p.id = m.id),"
        )
    lines.append("s0 AS MATERIALIZED (SELECT id, partial AS value FROM p1 WHERE id = 0),")
    for lvl in range(1, TREE_DEPTH + 1):
        lines.append(
            f"s{lvl} AS MATERIALIZED (SELECT id, value FROM s{lvl - 1} UNION ALL "
            f"SELECT t.id, t.fw * sp.value + t.omf * p.partial AS value "
            f"FROM t JOIN s{lvl - 1} sp ON t.parent = sp.id AND t.depth = {lvl} "
            f"JOIN p1 p ON p.id = t.id),"
        )
    lines[-1] = lines[-1].rstrip(",")
    return "\n".join(lines) + f"\nSELECT id, round(value, 6) AS value FROM s{TREE_DEPTH}"


PROJ_STEPS = 2
PROJ_SAMPLES = 3


def q_graph_kernel_projection(spark, sf_dir):
    """Kernel-score projection with RDM_SEED z-score correction
    (reference get_projection, graph_kernels.py:387-519): 2-step
    random-walk scores from seeds (id%40==0), z-scored against 3
    alternative seed sets — all samples in one batched gather-scatter."""
    from efficient_graph_algorithms_spark.operators.projection import kernel_projection

    e = _graph_edges(spark, sf_dir)
    v = _vertices(e)
    sets = None
    for s in range(PROJ_SAMPLES + 1):
        part = v.where(F.col("id") % 40 == s).select("id", F.lit(s).alias("sample"))
        sets = part if sets is None else sets.unionByName(part)
    out = kernel_projection(e, sets, steps=PROJ_STEPS, correction="rdm_seed")
    return out.select("id", F.round("score", 6).alias("score"))


def _kernel_projection_oracle_sql() -> str:
    r = PROJ_SAMPLES
    seed_parts = " UNION ALL ".join(
        f"SELECT id, {s} AS sample, 1.0 AS value FROM v WHERE id % 40 = {s}"
        for s in range(r + 1)
    )
    lines = [
        f"WITH e AS ({_E_SQL}),",
        f"v AS ({_V_SQL}),",
        "deg AS (SELECT src, count(*)::DOUBLE AS d FROM e GROUP BY src),",
        f"x0 AS ({seed_parts}),",
    ]
    for st in range(1, PROJ_STEPS + 1):
        lines.append(
            f"x{st} AS MATERIALIZED (SELECT e.dst AS id, s.sample, sum(s.value / deg.d) AS value "
            f"FROM e JOIN deg ON e.src = deg.src JOIN x{st - 1} s ON e.src = s.id "
            f"GROUP BY e.dst, s.sample),"
        )
    lines += [
        f"main AS (SELECT id, value AS score FROM x{PROJ_STEPS} WHERE sample = 0),",
        f"st AS (SELECT id, sum(value) / {r} AS mu, "
        f"sqrt(greatest(sum(value * value) / {r} - (sum(value) / {r})^2, 0.0)) AS sd "
        f"FROM x{PROJ_STEPS} WHERE sample >= 1 GROUP BY id),",
        "z AS (SELECT coalesce(m.id, st.id) AS id, "
        "(coalesce(m.score, 0.0) - coalesce(st.mu, 0.0)) / "
        "(CASE WHEN coalesce(st.sd, 0.0) > 0 THEN st.sd ELSE 1.0 END) AS score "
        "FROM main m FULL OUTER JOIN st ON m.id = st.id)",
    ]
    return "\n".join(lines) + "\nSELECT id, round(score, 6) AS score FROM z"


def q_graph_interp_ratio(spark, sf_dir):
    """Masked-SpMV kernel interpolation (reference Interpolator):
    known = ids divisible by 3; estimate unknown vertices as
    sum(known nbr values)/count(known nbrs)."""
    e = _graph_edges(spark, sf_dir)
    field = _vertices(e).select(
        "id",
        (((F.col("id") * 13 + 5) % 101) / F.lit(101.0)).alias("value"),
        (F.col("id") % 3 == 0).cast("double").alias("known"),
    )
    num = (
        e.join(field, e["src"] == field["id"])
        .groupBy(e["dst"].alias("id"))
        .agg(
            F.sum(F.col("value") * F.col("known")).alias("num"),
            F.sum("known").alias("den"),
        )
    )
    return num.where(F.col("den") > 0).select(
        "id", F.round(F.col("num") / F.col("den"), 6).alias("interp")
    )


def q_graph_rw2(spark, sf_dir):
    """2-step random-walk scores (reference random_walk_kernel)."""
    from efficient_graph_algorithms_spark.operators.kernels import k_step_random_walk

    e = _graph_edges(spark, sf_dir)
    field = _vertices(e).select(
        "id", (((F.col("id") * 37 + 11) % 97) / F.lit(97.0)).alias("value")
    )
    out = k_step_random_walk(e, field, k=2)
    return out.select("id", F.round("value", 9).alias("value"))


_RW2_ORACLE_SQL = f"""
WITH e AS ({_E_SQL}), v AS ({_V_SQL}),
deg AS (SELECT src, count(*)::DOUBLE AS d FROM e GROUP BY src),
x0 AS (SELECT id, ((id * 37 + 11) % 97) / 97.0 AS x FROM v),
x1 AS (SELECT e.dst AS id, sum(x0.x / deg.d) AS x
       FROM e JOIN deg ON e.src = deg.src JOIN x0 ON x0.id = e.src GROUP BY e.dst),
x2 AS (SELECT e.dst AS id, sum(x1.x / deg.d) AS x
       FROM e JOIN deg ON e.src = deg.src JOIN x1 ON x1.id = e.src GROUP BY e.dst)
SELECT v.id, round(coalesce(x2.x, 0.0), 9) AS value FROM v LEFT JOIN x2 ON v.id = x2.id
"""


def q_graph_heat2(spark, sf_dir):
    """2-term truncated-Taylor heat diffusion (reference heat_kernel)."""
    from efficient_graph_algorithms_spark.operators.kernels import heat_kernel_diffusion

    e = _graph_edges(spark, sf_dir)
    field = _vertices(e).select(
        "id", (((F.col("id") * 37 + 11) % 97) / F.lit(97.0)).alias("value")
    )
    out = heat_kernel_diffusion(e, field, t=0.5, k=2)
    return out.select("id", F.round("value", 9).alias("value"))


_HEAT2_ORACLE_SQL = f"""
WITH e AS ({_E_SQL}), v AS ({_V_SQL}),
sym AS (SELECT src, dst FROM e UNION SELECT dst, src FROM e),
deg AS (SELECT src AS id, count(*)::DOUBLE AS dg FROM sym GROUP BY src),
t0 AS (SELECT id, ((id * 37 + 11) % 97) / 97.0 AS tv FROM v),
at1 AS (SELECT sym.dst AS id, sum(t0.tv) AS av FROM sym JOIN t0 ON t0.id = sym.src GROUP BY sym.dst),
t1 AS (SELECT v.id,
       coalesce(deg.dg, 0.0) * coalesce(t0.tv, 0.0) - coalesce(at1.av, 0.0) AS tv
       FROM v LEFT JOIN deg ON v.id = deg.id LEFT JOIN t0 ON v.id = t0.id
       LEFT JOIN at1 ON v.id = at1.id),
at2 AS (SELECT sym.dst AS id, sum(t1.tv) AS av FROM sym JOIN t1 ON t1.id = sym.src GROUP BY sym.dst),
t2 AS (SELECT v.id,
       coalesce(deg.dg, 0.0) * coalesce(t1.tv, 0.0) - coalesce(at2.av, 0.0) AS tv
       FROM v LEFT JOIN deg ON v.id = deg.id LEFT JOIN t1 ON v.id = t1.id
       LEFT JOIN at2 ON v.id = at2.id)
SELECT v.id,
  round(coalesce(t0.tv, 0.0) - 0.5 * coalesce(t1.tv, 0.0) + 0.125 * coalesce(t2.tv, 0.0), 9) AS value
FROM v LEFT JOIN t0 ON v.id = t0.id LEFT JOIN t1 ON v.id = t1.id LEFT JOIN t2 ON v.id = t2.id
"""


def q_graph_epsilon_nn(spark, sf_dir):
    """ε-NN theta-join graph build over embeddings (reference
    cdist < epsilon, vertex_normal_prediction.py:326)."""
    from efficient_graph_algorithms_spark.operators.graph_build import epsilon_nn_graph

    pts = (
        _t(spark, sf_dir, "embeddings")
        .where(F.col("vec_id") < 100)
        .select(F.col("vec_id").alias("id"), F.col("embedding").cast("array<double>").alias("vec"))
    )
    return epsilon_nn_graph(pts, eps=1.3).select(
        "src", "dst", F.round("weight", 6).alias("weight")
    )


_EPS_NN_SQL = """
WITH e AS (SELECT vec_id AS id, embedding::DOUBLE[] AS v
           FROM embeddings WHERE vec_id < 100)
SELECT x.id AS src, y.id AS dst,
  round(sqrt(list_sum(list_transform(generate_series(1, len(x.v)),
        i -> (x.v[i] - y.v[i]) * (x.v[i] - y.v[i])))), 6) AS weight
FROM e x JOIN e y ON x.id <> y.id
WHERE sqrt(list_sum(list_transform(generate_series(1, len(x.v)),
      i -> (x.v[i] - y.v[i]) * (x.v[i] - y.v[i])))) <= 1.3
"""


def q_graph_subgraph(spark, sf_dir):
    """Induced-subgraph submatrix selection (reference
    cost_s[indices,:][:,indices], gromov_wasserstein_graphs.py:906-917)."""
    from efficient_graph_algorithms_spark.operators.graph_build import induced_subgraph

    e = _graph_edges(spark, sf_dir)
    subset = _vertices(e).where(F.col("id") % 3 == 0)
    return induced_subgraph(e, subset)


_SUBGRAPH_SQL = f"""
WITH e AS ({_E_SQL})
SELECT src, dst FROM e WHERE src % 3 = 0 AND dst % 3 = 0
"""


def q_graph_dsd(spark, sf_dir):
    """Diffusion-state-distance pairs among seeds (reference
    graph_kernels.py:84-97)."""
    from efficient_graph_algorithms_spark.operators.transport import (
        diffusion_state_distance,
    )

    e = _graph_edges(spark, sf_dir)
    out = diffusion_state_distance(spark, e, seeds=[0, 1, 2, 3, 4], k=2)
    return out.select("a", "b", F.round("dsd", 9).alias("dsd"))


def _dsd_oracle_sql(seeds=(0, 1, 2, 3, 4), k: int = 2) -> str:
    seed_vals = ", ".join(f"({s})" for s in seeds)
    lines = [
        f"WITH e AS ({_E_SQL}),",
        "deg AS (SELECT src, count(*)::DOUBLE AS d FROM e GROUP BY src),",
        f"sd(seed) AS (VALUES {seed_vals}),",
        "x0 AS (SELECT seed::BIGINT AS seed, seed::BIGINT AS id, 1.0 AS value FROM sd),",
        "acc0 AS (SELECT * FROM x0),",
    ]
    for j in range(1, k + 1):
        p = j - 1
        lines += [
            f"x{j} AS (SELECT x.seed, e.dst AS id, sum(x.value / deg.d) AS value "
            f"FROM e JOIN deg ON e.src = deg.src JOIN x{p} x ON x.id = e.src "
            f"GROUP BY x.seed, e.dst),",
            f"acc{j} AS (SELECT coalesce(a.seed, x.seed) AS seed, coalesce(a.id, x.id) AS id, "
            f"coalesce(a.value, 0.0) + coalesce(x.value, 0.0) AS value "
            f"FROM acc{p} a FULL JOIN x{j} x ON a.seed = x.seed AND a.id = x.id),",
        ]
    lines += [
        f"acc AS (SELECT * FROM acc{k}),",
        "tot AS (SELECT seed, sum(abs(value)) AS t FROM acc GROUP BY seed),",
        "pairs AS (SELECT a.seed AS a, b.seed AS b FROM sd a JOIN sd b ON a.seed < b.seed),",
        "inner0 AS (SELECT x.seed AS a, y.seed AS b, "
        "sum(abs(x.value - y.value)) AS i_abs, sum(abs(x.value)) AS o_a, sum(abs(y.value)) AS o_b "
        "FROM acc x JOIN acc y ON x.id = y.id AND x.seed < y.seed GROUP BY x.seed, y.seed)",
    ]
    return "\n".join(lines) + """
SELECT p.a::BIGINT AS a, p.b::BIGINT AS b,
  round(coalesce(i.i_abs, 0.0) + (ta.t - coalesce(i.o_a, 0.0)) + (tb.t - coalesce(i.o_b, 0.0)), 9) AS dsd
FROM pairs p
LEFT JOIN inner0 i ON i.a = p.a AND i.b = p.b
JOIN tot ta ON ta.seed = p.a JOIN tot tb ON tb.seed = p.b
"""


def q_graph_sinkhorn3(spark, sf_dir):
    """3 fixed Sinkhorn scaling iterations; returns the potentials
    (reference convolutional_distance / sinkhorn_knopp_iteration)."""
    from efficient_graph_algorithms_spark.operators.transport import sinkhorn_distance

    e = _graph_edges(spark, sf_dir)
    v = _vertices(e)
    musum_df = v.select(F.sum((F.col("id") * 7 + 3) % 101 + 1).alias("s")).collect()
    nusum_df = v.select(F.sum((F.col("id") * 11 + 5) % 89 + 1).alias("s")).collect()
    mu = v.select("id", (((F.col("id") * 7 + 3) % 101 + 1) / F.lit(float(musum_df[0]["s"]))).alias("m"))
    nu = v.select("id", (((F.col("id") * 11 + 5) % 89 + 1) / F.lit(float(nusum_df[0]["s"]))).alias("m"))
    _, _, pots = sinkhorn_distance(
        spark, e, mu, nu, n_iter=3, tol=0.0, return_potentials=True
    )
    return pots.select("id", F.round("v", 9).alias("v"), F.round("u", 9).alias("u"))


def _sinkhorn3_oracle_sql(w: float = 0.5, k: int = 3) -> str:
    lines = [
        f"WITH e AS ({_E_SQL}),",
        "sym AS (SELECT src, dst FROM e UNION SELECT dst, src FROM e),",
        f"v AS ({_V_SQL}),",
        "msum AS (SELECT sum((id * 7 + 3) % 101 + 1) AS s FROM v),",
        "nsum AS (SELECT sum((id * 11 + 5) % 89 + 1) AS s FROM v),",
        "mu AS (SELECT id, ((id * 7 + 3) % 101 + 1) / (SELECT s FROM msum) AS m FROM v),",
        "nu AS (SELECT id, ((id * 11 + 5) % 89 + 1) / (SELECT s FROM nsum) AS m FROM v),",
        "u0 AS (SELECT id, 1.0 AS u FROM v),",
    ]
    for i in range(1, k + 1):
        p = i - 1
        lines += [
            f"ku{i} AS (SELECT v.id, coalesce(u.u, 0.0) + {w} * coalesce(s.nv, 0.0) AS ku FROM v "
            f"LEFT JOIN u{p} u ON v.id = u.id LEFT JOIN "
            f"(SELECT sym.dst AS id, sum(u.u) AS nv FROM sym JOIN u{p} u ON sym.src = u.id GROUP BY sym.dst) s "
            f"ON v.id = s.id),",
            f"v{i} AS (SELECT mu.id, mu.m / greatest(ku.ku, 1e-300) AS vv FROM mu JOIN ku{i} ku ON mu.id = ku.id),",
            f"kv{i} AS (SELECT v.id, coalesce(x.vv, 0.0) + {w} * coalesce(s.nv, 0.0) AS kv FROM v "
            f"LEFT JOIN v{i} x ON v.id = x.id LEFT JOIN "
            f"(SELECT sym.dst AS id, sum(x.vv) AS nv FROM sym JOIN v{i} x ON sym.src = x.id GROUP BY sym.dst) s "
            f"ON v.id = s.id),",
            f"u{i} AS (SELECT nu.id, nu.m / greatest(kv.kv, 1e-300) AS u FROM nu JOIN kv{i} kv ON nu.id = kv.id),",
        ]
    lines[-1] = lines[-1].rstrip(",")
    return "\n".join(lines) + f"""
SELECT v{k}.id, round(v{k}.vv, 9) AS v, round(u{k}.u, 9) AS u
FROM v{k} JOIN u{k} ON v{k}.id = u{k}.id
"""


def q_graph_wbary2(spark, sf_dir):
    """2 fixed iterated-Bregman Wasserstein-barycenter iterations over
    two deterministic vertex distributions (reference
    convolutional_barycenter.py:13-81, Solomon et al. 2015 Alg. 2);
    returns the geometric-mean barycenter b."""
    from efficient_graph_algorithms_spark.operators.transport import (
        wasserstein_barycenter,
    )

    e = _graph_edges(spark, sf_dir)
    v = _vertices(e)
    musum = float(v.select(F.sum((F.col("id") * 7 + 3) % 101 + 1)).collect()[0][0])
    nusum = float(v.select(F.sum((F.col("id") * 11 + 5) % 89 + 1)).collect()[0][0])
    dists = (
        v.select(F.lit(0).alias("k"), "id",
                 (((F.col("id") * 7 + 3) % 101 + 1) / F.lit(musum)).alias("m"))
        .unionByName(
            v.select(F.lit(1).alias("k"), "id",
                     (((F.col("id") * 11 + 5) % 89 + 1) / F.lit(nusum)).alias("m"))
        )
    )
    b, _ = wasserstein_barycenter(spark, e, dists, n_iter=2, tol=0.0)
    return b.select("id", F.round("b", 9).alias("b"))


def _wbary2_oracle_sql(w: float = 0.5, iters: int = 2) -> str:
    lines = [
        f"WITH e AS ({_E_SQL}),",
        "sym AS (SELECT src, dst FROM e UNION SELECT dst, src FROM e),",
        f"v AS ({_V_SQL}),",
        "msum AS (SELECT sum((id * 7 + 3) % 101 + 1) AS s FROM v),",
        "nsum AS (SELECT sum((id * 11 + 5) % 89 + 1) AS s FROM v),",
        "p AS (SELECT 0 AS k, id, ((id * 7 + 3) % 101 + 1) / (SELECT s FROM msum) AS p FROM v "
        "UNION ALL SELECT 1 AS k, id, ((id * 11 + 5) % 89 + 1) / (SELECT s FROM nsum) AS p FROM v),",
        "v0 AS (SELECT k, id, 1.0 AS vv FROM p),",
    ]
    for i in range(1, iters + 1):
        pr = i - 1
        lines += [
            f"kv{i} AS (SELECT a.k, a.id, a.vv + {w} * coalesce(s.nv, 0.0) AS kv "
            f"FROM v{pr} a LEFT JOIN (SELECT x.k, sym.dst AS id, sum(x.vv) AS nv "
            f"FROM sym JOIN v{pr} x ON sym.src = x.id GROUP BY x.k, sym.dst) s "
            f"ON a.k = s.k AND a.id = s.id),",
            f"w{i} AS (SELECT p.k, p.id, p.p / greatest(kv.kv, 1e-300) AS ww "
            f"FROM p JOIN kv{i} kv ON p.k = kv.k AND p.id = kv.id),",
            f"kw{i} AS (SELECT a.k, a.id, a.ww + {w} * coalesce(s.nv, 0.0) AS kw "
            f"FROM w{i} a LEFT JOIN (SELECT x.k, sym.dst AS id, sum(x.ww) AS nv "
            f"FROM sym JOIN w{i} x ON sym.src = x.id GROUP BY x.k, sym.dst) s "
            f"ON a.k = s.k AND a.id = s.id),",
            f"d{i} AS (SELECT vp.k, vp.id, vp.vv, greatest(vp.vv * kw.kw, 1e-300) AS d "
            f"FROM v{pr} vp JOIN kw{i} kw ON vp.k = kw.k AND vp.id = kw.id),",
            f"b{i} AS (SELECT id, exp(sum(0.5 * ln(d))) AS b FROM d{i} GROUP BY id),",
            f"v{i} AS (SELECT d.k, d.id, d.vv * b.b / d.d AS vv "
            f"FROM d{i} d JOIN b{i} b ON d.id = b.id),",
        ]
    lines[-1] = lines[-1].rstrip(",")
    return "\n".join(lines) + f"\nSELECT id, round(b, 9) AS b FROM b{iters}"


def q_graph_gw2(spark, sf_dir):
    """Gromov–Wasserstein transport, pinned to 2 proximal outer
    iterations × 3 inner Sinkhorn scalings on a deterministic 6×6
    fixture so the unrolled SQL oracle reproduces the reference loop
    (``reference src/ega/algorithms/gromov_wasserstein_graphs.py:
    511-561``) exactly. Returns the transport plan T."""
    from efficient_graph_algorithms_spark.operators.gw import (
        gromov_wasserstein_discrepancy,
    )

    r = spark.range(6)
    pairs = (
        r.select(F.col("id").alias("i"))
        .crossJoin(r.select(F.col("id").alias("j")))
        .where(F.col("i") != F.col("j"))
    )
    cs = pairs.select("i", "j", (((F.col("i") * 2 + F.col("j") * 3) % 5) / F.lit(4.0)).alias("c"))
    ct = pairs.select("i", "j", (((F.col("i") * 3 + F.col("j")) % 7) / F.lit(6.0)).alias("c"))
    ps = r.select(F.col("id").alias("i"), ((F.col("id") + 2) / F.lit(27.0)).alias("p"))
    pt = r.select(F.col("id").alias("j"), ((F.col("id") + 1) / F.lit(21.0)).alias("p"))
    trans, _, _ = gromov_wasserstein_discrepancy(
        spark, cs, ct, ps, pt, beta=0.1,
        outer_iter=2, inner_iter=3, sk_bound=0.0, iter_bound=0.0,
    )
    return trans.select("i", "j", F.round("t", 9).alias("t"))


def _gw2_oracle_sql(beta: float = 0.1, outers: int = 2, inners: int = 3) -> str:
    lines = [
        "WITH n AS (SELECT * FROM range(6) t(x)),",
        "cs AS (SELECT a.x AS i, b.x AS j, ((a.x*2 + b.x*3) % 5) / 4.0 AS c FROM n a, n b WHERE a.x <> b.x),",
        "ct AS (SELECT a.x AS i, b.x AS j, ((a.x*3 + b.x) % 7) / 6.0 AS c FROM n a, n b WHERE a.x <> b.x),",
        "ps AS (SELECT x AS i, (x + 2) / 27.0 AS p FROM n),",
        "pt AS (SELECT x AS j, (x + 1) / 21.0 AS p FROM n),",
        "f1 AS (SELECT cs.i, sum(cs.c * cs.c * ps.p) AS f1v FROM cs JOIN ps ON cs.j = ps.i GROUP BY cs.i),",
        "f2 AS (SELECT ct.i AS j, sum(ct.c * ct.c * pt.p) AS f2v FROM ct JOIN pt ON ct.j = pt.j GROUP BY ct.i),",
        "t0 AS (SELECT ps.i, pt.j, ps.p * pt.p AS t FROM ps, pt),",
        "a0_0 AS (SELECT i, 1.0/6.0 AS a FROM ps),",
    ]
    a_prev = "a0_0"
    for o in range(1, outers + 1):
        p = o - 1
        lines += [
            f"cst{o} AS (SELECT cs.i AS r, t.j AS c2, sum(cs.c * t.t) AS v "
            f"FROM cs JOIN t{p} t ON cs.j = t.i GROUP BY cs.i, t.j),",
            f"g{o} AS (SELECT cst.r AS i, ct.i AS j, sum(cst.v * ct.c) AS v "
            f"FROM cst{o} cst JOIN ct ON cst.c2 = ct.j GROUP BY cst.r, ct.i),",
            f"cost{o} AS (SELECT t.i, t.j, coalesce(f1.f1v, 0.0) + coalesce(f2.f2v, 0.0) "
            f"- 2.0 * coalesce(g.v, 0.0) AS v FROM t{p} t "
            f"LEFT JOIN g{o} g ON t.i = g.i AND t.j = g.j "
            f"LEFT JOIN f1 ON t.i = f1.i LEFT JOIN f2 ON t.j = f2.j),",
            f"k{o} AS (SELECT c.i, c.j, exp(-c.v / {beta}) * t.t AS kv "
            f"FROM cost{o} c JOIN t{p} t ON c.i = t.i AND c.j = t.j),",
        ]
        for s in range(1, inners + 1):
            lines += [
                f"b{o}_{s} AS (SELECT pt.j, pt.p / s.s AS b FROM pt JOIN "
                f"(SELECT k.j, sum(k.kv * a.a) AS s FROM k{o} k JOIN {a_prev} a ON k.i = a.i GROUP BY k.j) s "
                f"ON pt.j = s.j),",
                f"a{o}_{s} AS (SELECT ps.i, ps.p / s.s AS a FROM ps JOIN "
                f"(SELECT k.i, sum(k.kv * b.b) AS s FROM k{o} k JOIN b{o}_{s} b ON k.j = b.j GROUP BY k.i) s "
                f"ON ps.i = s.i),",
            ]
            a_prev = f"a{o}_{s}"
        lines.append(
            f"t{o} AS (SELECT k.i, k.j, a.a * k.kv * b.b AS t FROM k{o} k "
            f"JOIN a{o}_{inners} a ON k.i = a.i JOIN b{o}_{inners} b ON k.j = b.j),"
        )
    lines[-1] = lines[-1].rstrip(",")
    return "\n".join(lines) + f"\nSELECT i, j, round(t, 9) AS t FROM t{outers}"


def q_graph_gw_partition(spark, sf_dir):
    """Single-level GW graph partition (reference
    ``gromov_wasserstein_graphs.py:866-957``: estimate_target_
    distribution → GW vs diag(p_t) → argmax cluster assignment →
    within-cluster renormalized sub_probs), pinned to 2 proximal outer
    iterations × 3 inner Sinkhorn scalings on a deterministic 8-node
    two-block fixture so the unrolled SQL oracle reproduces the whole
    pipeline exactly. The recursive multi-level driver
    (``:960-1029``) is pytest-verified against the NumPy mirror
    (tests/test_gw_partition.py) — this query oracles one level.
    Returns (i, cluster, sub_p)."""
    from efficient_graph_algorithms_spark.operators.gw_partition import (
        graph_partition,
    )

    r = spark.range(8)
    pairs = (
        r.select(F.col("id").alias("i"))
        .crossJoin(r.select(F.col("id").alias("j")))
        .where(F.col("i") != F.col("j"))
    )
    # two dense blocks {0..3} / {4..7} with a weak 3-4 bridge
    cs = pairs.select(
        "i",
        "j",
        F.when((F.col("i") < 4) == (F.col("j") < 4), F.lit(1.0))
        .when(
            ((F.col("i") == 3) & (F.col("j") == 4))
            | ((F.col("i") == 4) & (F.col("j") == 3)),
            F.lit(0.05),
        )
        .otherwise(F.lit(0.0))
        .alias("c"),
    ).where(F.col("c") != 0.0)
    ps = r.select(F.col("id").alias("i"), ((F.col("id") + 1) / F.lit(36.0)).alias("p"))
    assign, _, _ = graph_partition(
        spark, cs, ps, dim_t=2, beta=0.1,
        outer_iter=2, inner_iter=3, sk_bound=0.0, iter_bound=0.0,
    )
    w = Window.partitionBy("cluster")
    return (
        assign.join(ps, "i")
        .select(
            "i",
            "cluster",
            F.round(F.col("p") / F.sum("p").over(w), 9).alias("sub_p"),
        )
    )


def _gw_partition_oracle_sql(beta: float = 0.1, outers: int = 2, inners: int = 3) -> str:
    """Unrolled mirror of q_graph_gw_partition: the dim_t=2 target
    distribution is exactly [max(p), min(p)] normalized (descending
    resample of p at x = 0 and 1), the target graph is its diagonal,
    then the same GW unroll shape as _gw2_oracle_sql, then the
    argmax-ratio cluster assignment and within-cluster renorm."""
    lines = [
        "WITH n AS (SELECT * FROM range(8) t(x)),",
        "cs AS (SELECT * FROM (SELECT a.x AS i, b.x AS j, "
        "CASE WHEN (a.x < 4) = (b.x < 4) THEN 1.0 "
        "WHEN (a.x = 3 AND b.x = 4) OR (a.x = 4 AND b.x = 3) THEN 0.05 "
        "ELSE 0.0 END AS c FROM n a, n b WHERE a.x <> b.x) WHERE c <> 0.0),",
        "ps AS (SELECT x AS i, (x + 1) / 36.0 AS p FROM n),",
        "ptv AS (SELECT max(p) AS hi, min(p) AS lo FROM ps),",
        "pt AS (SELECT 0 AS j, hi / (hi + lo) AS p FROM ptv "
        "UNION ALL SELECT 1 AS j, lo / (hi + lo) AS p FROM ptv),",
        "ct AS (SELECT j AS i, j, p AS c FROM pt),",
        "f1 AS (SELECT cs.i, sum(cs.c * cs.c * ps.p) AS f1v FROM cs JOIN ps ON cs.j = ps.i GROUP BY cs.i),",
        "f2 AS (SELECT ct.i AS j, sum(ct.c * ct.c * pt.p) AS f2v FROM ct JOIN pt ON ct.j = pt.j GROUP BY ct.i),",
        "t0 AS (SELECT ps.i, pt.j, ps.p * pt.p AS t FROM ps, pt),",
        "a0_0 AS (SELECT i, 1.0/8.0 AS a FROM ps),",
    ]
    a_prev = "a0_0"
    for o in range(1, outers + 1):
        p = o - 1
        lines += [
            f"cst{o} AS (SELECT cs.i AS r, t.j AS c2, sum(cs.c * t.t) AS v "
            f"FROM cs JOIN t{p} t ON cs.j = t.i GROUP BY cs.i, t.j),",
            f"g{o} AS (SELECT cst.r AS i, ct.i AS j, sum(cst.v * ct.c) AS v "
            f"FROM cst{o} cst JOIN ct ON cst.c2 = ct.j GROUP BY cst.r, ct.i),",
            f"cost{o} AS (SELECT t.i, t.j, coalesce(f1.f1v, 0.0) + coalesce(f2.f2v, 0.0) "
            f"- 2.0 * coalesce(g.v, 0.0) AS v FROM t{p} t "
            f"LEFT JOIN g{o} g ON t.i = g.i AND t.j = g.j "
            f"LEFT JOIN f1 ON t.i = f1.i LEFT JOIN f2 ON t.j = f2.j),",
            f"k{o} AS (SELECT c.i, c.j, exp(-c.v / {beta}) * t.t AS kv "
            f"FROM cost{o} c JOIN t{p} t ON c.i = t.i AND c.j = t.j),",
        ]
        for s in range(1, inners + 1):
            lines += [
                f"b{o}_{s} AS (SELECT pt.j, pt.p / s.s AS b FROM pt JOIN "
                f"(SELECT k.j, sum(k.kv * a.a) AS s FROM k{o} k JOIN {a_prev} a ON k.i = a.i GROUP BY k.j) s "
                f"ON pt.j = s.j),",
                f"a{o}_{s} AS (SELECT ps.i, ps.p / s.s AS a FROM ps JOIN "
                f"(SELECT k.i, sum(k.kv * b.b) AS s FROM k{o} k JOIN b{o}_{s} b ON k.j = b.j GROUP BY k.i) s "
                f"ON ps.i = s.i),",
            ]
            a_prev = f"a{o}_{s}"
        lines.append(
            f"t{o} AS (SELECT k.i, k.j, a.a * k.kv * b.b AS t FROM k{o} k "
            f"JOIN a{o}_{inners} a ON k.i = a.i JOIN b{o}_{inners} b ON k.j = b.j),"
        )
    lines += [
        # argmax_j t / pt[j], first max on ties (row_number, j asc)
        f"ranked AS (SELECT t.i, t.j, row_number() OVER "
        f"(PARTITION BY t.i ORDER BY t.t / pt.p DESC, t.j ASC) AS rn "
        f"FROM t{outers} t JOIN pt ON t.j = pt.j),",
        "cl AS (SELECT i, j AS cluster FROM ranked WHERE rn = 1)",
    ]
    return "\n".join(lines) + (
        "\nSELECT cl.i, cl.cluster, round(ps.p / sum(ps.p) OVER "
        "(PARTITION BY cl.cluster), 9) AS sub_p FROM cl JOIN ps ON cl.i = ps.i"
    )


HITS_SQL_ITERS = 2
HOST_MOD = 50  # synthetic hosts for the host-graph contraction query


def q_graph_hits(spark, sf_dir):
    """HITS_SQL_ITERS synchronous hubs/authorities steps on the derived
    graph — the real operators.hits loop, pinned to a fixed iteration
    count (tol=0.0) so the unrolled-SQL oracle computes the same thing."""
    from efficient_graph_algorithms_spark.operators.hits import hits

    e = _graph_edges(spark, sf_dir)
    out, _ = hits(spark, e, vertices=_vertices(e), max_iter=HITS_SQL_ITERS, tol=0.0)
    return out.select(
        "id",
        F.round("hub", 6).alias("hub"),
        F.round("authority", 6).alias("authority"),
    )


def _hits_oracle_sql() -> str:
    lines = [
        f"WITH e AS ({_E_SQL}),",
        f"v AS ({_V_SQL}),",
        "h0 AS (SELECT id, 1.0 AS h FROM v),",
    ]
    for i in range(1, HITS_SQL_ITERS + 1):
        p = i - 1
        lines += [
            # authority <- normalize2(A^T h)
            f"ar{i} AS (SELECT e.dst AS id, sum(h.h) AS a FROM e "
            f"JOIN h{p} h ON e.src = h.id GROUP BY e.dst),",
            f"af{i} AS (SELECT v.id, coalesce(ar.a, 0.0) AS a "
            f"FROM v LEFT JOIN ar{i} ar ON v.id = ar.id),",
            f"za{i} AS (SELECT sqrt(sum(a*a)) AS z FROM af{i}),",
            f"a{i} AS (SELECT id, a / (SELECT CASE WHEN z > 0 THEN z ELSE 1.0 END "
            f"FROM za{i}) AS a FROM af{i}),",
            # hub <- normalize2(A a)
            f"hr{i} AS (SELECT e.src AS id, sum(a.a) AS h FROM e "
            f"JOIN a{i} a ON e.dst = a.id GROUP BY e.src),",
            f"hf{i} AS (SELECT v.id, coalesce(hr.h, 0.0) AS h "
            f"FROM v LEFT JOIN hr{i} hr ON v.id = hr.id),",
            f"zh{i} AS (SELECT sqrt(sum(h*h)) AS z FROM hf{i}),",
            f"h{i} AS (SELECT id, h / (SELECT CASE WHEN z > 0 THEN z ELSE 1.0 END "
            f"FROM zh{i}) AS h FROM hf{i}),",
        ]
    lines[-1] = lines[-1].rstrip(",")
    k = HITS_SQL_ITERS
    return "\n".join(lines) + (
        f"\nSELECT h.id, round(h.h, 6) AS hub, round(a.a, 6) AS authority"
        f"\nFROM h{k} h JOIN a{k} a ON h.id = a.id"
    )


def q_graph_salsa2(spark, sf_dir):
    """Two synchronous SALSA steps (stochastic HITS, Lempel & Moran
    2000) on the derived graph — the real operators.hits.salsa loop
    pinned to a fixed iteration count so the unrolled-SQL oracle
    computes the same thing."""
    from efficient_graph_algorithms_spark.operators.hits import salsa

    e = _graph_edges(spark, sf_dir)
    out, _ = salsa(spark, e, vertices=_vertices(e), max_iter=2, tol=0.0)
    return out.select(
        "id",
        F.round("hub", 6).alias("hub"),
        F.round("authority", 6).alias("authority"),
    )


def _salsa_oracle_sql(iters: int = 2) -> str:
    lines = [
        f"WITH e AS ({_E_SQL}),",
        f"v AS ({_V_SQL}),",
        "outd AS (SELECT src, count(*) AS d FROM e GROUP BY src),",
        "ind AS (SELECT dst, count(*) AS d FROM e GROUP BY dst),",
        "h0 AS (SELECT id, 1.0 AS h FROM v),",
    ]
    for i in range(1, iters + 1):
        p = i - 1
        lines += [
            # authority <- normalize1(L_c^T h), L_c weight 1/out(src)
            f"ar{i} AS (SELECT e.dst AS id, sum(h.h / od.d) AS a FROM e "
            f"JOIN h{p} h ON e.src = h.id JOIN outd od ON e.src = od.src "
            f"GROUP BY e.dst),",
            f"af{i} AS (SELECT v.id, coalesce(ar.a, 0.0) AS a "
            f"FROM v LEFT JOIN ar{i} ar ON v.id = ar.id),",
            f"za{i} AS (SELECT sum(abs(a)) AS z FROM af{i}),",
            f"a{i} AS (SELECT id, a / (SELECT CASE WHEN z > 0 THEN z ELSE 1.0 END "
            f"FROM za{i}) AS a FROM af{i}),",
            # hub <- normalize1(L_r a), L_r weight 1/in(dst)
            f"hr{i} AS (SELECT e.src AS id, sum(a.a / ind.d) AS h FROM e "
            f"JOIN a{i} a ON e.dst = a.id JOIN ind ON e.dst = ind.dst "
            f"GROUP BY e.src),",
            f"hf{i} AS (SELECT v.id, coalesce(hr.h, 0.0) AS h "
            f"FROM v LEFT JOIN hr{i} hr ON v.id = hr.id),",
            f"zh{i} AS (SELECT sum(abs(h)) AS z FROM hf{i}),",
            f"h{i} AS (SELECT id, h / (SELECT CASE WHEN z > 0 THEN z ELSE 1.0 END "
            f"FROM zh{i}) AS h FROM hf{i}),",
        ]
    lines[-1] = lines[-1].rstrip(",")
    return "\n".join(lines) + (
        f"\nSELECT h.id, round(h.h, 6) AS hub, round(a.a, 6) AS authority"
        f"\nFROM h{iters} h JOIN a{iters} a ON h.id = a.id"
    )


def q_graph_host_graph(spark, sf_dir):
    """Page graph -> host graph through the real URL-parsing contraction
    path (try_parse_url + contract_by_key). Vertices get deterministic
    synthetic URLs (host = id % HOST_MOD) so the oracle can compute the
    host arithmetically while Spark actually parses the URL string."""
    from efficient_graph_algorithms_spark.operators.contract import host_graph

    e = _graph_edges(spark, sf_dir)
    url_dict = _vertices(e).select(
        "id",
        F.concat(
            F.lit("https://host-"),
            (F.col("id") % HOST_MOD).cast("string"),
            F.lit(".example/p/"),
            F.col("id").cast("string"),
        ).alias("url"),
    )
    return host_graph(e, url_dict)


_HOST_GRAPH_SQL = f"""
WITH e AS ({_E_SQL}), v AS ({_V_SQL}),
m AS (SELECT id, 'host-' || CAST(id % {HOST_MOD} AS VARCHAR) || '.example' AS key FROM v)
SELECT sm.key AS src_key, dm.key AS dst_key, count(*) AS weight
FROM e JOIN m sm ON e.src = sm.id JOIN m dm ON e.dst = dm.id
WHERE sm.key <> dm.key
GROUP BY sm.key, dm.key
"""


# ---------------------------------------------------------------------------
# relational operator queries (TPC-H-ish tables)
# ---------------------------------------------------------------------------

def q_rel_groupby_sum(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.where(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("sum_disc_price"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


def q_rel_join_agg(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    return (
        o.join(c, o["o_custkey"] == c["c_custkey"])
        .join(n, c["c_nationkey"] == n["n_nationkey"])
        .groupBy("n_name")
        .agg(
            F.round(F.sum("o_totalprice"), 2).alias("revenue"),
            F.count("*").alias("n_orders"),
        )
    )


def q_rel_window_argmax(spark, sf_dir):
    """Per-customer top order (the LPA argmax window shape)."""
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        o.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(
            F.col("o_custkey").alias("custkey"),
            F.col("o_orderkey").alias("top_orderkey"),
            F.round("o_totalprice", 2).alias("top_price"),
        )
    )


def q_rel_window_rank(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        o.withColumn("rnk", F.rank().over(w))
        .where(F.col("rnk") <= 3)
        .select(
            "o_orderpriority",
            F.col("o_orderkey").alias("orderkey"),
            F.col("rnk").cast("long").alias("rnk"),
        )
    )


def q_rel_topk(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    return (
        o.orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(10)
        .select(
            F.col("o_orderkey").alias("orderkey"),
            F.round("o_totalprice", 2).alias("totalprice"),
        )
    )


def q_rel_semi_anti(spark, sf_dir):
    """Customers with no high-value orders (anti-join frontier
    subtraction, reference's `cluster -= new_cluster` shape)."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").where(F.col("o_totalprice") > 150000)
    return (
        c.join(o.select(F.col("o_custkey").alias("c_custkey")), "c_custkey", "left_anti")
        .select(F.col("c_custkey").alias("custkey"))
    )


def q_rel_set_ops(spark, sf_dir):
    """Intersection of customer nations and supplier nations."""
    c = _t(spark, sf_dir, "customer").select(F.col("c_nationkey").cast("long").alias("nationkey"))
    s = _t(spark, sf_dir, "supplier").select(F.col("s_nationkey").cast("long").alias("nationkey"))
    return c.intersect(s)


def q_rel_onehot_mask(spark, sf_dir):
    """Field masking (reference interpolator zero-out): acctbal zeroed
    outside the BUILDING segment, indicator column added."""
    c = _t(spark, sf_dir, "customer")
    return c.select(
        F.col("c_custkey").alias("custkey"),
        F.when(F.col("c_mktsegment") == "BUILDING", F.round("c_acctbal", 2))
        .otherwise(F.lit(0.0))
        .alias("masked_bal"),
        (F.col("c_mktsegment") == "BUILDING").cast("long").alias("ind"),
    )


def q_rel_histogram(spark, sf_dir):
    """width_bucket histogram of order totalprice, 10 buckets [0, 500k)."""
    o = _t(spark, sf_dir, "orders")
    return (
        o.select(
            F.least(
                F.lit(10), F.floor(F.col("o_totalprice") / 50000.0).cast("long")
            ).alias("bucket")
        )
        .groupBy("bucket")
        .agg(F.count("*").alias("n"))
    )


def q_rel_stats(spark, sf_dir):
    """Welford-style grouped stats (reference eval_kernel_statistics)."""
    c = _t(spark, sf_dir, "customer")
    return c.groupBy(F.col("c_nationkey").cast("long").alias("nationkey")).agg(
        F.round(F.avg("c_acctbal"), 6).alias("mean_bal"),
        F.round(F.var_samp("c_acctbal"), 4).alias("var_bal"),
        F.count("*").alias("n"),
    )


def q_rel_zscore(spark, sf_dir):
    """z-score correction (reference graph_kernels zscore)."""
    c = _t(spark, sf_dir, "customer")
    w = Window.partitionBy("c_nationkey")
    return c.select(
        F.col("c_custkey").alias("custkey"),
        F.round(
            (F.col("c_acctbal") - F.avg("c_acctbal").over(w))
            / F.stddev_samp("c_acctbal").over(w),
            6,
        ).alias("z"),
    )


def q_rel_scalar_math(spark, sf_dir):
    """Kernel function application: exp(-λx), log1p, sqrt, clamp
    (reference gaussian_kernel / f_fun lambdas)."""
    p = _t(spark, sf_dir, "part")
    x = F.col("p_retailprice") / 1000.0
    return p.select(
        F.col("p_partkey").alias("partkey"),
        F.round(F.exp(-F.lit(0.5) * x), 6).alias("exp_kernel"),
        F.round(F.log1p(x), 6).alias("log1p_x"),
        F.round(F.sqrt(x), 6).alias("sqrt_x"),
        F.round(F.greatest(F.least(x, F.lit(1.5)), F.lit(0.5)), 6).alias("clamped"),
    )


def q_rel_date_filter(spark, sf_dir):
    """Snapshot-style timestamp predicate (warc_ts pattern)."""
    o = _t(spark, sf_dir, "orders")
    return (
        o.where(F.col("o_orderdate") < F.lit("1998-01-01"))
        .groupBy(F.year("o_orderdate").cast("long").alias("yr"))
        .agg(F.count("*").alias("n"), F.round(F.sum("o_totalprice"), 2).alias("rev"))
    )


def q_rel_minplus_join(spark, sf_dir):
    """Min-plus semiring aggregate (reference cluster relator
    T[i][j] = min_k(eta_i[k] + eta_j[k])): cheapest supplier+part cost
    pairing per (nation, brand)."""
    s = _t(spark, sf_dir, "supplier")
    p = _t(spark, sf_dir, "part")
    return (
        s.crossJoin(p.where(F.col("p_size") <= 5))
        .groupBy(
            F.col("s_nationkey").cast("long").alias("nationkey"), F.col("p_brand").alias("brand")
        )
        .agg(F.round(F.min(F.col("s_acctbal") + F.col("p_retailprice")), 2).alias("min_cost"))
    )


def q_rel_distinct(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    return li.select("l_returnflag", "l_linestatus").distinct()


def q_rel_interp_metrics(spark, sf_dir):
    """Interpolation error metrics: Frobenius norm + mean cosine
    similarity between two derived 2-d fields (reference
    calculate_interpolation_metrics, mesh_utils.py:110-123)."""
    c = _t(spark, sf_dir, "customer")
    a1 = F.col("c_acctbal")
    a2 = (F.col("c_custkey") % 997).cast("double")
    b1 = a1 * 1.01 + 5.0
    b2 = a2 * 0.99 - 3.0
    dot = a1 * b1 + a2 * b2
    na = F.sqrt(a1 * a1 + a2 * a2)
    nb = F.sqrt(b1 * b1 + b2 * b2)
    return c.agg(
        F.round(F.sqrt(F.sum(F.pow(a1 - b1, 2) + F.pow(a2 - b2, 2))), 4).alias("frobenius"),
        F.round(F.avg(F.when((na > 0) & (nb > 0), dot / (na * nb))), 6).alias("mean_cosine"),
    )


def q_rel_percentiles(spark, sf_dir):
    """Sorted-distribution resampling via interpolated percentiles
    (reference estimate_target_distribution np.interp,
    gromov_wasserstein_graphs.py:731-750)."""
    o = _t(spark, sf_dir, "orders")
    return o.agg(
        *[
            F.round(F.expr(f"percentile(o_totalprice, {q})"), 4).alias(f"p{int(q*100)}")
            for q in (0.1, 0.25, 0.5, 0.75, 0.9)
        ]
    )


def q_rel_union_except(spark, sf_dir):
    """Union + difference set ops (reference _merge_trees union,
    bartal_trees.py:82-104; frontier subtraction frt_trees.py:98)."""
    c = (
        _t(spark, sf_dir, "customer")
        .where(F.col("c_acctbal") > 9800)
        .select(F.col("c_nationkey").cast("long").alias("k"))
    )
    s = (
        _t(spark, sf_dir, "supplier")
        .where(F.col("s_acctbal") > 9800)
        .select(F.col("s_nationkey").cast("long").alias("k"))
    )
    n = _t(spark, sf_dir, "nation").select(F.col("n_nationkey").cast("long").alias("k"))
    return n.exceptAll(
        c.distinct().unionByName(s.distinct()).distinct()
    ).select(F.col("k").alias("nation_without_partners"))


# ---------------------------------------------------------------------------
# text / dedup / similarity queries
# ---------------------------------------------------------------------------

def q_text_features(spark, sf_dir):
    from efficient_graph_algorithms_spark.functions.text import (
        bpe_token_count,
        fingerprint60,
        lang_id,
        quality_score,
        token_count,
    )

    d = _t(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        token_count(F.col("text")).alias("n_tokens"),
        bpe_token_count(F.col("text")).alias("n_bpe_tokens"),
        lang_id(F.col("text")).alias("lang_pred"),
        quality_score(F.col("text")).alias("quality"),
        fingerprint60(F.col("text")).alias("fp"),
    )


def q_corpus_sample(spark, sf_dir):
    """Training-corpus prep gate: quality filter then per-language
    deterministic hash sampling — the whole pipeline is row-local
    column expressions in the scan stage (zero shuffle at any scale);
    the kept set is a pure function of (doc_id, seed), bit-identical
    in the SQL oracle."""
    from efficient_graph_algorithms_spark.functions.text import quality_score
    from efficient_graph_algorithms_spark.operators.sampling import stratified_sample

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    qualified = docs.where(quality_score(F.col("text")) >= 400)
    return stratified_sample(
        qualified, {"en": 0.5, "de": 0.25, "fr": 0.25}, default_rate=0.125, seed=7
    ).select("doc_id", "stratum")


def _corpus_sample_sql(qmin: int = 400, seed: int = 7) -> str:
    from efficient_graph_algorithms_spark.functions.text import (
        duck_lang_id,
        duck_quality_score,
    )
    from efficient_graph_algorithms_spark.operators.sampling import rate_threshold

    h = f"(('0x' || substr(md5('smpl:{seed}:' || doc_id::VARCHAR), 1, 15))::BIGINT)"
    thr = (
        f"CASE {duck_lang_id('text')} "
        f"WHEN 'de' THEN {rate_threshold(0.25)} "
        f"WHEN 'en' THEN {rate_threshold(0.5)} "
        f"WHEN 'fr' THEN {rate_threshold(0.25)} "
        f"ELSE {rate_threshold(0.125)} END"
    )
    return (
        f"SELECT doc_id, {duck_lang_id('text')} AS stratum FROM documents "
        f"WHERE {duck_quality_score('text')} >= {qmin} AND {h} < {thr}"
    )


CAP_PER_SOURCE = 10  # sources carry 25 docs each at sf0.01 — the cap bites


def q_corpus_cap_source(spark, sf_dir):
    """Per-source corpus quota: keep at most CAP_PER_SOURCE docs per
    source, chosen deterministically by hash order — the per-domain
    mixing rule of corpus prep (one key shuffle + in-partition rank)."""
    from efficient_graph_algorithms_spark.operators.sampling import cap_per_key

    docs = _t(spark, sf_dir, "documents").select("doc_id", "source")
    return cap_per_key(docs, "source", CAP_PER_SOURCE, seed=42)


def _corpus_cap_source_sql(n: int = CAP_PER_SOURCE, seed: int = 42) -> str:
    h = f"(('0x' || substr(md5('smpl:{seed}:' || doc_id::VARCHAR), 1, 15))::BIGINT)"
    return (
        "SELECT doc_id, source FROM ("
        "SELECT doc_id, source, row_number() OVER ("
        f"PARTITION BY source ORDER BY {h}, doc_id) AS rn FROM documents) "
        f"WHERE rn <= {n}"
    )


def q_corpus_pipeline(spark, sf_dir):
    """The end-to-end corpus-prep accounting query a data team runs:
    near-dup clustering keeps one representative per cluster, a quality
    floor drops junk, per-language deterministic sampling sets the mix,
    and the output is the per-language doc and BPE-token budget of the
    resulting corpus. Every stage is exact integer arithmetic, so the
    whole pipeline composes into one exact SQL oracle."""
    from efficient_graph_algorithms_spark.functions.text import (
        bpe_token_count,
        quality_score,
    )
    from efficient_graph_algorithms_spark.operators.dedup import dedup_clusters
    from efficient_graph_algorithms_spark.operators.sampling import stratified_sample

    docs = _dup_docs(spark, sf_dir)
    keep = dedup_clusters(spark, docs, threshold=0.5).where(F.col("keep") == 1)
    kept_docs = docs.join(keep.select("doc_id"), "doc_id")
    qualified = kept_docs.where(quality_score(F.col("text")) >= 300)
    sampled = stratified_sample(
        qualified, {"en": 0.5, "de": 0.25, "fr": 0.25}, default_rate=0.125, seed=11
    )
    return (
        sampled.groupBy("stratum")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(bpe_token_count(F.col("text"))).cast("long").alias("n_bpe_tokens"),
        )
    )


def _corpus_pipeline_sql(qmin: int = 300, seed: int = 11) -> str:
    from efficient_graph_algorithms_spark.functions.text import (
        duck_bpe_token_count,
        duck_lang_id,
        duck_quality_score,
    )
    from efficient_graph_algorithms_spark.operators.sampling import rate_threshold

    h = f"(('0x' || substr(md5('smpl:{seed}:' || doc_id::VARCHAR), 1, 15))::BIGINT)"
    thr = (
        f"CASE {duck_lang_id('text')} "
        f"WHEN 'de' THEN {rate_threshold(0.25)} "
        f"WHEN 'en' THEN {rate_threshold(0.5)} "
        f"WHEN 'fr' THEN {rate_threshold(0.25)} "
        f"ELSE {rate_threshold(0.125)} END"
    )
    return f"""
WITH RECURSIVE {_minhash_sims_cte()},
prs AS (SELECT a, b FROM sims WHERE sig_sim >= 0.5),
ed AS (SELECT a AS u, b AS v FROM prs UNION SELECT b AS u, a AS v FROM prs),
reach(u, v) AS (
  SELECT u, v FROM ed
  UNION
  SELECT r.u, e.v FROM reach r JOIN ed e ON r.v = e.u WHERE e.v <> r.u
),
rep AS (SELECT u AS doc_id, least(u, min(v)) AS rep_id FROM reach GROUP BY u),
alldocs AS ({_DUP_DOCS_SQL}),
kept AS (SELECT d.doc_id, d.text FROM alldocs d LEFT JOIN rep r ON r.doc_id = d.doc_id
         WHERE coalesce(r.rep_id, d.doc_id) = d.doc_id),
qual AS (SELECT doc_id, text FROM kept WHERE {duck_quality_score('text')} >= {qmin}),
sampled AS (SELECT doc_id, text, {duck_lang_id('text')} AS stratum
            FROM qual WHERE {h} < {thr})
SELECT stratum, count(*) AS n_docs,
       sum({duck_bpe_token_count('text')})::BIGINT AS n_bpe_tokens
FROM sampled GROUP BY stratum
"""


def _text_features_sql() -> str:
    from efficient_graph_algorithms_spark.functions.text import (
        duck_bpe_token_count,
        duck_fingerprint60,
        duck_lang_id,
        duck_quality_score,
        duck_token_count,
    )

    return (
        "SELECT doc_id, "
        f"CAST({duck_token_count('text')} AS BIGINT) AS n_tokens, "
        f"CAST({duck_bpe_token_count('text')} AS BIGINT) AS n_bpe_tokens, "
        f"{duck_lang_id('text')} AS lang_pred, "
        f"{duck_quality_score('text')} AS quality, "
        f"{duck_fingerprint60('text')} AS fp FROM documents"
    )


# documents augmented with planted duplicates (same CTE both engines)
_DUP_DOCS_SQL = (
    "SELECT doc_id, text FROM documents "
    "UNION ALL SELECT doc_id + 100000 AS doc_id, text FROM documents WHERE doc_id < 50"
)


def _dup_docs(spark, sf_dir):
    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    return d.unionByName(
        d.where(F.col("doc_id") < 50).select((F.col("doc_id") + 100000).alias("doc_id"), "text")
    )


def q_dedup_exact(spark, sf_dir):
    from efficient_graph_algorithms_spark.operators.dedup import exact_duplicates

    return exact_duplicates(_dup_docs(spark, sf_dir))


def q_dedup_ngram_jaccard(spark, sf_dir):
    from efficient_graph_algorithms_spark.operators.dedup import ngram_jaccard_pairs

    return ngram_jaccard_pairs(_dup_docs(spark, sf_dir), threshold=0.8)


def q_dedup_minhash_lsh(spark, sf_dir):
    from efficient_graph_algorithms_spark.operators.dedup import minhash_lsh_pairs

    return minhash_lsh_pairs(_dup_docs(spark, sf_dir), threshold=0.5)


def q_dedup_simhash(spark, sf_dir):
    from efficient_graph_algorithms_spark.operators.dedup import simhash_pairs

    return simhash_pairs(_dup_docs(spark, sf_dir), max_hamming=SIMHASH_MAXHAM)


def q_dedup_clusters(spark, sf_dir):
    """End-to-end dedup: minhash-LSH pairs -> connected components over
    the pair graph -> one kept representative (min doc_id) per cluster.
    One row per document; the oracle closes the same pair table
    transitively with a recursive CTE."""
    from efficient_graph_algorithms_spark.operators.dedup import dedup_clusters

    return dedup_clusters(spark, _dup_docs(spark, sf_dir), threshold=0.5)


def q_sim_cosine_topk(spark, sf_dir):
    from efficient_graph_algorithms_spark.operators.similarity import cosine_topk

    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("qid"), F.col("embedding")
    )
    return cosine_topk(emb, queries, k=5)


def q_sim_ivf_topk(spark, sf_dir):
    """IVF ANN top-k driven end-to-end (Lloyd quantizer training, corpus
    list assignment, query probe ranking, candidate equi-join) in the
    exhaustive n_probe = n_centroids configuration, whose result is
    provably the exact brute-force top-k — so the brute SQL is a strict
    oracle for the whole IVF pipeline. The recall/cost dial (n_probe <
    n_centroids) is pinned by tests/test_similarity_multimodal.py."""
    from efficient_graph_algorithms_spark.operators.ann import ivf_topk

    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("qid"), F.col("embedding")
    )
    return ivf_topk(emb, queries, k=5, n_centroids=8, n_probe=8, n_iter=3)


def q_sim_cosine_pairs(spark, sf_dir):
    from efficient_graph_algorithms_spark.operators.similarity import cosine_pairs

    emb = _t(spark, sf_dir, "embeddings").where(F.col("vec_id") < 200)
    return cosine_pairs(emb, threshold=COS_THRESHOLD)


def q_sem_dedup(spark, sf_dir):
    """SemDeDup in its exhaustive configuration (n_centroids=1 =
    brute-force pairs, so the keep-first rule has an exact SQL oracle);
    the clustered scale path is pytest-verified (kept-set supersets)."""
    from efficient_graph_algorithms_spark.operators.similarity import semantic_dedup

    emb = _t(spark, sf_dir, "embeddings").where(F.col("vec_id") < 200)
    return semantic_dedup(emb, threshold=COS_THRESHOLD, n_centroids=1)


LSH_PAIR_PLANES = 6
LSH_PAIR_THRESHOLD = 0.25


def q_sim_cosine_pairs_lsh(spark, sf_dir):
    """The LSH-bucketed near-dup path (scale path for cosine pairs):
    candidates only from same-bucket agreement, then exact cosine.
    Oracle mirrors the algorithm with the same hyperplane literals;
    recall vs exact on planted duplicates is asserted in
    tests/test_similarity_multimodal.py."""
    from efficient_graph_algorithms_spark.operators.similarity import cosine_pairs_lsh

    emb = _t(spark, sf_dir, "embeddings")
    return cosine_pairs_lsh(
        emb, threshold=LSH_PAIR_THRESHOLD, n_planes=LSH_PAIR_PLANES, dim=EMB_DIM
    )


def _sim_pairs_lsh_oracle_sql() -> str:
    from efficient_graph_algorithms_spark.functions.hashing import uniform01
    import numpy as np

    planes = [
        [1.0 if u >= 0.5 else -1.0
         for u in uniform01(42, np.arange(EMB_DIM, dtype=np.uint64), stream=100 + i)]
        for i in range(LSH_PAIR_PLANES)
    ]
    bits = " + ".join(
        f"(CASE WHEN list_dot_product(embedding::DOUBLE[], {p!r}) > 0 "
        f"THEN {1 << i} ELSE 0 END)"
        for i, p in enumerate(planes)
    )
    return f"""
WITH bk AS (SELECT vec_id, {bits} AS bucket FROM embeddings),
cand AS (SELECT x.vec_id AS a, y.vec_id AS b FROM bk x
         JOIN bk y ON x.bucket = y.bucket AND x.vec_id < y.vec_id)
SELECT c.a, c.b, round({_COS_EXPR}, 4) AS cos FROM cand c
JOIN embeddings x ON x.vec_id = c.a JOIN embeddings y ON y.vec_id = c.b
WHERE round({_COS_EXPR}, 4) >= {LSH_PAIR_THRESHOLD}
"""


def q_stream_windowed_counts(spark, sf_dir):
    from efficient_graph_algorithms_spark.streaming.events import windowed_event_counts

    return windowed_event_counts(_t(spark, sf_dir, "events"))


def q_events_user_activity(spark, sf_dir):
    from efficient_graph_algorithms_spark.streaming.events import user_activity

    return user_activity(_t(spark, sf_dir, "events"))


def q_events_sessionize(spark, sf_dir):
    """Gap-based sessionization (12 h gap) — the batch face of the custom
    stateful streaming operator (streaming/sessions.py); the streaming
    face (applyInPandasWithState, event-time timeout) is proven equal to
    this by tests/test_similarity_multimodal.py."""
    from efficient_graph_algorithms_spark.streaming.sessions import sessionize

    return sessionize(_t(spark, sf_dir, "events"), gap_sec=12 * 3600)


def q_multimodal_features(spark, sf_dir):
    """Binary-payload feature extraction, ALL THREE modalities REAL:
    even doc_ids carry a deterministically synthesized RIFF/WAVE
    payload decoded end-to-end by the pure-NumPy WAV parser
    (multimodal.decode_wav — sample rate 8000, 1-2 channels, 400-610
    frames, all derived from doc_id); doc_id % 4 == 1 rows carry a
    synthesized YUV4MPEG2 video (16-46 x 10-24 px, 2-5 frames, 25 fps,
    C420jpeg, doc_id-derived moving gradient) decoded end-to-end by
    decode_y4m; the remaining odd doc_ids carry a synthesized 24-bit
    BMP (16-47 x 8-23 px) decoded end-to-end by decode_bmp (round-trip
    + padding/top-down cases in pytest). The oracle reproduces the
    WAV/Y4M/BMP header fields as pure arithmetic on doc_id, so all
    three real decodes are hash-verified, not rows-only."""
    from efficient_graph_algorithms_spark.operators.multimodal import (
        extract_media_features,
    )

    d = _t(spark, sf_dir, "documents")

    def gen(batches):
        import numpy as np
        import pandas as pd

        from efficient_graph_algorithms_spark.operators.multimodal import (
            encode_bmp24,
            encode_wav_pcm16,
            encode_y4m,
        )

        for b in batches:
            rows = []
            for did in b["doc_id"]:
                did = int(did)
                if did % 2 == 0:
                    n_ch = 1 + ((did // 2) % 2)
                    n_frames = 400 + did % 211
                    t = np.arange(n_frames) / 8000.0
                    mono = 0.5 * np.sin(2 * np.pi * (110.0 + did % 40) * t)
                    samples = np.repeat(mono[:, None], n_ch, axis=1)
                    rows.append((did, "audio", encode_wav_pcm16(samples, 8000)))
                elif did % 4 == 1:
                    # even dims so the 4:2:0 chroma planes are integral;
                    # frame count keyed on did//4 so it VARIES across the
                    # did % 4 == 1 stratum (did % 4 would be constant 1)
                    w, h = 16 + (did % 16) * 2, 10 + (did % 8) * 2
                    n_frames = 2 + (did // 4) % 4
                    x = np.arange(w, dtype=np.int64)[None, None, :]
                    y = np.arange(h, dtype=np.int64)[None, :, None]
                    i = np.arange(n_frames, dtype=np.int64)[:, None, None]
                    luma = ((x * 2 + y * 7 + i * 11 + did) % 256).astype(np.uint8)
                    rows.append(
                        (did, "video", encode_y4m(luma, colourspace="420jpeg"))
                    )
                else:
                    w, h = 16 + did % 32, 8 + did % 16
                    # int64 throughout: uint8 + a large Python int raises
                    # OverflowError under NumPy 2 promotion rules
                    x = np.arange(w, dtype=np.int64)[None, :, None]
                    y = np.arange(h, dtype=np.int64)[:, None, None]
                    img = ((x * 3 + y * 5 + did) % 256).astype(np.uint8)
                    rows.append((did, "image", encode_bmp24(np.broadcast_to(img, (h, w, 3)))))
            yield pd.DataFrame(rows, columns=["media_id", "kind", "payload"])

    media = d.select("doc_id").mapInPandas(
        gen, "media_id long, kind string, payload binary"
    )
    return extract_media_features(media, deterministic_fake=False).select(
        "media_id", "kind", "n_bytes", "width", "height"
    )


def q_video_frame_stats(spark, sf_dir):
    """Video frame sampling, REAL decode: doc_id % 4 == 1 rows carry a
    synthesized YUV4MPEG2 payload whose frames are flat luminance
    fields (frame j of doc d is uniformly (d*31 + j*37) % 256), so the
    per-frame statistics sample_video_frames computes on the decoded
    pixels reduce to exact arithmetic the oracle reproduces. Every
    2nd frame is sampled (always including frame 0); luma255 is the
    decoded frame mean scaled back to the 8-bit grid — exact because
    each frame is a constant field."""
    from efficient_graph_algorithms_spark.operators.multimodal import (
        sample_video_frames,
    )

    d = _t(spark, sf_dir, "documents").where("doc_id % 4 = 1")

    def gen(batches):
        import numpy as np
        import pandas as pd

        from efficient_graph_algorithms_spark.operators.multimodal import (
            encode_y4m,
        )

        for b in batches:
            rows = []
            for did in b["doc_id"]:
                did = int(did)
                w, h = 16 + (did % 16) * 2, 10 + (did % 8) * 2
                n_frames = 2 + (did // 4) % 4
                luma = np.stack(
                    [
                        np.full((h, w), (did * 31 + j * 37) % 256, dtype=np.uint8)
                        for j in range(n_frames)
                    ]
                )
                rows.append((did, "video", encode_y4m(luma, colourspace="420jpeg")))
            yield pd.DataFrame(rows, columns=["media_id", "kind", "payload"])

    media = d.select("doc_id").mapInPandas(
        gen, "media_id long, kind string, payload binary"
    )
    return sample_video_frames(media, every_n=2).select(
        "media_id",
        "frame_idx",
        F.round(F.col("luma_mean") * 255).cast("long").alias("luma255"),
    )


def q_image_jpeg_stats(spark, sf_dir):
    """REAL JPEG decode, hash-verified: doc_id % 5 == 2 rows carry a
    flat-field grayscale baseline JPEG (level (doc_id*29) % 256, dims
    doc_id-derived multiples of 8) synthesized by encode_jpeg and
    decoded end-to-end by the pure-NumPy baseline-DCT decoder inside
    extract_media_features. A flat field has zero AC energy, so the
    quant=1 decode is EXACT (pytest test_jpeg_flat_field_exact) and the
    oracle reproduces width/height/luma as pure arithmetic on doc_id —
    the same flat-field pattern as video_frame_stats."""
    from efficient_graph_algorithms_spark.operators.multimodal import (
        extract_media_features,
    )

    d = _t(spark, sf_dir, "documents").where(F.col("doc_id") % 5 == 2)

    def gen(batches):
        import numpy as np
        import pandas as pd

        from efficient_graph_algorithms_spark.operators.multimodal import (
            encode_jpeg,
        )

        for b in batches:
            rows = []
            for did in b["doc_id"]:
                did = int(did)
                w = 8 + (did % 4) * 8
                h = 8 + (did % 3) * 8
                img = np.full((h, w), (did * 29) % 256, dtype=np.uint8)
                rows.append((did, "image", encode_jpeg(img, quant=1)))
            yield pd.DataFrame(rows, columns=["media_id", "kind", "payload"])

    media = d.select("doc_id").mapInPandas(
        gen, "media_id long, kind string, payload binary"
    )
    feats = extract_media_features(media, deterministic_fake=False)
    return feats.select(
        "media_id",
        F.col("width").cast("long").alias("width"),
        F.col("height").cast("long").alias("height"),
        F.round(F.element_at("features", 1) * 255)
        .cast("long")
        .alias("luma255"),
    )


SHARD_TOKENS = 2048


def q_corpus_shards(spark, sf_dir):
    """Fixed-token training-shard packing via the distributed prefix
    sum (operators/sampling.py assign_shards); the oracle is the
    equivalent GLOBAL window cumsum — equality proves the range-
    partitioned two-phase sum reproduces the serial semantics."""
    from efficient_graph_algorithms_spark.operators.sampling import assign_shards

    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    return assign_shards(d, shard_tokens=SHARD_TOKENS, seed=42)


def q_text_decontam(spark, sf_dir):
    """Benchmark decontamination: flag documents sharing a word-6-gram
    with a probe set. The probe set is synthesized deterministically
    (identically in the SQL oracle): every doc with doc_id % 41 == 7
    contributes its first 8 normalized tokens as one probe row. The
    corpus side never self-joins — probes broadcast."""
    from efficient_graph_algorithms_spark.functions.text import normalized_text
    from efficient_graph_algorithms_spark.operators.decontam import decontaminate

    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    toks = F.split(normalized_text(F.col("text")), " ")
    probes = d.where((F.col("doc_id") % 41 == 7) & (F.size(toks) >= 8)).select(
        F.concat_ws(" ", F.slice(toks, 1, 8)).alias("text")
    )
    return decontaminate(d, probes, width=6)


def q_text_pii(spark, sf_dir):
    """PII detection/redaction with deterministically planted spans
    (emails on doc_id % 7, IPv4s on doc_id % 11 — same construction in
    the SQL oracle): per-doc span counts + redacted-text fingerprint."""
    from efficient_graph_algorithms_spark.operators.pii import pii_features

    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    did = F.col("doc_id")
    planted = F.concat(
        F.col("text"),
        F.when(
            did % 7 == 0,
            F.concat(
                F.lit(" contact user"), did.cast("string"), F.lit("@example.com now")
            ),
        ).otherwise(F.lit("")),
        F.when(
            did % 11 == 0,
            F.concat(
                F.lit(" host 10."),
                (did % 200).cast("string"),
                F.lit(".3."),
                (did % 250).cast("string"),
                F.lit(" up"),
            ),
        ).otherwise(F.lit("")),
    )
    return pii_features(d.select("doc_id", planted.alias("text")))


def q_text_repetition(spark, sf_dir):
    """Gopher-style repetition quality signals per document."""
    from efficient_graph_algorithms_spark.operators.repetition import (
        repetition_features,
    )

    return repetition_features(_t(spark, sf_dir, "documents").select("doc_id", "text"))


# documents augmented with planted boilerplate footers (same CTE both
# engines): two hot footers (every 3rd / every 5th doc — far past the
# min_count=3 bar) and one rare footer on exactly 2 docs (below the
# bar, must survive removal).
_BOILER_FOOTER_HOT1 = "Home | About | Contact"
_BOILER_FOOTER_HOT2 = "(c) 2026 Example Corp. All rights reserved."
_BOILER_FOOTER_RARE = "Rare footer line"
_BOILER_DOCS_SQL = (
    "SELECT doc_id, coalesce(text, '')"
    f" || CASE WHEN doc_id % 3 = 0 THEN chr(10) || '{_BOILER_FOOTER_HOT1}' ELSE '' END"
    f" || CASE WHEN doc_id % 5 = 0 THEN chr(10) || '{_BOILER_FOOTER_HOT2}' ELSE '' END"
    f" || CASE WHEN doc_id IN (7, 11) THEN chr(10) || '{_BOILER_FOOTER_RARE}' ELSE '' END"
    " AS text FROM documents"
)


def q_text_boilerplate(spark, sf_dir):
    """CCNet/C4-style boilerplate line removal: drop every line whose
    normalized form occurs >= 3 times corpus-wide, reassemble the
    survivors in original order. Footers are planted by the shared CTE
    (the synthetic corpus has no newlines of its own); the rare footer
    sits below the threshold and must survive."""
    from efficient_graph_algorithms_spark.operators.boilerplate import (
        remove_boilerplate_lines,
    )

    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    docs = d.select(
        "doc_id",
        F.concat(
            F.coalesce(F.col("text"), F.lit("")),
            F.when(
                F.col("doc_id") % 3 == 0, F.lit("\n" + _BOILER_FOOTER_HOT1)
            ).otherwise(F.lit("")),
            F.when(
                F.col("doc_id") % 5 == 0, F.lit("\n" + _BOILER_FOOTER_HOT2)
            ).otherwise(F.lit("")),
            F.when(
                F.col("doc_id").isin(7, 11), F.lit("\n" + _BOILER_FOOTER_RARE)
            ).otherwise(F.lit("")),
        ).alias("text"),
    )
    return remove_boilerplate_lines(docs, min_count=3)


def q_emb_gram(spark, sf_dir):
    """Second-moment matrix G = X^T X over the embeddings table — the
    distributed reduction behind PCA/whitening (operators/pca.py). The
    mapInPandas partial-sum plan is the operator under test; the
    eigendecomposition face is driver-side by contract and NumPy-oracle
    pytest-verified (tests/test_pca.py)."""
    from efficient_graph_algorithms_spark.operators.pca import gram_matrix

    emb = _t(spark, sf_dir, "embeddings")
    return gram_matrix(emb).select("i", "j", F.round("g", 6).alias("g"))


_EMB_GRAM_SQL = """
WITH x AS (
  SELECT vec_id, r.i AS i, embedding[r.i]::DOUBLE AS v
  FROM embeddings,
       LATERAL (SELECT unnest(generate_series(1, len(embedding)))) r(i)
)
SELECT (a.i - 1)::INT AS i, (b.i - 1)::INT AS j,
       round(sum(a.v * b.v), 6) AS g
FROM x a JOIN x b USING (vec_id) GROUP BY a.i, b.i
"""


def q_text_lm_score(spark, sf_dir):
    """CCNet-style LM quality signal: train the add-k bigram LM on the
    corpus, score every document's log-likelihood under it (self-
    scored, k=0.1). Exact-parity surface is (n_bigrams, sum_logp);
    perplexity = exp(-sum_logp/n_bigrams) derives downstream."""
    from efficient_graph_algorithms_spark.operators.lm import (
        score_perplexity,
        train_bigram_lm,
    )

    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    c2, c1, vocab = train_bigram_lm(d)
    out = score_perplexity(d, c2, c1, vocab, k=0.1)
    return out.select(
        "doc_id", "n_bigrams", F.round("sum_logp", 6).alias("sum_logp")
    )


def _lm_score_sql(k: float = 0.1) -> str:
    return f"""
WITH nd AS (SELECT doc_id, regexp_replace(lower(trim(text)), '\\s+', ' ', 'g') AS t FROM documents),
tk AS (SELECT doc_id, string_split(t, ' ') AS w FROM nd),
bg AS (
  SELECT doc_id, w[i] AS w1, w[i+1] AS w2
  FROM tk, LATERAL (SELECT unnest(generate_series(1, len(w) - 1))) r(i)
  WHERE len(w) >= 2),
c2 AS (SELECT w1, w2, count(*) AS c2 FROM bg GROUP BY w1, w2),
c1 AS (SELECT w1, sum(c2) AS c1 FROM c2 GROUP BY w1),
vv AS (SELECT count(DISTINCT u.w)::DOUBLE AS v
       FROM (SELECT unnest(w) AS w FROM tk) u WHERE u.w <> ''),
sc AS (
  SELECT bg.doc_id,
         ln((c2.c2 + {k}) / (c1.c1 + {k} * (SELECT v FROM vv))) AS logp
  FROM bg JOIN c2 USING (w1, w2) JOIN c1 USING (w1)),
pd AS (SELECT doc_id, count(*)::BIGINT AS n_bigrams, sum(logp) AS s
       FROM sc GROUP BY doc_id)
SELECT d.doc_id, coalesce(n_bigrams, 0)::BIGINT AS n_bigrams,
       round(coalesce(s, 0.0), 6) AS sum_logp
FROM documents d LEFT JOIN pd USING (doc_id)
"""


_DEDUP_TS_BASE = 1772323200  # 2026-03-01T00:00:00Z, arbitrary fixed epoch


def q_dedup_verdicts(spark, sf_dir):
    """Batch face of the streaming exact-dedup operator: first-writer-
    wins by (ts, doc_id) event-time order per content fingerprint.
    Documents get deterministic synthetic timestamps; the planted
    copies land LATER for even ids and EARLIER for odd ids, so for odd
    ids the copy (the higher doc_id) must win — event time beats id
    order. The streaming face is covered by the stream==batch pytest
    (tests/test_streaming_dedup.py), the sessionizer evidence pattern."""
    from efficient_graph_algorithms_spark.streaming.dedup import (
        dedup_verdicts_batch,
    )

    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    base = d.select(
        "doc_id",
        "text",
        F.timestamp_seconds(
            F.lit(_DEDUP_TS_BASE) + (F.col("doc_id") % 97) * 3600
        ).alias("ts"),
    )
    copies = d.where(F.col("doc_id") < 50).select(
        (F.col("doc_id") + 100000).alias("doc_id"),
        "text",
        F.timestamp_seconds(
            F.lit(_DEDUP_TS_BASE)
            + (F.col("doc_id") % 97) * 3600
            + F.when(F.col("doc_id") % 2 == 0, F.lit(18000)).otherwise(F.lit(-10800))
        ).alias("ts"),
    )
    out = dedup_verdicts_batch(base.unionByName(copies))
    return out.select(
        "doc_id",
        F.col("ts").cast("long").alias("ts_epoch"),
        "fp",
        "keep",
        "winner_id",
    )


def _dedup_verdicts_sql() -> str:
    from efficient_graph_algorithms_spark.functions.text import duck_fingerprint60

    return f"""
WITH dd AS (
  SELECT doc_id, text,
         {_DEDUP_TS_BASE} + (doc_id % 97) * 3600 AS ts_epoch
  FROM documents
  UNION ALL
  SELECT doc_id + 100000 AS doc_id, text,
         {_DEDUP_TS_BASE} + (doc_id % 97) * 3600
           + CASE WHEN doc_id % 2 = 0 THEN 18000 ELSE -10800 END AS ts_epoch
  FROM documents WHERE doc_id < 50
),
f AS (SELECT doc_id, ts_epoch, {duck_fingerprint60('text')} AS fp FROM dd),
v AS (
  SELECT doc_id, ts_epoch, fp,
         row_number() OVER (PARTITION BY fp ORDER BY ts_epoch, doc_id) AS rn,
         first_value(doc_id) OVER (PARTITION BY fp ORDER BY ts_epoch, doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS winner_id
  FROM f)
SELECT doc_id, ts_epoch::BIGINT AS ts_epoch, fp, rn = 1 AS keep, winner_id FROM v
"""


def q_text_dup_spans(spark, sf_dir):
    """Lee et al. 2021 duplicated-span fraction: per-doc share of
    width-8 token windows that occur >= 2 times corpus-wide. Runs over
    the planted-duplicate corpus (_dup_docs), so the 50 mirrored docs
    and their sources carry dup_window_frac 1.0."""
    from efficient_graph_algorithms_spark.operators.dupspans import dup_span_stats

    return dup_span_stats(_dup_docs(spark, sf_dir), width=8, min_count=2)


def _dup_spans_sql(width: int = 8, min_count: int = 2) -> str:
    return f"""
WITH dd AS ({_DUP_DOCS_SQL}),
nd AS (SELECT doc_id, regexp_replace(lower(trim(coalesce(text, ''))), '\\s+', ' ', 'g') AS t FROM dd),
tk AS (SELECT doc_id, CASE WHEN t = '' THEN [] ELSE string_split(t, ' ') END AS w FROM nd),
wins AS (
  SELECT doc_id, unnest(list_transform(generate_series(1, len(w) - {width - 1}),
                                       i -> array_to_string(w[i:i+{width - 1}], ' '))) AS win
  FROM tk WHERE len(w) >= {width}),
hot AS (SELECT win FROM wins GROUP BY win HAVING count(*) >= {min_count}),
perdoc AS (
  SELECT doc_id, count(*) AS n_windows,
         count(*) FILTER (WHERE win IN (SELECT win FROM hot)) AS n_dup
  FROM wins GROUP BY doc_id)
SELECT d.doc_id, coalesce(n_windows, 0)::BIGINT AS n_windows,
       coalesce(n_dup, 0)::BIGINT AS n_dup_windows,
       CASE WHEN coalesce(n_windows, 0) = 0 THEN 0.0
            ELSE round(n_dup / n_windows, 6) END AS dup_window_frac
FROM dd d LEFT JOIN perdoc USING (doc_id)
"""


def _boilerplate_sql(min_count: int = 3) -> str:
    return f"""
WITH bd AS ({_BOILER_DOCS_SQL}),
lines AS (
  SELECT doc_id, pos, l[pos] AS line,
         trim(regexp_replace(lower(l[pos]), '\\s+', ' ', 'g')) AS key
  FROM (SELECT doc_id, string_split(text, chr(10)) AS l FROM bd),
       LATERAL (SELECT unnest(generate_series(1, len(l)))) r(pos)
),
hot AS (SELECT key FROM lines WHERE key <> '' GROUP BY key
        HAVING count(*) >= {min_count})
SELECT doc_id,
  count(*)::BIGINT AS n_lines,
  (count(*) FILTER (WHERE key IN (SELECT key FROM hot)))::BIGINT AS n_removed,
  coalesce(string_agg(line, chr(10) ORDER BY pos)
           FILTER (WHERE key NOT IN (SELECT key FROM hot)), '') AS clean_text
FROM lines GROUP BY doc_id
"""


# ---------------------------------------------------------------------------
# SQL oracle builders for dedup/similarity
# ---------------------------------------------------------------------------

def _shingle_sql(docs_cte: str, width: int = 3) -> str:
    """Shingle CTEs over `dd(doc_id, text)` (word-``width``-grams,
    lockstep with operators/dedup.py shingles())."""
    gram = " || ' ' || ".join(["w[i]"] + [f"w[i+{j}]" for j in range(1, width)])
    return f"""
dd AS ({docs_cte}),
nd AS (SELECT doc_id, regexp_replace(lower(trim(text)), '\\s+', ' ', 'g') AS t FROM dd),
tk AS (SELECT doc_id, string_split(t, ' ') AS w FROM nd),
sh AS (
  SELECT doc_id, unnest(list_distinct(
    CASE WHEN len(w) < {width} THEN [array_to_string(w, ' ')]
    ELSE list_transform(generate_series(1, len(w) - {width - 1}),
                        i -> {gram}) END)) AS shingle
  FROM tk)"""


def _dedup_exact_sql() -> str:
    return f"""
WITH dd AS ({_DUP_DOCS_SQL}),
fps AS (SELECT doc_id AS id,
  ('0x' || substr(md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')), 1, 15))::BIGINT AS fp
  FROM dd)
SELECT fp, count(*) AS n_dups, min(id) AS keep_id FROM fps GROUP BY fp HAVING count(*) > 1
"""


def _dedup_ngram_sql(threshold: float = 0.8, df_cap: int = 1000) -> str:
    return f"""
WITH {_shingle_sql(_DUP_DOCS_SQL)},
sizes AS (SELECT doc_id AS id, count(*) AS sz FROM sh GROUP BY doc_id),
hot AS (SELECT shingle FROM sh GROUP BY shingle HAVING count(*) > {df_cap}),
cold AS (SELECT * FROM sh WHERE shingle NOT IN (SELECT shingle FROM hot)),
com AS (
  SELECT x.doc_id AS a, y.doc_id AS b, count(*) AS common
  FROM cold x JOIN cold y ON x.shingle = y.shingle AND x.doc_id < y.doc_id
  GROUP BY x.doc_id, y.doc_id)
SELECT c.a, c.b,
  round(c.common / (sa.sz + sb.sz - c.common), 6) AS jaccard
FROM com c JOIN sizes sa ON sa.id = c.a JOIN sizes sb ON sb.id = c.b
WHERE round(c.common / (sa.sz + sb.sz - c.common), 6) >= {threshold}
"""


def _corpus_shards_sql(shard_tokens: int = 2048, seed: int = 42) -> str:
    """Global-window cumsum oracle for the distributed shard packer."""
    from efficient_graph_algorithms_spark.functions.text import duck_token_count

    return f"""
WITH t AS (
  SELECT doc_id, ({duck_token_count("text")})::BIGINT AS n_tok,
    ('0x' || substr(md5('shrd:{seed}:' || doc_id::VARCHAR), 1, 15))::BIGINT AS h
  FROM documents)
SELECT doc_id, n_tok,
  ((sum(n_tok) OVER (ORDER BY h, doc_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tok)
   // {shard_tokens})::BIGINT AS shard_id
FROM t
"""


def _decontam_sql() -> str:
    """Width-6 shingles over all documents; probes are the first 8
    normalized tokens of every doc_id % 41 == 7 document (3 width-6
    grams each), deduplicated — lockstep with q_text_decontam."""
    return f"""
WITH {_shingle_sql("SELECT doc_id, text FROM documents", width=6)},
psh AS (
  SELECT DISTINCT unnest(list_transform(generate_series(1, 3),
      i -> array_to_string(list_slice(w, i, i + 5), ' '))) AS shingle
  FROM tk WHERE doc_id % 41 = 7 AND len(w) >= 8)
SELECT s.doc_id, count(*) AS n_hits
FROM sh s JOIN psh USING (shingle)
GROUP BY s.doc_id
"""


def _pii_sql() -> str:
    from efficient_graph_algorithms_spark.operators.pii import duck_pii_sql

    return f"""
WITH dd AS (
  SELECT doc_id,
    text
    || (CASE WHEN doc_id % 7 = 0
        THEN ' contact user' || doc_id::VARCHAR || '@example.com now' ELSE '' END)
    || (CASE WHEN doc_id % 11 = 0
        THEN ' host 10.' || (doc_id % 200)::VARCHAR || '.3.'
             || (doc_id % 250)::VARCHAR || ' up' ELSE '' END) AS text
  FROM documents)
SELECT doc_id, {duck_pii_sql('text')} FROM dd
"""


def _repetition_sql() -> str:
    return """
WITH dd AS (SELECT doc_id, text FROM documents),
nd AS (SELECT doc_id, regexp_replace(lower(trim(text)), '\\s+', ' ', 'g') AS t FROM dd),
tk AS (SELECT doc_id,
       CASE WHEN t = '' THEN []::VARCHAR[] ELSE string_split(t, ' ') END AS w FROM nd),
ts AS (SELECT doc_id, len(w)::BIGINT AS n_tokens,
       CASE WHEN len(w) = 0 THEN 0.0
            ELSE round(1 - 1.0 * len(list_distinct(w)) / len(w), 6)
       END AS dup_token_frac FROM tk),
bg AS (SELECT doc_id, unnest(list_transform(generate_series(1, len(w) - 1),
       i -> w[i] || ' ' || w[i+1])) AS bigram FROM tk WHERE len(w) >= 2),
bc AS (SELECT doc_id, bigram, count(*) AS c FROM bg GROUP BY doc_id, bigram),
bs AS (SELECT doc_id, round(1.0 * max(c) / sum(c), 6) AS top_bigram_frac
       FROM bc GROUP BY doc_id)
SELECT ts.doc_id, ts.n_tokens, ts.dup_token_frac,
       coalesce(bs.top_bigram_frac, 0.0)::DOUBLE AS top_bigram_frac
FROM ts LEFT JOIN bs USING (doc_id)
"""


def _minhash_sims_cte() -> str:
    """The shared minhash-LSH CTE chain (shingle hashes -> signatures ->
    band keys -> candidates -> signature similarity); used verbatim by
    the pairs oracle and the clusters oracle so both close over the
    IDENTICAL pair table."""
    from efficient_graph_algorithms_spark.functions.hashing import minhash_seeds

    seeds = minhash_seeds(MINHASH_K, 42)
    perm_rows = ", ".join(f"({i}, {s})" for i, s in enumerate(seeds))
    rows_per_band = MINHASH_K // LSH_BANDS
    return f"""{_shingle_sql(_DUP_DOCS_SQL)},
hs AS (SELECT doc_id AS id, ('0x' || substr(md5(shingle), 1, 15))::BIGINT AS h FROM sh),
perms(perm, pseed) AS (VALUES {perm_rows}),
sig AS (SELECT id, perm, min(xor(h, pseed)) AS mh FROM hs CROSS JOIN perms GROUP BY id, perm),
bk AS (SELECT id, perm // {rows_per_band} AS band,
       array_to_string(list_sort(list(perm::VARCHAR || ':' || mh::VARCHAR)), ',') AS bkey
       FROM sig GROUP BY id, band),
cand AS (SELECT DISTINCT x.id AS a, y.id AS b FROM bk x
         JOIN bk y ON x.band = y.band AND x.bkey = y.bkey AND x.id < y.id),
sims AS (SELECT c.a, c.b,
         round(avg(CASE WHEN sa.mh = sb.mh THEN 1.0 ELSE 0.0 END), 6) AS sig_sim
         FROM cand c JOIN sig sa ON sa.id = c.a
         JOIN sig sb ON sb.id = c.b AND sb.perm = sa.perm
         GROUP BY c.a, c.b)"""


def _dedup_minhash_sql(threshold: float = 0.5) -> str:
    return f"""
WITH {_minhash_sims_cte()}
SELECT a, b, sig_sim FROM sims WHERE sig_sim >= {threshold}
"""


def _dedup_clusters_sql(threshold: float = 0.5) -> str:
    """Transitive closure of the minhash pair table by recursive CTE
    (clusters are tiny at oracle scale), rep = min id per component —
    the union-find semantics of operators/components.py."""
    return f"""
WITH RECURSIVE {_minhash_sims_cte()},
prs AS (SELECT a, b FROM sims WHERE sig_sim >= {threshold}),
ed AS (SELECT a AS u, b AS v FROM prs UNION SELECT b AS u, a AS v FROM prs),
reach(u, v) AS (
  SELECT u, v FROM ed
  UNION
  SELECT r.u, e.v FROM reach r JOIN ed e ON r.v = e.u WHERE e.v <> r.u
),
rep AS (SELECT u AS doc_id, least(u, min(v)) AS rep_id FROM reach GROUP BY u),
alldocs AS ({_DUP_DOCS_SQL})
SELECT d.doc_id,
       coalesce(r.rep_id, d.doc_id) AS rep_id,
       CASE WHEN coalesce(r.rep_id, d.doc_id) = d.doc_id THEN 1 ELSE 0 END AS keep
FROM alldocs d LEFT JOIN rep r ON r.doc_id = d.doc_id
"""


def _dedup_simhash_sql(max_ham: int = SIMHASH_MAXHAM, bits: int = SIMHASH_BITS) -> str:
    nb = max_ham + 1
    width = bits // nb
    return f"""
WITH dd AS ({_DUP_DOCS_SQL}),
nd AS (SELECT doc_id, regexp_replace(lower(trim(text)), '\\s+', ' ', 'g') AS t FROM dd),
tok AS (SELECT doc_id AS id, unnest(string_split(t, ' ')) AS tok FROM nd),
th AS (SELECT id, ('0x' || substr(md5(tok), 1, 15))::BIGINT AS h FROM tok WHERE tok <> ''),
bitsx AS (SELECT id, b.bit, sum(CASE WHEN (h >> b.bit) & 1 = 1 THEN 1 ELSE -1 END) AS s
          FROM th CROSS JOIN (SELECT unnest(generate_series(0, {bits - 1})) AS bit) b
          GROUP BY id, b.bit),
fp AS (SELECT id, sum(CASE WHEN s > 0 THEN (1::BIGINT << bit) ELSE 0 END) AS simhash
       FROM bitsx GROUP BY id),
banded AS (SELECT id, simhash, b.band,
           (simhash >> (b.band * {width})) & {(1 << width) - 1} AS bkey
           FROM fp CROSS JOIN (SELECT unnest(generate_series(0, {nb - 1})) AS band) b),
cand AS (SELECT DISTINCT x.id AS a, y.id AS b, x.simhash AS fa, y.simhash AS fb
         FROM banded x JOIN banded y
         ON x.band = y.band AND x.bkey = y.bkey AND x.id < y.id)
SELECT a, b, bit_count(xor(fa, fb)) AS hamming FROM cand
WHERE bit_count(xor(fa, fb)) <= {max_ham}
"""


_COS_EXPR = (
    "list_dot_product(x.embedding::DOUBLE[], y.embedding::DOUBLE[]) / "
    "(sqrt(list_dot_product(x.embedding::DOUBLE[], x.embedding::DOUBLE[])) * "
    "sqrt(list_dot_product(y.embedding::DOUBLE[], y.embedding::DOUBLE[])))"
)


def _sim_topk_sql(k: int = 5) -> str:
    return f"""
WITH scored AS (
  SELECT x.vec_id AS qid, y.vec_id AS vec_id, round({_COS_EXPR}, 4) AS cos
  FROM embeddings x JOIN embeddings y ON x.vec_id < 5 AND x.vec_id <> y.vec_id),
ranked AS (SELECT qid, vec_id, cos,
           row_number() OVER (PARTITION BY qid ORDER BY cos DESC, vec_id ASC) AS rn
           FROM scored)
SELECT qid, vec_id, cos, CAST(rn AS INT) AS rn FROM ranked WHERE rn <= {k}
"""


def _sim_pairs_sql(threshold: float = COS_THRESHOLD) -> str:
    return f"""
SELECT x.vec_id AS a, y.vec_id AS b, round({_COS_EXPR}, 4) AS cos
FROM embeddings x JOIN embeddings y ON x.vec_id < y.vec_id
WHERE x.vec_id < 200 AND y.vec_id < 200 AND round({_COS_EXPR}, 4) >= {threshold}
"""


def _sem_dedup_sql(threshold: float = COS_THRESHOLD) -> str:
    """Exhaustive-face SemDeDup oracle: brute-force pairs + the
    non-recursive keep-first rule (drop b iff it is the higher id of
    any qualifying pair) — lockstep with q_sem_dedup."""
    return f"""
WITH emb AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 200),
pairs AS (
  SELECT x.vec_id AS a, y.vec_id AS b
  FROM emb x JOIN emb y ON x.vec_id < y.vec_id
  WHERE round({_COS_EXPR}, 4) >= {threshold})
SELECT e.vec_id, 0::BIGINT AS list_id,
  (CASE WHEN e.vec_id IN (SELECT b FROM pairs) THEN 0 ELSE 1 END)::BIGINT AS keep
FROM emb e
"""


# ---------------------------------------------------------------------------
# driver contract
# ---------------------------------------------------------------------------

def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full PageRank on the derived graph at sf0.001, joined
    with in-degree, top 50."""
    sf_dir = "/root/testdata/sf0.001"
    from efficient_graph_algorithms_spark.operators.pagerank import pagerank, top_k

    e = _graph_edges(spark, sf_dir)
    ranks, _ = pagerank(spark, e, vertices=_vertices(e), tol=1e-6)
    deg = e.groupBy(F.col("dst").alias("id")).agg(F.count("*").alias("in_degree"))
    return (
        top_k(ranks, 50)
        .join(deg, "id", "left")
        .select("id", F.round("rank", 9).alias("rank"), F.coalesce("in_degree", F.lit(0)).alias("in_degree"))
        .orderBy(F.desc("rank"), F.asc("id"))
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        # --- driver window (first 50; see README "Driver-row rotation").
        # Round-5 rotation: the 14 round-4 tail queries that had never
        # earned a driver row (graph_coupling, graph_wpr3, graph_bowtie,
        # graph_betweenness2, graph_n2v2, corpus_cap_source,
        # corpus_pipeline, corpus_shards, mirror_sources, sem_dedup,
        # text_decontam, text_pii, text_repetition, image_jpeg_stats)
        # plus the new graph_gw_partition rotate IN; 15 queries with
        # FOUR consecutive all-true driver rows (CORRECTNESS_r01-r04:
        # dedup_exact/_ngram_jaccard/_minhash_lsh/_simhash, graph_dsd,
        # graph_epsilon_nn, graph_heat2, graph_interp_ratio, graph_rw2,
        # graph_sinkhorn3, graph_subgraph, graph_triangles_per_vertex,
        # sim_cosine_pairs, sim_cosine_topk, text_features) rotate OUT
        # to the tail, where check_parity remains their evidence.
        "graph_degree_topk": q_graph_degree_topk,
        "graph_gather_scatter": q_graph_gather_scatter,
        "graph_pagerank_3iter": q_graph_pagerank_3iter,
        "graph_pagerank_full": q_graph_pagerank_full,
        "graph_components": q_graph_components,
        "graph_triangle_count": q_graph_triangle_count,
        "graph_lpa": q_graph_lpa,
        "graph_ppr_3iter": q_graph_ppr_3iter,
        "graph_matching": q_graph_matching,
        "graph_tree_gfi": q_graph_tree_gfi,
        "graph_frt_tree": q_graph_frt_tree,
        "graph_kernel_projection": q_graph_kernel_projection,
        "graph_wbary2": q_graph_wbary2,
        "graph_gw2": q_graph_gw2,
        "graph_gw_partition": q_graph_gw_partition,
        "graph_hits": q_graph_hits,
        "graph_host_graph": q_graph_host_graph,
        "graph_kcore3": q_graph_kcore3,
        "graph_anf2": q_graph_anf2,
        "graph_closeness2": q_graph_closeness2,
        "graph_cocitation": q_graph_cocitation,
        "graph_ktruss2": q_graph_ktruss2,
        "graph_scc": q_graph_scc,
        "graph_walks2": q_graph_walks2,
        "graph_webstats": q_graph_webstats,
        "graph_coupling": q_graph_coupling,
        "graph_wpr3": q_graph_wpr3,
        "graph_bowtie": q_graph_bowtie,
        "graph_betweenness2": q_graph_betweenness2,
        "graph_n2v2": q_graph_n2v2,
        "corpus_sample": q_corpus_sample,
        "corpus_cap_source": q_corpus_cap_source,
        "corpus_pipeline": q_corpus_pipeline,
        "corpus_shards": q_corpus_shards,
        "dedup_clusters": q_dedup_clusters,
        "sim_ivf_topk": q_sim_ivf_topk,
        "sim_cosine_pairs_lsh": q_sim_cosine_pairs_lsh,
        "graph_knn": q_graph_knn,
        "graph_knn_lsh": q_graph_knn_lsh,
        "stream_windowed_counts": q_stream_windowed_counts,
        "events_user_activity": q_events_user_activity,
        "events_sessionize": q_events_sessionize,
        "multimodal_features": q_multimodal_features,
        "video_frame_stats": q_video_frame_stats,
        "image_jpeg_stats": q_image_jpeg_stats,
        "mirror_sources": q_mirror_sources,
        "sem_dedup": q_sem_dedup,
        "text_decontam": q_text_decontam,
        "text_pii": q_text_pii,
        "text_repetition": q_text_repetition,
        # --- rotation tail (past the 50-row driver cap): every query
        # below holds 3+ green driver rows (the 15 round-5 rotations out
        # hold 4; the rel_* family was hash-green r1-r3); check_parity
        # (tools/check_parity.py, run each round over ALL queries) is
        # their standing evidence.
        "text_features": q_text_features,
        "dedup_exact": q_dedup_exact,
        "dedup_ngram_jaccard": q_dedup_ngram_jaccard,
        "dedup_minhash_lsh": q_dedup_minhash_lsh,
        "dedup_simhash": q_dedup_simhash,
        "sim_cosine_topk": q_sim_cosine_topk,
        "sim_cosine_pairs": q_sim_cosine_pairs,
        "graph_triangles_per_vertex": q_graph_triangles_per_vertex,
        "graph_interp_ratio": q_graph_interp_ratio,
        "graph_rw2": q_graph_rw2,
        "graph_heat2": q_graph_heat2,
        "graph_epsilon_nn": q_graph_epsilon_nn,
        "graph_subgraph": q_graph_subgraph,
        "graph_dsd": q_graph_dsd,
        "graph_sinkhorn3": q_graph_sinkhorn3,
        "rel_interp_metrics": q_rel_interp_metrics,
        "rel_onehot_mask": q_rel_onehot_mask,
        "rel_stats": q_rel_stats,
        "rel_zscore": q_rel_zscore,
        "rel_groupby_sum": q_rel_groupby_sum,
        "rel_join_agg": q_rel_join_agg,
        "rel_window_argmax": q_rel_window_argmax,
        "rel_window_rank": q_rel_window_rank,
        "rel_set_ops": q_rel_set_ops,
        "rel_topk": q_rel_topk,
        "rel_percentiles": q_rel_percentiles,
        "rel_minplus_join": q_rel_minplus_join,
        "rel_semi_anti": q_rel_semi_anti,
        "rel_scalar_math": q_rel_scalar_math,
        "rel_date_filter": q_rel_date_filter,
        "rel_distinct": q_rel_distinct,
        "rel_histogram": q_rel_histogram,
        "rel_union_except": q_rel_union_except,
        # new round-5 tail entries (never yet in the driver window):
        # CCNet/C4-style hot-line boilerplate removal and Lee-et-al
        # duplicated-span fractions; check_parity is their evidence of
        # record until they rotate in.
        "text_boilerplate": q_text_boilerplate,
        "text_dup_spans": q_text_dup_spans,
        "graph_salsa2": q_graph_salsa2,
        "dedup_verdicts": q_dedup_verdicts,
        "graph_spam_mass3": q_graph_spam_mass3,
        "emb_gram": q_emb_gram,
        "text_lm_score": q_text_lm_score,
        "graph_linkpred": q_graph_linkpred,
        "graph_local_cc": q_graph_local_cc,
        "text_bm25": q_text_bm25,
        "text_nb_quality": q_text_nb_quality,
        "graph_mis2": q_graph_mis2,
        "graph_harmonic2": q_graph_harmonic2,
        "graph_powerlaw": q_graph_powerlaw,
        "graph_diff": q_graph_diff,
        "emb_quantize": q_emb_quantize,
        "text_anchors": q_text_anchors,
        "graph_pr_warm": q_graph_pr_warm,
        "graph_modularity": q_graph_modularity,
        "text_cms": q_text_cms,
        "text_hashvec": q_text_hashvec,
        "graph_frontier": q_graph_frontier,
        "graph_bloom_seen": q_graph_bloom_seen,
        "graph_sssp2": q_graph_sssp2,
        "graph_redirects": q_graph_redirects,
        "text_robots": q_text_robots,
        "text_sitemaps": q_text_sitemaps,
        "image_dhash": q_image_dhash,
        "audio_afp": q_audio_afp,
        "video_dhash": q_video_dhash,
    }


# Oracles whose unrolled CTE chains reference each level more than once
# (r_i feeds both dm_{i+1} and c_{i+1}): DuckDB INLINES multi-referenced
# CTEs, so evaluation cost grows exponentially with chain depth — the
# graph_pagerank_full oracle measured 1063 s inlined vs 0.3 s
# materialized on identical sf0.01 data. AS MATERIALIZED pins each
# level to one evaluation; semantics (and the parity hashes) are
# unchanged, re-verified per query. Recursive-CTE oracles are excluded
# (the hint does not apply to them).
_MATERIALIZE_CHAINS = (
    "graph_pagerank_full",
    "graph_pagerank_3iter",
    "graph_ppr_3iter",
    "graph_pr_warm",
    "graph_wpr3",
    "graph_hits",
    "graph_salsa2",
    "graph_spam_mass3",
    "graph_gw2",
    "graph_gw_partition",
    "graph_sssp2",
    "graph_redirects",
)


def _materialize_ctes(sql: str) -> str:
    return sql.replace(" AS (SELECT", " AS MATERIALIZED (SELECT")


def oracle_sql() -> dict[str, str]:
    out = _oracle_sql_raw()
    for k in _MATERIALIZE_CHAINS:
        out[k] = _materialize_ctes(out[k])
    return out


def _oracle_sql_raw() -> dict[str, str]:
    return {
        "graph_degree_topk": f"""
WITH e AS ({_E_SQL})
SELECT dst AS id, count(*) AS in_degree FROM e GROUP BY dst
ORDER BY in_degree DESC, id ASC LIMIT 20
""",
        "graph_gather_scatter": f"""
WITH e AS ({_E_SQL}), v AS ({_V_SQL}),
f AS (SELECT id, ((id * 37 + 11) % 97) / 97.0 AS value FROM v)
SELECT e.dst AS id, round(sum(f.value), 6) AS integrated
FROM e JOIN f ON e.src = f.id GROUP BY e.dst
""",
        "graph_pagerank_3iter": _pr3_oracle_sql(),
        "graph_lpa": _lpa_oracle_sql(),
        "graph_kcore3": _kcore_oracle_sql(),
        "graph_anf2": _anf2_oracle_sql(),
        "graph_closeness2": _closeness2_oracle_sql(),
        "graph_cocitation": _cocite_oracle_sql("src", "dst"),
        "graph_coupling": _cocite_oracle_sql("dst", "src"),
        "graph_linkpred": _linkpred_oracle_sql(),
        "graph_local_cc": _local_cc_oracle_sql(),
        "text_bm25": _bm25_oracle_sql(),
        "text_nb_quality": _nb_quality_oracle_sql(),
        "graph_mis2": _mis2_oracle_sql(),
        "graph_harmonic2": _harmonic2_oracle_sql(),
        "graph_powerlaw": _powerlaw_oracle_sql(),
        "graph_diff": _graph_diff_oracle_sql(),
        "emb_quantize": _emb_quantize_oracle_sql(),
        "text_anchors": _text_anchors_oracle_sql(),
        "graph_pr_warm": _pr_warm_oracle_sql(),
        "graph_modularity": _modularity_oracle_sql(),
        "text_cms": _text_cms_oracle_sql(),
        "text_hashvec": _text_hashvec_oracle_sql(),
        "graph_frontier": _frontier_oracle_sql(),
        "graph_bloom_seen": _bloom_seen_oracle_sql(),
        "graph_sssp2": _sssp_oracle_sql(),
        "graph_redirects": _redirects_oracle_sql(),
        "text_robots": _ROBOTS_ORACLE_SQL,
        "text_sitemaps": _SITEMAPS_ORACLE_SQL,
        "image_dhash": _image_dhash_oracle_sql(),
        "audio_afp": _audio_afp_oracle_sql(),
        "video_dhash": _video_dhash_oracle_sql(),
        "graph_wpr3": _wpr3_oracle_sql(),
        "graph_bowtie": _bowtie_oracle_sql(),
        "mirror_sources": _mirror_sources_sql(),
        "corpus_pipeline": _corpus_pipeline_sql(),
        "text_decontam": _decontam_sql(),
        "text_pii": _pii_sql(),
        "text_repetition": _repetition_sql(),
        "sem_dedup": _sem_dedup_sql(),
        "image_jpeg_stats": """
SELECT doc_id AS media_id,
  (8 + (doc_id % 4) * 8)::BIGINT AS width,
  (8 + (doc_id % 3) * 8)::BIGINT AS height,
  ((doc_id * 29) % 256)::BIGINT AS luma255
FROM documents WHERE doc_id % 5 = 2
""",
        "corpus_shards": _corpus_shards_sql(),
        "graph_betweenness2": _betweenness2_oracle_sql(),
        "graph_n2v2": _n2v_oracle_sql(),
        "graph_ktruss2": _ktruss_oracle_sql(),
        "graph_scc": _scc_oracle_sql(),
        "graph_walks2": _walks_oracle_sql(),
        "graph_webstats": _webstats_oracle_sql(),
        "graph_ppr_3iter": _ppr3_oracle_sql(),
        "graph_matching": _matching_oracle_sql(),
        "graph_tree_gfi": _tree_gfi_oracle_sql(),
        "graph_frt_tree": _frt_oracle_sql(),
        "graph_kernel_projection": _kernel_projection_oracle_sql(),
        "graph_rw2": _RW2_ORACLE_SQL,
        "graph_heat2": _HEAT2_ORACLE_SQL,
        "graph_epsilon_nn": _EPS_NN_SQL,
        "graph_subgraph": _SUBGRAPH_SQL,
        "graph_dsd": _dsd_oracle_sql(),
        "graph_sinkhorn3": _sinkhorn3_oracle_sql(),
        "graph_wbary2": _wbary2_oracle_sql(),
        "graph_gw2": _gw2_oracle_sql(),
        "graph_gw_partition": _gw_partition_oracle_sql(),
        "graph_hits": _hits_oracle_sql(),
        "graph_host_graph": _HOST_GRAPH_SQL,
        "graph_components": _CC_ORACLE_SQL,
        "graph_triangle_count": _TRI_SQL_BASE + "\nSELECT count(*) AS triangles FROM tri",
        "graph_triangles_per_vertex": _TRI_SQL_BASE
        + """,
m AS (SELECT a AS id FROM tri UNION ALL SELECT b FROM tri UNION ALL SELECT c FROM tri)
SELECT id, count(*) AS triangles FROM m GROUP BY id
""",
        "graph_interp_ratio": f"""
WITH e AS ({_E_SQL}), v AS ({_V_SQL}),
f AS (SELECT id, ((id * 13 + 5) % 101) / 101.0 AS value,
      (CASE WHEN id % 3 = 0 THEN 1.0 ELSE 0.0 END) AS known FROM v),
agg AS (SELECT e.dst AS id, sum(f.value * f.known) AS num, sum(f.known) AS den
        FROM e JOIN f ON e.src = f.id GROUP BY e.dst)
SELECT id, round(num / den, 6) AS interp FROM agg WHERE den > 0
""",
        # relational
        "rel_groupby_sum": """
SELECT l_returnflag, l_linestatus,
  round(sum(l_quantity), 2) AS sum_qty,
  round(sum(l_extendedprice), 2) AS sum_base_price,
  round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
  round(avg(l_discount), 6) AS avg_disc,
  count(*) AS count_order
FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
""",
        "rel_join_agg": """
SELECT n_name, round(sum(o_totalprice), 2) AS revenue, count(*) AS n_orders
FROM orders JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
GROUP BY n_name
""",
        "rel_window_argmax": """
SELECT o_custkey AS custkey, o_orderkey AS top_orderkey,
       round(o_totalprice, 2) AS top_price
FROM (SELECT *, row_number() OVER (PARTITION BY o_custkey
      ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn FROM orders)
WHERE rn = 1
""",
        "rel_window_rank": """
SELECT o_orderpriority, o_orderkey AS orderkey, CAST(rnk AS BIGINT) AS rnk
FROM (SELECT *, rank() OVER (PARTITION BY o_orderpriority
      ORDER BY o_totalprice DESC, o_orderkey ASC) AS rnk FROM orders)
WHERE rnk <= 3
""",
        "rel_topk": """
SELECT o_orderkey AS orderkey, round(o_totalprice, 2) AS totalprice
FROM orders ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10
""",
        "rel_semi_anti": """
SELECT c_custkey AS custkey FROM customer
WHERE c_custkey NOT IN (SELECT o_custkey FROM orders WHERE o_totalprice > 150000)
""",
        "rel_set_ops": """
SELECT CAST(c_nationkey AS BIGINT) AS nationkey FROM customer
INTERSECT
SELECT CAST(s_nationkey AS BIGINT) AS nationkey FROM supplier
""",
        "rel_onehot_mask": """
SELECT c_custkey AS custkey,
  CASE WHEN c_mktsegment = 'BUILDING' THEN round(c_acctbal, 2) ELSE 0.0 END AS masked_bal,
  CAST(CASE WHEN c_mktsegment = 'BUILDING' THEN 1 ELSE 0 END AS BIGINT) AS ind
FROM customer
""",
        "rel_histogram": """
SELECT least(10, CAST(floor(o_totalprice / 50000.0) AS BIGINT)) AS bucket,
       count(*) AS n
FROM orders GROUP BY 1
""",
        "rel_stats": """
SELECT CAST(c_nationkey AS BIGINT) AS nationkey,
  round(avg(c_acctbal), 6) AS mean_bal,
  round(var_samp(c_acctbal), 4) AS var_bal,
  count(*) AS n
FROM customer GROUP BY 1
""",
        "rel_zscore": """
SELECT c_custkey AS custkey,
  round((c_acctbal - avg(c_acctbal) OVER (PARTITION BY c_nationkey))
        / stddev_samp(c_acctbal) OVER (PARTITION BY c_nationkey), 6) AS z
FROM customer
""",
        "rel_scalar_math": """
SELECT p_partkey AS partkey,
  round(exp(-0.5 * (p_retailprice / 1000.0)), 6) AS exp_kernel,
  round(ln(1 + (p_retailprice / 1000.0)), 6) AS log1p_x,
  round(sqrt(p_retailprice / 1000.0), 6) AS sqrt_x,
  round(greatest(least(p_retailprice / 1000.0, 1.5), 0.5), 6) AS clamped
FROM part
""",
        "rel_date_filter": """
SELECT CAST(year(o_orderdate) AS BIGINT) AS yr, count(*) AS n,
       round(sum(o_totalprice), 2) AS rev
FROM orders WHERE o_orderdate < TIMESTAMP '1998-01-01' GROUP BY 1
""",
        "rel_minplus_join": """
SELECT CAST(s_nationkey AS BIGINT) AS nationkey, p_brand AS brand,
       round(min(s_acctbal + p_retailprice), 2) AS min_cost
FROM supplier CROSS JOIN (SELECT * FROM part WHERE p_size <= 5) p
GROUP BY 1, 2
""",
        "rel_distinct": "SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem",
        "rel_interp_metrics": """
WITH f AS (SELECT c_acctbal AS a1, (c_custkey % 997)::DOUBLE AS a2,
                  c_acctbal * 1.01 + 5.0 AS b1,
                  (c_custkey % 997)::DOUBLE * 0.99 - 3.0 AS b2
           FROM customer)
SELECT round(sqrt(sum(pow(a1 - b1, 2) + pow(a2 - b2, 2))), 4) AS frobenius,
  round(avg(CASE WHEN sqrt(a1*a1 + a2*a2) > 0 AND sqrt(b1*b1 + b2*b2) > 0
    THEN (a1*b1 + a2*b2) / (sqrt(a1*a1 + a2*a2) * sqrt(b1*b1 + b2*b2)) END), 6)
    AS mean_cosine
FROM f
""",
        "rel_percentiles": """
SELECT round(quantile_cont(o_totalprice, 0.1), 4) AS p10,
       round(quantile_cont(o_totalprice, 0.25), 4) AS p25,
       round(quantile_cont(o_totalprice, 0.5), 4) AS p50,
       round(quantile_cont(o_totalprice, 0.75), 4) AS p75,
       round(quantile_cont(o_totalprice, 0.9), 4) AS p90
FROM orders
""",
        "rel_union_except": """
SELECT k AS nation_without_partners FROM (
  SELECT n_nationkey::BIGINT AS k FROM nation
  EXCEPT ALL
  SELECT k FROM (
    SELECT DISTINCT c_nationkey::BIGINT AS k FROM customer WHERE c_acctbal > 9800
    UNION
    SELECT DISTINCT s_nationkey::BIGINT AS k FROM supplier WHERE s_acctbal > 9800) u
)
""",
        # text / dedup / similarity / events
        "text_features": _text_features_sql(),
        "corpus_sample": _corpus_sample_sql(),
        "corpus_cap_source": _corpus_cap_source_sql(),
        "dedup_exact": _dedup_exact_sql(),
        "dedup_ngram_jaccard": _dedup_ngram_sql(),
        "dedup_minhash_lsh": _dedup_minhash_sql(),
        "dedup_clusters": _dedup_clusters_sql(),
        "dedup_simhash": _dedup_simhash_sql(),
        "sim_cosine_topk": _sim_topk_sql(),
        # exhaustive-probe IVF provably equals brute force (pytest); the
        # brute SQL is therefore a strict oracle for the IVF pipeline
        "sim_ivf_topk": _sim_topk_sql(),
        "sim_cosine_pairs": _sim_pairs_sql(),
        "sim_cosine_pairs_lsh": _sim_pairs_lsh_oracle_sql(),
        "graph_knn": _knn_exact_oracle_sql(),
        "graph_knn_lsh": _knn_lsh_oracle_sql(),
        "stream_windowed_counts": """
SELECT date_trunc('hour', ts) AS window_start, event_type,
       count(*) AS n_events, round(sum(value), 6) AS sum_value
FROM events GROUP BY 1, 2
""",
        "events_user_activity": """
SELECT user_id, count(*) AS n_events, round(sum(value), 6) AS sum_value,
       max(ts) AS last_ts
FROM events GROUP BY user_id
""",
        "events_sessionize": """
WITH o AS (
  SELECT user_id, ts, value,
         CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                   <= INTERVAL 43200 SECOND
              THEN 0 ELSE 1 END AS new_s
  FROM events
), s AS (
  SELECT user_id, ts, value,
         CAST(sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
                               ROWS UNBOUNDED PRECEDING) AS BIGINT)
           AS session_idx
  FROM o
)
SELECT user_id, session_idx, min(ts) AS session_start, max(ts) AS session_end,
       count(*) AS n_events, round(sum(value), 6) AS sum_value
FROM s GROUP BY user_id, session_idx
""",
        "multimodal_features": """
SELECT doc_id AS media_id,
  CASE WHEN doc_id % 2 = 0 THEN 'audio'
       WHEN doc_id % 4 = 1 THEN 'video'
       ELSE 'image' END AS kind,
  -- audio rows: RIFF header 44 B + 16-bit PCM frames*channels;
  -- video rows: Y4M stream header 41 B (2-digit W/H by construction)
  --   + frames * (6-byte FRAME marker + 4:2:0 planar frame w*h*3/2);
  -- image rows: BMP header 54 B + height * 4-byte-padded row stride.
  -- Every field is pure arithmetic on doc_id (mirrors the query's
  -- synthesizer); the Spark side must parse the actual bytes to
  -- reproduce these.
  CASE WHEN doc_id % 2 = 0
       THEN CAST(44 + 2 * (400 + doc_id % 211) * (1 + (doc_id // 2) % 2) AS BIGINT)
       WHEN doc_id % 4 = 1
       THEN CAST(41 + (2 + (doc_id // 4) % 4)
                    * (6 + (16 + (doc_id % 16) * 2)
                         * (10 + (doc_id % 8) * 2) * 3 // 2) AS BIGINT)
       ELSE CAST(54 + (8 + doc_id % 16)
                    * ((3 * (16 + doc_id % 32) + 3) // 4 * 4) AS BIGINT)
       END AS n_bytes,
  CAST(CASE WHEN doc_id % 2 = 0 THEN 1 + (doc_id // 2) % 2
       WHEN doc_id % 4 = 1 THEN 16 + (doc_id % 16) * 2
       ELSE 16 + doc_id % 32 END AS INT) AS width,
  CAST(CASE WHEN doc_id % 2 = 0 THEN 80
       WHEN doc_id % 4 = 1 THEN 10 + (doc_id % 8) * 2
       ELSE 8 + doc_id % 16 END AS INT) AS height
FROM documents
""",
        "video_frame_stats": """
-- mirrors q_video_frame_stats' synthesizer: doc_id % 4 == 1 videos
-- with 2 + (doc_id // 4) % 4 flat frames; every 2nd frame sampled;
-- frame j's uniform luminance is (doc_id*31 + j*37) % 256, which the
-- Spark side must recover by decoding the actual Y4M planes.
WITH v AS (SELECT doc_id FROM documents WHERE doc_id % 4 = 1),
f AS (SELECT doc_id,
             unnest(range(0, 2 + (doc_id // 4) % 4, 2)) AS frame_idx
      FROM v)
SELECT doc_id AS media_id,
       CAST(frame_idx AS INT) AS frame_idx,
       CAST((doc_id * 31 + frame_idx * 37) % 256 AS BIGINT) AS luma255
FROM f
""",
        # graph_pagerank_full (r5): the convergence count on fixed
        # sf0.01 data is a constant, so the full run unrolls exactly —
        # the engine's last no-oracle row is closed.
        "graph_pagerank_full": _pr_full_oracle_sql(),
        "text_boilerplate": _boilerplate_sql(),
        "text_dup_spans": _dup_spans_sql(),
        "graph_salsa2": _salsa_oracle_sql(),
        "dedup_verdicts": _dedup_verdicts_sql(),
        "graph_spam_mass3": _spam_mass3_oracle_sql(),
        "emb_gram": _EMB_GRAM_SQL,
        "text_lm_score": _lm_score_sql(),
    }
