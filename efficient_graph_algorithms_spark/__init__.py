"""efficient_graph_algorithms_spark — a PySpark-native link-graph analytics engine.

A from-scratch DataFrame/Catalyst implementation of the query surface of
``topographers/efficient_graph_algorithms`` (graph-field integration =
kernel-weighted gather-scatter over an edge table), re-expressed for
web-scale link graphs:

- PageRank / personalized PageRank (power iteration; semantics mirror
  ``reference src/ega/algorithms/graph_kernels.py:66-79``)
- Connected components (large-star/small-star hash-to-min; semantics
  oracle: ``reference src/ega/algorithms/spanning_trees.py:11-47``)
- Label propagation (argmax semantics:
  ``reference src/ega/algorithms/gromov_wasserstein_graphs.py:867-957``)
- Triangle counting (A^2 wedge semantics:
  ``reference src/ega/algorithms/graph_kernels.py:109-112``)
- The core gather-scatter primitive (``integrate_graph_field``,
  ``reference src/ega/algorithms/gf_integrator.py:35-37``) as
  ``operators.gather_scatter.integrate``

plus the training-data-pipeline operators a 100 TB corpus needs
(dedup families, similarity search, text analysis, multimodal plumbing).

Everything is pyspark.sql DataFrame + vectorized Arrow/pandas UDFs —
no per-row Python, no RDDs.
"""

__version__ = "0.1.0"

from efficient_graph_algorithms_spark.session import get_spark  # noqa: F401
