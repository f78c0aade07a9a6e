"""Graph queries — the operator-library graph algorithms
(operators/graph.py) surfaced as driver-checked registry entries.

``graph_pagerank`` is the interesting one: an ITERATIVE float
algorithm with a value-level DuckDB oracle. Two disciplines make the
hash comparable (the same playbook as timeseries.py's list_reduce
fold and functions.py's decimal-exact money sums):

* every per-node contribution sum runs over INTEGER numerators
  floor(c·10¹⁵ + 0.5) through DECIMAL(38,0)
  (``pagerank(exact_sums=True)``) — decimal addition is exact and
  associative, so the sum is independent of partitioning and arrival
  order, the one place a distributed float reduction diverges
  between engines (and between two Spark runs); the quantization to
  integer-valued doubles is what makes the double→decimal cast itself
  engine-independent (a direct DECIMAL(38,18) cast of an arbitrary
  double rounds differently in Spark vs DuckDB near boundaries —
  round-8 ADVICE fix);
* everything else is a single IEEE-754 double operation per step
  (one division per edge, one multiply-add per node), and the oracle
  SQL spells each literal as the same double expression Spark
  evaluates (e.g. ``(CAST(1 AS DOUBLE) - CAST(0.85 AS DOUBLE))`` —
  NOT ``0.15``, which is a different double than ``1.0 - 0.85``).

The oracle unrolls the fixed iteration count as chained CTEs —
recursion-free, so it runs on stock DuckDB SQL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import query
from .pipeline_ops import _PORTABLE_PAIRS_SQL

_PR_ITER = 8
_PR_DAMPING = 0.85


def _pagerank_sql(n_iter: int) -> str:
    """Unrolled n_iter-iteration PageRank replay over the symmetrized
    portable near-dup pair graph, mirroring operators/graph.pagerank
    with exact_sums=True operation-for-operation."""
    teleport = (
        "(CAST(1 AS DOUBLE) - CAST(0.85 AS DOUBLE)) / (SELECT n FROM nn)"
    )
    iters = []
    for k in range(1, n_iter + 1):
        iters.append(f"""
    r{k} AS (
      SELECT n0.node AS node,
             {teleport}
             + CAST(0.85 AS DOUBLE)
               * (CAST(COALESCE(c.s, 0) AS DOUBLE) / 1e15) AS pr
      FROM nodes n0 LEFT JOIN (
        SELECT e.dst AS node,
               SUM(CAST(FLOOR(r.pr / d.deg * 1e15 + 0.5)
                        AS DECIMAL(38,0))) AS s
        FROM und e
        JOIN r{k - 1} r ON e.src = r.node
        JOIN deg d ON e.src = d.node
        GROUP BY e.dst
      ) c ON n0.node = c.node
    )""")
    return f"""
    WITH pairs AS ({_PORTABLE_PAIRS_SQL}),
    und AS (
      SELECT doc_a AS src, doc_b AS dst FROM pairs
      UNION ALL SELECT doc_b, doc_a FROM pairs
    ),
    nodes AS (SELECT DISTINCT src AS node FROM und),
    deg AS (SELECT src AS node, COUNT(*) AS deg FROM und GROUP BY src),
    nn AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM nodes),
    r0 AS (
      SELECT node, CAST(1 AS DOUBLE) / (SELECT n FROM nn) AS pr FROM nodes
    ),{",".join(iters)}
    SELECT node, pr FROM r{n_iter} ORDER BY node
    """


@query("graph_pagerank", oracle=_pagerank_sql(_PR_ITER))
def graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank centrality over the near-duplicate graph: the portable
    MinHash candidate pairs (hash-certified by
    pipeline_minhash_pairs_portable) symmetrized into a directed edge
    list, then 8 fixed power-iteration rounds (d = 0.85, dangling mass
    not redistributed — moot here: the symmetrized graph has no
    dangling nodes). Ranks order each dedup cluster's members by
    hubness — the "most connected representative" canonical-pick
    policy, vs pipeline_canonical_docs' min-id policy.

    Scale shape (operators/graph.py:pagerank): per iteration one
    edges⋈ranks join shuffling (id, double), one partial→final sum by
    dst, one left join back to the node set; lineage cut per round
    with localCheckpoint; the only driver materialization is one node
    count. Edge list is ids-only — text never leaves the signature
    stage upstream.

    Hash-checked end-to-end: exact_sums=True makes every contribution
    sum DECIMAL-exact (order-independent), so the DuckDB oracle — the
    same 8 rounds unrolled as CTEs — reproduces every rank
    bit-for-bit. See the module docstring for the float discipline."""
    from ..operators.graph import pagerank
    from .pipeline_ops import _portable_pairs

    # Checkpoint the pair list: the symmetrize union reads it twice,
    # and each of the 8 iterations re-joins the edge list — without
    # the cut, the (groupBy-heavy) signature pipeline would re-execute
    # 9+ times.
    pairs = _portable_pairs(spark, sf_dir).localCheckpoint()
    und = pairs.select(
        F.col("doc_a").alias("src"), F.col("doc_b").alias("dst")
    ).unionAll(
        pairs.select(F.col("doc_b").alias("src"), F.col("doc_a").alias("dst"))
    )
    ranks = pagerank(
        und, "src", "dst", n_iter=_PR_ITER, damping=_PR_DAMPING, exact_sums=True
    )
    return ranks.select(
        F.col("node"), F.col("rank").alias("pr")
    ).orderBy("node")
