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

from ..catalog import load_table
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


_TRI_STAR_CAP = 64


def _triangle_sql() -> str:
    """DuckDB replay of the capped candidate edge set + id-oriented
    triangle enumeration. The edge set mirrors _bucket_pairs'
    star_cap semantics exactly (all-pairs for buckets ≤ cap, star
    edges min-member→other past it, DISTINCT across bands) — unlike
    the CC oracle, which may ignore the cap because a star and a
    clique have the same closure, triangle counts DO see the
    difference, so the oracle replays the cap. Triangles are
    enumerated a<b<c (id orientation); Spark enumerates them
    degree-oriented — different join order, identical triangle SET,
    and only the per-node counts are emitted."""
    from .similarity import _PORTABLE_MH_CTE

    return f"""
    WITH {_PORTABLE_MH_CTE},
    mem AS (
      SELECT band_idx, band_key, doc_id,
             COUNT(*) OVER (PARTITION BY band_idx, band_key) AS bsz,
             MIN(doc_id) OVER (PARTITION BY band_idx, band_key) AS mn
      FROM bands
    ),
    edges AS (
      SELECT DISTINCT doc_a, doc_b FROM (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM mem a JOIN mem b
          ON a.band_idx = b.band_idx AND a.band_key = b.band_key
         AND a.doc_id < b.doc_id
        WHERE a.bsz <= {_TRI_STAR_CAP}
        UNION ALL
        SELECT mn AS doc_a, doc_id AS doc_b
        FROM mem WHERE bsz > {_TRI_STAR_CAP} AND doc_id <> mn
      ) raw
    ),
    tri AS (
      SELECT e1.doc_a AS x, e1.doc_b AS y, e2.doc_b AS z
      FROM edges e1
      JOIN edges e2 ON e2.doc_a = e1.doc_b
      JOIN edges e3 ON e3.doc_a = e1.doc_a AND e3.doc_b = e2.doc_b
    ),
    pn AS (
      SELECT node, COUNT(*) AS tri_cnt FROM (
        SELECT x AS node FROM tri
        UNION ALL SELECT y FROM tri
        UNION ALL SELECT z FROM tri
      ) t GROUP BY node
    ),
    deg AS (
      SELECT node, COUNT(*) AS degree FROM (
        SELECT doc_a AS node FROM edges
        UNION ALL SELECT doc_b FROM edges
      ) d GROUP BY node
    )
    SELECT deg.node AS doc_id, CAST(deg.degree AS BIGINT) AS degree,
           CAST(COALESCE(pn.tri_cnt, 0) AS BIGINT) AS triangles
    FROM deg LEFT JOIN pn ON deg.node = pn.node
    ORDER BY doc_id
    """


@query("graph_triangle_count", oracle=_triangle_sql())
def graph_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document triangle counts over the full 4-band MinHash
    candidate graph (the same capped edge set dedup_cluster_cc
    clusters): degree and 3-clique participation per node — the local
    clustering signal that separates genuinely dense near-dup clumps
    (template families, mirrored shards: triangle-rich) from chains of
    borderline pairwise matches (triangle-free), which CC alone cannot
    distinguish because it only sees reachability.

    Scale shape (operators/graph.py:triangle_counts): degree-ordered
    orientation caps wedge fan-out at O(√m) per vertex regardless of
    hub skew, then two key-partitioned equi-joins (on u, then on the
    (v,w) pair) enumerate each triangle exactly once. The edge list —
    already star-capped per bucket upstream — is checkpointed once;
    ids are the only payload that shuffles. Integer-only output, so
    the DuckDB oracle (same capped edge set, id-oriented enumeration)
    hash-matches bit-for-bit."""
    from ..operators.graph import triangle_counts
    from .similarity import _bucket_pairs, _portable_mh_bands

    bands = _portable_mh_bands(spark, sf_dir)
    edges = _bucket_pairs(
        bands,
        ["band_idx", "band_key"],
        ["doc_id"],
        star_cap=_TRI_STAR_CAP,
        project=lambda a, b: (
            [a["doc_id"].alias("doc_a"), b["doc_id"].alias("doc_b")],
            [],
        ),
    ).localCheckpoint()
    out = triangle_counts(edges, "doc_a", "doc_b")
    return out.select(
        F.col("node").alias("doc_id"), "degree", "triangles"
    ).orderBy("doc_id")


_BFS_HOPS = 3

# Bipartite purchase graph: customer c ↔ part p whenever c ordered p.
# Node ids live in one BIGINT space via parity encoding (2·custkey for
# customers, 2·partkey+1 for parts) so the two key domains cannot
# collide — integer arithmetic both engines evaluate identically.
_BFS_EDGE_SQL = """
      SELECT DISTINCT o.o_custkey * 2 AS src, l.l_partkey * 2 + 1 AS dst
      FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
"""


def _bfs_sql(max_hops: int) -> str:
    """DuckDB replay of level-synchronous BFS from the max-degree
    customer of the customer↔part purchase graph: each level is one
    join + EXCEPT against the visited set — the same frontier algebra
    the Spark operator runs, unrolled as chained CTEs."""
    ctes = []
    for k in range(1, max_hops + 1):
        ctes.append(f"""
    f{k} AS (
      SELECT DISTINCT e.dst AS node
      FROM und e JOIN f{k - 1} f ON e.src = f.node
      EXCEPT SELECT node FROM v{k - 1}
    ),
    v{k} AS (
      SELECT node, hop FROM v{k - 1}
      UNION ALL SELECT node, {k} AS hop FROM f{k}
    )""")
    return f"""
    WITH bip AS ({_BFS_EDGE_SQL}),
    und AS (
      SELECT src, dst FROM bip
      UNION ALL SELECT dst AS src, src AS dst FROM bip
    ),
    f0 AS (
      SELECT src AS node FROM und GROUP BY src
      ORDER BY COUNT(*) DESC, src LIMIT 1
    ),
    v0 AS (SELECT node, 0 AS hop FROM f0),{",".join(ctes)}
    SELECT CAST(node AS BIGINT) AS node, CAST(hop AS BIGINT) AS hop
    FROM v{max_hops}
    """


@query("graph_bfs_hops", oracle=_bfs_sql(_BFS_HOPS))
def graph_bfs_hops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K-hop neighborhood expansion: shortest-path hop distance
    (0..3) from the max-degree node of the customer↔part purchase
    graph (orders ⋈ lineitem, parity-encoded bipartite ids) — the
    collaborative-filtering expansion ("parts bought by customers who
    bought what this customer bought") and the blast-radius primitive
    under k-hop audience and recall queries. The seed is the
    max-degree node tie-broken by min id, so the query is a total
    function of the data (the HWM scalar-read pattern applied to a
    graph seed) and walks the graph's densest neighborhood.

    Plan shape (operators/graph.py:bfs_hops): per level one
    frontier⋈edges equi-join + distinct + anti-join against visited,
    everything key-partitioned on node id; the edge list is built
    once (one distinct over the orders⋈lineitem join — ids only),
    checkpointed, and symmetrized. The DuckDB oracle unrolls the
    identical frontier algebra as chained CTEs, so (node, hop)
    hash-matches bit-for-bit.

    At 100 TB the frontier join shuffles (id, id) pairs only; BFS
    total work is bounded by edges-touched (each node expands exactly
    once past the anti-join), the same volume a Pregel superstep
    family pays."""
    from ..operators.graph import bfs_hops

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey"
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey"
    )
    bip = (
        orders.join(li, orders["o_orderkey"] == li["l_orderkey"])
        .select(
            (F.col("o_custkey") * 2).alias("src"),
            (F.col("l_partkey") * 2 + 1).alias("dst"),
        )
        .distinct()
        .localCheckpoint()
    )
    und = bip.unionAll(
        bip.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    seeds = (
        und.groupBy("src")
        .agg(F.count(F.lit(1)).alias("d"))
        .orderBy(F.col("d").desc(), F.col("src"))
        .limit(1)
        .select(F.col("src").alias("node"))
    )
    return bfs_hops(und, "src", "dst", seeds, max_hops=_BFS_HOPS)


# ---------------------------------------------------------------------------
# graph_jaccard_neighbors — co-purchase neighbor-set similarity (link pred.)
# ---------------------------------------------------------------------------

_JACCARD_DEGREE_CAP = 256  # hub customers above this degree are excluded
_JACCARD_TOPK = 100
_JACCARD_SQL = f"""
    WITH edges AS (
      SELECT DISTINCT o_custkey AS c, l_partkey AS p
      FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    ), ok_cust AS (
      SELECT c FROM edges GROUP BY c HAVING COUNT(*) <= {_JACCARD_DEGREE_CAP}
    ), e AS (
      SELECT c, p FROM edges JOIN ok_cust USING (c)
    ), deg AS (
      SELECT p, CAST(COUNT(*) AS BIGINT) AS d FROM e GROUP BY p
    ), inter AS (
      SELECT e1.p AS p1, e2.p AS p2, CAST(COUNT(*) AS BIGINT) AS i
      FROM e e1 JOIN e e2 ON e1.c = e2.c AND e1.p < e2.p
      GROUP BY e1.p, e2.p
    )
    SELECT p1, p2, i AS n_common,
           CAST(i * 1000000 // (d1.d + d2.d - i) AS BIGINT) AS jaccard_ppm
    FROM inter JOIN deg d1 ON p1 = d1.p JOIN deg d2 ON p2 = d2.p
    ORDER BY jaccard_ppm DESC, p1, p2
    LIMIT {_JACCARD_TOPK}
"""


@query("graph_jaccard_neighbors", oracle=_JACCARD_SQL)
def graph_jaccard_neighbors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Link prediction by neighbor-set Jaccard over the bipartite
    customer–part co-purchase graph: for part pairs sharing at least
    one (non-hub) buyer, |C₁∩C₂| / |C₁∪C₂| in exact integer ppm, top
    100 by (score, p1, p2) — the classic similar-items primitive
    behind co-occurrence recommenders.

    The co-occurrence self-join is quadratic in per-customer degree,
    so hub customers above {_JACCARD_DEGREE_CAP} distinct parts are
    excluded UP FRONT (the sim_minhash_lsh star_cap discipline:
    pair work ∝ Σ deg², bounded by cap×|edges|, never corpus²) — at
    this fixture the cap binds nobody (max degree 90), but at 100 TB it
    is the difference between a bounded plan and a runaway one; the
    oracle applies the identical cap, so the contract is certified, not
    assumed.

    Plan shape: one distinct-edge aggregate, one degree-cap aggregate,
    the c-keyed pair self-join (co-located: both sides hash on c), one
    (p1, p2) aggregate, two degree joins, distributed TakeOrdered 100.
    """
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    edges = (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .select(F.col("o_custkey").alias("c"), F.col("l_partkey").alias("p"))
        .distinct()
    )
    ok = edges.groupBy("c").agg(F.count(F.lit(1)).alias("dc")).filter(
        F.col("dc") <= _JACCARD_DEGREE_CAP
    ).select("c")
    # e feeds three plan branches (both self-join sides + the degree
    # table); a lazy checkpoint computes the distinct-edge list once —
    # at scale this is the materialized edge table every graph query
    # in this module starts from
    e = edges.join(ok, "c").localCheckpoint(eager=False)
    deg = e.groupBy("p").agg(F.count(F.lit(1)).cast("long").alias("d"))
    e1 = e.alias("e1")
    e2 = e.alias("e2")
    inter = (
        e1.join(
            e2,
            (F.col("e1.c") == F.col("e2.c")) & (F.col("e1.p") < F.col("e2.p")),
        )
        .groupBy(F.col("e1.p").alias("p1"), F.col("e2.p").alias("p2"))
        .agg(F.count(F.lit(1)).cast("long").alias("i"))
    )
    d1 = deg.select(F.col("p").alias("p1"), F.col("d").alias("d1"))
    d2 = deg.select(F.col("p").alias("p2"), F.col("d").alias("d2"))
    scored = (
        inter.join(d1, "p1")
        .join(d2, "p2")
        .select(
            "p1",
            "p2",
            F.col("i").alias("n_common"),
            # `div` = BIGINT division truncating toward zero, the exact
            # operator DuckDB's `//` implements — no long→double
            # round-trip, so exactness never rests on a magnitude bound
            F.expr("i * CAST(1000000 AS BIGINT) div (d1 + d2 - i)")
            .cast("long")
            .alias("jaccard_ppm"),
        )
    )
    return scored.orderBy(
        F.col("jaccard_ppm").desc(), "p1", "p2"
    ).limit(_JACCARD_TOPK)
