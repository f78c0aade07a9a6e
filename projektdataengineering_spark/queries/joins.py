"""Join queries (SURVEY.md §2.3 "Joins") — pure north-star
generalization: the reference contains no joins at all (§2.1), its
serving client pages a single flat table. This family is where the
100-TB design posture shows most:

* fixed-cardinality dims (nation, region) are always ``broadcast()`` —
  no shuffle for the small side, ever;
* fact⋈fact joins shuffle on their equi keys and rely on AQE for
  runtime coalescing + skew splitting;
* the non-equi cases (theta-range, as-of) are expressed so the equi
  component drives partitioning and the range predicate stays a
  post-join filter / window carry — never a cartesian product.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions import revenue_expr
from ..operators.asof import asof_join
from ..operators.skew import salted_join
from . import query


@query(
    "join_inner_equi",
    oracle="""
    SELECT c.c_custkey, c.c_name, c.c_mktsegment,
           o.o_orderkey, o.o_totalprice, o.o_orderstatus
    FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
    """,
)
def join_inner_equi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """customer ⋈ orders on custkey. Catalyst/AQE picks broadcast-hash
    while customer fits the threshold and falls back to sort-merge at
    scale — exactly the adaptivity we want; no hint."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "inner").select(
        "c_custkey", "c_name", "c_mktsegment", "o_orderkey", "o_totalprice", "o_orderstatus"
    )


@query(
    "join_left_outer",
    oracle="""
    SELECT c.c_custkey, c.c_name, o.o_orderkey, o.o_totalprice
    FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
    """,
)
def join_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """customer ⟕ orders — unmatched customers keep NULL order columns."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left").select(
        "c_custkey", "c_name", "o_orderkey", "o_totalprice"
    )


@query(
    "join_full_outer",
    oracle="""
    SELECT s.s_suppkey, s.s_name, c.c_custkey, c.c_name,
           COALESCE(s.s_nationkey, c.c_nationkey) AS nationkey
    FROM supplier s FULL OUTER JOIN customer c ON s.s_nationkey = c.c_nationkey
    """,
)
def join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """supplier ⟗ customer on nationkey (many-to-many full outer)."""
    s = load_table(spark, sf_dir, "supplier")
    c = load_table(spark, sf_dir, "customer")
    return s.join(c, s.s_nationkey == c.c_nationkey, "full").select(
        "s_suppkey",
        "s_name",
        "c_custkey",
        "c_name",
        F.coalesce("s_nationkey", "c_nationkey").alias("nationkey"),
    )


@query(
    "join_semi",
    oracle="""
    SELECT c_custkey, c_name, c_acctbal FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
)
def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers having ≥1 order (EXISTS). Semi join never duplicates
    the left side and only ships the key column of the right side."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select(
        "c_custkey", "c_name", "c_acctbal"
    )


@query(
    "join_anti",
    oracle="""
    SELECT c_custkey, c_name, c_acctbal FROM customer c
    WHERE NOT EXISTS (
      SELECT 1 FROM orders o
      WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT'
    )
    """,
)
def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers with no URGENT orders (NOT EXISTS) — the same anti join
    that powers dedup_incremental. (The filter on the right side keeps
    the result non-empty at every scale factor: every customer has
    *some* order, not every customer has an urgent one.)"""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    urgent = o.filter(F.col("o_orderpriority") == "1-URGENT")
    return c.join(urgent, c.c_custkey == urgent.o_custkey, "left_anti").select(
        "c_custkey", "c_name", "c_acctbal"
    )


@query(
    "join_broadcast",
    oracle="""
    SELECT l.l_orderkey, l.l_linenumber, s.s_name, n.n_name, r.r_name
    FROM lineitem l
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation n   ON s.s_nationkey = n.n_nationkey
    JOIN region r   ON n.n_regionkey = r.r_regionkey
    """,
)
def join_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact table joined to an explicitly broadcast dim chain
    (supplier→nation→region). The three broadcasts mean the 100-TB
    lineitem scan streams through map-side hash joins with zero
    shuffle — the plan every star-schema query should have."""
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    return (
        li.join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select("l_orderkey", "l_linenumber", "s_name", "n_name", "r_name")
    )


@query(
    "join_multiway",
    oracle="""
    SELECT r.r_name, n.n_name,
           CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
                    * (1 - CAST(l.l_discount AS DECIMAL(18,2)))) AS DOUBLE)
             AS revenue,
           COUNT(*) AS n_lineitems
    FROM region r
    JOIN nation n   ON n.n_regionkey = r.r_regionkey
    JOIN customer c ON c.c_nationkey = n.n_nationkey
    JOIN orders o   ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
    GROUP BY r.r_name, n.n_name
    """,
)
def join_multiway(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5-shaped 5-way chain with revenue rollup per nation.
    Join order: facts joined first on their natural keys (one shuffle
    each), dims broadcast last — Catalyst reorders equivalently via
    its join-reorder rules; the explicit broadcasts pin the dims."""
    r = load_table(spark, sf_dir, "region")
    n = load_table(spark, sf_dir, "nation")
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .where(F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(
            F.sum(revenue_expr()).cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_lineitems"),
        )
    )


@query(
    "join_theta_range",
    oracle="""
    SELECT o.o_orderkey, l.l_linenumber, o.o_orderdate, l.l_shipdate
    FROM orders o
    JOIN lineitem l
      ON l.l_orderkey = o.o_orderkey
     AND l.l_shipdate >  o.o_orderdate
     AND l.l_shipdate <= o.o_orderdate + INTERVAL 30 DAY
    """,
)
def join_theta_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi + range θ-join: lineitems shipped within 30 days of their
    order date. The equi key (orderkey) drives the shuffle partitioning;
    the range predicate is evaluated inside the sort-merge join — the
    scalable pattern for range joins (a range-only join would be a
    cartesian; always pair the range with a key or a bucketized band).
    """
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    cond = (
        (li.l_orderkey == o.o_orderkey)
        & (li.l_shipdate > o.o_orderdate)
        & (li.l_shipdate <= F.date_add(o.o_orderdate, 30).cast("timestamp"))
    )
    return li.join(o, cond).select("o_orderkey", "l_linenumber", "o_orderdate", "l_shipdate")


@query(
    "join_asof",
    oracle="""
    SELECT p.event_id, p.user_id, p.ts, c.ts AS last_click_ts
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
      ON p.user_id = c.user_id AND c.ts <= p.ts
    """,
)
def join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: for each purchase, the latest click by the same user
    at-or-before the purchase (NULL if none). Implemented with the
    union+window operator (operators/asof.py) — one shuffle on user_id,
    no per-key cross product. Oracle: DuckDB's native ASOF JOIN.
    """
    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    clicks = ev.filter(F.col("event_type") == "click").select("user_id", "ts")
    return asof_join(
        purchases,
        clicks,
        on="user_id",
        left_ts="ts",
        right_ts="ts",
        right_payload={"ts": "last_click_ts"},
    )


@query(
    "join_range_bucketized",
    oracle="""
    SELECT p.event_id, COUNT(c.event_id) AS n_nearby_clicks
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
      ON c.ts BETWEEN p.ts - INTERVAL 30 MINUTE AND p.ts + INTERVAL 30 MINUTE
    GROUP BY p.event_id
    """,
)
def join_range_bucketized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PURE range join (no equi key): clicks within ±30 min of each
    purchase, by ANY user. Without help this is a cartesian product —
    the scalable plan manufactures an equi key by bucketing time into
    30-minute bands: the build side lands in its own band, the probe
    side explodes into its 3 candidate bands, the join is an equi-join
    on band, and the exact interval predicate filters inside. Shuffle
    volume is 3× the probe side instead of |probe|×|build|.
    """
    ev = load_table(spark, sf_dir, "events")
    width_us = 30 * 60 * 1_000_000  # band width == interval half-width

    # integer `div`, not double division + cast: a double quotient can
    # land one ulp below an exact band boundary and truncate into the
    # wrong band, silently losing boundary matches
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("c_id"),
        F.unix_micros("ts").alias("c_us"),
        F.expr(f"unix_micros(ts) div {width_us}").alias("band"),
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("event_id"), F.unix_micros("ts").alias("p_us")
    )
    probed = purchases.select(
        "event_id",
        "p_us",
        F.explode(
            F.array(
                *[
                    (F.expr(f"p_us div {width_us}") + d).alias("band")
                    for d in (-1, 0, 1)
                ]
            )
        ).alias("band"),
    )
    hits = (
        probed.join(clicks, "band")
        .filter(F.abs(F.col("c_us") - F.col("p_us")) <= width_us)
        .groupBy("event_id")
        .agg(F.countDistinct("c_id").alias("n_nearby_clicks"))
    )
    return purchases.select("event_id").join(hits, "event_id", "left").select(
        "event_id", F.coalesce("n_nearby_clicks", F.lit(0)).alias("n_nearby_clicks")
    )


@query(
    "join_fuzzy_levenshtein",
    oracle="""
    WITH p AS (
      SELECT p_partkey, p_name, p_size,
             string_split(p_name, ' ')[2] AS noun
      FROM part
    )
    SELECT a.p_partkey AS partkey_a, b.p_partkey AS partkey_b,
           a.p_name AS name_a, b.p_name AS name_b,
           CAST(levenshtein(a.p_name, b.p_name) AS BIGINT) AS edit_dist
    FROM p a JOIN p b
      ON a.noun = b.noun AND a.p_size = b.p_size
     AND a.p_partkey < b.p_partkey
    WHERE levenshtein(a.p_name, b.p_name) <= 5
    """,
)
def join_fuzzy_levenshtein(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy string matching as a blocked self-join: part names that
    differ by ≤5 edits within the same (product noun, size) block —
    the entity-resolution pattern (same family, variant qualifier).

    Scale shape: the O(n²) edit-distance work is confined to blocks by
    an equi-key the planner can shuffle on, exactly like the LSH-band
    trick for documents — never a cross join. levenshtein runs JVM-side
    (codegen'd built-in); both engines implement the same unweighted
    edit distance, so the query is fully oracle-checked. At 100 TB the
    block key would gain a salt for hot nouns (operators/skew.py)."""
    p = load_table(spark, sf_dir, "part").select(
        "p_partkey", "p_name", "p_size", F.split("p_name", " ").getItem(1).alias("noun")
    )
    a = p.select(
        F.col("p_partkey").alias("partkey_a"),
        F.col("p_name").alias("name_a"),
        F.col("p_size").alias("size_a"),
        F.col("noun").alias("noun_a"),
    )
    b = p.select(
        F.col("p_partkey").alias("partkey_b"),
        F.col("p_name").alias("name_b"),
        F.col("p_size").alias("size_b"),
        F.col("noun").alias("noun_b"),
    )
    return (
        a.join(
            b,
            (F.col("noun_a") == F.col("noun_b"))
            & (F.col("size_a") == F.col("size_b"))
            & (F.col("partkey_a") < F.col("partkey_b")),
        )
        .withColumn("edit_dist", F.levenshtein("name_a", "name_b").cast("long"))
        .filter(F.col("edit_dist") <= 5)
        .select("partkey_a", "partkey_b", "name_a", "name_b", "edit_dist")
    )


@query(
    "join_skew_salted",
    oracle="""
    SELECT o.o_orderkey, o.o_custkey, o.o_totalprice,
           c.c_name, c.c_mktsegment
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    """,
)
def join_skew_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """orders ⋈ customer through the salted-join operator
    (operators/skew.py): the probe side gets a deterministic salt in
    [0, 8), the build side is replicated 8×, and the join keys on
    (custkey, salt) — spreading any hot customer over 8 reducers.

    Result-identical to the plain equi-join (that is the oracle), which
    is the whole point: salting is a *physical* rewrite for skew that
    AQE's sort-merge splitter can't reach (shuffled-hash builds,
    mid-chain skew), with zero semantic footprint. The salt is
    pmod(xxhash64(row), 8) — not rand() — so task retries re-salt
    identically and the join neither drops nor duplicates rows."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    c = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("o_custkey"), "c_name", "c_mktsegment"
    )
    return salted_join(o, c, "o_custkey", n_salts=8).select(
        "o_orderkey", "o_custkey", "o_totalprice", "c_name", "c_mktsegment"
    )


@query(
    "join_fuzzy_jaro",
    oracle="""
    WITH p AS (SELECT p_partkey, p_name, p_brand, p_type FROM part)
    SELECT a.p_partkey AS partkey_a, b.p_partkey AS partkey_b,
           a.p_name AS name_a, b.p_name AS name_b,
           ROUND(jaro_winkler_similarity(a.p_name, b.p_name), 6) AS jw_sim
    FROM p a JOIN p b
      ON a.p_brand = b.p_brand AND a.p_type = b.p_type
     AND a.p_partkey < b.p_partkey
    WHERE ROUND(jaro_winkler_similarity(a.p_name, b.p_name), 6) >= 0.8
    """,
)
def join_fuzzy_jaro(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity resolution with Jaro-Winkler: part pairs with JW >= 0.8
    inside (brand, type) blocks — the record-linkage metric Spark
    lacks as a built-in, implemented as an Arrow-batched pandas UDF
    (functions/strdist.py) that is BIT-EXACT with DuckDB's
    ``jaro_winkler_similarity`` (differential-tested incl. the classic
    0.7 boost-threshold variant detail), so the whole fuzzy join is
    hash-checked — both sides ROUND(..., 6) and filter on the rounded
    value so a boundary pair can't flake.

    The expensive metric runs on the DISTINCT-NAME-PAIR domain, not
    the record-pair domain: record pairs repeat the same name pair
    over and over (here ~10^2 distinct names vs ~10^6 blocked record
    pairs; real customer/product corpora are equally heavy-tailed), so
    the plan (1) scores each canonicalized distinct pair once through
    the UDF, keeping only scores >= threshold, then (2) broadcast-joins
    that small verdict table onto the blocked record-pair join — the
    big join is pure JVM equi-join + hash probe, no Python anywhere.
    JW is symmetric, so pairs canonicalize as (least, greatest).

    At 100 TB: the record-pair side stays a blocked equi-shuffle
    (salt hot blocks — operators/skew.py); the name-pair side is a
    self-join of the distinct-name table, itself blocked the same way,
    and graduates from broadcast to a shuffled join when the verdict
    table outgrows the broadcast threshold. The UDF stays
    embarrassingly parallel with zero state."""
    from ..functions.strdist import jaro_winkler_udf

    p = load_table(spark, sf_dir, "part").select(
        "p_partkey", "p_name", "p_brand", "p_type"
    )
    names = p.select("p_brand", "p_type", "p_name").distinct()
    na = names.select(
        F.col("p_brand").alias("brand"),
        F.col("p_type").alias("type"),
        F.col("p_name").alias("n_a"),
    )
    nb = names.select(
        F.col("p_brand").alias("brand"),
        F.col("p_type").alias("type"),
        F.col("p_name").alias("n_b"),
    )
    verdict = (
        na.join(nb, ["brand", "type"])
        .filter(F.col("n_a") <= F.col("n_b"))
        .select(
            F.col("n_a").alias("name_lo"), F.col("n_b").alias("name_hi")
        )
        .distinct()
        .withColumn(
            "jw_sim",
            F.when(F.col("name_lo") == F.col("name_hi"), F.lit(1.0)).otherwise(
                F.round(jaro_winkler_udf("name_lo", "name_hi"), 6)
            ),
        )
        .filter(F.col("jw_sim") >= 0.8)
    )
    a = p.select(
        F.col("p_partkey").alias("partkey_a"),
        F.col("p_name").alias("name_a"),
        F.col("p_brand").alias("brand_a"),
        F.col("p_type").alias("type_a"),
    )
    b = p.select(
        F.col("p_partkey").alias("partkey_b"),
        F.col("p_name").alias("name_b"),
        F.col("p_brand").alias("brand_b"),
        F.col("p_type").alias("type_b"),
    )
    return (
        a.join(
            b,
            (F.col("brand_a") == F.col("brand_b"))
            & (F.col("type_a") == F.col("type_b"))
            & (F.col("partkey_a") < F.col("partkey_b")),
        )
        .join(
            F.broadcast(verdict),
            (F.least("name_a", "name_b") == F.col("name_lo"))
            & (F.greatest("name_a", "name_b") == F.col("name_hi")),
        )
        .select("partkey_a", "partkey_b", "name_a", "name_b", "jw_sim")
    )


@query(
    "join_bucketed_colocated",
    oracle="""
    SELECT o.o_custkey, c.c_mktsegment,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
             AS total_price
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    GROUP BY o.o_custkey, c.c_mktsegment
    """,
)
def join_bucketed_colocated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The write-once/amortize-forever join: orders and customer are
    first written as BUCKETED tables (8 buckets on the join key via
    sources.write_bucketed), then joined and aggregated
    PER BUCKET KEY — and because both sides share bucketing and the
    rollup groups on the bucket key, the join and the aggregation
    plan with ZERO shuffle exchanges (asserted in
    tests/test_plans.py:test_bucketed_join_has_zero_exchanges and
    re-asserted for this registered query). The oracle computes the
    same rollup from the ORIGINAL parquet, proving the bucketed
    rewrite is lossless.

    This is the at-rest answer to a 100-TB fact⋈dim-or-fact join that
    repeats every run: pay the shuffle once at ingest (the bucketed
    write), then every subsequent join/agg on the bucket key is
    map-side. Bucket count scales with cluster width (8 here only to
    match fixture size; production = O(cores), stable across reruns
    so old and new files stay co-bucketed)."""
    import os as _os

    from ..sources import ensure_bucketed, source_fingerprint

    # Cache tag = fixture basename + CONTENT fingerprint of the source
    # parquets: regenerated fixtures at the same path get a fresh tag
    # (never stale reuse), and ensure_bucketed makes the write-once
    # cache atomic + cross-session-safe (round-8 ADVICE).
    fp = source_fingerprint(
        _os.path.join(sf_dir, "orders.parquet"),
        _os.path.join(sf_dir, "customer.parquet"),
    )
    tag = f"{_os.path.basename(sf_dir.rstrip('/')).replace('.', '_')}_{fp}"
    scratch = _os.path.join(
        _os.path.dirname(_os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))),
        ".scratch",
        "bucketed",
        tag,
    )
    o = load_table(spark, sf_dir, "orders").select("o_custkey", "o_totalprice")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")

    ensure_bucketed(
        spark, o, f"orders_bq_{tag}", _os.path.join(scratch, "orders"),
        ("o_custkey",), 8,
    )
    ensure_bucketed(
        spark, c, f"customer_bq_{tag}", _os.path.join(scratch, "customer"),
        ("c_custkey",), 8,
    )
    ob = spark.table(f"orders_bq_{tag}")
    cb = spark.table(f"customer_bq_{tag}")
    return (
        ob.join(cb, ob.o_custkey == cb.c_custkey)
        .groupBy("o_custkey", "c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("total_price"),
        )
    )


# Spatial neighbor join: deterministic md5-derived coordinates on a
# 1e6 × 1e6 integer grid; radius and cell size in the same units so
# every distance check is exact BIGINT arithmetic (dist² vs r², no
# sqrt, no float).
_SPATIAL_SIDE = 1_000_000
_SPATIAL_R = 8_000


def _spatial_coord_sql(axis: str) -> str:
    return (
        f"CAST(concat('0x', substr(md5('{axis}#' || "
        f"CAST(c_custkey AS VARCHAR)), 1, 13)) AS BIGINT) % {_SPATIAL_SIDE}"
    )


@query(
    "join_spatial_grid",
    oracle=f"""
    WITH pts AS (
      SELECT c_custkey AS id,
             {_spatial_coord_sql("x")} AS x,
             {_spatial_coord_sql("y")} AS y
      FROM customer
    ),
    cells AS (
      SELECT id, x, y, x // {_SPATIAL_R} AS cx, y // {_SPATIAL_R} AS cy
      FROM pts
    )
    SELECT a.id AS id_a, b.id AS id_b,
           (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y) AS dist2
    FROM cells a
    JOIN range(-1, 2) dx(i) ON TRUE
    JOIN range(-1, 2) dy(j) ON TRUE
    JOIN cells b ON b.cx = a.cx + dx.i AND b.cy = a.cy + dy.j
    WHERE a.id < b.id
      AND (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y)
            <= {_SPATIAL_R * _SPATIAL_R}
    ORDER BY id_a, id_b
    """,
)
def join_spatial_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Radius neighbor join via grid bucketing — the spatial member of
    the engine's blocked-join family (LSH bands for text, hyperplane
    buckets for vectors, range buckets for θ-joins, HERE uniform grid
    cells for points): find every pair of customers whose
    deterministic md5-derived point on a {_SPATIAL_SIDE}²-unit grid
    lies within Euclidean distance {_SPATIAL_R}. Cell size = radius,
    so a pair within r can only straddle adjacent cells: expanding
    each LEFT point into its 3×3 cell neighborhood and equi-joining
    on the single RIGHT cell finds every qualifying pair exactly once
    (the right point's cell is unique), and the id_a < id_b guard
    halves the symmetric matches. NO cross join, no distance matrix —
    the quadratic work is confined to 9-cell neighborhoods exactly
    like LSH confines it to bands.

    Float discipline: coordinates are integers, the predicate is
    dist² ≤ r² in BIGINT — no sqrt, no epsilon, so Spark and DuckDB
    agree on every boundary pair bit-for-bit.

    Scale: the equi-join shuffles on cell id; occupancy is ~uniform
    by construction of the md5 coordinates (and for real skewed
    geodata the salted-join/star-cap patterns compose here
    unchanged). Output is physics-bound — pair count grows with
    density × area, the spatial analog of sim_cosine_exact_pairs'
    output-bound contract."""
    cust = load_table(spark, sf_dir, "customer").select("c_custkey")

    def coord(axis: str):
        return (
            F.conv(
                F.substring(
                    F.md5(
                        F.concat(
                            F.lit(f"{axis}#"),
                            F.col("c_custkey").cast("string"),
                        )
                    ),
                    1,
                    13,
                ),
                16,
                10,
            ).cast("long")
            % _SPATIAL_SIDE
        )

    pts = cust.select(
        F.col("c_custkey").alias("id"),
        coord("x").alias("x"),
        coord("y").alias("y"),
    ).select(
        "id",
        "x",
        "y",
        F.expr(f"x div {_SPATIAL_R}").alias("cx"),
        F.expr(f"y div {_SPATIAL_R}").alias("cy"),
    )
    neigh = F.explode(
        F.array(
            *[
                F.struct(
                    (F.col("cx") + i).alias("ncx"), (F.col("cy") + j).alias("ncy")
                )
                for i in (-1, 0, 1)
                for j in (-1, 0, 1)
            ]
        )
    )
    left = pts.select(
        F.col("id").alias("id_a"),
        F.col("x").alias("xa"),
        F.col("y").alias("ya"),
        neigh.alias("n"),
    ).select("id_a", "xa", "ya", F.col("n.ncx").alias("cx"), F.col("n.ncy").alias("cy"))
    right = pts.select(
        F.col("id").alias("id_b"),
        F.col("x").alias("xb"),
        F.col("y").alias("yb"),
        "cx",
        "cy",
    )
    dist2 = (F.col("xa") - F.col("xb")) * (F.col("xa") - F.col("xb")) + (
        F.col("ya") - F.col("yb")
    ) * (F.col("ya") - F.col("yb"))
    return (
        left.join(right, ["cx", "cy"])
        .filter(
            (F.col("id_a") < F.col("id_b"))
            & (dist2 <= F.lit(_SPATIAL_R * _SPATIAL_R))
        )
        .select("id_a", "id_b", dist2.alias("dist2"))
        .orderBy("id_a", "id_b")
    )


# ---------------------------------------------------------------------------
# Bloom-prefiltered join (round 9): the runtime-filter / semi-join
# reduction pattern, built from the engine's own portable Bloom
# ---------------------------------------------------------------------------

_BLOOM_JOIN_THRESH = 450_000.0  # selective build side: top ~5% of orders
_BLOOM_JOIN_M = 1 << 16
_BLOOM_JOIN_K = 3

_BLOOM_JOIN_SQL = f"""
    SELECT o.o_orderkey, o.o_totalprice,
           CAST(COUNT(*) AS BIGINT) AS n_items,
           CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
             AS revenue
    FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE o.o_totalprice > {_BLOOM_JOIN_THRESH}
    GROUP BY o.o_orderkey, o.o_totalprice
"""


@query("join_bloom_prefiltered", oracle=_BLOOM_JOIN_SQL)
def join_bloom_prefiltered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """High-value orders ⋈ lineitem with a BLOOM RUNTIME FILTER doing
    the semi-join reduction by hand: the filter is built from the
    selective build side (orders > {_BLOOM_JOIN_THRESH}, ~5%) with the
    engine's own Bloom word layout (operators/sketches.bloom_fast_words
    — same 63-bit words as the portable agg_bloom_membership
    primitive), its ≤ m/63-word bitmap is read back through the
    HWM scalar pattern and planted as PLAN LITERALS (the round-1
    hyperplane discipline), and the probe side discards lineitem rows
    whose {_BLOOM_JOIN_K} bits aren't all set MAP-SIDE — before the
    join exchange ever sees them. Zero false negatives is a theorem
    (bit_or only adds bits), so the post-join result is IDENTICAL to
    the plain join: the oracle runs the plain join, and the hash match
    proves the reduction is sound, false positives and all.

    Why it matters at 100 TB: the shuffle ships ~5% of lineitem
    instead of all of it — the classic runtime-filter win Spark's own
    InjectRuntimeFilter applies when statistics allow; expressing it
    as an explicit operator makes the reduction available to sinks the
    optimizer can't see through (JDBC pushdown, pre-partitioned
    probes) and pins its correctness contract in the driver gate.
    Plan shape: one tiny build-side aggregate (the word table), then a
    map-side probe filter + one broadcast hash join on the survivors.

    Lane family (r18): the ENGINE-INTERNAL xxhash64 lanes
    (operators/sketches.bloom_fast_*) — this query's oracle runs the
    PLAIN join, so the filter needs no cross-engine hash and the md5
    portability family was pure overhead (measured 5.6x on the probe
    pass; rationale with the builders). Zero false negatives stays a
    theorem for any lane family."""
    from ..operators.sketches import bloom_fast_probe_condition, bloom_fast_words

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice"
    )
    hot = orders.filter(F.col("o_totalprice") > _BLOOM_JOIN_THRESH)
    dense = bloom_fast_words(
        hot, "o_orderkey", m_bits=_BLOOM_JOIN_M, k_hashes=_BLOOM_JOIN_K
    )
    bw = F.lit(dense).cast("array<bigint>")

    li = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_extendedprice")
        .withColumn("bw", bw)
    )
    cond = bloom_fast_probe_condition(
        "l_orderkey", "bw", _BLOOM_JOIN_M, _BLOOM_JOIN_K
    )
    pruned = li.filter(F.expr(cond)).drop("bw")
    return (
        pruned.join(F.broadcast(hot), pruned.l_orderkey == hot.o_orderkey)
        .groupBy("o_orderkey", "o_totalprice")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_items"),
            F.sum(F.col("l_extendedprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("revenue"),
        )
    )


_LATERAL_TOPN_SQL = """
    SELECT c.c_custkey, t.o_orderkey, t.o_totalprice
    FROM customer c, LATERAL (
      SELECT o_orderkey, o_totalprice FROM orders o
      WHERE o.o_custkey = c.c_custkey
      ORDER BY o_totalprice DESC, o_orderkey LIMIT 2
    ) t
    WHERE c.c_mktsegment = 'BUILDING'
"""


@query("join_lateral_topn", oracle=_LATERAL_TOPN_SQL)
def join_lateral_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL join — each BUILDING-segment customer joined
    to its OWN top-2 orders by price, expressed as SQL
    ``, LATERAL (...ORDER BY...LIMIT 2)`` on BOTH engines (the ANSI
    lateral-derived-table surface a reference user migrating real SQL
    expects to keep). Catalyst decorrelates the per-row subquery into
    a ranked window over the one orders⋈customer join — the classic
    rewrite — so the executed plan is top-N-per-group, not N
    subqueries; the oracle runs DuckDB's native lateral operator to
    the same rows. Same result as topk_per_group's explicit window
    formulation (windows.py) — registered separately because the
    LATERAL surface itself is the operator under test.

    Scale shape: one equi-join exchange + per-key rank, never a
    re-scan per outer row; the segment filter pushes into the customer
    scan."""
    load_table(spark, sf_dir, "customer").createOrReplaceTempView(
        "customer_lat_v"
    )
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders_lat_v")
    return spark.sql(
        """
        SELECT c.c_custkey, t.o_orderkey, t.o_totalprice
        FROM customer_lat_v c, LATERAL (
          SELECT o_orderkey, o_totalprice FROM orders_lat_v o
          WHERE o.o_custkey = c.c_custkey
          ORDER BY o_totalprice DESC, o_orderkey LIMIT 2
        ) t
        WHERE c.c_mktsegment = 'BUILDING'
        """
    )


# ---------------------------------------------------------------------------
# er_mutual_best — blocked, mutual-best entity resolution (record linkage)
# ---------------------------------------------------------------------------

# The dirty side is a DETERMINISTIC corruption of part names keyed on an
# md5 nibble of the part key (swap words / drop last char / remove the
# space / unchanged) — the standard way to get a certifiable ER fixture
# without shipping one: both engines derive the identical dirty table.
_ER_DIRTY_SQL = """
      SELECT p_partkey AS dpk,
             CASE WHEN nib < '4' THEN w[2] || ' ' || w[1]
                  WHEN nib < '8' THEN substr(p_name, 1, length(p_name) - 1)
                  WHEN nib < 'c' THEN replace(p_name, ' ', '')
                  ELSE p_name END AS dname
      FROM (SELECT p_partkey, p_name,
                   substr(md5(CAST(p_partkey AS VARCHAR)), 1, 1) AS nib,
                   string_split(p_name, ' ') AS w
            FROM part)
"""
_ER_SQL = f"""
    WITH clean AS (
      SELECT p_partkey AS cpk, p_name AS cname FROM part
    ), dirty AS (
      {_ER_DIRTY_SQL}
    ), cand AS (
      SELECT dpk, cpk, dname, cname
      FROM dirty JOIN clean ON substr(dname, 1, 1) = substr(cname, 1, 1)
      UNION
      SELECT dpk, cpk, dname, cname
      FROM dirty JOIN clean
        ON substr(dname, length(dname), 1) = substr(cname, length(cname), 1)
    ), scored AS (
      SELECT dpk, cpk, dname, cname,
             ROUND(jaro_winkler_similarity(dname, cname), 6) AS jw_sim
      FROM cand
      WHERE ROUND(jaro_winkler_similarity(dname, cname), 6) >= 0.7
    ), ranked AS (
      SELECT *,
             ROW_NUMBER() OVER (PARTITION BY dpk
                                ORDER BY jw_sim DESC, cpk) AS rn_d,
             ROW_NUMBER() OVER (PARTITION BY cpk
                                ORDER BY jw_sim DESC, dpk) AS rn_c
      FROM scored
    )
    SELECT dpk, cpk, dname, cname, jw_sim
    FROM ranked WHERE rn_d = 1 AND rn_c = 1
"""


@query("er_mutual_best", oracle=_ER_SQL)
def er_mutual_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end entity resolution: multi-pass blocking → fuzzy
    scoring → MUTUAL-best 1:1 matching.  A dirty catalog (deterministic
    md5-keyed corruptions of part names: word swap, char drop, space
    removal) is linked back to the clean catalog; a pair matches only
    if each record is the other's best candidate (score desc, key asc
    tie-break) — the greedy-free, order-independent 1:1 rule that makes
    distributed ER deterministic.

    Blocking is the union of TWO passes (first-char and last-char equi
    keys): any single key misses some corruption type (dropping the
    last char breaks a suffix key; removing the space breaks neither
    end) — multi-pass blocking is the standard recall fix, and the
    union of two equi-joins keeps the plan hash-joinable (an OR join
    condition would plan a nested loop).

    Scoring reuses the join_fuzzy_jaro discipline: the Arrow-batched
    Jaro-Winkler UDF is bit-exact with DuckDB's, both sides ROUND(.,6),
    and the UDF runs ONCE per distinct name pair.

    The 100-TB move (this is what makes the operator scale): record
    pairs NEVER materialize.  Because candidacy, score, and both
    ranking orders are pure functions of the NAME pair — the record
    key enters only as the (jw desc, key asc) tie-break, and the
    minimal key of a name group wins every tie — record-level
    mutual-best provably collapses to name-level mutual-best over
    (dname → min dpk, cname → min cpk).  The whole match runs on the
    distinct-name domain (fixed cardinality, independent of row
    count); the naive record-level definition is exactly what the
    ORACLE executes, so the reduction's correctness is hash-certified
    every round, not argued.  The record-pair version of this plan
    measured >10 min at sf0.1 (last-char blocks are near-degenerate);
    this one is sub-second at any SF.
    """
    from ..functions.strdist import jaro_winkler_udf

    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_name")
    clean = p.select(F.col("p_partkey").alias("cpk"), F.col("p_name").alias("cname"))
    nib = F.substring(F.md5(F.col("p_partkey").cast("string")), 1, 1)
    w = F.split(F.col("p_name"), " ")
    dirty = p.select(
        F.col("p_partkey").alias("dpk"),
        # the swap branch yields NULL (not the bare word) when p_name
        # has fewer than two words: DuckDB's `w[2] || ' ' || w[1]`
        # NULL-propagates there, while concat_ws would silently skip
        # the missing word — the two dirty-table derivations must be
        # the SAME function, not merely agree on multi-word fixtures
        F.when(
            nib < "4",
            F.when(F.size(w) >= 2, F.concat_ws(" ", w[1], w[0])),
        )
        .when(
            nib < "8",
            F.expr("substr(p_name, 1, length(p_name) - 1)"),
        )
        .when(nib < "c", F.regexp_replace("p_name", " ", ""))
        .otherwise(F.col("p_name"))
        .alias("dname"),
    )
    dnames = dirty.groupBy("dname").agg(F.min("dpk").alias("dmin"))
    cnames = clean.groupBy("cname").agg(F.min("cpk").alias("cmin"))
    b1 = dnames.join(
        cnames, F.expr("substr(dname, 1, 1) = substr(cname, 1, 1)")
    )
    b2 = dnames.join(
        cnames,
        F.expr("substr(dname, length(dname), 1) = substr(cname, length(cname), 1)"),
    )
    cand = b1.select("dname", "cname", "dmin", "cmin").union(
        b2.select("dname", "cname", "dmin", "cmin")
    ).distinct()
    verdict = cand.select(
        "dname",
        "cname",
        "dmin",
        "cmin",
        F.round(jaro_winkler_udf("dname", "cname"), 6).alias("jw_sim"),
    ).filter(F.col("jw_sim") >= 0.7)
    # name-level mutual best ≡ record-level mutual best (see docstring):
    # per dname the winning candidate is (max jw, then min cpk = cmin);
    # per cname it is (max jw, then min dpk = dmin)
    w_d = Window.partitionBy("dname").orderBy(F.col("jw_sim").desc(), "cmin")
    w_c = Window.partitionBy("cname").orderBy(F.col("jw_sim").desc(), "dmin")
    ranked = verdict.select(
        "dname",
        "cname",
        "dmin",
        "cmin",
        "jw_sim",
        F.row_number().over(w_d).alias("rn_d"),
        F.row_number().over(w_c).alias("rn_c"),
    )
    return ranked.filter((F.col("rn_d") == 1) & (F.col("rn_c") == 1)).select(
        F.col("dmin").alias("dpk"),
        F.col("cmin").alias("cpk"),
        "dname",
        "cname",
        "jw_sim",
    )


# ---------------------------------------------------------------------------
# Both-sides semi-join reduction (round 11): Bloom runtime filters prune
# BOTH inputs of a SHUFFLE join before either exchange
# ---------------------------------------------------------------------------

_SEMIRED_M = 1 << 17
_SEMIRED_K = 3

_SEMIRED_SQL = """
    SELECT CAST(date_trunc('month', o.o_orderdate) AS VARCHAR) AS month_start,
           CAST(COUNT(DISTINCT o.o_orderkey) AS BIGINT) AS n_orders,
           CAST(COUNT(*) AS BIGINT) AS n_items,
           CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
             AS revenue
    FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE o.o_orderpriority = '1-URGENT' AND l.l_returnflag = 'R'
    GROUP BY 1
"""


@query("join_semireduced", oracle=_SEMIRED_SQL)
def join_semireduced(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SHUFFLE join with BOTH sides semi-join-reduced before their
    exchanges — the completion of the runtime-filter story
    join_bloom_prefiltered starts: there the selective side broadcasts
    and only the probe side is pruned; here NEITHER side is broadcast-
    able (urgent orders ⋈ returned lineitems, both fact-sized at
    100 TB), so each side builds a Bloom over ITS join keys and the
    OTHER side drops non-members map-side, before the shuffle ships a
    byte. Lineitem rows whose order isn't urgent (~80%) and orders
    with no returned item (~35%) never reach their exchange.

    Result identity is a theorem, certified per round: bit_or only
    adds bits, so neither filter can drop a true match (zero false
    negatives); false positives merely ride the shuffle and die in the
    join — the oracle runs the PLAIN filtered join and the hash match
    proves it. The exchange-level reduction itself is pinned by
    tests/test_operators.py (pruned input counts strictly below the
    unpruned filtered inputs) and tests/test_plans.py (both probe
    filters sit below the shuffle join; no broadcast join planned).

    Scale notes: this is two bounded build passes (each Bloom is a
    ≤ m/63-word aggregate, collected once and planted as plan
    literals — the HWM scalar pattern) plus one shuffle of the
    survivors; Spark's own InjectRuntimeFilter does this only when
    one side can host a bloom subquery and stats clear its thresholds
    — expressing it explicitly keeps the reduction under the
    correctness gate and available against sinks the optimizer can't
    reason about. The join is hinted SHUFFLE_MERGE so the plan stays
    the honest big-big shape the operator exists for.

    Lane family (r18): xxhash64 (operators/sketches.bloom_fast_*) —
    like join_bloom_prefiltered, the oracle runs the PLAIN filtered
    join, so the portable md5 lanes were pure probe-side overhead
    (two md5 passes + two interpreted transform() bindings; the fast
    lanes keep both probe predicates inside WholeStageCodegen)."""
    from ..operators.sketches import bloom_fast_probe_condition, bloom_fast_words

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_returnflag", "l_extendedprice"
    )
    urgent = orders.filter(F.col("o_orderpriority") == "1-URGENT").drop(
        "o_orderpriority"
    )
    returned = li.filter(F.col("l_returnflag") == "R").drop("l_returnflag")

    o_words = bloom_fast_words(
        urgent, "o_orderkey", m_bits=_SEMIRED_M, k_hashes=_SEMIRED_K
    )
    l_words = bloom_fast_words(
        returned.select("l_orderkey").distinct(),
        "l_orderkey",
        m_bits=_SEMIRED_M,
        k_hashes=_SEMIRED_K,
    )

    li_pruned = (
        returned.withColumn("bw", F.lit(o_words).cast("array<bigint>"))
        .filter(
            F.expr(
                bloom_fast_probe_condition(
                    "l_orderkey", "bw", _SEMIRED_M, _SEMIRED_K
                )
            )
        )
        .drop("bw")
    )
    o_pruned = (
        urgent.withColumn("bw", F.lit(l_words).cast("array<bigint>"))
        .filter(
            F.expr(
                bloom_fast_probe_condition(
                    "o_orderkey", "bw", _SEMIRED_M, _SEMIRED_K
                )
            )
        )
        .drop("bw")
    )
    return (
        o_pruned.hint("shuffle_merge")
        .join(li_pruned, o_pruned.o_orderkey == li_pruned.l_orderkey)
        .groupBy(
            # DuckDB's date_trunc('month', ts) yields DATE; go through
            # DATE on this side too so the strings align
            F.date_trunc("month", "o_orderdate")
            .cast("date")
            .cast("string")
            .alias("month_start")
        )
        .agg(
            F.countDistinct("o_orderkey").cast("long").alias("n_orders"),
            F.count(F.lit(1)).cast("long").alias("n_items"),
            F.sum(F.col("l_extendedprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("revenue"),
        )
    )
