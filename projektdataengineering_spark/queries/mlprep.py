"""Training-data preparation queries — deterministic splits, stratified
sampling, CDC-style compaction, and table profiling.

These generalize the reference's ingest bookkeeping (the sha256/metadata
side-channel in /root/reference/dags/ingestion/ingestion.py:58-75 and the
keep-newest O1 semantics of spark_tasks/weather_task.py:82) into the
operations a large-scale training corpus actually needs before a model
ever sees it: which rows are train vs held-out, a reproducible sample
per stratum, one surviving version per logical key, and per-column
health stats.

Determinism policy (same as the rest of the engine): assignment hashes
are md5 over a decimal string key — identical bytes in Spark and DuckDB,
so every split/sample is oracle-checked row for row, and a re-run at
100 TB lands every document in the same split. No rand(), no
sample() — a seeded `rand()` is only reproducible for a fixed
partitioning, which a cluster does not guarantee.

Scale notes: split/sample/compaction are all one map-side hash plus at
most one shuffle on the stratum or key — no driver participation, no
skew-prone keys (md5 is uniform by construction). Profiling is a single
pass per table (one shuffle-free partial-agg tree per column batch).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from . import query

# First byte of md5(doc_id) partitions [0x00, 0xff] into 80/10/10:
# < 0xcd → train (205/256), < 0xe7 → val (26/256), else test (25/256).
# Two lowercase hex chars compare lexicographically as bytes, so the
# same CASE works verbatim in both engines.
_SPLIT_CASE_SQL = """CASE WHEN bucket < 'cd' THEN 'train'
                          WHEN bucket < 'e7' THEN 'val'
                          ELSE 'test' END"""


@query(
    "split_train_test",
    oracle=f"""
    WITH b AS (
      SELECT doc_id, lang,
             substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) AS bucket
      FROM documents
    )
    SELECT doc_id, lang, bucket, {_SPLIT_CASE_SQL} AS split FROM b
    """,
)
def split_train_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 80/10/10 train/val/test assignment by content key.

    The split is a pure function of doc_id (first md5 byte), so it is
    reproducible across runs, partitionings, and engines — the property
    that makes held-out sets trustworthy. Map-side only: no shuffle,
    no sort, nothing leaves the scan stage."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        "lang",
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2).alias("bucket"),
    ).withColumn("split", F.expr(_SPLIT_CASE_SQL))


@query(
    "sample_stratified",
    oracle="""
    SELECT doc_id, lang, n_chars
    FROM (
      SELECT doc_id, lang, n_chars,
             ROW_NUMBER() OVER (
               PARTITION BY lang
               ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
             ) AS rn
      FROM documents
    ) t
    WHERE rn <= 50
    """,
)
def sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reproducible stratified sample: 50 documents per language, chosen
    by md5 order (a deterministic stand-in for uniform randomness —
    md5 is uniform over doc_ids, and the choice is stable across
    engines and re-runs, unlike `TABLESAMPLE`/`rand(seed)` whose output
    depends on physical partitioning).

    One shuffle on the stratum key; the per-stratum sort is bounded by
    stratum size. At 100 TB with heavy strata, swap row_number for a
    per-partition top-50 (`rank over md5` after a repartition on lang
    stays the same plan shape — AQE handles the stragglers)."""
    docs = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("lang").orderBy(
        F.md5(F.col("doc_id").cast("string")), F.col("doc_id")
    )
    return (
        docs.select("doc_id", "lang", "n_chars")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 50)
        .drop("rn")
    )


@query(
    "dedup_keep_latest",
    oracle="""
    SELECT event_id, user_id, event_type, ts, value
    FROM (
      SELECT event_id, user_id, event_type, ts, value,
             ROW_NUMBER() OVER (
               PARTITION BY user_id, event_type
               ORDER BY ts DESC, event_id DESC
             ) AS rn
      FROM events
    ) t
    WHERE rn = 1
    """,
)
def dedup_keep_latest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC-style compaction: one surviving row per logical key
    (user_id, event_type) — the newest by event time, event_id breaking
    ties. This is the keep-newest counterpart of the reference's O1
    keep-after-HWM semantics: a replayed or duplicated upstream batch
    collapses back to one row per key, making the sink idempotent.

    Single shuffle on the logical key; the per-key sort is bounded by
    version-chain length. At 100 TB this is the standard log-compaction
    plan (same shape as Delta/Hudi snapshot reads)."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    return (
        ev.select("event_id", "user_id", "event_type", "ts", "value")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )


# Profile columns: (name, decimal cast used for the exact mean).
_PROFILE_COLS = (
    ("o_orderkey", "decimal(18,2)"),
    ("o_custkey", "decimal(18,2)"),
    ("o_totalprice", "decimal(18,2)"),
)


def _profile_sql_one(col: str) -> str:
    return f"""
    SELECT '{col}' AS col_name,
           COUNT(*) AS n_rows,
           COUNT(*) - COUNT({col}) AS n_nulls,
           COUNT(DISTINCT {col}) AS n_distinct,
           CAST(MIN({col}) AS DOUBLE) AS min_val,
           CAST(MAX({col}) AS DOUBLE) AS max_val,
           CAST(SUM(CAST({col} AS DECIMAL(18,2))) AS DOUBLE) / COUNT({col}) AS avg_val
    FROM orders
    """


@query(
    "profile_numeric_stats",
    oracle=" UNION ALL ".join(_profile_sql_one(c) for c, _ in _PROFILE_COLS),
)
def profile_numeric_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-column data-quality profile of the orders table: row count,
    null count, exact distinct count, min/max, and an exact-decimal mean
    (see functions.dsum/davg for why the mean goes through DECIMAL —
    double summation order varies with partitioning).

    One row per profiled column. Each column's stats are a single
    partial-agg tree (map-side combine, one tiny shuffle of K aggregate
    states); the per-column frames are unioned, so profiling N columns
    is N independent scans Catalyst can share via plan reuse. The
    distinct count is exact here because profiling feeds schema/QA
    decisions; the HLL variant for dashboards is `agg_approx_distinct`."""
    orders = load_table(spark, sf_dir, "orders")
    frames = []
    for col, dec in _PROFILE_COLS:
        frames.append(
            orders.agg(
                F.lit(col).alias("col_name"),
                F.count(F.lit(1)).alias("n_rows"),
                (F.count(F.lit(1)) - F.count(col)).alias("n_nulls"),
                F.countDistinct(col).alias("n_distinct"),
                F.min(col).cast("double").alias("min_val"),
                F.max(col).cast("double").alias("max_val"),
                (F.sum(F.col(col).cast(dec)).cast("double") / F.count(col)).alias("avg_val"),
            )
        )
    out = frames[0]
    for f in frames[1:]:
        out = out.unionByName(f)
    return out


# Priority sampling (Duffield–Lund–Thorup, JACM'07): weight-aware
# fixed-size sampling with an unbiased subset-sum estimator. Each item
# draws priority w/u (u uniform in (0,1]); the top-k priorities are the
# sample, tau = the (k+1)-th priority, and est_weight = max(w, tau) is
# unbiased for every item's weight (0 for unsampled). Chosen over
# Efraimidis–Spirakis A-ES because its math is ONE division per item —
# no ln/pow, whose libm implementations differ across engines by ulps
# and would make the ranking (and the driver hash) engine-dependent.
_PRIORITY_K = 64
# u = (first 13 md5 hex chars + 1) / (2^52 + 1): integer numerator is
# exact in a double (16^13 = 2^52), one division, u ∈ (0, 1].
_PRIORITY_U_DENOM = float(16**13 + 1)


@query(
    "sample_priority",
    oracle=f"""
    WITH pri AS (
      SELECT o_orderkey, o_totalprice AS weight,
             o_totalprice /
             ((CAST(concat('0x', substr(md5(CAST(o_orderkey AS VARCHAR)),
                                        1, 13)) AS BIGINT) + 1)
              / {16**13 + 1}.0) AS priority
      FROM orders
    ),
    ranked AS (
      SELECT o_orderkey, weight, priority,
             ROW_NUMBER() OVER (ORDER BY priority DESC, o_orderkey) AS rk
      FROM pri
    )
    SELECT o_orderkey, weight, priority, CAST(rk AS BIGINT) AS rk,
           GREATEST(weight,
                    (SELECT priority FROM ranked
                     WHERE rk = {_PRIORITY_K + 1})) AS est_weight
    FROM ranked WHERE rk <= {_PRIORITY_K}
    """,
)
def sample_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted fixed-size sample of orders by priority sampling: the
    {_PRIORITY_K} orders with the largest priority = o_totalprice / u,
    where u is a deterministic md5-derived uniform — plus the DLT
    estimator column est_weight = max(weight, tau) with tau the
    (k+1)-th priority, the classic unbiased subset-sum estimator
    (E[est over sampled] = Σ weights). Importance sampling for
    training-data curation: big documents/orders are near-certain
    picks, small ones enter with probability ∝ weight, and downstream
    sums stay unbiased.

    Engine-deterministic by construction: u's numerator is an exact
    ≤2^52 integer from md5 hex (identical bytes in Spark and DuckDB),
    and priority needs exactly two IEEE-754 divisions — no rand(), no
    transcendentals, so the full ranking, tau, and estimator replay
    bit-for-bit in the oracle at any partitioning.

    Scale shape: map-side priority computation + TakeOrdered(k+1) —
    Spark's distributed top-k (per-partition heaps, then a k-sized
    driver merge), NO global sort and no single-partition window; the
    65-row ranked frame and the 1-row tau broadcast are driver-scale
    by construction."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", F.col("o_totalprice").alias("weight")
    )
    u = (
        F.conv(
            F.substring(F.md5(F.col("o_orderkey").cast("string")), 1, 13), 16, 10
        ).cast("long")
        + F.lit(1)
    ).cast("double") / F.lit(_PRIORITY_U_DENOM)
    pri = orders.select(
        "o_orderkey", "weight", (F.col("weight") / u).alias("priority")
    )
    topk1 = pri.orderBy(F.desc("priority"), F.asc("o_orderkey")).limit(
        _PRIORITY_K + 1
    )
    w = Window.orderBy(F.desc("priority"), F.asc("o_orderkey"))
    ranked = topk1.withColumn("rk", F.row_number().over(w).cast("bigint"))
    # agg (not select) so tau is ALWAYS exactly one row — NULL when the
    # table has ≤ k rows — matching the oracle's NULL-ignoring
    # GREATEST(weight, scalar-subquery); a bare filter+select yields an
    # EMPTY frame on a sub-(k+1)-row table and the crossJoin would then
    # drop every sampled row (round-8 advice)
    tau = ranked.filter(F.col("rk") == _PRIORITY_K + 1).agg(
        F.max("priority").alias("tau")
    )
    return (
        ranked.filter(F.col("rk") <= _PRIORITY_K)
        .crossJoin(F.broadcast(tau))
        .select(
            "o_orderkey",
            "weight",
            "priority",
            "rk",
            F.greatest(F.col("weight"), F.col("tau")).alias("est_weight"),
        )
    )


# ---------------------------------------------------------------------------
# pipeline_feature_scale — min-max + z-score normalization, exact-stat form
# ---------------------------------------------------------------------------

_FEATURE_SCALE_SQL = """
    WITH c AS (
      SELECT c_custkey,
             CAST(FLOOR(c_acctbal * 100 + 0.5) AS BIGINT) AS cents
      FROM customer
    ),
    stats AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CAST(cents AS DECIMAL(38,0))) AS BIGINT) AS s,
             CAST(SUM(CAST(cents AS DECIMAL(38,0))
                      * CAST(cents AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS q,
             MIN(cents) AS mn, MAX(cents) AS mx
      FROM c
    )
    SELECT c.c_custkey,
           c.cents,
           CAST(FLOOR((c.cents - st.mn) * 1000000.0
                      / (st.mx - st.mn) + 0.5) AS BIGINT) AS minmax_ppm,
           CAST(FLOOR(1000.0 * (c.cents * st.n - st.s)
                      / sqrt(CAST(st.n * st.q - CAST(st.s AS DECIMAL(38,0))
                                                * CAST(st.s AS DECIMAL(38,0))
                                  AS DOUBLE)) + 0.5) AS BIGINT) AS z_milli
    FROM c CROSS JOIN stats st
"""


@query("pipeline_feature_scale", oracle=_FEATURE_SCALE_SQL)
def pipeline_feature_scale(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature normalization — the two standard scalers of tabular ML
    prep, in cross-engine-exact form: min-max position in ppm and
    z-score in milli-units per customer balance. The statistics are
    EXACT (cent-quantized balances; Σx and Σx² as DECIMAL(38,0) — the
    agg_corr_exact co-moment discipline), so the only float steps are
    one subtraction/multiply/divide chain and one correctly-rounded
    IEEE sqrt, each a single operation both engines evaluate
    identically. z = (x·n − S) / √(n·Q − S²) is the co-moment identity
    that never materializes the mean — the same one-pass shape a
    1000-executor scaler uses (no mean-then-second-pass).

    Plan shape: one partial→final single-row aggregate (the stats),
    broadcast back over the rows as a literal-free cross join — no
    second scan of the table, no driver round-trip for the row side.
    """
    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey",
        F.floor(F.col("c_acctbal") * 100 + 0.5).cast("long").alias("cents"),
    )
    d38 = "decimal(38,0)"
    stats = c.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("cents").cast(d38)).cast("long").alias("s"),
        F.sum(F.col("cents").cast(d38) * F.col("cents").cast(d38))
        .cast(d38)
        .alias("q"),
        F.min("cents").alias("mn"),
        F.max("cents").alias("mx"),
    )
    joined = c.crossJoin(F.broadcast(stats))
    return joined.select(
        "c_custkey",
        "cents",
        F.floor(
            (F.col("cents") - F.col("mn"))
            * F.lit(1000000.0)
            / (F.col("mx") - F.col("mn"))
            + 0.5
        )
        .cast("long")
        .alias("minmax_ppm"),
        F.floor(
            F.lit(1000.0)
            * (F.col("cents") * F.col("n") - F.col("s"))
            / F.sqrt(
                (
                    F.col("n") * F.col("q")
                    - F.col("s").cast(d38) * F.col("s").cast(d38)
                ).cast("double")
            )
            + 0.5
        )
        .cast("long")
        .alias("z_milli"),
    )


# ---------------------------------------------------------------------------
# pipeline_target_encode — leave-one-out categorical target encoding
# ---------------------------------------------------------------------------

_TARGET_ENCODE_SQL = """
    WITH c AS (
      SELECT c_custkey, c_mktsegment,
             CAST(FLOOR(c_acctbal * 100 + 0.5) AS BIGINT) AS cents
      FROM customer
    ),
    seg AS (
      SELECT c_custkey, c_mktsegment, cents,
             SUM(cents) OVER (PARTITION BY c_mktsegment) AS s_seg,
             COUNT(*) OVER (PARTITION BY c_mktsegment) AS n_seg
      FROM c
    )
    SELECT c_custkey, c_mktsegment,
           CAST(CASE WHEN n_seg <= 1 THEN NULL
                     ELSE ((s_seg - cents) * 1000) // (n_seg - 1)
                END AS BIGINT) AS te_millicents
    FROM seg
"""


@query("pipeline_target_encode", oracle=_TARGET_ENCODE_SQL)
def pipeline_target_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leave-one-out target encoding — the categorical-feature
    workhorse of gradient-boosting prep: each customer's market
    segment is encoded as the mean balance of the OTHER members of
    that segment, ``(S_seg − x) / (n_seg − 1)``, which removes the
    self-leakage plain mean-encoding suffers. All integer: balances
    in cents, the LOO mean in milli-cents via truncating integer
    division (Spark ``div`` ≡ DuckDB ``//`` — both truncate toward
    zero, checked for the negative-balance rows); singleton segments
    encode NULL (the caller's smoothing/global-prior policy slot).

    Plan shape: one exchange on the segment key; both window passes
    (sum, count) share the partition sort, and the division is
    map-side arithmetic after it — the same single-shuffle bound a
    100-TB encode pays, with no per-category driver state.
    """
    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey",
        "c_mktsegment",
        F.floor(F.col("c_acctbal") * 100 + 0.5).cast("long").alias("cents"),
    )
    w = Window.partitionBy("c_mktsegment")
    seg = c.select(
        "c_custkey",
        "c_mktsegment",
        "cents",
        F.sum("cents").over(w).alias("s_seg"),
        F.count(F.lit(1)).over(w).alias("n_seg"),
    )
    return seg.select(
        "c_custkey",
        "c_mktsegment",
        F.when(
            F.col("n_seg") <= 1, F.lit(None).cast("long")
        )
        .otherwise(F.expr("(s_seg - cents) * 1000 div (n_seg - 1)"))
        .cast("long")
        .alias("te_millicents"),
    )


# ---------------------------------------------------------------------------
# pipeline_kfold_assign — deterministic hash-based k-fold cross-validation
# ---------------------------------------------------------------------------

# Engine-portable "md5 mod k" without hex→int parsing (the two engines
# expose hex parsing differently): map each of the first two hex chars
# to its 0-based position in the hex alphabet via string search
# (Spark locate / DuckDB strpos, both 1-based), combine to an integer
# 0..255, reduce mod k.  Uniform by md5, identical bytes both engines.
_KFOLD_K = 5
_KFOLD_SQL = f"""
    WITH h AS (
      SELECT c_custkey, c_mktsegment,
             CAST(FLOOR(c_acctbal * 100 + 0.5) AS BIGINT) AS cents,
             md5(CAST(c_custkey AS VARCHAR)) AS hx
      FROM customer
    ), fold AS (
      SELECT c_custkey, c_mktsegment, cents,
             CAST(((strpos('0123456789abcdef', substr(hx, 1, 1)) - 1) * 16
                   + (strpos('0123456789abcdef', substr(hx, 2, 1)) - 1))
                  % {_KFOLD_K} AS BIGINT) AS fold
      FROM h
    )
    SELECT fold, c_mktsegment,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(cents) AS BIGINT) AS sum_cents,
           CAST(COUNT(DISTINCT c_custkey) AS BIGINT) AS n_keys
    FROM fold
    GROUP BY fold, c_mktsegment
"""


@query("pipeline_kfold_assign", oracle=_KFOLD_SQL)
def pipeline_kfold_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic k-fold assignment for cross-validation: every
    customer lands in fold ``md5(key) mod 5`` — a pure function of the
    key, so a re-run (or a different cluster/partitioning) reproduces
    the same folds, unlike seeded ``rand()``.  Returns the per-(fold,
    segment) balance audit (row count, account-balance cents, distinct
    keys) a training pipeline checks before trusting the folds.

    The mod-k is computed WITHOUT hex→int parsing (engines disagree on
    conv/from_hex): the first two md5 hex chars are located in the hex
    alphabet (1-based in both Spark ``locate`` and DuckDB ``strpos``)
    and combined to 0..255.

    Plan shape: map-side hash + one partial→final aggregate on
    (fold, segment) — the same single-exchange bound at 100 TB; md5 is
    uniform so folds can't skew. Grounding: SURVEY §2.3 mlprep family,
    extending split_train_test (reference ingest bookkeeping,
    dags/ingestion/ingestion.py:58-75) from one split to k folds.
    """
    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey",
        "c_mktsegment",
        F.floor(F.col("c_acctbal") * 100 + 0.5).cast("long").alias("cents"),
        F.md5(F.col("c_custkey").cast("string")).alias("hx"),
    )
    alphabet = "0123456789abcdef"
    pos1 = F.expr(f"locate(substr(hx, 1, 1), '{alphabet}') - 1")
    pos2 = F.expr(f"locate(substr(hx, 2, 1), '{alphabet}') - 1")
    folded = c.select(
        "c_custkey",
        "c_mktsegment",
        "cents",
        ((pos1 * 16 + pos2) % _KFOLD_K).cast("long").alias("fold"),
    )
    return folded.groupBy("fold", "c_mktsegment").agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.sum("cents").cast("long").alias("sum_cents"),
        F.countDistinct("c_custkey").cast("long").alias("n_keys"),
    )


# ---------------------------------------------------------------------------
# pipeline_feature_hash — hashing-trick text vectorization (signed buckets)
# ---------------------------------------------------------------------------

_FHASH_BUCKETS = 64
_FHASH_SQL = f"""
    WITH words AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents
    ), hashed AS (
      SELECT doc_id,
             CAST(((strpos('0123456789abcdef', substr(md5(word), 1, 1)) - 1) * 16
                   + (strpos('0123456789abcdef', substr(md5(word), 2, 1)) - 1))
                  % {_FHASH_BUCKETS} AS BIGINT) AS bucket,
             CASE WHEN substr(md5(word), 3, 1) < '8' THEN 1 ELSE -1 END AS sign
      FROM words WHERE word <> ''
    ), vec AS (
      SELECT doc_id, bucket, CAST(SUM(sign) AS BIGINT) AS weight
      FROM hashed GROUP BY doc_id, bucket
      HAVING SUM(sign) <> 0
    )
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_nonzero,
           CAST(SUM(ABS(weight)) AS BIGINT) AS l1,
           CAST(SUM(weight * weight) AS BIGINT) AS l2sq,
           md5(string_agg(bucket || ':' || weight, ',' ORDER BY bucket)) AS vec_md5
    FROM vec GROUP BY doc_id
"""


@query("pipeline_feature_hash", oracle=_FHASH_SQL)
def pipeline_feature_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hashing-trick vectorization (Weinberger et al.'s public feature
    hashing): each word hashes to one of 64 buckets with a ±1 sign from
    an independent hash bit, so the sparse vector needs NO vocabulary
    table — the standard fixed-width featurizer for streaming-scale
    text.  Emits the per-document sparse-vector audit (nnz, L1, L2²)
    plus an md5 fingerprint of the canonical ``bucket:weight`` list, so
    the oracle certifies the ENTIRE vector, not just its norms.

    Bucket index and sign reuse the engine-portable hex-alphabet
    position trick (see pipeline_kfold_assign); the sign bit comes from
    a DIFFERENT md5 nibble than the bucket, as the algorithm requires
    independent hashes.

    Plan shape: map-side explode + two partial→final aggregates
    ((doc, bucket) then doc) — no join, no vocabulary broadcast; at
    100 TB the (doc, bucket) key is bounded by nnz ≤ 64 per doc, so the
    second exchange carries at most 64 rows per document. The doc_id
    repartition ahead of the explode is the round-11 input-split
    lesson (the fixture parquet's 2-split width was capping the
    per-word md5 stage — the table's worst r12 slope, 0.78, was that
    artifact, not the algorithm).
    """
    docs = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .repartition(spark.sparkContext.defaultParallelism, "doc_id")
    )
    words = docs.select(
        "doc_id", F.explode(F.split(F.col("text"), " ")).alias("word")
    ).filter(F.col("word") != "")
    alphabet = "0123456789abcdef"
    hx = F.md5(F.col("word"))
    pos1 = F.expr(f"locate(substr(md5(word), 1, 1), '{alphabet}') - 1")
    pos2 = F.expr(f"locate(substr(md5(word), 2, 1), '{alphabet}') - 1")
    hashed = words.select(
        "doc_id",
        ((pos1 * 16 + pos2) % _FHASH_BUCKETS).cast("long").alias("bucket"),
        F.when(F.substring(hx, 3, 1) < "8", F.lit(1))
        .otherwise(F.lit(-1))
        .alias("sign"),
    )
    vec = (
        hashed.groupBy("doc_id", "bucket")
        .agg(F.sum("sign").cast("long").alias("weight"))
        .filter(F.col("weight") != 0)
    )
    return (
        vec.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_nonzero"),
            F.sum(F.abs(F.col("weight"))).cast("long").alias("l1"),
            F.sum(F.col("weight") * F.col("weight")).cast("long").alias("l2sq"),
            F.sort_array(
                F.collect_list(F.struct("bucket", "weight"))
            ).alias("pairs"),
        )
        .select(
            "doc_id",
            "n_nonzero",
            "l1",
            "l2sq",
            F.md5(
                F.concat_ws(
                    ",",
                    F.transform(
                        F.col("pairs"),
                        lambda p: F.concat_ws(
                            ":",
                            p["bucket"].cast("string"),
                            p["weight"].cast("string"),
                        ),
                    ),
                )
            ).alias("vec_md5"),
        )
    )


# ---------------------------------------------------------------------------
# pipeline_quality_classifier — learned quality filtering as a query:
# a fastText-style broadcast linear model scored map-side (r16 verdict
# task #6 — the one standard LLM-pipeline stage the surface lacked)
# ---------------------------------------------------------------------------

# Model geometry. V is the hashed feature space (unigrams AND word
# bigrams share it, the fastText trick); the WEIGHT TABLE stands in for
# learned parameters — in production it is the trained model artifact
# loaded from storage, here it is derived deterministically from the
# bucket id (md5 nibbles → [-128, 127]) so the DuckDB oracle can
# recompute the whole table and certify the scoring path end-to-end.
# The decision rule is fastText's mean-score threshold with tau = -1/8,
# cleared of division: keep ⇔ mean(w) > -1/8 ⇔ 8·Σw + n_feats > 0 —
# pure integer arithmetic, bit-stable on both engines.
_QCLS_BUCKETS = 256
_QCLS_NUM = 8  # keep ⇔ _QCLS_NUM * logit_sum + n_feats > 0 (tau = -1/8)
_QCLS_MODEL_VERSION = 1  # bump when the (synthetic) training recipe changes

_QCLS_MODEL_BUILDS = 0  # tests assert a second scoring call skips the build


def _qcls_model_path() -> str:
    """Persisted model-artifact location for the quality classifier's
    weight table — the index read-or-build keying discipline
    (similarity._embed_index_path): every constant that shapes the
    parameters (model version, bucket count, threshold numerator) is
    folded into the key, so retuning the model geometry lands a NEW
    artifact instead of silently reusing a stale one. No source
    fingerprint: the model is trained OFFLINE (here: derived
    deterministically), so the artifact is corpus-independent — it
    ships once per model version, the production posture where the
    fastText .bin is a release artifact, not a per-dataset build."""
    import os

    return os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
        ".scratch",
        "qcls_model",
        f"weights_v{_QCLS_MODEL_VERSION}_b{_QCLS_BUCKETS}_n{_QCLS_NUM}",
    )


def _qcls_weights(spark: SparkSession) -> DataFrame:
    """Read-or-build the classifier's weight table as a persisted
    parquet model artifact (r17 verdict task #6): first call derives
    the parameters (md5 of the bucket id → [-128, 127] — the stand-in
    for offline training) and installs them by staged write + atomic
    rename; every later call is an ordinary parquet read, pinned by a
    builds-counter test (a second scoring call must not re-derive).
    Swapping in genuinely trained weights = writing a new artifact at
    a bumped _QCLS_MODEL_VERSION; the scoring plan never changes."""
    global _QCLS_MODEL_BUILDS
    import os

    from .layout import _atomic_dir_write

    path = _qcls_model_path()
    if not os.path.isdir(path):
        pos = lambda h, i: F.expr(
            f"locate(substr({h}, {i}, 1), '0123456789abcdef') - 1"
        )
        weights = spark.range(_QCLS_BUCKETS).select(
            F.col("id").cast("long").alias("bucket"),
            (
                (pos("md5(concat(cast(id as string), '#w'))", 1) * 16
                 + pos("md5(concat(cast(id as string), '#w'))", 2))
                - 128
            ).cast("long").alias("w"),
        )
        _atomic_dir_write(lambda p: weights.coalesce(1).write.parquet(p), path)
        _QCLS_MODEL_BUILDS += 1
    return spark.read.parquet(path)

_QCLS_SQL = f"""
    WITH toks AS (
      SELECT doc_id, list_filter(string_split(text, ' '), w -> w <> '') AS ws
      FROM documents
    ), unis AS (
      SELECT doc_id, unnest(ws) AS feat FROM toks
    ), bis AS (
      SELECT doc_id, ws[i] || '_' || ws[i + 1] AS feat
      FROM (SELECT doc_id, ws, unnest(range(1, len(ws))) AS i FROM toks) b
    ), feats AS (
      SELECT doc_id,
             CAST(((strpos('0123456789abcdef', substr(md5(feat || '#q'), 1, 1)) - 1) * 16
                   + (strpos('0123456789abcdef', substr(md5(feat || '#q'), 2, 1)) - 1))
                  % {_QCLS_BUCKETS} AS BIGINT) AS bucket
      FROM (SELECT * FROM unis UNION ALL SELECT * FROM bis) u
    ), weights AS (
      SELECT CAST(i AS BIGINT) AS bucket,
             CAST(((strpos('0123456789abcdef', substr(md5(CAST(i AS VARCHAR) || '#w'), 1, 1)) - 1) * 16
                   + (strpos('0123456789abcdef', substr(md5(CAST(i AS VARCHAR) || '#w'), 2, 1)) - 1))
                  - 128 AS BIGINT) AS w
      FROM range({_QCLS_BUCKETS}) t(i)
    ), scored AS (
      SELECT f.doc_id,
             CAST(COUNT(*) AS BIGINT) AS n_feats,
             CAST(SUM(w.w) AS BIGINT) AS logit_sum
      FROM feats f JOIN weights w USING (bucket)
      GROUP BY f.doc_id
    )
    SELECT d.doc_id,
           COALESCE(s.n_feats, 0) AS n_feats,
           COALESCE(s.logit_sum, 0) AS logit_sum,
           ({_QCLS_NUM} * COALESCE(s.logit_sum, 0)
            + COALESCE(s.n_feats, 0)) > 0 AS keep
    FROM documents d LEFT JOIN scored s USING (doc_id)
"""


@query("pipeline_quality_classifier", oracle=_QCLS_SQL)
def pipeline_quality_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Learned quality filtering as a query — the Dolma/RefinedWeb
    pipeline stage where a trained fastText-style linear classifier
    scores every document and gates admission: hashed unigram + word-
    bigram features (the pipeline_feature_hash kernel, one shared
    256-bucket space), a BROADCAST weight table standing in for the
    trained parameters, an integer-exact logit sum per document, and
    the mean-score threshold tau = -1/8 applied division-free
    (keep ⇔ 8·Σw + n_feats > 0). Emits the per-document verdict
    (doc_id, n_feats, logit_sum, keep) — featureless documents score
    0 and fail the strict threshold, preserved by the LEFT join.

    The weight table SHIPS AS A PERSISTED MODEL ARTIFACT — a
    version-keyed parquet installed once by staged write + atomic
    rename and reused by every later scoring call (_qcls_weights;
    builds-counter pinned) — the production posture where the trained
    model is a release artifact loaded from storage, not a per-query
    derivation. Its parameters are synthetic-deterministic (md5 of
    the bucket id → [-128, 127]) precisely so the DuckDB oracle can
    rebuild the SAME model and hash-certify the scoring path —
    hashing, bigram composition, bucket join, integer logit,
    verdict — end-to-end; swapping in genuinely trained weights
    writes one new 256-row artifact at a bumped version, not a plan
    change.

    Plan shape: ONE map-side explode of the concatenated unigram ∪
    bigram feature array (JVM split / transform — no Python in the hot
    path), one md5 per feature, a BROADCAST hash join against the
    V-row weight table (model parameters ship to executors once — the
    production posture for a 10⁶-bucket fastText model at ~8 MB), and
    the featureless-document spine unioned in as zero-contribution
    rows so ONE partial→final aggregate keyed by doc_id is the plan's
    only real exchange — no join back to the spine (the first cut's
    LEFT SortMergeJoin between two O(docs) sides was pure overhead).
    At 100 TB everything upstream of that exchange is embarrassingly
    parallel scan work ∝ token count."""
    docs = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .repartition(spark.sparkContext.defaultParallelism, "doc_id")
    )
    toks = docs.select(
        "doc_id",
        F.filter(F.split(F.col("text"), " "), lambda w: w != "").alias("ws"),
    )
    # TOTAL bigram expression (r17 ADVICE): slice the tail to
    # max(size-1, 0) elements and pair each with its predecessor via
    # the transform index — no branch ever indexes past the array, so
    # correctness does not lean on lazy evaluation of a F.when arm
    # (sequence(1, size-1) on a 1-token doc yields the DESCENDING
    # [1, 0] and ws[i] walks out of range under ANSI semantics)
    bigrams = F.expr(
        "transform(slice(ws, 2, greatest(size(ws) - 1, 0)),"
        " (w, i) -> concat(ws[i], '_', w))"
    )
    feats = toks.select(
        "doc_id", F.explode(F.concat(F.col("ws"), bigrams)).alias("feat")
    )
    pos = lambda h, i: F.expr(
        f"locate(substr({h}, {i}, 1), '0123456789abcdef') - 1"
    )
    hashed = feats.select(
        "doc_id",
        (
            (pos("md5(concat(feat, '#q'))", 1) * 16
             + pos("md5(concat(feat, '#q'))", 2))
            % _QCLS_BUCKETS
        ).cast("long").alias("bucket"),
    )
    weights = _qcls_weights(spark)
    contrib = hashed.join(F.broadcast(weights), "bucket").select(
        "doc_id", F.lit(1).cast("long").alias("cnt"), "w"
    )
    spine0 = docs.select(
        "doc_id",
        F.lit(0).cast("long").alias("cnt"),
        F.lit(0).cast("long").alias("w"),
    )
    return (
        contrib.unionByName(spine0)
        .groupBy("doc_id")
        .agg(
            F.sum("cnt").cast("long").alias("n_feats"),
            F.sum("w").cast("long").alias("logit_sum"),
        )
        .select(
            "doc_id",
            "n_feats",
            "logit_sum",
            (
                F.lit(_QCLS_NUM) * F.col("logit_sum") + F.col("n_feats") > 0
            ).alias("keep"),
        )
    )
