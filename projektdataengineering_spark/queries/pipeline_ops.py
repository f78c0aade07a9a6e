"""Training-data pipeline composite queries — the operations a
large-scale LLM corpus build runs between raw ingest and tokenization:
sessionization and funnel/retention analytics over behavioral events,
quality banding and length filtering, token-budget corpus assembly,
contamination checks against a held-out benchmark, document-frequency
vocabularies, distinctive-term extraction, language rebalancing, a
fully-portable (oracle-checked!) MinHash near-dup pass, and warehouse
enrichment/outlier/profile queries.

Every query here is SQL-expressible and oracle-checked against DuckDB —
this module deliberately contains no rows-only entries, extending the
engine's hash-verified surface (the approximate/rows-only family lives
in ``similarity``).  Shared determinism discipline (see functions/):

* money/2-dp doubles aggregate through exact DECIMAL;
* final double math is a fixed IEEE op sequence shared TEXTUALLY with
  the oracle SQL (module-level ``*_EXPR`` constants), with +,-,*,/ and
  sqrt only — no pow(), no libm transcendentals;
* randomness is md5 over a decimal string key (uniform, engine-
  portable, partitioning-independent);
* every ordered+limited output carries a unique total-order tiebreak.

Registered directly after the dedup family (queries/__init__._MODULES)
so the driver's 50-entry correctness window verifies the whole module.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions import SQL_REVENUE, revenue_expr, token_ngrams
from . import query

# ---------------------------------------------------------------------------
# Behavioral events: sessionize / session stats / retention / funnel
# ---------------------------------------------------------------------------

# 30-minute inactivity gap, in exact integer microseconds — epoch_us is
# an exact BIGINT in both engines, so the gap predicate is portable
# (interval arithmetic and unix_timestamp() truncation are not).
_SESSION_GAP_US = 30 * 60 * 1_000_000

_SESSIONIZE_SQL = f"""
    SELECT event_id, user_id, ts, value,
           CAST(SUM(CASE WHEN gap_us IS NULL OR gap_us > {_SESSION_GAP_US}
                         THEN 1 ELSE 0 END)
                OVER (PARTITION BY user_id ORDER BY ts, event_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS BIGINT) AS session_seq
    FROM (
      SELECT event_id, user_id, ts, value,
             epoch_us(ts) - lag(epoch_us(ts))
               OVER (PARTITION BY user_id ORDER BY ts, event_id) AS gap_us
      FROM events
    )
"""


def _sessionized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Events with a per-user session sequence number: a new session
    starts after >30 min of inactivity. One shuffle on user_id; both
    window passes share the same (user_id × (ts, event_id)) sort, so
    Catalyst plans a single exchange + single sort. event_id breaks
    timestamp ties — the session assignment is a total function of the
    data, not of partitioning."""
    ev = load_table(spark, sf_dir, "events").select("event_id", "user_id", "ts", "value")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.unix_micros(F.col("ts")) - F.unix_micros(F.lag("ts").over(w))
    is_new = F.when(gap.isNull() | (gap > _SESSION_GAP_US), F.lit(1)).otherwise(F.lit(0))
    return ev.withColumn(
        "session_seq",
        F.sum(is_new).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)),
    )


@query("pipeline_sessionize", oracle=_SESSIONIZE_SQL)
def pipeline_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (30-min inactivity) — the standard
    first step of behavioral-data preparation. See _sessionized for the
    single-exchange plan shape."""
    return _sessionized(spark, sf_dir)


@query(
    "pipeline_session_stats",
    oracle=f"""
    SELECT user_id, session_seq,
           COUNT(*) AS n_events,
           MIN(ts) AS session_start,
           MAX(ts) AS session_end,
           epoch_us(MAX(ts)) - epoch_us(MIN(ts)) AS duration_us,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
    FROM ({_SESSIONIZE_SQL}) s
    GROUP BY user_id, session_seq
    """,
)
def pipeline_session_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-session aggregates (count, span, exact-decimal value sum) on
    top of the sessionizer. The groupBy key (user_id, session_seq) is a
    refinement of the sessionizer's shuffle key, so no second exchange:
    the aggregation runs partial→final on the already-partitioned
    stream."""
    s = _sessionized(spark, sf_dir)
    return s.groupBy("user_id", "session_seq").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        (F.unix_micros(F.max("ts")) - F.unix_micros(F.min("ts"))).alias("duration_us"),
        F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("sum_value"),
    )


@query(
    "pipeline_user_retention",
    oracle="""
    WITH uw AS (
      SELECT DISTINCT user_id, CAST(date_trunc('week', ts) AS TIMESTAMP) AS week
      FROM events
    )
    SELECT a.week AS week,
           COUNT(*) AS n_active,
           CAST(SUM(CASE WHEN b.user_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_retained
    FROM uw a LEFT JOIN uw b
      ON a.user_id = b.user_id AND b.week = a.week + INTERVAL 7 DAY
    GROUP BY a.week
    """,
)
def pipeline_user_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Week-over-week retention: per activity week, how many users were
    active and how many return the following week. (user, week) pairs
    dedup first (one shuffle), then a self-join on the shifted week —
    equi-join on (user_id, week+7d), never an inequality. DuckDB's
    date_trunc('week') yields DATE, Spark's a TIMESTAMP — the oracle
    casts to TIMESTAMP to pin identical values."""
    ev = load_table(spark, sf_dir, "events")
    uw = ev.select(
        "user_id", F.date_trunc("week", F.col("ts")).alias("week")
    ).distinct()
    b = uw.select(
        F.col("user_id").alias("b_user"),
        (F.col("week") - F.expr("INTERVAL 7 DAY")).alias("b_week_prev"),
    )
    joined = uw.join(
        b,
        (uw["user_id"] == b["b_user"]) & (uw["week"] == b["b_week_prev"]),
        "left",
    )
    return joined.groupBy("week").agg(
        F.count(F.lit(1)).alias("n_active"),
        F.sum(F.when(F.col("b_user").isNotNull(), 1).otherwise(0)).alias("n_retained"),
    )


@query(
    "pipeline_event_funnel",
    oracle="""
    WITH m AS (
      SELECT user_id,
             min(CASE WHEN event_type = 'view' THEN ts END) AS t_view,
             min(CASE WHEN event_type = 'click' THEN ts END) AS t_click,
             min(CASE WHEN event_type = 'purchase' THEN ts END) AS t_purchase
      FROM events GROUP BY user_id
    )
    SELECT COUNT(*) AS n_users,
           CAST(SUM(CASE WHEN t_view IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_view,
           CAST(SUM(CASE WHEN t_view < t_click THEN 1 ELSE 0 END) AS BIGINT) AS n_view_click,
           CAST(SUM(CASE WHEN t_view < t_click AND t_click < t_purchase
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_full_funnel
    FROM m
    """,
)
def pipeline_event_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conversion funnel view→click→purchase by first-occurrence times:
    one conditional-min aggregate per user (single shuffle on user_id),
    then a scalar rollup — the funnel never materializes event pairs.
    NULL stage times fall out of the < comparisons in both engines."""
    ev = load_table(spark, sf_dir, "events")
    m = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "view", F.col("ts"))).alias("t_view"),
        F.min(F.when(F.col("event_type") == "click", F.col("ts"))).alias("t_click"),
        F.min(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias("t_purchase"),
    )
    return m.agg(
        F.count(F.lit(1)).alias("n_users"),
        F.sum(F.when(F.col("t_view").isNotNull(), 1).otherwise(0)).alias("n_view"),
        F.sum(F.when(F.col("t_view") < F.col("t_click"), 1).otherwise(0)).alias("n_view_click"),
        F.sum(
            F.when(
                (F.col("t_view") < F.col("t_click")) & (F.col("t_click") < F.col("t_purchase")),
                1,
            ).otherwise(0)
        ).alias("n_full_funnel"),
    )


# ---------------------------------------------------------------------------
# Z-score normalization + outliers (shared exact-moment formula)
# ---------------------------------------------------------------------------

# value is 2-dp data (DECIMAL(7,2)-exact); sxx needs one decimal square.
# DuckDB operand width must exceed 18 to force its int128 multiply
# kernel (see agg_stats_moments), hence DECIMAL(19,2) there; Spark's
# (18,2)×(18,2)→(37,4) stays exact under its own widening rules.
_Z_EXPR = "round((value - sx / n) / sqrt((sxx - sx * sx / n) / (n - 1.0)), 9)"

_Z_STATS_SQL = """
    SELECT event_type,
           CAST(COUNT(*) AS DOUBLE) AS n,
           CAST(SUM(CAST(value AS DECIMAL(7,2))) AS DOUBLE) AS sx,
           CAST(SUM(CAST(value AS DECIMAL(19,2))
                    * CAST(value AS DECIMAL(19,2))) AS DOUBLE) AS sxx
    FROM events
    GROUP BY event_type
"""


def _zscored(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Events with a per-type z-score from exact decimal moments. The
    5-row stats table joins back as a broadcast; the z formula is one
    fixed IEEE sequence shared with the oracle (_Z_EXPR)."""
    ev = load_table(spark, sf_dir, "events")
    d = F.col("value").cast("decimal(18,2)")
    stats = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum(d).cast("double").alias("sx"),
        F.sum(d * d).cast("double").alias("sxx"),
    )
    return (
        ev.select("event_id", "event_type", "value")
        .join(F.broadcast(stats), "event_type")
        .withColumn("zscore", F.expr(_Z_EXPR))
    )


@query(
    "pipeline_event_zscore",
    oracle=f"""
    SELECT e.event_id, e.event_type, e.value, {_Z_EXPR} AS zscore
    FROM events e JOIN ({_Z_STATS_SQL}) s ON e.event_type = s.event_type
    """,
)
def pipeline_event_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type z-score normalization of event values — the standard
    featurization step. Grouped exact-decimal moments (one K-row
    shuffle) broadcast-joined back to the stream; fully map-side after
    the 5-row join."""
    return _zscored(spark, sf_dir).select("event_id", "event_type", "value", "zscore")


@query(
    "pipeline_value_outliers",
    oracle=f"""
    SELECT e.event_id, e.event_type, e.value, {_Z_EXPR} AS zscore
    FROM events e JOIN ({_Z_STATS_SQL}) s ON e.event_type = s.event_type
    WHERE abs({_Z_EXPR}) > 3.0
    """,
)
def pipeline_value_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-sigma outlier flagging on the z-scored stream — the data-
    quality quarantine pass. Same plan as pipeline_event_zscore plus a
    map-side filter on the rounded z (the filter reads the SAME rounded
    value the oracle filters on, so the boundary set is identical)."""
    z = _zscored(spark, sf_dir)
    return z.filter(F.abs(F.col("zscore")) > 3.0).select(
        "event_id", "event_type", "value", "zscore"
    )


# ---------------------------------------------------------------------------
# Documents: quality bands, length filter, token budget, corpus stats
# ---------------------------------------------------------------------------


@query(
    "pipeline_quality_band",
    oracle="""
    SELECT doc_id, source, n_chars, band
    FROM (
      SELECT doc_id, source, n_chars,
             CAST(ntile(10) OVER (PARTITION BY source
                                  ORDER BY n_chars, doc_id) AS BIGINT) AS band
      FROM documents
    ) t
    WHERE band >= 8
    """,
)
def pipeline_quality_band(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source decile banding by document length (the cheap quality
    proxy), keeping the top 3 bands — the filter-by-quality-quantile
    pass every corpus build runs. NTILE semantics (equal fill, earlier
    buckets take the remainder) are SQL-standard in both engines, and
    the (n_chars, doc_id) sort is a total order, so band assignment is
    deterministic. One shuffle on source; per-source sort."""
    docs = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("source").orderBy("n_chars", "doc_id")
    return (
        docs.select("doc_id", "source", "n_chars")
        .withColumn("band", F.ntile(10).over(w).cast("bigint"))
        .filter(F.col("band") >= 8)
    )


@query(
    "pipeline_length_filter",
    oracle="""
    SELECT doc_id, source, n_chars, round(pr, 9) AS pct_rank
    FROM (
      SELECT doc_id, source, n_chars,
             percent_rank() OVER (PARTITION BY source
                                  ORDER BY n_chars, doc_id) AS pr
      FROM documents
    ) t
    WHERE pr >= 0.25 AND pr <= 0.75
    """,
)
def pipeline_length_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interquartile length filter per source: drop the shortest and
    longest quartiles (boilerplate and concatenation artifacts live in
    the tails). percent_rank is the SQL-standard (rank-1)/(n-1) — an
    exact rational both engines compute identically in one double
    division; the filter runs on the raw value, the output carries it
    rounded."""
    docs = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("source").orderBy("n_chars", "doc_id")
    return (
        docs.select("doc_id", "source", "n_chars")
        .withColumn("pr", F.percent_rank().over(w))
        .filter((F.col("pr") >= 0.25) & (F.col("pr") <= 0.75))
        .select("doc_id", "source", "n_chars", F.round("pr", 9).alias("pct_rank"))
    )


@query(
    "pipeline_token_budget",
    oracle="""
    SELECT doc_id, source, n_toks, cum_toks
    FROM (
      SELECT doc_id, source,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_toks,
             CAST(SUM(len(string_split(text, ' ')))
                  OVER (PARTITION BY source ORDER BY doc_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS BIGINT) AS cum_toks
      FROM documents
    ) t
    WHERE cum_toks <= 5000
    """,
)
def pipeline_token_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus assembly under a per-source token budget: documents are
    admitted in doc_id order until the running token count passes
    5000 — the greedy budget cut every mixture recipe applies per
    source. One shuffle on source; the running sum and the admit filter
    share the sort."""
    docs = load_table(spark, sf_dir, "documents")
    toked = docs.select(
        "doc_id", "source", F.size(F.split("text", " ")).cast("bigint").alias("n_toks")
    )
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        toked.withColumn("cum_toks", F.sum("n_toks").over(w).cast("bigint"))
        .filter(F.col("cum_toks") <= 5000)
    )


@query(
    "pipeline_corpus_stats",
    oracle="""
    SELECT source, lang,
           COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           CAST(SUM(len(string_split(text, ' '))) AS DOUBLE) / COUNT(*) AS avg_toks,
           COUNT(DISTINCT sha256(text)) AS n_distinct_content
    FROM documents
    GROUP BY source, lang
    """,
)
def pipeline_corpus_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The corpus composition report: per (source, lang) cell — doc
    count, total characters, mean token length (exact integer sum over
    exact count), and distinct-content count (sha256 digests, the exact
    dedup currency). One partial→final aggregate; the distinct rides
    the same shuffle via Spark's expand."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.groupBy("source", "lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").cast("bigint").alias("total_chars"),
        (F.sum(F.size(F.split("text", " ")).cast("bigint")).cast("double")
         / F.count(F.lit(1))).alias("avg_toks"),
        F.countDistinct(F.sha2("text", 256)).alias("n_distinct_content"),
    )


@query(
    "pipeline_lang_balance",
    oracle="""
    WITH c AS (SELECT lang, COUNT(*) AS n FROM documents GROUP BY lang),
         m AS (SELECT MIN(n) AS n_min FROM c),
         r AS (
           SELECT doc_id, lang,
                  ROW_NUMBER() OVER (
                    PARTITION BY lang
                    ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
                  ) AS rn
           FROM documents
         )
    SELECT r.doc_id, r.lang FROM r, m WHERE r.rn <= m.n_min
    """,
)
def pipeline_lang_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language rebalancing: downsample every language to the size of
    the smallest one, choosing survivors by md5 order (deterministic
    uniform, engine-portable, accretion-stable — same discipline as
    split_train_test). The min class size is a 1-row broadcast; the
    per-language rank is one shuffle + bounded sort."""
    docs = load_table(spark, sf_dir, "documents")
    n_min = (
        docs.groupBy("lang").agg(F.count(F.lit(1)).alias("n"))
        .agg(F.min("n").alias("n_min"))
    )
    w = Window.partitionBy("lang").orderBy(
        F.md5(F.col("doc_id").cast("string")), F.col("doc_id")
    )
    ranked = docs.select("doc_id", "lang").withColumn("rn", F.row_number().over(w))
    return (
        ranked.crossJoin(F.broadcast(n_min))
        .filter(F.col("rn") <= F.col("n_min"))
        .select("doc_id", "lang")
    )


# ---------------------------------------------------------------------------
# N-gram analytics: contamination, document frequency, distinctive terms
# ---------------------------------------------------------------------------

# Distinct bigram per (doc, gram) — string grams, shared with several
# oracles below. The Spark twin keeps STRING grams too (not the usual
# xxhash64 longs) so the outputs are directly comparable; the hashed
# variant is the 100-TB form (see sim_ngram_jaccard's docstring).
_GRAMS_SQL = """
    SELECT doc_id, source,
           unnest(list_distinct([toks[i] || ' ' || toks[i+1]
                                 for i in range(1, len(toks))])) AS gram
    FROM (SELECT doc_id, source, string_split(text, ' ') AS toks FROM documents)
"""


def _doc_grams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, source, gram) with distinct string bigrams per doc.
    The doc_id repartition ahead of the gram fan-out is the round-11
    input-split lesson, applied round 12 to BOTH consumers
    (pipeline_contamination, pipeline_gram_df): the documents
    parquet's 2-split width was capping the array_distinct/explode
    stage at sf1 — the whole 0.84 SCALING slope measured for
    contamination was that artifact, not the algorithm."""
    docs = (
        load_table(spark, sf_dir, "documents")
        .repartition(spark.sparkContext.defaultParallelism, "doc_id")
    )
    toked = docs.select("doc_id", "source", F.split("text", " ").alias("toks"))
    return toked.select(
        "doc_id",
        "source",
        F.explode(F.array_distinct(token_ngrams("toks", 2))).alias("gram"),
    )


@query(
    "pipeline_contamination",
    oracle=f"""
    WITH g AS ({_GRAMS_SQL}),
         bench AS (SELECT DISTINCT gram FROM g WHERE source = 'src0')
    SELECT g.doc_id, COUNT(*) AS n_shared
    FROM g JOIN bench USING (gram)
    WHERE g.source <> 'src0'
    GROUP BY g.doc_id
    HAVING COUNT(*) >= 5
    """,
)
def pipeline_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark-contamination check: treat source 'src0' as the
    held-out benchmark and flag any other document sharing ≥5 distinct
    bigrams with it — the n-gram overlap test run before training data
    ships. The benchmark gram set is orders smaller than the corpus,
    so the join broadcasts it; per-doc counting is a partial→final
    aggregate on doc_id. Grams stay strings for oracle parity; at
    100 TB they'd be xxhash64 longs (identical counts up to 2⁻⁶⁴
    collisions).

    Round-12 slope fix: the shared _doc_grams kernel now repartitions
    on doc_id ahead of the gram fan-out (the round-11 input-split
    lesson — see its docstring; sf1 3.6→1.1 s here). A
    Bloom-prefiltered variant (the join_semireduced word-bitmap
    discipline) was measured and REJECTED here: this join is already
    broadcast + map-side, so the bitmap saves no exchange, and its
    per-raw-gram md5 probe costs more than the broadcast hash probe
    it replaces (measured sf0.1 0.8→2.7 s, sf1 3.6→14.3 s) — runtime
    filters pay off only when they prune rows BEFORE a shuffle, which
    this shape deliberately doesn't have."""
    g = _doc_grams(spark, sf_dir)
    bench = g.filter(F.col("source") == "src0").select("gram").distinct()
    return (
        g.filter(F.col("source") != "src0")
        .join(F.broadcast(bench), "gram")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .filter(F.col("n_shared") >= 5)
    )


@query(
    "pipeline_gram_df",
    oracle=f"""
    WITH g AS ({_GRAMS_SQL})
    SELECT gram, COUNT(*) AS df
    FROM g
    GROUP BY gram
    HAVING COUNT(*) >= 10
    ORDER BY df DESC, gram
    LIMIT 100
    """,
)
def pipeline_gram_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram document frequency: the top-100 most corpus-common
    bigrams with df ≥ 10 — the vocabulary/boilerplate report (grams are
    pre-deduped per doc, so COUNT(*) IS the document frequency). The
    ORDER BY carries the gram itself as tiebreak — a total order, so
    the limit cut is identical in both engines. Plan: partial→final
    count, then TakeOrderedAndProject (no global sort materializes)."""
    g = _doc_grams(spark, sf_dir)
    return (
        g.groupBy("gram")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") >= 10)
        .orderBy(F.col("df").desc(), F.col("gram"))
        .limit(100)
    )


@query(
    "pipeline_distinctive_terms",
    oracle="""
    WITH tf AS (
      SELECT doc_id, tok, COUNT(*) AS tf
      FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents)
      GROUP BY doc_id, tok
    ),
    df AS (SELECT tok, COUNT(*) AS df FROM tf GROUP BY tok)
    SELECT doc_id, tok, tf, df, score
    FROM (
      SELECT tf.doc_id, tf.tok, tf.tf, df.df,
             round(CAST(tf.tf AS DOUBLE) / df.df, 9) AS score,
             ROW_NUMBER() OVER (PARTITION BY tf.doc_id
                                ORDER BY CAST(tf.tf AS DOUBLE) / df.df DESC,
                                         tf.tok) AS rn
      FROM tf JOIN df USING (tok)
    ) t
    WHERE rn <= 3
    """,
)
def pipeline_distinctive_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 most distinctive terms per document by tf/df — the
    rank-equivalent of tf-idf for a fixed corpus size (tf·N/df is
    monotone in tf/df), chosen over the log form because ln() is a
    libm call with no cross-engine bit guarantee while one double
    division is IEEE-exact. Term counts shuffle once on (doc, tok);
    the df table is vocabulary-sized and broadcast back; per-doc top-3
    is a bounded window."""
    docs = load_table(spark, sf_dir, "documents")
    tf = (
        docs.select("doc_id", F.explode(F.split("text", " ")).alias("tok"))
        .groupBy("doc_id", "tok")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    df = tf.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
    score = F.col("tf").cast("double") / F.col("df")
    w = Window.partitionBy("doc_id").orderBy(score.desc(), F.col("tok"))
    return (
        tf.join(F.broadcast(df), "tok")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("doc_id", "tok", "tf", "df", F.round(score, 9).alias("score"))
    )


# ---------------------------------------------------------------------------
# Portable MinHash (oracle-checked near-dup) — md5 lanes, string min
# ---------------------------------------------------------------------------

_PORTABLE_LANES = 4


def _signature_of(docs: DataFrame) -> DataFrame:
    """The portable-MinHash signature kernel over an arbitrary
    (doc_id, text) frame — shared by the whole-corpus
    `_portable_signature` below and the corpus/batch split of
    `dedup_incremental_neardup` (queries/dedup.py), which signs the
    two sides SEPARATELY so the corpus side can come from the
    persisted index instead of recomputation.

    Shape (r19, the text_char_diversity playbook — guide §4.1): the
    lane mins run as explode + ONE codegen'd hash aggregate (4 min()
    columns) instead of 4 interpreted transform()+array_min HOF passes
    over the gram array — higher-order functions never enter
    whole-stage codegen, so the md5 work sat inside 8 interpreted
    loops. Every caller repartitions by doc_id first, so the groupBy
    reuses that exchange (plan: zero added Exchange; partial
    aggregation bounds any future unpartitioned caller's shuffle at
    ~1 row per doc per map partition). min() over md5 hex strings is
    binary ordering, identical to array_min — value-equality asserted
    in tests/test_operators.py and by every signature oracle.

    size(toks) >= 2 ⟺ size(gs) > 0, but a predicate on gs would be
    pushed down with the whole gram pipeline re-inlined into it and
    computed twice (see similarity.sim_ngram_jaccard's comment);
    explode of a non-empty gs keeps exactly the same doc set."""
    toked = docs.select("doc_id", F.split("text", " ").alias("toks")).filter(
        F.size("toks") >= 2
    )
    g = toked.select(
        "doc_id", F.explode(F.array_distinct(token_ngrams("toks", 2))).alias("g")
    )
    return g.groupBy("doc_id").agg(
        *[
            F.min(F.md5(F.concat(F.col("g"), F.lit(f"#{i}")))).alias(f"m{i}")
            for i in range(_PORTABLE_LANES)
        ]
    )


def _portable_signature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc 4-lane md5 MinHash signature over distinct bigrams.
    Lane i = lexicographic MIN of md5(gram || '#i') — md5 hex strings
    compare identically in both engines, so unlike the xxhash64 family
    (queries/similarity) this sketch is fully oracle-checkable. The
    lane min runs inside the per-row array (no explode, no shuffle);
    only (doc_id, 4×32-hex) ever leaves the scan."""
    # doc_id repartition ahead of the gram/md5 fan-out: this kernel
    # feeds the whole portable-MinHash family (signature → pairs → CC →
    # canonical → corpus build → pagerank), and its 4×|grams| md5 work
    # would otherwise run at the doc table's input-split width — 2
    # tasks at sf1, the top remaining SCALING.md slope (0.91) after the
    # round-11 substring/bpe/boilerplate fixes. One shuffle of the raw
    # text buys cluster-wide width for every downstream consumer.
    docs = (
        load_table(spark, sf_dir, "documents")
        .repartition(spark.sparkContext.defaultParallelism, "doc_id")
    )
    return _signature_of(docs)


_SIG_SQL = f"""
    SELECT doc_id,
           {", ".join(
               f"list_min([md5(g || '#{i}') for g in gs]) AS m{i}"
               for i in range(_PORTABLE_LANES)
           )}
    FROM (
      SELECT doc_id, list_distinct([toks[i] || ' ' || toks[i+1]
                                    for i in range(1, len(toks))]) AS gs
      FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
    )
    WHERE len(gs) > 0
"""


@query("pipeline_doc_signature", oracle=_SIG_SQL)
def pipeline_doc_signature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The portable MinHash signature table itself — hash-verified
    against DuckDB, which pins the whole shingle→lane→min pipeline
    exactly (the xxhash64 production sketch in `similarity` is
    calibrated statistically; this one is checked value-for-value)."""
    return _portable_signature(spark, sf_dir)


# Shared oracle spec for the portable candidate-pair set: the self-join
# is the SEMANTIC definition; the Spark plan is groupBy-bucket pair
# expansion (see _portable_pairs).
_PORTABLE_PAIRS_SQL = f"""
    WITH sig AS ({_SIG_SQL})
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
    FROM sig a JOIN sig b
      ON a.m0 = b.m0 AND a.m1 = b.m1 AND a.m2 = b.m2 AND a.m3 = b.m3
     AND a.doc_id < b.doc_id
"""


def _portable_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_a < doc_b) candidate pairs agreeing on the full 4-lane
    portable signature — groupBy the signature and expand pairs inside
    each bucket (sorted members → each pair emitted exactly once), so
    the signature pipeline executes once and only ids shuffle."""
    sig = _portable_signature(spark, sf_dir)
    key = [f"m{i}" for i in range(_PORTABLE_LANES)]
    buckets = (
        sig.groupBy(*key)
        .agg(F.sort_array(F.collect_list("doc_id")).alias("members"))
        .filter(F.size("members") > 1)
    )
    pairs = F.flatten(
        F.transform(
            "members",
            lambda a, i: F.transform(
                F.slice("members", i + 2, F.size("members")),
                lambda b: F.struct(a.alias("doc_a"), b.alias("doc_b")),
            ),
        )
    )
    return (
        buckets.select(F.explode(pairs).alias("p"))
        .select(F.col("p.doc_a").alias("doc_a"), F.col("p.doc_b").alias("doc_b"))
    )


@query("pipeline_minhash_pairs_portable", oracle=_PORTABLE_PAIRS_SQL)
def pipeline_minhash_pairs_portable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate candidate pairs agreeing on the FULL 4-lane
    portable signature (one band of 4 — high-precision candidates).
    Spark-first shape: groupBy the signature and expand pairs inside
    each bucket (sorted members → each pair emitted (smaller, larger)
    exactly once), so the signature pipeline executes once and only
    ids shuffle — the oracle's self-join is the semantic spec, not the
    plan."""
    return _portable_pairs(spark, sf_dir)


# Transitive closure of the portable pair set, as SQL: DuckDB's
# recursive CTE floods every component member with every label reachable
# from it (UNION = distinct keeps it finite), then MIN per node is the
# component's minimum id — the same fixpoint operators/graph.py reaches
# by iterative min-label propagation. Tractable at oracle scale because
# full-band portable buckets are tiny; the Spark side is the
# diameter-bounded distributed algorithm.
_PORTABLE_CLUSTERS_SQL = f"""
    WITH RECURSIVE
    pairs AS ({_PORTABLE_PAIRS_SQL}),
    und AS (
      SELECT doc_a AS a, doc_b AS b FROM pairs
      UNION SELECT doc_b, doc_a FROM pairs
    ),
    reach(node, label) AS (
      SELECT a, a FROM und
      UNION
      SELECT u.a, r.label FROM und u JOIN reach r ON u.b = r.node
    )
    SELECT node AS doc_id, MIN(label) AS cluster_id
    FROM reach GROUP BY node
"""


@query(
    "pipeline_dedup_clusters_portable",
    oracle=_PORTABLE_CLUSTERS_SQL + " ORDER BY doc_id",
)
def pipeline_dedup_clusters_portable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash-checked transitive dedup clusters: the portable MinHash
    candidate pairs promoted to connected components (A~B, B~C ⇒ one
    {A,B,C} group even though A~C was never emitted), labeled by the
    component's minimum doc_id.

    This graduates the engine's distributed connected-components
    operator itself (operators/graph.py — iterative min-label
    propagation, localCheckpoint lineage cuts, diameter-bounded) to a
    value-level DuckDB oracle via a recursive-CTE transitive closure:
    `dedup_cluster_cc` stays the production xxhash64 path (rows-only —
    its signature lanes aren't SQL-portable), while this query proves
    the clustering algorithm end-to-end on the portable edge set.

    Scale shape: edges are ids-only; each CC round is one join + one
    groupBy over (node, nbr); rounds = cluster diameter, which for
    full-band near-dup clusters is ~1-2. The oracle's closure is
    quadratic-in-component and exists only at oracle SF."""
    from ..operators.graph import connected_components

    cc = connected_components(_portable_pairs(spark, sf_dir), "doc_a", "doc_b")
    return cc.select(
        F.col("node").alias("doc_id"), F.col("comp").alias("cluster_id")
    ).orderBy("doc_id")


@query(
    "pipeline_canonical_docs",
    oracle=f"""
    WITH clusters AS ({_PORTABLE_CLUSTERS_SQL}),
    assign AS (
      SELECT d.doc_id, COALESCE(c.cluster_id, d.doc_id) AS cluster_id
      FROM documents d LEFT JOIN clusters c USING (doc_id)
    )
    SELECT doc_id, cluster_id,
           doc_id = cluster_id AS is_canonical,
           COUNT(*) OVER (PARTITION BY cluster_id) AS cluster_size
    FROM assign ORDER BY doc_id
    """,
)
def pipeline_canonical_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The dedup sweep's final verdict table — EVERY document mapped to
    its cluster (its connected-component minimum over the portable
    near-dup pairs, or itself when it has no near-dup), with the
    canonical-survivor flag and cluster size a corpus build filters on
    (`is_canonical` keeps one representative per cluster; `cluster_size`
    feeds duplication-rate reporting).

    Scale shape: the cluster table is near-dup-mass-sized (≪ corpus),
    so the assignment join's build side stays small; the id-only left
    join and the cluster_size window are the only exchanges, and both
    shuffle bare ids — never text. Completes the pairs → clusters →
    surviving-corpus story as three hash-checked stages."""
    from ..operators.graph import connected_components

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    cc = connected_components(_portable_pairs(spark, sf_dir), "doc_a", "doc_b")
    assign = docs.join(
        cc.select(F.col("node").alias("doc_id"), F.col("comp").alias("cid")),
        "doc_id",
        "left",
    ).select("doc_id", F.coalesce("cid", F.col("doc_id")).alias("cluster_id"))
    w = Window.partitionBy("cluster_id")
    return assign.select(
        "doc_id",
        "cluster_id",
        (F.col("doc_id") == F.col("cluster_id")).alias("is_canonical"),
        F.count(F.lit(1)).over(w).alias("cluster_size"),
    ).orderBy("doc_id")


# ---------------------------------------------------------------------------
# Warehouse: customer revenue (TPC-H Q10 shape), deciles, profile
# ---------------------------------------------------------------------------


@query(
    "pipeline_customer_revenue",
    oracle=f"""
    SELECT c_custkey, c_name, n_name,
           CAST(SUM({SQL_REVENUE}) AS DOUBLE) AS revenue,
           COUNT(*) AS n_items
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation   ON c_nationkey = n_nationkey
    WHERE l_returnflag = 'R'
    GROUP BY c_custkey, c_name, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
)
def pipeline_customer_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Returned-item revenue per customer, top 20 (TPC-H Q10 shape) —
    the serving-side enrichment query a churn pipeline feeds from.
    lineitem filters map-side on returnflag before the join; nation
    broadcasts; the orders⋈lineitem join and the customer rollup are
    the only exchanges. Revenue goes through exact decimal
    (functions.revenue_expr); (revenue DESC, custkey) is a total order
    so the limit is deterministic — TakeOrderedAndProject, no global
    sort."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    nation = load_table(spark, sf_dir, "nation")
    return (
        cust.join(orders, cust["c_custkey"] == orders["o_custkey"])
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(
            F.sum(revenue_expr()).cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
    )


@query(
    "pipeline_price_deciles",
    oracle="""
    SELECT decile,
           COUNT(*) AS n_orders,
           CAST(MIN(o_totalprice) AS DOUBLE) AS min_price,
           CAST(MAX(o_totalprice) AS DOUBLE) AS max_price,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
    FROM (
      SELECT o_totalprice,
             CAST(ntile(10) OVER (ORDER BY o_totalprice, o_orderkey) AS BIGINT)
               AS decile
      FROM orders
    ) t
    GROUP BY decile
    """,
)
def pipeline_price_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-value decile profile: count/min/max/exact-sum per global
    price decile — the spend-distribution report, with NO
    single-partition stage. Round 1 used a bare global-window NTILE
    (all rows sorted in ONE task — the plan shape that dies first at
    100 TB); the decile is now rebuilt exactly from the distributed
    two-phase rank (operators/rank.py: range-repartition + local
    row_number + broadcast partition offsets) and NTILE's integer
    bucket-size contract, with the total count a 1-row broadcast. Same
    oracle as before — bit-identical deciles, scalable plan (asserted
    single-partition-free in tests/test_plans.py). The approx sibling
    (`agg_approx_quantile`) stays the sketch this exact anchor
    calibrates."""
    from ..operators.rank import exact_ntile, global_row_number

    orders = load_table(spark, sf_dir, "orders")
    ranked = global_row_number(
        orders.select("o_totalprice", "o_orderkey"),
        ["o_totalprice", "o_orderkey"],
        rank_col="rank",
    )
    total = ranked.agg(F.count(F.lit(1)).alias("__total"))
    banded = ranked.crossJoin(F.broadcast(total)).select(
        "o_totalprice",
        exact_ntile(F.col("rank"), F.col("__total"), 10).alias("decile"),
    )
    return banded.groupBy("decile").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.min("o_totalprice").cast("double").alias("min_price"),
        F.max("o_totalprice").cast("double").alias("max_price"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double").alias("sum_price"),
    )


@query(
    "pipeline_schema_profile",
    oracle="""
    SELECT COUNT(*) AS n_rows,
           COUNT(DISTINCT user_id) AS n_users,
           COUNT(DISTINCT event_type) AS n_types,
           COUNT(*) - COUNT(value) AS n_null_value,
           COUNT(*) - COUNT(props) AS n_null_props,
           MIN(ts) AS min_ts,
           MAX(ts) AS max_ts
    FROM events
    """,
)
def pipeline_schema_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-row table health profile of the events stream: cardinality,
    null counts, and the time span — the freshness/completeness check a
    pipeline runs before admitting a batch (the generalization of the
    reference's high-water-mark probe, weather_task.py:72-76). Single
    partial→final aggregate pass, two exact distincts riding one
    expand."""
    ev = load_table(spark, sf_dir, "events")
    return ev.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.countDistinct("user_id").alias("n_users"),
        F.countDistinct("event_type").alias("n_types"),
        (F.count(F.lit(1)) - F.count("value")).alias("n_null_value"),
        (F.count(F.lit(1)) - F.count("props")).alias("n_null_props"),
        F.min("ts").alias("min_ts"),
        F.max("ts").alias("max_ts"),
    )


@query(
    "pipeline_scd2_history",
    oracle="""
    WITH o AS (
      SELECT user_id, ts, event_id, event_type,
             CASE WHEN LAG(event_type) OVER w IS DISTINCT FROM event_type
                  THEN 1 ELSE 0 END AS chg
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    runs AS (
      SELECT user_id, ts, event_type,
             SUM(chg) OVER (PARTITION BY user_id ORDER BY ts, event_id
                            ROWS UNBOUNDED PRECEDING) AS rid
      FROM o
    ),
    spans AS (
      SELECT user_id, rid, event_type,
             MIN(ts) AS valid_from,
             COUNT(*) AS n_events
      FROM runs GROUP BY user_id, rid, event_type
    )
    SELECT user_id, event_type, valid_from, n_events,
           LEAD(valid_from) OVER (PARTITION BY user_id ORDER BY rid)
             AS valid_to,
           LEAD(valid_from) OVER (PARTITION BY user_id ORDER BY rid) IS NULL
             AS is_current
    FROM spans
    """,
)
def pipeline_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD-type-2 history build from an event log: compress each user's
    consecutive same-event_type runs into validity intervals
    [valid_from, valid_to) with an is_current flag — the CDC-to-
    dimension-table transform every warehouse load runs (the interval
    form of `dedup_keep_latest`, which keeps only the last row).

    Shape: gaps-and-islands (lag → change flag → running sum = run id)
    then one aggregate per run, then lead for the closing bound. All
    three windows and the aggregate cluster on user_id, so Catalyst
    plans ONE user_id exchange — the aggregate and final window reuse
    the window sort's partitioning (same single-shuffle discipline as
    pipeline_sessionize). event_id tiebreaks equal timestamps on both
    engines."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "event_type"
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev = F.lag("event_type").over(w)
    chg = F.when(prev.isNull() | (prev != F.col("event_type")), 1).otherwise(0)
    runs = ev.withColumn(
        "rid",
        F.sum(chg).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)),
    )
    spans = runs.groupBy("user_id", "rid", "event_type").agg(
        F.min("ts").alias("valid_from"), F.count(F.lit(1)).alias("n_events")
    )
    wlead = Window.partitionBy("user_id").orderBy("rid")
    valid_to = F.lead("valid_from").over(wlead)
    return spans.select(
        "user_id",
        "event_type",
        "valid_from",
        "n_events",
        valid_to.alias("valid_to"),
        valid_to.isNull().alias("is_current"),
    )


@query(
    "pipeline_embedding_quantize",
    oracle="""
    WITH v AS (
      SELECT vec_id,
             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
      FROM embeddings
    ),
    s AS (
      SELECT vec_id, e,
             list_aggregate(list_transform(e, x -> abs(x)), 'max') AS scale
      FROM v
    ),
    q AS (
      SELECT vec_id, scale,
             list_transform(e, x -> floor(x / scale * 127.0 + 0.5)) AS qv,
             e
      FROM s WHERE scale > 0
    )
    SELECT vec_id, scale,
           CAST(list_aggregate(qv, 'sum') AS BIGINT) AS q_sum,
           CAST(list_aggregate(qv, 'min') AS BIGINT) AS q_min,
           CAST(list_aggregate(qv, 'max') AS BIGINT) AS q_max,
           list_aggregate(
             list_transform(list_zip(qv, e),
                            p -> abs(p[1] / 127.0 * scale - p[2])),
             'max') AS err_max
    FROM q
    """,
)
def pipeline_embedding_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric int8 quantization of the embedding column — the memory
    move that makes a 100-TB ANN index fit (64 float32 → 64 int8 + one
    scale, 4× smaller, dot products in integer SIMD). Per vector:
    max-abs scale, q = floor(x/scale·127 + 0.5) (floor(+0.5) — NOT
    round(), whose half-even/half-up convention differs across engines;
    floor is correctly-rounded IEEE in both), and the reconstruction
    error bound err_max = max|q/127·scale − x| — the number an ANN
    recall budget is set against. Output pins the quantized content via
    exact q_sum/q_min/q_max scalars (array columns don't hash portably
    across engines). Pure map-side — zero shuffles, streams at scan
    speed; the quantized form feeds the same LSH/IVF index builds
    (similarity.py) with 4× more vectors per executor-GB."""
    emb = load_table(spark, sf_dir, "embeddings")
    e = F.transform("embedding", lambda x: x.cast("double"))
    with_scale = emb.select(
        "vec_id",
        e.alias("e"),
        F.array_max(F.transform(e, lambda x: F.abs(x))).alias("scale"),
    ).filter(F.col("scale") > 0)
    qv = F.transform(
        "e", lambda x: F.floor(x / F.col("scale") * F.lit(127.0) + F.lit(0.5))
    )
    return with_scale.select(
        "vec_id",
        "scale",
        F.aggregate(qv, F.lit(0).cast("double"), lambda a, x: a + x)
        .cast("bigint")
        .alias("q_sum"),
        F.array_min(qv).cast("bigint").alias("q_min"),
        F.array_max(qv).cast("bigint").alias("q_max"),
        F.array_max(
            F.zip_with(
                qv,
                F.col("e"),
                lambda q, x: F.abs(q / F.lit(127.0) * F.col("scale") - x),
            )
        ).alias("err_max"),
    )


@query(
    "pipeline_sequence_pack",
    oracle="""
    WITH t AS (
      SELECT doc_id, source,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_toks,
             CAST(SUM(len(string_split(text, ' ')))
                  OVER (PARTITION BY source ORDER BY doc_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS BIGINT) AS cum_toks
      FROM documents
    )
    SELECT doc_id, source, n_toks,
           (cum_toks - n_toks) // 2048 AS pack_id,
           (cum_toks - n_toks) % 2048 AS pack_offset
    FROM t
    """,
)
def pipeline_sequence_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-sequence packing: concatenate each source's documents
    in doc_id order into fixed 2048-token sequences and report, per
    document, which pack it starts in and at what token offset — the
    assembly step between a curated corpus and a causal-LM dataloader
    (documents straddle pack boundaries, as in standard pretraining
    packing). One running-sum window per source (same single-exchange
    shape as pipeline_token_budget), then pure integer math; floor-div
    and mod on exact BIGINT token counts are engine-portable."""
    docs = load_table(spark, sf_dir, "documents")
    toked = docs.select(
        "doc_id", "source", F.size(F.split("text", " ")).cast("bigint").alias("n_toks")
    )
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    start = F.sum("n_toks").over(w) - F.col("n_toks")
    return toked.select(
        "doc_id",
        "source",
        "n_toks",
        F.floor(start / 2048).cast("bigint").alias("pack_id"),
        (start % 2048).cast("bigint").alias("pack_offset"),
    )


# Training-shard geometry: fixed token budget per shipped shard. A
# plan literal (folded into the oracle text), so driver re-runs hash
# identically; production tunes it to the dataloader's shard size.
_SHARD_TOKENS = 4096


@query(
    "pipeline_shuffle_shard",
    oracle=f"""
    WITH t AS (
      SELECT doc_id,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_toks,
             md5(CAST(doc_id AS VARCHAR)) AS h
      FROM documents
    ), o AS (
      SELECT doc_id, n_toks,
             CAST(ROW_NUMBER() OVER (ORDER BY h, doc_id) AS BIGINT)
               AS shuffle_pos,
             CAST(SUM(n_toks) OVER (ORDER BY h, doc_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS BIGINT) AS cum
      FROM t
    )
    SELECT doc_id, shuffle_pos, n_toks,
           (cum - n_toks) // {_SHARD_TOKENS} AS shard_id,
           (cum - n_toks) % {_SHARD_TOKENS} AS shard_offset
    FROM o
    """,
)
def pipeline_shuffle_shard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic global shuffle → fixed-size training shards — the
    SHIP stage that closes the dedup → filter → mix → pack → ship
    pipeline (r17 verdict task #4): after curation, a pretraining
    corpus leaves the engine as a deterministically shuffled sequence
    of fixed-token-budget shards, and the dataloader contract is the
    manifest emitted here — per document: its global shuffle position,
    token span, and the (shard_id, shard_offset) where its tokens
    begin (documents straddle shard boundaries, exactly like
    pipeline_sequence_pack's packing — the downstream reader
    concatenates in shuffle_pos order and cuts every _SHARD_TOKENS
    tokens).

    The shuffle order is md5(doc_id) — the engine's one sampling
    currency (split_train_test / pipeline_lang_balance): deterministic
    and engine-portable (the oracle replays it as a single global
    window), uniform (md5 is an avalanche map, so adjacent input docs
    land far apart — the decorrelation a training shuffle exists for),
    and accretion-stable (adding documents perturbs positions but
    never reorders two survivors' relative md5 order).

    Scale shape — the reason this is NOT the oracle's single global
    window: a global ROW_NUMBER/running-sum over one partition is the
    canonical 100-TB straggler. The plan is a DISTRIBUTED PREFIX SUM:
    docs hash into 256 ORDERED md5-prefix ranges (the first two hex
    chars of the shuffle key — range-partitioning the shuffle space),
    each range computes its local rank + running token sum in
    parallel (one exchange on the bucket key), and a 256-row
    per-bucket total frame — aggregated map-side, cumulated over the
    tiny bucket list, broadcast back — converts local ranks to global
    positions. Global order ≡ (bucket, h, doc_id) ≡ (h, doc_id)
    because the bucket is a prefix of h. At 1000 executors the only
    data-sized exchange is the bucket repartition; the single-row
    window the oracle runs never exists in the plan."""
    docs = load_table(spark, sf_dir, "documents")
    t = docs.select(
        "doc_id",
        F.size(F.split("text", " ")).cast("bigint").alias("n_toks"),
        F.md5(F.col("doc_id").cast("string")).alias("h"),
    ).withColumn("bucket", F.substring("h", 1, 2))
    w_rank = Window.partitionBy("bucket").orderBy("h", "doc_id")
    w_sum = w_rank.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    local = t.select(
        "doc_id",
        "n_toks",
        "bucket",
        F.row_number().over(w_rank).cast("bigint").alias("rn"),
        F.sum("n_toks").over(w_sum).cast("bigint").alias("cum"),
    )
    # per-bucket totals: 256 rows — the exclusive cumulative over the
    # ORDERED bucket list is window-over-tiny-frame work, then ships
    # back as a broadcast (the scalar-broadcast discipline, not a
    # data-sized exchange)
    w_base = Window.orderBy("bucket").rowsBetween(
        Window.unboundedPreceding, -1
    )
    bases = (
        t.groupBy("bucket")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("b_rows"),
            F.sum("n_toks").cast("bigint").alias("b_toks"),
        )
        .select(
            "bucket",
            F.coalesce(F.sum("b_rows").over(w_base), F.lit(0))
            .cast("bigint")
            .alias("base_rows"),
            F.coalesce(F.sum("b_toks").over(w_base), F.lit(0))
            .cast("bigint")
            .alias("base_toks"),
        )
    )
    start = F.col("base_toks") + F.col("cum") - F.col("n_toks")
    return (
        local.join(F.broadcast(bases), "bucket")
        .select(
            "doc_id",
            (F.col("base_rows") + F.col("rn")).cast("bigint").alias("shuffle_pos"),
            "n_toks",
            start.alias("start"),
        )
        .select(
            "doc_id",
            "shuffle_pos",
            "n_toks",
            F.expr(f"start div {_SHARD_TOKENS}").alias("shard_id"),
            (F.col("start") % _SHARD_TOKENS).cast("bigint").alias("shard_offset"),
        )
    )


@query(
    "pipeline_incremental_rollup",
    oracle="""
    SELECT event_type,
           COUNT(*) AS n_rows,
           CAST(SUM(CAST(value AS DECIMAL(28,2))) AS DOUBLE) AS sum_value,
           MIN(value) AS min_value,
           MAX(value) AS max_value,
           CAST(SUM(CAST(value AS DECIMAL(28,2))) AS DOUBLE) / COUNT(value)
             AS avg_value
    FROM events
    GROUP BY event_type
    """,
)
def pipeline_incremental_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incrementally-maintained rollup: the per-type stats state is
    built SEPARATELY for the warehouse history (ts ≤ HWM) and the new
    batch (ts > HWM), merged with merge_agg_states, and finalized —
    and the oracle is the DIRECT aggregate over all of events, so the
    hash check proves merge ≡ recompute (the algebraic-state contract
    of operators/incremental.py). At 100 TB this is the difference
    between folding a day's state into a rollup and re-scanning years
    of history; exact decimal state makes the equivalence bit-stable
    regardless of how many increments built it."""
    from ..operators.incremental import (
        agg_state,
        finalize_agg_state,
        merge_agg_states,
    )
    from . import HWM_LITERAL

    ev = load_table(spark, sf_dir, "events")
    history = agg_state(
        ev.filter(F.col("ts") <= F.lit(HWM_LITERAL)), ["event_type"], "value"
    )
    batch = agg_state(
        ev.filter(F.col("ts") > F.lit(HWM_LITERAL)), ["event_type"], "value"
    )
    return finalize_agg_state(merge_agg_states(history, batch, ["event_type"]))


# ---------------------------------------------------------------------------
# Near-dup graph degree distribution (on the oracle-checked pair set)
# ---------------------------------------------------------------------------


@query(
    "pipeline_neardup_degree",
    oracle=f"""
    WITH sig AS ({_SIG_SQL}),
    pairs AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM sig a JOIN sig b
        ON a.m0 = b.m0 AND a.m1 = b.m1 AND a.m2 = b.m2 AND a.m3 = b.m3
       AND a.doc_id < b.doc_id
    ), deg AS (
      SELECT doc_id, COUNT(*) AS degree FROM (
        SELECT doc_a AS doc_id FROM pairs
        UNION ALL SELECT doc_b FROM pairs
      ) GROUP BY doc_id
    )
    SELECT degree, COUNT(*) AS n_docs,
           MIN(doc_id) AS example_doc
    FROM deg GROUP BY degree
    """,
)
def pipeline_neardup_degree(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree distribution of the near-duplicate graph — how many
    documents have exactly k near-dup partners (plus a deterministic
    example doc per bucket). The shape analysts check before running
    connected components: a heavy tail here means giant dup clusters
    (template farms) that deserve their own treatment, and the maximum
    degree bounds the CC workload. Built on the PORTABLE signature
    pair set, so the whole chain signature→pairs→degrees→histogram is
    hash-verified. Degrees come from exploding each pair into both
    endpoints and counting — one shuffle on doc_id over ids only; the
    histogram is a re-aggregation of the tiny degree table."""
    pairs = pipeline_minhash_pairs_portable(spark, sf_dir)
    deg = (
        pairs.select(F.col("doc_a").alias("doc_id"))
        .unionAll(pairs.select(F.col("doc_b").alias("doc_id")))
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("degree"))
    )
    return deg.groupBy("degree").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.min("doc_id").alias("example_doc"),
    )


# ---------------------------------------------------------------------------
# Event debounce (drop rapid repeats per user+type)
# ---------------------------------------------------------------------------

_DEBOUNCE_US = 600 * 1_000_000  # 10 minutes


@query(
    "pipeline_debounce",
    oracle=f"""
    SELECT event_id, user_id, event_type, ts,
           prev_ts IS NOT NULL
             AND date_diff('microsecond', prev_ts, ts) <= {_DEBOUNCE_US}
             AS is_debounced
    FROM (
      SELECT event_id, user_id, event_type, ts,
             LAG(ts) OVER (PARTITION BY user_id, event_type
                           ORDER BY ts, event_id) AS prev_ts
      FROM events
    )
    """,
)
def pipeline_debounce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Debounce flag per event — TRUE when the same (user, type)
    already fired within the previous 10 minutes, the duplicate-click
    suppression every event collector needs before counting anything.
    Gap math is exact integer µs (no float, no calendar arithmetic);
    the lag window orders by (ts, event_id) so ties are total. One
    shuffle on (user_id, event_type); at 100 TB this is the same
    partition the sessionizer already uses, so a pipeline running
    both shares the exchange. The streaming twin is
    stream_dedup_stateful with a TTL'd key state."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    prev = F.lag("ts").over(w)
    gap = F.unix_micros(F.col("ts")) - F.unix_micros(prev)
    return ev.select(
        "event_id",
        "user_id",
        "event_type",
        "ts",
        (prev.isNotNull() & (gap <= _DEBOUNCE_US)).alias("is_debounced"),
    )


@query(
    "pipeline_corpus_build",
    oracle=f"""
    WITH RECURSIVE
    pairs AS ({_PORTABLE_PAIRS_SQL}),
    und AS (
      SELECT doc_a AS a, doc_b AS b FROM pairs
      UNION SELECT doc_b, doc_a FROM pairs
    ),
    reach(node, label) AS (
      SELECT a, a FROM und
      UNION
      SELECT u.a, r.label FROM und u JOIN reach r ON u.b = r.node
    ),
    clusters AS (
      SELECT node AS doc_id, MIN(label) AS cluster_id
      FROM reach GROUP BY node
    ),
    canon AS (
      SELECT d.doc_id, d.source, d.lang, d.text
      FROM documents d LEFT JOIN clusters c USING (doc_id)
      WHERE COALESCE(c.cluster_id, d.doc_id) = d.doc_id
    ),
    quality AS (
      SELECT doc_id, source, lang,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_toks
      FROM canon
      WHERE len(text) BETWEEN 150 AND 500
    ),
    admitted AS (
      SELECT *, SUM(n_toks) OVER (PARTITION BY source ORDER BY doc_id
                                  ROWS UNBOUNDED PRECEDING) AS cum_toks
      FROM quality
    )
    SELECT source, lang,
           COUNT(*) AS n_docs,
           CAST(SUM(n_toks) AS BIGINT) AS total_toks,
           MIN(doc_id) AS first_doc,
           MAX(doc_id) AS last_doc
    FROM admitted
    WHERE cum_toks <= 20000
    GROUP BY source, lang
    """,
)
def pipeline_corpus_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    """THE END-TO-END CORPUS BUILD — every stage of the training-data
    sweep composed into one plan, and the whole composition
    hash-checked: (1) near-dup CANONICALIZATION — portable MinHash
    pairs → connected components → keep only each cluster's minimum
    doc (the pipeline_canonical_docs verdict applied as a filter);
    (2) QUALITY GATE — document length inside [150, 500] chars (the
    text_quality band's length leg, kept integer-exact);
    (3) BUDGETED ADMISSION — greedy per-source token budget of 20k in
    doc_id order (pipeline_token_budget's shape); (4) the corpus
    REPORT per (source, lang).

    One registered call a user points at a landing zone to get a
    deduplicated, quality-gated, budget-cut corpus summary — proving
    the stages COMPOSE in one Catalyst plan (CC's iterative fixpoint
    feeds a join feeds windows feeds the final rollup) rather than as
    disconnected demos.

    Scale: every stage is the scale shape its standalone query
    documents (ids-only CC edges, map-side quality gate, one window
    exchange per source). The oracle replays all four stages in SQL —
    recursive-CTE closure for the clustering — so the hash certifies
    the full composition."""
    from ..operators.graph import connected_components

    docs = load_table(spark, sf_dir, "documents")
    cc = connected_components(_portable_pairs(spark, sf_dir), "doc_a", "doc_b")
    clusters = cc.select(
        F.col("node").alias("doc_id"), F.col("comp").alias("cluster_id")
    )
    # no forced broadcast: cluster mass is data-dependent (the near-dup
    # fraction of the corpus), so the id-only cluster table is left to
    # AQE — tiny here, shuffle-joined at 100 TB — rather than pinned to
    # driver/executor memory (same fix as pipeline_neardup_apply)
    canon = (
        docs.join(clusters, "doc_id", "left")
        .filter(
            F.coalesce("cluster_id", "doc_id") == F.col("doc_id")
        )
        .select("doc_id", "source", "lang", "text")
    )
    quality = canon.filter(
        (F.length("text") >= 150) & (F.length("text") <= 500)
    ).select(
        "doc_id",
        "source",
        "lang",
        F.size(F.split("text", " ")).cast("bigint").alias("n_toks"),
    )
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    admitted = quality.withColumn("cum_toks", F.sum("n_toks").over(w)).filter(
        F.col("cum_toks") <= 20000
    )
    return admitted.groupBy("source", "lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_toks").cast("bigint").alias("total_toks"),
        F.min("doc_id").alias("first_doc"),
        F.max("doc_id").alias("last_doc"),
    )


@query(
    "pipeline_cdc_apply",
    oracle="""
    WITH r AS (
      SELECT user_id, ts, event_id, event_type, value,
             CASE WHEN event_type = 'error' THEN 1 ELSE 0 END AS is_del,
             CAST(COALESCE(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
                      OVER (PARTITION BY user_id ORDER BY ts, event_id
                            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                  0) AS BIGINT) AS gen,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY ts DESC, event_id DESC) AS rnd
      FROM events
    ),
    last AS (
      SELECT user_id, event_type AS last_event_type, gen, is_del
      FROM r WHERE rnd = 1
    ),
    stats AS (
      SELECT user_id, gen,
             CAST(COUNT(*) AS BIGINT) AS gen_events,
             CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS gen_value_sum,
             MIN(ts) AS gen_first_ts, MAX(ts) AS gen_last_ts
      FROM r WHERE is_del = 0 GROUP BY user_id, gen
    )
    SELECT l.user_id, CAST(l.gen + 1 AS BIGINT) AS n_generations,
           l.last_event_type, s.gen_events, s.gen_value_sum,
           s.gen_first_ts, s.gen_last_ts
    FROM last l JOIN stats s ON s.user_id = l.user_id AND s.gen = l.gen
    WHERE l.is_del = 0
    ORDER BY l.user_id
    """,
)
def pipeline_cdc_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC changelog apply with tombstones: replay the event log as a
    change stream keyed by user_id — 'error' events are DELETE
    tombstones, everything else upserts — and materialize the final
    table state. A key whose LAST op is a tombstone is absent from the
    output; a key that was deleted and re-inserted surfaces only its
    CURRENT generation (the events after its last tombstone), with
    n_generations counting the delete-separated lifetimes. This is the
    warehouse MERGE/CDC-apply the reference's append-only JDBC sink
    (reference spark_tasks/weather_task.py:95-99) cannot express — the
    row-level generalization of pipeline_scd2_history's interval
    compression.

    Shape: ONE user_id exchange, join-free — the generation numbering
    (running tombstone count, exclusive frame) and the last-row marker
    sort on user_id, and the per-generation aggregates run as WINDOW
    functions over (user_id, gen), whose clustering requirement
    hashpartitioning(user_id) already satisfies — Catalyst inserts a
    re-sort, not a re-shuffle, and the final state falls out of the
    single surviving last-row filter. At 100 TB the changelog apply is
    one shuffle of the log, period: no second scan, no co-partitioned
    self-join, no driver state. Value sums are DECIMAL(18,2)-exact
    (functions.MONEY discipline), so the hash replays across
    engines."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "event_type", "value"
    )
    is_del = F.when(F.col("event_type") == "error", 1).otherwise(0)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    r = ev.select(
        "user_id",
        "ts",
        "event_type",
        "value",
        is_del.alias("is_del"),
        F.coalesce(
            F.sum(is_del).over(w.rowsBetween(Window.unboundedPreceding, -1)),
            F.lit(0),
        ).cast("bigint").alias("gen"),
        F.row_number()
        .over(
            Window.partitionBy("user_id").orderBy(
                F.desc("ts"), F.desc("event_id")
            )
        )
        .alias("rnd"),
    )
    live = F.col("is_del") == 0
    wg = Window.partitionBy("user_id", "gen")
    agg = r.select(
        "user_id",
        "event_type",
        "gen",
        "rnd",
        "is_del",
        F.sum(F.when(live, 1)).over(wg).alias("gen_events"),
        F.sum(F.when(live, F.col("value").cast("decimal(18,2)")))
        .over(wg)
        .cast("double")
        .alias("gen_value_sum"),
        F.min(F.when(live, F.col("ts"))).over(wg).alias("gen_first_ts"),
        F.max(F.when(live, F.col("ts"))).over(wg).alias("gen_last_ts"),
    )
    return (
        agg.filter((F.col("rnd") == 1) & live)
        .select(
            "user_id",
            (F.col("gen") + 1).cast("bigint").alias("n_generations"),
            F.col("event_type").alias("last_event_type"),
            F.col("gen_events").cast("bigint").alias("gen_events"),
            "gen_value_sum",
            "gen_first_ts",
            "gen_last_ts",
        )
        .orderBy("user_id")
    )


def _snapshot_diff_sql() -> str:
    from . import HWM_LITERAL

    return f"""
    WITH olds AS (
      SELECT user_id, event_type, ts,
             CASE WHEN event_type = 'error' THEN 1 ELSE 0 END AS is_del,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY ts DESC, event_id DESC) AS rn,
             COUNT(*) OVER (PARTITION BY user_id) AS n_events
      FROM events WHERE ts <= TIMESTAMP '{HWM_LITERAL}'
    ),
    old_state AS (
      SELECT user_id, event_type AS last_event_type, n_events
      FROM olds WHERE rn = 1 AND is_del = 0
    ),
    news AS (
      SELECT user_id, event_type, ts,
             CASE WHEN event_type = 'error' THEN 1 ELSE 0 END AS is_del,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY ts DESC, event_id DESC) AS rn,
             COUNT(*) OVER (PARTITION BY user_id) AS n_events
      FROM events
    ),
    new_state AS (
      SELECT user_id, event_type AS last_event_type, ts AS last_ts, n_events
      FROM news WHERE rn = 1 AND is_del = 0
    )
    SELECT COALESCE(o.user_id, n.user_id) AS user_id,
           CASE WHEN o.user_id IS NULL THEN 'added'
                WHEN n.user_id IS NULL THEN 'removed'
                ELSE 'changed' END AS status,
           o.last_event_type AS old_last_event_type,
           n.last_event_type AS new_last_event_type,
           CAST(COALESCE(o.n_events, 0) AS BIGINT) AS old_n_events,
           CAST(COALESCE(n.n_events, 0) AS BIGINT) AS new_n_events,
           n.last_ts AS new_last_ts
    FROM old_state o FULL JOIN new_state n ON o.user_id = n.user_id
    WHERE o.user_id IS NULL OR n.user_id IS NULL
       OR o.n_events <> n.n_events
    ORDER BY user_id
    """


@query("pipeline_snapshot_diff", oracle=_snapshot_diff_sql())
def pipeline_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot reconciliation: diff the materialized table STATE at the
    incremental high-water mark (reference O4 semantics,
    weather_task.py:78-84) against the state now, under the CDC
    tombstone convention ('error' = delete, pipeline_cdc_apply). Each
    surviving row is a key whose state changed between the snapshots:
    'added' (alive now, absent-or-dead at the HWM), 'removed'
    (tombstoned since), 'changed' (alive at both, new events in
    between); unchanged keys are suppressed. This is the audit query a
    warehouse runs to certify an incremental load against a full
    rebuild — diffing STATES, not logs.

    Scale shape: the naive form materializes two snapshots and
    full-outer-joins them — two scans, three shuffles. This is ONE
    scan and ONE partial-aggregable groupBy(user_id): each snapshot's
    last-row is a conditional MAX over the lexicographic
    (ts, event_id, …) struct (associative, so it map-side combines;
    the watermark filter moves INSIDE the aggregate as a CASE), and
    the diff falls out of comparing the two structs per key. No join,
    no window sort — at 100 TB the reconciliation costs exactly one
    shuffle of (key, 2 structs + 2 counts)."""
    from . import HWM_LITERAL

    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        "ts",
        "event_id",
        "event_type",
        F.when(F.col("event_type") == "error", 1).otherwise(0).alias("is_del"),
    )
    le = F.col("ts") <= F.lit(HWM_LITERAL).cast("timestamp")
    snap = F.struct("ts", "event_id", "is_del", "event_type")
    g = ev.groupBy("user_id").agg(
        F.max(F.when(le, snap)).alias("o"),
        F.max(snap).alias("n"),
        F.sum(F.when(le, 1)).alias("old_n"),
        F.count(F.lit(1)).alias("new_n"),
    )
    old_alive = F.col("o").isNotNull() & (F.col("o.is_del") == 0)
    new_alive = F.col("n.is_del") == 0
    status = (
        F.when(~old_alive & new_alive, "added")
        .when(old_alive & ~new_alive, "removed")
        .when(
            old_alive & new_alive & (F.col("old_n") != F.col("new_n")),
            "changed",
        )
    )
    return (
        g.withColumn("status", status)
        .filter(F.col("status").isNotNull())
        .select(
            "user_id",
            "status",
            F.when(old_alive, F.col("o.event_type")).alias(
                "old_last_event_type"
            ),
            F.when(new_alive, F.col("n.event_type")).alias(
                "new_last_event_type"
            ),
            F.when(old_alive, F.col("old_n"))
            .otherwise(0)
            .cast("bigint")
            .alias("old_n_events"),
            F.when(new_alive, F.col("new_n"))
            .otherwise(0)
            .cast("bigint")
            .alias("new_n_events"),
            F.when(new_alive, F.col("n.ts")).alias("new_last_ts"),
        )
        .orderBy("user_id")
    )


_RRF_K = 60
_RRF_SCALE = 10**12
_RRF_TOP = 5


@query(
    "pipeline_rank_fusion",
    oracle=f"""
    WITH ranked AS (
      SELECT source, doc_id,
             CAST(ROW_NUMBER() OVER (PARTITION BY source
                                     ORDER BY n_chars DESC, doc_id) AS BIGINT)
               AS rank_len,
             CAST(ROW_NUMBER() OVER (PARTITION BY source
                 ORDER BY len(list_distinct(string_split(text, ' '))) DESC,
                          doc_id) AS BIGINT) AS rank_vocab
      FROM documents
    ),
    fused AS (
      SELECT source, doc_id, rank_len, rank_vocab,
             {_RRF_SCALE} // ({_RRF_K} + rank_len)
               + {_RRF_SCALE} // ({_RRF_K} + rank_vocab) AS rrf_num
      FROM ranked
    )
    SELECT source, doc_id, rank_len, rank_vocab, rrf_num,
           CAST(fused_rank AS BIGINT) AS fused_rank
    FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY source
                                   ORDER BY rrf_num DESC, doc_id) AS fused_rank
      FROM fused
    ) t WHERE fused_rank <= {_RRF_TOP}
    ORDER BY source, fused_rank
    """,
)
def pipeline_rank_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reciprocal-rank fusion (Cormack et al., SIGIR'09) of two
    independent per-source document rankings — length (n_chars desc)
    and vocabulary richness (distinct whitespace tokens desc) — into
    one exemplar list: the top-{_RRF_TOP} fused docs per source. The
    multi-signal canonical-pick every retrieval/curation pipeline
    runs when no single relevance score exists; RRF needs only RANKS,
    so wildly different score scales fuse without normalization.

    Float discipline: 1/(k+r) terms are served as the integer
    numerators {_RRF_SCALE}//(k+r) — floor division is exact in both
    engines, the fused ORDER is identical to the textbook float
    (x→1/x is strictly monotone and the numerators stay far from
    collision: adjacent ranks differ by ≥ ~10⁵ at rank 10⁴), and the
    emitted score is hash-comparable with zero ulp risk.

    Scale shape: both rankings AND the fused top-k are windows over
    the SAME source partitioning — one exchange, three in-partition
    sorts, no join (the two rank columns ride the same row through
    all three windows). Per-source ranking is the scale-correct RRF:
    fusion happens inside each retrieval shard, never via a global
    sort."""
    docs = load_table(spark, sf_dir, "documents").select(
        "source", "doc_id", "n_chars", "text"
    )
    w_len = Window.partitionBy("source").orderBy(F.desc("n_chars"), F.asc("doc_id"))
    w_voc = Window.partitionBy("source").orderBy(
        F.desc(F.size(F.array_distinct(F.split(F.col("text"), " ")))),
        F.asc("doc_id"),
    )
    ranked = docs.select(
        "source",
        "doc_id",
        F.row_number().over(w_len).cast("bigint").alias("rank_len"),
        F.row_number().over(w_voc).cast("bigint").alias("rank_vocab"),
    )
    fused = ranked.withColumn(
        "rrf_num",
        F.expr(
            f"{_RRF_SCALE} div ({_RRF_K} + rank_len) + "
            f"{_RRF_SCALE} div ({_RRF_K} + rank_vocab)"
        ),
    )
    w_fuse = Window.partitionBy("source").orderBy(F.desc("rrf_num"), F.asc("doc_id"))
    return (
        fused.withColumn(
            "fused_rank", F.row_number().over(w_fuse).cast("bigint")
        )
        .filter(F.col("fused_rank") <= _RRF_TOP)
        .orderBy("source", "fused_rank")
    )


_KANON_K = 5


def _kanon_assigned(docs: DataFrame) -> DataFrame:
    """Per-document k-anonymity ladder assignment — the shared kernel
    of pipeline_kanon_generalize (census view) and pipeline_kanon_apply
    (executed release): each doc gets the FINEST length-band
    generalization (100-char → 1000-char → banded-out '*') whose
    (lang, source, band) equivalence class reaches k=_KANON_K, else
    level 3 'suppressed'. All three ladder-level class sizes are
    window counts whose partition keys CONTAIN (lang, source) — one
    hashpartitioning exchange, three in-place sorts."""
    d = docs.select(
        "doc_id",
        "lang",
        "source",
        (F.expr("n_chars div 100") * 100).alias("b100"),
        (F.expr("n_chars div 1000") * 1000).alias("b1000"),
    )
    c2 = F.count(F.lit(1)).over(Window.partitionBy("lang", "source"))
    c1 = F.count(F.lit(1)).over(Window.partitionBy("lang", "source", "b1000"))
    c0 = F.count(F.lit(1)).over(Window.partitionBy("lang", "source", "b100"))
    sized = d.select(
        "doc_id", "lang", "source", "b100", "b1000",
        c2.alias("c2"), c1.alias("c1"), c0.alias("c0"),
    )
    k = _KANON_K
    level = (
        F.when(F.col("c0") >= k, 0)
        .when(F.col("c1") >= k, 1)
        .when(F.col("c2") >= k, 2)
        .otherwise(3)
    )
    band_label = (
        F.when(F.col("c0") >= k, F.concat(F.lit("c"), F.col("b100").cast("string")))
        .when(F.col("c1") >= k, F.concat(F.lit("c"), F.col("b1000").cast("string")))
        .when(F.col("c2") >= k, F.lit("*"))
        .otherwise(F.lit("suppressed"))
    )
    return sized.select(
        "doc_id",
        "lang",
        "source",
        level.cast("bigint").alias("level"),
        band_label.alias("band_label"),
    )


@query(
    "pipeline_kanon_generalize",
    oracle=f"""
    WITH d AS (
      SELECT doc_id, lang, source,
             (n_chars // 100) * 100 AS b100,
             (n_chars // 1000) * 1000 AS b1000
      FROM documents
    ),
    sized AS (
      SELECT doc_id, lang, source, b100, b1000,
             COUNT(*) OVER (PARTITION BY lang, source, b100) AS c0,
             COUNT(*) OVER (PARTITION BY lang, source, b1000) AS c1,
             COUNT(*) OVER (PARTITION BY lang, source) AS c2
      FROM d
    ),
    assigned AS (
      SELECT lang, source,
             CASE WHEN c0 >= {_KANON_K} THEN 0
                  WHEN c1 >= {_KANON_K} THEN 1
                  WHEN c2 >= {_KANON_K} THEN 2
                  ELSE 3 END AS level,
             CASE WHEN c0 >= {_KANON_K} THEN 'c' || b100
                  WHEN c1 >= {_KANON_K} THEN 'c' || b1000
                  WHEN c2 >= {_KANON_K} THEN '*'
                  ELSE 'suppressed' END AS band_label
      FROM sized
    )
    SELECT CAST(level AS BIGINT) AS level, lang, source, band_label,
           CAST(COUNT(*) AS BIGINT) AS n_docs
    FROM assigned
    GROUP BY level, lang, source, band_label
    ORDER BY level, lang, source, band_label
    """,
)
def pipeline_kanon_generalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity generalization ladder over the corpus's quasi-
    identifiers (lang, source, document-length band) — the governance
    gate a training-data release runs so no published equivalence
    class isolates fewer than k={_KANON_K} documents: each doc is
    assigned the FINEST band generalization (100-char band → 1000-char
    band → banded-out '*') whose class reaches k, and rows that stay
    under k even fully banded are marked suppressed. Output is the
    released-class census: every non-suppressed class size is ≥ k by
    construction.

    Scale shape: the three ladder-level class sizes are window counts
    whose partition keys all CONTAIN (lang, source) — evaluated
    coarsest-first, Catalyst plans ONE hashpartitioning(lang, source)
    exchange and re-sorts in place for the finer levels (the same
    partitioning-reuse discipline as pipeline_cdc_apply), then the
    census aggregate reuses it again. One scan, one exchange, no
    joins, no per-doc state beyond 3 counters."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "source", "n_chars"
    )
    return (
        _kanon_assigned(docs)
        .groupBy("level", "lang", "source", "band_label")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .orderBy("level", "lang", "source", "band_label")
    )


# ---------------------------------------------------------------------------
# pipeline_kanon_apply (round 13) — EXECUTED k-anonymity release,
# certified from disk (the gdpr_erasure discipline applied to the
# generalization ladder)
# ---------------------------------------------------------------------------

_KANON_CTES = f"""d AS (
      SELECT doc_id, lang, source,
             (n_chars // 100) * 100 AS b100,
             (n_chars // 1000) * 1000 AS b1000
      FROM documents
    ),
    sized AS (
      SELECT doc_id, lang, source, b100, b1000,
             COUNT(*) OVER (PARTITION BY lang, source, b100) AS c0,
             COUNT(*) OVER (PARTITION BY lang, source, b1000) AS c1,
             COUNT(*) OVER (PARTITION BY lang, source) AS c2
      FROM d
    ),
    assigned AS (
      SELECT lang, source,
             CASE WHEN c0 >= {_KANON_K} THEN 0
                  WHEN c1 >= {_KANON_K} THEN 1
                  WHEN c2 >= {_KANON_K} THEN 2
                  ELSE 3 END AS level,
             CASE WHEN c0 >= {_KANON_K} THEN 'c' || b100
                  WHEN c1 >= {_KANON_K} THEN 'c' || b1000
                  WHEN c2 >= {_KANON_K} THEN '*'
                  ELSE 'suppressed' END AS band_label
      FROM sized
    )"""

_KANON_APPLY_SQL = f"""
    WITH {_KANON_CTES},
    pubbed AS (
      SELECT lang, source, level, band_label,
             COUNT(*) OVER (PARTITION BY lang, source, level, band_label)
               AS pub_c
      FROM assigned
    ),
    final AS (
      SELECT lang, source,
             CASE WHEN level < 3 AND pub_c >= {_KANON_K}
                  THEN level ELSE 3 END AS level,
             CASE WHEN level < 3 AND pub_c >= {_KANON_K}
                  THEN band_label ELSE 'suppressed' END AS band_label
      FROM pubbed
    ),
    per_class AS (
      SELECT lang, source, level, band_label, COUNT(*) AS c
      FROM final WHERE level < 3
      GROUP BY 1, 2, 3, 4
    ),
    pc AS (
      SELECT lang, source,
             CAST(SUM(c) AS BIGINT) AS n_released,
             CAST(COUNT(*) AS BIGINT) AS n_classes,
             CAST(MIN(c) AS BIGINT) AS min_class_size
      FROM per_class GROUP BY 1, 2
    ),
    src AS (
      SELECT lang, source,
             CAST(COUNT(*) FILTER (WHERE level = 3) AS BIGINT) AS n_suppressed
      FROM final GROUP BY 1, 2
    )
    SELECT src.lang, src.source,
           COALESCE(pc.n_released, 0) AS n_released,
           src.n_suppressed,
           COALESCE(pc.n_classes, 0) AS n_classes,
           pc.min_class_size,
           (pc.min_class_size IS NULL OR pc.min_class_size >= {_KANON_K})
             AS k_ok
    FROM src LEFT JOIN pc USING (lang, source)
"""


def _kanon_workdir(sf_dir: str) -> str:
    import os

    from ..sources import source_fingerprint

    fp = source_fingerprint(os.path.join(sf_dir, "documents.parquet"))
    return os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
        ".scratch",
        "kanon",
        # _rs = residual-suppression release layout: the tag carries
        # every semantics knob that shapes the released bytes, so a
        # layout change can never silently reuse a stale release
        f"{fp}_k{_KANON_K}_rs",
    )


@query("pipeline_kanon_apply", oracle=_KANON_APPLY_SQL)
def pipeline_kanon_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXECUTED k-anonymity release — the round-12 verdict's #8,
    completing the governance family's executed half alongside
    pipeline_gdpr_erasure: the generalized quasi-identifier table
    (doc_id, lang, source, level, band_label — the _kanon_assigned
    ladder shared with pipeline_kanon_generalize's census view) is
    physically WRITTEN with every suppressed row withheld (staged
    write + atomic rename, content-addressed by the documents
    fingerprint + k), and the release manifest is then measured with
    the gdpr discipline: the released/class counts come FROM THE
    RELEASED TABLE ON DISK, the suppressed count from the source.

    The write applies the RESIDUAL-SUPPRESSION pass the census view
    doesn't need: the ladder guarantees each doc's chosen band's
    LADDER class reaches k, but docs escalated OUT of a fine band
    leave behind published classes smaller than their ladder count
    (e.g. 3 docs published at 'c1000' because their 100-char band was
    thin, while the other 6 docs of that kilochar band went out at
    level 0) — so rows whose PUBLISHED (lang, source, level,
    band_label) class stays under k are suppressed too (generalize-
    then-suppress, the standard global-recoding + record-suppression
    combination). One extra window count; published classes keep
    their full membership, so a single pass suffices.

    Manifest per (lang, source): n_released + n_suppressed partition
    the cell's documents exactly; n_classes/min_class_size audit the
    published equivalence classes ((lang, source, level, band_label)
    — the census grain); k_ok certifies min class size ≥ k for every
    published class (vacuously true for a fully-suppressed cell). The
    DuckDB oracle recomputes the whole ladder and the release census
    from the raw documents table, so a hash match certifies the
    physical table: exactly the sub-k rows were withheld, no released
    class isolates fewer than k documents, and no bystander row was
    lost.

    Scale shape: assignment is the generalize query's one
    (lang, source)-contained exchange; the release is one partitioned
    write; the audit is two partial-aggregated scans (disk + source).
    At 100 TB the release table partitions by (lang, source) so a
    class audit prunes to its own cell."""
    import os

    from .layout import _atomic_dir_write

    base = _kanon_workdir(sf_dir)
    released_path = os.path.join(base, "released")
    manifest_path = os.path.join(base, "manifest")
    cols = [
        "lang", "source", "n_released", "n_suppressed", "n_classes",
        "min_class_size", "k_ok",
    ]
    if os.path.isdir(manifest_path):
        return spark.read.parquet(manifest_path).select(*cols)

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "source", "n_chars"
    )
    k = _KANON_K
    pub_c = F.count(F.lit(1)).over(
        Window.partitionBy("lang", "source", "level", "band_label")
    )
    final = (
        _kanon_assigned(docs)
        .withColumn("pub_c", pub_c)
        .withColumn(
            "level",
            F.when(
                (F.col("level") < 3) & (F.col("pub_c") >= k), F.col("level")
            ).otherwise(F.lit(3).cast("bigint")),
        )
        .withColumn(
            "band_label",
            F.when(F.col("level") < 3, F.col("band_label")).otherwise(
                F.lit("suppressed")
            ),
        )
        .drop("pub_c")
    )
    if not os.path.isdir(released_path):
        rel = final.filter(F.col("level") < 3)
        _atomic_dir_write(lambda p: rel.write.parquet(p), released_path)

    per_class = (
        spark.read.parquet(released_path)
        .groupBy("lang", "source", "level", "band_label")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    pc = per_class.groupBy("lang", "source").agg(
        F.sum("c").cast("long").alias("n_released"),
        F.count(F.lit(1)).cast("long").alias("n_classes"),
        F.min("c").cast("long").alias("min_class_size"),
    )
    src = final.groupBy("lang", "source").agg(
        F.sum(F.when(F.col("level") == 3, 1).otherwise(0))
        .cast("long")
        .alias("n_suppressed")
    )
    result = src.join(pc, ["lang", "source"], "left").select(
        "lang",
        "source",
        F.coalesce("n_released", F.lit(0)).cast("long").alias("n_released"),
        "n_suppressed",
        F.coalesce("n_classes", F.lit(0)).cast("long").alias("n_classes"),
        "min_class_size",
        (
            F.col("min_class_size").isNull()
            | (F.col("min_class_size") >= _KANON_K)
        ).alias("k_ok"),
    )
    _atomic_dir_write(
        lambda p: result.coalesce(1).write.parquet(p), manifest_path
    )
    return spark.read.parquet(manifest_path).select(*cols)


# ---------------------------------------------------------------------------
# Dataset datasheet (round 9): the per-source corpus card a data-
# governance review reads — one row per source, integer-exact
# ---------------------------------------------------------------------------

_DATASHEET_SQL = """
    WITH base AS (
      SELECT source, lang, doc_id, sha256(text) AS sha,
             len(string_split(text, ' ')) AS n_toks
      FROM documents
    ),
    per_source AS (
      SELECT source,
             COUNT(*) AS n_docs,
             CAST(SUM(n_toks) AS BIGINT) AS n_tokens,
             COUNT(DISTINCT lang) AS n_langs,
             COUNT(*) - COUNT(DISTINCT sha) AS dup_docs
      FROM base GROUP BY source
    ),
    lang_rank AS (
      SELECT source, lang, COUNT(*) AS c,
             ROW_NUMBER() OVER (PARTITION BY source
                                ORDER BY COUNT(*) DESC, lang) AS rn
      FROM base GROUP BY source, lang
    )
    SELECT p.source,
           CAST(p.n_docs AS BIGINT) AS n_docs,
           p.n_tokens,
           CAST(p.n_langs AS BIGINT) AS n_langs,
           l.lang AS top_lang,
           CAST((l.c * 1000000) // p.n_docs AS BIGINT) AS top_lang_ppm,
           CAST(p.dup_docs AS BIGINT) AS dup_docs,
           CAST((p.dup_docs * 1000000) // p.n_docs AS BIGINT) AS dup_ppm,
           CAST(p.n_tokens // p.n_docs AS BIGINT) AS mean_tokens
    FROM per_source p
    JOIN lang_rank l ON l.source = p.source AND l.rn = 1
"""


@query("pipeline_dataset_datasheet", oracle=_DATASHEET_SQL)
def pipeline_dataset_datasheet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source dataset datasheet — the corpus card a governance /
    data-mixing review reads before training: document and token
    volume, language spread with the dominant language's exact ppm
    share, exact-duplicate mass (sha256 collisions within the source),
    and mean document length. Every ratio is integer ppm (the
    engine's float discipline), so the sheet replays bit-for-bit.

    This is the composition layer over the per-doc signal family
    (pipeline_corpus_stats, pipeline_lang_balance, dedup_exact): at
    100 TB the same two hash aggregates run per source partition and
    the datasheet is the table a mixture-weights job
    (pipeline_domain_mix, pipeline_mixture_temperature) consumes.

    Scale shape: one exchange for the per-source aggregate (count
    distinct sha/lang fold into the same grouping), one for the
    (source, lang) rank — both partial-aggregated map-side; output is
    sources-sized, not corpus-sized."""
    base = load_table(spark, sf_dir, "documents").select(
        "source",
        "lang",
        F.sha2(F.col("text"), 256).alias("sha"),
        F.size(F.split("text", " ")).alias("n_toks"),
    )
    per_source = base.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_toks").cast("long").alias("n_tokens"),
        F.countDistinct("lang").alias("n_langs"),
        (F.count(F.lit(1)) - F.countDistinct("sha")).alias("dup_docs"),
    )
    w = Window.partitionBy("source").orderBy(F.desc("c"), F.asc("lang"))
    top_lang = (
        base.groupBy("source", "lang")
        .agg(F.count(F.lit(1)).alias("c"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("source", F.col("lang").alias("top_lang"), "c")
    )
    return per_source.join(top_lang, "source").select(
        "source",
        F.col("n_docs").cast("long").alias("n_docs"),
        "n_tokens",
        F.col("n_langs").cast("long").alias("n_langs"),
        "top_lang",
        F.expr("(c * 1000000) div n_docs").cast("long").alias("top_lang_ppm"),
        F.col("dup_docs").cast("long").alias("dup_docs"),
        F.expr("(dup_docs * 1000000) div n_docs").cast("long").alias("dup_ppm"),
        F.expr("n_tokens div n_docs").cast("long").alias("mean_tokens"),
    )


def _neardup_apply_workdir(sf_dir: str) -> str:
    import os

    from ..sources import source_fingerprint

    fp = source_fingerprint(os.path.join(sf_dir, "documents.parquet"))
    return os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
        ".scratch",
        "neardup_apply",
        fp,
    )


@query(
    "pipeline_neardup_apply",
    oracle=f"""
    WITH clusters AS ({_PORTABLE_CLUSTERS_SQL}),
    assign AS (
      SELECT d.doc_id, d.lang, d.source,
             len(string_split(d.text, ' ')) AS n_tokens,
             COALESCE(c.cluster_id, d.doc_id) = d.doc_id AS keep
      FROM documents d LEFT JOIN clusters c USING (doc_id)
    )
    SELECT lang, source,
           CAST(COUNT(*) AS BIGINT) AS docs_before,
           CAST(SUM(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS docs_after,
           CAST(SUM(CASE WHEN NOT keep THEN 1 ELSE 0 END) AS BIGINT)
             AS docs_removed,
           CAST(COALESCE(SUM(CASE WHEN keep THEN doc_id END), 0) AS BIGINT)
             AS kept_id_sum,
           CAST(COALESCE(SUM(CASE WHEN keep THEN n_tokens END), 0) AS BIGINT)
             AS kept_token_sum
    FROM assign GROUP BY lang, source
    """,
)
def pipeline_neardup_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXECUTED near-duplicate dedup — the step every stage of the
    MinHash family builds toward, actually performed: the portable
    near-dup clusters (pipeline_canonical_docs' assignment) pick one
    canonical survivor per cluster, the surviving corpus is PHYSICALLY
    WRITTEN as a real parquet table (staged write + atomic rename,
    content-addressed by the documents fingerprint — the
    gdpr/compaction/merge executed-layout discipline), and the audit
    is measured FROM THE WRITTEN TABLE: per (lang, source), surviving
    doc counts, the exact sum of surviving doc_ids, and the surviving
    token mass are all re-read from disk, with before/removed counts
    from the source. The oracle replays LSH → recursive-CTE transitive
    closure → canonical pick → the same rollup from the raw documents
    view, so the hash certifies the physical cut end-to-end: exactly
    the non-canonical members of each near-dup cluster are gone, every
    bystander byte survived (token mass), and nothing was dropped or
    double-kept (id sum). Re-invocations reuse the frozen artifact.

    Scale shape: clusters are near-dup-mass-sized; the keep-filter is
    one id-only broadcast-able left join over the corpus scan; the
    rewrite is one partitioned pass and the audit two partial-
    aggregated scans. At 100 TB this is the dedup sweep's commit step
    — the same shape, with the cluster table persisted and the write
    partitioned by (lang, source)."""
    import os

    from ..operators.graph import connected_components
    from .layout import _atomic_dir_write

    base = _neardup_apply_workdir(sf_dir)
    kept_path = os.path.join(base, "kept")
    manifest_path = os.path.join(base, "manifest")
    cols = [
        "lang", "source", "docs_before", "docs_after", "docs_removed",
        "kept_id_sum", "kept_token_sum",
    ]
    if os.path.isdir(manifest_path):
        return spark.read.parquet(manifest_path).select(*cols)

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text", "lang", "source"
    )
    cc = connected_components(_portable_pairs(spark, sf_dir), "doc_a", "doc_b")
    if not os.path.isdir(kept_path):
        # no forced broadcast: cluster mass is data-dependent (the
        # near-dup fraction of the corpus), so the id-only cluster
        # table is left to AQE — tiny here, persisted + shuffle-joined
        # at 100 TB — rather than pinned to driver/executor memory
        keep = (
            docs.join(
                cc.select(F.col("node").alias("doc_id"), F.col("comp").alias("cid")),
                "doc_id",
                "left",
            )
            .filter(F.coalesce(F.col("cid"), F.col("doc_id")) == F.col("doc_id"))
            .select("doc_id", "text", "lang", "source")
        )
        _atomic_dir_write(lambda p: keep.write.parquet(p), kept_path)

    before = docs.groupBy("lang", "source").agg(
        F.count(F.lit(1)).cast("long").alias("docs_before")
    )
    after = (
        spark.read.parquet(kept_path)
        .groupBy("lang", "source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("docs_after"),
            F.sum("doc_id").cast("long").alias("kept_id_sum"),
            F.sum(F.size(F.split("text", " "))).cast("long").alias("kept_token_sum"),
        )
    )
    result = before.join(after, ["lang", "source"], "left").select(
        "lang",
        "source",
        "docs_before",
        F.coalesce("docs_after", F.lit(0)).cast("long").alias("docs_after"),
        (F.col("docs_before") - F.coalesce("docs_after", F.lit(0)))
        .cast("long")
        .alias("docs_removed"),
        F.coalesce("kept_id_sum", F.lit(0)).cast("long").alias("kept_id_sum"),
        F.coalesce("kept_token_sum", F.lit(0)).cast("long").alias("kept_token_sum"),
    )
    _atomic_dir_write(lambda p: result.coalesce(1).write.parquet(p), manifest_path)
    return spark.read.parquet(manifest_path).select(*cols)


# ---------------------------------------------------------------------------
# pipeline_dp_counts (round 11) — discrete-Laplace (two-sided geometric)
# noisy counts: the differential-privacy release mechanism, with the
# noise sampled by exact integer arithmetic so both engines replay it
# ---------------------------------------------------------------------------


def _lz24_sql(v: str) -> str:
    """CASE ladder: number of leading zero BITS of a 24-bit value —
    the exact-integer geometric sampler (P(k) = 2^-(k+1) for a uniform
    24-bit input), with no float log2 whose boundary rounding the two
    engines could disagree on."""
    branches = " ".join(
        f"WHEN ({v}) >= {1 << (23 - k)} THEN {k}" for k in range(24)
    )
    return f"CASE {branches} ELSE 24 END"


def _hex24_duck(col: str, start: int) -> str:
    """DuckDB: value of 6 hex chars (24 bits) by alphabet position."""
    return " + ".join(
        f"(strpos('0123456789abcdef', substring({col}, {start + i}, 1)) - 1)"
        f" * {16 ** (5 - i)}"
        for i in range(6)
    )


_DP_SQL = f"""
    WITH g AS (
      SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_true,
             md5(event_type || '#dp') AS h
      FROM events GROUP BY event_type
    ), u AS (
      SELECT event_type, n_true,
             ({_hex24_duck('h', 1)}) AS v1,
             ({_hex24_duck('h', 7)}) AS v2
      FROM g
    ), noise AS (
      SELECT event_type, n_true,
             CAST(({_lz24_sql('v1')}) - ({_lz24_sql('v2')}) AS BIGINT) AS noise
      FROM u
    )
    SELECT event_type, n_true, noise,
           CAST(n_true + noise AS BIGINT) AS n_noisy,
           CAST(693147 AS BIGINT) AS epsilon_ppm_nominal
    FROM noise
"""


@query("pipeline_dp_counts", oracle=_DP_SQL)
def pipeline_dp_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Differentially-private count release — the mechanism layer the
    governance family (pipeline_kanon_generalize, pipeline_gdpr_erasure)
    was missing: each per-event-type count is released with DISCRETE
    LAPLACE noise, sampled as the difference of two Geometric(1/2)
    draws (Y₁ − Y₂ with P(Y=k) = 2^-(k+1) is exactly the two-sided
    geometric / discrete Laplace with α = 1/2, i.e. ε = ln 2 per unit
    sensitivity — Ghosh, Roughgarden & Sundararajan's universally
    utility-maximizing mechanism for counts).

    Exact-integer sampling: each geometric draw is the leading-zero-bit
    count of a 24-bit uniform (a CASE ladder — no float log2), the two
    uniforms are the halves of one md5; every step replays bit-for-bit
    in DuckDB. The md5-seeded randomness makes the mechanism
    DETERMINISTIC per release key — which is what makes it certifiable
    here, and is itself a real pattern (seeded-noise reproducible DP
    releases); a production deployment swaps the seed for a secure
    RNG and the certification surface (n_true, noise) obviously stays
    internal — this query's output is the audit view, not the public
    release. The budget column is named epsilon_ppm_NOMINAL for that
    reason: ln 2 per unit sensitivity is what the mechanism guarantees
    under a secure-RNG deployment, not what this deterministic,
    n_true-bearing audit table itself provides.

    Scale shape: one partial→final count aggregate; the noise is O(1)
    arithmetic on the 5 released rows."""
    ev = load_table(spark, sf_dir, "events").select("event_type")
    g = ev.groupBy("event_type").agg(F.count(F.lit(1)).cast("long").alias("n_true"))
    h = F.md5(F.concat(F.col("event_type"), F.lit("#dp")))
    u = g.select(
        "event_type",
        "n_true",
        F.conv(F.substring(h, 1, 6), 16, 10).cast("long").alias("v1"),
        F.conv(F.substring(h, 7, 6), 16, 10).cast("long").alias("v2"),
    )
    noise = F.expr(f"CAST(({_lz24_sql('v1')}) - ({_lz24_sql('v2')}) AS BIGINT)")
    return u.select(
        "event_type",
        "n_true",
        noise.alias("noise"),
        (F.col("n_true") + noise).cast("long").alias("n_noisy"),
        F.lit(693147).cast("long").alias("epsilon_ppm_nominal"),
    )


# ---------------------------------------------------------------------------
# dedup_incremental_neardup (round 12) — near-dup dedup of a NEW batch
# against a PERSISTED signature index: the production shape of the
# whole dedup family (registered family="dedup"; lives here because it
# composes the portable-MinHash kernel + _SIG_SQL above)
# ---------------------------------------------------------------------------

# Deterministic corpus/batch split: first hex char of md5(doc_id#incr)
# in '0123' → ~25% of documents play the NEW-ARRIVALS batch; the rest
# are the already-indexed corpus. Hex-alphabet POSITION (locate/strpos)
# keeps the split engine-portable — never parse hex to int.
_INCR_BATCH_POS = 4

_INCR_SPLIT_SPARK = (
    "locate(substring(md5(concat(cast(doc_id as string), '#incr')), 1, 1),"
    f" '0123456789abcdef') <= {_INCR_BATCH_POS}"
)
_INCR_SPLIT_DUCK = (
    "strpos('0123456789abcdef',"
    " substring(md5(CAST(doc_id AS VARCHAR) || '#incr'), 1, 1))"
    f" <= {_INCR_BATCH_POS}"
)

_NEARDUP_INDEX_BUILDS = 0  # tests assert index reuse skips the build


def _neardup_index_path(sf_dir: str) -> str:
    """Persisted corpus-signature index location, keyed by the
    documents source fingerprint + every parameter that shapes the
    signatures (the _ivf_centroids keying discipline: a regenerated
    fixture or retuned sketch can never silently reuse a stale
    index)."""
    import os

    from ..sources import source_fingerprint

    fp = source_fingerprint(os.path.join(sf_dir, "documents.parquet"))
    return os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
        ".scratch",
        "neardup_index",
        f"sig_{fp}_l{_PORTABLE_LANES}_b{_INCR_BATCH_POS}",
    )


def _neardup_v2_path(sf_dir: str) -> str:
    """Canonical v2 path of the near-dup signature line, keyed by the
    family's arrival-batch definition (the md5 split position) on top
    of the v1 key — the similarity._append_v2_path discipline (r16
    verdict task): retuning _INCR_BATCH_POS must REBUILD v2 under a
    new key, never reuse one built for a different batch, and every
    consumer (the appender, pipeline_index_vacuum, tests) derives the
    path from THIS helper so the line's addressing can never fork.
    The v1 tag also folds the split (it shapes the corpus side too);
    v2's key re-states it because a v2's batch definition must be
    self-sufficient, not an accident of what the corpus key happens
    to carry."""
    return f"{_neardup_index_path(sf_dir)}_v2-p{_INCR_BATCH_POS}"


def _corpus_signature_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Read-or-build the CORPUS side's signature/band table: built once
    per corpus version (write-temp + atomic rename, the ensure_bucketed
    recipe), then every later batch reads (doc_id, m0..m3) straight
    from parquet — the corpus text is never re-tokenized, re-hashed or
    even re-scanned. At 100 TB this is the difference between an
    O(batch) nightly dedup and an O(corpus) one."""
    global _NEARDUP_INDEX_BUILDS
    import os

    from .layout import _atomic_dir_write

    path = _neardup_index_path(sf_dir)
    if not os.path.isdir(path):
        corpus = (
            load_table(spark, sf_dir, "documents")
            .select("doc_id", "text")
            .filter(~F.expr(_INCR_SPLIT_SPARK))
            .repartition(spark.sparkContext.defaultParallelism, "doc_id")
        )
        sig = _signature_of(corpus)
        _atomic_dir_write(lambda p: sig.write.parquet(p), path)
        _NEARDUP_INDEX_BUILDS += 1
    return spark.read.parquet(path)


# The shared index-build/probe CTE chain (sig → split → bsig/csig →
# cm/bm), composed verbatim by the probe oracle below and the
# index-append oracle — ONE definition of the incremental semantics.
_INCR_CTES = f"""sig AS ({_SIG_SQL}),
    split AS (
      SELECT doc_id, {_INCR_SPLIT_DUCK} AS is_batch FROM documents
    ),
    bsig AS (
      SELECT sig.* FROM sig JOIN split USING (doc_id) WHERE split.is_batch
    ),
    csig AS (
      SELECT sig.* FROM sig JOIN split USING (doc_id) WHERE NOT split.is_batch
    ),
    cm AS (
      SELECT b.doc_id, MIN(c.doc_id) AS dup_of_corpus
      FROM bsig b JOIN csig c
        ON b.m0 = c.m0 AND b.m1 = c.m1 AND b.m2 = c.m2 AND b.m3 = c.m3
      GROUP BY b.doc_id
    ),
    bm AS (
      SELECT m0, m1, m2, m3, MIN(doc_id) AS first_in_batch
      FROM bsig GROUP BY m0, m1, m2, m3
    )"""

_INCR_NEARDUP_SQL = f"""
    WITH {_INCR_CTES}
    SELECT sp.doc_id,
           cm.dup_of_corpus,
           CASE WHEN cm.dup_of_corpus IS NULL
                     AND bm.first_in_batch < sp.doc_id
                THEN bm.first_in_batch END AS dup_of_batch,
           (cm.dup_of_corpus IS NULL
            AND (bm.first_in_batch IS NULL OR bm.first_in_batch = sp.doc_id))
             AS keep
    FROM split sp
    LEFT JOIN bsig b ON b.doc_id = sp.doc_id
    LEFT JOIN cm ON cm.doc_id = sp.doc_id
    LEFT JOIN bm ON bm.m0 = b.m0 AND bm.m1 = b.m1
                AND bm.m2 = b.m2 AND bm.m3 = b.m3
    WHERE sp.is_batch
"""


def _incr_probe_frames(spark: SparkSession, sf_dir: str):
    """The probe side shared by dedup_incremental_neardup (verdict
    table) and dedup_neardup_index_append (v2 install): (batch_docs,
    bsig, cm, bm, lanes) — bsig lazily localCheckpointed because it
    feeds THREE plan branches (corpus match, batch-first aggregate,
    final assembly join); without the cut the batch signing kernel
    re-executes once per branch (measured 16 s → ~1.6 s at sf1)."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    batch_docs = docs.filter(F.expr(_INCR_SPLIT_SPARK))
    csig = _corpus_signature_index(spark, sf_dir).select(
        F.col("doc_id").alias("c_id"),
        *[F.col(f"m{i}") for i in range(_PORTABLE_LANES)],
    )
    bsig = _signature_of(
        batch_docs.repartition(spark.sparkContext.defaultParallelism, "doc_id")
    ).localCheckpoint(eager=False)
    lanes = [f"m{i}" for i in range(_PORTABLE_LANES)]
    cm = (
        bsig.join(csig, lanes)
        .groupBy("doc_id")
        .agg(F.min("c_id").alias("dup_of_corpus"))
    )
    bm = bsig.groupBy(*lanes).agg(F.min("doc_id").alias("first_in_batch"))
    return batch_docs, bsig, cm, bm, lanes


@query("dedup_incremental_neardup", family="dedup", oracle=_INCR_NEARDUP_SQL)
def dedup_incremental_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental NEAR-dup dedup — the round-11 verdict's #1 missing
    production piece: every real corpus build dedups a NEW batch of
    arrivals against the EXISTING corpus without re-signing it. The
    corpus's portable-MinHash signature/band table is persisted once
    per corpus version (fingerprint-keyed parquet, atomic-rename
    install — the sim_cosine_ivf_reuse pattern applied to dedup); each
    incoming batch signs only ITSELF (O(batch) work) and probes the
    index with a 4-lane signature equijoin. Grounding: this is the
    reference's R11 checksum-dedup + O4 idempotent-replay semantics
    (ingestion.py:58-75, weather_task.py:86-89) lifted from exact
    checksums to near-dup signatures.

    Verdict per batch doc: dup_of_corpus = smallest corpus doc sharing
    the full signature (drop — content already in the corpus);
    dup_of_batch = smallest EARLIER batch doc sharing it when no
    corpus match exists (first-wins inside the batch, the O4
    discipline); keep = neither. Documents too short to sign (< 2
    tokens) keep by construction. The DuckDB oracle replays BOTH the
    index build and the probe from the raw documents table, so the
    hash certifies the persisted index bit-for-bit against
    recomputation; tests/test_operators.py proves the reuse (second
    call builds nothing) via the _NEARDUP_INDEX_BUILDS counter.

    Scale shape: index probe is an equijoin on 4×32-hex keys — ids
    and signatures shuffle, never text; batch-side signing is the
    map-side kernel; the keep verdict is two batch-sized aggregates.
    The index APPEND — installing the kept batch docs' signatures as
    the next corpus version — is the registered
    dedup_neardup_index_append query below, the same O(batch)
    bound."""
    batch_docs, bsig, cm, bm, lanes = _incr_probe_frames(spark, sf_dir)
    return (
        batch_docs.select("doc_id")
        .join(bsig, "doc_id", "left")
        .join(cm, "doc_id", "left")
        .join(bm, lanes, "left")
        .select(
            "doc_id",
            F.col("dup_of_corpus").cast("long").alias("dup_of_corpus"),
            F.when(
                F.col("dup_of_corpus").isNull()
                & (F.col("first_in_batch") < F.col("doc_id")),
                F.col("first_in_batch"),
            ).cast("long").alias("dup_of_batch"),
            (
                F.col("dup_of_corpus").isNull()
                & (
                    F.col("first_in_batch").isNull()
                    | (F.col("first_in_batch") == F.col("doc_id"))
                )
            ).alias("keep"),
        )
    )


_INCR_APPEND_SQL = f"""
    WITH {_INCR_CTES},
    keepers AS (
      SELECT b.doc_id, b.m0, b.m1, b.m2, b.m3
      FROM bsig b
      LEFT JOIN cm ON cm.doc_id = b.doc_id
      LEFT JOIN bm ON bm.m0 = b.m0 AND bm.m1 = b.m1
                  AND bm.m2 = b.m2 AND bm.m3 = b.m3
      WHERE cm.dup_of_corpus IS NULL AND bm.first_in_batch = b.doc_id
    ),
    versions AS (
      SELECT 1 AS version, doc_id, m0, m1, m2, m3 FROM csig
      UNION ALL
      SELECT 2 AS version, doc_id, m0, m1, m2, m3 FROM csig
      UNION ALL
      SELECT 2 AS version, doc_id, m0, m1, m2, m3 FROM keepers
    )
    SELECT CAST(version AS BIGINT) AS version,
           CAST(COUNT(*) AS BIGINT) AS n_entries,
           CAST(SUM(doc_id) AS BIGINT) AS id_sum,
           CAST(COUNT(DISTINCT (m0, m1, m2, m3)) AS BIGINT) AS n_signatures
    FROM versions
    GROUP BY 1
"""


@query("dedup_neardup_index_append", family="dedup", oracle=_INCR_APPEND_SQL)
def dedup_neardup_index_append(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The COMMIT half of incremental near-dup dedup: after the batch
    verdict (dedup_incremental_neardup), the KEPT batch documents'
    signatures are physically installed as the NEXT index version —
    v2 = v1 ∪ signatures of kept batch docs — via the same staged
    write + atomic rename, content-addressed by the corpus
    fingerprint, so the nightly loop (sign batch → probe v_n → cut →
    append → v_n+1) closes without EVER re-signing the corpus. Only
    KEPT docs enter the index (a dropped dup's signature is already
    present via its canonical, and indexing it would bloat v2 with
    redundant rows); unsigned docs (< 2 tokens) keep but index
    nothing — they have no probe surface.

    The audit is measured FROM BOTH ON-DISK versions (entry count,
    id sum, distinct-signature count per version — the
    merge_timetravel discipline), and the oracle recomputes v1 AND v2
    from the raw documents table through the same shared CTE chain as
    the probe oracle, so the hash certifies the physical append:
    exactly the kept signatures were added, nothing was dropped or
    duplicated, and v1 was not disturbed.

    Scale shape: the append is one O(batch)-sized parquet write; the
    audit is two partial-aggregated index scans. At 100 TB versions
    live in a catalog manifest and the append is a metadata commit of
    batch-sized files — same bound."""
    import os

    from .layout import _atomic_dir_write

    v1_path = _neardup_index_path(sf_dir)
    v2_path = _neardup_v2_path(sf_dir)
    # read-or-build v1 UNCONDITIONALLY (no-op read when present): a
    # partially cleaned scratch dir (v1 gone, v2 surviving) must
    # self-heal instead of failing the audit's v1 scan
    v1 = _corpus_signature_index(spark, sf_dir)
    if not os.path.isdir(v2_path):
        _, bsig, cm, bm, lanes = _incr_probe_frames(spark, sf_dir)
        keepers = (
            bsig.join(cm, "doc_id", "left")
            .join(bm, lanes, "left")
            .filter(
                F.col("dup_of_corpus").isNull()
                & (F.col("first_in_batch") == F.col("doc_id"))
            )
            .select("doc_id", *lanes)
        )
        v2 = v1.select("doc_id", *lanes).unionByName(keepers)
        _atomic_dir_write(lambda p: v2.write.parquet(p), v2_path)

    def audit(version: int, path: str) -> DataFrame:
        idx = spark.read.parquet(path)
        return idx.agg(
            F.lit(version).cast("long").alias("version"),
            F.count(F.lit(1)).cast("long").alias("n_entries"),
            F.sum("doc_id").cast("long").alias("id_sum"),
            F.count_distinct(*[F.col(f"m{i}") for i in range(_PORTABLE_LANES)])
            .cast("long")
            .alias("n_signatures"),
        ).select("version", "n_entries", "id_sum", "n_signatures")

    return audit(1, v1_path).unionByName(audit(2, v2_path))


# ---------------------------------------------------------------------------
# pipeline_corpus_delta (round 13) — the EXECUTED nightly delta publish:
# incremental near-dup verdict × quality gate × physical delta table,
# the whole loop's end product certified from disk
# ---------------------------------------------------------------------------

_DELTA_SQL = f"""
    WITH {_INCR_CTES},
    verd AS (
      SELECT sp.doc_id,
             cm.dup_of_corpus IS NOT NULL AS dup_c,
             (cm.dup_of_corpus IS NULL AND bm.first_in_batch IS NOT NULL
              AND bm.first_in_batch < sp.doc_id) AS dup_b,
             (cm.dup_of_corpus IS NULL
              AND (bm.first_in_batch IS NULL
                   OR bm.first_in_batch = sp.doc_id)) AS keep
      FROM split sp
      LEFT JOIN bsig b ON b.doc_id = sp.doc_id
      LEFT JOIN cm ON cm.doc_id = sp.doc_id
      LEFT JOIN bm ON bm.m0 = b.m0 AND bm.m1 = b.m1
                  AND bm.m2 = b.m2 AND bm.m3 = b.m3
      WHERE sp.is_batch
    ),
    fullv AS (
      SELECT v.dup_c, v.dup_b, v.keep, d.lang, d.source,
             len(d.text) BETWEEN 150 AND 500 AS quality,
             len(string_split(d.text, ' ')) AS n_toks
      FROM verd v JOIN documents d ON d.doc_id = v.doc_id
    )
    SELECT lang, source,
           CAST(COUNT(*) AS BIGINT) AS n_batch,
           CAST(COUNT(*) FILTER (WHERE dup_c) AS BIGINT) AS n_dup_corpus,
           CAST(COUNT(*) FILTER (WHERE dup_b) AS BIGINT) AS n_dup_batch,
           CAST(COUNT(*) FILTER (WHERE keep AND NOT quality) AS BIGINT)
             AS n_quality_fail,
           CAST(COUNT(*) FILTER (WHERE keep AND quality) AS BIGINT)
             AS n_admitted,
           CAST(COALESCE(SUM(CASE WHEN keep AND quality THEN n_toks END), 0)
                AS BIGINT) AS tok_sum
    FROM fullv GROUP BY 1, 2
"""


def _corpus_delta_workdir(sf_dir: str) -> str:
    import os

    from ..sources import source_fingerprint

    fp = source_fingerprint(os.path.join(sf_dir, "documents.parquet"))
    return os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
        ".scratch",
        "corpus_delta",
        fp,
    )


@query("pipeline_corpus_delta", oracle=_DELTA_SQL)
def pipeline_corpus_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The EXECUTED nightly delta publish — the incremental loop's end
    product, composing three certified pieces the way a production
    corpus build chains them: the new batch is verdicted against the
    PERSISTED signature index (dedup_incremental_neardup's probe —
    O(batch), the corpus is never re-signed), survivors pass the
    corpus_build quality gate (150-500 chars), and the admitted docs
    are physically WRITTEN as the corpus DELTA table (doc_id, lang,
    source, n_toks; staged write + atomic rename, content-addressed by
    the documents fingerprint). Grounding: the reference's weekly
    append (R8/O4, weather_task.py:99-104) upgraded to a dedup-gated,
    quality-gated, replay-idempotent delta.

    The attrition manifest per (lang, source) carries the whole
    funnel: n_batch = n_dup_corpus + n_dup_batch + n_quality_fail +
    n_admitted (suppressed nothing, counted everything), with
    n_admitted and tok_sum measured FROM THE DELTA TABLE ON DISK (the
    gdpr/merge discipline) and the dup/quality legs from the live
    verdict. The DuckDB oracle replays index build + probe + gate +
    token count from the raw documents table, so a hash match
    certifies the physical delta end-to-end: exactly the kept,
    quality-passing docs were published, none double-published, none
    lost. Byte-identical replay is pinned by tests/test_operators.py.

    Scale shape: probe is the signature equijoin (ids + 4×32-hex keys
    shuffle, never text); the gate and token count are map-side over
    the batch only; the delta write is one O(batch) partitioned pass;
    the audit is two partial-aggregated scans. At 100 TB the delta is
    the unit of catalog commit — exactly the reference's weekly
    increment, now safe to replay."""
    import os

    from .layout import _atomic_dir_write

    base = _corpus_delta_workdir(sf_dir)
    delta_path = os.path.join(base, "delta")
    manifest_path = os.path.join(base, "manifest")
    cols = [
        "lang", "source", "n_batch", "n_dup_corpus", "n_dup_batch",
        "n_quality_fail", "n_admitted", "tok_sum",
    ]
    if os.path.isdir(manifest_path):
        return spark.read.parquet(manifest_path).select(*cols)

    batch_docs, bsig, cm, bm, lanes = _incr_probe_frames(spark, sf_dir)
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "source", "text"
    )
    verdict = (
        batch_docs.select("doc_id")
        .join(bsig, "doc_id", "left")
        .join(cm, "doc_id", "left")
        .join(bm, lanes, "left")
        .select(
            "doc_id",
            F.col("dup_of_corpus").isNotNull().alias("dup_c"),
            (
                F.col("dup_of_corpus").isNull()
                & F.col("first_in_batch").isNotNull()
                & (F.col("first_in_batch") < F.col("doc_id"))
            ).alias("dup_b"),
            (
                F.col("dup_of_corpus").isNull()
                & (
                    F.col("first_in_batch").isNull()
                    | (F.col("first_in_batch") == F.col("doc_id"))
                )
            ).alias("keep"),
        )
    )
    quality = F.length("text").between(150, 500)
    full = verdict.join(docs, "doc_id").select(
        "doc_id", "lang", "source", "dup_c", "dup_b", "keep",
        quality.alias("quality"),
        F.size(F.split("text", " ")).cast("long").alias("n_toks"),
    )
    if not os.path.isdir(delta_path):
        admitted = full.filter(F.col("keep") & F.col("quality")).select(
            "doc_id", "lang", "source", "n_toks"
        )
        _atomic_dir_write(lambda p: admitted.write.parquet(p), delta_path)

    live = full.groupBy("lang", "source").agg(
        F.count(F.lit(1)).cast("long").alias("n_batch"),
        F.sum(F.when(F.col("dup_c"), 1).otherwise(0))
        .cast("long")
        .alias("n_dup_corpus"),
        F.sum(F.when(F.col("dup_b"), 1).otherwise(0))
        .cast("long")
        .alias("n_dup_batch"),
        F.sum(F.when(F.col("keep") & ~F.col("quality"), 1).otherwise(0))
        .cast("long")
        .alias("n_quality_fail"),
    )
    disk = (
        spark.read.parquet(delta_path)
        .groupBy("lang", "source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_admitted"),
            F.sum("n_toks").cast("long").alias("tok_sum"),
        )
    )
    result = live.join(disk, ["lang", "source"], "left").select(
        "lang", "source", "n_batch", "n_dup_corpus", "n_dup_batch",
        "n_quality_fail",
        F.coalesce("n_admitted", F.lit(0)).cast("long").alias("n_admitted"),
        F.coalesce("tok_sum", F.lit(0)).cast("long").alias("tok_sum"),
    )
    _atomic_dir_write(
        lambda p: result.coalesce(1).write.parquet(p), manifest_path
    )
    return spark.read.parquet(manifest_path).select(*cols)


# ---------------------------------------------------------------------------
# stream_corpus_delta (round 14) — the LIVE nightly loop: the executed
# delta publish (pipeline_corpus_delta) run as a real streaming query
# through the custom Python streaming source AND sink
# ---------------------------------------------------------------------------

_STREAM_DELTA_SQL = f"""
    WITH {_INCR_CTES},
    keepers AS (
      SELECT sp.doc_id
      FROM split sp
      LEFT JOIN bsig b ON b.doc_id = sp.doc_id
      LEFT JOIN cm ON cm.doc_id = sp.doc_id
      LEFT JOIN bm ON bm.m0 = b.m0 AND bm.m1 = b.m1
                  AND bm.m2 = b.m2 AND bm.m3 = b.m3
      WHERE sp.is_batch
        AND cm.dup_of_corpus IS NULL
        AND (bm.first_in_batch IS NULL OR bm.first_in_batch = sp.doc_id)
    )
    SELECT d.lang, d.source,
           CAST(COUNT(*) AS BIGINT) AS n_admitted,
           CAST(SUM(len(string_split(d.text, ' '))) AS BIGINT) AS tok_sum
    FROM keepers k JOIN documents d ON d.doc_id = k.doc_id
    WHERE len(d.text) BETWEEN 150 AND 500
    GROUP BY 1, 2
"""

_STREAM_DELTA_EPOCHS = 4
# keyed-state bucket count for the cross-epoch first-wins kernel (the
# stream_dedup_stateful DEDUP_BUCKETS discipline: per-signature groups
# pay one Arrow round-trip per distinct doc — bucketing amortizes it)
_STREAM_DELTA_BUCKETS = 64
_STREAM_DELTA_LEDGER_SCHEMA = (
    "doc_id bigint, lang string, source string, n_toks bigint"
)


def _stream_delta_workdir(sf_dir: str) -> str:
    import os

    from ..sources import source_fingerprint

    fp = source_fingerprint(os.path.join(sf_dir, "documents.parquet"))
    return os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
        ".scratch",
        "stream_corpus_delta",
        f"{fp}_e{_STREAM_DELTA_EPOCHS}",
    )


@query("stream_corpus_delta", oracle=_STREAM_DELTA_SQL)
def stream_corpus_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The LIVE nightly corpus-delta loop (round-13 verdict task #4):
    pipeline_corpus_delta's batch composition run as ONE CONTINUOUS
    STREAMING QUERY through the engine's own extension seams — the
    partition-parallel docsfeed Python source walks the documents
    table in monotone doc_id-window micro-batches (executor-side
    pyarrow range scans, sources/pydatasource.py), each epoch is
    signed map-side (the portable-MinHash lanes — pure array
    expressions, no shuffle), probed against the PERSISTED corpus
    signature index as a stream-static LEFT ANTI join (stateless, the
    index is never re-signed), deduped across epochs by a CUSTOM
    STATEFUL first-wins operator over {_STREAM_DELTA_BUCKETS}-way
    signature hash buckets (applyInPandasWithState; each bucket's
    state is its seen-signature list — the stream_dedup_stateful
    bucketing discipline, since per-signature groups would pay one
    Arrow round-trip per distinct doc; unsigned docs carry per-doc
    fallback sigs so they pass through undeduped), quality-gated
    map-side, and published through the ledgersink streaming SINK
    with one atomic manifest per epoch (sources/pysink.py).

    Monotone epochs make stream-order first-wins ≡ global min-doc_id
    first-wins, so the union of epoch manifests equals the batch
    twin's admitted set EXACTLY — the DuckDB oracle is the batch
    twin's attrition funnel restricted to its admitted leg, replayed
    from raw documents with exact all-pairs semantics. A hash match
    therefore certifies the whole live loop end-to-end: every
    admitted doc published exactly once across epochs, no dup
    (corpus or cross-epoch) published, no quality-fail leaked.
    Epoch-replay idempotence on this ledger is pinned by
    tests/test_formats_sink.py; the completion guard is terminal-state
    (marker written only after processAllAvailable returns — a crashed
    partial run is invalidated WITH its checkpoint as one unit and
    rerun, the r13-ADVICE discipline).

    Scale shape: the corpus side is a parquet index scan (built once
    per corpus version); per epoch, signing is map-side over the
    epoch only, the anti-join broadcasts nothing row-shaped through
    the driver, and keyed state is ∝ distinct batch signatures (a
    production deployment adds an event-time horizon exactly like
    stream_dedup_stateful's 365-day sweep). The sink write is
    partition-parallel with O(tasks) manifest commits. Grounding:
    reference R8/O4 weekly append (weather_task.py:99-104) as a
    continuous, replay-safe stream."""
    import os
    import shutil

    from pyspark.sql.streaming.state import GroupStateTimeout

    from ..sources.pydatasource import register_synthetic_source
    from ..sources.pysink import read_ledger, register_ledger_sink
    from ..streaming import stream_state_partitions

    base = _stream_delta_workdir(sf_dir)
    ledger = os.path.join(base, "ledger")
    marker = os.path.join(base, "_COMPLETE")
    if not os.path.exists(marker):
        shutil.rmtree(base, ignore_errors=True)
        os.makedirs(ledger, exist_ok=True)
        register_synthetic_source(spark)
        register_ledger_sink(spark)

        # static side first: read-or-build the persisted corpus index
        csig = _corpus_signature_index(spark, sf_dir).select(
            *[F.col(f"m{i}") for i in range(_PORTABLE_LANES)]
        )

        feed = (
            spark.readStream.format("docsfeed")
            .option("path", os.path.join(sf_dir, "documents.parquet"))
            .option("epochs", _STREAM_DELTA_EPOCHS)
            .option("partitions", 4)
            .load()
        )
        toked = (
            feed.filter(F.expr(_INCR_SPLIT_SPARK))
            .select(
                "doc_id",
                "lang",
                "source",
                F.length("text").between(150, 500).alias("quality"),
                F.split("text", " ").alias("toks"),
            )
            .withColumn(
                "n_toks", F.size("toks").cast("long")
            )
            .withColumn(
                "gs",
                F.when(
                    F.size("toks") >= 2,
                    F.array_distinct(token_ngrams("toks", 2)),
                ),
            )
        )

        def lane(i: int):
            # factory closure — the _signature_of lane pitfall applies
            return F.array_min(
                F.transform("gs", lambda s: F.md5(F.concat(s, F.lit(f"#{i}"))))
            ).alias(f"m{i}")

        signed = toked.select(
            "doc_id", "lang", "source", "n_toks", "quality",
            *[lane(i) for i in range(_PORTABLE_LANES)],
        )
        # unsigned docs (< 2 tokens) have NULL lanes: the anti join
        # passes them (NULL never equals) and the per-doc fallback sig
        # lets them through the dedup kernel untouched. Keyed-state
        # granularity is a {_STREAM_DELTA_BUCKETS}-way HASH BUCKET of
        # signatures, not one signature — the stream_dedup_stateful
        # round-12 lesson (per-key Arrow groups pay one pandas
        # round-trip per group; one group per distinct doc signature
        # made the first cut of this kernel the probe's worst sf1 row).
        # Each bucket's state is its seen-signature list.
        raw_key = F.concat(F.lit("raw#"), F.col("doc_id").cast("string"))
        sig = F.md5(
            F.concat_ws(
                "|",
                *[
                    F.coalesce(F.col(f"m{i}"), raw_key)
                    for i in range(_PORTABLE_LANES)
                ],
            )
        )
        keyed = signed.join(
            csig, [f"m{i}" for i in range(_PORTABLE_LANES)], "left_anti"
        ).select(
            "doc_id", "lang", "source", "n_toks", "quality",
            sig.alias("sig"),
            F.pmod(F.xxhash64(sig), F.lit(_STREAM_DELTA_BUCKETS))
            .cast("int")
            .alias("bucket"),
        )

        out_schema = (
            "doc_id long, lang string, source string, "
            "n_toks long, quality boolean"
        )

        def first_wins(key, pdf_iter, state):
            import pandas as pd

            seen = set(state.get[0]) if state.exists else set()
            parts = [pdf for pdf in pdf_iter if len(pdf)]
            if not parts:
                return iter(())
            batch = pd.concat(parts).sort_values("doc_id", kind="stable")
            out = []
            for row in batch.itertuples(index=False):
                if row.sig in seen:
                    continue
                seen.add(row.sig)
                out.append(
                    {
                        "doc_id": int(row.doc_id),
                        "lang": row.lang,
                        "source": row.source,
                        "n_toks": int(row.n_toks),
                        "quality": bool(row.quality),
                    }
                )
            state.update((sorted(seen),))
            if not out:
                return iter(())
            return iter([pd.DataFrame(out)])

        deduped = keyed.groupBy("bucket").applyInPandasWithState(
            first_wins,
            outputStructType=out_schema,
            stateStructType="seen array<string>",
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
        admitted = deduped.filter("quality").select(
            "doc_id", "lang", "source", "n_toks"
        )
        with stream_state_partitions(spark):
            q = (
                admitted.writeStream.format("ledgersink")
                .option("path", ledger)
                .option(
                    "checkpointLocation", os.path.join(base, ".checkpoint")
                )
                .outputMode("append")
                .start()
            )
            try:
                q.processAllAvailable()
            finally:
                q.stop()
            q.awaitTermination()
        with open(marker, "w") as fh:
            fh.write("ok\n")

    back = read_ledger(spark, ledger, _STREAM_DELTA_LEDGER_SCHEMA)
    return back.groupBy("lang", "source").agg(
        F.count(F.lit(1)).cast("long").alias("n_admitted"),
        F.sum("n_toks").cast("long").alias("tok_sum"),
    )


# ---------------------------------------------------------------------------
# dedup_stream_index_append (round 14) — the COMMIT half of the live
# nightly loop: the PUBLISHED delta's signatures installed as the next
# index version, closing stream_corpus_delta's cycle
# ---------------------------------------------------------------------------

_STREAM_APPEND_SQL = f"""
    WITH {_INCR_CTES},
    keepers AS (
      SELECT sp.doc_id
      FROM split sp
      LEFT JOIN bsig b ON b.doc_id = sp.doc_id
      LEFT JOIN cm ON cm.doc_id = sp.doc_id
      LEFT JOIN bm ON bm.m0 = b.m0 AND bm.m1 = b.m1
                  AND bm.m2 = b.m2 AND bm.m3 = b.m3
      WHERE sp.is_batch
        AND cm.dup_of_corpus IS NULL
        AND (bm.first_in_batch IS NULL OR bm.first_in_batch = sp.doc_id)
    ),
    admitted AS (
      SELECT k.doc_id FROM keepers k JOIN documents d ON d.doc_id = k.doc_id
      WHERE len(d.text) BETWEEN 150 AND 500
    ),
    v1 AS (SELECT doc_id, m0, m1, m2, m3 FROM csig),
    v2 AS (
      SELECT * FROM v1
      UNION ALL
      SELECT b.doc_id, b.m0, b.m1, b.m2, b.m3
      FROM bsig b JOIN admitted a ON a.doc_id = b.doc_id
    ),
    versions AS (
      SELECT 1 AS version, * FROM v1
      UNION ALL
      SELECT 2 AS version, * FROM v2
    )
    SELECT CAST(version AS BIGINT) AS version,
           CAST(COUNT(*) AS BIGINT) AS n_entries,
           CAST(SUM(doc_id) AS BIGINT) AS id_sum,
           CAST(COUNT(DISTINCT m0 || m1 || m2 || m3) AS BIGINT)
             AS n_signatures
    FROM versions GROUP BY 1
"""


@query("dedup_stream_index_append", family="dedup", oracle=_STREAM_APPEND_SQL)
def dedup_stream_index_append(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The COMMIT half of the LIVE nightly loop — what
    dedup_neardup_index_append is to the batch verdict, this is to the
    STREAMED publish: after stream_corpus_delta's epochs land, the
    PUBLISHED docs' signatures are physically installed as the next
    index version (v2 = v1 ∪ signatures of admitted docs; staged write
    + atomic rename, content-addressed), so tomorrow's stream probes
    v2 and the cycle closes without ever re-signing the corpus.

    Publication-gated semantics — deliberately different from the
    batch twin's keeper-gated v2: the batch append indexes every KEPT
    doc; the nightly publish indexes what was actually RELEASED (keep
    AND quality). A quality-failed keeper's content was never
    published, so a future near-duplicate that passes quality should
    be admitted — the index tracks the published corpus, not the
    attempted one. Unsigned admitted docs (< 2 tokens) index nothing
    (no probe surface) — the dedup_neardup_index_append rule.

    The admitted set is read FROM THE LEDGER the streaming sink
    committed (manifest-visible files only), and only those docs are
    re-signed — O(published delta) work, the corpus side is the
    persisted v1 parquet. The audit measures BOTH on-disk versions
    (entries, id sum, distinct signatures); the oracle recomputes v1
    and v2 from raw documents through the shared probe/publish CTE
    chain, so the hash certifies the physical append: exactly the
    published signatures were added, none dropped or duplicated, v1
    undisturbed.

    Scale shape: one O(delta) signing pass + one O(delta) parquet
    append; the audit is two partial-aggregated index scans. At 100 TB
    the append is a catalog commit of delta-sized files — the same
    bound as the batch twin."""
    import os

    from ..sources.pysink import read_ledger
    from .layout import _atomic_dir_write

    v1_path = _neardup_index_path(sf_dir)
    v2_path = f"{v1_path}_pub2"
    v1 = _corpus_signature_index(spark, sf_dir)
    lanes = [f"m{i}" for i in range(_PORTABLE_LANES)]
    if not os.path.isdir(v2_path):
        stream_corpus_delta(spark, sf_dir)  # ensure the ledger exists
        ledger = os.path.join(_stream_delta_workdir(sf_dir), "ledger")
        admitted = read_ledger(
            spark, ledger, _STREAM_DELTA_LEDGER_SCHEMA
        ).select("doc_id")
        docs = (
            load_table(spark, sf_dir, "documents")
            .select("doc_id", "text")
            .join(admitted, "doc_id")
            .repartition(spark.sparkContext.defaultParallelism, "doc_id")
        )
        v2 = v1.select("doc_id", *lanes).unionByName(
            _signature_of(docs).select("doc_id", *lanes)
        )
        _atomic_dir_write(lambda p: v2.write.parquet(p), v2_path)

    def audit(version: int, path: str) -> DataFrame:
        idx = spark.read.parquet(path)
        return idx.agg(
            F.lit(version).cast("long").alias("version"),
            F.count(F.lit(1)).cast("long").alias("n_entries"),
            F.sum("doc_id").cast("long").alias("id_sum"),
            F.count_distinct(*[F.col(m) for m in lanes])
            .cast("long")
            .alias("n_signatures"),
        ).select("version", "n_entries", "id_sum", "n_signatures")

    return audit(1, v1_path).unionByName(audit(2, v2_path))
