"""Scalar-function queries (SURVEY.md §2.3 "Scalar functions") —
generalizing the reference's cast layer (R2, weather_task.py:61-67) into
the string/date/math/json/array/map families.

All are narrow, shuffle-free, whole-stage-codegen'd projections — they
run at scan bandwidth at any scale. Cross-engine determinism notes are
inline where an expression needed pinning (libm-vs-JVM math, weekday
numbering, JSON extraction types).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from . import query


@query(
    "scalar_string",
    oracle="""
    SELECT
      p_partkey,
      upper(p_name)  AS name_upper,
      lower(p_brand) AS brand_lower,
      trim(p_name)   AS name_trim,
      substring(p_name, 1, 5) AS name_pfx,
      p_brand || ':' || p_type AS brand_type,
      CAST(length(p_name) AS BIGINT) AS name_len,
      regexp_extract(p_name, '^(\\w+)', 1) AS first_word
    FROM part
    """,
)
def scalar_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    """upper/lower/trim/substring/concat/length/regexp_extract on part.
    regexp group-1 extraction verified identical between Spark (Java
    regex) and DuckDB (RE2) for \\w+ classes; length cast BIGINT (Spark
    INT vs DuckDB BIGINT)."""
    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.upper("p_name").alias("name_upper"),
        F.lower("p_brand").alias("brand_lower"),
        F.trim("p_name").alias("name_trim"),
        F.substring("p_name", 1, 5).alias("name_pfx"),
        F.concat_ws(":", "p_brand", "p_type").alias("brand_type"),
        F.length("p_name").cast("long").alias("name_len"),
        F.regexp_extract("p_name", r"^(\w+)", 1).alias("first_word"),
    )


@query(
    "scalar_date",
    oracle="""
    SELECT
      o_orderkey,
      CAST(year(o_orderdate) AS BIGINT)  AS order_year,
      CAST(month(o_orderdate) AS BIGINT) AS order_month,
      CAST(dayofweek(o_orderdate) AS BIGINT) AS order_dow,
      date_trunc('month', o_orderdate) AS month_start,
      CAST(date_diff('day', o_orderdate, TIMESTAMP '2002-01-01 00:00:00') AS BIGINT)
        AS days_to_2002,
      CAST((2002 - year(o_orderdate)) * 12 - month(o_orderdate) + 1 AS BIGINT)
        AS months_to_2002
    FROM orders
    """,
)
def scalar_date(spark: SparkSession, sf_dir: str) -> DataFrame:
    """year/month/dayofweek/date_trunc/datediff on o_orderdate.

    Weekday numbering is pinned to DuckDB's Sunday=0 (Spark's dayofweek
    is Sunday=1, so subtract 1). Month distance is computed from
    year/month parts explicitly — Spark months_between (fractional) and
    DuckDB date_diff('month') (boundary crossings) disagree by design,
    so neither is used raw."""
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").cast("long").alias("order_year"),
        F.month("o_orderdate").cast("long").alias("order_month"),
        (F.dayofweek("o_orderdate") - 1).cast("long").alias("order_dow"),
        F.date_trunc("month", "o_orderdate").alias("month_start"),
        F.datediff(F.lit("2002-01-01").cast("date"), F.col("o_orderdate").cast("date"))
        .cast("long")
        .alias("days_to_2002"),
        ((F.lit(2002) - F.year("o_orderdate")) * 12 - F.month("o_orderdate") + 1)
        .cast("long")
        .alias("months_to_2002"),
    )


@query(
    "scalar_math",
    oracle="""
    SELECT
      o_orderkey,
      round(o_totalprice, 0)  AS price_r0,
      round(o_totalprice / 7, 3) AS price_div7_r3,
      abs(o_totalprice - 100000) AS dist_100k,
      CAST(ceil(o_totalprice / 1000) AS BIGINT)  AS price_kceil,
      CAST(floor(o_totalprice / 1000) AS BIGINT) AS price_kfloor,
      round(ln(o_totalprice), 6) AS ln_price_r6,
      round(pow(o_totalprice, 0.5), 6) AS sqrt_price_r6
    FROM orders
    """,
)
def scalar_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    """round/abs/ceil/floor/ln/pow on prices.

    ln/pow results are rounded to 6 dp on both sides: JVM Math.log and
    libm disagree in the final ulp (~1% of rows measured); 6-dp rounding
    is empirically exact across 150k rows at sf0.1. round() itself
    agrees unrounded (verified half-behavior on 2-dp inputs)."""
    o = load_table(spark, sf_dir, "orders")
    price = F.col("o_totalprice")
    return o.select(
        "o_orderkey",
        F.round(price, 0).alias("price_r0"),
        F.round(price / 7, 3).alias("price_div7_r3"),
        F.abs(price - 100000).alias("dist_100k"),
        F.ceil(price / 1000).alias("price_kceil"),
        F.floor(price / 1000).alias("price_kfloor"),
        F.round(F.log(price), 6).alias("ln_price_r6"),
        F.round(F.pow(price, F.lit(0.5)), 6).alias("sqrt_price_r6"),
    )


@query(
    "scalar_json",
    oracle="""
    SELECT
      event_id,
      json_extract_string(props, '$.k') AS k_str,
      CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_int,
      CAST(json_extract_string(props, '$.missing') AS BIGINT) AS missing_int
    FROM events
    """,
)
def scalar_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON-string field extraction from events.props: string access,
    typed access, and absent-path → NULL. Spark get_json_object ≡ DuckDB
    json_extract_string for scalar paths."""
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.get_json_object("props", "$.k").alias("k_str"),
        F.get_json_object("props", "$.k").cast("long").alias("k_int"),
        F.get_json_object("props", "$.missing").cast("long").alias("missing_int"),
    )


@query(
    "array_ops",
    oracle="""
    SELECT
      doc_id,
      CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
      list_contains(string_split(text, ' '), 'spark') AS has_spark,
      string_split(text, ' ')[1] AS first_token,
      array_to_string(list_slice(string_split(text, ' '), 1, 3), ' ') AS first3
    FROM documents
    """,
)
def array_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """split→array, size, array_contains, element_at, slice+join on the
    documents table — the array surface over tokenized text."""
    docs = load_table(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    return docs.select(
        "doc_id",
        F.size(toks).cast("long").alias("n_tokens"),
        F.array_contains(toks, "spark").alias("has_spark"),
        F.element_at(toks, 1).alias("first_token"),
        F.array_join(F.slice(toks, 1, 3), " ").alias("first3"),
    )


@query(
    "map_ops",
    oracle="""
    SELECT
      event_id,
      event_type AS type_from_map,
      CASE WHEN value >= 100 THEN 'high' ELSE 'low' END AS band_from_map,
      CAST(NULL AS VARCHAR) AS missing_from_map,
      CAST(2 AS BIGINT) AS map_size
    FROM events
    """,
)
def map_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Build a map from entries, look up by key, probe a missing key,
    take its cardinality. The oracle states the expected *scalar*
    results directly (DuckDB MAP and Spark MAP don't hash-compare as
    host objects; the lookups are what's verified)."""
    ev = load_table(spark, sf_dir, "events")
    m = F.create_map(
        F.lit("type"),
        F.col("event_type"),
        F.lit("band"),
        F.when(F.col("value") >= 100, "high").otherwise("low"),
    )
    return ev.select(
        "event_id",
        F.element_at(m, "type").alias("type_from_map"),
        F.element_at(m, "band").alias("band_from_map"),
        F.element_at(m, "missing").cast("string").alias("missing_from_map"),
        F.size(m).cast("long").alias("map_size"),
    )


@query(
    "scalar_variant",
    oracle="""
    SELECT
      event_id,
      event_type AS vtype,
      CASE WHEN value IS NOT NULL
           THEN CAST(FLOOR(value * 100 + 0.5) AS BIGINT) END AS vcents,
      user_id AS second_id,
      CAST(NULL AS BIGINT) AS missing_leg,
      TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) AS props_k,
      TRUE AS malformed_is_null
    FROM events
    """,
)
def scalar_variant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 VARIANT type surface — the engine's semi-structured
    story past string-path extraction (scalar_json): build a nested
    JSON document from typed columns, `parse_json` it into a VARIANT,
    and read it back with typed-path extraction (`variant_get` with
    object, nested-object, and array-index paths), absent-path → NULL
    (`try_variant_get`), and `try_parse_json` → NULL on malformed
    input. Integer/string legs only (the money double rides as cents
    INSIDE the document), so the oracle — which recomputes each leg's
    SEMANTIC value straight from the raw columns, no JSON engine
    involved — certifies the whole construct→parse→extract round trip
    bit-for-bit, including to_json's null-field dropping (a NULL
    value must surface as an ABSENT $.m.c, not a JSON null).

    Scale note: VARIANT is the columnar-shredding path for
    semi-structured data at rest (binary-encoded, no per-access
    re-parse the way repeated get_json_object calls re-parse the
    string); everything here is map-side whole-stage-codegen'd."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", "value", "props"
    )
    doc = F.to_json(
        F.struct(
            F.col("event_type").alias("t"),
            F.struct(
                F.floor(F.col("value") * 100 + F.lit(0.5))
                .cast("long")
                .alias("c")
            ).alias("m"),
            F.array(F.col("event_id"), F.col("user_id")).alias("ids"),
        )
    )
    v = F.parse_json(doc)
    return ev.select(
        "event_id",
        F.variant_get(v, "$.t", "string").alias("vtype"),
        F.variant_get(v, "$.m.c", "long").alias("vcents"),
        F.variant_get(v, "$.ids[1]", "long").alias("second_id"),
        F.try_variant_get(v, "$.nothing.here", "long").alias("missing_leg"),
        # try_* on the RAW props leg: one malformed document or a
        # non-integer $.k degrades to NULL (matching the oracle's
        # TRY_CAST) instead of aborting the whole query — the
        # engine-built `v` document above keeps strict variant_get
        # because its shape is ours by construction
        F.try_variant_get(F.try_parse_json(F.col("props")), "$.k", "long")
        .alias("props_k"),
        F.try_parse_json(F.concat(F.lit("{"), F.col("props")))
        .isNull()
        .alias("malformed_is_null"),
    )
