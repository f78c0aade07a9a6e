"""Round-2 LLM-corpus composites, part 2 — the token-level steps
between a filtered corpus and a training batch: repetition-based
quality filtering (C4/Gopher-style), vocabulary building + id
encoding, deterministic MLM-style span masking, and target-mixture
domain sampling.

All four are SQL-expressible and oracle-checked. Registered after
``advanced`` (queries/__init__._MODULES) — outside this round's
50-entry driver correctness window by design; rotates in next round.

Shared discipline (see pipeline_ops): md5-over-decimal-string-keys as
the deterministic stand-in for randomness (identical bytes in both
engines, uniform, partitioning-independent); every ratio is one IEEE
division of exact integers; unique tiebreakers under every rank.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions import token_ngrams
from . import query


def _toked(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return docs.select("doc_id", F.split("text", " ").alias("toks"))


# ---------------------------------------------------------------------------
# Repetition filter (C4/Gopher-style quality rule)
# ---------------------------------------------------------------------------

_REP_MAX_DUP_RATIO = 0.2

_REP_SQL = f"""
    SELECT doc_id,
           CAST(len(gs) AS BIGINT) AS n_bigrams,
           CAST(len(list_distinct(gs)) AS BIGINT) AS n_distinct,
           CASE WHEN len(gs) = 0 THEN 0.0
                ELSE 1.0 - CAST(len(list_distinct(gs)) AS DOUBLE)
                           / CAST(len(gs) AS DOUBLE) END AS dup_ratio,
           CASE WHEN len(gs) = 0 THEN TRUE
                ELSE 1.0 - CAST(len(list_distinct(gs)) AS DOUBLE)
                           / CAST(len(gs) AS DOUBLE) <= {_REP_MAX_DUP_RATIO} END
             AS keep
    FROM (
      SELECT doc_id, [toks[i] || ' ' || toks[i+1]
                      for i in range(1, len(toks))] AS gs
      FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
    )
"""


@query("pipeline_repetition_filter", oracle=_REP_SQL)
def pipeline_repetition_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-bigram ratio per document with a keep flag — the
    repetition quality rule of C4/Gopher-style corpus cleaning (a doc
    whose bigrams repeat heavily is boilerplate or degenerate
    generation). Pure map-side array math: no shuffle, no UDF; the
    ratio is one IEEE division of two exact integers so the doubles
    hash identically in DuckDB. At 100 TB this streams at scan speed
    and partitions embarrassingly."""
    t = _toked(spark, sf_dir)
    g = t.select("doc_id", token_ngrams("toks", 2).alias("gs"))
    n = F.size("gs").cast("bigint")
    nd = F.size(F.array_distinct("gs")).cast("bigint")
    dup = F.when(n == 0, F.lit(0.0)).otherwise(
        F.lit(1.0) - nd.cast("double") / n.cast("double")
    )
    return g.select(
        "doc_id",
        n.alias("n_bigrams"),
        nd.alias("n_distinct"),
        dup.alias("dup_ratio"),
        (dup <= _REP_MAX_DUP_RATIO).alias("keep"),
    )


# ---------------------------------------------------------------------------
# Vocabulary build + id encoding
# ---------------------------------------------------------------------------

_VOCAB_SIZE = 32

_ENCODE_SQL = f"""
    WITH toked AS (
      SELECT doc_id, string_split(text, ' ') AS toks FROM documents
    ),
    uni AS (
      SELECT w, COUNT(*) AS n
      FROM (SELECT unnest(toks) AS w FROM toked) GROUP BY w
    ),
    vocab AS (
      SELECT w, id FROM (
        SELECT w, CAST(ROW_NUMBER() OVER (ORDER BY n DESC, w) - 1 AS BIGINT) AS id
        FROM uni
      ) WHERE id < {_VOCAB_SIZE}
    )
    , enc AS (
      SELECT t.doc_id, CAST(p.pos AS BIGINT) AS pos, t.toks[p.pos] AS token
      FROM toked t, UNNEST(range(1, len(t.toks) + 1)) AS p(pos)
    )
    SELECT e.doc_id, e.pos, e.token, COALESCE(v.id, -1) AS token_id
    FROM enc e LEFT JOIN vocab v ON v.w = e.token
"""


@query("pipeline_vocab_encode", oracle=_ENCODE_SQL)
def pipeline_vocab_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frequency-ranked vocabulary (top-32 tokens, count-desc then
    lexicographic — a deterministic total order) and the corpus encoded
    as (doc_id, pos, token, token_id), OOV → -1. The text→ids step of
    every tokenizer pipeline, kept relational: the vocabulary is a
    broadcast join (a vocab is always small relative to its corpus),
    the encoding is map-side posexplode. The vocab build's global
    row_number is a 1-partition window over the VOCABULARY (bounded),
    never over the corpus."""
    t = _toked(spark, sf_dir)
    uni = (
        t.select(F.explode("toks").alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    wv = Window.orderBy(F.col("n").desc(), "w")
    vocab = (
        uni.select("w", (F.row_number().over(wv) - 1).cast("bigint").alias("id"))
        .filter(F.col("id") < _VOCAB_SIZE)
    )
    enc = t.select("doc_id", F.posexplode("toks").alias("pos0", "token")).select(
        "doc_id", (F.col("pos0") + 1).cast("bigint").alias("pos"), "token"
    )
    return enc.join(F.broadcast(vocab), enc.token == vocab.w, "left").select(
        "doc_id",
        "pos",
        "token",
        F.coalesce("id", F.lit(-1)).cast("bigint").alias("token_id"),
    )


# ---------------------------------------------------------------------------
# Deterministic span masking (MLM-style corpus prep)
# ---------------------------------------------------------------------------

_MASK_SQL = """
    SELECT doc_id, CAST(p.pos AS BIGINT) AS pos, t.toks[p.pos] AS token,
           substr(md5(CAST(doc_id AS VARCHAR) || ':' || CAST(p.pos AS VARCHAR)), 1, 1)
             IN ('0', '1', '2') AS is_masked
    FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents) t,
         UNNEST(range(1, len(t.toks) + 1)) AS p(pos)
"""


@query("pipeline_span_mask", oracle=_MASK_SQL)
def pipeline_span_mask(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic ~18.75% token masking (first md5 hex char of
    (doc_id, pos) in 0-2 → 3/16 of positions) — MLM-style corpus
    preparation as a reproducible function of the data, the same
    md5-as-randomness convention as split_train_test: identical bytes
    in both engines, uniform across positions, independent of
    partitioning and replay-safe (a re-run masks the same spans).
    Map-side only."""
    t = _toked(spark, sf_dir)
    enc = t.select("doc_id", F.posexplode("toks").alias("pos0", "token")).select(
        "doc_id", (F.col("pos0") + 1).cast("bigint").alias("pos"), "token"
    )
    key = F.concat(
        F.col("doc_id").cast("string"), F.lit(":"), F.col("pos").cast("string")
    )
    return enc.select(
        "doc_id",
        "pos",
        "token",
        F.substring(F.md5(key), 1, 1).isin("0", "1", "2").alias("is_masked"),
    )


# ---------------------------------------------------------------------------
# Target-mixture domain sampling
# ---------------------------------------------------------------------------

_MIX_BUDGET = 200
# Target language mixture: en-heavy with a uniform tail — the static
# domain-weights shape of mixture-tuned corpus assembly.
_MIX_WEIGHTS = {"en": 0.40, "de": 0.15, "es": 0.15, "fr": 0.15, "zh": 0.15}

_MIX_CASE = "CASE lang " + " ".join(
    f"WHEN '{k}' THEN {v}" for k, v in _MIX_WEIGHTS.items()
) + " ELSE 0.0 END"

_MIX_SQL = f"""
    SELECT doc_id, lang FROM (
      SELECT doc_id, lang,
             ROW_NUMBER() OVER (PARTITION BY lang
                                ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn,
             CAST(FLOOR(({_MIX_CASE}) * {_MIX_BUDGET}) AS BIGINT) AS quota
      FROM documents
    ) WHERE rn <= quota
"""


@query("pipeline_domain_mix", oracle=_MIX_SQL)
def pipeline_domain_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Assemble a fixed-size corpus slice hitting a target language
    mixture (40% en, 15% each tail) — the static domain-weighting step
    of mixture-tuned training-data assembly, generalizing
    pipeline_lang_balance's all-equal downsample. Per-language quota =
    floor(weight × budget); documents admitted in md5 order (uniform,
    deterministic, replay-stable). One shuffle on lang; the rank
    window and the quota filter share it. At 100 TB the md5 order
    also makes the admitted set independent of how the corpus is
    partitioned — no repartition-then-resample drift."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang")
    weight = F.lit(0.0)
    for k, v in _MIX_WEIGHTS.items():
        weight = F.when(F.col("lang") == k, F.lit(v)).otherwise(weight)
    quota = F.floor(weight * _MIX_BUDGET).cast("bigint")
    w = Window.partitionBy("lang").orderBy(
        F.md5(F.col("doc_id").cast("string")), "doc_id"
    )
    return (
        docs.select("doc_id", "lang", F.row_number().over(w).alias("rn"), quota.alias("quota"))
        .filter(F.col("rn") <= F.col("quota"))
        .select("doc_id", "lang")
    )


# ---------------------------------------------------------------------------
# pipeline_boilerplate_blocks — corpus-frequency block removal (CCNet-style)
# ---------------------------------------------------------------------------

_BOILER_W = 2  # words per block (the fixture's "paragraph" analog)
_BOILER_MIN_DOCS = 25  # boilerplate = block seen in > 5% of the 500-doc corpus
_BOILER_SQL = f"""
    WITH words AS (
      SELECT doc_id, string_split(text, ' ') AS ws FROM documents
    ), blocks AS (
      SELECT doc_id, CAST(i - 1 AS BIGINT) AS pos,
             array_to_string(
               ws[((i - 1) * {_BOILER_W} + 1):((i - 1) * {_BOILER_W} + {_BOILER_W})],
               ' ') AS block
      FROM words,
           UNNEST(generate_series(
             1, CAST(ceil(len(ws) / {_BOILER_W}.0) AS BIGINT))) AS t(i)
    ), df AS (
      SELECT block, COUNT(DISTINCT doc_id) AS df FROM blocks GROUP BY block
    )
    SELECT b.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_blocks,
           CAST(SUM(CASE WHEN d.df > {_BOILER_MIN_DOCS} THEN 1 ELSE 0 END)
                AS BIGINT) AS n_removed,
           md5(COALESCE(string_agg(
                 CASE WHEN d.df <= {_BOILER_MIN_DOCS} THEN b.block END,
                 ' ' ORDER BY b.pos), '')) AS clean_md5
    FROM blocks b JOIN df d USING (block)
    GROUP BY b.doc_id
"""


@query("pipeline_boilerplate_blocks", oracle=_BOILER_SQL)
def pipeline_boilerplate_blocks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-frequency boilerplate removal (the public CCNet/RefinedWeb
    recipe: hash each paragraph, drop paragraphs whose hash recurs
    across too many documents — headers, footers, cookie banners).  The
    word-soup fixture has no newlines, so the "paragraph" is a
    non-overlapping 2-word block; a block seen in more than
    25 distinct documents (>5% of the corpus) is
    boilerplate.  Emits per doc: block count, removed count, and the
    md5 of the text REBUILT from surviving blocks in order — the oracle
    certifies the cleaned text itself, not just counts.

    Unlike dedup_substring_spans / pipeline_substring_cut (which remove
    long repeated SPANS, keeping one canonical copy), this removes
    high-document-frequency short units from EVERY document — the two
    compose in a real pipeline.

    Plan shape: map-side block explode → one aggregate on block for
    document frequency → one shuffle join back on block → one aggregate
    on doc_id with an ordered in-group rebuild. The DF table is tiny
    relative to the corpus (distinct blocks ≪ block instances), and
    only (block, pos, doc_id) triples ever shuffle — never full texts.
    """
    # doc_id repartition ahead of the block fan-out: the doc table's
    # input-split count (2 at sf1) would otherwise cap the explode and
    # rebuild stages — the dedup_substring_spans round-11 lesson
    docs = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .repartition(spark.sparkContext.defaultParallelism, "doc_id")
    )
    words = docs.select(
        "doc_id", F.split(F.col("text"), " ").alias("ws")
    )
    n_blocks = F.ceil(F.size("ws") / F.lit(float(_BOILER_W))).cast("int")
    blocks = words.select(
        "doc_id",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(1), n_blocks),
                lambda i: F.concat_ws(
                    " ",
                    F.slice(F.col("ws"), (i - 1) * _BOILER_W + 1, _BOILER_W),
                ),
            )
        ).alias("pos", "block"),
    ).select("doc_id", F.col("pos").cast("long").alias("pos"), "block")
    df_tbl = blocks.groupBy("block").agg(
        F.countDistinct("doc_id").alias("df")
    )
    joined = blocks.join(df_tbl, "block")
    keep = F.col("df") <= _BOILER_MIN_DOCS
    return (
        joined.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_blocks"),
            F.sum(F.when(~keep, 1).otherwise(0)).cast("long").alias("n_removed"),
            F.sort_array(
                F.collect_list(F.when(keep, F.struct("pos", "block")))
            ).alias("kept"),
        )
        .select(
            "doc_id",
            "n_blocks",
            "n_removed",
            F.md5(
                F.concat_ws(
                    " ", F.transform(F.col("kept"), lambda s: s["block"])
                )
            ).alias("clean_md5"),
        )
    )


# ---------------------------------------------------------------------------
# pipeline_filter_cascade (round 11) — the corpus-cleaning YIELD TABLE:
# stagewise attrition through the standard filter chain, the
# Dolma/RefinedWeb-style report every corpus release publishes
# ---------------------------------------------------------------------------

_CASCADE_MIN_TOKENS = 20
_CASCADE_KEEP_LANG = "en"
_CASCADE_MIN_DIVERSITY = 350  # distinct-token ratio, permille
_CASCADE_PREFIX_W = 8

_CASCADE_SQL = f"""
    WITH d0 AS (
      SELECT doc_id, lang, string_split(text, ' ') AS t FROM documents
    ),
    s1 AS (SELECT * FROM d0 WHERE len(t) >= {_CASCADE_MIN_TOKENS}),
    s2 AS (SELECT * FROM s1 WHERE lang = '{_CASCADE_KEEP_LANG}'),
    s3 AS (
      SELECT * FROM s2
      WHERE len(list_distinct(t)) * 1000 // len(t) >= {_CASCADE_MIN_DIVERSITY}
    ),
    s4 AS (
      SELECT doc_id FROM (
        SELECT doc_id,
               ROW_NUMBER() OVER (
                 PARTITION BY md5(array_to_string(t[1:{_CASCADE_PREFIX_W}], ' '))
                 ORDER BY doc_id) AS rn
        FROM s3
      ) WHERE rn = 1
    ),
    c AS (
      SELECT (SELECT COUNT(*) FROM d0) AS c0,
             (SELECT COUNT(*) FROM s1) AS c1,
             (SELECT COUNT(*) FROM s2) AS c2,
             (SELECT COUNT(*) FROM s3) AS c3,
             (SELECT COUNT(*) FROM s4) AS c4
    )
    SELECT CAST(stage_idx AS BIGINT) AS stage_idx, stage,
           CAST(docs_in AS BIGINT) AS docs_in,
           CAST(docs_out AS BIGINT) AS docs_out,
           CAST(docs_in - docs_out AS BIGINT) AS dropped,
           CAST(CASE WHEN docs_in = 0 THEN 0
                     ELSE (docs_in - docs_out) * 1000000 // docs_in END
                AS BIGINT) AS drop_ppm
    FROM (
      SELECT 1 AS stage_idx, 'length' AS stage, c0 AS docs_in, c1 AS docs_out FROM c
      UNION ALL SELECT 2, 'lang', c1, c2 FROM c
      UNION ALL SELECT 3, 'diversity', c2, c3 FROM c
      UNION ALL SELECT 4, 'prefix_dedup', c3, c4 FROM c
    ) stages
"""


@query("pipeline_filter_cascade", oracle=_CASCADE_SQL)
def pipeline_filter_cascade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-cleaning yield table — the stagewise attrition report
    (docs in/out/dropped/ppm per filter) that every public corpus
    release ships (Dolma, RefinedWeb, FineWeb all publish exactly this
    funnel): length gate (≥{_CASCADE_MIN_TOKENS} tokens) → language
    gate ({_CASCADE_KEEP_LANG!r}) → lexical-diversity gate
    (distinct-token ratio ≥ {_CASCADE_MIN_DIVERSITY}‰, integer
    arithmetic) → first-{_CASCADE_PREFIX_W}-token prefix dedup (the
    pipeline_prefix_dedup rule, corpus-first doc_id survives). The
    report certifies the PIPELINE's bookkeeping: each stage's input is
    the previous stage's output, so a hash match pins the entire
    cascade's composition, not just each predicate in isolation.

    Scale shape: the three predicate gates are map-side (one scan
    feeds a cascade of counts via one aggregate each — Spark reuses
    the scan across the chained counts); the dedup stage is one
    digest-only exchange; the five 1-row counts assemble driver-free
    via cross-join of broadcast aggregates. At 100 TB this is the
    nightly data-quality dashboard query: cost is one corpus scan plus
    the prefix-digest shuffle of the cleaned remainder."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang", "text")
    d0 = docs.select("doc_id", "lang", F.split("text", " ").alias("t"))
    s1 = d0.filter(F.size("t") >= _CASCADE_MIN_TOKENS)
    s2 = s1.filter(F.col("lang") == _CASCADE_KEEP_LANG)
    s3 = s2.filter(
        F.expr("size(array_distinct(t)) * 1000 div size(t)")
        >= _CASCADE_MIN_DIVERSITY
    )
    w = Window.partitionBy(
        F.md5(F.concat_ws(" ", F.slice("t", 1, _CASCADE_PREFIX_W)))
    ).orderBy("doc_id")
    s4 = s3.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") == 1)

    def cnt(df: DataFrame, name: str) -> DataFrame:
        return df.agg(F.count(F.lit(1)).cast("long").alias(name))

    c = (
        cnt(d0, "c0")
        .crossJoin(F.broadcast(cnt(s1, "c1")))
        .crossJoin(F.broadcast(cnt(s2, "c2")))
        .crossJoin(F.broadcast(cnt(s3, "c3")))
        .crossJoin(F.broadcast(cnt(s4, "c4")))
    )
    stages = [
        (1, "length", "c0", "c1"),
        (2, "lang", "c1", "c2"),
        (3, "diversity", "c2", "c3"),
        (4, "prefix_dedup", "c3", "c4"),
    ]
    out = None
    for idx, name, cin, cout in stages:
        r = c.select(
            F.lit(idx).cast("long").alias("stage_idx"),
            F.lit(name).alias("stage"),
            F.col(cin).alias("docs_in"),
            F.col(cout).alias("docs_out"),
            (F.col(cin) - F.col(cout)).cast("long").alias("dropped"),
            F.expr(
                f"CAST(CASE WHEN {cin} = 0 THEN 0"
                f" ELSE ({cin} - {cout}) * 1000000 div {cin} END AS BIGINT)"
            ).alias("drop_ppm"),
        )
        out = r if out is None else out.unionAll(r)
    return out
