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
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
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
