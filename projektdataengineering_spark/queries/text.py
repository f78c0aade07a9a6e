"""Text-analysis queries over the documents table — the LLM-training-
data-pipeline surface (language ID, quality scoring, token counting,
fingerprinting, n-grams, word counts).

All of these stay JVM-side (split/explode/filter/aggregate/sha2 —
whole-stage codegen; zero Python in the hot path). At 100 TB the
explode-based token pipelines are shuffle-heavy by nature; the designs
below aggregate *before* shuffling where possible (map-side partial
aggregation on (word) keys) and hash long strings before any exchange.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions import token_ngrams
from . import query

# Tiny per-language stopword lists for the heuristic language-ID op.
# Deliberately minimal + deterministic; a production list would be much
# larger but the operator shape (token-membership scoring + argmax) is
# identical.
_STOP_EN = ("the", "a", "of", "and")
_STOP_ES = ("el", "la", "de", "y")
_STOP_DE = ("der", "die", "das", "und")


def _sql_list(words) -> str:
    return "[" + ", ".join(f"'{w}'" for w in words) + "]"


@query(
    "text_tokenize_wordcount",
    oracle="""
    SELECT tok AS word,
           COUNT(*) AS n_occurrences,
           COUNT(DISTINCT doc_id) AS n_docs
    FROM (
      SELECT doc_id, unnest(string_split(text, ' ')) AS tok
      FROM documents
    )
    GROUP BY tok
    """,
)
def text_tokenize_wordcount(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenize → per-word occurrence and document frequency. The
    explode shuffles (word) keys with map-side combine — the classic
    distributed wordcount plan."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select("doc_id", F.explode(F.split("text", " ")).alias("word"))
        .groupBy("word")
        .agg(
            F.count(F.lit(1)).alias("n_occurrences"),
            F.countDistinct("doc_id").alias("n_docs"),
        )
    )


@query(
    "text_ngram",
    oracle="""
    SELECT lang, bigram, COUNT(*) AS n
    FROM (
      SELECT lang,
             unnest([toks[i] || ' ' || toks[i+1] for i in range(1, len(toks))])
               AS bigram
      FROM (SELECT lang, string_split(text, ' ') AS toks FROM documents)
    )
    GROUP BY lang, bigram
    """,
)
def text_ngram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram counts per language. Bigrams are built array-side with a
    positional transform (no self-join) over a bound token array — see
    functions.token_ngrams for why the split must be bound once."""
    docs = load_table(spark, sf_dir, "documents")
    toked = docs.select("lang", F.split("text", " ").alias("toks"))
    return (
        toked.select("lang", F.explode(token_ngrams("toks", 2)).alias("bigram"))
        .groupBy("lang", "bigram")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@query(
    "text_langid",
    oracle=f"""
    SELECT doc_id, lang AS labeled_lang,
           CAST(en_hits AS BIGINT) AS en_hits,
           CAST(es_hits AS BIGINT) AS es_hits,
           CAST(de_hits AS BIGINT) AS de_hits,
           CASE
             WHEN en_hits = 0 AND es_hits = 0 AND de_hits = 0 THEN 'und'
             WHEN en_hits >= es_hits AND en_hits >= de_hits THEN 'en'
             WHEN es_hits >= de_hits THEN 'es'
             ELSE 'de'
           END AS predicted_lang
    FROM (
      SELECT doc_id, lang,
             len(list_filter(toks, x -> list_contains({_sql_list(_STOP_EN)}, x))) AS en_hits,
             len(list_filter(toks, x -> list_contains({_sql_list(_STOP_ES)}, x))) AS es_hits,
             len(list_filter(toks, x -> list_contains({_sql_list(_STOP_DE)}, x))) AS de_hits
      FROM (SELECT doc_id, lang, string_split(text, ' ') AS toks FROM documents)
    )
    """,
)
def text_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic language ID: count stopword hits per candidate language
    over the token array, argmax with a fixed priority order (en→es→de,
    'und' when no evidence). Pure array expressions, no UDF."""
    docs = load_table(spark, sf_dir, "documents")
    toks = F.split("text", " ")

    def hits(words) -> F.Column:
        arr = F.array(*[F.lit(w) for w in words])
        return F.size(F.filter(toks, lambda x: F.array_contains(arr, x))).cast("long")

    en, es, de = hits(_STOP_EN), hits(_STOP_ES), hits(_STOP_DE)
    return docs.select(
        "doc_id",
        F.col("lang").alias("labeled_lang"),
        en.alias("en_hits"),
        es.alias("es_hits"),
        de.alias("de_hits"),
        F.when((en == 0) & (es == 0) & (de == 0), "und")
        .when((en >= es) & (en >= de), "en")
        .when(es >= de, "es")
        .otherwise("de")
        .alias("predicted_lang"),
    )


@query(
    "text_quality_score",
    oracle=f"""
    SELECT doc_id,
           CAST(length(text) AS BIGINT) AS n_chars,
           CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
           round(CAST(length(text) AS DOUBLE)
                 / len(string_split(text, ' ')), 4) AS avg_token_len,
           round(CAST(len(list_filter(string_split(text, ' '),
                     x -> list_contains({_sql_list(_STOP_EN)}, x))) AS DOUBLE)
                 / len(string_split(text, ' ')), 4) AS stopword_ratio,
           (length(text) >= 100 AND len(string_split(text, ' ')) >= 20)
             AS passes_quality
    FROM documents
    """,
)
def text_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality signals per document: char/token counts, mean token
    length, stopword ratio, and a boolean gate — the standard cheap
    pre-filter stage of a training-data pipeline."""
    docs = load_table(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    stop_arr = F.array(*[F.lit(w) for w in _STOP_EN])
    n_tokens = F.size(toks)
    return docs.select(
        "doc_id",
        F.length("text").cast("long").alias("n_chars"),
        n_tokens.cast("long").alias("n_tokens"),
        F.round(F.length("text").cast("double") / n_tokens, 4).alias("avg_token_len"),
        F.round(
            F.size(F.filter(toks, lambda x: F.array_contains(stop_arr, x))).cast("double")
            / n_tokens,
            4,
        ).alias("stopword_ratio"),
        ((F.length("text") >= 100) & (n_tokens >= 20)).alias("passes_quality"),
    )


@query(
    "text_fingerprint",
    oracle="""
    SELECT doc_id,
           sha256(lower(trim(text))) AS content_fp,
           substring(sha256(lower(trim(text))), 1, 16) AS content_fp64,
           sha256(array_to_string(list_slice(string_split(text, ' '), 1, 5), ' '))
             AS prefix_shingle_fp
    FROM documents
    """,
)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic document fingerprints: normalized content hash, a
    64-bit-prefix short form, and a leading-5-token shingle hash (the
    building block the MinHash family in queries/similarity.py extends
    to full shingle sets)."""
    docs = load_table(spark, sf_dir, "documents")
    norm = F.sha2(F.lower(F.trim(F.col("text"))), 256)
    return docs.select(
        "doc_id",
        norm.alias("content_fp"),
        F.substring(norm, 1, 16).alias("content_fp64"),
        F.sha2(F.array_join(F.slice(F.split("text", " "), 1, 5), " "), 256).alias(
            "prefix_shingle_fp"
        ),
    )


# A BPE-ish pre-tokenization pattern (word pieces, numbers, single
# non-space punctuation) — RE2/Java-compatible subset, no lookarounds,
# so Spark and DuckDB extract identical token streams.
_BPE_RE = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"


@query(
    "text_token_count",
    oracle=f"""
    SELECT doc_id,
           CAST(len(string_split(text, ' ')) AS BIGINT) AS ws_tokens,
           CAST(len(regexp_extract_all(text, '{_BPE_RE}')) AS BIGINT) AS bpe_tokens,
           CAST(length(text) AS BIGINT) AS n_chars
    FROM documents
    """,
)
def text_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token accounting per document: whitespace tokens (the quality
    gate's unit) and BPE-ish regex tokens (the budget unit an LLM
    pipeline actually bills in — words, numbers and punctuation counted
    separately). Pure codegen'd regex on both engines."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.size(F.split("text", " ")).cast("long").alias("ws_tokens"),
        F.size(F.regexp_extract_all("text", F.lit(_BPE_RE), F.lit(0))).cast("long").alias(
            "bpe_tokens"
        ),
        F.length("text").cast("long").alias("n_chars"),
    )


@query(
    "text_redact_pattern",
    oracle=r"""
    SELECT doc_id,
           regexp_replace(text, '\b(a|the)\b', '<STOP>', 'g') AS redacted,
           CAST(len(regexp_extract_all(text, '\b(a|the)\b')) AS BIGINT)
             AS n_redactions
    FROM documents
    """,
)
def text_redact_pattern(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex scrubbing — the PII-redaction plumbing of a training-data
    pipeline (emails, phone numbers, IDs), exercised here on a pattern
    the synthetic corpus actually contains (standalone articles).
    Replacement plus an audit count of how many spans were redacted —
    production redaction always logs what it removed.

    Purely map-side JVM regex (codegen'd; no shuffle, no Python), so it
    streams at scan speed no matter the corpus size. The pattern sticks
    to the regex intersection of Java's engine and RE2 (no backrefs or
    lookaround) — which is also the rule for a portable redaction
    library, and why the oracle can check it verbatim."""
    docs = load_table(spark, sf_dir, "documents")
    pat = r"\b(a|the)\b"
    return docs.select(
        "doc_id",
        F.regexp_replace("text", pat, "<STOP>").alias("redacted"),
        F.size(F.regexp_extract_all("text", F.lit(pat), 0))
        .cast("long")
        .alias("n_redactions"),
    )


@query(
    "text_normalize",
    oracle=r"""
    SELECT doc_id,
           trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS norm_text,
           sha256(trim(regexp_replace(lower(text), '\s+', ' ', 'g')))
             AS norm_sha256
    FROM documents
    """,
)
def text_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonicalization — the step that runs BEFORE exact dedup in a
    training pipeline, so that case and whitespace variants of the same
    document collapse to one hash: lowercase, whitespace runs to single
    spaces, trim, plus the canonical-form sha256 (feed it to
    dedup_exact's groupBy and trivially-different duplicates fold).

    Map-side codegen'd string ops only — no shuffle, no Python; at
    100 TB this runs at scan bandwidth. Unicode NFC/NFKC folding (the
    production next step) needs an ICU pass — that belongs in an Arrow
    pandas_udf behind the same column contract, gated on the icu lib."""
    docs = load_table(spark, sf_dir, "documents")
    norm = F.trim(F.regexp_replace(F.lower(F.col("text")), r"\s+", " "))
    return docs.select(
        "doc_id",
        norm.alias("norm_text"),
        F.sha2(norm, 256).alias("norm_sha256"),
    )


# Collision-probability quantization: ppm numerators keep the whole
# diversity score in BIGINT arithmetic (floor division is exact and
# identical in both engines — no log, no float).
# 72k ≈ the corpus median (sf0.01 median 72349; English-like text sits
# near 65-75k), so the boolean actually splits the corpus instead of
# rubber-stamping one class. Safe at ANY value: ppm is integer-exact,
# so the comparison can never flake across engines or partitionings.
_DIVERSITY_PPM_THRESHOLD = 72_000


@query(
    "text_char_diversity",
    oracle=f"""
    WITH ch AS (
      SELECT doc_id, UNNEST(string_split(text, '')) AS ch FROM documents
    ),
    cnt AS (SELECT doc_id, ch, COUNT(*) AS c FROM ch GROUP BY 1, 2),
    s AS (
      SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_cp,
             CAST(COUNT(*) AS BIGINT) AS distinct_chars,
             CAST(SUM(c * (c - 1)) AS BIGINT) AS coll
      FROM cnt GROUP BY 1
    )
    SELECT doc_id, n_cp, distinct_chars,
           (coll * 1000000) // (n_cp * (n_cp - 1)) AS collision_ppm,
           (coll * 1000000) // (n_cp * (n_cp - 1))
             < {_DIVERSITY_PPM_THRESHOLD} AS diverse
    FROM s WHERE n_cp >= 2 ORDER BY doc_id
    """,
)
def text_char_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character-diversity quality signal: the EXACT collision
    probability of each document's character distribution — Σc(c−1) /
    n(n−1), the Rényi-order-2 counterpart of Shannon entropy — in
    parts-per-million. High collision = low diversity (keyboard mash,
    repeated padding, single-char floods) and is the filter signal;
    unlike a real entropy it needs NO transcendentals, so the score is
    integer-exact and replays bit-for-bit in the oracle (the engine's
    float discipline: when a monotone transform of the textbook metric
    is integer-representable, ship the transform, not the float).

    Scale shape: explode + two hash aggregates — the oracle's own
    vectorized UNNEST+GROUP BY road, whole-stage-codegen'd end to end.
    The (doc_id, ch) aggregate does PARTIAL map-side aggregation, so
    the first exchange carries per-partition histograms (≤ docs ×
    charset rows of 3 narrow columns), never the exploded character
    stream; the second exchange carries (doc_id, 3 scalars). An
    earlier formulation computed the same integers with a zero-shuffle
    array_sort + aggregate() sorted-run fold, but higher-order
    functions are interpreted (no codegen): the r18 interleaved A/B
    measured the fold at 2.58 s vs 0.72 s for this shape at sf0.1
    (guide §4.1 — prefer codegen'd built-ins; the two tiny
    metadata-sized exchanges cost less than leaving codegen).

    Unicode: F.split(text, "") splits at CODE POINT boundaries (Java
    regex is code-point aware — surrogate pairs stay whole), matching
    DuckDB's string_split(text, '') even for non-BMP input; pinned by
    tests/test_properties.py::test_char_split_is_codepoint_safe_cross_engine."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    cnt = (
        docs.select("doc_id", F.explode(F.split(F.col("text"), "")).alias("ch"))
        .groupBy("doc_id", "ch")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    s = cnt.groupBy("doc_id").agg(
        F.sum("c").cast("bigint").alias("n_cp"),
        F.count(F.lit(1)).cast("bigint").alias("distinct_chars"),
        F.sum(F.col("c") * (F.col("c") - 1)).cast("bigint").alias("coll"),
    ).filter(F.col("n_cp") >= 2)
    ppm = F.expr("(coll * 1000000) div (n_cp * (n_cp - 1))")
    return s.select(
        "doc_id",
        "n_cp",
        "distinct_chars",
        ppm.alias("collision_ppm"),
        (ppm < _DIVERSITY_PPM_THRESHOLD).alias("diverse"),
    ).orderBy("doc_id")
