"""Lexical retrieval scoring — the BM25 half of the RAG pair
(pipeline_rank_fusion fuses rankings; this module PRODUCES one from
document content).

Float discipline (the pipeline_pmi_collocations rule): classical BM25
needs ln() for IDF and a float saturation term — both transcendental /
rounding-divergent across engines. This implementation is the same
scoring family with every stage integer-exact so the DuckDB oracle
replays it bit-for-bit:

* tf saturation  tf·(k1+1) / (tf + k1·(1−b+b·dl/avgdl)) with k1=1.2,
  b=0.75 becomes the integer ratio  22·tf·T / (10·tf·T + 3·T + 9·dl·N)
  (multiply through by 10·T, where T = total corpus tokens and
  avgdl = T/N), quantized to parts-per-million by integer floor
  division — EXACT in both engines.
* IDF becomes floor(log2((N−df+0.5)/(df+0.5))) computed WITHOUT any
  float log:  floor(log2(a/b)) = length(bin(a DIV b)) − 1 for a ≥ b
  (a real r ≥ 1 has floor(log2 r) = floor(log2 floor(r)) because
  powers of two are integers), with the ×2 trick making both sides
  integral: a = 2N−2df+1, b = 2df+1. Terms in more than half the
  corpus floor to IDF 0 — the stopword clamp classical BM25 also
  approaches.

score = Σ_terms idf_bits · tf_term_ppm — a BIGINT.

Reference grounding: generalizes the reference's LIKE-filter scan
(SURVEY §2.3 text family); the scorer a reference user would bolt on
first when their corpus outgrows substring match.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from . import query

_BM25_N_TERMS = 4   # deterministic derived query: the 4 most mid-band terms
_BM25_TOP_K = 50


_BM25_SQL = f"""
    WITH base AS (
      SELECT doc_id, string_split(text, ' ') AS t,
             len(string_split(text, ' ')) AS dl
      FROM documents
    ),
    stats AS (SELECT COUNT(*) AS n, SUM(dl) AS total FROM base),
    tok AS (SELECT doc_id, unnest(t) AS token FROM base),
    dfreq AS (SELECT token, COUNT(DISTINCT doc_id) AS df FROM tok GROUP BY token),
    qterms AS (
      SELECT token, df FROM dfreq, stats
      ORDER BY abs(4 * df - n), token LIMIT {_BM25_N_TERMS}
    ),
    tf AS (
      SELECT doc_id, token, COUNT(*) AS tf FROM tok
      WHERE token IN (SELECT token FROM qterms) GROUP BY 1, 2
    ),
    scored AS (
      SELECT tf.doc_id,
             SUM((length(bin((2 * s.n - 2 * q.df + 1) // (2 * q.df + 1))) - 1)
                 * ((22 * tf.tf * s.total * 1000000)
                    // (10 * tf.tf * s.total + 3 * s.total + 9 * b.dl * s.n))
             ) AS score
      FROM tf
      JOIN qterms q USING (token)
      JOIN base b ON tf.doc_id = b.doc_id, stats s
      GROUP BY tf.doc_id
    )
    SELECT doc_id, CAST(score AS BIGINT) AS score_ppm,
           CAST(ROW_NUMBER() OVER (ORDER BY score DESC, doc_id) AS BIGINT)
             AS rank
    FROM scored ORDER BY score DESC, doc_id LIMIT {_BM25_TOP_K}
"""


@query("pipeline_bm25_topk", oracle=_BM25_SQL)
def pipeline_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 top-{_BM25_TOP_K} over documents for a deterministic derived
    query (the {_BM25_N_TERMS} tokens whose document frequency is
    closest to N/4 — discriminative mid-band terms, ties by token).
    Integer-exact scoring end-to-end (see the module docstring for the
    ppm-quantized saturation + log2-floor IDF construction), so the
    oracle replays every score bit-for-bit.

    Scale shape: tokenization and window math are map-side; the only
    exchanges are the df aggregate (shuffles (token, doc-distinct)
    partials), the {_BM25_N_TERMS}-row term pick (TakeOrdered — a
    driver merge of per-partition heaps, the HWM scalar-read pattern),
    the tf aggregate FILTERED to the query terms before it shuffles
    (at 100 TB the filter is what matters: per-query work is
    ∝ postings of the query terms, not the corpus), and the final
    distributed top-k. The df table is the reusable inverted-index
    statistic — a production deployment persists it once per corpus
    version like the IVF centroids (similarity._ivf_centroids) and
    pays only the tf side per query."""
    base = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", F.split("text", " ").alias("t"))
        .withColumn("dl", F.size("t"))
    )
    s = base.agg(
        F.count(F.lit(1)).alias("n"), F.sum("dl").alias("total")
    ).collect()[0]
    n, total = int(s["n"]), int(s["total"])

    tok = base.select("doc_id", F.explode("t").alias("token"))
    dfreq = tok.groupBy("token").agg(
        F.countDistinct("doc_id").alias("df")
    )
    qrows = (
        dfreq.orderBy(F.abs(4 * F.col("df") - F.lit(n)), "token")
        .limit(_BM25_N_TERMS)
        .collect()
    )
    terms = {r["token"]: int(r["df"]) for r in qrows}

    # idf_bits per term: pure python ints — identical to the SQL's
    # length(bin(a DIV b)) - 1, which is floor(log2(a/b)) for a >= b and
    # CLAMPS to 0 below that (bin(0) = '0', length 1): terms in more
    # than half the corpus get zero weight, like classical negative-IDF
    # clamping
    idf_bits = {
        t: max(((2 * n - 2 * df + 1) // (2 * df + 1)).bit_length() - 1, 0)
        for t, df in terms.items()
    }

    tf = (
        tok.filter(F.col("token").isin(list(terms)))
        .groupBy("doc_id", "token")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    idf_map = F.create_map(
        *[x for t, b in idf_bits.items() for x in (F.lit(t), F.lit(b))]
    )
    term_ppm = F.expr(
        f"(22 * tf * {total} * 1000000) div "
        f"(10 * tf * {total} + 3 * {total} + 9 * dl * {n})"
    )
    scored = (
        tf.join(base.select("doc_id", "dl"), "doc_id")
        .withColumn("contrib", idf_map[F.col("token")] * term_ppm)
        .groupBy("doc_id")
        .agg(F.sum("contrib").cast("long").alias("score_ppm"))
    )
    from pyspark.sql import Window

    top = scored.orderBy(F.desc("score_ppm"), F.asc("doc_id")).limit(_BM25_TOP_K)
    w = Window.orderBy(F.desc("score_ppm"), F.asc("doc_id"))
    return top.withColumn("rank", F.row_number().over(w).cast("long"))
