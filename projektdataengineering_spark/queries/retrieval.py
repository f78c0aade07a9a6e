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

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from . import query

_BM25_N_TERMS = 4   # deterministic derived query: the 4 most mid-band terms
_BM25_TOP_K = 50


# Shared CTE body: documents → integer BM25 scores, ending in a
# `scored(doc_id, score)` relation both registered oracles build on.
_BM25_CTE = f"""
    base AS (
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
"""

_BM25_SQL = f"""
    WITH {_BM25_CTE}
    SELECT doc_id, CAST(score AS BIGINT) AS score_ppm,
           CAST(ROW_NUMBER() OVER (ORDER BY score DESC, doc_id) AS BIGINT)
             AS rank
    FROM scored ORDER BY score DESC, doc_id LIMIT {_BM25_TOP_K}
"""


def _bm25_scored(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, score_ppm) — the Spark twin of the _BM25_CTE `scored`
    relation; see pipeline_bm25_topk for the construction notes."""
    # doc_id repartition ahead of the token fan-out (the round-11
    # input-split lesson, applied round 12): the tf explode + per-doc
    # scoring otherwise run at the documents parquet's 2-split width
    # at sf1 — the retrieval family's 0.62-0.66 SCALING slopes were
    # that artifact (measured: bm25 sf1 3.7→2.8 s, hybrid 5.6→2.9 s)
    from ..catalog import load_documents_wide

    # ONE tokenize pass (r18, guide §1.2/§2.2): the per-doc TF table is
    # the sufficient statistic for everything downstream — dl = Σtf per
    # doc (== size(split) on non-null text), df = row count per token
    # (tokc is distinct per (doc, token), so no countDistinct over the
    # raw token stream), tf = the filtered rows themselves.  Before,
    # the corpus was split/exploded FOUR times per call (stats collect,
    # df aggregate, tf aggregate, dl join).  The lazy localCheckpoint
    # cuts the lineage so the stats collect, the term pick and the
    # final job all read the materialized TF table; its size is
    # Σ per-doc distinct terms ≪ token instances, and the first
    # exchange it absorbs carries map-side-partial (doc, token)
    # aggregates, never the exploded stream.
    tokc = (
        load_documents_wide(spark, sf_dir)
        .select("doc_id", F.explode(F.split("text", " ")).alias("token"))
        .groupBy("doc_id", "token")
        .agg(F.count(F.lit(1)).alias("tf"))
        .localCheckpoint(eager=False)
    )
    dld = tokc.groupBy("doc_id").agg(F.sum("tf").cast("bigint").alias("dl"))
    s = dld.agg(
        F.count(F.lit(1)).alias("n"), F.sum("dl").alias("total")
    ).collect()[0]
    n, total = int(s["n"]), int(s["total"])

    dfreq = tokc.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
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

    tf = tokc.filter(F.col("token").isin(list(terms)))
    idf_map = F.create_map(
        *[x for t, b in idf_bits.items() for x in (F.lit(t), F.lit(b))]
    )
    term_ppm = F.expr(
        f"(22 * tf * {total} * 1000000) div "
        f"(10 * tf * {total} + 3 * {total} + 9 * dl * {n})"
    )
    return (
        tf.join(dld, "doc_id")
        .withColumn("contrib", idf_map[F.col("token")] * term_ppm)
        .groupBy("doc_id")
        .agg(F.sum("contrib").cast("long").alias("score_ppm"))
    )


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
    scored = _bm25_scored(spark, sf_dir)
    from pyspark.sql import Window

    top = scored.orderBy(F.desc("score_ppm"), F.asc("doc_id")).limit(_BM25_TOP_K)
    w = Window.orderBy(F.desc("score_ppm"), F.asc("doc_id"))
    return top.withColumn("rank", F.row_number().over(w).cast("long"))


# ---------------------------------------------------------------------------
# Hybrid retrieval: BM25 → pseudo-relevance-feedback dense re-rank → RRF
# ---------------------------------------------------------------------------

_PRF_SEEDS = 5      # BM25 top-k whose embedding mean is the dense query
_HYBRID_POOL = 50   # per-ranking candidate pool entering the fusion
_HYBRID_TOP = 20
_HYBRID_RRF_K = 60
_HYBRID_RRF_SCALE = 10**12

_HYBRID_SQL = f"""
    WITH {_BM25_CTE},
    lex AS (
      SELECT doc_id, CAST(ROW_NUMBER() OVER (ORDER BY score DESC, doc_id)
                          AS BIGINT) AS rank_lex
      FROM scored ORDER BY score DESC, doc_id LIMIT {_HYBRID_POOL}
    ),
    seedvecs AS (
      SELECT e.vec_id, list_transform(e.embedding, x -> CAST(x AS DOUBLE)) AS v
      FROM embeddings e
      JOIN (SELECT doc_id FROM lex WHERE rank_lex <= {_PRF_SEEDS}) s
        ON e.vec_id = s.doc_id
    ),
    cent AS (
      SELECT r.j AS j,
             list_reduce(list_prepend(0.0, list(sv.v[r.j] ORDER BY sv.vec_id)),
                         (a, b) -> a + b) / {float(_PRF_SEEDS)} AS c
      FROM seedvecs sv, range(1, 65) r(j) GROUP BY r.j
    ),
    centv AS (SELECT list(c ORDER BY j) AS cv FROM cent),
    dense AS (
      SELECT vec_id AS doc_id,
             list_reduce(
               list_transform(range(1, 65),
                              i -> CAST(embedding[i] AS DOUBLE) * cv[i]),
               (p, q) -> p + q)
             / (sqrt(list_reduce(
                  list_transform(embedding,
                                 x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)),
                  (p, q) -> p + q))
                * sqrt(list_reduce(list_transform(cv, x -> x * x),
                                   (p, q) -> p + q))) AS cos_c
      FROM embeddings, centv
    ),
    denser AS (
      SELECT doc_id, CAST(ROW_NUMBER() OVER (ORDER BY cos_c DESC, doc_id)
                          AS BIGINT) AS rank_dense
      FROM dense ORDER BY cos_c DESC, doc_id LIMIT {_HYBRID_POOL}
    ),
    fused AS (
      SELECT COALESCE(l.doc_id, d.doc_id) AS doc_id,
             l.rank_lex, d.rank_dense,
             COALESCE({_HYBRID_RRF_SCALE} // ({_HYBRID_RRF_K} + l.rank_lex), 0)
               + COALESCE({_HYBRID_RRF_SCALE} // ({_HYBRID_RRF_K} + d.rank_dense), 0)
               AS rrf_num
      FROM lex l FULL OUTER JOIN denser d ON l.doc_id = d.doc_id
    )
    SELECT doc_id, rank_lex, rank_dense, CAST(rrf_num AS BIGINT) AS rrf_num,
           CAST(ROW_NUMBER() OVER (ORDER BY rrf_num DESC, doc_id) AS BIGINT)
             AS fused_rank
    FROM fused ORDER BY rrf_num DESC, doc_id LIMIT {_HYBRID_TOP}
"""


@query("pipeline_hybrid_retrieval", oracle=_HYBRID_SQL)
def pipeline_hybrid_retrieval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid lexical+dense retrieval with pseudo-relevance feedback —
    the full modern RAG ranking stack as one certified query:

    1. BM25 ranks the corpus for the derived query (integer-exact, see
       pipeline_bm25_topk); top {_HYBRID_POOL} form the lexical list.
    2. PRF: the embedding mean of the lexical top {_PRF_SEEDS} becomes
       the DENSE query vector (classic Rocchio-style feedback — no
       query embedding model needed), and every document is re-ranked
       by cosine to it; top {_HYBRID_POOL} form the dense list.
    3. Reciprocal-rank fusion on integer rank reciprocals (the
       pipeline_rank_fusion discipline) merges the two lists; a doc
       missing from one list contributes 0 from it.

    Float discipline: the centroid is a per-dimension LEFT FOLD over
    the seed vectors in doc_id order (python loop ≡ DuckDB list_reduce
    over an ORDER BY list, both starting from 0.0) divided by
    {_PRF_SEEDS}.0, and every cosine is the bit-stable fold pattern
    proven by sim_cosine_exact_pairs — so the dense RANKING (float
    sort order!) matches the oracle exactly, and the fused output is
    integer math over it.

    Scale shape: two distributed TakeOrdered pools, a {_PRF_SEEDS}-row
    collect for the centroid (HWM scalar pattern), one map-side cosine
    pass with the centroid as plan literals (no join, no shuffle), and
    a {_HYBRID_POOL}-row broadcast fusion. Per-query cost at 100 TB is
    the BM25 postings + one embedding scan — the scan is the part a
    production deployment replaces with the persisted IVF index
    (sim_cosine_ivf_reuse) probing around the centroid."""
    from pyspark.sql import Window

    scored = _bm25_scored(spark, sf_dir)
    wl = Window.orderBy(F.desc("score_ppm"), F.asc("doc_id"))
    # 50-row lexical list, lazily localCheckpoint'd (r18, guide §1.2):
    # the seed collect AND the final fusion both consume it, so without
    # the lineage cut the whole BM25 chain computed twice per call
    lex = (
        scored.orderBy(F.desc("score_ppm"), F.asc("doc_id"))
        .limit(_HYBRID_POOL)
        .withColumn("rank_lex", F.row_number().over(wl).cast("long"))
        .select("doc_id", "rank_lex")
        .localCheckpoint(eager=False)
    )

    emb = load_table(spark, sf_dir, "embeddings")
    seed_ids = [
        r["doc_id"]
        for r in lex.filter(F.col("rank_lex") <= _PRF_SEEDS).collect()
    ]
    seeds = (
        emb.filter(F.col("vec_id").isin(seed_ids))
        .orderBy("vec_id")
        .select("embedding")
        .collect()
    )
    if not seeds:
        raise ValueError(
            "pipeline_hybrid_retrieval: no seed embeddings — the corpus "
            "has no BM25-scored documents with vectors; PRF needs a "
            "non-empty lexical top-k"
        )
    dim = len(seeds[0]["embedding"])
    cent = []
    for j in range(dim):
        acc = 0.0
        for r in seeds:  # left fold in doc_id order == oracle's list_reduce
            acc += float(r["embedding"][j])
        cent.append(acc / float(_PRF_SEEDS))
    nrm_c_sq = cent[0] * cent[0]
    for j in range(1, dim):  # left fold, matching the no-seed SQL reduce
        nrm_c_sq += cent[j] * cent[j]
    import math

    nrm_c = math.sqrt(nrm_c_sq)

    # Arrow-vectorized cosine-to-centroid (r18, guide §4.2): same IEEE
    # left-fold order as the zip_with/aggregate expressions it replaced
    # (one add/mul per dimension, accumulators walk dims in order;
    # np.sqrt and the final division are correctly-rounded IEEE), but
    # vectorized across rows instead of interpreted per row — the
    # corpus-wide map pass is the hybrid query's dense-leg cost at any
    # scale.  Bit-identical ranking proven vs the expression form at
    # sf0.001/0.01/0.1 before the swap (same discipline as
    # similarity._cos_fold_col).
    cent_arr = np.array(cent, dtype=np.float64)

    @F.pandas_udf("double")
    def _cos_c(e: pd.Series) -> pd.Series:
        if len(e) == 0:
            return pd.Series([], dtype="float64")
        m = np.stack([np.asarray(v, dtype=np.float64) for v in e])
        k = len(e)
        dot = np.zeros(k)
        nv = np.zeros(k)
        for j in range(m.shape[1]):
            x = m[:, j]
            dot = dot + x * cent_arr[j]
            nv = nv + x * x
        return pd.Series(dot / (np.sqrt(nv) * nrm_c))

    wd = Window.orderBy(F.desc("cos_c"), F.asc("doc_id"))
    dense = (
        emb.select(
            F.col("vec_id").alias("doc_id"),
            _cos_c(F.col("embedding")).alias("cos_c"),
        )
        .orderBy(F.desc("cos_c"), F.asc("doc_id"))
        .limit(_HYBRID_POOL)
        .withColumn("rank_dense", F.row_number().over(wd).cast("long"))
        .select("doc_id", "rank_dense")
    )

    rrf = F.coalesce(
        F.expr(f"{_HYBRID_RRF_SCALE} div ({_HYBRID_RRF_K} + rank_lex)"), F.lit(0)
    ) + F.coalesce(
        F.expr(f"{_HYBRID_RRF_SCALE} div ({_HYBRID_RRF_K} + rank_dense)"),
        F.lit(0),
    )
    fused = lex.join(dense, "doc_id", "full_outer").select(
        "doc_id", "rank_lex", "rank_dense", rrf.cast("long").alias("rrf_num")
    )
    wf = Window.orderBy(F.desc("rrf_num"), F.asc("doc_id"))
    return (
        fused.orderBy(F.desc("rrf_num"), F.asc("doc_id"))
        .limit(_HYBRID_TOP)
        .withColumn("fused_rank", F.row_number().over(wf).cast("long"))
    )
