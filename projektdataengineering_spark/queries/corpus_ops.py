"""Round-3 corpus operators — the tokenizer-adjacent and
vector-hygiene steps of a training-data pipeline that rounds 1-2
didn't cover: prefix-window dedup, a bigram language model table,
BPE-style pair counting (merge round 1), temperature-scaled domain
mixture weights, and embedding norm filtering.

All five are oracle-checked — including the two FLOAT-reduction ops,
which use the engine's fold-order discipline: a non-associative IEEE
sum is only hash-stable if both engines fold in the SAME order, so
sums over arrays go through an explicit left fold (Spark
``F.aggregate`` ≡ DuckDB ``list_reduce``) over an explicitly ORDERED
array. Spark's fold seeds with 0.0 and DuckDB's with the first
element; ``0.0 + x == x`` bit-exactly for the non-negative terms
involved, so the two folds agree.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_documents_wide, load_table
from . import query


def _toked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, toks) over the width-corrected documents frame
    (catalog.load_documents_wide); sole consumer is
    pipeline_prefix_dedup's hash fan-out — the bigram family reads
    instances via _bigram_instances instead."""
    return load_documents_wide(spark, sf_dir).select(
        "doc_id", F.split("text", " ").alias("toks")
    )


# ---------------------------------------------------------------------------
# Prefix-window dedup (first-N-token fingerprint)
# ---------------------------------------------------------------------------

_PREFIX_TOKENS = 8

_PREFIX_SQL = f"""
    SELECT md5(array_to_string(toks[1:{_PREFIX_TOKENS}], ' ')) AS prefix_hash,
           MIN(doc_id) AS canonical_doc,
           COUNT(*) AS n_docs,
           COUNT(*) > 1 AS is_dup_group
    FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
    GROUP BY prefix_hash
"""


@query("pipeline_prefix_dedup", oracle=_PREFIX_SQL)
def pipeline_prefix_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup sweep keyed on the first-8-token window — the cheap
    prefix heuristic crawl pipelines run BEFORE MinHash (mirrors and
    templated pages share prefixes; catching them here avoids the
    shingle pass entirely). Canonical = min doc_id per prefix group,
    the same smallest-id convention as the full dedup family. Shuffle
    is digest-only (16-byte md5 + id); the text never moves."""
    t = _toked(spark, sf_dir)
    h = F.md5(F.concat_ws(" ", F.slice("toks", 1, _PREFIX_TOKENS)))
    return (
        t.select(F.col("doc_id"), h.alias("prefix_hash"))
        .groupBy("prefix_hash")
        .agg(
            F.min("doc_id").alias("canonical_doc"),
            F.count(F.lit(1)).alias("n_docs"),
            (F.count(F.lit(1)) > 1).alias("is_dup_group"),
        )
    )


# ---------------------------------------------------------------------------
# Bigram language-model table (top next-token per token, exact MLE)
# ---------------------------------------------------------------------------

_BIGRAM_LM_SQL = """
    WITH enc AS (
      SELECT doc_id, CAST(p.pos AS BIGINT) AS pos, t.toks[p.pos] AS token
      FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents) t,
           UNNEST(range(1, len(t.toks) + 1)) AS p(pos)
    ), pairs AS (
      SELECT e1.token AS w1, e2.token AS w2
      FROM enc e1 JOIN enc e2
        ON e2.doc_id = e1.doc_id AND e2.pos = e1.pos + 1
    ), pc AS (
      SELECT w1, w2, COUNT(*) AS pair_n FROM pairs GROUP BY w1, w2
    ), wc AS (
      SELECT w1, CAST(SUM(pair_n) AS BIGINT) AS w1_n FROM pc GROUP BY w1
    )
    SELECT pc.w1, wc.w1_n, pc.w2 AS top_w2, pc.pair_n,
           CAST(pc.pair_n AS DOUBLE) / CAST(wc.w1_n AS DOUBLE) AS prob
    FROM (
      SELECT w1, w2, pair_n,
             ROW_NUMBER() OVER (PARTITION BY w1
                                ORDER BY pair_n DESC, w2) AS rn
      FROM pc
    ) pc JOIN wc ON wc.w1 = pc.w1
    WHERE pc.rn = 1
"""


@query("pipeline_bigram_lm", oracle=_BIGRAM_LM_SQL)
def pipeline_bigram_lm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximum-likelihood bigram table — for every token, its most
    probable successor and the exact conditional probability
    count(w1,w2)/count(w1·) as ONE IEEE division of two exact integers.
    The n-gram-LM scoring asset quality filters (CCNet-style) build.
    Adjacent pairs are built MAP-SIDE by the indexed array lambda (the
    pipeline_bigram_kn / perplexity_filter kernel — round-12 port):
    the token array already carries adjacency, so the earlier
    positional self-join's extra (doc, pos, token) exchange bought
    nothing; now the only shuffles are the two vocab-sized aggregates,
    which share their w1 exchange. The doc_id repartition ahead of the
    fan-out is the round-11 input-split lesson (a small parquet's
    2-split width would otherwise cap the explode stage).
    The rank window runs on the (w1, w2) COUNT table, never raw pairs."""
    docs = load_documents_wide(spark, sf_dir)
    pairs = _bigram_instances(docs, with_doc_id=False)
    pc = pairs.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("pair_n"))
    wc = pc.groupBy("w1").agg(F.sum("pair_n").cast("bigint").alias("w1_n")).select(
        F.col("w1").alias("wc_w1"), "w1_n"
    )
    w = Window.partitionBy("w1").orderBy(F.col("pair_n").desc(), "w2")
    top = pc.select("w1", "w2", "pair_n", F.row_number().over(w).alias("rn")).filter(
        F.col("rn") == 1
    )
    return top.join(wc, top.w1 == F.col("wc_w1")).select(
        "w1",
        "w1_n",
        F.col("w2").alias("top_w2"),
        "pair_n",
        (F.col("pair_n").cast("double") / F.col("w1_n").cast("double")).alias("prob"),
    )


# ---------------------------------------------------------------------------
# BPE pair counting (merge round 1)
# ---------------------------------------------------------------------------

_BPE_TOP = 50

_BPE_SQL = f"""
    SELECT pair, n FROM (
      SELECT pair, COUNT(*) AS n,
             ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC, pair) AS rn
      FROM (
        SELECT unnest([substr(w, i, 2) for i in range(1, len(w))]) AS pair
        FROM (
          SELECT unnest(string_split(text, ' ')) AS w FROM documents
        )
        WHERE len(w) >= 2
      )
      GROUP BY pair
    ) WHERE rn <= {_BPE_TOP}
"""


@query("pipeline_bpe_pair_counts", oracle=_BPE_SQL)
def pipeline_bpe_pair_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The first merge round of BPE tokenizer training: count every
    adjacent character pair inside every token across the corpus and
    rank the top-50 merge candidates (count desc, pair asc — a total
    order, so the ranked set is deterministic). Pairs are extracted as
    substr(token, i, 2) over generated positions — identical byte
    semantics in both engines, no empty-separator split edge cases.
    Shape: map-side explode → one count shuffle on pair (vocab-bounded
    cardinality, tiny) → TakeOrdered for the global top-k (no single
    -partition sort). Iterating BPE = re-running this over re-segmented
    tokens with the previous round's merges applied."""
    # the doc table's input-split count would otherwise cap the pair
    # fan-out stage (2 splits at sf1 — the dedup_substring_spans
    # round-11 lesson); one round-robin repartition of the raw text
    # buys cluster-wide width for the explode+count below
    docs = (
        load_table(spark, sf_dir, "documents")
        .select("text")
        .repartition(spark.sparkContext.defaultParallelism)
    )
    w = docs.select(F.explode(F.split("text", " ")).alias("w")).filter(
        F.length("w") >= 2
    )
    pair = w.select(
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.length("w") - 1),
                lambda i: F.substr("w", i, F.lit(2)),
            )
        ).alias("pair")
    )
    counts = pair.groupBy("pair").agg(F.count(F.lit(1)).alias("n"))
    # top-k via orderBy+limit → TakeOrderedAndProject (per-partition
    # top-50 then a 50-row driver merge), never a single-partition
    # global rank window; (n desc, pair) is a total order so the
    # limit is deterministic
    return counts.orderBy(F.col("n").desc(), "pair").limit(_BPE_TOP)


# ---------------------------------------------------------------------------
# Temperature-scaled domain mixture weights
# ---------------------------------------------------------------------------

_TEMP_BUDGET = 200  # docs to admit across all languages

_TEMPERATURE_SQL = f"""
    WITH c AS (
      SELECT lang, COUNT(*) AS cnt FROM documents GROUP BY lang
    ), arr AS (
      SELECT list(sqrt(CAST(cnt AS DOUBLE)) ORDER BY lang) AS a FROM c
    ), tot AS (
      SELECT list_reduce(a, (p, q) -> p + q) AS t FROM arr
    )
    SELECT c.lang, c.cnt,
           sqrt(CAST(c.cnt AS DOUBLE)) / tot.t AS weight,
           CAST(FLOOR({_TEMP_BUDGET} * (sqrt(CAST(c.cnt AS DOUBLE)) / tot.t))
                AS BIGINT) AS quota
    FROM c, tot
"""


@query("pipeline_mixture_temperature", oracle=_TEMPERATURE_SQL)
def pipeline_mixture_temperature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled language sampling weights (τ=2, i.e.
    w ∝ count^(1/2)) — the standard multilingual-corpus rebalancing
    that upweights low-resource languages relative to proportional
    sampling. The denominator Σ√cntᵢ is a float sum, non-associative —
    so it is computed as an explicit LEFT FOLD over the language-sorted
    array on both engines (F.aggregate ≡ list_reduce; Spark's 0.0 seed
    is absorbed exactly by the first non-negative term), making weight
    and quota bit-stable. The fold input is K languages — O(100)
    scalars on the driver-free path; corpus size only enters through
    the grouped counts, one map-side-combined shuffle."""
    docs = load_table(spark, sf_dir, "documents").select("lang")
    c = docs.groupBy("lang").agg(F.count(F.lit(1)).alias("cnt"))
    arr = c.agg(
        F.sort_array(
            F.collect_list(F.struct(F.col("lang"), F.sqrt(F.col("cnt").cast("double")).alias("s")))
        ).alias("a")
    )
    tot = arr.select(
        F.aggregate(
            F.col("a"), F.lit(0.0), lambda acc, x: acc + x["s"]
        ).alias("t")
    )
    weight = F.sqrt(F.col("cnt").cast("double")) / F.col("t")
    return c.join(F.broadcast(tot)).select(
        "lang",
        "cnt",
        weight.alias("weight"),
        F.floor(F.lit(_TEMP_BUDGET) * weight).cast("bigint").alias("quota"),
    )


# ---------------------------------------------------------------------------
# Embedding norm filter (vector hygiene, oracle-checked)
# ---------------------------------------------------------------------------

_NORM_LO, _NORM_HI = 0.99, 1.01

_NORM_SQL = f"""
    SELECT vec_id, label, l2_norm,
           l2_norm >= {_NORM_LO} AND l2_norm <= {_NORM_HI} AS keep
    FROM (
      SELECT vec_id, label,
             sqrt(list_reduce(
               list_transform(embedding,
                              x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)),
               (p, q) -> p + q)) AS l2_norm
      FROM embeddings
    )
"""


@query("pipeline_embedding_norm_filter", oracle=_NORM_SQL)
def pipeline_embedding_norm_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L2-norm gate on the embedding column — the vector-hygiene step
    before any cosine pipeline (a zero or far-from-unit vector is a
    broken encoder output; cosine against it is noise). This is the
    rare VECTOR op that is fully oracle-checked: the squared-norm is a
    left fold over the array in index order on both engines (floats
    cast to double per element, fold order identical, 0.0 seed
    absorbed), so sqrt of it is bit-stable. Pure map-side array math —
    at 100 TB this runs at scan speed inside whole-stage codegen, no
    Python, no shuffle."""
    emb = load_table(spark, sf_dir, "embeddings")
    norm = F.sqrt(
        F.aggregate(
            F.col("embedding"),
            F.lit(0.0),
            lambda acc, x: acc + x.cast("double") * x.cast("double"),
        )
    )
    return emb.select(
        "vec_id",
        "label",
        norm.alias("l2_norm"),
        ((norm >= _NORM_LO) & (norm <= _NORM_HI)).alias("keep"),
    )


# ---------------------------------------------------------------------------
# Full BPE training loop (iterative merges over the word-type table)
# ---------------------------------------------------------------------------

_BPE_MERGES = 12
_END_TOK = "</w>"


def _bpe_oracle_sql(n_merges: int) -> str:
    """DuckDB replay of the FULL iterative BPE training loop, unrolled
    as chained MATERIALIZED CTEs (the graph_pagerank playbook applied
    to a string algorithm — round-8 graduation).

    Encoding trick that makes each merge pass one SQL ``replace``:
    every word's token list is wrapped as ``(t1)(t2)...`` so the merge
    pair (l, r) is the literal substring ``(l)(r)`` — parens delimit
    whole tokens (token alphabet is a-z + '</w>', no parens), so a
    pattern can never match across or inside token boundaries, and
    SQL replace's left-to-right non-overlapping scan IS the BPE apply
    step (a merged token is emitted into the output and never
    reconsidered within the pass — exactly the Spark-side F.aggregate
    fold's pend-clearing semantics). Integer counts + string merges
    only, so the hash needs no float discipline. MATERIALIZED is
    load-bearing: the scalar subqueries reference each m{{k}} several
    times and inlining would re-evaluate the whole chain
    exponentially."""
    selects = " UNION ALL ".join(
        f"SELECT * FROM m{k}" for k in range(1, n_merges + 1)
    )
    return f"""
    WITH {_bpe_cte_chain(n_merges)}
    SELECT CAST(rank AS INTEGER) AS rank, l AS "left", r AS "right",
           m AS merged, CAST(cnt AS BIGINT) AS pair_count
    FROM ({selects})
    """


def _bpe_cte_chain(n_merges: int) -> str:
    """The shared CTE body replaying the training loop: words → w0 …
    w{{n}} (the word-type table after every learned merge, with the
    word key ``w`` carried through so the encode oracle can join it
    back to documents) and m1 … m{{n}} (the learned merges)."""
    iters = []
    for k in range(1, n_merges + 1):
        iters.append(f"""
    p{k} AS MATERIALIZED (
      SELECT t[i] AS l, t[i+1] AS r, SUM(freq) AS cnt
      FROM (SELECT string_split(substring(s, 2, length(s) - 2), ')(') AS t,
                   freq
            FROM w{k - 1}) tok,
           UNNEST(range(1, len(t))) AS u(i)
      GROUP BY 1, 2
    ),
    m{k} AS MATERIALIZED (
      SELECT {k - 1} AS rank, l, r, l || r AS m, cnt
      FROM p{k} ORDER BY cnt DESC, l, r LIMIT 1
    ),
    w{k} AS MATERIALIZED (
      SELECT w, replace(s,
                     '(' || (SELECT l FROM m{k}) || ')('
                         || (SELECT r FROM m{k}) || ')',
                     '(' || (SELECT m FROM m{k}) || ')') AS s,
             freq
      FROM w{k - 1}
    )""")
    return f"""words AS MATERIALIZED (
      SELECT w, COUNT(*) AS freq FROM (
        SELECT unnest(string_split_regex(lower(text), '[^a-z]+')) AS w
        FROM documents
      ) WHERE w <> '' GROUP BY w
    ),
    w0 AS MATERIALIZED (
      SELECT w, regexp_replace(w, '(.)', '(\\1)', 'g') || '({_END_TOK})' AS s,
             freq
      FROM words
    ),{",".join(iters)}"""


# Single-task training guards: the merge loop runs on ONE executor
# task over the word-TYPE table. Types follow Heaps' law (~10^7 for a
# web-scale natural-language corpus), so the state is bounded by
# VOCABULARY, not corpus size — but a corpus of random strings would
# break that, so the task refuses loudly past these caps instead of
# OOMing an executor. The binding resource is NOT the row count but
# the exploded in-task state (each word becomes a Python list of
# single-char tokens: ~8 B/slot + ~160 B list+dict overhead per type),
# so the primary cap is the SUM OF WORD LENGTHS: 2^28 chars ≈ 2.1 GB
# of list slots, plus ≤20 M types ≈ 3 GB of per-type overhead — ~5-6 GB
# peak, inside a 16 GB executor with headroom. For natural language
# (mean type length ~8 chars) the char cap is the tighter one.
_BPE_MAX_TYPES = 20_000_000
_BPE_MAX_CHARS = 2**28


def _bpe_word_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The one corpus-sized step of tokenizer training: the
    distributed word-TYPE aggregation (word → corpus frequency).
    Everything after this operates on vocabulary-bounded state."""
    docs = load_table(spark, sf_dir, "documents").select("text")
    return (
        docs.select(F.explode(F.split(F.lower("text"), "[^a-z]+")).alias("w"))
        .filter(F.col("w") != "")
        .groupBy("w")
        .agg(F.count(F.lit(1)).cast("long").alias("freq"))
    )


def _bpe_merge_loop(vocab: dict, n_merges: int):
    """The textbook BPE merge loop over {word: [tokens, freq]} —
    count adjacent pairs weighted by type frequency, take the argmax
    (count DESC, then lexicographic (left, right) — ASCII tokens, so
    Python tuple order ≡ Spark/DuckDB UTF8 binary order), apply the
    merge left-to-right non-overlapping, repeat. Runs INSIDE one
    Spark task (see pipeline_bpe_train); returns (merges, vocab) with
    vocab fully merged."""
    from collections import Counter

    merges = []
    for rank in range(n_merges):
        counts: Counter = Counter()
        for toks, f in vocab.values():
            for a, b in zip(toks, toks[1:]):
                counts[(a, b)] += f
        if not counts:
            break
        (l, r), c = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((rank, l, r, l + r, c))
        for entry in vocab.values():
            toks = entry[0]
            if l not in toks:
                continue
            out, i, n = [], 0, len(toks)
            while i < n:
                if toks[i] == l and i + 1 < n and toks[i + 1] == r:
                    out.append(l + r)
                    i += 2
                else:
                    out.append(toks[i])
                    i += 1
            entry[0] = out
    return merges, vocab


def _bpe_vocab_from_batches(batches) -> dict:
    """Accumulate the (w, freq) arrow batches of the single training
    task into {word: [char_tokens + </w>, freq]}, enforcing the
    vocabulary guard."""
    vocab: dict = {}
    total_chars = 0
    for pdf in batches:
        if len(vocab) + len(pdf) > _BPE_MAX_TYPES:
            raise ValueError(
                f"BPE training refuses > {_BPE_MAX_TYPES} word types: "
                "the single-task merge loop is bounded by VOCABULARY "
                "size (Heaps' law), and this corpus exceeds it — raise "
                "_BPE_MAX_TYPES deliberately or pre-filter the type "
                "table (e.g. min-frequency threshold) first"
            )
        # the char cap is checked BEFORE exploding this batch into
        # per-char lists, so the guard fires while state is still the
        # compact Arrow strings, not after the memory is already spent
        total_chars += int(pdf["w"].str.len().sum() or 0)
        if total_chars > _BPE_MAX_CHARS:
            raise ValueError(
                f"BPE training refuses > {_BPE_MAX_CHARS} total type "
                "chars: the merge loop explodes every word type into a "
                "per-char token list (~8 B/slot), and this corpus's "
                "type table exceeds the single-task memory budget — "
                "pre-filter the type table (min-frequency threshold) "
                "or raise _BPE_MAX_CHARS deliberately"
            )
        for w, f in zip(pdf["w"].tolist(), pdf["freq"].tolist()):
            vocab[w] = [list(w) + [_END_TOK], int(f)]
    return vocab


@query(
    "pipeline_bpe_train", family="corpus_ops", oracle=_bpe_oracle_sql(_BPE_MERGES)
)
def pipeline_bpe_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL byte-pair-encoding training (not just round-1 pair counts
    — pipeline_bpe_pair_counts stops there): learn the first 12 merge
    rules from the corpus, the way a real tokenizer build does.

    Distributed shape — the SentencePiece/HF-tokenizers split: the one
    corpus-sized step (word-TYPE aggregation, word → frequency) is a
    distributed partial→final shuffle; the merge loop then runs as ONE
    vocabulary-bounded task (mapInPandas over the single-partition
    type table). An iterative global argmax is the one operator shape
    Spark genuinely can't express declaratively — rounds 6-11 ran it
    as 12 sequential 1-row argmax collects, which is semantically fine
    but costs 12 scheduler round-trips plus 12 pair-count shuffles
    over state that NEVER exceeds vocabulary size (~10⁷ types at
    100 TB, Heaps' law, ≪ one executor's memory). Moving the loop
    inside a single guarded task (refuses > _BPE_MAX_TYPES, loudly)
    makes the whole query one job with zero driver materialization —
    the r11 driver bench measured the old shape's serialism at 3.5×
    under host load (2.9 → 10.1 s on identical code).

    Hash-checked since round 8: the oracle (_bpe_oracle_sql) unrolls
    the 12 chained argmax+rewrite rounds as MATERIALIZED DuckDB CTEs,
    with the merge-apply expressed as a single string replace over
    paren-wrapped token lists — bit-exact integer/string output, no
    float discipline needed. tests/test_operators.py additionally pins
    the merge table against an independent pure-Python BPE reference
    on the same corpus."""

    def train(batches):
        import pandas as pd

        merges, _ = _bpe_merge_loop(_bpe_vocab_from_batches(batches), _BPE_MERGES)
        yield pd.DataFrame(
            merges, columns=["rank", "left", "right", "merged", "pair_count"]
        ).astype({"rank": "int32", "pair_count": "int64"})

    return _bpe_word_types(spark, sf_dir).repartition(1).mapInPandas(
        train, "rank int, left string, right string, merged string, pair_count long"
    )


@query(
    "pipeline_bpe_encode",
    family="corpus_ops",
    oracle=f"""
    WITH {_bpe_cte_chain(_BPE_MERGES)},
    enc AS (
      SELECT w,
             len(string_split(substring(s, 2, length(s) - 2), ')(')) AS n_tokens
      FROM w{_BPE_MERGES}
    ),
    docw AS (
      SELECT doc_id, w FROM (
        SELECT doc_id,
               unnest(string_split_regex(lower(text), '[^a-z]+')) AS w
        FROM documents
      ) WHERE w <> ''
    )
    SELECT doc_id,
           COUNT(*) AS n_words,
           CAST(SUM(n_tokens) AS BIGINT) AS n_bpe_tokens
    FROM docw JOIN enc USING (w)
    GROUP BY doc_id
    """,
)
def pipeline_bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE INFERENCE — the other half of the tokenizer loop
    (pipeline_bpe_train learns the merges; this applies them to the
    corpus): per-document word and BPE-token counts under the learned
    tokenizer, the number every sequence-packing / token-budget stage
    downstream actually consumes (contrast pipeline_token_budget's
    whitespace estimate).

    Encode-on-the-TYPE-table: merges are applied once per distinct
    WORD (the training loop's final word-type table already carries
    every word fully merged — zero extra merge work), and documents
    join their words against that ~vocabulary-sized table — at 100 TB
    the encode cost is corpus-explode + one hash join on word, never
    per-token Python. Hash-checked end-to-end: the oracle replays
    training AND encode (the w-carrying CTE chain + a token count per
    word + the same join), so a drift in any of the 12 learned merges,
    the merge-apply loop, or the join shape flips the per-doc counts
    and fails the hash. Training happens inside the same
    single-guarded-task shape as pipeline_bpe_train (one job, zero
    driver collects); this query's task emits the fully-merged
    (word → n_tokens) table, which then hash-joins the corpus."""

    def encode_types(batches):
        import pandas as pd

        _, vocab = _bpe_merge_loop(_bpe_vocab_from_batches(batches), _BPE_MERGES)
        yield pd.DataFrame(
            {
                "w": list(vocab.keys()),
                "n_tokens": [len(e[0]) for e in vocab.values()],
            }
        ).astype({"n_tokens": "int64"})

    per_word = (
        _bpe_word_types(spark, sf_dir)
        .repartition(1)
        .mapInPandas(encode_types, "w string, n_tokens long")
    )
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    docw = docs.select(
        "doc_id", F.explode(F.split(F.lower("text"), "[^a-z]+")).alias("w")
    ).filter(F.col("w") != "")
    return docw.join(per_word, "w").groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_words"),
        F.sum("n_tokens").alias("n_bpe_tokens"),
    )


# ---------------------------------------------------------------------------
# Perplexity filtering (round 9): CCNet-style LM quality scoring with
# integer-exact quarter-bit surprisal
# ---------------------------------------------------------------------------

_PPL_KEEP_QBITS = 24  # keep docs with mean surprisal <= 6.0 bits/bigram


def _bigram_model_qbits(inst: DataFrame) -> DataFrame:
    """(w1, w2, qbits) bigram LM table from a bigram-INSTANCE frame:
    qbits = floor(4·log2(w1_n / pair_n)), the exact quarter-bit
    surprisal computed with pure integer arithmetic (whole bits from
    bin() length, the quarter-bit remainder from exact fourth-power
    comparisons in DECIMAL(38,0) — see the _QBITS_SQL comment below
    for the derivation). Shared by pipeline_perplexity_filter (one
    corpus model) and pipeline_dsir_select (target + pool models).

    The pair-count table is lazily localCheckpoint'd: wc and the final
    join both derive from pc, so without the lineage cut the token
    explode + pair aggregate ran twice per model (r18 interleaved A/B:
    perplexity_filter 1.09 → 0.96 s, dsir_select 1.96 → 1.69 s
    warm-min at sf0.1 — guide §1.2/§5; pc is vocab²-bounded, so the
    materialization is small at any corpus scale)."""
    pc = (
        inst.groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("pair_n"))
        .localCheckpoint(eager=False)
    )
    wc = pc.groupBy("w1").agg(F.sum("pair_n").cast("bigint").alias("w1_n"))

    a = F.col("w1_n")
    whole = (F.length(F.bin(F.expr("w1_n div pair_n"))) - 1).cast("int")
    # F.shiftleft only takes a literal bit count; the SQL form accepts
    # a column expression
    y = F.expr("shiftleft(pair_n, length(bin(w1_n div pair_n)) - 1)")
    x4 = (
        a.cast("decimal(19,0)") * a.cast("decimal(19,0)")
        * a.cast("decimal(19,0)") * a.cast("decimal(19,0)")
    )
    y4 = (
        y.cast("decimal(19,0)") * y.cast("decimal(19,0)")
        * y.cast("decimal(19,0)") * y.cast("decimal(19,0)")
    )
    frac = (
        F.when(x4 >= 8 * y4, 3)
        .when(x4 >= 4 * y4, 2)
        .when(x4 >= 2 * y4, 1)
        .otherwise(0)
    )
    return pc.join(wc, "w1").select(
        "w1", "w2", (4 * whole + frac).cast("bigint").alias("qbits")
    )


def _bigram_instances(docs: DataFrame, with_doc_id: bool = True) -> DataFrame:
    """Map-side bigram INSTANCES from a (doc_id, text) frame via the
    indexed array lambda (no positional self-join) — the shared
    fan-out of the LM family. Caller repartitions upstream when the
    source is a narrow-split file."""
    keep = ["doc_id"] if with_doc_id else []
    toked = docs.select(*keep, F.split("text", " ").alias("toks"))
    return (
        toked.filter(F.size("toks") >= 2)
        .select(
            *keep,
            F.explode(
                F.expr(
                    "transform(slice(toks, 1, size(toks) - 1),"
                    " (x, i) -> struct(x AS w1, element_at(toks, i + 2) AS w2))"
                )
            ).alias("b"),
        )
        .select(*keep, "b.w1", "b.w2")
    )

# floor(4*log2(a/b)) for integers a >= b >= 1, no float log anywhere:
# whole bits w = length(bin(a DIV b)) - 1, then y = b << w normalizes
# a/y into [1, 2) and the quarter-bit remainder k solves
# (a/y)^4 >= 2^k by EXACT integer comparison — a,y <= ~1e6 so the
# fourth powers sit well inside DECIMAL(38,0)/HUGEINT.
# NB: explicit CAST + repeated multiplication, NOT the ** operator —
# DuckDB's ** returns DOUBLE (x**4 at ~1e24 rounds to 53 bits), while
# chained HUGEINT products stay exact like Spark's DECIMAL(38,0) side.
_QBITS_SQL = """
    (4 * (length(bin({a} // {b})) - 1)
     + CASE
         WHEN CAST({a} AS HUGEINT) * {a} * {a} * {a} >=
              8 * ((CAST({b} AS HUGEINT) << (length(bin({a} // {b})) - 1))
                   * (CAST({b} AS HUGEINT) << (length(bin({a} // {b})) - 1))
                   * (CAST({b} AS HUGEINT) << (length(bin({a} // {b})) - 1))
                   * (CAST({b} AS HUGEINT) << (length(bin({a} // {b})) - 1))) THEN 3
         WHEN CAST({a} AS HUGEINT) * {a} * {a} * {a} >=
              4 * ((CAST({b} AS HUGEINT) << (length(bin({a} // {b})) - 1))
                   * (CAST({b} AS HUGEINT) << (length(bin({a} // {b})) - 1))
                   * (CAST({b} AS HUGEINT) << (length(bin({a} // {b})) - 1))
                   * (CAST({b} AS HUGEINT) << (length(bin({a} // {b})) - 1))) THEN 2
         WHEN CAST({a} AS HUGEINT) * {a} * {a} * {a} >=
              2 * ((CAST({b} AS HUGEINT) << (length(bin({a} // {b})) - 1))
                   * (CAST({b} AS HUGEINT) << (length(bin({a} // {b})) - 1))
                   * (CAST({b} AS HUGEINT) << (length(bin({a} // {b})) - 1))
                   * (CAST({b} AS HUGEINT) << (length(bin({a} // {b})) - 1))) THEN 1
         ELSE 0
       END)
"""

_PPL_SQL = f"""
    WITH enc AS (
      SELECT doc_id, CAST(p.pos AS BIGINT) AS pos, t.toks[p.pos] AS token
      FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents) t,
           UNNEST(range(1, len(t.toks) + 1)) AS p(pos)
    ), inst AS (
      SELECT e1.doc_id, e1.token AS w1, e2.token AS w2
      FROM enc e1 JOIN enc e2
        ON e2.doc_id = e1.doc_id AND e2.pos = e1.pos + 1
    ), pc AS (
      SELECT w1, w2, COUNT(*) AS pair_n FROM inst GROUP BY w1, w2
    ), wc AS (
      SELECT w1, CAST(SUM(pair_n) AS BIGINT) AS w1_n FROM pc GROUP BY w1
    ), qb AS (
      SELECT pc.w1, pc.w2,
             {_QBITS_SQL.format(a="wc.w1_n", b="pc.pair_n")} AS qbits
      FROM pc JOIN wc ON wc.w1 = pc.w1
    ), scored AS (
      SELECT i.doc_id, COUNT(*) AS n_bigrams,
             CAST(SUM(q.qbits) AS BIGINT) AS surprisal_qbits
      FROM inst i JOIN qb q ON i.w1 = q.w1 AND i.w2 = q.w2
      GROUP BY i.doc_id
    )
    SELECT d.doc_id,
           CAST(COALESCE(s.n_bigrams, 0) AS BIGINT) AS n_bigrams,
           CAST(COALESCE(s.surprisal_qbits, 0) AS BIGINT) AS surprisal_qbits,
           CASE WHEN s.n_bigrams > 0
                THEN CAST(s.surprisal_qbits // s.n_bigrams AS BIGINT) END
             AS mean_qbits,
           CASE WHEN s.n_bigrams > 0
                THEN s.surprisal_qbits // s.n_bigrams <= {_PPL_KEEP_QBITS}
                ELSE FALSE END AS keep
    FROM (SELECT DISTINCT doc_id FROM documents) d
    LEFT JOIN scored s ON d.doc_id = s.doc_id
"""


@query("pipeline_perplexity_filter", oracle=_PPL_SQL)
def pipeline_perplexity_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style LM quality filtering, integer-exact: the corpus
    bigram LM (same counts as pipeline_bigram_lm) scores every
    document by total surprisal Σ −log₂ p(w2|w1) over its bigram
    instances, in QUARTER-BITS computed without any float log —
    floor(4·log2(w1_n/pair_n)) via whole-bits-from-bin(a DIV b) plus
    an exact fourth-power comparison for the fractional quarter-bits
    (see _QBITS_SQL; the pipeline_bm25_topk log2-floor discipline,
    refined to ¼-bit granularity). Docs with mean surprisal ≤
    {_PPL_KEEP_QBITS} quarter-bits (6 bits/bigram) are kept — the
    low-perplexity side, exactly how CCNet buckets a crawl against a
    reference LM. Every emitted number is an integer, so the oracle
    replays bit-for-bit with no boundary wobble by construction.

    Scale shape: the LM table is (vocab²)-sized, never corpus-sized —
    counts aggregate map-side before their single exchange; instance
    scoring is a broadcast-joinable lookup (qb is small) + one per-doc
    aggregate. At 100 TB the LM is trained once per corpus version and
    persisted (the _ivf_centroids pattern); scoring is one map-side
    join pass."""
    # doc_id repartition ahead of the token fan-out (the round-11
    # input-split lesson): the explode + positional self-join would
    # otherwise run at the doc table's split width (2 tasks at sf1),
    # and both self-join sides read the one exchange co-partitioned
    docs = load_documents_wide(spark, sf_dir)
    # bigram instances built MAP-SIDE by the indexed array lambda (the
    # shared _bigram_instances kernel) — the earlier positional
    # self-join shipped every (doc, pos, token) row through an extra
    # exchange to reassemble adjacency the array already had
    inst = _bigram_instances(docs)
    qb = _bigram_model_qbits(inst)
    scored = (
        inst.join(F.broadcast(qb), ["w1", "w2"])
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.sum("qbits").cast("bigint").alias("surprisal_qbits"),
        )
    )
    has = F.col("n_bigrams") > 0
    mean_q = F.expr("surprisal_qbits div n_bigrams")
    return (
        docs.select("doc_id")
        .join(scored, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_bigrams", F.lit(0)).cast("long").alias("n_bigrams"),
            F.coalesce("surprisal_qbits", F.lit(0))
            .cast("long")
            .alias("surprisal_qbits"),
            F.when(has, mean_q).cast("long").alias("mean_qbits"),
            F.when(has, mean_q <= _PPL_KEEP_QBITS)
            .otherwise(F.lit(False))
            .alias("keep"),
        )
    )


# ---------------------------------------------------------------------------
# pipeline_vocab_growth — Heaps'-law vocabulary-growth curve per source
# ---------------------------------------------------------------------------

_VOCAB_GROWTH_SQL = """
    WITH words AS (
      SELECT doc_id, source, CAST(i AS BIGINT) AS pos,
             string_split(text, ' ')[i] AS word
      FROM documents,
           UNNEST(generate_series(1, len(string_split(text, ' ')))) AS t(i)
    ), firsts AS (
      SELECT doc_id, source,
             CASE WHEN ROW_NUMBER() OVER (PARTITION BY source, word
                                          ORDER BY doc_id, pos) = 1
                  THEN 1 ELSE 0 END AS is_new
      FROM words
    ), per_doc AS (
      SELECT source, doc_id,
             CAST(COUNT(*) AS BIGINT) AS n_tokens,
             CAST(SUM(is_new) AS BIGINT) AS n_new
      FROM firsts GROUP BY source, doc_id
    )
    SELECT source,
           CAST(ROW_NUMBER() OVER (PARTITION BY source ORDER BY doc_id)
                AS BIGINT) AS doc_seq,
           CAST(SUM(n_tokens) OVER (PARTITION BY source ORDER BY doc_id)
                AS BIGINT) AS cum_tokens,
           CAST(SUM(n_new) OVER (PARTITION BY source ORDER BY doc_id)
                AS BIGINT) AS cum_vocab
    FROM per_doc
"""


@query("pipeline_vocab_growth", oracle=_VOCAB_GROWTH_SQL)
def pipeline_vocab_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heaps'-law vocabulary-growth curve: for each source, the running
    (cumulative tokens, cumulative distinct vocabulary) pair after each
    document in doc_id order — the corpus-health diagnostic that tells
    a data curator whether a source is still contributing new
    vocabulary or has gone stale/repetitive (the curve flattens).

    Distinct-so-far is NOT a windowed COUNT(DISTINCT) (neither engine
    supports one): each (source, word)'s FIRST occurrence — by
    (doc_id, position), a total order — contributes 1, and a running
    sum of first-occurrence counts per doc IS the cumulative vocabulary
    size. Exact, no sketch.

    Plan shape: explode → one exchange on (source, word) for the
    first-occurrence window → one partial→final aggregate per
    (source, doc) → one tiny window over the per-source doc spine. At
    100 TB the (source, word) key is the corpus vocabulary — the same
    cardinality the BPE trainer (pipeline_bpe_train) already shuffles;
    per-doc output is sources × docs, never token-sized.
    """
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "text"
    )
    words = docs.select(
        "doc_id",
        "source",
        F.posexplode(F.split(F.col("text"), " ")).alias("pos0", "word"),
    ).select(
        "doc_id", "source", (F.col("pos0") + 1).cast("long").alias("pos"), "word"
    )
    w_first = Window.partitionBy("source", "word").orderBy("doc_id", "pos")
    firsts = words.select(
        "doc_id",
        "source",
        F.when(F.row_number().over(w_first) == 1, 1).otherwise(0).alias("is_new"),
    )
    per_doc = firsts.groupBy("source", "doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_tokens"),
        F.sum("is_new").cast("long").alias("n_new"),
    )
    w_seq = Window.partitionBy("source").orderBy("doc_id")
    w_cum = w_seq.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return per_doc.select(
        "source",
        F.row_number().over(w_seq).cast("long").alias("doc_seq"),
        F.sum("n_tokens").over(w_cum).cast("long").alias("cum_tokens"),
        F.sum("n_new").over(w_cum).cast("long").alias("cum_vocab"),
    )


# ---------------------------------------------------------------------------
# Kneser-Ney smoothed bigram LM (round 11) — the classic n-gram smoother,
# exact-integer rational arithmetic so the scores replay bit-for-bit
# ---------------------------------------------------------------------------

_KN_MIN_C1 = 50  # well-observed histories only (output stability)
_KN_TOPK = 100

_KN_SQL = f"""
    WITH toks AS (
      SELECT doc_id, string_split(text, ' ') AS t FROM documents
    ), bg AS (
      SELECT u.b.w1 AS w1, u.b.w2 AS w2
      FROM toks, UNNEST(
        [struct_pack(w1 := t[i], w2 := t[i + 1])
         for i in range(1, len(t))]) AS u(b)
    ), pc AS (
      SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c12 FROM bg GROUP BY w1, w2
    ), hist AS (
      SELECT w1, CAST(SUM(c12) AS BIGINT) AS c1,
             CAST(COUNT(*) AS BIGINT) AS n1p_fwd
      FROM pc GROUP BY w1
    ), bwd AS (
      SELECT w2, CAST(COUNT(*) AS BIGINT) AS n1p_bwd FROM pc GROUP BY w2
    ), tt AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS bigram_types FROM pc
    )
    SELECT pc.w1, pc.w2, pc.c12, hist.c1, hist.n1p_fwd, bwd.n1p_bwd,
           CAST((CAST(GREATEST(4 * pc.c12 - 3, 0) AS HUGEINT) * bigram_types
                 + CAST(3 AS HUGEINT) * hist.n1p_fwd * bwd.n1p_bwd)
                * CAST(1000000000 AS HUGEINT)
                // (CAST(4 AS HUGEINT) * hist.c1 * bigram_types)
                AS BIGINT) AS kn_ppb
    FROM pc JOIN hist USING (w1) JOIN bwd USING (w2), tt
    WHERE hist.c1 >= {_KN_MIN_C1}
    ORDER BY kn_ppb DESC, w1, w2 LIMIT {_KN_TOPK}
"""


@query("pipeline_bigram_kn", oracle=_KN_SQL)
def pipeline_bigram_kn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interpolated Kneser-Ney bigram probabilities — THE classic
    n-gram smoother (Kneser & Ney 1995; Chen & Goodman 1998), the step
    past pipeline_bigram_lm's raw MLE that every n-gram quality/
    perplexity filter wants: P(w2|w1) = max(c12 − D, 0)/c1 +
    D·N1+(w1·)/c1 · N1+(·w2)/|bigram types|, with the continuation
    probability giving unseen-but-versatile successors their mass.

    Exactness: D = 3/4, so the whole expression is one rational with
    denominator 4·c1·T — the score ships as the exact integer
    floor(P·10⁹) computed with 128-bit integer arithmetic (Spark
    DECIMAL(38,0) `div` ≡ DuckDB HUGEINT `//`, verified equal on
    >2⁶⁴ numerators), so the hash certifies every smoothed
    probability bit-for-bit with zero float involvement.

    Scale shape: bigrams are built MAP-SIDE (indexed array transform —
    no positional self-join), then three count aggregates over the
    pair-TYPE table (≪ token count), one broadcast-able 1-row type
    count, and a distributed TakeOrdered {_KN_TOPK}. Only (token,
    token, counts) ever shuffles. The pair-type table is lazily
    localCheckpoint'd: hist, bwd, tt and the probe side all derive
    from pc, and without the lineage cut the token explode + pair
    aggregate subtree planned FOUR times (r18 plan audit: 4× Scan→
    Generate→HashAggregate branches; the interleaved A/B measured
    1.38 → 0.86 s warm-min at sf0.1 — guide §1.2 "don't compute
    things you throw away" / §5 reuse-vs-recompute)."""
    docs = load_documents_wide(spark, sf_dir)
    bg = _bigram_instances(docs, with_doc_id=False)
    pc = (
        bg.groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).cast("long").alias("c12"))
        .localCheckpoint(eager=False)
    )
    hist = pc.groupBy("w1").agg(
        F.sum("c12").cast("long").alias("c1"),
        F.count(F.lit(1)).cast("long").alias("n1p_fwd"),
    )
    bwd = pc.groupBy("w2").agg(
        F.count(F.lit(1)).cast("long").alias("n1p_bwd")
    )
    tt = pc.agg(F.count(F.lit(1)).cast("long").alias("bigram_types"))
    scored = (
        pc.join(hist, "w1")
        .join(bwd, "w2")
        .crossJoin(F.broadcast(tt))
        .filter(F.col("c1") >= _KN_MIN_C1)
        .select(
            "w1",
            "w2",
            "c12",
            "c1",
            "n1p_fwd",
            "n1p_bwd",
            F.expr(
                "(CAST(GREATEST(4 * c12 - 3, 0) AS DECIMAL(38,0))"
                " * bigram_types"
                " + CAST(3 AS DECIMAL(38,0)) * n1p_fwd * n1p_bwd)"
                " * CAST(1000000000 AS DECIMAL(38,0))"
                " div (CAST(4 AS DECIMAL(38,0)) * c1 * bigram_types)"
            ).cast("long").alias("kn_ppb"),
        )
    )
    return scored.orderBy(F.col("kn_ppb").desc(), "w1", "w2").limit(_KN_TOPK)


# ---------------------------------------------------------------------------
# pipeline_dsir_select (round 12): DSIR-style importance selection in
# exact quarter-bit integer log-space
# ---------------------------------------------------------------------------

_DSIR_TOPK = 100
# surprisal charged to a bigram ABSENT from the target model:
# 96 qbits = 24 bits ≈ P = 2⁻²⁴ — one notch below anything the target
# model can assign (parent counts here are ≪ 2²⁴), so unseen-in-target
# always reads as less target-like than any seen bigram
_DSIR_UNSEEN_QBITS = 96

_DSIR_SQL = f"""
    WITH pool_inst AS (
      SELECT doc_id, toks[i] AS w1, toks[i + 1] AS w2
      FROM (SELECT doc_id, string_split(text, ' ') AS toks
            FROM documents WHERE source <> 'src0'),
           UNNEST(range(1, len(toks))) AS p(i)
    ), tgt_inst AS (
      SELECT toks[i] AS w1, toks[i + 1] AS w2
      FROM (SELECT string_split(text, ' ') AS toks
            FROM documents WHERE source = 'src0'),
           UNNEST(range(1, len(toks))) AS p(i)
    ), spc AS (
      SELECT w1, w2, COUNT(*) AS pair_n FROM pool_inst GROUP BY w1, w2
    ), swc AS (
      SELECT w1, CAST(SUM(pair_n) AS BIGINT) AS w1_n FROM spc GROUP BY w1
    ), sqb AS (
      SELECT pc.w1, pc.w2,
             {_QBITS_SQL.format(a="wc.w1_n", b="pc.pair_n")} AS qbits
      FROM spc pc JOIN swc wc ON wc.w1 = pc.w1
    ), tpc AS (
      SELECT w1, w2, COUNT(*) AS pair_n FROM tgt_inst GROUP BY w1, w2
    ), twc AS (
      SELECT w1, CAST(SUM(pair_n) AS BIGINT) AS w1_n FROM tpc GROUP BY w1
    ), tqb AS (
      SELECT pc.w1, pc.w2,
             {_QBITS_SQL.format(a="wc.w1_n", b="pc.pair_n")} AS qbits
      FROM tpc pc JOIN twc wc ON wc.w1 = pc.w1
    ), scored AS (
      SELECT i.doc_id, COUNT(*) AS n_bigrams,
             CAST(SUM(s.qbits - COALESCE(t.qbits, {_DSIR_UNSEEN_QBITS}))
                  AS BIGINT) AS logw_qbits
      FROM pool_inst i
      JOIN sqb s ON i.w1 = s.w1 AND i.w2 = s.w2
      LEFT JOIN tqb t ON i.w1 = t.w1 AND i.w2 = t.w2
      GROUP BY i.doc_id
    ), ranked AS (
      SELECT d.doc_id,
             CAST(COALESCE(s.n_bigrams, 0) AS BIGINT) AS n_bigrams,
             CAST(COALESCE(s.logw_qbits, 0) AS BIGINT) AS logw_qbits,
             ROW_NUMBER() OVER (ORDER BY COALESCE(s.logw_qbits, 0) DESC,
                                d.doc_id) AS rn
      FROM (SELECT doc_id FROM documents WHERE source <> 'src0') d
      LEFT JOIN scored s ON d.doc_id = s.doc_id
    )
    SELECT doc_id, n_bigrams, logw_qbits, rn <= {_DSIR_TOPK} AS selected
    FROM ranked
"""


@query("pipeline_dsir_select", oracle=_DSIR_SQL)
def pipeline_dsir_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR-style data selection (Xie et al. 2023, Data Selection via
    Importance Resampling — the public method behind domain-targeted
    pretraining mixes): score every candidate document by the
    log importance weight log[p_target(x)/p_source(x)] under two
    bigram LMs — the held-out domain corpus ('src0', the
    pipeline_contamination convention) as target, the candidate pool
    itself as source — and select the top-{K}. log w = Σ over the
    doc's bigram instances of (source surprisal − target surprisal),
    computed ENTIRELY in exact quarter-bit integers (the
    pipeline_perplexity_filter kernel, shared via
    _bigram_model_qbits), with unseen-in-target charged a flat
    96-qbit (2⁻²⁴) surprisal — so the hash certifies every score and
    the exact selection frontier bit-for-bit; DSIR's Gumbel-noise
    resampling step is deliberately replaced by deterministic top-K
    (seeded noise adds nothing certifiable at fixture scale and the
    ranking is the substance).

    Scale shape: two map-side bigram fan-outs (instances lazily
    checkpointed — they feed both the model build and the scoring
    join), two vocab²-bounded qbits tables broadcast back, one
    doc-keyed aggregate, and a TakeOrdered top-K for the selection
    frontier (no global sort materializes; at 100 TB the frontier
    becomes a quantile threshold on logw, same integer domain)."""
    docs = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", "source", "text")
        .repartition(spark.sparkContext.defaultParallelism, "doc_id")
    )
    pool_inst = _bigram_instances(
        docs.filter(F.col("source") != "src0")
    ).localCheckpoint(eager=False)
    tgt_inst = _bigram_instances(
        docs.filter(F.col("source") == "src0"), with_doc_id=False
    )
    sqb = _bigram_model_qbits(pool_inst)
    tqb = _bigram_model_qbits(tgt_inst).withColumnRenamed("qbits", "t_qbits")
    scored = (
        pool_inst.join(F.broadcast(sqb), ["w1", "w2"])
        .join(F.broadcast(tqb), ["w1", "w2"], "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_bigrams"),
            F.sum(
                F.col("qbits")
                - F.coalesce(F.col("t_qbits"), F.lit(_DSIR_UNSEEN_QBITS))
            ).cast("long").alias("logw_qbits"),
        )
    )
    full = (
        docs.filter(F.col("source") != "src0")
        .select("doc_id")
        .join(scored, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_bigrams", F.lit(0)).cast("long").alias("n_bigrams"),
            F.coalesce("logw_qbits", F.lit(0)).cast("long").alias("logw_qbits"),
        )
        .localCheckpoint(eager=False)
    )
    topk = (
        full.orderBy(F.desc("logw_qbits"), F.asc("doc_id"))
        .limit(_DSIR_TOPK)
        .select("doc_id", F.lit(True).alias("sel"))
    )
    return full.join(topk, "doc_id", "left").select(
        "doc_id",
        "n_bigrams",
        "logw_qbits",
        F.coalesce("sel", F.lit(False)).alias("selected"),
    )
