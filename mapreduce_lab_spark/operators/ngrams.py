"""N-gram language-model counts over the document corpus.

Superset surface for the LLM-data side: corpus n-gram statistics are
the building block of KenLM-style models, contamination n-gram
checks, and quality heuristics. The reference's word count
(``plugin/word_count/wc.go:21-34``) is the unigram special case.

``bigram_top_counts``: global top-k word bigrams with counts and the
conditional probability P(w2 | w1) in exact fixed-point.

Scale shape: bigram generation is a per-document array transform
(narrow, codegen-friendly, no Python); the count aggregation is
map-side combinable so the shuffle carries (bigram, partial-count).
The conditional probability needs the unigram total of the LEFT word
— computed by a second aggregation over the same bigram counts
(sum over w2), joined back on w1: dimension-sized against the bigram
table, hash join on the natural key. Top-k is a TakeOrdered over
aggregated counts, never a global row sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mapreduce_lab_spark.functions.numeric import exact_ratio, oracle_exact_ratio
from mapreduce_lab_spark.registry import query
from mapreduce_lab_spark.sources.tables import fan_out, load_table

NGRAM_TOP_K = 30

_ORACLE_TOKENS = (
    "[t for t in regexp_split_to_array(lower(text), '[^\\p{L}]+') if t <> '']"
)


def _lower_tokens() -> F.Column:
    """Lowercased word tokens of ``text`` — stage this as a column
    before consuming it repeatedly: it is lambda-bearing, so codegen
    subexpression elimination skips it and every reference re-runs
    split+filter per row (the r13 staging sweep, see
    OPTIMIZATION_r13.md)."""
    return F.filter(
        F.split(F.lower(F.col("text")), r"[^\p{L}]+"), lambda t: t != F.lit("")
    )


def _bigrams(toks: F.Column) -> F.Column:
    """Adjacent-word bigrams over a PRE-STAGED token-array column."""
    idx = F.sequence(F.lit(1), F.size(toks) - 1)
    return F.transform(
        idx,
        lambda i: F.concat_ws(" ", F.element_at(toks, i), F.element_at(toks, i + 1)),
    )


def bigram_counts(docs: DataFrame) -> DataFrame:
    # explode_outer + post-Generate null filter: see bigram_pmi_top —
    # a size() pre-filter (or plain explode's inferred one) sinks the
    # bigram construction below the fan_out exchange onto the scan.
    counts = (
        docs.select(_lower_tokens().alias("_lt"))
        .select(F.explode_outer(_bigrams(F.col("_lt"))).alias("bigram"))
        .where(F.col("bigram").isNotNull())
        .groupBy("bigram")
        .agg(F.count("*").alias("n"))
        .withColumn("w1", F.split("bigram", " ").getItem(0))
    )
    lefts = counts.groupBy("w1").agg(F.sum("n").alias("n_left"))
    return (
        counts.join(lefts, "w1")
        .select(
            "bigram",
            "n",
            exact_ratio(F.col("n"), F.col("n_left")).alias("p_next"),
        )
        .orderBy(F.col("n").desc(), F.col("bigram").asc())
        .limit(NGRAM_TOP_K)
    )


@query(
    "bigram_top_counts",
    oracle=f"""
    WITH toks AS (
        SELECT {_ORACLE_TOKENS} AS ts FROM documents
    ),
    bigrams AS (
        SELECT unnest(list_transform(generate_series(1, len(ts) - 1),
                                     i -> ts[i] || ' ' || ts[i + 1])) AS bigram
        FROM toks WHERE len(ts) >= 2
    ),
    counts AS (
        SELECT bigram, count(*) AS n,
               string_split(bigram, ' ')[1] AS w1
        FROM bigrams GROUP BY bigram
    ),
    lefts AS (
        SELECT w1, CAST(sum(n) AS BIGINT) AS n_left FROM counts GROUP BY w1
    )
    SELECT bigram, n, {oracle_exact_ratio("n", "n_left")} AS p_next
    FROM counts JOIN lefts USING (w1)
    ORDER BY n DESC, bigram ASC
    LIMIT {NGRAM_TOP_K}
    """,
)
def q_bigram_top_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    return bigram_counts(fan_out(load_table(spark, sf_dir, "documents"), spark))


# --- rare-bigram rate (LM-free perplexity proxy) ---------------------------

RARE_BIGRAM_MAX_COUNT = 2  # a bigram seen <= this many times is "rare"


def rare_bigram_rate(docs: DataFrame) -> DataFrame:
    """Per-document fraction of bigram positions whose bigram is rare
    corpus-wide (count <= RARE_BIGRAM_MAX_COUNT).

    The LM-free stand-in for a perplexity filter: documents whose
    word-pair distribution diverges from the corpus (garbled text,
    boilerplate soup, wrong language) score high without evaluating
    any model — and with zero transcendental functions, so the score
    is exact integers until one floor-division (cross-engine
    bit-stable, unlike an actual log-prob).

    Scale shape: the same inverted-index discipline as
    dup_span_fraction — bigrams reduce to 32-bit hashes, one
    map-side-combinable count per hash, one equi-join back. At 100 TB
    the bigram-count table is the persisted corpus-statistics
    artifact every downstream scoring pass reuses.
    """
    from mapreduce_lab_spark.functions.hashing import hex8_int

    # explode_outer: a plain explode's inferred size()>0 filter sinks
    # the bigram construction below the fan_out exchange (see
    # bigram_pmi_top); with two consumers of `pos` the waste doubles.
    pos = (
        docs.select("doc_id", _lower_tokens().alias("_lt"))
        .select("doc_id", F.explode_outer(_bigrams(F.col("_lt"))).alias("bg"))
        .where(F.col("bg").isNotNull())
        .select("doc_id", hex8_int(F.col("bg")).alias("g"))
    )
    counts = pos.groupBy("g").agg(F.count("*").alias("n_g"))
    return (
        pos.join(counts, "g")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_bigrams"),
            F.sum(
                F.when(F.col("n_g") <= RARE_BIGRAM_MAX_COUNT, 1).otherwise(0)
            ).alias("n_rare"),
        )
        .select(
            "doc_id",
            "n_bigrams",
            "n_rare",
            exact_ratio(F.col("n_rare"), F.col("n_bigrams")).alias("rare_rate"),
        )
    )


@query(
    "rare_bigram_rate",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, {_ORACLE_TOKENS} AS ts FROM documents
    ),
    pos AS (
        SELECT doc_id,
               ('0x' || substr(md5(bg), 1, 8))::BIGINT AS g
        FROM (
            SELECT doc_id,
                   unnest(list_transform(generate_series(1, len(ts) - 1),
                                         i -> ts[i] || ' ' || ts[i + 1])) AS bg
            FROM toks WHERE len(ts) >= 2
        )
    ),
    counts AS (SELECT g, count(*) AS n_g FROM pos GROUP BY g)
    SELECT doc_id, count(*) AS n_bigrams,
           CAST(sum(CASE WHEN n_g <= {RARE_BIGRAM_MAX_COUNT} THEN 1 ELSE 0 END)
                AS BIGINT) AS n_rare,
           {oracle_exact_ratio(
               f"sum(CASE WHEN n_g <= {RARE_BIGRAM_MAX_COUNT} THEN 1 ELSE 0 END)",
               "count(*)",
           )} AS rare_rate
    FROM pos JOIN counts USING (g)
    GROUP BY doc_id
    """,
)
def q_rare_bigram_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    return rare_bigram_rate(fan_out(load_table(spark, sf_dir, "documents"), spark))


# --- PMI collocations ------------------------------------------------------

PMI_MIN_COUNT = 5
PMI_TOP_K = 30


def bigram_pmi_top(docs: DataFrame) -> DataFrame:
    """Top collocations by pointwise mutual information, transcendental-
    free: the score is the exact-integer lift ratio
    ``n_tokens * c(w1 w2) / (c(w1) * c(w2))`` in permille (PMI is its
    log — monotone, so the RANKING is identical and stays bit-stable
    cross-engine, the same rational-scoring discipline as BM25).

    Scale shape: one token pass feeds both the unigram and bigram
    counts (map-side combinable); the unigram frame joins the bigram
    frame on each word — hash joins on the natural keys, vocabulary-
    sized. The min-count filter runs BEFORE the joins, bounding the
    candidate set the way the query-term filter bounds BM25 postings.
    int64 envelope: c(w1 w2) * n_tokens must fit 2^63 (fine to ~1e9
    bigram count x 1e9 tokens; past that, the DECIMAL(38,0) wide path).
    """
    # explode_OUTER + post-Generate null filter, not plain explode or
    # a size()>0 pre-filter: either of those puts the full array
    # construction into a pushable predicate that Catalyst sinks below
    # the fan_out exchange, re-evaluating tokenization at the scan's
    # own (single-split) parallelism (see benchmark_overlap — the same
    # fix took this query 8.1 s -> 1.5 s warm at sf0.1/local[32]).
    toks = docs.select(
        F.explode_outer(
            F.filter(
                F.split(F.lower(F.col("text")), r"[^\p{L}]+"),
                lambda t: t != F.lit(""),
            )
        ).alias("word")
    ).where(F.col("word").isNotNull())
    uni = toks.groupBy("word").agg(F.count("*").alias("c_w"))
    total = toks.agg(F.count("*").alias("_n_tokens"))
    bi = (
        docs.select(_lower_tokens().alias("_lt"))
        .select(F.explode_outer(_bigrams(F.col("_lt"))).alias("bigram"))
        .where(F.col("bigram").isNotNull())
        .groupBy("bigram")
        .agg(F.count("*").alias("n"))
        .where(F.col("n") >= PMI_MIN_COUNT)
        .withColumn("w1", F.split("bigram", " ").getItem(0))
        .withColumn("w2", F.split("bigram", " ").getItem(1))
    )
    return (
        bi.join(uni.withColumnRenamed("word", "w1").withColumnRenamed("c_w", "c1"), "w1")
        .join(uni.withColumnRenamed("word", "w2").withColumnRenamed("c_w", "c2"), "w2")
        .join(F.broadcast(total))
        .select(
            "bigram",
            "n",
            exact_ratio(
                F.col("n") * F.col("_n_tokens"),
                F.col("c1") * F.col("c2"),
                out_scale=1000,
            ).alias("lift_permille"),
        )
        .orderBy(F.col("lift_permille").desc(), F.col("bigram").asc())
        .limit(PMI_TOP_K)
    )


@query(
    "bigram_pmi_top",
    oracle=f"""
    WITH toks AS (
        SELECT {_ORACLE_TOKENS} AS ts FROM documents
    ),
    words AS (SELECT unnest(ts) AS word FROM toks),
    uni AS (SELECT word, count(*) AS c_w FROM words GROUP BY word),
    tot AS (SELECT count(*) AS n_tokens FROM words),
    bi AS (
        SELECT bigram, count(*) AS n,
               string_split(bigram, ' ')[1] AS w1,
               string_split(bigram, ' ')[2] AS w2
        FROM (
            SELECT unnest(list_transform(generate_series(1, len(ts) - 1),
                                         i -> ts[i] || ' ' || ts[i + 1])) AS bigram
            FROM toks WHERE len(ts) >= 2
        )
        GROUP BY bigram
        HAVING count(*) >= {PMI_MIN_COUNT}
    )
    SELECT bigram, n,
           {oracle_exact_ratio("n * n_tokens", "u1.c_w * u2.c_w", out_scale=1000)}
               AS lift_permille
    FROM bi
    JOIN uni u1 ON bi.w1 = u1.word
    JOIN uni u2 ON bi.w2 = u2.word
    CROSS JOIN tot
    ORDER BY lift_permille DESC, bigram ASC
    LIMIT {PMI_TOP_K}
    """,
)
def q_bigram_pmi_top(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-30 collocations of the corpus by exact-integer PMI lift."""
    return bigram_pmi_top(fan_out(load_table(spark, sf_dir, "documents"), spark))
