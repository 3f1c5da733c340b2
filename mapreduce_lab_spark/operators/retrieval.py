"""Full-text retrieval scoring: TF-IDF term weighting and BM25 search.

The reference's inverted index (``plugin/indexer/indexer.go:14-33``,
cited for the WHAT: posting lists per term) stops at document lists;
this module adds the ranking half a corpus pipeline needs — per-term
TF-IDF weights and BM25 ad-hoc retrieval — as pure DataFrame plans.

Scale shape (100 TB corpus):

- Postings are ``explode(tokenize(text))`` + groupBy(doc, term) —
  map-side partial aggregation collapses duplicate occurrences before
  the shuffle, so the shuffle carries at most one row per distinct
  (doc, term), not one per occurrence.
- BM25 filters postings to the |Q| query terms BEFORE any join or
  global stat — document-frequency counts then run over the filtered
  slice only; corpus-wide scalars (N, avgdl) travel as a broadcast
  one-row frame. Nothing quadratic, no unfiltered joins.
- TF-IDF joins postings to the per-term document-frequency table on
  ``term`` — the natural hash-join key; the per-doc top-k window
  partitions by ``doc_id`` (high cardinality, no single-task sort).

Determinism across engines (the reason scores are integers): both
score formulas avoid transcendental functions. The idf is the
*rational* variant — ``(N*1e6) div df`` for TF-IDF (exact BIGINT
floor-division) and ``floor(1e6*(N-df+0.5)/(df+0.5))`` for BM25
(IEEE double ops only, which Spark and DuckDB round identically for
an identical expression tree) — so per-term scores floor to exact
integer units and per-doc totals are integer sums, immune to
float-summation order. ``ln``-based idf would rank identically in
almost all cases but a 1-ulp libm divergence could flip a floor or a
rank boundary; the rational idf keeps the hash gate exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from mapreduce_lab_spark.registry import query
from mapreduce_lab_spark.sources.tables import fan_out, load_table

TFIDF_TOP_K = 3
BM25_TOP_K = 10
BM25_QUERY_TERMS = ("spark", "query", "join")
BM25_K1 = 1.2
BM25_B = 0.75

# Lower-cased letter-run tokens, empty runs dropped — the module-local
# twin of functions/text.tokenize with case folding (retrieval is
# case-insensitive; the reference word count is case-sensitive).
_ORACLE_TOKENS = (
    "[t for t in regexp_split_to_array(lower(text), '[^\\p{L}]+') if t <> '']"
)


def _tokens() -> F.Column:
    return F.filter(
        F.split(F.lower(F.col("text")), r"[^\p{L}]+"), lambda t: t != F.lit("")
    )


def _postings(docs: DataFrame) -> DataFrame:
    """One row per distinct (doc_id, term) with its term frequency."""
    return (
        docs.select("doc_id", F.explode(_tokens()).alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count("*").alias("tf"))
    )


def tfidf_top_terms(docs: DataFrame) -> DataFrame:
    """Top-k terms per document by rational-idf TF-IDF.

    score_units = tf * ((N * 1e6) div df): all-BIGINT, exact.
    Ties break by term ascending, deterministically.
    """
    postings = _postings(docs)
    n_docs = docs.select(F.count("*").alias("n_docs"))
    docfreq = postings.groupBy("term").agg(F.count("*").alias("df"))
    scored = (
        postings.join(docfreq, "term")
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "idf_units",
            F.expr("(n_docs * CAST(1000000 AS BIGINT)) div df"),
        )
        .withColumn("score_units", F.col("tf") * F.col("idf_units"))
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.col("score_units").desc(), F.col("term").asc()
    )
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= TFIDF_TOP_K)
        .select(
            "doc_id",
            "term",
            "tf",
            (F.col("score_units").cast("double") / F.lit(1_000_000)).alias("tfidf"),
        )
    )


@query(
    "tfidf_top_terms",
    oracle=f"""
    WITH postings AS (
        SELECT doc_id, term, count(*) AS tf
        FROM (SELECT doc_id, unnest({_ORACLE_TOKENS}) AS term FROM documents)
        GROUP BY doc_id, term
    ),
    docfreq AS (SELECT term, count(*) AS df FROM postings GROUP BY term),
    n AS (SELECT count(*) AS n_docs FROM documents),
    scored AS (
        SELECT p.doc_id, p.term, p.tf,
               p.tf * ((n.n_docs * 1000000) // d.df) AS score_units
        FROM postings p JOIN docfreq d USING (term) CROSS JOIN n
    )
    SELECT doc_id, term, tf,
           CAST(score_units AS DOUBLE) / 1000000 AS tfidf
    FROM (
        SELECT *, row_number() OVER (
            PARTITION BY doc_id ORDER BY score_units DESC, term ASC) AS rk
        FROM scored
    )
    WHERE rk <= {TFIDF_TOP_K}
    """,
)
def q_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    return tfidf_top_terms(fan_out(load_table(spark, sf_dir, "documents"), spark))


def bm25_search(docs: DataFrame, terms: tuple[str, ...] = BM25_QUERY_TERMS) -> DataFrame:
    """Top-k documents for a bag-of-words query, BM25-scored.

    Per-term partial scores floor to integer 1e4-units before the
    per-doc sum, so the total is an order-independent integer sum.
    The double arithmetic inside the floor mirrors the oracle's
    expression tree exactly (see module docstring).
    """
    doclen = docs.select("doc_id", F.size(_tokens()).alias("dl"))
    stats = doclen.agg(
        F.count("*").alias("n_docs"),
        F.sum("dl").alias("sum_dl"),
    )
    hits = _postings(docs).where(F.col("term").isin(*terms))
    docfreq = hits.groupBy("term").agg(F.count("*").alias("df"))
    scored = (
        hits.join(F.broadcast(docfreq), "term")
        .join(doclen, "doc_id")
        .crossJoin(F.broadcast(stats))
        .withColumn("avgdl", F.expr("CAST(sum_dl AS DOUBLE) / n_docs"))
        # Spark types bare decimal literals (0.5, 1.2) as DECIMAL and
        # propagates decimal through arithmetic, whereas DuckDB keeps
        # DOUBLE — the round-1 hash-divergence class. Every float
        # literal below is therefore CAST(... AS DOUBLE) so both
        # engines evaluate the identical IEEE double expression tree.
        .withColumn(
            "idf",
            F.expr(
                "(CAST(n_docs AS DOUBLE) - df + CAST(0.5 AS DOUBLE))"
                " / (CAST(df AS DOUBLE) + CAST(0.5 AS DOUBLE))"
            ),
        )
        .withColumn(
            "part_units",
            F.expr(
                f"CAST(floor((10000 * idf) * ((tf * (CAST({BM25_K1} AS DOUBLE) + 1)) / "
                f"(tf + CAST({BM25_K1} AS DOUBLE) * ((1 - CAST({BM25_B} AS DOUBLE)) + "
                f"CAST({BM25_B} AS DOUBLE) * (dl / avgdl))))) AS BIGINT)"
            ),
        )
    )
    totals = scored.groupBy("doc_id").agg(F.sum("part_units").alias("score_units"))
    return (
        totals.orderBy(F.col("score_units").desc(), F.col("doc_id").asc())
        .limit(BM25_TOP_K)
        .select(
            "doc_id",
            (F.col("score_units").cast("double") / F.lit(10_000)).alias("bm25"),
        )
    )


_BM25_TERMS_SQL = ", ".join(f"'{t}'" for t in BM25_QUERY_TERMS)


_BM25_ORACLE = f"""
    WITH doclen AS (
        SELECT doc_id, len({_ORACLE_TOKENS}) AS dl FROM documents
    ),
    stats AS (SELECT count(*) AS n_docs, CAST(sum(dl) AS BIGINT) AS sum_dl
              FROM doclen),
    hits AS (
        SELECT doc_id, term, count(*) AS tf
        FROM (SELECT doc_id, unnest({_ORACLE_TOKENS}) AS term FROM documents)
        WHERE term IN ({_BM25_TERMS_SQL})
        GROUP BY doc_id, term
    ),
    docfreq AS (SELECT term, count(*) AS df FROM hits GROUP BY term),
    scored AS (
        -- Expression tree mirrors the Spark side cast-for-cast:
        -- DuckDB types bare 1.2/0.5/0.75 as DECIMAL (exact) while
        -- Spark-after-cast uses binary doubles; without identical
        -- CAST(... AS DOUBLE) on both sides the floor() boundaries
        -- disagree.
        SELECT h.doc_id,
               CAST(floor((10000 * ((CAST(s.n_docs AS DOUBLE) - d.df
                                     + CAST(0.5 AS DOUBLE))
                                    / (CAST(d.df AS DOUBLE)
                                       + CAST(0.5 AS DOUBLE))))
                          * ((h.tf * (CAST({BM25_K1} AS DOUBLE) + 1)) /
                             (h.tf + CAST({BM25_K1} AS DOUBLE)
                              * ((1 - CAST({BM25_B} AS DOUBLE)) +
                                 CAST({BM25_B} AS DOUBLE)
                                 * (l.dl / (CAST(s.sum_dl AS DOUBLE)
                                            / s.n_docs))))))
                    AS BIGINT) AS part_units
        FROM hits h
        JOIN docfreq d USING (term)
        JOIN doclen l USING (doc_id)
        CROSS JOIN stats s
    )
    SELECT doc_id, CAST(score_units AS DOUBLE) / 10000 AS bm25
    FROM (SELECT doc_id, CAST(sum(part_units) AS BIGINT) AS score_units
          FROM scored GROUP BY doc_id)
    ORDER BY score_units DESC, doc_id ASC
    LIMIT {BM25_TOP_K}
    """


@query("bm25_search", oracle=_BM25_ORACLE)
def q_bm25_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    return bm25_search(fan_out(load_table(spark, sf_dir, "documents"), spark))


# --- reciprocal-rank fusion ------------------------------------------------

RRF_K = 60
RRF_UNITS = 1_000_000_000
RRF_QUALITY_TOP = 20


def rrf_hybrid(bm25_top: DataFrame, quality_top: DataFrame) -> DataFrame:
    """Reciprocal-rank fusion of two rankings of the same corpus.

    The classic hybrid-retrieval combiner: each list contributes
    1/(K + rank) for the documents it ranks; documents appearing in
    both lists accumulate both terms. Contributions are floored to
    integer units (``RRF_UNITS div (K + rank)``) so the fused score is
    an exact integer sum — rank boundaries cannot drift cross-engine.
    A missing rank is reported as 0 (not NULL) so every output column
    stays a non-nullable integer.

    Scale shape: both inputs are top-k lists (bounded by construction
    — BM25_TOP_K and RRF_QUALITY_TOP), so the rank windows are global
    but k-bounded, and the fusion is a join of two k-row frames —
    driver-trivial at any corpus size; all the heavy lifting happened
    inside the two upstream rankings.
    """
    wb = Window.orderBy(F.col("bm25").desc(), F.col("doc_id"))
    wq = Window.orderBy(F.col("quality_score").desc(), F.col("doc_id"))
    a = bm25_top.select("doc_id", F.row_number().over(wb).alias("rank_bm25"))
    b = quality_top.select("doc_id", F.row_number().over(wq).alias("rank_quality"))

    def unit(rank_col: str) -> F.Column:
        return F.coalesce(
            F.expr(f"{RRF_UNITS} div ({RRF_K} + {rank_col})"), F.lit(0)
        )

    return (
        a.join(b, "doc_id", "full_outer")
        .select(
            "doc_id",
            (unit("rank_bm25") + unit("rank_quality")).alias("rrf_units"),
            F.coalesce("rank_bm25", F.lit(0)).alias("rank_bm25"),
            F.coalesce("rank_quality", F.lit(0)).alias("rank_quality"),
        )
    )


def _oracle_rrf() -> str:
    from mapreduce_lab_spark.operators.textstats import _QUALITY_ORACLE

    u, k = RRF_UNITS, RRF_K
    return f"""
    WITH bm AS ({_BM25_ORACLE}),
    bmr AS (
        SELECT doc_id,
               row_number() OVER (ORDER BY bm25 DESC, doc_id) AS rank_bm25
        FROM bm
    ),
    qs AS ({_QUALITY_ORACLE}),
    qt AS (SELECT doc_id, quality_score FROM qs
           ORDER BY quality_score DESC, doc_id LIMIT {RRF_QUALITY_TOP}),
    qr AS (
        SELECT doc_id,
               row_number() OVER (ORDER BY quality_score DESC, doc_id)
                   AS rank_quality
        FROM qt
    )
    SELECT doc_id,
           CAST(COALESCE({u} // ({k} + rank_bm25), 0)
                + COALESCE({u} // ({k} + rank_quality), 0) AS BIGINT)
               AS rrf_units,
           COALESCE(rank_bm25, 0)::INT AS rank_bm25,
           COALESCE(rank_quality, 0)::INT AS rank_quality
    FROM bmr FULL JOIN qr USING (doc_id)
    """


@query("rrf_hybrid_search", oracle=_oracle_rrf())
def q_rrf_hybrid_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mapreduce_lab_spark.operators.textstats import quality_scores

    docs = fan_out(load_table(spark, sf_dir, "documents"), spark)
    quality_top = (
        quality_scores(docs)
        .orderBy(F.col("quality_score").desc(), F.col("doc_id"))
        .limit(RRF_QUALITY_TOP)
        .select("doc_id", "quality_score")
    )
    return rrf_hybrid(bm25_search(docs), quality_top)
