"""Corpus language-model scoring: CCNet/KenLM-style quality filters.

The published LLM-data pipelines (CCNet, Gopher, RefinedWeb) filter
web text by its perplexity under a reference n-gram language model —
low-probability documents are garbled text, boilerplate soup, or the
wrong language. The reference engine's word count
(``plugin/word_count/wc.go:21-34``) is the order-0 ancestor of this
family: these operators are what that count pipeline becomes when the
counts are turned into a scoring MODEL and applied back to documents.

Two operators:

``lm_bigram_bits`` — add-one-smoothed bigram LM trained on the whole
corpus, every document scored by its cross-entropy under that model
(self-perplexity: the corpus-statistics report every curation run
starts from).

``lm_trigram_backoff_bits`` — Stupid Backoff (Brants et al. 2007,
"Large Language Models in Machine Translation") trigram model with
backoff factor alpha = 1/2, trained on a deterministic 3/4 split of
the corpus and scored on the held-out 1/4 — the actual production
shape (CCNet scores Common Crawl under a Wikipedia-trained model),
and the split makes the backoff paths real: held-out documents
contain trigrams the train slice never saw.

**Integer-bit cross-entropy.** A float ``log`` is the one operation
this repo's cross-engine discipline cannot allow on an oracled path
(Java's and DuckDB's libm may differ in the last ulp, and a sum of
thousands of them compounds). Instead every per-position cost is the
BIT WIDTH difference of exact integer counts::

    width(x) = length(bin(x))          -- floor(log2 x) + 1, exact
    cost(num/den) = width(den) - width(num)

which equals ``log2(den/num)`` to within 1 bit per position,
deterministically, in both engines (Spark's ``bin`` and DuckDB's
``bin`` emit the same minimal binary string for positive integers).
Alpha = 1/2 for Stupid Backoff is chosen for the same reason: each
backoff level costs EXACTLY one more bit — no float multiply exists
anywhere in the scoring path.

Scale shape: the count tables are the persisted LM artifact —
vocabulary-sized, orders of magnitude smaller than the corpus — and
scoring is the same inverted-index discipline as
``rare_bigram_rate``: positions reduce to 32-bit hashes, counts are
map-side-combinable aggregates, scoring is hash equi-joins of the
position stream against the count tables (broadcast when the pruned
LM fits, shuffle-hash otherwise). The tokenized-corpus frame is
cached: train counts (three orders), the token total, and the scoring
positions all derive from it, so the corpus is scanned exactly once.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from mapreduce_lab_spark.functions.hashing import hex8_int, oracle_hex8_int
from mapreduce_lab_spark.functions.numeric import exact_ratio, oracle_exact_ratio
from mapreduce_lab_spark.operators.ngrams import _ORACLE_TOKENS
from mapreduce_lab_spark.registry import query
from mapreduce_lab_spark.sources.tables import fan_out, load_table

# 1-in-4 documents are held out for trigram scoring; the other 3/4
# train the model. Deterministic salted-hash gate, same construction
# as selection.py's probe gate.
LM_HOLDOUT_MOD = 4


def _toks() -> Column:
    """Word tokens of ``text``: the corpus-wide tokenizer (lowercase,
    split on non-letters, drop empties) shared with ngrams.py."""
    return F.filter(
        F.split(F.lower(F.col("text")), r"[^\p{L}]+"), lambda t: t != F.lit("")
    )


def _ngram_arr(ts: Column, n: int) -> Column:
    """Space-joined n-grams of a token array (callers must guard
    ``size(ts) >= n``: Spark's sequence(1, k) DESCENDS for k < 1)."""
    idx = F.sequence(F.lit(1), F.size(ts) - (n - 1))
    return F.transform(
        idx,
        lambda i: F.concat_ws(" ", *[F.element_at(ts, i + j) for j in range(n)]),
    )


def _width(c: Column) -> Column:
    """Bit width of a positive integer: floor(log2 c) + 1, exact and
    identical in Spark and DuckDB (``length(bin(c))``)."""
    return F.length(F.bin(c))


def _holdout_gate() -> Column:
    return (
        F.pmod(
            hex8_int(F.concat(F.lit("lmho|"), F.col("doc_id").cast("string"))),
            F.lit(LM_HOLDOUT_MOD),
        )
        == 0
    )


def _oracle_holdout_gate(col: str = "doc_id") -> str:
    salted = f"'lmho|' || {col}::VARCHAR"
    return f"({oracle_hex8_int(salted)} % {LM_HOLDOUT_MOD}) = 0"


# --- add-one bigram LM, self-scored ----------------------------------------


def lm_bigram_bits(docs: DataFrame) -> DataFrame:
    """Per-document cross-entropy (integer bits) under an add-one-
    smoothed bigram LM trained on the corpus itself.

    p(w2 | w1) = (c(w1 w2) + 1) / (c(w1 .) + V), scored as
    width(c(w1 .) + V) - width(c(w1 w2) + 1) bits per position,
    where c(w1 .) sums bigram counts over the right word and V is the
    corpus vocabulary size. Every quantity is an exact integer;
    smoothing keeps the model honest even though self-scoring means
    every bigram was seen at least once.

    Plan: one cached tokenize pass feeds the position stream, the
    (g, g1)-keyed bigram counts, the left-marginal rollup, and the
    1-row vocabulary frame; scoring is two hash equi-joins plus the
    broadcast scalar. All counts are map-side combinable.
    """
    d = docs.select("doc_id", _toks().alias("ts")).cache()
    pos = (
        d.where(F.size("ts") >= 2)
        .select("doc_id", F.explode(_ngram_arr(F.col("ts"), 2)).alias("bg"))
        .select(
            "doc_id",
            hex8_int(F.col("bg")).alias("g"),
            hex8_int(F.split("bg", " ").getItem(0)).alias("g1"),
        )
    )
    counts = pos.groupBy("g", "g1").agg(F.count("*").alias("n_bi"))
    lefts = counts.groupBy("g1").agg(F.sum("n_bi").alias("n_left"))
    vocab = d.select(F.explode("ts").alias("w")).agg(
        F.countDistinct(hex8_int(F.col("w"))).alias("_v")
    )
    return (
        pos.join(counts, ["g", "g1"])
        .join(lefts, "g1")
        .join(F.broadcast(vocab))
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_bigrams"),
            F.sum(
                _width(F.col("n_left") + F.col("_v"))
                - _width(F.col("n_bi") + F.lit(1))
            ).alias("bits"),
        )
        .select(
            "doc_id",
            "n_bigrams",
            "bits",
            exact_ratio(F.col("bits"), F.col("n_bigrams"), out_scale=1000).alias(
                "mean_bits"
            ),
        )
    )


_BIGRAM_BITS = "sum(length(bin(n_left + v)) - length(bin(n_bi + 1)))"

# Shared WITH-chain ending in the per-document score frame; the
# self-report query selects it directly and the retention capstone
# extends it (the shared-fragment pattern from docs/NOTES.md).
_BIGRAM_CTES = f"""
    WITH toks AS (
        SELECT doc_id, {_ORACLE_TOKENS} AS ts FROM documents
    ),
    pos AS (
        SELECT doc_id,
               {oracle_hex8_int('bg')} AS g,
               {oracle_hex8_int("string_split(bg, ' ')[1]")} AS g1
        FROM (
            SELECT doc_id,
                   unnest(list_transform(generate_series(1, len(ts) - 1),
                                         i -> ts[i] || ' ' || ts[i + 1])) AS bg
            FROM toks WHERE len(ts) >= 2
        )
    ),
    counts AS (SELECT g, g1, count(*) AS n_bi FROM pos GROUP BY g, g1),
    lefts AS (
        SELECT g1, CAST(sum(n_bi) AS BIGINT) AS n_left FROM counts GROUP BY g1
    ),
    vocab AS (
        SELECT count(DISTINCT {oracle_hex8_int('w')}) AS v
        FROM (SELECT unnest(ts) AS w FROM toks)
    ),
    per_doc AS (
        SELECT doc_id, count(*) AS n_bigrams,
               CAST({_BIGRAM_BITS} AS BIGINT) AS bits,
               {oracle_exact_ratio(_BIGRAM_BITS, 'count(*)', 1000)} AS mean_bits
        FROM pos JOIN counts USING (g, g1) JOIN lefts USING (g1)
        CROSS JOIN vocab
        GROUP BY doc_id
    )"""


@query(
    "lm_bigram_bits",
    oracle=_BIGRAM_CTES
    + "\n    SELECT doc_id, n_bigrams, bits, mean_bits FROM per_doc",
)
def q_lm_bigram_bits(spark: SparkSession, sf_dir: str) -> DataFrame:
    return lm_bigram_bits(fan_out(load_table(spark, sf_dir, "documents"), spark))


# --- capstone: LM filter -> per-source retention report --------------------

# Keep documents at or below this mean cross-entropy; chosen at the
# ~85th percentile of the synthetic corpus (median 4.52, p80 4.57,
# p95 4.65 bits) so the filter visibly drops a tail without gutting
# any source. mean_bits is floor-scaled to 3 decimals identically in
# both engines, so the threshold compare cannot straddle an ulp.
LM_BITS_KEEP_MAX = 4.6


def lm_filter_retention(docs: DataFrame) -> DataFrame:
    """The perplexity-filter capstone: score every document under the
    corpus bigram LM, keep the low-cross-entropy side, and report
    per-source retention — docs kept, positions kept, and the mean
    bits of what survived. This is the report a curation run reads
    before committing a threshold: which sources lose how much mass.

    Composition: ``lm_bigram_bits`` is the already-verified scorer;
    this adds one hash join back to (doc_id, source) metadata and a
    map-side-combinable rollup over |sources| groups. Documents under
    two tokens are unscored by construction and sit outside the
    report (they carry no bigram evidence either way).
    """
    scored = lm_bigram_bits(docs)
    kept = F.col("mean_bits") <= F.lit(LM_BITS_KEEP_MAX)
    return (
        scored.join(docs.select("doc_id", "source"), "doc_id")
        .groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(F.when(kept, 1).otherwise(0)).alias("kept_docs"),
            F.sum(F.when(kept, F.col("n_bigrams")).otherwise(0)).alias(
                "kept_positions"
            ),
            F.sum(F.when(kept, F.col("bits")).otherwise(0)).alias("_kept_bits"),
        )
        .select(
            "source",
            "n_docs",
            "kept_docs",
            "kept_positions",
            exact_ratio(
                F.col("_kept_bits"),
                F.greatest(F.lit(1), F.col("kept_positions")),
                out_scale=1000,
            ).alias("mean_kept_bits"),
        )
    )


_KEPT = f"CASE WHEN mean_bits <= {LM_BITS_KEEP_MAX} THEN"


@query(
    "lm_filter_retention",
    oracle=_BIGRAM_CTES
    + f""",
    j AS (
        SELECT p.*, d.source
        FROM per_doc p JOIN documents d USING (doc_id)
    )
    SELECT source, count(*) AS n_docs,
           CAST(sum({_KEPT} 1 ELSE 0 END) AS BIGINT) AS kept_docs,
           CAST(sum({_KEPT} n_bigrams ELSE 0 END) AS BIGINT)
               AS kept_positions,
           {oracle_exact_ratio(
               f'sum({_KEPT} bits ELSE 0 END)',
               f'greatest(1, sum({_KEPT} n_bigrams ELSE 0 END))',
               1000,
           )} AS mean_kept_bits
    FROM j GROUP BY source
    """,
)
def q_lm_filter_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    return lm_filter_retention(
        fan_out(load_table(spark, sf_dir, "documents"), spark)
    )


# --- Stupid Backoff trigram LM, held-out-scored ----------------------------


def lm_trigram_backoff_bits(docs: DataFrame) -> DataFrame:
    """Held-out documents scored under a Stupid Backoff trigram LM
    trained on the other 3/4 of the corpus (alpha = 1/2).

    Per trigram position (w1 w2 w3), in train-slice counts::

        c123 seen:  width(c(w1 w2))  - width(c(w1 w2 w3))
        c23  seen:  1 + width(c(w2)) - width(c(w2 w3))
        c3   seen:  2 + width(N)     - width(c(w3))
        unseen:     2 + width(N)

    The unseen floor is INTENTIONALLY one bit above the cost of a
    train-count-1 unigram (a literal s = 1/N would be
    2 + width(N) - width(1) = 2 + width(N) - 1): an unseen word must
    never score cheaper than or equal to the rarest observed one, and
    the module's stated envelope is ±1 bit per backoff level. Both
    engines charge the identical branch, so parity is exact.

    Each backoff level costs exactly one extra bit (alpha = 1/2), so
    the whole score stays in integer arithmetic. Guards are
    collision-tolerant: a level is taken only when BOTH its numerator
    and denominator hashes matched train-side rows (32-bit hash
    collisions can make either match independently; the guard is
    deterministic and identical in both engines, so parity holds).
    ``n_backoff`` counts the positions that fell past the trigram
    level — the quantity CCNet-style filters threshold on alongside
    the mean bits.

    Plan: the cached tokenized frame feeds the three train count
    tables (the persisted LM artifact — vocabulary-sized), the 1-row
    token total, and the held-out position stream; scoring is five
    left hash equi-joins on 32-bit keys carrying only counts. At
    100 TB the pruned LM broadcasts (top-k counts cover virtually all
    positions); the fallback is the shuffle-hash join on the same
    keys.
    """
    d = docs.select(
        "doc_id", _holdout_gate().alias("is_ho"), _toks().alias("ts")
    ).cache()
    train = d.where(~F.col("is_ho"))
    tri_c = (
        train.where(F.size("ts") >= 3)
        .select(F.explode(_ngram_arr(F.col("ts"), 3)).alias("s"))
        .select(hex8_int(F.col("s")).alias("g123"))
        .groupBy("g123")
        .agg(F.count("*").alias("c123"))
    )
    bi_c = (
        train.where(F.size("ts") >= 2)
        .select(F.explode(_ngram_arr(F.col("ts"), 2)).alias("s"))
        .select(hex8_int(F.col("s")).alias("gb"))
        .groupBy("gb")
        .agg(F.count("*").alias("c_bi"))
    )
    uni_c = (
        train.select(F.explode("ts").alias("w"))
        .select(hex8_int(F.col("w")).alias("gu"))
        .groupBy("gu")
        .agg(F.count("*").alias("c_uni"))
    )
    ntot = train.select(F.explode("ts").alias("w")).agg(
        F.count("*").alias("n_corpus")
    )
    p = F.split(F.col("tg"), " ")
    pos = (
        d.where(F.col("is_ho") & (F.size("ts") >= 3))
        .select("doc_id", F.explode(_ngram_arr(F.col("ts"), 3)).alias("tg"))
        .select(
            "doc_id",
            hex8_int(F.col("tg")).alias("g123"),
            hex8_int(F.concat_ws(" ", p.getItem(0), p.getItem(1))).alias("g12"),
            hex8_int(F.concat_ws(" ", p.getItem(1), p.getItem(2))).alias("g23"),
            hex8_int(p.getItem(1)).alias("g2"),
            hex8_int(p.getItem(2)).alias("g3"),
        )
    )
    scored = (
        pos.join(tri_c, "g123", "left")
        .join(
            bi_c.select(F.col("gb").alias("g12"), F.col("c_bi").alias("c12")),
            "g12",
            "left",
        )
        .join(
            bi_c.select(F.col("gb").alias("g23"), F.col("c_bi").alias("c23")),
            "g23",
            "left",
        )
        .join(
            uni_c.select(F.col("gu").alias("g2"), F.col("c_uni").alias("c2")),
            "g2",
            "left",
        )
        .join(
            uni_c.select(F.col("gu").alias("g3"), F.col("c_uni").alias("c3")),
            "g3",
            "left",
        )
        .join(F.broadcast(ntot))
    )
    tri_hit = F.col("c123").isNotNull() & F.col("c12").isNotNull()
    bi_hit = F.col("c23").isNotNull() & F.col("c2").isNotNull()
    uni_hit = F.col("c3").isNotNull()
    pos_bits = (
        F.when(tri_hit, _width(F.col("c12")) - _width(F.col("c123")))
        .when(bi_hit, F.lit(1) + _width(F.col("c2")) - _width(F.col("c23")))
        .when(uni_hit, F.lit(2) + _width(F.col("n_corpus")) - _width(F.col("c3")))
        .otherwise(F.lit(2) + _width(F.col("n_corpus")))
    )
    return (
        scored.groupBy("doc_id")
        .agg(
            F.count("*").alias("n_trigrams"),
            F.sum(F.when(tri_hit, F.lit(0)).otherwise(F.lit(1))).alias("n_backoff"),
            F.sum(pos_bits).alias("bits"),
        )
        .select(
            "doc_id",
            "n_trigrams",
            "n_backoff",
            "bits",
            exact_ratio(F.col("bits"), F.col("n_trigrams"), out_scale=1000).alias(
                "mean_bits"
            ),
        )
    )


_O_TRI = (
    "unnest(list_transform(generate_series(1, len(ts) - 2), "
    "i -> ts[i] || ' ' || ts[i + 1] || ' ' || ts[i + 2]))"
)
_O_BI = (
    "unnest(list_transform(generate_series(1, len(ts) - 1), "
    "i -> ts[i] || ' ' || ts[i + 1]))"
)


@query(
    "lm_trigram_backoff_bits",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, {_ORACLE_TOKENS} AS ts,
               {_oracle_holdout_gate()} AS is_ho
        FROM documents
    ),
    tri_c AS (
        SELECT {oracle_hex8_int('s')} AS g123, count(*) AS c123
        FROM (SELECT {_O_TRI} AS s
              FROM toks WHERE NOT is_ho AND len(ts) >= 3)
        GROUP BY 1
    ),
    bi_c AS (
        SELECT {oracle_hex8_int('s')} AS gb, count(*) AS c_bi
        FROM (SELECT {_O_BI} AS s
              FROM toks WHERE NOT is_ho AND len(ts) >= 2)
        GROUP BY 1
    ),
    uni_c AS (
        SELECT {oracle_hex8_int('w')} AS gu, count(*) AS c_uni
        FROM (SELECT unnest(ts) AS w FROM toks WHERE NOT is_ho)
        GROUP BY 1
    ),
    ntot AS (
        SELECT count(*) AS n_corpus
        FROM (SELECT unnest(ts) AS w FROM toks WHERE NOT is_ho)
    ),
    pos AS (
        SELECT doc_id,
               {oracle_hex8_int('tg')} AS g123,
               {oracle_hex8_int(
                   "string_split(tg, ' ')[1] || ' ' || string_split(tg, ' ')[2]"
               )} AS g12,
               {oracle_hex8_int(
                   "string_split(tg, ' ')[2] || ' ' || string_split(tg, ' ')[3]"
               )} AS g23,
               {oracle_hex8_int("string_split(tg, ' ')[2]")} AS g2,
               {oracle_hex8_int("string_split(tg, ' ')[3]")} AS g3
        FROM (SELECT doc_id, {_O_TRI} AS tg
              FROM toks WHERE is_ho AND len(ts) >= 3)
    ),
    j AS (
        SELECT pos.doc_id, c123, c12, c23, c2, c3, n_corpus
        FROM pos
        LEFT JOIN tri_c USING (g123)
        LEFT JOIN (SELECT gb AS g12, c_bi AS c12 FROM bi_c) b12 USING (g12)
        LEFT JOIN (SELECT gb AS g23, c_bi AS c23 FROM bi_c) b23 USING (g23)
        LEFT JOIN (SELECT gu AS g2, c_uni AS c2 FROM uni_c) u2 USING (g2)
        LEFT JOIN (SELECT gu AS g3, c_uni AS c3 FROM uni_c) u3 USING (g3)
        CROSS JOIN ntot
    ),
    b AS (
        SELECT doc_id,
               CASE WHEN c123 IS NOT NULL AND c12 IS NOT NULL THEN 0
                    ELSE 1 END AS backoff,
               CASE
                 WHEN c123 IS NOT NULL AND c12 IS NOT NULL
                   THEN length(bin(c12)) - length(bin(c123))
                 WHEN c23 IS NOT NULL AND c2 IS NOT NULL
                   THEN 1 + length(bin(c2)) - length(bin(c23))
                 WHEN c3 IS NOT NULL
                   THEN 2 + length(bin(n_corpus)) - length(bin(c3))
                 ELSE 2 + length(bin(n_corpus))
               END AS pos_bits
        FROM j
    )
    SELECT doc_id, count(*) AS n_trigrams,
           CAST(sum(backoff) AS BIGINT) AS n_backoff,
           CAST(sum(pos_bits) AS BIGINT) AS bits,
           {oracle_exact_ratio('sum(pos_bits)', 'count(*)', 1000)} AS mean_bits
    FROM b GROUP BY doc_id
    """,
)
def q_lm_trigram_backoff_bits(spark: SparkSession, sf_dir: str) -> DataFrame:
    return lm_trigram_backoff_bits(
        fan_out(load_table(spark, sf_dir, "documents"), spark)
    )
