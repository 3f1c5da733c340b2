"""Model-based document scoring: hashed-feature linear classifier.

Superset surface for the LLM-data pipeline: the fastText-style
quality filter — hash token bigrams into a fixed feature space, look
up a weight per bucket, sum into a per-document score, threshold into
keep/drop. The real-world variant loads trained weights; here the
weight table is DERIVED deterministically from the bucket id (md5 →
integer in [-1000, 1000]) so the DuckDB oracle can rebuild it exactly
— the plumbing (feature hashing, broadcast weight lookup, map-side
combinable score aggregation) is the production shape either way.

Scale shape: feature extraction is a narrow array transform; the
weight table is O(buckets) and BROADCAST (a trained fastText bigram
table is a few MB — always broadcastable); the only shuffle carries
(doc_id, integer partials) for the score sum. Docs with fewer than
two tokens score 0 via the left join back to the corpus — no row is
silently dropped by the explode.

All-integer scoring: weights and sums are exact int64, so keep/drop
decisions are bit-stable across engines and partitionings (a float
dot product could flip the threshold at the last ulp).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from mapreduce_lab_spark.functions.hashing import hex8_int, oracle_hex8_int
from mapreduce_lab_spark.functions.numeric import exact_ratio, oracle_exact_ratio
from mapreduce_lab_spark.operators.ngrams import (
    _ORACLE_TOKENS,
    _bigrams,
    _lower_tokens,
)
from mapreduce_lab_spark.registry import query
from mapreduce_lab_spark.sources.tables import fan_out, load_table

N_BUCKETS = 1024
WEIGHT_SPAN = 2001  # weights in [-1000, 1000]


def hashed_weights(spark: SparkSession, n_buckets: int = N_BUCKETS) -> DataFrame:
    """The (bucket, weight) table, derived from md5('w:<bucket>')."""
    return spark.range(n_buckets).select(
        F.col("id").alias("bucket"),
        (
            hex8_int(F.concat(F.lit("w:"), F.col("id").cast("string")))
            % F.lit(WEIGHT_SPAN)
            - F.lit((WEIGHT_SPAN - 1) // 2)
        ).alias("w"),
    )


def classify_documents(docs: DataFrame, spark: SparkSession,
                       n_buckets: int = N_BUCKETS) -> DataFrame:
    feats = (
        docs.select("doc_id", _lower_tokens().alias("_lt"))
        .select("doc_id", F.explode(_bigrams(F.col("_lt"))).alias("bg"))
        .select("doc_id", F.pmod(hex8_int(F.col("bg")), F.lit(n_buckets)).alias("bucket"))
    )
    scored = (
        feats.join(F.broadcast(hashed_weights(spark, n_buckets)), "bucket")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_feats"), F.sum("w").alias("score"))
    )
    return (
        docs.select("doc_id")
        .join(scored, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_feats", F.lit(0)).alias("n_feats"),
            F.coalesce("score", F.lit(0)).alias("score"),
            (F.coalesce("score", F.lit(0)) >= 0).alias("keep"),
        )
    )


_HALF_SPAN = (WEIGHT_SPAN - 1) // 2

@query(
    "quality_classifier_hashed",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, {_ORACLE_TOKENS} AS ts FROM documents
    ),
    feats AS (
        SELECT doc_id,
               ({oracle_hex8_int("bg")} % {N_BUCKETS} + {N_BUCKETS}) % {N_BUCKETS}
                   AS bucket
        FROM (
            SELECT doc_id,
                   unnest(list_transform(generate_series(1, len(ts) - 1),
                                         i -> ts[i] || ' ' || ts[i + 1])) AS bg
            FROM toks WHERE len(ts) >= 2
        )
    ),
    weights AS (
        SELECT i AS bucket,
               ({oracle_hex8_int("'w:' || i")} % {WEIGHT_SPAN}) - {_HALF_SPAN} AS w
        FROM generate_series(0, {N_BUCKETS - 1}) t(i)
    ),
    scored AS (
        SELECT doc_id, count(*) AS n_feats, CAST(sum(w) AS BIGINT) AS score
        FROM feats JOIN weights USING (bucket)
        GROUP BY doc_id
    )
    SELECT d.doc_id,
           coalesce(s.n_feats, 0) AS n_feats,
           coalesce(s.score, 0) AS score,
           coalesce(s.score, 0) >= 0 AS keep
    FROM documents d LEFT JOIN scored s USING (doc_id)
    """,
)
def q_quality_classifier_hashed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Score every document with the hashed bigram linear model."""
    docs = fan_out(load_table(spark, sf_dir, "documents"), spark)
    return classify_documents(docs, spark)


# --- threshold sweep: precision/recall table ------------------------------

PR_THRESHOLDS = [-3000, -1500, -500, 0, 500, 1500, 3000]


def classifier_pr_curve(docs: DataFrame, spark: SparkSession) -> DataFrame:
    """Precision/recall of the hashed classifier at a threshold grid —
    the calibration table every production quality filter ships with
    (pick the operating point AFTER seeing the tradeoff, not before).

    The label here is the ``lang = 'en'`` proxy (any deterministic
    label exercises the same machinery). Each scored document explodes
    into one row per candidate threshold (a narrow array explode — NO
    cross join, so the plan stays BNLJ-free), then one
    map-side-combinable aggregation counts the confusion quadrants per
    threshold; precision/recall come out as exact permille ratios.
    Scale: one classifier pass + a shuffle of |grid| × 4 counters.
    """
    scored = classify_documents(docs, spark).join(
        docs.select("doc_id", (F.col("lang") == "en").alias("label")), "doc_id"
    )
    swept = scored.select(
        "score",
        "label",
        F.explode(F.array(*[F.lit(t) for t in PR_THRESHOLDS])).alias("threshold"),
    ).select(
        "threshold", "label", (F.col("score") >= F.col("threshold")).alias("pred")
    )
    agg = swept.groupBy("threshold").agg(
        F.count(F.when(F.col("pred") & F.col("label"), 1)).alias("tp"),
        F.count(F.when(F.col("pred") & ~F.col("label"), 1)).alias("fp"),
        F.count(F.when(~F.col("pred") & F.col("label"), 1)).alias("fn"),
        F.count(F.when(~F.col("pred") & ~F.col("label"), 1)).alias("tn"),
    )
    return agg.select(
        "threshold", "tp", "fp", "fn", "tn",
        F.when(
            F.col("tp") + F.col("fp") > 0,
            F.floor(F.col("tp").cast("double") * 1000 / (F.col("tp") + F.col("fp"))).cast("long"),
        ).alias("precision_permille"),
        F.when(
            F.col("tp") + F.col("fn") > 0,
            F.floor(F.col("tp").cast("double") * 1000 / (F.col("tp") + F.col("fn"))).cast("long"),
        ).alias("recall_permille"),
    )


_PR_GRID = ", ".join(str(t) for t in PR_THRESHOLDS)

@query(
    "classifier_pr_curve",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, {_ORACLE_TOKENS} AS ts FROM documents
    ),
    feats AS (
        SELECT doc_id,
               ({oracle_hex8_int("bg")} % {N_BUCKETS} + {N_BUCKETS}) % {N_BUCKETS}
                   AS bucket
        FROM (
            SELECT doc_id,
                   unnest(list_transform(generate_series(1, len(ts) - 1),
                                         i -> ts[i] || ' ' || ts[i + 1])) AS bg
            FROM toks WHERE len(ts) >= 2
        )
    ),
    weights AS (
        SELECT i AS bucket,
               ({oracle_hex8_int("'w:' || i")} % {WEIGHT_SPAN}) - {_HALF_SPAN} AS w
        FROM generate_series(0, {N_BUCKETS - 1}) t(i)
    ),
    scored AS (
        SELECT d.doc_id,
               coalesce(s.score, 0) AS score,
               d.lang = 'en' AS label
        FROM documents d
        LEFT JOIN (
            SELECT doc_id, CAST(sum(w) AS BIGINT) AS score
            FROM feats JOIN weights USING (bucket) GROUP BY doc_id
        ) s USING (doc_id)
    ),
    swept AS (
        SELECT t.threshold, label, score >= t.threshold AS pred
        FROM scored, (SELECT unnest([{_PR_GRID}]) AS threshold) t
    ),
    agg AS (
        SELECT threshold,
               count(*) FILTER (pred AND label) AS tp,
               count(*) FILTER (pred AND NOT label) AS fp,
               count(*) FILTER (NOT pred AND label) AS fn,
               count(*) FILTER (NOT pred AND NOT label) AS tn
        FROM swept GROUP BY threshold
    )
    SELECT threshold, tp, fp, fn, tn,
           CASE WHEN tp + fp > 0
                THEN CAST(floor(CAST(tp AS DOUBLE) * 1000 / (tp + fp)) AS BIGINT)
           END AS precision_permille,
           CASE WHEN tp + fn > 0
                THEN CAST(floor(CAST(tp AS DOUBLE) * 1000 / (tp + fn)) AS BIGINT)
           END AS recall_permille
    FROM agg
    """,
)
def q_classifier_pr_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Confusion counts + exact-permille precision/recall of the
    hashed classifier at a 7-point threshold grid."""
    docs = fan_out(load_table(spark, sf_dir, "documents"), spark)
    return classifier_pr_curve(docs, spark)


# --- weak supervision: labeling-function vote census ------------------------

# Programmatic labeling (Ratner et al., Snorkel, VLDB 2018 — public):
# instead of hand labels, K cheap heuristic labeling functions (LFs)
# each emit +1 / -1 / 0 (abstain) per document and a weighted vote
# combines them. At 100 TB this is the *first* labeling pass a
# training-data pipeline can afford; the census of LF agreement
# patterns below is also exactly the input the Snorkel generative
# model trains on (pattern counts, not raw rows).
#
# The three LFs here are deterministic so the DuckDB oracle rebuilds
# them bit-for-bit:
#   lf_speed: more 'fast' than 'slow' tokens -> +1, fewer -> -1
#   lf_len:   n_chars >= 300 -> +1, < 120 -> -1
#   lf_topic: has 'spark' and 'query' -> +1, has 'dup' -> -1
# Vote = 2*lf_speed + lf_len + lf_topic (speed is the trusted LF);
# label = sign(vote).

LF_LEN_HI = 300
LF_LEN_LO = 120


def weak_label_votes(docs: DataFrame) -> DataFrame:
    """Per-document LF vector, vote score, and voted label — narrow
    per-row expressions only (array scalars on the split text), no
    shuffle until the caller aggregates.

    The per-token counts are staged as columns first: the filter
    lambdas make the count expressions CSE-blind, so the inlined
    when-chains re-split the text once per reference per row (21
    copies in the single-Project plan; see OPTIMIZATION_r13.md)."""
    words = F.col("_w")

    def cnt(tok: str) -> F.Column:
        return F.size(F.filter(words, lambda w: w == F.lit(tok)))

    pre = docs.select(
        "doc_id", "n_chars", F.split(F.col("text"), " ").alias("_w")
    ).select(
        "doc_id",
        "n_chars",
        cnt("fast").alias("_n_fast"),
        cnt("slow").alias("_n_slow"),
        (
            F.array_contains(words, "spark") & F.array_contains(words, "query")
        ).alias("_has_topic"),
        F.array_contains(words, "dup").alias("_has_dup"),
    )
    lf_speed = (
        F.when(F.col("_n_fast") > F.col("_n_slow"), F.lit(1))
        .when(F.col("_n_fast") < F.col("_n_slow"), F.lit(-1))
        .otherwise(F.lit(0))
    )
    lf_len = (
        F.when(F.col("n_chars") >= LF_LEN_HI, F.lit(1))
        .when(F.col("n_chars") < LF_LEN_LO, F.lit(-1))
        .otherwise(F.lit(0))
    )
    lf_topic = (
        F.when(F.col("_has_topic"), F.lit(1))
        .when(F.col("_has_dup"), F.lit(-1))
        .otherwise(F.lit(0))
    )
    score = F.lit(2) * lf_speed + lf_len + lf_topic
    return pre.select(
        "doc_id",
        lf_speed.alias("lf_speed"),
        lf_len.alias("lf_len"),
        lf_topic.alias("lf_topic"),
        score.alias("vote"),
        F.signum(score).cast("int").alias("label"),
    )


def weak_label_vote_census(docs: DataFrame) -> DataFrame:
    """Census over (LF vector, vote, label): document counts and the
    share of the corpus per pattern — a <= 27-row frame at any data
    size (3^3 LF patterns), map-side combinable."""
    votes = weak_label_votes(docs)
    # Grand total via an unpartitioned window over the <= 3^3-row
    # census frame: one corpus scan, no broadcast cross join.
    total = F.sum("n_docs").over(Window.partitionBy())
    return (
        votes.groupBy("lf_speed", "lf_len", "lf_topic", "vote", "label")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .select(
            "lf_speed",
            "lf_len",
            "lf_topic",
            "vote",
            "label",
            "n_docs",
            exact_ratio(F.col("n_docs"), total).alias("doc_share"),
        )
    )


_WLV_ORACLE = f"""
WITH w AS (
  SELECT doc_id, string_split(text, ' ') AS words, n_chars FROM documents
), lf AS (
  SELECT doc_id,
         CASE WHEN len(list_filter(words, x -> x = 'fast'))
                   > len(list_filter(words, x -> x = 'slow')) THEN 1
              WHEN len(list_filter(words, x -> x = 'fast'))
                   < len(list_filter(words, x -> x = 'slow')) THEN -1
              ELSE 0 END AS lf_speed,
         CASE WHEN n_chars >= {LF_LEN_HI} THEN 1
              WHEN n_chars < {LF_LEN_LO} THEN -1
              ELSE 0 END AS lf_len,
         CASE WHEN list_contains(words, 'spark')
                   AND list_contains(words, 'query') THEN 1
              WHEN list_contains(words, 'dup') THEN -1
              ELSE 0 END AS lf_topic
  FROM w
), voted AS (
  SELECT lf_speed, lf_len, lf_topic,
         2 * lf_speed + lf_len + lf_topic AS vote,
         CAST(sign(2 * lf_speed + lf_len + lf_topic) AS INTEGER) AS label
  FROM lf
)
SELECT lf_speed, lf_len, lf_topic, vote, label,
       count(*) AS n_docs,
       {oracle_exact_ratio("count(*)", "(SELECT count(*) FROM voted)")}
           AS doc_share
FROM voted
GROUP BY 1, 2, 3, 4, 5
"""


@query("weak_label_vote_census", oracle=_WLV_ORACLE)
def q_weak_label_vote_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    return weak_label_vote_census(fan_out(load_table(spark, sf_dir, "documents"), spark))


# --- split-conformal calibration of the quality gate ---------------------------

# Split-conformal prediction (Vovk et al.; Papadopoulos et al. 2002 —
# the distribution-free calibration layer production ML filters put
# on top of an uncalibrated score): hold out a calibration split,
# take nonconformity = -score, and set the cutoff at the
# ceil((n_cal + 1) * (1 - alpha))-th smallest nonconformity. Any
# exchangeable future document then passes the gate with probability
# >= 1 - alpha, NO assumptions on the score distribution. For a
# training-data quality filter this turns "keep score >= 0" folklore
# into "keep with a guaranteed 90% pass rate on in-distribution
# data", which is what a data-mixture planner actually budgets with.
#
# Distributed shape: the calibration split's k-th order statistic via
# one window rank over the (bounded) calibration slice, coverage as
# one aggregate over the rest; everything exact-integer (scores are
# int64 by construction) so the gate is hash-stable.

CONF_ALPHA_PCT = 10  # miscoverage alpha = 0.10
CONF_CAL_MOD = 5  # doc_id % 5 == 0 -> calibration split


def conformal_keep_threshold(docs: DataFrame, spark: SparkSession) -> DataFrame:
    scored = classify_documents(docs, spark).select(
        "doc_id", "score", (F.col("doc_id") % CONF_CAL_MOD == 0).alias("is_cal")
    )
    cal = scored.where("is_cal").localCheckpoint()
    n_cal = cal.agg(F.count(F.lit(1)).alias("n_cal"))
    # k = ceil((n_cal + 1) * (1 - alpha)); exact integer arithmetic
    k = F.call_function(
        "div",
        (F.col("n_cal") + 1) * (100 - CONF_ALPHA_PCT) + 99,
        F.lit(100).cast("long"),
    ).alias("k")
    kf = n_cal.select("n_cal", k)
    # k-th smallest nonconformity (-score) = k-th HIGHEST score,
    # selected by the house two-pass bucket refinement (the
    # distributed_exact_quantiles pattern) instead of one global
    # row_number window — an unpartitioned rank over the calibration
    # slice would serialize n/CONF_CAL_MOD rows onto one task at
    # 100 TB. Buckets shift scores non-negative first: integral `div`
    # truncates in Spark but floors in DuckDB on negatives, and the
    # shifted form needs neither to care.
    shift = F.lit(1 << 31).cast("long")
    bucketed = cal.select(
        "doc_id", "score",
        F.call_function("div", F.col("score") + shift, F.lit(256).cast("long")
                        ).alias("bkt"),
    )
    hist = bucketed.groupBy("bkt").agg(F.count(F.lit(1)).alias("cnt"))
    w_hi = Window.orderBy(F.desc("bkt")).rowsBetween(
        Window.unboundedPreceding, -1
    )
    marked = (
        hist.withColumn("above", F.coalesce(F.sum("cnt").over(w_hi), F.lit(0)))
        .crossJoin(F.broadcast(kf))
        .where(
            (F.col("above") < F.col("k"))
            & (F.col("above") + F.col("cnt") >= F.col("k"))
        )
        .select("bkt", (F.col("k") - F.col("above")).alias("k_in"), "n_cal", "k")
    )
    # pass 2: rank only inside the one target bucket (bounded rows)
    w_in = Window.partitionBy("bkt").orderBy(F.desc("score"), F.asc("doc_id"))
    thr = (
        bucketed.join(F.broadcast(marked), "bkt")
        .withColumn("rnk", F.row_number().over(w_in))
        .where(F.col("rnk") == F.col("k_in"))
        .select("n_cal", "k", F.col("score").alias("threshold_score"))
    )
    # ADVICE r11: when k = ceil((n_cal+1)*(1-alpha)) > n_cal (too few
    # calibration docs, n_cal <= 8 at alpha=0.10), no order statistic
    # exists and the row used to vanish — indistinguishable from "no
    # data". Emit the conventional keep-everything fallback instead:
    # threshold = min int64, so every eval doc passes (n_pass =
    # n_eval) and the consumer sees n_cal explicitly. Mirrored in the
    # oracle. The fully-empty corpus still yields ZERO rows (the
    # eval-side agg row is dropped below), preserving empty-lake
    # parity.
    fallback = kf.where(F.col("k") > F.col("n_cal")).select(
        "n_cal", "k",
        F.lit(-(1 << 63)).cast("long").alias("threshold_score"),
    )
    thr = thr.unionByName(fallback)
    ev = scored.where(~F.col("is_cal"))
    cov = ev.crossJoin(F.broadcast(thr)).agg(
        F.first("n_cal").alias("n_cal"),
        F.first("k").alias("k"),
        F.first("threshold_score").alias("threshold_score"),
        F.count(F.lit(1)).alias("n_eval"),
        F.sum(
            (F.col("score") >= F.col("threshold_score")).cast("long")
        ).alias("n_pass"),
    )
    # empty-corpus parity: a no-groupBy agg over the empty crossJoin
    # yields one all-null row in Spark, while the oracle's GROUP BY
    # yields zero rows — drop the null row so both engines agree.
    cov = cov.where(F.col("n_cal").isNotNull())
    return cov.select(
        F.lit(CONF_ALPHA_PCT).alias("alpha_pct"),
        "n_cal",
        "k",
        "threshold_score",
        "n_eval",
        "n_pass",
        exact_ratio(F.col("n_pass"), F.greatest(F.col("n_eval"), F.lit(1))).alias(
            "eval_coverage"
        ),
    )


_CONF_ORACLE = f"""
WITH toks AS (
    SELECT doc_id, {_ORACLE_TOKENS} AS ts FROM documents
),
feats AS (
    SELECT doc_id,
           ({oracle_hex8_int("bg")} % {N_BUCKETS} + {N_BUCKETS}) % {N_BUCKETS}
               AS bucket
    FROM (
        SELECT doc_id,
               unnest(list_transform(generate_series(1, len(ts) - 1),
                                     i -> ts[i] || ' ' || ts[i + 1])) AS bg
        FROM toks WHERE len(ts) >= 2
    )
),
weights AS (
    SELECT i AS bucket,
           ({oracle_hex8_int("'w:' || i")} % {WEIGHT_SPAN}) - {_HALF_SPAN} AS w
    FROM generate_series(0, {N_BUCKETS - 1}) t(i)
),
scored0 AS (
    SELECT doc_id, CAST(sum(w) AS BIGINT) AS score
    FROM feats JOIN weights USING (bucket) GROUP BY doc_id
),
scored AS (
    SELECT d.doc_id, coalesce(s.score, 0) AS score,
           d.doc_id % {CONF_CAL_MOD} = 0 AS is_cal
    FROM documents d LEFT JOIN scored0 s USING (doc_id)
),
kf AS (
    SELECT count(*) AS n_cal,
           ((count(*) + 1) * {100 - CONF_ALPHA_PCT} + 99) // 100 AS k
    FROM scored WHERE is_cal
),
thr AS (
    SELECT n_cal, k, score AS threshold_score
    FROM (
        SELECT score, row_number() OVER (ORDER BY score DESC, doc_id) AS rnk
        FROM scored WHERE is_cal
    ), kf
    WHERE rnk = k
    UNION ALL
    -- keep-everything fallback when too few calibration docs
    -- (k > n_cal): threshold = min int64, mirrored in the Spark plan
    SELECT n_cal, k, CAST(-9223372036854775807 - 1 AS BIGINT)
        AS threshold_score
    FROM kf WHERE k > n_cal
)
SELECT {CONF_ALPHA_PCT} AS alpha_pct,
       CAST(n_cal AS BIGINT) AS n_cal,
       CAST(k AS BIGINT) AS k,
       threshold_score,
       count(*) AS n_eval,
       CAST(sum(CASE WHEN score >= threshold_score THEN 1 ELSE 0 END)
            AS BIGINT) AS n_pass,
       {oracle_exact_ratio(
           "sum(CASE WHEN score >= threshold_score THEN 1 ELSE 0 END)",
           "greatest(count(*), 1)",
       )} AS eval_coverage
FROM scored, thr
WHERE NOT is_cal
GROUP BY n_cal, k, threshold_score
"""


@query("conformal_keep_threshold", oracle=_CONF_ORACLE)
def q_conformal_keep_threshold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split-conformal calibration of the hashed quality classifier:
    the score cutoff guaranteeing >= 90% pass rate on exchangeable
    documents, plus the measured held-out coverage (one row)."""
    docs = fan_out(load_table(spark, sf_dir, "documents"), spark)
    return conformal_keep_threshold(docs, spark)
