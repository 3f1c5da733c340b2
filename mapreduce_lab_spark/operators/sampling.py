"""Weighted deterministic sampling (Poisson design).

Extends the repo's reproducible-sampling story (uniform:
``deterministic_sample_orders``; stratified: curation.py) with
weight-proportional inclusion: row i is kept with probability
min(1, n · wᵢ / Σw) — the classic Poisson πps design — gated by the
same cross-engine md5 hash as every other sampling operator, so
membership is reproducible across runs, engines, partitionings, and
incremental loads (new rows never reshuffle old membership).

Determinism: the inclusion test compares hash32/2³² against
n·wᵢ/Σw in IEEE doubles with identical expression trees in Spark and
the DuckDB oracle (the all-integer form n·wᵢ·2³² vs hash·Σw would
overflow int64 at fleet scale). Both sides of the comparison are
single correctly-rounded operations, so the engines agree exactly.

Scale shape: one global aggregate for Σw (broadcast scalar), then a
narrow filter — no shuffle of the fact table at all.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from mapreduce_lab_spark.functions.hashing import hex8_int, oracle_hex8_int
from mapreduce_lab_spark.functions.numeric import oracle_units, to_units
from mapreduce_lab_spark.registry import query
from mapreduce_lab_spark.sources.tables import load_table

TARGET_SAMPLE_SIZE = 500


def weighted_sample(orders: DataFrame, n_target: int = TARGET_SAMPLE_SIZE) -> DataFrame:
    """~n_target orders sampled ∝ o_totalprice, hash-deterministic."""
    w_units = to_units("o_totalprice", 100)
    tot = orders.agg(F.sum(w_units).alias("sum_w"))
    gate = hex8_int(F.col("o_orderkey").cast("string")).cast("double") / F.lit(
        4294967296
    )
    thresh = (
        F.lit(n_target)
        * (w_units.cast("double") / F.col("sum_w"))
    )
    return (
        orders.crossJoin(F.broadcast(tot))
        .where(gate < thresh)
        .select("o_orderkey", "o_custkey", F.round("o_totalprice", 2).alias("price"))
    )


# --- train/val/test split -------------------------------------------------

SPLIT_TRAIN_PCT, SPLIT_VAL_PCT = 80, 10  # train 80 / val 10 / test 10


def train_val_test_split(docs: DataFrame) -> DataFrame:
    """Deterministic hash-based corpus split with per-split stats.

    Assignment is ``hash32(doc_id) mod 100`` against fixed percentage
    boundaries — the standard ML-pipeline split discipline: membership
    is a pure function of the row key, so it is stable across runs,
    engines, partitionings, and incremental loads (new documents never
    reshuffle old ones between splits, unlike ``randomSplit``).

    Scale shape: a narrow per-row expression, then one aggregation
    whose shuffle carries only (split, lang) keys and integer partial
    sums — the split itself never moves data. Char mass is summed as
    exact BIGINT so the stats hash-match cross-engine.
    """
    bucket = hex8_int(F.col("doc_id").cast("string")) % 100
    split = (
        F.when(bucket < SPLIT_TRAIN_PCT, F.lit("train"))
        .when(bucket < SPLIT_TRAIN_PCT + SPLIT_VAL_PCT, F.lit("val"))
        .otherwise(F.lit("test"))
    )
    return (
        docs.select(split.alias("split"), "lang", "n_chars")
        .groupBy("split", "lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").alias("sum_chars"),
        )
    )


@query(
    "train_val_test_split",
    oracle=f"""
    WITH assigned AS (
        SELECT CASE
                 WHEN {oracle_hex8_int("doc_id::VARCHAR")} % 100
                      < {SPLIT_TRAIN_PCT} THEN 'train'
                 WHEN {oracle_hex8_int("doc_id::VARCHAR")} % 100
                      < {SPLIT_TRAIN_PCT + SPLIT_VAL_PCT} THEN 'val'
                 ELSE 'test'
               END AS split,
               lang, n_chars
        FROM documents
    )
    SELECT split, lang, count(*) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS sum_chars
    FROM assigned GROUP BY split, lang
    """,
)
def q_train_val_test_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    return train_val_test_split(load_table(spark, sf_dir, "documents"))


# --- leakage-safe (family-aware) split -------------------------------------

# Canonicalization shared with curation.dedup_normalized: the family
# key is the md5 of lowercased text with non-alphanumerics squashed.
_CANON_RE = r"[^\p{L}\p{N}]+"
_O_CANON = (
    "md5(trim(regexp_replace(lower(text), '[^\\p{L}\\p{N}]+', ' ', 'g')))"
)


def leakage_safe_split(docs: DataFrame) -> DataFrame:
    """Train/val/test split assigned per DUPLICATE FAMILY, not per
    document: hash the canonicalized-text md5, so every exact/near-
    exact copy of a document lands in the SAME split.

    The per-doc-key split (``train_val_test_split``) leaks at 100 TB:
    web crawls carry the same page under many doc_ids, and hashing the
    id scatters those copies across train AND test — the model is then
    evaluated on its own training data. Keying the assignment on
    content canon instead makes the split a pure function of content:
    straddling is impossible by construction
    (tests/test_sampling.py pins this, and pins that the naive split
    DOES straddle on the same corpus).

    Scale shape: one narrow projection (md5 + hash gate, zero
    shuffle), then one aggregation shuffling only (split) keys with
    count/sum partials and an md5-distinct partial — same cost as the
    naive split plus the distinct-family sketch.
    """
    canon = F.trim(F.regexp_replace(F.lower(F.col("text")), _CANON_RE, " "))
    fam = F.md5(canon)
    bucket = hex8_int(fam) % 100
    split = (
        F.when(bucket < SPLIT_TRAIN_PCT, F.lit("train"))
        .when(bucket < SPLIT_TRAIN_PCT + SPLIT_VAL_PCT, F.lit("val"))
        .otherwise(F.lit("test"))
    )
    return (
        docs.select(split.alias("split"), fam.alias("fam"), "n_chars")
        .groupBy("split")
        .agg(
            F.count("*").alias("n_docs"),
            F.countDistinct("fam").alias("n_families"),
            F.sum("n_chars").alias("sum_chars"),
        )
    )


@query(
    "leakage_safe_split",
    oracle=f"""
    WITH assigned AS (
        SELECT CASE
                 WHEN {oracle_hex8_int(_O_CANON)} % 100
                      < {SPLIT_TRAIN_PCT} THEN 'train'
                 WHEN {oracle_hex8_int(_O_CANON)} % 100
                      < {SPLIT_TRAIN_PCT + SPLIT_VAL_PCT} THEN 'val'
                 ELSE 'test'
               END AS split,
               {_O_CANON} AS fam, n_chars
        FROM documents
    )
    SELECT split, count(*) AS n_docs,
           count(DISTINCT fam) AS n_families,
           CAST(sum(n_chars) AS BIGINT) AS sum_chars
    FROM assigned GROUP BY split
    """,
)
def q_leakage_safe_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    return leakage_safe_split(load_table(spark, sf_dir, "documents"))


# --- temperature-scaled corpus mixing -------------------------------------

MIX_W_UNITS = 1_000_000_000
MIX_TARGET_DEN = 2  # sample ~N/2 documents overall


def temperature_mix(docs: DataFrame) -> DataFrame:
    """Temperature-scaled language mixing (alpha = 0.5), the standard
    multilingual-corpus rebalancing step: sampling weight per language
    is share^alpha, which upsamples tail languages relative to their
    raw share. Returns per-language sampled counts + exact char mass.

    Exactness: w_l = floor(1e9 * sqrt(n_l / N)) — one exact IEEE sqrt
    and one floor on identical operands in both engines — after which
    everything is integer: target t_l = (T * w_l) div Σw, and the
    membership gate is u32 · n_l < t_l · 2³² in BIGINT (u32 = md5-based
    hash of doc_id), so ~t_l docs of language l are kept with zero
    float comparisons. n_l·u32 ≤ 2³²·n_l stays under 2⁶³ through
    n_l ≈ 2·10⁹ rows per language; past that the gate casts to
    DECIMAL(38,0).

    Scale shape: ONE per-language aggregate (|langs| rows) from which
    the totals, weights, and targets all derive via global windows
    OVER THAT TINY FRAME — never re-aggregating the corpus (the
    earlier crossJoin-a-1-row-total formulation consumed the stats
    subtree three times, so the documents scan ran 5x per execution;
    scripts/audit_scans.py, round 4). The SinglePartition window is
    over |langs| rows, not data. Targets then broadcast-join back and
    the corpus itself shuffles only as (lang, partials).
    """
    stats = docs.groupBy("lang").agg(F.count("*").alias("n_l"))
    wall = Window.partitionBy(F.lit(1))
    lang_w = stats.select(
        "lang", "n_l", F.sum("n_l").over(wall).alias("n_total")
    ).select(
        "lang",
        "n_l",
        "n_total",
        F.floor(
            F.sqrt(F.col("n_l").cast("double") / F.col("n_total").cast("double"))
            * F.lit(MIX_W_UNITS)
        ).alias("w_units"),
    )
    targets = lang_w.withColumn("sum_w", F.sum("w_units").over(wall)).select(
        "lang",
        "n_l",
        F.expr(f"((n_total div {MIX_TARGET_DEN}) * w_units) div sum_w").alias("t_l"),
    )
    gated = (
        docs.join(F.broadcast(targets), "lang")
        .where(
            hex8_int(F.col("doc_id").cast("string")) * F.col("n_l")
            < F.col("t_l") * F.lit(4294967296)
        )
    )
    return gated.groupBy("lang").agg(
        F.count("*").alias("n_sampled"),
        F.sum("n_chars").alias("sum_chars"),
    )


@query(
    "temperature_mix_sample",
    oracle=f"""
    WITH stats AS (SELECT lang, count(*) AS n_l FROM documents GROUP BY lang),
    tot AS (SELECT count(*) AS n_total FROM documents),
    lang_w AS (
        SELECT lang, n_l, n_total,
               CAST(floor(sqrt(CAST(n_l AS DOUBLE) / CAST(n_total AS DOUBLE))
                          * {MIX_W_UNITS}) AS BIGINT) AS w_units
        FROM stats, tot
    ),
    sw AS (SELECT CAST(sum(w_units) AS BIGINT) AS sum_w FROM lang_w),
    targets AS (
        SELECT lang, n_l,
               ((n_total // {MIX_TARGET_DEN}) * w_units) // sum_w AS t_l
        FROM lang_w, sw
    )
    SELECT d.lang, count(*) AS n_sampled, CAST(sum(d.n_chars) AS BIGINT) AS sum_chars
    FROM documents d JOIN targets t ON d.lang = t.lang
    WHERE {oracle_hex8_int("d.doc_id::VARCHAR")} * t.n_l < t.t_l * 4294967296
    GROUP BY d.lang
    """,
)
def q_temperature_mix_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    return temperature_mix(load_table(spark, sf_dir, "documents"))


@query(
    "weighted_sample_orders",
    oracle=f"""
    WITH tot AS (
        SELECT CAST(sum({oracle_units("o_totalprice", 100)}) AS BIGINT) AS sum_w
        FROM orders
    )
    SELECT o_orderkey, o_custkey, round(o_totalprice, 2) AS price
    FROM orders, tot
    WHERE CAST({oracle_hex8_int("o_orderkey::VARCHAR")} AS DOUBLE) / 4294967296
          < {TARGET_SAMPLE_SIZE}
            * (CAST({oracle_units("o_totalprice", 100)} AS DOUBLE) / sum_w)
    """,
)
def q_weighted_sample_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    return weighted_sample(load_table(spark, sf_dir, "orders"))


# --- deterministic fractional upsampling ----------------------------------

# Replication rate per language, in permille (1000 = keep as-is).
# The inverse of the downsampling ops (temperature mix, domain quota):
# a training mix UPSAMPLES scarce high-value sources by a fractional
# factor.
UPSAMPLE_PERMILLE = {"fr": 2500, "de": 1800, "zh": 1300}


def upsample_by_lang(docs: DataFrame, rates: dict[str, int] | None = None) -> DataFrame:
    """Replicate documents by per-language fractional rates, hash-
    deterministically: rate 2500‰ emits 2 copies of every doc plus a
    3rd for the 50% of docs whose md5 gate lands under the fractional
    remainder. Copies are explicit (doc_id, copy_idx) rows — exactly
    what a downstream packer/shuffler consumes — and membership of
    the extra copy is a pure function of doc_id, so incremental loads
    replicate consistently and re-runs are byte-stable.

    Scale shape: one narrow explode(sequence) per row, no shuffle at
    all until the audit rollup; the expected blow-up factor is the
    mix designer's number, never data-dependent.
    """
    rates = UPSAMPLE_PERMILLE if rates is None else rates
    rate = F.coalesce(
        *[F.when(F.col("lang") == lang, F.lit(pm)) for lang, pm in rates.items()],
        F.lit(1000),
    )
    gate = hex8_int(F.concat(F.lit("up:"), F.col("doc_id").cast("string"))) % 1000
    n_copies = (rate / 1000).cast("long") + (gate < rate % 1000).cast("long")
    # sequence(1, 0) yields the DESCENDING [1, 0] in Spark, while
    # DuckDB's generate_series(1, 0) is empty — so a sub-1000 rate
    # (a downsampling mix entry) would phantom-duplicate instead of
    # dropping. Emit an explicitly empty array for n_copies = 0.
    idx = F.when(n_copies >= 1, F.sequence(F.lit(1).cast("long"), n_copies)).otherwise(
        F.array().cast("array<long>")
    )
    copies = docs.select("doc_id", "lang", F.explode(idx).alias("copy_idx"))
    return copies.groupBy("lang").agg(
        F.count_distinct("doc_id").alias("n_docs"),
        F.count("*").alias("n_copies"),
    )


_UPSAMPLE_CASE = " ".join(
    f"WHEN lang = '{lang}' THEN {pm}" for lang, pm in UPSAMPLE_PERMILLE.items()
)

_UPSAMPLE_SQL = f"""
WITH rated AS (
    SELECT doc_id, lang,
           (CASE {_UPSAMPLE_CASE} ELSE 1000 END) AS rate,
           ({oracle_hex8_int("('up:' || CAST(doc_id AS STRING))")} % 1000) AS gate
    FROM documents
),
copies AS (
    SELECT doc_id, lang,
           unnest(generate_series(1, CAST(rate // 1000 AS BIGINT)
                                     + CASE WHEN gate < rate % 1000 THEN 1 ELSE 0 END))
               AS copy_idx
    FROM rated
)
SELECT lang, count(DISTINCT doc_id) AS n_docs, count(*) AS n_copies
FROM copies GROUP BY lang
"""


@query("upsample_by_lang", oracle=_UPSAMPLE_SQL)
def q_upsample_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language doc and copy counts after deterministic fractional
    upsampling (rates in UPSAMPLE_PERMILLE)."""
    return upsample_by_lang(load_table(spark, sf_dir, "documents"))


# --- data-constrained mixture planning (water-filling) ---------------------

# Repeat cap: no domain contributes more than 2 epochs of its available
# mass (data-constrained scaling keeps repetition low — repeating past
# ~4 epochs is near-worthless per Muennighoff et al. 2023, "Scaling
# Data-Constrained Language Models"; 2 stays in the safe zone).
WF_EPOCH_CAP = 2
# Budget = 3/2 of total available char mass: large enough that the
# uniform level exceeds every tail domain's cap on the synthetic
# distribution (en ~43% of mass, others ~14% each), so the saturation
# prefix and the redistribution branch are both exercised at every SF.
WF_BUDGET_NUM, WF_BUDGET_DEN = 3, 2


def mixture_water_fill(docs: DataFrame) -> DataFrame:
    """Per-domain token-budget allocation by exact integer water-filling.

    The mixture-planning stage of a data-constrained training run:
    given per-domain available mass ``avail`` (chars as the token
    proxy) and a global budget ``B``, allocate as EQUALLY as possible
    across domains — the maximally-flattened mix that upsamples tail
    domains hardest — subject to the repeat cap
    ``alloc_d <= WF_EPOCH_CAP * avail_d``. Budget freed by capped
    (saturated) domains flows to the rest, i.e. classic water-filling:
    saturated domains sit below the water level, every unsaturated
    domain gets the level.

    Exact integer construction (no floats anywhere): sort domains by
    cap ascending; domain i (1-based, D total, prefix-cap-sum P) is
    saturated iff ``cap_i * (D - i + 1) <= B - P_{i-1}`` — the
    classic prefix criterion; monotone because
    ``f(i+1) - f(i) = (D - i)(cap_i - cap_{i+1}) <= 0``, so the
    saturated set is exactly the first k rows. The rest each take
    ``L = (B - P_k) div (D - k)`` with the mod-remainder spread as +1
    to the first rows in the same order — Σ alloc == min(B, Σ cap)
    exactly, pinned in tests/test_sampling.py.

    Scale shape: the corpus aggregates ONCE to a |domains|-row frame;
    every window below runs over that tiny frame (same pattern as
    temperature_mix — never re-aggregating the corpus). At 100 TB the
    output is the plan table a broadcast gate then applies (the gate
    itself is demonstrated by temperature_mix/upsample_by_lang).

    Reference: no counterpart (fixed whole-corpus workload); superset
    surface for the training-pipeline mandate.
    """
    stats = docs.groupBy("lang").agg(F.sum("n_chars").alias("avail"))
    wall = Window.partitionBy(F.lit(1))
    worder = Window.partitionBy(F.lit(1)).orderBy("cap", "lang")
    frame = (
        stats.select("lang", "avail", (F.col("avail") * WF_EPOCH_CAP).alias("cap"))
        .select(
            "*",
            F.row_number().over(worder).alias("i"),
            F.count("*").over(wall).alias("d_n"),
            F.coalesce(
                F.sum("cap").over(worder.rowsBetween(Window.unboundedPreceding, -1)),
                F.lit(0),
            ).alias("p_prev"),
        )
        .withColumn(
            "budget",
            F.expr(f"(sum(avail) over ()) * {WF_BUDGET_NUM} div {WF_BUDGET_DEN}"),
        )
        .withColumn(
            "saturated",
            F.col("cap") * (F.col("d_n") - F.col("i") + 1)
            <= F.col("budget") - F.col("p_prev"),
        )
    )
    plan = (
        frame.select(
            "*",
            F.sum(F.col("saturated").cast("long")).over(wall).alias("k"),
            F.coalesce(
                F.sum(F.when(F.col("saturated"), F.col("cap"))).over(wall),
                F.lit(0),
            ).alias("p_k"),
        )
        .withColumn("m", F.col("d_n") - F.col("k"))
        .withColumn(
            "level",
            F.when(F.col("m") > 0, F.expr("(budget - p_k) div m")).otherwise(F.lit(0)),
        )
        .withColumn(
            "extra",
            F.when(F.col("m") > 0, F.expr("(budget - p_k) % m")).otherwise(F.lit(0)),
        )
        .withColumn(
            "alloc",
            F.when(F.col("saturated"), F.col("cap")).otherwise(
                F.col("level")
                + F.when(F.col("i") - F.col("k") <= F.col("extra"), 1).otherwise(0)
            ),
        )
    )
    return plan.select(
        "lang",
        "avail",
        F.col("cap").alias("cap_chars"),
        F.col("alloc").alias("alloc_chars"),
        F.expr("alloc * 1000000 div avail").alias("epochs_ppm"),
        "saturated",
    )


@query(
    "mixture_water_fill",
    oracle=f"""
    WITH stats AS (
      SELECT lang, CAST(sum(n_chars) AS BIGINT) AS avail FROM documents GROUP BY lang
    ), frame AS (
      SELECT lang, avail, avail * {WF_EPOCH_CAP} AS cap,
             CAST(row_number() OVER (ORDER BY avail * {WF_EPOCH_CAP}, lang)
                  AS BIGINT) AS i,
             CAST(count(*) OVER () AS BIGINT) AS d_n,
             CAST(coalesce(sum(avail * {WF_EPOCH_CAP}) OVER
                    (ORDER BY avail * {WF_EPOCH_CAP}, lang
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                  AS BIGINT) AS p_prev,
             (CAST(sum(avail) OVER () AS BIGINT) * {WF_BUDGET_NUM})
               // {WF_BUDGET_DEN} AS budget
      FROM stats
    ), flagged AS (
      SELECT *, cap * (d_n - i + 1) <= budget - p_prev AS saturated FROM frame
    ), planned AS (
      SELECT *,
             CAST(sum(CASE WHEN saturated THEN 1 ELSE 0 END) OVER () AS BIGINT) AS k,
             CAST(coalesce(sum(CASE WHEN saturated THEN cap END) OVER (), 0)
                  AS BIGINT) AS p_k
      FROM flagged
    ), leveled AS (
      SELECT *,
             CASE WHEN d_n - k > 0 THEN (budget - p_k) // (d_n - k) ELSE 0 END
               AS level,
             CASE WHEN d_n - k > 0 THEN (budget - p_k) % (d_n - k) ELSE 0 END
               AS extra
      FROM planned
    )
    SELECT lang, avail, cap AS cap_chars,
           CASE WHEN saturated THEN cap
                ELSE level + CASE WHEN i - k <= extra THEN 1 ELSE 0 END
           END AS alloc_chars,
           (CASE WHEN saturated THEN cap
                 ELSE level + CASE WHEN i - k <= extra THEN 1 ELSE 0 END
            END) * 1000000 // avail AS epochs_ppm,
           saturated
    FROM leveled
    """,
)
def q_mixture_water_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    return mixture_water_fill(load_table(spark, sf_dir, "documents"))
