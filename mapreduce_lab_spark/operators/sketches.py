"""Mergeable cardinality sketches: HLL partial rollup + KMV estimate.

The 100 TB pattern this module pins: distinct counts computed as
RE-AGGREGABLE SKETCH PARTIALS (per day/partition) that union into
coarser rollups without touching raw data again — the sketch analog
of ``incremental_daily_revenue``'s partial-sum contract. An exact
count_distinct cannot be merged (yesterday's count + today's count
double-counts returning users); a sketch can.

Operators (plus CMS frequency and bottom-k quantiles below, and the
KMV set-algebra pairwise corpus overlap at the end of the module):

- ``hll_union_users`` — Spark's native Datasketches HLL:
  ``hll_sketch_agg`` per (event_type, day), ``hll_union_agg`` across
  days, estimate per type. NOT registered (retired round 11: the
  sketch binary is engine-specific, so the driver could only check
  rows; the portable twin below carries the registry surface); the
  accuracy and merge-vs-direct consistency are pinned in tests.
- ``hll_portable_users`` — the same daily-partial/union rollup as a
  hand-rolled HLL on the portable md5 hash, register math exact in
  both engines, FULLY oracle-checked (see its docstring for the
  cross-engine determinism argument, including the linear-counting
  floor-gap proof).
- ``kmv_distinct_users`` — a K-Minimum-Values sketch built from
  first principles on the engine-portable md5 hash, so the ENTIRE
  sketch pipeline is deterministic and oracle-checked: both engines
  keep the k smallest 32-bit hash values per group and apply the
  same floor-division estimator ``(k-1)·2^32 / h_k`` (exact count
  when a group has fewer than k distinct hashes). Same estimator
  family as HLL's cousin bottom-k; error ~1/√k.

Scale shape: both sketches reduce users to integer hashes before any
shuffle; the KMV k-smallest runs as a per-group rank over DISTINCT
hashes (group count × k rows survive). At true scale the KMV partial
per partition is its own k-smallest list merged associatively — the
window form here is the compact equivalent at one level; the HLL
path IS the production partial-merge (binary sketch partials).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from mapreduce_lab_spark.functions.hashing import hex8_int, oracle_hex8_int
from mapreduce_lab_spark.functions.numeric import to_units
from mapreduce_lab_spark.functions.text import tokenize
from mapreduce_lab_spark.operators.dedup import _ORACLE_SHINGLES, shingles
from mapreduce_lab_spark.registry import query
from mapreduce_lab_spark.sources.tables import fan_out, load_table

KMV_K = 256
_2_32 = 4_294_967_296


def hll_union_users(events: DataFrame) -> DataFrame:
    """Daily HLL partials per event_type, unioned to a per-type
    estimate — the rollup never rescans raw events."""
    daily = events.groupBy("event_type", F.to_date("ts").alias("day")).agg(
        F.hll_sketch_agg("user_id").alias("sk")
    )
    return daily.groupBy("event_type").agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("approx_users")
    )


# Retired from the registry in round 11 (VERDICT r10 task #7): the
# native Datasketches binary is engine-specific so the driver could
# only check rows; hll_portable_users carries the same daily-partial/
# union capability behind a full oracle. Accuracy and merge-vs-direct
# consistency stay pinned in tests/test_sketches.py.
def q_hll_union_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    return hll_union_users(load_table(spark, sf_dir, "events"))


def kmv_distinct_users(events: DataFrame, k: int = KMV_K) -> DataFrame:
    h = hex8_int(F.col("user_id").cast("string"))
    dh = events.select("event_type", h.alias("h")).distinct()
    ranked = dh.withColumn(
        "rn", F.row_number().over(Window.partitionBy("event_type").orderBy("h"))
    ).where(F.col("rn") <= k)
    kth = ranked.groupBy("event_type").agg(
        F.max("h").alias("h_k"), F.count("*").alias("n_min")
    )
    est = F.when(F.col("n_min") < k, F.col("n_min")).otherwise(
        F.floor(F.lit(float((k - 1) * _2_32)) / F.col("h_k"))
    )
    return kth.select("event_type", est.alias("est_users"))


_KMV_SQL = f"""
WITH dh AS (
    SELECT DISTINCT event_type,
           {oracle_hex8_int("CAST(user_id AS STRING)")} AS h
    FROM events
),
ranked AS (
    SELECT event_type, h,
           row_number() OVER (PARTITION BY event_type ORDER BY h) AS rn
    FROM dh
),
kth AS (
    SELECT event_type, max(h) AS h_k, count(*) AS n_min
    FROM ranked WHERE rn <= {KMV_K}
    GROUP BY event_type
)
SELECT event_type,
       CASE WHEN n_min < {KMV_K} THEN n_min
            ELSE CAST(floor({float((KMV_K - 1) * _2_32)} / h_k) AS BIGINT)
       END AS est_users
FROM kth
"""


@query("kmv_distinct_users", oracle=_KMV_SQL)
def q_kmv_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV distinct-user estimate per event_type, bit-identical in
    both engines (portable hash + identical floor estimator)."""
    return kmv_distinct_users(load_table(spark, sf_dir, "events"))


# --- portable HyperLogLog --------------------------------------------------

# Precision p=8: m=256 registers, standard error 1.04/sqrt(256) = 6.5%.
HLL_P = 8
HLL_M = 1 << HLL_P
_HLL_W_BITS = 32 - HLL_P  # low bits that feed the rank
_HLL_W_MOD = 1 << _HLL_W_BITS
# alpha_m * m^2 evaluated ONCE here and embedded as the same literal
# in both engines, so the raw estimate is a single identical IEEE
# division on both sides (same discipline as exact_ratio).
_HLL_ALPHA_M2 = 0.7213 / (1 + 1.079 / HLL_M) * HLL_M * HLL_M
_HLL_LINEAR_MAX = 2.5 * HLL_M  # below this, linear counting applies


def hll_portable_users(events: DataFrame) -> DataFrame:
    """Hand-rolled HLL distinct-user estimate per event_type, built as
    DAILY REGISTER PARTIALS max-merged across days — the same
    partial->union rollup shape as ``hll_union_users``, but every step
    is engine-portable and oracle-checked (the native Datasketches
    binary is not).

    Register math is exact in both engines by construction:

    - hash: the portable md5-based 32-bit ``hex8_int``; top p bits
      pick the register, the rank is leading-zeros(+1) of the low
      24 bits, computed as ``25 - length(bin(w))`` — ``bin`` drops
      leading zeros identically in Spark and DuckDB, no float log.
    - harmonic denominator: sum of 2^-rank terms. Every term and
      every partial sum is a multiple of 2^-24 bounded by m, well
      inside 53 significand bits, so S is EXACT (order-independent)
      in IEEE double — no fold-order discipline needed.
    - raw estimate: one shared alpha*m^2 literal divided by S — a
      single identical IEEE op per engine.
    - small-range correction: linear counting ``m * ln(m/V)`` when
      raw <= 2.5m and V > 0 (V = empty registers). ln is the one
      libm call; safe because V has only m possible values and the
      closest ``m*ln(m/V)`` comes to an integer over all of them is
      3.8e-4 (V=164) — six orders of magnitude wider than any
      cross-libm divergence, so floor() cannot flip (checked
      executably in tests/test_sketches.py).

    Scale shape: users reduce to 32-bit hashes before any shuffle;
    the shuffled payload is (type, day, bucket, rank<=25) — at most
    types x days x 256 rows survive the partial, and the cross-day
    merge touches registers, never raw events. This is the
    production contract: yesterday's 256 small ints + today's 256
    small ints = the exact union estimate, no rescan.
    """
    h = hex8_int(F.col("user_id").cast("string"))
    hashed = events.select(
        "event_type",
        F.to_date("ts").alias("day"),
        (h / _HLL_W_MOD).cast("long").alias("bucket"),
        (h % _HLL_W_MOD).alias("w"),
    )
    rank = F.when(F.col("w") == 0, _HLL_W_BITS + 1).otherwise(
        _HLL_W_BITS + 1 - F.length(F.bin(F.col("w")))
    )
    daily = hashed.groupBy("event_type", "day", "bucket").agg(
        F.max(rank).alias("reg")
    )
    merged = daily.groupBy("event_type", "bucket").agg(F.max("reg").alias("reg"))
    per_type = merged.groupBy("event_type").agg(
        F.count("*").alias("n_occ"),
        # 2^-reg via integer shift + exact double division (pow() is
        # exact for powers of two on any sane libm, but the shift
        # never depends on libm at all).
        F.sum(F.expr("1.0D / double(shiftleft(1L, reg))")).alias("s_occ"),
    )
    s = F.col("s_occ") + (F.lit(HLL_M) - F.col("n_occ")).cast("double")
    v = F.lit(HLL_M) - F.col("n_occ")
    raw = F.lit(_HLL_ALPHA_M2) / s
    est = F.when(
        (raw <= F.lit(_HLL_LINEAR_MAX)) & (v > 0),
        F.floor(F.lit(float(HLL_M)) * F.log(F.lit(float(HLL_M)) / v.cast("double"))),
    ).otherwise(F.floor(raw))
    return per_type.select("event_type", est.cast("long").alias("est_users"))


_HLL_SQL = f"""
WITH hashed AS (
    SELECT event_type, CAST(ts AS DATE) AS day,
           {oracle_hex8_int("CAST(user_id AS STRING)")} // {_HLL_W_MOD} AS bucket,
           {oracle_hex8_int("CAST(user_id AS STRING)")} % {_HLL_W_MOD} AS w
    FROM events
),
daily AS (
    SELECT event_type, day, bucket,
           max(CASE WHEN w = 0 THEN {_HLL_W_BITS + 1}
                    ELSE {_HLL_W_BITS + 1} - length(bin(w)) END) AS reg
    FROM hashed GROUP BY 1, 2, 3
),
merged AS (
    SELECT event_type, bucket, max(reg) AS reg
    FROM daily GROUP BY 1, 2
),
per_type AS (
    SELECT event_type, count(*) AS n_occ,
           sum(1.0::DOUBLE / (1::BIGINT << reg)) AS s_occ
    FROM merged GROUP BY 1
)
SELECT event_type,
       CAST(CASE WHEN {_HLL_ALPHA_M2!r} / (s_occ + ({HLL_M} - n_occ))
                      <= {_HLL_LINEAR_MAX!r}
                  AND n_occ < {HLL_M}
            THEN floor({float(HLL_M)!r} * ln({float(HLL_M)!r} / ({HLL_M} - n_occ)))
            ELSE floor({_HLL_ALPHA_M2!r} / (s_occ + ({HLL_M} - n_occ)))
       END AS BIGINT) AS est_users
FROM per_type
"""


@query("hll_portable_users", oracle=_HLL_SQL)
def q_hll_portable_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Portable HLL (p=8) distinct users per event_type via daily
    register partials — fully oracle-checked, unlike the native-sketch
    twin ``hll_union_users``."""
    return hll_portable_users(load_table(spark, sf_dir, "events"))


# --- count-min sketch -----------------------------------------------------

CMS_D = 4  # hash rows
CMS_W = 1024  # columns per row
CMS_TOPK = 20


def cms_word_frequency(
    documents: DataFrame, d: int = CMS_D, w: int = CMS_W, k: int = CMS_TOPK
) -> DataFrame:
    """Count-min sketch over document tokens, probed at the exact
    top-k words: (word, n_exact, n_cms).

    The frequency analog of the KMV cardinality sketch: the whole
    pipeline is built on the engine-portable md5 hash, so the sketch
    cells AND the estimates are bit-identical in both engines and the
    oracle replays the full construction. The CMS guarantee
    ``n_cms >= n_exact`` (one-sided error, bounded by 2N/w with
    probability 1-2^-d) is pinned in tests/test_sketches.py.

    Scale shape: the cell table is FIXED at d*w rows regardless of
    corpus size, built by a map-side-combinable sum — the same
    mergeable-partial contract as the HLL rollup above (per-day cell
    tables add cell-wise into coarser rollups without rescanning raw
    text). Probing is a broadcast join of d*k rows. The exact top-k
    here is the probe-set CHOICE, not part of the sketch — a
    production probe set would be a fixed vocabulary.
    """
    wc = (
        documents.select(F.explode(tokenize(F.col("text"))).alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("n_exact"))
        # Feeds cells, the top-k probe set, and the probe positions —
        # three consumers in one action; eager checkpoint computes the
        # token aggregation exactly once (same rationale as the
        # triangle edge table, operators/graph.py).
        .localCheckpoint()
    )
    pos_arr = F.array(
        *[
            hex8_int(F.concat(F.lit(f"cms:{r}:"), F.col("word"))) % w
            for r in range(d)
        ]
    )
    cells = (
        wc.select("n_exact", F.posexplode(pos_arr).alias("r", "pos"))
        .groupBy("r", "pos")
        .agg(F.sum("n_exact").alias("cell_n"))
    )
    top = wc.orderBy(F.desc("n_exact"), "word").limit(k)
    probe = top.select("word", "n_exact", F.posexplode(pos_arr).alias("r", "pos"))
    return (
        probe.join(F.broadcast(cells), ["r", "pos"])
        .groupBy("word", "n_exact")
        .agg(F.min("cell_n").alias("n_cms"))
    )


def _cms_sql(d: int = CMS_D, w: int = CMS_W, k: int = CMS_TOPK) -> str:
    rs = ", ".join(str(r) for r in range(d))
    h = oracle_hex8_int("('cms:' || CAST(r AS STRING) || ':' || word)")
    return f"""
    WITH wc AS (
        SELECT word, count(*) AS n_exact
        FROM (
          SELECT unnest(regexp_split_to_array(text, '[^\\p{{L}}]+')) AS word
          FROM documents
        )
        WHERE word <> ''
        GROUP BY word
    ),
    pos AS (
        SELECT word, n_exact, r, ({h} % {w}) AS pos
        FROM wc, (SELECT unnest([{rs}]) AS r)
    ),
    cells AS (
        SELECT r, pos, CAST(sum(n_exact) AS BIGINT) AS cell_n
        FROM pos GROUP BY r, pos
    ),
    top AS (SELECT word, n_exact FROM wc ORDER BY n_exact DESC, word LIMIT {k})
    SELECT t.word, t.n_exact, min(c.cell_n) AS n_cms
    FROM top t
    JOIN pos p ON p.word = t.word
    JOIN cells c ON c.r = p.r AND c.pos = p.pos
    GROUP BY t.word, t.n_exact
    """


@query("cms_word_frequency", oracle=_cms_sql())
def q_cms_word_frequency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CMS frequency estimates at the exact top-20 words — the full
    sketch construction verified bit-for-bit against the oracle's
    replay of the same cells."""
    return cms_word_frequency(load_table(spark, sf_dir, "documents"))


# --- bottom-k sample quantile sketch --------------------------------------

QSK_K = 512  # sample size per group


def sampled_quantiles_prices(orders: DataFrame, k: int = QSK_K) -> DataFrame:
    """Mergeable quantile estimates per order priority from a bottom-k
    hash sample — the quantile member of the sketch triad (KMV =
    cardinality, CMS = frequency, this = quantiles).

    The k rows with the smallest portable hash of the row key are a
    uniform sample whose membership is a pure function of the key —
    so the sketch MERGES exactly (bottom-k of a union = bottom-k of
    the parts' bottom-k's, pinned in tests) and both engines select
    the identical sample. Quantiles are then the lower (type-1)
    order statistic of the sample at index floor((n-1)·q): integer
    index math on exact cent values, no interpolation float in either
    engine.

    Scale shape: at true scale the bottom-k runs as per-partition
    top-k partials merged associatively (the window form here is the
    one-level equivalent, group count × k rows survive the shuffle);
    the estimate pass touches k rows per group. Error ~1/sqrt(k) on
    quantile rank.
    """
    h = hex8_int(F.col("o_orderkey").cast("string"))
    sample = (
        orders.select(
            "o_orderpriority",
            to_units("o_totalprice", 100).alias("cents"),
            h.alias("h"),
            "o_orderkey",
        )
        .withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("o_orderpriority").orderBy("h", "o_orderkey")
            ),
        )
        .where(F.col("rn") <= k)
    )
    ranked = sample.select(
        "o_orderpriority",
        "cents",
        F.row_number()
        .over(Window.partitionBy("o_orderpriority").orderBy("cents", "o_orderkey"))
        .alias("vr"),
        F.count("*").over(Window.partitionBy("o_orderpriority")).alias("n"),
    )
    est = ranked.where(
        (F.col("vr") - 1 == F.floor((F.col("n") - 1) * 0.5))
        | (F.col("vr") - 1 == F.floor((F.col("n") - 1) * 0.9))
    )
    return (
        est.groupBy("o_orderpriority")
        .agg(
            F.max("n").alias("n_sample"),
            (F.min("cents").cast("double") / 100).alias("est_median"),
            (F.max("cents").cast("double") / 100).alias("est_p90"),
        )
    )


_QSK_SQL = f"""
WITH sample AS (
    SELECT o_orderpriority,
           CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
           o_orderkey,
           row_number() OVER (
               PARTITION BY o_orderpriority
               ORDER BY {oracle_hex8_int("CAST(o_orderkey AS STRING)")}, o_orderkey
           ) AS rn
    FROM orders
),
ranked AS (
    SELECT o_orderpriority, cents,
           row_number() OVER (PARTITION BY o_orderpriority
                              ORDER BY cents, o_orderkey) AS vr,
           count(*) OVER (PARTITION BY o_orderpriority) AS n
    FROM sample WHERE rn <= {QSK_K}
)
SELECT o_orderpriority,
       max(n) AS n_sample,
       CAST(min(cents) AS DOUBLE) / 100 AS est_median,
       CAST(max(cents) AS DOUBLE) / 100 AS est_p90
FROM ranked
WHERE vr - 1 = CAST(floor((n - 1) * 0.5) AS BIGINT)
   OR vr - 1 = CAST(floor((n - 1) * 0.9) AS BIGINT)
GROUP BY o_orderpriority
"""


@query("sampled_quantiles_prices", oracle=_QSK_SQL)
def q_sampled_quantiles_prices(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Median/p90 order price per priority from the mergeable bottom-k
    hash sample, bit-identical in both engines."""
    return sampled_quantiles_prices(load_table(spark, sf_dir, "orders"))


# --- KMV set algebra: cross-corpus overlap estimation -----------------------

_O_TOKENS = "[t for t in regexp_split_to_array(text, '[^\\p{L}]+') if t <> '']"


def kmv_corpus_overlap(docs: DataFrame, k: int = KMV_K) -> DataFrame:
    """Pairwise corpus overlap (union / intersection / Jaccard of the
    word-3-gram shingle sets) estimated from per-corpus KMV sketches —
    the planning probe a 100 TB pipeline runs BEFORE committing to a
    cross-corpus dedup join (skip pairs whose estimated overlap is
    negligible). Corpus = the documents ``source`` column.

    Multiset-operation KMV (Beyer et al. 2007, "On Synopses for
    Distinct-Value Estimation"): each corpus keeps its k smallest
    distinct shingle hashes; for a pair, the k smallest of the two
    sketches' union form the union sketch (n kept, K = its max),
    ``union_est = n < k ? n : floor((k-1)*2^32 / K)`` (exact when the
    union fits the sketch), and the fraction rho of kept hashes
    present in BOTH sketches estimates Jaccard, so
    ``inter_est = rho_num * union_est div n``. All-integer estimators
    on the same md5-derived hashes in both engines -> bit-identical
    (same discipline as kmv_distinct_users above).

    Scale shape: ONE distinct-aggregate over (corpus, shingle-hash)
    (map-side partial collapses repeats), a per-corpus top-k window
    over the distinct stream, and then ALL pair algebra runs on
    |corpora| * k sketch rows — the corpus text is never joined
    pairwise. Sketches are mergeable: daily/per-shard partials union
    then re-rank, the same contract as the HLL register partials
    above. Shingles (not unigrams) because the synthetic corpus draws
    every doc from one 31-word vocabulary — unigram sets are identical
    across corpora, while 3-gram sets overlap partially (~2-3%%
    Jaccard), so the estimator is actually exercised.
    """
    sh = (
        docs.select("source", tokenize(F.col("text")).alias("_tk"))
        .select("source", F.explode(shingles(F.col("_tk"))).alias("s"))
        .select("source", hex8_int("s").alias("h"))
        .distinct()
    )
    sk = (
        sh.withColumn(
            "rn", F.row_number().over(Window.partitionBy("source").orderBy("h"))
        )
        .where(F.col("rn") <= k)
        .select("source", "h")
        # EAGER localCheckpoint, not cache: the sketch feeds three
        # physical subtrees (the sources list and both sides of the
        # pair expansion), and a lazy cache lets concurrent stages of
        # one action race to compute the full tokenize+hash+distinct
        # upstream before any of them populates it. The sketch is
        # |corpora| * k rows regardless of corpus size (round-13,
        # measured 2.9 -> 1.7 s warm at sf0.1).
        .localCheckpoint()
    )
    # Pair list = |corpora| choose 2 rows; each pair's union sketch is
    # the distinct hashes of BOTH members' sketches (<= 2k rows per
    # pair), tagged with how many sides carry the hash.
    srcs = sk.select("source").distinct()
    pairs = (
        srcs.select(F.col("source").alias("source_a"))
        .crossJoin(srcs.select(F.col("source").alias("source_b")))
        .where(F.col("source_a") < F.col("source_b"))
    )
    sides = pairs.join(
        sk.select(F.col("source").alias("source_a"), "h"), "source_a"
    ).select("source_a", "source_b", "h").unionByName(
        pairs.join(
            sk.select(F.col("source").alias("source_b"), "h"), "source_b"
        ).select("source_a", "source_b", "h")
    )
    merged = sides.groupBy("source_a", "source_b", "h").agg(
        (F.count("*") == 2).cast("long").alias("in_both")
    )
    ranked = merged.withColumn(
        "rn",
        F.row_number().over(
            Window.partitionBy("source_a", "source_b").orderBy("h")
        ),
    ).where(F.col("rn") <= k)
    est = ranked.groupBy("source_a", "source_b").agg(
        F.count("*").alias("n_kept"),
        F.max("h").alias("h_k"),
        F.sum("in_both").alias("rho_num"),
    )
    union_est = F.when(F.col("n_kept") < k, F.col("n_kept")).otherwise(
        F.floor(F.lit(float((k - 1) * _2_32)) / F.col("h_k")).cast("long")
    )
    return est.select(
        "source_a",
        "source_b",
        union_est.alias("union_est"),
        F.expr("rho_num * 1000000 div n_kept").alias("jaccard_ppm"),
        F.col("rho_num"),
        F.col("n_kept"),
    ).withColumn(
        "inter_est", F.expr("rho_num * union_est div n_kept")
    ).drop("rho_num", "n_kept")


_KMV_OVERLAP_SQL = f"""
WITH toks AS (
    SELECT source, {_O_TOKENS.replace('text', 'text')} AS tk FROM documents
),
dh AS (
    SELECT DISTINCT source, {oracle_hex8_int('s')} AS h
    FROM (SELECT source, unnest({_ORACLE_SHINGLES}) AS s FROM toks)
),
sk AS (
    SELECT source, h FROM (
        SELECT source, h,
               row_number() OVER (PARTITION BY source ORDER BY h) AS rn
        FROM dh
    ) WHERE rn <= {KMV_K}
),
pairs AS (
    SELECT a.source AS source_a, b.source AS source_b
    FROM (SELECT DISTINCT source FROM sk) a,
         (SELECT DISTINCT source FROM sk) b
    WHERE a.source < b.source
),
sides AS (
    SELECT p.source_a, p.source_b, s.h
    FROM pairs p JOIN sk s ON s.source = p.source_a
    UNION ALL
    SELECT p.source_a, p.source_b, s.h
    FROM pairs p JOIN sk s ON s.source = p.source_b
),
merged AS (
    SELECT source_a, source_b, h,
           CASE WHEN count(*) = 2 THEN 1 ELSE 0 END AS in_both
    FROM sides GROUP BY source_a, source_b, h
),
ranked AS (
    SELECT source_a, source_b, h, in_both,
           row_number() OVER (PARTITION BY source_a, source_b ORDER BY h) AS rn
    FROM merged
),
est AS (
    SELECT source_a, source_b, count(*) AS n_kept, max(h) AS h_k,
           CAST(sum(in_both) AS BIGINT) AS rho_num
    FROM ranked WHERE rn <= {KMV_K}
    GROUP BY source_a, source_b
)
SELECT source_a, source_b,
       CASE WHEN n_kept < {KMV_K} THEN n_kept
            ELSE CAST(floor({float((KMV_K - 1) * _2_32)} / h_k) AS BIGINT)
       END AS union_est,
       rho_num * 1000000 // n_kept AS jaccard_ppm,
       rho_num * (CASE WHEN n_kept < {KMV_K} THEN n_kept
                       ELSE CAST(floor({float((KMV_K - 1) * _2_32)} / h_k)
                            AS BIGINT)
                  END) // n_kept AS inter_est
FROM est
"""


@query("kmv_corpus_overlap", oracle=_KMV_OVERLAP_SQL)
def q_kmv_corpus_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise source-corpus shingle overlap from mergeable KMV
    sketches — union/intersection/Jaccard without a cross-corpus
    join. fan_out: the shingle+hash pass is compute-heavy per row, so
    a single-split scan must not serialize it onto one core."""
    return kmv_corpus_overlap(
        fan_out(load_table(spark, sf_dir, "documents"), spark)
    )
