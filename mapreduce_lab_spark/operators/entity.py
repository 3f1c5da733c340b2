"""Entity resolution: blocked candidate generation + Fellegi-Sunter
agreement scoring over the part catalog.

Superset surface (absent in the reference, SURVEY §2.3): record
linkage — "are these two catalog rows the same real-world entity?" —
the structured-record twin of the document near-dup lane. The method
is the classic public pipeline (Fellegi & Sunter 1969; Christen's
*Data Matching* 2012 survey):

1. **Blocking**: candidate pairs are generated only within blocks
   sharing (name noun, brand) — never all-pairs.
2. **Sorted-neighborhood within the block** (Hernandez & Stolfo
   1995): records are ordered by (size, price, key) and each record
   pairs with its next ``ER_WINDOW`` neighbors — candidates are
   <= ER_WINDOW * n BY CONSTRUCTION, immune to the quadratic blowup
   an oversized block would otherwise cause (the same cure the dedup
   lane's SNM queries use, applied inside blocks). This matters here
   specifically because the blocking key space is BOUNDED (nouns x
   brands is a fixed categorical product), so raw within-block
   pairing would be n² at 100 TB — the constant-bucket LSH lesson
   from docs/SCALE.md, designed out from the start.
3. **Agreement vector + log-odds score**: per pair, binary agreement
   on modifier / type / size / price-within-$1, each contributing a
   fixed integer Fellegi-Sunter weight (agreement weights positive,
   disagreement negative, deci-ban scale). The score census — not
   the raw pair list — is the query output, so the result stays a
   <= 2^4-row frame at any scale.

Scale shape: one shuffle to sort blocks (window over the block key),
lead() pairing inside the sorted run (no join at all — the candidate
pair never leaves the task that holds both rows), then a map-side
combinable census aggregation. No BNLJ, no cross join; the plan is
two exchanges end to end regardless of data size.

Cross-engine exactness: every score component is integer (price
compared in exact cents via round(x*100)), so the census is
bit-stable. The DuckDB oracle computes the identical window/lead
pipeline in SQL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from mapreduce_lab_spark.functions.numeric import (
    exact_ratio,
    oracle_exact_ratio,
    to_units,
)
from mapreduce_lab_spark.registry import query
from mapreduce_lab_spark.sources.tables import load_table

# Sorted-neighborhood window width inside each block.
ER_WINDOW = 3

# Fellegi-Sunter weights x10 (deci-bans): (agreement, disagreement).
# Modifier identity is the strongest evidence (it completes the name);
# type, then size, then price-within-$1.
ER_WEIGHTS = {
    "modifier": (40, -20),
    "type": (30, -10),
    "size": (20, -10),
    "price": (20, -10),
}
# Pairs scoring >= this are declared matches (sum of top-2 agreements
# + bottom-2 disagreements = 50; requiring 70 means at least three of
# the four fields agree).
ER_MATCH_THRESHOLD = 70

PRICE_TOL_CENTS = 100  # "price agrees" = within $1, exact cents


def entity_resolution_scores(part: DataFrame) -> DataFrame:
    """Score census: one row per (agreement-vector, score) pattern
    with the candidate-pair count, a match flag, and the pattern's
    share of all candidates.

    Output cardinality is bounded by the 2^4 agreement patterns.
    """
    recs = part.select(
        "p_partkey",
        F.split(F.col("p_name"), " ").getItem(0).alias("modifier"),
        F.split(F.col("p_name"), " ").getItem(1).alias("noun"),
        "p_brand",
        "p_type",
        "p_size",
        to_units(F.col("p_retailprice"), 100).alias("pu"),
    )
    w = Window.partitionBy("noun", "p_brand").orderBy("p_size", "pu", "p_partkey")
    me = F.struct("modifier", "p_type", "p_size", "pu")
    # Window expressions must be projected before they can feed the
    # explode (Catalyst rejects a window call nested in a generator).
    led = recs.select(
        me.alias("a"),
        *[F.lead(me, i).over(w).alias(f"_n{i}") for i in range(1, ER_WINDOW + 1)],
    )
    nbrs = F.array(*[F.col(f"_n{i}") for i in range(1, ER_WINDOW + 1)])
    pairs = led.select("a", F.explode(nbrs).alias("b")).where(F.col("b").isNotNull())
    agree = {
        "modifier": (F.col("a.modifier") == F.col("b.modifier")).cast("int"),
        "type": (F.col("a.p_type") == F.col("b.p_type")).cast("int"),
        "size": (F.col("a.p_size") == F.col("b.p_size")).cast("int"),
        "price": (
            F.abs(F.col("a.pu") - F.col("b.pu")) <= PRICE_TOL_CENTS
        ).cast("int"),
    }
    score = None
    for field, (wa, wd) in ER_WEIGHTS.items():
        term = F.when(agree[field] == 1, F.lit(wa)).otherwise(F.lit(wd))
        score = term if score is None else (score + term)
    scored = pairs.select(
        *[agree[f].alias(f"agree_{f}") for f in ER_WEIGHTS],
        score.alias("score"),
    )
    # Grand total via an unpartitioned window over the <= 2^4-row
    # census frame: one scan of the pair pipeline, no second lineage.
    total = F.sum("n_pairs").over(Window.partitionBy())
    return (
        scored.groupBy(*[f"agree_{f}" for f in ER_WEIGHTS], "score")
        .agg(F.count(F.lit(1)).alias("n_pairs"))
        .select(
            "agree_modifier",
            "agree_type",
            "agree_size",
            "agree_price",
            "score",
            (F.col("score") >= ER_MATCH_THRESHOLD).cast("int").alias("is_match"),
            "n_pairs",
            exact_ratio(F.col("n_pairs"), total).alias("pair_share"),
        )
    )


def _er_oracle() -> str:
    lead_cols = ",\n             ".join(
        f"lead({c}, {i}) OVER w AS {c}_{i}"
        for i in range(1, ER_WINDOW + 1)
        for c in ("modifier", "p_type", "p_size", "pu")
    )
    legs = " UNION ALL ".join(
        f"""
        SELECT modifier AS am, p_type AS at, p_size AS asz, pu AS apu,
               modifier_{i} AS bm, p_type_{i} AS bt, p_size_{i} AS bsz,
               pu_{i} AS bpu
        FROM nbr WHERE modifier_{i} IS NOT NULL"""
        for i in range(1, ER_WINDOW + 1)
    )
    terms = []
    for field, (wa, wd) in ER_WEIGHTS.items():
        a = {
            "modifier": "am = bm",
            "type": "at = bt",
            "size": "asz = bsz",
            "price": f"abs(apu - bpu) <= {PRICE_TOL_CENTS}",
        }[field]
        terms.append(f"CASE WHEN {a} THEN {wa} ELSE {wd} END")
    agree_cols = ",\n             ".join(
        f"CAST({cond} AS INTEGER) AS agree_{field}"
        for field, cond in [
            ("modifier", "am = bm"),
            ("type", "at = bt"),
            ("size", "asz = bsz"),
            ("price", f"abs(apu - bpu) <= {PRICE_TOL_CENTS}"),
        ]
    )
    return f"""
    WITH recs AS (
      SELECT p_partkey,
             split_part(p_name, ' ', 1) AS modifier,
             split_part(p_name, ' ', 2) AS noun,
             p_brand, p_type, p_size,
             CAST(round(p_retailprice * 100) AS BIGINT) AS pu
      FROM part
    ), nbr AS (
      SELECT *, {lead_cols}
      FROM recs
      WINDOW w AS (PARTITION BY noun, p_brand ORDER BY p_size, pu, p_partkey)
    ), pairs AS ({legs}),
    scored AS (
      SELECT {agree_cols},
             ({" + ".join(terms)}) AS score
      FROM pairs
    )
    SELECT agree_modifier, agree_type, agree_size, agree_price, score,
           CAST(score >= {ER_MATCH_THRESHOLD} AS INTEGER) AS is_match,
           count(*) AS n_pairs,
           {oracle_exact_ratio("count(*)", "(SELECT count(*) FROM scored)")}
               AS pair_share
    FROM scored
    GROUP BY 1, 2, 3, 4, 5
    """


@query("entity_resolution_scores", oracle=_er_oracle())
def q_entity_resolution_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    return entity_resolution_scores(load_table(spark, sf_dir, "part"))
