"""Market-basket association rules over order line items — the
classic co-occurrence mining operator (support / confidence / lift).

Superset surface (absent in the reference, SURVEY §2.3 class): the
recommender/affinity primitive every retail-shaped warehouse runs.
This is the bounded-pair form of frequent-itemset mining: singleton
and pair counts only (the Apriori k=2 frontier), which is what the
downstream "users who bought A also bought B" surfaces actually
consume.

Scale shape (100 TB posture):

- Pairs are generated INSIDE each basket's part array (one orderkey
  aggregation, then an array expression) — each basket meets only
  itself, never the corpus, and the items table is shuffled exactly
  once. Pair volume is sum over baskets of C(size, 2), linear in
  orders for bounded baskets.
- A pathological giant basket (one key holding 1e6 items) would make
  that sum quadratic, so baskets above MAX_BASKET items are excluded
  up front (the same census-then-cap discipline as the dedup lane's
  band caps); real retail baskets are tiny (TPC-H ~4 lines/order).
- Item counts and pair counts are map-side-combinable aggregates; the
  rule arithmetic runs on the aggregated pair frame, and only the
  final deterministic top-K (lift desc, then key order) is a global
  sort of that already-reduced frame.

Cross-engine exactness: supports and confidences are ratios of int64
counts rendered with the repo's floor-scaled ppm discipline
(functions/numeric.py); lift multiplies counts as doubles BEFORE the
divide (identical IEEE ops both engines) so the floor is bit-stable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mapreduce_lab_spark.registry import query
from mapreduce_lab_spark.sources.tables import load_table

MIN_PAIR_SUPPORT = 2  # absolute co-occurrence floor for a rule
MAX_BASKET = 64  # skew guard: larger baskets are excluded up front
TOP_RULES = 100


def order_baskets(lineitem: DataFrame) -> DataFrame:
    """One row per retained order: the sorted distinct part set,
    baskets above MAX_BASKET items excluded (the quadratic-pair skew
    guard). collect_set replaces the round-11 distinct() + size join:
    the per-basket dedup happens inside ONE orderkey aggregation
    (map-side partial), where the old shape paid an Exchange for the
    distinct, another for the size groupBy, and a third to join the
    two (round-13, measured 7.0 -> 2.0 s warm for the full rules
    query at sf0.1)."""
    return (
        lineitem.groupBy("l_orderkey")
        .agg(F.collect_set("l_partkey").alias("parts"))
        .where(F.size("parts") <= MAX_BASKET)
        .select(F.array_sort("parts").alias("parts"))
    )


def association_rules(lineitem: DataFrame) -> DataFrame:
    """Top-TOP_RULES part pairs by lift with support/confidence, over
    distinct-part order baskets."""
    # the basket frame feeds three consumers (count, singleton counts,
    # pair expansion): one materialization
    baskets = order_baskets(lineitem).localCheckpoint()
    n_baskets = baskets.agg(F.count(F.lit(1)).alias("n_baskets"))
    item_n = (
        baskets.select(F.explode("parts").alias("l_partkey"))
        .groupBy("l_partkey")
        .agg(F.count(F.lit(1)).alias("n_one"))
    )
    # All i<j pairs inside the sorted basket array — the co-partitioned
    # self-join had each basket meeting only itself anyway, so the
    # array expression produces the identical pair multiset without
    # shuffling the items table twice more.
    pair_arr = F.flatten(
        F.transform(
            F.col("parts"),
            lambda x, i: F.transform(
                F.slice(F.col("parts"), i + 2, F.size("parts")),
                lambda y: F.struct(x.alias("part_a"), y.alias("part_b")),
            ),
        )
    )
    pairs = (
        baskets.select(F.explode(pair_arr).alias("p"))
        .groupBy(
            F.col("p.part_a").alias("part_a"),
            F.col("p.part_b").alias("part_b"),
        )
        .agg(F.count(F.lit(1)).alias("n_ab"))
        .where(F.col("n_ab") >= MIN_PAIR_SUPPORT)
    )
    na = item_n.select(
        F.col("l_partkey").alias("part_a"), F.col("n_one").alias("n_a")
    )
    nb = item_n.select(
        F.col("l_partkey").alias("part_b"), F.col("n_one").alias("n_b")
    )
    ppm = 1_000_000
    rules = (
        pairs.join(na, "part_a")
        .join(nb, "part_b")
        .crossJoin(F.broadcast(n_baskets))
        .select(
            "part_a",
            "part_b",
            "n_ab",
            F.floor(
                F.col("n_ab").cast("double") * ppm / F.col("n_baskets")
            ).alias("support_ppm"),
            F.floor(F.col("n_ab").cast("double") * ppm / F.col("n_a")).alias(
                "conf_ab_ppm"
            ),
            F.floor(F.col("n_ab").cast("double") * ppm / F.col("n_b")).alias(
                "conf_ba_ppm"
            ),
            F.floor(
                F.col("n_ab").cast("double")
                * F.col("n_baskets").cast("double")
                * ppm
                / (F.col("n_a").cast("double") * F.col("n_b").cast("double"))
            ).alias("lift_ppm"),
        )
    )
    return rules.orderBy(
        F.col("lift_ppm").desc(), F.col("part_a"), F.col("part_b")
    ).limit(TOP_RULES)


_RULES_ORACLE = f"""
WITH items0 AS (
  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
), ok AS (
  SELECT l_orderkey FROM items0 GROUP BY l_orderkey
  HAVING count(*) <= {MAX_BASKET}
), items AS (
  SELECT i.l_orderkey, i.l_partkey FROM items0 i JOIN ok USING (l_orderkey)
), nb AS (
  SELECT count(DISTINCT l_orderkey) AS n_baskets FROM items
), ones AS (
  SELECT l_partkey, count(*) AS n_one FROM items GROUP BY l_partkey
), pairs AS (
  SELECT a.l_partkey AS part_a, b.l_partkey AS part_b, count(*) AS n_ab
  FROM items a JOIN items b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY 1, 2
  HAVING count(*) >= {MIN_PAIR_SUPPORT}
)
SELECT part_a, part_b, n_ab,
       CAST(floor(CAST(n_ab AS DOUBLE) * 1000000 / n_baskets) AS BIGINT)
           AS support_ppm,
       CAST(floor(CAST(n_ab AS DOUBLE) * 1000000 / na.n_one) AS BIGINT)
           AS conf_ab_ppm,
       CAST(floor(CAST(n_ab AS DOUBLE) * 1000000 / nbm.n_one) AS BIGINT)
           AS conf_ba_ppm,
       CAST(floor(CAST(n_ab AS DOUBLE) * CAST(n_baskets AS DOUBLE) * 1000000
             / (CAST(na.n_one AS DOUBLE) * CAST(nbm.n_one AS DOUBLE)))
           AS BIGINT) AS lift_ppm
FROM pairs
JOIN ones na ON na.l_partkey = part_a
JOIN ones nbm ON nbm.l_partkey = part_b
CROSS JOIN nb
ORDER BY lift_ppm DESC, part_a, part_b
LIMIT {TOP_RULES}
"""


@query("basket_association_rules", oracle=_RULES_ORACLE)
def q_basket_association_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top co-purchase rules (A,B) by lift with absolute pair count,
    support, and both conditional confidences, all floor-scaled ppm."""
    return association_rules(load_table(spark, sf_dir, "lineitem"))


@query(
    "basket_pair_census",
    oracle=f"""
    WITH items0 AS (
      SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
    ), sizes AS (
      SELECT l_orderkey, count(*) AS bs FROM items0 GROUP BY l_orderkey
    )
    SELECT count(*) AS n_baskets,
           CAST(coalesce(sum(CASE WHEN bs > {MAX_BASKET} THEN 1 ELSE 0 END), 0)
                AS BIGINT) AS n_capped_baskets,
           CAST(coalesce(sum(CASE WHEN bs <= {MAX_BASKET}
                    THEN bs * (bs - 1) // 2 ELSE 0 END), 0) AS BIGINT)
               AS pair_workload,
           CAST(coalesce(max(bs), 0) AS BIGINT) AS max_basket
    FROM sizes
    """,
)
def q_basket_pair_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pre-flight census for the basket self-join — the same
    measure-before-join discipline as ``lsh_band_census`` /
    ``ivf_cell_census``: basket count, how many the MAX_BASKET skew
    guard excludes, the exact pair workload the join will enumerate
    (sum C(size, 2) over retained baskets), and the hottest basket."""
    items = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey"
    ).distinct()
    sizes = items.groupBy("l_orderkey").agg(F.count(F.lit(1)).alias("bs"))
    return sizes.agg(
        F.count(F.lit(1)).alias("n_baskets"),
        F.coalesce(
            F.sum((F.col("bs") > MAX_BASKET).cast("long")), F.lit(0)
        ).alias("n_capped_baskets"),
        F.coalesce(
            F.sum(
                F.when(
                    F.col("bs") <= MAX_BASKET,
                    F.call_function(
                        "div",
                        (F.col("bs") * (F.col("bs") - 1)).cast("long"),
                        F.lit(2).cast("long"),
                    ),
                ).otherwise(F.lit(0))
            ),
            F.lit(0),
        ).alias("pair_workload"),
        F.coalesce(F.max("bs"), F.lit(0)).alias("max_basket"),
    )
