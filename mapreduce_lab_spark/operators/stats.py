"""Inferential statistics over distributed data: grouped OLS trend
fitting and a chi-square independence census.

Superset surface (absent in the reference, SURVEY §2.3): the two
statistics a data platform runs constantly — "is this metric trending,
and how fast?" (per-group least-squares slope) and "are these two
categorical columns independent?" (chi-square contingency census, the
classic drift/bias alarm for a training-data mix).

Both are built on the sufficient-statistics pattern that makes
classical statistics distributed-friendly: one map-side-combinable
aggregation pass reduces the data to a bounded frame of exact-integer
moments (n, Σx, Σy, Σxy, Σx² / the contingency counts), and the model
arithmetic runs on that frame. The 100 TB shape is therefore identical
to the sf0.001 shape: one shuffle, dimension-sized everything after.

Cross-engine exactness: regression moments are integer (day index x
exact-cent daily means), so numerator/denominator are int64 and the
rendered slope uses the repo's floor-scaled exact_ratio. Chi-square
contributions convert int64 counts to double before multiplying (an
identical IEEE op in both engines) and floor-scale each cell's
contribution to an exact integer BEFORE summing, so the statistic is
order-independent and hash-stable. At extreme row counts the
double conversions stay engine-identical (int64→double is
round-to-nearest in both); past 2^53 the documented wide path is a
DECIMAL accumulator, as in functions/numeric.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mapreduce_lab_spark.functions.numeric import (
    exact_ratio,
    oracle_exact_ratio,
    oracle_units,
    to_units,
)
from mapreduce_lab_spark.registry import query
from mapreduce_lab_spark.sources.tables import load_table

_TREND_ANCHOR = "2024-01-01"  # events epoch; x = whole days since
CHI2_SCALE = 1_000_000


def ols_trend_by_type(events: DataFrame) -> DataFrame:
    """Per event type: least-squares (slope, intercept) of the daily
    MEAN value (exact cents) against the day index, from integer
    sufficient statistics.

    Two aggregation passes, both map-side combinable: events → (type,
    day) exact means, then (type, day) → per-type moments. Daily means
    (not daily sums) keep every moment scale-free: the regression
    inputs are bounded by the calendar and the value domain no matter
    how many events stream in.
    """
    daily = (
        events.groupBy(
            F.col("event_type"),
            F.datediff(F.to_date("ts"), F.lit(_TREND_ANCHOR)).alias("x"),
        )
        .agg(
            F.floor(
                F.sum(to_units(F.col("value"), 100)).cast("double")
                / F.count(F.lit(1))
            ).alias("y")
        )
    )
    m = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    den = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    slope_num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    icept_num = F.col("sy") * F.col("sxx") - F.col("sx") * F.col("sxy")
    # A slope needs >= 2 distinct day points; n == 1 makes den == 0,
    # where Spark's non-ANSI divide yields NULL but DuckDB's IEEE
    # double divide yields Infinity — filter the degenerate types out
    # of BOTH engines instead of rendering an engine-dependent value.
    return m.where(F.col("n") >= 2).select(
        "event_type",
        F.col("n").alias("n_days"),
        exact_ratio(slope_num, den).alias("slope_cents_per_day"),
        exact_ratio(icept_num, den).alias("intercept_cents"),
    )


_OLS_ORACLE = f"""
WITH daily AS (
  SELECT event_type,
         date_diff('day', DATE '{_TREND_ANCHOR}', CAST(ts AS DATE)) AS x,
         CAST(floor(CAST(sum(CAST(round(value * 100) AS BIGINT)) AS DOUBLE)
                    / count(*)) AS BIGINT) AS y
  FROM events GROUP BY 1, 2
), m AS (
  SELECT event_type, count(*) AS n,
         sum(x) AS sx, sum(y) AS sy,
         sum(x * y) AS sxy, sum(x * x) AS sxx
  FROM daily GROUP BY 1
)
SELECT event_type, CAST(n AS BIGINT) AS n_days,
       {oracle_exact_ratio("n * sxy - sx * sy", "n * sxx - sx * sx")}
           AS slope_cents_per_day,
       {oracle_exact_ratio("sy * sxx - sx * sxy", "n * sxx - sx * sx")}
           AS intercept_cents
FROM m WHERE n >= 2
"""


@query("ols_trend_by_type", oracle=_OLS_ORACLE)
def q_ols_trend_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ols_trend_by_type(load_table(spark, sf_dir, "events"))


def chi_square_lang_source(docs: DataFrame) -> DataFrame:
    """Contingency census for (lang x source): per cell the observed
    count, the independence-expected count, and the cell's chi-square
    contribution — the drift/bias report for a corpus mix ("did src7
    stop sending German?").

    One groupBy on the cell pair; margins come from re-aggregating the
    |cells|-row frame (the document rows are touched exactly once).
    ZERO cells are materialized — the census enumerates the full
    |langs| x |sources| margin grid (bounded by the categorical
    domains) and left-joins the observed counts, because an absent
    cell with a large expected count is precisely the dependence
    signal this report exists to surface. Expected and contribution
    are floor-scaled exact integers rendered as 6-dp doubles, so the
    census — and the chi2 total a consumer sums from it — is
    bit-stable cross-engine.
    """
    # cache: the margins, grid, and grand total below all derive from
    # this |cells|-row frame — one materialization instead of four
    # re-executions of the document scan.
    cells = docs.groupBy("lang", "source").agg(F.count(F.lit(1)).alias("o")).cache()
    rows = cells.groupBy("lang").agg(F.sum("o").alias("r"))
    cols = cells.groupBy("source").agg(F.sum("o").alias("c"))
    tot = cells.agg(F.sum("o").alias("t"))
    grid = rows.crossJoin(F.broadcast(cols))
    j = (
        grid.join(cells, ["lang", "source"], "left")
        .withColumn("o", F.coalesce(F.col("o"), F.lit(0)))
        .crossJoin(F.broadcast(tot))
    )
    rc = F.col("r").cast("double") * F.col("c")
    # (t*o - r*c)^2 / (t * r * c): computed in double (identical IEEE
    # ops both engines), floor-scaled to an exact integer per cell.
    diff = F.col("t").cast("double") * F.col("o") - rc
    contrib = F.floor(diff * diff * F.lit(CHI2_SCALE) / (F.col("t").cast("double") * rc))
    return j.select(
        "lang",
        "source",
        F.col("o").alias("observed"),
        exact_ratio(rc, F.col("t")).alias("expected"),
        (contrib / F.lit(float(CHI2_SCALE))).alias("chi2_contrib"),
    )


_CHI2_ORACLE = f"""
WITH cells AS (
  SELECT lang, source, count(*) AS o FROM documents GROUP BY 1, 2
), r AS (SELECT lang, sum(o) AS r FROM cells GROUP BY 1),
c AS (SELECT source, sum(o) AS c FROM cells GROUP BY 1),
t AS (SELECT sum(o) AS t FROM cells),
grid AS (
  SELECT r.lang, c.source, r.r, c.c,
         coalesce(cells.o, 0) AS o
  FROM r CROSS JOIN c
  LEFT JOIN cells ON cells.lang = r.lang AND cells.source = c.source
)
SELECT lang, source, CAST(o AS BIGINT) AS observed,
       {oracle_exact_ratio("CAST(r AS DOUBLE) * c", "t")} AS expected,
       (floor((CAST(t AS DOUBLE) * o - CAST(r AS DOUBLE) * c)
              * (CAST(t AS DOUBLE) * o - CAST(r AS DOUBLE) * c)
              * {CHI2_SCALE}
              / (CAST(t AS DOUBLE) * (CAST(r AS DOUBLE) * c)))
        / {float(CHI2_SCALE)}) AS chi2_contrib
FROM grid CROSS JOIN t
"""


@query("chi_square_lang_source", oracle=_CHI2_ORACLE)
def q_chi_square_lang_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    return chi_square_lang_source(load_table(spark, sf_dir, "documents"))


# --- difference-in-differences (measurement lane) ----------------------------

# The workhorse quasi-experimental estimator (Card & Krueger 1994,
# public): compare the treated group's before/after change against
# the control group's, so any shared time trend cancels. Groups here
# are order priorities (treated = 1-URGENT, control = 5-LOW) around a
# fixed cutover date — the shape of every "did the pricing change
# move urgent-order revenue?" question.
#
# Exactness: each cell's mean daily revenue is derived from exact
# integer cents and day counts via the floor-scaled exact_avg
# discipline; the DiD is then arithmetic on four identical doubles —
# bit-stable cross-engine. One combinable (group, period, day)
# aggregate; everything after runs on a 4-row frame.

DID_TREATED = "1-URGENT"
DID_CONTROL = "5-LOW"
DID_CUTOVER = "1998-01-01"


def diff_in_diff_revenue(orders: DataFrame) -> DataFrame:
    """One row: the four (group, period) mean-daily-revenue cells and
    the difference-in-differences estimate, all exact-cent floor-
    scaled doubles."""
    daily = (
        orders.where(F.col("o_orderpriority").isin(DID_TREATED, DID_CONTROL))
        .groupBy(
            (F.col("o_orderpriority") == DID_TREATED).alias("treated"),
            (F.col("o_orderdate") >= F.lit(DID_CUTOVER)).alias("post"),
            F.to_date("o_orderdate").alias("day"),
        )
        .agg(F.sum(to_units(F.col("o_totalprice"), 100)).alias("u"))
    )
    cells = daily.groupBy("treated", "post").agg(
        F.sum("u").alias("su"), F.count(F.lit(1)).alias("nd")
    )
    mean = F.floor(F.col("su").cast("double") * 10_000 / F.col("nd")) / F.lit(
        1_000_000.0
    )  # dollars at 4dp beyond cents -> 6dp total stability
    # four conditional aggregates over the 4-row cells frame
    four = cells.select("treated", "post", mean.alias("m")).agg(
        F.max(F.when(F.col("treated") & ~F.col("post"), F.col("m"))).alias("t_pre"),
        F.max(F.when(F.col("treated") & F.col("post"), F.col("m"))).alias("t_post"),
        F.max(F.when(~F.col("treated") & ~F.col("post"), F.col("m"))).alias("c_pre"),
        F.max(F.when(~F.col("treated") & F.col("post"), F.col("m"))).alias("c_post"),
    )
    return four.select(
        "t_pre",
        "t_post",
        "c_pre",
        "c_post",
        (
            (F.col("t_post") - F.col("t_pre")) - (F.col("c_post") - F.col("c_pre"))
        ).alias("did"),
    )


_DID_ORACLE = f"""
WITH daily AS (
  SELECT (o_orderpriority = '{DID_TREATED}') AS treated,
         (o_orderdate >= TIMESTAMP '{DID_CUTOVER} 00:00:00') AS post,
         CAST(o_orderdate AS DATE) AS day,
         sum({oracle_units('o_totalprice', 100)}) AS u
  FROM orders
  WHERE o_orderpriority IN ('{DID_TREATED}', '{DID_CONTROL}')
  GROUP BY 1, 2, 3
), cells AS (
  SELECT treated, post,
         (floor(CAST(sum(u) AS DOUBLE) * 10000 / count(*)) / 1000000.0) AS m
  FROM daily GROUP BY 1, 2
)
SELECT max(CASE WHEN treated AND NOT post THEN m END) AS t_pre,
       max(CASE WHEN treated AND post THEN m END) AS t_post,
       max(CASE WHEN NOT treated AND NOT post THEN m END) AS c_pre,
       max(CASE WHEN NOT treated AND post THEN m END) AS c_post,
       (max(CASE WHEN treated AND post THEN m END)
        - max(CASE WHEN treated AND NOT post THEN m END))
       - (max(CASE WHEN NOT treated AND post THEN m END)
          - max(CASE WHEN NOT treated AND NOT post THEN m END)) AS did
FROM cells
"""


@query("diff_in_diff_revenue", oracle=_DID_ORACLE)
def q_diff_in_diff_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    return diff_in_diff_revenue(load_table(spark, sf_dir, "orders"))
