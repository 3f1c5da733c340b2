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


# --- CUPED variance-reduced experiment readout --------------------------------

# CUPED (Controlled-experiment Using Pre-Experiment Data, Deng et al.,
# WSDM 2013): shrink an A/B metric's variance by regressing out each
# unit's PRE-period covariate — adjusted y' = y - theta (x - mean(x)),
# theta = cov(x, y) / var(x). The estimator is pure sufficient
# statistics (n, sum x, sum y, sum xy, sum x^2 over users), so the
# distributed shape is one combinable per-user aggregate, a 1-row
# moment frame, one broadcast back, and a per-group aggregate —
# identical at sf0.001 and 100 TB.
#
# Experiment frame on the synthetic events table: users split into
# arms by user_id % 2 (a deterministic stand-in for the assignment
# log); the observation window splits at the midpoint of the event
# time range (exact integer microseconds, identical in both engines);
# the metric is per-user purchase revenue in exact cents.
#
# Cross-engine exactness: moments are int64; the theta and variance
# combinations convert to double BEFORE multiplying (sum x * sum y
# overflows int64 at large user counts) — identical IEEE ops both
# engines — and every rendered statistic floor-scales per the house
# ppm discipline. The per-user adjusted metric floors back to an
# integer before the group sum, so group aggregates stay
# order-independent and hash-stable.

CUPED_PPM = 1_000_000


def _cuped_users(events: DataFrame) -> DataFrame:
    """(user_id, grp, x, y): pre/post purchase revenue in exact cents
    per user (0 when the user has no purchase in a period)."""
    # cast covers TIMESTAMP_NTZ inputs (constructed parquet without a
    # zone reads as NTZ in Spark 4; unix_micros requires TIMESTAMP)
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    bounds = events.agg(
        F.call_function(
            "div", F.min(us) + F.max(us), F.lit(2).cast("long")
        ).alias("split_us")
    )
    rev = F.when(
        F.col("event_type") == "purchase", to_units(F.col("value"), 100)
    ).otherwise(F.lit(0))
    return (
        events.crossJoin(F.broadcast(bounds))
        .groupBy("user_id")
        .agg(
            F.coalesce(
                F.sum(F.when(us < F.col("split_us"), rev)),
                F.lit(0),
            ).alias("x"),
            F.coalesce(
                F.sum(F.when(us >= F.col("split_us"), rev)),
                F.lit(0),
            ).alias("y"),
        )
        .select("user_id", (F.col("user_id") % 2).alias("grp"), "x", "y")
    )


def cuped_adjusted_revenue(events: DataFrame) -> DataFrame:
    """Per experiment arm: user count, mean post-period revenue
    (dollars, floor-scaled), CUPED-adjusted mean, per-arm variance
    reduction ratio (ppm), and the pooled theta (ppm)."""
    users = _cuped_users(events).localCheckpoint()
    m = users.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    nd = F.col("n").cast("double")
    den = nd * F.col("sxx").cast("double") - (
        F.col("sx").cast("double") * F.col("sx").cast("double")
    )
    num = nd * F.col("sxy").cast("double") - (
        F.col("sx").cast("double") * F.col("sy").cast("double")
    )
    params = m.select(
        F.when(den > 0, F.floor(num * CUPED_PPM / den))
        .otherwise(F.lit(0))
        .alias("theta_ppm"),
        F.floor(F.col("sx").cast("double") * CUPED_PPM / F.col("n")).alias(
            "xbar_ppm"
        ),
    )
    theta = F.col("theta_ppm").cast("double") / CUPED_PPM
    xbar = F.col("xbar_ppm").cast("double") / CUPED_PPM
    adj = users.crossJoin(F.broadcast(params)).select(
        "grp",
        "y",
        "theta_ppm",
        F.floor(
            F.col("y").cast("double") - theta * (F.col("x").cast("double") - xbar)
        )
        .cast("long")
        .alias("ya"),
    )
    g = adj.groupBy("grp").agg(
        F.count(F.lit(1)).alias("n_users"),
        F.sum("y").alias("gy"),
        F.sum("ya").alias("gya"),
        F.sum(F.col("y") * F.col("y")).alias("gyy"),
        F.sum(F.col("ya") * F.col("ya")).alias("gyaya"),
        F.max("theta_ppm").alias("theta_ppm"),
    )
    gnd = F.col("n_users").cast("double")

    def _var(s2: str, s1: str) -> F.Column:
        return (
            gnd * F.col(s2).cast("double")
            - F.col(s1).cast("double") * F.col(s1).cast("double")
        ) / (gnd * gnd)

    # mean in dollars at 6dp: cents -> dollars is /100, ppm render x1e6
    mean_y = F.floor(F.col("gy").cast("double") * 10_000 / F.col("n_users")) / F.lit(
        1_000_000.0
    )
    mean_ya = F.floor(
        F.col("gya").cast("double") * 10_000 / F.col("n_users")
    ) / F.lit(1_000_000.0)
    var_y = _var("gyy", "gy")
    var_ya = _var("gyaya", "gya")
    return g.select(
        "grp",
        "n_users",
        mean_y.alias("mean_rev"),
        mean_ya.alias("mean_rev_cuped"),
        F.when(var_y > 0, F.floor(var_ya * CUPED_PPM / var_y))
        .otherwise(F.lit(CUPED_PPM).cast("long"))
        .alias("var_ratio_ppm"),
        "theta_ppm",
    ).orderBy("grp")


_CUPED_ORACLE = f"""
WITH bounds AS (
  SELECT (min(epoch_us(ts)) + max(epoch_us(ts))) // 2 AS split_us FROM events
), users AS (
  SELECT user_id, user_id % 2 AS grp,
         coalesce(sum(CASE WHEN epoch_us(ts) < split_us THEN
             CASE WHEN event_type = 'purchase'
                  THEN {oracle_units('value', 100)} ELSE 0 END END), 0) AS x,
         coalesce(sum(CASE WHEN epoch_us(ts) >= split_us THEN
             CASE WHEN event_type = 'purchase'
                  THEN {oracle_units('value', 100)} ELSE 0 END END), 0) AS y
  FROM events, bounds
  GROUP BY user_id
), m AS (
  SELECT count(*) AS n,
         CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
         CAST(sum(x * y) AS BIGINT) AS sxy,
         CAST(sum(x * x) AS BIGINT) AS sxx
  FROM users
), params AS (
  SELECT CASE WHEN CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
              - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) > 0
         THEN CAST(floor((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                     - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                    * {CUPED_PPM}
                    / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                       - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)))
              AS BIGINT)
         ELSE 0 END AS theta_ppm,
         floor(CAST(sx AS DOUBLE) * {CUPED_PPM} / n) AS xbar_ppm
  FROM m
), adj AS (
  SELECT grp, y, theta_ppm,
         CAST(floor(CAST(y AS DOUBLE)
                    - (CAST(theta_ppm AS DOUBLE) / {CUPED_PPM})
                      * (CAST(x AS DOUBLE)
                         - CAST(xbar_ppm AS DOUBLE) / {CUPED_PPM}))
              AS BIGINT) AS ya
  FROM users, params
), g AS (
  SELECT grp, count(*) AS n_users,
         CAST(sum(y) AS BIGINT) AS gy, CAST(sum(ya) AS BIGINT) AS gya,
         CAST(sum(y * y) AS BIGINT) AS gyy,
         CAST(sum(ya * ya) AS BIGINT) AS gyaya,
         max(theta_ppm) AS theta_ppm
  FROM adj GROUP BY grp
)
SELECT grp, n_users,
       floor(CAST(gy AS DOUBLE) * 10000 / n_users) / 1000000.0 AS mean_rev,
       floor(CAST(gya AS DOUBLE) * 10000 / n_users) / 1000000.0
           AS mean_rev_cuped,
       CAST(CASE WHEN (CAST(n_users AS DOUBLE) * CAST(gyy AS DOUBLE)
                  - CAST(gy AS DOUBLE) * CAST(gy AS DOUBLE))
                 / (CAST(n_users AS DOUBLE) * CAST(n_users AS DOUBLE)) > 0
            THEN floor(((CAST(n_users AS DOUBLE) * CAST(gyaya AS DOUBLE)
                         - CAST(gya AS DOUBLE) * CAST(gya AS DOUBLE))
                        / (CAST(n_users AS DOUBLE) * CAST(n_users AS DOUBLE)))
                       * {CUPED_PPM}
                       / ((CAST(n_users AS DOUBLE) * CAST(gyy AS DOUBLE)
                           - CAST(gy AS DOUBLE) * CAST(gy AS DOUBLE))
                          / (CAST(n_users AS DOUBLE)
                             * CAST(n_users AS DOUBLE))))
            ELSE {CUPED_PPM} END AS BIGINT) AS var_ratio_ppm,
       theta_ppm
FROM g
ORDER BY grp
"""


@query("cuped_adjusted_revenue", oracle=_CUPED_ORACLE)
def q_cuped_adjusted_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    return cuped_adjusted_revenue(load_table(spark, sf_dir, "events"))


# --- Poisson-bootstrap confidence interval ------------------------------------

# The industrial-scale bootstrap (Chamandy et al., "Estimating
# Uncertainty for Massive Data Streams", Google 2012): classical
# resampling needs n draws per replicate — impossible distributed —
# but a Poisson(1) weight per (row, replicate) is an excellent
# approximation to multinomial resampling and needs ONE streaming
# pass: every replicate's weighted sum is just another combinable
# aggregate. B replicates = 2B agg expressions generated side by
# side, so the plan is one scan + one narrow shuffle regardless of B.
#
# Determinism/cross-engine: the Poisson draw inverts the CDF on
# u32 = hex8_int(event_id : replicate) — an exact integer compared
# against precomputed integer thresholds floor(cdf_k * 2^32), so both
# engines draw bit-identical weights. Replicate means and the sample
# std over replicates are generated as the SAME fixed-order double
# expression chain in Spark and the oracle, then floor-scaled.

BOOT_B = 16  # replicates
_POIS1_CDF = [
    0.36787944117144233,  # P(X <= 0), X ~ Poisson(1)
    0.7357588823428847,
    0.9196986029286058,
    0.9810118431238462,
    0.9963401531726563,
    0.9994058151824183,
    0.9999167588507119,
    0.9999897508033253,
]
_POIS1_THRESH = [int(p * (1 << 32)) for p in _POIS1_CDF]


def _boot_weight_spark(b: int):
    from mapreduce_lab_spark.functions.hashing import hex8_int

    u32 = hex8_int(
        F.concat_ws(":", F.col("event_id").cast("string"), F.lit(str(b)))
    )
    w = None
    for t in _POIS1_THRESH:
        ind = (u32 >= t).cast("long")
        w = ind if w is None else w + ind
    return w


def _boot_weight_sql(b: int) -> str:
    from mapreduce_lab_spark.functions.hashing import oracle_hex8_int

    u32 = oracle_hex8_int(f"CAST(event_id AS VARCHAR) || ':' || '{b}'")
    parts = " + ".join(
        f"(CASE WHEN {u32} >= {t} THEN 1 ELSE 0 END)" for t in _POIS1_THRESH
    )
    return f"({parts})"


def bootstrap_mean_ci_revenue(events: DataFrame) -> DataFrame:
    """Per event type: mean value (exact cents), Poisson-bootstrap
    standard error of the mean over BOOT_B replicates, and the 95%
    normal-interval bounds — one combinable pass, 2*BOOT_B generated
    aggregates."""
    x = to_units(F.col("value"), 100)
    aggs = [
        F.count(F.lit(1)).alias("n"),
        F.sum(x).alias("sx"),
    ]
    for b in range(BOOT_B):
        w = _boot_weight_spark(b)
        aggs.append(F.sum(w * x).alias(f"wx{b}"))
        aggs.append(F.sum(w).alias(f"w{b}"))
    g = events.groupBy("event_type").agg(*aggs)
    # ADVICE r11: a replicate's weight sum is 0 with probability e^-n
    # per replicate (all Poisson draws zero on a tiny group). wx/w
    # would then be double/0 — NULL in Spark but configurable in
    # DuckDB (ieee_floating_point_ops builds return inf), silently
    # nulling the whole group row either way. Guard the divisor with
    # greatest(w, 1) IDENTICALLY in both engines: wx is exactly 0
    # whenever w is 0, so the empty replicate contributes mean 0
    # deterministically instead of poisoning the row.
    means = [
        F.col(f"wx{b}").cast("double") / F.greatest(F.col(f"w{b}"), F.lit(1))
        for b in range(BOOT_B)
    ]
    msum = means[0]
    for m in means[1:]:
        msum = msum + m
    sqsum = means[0] * means[0]
    for m in means[1:]:
        sqsum = sqsum + m * m
    # sample variance over replicates (ddof = 1), fixed-order chain
    var = (sqsum - msum * msum / BOOT_B) / (BOOT_B - 1)
    se = F.sqrt(var)
    mean = F.col("sx").cast("double") / F.col("n")
    ppm = 1_000_000
    # cents -> dollars at 6 dp: floor(v * 1e4) / 1e6
    def _dollars(c):
        return F.floor(c * 10_000) / F.lit(float(ppm))

    return g.select(
        "event_type",
        F.col("n").alias("n_events"),
        _dollars(mean).alias("mean_value"),
        _dollars(se).alias("boot_se"),
        _dollars(mean - 1.96 * se).alias("ci_lo"),
        _dollars(mean + 1.96 * se).alias("ci_hi"),
    )


def _boot_oracle() -> str:
    wx = ",\n         ".join(
        f"CAST(sum({_boot_weight_sql(b)} * {oracle_units('value', 100)}) AS BIGINT)"
        f" AS wx{b},\n         CAST(sum({_boot_weight_sql(b)}) AS BIGINT) AS w{b}"
        for b in range(BOOT_B)
    )
    # same greatest(w,1) divisor guard as the Spark side (ADVICE r11)
    means = [f"(CAST(wx{b} AS DOUBLE) / greatest(w{b}, 1))" for b in range(BOOT_B)]
    msum = means[0]
    for m in means[1:]:
        msum = f"({msum} + {m})"
    sqsum = f"({means[0]} * {means[0]})"
    for m in means[1:]:
        sqsum = f"({sqsum} + {m} * {m})"
    var = f"(({sqsum} - {msum} * {msum} / {BOOT_B}) / {BOOT_B - 1})"
    mean = "(CAST(sx AS DOUBLE) / n)"
    se = f"sqrt({var})"

    def dollars(c: str) -> str:
        return f"(floor(({c}) * 10000) / 1000000.0)"

    return f"""
    WITH g AS (
      SELECT event_type, count(*) AS n,
         CAST(sum({oracle_units('value', 100)}) AS BIGINT) AS sx,
         {wx}
      FROM events GROUP BY event_type
    )
    SELECT event_type, CAST(n AS BIGINT) AS n_events,
           {dollars(mean)} AS mean_value,
           {dollars(se)} AS boot_se,
           {dollars(f"{mean} - 1.96 * {se}")} AS ci_lo,
           {dollars(f"{mean} + 1.96 * {se}")} AS ci_hi
    FROM g
    """


@query("bootstrap_mean_ci_revenue", oracle=_boot_oracle())
def q_bootstrap_mean_ci_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    return bootstrap_mean_ci_revenue(load_table(spark, sf_dir, "events"))
