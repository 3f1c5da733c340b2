"""Marketing-style attribution: split conversion value across the
preceding touchpoints.

Complements the as-of join (``events.py:asof_join_purchase_to_view``
— LAST-touch attribution) with LINEAR attribution: each purchase's
value splits equally across ALL the user's views in the preceding
hour. The split is exact integer arithmetic — each view gets
``units div k`` and the remainder goes to the earliest view — so the
per-user totals are integer sums (order-independent, engine-exact)
and the attributed total equals the purchase total to the cent, a
conservation law the test suite can assert.

Scale shape: the purchase→view match is an equi-join on ``user_id``
with a time-range residual — Spark plans the hash join on the user
key and filters the hour window as a residual predicate, so the
shuffle is keyed by user (high cardinality, no theta-join blowup;
fan-out bounded by views-per-user-per-hour). The per-purchase count
and first-view flag are windows over ``purchase_id`` — again high
cardinality, never global.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from mapreduce_lab_spark.functions.numeric import oracle_units, to_units
from mapreduce_lab_spark.registry import query
from mapreduce_lab_spark.sources.tables import load_table

ATTRIBUTION_WINDOW = "1 hour"


def linear_attribution(events: DataFrame) -> DataFrame:
    """Per-user linearly-attributed purchase value over 1h windows."""
    views = events.where(F.col("event_type") == "view").select(
        "user_id",
        F.col("ts").alias("view_ts"),
        F.col("event_id").alias("view_id"),
    )
    purchases = events.where(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("ts").alias("p_ts"),
        F.col("event_id").alias("p_id"),
        to_units("value", 100).alias("units"),
    )
    pairs = purchases.join(views, "user_id").where(
        (F.col("view_ts") <= F.col("p_ts"))
        & (F.col("view_ts") > F.col("p_ts") - F.expr(f"INTERVAL {ATTRIBUTION_WINDOW}"))
    )
    wp = Window.partitionBy("p_id")
    wo = Window.partitionBy("p_id").orderBy("view_ts", "view_id")
    attributed = (
        pairs.withColumn("k", F.count("*").over(wp))
        .withColumn("rn", F.row_number().over(wo))
        .withColumn(
            "attr_units",
            F.expr("units div k")
            + F.when(F.col("rn") == 1, F.expr("units % k")).otherwise(F.lit(0)),
        )
    )
    return attributed.groupBy("user_id").agg(
        F.count_distinct("p_id").alias("n_purchases"),
        (F.sum("attr_units").cast("double") / F.lit(100)).alias("attributed_value"),
    )


@query(
    "attribution_linear",
    oracle=f"""
    WITH views AS (
        SELECT user_id, ts AS view_ts, event_id AS view_id
        FROM events WHERE event_type = 'view'
    ),
    purchases AS (
        SELECT user_id, ts AS p_ts, event_id AS p_id,
               {oracle_units("value", 100)} AS units
        FROM events WHERE event_type = 'purchase'
    ),
    pairs AS (
        SELECT p.user_id, p.p_id, p.units, v.view_ts, v.view_id
        FROM purchases p JOIN views v USING (user_id)
        WHERE v.view_ts <= p.p_ts
          AND v.view_ts > p.p_ts - INTERVAL 1 HOUR
    ),
    split AS (
        SELECT user_id, p_id,
               units // count(*) OVER (PARTITION BY p_id)
               + CASE WHEN row_number() OVER (PARTITION BY p_id
                                              ORDER BY view_ts, view_id) = 1
                      THEN units % count(*) OVER (PARTITION BY p_id)
                      ELSE 0 END AS attr_units
        FROM pairs
    )
    SELECT user_id,
           count(DISTINCT p_id) AS n_purchases,
           CAST(sum(attr_units) AS DOUBLE) / 100 AS attributed_value
    FROM split
    GROUP BY user_id
    """,
)
def q_attribution_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    return linear_attribution(load_table(spark, sf_dir, "events"))


# --- Markov removal-effect attribution ---------------------------------------

# The data-driven successor to rule-based (last-touch / linear)
# attribution (Anderl et al. 2016, public): model user journeys as a
# first-order Markov chain over channels with two absorbing states
# (conversion, null), then credit each channel by its REMOVAL EFFECT
# — how much the chain's conversion probability drops when journeys
# through that channel are blocked (its edges redirected to null).
#
# Scale shape: the 100 TB work is the journey→transition census (one
# user-keyed window pass + one combinable groupBy); the chain itself
# is a |states|² integer matrix — bounded by the channel vocabulary,
# not the data — so the absorption solve is driver-side arithmetic on
# a collected ~30-cell frame, the same bounded-model discipline as
# kmeans/BPE/IVF training.
#
# Cross-engine exactness: absorption probabilities are computed by a
# FIXED K-step value iteration in integer fixed-point (SCALE = 1e9):
#   p_{k+1}(s) = (T(s,conv)*SCALE + Σ_j T(s,j)·p_k(j)) // out(s)
# Every operation is exact int arithmetic with per-state floors, so
# K Python steps and the oracle's K unrolled SQL CTE layers (the
# PageRank fixed-unroll trick) produce bit-identical numbers — no
# convergence tolerance enters the hash gate.

MARKOV_SCALE = 10**9
MARKOV_ITERS = 25
_ABSORB_CONV = "conv"
_ABSORB_NULL = "null"
# Base-scenario sentinel for the oracle's scenario dimension. The
# Spark side uses Python None; the SQL side needs a string, and a
# channel literally named by that string would merge its removal
# scenario with the base scenario in the scens/edges GROUP BY — so
# the token starts with a control byte (US, 0x1f) no event_type can
# contain.
_SCEN_BASE = "\x1fbase"


def journey_transitions(events: DataFrame) -> DataFrame:
    """(frm, to_) transition rows: per user, events ordered by
    (ts, event_id) and truncated at the FIRST purchase; 'start' enters
    the first event, 'purchase' maps to the absorbing 'conv', and a
    non-converting journey's last event emits a terminal edge to
    'null'."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ranked = events.select(
        "user_id",
        "event_type",
        F.row_number().over(w).alias("rn"),
        F.lag("event_type", 1, "start").over(w).alias("prev"),
    )
    wu = Window.partitionBy("user_id")
    conv_rn = F.min(
        F.when(F.col("event_type") == "purchase", F.col("rn"))
    ).over(wu)
    kept = ranked.withColumn("conv_rn", conv_rn).where(
        F.col("rn") <= F.coalesce(F.col("conv_rn"), F.lit(1 << 62))
    )
    pairs = kept.select(
        F.col("prev").alias("frm"),
        F.when(F.col("event_type") == "purchase", F.lit(_ABSORB_CONV))
        .otherwise(F.col("event_type"))
        .alias("to_"),
    )
    wk = Window.partitionBy("user_id")
    last = kept.withColumn("mx", F.max("rn").over(wk)).where(
        (F.col("rn") == F.col("mx")) & (F.col("event_type") != "purchase")
    )
    terminals = last.select(
        F.col("event_type").alias("frm"), F.lit(_ABSORB_NULL).alias("to_")
    )
    return pairs.unionByName(terminals)


def _absorption(
    t: dict[tuple[str, str], int], remove: str | None
) -> dict[str, int]:
    """Fixed-K integer value iteration; returns p (scaled) per state."""
    redirected = {}
    for (frm, to), n in t.items():
        to2 = _ABSORB_NULL if (remove is not None and to == remove) else to
        redirected[(frm, to2)] = redirected.get((frm, to2), 0) + n
    out = {}
    for (frm, _), n in redirected.items():
        out[frm] = out.get(frm, 0) + n
    states = sorted(out)
    p = {s: 0 for s in states}
    for _ in range(MARKOV_ITERS):
        nxt = {}
        for s in states:
            acc = 0
            for (frm, to), n in redirected.items():
                if frm != s:
                    continue
                if to == _ABSORB_CONV:
                    acc += n * MARKOV_SCALE
                elif to in p:
                    acc += n * p[to]
            nxt[s] = acc // out[s]
        p = nxt
    return p


def markov_removal_attribution(events: DataFrame) -> DataFrame:
    """Per channel: transitions entering it, its removal effect on
    the chain's start→conversion probability, and its share of total
    removal effect — the Markov attribution report."""
    trans = journey_transitions(events)
    census = trans.groupBy("frm", "to_").agg(F.count(F.lit(1)).alias("n")).cache()
    t = {(r["frm"], r["to_"]): r["n"] for r in census.collect()}
    channels = sorted(
        {to for _, to in t if to not in (_ABSORB_CONV, _ABSORB_NULL)}
    )
    spark = events.sparkSession
    if not channels or ("start" not in {f for f, _ in t}):
        return census.select(
            F.col("frm").alias("channel"),
            F.lit(0).cast("long").alias("n_in"),
            F.lit(0.0).alias("removal_effect"),
            F.lit(0.0).alias("attribution_share"),
        ).limit(0)
    base = _absorption(t, None).get("start", 0)
    effects = {
        c: base - _absorption(t, c).get("start", 0) for c in channels
    }
    total_eff = sum(effects.values())
    import math

    eff_rows = [
        (
            c,
            float(effects[c]) / MARKOV_SCALE,
            # floor-scaled share mirroring the oracle's ops exactly:
            # double(e) * 1e6 / te, floored, descaled.
            math.floor(float(effects[c]) * 1000000 / max(total_eff, 1)) / 1000000.0,
        )
        for c in channels
    ]
    eff_df = spark.createDataFrame(
        eff_rows, "channel string, removal_effect double, attribution_share double"
    )
    n_in = (
        census.where(F.col("to_").isin(channels))
        .groupBy(F.col("to_").alias("channel"))
        .agg(F.sum("n").alias("n_in"))
    )
    return n_in.join(F.broadcast(eff_df), "channel").select(
        "channel", "n_in", "removal_effect", "attribution_share"
    )


def _markov_oracle() -> str:
    steps = []
    prev = "p0"
    for i in range(1, MARKOV_ITERS + 1):
        steps.append(
            f"""p{i} AS MATERIALIZED (
      SELECT e.scen, e.frm AS state,
             CAST(sum(CASE WHEN e.to_ = '{_ABSORB_CONV}'
                           THEN e.n * {MARKOV_SCALE}
                           ELSE e.n * coalesce(p.pv, 0) END)
                  // greatest(o.outn, 1) AS BIGINT) AS pv
      FROM edges e
      JOIN outn o ON o.scen = e.scen AND o.frm = e.frm
      LEFT JOIN {prev} p ON p.scen = e.scen AND p.state = e.to_
      GROUP BY e.scen, e.frm, o.outn
    )"""
        )
        prev = f"p{i}"
    chain = ",\n    ".join(steps)
    return f"""
    WITH ranked AS MATERIALIZED (
      SELECT user_id, event_type,
             row_number() OVER w AS rn,
             lag(event_type, 1, 'start') OVER w AS prev,
             min(CASE WHEN event_type = 'purchase' THEN rn_i END)
                 OVER (PARTITION BY user_id) AS conv_rn
      FROM (
        SELECT user_id, event_type, ts, event_id,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id) AS rn_i
        FROM events
      )
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), kept AS MATERIALIZED (
      SELECT *, max(rn) OVER (PARTITION BY user_id) AS mx
      FROM ranked
      WHERE rn <= coalesce(conv_rn, 4611686018427387904)
    ), trans AS MATERIALIZED (
      SELECT prev AS frm,
             CASE WHEN event_type = 'purchase' THEN '{_ABSORB_CONV}'
                  ELSE event_type END AS to_
      FROM kept
      UNION ALL
      SELECT event_type AS frm, '{_ABSORB_NULL}' AS to_
      FROM kept WHERE rn = mx AND event_type <> 'purchase'
    ), t AS MATERIALIZED (
      SELECT frm, to_, count(*) AS n FROM trans GROUP BY 1, 2
    ), chans AS MATERIALIZED (
      SELECT DISTINCT to_ AS c FROM t
      WHERE to_ NOT IN ('{_ABSORB_CONV}', '{_ABSORB_NULL}')
    ), scens AS MATERIALIZED (
      SELECT '{_SCEN_BASE}' AS scen UNION ALL SELECT c FROM chans
    ), edges AS MATERIALIZED (
      SELECT s.scen, t.frm,
             CASE WHEN t.to_ = s.scen THEN '{_ABSORB_NULL}'
                  ELSE t.to_ END AS to_,
             sum(t.n) AS n
      FROM t CROSS JOIN scens s
      GROUP BY 1, 2, 3
    ), outn AS MATERIALIZED (
      SELECT scen, frm, sum(n) AS outn FROM edges GROUP BY 1, 2
    ), p0 AS MATERIALIZED (
      SELECT scen, frm AS state, CAST(0 AS BIGINT) AS pv FROM outn
    ),
    {chain},
    base AS (
      SELECT pv FROM {prev} WHERE scen = '{_SCEN_BASE}' AND state = 'start'
    ), eff AS MATERIALIZED (
      SELECT c.c AS channel,
             (SELECT pv FROM base)
             - coalesce((SELECT pv FROM {prev} p
                         WHERE p.scen = c.c AND p.state = 'start'), 0)
                 AS e
      FROM chans c
    ), tot AS (SELECT sum(e) AS te FROM eff)
    SELECT eff.channel,
           (SELECT CAST(sum(n) AS BIGINT) FROM t
            WHERE t.to_ = eff.channel) AS n_in,
           CAST(eff.e AS DOUBLE) / {MARKOV_SCALE} AS removal_effect,
           (floor(CAST(eff.e AS DOUBLE) * 1000000
                  / greatest((SELECT te FROM tot), 1)) / 1000000.0)
               AS attribution_share
    FROM eff
    """


@query("markov_removal_attribution", oracle=_markov_oracle())
def q_markov_removal_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    return markov_removal_attribution(load_table(spark, sf_dir, "events"))
