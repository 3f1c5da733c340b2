"""Event-stream operators, batch form.

The reference is strictly batch with a hard map→reduce barrier
(``core/coordinator.go:317-324``) and has no time semantics at all;
this module adds the standard event-time operator family over the
``events`` table. Each query here has a Structured Streaming twin in
``mapreduce_lab_spark/streaming/jobs.py`` built from the SAME helper
(identical logical plan, streaming source) — the batch form is what
the DuckDB oracle can check.

Scale notes: ``window()``/``session_window()`` are native Catalyst
operators (generate + hash/merge aggregate) and shuffle only on
(key, window); the as-of join is the union+window pattern — one
shuffle on user_id, no per-row Python, no range cross-join blowup.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from mapreduce_lab_spark.functions.numeric import (
    exact_avg,
    oracle_exact_avg,
    oracle_exact_sum,
    oracle_units,
    to_units,
)
from mapreduce_lab_spark.registry import query
from mapreduce_lab_spark.sources.tables import load_table


def tumbling_counts(events: DataFrame, width: str = "1 hour") -> DataFrame:
    return (
        events.groupBy(F.window("ts", width).alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            (F.sum(to_units("value", 100)) / 100.0).alias("total_value"),
        )
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


# Shared with the streaming replay twins (streaming/replay.py): the
# same oracle checks the batch plan AND its full streaming replay.
TUMBLING_ORACLE = f"""
    SELECT strftime(time_bucket(INTERVAL 1 HOUR, ts), '%Y-%m-%d %H:%M:%S') AS window_start,
           event_type,
           count(*) AS n_events,
           {oracle_exact_sum('value', 100)} AS total_value
    FROM events
    GROUP BY 1, 2
    """


@query("tumbling_window_hourly", oracle=TUMBLING_ORACLE)
def q_tumbling_window_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    return tumbling_counts(load_table(spark, sf_dir, "events"))


def sliding_counts(events: DataFrame) -> DataFrame:
    """1-hour windows sliding every 15 minutes."""
    return (
        events.groupBy(F.window("ts", "1 hour", "15 minutes").alias("w"))
        .agg(
            F.count("*").alias("n_events"),
            exact_avg(F.sum(to_units("value", 100)), F.count("*"), 100).alias("avg_value"),
        )
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "n_events",
            "avg_value",
        )
    )


SLIDING_ORACLE = f"""
    -- Each event belongs to 4 sliding windows: the one starting at its
    -- 15-min bucket and the 3 before it (width 1h / slide 15min).
    SELECT strftime(time_bucket(INTERVAL 15 MINUTE, ts) - k * INTERVAL 15 MINUTE,
                    '%Y-%m-%d %H:%M:%S') AS window_start,
           count(*) AS n_events,
           {oracle_exact_avg(f"sum({oracle_units('value', 100)})", 'count(*)', 100)} AS avg_value
    FROM events, unnest([0, 1, 2, 3]) AS t(k)
    GROUP BY 1
    """


@query("sliding_window_15min", oracle=SLIDING_ORACLE)
def q_sliding_window_15min(spark: SparkSession, sf_dir: str) -> DataFrame:
    return sliding_counts(load_table(spark, sf_dir, "events"))


def session_windows(events: DataFrame, gap: str = "10 minutes") -> DataFrame:
    """Per-user sessions: events merge while consecutive gaps < gap."""
    return (
        events.groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(
            F.count("*").alias("n_events"),
            (F.sum(to_units("value", 100)) / 100.0).alias("session_value"),
        )
        .select(
            "user_id",
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("session_start"),
            "n_events",
            "session_value",
        )
    )


SESSION_ORACLE = """
    -- Gaps-and-islands: a new session starts when the gap from the
    -- previous event of the same user is >= 10 minutes (session_window
    -- merges [ts, ts+gap) intervals, which overlap iff next < prev + gap).
    WITH flagged AS (
      SELECT user_id, ts, value,
             CASE WHEN lag(ts) OVER w IS NULL
                    OR ts >= lag(ts) OVER w + INTERVAL 10 MINUTE
                  THEN 1 ELSE 0 END AS new_session
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), numbered AS (
      SELECT user_id, ts, value,
             sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess
      FROM flagged
    )
    SELECT user_id,
           strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
           count(*) AS n_events,
           sum(CAST(round(value * 100) AS BIGINT)) / 100.0 AS session_value
    FROM numbered
    GROUP BY user_id, sess
    """


@query("session_window_10min", oracle=SESSION_ORACLE)
def q_session_window_10min(spark: SparkSession, sf_dir: str) -> DataFrame:
    return session_windows(load_table(spark, sf_dir, "events"))


def asof_join_purchases_to_views(events: DataFrame) -> DataFrame:
    """Each purchase matched to the user's most recent view at-or-before it.

    Union + running-last pattern (the scalable as-of join): tag both
    sides, sort within user by time with the match side first on ties,
    carry the last seen view timestamp forward. One shuffle on
    user_id; contrast with a naive range self-join which is O(n²) per
    user. This is the composition-of-existing-ops route for an
    operator Spark lacks natively (SURVEY.md §2.3 joins row).
    """
    views = events.filter(F.col("event_type") == "view").select(
        "user_id", "ts", F.lit(0).alias("side"), F.lit(None).cast("bigint").alias("event_id")
    )
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", F.lit(1).alias("side"), "event_id"
    )
    unioned = views.unionByName(purchases)
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = unioned.withColumn(
        "last_view_ts",
        F.last(F.when(F.col("side") == 0, F.col("ts")), ignorenulls=True).over(w),
    )
    return matched.filter(F.col("side") == 1).select(
        "event_id",
        "user_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("purchase_ts"),
        F.date_format("last_view_ts", "yyyy-MM-dd HH:mm:ss").alias("view_ts"),
        # whole elapsed seconds via integer micros — double epoch
        # seconds would lose precision, and "boundary crossing" counts
        # (DuckDB date_diff) disagree with elapsed time by ±1
        ((F.unix_micros("ts") - F.unix_micros("last_view_ts")) / F.lit(1000000))
        .cast("bigint")
        .alias("lag_seconds"),
    )


@query(
    "asof_join_purchase_to_view",
    oracle="""
    SELECT p.event_id,
           p.user_id,
           strftime(p.ts, '%Y-%m-%d %H:%M:%S') AS purchase_ts,
           strftime(v.ts, '%Y-%m-%d %H:%M:%S') AS view_ts,
           CAST((epoch_us(p.ts) - epoch_us(v.ts)) // 1000000 AS BIGINT) AS lag_seconds
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'view') v
      ON p.user_id = v.user_id AND p.ts >= v.ts
    """,
)
def q_asof_join_purchase_to_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    return asof_join_purchases_to_views(load_table(spark, sf_dir, "events"))


@query(
    "json_props_extract",
    oracle="""
    SELECT event_type,
           floor(sum(CAST(json_extract_string(props, '$.k') AS INT)) * 1000000 / count(*)) / 1000000.0 AS avg_k,
           max(CAST(json_extract_string(props, '$.k') AS INT)) AS max_k,
           count(*) AS n
    FROM events
    GROUP BY event_type
    """,
)
def q_json_props_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    return events.groupBy("event_type").agg(
        exact_avg(F.sum(k.cast("long")), F.count("*"), 1).alias("avg_k"),
        F.max(k).alias("max_k"),
        F.count("*").alias("n"),
    )


@query(
    "dedup_first_event_per_user_type",
    oracle="""
    SELECT user_id, event_type, event_id,
           strftime(ts, '%Y-%m-%d %H:%M:%S') AS first_ts
    FROM (
      SELECT user_id, event_type, event_id, ts,
             row_number() OVER (PARTITION BY user_id, event_type
                                ORDER BY ts, event_id) AS rn
      FROM events
    ) WHERE rn = 1
    """,
)
def q_dedup_first_event(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Deterministic "keep first" dedup — the batch analog of streaming
    # dropDuplicates (which keeps the first arrival). row_number over
    # (key → event-time order) rather than dropDuplicates() so the
    # kept row is well-defined regardless of partitioning.
    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    return (
        events.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            "event_type",
            "event_id",
            F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("first_ts"),
        )
    )


@query(
    "map_functions_props",
    oracle="""
    SELECT event_id,
           array_to_string(json_keys(props), ',') AS keys,
           CAST(json_extract_string(props, '$.k') AS INT) AS k_val,
           len(json_keys(props)) AS n_keys
    FROM events
    WHERE event_id < 1000
    """,
)
def q_map_functions_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MapType surface: parse the JSON props into map<string,int> and
    operate on it with map functions (keys, cardinality, element_at).

    ``from_json`` to MapType is the idiomatic route for ragged JSON
    objects whose keys vary by row — unlike a struct schema it needs
    no upfront key inventory; the parse stays JVM-side (Jackson), no
    Python. Map columns themselves aren't comparable across engines,
    so the query projects scalars derived from the map.
    """
    events = load_table(spark, sf_dir, "events").filter(F.col("event_id") < 1000)
    m = F.from_json("props", "map<string,int>")
    return events.select(
        "event_id",
        F.concat_ws(",", F.map_keys(m)).alias("keys"),
        F.element_at(m, "k").alias("k_val"),
        F.size(m).alias("n_keys"),
    )


# --- cogroup as-of twin ----------------------------------------------------


def asof_join_cogroup(events: DataFrame) -> DataFrame:
    """The same as-of join via ``cogroup().applyInPandas`` + merge_asof.

    The cogroup route exists for per-key merge logic the built-in
    operators can't express (custom matching windows, per-key model
    state); here it re-implements the as-of match so its output is
    pinned to the same DuckDB ASOF JOIN oracle as the window-based
    ``asof_join_purchase_to_view`` — two independent algorithms, one
    answer. Each user's two event slices arrive as pandas frames and
    ``pd.merge_asof`` does the backward match.

    Scale shape: one shuffle of each side on user_id (the cogroup
    key), then Arrow-batched per-group Python. Per-GROUP invocation
    cost makes this the wrong tool for millions of tiny groups — use
    the union+running-last composition for that — but the right one
    when the per-key logic is genuinely imperative.
    """
    # Fresh attribute ids on the view side (alias-project + subquery
    # alias), because both cogroup children derive from ONE events
    # scan: with shared expression ids, Catalyst's self-cogroup
    # attribute deduplication interacts with column pruning so that
    # any consumer that references none of the output columns (a bare
    # count(), a cached count, a subset write) prunes the RIGHT
    # child's non-grouping columns — the UDF then receives a views
    # frame containing only user_id and crashes on pdf_v["ts"].
    # Column-referencing consumers (collect, the parity harness, the
    # driver compare) never trip it, which is how the defect stayed
    # latent through twelve rounds; tests/test_cogroup_pruning.py pins
    # the count() path now. Re-aliasing breaks the id sharing, so the
    # dedup never fires and the cogroup's child references survive.
    views = events.filter(F.col("event_type") == "view").select(
        F.col("user_id").alias("user_id"), F.col("ts").alias("ts")
    ).alias("asof_view_side")
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "event_id"
    )
    schema = (
        "event_id long, user_id long, purchase_ts string, view_ts string,"
        " lag_seconds long"
    )

    def merge(key, pdf_p, pdf_v):  # noqa: ANN001
        import numpy as np
        import pandas as pd

        if pdf_p.empty:
            return pd.DataFrame(
                columns=["event_id", "user_id", "purchase_ts", "view_ts", "lag_seconds"]
            )
        p = pdf_p.sort_values("ts")
        v = pdf_v.sort_values("ts").copy()
        v["vts"] = v["ts"]
        m = pd.merge_asof(p, v[["ts", "vts"]], on="ts", direction="backward")
        lag_us = (m["ts"] - m["vts"]).dt.total_seconds()
        matched = m["vts"].notna()
        return pd.DataFrame(
            {
                "event_id": m["event_id"],
                "user_id": m["user_id"],
                "purchase_ts": m["ts"].dt.strftime("%Y-%m-%d %H:%M:%S"),
                "view_ts": m["vts"].dt.strftime("%Y-%m-%d %H:%M:%S").where(matched, None),
                "lag_seconds": np.floor(lag_us).astype("Int64").where(matched, None),
            }
        )

    return (
        purchases.groupby("user_id")
        .cogroup(views.groupby("user_id"))
        .applyInPandas(merge, schema=schema)
    )


@query(
    "asof_join_cogroup",
    oracle="""
    SELECT p.event_id,
           p.user_id,
           strftime(p.ts, '%Y-%m-%d %H:%M:%S') AS purchase_ts,
           strftime(v.ts, '%Y-%m-%d %H:%M:%S') AS view_ts,
           CAST((epoch_us(p.ts) - epoch_us(v.ts)) // 1000000 AS BIGINT) AS lag_seconds
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'view') v
      ON p.user_id = v.user_id AND p.ts >= v.ts
    """,
)
def q_asof_join_cogroup(spark: SparkSession, sf_dir: str) -> DataFrame:
    return asof_join_cogroup(load_table(spark, sf_dir, "events"))


# --- VARIANT (semi-structured) surface ------------------------------------


@query(
    "variant_props_stats",
    oracle="""
    SELECT event_type,
           count(*) AS n_events,
           CAST(sum(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
           CAST(max(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS max_k
    FROM events
    WHERE CAST(json_extract(props, '$.k') AS BIGINT) IS NOT NULL
    GROUP BY event_type
    """,
)
def q_variant_props_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured props via the VARIANT type (new in Spark 4):
    ``parse_json`` once, typed ``variant_get`` paths after.

    Against the string-JSON twin (``json_props_extract``,
    ``get_json_object``), VARIANT is the 100 TB answer: the binary
    encoding parses each document once at ingest (or first touch)
    instead of re-parsing the JSON text in every path expression, and
    path access is O(depth) on the encoded form. Aggregation stays
    integer-exact; shuffle carries (event_type, partials) only.
    DuckDB oracles the same result through its native JSON path
    functions — two engines, two semi-structured encodings, one typed
    answer.
    """
    ev = load_table(spark, sf_dir, "events")
    k = F.expr("variant_get(parse_json(props), '$.k', 'long')")
    return (
        ev.select("event_type", k.alias("k"))
        .where(F.col("k").isNotNull())
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum("k").alias("sum_k"),
            F.max("k").alias("max_k"),
        )
    )


# --- interval-overlap join ------------------------------------------------


def interval_overlap_sessions(
    events: DataFrame,
    type_a: str = "click",
    type_b: str = "error",
    gap: str = "10 minutes",
) -> DataFrame:
    """Keyed interval-overlap join: per user, click-sessions that
    overlap error-sessions in time — "was the user's activity
    concurrent with errors?", the temporal join neither as-of nor
    windowed aggregation expresses.

    Both sides sessionize with the native ``session_window`` (same
    [ts, ts+gap) merge semantics as ``session_window_10min``); the
    join is an EQUI-join on user_id with the overlap predicate
    ``a.start < b.end AND b.start < a.end`` as a post-join filter, so
    Catalyst plans a hash join, never a theta join — per-key candidate
    pairs are bounded by sessions-per-user, which the session gap
    bounds structurally (a user emits at most one session per gap
    interval). For the KEYLESS variant at scale, the standard
    construction is time-block bucketing (explode each interval to the
    coarse blocks it touches, equi-join on block, dedup pairs) — same
    candidate-then-verify shape as the LSH dedup families.

    Overlap durations are exact integer MICROSECONDS
    (``unix_micros``/``epoch_us``): no float time arithmetic, so the
    per-user sums are order-independent and engine-identical.
    """

    def sess(t: str):
        return (
            events.where(F.col("event_type") == t)
            .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
            .agg(F.count("*").alias("n"))
            .select(
                "user_id",
                F.col("w.start").alias("s"),
                F.col("w.end").alias("e"),
            )
        )

    a, b = sess(type_a).alias("a"), sess(type_b).alias("b")
    ov_us = F.unix_micros(F.least(F.col("a.e"), F.col("b.e"))) - F.unix_micros(
        F.greatest(F.col("a.s"), F.col("b.s"))
    )
    pairs = (
        a.join(b, "user_id")
        .where((F.col("a.s") < F.col("b.e")) & (F.col("b.s") < F.col("a.e")))
        .select("user_id", ov_us.alias("ov_us"))
    )
    return pairs.groupBy("user_id").agg(
        F.count("*").alias("n_overlaps"),
        F.sum("ov_us").alias("total_overlap_us"),
    )


def _sess_cte(alias: str, event_type: str) -> str:
    """Gaps-and-islands sessionization of one event type — the same
    CTE shape as SESSION_ORACLE, reduced to (user_id, start, end)."""
    return f"""
    {alias} AS (
      SELECT user_id, min(ts) AS s, max(ts) + INTERVAL 10 MINUTE AS e
      FROM (
        SELECT user_id, ts,
               sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess
        FROM (
          SELECT user_id, ts, event_id,
                 CASE WHEN lag(ts) OVER w IS NULL
                        OR ts >= lag(ts) OVER w + INTERVAL 10 MINUTE
                      THEN 1 ELSE 0 END AS new_session
          FROM events WHERE event_type = '{event_type}'
          WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        )
      )
      GROUP BY user_id, sess
    )"""


_OVERLAP_SQL = f"""
WITH {_sess_cte("sa", "click")},
{_sess_cte("sb", "error")},
pairs AS (
    SELECT sa.user_id,
           epoch_us(least(sa.e, sb.e)) - epoch_us(greatest(sa.s, sb.s)) AS ov_us
    FROM sa JOIN sb ON sa.user_id = sb.user_id
    WHERE sa.s < sb.e AND sb.s < sa.e
)
SELECT user_id, count(*) AS n_overlaps, CAST(sum(ov_us) AS BIGINT) AS total_overlap_us
FROM pairs GROUP BY user_id
"""


@query("interval_overlap_sessions", oracle=_OVERLAP_SQL)
def q_interval_overlap_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user count + exact-microsecond total of click-session /
    error-session time overlaps."""
    return interval_overlap_sessions(load_table(spark, sf_dir, "events"))


BLOCK_SECONDS = 3600  # candidate-generation time blocks (1 hour)


def concurrent_error_overlap(
    events: DataFrame, gap: str = "10 minutes", block_s: int = BLOCK_SECONDS
) -> DataFrame:
    """KEYLESS interval-overlap join via time-block bucketing:
    error-session pairs of DIFFERENT users that overlap in time —
    cross-user incident correlation, the join with no equi-key at all.

    The scale construction (the one ``interval_overlap_sessions``'s
    docstring names): explode each session to the 1-hour blocks it
    touches, equi-join on block (so candidate pairs are generated
    only inside a block, never across the whole timeline), DISTINCT
    away the double-counting of pairs that share several blocks, then
    verify true overlap and aggregate. Candidate work is
    O(sum over blocks of concurrency²) — the join's true output size
    plus block-boundary false candidates — instead of the O(n²)
    theta join the naive form plans. Sessions are short relative to
    the block, so the explode factor stays ~1-2 rows per session.

    The oracle is the NAIVE theta join — the bucketing must be
    plan-different but result-identical. Overlaps aggregate per day
    (of the overlap start) in exact integer microseconds.
    """
    sess = (
        events.where(F.col("event_type") == "error")
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count("*").alias("n"))
        .select("user_id", F.col("w.start").alias("s"), F.col("w.end").alias("e"))
    )
    blk_us = block_s * 1_000_000
    blocks = sess.select(
        "user_id",
        "s",
        "e",
        F.explode(
            F.sequence(
                F.floor(F.unix_micros("s") / blk_us).cast("long"),
                F.floor(F.unix_micros("e") / blk_us).cast("long"),
            )
        ).alias("blk"),
    )
    a, b = blocks.alias("a"), blocks.alias("b")
    cand = (
        a.join(b, "blk")
        .where(F.col("a.user_id") < F.col("b.user_id"))
        .select(
            F.col("a.user_id").alias("u1"),
            F.col("a.s").alias("s1"),
            F.col("a.e").alias("e1"),
            F.col("b.user_id").alias("u2"),
            F.col("b.s").alias("s2"),
            F.col("b.e").alias("e2"),
        )
        .distinct()  # a pair sharing k blocks appears k times
    )
    verified = cand.where((F.col("s1") < F.col("e2")) & (F.col("s2") < F.col("e1")))
    ov_us = F.unix_micros(F.least("e1", "e2")) - F.unix_micros(F.greatest("s1", "s2"))
    return (
        verified.select(
            F.date_format(F.greatest("s1", "s2"), "yyyy-MM-dd").alias("day"),
            ov_us.alias("ov_us"),
        )
        .groupBy("day")
        .agg(
            F.count("*").alias("n_pairs"),
            F.sum("ov_us").alias("total_overlap_us"),
        )
    )


_CONCURRENT_SQL = f"""
WITH {_sess_cte("se", "error")},
pairs AS (
    SELECT strftime(greatest(a.s, b.s), '%Y-%m-%d') AS day,
           epoch_us(least(a.e, b.e)) - epoch_us(greatest(a.s, b.s)) AS ov_us
    FROM se a JOIN se b
      ON a.user_id < b.user_id AND a.s < b.e AND b.s < a.e
)
SELECT day, count(*) AS n_pairs, CAST(sum(ov_us) AS BIGINT) AS total_overlap_us
FROM pairs GROUP BY day
"""


@query("concurrent_error_overlap", oracle=_CONCURRENT_SQL)
def q_concurrent_error_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily count + exact-microsecond total of cross-user error-session
    overlaps, generated through hour-block bucketing (oracle = naive
    theta join)."""
    return concurrent_error_overlap(load_table(spark, sf_dir, "events"))


ASOF_FWD_TOLERANCE_S = 7200  # 2 hours


def asof_join_views_to_next_purchase(
    events: DataFrame, tolerance_s: int = ASOF_FWD_TOLERANCE_S
) -> DataFrame:
    """FORWARD as-of with tolerance: each view matched to the user's
    NEXT purchase at-or-after it, but only within ``tolerance_s`` —
    otherwise the match is NULL (left semantics). The attribution
    question "did this view convert within 2 h?".

    The mirror of ``asof_join_purchases_to_views``: same union +
    one-shuffle running-edge composition, with the window looking
    FORWARD (``[currentRow, unboundedFollowing]`` + first-non-null)
    instead of backward, and the tolerance applied as a scalar gate
    after the match — the gate cannot change which purchase is
    nearest, so it composes with the running edge exactly. Ties
    (purchase at the identical timestamp) match: the view side sorts
    first at equal ts, and the forward window includes the current
    position onward.
    """
    views = events.filter(F.col("event_type") == "view").select(
        "user_id", "ts", F.lit(0).alias("side"), "event_id"
    )
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", F.lit(1).alias("side"),
        F.lit(None).cast("bigint").alias("event_id"),
    )
    unioned = views.unionByName(purchases)
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "side")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    matched = unioned.withColumn(
        "next_p_ts",
        F.first(F.when(F.col("side") == 1, F.col("ts")), ignorenulls=True).over(w),
    )
    lead_us = F.unix_micros("next_p_ts") - F.unix_micros("ts")
    in_tol = F.col("next_p_ts").isNotNull() & (
        lead_us <= F.lit(tolerance_s * 1_000_000)
    )
    return matched.filter(F.col("side") == 0).select(
        "event_id",
        "user_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("view_ts"),
        F.when(in_tol, F.date_format("next_p_ts", "yyyy-MM-dd HH:mm:ss")).alias(
            "next_purchase_ts"
        ),
        F.when(in_tol, (lead_us / F.lit(1_000_000)).cast("bigint")).alias(
            "lead_seconds"
        ),
    )


_ASOF_FWD_SQL = f"""
WITH v AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'view'),
p AS (SELECT user_id, ts FROM events WHERE event_type = 'purchase'),
m AS (
    SELECT v.event_id, v.user_id, v.ts AS vts,
           (SELECT min(p.ts) FROM p
            WHERE p.user_id = v.user_id AND p.ts >= v.ts) AS pts
    FROM v
)
SELECT event_id, user_id,
       strftime(vts, '%Y-%m-%d %H:%M:%S') AS view_ts,
       CASE WHEN pts IS NOT NULL
             AND epoch_us(pts) - epoch_us(vts) <= {ASOF_FWD_TOLERANCE_S * 1_000_000}
            THEN strftime(pts, '%Y-%m-%d %H:%M:%S') END AS next_purchase_ts,
       CASE WHEN pts IS NOT NULL
             AND epoch_us(pts) - epoch_us(vts) <= {ASOF_FWD_TOLERANCE_S * 1_000_000}
            THEN CAST((epoch_us(pts) - epoch_us(vts)) // 1000000 AS BIGINT)
       END AS lead_seconds
FROM m
"""


@query("asof_join_forward_tolerance", oracle=_ASOF_FWD_SQL)
def q_asof_join_forward_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Views matched to the next same-user purchase within 2 h (NULL
    beyond tolerance). Oracle = correlated min-subquery, an
    independent formulation of the same forward as-of."""
    return asof_join_views_to_next_purchase(load_table(spark, sf_dir, "events"))


def multi_grain_event_rollup(events: DataFrame) -> DataFrame:
    """Hour/day/week counts per event type in ONE scan: each event
    explodes into its three (grain, bucket) memberships, then a single
    map-side-combinable aggregation.

    GROUPING SETS would express the same batch result, but the explode
    form is the STREAMING-SAFE shape — multi-dimensional grouping sets
    are not allowed in streaming aggregations, while explode + groupBy
    is, so the same plan serves both paths (the registry's batch twin
    discipline). Cost: the shuffle carries 3 partial rows per
    (grain, bucket, type) per partition instead of one scan per grain
    — one pass over 100 TB instead of three.

    Buckets render as strings (the house date convention) with the
    grain label folded in, so the output is one tidy frame.
    """
    grains = F.array(
        F.struct(
            F.lit("hour").alias("grain"),
            F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd HH:mm").alias("bucket"),
        ),
        F.struct(
            F.lit("day").alias("grain"),
            F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd HH:mm").alias("bucket"),
        ),
        F.struct(
            F.lit("week").alias("grain"),
            F.date_format(F.date_trunc("week", "ts"), "yyyy-MM-dd HH:mm").alias("bucket"),
        ),
    )
    return (
        events.select("event_type", F.explode(grains).alias("g"))
        .groupBy("event_type", F.col("g.grain").alias("grain"), F.col("g.bucket").alias("bucket"))
        .agg(F.count("*").alias("n_events"))
    )


_MULTI_GRAIN_SQL = """
SELECT event_type, g.grain,
       strftime(date_trunc(g.grain, ts), '%Y-%m-%d %H:%M') AS bucket,
       count(*) AS n_events
FROM events, (SELECT unnest(['hour', 'day', 'week']) AS grain) g
GROUP BY event_type, g.grain, date_trunc(g.grain, ts)
"""


@query("multi_grain_event_rollup", oracle=_MULTI_GRAIN_SQL)
def q_multi_grain_event_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hour/day/week event counts from one pass (explode-as-rollup,
    the streaming-compatible multi-granularity aggregation)."""
    return multi_grain_event_rollup(load_table(spark, sf_dir, "events"))
