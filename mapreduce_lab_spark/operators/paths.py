"""Event-sequence analytics: session paths and Markov transitions.

Superset surface (the reference has no event streams). The two core
clickstream primitives:

- ``session_top_paths``: the most common ordered event-type paths —
  each user's session (10-minute gap sessionization, same params as
  ``session_window_10min``) reduced to its path string, then a
  count + global top-k.
- ``markov_event_transitions``: first-order transition counts and
  probabilities P(next | current) over each user's ordered stream.

Scale shape: sessionization and ordering both partition by
``user_id`` (high cardinality); the path reduction uses
``sort_array(collect_list(struct(ts, event_id, event_type)))`` — an
in-group sort whose group size is a SESSION (bounded by human
behavior, tens of events), not a user history, so collect_list is
safe; the global path top-k aggregates path-string counts (map-side
combinable, paths are short strings). Transitions are a lag window +
integer count aggregation — probabilities in exact fixed-point so
the hash gate stays exact.

Determinism: (ts, event_id) uniquely orders within a user; struct
sort is lexicographic on that pair.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from mapreduce_lab_spark.functions.numeric import exact_ratio, oracle_exact_ratio
from mapreduce_lab_spark.registry import query
from mapreduce_lab_spark.sources.tables import load_table

SESSION_GAP = "10 minutes"
PATH_TOP_K = 20


def session_paths(events: DataFrame, gap: str = SESSION_GAP) -> DataFrame:
    """One row per (user, session) with its ordered path string."""
    return (
        events.groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(
            F.array_join(
                F.transform(
                    F.sort_array(
                        F.collect_list(F.struct("ts", "event_id", "event_type"))
                    ),
                    lambda s: s.getField("event_type"),
                ),
                ">",
            ).alias("path")
        )
        .select("user_id", "path")
    )


def top_paths(events: DataFrame, k: int = PATH_TOP_K) -> DataFrame:
    paths = session_paths(events)
    return (
        paths.groupBy("path")
        .agg(F.count("*").alias("n_sessions"))
        .orderBy(F.col("n_sessions").desc(), F.col("path").asc())
        .limit(k)
    )


@query(
    "session_top_paths",
    oracle=f"""
    -- Sessionize exactly like session_window_10min's oracle: a new
    -- session starts when the gap from the previous event of the same
    -- user is >= 10 minutes (session_window merges [ts, ts+gap)
    -- intervals, which overlap iff next < prev + gap).
    WITH numbered AS (
        SELECT user_id, ts, event_id, event_type,
               CASE WHEN lag(ts) OVER (PARTITION BY user_id
                                       ORDER BY ts, event_id) IS NULL
                         OR ts >= lag(ts) OVER (PARTITION BY user_id
                                                ORDER BY ts, event_id)
                            + INTERVAL 10 MINUTE
                    THEN 1 ELSE 0 END AS is_start
        FROM events
    ),
    sessioned AS (
        SELECT *, sum(is_start) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id
                                      ROWS BETWEEN UNBOUNDED PRECEDING
                                      AND CURRENT ROW) AS session_id
        FROM numbered
    ),
    paths AS (
        SELECT user_id, session_id,
               string_agg(event_type, '>' ORDER BY ts, event_id) AS path
        FROM sessioned GROUP BY user_id, session_id
    )
    SELECT path, count(*) AS n_sessions
    FROM paths GROUP BY path
    ORDER BY n_sessions DESC, path ASC
    LIMIT {PATH_TOP_K}
    """,
)
def q_session_top_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    return top_paths(load_table(spark, sf_dir, "events"))


def markov_transitions(events: DataFrame) -> DataFrame:
    """P(next event type | current), exact fixed-point probabilities."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (
        events.withColumn("next_type", F.lead("event_type").over(w))
        .where(F.col("next_type").isNotNull())
        .groupBy(
            F.col("event_type").alias("from_type"),
            F.col("next_type").alias("to_type"),
        )
        .agg(F.count("*").alias("n"))
    )
    totals = Window.partitionBy("from_type")
    return pairs.select(
        "from_type",
        "to_type",
        "n",
        exact_ratio(F.col("n"), F.sum("n").over(totals)).alias("p"),
    )


@query(
    "markov_event_transitions",
    oracle=f"""
    WITH pairs AS (
        SELECT event_type AS from_type,
               lead(event_type) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id) AS to_type
        FROM events
    ),
    counted AS (
        SELECT from_type, to_type, count(*) AS n
        FROM pairs WHERE to_type IS NOT NULL
        GROUP BY from_type, to_type
    )
    SELECT from_type, to_type, n,
           {oracle_exact_ratio("n", "sum(n) OVER (PARTITION BY from_type)")} AS p
    FROM counted
    """,
)
def q_markov_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    return markov_transitions(load_table(spark, sf_dir, "events"))


# --- sequence pattern matching (MATCH_RECOGNIZE-lite) ----------------------

# Each session reduces to a compact string of event-type initials
# (signup/click/error/view/purchase → s/c/e/v/p); funnel patterns are
# ordinary regexes over that string. Restricted to RE2/Java-common
# syntax (no lookaround/backrefs) so both engines agree.
PATTERNS = [
    ("view_then_purchase", "v.*p"),
    ("signup_to_purchase", "s.*p"),
    ("error_then_purchase", "e.*p"),
    ("pure_browse", "^[vc]+$"),
]


def session_codes(events: DataFrame, gap: str = SESSION_GAP) -> DataFrame:
    """One row per (user, session): the session as a compact string of
    event-type initials, deterministically ordered by (ts, event_id)."""
    return (
        events.groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(
            F.array_join(
                F.transform(
                    F.sort_array(
                        F.collect_list(F.struct("ts", "event_id", "event_type"))
                    ),
                    lambda s: F.substring(s.getField("event_type"), 1, 1),
                ),
                "",
            ).alias("code")
        )
        .select("user_id", "code")
    )


def event_pattern_match(events: DataFrame) -> DataFrame:
    """Sessions matching each funnel regex, with exact match share.

    The cheap, scalable core of MATCH_RECOGNIZE-style sequence
    queries: sessionize once (bounded in-group sort, same params as
    session_top_paths), collapse each session to a short code string,
    then every pattern is a codegen regex over ~tens of characters.
    The patterns frame (4 rows) cross-joins broadcast against session
    strings — the corpus-side work is one narrow regexp per pattern,
    and the rollup shuffles (pattern, partials) only.
    """
    spark = events.sparkSession
    codes = session_codes(events)
    pats = spark.createDataFrame(PATTERNS, ["pattern", "re"])
    return (
        codes.crossJoin(F.broadcast(pats))
        .groupBy("pattern")
        .agg(
            F.sum(
                F.when(F.expr("regexp_like(code, re)"), 1).otherwise(0)
            ).alias("n_matched"),
            F.count("*").alias("n_sessions"),
        )
        .select(
            "pattern",
            "n_matched",
            "n_sessions",
            exact_ratio(F.col("n_matched"), F.col("n_sessions")).alias("match_share"),
        )
    )


_PATTERN_VALUES = ", ".join(f"('{n}', '{r}')" for n, r in PATTERNS)


@query(
    "event_pattern_match",
    oracle=f"""
    WITH numbered AS (
        SELECT user_id, ts, event_id, event_type,
               CASE WHEN lag(ts) OVER (PARTITION BY user_id
                                       ORDER BY ts, event_id) IS NULL
                         OR ts >= lag(ts) OVER (PARTITION BY user_id
                                                ORDER BY ts, event_id)
                            + INTERVAL 10 MINUTE
                    THEN 1 ELSE 0 END AS is_start
        FROM events
    ),
    sessioned AS (
        SELECT *, sum(is_start) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id
                                      ROWS BETWEEN UNBOUNDED PRECEDING
                                      AND CURRENT ROW) AS session_id
        FROM numbered
    ),
    codes AS (
        SELECT user_id, session_id,
               string_agg(event_type[1:1], '' ORDER BY ts, event_id) AS code
        FROM sessioned GROUP BY user_id, session_id
    ),
    pats AS (SELECT * FROM (VALUES {_PATTERN_VALUES}) t(pattern, re))
    SELECT pattern,
           CAST(sum(CASE WHEN regexp_matches(code, re) THEN 1 ELSE 0 END)
                AS BIGINT) AS n_matched,
           count(*) AS n_sessions,
           {oracle_exact_ratio(
               "sum(CASE WHEN regexp_matches(code, re) THEN 1 ELSE 0 END)",
               "count(*)",
           )} AS match_share
    FROM codes, pats
    GROUP BY pattern
    """,
)
def q_event_pattern_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    return event_pattern_match(load_table(spark, sf_dir, "events"))
