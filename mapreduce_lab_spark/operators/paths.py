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


# --- behavioral nearest neighbor (trajectory similarity) -------------------

# Tokens are (event-type initial, inter-event-gap bucket): the 5-letter
# type alphabet alone is too small for discriminative shingles (5^3
# trigrams saturate and every index bucket goes quadratic); cadence
# widens it 4x AND carries the signal automation leaves (bots keep
# regular gaps). Gap thresholds in whole seconds on truncated-epoch
# arithmetic so both engines bucket identically.
SEQ_SHINGLE_CHARS = 6  # 3 tokens x 2 chars
# ABSOLUTE postings cap: shingles indexed only while <= this many
# FAMILIES carry them. A constant cap bounds every index bucket, so
# the candidate join does at most cap * total-postings work — linear
# in the corpus. (The first cut scaled the cap as users/10; at the
# sf1 replica that let buckets reach 1500 users and the candidate
# join OOM'd an 8 GB heap — the same constant-fraction trap the
# embedding lane's lsh_band_census documents. Absolute cap, measured
# fix in docs/SCALE.md.) 512 (was 64 in round 8) is the measured
# recall knee from the round-9 trajectory_nn_recall_at_1 eval: the
# sf0.1 shingle df distribution is bimodal and the common-motif lobe
# sits at df 257-512, so cap 64/128/256 all recover only 12/25 true
# top-1 neighbors while 512 recovers 25/25.
SEQ_DF_CAP = 512
# TWO-TIER index (round 10, closing the r9 cap-512 cost): shingles in
# the discriminative lobe (df <= TIER1_DF_CAP) are indexed with FULL
# postings; shingles in the motif lobe (TIER1_DF_CAP < df <=
# SEQ_DF_CAP) are indexed only from each rep's TIER2_SEL_K
# smallest-(df, s) motif shingles — deterministic bottom-k selection,
# the identity-hash analogue of bottom-k MinHash, so two reps sharing
# a similar motif profile keep colliding while a rep stops paying
# df² join work for EVERY common motif it carries. Measured at sf0.1
# (docs/SCALE.md round-10): the motif lobe was 97% of the enumerated
# join work (25.2M of 26.0M pair rows from just 111 shingles);
# two-tier keeps recall@1 at 25/25 (the registered eval) while
# cutting candidates 2.25M -> 1.68M and warm wall 10.0 -> 4.6 s.
# Scale contract unchanged: tier-1 buckets are <= 128 reps, tier-2
# postings are <= TIER2_SEL_K per rep with buckets still <= SEQ_DF_CAP
# reps, so candidate work stays linear with a tighter constant.
TIER1_DF_CAP = 128
TIER2_SEL_K = 4


def user_gap_codes(events: DataFrame) -> DataFrame:
    """One row per user: the full history as a (type-initial + gap
    bucket) token string, deterministically ordered by (ts, event_id).
    The first event of a user gets gap class 's' (start)."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    su = F.col("ts").cast("long")
    d = su - F.lag(su).over(w)
    # The NULL-lag (first event) branch must come FIRST: inside a
    # CASE, `d < 60` on a NULL lag is NULL-falsy and would fall through
    # to the '3' bucket, silently conflating session starts with the
    # >= 1h class (round-8 bug: the old `coalesce(gap, 's')` never
    # fired because `otherwise('3')` already swallowed the NULL).
    gap = (
        F.when(d.isNull(), F.lit("s"))
        .when(d < 60, F.lit("0"))
        .when(d < 600, F.lit("1"))
        .when(d < 3600, F.lit("2"))
        .otherwise(F.lit("3"))
    )
    tok = F.concat(F.substring("event_type", 1, 1), gap)
    toks = events.select("user_id", "ts", "event_id", tok.alias("tok"))
    return toks.groupBy("user_id").agg(
        F.array_join(
            F.transform(
                F.sort_array(F.collect_list(F.struct("ts", "event_id", "tok"))),
                lambda s: s.getField("tok"),
            ),
            "",
        ).alias("code")
    )


def _trajectory_families(events: DataFrame) -> DataFrame:
    """Shared first half of the trajectory-NN lane: per-user shingle
    sets collapsed into identical-set families. Returns one row per
    user: (user_id, sh, n_mem, m1, m2) where m1/m2 are the family's
    two smallest members (m2 NULL for singletons)."""
    codes = user_gap_codes(events)
    sh = F.array_distinct(
        F.transform(
            F.sequence(
                F.lit(1), F.length("code") - (SEQ_SHINGLE_CHARS - 1), F.lit(2)
            ),
            lambda i: F.col("code").substr(i, F.lit(SEQ_SHINGLE_CHARS)),
        )
    )
    ush = codes.where(F.length("code") >= SEQ_SHINGLE_CHARS).select(
        "user_id", sh.alias("sh")
    )
    w_f = Window.partitionBy("fk")
    fam = (
        ush.withColumn("fk", F.md5(F.concat_ws("\x1f", F.sort_array("sh"))))
        .withColumn("n_mem", F.count("*").over(w_f))
        .withColumn("m1", F.min("user_id").over(w_f))
    )
    return fam.withColumn(
        "m2",
        F.min(
            F.when(F.col("user_id") != F.col("m1"), F.col("user_id"))
        ).over(w_f),
    )


def _trajectory_reps(fam: DataFrame) -> DataFrame:
    """One row per family: its min-member representative."""
    return fam.where(F.col("user_id") == F.col("m1")).select(
        F.col("user_id").alias("rep"), "sh", "n_mem"
    )


def _singleton_candidate_scores(fam: DataFrame) -> DataFrame:
    """(ua, ub, jaccard): exact Jaccard on every candidate pair the
    df-capped postings index surfaces, probed from singleton families
    (ua); shared by the production argmax and the recall eval.

    Round-13 plan rewrite (guide §2.3/§4.2 "shuffle keys, not
    payloads"), measured 7.8 -> 4.1 s warm at sf0.1 with identical
    output:

    - ``fam`` is expected localCheckpoint'd by the caller: the family
      window chain fed 3+ physical subtrees (twins, the a/b verify
      sides, the exploded postings) and re-executed for each.
    - Shingle strings are recoded to dense ints through an exact
      dictionary (row_number over the sorted distinct shingles — a
      bijection, so |A∩B| and |A∪B| are unchanged) and the verify's
      array_intersect runs on int arrays instead of 6-char strings.
      The dictionary window is single-partition but the shingle
      vocabulary is bounded by the token alphabet (~25^3 = 15,625
      possible shingles; 2,380 observed at sf0.1), independent of
      corpus size.
    - The probe side of the candidate join is restricted to singleton
      families BEFORE the join (the old shape filtered n_mem_a == 1
      after scoring), so >= 2 families never enumerate candidates.
    """
    reps0 = _trajectory_reps(fam)
    exr = reps0.select("rep", F.explode("sh").alias("s"))
    dct = exr.groupBy("s").agg(F.count("*").alias("df")).withColumn(
        "sid", F.row_number().over(Window.orderBy("s"))
    )
    ed = exr.join(dct, "s")
    reps = (
        ed.groupBy("rep")
        .agg(F.array_sort(F.collect_list("sid")).alias("shi"))
        .join(reps0.select("rep", "n_mem"), "rep")
        .localCheckpoint()
    )
    idx1 = ed.where(F.col("df") <= TIER1_DF_CAP).select("rep", "sid")
    wm = Window.partitionBy("rep").orderBy("df", "s")
    idx2 = (
        ed.where((F.col("df") > TIER1_DF_CAP) & (F.col("df") <= SEQ_DF_CAP))
        .withColumn("rn", F.row_number().over(wm))
        .where(F.col("rn") <= TIER2_SEL_K)
        .select("rep", "sid")
    )
    idx = idx1.unionByName(idx2).localCheckpoint()
    singletons = reps.where(F.col("n_mem") == 1).select("rep")
    cand = (
        idx.join(singletons, "rep")
        .alias("a")
        .join(idx.alias("b"), "sid")
        .where(F.col("a.rep") != F.col("b.rep"))
        .select(F.col("a.rep").alias("ua"), F.col("b.rep").alias("ub"))
        .distinct()
    )
    a = reps.select(F.col("rep").alias("ua"), F.col("shi").alias("sh_a"))
    b = reps.select(F.col("rep").alias("ub"), F.col("shi").alias("sh_b"))
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    uni = F.size("sh_a") + F.size("sh_b") - inter
    # exact_ratio casts the int numerator to double before the 1e6
    # scale: a bare `inter * 1_000_000` is INT*INT in Spark and wraps
    # past inter >= 2148 (unbounded user histories CAN reach that),
    # while the DuckDB twin's len()*1000000 is BIGINT — a latent
    # engine divergence the repo's envelope discipline exists to kill.
    return (
        # no broadcast hints: reps scales with the corpus (one row per
        # family), so the planner must stay free to pick SMJ at scale;
        # the localCheckpoint'd build sides carry accurate size stats,
        # so small corpora still get the broadcast join automatically.
        cand.join(a, "ua")
        .join(b, "ub")
        .select("ua", "ub", exact_ratio(inter, uni).alias("jaccard"))
    )


def behavioral_nearest_neighbor(events: DataFrame) -> DataFrame:
    """Per-user most similar OTHER user by event-trajectory Jaccard —
    the distributed top-1 trajectory-similarity search (REPOSE, ICDE
    2021, re-expressed relationally): cohort discovery and bot-farm
    detection both reduce to "whose behavior is nearly mine?".

    Two-tier construction, reusing the dedup lane's identical-set
    collapse (operators/dedup.py, round-5 rewrite):

    1. **Exact twins algebraically.** Users with IDENTICAL shingle
       sets collapse into a family (md5 of the sorted set). Every
       member of a >= 2 family gets its nearest neighbor for free —
       the smallest co-member, Jaccard exactly 1.0, which dominates
       any cross-family candidate — with zero join work. This is the
       bot-farm fast path AND the degenerate-corpus guard: a corpus
       of clones (the sf10 replica is 100 identical copies of every
       user) resolves entirely in this tier, where the first cut's
       per-user postings index saw every shingle's df multiplied by
       the clone count and either went quadratic (fraction cap) or
       empty (absolute cap).
    2. **Cross-family candidates for singletons.** One REPRESENTATIVE
       (the min member) per family enters the TWO-TIER postings
       index: full postings for discriminative shingles (df <=
       TIER1_DF_CAP), per-rep bottom-TIER2_SEL_K (df, s) selection
       for motif-lobe shingles (df up to SEQ_DF_CAP; see the constant
       block above for the measured 97%-of-join-work motivation), and
       nothing above SEQ_DF_CAP (the stop-motif analogue of the dedup
       lane's prefix filter — a motif every family shares identifies
       nobody). Candidates share >= 1 indexed shingle; exact Jaccard
       on full
       shingle sets ranks them; per-user argmax breaks ties by the
       smaller neighbor id (the representative IS its family's min
       member, so the tie rule is id-consistent across tiers).
       Singleton users sharing no indexed shingle (or with < 3
       events) have no meaningful neighbor and drop out.

    Scale shape: the family collapse is one groupBy on a 16-byte set
    hash; the candidate join's work is sum(df^2) over indexed
    shingles <= SEQ_DF_CAP * rep postings — LINEAR in the corpus for
    the absolute cap; the verify is one array_intersect per
    candidate on distinct-shingle arrays. History strings are
    per-user collect_lists — bounded by the retention window in
    production (the session-scoped codes above are the
    unbounded-history fallback).
    """
    # One materialization of the family chain (codes -> shingles ->
    # md5 family windows): it feeds the twins tier, both verify sides
    # and the postings explode, which otherwise re-execute it each
    # (round-13 measured barrier, see _singleton_candidate_scores).
    fam = _trajectory_families(events).localCheckpoint()
    twins = fam.where(F.col("n_mem") >= 2).select(
        "user_id",
        F.when(F.col("user_id") == F.col("m1"), F.col("m2"))
        .otherwise(F.col("m1"))
        .alias("neighbor_id"),
        F.lit(1.0).alias("jaccard"),
    )
    scored = _singleton_candidate_scores(fam)
    rn = Window.partitionBy("ua").orderBy(
        F.col("jaccard").desc(), F.col("ub").asc()
    )
    singles = (
        scored.withColumn("rn", F.row_number().over(rn))
        .where(F.col("rn") == 1)
        .select(
            F.col("ua").alias("user_id"),
            F.col("ub").alias("neighbor_id"),
            "jaccard",
        )
    )
    return twins.unionByName(singles)


# Shared DuckDB CTE chain for the trajectory-NN lane: gap-bucket
# token codes -> shingle sets -> identical-set families -> df-capped
# postings index -> verified candidate scores. Consumed by both the
# production query and the recall eval so the two can never drift.
_TRAJ_CTES = f"""g AS (
        -- The IS NULL branch must be FIRST (mirrors the Spark CASE):
        -- inside COALESCE the old ELSE '3' already absorbed the NULL
        -- lag, so the 's' default never fired in either engine.
        SELECT user_id, ts, event_id,
               event_type[1:1] || CASE
                   WHEN lag(CAST(floor(epoch(ts)) AS BIGINT))
                          OVER w IS NULL THEN 's'
                   WHEN CAST(floor(epoch(ts)) AS BIGINT)
                        - lag(CAST(floor(epoch(ts)) AS BIGINT))
                          OVER w < 60 THEN '0'
                   WHEN CAST(floor(epoch(ts)) AS BIGINT)
                        - lag(CAST(floor(epoch(ts)) AS BIGINT))
                          OVER w < 600 THEN '1'
                   WHEN CAST(floor(epoch(ts)) AS BIGINT)
                        - lag(CAST(floor(epoch(ts)) AS BIGINT))
                          OVER w < 3600 THEN '2'
                   ELSE '3' END AS tok
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    codes AS (
        SELECT user_id, string_agg(tok, '' ORDER BY ts, event_id) AS code
        FROM g GROUP BY user_id
    ),
    ush AS (
        SELECT user_id,
               list_distinct(list_transform(
                   generate_series(1, length(code) - {SEQ_SHINGLE_CHARS - 1}, 2),
                   i -> code[i:i + {SEQ_SHINGLE_CHARS - 1}])) AS sh
        FROM codes WHERE length(code) >= {SEQ_SHINGLE_CHARS}
    ),
    fam0 AS (
        SELECT user_id, sh,
               count(*) OVER (PARTITION BY list_sort(sh)::VARCHAR) AS n_mem,
               min(user_id) OVER (PARTITION BY list_sort(sh)::VARCHAR) AS m1
        FROM ush
    ),
    fam AS (
        SELECT *, min(CASE WHEN user_id <> m1 THEN user_id END)
                      OVER (PARTITION BY list_sort(sh)::VARCHAR) AS m2
        FROM fam0
    ),
    twins AS (
        SELECT user_id,
               CASE WHEN user_id = m1 THEN m2 ELSE m1 END AS neighbor_id,
               CAST(1.0 AS DOUBLE) AS jaccard
        FROM fam WHERE n_mem >= 2
    ),
    reps AS (SELECT user_id AS rep, sh, n_mem FROM fam WHERE user_id = m1),
    exr AS (SELECT rep, unnest(sh) AS s FROM reps),
    dft AS (SELECT s, count(*) AS df FROM exr GROUP BY s),
    -- two-tier index: full postings for the discriminative lobe,
    -- per-rep bottom-{TIER2_SEL_K} (df, s) selection for the motif
    -- lobe (mirrors the Spark row_number window exactly)
    idx AS (
        SELECT rep, s FROM exr JOIN dft USING (s)
        WHERE df <= {TIER1_DF_CAP}
        UNION ALL
        SELECT rep, s FROM (
            SELECT rep, s,
                   row_number() OVER (PARTITION BY rep ORDER BY df, s) AS rn
            FROM exr JOIN dft USING (s)
            WHERE df > {TIER1_DF_CAP} AND df <= {SEQ_DF_CAP}
        ) WHERE rn <= {TIER2_SEL_K}),
    cand AS (
        SELECT DISTINCT a.rep AS ua, b.rep AS ub
        FROM idx a JOIN idx b ON a.s = b.s
        WHERE a.rep <> b.rep
    ),
    scored AS (
        SELECT cand.ua, cand.ub,
               {oracle_exact_ratio(
                   "len(list_intersect(x.sh, y.sh))",
                   "len(x.sh) + len(y.sh) - len(list_intersect(x.sh, y.sh))",
               )} AS jaccard
        FROM cand
        JOIN reps x ON x.rep = cand.ua
        JOIN reps y ON y.rep = cand.ub
        WHERE x.n_mem = 1
    )"""


@query(
    "behavioral_nearest_neighbor",
    oracle=f"""
    WITH {_TRAJ_CTES},
    singles AS (
        SELECT ua AS user_id, ub AS neighbor_id, jaccard
        FROM (SELECT *, row_number() OVER (PARTITION BY ua
                                           ORDER BY jaccard DESC, ub ASC)
                            AS rn
              FROM scored)
        WHERE rn = 1
    )
    SELECT user_id, neighbor_id, jaccard FROM twins
    UNION ALL
    SELECT user_id, neighbor_id, jaccard FROM singles
    """,
)
def q_behavioral_nearest_neighbor(spark: SparkSession, sf_dir: str) -> DataFrame:
    return behavioral_nearest_neighbor(load_table(spark, sf_dir, "events"))


# --- trajectory-NN candidate-recall self-eval -------------------------------

# Bounded sampled query set, mirroring ann_recall_at_5's design: the
# k smallest singleton-family representatives. An absolute k keeps the
# exact half's broadcast side k-bounded by construction.
TRAJ_RECALL_QUERIES = 25


def trajectory_nn_recall(events: DataFrame) -> DataFrame:
    """Per sampled user: does the SEQ_DF_CAP postings tier recover the
    TRUE nearest neighbor (exact Jaccard argmax over all reps)?

    The absolute df cap is what bounds the candidate join linearly —
    and it silently costs recall on dense corpora (a user whose every
    shingle is carried by > SEQ_DF_CAP families gets no candidates).
    This eval measures that cost the same way ``ann_recall_at_5``
    measures the bucketed ANN's: exact argmax on a k-bounded sampled
    query set (TakeOrdered, no global sort) crossed against the rep
    corpus — O(k·n) — joined against the production candidate tier's
    argmax restricted to the same sample. ``hit`` = 1 iff they agree;
    argmax-equality is equivalent to "true neighbor surfaced as a
    candidate" because both sides rank by (jaccard desc, id asc) and
    the candidate verify uses the same exact Jaccard.
    """
    fam = _trajectory_families(events).localCheckpoint()
    reps = _trajectory_reps(fam)
    queries = (
        reps.where(F.col("n_mem") == 1)
        .select(F.col("rep").alias("qu"), F.col("sh").alias("sh_q"))
        .orderBy("qu")
        .limit(TRAJ_RECALL_QUERIES)
    )
    others = reps.select(F.col("rep").alias("ub"), F.col("sh").alias("sh_b"))
    inter = F.size(F.array_intersect("sh_q", "sh_b"))
    uni = F.size("sh_q") + F.size("sh_b") - inter
    ex = (
        F.broadcast(queries)
        .join(others, F.col("qu") != F.col("ub"))
        .select("qu", "ub", exact_ratio(inter, uni).alias("j"))
    )
    we = Window.partitionBy("qu").orderBy(F.col("j").desc(), F.col("ub").asc())
    exact_top = (
        ex.withColumn("rn", F.row_number().over(we))
        .where(F.col("rn") == 1)
        .select(
            F.col("qu").alias("user_id"),
            F.col("ub").alias("exact_neighbor"),
            F.col("j").alias("exact_jaccard"),
        )
    )
    approx = _singleton_candidate_scores(fam).join(
        F.broadcast(queries.select(F.col("qu").alias("ua"))), "ua"
    )
    wa = Window.partitionBy("ua").orderBy(
        F.col("jaccard").desc(), F.col("ub").asc()
    )
    approx_top = (
        approx.withColumn("rn", F.row_number().over(wa))
        .where(F.col("rn") == 1)
        .select(F.col("ua").alias("user_id"), F.col("ub").alias("approx_neighbor"))
    )
    return exact_top.join(approx_top, "user_id", "left").select(
        "user_id",
        "exact_neighbor",
        "exact_jaccard",
        "approx_neighbor",
        F.when(F.col("approx_neighbor") == F.col("exact_neighbor"), 1)
        .otherwise(0)
        .cast("int")
        .alias("hit"),
    )


_TRAJ_JACC_Q = oracle_exact_ratio(
    "len(list_intersect(q.sh_q, r.sh))",
    "len(q.sh_q) + len(r.sh) - len(list_intersect(q.sh_q, r.sh))",
)


@query(
    "trajectory_nn_recall_at_1",
    oracle=f"""
    WITH {_TRAJ_CTES},
    queries AS (
        SELECT rep AS qu, sh AS sh_q FROM reps
        WHERE n_mem = 1 ORDER BY rep LIMIT {TRAJ_RECALL_QUERIES}
    ),
    ex AS (
        SELECT q.qu, r.rep AS ub, {_TRAJ_JACC_Q} AS j
        FROM queries q JOIN reps r ON r.rep <> q.qu
    ),
    exact_top AS (
        SELECT qu AS user_id, ub AS exact_neighbor, j AS exact_jaccard
        FROM (SELECT *, row_number() OVER (PARTITION BY qu
                                           ORDER BY j DESC, ub ASC) AS rn
              FROM ex)
        WHERE rn = 1
    ),
    approx_top AS (
        SELECT ua AS user_id, ub AS approx_neighbor
        FROM (SELECT *, row_number() OVER (PARTITION BY ua
                                           ORDER BY jaccard DESC, ub ASC) AS rn
              FROM scored WHERE ua IN (SELECT qu FROM queries))
        WHERE rn = 1
    )
    SELECT e.user_id, e.exact_neighbor, e.exact_jaccard, a.approx_neighbor,
           CAST(CASE WHEN a.approx_neighbor = e.exact_neighbor
                THEN 1 ELSE 0 END AS INT) AS hit
    FROM exact_top e LEFT JOIN approx_top a USING (user_id)
    """,
)
def q_trajectory_nn_recall_at_1(spark: SparkSession, sf_dir: str) -> DataFrame:
    return trajectory_nn_recall(load_table(spark, sf_dir, "events"))
