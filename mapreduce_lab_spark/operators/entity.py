"""Entity resolution: blocked candidate generation + Fellegi-Sunter
agreement scoring over the part catalog.

Superset surface (absent in the reference, SURVEY §2.3): record
linkage — "are these two catalog rows the same real-world entity?" —
the structured-record twin of the document near-dup lane. The method
is the classic public pipeline (Fellegi & Sunter 1969; Christen's
*Data Matching* 2012 survey):

1. **Blocking**: candidate pairs are generated only within blocks
   sharing (name noun, brand) — never all-pairs.
2. **TWO-PASS sorted neighborhood within the block** (Hernandez &
   Stolfo 1995, multipass form): records are ordered by two
   complementary keys — (modifier, type, size) and (price, size) —
   and each record pairs with its next ``ER_WINDOW`` neighbors under
   EACH ordering; the union is deduplicated on the unordered pair
   id. Candidates are <= 2*W*n BY CONSTRUCTION, immune to the
   quadratic blowup an oversized block would otherwise cause (the
   same cure the dedup lane's SNM queries use, applied inside
   blocks). This matters here specifically because the blocking key
   space is BOUNDED (nouns x brands is a fixed categorical product),
   so raw within-block pairing would be n² at 100 TB — the
   constant-bucket LSH lesson from docs/SCALE.md, designed out from
   the start. Why two passes: a true match agrees on >= 3 of the 4
   scored fields but can disagree on the leading sort field of any
   single ordering and land far away in that sort — measured on
   sf0.1, one (size, price) pass recovers only 0.52 of true matches
   at W=3 while the two-pass union recovers 0.997 (1.0 at W=5); the
   per-ordering recall curve lives in docs/SCALE.md, and
   ``er_window_recall_eval`` keeps the number driver-checked per
   corpus.
3. **Agreement vector + log-odds score**: per candidate pair, binary
   agreement on modifier / type / size / price-within-$1, each
   contributing a fixed integer Fellegi-Sunter weight (agreement
   weights positive, disagreement negative, deci-ban scale). The
   score census — not the raw pair list — is the query output, so
   the result stays a <= 2^4-row frame at any scale.

Scale shape: two window sorts over the block key (same exchange,
re-sorted), lead() pairing inside each sorted run (no join — the
candidate pair never leaves the task that holds both rows), one
distinct on 16-byte pair ids, two slim joins to re-attach the scored
fields, then a map-side combinable census aggregation. No BNLJ, no
cross join.

Cross-engine exactness: every score component is integer (price
compared in exact cents via round(x*100)), so the census is
bit-stable. The DuckDB oracle computes the identical
two-pass/dedup/score pipeline in SQL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from mapreduce_lab_spark.functions.hashing import hex8_int, oracle_hex8_int
from mapreduce_lab_spark.functions.numeric import (
    exact_ratio,
    oracle_exact_ratio,
    to_units,
)
from mapreduce_lab_spark.registry import query
from mapreduce_lab_spark.sources.tables import load_table

# Sorted-neighborhood window width inside each block, per pass.
ER_WINDOW = 3

# The two complementary sort keys (multipass SNM). Measured at sf0.1:
# jointly 0.997 recall of true matches at W=3 where either alone is
# 0.52-0.54 (docs/SCALE.md round-9b ER table).
ER_SORT_KEYS = (
    ("modifier", "p_type", "p_size", "p_partkey"),
    ("pu", "p_size", "p_partkey"),
)

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


def _er_recs(part: DataFrame) -> DataFrame:
    return part.select(
        "p_partkey",
        F.split(F.col("p_name"), " ").getItem(0).alias("modifier"),
        F.split(F.col("p_name"), " ").getItem(1).alias("noun"),
        "p_brand",
        "p_type",
        "p_size",
        to_units(F.col("p_retailprice"), 100).alias("pu"),
    )


def _er_candidates(recs: DataFrame) -> DataFrame:
    """Unordered candidate pair ids (lo, hi) from the two-pass window
    union, deduplicated."""
    passes = []
    for keys in ER_SORT_KEYS:
        w = Window.partitionBy("noun", "p_brand").orderBy(*keys)
        me = F.struct("p_partkey")
        led = recs.select(
            me.alias("a"),
            *[
                F.lead(me, i).over(w).alias(f"_n{i}")
                for i in range(1, ER_WINDOW + 1)
            ],
        )
        passes.append(
            led.select(
                "a",
                F.explode(
                    F.array(*[F.col(f"_n{i}") for i in range(1, ER_WINDOW + 1)])
                ).alias("b"),
            )
            .where(F.col("b").isNotNull())
            .select(
                F.least(F.col("a.p_partkey"), F.col("b.p_partkey")).alias("lo"),
                F.greatest(F.col("a.p_partkey"), F.col("b.p_partkey")).alias("hi"),
            )
        )
    return passes[0].union(passes[1]).distinct()


def _er_agree(a: str, b: str) -> dict[str, F.Column]:
    return {
        "modifier": F.col(f"{a}.modifier") == F.col(f"{b}.modifier"),
        "type": F.col(f"{a}.p_type") == F.col(f"{b}.p_type"),
        "size": F.col(f"{a}.p_size") == F.col(f"{b}.p_size"),
        "price": F.abs(F.col(f"{a}.pu") - F.col(f"{b}.pu")) <= PRICE_TOL_CENTS,
    }


def _er_score(a: str, b: str) -> F.Column:
    agree = _er_agree(a, b)
    score = None
    for field, (wa, wd) in ER_WEIGHTS.items():
        term = F.when(agree[field], F.lit(wa)).otherwise(F.lit(wd))
        score = term if score is None else (score + term)
    return score


def entity_resolution_scores(part: DataFrame) -> DataFrame:
    """Score census: one row per (agreement-vector, score) pattern
    with the candidate-pair count, a match flag, and the pattern's
    share of all candidates.

    Output cardinality is bounded by the 2^4 agreement patterns.
    """
    recs = _er_recs(part).cache()
    cand = _er_candidates(recs)
    a = recs.select(
        F.col("p_partkey").alias("lo"),
        F.struct("modifier", "p_type", "p_size", "pu").alias("a"),
    )
    b = recs.select(
        F.col("p_partkey").alias("hi"),
        F.struct("modifier", "p_type", "p_size", "pu").alias("b"),
    )
    pairs = cand.join(a, "lo").join(b, "hi")
    agree = {f: c.cast("int") for f, c in _er_agree("a", "b").items()}
    scored = pairs.select(
        *[agree[f].alias(f"agree_{f}") for f in ER_WEIGHTS],
        _er_score("a", "b").alias("score"),
    )
    # Grand total via an unpartitioned window over the <= 2^4-row
    # census frame: no second lineage, no broadcast cross join.
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


_ORACLE_RECS = """
      SELECT p_partkey,
             split_part(p_name, ' ', 1) AS modifier,
             split_part(p_name, ' ', 2) AS noun,
             p_brand, p_type, p_size,
             CAST(round(p_retailprice * 100) AS BIGINT) AS pu
      FROM part"""

_ORACLE_SORT_KEYS = (
    "modifier, p_type, p_size, p_partkey",
    "pu, p_size, p_partkey",
)


def _oracle_cand() -> tuple[str, str]:
    """(nbr CTE block, cand SELECT): two-pass lead pairs, dedup'd."""
    nbr_ctes = []
    legs_all = []
    for pi, order in enumerate(_ORACLE_SORT_KEYS):
        lead_cols = ",\n               ".join(
            f"lead(p_partkey, {i}) OVER w AS pk_{i}"
            for i in range(1, ER_WINDOW + 1)
        )
        nbr_ctes.append(
            f"""nbr{pi} AS MATERIALIZED (
        SELECT p_partkey, {lead_cols}
        FROM recs
        WINDOW w AS (PARTITION BY noun, p_brand ORDER BY {order})
    )"""
        )
        legs_all.append(
            " UNION ALL ".join(
                f"""
          SELECT least(p_partkey, pk_{i}) AS lo,
                 greatest(p_partkey, pk_{i}) AS hi
          FROM nbr{pi} WHERE pk_{i} IS NOT NULL"""
                for i in range(1, ER_WINDOW + 1)
            )
        )
    nbrs = ",\n    ".join(nbr_ctes)
    cand = "SELECT DISTINCT lo, hi FROM (" + " UNION ALL ".join(legs_all) + ")"
    return nbrs, cand


def _oracle_conds() -> dict[str, str]:
    return {
        "modifier": "a.modifier = b.modifier",
        "type": "a.p_type = b.p_type",
        "size": "a.p_size = b.p_size",
        "price": f"abs(a.pu - b.pu) <= {PRICE_TOL_CENTS}",
    }


_ORACLE_SCORE = " + ".join(
    f"CASE WHEN {_oracle_conds()[field]} THEN {wa} ELSE {wd} END"
    for field, (wa, wd) in ER_WEIGHTS.items()
)

_ORACLE_AGREE = ",\n             ".join(
    f"CAST({_oracle_conds()[f]} AS INTEGER) AS agree_{f}" for f in ER_WEIGHTS
)


def _er_oracle() -> str:
    nbrs, cand = _oracle_cand()
    return f"""
    WITH recs AS MATERIALIZED ({_ORACLE_RECS}),
    {nbrs},
    cand AS MATERIALIZED ({cand}),
    scored AS (
      SELECT {_ORACLE_AGREE},
             ({_ORACLE_SCORE}) AS score
      FROM cand
      JOIN recs a ON a.p_partkey = cand.lo
      JOIN recs b ON b.p_partkey = cand.hi
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


# --- window-cap recall self-eval ----------------------------------------------

# The two-pass window is the scale guarantee (candidates <= 2*W*n),
# and like every cap in this engine (trajectory df-cap, LSH bands)
# its recall cost must be MEASURED, not assumed: this eval computes,
# on a deterministic hash-sampled subset of blocks, the fraction of
# TRUE matches (score >= threshold among ALL within-block pairs — the
# quadratic baseline) that the production candidate generator
# recovers. Same eval-job shape as ann_recall_at_5 /
# trajectory_nn_recall_at_1: the exact side is quadratic per block
# and exists only inside this sampled measurement, never in the
# production query. (This eval is what caught the single-pass design:
# 0.44 sampled recall at W=3; the two-pass union measures 1.0 on the
# same sample — the retune is recorded in docs/SCALE.md.)

ER_EVAL_BLOCK_SAMPLE = 4  # keep blocks where md5(block) % 4 == 0 (~25%)
# Row-thinning target: above this corpus size, rows are additionally
# hash-sampled at rate 1/M with M = n // TARGET, so the eval instance
# — and its per-block quadratic exact side — is CONSTANT-BOUNDED at
# any scale (blocks are a fixed categorical product, so without the
# row gate block sizes grow linearly and block² explodes: measured
# 148 s at sf10 before this gate). The thinned corpus is a smaller
# instance of the same matching problem; the eval measures the
# generator's recall on it.
ER_EVAL_ROW_TARGET = 200_000


def er_window_recall_eval(part: DataFrame) -> DataFrame:
    """One row: true within-block matches on the sampled blocks, how
    many the production two-pass window recovers, and the recall —
    pair identity on unordered (partkey, partkey)."""
    n_total = part.count()  # driver scalar, same discipline as pagerank's N
    m = max(1, n_total // ER_EVAL_ROW_TARGET)
    gate = (
        F.pmod(
            hex8_int(F.concat_ws("\x1f", "noun", "p_brand")),
            F.lit(ER_EVAL_BLOCK_SAMPLE),
        )
        == 0
    ) & (
        F.pmod(hex8_int(F.col("p_partkey").cast("string")), F.lit(m)) == 0
    )
    recs = _er_recs(part).where(gate).cache()
    a, b = recs.alias("a"), recs.alias("b")
    full = (
        a.join(
            b,
            (F.col("a.noun") == F.col("b.noun"))
            & (F.col("a.p_brand") == F.col("b.p_brand"))
            & (F.col("a.p_partkey") < F.col("b.p_partkey")),
        )
        .where(_er_score("a", "b") >= ER_MATCH_THRESHOLD)
        .select(
            F.col("a.p_partkey").alias("lo"), F.col("b.p_partkey").alias("hi")
        )
    )
    cand = _er_candidates(recs)
    full = full.cache()
    hit = full.join(cand, ["lo", "hi"], "left_semi").cache()
    # Pairwise recall understates heavily under CLONE RUNS (a W-window
    # cannot pairwise-enumerate a 100-copy run, but it CHAINS it — and
    # transitive closure is what a dedup consumer applies), so the
    # record-level metric is reported alongside: of the records that
    # participate in >= 1 true match, how many participate in >= 1
    # recovered match. On the 100x-replica corpus pair recall reads
    # 0.46 while record recall reads 1.0 — both numbers are the truth.
    def members(pairs: DataFrame) -> DataFrame:
        return (
            pairs.select(F.col("lo").alias("pk"))
            .union(pairs.select(F.col("hi").alias("pk")))
            .distinct()
        )

    n_true = full.agg(F.count(F.lit(1)).alias("n_true"))
    n_hit = hit.agg(F.count(F.lit(1)).alias("n_recovered"))
    rec_true = members(full).cache()
    n_rec_true = rec_true.agg(F.count(F.lit(1)).alias("n_rec_true"))
    n_rec_hit = rec_true.join(members(hit), "pk", "left_semi").agg(
        F.count(F.lit(1)).alias("n_rec_recovered")
    )
    return (
        n_true.crossJoin(F.broadcast(n_hit))
        .crossJoin(F.broadcast(n_rec_true))
        .crossJoin(F.broadcast(n_rec_hit))
        .select(
            "n_true",
            "n_recovered",
            exact_ratio(
                F.col("n_recovered"), F.greatest(F.col("n_true"), F.lit(1))
            ).alias("pair_recall"),
            "n_rec_true",
            "n_rec_recovered",
            exact_ratio(
                F.col("n_rec_recovered"),
                F.greatest(F.col("n_rec_true"), F.lit(1)),
            ).alias("record_recall"),
        )
    )


def _er_eval_oracle() -> str:
    nbrs, cand = _oracle_cand()
    m = (
        f"greatest(1, (SELECT count(*) FROM part) // {ER_EVAL_ROW_TARGET})"
    )
    gate = (
        oracle_hex8_int("split_part(p_name, ' ', 2) || chr(31) || p_brand")
        + f" % {ER_EVAL_BLOCK_SAMPLE} = 0\n        AND "
        + oracle_hex8_int("CAST(p_partkey AS VARCHAR)")
        + f" % {m} = 0"
    )
    return f"""
    WITH recs AS MATERIALIZED ({_ORACLE_RECS}
      WHERE {gate}),
    full_pairs AS MATERIALIZED (
      SELECT a.p_partkey AS lo, b.p_partkey AS hi
      FROM recs a JOIN recs b
        ON a.noun = b.noun AND a.p_brand = b.p_brand
       AND a.p_partkey < b.p_partkey
      WHERE ({_ORACLE_SCORE}) >= {ER_MATCH_THRESHOLD}
    ),
    {nbrs},
    cand AS MATERIALIZED ({cand}),
    hit AS MATERIALIZED (
      SELECT f.lo, f.hi FROM full_pairs f
      WHERE EXISTS (SELECT 1 FROM cand c
                    WHERE c.lo = f.lo AND c.hi = f.hi)
    ),
    rec_true AS MATERIALIZED (
      SELECT DISTINCT pk FROM (
        SELECT lo AS pk FROM full_pairs
        UNION ALL SELECT hi AS pk FROM full_pairs)
    ),
    rec_hit AS MATERIALIZED (
      SELECT DISTINCT pk FROM (
        SELECT lo AS pk FROM hit UNION ALL SELECT hi AS pk FROM hit)
    )
    SELECT (SELECT count(*) FROM full_pairs) AS n_true,
           (SELECT count(*) FROM hit) AS n_recovered,
           {oracle_exact_ratio(
               "(SELECT count(*) FROM hit)",
               "greatest((SELECT count(*) FROM full_pairs), 1)",
           )} AS pair_recall,
           (SELECT count(*) FROM rec_true) AS n_rec_true,
           (SELECT count(*) FROM rec_true r
            WHERE EXISTS (SELECT 1 FROM rec_hit h WHERE h.pk = r.pk))
               AS n_rec_recovered,
           {oracle_exact_ratio(
               '''(SELECT count(*) FROM rec_true r
                   WHERE EXISTS (SELECT 1 FROM rec_hit h
                                 WHERE h.pk = r.pk))''',
               "greatest((SELECT count(*) FROM rec_true), 1)",
           )} AS record_recall
    """


@query("er_window_recall_eval", oracle=_er_eval_oracle())
def q_er_window_recall_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    return er_window_recall_eval(load_table(spark, sf_dir, "part"))
