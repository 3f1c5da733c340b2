"""Sequence packing: concat-and-chunk documents into fixed
token-budget training sequences — the step every LLM pretraining
pipeline runs between curation and the data loader.

ABSENT from the reference (SURVEY §2.3 superset surface). The
semantics here are the standard production ones: documents are
concatenated in a deterministic global order (doc_id) and the token
stream is chunked at exactly SEQ_BUDGET tokens, so documents may
straddle sequence boundaries (the "packed dataset with document
splitting" every major pretraining recipe uses). Round 11 adds the
complementary NO-SPLIT family — length-bucketed shelf packing plus a
concat-chunk vs no-split comparison report; see the greedy section
below. Exact first-fit-decreasing is inherently a sequential fold,
which is why the distributed form buckets by power-of-two length
class instead.

Scale shape — the interesting part is the GLOBAL EXCLUSIVE CUMSUM of
token counts, which a naive window (ORDER BY doc_id with no
partition) would serialize onto one task. The distributed form is the
classic two-level scan:

1. per-shard cumsum: a window PARTITIONED by shard = doc_id div
   PACK_SHARD — fully parallel;
2. shard offsets: an exclusive cumsum over the |shards|-row per-shard
   totals frame — a bounded-metadata window (same class as the
   P-row partition windows in profiling/windows), broadcast back.

``start`` = shard offset + intra-shard cumsum, exactly the global
cumsum, with no unbounded single-task window anywhere. PACK_SHARD is
a demo-scale constant (tests get multi-shard plans on 500-doc
corpora); production sets it so |shards| stays ~1e4 (e.g. 1e6), and
past that the same trick nests into a three-level tree.

Token counts use the repo's whitespace tokenizer expression (the
``text_token_stats`` pair), so the packing census is exact and fully
oracled: DuckDB replays the cumsum with one window (the oracle is
correctness-only, not a scale model). Integer note: window ids use
exact int64 arithmetic ((start - start % B) / B, never float floor),
so the census is stable past 2^53 tokens.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from mapreduce_lab_spark.functions.numeric import exact_ratio, oracle_exact_ratio
from mapreduce_lab_spark.registry import query
from mapreduce_lab_spark.sources.tables import load_table

SEQ_BUDGET = 512  # tokens per packed training sequence
PACK_SHARD = 200  # doc_ids per cumsum shard (demo scale; see docstring)

_TC = r"\s+"


def _idiv(c: Column, d: int) -> Column:
    """Exact int64 floor division for non-negative c via Spark's
    integral `div` operator — no double round-trip, so exact across
    the full int64 range. The previous `(c - c%d)/d` passed through
    double division and lost exactness past 2^53 (ADVICE r10)."""
    return F.call_function("div", c.cast("long"), F.lit(d).cast("long"))


def token_spans_from_counts(tc_df: DataFrame) -> DataFrame:
    """(doc_id, tc) -> (doc_id, tc, start, end): the two-level
    distributed cumsum over precomputed token counts — the entry
    point for consumers (the pipeline capstone) that already carry
    counts and must not re-scan their source."""
    tc = tc_df.select(
        "doc_id", "tc", _idiv(F.col("doc_id"), PACK_SHARD).alias("shard")
    )
    w_in = (
        Window.partitionBy("shard")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    tc = tc.withColumn("intra", F.coalesce(F.sum("tc").over(w_in), F.lit(0)))
    # |shards|-row bounded frame: exclusive prefix over shard totals
    w_sh = Window.orderBy("shard").rowsBetween(Window.unboundedPreceding, -1)
    offs = (
        tc.groupBy("shard")
        .agg(F.sum("tc").alias("st"))
        .select("shard", F.coalesce(F.sum("st").over(w_sh), F.lit(0)).alias("off"))
    )
    return (
        tc.join(F.broadcast(offs), "shard")
        .select(
            "doc_id",
            "tc",
            (F.col("off") + F.col("intra")).alias("start"),
            (F.col("off") + F.col("intra") + F.col("tc")).alias("end"),
        )
    )


def doc_token_spans(docs: DataFrame) -> DataFrame:
    """(doc_id, tc, start, end): each document's half-open token span
    [start, end) in the concatenated corpus stream, via the two-level
    distributed cumsum described in the module docstring."""
    return token_spans_from_counts(
        docs.select(
            "doc_id",
            F.size(F.split(F.trim("text"), _TC)).cast("long").alias("tc"),
        )
    )


def oracle_spans(src: str) -> str:
    """The tc/sp CTE pair (token counts + exclusive cumsum) over any
    (doc_id, text) relation ``src`` — shared with the pipeline
    capstone, which packs dedup survivors instead of raw documents."""
    return f"""tc AS (
      SELECT doc_id,
             len(regexp_split_to_array(trim(text), '{_TC}')) AS tc
      FROM {src}
    ), sp AS (
      -- DuckDB's sum() widens to HUGEINT, which range()/arithmetic
      -- downstream reject: pin the cumsum back to BIGINT.
      SELECT doc_id, tc,
             CAST(coalesce(sum(tc) OVER (ORDER BY doc_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                  AS BIGINT) AS start
      FROM tc
    )"""


_ORACLE_SPANS = oracle_spans("documents")


def census_from_spans(spans: DataFrame) -> DataFrame:
    """(doc_id, tc, start, end) spans -> the per-sequence census."""
    b = SEQ_BUDGET
    wins = spans.select(
        "doc_id",
        "start",
        "end",
        F.explode(
            F.sequence(_idiv(F.col("start"), b), _idiv(F.col("end") - 1, b))
        ).alias("window_id"),
    )
    lo = F.greatest(F.col("start"), F.col("window_id") * b)
    hi = F.least(F.col("end"), (F.col("window_id") + 1) * b)
    return wins.groupBy("window_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(hi - lo).alias("n_tokens"),
        F.sum(
            F.when(F.col("start") < F.col("window_id") * b, 1).otherwise(0)
        ).alias("n_carried_in"),
    )


def sequence_packing_census(docs: DataFrame) -> DataFrame:
    """Per packed sequence: its id, how many documents contribute
    tokens to it, its token count (SEQ_BUDGET except the final
    partial sequence), and how many of its documents are
    continuations that started in an earlier sequence — the
    cross-boundary fragmentation a data-loader masking strategy
    cares about."""
    return census_from_spans(doc_token_spans(docs))


@query(
    "sequence_packing_census",
    oracle=f"""
    WITH {_ORACLE_SPANS}, wins AS (
      SELECT doc_id, start, start + tc AS e,
             unnest(range(start // {SEQ_BUDGET},
                          (start + tc - 1) // {SEQ_BUDGET} + 1)) AS window_id
      FROM sp
    )
    SELECT window_id,
           count(*) AS n_docs,
           CAST(sum(least(e, (window_id + 1) * {SEQ_BUDGET})
                    - greatest(start, window_id * {SEQ_BUDGET}))
                AS BIGINT) AS n_tokens,
           CAST(sum(CASE WHEN start < window_id * {SEQ_BUDGET}
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_carried_in
    FROM wins GROUP BY window_id
    """,
)
def q_sequence_packing_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    return sequence_packing_census(load_table(spark, sf_dir, "documents"))


def efficiency_from_counts(tc_df: DataFrame) -> DataFrame:
    """The efficiency report over a precomputed (doc_id, tc) frame —
    shared with the strategy-compare query, which derives BOTH
    packing plans from one materialized count frame (one scan)."""
    spans = token_spans_from_counts(tc_df)
    b = SEQ_BUDGET
    split_doc = (_idiv(F.col("start"), b) < _idiv(F.col("end") - 1, b)).cast("int")
    agg = spans.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.coalesce(F.sum("tc"), F.lit(0)).alias("total_tokens"),
        F.coalesce(F.sum(split_doc), F.lit(0)).alias("n_split_docs"),
    )
    # ceil form, not (total-1)//B + 1: an EMPTY corpus must report 0
    # sequences in both engines (Spark's % keeps the dividend's sign,
    # so the -1 route gives 1 here but 0 in DuckDB's floor //).
    n_windows = _idiv(F.col("total_tokens") + (b - 1), b)
    return agg.select(
        "n_docs",
        "total_tokens",
        n_windows.alias("n_sequences"),
        (n_windows * b - F.col("total_tokens")).alias("pad_tokens"),
        exact_ratio(
            F.col("total_tokens"), F.greatest(n_windows * b, F.lit(1))
        ).alias("fill_ratio"),
        "n_split_docs",
    )


def sequence_packing_efficiency(docs: DataFrame) -> DataFrame:
    """One row: corpus-level packing report — documents, tokens,
    packed sequences, padding wasted in the final partial sequence,
    fill ratio, and how many documents get split across a boundary
    (the attention-masking surface)."""
    return efficiency_from_counts(
        docs.select(
            "doc_id",
            F.size(F.split(F.trim("text"), _TC)).cast("long").alias("tc"),
        )
    )


@query(
    "sequence_packing_efficiency",
    oracle=f"""
    WITH {_ORACLE_SPANS}, agg AS (
      SELECT count(*) AS n_docs,
             coalesce(sum(tc), 0) AS total_tokens,
             coalesce(sum(CASE WHEN start // {SEQ_BUDGET}
                      < (start + tc - 1) // {SEQ_BUDGET}
                 THEN 1 ELSE 0 END), 0) AS n_split_docs
      FROM sp
    )
    SELECT CAST(n_docs AS BIGINT) AS n_docs,
           CAST(total_tokens AS BIGINT) AS total_tokens,
           CAST((total_tokens + {SEQ_BUDGET - 1}) // {SEQ_BUDGET} AS BIGINT)
               AS n_sequences,
           CAST(((total_tokens + {SEQ_BUDGET - 1}) // {SEQ_BUDGET}) * {SEQ_BUDGET}
                - total_tokens AS BIGINT) AS pad_tokens,
           {oracle_exact_ratio(
               "total_tokens",
               f"greatest(((total_tokens + {SEQ_BUDGET - 1}) // {SEQ_BUDGET})"
               f" * {SEQ_BUDGET}, 1)",
           )} AS fill_ratio,
           CAST(n_split_docs AS BIGINT) AS n_split_docs
    FROM agg
    """,
)
def q_sequence_packing_efficiency(spark: SparkSession, sf_dir: str) -> DataFrame:
    return sequence_packing_efficiency(load_table(spark, sf_dir, "documents"))


# --- incremental packing (the IVM property of append-only cumsum) ------------

# Packing is INCREMENTAL for appends: new documents always carry
# larger doc_ids, the concatenation order is doc_id, so appending a
# delta leaves every fully-packed prefix sequence untouched — only
# the old final (partial) sequence and sequences after it change.
# This query registers that property as a driver-checkable contract:
# it splits the corpus at K = (max(doc_id) // 10) * 7 (a deterministic
# prefix; overflow-safe divide-then-multiply, identical in both
# engines), computes the census of base and of base+delta, and emits
# EXCEPT ALL — exactly the rows an incremental maintainer would have
# to rewrite. tests/test_packing.py pins that every emitted window_id
# >= base_total // SEQ_BUDGET (nothing before the old tail changes),
# which is what makes a 100 TB packed dataset maintainable by
# appending shards instead of repacking the corpus.


def _oracle_census_chain(tc_src: str, p: str) -> str:
    b = SEQ_BUDGET
    return f"""{p}sp AS (
      SELECT doc_id, tc,
             CAST(coalesce(sum(tc) OVER (ORDER BY doc_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                  AS BIGINT) AS start
      FROM {tc_src}
    ), {p}wins AS (
      SELECT doc_id, start, start + tc AS e,
             unnest(range(start // {b},
                          (start + tc - 1) // {b} + 1)) AS window_id
      FROM {p}sp
    ), {p}c AS (
      SELECT window_id,
             count(*) AS n_docs,
             CAST(sum(least(e, (window_id + 1) * {b})
                      - greatest(start, window_id * {b}))
                  AS BIGINT) AS n_tokens,
             CAST(sum(CASE WHEN start < window_id * {b}
                      THEN 1 ELSE 0 END) AS BIGINT) AS n_carried_in
      FROM {p}wins GROUP BY window_id
    )"""


@query(
    "sequence_packing_incremental",
    oracle=f"""
    WITH tcall AS (
      SELECT doc_id,
             len(regexp_split_to_array(trim(text), '{_TC}')) AS tc
      FROM documents
    ), k AS (
      SELECT (max(doc_id) // 10) * 7 AS kk FROM tcall
    ), tcbase AS (
      SELECT doc_id, tc FROM tcall, k WHERE doc_id <= kk
    ), {_oracle_census_chain("tcall", "f")}, {_oracle_census_chain("tcbase", "b")}
    SELECT window_id, n_docs, n_tokens, n_carried_in FROM fc
    EXCEPT ALL
    SELECT window_id, n_docs, n_tokens, n_carried_in FROM bc
    """,
)
def q_sequence_packing_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The census rows an append-only delta actually changes: census
    of the full corpus EXCEPT ALL census of the doc_id-prefix base —
    every fully-packed prefix sequence is provably untouched (pinned
    in tests), so an incremental maintainer rewrites only these."""
    docs = load_table(spark, sf_dir, "documents")
    tcdf = docs.select(
        "doc_id",
        F.size(F.split(F.trim("text"), _TC)).cast("long").alias("tc"),
    ).localCheckpoint()
    kf = tcdf.agg(F.max("doc_id").alias("mx")).select(
        (((F.col("mx") - F.col("mx") % 10) / 10).cast("long") * 7).alias("kk")
    )
    base = (
        tcdf.crossJoin(F.broadcast(kf))
        .where(F.col("doc_id") <= F.col("kk"))
        .select("doc_id", "tc")
    )
    full_c = census_from_spans(token_spans_from_counts(tcdf))
    base_c = census_from_spans(token_spans_from_counts(base))
    return full_c.exceptAll(base_c)


# --- greedy no-split packing (length-bucketed shelf packing) ------------------

# The complement of concat-and-chunk: every document lands WHOLE in
# exactly one sequence (no attention-mask straddling), at the price of
# padding. Exact first-fit-decreasing is a sequential fold over the
# whole corpus — undistributable — so this lane ships the standard
# distributed approximation: SHELF PACKING BY POWER-OF-TWO LENGTH
# CLASS. Each document is bucketed by the smallest power of two >= its
# (budget-capped) length; a class of width U packs exactly
# cap = SEQ_BUDGET div U documents per sequence by rank, so no bin
# ever overflows BY CONSTRUCTION and per-bin fill is >= 50% minus the
# class-tail remainder (each doc is > U/2 except in the width-1
# class). Documents longer than the budget are truncated to SEQ_BUDGET
# (the standard no-split recipe) and reported.
#
# Scale shape: the only coordination is a rank within each of the
# |log2(SEQ_BUDGET)|+1 = 10 classes. A naive
# row_number() OVER (PARTITION BY class) serializes each class onto
# one task, so ranks use the same two-level scan as the cumsum above:
# shard-local rank (parallel) + an exclusive prefix over the bounded
# |shards| x |classes| counts frame, broadcast back. The DuckDB twins
# replay the rank with one window (correctness-only, not a scale
# model) — identical because shard order = doc_id order.


def _idivc(c: Column, d: Column) -> Column:
    """Exact int64 floor division, column divisor (same `div` rationale
    as _idiv)."""
    return F.call_function("div", c.cast("long"), d.cast("long"))


_WIDTHS = [1, 2, 4, 8, 16, 32, 64, 128, 256, SEQ_BUDGET]


def _width_class(el: Column) -> Column:
    """Smallest power-of-two width >= el (el pre-capped to SEQ_BUDGET).
    A CASE ladder, not log2: float logs round differently across
    engines at exact powers of two."""
    expr = F.when(el <= _WIDTHS[0], _WIDTHS[0])
    for wv in _WIDTHS[1:-1]:
        expr = expr.when(el <= wv, wv)
    return expr.otherwise(_WIDTHS[-1])


def _oracle_width_class(el: str) -> str:
    arms = " ".join(f"WHEN {el} <= {wv} THEN {wv}" for wv in _WIDTHS[:-1])
    return f"CASE {arms} ELSE {_WIDTHS[-1]} END"


def classes_from_counts(tc_df: DataFrame) -> DataFrame:
    """(doc_id, tc, el, wclass, shard) over a precomputed count frame."""
    b = SEQ_BUDGET
    el = F.least(F.greatest(F.col("tc"), F.lit(1)), F.lit(b))
    return tc_df.select(
        "doc_id",
        "tc",
        el.alias("el"),
        _width_class(el).cast("long").alias("wclass"),
        _idiv(F.col("doc_id"), PACK_SHARD).alias("shard"),
    )


def doc_length_classes(docs: DataFrame) -> DataFrame:
    """(doc_id, tc, el, wclass, shard): token count, budget-capped
    effective length, power-of-two length class, cumsum shard."""
    return classes_from_counts(
        docs.select(
            "doc_id",
            F.size(F.split(F.trim("text"), _TC)).cast("long").alias("tc"),
        )
    )


def bins_from_classes(t: DataFrame) -> DataFrame:
    """(wclass, bin_id, n_docs, n_tokens, pad_tokens): one row per
    packed no-split sequence. Rank within class via the two-level
    scan (see section comment); bin = rank div (SEQ_BUDGET div wclass),
    so capacity is exact and no bin overflows."""
    b = SEQ_BUDGET
    w_in = Window.partitionBy("shard", "wclass").orderBy("doc_id")
    t = t.withColumn("intra", F.row_number().over(w_in) - 1)
    # bounded |shards| x |classes| frame: exclusive prefix per class
    w_sh = (
        Window.partitionBy("wclass")
        .orderBy("shard")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offs = (
        t.groupBy("shard", "wclass")
        .agg(F.count(F.lit(1)).alias("cn"))
        .select(
            "shard",
            "wclass",
            F.coalesce(F.sum("cn").over(w_sh), F.lit(0)).alias("off"),
        )
    )
    ranked = t.join(F.broadcast(offs), ["shard", "wclass"]).select(
        "wclass",
        "el",
        _idivc(F.col("off") + F.col("intra"), _idivc(F.lit(b), F.col("wclass"))).alias(
            "bin_id"
        ),
    )
    return ranked.groupBy("wclass", "bin_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("el").alias("n_tokens"),
        (F.lit(b) - F.sum("el")).alias("pad_tokens"),
    )


def greedy_pack_bins(docs: DataFrame) -> DataFrame:
    return bins_from_classes(doc_length_classes(docs))


_ORACLE_GREEDY_BINS = f"""tc AS (
      SELECT doc_id,
             len(regexp_split_to_array(trim(text), '{_TC}')) AS tc
      FROM documents
    ), cls AS (
      SELECT doc_id, tc,
             least(greatest(tc, 1), {SEQ_BUDGET}) AS el,
             {_oracle_width_class(f"least(greatest(tc, 1), {SEQ_BUDGET})")} AS wclass
      FROM tc
    ), ranked AS (
      SELECT wclass, el, tc,
             (row_number() OVER (PARTITION BY wclass ORDER BY doc_id) - 1)
               // ({SEQ_BUDGET} // wclass) AS bin_id
      FROM cls
    ), bins AS (
      SELECT wclass, bin_id,
             count(*) AS n_docs,
             CAST(sum(el) AS BIGINT) AS n_tokens,
             CAST({SEQ_BUDGET} - sum(el) AS BIGINT) AS pad_tokens
      FROM ranked GROUP BY wclass, bin_id
    )"""


@query(
    "sequence_packing_greedy_census",
    oracle=f"""
    WITH {_ORACLE_GREEDY_BINS}
    SELECT wclass, bin_id, n_docs, n_tokens, pad_tokens FROM bins
    """,
)
def q_sequence_packing_greedy_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per no-split packed sequence: its length class, bin id within
    the class, document count, packed tokens, and padding — the shelf
    packer's per-sequence census (the no-split twin of
    ``sequence_packing_census``)."""
    return greedy_pack_bins(load_table(spark, sf_dir, "documents"))


@query(
    "sequence_packing_strategy_compare",
    meta={
        "lane": "packing-report",
        "routing": (
            "One row per packing strategy: concat_chunk (splits "
            "documents at sequence boundaries, ~zero padding) vs "
            "greedy_nosplit (length-bucketed shelf packing: zero "
            "splits, bounded padding, oversize docs truncated). Pick "
            "by what the trainer's attention masking tolerates."
        ),
    },
    oracle=f"""
    WITH {_ORACLE_SPANS}, agg AS (
      SELECT count(*) AS n_docs,
             coalesce(sum(tc), 0) AS total_tokens,
             coalesce(sum(CASE WHEN start // {SEQ_BUDGET}
                      < (start + tc - 1) // {SEQ_BUDGET}
                 THEN 1 ELSE 0 END), 0) AS n_split_docs
      FROM sp
    ), cls AS (
      SELECT doc_id, tc,
             least(greatest(tc, 1), {SEQ_BUDGET}) AS el,
             {_oracle_width_class(f"least(greatest(tc, 1), {SEQ_BUDGET})")} AS wclass
      FROM tc
    ), ranked AS (
      SELECT wclass, el, tc,
             (row_number() OVER (PARTITION BY wclass ORDER BY doc_id) - 1)
               // ({SEQ_BUDGET} // wclass) AS bin_id
      FROM cls
    ), gbins AS (
      SELECT wclass, bin_id, sum(el) AS packed FROM ranked
      GROUP BY wclass, bin_id
    ), greedy AS (
      SELECT count(*) AS n_sequences,
             coalesce(sum({SEQ_BUDGET} - packed), 0) AS pad_tokens,
             coalesce(sum(packed), 0) AS packed_tokens
      FROM gbins
    ), trunc AS (
      SELECT coalesce(sum(CASE WHEN tc > {SEQ_BUDGET} THEN 1 ELSE 0 END), 0)
               AS n_truncated_docs
      FROM cls
    )
    SELECT 'concat_chunk' AS strategy,
           CAST((total_tokens + {SEQ_BUDGET - 1}) // {SEQ_BUDGET} AS BIGINT)
               AS n_sequences,
           CAST(((total_tokens + {SEQ_BUDGET - 1}) // {SEQ_BUDGET})
                * {SEQ_BUDGET} - total_tokens AS BIGINT) AS pad_tokens,
           {oracle_exact_ratio(
               "total_tokens",
               f"greatest(((total_tokens + {SEQ_BUDGET - 1}) // {SEQ_BUDGET})"
               f" * {SEQ_BUDGET}, 1)",
           )} AS fill_ratio,
           CAST(n_split_docs AS BIGINT) AS n_split_docs,
           CAST(0 AS BIGINT) AS n_truncated_docs
    FROM agg
    UNION ALL
    SELECT 'greedy_nosplit' AS strategy,
           CAST(n_sequences AS BIGINT) AS n_sequences,
           CAST(pad_tokens AS BIGINT) AS pad_tokens,
           {oracle_exact_ratio(
               "packed_tokens",
               f"greatest(n_sequences * {SEQ_BUDGET}, 1)",
           )} AS fill_ratio,
           CAST(0 AS BIGINT) AS n_split_docs,
           CAST(n_truncated_docs AS BIGINT) AS n_truncated_docs
    FROM greedy, trunc
    """,
)
def q_sequence_packing_strategy_compare(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The fill-vs-split trade, one row per strategy (VERDICT r10 task
    #5): concat-chunk (existing lane — near-zero pad, documents
    straddle boundaries) against greedy no-split shelf packing (zero
    straddling, bounded pad, oversize docs truncated). Shared columns:
    sequences produced, padding tokens, fill ratio, split documents,
    truncated documents."""
    docs = load_table(spark, sf_dir, "documents")
    b = SEQ_BUDGET
    # ONE materialized count frame feeds both strategies (the naive
    # form re-executed the document scan 5x: spans + shard offsets +
    # class ranks + class offsets + the truncation census).
    tcdf = docs.select(
        "doc_id",
        F.size(F.split(F.trim("text"), _TC)).cast("long").alias("tc"),
    ).localCheckpoint()
    chunk = efficiency_from_counts(tcdf).select(
        F.lit("concat_chunk").alias("strategy"),
        "n_sequences",
        "pad_tokens",
        "fill_ratio",
        "n_split_docs",
        F.lit(0).cast("long").alias("n_truncated_docs"),
    )
    classes = classes_from_counts(tcdf)
    trunc = classes.agg(
        F.coalesce(F.sum((F.col("tc") > b).cast("long")), F.lit(0)).alias(
            "n_truncated_docs"
        )
    )
    greedy = (
        bins_from_classes(classes)
        .agg(
            F.count(F.lit(1)).alias("n_sequences"),
            F.coalesce(F.sum("pad_tokens"), F.lit(0)).alias("pad_tokens"),
            F.coalesce(F.sum("n_tokens"), F.lit(0)).alias("packed_tokens"),
        )
        .crossJoin(F.broadcast(trunc))
        .select(
            F.lit("greedy_nosplit").alias("strategy"),
            "n_sequences",
            "pad_tokens",
            exact_ratio(
                F.col("packed_tokens"),
                F.greatest(F.col("n_sequences") * b, F.lit(1)),
            ).alias("fill_ratio"),
            F.lit(0).cast("long").alias("n_split_docs"),
            "n_truncated_docs",
        )
    )
    return chunk.unionByName(greedy)
