"""Storage-layout analytics: what a 100 TB table's PHYSICAL order is
worth.

ABSENT from the reference (one text file per map task, no columnar
layout at all — SURVEY.md §1.2); on a real lake the single biggest
scan lever after column pruning is row-group/file SKIPPING, and
whether skipping fires for a multi-dimensional predicate is decided
when the data is WRITTEN: a table sorted by one key prunes only that
key's predicates, while a space-filling-curve (Z-order) key keeps
min/max ranges tight on every interleaved dimension at once (public
technique: Morton order, used by Delta/Iceberg OPTIMIZE ZORDER).

``zorder_layout_census`` quantifies that trade on the lineitem table
WITHOUT writing anything: it simulates both layouts by assigning rows
to equal-width value-range "files" on the respective sort key (a
range-partitioned write), computes each file's per-dimension min/max
footer stats, and counts the files a fixed 2-D range predicate could
skip. Everything is exact integer bit arithmetic, so the whole census
— including the 20-bit Morton interleave — is oracle-checked.

Scale shape: the Morton key is a per-row integer expression (no
shuffle); the census shuffles (file, partial-min/max/count) only —
N_FILES groups — so the query is one linear scan plus a 64-row
rollup. No global sort is ever taken (an equal-COUNT ntile would pull
the table through one partition; equal-WIDTH ranges are the
shuffle-free stand-in and mirror how range-partitioned writers
actually bound file contents).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mapreduce_lab_spark.functions.hashing import hex8_int, oracle_hex8_int
from mapreduce_lab_spark.functions.numeric import exact_ratio, oracle_exact_ratio
from mapreduce_lab_spark.registry import query
from mapreduce_lab_spark.sources.tables import load_table

Z_BITS = 10           # bits per dimension (dims bucketed mod 2^Z_BITS)
N_FILES = 64          # simulated files per layout
# the 2-D range predicate whose skippability the census measures
D1_LO, D1_HI = 100, 299
D2_LO, D2_HI = 400, 599


def _z_sql(d1: str, d2: str, shl: str, shr: str) -> str:
    """Morton interleave of two Z_BITS-bit ints as engine SQL; ``shl``
    / ``shr`` are format strings so Spark gets shiftleft()/shiftright()
    and DuckDB gets << / >>. d2's bit i lands at position 2i, d1's at
    2i+1 (d1 = major dimension on ties)."""
    terms = []
    for i in range(Z_BITS):
        terms.append(shl.format(x=f"({shr.format(x=d1, n=i)}) % 2", n=2 * i + 1))
        terms.append(shl.format(x=f"({shr.format(x=d2, n=i)}) % 2", n=2 * i))
    return " + ".join(terms)


_SPARK_SHL = "shiftleft({x}, {n})"
_SPARK_SHR = "shiftright({x}, {n})"
_DUCK_SHL = "(({x}) << {n})"
_DUCK_SHR = "(({x}) >> {n})"


def _dims_base(lineitem: DataFrame) -> DataFrame:
    return lineitem.select(
        F.pmod("l_partkey", F.lit(1 << Z_BITS)).cast("int").alias("d1"),
        F.pmod("l_suppkey", F.lit(1 << Z_BITS)).cast("int").alias("d2"),
    )


def _census_leg(base: DataFrame, tag: str, file_col) -> DataFrame:
    files = (
        base.withColumn("f", file_col)
        .groupBy("f")
        .agg(
            F.min("d1").alias("min1"), F.max("d1").alias("max1"),
            F.min("d2").alias("min2"), F.max("d2").alias("max2"),
            F.count(F.lit(1)).alias("rows"),
        )
    )
    hit = (
        (F.col("min1") <= D1_HI) & (F.col("max1") >= D1_LO)
        & (F.col("min2") <= D2_HI) & (F.col("max2") >= D2_LO)
    )
    return files.agg(
        F.lit(tag).alias("layout"),
        F.count(F.lit(1)).alias("n_files"),
        F.sum(hit.cast("long")).alias("files_scanned"),
        F.sum(F.when(hit, F.col("rows")).otherwise(0)).alias("rows_scanned"),
        exact_ratio(
            F.count(F.lit(1)) - F.sum(hit.cast("long")), F.count(F.lit(1))
        ).alias("skip_ratio"),
    ).select("layout", "n_files", "files_scanned", "rows_scanned", "skip_ratio")


def zorder_layout_census(lineitem: DataFrame) -> DataFrame:
    """Per layout ('linear' = sorted by d1, 'zorder' = Morton(d1,d2)):
    simulated file count, files/rows a 2-D range predicate must scan
    given min/max footer stats, and the skip ratio."""
    width_d1 = (1 << Z_BITS) // N_FILES
    width_z = (1 << (2 * Z_BITS)) // N_FILES
    base = _dims_base(lineitem).withColumn(
        "z", F.expr(_z_sql("d1", "d2", _SPARK_SHL, _SPARK_SHR))
    )
    # explicit floor on BOTH engines: DuckDB's CAST(x AS INT) rounds
    # half-even while Spark's cast truncates — floor-then-cast is the
    # one spelling with identical semantics (all values non-negative).
    lin = _census_leg(base, "linear", F.floor(F.col("d1") / F.lit(width_d1)).cast("int"))
    zo = _census_leg(base, "zorder", F.floor(F.col("z") / F.lit(width_z)).cast("int"))
    return lin.unionByName(zo)


def _oracle_leg(tag: str, file_expr: str) -> str:
    width_d1 = (1 << Z_BITS) // N_FILES  # noqa: F841 (doc symmetry)
    return f"""
    SELECT '{tag}' AS layout,
           count(*) AS n_files,
           CAST(sum(CASE WHEN hit THEN 1 ELSE 0 END) AS BIGINT)
               AS files_scanned,
           CAST(sum(CASE WHEN hit THEN rows ELSE 0 END) AS BIGINT)
               AS rows_scanned,
           {oracle_exact_ratio(
               "count(*) - sum(CASE WHEN hit THEN 1 ELSE 0 END)",
               "count(*)",
           )} AS skip_ratio
    FROM (
      SELECT {file_expr} AS f,
             min(d1) <= {D1_HI} AND max(d1) >= {D1_LO}
             AND min(d2) <= {D2_HI} AND max(d2) >= {D2_LO} AS hit,
             count(*) AS rows
      FROM b GROUP BY 1
    )"""


@query(
    "zorder_layout_census",
    oracle=f"""
    WITH b AS (
      SELECT d1, d2, {_z_sql("d1", "d2", _DUCK_SHL, _DUCK_SHR)} AS z
      FROM (
        SELECT CAST(l_partkey % {1 << Z_BITS} AS INT) AS d1,
               CAST(l_suppkey % {1 << Z_BITS} AS INT) AS d2
        FROM lineitem
      )
    )
    {_oracle_leg("linear", f"CAST(floor(d1 / {(1 << Z_BITS) // N_FILES}) AS INT)")}
    UNION ALL
    {_oracle_leg("zorder", f"CAST(floor(z / {(1 << (2 * Z_BITS)) // N_FILES}) AS INT)")}
    """,
)
def q_zorder_layout_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    return zorder_layout_census(load_table(spark, sf_dir, "lineitem"))


# --- posting-list compression estimate --------------------------------------

# Delta + varint (LEB128) — the classic inverted-index layout every
# search/retrieval system ships (Lucene's VInt, public format): sorted
# doc ids per term become gaps, each gap costs ceil(bits/7) bytes.
_VARINT_THRESHOLDS = [(1 << 7, 1), (1 << 14, 2), (1 << 21, 3), (1 << 28, 4)]


def _varint_bytes_spark(gap) -> "F.Column":
    c = None
    for bound, nbytes in _VARINT_THRESHOLDS:
        c = (F.when(gap < bound, nbytes) if c is None
             else c.when(gap < bound, nbytes))
    return c.otherwise(5)


def _varint_bytes_sql(gap: str) -> str:
    cases = " ".join(
        f"WHEN ({gap}) < {bound} THEN {nbytes}"
        for bound, nbytes in _VARINT_THRESHOLDS
    )
    return f"CASE {cases} ELSE 5 END"


_ORACLE_TOKENS = "[t for t in regexp_split_to_array(text, '[^\\p{L}]+') if t <> '']"


def postings_compression_estimate(docs: DataFrame) -> DataFrame:
    """ONE row: how many bytes the corpus' inverted index costs raw
    (8 B/posting) vs delta+varint — the storage decision every
    retrieval deployment prices before writing an index.

    Scale shape: postings stream through a (term)-partitioned window
    computing the doc-id delta per posting (no posting LIST is ever
    materialized — a collect_list per term is unbounded on stop
    words); the rollup is a map-side-combinable global sum. The first
    posting of a term is charged varint(doc_id + 1) so every gap is
    >= 1 and the estimate matches a real from-zero delta chain.
    """
    from pyspark.sql import Window

    from mapreduce_lab_spark.functions.text import tokenize

    post = (
        docs.select(F.explode(tokenize(F.col("text"))).alias("w"), "doc_id")
        .distinct()
    )
    win = Window.partitionBy("w").orderBy("doc_id")
    gap = F.coalesce(
        F.col("doc_id") - F.lag("doc_id").over(win), F.col("doc_id") + 1
    )
    per = post.select("w", _varint_bytes_spark(gap).alias("nb"))
    return per.agg(
        F.countDistinct("w").alias("n_terms"),
        F.count(F.lit(1)).alias("n_postings"),
        (F.count(F.lit(1)) * 8).alias("raw_bytes"),
        F.sum("nb").alias("varint_bytes"),
        exact_ratio(F.sum("nb"), F.count(F.lit(1)) * 8).alias("compressed_frac"),
    ).select("n_terms", "n_postings", "raw_bytes", "varint_bytes", "compressed_frac")


@query(
    "postings_compression_estimate",
    oracle=f"""
    WITH post AS (
      SELECT DISTINCT w, doc_id
      FROM (SELECT doc_id, unnest({_ORACLE_TOKENS}) AS w FROM documents)
    ), g AS (
      SELECT w, coalesce(doc_id - lag(doc_id) OVER (PARTITION BY w
                                                    ORDER BY doc_id),
                         doc_id + 1) AS gap
      FROM post
    )
    SELECT count(DISTINCT w) AS n_terms,
           count(*) AS n_postings,
           count(*) * 8 AS raw_bytes,
           CAST(sum({_varint_bytes_sql("gap")}) AS BIGINT) AS varint_bytes,
           {oracle_exact_ratio(
               f'sum({_varint_bytes_sql("gap")})', "count(*) * 8"
           )} AS compressed_frac
    FROM g
    """,
)
def q_postings_compression_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    return postings_compression_estimate(load_table(spark, sf_dir, "documents"))


# --- Hilbert-curve layout census (round 11) -----------------------------------

# The Z-order census above prices Morton interleaving; real lake
# OPTIMIZE implementations increasingly prefer the HILBERT curve
# because Morton's quadrant jumps leave some files spanning wide value
# ranges on one dimension, while Hilbert's unit-step adjacency keeps
# every file's min/max box tight (public technique: Hilbert clustering
# in Delta Lake / Apache Iceberg discussions; curve construction from
# the standard iterative algorithm).
#
# The index is computed by the NON-NEGATIVE variant of the classic
# xy2d loop: each of the Z_BITS levels extracts the quadrant bits
# (rx, ry) by integer division, REDUCES the coordinates modulo s so
# every intermediate stays in [0, s) — the property that makes `div`
# and `%` translate identically to Spark and DuckDB (they disagree on
# negatives: truncation vs floor) — and rotates the subsquare with
# pure CASE arithmetic ((3*rx) XOR ry == CASE rx=0 -> ry ELSE 3-ry,
# valid for bit inputs, so no engine-specific XOR operator is
# needed). The whole transform is one 10-level projection chain that
# Catalyst collapses into a single whole-stage-codegen expression; no
# shuffle, no UDF. tests/test_layout_plans.py pins bijectivity and
# unit adjacency of the Spark expression against a pure-Python
# reference.


# File count for the three-way census: an ODD power of two on
# purpose. At a power of FOUR (like the zorder gate's 64) an
# equal-width cut of EITHER curve yields the same square tiles and
# the two curves are indistinguishable; at 2 * 4^k each file is a
# PAIR of squares — adjacent (tight bounding box) under Hilbert,
# Z-sequence-adjacent (often diagonal, double-width box) under
# Morton — which is exactly the geometry difference Hilbert
# clustering buys.
H_FILES = 32


def _hilbert_levels() -> list[int]:
    return [1 << i for i in range(Z_BITS - 1, -1, -1)]


def hilbert_index_py(n: int, x: int, y: int) -> int:
    """Pure-Python reference (test oracle) of the same variant."""
    d = 0
    s = n // 2
    while s > 0:
        rx, ry = x // s, y // s
        d += s * s * ((3 * rx) ^ ry)
        x, y = x % s, y % s
        if ry == 0:
            if rx == 1:
                x, y = s - 1 - x, s - 1 - y
            x, y = y, x
        s //= 2
    return d


def with_hilbert_index(base: DataFrame) -> DataFrame:
    """Adds h = Hilbert index of (d1, d2) via the unrolled level chain."""
    df = base.select(
        "*",
        F.col("d1").alias("hx"),
        F.col("d2").alias("hy"),
        F.lit(0).cast("long").alias("hacc"),
    )
    for s in _hilbert_levels():
        rx = (F.col("hx") / s).cast("int")  # hx < 2s, non-negative
        ry = (F.col("hy") / s).cast("int")
        xm = F.col("hx") % s
        ym = F.col("hy") % s
        step = F.when(rx == 0, ry).otherwise(3 - ry)
        new_hx = F.when(ry == 0, F.when(rx == 1, s - 1 - ym).otherwise(ym)).otherwise(xm)
        new_hy = F.when(ry == 0, F.when(rx == 1, s - 1 - xm).otherwise(xm)).otherwise(ym)
        df = df.select(
            "d1",
            "d2",
            new_hx.alias("hx"),
            new_hy.alias("hy"),
            (F.col("hacc") + F.lit(s * s).cast("long") * step).alias("hacc"),
        )
    return df.select("d1", "d2", F.col("hacc").alias("h"))


def _hilbert_oracle_chain(src: str) -> str:
    inner = f"SELECT d1, d2, d1 AS hx, d2 AS hy, CAST(0 AS BIGINT) AS hacc FROM {src}"
    for s in _hilbert_levels():
        rx, ry = f"(hx // {s})", f"(hy // {s})"
        xm, ym = f"(hx % {s})", f"(hy % {s})"
        step = f"(CASE WHEN {rx} = 0 THEN {ry} ELSE 3 - {ry} END)"
        new_hx = (
            f"CASE WHEN {ry} = 0 THEN (CASE WHEN {rx} = 1 THEN {s} - 1 - {ym}"
            f" ELSE {ym} END) ELSE {xm} END"
        )
        new_hy = (
            f"CASE WHEN {ry} = 0 THEN (CASE WHEN {rx} = 1 THEN {s} - 1 - {xm}"
            f" ELSE {xm} END) ELSE {ym} END"
        )
        inner = (
            f"SELECT d1, d2, {new_hx} AS hx, {new_hy} AS hy, "
            f"hacc + {s * s} * {step} AS hacc FROM ({inner})"
        )
    return f"SELECT d1, d2, hacc AS h FROM ({inner})"


@query(
    "hilbert_layout_census",
    oracle=f"""
    WITH dims AS (
      SELECT CAST({oracle_hex8_int("CAST(l_orderkey AS VARCHAR) || ':' || CAST(l_linenumber AS VARCHAR)")} % {1 << Z_BITS} AS INT) AS d1,
             CAST({oracle_hex8_int("CAST(l_linenumber AS VARCHAR) || '~' || CAST(l_orderkey AS VARCHAR)")} % {1 << Z_BITS} AS INT) AS d2
      FROM lineitem
    ), b AS (
      SELECT d1, d2,
             {_z_sql("d1", "d2", _DUCK_SHL, _DUCK_SHR)} AS z,
             h
      FROM ({_hilbert_oracle_chain("dims")})
    )
    {_oracle_leg("hilbert", f"CAST(floor(h / {(1 << (2 * Z_BITS)) // H_FILES}) AS INT)")}
    UNION ALL
    {_oracle_leg("linear", f"CAST(floor(d1 / {(1 << Z_BITS) // H_FILES}) AS INT)")}
    UNION ALL
    {_oracle_leg("zorder", f"CAST(floor(z / {(1 << (2 * Z_BITS)) // H_FILES}) AS INT)")}
    """,
)
def q_hilbert_layout_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Three-way layout comparison — linear sort key vs Morton vs
    Hilbert clustering: simulated files, files/rows a 2-D range
    predicate must scan given min/max footers, skip ratio per layout.
    The Hilbert index is the fully-oracled unrolled level chain (see
    section comment); the report is the number an OPTIMIZE
    CLUSTER-BY decision stands on."""
    width_d1 = (1 << Z_BITS) // H_FILES
    width_c = (1 << (2 * Z_BITS)) // H_FILES
    # Hash-spread dims (NOT the raw mod dims the zorder gate uses):
    # the geometry comparison needs coordinates that span the full
    # 2^Z_BITS x 2^Z_BITS grid at EVERY scale factor — raw l_partkey /
    # l_suppkey cover a corner at small SFs and every file trivially
    # misses the predicate box, which gates the hash but measures
    # nothing. hex8_int of two independent key spellings gives
    # uniform, engine-portable coordinates.
    li = load_table(spark, sf_dir, "lineitem")
    dims = li.select(
        (
            hex8_int(
                F.concat_ws(":", F.col("l_orderkey").cast("string"),
                            F.col("l_linenumber").cast("string"))
            ) % (1 << Z_BITS)
        ).cast("int").alias("d1"),
        (
            hex8_int(
                F.concat_ws("~", F.col("l_linenumber").cast("string"),
                            F.col("l_orderkey").cast("string"))
            ) % (1 << Z_BITS)
        ).cast("int").alias("d2"),
    )
    base = with_hilbert_index(dims)
    base = base.withColumn("z", F.expr(_z_sql("d1", "d2", _SPARK_SHL, _SPARK_SHR)))
    hil = _census_leg(base, "hilbert", F.floor(F.col("h") / F.lit(width_c)).cast("int"))
    lin = _census_leg(base, "linear", F.floor(F.col("d1") / F.lit(width_d1)).cast("int"))
    zo = _census_leg(base, "zorder", F.floor(F.col("z") / F.lit(width_c)).cast("int"))
    return hil.unionByName(lin).unionByName(zo)


# --- time-series timestamp compression estimate (Gorilla-style) ---------------

# The TSDB twin of the postings estimate above: Facebook's Gorilla
# (Pelkonen et al., VLDB 2015 — public) stores per-series timestamps
# as delta-of-delta, exploiting that regular streams have near-
# constant inter-arrival gaps. This census prices the events table's
# (user_id-keyed) timestamp column three ways — raw int64, delta +
# varint, delta-of-delta + zigzag + varint — from ONE keyed lag
# window (no series is ever materialized as a list; stop-user streams
# stay windowed exactly like stop words in the postings lane).
# Zigzag ((n << 1) ^ (n >> 63) conceptually) maps signed dods to
# unsigned varint space; spelled arithmetically as 2n / -2n-1 so both
# engines agree without bit operators.


def _zigzag(col) -> "F.Column":
    return F.when(col >= 0, 2 * col).otherwise(-2 * col - 1)


def _varint_zigzag_sql(n: str) -> str:
    zz = f"(CASE WHEN ({n}) >= 0 THEN 2 * ({n}) ELSE -2 * ({n}) - 1 END)"
    return _varint_bytes_sql(zz)


def ts_compression_estimate(events: DataFrame) -> DataFrame:
    from pyspark.sql import Window

    us = F.unix_micros(F.col("ts").cast("timestamp"))
    base = events.select("user_id", F.col("event_id"), us.alias("t"))
    w = Window.partitionBy("user_id").orderBy("t", "event_id")
    d = base.withColumn("delta", F.col("t") - F.lag("t").over(w))
    dd = d.withColumn("dod", F.col("delta") - F.lag("delta").over(w))
    # first point per series: 8 raw bytes; first delta: varint(delta);
    # rest: varint(zigzag(dod)) — the exact Gorilla byte accounting at
    # varint (not bit) granularity.
    per = dd.select(
        F.when(F.col("delta").isNull(), 8)
        .when(F.col("dod").isNull(), _varint_bytes_spark(F.col("delta")))
        .otherwise(_varint_bytes_spark(_zigzag(F.col("dod"))))
        .alias("dod_bytes"),
        F.when(F.col("delta").isNull(), 8)
        .otherwise(_varint_bytes_spark(F.col("delta")))
        .alias("delta_bytes"),
    )
    return per.agg(
        (F.count(F.lit(1)) * 8).alias("raw_bytes"),
        F.coalesce(F.sum("delta_bytes"), F.lit(0)).alias("delta_varint_bytes"),
        F.coalesce(F.sum("dod_bytes"), F.lit(0)).alias("dod_varint_bytes"),
        exact_ratio(
            F.coalesce(F.sum("dod_bytes"), F.lit(0)),
            F.greatest(F.count(F.lit(1)) * 8, F.lit(1)),
        ).alias("dod_compression_ratio"),
    )


_TS_COMP_ORACLE = f"""
WITH d AS (
  SELECT user_id,
         epoch_us(ts) - lag(epoch_us(ts))
             OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
             AS delta,
         epoch_us(ts) AS t, event_id
  FROM events
), dd AS (
  SELECT delta,
         delta - lag(delta)
             OVER (PARTITION BY user_id ORDER BY t, event_id) AS dod
  FROM d
), per AS (
  SELECT CASE WHEN delta IS NULL THEN 8
              WHEN dod IS NULL THEN {_varint_bytes_sql('delta')}
              ELSE {_varint_zigzag_sql('dod')} END AS dod_bytes,
         CASE WHEN delta IS NULL THEN 8
              ELSE {_varint_bytes_sql('delta')} END AS delta_bytes
  FROM dd
)
SELECT CAST(count(*) * 8 AS BIGINT) AS raw_bytes,
       CAST(coalesce(sum(delta_bytes), 0) AS BIGINT) AS delta_varint_bytes,
       CAST(coalesce(sum(dod_bytes), 0) AS BIGINT) AS dod_varint_bytes,
       {oracle_exact_ratio(
           "coalesce(sum(dod_bytes), 0)",
           "greatest(count(*) * 8, 1)",
       )} AS dod_compression_ratio
FROM per
"""


@query("ts_compression_estimate", oracle=_TS_COMP_ORACLE)
def q_ts_compression_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One row: the events timestamp column priced raw vs delta+varint
    vs Gorilla delta-of-delta+zigzag+varint, from one keyed lag window
    — the storage decision a time-series lake makes per series key."""
    return ts_compression_estimate(load_table(spark, sf_dir, "events"))
