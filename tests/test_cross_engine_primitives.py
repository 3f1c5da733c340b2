"""Direct adversarial parity fuzz for the cross-engine primitive twins
every oracle stands on (round 12): ``hex8_int`` / ``perm_hash`` /
``to_units`` / ``exact_ratio`` vs their DuckDB twin strings.

Until now the twins were only exercised TRANSITIVELY, through oracled
queries over the ASCII fixture tables — so a divergence on inputs the
fixtures never produce (non-ASCII, control characters incl. the
chr(31) the BPE oracle uses as a delimiter, hex prefixes that start
with many zeros, negative/huge unit values) would surface as a
confusing downstream hash mismatch, or not at all until real data
hits it. This file compares the primitives THEMSELVES, value by
value, over adversarial and random inputs.
"""

from __future__ import annotations

import duckdb
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from mapreduce_lab_spark.functions.hashing import (
    MINHASH_PERMS,
    hex8_int,
    oracle_hex8_int,
    oracle_perm_hash,
    perm_hash,
)
from mapreduce_lab_spark.functions.numeric import (
    exact_ratio,
    oracle_exact_ratio,
    oracle_units,
    to_units,
)

# Deliberately nasty corpus: empty, whitespace, ASCII controls
# (incl. the BPE delimiter \x1f), md5-prefix edge seeds, non-ASCII
# BMP and astral code points, combining marks, long strings.
ADVERSARIAL = [
    "",
    " ",
    "\t\n\r",
    "\x1f",
    "a\x1fb",
    "\x01\x02\x03",
    "hello",
    "HELLO",
    "0", "00000000",
    "é", "café", "naïve",
    "日本語のテキスト",
    "🦀🚀", "𝔘𝔫𝔦𝔠𝔬𝔡𝔢",
    "é",  # combining acute
    "x" * 10_000,
    "word:" + "9" * 100,
    "  ",  # line/para separators
]


def _spark_hex8(spark, values):
    df = spark.createDataFrame([(v,) for v in values], "s string")
    return [
        r.h for r in df.select(hex8_int(F.col("s")).alias("h")).collect()
    ]


def _duck_hex8(values):
    con = duckdb.connect()
    try:
        con.register("t", pd.DataFrame({"s": values}))
        return [
            r[0]
            for r in con.execute(
                f"SELECT {oracle_hex8_int('s')} FROM t"
            ).fetchall()
        ]
    finally:
        con.close()


def test_hex8_int_parity_adversarial(spark):
    assert _spark_hex8(spark, ADVERSARIAL) == _duck_hex8(ADVERSARIAL)


@settings(max_examples=25, deadline=None)
@given(st.lists(st.text(min_size=0, max_size=60), min_size=1, max_size=24))
def test_hex8_int_parity_fuzz(spark, values):
    # Spark strings cannot hold unpaired surrogates; Hypothesis text()
    # is already surrogate-free, so pass through unchanged.
    assert _spark_hex8(spark, values) == _duck_hex8(values)


def test_perm_hash_parity_all_perms(spark):
    """Every MinHash permutation (a, b) must agree on the full
    adversarial corpus — these feed banded LSH bucket ids, where a
    single divergent value silently changes candidate sets."""
    df = spark.createDataFrame([(v,) for v in ADVERSARIAL], "s string")
    x = hex8_int(F.col("s"))
    cols = [
        perm_hash(x, a, b).alias(f"p{i}")
        for i, (a, b) in enumerate(MINHASH_PERMS)
    ]
    got = [tuple(r) for r in df.select(*cols).collect()]
    con = duckdb.connect()
    try:
        con.register("t", pd.DataFrame({"s": ADVERSARIAL}))
        hx = oracle_hex8_int("s")
        sel = ", ".join(
            oracle_perm_hash(hx, a, b) for a, b in MINHASH_PERMS
        )
        exp = con.execute(f"SELECT {sel} FROM t").fetchall()
    finally:
        con.close()
    assert got == [tuple(r) for r in exp]


@settings(max_examples=20, deadline=None)
@given(
    st.lists(
        st.tuples(
            # representable-at-2dp money values, incl. negatives
            st.integers(-10_000_000, 10_000_000).map(lambda c: c / 100),
            st.integers(1, 1_000_000),
        ),
        min_size=1,
        max_size=20,
    )
)
def test_units_and_ratio_parity_fuzz(spark, rows):
    df = spark.createDataFrame(rows, "v double, d long")
    got = [
        (r.u, r.r)
        for r in df.select(
            to_units(F.col("v"), 100).alias("u"),
            exact_ratio(
                to_units(F.col("v"), 100), F.col("d")
            ).alias("r"),
        ).collect()
    ]
    con = duckdb.connect()
    try:
        con.register(
            "t", pd.DataFrame({"v": [v for v, _ in rows], "d": [d for _, d in rows]})
        )
        exp = con.execute(
            f"SELECT {oracle_units('v', 100)},"
            f" {oracle_exact_ratio(oracle_units('v', 100), 'd')} FROM t"
        ).fetchall()
    finally:
        con.close()
    assert got == [tuple(r) for r in exp]
