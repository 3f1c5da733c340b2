"""Property tests for the round-9b driver-arithmetic operators.

Each pits the distributed/bounded-state implementation against a
trivially-correct pure-Python oracle on randomized inputs — the same
discipline as the CC/BPE property tests: the fixed parquet corpora
exercise one data shape, hypothesis exercises the edge cases (ties,
empty groups, single elements, degenerate chains).
"""

from __future__ import annotations

import math

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from tests.fuzzbudget import examples

from mapreduce_lab_spark.operators.attribution import MARKOV_SCALE, _absorption
from mapreduce_lab_spark.operators.profiling import (
    QUANTILE_PCTS,
    distributed_exact_quantiles,
)

# Cent-valued prices with deliberate tie mass (narrow domain).
PRICES = st.lists(
    st.integers(min_value=1, max_value=5000).map(lambda c: c / 100.0),
    min_size=1,
    max_size=60,
)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(prices=PRICES)
def test_quantile_refinement_matches_sorted_selection(spark, prices):
    df = spark.createDataFrame([(p,) for p in prices], "l_extendedprice double")
    got = {r["pct"]: r for r in distributed_exact_quantiles(df).collect()}
    srt = sorted(prices)
    n = len(srt)
    for pct in QUANTILE_PCTS:
        k = (n * pct + 99) // 100
        assert got[pct]["k"] == k
        assert got[pct]["value"] == srt[k - 1]
        assert got[pct]["n_le"] == sum(1 for p in prices if p <= srt[k - 1])


# Random small chains: states 'a'-'d' plus absorbing conv/null.
_STATES = ("start", "a", "b", "c")
_TARGETS = ("a", "b", "c", "conv", "null")
CHAINS = st.dictionaries(
    st.tuples(st.sampled_from(_STATES), st.sampled_from(_TARGETS)),
    st.integers(min_value=1, max_value=50),
    min_size=1,
    max_size=12,
)


def _float_absorption(
    t: dict[tuple[str, str], int], iters: int
) -> dict[str, float]:
    """Reference: the same value iteration in floats."""
    out: dict[str, int] = {}
    for (frm, _), n in t.items():
        out[frm] = out.get(frm, 0) + n
    p = {s: 0.0 for s in out}
    for _ in range(iters):
        nxt = {}
        for s in p:
            acc = 0.0
            for (frm, to), n in t.items():
                if frm != s:
                    continue
                if to == "conv":
                    acc += n
                elif to in p:
                    acc += n * p[to]
            nxt[s] = acc / out[s]
        p = nxt
    return p


@given(t=CHAINS)
@settings(max_examples=examples(50), deadline=None)
def test_markov_fixed_point_tracks_float_solve(t):
    from mapreduce_lab_spark.operators.attribution import MARKOV_ITERS

    got = _absorption(t, None)
    # apples-to-apples: the float iteration truncated at the SAME K —
    # the integer version floors per step so it sits at or just below
    # the float K-step value, never above it by more than rounding
    same_k = _float_absorption(t, MARKOV_ITERS)
    # and it can never exceed the true fixpoint (monotone from below)
    fixpoint = _float_absorption(t, 400)
    for s, pv in got.items():
        assert pv <= math.ceil(fixpoint[s] * MARKOV_SCALE) + 1
        assert pv <= same_k[s] * MARKOV_SCALE + 1
        # per-step floors lose < 1 unit per state per step
        assert pv >= same_k[s] * MARKOV_SCALE - len(got) * 25 - 25


@given(t=CHAINS)
@settings(max_examples=examples(30), deadline=None)
def test_markov_removal_never_increases_conversion(t):
    base = _absorption(t, None).get("start", 0)
    for ch in ("a", "b", "c"):
        assert _absorption(t, ch).get("start", 0) <= base
