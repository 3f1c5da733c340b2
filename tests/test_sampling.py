"""Sampling-specific regressions beyond the oracle-parity sweep."""

from __future__ import annotations

from pyspark.sql import functions as F

from mapreduce_lab_spark.functions.hashing import hex8_int
from mapreduce_lab_spark.operators.sampling import upsample_by_lang


def test_upsample_sub_1000_rate_drops_instead_of_phantom_duplicating(spark):
    """A rate under 1000 permille means n_copies can be 0 for some
    docs. Spark's sequence(1, 0) yields the DESCENDING [1, 0] (two
    phantom copies) where DuckDB's generate_series is empty — the
    guard must emit zero rows for those docs."""
    docs = spark.range(200).select(
        F.col("id").alias("doc_id"), F.lit("xx").alias("lang")
    )
    out = upsample_by_lang(docs, rates={"xx": 400}).collect()
    gate = hex8_int(F.concat(F.lit("up:"), F.col("doc_id").cast("string"))) % 1000
    expected_docs = docs.where(gate < 400).count()
    assert 0 < expected_docs < 200  # the rate genuinely drops some docs
    assert len(out) == 1
    row = out[0]
    # One copy per gated doc, zero for the rest — never [1, 0] phantoms.
    assert row["n_docs"] == expected_docs
    assert row["n_copies"] == expected_docs


def test_upsample_default_rates_unchanged(spark):
    """Fractional >1000 rates keep their exact copy arithmetic."""
    docs = spark.createDataFrame(
        [(i, "fr") for i in range(100)], "doc_id long, lang string"
    )
    row = upsample_by_lang(docs).collect()[0]  # fr: 2500 permille
    gate = hex8_int(F.concat(F.lit("up:"), F.col("doc_id").cast("string"))) % 1000
    extra = docs.where(gate < 500).count()
    assert row["n_docs"] == 100
    assert row["n_copies"] == 2 * 100 + extra


def _wf(spark, masses):
    """Run mixture_water_fill on synthetic per-domain masses; one doc
    per (domain, unit) would be wasteful — encode each domain as one
    doc whose n_chars is the domain's whole mass."""
    from mapreduce_lab_spark.operators.sampling import mixture_water_fill

    docs = spark.createDataFrame(
        [(i, lang, m) for i, (lang, m) in enumerate(masses.items())],
        "doc_id long, lang string, n_chars long",
    )
    return {r["lang"]: r for r in mixture_water_fill(docs).collect()}


def test_water_fill_conserves_budget_exactly(spark):
    from mapreduce_lab_spark.operators.sampling import (
        WF_BUDGET_DEN, WF_BUDGET_NUM, WF_EPOCH_CAP,
    )

    masses = {"a": 100, "b": 1000, "c": 10000, "d": 200}
    total = sum(masses.values())
    budget = total * WF_BUDGET_NUM // WF_BUDGET_DEN
    out = _wf(spark, masses)
    allocs = {l: r["alloc_chars"] for l, r in out.items()}
    caps = {l: m * WF_EPOCH_CAP for l, m in masses.items()}
    # Budget fully spent (Σcap exceeds it here), never over-spent,
    # and no domain exceeds its cap.
    assert sum(allocs.values()) == min(budget, sum(caps.values()))
    for lang in masses:
        assert 0 <= allocs[lang] <= caps[lang]
    # Saturated = the small domains; the big one absorbs the level.
    assert out["a"]["saturated"] and out["d"]["saturated"]
    assert not out["c"]["saturated"]
    assert allocs["a"] == 200 and allocs["d"] == 400


def test_water_fill_saturated_set_is_prefix_by_cap(spark):
    masses = {"t1": 50, "t2": 60, "t3": 70, "big": 100000, "mid": 5000}
    out = _wf(spark, masses)
    by_cap = sorted(out.values(), key=lambda r: (r["cap_chars"], r["lang"]))
    flags = [r["saturated"] for r in by_cap]
    # Once a domain is unsaturated, every larger-cap domain is too.
    assert flags == sorted(flags, reverse=True)
    # Unsaturated domains all sit within 1 char of a common level.
    levels = [r["alloc_chars"] for r in by_cap if not r["saturated"]]
    assert levels and max(levels) - min(levels) <= 1


def test_water_fill_all_saturated_reports_shortfall(spark):
    """Budget above Σcap: every domain caps out and the plan's total
    falls short of the budget — the signal to raise WF_EPOCH_CAP or
    shrink the run. Equal masses make the budget 3/2 * total while
    Σcap = 2 * total > budget, so force it with a tiny epoch cap."""
    import mapreduce_lab_spark.operators.sampling as S

    masses = {"x": 300, "y": 300, "z": 300}
    orig = S.WF_EPOCH_CAP
    try:
        S.WF_EPOCH_CAP = 1  # Σcap = total < budget = 3/2 total
        out = _wf(spark, masses)
    finally:
        S.WF_EPOCH_CAP = orig
    assert all(r["saturated"] for r in out.values())
    assert sum(r["alloc_chars"] for r in out.values()) == 900
    assert all(r["epochs_ppm"] == 1_000_000 for r in out.values())
