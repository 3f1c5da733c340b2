"""Selection-operator invariants beyond the oracle-parity sweep."""

from __future__ import annotations

from pyspark.sql import functions as F

from mapreduce_lab_spark.operators.selection import (
    DSIR_TOP_K,
    N_SHARDS,
    _probe_gate,
    _target_gate,
    corpus_shard_manifest,
    dsir_select_topk,
    minhash_fuzzy_join,
)
from mapreduce_lab_spark.sources.tables import load_table


def test_dsir_excludes_target_and_ranks_deterministically(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    out = dsir_select_topk(docs, spark).collect()
    assert 0 < len(out) <= DSIR_TOP_K
    # Ranks are 1..n with score non-increasing, doc_id-tiebroken.
    ranked = sorted(out, key=lambda r: r["rank"])
    assert [r["rank"] for r in ranked] == list(range(1, len(out) + 1))
    for a, b in zip(ranked, ranked[1:]):
        assert (a["mean_lift_ppm"], -a["doc_id"]) >= (
            b["mean_lift_ppm"], -b["doc_id"],
        ) or a["mean_lift_ppm"] > b["mean_lift_ppm"]
        if a["mean_lift_ppm"] == b["mean_lift_ppm"]:
            assert a["doc_id"] < b["doc_id"]
        else:
            assert a["mean_lift_ppm"] > b["mean_lift_ppm"]
    # Selection pool excludes the target sample itself.
    selected = {r["doc_id"] for r in out}
    target_ids = {
        r["doc_id"]
        for r in docs.select("doc_id").where(_target_gate()).collect()
    }
    assert selected.isdisjoint(target_ids)


def test_dsir_scores_target_lookalike_above_noise(spark):
    """A doc repeating target-sample vocabulary must outrank a doc of
    vocabulary the target never uses."""
    rows = []
    # doc_ids 1..400: ~20 land in the target sample (hash-gated).
    for i in range(1, 401):
        rows.append((i, "alpha beta gamma delta " * 5))
    # Two probe docs guaranteed OUTSIDE the target gate are appended
    # below; find two non-target ids past the range.
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    non_target = [
        r["doc_id"]
        for r in docs.select("doc_id").where(~_target_gate()).limit(2).collect()
    ]
    a, b = non_target
    docs = docs.where(~F.col("doc_id").isin([a, b])).unionByName(
        spark.createDataFrame(
            [(a, "alpha beta gamma delta " * 5),
             (b, "zork quux blorp fnord " * 5)],
            "doc_id long, text string",
        )
    )
    out = {r["doc_id"]: r["mean_lift_ppm"] for r in dsir_select_topk(docs, spark).collect()}
    # The lookalike is selected and beats the out-of-distribution doc
    # (which shares no vocabulary with the target sample).
    assert a in out
    assert b not in out or out[a] > out[b]


def test_fuzzy_join_sides_disjoint_and_threshold(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    out = minhash_fuzzy_join(docs).collect()
    probe_ids = {
        r["doc_id"] for r in docs.select("doc_id").where(_probe_gate()).collect()
    }
    for r in out:
        assert r["query_doc"] in probe_ids
        assert r["corpus_doc"] not in probe_ids
        assert r["jaccard"] >= 0.4 - 1e-6


def test_fuzzy_join_finds_planted_match(spark):
    """A corpus doc sharing most shingles with a probe doc must match;
    an unrelated doc must not."""
    # Long base + one-word tail: shingle Jaccard 28/29 ≈ 0.97, so a
    # band collision is near-certain (P ≈ 1 - (1 - 0.97^4)^4) — the
    # planted pair tests the cross-table path, not LSH luck.
    base = (
        "alpha bravo charlie delta echo foxtrot golf hotel india juliet "
        "kilo lima mike november oscar papa quebec romeo sierra tango "
        "uniform victor whiskey xray yankee zulu amber birch cedar dune"
    )
    rows = [(i, f"unrelated filler text number {i} with its own words "
                f"entirely disjoint vocabulary item {i}") for i in range(100, 160)]
    probe_id = None
    # Find an id inside the probe gate deterministically.
    docs0 = spark.createDataFrame(
        [(i, "x") for i in range(1, 160)], "doc_id long, text string"
    )
    gated = {r["doc_id"] for r in docs0.where(_probe_gate()).collect()}
    assert gated, "no probe-gated id in 1..159"
    probe_id = min(gated)
    partner = next(i for i in range(100, 160) if i not in gated)
    rows = [r for r in rows if r[0] != partner]
    docs = spark.createDataFrame(
        rows + [(probe_id, base), (partner, base + " tail")],
        "doc_id long, text string",
    )
    out = minhash_fuzzy_join(docs).collect()
    pairs = {(r["query_doc"], r["corpus_doc"]) for r in out}
    assert (probe_id, partner) in pairs


def test_shard_manifest_offsets_and_positions(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    out = corpus_shard_manifest(docs).collect()
    assert len(out) == docs.count()
    by_shard: dict[int, list] = {}
    for r in out:
        assert 0 <= r["shard"] < N_SHARDS
        by_shard.setdefault(r["shard"], []).append(r)
    for shard, rows in by_shard.items():
        rows.sort(key=lambda r: r["pos"])
        assert [r["pos"] for r in rows] == list(range(1, len(rows) + 1))
        offset = 0
        for r in rows:
            assert r["byte_offset"] == offset
            offset += r["n_chars"] + 1


def test_shard_manifest_stable_under_appends(spark):
    """Appending docs never changes an existing doc's shard or the
    relative order of surviving docs within a shard."""
    old = spark.createDataFrame(
        [(i, 10 + i) for i in range(50)], "doc_id long, n_chars long"
    )
    new = old.unionByName(
        spark.createDataFrame(
            [(i, 7) for i in range(1000, 1020)], "doc_id long, n_chars long"
        )
    )
    before = {r["doc_id"]: r for r in corpus_shard_manifest(old).collect()}
    after = {r["doc_id"]: r for r in corpus_shard_manifest(new).collect()}
    for doc_id, r in before.items():
        assert after[doc_id]["shard"] == r["shard"]
    # Relative order within each shard is preserved (merge semantics).
    for shard in range(N_SHARDS):
        old_order = [
            d for d, r in sorted(before.items(), key=lambda kv: kv[1]["pos"])
            if r["shard"] == shard
        ]
        new_order = [
            d for d, r in sorted(after.items(), key=lambda kv: kv[1]["pos"])
            if r["shard"] == shard and d in before
        ]
        assert new_order == old_order
