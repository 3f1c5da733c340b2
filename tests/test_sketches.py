"""Sketch accuracy + mergeability. Parity for kmv_distinct_users is
covered by the oracle suite; these tests pin what parity can't —
estimates land near the exact truth, and HLL partial-union equals the
direct single-pass sketch (the re-aggregation contract)."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from mapreduce_lab_spark.operators.sketches import (
    cms_word_frequency,
    hll_union_users,
    kmv_distinct_users,
)
from mapreduce_lab_spark.sources.tables import load_table


def _exact(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    return {
        r["event_type"]: r["n"]
        for r in ev.groupBy("event_type")
        .agg(F.count_distinct("user_id").alias("n"))
        .collect()
    }


def test_kmv_estimates_within_error(spark, sf_dir):
    exact = _exact(spark, sf_dir)
    est = {r["event_type"]: r["est_users"]
           for r in kmv_distinct_users(load_table(spark, sf_dir, "events")).collect()}
    assert set(est) == set(exact)
    for t, n in exact.items():
        # k=256 → ~6% standard error; exact below k distinct values.
        tol = 0 if n < 256 else 0.2 * n
        assert abs(est[t] - n) <= tol, (t, est[t], n)


def test_hll_union_matches_direct_sketch_and_truth(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    exact = _exact(spark, sf_dir)
    merged = {r["event_type"]: r["approx_users"]
              for r in hll_union_users(ev).collect()}
    direct = {
        r["event_type"]: r["approx_users"]
        for r in ev.groupBy("event_type")
        .agg(F.hll_sketch_estimate(F.hll_sketch_agg("user_id")).alias("approx_users"))
        .collect()
    }
    # Merging daily partials must equal sketching the whole stream
    # (associativity of the union), and both must track the truth.
    assert merged == direct
    for t, n in exact.items():
        assert abs(merged[t] - n) <= max(2, 0.1 * n), (t, merged[t], n)


def test_cms_one_sided_error_under_forced_collisions(spark):
    # 200 distinct words in a deliberately tiny 2x16 sketch: collisions
    # are unavoidable, so the one-sided guarantee (never underestimate)
    # is exercised for real, and at least one probe must overestimate.
    # translate() maps digits to letters: the tokenizer splits on
    # non-letters, so 'w123' would otherwise collapse to 'w'.
    docs = spark.range(200).selectExpr(
        "repeat(concat('w', translate(CAST(id AS STRING), '0123456789', 'abcdefghij'), ' '),"
        " CAST(id % 7 + 1 AS INT)) AS text"
    )
    got = cms_word_frequency(docs, d=2, w=16, k=50).collect()
    assert len(got) == 50
    assert all(r["n_cms"] >= r["n_exact"] for r in got)
    assert any(r["n_cms"] > r["n_exact"] for r in got)
    # CMS bound: overestimate <= 2N/w with prob 1 - 2^-d; assert the
    # deterministic realized error stays within a loose multiple.
    n_total = sum(i % 7 + 1 for i in range(200))
    assert all(r["n_cms"] - r["n_exact"] <= 4 * n_total / 16 for r in got)


def test_cms_cells_merge_across_corpus_splits(spark):
    # Mergeability: sketching two halves and probing the cell-wise sum
    # must equal sketching the whole corpus (the rollup contract).
    docs = spark.range(300).selectExpr(
        "concat('alpha beta w', translate(CAST(id AS STRING), '0123456789', 'abcdefghij'),"
        " ' gamma') AS text"
    )
    whole = {r["word"]: r["n_cms"] for r in cms_word_frequency(docs, d=2, w=32, k=10).collect()}
    half1 = cms_word_frequency(docs.where("id < 150"), d=2, w=32, k=10)
    half2 = cms_word_frequency(docs.where("id >= 150"), d=2, w=32, k=10)
    merged = {}
    for df in (half1, half2):
        for r in df.collect():
            merged[r["word"]] = merged.get(r["word"], 0) + r["n_cms"]
    # The three all-document words are in every top-10; their merged
    # estimates must equal the whole-corpus estimates.
    for w_ in ("alpha", "beta", "gamma"):
        assert merged[w_] == whole[w_], (w_, merged[w_], whole.get(w_))


def test_sampled_quantiles_track_exact(spark, sf_dir):
    from mapreduce_lab_spark.operators.sketches import sampled_quantiles_prices

    orders = load_table(spark, sf_dir, "orders")
    est = {r["o_orderpriority"]: (r["est_median"], r["est_p90"])
           for r in sampled_quantiles_prices(orders).collect()}
    exact = {
        r["o_orderpriority"]: (r["m"], r["p"])
        for r in orders.groupBy("o_orderpriority").agg(
            F.expr("percentile(o_totalprice, 0.5)").alias("m"),
            F.expr("percentile(o_totalprice, 0.9)").alias("p"),
        ).collect()
    }
    assert set(est) == set(exact)
    for pri, (m, p) in exact.items():
        # rank error ~1/sqrt(k) with k=512; groups under k are exact-sample.
        assert abs(est[pri][0] - m) <= 0.25 * m, (pri, est[pri][0], m)
        assert abs(est[pri][1] - p) <= 0.25 * p, (pri, est[pri][1], p)


def test_sampled_quantiles_merge_exactly(spark, sf_dir):
    # Mergeability: the bottom-k sample of the whole equals the
    # bottom-k of the union of both halves' bottom-k samples, so
    # sketching halves and re-sketching the union gives the SAME
    # estimates as one pass over everything.
    from mapreduce_lab_spark.operators.sketches import QSK_K, sampled_quantiles_prices
    from mapreduce_lab_spark.functions.hashing import hex8_int

    orders = load_table(spark, sf_dir, "orders")
    whole = sorted(tuple(r) for r in sampled_quantiles_prices(orders).collect())

    h = hex8_int(F.col("o_orderkey").cast("string"))
    halves = [
        orders.where(F.pmod(F.col("o_orderkey"), F.lit(2)) == i) for i in (0, 1)
    ]
    partials = [
        half.withColumn("_h", h)
        .withColumn(
            "_rn",
            F.row_number().over(
                Window.partitionBy("o_orderpriority").orderBy("_h", "o_orderkey")
            ),
        )
        .where(F.col("_rn") <= QSK_K)
        .drop("_h", "_rn")
        for half in halves
    ]
    merged = sorted(
        tuple(r)
        for r in sampled_quantiles_prices(partials[0].unionByName(partials[1])).collect()
    )
    assert merged == whole


def test_hll_portable_tracks_truth(spark, sf_dir):
    """Portable HLL (p=8) estimates per type: linear-counting regime
    at the test SFs, so the estimate should be within a few % of the
    exact distinct count (exact at sf0.001's 15 users/type)."""
    from mapreduce_lab_spark.operators.sketches import hll_portable_users

    exact = _exact(spark, sf_dir)
    est = {r["event_type"]: r["est_users"]
           for r in hll_portable_users(load_table(spark, sf_dir, "events")).collect()}
    assert set(est) == set(exact)
    for t, n in exact.items():
        assert abs(est[t] - n) <= max(2, 0.1 * n), (t, est[t], n)


def test_hll_portable_daily_partials_equal_direct(spark, sf_dir):
    """The re-aggregation contract: registers built per day then
    max-merged must equal registers built in one pass (register max is
    associative), so the estimates are identical."""
    from mapreduce_lab_spark.operators.sketches import (
        _HLL_W_BITS,
        _HLL_W_MOD,
        hll_portable_users,
    )
    from mapreduce_lab_spark.functions.hashing import hex8_int

    ev = load_table(spark, sf_dir, "events")
    h = hex8_int(F.col("user_id").cast("string"))
    hashed = ev.select(
        "event_type",
        (h / _HLL_W_MOD).cast("long").alias("bucket"),
        (h % _HLL_W_MOD).alias("w"),
    )
    rank = F.when(F.col("w") == 0, _HLL_W_BITS + 1).otherwise(
        _HLL_W_BITS + 1 - F.length(F.bin(F.col("w")))
    )
    # Register-by-register comparison: one-pass registers vs the
    # operator's day-partial -> max-merge path. This is the actual
    # re-aggregation contract — a merge bug that corrupts register
    # VALUES while preserving the occupied-bucket count would still
    # flip some (event_type, bucket, reg) row here.
    direct = (
        hashed.groupBy("event_type", "bucket")
        .agg(F.max(rank).alias("reg"))
    )
    daily_merged = (
        ev.select(
            "event_type",
            F.to_date("ts").alias("day"),
            (h / _HLL_W_MOD).cast("long").alias("bucket"),
            (h % _HLL_W_MOD).alias("w"),
        )
        .groupBy("event_type", "day", "bucket")
        .agg(F.max(rank).alias("reg"))
        .groupBy("event_type", "bucket")
        .agg(F.max("reg").alias("reg"))
    )
    one_pass = {(r["event_type"], r["bucket"]): r["reg"] for r in direct.collect()}
    via_days = {(r["event_type"], r["bucket"]): r["reg"] for r in daily_merged.collect()}
    assert one_pass == via_days
    # Identical registers => identical estimates, through the
    # operator's own raw/linear-counting branch (not an unconditional
    # linear-count re-derivation, which would be the wrong comparator
    # once a larger SF leaves the linear regime).
    import math

    from mapreduce_lab_spark.operators.sketches import (
        _HLL_ALPHA_M2,
        _HLL_LINEAR_MAX,
        HLL_M,
    )

    est_direct = {}
    for t in {k[0] for k in one_pass}:
        regs = [v for k, v in one_pass.items() if k[0] == t]
        n_occ = len(regs)
        s = sum(2.0 ** -r for r in regs) + (HLL_M - n_occ)
        raw = _HLL_ALPHA_M2 / s
        v_empty = HLL_M - n_occ
        if raw <= _HLL_LINEAR_MAX and v_empty > 0:
            est_direct[t] = math.floor(HLL_M * math.log(HLL_M / v_empty))
        else:
            est_direct[t] = math.floor(raw)
    est_daily = {r["event_type"]: r["est_users"] for r in hll_portable_users(ev).collect()}
    assert est_daily == est_direct, (est_daily, est_direct)


def test_hll_portable_linear_counting_floor_gaps():
    """Pin the ULP-safety claim: over all possible empty-register
    counts V, m*ln(m/V) never comes within 1e-4 of an integer, so a
    cross-libm ln divergence (~1e-11 absolute here) cannot flip the
    floor(). V=256 is exact zero in both engines (ln(1))."""
    import math

    m = 256
    worst = min(
        abs(m * math.log(m / v) - round(m * math.log(m / v)))
        for v in range(1, 256)
    )
    assert worst > 1e-4, worst


def test_kmv_overlap_exact_when_union_fits_sketch(spark):
    """Two tiny corpora whose shingle-set union is far below k: the
    sketch IS the full set, so union/intersection/Jaccard are exact."""
    from mapreduce_lab_spark.operators.sketches import kmv_corpus_overlap

    # 12-token docs -> 10 distinct shingles each; overlap by shared text.
    shared = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    docs = spark.createDataFrame(
        [
            (1, shared + " lambda mu", "A", "en", 1),
            (2, shared + " nu xi", "B", "en", 1),
        ],
        "doc_id long, text string, source string, lang string, n_chars long",
    )
    out = kmv_corpus_overlap(docs).collect()
    assert len(out) == 1
    row = out[0]
    # Exact sets: each doc has 10 shingles, 8 shared (the shingles
    # fully inside the common prefix), union = 12.
    assert row["union_est"] == 12
    assert row["jaccard_ppm"] == 8 * 1_000_000 // 12
    assert row["inter_est"] == 8


def test_kmv_overlap_estimates_track_exact_at_sf(spark, sf_dir):
    """At sf0.01 the per-source unions (~2.3-2.8k shingles) exceed
    k=256, so the estimator is genuinely exercised; with k=256 the
    standard error is ~1/sqrt(k) ~ 6%, so demand union within 25% and
    Jaccard within 0.05 absolute on every pair (loose enough for the
    k-th-value tail, tight enough to catch a broken estimator)."""
    import duckdb

    from mapreduce_lab_spark.operators.sketches import kmv_corpus_overlap
    from mapreduce_lab_spark.sources.tables import load_table

    est = {
        (r["source_a"], r["source_b"]): r
        for r in kmv_corpus_overlap(load_table(spark, sf_dir, "documents")).collect()
    }
    exact = {
        (r[0], r[1]): (r[2], r[3])
        for r in duckdb.sql(
            f"""
            WITH t AS (
              SELECT source,
                     [x for x in regexp_split_to_array(text, '[^\\p{{L}}]+')
                      if x <> ''] AS tk
              FROM '{sf_dir}/documents.parquet'
            ), sh AS (
              SELECT DISTINCT source,
                     unnest(CASE WHEN len(tk) >= 3
                            THEN [tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2]
                                  for i in range(1, len(tk) - 1)]
                            ELSE [array_to_string(tk, ' ')] END) AS s
              FROM t
            ), card AS (SELECT source, count(*) AS c FROM sh GROUP BY source)
            SELECT x.source, y.source,
                   count(*) AS inter, cx.c + cy.c - count(*) AS uni
            FROM sh x JOIN sh y ON x.s = y.s AND x.source < y.source
            JOIN card cx ON cx.source = x.source
            JOIN card cy ON cy.source = y.source
            GROUP BY 1, 2, cx.c, cy.c
            """
        ).fetchall()
    }
    assert est, "no pairs"
    checked = 0
    for pair, row in est.items():
        if pair not in exact:
            continue  # zero-intersection pair absent from the equi-join
        i_exact, u_exact = exact[pair]
        assert abs(row["union_est"] - u_exact) / u_exact < 0.25, (pair, row, u_exact)
        assert abs(row["jaccard_ppm"] / 1e6 - i_exact / u_exact) < 0.05, (
            pair, row, i_exact / u_exact,
        )
        checked += 1
    assert checked >= 100  # nearly every pair overlaps at sf0.01
