"""Planted-data tests for the corpus-hygiene operators.

The registered queries run against the synthetic corpus (letters-only,
no contamination) via test_oracle_parity; these tests plant actual PII
and benchmark overlap so the nonzero paths are pinned.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from mapreduce_lab_spark.operators.contamination import (
    BENCH_MOD,
    benchmark_overlap,
    ngrams8,
    pii_redact,
)
from mapreduce_lab_spark.functions.hashing import hex8_int


def test_pii_redact_planted(spark):
    docs = spark.createDataFrame(
        [
            (1, "contact me at alice@example.com or bob.smith@corp.co.uk today"),
            (2, "server 192.168.1.100 and 10.0.0.1 are up"),
            (3, "call 555-123-4567 or 555 987 6543 now"),
            (4, "no pii here at all"),
            (5, "mixed: a@b.io from 8.8.8.8 dialing 555-000-1111"),
        ],
        ["doc_id", "text"],
    )
    rows = {r["doc_id"]: r for r in pii_redact(docs).collect()}
    assert (rows[1]["n_emails"], rows[1]["n_ips"], rows[1]["n_phones"]) == (2, 0, 0)
    assert (rows[2]["n_emails"], rows[2]["n_ips"], rows[2]["n_phones"]) == (0, 2, 0)
    assert (rows[3]["n_emails"], rows[3]["n_ips"], rows[3]["n_phones"]) == (0, 0, 2)
    assert (rows[4]["n_emails"], rows[4]["n_ips"], rows[4]["n_phones"]) == (0, 0, 0)
    assert (rows[5]["n_emails"], rows[5]["n_ips"], rows[5]["n_phones"]) == (1, 1, 1)


def test_pii_redact_rewrites_text(spark):
    docs = spark.createDataFrame(
        [(1, "mail a@b.co or 10.0.0.1 x 555-123-4567")], ["doc_id", "text"]
    )
    redacted = F.col("text")
    from mapreduce_lab_spark.operators.contamination import _PII_PASSES

    for pat, token in _PII_PASSES:
        redacted = F.regexp_replace(redacted, pat, token)
    out = docs.select(redacted.alias("r")).collect()[0]["r"]
    assert out == "mail <EMAIL> or <IP> x <PHONE>"


def test_ngrams8_short_doc_empty(spark):
    docs = spark.createDataFrame(
        [(1, "only seven tokens are in this doc"), (2, "now this one has exactly eight tokens yes")],
        ["doc_id", "text"],
    )
    from mapreduce_lab_spark.functions.text import tokenize

    staged = docs.select("doc_id", tokenize(F.col("text")).alias("tk"))
    rows = {
        r["doc_id"]: r["ng"]
        for r in staged.select("doc_id", ngrams8(F.col("tk")).alias("ng")).collect()
    }
    assert rows[1] == []
    assert rows[2] == ["now this one has exactly eight tokens yes"]


def _bench_doc_id(spark):
    """Find small doc_ids on each side of the benchmark gate."""
    ids = spark.range(0, 200).select(
        F.col("id").alias("doc_id"),
        (
            F.pmod(
                hex8_int(F.concat(F.lit("bench|"), F.col("id").cast("string"))),
                F.lit(BENCH_MOD),
            )
            == 0
        ).alias("is_bench"),
    )
    rows = ids.collect()
    bench = [r["doc_id"] for r in rows if r["is_bench"]]
    corpus = [r["doc_id"] for r in rows if not r["is_bench"]]
    return bench, corpus


def test_benchmark_overlap_planted(spark):
    bench_ids, corpus_ids = _bench_doc_id(spark)
    bench_id = bench_ids[0]
    hit_id, clean_id, short_id = corpus_ids[0], corpus_ids[1], corpus_ids[2]
    eval_text = "the quick brown fox jumps over the lazy dog again"
    docs = spark.createDataFrame(
        [
            (bench_id, eval_text),
            # shares the full 8-gram window with the benchmark doc
            (hit_id, "prefix words " + eval_text + " suffix words"),
            (clean_id, "a completely different document with plenty of tokens to spare here"),
            (short_id, "too short for any"),
        ],
        ["doc_id", "text"],
    )
    out = {r["doc_id"]: r["n_hit_ngrams"] for r in benchmark_overlap(docs).collect()}
    assert hit_id in out and out[hit_id] >= 1
    assert clean_id not in out
    assert short_id not in out
    assert bench_id not in out  # benchmark docs are not reported


def test_dup_span_fraction_planted(spark):
    from mapreduce_lab_spark.operators.contamination import dup_span_fraction

    shared = " ".join(f"w{i}" for i in range(13))  # exactly one 13-gram
    docs = spark.createDataFrame(
        [
            (1, shared + " unique tail one alpha beta gamma delta epsilon zeta eta theta iota"),
            (2, shared + " other ending two kappa lam mu nu xi omicron pi rho sigma"),
            (3, "completely different text " + " ".join(f"z{i}" for i in range(20))),
            (4, "short doc"),  # < 13 tokens: no spans, absent from output
        ],
        ["doc_id", "text"],
    )
    rows = {r["doc_id"]: r for r in dup_span_fraction(docs).collect()}
    assert set(rows) == {1, 2, 3}
    # Docs 1 and 2 share exactly the one leading 13-gram; every other
    # span contains a word unique to its doc.
    for d in (1, 2):
        assert rows[d]["n_dup"] == 1, rows[d]
        assert rows[d]["n_spans"] == 13  # 25 tokens -> 13 span positions
        assert abs(rows[d]["dup_frac"] - 1 / 13) < 1e-6
    assert rows[3]["n_dup"] == 0 and rows[3]["dup_frac"] == 0.0


# --- dup_token_coverage ------------------------------------------------------


def _coverage_rows(spark, docs):
    from mapreduce_lab_spark.operators.contamination import dup_token_coverage

    df = spark.createDataFrame(docs, ["doc_id", "text"])
    return {r["doc_id"]: r for r in dup_token_coverage(df).collect()}


def test_dup_token_coverage_merges_overlapping_spans(spark):
    """Two docs sharing a 20-token block: the block carries 8
    overlapping duplicated 13-gram spans whose union is exactly the
    20 tokens — interval merging must report 20, not 8*13."""
    block = " ".join(f"s{i}" for i in range(20))
    docs = [
        (1, block + " " + " ".join(f"a{i}" for i in range(10))),
        (2, " ".join(f"b{i}" for i in range(5)) + " " + block),
    ]
    got = _coverage_rows(spark, docs)
    assert got[1]["n_tokens"] == 30 and got[1]["dup_tokens"] == 20
    assert got[2]["n_tokens"] == 25 and got[2]["dup_tokens"] == 20
    assert abs(got[1]["dup_token_frac"] - 20 / 30) < 1e-5


def test_dup_token_coverage_ignores_within_doc_repeats(spark):
    """A span repeated only WITHIN one doc is not cross-doc duplicated."""
    block = " ".join(f"r{i}" for i in range(13))
    docs = [
        (1, block + " " + block),
        (2, " ".join(f"u{i}" for i in range(30))),
    ]
    assert _coverage_rows(spark, docs) == {}


def test_dup_token_coverage_disjoint_islands_sum(spark):
    """Two separated shared blocks in one doc: coverage sums the two
    islands without bridging the gap between them."""
    b1 = " ".join(f"p{i}" for i in range(13))
    b2 = " ".join(f"q{i}" for i in range(13))
    gap = " ".join(f"g{i}" for i in range(7))
    docs = [(1, b1 + " " + gap + " " + b2), (2, b1), (3, b2)]
    got = _coverage_rows(spark, docs)
    assert got[1]["dup_tokens"] == 26
    assert got[1]["n_tokens"] == 33


# --- remove_dup_spans --------------------------------------------------------


def test_remove_dup_spans_excises_planted_block(spark):
    """Two docs share one 13-token block: removal excises exactly the
    block from both (kept tokens preserve order), an unrelated doc
    passes through untouched, and a fully-covered doc empties."""
    from mapreduce_lab_spark.operators.contamination import remove_dup_spans

    block = " ".join(f"x{c}" for c in "abcdefghijklm")  # 13 tokens
    pre = " ".join(f"p{c}" for c in "abcde")
    post = " ".join(f"q{c}" for c in "abcde")
    other = " ".join(f"z{c}" for c in "abcdefghij")
    docs = spark.createDataFrame(
        [
            (1, pre + " " + block + " " + post),
            (2, block),
            (3, other),
        ],
        "doc_id LONG, text STRING",
    )
    got = {r["doc_id"]: r for r in remove_dup_spans(docs).collect()}
    assert got[1]["n_tokens"] == 23 and got[1]["kept_tokens"] == 10
    assert got[1]["clean_text"] == pre + " " + post
    assert got[2]["n_tokens"] == 13 and got[2]["kept_tokens"] == 0
    assert got[2]["clean_text"] == ""
    assert got[3]["kept_tokens"] == 10 and got[3]["clean_text"] == other


def test_remove_dup_spans_is_consistent_with_coverage(spark, sf_dir):
    """kept_tokens must equal n_tokens minus dup_token_coverage's
    union-merged dup_tokens on every document of the real corpus."""
    from mapreduce_lab_spark.operators.contamination import (
        dup_token_coverage,
        remove_dup_spans,
    )
    from mapreduce_lab_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    cov = {
        r["doc_id"]: r["dup_tokens"] for r in dup_token_coverage(docs).collect()
    }
    for r in remove_dup_spans(docs).collect():
        assert r["n_tokens"] - r["kept_tokens"] == cov.get(r["doc_id"], 0), r
