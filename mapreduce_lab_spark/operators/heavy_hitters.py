"""Exact frequent-items (heavy hitters) via bounded-memory candidates.

Superset surface: "which tokens exceed φ of the corpus" — the query
behind stop-word lists, boilerplate detection, and hot-key discovery.
The naive answer (count every distinct token, filter) is exactly the
word count the reference computes (``plugin/word_count/wc.go:21-34``)
— fine when the vocabulary fits the shuffle, ruinous when the key
space is unbounded (URLs, n-grams, user ids at 100 TB).

Two-phase exact algorithm:

1. **Candidates** — one narrow pass running Misra-Gries summaries with
   k counters per partition (``mapInPandas``, Arrow batches, O(k)
   memory regardless of partition size). MG guarantees every item
   with local frequency > n_p/k survives partition p's summary; any
   global φ-heavy item (φ ≥ 1/k) is ≥ φ-heavy in at least one
   partition, so the union of partition summaries is a SUPERSET of
   the true heavy hitters. Candidate count is bounded by k·P —
   broadcastable by construction.
2. **Verify** — exact recount restricted to candidates: a broadcast
   semi-join gate on the token stream, a map-side-combinable count,
   and an integer threshold compare against the corpus total (one-row
   frame, broadcast cross join — no driver collect on the data path).

The result is EXACT (the sketch only generates candidates; counts
come from the verify pass), which is why a plain SQL oracle can check
it. Shuffle payload: one row per candidate token — never one per
distinct token, the whole point at an unbounded key space.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mapreduce_lab_spark.functions.text import tokenize
from mapreduce_lab_spark.operators.ngrams import _ORACLE_TOKENS
from mapreduce_lab_spark.registry import query
from mapreduce_lab_spark.sources.tables import fan_out, load_table

# The synthetic corpus has a small near-uniform vocabulary (~31 words
# at ~3.2-3.5% each); φ = 1/29 ≈ 3.45% cuts through the top of that
# distribution so the query returns a non-trivial strict subset at
# every scale factor (a φ above 3.6% matches nothing, below 3.2%
# matches everything).
HH_INV_PHI = 29  # heavy = frequency >= 1/29 of all tokens
HH_COUNTERS = 64  # MG counters per partition; must be >= HH_INV_PHI


def _words(docs: DataFrame) -> DataFrame:
    # Shared lowercase tokenizer (one definition per engine for the
    # whole text family — see functions/text.py and ngrams._ORACLE_TOKENS).
    return docs.select(F.explode(tokenize(F.lower(F.col("text")))).alias("word"))


def misra_gries_candidates(words: DataFrame, k: int = HH_COUNTERS) -> DataFrame:
    """Distinct per-partition Misra-Gries survivors (k counters)."""
    n_counters = int(k)

    def mg(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:  # noqa: F821
        import pandas as pd

        # Batched Misra-Gries via the mergeable-summaries MERGE
        # (Agarwal et al. 2013): fold each Arrow batch's EXACT counts
        # (vectorized value_counts — Python touches unique words, not
        # tokens) into the summary, then prune by subtracting the
        # (k+1)-th largest count from every counter. Each prune
        # decrements >= k+1 counters at once, so the total undercount
        # per element stays <= n_p/(k+1) — the same guarantee as
        # token-at-a-time MG, at pandas speed.
        counters: dict[str, int] = {}
        for pdf in batches:
            for w, c in pdf["word"].value_counts().items():
                counters[w] = counters.get(w, 0) + int(c)
            if len(counters) > n_counters:
                sub = sorted(counters.values(), reverse=True)[n_counters]
                counters = {w: c - sub for w, c in counters.items() if c > sub}
        yield pd.DataFrame({"word": list(counters.keys())})

    return words.mapInPandas(mg, schema="word string").distinct()


def heavy_hitters(words: DataFrame, inv_phi: int = HH_INV_PHI,
                  k: int = HH_COUNTERS) -> DataFrame:
    """Tokens with count * inv_phi >= total token count, with exact counts."""
    if k < inv_phi:
        raise ValueError(f"need k >= inv_phi for the superset guarantee ({k} < {inv_phi})")
    cand = misra_gries_candidates(words, k)
    counts = (
        words.join(F.broadcast(cand), "word", "left_semi")
        .groupBy("word")
        .agg(F.count("*").alias("n_word"))
    )
    total = words.agg(F.count("*").alias("_n_total"))
    return (
        counts.join(F.broadcast(total))
        .where(F.col("n_word") * F.lit(inv_phi) >= F.col("_n_total"))
        .select("word", "n_word")
    )


@query(
    "heavy_hitter_words",
    oracle=f"""
    WITH toks AS (
        SELECT unnest({_ORACLE_TOKENS}) AS word FROM documents
    ),
    tot AS (SELECT count(*) AS n_total FROM toks)
    SELECT word, count(*) AS n_word
    FROM toks, tot
    GROUP BY word, n_total
    HAVING count(*) * {HH_INV_PHI} >= n_total
    """,
)
def q_heavy_hitter_words(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus tokens at/above 1/29 ≈ 3.45% frequency, exact counts.

    The oracle is the unbounded-memory definition (count everything,
    filter) — the operator must reach the same set through the
    bounded candidate pass.
    """
    docs = fan_out(load_table(spark, sf_dir, "documents"), spark)
    return heavy_hitters(_words(docs))
