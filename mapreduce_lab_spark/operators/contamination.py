"""Corpus-hygiene operators: benchmark decontamination + PII redaction.

Two safety passes every production training-data pipeline runs before
the mix is frozen:

- **Benchmark decontamination** — find corpus documents that share a
  verbatim token 8-gram with a held-out benchmark/eval set, so eval
  answers don't leak into training data. The standard construction
  (8-gram surface overlap, as published for GPT-3/PaLM/Llama data
  work) maps to a textbook Spark shape: the benchmark side is tiny
  relative to the corpus, so its distinct n-gram hash set is
  BROADCAST and the 100 TB corpus side never shuffles for the probe —
  the only shuffle is the final per-doc hit count (map-side
  combinable).
- **PII redaction** — scrub emails / IPv4s / phone-shaped numbers
  with typed placeholders and report per-doc match counts. Pure
  ``regexp_replace``/``regexp_extract_all`` scalar expressions: zero
  shuffle, whole-stage codegen, embarrassingly parallel — the ideal
  100 TB shape. Patterns are restricted to syntax with identical
  semantics in Java regex (Spark) and RE2 (DuckDB oracle): character
  classes, bounded repetition, ASCII ``\\b``.

The reference has no hygiene operators (its workload is fixed
whole-corpus MapReduce, ``test.sh:70-107``); this is superset surface
required by the training-pipeline mandate.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from mapreduce_lab_spark.functions.hashing import hex8_int, oracle_hex8_int
from mapreduce_lab_spark.functions.numeric import exact_ratio, oracle_exact_ratio
from mapreduce_lab_spark.functions.text import tokenize
from mapreduce_lab_spark.registry import query
from mapreduce_lab_spark.sources.tables import fan_out, load_table

# --- benchmark decontamination ----------------------------------------------

NGRAM_N = 8
# Held-out "benchmark" slice: 1-in-20 documents by salted content hash
# (stands in for an external eval set; membership is deterministic so
# the oracle reproduces it exactly).
BENCH_MOD = 20

_ORACLE_TOKENS = "[t for t in regexp_split_to_array(text, '[^\\p{L}]+') if t <> '']"
_ORACLE_NGRAMS8 = """
    CASE WHEN len(tk) >= 8
         THEN list_distinct([tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2] || ' '
                             || tk[i+3] || ' ' || tk[i+4] || ' ' || tk[i+5] || ' '
                             || tk[i+6] || ' ' || tk[i+7]
                             for i in range(1, len(tk) - 6)])
         ELSE [] END
""".strip()


def ngrams8(toks: Column) -> Column:
    """Distinct token 8-grams over a PRE-STAGED token-array column;
    empty for docs shorter than 8 tokens (a sub-8-token doc cannot
    carry an 8-gram, so it is trivially uncontaminated under this
    test).

    Takes the token array, not the text: tokenize is lambda-bearing,
    so codegen subexpression elimination skips it, and inlining it
    here made every reference (two ``size`` calls plus the in-lambda
    ``element_at``s) re-run split+filter per row — measured 1.3 s vs
    0.2 s staged at sf0.1 for this expression alone. Callers stage
    the array in a preceding select."""
    grams = F.transform(
        F.sequence(F.lit(1), F.size(toks) - (NGRAM_N - 1)),
        lambda i: F.concat_ws(
            " ", *[F.element_at(toks, i + j) for j in range(NGRAM_N)]
        ),
    )
    return F.array_distinct(
        F.when(F.size(toks) >= NGRAM_N, grams).otherwise(
            F.array().cast("array<string>")
        )
    )


def _bench_gate() -> Column:
    return (
        F.pmod(
            hex8_int(F.concat(F.lit("bench|"), F.col("doc_id").cast("string"))),
            F.lit(BENCH_MOD),
        )
        == 0
    )


_O_BENCH_EXPR = "'bench|' || doc_id::VARCHAR"
_O_BENCH_GATE = f"{oracle_hex8_int(_O_BENCH_EXPR)} % {BENCH_MOD} = 0"


def benchmark_overlap(docs: DataFrame) -> DataFrame:
    """Corpus documents sharing >= 1 token 8-gram with the benchmark
    slice, with the count of distinct overlapping 8-grams.

    Plan: both sides reduce 8-grams to 32-bit hashes (the shuffle and
    the broadcast carry 8-byte longs, never n-gram text; both engines
    hash identically, so any collision affects both equally). The
    benchmark side — tiny by construction, as real eval sets are — is
    collapsed to a DISTINCT hash set and **broadcast**; the corpus
    side is a narrow explode→broadcast-hash-join→partial-agg count.
    At 100 TB the corpus never shuffles to discover contamination;
    the only exchange is the per-doc count (map-side combined).

    explode_OUTER, deliberately (r13, the "parity tax" postmortem):
    a plain explode lets InferFiltersFromGenerate synthesize
    ``size(ng) > 0`` and push the ENTIRE 8-gram construction below
    the fan_out exchange onto the parquet scan — where it runs once
    per branch at the scan's own (single-split) parallelism before
    the real gram build runs again post-exchange. That, not the md5,
    was the whole 72 s sim entry: 41.4 s -> 3.9 s warm at
    sf0.1/local[32] from this one-word change. The outer explode
    emits a NULL gram for sub-8-token docs; md5(NULL) is NULL and the
    inner hash-join drops it, so the result is unchanged (the
    benchmark side's distinct may carry one NULL key that can never
    equi-match). At 100 TB the inferred filter is equally wasteful —
    nearly every document has >= 8 tokens, so it filters nothing and
    doubles the most expensive expression in the plan.
    """
    with_grams = docs.select(
        "doc_id", tokenize(F.col("text")).alias("_tk")
    ).select("doc_id", _bench_gate().alias("is_bench"), ngrams8(F.col("_tk")).alias("ng"))
    hashed = with_grams.select(
        "doc_id", "is_bench", F.explode_outer("ng").alias("g")
    ).select("doc_id", "is_bench", hex8_int(F.col("g")).alias("h"))
    bench = hashed.filter("is_bench").select("h").distinct()
    corpus = hashed.filter(~F.col("is_bench")).select("doc_id", "h")
    return (
        corpus.join(F.broadcast(bench), "h")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_hit_ngrams"))
    )


@query(
    "decontaminate_benchmark_overlap",
    oracle=f"""
    WITH g AS (
      SELECT doc_id, {_O_BENCH_GATE} AS is_bench, {_ORACLE_NGRAMS8} AS ng
      FROM (SELECT doc_id, text, {_ORACLE_TOKENS} AS tk FROM documents)
    ), h AS (
      SELECT doc_id, is_bench, {oracle_hex8_int("s")} AS h
      FROM (SELECT doc_id, is_bench, unnest(ng) AS s FROM g)
    ), bench AS (
      SELECT DISTINCT h FROM h WHERE is_bench
    )
    SELECT doc_id, count(*) AS n_hit_ngrams
    FROM h JOIN bench USING (h)
    WHERE NOT is_bench
    GROUP BY doc_id
    """,
)
def q_decontaminate_benchmark_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """8-gram benchmark decontamination over the documents table.

    The benchmark slice is the 1-in-20 salted-hash sample (a stand-in
    for an external eval set — in production this input is a separate
    tiny table, which only strengthens the broadcast posture). Output:
    every non-benchmark document that shares at least one verbatim
    token 8-gram with the benchmark, with its distinct-overlap count —
    the rows a curation pipeline drops or audits.
    """
    docs = fan_out(load_table(spark, sf_dir, "documents"), spark)
    return benchmark_overlap(docs)


# --- cross-document duplicated-span fraction ---------------------------------

SPAN_N = 13  # the published benchmark-contamination span length


def span13_hashes(toks: Column) -> Column:
    """Positional (non-distinct) token 13-gram hashes over a
    PRE-STAGED token-array column; empty for short docs. Positional
    because the output measures what FRACTION of the document's span
    positions is duplicated elsewhere — a repeated boilerplate block
    must count every position it covers. Takes the token array, not
    the text, for the same staging reason as ``ngrams8``."""
    grams = F.transform(
        F.sequence(F.lit(1), F.size(toks) - (SPAN_N - 1)),
        lambda i: F.concat_ws(" ", F.slice(toks, i, SPAN_N)),
    )
    return F.when(F.size(toks) >= SPAN_N, grams).otherwise(
        F.array().cast("array<string>")
    )


def dup_span_fraction(docs: DataFrame) -> DataFrame:
    """Per-document fraction of 13-gram positions whose span also
    appears in at least one OTHER document — the cross-doc
    counterpart of the within-doc repetition scores in textstats.py
    (Gopher-style filters use both).

    Plan: spans reduce to 32-bit hashes immediately (shuffles carry
    8-byte longs, never text), then collapse to ONE row per
    (hash, doc) carrying its position count; the cross-doc spread is
    an unordered window count over the hash partition, so the whole
    operator is scan → agg → window → agg on compact long rows with
    NO self-join. Earlier formulations fed the exploded rows to two
    consumers (a per-span aggregate plus a join back), and because
    Catalyst prunes each branch differently the subtrees never
    canonicalize equal — no ReusedExchange — so the CPU-heavy
    13-gram explode scanned and computed TWICE per run (measured 2x
    on the r3 cold path; the window form is structurally single-scan
    and cut cold 3.2s -> 1.0s, warm 1.5s -> 0.9s at sf0.1/local[32]).
    The window partition key is a hash with bounded per-key fanout in
    natural text; a pathological hot span (a boilerplate line across
    millions of docs) makes one big COUNT partition of 16-byte rows —
    still orders of magnitude lighter than the text join it replaces.
    """
    sh = (
        docs.select("doc_id", tokenize(F.col("text")).alias("_tk"))
        .select("doc_id", F.explode(span13_hashes(F.col("_tk"))).alias("s"))
        .select("doc_id", hex8_int(F.col("s")).alias("g"))
    )
    # One row per (span hash, doc) with its position count: the single
    # materialization everything downstream consumes.
    gd = sh.groupBy("g", "doc_id").agg(F.count("*").alias("npos"))
    nd = F.count("*").over(Window.partitionBy("g"))  # rows are distinct docs
    return (
        gd.withColumn("nd", nd)
        .groupBy("doc_id")
        .agg(
            F.sum("npos").alias("n_spans"),
            F.sum(F.when(F.col("nd") > 1, F.col("npos")).otherwise(0)).alias("n_dup"),
        )
        .select(
            "doc_id",
            "n_spans",
            "n_dup",
            exact_ratio(F.col("n_dup"), F.col("n_spans")).alias("dup_frac"),
        )
    )


_ORACLE_SPANS13 = f"""
    CASE WHEN len(tk) >= {SPAN_N}
         THEN [array_to_string(list_slice(tk, i, i + {SPAN_N - 1}), ' ')
               for i in range(1, len(tk) - {SPAN_N - 2})]
         ELSE [] END
""".strip()


@query(
    "dup_span_fraction_13gram",
    oracle=f"""
    WITH tk AS (SELECT doc_id, {_ORACLE_TOKENS} AS tk FROM documents),
    sh AS (
      SELECT doc_id, {oracle_hex8_int("s")} AS g
      FROM (SELECT doc_id, unnest({_ORACLE_SPANS13}) AS s FROM tk)
    ),
    per_span AS (SELECT g, count(DISTINCT doc_id) AS nd FROM sh GROUP BY g)
    SELECT doc_id, count(*) AS n_spans,
           CAST(sum(CASE WHEN nd > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup,
           {oracle_exact_ratio("sum(CASE WHEN nd > 1 THEN 1 ELSE 0 END)", "count(*)")}
               AS dup_frac
    FROM sh JOIN per_span USING (g)
    GROUP BY doc_id
    """,
)
def q_dup_span_fraction_13gram(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = fan_out(load_table(spark, sf_dir, "documents"), spark)
    return dup_span_fraction(docs)


# --- PII redaction -----------------------------------------------------------

# Patterns use only Java-regex/RE2-common syntax (verified to agree on
# the planted-PII unit corpus): no backreferences, no lookaround.
PII_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_IPV4_RE = r"\b(?:\d{1,3}\.){3}\d{1,3}\b"
PII_PHONE_RE = r"\b\d{3}[-. ]\d{3}[-. ]\d{4}\b"

# Replacement order matters (emails contain dots and digits); both
# engines apply the same sequence so outputs agree byte-for-byte.
_PII_PASSES = [
    (PII_EMAIL_RE, "<EMAIL>"),
    (PII_IPV4_RE, "<IP>"),
    (PII_PHONE_RE, "<PHONE>"),
]


def pii_redact(docs: DataFrame) -> DataFrame:
    """Per-document PII scrub: typed placeholders + match counts.

    Counts are taken on the ORIGINAL text (so `<IP>` inserted by the
    email pass can't be double-counted by later passes — both engines
    define counts identically); the redacted text is the sequential
    email→ip→phone rewrite. Shipped as md5 so the comparison (and at
    100 TB, the shuffle-free narrow scan shape) never moves full text.
    """
    redacted = F.col("text")
    for pat, token in _PII_PASSES:
        redacted = F.regexp_replace(redacted, pat, token)
    counts = {
        "n_emails": PII_EMAIL_RE,
        "n_ips": PII_IPV4_RE,
        "n_phones": PII_PHONE_RE,
    }
    return docs.select(
        "doc_id",
        *[
            F.size(F.regexp_extract_all(F.col("text"), F.lit(pat), 0))
            .cast("long")
            .alias(name)
            for name, pat in counts.items()
        ],
        F.md5(redacted).alias("redacted_md5"),
    )


_O_REDACTED = "text"
for _pat, _token in _PII_PASSES:
    _O_REDACTED = f"regexp_replace({_O_REDACTED}, '{_pat}', '{_token}', 'g')"


@query(
    "pii_redact_documents",
    oracle=f"""
    SELECT doc_id,
           CAST(len(regexp_extract_all(text, '{PII_EMAIL_RE}')) AS BIGINT) AS n_emails,
           CAST(len(regexp_extract_all(text, '{PII_IPV4_RE}')) AS BIGINT) AS n_ips,
           CAST(len(regexp_extract_all(text, '{PII_PHONE_RE}')) AS BIGINT) AS n_phones,
           md5({_O_REDACTED}) AS redacted_md5
    FROM documents
    """,
)
def q_pii_redact_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII redaction pass over the documents table.

    The synthetic corpus is letters-only, so counts are 0 and the md5
    equals the original's — the hash check still pins the full rewrite
    expression on every row cross-engine; the planted-PII unit test
    (tests/test_contamination.py) pins the nonzero behavior.
    """
    docs = fan_out(load_table(spark, sf_dir, "documents"), spark)
    return pii_redact(docs)


# --- duplicated-token coverage (interval-merged) -----------------------------


def _dup_islands(docs: DataFrame) -> DataFrame:
    """UNION-merged per-document intervals of cross-doc duplicated
    13-gram spans: (doc_id, island, n_tok, ms, me) with ms/me 1-based
    inclusive token positions. The shared core of the coverage metric
    (`dup_token_coverage`) and the removal transform
    (`remove_dup_spans`)."""
    sh = docs.select(
        "doc_id", tokenize(F.col("text")).alias("_tk")
    ).select(
        "doc_id",
        F.size("_tk").alias("n_tok"),
        F.posexplode(span13_hashes(F.col("_tk"))).alias("pos0", "s"),
    ).select(
        "doc_id", "n_tok", (F.col("pos0") + 1).alias("pos"), hex8_int(F.col("s")).alias("g")
    )
    gd = sh.groupBy("g", "doc_id").agg(
        F.first("n_tok").alias("n_tok"), F.collect_list("pos").alias("poss")
    )
    nd = F.count("*").over(Window.partitionBy("g"))  # rows are distinct docs
    iv = (
        gd.withColumn("nd", nd)
        .filter(F.col("nd") > 1)
        .select("doc_id", "n_tok", F.explode("poss").alias("s"))
        .withColumn("e", F.col("s") + F.lit(SPAN_N - 1))
    )
    w_prev = (
        Window.partitionBy("doc_id")
        .orderBy("s")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_run = (
        Window.partitionBy("doc_id")
        .orderBy("s")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        iv.withColumn("pme", F.max("e").over(w_prev))
        .withColumn(
            "new_island",
            F.when(F.col("pme").isNull() | (F.col("s") > F.col("pme")), 1).otherwise(0),
        )
        .withColumn("island", F.sum("new_island").over(w_run))
        .groupBy("doc_id", "island")
        .agg(
            F.first("n_tok").alias("n_tok"),
            F.min("s").alias("ms"),
            F.max("e").alias("me"),
        )
    )


def dup_token_coverage(docs: DataFrame) -> DataFrame:
    """Per-document fraction of TOKENS covered by cross-doc duplicated
    13-gram spans — the removal metric of suffix-array training-data
    dedup (Lee et al. 2021, arXiv:2107.06499): a token is "duplicated"
    if any 13-gram span starting at-or-before it and duplicated in
    another document covers it, so overlapping duplicated spans must
    be UNION-merged, not summed (summing double-counts every overlap;
    dup_span_fraction above counts span positions, this operator
    counts covered tokens).

    Plan shape: the span scan collapses to one compact row per
    (span-hash, doc) carrying its position list; the cross-doc test is
    an unordered window count over the hash partition (no self-join,
    same single-scan shape as dup_span_fraction); only positions of
    ACTUALLY-duplicated spans re-explode, and the interval union is
    the classic sweep — per-doc running max-end window, island ids by
    cumulative new-island flags, one aggregate per island (all in
    ``_dup_islands``). Everything after the first aggregate moves
    16-byte rows keyed by doc, so a 100 TB corpus pays the one span
    shuffle and then works on per-doc metadata.
    """
    return (
        _dup_islands(docs)
        .groupBy("doc_id")
        .agg(
            F.first("n_tok").cast("long").alias("n_tokens"),
            F.sum(F.col("me") - F.col("ms") + 1).alias("dup_tokens"),
        )
        .select(
            "doc_id",
            "n_tokens",
            "dup_tokens",
            exact_ratio(F.col("dup_tokens"), F.col("n_tokens")).alias("dup_token_frac"),
        )
    )


# Shared oracle CTE chain: tokens -> 13-gram span hashes -> cross-doc
# duplicated positions -> sweep-merged per-doc islands (`per`). Used by
# the coverage metric and the removal transform below.
_DUP_ISLAND_CTES = f"""tk AS (SELECT doc_id, {_ORACLE_TOKENS} AS tk FROM documents),
    sh AS (
      SELECT doc_id, len(tk) AS n_tok,
             unnest(range(1, greatest(len(tk) - {SPAN_N - 2}, 1))) AS pos
      FROM tk
    ), shg AS (
      SELECT sh.doc_id, sh.n_tok, sh.pos,
             {oracle_hex8_int(f"array_to_string(list_slice(tk.tk, sh.pos, sh.pos + {SPAN_N - 1}), ' ')")} AS g
      FROM sh JOIN tk ON sh.doc_id = tk.doc_id
    ), gd AS (
      SELECT g, doc_id, any_value(n_tok) AS n_tok, list(pos) AS poss
      FROM shg GROUP BY g, doc_id
    ), iv AS (
      SELECT doc_id, n_tok, unnest(poss) AS s, unnest(poss) + {SPAN_N - 1} AS e
      FROM (SELECT *, count(*) OVER (PARTITION BY g) AS nd FROM gd)
      WHERE nd > 1
    ), m AS (
      SELECT doc_id, n_tok, s, e,
             max(e) OVER (PARTITION BY doc_id ORDER BY s
                          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pme
      FROM iv
    ), isl AS (
      SELECT doc_id, n_tok, s, e,
             sum(CASE WHEN pme IS NULL OR s > pme THEN 1 ELSE 0 END)
               OVER (PARTITION BY doc_id ORDER BY s
                     ROWS UNBOUNDED PRECEDING) AS island
      FROM m
    ), per AS (
      SELECT doc_id, island, any_value(n_tok) AS n_tok,
             min(s) AS ms, max(e) AS me
      FROM isl GROUP BY doc_id, island
    )"""


@query(
    "dup_token_coverage_13gram",
    oracle=f"""
    WITH {_DUP_ISLAND_CTES}
    SELECT doc_id,
           CAST(any_value(n_tok) AS BIGINT) AS n_tokens,
           CAST(sum(me - ms + 1) AS BIGINT) AS dup_tokens,
           {oracle_exact_ratio("sum(me - ms + 1)", "any_value(n_tok)")} AS dup_token_frac
    FROM per GROUP BY doc_id
    """,
)
def q_dup_token_coverage_13gram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval-merged duplicated-token coverage over the documents
    table. Output: every document with at least one cross-doc
    duplicated 13-gram span, with its token count, union-merged
    duplicated-token count, and exact-floored coverage fraction."""
    docs = fan_out(load_table(spark, sf_dir, "documents"), spark)
    return dup_token_coverage(docs)


def remove_dup_spans(docs: DataFrame) -> DataFrame:
    """THE REMOVAL TRANSFORM: rewrite every document with its
    cross-doc duplicated 13-gram spans excised — the action
    `dup_token_coverage` only measures (Lee et al. 2021: cut every
    repeated span from the training corpus, keep the remainder).

    Plan shape: the island pipeline (`_dup_islands`) pays the one span
    shuffle; the rewrite side is a LEFT join of the corpus against
    per-doc interval metadata (a handful of 8-byte pairs per affected
    doc) followed by pure array expressions — at 100 TB the text
    column moves through exactly one narrow stage and never shuffles.
    A token is kept iff no merged island covers its 1-based position;
    the cleaned text is the kept tokens space-joined (the tokenized
    analog of the published character-range cut — tokenization is this
    engine's canonical text form). Documents with no duplicated span
    pass through with every token kept; a fully-covered document
    yields an empty string (count kept_tokens = 0), which is exactly
    the "drop it" signal downstream filters key on.
    """
    islands = _dup_islands(docs)
    ivs = islands.groupBy("doc_id").agg(
        F.collect_list(F.struct("ms", "me")).alias("ivs")
    )
    base = docs.select("doc_id", tokenize(F.col("text")).alias("tk"))
    no_ivs = F.array().cast("array<struct<ms:int,me:int>>")
    kept = F.when(
        F.size("tk") > 0,
        F.filter(
            F.sequence(F.lit(1), F.size("tk")),
            lambda i: ~F.exists(
                F.coalesce(F.col("ivs"), no_ivs),
                lambda v: (v["ms"] <= i) & (i <= v["me"]),
            ),
        ),
    ).otherwise(F.array().cast("array<int>"))
    return (
        base.join(ivs, "doc_id", "left")
        .select("doc_id", "tk", kept.alias("kept"))
        .select(
            "doc_id",
            F.size("tk").cast("long").alias("n_tokens"),
            F.size("kept").cast("long").alias("kept_tokens"),
            F.concat_ws(
                " ", F.transform("kept", lambda i: F.element_at(F.col("tk"), i))
            ).alias("clean_text"),
        )
    )


@query(
    "remove_dup_spans_13gram",
    oracle=f"""
    WITH {_DUP_ISLAND_CTES}, ivl AS (
      SELECT doc_id, list(struct_pack(ms := ms, me := me)) AS ivs
      FROM per GROUP BY doc_id
    )
    SELECT t.doc_id,
           CAST(len(t.tk) AS BIGINT) AS n_tokens,
           CAST(len(k.kept) AS BIGINT) AS kept_tokens,
           coalesce(array_to_string(list_transform(k.kept, i -> t.tk[i]), ' '), '')
             AS clean_text
    FROM tk t
    LEFT JOIN ivl ON t.doc_id = ivl.doc_id,
    LATERAL (
      SELECT list_filter(
               range(1, len(t.tk) + 1),
               i -> len(list_filter(coalesce(ivl.ivs, []),
                                    v -> v.ms <= i AND i <= v.me)) = 0
             ) AS kept
    ) k
    """,
)
def q_remove_dup_spans_13gram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicated-span removal over the documents table. Output: every
    document with its token count, kept-token count, and the cleaned
    (space-joined kept tokens) text."""
    docs = fan_out(load_table(spark, sf_dir, "documents"), spark)
    return remove_dup_spans(docs)
