"""Text-analysis operators for a training-data pipeline.

The reference has exactly one text operation — the word tokenizer
(``plugin/word_count/wc.go:21-34``); this module is the superset a
100 TB document pipeline needs: token counting (whitespace + a BPE-ish
regex pre-tokenizer), quality scoring, n-gram language-ID, and content
fingerprinting.

Everything stays inside whole-stage codegen — per-document scalar
expressions only, no shuffle at all (narrow, embarrassingly parallel:
the ideal shape at scale), no Python in the hot path. Ratio outputs
use floor-scaled integer arithmetic (see ``functions/numeric.py``) so
the DuckDB oracle matches bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from mapreduce_lab_spark.functions.hashing import oracle_hex8_int
from mapreduce_lab_spark.functions.text import tokenize
from mapreduce_lab_spark.registry import query
from mapreduce_lab_spark.sources.tables import fan_out, load_table

# GPT-2-style pre-tokenizer, simplified: letter runs, digit runs, or a
# single non-letter/digit/space symbol per token.
BPE_RE = r"\p{L}+|\p{N}+|[^\p{L}\p{N}\s]"
PUNCT_RE = r"[^\p{L}\p{N}\s]"

STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "on", "for", "it")

# Marker stopwords per language for the n-gram/stopword language-ID
# heuristic. Scored langs in fixed alphabetical order; ties break to
# the alphabetically-first language, deterministically.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "de": ("der", "die", "und", "das", "ist", "nicht"),
    "en": ("the", "a", "of", "and", "is", "not"),
    "es": ("el", "los", "las", "y", "es", "no"),
    "fr": ("le", "la", "les", "et", "des", "ne"),
    "zh": ("的", "是", "不", "了", "在", "人"),
}

_ORACLE_TOKENS = "[t for t in regexp_split_to_array(text, '[^\\p{L}]+') if t <> '']"
_O_BPE_RE = BPE_RE
_O_TOKSUM = f"list_sum(list_transform({_ORACLE_TOKENS}, t -> len(t)))"
_O_NTOK = f"len({_ORACLE_TOKENS})"


def _floor_ratio(num: Column, den: Column, out_scale: int = 1_000_000) -> Column:
    return F.floor(num * F.lit(out_scale) / den) / F.lit(float(out_scale))


def _oracle_floor_ratio(num: str, den: str, out_scale: int = 1_000_000) -> str:
    return f"(floor(({num}) * {out_scale} / ({den})) / {float(out_scale)})"


def token_stats(docs: DataFrame) -> DataFrame:
    """Per-document token counts: whitespace, BPE-ish, and letter-run.

    The token array is staged (tokenize is lambda-bearing, so codegen
    CSE skips it; inlined it ran 3x per row — see gopher notes).
    """
    pre = docs.select(
        "doc_id", "text", tokenize(F.col("text")).alias("_tk")
    )
    toks = F.col("_tk")
    return pre.select(
        "doc_id",
        F.size(F.split(F.trim("text"), r"\s+")).alias("n_ws_tokens"),
        F.regexp_count("text", F.lit(BPE_RE)).alias("n_bpe_tokens"),
        F.size(toks).alias("n_letter_tokens"),
        _floor_ratio(
            F.aggregate(toks, F.lit(0), lambda acc, t: acc + F.length(t)),
            F.size(toks),
        ).alias("avg_token_len"),
    )


@query(
    "text_token_stats",
    oracle=f"""
    SELECT doc_id,
           len(regexp_split_to_array(trim(text), '\\s+')) AS n_ws_tokens,
           len(regexp_extract_all(text, '{_O_BPE_RE}')) AS n_bpe_tokens,
           len({_ORACLE_TOKENS}) AS n_letter_tokens,
           {_oracle_floor_ratio(_O_TOKSUM, _O_NTOK)} AS avg_token_len
    FROM documents
    """,
)
def q_text_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    return token_stats(fan_out(load_table(spark, sf_dir, "documents"), spark))


def quality_scores(
    docs: DataFrame, keep: tuple[str, ...] = (), with_n_tokens: bool = False
) -> DataFrame:
    """Heuristic per-document quality score in [0, 1].

    Components (all floor-scaled integer arithmetic, ``_m`` = milli):
    length score (tokens/100, capped), stopword ratio, punctuation
    ratio; composite = 0.4*len + 0.3*(1-stop) + 0.3*(1-punct).

    ``keep`` carries extra input columns through the projection so a
    consumer that needs them (the pipeline capstones need ``text``)
    stays SINGLE-LINEAGE instead of self-joining the scan on doc_id —
    the duplicate-scan shape the plan-hygiene sweep bounds.

    The token array is staged (tokenize is lambda-bearing, so codegen
    CSE skips it; inlined it ran 2x per row — see gopher notes).
    """
    pre = docs.select(
        *dict.fromkeys((*keep, "doc_id", "text")),
        tokenize(F.col("text")).alias("_tk"),
    )
    toks = F.col("_tk")
    n_tokens = F.size(toks)
    stop_cnt = F.size(F.filter(toks, lambda t: t.isin(*STOPWORDS)))
    punct_cnt = F.regexp_count("text", F.lit(PUNCT_RE))
    n_chars = F.length("text")
    len_m = F.least(F.lit(1000), F.floor(n_tokens * 1000 / F.lit(100)))
    stop_m = F.floor(stop_cnt * 1000 / n_tokens)
    punct_m = F.floor(punct_cnt * 1000 / n_chars)
    return pre.select(
        *keep,
        "doc_id",
        # ``with_n_tokens`` exposes the staged array's size so callers
        # that need the token count (the pipeline capstone) don't pay
        # a second tokenize pass over the corpus.
        *([n_tokens.alias("n_tokens")] if with_n_tokens else []),
        (stop_m / 1000.0).alias("stopword_ratio"),
        (punct_m / 1000.0).alias("punct_ratio"),
        (
            F.floor((4 * len_m + 3 * (1000 - stop_m) + 3 * (1000 - punct_m)) / F.lit(10))
            / 1000.0
        ).alias("quality_score"),
    )


_O_STOP = "list_filter(" + _ORACLE_TOKENS + ", t -> t IN ('" + "','".join(STOPWORDS) + "'))"


_QUALITY_ORACLE = f"""
    WITH c AS (
      SELECT doc_id,
             len({_ORACLE_TOKENS}) AS n_tokens,
             len({_O_STOP}) AS stop_cnt,
             len(regexp_extract_all(text, '[^\\p{{L}}\\p{{N}}\\s]')) AS punct_cnt,
             len(text) AS n_chars
      FROM documents
    )
    SELECT doc_id,
           floor(stop_cnt * 1000 / n_tokens) / 1000.0 AS stopword_ratio,
           floor(punct_cnt * 1000 / n_chars) / 1000.0 AS punct_ratio,
           floor((4 * least(1000, floor(n_tokens * 1000 / 100))
                  + 3 * (1000 - floor(stop_cnt * 1000 / n_tokens))
                  + 3 * (1000 - floor(punct_cnt * 1000 / n_chars))) / 10) / 1000.0
             AS quality_score
    FROM c
    """


@query("text_quality_scores", oracle=_QUALITY_ORACLE)
def q_text_quality_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    return quality_scores(fan_out(load_table(spark, sf_dir, "documents"), spark))


def lang_id(docs: DataFrame) -> DataFrame:
    """Stopword-marker language-ID: argmax marker-occurrence count.

    Checked by engine-vs-oracle parity (the synthetic corpus shares one
    vocabulary across its ``lang`` labels, so accuracy against the
    label is not the contract — determinism is).
    """
    # Stage the token array, then each marker score, then the argmax:
    # the filter lambdas are CSE-blind and the when-chain references
    # every score several times, so the inlined shape carried 35
    # copies of the tokenize in one Project (the same staging class as
    # gopher_quality_flags; mirrors the oracle's s/b CTE structure).
    toks = F.col("_lk")

    def marker_count(markers: tuple[str, ...]) -> Column:
        # NB: the filter lambda must take exactly one parameter —
        # pyspark passes the element index to a second parameter.
        return F.size(F.filter(toks, lambda t: t.isin(*markers)))

    langs = sorted(LANG_MARKERS)
    staged = docs.select(
        "doc_id", tokenize(F.lower(F.col("text"))).alias("_lk")
    ).select(
        "doc_id",
        *[marker_count(LANG_MARKERS[lg]).alias(f"_s_{lg}") for lg in langs],
    )
    scores = {lg: F.col(f"_s_{lg}") for lg in langs}
    best = F.greatest(*[scores[lg] for lg in langs])
    pred = F.lit(None).cast("string")
    for lg in reversed(langs):
        pred = F.when(scores[lg] == best, F.lit(lg)).otherwise(pred)
    return staged.select(
        "doc_id", pred.alias("predicted_lang"), best.alias("marker_hits")
    )


def _oracle_lang_score(markers: tuple[str, ...]) -> str:
    toks = "[t for t in regexp_split_to_array(lower(text), '[^\\p{L}]+') if t <> '']"
    return f"len(list_filter({toks}, t -> t IN ('" + "','".join(markers) + "')))"


_O_SCORES = {lg: _oracle_lang_score(m) for lg, m in LANG_MARKERS.items()}
_O_BEST = "greatest(" + ", ".join(f"s_{lg}" for lg in sorted(_O_SCORES)) + ")"
_O_PRED = (
    "CASE "
    + " ".join(f"WHEN s_{lg} = best THEN '{lg}'" for lg in sorted(_O_SCORES))
    + " END"
)


@query(
    "text_lang_id",
    oracle=f"""
    WITH s AS (
      SELECT doc_id,
             {', '.join(f'{sql} AS s_{lg}' for lg, sql in sorted(_O_SCORES.items()))}
      FROM documents
    ), b AS (
      SELECT doc_id, {_O_BEST} AS best, * FROM s
    )
    SELECT doc_id, {_O_PRED} AS predicted_lang, best AS marker_hits
    FROM b
    """,
)
def q_text_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    return lang_id(fan_out(load_table(spark, sf_dir, "documents"), spark))


def fingerprints(docs: DataFrame) -> DataFrame:
    """Content fingerprints: normalized-text md5 + min char-5-gram hash.

    The min-shingle-hash is MinHash with one permutation over 5-char
    sliding windows — a rolling-hash-style content fingerprint that
    survives small insertions (unlike the full-text md5).

    The normalized text is staged as a column before the shingle
    ``transform``: expressions under a lambda are re-evaluated per
    element, so the inlined shape re-ran lower+regexp_replace+trim
    once per character position (measured 1.2 s at sf0.1 vs 0.5 s
    staged, identical output).
    """
    pre = docs.select(
        "doc_id",
        F.trim(F.regexp_replace(F.lower(F.col("text")), r"\s+", " ")).alias("_norm"),
    )
    norm = F.col("_norm")
    shingles = F.when(
        F.length(norm) >= 5,
        F.transform(
            F.sequence(F.lit(1), F.length(norm) - 4),
            lambda i: norm.substr(i, F.lit(5)),
        ),
    ).otherwise(F.array(norm))
    min_shingle = F.array_min(
        F.transform(shingles, lambda s: F.conv(F.substring(F.md5(s), 1, 8), 16, 10).cast("long"))
    )
    return pre.select(
        "doc_id",
        F.md5(norm).alias("content_md5"),
        min_shingle.alias("min_shingle_hash"),
    )


@query(
    "doc_fingerprints",
    oracle=f"""
    WITH n AS (
      SELECT doc_id, trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS norm
      FROM documents
    )
    SELECT doc_id,
           md5(norm) AS content_md5,
           list_min(list_transform(
             CASE WHEN len(norm) >= 5
                  THEN [substr(norm, i, 5) for i in range(1, len(norm) - 3)]
                  ELSE [norm] END,
             s -> {oracle_hex8_int('s')})) AS min_shingle_hash
    FROM n
    """,
)
def q_doc_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    return fingerprints(fan_out(load_table(spark, sf_dir, "documents"), spark))


# --- intra-document repetition (Gopher-style quality filters) --------------


def _dup_ratio_m(grams: F.Column) -> F.Column:
    """Duplicate-n-gram fraction in milli-units: floor((n - distinct)*1000/n)."""
    n = F.size(grams)
    return F.when(
        n > 0, F.floor((n - F.size(F.array_distinct(grams))) * 1000 / n)
    ).otherwise(F.lit(0))


def repetition_scores(docs: DataFrame) -> DataFrame:
    """Per-document repetition signals: duplicate bigram/trigram fractions.

    The repetition family of quality filters (fraction of n-gram slots
    occupied by a repeated n-gram) — a standard pre-training heuristic
    for detecting templated/spammy text. Entirely intra-document: a
    narrow per-row expression over the token array, zero shuffle, no
    Python. Ratios are floored to milli-units so both engines emit the
    identical rational number.

    The token array and each gram array are staged in their own
    projections: expressions under a ``transform`` lambda are
    re-evaluated per element (no hoisting) and lambda-bearing
    expressions are skipped by codegen subexpression elimination, so
    the inlined shape re-ran tokenize once per gram slot per k
    (measured 4.3 s at sf0.1; staged 0.5 s, identical output).
    """
    pre = docs.select("doc_id", tokenize(F.col("text")).alias("_tk"))
    toks = F.col("_tk")

    def grams(k: int) -> F.Column:
        n = F.size(toks)
        return F.when(
            n >= k,
            F.transform(
                F.sequence(F.lit(0), n - k),
                lambda i: F.concat_ws(
                    " ", *[F.element_at(toks, i + j + 1) for j in range(k)]
                ),
            ),
        ).otherwise(F.array().cast("array<string>"))

    staged = pre.select(
        "doc_id", grams(2).alias("_bi"), grams(3).alias("_tri")
    )
    return staged.select(
        "doc_id",
        (_dup_ratio_m(F.col("_bi")) / 1000.0).alias("dup_bigram_frac"),
        (_dup_ratio_m(F.col("_tri")) / 1000.0).alias("dup_trigram_frac"),
    )


def _o_grams(k: int) -> str:
    parts = " || ' ' || ".join(f"t[i + {j}]" for j in range(k))
    return (
        f"CASE WHEN len(t) >= {k}"
        f" THEN list_transform(generate_series(1, len(t) - {k - 1}), i -> {parts})"
        f" ELSE [] END"
    )


def _o_dup_m(grams: str) -> str:
    return (
        f"CASE WHEN len({grams}) > 0"
        f" THEN floor((len({grams}) - len(list_distinct({grams}))) * 1000"
        f" / len({grams}))"
        f" ELSE 0 END"
    )


@query(
    "doc_repetition_scores",
    oracle=f"""
    WITH toks AS (SELECT doc_id, {_ORACLE_TOKENS} AS t FROM documents),
    g AS (SELECT doc_id, {_o_grams(2)} AS bi, {_o_grams(3)} AS tri FROM toks)
    SELECT doc_id,
           {_o_dup_m('bi')} / 1000.0 AS dup_bigram_frac,
           {_o_dup_m('tri')} / 1000.0 AS dup_trigram_frac
    FROM g
    """,
)
def q_doc_repetition_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    return repetition_scores(fan_out(load_table(spark, sf_dir, "documents"), spark))


# --- Gopher-style quality rule flags ----------------------------------------

# Published Gopher (Rae et al. 2021, arXiv:2112.11446 §A1.1) rule
# thresholds, restricted to the signals this corpus carries (no lines,
# no symbols): word-count bounds, mean-word-length band, >=2 distinct
# stopwords, most-frequent-token share, distinct-token ratio.
GOPHER_MIN_WORDS = 50
GOPHER_MAX_WORDS = 100_000
GOPHER_MIN_MEAN_LEN_M = 3_000  # milli-chars
GOPHER_MAX_MEAN_LEN_M = 10_000
GOPHER_MIN_STOPWORDS = 2
GOPHER_MAX_TOP_TOKEN_X = 5  # top token must be <= 1/5 of all tokens
GOPHER_MIN_DISTINCT_X10 = 3  # distinct/total must be >= 3/10


def _max_token_run(srt: Column, n: Column) -> Column:
    """Count of the most frequent element of a SORTED token array,
    computed entirely inside codegen (no explode, no shuffle): run
    boundaries are the positions whose value differs from their
    predecessor; the longest gap between consecutive boundaries
    (sentineled with n+1) is the modal count.

    Position 1 is seeded structurally (array(lit(1)) ++ filter over
    sequence(2, n)) so the lambda only ever sees i >= 2 and
    element_at(srt, i-1) is always a valid 1-based index — correctness
    does not depend on boolean-Or evaluation order. The n >= 2 guard
    keeps sequence() ascending (Spark's sequence(2, n) DESCENDS for
    n < 2 rather than returning empty)."""
    bounds = F.concat(
        F.array(F.lit(1)),
        F.when(
            n >= F.lit(2),
            F.filter(
                F.sequence(F.lit(2), n),
                lambda i: F.element_at(srt, i) != F.element_at(srt, i - 1),
            ),
        ).otherwise(F.array().cast("array<int>")),
        F.array(n + F.lit(1)),
    )
    nb = F.size(bounds)
    return F.array_max(
        F.zip_with(
            F.slice(bounds, 1, nb - 1),
            F.slice(bounds, 2, nb - 1),
            lambda a, b: b - a,
        )
    )


def gopher_quality_flags(docs: DataFrame) -> DataFrame:
    """Per-document Gopher rule booleans + the composite pass flag.

    Every signal is a scalar array expression over the tokenized text
    — zero shuffle, embarrassingly parallel, the ideal 100 TB filter
    shape (this IS how the published pipelines run it: a narrow map
    over the corpus emitting keep/drop flags). The modal-token count
    uses the sorted-array run scan above instead of an explode +
    groupBy, so the hot path never leaves whole-stage codegen.
    Integer-exact rule arithmetic throughout (milli-scaled mean
    length, cross-multiplied ratios) so the DuckDB oracle agrees
    bit-for-bit.

    The token array and its sorted copy are staged in their own
    projections: `tokenize` is a lambda-bearing higher-order
    expression, which whole-stage codegen's subexpression elimination
    skips, so inlining it into the six rule expressions re-ran
    split+filter per rule per row (measured 7.0 s at sf0.1; staged
    0.5 s, identical output). CollapseProject keeps the stages apart
    because the staged columns are non-cheap and multiply consumed.
    """
    staged = docs.select("doc_id", tokenize(F.col("text")).alias("_tk")).select(
        "doc_id",
        "_tk",
        F.size("_tk").alias("_n"),
        F.array_sort("_tk").alias("_srt"),
    )
    _toks, _nn = F.col("_tk"), F.col("_n")
    # Each O(n) signal is itself staged: `between` and the composite
    # `passes` reference every signal twice, which quadrupled the
    # aggregate/intersect/distinct/run-scan work when inlined.
    pre = staged.select(
        "doc_id",
        "_n",
        # n > 0 guard: the old inline shape only reached this division
        # inside `when(empty, ..).otherwise(..)`, whose per-row CASE
        # short-circuit protected empty docs from the ANSI
        # DIVIDE_BY_ZERO; the staged column must guard explicitly
        # (NULL here is never consumed — every reader re-checks empty).
        F.when(
            _nn > 0,
            F.floor(
                F.aggregate(
                    F.transform(_toks, F.length), F.lit(0), lambda acc, x: acc + x
                )
                * F.lit(1000)
                / _nn
            ),
        ).alias("_mlm"),
        F.size(
            F.array_intersect(_toks, F.array(*[F.lit(s) for s in STOPWORDS]))
        ).alias("_nstop"),
        F.size(F.array_distinct(_toks)).alias("_ndist"),
        _max_token_run(F.col("_srt"), _nn).alias("_mr"),
    )
    n = F.col("_n")
    mean_len_m = F.col("_mlm")
    n_stop = F.col("_nstop")
    n_distinct = F.col("_ndist")
    max_run = F.col("_mr")
    empty = n == F.lit(0)
    return pre.select(
        "doc_id",
        n.cast("long").alias("n_tokens"),
        (~empty & n.between(GOPHER_MIN_WORDS, GOPHER_MAX_WORDS)).alias("word_count_ok"),
        F.when(empty, F.lit(False))
        .otherwise(mean_len_m.between(GOPHER_MIN_MEAN_LEN_M, GOPHER_MAX_MEAN_LEN_M))
        .alias("mean_word_len_ok"),
        (n_stop >= GOPHER_MIN_STOPWORDS).alias("stopword_ok"),
        F.when(empty, F.lit(False))
        .otherwise(max_run * GOPHER_MAX_TOP_TOKEN_X <= n)
        .alias("repetition_ok"),
        F.when(empty, F.lit(False))
        .otherwise(n_distinct * 10 >= GOPHER_MIN_DISTINCT_X10 * n)
        .alias("distinct_ratio_ok"),
        F.when(empty, F.lit(False))
        .otherwise(
            n.between(GOPHER_MIN_WORDS, GOPHER_MAX_WORDS)
            & mean_len_m.between(GOPHER_MIN_MEAN_LEN_M, GOPHER_MAX_MEAN_LEN_M)
            & (n_stop >= GOPHER_MIN_STOPWORDS)
            & (max_run * GOPHER_MAX_TOP_TOKEN_X <= n)
            & (n_distinct * 10 >= GOPHER_MIN_DISTINCT_X10 * n)
        )
        .alias("passes"),
    )


_O_STOPLIST = "['" + "','".join(STOPWORDS) + "']"
_O_MAXRUN = """
    list_max(list_transform(range(1, len(b)), j -> b[j + 1] - b[j]))
""".strip()


@query(
    "gopher_quality_flags",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, {_ORACLE_TOKENS} AS tk FROM documents
    ), c AS (
      SELECT doc_id, tk, len(tk) AS n,
             list_sort(tk) AS ls,
             len(list_distinct(tk)) AS nd,
             len(list_intersect(tk, {_O_STOPLIST})) AS nstop,
             coalesce(list_sum(list_transform(tk, x -> len(x))), 0) AS tc
      FROM t
    ), runs AS (
      SELECT doc_id, n, nd, nstop,
             CASE WHEN n > 0 THEN floor(tc * 1000 / n) END AS mlm,
             list_append(
               [i for i in range(1, n + 1) if i = 1 OR ls[i] <> ls[i - 1]],
               n + 1) AS b
      FROM c
    ), r AS (
      SELECT doc_id, n, nd, nstop, mlm,
             CASE WHEN n > 0 THEN {_O_MAXRUN} END AS mr
      FROM runs
    )
    SELECT doc_id, n AS n_tokens,
           (n >= {GOPHER_MIN_WORDS} AND n <= {GOPHER_MAX_WORDS}) AS word_count_ok,
           (n > 0 AND mlm >= {GOPHER_MIN_MEAN_LEN_M}
                  AND mlm <= {GOPHER_MAX_MEAN_LEN_M}) AS mean_word_len_ok,
           (nstop >= {GOPHER_MIN_STOPWORDS}) AS stopword_ok,
           (n > 0 AND mr * {GOPHER_MAX_TOP_TOKEN_X} <= n) AS repetition_ok,
           (n > 0 AND nd * 10 >= {GOPHER_MIN_DISTINCT_X10} * n) AS distinct_ratio_ok,
           (n >= {GOPHER_MIN_WORDS} AND n <= {GOPHER_MAX_WORDS}
            AND mlm >= {GOPHER_MIN_MEAN_LEN_M} AND mlm <= {GOPHER_MAX_MEAN_LEN_M}
            AND nstop >= {GOPHER_MIN_STOPWORDS}
            AND mr * {GOPHER_MAX_TOP_TOKEN_X} <= n
            AND nd * 10 >= {GOPHER_MIN_DISTINCT_X10} * n) AS passes
    FROM r
    """,
)
def q_gopher_quality_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    return gopher_quality_flags(fan_out(load_table(spark, sf_dir, "documents"), spark))


# --- vocabulary-growth census (Heaps' law checkpoints) -------------------------

# How fast does the vocabulary grow as the corpus grows? Heaps' law
# (V ~ K * N^beta, public corpus-statistics result) is the number that
# sizes tokenizer vocabularies, embedding tables, and dedup sketch
# widths before a 100 TB ingest. The census reports V (cumulative
# distinct words) and N (cumulative tokens) at ten doc_id-ordered
# checkpoints — exact integers only; the consumer fits beta offline
# (engine log() ulp differences must not sit inside a hash gate).
#
# One-pass trick: a word's contribution to EVERY checkpoint is fully
# determined by its FIRST occurrence doc_id, so the corpus reduces to
# (word, first_doc) — one shuffle on word — and the ten cumulative
# vocabularies are a 10-way threshold aggregate over that bounded
# vocabulary frame. Token counts reduce per doc without exploding.

HEAPS_CHECKPOINTS = 10


def vocab_growth_census(docs: DataFrame, spark: SparkSession) -> DataFrame:
    toks = docs.select("doc_id", F.explode(tokenize(F.col("text"))).alias("w"))
    first = toks.groupBy("w").agg(F.min("doc_id").alias("fd"))
    per_doc = docs.select(
        "doc_id", F.size(tokenize(F.col("text"))).cast("long").alias("tc")
    )
    mx = docs.agg(F.max("doc_id").alias("m"))
    ks = spark.range(1, HEAPS_CHECKPOINTS + 1).select(
        F.col("id").alias("checkpoint")
    )
    thr = ks.crossJoin(F.broadcast(mx)).select(
        "checkpoint",
        F.call_function(
            "div",
            F.col("m") * F.col("checkpoint"),
            F.lit(HEAPS_CHECKPOINTS).cast("long"),
        ).alias("threshold_doc"),
    )
    vocab = (
        first.crossJoin(F.broadcast(thr))
        .where(F.col("fd") <= F.col("threshold_doc"))
        .groupBy("checkpoint", "threshold_doc")
        .agg(F.count(F.lit(1)).alias("cum_vocab"))
    )
    tokens = (
        per_doc.crossJoin(F.broadcast(thr))
        .where(F.col("doc_id") <= F.col("threshold_doc"))
        .groupBy("checkpoint", "threshold_doc")
        .agg(F.coalesce(F.sum("tc"), F.lit(0)).alias("cum_tokens"))
    )
    from mapreduce_lab_spark.functions.numeric import exact_ratio

    return (
        tokens.join(vocab, ["checkpoint", "threshold_doc"])
        .select(
            "checkpoint",
            "threshold_doc",
            "cum_tokens",
            "cum_vocab",
            exact_ratio(
                F.col("cum_vocab") * 1_000_000,
                F.greatest(F.col("cum_tokens"), F.lit(1)),
                out_scale=1,
            ).alias("vocab_per_million_tokens"),
        )
    )


_HEAPS_ORACLE = f"""
WITH toks AS (
    SELECT doc_id,
           unnest([t for t in regexp_split_to_array(text, '[^\\p{{L}}]+')
                   if t <> '']) AS w
    FROM documents
), first AS (
    SELECT w, min(doc_id) AS fd FROM toks GROUP BY w
), per_doc AS (
    SELECT doc_id,
           len([t for t in regexp_split_to_array(text, '[^\\p{{L}}]+')
                if t <> '']) AS tc
    FROM documents
), thr AS (
    SELECT k AS checkpoint,
           (SELECT max(doc_id) FROM documents) * k // {HEAPS_CHECKPOINTS}
               AS threshold_doc
    FROM generate_series(1, {HEAPS_CHECKPOINTS}) t(k)
), vocab AS (
    SELECT checkpoint, threshold_doc, count(*) AS cum_vocab
    FROM first, thr WHERE fd <= threshold_doc
    GROUP BY checkpoint, threshold_doc
), tokens AS (
    SELECT checkpoint, threshold_doc,
           CAST(coalesce(sum(tc), 0) AS BIGINT) AS cum_tokens
    FROM per_doc, thr WHERE doc_id <= threshold_doc
    GROUP BY checkpoint, threshold_doc
)
SELECT t.checkpoint, t.threshold_doc, t.cum_tokens,
       CAST(v.cum_vocab AS BIGINT) AS cum_vocab,
       (floor(CAST(v.cum_vocab * 1000000 AS DOUBLE) * 1
              / (greatest(t.cum_tokens, 1))) / 1.0)
           AS vocab_per_million_tokens
FROM tokens t JOIN vocab v USING (checkpoint, threshold_doc)
"""


@query("vocab_growth_census", oracle=_HEAPS_ORACLE)
def q_vocab_growth_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heaps'-law checkpoints: cumulative tokens, cumulative distinct
    vocabulary, and vocab-per-million-tokens at ten doc_id-ordered
    corpus prefixes — the vocabulary-sizing curve, exact integers
    end to end."""
    return vocab_growth_census(
        fan_out(load_table(spark, sf_dir, "documents"), spark), spark
    )
