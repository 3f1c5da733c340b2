"""Text column functions shared by the text operators.

All JVM-side (``pyspark.sql.functions`` only) so they stay inside
whole-stage codegen — tokenization over 100 TB of documents must not
cross the Python boundary.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Split on any maximal run of non-letters. Go's `unicode.IsLetter`
# (reference plugin/word_count/wc.go:23-26) is Unicode category L*,
# which is `\p{L}` in both Java regex (Spark) and RE2 (the DuckDB
# oracle) — verified to agree on non-ASCII letters and apostrophes.
NON_LETTER_RE = r"[^\p{L}]+"


def tokenize(text: Column) -> Column:
    """Array of case-sensitive word tokens, empty tokens dropped.

    Parity with the reference tokenizer: `strings.FieldsFunc(contents,
    not-a-letter)` (plugin/word_count/wc.go:21-34) — case-sensitive,
    splits on every non-letter rune, never emits empty tokens.
    `split` produces leading/trailing "" when the text starts/ends
    with a separator, so filter them out JVM-side.
    """
    return F.filter(F.split(text, NON_LETTER_RE), lambda t: t != F.lit(""))


def word_rows(df, text_col: str = "text") -> "F.DataFrame":  # type: ignore[name-defined]
    """Explode a text column into one row per token occurrence.

    The DataFrame-native form of the reference's Map UDTF for word
    count (one `{word, "1"}` pair per occurrence); downstream
    aggregation gets map-side partial aggregation from Catalyst for
    free, unlike the reference which ships every occurrence through
    the shuffle (SURVEY.md §2.3 aggregation row).
    """
    return df.select("*", F.explode(tokenize(F.col(text_col))).alias("word"))
