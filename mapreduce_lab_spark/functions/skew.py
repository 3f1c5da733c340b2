"""Skew mitigation: salted two-phase holistic aggregation.

Algebraic aggregates (count/sum/min/max) are skew-tolerant for free —
Catalyst's map-side partial aggregation absorbs hot keys before the
shuffle. HOLISTIC aggregates (collect_list/collect_set posting lists,
the reference's Reduce-over-complete-value-list contract) are not:
every value for a hot key lands in one reducer task, which is the
classic straggler/OOM at 100 TB (word frequencies are Zipfian — "the"
is O(corpus)).

The standard fix implemented here: salt the key into S sub-keys,
aggregate per (key, salt) — bounded partial lists spread over S tasks
— then merge the S partials per key in a second, much smaller
aggregation. Two shuffles, but the first is skew-free by construction
and the second moves one row per (key, salt), not one per value.

AQE's skew-join splitting does NOT cover this case (it splits join
partitions, not aggregation groups), which is why it's an explicit
operator.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_SALTS = 16


def salted_collect_set(
    df: DataFrame,
    key_cols: list[str],
    value_col: str,
    n_salts: int = DEFAULT_SALTS,
    salt_source: str | Column | None = None,
) -> DataFrame:
    """groupBy(key).collect_set(value) with skew-proof two-phase plan.

    Returns (key_cols..., values array) where ``values`` is the exact
    distinct set, sorted for determinism. The salt is derived from the
    VALUE (hash mod n_salts) so identical values land on the same
    sub-aggregate and the per-salt dedup stays exact.
    """
    salt_of = F.pmod(F.hash(salt_source if salt_source is not None else value_col),
                     F.lit(n_salts))
    partial = (
        df.withColumn("_salt", salt_of)
        .groupBy(*key_cols, "_salt")
        .agg(F.collect_set(value_col).alias("_part"))
    )
    return (
        partial.groupBy(*key_cols)
        .agg(F.sort_array(F.array_distinct(F.flatten(F.collect_list("_part")))).alias("values"))
    )
