"""Scale guards for the exact (quadratic) baseline operators.

The engine keeps two deliberately-exact operators whose cost is
O(n²)-ish: all-pairs embedding cosine (operators/dedup.py) and
brute-force kNN (operators/similarity.py). They are the recall
baselines the bucketed LSH/IVF paths are measured against — correct at
any scale, affordable only at small scale. These guards make sure a
registered baseline can never silently become the accidental 100 TB
path: the caller either stays under the row bound or explicitly opts
out with ``max_rows=None``.

The count used for the check is one metadata-cheap action over the
input (parquet scans answer count() from footers); it is not a
``.collect()`` of data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


class ExactBaselineScaleError(RuntimeError):
    """Raised when an exact O(n²) baseline is asked to run over more
    rows than its guard allows."""


def guard_quadratic(df: DataFrame, max_rows: int | None, op_name: str, scale_path: str) -> DataFrame:
    """Fail fast if ``df`` is too large for an all-pairs operator.

    ``max_rows=None`` disables the guard (explicit opt-in to quadratic
    cost, e.g. for a recall measurement on a sampled corpus).
    """
    if max_rows is None:
        return df
    n = df.count()
    if n > max_rows:
        raise ExactBaselineScaleError(
            f"{op_name}: exact all-pairs over {n} rows exceeds the "
            f"max_rows={max_rows} guard (~{n * n:.1e} comparisons). "
            f"Use the bucketed scale path instead: {scale_path}; or pass "
            f"max_rows=None to opt in to quadratic cost."
        )
    return df
