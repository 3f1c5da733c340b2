"""Exact fixed-point aggregation helpers.

The money/measure columns in this schema carry fixed-decimal data
(2 dp) stored as doubles. Summing doubles is order-dependent, and
engines disagree systematically when a true value sits exactly on a
rounding boundary (Java rounds the shortest decimal representation,
DuckDB rounds the scaled binary value) — observed as ±1-in-the-last-
digit hash mismatches on window averages.

The fix used engine-wide: scale each value to integer units per row
(order-free, identical IEEE ops in any engine reading the same
parquet), aggregate the exact integers, and only convert back to
double at the very end — a division of identical integers, hence an
identical double, no rounding step at all.

Ratios (averages, shares) use ``floor(a / b)`` on exact integers at a
fixed output scale: both engines perform the same exact-integer
double division and the same binary floor, so results are
bit-identical. floor (not DIV/``//``) because Spark's DIV truncates
toward zero while DuckDB's ``//`` floors — they disagree on negative
numerators.

Magnitude bound: intermediate integers must stay below 2^53 for the
final double conversions to be exact. At oracle scale (sf0.01) the
largest intermediate is ~4e15. At true 100 TB scale these helpers
would switch the accumulator to DECIMAL(38, s) (Spark sums decimals
exactly); fixed-point-in-long is the fast path, decimal the wide
path.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def to_units(col: Column | str, scale: int) -> Column:
    """Per-row conversion of fixed-decimal doubles to exact integer units."""
    c = F.col(col) if isinstance(col, str) else col
    return F.round(c * F.lit(scale)).cast("long")


def exact_sum(col: Column | str, scale: int) -> Column:
    """Aggregate: exact sum of fixed-decimal data, returned as double."""
    return F.sum(to_units(col, scale)) / F.lit(float(scale))


def exact_ratio(num_units: Column, den_units: Column, out_scale: int = 1_000_000) -> Column:
    """Exact-integer ratio at fixed output scale: floor(num*out/den)/out."""
    return F.floor(num_units * F.lit(out_scale) / den_units) / F.lit(float(out_scale))


def exact_avg(sum_units: Column, n: Column, scale: int, out_scale: int = 1_000_000) -> Column:
    """Average of fixed-decimal data from its exact unit-sum and count."""
    return F.floor(sum_units * F.lit(out_scale) / (n * F.lit(scale))) / F.lit(float(out_scale))


def oracle_units(expr: str, scale: int) -> str:
    """DuckDB twin of to_units()."""
    return f"CAST(round(({expr}) * {scale}) AS BIGINT)"


def oracle_exact_sum(expr: str, scale: int) -> str:
    """DuckDB twin of exact_sum()."""
    return f"(sum({oracle_units(expr, scale)}) / {float(scale)})"


def oracle_exact_ratio(num: str, den: str, out_scale: int = 1_000_000) -> str:
    """DuckDB twin of exact_ratio()."""
    return f"(floor(({num}) * {out_scale} / ({den})) / {float(out_scale)})"


def oracle_exact_avg(sum_units: str, n: str, scale: int, out_scale: int = 1_000_000) -> str:
    """DuckDB twin of exact_avg()."""
    return f"(floor(({sum_units}) * {out_scale} / (({n}) * {scale})) / {float(out_scale)})"
