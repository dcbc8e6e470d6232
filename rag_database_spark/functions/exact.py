"""Order-independent EXACT aggregates over fixed-decimal data columns.

A float ``sum``/``avg`` is summation-order-dependent at the last ulp,
and the repo's cross-engine contract rounds aggregates at 6 (or 2/4)
decimals: when the true total lands within an ulp of the rounding
boundary, Spark's and DuckDB's different reduction orders flip the
rounded digit. The error grows ~sqrt(K)·ulp with group size K, so a
divergence that never shows at sf0.01 becomes near-certain per-group
at 100 TB group sizes (first instance: ``search_analytics`` avg at
sf0.1, r15).

For DATA columns that are fixed-decimal by construction (the
generated ``events.value`` / ``orders.o_totalprice`` /
``lineitem.l_extendedprice`` / ``l_discount`` carry 2 decimals;
relationship ``confidence`` is NOMINALLY 1dp but float-COMPUTED —
e.g. 0.7 - 0.2 = 0.49999999999999994 — so its call sites use
scale=6, wide enough to absorb the float representation error
identically on both engines), the fix is lossless: cast
each value to DECIMAL before aggregating — both engines then compute
the IDENTICAL exact decimal total in any order — and cast the exact
total back to double for the usual 6dp-rounded output. The
double→decimal cast itself is engine-agreeing because the stored
doubles sit within ~1e-8 of their decimal value, far from any
rounding tie.

DuckDB twin idiom (mirror in oracles.py wherever these are used)::

    round(CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE), 6)
    round(CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE)
          / count(value), 6)                  -- exact_avg

Computed-double aggregates (RRF sums, log-likelihood totals) stay
float: their inputs are not fixed-decimal, groups are small/bounded,
and quantizing would change certified values. The one computed-score
case with unbounded need for determinism (``search_analytics``) uses
the integer-quantization variant instead because its inputs are
already 6dp-rounded.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def exact_sum(
    col: Column | str, scale: int = 2, precision: int = 18
) -> Column:
    """Exact decimal sum of a fixed-decimal data column, as double.

    Lossless iff the data carries ≤ ``scale`` decimal places; exact in
    any summation order on both engines. Spark widens the sum to
    DECIMAL(precision+10, scale), so overflow-to-null needs totals
    beyond ~1e(precision+10-scale) — unreachable for the shipped
    tables at any plausible corpus size."""
    return F.sum(_col(col).cast(f"decimal({precision},{scale})")).cast(
        "double"
    )


def exact_avg(
    col: Column | str, scale: int = 2, precision: int = 18
) -> Column:
    """Exact-sum-based mean: one exact decimal total cast to double,
    ONE double division by the group count — deterministic on both
    engines (identical dividend and divisor in, identical double
    out).

    The divisor is the NON-NULL count of ``col`` — the same
    denominator ``F.avg`` uses — so a nullable input yields the mean
    of its present values, not a silently-diluted all-rows mean.
    DuckDB twins must divide by ``count(col)`` to match."""
    c = _col(col)
    return exact_sum(c, scale, precision) / F.count(c)
