"""Skew mitigation — salted joins and two-stage aggregation (the
manual fallbacks when AQE's runtime skew handling isn't available,
e.g. under static planning or for deliberate key-distribution control).

AQE (enabled in session.py) already splits skewed join partitions at
runtime; these operators exist for the cases AQE cannot fix: a
broadcast-ineligible dim joined on a hot key, and high-cardinality
aggregations whose hot keys overwhelm single reducers before partial
aggregation kicks in.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_SALT = 8


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    n_salts: int = DEFAULT_SALT,
    how: str = "inner",
) -> DataFrame:
    """Equi-join where ``big``'s key distribution is skewed and
    ``small`` is too large to broadcast: each big row gets a random
    salt in [0, n_salts); the small side is replicated n_salts times,
    so one hot key spreads across n_salts reducers instead of one.

    Exact: salting only changes partitioning, never the join predicate.
    Cost: ``small`` shuffles n_salts× — size the salt count to the
    observed hot-key factor, not higher."""
    salted_big = big.withColumn(
        "__salt", (F.rand(seed=0) * n_salts).cast("int")
    )
    salts = F.explode(
        F.array(*[F.lit(i) for i in range(n_salts)])
    ).alias("__salt")
    replicated_small = small.select("*", salts)
    out = salted_big.join(replicated_small, [key, "__salt"], how)
    return out.drop("__salt")


def salted_count(
    df: DataFrame, key: str, n_salts: int = DEFAULT_SALT
) -> DataFrame:
    """Two-stage skewed count: aggregate (key, salt) first — hot keys
    split across n_salts reducers — then roll the partials up. With
    map-side partial aggregation Spark usually does this implicitly;
    the explicit form guarantees it for extreme hot keys and documents
    the pattern for arbitrary reaggregable measures."""
    partial = (
        df.withColumn("__salt", (F.rand(seed=0) * n_salts).cast("int"))
        .groupBy(key, "__salt")
        .agg(F.count("*").alias("__partial"))
    )
    return partial.groupBy(key).agg(F.sum("__partial").alias("cnt"))
