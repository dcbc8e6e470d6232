"""Skew mitigation: salted joins and two-stage aggregation are exact."""

from __future__ import annotations

from pyspark.sql import functions as F

from rag_database_spark.operators.skew import salted_count, salted_join


def _skewed(spark):
    # 900 rows on hot key 1, a few on others
    rows = [(1, i) for i in range(900)] + [(2, 0), (3, 0)]
    return spark.createDataFrame(rows, "k long, payload long")


def test_salted_join_matches_plain_join(spark):
    big = _skewed(spark)
    small = spark.createDataFrame(
        [(1, "hot"), (2, "a"), (4, "unmatched")], "k long, label string"
    )
    plain = big.join(small, "k").groupBy("k", "label").count().collect()
    salted = (
        salted_join(big, small, "k").groupBy("k", "label").count().collect()
    )
    assert sorted(map(tuple, plain)) == sorted(map(tuple, salted))
    # left join parity too (unmatched big rows survive exactly once)
    pl = big.join(small, "k", "left").count()
    sl = salted_join(big, small, "k", how="left").count()
    assert pl == sl == big.count()


def test_salted_count_matches_group_count(spark):
    df = _skewed(spark)
    plain = {r["k"]: r["count"] for r in df.groupBy("k").count().collect()}
    salted = {r["k"]: r["cnt"] for r in salted_count(df, "k").collect()}
    assert plain == salted
