"""Sketch-path guarantees: the approximate forms that replace exact
distinct/percentile at 100 TB must stay within their documented error
bounds of the exact forms on real data."""

from __future__ import annotations

from pyspark.sql import functions as F

from rag_database_spark.operators.relational import (
    events_profile,
    events_profile_approx,
)

SF_DIR = "/root/testdata/sf0.01"


def test_sketch_profile_within_bounds(spark):
    events = spark.read.parquet(f"{SF_DIR}/events.parquet")
    exact = {r["event_type"]: r for r in events_profile(events).collect()}
    approx = {
        r["event_type"]: r for r in events_profile_approx(events).collect()
    }
    assert exact.keys() == approx.keys() and exact
    for et, e in exact.items():
        a = approx[et]
        assert a["n_events"] == e["n_events"]  # counts are exact
        # HLL++ at rsd=0.05: allow 3 sigma
        assert abs(a["n_users"] - e["n_users"]) <= max(
            3, 0.15 * e["n_users"]
        )
        # percentile_approx at accuracy=10000 on ~thousands of rows is
        # near-exact; allow a loose relative band around each quantile
        for col in ("p50_value", "p95_value", "p99_value"):
            assert abs(a[col] - e[col]) <= 0.05 * max(1.0, abs(e[col]))


def test_hll_distinct_whole_table(spark):
    events = spark.read.parquet(f"{SF_DIR}/events.parquet")
    r = events.agg(
        F.count_distinct("user_id").alias("exact"),
        F.approx_count_distinct("user_id", 0.02).alias("approx"),
    ).collect()[0]
    assert abs(r["approx"] - r["exact"]) <= max(3, 0.06 * r["exact"])
