"""Text-analysis column functions: quality tiers (F15 thresholds
.8/.5/.2, document_quality.py:356-365), language ID tie-break, document
fingerprints, shingles."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from rag_database_spark.functions.text import (
    detect_language,
    doc_fingerprint,
    quality_tier,
    shingles,
    unique_token_ratio,
)


def test_quality_tier_thresholds(spark):
    df = spark.createDataFrame(
        [(0.85,), (0.8,), (0.79,), (0.5,), (0.2,), (0.19,)], "s double"
    )
    got = [r[0] for r in df.select(quality_tier(F.col("s"))).collect()]
    assert got == ["high", "high", "medium", "medium", "low", "garbage"]


def test_detect_language(spark):
    df = spark.createDataFrame(
        [
            ("the cat and the dog is in the house that is big",),
            ("el perro y la casa de los gatos en la calle",),
            ("zz qq xx yy ww",),
        ],
        "text string",
    )
    got = [r[0] for r in df.select(detect_language(F.col("text"))).collect()]
    assert got == ["en", "es", "unknown"]


def test_detect_language_tie_break_ascending(spark):
    # "de la" hits exactly one marker in es ('la'), fr ('la'? no — fr has
    # 'la' too) — craft a true tie: 'de' ∈ es, fr; ratio ties → 'es' < 'fr'
    df = spark.createDataFrame([("de de de de de de de de de de",)], "text string")
    got = df.select(detect_language(F.col("text"))).first()[0]
    assert got == "es"  # es/fr tie on ratio 1.0 → language name ascending


def test_fingerprint_normalizes_case_and_punct(spark):
    df = spark.createDataFrame(
        [("Fast Hash-Join!",), ("fast hash join",), ("other text",)],
        "text string",
    )
    fps = [r[0] for r in df.select(doc_fingerprint(F.col("text"))).collect()]
    assert fps[0] == fps[1] != fps[2]


def test_shingles(spark):
    df = spark.createDataFrame([("a b c d",)], "text string")
    got = df.select(shingles(F.col("text"), 3).alias("s")).first()["s"]
    assert sorted(got) == ["a b c", "b c d"]
    # shorter than k → whole text as one shingle
    df2 = spark.createDataFrame([("a b",)], "text string")
    assert df2.select(shingles(F.col("text"), 3).alias("s")).first()["s"] == ["a b"]


def test_unique_token_ratio(spark):
    df = spark.createDataFrame([("x x y y",), ("",)], "text string")
    got = [r[0] for r in df.select(unique_token_ratio(F.col("text"))).collect()]
    assert got[0] == pytest.approx(0.5)
    assert got[1] == 0.0


def test_winnow_fingerprints_overlap_guarantee(spark):
    from rag_database_spark.functions.text import winnow_fingerprints

    shared = "the quick brown fox jumps over the lazy dog again and again"
    docs = spark.createDataFrame(
        [
            (1, "intro words here. " + shared),
            (2, shared + " completely different tail content follows"),
            (3, "nothing in common with the others whatsoever today"),
            (4, "ab"),  # shorter than k → empty fingerprint set
        ],
        "doc_id long, text string",
    )
    fps = {
        r["doc_id"]: set(r["fingerprints"])
        for r in winnow_fingerprints(docs).collect()
    }
    # winnowing guarantee: long shared substring → shared fingerprints
    assert fps[1] & fps[2]
    overlap_13 = len(fps[1] & fps[3]) / max(len(fps[1]), 1)
    assert overlap_13 < 0.3
    assert fps[4] == set()


def test_exact_sum_is_summation_order_independent(spark):
    """functions/exact.py: the decimal-exact sum is IDENTICAL under any
    partitioning (the float sum is not — that last-ulp drift is what
    flips a 6dp-rounded digit at the boundary and breaks the DuckDB
    twin contract at scale), and the exact mean divides the exact
    total once in double."""
    from pyspark.sql import functions as F

    from rag_database_spark.functions.exact import exact_avg, exact_sum

    df = spark.range(100_000).select(F.lit(0.1).alias("v"))
    e1 = df.repartition(1).agg(exact_sum("v", scale=1).alias("s"))
    e32 = df.repartition(32).agg(exact_sum("v", scale=1).alias("s"))
    assert e1.first()["s"] == 10000.0
    assert e32.first()["s"] == 10000.0
    # the float path drifts off the exact decimal total (positive
    # accumulation of 0.1's representation error) — the divergence
    # exact_sum exists to remove
    naive = df.agg(F.sum("v").alias("s")).first()["s"]
    assert naive != 10000.0
    assert df.agg(exact_avg("v", scale=1).alias("a")).first()["a"] == 0.1


def test_exact_avg_null_semantics(spark):
    """exact_avg divides by the NON-NULL count (F.avg semantics, r15
    ADVICE): a nullable column yields the mean of its present values,
    not an all-rows-diluted mean."""
    from pyspark.sql import functions as F

    from rag_database_spark.functions.exact import exact_avg

    df = spark.createDataFrame(
        [(1, 2.0), (2, 4.0), (3, None), (4, None)], "id int, v double"
    )
    got = df.agg(
        exact_avg("v", scale=1).alias("e"), F.avg("v").alias("f")
    ).first()
    assert got["e"] == 3.0  # (2+4)/2, not (2+4)/4
    assert got["e"] == got["f"]
