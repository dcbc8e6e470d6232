"""Faithful F15 quality model vs the reference's golden behavior
(document_quality.py:543-581 good/bad smoke docs, :356-365 tiers)."""

from __future__ import annotations

import pytest

from rag_database_spark.functions.quality import quality_report

GOOD_DOC = """Section 1 Introduction

This document describes the quarterly performance of the company in a
clear and well structured manner. The results are presented in the
tables below, and each figure is referenced in the text.

1. Revenue grew steadily over the period of the last year.
2. Costs were reduced by a significant margin across the board.

Section 2 Results

The detailed results are available for review by the board and the
auditors of the company during the annual meeting this year.
"""

# OCR garbage: repeated chars, mixed case, pipe artifacts, long merged words
BAD_DOC = (
    "IIIIIII lllll OO000OO wordsmashedtogetherwithoutanyspacesatall "
    "xqzpt vvvvvvv |||| _______ aaaaaaa ..,,..,, teXTwiTHmiXEDcase "
    "bcdfg hjklm npqrs tvwxz !!!! ;;;; " * 6
)

EMPTY_DOC = "   \n  "


@pytest.fixture(scope="module")
def report(spark):
    docs = spark.createDataFrame(
        [(1, GOOD_DOC), (2, BAD_DOC), (3, EMPTY_DOC)],
        "doc_id long, text string",
    )
    return {r["doc_id"]: r for r in quality_report(docs).collect()}


def test_good_doc_scores_high(report):
    r = report[1]
    assert r["tier"] in ("high", "medium")
    assert r["overall_score"] >= 0.5
    assert r["structure_score"] > 0.5  # numbered lists + Section headers
    assert r["ocr_score"] == 1.0


def test_bad_doc_scores_below_good(report):
    good, bad = report[1], report[2]
    assert bad["overall_score"] < good["overall_score"]
    assert bad["ocr_score"] < 1.0  # artifact patterns fired
    assert bad["coherence_score"] < 1.0  # no common English words


def test_near_empty_doc_is_garbage(report):
    r = report[3]
    assert r["tier"] == "garbage"
    assert r["overall_score"] == 0.0
    assert all(
        r[c] == 0.0
        for c in (
            "text_score", "ocr_score", "format_score",
            "structure_score", "coherence_score",
        )
    )


def test_weights_sum_to_one():
    from rag_database_spark.functions.quality import QUALITY_WEIGHTS

    assert sum(QUALITY_WEIGHTS.values()) == pytest.approx(1.0)
    assert QUALITY_WEIGHTS["ocr"] == 0.30  # document_quality.py:158
