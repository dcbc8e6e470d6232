"""Rank fusion (A1/J1) hand-case with the reference constants
(hybrid_search.py: k=60, weights bm25 .3 / dense .5 / colpali .2), plus
J2/J3 page-score propagation and J4 priority merge."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from rag_database_spark.operators.fusion import (
    DEFAULT_WEIGHTS,
    RRF_K,
    priority_merge,
    propagate_page_scores,
    rank_per_method,
    rrf_fuse,
)


def test_reference_constants():
    assert RRF_K == 60
    assert DEFAULT_WEIGHTS == {"bm25": 0.3, "dense": 0.5, "colpali": 0.2}


def test_rrf_hand_case(spark):
    # doc A: bm25 rank 1, dense rank 2; doc B: dense rank 1 only
    ranked = spark.createDataFrame(
        [(1, "A", "bm25", 1), (1, "A", "dense", 2), (1, "B", "dense", 1)],
        "query_id long, id string, method string, rank long",
    )
    got = {r["id"]: r["rrf_score"] for r in rrf_fuse(ranked).collect()}
    assert got["A"] == pytest.approx(0.3 / 61 + 0.5 / 62)
    assert got["B"] == pytest.approx(0.5 / 61)


def test_rrf_limit_and_tie_break(spark):
    # identical contributions → tie broken by id ascending
    ranked = spark.createDataFrame(
        [(1, "Z", "dense", 1), (1, "A", "dense", 1)],
        "query_id long, id string, method string, rank long",
    )
    rows = rrf_fuse(ranked, limit=1).collect()
    assert len(rows) == 1 and rows[0]["id"] == "A"


def test_rank_per_method(spark):
    scored = spark.createDataFrame(
        [(1, "bm25", "A", 3.0), (1, "bm25", "B", 5.0), (1, "dense", "A", 1.0)],
        "query_id long, method string, id string, score double",
    )
    got = {
        (r["method"], r["id"]): r["rank"]
        for r in rank_per_method(scored).collect()
    }
    assert got == {("bm25", "B"): 1, ("bm25", "A"): 2, ("dense", "A"): 1}


def test_propagation_page_match_and_doc_fallback(spark):
    chunks = spark.createDataFrame(
        [("c1", "d1", 1), ("c2", "d1", 9), ("c3", "d2", 1)],
        "chunk_id string, document_id string, page_number int",
    )
    pages = spark.createDataFrame(
        [("d1", 1, 0.9), ("d1", 2, 0.4)],
        "document_id string, page_number int, score double",
    )
    got = {
        r["chunk_id"]: r["propagated_score"]
        for r in propagate_page_scores(chunks, pages).collect()
    }
    assert got["c1"] == pytest.approx(0.9)  # J2: exact page match
    assert got["c2"] == pytest.approx(0.9 * 0.8)  # J3: doc max × 0.8
    assert got["c3"] is None  # document absent from page results


def test_priority_merge_first_seen_wins(spark):
    prio = spark.createDataFrame(
        [(1, "A", 10.0)], "query_id long, id string, score double"
    )
    base = spark.createDataFrame(
        [(1, "A", 1.0), (1, "B", 2.0)], "query_id long, id string, score double"
    )
    got = {r["id"]: r["score"] for r in priority_merge(prio, base).collect()}
    assert got == {"A": 10.0, "B": 2.0}


def test_hybrid_absent_leg_contributes_zero(spark):
    """A query whose BM25 leg matches nothing still fuses: missing
    methods contribute 0 (the reference's defaultdict semantics)."""
    from rag_database_spark.operators.hybrid import hybrid_search

    docs = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "delta epsilon zeta")],
        "doc_id long, text string",
    )
    emb = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.0, 1.0]), (3, [0.5, 0.5])],
        "vec_id long, embedding array<float>",
    )
    queries = spark.createDataFrame(
        [(1, "zzzz qqqq missing terms", 3)],  # zero BM25 matches
        "query_id long, query_text string, query_vec_id long",
    )
    rows = hybrid_search(queries, docs, emb, limit=5).collect()
    assert rows  # dense leg alone produces results
    assert all(r["bm25_rank"] is None for r in rows)
    assert all(r["dense_rank"] is not None for r in rows)
    # rrf score equals the dense-only contribution
    first = min(rows, key=lambda r: r["rank"])
    assert first["rrf_score"] == pytest.approx(
        round(0.5 / (60 + first["dense_rank"]), 6)
    )
