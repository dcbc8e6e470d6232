"""Chunking pipeline: window math, overlap carry, offsets, W4 as-of
page assignment, F9 structure detection, C7 sentence chunks."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from rag_database_spark.operators.chunking import (
    assign_pages,
    chunk_documents,
    chunk_pipeline,
    detect_sections,
    doc_level_chunks,
    page_boundaries,
    sentence_chunks,
)


def _doc(spark, text, doc_id=1):
    return spark.createDataFrame([(doc_id, text)], "doc_id long, text string")


def test_single_chunk_short_doc(spark):
    rows = chunk_documents(_doc(spark, "a b c"), chunk_size=4, overlap=1).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["chunk_text"] == "a b c"
    assert r["token_count"] == 3
    assert (r["char_start"], r["char_end"]) == (0, 5)


def test_window_overlap_and_offsets(spark):
    # 7 words, size 4, overlap 2 → stride 2 → starts 0,2,4 (4+? n=7:
    # n_chunks = floor((7-4+1)/2)+1 = 3)
    words = "w0 w1 w2 w3 w4 w5 w6"
    rows = (
        chunk_documents(_doc(spark, words), chunk_size=4, overlap=2)
        .orderBy("chunk_index")
        .collect()
    )
    assert [r["chunk_text"] for r in rows] == [
        "w0 w1 w2 w3",
        "w2 w3 w4 w5",
        "w4 w5 w6",
    ]
    assert [r["token_count"] for r in rows] == [4, 4, 3]
    # offsets index the single-spaced normalized text
    norm = words
    for r in rows:
        assert norm[r["char_start"] : r["char_end"]] == r["chunk_text"]


def test_empty_doc_produces_no_chunks(spark):
    assert chunk_documents(_doc(spark, "   ")).count() == 0


def test_doc_level_truncation(spark):
    long_text = " ".join(f"w{i}" for i in range(30))
    rows = doc_level_chunks(_doc(spark, long_text), summary_chars=20).collect()
    assert rows[0]["chunk_text"].endswith("...")
    assert len(rows[0]["chunk_text"]) == 23
    assert rows[0]["token_count"] == 30


def test_assign_pages_as_of(spark):
    chunks = spark.createDataFrame(
        [(1, 0, "a"), (1, 150, "b"), (1, 200, "c"), (1, 450, "d")],
        "doc_id long, char_start long, tag string",
    )
    bounds = spark.createDataFrame(
        [(1, 0, 1), (1, 200, 2), (1, 400, 3)],
        "doc_id long, pos long, page_number long",
    )
    got = {
        r["tag"]: r["page_number"]
        for r in assign_pages(chunks, bounds).collect()
    }
    # 200 sits exactly on a boundary → boundary wins (page 2)
    assert got == {"a": 1, "b": 1, "c": 2, "d": 3}


def test_pipeline_hierarchy(spark):
    text = " ".join(f"w{i}" for i in range(40))
    rows = chunk_pipeline(
        _doc(spark, text), chunk_size=16, overlap=4, page_chars=50
    ).collect()
    levels = {r["level"] for r in rows}
    assert levels == {"document", "paragraph"}
    doc = [r for r in rows if r["level"] == "document"][0]
    paras = [r for r in rows if r["level"] == "paragraph"]
    assert doc["parent_id"] is None and doc["page_number"] is None
    assert all(p["parent_id"] == doc["chunk_id"] for p in paras)
    assert all(p["page_number"] >= 1 for p in paras)
    # F21 id scheme
    assert doc["chunk_id"].startswith("1_document_0_")


def test_detect_sections(spark):
    text = (
        "PREAMBLE\n"
        "Article I\n"
        "Section 2.1 Payment Terms\n"
        "some body text\n"
        "§ 1401.2\n"
        "Chapter 7\n"
        "Q1 2023\n"
    )
    rows = detect_sections(_doc(spark, text)).orderBy("line_no").collect()
    got = [(r["family"], r["section_number"], r["level"]) for r in rows]
    assert got == [
        ("legal", "I", 1),
        ("legal", "2.1", 2),
        ("code", "1401.2", 2),
        ("technical", "7", 1),
        ("financial", "Q1 2023", 1),
    ]


def test_sentence_chunks_min_length(spark):
    text = "Short. This sentence is long enough to keep! tiny? " \
           "Another sufficiently long sentence here."
    rows = sentence_chunks(_doc(spark, text)).orderBy("sentence_index").collect()
    sents = [r["sentence"] for r in rows]
    assert sents == [
        "This sentence is long enough to keep!",
        "Another sufficiently long sentence here.",
    ]


def test_semantic_chunks_split_topics(spark):
    # two topic clusters with disjoint vocabularies; bag-of-words
    # hash embeddings make within-topic cosine high, across ~0
    text = (
        "Revenue profit growth increased. Profit revenue margins grew. "
        "Growth revenue profit strong. "
        "Fire sprinkler egress alarm. Sprinkler alarm egress smoke. "
        "Egress fire alarm sprinkler."
    )
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    from rag_database_spark.operators.chunking import semantic_chunks

    rows = semantic_chunks(df, threshold=0.25).orderBy("chunk_index").collect()
    assert len(rows) == 2
    assert rows[0]["n_sentences"] == 3 and rows[1]["n_sentences"] == 3
    assert "Revenue" in rows[0]["chunk_text"]
    assert "Fire" in rows[1]["chunk_text"]


def test_sdpm_skip_window_bridges_gap(spark):
    # an off-topic sentence sandwiched between on-topic ones: plain
    # semantic splits, SDPM (skip_window) bridges it
    text = (
        "Revenue profit growth increased. "
        "Unrelated random interlude words here. "
        "Profit revenue growth margins strong."
    )
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    from rag_database_spark.operators.chunking import semantic_chunks

    plain = semantic_chunks(df, threshold=0.25).count()
    sdpm = semantic_chunks(df, threshold=0.25, skip_window=2).count()
    assert sdpm < plain


def test_semantic_chunks_custom_embedder_seam(spark):
    """The C4 model seam: an injected sentence->vector embedder (the
    shape a sentence-transformers encode wrapper has) must drive the
    grouping — orthogonal vectors per topic word split exactly where
    the model says, independent of the hash embedder's geometry."""
    from rag_database_spark.operators.chunking import semantic_chunks

    text = "apple one. apple two. banana one. banana two."
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")

    def embed(sentences):
        return [
            [1.0, 0.0] if "apple" in s else [0.0, 1.0] for s in sentences
        ]

    rows = (
        semantic_chunks(df, threshold=0.5, embedder=embed)
        .orderBy("chunk_index")
        .collect()
    )
    assert len(rows) == 2
    assert rows[0]["n_sentences"] == 2 and "apple" in rows[0]["chunk_text"]
    assert rows[1]["n_sentences"] == 2 and "banana" in rows[1]["chunk_text"]


def test_route_and_chunk_by_tier(spark):
    from rag_database_spark.operators.chunking import route_and_chunk

    docs = spark.createDataFrame(
        [
            (1, "Good doc sentence one is long. Another fine sentence here.",
             "high"),
            (2, "Medium doc first sentence okay. Second medium sentence here.",
             "medium"),
            (3, "A low quality doc with one long enough sentence.", "low"),
            (4, "garbage garbled tokens stream", "garbage"),
        ],
        "doc_id long, text string, tier string",
    )
    rows = route_and_chunk(docs).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], set()).add(r["strategy"])
    assert by_doc[1] == {"sdpm"}
    assert by_doc[2] == {"semantic"}
    assert by_doc[3] == {"sentence"}
    assert by_doc[4] == {"token"}
