"""Table extraction (F16-F18/A8-A9) and domain metadata (F10-F14)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from rag_database_spark.operators import domain_metadata, tables_extract


def test_classify_cell_cascade(spark):
    vals = [
        ("$1,200.00", "currency"),
        ("12.5%", "percentage"),
        ("1/15/2024", "date"),
        ("1,350", "number"),
        ("yes", "boolean"),
        ("✓", "boolean"),
        ("hello", "text"),
        ("$12 total", "text"),  # not a pure currency cell
    ]
    df = spark.createDataFrame([(v,) for v, _ in vals], "v string")
    got = [
        r[0]
        for r in df.select(
            tables_extract.classify_cell(F.col("v"))
        ).collect()
    ]
    assert got == [t for _, t in vals]


def test_parse_skips_borders_and_trims(spark):
    fx = tables_extract.fixtures_df(spark)
    cells = tables_extract.parse_pipe_tables(fx).collect()
    t1 = [c for c in cells if c["table_id"] == 1]
    # 4 rows (header + 3 data) × 3 cols; the |---| border row is gone
    assert len(t1) == 12
    assert {c["row_idx"] for c in t1} == {0, 1, 2, 3}
    hdr = sorted(
        (c["col_idx"], c["value"]) for c in t1 if c["is_header"]
    )
    assert hdr == [(0, "Quarter"), (1, "Revenue"), (2, "Growth")]
    # doc 3 has no table
    assert not [c for c in cells if c["table_id"] == 3]


def test_table_texts(spark):
    fx = tables_extract.fixtures_df(spark)
    cells = tables_extract.parse_pipe_tables(fx)
    summary = tables_extract.table_summary(cells, fx)
    texts = {
        r["table_id"]: r
        for r in tables_extract.table_texts(cells, summary).collect()
    }
    assert texts[1]["structured_text"].splitlines()[0] == "Quarter, Revenue, Growth"
    assert "financial table with columns Quarter, Revenue, Growth" in (
        texts[1]["semantic_description"]
    )
    assert "3 data rows" in texts[1]["semantic_description"]


def test_doc_type_requires_two_hits(spark):
    df = spark.createDataFrame(
        [(1, "one mention of revenue only"),
         (2, "revenue and quarterly earnings grew")],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: r["doc_type"]
        for r in domain_metadata.extract_metadata(df).collect()
    }
    assert got == {1: "general", 2: "financial"}


def test_contract_extraction_end_to_end(spark):
    rows = {
        r["doc_id"]: r
        for r in domain_metadata.extract_metadata(
            domain_metadata.fixtures_df(spark)
        ).collect()
    }
    c = rows[1]
    assert c["contract_type"] == "service_agreement"
    assert c["effective_date"] == "January 15, 2024"
    assert c["governing_law"] == "Delaware"
    assert c["max_amount"] == pytest.approx(12500.0)
    assert c["has_confidentiality"] and not c["has_indemnification"]
    tax = rows[2]
    assert tax["doc_type"] == "tax"
    assert tax["irc_sections"] == ["1031(a)", "179"]
