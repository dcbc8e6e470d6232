"""Tokenizer F1 edge cases (reference bm25_store.py:38-100 semantics:
lowercase, punctuation→space, whitespace split, drop stopwords, drop
tokens shorter than 2)."""

from __future__ import annotations

from pyspark.sql import functions as F

from rag_database_spark.functions.text import (
    STOPWORDS,
    raw_tokens,
    token_count_ws,
    tokenize,
)


def _tok(spark, text):
    df = spark.createDataFrame([(text,)], "text string")
    return df.select(tokenize(F.col("text")).alias("t")).first()["t"]


def _raw(spark, text):
    df = spark.createDataFrame([(text,)], "text string")
    return df.select(raw_tokens(F.col("text")).alias("t")).first()["t"]


def test_basic(spark):
    assert _tok(spark, "Fast Hash-Join!") == ["fast", "hash", "join"]


def test_stopwords_dropped(spark):
    assert _tok(spark, "the quick fox and the dog") == ["quick", "fox", "dog"]


def test_short_tokens_dropped(spark):
    # single-char survivors of punctuation stripping are dropped
    assert _tok(spark, "x y zz") == ["zz"]


def test_duplicates_kept(spark):
    # term frequency matters — tokenize must NOT dedupe
    assert _tok(spark, "scan scan scan") == ["scan", "scan", "scan"]


def test_empty_and_punct_only(spark):
    assert _tok(spark, "") == []
    assert _tok(spark, "!!! ... ???") == []


def test_vertical_tab_is_whitespace(spark):
    # \x0B must split tokens identically in Spark (Java \s) and the
    # DuckDB oracle (RE2) — we pin an explicit class on both sides
    assert _raw(spark, "alpha\x0bbeta") == ["alpha", "beta"]


def test_raw_keeps_stopwords(spark):
    assert _raw(spark, "the dog") == ["the", "dog"]


def test_token_count_ws(spark):
    df = spark.createDataFrame([("a b  c ",), ("", )], "text string")
    got = [r[0] for r in df.select(token_count_ws(F.col("text"))).collect()]
    assert got == [3, 0]


def test_stopword_list_is_lowercase_sorted_unique():
    assert list(STOPWORDS) == sorted(set(STOPWORDS))
    assert all(s == s.lower() for s in STOPWORDS)
