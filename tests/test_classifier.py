"""Batch-perceptron quality classifier (operators/classifier.py).

The cross-engine value check lives in tests/test_entry_oracle.py
(perceptron_select vs its unrolled DuckDB twin); here we pin the
invariants a green hash can't express: feature semantics on hand
documents, the numpy replay of the fixed-round batch update,
convergence (a converged round's update is identically zero), and the
separability property the margin features guarantee.
"""

from __future__ import annotations

import numpy as np
import pytest

from rag_database_spark.operators import classifier as cl


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


GOOD = (
    "the quick brown fox jumps over a lazy dog and then they run "
    "to the river where it is cool and they rest by the water as "
    "the sun goes down over the hills and no one is around at all"
)
SHORT = "tiny doc"
NO_STOP = " ".join(f"w{i}" for i in range(40))  # zero stopwords
REPEATY = ("spam " * 40).strip()  # 1 distinct token / 40


def test_feature_semantics_hand_docs(spark):
    rows = {
        r["id"]: r
        for r in cl.perceptron_features(
            _docs(spark, [GOOD, SHORT, NO_STOP, REPEATY])
        ).collect()
    }
    good, short, nostop, rep = (rows[i] for i in range(4))
    # GOOD: no violations, positive label
    assert (good["f2"], good["f3"], good["f4"]) == (0, 0, 0)
    assert good["y"] == 1
    # SHORT: 2 tokens → too-short violation 28, label -1
    assert short["f2"] == cl.WEAK_MIN_TOKENS - 2
    assert short["y"] == -1
    # NO_STOP: 40 tokens, 0 stopwords → stop violation min(40, clip)
    assert nostop["f3"] == 40
    assert nostop["y"] == -1
    # REPEATY: 40 tokens, 1 distinct → diversity violation 40-4=36
    assert rep["f4"] == 40 - cl.WEAK_UNIQ_MULT * 1
    assert rep["y"] == -1
    # bias is always 1
    assert all(rows[i]["f1"] == 1 for i in range(4))


def test_train_matches_numpy_and_converges(spark):
    texts = [GOOD, SHORT, NO_STOP, REPEATY] * 5
    feats = cl.perceptron_features(_docs(spark, texts))
    rows = sorted(feats.collect(), key=lambda r: r["id"])
    X = np.array(
        [[r[f] for f in cl.FEATURES] for r in rows], dtype=np.int64
    )
    y = np.array([r["y"] for r in rows], dtype=np.int64)

    w_np = np.zeros(len(cl.FEATURES), dtype=np.int64)
    for _ in range(cl.PERCEPTRON_ROUNDS):
        m = y * (X @ w_np) <= 0
        w_np = w_np + (y[m, None] * X[m]).sum(axis=0)

    got = cl.perceptron_train(feats)
    assert got == list(w_np)

    # margin features make the weak rule separable → training has
    # converged: one more round's update is identically zero
    m = y * (X @ w_np) <= 0
    assert (y[m, None] * X[m]).sum(axis=0).tolist() == [0] * len(
        cl.FEATURES
    ) or not m.any()
    # and the classifier reproduces the weak labels exactly
    pred = (X @ w_np) > 0
    assert ((pred * 2 - 1) == y).all()


def test_score_selected_matches_labels(spark):
    texts = [GOOD, SHORT, NO_STOP, REPEATY] * 3
    feats = cl.perceptron_features(_docs(spark, texts))
    w = cl.perceptron_train(feats)
    out = cl.perceptron_score(feats, w).collect()
    assert len(out) == len(texts)
    for r in out:
        assert r["selected"] == (r["score"] > 0)
        assert r["selected"] == (r["y_weak"] == 1)


def test_single_class_corpus_stays_sane(spark):
    """An all-negative corpus must not crash or select anything."""
    feats = cl.perceptron_features(_docs(spark, [SHORT, NO_STOP]))
    w = cl.perceptron_train(feats)
    out = cl.perceptron_score(feats, w).collect()
    assert all(not r["selected"] for r in out)


def test_feature_sql_matches_spark(spark):
    """The exported DuckDB feature CTE computes the identical
    (f*, y) table — the seam the oracle builder rests on."""
    import duckdb

    texts = [GOOD, SHORT, NO_STOP, REPEATY]
    spark_rows = sorted(
        tuple(r) for r in cl.perceptron_features(_docs(spark, texts)).collect()
    )
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE documents AS SELECT * FROM (VALUES "
        + ", ".join(f"({i}, '{t}')" for i, t in enumerate(texts))
        + ") t(doc_id, text)"
    )
    duck_rows = sorted(
        tuple(r)
        for r in con.execute(
            "WITH feat AS (" + cl.feature_sql() + ") SELECT * FROM feat"
        ).fetchall()
    )
    assert spark_rows == duck_rows
