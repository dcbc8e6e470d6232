"""MMR diversification: greedy replay vs pure Python, redundancy
suppression, tie-break, candidate exhaustion."""

from __future__ import annotations

import numpy as np

from rag_database_spark.operators.diversify import MMR_LAMBDA, mmr_rerank


def _py_mmr(cands, k, lam=MMR_LAMBDA):
    """Reference greedy MMR: cands = [(id, rel, vec)] for ONE query,
    rel pre-rounded; sims rounded at 6dp like the engine."""
    def cos(a, b):
        a, b = np.array(a), np.array(b)
        return round(
            float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b))), 6
        )

    oml = 1.0 - lam
    remaining = {i: (r, v, 0.0) for i, r, v in cands}
    out = []
    for t in range(1, k + 1):
        if not remaining:
            break
        best = min(
            remaining.items(),
            key=lambda kv: (-(lam * kv[1][0] - oml * kv[1][2]), kv[0]),
        )
        i, (r, v, ms) = best
        out.append((i, round(lam * r - oml * ms, 6), t))
        del remaining[i]
        for j, (rj, vj, msj) in remaining.items():
            remaining[j] = (rj, vj, max(msj, cos(vj, v)))
    return out


def _frame(spark, cands, qid=1):
    return spark.createDataFrame(
        [(qid, i, r, v) for i, r, v in cands],
        "query_id long, id long, rel double, v array<double>",
    )


def test_mmr_matches_python_reference(spark):
    rng = np.random.default_rng(4)
    cands = [
        (i, round(float(rng.uniform(0.2, 1.0)), 6),
         rng.normal(size=6).tolist())
        for i in range(12)
    ]
    got = sorted(
        (r["id"], r["mmr"], r["rank"])
        for r in mmr_rerank(_frame(spark, cands), k=5).collect()
    )
    exp = sorted(_py_mmr(cands, 5))
    assert [(i, t) for i, _, t in got] == [(i, t) for i, _, t in exp]
    # numpy's cosine differs from the JVM fold in final ulps; at a 6dp
    # rounding boundary the reference's rounded sim can land one last
    # digit off, shifting the reported mmr by ≤(1−λ)·1e-6 (+ its own
    # rounding). Selection order above is the strict contract; the
    # engine↔DuckDB twin is exact (same fold arithmetic, hash-checked).
    for (gi, gm, gt), (ei, em, et) in zip(got, exp):
        assert abs(gm - em) <= 2e-6, (gi, gm, em)


def test_mmr_pushes_redundant_duplicates_down(spark):
    """Two near-identical high-rel candidates: MMR takes one, then
    prefers a less relevant but diverse candidate over the clone."""
    v1 = [1.0, 0.0, 0.0]
    v1b = [0.999, 0.01, 0.0]   # clone of v1
    v2 = [0.0, 1.0, 0.0]       # orthogonal, lower rel
    cands = [(1, 0.9, v1), (2, 0.89, v1b), (3, 0.5, v2)]
    got = {
        r["rank"]: r["id"]
        for r in mmr_rerank(_frame(spark, cands), k=3).collect()
    }
    assert got[1] == 1          # best rel first
    assert got[2] == 3          # diversity beats the clone
    assert got[3] == 2


def test_mmr_tie_breaks_to_lowest_id_and_exhausts(spark):
    v = [1.0, 0.0]
    cands = [(7, 0.5, v), (3, 0.5, v)]
    rows = sorted(
        (r["rank"], r["id"])
        for r in mmr_rerank(_frame(spark, cands), k=5).collect()
    )
    # equal rel, identical vectors: rank1 -> lowest id; only 2 rows
    # come back (candidate exhaustion, not k)
    assert rows == [(1, 3), (2, 7)]


def test_mmr_multi_query_independence(spark):
    va, vb = [1.0, 0.0], [0.0, 1.0]
    df = spark.createDataFrame(
        [(1, 10, 0.9, va), (1, 11, 0.8, vb),
         (2, 10, 0.8, vb), (2, 11, 0.9, va)],
        "query_id long, id long, rel double, v array<double>",
    )
    got = {
        (r["query_id"], r["rank"]): r["id"]
        for r in mmr_rerank(df, k=2).collect()
    }
    assert got == {(1, 1): 10, (1, 2): 11, (2, 1): 11, (2, 2): 10}


def test_mmr_local_equals_loop_exactly(spark):
    """The Arrow-batched local impl replays the loop impl's float ops
    bit-for-bit: STRICT equality including the mmr doubles, multiple
    queries, rel ties, clone vectors, and exhaustion below k."""
    rng = np.random.default_rng(9)
    rows = []
    for qid in (1, 2, 3):
        for i in range(14):
            v = rng.normal(size=8)
            if i % 5 == 0:
                v = np.array([1.0, 0, 0, 0, 0, 0, 0, 0])  # clones
            rows.append(
                (qid, i, round(float(rng.uniform(0.2, 1.0)), 6),
                 v.tolist())
            )
    rows.append((4, 0, 0.5, [1.0] * 8))  # exhausts at 1 < k
    df = spark.createDataFrame(
        rows, "query_id long, id long, rel double, v array<double>"
    )
    loop = sorted(map(tuple, mmr_rerank(df, k=6, impl="loop").collect()))
    local = sorted(map(tuple, mmr_rerank(df, k=6, impl="local").collect()))
    assert loop == local
