"""Product quantization: codes == per-slice deterministic k-means,
ADC == numpy replication, recall vs brute force, degenerate inputs."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from rag_database_spark.operators import pq
from rag_database_spark.operators.clustering import (
    KMEANS_SCALE, kmeans_fit,
)


def _corpus(spark, n=60, dim=16, seed=5, normalize=False):
    rng = np.random.default_rng(seed)
    rows = []
    for i in range(n):
        v = rng.normal(size=dim)
        if normalize:
            v = v / np.linalg.norm(v)
        rows.append((i, v.tolist()))
    return rows, spark.createDataFrame(rows, "id long, vec array<double>")


def test_pq_codes_are_per_slice_kmeans_assignments(spark):
    """pq_fit's code columns must equal an independent kmeans_fit over
    each slice — the PQ build is exactly M deterministic sub-fits."""
    rows, corpus = _corpus(spark, n=40, dim=16)
    codebooks, codes = pq.pq_fit(corpus, dim=16, m=4, k=4)
    got = {r["id"]: [r[f"code{j}"] for j in range(4)] for r in codes.collect()}
    for j in range(4):
        sub = corpus.select(
            F.col("id").alias("vec_id"),
            F.slice("vec", j * 4 + 1, 4).alias("subvec"),
        )
        assign, cents = kmeans_fit(
            sub, k=4, id_col="vec_id", vec_col="subvec", impl="expr"
        )
        exp = {r["id"]: r["cluster_id"] for r in assign.collect()}
        for vid, cs in got.items():
            assert cs[j] == exp[vid], (j, vid)
        cb = {
            r["cid"]: r["cvec"]
            for r in codebooks.filter(F.col("m") == j).collect()
        }
        assert cb == {i: c for i, c in enumerate(cents)}


def test_pq_adc_matches_numpy(spark):
    """ADC distance replays in numpy: quantized query slice vs the
    coded centroid, summed over subspaces."""
    rows, corpus = _corpus(spark, n=30, dim=16)
    codebooks, codes = pq.pq_fit(corpus, dim=16, m=4, k=4)
    cb = {
        (r["m"], r["cid"]): np.array(r["cvec"])
        for r in codebooks.collect()
    }
    code_map = {
        r["id"]: [r[f"code{j}"] for j in range(4)] for r in codes.collect()
    }
    queries = spark.createDataFrame(
        [(0, rows[3][1]), (1, rows[17][1])],
        "query_id long, qvec array<double>",
    )
    out = pq.pq_topk_indexed(queries, codebooks, codes, 30, dim=16, m=4)
    got = {
        (r["query_id"], r["id"]): r["adc_dist"] for r in out.collect()
    }
    for qid, qvec in ((0, rows[3][1]), (1, rows[17][1])):
        qx = np.round(np.array(qvec) * KMEANS_SCALE)
        for vid, cs in code_map.items():
            exp = sum(
                float(((qx[j * 4:(j + 1) * 4] - cb[(j, cs[j])]) ** 2).sum())
                for j in range(4)
            )
            assert got[(qid, vid)] == pytest.approx(round(exp, 6), abs=5e-6)


def test_pq_topk_recall_vs_brute_force(spark):
    """On a clustered unit-norm corpus (L2 order == cosine order) the
    4-bit ADC scan serves as a SHORTLIST: the standard PQ deployment
    over-fetches then rescores exactly, so the contract is shortlist
    recall — a 3x ADC shortlist must hold nearly all of the true
    top-10 (a numpy replication measures 0.925 here; direct recall@10
    is ~0.5 at this code width, which is what 4-bit codes buy)."""
    from rag_database_spark.operators.similarity import cosine_topk

    rng = np.random.default_rng(9)
    centers = [rng.normal(size=16) for _ in range(4)]
    rows = []
    for i in range(200):
        v = centers[i % 4] + rng.normal(scale=0.25, size=16)
        v = v / np.linalg.norm(v)
        rows.append((i, v.tolist()))
    corpus = spark.createDataFrame(rows, "id long, vec array<double>")
    queries = spark.createDataFrame(
        [(qi, rows[qi][1]) for qi in range(4)],
        "query_id long, qvec array<double>",
    )
    exact = cosine_topk(queries, corpus, 10).collect()
    # production code width: 4-bit codebooks (PQ_K=16) per subspace
    shortlist = pq.pq_topk(queries, corpus, 30, dim=16, m=4,
                           n_codes=16).collect()
    key = lambda rs: {(r["query_id"], r["id"]) for r in rs}
    recall = len(key(exact) & key(shortlist)) / len(key(exact))
    assert recall >= 0.8, recall
    # deterministic and partition-invariant
    again = sorted(
        (r["query_id"], r["id"], r["rank"])
        for r in pq.pq_topk(
            queries.repartition(5), corpus.repartition(11), 30, dim=16,
            m=4, n_codes=16,
        ).collect()
    )
    assert again == sorted(
        (r["query_id"], r["id"], r["rank"]) for r in shortlist
    )


def test_pq_rejects_indivisible_dim():
    with pytest.raises(ValueError, match="not divisible"):
        pq._sub_slices(10, 4)


def test_pq_empty_inputs(spark):
    empty = spark.createDataFrame([], "id long, vec array<double>")
    codebooks, codes = pq.pq_fit(empty, dim=8, m=2, k=2)
    assert codebooks.count() == 0 and codes.count() == 0
    q = spark.createDataFrame(
        [(1, [0.0] * 8)], "query_id long, qvec array<double>"
    )
    assert pq.pq_topk_indexed(q, codebooks, codes, 3, dim=8, m=2).count() == 0
    _, corpus = _corpus(spark, n=10, dim=8)
    cb2, codes2 = pq.pq_fit(corpus, dim=8, m=2, k=2)
    empty_q = spark.createDataFrame([], "query_id long, qvec array<double>")
    out = pq.pq_topk_indexed(empty_q, cb2, codes2, 3, dim=8, m=2)
    assert out.count() == 0
    assert out.columns == ["query_id", "id", "adc_dist", "rank"]


def test_ivfpq_full_probe_equals_flat_pq(spark, tmp_path):
    """With n_probe covering every coarse list, the IVF layer prunes
    nothing — IVF-PQ must return EXACTLY the flat PQ scan (same codes,
    same ADC arithmetic, same rank discipline)."""
    rows, corpus = _corpus(spark, n=80, dim=16, seed=21)
    path = str(tmp_path / "ivfpq")
    pq.write_ivfpq_index(corpus, path, dim=16, n_centroids=4, m=4, k=4)
    centroids, codebooks, lists = pq.read_ivfpq_index(spark, path)
    queries = spark.createDataFrame(
        [(qi, rows[qi][1]) for qi in range(3)],
        "query_id long, qvec array<double>",
    )
    full = sorted(
        map(tuple, pq.ivfpq_topk(
            queries, centroids, codebooks, lists, 10, dim=16,
            n_probe=4, m=4,
        ).collect())
    )
    flat = sorted(
        map(tuple, pq.pq_topk(
            queries, corpus, 10, dim=16, m=4, n_codes=4
        ).collect())
    )
    assert full == flat


def test_ivfpq_pruned_probe_is_subset_and_self_served(spark, tmp_path):
    """A partial probe scores only the probed lists: results are a
    subset of the corpus restricted to those lists, and a corpus
    member querying its own value is served at rank 1 (its own list
    is by construction the nearest coarse centroid)."""
    rows, corpus = _corpus(spark, n=80, dim=16, seed=22)
    path = str(tmp_path / "ivfpq2")
    pq.write_ivfpq_index(corpus, path, dim=16, n_centroids=4, m=4, k=8)
    centroids, codebooks, lists = pq.read_ivfpq_index(spark, path)
    queries = spark.createDataFrame(
        [(qi, rows[qi][1]) for qi in range(3)],
        "query_id long, qvec array<double>",
    )
    out = pq.ivfpq_topk(
        queries, centroids, codebooks, lists, 5, dim=16, n_probe=1, m=4
    ).collect()
    assert {r["query_id"] for r in out} == {0, 1, 2}
    # every returned id belongs to the single probed list of its query
    list_of = {
        r["id"]: r["centroid_id"] for r in lists.collect()
    }
    for qid in (0, 1, 2):
        ids = [r["id"] for r in out if r["query_id"] == qid]
        assert len({list_of[i] for i in ids}) == 1
    rank1 = {r["query_id"]: r["id"] for r in out if r["rank"] == 1}
    assert rank1 == {qi: qi for qi in range(3)}


def test_ivfpq_empty_inputs(spark, tmp_path):
    empty = spark.createDataFrame([], "id long, vec array<double>")
    path = str(tmp_path / "ivfpq_empty")
    pq.write_ivfpq_index(empty, path, dim=8, m=2, k=2)
    centroids, codebooks, lists = pq.read_ivfpq_index(spark, path)
    assert centroids.count() == 0 and lists.count() == 0
    q = spark.createDataFrame(
        [(1, [0.0] * 8)], "query_id long, qvec array<double>"
    )
    out = pq.ivfpq_topk(q, centroids, codebooks, lists, 3, dim=8, m=2)
    assert out.count() == 0
    assert out.columns == ["query_id", "id", "adc_dist", "rank"]


def test_append_ivfpq_assigns_and_encodes_like_frozen_artifacts(
    spark, tmp_path
):
    """Appended vectors must land in the coarse list AND carry the PQ
    codes a frozen-artifact re-derivation chooses (numpy argmin in the
    quantized frame for both layers), and the probe must serve them."""
    rows, corpus = _corpus(spark, n=60, dim=16, seed=31)
    path = str(tmp_path / "ivfpq_app")
    pq.write_ivfpq_index(corpus, path, dim=16, n_centroids=3, m=4, k=4)
    batch_rows, batch = _corpus(spark, n=10, dim=16, seed=32)
    batch = batch.select(
        (F.col("id") + 100).alias("id"), "vec"
    )
    pq.append_ivfpq_index(batch, path, dim=16, m=4)

    centroids, codebooks, lists = pq.read_ivfpq_index(spark, path)
    ctr = {
        r["centroid_id"]: np.array(r["cvec"]) for r in centroids.collect()
    }
    cb = {
        (r["m"], r["cid"]): np.array(r["cvec"])
        for r in codebooks.collect()
    }
    got = {
        r["id"]: (r["centroid_id"], [r[f"code{j}"] for j in range(4)])
        for r in lists.filter(lists.id >= 100).collect()
    }
    assert set(got) == {100 + i for i in range(10)}
    for bid, vec in ((100 + i, v) for i, v in enumerate(
        r[1] for r in batch_rows
    )):
        qx = np.round(np.array(vec) * KMEANS_SCALE)
        d_coarse = {
            cid: float(((qx - c) ** 2).sum()) for cid, c in ctr.items()
        }
        exp_coarse = min(sorted(d_coarse), key=lambda c: (d_coarse[c], c))
        assert got[bid][0] == exp_coarse, bid
        for j in range(4):
            sx = qx[j * 4:(j + 1) * 4]
            d = {
                cid: float(((sx - cb[(j, cid)]) ** 2).sum())
                for mm, cid in cb if mm == j
            }
            assert got[bid][1][j] == min(
                sorted(d), key=lambda c: (d[c], c)
            ), (bid, j)
    # the probe serves an appended vector at rank 1 for its own value
    q = spark.createDataFrame(
        [(1, batch_rows[0][1])], "query_id long, qvec array<double>"
    )
    top = pq.ivfpq_topk(
        q, centroids, codebooks, lists, 3, dim=16, n_probe=1, m=4
    ).collect()
    assert top[0]["id"] == 100
