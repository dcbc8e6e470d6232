"""MMR result diversification (Carbonell & Goldstein 1998) — the
re-rank a RAG stack runs between retrieval and the context window:
greedy Maximal Marginal Relevance picks, at each step, the candidate
maximizing

    mmr(c) = λ·rel(c) − (1−λ)·max_{s ∈ selected} sim(c, s)

so the final k trade relevance against redundancy (near-duplicate
passages burn context tokens without adding evidence — the serving
twin of the corpus-side dedup family).

Spark-first shape: the candidate set is BOUNDED per query (the
retriever's over-fetch, e.g. 3k), so each of the k greedy rounds is a
per-query window pick + one join against the single newly-selected
row — work ∝ queries × fetch × k, never corpus-sized; a
``localCheckpoint`` per round keeps the plan flat (the PageRank loop
discipline). Cross-engine exact: rel and pairwise cosines enter at
6dp, λ and (1−λ) are the SAME IEEE doubles on both sides (the oracle
embeds their exact reprs — note 1−0.7 is 0.30000000000000004, not
0.3), the argmax orders by the unrounded mmr expression with ties →
lowest id, and the running ``max_sim`` update is a 2-ary
``greatest`` — no re-associating aggregate anywhere. The DuckDB twin
(``oracles.mmr_rerank_sql``) unrolls the k rounds exactly like the
perceptron's training rounds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from rag_database_spark.functions.vector import cosine, to_double_array

MMR_LAMBDA = 0.7
MMR_K = 10


def mmr_rerank(
    candidates: DataFrame,
    k: int = MMR_K,
    lam: float = MMR_LAMBDA,
    query_col: str = "query_id",
    id_col: str = "id",
    rel_col: str = "rel",
    vec_col: str = "v",
) -> DataFrame:
    """Greedy MMR over a bounded per-query candidate frame carrying
    (query_col, id_col, rel_col ALREADY 6dp-rounded, vec_col) →
    (query_id, id, rel, mmr, rank). Round t's pick maximizes
    λ·rel − (1−λ)·max_sim with ties → lowest id; every remaining
    candidate's ``max_sim`` then folds in its 6dp cosine to the pick
    via a 2-ary greatest. Fewer candidates than k → fewer rows, the
    same early exhaustion the oracle's empty rounds produce."""
    oml = 1.0 - lam  # the exact IEEE complement the oracle embeds
    remaining = candidates.select(
        F.col(query_col).alias("query_id"),
        F.col(id_col).alias("id"),
        F.col(rel_col).alias("rel"),
        to_double_array(F.col(vec_col)).alias("v"),
        F.lit(0.0).alias("max_sim"),
    ).localCheckpoint()
    picks: list[DataFrame] = []
    w = Window.partitionBy("query_id").orderBy(
        F.desc(F.lit(lam) * F.col("rel") - F.lit(oml) * F.col("max_sim")),
        F.asc("id"),
    )
    for t in range(1, k + 1):
        sel = (
            remaining.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select(
                "query_id", "id", "rel", "v",
                F.round(
                    F.lit(lam) * F.col("rel")
                    - F.lit(oml) * F.col("max_sim"),
                    6,
                ).alias("mmr"),
                F.lit(t).alias("rank"),
            )
            .localCheckpoint()
        )
        picks.append(sel)
        if t == k:
            break
        s = sel.select(
            "query_id",
            F.col("id").alias("_sid"),
            F.col("v").alias("_sv"),
        )
        remaining = (
            remaining.join(s, "query_id")
            .filter(F.col("id") != F.col("_sid"))
            .select(
                "query_id", "id", "rel", "v",
                F.greatest(
                    F.col("max_sim"),
                    F.round(cosine(F.col("v"), F.col("_sv")), 6),
                ).alias("max_sim"),
            )
            # lineage cut per round: the picks are each consumed twice
            # (union output + next round's join), so skipping the cut
            # re-executes the growing window/join chain per pick —
            # measured ~2× SLOWER than per-round checkpoints at sf0.1
            .localCheckpoint()
        )
    out = picks[0]
    for p in picks[1:]:
        out = out.unionByName(p)
    return out.select(
        "query_id", "id", "rel", "mmr", F.col("rank").cast("long")
    )
