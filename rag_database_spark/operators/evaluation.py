"""Batch IR evaluation — the measurement harness next to the
retrieval operators: given a ranked results table and a relevance
table (qrels), compute per-query MRR, recall@k and nDCG@k in one
plan. The reference ships retrieval quality claims with no way to
measure them (no eval module anywhere in `src/`); a user switching
engines needs the scoreboard to check parity, so the engine carries
it as a first-class operator.

Cross-engine float determinism (the module's whole design problem —
aggregation ORDER is engine-defined, so a naive SUM of double gains
can differ in final ulps between Spark and DuckDB):

- the DCG gain of rank r is 1/log2(r+1) for r in 1..k — at most k
  DISTINCT values, so both engines consume the SAME literal doubles
  (``repr`` embedded, the λ-complement trick) instead of calling
  their own libm log2;
- DCG itself is an ORDERED running sum (explicit ROWS frame) whose
  final row is taken with max() — a left fold in rank order on both
  engines, never a reassociating aggregate (max over nonneg cumsum
  is order-free);
- IDCG is the Python-side left-fold prefix sum of the same literals,
  embedded per possible relevant-count m in 0..k — no engine ever
  adds two doubles the other engine doesn't add in the same order;
- MRR and recall are single divisions of integers.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

IR_K = 10


def dcg_gains(k: int = IR_K) -> list[float]:
    """gains[r-1] = 1/log2(r+1), computed ONCE in Python and embedded
    as literals on both engines."""
    return [1.0 / math.log2(r + 1) for r in range(1, k + 1)]


def idcg_table(k: int = IR_K) -> list[float]:
    """idcg[m] = left-fold prefix sum of the first m gains (ideal DCG
    when m relevant docs exist), m in 0..k."""
    gains = dcg_gains(k)
    out = [0.0]
    acc = 0.0
    for g in gains:
        acc = acc + g
        out.append(acc)
    return out


def ir_metrics(
    results: DataFrame,
    qrels: DataFrame,
    k: int = IR_K,
    query_col: str = "query_id",
    id_col: str = "id",
    rank_col: str = "rank",
) -> DataFrame:
    """Per-query retrieval metrics over ranked ``results`` (rank 1..k)
    and a ``qrels`` relevance table (query_col, id_col; binary
    relevance — one row per relevant doc):

    - ``total_rel``: relevant docs for the query (recall denominator)
    - ``hits``: relevant results within rank <= k
    - ``mrr``: 1/rank of the first relevant result (0.0 if none)
    - ``recall_at_k``: hits / total_rel (0.0 when total_rel = 0)
    - ``ndcg_at_k``: DCG over literal gains / IDCG(min(total_rel, k))

    Queries with no results still report (a left join from the qrels
    query set would be the caller's composition; here every results
    query reports, the serving-eval shape).

    Plan: one keyed left join flags relevance, one window pair
    (ordered cumsum + count) per query, one final rollup — results
    are O(queries x k) so nothing here is corpus-sized; qrels joins
    keyed (broadcast when small)."""
    gains = dcg_gains(k)
    idcg = idcg_table(k)

    gain_expr = F.lit(0.0)
    for r, g in zip(range(k, 0, -1), reversed(gains)):
        gain_expr = F.when(F.col("rank") == r, F.lit(g)).otherwise(gain_expr)

    rel_marked = (
        results.select(
            F.col(query_col).alias("query_id"),
            F.col(id_col).alias("id"),
            F.col(rank_col).cast("long").alias("rank"),
        )
        .filter(F.col("rank") <= k)
        .join(
            qrels.select(
                F.col(query_col).alias("query_id"),
                F.col(id_col).alias("id"),
                F.lit(1).alias("rel"),
            ).distinct(),
            ["query_id", "id"],
            "left",
        )
        .withColumn("rel", F.coalesce(F.col("rel"), F.lit(0)))
    )
    # (rank, id) order: tied ranks from a generic caller would
    # otherwise make the running DCG partition-order-dependent
    w_cum = (
        Window.partitionBy("query_id")
        .orderBy("rank", "id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = rel_marked.withColumn(
        "dcg_cum",
        F.sum(F.when(F.col("rel") == 1, gain_expr).otherwise(F.lit(0.0))).over(
            w_cum
        ),
    )
    per_query = cum.groupBy("query_id").agg(
        F.max("dcg_cum").alias("dcg"),
        F.sum("rel").cast("long").alias("hits"),
        F.min(F.when(F.col("rel") == 1, F.col("rank"))).alias("first_rel"),
    )
    totals = qrels.select(
        F.col(query_col).alias("query_id"), F.col(id_col).alias("id")
    ).distinct().groupBy("query_id").agg(
        F.count(F.lit(1)).alias("total_rel")
    )
    joined = per_query.join(totals, "query_id", "left").withColumn(
        "total_rel", F.coalesce(F.col("total_rel"), F.lit(0)).cast("long")
    )

    m_expr = F.least(F.col("total_rel"), F.lit(k))
    idcg_expr = F.lit(0.0)
    for m in range(k, -1, -1):
        idcg_expr = F.when(m_expr == m, F.lit(idcg[m])).otherwise(idcg_expr)

    return joined.select(
        "query_id",
        "total_rel",
        "hits",
        F.round(
            F.when(
                F.col("first_rel").isNotNull(),
                F.lit(1.0) / F.col("first_rel"),
            ).otherwise(F.lit(0.0)),
            6,
        ).alias("mrr"),
        F.round(
            F.when(
                F.col("total_rel") > 0,
                F.col("hits") / F.col("total_rel"),
            ).otherwise(F.lit(0.0)),
            6,
        ).alias("recall_at_k"),
        F.round(
            F.when(
                idcg_expr > 0, F.col("dcg") / idcg_expr
            ).otherwise(F.lit(0.0)),
            6,
        ).alias("ndcg_at_k"),
    )


HARD_NEG_N = 10


def hard_negatives(
    results: DataFrame,
    qrels: DataFrame,
    n: int = HARD_NEG_N,
    query_col: str = "query_id",
    id_col: str = "id",
) -> DataFrame:
    """Hard-negative mining — the standard training-data op for
    retrieval/embedding models (DPR, Contriever, every bi-encoder
    recipe): the top-ranked retrieved documents that are NOT relevant
    to the query are exactly the confusable examples contrastive
    training needs. Given a ranked ``results`` frame (query_col,
    id_col, score, rank — any retriever's over-fetched top-k) and the
    positives in ``qrels`` (query_col, id_col), anti-join the
    positives out and re-rank what remains by original retrieval
    order; keep the best ``n`` per query.

    Returns (query_id, id, score, neg_rank). Scale: one keyed
    anti-join + one per-query window over the already-bounded
    over-fetch — no corpus-sized state; the expensive part (retrieval)
    was paid upstream and any retriever leg can feed this."""
    neg = results.select(
        F.col(query_col).alias("query_id"),
        F.col(id_col).alias("id"),
        "score",
        "rank",
    ).join(
        qrels.select(
            F.col(query_col).alias("query_id"), F.col(id_col).alias("id")
        ).distinct(),
        ["query_id", "id"],
        "left_anti",
    )
    # id is a deterministic tiebreaker: the shipped entries feed
    # unique row_number ranks, but a caller with duplicate ranks per
    # query must not get a nondeterministic neg_rank / survivor cut
    w = Window.partitionBy("query_id").orderBy("rank", "id")
    return (
        neg.withColumn("neg_rank", F.row_number().over(w).cast("long"))
        .filter(F.col("neg_rank") <= n)
        .select("query_id", "id", "score", "neg_rank")
    )


def eval_delta(
    metrics_a: DataFrame,
    metrics_b: DataFrame,
    query_col: str = "query_id",
) -> DataFrame:
    """Paired A/B comparison of two ``ir_metrics`` outputs — the
    question every index/serving change must answer ("did the cheaper
    configuration hurt recall?") asked per query, not as a single
    averaged number that hides per-query regressions:

    Output per query: each side's mrr/recall/ndcg plus their deltas
    (a − b, re-rounded at 6dp). Positive delta = side A better.

    Determinism: both inputs carry 6dp-rounded doubles that are
    hash-identical across engines, and a subtraction of identical
    doubles is identical — no new float hazard enters here. The join
    is a full outer on query_id so a query missing from one side
    surfaces as NULL metrics instead of silently dropping."""
    a = metrics_a.select(
        F.col(query_col).alias("query_id"),
        F.col("mrr").alias("mrr_a"),
        F.col("recall_at_k").alias("recall_a"),
        F.col("ndcg_at_k").alias("ndcg_a"),
    )
    b = metrics_b.select(
        F.col(query_col).alias("query_id"),
        F.col("mrr").alias("mrr_b"),
        F.col("recall_at_k").alias("recall_b"),
        F.col("ndcg_at_k").alias("ndcg_b"),
    )
    out = a.join(b, "query_id", "full_outer")
    for m in ("mrr", "recall", "ndcg"):
        out = out.withColumn(
            f"d_{m}", F.round(F.col(f"{m}_a") - F.col(f"{m}_b"), 6)
        )
    return out
