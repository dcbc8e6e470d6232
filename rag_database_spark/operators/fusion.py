"""Rank fusion — the heart of the reference's hybrid search
(src/retrieval/hybrid_search.py).

Reference semantics preserved exactly:
- Weighted Reciprocal Rank Fusion, k = 60:
      rrf(id) = Σ_method  weight_m / (k + rank_m(id))
  (hybrid_search.py:78-85 k, :109-115 accumulation, :185-189 default
  weights bm25 .3 / dense .5 / colpali .2).
- Missing methods contribute 0 — the reference accumulates into a
  defaultdict (a k-way FULL OUTER join); here the union+groupBy form
  gives the same semantics with one shuffle.
- Over-fetch 3× per method before fusion (hybrid_search.py:256).
- Page→chunk score propagation (J2) and doc-level ×0.8 fallback boost
  (J3, hybrid_search.py:368-394).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

RRF_K = 60
DEFAULT_WEIGHTS = {"bm25": 0.3, "dense": 0.5, "colpali": 0.2}
FETCH_MULTIPLIER = 3  # hybrid_search.py:256
DOC_BOOST = 0.8  # hybrid_search.py:383-384


def rank_per_method(
    scored: DataFrame,
    partition_cols: tuple[str, ...] = ("query_id", "method"),
    score_col: str = "score",
    id_col: str = "id",
) -> DataFrame:
    """W1 (hybrid_search.py:274-329): dense ranks per (query, method),
    deterministic tie-break on id."""
    w = Window.partitionBy(*partition_cols).orderBy(
        F.desc(score_col), F.asc(id_col)
    )
    return scored.withColumn("rank", F.row_number().over(w))


def rrf_fuse(
    ranked: DataFrame,
    weights: dict[str, float] | None = None,
    k: int = RRF_K,
    limit: int | None = None,
    query_id_col: str = "query_id",
    id_col: str = "id",
) -> DataFrame:
    """A1/J1: input (query_id, id, method, rank) — union of per-method
    ranked lists. Output (query_id, id, rrf_score[, rank]).

    The weight map is tiny → a literal CASE expression (no join at all);
    the single shuffle is the groupBy, with map-side partial aggregation.
    """
    weights = weights or DEFAULT_WEIGHTS
    wexpr = F.lit(0.0)
    for m, wt in weights.items():
        wexpr = F.when(F.col("method") == m, F.lit(float(wt))).otherwise(wexpr)
    contrib = wexpr / (F.lit(float(k)) + F.col("rank"))
    fused = ranked.groupBy(query_id_col, id_col).agg(
        F.sum(contrib).alias("rrf_score")
    )
    if limit is not None:
        w = Window.partitionBy(query_id_col).orderBy(
            F.desc("rrf_score"), F.asc(id_col)
        )
        fused = fused.withColumn("rank", F.row_number().over(w)).filter(
            F.col("rank") <= limit
        )
    return fused


def propagate_page_scores(
    chunks: DataFrame,
    page_scores: DataFrame,
    boost: float = DOC_BOOST,
) -> DataFrame:
    """J2 + J3 (hybrid_search.py:307-394): chunks inherit the matching
    page's score on (document_id, page_number); chunks of a matched
    document with no page overlap get ``max(page score) × boost``.

    ``page_scores``: (document_id, page_number, score). Both join sides
    derived from top-k lists → broadcast."""
    page_side = F.broadcast(
        page_scores.select(
            "document_id", "page_number", F.col("score").alias("page_score")
        )
    )
    doc_side = F.broadcast(
        page_scores.groupBy("document_id").agg(
            F.max("score").alias("doc_max_score")
        )
    )
    return (
        chunks.join(page_side, ["document_id", "page_number"], "left")
        .join(doc_side, ["document_id"], "left")
        .withColumn(
            "propagated_score",
            F.coalesce(
                F.col("page_score"),
                F.col("doc_max_score") * F.lit(boost),
            ),
        )
        .drop("doc_max_score")
    )


def propagate_page_scores_batch(
    chunks: DataFrame,
    page_scores: DataFrame,
    boost: float = DOC_BOOST,
) -> DataFrame:
    """Batch-query form of J2+J3: ``page_scores`` carries
    (query_id, document_id, page_number, score); chunks of a matched
    document join in per query — exact page match inherits the page
    score, the document's other pages get ``max(page score) × boost``
    (hybrid_search.py:307-394).

    Single-consumption shape (r18): ONE doc-grain aggregate carries
    both the doc-max score and a page→score map (pages per (query,
    doc) are top-k-bounded, so the map is tiny), replacing the r17
    two-consumer shape (doc-max rollup + page-grain left join) that
    evaluated the ``page_scores`` lineage twice — for the colpali leg
    that lineage is the MaxSim ArrowEvalPython GEMM, the single most
    expensive subtree in the three-leg entries. The map lookup
    (null when the chunk's page is absent) is exactly the old LEFT
    join's semantics. The inner doc-grain join both scopes the
    expansion to matched documents and attaches query_id; the join
    side is top-k-bounded → broadcast-sized."""
    doc_side = page_scores.groupBy("query_id", "document_id").agg(
        F.max("score").alias("doc_max_score"),
        F.map_from_entries(
            F.collect_list(F.struct("page_number", "score"))
        ).alias("__page_scores"),
    )
    return (
        chunks.join(F.broadcast(doc_side), ["document_id"])
        .withColumn("page_score", F.col("__page_scores")[F.col("page_number")])
        .withColumn(
            "propagated_score",
            F.coalesce(
                F.col("page_score"), F.col("doc_max_score") * F.lit(boost)
            ),
        )
        .drop("doc_max_score", "__page_scores")
    )


def priority_merge(
    priority: DataFrame,
    base: DataFrame,
    id_col: str = "id",
    query_id_col: str = "query_id",
) -> DataFrame:
    """J4 (enhanced_hybrid_search.py:475-496): priority ∪ base, first-seen
    id wins (priority side preferred). unionByName + window dedup."""
    p = priority.withColumn("__prio", F.lit(0))
    b = base.withColumn("__prio", F.lit(1))
    w = Window.partitionBy(query_id_col, id_col).orderBy("__prio")
    return (
        p.unionByName(b, allowMissingColumns=True)
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__prio", "__rn")
    )
