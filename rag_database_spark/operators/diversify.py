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

import math
from decimal import ROUND_HALF_UP, Decimal

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from rag_database_spark.functions.vector import cosine, to_double_array

MMR_LAMBDA = 0.7
MMR_K = 10


def _round6(x: float) -> float:
    """Bit-exact replica of Spark's ``Round(col, 6)`` on DOUBLE:
    HALF_UP over the shortest decimal representation (Java's
    ``BigDecimal.valueOf(double)`` parses ``Double.toString``, which
    is the same shortest round-trip decimal Python's ``repr`` emits).
    Python's builtin ``round`` is half-EVEN on the binary value —
    a different function at exact .5 boundaries."""
    return float(
        Decimal(repr(x)).quantize(Decimal("0.000001"), ROUND_HALF_UP)
    )


def _fold_cosine(a, b) -> float:
    """Bit-exact replica of ``functions.vector.cosine`` (left folds in
    array-index order, ``sqrt(na)*sqrt(nb)`` denominator, 0.0 when the
    denominator is not > 0) in plain Python doubles — the same IEEE
    ops the JVM expression runs, so the two paths cannot drift."""
    na = 0.0
    for x in a:
        na = na + x * x
    nb = 0.0
    for y in b:
        nb = nb + y * y
    denom = math.sqrt(na) * math.sqrt(nb)
    if not denom > 0:
        return 0.0
    dot = 0.0
    for x, y in zip(a, b):
        dot = dot + x * y
    return dot / denom


def mmr_rerank(
    candidates: DataFrame,
    k: int = MMR_K,
    lam: float = MMR_LAMBDA,
    query_col: str = "query_id",
    id_col: str = "id",
    rel_col: str = "rel",
    vec_col: str = "v",
    impl: str = "local",
) -> DataFrame:
    """Greedy MMR over a bounded per-query candidate frame carrying
    (query_col, id_col, rel_col ALREADY 6dp-rounded, vec_col) →
    (query_id, id, rel, mmr, rank). Candidate ids must be UNIQUE per
    query (any top-k retriever satisfies this; the local impl raises
    on violation, the loop impl would keep both rows). Round t's pick
    maximizes
    λ·rel − (1−λ)·max_sim with ties → lowest id; every remaining
    candidate's ``max_sim`` then folds in its 6dp cosine to the pick
    via a 2-ary greatest. Fewer candidates than k → fewer rows, the
    same early exhaustion the oracle's empty rounds produce.

    ``impl='local'`` (default): the greedy loop is PER-QUERY-LOCAL
    state over the bounded over-fetch, so it runs inside one Arrow
    batch per query — one exchange on query_id, zero driver-side
    rounds (the k-round loop serialized ~k job launches; measured
    ~4× wall at sf0.1 for identical output). The arithmetic is a
    bit-exact replica of the column-expression path (``_fold_cosine``
    / ``_round6``), unit-pinned equal — so the unrolled DuckDB twin
    certifies BOTH impls. ``impl='loop'`` keeps the k-round
    DataFrame form whose shape the oracle mirrors CTE-for-CTE."""
    if impl == "local":
        return _mmr_rerank_local(
            candidates, k, lam, query_col, id_col, rel_col, vec_col
        )
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


def _mmr_rerank_local(
    candidates: DataFrame,
    k: int,
    lam: float,
    query_col: str,
    id_col: str,
    rel_col: str,
    vec_col: str,
) -> DataFrame:
    """The Arrow-batched form of the greedy loop: one applyInPandas
    group per query (the candidate set is the retriever's bounded
    over-fetch, so per-group state is O(fetch × dim)). Every float op
    replays the loop impl's expression tree exactly — left-fold
    cosine, HALF_UP 6dp rounds, 2-ary max — hence bit-identical
    output (pinned by test_mmr_local_equals_loop_exactly)."""
    import pandas as pd

    oml = 1.0 - lam

    def greedy(pdf: pd.DataFrame) -> pd.DataFrame:
        rem: dict[int, tuple[float, list[float], float]] = {}
        for i, r, v in zip(pdf["id"], pdf["rel"], pdf["v"]):
            rem[int(i)] = (float(r), [float(x) for x in v], 0.0)
        # candidate ids must be unique per query: a dup would silently
        # collapse to its last row here while impl='loop' keeps both —
        # surface the contract violation instead of diverging
        if len(rem) != len(pdf):
            raise ValueError(
                "mmr_rerank: duplicate candidate ids within query "
                f"{int(pdf['query_id'].iloc[0])} "
                f"({len(pdf)} rows, {len(rem)} distinct ids)"
            )
        qid = int(pdf["query_id"].iloc[0]) if len(pdf) else 0
        out = {"query_id": [], "id": [], "rel": [], "mmr": [], "rank": []}
        for t in range(1, k + 1):
            if not rem:
                break
            best_id = min(
                rem, key=lambda i: (-(lam * rem[i][0] - oml * rem[i][2]), i)
            )
            r, v, ms = rem.pop(best_id)
            out["query_id"].append(qid)
            out["id"].append(best_id)
            out["rel"].append(r)
            out["mmr"].append(_round6(lam * r - oml * ms))
            out["rank"].append(t)
            for j, (rj, vj, msj) in rem.items():
                c = _round6(_fold_cosine(vj, v))
                if c > msj:
                    rem[j] = (rj, vj, c)
        return pd.DataFrame(out)

    prepped = candidates.select(
        F.col(query_col).alias("query_id"),
        F.col(id_col).alias("id"),
        F.col(rel_col).alias("rel"),
        to_double_array(F.col(vec_col)).alias("v"),
    )
    return prepped.groupBy("query_id").applyInPandas(
        greedy,
        schema="query_id long, id long, rel double, mmr double, rank long",
    )
