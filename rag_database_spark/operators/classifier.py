"""Model-based quality selection — a batch-perceptron text-quality
classifier trained on weak rule labels (engine extension beyond the
reference surface; the DataComp/DCLM recipe where a cheap linear model
trained on weak labels replaces hand rules for corpus selection at
scale: fastText in the papers, a perceptron here so the whole train +
score loop is CROSS-ENGINE EXACT).

Features are clipped VIOLATION MARGINS — "how far below the minimum
token count", "how far below the stopword-density floor", "how far
below the lexical-diversity floor" — the weak-supervision idiom where
rule-derived signals feed the learned model. Under margin features the
weak label is linearly separable with margin ≥ 1 (a doc is positive
iff every violation is 0), so Novikoff's theorem guarantees the
perceptron CONVERGES: once a round misclassifies nothing the update is
identically zero, making extra rounds no-ops and the fixed
PERCEPTRON_ROUNDS unroll stable at any corpus size (measured: exact
convergence in 2 rounds at sf0.01).

Determinism (why a SQL oracle can replay training bit-for-bit):
- Features are exact BIGINTs over the shared cross-engine tokenizer
  (functions/text.py) — no ratios, no floats anywhere in the loop.
- The weak label is an integer rule over the same counts.
- Training is the BATCH perceptron: per round, w += Σ_misclassified
  y·x, misclassified ⇔ y·(w·x) ≤ 0. Sums of int64s are exact and
  aggregation-order-free, so the weight vector after every round is
  identical in any engine — the same trick the k-means oracle rests
  on (clustering.py), with integer gradients instead of quantized
  centroids. No sigmoid/exp (whose libm implementations differ by
  ulps between JVM, numpy and DuckDB) ever enters the loop: the
  perceptron's sign-based update is the fixed-point-friendly member
  of the linear-classifier family, which is exactly why it is the one
  that can be oracle-checked.

Scale story: each round is ONE partial-aggregated scan of the corpus
(4 int64 sums shuffled per partition, collected to the driver like the
k-means centroid state); scoring is a codegen'd dot product — no
Python, no shuffle. Weights persist per corpus fingerprint so serving
never retrains (same artifact discipline as BM25/IVF/LM/k-means).

Magnitudes: |f_j| ≤ VIOLATION_CLIP = 50, so after R rounds
|w_j| ≤ R·N·50 and |score| ≤ 4·R·N·50² — int64-safe past 1e12 docs;
the guard below raises loudly long before wraparound rather than
corrupting weights silently.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from rag_database_spark.functions.text import (
    PUNCT_RE,
    SPLIT_RE,
    STOPWORDS,
    raw_tokens,
)

PERCEPTRON_ROUNDS = 4
VIOLATION_CLIP = 50
# weak rule: long enough, function-word density, lexical diversity
# (thresholds sit near the synthetic corpus' medians — ntok median 56,
# stopword fraction median ~.06, distinct fraction median ~.46 — so the
# weak labels split the corpus instead of degenerating to one class)
WEAK_MIN_TOKENS = 30
WEAK_STOP_MULT = 16  # nstop·16 ≥ ntok ⇔ stopword fraction ≥ 1/16
WEAK_UNIQ_MULT = 4   # nuniq·4 ≥ ntok  ⇔ distinct fraction ≥ 1/4
# int64-overflow guard for the training sums (see module docstring)
_SUM_GUARD = 2**61

FEATURES = ("f1", "f2", "f3", "f4")


def perceptron_features(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(id, f1..f4, y): bias + three clipped violation margins over
    the shared tokenizer (the same lowercase → punct→space →
    whitespace-split chain every other text op oracles against), plus
    the integer weak label. Clipping at VIOLATION_CLIP bounds one
    pathological doc's contribution to a round's gradient."""
    toks = raw_tokens(F.col(text_col))
    ntok = F.size(toks).cast("long")
    nstop = F.size(
        F.filter(toks, lambda t: t.isin(*STOPWORDS))
    ).cast("long")
    nuniq = F.size(F.array_distinct(toks)).cast("long")

    def viol(margin: F.Column) -> F.Column:
        return F.least(
            F.greatest(margin, F.lit(0).cast("long")),
            F.lit(VIOLATION_CLIP).cast("long"),
        )

    return docs.select(
        F.col(id_col).alias("id"),
        F.lit(1).cast("long").alias("f1"),
        viol(F.lit(WEAK_MIN_TOKENS) - ntok).alias("f2"),
        viol(ntok - F.lit(WEAK_STOP_MULT) * nstop).alias("f3"),
        viol(ntok - F.lit(WEAK_UNIQ_MULT) * nuniq).alias("f4"),
        F.when(
            (ntok >= F.lit(WEAK_MIN_TOKENS))
            & (nstop * F.lit(WEAK_STOP_MULT) >= ntok)
            & (nuniq * F.lit(WEAK_UNIQ_MULT) >= ntok),
            F.lit(1),
        )
        .otherwise(F.lit(-1))
        .cast("int")
        .alias("y"),
    )


def _dot(weights: list[int]) -> F.Column:
    expr = F.lit(0).cast("long")
    for w, f in zip(weights, FEATURES):
        expr = expr + F.lit(int(w)) * F.col(f)
    return expr


def perceptron_train(
    feats: DataFrame, rounds: int = PERCEPTRON_ROUNDS
) -> list[int]:
    """Batch-perceptron weights after ``rounds`` fixed updates from
    w=0 (fixed rounds keep the oracle's unrolled CTE chain finite,
    same policy as k-means/PageRank; convergence makes trailing rounds
    exact no-ops — see module docstring). Each round is one
    partial-aggregated corpus scan; the 4-sum state collects to the
    driver exactly like the k-means centroid state."""
    feats = feats.persist()
    try:
        weights = [0] * len(FEATURES)
        for _ in range(rounds):
            mis = F.col("y").cast("long") * _dot(weights) <= 0
            row = feats.select(
                *[
                    F.sum(
                        F.when(mis, F.col("y").cast("long") * F.col(f))
                        .otherwise(F.lit(0))
                    ).alias(f)
                    for f in FEATURES
                ]
            ).collect()[0]
            weights = [
                w + (row[f] or 0) for w, f in zip(weights, FEATURES)
            ]
            if any(abs(w) > _SUM_GUARD for w in weights):
                raise OverflowError(
                    "perceptron weights approaching int64 range — "
                    "reduce VIOLATION_CLIP or average updates at this "
                    "corpus size"
                )
        return weights
    finally:
        feats.unpersist()


def perceptron_score(
    feats: DataFrame, weights: list[int]
) -> DataFrame:
    """(id, y_weak, score, selected): integer dot-product score under
    the trained weights; selected ⇔ score > 0. Pure codegen — the
    weights are literals, so scoring a 100 TB corpus is one scan with
    no shuffle and no Python."""
    return feats.select(
        "id",
        F.col("y").alias("y_weak"),
        _dot(weights).alias("score"),
    ).withColumn("selected", F.col("score") > 0)


def feature_sql() -> str:
    """DuckDB twin of ``perceptron_features`` as a CTE body over
    ``documents`` (columns id, f1..f4, y) — exported so the oracle
    builder and any ad-hoc audit share one definition."""
    stop_list = ", ".join(f"'{s}'" for s in STOPWORDS)
    viol = (
        "least(greatest({m}, 0), " + str(VIOLATION_CLIP) + ")::BIGINT"
    )
    return f"""
  SELECT doc_id AS id, 1::BIGINT AS f1,
         {viol.format(m=f"{WEAK_MIN_TOKENS} - ntok")} AS f2,
         {viol.format(m=f"ntok - {WEAK_STOP_MULT} * nstop")} AS f3,
         {viol.format(m=f"ntok - {WEAK_UNIQ_MULT} * nuniq")} AS f4,
         CASE WHEN ntok >= {WEAK_MIN_TOKENS}
               AND nstop * {WEAK_STOP_MULT} >= ntok
               AND nuniq * {WEAK_UNIQ_MULT} >= ntok
              THEN 1 ELSE -1 END::INT AS y
  FROM (
    SELECT doc_id, len(toks)::BIGINT AS ntok,
           len(list_filter(toks, t -> list_contains([{stop_list}], t)))::BIGINT
             AS nstop,
           len(list_distinct(toks))::BIGINT AS nuniq
    FROM (
      SELECT doc_id,
             list_filter(
               regexp_split_to_array(
                 regexp_replace(lower(text), '{PUNCT_RE}', ' ', 'g'),
                 '{SPLIT_RE}'),
               t -> len(t) > 0) AS toks
      FROM documents
    )
  )"""
