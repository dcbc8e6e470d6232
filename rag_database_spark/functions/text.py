"""Text column functions — tokenizer, quality metrics, language ID,
token counting, fingerprints, shingles.

Everything here is a pure Spark column expression (JVM-side, inside
whole-stage codegen) — no Python UDFs. Each function mirrors a reference
behavior (file:line cited per function) and has an exact ANSI-SQL
equivalent so the DuckDB oracle can replay it; the shared constants
(STOPWORDS, regexes, thresholds) are exported and interpolated into the
oracle SQL from the same definitions.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Mirrors the reference BM25 tokenizer's stopword set
# (src/storage/bm25_store.py:38-100: lowercase, strip punctuation, split,
# drop stopwords, drop len<2). The exact membership is engine-defined; it
# is the single source of truth for BOTH the Spark plan and the DuckDB
# oracle SQL (interpolated there from this constant).
STOPWORDS: tuple[str, ...] = (
    "a", "an", "and", "are", "as", "at", "be", "but", "by", "can",
    "did", "do", "does", "for", "from", "had", "has", "have", "he",
    "her", "his", "i", "if", "in", "into", "is", "it", "its", "me",
    "my", "no", "not", "of", "on", "or", "our", "she", "so", "that",
    "the", "their", "them", "they", "this", "to", "was", "we", "were",
    "what", "when", "which", "who", "will", "with", "you", "your",
)

# Explicit whitespace class: Java regex \s includes \x0B but RE2
# (DuckDB) \s does not — spelling the class out keeps the Spark plan and
# the DuckDB oracle tokenizing identically on control whitespace.
WS_CLASS = " \\t\\n\\x0B\\f\\r"
# strip anything that is not word char or whitespace (bm25_store.py:63)
PUNCT_RE = rf"[^\w{WS_CLASS}]"
SPLIT_RE = rf"[{WS_CLASS}]+"
MIN_TOKEN_LEN = 2

# quality tier thresholds (reference document_quality.py:356-365)
QUALITY_HIGH = 0.8
QUALITY_MEDIUM = 0.5
QUALITY_LOW = 0.2


def raw_tokens(text_col: Column) -> Column:
    """lowercase → punctuation→space → whitespace split (keeps stopwords)."""
    cleaned = F.regexp_replace(F.lower(text_col), PUNCT_RE, " ")
    return F.filter(F.split(cleaned, SPLIT_RE), lambda t: F.length(t) > 0)


def tokenize(text_col: Column) -> Column:
    """Reference BM25 tokenizer F1 (bm25_store.py:38-100): raw tokens minus
    stopwords and tokens shorter than MIN_TOKEN_LEN. Keeps duplicates
    (term frequency matters); ``array_except`` would dedupe, so an
    element-wise filter is used instead."""
    return F.filter(
        raw_tokens(text_col),
        lambda t: (F.length(t) >= MIN_TOKEN_LEN) & ~t.isin(*STOPWORDS),
    )


def token_count_ws(text_col: Column) -> Column:
    """Whitespace token count (reference token_count proxy,
    unified_chunk.py token_count field)."""
    return F.size(
        F.filter(F.split(F.trim(text_col), SPLIT_RE), lambda t: F.length(t) > 0)
    )


# BPE-ish pre-tokenization: word pieces + standalone punctuation marks.
# Explicit classes (no \w/\s shorthand) so Java and RE2 agree.
BPE_RE = rf"[a-z0-9_]+|[^a-z0-9_{WS_CLASS}]"


def token_count_bpe_ish(text_col: Column) -> Column:
    """BPE-ish subword count: word pieces + standalone punctuation, the
    standard pre-tokenization regex family. Counts matches of BPE_RE
    over the lowercased text."""
    return F.size(F.regexp_extract_all(F.lower(text_col), F.lit(BPE_RE), 0))


def stopword_ratio(text_col: Column) -> Column:
    """Fraction of raw tokens that are stopwords (document_quality.py:346-353
    common-word coherence ratio). The token array is let-bound so the
    split regex runs once per row, not once per reference (r17)."""
    from rag_database_spark.functions.vector import let

    return let(
        raw_tokens(text_col),
        lambda toks: F.when(
            F.size(toks) > 0,
            F.size(F.filter(toks, lambda t: t.isin(*STOPWORDS)))
            / F.size(toks),
        ).otherwise(F.lit(0.0)),
    )


def unique_token_ratio(text_col: Column) -> Column:
    """distinct/total raw tokens (document_quality.py:181-190 word-diversity).
    Token array let-bound — one split per row (r17)."""
    from rag_database_spark.functions.vector import let

    return let(
        raw_tokens(text_col),
        lambda toks: F.when(
            F.size(toks) > 0, F.size(F.array_distinct(toks)) / F.size(toks)
        ).otherwise(F.lit(0.0)),
    )


def digit_ratio(text_col: Column) -> Column:
    """digits / chars (document_quality.py:207-354 character-mix signals)."""
    n = F.length(text_col)
    digits = n - F.length(F.regexp_replace(text_col, r"[0-9]", ""))
    return F.when(n > 0, digits / n).otherwise(F.lit(0.0))


# explicit class: Java/RE2-identical (see WS_CLASS note)
SPECIAL_RE = rf"[^a-zA-Z0-9{WS_CLASS}]"


def special_char_ratio(text_col: Column) -> Column:
    """non-alnum-non-space chars / chars (same reference family)."""
    n = F.length(text_col)
    special = n - F.length(F.regexp_replace(text_col, SPECIAL_RE, ""))
    return F.when(n > 0, special / n).otherwise(F.lit(0.0))


def avg_word_length(text_col: Column) -> Column:
    from rag_database_spark.functions.vector import let

    return let(
        raw_tokens(text_col),
        lambda toks: F.when(
            F.size(toks) > 0,
            F.aggregate(toks, F.lit(0), lambda acc, t: acc + F.length(t))
            / F.size(toks),
        ).otherwise(F.lit(0.0)),
    )


def quality_score(text_col: Column) -> Column:
    """Composite quality score in [0,1] — the engine's analog of the
    reference's weighted sub-scores (document_quality.py:150-169: weights
    .25/.30/.15/.15/.15 over ocr/structure/coherence/… signals). Our
    sub-scores are the model-free signals computable from text alone:

        0.30 * length_score      (saturates at 200 chars)
        0.25 * stopword_score    (coherent English prose has stopwords)
        0.25 * diversity_score   (unique-token ratio)
        0.20 * clean_score       (1 - special-char ratio)
    """
    from rag_database_spark.functions.vector import let

    length_score = F.least(F.length(text_col) / F.lit(200.0), F.lit(1.0))
    clean = F.lit(1.0) - special_char_ratio(text_col)

    # one let-bound token array shared by the stopword and diversity
    # terms (r17): the unbound form split the text twice per row. The
    # ratio formulas and the weighted chain are reproduced verbatim,
    # so the score is bit-identical.
    def _score(toks: Column) -> Column:
        nz = F.size(toks) > 0
        stop_ratio = F.when(
            nz,
            F.size(F.filter(toks, lambda t: t.isin(*STOPWORDS)))
            / F.size(toks),
        ).otherwise(F.lit(0.0))
        stop_score = F.least(stop_ratio * 4.0, F.lit(1.0))
        diversity = F.when(
            nz, F.size(F.array_distinct(toks)) / F.size(toks)
        ).otherwise(F.lit(0.0))
        return (
            0.30 * length_score
            + 0.25 * stop_score
            + 0.25 * diversity
            + 0.20 * clean
        )

    return let(raw_tokens(text_col), _score)


def quality_tier(score_col: Column) -> Column:
    """HIGH ≥ .8 / MEDIUM ≥ .5 / LOW ≥ .2 / GARBAGE
    (document_quality.py:356-365)."""
    return (
        F.when(score_col >= QUALITY_HIGH, "high")
        .when(score_col >= QUALITY_MEDIUM, "medium")
        .when(score_col >= QUALITY_LOW, "low")
        .otherwise("garbage")
    )


# -- language ID ------------------------------------------------------------
# n-gram/stopword heuristic: per-language marker lists; best hit-ratio wins.
# Engine extension (training-data pipeline surface); marker sets shared with
# the oracle SQL.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "in", "is", "that", "for", "with", "a"),
    "es": ("el", "la", "de", "que", "y", "en", "los", "del", "las", "por"),
    "de": ("der", "die", "und", "das", "ist", "von", "mit", "den", "nicht", "ein"),
    "fr": ("le", "la", "les", "de", "des", "et", "est", "dans", "pour", "une"),
}


def lang_hit_ratio(text_col: Column, lang: str) -> Column:
    toks = raw_tokens(text_col)
    hits = F.size(F.filter(toks, lambda t: t.isin(*LANG_MARKERS[lang])))
    return F.when(F.size(toks) > 0, hits / F.size(toks)).otherwise(F.lit(0.0))


def detect_language(text_col: Column, min_ratio: float = 0.05) -> Column:
    """argmax over LANG_MARKERS hit ratios, 'unknown' below min_ratio.
    Deterministic tie-break: language name ascending."""
    scored = F.array(
        *[
            F.struct(
                lang_hit_ratio(text_col, lang).alias("ratio"),
                F.lit(lang).alias("lang"),
            )
            for lang in sorted(LANG_MARKERS)
        ]
    )
    # comparator implements (ratio DESC, lang ASC) — sort_array on the
    # struct would break ratio ties by lang DESC, the wrong direction.
    best = F.array_sort(
        scored,
        lambda l, r: F.when(l["ratio"] > r["ratio"], F.lit(-1))
        .when(l["ratio"] < r["ratio"], F.lit(1))
        .when(l["lang"] < r["lang"], F.lit(-1))
        .when(l["lang"] > r["lang"], F.lit(1))
        .otherwise(F.lit(0)),
    )[0]
    return F.when(best["ratio"] >= min_ratio, best["lang"]).otherwise(F.lit("unknown"))


# -- fingerprints & shingles -------------------------------------------------


def doc_fingerprint(text_col: Column) -> Column:
    """Deterministic document fingerprint: md5 over the normalized token
    stream (reference id scheme uses md5 of content,
    document_processor.py:183-188)."""
    return F.md5(F.array_join(raw_tokens(text_col), " "))


def shingles(text_col: Column, k: int = 3) -> Column:
    """Distinct k-token shingles (word n-grams) of the raw token stream —
    the unit set for Jaccard / MinHash dedup."""
    toks = raw_tokens(text_col)
    n = F.size(toks)
    idx = F.sequence(F.lit(0), F.greatest(n - k, F.lit(0)))
    grams = F.transform(
        idx, lambda i: F.array_join(F.slice(toks, i + 1, k), " ")
    )
    return F.when(n >= k, F.array_distinct(grams)).otherwise(
        F.when(n > 0, F.array(F.array_join(toks, " "))).otherwise(
            F.array().cast("array<string>")
        )
    )


# -- winnowing (rolling-hash) fingerprints -----------------------------------
WINNOW_K = 8  # char k-gram length
WINNOW_W = 4  # window of consecutive k-gram hashes


def winnow_fingerprints(
    docs, id_col: str = "doc_id", text_col: str = "text",
    k: int = WINNOW_K, w: int = WINNOW_W,
):
    """Winnowing document fingerprints (Schleimer/Wilkerson/Aiken, the
    MOSS scheme — the rolling-hash fingerprinting the training-data
    brief names): hash every char k-gram of the normalized text, slide
    a window of ``w`` consecutive hashes, keep each window's minimum —
    guaranteed to share a fingerprint with any document overlapping by
    ≥ w+k-1 chars.

    Relational form: explode gram positions → ONE hash per row → a
    (0, w-1) sliding window min per document — linear work. (A nested
    array-lambda form re-evaluates the whole hash array per window and
    goes quadratic; higher-order lambdas defeat subexpression
    elimination.) Output: (doc_id, fingerprints sorted-distinct array;
    empty when the text is shorter than k)."""
    from pyspark.sql import DataFrame, Window
    from rag_database_spark.operators.dedup import hash60
    from rag_database_spark.sources.tables import fan_out

    raw_docs = docs  # un-fanned scan for the pruned final join
    docs = fan_out(docs)
    norm = docs.select(
        F.col(id_col).alias("doc_id"),
        F.array_join(raw_tokens(F.col(text_col)), " ").alias("s"),
    )
    grams = (
        norm.filter(F.length("s") >= k)
        .select(
            "doc_id",
            "s",
            F.explode(
                F.sequence(F.lit(1), F.length("s") - k + 1)
            ).alias("i"),
        )
        .select(
            "doc_id",
            "i",
            (F.length("s") - k + 1).alias("n_grams"),
            hash60(F.col("s").substr(F.col("i"), F.lit(k))).alias("h"),
        )
    )
    win = (
        Window.partitionBy("doc_id").orderBy("i").rowsBetween(0, w - 1)
    )
    mins = grams.withColumn("m", F.min("h").over(win)).filter(
        # full windows only — except a single partial window when the
        # doc has fewer than w grams (its min is the whole-array min)
        (F.col("i") <= F.col("n_grams") - w + 1)
        | ((F.col("n_grams") < w) & (F.col("i") == 1))
    )
    fps = mins.groupBy("doc_id").agg(
        F.array_sort(F.collect_set("m")).alias("fingerprints")
    )
    # join side pruned to doc_id: the round-robin exchange buys
    # nothing before a join that shuffles anyway (r17)
    return (
        raw_docs.select(F.col(id_col).alias("doc_id"))
        .join(fps, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(
                "fingerprints", F.array().cast("array<long>")
            ).alias("fingerprints"),
        )
    )
