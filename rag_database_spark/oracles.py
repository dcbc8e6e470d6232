"""DuckDB oracle SQL for every oracle-checkable query in ``queries()``.

Each function returns ANSI SQL that DuckDB runs over the same parquet
tables the Spark plan reads. Constants (stopwords, BM25 k1/b, RRF k and
weights, the query workload) are interpolated from the SAME Python
definitions the Spark operators use — one source of truth, no drift.

Column aliases match the Spark output exactly (driver hashes values by
column name). All float outputs are rounded to 6 decimals on BOTH sides.
"""

from __future__ import annotations

from rag_database_spark.functions.text import (
    MIN_TOKEN_LEN,
    PUNCT_RE,
    SPLIT_RE,
    STOPWORDS,
)
from rag_database_spark.operators.bm25 import B, K1
from rag_database_spark.operators.fusion import (
    DEFAULT_WEIGHTS,
    FETCH_MULTIPLIER,
    RRF_K,
)
from rag_database_spark.workload import HYBRID_LIMIT, queries_values_sql

_STOPLIST = ", ".join(f"'{s}'" for s in STOPWORDS)

# tokenizer: lower → punctuation→space → whitespace split → len>=2, not
# stopword. Mirrors functions/text.py::tokenize (bm25_store.py:38-100);
# the regexes are interpolated from the SAME constants the Spark plan
# uses (explicit whitespace class — Java and RE2 disagree on \s).
_TOKENIZE = (
    "unnest(regexp_split_to_array("
    f"regexp_replace(lower({{text}}), '{PUNCT_RE}', ' ', 'g'), '{SPLIT_RE}'))"
)


def _bm25_ctes(fetch: int) -> str:
    """Shared CTE block: corpus postings/stats + per-query BM25 ranking."""
    doc_tok = _TOKENIZE.format(text="text")
    q_tok = _TOKENIZE.format(text="query_text")
    return f"""
tok_raw AS (
  SELECT doc_id, {doc_tok} AS term FROM documents
),
tok AS (
  SELECT doc_id, term FROM tok_raw
  WHERE length(term) >= {MIN_TOKEN_LEN} AND term NOT IN ({_STOPLIST})
),
doclens AS (
  SELECT d.doc_id, coalesce(t.c, 0) AS dl
  FROM documents d
  LEFT JOIN (SELECT doc_id, count(*) AS c FROM tok GROUP BY doc_id) t
    ON d.doc_id = t.doc_id
),
stats AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM doclens),
postings AS (
  SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY doc_id, term
),
termstats AS (
  SELECT p.term, ln(1.0 + (s.n_docs - count(*) + 0.5) / (count(*) + 0.5)) AS idf
  FROM postings p, stats s GROUP BY p.term, s.n_docs
),
qtok_raw AS (
  SELECT query_id, {q_tok} AS term FROM {queries_values_sql()}
),
qterms AS (
  SELECT query_id, term, count(*) AS qtf FROM qtok_raw
  WHERE length(term) >= {MIN_TOKEN_LEN} AND term NOT IN ({_STOPLIST})
  GROUP BY query_id, term
),
bm25_scored AS (
  SELECT q.query_id, p.doc_id,
         sum(q.qtf * ts.idf * (p.tf * ({K1} + 1))
             / (p.tf + {K1} * (1 - {B} + {B} * dl.dl / s.avgdl))) AS score
  FROM qterms q
  JOIN postings p USING (term)
  JOIN termstats ts ON ts.term = q.term
  JOIN doclens dl ON dl.doc_id = p.doc_id
  CROSS JOIN stats s
  GROUP BY q.query_id, p.doc_id
),
bm25_ranked AS (
  SELECT query_id, doc_id, score,
         row_number() OVER (PARTITION BY query_id ORDER BY score DESC, doc_id) AS rank
  FROM bm25_scored
)"""


def _dense_ctes(fetch: int) -> str:
    return f"""
qv AS (
  SELECT q.query_id, e.embedding::DOUBLE[] AS qvec
  FROM {queries_values_sql()}
  JOIN embeddings e ON e.vec_id = q.query_vec_id
),
dense_scored AS (
  SELECT qv.query_id, e.vec_id AS id,
         list_cosine_similarity(qv.qvec, e.embedding::DOUBLE[]) AS score
  FROM qv CROSS JOIN embeddings e
),
dense_ranked AS (
  SELECT query_id, id, score,
         row_number() OVER (PARTITION BY query_id ORDER BY score DESC, id) AS rank
  FROM dense_scored
)"""


def bm25_topk_sql(limit: int = HYBRID_LIMIT * FETCH_MULTIPLIER) -> str:
    return f"""
WITH {_bm25_ctes(limit)}
SELECT query_id, doc_id, round(score, 6) AS score, rank::BIGINT AS rank
FROM bm25_ranked WHERE rank <= {limit}
"""


def dense_topk_sql(limit: int = HYBRID_LIMIT) -> str:
    return f"""
WITH {_dense_ctes(limit)}
SELECT query_id, id, round(score, 6) AS score, rank::BIGINT AS rank
FROM dense_ranked WHERE rank <= {limit}
"""


def hybrid_rrf_sql(
    limit: int = HYBRID_LIMIT,
    weights: dict[str, float] | None = None,
    rrf_k: int = RRF_K,
) -> str:
    weights = weights or DEFAULT_WEIGHTS
    fetch = FETCH_MULTIPLIER * limit
    w_bm25 = float(weights["bm25"])
    w_dense = float(weights["dense"])
    return f"""
WITH {_bm25_ctes(fetch)},
{_dense_ctes(fetch).lstrip()},
legs AS (
  SELECT query_id, doc_id AS id, 'bm25' AS method, rank
  FROM bm25_ranked WHERE rank <= {fetch}
  UNION ALL
  SELECT query_id, id, 'dense' AS method, rank
  FROM dense_ranked WHERE rank <= {fetch}
),
fused AS (
  SELECT query_id, id,
         round(sum(CASE method WHEN 'bm25' THEN {w_bm25}
                               WHEN 'dense' THEN {w_dense} END
                   / ({float(rrf_k)} + rank)), 6) AS rrf_score,
         max(CASE WHEN method = 'bm25' THEN rank END)::BIGINT AS bm25_rank,
         max(CASE WHEN method = 'dense' THEN rank END)::BIGINT AS dense_rank
  FROM legs GROUP BY query_id, id
)
SELECT query_id, id, rrf_score, bm25_rank, dense_rank,
       row_number() OVER (PARTITION BY query_id ORDER BY rrf_score DESC, id)::BIGINT AS rank
FROM fused
QUALIFY rank <= {limit}
"""
