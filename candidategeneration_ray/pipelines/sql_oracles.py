"""DuckDB oracle SQL for every SQL-expressible queries() entry.

Each SQL string re-derives the operator's semantics independently (no
engine code paths) over the driver's pre-registered views. The BM25
arithmetic is written with the SAME float64 operation order as
functions/bm25.py so quantized scores match bit-exactly:

    raw = ln((N - df + 0.5)/(df + 0.5))          -- idf
          * (0.5 + 0.5*tf/maxtf)                  -- nf
          * (1.6 + 1.0) / (nf + 1.6*(1 - 0.75 + 0.75*dl/avgdl))
    score = trunc(raw * 10000000)                 -- toward zero
with avgdl = total_tokens // n_docs (integer division,
utilsClass.java:116's long/long truncation).
"""

from __future__ import annotations

from candidategeneration_ray.functions.stopwords import STOPWORDS
from candidategeneration_ray.pipelines.docquery import DOC_QUERIES

_STOP_SQL = ", ".join(f"'{w}'" for w in sorted(STOPWORDS))

# kept tokens with their rank among KEPT tokens (kpos, 1-based) — the
# token sequence the reference indexes after HtmlpageCleaner filtering.
KEPT_CTE = f"""
kept AS (
  SELECT doc_id, tok,
         row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS kpos
  FROM (
    SELECT doc_id,
           lower(unnest(regexp_extract_all(text, '[A-Za-z0-9.]+'))) AS tok,
           generate_subscripts(regexp_extract_all(text, '[A-Za-z0-9.]+'), 1) AS pos
    FROM documents
  )
  WHERE length(tok) > 1
    AND (regexp_full_match(tok, '[a-z]+') OR regexp_full_match(tok, '[0-9]+'))
    AND tok NOT IN ({_STOP_SQL})
)
"""

SCORES_CTE = """
tf AS (SELECT doc_id, tok, CAST(count(*) AS DOUBLE) AS tf FROM kept GROUP BY doc_id, tok),
dl AS (SELECT doc_id, CAST(count(*) AS DOUBLE) AS dl FROM kept GROUP BY doc_id),
mx AS (SELECT doc_id, max(tf) AS maxtf FROM tf GROUP BY doc_id),
dft AS (SELECT tok, CAST(count(*) AS DOUBLE) AS df FROM tf GROUP BY tok),
gs AS (SELECT (SELECT CAST(count(*) AS BIGINT) FROM documents) AS n_docs,
              (SELECT CAST(count(*) AS BIGINT) FROM kept) AS total_tokens),
gs2 AS (SELECT CAST(n_docs AS DOUBLE) AS nd,
               CAST(total_tokens // n_docs AS DOUBLE) AS avgdl FROM gs),
scores AS (
  SELECT tf.doc_id, tf.tok,
         CAST(trunc(
           ln((nd - df + 0.5) / (df + 0.5))
           * (0.5 + 0.5 * tf / maxtf)
           * (1.6 + 1.0)
           / ((0.5 + 0.5 * tf / maxtf) + 1.6 * (1 - 0.75 + 0.75 * dl / avgdl))
           * 10000000
         ) AS BIGINT) AS score
  FROM tf
  JOIN dl USING (doc_id)
  JOIN mx USING (doc_id)
  JOIN dft USING (tok)
  CROSS JOIN gs2
)
"""


def _queries_values() -> str:
    rows = ", ".join(
        f"(CAST({qid} AS BIGINT), '{text}')" for qid, text in DOC_QUERIES
    )
    return f"qs(query_id, qtext) AS (VALUES {rows})"


QTOK_CTE = f"""
{_queries_values()},
qtok AS (
  SELECT DISTINCT query_id, tok FROM (
    SELECT query_id, lower(unnest(regexp_extract_all(qtext, '[A-Za-z0-9.]+'))) AS tok
    FROM qs
  )
  WHERE length(tok) > 1
    AND (regexp_full_match(tok, '[a-z]+') OR regexp_full_match(tok, '[0-9]+'))
    AND tok NOT IN ({_STOP_SQL})
)
"""


def core_oracles() -> dict[str, str]:
    return {
        "tokenize_counts": f"""
WITH {KEPT_CTE}
SELECT d.doc_id, CAST(coalesce(k.n, 0) AS BIGINT) AS n_tokens
FROM documents d
LEFT JOIN (SELECT doc_id, count(*) AS n FROM kept GROUP BY doc_id) k USING (doc_id)
""",
        "global_stats": f"""
WITH {KEPT_CTE}
SELECT CAST((SELECT count(*) FROM documents) AS BIGINT) AS n_docs,
       CAST(count(*) AS BIGINT) AS total_tokens,
       CAST(count(*) // (SELECT count(*) FROM documents) AS BIGINT) AS avgdl_trunc
FROM kept
""",
        "df_top50": f"""
WITH {KEPT_CTE}
SELECT tok AS term, CAST(count(*) AS BIGINT) AS df
FROM (SELECT DISTINCT doc_id, tok FROM kept)
GROUP BY tok
ORDER BY df DESC, term ASC
LIMIT 50
""",
        "term_postings": f"""
WITH {KEPT_CTE},
{SCORES_CTE}
SELECT doc_id, score FROM scores WHERE tok = 'vector' ORDER BY doc_id
""",
        "unigram_list_lengths": f"""
WITH {KEPT_CTE}
SELECT tok AS term, CAST(count(DISTINCT doc_id) AS BIGINT) AS n
FROM kept GROUP BY tok
""",
        "pair_counts_top50": f"""
WITH {KEPT_CTE},
pairs AS (
  SELECT DISTINCT a.doc_id,
         least(a.tok, b.tok) AS t1, greatest(a.tok, b.tok) AS t2
  FROM kept a JOIN kept b
    ON a.doc_id = b.doc_id AND b.kpos > a.kpos AND b.kpos <= a.kpos + 5
)
SELECT t1, t2, CAST(count(*) AS BIGINT) AS n_docs
FROM pairs GROUP BY t1, t2
ORDER BY n_docs DESC, t1 ASC, t2 ASC
LIMIT 50
""",
        "query_keys": f"""
WITH {KEPT_CTE},
{QTOK_CTE},
ids AS (
  SELECT tok, CAST(row_number() OVER (ORDER BY tok) AS BIGINT) AS tid
  FROM (SELECT DISTINCT tok FROM kept)
),
qid_ids AS (SELECT query_id, tid FROM qtok JOIN ids USING (tok))
SELECT query_id, tid AS key FROM qid_ids
UNION ALL
SELECT a.query_id, a.tid * 4294967296 + b.tid AS key
FROM qid_ids a JOIN qid_ids b
  ON a.query_id = b.query_id AND a.tid < b.tid
""",
        "access_counts": f"""
WITH {KEPT_CTE},
{QTOK_CTE}
SELECT tok AS term, CAST(count(DISTINCT query_id) AS BIGINT) AS n_queries
FROM qtok
WHERE tok IN (SELECT DISTINCT tok FROM kept)
GROUP BY tok
""",
        "bm25_topk": f"""
WITH {KEPT_CTE},
{SCORES_CTE},
{QTOK_CTE},
qscores AS (
  SELECT q.query_id, s.doc_id, CAST(sum(s.score) AS BIGINT) AS score
  FROM qtok q JOIN scores s USING (tok)
  GROUP BY q.query_id, s.doc_id
)
SELECT query_id, rank, doc_id, score FROM (
  SELECT query_id,
         CAST(row_number() OVER (PARTITION BY query_id
                                 ORDER BY score DESC, doc_id ASC) AS BIGINT) AS rank,
         doc_id, score
  FROM qscores
) WHERE rank <= 10
""",
    }
