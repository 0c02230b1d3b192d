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

import numpy as np

from candidategeneration_ray.functions import hashing as H
from candidategeneration_ray.functions.stopwords import STOPWORDS
from candidategeneration_ray.pipelines.docquery import DOC_QUERIES

_STOP_SQL = ", ".join(f"'{w}'" for w in sorted(STOPWORDS))

# kept tokens with their rank among KEPT tokens (kpos, 1-based) — the
# token sequence the reference indexes after HtmlpageCleaner filtering.
KEPT_CTE = f"""
kept AS MATERIALIZED (
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
scores AS MATERIALIZED (
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
        "delta_update_lists": f"""
WITH {KEPT_CTE}
SELECT tok AS term, CAST(count(*) AS BIGINT) AS n,
       CAST(sum(doc_id) AS BIGINT) AS doc_sum
FROM (SELECT DISTINCT doc_id, tok FROM kept) GROUP BY tok
""",
        "pruned_list_lengths": f"""
WITH {KEPT_CTE},
{SCORES_CTE},
ordered AS (
  SELECT tok, doc_id, score,
         row_number() OVER (PARTITION BY tok ORDER BY doc_id ASC) AS docpos
  FROM scores
),
pruned AS (
  SELECT tok, doc_id, score FROM ordered WHERE docpos <= 10
  UNION ALL
  SELECT tok, doc_id, score FROM (
    SELECT tok, doc_id, score,
           row_number() OVER (PARTITION BY tok
                              ORDER BY score DESC, doc_id ASC) AS rn
    FROM ordered WHERE docpos > 10
  ) WHERE rn <= 40
)
SELECT tok AS term, CAST(count(*) AS BIGINT) AS n,
       CAST(sum(doc_id) AS BIGINT) AS doc_sum,
       CAST(sum(score) AS BIGINT) AS score_sum
FROM pruned GROUP BY tok
""",
        # tombstone delete: lists exclude deleted docs, scores stay at
        # the frozen FULL-corpus epoch — SCORES_CTE runs over the whole
        # table and only the final selection filters live docs
        "tombstone_delete_lists": f"""
WITH {KEPT_CTE},
{SCORES_CTE}
SELECT tok AS term, CAST(count(*) AS BIGINT) AS n,
       CAST(sum(doc_id) AS BIGINT) AS doc_sum,
       CAST(sum(score) AS BIGINT) AS score_sum
FROM scores WHERE doc_id % 7 <> 3 GROUP BY tok
""",
        "delete_bm25_topk": f"""
WITH {KEPT_CTE},
{SCORES_CTE},
{QTOK_CTE},
qscores AS MATERIALIZED (
  SELECT q.query_id, s.doc_id, CAST(sum(s.score) AS BIGINT) AS score
  FROM qtok q JOIN scores s USING (tok)
  WHERE s.doc_id % 7 <> 3
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
ids AS MATERIALIZED (
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
        "topk_candidates": f"""
WITH {KEPT_CTE},
{SCORES_CTE},
{QTOK_CTE},
qtok_k AS (
  SELECT query_id, tok FROM qtok WHERE tok IN (SELECT DISTINCT tok FROM kept)
),
uni_top AS (
  SELECT tok, doc_id FROM (
    SELECT tok, doc_id,
           row_number() OVER (PARTITION BY tok
                              ORDER BY score DESC, doc_id ASC) AS rn
    FROM scores
  ) WHERE rn <= 100
),
pairs AS (
  SELECT DISTINCT a.doc_id,
         least(a.tok, b.tok) AS t1, greatest(a.tok, b.tok) AS t2
  FROM kept a JOIN kept b
    ON a.doc_id = b.doc_id AND b.kpos > a.kpos AND b.kpos <= a.kpos + 5
),
pair_scores AS MATERIALIZED (
  SELECT p.doc_id, p.t1, p.t2, s1.score + s2.score AS score
  FROM pairs p
  JOIN scores s1 ON s1.doc_id = p.doc_id AND s1.tok = p.t1
  JOIN scores s2 ON s2.doc_id = p.doc_id AND s2.tok = p.t2
),
pair_top AS (
  SELECT t1, t2, doc_id FROM (
    SELECT t1, t2, doc_id,
           row_number() OVER (PARTITION BY t1, t2
                              ORDER BY score DESC, doc_id ASC) AS rn
    FROM pair_scores
  ) WHERE rn <= 500
),
qpairs AS (
  SELECT a.query_id, a.tok AS t1, b.tok AS t2
  FROM qtok_k a JOIN qtok_k b
    ON a.query_id = b.query_id AND a.tok < b.tok
)
SELECT DISTINCT query_id, CAST(doc_id AS BIGINT) AS doc_id FROM (
  SELECT q.query_id, u.doc_id FROM qtok_k q JOIN uni_top u ON u.tok = q.tok
  UNION ALL
  SELECT qp.query_id, pt.doc_id FROM qpairs qp JOIN pair_top pt USING (t1, t2)
)
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
qscores AS MATERIALIZED (
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
        "textrank_terms": _textrank_sql(),
        "forward_export": f"""
WITH {KEPT_CTE},
{SCORES_CTE},
tid AS (
  SELECT tok, CAST(row_number() OVER (ORDER BY tok) AS BIGINT) AS id
  FROM (SELECT DISTINCT tok FROM kept)
)
SELECT s.doc_id,
       CAST(count(*) AS BIGINT) AS n_terms,
       CAST(sum(t.id) AS BIGINT) AS term_id_sum,
       CAST(sum(s.score) AS BIGINT) AS score_sum
FROM scores s JOIN tid t USING (tok)
GROUP BY s.doc_id
""",
        "more_like_this": f"""
WITH {KEPT_CTE},
{SCORES_CTE},
seeds(seed_doc) AS (VALUES (CAST(0 AS BIGINT)), (17), (42)),
exp AS (
  SELECT seed_doc, tok FROM (
    SELECT d.seed_doc, s.tok,
           row_number() OVER (PARTITION BY d.seed_doc
                              ORDER BY s.score DESC, s.tok ASC) AS rn
    FROM seeds d JOIN scores s ON s.doc_id = d.seed_doc
  ) WHERE rn <= 5
),
q2 AS (
  SELECT e.seed_doc, s.doc_id, CAST(sum(s.score) AS BIGINT) AS score
  FROM exp e JOIN scores s USING (tok)
  WHERE s.doc_id <> e.seed_doc
  GROUP BY 1, 2
)
SELECT seed_doc, rank, doc_id, score FROM (
  SELECT seed_doc,
         CAST(row_number() OVER (PARTITION BY seed_doc
                                 ORDER BY score DESC, doc_id ASC) AS BIGINT) AS rank,
         doc_id, score
  FROM q2
) WHERE rank <= 10
""",
        "prf_topk": f"""
WITH {KEPT_CTE},
{SCORES_CTE},
{QTOK_CTE},
qscores AS MATERIALIZED (
  SELECT q.query_id, s.doc_id, CAST(sum(s.score) AS BIGINT) AS score
  FROM qtok q JOIN scores s USING (tok)
  GROUP BY q.query_id, s.doc_id
),
rel AS (
  SELECT query_id, doc_id FROM (
    SELECT query_id, doc_id,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY score DESC, doc_id ASC) AS rn
    FROM qscores) WHERE rn <= 5
),
cand AS (
  SELECT r.query_id, s.tok, CAST(sum(s.score) AS BIGINT) AS esum
  FROM rel r JOIN scores s USING (doc_id)
  GROUP BY 1, 2
),
cand2 AS (
  SELECT c.* FROM cand c
  LEFT JOIN qtok q ON q.query_id = c.query_id AND q.tok = c.tok
  WHERE q.tok IS NULL
),
exp AS (
  SELECT query_id, tok FROM (
    SELECT query_id, tok,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY esum DESC, tok ASC) AS rn
    FROM cand2) WHERE rn <= 3
),
allt AS (
  SELECT query_id, tok FROM qtok
  UNION
  SELECT query_id, tok FROM exp
),
q2 AS (
  SELECT a.query_id, s.doc_id, CAST(sum(s.score) AS BIGINT) AS score
  FROM allt a JOIN scores s USING (tok)
  GROUP BY 1, 2
)
SELECT query_id, rank, doc_id, score FROM (
  SELECT query_id,
         CAST(row_number() OVER (PARTITION BY query_id
                                 ORDER BY score DESC, doc_id ASC) AS BIGINT) AS rank,
         doc_id, score
  FROM q2
) WHERE rank <= 10
""",
        "filtered_bm25_topk": f"""
WITH {KEPT_CTE},
{SCORES_CTE},
{QTOK_CTE},
qscores AS MATERIALIZED (
  SELECT q.query_id, s.doc_id, CAST(sum(s.score) AS BIGINT) AS score
  FROM qtok q
  JOIN scores s USING (tok)
  JOIN documents d ON d.doc_id = s.doc_id AND d.lang = 'en'
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
        "filtered_pair_counts": f"""
WITH {KEPT_CTE},
{QTOK_CTE},
qpairs AS (
  SELECT DISTINCT a.tok AS t1, b.tok AS t2
  FROM qtok a JOIN qtok b ON a.query_id = b.query_id AND a.tok < b.tok
  WHERE a.tok IN (SELECT DISTINCT tok FROM kept)
    AND b.tok IN (SELECT DISTINCT tok FROM kept)
),
pairs AS (
  SELECT DISTINCT a.doc_id,
         least(a.tok, b.tok) AS t1, greatest(a.tok, b.tok) AS t2
  FROM kept a JOIN kept b
    ON a.doc_id = b.doc_id AND b.kpos > a.kpos AND b.kpos <= a.kpos + 5
)
SELECT p.t1, p.t2, CAST(count(*) AS BIGINT) AS n_docs
FROM pairs p JOIN qpairs q ON p.t1 = q.t1 AND p.t2 = q.t2
GROUP BY p.t1, p.t2
""",
        "toplayer_prefixes": f"""
WITH {KEPT_CTE},
{SCORES_CTE},
{QTOK_CTE}
SELECT term, prefix_rank, doc_id, score FROM (
  SELECT s.tok AS term, s.doc_id, s.score,
         CAST(row_number() OVER (PARTITION BY s.tok
                                 ORDER BY s.score DESC, s.doc_id ASC) AS BIGINT)
           AS prefix_rank
  FROM scores s
  WHERE s.tok IN (SELECT tok FROM qtok)
) WHERE prefix_rank <= 3
""",
        "bigram_union_lists": f"""
WITH {KEPT_CTE},
{SCORES_CTE},
{QTOK_CTE},
qpairs AS (
  SELECT DISTINCT a.tok AS t1, b.tok AS t2
  FROM qtok a JOIN qtok b ON a.query_id = b.query_id AND a.tok < b.tok
  WHERE a.tok IN (SELECT DISTINCT tok FROM kept)
    AND b.tok IN (SELECT DISTINCT tok FROM kept)
),
top20 AS (
  SELECT tok, doc_id FROM (
    SELECT tok, doc_id,
           row_number() OVER (PARTITION BY tok ORDER BY score DESC, doc_id ASC) AS rn
    FROM scores
  ) WHERE rn <= 20
)
SELECT DISTINCT t1, t2, CAST(doc_id AS BIGINT) AS doc_id
FROM qpairs JOIN top20 ON tok = t1 OR tok = t2
""",
        "hit_index_top5": f"""
WITH {KEPT_CTE},
{QTOK_CTE},
prior AS (
  SELECT doc_id,
         CAST(row_number() OVER (ORDER BY n_chars DESC, doc_id ASC) AS BIGINT)
           AS hit_rank
  FROM documents
),
term_docs AS (SELECT DISTINCT tok, doc_id FROM kept)
SELECT term, prefix_rank, doc_id, hit_rank FROM (
  SELECT td.tok AS term, td.doc_id, p.hit_rank,
         CAST(row_number() OVER (PARTITION BY td.tok
                                 ORDER BY p.hit_rank ASC, td.doc_id ASC) AS BIGINT)
           AS prefix_rank
  FROM term_docs td JOIN prior p USING (doc_id)
  WHERE td.tok IN (SELECT tok FROM qtok)
) WHERE prefix_rank <= 5
""",
        # post-delta HIT family: the prior rank is epoch-independent, so
        # the family rebuilt over the delta'd LSM index must equal the
        # full-corpus derivation exactly — same SQL as hit_index_top5
        "delta_hit_top5": f"""
WITH {KEPT_CTE},
{QTOK_CTE},
prior AS (
  SELECT doc_id,
         CAST(row_number() OVER (ORDER BY n_chars DESC, doc_id ASC) AS BIGINT)
           AS hit_rank
  FROM documents
),
term_docs AS (SELECT DISTINCT tok, doc_id FROM kept)
SELECT term, prefix_rank, doc_id, hit_rank FROM (
  SELECT td.tok AS term, td.doc_id, p.hit_rank,
         CAST(row_number() OVER (PARTITION BY td.tok
                                 ORDER BY p.hit_rank ASC, td.doc_id ASC) AS BIGINT)
           AS prefix_rank
  FROM term_docs td JOIN prior p USING (doc_id)
  WHERE td.tok IN (SELECT tok FROM qtok)
) WHERE prefix_rank <= 5
""",
        "hit_postings": f"""
WITH {KEPT_CTE},
{SCORES_CTE},
prior AS (
  SELECT doc_id,
         CAST(row_number() OVER (ORDER BY n_chars DESC, doc_id ASC) AS BIGINT)
           AS hit_rank
  FROM documents
)
SELECT s.doc_id, p.hit_rank
FROM scores s JOIN prior p USING (doc_id)
WHERE s.tok = 'vector'
""",
        # hybrid dense+sparse RRF fusion: sparse = BM25 ranking, dense =
        # cosine vs the sparse rank-1 doc's embedding (dense PRF seed);
        # rrf_micro = sum(1e6 // (60 + rank)) over both top-20 lists
        "hybrid_topk": f"""
WITH {KEPT_CTE},
{SCORES_CTE},
{QTOK_CTE},
qscores AS MATERIALIZED (
  SELECT q.query_id, s.doc_id, CAST(sum(s.score) AS BIGINT) AS score
  FROM qtok q JOIN scores s USING (tok)
  GROUP BY q.query_id, s.doc_id
),
sparse AS (
  SELECT query_id, doc_id,
         CAST(row_number() OVER (PARTITION BY query_id
                                 ORDER BY score DESC, doc_id ASC) AS BIGINT) AS r
  FROM qscores
),
sparse_top AS (SELECT query_id, doc_id, r FROM sparse WHERE r <= 20),
seeds AS (SELECT query_id, doc_id AS seed FROM sparse WHERE r = 1),
dense AS (
  SELECT query_id, doc_id, r FROM (
    SELECT s.query_id, CAST(e.vec_id AS BIGINT) AS doc_id,
           CAST(row_number() OVER (
             PARTITION BY s.query_id
             ORDER BY list_cosine_similarity(e.embedding, se.embedding) DESC,
                      e.vec_id ASC) AS BIGINT) AS r
    FROM seeds s
    JOIN embeddings se ON se.vec_id = s.seed
    CROSS JOIN embeddings e
  ) WHERE r <= 20
),
fused AS (
  SELECT query_id, doc_id,
         CAST(sum(1000000 // (60 + r)) AS BIGINT) AS rrf_micro
  FROM (SELECT * FROM sparse_top UNION ALL SELECT * FROM dense)
  GROUP BY query_id, doc_id
)
SELECT query_id, rank, doc_id, rrf_micro FROM (
  SELECT query_id,
         CAST(row_number() OVER (PARTITION BY query_id
                                 ORDER BY rrf_micro DESC, doc_id ASC) AS BIGINT)
           AS rank,
         doc_id, rrf_micro
  FROM fused
) WHERE rank <= 10
""",
    }


# --- predictive layer (quality model + greedy selection) ----------------
#
# Independent SQL re-derivation of state/selection.py:
#   geometric buckets (Selection.java:33-55 len 4/+10%, :46-55 rank
#   11/+40%) as recursive CTEs with the same int-truncating recurrence;
#   quality-model fill (NewQualityModel.java:148-195) as window-function
#   impact-rank scans against the exact BM25 top-10 ground truth;
#   budgeted greedy depth selection (algo_toplayer.h:272-374, 5x pair
#   weight) as a recursive CTE that simulates the heap one pop per
#   iteration — priorities are integer-ratio doubles on both sides, so
#   float comparisons match bit-exactly.

_MODEL_CTE = f"""
ids AS MATERIALIZED (
  SELECT tok, CAST(row_number() OVER (ORDER BY tok) AS BIGINT) AS tid
  FROM (SELECT DISTINCT tok FROM kept)
),
qterm AS MATERIALIZED (SELECT q.query_id, q.tok, i.tid FROM qtok q JOIN ids i USING (tok)),
qsco AS (
  SELECT q.query_id, s.doc_id, CAST(sum(s.score) AS BIGINT) AS score
  FROM qtok q JOIN scores s USING (tok)
  GROUP BY q.query_id, s.doc_id
),
qgt AS MATERIALIZED (
  SELECT query_id, doc_id FROM (
    SELECT query_id, doc_id,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY score DESC, doc_id ASC) AS rn
    FROM qsco
  ) WHERE rn <= 10
),
gtn AS (SELECT query_id, CAST(count(*) AS BIGINT) AS gt_n FROM qgt GROUP BY query_id),
ulen AS MATERIALIZED (SELECT tok, CAST(count(*) AS BIGINT) AS n FROM scores GROUP BY tok),
uimp AS MATERIALIZED (
  SELECT tok, doc_id,
         CAST(row_number() OVER (PARTITION BY tok
                                 ORDER BY score DESC, doc_id ASC) AS BIGINT) AS rn
  FROM scores WHERE tok IN (SELECT tok FROM qterm)
),
allpairs AS MATERIALIZED (
  SELECT DISTINCT a.doc_id, least(a.tok, b.tok) AS t1, greatest(a.tok, b.tok) AS t2
  FROM kept a JOIN kept b
    ON a.doc_id = b.doc_id AND b.kpos > a.kpos AND b.kpos <= a.kpos + 5
),
plen AS MATERIALIZED (SELECT t1, t2, CAST(count(*) AS BIGINT) AS n FROM allpairs GROUP BY t1, t2),
qpair AS MATERIALIZED (
  SELECT a.query_id, a.tok AS t1, b.tok AS t2, a.tid AS tid1, b.tid AS tid2
  FROM qterm a JOIN qterm b ON a.query_id = b.query_id AND a.tok < b.tok
),
ppost AS (
  SELECT p.t1, p.t2, p.doc_id, s1.score + s2.score AS score
  FROM allpairs p
  JOIN scores s1 ON s1.doc_id = p.doc_id AND s1.tok = p.t1
  JOIN scores s2 ON s2.doc_id = p.doc_id AND s2.tok = p.t2
  WHERE EXISTS (SELECT 1 FROM qpair qp WHERE qp.t1 = p.t1 AND qp.t2 = p.t2)
),
pimp AS MATERIALIZED (
  SELECT t1, t2, doc_id,
         CAST(row_number() OVER (PARTITION BY t1, t2
                                 ORDER BY score DESC, doc_id ASC) AS BIGINT) AS rn
  FROM ppost
),
maxl AS (
  SELECT greatest(coalesce((SELECT max(n) FROM ulen), 0),
                  coalesce((SELECT max(n) FROM plen), 0)) AS m
),
lb0(v) AS (
  SELECT CAST(4 AS BIGINT) WHERE 4 < (SELECT greatest(m, 5) FROM maxl)
  UNION ALL
  SELECT v + CAST(trunc(v * 1.1) AS BIGINT) FROM lb0
  WHERE v + CAST(trunc(v * 1.1) AS BIGINT) < (SELECT greatest(m, 5) FROM maxl)
),
lb AS MATERIALIZED (SELECT v FROM lb0 UNION ALL SELECT greatest(m, 5) AS v FROM maxl),
rb0(v) AS (
  SELECT CAST(11 AS BIGINT) WHERE 11 < (SELECT greatest(m, 12) FROM maxl)
  UNION ALL
  SELECT v + CAST(trunc(v * 1.4) AS BIGINT) FROM rb0
  WHERE v + CAST(trunc(v * 1.4) AS BIGINT) < (SELECT greatest(m, 12) FROM maxl)
),
rb AS MATERIALIZED (SELECT v FROM rb0 UNION ALL SELECT greatest(m, 12) AS v FROM maxl),
u_opp AS (
  SELECT 0 AS family, (SELECT count(*) FROM lb WHERE v < ul.n) AS x, g.gt_n AS w
  FROM qterm q JOIN ulen ul ON ul.tok = q.tok
  JOIN gtn g ON g.query_id = q.query_id
),
u_hit AS (
  SELECT 0 AS family,
         (SELECT count(*) FROM lb WHERE v < ul.n) AS x,
         (SELECT count(*) FROM rb WHERE v < ui.rn) AS y
  FROM qterm q
  JOIN ulen ul ON ul.tok = q.tok
  JOIN uimp ui ON ui.tok = q.tok
  JOIN qgt g ON g.query_id = q.query_id AND g.doc_id = ui.doc_id
),
p_opp AS (
  SELECT 1 AS family, (SELECT count(*) FROM lb WHERE v < pl.n) AS x, g.gt_n AS w
  FROM qpair qp JOIN plen pl ON pl.t1 = qp.t1 AND pl.t2 = qp.t2
  JOIN gtn g ON g.query_id = qp.query_id
),
p_hit AS (
  SELECT 1 AS family,
         (SELECT count(*) FROM lb WHERE v < pl.n) AS x,
         (SELECT count(*) FROM rb WHERE v < pi.rn) AS y
  FROM qpair qp
  JOIN plen pl ON pl.t1 = qp.t1 AND pl.t2 = qp.t2
  JOIN pimp pi ON pi.t1 = qp.t1 AND pi.t2 = qp.t2
  JOIN qgt g ON g.query_id = qp.query_id AND g.doc_id = pi.doc_id
),
hitagg AS (
  SELECT family, x, y, CAST(count(*) AS BIGINT) AS hits
  FROM (SELECT * FROM u_hit UNION ALL SELECT * FROM p_hit) GROUP BY family, x, y
),
oppagg AS (
  SELECT family, x, CAST(sum(w) AS BIGINT) AS opps
  FROM (SELECT * FROM u_opp UNION ALL SELECT * FROM p_opp) GROUP BY family, x
),
lbx AS MATERIALIZED (SELECT CAST(row_number() OVER (ORDER BY v) - 1 AS BIGINT) AS x, v FROM lb),
rbx AS MATERIALIZED (SELECT CAST(row_number() OVER (ORDER BY v) - 1 AS BIGINT) AS y, v FROM rb),
grid AS (
  SELECT f.family, lbx.x, rbx.y
  FROM (SELECT 0 AS family UNION ALL SELECT 1) f
  CROSS JOIN lbx CROSS JOIN rbx
),
model AS MATERIALIZED (
  SELECT g.family, g.x, g.y,
         least(greatest(
           CAST(sum(coalesce(h.hits, 0)) OVER
                  (PARTITION BY g.family, g.x ORDER BY g.y
                   ROWS UNBOUNDED PRECEDING) AS DOUBLE)
           / CAST(greatest(coalesce(o.opps, 0), 1) AS DOUBLE), 0.0), 1.0) AS p
  FROM grid g
  LEFT JOIN hitagg h ON h.family = g.family AND h.x = g.x AND h.y = g.y
  LEFT JOIN oppagg o ON o.family = g.family AND o.x = g.x
)
"""


def predictive_oracles() -> dict[str, str]:
    return {
        "quality_model": f"""
WITH RECURSIVE {KEPT_CTE},
{SCORES_CTE},
{QTOK_CTE},
{_MODEL_CTE}
SELECT CASE WHEN family = 0 THEN 'unigram' ELSE 'pair' END AS family,
       x AS len_bucket, y AS rank_bucket, p AS p_found
FROM model
""",
        "predictive_candidates": f"""
WITH RECURSIVE {KEPT_CTE},
{SCORES_CTE},
{QTOK_CTE},
{_MODEL_CTE},
klists AS (
  SELECT k.query_id, k.key, k.family, k.n,
         (SELECT count(*) FROM lb WHERE v < k.n) AS x
  FROM (
    SELECT q.query_id, q.tid AS key, 0 AS family, ul.n
    FROM qterm q JOIN ulen ul ON ul.tok = q.tok
    UNION ALL
    SELECT qp.query_id, qp.tid1 * 4294967296 + qp.tid2 AS key, 1 AS family, pl.n
    FROM qpair qp JOIN plen pl ON pl.t1 = qp.t1 AND pl.t2 = qp.t2
  ) k
),
chunks AS MATERIALIZED (
  SELECT k.query_id, k.key, r.y,
         least(r.v, k.n) AS depth,
         least(r.v, k.n) - coalesce(rp.v, 0) AS cost,
         (CASE WHEN k.family = 1 THEN 5.0 ELSE 1.0 END
          * (m.p - coalesce(mp.p, 0.0)))
           / CAST(least(r.v, k.n) - coalesce(rp.v, 0) AS DOUBLE) AS priority
  FROM klists k
  CROSS JOIN rbx r
  LEFT JOIN rbx rp ON rp.y = r.y - 1
  JOIN model m ON m.family = k.family AND m.y = r.y AND m.x = k.x
  LEFT JOIN model mp ON mp.family = k.family AND mp.y = r.y - 1 AND mp.x = k.x
  WHERE r.y = 0 OR rp.v < k.n
),
greedy AS (
  SELECT query_id, 0 AS it, CAST(0 AS BIGINT) AS spent,
         CAST([] AS BIGINT[]) AS selkeys,
         CAST([] AS BIGINT[]) AS seldepths,
         CAST([] AS BIGINT[]) AS dead
  FROM (SELECT DISTINCT query_id FROM chunks)
  UNION ALL
  SELECT g.query_id, g.it + 1,
         CASE WHEN g.spent + p.cost <= 3000 THEN g.spent + p.cost ELSE g.spent END,
         CASE WHEN g.spent + p.cost <= 3000 THEN list_append(g.selkeys, p.key)
              ELSE g.selkeys END,
         CASE WHEN g.spent + p.cost <= 3000 THEN list_append(g.seldepths, p.depth)
              ELSE g.seldepths END,
         CASE WHEN g.spent + p.cost <= 3000 THEN g.dead
              ELSE list_append(g.dead, p.key) END
  FROM greedy g, LATERAL (
    SELECT c.key, c.depth, c.cost
    FROM chunks c
    WHERE c.query_id = g.query_id
      AND NOT list_contains(g.dead, c.key)
      AND c.y = len(list_filter(g.selkeys, k -> k = c.key))
    ORDER BY c.priority DESC, c.key ASC
    LIMIT 1
  ) p
  WHERE g.spent < 3000
),
gfin AS (
  SELECT query_id, selkeys, seldepths FROM (
    SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY it DESC) AS rr
    FROM greedy
  ) WHERE rr = 1
),
seldepth AS (
  SELECT query_id, key, max(depth) AS depth FROM (
    SELECT query_id, unnest(selkeys) AS key, unnest(seldepths) AS depth FROM gfin
  ) GROUP BY query_id, key
),
impacts AS (
  SELECT i.tid AS key, u.doc_id, u.rn FROM uimp u JOIN ids i USING (tok)
  UNION ALL
  SELECT ia.tid * 4294967296 + ib.tid AS key, p.doc_id, p.rn
  FROM pimp p JOIN ids ia ON ia.tok = p.t1 JOIN ids ib ON ib.tok = p.t2
),
pool AS (
  SELECT DISTINCT s.query_id, im.doc_id
  FROM seldepth s JOIN impacts im ON im.key = s.key AND im.rn <= s.depth
),
scored AS (
  SELECT p.query_id, p.doc_id,
         CAST(coalesce(sum(qs.score), 0) AS BIGINT) AS score
  FROM pool p
  LEFT JOIN (SELECT q.query_id, s.doc_id, s.score
             FROM qterm q JOIN scores s ON s.tok = q.tok) qs
    ON qs.query_id = p.query_id AND qs.doc_id = p.doc_id
  GROUP BY p.query_id, p.doc_id
)
SELECT query_id, CAST(rn AS BIGINT) AS rank, doc_id, score
FROM (
  SELECT query_id, doc_id, score,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY score DESC, doc_id ASC) AS rn
  FROM scored
) WHERE rn <= 10
""",
    }


# --- extras (dedup / similarity / text analysis) -----------------------

_P = H.MERSENNE_P
_H64 = "('0x' || substr(md5({expr}), 1, 16))::UBIGINT"

# per-doc ordered kept-token lists, INCLUDING empty docs (empty list)
_DOCS_TOKS = """
docs_toks AS (
  SELECT d.doc_id, coalesce(k.l, []) AS l
  FROM documents d
  LEFT JOIN (SELECT doc_id, list(tok ORDER BY kpos) AS l FROM kept GROUP BY doc_id) k
    USING (doc_id)
)
"""


def _shingle_cte(w: int) -> str:
    """DISTINCT md5-hashed w-word shingles per doc; a doc shorter than w
    yields one shingle of its whole token list (matches
    functions/hashing.py word_shingles)."""
    hexpr = _H64.format(
        expr=f"CASE WHEN len(l) <= {w} THEN array_to_string(l, ' ') "
             f"ELSE array_to_string(list_slice(l, i, i + {w - 1}), ' ') END")
    return f"""
pos AS (
  SELECT doc_id, l,
         unnest(range(1, CASE WHEN len(l) <= {w} THEN 2 ELSE len(l) - {w - 2} END)) AS i
  FROM docs_toks
),
sh AS (SELECT DISTINCT doc_id, {hexpr} AS h FROM pos)
"""


def _perm_values() -> str:
    rows = ", ".join(f"({i}, {a}, {b})" for i, (a, b) in enumerate(H.MINHASH_PERMS))
    return f"perms(perm_id, a, b) AS (VALUES {rows})"


_MINHASH_CTE = f"""
{_perm_values()},
mh AS (
  SELECT doc_id, CAST(perm_id AS BIGINT) AS perm_id,
         CAST(min((a::HUGEINT * (h % {_P}) + b) % {_P}) AS BIGINT) AS minhash
  FROM sh CROSS JOIN perms
  GROUP BY doc_id, perm_id
)
"""

_WORDS_CTE = f"""
words AS (
  SELECT doc_id, lower(unnest(regexp_extract_all(text, '[A-Za-z]+'))) AS w
  FROM documents
),
wstats AS (
  SELECT doc_id,
         CAST(count(*) AS BIGINT) AS n_words,
         CAST(count(*) FILTER (w IN ({_STOP_SQL})) AS BIGINT) AS n_stop
  FROM words GROUP BY doc_id
)
"""


def extras_oracles() -> dict[str, str]:
    return {
        "dedup_exact": """
SELECT md5(text) AS text_md5,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(min(doc_id) AS BIGINT) AS keep_doc_id
FROM documents GROUP BY md5(text)
""",
        "jaccard_pairs": f"""
WITH {KEPT_CTE},
{_DOCS_TOKS},
{_shingle_cte(H.SHINGLE_W)},
sizes AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n FROM sh GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, CAST(count(*) AS BIGINT) AS inter_n
  FROM sh a JOIN sh b ON a.h = b.h AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
)
SELECT doc_a, doc_b, inter_n, sa.n + sb.n - inter_n AS union_n
FROM inter
JOIN sizes sa ON sa.doc_id = doc_a
JOIN sizes sb ON sb.doc_id = doc_b
WHERE inter_n * 100 >= 20 * (sa.n + sb.n - inter_n)
""",
        "minhash_signatures": f"""
WITH {KEPT_CTE},
{_DOCS_TOKS},
{_shingle_cte(H.SHINGLE_W)},
{_MINHASH_CTE}
SELECT CAST(doc_id AS BIGINT) AS doc_id, perm_id, minhash FROM mh
""",
        "minhash_lsh_pairs": f"""
WITH {KEPT_CTE},
{_DOCS_TOKS},
{_shingle_cte(H.SHINGLE_W)},
{_MINHASH_CTE},
bandsig AS (
  SELECT doc_id, perm_id // {H.LSH_ROWS} AS band_id,
         md5(string_agg(minhash::VARCHAR, '-' ORDER BY perm_id)) AS band_sig
  FROM mh GROUP BY doc_id, perm_id // {H.LSH_ROWS}
),
starred AS (
  SELECT doc_id, min(doc_id) OVER (PARTITION BY band_id, band_sig) AS rep
  FROM bandsig
)
SELECT DISTINCT CAST(rep AS BIGINT) AS doc_a, CAST(doc_id AS BIGINT) AS doc_b
FROM starred WHERE doc_id > rep
""",
        "dup_clusters": f"""
WITH RECURSIVE {KEPT_CTE},
{_DOCS_TOKS},
{_shingle_cte(H.SHINGLE_W)},
{_MINHASH_CTE},
bandsig AS (
  SELECT doc_id, perm_id // {H.LSH_ROWS} AS band_id,
         md5(string_agg(minhash::VARCHAR, '-' ORDER BY perm_id)) AS band_sig
  FROM mh GROUP BY doc_id, perm_id // {H.LSH_ROWS}
),
lsh_pairs AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bandsig a JOIN bandsig b
    ON a.band_id = b.band_id AND a.band_sig = b.band_sig AND a.doc_id < b.doc_id
),
edges AS (
  SELECT doc_a AS src, doc_b AS dst FROM lsh_pairs
  UNION ALL
  SELECT doc_b AS src, doc_a AS dst FROM lsh_pairs
),
reach(node, lbl) AS (
  SELECT doc_id, doc_id FROM documents
  UNION
  SELECT e.dst, r.lbl FROM reach r JOIN edges e ON e.src = r.node
)
SELECT CAST(node AS BIGINT) AS doc_id, CAST(min(lbl) AS BIGINT) AS cluster
FROM reach GROUP BY node
""",
        "simhash": f"""
WITH {KEPT_CTE},
bits AS (SELECT unnest(range(0, {H.SIMHASH_BITS})) AS b),
tok_h AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS tf, {_H64.format(expr='tok')} AS h
  FROM kept GROUP BY doc_id, tok
),
bitsum AS (
  SELECT doc_id, b,
         sum(CASE WHEN (h >> b) & 1 = 1 THEN tf ELSE -tf END) AS s
  FROM tok_h CROSS JOIN bits GROUP BY doc_id, b
),
sim AS (
  SELECT doc_id,
         CAST(sum(CASE WHEN s > 0 THEN (1::BIGINT << b) ELSE 0 END) AS BIGINT) AS simhash
  FROM bitsum GROUP BY doc_id
)
SELECT CAST(d.doc_id AS BIGINT) AS doc_id, coalesce(sim.simhash, 0) AS simhash
FROM documents d LEFT JOIN sim USING (doc_id)
""",
        "simhash_neardups": f"""
WITH {KEPT_CTE},
bits AS (SELECT unnest(range(0, {H.SIMHASH_BITS})) AS b),
tok_h AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS tf, {_H64.format(expr='tok')} AS h
  FROM kept GROUP BY doc_id, tok
),
bitsum AS (
  SELECT doc_id, b,
         sum(CASE WHEN (h >> b) & 1 = 1 THEN tf ELSE -tf END) AS s
  FROM tok_h CROSS JOIN bits GROUP BY doc_id, b
),
sim0 AS (
  SELECT doc_id,
         CAST(sum(CASE WHEN s > 0 THEN (1::BIGINT << b) ELSE 0 END) AS BIGINT) AS simhash
  FROM bitsum GROUP BY doc_id
),
sim AS (
  SELECT d.doc_id, coalesce(sim0.simhash, 0) AS simhash
  FROM documents d LEFT JOIN sim0 USING (doc_id)
)
SELECT CAST(a.doc_id AS BIGINT) AS doc_a, CAST(b.doc_id AS BIGINT) AS doc_b
FROM sim a JOIN sim b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
""",
        "embedding_neardups": """
WITH unitized AS (
  SELECT vec_id, embedding FROM embeddings
)
SELECT CAST(a.vec_id AS BIGINT) AS vec_a, CAST(b.vec_id AS BIGINT) AS vec_b
FROM unitized a JOIN unitized b ON a.vec_id < b.vec_id
WHERE list_cosine_similarity(a.embedding, b.embedding) * 100 >= 40
""",
        "ann_cosine_top10": """
WITH scored AS (
  SELECT vec_id,
         list_cosine_similarity(embedding,
             (SELECT embedding FROM embeddings WHERE vec_id = 0)) AS cos
  FROM embeddings
)
SELECT rank, vec_id FROM (
  SELECT CAST(row_number() OVER (ORDER BY cos DESC, vec_id ASC) AS BIGINT) AS rank,
         CAST(vec_id AS BIGINT) AS vec_id
  FROM scored
) WHERE rank <= 10
""",
        "duplicate_spans": f"""
WITH {KEPT_CTE},
wn AS (SELECT doc_id, count(*) AS n FROM kept GROUP BY doc_id),
sh AS (
  SELECT k.doc_id, k.kpos,
         string_agg(tok, ' ') OVER (PARTITION BY k.doc_id ORDER BY k.kpos
                                    ROWS BETWEEN CURRENT ROW AND 19 FOLLOWING) AS s
  FROM kept k
),
spans AS (
  SELECT DISTINCT sh.doc_id, sh.s
  FROM sh JOIN wn ON wn.doc_id = sh.doc_id
  WHERE sh.kpos + 19 <= wn.n OR (sh.kpos = 1 AND wn.n < 20)
  UNION ALL
  SELECT d.doc_id, '' AS s FROM documents d
  WHERE d.doc_id NOT IN (SELECT DISTINCT doc_id FROM kept)
),
df AS (SELECT s, count(DISTINCT doc_id) AS df FROM spans GROUP BY s)
SELECT CAST(sp.doc_id AS BIGINT) AS doc_id,
       CAST(count(*) AS BIGINT) AS n_spans,
       CAST(count(*) FILTER (df.df >= 2) AS BIGINT) AS n_dup_spans
FROM spans sp JOIN df USING (s)
GROUP BY sp.doc_id
""",
        # exact-substring dedup removal: same kept-token stream, same
        # 10-token md5 window hashes, owner = min(doc_id<<20 | start);
        # covered positions dropped, clean text re-joined — the string
        # itself hash-verifies.
        "dedup_substrings": f"""
WITH {KEPT_CTE},
{_DOCS_TOKS},
win AS (
  SELECT doc_id, CAST(i AS BIGINT) AS i,
         {_H64.format(expr="array_to_string(list_slice(l, i, i + 9), ' ')")} AS h
  FROM (SELECT doc_id, l, unnest(range(1, len(l) - 8)) AS i FROM docs_toks)
),
own AS (SELECT h, min(doc_id * 1048576 + i) AS keep FROM win GROUP BY h),
cov AS (
  SELECT w.doc_id, w.i
  FROM win w JOIN own o USING (h)
  WHERE w.doc_id * 1048576 + w.i <> o.keep
),
covpos AS (
  SELECT DISTINCT doc_id, i + o AS p
  FROM cov CROSS JOIN (SELECT unnest(range(0, 10)) AS o) offs
),
keptok AS (
  SELECT k.doc_id, k.tok, k.kpos
  FROM kept k LEFT JOIN covpos c ON k.doc_id = c.doc_id AND k.kpos = c.p
  WHERE c.doc_id IS NULL
),
agg AS (SELECT doc_id, string_agg(tok, ' ' ORDER BY kpos) AS t FROM keptok GROUP BY doc_id),
nrem AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS r FROM covpos GROUP BY doc_id)
SELECT CAST(d.doc_id AS BIGINT) AS doc_id,
       coalesce(a.t, '') AS clean_text,
       CAST(len(dt.l) AS BIGINT) AS n_tokens,
       coalesce(r.r, CAST(0 AS BIGINT)) AS n_removed
FROM documents d
JOIN docs_toks dt USING (doc_id)
LEFT JOIN agg a ON a.doc_id = d.doc_id
LEFT JOIN nrem r ON r.doc_id = d.doc_id
""",
        "source_sample": """
SELECT source, CAST(doc_id AS BIGINT) AS doc_id FROM (
  SELECT source, doc_id,
         row_number() OVER (
           PARTITION BY source
           ORDER BY ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 16))::UBIGINT,
                    doc_id) AS rn
  FROM documents
) WHERE rn <= 25
""",
        "repetition_stats": f"""
WITH {KEPT_CTE},
big AS (
  SELECT a.doc_id, a.tok AS t1, b.tok AS t2
  FROM kept a JOIN kept b ON a.doc_id = b.doc_id AND b.kpos = a.kpos + 1
),
cnt AS (SELECT doc_id, t1, t2, count(*) AS c FROM big GROUP BY doc_id, t1, t2)
SELECT CAST(d.doc_id AS BIGINT) AS doc_id,
       CAST(coalesce(sum(c), 0) AS BIGINT) AS n_bigrams,
       CAST(coalesce(max(c), 0) AS BIGINT) AS top_bigram_n,
       CAST(coalesce(sum(CASE WHEN c > 1 THEN c ELSE 0 END), 0) AS BIGINT) AS dup_bigram_n
FROM documents d LEFT JOIN cnt USING (doc_id)
GROUP BY d.doc_id
""",
        "text_stats": f"""
WITH {_WORDS_CTE}
SELECT CAST(d.doc_id AS BIGINT) AS doc_id,
       CAST(length(text) AS BIGINT) AS n_chars,
       coalesce(w.n_words, 0) AS n_words,
       coalesce(w.n_stop, 0) AS n_stop,
       CAST(len(regexp_extract_all(text, '[0-9]+')) AS BIGINT) AS n_digit_tokens,
       CAST(len(regexp_extract_all(text, '[^A-Za-z0-9\\s]')) AS BIGINT) AS n_punct_chars,
       CAST(len(regexp_extract_all(text, '[A-Z]')) AS BIGINT) AS n_upper_chars,
       CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')) AS BIGINT) AS n_bpe_units
FROM documents d LEFT JOIN wstats w USING (doc_id)
""",
        "langid": f"""
WITH {_WORDS_CTE}
SELECT CAST(d.doc_id AS BIGINT) AS doc_id,
       coalesce(w.n_words, 0) AS n_words,
       coalesce(w.n_stop, 0) AS n_stop,
       5 * coalesce(w.n_stop, 0) >= greatest(coalesce(w.n_words, 0), 1) AS is_en
FROM documents d LEFT JOIN wstats w USING (doc_id)
""",
        "peak_concurrency": """
WITH ordered AS (
  SELECT user_id, event_id, ts,
         lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
  FROM events
),
flagged AS (
  SELECT *, CASE WHEN prev_ts IS NULL
                   OR epoch_us(ts) - epoch_us(prev_ts) > 1800000000
                 THEN 1 ELSE 0 END AS new_s
  FROM ordered
),
sess AS (
  SELECT *, sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS UNBOUNDED PRECEDING) AS session_idx
  FROM flagged
),
spans AS (
  SELECT user_id, session_idx,
         min(epoch_us(ts)) AS s, max(epoch_us(ts)) AS e
  FROM sess GROUP BY 1, 2
),
deltas AS (
  SELECT s AS t, 1 AS d FROM spans
  UNION ALL SELECT e + 1, -1 FROM spans
),
net AS (SELECT t, sum(d) AS nd FROM deltas GROUP BY t),
run AS (
  SELECT t, sum(nd) OVER (ORDER BY t ROWS UNBOUNDED PRECEDING) AS conc
  FROM net
)
SELECT CAST((SELECT max(conc) FROM run) AS BIGINT) AS peak,
       CAST((SELECT min(t) FROM run
             WHERE conc = (SELECT max(conc) FROM run)) AS BIGINT)
         AS peak_ts_us,
       CAST((SELECT count(*) FROM spans) AS BIGINT) AS n_sessions
""",
        "events_zorder_scan": """
SELECT CAST(count(*) AS BIGINT) AS n_events,
       CAST(coalesce(sum(CAST(round(value * 100) AS BIGINT)), 0) AS BIGINT)
         AS cents
FROM events
WHERE user_id >= 40 AND user_id < 90
  AND epoch_us(ts) // 86400000000 >= 19730
  AND epoch_us(ts) // 86400000000 < 19740
""",
        "sessionize": """
WITH ordered AS (
  SELECT user_id, event_id, ts, CAST(round(value * 100) AS BIGINT) AS cents,
         lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
  FROM events
),
flagged AS (
  SELECT *, CASE WHEN prev_ts IS NULL
                   OR epoch_us(ts) - epoch_us(prev_ts) > 1800000000
                 THEN 1 ELSE 0 END AS new_s
  FROM ordered
),
sess AS (
  SELECT *, CAST(sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                  ROWS UNBOUNDED PRECEDING) - 1 AS BIGINT) AS session_idx
  FROM flagged
)
SELECT CAST(user_id AS BIGINT) AS user_id, session_idx,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(min(event_id) AS BIGINT) AS min_event_id,
       CAST(max(event_id) AS BIGINT) AS max_event_id,
       CAST(sum(cents) AS BIGINT) AS cents
FROM sess GROUP BY user_id, session_idx
""",
        "windowed_counts": """
SELECT event_type,
       CAST(epoch_us(ts) // 3600000000 * 3600000000 AS BIGINT) AS window_start_us,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents
FROM events GROUP BY 1, 2
""",
        "range_join_counts": """
SELECT CAST(p.event_id AS BIGINT) AS event_id,
       CAST((SELECT count(*) FROM events c
             WHERE c.user_id = p.user_id AND c.event_type = 'click'
               AND c.ts >= p.ts - INTERVAL 3600 SECOND
               AND c.ts < p.ts) AS BIGINT) AS n_prior
FROM events p WHERE p.event_type = 'purchase'
""",
        "asof_join": """
WITH p AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'),
c AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'click')
SELECT CAST(p.event_id AS BIGINT) AS event_id,
       CAST(m.event_id AS BIGINT) AS click_event_id,
       CAST(epoch_us(p.ts) - epoch_us(m.ts) AS BIGINT) AS gap_us
FROM p
JOIN LATERAL (
  SELECT c.event_id, c.ts FROM c
  WHERE c.user_id = p.user_id AND c.ts < p.ts
  ORDER BY c.ts DESC, c.event_id DESC LIMIT 1
) m ON true
""",
        "langid_eval": f"""
WITH {_WORDS_CTE}
SELECT d.lang,
       5 * coalesce(w.n_stop, 0) >= greatest(coalesce(w.n_words, 0), 1) AS is_en,
       CAST(count(*) AS BIGINT) AS n_docs
FROM documents d LEFT JOIN wstats w USING (doc_id)
GROUP BY 1, 2
""",
        "multimodal_meta": """
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
       CAST(64 + octet_length(encode(text)) % 577 AS BIGINT) AS width,
       CAST(64 + (octet_length(encode(text)) * 31) % 419 AS BIGINT) AS height
FROM documents
""",
        "multimodal_frames": """
WITH f AS (SELECT doc_id, octet_length(encode(text)) AS nb FROM documents),
frames AS (
  SELECT doc_id, nb,
         unnest(range(0, CAST(ceil(nb / 256.0) AS BIGINT), 4)) AS frame_idx
  FROM f
)
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       CAST(frame_idx AS BIGINT) AS frame_idx,
       CAST(least(256, nb - frame_idx * 256) AS BIGINT) AS frame_bytes
FROM frames
""",
        "multimodal_features": """
WITH chars AS (
  SELECT doc_id, unnest(string_split(text, '')) AS ch FROM documents
)
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       CAST(least(unicode(ch), 255) // 16 AS BIGINT) AS bucket,
       CAST(count(*) AS BIGINT) AS n
FROM chars WHERE ch != ''
GROUP BY doc_id, least(unicode(ch), 255) // 16
""",
        "fingerprints": f"""
WITH {KEPT_CTE},
{_DOCS_TOKS},
{_shingle_cte(H.FINGERPRINT_W)},
fp AS (SELECT doc_id, min(h) AS m FROM sh GROUP BY doc_id)
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       CAST(m::HUGEINT - CASE WHEN m >= 9223372036854775808::UBIGINT
                              THEN 18446744073709551616::HUGEINT ELSE 0::HUGEINT END
            AS BIGINT) AS fingerprint
FROM fp
""",
    }


def _plane_values(planes, cols: str) -> str:
    """Inline a seeded hyperplane matrix as SQL VALUES rows — Python
    float repr round-trips exactly to an IEEE double, so the oracle
    scores against bit-identical plane weights.  `cols` names the
    leading index columns derived from the row number."""
    rows = []
    n_planes, dim = planes.shape
    for p in range(n_planes):
        for d in range(dim):
            idx = {"p": str(p), "band": str(p // 2), "r": str(p % 2)}
            lead = ",".join(idx[c] for c in cols.split(","))
            rows.append(f"({lead},{d},{planes[p, d]!r})")
    return ",".join(rows)


def lsh_plane_oracles() -> dict[str, str]:
    """The seeded-hyperplane LSH entries, value-verified: both the sign
    codes (fixed rng planes inlined via _plane_values; min |dot| over
    the testdata is ~1e-5, nine orders above double noise, verified at
    both sf) and the downstream ranking / predicate are deterministic,
    so these formerly rows-only entries hash-verify.  The 'approximate'
    in their contract is vs the unpruned exact twin (recall pytest),
    not vs this oracle.  Planes are generated at the testdata's dim=64
    (the engine derives dim from the data; the rng stream depends on
    dim, so this oracle is specific to the driver tables — exactly
    where the driver runs it)."""
    from candidategeneration_ray.pipelines.extras import _ivf_planes

    dim = 64
    ivf_planes = _plane_values(_ivf_planes(3, dim), "p")
    n_probe = 3
    lsh = _plane_values(
        np.random.default_rng(17).standard_normal((16, dim)), "band,r")
    qv = """qv AS MATERIALIZED (
  SELECT vec_id, CAST(generate_subscripts(embedding, 1) - 1 AS BIGINT) AS d,
         CAST(unnest(embedding) AS DOUBLE) AS x
  FROM embeddings
)"""
    return {
        "ann_ivf_top10": f"""
WITH {qv},
planes(p, d, w) AS (VALUES {ivf_planes}),
dots AS (
  SELECT v.vec_id, pl.p, sum(v.x * pl.w) AS dot
  FROM qv v JOIN planes pl USING (d) GROUP BY v.vec_id, pl.p),
codes AS (
  SELECT vec_id,
         CAST(sum(CASE WHEN dot > 0 THEN 1 << p ELSE 0 END) AS BIGINT)
           AS code
  FROM dots GROUP BY vec_id),
probe AS (
  SELECT t.b AS code
  FROM range(8) t(b), (SELECT code FROM codes WHERE vec_id = 0) qc
  ORDER BY bit_count(xor(CAST(t.b AS BIGINT), qc.code)) ASC, t.b ASC
  LIMIT {n_probe}),
cand AS (
  SELECT vec_id FROM codes WHERE code IN (SELECT code FROM probe)),
scored AS (
  SELECT e.vec_id,
         list_cosine_similarity(e.embedding,
             (SELECT embedding FROM embeddings WHERE vec_id = 0)) AS cos
  FROM embeddings e JOIN cand ON cand.vec_id = e.vec_id)
SELECT rank, vec_id FROM (
  SELECT CAST(row_number() OVER (ORDER BY cos DESC, vec_id ASC) AS BIGINT)
           AS rank,
         CAST(vec_id AS BIGINT) AS vec_id
  FROM scored
) WHERE rank <= 10
""",
        "embedding_neardups_lsh": f"""
WITH {qv},
planes(band, r, d, w) AS (VALUES {lsh}),
dots AS (
  SELECT v.vec_id, pl.band, pl.r, sum(v.x * pl.w) AS dot
  FROM qv v JOIN planes pl USING (d)
  GROUP BY v.vec_id, pl.band, pl.r),
codes AS (
  SELECT vec_id, band,
         CAST(sum(CASE WHEN dot > 0 THEN 1 << r ELSE 0 END) AS BIGINT)
           AS code
  FROM dots GROUP BY vec_id, band),
cand AS (
  SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b
  FROM codes a
  JOIN codes b ON a.band = b.band AND a.code = b.code
             AND a.vec_id < b.vec_id)
SELECT CAST(c.vec_a AS BIGINT) AS vec_a, CAST(c.vec_b AS BIGINT) AS vec_b
FROM cand c
JOIN embeddings ea ON ea.vec_id = c.vec_a
JOIN embeddings eb ON eb.vec_id = c.vec_b
WHERE list_cosine_similarity(ea.embedding, eb.embedding) * 100 >= 40
""",
    }


def source_similarity_oracles() -> dict[str, str]:
    """Per-source MinHash resemblance: a source's slot is the min of
    its docs' shingle permutation values (min composes), pairwise
    slot-match counts between sources."""
    from candidategeneration_ray.functions import hashing as H

    return {
        "source_similarity": f"""
WITH {KEPT_CTE},
{_DOCS_TOKS},
{_shingle_cte(H.SHINGLE_W)},
{_perm_values()},
smh AS MATERIALIZED (
  SELECT d.source, CAST(perm_id AS BIGINT) AS perm_id,
         CAST(min((a::HUGEINT * (h % {_P}) + b) % {_P}) AS BIGINT) AS mh
  FROM sh JOIN documents d USING (doc_id) CROSS JOIN perms
  GROUP BY 1, 2)
SELECT a.source AS source_a, b.source AS source_b,
       CAST(sum(CASE WHEN a.mh = b.mh THEN 1 ELSE 0 END) AS BIGINT)
         AS match_slots,
       CAST({H.NUM_PERMS} AS BIGINT) AS n_perms
FROM smh a JOIN smh b
  ON a.perm_id = b.perm_id AND a.source < b.source
GROUP BY 1, 2
""",
    }


def delta_dedup_oracles() -> dict[str, str]:
    """New-vs-base exact dedup over the derived delta (text equality)."""
    from candidategeneration_ray.pipelines.extras import DELTA_ID_BASE

    return {
        "delta_dedup": f"""
WITH d AS (
  SELECT {DELTA_ID_BASE} + doc_id AS doc_id,
         CASE WHEN doc_id % 4 = 0 THEN text
              WHEN doc_id % 4 = 1 THEN text || ' appended tail'
              ELSE 'fresh delta row ' || CAST(doc_id AS VARCHAR)
         END AS text
  FROM documents)
SELECT CAST(d.doc_id AS BIGINT) AS doc_id,
       CAST(coalesce(min(b.doc_id), -1) AS BIGINT) AS base_match
FROM d LEFT JOIN documents b ON b.text = d.text
GROUP BY d.doc_id
""",
    }


def sketch_oracles() -> dict[str, str]:
    """Oracles for the exact sketch aggregates (pipelines/sketches.py).

    The binning / threshold arithmetic is pure integer math on both
    sides: bin = n_chars // 64, quantile rank = ceil(pct*N/100) via
    (pct*N + 99) // 100, heavy-hitter threshold = ceil(0.005*N) via
    (50*N + 9999) // 10000 — so the comparison is exact, not
    float-tolerant."""
    return {
        "doclen_histogram": """
SELECT CAST(n_chars // 64 AS BIGINT) AS bin,
       CAST((n_chars // 64) * 64 AS BIGINT) AS lo_chars,
       CAST(count(*) AS BIGINT) AS n_docs
FROM documents
GROUP BY n_chars // 64
""",
        "doclen_quantiles": """
WITH h AS (SELECT n_chars // 64 AS bin, count(*) AS n FROM documents GROUP BY 1),
c AS (SELECT bin, sum(n) OVER (ORDER BY bin) AS cum FROM h),
t AS (SELECT CAST(count(*) AS BIGINT) AS total FROM documents),
p(pct) AS (VALUES (50), (90), (99))
SELECT CAST(pct AS BIGINT) AS pct,
       CAST(min(bin) AS BIGINT) AS bin,
       CAST(min(bin) * 64 + 64 AS BIGINT) AS ub_chars
FROM p, t, c
WHERE c.cum >= (pct * total + 99) // 100
GROUP BY pct
""",
        "frequent_terms": f"""
WITH {KEPT_CTE}
SELECT tok AS term, CAST(count(*) AS BIGINT) AS cnt
FROM kept
GROUP BY tok
HAVING count(*) >= ((SELECT count(*) FROM kept) * 50 + 9999) // 10000
ORDER BY cnt DESC, term ASC
""",
    }


def _kmeans_ctes(train_pred: str | None = None) -> str:
    """Unrolled Lloyd iterations as (assign_i, centroids_i) CTE pairs —
    the integer arithmetic (power-of-two quantize, int sums, floor-div
    centroid update, squared-L2 assignment with (dist, cluster)
    tie-break) mirrors pipelines/clustering.py step for step, so the
    comparison is exact.

    `train_pred` (a SQL predicate over vec_id, e.g. "vec_id % 2 = 0")
    restricts TRAINING — init and every Lloyd pass — to that subset
    while the FINAL assignment a{ITERS+1} still covers every vector:
    exactly the frozen-codebook semantics of the IVF delta path."""
    from candidategeneration_ray.pipelines.clustering import (
        KMEANS_ITERS, KMEANS_K, KMEANS_SCALE)

    ids_w = f" WHERE {train_pred}" if train_pred else ""
    parts = [f"""qv AS MATERIALIZED (
  SELECT vec_id,
         CAST(generate_subscripts(embedding, 1) - 1 AS BIGINT) AS d,
         CAST(trunc(CAST(unnest(embedding) AS DOUBLE) * {KMEANS_SCALE}) AS BIGINT) AS x
  FROM embeddings
),
ids AS (SELECT vec_id, row_number() OVER (ORDER BY vec_id) - 1 AS rk FROM embeddings{ids_w}),
c0 AS (SELECT CAST(rk AS BIGINT) AS cluster, d, x AS cq
       FROM qv JOIN ids USING (vec_id) WHERE rk < {KMEANS_K})"""]
    for i in range(1, KMEANS_ITERS + 2):
        inner_w = f"\n    WHERE qv.{train_pred}" \
            if train_pred and i <= KMEANS_ITERS else ""
        parts.append(f"""a{i} AS MATERIALIZED (
  SELECT vec_id, cluster FROM (
    SELECT qv.vec_id, c.cluster,
           row_number() OVER (
             PARTITION BY qv.vec_id
             ORDER BY sum((qv.x - c.cq) * (qv.x - c.cq)) ASC, c.cluster ASC
           ) AS rn
    FROM qv JOIN c{i - 1} c USING (d){inner_w}
    GROUP BY qv.vec_id, c.cluster)
  WHERE rn = 1
)""")
        if i <= KMEANS_ITERS:
            parts.append(f"""c{i} AS MATERIALIZED (
  SELECT p.cluster, p.d,
         coalesce(CAST(floor(CAST(s.sx AS DOUBLE) / s.n) AS BIGINT), p.cq) AS cq
  FROM c{i - 1} p
  LEFT JOIN (
    SELECT a.cluster, qv.d, sum(qv.x) AS sx, count(*) AS n
    FROM a{i} a JOIN qv USING (vec_id)
    GROUP BY a.cluster, qv.d
  ) s ON s.cluster = p.cluster AND s.d = p.d
)""")
    return ",\n".join(parts)


def kmeans_oracles() -> dict[str, str]:
    from candidategeneration_ray.pipelines.clustering import KMEANS_ITERS

    last_c, last_a = f"c{KMEANS_ITERS}", f"a{KMEANS_ITERS + 1}"
    return {
        "kmeans_centroids": f"""
WITH {_kmeans_ctes()}
SELECT cluster, d AS dim, cq AS centroid_q FROM {last_c}
""",
        "kmeans_assignments": f"""
WITH {_kmeans_ctes()}
SELECT CAST(vec_id AS BIGINT) AS vec_id, cluster FROM {last_a}
""",
    }


def knn_oracles() -> dict[str, str]:
    """Exact kNN graph oracle: same power-of-two quantization as the
    engine (pipelines/clustering.py), integer squared L2, (d2, nbr_id)
    rank — comparison is exact."""
    from candidategeneration_ray.pipelines.clustering import (
        KMEANS_SCALE, KNN_K)

    return {
        "knn_graph": f"""
WITH qv AS MATERIALIZED (
  SELECT vec_id,
         CAST(generate_subscripts(embedding, 1) - 1 AS BIGINT) AS d,
         CAST(trunc(CAST(unnest(embedding) AS DOUBLE) * {KMEANS_SCALE}) AS BIGINT) AS x
  FROM embeddings
),
dist AS (
  SELECT a.vec_id AS vec_id, b.vec_id AS nbr_id,
         sum((a.x - b.x) * (a.x - b.x)) AS d2
  FROM qv a JOIN qv b ON a.d = b.d AND a.vec_id <> b.vec_id
  GROUP BY a.vec_id, b.vec_id
),
rk AS (
  SELECT vec_id, nbr_id, d2,
         row_number() OVER (PARTITION BY vec_id
                            ORDER BY d2 ASC, nbr_id ASC) AS rank
  FROM dist
)
SELECT CAST(vec_id AS BIGINT) AS vec_id, CAST(rank AS BIGINT) AS rank,
       CAST(nbr_id AS BIGINT) AS nbr_id, CAST(d2 AS BIGINT) AS d2
FROM rk WHERE rank <= {KNN_K}
""",
    }


def mixture_oracles() -> dict[str, str]:
    from candidategeneration_ray.pipelines.extras import TRAIN_PCT

    h64_docid = _H64.format(expr="CAST(doc_id AS VARCHAR)")
    return {
        "tokens_by_source": f"""
WITH {KEPT_CTE},
tk AS (SELECT doc_id, count(*) AS n FROM kept GROUP BY doc_id)
SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(coalesce(tk.n, 0)) AS BIGINT) AS total_tokens,
       CAST(sum(n_chars) AS BIGINT) AS total_chars
FROM documents d LEFT JOIN tk USING (doc_id)
GROUP BY source
""",
        "train_val_split": f"""
SELECT source,
       CASE WHEN {h64_docid} % 100 < {TRAIN_PCT}
            THEN 'train' ELSE 'val' END AS split,
       CAST(count(*) AS BIGINT) AS n_docs
FROM documents
GROUP BY source, split
""",
    }


def sliding_oracles() -> dict[str, str]:
    return {
        "sliding_counts": """
SELECT event_type,
       CAST((epoch_us(ts) // 900000000 - j) * 900000000 AS BIGINT) AS window_start_us,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents
FROM events CROSS JOIN (VALUES (0), (1), (2), (3)) o(j)
GROUP BY 1, 2
""",
    }


def quality_filter_oracles() -> dict[str, str]:
    from candidategeneration_ray.pipelines.extras import (
        QF_MAX_MEAN_WLEN, QF_MAX_WORDS, QF_MIN_WORDS, QF_PUNCT_MULT,
        QF_STOP_MULT)

    return {
        "quality_filter": f"""
WITH {_WORDS_CTE},
s AS (
  SELECT CAST(d.doc_id AS BIGINT) AS doc_id,
         CAST(length(text) AS BIGINT) AS n_chars,
         coalesce(w.n_words, 0) AS n_words,
         coalesce(w.n_stop, 0) AS n_stop,
         CAST(len(regexp_extract_all(text, '[^A-Za-z0-9\\s]')) AS BIGINT) AS n_punct
  FROM documents d LEFT JOIN wstats w USING (doc_id)
)
SELECT doc_id,
       CAST(CASE WHEN mask = 0 THEN 1 ELSE 0 END AS BIGINT) AS keep,
       mask AS fail_mask
FROM (
  SELECT doc_id,
         CAST(CASE WHEN n_words < {QF_MIN_WORDS} THEN 1 ELSE 0 END
            + CASE WHEN n_words > {QF_MAX_WORDS} THEN 2 ELSE 0 END
            + CASE WHEN {QF_STOP_MULT} * n_stop < n_words THEN 4 ELSE 0 END
            + CASE WHEN n_chars > {QF_MAX_MEAN_WLEN} * greatest(n_words, 1) THEN 8 ELSE 0 END
            + CASE WHEN {QF_PUNCT_MULT} * n_punct > n_chars THEN 16 ELSE 0 END
          AS BIGINT) AS mask
  FROM s
)
""",
    }


def hll_oracles() -> dict[str, str]:
    """The HLL register state re-derived in SQL: same md5-based h64,
    register = top 12 bits, rho = leading zeros of the low 52 bits + 1
    (exact via bin() string length — no float log)."""
    from candidategeneration_ray.pipelines.sketches import HLL_P

    two_rest = 1 << (64 - HLL_P)   # 2^52
    h64_tok = _H64.format(expr="tok")
    return {
        "hll_registers": f"""
WITH {KEPT_CTE},
toks AS (SELECT DISTINCT tok FROM kept),
h AS (SELECT {h64_tok} AS hv FROM toks),
rr AS (
  SELECT CAST(hv // CAST({two_rest} AS UBIGINT) AS BIGINT) AS register,
         CAST({64 - HLL_P + 1} - length(ltrim(bin(hv % CAST({two_rest} AS UBIGINT)), '0')) AS BIGINT) AS rho
  FROM h
)
SELECT register, CAST(max(rho) AS BIGINT) AS rho
FROM rr GROUP BY register
""",
        "hll_distinct_terms": _hll_estimate_sql(),
    }


def _hll_estimate_sql() -> str:
    """The integer HLL estimator on top of the register state: same
    register/rho derivation as hll_registers, then
    raw = (alpha_ppb * m^2 * 2^RHO_MAX) // (S * 1e9) with
    S = Σ 2^(RHO_MAX - rho) (HUGEINT), and the linear-counting
    correction from the SAME hll_ln_lut() integers the engine uses
    (sketches.py:q_hll_distinct_terms) — inlined here as a VALUES
    table, so both sides share one fixed-point contract."""
    from candidategeneration_ray.pipelines.sketches import (
        HLL_ALPHA_PPB, HLL_M, HLL_P, HLL_RHO_MAX, _PPB, hll_ln_lut)

    two_rest = 1 << (64 - HLL_P)
    h64_tok = _H64.format(expr="tok")
    lut_rows = ",".join(
        f"({v + 1},{ln})" for v, ln in enumerate(hll_ln_lut()))
    return f"""
WITH {KEPT_CTE},
toks AS (SELECT DISTINCT tok FROM kept),
h AS (SELECT {h64_tok} AS hv FROM toks),
rr AS (
  SELECT CAST(hv // CAST({two_rest} AS UBIGINT) AS BIGINT) AS register,
         CAST({HLL_RHO_MAX} - length(ltrim(bin(hv % CAST({two_rest} AS UBIGINT)), '0')) AS BIGINT) AS rho
  FROM h
),
reg AS (SELECT register, max(rho) AS rho FROM rr GROUP BY register),
s AS (
  SELECT coalesce(sum(CAST(CAST(1 AS BIGINT) << ({HLL_RHO_MAX} - rho)
                            AS HUGEINT)), 0)
         + CAST({HLL_M} - count(*) AS HUGEINT)
           * CAST({1 << HLL_RHO_MAX} AS HUGEINT) AS ssum,
         CAST({HLL_M} - count(*) AS BIGINT) AS zeros
  FROM reg),
est AS (
  SELECT CAST((CAST({HLL_ALPHA_PPB * HLL_M * HLL_M} AS HUGEINT)
               * CAST({1 << HLL_RHO_MAX} AS HUGEINT))
              // (ssum * {_PPB}) AS BIGINT) AS raw,
         zeros FROM s),
lut(v, lnppb) AS (VALUES {lut_rows})
SELECT CASE WHEN 2 * e.raw <= {5 * HLL_M} AND e.zeros > 0
            THEN CAST((CAST({HLL_M} AS HUGEINT) * l.lnppb)
                      // {_PPB} AS BIGINT)
            ELSE e.raw END AS n_distinct_est,
       CAST({HLL_M} AS BIGINT) AS n_registers
FROM est e LEFT JOIN lut l ON l.v = e.zeros
"""


def textlm_oracles() -> dict[str, str]:
    """Corpus-LM / retrieval / mixture operators (pipelines/textlm.py).
    Same md5 h64, same kept-token stream, same integer score rules."""
    from candidategeneration_ray.pipelines.textlm import (
        BENCH_MOD, DECON_W, TRAIN_PCT)

    h64_docid = _H64.format(expr="CAST(doc_id AS VARCHAR)")
    # adjacent KEPT-token bigrams, one row per occurrence
    big_cte = """
big AS MATERIALIZED (
  SELECT a.doc_id, a.tok || ' ' || b.tok AS bigram
  FROM kept a JOIN kept b ON a.doc_id = b.doc_id AND b.kpos = a.kpos + 1
)"""
    return {
        "decontaminate": f"""
WITH {KEPT_CTE},
{_DOCS_TOKS},
{_shingle_cte(DECON_W)},
bench AS (SELECT DISTINCT h FROM sh WHERE doc_id % {BENCH_MOD} = 0)
SELECT CAST(s.doc_id AS BIGINT) AS doc_id,
       CAST(count(*) AS BIGINT) AS n_overlap
FROM sh s JOIN bench USING (h)
WHERE s.doc_id % {BENCH_MOD} <> 0
GROUP BY s.doc_id
""",
        "lm_bigram_scores": f"""
WITH {KEPT_CTE},
{big_cte},
lm AS MATERIALIZED (
  SELECT bigram, CAST(count(*) AS BIGINT) AS cnt
  FROM big WHERE {h64_docid} % 100 < {TRAIN_PCT}
  GROUP BY bigram
  ORDER BY cnt DESC, bigram
  LIMIT 50000
)
SELECT CAST(b.doc_id AS BIGINT) AS doc_id,
       CAST(count(*) AS BIGINT) AS n_bigrams,
       CAST(count(lm.cnt) AS BIGINT) AS n_known,
       CAST(coalesce(sum(lm.cnt), 0) AS BIGINT) AS cnt_sum
FROM big b LEFT JOIN lm USING (bigram)
WHERE {h64_docid} % 100 >= {TRAIN_PCT}
GROUP BY b.doc_id
""",
        "bool_and_docs": f"""
WITH {KEPT_CTE},
{QTOK_CTE},
qn AS (SELECT query_id, CAST(count(*) AS BIGINT) AS n FROM qtok GROUP BY query_id),
dt AS (SELECT DISTINCT doc_id, tok FROM kept),
hits AS (
  SELECT q.query_id, d.doc_id, CAST(count(*) AS BIGINT) AS k
  FROM qtok q JOIN dt d USING (tok)
  GROUP BY q.query_id, d.doc_id
)
SELECT CAST(query_id AS BIGINT) AS query_id, CAST(doc_id AS BIGINT) AS doc_id
FROM hits JOIN qn USING (query_id)
WHERE k = n
""",
        "pmi_top50": f"""
WITH {KEPT_CTE},
{big_cte},
bc AS (SELECT bigram, CAST(count(*) AS BIGINT) AS c_ab FROM big GROUP BY bigram),
uc AS MATERIALIZED (SELECT tok, CAST(count(*) AS HUGEINT) AS c FROM kept GROUP BY tok),
tot AS (SELECT CAST(count(*) AS HUGEINT) AS total FROM kept)
SELECT bc.bigram, bc.c_ab,
       CAST((CAST(bc.c_ab AS HUGEINT) * tot.total * 1000) // (ua.c * ub.c) AS BIGINT) AS score
FROM bc
JOIN uc ua ON ua.tok = split_part(bc.bigram, ' ', 1)
JOIN uc ub ON ub.tok = split_part(bc.bigram, ' ', 2)
CROSS JOIN tot
WHERE bc.c_ab >= 5
ORDER BY score DESC, bc.bigram
LIMIT 50
""",
        "mixture_select": f"""
WITH {KEPT_CTE},
tk AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n,
              CAST(count(DISTINCT tok) AS BIGINT) AS nd
       FROM kept GROUP BY doc_id),
c AS (
  SELECT d.source, d.doc_id, (1000 * nd) // n AS prio, n AS ntok
  FROM documents d JOIN tk USING (doc_id)
)
SELECT source, CAST(doc_id AS BIGINT) AS doc_id, CAST(prio AS BIGINT) AS prio,
       CAST(cum AS BIGINT) AS cum_tokens
FROM (
  SELECT source, doc_id, prio,
         sum(ntok) OVER (PARTITION BY source ORDER BY prio DESC, doc_id
                         ROWS UNBOUNDED PRECEDING) AS cum
  FROM c
)
WHERE cum <= 400
""",
        "tfidf_top3": f"""
WITH {KEPT_CTE},
tf AS (SELECT doc_id, tok, CAST(count(*) AS BIGINT) AS tf FROM kept GROUP BY doc_id, tok),
dft AS (SELECT tok, CAST(count(DISTINCT doc_id) AS BIGINT) AS df FROM kept GROUP BY tok),
nd AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM documents)
SELECT CAST(doc_id AS BIGINT) AS doc_id, tok AS term, CAST(score AS BIGINT) AS score
FROM (
  SELECT doc_id, tok,
         tf * CAST(trunc(ln(CAST(n_docs AS DOUBLE) / CAST(df AS DOUBLE)) * 10000000) AS BIGINT) AS score
  FROM tf JOIN dft USING (tok) CROSS JOIN nd
)
QUALIFY row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, tok) <= 3
""",
    }


def _pagerank_sql(seed_mod: int | None, out_col: str) -> str:
    """Unrolled integer PageRank rounds over the exact kNN edge set —
    shared by the uniform (seed_mod=None) and personalized variants;
    the seed restricts r0 and the restart term. Arithmetic mirrors
    pipelines/clustering.py::_pagerank_rounds step for step."""
    from candidategeneration_ray.pipelines.clustering import (
        KMEANS_SCALE, KNN_K, PR_DAMP_DEN, PR_DAMP_NUM, PR_ITERS,
        PR_SCALE)

    base = (100 - PR_DAMP_NUM) * PR_SCALE // PR_DAMP_DEN
    r0_expr = f"CAST({PR_SCALE} AS BIGINT)" if seed_mod is None else (
        f"CAST(CASE WHEN vec_id % {seed_mod} = 0 THEN {PR_SCALE} "
        f"ELSE 0 END AS BIGINT)")
    base_expr = f"{base}" if seed_mod is None else (
        f"CASE WHEN n.node % {seed_mod} = 0 THEN {base} ELSE 0 END")
    knn_cte = f"""qv AS MATERIALIZED (
  SELECT vec_id,
         CAST(generate_subscripts(embedding, 1) - 1 AS BIGINT) AS d,
         CAST(trunc(CAST(unnest(embedding) AS DOUBLE) * {KMEANS_SCALE}) AS BIGINT) AS x
  FROM embeddings
),
dist AS (
  SELECT a.vec_id AS vec_id, b.vec_id AS nbr_id,
         sum((a.x - b.x) * (a.x - b.x)) AS d2
  FROM qv a JOIN qv b ON a.d = b.d AND a.vec_id <> b.vec_id
  GROUP BY a.vec_id, b.vec_id
),
edges AS MATERIALIZED (
  SELECT vec_id AS src, nbr_id AS dst FROM (
    SELECT vec_id, nbr_id,
           row_number() OVER (PARTITION BY vec_id
                              ORDER BY d2 ASC, nbr_id ASC) AS rank
    FROM dist)
  WHERE rank <= {KNN_K}
),
meta AS (SELECT least({KNN_K}, count(*) - 1) AS deg FROM embeddings),
r0 AS (SELECT vec_id AS node, {r0_expr} AS r FROM embeddings)"""
    steps = []
    for i in range(1, PR_ITERS + 1):
        steps.append(f"""cc{i} AS (
  SELECT e.dst AS node,
         sum(({PR_DAMP_NUM} * r.r) // ({PR_DAMP_DEN} * m.deg)) AS s
  FROM edges e JOIN r{i - 1} r ON r.node = e.src CROSS JOIN meta m
  GROUP BY e.dst
),
r{i} AS (
  SELECT n.node, CAST({base_expr} + coalesce(c.s, 0) AS BIGINT) AS r
  FROM r0 n LEFT JOIN cc{i} c USING (node)
)""")
    return (
        "WITH " + knn_cte + ",\n" + ",\n".join(steps)
        + f"\nSELECT CAST(node AS BIGINT) AS vec_id, r AS {out_col} "
          f"FROM r{PR_ITERS}\n")


def _bfs_sql() -> str:
    """Unrolled multi-source BFS over the symmetrized kNN edge set —
    one min-fold round per hop, mirroring clustering.q_bfs_hops; a node
    at distance d is reached in round d, so BFS_MAX_HOPS rounds give
    exact distances up to the cap and -1 beyond."""
    from candidategeneration_ray.pipelines.clustering import (
        BFS_MAX_HOPS, BFS_SEED_MOD, KMEANS_SCALE, KNN_K)

    knn_cte = f"""qv AS MATERIALIZED (
  SELECT vec_id,
         CAST(generate_subscripts(embedding, 1) - 1 AS BIGINT) AS d,
         CAST(trunc(CAST(unnest(embedding) AS DOUBLE) * {KMEANS_SCALE}) AS BIGINT) AS x
  FROM embeddings
),
dist AS (
  SELECT a.vec_id AS vec_id, b.vec_id AS nbr_id,
         sum((a.x - b.x) * (a.x - b.x)) AS d2
  FROM qv a JOIN qv b ON a.d = b.d AND a.vec_id <> b.vec_id
  GROUP BY a.vec_id, b.vec_id
),
knn AS (
  SELECT vec_id AS src, nbr_id AS dst FROM (
    SELECT vec_id, nbr_id,
           row_number() OVER (PARTITION BY vec_id
                              ORDER BY d2 ASC, nbr_id ASC) AS rank
    FROM dist)
  WHERE rank <= {KNN_K}
),
uedges AS MATERIALIZED (
  SELECT DISTINCT least(src, dst) AS u, greatest(src, dst) AS v FROM knn),
dedges AS (SELECT u AS s, v AS d FROM uedges
           UNION ALL SELECT v AS s, u AS d FROM uedges),
d0 AS MATERIALIZED (
  SELECT vec_id AS node, CAST(0 AS BIGINT) AS dist
  FROM embeddings WHERE vec_id % {BFS_SEED_MOD} = 0)"""
    steps = []
    for i in range(1, BFS_MAX_HOPS + 1):
        steps.append(f"""d{i} AS MATERIALIZED (
  SELECT node, min(dist) AS dist FROM (
    SELECT node, dist FROM d{i - 1}
    UNION ALL
    SELECT e.d AS node, p.dist + 1 AS dist
    FROM d{i - 1} p JOIN dedges e ON e.s = p.node)
  GROUP BY node
)""")
    return (
        "WITH " + knn_cte + ",\n" + ",\n".join(steps)
        + f"""
SELECT CAST(e.vec_id AS BIGINT) AS vec_id,
       CAST(coalesce(d.dist, -1) AS BIGINT) AS hops
FROM embeddings e LEFT JOIN d{BFS_MAX_HOPS} d ON d.node = e.vec_id
""")


def _wsp_sql() -> str:
    """Unrolled hop-bounded Bellman-Ford over the weighted kNN edge set
    (weight = exact integer squared L2), mirroring
    clustering.q_shortest_paths round for round: each step min-folds
    dist + w along every directed edge, so after WSP_ROUNDS steps each
    node holds the exact minimum over paths of <= WSP_ROUNDS edges."""
    from candidategeneration_ray.pipelines.clustering import (
        BFS_SEED_MOD, KMEANS_SCALE, KNN_K, WSP_ROUNDS)

    knn_cte = f"""qv AS MATERIALIZED (
  SELECT vec_id,
         CAST(generate_subscripts(embedding, 1) - 1 AS BIGINT) AS d,
         CAST(trunc(CAST(unnest(embedding) AS DOUBLE) * {KMEANS_SCALE}) AS BIGINT) AS x
  FROM embeddings
),
dist AS (
  SELECT a.vec_id AS vec_id, b.vec_id AS nbr_id,
         sum((a.x - b.x) * (a.x - b.x)) AS d2
  FROM qv a JOIN qv b ON a.d = b.d AND a.vec_id <> b.vec_id
  GROUP BY a.vec_id, b.vec_id
),
knn AS (
  SELECT vec_id AS src, nbr_id AS dst, d2 FROM (
    SELECT vec_id, nbr_id, d2,
           row_number() OVER (PARTITION BY vec_id
                              ORDER BY d2 ASC, nbr_id ASC) AS rank
    FROM dist)
  WHERE rank <= {KNN_K}
),
uedges AS MATERIALIZED (
  SELECT least(src, dst) AS u, greatest(src, dst) AS v, min(d2) AS w
  FROM knn GROUP BY 1, 2),
dedges AS (SELECT u AS s, v AS t, w FROM uedges
           UNION ALL SELECT v AS s, u AS t, w FROM uedges),
d0 AS MATERIALIZED (
  SELECT vec_id AS node, CAST(0 AS BIGINT) AS dist
  FROM embeddings WHERE vec_id % {BFS_SEED_MOD} = 0)"""
    steps = []
    for i in range(1, WSP_ROUNDS + 1):
        steps.append(f"""d{i} AS MATERIALIZED (
  SELECT node, min(dist) AS dist FROM (
    SELECT node, dist FROM d{i - 1}
    UNION ALL
    SELECT e.t AS node, p.dist + e.w AS dist
    FROM d{i - 1} p JOIN dedges e ON e.s = p.node)
  GROUP BY node
)""")
    return (
        "WITH " + knn_cte + ",\n" + ",\n".join(steps)
        + f"""
SELECT CAST(e.vec_id AS BIGINT) AS vec_id,
       CAST(coalesce(d.dist, -1) AS BIGINT) AS dist
FROM embeddings e LEFT JOIN d{WSP_ROUNDS} d ON d.node = e.vec_id
""")


def _textrank_sql() -> str:
    """Unrolled integer TextRank over the d-window pair graph (term ids
    are sorted-vocab positions, so least/greatest on token strings
    equals min/max on ids — the engine's packed pair keys)."""
    from candidategeneration_ray.pipelines.docquery import (
        TEXTRANK_ITERS, TEXTRANK_SCALE, TEXTRANK_SUPPORT, TEXTRANK_TOPK)

    base = (100 - 85) * TEXTRANK_SCALE // 100
    head = f"""
WITH {KEPT_CTE},
pairs AS (
  SELECT DISTINCT a.doc_id, least(a.tok, b.tok) AS t1, greatest(a.tok, b.tok) AS t2
  FROM kept a JOIN kept b
    ON a.doc_id = b.doc_id AND b.kpos > a.kpos AND b.kpos <= a.kpos + 5
),
edges AS MATERIALIZED (
  SELECT t1, t2, CAST(count(*) AS BIGINT) AS w FROM pairs
  GROUP BY 1, 2 HAVING count(*) >= {TEXTRANK_SUPPORT}
),
sadj AS MATERIALIZED (SELECT t1 AS x, t2 AS y, w FROM edges
                      UNION ALL SELECT t2, t1, w FROM edges),
deg AS MATERIALIZED (SELECT x, CAST(sum(w) AS BIGINT) AS deg
                     FROM sadj GROUP BY x),
r0 AS (SELECT x AS node, CAST({TEXTRANK_SCALE} AS BIGINT) AS r FROM deg)"""
    rounds = []
    prev = "r0"
    for i in range(1, TEXTRANK_ITERS + 1):
        rounds.append(f""",
r{i} AS MATERIALIZED (
  SELECT s.y AS node,
         CAST({base} + sum((85 * r.r * s.w) // (100 * d.deg)) AS BIGINT) AS r
  FROM sadj s
  JOIN {prev} r ON r.node = s.x
  JOIN deg d ON d.x = s.x
  GROUP BY s.y)""")
        prev = f"r{i}"
    return head + "".join(rounds) + f"""
SELECT node AS term, r AS rank FROM {prev}
ORDER BY rank DESC, term ASC LIMIT {TEXTRANK_TOPK}
"""


def _kcore_sql() -> str:
    """Unrolled simultaneous-peel k-core over the co-purchase graph:
    round i keeps nodes with ≥ k alive-neighbors under round i−1's
    alive set. Unrolls exactly clustering.KCORE_ROUNDS rounds — the
    engine RAISES if it needs more, and extra rounds past the fixed
    point are idempotent, so the two sides agree whenever the engine
    returns."""
    from candidategeneration_ray.pipelines.clustering import (
        KCORE_K, KCORE_ROUNDS, KCORE_SUPPORT)

    head = f"""
WITH op AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
edges AS MATERIALIZED (
  SELECT a.l_partkey AS u, b.l_partkey AS v
  FROM op a JOIN op b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY 1, 2 HAVING count(*) >= {KCORE_SUPPORT}
),
sadj AS MATERIALIZED (SELECT u AS x, v AS y FROM edges
                      UNION ALL SELECT v, u FROM edges),
alive0 AS (SELECT DISTINCT x AS node FROM sadj)"""
    rounds = []
    prev = "alive0"
    for i in range(1, KCORE_ROUNDS + 1):
        rounds.append(f""",
alive{i} AS MATERIALIZED (
  SELECT s.x AS node FROM sadj s
  JOIN {prev} a ON a.node = s.x
  JOIN {prev} b ON b.node = s.y
  GROUP BY s.x HAVING count(*) >= {KCORE_K})""")
        prev = f"alive{i}"
    return head + "".join(rounds) + f"""
SELECT CAST(s.x AS BIGINT) AS node, CAST(count(*) AS BIGINT) AS core_deg
FROM sadj s
JOIN {prev} a ON a.node = s.x
JOIN {prev} b ON b.node = s.y
GROUP BY s.x
"""


def graph_oracles() -> dict[str, str]:
    """SemDeDup (cluster-restricted near-dups) and integer PageRank
    over the exact kNN graph — PageRank SQL comes from the shared
    _pagerank_sql builder (uniform teleport)."""
    from candidategeneration_ray.pipelines.clustering import KMEANS_ITERS

    last_a = f"a{KMEANS_ITERS + 1}"
    return {
        "semantic_neardups": f"""
WITH {_kmeans_ctes()},
cpairs AS (
  SELECT x.cluster, x.vec_id AS va, y.vec_id AS vb
  FROM {last_a} x JOIN {last_a} y
    ON x.cluster = y.cluster AND x.vec_id < y.vec_id
)
SELECT CAST(p.cluster AS BIGINT) AS cluster,
       CAST(p.va AS BIGINT) AS vec_a, CAST(p.vb AS BIGINT) AS vec_b
FROM cpairs p
JOIN embeddings ea ON ea.vec_id = p.va
JOIN embeddings eb ON eb.vec_id = p.vb
WHERE list_cosine_similarity(ea.embedding, eb.embedding) * 100 >= 40
""",
        "pagerank": _pagerank_sql(None, "pagerank"),
        "bfs_hops": _bfs_sql(),
        "shortest_paths": _wsp_sql(),
    }


def source_quantile_oracles() -> dict[str, str]:
    """Per-source histogram-quantile filter — same 64-char bins and
    ceil-rank rule as q_doclen_quantiles, per source."""
    from candidategeneration_ray.pipelines.sketches import HIST_BIN_WIDTH

    w, pct = HIST_BIN_WIDTH, 25
    return {
        "source_quantile_filter": f"""
WITH h AS (
  SELECT source, n_chars // {w} AS bin, CAST(count(*) AS BIGINT) AS n
  FROM documents GROUP BY source, bin
),
tot AS (SELECT source, sum(n) AS t FROM h GROUP BY source),
cum AS (
  SELECT h.source, h.bin,
         sum(n) OVER (PARTITION BY h.source ORDER BY h.bin) AS c, t.t
  FROM h JOIN tot t USING (source)
),
q AS (
  SELECT source, min(bin) AS thr_bin FROM cum
  WHERE c >= ({pct} * t + 99) // 100
  -- ceil over positives; DuckDB // truncates toward zero, so the
  -- negate-floor-negate ceil idiom is NOT valid here
  GROUP BY source
)
SELECT d.source, CAST(d.doc_id AS BIGINT) AS doc_id,
       CAST(d.n_chars AS BIGINT) AS n_chars,
       CAST(q.thr_bin AS BIGINT) AS thr_bin
FROM documents d JOIN q USING (source)
WHERE d.n_chars // {w} >= q.thr_bin
""",
    }


def pretrain_oracles() -> dict[str, str]:
    """End-to-end pretraining data-prep composition: quality gate ->
    benchmark removal + decontamination -> exact dedup -> per-source
    budgeted selection. Each stage reuses the EXACT rule text of its
    standalone oracle (quality_filter, decontaminate, dedup_exact,
    mixture_select), so the composition verifies the stage wiring, not
    just the stages."""
    from candidategeneration_ray.pipelines.extras import (
        QF_MAX_MEAN_WLEN, QF_MAX_WORDS, QF_MIN_WORDS, QF_PUNCT_MULT,
        QF_STOP_MULT)
    from candidategeneration_ray.pipelines.textlm import BENCH_MOD, DECON_W

    budget = 400
    return {
        "pretrain_select": f"""
WITH {KEPT_CTE},
{_DOCS_TOKS},
{_shingle_cte(DECON_W)},
{_WORDS_CTE},
qual AS (
  SELECT d.doc_id
  FROM documents d LEFT JOIN wstats w USING (doc_id)
  WHERE coalesce(w.n_words, 0) >= {QF_MIN_WORDS}
    AND coalesce(w.n_words, 0) <= {QF_MAX_WORDS}
    AND {QF_STOP_MULT} * coalesce(w.n_stop, 0) >= coalesce(w.n_words, 0)
    AND length(d.text) <= {QF_MAX_MEAN_WLEN} * greatest(coalesce(w.n_words, 0), 1)
    AND {QF_PUNCT_MULT} * len(regexp_extract_all(d.text, '[^A-Za-z0-9\\s]')) <= length(d.text)
),
bench AS (SELECT DISTINCT h FROM sh WHERE doc_id % {BENCH_MOD} = 0),
contam AS (
  SELECT DISTINCT s.doc_id FROM sh s JOIN bench USING (h)
  WHERE s.doc_id % {BENCH_MOD} <> 0
),
tk AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n,
              CAST(count(DISTINCT tok) AS BIGINT) AS nd
       FROM kept GROUP BY doc_id),
surv AS (
  SELECT d.doc_id, d.source, d.text, tk.n, tk.nd
  FROM documents d
  JOIN qual USING (doc_id)
  JOIN tk USING (doc_id)
  WHERE d.doc_id % {BENCH_MOD} <> 0
    AND d.doc_id NOT IN (SELECT doc_id FROM contam)
),
dd AS (SELECT min(doc_id) AS doc_id FROM surv GROUP BY md5(text)),
cand AS (
  SELECT s.source, s.doc_id, (1000 * s.nd) // s.n AS prio, s.n AS ntok
  FROM surv s JOIN dd USING (doc_id)
),
sel AS (
  SELECT source, doc_id, prio,
         sum(ntok) OVER (PARTITION BY source ORDER BY prio DESC, doc_id
                         ROWS UNBOUNDED PRECEDING) AS cum
  FROM cand
)
SELECT source, CAST(doc_id AS BIGINT) AS doc_id, CAST(prio AS BIGINT) AS prio,
       CAST(cum AS BIGINT) AS cum_tokens
FROM sel WHERE cum <= {budget}
""",
        # row-level lineage: the same stage rules, re-derived as a
        # fixed-priority reason CASE for EVERY document
        "selection_audit": f"""
WITH {KEPT_CTE},
{_DOCS_TOKS},
{_shingle_cte(DECON_W)},
{_WORDS_CTE},
qual AS (
  SELECT d.doc_id
  FROM documents d LEFT JOIN wstats w USING (doc_id)
  WHERE coalesce(w.n_words, 0) >= {QF_MIN_WORDS}
    AND coalesce(w.n_words, 0) <= {QF_MAX_WORDS}
    AND {QF_STOP_MULT} * coalesce(w.n_stop, 0) >= coalesce(w.n_words, 0)
    AND length(d.text) <= {QF_MAX_MEAN_WLEN} * greatest(coalesce(w.n_words, 0), 1)
    AND {QF_PUNCT_MULT} * len(regexp_extract_all(d.text, '[^A-Za-z0-9\\s]')) <= length(d.text)
),
bench AS (SELECT DISTINCT h FROM sh WHERE doc_id % {BENCH_MOD} = 0),
contam AS (
  SELECT DISTINCT s.doc_id FROM sh s JOIN bench USING (h)
  WHERE s.doc_id % {BENCH_MOD} <> 0
),
tk AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n,
              CAST(count(DISTINCT tok) AS BIGINT) AS nd
       FROM kept GROUP BY doc_id),
flags AS (
  SELECT d.doc_id, d.source, d.text,
         (d.doc_id % {BENCH_MOD} = 0) AS is_bench,
         (d.doc_id IN (SELECT doc_id FROM qual)) AS q_ok,
         (d.doc_id IN (SELECT doc_id FROM contam)) AS is_contam,
         coalesce(tk.n, 0) AS n, coalesce(tk.nd, 0) AS nd
  FROM documents d LEFT JOIN tk USING (doc_id)),
gate AS (SELECT *, (q_ok AND NOT is_bench AND NOT is_contam AND n > 0)
                AS ok FROM flags),
dd AS (SELECT min(doc_id) AS keep_id FROM gate WHERE ok GROUP BY md5(text)),
cand AS (
  SELECT g.source, g.doc_id, (1000 * g.nd) // g.n AS prio, g.n AS ntok
  FROM gate g JOIN dd ON dd.keep_id = g.doc_id),
sel AS (
  SELECT doc_id,
         sum(ntok) OVER (PARTITION BY source ORDER BY prio DESC, doc_id
                         ROWS UNBOUNDED PRECEDING) AS cum
  FROM cand)
SELECT CAST(g.doc_id AS BIGINT) AS doc_id, g.source,
       CASE WHEN g.is_bench THEN 'benchmark'
            WHEN NOT g.q_ok THEN 'quality'
            WHEN g.is_contam THEN 'contaminated'
            WHEN g.n = 0 THEN 'empty'
            WHEN s2.keep_id IS NULL THEN 'duplicate'
            WHEN s.cum <= {budget} THEN 'selected'
            ELSE 'over_budget' END AS reason
FROM gate g
LEFT JOIN dd s2 ON s2.keep_id = g.doc_id
LEFT JOIN sel s ON s.doc_id = g.doc_id
""",
    }


def relational_oracles() -> dict[str, str]:
    """Warehouse-surface operators over the TPC-H-shaped tables
    (pipelines/relational.py). Money math is integer cents with DuckDB
    round() (half away from zero) on both sides."""
    from candidategeneration_ray.pipelines.relational import (
        PRICING_CUTOFF, TOP_CUSTOMERS)

    c = "CAST(round(l_extendedprice * 100) AS BIGINT)"
    d = "CAST(round(l_discount * 100) AS BIGINT)"
    t = "CAST(round(l_tax * 100) AS BIGINT)"
    return {
        "pricing_summary": f"""
SELECT l_returnflag, l_linestatus,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(sum(CAST(round(l_quantity * 100) AS BIGINT) // 100) AS BIGINT) AS sum_qty,
       CAST(sum({c}) AS BIGINT) AS sum_base_cents,
       CAST(sum({c} * (100 - {d})) AS BIGINT) AS sum_disc_milli,
       CAST(sum({c} * (100 - {d}) * (100 + {t})) AS BIGINT) AS sum_charge_micro
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '{PRICING_CUTOFF}'
GROUP BY l_returnflag, l_linestatus
""",
        "nation_order_stats": """
SELECT n_name, o_orderstatus,
       CAST(count(*) AS BIGINT) AS n_orders,
       CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS total_cents
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN nation ON n_nationkey = c_nationkey
GROUP BY n_name, o_orderstatus
""",
        # salting is plan-level only: the salted entry must hash-match
        # the very same SQL as the unsalted join
        "nation_order_stats_salted": """
SELECT n_name, o_orderstatus,
       CAST(count(*) AS BIGINT) AS n_orders,
       CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS total_cents
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN nation ON n_nationkey = c_nationkey
GROUP BY n_name, o_orderstatus
""",
        "top_customers": f"""
SELECT CAST(o_custkey AS BIGINT) AS o_custkey,
       CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS total_cents,
       CAST(count(*) AS BIGINT) AS n_orders
FROM orders
GROUP BY o_custkey
ORDER BY total_cents DESC, o_custkey
LIMIT {TOP_CUSTOMERS}
""",
        **_session8_relational_oracles(c, d),
        "association_rules": """
WITH op AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
isup AS (SELECT l_partkey AS pk, CAST(count(*) AS BIGINT) AS s
         FROM op GROUP BY 1),
total AS (SELECT CAST(count(DISTINCT l_orderkey) AS BIGINT) AS n
          FROM lineitem),
pr AS (
  SELECT a.l_partkey AS p1, b.l_partkey AS p2,
         CAST(count(*) AS BIGINT) AS n
  FROM op a JOIN op b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY 1, 2 HAVING count(*) >= 3),
rules AS (SELECT p1 AS a, p2 AS b, n FROM pr
          UNION ALL SELECT p2, p1, n FROM pr)
SELECT CAST(r.a AS BIGINT) AS antecedent,
       CAST(r.b AS BIGINT) AS consequent,
       r.n AS pair_support,
       sa.s AS antecedent_support,
       CAST(r.n * total.n AS BIGINT) AS lift_num,
       CAST(sa.s * sb.s AS BIGINT) AS lift_den
FROM rules r
JOIN isup sa ON sa.pk = r.a
JOIN isup sb ON sb.pk = r.b
CROSS JOIN total
WHERE 5 * r.n >= 1 * sa.s
""",
        "record_orders": """
WITH w AS (
  SELECT o_orderkey,
         CAST(round(o_totalprice * 100) AS BIGINT) AS c,
         max(CAST(round(o_totalprice * 100) AS BIGINT)) OVER (
           ORDER BY o_orderdate, o_orderkey
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS mx
  FROM orders)
SELECT CAST(o_orderkey AS BIGINT) AS o_orderkey,
       c AS total_cents,
       CAST(coalesce(mx, 0) AS BIGINT) AS prev_max_cents
FROM w WHERE mx IS NULL OR c > mx
""",
        "copurchase_pairs": """
WITH op AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
pr AS (
  SELECT a.l_orderkey, a.l_partkey AS p1, b.l_partkey AS p2
  FROM op a JOIN op b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey)
SELECT CAST(p1 AS BIGINT) AS p1, CAST(p2 AS BIGINT) AS p2,
       CAST(count(*) AS BIGINT) AS n_orders
FROM pr GROUP BY 1, 2
ORDER BY n_orders DESC, p1, p2
LIMIT 50
""",
    }


def _session8_relational_oracles(c: str, d: str) -> dict[str, str]:
    from candidategeneration_ray.pipelines.relational import (
        Q2_PART_TYPE, Q2_REGION, Q6_DISC_PCTS, Q6_MAX_QTY, Q6_SHIP_HI,
        Q6_SHIP_LO, Q9_NAME_SUBSTR, Q15_SHIP_HI, Q15_SHIP_LO, Q19_DISJUNCTS)

    q = "CAST(round(l_quantity * 100) AS BIGINT) // 100"
    pcts = ", ".join(str(p) for p in Q6_DISC_PCTS)
    disj = " OR ".join(
        f"(p_brand = '{b}' AND p_size BETWEEN 1 AND {mx} "
        f"AND {q} BETWEEN {qlo} AND {qhi})"
        for b, mx, qlo, qhi in Q19_DISJUNCTS)
    return {
        "forecast_revenue": f"""
SELECT CAST(coalesce(sum({c} * {d}), 0) AS BIGINT) AS revenue_e4,
       CAST(count(*) AS BIGINT) AS n_lines
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '{Q6_SHIP_LO}'
  AND l_shipdate <  TIMESTAMP '{Q6_SHIP_HI}'
  AND {d} IN ({pcts})
  AND {q} < {Q6_MAX_QTY}
""",
        "nation_profit": f"""
SELECT n_name,
       CAST(year(o_orderdate) AS BIGINT) AS o_year,
       CAST(sum({c} * (100 - {d})
                - CAST(round(p_retailprice * 100) AS BIGINT) * {q} * 100)
            AS BIGINT) AS profit_e4,
       CAST(count(*) AS BIGINT) AS n_lines
FROM lineitem
JOIN part ON p_partkey = l_partkey
JOIN supplier ON s_suppkey = l_suppkey
JOIN nation ON n_nationkey = s_nationkey
JOIN orders ON o_orderkey = l_orderkey
WHERE p_name LIKE '%{Q9_NAME_SUBSTR}%'
GROUP BY n_name, year(o_orderdate)
""",
        "top_supplier_revenue": f"""
WITH rev AS (
  SELECT CAST(l_suppkey AS BIGINT) AS s_suppkey,
         CAST(sum({c} * (100 - {d})) AS BIGINT) AS revenue_e4
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '{Q15_SHIP_LO}'
    AND l_shipdate <  TIMESTAMP '{Q15_SHIP_HI}'
  GROUP BY 1)
SELECT s_suppkey, s_name, revenue_e4
FROM rev JOIN supplier USING (s_suppkey)
WHERE revenue_e4 = (SELECT max(revenue_e4) FROM rev)
""",
        "min_price_supplier": f"""
WITH cat AS (
  SELECT CAST(l_partkey AS BIGINT) AS p_partkey,
         CAST(l_suppkey AS BIGINT) AS s_suppkey,
         CAST(min({c}) AS BIGINT) AS min_cents
  FROM lineitem
  JOIN part ON p_partkey = l_partkey AND p_type = '{Q2_PART_TYPE}'
  JOIN supplier ON s_suppkey = l_suppkey
  JOIN nation ON n_nationkey = s_nationkey
  JOIN region ON r_regionkey = n_regionkey AND r_name = '{Q2_REGION}'
  GROUP BY 1, 2)
SELECT cat.p_partkey, p.p_name, cat.s_suppkey, s.s_name, n.n_name,
       cat.min_cents
FROM cat
JOIN part p ON p.p_partkey = cat.p_partkey
JOIN supplier s ON s.s_suppkey = cat.s_suppkey
JOIN nation n ON n.n_nationkey = s.s_nationkey
WHERE cat.min_cents = (SELECT min(c2.min_cents) FROM cat c2
                       WHERE c2.p_partkey = cat.p_partkey)
""",
        "disjunctive_revenue": f"""
SELECT CAST(coalesce(sum({c} * (100 - {d})), 0) AS BIGINT) AS revenue_e4,
       CAST(count(*) AS BIGINT) AS n_lines
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE {disj}
""",
    }


def windowed_distinct_oracles() -> dict[str, str]:
    w_us = 3600 * 1_000_000
    return {
        "windowed_distinct_users": f"""
SELECT event_type,
       CAST((epoch_us(ts) // {w_us}) * {w_us} AS BIGINT) AS window_start_us,
       CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
FROM events
GROUP BY 1, 2
""",
    }


def cluster_label_oracles() -> dict[str, str]:
    """Cross-modal cluster labeling: k-means assignment (unrolled Lloyd
    CTEs) joined to the kept-token tf table by vec_id = doc_id, summed
    per (cluster, term), scored with the same integer tf-idf as
    tfidf_top3, top-5 per cluster."""
    from candidategeneration_ray.pipelines.clustering import KMEANS_ITERS

    last_a = f"a{KMEANS_ITERS + 1}"
    return {
        "cluster_top_terms": f"""
WITH {KEPT_CTE},
{_kmeans_ctes()},
tf AS (SELECT doc_id, tok, CAST(count(*) AS BIGINT) AS tf FROM kept GROUP BY doc_id, tok),
dft AS (SELECT tok, CAST(count(DISTINCT doc_id) AS BIGINT) AS df FROM kept GROUP BY tok),
ndc AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM documents),
ct AS (
  SELECT a.cluster, tf.tok, CAST(sum(tf.tf) AS BIGINT) AS stf
  FROM {last_a} a JOIN tf ON tf.doc_id = a.vec_id
  GROUP BY a.cluster, tf.tok
),
sc AS (
  SELECT cluster, tok,
         stf * CAST(trunc(ln(CAST(n_docs AS DOUBLE) / CAST(df AS DOUBLE)) * 10000000) AS BIGINT) AS score
  FROM ct JOIN dft USING (tok) CROSS JOIN ndc
)
SELECT CAST(cluster AS BIGINT) AS cluster,
       CAST(row_number() OVER (PARTITION BY cluster
                               ORDER BY score DESC, tok) AS BIGINT) AS rank,
       tok AS term, CAST(score AS BIGINT) AS score
FROM sc
QUALIFY rank <= 5
""",
    }


def kmeans_eval_oracles() -> dict[str, str]:
    from candidategeneration_ray.pipelines.clustering import KMEANS_ITERS

    last_a = f"a{KMEANS_ITERS + 1}"
    return {
        "kmeans_label_eval": f"""
WITH {_kmeans_ctes()}
SELECT CAST(a.cluster AS BIGINT) AS cluster,
       CAST(e.label AS BIGINT) AS label,
       CAST(count(*) AS BIGINT) AS n
FROM {last_a} a JOIN embeddings e USING (vec_id)
GROUP BY 1, 2
""",
    }


def events_topk_oracles() -> dict[str, str]:
    w_us = 3600 * 1_000_000
    return {
        "window_top_users": f"""
WITH c AS (
  SELECT CAST((epoch_us(ts) // {w_us}) * {w_us} AS BIGINT) AS window_start_us,
         CAST(user_id AS BIGINT) AS user_id,
         CAST(count(*) AS BIGINT) AS n_events
  FROM events GROUP BY 1, 2
)
SELECT window_start_us,
       CAST(row_number() OVER (PARTITION BY window_start_us
                               ORDER BY n_events DESC, user_id) AS BIGINT) AS rank,
       user_id, n_events
FROM c
QUALIFY rank <= 3
""",
    }


def kmeans_purity_oracles() -> dict[str, str]:
    from candidategeneration_ray.pipelines.clustering import KMEANS_ITERS

    last_a = f"a{KMEANS_ITERS + 1}"
    return {
        "kmeans_purity": f"""
WITH {_kmeans_ctes()},
cont AS (
  SELECT a.cluster, e.label, CAST(count(*) AS BIGINT) AS n
  FROM {last_a} a JOIN embeddings e USING (vec_id)
  GROUP BY 1, 2
),
mx AS (SELECT cluster, max(n) AS m FROM cont GROUP BY cluster),
tot AS (SELECT CAST(count(*) AS BIGINT) AS n FROM embeddings)
SELECT tot.n AS n_vectors,
       CAST((sum(m) * 1000000) // tot.n AS BIGINT) AS purity_millionths
FROM mx CROSS JOIN tot GROUP BY tot.n
""",
    }


def positional_oracles() -> dict[str, str]:
    """Phrase matching re-derived in SQL: consecutive KEPT-token
    positions (kpos self-joins on +1 offsets), overlapping occurrences
    counted — independent of the positional family's encoding."""
    from candidategeneration_ray.functions.tokenize import tokenize_text
    from candidategeneration_ray.pipelines.positional import PHRASE_QUERIES

    parts = []
    for pid, phrase in PHRASE_QUERIES:
        toks = tokenize_text(phrase)
        if not toks:
            continue
        joins = "\n  ".join(
            f"JOIN kept p{i} ON p{i}.doc_id = p0.doc_id "
            f"AND p{i}.kpos = p0.kpos + {i} AND p{i}.tok = '{t}'"
            for i, t in enumerate(toks[1:], 1)
        )
        parts.append(f"""
SELECT CAST({pid} AS BIGINT) AS phrase_id,
       CAST(p0.doc_id AS BIGINT) AS doc_id,
       CAST(count(*) AS BIGINT) AS n_occurrences
FROM kept p0
  {joins}
WHERE p0.tok = '{toks[0]}'
GROUP BY p0.doc_id""")
    union = "\nUNION ALL\n".join(parts)
    sql = f"""
WITH {KEPT_CTE}
{union}
"""
    # the LSM entry serves base+delta through generations/compaction;
    # phrase semantics are epoch-free, so the SAME full-corpus SQL is
    # the exact oracle
    return {"phrase_postings": sql, "phrase_delta_postings": sql}


def phrase_bm25_oracles() -> dict[str, str]:
    """Phrase-constrained BM25 ranking re-derived in SQL: the phrase
    self-join from positional_oracles() supplies the matching docs and
    occurrence counts; the shared SCORES_CTE (bit-exact BM25 quantized
    scores) supplies per-(doc, term) scores summed over the phrase's
    DISTINCT terms; a window rank takes the top-k."""
    from candidategeneration_ray.functions.tokenize import tokenize_text
    from candidategeneration_ray.pipelines.positional import (
        PHRASE_BM25_TOPK, PHRASE_QUERIES)

    parts = []
    for pid, phrase in PHRASE_QUERIES:
        toks = tokenize_text(phrase)
        if not toks:
            continue
        joins = "\n    ".join(
            f"JOIN kept p{i} ON p{i}.doc_id = p0.doc_id "
            f"AND p{i}.kpos = p0.kpos + {i} AND p{i}.tok = '{t}'"
            for i, t in enumerate(toks[1:], 1))
        tl = ", ".join(f"'{t}'" for t in sorted(set(toks)))
        parts.append(f"""
SELECT CAST({pid} AS BIGINT) AS phrase_id,
       CAST(m.doc_id AS BIGINT) AS doc_id,
       m.n_occurrences,
       CAST(sum(s.score) AS BIGINT) AS score
FROM (
  SELECT p0.doc_id, CAST(count(*) AS BIGINT) AS n_occurrences
  FROM kept p0
    {joins}
  WHERE p0.tok = '{toks[0]}'
  GROUP BY p0.doc_id
) m JOIN scores s ON s.doc_id = m.doc_id AND s.tok IN ({tl})
GROUP BY m.doc_id, m.n_occurrences""")
    union = "\nUNION ALL\n".join(parts)
    return {
        "phrase_bm25_topk": f"""
WITH {KEPT_CTE},
{SCORES_CTE},
matched AS ({union})
SELECT phrase_id, rank, doc_id, score, n_occurrences FROM (
  SELECT phrase_id, doc_id, score, n_occurrences,
         CAST(row_number() OVER (PARTITION BY phrase_id
                                 ORDER BY score DESC, doc_id ASC) AS BIGINT)
           AS rank
  FROM matched
) WHERE rank <= {PHRASE_BM25_TOPK}
""",
    }


def heavy_hitter_oracles() -> dict[str, str]:
    w_us = 86400 * 1_000_000
    phi100 = 150
    return {
        # n >= ceil(phi100*nw/10000)  <=>  n*10000 >= phi100*nw (ints)
        "windowed_heavy_hitters": f"""
WITH c AS (
  SELECT CAST((epoch_us(ts) // {w_us}) * {w_us} AS BIGINT) AS window_start_us,
         CAST(user_id AS BIGINT) AS user_id,
         CAST(count(*) AS BIGINT) AS n_events
  FROM events GROUP BY 1, 2
),
tot AS (SELECT window_start_us, sum(n_events) AS nw FROM c GROUP BY 1)
SELECT c.window_start_us, c.user_id, c.n_events
FROM c JOIN tot USING (window_start_us)
WHERE c.n_events * 10000 >= {phi100} * nw
""",
    }


def ivf_delta_oracles() -> dict[str, str]:
    from candidategeneration_ray.pipelines.clustering import KMEANS_ITERS

    last_a = f"a{KMEANS_ITERS + 1}"
    return {
        # codebook trained on EVEN vec_ids only; every vector assigned
        # under it — the frozen-epoch IVF delta semantics
        "ivf_delta_counts": f"""
WITH {_kmeans_ctes(train_pred="vec_id % 2 = 0")}
SELECT cluster,
       CAST(count(*) AS BIGINT) AS n_vectors,
       CAST(sum(vec_id) AS BIGINT) AS vec_id_sum
FROM {last_a} GROUP BY cluster
""",
        # same frozen-codebook assignment, vectors with vec_id%5==2
        # tombstone-deleted (the IVF delete path)
        "ivf_delete_counts": f"""
WITH {_kmeans_ctes(train_pred="vec_id % 2 = 0")}
SELECT cluster,
       CAST(count(*) AS BIGINT) AS n_vectors,
       CAST(sum(vec_id) AS BIGINT) AS vec_id_sum
FROM {last_a} WHERE vec_id % 5 <> 2 GROUP BY cluster
""",
    }


def proximity_oracles() -> dict[str, str]:
    """Proximity matching re-derived in SQL: an anchor kept-position a
    satisfies iff every query term has a kept position in
    [a, a+W) in the same doc; n_anchors counts satisfying anchors."""
    from candidategeneration_ray.functions.tokenize import tokenize_text
    from candidategeneration_ray.pipelines.positional import (
        PROX_QUERIES, PROX_W)

    parts = []
    for qid, text in PROX_QUERIES:
        toks = sorted(set(tokenize_text(text)))
        if not toks:
            continue
        tl = ", ".join(f"'{t}'" for t in toks)
        ex = "\n  AND ".join(
            f"EXISTS (SELECT 1 FROM kept k WHERE k.doc_id = a.doc_id "
            f"AND k.tok = '{t}' AND k.kpos >= a.kpos "
            f"AND k.kpos < a.kpos + {PROX_W})"
            for t in toks)
        parts.append(f"""
SELECT CAST({qid} AS BIGINT) AS query_id,
       CAST(a.doc_id AS BIGINT) AS doc_id,
       CAST(count(*) AS BIGINT) AS n_anchors
FROM (SELECT doc_id, kpos FROM kept WHERE tok IN ({tl})) a
WHERE {ex}
GROUP BY a.doc_id""")
    union = "\nUNION ALL\n".join(parts)
    return {
        "proximity_docs": f"""
WITH {KEPT_CTE}
{union}
""",
    }


def ordered_window_oracles() -> dict[str, str]:
    """Ordered-window (#odW) re-derived in SQL: one min-aggregate CTE
    per chain step (greedy-leftmost next position — feasibility-optimal,
    so it equals exists-a-chain), n_matches counts surviving anchors."""
    from candidategeneration_ray.functions.tokenize import tokenize_text
    from candidategeneration_ray.pipelines.positional import OW_QUERIES, OW_W

    ctes, parts = [], []
    for qid, text in OW_QUERIES:
        toks = tokenize_text(text)
        if not toks:
            continue
        ctes.append(
            f"q{qid}_c1 AS (SELECT doc_id, kpos AS anchor, kpos AS cur "
            f"FROM kept WHERE tok = '{toks[0]}')")
        for i, t in enumerate(toks[1:], start=2):
            ctes.append(
                f"q{qid}_c{i} AS (SELECT a.doc_id, a.anchor, "
                f"min(b.kpos) AS cur "
                f"FROM q{qid}_c{i - 1} a JOIN kept b "
                f"ON b.doc_id = a.doc_id AND b.tok = '{t}' "
                f"AND b.kpos > a.cur AND b.kpos <= a.cur + {OW_W} "
                f"GROUP BY a.doc_id, a.anchor)")
        parts.append(
            f"SELECT CAST({qid} AS BIGINT) AS query_id, "
            f"CAST(doc_id AS BIGINT) AS doc_id, "
            f"CAST(count(*) AS BIGINT) AS n_matches "
            f"FROM q{qid}_c{len(toks)} GROUP BY doc_id")
    union = "\nUNION ALL\n".join(parts)
    return {
        "ordered_window_docs": f"""
WITH {KEPT_CTE},
{','.join(ctes)}
{union}
""",
    }


def sdm_oracles() -> dict[str, str]:
    """SDM re-derived in SQL: bm25 totals from the shared qscores CTE;
    per adjacent query-term pair one ordered (#od1: kpos+1 equality)
    and one unordered (#uw8: |Δkpos| < SDM_UW) count CTE; integer
    weights identical to the engine constants."""
    from candidategeneration_ray.functions.tokenize import tokenize_text
    from candidategeneration_ray.pipelines.docquery import DOC_QUERIES
    from candidategeneration_ray.pipelines.positional import (
        SDM_SCALE, SDM_UW, SDM_W_O, SDM_W_T, SDM_W_U)

    ctes, parts = [], []
    for qid, text in DOC_QUERIES:
        toks = tokenize_text(text)
        pairs = [(a, b) for a, b in zip(toks, toks[1:]) if a != b]
        terms = []
        for j, (a, b) in enumerate(pairs):
            ctes.append(
                f"od{qid}_{j} AS (SELECT ka.doc_id, CAST(count(*) AS BIGINT)"
                f" AS c FROM kept ka JOIN kept kb ON kb.doc_id = ka.doc_id"
                f" AND kb.tok = '{b}' AND kb.kpos = ka.kpos + 1"
                f" WHERE ka.tok = '{a}' GROUP BY ka.doc_id)")
            ctes.append(
                f"uw{qid}_{j} AS (SELECT ka.doc_id, CAST(count(*) AS BIGINT)"
                f" AS c FROM kept ka JOIN kept kb ON kb.doc_id = ka.doc_id"
                f" AND kb.tok = '{b}' AND abs(kb.kpos - ka.kpos) < {SDM_UW}"
                f" WHERE ka.tok = '{a}' GROUP BY ka.doc_id)")
            terms.append(
                f"+ {SDM_W_O * SDM_SCALE} * coalesce(od{qid}_{j}.c, 0) "
                f"+ {SDM_W_U * SDM_SCALE} * coalesce(uw{qid}_{j}.c, 0)")
        joins = "".join(
            f" LEFT JOIN od{qid}_{j} ON od{qid}_{j}.doc_id = q.doc_id"
            f" LEFT JOIN uw{qid}_{j} ON uw{qid}_{j}.doc_id = q.doc_id"
            for j in range(len(pairs)))
        expr = f"{SDM_W_T} * q.score " + " ".join(terms)
        parts.append(f"""
SELECT query_id, rank, doc_id, sdm_score FROM (
  SELECT CAST({qid} AS BIGINT) AS query_id,
         CAST(row_number() OVER (ORDER BY sdm DESC, doc_id ASC)
           AS BIGINT) AS rank,
         doc_id, CAST(sdm AS BIGINT) AS sdm_score
  FROM (SELECT q.doc_id, {expr} AS sdm
        FROM qscores q{joins}
        WHERE q.query_id = {qid})
) WHERE rank <= 10""")
    union = "\nUNION ALL\n".join(parts)
    return {
        "sdm_topk": f"""
WITH {KEPT_CTE},
{SCORES_CTE},
{QTOK_CTE},
qscores AS MATERIALIZED (
  SELECT q.query_id, s.doc_id, CAST(sum(s.score) AS BIGINT) AS score
  FROM qtok q JOIN scores s USING (tok)
  GROUP BY q.query_id, s.doc_id
),
{','.join(ctes)}
{union}
""",
    }


def boolean_query_oracles() -> dict[str, str]:
    """The boolean compiler's SQL backend: the SAME parser/AST the
    engine evaluates over posting lists lowers here to a boolean over
    EXISTS probes per query, unioned."""
    from candidategeneration_ray.pipelines.lexicon import (
        BOOL_QUERIES, bool_ast_to_sql, parse_bool_query)

    parts = []
    for qid, text in BOOL_QUERIES:
        pred = bool_ast_to_sql(parse_bool_query(text))
        parts.append(
            f"SELECT CAST({qid} AS BIGINT) AS query_id, d.doc_id "
            f"FROM documents d WHERE {pred}")
    union = "\nUNION ALL\n".join(parts)
    return {
        "boolean_query_docs": f"""
WITH {KEPT_CTE}
{union}
""",
    }


def corrected_query_oracles() -> dict[str, str]:
    """Correction + rescore replayed in SQL: per query word one
    (levenshtein asc, df desc, tok asc) LIMIT 1 probe of the
    dictionary CTE; corrected DISTINCT terms join the shared scores
    CTE; window rank takes the top-10."""
    from candidategeneration_ray.functions.tokenize import tokenize_text
    from candidategeneration_ray.pipelines.lexicon import CORR_QUERIES

    ctes, parts = [], []
    for qid, text in CORR_QUERIES:
        words = tokenize_text(text)
        sub = "\nUNION ALL\n".join(
            f"(SELECT tok FROM dic WHERE levenshtein(tok, '{w}') <= 1 "
            f"ORDER BY levenshtein(tok, '{w}') ASC, df DESC, tok ASC "
            f"LIMIT 1)" for w in words)
        ctes.append(f"corr{qid} AS (SELECT DISTINCT tok FROM ({sub}))")
        parts.append(f"""
SELECT query_id, rank, doc_id, score FROM (
  SELECT CAST({qid} AS BIGINT) AS query_id,
         CAST(row_number() OVER (ORDER BY score DESC, doc_id ASC)
           AS BIGINT) AS rank,
         doc_id, score
  FROM (SELECT s.doc_id, CAST(sum(s.score) AS BIGINT) AS score
        FROM corr{qid} c JOIN scores s USING (tok)
        GROUP BY s.doc_id)
) WHERE rank <= 10""")
    union = "\nUNION ALL\n".join(parts)
    return {
        "corrected_bm25_topk": f"""
WITH {KEPT_CTE},
{SCORES_CTE},
dic AS MATERIALIZED (
  SELECT tok, CAST(count(DISTINCT doc_id) AS BIGINT) AS df
  FROM kept GROUP BY tok
),
{','.join(ctes)}
{union}
""",
    }


def synonym_oracles() -> dict[str, str]:
    """Synonym blending in SQL: per (query, group) a max-over-members
    score per doc, summed across groups, window-ranked top-10."""
    from candidategeneration_ray.pipelines.lexicon import SYNONYM_QUERIES

    rows = []
    for qid, groups in SYNONYM_QUERIES:
        for g, group in enumerate(groups):
            for t in group:
                rows.append(f"({qid}, {g}, '{t}')")
    values = ", ".join(rows)
    return {
        "synonym_bm25_topk": f"""
WITH {KEPT_CTE},
{SCORES_CTE},
syn(query_id, grp, tok) AS (VALUES {values}),
blend AS (
  SELECT s2.query_id, s2.doc_id, CAST(sum(s2.gmax) AS BIGINT) AS score
  FROM (
    SELECT y.query_id, y.grp, s.doc_id, max(s.score) AS gmax
    FROM syn y JOIN scores s USING (tok)
    GROUP BY y.query_id, y.grp, s.doc_id
  ) s2
  GROUP BY s2.query_id, s2.doc_id
)
SELECT query_id, rank, doc_id, score FROM (
  SELECT CAST(query_id AS BIGINT) AS query_id,
         CAST(row_number() OVER (PARTITION BY query_id
                                 ORDER BY score DESC, doc_id ASC)
           AS BIGINT) AS rank,
         doc_id, score
  FROM blend
) WHERE rank <= 10
""",
    }


def wildcard_oracles() -> dict[str, str]:
    """Wildcard retrieval as SQL LIKE over the kept tokens ('*'→'%'),
    distinct doc per pattern."""
    from candidategeneration_ray.pipelines.lexicon import WILDCARD_QUERIES

    parts = []
    for qid, pat in WILDCARD_QUERIES:
        like = pat.replace("%", r"\%").replace("_", r"\_").replace("*", "%")
        parts.append(
            f"SELECT CAST({qid} AS BIGINT) AS pattern_id, doc_id "
            f"FROM kept WHERE tok LIKE '{like}' ESCAPE '\\'")
    union = "\nUNION ALL\n".join(
        f"SELECT DISTINCT * FROM ({p})" for p in parts)
    return {
        "wildcard_docs": f"""
WITH {KEPT_CTE}
{union}
""",
    }


def kmeans_ari_oracles() -> dict[str, str]:
    from candidategeneration_ray.pipelines.clustering import KMEANS_ITERS

    last_a = f"a{KMEANS_ITERS + 1}"
    return {
        # all terms integral (x2 trick); n*(n-1)//2 is floor==trunc for
        # the nonnegative counts here
        "kmeans_ari": f"""
WITH {_kmeans_ctes()},
cont AS (
  SELECT a.cluster, e.label, CAST(count(*) AS BIGINT) AS n
  FROM {last_a} a JOIN embeddings e USING (vec_id)
  GROUP BY 1, 2
),
vals AS (
  SELECT
    (SELECT CAST(sum(n) AS BIGINT) FROM cont) AS n_vectors,
    (SELECT CAST(sum(n * (n - 1) // 2) AS BIGINT) FROM cont) AS index_comb,
    (SELECT CAST(sum(s * (s - 1) // 2) AS BIGINT)
     FROM (SELECT sum(n) AS s FROM cont GROUP BY cluster)) AS sum_a_comb,
    (SELECT CAST(sum(s * (s - 1) // 2) AS BIGINT)
     FROM (SELECT sum(n) AS s FROM cont GROUP BY label)) AS sum_b_comb
)
SELECT n_vectors, index_comb, sum_a_comb, sum_b_comb,
       CAST(2 * (index_comb * (n_vectors * (n_vectors - 1) // 2)
                 - sum_a_comb * sum_b_comb) AS BIGINT) AS ari_num2,
       CAST((n_vectors * (n_vectors - 1) // 2) * (sum_a_comb + sum_b_comb)
            - 2 * sum_a_comb * sum_b_comb AS BIGINT) AS ari_den2
FROM vals
""",
    }


def funnel_oracles() -> dict[str, str]:
    from candidategeneration_ray.pipelines.events import FUNNEL_STAGES

    ctes, selects = [], []
    for i, s in enumerate(FUNNEL_STAGES, 1):
        if i == 1:
            ctes.append(f"""s1 AS (
  SELECT user_id, min(epoch_us(ts)) AS t FROM events
  WHERE event_type = '{s}' GROUP BY user_id)""")
        else:
            ctes.append(f"""s{i} AS (
  SELECT e.user_id, min(epoch_us(e.ts)) AS t
  FROM events e JOIN s{i - 1} p
    ON e.user_id = p.user_id AND epoch_us(e.ts) > p.t
  WHERE e.event_type = '{s}' GROUP BY e.user_id)""")
        selects.append(
            f"SELECT CAST({i} AS BIGINT) AS stage, '{s}' AS event_type, "
            f"CAST((SELECT count(*) FROM s{i}) AS BIGINT) AS n_users")
    return {
        "funnel_counts": "WITH " + ",\n".join(ctes) + "\n"
                         + "\nUNION ALL\n".join(selects),
    }


def cohort_oracles() -> dict[str, str]:
    w_us = 7 * 86400 * 1_000_000
    horizon = 5
    return {
        "cohort_retention": f"""
WITH s AS (
  SELECT user_id, min(epoch_us(ts)) // {w_us} AS wk0
  FROM events WHERE event_type = 'signup' GROUP BY user_id
),
p AS (
  SELECT DISTINCT e.user_id, s.wk0,
         (epoch_us(e.ts) // {w_us}) - s.wk0 AS k
  FROM events e JOIN s USING (user_id)
  WHERE e.event_type = 'purchase'
    AND (epoch_us(e.ts) // {w_us}) - s.wk0 >= 0
    AND (epoch_us(e.ts) // {w_us}) - s.wk0 < {horizon}
)
SELECT CAST(wk0 * {w_us} AS BIGINT) AS cohort_start_us,
       CAST(k AS BIGINT) AS week_offset,
       CAST(count(*) AS BIGINT) AS n_users
FROM p GROUP BY 1, 2
""",
    }


def q3_oracles() -> dict[str, str]:
    from candidategeneration_ray.pipelines.relational import (
        Q3_CUTOFF, Q3_SEGMENT, Q3_TOPK)

    return {
        "shipping_priority": f"""
SELECT CAST(l_orderkey AS BIGINT) AS l_orderkey,
       CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                * (100 - CAST(round(l_discount * 100) AS BIGINT)))
            AS BIGINT) AS revenue_milli,
       CAST(epoch_us(o_orderdate) AS BIGINT) AS o_orderdate_us,
       o_orderpriority
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = '{Q3_SEGMENT}'
  AND o_orderdate < TIMESTAMP '{Q3_CUTOFF}'
  AND l_shipdate > TIMESTAMP '{Q3_CUTOFF}'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue_milli DESC, o_orderdate_us, l_orderkey
LIMIT {Q3_TOPK}
""",
    }


def q5_oracles() -> dict[str, str]:
    from candidategeneration_ray.pipelines.relational import (
        Q5_DATE_HI, Q5_DATE_LO, Q5_REGION)

    return {
        "local_supplier_volume": f"""
SELECT n_name,
       CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                * (100 - CAST(round(l_discount * 100) AS BIGINT)))
            AS BIGINT) AS revenue_milli
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE c_nationkey = s_nationkey
  AND r_name = '{Q5_REGION}'
  AND o_orderdate >= TIMESTAMP '{Q5_DATE_LO}'
  AND o_orderdate < TIMESTAMP '{Q5_DATE_HI}'
GROUP BY n_name
""",
        "customers_no_orders": f"""
SELECT n_name, CAST(count(*) AS BIGINT) AS n_customers
FROM customer JOIN nation ON c_nationkey = n_nationkey
WHERE c_custkey NOT IN (
    SELECT o_custkey FROM orders
    WHERE o_orderdate >= TIMESTAMP '{Q5_DATE_LO}'
      AND o_orderdate < TIMESTAMP '{Q5_DATE_HI}')
GROUP BY n_name
""",
    }


def minspan_oracles() -> dict[str, str]:
    """Minimal covering window re-derived in SQL: for each anchor the
    per-term NEXT kept position >= the anchor (correlated min), span =
    greatest(next_i) - anchor + 1 when every term resolves in-doc."""
    from candidategeneration_ray.functions.tokenize import tokenize_text
    from candidategeneration_ray.pipelines.positional import (
        MINSPAN_TOPK, PROX_QUERIES)

    parts = []
    for qid, text in PROX_QUERIES:
        toks = sorted(set(tokenize_text(text)))
        if not toks:
            continue
        tl = ", ".join(f"'{t}'" for t in toks)
        nxt_cols = ",\n         ".join(
            f"(SELECT min(k.kpos) FROM kept k WHERE k.doc_id = a.doc_id "
            f"AND k.tok = '{t}' AND k.kpos >= a.kpos) AS n{i}"
            for i, t in enumerate(toks))
        notnull = " AND ".join(f"n{i} IS NOT NULL" for i in range(len(toks)))
        greatest = ", ".join(f"n{i}" for i in range(len(toks)))
        parts.append(f"""
SELECT CAST({qid} AS BIGINT) AS query_id,
       CAST(row_number() OVER (ORDER BY ms, doc_id) AS BIGINT) AS rank,
       CAST(doc_id AS BIGINT) AS doc_id,
       CAST(ms AS BIGINT) AS min_span
FROM (
  SELECT doc_id, min(greatest({greatest}) - kpos + 1) AS ms
  FROM (
    SELECT a.doc_id, a.kpos,
         {nxt_cols}
    FROM (SELECT doc_id, kpos FROM kept WHERE tok IN ({tl})) a
  )
  WHERE {notnull}
  GROUP BY doc_id
)
QUALIFY rank <= {MINSPAN_TOPK}""")
    union = "\nUNION ALL\n".join(parts)
    return {
        "minspan_topk": f"""
WITH {KEPT_CTE}
{union}
""",
    }


def rollup_oracles() -> dict[str, str]:
    return {
        "nation_rollup": """
SELECT coalesce(n_name, 'ALL') AS n_name,
       coalesce(o_orderstatus, 'ALL') AS o_orderstatus,
       CAST(count(*) AS BIGINT) AS n_orders,
       CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS total_cents
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN nation ON n_nationkey = c_nationkey
GROUP BY ROLLUP (n_name, o_orderstatus)
""",
    }


def term_embedding_oracles() -> dict[str, str]:
    from candidategeneration_ray.pipelines.clustering import KMEANS_SCALE

    return {
        # same float semantics as the kmeans oracle: int sums,
        # floor(double division)
        "term_embeddings": f"""
WITH {KEPT_CTE},
tops AS (
  SELECT tok FROM (
    SELECT tok, count(DISTINCT doc_id) AS df FROM kept GROUP BY tok)
  ORDER BY df DESC, tok LIMIT 20
),
dt AS (SELECT DISTINCT doc_id, tok FROM kept
       WHERE tok IN (SELECT tok FROM tops)),
qv AS (
  SELECT vec_id,
         CAST(generate_subscripts(embedding, 1) - 1 AS BIGINT) AS d,
         CAST(trunc(CAST(unnest(embedding) AS DOUBLE) * {KMEANS_SCALE}) AS BIGINT) AS x
  FROM embeddings
)
SELECT dt.tok AS term, qv.d AS dim,
       CAST(floor(CAST(sum(qv.x) AS DOUBLE) / count(*)) AS BIGINT) AS centroid_q
FROM dt JOIN qv ON qv.vec_id = dt.doc_id
GROUP BY dt.tok, qv.d
""",
    }


def snippet_oracles() -> dict[str, str]:
    """KWIC snippets re-derived in SQL: best window = minimal span,
    ties to the earliest anchor; snippet = kept tokens across the
    window via string_agg ordered by position."""
    from candidategeneration_ray.functions.tokenize import tokenize_text
    from candidategeneration_ray.pipelines.positional import (
        PROX_QUERIES, SNIPPET_TOPK)

    parts = []
    for qid, text in PROX_QUERIES:
        toks = sorted(set(tokenize_text(text)))
        if not toks:
            continue
        tl = ", ".join(f"'{t}'" for t in toks)
        nxt_cols = ",\n           ".join(
            f"(SELECT min(k.kpos) FROM kept k WHERE k.doc_id = a.doc_id "
            f"AND k.tok = '{t}' AND k.kpos >= a.kpos) AS n{i}"
            for i, t in enumerate(toks))
        notnull = " AND ".join(f"n{i} IS NOT NULL" for i in range(len(toks)))
        greatest = ", ".join(f"n{i}" for i in range(len(toks)))
        parts.append(f"""
SELECT query_id, rank, doc_id, min_span,
       (SELECT string_agg(k.tok, ' ' ORDER BY k.kpos) FROM kept k
        WHERE k.doc_id = t.doc_id
          AND k.kpos BETWEEN t.a AND t.a + t.min_span - 1) AS snippet
FROM (
  SELECT CAST({qid} AS BIGINT) AS query_id,
         CAST(row_number() OVER (ORDER BY ms, doc_id) AS BIGINT) AS rank,
         CAST(doc_id AS BIGINT) AS doc_id,
         CAST(ms AS BIGINT) AS min_span, a
  FROM (
    SELECT s.doc_id, b.ms, min(s.kpos) AS a
    FROM (
      SELECT doc_id, kpos, greatest({greatest}) - kpos + 1 AS span
      FROM (
        SELECT a.doc_id, a.kpos,
           {nxt_cols}
        FROM (SELECT doc_id, kpos FROM kept WHERE tok IN ({tl})) a
      )
      WHERE {notnull}
    ) s
    JOIN (
      SELECT doc_id, min(span) AS ms FROM (
        SELECT doc_id, greatest({greatest}) - kpos + 1 AS span
        FROM (
          SELECT a.doc_id, a.kpos,
             {nxt_cols}
          FROM (SELECT doc_id, kpos FROM kept WHERE tok IN ({tl})) a
        )
        WHERE {notnull}
      ) GROUP BY doc_id
    ) b ON b.doc_id = s.doc_id AND s.span = b.ms
    GROUP BY s.doc_id, b.ms
  )
  QUALIFY rank <= {SNIPPET_TOPK}
) t
""",)
    union = "\nUNION ALL\n".join(parts)
    return {
        "snippets": f"""
WITH {KEPT_CTE}
{union}
""",
    }


def bloom_oracles() -> dict[str, str]:
    from candidategeneration_ray.pipelines.sketches import (
        BLOOM_K, BLOOM_M, BLOOM_PROBES)

    def _bit(expr: str, i: int) -> str:
        h = _H64.format(expr=f"'b{i}:' || {expr}")
        return f"CAST({h} % {BLOOM_M} AS BIGINT)"

    bit_union = "\nUNION\n".join(
        f"SELECT {_bit('tok', i)} AS bit FROM toks" for i in range(BLOOM_K))
    probes = ", ".join(f"('{t}')" for t in BLOOM_PROBES)
    member_pred = " AND ".join(
        f"{_bit('p.term', i)} IN (SELECT bit FROM bits)"
        for i in range(BLOOM_K))
    return {
        "bloom_bits": f"""
WITH {KEPT_CTE},
toks AS (SELECT DISTINCT tok FROM kept)
SELECT DISTINCT bit FROM ({bit_union})
""",
        "bloom_membership": f"""
WITH {KEPT_CTE},
toks AS (SELECT DISTINCT tok FROM kept),
bits AS (SELECT DISTINCT bit FROM ({bit_union})),
p(term) AS (VALUES {probes})
SELECT p.term,
       CAST(CASE WHEN {member_pred} THEN 1 ELSE 0 END AS BIGINT) AS in_filter
FROM p
""",
    }


def pct_rank_oracles() -> dict[str, str]:
    return {
        # rank() = 1 + #strictly-smaller (ties share the min)
        "source_pct_rank": """
SELECT CAST(doc_id AS BIGINT) AS doc_id, source,
       CAST(n_chars AS BIGINT) AS n_chars,
       CAST((rank() OVER (PARTITION BY source ORDER BY n_chars) - 1)
            * 1000000
            // count(*) OVER (PARTITION BY source) AS BIGINT)
         AS pct_millionths
FROM documents
""",
        "source_ntile": _source_ntile_sql(),
    }


def _source_ntile_sql() -> str:
    from candidategeneration_ray.pipelines.sketches import NTILE_K

    return f"""
SELECT CAST(doc_id AS BIGINT) AS doc_id, source,
       CAST(ntile({NTILE_K}) OVER (PARTITION BY source
                                   ORDER BY n_chars, doc_id) AS BIGINT)
         AS tile
FROM documents
"""


def keyed_hll_oracles() -> dict[str, str]:
    from candidategeneration_ray.pipelines.sketches import HLL_P

    two_rest = 1 << (64 - HLL_P)
    h64_tok = _H64.format(expr="tok")
    return {
        "hll_registers_by_source": f"""
WITH kept AS MATERIALIZED (
  SELECT d.source, t.tok FROM documents d, LATERAL (
    SELECT lower(unnest(regexp_extract_all(d.text, '[A-Za-z0-9.]+'))) AS tok
  ) t
  WHERE length(t.tok) > 1
    AND (regexp_full_match(t.tok, '[a-z]+') OR regexp_full_match(t.tok, '[0-9]+'))
    AND t.tok NOT IN ({_STOP_SQL})
),
toks AS (SELECT DISTINCT source, tok FROM kept),
h AS (SELECT source, {h64_tok} AS hv FROM toks),
rr AS (
  SELECT source,
         CAST(hv // CAST({two_rest} AS UBIGINT) AS BIGINT) AS register,
         CAST({64 - HLL_P + 1} - length(ltrim(bin(hv % CAST({two_rest} AS UBIGINT)), '0')) AS BIGINT) AS rho
  FROM h
)
SELECT source, register, CAST(max(rho) AS BIGINT) AS rho
FROM rr GROUP BY source, register
""",
    }


def cm_oracles() -> dict[str, str]:
    from candidategeneration_ray.pipelines.sketches import (
        CM_DEPTH, CM_PROBES, CM_WIDTH)

    def _cell(expr: str, d: int) -> str:
        h = _H64.format(expr=f"'c{d}:' || {expr}")
        return f"CAST({h} % {CM_WIDTH} AS BIGINT)"

    counter_union = "\nUNION ALL\n".join(
        f"SELECT CAST({d} AS BIGINT) AS depth, {_cell('tok', d)} AS cell, "
        f"cnt FROM tf"
        for d in range(CM_DEPTH))
    probes = ", ".join(f"('{t}')" for t in CM_PROBES)
    est = "least(" + ", ".join(
        f"coalesce((SELECT cnt FROM counters c WHERE c.depth = {d} "
        f"AND c.cell = {_cell('p.term', d)}), 0)"
        for d in range(CM_DEPTH)) + ")"
    return {
        "cmsketch_counters": f"""
WITH {KEPT_CTE},
tf AS (SELECT tok, CAST(count(*) AS BIGINT) AS cnt FROM kept GROUP BY tok)
SELECT depth, cell, CAST(sum(cnt) AS BIGINT) AS cnt
FROM ({counter_union}) GROUP BY depth, cell
""",
        "cmsketch_estimates": f"""
WITH {KEPT_CTE},
tf AS (SELECT tok, CAST(count(*) AS BIGINT) AS cnt FROM kept GROUP BY tok),
counters AS (
  SELECT depth, cell, CAST(sum(cnt) AS BIGINT) AS cnt
  FROM ({counter_union}) GROUP BY depth, cell
),
p(term) AS (VALUES {probes})
SELECT p.term,
       CAST({est} AS BIGINT) AS cm_estimate,
       CAST(coalesce((SELECT cnt FROM tf WHERE tf.tok = p.term), 0) AS BIGINT)
         AS true_count
FROM p
""",
    }


def ams_cs_oracles() -> dict[str, str]:
    """AMS F2 rows as a per-row signed sum over the exact tf table;
    Count-Sketch counters/estimates mirror the CM oracles with ±1 signs
    and a 3-way integer median (sum − greatest − least)."""
    from candidategeneration_ray.pipelines.sketches import (
        AMS_ROWS, CS_DEPTH, CS_PROBES, CS_WIDTH)

    def _sign(expr: str, salt: str) -> str:
        h = _H64.format(expr=f"'{salt}:' || {expr}")
        return f"CASE WHEN {h} % 2 = 0 THEN 1 ELSE -1 END"

    ams_union = "\nUNION ALL\n".join(
        f"SELECT CAST({r} AS BIGINT) AS row, "
        f"CAST(sum(cnt * {_sign('tok', f'a{r}')}) AS BIGINT) AS x FROM tf"
        for r in range(AMS_ROWS))

    def _cs_cell(expr: str, d: int) -> str:
        h = _H64.format(expr=f"'s{d}:' || {expr}")
        return f"CAST({h} % {CS_WIDTH} AS BIGINT)"

    cs_union = "\nUNION ALL\n".join(
        f"SELECT CAST({d} AS BIGINT) AS depth, {_cs_cell('tok', d)} AS cell, "
        f"cnt * {_sign('tok', f'g{d}')} AS cnt FROM tf"
        for d in range(CS_DEPTH))
    probes = ", ".join(f"('{t}')" for t in CS_PROBES)
    vals = [
        f"({_sign('p.term', f'g{d}')}) * coalesce((SELECT cnt FROM counters c "
        f"WHERE c.depth = {d} AND c.cell = {_cs_cell('p.term', d)}), 0)"
        for d in range(CS_DEPTH)]
    assert CS_DEPTH == 3  # 3-way integer median below
    med = (f"({' + '.join(vals)}) - greatest({', '.join(vals)})"
           f" - least({', '.join(vals)})")
    return {
        "ams_f2": f"""
WITH {KEPT_CTE},
tf AS (SELECT tok, CAST(count(*) AS BIGINT) AS cnt FROM kept GROUP BY tok)
SELECT row, x, CAST(x * x AS BIGINT) AS x2 FROM ({ams_union})
""",
        "ams_f2_estimate": f"""
WITH {KEPT_CTE},
tf AS (SELECT tok, CAST(count(*) AS BIGINT) AS cnt FROM kept GROUP BY tok),
xs AS ({ams_union}),
med AS (
  SELECT v AS f2_est FROM (
    SELECT x * x AS v, row_number() OVER (ORDER BY x * x) AS rn FROM xs
  ) WHERE rn = {(AMS_ROWS + 1) // 2}
)
SELECT CAST({AMS_ROWS} AS BIGINT) AS rows,
       CAST(med.f2_est AS BIGINT) AS f2_est,
       CAST((SELECT sum(cnt * cnt) FROM tf) AS BIGINT) AS f2_true
FROM med
""",
        "countsketch_counters": f"""
WITH {KEPT_CTE},
tf AS (SELECT tok, CAST(count(*) AS BIGINT) AS cnt FROM kept GROUP BY tok)
SELECT depth, cell, CAST(sum(cnt) AS BIGINT) AS cnt
FROM ({cs_union}) GROUP BY depth, cell
""",
        "countsketch_estimates": f"""
WITH {KEPT_CTE},
tf AS (SELECT tok, CAST(count(*) AS BIGINT) AS cnt FROM kept GROUP BY tok),
counters AS (
  SELECT depth, cell, CAST(sum(cnt) AS BIGINT) AS cnt
  FROM ({cs_union}) GROUP BY depth, cell
),
p(term) AS (VALUES {probes})
SELECT p.term,
       CAST({med} AS BIGINT) AS cs_estimate,
       CAST(coalesce((SELECT cnt FROM tf WHERE tf.tok = p.term), 0) AS BIGINT)
         AS true_count
FROM p
""",
    }


def perceptron_oracles() -> dict[str, str]:
    """Batch-perceptron trajectory unrolled as chained CTEs: each
    iteration joins the one-row previous-weights CTE with the feature
    table, sums y·x over the misclassified rows and counts them."""
    from candidategeneration_ray.pipelines.textlm import (
        PERCEPTRON_NF, PERCEPTRON_T)

    nf = PERCEPTRON_NF
    dot = " + ".join(f"i.w{j} * f.x{j}" for j in range(nf))
    mis = f"f.y * ({dot}) <= 0"
    it_ctes = [f"it0 AS (SELECT {', '.join(f'CAST(0 AS BIGINT) AS w{j}' for j in range(nf))})"]
    for k in range(1, PERCEPTRON_T + 1):
        # sum(BIGINT) is HUGEINT in DuckDB — cast each weight back to
        # BIGINT so the oracle's arrow schema matches the pipeline int64
        ws = ",\n         ".join(
            f"CAST(i.w{j} + coalesce(sum(CASE WHEN {mis} THEN f.y * f.x{j} "
            f"ELSE 0 END), 0) AS BIGINT) AS w{j}"
            for j in range(nf))
        it_ctes.append(f"""it{k} AS (
  SELECT CAST({k} AS BIGINT) AS it,
         {ws},
         coalesce(count(*) FILTER ({mis}), 0) AS n_err
  FROM it{k - 1} i CROSS JOIN feats f
  GROUP BY {', '.join(f'i.w{j}' for j in range(nf))}
)""")
    union = "\nUNION ALL\n".join(
        f"SELECT it, {', '.join(f'w{j}' for j in range(nf))}, "
        f"CAST(n_err AS BIGINT) AS n_err FROM it{k}"
        for k in range(1, PERCEPTRON_T + 1))
    return {
        "perceptron": f"""
WITH {_WORDS_CTE},
feats AS MATERIALIZED (
  SELECT CAST(1 AS BIGINT) AS x0,
         coalesce(w.n_words, 0) AS x1,
         coalesce(w.n_stop, 0) AS x2,
         CAST(len(regexp_extract_all(text, '[0-9]+')) AS BIGINT) AS x3,
         CAST(len(regexp_extract_all(text, '[^A-Za-z0-9\\s]')) AS BIGINT) AS x4,
         CASE WHEN d.lang = 'en' THEN 1 ELSE -1 END AS y
  FROM documents d LEFT JOIN wstats w USING (doc_id)
),
{",".join(it_ctes)}
{union}
""",
    }


def chi2_oracles() -> dict[str, str]:
    from candidategeneration_ray.pipelines.textlm import CHI2_TOP_K

    return {
        "chi2_terms": f"""
WITH {KEPT_CTE},
dt AS (SELECT DISTINCT k.doc_id, k.tok FROM kept k),
cls AS (SELECT CAST(count(*) FILTER (lang = 'en') AS BIGINT) AS n_en,
               CAST(count(*) AS BIGINT) AS n FROM documents),
cells AS (
  SELECT dt.tok,
         CAST(count(*) FILTER (d.lang = 'en') AS BIGINT) AS a,
         CAST(count(*) FILTER (d.lang <> 'en') AS BIGINT) AS b
  FROM dt JOIN documents d USING (doc_id)
  GROUP BY dt.tok
),
x AS (
  SELECT tok, a, b,
         CAST(cls.n_en - a AS HUGEINT) AS c,
         CAST(cls.n - cls.n_en - b AS HUGEINT) AS d,
         CAST(cls.n AS HUGEINT) AS n
  FROM cells CROSS JOIN cls
)
SELECT tok AS term, a, b,
       CAST(CASE WHEN (a + b) * (c + d) * (a + c) * (b + d) = 0 THEN 0
            ELSE (n * (CAST(a AS HUGEINT) * d - CAST(b AS HUGEINT) * c)
                    * (CAST(a AS HUGEINT) * d - CAST(b AS HUGEINT) * c)
                  * 1000000)
                 // ((a + b) * (c + d) * (a + c) * (b + d)) END
            AS BIGINT) AS chi2_ppm
FROM x
ORDER BY chi2_ppm DESC, term ASC
LIMIT {CHI2_TOP_K}
""",
    }


def als_oracles() -> dict[str, str]:
    """Rank-1 ALS unrolled as chained CTEs — integer fixed-point
    half-rounds with floor-division quantization, the exact update
    rule of relational.q_als_rank1."""
    from candidategeneration_ray.pipelines.relational import (
        ALS_ROUNDS, ALS_SCALE)

    ctes = ["""r AS MATERIALIZED (
  SELECT l_suppkey AS s, l_partkey AS p,
         CAST(sum(CAST(floor(l_quantity * 100 + 0.5) AS BIGINT) // 100)
              AS BIGINT) AS r
  FROM lineitem GROUP BY 1, 2
)""", f"v0 AS (SELECT DISTINCT p, CAST({ALS_SCALE} AS BIGINT) AS v FROM r)"]
    for k in range(1, ALS_ROUNDS + 1):
        ctes.append(f"""u{k} AS (
  SELECT s, CAST(CASE WHEN sum(v.v * v.v) > 0
                 THEN ({ALS_SCALE} * sum(r.r * v.v)) // sum(v.v * v.v)
                 ELSE 0 END AS BIGINT) AS u
  FROM r JOIN v{k - 1} v USING (p) GROUP BY s
)""")
        ctes.append(f"""v{k} AS (
  SELECT p, CAST(CASE WHEN sum(u.u * u.u) > 0
                 THEN ({ALS_SCALE} * sum(r.r * u.u)) // sum(u.u * u.u)
                 ELSE 0 END AS BIGINT) AS v
  FROM r JOIN u{k} u USING (s) GROUP BY p
)""")
    return {
        "als_rank1": f"""
WITH {",".join(ctes)}
SELECT 'supplier' AS kind, CAST(s AS BIGINT) AS id, u AS factor
FROM u{ALS_ROUNDS}
UNION ALL
SELECT 'part', CAST(p AS BIGINT), v FROM v{ALS_ROUNDS}
""",
    }


def ks_oracles() -> dict[str, str]:
    return {
        "ks_source_test": """
WITH h AS MATERIALIZED (
  SELECT source, n_chars, CAST(count(*) AS BIGINT) AS c
  FROM documents GROUP BY 1, 2
),
tot AS (SELECT source, CAST(sum(c) AS BIGINT) AS n FROM h GROUP BY source),
vals AS (SELECT DISTINCT n_chars AS v FROM documents),
grid AS (SELECT t.source, v.v FROM tot t CROSS JOIN vals v),
cum AS (
  SELECT g.source, g.v, CAST(coalesce(sum(h.c), 0) AS BIGINT) AS cle
  FROM grid g LEFT JOIN h ON h.source = g.source AND h.n_chars <= g.v
  GROUP BY 1, 2
)
SELECT a.source AS src_a, b.source AS src_b,
       ta.n AS n_a, tb.n AS n_b,
       CAST(max(abs(a.cle * tb.n - b.cle * ta.n)) AS BIGINT) AS d_num,
       CAST(ta.n * tb.n AS BIGINT) AS d_den
FROM cum a JOIN cum b ON a.v = b.v AND a.source < b.source
JOIN tot ta ON ta.source = a.source
JOIN tot tb ON tb.source = b.source
GROUP BY 1, 2, 3, 4, 6
""",
    }


def ridge_oracles() -> dict[str, str]:
    """3x3 Cramer ridge solve in HUGEINT, toward-zero // quotients
    (DuckDB's native integer-division semantics, mirrored in Python)."""
    from candidategeneration_ray.pipelines.extras import RIDGE_LAMBDA as lam

    def det3(mm) -> str:
        def _m(i, j):
            return mm[i][j]
        return (f"({_m(0,0)}) * (({_m(1,1)}) * ({_m(2,2)}) - ({_m(1,2)}) * ({_m(2,1)}))"
                f" - ({_m(0,1)}) * (({_m(1,0)}) * ({_m(2,2)}) - ({_m(1,2)}) * ({_m(2,0)}))"
                f" + ({_m(0,2)}) * (({_m(1,0)}) * ({_m(2,1)}) - ({_m(1,1)}) * ({_m(2,0)}))")

    A = [[f"a00", "a01", "a02"], ["a01", "a11", "a12"], ["a02", "a12", "a22"]]
    bcol = ["b0", "b1", "b2"]
    dets = [det3(A)]
    for j in range(3):
        aj = [row[:] for row in A]
        for i in range(3):
            aj[i][j] = bcol[i]
        dets.append(det3(aj))
    beta_sel = ",\n       ".join(
        f"CAST(CASE WHEN ({dets[0]}) = 0 THEN 0 "
        f"ELSE (1000000 * ({dets[j + 1]})) // ({dets[0]}) END AS BIGINT) "
        f"AS beta{j}_ppm"
        for j in range(3))
    return {
        "ridge_regression": f"""
WITH {_WORDS_CTE},
feats AS MATERIALIZED (
  SELECT CAST(coalesce(w.n_words, 0) AS HUGEINT) AS x1,
         CAST(len(regexp_extract_all(text, '[^A-Za-z0-9\\s]')) AS HUGEINT) AS x2,
         CAST(length(text) AS HUGEINT) AS y
  FROM documents d LEFT JOIN wstats w USING (doc_id)
),
m AS (
  SELECT CAST(count(*) AS HUGEINT) + {lam} AS a00,
         sum(x1) AS a01, sum(x2) AS a02,
         sum(x1 * x1) + {lam} AS a11, sum(x1 * x2) AS a12,
         sum(x2 * x2) + {lam} AS a22,
         sum(y) AS b0, sum(x1 * y) AS b1, sum(x2 * y) AS b2,
         CAST(count(*) AS BIGINT) AS n
  FROM feats
)
SELECT n, CAST({lam} AS BIGINT) AS lam,
       {beta_sel}
FROM m
""",
    }


def session_hist_oracles() -> dict[str, str]:
    # composition oracle: the sessionize rule text + one aggregation
    return {
        "session_length_hist": """
WITH ordered AS (
  SELECT user_id, event_id, ts, CAST(round(value * 100) AS BIGINT) AS cents,
         lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
  FROM events
),
flagged AS (
  SELECT *, CASE WHEN prev_ts IS NULL
                   OR epoch_us(ts) - epoch_us(prev_ts) > 1800000000
                 THEN 1 ELSE 0 END AS new_s
  FROM ordered
),
sess AS (
  SELECT *, CAST(sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                  ROWS UNBOUNDED PRECEDING) - 1 AS BIGINT) AS session_idx
  FROM flagged
),
per_session AS (
  SELECT user_id, session_idx,
         CAST(count(*) AS BIGINT) AS n_events,
         CAST(sum(cents) AS BIGINT) AS cents
  FROM sess GROUP BY user_id, session_idx
)
SELECT n_events, CAST(count(*) AS BIGINT) AS n_sessions,
       CAST(sum(cents) AS BIGINT) AS cents
FROM per_session GROUP BY n_events
""",
    }


def last_touch_oracles() -> dict[str, str]:
    return {
        "last_touch": """
SELECT CAST(user_id AS BIGINT) AS user_id,
       CAST(epoch_us(ts) AS BIGINT) AS ts_us,
       CAST(event_id AS BIGINT) AS event_id,
       event_type
FROM (
  SELECT *, row_number() OVER (
    PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
  FROM events
) WHERE rn = 1
""",
        # dup = previous same-(user, type) event within 60 s; ordering
        # ties broken by event_id (same as the engine lexsort)
        "event_dedup_counts": """
WITH g AS (
  SELECT event_type,
         epoch_us(ts) - lag(epoch_us(ts)) OVER (
           PARTITION BY user_id, event_type ORDER BY ts, event_id) AS gap
  FROM events
)
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(count(*) FILTER (WHERE gap IS NOT NULL AND gap <= 60000000)
            AS BIGINT) AS n_dups
FROM g GROUP BY event_type
""",
    }


def rrf_oracles() -> dict[str, str]:
    from candidategeneration_ray.functions.tokenize import tokenize_text
    from candidategeneration_ray.pipelines.positional import (
        PROX_QUERIES, PROX_W, RRF_C, RRF_TOPK)

    parts = []
    for qid, text in PROX_QUERIES:
        toks = sorted(set(tokenize_text(text)))
        if not toks:
            continue
        tl = ", ".join(f"'{t}'" for t in toks)
        nxt_cols = ",\n         ".join(
            f"(SELECT min(k.kpos) FROM kept k WHERE k.doc_id = a.doc_id "
            f"AND k.tok = '{t}' AND k.kpos >= a.kpos) AS n{i}"
            for i, t in enumerate(toks))
        notnull = " AND ".join(f"n{i} IS NOT NULL" for i in range(len(toks)))
        greatest = ", ".join(f"n{i}" for i in range(len(toks)))
        prox_ex = "\n    AND ".join(
            f"EXISTS (SELECT 1 FROM kept k WHERE k.doc_id = a.doc_id "
            f"AND k.tok = '{t}' AND k.kpos >= a.kpos "
            f"AND k.kpos < a.kpos + {PROX_W})"
            for t in toks)
        parts.append(f"""
SELECT CAST({qid} AS BIGINT) AS query_id,
       CAST(row_number() OVER (ORDER BY rrf DESC, doc_id) AS BIGINT) AS rank,
       CAST(doc_id AS BIGINT) AS doc_id,
       CAST(rrf AS BIGINT) AS rrf_micro
FROM (
  SELECT coalesce(r1.doc_id, r2.doc_id) AS doc_id,
         coalesce(1000000 // ({RRF_C} + r1.r), 0)
         + coalesce(1000000 // ({RRF_C} + r2.r), 0) AS rrf
  FROM (
    SELECT doc_id, row_number() OVER (ORDER BY ms, doc_id) AS r
    FROM (
      SELECT doc_id, min(greatest({greatest}) - kpos + 1) AS ms
      FROM (
        SELECT a.doc_id, a.kpos,
         {nxt_cols}
        FROM (SELECT doc_id, kpos FROM kept WHERE tok IN ({tl})) a
      )
      WHERE {notnull}
      GROUP BY doc_id
    )
  ) r1
  FULL JOIN (
    SELECT doc_id, row_number() OVER (ORDER BY n_anchors DESC, doc_id) AS r
    FROM (
      SELECT a.doc_id, CAST(count(*) AS BIGINT) AS n_anchors
      FROM (SELECT doc_id, kpos FROM kept WHERE tok IN ({tl})) a
      WHERE {prox_ex}
      GROUP BY a.doc_id
    )
  ) r2 USING (doc_id)
)
QUALIFY rank <= {RRF_TOPK}""")
    union = "\nUNION ALL\n".join(parts)
    return {
        "rrf_fusion": f"""
WITH {KEPT_CTE}
{union}
""",
    }


def lexicon_oracles() -> dict[str, str]:
    from candidategeneration_ray.pipelines.lexicon import (
        FACET_TERMS, FUZZY_QUERIES, OR_MIN_MATCH, PREFIXES,
    )

    pre_vals = ", ".join(f"('{p}')" for p in PREFIXES)
    fq_vals = ", ".join(f"('{w}')" for w in FUZZY_QUERIES)
    ft_vals = ", ".join(f"('{t}')" for t in FACET_TERMS)
    dft = ("dft AS (SELECT tok AS term, CAST(count(DISTINCT doc_id) AS BIGINT)"
           " AS df FROM kept GROUP BY tok)")
    return {
        "prefix_terms": f"""
WITH {KEPT_CTE},
{dft},
pre(prefix) AS (VALUES {pre_vals})
SELECT prefix, term, df FROM dft JOIN pre ON starts_with(term, prefix)
""",
        "fuzzy_terms": f"""
WITH {KEPT_CTE},
{dft},
qw(qword) AS (VALUES {fq_vals})
SELECT qword, term, df, CAST(levenshtein(qword, term) AS BIGINT) AS dist
FROM dft CROSS JOIN qw
WHERE levenshtein(qword, term) <= 1
""",
        "bool_or_docs": f"""
WITH {KEPT_CTE},
{QTOK_CTE},
dt AS (SELECT DISTINCT doc_id, tok FROM kept)
SELECT CAST(q.query_id AS BIGINT) AS query_id,
       CAST(d.doc_id AS BIGINT) AS doc_id,
       CAST(count(*) AS BIGINT) AS n_matched
FROM qtok q JOIN dt d USING (tok)
GROUP BY q.query_id, d.doc_id
HAVING count(*) >= {OR_MIN_MATCH}
""",
        "facet_counts": f"""
WITH {KEPT_CTE},
ft(term) AS (VALUES {ft_vals})
SELECT ft.term, d.source, d.lang,
       CAST(count(DISTINCT k.doc_id) AS BIGINT) AS n_docs
FROM ft JOIN kept k ON k.tok = ft.term
JOIN documents d ON d.doc_id = k.doc_id
GROUP BY ft.term, d.source, d.lang
""",
        "bitmap_index": _bitmap_index_sql(),
        "bitmap_query_counts": _bitmap_counts_sql(),
    }


def _bitmap_index_sql() -> str:
    """Word-for-word bitmap state: 32-bit words keep every shift in
    positive BIGINT range; doc ids are unique so sum == bit OR."""
    from candidategeneration_ray.pipelines.lexicon import (
        BITMAP_COLS, BITMAP_WORD_BITS)

    parts = [f"""
SELECT '{col}' AS col, {col} AS value,
       CAST(doc_id // {BITMAP_WORD_BITS} AS BIGINT) AS word_idx,
       CAST(sum(CAST(1 AS BIGINT)
                << CAST(doc_id % {BITMAP_WORD_BITS} AS INTEGER))
            AS BIGINT) AS word_bits
FROM documents GROUP BY 2, 3""" for col in BITMAP_COLS]
    return "\nUNION ALL\n".join(parts)


def _bitmap_counts_sql() -> str:
    """Row-scan recount of the fixed bitmap predicate set — the engine
    serves the same counts from the persisted word index."""
    from candidategeneration_ray.pipelines.lexicon import BITMAP_QUERIES

    ops = {"and": "{l} AND {r}", "or": "{l} OR {r}",
           "andnot": "{l} AND NOT ({r})"}
    parts = []
    for name, kind, (lc, lv), (rc, rv) in BITMAP_QUERIES:
        cond = ops[kind].format(l=f"{lc} = '{lv}'", r=f"{rc} = '{rv}'")
        parts.append(f"""
SELECT '{name}' AS query, CAST(count(*) AS BIGINT) AS n_docs
FROM documents WHERE {cond}""")
    return "\nUNION ALL\n".join(parts)


def rolling_oracles() -> dict[str, str]:
    return {
        "rolling_spend": """
WITH p AS (
  SELECT event_id, user_id, ts,
         CAST(round(value * 100) AS BIGINT) AS cents
  FROM events WHERE event_type = 'purchase'
)
SELECT CAST(event_id AS BIGINT) AS event_id,
       CAST(count(*) OVER w AS BIGINT) AS n_window,
       CAST(sum(cents) OVER w AS BIGINT) AS cents_window
FROM p
WINDOW w AS (PARTITION BY user_id ORDER BY ts
             RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
""",
        "ewma_spend": _ewma_sql(),
    }


def _ewma_sql() -> str:
    """The engine's integer decay recurrence as a recursive CTE —
    floor division on both sides makes every step bit-exact."""
    from candidategeneration_ray.pipelines.events import EWMA_DEN, EWMA_NUM

    return f"""
WITH RECURSIVE p AS (
  SELECT user_id, event_id,
         CAST(round(value * 100) AS BIGINT) AS cents,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY ts, event_id) AS rn
  FROM events WHERE event_type = 'purchase'),
r AS (
  SELECT user_id, event_id, rn, cents AS s FROM p WHERE rn = 1
  UNION ALL
  SELECT p.user_id, p.event_id, p.rn,
         ({EWMA_NUM} * r.s) // {EWMA_DEN} + p.cents AS s
  FROM r JOIN p ON p.user_id = r.user_id AND p.rn = r.rn + 1)
SELECT CAST(event_id AS BIGINT) AS event_id,
       CAST(user_id AS BIGINT) AS user_id,
       CAST(s AS BIGINT) AS ewma_cents
FROM r
"""


def regex_oracles() -> dict[str, str]:
    from candidategeneration_ray.pipelines.extras import REGEX_PATTERNS

    parts = []
    for name, pat in REGEX_PATTERNS:
        esc = pat.replace("\\", "\\\\").replace("'", "''")
        parts.append(f"""
SELECT '{name}' AS pattern, source,
       CAST(count(*) AS BIGINT) AS n_docs
FROM documents WHERE regexp_matches(text, '{esc}')
GROUP BY source""")
    union = "\nUNION ALL\n".join(parts)
    return {"regex_counts": union}


def containment_oracles() -> dict[str, str]:
    return {
        "containment_pairs": f"""
WITH {KEPT_CTE},
{_DOCS_TOKS},
{_shingle_cte(H.SHINGLE_W)},
sizes AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n FROM sh GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, CAST(count(*) AS BIGINT) AS inter_n
  FROM sh a JOIN sh b ON a.h = b.h AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
)
SELECT doc_a, doc_b, inter_n, least(sa.n, sb.n) AS small_n
FROM inter
JOIN sizes sa ON sa.doc_id = doc_a
JOIN sizes sb ON sb.doc_id = doc_b
WHERE inter_n * 100 >= 80 * least(sa.n, sb.n)
""",
    }


def postings_bytes_oracles() -> dict[str, str]:
    # analytic codec model: gap[0] = doc_id (absolute), LEB128 size =
    # 1 byte per 7 bits; scores are raw little-endian int32
    size_case = ("CASE WHEN gap < 128 THEN 1 WHEN gap < 16384 THEN 2 "
                 "WHEN gap < 2097152 THEN 3 WHEN gap < 268435456 THEN 4 "
                 "ELSE 5 END")
    return {
        "postings_bytes": f"""
WITH {KEPT_CTE},
dt AS (SELECT DISTINCT doc_id, tok FROM kept),
g AS (
  SELECT tok,
         doc_id - coalesce(lag(doc_id) OVER (PARTITION BY tok
                                             ORDER BY doc_id), 0) AS gap
  FROM dt
)
SELECT tok AS term,
       CAST(count(*) AS BIGINT) AS n,
       CAST(sum({size_case}) AS BIGINT) AS docs_bytes,
       CAST(4 * count(*) AS BIGINT) AS scores_bytes
FROM g GROUP BY tok
""",
    }


def postings_bytes_bp_oracles() -> dict[str, str]:
    """Analytic model of the binary-packing codec (functions/bitpack):
    gaps in 128-wide blocks, one width byte per block (width =
    length(bin(max_gap)), 0 for all-zero blocks), each block byte-
    bounded at its OWN count — (cnt·w + 7)//8 payload bytes, so a
    short last block never pays full-block padding. The varint
    accounting (size_case) rides along so the entry IS the codec
    comparison."""
    size_case = ("CASE WHEN gap < 128 THEN 1 WHEN gap < 16384 THEN 2 "
                 "WHEN gap < 2097152 THEN 3 WHEN gap < 268435456 THEN 4 "
                 "ELSE 5 END")
    return {
        "postings_bytes_bp": f"""
WITH {KEPT_CTE},
dt AS (SELECT DISTINCT doc_id, tok FROM kept),
g AS (
  SELECT tok,
         row_number() OVER (PARTITION BY tok ORDER BY doc_id) AS rn,
         doc_id - coalesce(lag(doc_id) OVER (PARTITION BY tok
                                             ORDER BY doc_id), 0) AS gap
  FROM dt
),
vb AS (
  SELECT tok, CAST(count(*) AS BIGINT) AS n,
         CAST(sum({size_case}) AS BIGINT) AS docs_bytes
  FROM g GROUP BY tok
),
blk AS (
  SELECT tok, (rn - 1) // 128 AS b, max(gap) AS mg,
         CAST(count(*) AS BIGINT) AS cnt
  FROM g GROUP BY tok, (rn - 1) // 128
),
bp AS (
  SELECT tok,
         CAST(count(*)
              + sum((cnt * (CASE WHEN mg = 0 THEN 0
                            ELSE length(bin(mg)) END) + 7) // 8)
           AS BIGINT) AS docs_bytes_bp
  FROM blk GROUP BY tok
)
SELECT vb.tok AS term, vb.n, vb.docs_bytes, bp.docs_bytes_bp
FROM vb JOIN bp USING (tok)
""",
        # Elias-Fano analytic model: per list n = count, u = max doc_id,
        # l = floor(log2(u/n)) (0 when u < n), size = 1 header byte +
        # (n*l+7)//8 low-section bytes + ((u>>l)+n+7)//8 high-bitvector
        # bytes — exactly functions/eliasfano.ef_size.
        "postings_bytes_ef": f"""
WITH {KEPT_CTE},
dt AS (SELECT DISTINCT doc_id, tok FROM kept),
g AS (
  SELECT tok,
         doc_id - coalesce(lag(doc_id) OVER (PARTITION BY tok
                                             ORDER BY doc_id), 0) AS gap
  FROM dt
),
vb AS (
  SELECT tok, CAST(count(*) AS BIGINT) AS n,
         CAST(sum({size_case}) AS BIGINT) AS docs_bytes
  FROM g GROUP BY tok
),
lu AS (
  SELECT tok, CAST(count(*) AS BIGINT) AS n, CAST(max(doc_id) AS BIGINT) AS u
  FROM dt GROUP BY tok
),
ef AS (
  SELECT tok, n, u,
         CASE WHEN u // n >= 1 THEN length(bin(u // n)) - 1
              ELSE 0 END AS l
  FROM lu
)
SELECT vb.tok AS term, vb.n, vb.docs_bytes,
       CAST(1 + (ef.n * ef.l + 7) // 8
              + ((ef.u >> ef.l) + ef.n + 7) // 8 AS BIGINT) AS docs_bytes_ef
FROM vb JOIN ef USING (tok)
""",
        # Golomb-Rice analytic model: k = floor(log2(u/n)) as in EF,
        # unary stream = Σ(gap>>k) + n bits, remainders n·k bits, plus
        # the 5-byte header (k + unary byte length) — exactly
        # functions/rice.rice_size over the same delta-from-0 gaps.
        "postings_bytes_rice": f"""
WITH {KEPT_CTE},
dt AS (SELECT DISTINCT doc_id, tok FROM kept),
g AS (
  SELECT tok, doc_id,
         doc_id - coalesce(lag(doc_id) OVER (PARTITION BY tok
                                             ORDER BY doc_id), 0) AS gap
  FROM dt
),
vb AS (
  SELECT tok, CAST(count(*) AS BIGINT) AS n,
         CAST(sum({size_case}) AS BIGINT) AS docs_bytes
  FROM g GROUP BY tok
),
kk AS (
  SELECT tok,
         CASE WHEN max(doc_id) // count(*) >= 1
              THEN length(bin(max(doc_id) // count(*))) - 1
              ELSE 0 END AS k
  FROM dt GROUP BY tok
),
rz AS (
  SELECT g.tok,
         CAST(sum(g.gap >> kk.k) AS BIGINT) AS sum_q,
         CAST(count(*) AS BIGINT) AS n,
         CAST(max(kk.k) AS BIGINT) AS k
  FROM g JOIN kk USING (tok) GROUP BY g.tok
)
SELECT vb.tok AS term, vb.n, vb.docs_bytes,
       CAST(5 + (rz.sum_q + rz.n + 7) // 8
              + (rz.n * rz.k + 7) // 8 AS BIGINT) AS docs_bytes_rice
FROM vb JOIN rz USING (tok)
""",
        # Binary interpolative model: REPLAY the range-split recursion
        # (Moffat & Stuiver 2000, fixed-width variant) — a node over
        # positions [s,e) within value bounds [lo,hi] codes the middle
        # value in bit_length(hi' - lo') bits (lo' = lo + mid - s,
        # hi' = hi - (e-1-mid)), children tighten the bounds around the
        # decoded midpoint. The bit total is traversal-invariant, so
        # the CTE's breadth-first expansion matches the engine's
        # level-order layout bit for bit. Size = 8-byte u header +
        # ceil(total_bits / 8) — exactly functions/interpolative.
        "postings_bytes_bic": f"""
WITH RECURSIVE {KEPT_CTE},
dt AS (SELECT DISTINCT doc_id, tok FROM kept),
g AS (
  SELECT tok,
         doc_id - coalesce(lag(doc_id) OVER (PARTITION BY tok
                                             ORDER BY doc_id), 0) AS gap
  FROM dt
),
vb AS (
  SELECT tok, CAST(count(*) AS BIGINT) AS n,
         CAST(sum({size_case}) AS BIGINT) AS docs_bytes
  FROM g GROUP BY tok
),
dv AS MATERIALIZED (
  SELECT tok, CAST(doc_id AS BIGINT) AS val,
         row_number() OVER (PARTITION BY tok ORDER BY doc_id) - 1 AS idx
  FROM dt
),
lu AS (
  SELECT tok, CAST(count(*) AS BIGINT) AS n, CAST(max(val) AS BIGINT) AS u
  FROM dv GROUP BY tok
),
nodes AS (
  SELECT tok, CAST(0 AS BIGINT) AS s, n AS e, CAST(0 AS BIGINT) AS lo,
         u AS hi
  FROM lu
  UNION ALL
  SELECT n.tok,
         CASE WHEN c.i = 0 THEN n.s
              ELSE n.s + (n.e - n.s) // 2 + 1 END,
         CASE WHEN c.i = 0 THEN n.s + (n.e - n.s) // 2 ELSE n.e END,
         CASE WHEN c.i = 0 THEN n.lo ELSE dv.val + 1 END,
         CASE WHEN c.i = 0 THEN dv.val - 1 ELSE n.hi END
  FROM nodes n
  JOIN dv ON dv.tok = n.tok AND dv.idx = n.s + (n.e - n.s) // 2
  CROSS JOIN (VALUES (0), (1)) c(i)
  WHERE (c.i = 0 AND n.s + (n.e - n.s) // 2 > n.s)
     OR (c.i = 1 AND n.e > n.s + (n.e - n.s) // 2 + 1)
),
nb AS (
  SELECT tok,
         CAST(sum(CASE WHEN rm1 = 0 THEN 0
                       ELSE length(bin(rm1)) END) AS BIGINT) AS bits
  FROM (
    SELECT tok,
           (hi - (e - 1 - (s + (e - s) // 2)))
             - (lo + ((s + (e - s) // 2) - s)) AS rm1
    FROM nodes
  ) GROUP BY tok
)
SELECT vb.tok AS term, vb.n, vb.docs_bytes,
       CAST(8 + (nb.bits + 7) // 8 AS BIGINT) AS docs_bytes_bic
FROM vb JOIN nb USING (tok)
""",
    }


def index_report_oracles() -> dict[str, str]:
    """The capacity report recomputed from first principles: list
    lengths from the distinct (doc, tok) sets, varint bytes from the
    analytic gap model, lower median via ordered offset."""
    size_case = ("CASE WHEN gap < 128 THEN 1 WHEN gap < 16384 THEN 2 "
                 "WHEN gap < 2097152 THEN 3 WHEN gap < 268435456 THEN 4 "
                 "ELSE 5 END")
    return {
        "index_report": f"""
WITH {KEPT_CTE},
dt AS (SELECT DISTINCT doc_id, tok FROM kept),
g AS (
  SELECT tok,
         doc_id - coalesce(lag(doc_id) OVER (PARTITION BY tok
                                             ORDER BY doc_id), 0) AS gap
  FROM dt
),
lists AS (SELECT tok, CAST(count(*) AS BIGINT) AS n FROM dt GROUP BY tok),
med AS (
  SELECT n AS median_list_n FROM (
    SELECT n, row_number() OVER (ORDER BY n) AS rn FROM lists
  ) WHERE rn = (SELECT (count(*) + 1) // 2 FROM lists)
)
SELECT CAST((SELECT count(*) FROM lists) AS BIGINT) AS n_terms,
       CAST((SELECT sum(n) FROM lists) AS BIGINT) AS n_postings,
       CAST((SELECT sum({size_case}) FROM g) AS BIGINT) AS docs_bytes,
       CAST((SELECT max(n) FROM lists) AS BIGINT) AS max_list_n,
       CAST((SELECT median_list_n FROM med) AS BIGINT) AS median_list_n,
       CAST((SELECT count(*) FROM lists WHERE n = 1) AS BIGINT)
         AS singleton_terms
""",
    }


def redact_oracles() -> dict[str, str]:
    """Redaction replayed in DuckDB RE2: counts before each pass,
    regexp_replace(..., 'g') in the same pattern order, md5 of the
    final text."""
    from candidategeneration_ray.pipelines.extras import (
        REDACT_PATTERNS, REDACT_TOKEN)

    cnt = " + ".join(
        f"len(regexp_extract_all(t{i}, '{pat}'))"
        for i, (_, pat) in enumerate(REDACT_PATTERNS))
    ctes = ["r0 AS (SELECT doc_id, text AS t0 FROM documents)"]
    for i, (_, pat) in enumerate(REDACT_PATTERNS):
        ctes.append(
            f"r{i + 1} AS (SELECT doc_id, "
            f"regexp_replace(t{i}, '{pat}', '{REDACT_TOKEN}', 'g') "
            f"AS t{i + 1} FROM r{i})")
    n = len(REDACT_PATTERNS)
    # counts need each intermediate text: join the chain
    joins = " ".join(f"JOIN r{i} USING (doc_id)" for i in range(n))
    return {
        "redact_docs": f"""
WITH {','.join(ctes)}
SELECT r.doc_id,
       CAST({cnt} AS BIGINT) AS n_redactions,
       md5(t{n}) AS clean_md5
FROM r{n} r {joins}
""",
    }


def collapse_oracles() -> dict[str, str]:
    """Field collapsing: the bm25 qscores CTE joined to each doc's
    source; rn=1 per (query, source) keeps the best doc per source,
    a second window rank keeps the COLLAPSE_K best survivors."""
    from candidategeneration_ray.pipelines.docquery import COLLAPSE_K

    return {
        "collapse_topk": f"""
WITH {KEPT_CTE},
{SCORES_CTE},
{QTOK_CTE},
qscores AS MATERIALIZED (
  SELECT q.query_id, s.doc_id, CAST(sum(s.score) AS BIGINT) AS score
  FROM qtok q JOIN scores s USING (tok)
  GROUP BY q.query_id, s.doc_id
),
best AS (
  SELECT query_id, doc_id, score, source FROM (
    SELECT qs.query_id, qs.doc_id, qs.score, d.source,
           row_number() OVER (PARTITION BY qs.query_id, d.source
                              ORDER BY qs.score DESC, qs.doc_id ASC) AS rn
    FROM qscores qs JOIN documents d USING (doc_id)
  ) WHERE rn = 1
)
SELECT query_id, rank, doc_id, source, score FROM (
  SELECT query_id,
         CAST(row_number() OVER (PARTITION BY query_id
                                 ORDER BY score DESC, doc_id ASC) AS BIGINT) AS rank,
         doc_id, source, score
  FROM best
) WHERE rank <= {COLLAPSE_K}
""",
    }


def mmr_oracles() -> dict[str, str]:
    """MMR diversification: pool = bm25 top-MMR_POOL per query; sims =
    pairwise distinct-kept-term overlaps inside each pool; the greedy
    unrolls as MMR_K chained MATERIALIZED CTE steps (argmax of
    REL_W·score − PEN_W·SIM_SCALE·max_ov over the remaining pool)."""
    from candidategeneration_ray.pipelines.docquery import (
        MMR_K, MMR_PEN_W, MMR_POOL, MMR_REL_W, MMR_SIM_SCALE)

    steps = []
    for n in range(2, MMR_K + 1):
        prev = " UNION ALL ".join(
            f"SELECT query_id, doc_id FROM sel{i}" for i in range(1, n))
        steps.append(f"""
prev{n} AS ({prev}),
cand{n} AS MATERIALIZED (
  SELECT p.query_id, p.doc_id, p.score,
         CAST({MMR_REL_W} * p.score
              - {MMR_PEN_W} * {MMR_SIM_SCALE} * coalesce(max(s.ov), 0)
           AS BIGINT) AS mmr_value
  FROM pool p
  JOIN prev{n} v ON v.query_id = p.query_id
  LEFT JOIN sims s ON s.query_id = p.query_id
                  AND s.da = p.doc_id AND s.db = v.doc_id
  WHERE NOT EXISTS (SELECT 1 FROM prev{n} v2
                    WHERE v2.query_id = p.query_id
                      AND v2.doc_id = p.doc_id)
  GROUP BY p.query_id, p.doc_id, p.score
),
sel{n} AS MATERIALIZED (
  SELECT query_id, doc_id, score, mmr_value FROM (
    SELECT cand{n}.*,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY mmr_value DESC, doc_id ASC) AS rn
    FROM cand{n}
  ) WHERE rn = 1
)""")
        final = " UNION ALL ".join(
            f"SELECT query_id, CAST({i} AS BIGINT) AS rank, doc_id, score, "
            f"mmr_value FROM sel{i}" for i in range(1, MMR_K + 1))

    return {
        "mmr_topk": f"""
WITH {KEPT_CTE},
{SCORES_CTE},
{QTOK_CTE},
qscores AS MATERIALIZED (
  SELECT q.query_id, s.doc_id, CAST(sum(s.score) AS BIGINT) AS score
  FROM qtok q JOIN scores s USING (tok)
  GROUP BY q.query_id, s.doc_id
),
pool AS MATERIALIZED (
  SELECT query_id, doc_id, score FROM (
    SELECT query_id, doc_id, score,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY score DESC, doc_id ASC) AS rn
    FROM qscores
  ) WHERE rn <= {MMR_POOL}
),
kd AS MATERIALIZED (
  SELECT DISTINCT doc_id, tok FROM kept
  WHERE doc_id IN (SELECT doc_id FROM pool)
),
sims AS MATERIALIZED (
  SELECT pa.query_id, pa.doc_id AS da, pb.doc_id AS db,
         CAST(count(*) AS BIGINT) AS ov
  FROM pool pa
  JOIN pool pb ON pb.query_id = pa.query_id AND pb.doc_id <> pa.doc_id
  JOIN kd a ON a.doc_id = pa.doc_id
  JOIN kd b ON b.doc_id = pb.doc_id AND b.tok = a.tok
  GROUP BY pa.query_id, pa.doc_id, pb.doc_id
),
sel1 AS MATERIALIZED (
  SELECT query_id, doc_id, score,
         CAST({MMR_REL_W} * score AS BIGINT) AS mmr_value FROM (
    SELECT pool.*,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY score DESC, doc_id ASC) AS rn
    FROM pool
  ) WHERE rn = 1
),
{','.join(steps)}
SELECT query_id, rank, doc_id, score, mmr_value FROM ({final})
""",
    }


def impact_oracles() -> dict[str, str]:
    """Quantized-impact top-k: global uniform bins over the scores CTE
    (all-integer, numerators non-negative so // matches the numpy
    floor-div), summed per (query, doc), window-ranked."""
    from candidategeneration_ray.pipelines.impact import IMPACT_Q, IMPACT_TOPK

    return {
        "impact_topk": f"""
WITH {KEPT_CTE},
{SCORES_CTE},
{QTOK_CTE},
mm AS (SELECT min(score) AS mn, max(score) AS mx FROM scores),
imp AS (
  SELECT s.doc_id, s.tok,
         CAST(1 + ((s.score - mm.mn) * {IMPACT_Q}) // (mm.mx - mm.mn + 1)
           AS BIGINT) AS impact
  FROM scores s, mm
),
qimp AS MATERIALIZED (
  SELECT q.query_id, i.doc_id, CAST(sum(i.impact) AS BIGINT) AS impact_sum
  FROM qtok q JOIN imp i USING (tok)
  GROUP BY q.query_id, i.doc_id
)
SELECT query_id, rank, doc_id, impact_sum FROM (
  SELECT query_id,
         CAST(row_number() OVER (PARTITION BY query_id
                                 ORDER BY impact_sum DESC, doc_id ASC)
           AS BIGINT) AS rank,
         doc_id, impact_sum
  FROM qimp
) WHERE rank <= {IMPACT_TOPK}
""",
    }


def ltr_oracles() -> dict[str, str]:
    """LTR feature export: pool = bm25 top-LTR_POOL; features re-derived
    from the shared tf/dl/dft/scores CTEs plus the documents prior."""
    from candidategeneration_ray.pipelines.docquery import LTR_POOL

    return {
        "ltr_features": f"""
WITH {KEPT_CTE},
{SCORES_CTE},
{QTOK_CTE},
qscores AS MATERIALIZED (
  SELECT q.query_id, s.doc_id, CAST(sum(s.score) AS BIGINT) AS score
  FROM qtok q JOIN scores s USING (tok)
  GROUP BY q.query_id, s.doc_id
),
pool AS MATERIALIZED (
  SELECT query_id, rank, doc_id, score FROM (
    SELECT query_id, doc_id, score,
           CAST(row_number() OVER (PARTITION BY query_id
                                   ORDER BY score DESC, doc_id ASC)
             AS BIGINT) AS rank
    FROM qscores
  ) WHERE rank <= {LTR_POOL}
),
feat AS (
  SELECT p.query_id, p.rank, p.doc_id, p.score AS bm25,
         CAST(count(*) AS BIGINT) AS n_matched,
         CAST(sum(t.tf) AS BIGINT) AS sum_tf,
         CAST(max(s.score) AS BIGINT) AS max_ts,
         CAST(min(s.score) AS BIGINT) AS min_ts,
         CAST(min(d2.df) AS BIGINT) AS min_df
  FROM pool p
  JOIN qtok q ON q.query_id = p.query_id
  JOIN tf t ON t.doc_id = p.doc_id AND t.tok = q.tok
  JOIN scores s ON s.doc_id = p.doc_id AND s.tok = q.tok
  JOIN dft d2 ON d2.tok = q.tok
  GROUP BY p.query_id, p.rank, p.doc_id, p.score
)
SELECT f.query_id, f.rank, f.doc_id, f.bm25, f.n_matched, f.sum_tf,
       f.max_ts, f.min_ts, CAST(dl.dl AS BIGINT) AS dl, f.min_df,
       d.n_chars
FROM feat f
JOIN dl ON dl.doc_id = f.doc_id
JOIN documents d ON d.doc_id = f.doc_id
""",
    }


def ndcg_oracles() -> dict[str, str]:
    """Graded nDCG@10 composition oracle: candidate + relevance oracle
    SQL verbatim as derived tables, the shared integer discount LUT as
    VALUES (gain = 11 − exact rank; ideal ranking IS the relevance
    ranking, so IDCG sums gains in rank order)."""
    from candidategeneration_ray.pipelines.docquery import ndcg_discounts

    bm25 = core_oracles()["bm25_topk"]
    cand = predictive_oracles()["predictive_candidates"]
    disc_rows = ", ".join(f"({r + 1}, {w})"
                          for r, w in enumerate(ndcg_discounts(10)))
    return {
        "ndcg_eval": f"""
WITH cand AS ({cand}),
rel AS ({bm25}),
disc(r, w) AS (VALUES {disc_rows}),
dcg AS (
  SELECT c.query_id,
         CAST(sum(coalesce(11 - r.rank, 0) * d.w) AS BIGINT) AS dcg_scaled
  FROM cand c
  JOIN disc d ON d.r = c.rank
  LEFT JOIN rel r ON r.query_id = c.query_id AND r.doc_id = c.doc_id
  WHERE c.rank <= 10
  GROUP BY c.query_id
),
idcg AS (
  SELECT r.query_id,
         CAST(sum((11 - r.rank) * d.w) AS BIGINT) AS idcg_scaled
  FROM rel r JOIN disc d ON d.r = r.rank
  GROUP BY r.query_id
)
SELECT CAST(i.query_id AS BIGINT) AS query_id,
       CAST(coalesce(d.dcg_scaled, 0) AS BIGINT) AS dcg_scaled,
       i.idcg_scaled
FROM idcg i LEFT JOIN dcg d USING (query_id)
""",
    }


def related_terms_oracles() -> dict[str, str]:
    from candidategeneration_ray.pipelines.docquery import RELATED_SEEDS

    seed_vals = ", ".join(f"('{s}')" for s in RELATED_SEEDS)
    return {
        "related_terms": f"""
WITH {KEPT_CTE},
pairs AS (
  SELECT DISTINCT a.doc_id,
         least(a.tok, b.tok) AS t1, greatest(a.tok, b.tok) AS t2
  FROM kept a JOIN kept b
    ON a.doc_id = b.doc_id AND b.kpos > a.kpos AND b.kpos <= a.kpos + 5
),
counts AS (SELECT t1, t2, CAST(count(*) AS BIGINT) AS n_docs
           FROM pairs GROUP BY t1, t2),
seeds(seed) AS (VALUES {seed_vals}),
rel AS (
  SELECT seed, CASE WHEN t1 = seed THEN t2 ELSE t1 END AS other, n_docs
  FROM counts JOIN seeds ON t1 = seed OR t2 = seed
)
SELECT seed, other, n_docs FROM rel
QUALIFY row_number() OVER (PARTITION BY seed
                           ORDER BY n_docs DESC, other ASC) <= 5
""",
    }


def campaign_oracles() -> dict[str, str]:
    from candidategeneration_ray.pipelines.events import CAMPAIGNS

    cvals = ", ".join(
        f"({cid}, TIMESTAMP '{a}', TIMESTAMP '{b}')" for cid, a, b in CAMPAIGNS)
    return {
        "campaign_overlap": f"""
WITH ordered AS (
  SELECT user_id, ts, CAST(round(value * 100) AS BIGINT) AS cents,
         lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
  FROM events
),
flagged AS (
  SELECT *, CASE WHEN prev_ts IS NULL
                   OR epoch_us(ts) - epoch_us(prev_ts) > 1800000000
                 THEN 1 ELSE 0 END AS new_s
  FROM ordered
),
sess AS (
  SELECT *, sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
                             ROWS UNBOUNDED PRECEDING) AS sidx
  FROM flagged
),
spans AS (
  SELECT user_id, sidx, min(ts) AS smin, max(ts) AS smax,
         CAST(sum(cents) AS BIGINT) AS cents
  FROM sess GROUP BY user_id, sidx
),
camp(campaign_id, c0, c1) AS (VALUES {cvals})
SELECT CAST(campaign_id AS BIGINT) AS campaign_id,
       CAST(count(*) AS BIGINT) AS n_sessions,
       CAST(sum(cents) AS BIGINT) AS cents
FROM spans JOIN camp ON smin <= c1 AND smax >= c0
GROUP BY campaign_id
""",
    }


def priority_join_oracles() -> dict[str, str]:
    """Q4/Q13/Q18-shaped relational oracles (pipelines/relational.py):
    exists semi-join, left-outer zero-fill distribution, HAVING-driven
    join."""
    from candidategeneration_ray.pipelines.relational import (
        Q4_DATE_HI, Q4_DATE_LO, Q4_LATE_DAYS, Q13_EXCLUDE_PRIORITY,
        Q18_MIN_QTY_C)

    return {
        "order_priority_counts": f"""
SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n_orders
FROM orders
WHERE o_orderdate >= TIMESTAMP '{Q4_DATE_LO}'
  AND o_orderdate < TIMESTAMP '{Q4_DATE_HI}'
  AND EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey
                AND l_shipdate > o_orderdate + INTERVAL {Q4_LATE_DAYS} DAY)
GROUP BY o_orderpriority
""",
        "customer_order_distribution": f"""
SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
FROM (
  SELECT c_custkey, CAST(count(o_orderkey) AS BIGINT) AS c_count
  FROM customer LEFT JOIN orders
    ON c_custkey = o_custkey
   AND o_orderpriority <> '{Q13_EXCLUDE_PRIORITY}'
  GROUP BY c_custkey) t
GROUP BY c_count
""",
        "large_volume_customers": f"""
SELECT c_name, CAST(c_custkey AS BIGINT) AS c_custkey,
       CAST(o_orderkey AS BIGINT) AS o_orderkey,
       CAST(epoch_us(o_orderdate) AS BIGINT) AS o_orderdate_us,
       CAST(round(o_totalprice * 100) AS BIGINT) AS total_cents,
       q.sum_qty_c
FROM (SELECT l_orderkey,
             CAST(sum(CAST(round(l_quantity * 100) AS BIGINT)) AS BIGINT)
                 AS sum_qty_c
      FROM lineitem GROUP BY l_orderkey
      HAVING sum(CAST(round(l_quantity * 100) AS BIGINT)) > {Q18_MIN_QTY_C}
     ) q
JOIN orders ON o_orderkey = q.l_orderkey
JOIN customer ON c_custkey = o_custkey
""",
    }


def gap_chunk_profile_oracles() -> dict[str, str]:
    """Session-5 additions: LAG gap histogram (events), flat-map
    chunker, column profile, similarity search (documents)."""
    from candidategeneration_ray.pipelines.events import (
        GAP_BUCKET_CAP, GAP_BUCKET_US)
    from candidategeneration_ray.pipelines.extras import (
        CHUNK_TOKENS, PROFILE_COLUMNS, SIMDOC_QUERY_DOCS, SIMDOC_SCALE,
        SIMDOC_TOPK)
    from candidategeneration_ray.functions.hashing import SHINGLE_W

    profile_union = "\nUNION ALL\n".join(
        f"SELECT '{c}' AS col_name, "
        f"CAST(count(*) - count({c}) AS BIGINT) AS n_null, "
        f"CAST(count(DISTINCT {c}) AS BIGINT) AS n_distinct FROM documents"
        for c in PROFILE_COLUMNS)
    qdocs_sql = ", ".join(str(d) for d in sorted(SIMDOC_QUERY_DOCS))
    return {
        "gap_histogram": f"""
WITH g AS (
  SELECT epoch_us(ts) - lag(epoch_us(ts)) OVER (
           PARTITION BY user_id ORDER BY ts, event_id) AS gap_us
  FROM events)
SELECT CAST(least(gap_us // {int(GAP_BUCKET_US)}, {int(GAP_BUCKET_CAP)})
            AS BIGINT) AS gap_min_bucket,
       CAST(count(*) AS BIGINT) AS n_gaps
FROM g WHERE gap_us IS NOT NULL
GROUP BY 1
""",
        "doc_chunks": f"""
WITH {KEPT_CTE}
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       CAST((kpos - 1) // {CHUNK_TOKENS} AS BIGINT) AS chunk_idx,
       CAST(count(*) AS BIGINT) AS n_tokens,
       string_agg(tok, ' ' ORDER BY kpos) AS chunk_text
FROM kept
GROUP BY doc_id, (kpos - 1) // {CHUNK_TOKENS}
""",
        "column_profile": profile_union,
        "similar_docs": f"""
WITH {KEPT_CTE},
{_DOCS_TOKS},
{_shingle_cte(SHINGLE_W)},
sizes AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n FROM sh GROUP BY doc_id),
inter AS (
  SELECT q.doc_id AS query_doc, c.doc_id AS doc_id,
         CAST(count(*) AS BIGINT) AS inter_n
  FROM sh q JOIN sh c ON q.h = c.h AND c.doc_id <> q.doc_id
  WHERE q.doc_id IN ({qdocs_sql})
  GROUP BY 1, 2),
scored AS (
  SELECT query_doc, i.doc_id, inter_n,
         sq.n + sc.n - inter_n AS union_n,
         (inter_n * {int(SIMDOC_SCALE)}) // (sq.n + sc.n - inter_n)
             AS score_scaled
  FROM inter i
  JOIN sizes sq ON sq.doc_id = i.query_doc
  JOIN sizes sc ON sc.doc_id = i.doc_id),
ranked AS (
  SELECT *, row_number() OVER (
      PARTITION BY query_doc
      ORDER BY score_scaled DESC, doc_id) AS rank
  FROM scored)
SELECT CAST(query_doc AS BIGINT) AS query_doc, CAST(rank AS BIGINT) AS rank,
       CAST(doc_id AS BIGINT) AS doc_id, inter_n, union_n,
       CAST(score_scaled AS BIGINT) AS score_scaled
FROM ranked WHERE rank <= {SIMDOC_TOPK}
""",
    }


def triangle_oracles() -> dict[str, str]:
    """Per-node triangle counts over the undirected kNN graph: the
    same qv/dist/rk CTEs as knn_oracles, symmetrized into an edge set,
    then the a<b<c triple join; each node of a triangle is counted
    once per triangle."""
    from candidategeneration_ray.pipelines.clustering import (
        KMEANS_SCALE, KNN_K)

    return {
        "triangle_counts": f"""
WITH qv AS MATERIALIZED (
  SELECT vec_id,
         CAST(generate_subscripts(embedding, 1) - 1 AS BIGINT) AS d,
         CAST(trunc(CAST(unnest(embedding) AS DOUBLE) * {KMEANS_SCALE}) AS BIGINT) AS x
  FROM embeddings
),
dist AS (
  SELECT a.vec_id AS vec_id, b.vec_id AS nbr_id,
         sum((a.x - b.x) * (a.x - b.x)) AS d2
  FROM qv a JOIN qv b ON a.d = b.d AND a.vec_id <> b.vec_id
  GROUP BY a.vec_id, b.vec_id
),
rk AS (
  SELECT vec_id, nbr_id,
         row_number() OVER (PARTITION BY vec_id
                            ORDER BY d2 ASC, nbr_id ASC) AS rank
  FROM dist
),
edges AS MATERIALIZED (
  SELECT DISTINCT least(vec_id, nbr_id) AS u, greatest(vec_id, nbr_id) AS v
  FROM rk WHERE rank <= {KNN_K}
),
tri AS (
  SELECT e1.u AS a, e1.v AS b, e2.v AS c
  FROM edges e1
  JOIN edges e2 ON e2.u = e1.v
  JOIN edges e3 ON e3.u = e1.u AND e3.v = e2.v
),
nodes AS (
  SELECT a AS vec_id FROM tri
  UNION ALL SELECT b FROM tri
  UNION ALL SELECT c FROM tri
)
SELECT CAST(vec_id AS BIGINT) AS vec_id,
       CAST(count(*) AS BIGINT) AS n_triangles
FROM nodes GROUP BY vec_id
""",
    }


def feature_oracles() -> dict[str, str]:
    """Running prefix-scan, one-pass user feature vector, keep-best
    dedup representatives."""
    from candidategeneration_ray.pipelines.events import (
        FEATURE_SESSION_GAP_SEC)

    gap_us = FEATURE_SESSION_GAP_SEC * 1_000_000
    dup_sql = extras_oracles()["dup_clusters"]
    return {
        "running_spend": """
SELECT CAST(event_id AS BIGINT) AS event_id,
       CAST(user_id AS BIGINT) AS user_id,
       CAST(sum(CAST(round(value * 100) AS BIGINT)) OVER (
            PARTITION BY user_id ORDER BY ts, event_id
            ROWS UNBOUNDED PRECEDING) AS BIGINT) AS running_cents
FROM events WHERE event_type = 'purchase'
""",
        "user_features": f"""
WITH s AS (
  SELECT user_id, event_id, event_type, value, epoch_us(ts) AS tus,
         CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
                   OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > {gap_us}
              THEN 1 ELSE 0 END AS new_sess
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
SELECT CAST(user_id AS BIGINT) AS user_id,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(count(DISTINCT event_type) AS BIGINT) AS n_event_types,
       CAST(count(*) FILTER (event_type = 'purchase') AS BIGINT)
           AS n_purchases,
       CAST(coalesce(sum(CAST(round(value * 100) AS BIGINT))
                     FILTER (event_type = 'purchase'), 0) AS BIGINT)
           AS purchase_cents,
       CAST(min(tus) AS BIGINT) AS first_ts_us,
       CAST(max(tus) AS BIGINT) AS last_ts_us,
       CAST(sum(new_sess) AS BIGINT) AS n_sessions
FROM s GROUP BY user_id
""",
        "cluster_representatives": f"""
SELECT cluster, rep_doc, rep_n_chars, n_docs FROM (
  SELECT c.cluster, c.doc_id AS rep_doc,
         CAST(d.n_chars AS BIGINT) AS rep_n_chars,
         row_number() OVER (PARTITION BY c.cluster
                            ORDER BY d.n_chars DESC, c.doc_id) AS rn,
         CAST(count(*) OVER (PARTITION BY c.cluster) AS BIGINT) AS n_docs
  FROM ({dup_sql}) c JOIN documents d USING (doc_id)) t
WHERE rn = 1
""",
    }


def props_moments_oracles() -> dict[str, str]:
    """JSON props extraction + per-source sufficient statistics."""
    return {
        "props_extract": """
SELECT event_type,
       CAST(json_extract(props, '$.k') AS BIGINT) // 10 AS k_bucket,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(sum(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT)
           AS sum_k
FROM events GROUP BY 1, 2
""",
        "source_moments": f"""
WITH {KEPT_CTE},
tc AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS y FROM kept GROUP BY doc_id)
SELECT source,
       CAST(count(*) AS BIGINT) AS n,
       CAST(sum(n_chars) AS BIGINT) AS sum_x,
       CAST(sum(coalesce(y, 0)) AS BIGINT) AS sum_y,
       CAST(sum(n_chars * n_chars) AS BIGINT) AS sum_xx,
       CAST(sum(coalesce(y, 0) * coalesce(y, 0)) AS BIGINT) AS sum_yy,
       CAST(sum(n_chars * coalesce(y, 0)) AS BIGINT) AS sum_xy
FROM documents LEFT JOIN tc USING (doc_id)
GROUP BY source
""",
    }


def hits_oracles() -> dict[str, str]:
    """Unrolled integer HITS rounds (floor max-normalization per
    half-round) over the kNN edge set — same qv/dist/rk CTEs as
    knn_oracles."""
    from candidategeneration_ray.pipelines.clustering import (
        HITS_ITERS, HITS_SCALE, KMEANS_SCALE, KNN_K)

    s = int(HITS_SCALE)
    rounds = []
    prev_h = "h0"
    last_a = None
    for i in range(1, HITS_ITERS + 1):
        rounds.append(f"""
a{i}r AS (SELECT v AS node, sum({prev_h}.s) AS raw
          FROM edges JOIN {prev_h} ON {prev_h}.node = edges.u GROUP BY v),
a{i} AS (SELECT node, raw * {s} // (SELECT max(raw) FROM a{i}r) AS s
         FROM a{i}r),
h{i}r AS (SELECT u AS node, sum(a{i}.s) AS raw
          FROM edges JOIN a{i} ON a{i}.node = edges.v GROUP BY u),
h{i} AS (SELECT node, raw * {s} // (SELECT max(raw) FROM h{i}r) AS s
         FROM h{i}r)""")
        prev_h, last_a = f"h{i}", f"a{i}"
    rounds_sql = ",".join(rounds)
    return {
        "hits_scores": f"""
WITH qv AS MATERIALIZED (
  SELECT vec_id,
         CAST(generate_subscripts(embedding, 1) - 1 AS BIGINT) AS d,
         CAST(trunc(CAST(unnest(embedding) AS DOUBLE) * {KMEANS_SCALE}) AS BIGINT) AS x
  FROM embeddings
),
dist AS (
  SELECT a.vec_id AS vec_id, b.vec_id AS nbr_id,
         sum((a.x - b.x) * (a.x - b.x)) AS d2
  FROM qv a JOIN qv b ON a.d = b.d AND a.vec_id <> b.vec_id
  GROUP BY a.vec_id, b.vec_id
),
rk AS (
  SELECT vec_id, nbr_id,
         row_number() OVER (PARTITION BY vec_id
                            ORDER BY d2 ASC, nbr_id ASC) AS rank
  FROM dist
),
edges AS MATERIALIZED (
  SELECT vec_id AS u, nbr_id AS v FROM rk WHERE rank <= {KNN_K}
),
h0 AS (SELECT vec_id AS node, CAST({s} AS BIGINT) AS s FROM embeddings),
{rounds_sql}
SELECT CAST(e.vec_id AS BIGINT) AS vec_id,
       CAST(coalesce({prev_h}.s, 0) AS BIGINT) AS hub,
       CAST(coalesce({last_a}.s, 0) AS BIGINT) AS auth
FROM embeddings e
LEFT JOIN {prev_h} ON {prev_h}.node = e.vec_id
LEFT JOIN {last_a} ON {last_a}.node = e.vec_id
""",
    }


def transition_oracles() -> dict[str, str]:
    """LAG pair mining: first-order event-type transition counts."""
    return {
        "type_transitions": """
WITH o AS (
  SELECT event_type,
         lag(event_type) OVER (PARTITION BY user_id
                               ORDER BY ts, event_id) AS prev_type
  FROM events)
SELECT prev_type, event_type AS next_type,
       CAST(count(*) AS BIGINT) AS n
FROM o WHERE prev_type IS NOT NULL
GROUP BY 1, 2
""",
    }


def label_vote_oracles() -> dict[str, str]:
    """One-round kNN majority-vote label propagation — same qv/dist/rk
    CTEs as knn_oracles; argmax tie-break (n_votes DESC, label ASC)."""
    from candidategeneration_ray.pipelines.clustering import (
        KMEANS_SCALE, KNN_K, LABEL_HOLDOUT)

    return {
        "knn_label_vote": f"""
WITH qv AS MATERIALIZED (
  SELECT vec_id,
         CAST(generate_subscripts(embedding, 1) - 1 AS BIGINT) AS d,
         CAST(trunc(CAST(unnest(embedding) AS DOUBLE) * {KMEANS_SCALE}) AS BIGINT) AS x
  FROM embeddings
),
dist AS (
  SELECT a.vec_id AS vec_id, b.vec_id AS nbr_id,
         sum((a.x - b.x) * (a.x - b.x)) AS d2
  FROM qv a JOIN qv b ON a.d = b.d AND a.vec_id <> b.vec_id
  GROUP BY a.vec_id, b.vec_id
),
rk AS (
  SELECT vec_id, nbr_id,
         row_number() OVER (PARTITION BY vec_id
                            ORDER BY d2 ASC, nbr_id ASC) AS rank
  FROM dist
),
edges AS (
  SELECT vec_id AS u, nbr_id AS v FROM rk
  WHERE rank <= {KNN_K} AND vec_id % {LABEL_HOLDOUT} = 0
),
lab AS (
  SELECT vec_id, label FROM embeddings
  WHERE vec_id % {LABEL_HOLDOUT} <> 0
),
votes AS (
  SELECT e.u AS vec_id, l.label AS pred_label,
         count(*) AS n_votes
  FROM edges e JOIN lab l ON l.vec_id = e.v
  GROUP BY 1, 2
),
best AS (
  SELECT vec_id, pred_label, n_votes,
         row_number() OVER (PARTITION BY vec_id
                            ORDER BY n_votes DESC, pred_label ASC) AS r
  FROM votes)
SELECT CAST(vec_id AS BIGINT) AS vec_id,
       CAST(pred_label AS BIGINT) AS pred_label,
       CAST(n_votes AS BIGINT) AS n_votes
FROM best WHERE r = 1
""",
    }


def skyline_oracles() -> dict[str, str]:
    """2-D Pareto skyline via the sort-based window formulation (the
    NOT-EXISTS self-join is O(n²); this is the same running-min scan
    the engine kernel runs): survive iff min day in your exact price
    group AND strictly earlier than every strictly-cheaper row."""
    return {
        "order_skyline": """
WITH pts AS (
  SELECT o_orderkey,
         CAST(round(o_totalprice * 100) AS BIGINT) AS price_cents,
         CAST(epoch_us(o_orderdate) // 86400000000 AS BIGINT) AS order_day
  FROM orders),
w AS (
  SELECT *,
         min(order_day) OVER (
           ORDER BY price_cents
           RANGE BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS mdc,
         min(order_day) OVER (PARTITION BY price_cents) AS mdp
  FROM pts)
SELECT CAST(o_orderkey AS BIGINT) AS o_orderkey, price_cents, order_day
FROM w
WHERE order_day = mdp AND (mdc IS NULL OR order_day < mdc)
""",
    }


def tpch_shapes_oracles() -> dict[str, str]:
    """Q14/Q17/Q22/Q12-shaped oracles — all integer-exact (revenue in
    milli-cents, fractional comparisons cross-multiplied)."""
    from candidategeneration_ray.pipelines.relational import (
        HIGH_PRIORITIES, PROMO_SHIP_HI, PROMO_SHIP_LO, Q17_BRAND,
        Q22_DATE_HI, Q22_DATE_LO)

    hp = ", ".join(f"'{p}'" for p in HIGH_PRIORITIES)
    return {
        "promo_revenue_share": f"""
WITH li AS (
  SELECT l_partkey,
         CAST(round(l_extendedprice * 100) AS BIGINT)
           * (100 - CAST(round(l_discount * 100) AS BIGINT)) AS rev
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '{PROMO_SHIP_LO}'
    AND l_shipdate <  TIMESTAMP '{PROMO_SHIP_HI}')
SELECT
  CAST(coalesce(sum(CASE WHEN p_type = 'PROMO' THEN rev END), 0)
       AS BIGINT) AS promo_milli,
  CAST(coalesce(sum(rev), 0) AS BIGINT) AS total_milli,
  CAST(count(*) AS BIGINT) AS n_lines
FROM li JOIN part ON p_partkey = l_partkey
""",
        "small_qty_revenue": f"""
WITH bp AS (SELECT p_partkey FROM part WHERE p_brand = '{Q17_BRAND}'),
li AS (
  SELECT l_partkey, CAST(round(l_quantity) AS BIGINT) AS qty,
         CAST(round(l_extendedprice * 100) AS BIGINT) AS cents
  FROM lineitem JOIN bp ON p_partkey = l_partkey),
ag AS (SELECT l_partkey, count(*) AS cnt, sum(qty) AS sum_qty
       FROM li GROUP BY 1)
SELECT CAST(coalesce(sum(li.cents), 0) AS BIGINT) AS total_cents,
       CAST(count(*) AS BIGINT) AS n_lines
FROM li JOIN ag USING (l_partkey)
WHERE 5 * li.qty * ag.cnt < ag.sum_qty
""",
        "above_avg_idle_customers": f"""
WITH s AS (
  SELECT count(*) AS n_pos,
         sum(CAST(round(c_acctbal * 100) AS BIGINT)) AS sum_pos
  FROM customer WHERE CAST(round(c_acctbal * 100) AS BIGINT) > 0),
kept AS (
  SELECT c_nationkey, CAST(round(c_acctbal * 100) AS BIGINT) AS cents
  FROM customer, s
  WHERE CAST(round(c_acctbal * 100) AS BIGINT) * n_pos > sum_pos
    AND NOT EXISTS (SELECT 1 FROM orders
                    WHERE o_custkey = c_custkey
                      AND o_orderdate >= TIMESTAMP '{Q22_DATE_LO}'
                      AND o_orderdate <  TIMESTAMP '{Q22_DATE_HI}'))
SELECT CAST(c_nationkey AS BIGINT) AS c_nationkey,
       CAST(count(*) AS BIGINT) AS n_custs,
       CAST(sum(cents) AS BIGINT) AS total_cents
FROM kept GROUP BY 1
""",
        "line_priority_counts": f"""
SELECT l_returnflag,
  CAST(sum(CASE WHEN o_orderpriority IN ({hp}) THEN 1 ELSE 0 END)
       AS BIGINT) AS high_lines,
  CAST(sum(CASE WHEN o_orderpriority IN ({hp}) THEN 0 ELSE 1 END)
       AS BIGINT) AS low_lines
FROM lineitem JOIN orders ON o_orderkey = l_orderkey
WHERE epoch_us(l_shipdate) > epoch_us(o_orderdate)
GROUP BY 1
""",
    }


def retrieval_eval_oracles() -> dict[str, str]:
    """Composition oracle: re-uses the bm25_topk and
    predictive_candidates oracle SQL verbatim as derived tables, so
    the driver value-checks the EVALUATION of one pipeline against
    the other, not just each pipeline alone."""
    bm25 = core_oracles()["bm25_topk"]
    cand = predictive_oracles()["predictive_candidates"]
    return {
        "retrieval_eval": f"""
WITH cand AS ({cand}),
rel AS ({bm25})
SELECT CAST(c.query_id AS BIGINT) AS query_id,
       CAST(count(*) AS BIGINT) AS n_candidates,
       CAST(sum(CASE WHEN r.doc_id IS NOT NULL AND c.rank <= 10
                     THEN 1 ELSE 0 END) AS BIGINT) AS hits_at_10,
       CAST(coalesce(min(CASE WHEN r.doc_id IS NOT NULL
                              THEN c.rank END), 0) AS BIGINT)
         AS first_rel_rank
FROM cand c
LEFT JOIN rel r ON r.query_id = c.query_id AND r.doc_id = c.doc_id
GROUP BY 1
""",
        # exact precision-recall points: one row per relevant hit in
        # candidate rank order (prec@k = hit_idx/rank held rational)
        "pr_points": f"""
WITH cand AS ({cand}),
rel AS ({bm25}),
nr AS (SELECT query_id, CAST(count(*) AS BIGINT) AS n_rel
       FROM rel GROUP BY 1),
hits AS (
  SELECT c.query_id, c.rank,
         row_number() OVER (PARTITION BY c.query_id
                            ORDER BY c.rank) AS hit_idx
  FROM cand c
  JOIN rel r ON r.query_id = c.query_id AND r.doc_id = c.doc_id)
SELECT CAST(h.query_id AS BIGINT) AS query_id,
       CAST(h.hit_idx AS BIGINT) AS hit_idx,
       CAST(h.rank AS BIGINT) AS rank,
       n.n_rel
FROM hits h JOIN nr n USING (query_id)
""",
    }


def copresence_oracles() -> dict[str, str]:
    """Interval self-join: overlapping session pairs across users —
    the sessionize CTE extended with per-session time bounds, then a
    closed-interval inequality join."""
    return {
        "session_copresence": """
WITH ordered AS (
  SELECT user_id, event_id, ts,
         lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
  FROM events),
flagged AS (
  SELECT *, CASE WHEN prev_ts IS NULL
                   OR epoch_us(ts) - epoch_us(prev_ts) > 1800000000
                 THEN 1 ELSE 0 END AS new_s
  FROM ordered),
sess AS (
  SELECT *, sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS UNBOUNDED PRECEDING) AS session_idx
  FROM flagged),
sessions AS (
  SELECT user_id, session_idx,
         min(epoch_us(ts)) AS s, max(epoch_us(ts)) AS e
  FROM sess GROUP BY 1, 2)
SELECT CAST(a.user_id AS BIGINT) AS user_a,
       CAST(b.user_id AS BIGINT) AS user_b,
       CAST(count(*) AS BIGINT) AS n_overlaps
FROM sessions a, sessions b
WHERE a.user_id < b.user_id AND a.s <= b.e AND b.s <= a.e
GROUP BY 1, 2
""",
    }


def substring_oracles() -> dict[str, str]:
    """Trigram-filtered substring search vs plain contains() scans."""
    from candidategeneration_ray.pipelines.lexicon import SUBSTR_PATTERNS

    parts = "\nUNION ALL\n".join(
        f"SELECT '{p}' AS pattern, CAST(doc_id AS BIGINT) AS doc_id "
        f"FROM documents WHERE contains(text, '{p}')"
        for p in SUBSTR_PATTERNS)
    return {"substring_docs": parts}


def holistic_audit_oracles() -> dict[str, str]:
    """Exact per-group median (holistic aggregate) + FK audit."""
    edges = [
        ("lineitem", "l_orderkey", "orders", "o_orderkey",
         "lineitem->orders"),
        ("lineitem", "l_partkey", "part", "p_partkey",
         "lineitem->part"),
        ("lineitem", "l_suppkey", "supplier", "s_suppkey",
         "lineitem->supplier"),
        ("orders", "o_custkey", "customer", "c_custkey",
         "orders->customer"),
        ("customer", "c_nationkey", "nation", "n_nationkey",
         "customer->nation"),
    ]
    audit = "\nUNION ALL\n".join(
        f"SELECT '{nm}' AS fk_edge, CAST(count(*) AS BIGINT) AS "
        f"n_child_rows, CAST(sum(CASE WHEN NOT EXISTS (SELECT 1 FROM "
        f"{pt} WHERE {pc} = c.{cc}) THEN 1 ELSE 0 END) AS BIGINT) AS "
        f"n_orphans FROM {ct} c"
        for ct, cc, pt, pc, nm in edges)
    return {
        "nation_median_order": """
WITH j AS (
  SELECT c_nationkey,
         CAST(round(o_totalprice * 100) AS BIGINT) AS cents
  FROM orders JOIN customer ON c_custkey = o_custkey),
r AS (
  SELECT c_nationkey, cents,
         row_number() OVER (PARTITION BY c_nationkey
                            ORDER BY cents) AS rk,
         count(*) OVER (PARTITION BY c_nationkey) AS n
  FROM j)
SELECT CAST(c_nationkey AS BIGINT) AS c_nationkey,
       CAST(n AS BIGINT) AS n_orders,
       CAST(cents AS BIGINT) AS median_cents,
       CAST(min(cents) OVER (PARTITION BY c_nationkey) AS BIGINT)
         AS min_cents,
       CAST(max(cents) OVER (PARTITION BY c_nationkey) AS BIGINT)
         AS max_cents
FROM r QUALIFY rk = (n - 1) // 2 + 1
""",
        "nation_median_interp": """
WITH j AS (
  SELECT c_nationkey,
         CAST(round(o_totalprice * 100) AS BIGINT) AS cents
  FROM orders JOIN customer ON c_custkey = o_custkey),
r AS (
  SELECT c_nationkey, cents,
         row_number() OVER (PARTITION BY c_nationkey
                            ORDER BY cents) AS rk,
         count(*) OVER (PARTITION BY c_nationkey) AS n
  FROM j)
SELECT CAST(c_nationkey AS BIGINT) AS c_nationkey,
       CAST(any_value(n) AS BIGINT) AS n_orders,
       CAST(sum(CASE WHEN rk = (n - 1) // 2 + 1 THEN cents ELSE 0 END)
            + sum(CASE WHEN rk = n // 2 + 1 THEN cents ELSE 0 END)
            AS BIGINT) AS median2_cents
FROM r GROUP BY c_nationkey
""",
        "nation_mode_priority": """
WITH j AS (
  SELECT c_nationkey, o_orderpriority AS pr
  FROM orders JOIN customer ON c_custkey = o_custkey),
cnt AS (SELECT c_nationkey, pr, count(*) AS n FROM j GROUP BY 1, 2),
rk AS (
  SELECT *, row_number() OVER (PARTITION BY c_nationkey
                               ORDER BY n DESC, pr ASC) AS r
  FROM cnt)
SELECT CAST(c_nationkey AS BIGINT) AS c_nationkey,
       pr AS mode_priority,
       CAST(n AS BIGINT) AS n_orders_mode
FROM rk WHERE r = 1
""",
        "fk_audit": audit,
    }


def p90_oracles() -> dict[str, str]:
    """Exact P90 via the window formulation — rank (9*(n-1))//10,
    0-based, matching the two-pass counting-sort engine path."""
    return {
        "nation_p90_order": """
WITH j AS (
  SELECT c_nationkey,
         CAST(round(o_totalprice * 100) AS BIGINT) AS cents
  FROM orders JOIN customer ON c_custkey = o_custkey),
r AS (
  SELECT c_nationkey, cents,
         row_number() OVER (PARTITION BY c_nationkey
                            ORDER BY cents) AS rk,
         count(*) OVER (PARTITION BY c_nationkey) AS n
  FROM j)
SELECT CAST(c_nationkey AS BIGINT) AS c_nationkey,
       CAST(n AS BIGINT) AS n_orders,
       CAST(cents AS BIGINT) AS p90_cents
FROM r WHERE rk = (9 * (n - 1)) // 10 + 1
""",
    }


def late_oracles() -> dict[str, str]:
    """Watermark / allowed-lateness window counts — the arrival-ordered
    running-max watermark as an exclusive-frame window function; same
    derived arrival time (md5 h64 of event_id) as events.q_late_events."""
    from candidategeneration_ray.pipelines.events import (
        LATE_ALLOWED_MS, LATE_MAX_DELAY_MS, LATE_WINDOW_MS)

    h64_eid = _H64.format(expr="CAST(event_id AS VARCHAR)")
    return {
        "late_events": f"""
WITH e AS (
  SELECT event_id, epoch_ms(ts) AS ts_ms,
         CAST({h64_eid} % {LATE_MAX_DELAY_MS} AS BIGINT) AS delay
  FROM events),
w AS (
  SELECT ts_ms,
         max(ts_ms) OVER (ORDER BY ts_ms + delay, event_id
                          ROWS BETWEEN UNBOUNDED PRECEDING
                               AND 1 PRECEDING) AS wm
  FROM e),
f AS (
  SELECT ts_ms // {LATE_WINDOW_MS} * {LATE_WINDOW_MS} AS ws,
         CASE WHEN wm IS NOT NULL AND ts_ms < wm - {LATE_ALLOWED_MS}
              THEN 1 ELSE 0 END AS late
  FROM w)
SELECT CAST(ws AS BIGINT) AS window_start_ms,
       CAST(sum(1 - late) AS BIGINT) AS n_accepted,
       CAST(sum(late) AS BIGINT) AS n_late
FROM f GROUP BY ws
""",
    }


def cusum_oracles() -> dict[str, str]:
    """CUSUM drift scan as window prefix sums per type."""
    from candidategeneration_ray.pipelines.events import CUSUM_MULT

    return {
        "cusum_days": f"""
WITH dc AS (
  SELECT event_type, epoch_us(ts) // 86400000000 AS day,
         CAST(count(*) AS BIGINT) AS n
  FROM events GROUP BY 1, 2),
t AS (
  SELECT event_type,
         CAST(count(*) AS BIGINT) AS tot_d,
         CAST(sum(n) AS BIGINT) AS tot_n
  FROM dc GROUP BY event_type),
scan AS (
  SELECT dc.event_type, dc.day, dc.n,
         t.tot_d * sum(dc.n) OVER (PARTITION BY dc.event_type
                                   ORDER BY dc.day)
         - row_number() OVER (PARTITION BY dc.event_type
                              ORDER BY dc.day) * t.tot_n AS s,
         t.tot_n, t.tot_d
  FROM dc JOIN t USING (event_type))
SELECT event_type, CAST(day AS BIGINT) AS day,
       CAST(n AS BIGINT) AS n_events,
       CAST(s AS BIGINT) AS s_num,
       CAST(CASE WHEN abs(s) * {CUSUM_MULT} > tot_n * tot_d
                 THEN 1 ELSE 0 END AS BIGINT) AS flag
FROM scan
""",
    }


def gapfill_oracles() -> dict[str, str]:
    """Row-generation gap fill: every hourly slot per type."""
    return {
        "windowed_counts_filled": """
WITH w AS (
  SELECT event_type, epoch_us(ts) // 3600000000 AS w,
         CAST(round(value * 100) AS BIGINT) AS cents
  FROM events),
b AS (SELECT event_type, min(w) AS lo, max(w) AS hi FROM w GROUP BY 1),
slots AS (
  SELECT event_type, unnest(generate_series(lo, hi)) AS w FROM b),
agg AS (
  SELECT event_type, w, count(*) AS n, sum(cents) AS c
  FROM w GROUP BY 1, 2)
SELECT s.event_type,
       CAST(s.w * 3600000000 AS BIGINT) AS window_start_us,
       CAST(coalesce(agg.n, 0) AS BIGINT) AS n_events,
       CAST(coalesce(agg.c, 0) AS BIGINT) AS cents
FROM slots s LEFT JOIN agg USING (event_type, w)
""",
    }


def ppr_oracles() -> dict[str, str]:
    """Personalized PageRank: the shared _pagerank_sql builder with a
    seed-conditional r0/restart term."""
    from candidategeneration_ray.pipelines.clustering import PPR_SEED_MOD

    return {
        "personalized_pagerank": _pagerank_sql(PPR_SEED_MOD, "ppr"),
    }


def fuzzy_join_oracles() -> dict[str, str]:
    """Edit-distance self-join on part names — DuckDB's levenshtein()
    is the reference; the ed <= |len diff| identity makes the length
    predicate redundant (kept for speed)."""
    from candidategeneration_ray.pipelines.extras import ED_K

    return {
        "fuzzy_name_pairs": f"""
SELECT CAST(a.p_partkey AS BIGINT) AS a_key,
       CAST(b.p_partkey AS BIGINT) AS b_key,
       CAST(levenshtein(a.p_name, b.p_name) AS BIGINT) AS ed
FROM part a JOIN part b ON a.p_partkey < b.p_partkey
WHERE abs(length(a.p_name) - length(b.p_name)) <= {ED_K}
  AND levenshtein(a.p_name, b.p_name) <= {ED_K}
""",
        "part_entities": f"""
WITH RECURSIVE fp AS MATERIALIZED (
  SELECT a.p_partkey AS a_key, b.p_partkey AS b_key
  FROM part a JOIN part b ON a.p_partkey < b.p_partkey
  WHERE abs(length(a.p_name) - length(b.p_name)) <= {ED_K}
    AND levenshtein(a.p_name, b.p_name) <= {ED_K}),
edges AS (
  SELECT a_key AS src, b_key AS dst FROM fp
  UNION ALL
  SELECT b_key AS src, a_key AS dst FROM fp),
reach(node, lbl) AS (
  SELECT p_partkey, p_partkey FROM part
  UNION
  SELECT e.dst, r.lbl FROM reach r JOIN edges e ON e.src = r.node)
SELECT CAST(node AS BIGINT) AS p_partkey,
       CAST(min(lbl) AS BIGINT) AS entity
FROM reach GROUP BY node
""",
    }


def top_pairs_oracles() -> dict[str, str]:
    """Threshold-less top-k similarity join — same shingle CTEs as
    jaccard_pairs, ranked by the scaled integer score."""
    from candidategeneration_ray.pipelines.extras import (
        JACC_SCORE_SCALE, TOP_PAIRS_K)

    return {
        "top_similar_pairs": f"""
WITH {KEPT_CTE},
{_DOCS_TOKS},
{_shingle_cte(H.SHINGLE_W)},
sizes AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n
          FROM sh GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         CAST(count(*) AS BIGINT) AS inter_n
  FROM sh a JOIN sh b ON a.h = b.h AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
),
scored AS (
  SELECT doc_a, doc_b, inter_n,
         sa.n + sb.n - inter_n AS union_n,
         (inter_n * {int(JACC_SCORE_SCALE)})
           // (sa.n + sb.n - inter_n) AS score_q
  FROM inter
  JOIN sizes sa ON sa.doc_id = doc_a
  JOIN sizes sb ON sb.doc_id = doc_b
)
SELECT CAST(row_number() OVER (ORDER BY score_q DESC, doc_a, doc_b)
            AS BIGINT) AS rank,
       doc_a, doc_b, inter_n, CAST(union_n AS BIGINT) AS union_n,
       CAST(score_q AS BIGINT) AS score_q
FROM scored
ORDER BY score_q DESC, doc_a, doc_b
LIMIT {TOP_PAIRS_K}
""",
    }


def digest_oracles() -> dict[str, str]:
    """Order-insensitive row-hash digest per (source, lang): same md5
    h64 and mod-2^40 reduction as the engine (2^40 divides 2^63, so
    the engine's 63-bit mask then mod equals a direct mod)."""
    from candidategeneration_ray.pipelines.extras import DIGEST_MOD

    h = _H64.format(
        expr="doc_id::VARCHAR || '|' || n_chars::VARCHAR")
    return {
        "corpus_digest": f"""
SELECT source, lang, CAST(count(*) AS BIGINT) AS n_rows,
       CAST(sum({h} % {int(DIGEST_MOD)}) AS BIGINT) AS digest
FROM documents
GROUP BY 1, 2
""",
    }


def range_scan_oracles() -> dict[str, str]:
    """Time-range aggregate — the oracle scans everything; the engine
    must agree while reading only the touched day partitions."""
    from candidategeneration_ray.pipelines.events import (
        RANGE_SCAN_HI, RANGE_SCAN_LO)

    return {
        "events_range_scan": f"""
SELECT event_type, CAST(count(*) AS BIGINT) AS n_events,
       CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents
FROM events
WHERE ts >= TIMESTAMP '{RANGE_SCAN_LO}'
  AND ts <  TIMESTAMP '{RANGE_SCAN_HI}'
GROUP BY 1
""",
    }


def _pq_ctes() -> str:
    """Per-subspace unrolled Lloyd chains for product quantization —
    the _kmeans_ctes recipe repeated with the qv rows split into PQ_M
    contiguous dim ranges (the split derives from max(d), so the SQL
    stays table-shape-free). Prefixes: s{m}qv / s{m}c{i} / s{m}a{i}."""
    from candidategeneration_ray.pipelines.clustering import (
        KMEANS_ITERS, KMEANS_K, KMEANS_SCALE, PQ_M)

    parts = [f"""qv AS MATERIALIZED (
  SELECT vec_id,
         CAST(generate_subscripts(embedding, 1) - 1 AS BIGINT) AS d,
         CAST(trunc(CAST(unnest(embedding) AS DOUBLE) * {KMEANS_SCALE}) AS BIGINT) AS x
  FROM embeddings
),
dims AS (SELECT max(d) + 1 AS dim FROM qv),
ids AS (SELECT vec_id, row_number() OVER (ORDER BY vec_id) - 1 AS rk
        FROM embeddings),
{_pq_subspace_chains()}"""]
    return ",\n".join(parts)


def _pq_subspace_chains() -> str:
    """The per-subspace chains alone (s{{m}}qv / s{{m}}c{{i}} /
    s{{m}}a{{i}}) — assume qv, dims and ids CTEs already exist in the
    enclosing WITH; lets the IVF-PQ oracle combine these with the
    coarse-quantizer chains from _kmeans_ctes (which defines the same
    qv/ids header)."""
    from candidategeneration_ray.pipelines.clustering import (
        KMEANS_ITERS, KMEANS_K, PQ_M)

    parts = []
    for m in range(PQ_M):
        parts.append(f"""s{m}qv AS MATERIALIZED (
  SELECT qv.vec_id, qv.d, qv.x FROM qv, dims
  WHERE qv.d // (dims.dim // {PQ_M}) = {m}
),
s{m}c0 AS (SELECT CAST(rk AS BIGINT) AS cluster, d, x AS cq
           FROM s{m}qv JOIN ids USING (vec_id) WHERE rk < {KMEANS_K})""")
        for i in range(1, KMEANS_ITERS + 2):
            parts.append(f"""s{m}a{i} AS MATERIALIZED (
  SELECT vec_id, cluster FROM (
    SELECT v.vec_id, c.cluster,
           row_number() OVER (
             PARTITION BY v.vec_id
             ORDER BY sum((v.x - c.cq) * (v.x - c.cq)) ASC,
                      c.cluster ASC) AS rn
    FROM s{m}qv v JOIN s{m}c{i - 1} c USING (d)
    GROUP BY v.vec_id, c.cluster)
  WHERE rn = 1
)""")
            if i <= KMEANS_ITERS:
                parts.append(f"""s{m}c{i} AS MATERIALIZED (
  SELECT p.cluster, p.d,
         coalesce(CAST(floor(CAST(s.sx AS DOUBLE) / s.n) AS BIGINT),
                  p.cq) AS cq
  FROM s{m}c{i - 1} p
  LEFT JOIN (
    SELECT a.cluster, v.d, sum(v.x) AS sx, count(*) AS n
    FROM s{m}a{i} a JOIN s{m}qv v USING (vec_id)
    GROUP BY a.cluster, v.d
  ) s ON s.cluster = p.cluster AND s.d = p.d
)""")
    return ",\n".join(parts)


def pq_oracles() -> dict[str, str]:
    """PQ codes + ADC top-10 — deterministic integer computations, so
    even the 'approximate' ANN ranking is value-verified."""
    from candidategeneration_ray.pipelines.clustering import (
        KMEANS_ITERS, PQ_M)

    F = KMEANS_ITERS + 1
    code_union = "\nUNION ALL\n".join(
        f"SELECT CAST(vec_id AS BIGINT) AS vec_id, "
        f"CAST({m} AS BIGINT) AS subspace, cluster AS code "
        f"FROM s{m}a{F}" for m in range(PQ_M))
    luts = ",\n".join(
        f"""lut{m} AS (
  SELECT c.cluster, sum((q.x - c.cq) * (q.x - c.cq)) AS d2
  FROM s{m}c{KMEANS_ITERS} c
  JOIN qv q ON q.d = c.d AND q.vec_id = 0
  GROUP BY c.cluster)""" for m in range(PQ_M))
    joins = "\n".join(
        f"JOIN s{m}a{F} a{m} ON a{m}.vec_id = a0.vec_id\n"
        f"JOIN lut{m} l{m} ON l{m}.cluster = a{m}.cluster"
        for m in range(1, PQ_M))
    adc_sum = " + ".join(f"l{m}.d2" for m in range(PQ_M))
    return {
        "pq_codes": f"WITH {_pq_ctes()}\n{code_union}",
        "ann_pq_top10": f"""
WITH {_pq_ctes()},
{luts},
adc AS (
  SELECT a0.vec_id, {adc_sum} AS adc_d2
  FROM s0a{F} a0
  JOIN lut0 l0 ON l0.cluster = a0.cluster
{joins}
)
SELECT CAST(row_number() OVER (ORDER BY adc_d2, vec_id) AS BIGINT)
         AS rank,
       CAST(vec_id AS BIGINT) AS vec_id,
       CAST(adc_d2 AS BIGINT) AS adc_d2
FROM adc ORDER BY adc_d2, vec_id LIMIT 10
""",
    }


def ivfpq_oracles() -> dict[str, str]:
    """IVF-PQ two-stage ranking: coarse chains from _kmeans_ctes +
    subspace chains from _pq_subspace_chains in ONE WITH (they share
    the qv header; _kmeans_ctes lacks dims/pq ids, added here).
    Probe = nprobe nearest coarse centroids by (d2, cluster); final
    order (adc_d2, vec_id)."""
    from candidategeneration_ray.pipelines.clustering import (
        IVF_NPROBE, KMEANS_ITERS, PQ_M)

    F = KMEANS_ITERS + 1
    luts = ",\n".join(
        f"""lut{m} AS (
  SELECT c.cluster, sum((q.x - c.cq) * (q.x - c.cq)) AS d2
  FROM s{m}c{KMEANS_ITERS} c
  JOIN qv q ON q.d = c.d AND q.vec_id = 0
  GROUP BY c.cluster)""" for m in range(PQ_M))
    joins = "\n".join(
        f"JOIN s{m}a{F} a{m} ON a{m}.vec_id = cand.vec_id\n"
        f"JOIN lut{m} l{m} ON l{m}.cluster = a{m}.cluster"
        for m in range(PQ_M))
    adc_sum = " + ".join(f"l{m}.d2" for m in range(PQ_M))
    return {
        # Learned-codebook IVF with EXACT in-list scoring: probe set and
        # bucket membership are the deterministic integer k-means chains
        # (identical to the engine's build_ivf_kmeans_index assignment),
        # final ranking the same float cosine the value-verified
        # ann_cosine_top10 oracle uses — so the whole two-stage ranking
        # hash-verifies (approximate only vs the unpruned brute force).
        "ann_ivf_kmeans_top10": f"""
WITH {_kmeans_ctes()},
cdist AS (
  SELECT c.cluster, sum((q.x - c.cq) * (q.x - c.cq)) AS d2
  FROM c{KMEANS_ITERS} c
  JOIN qv q ON q.d = c.d AND q.vec_id = 0
  GROUP BY c.cluster),
probe AS (
  SELECT cluster FROM cdist
  ORDER BY d2 ASC, cluster ASC LIMIT {IVF_NPROBE}),
cand AS (
  SELECT vec_id FROM a{F}
  WHERE cluster IN (SELECT cluster FROM probe)),
scored AS (
  SELECT e.vec_id,
         list_cosine_similarity(e.embedding,
             (SELECT embedding FROM embeddings WHERE vec_id = 0)) AS cos
  FROM embeddings e JOIN cand ON cand.vec_id = e.vec_id)
SELECT rank, vec_id FROM (
  SELECT CAST(row_number() OVER (ORDER BY cos DESC, vec_id ASC) AS BIGINT)
           AS rank,
         CAST(vec_id AS BIGINT) AS vec_id
  FROM scored
) WHERE rank <= 10
""",
        "ann_ivfpq_top10": f"""
WITH {_kmeans_ctes()},
dims AS (SELECT max(d) + 1 AS dim FROM qv),
{_pq_subspace_chains()},
{luts},
cdist AS (
  SELECT c.cluster, sum((q.x - c.cq) * (q.x - c.cq)) AS d2
  FROM c{KMEANS_ITERS} c
  JOIN qv q ON q.d = c.d AND q.vec_id = 0
  GROUP BY c.cluster),
probe AS (
  SELECT cluster FROM cdist
  ORDER BY d2 ASC, cluster ASC LIMIT {IVF_NPROBE}),
cand AS (
  SELECT vec_id FROM a{F}
  WHERE cluster IN (SELECT cluster FROM probe)),
adc AS (
  SELECT cand.vec_id, {adc_sum} AS adc_d2
  FROM cand
{joins}
)
SELECT CAST(row_number() OVER (ORDER BY adc_d2, vec_id) AS BIGINT)
         AS rank,
       CAST(vec_id AS BIGINT) AS vec_id,
       CAST(adc_d2 AS BIGINT) AS adc_d2
FROM adc ORDER BY adc_d2, vec_id LIMIT 10
""",
    }


def regression_oracles() -> dict[str, str]:
    """Grouped OLS from the same moment expressions as source_moments
    — integer num/den so the fit hash-compares."""
    return {
        "source_regression": f"""
WITH {KEPT_CTE},
tc AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS y
       FROM kept GROUP BY doc_id),
m AS (
  SELECT source,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum(n_chars) AS BIGINT) AS sx,
         CAST(sum(coalesce(y, 0)) AS BIGINT) AS sy,
         CAST(sum(n_chars * n_chars) AS BIGINT) AS sxx,
         CAST(sum(n_chars * coalesce(y, 0)) AS BIGINT) AS sxy
  FROM documents LEFT JOIN tc USING (doc_id)
  GROUP BY source)
SELECT source, n,
       CAST(n * sxy - sx * sy AS BIGINT) AS slope_num,
       CAST(n * sxx - sx * sx AS BIGINT) AS slope_den,
       CAST(sy * (n * sxx - sx * sx)
            - (n * sxy - sx * sy) * sx AS BIGINT) AS icept_num,
       CAST(n * (n * sxx - sx * sx) AS BIGINT) AS icept_den
FROM m
""",
    }


def gram_oracles() -> dict[str, str]:
    """Gram matrix: qv self-join per vector, upper triangle + n row."""
    from candidategeneration_ray.pipelines.clustering import KMEANS_SCALE

    return {
        "embedding_gram": f"""
WITH qv AS MATERIALIZED (
  SELECT vec_id,
         CAST(generate_subscripts(embedding, 1) - 1 AS BIGINT) AS d,
         CAST(trunc(CAST(unnest(embedding) AS DOUBLE) * {KMEANS_SCALE}) AS BIGINT) AS x
  FROM embeddings
)
SELECT a.d AS dim_a, b.d AS dim_b,
       CAST(sum(a.x * b.x) AS BIGINT) AS sum_xy
FROM qv a JOIN qv b ON a.vec_id = b.vec_id AND a.d <= b.d
GROUP BY 1, 2
UNION ALL
SELECT CAST(-1 AS BIGINT), CAST(-1 AS BIGINT),
       CAST(count(*) AS BIGINT) FROM embeddings
""",
    }


def jl_oracles() -> dict[str, str]:
    """JL sketch: same md5-parity ±1 matrix, reproduced in SQL."""
    from candidategeneration_ray.pipelines.clustering import (
        JL_DIMS, KMEANS_SCALE)

    sign = _H64.format(
        expr="r.r::VARCHAR || '|' || qv.d::VARCHAR")
    return {
        "embedding_jl_sketch": f"""
WITH qv AS MATERIALIZED (
  SELECT vec_id,
         CAST(generate_subscripts(embedding, 1) - 1 AS BIGINT) AS d,
         CAST(trunc(CAST(unnest(embedding) AS DOUBLE) * {KMEANS_SCALE}) AS BIGINT) AS x
  FROM embeddings
),
r AS (SELECT unnest(generate_series(0, {JL_DIMS - 1})) AS r)
SELECT CAST(qv.vec_id AS BIGINT) AS vec_id,
       CAST(r.r AS BIGINT) AS jdim,
       CAST(sum(qv.x * (2 * CAST(({sign}) % 2 AS BIGINT) - 1))
            AS BIGINT) AS value
FROM qv CROSS JOIN r
GROUP BY 1, 2
""",
    }


def token_offset_oracles() -> dict[str, str]:
    """Global token offsets in doc_id order: one window prefix sum."""
    from candidategeneration_ray.pipelines.textlm import SEQ_LEN

    return {
        "token_offsets": f"""
WITH {KEPT_CTE},
tc AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n
       FROM kept GROUP BY doc_id),
o AS (
  SELECT doc_id, n,
         coalesce(sum(n) OVER (ORDER BY doc_id
                               ROWS BETWEEN UNBOUNDED PRECEDING
                               AND 1 PRECEDING), 0) AS token_start
  FROM tc)
SELECT CAST(doc_id AS BIGINT) AS doc_id, n AS n_tokens,
       CAST(token_start AS BIGINT) AS token_start,
       CAST(token_start // {SEQ_LEN} AS BIGINT) AS seq_first,
       CAST((token_start + n - 1) // {SEQ_LEN} AS BIGINT) AS seq_last
FROM o
""",
    }


def tpch_joins2_oracles() -> dict[str, str]:
    """Q7/Q8/Q10/Q21-shaped oracles — integer milli-cent revenue,
    DuckDB round() cents on both sides, tie-breaks on the key column so
    the LIMIT boundary is deterministic."""
    from candidategeneration_ray.pipelines.relational import (
        Q7_NATION_A, Q7_NATION_B, Q7_SHIP_LO, Q7_SHIP_HI,
        Q8_REGION, Q8_NATION, Q8_TYPE, Q8_DATE_LO, Q8_DATE_HI,
        Q10_DATE_LO, Q10_DATE_HI, Q10_TOPK,
        Q21_LATE_DAYS, Q21_TOPK)

    return {
        "volume_shipping": f"""
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       CAST(year(l_shipdate) AS BIGINT) AS l_year,
       CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                * (100 - CAST(round(l_discount * 100) AS BIGINT)))
            AS BIGINT) AS revenue_milli
FROM lineitem
JOIN orders   ON o_orderkey = l_orderkey
JOIN customer ON c_custkey = o_custkey
JOIN supplier ON s_suppkey = l_suppkey
JOIN nation n1 ON n1.n_nationkey = s_nationkey
JOIN nation n2 ON n2.n_nationkey = c_nationkey
WHERE l_shipdate >= TIMESTAMP '{Q7_SHIP_LO}'
  AND l_shipdate <  TIMESTAMP '{Q7_SHIP_HI}'
  AND ((n1.n_name = '{Q7_NATION_A}' AND n2.n_name = '{Q7_NATION_B}')
    OR (n1.n_name = '{Q7_NATION_B}' AND n2.n_name = '{Q7_NATION_A}'))
GROUP BY 1, 2, 3
""",
        "market_share": f"""
WITH rn AS (SELECT n_nationkey FROM nation
            JOIN region ON r_regionkey = n_regionkey
            WHERE r_name = '{Q8_REGION}'),
j AS (
  SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
         CAST(round(l_extendedprice * 100) AS BIGINT)
           * (100 - CAST(round(l_discount * 100) AS BIGINT)) AS rev,
         (s_nationkey = (SELECT n_nationkey FROM nation
                         WHERE n_name = '{Q8_NATION}')) AS is_nat
  FROM lineitem
  JOIN part     ON p_partkey = l_partkey AND p_type = '{Q8_TYPE}'
  JOIN orders   ON o_orderkey = l_orderkey
  JOIN customer ON c_custkey = o_custkey
                AND c_nationkey IN (SELECT n_nationkey FROM rn)
  JOIN supplier ON s_suppkey = l_suppkey
  WHERE o_orderdate >= TIMESTAMP '{Q8_DATE_LO}'
    AND o_orderdate <  TIMESTAMP '{Q8_DATE_HI}')
SELECT o_year,
       CAST(coalesce(sum(CASE WHEN is_nat THEN rev END), 0)
            AS BIGINT) AS national_milli,
       CAST(sum(rev) AS BIGINT) AS total_milli
FROM j GROUP BY 1
""",
        "returned_items": f"""
WITH rev AS (
  SELECT o_custkey AS c_custkey,
         sum(CAST(round(l_extendedprice * 100) AS BIGINT)
             * (100 - CAST(round(l_discount * 100) AS BIGINT)))
           AS revenue_milli
  FROM lineitem JOIN orders ON o_orderkey = l_orderkey
  WHERE l_returnflag = 'R'
    AND o_orderdate >= TIMESTAMP '{Q10_DATE_LO}'
    AND o_orderdate <  TIMESTAMP '{Q10_DATE_HI}'
  GROUP BY 1)
SELECT CAST(c_custkey AS BIGINT) AS c_custkey, c_name, n_name,
       CAST(revenue_milli AS BIGINT) AS revenue_milli
FROM rev
JOIN customer USING (c_custkey)
JOIN nation ON n_nationkey = c_nationkey
ORDER BY revenue_milli DESC, c_custkey
LIMIT {Q10_TOPK}
""",
        "waiting_suppliers": f"""
WITH fo AS (SELECT o_orderkey, o_orderdate FROM orders
            WHERE o_orderstatus = 'F'),
ls AS (SELECT l_orderkey, l_suppkey, max(l_shipdate) AS ms
       FROM lineitem GROUP BY 1, 2),
j AS (SELECT l_orderkey, l_suppkey,
             (ms > o_orderdate + INTERVAL {Q21_LATE_DAYS} DAY) AS late
      FROM ls JOIN fo ON o_orderkey = l_orderkey),
ag AS (SELECT l_orderkey, count(*) AS n_supp,
              sum(CASE WHEN late THEN 1 ELSE 0 END) AS n_late
       FROM j GROUP BY 1)
SELECT CAST(l_suppkey AS BIGINT) AS s_suppkey, s_name,
       CAST(count(*) AS BIGINT) AS numwait
FROM j
JOIN ag USING (l_orderkey)
JOIN supplier ON supplier.s_suppkey = l_suppkey
WHERE j.late AND ag.n_supp >= 2 AND ag.n_late = 1
GROUP BY 1, 2
ORDER BY numwait DESC, s_suppkey
LIMIT {Q21_TOPK}
""",
    }


def pivot_oracles() -> dict[str, str]:
    """Row→column pivot per UTC day: CASE aggregates, integer cents."""
    from candidategeneration_ray.pipelines.events import PIVOT_TYPES

    cols = ",\n  ".join(
        f"CAST(sum(CASE WHEN event_type = '{t}' THEN 1 ELSE 0 END)"
        f" AS BIGINT) AS n_{t}" for t in PIVOT_TYPES)
    return {
        "events_pivot": f"""
SELECT epoch_us(ts) // 86400000000 AS day,
  {cols},
  CAST(sum(CASE WHEN event_type = 'purchase'
                THEN CAST(round(value * 100) AS BIGINT) ELSE 0 END)
       AS BIGINT) AS purchase_cents
FROM events
GROUP BY 1
""",
    }


def topn_group_oracles() -> dict[str, str]:
    """Per-customer top-N orders: the ROW_NUMBER() window shape."""
    from candidategeneration_ray.pipelines.relational import (
        TOPN_PER_CUSTOMER)

    return {
        "top_orders_per_customer": f"""
WITH r AS (
  SELECT o_custkey AS c_custkey, o_orderkey,
         CAST(round(o_totalprice * 100) AS BIGINT) AS total_cents,
         row_number() OVER (
           PARTITION BY o_custkey
           ORDER BY round(o_totalprice * 100) DESC, o_orderkey)
           AS rnk
  FROM orders)
SELECT CAST(c_custkey AS BIGINT) AS c_custkey,
       CAST(rnk AS BIGINT) AS rnk,
       CAST(o_orderkey AS BIGINT) AS o_orderkey, total_cents
FROM r WHERE rnk <= {TOPN_PER_CUSTOMER}
""",
    }


def sequence_manifest_oracles() -> dict[str, str]:
    """Per-sequence manifest: the token_offsets oracle as a derived
    table, expanded with generate_series (one row per (doc, seq) the
    doc overlaps), overlap = least/greatest clip."""
    from candidategeneration_ray.pipelines.textlm import SEQ_LEN

    toff = token_offset_oracles()["token_offsets"]
    return {
        "sequence_manifest": f"""
WITH toff AS ({toff}),
x AS (
  SELECT doc_id, n_tokens, token_start,
         unnest(generate_series(seq_first, seq_last)) AS seq_id
  FROM toff)
SELECT CAST(seq_id AS BIGINT) AS seq_id,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(least(token_start + n_tokens, (seq_id + 1) * {SEQ_LEN})
                - greatest(token_start, seq_id * {SEQ_LEN}))
            AS BIGINT) AS n_tokens,
       CAST(min(doc_id) AS BIGINT) AS first_doc,
       CAST(max(doc_id) AS BIGINT) AS last_doc
FROM x GROUP BY 1
""",
    }


def snapshot_diff_oracles() -> dict[str, str]:
    """Snapshot diff: re-derive version B relationally, FULL OUTER
    join on doc_id, compare TEXT directly (the engine compares md5
    row hashes — same verdicts, so this cross-checks the hash plan
    against the direct comparison)."""
    from candidategeneration_ray.pipelines.extras import SNAP_ADD_BASE

    return {
        "snapshot_diff": f"""
WITH b AS (
  SELECT doc_id,
         CASE WHEN doc_id % 7 = 0 THEN text || ' v2' ELSE text END AS text
  FROM documents WHERE doc_id % 10 <> 0
  UNION ALL
  SELECT {SNAP_ADD_BASE} + doc_id,
         'new version row ' || CAST(doc_id AS VARCHAR)
  FROM documents WHERE doc_id % 13 = 0),
d AS (
  SELECT coalesce(a.doc_id, b.doc_id) AS doc_id,
         CASE WHEN b.doc_id IS NULL THEN 'removed'
              WHEN a.doc_id IS NULL THEN 'added'
              WHEN a.text <> b.text THEN 'changed'
              ELSE 'unchanged' END AS status
  FROM documents a FULL OUTER JOIN b ON a.doc_id = b.doc_id)
SELECT CAST(doc_id AS BIGINT) AS doc_id, status
FROM d WHERE status <> 'unchanged'
""",
    }


def common_neighbor_oracles() -> dict[str, str]:
    """Top non-adjacent kNN pairs by shared-neighbor count: the same
    qv/dist/edges CTEs as the triangle oracle, symmetric adjacency
    self-join, anti join against edges."""
    from candidategeneration_ray.pipelines.clustering import (
        CN_TOPK, KMEANS_SCALE, KNN_K)

    return {
        "common_neighbors": f"""
WITH qv AS MATERIALIZED (
  SELECT vec_id,
         CAST(generate_subscripts(embedding, 1) - 1 AS BIGINT) AS d,
         CAST(trunc(CAST(unnest(embedding) AS DOUBLE) * {KMEANS_SCALE}) AS BIGINT) AS x
  FROM embeddings
),
dist AS (
  SELECT a.vec_id AS vec_id, b.vec_id AS nbr_id,
         sum((a.x - b.x) * (a.x - b.x)) AS d2
  FROM qv a JOIN qv b ON a.d = b.d AND a.vec_id <> b.vec_id
  GROUP BY a.vec_id, b.vec_id
),
rk AS (
  SELECT vec_id, nbr_id,
         row_number() OVER (PARTITION BY vec_id
                            ORDER BY d2 ASC, nbr_id ASC) AS rank
  FROM dist
),
edges AS MATERIALIZED (
  SELECT DISTINCT least(vec_id, nbr_id) AS u, greatest(vec_id, nbr_id) AS v
  FROM rk WHERE rank <= {KNN_K}
),
sadj AS (SELECT u AS x, v AS y FROM edges
         UNION ALL SELECT v, u FROM edges),
cn AS (
  SELECT s1.y AS u, s2.y AS v, CAST(count(*) AS BIGINT) AS n_common
  FROM sadj s1 JOIN sadj s2 ON s1.x = s2.x AND s1.y < s2.y
  GROUP BY 1, 2),
nonadj AS (
  SELECT cn.u, cn.v, cn.n_common
  FROM cn LEFT JOIN edges e ON e.u = cn.u AND e.v = cn.v
  WHERE e.u IS NULL)
SELECT CAST(u AS BIGINT) AS u, CAST(v AS BIGINT) AS v, n_common
FROM nonadj
ORDER BY n_common DESC, u, v
LIMIT {CN_TOPK}
""",
        "kcore_nodes": _kcore_sql(),
        "neighborhood_jaccard": f"""
WITH qv AS MATERIALIZED (
  SELECT vec_id,
         CAST(generate_subscripts(embedding, 1) - 1 AS BIGINT) AS d,
         CAST(trunc(CAST(unnest(embedding) AS DOUBLE) * {KMEANS_SCALE}) AS BIGINT) AS x
  FROM embeddings
),
dist AS (
  SELECT a.vec_id AS vec_id, b.vec_id AS nbr_id,
         sum((a.x - b.x) * (a.x - b.x)) AS d2
  FROM qv a JOIN qv b ON a.d = b.d AND a.vec_id <> b.vec_id
  GROUP BY a.vec_id, b.vec_id
),
rk AS (
  SELECT vec_id, nbr_id,
         row_number() OVER (PARTITION BY vec_id
                            ORDER BY d2 ASC, nbr_id ASC) AS rank
  FROM dist
),
edges AS MATERIALIZED (
  SELECT DISTINCT least(vec_id, nbr_id) AS u, greatest(vec_id, nbr_id) AS v
  FROM rk WHERE rank <= {KNN_K}
),
sadj AS (SELECT u AS x, v AS y FROM edges
         UNION ALL SELECT v, u FROM edges),
deg AS (SELECT x, CAST(count(*) AS BIGINT) AS deg FROM sadj GROUP BY x),
cn AS (
  SELECT s1.y AS u, s2.y AS v, CAST(count(*) AS BIGINT) AS n_common
  FROM sadj s1 JOIN sadj s2 ON s1.x = s2.x AND s1.y < s2.y
  GROUP BY 1, 2),
nonadj AS (
  SELECT cn.u, cn.v, cn.n_common
  FROM cn LEFT JOIN edges e ON e.u = cn.u AND e.v = cn.v
  WHERE e.u IS NULL)
SELECT CAST(n.u AS BIGINT) AS u, CAST(n.v AS BIGINT) AS v, n.n_common,
       CAST(du.deg + dv.deg - n.n_common AS BIGINT) AS n_union
FROM nonadj n
JOIN deg du ON du.x = n.u
JOIN deg dv ON dv.x = n.v
WHERE 4 * n.n_common >= 1 * (du.deg + dv.deg - n.n_common)
""",
    }


def bool_diff_oracles() -> dict[str, str]:
    """AND-NOT retrieval: anchor = min kept query token; EXISTS anchor,
    NOT EXISTS any other kept token."""
    return {
        "bool_diff_docs": f"""
WITH {KEPT_CTE},
{QTOK_CTE},
anchor AS (SELECT query_id, min(tok) AS tok FROM qtok GROUP BY query_id),
others AS (SELECT q.query_id, q.tok FROM qtok q
           JOIN anchor a ON a.query_id = q.query_id AND q.tok <> a.tok),
dt AS (SELECT DISTINCT doc_id, tok FROM kept),
pos AS (SELECT a.query_id, d.doc_id FROM anchor a JOIN dt d USING (tok)),
neg AS (SELECT DISTINCT o.query_id, d.doc_id
        FROM others o JOIN dt d USING (tok))
SELECT CAST(p.query_id AS BIGINT) AS query_id,
       CAST(p.doc_id AS BIGINT) AS doc_id
FROM pos p
LEFT JOIN neg n ON n.query_id = p.query_id AND n.doc_id = p.doc_id
WHERE n.query_id IS NULL
""",
    }


def cube_oracles() -> dict[str, str]:
    """CUBE lattice with the engine's 'ALL' sentinel via coalesce."""
    from candidategeneration_ray.pipelines.relational import CUBE_ALL

    return {
        "orders_cube": f"""
SELECT coalesce(o_orderstatus, '{CUBE_ALL}') AS o_orderstatus,
       coalesce(o_orderpriority, '{CUBE_ALL}') AS o_orderpriority,
       CAST(count(*) AS BIGINT) AS n_orders,
       CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
         AS total_cents
FROM orders
GROUP BY CUBE (o_orderstatus, o_orderpriority)
""",
    }


def path_anomaly_oracles() -> dict[str, str]:
    """Ordered string_agg journeys and the cross-multiplied z² test."""
    from candidategeneration_ray.pipelines.events import ANOMALY_K, PATH_N

    return {
        "user_event_paths": f"""
WITH e AS (
  SELECT user_id, event_type,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY ts, event_id) AS rn,
         count(*) OVER (PARTITION BY user_id) AS n_events
  FROM events)
SELECT CAST(user_id AS BIGINT) AS user_id,
       string_agg(event_type, '>' ORDER BY rn) AS path,
       CAST(max(n_events) AS BIGINT) AS n_events
FROM e WHERE rn <= {PATH_N}
GROUP BY user_id
""",
        "anomalous_days": f"""
WITH d AS (
  SELECT event_type, epoch_us(ts) // 86400000000 AS day,
         CAST(count(*) AS BIGINT) AS c
  FROM events GROUP BY 1, 2),
s AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(c) AS BIGINT) AS S,
             CAST(sum(c * c) AS BIGINT) AS Q
      FROM d GROUP BY 1)
SELECT d.event_type, CAST(d.day AS BIGINT) AS day, d.c AS n_events
FROM d JOIN s USING (event_type)
WHERE (s.n * d.c - s.S) * (s.n * d.c - s.S)
      > {ANOMALY_K * ANOMALY_K} * (s.n * s.Q - s.S * s.S)
""",
    }


def global_rank_oracles() -> dict[str, str]:
    """Global row-number over the full sort, and Hamilton allocation."""
    from candidategeneration_ray.pipelines.relational import STRAT_BUDGET

    return {
        "order_global_rank": """
SELECT CAST(o_orderkey AS BIGINT) AS o_orderkey,
       CAST(round(o_totalprice * 100) AS BIGINT) AS total_cents,
       CAST(row_number() OVER (
              ORDER BY round(o_totalprice * 100) DESC, o_orderkey)
            AS BIGINT) AS rnk
FROM orders
""",
        "stratified_budget": f"""
WITH c AS (SELECT source, CAST(count(*) AS BIGINT) AS n
           FROM documents GROUP BY 1),
t AS (SELECT CAST(sum(n) AS BIGINT) AS tot FROM c),
q AS (SELECT source, n,
             ({STRAT_BUDGET} * n) // t.tot AS base,
             ({STRAT_BUDGET} * n) % t.tot AS rem
      FROM c, t),
r AS (SELECT *, row_number() OVER (ORDER BY rem DESC, source) AS rk
      FROM q),
d AS (SELECT {STRAT_BUDGET} - sum(base) AS extra FROM q)
SELECT source, n AS n_docs,
       CAST(base + CASE WHEN rk <= d.extra THEN 1 ELSE 0 END AS BIGINT)
         AS alloc
FROM r, d
""",
    }


def ab_test_oracles() -> dict[str, str]:
    """Cross-multiplied two-sample test in HUGEINT (engine uses Python
    bigints — both sides exact at any magnitude)."""
    from candidategeneration_ray.pipelines.events import AB_K

    k2 = AB_K * AB_K
    return {
        "ab_test_flags": f"""
WITH e AS (SELECT event_type, user_id % 2 AS arm,
                  CAST(round(value * 100) AS BIGINT) AS c
           FROM events),
g AS (SELECT event_type, arm, CAST(count(*) AS HUGEINT) AS n,
             CAST(sum(c) AS HUGEINT) AS s,
             CAST(sum(c * c) AS HUGEINT) AS q
      FROM e GROUP BY 1, 2),
w AS (SELECT a.event_type,
             a.n AS na, a.s AS sa, a.q AS qa,
             b.n AS nb, b.s AS sb, b.q AS qb
      FROM g a JOIN g b USING (event_type)
      WHERE a.arm = 0 AND b.arm = 1)
SELECT event_type,
       CAST(na AS BIGINT) AS n_a, CAST(nb AS BIGINT) AS n_b,
       CAST(sa AS BIGINT) AS cents_a, CAST(sb AS BIGINT) AS cents_b,
       CAST(CASE WHEN (sa * nb - sb * na) * (sa * nb - sb * na) * na * nb
                      > {k2} * ((na * qa - sa * sa) * nb * nb * nb
                                + (nb * qb - sb * sb) * na * na * na)
                 THEN 1 ELSE 0 END AS BIGINT) AS significant
FROM w
""",
    }


def _bpe_ctes(n_merges: int) -> str:
    """Chained BPE rounds: per round a pair-count aggregate, the argmax
    pair, and a recursive leftmost-non-overlap merge walk (each word's
    walker advances one symbol per recursion step, skipping two on a
    match) — mirroring textlm.q_bpe_merges round for round."""
    parts = [f"""v0 AS MATERIALIZED (
  SELECT tok AS word, CAST(count(*) AS BIGINT) AS freq,
         regexp_extract_all(tok, '.') AS s
  FROM kept GROUP BY tok)"""]
    for r in range(n_merges):
        parts.append(f"""p{r} AS (
  SELECT s[i] AS l, s[i + 1] AS r2, sum(freq) AS n
  FROM (SELECT freq, s, unnest(range(1, len(s))) AS i FROM v{r})
  GROUP BY 1, 2),
top{r} AS MATERIALIZED (
  SELECT l, r2, n FROM p{r} ORDER BY n DESC, l ASC, r2 ASC LIMIT 1),
walk{r} AS (
  SELECT word, CAST(1 AS BIGINT) AS i, CAST([] AS VARCHAR[]) AS acc
  FROM v{r}
  UNION ALL
  SELECT w.word,
         CASE WHEN w.i < len(v.s) AND v.s[w.i] = t.l
                   AND v.s[w.i + 1] = t.r2
              THEN w.i + 2 ELSE w.i + 1 END,
         list_append(w.acc,
           CASE WHEN w.i < len(v.s) AND v.s[w.i] = t.l
                     AND v.s[w.i + 1] = t.r2
                THEN t.l || t.r2 ELSE v.s[w.i] END)
  FROM walk{r} w JOIN v{r} v USING (word) CROSS JOIN top{r} t
  WHERE w.i <= len(v.s)),
v{r + 1} AS MATERIALIZED (
  SELECT w.word, v.freq, w.acc AS s
  FROM walk{r} w JOIN v{r} v USING (word)
  WHERE w.i = len(v.s) + 1)""")
    return ",\n".join(parts)


def bpe_oracles() -> dict[str, str]:
    """BPE trainer oracles — merges replayed as recursive-CTE rounds."""
    from candidategeneration_ray.pipelines.textlm import BPE_MERGES

    merge_rows = "\nUNION ALL\n".join(
        f"SELECT CAST({r} AS BIGINT) AS step, l AS \"left\", "
        f"r2 AS \"right\", CAST(n AS BIGINT) AS pair_n FROM top{r}"
        for r in range(BPE_MERGES))
    return {
        "bpe_merges": f"""
WITH RECURSIVE {KEPT_CTE},
{_bpe_ctes(BPE_MERGES)}
{merge_rows}
""",
        "bpe_segmented": f"""
WITH RECURSIVE {KEPT_CTE},
{_bpe_ctes(BPE_MERGES)}
SELECT word, freq, array_to_string(s, ' ') AS segmented,
       CAST(len(s) AS BIGINT) AS n_syms
FROM v{BPE_MERGES}
""",
    }


def session11_oracles() -> dict[str, str]:
    """Session-11 entries: BM25F fielded retrieval (and friends added
    later this session)."""
    from candidategeneration_ray.pipelines.docquery import (
        BM25F_HEAD, BM25F_WEIGHT)
    from candidategeneration_ray.pipelines.extras import PPS_SAMPLE_K
    from candidategeneration_ray.pipelines.clustering import (
        KMEANS_SCALE as _KMEANS_SCALE, KNN_K as _KNN_K)

    w1 = BM25F_WEIGHT - 1  # extra copies of each head-field occurrence
    fielded_scores = f"""
ftf AS (SELECT doc_id, tok,
               CAST(count(*) + {w1} * count(*) FILTER (WHERE kpos <= {BM25F_HEAD})
                    AS DOUBLE) AS tf
        FROM kept GROUP BY doc_id, tok),
fdl AS (SELECT doc_id,
               CAST(count(*) + {w1} * least(count(*), {BM25F_HEAD}) AS DOUBLE) AS dl
        FROM kept GROUP BY doc_id),
fmx AS (SELECT doc_id, max(tf) AS maxtf FROM ftf GROUP BY doc_id),
fdft AS (SELECT tok, CAST(count(*) AS DOUBLE) AS df FROM ftf GROUP BY tok),
fgs AS (SELECT (SELECT CAST(count(*) AS BIGINT) FROM documents) AS n_docs,
               (SELECT CAST(coalesce(sum(CAST(dl AS BIGINT)), 0) AS BIGINT)
                FROM fdl) AS total_tokens),
fgs2 AS (SELECT CAST(n_docs AS DOUBLE) AS nd,
                CAST(total_tokens // n_docs AS DOUBLE) AS avgdl FROM fgs),
fscores AS MATERIALIZED (
  SELECT ftf.doc_id, ftf.tok,
         CAST(trunc(
           ln((nd - df + 0.5) / (df + 0.5))
           * (0.5 + 0.5 * tf / maxtf)
           * (1.6 + 1.0)
           / ((0.5 + 0.5 * tf / maxtf) + 1.6 * (1 - 0.75 + 0.75 * dl / avgdl))
           * 10000000
         ) AS BIGINT) AS score
  FROM ftf
  JOIN fdl USING (doc_id)
  JOIN fmx USING (doc_id)
  JOIN fdft USING (tok)
  CROSS JOIN fgs2
)
"""
    return {
        # BM25F: weighted tf' = tf + (W-1)*tf_head, dl' = dl +
        # (W-1)*min(dl, H); df/presence unchanged — then the standard
        # quantized BM25 formula over the fielded quantities.
        "bm25f_topk": f"""
WITH {KEPT_CTE},
{fielded_scores},
{QTOK_CTE},
qscores AS MATERIALIZED (
  SELECT q.query_id, s.doc_id, CAST(sum(s.score) AS BIGINT) AS score
  FROM qtok q JOIN fscores s USING (tok)
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
        # systematic PPS sampling: select docs whose weight interval
        # (in doc_id layout order) contains a multiple of step = W//k
        "pps_sample": f"""
WITH cum AS (
  SELECT doc_id, CAST(n_chars AS BIGINT) AS n_chars,
         CAST(sum(n_chars) OVER (ORDER BY doc_id
                                 ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_chars
  FROM documents
),
par AS (SELECT greatest(1, CAST(sum(n_chars) AS BIGINT) // {PPS_SAMPLE_K}) AS step
        FROM documents)
SELECT doc_id, n_chars, cum_chars
FROM cum, par
WHERE cum_chars // step > (cum_chars - n_chars) // step
""",
        # SCD2: per-user 'view' events set the segment; no-op changes
        # collapse; valid_to = next version's ts, -1 sentinel when open
        "scd2_dim": """
WITH ch AS (
  SELECT user_id, ts, event_id,
         CAST(regexp_extract(props, '"k":\\s*(-?\\d+)', 1) AS BIGINT) AS segment
  FROM events WHERE event_type = 'view'
),
dedup AS (
  SELECT user_id, ts, event_id, segment FROM (
    SELECT user_id, ts, event_id, segment,
           lag(segment) OVER (PARTITION BY user_id
                              ORDER BY ts, event_id) AS prev
    FROM ch)
  WHERE prev IS NULL OR segment <> prev
)
SELECT CAST(user_id AS BIGINT) AS user_id,
       CAST(epoch_us(ts) AS BIGINT) AS valid_from_us,
       CAST(coalesce(epoch_us(lead(ts) OVER (PARTITION BY user_id
                                             ORDER BY ts, event_id)), -1)
            AS BIGINT) AS valid_to_us,
       segment
FROM dedup
""",
        # linear multi-touch attribution: purchase cents split equally
        # over the user's clicks/views in [ts-7d, ts], remainder to the
        # earliest touches; exact integer credits per touch
        "attribution_linear": """
WITH p AS (
  SELECT event_id AS pid, user_id, ts,
         CAST(round(value * 100) AS BIGINT) AS cents
  FROM events WHERE event_type = 'purchase'
),
t AS (
  SELECT event_id, user_id, event_type, ts
  FROM events WHERE event_type IN ('click', 'view')
),
pairs AS (
  SELECT p.pid, p.cents, t.event_id, t.user_id, t.event_type,
         CAST(count(*) OVER (PARTITION BY p.pid) AS BIGINT) AS n,
         CAST(row_number() OVER (PARTITION BY p.pid
                                 ORDER BY t.ts, t.event_id) AS BIGINT) AS r
  FROM p JOIN t ON t.user_id = p.user_id
              AND t.ts >= p.ts - INTERVAL 7 DAY AND t.ts <= p.ts
)
SELECT event_id, CAST(user_id AS BIGINT) AS user_id, event_type,
       CAST(count(*) AS BIGINT) AS n_purchases,
       CAST(sum(cents // n + CASE WHEN r <= cents % n THEN 1 ELSE 0 END)
            AS BIGINT) AS credit_cents
FROM pairs
GROUP BY event_id, user_id, event_type
""",
        # mutual kNN: intersection of the directed kNN graph with its
        # transpose (same quantized integer L2 as the knn_graph oracle)
        "mutual_knn": f"""
WITH qv AS MATERIALIZED (
  SELECT vec_id,
         CAST(generate_subscripts(embedding, 1) - 1 AS BIGINT) AS d,
         CAST(trunc(CAST(unnest(embedding) AS DOUBLE) * {_KMEANS_SCALE})
              AS BIGINT) AS x
  FROM embeddings
),
dist AS (
  SELECT a.vec_id AS vec_id, b.vec_id AS nbr_id,
         sum((a.x - b.x) * (a.x - b.x)) AS d2
  FROM qv a JOIN qv b ON a.d = b.d AND a.vec_id <> b.vec_id
  GROUP BY a.vec_id, b.vec_id
),
g AS (
  SELECT vec_id, nbr_id, d2 FROM (
    SELECT vec_id, nbr_id, d2,
           row_number() OVER (PARTITION BY vec_id
                              ORDER BY d2 ASC, nbr_id ASC) AS rank
    FROM dist
  ) WHERE rank <= {_KNN_K}
)
SELECT CAST(x.vec_id AS BIGINT) AS a, CAST(x.nbr_id AS BIGINT) AS b,
       CAST(x.d2 AS BIGINT) AS d2
FROM g x JOIN g y ON x.vec_id = y.nbr_id AND x.nbr_id = y.vec_id
WHERE x.vec_id < x.nbr_id
""",
    }


def session12_oracles() -> dict[str, str]:
    """Session-12 entries: coreset selection, density clustering,
    hashed text embeddings, training-data mining."""
    from candidategeneration_ray.pipelines.clustering import (
        KCENTER_K, KMEANS_SCALE)

    qv = f"""qv AS MATERIALIZED (
  SELECT vec_id,
         CAST(generate_subscripts(embedding, 1) - 1 AS BIGINT) AS d,
         CAST(trunc(CAST(unnest(embedding) AS DOUBLE) * {KMEANS_SCALE})
              AS BIGINT) AS x
  FROM embeddings
)"""

    # greedy k-center: unrolled farthest-point rounds; each round's
    # min-dist scan excludes already-chosen ids exactly as the engine's
    # per-batch mask does (duplicate vectors would otherwise re-pick)
    kc_parts = [qv, """ch0 AS (
  SELECT CAST(0 AS BIGINT) AS r,
         (SELECT min(vec_id) FROM embeddings) AS vec_id,
         CAST(0 AS BIGINT) AS d2)"""]
    for i in range(1, KCENTER_K):
        kc_parts.append(f"""m{i} AS MATERIALIZED (
  SELECT vec_id, min(d2) AS d2 FROM (
    SELECT q.vec_id, p.vec_id AS cid,
           sum((q.x - p.x) * (q.x - p.x)) AS d2
    FROM qv q
    JOIN qv p ON p.d = q.d AND p.vec_id IN (SELECT vec_id FROM ch{i - 1})
    WHERE q.vec_id NOT IN (SELECT vec_id FROM ch{i - 1})
    GROUP BY q.vec_id, p.vec_id
  ) GROUP BY vec_id
),
ch{i} AS (
  SELECT * FROM ch{i - 1}
  UNION ALL
  SELECT CAST({i} AS BIGINT) AS r, vec_id, d2
  FROM (SELECT vec_id, d2 FROM m{i} ORDER BY d2 DESC, vec_id ASC LIMIT 1)
)""")
    kc_ctes = ",\n".join(kc_parts)

    from candidategeneration_ray.pipelines.clustering import (
        DBSCAN_EPS2, DBSCAN_MIN_PTS)
    from candidategeneration_ray.pipelines.extras import HASH_DIM, _SIGN_BIT
    from candidategeneration_ray.pipelines.textlm import (
        BENCH_MOD as _SC_MOD, DECON_W as _SC_W)
    from candidategeneration_ray.pipelines.relational import (
        DOMINANT_SUPP_MULT as _DOM_MULT, IMPORTANT_PART_PPM as _IMP_PPM)
    from candidategeneration_ray.pipelines.extras import (
        K_ANON as _KA_K, K_ANON_CHAR_BUCKET as _KA_BUCKET)
    from candidategeneration_ray.pipelines.extras import (
        MIXED_CHUNK_WORDS as _MIX_CHUNK)
    from candidategeneration_ray.pipelines.events import MAD_K as _MAD_K
    from candidategeneration_ray.pipelines.positional import LMD_MU as _LMD_MU
    from candidategeneration_ray.pipelines.events import ACF_MAX_LAG as _ACF_LAG
    from candidategeneration_ray.pipelines.events import FORECAST_LAG as _FC_LAG
    from candidategeneration_ray.pipelines.docquery import LTR_WEIGHTS

    _LTR_SQL = ltr_oracles()["ltr_features"]
    _LTR_EXPR = " + ".join(
        f"({w}) * {c}" for c, w in LTR_WEIGHTS.items())
    _BM25_SQL = core_oracles()["bm25_topk"]
    _SDM_SQL = sdm_oracles()["sdm_topk"]
    _LSH_SQL = extras_oracles()["minhash_lsh_pairs"]
    _TS_SQL = extras_oracles()["text_stats"]
    _LMD_SQL = f"""
WITH {KEPT_CTE},
{QTOK_CTE},
tf AS (SELECT doc_id, tok, CAST(count(*) AS BIGINT) AS tf
       FROM kept GROUP BY doc_id, tok),
dl AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS dl
       FROM kept GROUP BY doc_id),
cf AS (SELECT tok, CAST(count(*) AS BIGINT) AS cf FROM kept GROUP BY tok),
tot AS (SELECT CAST(count(*) AS BIGINT) AS t FROM kept),
qterms AS (SELECT q.query_id, q.tok, c.cf FROM qtok q JOIN cf c USING (tok)),
cand AS (
  SELECT DISTINCT q.query_id, t.doc_id
  FROM qterms q JOIN tf t USING (tok)
),
parts AS (
  SELECT c.query_id, c.doc_id,
         CAST(trunc(
           ln((CAST(coalesce(t.tf, 0) AS DOUBLE)
               + {_LMD_MU} * (CAST(q.cf AS DOUBLE) / CAST(tot.t AS DOUBLE)))
              / (CAST(dl.dl AS DOUBLE) + {_LMD_MU}))
           * 10000000) AS BIGINT) AS s
  FROM cand c
  JOIN qterms q ON q.query_id = c.query_id
  LEFT JOIN tf t ON t.doc_id = c.doc_id AND t.tok = q.tok
  JOIN dl ON dl.doc_id = c.doc_id
  CROSS JOIN tot
),
sc AS (SELECT query_id, doc_id, CAST(sum(s) AS BIGINT) AS score
       FROM parts GROUP BY query_id, doc_id)
SELECT query_id, CAST(rn AS BIGINT) AS rank, doc_id, score FROM (
  SELECT query_id, doc_id, score,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY score DESC, doc_id ASC) AS rn
  FROM sc
) WHERE rn <= 10
"""
    _MAXP_SQL = f"""
WITH {KEPT_CTE},
{QTOK_CTE},
ch AS MATERIALIZED (
  SELECT doc_id * 1024 + (kpos - 1) // 32 AS cid, tok FROM kept
),
ctf AS (SELECT cid, tok, CAST(count(*) AS DOUBLE) AS tf FROM ch GROUP BY cid, tok),
cdl AS (SELECT cid, CAST(count(*) AS DOUBLE) AS dl FROM ch GROUP BY cid),
cmx AS (SELECT cid, max(tf) AS maxtf FROM ctf GROUP BY cid),
cdf AS (SELECT tok, CAST(count(*) AS DOUBLE) AS df FROM ctf GROUP BY tok),
cgs AS (SELECT (SELECT CAST(count(DISTINCT cid) AS BIGINT) FROM ch) AS n_docs,
               (SELECT CAST(count(*) AS BIGINT) FROM ch) AS total_tokens),
cgs2 AS (SELECT CAST(n_docs AS DOUBLE) AS nd,
                CAST(total_tokens // n_docs AS DOUBLE) AS avgdl FROM cgs),
cscores AS MATERIALIZED (
  SELECT ctf.cid, ctf.tok,
         CAST(trunc(
           ln((nd - df + 0.5) / (df + 0.5))
           * (0.5 + 0.5 * tf / maxtf)
           * (1.6 + 1.0)
           / ((0.5 + 0.5 * tf / maxtf) + 1.6 * (1 - 0.75 + 0.75 * dl / avgdl))
           * 10000000
         ) AS BIGINT) AS score
  FROM ctf
  JOIN cdl USING (cid)
  JOIN cmx USING (cid)
  JOIN cdf USING (tok)
  CROSS JOIN cgs2
),
qch AS (
  SELECT q.query_id, s.cid, CAST(sum(s.score) AS BIGINT) AS score
  FROM qtok q JOIN cscores s USING (tok)
  GROUP BY q.query_id, s.cid
),
docmax AS (
  SELECT query_id, cid // 1024 AS doc_id, max(score) AS score
  FROM qch GROUP BY query_id, cid // 1024
)
SELECT query_id, rank, CAST(doc_id AS BIGINT) AS doc_id, score FROM (
  SELECT query_id,
         CAST(row_number() OVER (PARTITION BY query_id
                                 ORDER BY score DESC, doc_id ASC)
              AS BIGINT) AS rank,
         doc_id, score
  FROM docmax
) WHERE rank <= 10
"""

    ht = _H64.format(expr="tok")
    hv = f"""toks AS (
  SELECT doc_id, tok, CAST(count(*) AS BIGINT) AS tf
  FROM kept GROUP BY doc_id, tok
),
dv AS (
  SELECT doc_id, CAST({ht} % {HASH_DIM} AS BIGINT) AS dim,
         sum(CASE WHEN ({ht} >> {_SIGN_BIT}) & 1 = 1
                  THEN -tf ELSE tf END) AS val
  FROM toks GROUP BY doc_id, dim
)"""

    return {
        "kcenter_coreset": f"""
WITH {kc_ctes}
SELECT r AS "round", CAST(vec_id AS BIGINT) AS vec_id, d2
FROM ch{KCENTER_K - 1}
""",
        # DBSCAN: eps-pairs -> degree coreness -> CC over the core-core
        # subgraph (recursive reachability, min-core-id label) -> border
        # = min core-neighbor cluster; noise -1. Mirrors the engine's
        # deterministic border rule exactly.
        # hashing-trick embeddings: signed-tf scatter of md5 token
        # hashes into HASH_DIM dims; the string itself is the vector
        "hashed_embeddings": f"""
WITH {KEPT_CTE},
{hv}
SELECT CAST(doc_id AS BIGINT) AS doc_id, dim, CAST(val AS BIGINT) AS val
FROM dv WHERE val <> 0
""",
        # MIPS over the hashed vectors: distinct query tokens weight 1,
        # integer dot > 0, (dot desc, doc_id asc) top-10 — collisions
        # and sign cancellation reproduced exactly
        "hashed_mips_top10": f"""
WITH {KEPT_CTE},
{QTOK_CTE},
{hv},
qv AS (
  SELECT query_id, CAST({ht} % {HASH_DIM} AS BIGINT) AS dim,
         sum(CASE WHEN ({ht} >> {_SIGN_BIT}) & 1 = 1 THEN -1 ELSE 1 END) AS val
  FROM qtok GROUP BY query_id, dim
),
dots AS (
  SELECT q.query_id, d.doc_id, sum(q.val * d.val) AS dot
  FROM qv q JOIN dv d USING (dim)
  GROUP BY q.query_id, d.doc_id
  HAVING sum(q.val * d.val) > 0
)
SELECT query_id, CAST(rn AS BIGINT) AS rank,
       CAST(doc_id AS BIGINT) AS doc_id, CAST(dot AS BIGINT) AS dot
FROM (
  SELECT query_id, doc_id, dot,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY dot DESC, doc_id ASC) AS rn
  FROM dots
) WHERE rn <= 10
""",
        # hard-negative triples: positives (rank<=3) x negatives
        # (ranks 11..20) of the same exact BM25 ranking, integer margin
        "hard_negatives": f"""
WITH {KEPT_CTE},
{SCORES_CTE},
{QTOK_CTE},
qscores AS MATERIALIZED (
  SELECT q.query_id, s.doc_id, CAST(sum(s.score) AS BIGINT) AS score
  FROM qtok q JOIN scores s USING (tok)
  GROUP BY q.query_id, s.doc_id
),
ranked AS (
  SELECT query_id,
         CAST(row_number() OVER (PARTITION BY query_id
                                 ORDER BY score DESC, doc_id ASC)
              AS BIGINT) AS rank,
         doc_id, score
  FROM qscores
)
SELECT p.query_id, p.rank AS pos_rank, n.rank AS neg_rank,
       p.doc_id AS pos_doc_id, n.doc_id AS neg_doc_id,
       p.score - n.score AS margin
FROM ranked p
JOIN ranked n ON n.query_id = p.query_id
WHERE p.rank <= 3 AND n.rank BETWEEN 11 AND 20
""",
        # MaxP passage retrieval: re-derive BM25 over 32-token chunks
        # (chunk = passage-doc: own tf/maxtf/dl/df/N/avgdl), doc score =
        # max chunk score, top-10 by (score desc, doc_id asc)
        "passage_bm25_topk": _MAXP_SQL,
        # greedy set cover of the benchmark shingle universe:
        # unrolled rounds; a round's gains count only still-uncovered
        # shingles, the engine's zero-gain stop = empty g{i}
        "set_cover_select": f"""
WITH {KEPT_CTE},
{_DOCS_TOKS},
{_shingle_cte(_SC_W)},
bench AS MATERIALIZED (SELECT DISTINCT h FROM sh WHERE doc_id % {_SC_MOD} = 0),
cand AS MATERIALIZED (
  SELECT s.doc_id, s.h FROM sh s JOIN bench USING (h)
  WHERE s.doc_id % {_SC_MOD} <> 0
),
sel0 AS (SELECT CAST(NULL AS BIGINT) AS r, CAST(NULL AS BIGINT) AS doc_id,
                CAST(NULL AS BIGINT) AS gain WHERE 1 = 0),
g1 AS MATERIALIZED (
  SELECT c.doc_id, CAST(count(*) AS BIGINT) AS gain
  FROM cand c
  WHERE c.doc_id NOT IN (SELECT doc_id FROM sel0)
    AND c.h NOT IN (SELECT c2.h FROM cand c2
                    JOIN sel0 s ON s.doc_id = c2.doc_id)
  GROUP BY c.doc_id
),
p1 AS (SELECT doc_id, gain FROM g1 ORDER BY gain DESC, doc_id ASC LIMIT 1),
sel1 AS (SELECT * FROM sel0
           UNION ALL SELECT CAST(1 AS BIGINT), doc_id, gain FROM p1),
g2 AS MATERIALIZED (
  SELECT c.doc_id, CAST(count(*) AS BIGINT) AS gain
  FROM cand c
  WHERE c.doc_id NOT IN (SELECT doc_id FROM sel1)
    AND c.h NOT IN (SELECT c2.h FROM cand c2
                    JOIN sel1 s ON s.doc_id = c2.doc_id)
  GROUP BY c.doc_id
),
p2 AS (SELECT doc_id, gain FROM g2 ORDER BY gain DESC, doc_id ASC LIMIT 1),
sel2 AS (SELECT * FROM sel1
           UNION ALL SELECT CAST(2 AS BIGINT), doc_id, gain FROM p2),
g3 AS MATERIALIZED (
  SELECT c.doc_id, CAST(count(*) AS BIGINT) AS gain
  FROM cand c
  WHERE c.doc_id NOT IN (SELECT doc_id FROM sel2)
    AND c.h NOT IN (SELECT c2.h FROM cand c2
                    JOIN sel2 s ON s.doc_id = c2.doc_id)
  GROUP BY c.doc_id
),
p3 AS (SELECT doc_id, gain FROM g3 ORDER BY gain DESC, doc_id ASC LIMIT 1),
sel3 AS (SELECT * FROM sel2
           UNION ALL SELECT CAST(3 AS BIGINT), doc_id, gain FROM p3),
g4 AS MATERIALIZED (
  SELECT c.doc_id, CAST(count(*) AS BIGINT) AS gain
  FROM cand c
  WHERE c.doc_id NOT IN (SELECT doc_id FROM sel3)
    AND c.h NOT IN (SELECT c2.h FROM cand c2
                    JOIN sel3 s ON s.doc_id = c2.doc_id)
  GROUP BY c.doc_id
),
p4 AS (SELECT doc_id, gain FROM g4 ORDER BY gain DESC, doc_id ASC LIMIT 1),
sel4 AS (SELECT * FROM sel3
           UNION ALL SELECT CAST(4 AS BIGINT), doc_id, gain FROM p4),
g5 AS MATERIALIZED (
  SELECT c.doc_id, CAST(count(*) AS BIGINT) AS gain
  FROM cand c
  WHERE c.doc_id NOT IN (SELECT doc_id FROM sel4)
    AND c.h NOT IN (SELECT c2.h FROM cand c2
                    JOIN sel4 s ON s.doc_id = c2.doc_id)
  GROUP BY c.doc_id
),
p5 AS (SELECT doc_id, gain FROM g5 ORDER BY gain DESC, doc_id ASC LIMIT 1),
sel5 AS (SELECT * FROM sel4
           UNION ALL SELECT CAST(5 AS BIGINT), doc_id, gain FROM p5),
g6 AS MATERIALIZED (
  SELECT c.doc_id, CAST(count(*) AS BIGINT) AS gain
  FROM cand c
  WHERE c.doc_id NOT IN (SELECT doc_id FROM sel5)
    AND c.h NOT IN (SELECT c2.h FROM cand c2
                    JOIN sel5 s ON s.doc_id = c2.doc_id)
  GROUP BY c.doc_id
),
p6 AS (SELECT doc_id, gain FROM g6 ORDER BY gain DESC, doc_id ASC LIMIT 1),
sel6 AS (SELECT * FROM sel5
           UNION ALL SELECT CAST(6 AS BIGINT), doc_id, gain FROM p6),
g7 AS MATERIALIZED (
  SELECT c.doc_id, CAST(count(*) AS BIGINT) AS gain
  FROM cand c
  WHERE c.doc_id NOT IN (SELECT doc_id FROM sel6)
    AND c.h NOT IN (SELECT c2.h FROM cand c2
                    JOIN sel6 s ON s.doc_id = c2.doc_id)
  GROUP BY c.doc_id
),
p7 AS (SELECT doc_id, gain FROM g7 ORDER BY gain DESC, doc_id ASC LIMIT 1),
sel7 AS (SELECT * FROM sel6
           UNION ALL SELECT CAST(7 AS BIGINT), doc_id, gain FROM p7),
g8 AS MATERIALIZED (
  SELECT c.doc_id, CAST(count(*) AS BIGINT) AS gain
  FROM cand c
  WHERE c.doc_id NOT IN (SELECT doc_id FROM sel7)
    AND c.h NOT IN (SELECT c2.h FROM cand c2
                    JOIN sel7 s ON s.doc_id = c2.doc_id)
  GROUP BY c.doc_id
),
p8 AS (SELECT doc_id, gain FROM g8 ORDER BY gain DESC, doc_id ASC LIMIT 1),
sel8 AS (SELECT * FROM sel7
           UNION ALL SELECT CAST(8 AS BIGINT), doc_id, gain FROM p8),
g9 AS MATERIALIZED (
  SELECT c.doc_id, CAST(count(*) AS BIGINT) AS gain
  FROM cand c
  WHERE c.doc_id NOT IN (SELECT doc_id FROM sel8)
    AND c.h NOT IN (SELECT c2.h FROM cand c2
                    JOIN sel8 s ON s.doc_id = c2.doc_id)
  GROUP BY c.doc_id
),
p9 AS (SELECT doc_id, gain FROM g9 ORDER BY gain DESC, doc_id ASC LIMIT 1),
sel9 AS (SELECT * FROM sel8
           UNION ALL SELECT CAST(9 AS BIGINT), doc_id, gain FROM p9),
g10 AS MATERIALIZED (
  SELECT c.doc_id, CAST(count(*) AS BIGINT) AS gain
  FROM cand c
  WHERE c.doc_id NOT IN (SELECT doc_id FROM sel9)
    AND c.h NOT IN (SELECT c2.h FROM cand c2
                    JOIN sel9 s ON s.doc_id = c2.doc_id)
  GROUP BY c.doc_id
),
p10 AS (SELECT doc_id, gain FROM g10 ORDER BY gain DESC, doc_id ASC LIMIT 1),
sel10 AS (SELECT * FROM sel9
           UNION ALL SELECT CAST(10 AS BIGINT), doc_id, gain FROM p10)
SELECT r AS "round", doc_id, gain,
       sum(gain) OVER (ORDER BY r) AS covered_total
FROM sel10
""",
        # LTR rerank: compose the feature oracle verbatim, apply the
        # SAME integer weight vector, re-rank the pool
        "ltr_rerank_topk": f"""
WITH feat AS ({_LTR_SQL})
SELECT query_id, CAST(rn AS BIGINT) AS rank, doc_id, ltr_score FROM (
  SELECT query_id, doc_id, ltr_score,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY ltr_score DESC, doc_id ASC) AS rn
  FROM (SELECT query_id, doc_id, {_LTR_EXPR} AS ltr_score FROM feat)
) WHERE rn <= 10
""",
        # prefix-agreement between the doc-level and passage rankings:
        # both ranking oracles composed verbatim, intersected per depth
        "ranking_agreement": f"""
WITH a AS ({_BM25_SQL}),
b AS ({_MAXP_SQL}),
qs2 AS (SELECT DISTINCT query_id FROM (SELECT query_id FROM a
                                       UNION ALL SELECT query_id FROM b)),
depths AS (SELECT CAST(unnest(range(1, 11)) AS BIGINT) AS depth)
SELECT q.query_id, d.depth,
       CAST((SELECT count(*) FROM a
             JOIN b ON b.query_id = a.query_id AND b.doc_id = a.doc_id
             WHERE a.query_id = q.query_id
               AND a.rank <= d.depth AND b.rank <= d.depth)
            AS BIGINT) AS n_common
FROM qs2 q CROSS JOIN depths d
""",
        # SQ8 ANN: per-dim global [min,max] -> 0..255 floor-div codes,
        # MIN symmetric squared L2 in code space vs vec 0, top-10
        "ann_sq8_top10": f"""
WITH {qv},
mm AS (SELECT d, min(x) AS mn, max(x) AS mx FROM qv GROUP BY d),
codes AS MATERIALIZED (
  SELECT vec_id, qv.d,
         CASE WHEN mx > mn THEN ((x - mn) * 255) // (mx - mn)
              ELSE 0 END AS c
  FROM qv JOIN mm USING (d)
),
qc AS (SELECT d, c FROM codes WHERE vec_id = 0),
dists AS (
  SELECT codes.vec_id,
         CAST(sum((codes.c - qc.c) * (codes.c - qc.c)) AS BIGINT) AS d2
  FROM codes JOIN qc USING (d) GROUP BY codes.vec_id
)
SELECT CAST(rn AS BIGINT) AS rank, CAST(vec_id AS BIGINT) AS vec_id, d2
FROM (
  SELECT vec_id, d2,
         row_number() OVER (ORDER BY d2 ASC, vec_id ASC) AS rn
  FROM dists
) WHERE rn <= 10
""",
        # MAD robust outliers: doubled-integer medians (lo+hi order
        # stats), deviations doubled again, flag 2*dev2 > k*mad4
        "mad_outlier_days": f"""
WITH ec AS MATERIALIZED (
  SELECT event_type, CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS day,
         CAST(count(*) AS BIGINT) AS n_events
  FROM events GROUP BY event_type, day
),
st AS (
  SELECT event_type, n_events,
         row_number() OVER (PARTITION BY event_type ORDER BY n_events) AS rn,
         count(*) OVER (PARTITION BY event_type) AS n
  FROM ec
),
med AS (
  SELECT event_type,
         sum(CASE WHEN rn = (n - 1) // 2 + 1 THEN n_events ELSE 0 END)
       + sum(CASE WHEN rn = n // 2 + 1 THEN n_events ELSE 0 END) AS med2
  FROM st GROUP BY event_type
),
dev AS (
  SELECT e.event_type, e.day, e.n_events,
         abs(2 * e.n_events - m.med2) AS dev2
  FROM ec e JOIN med m USING (event_type)
),
dst AS (
  SELECT event_type, dev2,
         row_number() OVER (PARTITION BY event_type ORDER BY dev2) AS rn,
         count(*) OVER (PARTITION BY event_type) AS n
  FROM dev
),
mad AS (
  SELECT event_type,
         sum(CASE WHEN rn = (n - 1) // 2 + 1 THEN dev2 ELSE 0 END)
       + sum(CASE WHEN rn = n // 2 + 1 THEN dev2 ELSE 0 END) AS mad4
  FROM dst GROUP BY event_type
)
SELECT d.event_type, d.day, d.n_events,
       CAST(d.dev2 AS BIGINT) AS dev2, CAST(m.mad4 AS BIGINT) AS mad4
FROM dev d JOIN mad m USING (event_type)
WHERE 2 * d.dev2 > {_MAD_K} * m.mad4
""",
        # elastic reshard plan-equivalence: serving from the re-bucketed
        # layout must equal the plain BM25 oracle bit for bit
        "resharded_bm25_topk": _BM25_SQL,
        # Q11 shape: fraction-of-global-revenue HAVING, decorrelated
        "important_parts": f"""
WITH pr AS MATERIALIZED (
  SELECT l_partkey AS p_partkey,
         CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                  * (100 - CAST(round(l_discount * 100) AS BIGINT)))
              AS BIGINT) AS revenue_milli
  FROM lineitem GROUP BY l_partkey
)
SELECT p_partkey, revenue_milli FROM pr
WHERE revenue_milli * 1000000 > (SELECT sum(revenue_milli) FROM pr) * {_IMP_PPM}
""",
        # Q16 shape: grouped COUNT DISTINCT over a join with an
        # anti-filtered supplier set (negative balance = complaints)
        "part_supplier_counts": f"""
SELECT p.p_brand, CAST(p.p_size AS BIGINT) AS p_size,
       CAST(count(DISTINCT l.l_suppkey) AS BIGINT) AS supplier_cnt
FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
WHERE l.l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p.p_brand, p.p_size
""",
        # Q20 shape: per-part share rule (mult*qty > total), decorrelated
        "dominant_suppliers": f"""
WITH pq AS MATERIALIZED (
  SELECT l_partkey, l_suppkey, CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS q
  FROM lineitem GROUP BY l_partkey, l_suppkey
),
pt AS (SELECT l_partkey, sum(q) AS t FROM pq GROUP BY l_partkey),
dom AS (
  SELECT pq.l_suppkey AS s_suppkey, CAST(count(*) AS BIGINT) AS n_parts
  FROM pq JOIN pt USING (l_partkey)
  WHERE {_DOM_MULT} * pq.q > pt.t
  GROUP BY pq.l_suppkey
)
SELECT d.s_suppkey, s.s_name, d.n_parts
FROM dom d JOIN supplier s ON s.s_suppkey = d.s_suppkey
""",
        # lag-k autocorrelation sufficient stats over the zero-filled
        # dense daily series: range-join gap fill, then a shifted self
        # join per lag — all integer moments
        "daily_autocorr": f"""
WITH ec AS MATERIALIZED (
  SELECT event_type, CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS day,
         CAST(count(*) AS BIGINT) AS c
  FROM events GROUP BY event_type, day
),
bounds AS (SELECT event_type, min(day) AS lo, max(day) AS hi
           FROM ec GROUP BY event_type),
dense AS MATERIALIZED (
  SELECT b.event_type, d.day, coalesce(e.c, 0) AS c
  FROM bounds b
  CROSS JOIN LATERAL (SELECT unnest(range(b.lo, b.hi + 1)) AS day) d
  LEFT JOIN ec e ON e.event_type = b.event_type AND e.day = d.day
),
lags AS (SELECT CAST(unnest(range(1, {_ACF_LAG} + 1)) AS BIGINT) AS lag)
SELECT x.event_type, l.lag,
       CAST(count(*) AS BIGINT) AS n_pairs,
       CAST(sum(x.c) AS BIGINT) AS sx,
       CAST(sum(y.c) AS BIGINT) AS sy,
       CAST(sum(x.c * x.c) AS BIGINT) AS sxx,
       CAST(sum(y.c * y.c) AS BIGINT) AS syy,
       CAST(sum(x.c * y.c) AS BIGINT) AS sxy
FROM lags l
JOIN dense x ON true
JOIN dense y ON y.event_type = x.event_type AND y.day = x.day + l.lag
GROUP BY x.event_type, l.lag
""",
        # k-anonymity: quasi-identifier group sizes below k
        "k_anonymity": f"""
SELECT lang, source, CAST(n_chars // {_KA_BUCKET} AS BIGINT) AS chars_bucket,
       CAST(count(*) AS BIGINT) AS n_docs
FROM documents
GROUP BY lang, source, chars_bucket
HAVING count(*) < {_KA_K}
""",
        # label centroid separation: floor-div integer centroids (the
        # k-means update arithmetic) + pairwise squared L2
        "label_centroid_dist": f"""
WITH {qv},
lv AS (SELECT vec_id, CAST(label AS BIGINT) AS label FROM embeddings),
cs AS (
  SELECT l.label, q.d,
         CAST(floor(CAST(sum(q.x) AS DOUBLE) / count(*)) AS BIGINT) AS cq
  FROM qv q JOIN lv l USING (vec_id)
  GROUP BY l.label, q.d
)
SELECT a.label AS label_a, b.label AS label_b,
       CAST(sum((a.cq - b.cq) * (a.cq - b.cq)) AS BIGINT) AS d2
FROM cs a JOIN cs b ON a.d = b.d AND a.label < b.label
GROUP BY a.label, b.label
""",
        # LM Dirichlet query likelihood: per-term quantized components
        # (the BM25 int-sum discipline applied to a second model);
        # candidates = docs matching >= 1 mapped query term
        "lmdirichlet_topk": _LMD_SQL,
        # QPP features: dictionary-side predictors + integer top-k
        # score moments, composed from the shared scoring CTEs
        "query_difficulty": f"""
WITH {KEPT_CTE},
{SCORES_CTE},
{QTOK_CTE},
mapped AS (SELECT q.query_id, q.tok, d.df FROM qtok q JOIN dft d USING (tok)),
pre AS (
  SELECT m.query_id,
         CAST(count(*) AS BIGINT) AS n_terms,
         CAST(min(m.df) AS BIGINT) AS min_df,
         CAST(max(m.df) AS BIGINT) AS max_df,
         CAST(max(CAST(trunc(ln((nd - m.df + 0.5) / (m.df + 0.5)) * 10000000)
                       AS BIGINT)) AS BIGINT) AS max_idf_q
  FROM mapped m CROSS JOIN gs2 GROUP BY m.query_id
),
scope AS (
  SELECT m.query_id, CAST(count(DISTINCT t.doc_id) AS BIGINT) AS scope
  FROM mapped m JOIN tf t USING (tok) GROUP BY m.query_id
),
qscores AS (
  SELECT q.query_id, s.doc_id, CAST(sum(s.score) AS BIGINT) AS score
  FROM qtok q JOIN scores s USING (tok) GROUP BY q.query_id, s.doc_id
),
topk AS (
  SELECT query_id, score FROM (
    SELECT query_id, score,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY score DESC, doc_id ASC) AS rn
    FROM qscores
  ) WHERE rn <= 10
),
post AS (
  SELECT query_id, CAST(count(*) AS BIGINT) AS topk_n,
         CAST(sum(score) AS BIGINT) AS score_sum,
         CAST(sum(score * score) AS BIGINT) AS score_ss
  FROM topk GROUP BY query_id
)
SELECT p.query_id, p.n_terms, p.min_df, p.max_df, p.max_idf_q,
       s.scope, t.topk_n, t.score_sum, t.score_ss
FROM pre p JOIN scope s USING (query_id) JOIN post t USING (query_id)
""",
        # judgment pooling: union of four composed ranking oracles
        "judgment_pool": f"""
WITH a AS ({_BM25_SQL}),
b AS ({_SDM_SQL}),
c AS ({_MAXP_SQL}),
d AS ({_LMD_SQL}),
u AS (
  SELECT query_id, doc_id FROM a WHERE rank <= 10
  UNION ALL SELECT query_id, doc_id FROM b WHERE rank <= 10
  UNION ALL SELECT query_id, doc_id FROM c WHERE rank <= 10
  UNION ALL SELECT query_id, doc_id FROM d WHERE rank <= 10
)
SELECT query_id, doc_id, CAST(count(*) AS BIGINT) AS n_systems
FROM u GROUP BY query_id, doc_id
""",
        # LSH precision audit: compose the lsh-pairs oracle, attach
        # exact Jaccard per candidate + the threshold verdict
        "lsh_precision": f"""
WITH cand AS ({_LSH_SQL}),
shx AS MATERIALIZED (
  WITH {KEPT_CTE},
  {_DOCS_TOKS},
  {_shingle_cte(H.SHINGLE_W)}
  SELECT doc_id, h FROM sh
),
sizes AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n FROM shx GROUP BY doc_id),
inter AS (
  SELECT c.doc_a, c.doc_b, CAST(count(*) AS BIGINT) AS i
  FROM cand c
  JOIN shx a ON a.doc_id = c.doc_a
  JOIN shx b ON b.doc_id = c.doc_b AND b.h = a.h
  GROUP BY c.doc_a, c.doc_b
)
SELECT c.doc_a, c.doc_b,
       coalesce(i.i, 0) AS inter_n,
       na.n + nb.n - coalesce(i.i, 0) AS union_n,
       CAST(CASE WHEN coalesce(i.i, 0) * 100 >=
                      20 * (na.n + nb.n - coalesce(i.i, 0))
                 THEN 1 ELSE 0 END AS BIGINT) AS is_dup
FROM cand c
LEFT JOIN inter i ON i.doc_a = c.doc_a AND i.doc_b = c.doc_b
JOIN sizes na ON na.doc_id = c.doc_a
JOIN sizes nb ON nb.doc_id = c.doc_b
""",
        # curriculum rank: compose the text-stats oracle, integer
        # stopword-density key, global row_number
        "curriculum_order": f"""
WITH ts AS ({_TS_SQL})
SELECT doc_id,
       (n_stop * 1000000) // CASE WHEN n_words > 0 THEN n_words ELSE 1 END
         AS fluency_ppm,
       n_words,
       CAST(row_number() OVER (
         ORDER BY (n_stop * 1000000)
                  // CASE WHEN n_words > 0 THEN n_words ELSE 1 END DESC,
                  n_words ASC, doc_id ASC) AS BIGINT) AS curriculum_rank
FROM ts
""",
        # index integrity: vocabulary + posting counts re-derived from
        # text; a healthy index reports zero structural violations
        "index_integrity": f"""
WITH {KEPT_CTE},
tf AS (SELECT doc_id, tok FROM kept GROUP BY doc_id, tok)
SELECT CAST((SELECT count(DISTINCT tok) FROM tf) AS BIGINT) AS n_keys,
       CAST((SELECT count(*) FROM tf) AS BIGINT) AS n_postings,
       CAST(0 AS BIGINT) AS n_violations
""",
        # Benford audit: leading digit of integer cents (string head),
        # expectation as an integer ppm LUT
        "benford_digits": f"""
WITH cents AS (
  SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS c FROM orders
  WHERE round(o_totalprice * 100) > 0
),
obs AS (
  SELECT CAST(substr(CAST(c AS VARCHAR), 1, 1) AS BIGINT) AS digit,
         CAST(count(*) AS BIGINT) AS n_orders
  FROM cents GROUP BY digit
),
lut(digit, benford_ppm) AS (VALUES
  (1, CAST(301030 AS BIGINT)), (2, 176091), (3, 124939), (4, 96910),
  (5, 79181), (6, 66947), (7, 57992), (8, 51153), (9, 45757))
SELECT o.digit, o.n_orders, CAST(l.benford_ppm AS BIGINT) AS benford_ppm
FROM obs o JOIN lut l USING (digit)
""",
        # seasonal-naive forecast baseline: gap-filled series, lag-7
        # absolute/squared error sums + lag-1 MASE denominator
        "seasonal_forecast_eval": f"""
WITH ec AS MATERIALIZED (
  SELECT event_type, CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS day,
         CAST(count(*) AS BIGINT) AS c
  FROM events GROUP BY event_type, day
),
bounds AS (SELECT event_type, min(day) AS lo, max(day) AS hi
           FROM ec GROUP BY event_type),
dense AS MATERIALIZED (
  SELECT b.event_type, d.day, coalesce(e.c, 0) AS c
  FROM bounds b
  CROSS JOIN LATERAL (SELECT unnest(range(b.lo, b.hi + 1)) AS day) d
  LEFT JOIN ec e ON e.event_type = b.event_type AND e.day = d.day
),
season AS (
  SELECT x.event_type,
         CAST(count(*) AS BIGINT) AS n_days,
         CAST(sum(abs(y.c - x.c)) AS BIGINT) AS mae_num,
         CAST(sum((y.c - x.c) * (y.c - x.c)) AS BIGINT) AS sse
  FROM dense x
  JOIN dense y ON y.event_type = x.event_type AND y.day = x.day + {_FC_LAG}
  GROUP BY x.event_type
),
naive AS (
  SELECT x.event_type, CAST(sum(abs(y.c - x.c)) AS BIGINT) AS naive_num
  FROM dense x
  JOIN dense y ON y.event_type = x.event_type AND y.day = x.day + 1
  GROUP BY x.event_type
)
SELECT s.event_type, s.n_days, s.mae_num, s.sse, n.naive_num
FROM season s JOIN naive n USING (event_type)
""",
        # dictionary front-coding accounting: lag-window LCP, exact
        # byte totals for the block-head layout
        "dictionary_bytes": f"""
WITH {KEPT_CTE},
terms AS (
  SELECT tok, row_number() OVER (ORDER BY tok) - 1 AS rn,
         lag(tok) OVER (ORDER BY tok) AS prev
  FROM (SELECT DISTINCT tok FROM kept)
),
pos AS (SELECT CAST(unnest(range(1, 256)) AS INT) AS i),
coded AS (
  SELECT tok, rn, prev,
         CASE WHEN rn % 16 = 0 OR prev IS NULL THEN 2 + length(tok)
              ELSE 2 + length(tok) - (
                SELECT count(*) FROM pos p
                WHERE p.i <= least(length(tok), length(prev), 255)
                  AND substr(tok, 1, p.i) = substr(prev, 1, p.i))
         END AS fb
  FROM terms
)
SELECT CAST(count(*) AS BIGINT) AS n_terms,
       CAST(sum(2 + length(tok)) AS BIGINT) AS raw_bytes,
       CAST(sum(fb) AS BIGINT) AS front_bytes,
       CAST(((sum(2 + length(tok)) - sum(fb)) * 1000000)
            // greatest(sum(2 + length(tok)), 1) AS BIGINT) AS saved_ppm
FROM coded
""",
        # per-chunk language consistency: ordered word positions,
        # 32-word chunks, the same 20%-stopword rule per chunk
        "mixed_lang_docs": f"""
WITH wordsp AS (
  SELECT doc_id,
         lower(unnest(regexp_extract_all(text, '[A-Za-z]+'))) AS w,
         generate_subscripts(regexp_extract_all(text, '[A-Za-z]+'), 1) AS p
  FROM documents
),
ch AS (
  SELECT doc_id, CAST((p - 1) // {_MIX_CHUNK} AS BIGINT) AS ck,
         CAST(count(*) AS BIGINT) AS nw,
         CAST(count(*) FILTER (w IN ({_STOP_SQL})) AS BIGINT) AS ns
  FROM wordsp GROUP BY doc_id, ck
)
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       CAST(count(*) AS BIGINT) AS n_chunks,
       CAST(count(*) FILTER (5 * ns >= nw) AS BIGINT) AS en_chunks,
       CAST(CASE WHEN count(*) FILTER (5 * ns >= nw) > 0
                  AND count(*) FILTER (5 * ns >= nw) < count(*)
                 THEN 1 ELSE 0 END AS BIGINT) AS is_mixed
FROM ch GROUP BY doc_id
""",
        "dbscan_clusters": f"""
WITH RECURSIVE {qv},
pairs AS MATERIALIZED (
  SELECT a.vec_id AS a, b.vec_id AS b
  FROM qv a JOIN qv b ON a.d = b.d AND a.vec_id < b.vec_id
  GROUP BY a.vec_id, b.vec_id
  HAVING sum((a.x - b.x) * (a.x - b.x)) <= {DBSCAN_EPS2}
),
sym AS (SELECT a AS src, b AS dst FROM pairs
        UNION ALL SELECT b, a FROM pairs),
deg AS (SELECT src AS node, count(*) AS deg FROM sym GROUP BY src),
core AS (SELECT node FROM deg WHERE deg + 1 >= {DBSCAN_MIN_PTS}),
cedges AS (
  SELECT s.src, s.dst FROM sym s
  JOIN core c1 ON c1.node = s.src JOIN core c2 ON c2.node = s.dst
),
reach(node, lbl) AS (
  SELECT node, node FROM core
  UNION
  SELECT e.dst, r.lbl FROM reach r JOIN cedges e ON e.src = r.node
),
corelbl AS (SELECT node, min(lbl) AS cluster FROM reach GROUP BY node),
borderlbl AS (
  SELECT s.dst AS node, min(cl.cluster) AS cluster
  FROM sym s JOIN corelbl cl ON cl.node = s.src
  WHERE s.dst NOT IN (SELECT node FROM core)
  GROUP BY s.dst
)
SELECT CAST(e.vec_id AS BIGINT) AS vec_id,
       CAST(coalesce(c.cluster, b.cluster, -1) AS BIGINT) AS cluster,
       CAST(CASE WHEN c.node IS NOT NULL THEN 1 ELSE 0 END AS BIGINT) AS is_core
FROM embeddings e
LEFT JOIN corelbl c ON c.node = e.vec_id
LEFT JOIN borderlbl b ON b.node = e.vec_id
""",
    }


# --------------------------------------------------------- session 13


def _knn_edge_ctes() -> str:
    """The shared kNN-graph CTE chain (quantized vectors -> pairwise
    integer L2 -> per-node top-k -> distinct undirected edges ->
    symmetric adjacency + degrees) used by the weighted link-prediction
    oracles."""
    from candidategeneration_ray.pipelines.clustering import (
        KMEANS_SCALE, KNN_K)

    return f"""qv AS MATERIALIZED (
  SELECT vec_id,
         CAST(generate_subscripts(embedding, 1) - 1 AS BIGINT) AS d,
         CAST(trunc(CAST(unnest(embedding) AS DOUBLE) * {KMEANS_SCALE}) AS BIGINT) AS x
  FROM embeddings
),
dist AS (
  SELECT a.vec_id AS vec_id, b.vec_id AS nbr_id,
         sum((a.x - b.x) * (a.x - b.x)) AS d2
  FROM qv a JOIN qv b ON a.d = b.d AND a.vec_id <> b.vec_id
  GROUP BY a.vec_id, b.vec_id
),
rk AS (
  SELECT vec_id, nbr_id,
         row_number() OVER (PARTITION BY vec_id
                            ORDER BY d2 ASC, nbr_id ASC) AS rank
  FROM dist
),
edges AS MATERIALIZED (
  SELECT DISTINCT least(vec_id, nbr_id) AS u, greatest(vec_id, nbr_id) AS v
  FROM rk WHERE rank <= {KNN_K}
),
sadj AS (SELECT u AS x, v AS y FROM edges
         UNION ALL SELECT v, u FROM edges),
deg AS (SELECT x, CAST(count(*) AS BIGINT) AS deg FROM sadj GROUP BY x)"""


def _densest_sql() -> str:
    from candidategeneration_ray.pipelines.clustering import (
        DENSEST_MAX_ROUNDS, KCORE_SUPPORT)

    ctes = ["a0 AS MATERIALIZED (SELECT DISTINCT x AS v FROM sadj)"]
    for r in range(DENSEST_MAX_ROUNDS):
        ctes.append(f"""le{r} AS (
  SELECT e.u, e.v FROM ew e
  JOIN a{r} x ON x.v = e.u JOIN a{r} y ON y.v = e.v),
dg{r} AS (
  SELECT node, CAST(count(*) AS BIGINT) AS deg FROM (
    SELECT u AS node FROM le{r} UNION ALL SELECT v FROM le{r})
  GROUP BY node),
st{r} AS (SELECT (SELECT CAST(count(*) AS BIGINT) FROM a{r}) AS n,
                 coalesce((SELECT sum(deg) FROM dg{r}), 0) AS e2),
a{r + 1} AS MATERIALIZED (
  SELECT a.v FROM a{r} a LEFT JOIN dg{r} d ON d.node = a.v
  WHERE (SELECT n FROM st{r}) * coalesce(d.deg, 0)
        > (SELECT e2 FROM st{r}))""")
    allst = " UNION ALL ".join(
        f"SELECT {r} AS rnd, (SELECT n FROM st{r}) AS n, "
        f"(SELECT e2 FROM st{r}) AS e2" for r in range(DENSEST_MAX_ROUNDS))
    mem = " UNION ALL ".join(
        f"SELECT {r} AS rnd, v FROM a{r}"
        for r in range(DENSEST_MAX_ROUNDS))
    return f"""
WITH op AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
ew AS MATERIALIZED (
  SELECT a.l_partkey AS u, b.l_partkey AS v
  FROM op a JOIN op b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY 1, 2 HAVING count(*) >= {KCORE_SUPPORT}),
sadj AS MATERIALIZED (SELECT u AS x, v AS y FROM ew
                      UNION ALL SELECT v, u FROM ew),
{",".join(ctes)},
allst AS ({allst}),
valid AS (SELECT * FROM allst WHERE n > 0),
best AS (
  SELECT rnd, n, e2 FROM valid v
  WHERE NOT EXISTS (
    SELECT 1 FROM valid w
    WHERE w.e2 * v.n > v.e2 * w.n
       OR (w.e2 * v.n = v.e2 * w.n AND w.rnd < v.rnd))),
mem AS ({mem})
SELECT CAST(m.v AS BIGINT) AS part, CAST(b.rnd AS BIGINT) AS best_round,
       CAST(b.e2 AS BIGINT) AS e2, CAST(b.n AS BIGINT) AS n
FROM best b JOIN mem m ON m.rnd = b.rnd
"""


def _ktruss_sql() -> str:
    from candidategeneration_ray.pipelines.clustering import (
        KCORE_SUPPORT, TRUSS_K, TRUSS_MAX_ROUNDS)

    ctes = [f"""e0 AS MATERIALIZED (
  SELECT a.l_partkey AS u, b.l_partkey AS v
  FROM op a JOIN op b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY 1, 2 HAVING count(*) >= {KCORE_SUPPORT})"""]
    for r in range(TRUSS_MAX_ROUNDS + 1):   # +1: fixed-point support
        ctes.append(f"""sadj{r} AS (SELECT u AS x, v AS y FROM e{r}
            UNION ALL SELECT v, u FROM e{r}),
tri{r} AS (
  SELECT a.x AS u, b.x AS v, CAST(count(*) AS BIGINT) AS s
  FROM sadj{r} a JOIN sadj{r} b ON a.y = b.y AND a.x < b.x
  GROUP BY 1, 2),
supp{r} AS (
  SELECT e.u, e.v, coalesce(t.s, 0) AS s
  FROM e{r} e LEFT JOIN tri{r} t ON t.u = e.u AND t.v = e.v),
e{r + 1} AS MATERIALIZED (
  SELECT u, v FROM supp{r} WHERE s >= {TRUSS_K - 2})""")
    return f"""
WITH op AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
{",".join(ctes)}
SELECT CAST(u AS BIGINT) AS u, CAST(v AS BIGINT) AS v,
       CAST(s AS BIGINT) AS support
FROM supp{TRUSS_MAX_ROUNDS} WHERE s >= {TRUSS_K - 2}
"""


def _gram_power_sql() -> str:
    from candidategeneration_ray.pipelines.clustering import (
        KMEANS_SCALE, POWER_ITERS, POWER_SCALE)

    ctes = [f"""qv AS MATERIALIZED (
  SELECT vec_id,
         CAST(generate_subscripts(embedding, 1) - 1 AS BIGINT) AS d,
         CAST(trunc(CAST(unnest(embedding) AS DOUBLE) * {KMEANS_SCALE}) AS BIGINT) AS x
  FROM embeddings
)""",
            """g AS MATERIALIZED (
  SELECT a.d AS i, b.d AS j, CAST(sum(a.x * b.x) AS HUGEINT) AS val
  FROM qv a JOIN qv b ON a.vec_id = b.vec_id GROUP BY 1, 2)""",
            f"""v0 AS (SELECT DISTINCT d AS i,
  CAST({POWER_SCALE} AS HUGEINT) AS v FROM qv)"""]
    for r in range(POWER_ITERS):
        ctes.append(f"""w{r} AS (
  SELECT g.i, sum(g.val * v{r}.v) AS w
  FROM g JOIN v{r} ON v{r}.i = g.j GROUP BY g.i),
mx{r} AS (SELECT max(abs(w)) AS m FROM w{r}),
v{r + 1} AS MATERIALIZED (
  SELECT i, CASE WHEN w >= 0
                 THEN (abs(w) * {POWER_SCALE}) // (SELECT m FROM mx{r})
                 ELSE -((abs(w) * {POWER_SCALE}) // (SELECT m FROM mx{r}))
            END AS v
  FROM w{r})""")
    return (f"WITH {','.join(ctes)}\n"
            f"SELECT CAST(i AS BIGINT) AS dim, CAST(v AS BIGINT) AS v "
            f"FROM v{POWER_ITERS}")


def session13_oracles() -> dict[str, str]:
    from candidategeneration_ray.pipelines.clustering import (
        AA_DEG_CAP, AA_TOPK, aa_weight_lut)
    from candidategeneration_ray.pipelines.clustering import (
        KNN_K as _KNN_K13, WALK_STEPS, WALK_TOPK, WALK_WINDOW)
    from candidategeneration_ray.pipelines.docquery import TA_FLUENCY_W
    from candidategeneration_ray.pipelines.relational import FD_CANDIDATES
    from candidategeneration_ray.pipelines.extras import (
        _SIGN_BIT, DF_DRIFT_TOPK, HASH_DIM, K_ANON_CHAR_BUCKET,
        L_DIVERSITY, MAXSIM_SLOTS, SNM_K, SNM_W, WINNOW_K, WINNOW_W)
    from candidategeneration_ray.pipelines.sketches import KMV_K

    aa_lut_rows = ",".join(
        f"({d + 2},{w})" for d, w in enumerate(aa_weight_lut()))
    h_tok = _H64.format(expr="tok")
    signed_h = ("CAST({col}::HUGEINT - CASE WHEN {col} >= "
                "9223372036854775808::UBIGINT THEN "
                "18446744073709551616::HUGEINT ELSE 0::HUGEINT END "
                "AS BIGINT)")
    h_slot = _H64.format(expr="CAST(s AS VARCHAR) || ':' || tok")
    slot_vals = ",".join(f"({s})" for s in range(MAXSIM_SLOTS))
    _TS13_SQL = extras_oracles()["text_stats"]
    from candidategeneration_ray.pipelines.extras import entropy_ln_lut
    _ent_lut_rows = ",".join(
        f"({c + 1},{v})" for c, v in enumerate(entropy_ln_lut()))

    from candidategeneration_ray.pipelines.events import (
        HAAR_LEVELS, HAAR_N, RATE_LIMIT_N)
    haar_ctes = []
    for lvl in range(1, HAAR_LEVELS + 1):
        haar_ctes.append(
            f"l{lvl} AS (SELECT event_type, i // 2 AS i,\n"
            f"  sum(CASE WHEN i % 2 = 0 THEN v ELSE -v END) AS d,\n"
            f"  sum(v) AS v FROM l{lvl - 1} GROUP BY 1, 2)")
    haar_selects = [
        f"SELECT event_type, CAST({lvl} AS BIGINT) AS level, "
        f"CAST(i AS BIGINT) AS idx, CAST(d AS BIGINT) AS coeff FROM l{lvl}"
        for lvl in range(1, HAAR_LEVELS + 1)]
    haar_selects.append(
        f"SELECT event_type, CAST({HAAR_LEVELS + 1} AS BIGINT), "
        f"CAST(0 AS BIGINT), CAST(v AS BIGINT) FROM l{HAAR_LEVELS}")
    haar_sql = f"""
WITH d0 AS (SELECT min(epoch_us(ts) // 86400000000) AS d0 FROM events),
cnt AS (SELECT event_type,
               epoch_us(ts) // 86400000000 - (SELECT d0 FROM d0) AS i,
               CAST(count(*) AS BIGINT) AS v
        FROM events GROUP BY 1, 2),
grid AS (SELECT t.event_type, g.i
         FROM (SELECT DISTINCT event_type FROM events) t
         CROSS JOIN (SELECT unnest(range(0, {HAAR_N})) AS i) g),
l0 AS (SELECT g.event_type, g.i, coalesce(c.v, 0) AS v
       FROM grid g LEFT JOIN cnt c
         ON c.event_type = g.event_type AND c.i = g.i),
{",".join(haar_ctes)}
{" UNION ALL ".join(haar_selects)}
"""
    K, W = WINNOW_K, WINNOW_W
    kgram_h = _H64.format(
        expr=f"CASE WHEN len(l) <= {K} THEN array_to_string(l, ' ') "
             f"ELSE array_to_string(list_slice(l, i, i + {K - 1}), ' ') END")

    # Borůvka unroll: 12 rounds (>= log2(nodes) at every oracle sf);
    # per round the component closure is a recursive CTE, labels the min
    # reachable component id. Rounds after convergence are no-ops
    # (xe empty -> me empty -> labels unchanged).
    MST_SQL_ROUNDS = 12
    mst_ctes = ["lbl0 AS MATERIALIZED (SELECT DISTINCT x AS node, "
                "x AS lbl FROM sadj)"]
    for r in range(MST_SQL_ROUNDS):
        mst_ctes.append(f"""xe{r} AS MATERIALIZED (
  SELECT e.u, e.v, e.w, la.lbl AS lu, lb.lbl AS lv
  FROM ew e JOIN lbl{r} la ON la.node = e.u
            JOIN lbl{r} lb ON lb.node = e.v
  WHERE la.lbl <> lb.lbl),
me{r} AS (
  SELECT lu, lv, u, v, w FROM (
    SELECT *, row_number() OVER (PARTITION BY comp
                                 ORDER BY w, u, v) AS rn
    FROM (SELECT lu AS comp, lu, lv, u, v, w FROM xe{r}
          UNION ALL SELECT lv AS comp, lu, lv, u, v, w FROM xe{r}))
  WHERE rn = 1),
cg{r} AS (SELECT DISTINCT lu AS a, lv AS b FROM me{r}
          UNION SELECT lv, lu FROM me{r}),
rc{r}(a, b) AS (
  SELECT DISTINCT lbl AS a, lbl AS b FROM lbl{r}
  UNION
  SELECT rc{r}.a, cg{r}.b FROM rc{r} JOIN cg{r} ON cg{r}.a = rc{r}.b),
nl{r} AS (SELECT a AS comp, min(b) AS nlbl FROM rc{r} GROUP BY a),
lbl{r + 1} AS MATERIALIZED (
  SELECT l.node, n.nlbl AS lbl
  FROM lbl{r} l JOIN nl{r} n ON n.comp = l.lbl)""")
    mst_union = " UNION ".join(
        f"SELECT u, v, w FROM me{r}" for r in range(MST_SQL_ROUNDS))

    # Luby MIS unroll (deterministic md5 priorities)
    from candidategeneration_ray.pipelines.clustering import MIS_MAX_ROUNDS
    h_node = _H64.format(expr="CAST(x AS VARCHAR)")
    mis_ctes = [f"pr AS MATERIALIZED (SELECT x AS v, {h_node} AS h "
                "FROM (SELECT DISTINCT x FROM sadj))",
                "und0 AS (SELECT v FROM pr)"]
    for r in range(MIS_MAX_ROUNDS):
        mis_ctes.append(f"""nb{r} AS (
  SELECT s.x AS v, p.h AS nh, p.v AS nv,
         row_number() OVER (PARTITION BY s.x ORDER BY p.h, p.v) AS rn
  FROM sadj s
  JOIN und{r} ux ON ux.v = s.x
  JOIN und{r} uy ON uy.v = s.y
  JOIN pr p ON p.v = s.y),
cand{r} AS MATERIALIZED (
  SELECT u.v FROM und{r} u
  JOIN pr p ON p.v = u.v
  LEFT JOIN (SELECT v, nh, nv FROM nb{r} WHERE rn = 1) m ON m.v = u.v
  WHERE m.v IS NULL OR p.h < m.nh OR (p.h = m.nh AND p.v < m.nv)),
rem{r} AS (SELECT v FROM cand{r}
           UNION SELECT s.y FROM sadj s JOIN cand{r} c ON c.v = s.x),
und{r + 1} AS MATERIALIZED (
  SELECT u.v FROM und{r} u
  WHERE u.v NOT IN (SELECT v FROM rem{r}))""")
    mis_union = " UNION ALL ".join(
        f"SELECT CAST(v AS BIGINT) AS vec_id, CAST({r} AS BIGINT) "
        f"AS mis_round FROM cand{r}" for r in range(MIS_MAX_ROUNDS))

    # parallel greedy maximal matching unroll
    from candidategeneration_ray.pipelines.clustering import (
        MATCHING_MAX_ROUNDS)
    h_edge = _H64.format(
        expr="CAST(u AS VARCHAR) || ':' || CAST(v AS VARCHAR)")
    mm_ctes = [f"epr AS MATERIALIZED (SELECT u, v, {h_edge} AS p FROM edges)",
               "alive0 AS (SELECT DISTINCT x AS v FROM sadj)"]
    for r in range(MATCHING_MAX_ROUNDS):
        mm_ctes.append(f"""le{r} AS (
  SELECT e.u, e.v, e.p FROM epr e
  JOIN alive{r} a1 ON a1.v = e.u
  JOIN alive{r} a2 ON a2.v = e.v),
nm{r} AS (
  SELECT node, min(p) AS mp FROM (
    SELECT u AS node, p FROM le{r}
    UNION ALL SELECT v, p FROM le{r}) GROUP BY node),
mc{r} AS MATERIALIZED (
  SELECT l.u, l.v FROM le{r} l
  JOIN nm{r} mu ON mu.node = l.u AND mu.mp = l.p
  JOIN nm{r} mv ON mv.node = l.v AND mv.mp = l.p),
alive{r + 1} AS MATERIALIZED (
  SELECT a.v FROM alive{r} a
  WHERE a.v NOT IN (SELECT u FROM mc{r} UNION SELECT v FROM mc{r}))""")
    mm_union = " UNION ALL ".join(
        f"SELECT CAST(u AS BIGINT) AS u, CAST(v AS BIGINT) AS v, "
        f"CAST({r} AS BIGINT) AS match_round FROM mc{r}"
        for r in range(MATCHING_MAX_ROUNDS))

    walk_ctes = ["w0 AS (SELECT vec_id AS walk, 0 AS step, vec_id AS cur "
                 "FROM embeddings)"]
    for s in range(WALK_STEPS):
        h = _H64.format(expr=f"CAST(w{s}.cur AS VARCHAR) || ':{s}'")
        walk_ctes.append(
            f"w{s + 1} AS (SELECT w{s}.walk, {s + 1} AS step, r.y AS cur\n"
            f"  FROM w{s} JOIN radj r ON r.x = w{s}.cur\n"
            f"   AND r.rk = CAST({h} % CAST(r.deg AS UBIGINT) AS BIGINT))")
    walk_seq = " UNION ALL ".join(
        f"SELECT * FROM w{s}" for s in range(WALK_STEPS + 1))

    d = {
        # Borůvka MSF: the unique MST under the (w, u, v) total order,
        # rounds unrolled with recursive component closures
        "mst_edges": f"""
WITH RECURSIVE {_knn_edge_ctes()},
ew AS MATERIALIZED (
  SELECT least(r.vec_id, r.nbr_id) AS u, greatest(r.vec_id, r.nbr_id) AS v,
         min(d.d2) AS w
  FROM rk r JOIN dist d
    ON d.vec_id = r.vec_id AND d.nbr_id = r.nbr_id
  WHERE r.rank <= {_KNN_K13} GROUP BY 1, 2),
{",".join(mst_ctes)}
SELECT CAST(u AS BIGINT) AS u, CAST(v AS BIGINT) AS v,
       CAST(w AS BIGINT) AS w
FROM ({mst_union})
ORDER BY w, u, v
""",
        # Shannon character entropy via the shared integer ln LUT
        "char_entropy": f"""
WITH lut(c, lnppb) AS (VALUES {_ent_lut_rows}),
chars AS (
  SELECT doc_id, unnest(string_split(text, '')) AS ch FROM documents),
cc AS (SELECT doc_id, ch, CAST(count(*) AS BIGINT) AS c
       FROM chars WHERE ch <> '' AND unicode(ch) < 128
       GROUP BY 1, 2),
nn AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n FROM cc GROUP BY 1),
h AS (
  SELECT cc.doc_id,
         CAST(sum(cc.c * (ln_n.lnppb - ln_c.lnppb)) AS BIGINT)
           AS entropy_num
  FROM cc JOIN nn USING (doc_id)
  JOIN lut ln_n ON ln_n.c = nn.n
  JOIN lut ln_c ON ln_c.c = cc.c
  GROUP BY 1)
SELECT CAST(d.doc_id AS BIGINT) AS doc_id,
       CAST(coalesce(nn.n, 0) AS BIGINT) AS n_ascii,
       CAST(coalesce(h.entropy_num, 0) AS BIGINT) AS entropy_num
FROM documents d
LEFT JOIN nn ON nn.doc_id = d.doc_id
LEFT JOIN h ON h.doc_id = d.doc_id
""",
        # calendar grouping sets derived from one scan
        "time_rollup": """
WITH base AS (
  SELECT epoch_us(ts) // 86400000000 AS day,
         year(ts) * 100 + month(ts) AS ym,
         CASE WHEN event_type = 'purchase'
              THEN CAST(round(value * 100) AS BIGINT) ELSE 0 END AS cents
  FROM events),
g AS (
  SELECT 'day' AS grain, day AS bucket, count(*) AS n, sum(cents) AS c
  FROM base GROUP BY 2
  UNION ALL
  SELECT 'week', (day // 7) * 7, count(*), sum(cents)
  FROM base GROUP BY 2
  UNION ALL
  SELECT 'month', ym, count(*), sum(cents)
  FROM base GROUP BY 2)
SELECT grain, CAST(bucket AS BIGINT) AS bucket,
       CAST(n AS BIGINT) AS n_events, CAST(c AS BIGINT) AS cents
FROM g
""",
        # functional-dependency audit over the fixed candidate list
        "fd_audit": " UNION ALL ".join(f"""
SELECT '{tbl}' AS tbl, '{det}' AS determinant, '{dep}' AS dependent,
       CAST(count(*) AS BIGINT) AS n_keys,
       CAST(count(*) FILTER (WHERE n_vals > 1) AS BIGINT)
         AS n_violating_keys,
       CAST(coalesce(sum(n_rows) FILTER (WHERE n_vals > 1), 0) AS BIGINT)
         AS n_violating_rows
FROM (SELECT {det} AS a, count(DISTINCT {dep}) AS n_vals,
             count(*) AS n_rows
      FROM {tbl} GROUP BY {det})
""" for tbl, det, dep in FD_CANDIDATES),
        # k-truss: per-round per-edge triangle support, peel, unrolled
        "ktruss_edges": _ktruss_sql(),
        # parallel peeling densest subgraph: rounds unrolled, density
        # compared by cross-multiplication, earliest densest iterate
        "densest_subgraph": _densest_sql(),
        # power iteration over the Gram matrix, HUGEINT fixed point
        "gram_power_iteration": _gram_power_sql(),
        # greedy maximal matching: locally-minimal edge priorities
        "matching_edges": f"""
WITH {_knn_edge_ctes()},
{",".join(mm_ctes)}
{mm_union}
""",
        # Luby MIS: rounds unrolled, min undecided-neighbor priority
        "mis_nodes": f"""
WITH {_knn_edge_ctes()},
{",".join(mis_ctes)}
{mis_union}
""",
        # single-linkage at the median edge weight: CC over light edges
        "single_linkage_clusters": f"""
WITH RECURSIVE {_knn_edge_ctes()},
ew AS MATERIALIZED (
  SELECT least(r.vec_id, r.nbr_id) AS u, greatest(r.vec_id, r.nbr_id) AS v,
         min(d.d2) AS w
  FROM rk r JOIN dist d
    ON d.vec_id = r.vec_id AND d.nbr_id = r.nbr_id
  WHERE r.rank <= {_KNN_K13} GROUP BY 1, 2),
tot AS (SELECT count(*) AS n FROM ew),
med AS (SELECT w AS t FROM (
  SELECT w, row_number() OVER (ORDER BY w, u, v) AS rn FROM ew)
  WHERE rn = (SELECT (n + 1) // 2 FROM tot)),
light AS (SELECT u, v FROM ew WHERE w <= (SELECT t FROM med)),
edges2 AS (SELECT u AS src, v AS dst FROM light
           UNION ALL SELECT v, u FROM light),
reach(node, lbl) AS (
  SELECT vec_id, vec_id FROM embeddings
  UNION
  SELECT e.dst, r.lbl FROM reach r JOIN edges2 e ON e.src = r.node)
SELECT CAST(node AS BIGINT) AS vec_id, CAST(min(lbl) AS BIGINT) AS cluster
FROM reach GROUP BY node
""",
        # deterministic DeepWalk corpus: hash-chosen sorted-neighbor
        # hops unrolled step by step, skip-gram window pair counts
        "walk_cooccurrence": f"""
WITH {_knn_edge_ctes()},
radj AS MATERIALIZED (
  SELECT x, y, row_number() OVER (PARTITION BY x ORDER BY y) - 1 AS rk,
         count(*) OVER (PARTITION BY x) AS deg
  FROM sadj),
{",".join(walk_ctes)},
seq AS ({walk_seq}),
pairs AS (
  SELECT least(a.cur, b.cur) AS pa_, greatest(a.cur, b.cur) AS pb_
  FROM seq a JOIN seq b
    ON a.walk = b.walk AND b.step > a.step
   AND b.step <= a.step + {WALK_WINDOW} AND a.cur <> b.cur)
SELECT CAST(pa_ AS BIGINT) AS a, CAST(pb_ AS BIGINT) AS b,
       CAST(count(*) AS BIGINT) AS n
FROM pairs GROUP BY 1, 2
ORDER BY n DESC, a, b
LIMIT {WALK_TOPK}
""",
        # winnowing: positional (NON-distinct) k-gram hashes, per-window
        # min with leftmost tie-break as a two-step group-by
        "winnow_fingerprints": f"""
WITH {KEPT_CTE},
{_DOCS_TOKS},
pos AS (
  SELECT doc_id, l,
         unnest(range(1, CASE WHEN len(l) <= {K} THEN 2 ELSE len(l) - {K - 2} END)) AS i
  FROM docs_toks
),
kg AS MATERIALIZED (SELECT doc_id, i, {kgram_h} AS h FROM pos),
nn AS (SELECT doc_id, max(i) AS n FROM kg GROUP BY doc_id),
wins AS (
  SELECT doc_id, unnest(range(1, greatest(n - {W - 1}, 1) + 1)) AS j
  FROM nn
),
wmin AS (
  SELECT w.doc_id, w.j, min(k.h) AS m
  FROM wins w JOIN kg k ON k.doc_id = w.doc_id
    AND k.i >= w.j AND k.i <= w.j + {W - 1}
  GROUP BY w.doc_id, w.j
),
sel AS (
  SELECT w.doc_id, min(k.i) AS p, w.m
  FROM wmin w JOIN kg k ON k.doc_id = w.doc_id
    AND k.i >= w.j AND k.i <= w.j + {W - 1} AND k.h = w.m
  GROUP BY w.doc_id, w.j, w.m
),
fp AS (SELECT DISTINCT doc_id, p, m FROM sel)
SELECT CAST(doc_id AS BIGINT) AS doc_id, CAST(p AS BIGINT) AS pos,
       CAST(m::HUGEINT - CASE WHEN m >= 9223372036854775808::UBIGINT
                              THEN 18446744073709551616::HUGEINT ELSE 0::HUGEINT END
            AS BIGINT) AS fp
FROM fp
""",
        # l-diversity: distinct sensitive values per QI group
        "l_diversity": f"""
WITH g AS (
  SELECT source, n_chars // {K_ANON_CHAR_BUCKET} AS chars_bucket, lang,
         CAST(count(*) AS BIGINT) AS n
  FROM documents GROUP BY 1, 2, 3),
a AS (
  SELECT source, chars_bucket,
         CAST(sum(n) AS BIGINT) AS n_docs,
         CAST(count(*) AS BIGINT) AS n_langs
  FROM g GROUP BY 1, 2)
SELECT source, CAST(chars_bucket AS BIGINT) AS chars_bucket,
       n_docs, n_langs
FROM a WHERE n_langs < {L_DIVERSITY}
""",
        # sorted-neighborhood blocking: window pairs over the ranked
        # distinct names, DuckDB levenshtein verify
        "snm_pairs": f"""
WITH names AS (SELECT DISTINCT p_name AS nm FROM part),
rk AS (SELECT nm, row_number() OVER (ORDER BY nm) AS r FROM names),
pairs AS (
  SELECT a.nm AS name_a, b.nm AS name_b
  FROM rk a JOIN rk b ON b.r > a.r AND b.r < a.r + {SNM_W})
SELECT name_a, name_b,
       CAST(levenshtein(name_a, name_b) AS BIGINT) AS ed
FROM pairs WHERE levenshtein(name_a, name_b) <= {SNM_K}
""",
        # term drift between doc-id halves: cross-multiplied rate diff
        "df_drift": f"""
WITH {KEPT_CTE},
tot AS (SELECT CAST(count(*) AS BIGINT) AS n FROM documents),
tf AS (SELECT DISTINCT doc_id, tok FROM kept),
agg AS (
  SELECT tok,
         CAST(count(*) FILTER (WHERE doc_id < (SELECT n // 2 FROM tot))
              AS BIGINT) AS df_a,
         CAST(count(*) FILTER (WHERE doc_id >= (SELECT n // 2 FROM tot))
              AS BIGINT) AS df_b
  FROM tf GROUP BY tok)
SELECT tok, df_a, df_b,
       CAST(abs(df_a * (SELECT n - n // 2 FROM tot)
                - df_b * (SELECT n // 2 FROM tot)) AS BIGINT) AS drift_num
FROM agg
ORDER BY drift_num DESC, tok
LIMIT {DF_DRIFT_TOPK}
""",
        # Haar filter bank: one GROUP BY per level over the zero-filled
        # dyadic day grid (details = even-odd, approx rides along)
        "haar_daily": haar_sql,
        # TA rank fusion: full-scan fused = bm25 + W*fluency; TA's hash
        # match against this proves the early-termination rule exact
        "ta_fused_topk": f"""
WITH {KEPT_CTE},
{SCORES_CTE},
{QTOK_CTE},
ts AS ({{TS}}),
flu AS (SELECT doc_id,
               (n_stop * 1000000)
                 // CASE WHEN n_words > 0 THEN n_words ELSE 1 END AS f
        FROM ts),
qscores AS MATERIALIZED (
  SELECT q.query_id, s.doc_id, CAST(sum(s.score) AS BIGINT) AS score
  FROM qtok q JOIN scores s USING (tok)
  GROUP BY 1, 2),
allq AS (SELECT DISTINCT query_id FROM qtok),
fused AS (
  SELECT a.query_id, d.doc_id,
         coalesce(qs.score, 0) + {TA_FLUENCY_W} * f.f AS fused
  FROM allq a
  CROSS JOIN documents d
  JOIN flu f ON f.doc_id = d.doc_id
  LEFT JOIN qscores qs
    ON qs.query_id = a.query_id AND qs.doc_id = d.doc_id)
SELECT query_id, CAST(rn AS BIGINT) AS rank,
       CAST(doc_id AS BIGINT) AS doc_id, CAST(fused AS BIGINT) AS fused
FROM (
  SELECT query_id, doc_id, fused,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY fused DESC, doc_id ASC) AS rn
  FROM fused
) WHERE rn <= 10
""".replace("{TS}", _TS13_SQL),
        # item-item cosine: squared cross-multiplied threshold over the
        # co-purchase pair and item supports
        "item_cosine_pairs": """
WITH op AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
isup AS (SELECT l_partkey AS pk, CAST(count(*) AS BIGINT) AS s
         FROM op GROUP BY 1),
pr AS (
  SELECT a.l_partkey AS p1, b.l_partkey AS p2,
         CAST(count(*) AS BIGINT) AS n
  FROM op a JOIN op b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY 1, 2 HAVING count(*) >= 3)
SELECT CAST(pr.p1 AS BIGINT) AS p1, CAST(pr.p2 AS BIGINT) AS p2,
       pr.n AS n_orders, sa.s AS sup_a, sb.s AS sup_b
FROM pr JOIN isup sa ON sa.pk = pr.p1
        JOIN isup sb ON sb.pk = pr.p2
WHERE 8 * pr.n * pr.n >= 1 * sa.s * sb.s
""",
        # Flesch reading ease as an exact (num, den) rational
        "readability": """
WITH c AS (
  SELECT doc_id,
         CAST(len(regexp_extract_all(lower(text), '[a-z]+')) AS BIGINT)
           AS w,
         CAST(len(regexp_extract_all(lower(text),
              '[a-z]*[aeiouy][a-z]*')) AS BIGINT) AS wv,
         CAST(len(regexp_extract_all(lower(text), '[aeiouy]+')) AS BIGINT)
           AS vg,
         CAST(len(regexp_extract_all(text, '[.!?]+')) AS BIGINT) AS s
  FROM documents
)
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       w AS n_words, s AS n_sentences,
       vg + (w - wv) AS n_syllables,
       206835 * greatest(s, 1) * greatest(w, 1)
         - 1015 * greatest(w, 1) * greatest(w, 1)
         - 84600 * (vg + (w - wv)) * greatest(s, 1) AS flesch_num,
       1000 * greatest(s, 1) * greatest(w, 1) AS flesch_den
FROM c
""",
        # exact decision stump: cumulative (p, n) over distinct values
        # per feature, 0-1 loss, best (errors, threshold) per feature
        "decision_stump": f"""
WITH {KEPT_CTE},
tok_cnt AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
                   CAST(count(DISTINCT tok) AS BIGINT) AS n_types
            FROM kept GROUP BY doc_id),
base AS (
  SELECT d.doc_id, CASE WHEN d.lang = 'en' THEN 1 ELSE 0 END AS y,
         CAST(d.n_chars AS BIGINT) AS n_chars,
         coalesce(t.n_tokens, 0) AS n_tokens,
         coalesce(t.n_types, 0) AS n_types
  FROM documents d LEFT JOIN tok_cnt t USING (doc_id)),
feats AS (
  SELECT 'n_chars' AS feature, n_chars AS value, y FROM base
  UNION ALL SELECT 'n_tokens', n_tokens, y FROM base
  UNION ALL SELECT 'n_types', n_types, y FROM base),
agg AS (SELECT feature, value, sum(y) AS p, count(*) - sum(y) AS n
        FROM feats GROUP BY 1, 2),
scan AS (
  SELECT feature, value AS threshold,
         sum(p) OVER w AS pl, sum(n) OVER w AS nl,
         sum(p) OVER f - sum(p) OVER w AS pr,
         sum(n) OVER f - sum(n) OVER w AS nr
  FROM agg
  WINDOW w AS (PARTITION BY feature ORDER BY value
               ROWS UNBOUNDED PRECEDING),
         f AS (PARTITION BY feature)
),
best AS (
  SELECT feature, threshold,
         least(pl, nl) + least(pr, nr) AS n_errors,
         CASE WHEN pl > nl THEN 1 ELSE 0 END AS left_label,
         CASE WHEN pr > nr THEN 1 ELSE 0 END AS right_label,
         row_number() OVER (PARTITION BY feature
                            ORDER BY least(pl, nl) + least(pr, nr),
                                     threshold) AS rn
  FROM scan)
SELECT feature, CAST(threshold AS BIGINT) AS threshold,
       CAST(n_errors AS BIGINT) AS n_errors,
       CAST(left_label AS BIGINT) AS left_label,
       CAST(right_label AS BIGINT) AS right_label
FROM best WHERE rn = 1
""",
        # MaxSim late interaction: 4-slot ±1 token vectors, per-query-
        # token max over doc tokens (relu), summed — integers throughout
        "maxsim_top10": f"""
WITH {KEPT_CTE},
{QTOK_CTE},
slots(s) AS (VALUES {slot_vals}),
dtoks AS MATERIALIZED (SELECT DISTINCT doc_id, tok FROM kept),
vtoks AS (SELECT DISTINCT tok FROM dtoks),
dtv AS (
  SELECT tok, CAST({h_slot} % {HASH_DIM} AS BIGINT) AS dim,
         sum(CASE WHEN ({h_slot} >> {_SIGN_BIT}) & 1 = 1
                  THEN -1 ELSE 1 END) AS val
  FROM vtoks CROSS JOIN slots GROUP BY tok, dim),
qtv AS (
  SELECT query_id, tok, CAST({h_slot} % {HASH_DIM} AS BIGINT) AS dim,
         sum(CASE WHEN ({h_slot} >> {_SIGN_BIT}) & 1 = 1
                  THEN -1 ELSE 1 END) AS val
  FROM qtok CROSS JOIN slots GROUP BY query_id, tok, dim),
pairsim AS MATERIALIZED (
  SELECT q.query_id, q.tok AS qt, d.tok AS dt, sum(q.val * d.val) AS sim
  FROM qtv q JOIN dtv d USING (dim)
  GROUP BY 1, 2, 3),
contrib AS (
  SELECT p.query_id, p.qt, dk.doc_id, greatest(max(p.sim), 0) AS m
  FROM pairsim p JOIN dtoks dk ON dk.tok = p.dt
  GROUP BY 1, 2, 3),
score AS (
  SELECT query_id, doc_id, CAST(sum(m) AS BIGINT) AS score
  FROM contrib GROUP BY 1, 2
  HAVING sum(m) > 0)
SELECT query_id, CAST(rn AS BIGINT) AS rank,
       CAST(doc_id AS BIGINT) AS doc_id, score
FROM (
  SELECT query_id, doc_id, score,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY score DESC, doc_id ASC) AS rn
  FROM score
) WHERE rn <= 10
""",
        # day-of-week profile: pure (day+3)%7 arithmetic on both sides
        "dow_profile": """
WITH cnt AS (
  SELECT event_type, epoch_us(ts) // 86400000000 AS day,
         CAST(count(*) AS BIGINT) AS n,
         CAST(coalesce(sum(CASE WHEN event_type = 'purchase'
                  THEN CAST(round(value * 100) AS BIGINT) END), 0)
              AS BIGINT) AS c
  FROM events GROUP BY 1, 2),
b AS (SELECT min(day) AS lo, max(day) AS hi FROM cnt),
dd AS (SELECT (d + 3) % 7 AS dow, CAST(count(*) AS BIGINT) AS n_days
       FROM (SELECT unnest(range((SELECT lo FROM b),
                                 (SELECT hi FROM b) + 1)) AS d)
       GROUP BY 1),
g AS (SELECT event_type, (day + 3) % 7 AS dow,
             CAST(sum(n) AS BIGINT) AS n_events,
             CAST(sum(c) AS BIGINT) AS cents
      FROM cnt GROUP BY 1, 2)
SELECT g.event_type, CAST(g.dow AS BIGINT) AS dow, g.n_events, g.cents,
       dd.n_days
FROM g JOIN dd USING (dow)
""",
        # conversion-delay quantiles: first purchase at/after first view
        "conversion_delay": """
WITH fv AS (SELECT user_id, min(epoch_us(ts)) AS t0
            FROM events WHERE event_type = 'view' GROUP BY 1),
fp AS (SELECT e.user_id, min(epoch_us(e.ts)) AS t1
       FROM events e JOIN fv ON fv.user_id = e.user_id
       WHERE e.event_type = 'purchase' AND epoch_us(e.ts) >= fv.t0
       GROUP BY 1),
d AS (SELECT fv.user_id, fp.t1 - fv.t0 AS delay
      FROM fv JOIN fp USING (user_id)),
nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM d),
r AS (SELECT delay,
             row_number() OVER (ORDER BY delay, user_id) AS rnk
      FROM d)
SELECT CAST(p.pct AS BIGINT) AS pct, CAST(r.delay AS BIGINT) AS delay_us,
       (SELECT n FROM nn) AS n_users
FROM (VALUES (50), (90)) p(pct)
JOIN r ON r.rnk = greatest(
  1, (p.pct * (SELECT n FROM nn) + 99) // 100)
""",
        # sliding-window rate limiter: RANGE-frame count over epoch_us
        "rate_limit_flags": """
WITH c AS (
  SELECT event_id, user_id,
         count(*) OVER (PARTITION BY user_id ORDER BY epoch_us(ts)
                        RANGE BETWEEN 3600000000 PRECEDING
                              AND CURRENT ROW) AS n
  FROM events)
SELECT CAST(event_id AS BIGINT) AS event_id,
       CAST(user_id AS BIGINT) AS user_id,
       CAST(n AS BIGINT) AS n_in_window
FROM c WHERE n > {RL}
""".replace("{RL}", str(RATE_LIMIT_N)),
        # RFM segmentation: rank-based NTILE(4) per metric, SQL windows
        "rfm_segments": """
WITH f AS (
  SELECT user_id,
         max(epoch_us(ts)) AS last_ts,
         count(*) AS n_events,
         coalesce(sum(CASE WHEN event_type = 'purchase'
                           THEN CAST(round(value * 100) AS BIGINT) END),
                  0) AS cents
  FROM events GROUP BY user_id
),
s AS (
  SELECT user_id,
         ntile(4) OVER (ORDER BY last_ts, user_id) AS r_score,
         ntile(4) OVER (ORDER BY n_events, user_id) AS f_score,
         ntile(4) OVER (ORDER BY cents, user_id) AS m_score
  FROM f
)
SELECT CAST(user_id AS BIGINT) AS user_id,
       CAST(r_score AS BIGINT) AS r_score,
       CAST(f_score AS BIGINT) AS f_score,
       CAST(m_score AS BIGINT) AS m_score,
       CAST(100 * r_score + 10 * f_score + m_score AS BIGINT)
         AS segment_code
FROM s
""",
        # point-in-time join: purchases against the SCD2 version chain,
        # version valid at ts (same dedup/collapse CTEs as scd2_dim)
        "scd2_join": """
WITH ch AS (
  SELECT user_id, ts, event_id,
         CAST(regexp_extract(props, '"k":\\s*(-?\\d+)', 1) AS BIGINT) AS segment
  FROM events WHERE event_type = 'view'
),
dedup AS (
  SELECT user_id, ts, event_id, segment FROM (
    SELECT user_id, ts, event_id, segment,
           lag(segment) OVER (PARTITION BY user_id
                              ORDER BY ts, event_id) AS prev
    FROM ch)
  WHERE prev IS NULL OR segment <> prev
),
dim AS (
  SELECT user_id, epoch_us(ts) AS f,
         coalesce(epoch_us(lead(ts) OVER (PARTITION BY user_id
                                          ORDER BY ts, event_id)), -1) AS t,
         segment
  FROM dedup
),
p AS (
  SELECT event_id, user_id, epoch_us(ts) AS tsu
  FROM events WHERE event_type = 'purchase'
)
SELECT CAST(p.event_id AS BIGINT) AS event_id,
       CAST(p.user_id AS BIGINT) AS user_id,
       CAST(coalesce(d.segment, -1) AS BIGINT) AS segment
FROM p LEFT JOIN dim d
  ON d.user_id = p.user_id AND d.f <= p.tsu AND (d.t = -1 OR p.tsu < d.t)
""",
        # pairwise source L1 over normalized length histograms
        "source_hist_l1": """
WITH h AS (
  SELECT source, n_chars // 64 AS bin, CAST(count(*) AS BIGINT) AS c
  FROM documents GROUP BY 1, 2),
t AS (SELECT source, CAST(sum(c) AS BIGINT) AS n FROM h GROUP BY 1),
pairs AS (SELECT a.source AS sa, b.source AS sb, a.n AS na, b.n AS nb
          FROM t a JOIN t b ON a.source < b.source),
bins AS (
  SELECT p.sa, p.sb, p.na, p.nb,
         coalesce(ha.c, 0) AS ca, coalesce(hb.c, 0) AS cb
  FROM pairs p
  JOIN (SELECT DISTINCT bin FROM h) ab ON true
  LEFT JOIN h ha ON ha.source = p.sa AND ha.bin = ab.bin
  LEFT JOIN h hb ON hb.source = p.sb AND hb.bin = ab.bin)
SELECT sa AS src_a, sb AS src_b,
       CAST(sum(abs(ca * nb - cb * na)) AS BIGINT) AS l1_num,
       CAST(min(na * nb) AS BIGINT) AS l1_den
FROM bins GROUP BY 1, 2, na, nb
""",
        # KMV global sketch state: bottom-k distinct kept-token hashes
        "kmv_registers": f"""
WITH {KEPT_CTE},
gh AS (SELECT DISTINCT {h_tok} AS h FROM kept),
g AS (SELECT h, row_number() OVER (ORDER BY h) AS rank FROM gh)
SELECT CAST(rank AS BIGINT) AS rank,
       {signed_h.format(col="h")} AS kmv_hash
FROM g WHERE rank <= {KMV_K}
""",
        # KMV pairwise source overlap: union sketch = bottom-k of the
        # two per-source sketches; integer KMV estimators
        "kmv_source_overlap": f"""
WITH {KEPT_CTE},
st AS (SELECT DISTINCT d.source AS source, {h_tok} AS h
       FROM kept k JOIN documents d USING (doc_id)),
ssk AS MATERIALIZED (
  SELECT source, h FROM (
    SELECT source, h,
           row_number() OVER (PARTITION BY source ORDER BY h) AS r
    FROM st) t WHERE r <= {KMV_K}),
srcs AS (SELECT DISTINCT source FROM documents),
pairs AS (SELECT a.source AS sa, b.source AS sb
          FROM srcs a JOIN srcs b ON a.source < b.source),
uh AS (SELECT p.sa, p.sb, s.h
       FROM pairs p JOIN ssk s ON s.source IN (p.sa, p.sb)
       GROUP BY p.sa, p.sb, s.h),
urk AS (SELECT sa, sb, h,
               row_number() OVER (PARTITION BY sa, sb ORDER BY h) AS r
        FROM uh),
usk AS MATERIALIZED (SELECT sa, sb, h FROM urk WHERE r <= {KMV_K}),
ag AS (SELECT sa, sb, CAST(count(*) AS BIGINT) AS ku, max(h) AS hk
       FROM usk GROUP BY sa, sb),
mt AS (SELECT u.sa, u.sb, CAST(count(*) AS BIGINT) AS n_match
       FROM usk u
       JOIN ssk x ON x.source = u.sa AND x.h = u.h
       JOIN ssk y ON y.source = u.sb AND y.h = u.h
       GROUP BY u.sa, u.sb),
fin AS (
  SELECT ag.sa, ag.sb, coalesce(mt.n_match, 0) AS n_match, ag.ku,
         CASE WHEN ag.ku < {KMV_K} THEN ag.ku::HUGEINT
              ELSE ({KMV_K - 1}::HUGEINT
                    * 18446744073709551616::HUGEINT) // ag.hk::HUGEINT
         END AS union_est
  FROM ag LEFT JOIN mt ON mt.sa = ag.sa AND mt.sb = ag.sb)
SELECT sa AS src_a, sb AS src_b, n_match,
       CAST(union_est AS BIGINT) AS union_est,
       CAST((n_match::HUGEINT * union_est) // ku AS BIGINT) AS inter_est
FROM fin
""",
        # Adamic-Adar: the wedge self-join weighted by the SAME fixed
        # integer 1/ln(deg) LUT the engine uses (clustering.aa_weight_lut)
        "adamic_adar": f"""
WITH {_knn_edge_ctes()},
lut(d, w) AS (VALUES {aa_lut_rows}),
aa AS (
  SELECT s1.y AS u, s2.y AS v,
         CAST(count(*) AS BIGINT) AS n_common,
         CAST(sum(l.w) AS BIGINT) AS aa_score
  FROM sadj s1 JOIN sadj s2 ON s1.x = s2.x AND s1.y < s2.y
  JOIN deg dz ON dz.x = s1.x
  JOIN lut l ON l.d = least(dz.deg, {AA_DEG_CAP})
  GROUP BY 1, 2),
nonadj AS (
  SELECT aa.u, aa.v, aa.n_common, aa.aa_score
  FROM aa LEFT JOIN edges e ON e.u = aa.u AND e.v = aa.v
  WHERE e.u IS NULL)
SELECT CAST(u AS BIGINT) AS u, CAST(v AS BIGINT) AS v, n_common, aa_score
FROM nonadj
ORDER BY aa_score DESC, u, v
LIMIT {AA_TOPK}
""",
    }

    # release gate: compose FIVE audit subsystems' oracle SQL — the
    # driver hash-checks the cross-subsystem wiring
    _ka_sql = session12_oracles()["k_anonymity"].strip().rstrip(";")
    _fk_sql = holistic_audit_oracles()["fk_audit"].strip().rstrip(";")
    _dg_sql = digest_oracles()["corpus_digest"].strip().rstrip(";")
    _ld_sql = d["l_diversity"].strip()
    _fd_sql = d["fd_audit"].strip()
    d["release_report"] = f"""
SELECT 'corpus_digest' AS "check",
       CAST(sum(digest) % 1099511627776 AS BIGINT) AS metric,
       CAST(1 AS BIGINT) AS passed
FROM ({_dg_sql})
UNION ALL
SELECT 'fd_violations', CAST(sum(n_violating_keys) AS BIGINT),
       CAST(sum(n_violating_keys) = 0 AS BIGINT) FROM ({_fd_sql})
UNION ALL
SELECT 'fk_orphans', CAST(sum(n_orphans) AS BIGINT),
       CAST(sum(n_orphans) = 0 AS BIGINT) FROM ({_fk_sql})
UNION ALL
SELECT 'k_anonymity', CAST(count(*) AS BIGINT),
       CAST(count(*) = 0 AS BIGINT) FROM ({_ka_sql})
UNION ALL
SELECT 'l_diversity', CAST(count(*) AS BIGINT),
       CAST(count(*) = 0 AS BIGINT) FROM ({_ld_sql})
UNION ALL
SELECT 't_closeness', CAST(count(*) AS BIGINT),
       CAST(count(*) = 0 AS BIGINT)
FROM ({session17_oracles()["t_closeness"].strip()}) WHERE violates = 1
"""
    return d


def session14_oracles() -> dict[str, str]:
    from candidategeneration_ray.pipelines.textlm import TRAIN_PCT

    h64_docid = _H64.format(expr="CAST(doc_id AS VARCHAR)")
    # Kneser-Ney rational surface: pnum = (4c-3)*T + 3*N1L*N1R,
    # pden = 4*c(w1.)*T  (D = 3/4 exactly)
    kn = f"""
WITH {KEPT_CTE},
tr AS (SELECT doc_id FROM documents WHERE {h64_docid} % 100 < {TRAIN_PCT}),
seq AS (SELECT k.doc_id, k.kpos, k.tok FROM kept k JOIN tr USING (doc_id)),
bg AS MATERIALIZED (
  SELECT a.tok AS w1, b.tok AS w2, CAST(count(*) AS BIGINT) AS c
  FROM seq a JOIN seq b ON b.doc_id = a.doc_id AND b.kpos = a.kpos + 1
  GROUP BY 1, 2
),
lft AS (SELECT w1, CAST(sum(c) AS BIGINT) AS c1,
               CAST(count(*) AS BIGINT) AS n1l FROM bg GROUP BY w1),
rgt AS (SELECT w2, CAST(count(*) AS BIGINT) AS n1r FROM bg GROUP BY w2),
tt AS (SELECT CAST(count(*) AS BIGINT) AS t FROM bg)
SELECT w1, w2, c,
       CAST((4 * c - 3) * t + 3 * n1l * n1r AS BIGINT) AS pnum,
       CAST(4 * c1 * t AS BIGINT) AS pden
FROM bg JOIN lft USING (w1) JOIN rgt USING (w2) CROSS JOIN tt
ORDER BY c DESC, w1 ASC, w2 ASC LIMIT 200
"""
    nb_model = f"""
WITH {KEPT_CTE},
tr AS (SELECT doc_id, lang FROM documents
       WHERE {h64_docid} % 100 < {TRAIN_PCT})
SELECT t.lang, k.tok, CAST(count(*) AS BIGINT) AS cnt
FROM kept k JOIN tr t USING (doc_id)
GROUP BY 1, 2
"""
    nb_predict = f"""
WITH {KEPT_CTE},
tr AS (SELECT doc_id, lang FROM documents
       WHERE {h64_docid} % 100 < {TRAIN_PCT}),
cls AS (SELECT lang, CAST(count(*) AS BIGINT) AS ndocs FROM tr GROUP BY lang),
tot AS (SELECT CAST(sum(ndocs) AS BIGINT) AS n FROM cls),
mk AS MATERIALIZED (
  SELECT t.lang, k.tok, CAST(count(*) AS BIGINT) AS cnt
  FROM kept k JOIN tr t USING (doc_id) GROUP BY 1, 2
),
voc AS (SELECT DISTINCT tok FROM mk),
vsz AS (SELECT CAST(count(*) AS BIGINT) AS v FROM voc),
tc AS (SELECT lang, CAST(sum(cnt) AS BIGINT) AS t FROM mk GROUP BY lang),
w AS MATERIALIZED (
  SELECT c.lang, vo.tok,
         CAST(trunc(ln(CAST(coalesce(m.cnt, 0) + 1 AS DOUBLE)
                       / CAST(tc.t + vsz.v AS DOUBLE)) * 10000000)
              AS BIGINT) AS w
  FROM cls c CROSS JOIN voc vo
  JOIN tc ON tc.lang = c.lang CROSS JOIN vsz
  LEFT JOIN mk m ON m.lang = c.lang AND m.tok = vo.tok
),
pri AS (SELECT lang, CAST(trunc(ln(CAST(ndocs AS DOUBLE)
                                   / CAST(tot.n AS DOUBLE)) * 10000000)
                          AS BIGINT) AS pw
        FROM cls CROSS JOIN tot),
vd AS (SELECT doc_id FROM documents WHERE {h64_docid} % 100 >= {TRAIN_PCT}),
vtf AS (SELECT k.doc_id, k.tok, CAST(count(*) AS BIGINT) AS tf
        FROM kept k JOIN vd USING (doc_id) JOIN voc USING (tok)
        GROUP BY 1, 2),
sc AS (
  SELECT d.doc_id, p.lang,
         p.pw + coalesce(sum(v2.tf * w.w), 0) AS score,
         coalesce(sum(v2.tf), 0) AS nk
  FROM vd d CROSS JOIN pri p
  LEFT JOIN vtf v2 ON v2.doc_id = d.doc_id
  LEFT JOIN w ON w.lang = p.lang AND w.tok = v2.tok
  GROUP BY 1, 2, p.pw
)
SELECT doc_id, lang AS pred_lang, CAST(score AS BIGINT) AS score,
       CAST(nk AS BIGINT) AS n_known
FROM (SELECT *, row_number() OVER (PARTITION BY doc_id
                                   ORDER BY score DESC, lang ASC) AS rn
      FROM sc)
WHERE rn = 1
"""
    auc = f"""
WITH {_WORDS_CTE},
sc AS (
  SELECT (5000 * coalesce(w.n_stop, 0))
           // greatest(coalesce(w.n_words, 0), 1) AS s,
         CAST(count(*) FILTER (d.lang = 'en') AS BIGINT) AS pos,
         CAST(count(*) FILTER (d.lang <> 'en') AS BIGINT) AS neg
  FROM documents d LEFT JOIN wstats w USING (doc_id)
  GROUP BY 1
),
r AS (
  SELECT pos, neg,
         coalesce(sum(neg) OVER (ORDER BY s
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cneg
  FROM sc
),
f AS (SELECT CAST(sum(pos * (2 * cneg + neg)) AS BIGINT) AS u2 FROM r),
nn AS (SELECT CAST(sum(pos) AS BIGINT) AS n_pos,
              CAST(sum(neg) AS BIGINT) AS n_neg FROM sc)
SELECT n_pos, n_neg, u2,
       CASE WHEN n_pos > 0 AND n_neg > 0
            THEN CAST((1000000 * u2) // (2 * n_pos * n_neg) AS BIGINT)
            ELSE CAST(-1 AS BIGINT) END AS auc_ppm
FROM f CROSS JOIN nn
"""
    return {"kn_bigram_lm": kn, "nb_model": nb_model,
            "nb_predict": nb_predict, "auc_eval": auc}


def session16_oracles() -> dict[str, str]:
    """Session-16 oracles: gradient-boosted stumps (unrolled rounds,
    the k-means/PageRank verification pattern applied to Friedman's
    GBM — every leaf a `//`-truncated mean, every split ranked by the
    exact integer SSE of those leaves)."""
    from candidategeneration_ray.pipelines.extras import (
        GBDT_ROUNDS, GBDT_SCALE)

    feats = [("n_punct_chars", "x_punct"), ("n_stop", "x_stop"),
             ("n_words", "x_words")]
    parts = [f"""res0 AS MATERIALIZED (
  SELECT d.doc_id,
         CAST(coalesce(w.n_words, 0) AS BIGINT) AS x_words,
         CAST(coalesce(w.n_stop, 0) AS BIGINT) AS x_stop,
         CAST(len(regexp_extract_all(d.text, '[^A-Za-z0-9\\s]'))
              AS BIGINT) AS x_punct,
         CAST({GBDT_SCALE} AS HUGEINT) * length(d.text) AS r
  FROM documents d LEFT JOIN wstats w USING (doc_id))"""]
    for t in range(1, GBDT_ROUNDS + 1):
        unpivot = " UNION ALL ".join(
            f"SELECT '{f}' AS feature, {c} AS value, r FROM res{t - 1}"
            for f, c in feats)
        parts.append(f"""agg{t} AS (
  SELECT feature, value, CAST(count(*) AS HUGEINT) AS cnt,
         sum(r) AS s1, sum(r * r) AS s2
  FROM ({unpivot}) GROUP BY 1, 2)""")
        parts.append(f"""scan{t} AS (
  SELECT feature, value AS threshold,
         sum(cnt) OVER w AS nl, sum(s1) OVER w AS sl1,
         sum(s2) OVER w AS sl2,
         sum(cnt) OVER f - sum(cnt) OVER w AS nr,
         sum(s1) OVER f - sum(s1) OVER w AS sr1,
         sum(s2) OVER f - sum(s2) OVER w AS sr2
  FROM agg{t}
  WINDOW w AS (PARTITION BY feature ORDER BY value
               ROWS UNBOUNDED PRECEDING),
         f AS (PARTITION BY feature))""")
        parts.append(f"""cand{t} AS (
  SELECT feature, threshold, sl1 // nl AS leaf_l,
         CASE WHEN nr = 0 THEN 0 ELSE sr1 // nr END AS leaf_r,
         (sl2 - 2 * (sl1 // nl) * sl1 + nl * (sl1 // nl) * (sl1 // nl))
         + CASE WHEN nr = 0 THEN 0
                ELSE sr2 - 2 * (sr1 // nr) * sr1
                     + nr * (sr1 // nr) * (sr1 // nr)
           END AS sse
  FROM scan{t})""")
        parts.append(f"""best{t} AS (
  SELECT * FROM cand{t} ORDER BY sse, feature, threshold LIMIT 1)""")
        parts.append(f"""res{t} AS MATERIALIZED (
  SELECT r.doc_id, r.x_words, r.x_stop, r.x_punct,
         r.r - (CASE b.feature
                WHEN 'n_words' THEN CASE WHEN r.x_words <= b.threshold
                                         THEN b.leaf_l ELSE b.leaf_r END
                WHEN 'n_stop' THEN CASE WHEN r.x_stop <= b.threshold
                                        THEN b.leaf_l ELSE b.leaf_r END
                ELSE CASE WHEN r.x_punct <= b.threshold
                          THEN b.leaf_l ELSE b.leaf_r END
                END) AS r
  FROM res{t - 1} r CROSS JOIN best{t} b)""")
    final = "\nUNION ALL\n".join(
        f"SELECT CAST({t} AS BIGINT) AS round, feature,"
        f" CAST(threshold AS BIGINT) AS threshold,"
        f" CAST(leaf_l AS BIGINT) AS leaf_l,"
        f" CAST(leaf_r AS BIGINT) AS leaf_r,"
        f" CAST(sse AS BIGINT) AS sse FROM best{t}"
        for t in range(1, GBDT_ROUNDS + 1))
    gbdt = ("WITH " + _WORDS_CTE + ",\n" + ",\n".join(parts)
            + "\n" + final)

    from candidategeneration_ray.pipelines.extras import (
        ISO_BINS, ISO_KEY_SCALE)

    # isotonic (PAVA) calibration via the exact minimax form:
    # fit(k) = max_{i<=k} min_{j>=k} of the interval average, compared
    # through the (SCALE*P)//N order-embedding key on both sides
    isotonic = f"""
WITH {_WORDS_CTE},
bin AS (
  SELECT ({ISO_BINS} * coalesce(w.n_stop, 0))
           // greatest(coalesce(w.n_words, 0), 1) AS s,
         CASE WHEN d.lang = 'en' THEN 1 ELSE 0 END AS y
  FROM documents d LEFT JOIN wstats w USING (doc_id)),
agg AS (SELECT s, CAST(count(*) AS BIGINT) AS n,
               CAST(sum(y) AS BIGINT) AS p
        FROM bin GROUP BY s),
ord AS (SELECT s, n, p,
               row_number() OVER (ORDER BY s) AS k,
               sum(n) OVER (ORDER BY s) AS cn,
               sum(p) OVER (ORDER BY s) AS cp
        FROM agg),
iv AS (
  SELECT a.k AS i, b.k AS j,
         (CAST({ISO_KEY_SCALE} AS HUGEINT) * (b.cp - a.cp + a.p))
           // (b.cn - a.cn + a.n) AS key
  FROM ord a JOIN ord b ON a.k <= b.k),
mn AS (
  SELECT iv.i, o.k, min(iv.key) AS mnk
  FROM iv JOIN ord o ON iv.i <= o.k AND iv.j >= o.k
  GROUP BY iv.i, o.k),
fit AS (SELECT k, max(mnk) AS fit_s12 FROM mn GROUP BY k)
SELECT o.s, o.n, o.p, CAST(f.fit_s12 AS BIGINT) AS fit_s12
FROM ord o JOIN fit f USING (k)
"""
    # Gini of per-user purchase spend: exact integer fraction over the
    # ascending (cents, user_id) ranking; numerator is >= 0 by the
    # rearrangement inequality so // floor == toward-zero on both sides
    gini = """
WITH per_user AS (
  SELECT user_id, CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
           AS cents
  FROM events WHERE event_type = 'purchase' GROUP BY user_id),
rk AS (SELECT cents,
              row_number() OVER (ORDER BY cents, user_id) AS r
       FROM per_user),
m AS (SELECT CAST(count(*) AS HUGEINT) AS n,
             CAST(sum(cents) AS HUGEINT) AS t,
             CAST(sum(r * cents) AS HUGEINT) AS rx
      FROM rk)
SELECT CAST(n AS BIGINT) AS n_users, CAST(t AS BIGINT) AS total_cents,
       CAST(2 * rx - (n + 1) * t AS BIGINT) AS gini_num,
       CAST(n * t AS BIGINT) AS gini_den,
       CASE WHEN n * t = 0 THEN CAST(0 AS BIGINT)
            ELSE CAST((1000000 * (2 * rx - (n + 1) * t)) // (n * t)
                      AS BIGINT) END AS gini_ppm
FROM m
"""
    # Soundex (simplified variant, no h/w exception — see
    # lexicon.soundex_code): translate to digits, collapse runs per
    # digit, drop the leading run, strip zeros, pad to 3 behind the
    # uppercased first letter
    from candidategeneration_ray.pipelines.lexicon import _SOUNDEX_DIGITS

    collapsed = ("translate(term, 'abcdefghijklmnopqrstuvwxyz', "
                 f"'{_SOUNDEX_DIGITS}')")
    for dgt in "0123456":
        collapsed = ("regexp_replace(" + collapsed + ", '" + dgt
                     + "{2,}', '" + dgt + "', 'g')")
    code_expr = (
        "upper(substr(term, 1, 1)) || rpad(substr(replace(substr("
        + collapsed + ", 2), '0', ''), 1, 3), 3, '0')")
    dft = ("dft AS (SELECT tok AS term, CAST(count(DISTINCT doc_id) AS "
           "BIGINT) AS df FROM kept GROUP BY tok)")
    sx_cte = (f"WITH {KEPT_CTE},\n{dft},\n"
              "al AS (SELECT term, df FROM dft "
              "WHERE regexp_full_match(term, '[a-z]+')),\n"
              f"sx AS (SELECT term, df, {code_expr} AS code FROM al)")
    soundex_terms = sx_cte + "\nSELECT term, df, code FROM sx"
    from candidategeneration_ray.pipelines.lexicon import PHONETIC_QUERIES

    pq_vals = ", ".join(f"('{w}')" for w in PHONETIC_QUERIES)
    phonetic_lookup = sx_cte + f""",
probe(qword) AS (VALUES {pq_vals}),
pc AS (SELECT qword, {code_expr.replace('term', 'qword')} AS code
       FROM probe)
SELECT pc.qword, sx.term, sx.df, sx.code
FROM pc JOIN sx ON sx.code = pc.code
"""
    # content-defined chunking: cut after token e iff the K-token
    # window hash ending at e is divisible by D (final window excluded)
    from candidategeneration_ray.pipelines.extras import CDC_D, CDC_K

    cdc_h = _H64.format(
        expr=f"array_to_string(list_slice(l, i, i + {CDC_K - 1}), ' ')")
    cdc_cte = f"""WITH {KEPT_CTE},
{_DOCS_TOKS},
sh AS (SELECT doc_id, l,
              unnest(range(1, greatest(len(l) - {CDC_K}, 0) + 1)) AS i
       FROM docs_toks),
cuts AS (SELECT doc_id, i + {CDC_K - 1} AS e
         FROM sh WHERE {cdc_h} % {CDC_D} = 0),
tokc AS (
  SELECT k.doc_id, k.kpos, k.tok, CAST(count(c.e) AS BIGINT) AS ci
  FROM kept k LEFT JOIN cuts c ON c.doc_id = k.doc_id AND c.e < k.kpos
  GROUP BY k.doc_id, k.kpos, k.tok),
ch AS (
  SELECT doc_id, ci AS chunk_idx,
         CAST(min(kpos) AS BIGINT) AS start_kpos,
         CAST(count(*) AS BIGINT) AS n_tokens,
         md5(string_agg(tok, ' ' ORDER BY kpos)) AS chunk_md5
  FROM tokc GROUP BY doc_id, ci)"""
    cdc_chunks = cdc_cte + """
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       CAST(chunk_idx AS BIGINT) AS chunk_idx,
       start_kpos, n_tokens, chunk_md5
FROM ch"""
    cdc_stats = cdc_cte + """,
g AS (SELECT chunk_md5, CAST(count(*) AS BIGINT) AS cnt,
             CAST(min(n_tokens) AS BIGINT) AS len,
             CAST(sum(n_tokens) AS BIGINT) AS tok_sum
      FROM ch GROUP BY chunk_md5)
SELECT CAST(sum(cnt) AS BIGINT) AS total_chunks,
       CAST(count(*) AS BIGINT) AS distinct_chunks,
       CAST(sum(cnt) - count(*) AS BIGINT) AS dup_chunks,
       CAST(sum(tok_sum) AS BIGINT) AS total_tokens,
       CAST(sum((cnt - 1) * len) AS BIGINT) AS redundant_tokens
FROM g"""
    # V-optimal histogram: B unrolled DP layers over the dense
    # doc-length frequency series, integer segment costs (truncated
    # mean, the gbdt convention), backtracked cut chain
    from candidategeneration_ray.pipelines.sketches import (
        VOPT_BIN_WIDTH, VOPT_BUCKETS)

    B = VOPT_BUCKETS
    vparts = [f"""agg AS (SELECT n_chars // {VOPT_BIN_WIDTH} AS s,
       CAST(count(*) AS BIGINT) AS f FROM documents GROUP BY 1)""",
              "mx AS (SELECT CAST(max(s) AS BIGINT) AS m FROM agg)",
              """dense AS (
  SELECT d.s, coalesce(a.f, 0) AS f
  FROM (SELECT unnest(range(0, (SELECT m FROM mx) + 1)) AS s) d
  LEFT JOIN agg a USING (s))""",
              """pre AS (
  SELECT s, f, sum(f) OVER w AS c1, sum(f * f) OVER w AS c2
  FROM dense WINDOW w AS (ORDER BY s ROWS UNBOUNDED PRECEDING))""",
              """cc AS MATERIALIZED (
  SELECT i, j, s1,
         s2 - 2 * (s1 // n) * s1 + n * (s1 // n) * (s1 // n) AS c
  FROM (
    SELECT i.s AS i, j.s AS j,
           (j.c1 - i.c1 + i.f) AS s1,
           (j.c2 - i.c2 + i.f * i.f) AS s2,
           (j.s - i.s + 1) AS n
    FROM pre i JOIN pre j ON j.s >= i.s))""",
              ("dp1 AS (SELECT j, c AS v, CAST(0 AS BIGINT) AS ci "
               "FROM cc WHERE i = 0)")]
    for b in range(2, B + 1):
        vparts.append(f"""dp{b} AS (
  SELECT j, v, ci FROM (
    SELECT c.j, p.v + c.c AS v, c.i AS ci,
           row_number() OVER (PARTITION BY c.j
                              ORDER BY p.v + c.c, c.i) AS rn
    FROM cc c JOIN dp{b - 1} p ON p.j = c.i - 1) WHERE rn = 1)""")
    vparts.append(f"r{B} AS (SELECT j, ci FROM dp{B} "
                  "WHERE j = (SELECT m FROM mx))")
    for b in range(B - 1, 1, -1):
        vparts.append(f"r{b} AS (SELECT d.j, d.ci FROM dp{b} d "
                      f"JOIN r{b + 1} r ON d.j = r.ci - 1)")
    seg_sel = "\nUNION ALL\n".join(
        ["SELECT CAST(1 AS BIGINT) AS bucket, CAST(0 AS BIGINT) AS lo,"
         " CAST(ci - 1 AS BIGINT) AS hi FROM r2"]
        + [f"SELECT CAST({b} AS BIGINT), CAST(ci AS BIGINT),"
           f" CAST(j AS BIGINT) FROM r{b}" for b in range(2, B + 1)])
    vopt = ("WITH " + ",\n".join(vparts) + ",\nsegs AS (" + seg_sel
            + """)
SELECT g.bucket, g.lo AS lo_bin, g.hi AS hi_bin,
       CAST(cc.s1 AS BIGINT) AS n_docs, CAST(cc.c AS BIGINT) AS sse
FROM segs g JOIN cc ON cc.i = g.lo AND cc.j = g.hi""")
    # k-fold CV of the decision stump: the per-(fold, feature, value)
    # counts are sufficient for BOTH train (total - fold) and val
    # (fold's own minority counts under the winning stump)
    from candidategeneration_ray.pipelines.extras import CV_FOLDS

    h64_docid = _H64.format(expr="CAST(doc_id AS VARCHAR)")
    cv_stump = f"""
WITH {KEPT_CTE},
tok_cnt AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
                   CAST(count(DISTINCT tok) AS BIGINT) AS n_types
            FROM kept GROUP BY doc_id),
base AS (
  SELECT d.doc_id, CAST({h64_docid} % {CV_FOLDS} AS BIGINT) AS fold,
         CASE WHEN d.lang = 'en' THEN 1 ELSE 0 END AS y,
         CAST(d.n_chars AS BIGINT) AS n_chars,
         coalesce(t.n_tokens, 0) AS n_tokens,
         coalesce(t.n_types, 0) AS n_types
  FROM documents d LEFT JOIN tok_cnt t USING (doc_id)),
feats AS (
  SELECT fold, 'n_chars' AS feature, n_chars AS value, y FROM base
  UNION ALL SELECT fold, 'n_tokens', n_tokens, y FROM base
  UNION ALL SELECT fold, 'n_types', n_types, y FROM base),
agg AS (SELECT fold, feature, value, sum(y) AS p,
               count(*) - sum(y) AS n
        FROM feats GROUP BY 1, 2, 3),
fl AS (SELECT unnest(range(0, {CV_FOLDS})) AS f),
trv AS (
  SELECT fl.f, a.feature, a.value,
         sum(CASE WHEN a.fold <> fl.f THEN a.p ELSE 0 END) AS p,
         sum(CASE WHEN a.fold <> fl.f THEN a.n ELSE 0 END) AS n,
         sum(CASE WHEN a.fold = fl.f THEN a.p ELSE 0 END) AS vp,
         sum(CASE WHEN a.fold = fl.f THEN a.n ELSE 0 END) AS vn
  FROM fl CROSS JOIN agg a GROUP BY 1, 2, 3),
scan AS (
  SELECT f, feature, value AS threshold, vp, vn,
         sum(p) OVER w AS pl, sum(n) OVER w AS nl,
         sum(p) OVER t - sum(p) OVER w AS pr,
         sum(n) OVER t - sum(n) OVER w AS nr
  FROM trv
  WINDOW w AS (PARTITION BY f, feature ORDER BY value
               ROWS UNBOUNDED PRECEDING),
         t AS (PARTITION BY f, feature)),
best AS (
  SELECT f, feature, threshold,
         least(pl, nl) + least(pr, nr) AS train_errors,
         CASE WHEN pl > nl THEN 1 ELSE 0 END AS left_label,
         CASE WHEN pr > nr THEN 1 ELSE 0 END AS right_label,
         row_number() OVER (PARTITION BY f
                            ORDER BY least(pl, nl) + least(pr, nr),
                                     feature, threshold) AS rn
  FROM scan),
win AS (SELECT * FROM best WHERE rn = 1),
val AS (
  SELECT w.f,
         sum(CASE WHEN (CASE WHEN t.value <= w.threshold
                             THEN w.left_label ELSE w.right_label END) = 1
                  THEN t.vn ELSE t.vp END) AS val_errors
  FROM win w JOIN trv t ON t.f = w.f AND t.feature = w.feature
  GROUP BY w.f)
SELECT CAST(w.f AS BIGINT) AS fold, w.feature,
       CAST(w.threshold AS BIGINT) AS threshold,
       CAST(w.left_label AS BIGINT) AS left_label,
       CAST(w.right_label AS BIGINT) AS right_label,
       CAST(w.train_errors AS BIGINT) AS train_errors,
       CAST(coalesce(v.val_errors, 0) AS BIGINT) AS val_errors
FROM win w JOIN val v USING (f)
"""
    # LPT shard planning: recursive CTE replays the greedy, one cell
    # per step, shard loads as explicit columns, first-minimum pick
    from candidategeneration_ray.pipelines.relational import SHARD_PLAN_N

    ns = SHARD_PLAN_N
    lcols = [f"l{i}" for i in range(1, ns + 1)]
    pick = "CASE "
    for i in range(1, ns):
        conds = " AND ".join(f"l{i} <= l{j}"
                             for j in range(i + 1, ns + 1))
        pick += f"WHEN {conds} THEN {i} "
    pick += f"ELSE {ns} END"
    upd = ",\n         ".join(
        f"rec.l{i} + CASE WHEN ({pick}) = {i} THEN rk.mass ELSE 0 END"
        f" AS l{i}" for i in range(1, ns + 1))
    init_loads = ", ".join(f"CAST(0 AS BIGINT) AS l{i}"
                           for i in range(1, ns + 1))
    shard_plan = f"""
WITH RECURSIVE
cells AS (SELECT source, lang, CAST(sum(n_chars) AS BIGINT) AS mass
          FROM documents GROUP BY 1, 2),
rk AS (SELECT *, row_number() OVER (ORDER BY mass DESC, source, lang)
              AS r
       FROM cells),
rec AS (
  SELECT CAST(0 AS BIGINT) AS r, {init_loads},
         CAST(NULL AS VARCHAR) AS source, CAST(NULL AS VARCHAR) AS lang,
         CAST(NULL AS BIGINT) AS mass, CAST(NULL AS BIGINT) AS shard
  UNION ALL
  SELECT rk.r,
         {upd},
         rk.source, rk.lang, rk.mass, CAST(({pick}) AS BIGINT) AS shard
  FROM rec JOIN rk ON rk.r = rec.r + 1
)
SELECT source, lang, mass, shard FROM rec WHERE r > 0
"""
    # consistent hashing: successor vnode on the md5 ring; the
    # rebalance twin re-derives owners on the N+1 ring
    from candidategeneration_ray.pipelines.extras import (
        RING_NODES, RING_VNODES)

    vh_expr = _H64.format(expr="'node' || i || ':' || v")

    def _ring_cte(tag: str, n: int) -> str:
        return f"""vn{tag} AS (
  SELECT {vh_expr} AS vh, CAST(i AS BIGINT) AS node
  FROM (SELECT unnest(range(1, {n + 1})) AS i)
  CROSS JOIN (SELECT unnest(range(0, {RING_VNODES})) AS v)),
own{tag} AS (
  SELECT doc_id,
         coalesce((SELECT min(vh) FROM vn{tag} WHERE vh >= kk.k),
                  (SELECT min(vh) FROM vn{tag})) AS ovh
  FROM keys kk),
node{tag} AS (
  SELECT o.doc_id, min(v.node) AS node
  FROM own{tag} o JOIN vn{tag} v ON v.vh = o.ovh
  GROUP BY o.doc_id)"""

    keys_cte = ("keys AS (SELECT doc_id, "
                + _H64.format(expr="CAST(doc_id AS VARCHAR)")
                + " AS k FROM documents)")
    ring_counts = f"""
WITH {keys_cte},
{_ring_cte('a', RING_NODES)}
SELECT node, CAST(count(*) AS BIGINT) AS n_docs
FROM nodea GROUP BY node
"""
    ring_rebalance = f"""
WITH {keys_cte},
{_ring_cte('a', RING_NODES)},
{_ring_cte('b', RING_NODES + 1)}
SELECT CAST(count(*) AS BIGINT) AS n_docs,
       CAST(count(*) FILTER (a.node <> b.node) AS BIGINT) AS moved_docs,
       CAST(count(*) FILTER (a.node <> b.node
                             AND b.node = {RING_NODES + 1}) AS BIGINT)
         AS moved_to_new
FROM nodea a JOIN nodeb b USING (doc_id)
"""
    return {"gbdt_model": gbdt, "isotonic_calibration": isotonic,
            "spend_gini": gini, "soundex_terms": soundex_terms,
            "phonetic_lookup": phonetic_lookup,
            "cdc_chunks": cdc_chunks, "cdc_dedup_stats": cdc_stats,
            "vopt_histogram": vopt, "cv_stump": cv_stump,
            "shard_plan": shard_plan,
            "hash_ring_counts": ring_counts,
            "hash_ring_rebalance": ring_rebalance}


def session17_oracles() -> dict[str, str]:
    """Session-17 oracles: interval-union covered time (the window
    running-sum formulation of the sweep line over gap-rule session
    spans — same spans CTE as peak_concurrency) and Jones-Plassmann
    graph coloring (Luby-style rounds unrolled; per-frontier-node mex
    as min over a colors series anti-joined with the colored
    neighborhood)."""
    from candidategeneration_ray.pipelines.events import PEAK_GAP_SEC

    gap_us = PEAK_GAP_SEC * 1_000_000
    active_time = f"""
WITH ordered AS (
  SELECT user_id, event_id, ts,
         lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
  FROM events
),
flagged AS (
  SELECT *, CASE WHEN prev_ts IS NULL
                   OR epoch_us(ts) - epoch_us(prev_ts) > {gap_us}
                 THEN 1 ELSE 0 END AS new_s
  FROM ordered
),
sess AS (
  SELECT *, sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS UNBOUNDED PRECEDING) AS session_idx
  FROM flagged
),
spans AS (
  SELECT user_id, session_idx,
         min(epoch_us(ts)) AS s, max(epoch_us(ts)) AS e
  FROM sess GROUP BY 1, 2
),
deltas AS (
  SELECT s AS t, 1 AS d FROM spans
  UNION ALL SELECT e + 1, -1 FROM spans
),
net AS (SELECT t, sum(d) AS nd FROM deltas GROUP BY t),
run AS (
  SELECT t, sum(nd) OVER (ORDER BY t ROWS UNBOUNDED PRECEDING) AS conc,
         lead(t) OVER (ORDER BY t) AS nxt
  FROM net
)
SELECT CAST(coalesce(sum(CASE WHEN conc > 0 THEN nxt - t ELSE 0 END), 0)
            AS BIGINT) AS covered_us,
       CAST((SELECT count(*) FROM spans) AS BIGINT) AS n_sessions
FROM run WHERE nxt IS NOT NULL
"""

    # Jones-Plassmann coloring: the MIS round structure (same nb/cand
    # CTEs — local minima among UNCOLORED neighbors), plus per-round
    # used-color collection and a mex via anti-joined color series
    from candidategeneration_ray.pipelines.clustering import (
        COLOR_MAX_COLORS, COLOR_MAX_ROUNDS)

    h_node = _H64.format(expr="CAST(x AS VARCHAR)")
    ctes = [f"pr AS MATERIALIZED (SELECT x AS v, {h_node} AS h "
            "FROM (SELECT DISTINCT x FROM sadj))",
            "und0 AS (SELECT v FROM pr)",
            "col0 AS (SELECT CAST(0 AS BIGINT) AS v, CAST(0 AS BIGINT)"
            " AS c WHERE 1 = 0)",
            # 0..COLOR_MAX_COLORS inclusive: the last value is a
            # SENTINEL — a node whose colored neighborhood exhausts
            # all budget colors takes color = COLOR_MAX_COLORS here
            # (instead of silently emitting no row), while the engine
            # raises RuntimeError; either way the driver comparison
            # fails LOUDLY rather than dropping the node
            f"nums AS (SELECT unnest(generate_series(0, "
            f"{COLOR_MAX_COLORS})) AS c)"]
    for r in range(COLOR_MAX_ROUNDS):
        ctes.append(f"""nb{r} AS (
  SELECT s.x AS v, p.h AS nh, p.v AS nv,
         row_number() OVER (PARTITION BY s.x ORDER BY p.h, p.v) AS rn
  FROM sadj s
  JOIN und{r} ux ON ux.v = s.x
  JOIN und{r} uy ON uy.v = s.y
  JOIN pr p ON p.v = s.y),
cand{r} AS MATERIALIZED (
  SELECT u.v FROM und{r} u
  JOIN pr p ON p.v = u.v
  LEFT JOIN (SELECT v, nh, nv FROM nb{r} WHERE rn = 1) m ON m.v = u.v
  WHERE m.v IS NULL OR p.h < m.nh OR (p.h = m.nh AND p.v < m.nv)),
used{r} AS (
  SELECT c.v, k.c AS uc
  FROM cand{r} c JOIN sadj s ON s.x = c.v JOIN col{r} k ON k.v = s.y),
newc{r} AS MATERIALIZED (
  SELECT c.v, min(n.c) AS c
  FROM cand{r} c CROSS JOIN nums n
  WHERE NOT EXISTS (SELECT 1 FROM used{r} u
                    WHERE u.v = c.v AND u.uc = n.c)
  GROUP BY c.v),
col{r + 1} AS MATERIALIZED (
  SELECT v, c FROM col{r} UNION ALL SELECT v, c FROM newc{r}),
und{r + 1} AS MATERIALIZED (
  SELECT u.v FROM und{r} u
  WHERE u.v NOT IN (SELECT v FROM cand{r}))""")
    union = " UNION ALL ".join(
        f"SELECT CAST(v AS BIGINT) AS vec_id, CAST(c AS BIGINT) AS color, "
        f"CAST({r} AS BIGINT) AS color_round FROM newc{r}"
        for r in range(COLOR_MAX_ROUNDS))
    graph_coloring = f"""
WITH {_knn_edge_ctes()},
{",".join(ctes)}
{union}
"""
    # Harman S-stemmer: longest-suffix rule fires, exception list
    # decides change vs keep, later rules never apply
    def stem_case(col: str) -> str:
        return f"""CASE WHEN {col} LIKE '%ies' THEN
           CASE WHEN {col} LIKE '%eies' OR {col} LIKE '%aies' THEN {col}
                ELSE substr({col}, 1, length({col}) - 3) || 'y' END
         WHEN {col} LIKE '%es' THEN
           CASE WHEN {col} LIKE '%aes' OR {col} LIKE '%ees'
                     OR {col} LIKE '%oes' THEN {col}
                ELSE substr({col}, 1, length({col}) - 1) END
         WHEN {col} LIKE '%s' THEN
           CASE WHEN {col} LIKE '%us' OR {col} LIKE '%ss' THEN {col}
                ELSE substr({col}, 1, length({col}) - 1) END
         ELSE {col} END"""

    stemmed_df = f"""
WITH {KEPT_CTE},
st AS (
  SELECT doc_id, {stem_case('tok')} AS stem
  FROM kept)
SELECT stem, CAST(count(*) AS BIGINT) AS df
FROM (SELECT DISTINCT doc_id, stem FROM st)
GROUP BY stem
ORDER BY df DESC, stem ASC
LIMIT 50
"""

    # stemmed-index retrieval: the whole bm25 chain (tf/dl/df/avgdl/
    # quantized score/top-10) re-derived over the stemmed token stream,
    # query tokens stemmed the same way (no re-tokenization)
    stemmed_bm25 = f"""
WITH {KEPT_CTE},
kept_s AS MATERIALIZED (
  SELECT doc_id, {stem_case('tok')} AS tok, kpos FROM kept),
{SCORES_CTE.replace('FROM kept', 'FROM kept_s')},
{QTOK_CTE},
qtok_s AS (
  SELECT DISTINCT query_id, {stem_case('tok')} AS tok FROM qtok),
qscores AS MATERIALIZED (
  SELECT q.query_id, s.doc_id, CAST(sum(s.score) AS BIGINT) AS score
  FROM qtok_s q JOIN scores s USING (tok)
  GROUP BY q.query_id, s.doc_id
)
SELECT query_id, rank, doc_id, score FROM (
  SELECT query_id,
         CAST(row_number() OVER (PARTITION BY query_id
                                 ORDER BY score DESC, doc_id ASC) AS BIGINT) AS rank,
         doc_id, score
  FROM qscores
) WHERE rank <= 10
"""
    # pivot-based harmonic centrality: labeled-BFS rounds unrolled
    # (reach{r} = min-d per (node, pivot)), reciprocal-distance LUT
    from candidategeneration_ray.pipelines.clustering import (
        HC_MAX_HOPS, HC_PPM, HC_SEED_MOD)

    def labeled_bfs_ctes(hops: int, mod: int) -> list[str]:
        """The labeled multi-source BFS chain shared by the harmonic
        and stress oracles: reach{hops} = min distance per
        (node, pivot), hop-capped."""
        ctes = [f"reach0 AS MATERIALIZED (SELECT vec_id AS node, "
                f"vec_id AS src, 0 AS d FROM embeddings "
                f"WHERE vec_id % {mod} = 0)"]
        for r in range(hops):
            ctes.append(f"""nx{r} AS (
  SELECT s.y AS node, t.src, t.d + 1 AS d
  FROM reach{r} t JOIN sadj s ON s.x = t.node
  WHERE t.d < {hops}),
reach{r + 1} AS MATERIALIZED (
  SELECT node, src, min(d) AS d
  FROM (SELECT * FROM reach{r} UNION ALL SELECT * FROM nx{r})
  GROUP BY 1, 2)""")
        return ctes

    hc_ctes = labeled_bfs_ctes(HC_MAX_HOPS, HC_SEED_MOD)
    hc_lut = ", ".join(f"({d}, {p})" for d, p in sorted(HC_PPM.items()))
    harmonic = f"""
WITH {_knn_edge_ctes()},
{",".join(hc_ctes)},
lut(d, ppm) AS (VALUES {hc_lut}),
agg AS (
  SELECT t.node, CAST(count(*) AS BIGINT) AS n_reached,
         CAST(sum(l.ppm) AS BIGINT) AS harmonic_ppm
  FROM reach{HC_MAX_HOPS} t JOIN lut l ON l.d = t.d
  WHERE t.src <> t.node
  GROUP BY t.node)
SELECT CAST(e.vec_id AS BIGINT) AS vec_id,
       CAST(coalesce(a.n_reached, 0) AS BIGINT) AS n_reached,
       CAST(coalesce(a.harmonic_ppm, 0) AS BIGINT) AS harmonic_ppm
FROM embeddings e LEFT JOIN agg a ON a.node = e.vec_id
"""
    # t-closeness: exact TVD ppm per quasi-identifier group vs the
    # global sensitive-attribute marginal (HUGEINT cross products)
    from candidategeneration_ray.pipelines.extras import (
        K_ANON_CHAR_BUCKET, T_CLOSENESS_PPM)

    t_closeness = f"""
WITH g AS MATERIALIZED (
  SELECT source, n_chars // {K_ANON_CHAR_BUCKET} AS chars_bucket, lang,
         CAST(count(*) AS HUGEINT) AS c
  FROM documents GROUP BY 1, 2, 3),
tot AS (SELECT source, chars_bucket, sum(c) AS n FROM g GROUP BY 1, 2),
gl AS (SELECT lang, sum(c) AS cg FROM g GROUP BY 1),
nn AS (SELECT sum(c) AS nt FROM g),
x AS (
  SELECT t.source, t.chars_bucket, t.n, l.cg,
         coalesce(gg.c, 0) AS c
  FROM tot t CROSS JOIN gl l
  LEFT JOIN g gg ON gg.source = t.source
              AND gg.chars_bucket = t.chars_bucket AND gg.lang = l.lang),
s AS (
  SELECT source, chars_bucket, n,
         sum(abs((SELECT nt FROM nn) * c - n * cg)) AS num
  FROM x GROUP BY 1, 2, 3)
SELECT source, CAST(chars_bucket AS BIGINT) AS chars_bucket,
       CAST(n AS BIGINT) AS n_docs,
       CAST(CAST(1000000 AS HUGEINT) * num
            // (2 * n * (SELECT nt FROM nn)) AS BIGINT) AS tvd_ppm,
       CASE WHEN CAST(1000000 AS HUGEINT) * num
                 // (2 * n * (SELECT nt FROM nn)) > {T_CLOSENESS_PPM}
            THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT)
       END AS violates
FROM s
"""

    # simplified silhouette: d2 to every final centroid from the
    # unrolled k-means chain; own = the final assignment, b = min other
    from candidategeneration_ray.pipelines.clustering import KMEANS_ITERS

    silhouette = f"""
WITH {_kmeans_ctes()},
d2 AS (
  SELECT qv.vec_id, c.cluster,
         sum((qv.x - c.cq) * (qv.x - c.cq)) AS d2
  FROM qv JOIN c{KMEANS_ITERS} c USING (d)
  GROUP BY 1, 2),
own AS (
  SELECT a.vec_id, a.cluster, d.d2 AS a
  FROM a{KMEANS_ITERS + 1} a
  JOIN d2 d ON d.vec_id = a.vec_id AND d.cluster = a.cluster),
oth AS (
  SELECT d.vec_id, min(d.d2) AS b
  FROM d2 d JOIN own o ON o.vec_id = d.vec_id AND d.cluster <> o.cluster
  GROUP BY 1)
SELECT CAST(o.vec_id AS BIGINT) AS vec_id,
       CAST(o.cluster AS BIGINT) AS cluster,
       CAST(CAST(1000000 AS HUGEINT) * (t.b - o.a)
            // greatest(o.a, t.b, 1) AS BIGINT) AS s_ppm
FROM own o JOIN oth t USING (vec_id)
"""
    # m-estimate target encoding: smoothed category means with the
    # global prior cross-multiplied through (exact num/den)
    from candidategeneration_ray.pipelines.extras import TE_M

    target_encoding = f"""
WITH agg AS (
  SELECT source, CAST(count(*) AS BIGINT) AS n,
         CAST(count(*) FILTER (lang = 'en') AS BIGINT) AS sum_y
  FROM documents GROUP BY 1),
tot AS (SELECT sum(n) AS nt, sum(sum_y) AS sy FROM agg)
SELECT source, n, sum_y,
       CAST(sum_y * (SELECT nt FROM tot)
            + {TE_M} * (SELECT sy FROM tot) AS BIGINT) AS enc_num,
       CAST((n + {TE_M}) * (SELECT nt FROM tot) AS BIGINT) AS enc_den
FROM agg
"""

    # independence-assumption audit: per fixed-query term pair, the
    # System-R estimate witnesses vs the true co-occurrence count
    from candidategeneration_ray.pipelines.docquery import (
        selectivity_pairs)

    qp_values = ", ".join(f"('{a}', '{b}')"
                          for a, b in selectivity_pairs())
    selectivity = f"""
WITH {KEPT_CTE},
dt AS MATERIALIZED (SELECT DISTINCT doc_id, tok FROM kept),
qp(t1, t2) AS (VALUES {qp_values}),
dfs AS (SELECT tok, CAST(count(*) AS BIGINT) AS df FROM dt GROUP BY tok)
SELECT qp.t1, qp.t2,
       coalesce(d1.df, 0) AS df1, coalesce(d2.df, 0) AS df2,
       (SELECT CAST(count(*) AS BIGINT) FROM documents) AS n_docs,
       coalesce(d1.df, 0) * coalesce(d2.df, 0) AS est_num,
       coalesce((SELECT CAST(count(*) AS BIGINT)
                 FROM dt a JOIN dt b ON a.doc_id = b.doc_id
                 WHERE a.tok = qp.t1 AND b.tok = qp.t2), 0) AS actual
FROM qp
LEFT JOIN dfs d1 ON d1.tok = qp.t1
LEFT JOIN dfs d2 ON d2.tok = qp.t2
"""
    # KMV sketches of the audited pairs' posting-list doc sets + the
    # integer estimators — 2^64 as a HUGEINT literal, h_k as UBIGINT
    from candidategeneration_ray.pipelines.sketches import KMV_K

    h_doc = _H64.format(expr="CAST(doc_id AS VARCHAR)")
    two64 = "CAST(18446744073709551616 AS HUGEINT)"
    kmv_overlap = f"""
WITH {KEPT_CTE},
dt AS MATERIALIZED (SELECT DISTINCT doc_id, tok FROM kept),
qp(t1, t2) AS (VALUES {qp_values}),
hv AS MATERIALIZED (SELECT tok, doc_id, {h_doc} AS h FROM dt),
ska AS (
  SELECT t1, t2, h FROM (
    SELECT qp.t1, qp.t2, v.h,
           row_number() OVER (PARTITION BY qp.t1, qp.t2
                              ORDER BY v.h) AS rn
    FROM qp JOIN hv v ON v.tok = qp.t1) WHERE rn <= {KMV_K}),
skb AS (
  SELECT t1, t2, h FROM (
    SELECT qp.t1, qp.t2, v.h,
           row_number() OVER (PARTITION BY qp.t1, qp.t2
                              ORDER BY v.h) AS rn
    FROM qp JOIN hv v ON v.tok = qp.t2) WHERE rn <= {KMV_K}),
u AS (
  SELECT t1, t2, h FROM (
    SELECT t1, t2, h,
           row_number() OVER (PARTITION BY t1, t2 ORDER BY h) AS rn
    FROM (SELECT DISTINCT t1, t2, h
          FROM (SELECT * FROM ska UNION ALL SELECT * FROM skb)))
  WHERE rn <= {KMV_K}),
us AS (
  SELECT u.t1, u.t2, CAST(count(*) AS BIGINT) AS ku,
         max(u.h) AS kth,
         CAST(count(*) FILTER (a.h IS NOT NULL AND b.h IS NOT NULL)
              AS BIGINT) AS n_match
  FROM u
  LEFT JOIN ska a ON a.t1 = u.t1 AND a.t2 = u.t2 AND a.h = u.h
  LEFT JOIN skb b ON b.t1 = u.t1 AND b.t2 = u.t2 AND b.h = u.h
  GROUP BY 1, 2),
est AS (
  SELECT t1, t2, ku, n_match,
         CASE WHEN ku < {KMV_K} THEN CAST(ku AS HUGEINT)
              ELSE {KMV_K - 1} * {two64} // CAST(kth AS HUGEINT)
         END AS union_est
  FROM us),
ex AS (
  SELECT qp.t1, qp.t2,
         coalesce((SELECT CAST(count(*) AS BIGINT)
                   FROM dt a JOIN dt b ON a.doc_id = b.doc_id
                   WHERE a.tok = qp.t1 AND b.tok = qp.t2), 0) AS actual
  FROM qp)
SELECT qp.t1, qp.t2,
       coalesce(e.ku, 0) AS ku,
       coalesce(e.n_match, 0) AS n_match,
       CAST(coalesce(e.union_est, 0) AS BIGINT) AS union_est,
       CAST(coalesce(e.n_match * e.union_est // e.ku, 0) AS BIGINT)
         AS inter_est,
       ex.actual
FROM qp
LEFT JOIN est e ON e.t1 = qp.t1 AND e.t2 = qp.t2
JOIN ex ON ex.t1 = qp.t1 AND ex.t2 = qp.t2
"""
    # priority sampling: exact integer priorities w*2^64 // h over the
    # md5 uniforms, top-k + HT adjusted weights clamped at 2^62
    from candidategeneration_ray.pipelines.extras import PRIO_SAMPLE_K

    h_docp = _H64.format(expr="CAST(doc_id AS VARCHAR)")
    priority_sample = f"""
WITH pr AS MATERIALIZED (
  SELECT doc_id, CAST(n_chars AS HUGEINT) AS w,
         CAST(n_chars AS HUGEINT) * CAST(18446744073709551616 AS HUGEINT)
           // greatest(CAST({h_docp} AS HUGEINT), 1) AS q
  FROM documents),
rk AS (SELECT *, row_number() OVER (ORDER BY q DESC, doc_id) AS rn
       FROM pr),
tau AS (SELECT coalesce((SELECT q FROM rk WHERE rn = {PRIO_SAMPLE_K + 1}),
                        0) AS t)
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       CAST(w AS BIGINT) AS weight,
       CAST(least(greatest(w, (SELECT t FROM tau)),
                  CAST(4611686018427387904 AS HUGEINT)) AS BIGINT)
         AS est_weight
FROM rk WHERE rn <= {PRIO_SAMPLE_K}
"""
    # subset-sum estimation: the priority sample's HT weights summed
    # per source beside the true per-source totals
    sample_subset_sums = f"""
WITH samp AS MATERIALIZED ({priority_sample}),
j AS (SELECT d.source, s.est_weight
      FROM samp s JOIN documents d USING (doc_id)),
tru AS (SELECT source, CAST(sum(n_chars) AS BIGINT) AS true_chars
        FROM documents GROUP BY 1)
SELECT t.source,
       CAST(coalesce(count(j.est_weight), 0) AS BIGINT) AS n_sampled,
       CAST(coalesce(sum(j.est_weight), 0) AS BIGINT) AS est_chars,
       t.true_chars
FROM tru t LEFT JOIN j ON j.source = t.source
GROUP BY t.source, t.true_chars
"""
    # stress centrality: Brandes' two passes with integer path counts
    # — sigma by forward layers, h by backward layers, both over the
    # SAME labeled-BFS distance table
    from candidategeneration_ray.pipelines.clustering import (
        STRESS_MAX_HOPS, STRESS_SEED_MOD)

    H = STRESS_MAX_HOPS
    st_ctes = labeled_bfs_ctes(H, STRESS_SEED_MOD)
    st_ctes.append(
        f"sig0 AS (SELECT node, src, CAST(1 AS HUGEINT) AS sig "
        f"FROM reach{H} WHERE d = 0)")
    for l in range(1, H + 1):
        st_ctes.append(f"""sig{l} AS MATERIALIZED (
  SELECT db.node, db.src, CAST(sum(t.sig) AS HUGEINT) AS sig
  FROM sig{l - 1} t
  JOIN sadj s ON s.x = t.node
  JOIN reach{H} db ON db.node = s.y AND db.src = t.src AND db.d = {l}
  GROUP BY 1, 2)""")
    st_ctes.append(
        f"h{H} AS (SELECT node, src, CAST(0 AS HUGEINT) AS h "
        f"FROM reach{H} WHERE 1 = 0)")
    for l in range(H - 1, -1, -1):
        st_ctes.append(f"""h{l} AS MATERIALIZED (
  SELECT dv.node, dv.src, CAST(sum(1 + coalesce(hw.h, 0)) AS HUGEINT) AS h
  FROM reach{H} dv
  JOIN sadj s ON s.x = dv.node
  JOIN reach{H} dw ON dw.node = s.y AND dw.src = dv.src
                  AND dw.d = {l + 1}
  LEFT JOIN h{l + 1} hw ON hw.node = s.y AND hw.src = dv.src
  WHERE dv.d = {l}
  GROUP BY 1, 2)""")
    sig_union = " UNION ALL ".join(
        f"SELECT * FROM sig{l}" for l in range(H + 1))
    h_union = " UNION ALL ".join(
        f"SELECT * FROM h{l}" for l in range(H + 1))
    stress = f"""
WITH {_knn_edge_ctes()},
{",".join(st_ctes)},
sigall AS ({sig_union}),
hall AS ({h_union}),
agg AS (
  SELECT g.node, sum(g.sig * coalesce(hh.h, 0)) AS s
  FROM sigall g
  LEFT JOIN hall hh ON hh.node = g.node AND hh.src = g.src
  WHERE g.node <> g.src
  GROUP BY 1)
SELECT CAST(e.vec_id AS BIGINT) AS vec_id,
       CAST(coalesce(a.s, 0) AS BIGINT) AS stress
FROM embeddings e LEFT JOIN agg a ON a.node = e.vec_id
"""
    # edge stress (Girvan-Newman bridges): the SAME sig/h chains,
    # folded per DAG edge instead of per node
    from candidategeneration_ray.pipelines.clustering import BRIDGE_TOPK

    bridges = f"""
WITH {_knn_edge_ctes()},
{",".join(st_ctes)},
sigall AS ({sig_union}),
hall AS ({h_union}),
eb AS (
  SELECT least(s.x, s.y) AS u_, greatest(s.x, s.y) AS v_,
         sum(g.sig * (1 + coalesce(hh.h, 0))) AS uses
  FROM sadj s
  JOIN reach{H} du ON du.node = s.x
  JOIN reach{H} dv ON dv.node = s.y AND dv.src = du.src
                  AND dv.d = du.d + 1
  JOIN sigall g ON g.node = s.x AND g.src = du.src
  LEFT JOIN hall hh ON hh.node = s.y AND hh.src = du.src
  GROUP BY 1, 2)
SELECT CAST(u_ AS BIGINT) AS u, CAST(v_ AS BIGINT) AS v,
       CAST(uses AS BIGINT) AS uses
FROM eb
ORDER BY uses DESC, u_, v_
LIMIT {BRIDGE_TOPK}
"""
    # novelty by first occurrence: same shingle CTEs as the dedup
    # family; first_doc = min doc_id per shingle hash
    from candidategeneration_ray.functions.hashing import SHINGLE_W
    from candidategeneration_ray.pipelines.extras import (
        HEAPS_CHECKPOINTS)

    novelty = f"""
WITH {KEPT_CTE},
{_DOCS_TOKS},
{_shingle_cte(SHINGLE_W)},
f AS (SELECT h, min(doc_id) AS first_doc FROM sh GROUP BY h),
nv AS (SELECT first_doc AS doc_id, CAST(count(*) AS BIGINT) AS n_novel
       FROM f GROUP BY 1),
sz AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_shingles
       FROM sh GROUP BY doc_id)
SELECT CAST(d.doc_id AS BIGINT) AS doc_id,
       coalesce(sz.n_shingles, 0) AS n_shingles,
       coalesce(nv.n_novel, 0) AS n_novel
FROM documents d
LEFT JOIN sz USING (doc_id)
LEFT JOIN nv USING (doc_id)
"""
    heaps = f"""
WITH {KEPT_CTE},
f AS (SELECT tok, min(doc_id) AS first_doc FROM kept GROUP BY tok),
nn AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM documents),
cp AS (SELECT unnest(range(1, {HEAPS_CHECKPOINTS + 1})) AS c)
SELECT CAST(c AS BIGINT) AS checkpoint,
       CAST((SELECT n_docs FROM nn) * c // {HEAPS_CHECKPOINTS}
            AS BIGINT) AS n_docs_seen,
       CAST((SELECT count(*) FROM f
             WHERE first_doc < (SELECT n_docs FROM nn) * c
                               // {HEAPS_CHECKPOINTS})
            AS BIGINT) AS vocab_size
FROM cp
"""
    return {"active_time": active_time,
            "graph_coloring": graph_coloring,
            "stemmed_df_top50": stemmed_df,
            "harmonic_centrality": harmonic,
            "t_closeness": t_closeness,
            "silhouette_ppm": silhouette,
            "target_encoding": target_encoding,
            "selectivity_audit": selectivity,
            "stemmed_bm25_topk": stemmed_bm25,
            "list_overlap_kmv": kmv_overlap,
            "priority_sample": priority_sample,
            "sample_subset_sums": sample_subset_sums,
            "stress_centrality": stress,
            "bridge_edges": bridges,
            "novelty_scores": novelty,
            "heaps_curve": heaps}
