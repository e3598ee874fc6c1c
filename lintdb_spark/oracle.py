"""DuckDB oracle SQL fragments, generated from the same params.py
constants as the Spark operators. Used by __spark_entry__.oracle_sql()
and by the local test harness.

Conventions that keep cross-engine value-hashes equal:
- all vector math in DOUBLE with left-to-right accumulation
  (``list_dot_product(CAST(.. AS DOUBLE[]), ..)`` vs Spark
  ``aggregate(zip_with(..))``),
- every float output rounded to params.ROUND decimals on BOTH sides,
- every aggregate CAST to an explicit type (DuckDB SUM(BIGINT) returns
  HUGEINT which would hash differently),
- ordering done on rounded scores with integer tie-breaks so both
  engines pick identical top-k sets.
"""

from __future__ import annotations

from lintdb_spark import params

_QIDS = ", ".join(str(i) for i in params.QUERY_VEC_IDS)


def prelude() -> str:
    """WITH clause defining the derived multi-vector model (mirrors
    lintdb_spark.model)."""
    return f"""
WITH doc_tokens AS (
    SELECT CAST(floor(vec_id / {params.TOKENS_PER_DOC}.0) AS BIGINT) AS doc_id,
           CAST(vec_id % {params.TOKENS_PER_DOC} AS BIGINT) AS token_idx,
           CAST(embedding AS DOUBLE[]) AS vec,
           label
    FROM embeddings
),
centroids AS (
    SELECT CAST(floor(vec_id / {params.CENTROID_STRIDE}.0) AS BIGINT) AS centroid_id,
           CAST(embedding AS DOUBLE[]) AS cvec
    FROM embeddings
    WHERE vec_id % {params.CENTROID_STRIDE} = 0
),
q_tokens AS (
    SELECT vec_id AS q_id, CAST(embedding AS DOUBLE[]) AS qvec
    FROM embeddings
    WHERE vec_id IN ({_QIDS})
),
token_assign AS (
    SELECT doc_id, token_idx, label, centroid_id, ip
    FROM (
        SELECT t.doc_id, t.token_idx, t.label, c.centroid_id,
               list_dot_product(t.vec, c.cvec) AS ip,
               row_number() OVER (
                   PARTITION BY t.doc_id, t.token_idx
                   ORDER BY round(list_dot_product(t.vec, c.cvec), 6) DESC,
                            c.centroid_id ASC
               ) AS rn
        FROM doc_tokens t CROSS JOIN centroids c
    )
    WHERE rn = 1
),
probes AS (
    SELECT centroid_id, score
    FROM (
        SELECT centroid_id, max(score) AS score
        FROM (
            SELECT q.q_id, c.centroid_id,
                   list_dot_product(q.qvec, c.cvec) AS score,
                   row_number() OVER (
                       PARTITION BY q.q_id
                       ORDER BY round(list_dot_product(q.qvec, c.cvec), 6) DESC,
                                c.centroid_id ASC
                   ) AS kt
            FROM q_tokens q CROSS JOIN centroids c
        )
        WHERE kt <= {params.K_TOP_CENTROIDS}
        GROUP BY centroid_id
        HAVING max(score) > 0
    )
    ORDER BY round(score, 6) DESC, centroid_id ASC
    LIMIT {params.N_PROBE}
)
"""
