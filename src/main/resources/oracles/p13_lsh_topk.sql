WITH dom AS (
  -- similarity domain (r18): non-NULL, finite, positive-norm vectors
  -- only -- mirrors Similarity.finiteVectorPredicate (zero vectors have
  -- no direction; NaN/Inf poison ranking and IVF assignment; DuckDB's
  -- list_cosine_similarity errors on NULL-bearing input)
  SELECT vec_id, embedding FROM embeddings
  WHERE embedding IS NOT NULL
    AND isfinite(list_aggregate(list_transform(CAST(embedding AS DOUBLE[]), x -> x * x), 'sum'))
    AND list_aggregate(list_transform(CAST(embedding AS DOUBLE[]), x -> x * x), 'sum') > 0
),
b AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
    list_sum(list_transform(range(6),
      i -> CASE WHEN embedding[i * 10 + 1] >= 0 THEN (1::BIGINT << i) ELSE 0 END))
      AS lsh_bucket
  FROM dom
),
q AS (SELECT vec_id AS query_id, v AS q_vec, lsh_bucket FROM b WHERE vec_id < 4),
scored AS (
  SELECT q.query_id, c.vec_id AS neighbor_id,
    list_cosine_similarity(q.q_vec, c.v) AS cos
  FROM b c JOIN q ON c.lsh_bucket = q.lsh_bucket
  WHERE c.vec_id != q.query_id
),
ranked AS (
  SELECT query_id, neighbor_id, cos,
    ROW_NUMBER() OVER (PARTITION BY query_id
      ORDER BY ROUND(cos, 5) DESC, neighbor_id) AS rank
  FROM scored)
SELECT query_id, neighbor_id, ROUND(cos, 6) AS cosine, rank
FROM ranked WHERE rank <= 5
ORDER BY query_id, rank
