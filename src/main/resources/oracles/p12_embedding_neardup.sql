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
corpus AS (
  SELECT vec_id, embedding FROM dom
  UNION ALL
  SELECT vec_id + 1000000, embedding FROM dom WHERE vec_id < 20
),
b AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
    list_sum(list_transform(range(12),
      i -> CASE WHEN embedding[i * 5 + 1] >= 0 THEN (1::BIGINT << i) ELSE 0 END))
      AS lsh_bucket
  FROM corpus
)
SELECT a.vec_id AS id_a, c.vec_id AS id_b,
  ROUND(list_cosine_similarity(a.v, c.v), 6) AS cosine
FROM b a JOIN b c ON a.lsh_bucket = c.lsh_bucket AND a.vec_id < c.vec_id
WHERE list_cosine_similarity(a.v, c.v) >= 0.95
ORDER BY id_a, id_b
