-- Capped embedding near-dup: a 30-copy identical-vector flood shares
-- one sign bucket; maxBucketSize = 10 must drop exactly the buckets
-- whose membership exceeds the cap (the flooded one and any other
-- oversized bucket) and nothing else. Threshold -1 keeps every
-- surviving candidate pair visible so the compare covers the full
-- generated set, not only the high-cosine tail.
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
  SELECT 2000000 + r.range AS vec_id, e.embedding
  FROM dom e CROSS JOIN range(30) r
  WHERE e.vec_id = 3
),
b AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
    list_sum(list_transform(range(12),
      i -> CASE WHEN embedding[i * 5 + 1] >= 0 THEN (1::BIGINT << i) ELSE 0 END))
      AS lsh_bucket
  FROM corpus
),
sz AS (
  SELECT lsh_bucket, count(*) AS n FROM b GROUP BY 1
)
SELECT a.vec_id AS id_a, c.vec_id AS id_b,
  ROUND(list_cosine_similarity(a.v, c.v), 6) AS cosine
FROM b a
JOIN b c ON a.lsh_bucket = c.lsh_bucket AND a.vec_id < c.vec_id
JOIN sz s ON s.lsh_bucket = a.lsh_bucket
WHERE s.n <= 10 AND list_cosine_similarity(a.v, c.v) >= -1.0
ORDER BY id_a, id_b
