-- Multi-band embedding near-dup: band b buckets on the sign pattern of
-- the disjoint strided component set {i*stride + b} (p12's derivation
-- with a per-band offset), candidate pairs union across bands, and a
-- pair co-bucketed in both bands collapses to one row (its cosine is
-- identical — same floats, same expression).
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
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v, band,
    list_sum(list_transform(range(12),
      i -> CASE WHEN embedding[i * 5 + band + 1] >= 0 THEN (1::BIGINT << i) ELSE 0 END))
      AS lsh_bucket
  FROM corpus, (SELECT unnest(range(2)) AS band)
)
SELECT DISTINCT a.vec_id AS id_a, c.vec_id AS id_b,
  ROUND(list_cosine_similarity(a.v, c.v), 6) AS cosine
FROM b a JOIN b c ON a.band = c.band AND a.lsh_bucket = c.lsh_bucket
  AND a.vec_id < c.vec_id
WHERE list_cosine_similarity(a.v, c.v) >= 0.9
ORDER BY id_a, id_b
