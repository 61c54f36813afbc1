-- Embedding canonical-keep: the p12 sign-LSH bucket + cosine pair
-- derivation, connected components over the pairs via the recursive
-- reachability CTE (p15's clustering form), then the vector corpus with
-- every clustered vector dropped except its cluster's minimum id — the
-- end-to-end composition the `dedup --method embedding` verb writes.
WITH RECURSIVE dom AS (
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
  -- the keep projection reads the RAW corpus: an out-of-domain vector
  -- (zero/NaN/Inf/NULL embedding) can never pair, but its ROW is still
  -- corpus data and must survive the keep -- only the PAIR derivation
  -- below is domain-restricted, mirroring the engine (the filter sits
  -- inside embeddingNearDup, not around dropNearDuplicates)
  SELECT vec_id, embedding FROM embeddings
  UNION ALL
  SELECT vec_id + 1000000, embedding FROM embeddings WHERE vec_id < 20
),
domc AS (
  SELECT vec_id, embedding FROM dom
  UNION ALL
  SELECT vec_id + 1000000, embedding FROM dom WHERE vec_id < 20
),
b AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
    list_sum(list_transform(range(12),
      i -> CASE WHEN embedding[i * 5 + 1] >= 0 THEN (1::BIGINT << i) ELSE 0 END))
      AS lsh_bucket
  FROM domc
),
pairs AS (
  SELECT a.vec_id AS id_a, c.vec_id AS id_b
  FROM b a JOIN b c ON a.lsh_bucket = c.lsh_bucket AND a.vec_id < c.vec_id
  WHERE list_cosine_similarity(a.v, c.v) >= 0.95
),
nodes AS (
  SELECT id_a AS id FROM pairs UNION SELECT id_b FROM pairs
),
edges AS (
  SELECT id_a AS src, id_b AS dst FROM pairs
  UNION SELECT id_b AS src, id_a AS dst FROM pairs
),
reach(id, r) AS (
  SELECT id, id FROM nodes
  UNION
  SELECT e.dst, reach.r FROM edges e JOIN reach ON reach.id = e.src
),
labels AS (
  SELECT id AS vec_id, MIN(r) AS cluster_id FROM reach GROUP BY id
)
SELECT vec_id FROM corpus
WHERE vec_id NOT IN (SELECT vec_id FROM labels WHERE vec_id != cluster_id)
ORDER BY vec_id
