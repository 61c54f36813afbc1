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
c AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM dom
),
cent AS (SELECT vec_id AS cent_id, v AS cv FROM c WHERE vec_id < 8),
assigned AS (
  SELECT neighbor_id, cent_id FROM (
    SELECT co.vec_id AS neighbor_id, ce.cent_id,
      ROW_NUMBER() OVER (PARTITION BY co.vec_id
        ORDER BY ROUND(list_cosine_similarity(co.v, ce.cv), 5) DESC, ce.cent_id) AS rn
    FROM c co CROSS JOIN cent ce
  ) WHERE rn = 1
),
probes AS (
  SELECT query_id, cent_id FROM (
    SELECT q.vec_id AS query_id, ce.cent_id,
      ROW_NUMBER() OVER (PARTITION BY q.vec_id
        ORDER BY ROUND(list_cosine_similarity(q.v, ce.cv), 5) DESC, ce.cent_id) AS rn
    FROM c q CROSS JOIN cent ce
    WHERE q.vec_id BETWEEN 4 AND 7
  ) WHERE rn <= 2
),
scored AS (
  SELECT p.query_id, a.neighbor_id,
    list_cosine_similarity(qv.v, nv.v) AS cos
  FROM probes p
  JOIN assigned a ON p.cent_id = a.cent_id
  JOIN c qv ON qv.vec_id = p.query_id
  JOIN c nv ON nv.vec_id = a.neighbor_id
  WHERE a.neighbor_id <> p.query_id
),
ranked AS (
  SELECT query_id, neighbor_id, cos,
    ROW_NUMBER() OVER (PARTITION BY query_id
      ORDER BY ROUND(cos, 5) DESC, neighbor_id) AS rank
  FROM scored
)
SELECT query_id, neighbor_id, ROUND(cos, 6) AS cosine, rank
FROM ranked WHERE rank <= 5
ORDER BY query_id, rank
