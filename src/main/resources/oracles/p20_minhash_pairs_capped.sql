-- Capped minhash LSH: 30 byte-identical clones of doc 3 share every
-- band bucket; maxBucketSize = 10 must drop exactly the buckets whose
-- membership exceeds the cap and nothing else. Same signature/banding
-- derivation as p07_minhash_pairs; no est_jaccard threshold so the
-- whole surviving candidate set is compared.
WITH corpus AS (
  SELECT doc_id, text FROM documents WHERE doc_id < 200
  UNION ALL
  SELECT doc_id + 1000000, text || ' appended tail token'
  FROM documents WHERE doc_id < 20
  UNION ALL
  SELECT 2000000 + r.range AS doc_id,
    (SELECT text FROM documents WHERE doc_id = 3) AS text
  FROM range(30) r
),
toks AS (
  SELECT doc_id,
    LIST_FILTER(REGEXP_SPLIT_TO_ARRAY(text, '[\s\x0b]+'), x -> x != '') AS t
  FROM corpus
),
sh AS (
  SELECT doc_id,
    LIST_DISTINCT(CASE WHEN LEN(t) >= 3 THEN
      LIST_TRANSFORM(RANGE(LEN(t) - 2),
        i -> CONCAT_WS(' ', t[i+1], t[i+2], t[i+3]))
      ELSE [ARRAY_TO_STRING(t, ' ')] END) AS shingles
  FROM toks
),
hashes AS (
  SELECT doc_id,
    CAST(('0x' || substr(md5(s), 1, 12)) AS BIGINT) AS h1,
    CAST(('0x' || substr(md5(s), 13, 12)) AS BIGINT) AS h2
  FROM (SELECT doc_id, unnest(shingles) AS s FROM sh)
),
slots AS (
  SELECT doc_id, i, MIN(h1 + i * h2) AS m
  FROM hashes, (SELECT unnest(range(64)) AS i)
  GROUP BY doc_id, i
),
sigs AS (
  SELECT doc_id, array_agg(m ORDER BY i) AS sig FROM slots GROUP BY doc_id
),
bands AS (
  SELECT doc_id, b,
    CAST(('0x' || substr(md5(ARRAY_TO_STRING(sig[b*4+1:b*4+4], ',')), 1, 15)) AS BIGINT) AS band_hash
  FROM sigs, (SELECT unnest(range(16)) AS b)
),
bsz AS (
  SELECT b, band_hash, count(*) AS n FROM bands GROUP BY 1, 2
),
pairs AS (
  SELECT DISTINCT a.doc_id AS id_a, c.doc_id AS id_b
  FROM bands a
  JOIN bands c ON a.b = c.b AND a.band_hash = c.band_hash
  JOIN bsz s ON s.b = a.b AND s.band_hash = a.band_hash
  WHERE a.doc_id < c.doc_id AND s.n <= 10
)
SELECT p.id_a, p.id_b,
  CAST(list_sum(list_transform(range(64),
    i -> CASE WHEN sa.sig[i+1] = sc.sig[i+1] THEN 1 ELSE 0 END)) AS DOUBLE) / 64
    AS est_jaccard
FROM pairs p
JOIN sigs sa ON p.id_a = sa.doc_id
JOIN sigs sc ON p.id_b = sc.doc_id
ORDER BY id_a, id_b
