WITH corpus AS (
  SELECT doc_id, text FROM documents WHERE doc_id < 200
  UNION ALL
  SELECT doc_id + 1000000, text || ' x' FROM documents WHERE doc_id < 20
),
toks AS (
  SELECT doc_id, unnest(LIST_FILTER(REGEXP_SPLIT_TO_ARRAY(text, '[\s\x0b]+'), x -> x != '')) AS t
  FROM corpus
),
th AS (
  SELECT doc_id, CAST(('0x' || substr(md5(t), 1, 15)) AS BIGINT) AS h
  FROM toks
),
votes AS (
  SELECT doc_id, i,
    SUM(CASE WHEN ((h >> i) & 1) = 1 THEN 1 ELSE -1 END) AS vote
  FROM th, (SELECT unnest(range(64)) AS i)
  GROUP BY doc_id, i
),
sigs AS (
  SELECT doc_id,
    CAST(SUM(CASE WHEN vote > 0 THEN (1::BIGINT << i) ELSE 0 END) AS BIGINT) AS sig
  FROM votes GROUP BY doc_id
),
chunks AS (
  SELECT doc_id, sig, c, (sig >> (c * 16)) & 65535 AS chunk
  FROM sigs, (SELECT unnest(range(4)) AS c)
),
pairs AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
    bit_count(xor(a.sig, b.sig)) AS hamming
  FROM chunks a JOIN chunks b ON a.c = b.c AND a.chunk = b.chunk
  WHERE a.doc_id < b.doc_id
)
SELECT id_a, id_b, CAST(hamming AS INT) AS hamming
FROM pairs WHERE hamming <= 3
ORDER BY id_a, id_b
