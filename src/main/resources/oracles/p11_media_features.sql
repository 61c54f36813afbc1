WITH m AS (
  SELECT doc_id AS media_id,
    (['image', 'audio', 'video'])[CAST(doc_id % 3 AS INT) + 1] AS media_type,
    CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
    CAST(('0x' || substr(md5(text), 1, 15)) AS BIGINT) AS content_hash
  FROM documents
)
SELECT media_id, media_type, n_bytes, content_hash,
  CAST(CASE media_type
    WHEN 'video' THEN GREATEST(1, (n_bytes // 64) % 16)
    WHEN 'audio' THEN GREATEST(1, (n_bytes // 128) % 8)
    ELSE 1 END AS INT) AS n_frames_sampled
FROM m ORDER BY media_id
