SELECT doc_id,
  CAST(('0x' || substr(md5(lower(trim(regexp_replace(text, '\s+', ' ', 'g')))), 1, 15)) AS BIGINT) AS fingerprint
FROM documents ORDER BY doc_id
