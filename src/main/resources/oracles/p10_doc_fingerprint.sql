SELECT doc_id,
  CAST(('0x' || substr(md5(
    REGEXP_REPLACE(
      LOWER(REPLACE(trim(regexp_replace(text, '[\s\x0b]+', ' ', 'g')),
        CHR(304), CHR(105) || CHR(775))),
      '(\p{L})σ([^\p{L}]|$)', '\1ς\2', 'g')), 1, 15)) AS BIGINT) AS fingerprint
FROM documents ORDER BY doc_id
