WITH existing(chrom, pos, ref, alt, qual) AS (VALUES
  ('chr1', CAST(100 AS BIGINT), 'A', 'G', 10.0),
  ('chr1', 200, 'C', 'T', 20.0),
  ('chr2', 300, 'G', 'A', 30.0)),
incoming(chrom, pos, ref, alt, qual) AS (VALUES
  ('chr1', CAST(200 AS BIGINT), 'C', 'T', 99.0),
  ('chr3', 400, 'T', 'C', 40.0),
  ('chr3', 400, 'T', 'C', 40.0)),
upserted AS (
  -- upsert collapses duplicate-keyed incoming to one row per key (the
  -- fixture's dup rows are identical, so DISTINCT expresses it exactly)
  SELECT DISTINCT * FROM incoming
  UNION ALL
  SELECT e.* FROM existing e
  WHERE NOT EXISTS (SELECT 1 FROM incoming i
    WHERE i.chrom = e.chrom AND i.pos = e.pos AND i.ref = e.ref AND i.alt = e.alt)
),
ignored AS (
  SELECT * FROM existing
  UNION ALL
  SELECT DISTINCT i.* FROM incoming i
  WHERE NOT EXISTS (SELECT 1 FROM existing e
    WHERE i.chrom = e.chrom AND i.pos = e.pos AND i.ref = e.ref AND i.alt = e.alt)
)
SELECT *, 'upsert' AS mode FROM upserted
UNION ALL
SELECT *, 'insert_ignore' AS mode FROM ignored
