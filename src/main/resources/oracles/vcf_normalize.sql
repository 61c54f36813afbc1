WITH RECURSIVE raw AS (
  SELECT string_split(column0, chr(9)) AS f
  FROM read_csv('/tmp/graft_norm.vcf',
    sep=chr(1), quote='', header=false, columns={'column0':'VARCHAR'})
  WHERE column0 NOT LIKE '#%'
),
dec AS (
  SELECT 'chr' || regexp_replace(f[1], '^chr', '') AS chrom,
         CAST(f[2] AS BIGINT) AS pos, f[4] AS ref,
         unnest(string_split(f[5], ',')) AS alt
  FROM raw
),
base AS (SELECT * FROM dec WHERE alt <> '' AND alt <> '.'),
p1 AS (
  SELECT chrom, pos AS pos0, ref AS ref0, alt AS alt0,
    pos, upper(ref) AS r, upper(alt) AS a, 0 AS step
  FROM base
  UNION ALL
  SELECT chrom, pos0, ref0, alt0, pos,
    substr(r, 1, length(r) - 1), substr(a, 1, length(a) - 1), step + 1
  FROM p1
  WHERE r <> '' AND a <> '' AND right(r, 1) = right(a, 1)
    AND NOT (pos = 1 AND (length(r) = 1 OR length(a) = 1))
),
p1f AS (
  SELECT chrom, pos0, ref0, alt0, pos, r, a FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY chrom, pos0, ref0, alt0
      ORDER BY step DESC) AS rn FROM p1) WHERE rn = 1
),
p2 AS (
  SELECT chrom, pos0, ref0, alt0, pos, r, a, 0 AS step FROM p1f
  UNION ALL
  SELECT chrom, pos0, ref0, alt0, pos + 1, substr(r, 2), substr(a, 2), step + 1
  FROM p2
  WHERE length(r) > 1 AND length(a) > 1 AND substr(r, 1, 1) = substr(a, 1, 1)
),
p2f AS (
  SELECT chrom, pos0, ref0, alt0, pos, r, a FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY chrom, pos0, ref0, alt0
      ORDER BY step DESC) AS rn FROM p2) WHERE rn = 1
)
SELECT chrom, pos, r AS ref, a AS alt,
  (pos <> pos0 OR r <> ref0 OR a <> alt0) AS normalized,
  CASE WHEN pos <> pos0 OR r <> ref0 OR a <> alt0 THEN pos0 END AS original_pos,
  CASE WHEN pos <> pos0 OR r <> ref0 OR a <> alt0 THEN ref0 END AS original_ref,
  CASE WHEN pos <> pos0 OR r <> ref0 OR a <> alt0 THEN alt0 END AS original_alt
FROM p2f
