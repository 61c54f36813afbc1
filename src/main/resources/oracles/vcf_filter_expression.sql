WITH raw AS (
  SELECT string_split(column0, chr(9)) AS f
  FROM read_csv('/root/reference/tests/fixtures/gnomad_subset.vcf.gz',
    sep=chr(1), quote='', header=false, columns={'column0':'VARCHAR'})
  WHERE column0 NOT LIKE '#%'
),
dec AS (
  SELECT 'chr' || regexp_replace(f[1], '^chr', '') AS chrom,
         CAST(f[2] AS BIGINT) AS pos, f[4] AS ref,
         unnest(string_split(f[5], ',')) AS alt,
         CASE WHEN f[3] IN ('.', '') THEN NULL ELSE f[3] END AS rs_id,
         CASE WHEN f[6] IN ('.', '') THEN NULL ELSE CAST(f[6] AS DOUBLE) END AS qual
  FROM raw
)
SELECT chrom, pos, ref, alt, rs_id, qual
FROM dec
WHERE alt <> '' AND alt <> '.'
  AND qual > 100 AND rs_id IS NOT NULL
  AND length(ref) = 1 AND length(alt) = 1 AND NOT (alt LIKE '<%' AND alt LIKE '%>')
