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
SELECT chrom, pos, ref, alt, rs_id, qual,
  CASE WHEN alt LIKE '<%' AND alt LIKE '%>' THEN 'sv'
       WHEN length(ref) = 1 AND length(alt) = 1 THEN 'snp'
       WHEN length(ref) <> length(alt) THEN 'indel'
       ELSE 'mnp' END AS variant_type
FROM dec
WHERE alt <> '' AND alt <> '.'
