WITH raw AS (
  SELECT string_split(column0, chr(9)) AS f
  FROM read_csv('/tmp/graft_imp_minimac.vcf',
    sep=chr(1), quote='', header=false, columns={'column0':'VARCHAR'})
  WHERE column0 NOT LIKE '#%'
),
dec AS (
  SELECT 'chr' || regexp_replace(f[1], '^chr', '') AS chrom,
    CAST(f[2] AS BIGINT) AS pos, f[4] AS ref,
    unnest(string_split(f[5], ',')) AS alt,
    TRY_CAST(string_split(NULLIF(regexp_extract(f[8], '(^|;)R2=([^;]*)', 2), ''), ',')[1] AS DOUBLE) AS info_score
  FROM raw
)
SELECT chrom, pos, ref, alt, info_score
FROM dec
WHERE alt <> '' AND alt <> '.'
  AND (info_score IS NULL OR info_score >= 0.9)
