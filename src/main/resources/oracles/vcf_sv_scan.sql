WITH raw AS (
  SELECT string_split(column0, chr(9)) AS f
  FROM read_csv('/root/reference/tests/fixtures/genmod_sv.vcf.gz',
    sep=chr(1), quote='', header=false, columns={'column0':'VARCHAR'})
  WHERE column0 NOT LIKE '#%'
),
dec AS (
  SELECT 'chr' || regexp_replace(f[1], '^chr', '') AS chrom,
    CAST(f[2] AS BIGINT) AS pos, f[4] AS ref,
    unnest(string_split(f[5], ',')) AS alt,
    TRY_CAST(NULLIF(regexp_extract(f[8], '(^|;)END=([^;]*)', 2), '') AS BIGINT) AS end_pos,
    f[7] AS fraw
  FROM raw
)
SELECT chrom, pos, alt, end_pos,
  CASE WHEN alt LIKE '<%' AND alt LIKE '%>' THEN 'sv'
       WHEN length(ref) = 1 AND length(alt) = 1 THEN 'snp'
       WHEN length(ref) <> length(alt) THEN 'indel'
       ELSE 'mnp' END AS variant_type,
  CASE WHEN fraw IN ('.', '', 'PASS') THEN '' ELSE fraw END AS filters
FROM dec WHERE alt <> '' AND alt <> '.'
