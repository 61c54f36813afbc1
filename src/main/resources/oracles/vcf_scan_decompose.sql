WITH raw AS (
  SELECT string_split(column0, chr(9)) AS f
  FROM read_csv('/root/reference/tests/fixtures/multiallelic.vcf',
    sep=chr(1), quote='', header=false, columns={'column0':'VARCHAR'})
  WHERE column0 NOT LIKE '#%'
),
body AS (
  SELECT 'chr' || regexp_replace(f[1], '^chr', '') AS chrom,
         CAST(f[2] AS BIGINT) AS pos, f[4] AS ref,
         string_split(f[5], ',') AS alts,
         NULLIF(regexp_extract(f[8], '(^|;)AF=([^;]*)', 2), '') AS af
  FROM raw
),
dec AS (
  SELECT chrom, pos, ref,
         unnest(alts) AS alt,
         unnest(generate_series(0, len(alts) - 1)) AS alt_idx,
         len(alts) AS n_alts, af
  FROM body
)
SELECT chrom, pos, ref, alt, CAST(alt_idx AS INT) AS alt_idx,
  CAST(n_alts AS INT) AS n_alts,
  CASE WHEN n_alts = 1 THEN af ELSE string_split(af, ',')[alt_idx + 1] END AS af_sliced,
  CASE WHEN alt LIKE '<%' AND alt LIKE '%>' THEN 'sv'
       WHEN length(ref) = 1 AND length(alt) = 1 THEN 'snp'
       WHEN length(ref) <> length(alt) THEN 'indel'
       ELSE 'mnp' END AS variant_type
FROM dec
WHERE alt <> '' AND alt <> '.'
