WITH raw AS (
  SELECT string_split(column0, chr(9)) AS f
  FROM read_csv('/root/reference/tests/fixtures/gnomad_subset.vcf.gz',
    sep=chr(1), quote='', header=false, columns={'column0':'VARCHAR'})
  WHERE column0 NOT LIKE '#%'
),
dec AS (
  SELECT 'chr' || regexp_replace(f[1], '^chr', '') AS chrom,
         CAST(f[2] AS BIGINT) AS pos, f[4] AS ref,
         unnest(string_split(f[5], ',')) AS alt
  FROM raw
),
sites AS (
  SELECT chrom, pos, ref, alt, COUNT(*) AS cnt
  FROM dec WHERE alt <> '' AND alt <> '.'
  GROUP BY 1, 2, 3, 4
)
SELECT COUNT(*) AS n_sites,
       CAST(SUM(CASE WHEN cnt > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_sites
FROM sites
