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
    f[7] AS fraw
  FROM raw
)
SELECT chrom, pos, ref, alt,
  CASE WHEN fraw IN ('.', '', 'PASS') THEN '' ELSE fraw END AS filters,
  CAST(CASE WHEN fraw IN ('.', '', 'PASS') THEN 0
       ELSE len(string_split(fraw, ';')) END AS INT) AS n_failed
FROM dec WHERE alt <> '' AND alt <> '.'
