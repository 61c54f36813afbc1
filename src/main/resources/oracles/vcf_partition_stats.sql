WITH raw AS (
  SELECT string_split(column0, chr(9)) AS f
  FROM read_csv('/root/reference/tests/fixtures/genmod_sv.vcf.gz',
    sep=chr(1), quote='', header=false, columns={'column0':'VARCHAR'})
  WHERE column0 NOT LIKE '#%'
),
dec AS (
  SELECT 'chr' || regexp_replace(f[1], '^chr', '') AS chrom,
    CAST(f[2] AS BIGINT) AS pos,
    unnest(string_split(f[5], ',')) AS alt
  FROM raw
)
SELECT chrom, CAST(COUNT(*) AS BIGINT) AS n_rows,
  MIN(pos) AS min_pos, MAX(pos) AS max_pos
FROM dec WHERE alt <> '' AND alt <> '.'
GROUP BY chrom
