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
         f[8] AS info
  FROM raw
),
base AS (SELECT * FROM dec WHERE alt <> '' AND alt <> '.'),
anno AS (
  SELECT chrom, pos, ref, alt,
    CAST(TRY_CAST(NULLIF(string_split(
      NULLIF(regexp_extract(info, '(^|;)AC=([^;]*)', 2), ''), ',')[1], '.')
      AS DOUBLE) AS INT) AS src_ac,
    TRY_CAST(NULLIF(string_split(
      NULLIF(regexp_extract(info, '(^|;)AF=([^;]*)', 2), ''), ',')[1], '.')
      AS DOUBLE) AS src_af
  FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY chrom, pos, ref, alt) AS _rn
        FROM base) WHERE _rn = 1
)
SELECT v.chrom, v.pos, v.ref, v.alt, v.rs_id, a.src_ac, a.src_af
FROM base v LEFT JOIN anno a USING (chrom, pos, ref, alt)
WHERE a.src_af IS NOT NULL
ORDER BY v.chrom, v.pos, v.ref, v.alt
LIMIT 1000
