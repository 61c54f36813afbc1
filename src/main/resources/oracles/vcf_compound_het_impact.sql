WITH raw AS (
  SELECT string_split(column0, chr(9)) AS f
  FROM read_csv('/root/reference/tests/fixtures/snpeff/cancer.ann.vcf',
    sep=chr(1), quote='', header=false, columns={'column0':'VARCHAR'})
  WHERE column0 NOT LIKE '#%'
),
dec AS (
  SELECT 'chr' || regexp_replace(f[1], '^chr', '') AS chrom,
         CAST(f[2] AS BIGINT) AS pos, f[4] AS ref,
         unnest(string_split(f[5], ',')) AS alt,
         NULLIF(regexp_extract(f[8], '(^|;)ANN=([^;]*)', 2), '') AS ann,
         NULLIF(regexp_extract(f[8], '(^|;)SYMBOL=([^;]*)', 2), '') AS symbol,
         NULLIF(regexp_extract(f[8], '(^|;)IMPACT=([^;]*)', 2), '') AS i_imp
  FROM raw
),
base AS (SELECT * FROM dec WHERE alt <> '' AND alt <> '.'),
entries AS (
  SELECT chrom, pos, ref, alt,
    unnest(string_split(ann, ',')) AS entry,
    unnest(generate_series(1, len(string_split(ann, ',')))) AS eidx
  FROM base WHERE ann IS NOT NULL
),
valid AS (
  SELECT *, string_split(entry, '|') AS ef FROM entries
  WHERE len(string_split(entry, '|')) >= 4
    AND (string_split(entry, '|')[1] IS NULL
         OR string_split(entry, '|')[1] = ''
         OR string_split(entry, '|')[1] = alt)
),
best AS (
  SELECT chrom, pos, ref, alt, ef FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY chrom, pos, ref, alt
      ORDER BY (CASE ef[3] WHEN 'HIGH' THEN 0 WHEN 'MODERATE' THEN 1
                           WHEN 'LOW' THEN 2 ELSE 3 END), eidx) AS rn
    FROM valid) WHERE rn = 1
),
gene_variants AS (
  SELECT COALESCE(e.ef[4], b.symbol) AS gene, b.chrom, b.pos, b.ref, b.alt,
    COALESCE(e.ef[3], b.i_imp) AS impact
  FROM base b LEFT JOIN best e USING (chrom, pos, ref, alt)
  WHERE COALESCE(e.ef[4], b.symbol) IS NOT NULL
),
genes_with_high AS (SELECT DISTINCT gene FROM gene_variants WHERE impact = 'HIGH'),
genes_multi AS (SELECT gene FROM gene_variants GROUP BY gene HAVING COUNT(*) >= 2)
SELECT gv.gene, gv.chrom, gv.pos, gv.ref, gv.alt, gv.impact
FROM gene_variants gv
WHERE gv.gene IN (SELECT gene FROM genes_with_high)
  AND gv.gene IN (SELECT gene FROM genes_multi)
