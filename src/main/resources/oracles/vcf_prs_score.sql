WITH raw AS (
  SELECT string_split(column0, chr(9)) AS f
  FROM read_csv('/tmp/graft_trio.vcf',
    sep=chr(1), quote='', header=false, columns={'column0':'VARCHAR'})
  WHERE column0 NOT LIKE '#%'
),
gts AS (
  SELECT 'chr' || regexp_replace(f[1], '^chr', '') AS chrom,
         CAST(f[2] AS BIGINT) AS pos, f[4] AS ref,
         string_split(f[5], ',') AS alts,
         NULLIF(regexp_extract(f[8], '(^|;)AF=([^;]*)', 2), '') AS af,
         NULLIF(regexp_extract(f[8], '(^|;)SYMBOL=([^;]*)', 2), '') AS gene,
         unnest(['CHILD', 'FATHER', 'MOTHER']) AS sample_id,
         unnest([f[10], f[11], f[12]]) AS gt_raw
  FROM raw
),
rec AS (
  SELECT *,
    TRY_CAST(NULLIF(NULLIF(string_split_regex(gt_raw, '[/|]')[1], '.'), '') AS INT) AS a1_line,
    TRY_CAST(NULLIF(NULLIF(string_split_regex(gt_raw, '[/|]')[2], '.'), '') AS INT) AS a2_line,
    contains(gt_raw, '|') AS phased
  FROM gts
),
dec AS (
  SELECT chrom, pos, ref, gene, sample_id, a1_line, a2_line, phased,
    CASE WHEN gt_raw NOT LIKE '%/%' AND gt_raw NOT LIKE '%|%'
              AND a1_line IS NOT NULL THEN CAST(a1_line AS VARCHAR)
         ELSE COALESCE(CAST(a1_line AS VARCHAR), '.') ||
      (CASE WHEN phased THEN '|' ELSE '/' END) ||
      COALESCE(CAST(a2_line AS VARCHAR), '.') END AS gt,
    unnest(alts) AS alt,
    unnest(generate_series(1, len(alts))) AS k,
    len(alts) AS n_alts, af
  FROM rec
),
cls AS (
  SELECT chrom, pos, ref, alt, gene, sample_id, gt, n_alts, k, af,
    CASE WHEN a1_line IS NULL THEN NULL WHEN a1_line = k THEN 1 ELSE 0 END AS a1,
    CASE WHEN a2_line IS NULL THEN NULL WHEN a2_line = k THEN 1 ELSE 0 END AS a2,
    CASE WHEN gt IN ('.', './.', '.|.') THEN 'missing'
         WHEN a1_line IS NULL OR a2_line IS NULL THEN 'missing'
         WHEN (CASE WHEN a1_line = k THEN 1 ELSE 0 END) =
              (CASE WHEN a2_line = k THEN 1 ELSE 0 END)
         THEN (CASE WHEN a1_line <> k AND a2_line <> k THEN 'hom_ref' ELSE 'hom_alt' END)
         ELSE 'het' END AS _cls
  FROM dec WHERE alt <> '' AND alt <> '.'
),
child AS (SELECT * FROM cls WHERE sample_id = 'CHILD'),
father AS (SELECT chrom, pos, ref, alt, _cls AS father_cls FROM cls WHERE sample_id = 'FATHER'),
mother AS (SELECT chrom, pos, ref, alt, _cls AS mother_cls FROM cls WHERE sample_id = 'MOTHER')
, weights AS (
  SELECT DISTINCT chrom, pos, ref, alt,
    COALESCE(TRY_CAST((CASE WHEN n_alts = 1 THEN af
      ELSE string_split(af, ',')[k] END) AS DOUBLE), 0.1) AS effect_weight
  FROM cls
),
dosed AS (
  SELECT c.chrom, c.pos, c.ref, c.alt, c.sample_id,
    CASE WHEN c.a1 IS NULL OR c.a2 IS NULL THEN NULL
         ELSE CAST((CASE WHEN c.a1 > 0 THEN 1 ELSE 0 END) +
                   (CASE WHEN c.a2 > 0 THEN 1 ELSE 0 END) AS DOUBLE) END AS dosage_eff
  FROM cls c
)
SELECT d.sample_id, SUM(w.effect_weight * d.dosage_eff) AS prs_score,
  CAST(COUNT(*) AS BIGINT) AS n_variants_used
FROM dosed d JOIN weights w USING (chrom, pos, ref, alt)
WHERE d.dosage_eff IS NOT NULL
GROUP BY d.sample_id
