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
, dn AS (
  SELECT c.chrom, c.pos, c.ref, c.alt, 'de_novo' AS pattern
  FROM child c
  LEFT JOIN father f USING (chrom, pos, ref, alt)
  LEFT JOIN mother m USING (chrom, pos, ref, alt)
  WHERE c._cls IN ('het', 'hom_alt')
    AND COALESCE(f.father_cls, 'missing') IN ('hom_ref', 'missing')
    AND COALESCE(m.mother_cls, 'missing') IN ('hom_ref', 'missing')
),
ar AS (
  SELECT c.chrom, c.pos, c.ref, c.alt, 'autosomal_recessive' AS pattern
  FROM child c
  JOIN father f USING (chrom, pos, ref, alt)
  JOIN mother m USING (chrom, pos, ref, alt)
  WHERE c._cls = 'hom_alt' AND f.father_cls = 'het' AND m.mother_cls = 'het'
),
sites AS (
  SELECT c.chrom, c.pos, c.ref, c.alt, c.gene,
    (COALESCE(f.father_cls, 'missing') IN ('het', 'hom_alt')
      AND NOT COALESCE(m.mother_cls, 'hom_ref') IN ('het', 'hom_alt')) AS from_father,
    (COALESCE(m.mother_cls, 'missing') IN ('het', 'hom_alt')
      AND NOT COALESCE(f.father_cls, 'hom_ref') IN ('het', 'hom_alt')) AS from_mother
  FROM child c
  LEFT JOIN father f USING (chrom, pos, ref, alt)
  LEFT JOIN mother m USING (chrom, pos, ref, alt)
  WHERE c._cls = 'het' AND c.gene IS NOT NULL
),
genes AS (
  SELECT gene FROM sites GROUP BY gene
  HAVING COUNT(*) >= 2
    AND SUM(CASE WHEN from_father THEN 1 ELSE 0 END) >= 1
    AND SUM(CASE WHEN from_mother THEN 1 ELSE 0 END) >= 1
),
ch AS (
  SELECT s.chrom, s.pos, s.ref, s.alt, 'compound_het' AS pattern
  FROM sites s WHERE s.gene IN (SELECT gene FROM genes)
)
SELECT * FROM ar UNION ALL SELECT * FROM dn UNION ALL SELECT * FROM ch
