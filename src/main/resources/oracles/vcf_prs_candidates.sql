WITH raw AS (
  SELECT string_split(column0, chr(9)) AS f
  FROM read_csv('/tmp/graft_prscand.vcf',
    sep=chr(1), quote='', header=false, columns={'column0':'VARCHAR'})
  WHERE column0 NOT LIKE '#%'
),
v AS (
  SELECT 'chr' || regexp_replace(f[1], '^chr', '') AS chrom,
    CAST(f[2] AS BIGINT) AS pos, f[4] AS ref,
    string_split(f[5], ',')[1] AS alt,
    CASE WHEN f[3] IN ('.', '') THEN NULL ELSE f[3] END AS rs_id,
    TRY_CAST(string_split(NULLIF(regexp_extract(f[8], '(^|;)R2=([^;]*)', 2), ''), ',')[1] AS DOUBLE) AS info_score,
    TRY_CAST(NULLIF(regexp_extract(f[8], '(^|;)AF_nfe=([^;]*)', 2), '') AS DOUBLE) AS af_nfe,
    TRY_CAST(NULLIF(regexp_extract(f[8], '(^|;)AF_afr=([^;]*)', 2), '') AS DOUBLE) AS af_afr,
    TRY_CAST(NULLIF(regexp_extract(f[8], '(^|;)AF_eas=([^;]*)', 2), '') AS DOUBLE) AS af_eas,
    string_split(f[9], ':') AS fkeys,
    [f[10], f[11], f[12], f[13]] AS svals,
    CAST(('0x' || substr(md5(regexp_replace(f[1], '^chr', '') || ':' || f[2] || ':' ||
      upper(f[4]) || ':' || upper(string_split(f[5], ',')[1])), 1, 15)) AS BIGINT) AS variant_id
  FROM raw
),
geno AS (
  SELECT chrom, pos, ref, alt, variant_id,
    TRY_CAST(NULLIF(string_split_regex(sval, '[/|]')[1], '.') AS INT) AS a1,
    TRY_CAST(NULLIF(string_split_regex(sval, '[/|]')[2], '.') AS INT) AS a2
  FROM (SELECT *, unnest(svals) AS sval FROM v)
),
cls AS (
  SELECT *, CASE WHEN a1 IS NULL OR a2 IS NULL THEN 'missing'
    WHEN a1 = a2 THEN (CASE WHEN a1 = 0 THEN 'hom_ref' ELSE 'hom_alt' END)
    ELSE 'het' END AS _cls
  FROM geno
),
counts AS (
  SELECT chrom, pos, ref, alt, variant_id,
    SUM(CASE WHEN _cls = 'het' THEN 1 ELSE 0 END) AS n_het,
    SUM(CASE WHEN _cls = 'hom_ref' THEN 1 ELSE 0 END) AS n_hom_ref,
    SUM(CASE WHEN _cls = 'hom_alt' THEN 1 ELSE 0 END) AS n_hom_alt,
    COUNT(*) AS n_samples
  FROM cls GROUP BY 1, 2, 3, 4, 5
),
freq AS (
  SELECT *, CAST(n_het + n_hom_ref + n_hom_alt AS BIGINT) AS n_called,
    CAST(2 * n_hom_ref + n_het AS BIGINT) AS na,
    CAST(2 * n_hom_alt + n_het AS BIGINT) AS nb
  FROM counts
),
hweu AS (
  SELECT chrom, pos, ref, alt, n_het,
    unnest(generate_series(abs(na - nb) % 2, least(na, nb), 2)) AS x, na, nb
  FROM freq WHERE na > 0 AND nb > 0
),
hweu2 AS (
  SELECT *, exp(x * ln(2) - lgamma((na - x) / 2 + 1) - lgamma(x + 1)
                - lgamma((nb - x) / 2 + 1)) AS u
  FROM hweu
),
hwew AS (
  SELECT *, SUM(u) OVER (PARTITION BY chrom, pos, ref, alt) AS total,
    COALESCE(MAX(CASE WHEN x = n_het THEN u END)
      OVER (PARTITION BY chrom, pos, ref, alt), 0) AS u_obs
  FROM hweu2
),
hwep AS (
  SELECT chrom, pos, ref, alt,
    LEAST(1.0, SUM(CASE WHEN u / total <= u_obs / total + 1e-10
                        THEN u / total ELSE 0 END)) AS hwe_p
  FROM hwew GROUP BY 1, 2, 3, 4
),
qc AS (
  SELECT f.chrom, f.pos, f.ref, f.alt,
    CAST(f.n_called AS DOUBLE) / f.n_samples AS call_rate,
    CASE WHEN f.n_called = 0 THEN 'NaN'::DOUBLE
         ELSE CAST(2 * f.n_hom_alt + f.n_het AS DOUBLE) / (2 * f.n_called) END AS aaf,
    CASE WHEN f.n_called = 0 THEN 'NaN'::DOUBLE
         ELSE LEAST(CAST(2 * f.n_hom_alt + f.n_het AS DOUBLE) / (2 * f.n_called),
                    1.0 - CAST(2 * f.n_hom_alt + f.n_het AS DOUBLE) / (2 * f.n_called)) END AS maf,
    CASE WHEN f.n_called = 0 THEN 'NaN'::DOUBLE
         WHEN f.na = 0 OR f.nb = 0 THEN 1.0
         ELSE h.hwe_p END AS hwe_p
  FROM freq f LEFT JOIN hwep h USING (chrom, pos, ref, alt)
),
panel AS (
  SELECT trim(f[1]) AS rsid, regexp_replace(trim(f[2]), '^chr', '') AS p_chrom,
    CAST(trim(f[3]) AS BIGINT) AS position,
    upper(trim(f[4])) AS a1, upper(trim(f[5])) AS a2
  FROM (SELECT string_split(column0, chr(9)) AS f
        FROM read_csv('/tmp/graft_prscand_panel.tsv',
          sep=chr(1), quote='', header=false, columns={'column0':'VARCHAR'}))
  WHERE f[1] <> 'rsid'
),
flagged AS (
  SELECT v.*, (p.rsid IS NOT NULL) AS in_hapmap3
  FROM v LEFT JOIN panel p
    ON regexp_replace(v.chrom, '^chr', '') = p.p_chrom AND v.pos = p.position
   AND (((upper(v.ref) = p.a1 AND upper(v.alt) = p.a2) OR
         (upper(v.ref) = p.a2 AND upper(v.alt) = p.a1))
     -- whole-allele complement + frozenset ambiguity, as in
     -- vcf_hapmap3_flag.sql (hapmap3.py dict-complement semantics)
     OR (NOT ((upper(v.ref) = 'A' AND upper(v.alt) = 'T')
           OR (upper(v.ref) = 'T' AND upper(v.alt) = 'A')
           OR (upper(v.ref) = 'C' AND upper(v.alt) = 'G')
           OR (upper(v.ref) = 'G' AND upper(v.alt) = 'C'))
         AND ((CASE WHEN upper(v.ref) IN ('A','C','G','T')
                    THEN translate(upper(v.ref), 'ACGT', 'TGCA')
                    ELSE upper(v.ref) END = p.a1
               AND CASE WHEN upper(v.alt) IN ('A','C','G','T')
                        THEN translate(upper(v.alt), 'ACGT', 'TGCA')
                        ELSE upper(v.alt) END = p.a2)
           OR (CASE WHEN upper(v.ref) IN ('A','C','G','T')
                    THEN translate(upper(v.ref), 'ACGT', 'TGCA')
                    ELSE upper(v.ref) END = p.a2
               AND CASE WHEN upper(v.alt) IN ('A','C','G','T')
                        THEN translate(upper(v.alt), 'ACGT', 'TGCA')
                        ELSE upper(v.alt) END = p.a1))))
),
gwas AS (
  SELECT trim(f[1]) AS chromosome, CAST(trim(f[2]) AS BIGINT) AS bp,
    upper(trim(f[3])) AS ea, upper(trim(f[4])) AS oa,
    TRY_CAST(trim(f[5]) AS DOUBLE) AS p_value,
    TRY_CAST(trim(f[6]) AS DOUBLE) AS beta,
    TRY_CAST(trim(f[7]) AS DOUBLE) AS standard_error
  FROM (SELECT string_split(column0, chr(9)) AS f
        FROM read_csv('/tmp/graft_prscand_gwas.tsv',
          sep=chr(1), quote='', header=false, columns={'column0':'VARCHAR'}))
  WHERE f[1] <> 'chromosome'
),
stats AS (
  SELECT variant_id, beta, standard_error, p_value FROM (
    SELECT g.*, vv.variant_id, c.prio,
      ROW_NUMBER() OVER (PARTITION BY g.bp, g.ea, g.oa ORDER BY c.prio) AS rn
    FROM gwas g
    CROSS JOIN (SELECT 1 AS prio UNION ALL SELECT 2) c
    JOIN v vv ON regexp_replace(g.chromosome, '^chr', '') =
                 regexp_replace(vv.chrom, '^chr', '')
             AND g.bp = vv.pos
             AND (CASE WHEN c.prio = 1 THEN g.oa ELSE g.ea END) = upper(vv.ref)
             AND (CASE WHEN c.prio = 1 THEN g.ea ELSE g.oa END) = upper(vv.alt)
  ) WHERE rn = 1
)
SELECT fl.variant_id, fl.chrom, fl.pos, fl.ref, fl.alt, fl.rs_id,
  fl.info_score, q.call_rate, q.hwe_p, q.maf, q.aaf, fl.in_hapmap3,
  -- reference matview columns (`prs_views.py:45-46`): the fixture store
  -- predates LD annotation and carries no batch stamp, so both are NULL
  CAST(NULL AS BIGINT) AS ld_block_id,
  CAST(NULL AS VARCHAR) AS load_batch_id,
  fl.af_nfe AS gnomad_nfe_af, fl.af_afr AS gnomad_afr_af,
  fl.af_eas AS gnomad_eas_af,
  s.beta, s.standard_error, s.p_value
FROM flagged fl
JOIN qc q USING (chrom, pos, ref, alt)
JOIN stats s USING (variant_id)
WHERE fl.in_hapmap3 AND fl.info_score >= 0.6 AND q.call_rate >= 0.98
  AND q.hwe_p > 1e-6 AND q.maf >= 0.01
