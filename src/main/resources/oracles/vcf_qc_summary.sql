WITH raw AS (
  SELECT string_split(column0, chr(9)) AS f
  FROM read_csv('/root/reference/tests/fixtures/with_annotations.vcf',
    sep=chr(1), quote='', header=false, columns={'column0':'VARCHAR'})
  WHERE column0 NOT LIKE '#%'
),
gts AS (
  SELECT 'chr' || regexp_replace(f[1], '^chr', '') AS chrom,
         CAST(f[2] AS BIGINT) AS pos, f[4] AS ref,
         string_split(f[5], ',') AS alts,
         string_split(f[9], ':') AS fkeys,
         unnest(['HG002', 'HG003', 'HG004']) AS sample_id,
         unnest([f[10], f[11], f[12]]) AS sval
  FROM raw
),
parsed AS (
  SELECT *, string_split(sval, ':') AS vals,
    least(len(fkeys), len(string_split(sval, ':'))) AS nk
  FROM gts
),
fmtv AS (
  SELECT *,
    CASE WHEN list_position(fkeys, 'GT') BETWEEN 1 AND nk
         THEN vals[list_position(fkeys, 'GT')] END AS gt_raw,
    CASE WHEN list_position(fkeys, 'GQ') BETWEEN 1 AND nk
         THEN vals[list_position(fkeys, 'GQ')] END AS gq_raw,
    CASE WHEN list_position(fkeys, 'DP') BETWEEN 1 AND nk
         THEN vals[list_position(fkeys, 'DP')] END AS dp_raw,
    CASE WHEN list_position(fkeys, 'AD') BETWEEN 1 AND nk
         THEN vals[list_position(fkeys, 'AD')] END AS ad_raw
  FROM parsed
),
rec AS (
  SELECT *,
    TRY_CAST(NULLIF(NULLIF(string_split_regex(gt_raw, '[/|]')[1], '.'), '') AS INT) AS a1_line,
    TRY_CAST(NULLIF(NULLIF(string_split_regex(gt_raw, '[/|]')[2], '.'), '') AS INT) AS a2_line,
    contains(gt_raw, '|') AS phased,
    TRY_CAST(NULLIF(NULLIF(gq_raw, '.'), '') AS INT) AS gq,
    TRY_CAST(NULLIF(NULLIF(dp_raw, '.'), '') AS INT) AS dp,
    CASE WHEN ad_raw IS NULL THEN NULL
         ELSE list_transform(string_split(ad_raw, ','),
                x -> TRY_CAST(NULLIF(NULLIF(x, '.'), '') AS INT)) END AS ad
  FROM fmtv
),
geno AS (
  SELECT chrom, pos, ref, sample_id, gq, dp, ad, phased,
    CASE WHEN gt_raw NOT LIKE '%/%' AND gt_raw NOT LIKE '%|%'
              AND a1_line IS NOT NULL THEN CAST(a1_line AS VARCHAR)
         ELSE COALESCE(CAST(a1_line AS VARCHAR), '.') ||
      (CASE WHEN phased THEN '|' ELSE '/' END) ||
      COALESCE(CAST(a2_line AS VARCHAR), '.') END AS gt,
    unnest(alts) AS alt,
    unnest(generate_series(1, len(alts))) AS k,
    a1_line, a2_line
  FROM rec
),
geno2 AS (
  SELECT chrom, pos, ref, alt, sample_id, gt, phased, gq, dp, ad,
    CASE WHEN a1_line IS NULL THEN NULL WHEN a1_line = k THEN 1 ELSE 0 END AS a1,
    CASE WHEN a2_line IS NULL THEN NULL WHEN a2_line = k THEN 1 ELSE 0 END AS a2
  FROM geno WHERE alt <> '' AND alt <> '.'
),
cls AS (
  SELECT *,
    CASE WHEN gt IN ('.', './.', '.|.') THEN 'missing'
         WHEN gt NOT LIKE '%/%' AND gt NOT LIKE '%|%' THEN
           (CASE WHEN a1 IS NULL THEN 'missing'
                 WHEN a1 = 0 THEN 'hom_ref' ELSE 'hom_alt' END)
         WHEN a1 IS NULL OR a2 IS NULL THEN 'missing'
         WHEN a1 = a2 THEN (CASE WHEN a1 = 0 THEN 'hom_ref' ELSE 'hom_alt' END)
         ELSE 'het' END AS _cls
  FROM geno2
),
counts AS (
  SELECT chrom, pos, ref, alt,
    CAST(SUM(CASE WHEN _cls = 'het' THEN 1 ELSE 0 END) AS INT) AS n_het,
    CAST(SUM(CASE WHEN _cls = 'hom_ref' THEN 1 ELSE 0 END) AS INT) AS n_hom_ref,
    CAST(SUM(CASE WHEN _cls = 'hom_alt' THEN 1 ELSE 0 END) AS INT) AS n_hom_alt,
    CAST(COUNT(*) AS INT) AS n_samples
  FROM cls GROUP BY 1, 2, 3, 4
),
freq AS (
  SELECT *, n_het + n_hom_ref + n_hom_alt AS n_called,
    2 * n_hom_ref + n_het AS na, 2 * n_hom_alt + n_het AS nb
  FROM counts
),
hweprob AS (
  SELECT chrom, pos, ref, alt, n_het,
    unnest(generate_series(abs(na - nb) % 2, least(na, nb), 2)) AS x,
    na, nb
  FROM freq WHERE na > 0 AND nb > 0 AND least(na, nb) >= abs(na - nb) % 2
),
hweu AS (
  SELECT *, exp(x * ln(2) - lgamma((na - x) / 2 + 1) - lgamma(x + 1)
                - lgamma((nb - x) / 2 + 1)) AS u
  FROM hweprob
),
hwew AS (
  SELECT *, SUM(u) OVER (PARTITION BY chrom, pos, ref, alt) AS total,
    MAX(CASE WHEN x = n_het THEN u END)
      OVER (PARTITION BY chrom, pos, ref, alt) AS u_obs
  FROM hweu
),
hwep AS (
  SELECT chrom, pos, ref, alt,
    LEAST(1.0, SUM(CASE WHEN u / total <= u_obs / total + 1e-10
                        THEN u / total ELSE 0 END)) AS hwe_p
  FROM hwew GROUP BY 1, 2, 3, 4
),
variant_qc AS (
  SELECT f.chrom, f.pos, f.ref, f.alt, f.n_het, f.n_hom_ref, f.n_hom_alt,
    f.n_samples, f.n_called,
    CASE WHEN f.n_samples > 0
         THEN CAST(f.n_called AS DOUBLE) / f.n_samples END AS call_rate,
    CASE WHEN f.n_called = 0 THEN 'NaN'::DOUBLE
         ELSE CAST(2 * f.n_hom_alt + f.n_het AS DOUBLE) / (2 * f.n_called) END AS aaf,
    CASE WHEN f.n_called = 0 THEN 'NaN'::DOUBLE
         ELSE LEAST(CAST(2 * f.n_hom_alt + f.n_het AS DOUBLE) / (2 * f.n_called),
                    1.0 - CAST(2 * f.n_hom_alt + f.n_het AS DOUBLE) / (2 * f.n_called))
         END AS maf,
    CAST(CASE WHEN f.n_called = 0 THEN 0
              ELSE LEAST(2 * f.n_hom_alt + f.n_het, 2 * f.n_hom_ref + f.n_het)
         END AS INT) AS mac,
    CASE WHEN f.n_called = 0 THEN 'NaN'::DOUBLE
         WHEN f.na = 0 OR f.nb = 0 THEN 1.0
         ELSE h.hwe_p END AS hwe_p
  FROM freq f LEFT JOIN hwep h USING (chrom, pos, ref, alt)
)
SELECT CAST(COUNT(*) AS BIGINT) AS total_variants,
  CAST(0 AS BIGINT) AS hapmap3_variants,
  CAST(0 AS BIGINT) AS high_info_variants,
  CAST(SUM(CASE WHEN call_rate >= 0.98 THEN 1 ELSE 0 END) AS BIGINT) AS high_callrate_variants,
  CAST(SUM(CASE WHEN hwe_p > 1e-6 THEN 1 ELSE 0 END) AS BIGINT) AS hwe_pass_variants,
  CAST(SUM(CASE WHEN maf >= 0.01 THEN 1 ELSE 0 END) AS BIGINT) AS common_variants,
  CAST(0 AS BIGINT) AS prs_ready_variants
FROM variant_qc
