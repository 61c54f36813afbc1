WITH raw AS (
  SELECT string_split(column0, chr(9)) AS f
  FROM read_csv('/tmp/graft_dosage.vcf',
    sep=chr(1), quote='', header=false, columns={'column0':'VARCHAR'})
  WHERE column0 NOT LIKE '#%'
),
gts AS (
  SELECT f[1] AS v_chrom, f[2] AS v_pos, f[4] AS v_ref,
    string_split(f[5], ',') AS alts,
    string_split(f[9], ':') AS fkeys,
    unnest(['S1', 'S2', 'S3']) AS sample_id,
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
    CASE WHEN list_position(fkeys, 'DS') BETWEEN 1 AND nk
         THEN vals[list_position(fkeys, 'DS')] END AS ds_raw,
    CASE WHEN list_position(fkeys, 'GP') BETWEEN 1 AND nk
         THEN vals[list_position(fkeys, 'GP')] END AS gp_raw
  FROM parsed
),
rec AS (
  SELECT *,
    TRY_CAST(NULLIF(NULLIF(string_split_regex(gt_raw, '[/|]')[1], '.'), '') AS INT) AS a1_line,
    TRY_CAST(NULLIF(NULLIF(string_split_regex(gt_raw, '[/|]')[2], '.'), '') AS INT) AS a2_line,
    contains(gt_raw, '|') AS phased,
    CASE WHEN gp_raw IS NULL THEN NULL
         ELSE list_transform(string_split(gp_raw, ','),
                x -> TRY_CAST(NULLIF(NULLIF(x, '.'), '') AS DOUBLE)) END AS gp
  FROM fmtv
),
dec AS (
  SELECT *, unnest(alts) AS alt,
    unnest(generate_series(1, len(alts))) AS k,
    len(alts) AS n_alts
  FROM rec
),
geno AS (
  SELECT v_chrom, v_pos, v_ref, alt AS v_alt,
    sample_id,
    CASE WHEN gt_raw NOT LIKE '%/%' AND gt_raw NOT LIKE '%|%'
              AND a1_line IS NOT NULL THEN CAST(a1_line AS VARCHAR)
         ELSE COALESCE(CAST(a1_line AS VARCHAR), '.') ||
      (CASE WHEN phased THEN '|' ELSE '/' END) ||
      COALESCE(CAST(a2_line AS VARCHAR), '.') END AS gt,
    COALESCE(
      TRY_CAST(NULLIF(NULLIF(string_split(ds_raw, ',')[k], '.'), '') AS DOUBLE),
      CASE WHEN len(CASE WHEN n_alts = 1 THEN gp
             ELSE [gp[1], gp[CAST((k * (k + 1)) / 2 AS INT) + 1], gp[CAST((k * (k + 1)) / 2 AS INT) + k + 1]] END) = 3
        AND (CASE WHEN n_alts = 1 THEN gp
             ELSE [gp[1], gp[CAST((k * (k + 1)) / 2 AS INT) + 1], gp[CAST((k * (k + 1)) / 2 AS INT) + k + 1]] END)[2] IS NOT NULL
        AND (CASE WHEN n_alts = 1 THEN gp
             ELSE [gp[1], gp[CAST((k * (k + 1)) / 2 AS INT) + 1], gp[CAST((k * (k + 1)) / 2 AS INT) + k + 1]] END)[3] IS NOT NULL
      THEN (CASE WHEN n_alts = 1 THEN gp
             ELSE [gp[1], gp[CAST((k * (k + 1)) / 2 AS INT) + 1], gp[CAST((k * (k + 1)) / 2 AS INT) + k + 1]] END)[2]
         + 2 * (CASE WHEN n_alts = 1 THEN gp
             ELSE [gp[1], gp[CAST((k * (k + 1)) / 2 AS INT) + 1], gp[CAST((k * (k + 1)) / 2 AS INT) + k + 1]] END)[3]
      END) AS dosage
  FROM dec WHERE alt <> '' AND alt <> '.'
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_genotypes,
  CAST(COUNT(DISTINCT sample_id) AS BIGINT) AS n_samples,
  CAST(COUNT(DISTINCT (v_chrom, v_pos, v_ref, v_alt)) AS BIGINT) AS n_variants,
  CAST(SUM(CASE WHEN dosage IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_with_dosage,
  CAST(SUM(CASE WHEN gt <> './.' THEN 1 ELSE 0 END) AS BIGINT) AS n_called,
  CAST(COUNT(*) AS BIGINT) AS n_adj_pass,
  CAST(SUM(CASE WHEN dosage IS NOT NULL AND (dosage < 0 OR dosage > 2)
           THEN 1 ELSE 0 END) AS BIGINT) AS n_dosage_violations
FROM geno
