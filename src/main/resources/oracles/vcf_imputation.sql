WITH mini AS (
  SELECT string_split(column0, chr(9)) AS f
  FROM read_csv('/tmp/graft_imp_minimac.vcf',
    sep=chr(1), quote='', header=false, columns={'column0':'VARCHAR'})
  WHERE column0 NOT LIKE '#%'
),
mini_out AS (
  SELECT 'chr' || regexp_replace(f[1], '^chr', '') AS chrom,
    CAST(f[2] AS BIGINT) AS pos, f[4] AS ref,
    unnest(string_split(f[5], ',')) AS alt,
    TRY_CAST(string_split(NULLIF(regexp_extract(f[8], '(^|;)R2=([^;]*)', 2), ''), ',')[1] AS DOUBLE) AS info_score,
    regexp_matches(f[8], '(^|;)IMPUTED($|;|=)') AS is_imputed,
    regexp_matches(f[8], '(^|;)TYPED($|;|=)') AS is_typed,
    'minimac4' AS imputation_source
  FROM mini
),
beagle AS (
  SELECT string_split(column0, chr(9)) AS f
  FROM read_csv('/tmp/graft_imp_beagle.vcf',
    sep=chr(1), quote='', header=false, columns={'column0':'VARCHAR'})
  WHERE column0 NOT LIKE '#%'
),
bg_dec AS (
  SELECT 'chr' || regexp_replace(f[1], '^chr', '') AS chrom,
    CAST(f[2] AS BIGINT) AS pos, f[4] AS ref,
    unnest(string_split(f[5], ',')) AS alt,
    unnest(generate_series(1, len(string_split(f[5], ',')))) AS k,
    len(string_split(f[5], ',')) AS n_alts,
    NULLIF(regexp_extract(f[8], '(^|;)DR2=([^;]*)', 2), '') AS dr2_raw,
    regexp_matches(f[8], '(^|;)IMP($|;|=)') AS imp
  FROM beagle
),
bg_out AS (
  SELECT chrom, pos, ref, alt,
    TRY_CAST(string_split(CASE WHEN n_alts = 1 THEN dr2_raw
      ELSE string_split(dr2_raw, ',')[k] END, ',')[1] AS DOUBLE) AS info_score,
    imp AS is_imputed,
    COALESCE(TRY_CAST(string_split(CASE WHEN n_alts = 1 THEN dr2_raw
      ELSE string_split(dr2_raw, ',')[k] END, ',')[1] AS DOUBLE) >= 1.0
      AND NOT imp, FALSE) AS is_typed,
    'beagle' AS imputation_source
  FROM bg_dec
)
SELECT chrom, pos, ref, alt, info_score, info_score AS imputation_r2,
  is_imputed, is_typed, imputation_source FROM mini_out
UNION ALL
SELECT chrom, pos, ref, alt, info_score, info_score, is_imputed, is_typed,
  imputation_source FROM bg_out
