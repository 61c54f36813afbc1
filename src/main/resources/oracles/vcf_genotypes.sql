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
         CAST(len(string_split(f[5], ',')) AS INT) AS n_alts,
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
         THEN vals[list_position(fkeys, 'AD')] END AS ad_raw,
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
    TRY_CAST(NULLIF(NULLIF(gq_raw, '.'), '') AS INT) AS gq,
    TRY_CAST(NULLIF(NULLIF(dp_raw, '.'), '') AS INT) AS dp,
    CASE WHEN ad_raw IS NULL THEN NULL
         ELSE list_transform(string_split(ad_raw, ','),
                x -> TRY_CAST(NULLIF(NULLIF(x, '.'), '') AS INT)) END AS ad
  FROM fmtv
),
rec2 AS (
  SELECT *,
    CASE WHEN gt_raw NOT LIKE '%/%' AND gt_raw NOT LIKE '%|%'
              AND a1_line IS NOT NULL THEN CAST(a1_line AS VARCHAR)
         ELSE COALESCE(CAST(a1_line AS VARCHAR), '.') ||
      (CASE WHEN phased THEN '|' ELSE '/' END) ||
      COALESCE(CAST(a2_line AS VARCHAR), '.') END AS gt,
    CASE WHEN ad IS NULL OR len(ad) < 2
           OR list_sum(list_transform(ad, x -> COALESCE(x, 0))) = 0 THEN NULL
         ELSE CAST(list_sum(list_transform(ad[2:], x -> COALESCE(x, 0))) AS DOUBLE) /
              list_sum(list_transform(ad, x -> COALESCE(x, 0))) END AS allele_balance
  FROM rec
),
rec3 AS (
  SELECT *,
    NOT ((gq IS NOT NULL AND gq < 20) OR (dp IS NOT NULL AND dp < 10) OR
         (gt IN ('0/1', '1/0', '0|1', '1|0') AND allele_balance IS NOT NULL
          AND allele_balance < 0.2)) AS passes_adj
  FROM rec2
),
dec AS (
  SELECT *, unnest(alts) AS alt,
    unnest(generate_series(1, len(alts))) AS k
  FROM rec3
)
SELECT chrom, pos, ref, alt, CAST(k - 1 AS INT) AS alt_idx, n_alts, sample_id,
  gt, phased,
  CASE WHEN a1_line IS NULL THEN NULL WHEN a1_line = k THEN 1 ELSE 0 END AS a1,
  CASE WHEN a2_line IS NULL THEN NULL WHEN a2_line = k THEN 1 ELSE 0 END AS a2,
  gq, dp,
  COALESCE(array_to_string(list_transform(ad, x -> CAST(x AS VARCHAR)), ','), '') AS ad_csv,
  CAST(TRY_CAST(NULLIF(NULLIF(string_split(ds_raw, ',')[k], '.'), '') AS DOUBLE) AS DOUBLE) AS ds,
  '' AS gp_csv,
  CAST(NULL AS DOUBLE) AS dosage,
  allele_balance, passes_adj
FROM dec
WHERE alt <> '' AND alt <> '.'
