WITH raw AS (
  SELECT string_split(column0, chr(9)) AS f
  FROM read_csv('/tmp/graft_gnomad_style.vcf',
    sep=chr(1), quote='', header=false, columns={'column0':'VARCHAR'})
  WHERE column0 NOT LIKE '#%'
),
v AS (
  SELECT regexp_replace(f[1], '^chr', '') AS bchrom,
         CAST(f[2] AS BIGINT) AS pos, f[4] AS ref,
         unnest(string_split(f[5], ',')) AS alt, f[8] AS info
  FROM raw
),
vid AS (
  SELECT *, CAST(('0x' || substr(md5(bchrom || ':' || pos || ':' ||
      upper(ref) || ':' || upper(alt)), 1, 15)) AS BIGINT) AS variant_id
  FROM v WHERE alt <> '' AND alt <> '.'
),
longf AS (
  SELECT variant_id, unnest(['AFR','AMR','ASJ','EAS','FIN','NFE','SAS']) AS population,
    info
  FROM vid
),
vals AS (
  SELECT variant_id, population,
    TRY_CAST(COALESCE(
      NULLIF(regexp_extract(info, '(^|;)AF_' || population || '=([^;]*)', 2), ''),
      NULLIF(regexp_extract(info, '(^|;)AF_' || lower(population) || '=([^;]*)', 2), '')
    ) AS DOUBLE) AS af,
    COALESCE(
      NULLIF(regexp_extract(info, '(^|;)AC_' || population || '=([^;]*)', 2), ''),
      NULLIF(regexp_extract(info, '(^|;)AC_' || lower(population) || '=([^;]*)', 2), '')
    ) AS ac,
    COALESCE(
      NULLIF(regexp_extract(info, '(^|;)AN_' || population || '=([^;]*)', 2), ''),
      NULLIF(regexp_extract(info, '(^|;)AN_' || lower(population) || '=([^;]*)', 2), '')
    ) AS an
  FROM longf
),
present AS (
  SELECT * FROM vals
  WHERE (ac IS NOT NULL OR an IS NOT NULL OR af IS NOT NULL)
    AND population NOT IN ('ASJ', 'FIN') AND af IS NOT NULL
),
ranked AS (
  SELECT variant_id, af AS popmax_af, population AS popmax_population,
    ROW_NUMBER() OVER (PARTITION BY variant_id
      ORDER BY af DESC, population ASC) AS rn
  FROM present
)
SELECT variant_id, popmax_af, popmax_population FROM ranked WHERE rn = 1
