WITH raw AS (
  SELECT string_split(column0, chr(9)) AS f
  FROM read_csv('/tmp/graft_clinvar.vcf',
    sep=chr(1), quote='', header=false, columns={'column0':'VARCHAR'})
  WHERE column0 NOT LIKE '#%'
),
dec AS (
  SELECT 'chr' || regexp_replace(f[1], '^chr', '') AS chrom,
    CAST(f[2] AS BIGINT) AS pos, f[4] AS ref,
    unnest(string_split(f[5], ',')) AS alt,
    NULLIF(regexp_extract(f[8], '(^|;)CLNSIG=([^;]*)', 2), '') AS clinvar_sig
  FROM raw
),
mapped AS (
  SELECT *, CASE WHEN clinvar_sig IS NULL OR clinvar_sig = '' THEN NULL
    ELSE list_transform(string_split(replace(clinvar_sig, '/', ','), ','),
      p -> CASE trim(p)
        WHEN 'Benign' THEN 'benign'
        WHEN 'Likely_benign' THEN 'likely_benign'
        WHEN 'Uncertain_significance' THEN 'vus'
        WHEN 'Likely_pathogenic' THEN 'likely_pathogenic'
        WHEN 'Pathogenic' THEN 'pathogenic'
        WHEN 'Conflicting_interpretations_of_pathogenicity' THEN 'conflicting'
        ELSE lower(trim(p)) END)
    END AS parts
  FROM dec
)
SELECT chrom, pos, ref, alt, clinvar_sig,
  CASE WHEN parts IS NULL THEN 'not_provided'
       WHEN list_contains(parts, 'pathogenic') THEN 'pathogenic'
       WHEN list_contains(parts, 'likely_pathogenic') THEN 'likely_pathogenic'
       WHEN list_contains(parts, 'benign')
         AND NOT contains(array_to_string(parts, ','), 'pathogenic') THEN 'benign'
       WHEN list_contains(parts, 'likely_benign') THEN 'likely_benign'
       WHEN list_contains(parts, 'conflicting') THEN 'conflicting'
       WHEN len(parts) > 0 THEN parts[1]
       ELSE 'not_provided' END AS clinvar_norm
FROM mapped
