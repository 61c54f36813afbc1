-- S10 oracle: the synthetic generator is deterministic for a given seed,
-- so the oracle re-parses the SAME /tmp file the Spark query generated
-- and re-derives the decomposed per-ALT rows relationally.
WITH raw AS (
  SELECT string_split(column0, chr(9)) AS f
  FROM read_csv('/tmp/graft_synth_50.vcf',
    sep=chr(1), quote='', header=false, columns={'column0':'VARCHAR'})
  WHERE column0 NOT LIKE '#%'
),
body AS (
  SELECT 'chr' || regexp_replace(f[1], '^chr', '') AS chrom,
         CAST(f[2] AS BIGINT) AS pos,
         CASE WHEN f[3] IN ('.', '') THEN NULL ELSE f[3] END AS rs_id,
         f[4] AS ref,
         string_split(f[5], ',') AS alts,
         CAST(f[6] AS DOUBLE) AS qual,
         CAST(NULLIF(regexp_extract(f[8], '(^|;)DP=([^;]*)', 2), '') AS INT) AS dp,
         NULLIF(regexp_extract(f[8], '(^|;)AF=([^;]*)', 2), '') AS af
  FROM raw
),
dec AS (
  SELECT chrom, pos, rs_id, ref, qual, dp,
         unnest(alts) AS alt,
         unnest(generate_series(0, len(alts) - 1)) AS alt_idx,
         len(alts) AS n_alts, af
  FROM body
)
SELECT chrom, pos, ref, alt, CAST(alt_idx AS INT) AS alt_idx,
  CAST(n_alts AS INT) AS n_alts, rs_id, qual, dp,
  CASE WHEN n_alts = 1 THEN af ELSE string_split(af, ',')[alt_idx + 1] END AS af_sliced,
  CASE WHEN alt LIKE '<%' AND alt LIKE '%>' THEN 'sv'
       WHEN length(ref) = 1 AND length(alt) = 1 THEN 'snp'
       WHEN length(ref) <> length(alt) THEN 'indel'
       ELSE 'mnp' END AS variant_type
FROM dec
WHERE alt <> '' AND alt <> '.'
