-- Per-study import-replace oracle: the CLI imported A, then B, then A
-- again with CHANGED betas; the live gwas_stats table must hold exactly
-- A-new and B. Every TSV row matches a store variant by construction,
-- so the expected table derives from the final TSVs alone.
WITH a AS (
  SELECT 'GCST_A' AS study_accession, BETA
  FROM read_csv('/tmp/graft_import_replace_a2.tsv',
    delim=chr(9), header=true)
), b AS (
  SELECT 'GCST_B' AS study_accession, BETA
  FROM read_csv('/tmp/graft_import_replace_b.tsv',
    delim=chr(9), header=true)
), u AS (
  SELECT * FROM a UNION ALL SELECT * FROM b
)
SELECT study_accession,
       count(*) AS n_rows,
       sum(BETA) AS sum_beta
FROM u
GROUP BY study_accession
ORDER BY study_accession;
