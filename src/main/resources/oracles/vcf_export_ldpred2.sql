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
    string_split(f[9], ':') AS fkeys,
    [f[10], f[11], f[12], f[13]] AS svals,
    CAST(('0x' || substr(md5(regexp_replace(f[1], '^chr', '') || ':' || f[2] || ':' ||
      upper(f[4]) || ':' || upper(string_split(f[5], ',')[1])), 1, 15)) AS BIGINT) AS variant_id
  FROM raw
),
cls AS (
  SELECT chrom, pos, ref, alt, variant_id,
    TRY_CAST(NULLIF(string_split_regex(sval, '[/|]')[1], '.') AS INT) AS a1,
    TRY_CAST(NULLIF(string_split_regex(sval, '[/|]')[2], '.') AS INT) AS a2
  FROM (SELECT *, unnest(svals) AS sval FROM v)
),
counts AS (
  SELECT chrom, pos, ref, alt, variant_id,
    CAST(SUM(CASE WHEN a1 IS NOT NULL AND a2 IS NOT NULL AND a1 <> a2 THEN 1 ELSE 0 END) AS BIGINT) AS n_het,
    CAST(SUM(CASE WHEN a1 = 0 AND a2 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_hom_ref,
    CAST(SUM(CASE WHEN a1 IS NOT NULL AND a1 = a2 AND a1 > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_hom_alt
  FROM cls GROUP BY 1, 2, 3, 4, 5
),
qc AS (
  SELECT *, n_het + n_hom_ref + n_hom_alt AS n_called,
    LEAST(CAST(2 * n_hom_alt + n_het AS DOUBLE) / (2 * (n_het + n_hom_ref + n_hom_alt)),
      1.0 - CAST(2 * n_hom_alt + n_het AS DOUBLE) / (2 * (n_het + n_hom_ref + n_hom_alt))) AS maf
  FROM counts
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
  SELECT q.*, (p.rsid IS NOT NULL) AS in_hapmap3
  FROM qc q LEFT JOIN panel p
    ON regexp_replace(q.chrom, '^chr', '') = p.p_chrom AND q.pos = p.position
   AND ((upper(q.ref) = p.a1 AND upper(q.alt) = p.a2) OR
        (upper(q.ref) = p.a2 AND upper(q.alt) = p.a1))
),
gwas AS (
  SELECT trim(f[1]) AS chromosome, CAST(trim(f[2]) AS BIGINT) AS bp,
    upper(trim(f[3])) AS ea, upper(trim(f[4])) AS oa,
    TRY_CAST(trim(f[6]) AS DOUBLE) AS beta,
    TRY_CAST(trim(f[7]) AS DOUBLE) AS standard_error
  FROM (SELECT string_split(column0, chr(9)) AS f
        FROM read_csv('/tmp/graft_prscand_gwas.tsv',
          sep=chr(1), quote='', header=false, columns={'column0':'VARCHAR'}))
  WHERE f[1] <> 'chromosome'
),
stats AS (
  SELECT variant_id, ea AS effect_allele, oa AS other_allele,
    beta, standard_error FROM (
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
SELECT regexp_replace(fl.chrom, '^chr', '') AS chr, fl.pos,
  s.other_allele AS a0, s.effect_allele AS a1, s.beta,
  s.standard_error AS beta_se,
  printf('%.0f', 4.0 / (1.0 / 1000 + 1.0 / 2000)) AS n_eff
FROM stats s JOIN flagged fl USING (variant_id)
WHERE fl.in_hapmap3 AND fl.maf >= 0.01
  AND s.beta IS NOT NULL AND s.standard_error IS NOT NULL
  AND s.other_allele IS NOT NULL
