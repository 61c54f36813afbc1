WITH raw AS (
  SELECT string_split(column0, chr(9)) AS f
  FROM read_csv('/root/reference/tests/fixtures/hapmap3_overlap.vcf',
    sep=chr(1), quote='', header=false, columns={'column0':'VARCHAR'})
  WHERE column0 NOT LIKE '#%'
),
v0 AS (
  SELECT 'chr' || regexp_replace(f[1], '^chr', '') AS chrom,
         CAST(f[2] AS BIGINT) AS pos, f[4] AS ref,
         unnest(string_split(f[5], ',')) AS alt,
         CASE WHEN f[3] IN ('.', '') THEN NULL ELSE f[3] END AS rs_id
  FROM raw
),
v AS (
  SELECT regexp_replace(chrom, '^chr', '') AS m_chrom, pos AS m_pos,
    upper(ref) AS m_ref, upper(alt) AS m_alt, rs_id AS m_rsid,
    CAST(('0x' || substr(md5(regexp_replace(chrom, '^chr', '') || ':' ||
      pos || ':' || upper(ref) || ':' || upper(alt)), 1, 15)) AS BIGINT) AS m_vid
  FROM v0 WHERE alt <> '' AND alt <> '.'
),
pgs AS (
  SELECT trim(f[1]) AS rsid, trim(f[2]) AS chr_name,
    CAST(trim(f[3]) AS BIGINT) AS chr_position,
    upper(trim(f[4])) AS effect_allele, upper(trim(f[5])) AS other_allele,
    CAST(trim(f[6]) AS DOUBLE) AS effect_weight
  FROM (
    SELECT string_split(column0, chr(9)) AS f
    FROM read_csv('/root/reference/tests/fixtures/pgs_test_beta.txt',
      sep=chr(1), quote='', header=false, columns={'column0':'VARCHAR'})
    WHERE column0 NOT LIKE '#%'
  ) WHERE f[1] <> 'rsID'
),
cand AS (
  SELECT rsid, chr_name, chr_position, other_allele AS j_ref,
    effect_allele AS j_alt, 1 AS prio FROM pgs
  WHERE other_allele IS NOT NULL AND other_allele <> ''
  UNION ALL
  SELECT rsid, chr_name, chr_position, effect_allele AS j_ref,
    other_allele AS j_alt, 2 AS prio FROM pgs
  WHERE other_allele IS NOT NULL AND other_allele <> ''
),
posm AS (
  SELECT rsid, m_vid AS pos_vid, prio AS pos_prio FROM (
    SELECT c.rsid, v.m_vid, c.prio,
      ROW_NUMBER() OVER (PARTITION BY c.rsid ORDER BY c.prio) AS rn
    FROM cand c JOIN v
      ON regexp_replace(c.chr_name, '^chr', '') = v.m_chrom
     AND c.chr_position = v.m_pos AND c.j_ref = v.m_ref AND c.j_alt = v.m_alt
  ) WHERE rn = 1
),
rsm AS (
  SELECT m_rsid, MIN(m_vid) AS rs_vid FROM v
  WHERE m_rsid IS NOT NULL GROUP BY m_rsid
)
SELECT 'PGS000001' AS pgs_id,
  CAST(COUNT(p.effect_weight) AS BIGINT) AS n_weights,
  CAST(COUNT(COALESCE(m.pos_vid, r.rs_vid)) AS BIGINT) AS n_matched
FROM pgs p
LEFT JOIN posm m USING (rsid)
LEFT JOIN rsm r ON p.rsid = r.m_rsid
