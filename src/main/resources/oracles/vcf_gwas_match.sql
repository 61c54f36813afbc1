WITH raw AS (
  SELECT string_split(column0, chr(9)) AS f
  FROM read_csv('/tmp/graft_gwas_variants.vcf',
    sep=chr(1), quote='', header=false, columns={'column0':'VARCHAR'})
  WHERE column0 NOT LIKE '#%'
),
v AS (
  SELECT regexp_replace(f[1], '^chr', '') AS m_chrom,
    CAST(f[2] AS BIGINT) AS m_pos, upper(f[4]) AS m_ref,
    upper(string_split(f[5], ',')[1]) AS m_alt,
    CASE WHEN f[3] IN ('.', '') THEN NULL ELSE f[3] END AS m_rsid,
    TRY_CAST(NULLIF(regexp_extract(f[8], '(^|;)AF=([^;]*)', 2), '') AS DOUBLE) AS v_af,
    CAST(('0x' || substr(md5(regexp_replace(f[1], '^chr', '') || ':' || f[2] || ':' ||
      upper(f[4]) || ':' || upper(string_split(f[5], ',')[1])), 1, 15)) AS BIGINT) AS m_vid
  FROM raw
),
stats AS (
  -- get_value semantics: strip, empty string = missing; rows lacking a
  -- required value are dropped (engine-side row filter twin)
  SELECT * FROM (
    SELECT NULLIF(trim(f[1]), '') AS chromosome,
      TRY_CAST(NULLIF(trim(f[2]), '') AS BIGINT) AS base_pair_location,
      upper(NULLIF(trim(f[3]), '')) AS effect_allele,
      upper(NULLIF(trim(f[4]), '')) AS other_allele,
      TRY_CAST(NULLIF(trim(f[5]), '') AS DOUBLE) AS p_value,
      TRY_CAST(NULLIF(trim(f[8]), '') AS DOUBLE) AS effect_allele_frequency,
      CASE WHEN len(f) >= 9 AND trim(f[9]) <> '' THEN trim(f[9]) END AS rsid,
      ROW_NUMBER() OVER (ORDER BY f[2], f[3], f[4], f[8]) AS sid
    FROM (
      SELECT string_split(column0, chr(9)) AS f
      FROM read_csv('/tmp/graft_gwas_stats.tsv',
        sep=chr(1), quote='', header=false, columns={'column0':'VARCHAR'})
    ) WHERE f[1] <> 'chromosome'
  ) WHERE chromosome IS NOT NULL AND base_pair_location IS NOT NULL
    AND effect_allele IS NOT NULL AND p_value IS NOT NULL
),
cand AS (
  SELECT sid, chromosome, base_pair_location, other_allele AS j_ref,
    effect_allele AS j_alt, 1 AS prio FROM stats
  WHERE other_allele IS NOT NULL AND other_allele <> ''
  UNION ALL
  SELECT sid, chromosome, base_pair_location, effect_allele, other_allele, 2
  FROM stats WHERE other_allele IS NOT NULL AND other_allele <> ''
),
posm AS (
  SELECT sid, pos_vid, pos_prio FROM (
    SELECT c.sid, v.m_vid AS pos_vid, c.prio AS pos_prio,
      ROW_NUMBER() OVER (PARTITION BY c.sid ORDER BY c.prio) AS rn
    FROM cand c JOIN v
      ON regexp_replace(c.chromosome, '^chr', '') = v.m_chrom
     AND c.base_pair_location = v.m_pos
     AND c.j_ref = v.m_ref AND c.j_alt = v.m_alt
  ) WHERE rn = 1
),
rsm AS (
  SELECT m_rsid, MIN(m_vid) AS rs_vid FROM v
  WHERE m_rsid IS NOT NULL GROUP BY m_rsid
),
matched AS (
  SELECT s.*, COALESCE(m.pos_vid, r.rs_vid) AS variant_id,
    CASE WHEN m.pos_prio = 1 THEN 'direct'
         WHEN m.pos_prio = 2 THEN 'swapped'
         WHEN r.rs_vid IS NOT NULL THEN 'rsid' END AS match_type
  FROM stats s
  LEFT JOIN posm m USING (sid)
  LEFT JOIN rsm r ON s.rsid = r.m_rsid
),
joined AS (
  SELECT mt.*, v.m_ref AS v_ref, v.m_alt AS v_alt, v.v_af
  FROM matched mt LEFT JOIN (SELECT DISTINCT m_vid, m_ref, m_alt, v_af FROM v) v
    ON mt.variant_id = v.m_vid
),
harm AS (
  SELECT *,
    -- whole-allele complement (gwas/loader.py complement_allele dict):
    -- only single-base A/C/G/T complement; indels pass through unchanged
    CASE WHEN effect_allele IN ('A','C','G','T')
         THEN translate(effect_allele, 'ACGT', 'TGCA')
         ELSE effect_allele END AS ec,
    CASE WHEN other_allele IN ('A','C','G','T')
         THEN translate(other_allele, 'ACGT', 'TGCA')
         ELSE other_allele END AS oc,
    (effect_allele = v_ref AND other_allele = v_alt)
      OR (effect_allele = v_alt AND other_allele = v_ref) AS direct_set,
    abs(effect_allele_frequency - v_af) AS fd_direct,
    abs(1.0 - effect_allele_frequency - v_af) AS fd_flipped
  FROM joined
),
harm2 AS (
  SELECT *,
    (ec = v_ref AND oc = v_alt) OR (ec = v_alt AND oc = v_ref) AS comp_set,
    -- strand-ambiguous = the {A,T} / {C,G} single-base sets only
    -- (loader.py is_strand_ambiguous frozenset)
    (((effect_allele = 'A' AND other_allele = 'T')
       OR (effect_allele = 'T' AND other_allele = 'A')
       OR (effect_allele = 'C' AND other_allele = 'G')
       OR (effect_allele = 'G' AND other_allele = 'C'))
      AND effect_allele_frequency IS NOT NULL
      AND v_af IS NOT NULL) AS freq_usable
  FROM harm
)
SELECT rsid, chromosome, base_pair_location, effect_allele, other_allele,
  effect_allele_frequency, variant_id, match_type,
  CASE WHEN COALESCE(direct_set, FALSE) THEN TRUE
       WHEN COALESCE(comp_set, FALSE) THEN TRUE
       WHEN freq_usable AND fd_direct < 0.1 THEN TRUE
       WHEN freq_usable AND fd_direct >= 0.1 AND fd_flipped < 0.1 THEN TRUE
       ELSE FALSE END AS is_match,
  CASE WHEN COALESCE(direct_set, FALSE) THEN FALSE
       WHEN COALESCE(comp_set, FALSE) THEN TRUE
       WHEN freq_usable AND (fd_direct < 0.1 OR fd_flipped < 0.1) THEN FALSE
       END AS is_flipped,
  CASE WHEN COALESCE(direct_set, FALSE) THEN effect_allele = v_alt
       WHEN COALESCE(comp_set, FALSE) THEN ec = v_alt
       WHEN freq_usable AND fd_direct < 0.1 THEN TRUE
       WHEN freq_usable AND fd_direct >= 0.1 AND fd_flipped < 0.1 THEN FALSE
       END AS is_effect_allele_alt
FROM harm2
