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
  SELECT *, CAST(('0x' || substr(md5(regexp_replace(chrom, '^chr', '') || ':' ||
      pos || ':' || upper(ref) || ':' || upper(alt)), 1, 15)) AS BIGINT) AS variant_id
  FROM v0 WHERE alt <> '' AND alt <> '.'
)
, panel AS (
  SELECT trim(f[1]) AS rsid, regexp_replace(trim(f[2]), '^chr', '') AS p_chrom,
    CAST(trim(f[3]) AS BIGINT) AS position,
    upper(trim(f[4])) AS a1, upper(trim(f[5])) AS a2
  FROM (
    SELECT string_split(column0, chr(9)) AS f
    FROM read_csv('/root/reference/tests/fixtures/hapmap3_test.tsv',
      sep=chr(1), quote='', header=false, columns={'column0':'VARCHAR'})
  ) WHERE f[1] <> 'rsid'
),
m AS (
  SELECT v.variant_id, p.rsid,
    ((upper(v.ref) = p.a1 AND upper(v.alt) = p.a2) OR
     (upper(v.ref) = p.a2 AND upper(v.alt) = p.a1)) AS exact_m
  FROM v JOIN panel p
    ON regexp_replace(v.chrom, '^chr', '') = p.p_chrom AND v.pos = p.position
   AND (((upper(v.ref) = p.a1 AND upper(v.alt) = p.a2) OR
         (upper(v.ref) = p.a2 AND upper(v.alt) = p.a1))
     -- complement arm: whole-allele complement (hapmap3.py dict form —
     -- indels pass through unchanged), gated on the frozenset
     -- single-base strand-ambiguity test
     OR (NOT ((upper(v.ref) = 'A' AND upper(v.alt) = 'T')
           OR (upper(v.ref) = 'T' AND upper(v.alt) = 'A')
           OR (upper(v.ref) = 'C' AND upper(v.alt) = 'G')
           OR (upper(v.ref) = 'G' AND upper(v.alt) = 'C'))
         AND ((CASE WHEN upper(v.ref) IN ('A','C','G','T')
                    THEN translate(upper(v.ref), 'ACGT', 'TGCA')
                    ELSE upper(v.ref) END = p.a1
               AND CASE WHEN upper(v.alt) IN ('A','C','G','T')
                        THEN translate(upper(v.alt), 'ACGT', 'TGCA')
                        ELSE upper(v.alt) END = p.a2)
           OR (CASE WHEN upper(v.ref) IN ('A','C','G','T')
                    THEN translate(upper(v.ref), 'ACGT', 'TGCA')
                    ELSE upper(v.ref) END = p.a2
               AND CASE WHEN upper(v.alt) IN ('A','C','G','T')
                        THEN translate(upper(v.alt), 'ACGT', 'TGCA')
                        ELSE upper(v.alt) END = p.a1))))
),
best AS (
  SELECT variant_id, rsid AS hapmap3_rsid FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY variant_id
      ORDER BY (CASE WHEN exact_m THEN 0 ELSE 1 END), rsid) AS rn
    FROM m) WHERE rn = 1
)
SELECT v.chrom, v.pos, v.ref, v.alt, v.rs_id, v.variant_id,
  b.hapmap3_rsid IS NOT NULL AS in_hapmap3, b.hapmap3_rsid
FROM v LEFT JOIN best b USING (variant_id)
