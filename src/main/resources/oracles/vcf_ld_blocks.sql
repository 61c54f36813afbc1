WITH raw AS (
  SELECT string_split(column0, chr(9)) AS f
  FROM read_csv('/root/reference/tests/fixtures/hapmap3_overlap.vcf',
    sep=chr(1), quote='', header=false, columns={'column0':'VARCHAR'})
  WHERE column0 NOT LIKE '#%'
),
v AS (
  SELECT 'chr' || regexp_replace(f[1], '^chr', '') AS chrom,
         CAST(f[2] AS BIGINT) AS pos,
         unnest(string_split(f[5], ',')) AS alt, f[4] AS ref
  FROM raw
),
bed AS (
  SELECT regexp_replace(trim(f[1]), '^chr', '') AS chrom,
    CAST(trim(f[2]) AS BIGINT) AS start_pos,
    CAST(trim(f[3]) AS BIGINT) AS end_pos
  FROM (
    SELECT string_split(column0, chr(9)) AS f
    FROM read_csv('/root/reference/tests/fixtures/ld_blocks_eur_grch37.bed',
      sep=chr(1), quote='', header=false, columns={'column0':'VARCHAR'})
  ) WHERE f[1] <> 'chrom'
),
blocks AS (
  SELECT *, 'EUR' AS population,
    CAST(('0x' || substr(md5(chrom || ':' || start_pos || ':' || end_pos ||
      ':EUR:GRCh37:Berisa_Pickrell_2016'), 1, 15)) AS BIGINT) AS block_id
  FROM bed
),
assigned AS (
  -- one block per variant (deterministic smallest (start, id)): the
  -- inclusive containment matches BOTH blocks at a shared boundary of
  -- contiguous BED blocks, and the engine dedupes the same way
  SELECT b.block_id, v.pos
  FROM v JOIN blocks b
    ON regexp_replace(v.chrom, '^chr', '') = b.chrom
   AND v.pos >= b.start_pos AND v.pos <= b.end_pos
  WHERE v.alt <> '' AND v.alt <> '.'
  QUALIFY row_number() OVER (PARTITION BY v.chrom, v.pos, v.ref, v.alt
                             ORDER BY b.start_pos, b.block_id) = 1
)
SELECT b.block_id, b.chrom, b.start_pos, b.end_pos, b.population,
  CAST(COUNT(a.pos) AS BIGINT) AS n_variants
FROM blocks b LEFT JOIN assigned a ON b.block_id = a.block_id
GROUP BY 1, 2, 3, 4, 5
