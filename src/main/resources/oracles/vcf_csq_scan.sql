WITH lines AS (
  SELECT column0 AS line
  FROM read_csv('/root/reference/tests/fixtures/annotated_ranked.vcf.gz',
    sep=chr(1), quote='', header=false, columns={'column0':'VARCHAR'})
),
fmt AS (
  SELECT string_split(trim(regexp_extract(line, 'Format: ([^"]*)', 1)), '|') AS fields
  FROM lines WHERE line LIKE '##INFO=<ID=CSQ%' LIMIT 1
),
raw AS (
  SELECT string_split(line, chr(9)) AS f FROM lines WHERE line NOT LIKE '#%'
),
dec AS (
  SELECT 'chr' || regexp_replace(f[1], '^chr', '') AS chrom,
    CAST(f[2] AS BIGINT) AS pos, f[4] AS ref,
    unnest(string_split(f[5], ',')) AS alt,
    CASE WHEN f[3] IN ('.', '') THEN NULL ELSE f[3] END AS rs_id,
    NULLIF(regexp_extract(f[8], '(^|;)CSQ=([^;]*)', 2), '') AS csq
  FROM raw
),
base AS (SELECT * FROM dec WHERE alt <> '' AND alt <> '.'),
entries AS (
  SELECT chrom, pos, ref, alt,
    unnest(string_split(csq, ',')) AS entry,
    unnest(generate_series(1, len(string_split(csq, ',')))) AS eidx
  FROM base WHERE csq IS NOT NULL
),
valid AS (
  SELECT e.*, string_split(e.entry, '|') AS ef FROM entries e, fmt
  WHERE len(string_split(e.entry, '|')) = len(fmt.fields)
    AND string_split(e.entry, '|')[1] = e.alt
),
best AS (
  SELECT chrom, pos, ref, alt, ef FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY chrom, pos, ref, alt
      ORDER BY (CASE ef[3] WHEN 'HIGH' THEN 0 WHEN 'MODERATE' THEN 1
                           WHEN 'LOW' THEN 2 ELSE 3 END), eidx) AS rn
    FROM valid) WHERE rn = 1
)
SELECT b.chrom, b.pos, b.ref, b.alt, b.rs_id,
  e.ef[4] AS gene, e.ef[3] AS impact, e.ef[2] AS consequence,
  e.ef[11] AS hgvs_c, e.ef[12] AS hgvs_p
FROM base b LEFT JOIN best e USING (chrom, pos, ref, alt)
