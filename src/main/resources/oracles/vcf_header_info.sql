WITH hdr AS (
  SELECT column0 AS line,
    ROW_NUMBER() OVER () AS ln
  FROM read_csv('/root/reference/tests/fixtures/snpeff/cancer.ann.vcf',
    sep=chr(1), quote='', header=false, columns={'column0':'VARCHAR'})
  WHERE column0 LIKE '#%'
),
info_f AS (
  SELECT 'INFO' AS kind,
    regexp_extract(line, 'ID=([^,>]+)', 1) AS id,
    COALESCE(NULLIF(regexp_extract(line, 'Number=([^,>]+)', 1), ''), '.') AS number,
    COALESCE(NULLIF(regexp_extract(line, 'Type=([^,>]+)', 1), ''), 'String') AS vtype
  FROM hdr WHERE line LIKE '##INFO=<%'
),
format_f AS (
  SELECT 'FORMAT' AS kind,
    regexp_extract(line, 'ID=([^,>]+)', 1) AS id,
    COALESCE(NULLIF(regexp_extract(line, 'Number=([^,>]+)', 1), ''), '.') AS number,
    COALESCE(NULLIF(regexp_extract(line, 'Type=([^,>]+)', 1), ''), 'String') AS vtype
  FROM hdr WHERE line LIKE '##FORMAT=<%'
),
ann_desc AS (
  SELECT string_split(regexp_extract(line, 'Description="([^"]*)"', 1), chr(39))[2] AS fmt
  FROM hdr WHERE line LIKE '##INFO=<ID=ANN,%'
),
ann_f AS (
  SELECT 'ANN_FIELD' AS kind, trim(f) AS id, CAST(i AS VARCHAR) AS number,
    CAST(NULL AS VARCHAR) AS vtype
  FROM (SELECT unnest(string_split(fmt, '|')) AS f,
               unnest(generate_series(1, len(string_split(fmt, '|')))) AS i
        FROM ann_desc)
),
samples AS (
  SELECT 'SAMPLE' AS kind, f[i + 9] AS id, CAST(i AS VARCHAR) AS number,
    CAST(NULL AS VARCHAR) AS vtype
  FROM (SELECT string_split(line, chr(9)) AS f FROM hdr WHERE line LIKE '#CHROM%'),
       (SELECT unnest(generate_series(1, 100)) AS i)
  WHERE i + 9 <= len(f)
),
whole AS (SELECT string_agg(line, chr(10)) AS h FROM hdr),
imp AS (
  SELECT 'IMPUTATION_SOURCE' AS kind,
    CASE WHEN contains(lower(h), 'minimac') OR contains(lower(h), 'michigan imputation server') THEN 'minimac4'
         WHEN contains(lower(h), 'beagle') THEN 'beagle'
         WHEN contains(lower(h), 'impute2') THEN 'impute2'
         WHEN contains(h, '##INFO=<ID=R2,') THEN 'minimac4'
         WHEN contains(h, '##INFO=<ID=DR2,') THEN 'beagle'
         WHEN regexp_matches(h, '##INFO=<ID=INFO,[^\n]*Type=Float') THEN 'impute2'
         ELSE 'unknown' END AS id,
    CAST(NULL AS VARCHAR) AS number, CAST(NULL AS VARCHAR) AS vtype
  FROM whole
)
SELECT * FROM info_f UNION ALL SELECT * FROM format_f
UNION ALL SELECT * FROM ann_f UNION ALL SELECT * FROM samples
UNION ALL SELECT * FROM imp
