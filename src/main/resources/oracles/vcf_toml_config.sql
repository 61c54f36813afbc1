WITH lines AS (
  SELECT ROW_NUMBER() OVER () AS ln,
    trim(CASE WHEN strpos(column0, '#') > 0
         THEN substr(column0, 1, strpos(column0, '#') - 1)
         ELSE column0 END) AS line
  FROM read_csv('/tmp/graft_config.toml',
    sep=chr(1), quote='', header=false, columns={'column0':'VARCHAR'})
),
sections AS (
  SELECT ln, trim(substr(line, 2, length(line) - 2)) AS name
  FROM lines WHERE line LIKE '[%]'
),
kv AS (
  SELECT ln, trim(substr(line, 1, strpos(line, '=') - 1)) AS k,
    trim(substr(line, strpos(line, '=') + 1)) AS v
  FROM lines
  WHERE line <> '' AND line NOT LIKE '[%]' AND strpos(line, '=') > 1
),
scoped AS (
  SELECT kv.k, kv.v,
    (SELECT s.name FROM sections s WHERE s.ln < kv.ln
     ORDER BY s.ln DESC LIMIT 1) AS section
  FROM kv
)
SELECT CASE WHEN section IS NULL OR section = '' THEN k
       ELSE section || '.' || k END AS key,
  CASE WHEN (v LIKE '"%"' OR v LIKE '''%''') AND length(v) >= 2
       THEN substr(v, 2, length(v) - 2) ELSE v END AS value
FROM scoped
