-- §2.13 oracle — append-only multi-file cohort through the CLI verb.
-- EXPECTED per-file counts are derived INDEPENDENTLY from the fixture
-- VCFs (decomposed ALT count per data row — the same expansion
-- vcf_scan_decompose verifies), NOT from the written store: a load that
-- replaced the store with the newest file (the round-7 defect,
-- Graft.scala base = v) drops file A's group on the Spark side and the
-- result sets diverge. ledger_rows is the same expectation — the ledger
-- must record each batch's own contribution (reference variants_loaded,
-- loader.py:547-560), never the whole-store count.
WITH exp AS (
  SELECT 'multiallelic.vcf' AS file_name,
         sum(len(string_split(f[5], ','))) AS n
  FROM (SELECT string_split(column0, chr(9)) AS f
        FROM read_csv('/root/reference/tests/fixtures/multiallelic.vcf',
          sep=chr(1), quote='', header=false, columns={'column0':'VARCHAR'})
        WHERE column0 NOT LIKE '#%')
  UNION ALL
  SELECT 'with_annotations.vcf' AS file_name,
         sum(len(string_split(f[5], ','))) AS n
  FROM (SELECT string_split(column0, chr(9)) AS f
        FROM read_csv('/root/reference/tests/fixtures/with_annotations.vcf',
          sep=chr(1), quote='', header=false, columns={'column0':'VARCHAR'})
        WHERE column0 NOT LIKE '#%')
)
SELECT file_name,
       CAST(n AS BIGINT) AS store_rows,
       CAST(n AS BIGINT) AS ledger_rows
FROM exp
ORDER BY file_name
