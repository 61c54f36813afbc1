-- K4 + §2.13 oracle: delete-then-insert reload semantics over the
-- deterministic /tmp fixtures the Spark query writes. The previous batch
-- is the LATEST COMPLETED ledger row for the reloaded file's hash —
-- failed and in_progress rows never satisfy the check; its rows are
-- deleted and the incoming batch is inserted.
WITH prev AS (
  SELECT load_batch_id
  FROM read_parquet('/tmp/graft_reload_ledger.parquet/*.parquet')
  WHERE status = 'completed' AND file_hash = 'hashA'
  ORDER BY completed_at DESC
  LIMIT 1
),
kept AS (
  SELECT chrom, pos, ref, alt, load_batch_id
  FROM read_parquet('/tmp/graft_reload_variants.parquet/*.parquet')
  WHERE load_batch_id NOT IN (SELECT load_batch_id FROM prev)
),
incoming(chrom, pos, ref, alt, load_batch_id) AS (
  VALUES ('chr1', 100, 'A', 'G', 'b5'),
         ('chr1', 250, 'C', 'G', 'b5')
),
merged AS (
  SELECT * FROM kept
  UNION ALL
  SELECT * FROM incoming
)
SELECT load_batch_id, count(*) AS n_variants
FROM merged
GROUP BY load_batch_id
ORDER BY load_batch_id;
