-- K1b oracle: the rsID covering projection (reference: the partial HASH
-- index on rs_id, schema.py:271-275, plus the heap fetch) keeps every
-- column of the rs_id-bearing rows so one probe serves the full row.
-- SELF-CONTAINED: the expectation derives from the INPUT rows the Spark
-- side wrote to a separate parquet — the writer's selection (rs_id IS
-- NOT NULL) and the probe are both reproduced here, so a writer that
-- drops eligible rows fails this key (the Spark side reads back the
-- writer's own output).
SELECT chrom, pos, ref, alt, rs_id, qual, variant_type
FROM read_parquet('/tmp/graft_rsid_index_input/*.parquet')
WHERE rs_id IS NOT NULL AND rs_id = 'rs1'
ORDER BY chrom, pos
