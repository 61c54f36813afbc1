-- K1b oracle: the rsID covering projection (reference: the partial HASH
-- index on rs_id, schema.py:271-275, plus the heap fetch) keeps every
-- column of the rs_id-bearing rows so one probe serves the full row —
-- re-read the written parquet and apply the same probe.
SELECT chrom, pos, ref, alt, rs_id, qual, variant_type
FROM read_parquet('/tmp/graft_rsid_index/*.parquet')
WHERE rs_id = 'rs1'
ORDER BY chrom, pos
