-- K1 oracle: the chrom-partitioned store must read back bit-for-bit,
-- with the partition column restored from the hive directory layout.
SELECT chrom, pos, ref, alt, qual
FROM read_parquet('/tmp/graft_store_roundtrip/*/*.parquet',
                  hive_partitioning = true)
ORDER BY chrom, pos
