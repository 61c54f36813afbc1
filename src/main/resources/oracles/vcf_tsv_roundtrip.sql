-- K5 oracle: the TSV sink's output (complex columns JSON-stringified,
-- RFC-4180 quoting) must parse identically in an independent reader.
SELECT chrom, CAST(pos AS BIGINT) AS pos, info, "filter",
       CAST(score AS DOUBLE) AS score
FROM read_csv('/tmp/graft_tsv_roundtrip/*.csv', sep = chr(9), header = true,
              all_varchar = true)
ORDER BY chrom
