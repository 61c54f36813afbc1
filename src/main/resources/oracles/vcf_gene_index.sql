-- K1d oracle: the gene covering projection (reference: the covering
-- index `(gene) INCLUDE (pos, ref, alt, impact)`, schema.py:264-269)
-- keeps only annotated rows and serves a gene probe from the projection
-- alone — re-read the written parquet and apply the same probe.
SELECT gene, chrom, pos, ref, alt, impact, consequence, variant_id
FROM read_parquet('/tmp/graft_gene_index/*.parquet')
WHERE gene = 'BRCA2'
ORDER BY chrom, pos
