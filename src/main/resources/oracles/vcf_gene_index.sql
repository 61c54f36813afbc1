-- K1d oracle: the gene covering projection (reference: the covering
-- index `(gene) INCLUDE (pos, ref, alt, impact)`, schema.py:264-269)
-- keeps only annotated rows and serves a gene probe from the projection
-- alone. SELF-CONTAINED: the expectation derives from the INPUT rows
-- the Spark side wrote to a separate parquet — the writer's selection
-- (gene IS NOT NULL, INCLUDE-column projection) and the probe are both
-- reproduced here, so a writer that drops eligible rows fails this key.
SELECT gene, chrom, pos, ref, alt, impact, consequence, variant_id
FROM read_parquet('/tmp/graft_gene_index_input/*.parquet')
WHERE gene IS NOT NULL AND gene = 'BRCA2'
ORDER BY chrom, pos
