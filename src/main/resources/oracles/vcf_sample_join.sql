-- J13 oracle: genotype rows joined to the sample attribute dimension on
-- the sample natural key, cohort-grouped.
WITH g(chrom, pos, sample_id, dosage) AS (
  VALUES ('chr1', 100, 'S1', 2.0), ('chr1', 100, 'S2', 1.0),
         ('chr1', 200, 'S1', 0.0), ('chr1', 200, 'S3', 1.0)
),
dim(sample_id, ancestry, phenotype) AS (
  VALUES ('S1', 'EUR', 'case'), ('S2', 'AFR', 'control'),
         ('S3', 'EUR', 'control')
)
SELECT d.ancestry, d.phenotype, count(*) AS n_gt,
       CAST(sum(g.dosage) AS DOUBLE) AS dose_sum
FROM g LEFT JOIN dim d USING (sample_id)
GROUP BY d.ancestry, d.phenotype
ORDER BY d.ancestry, d.phenotype
