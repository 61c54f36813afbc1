package graft.views

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Dashboard/listing aggregations (SURVEY J12 + A12) and CHECK-constraint
  * validators (F7). All single-pass groupBy/agg jobs.
  */
object Dashboards {

  /** J12 — PGS score listing: scores LEFT JOIN weights with per-score
    * counts (`prs/schema.py:162-177`). */
  def pgsScoreListing(pgsScores: DataFrame, weights: DataFrame): DataFrame = {
    import pgsScores.sparkSession.implicits._
    pgsScores.join(weights, Seq("pgs_id"), "left")
      .groupBy($"pgs_id")
      .agg(count($"effect_weight").as("n_weights"),
        count($"variant_id").as("n_matched"))
      .orderBy($"pgs_id")
  }

  /** A12 — genotype table stats (`genotypes/schema.py:98-109`). */
  def genotypeStats(genotypes: DataFrame): DataFrame = {
    import genotypes.sparkSession.implicits._
    genotypes.agg(
      count(lit(1)).as("n_genotypes"),
      countDistinct($"sample_id").as("n_samples"),
      sum(when($"dosage".isNotNull, 1).otherwise(0)).as("n_with_dosage"),
      sum(when($"gt" =!= "./.", 1).otherwise(0)).as("n_called"),
      sum(when($"passes_adj", 1).otherwise(0)).as("n_adj_pass"))
  }

  /** A12 — per-chromosome variants-table stats (`partitions.py:12-32`). */
  def partitionStats(variants: DataFrame): DataFrame = {
    import variants.sparkSession.implicits._
    variants.groupBy($"chrom")
      .agg(count(lit(1)).as("n_rows"),
        min($"pos").as("min_pos"), max($"pos").as("max_pos"))
      .orderBy($"chrom")
  }

  /** F7 — CHECK-constraint validators (`schema.py:158-169`,
    * `genotypes/schema.py:37`): rows violating the reference's declared
    * invariants. Empty result = table valid. */
  def constraintViolations(variants: DataFrame): DataFrame = {
    import variants.sparkSession.implicits._
    def violation(name: String, cond: org.apache.spark.sql.Column): DataFrame =
      variants.filter(cond)
        .select(lit(name).as("constraint"), $"chrom", $"pos", $"ref", $"alt")
    val checks = Seq(
      "call_rate_range" ->
        ($"call_rate".isNotNull && ($"call_rate" < 0 || $"call_rate" > 1)),
      "maf_range" ->
        ($"maf".isNotNull && !isnan($"maf") && ($"maf" < 0 || $"maf" > 0.5)),
      "hwe_p_range" ->
        ($"hwe_p".isNotNull && !isnan($"hwe_p") && ($"hwe_p" < 0 || $"hwe_p" > 1)),
      "pos_positive" -> ($"pos" <= 0))
    checks.map { case (n, c) => violation(n, c) }.reduce(_.unionByName(_))
  }

  def dosageViolations(genotypes: DataFrame): DataFrame = {
    import genotypes.sparkSession.implicits._
    genotypes.filter($"dosage".isNotNull && ($"dosage" < 0 || $"dosage" > 2))
      .select(lit("dosage_range").as("constraint"), $"chrom", $"pos", $"sample_id")
  }
}
