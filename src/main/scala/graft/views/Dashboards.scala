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

  /** A12 — genotype table stats (`genotypes/schema.py:98-109`):
    * total / ADJ-passing / with-dosage / distinct samples / distinct
    * variants (the decomposed site key stands in for the reference's
    * surrogate variant_id), plus our n_called. */
  def genotypeStats(genotypes: DataFrame): DataFrame = {
    import genotypes.sparkSession.implicits._
    genotypes.agg(
      count(lit(1)).as("n_genotypes"),
      countDistinct($"sample_id").as("n_samples"),
      countDistinct($"chrom", $"pos", $"ref", $"alt").as("n_variants"),
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
    def range01(c: String) =
      col(c).isNotNull && !isnan(col(c)) && (col(c) < 0 || col(c) > 1)
    def nonneg(c: String) = col(c).isNotNull && col(c) < 0
    // the reference's full CHECK list (`schema.py:158-169`); a column a
    // store predates is simply not checked
    val checks = Seq(
      "call_rate_range" -> range01("call_rate"),
      "n_het_nonneg" -> nonneg("n_het"),
      "n_hom_ref_nonneg" -> nonneg("n_hom_ref"),
      "n_hom_alt_nonneg" -> nonneg("n_hom_alt"),
      "aaf_range" -> range01("aaf"),
      "maf_range" ->
        ($"maf".isNotNull && !isnan($"maf") && ($"maf" < 0 || $"maf" > 0.5)),
      "mac_nonneg" -> nonneg("mac"),
      "hwe_p_range" -> range01("hwe_p"),
      "info_score_range" -> range01("info_score"),
      "imputation_r2_range" -> range01("imputation_r2"),
      "pos_positive" -> ($"pos" <= 0))
    val cols = variants.columns.toSet
    def colsOf(name: String): Seq[String] = name match {
      case "pos_positive" => Seq("pos")
      case n => Seq(n.stripSuffix("_range").stripSuffix("_nonneg"))
    }
    checks.collect {
      case (n, c) if colsOf(n).forall(cols.contains) => violation(n, c)
    }.reduce(_.unionByName(_))
  }

  def dosageViolations(genotypes: DataFrame): DataFrame = {
    import genotypes.sparkSession.implicits._
    genotypes.filter($"dosage".isNotNull && ($"dosage" < 0 || $"dosage" > 2))
      .select(lit("dosage_range").as("constraint"), $"chrom", $"pos", $"sample_id")
  }
}
