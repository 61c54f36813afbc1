package graft.prs

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** A9/J6 — polygenic score computation
  * (`docs/prs-workflows.md:173-182,325-337`): genotypes JOIN weights on
  * variant_id, per-sample Σ(effect_weight × dosage).
  *
  * Scale shape: the weights table (≤ a few M rows) broadcasts; genotypes
  * (samples × variants — the biggest table in the system) streams through
  * the broadcast hash join with no shuffle, and the per-sample sum is a
  * partial-aggregated groupBy on sample_id.
  */
object PrsScoring {

  /** Dosage with GT fallback: missing DS/GP falls back to the 0/1/2 CASE
    * on the called genotype (`prs-workflows.md:325-337`). */
  def dosageWithGtFallback(df: DataFrame): DataFrame = {
    import df.sparkSession.implicits._
    df.withColumn("dosage_eff",
      coalesce($"dosage",
        when($"a1".isNull || $"a2".isNull, lit(null))
          .otherwise(($"a1" > 0).cast("int") + ($"a2" > 0).cast("int")).cast("double")))
  }

  /** Per-sample PRS for one score: weights must carry (variant_id,
    * effect_weight) [+ pgs_id]. */
  def score(genotypes: DataFrame, weights: DataFrame): DataFrame = {
    import genotypes.sparkSession.implicits._
    val g = dosageWithGtFallback(genotypes)
      .filter($"dosage_eff".isNotNull)
      .select($"variant_id", $"sample_id", $"dosage_eff")
    g.join(broadcast(weights.select($"variant_id", $"effect_weight")), Seq("variant_id"))
      .groupBy($"sample_id")
      .agg(
        sum($"effect_weight" * $"dosage_eff").as("prs_score"),
        count(lit(1)).as("n_variants_used"))
      .orderBy($"sample_id")
  }
}
