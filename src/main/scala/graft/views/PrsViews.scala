package graft.views

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The four materialized views (SURVEY §2.12) as DataFrame pipelines.
  * "Materialization" on Spark = persisting the result as partitioned
  * parquet (see `refresh`); a refresh is an overwrite job into a staging
  * directory pattern when concurrent readers matter.
  */
object PrsViews {

  /** F4 — the PRS candidate predicate (`views/prs_views.py:68-72`), the
    * ONE definition: the filter and the summary that reports its count
    * must never drift apart on a threshold tweak. */
  val prsReadyPredicate: org.apache.spark.sql.Column =
    col("in_hapmap3") === true && col("info_score") >= 0.6 &&
      col("call_rate") >= 0.98 && col("hwe_p") > 1e-6 && col("maf") >= 0.01

  def prsReadyFilter(df: DataFrame): DataFrame =
    df.filter(prsReadyPredicate)

  /** `prs_candidate_variants` (`views/prs_views.py:26-83`): F4 filter,
    * three per-population LEFT JOINs against the long frequency table,
    * INNER JOIN to summary stats. The per-population joins share one
    * shuffle by pivoting the (already filtered) long table once instead
    * of joining it three times — semantically identical to the
    * reference's three aliased joins.
    */
  def prsCandidateVariants(variants: DataFrame, popFreqs: DataFrame,
                           gwasStats: DataFrame,
                           source: String = "gnomAD_v3"): DataFrame = {
    import variants.sparkSession.implicits._
    val pops = Seq("NFE", "AFR", "EAS")
    val freqsWide = popFreqs
      .filter($"source" === source && $"population".isin(pops: _*))
      .groupBy($"variant_id")
      .pivot("population", pops)
      .agg(first($"af"))
      .select($"variant_id",
        col("NFE").as("gnomad_nfe_af"),
        col("AFR").as("gnomad_afr_af"),
        col("EAS").as("gnomad_eas_af"))

    // the reference's column list includes ld_block_id and load_batch_id
    // (`prs_views.py:45-46`); its variants table always carries both,
    // ours grows ld_block_id at annotate-ld-blocks — null until then
    def opt(c: String, t: org.apache.spark.sql.types.DataType) =
      if (variants.columns.contains(c)) col(c) else lit(null).cast(t).as(c)
    prsReadyFilter(variants)
      .join(freqsWide, Seq("variant_id"), "left")
      .join(gwasStats.select($"variant_id", $"beta", $"standard_error", $"p_value"),
        Seq("variant_id"))
      .select($"variant_id", $"chrom", $"pos", $"ref", $"alt", $"rs_id",
        $"info_score", $"call_rate", $"hwe_p", $"maf", $"aaf", $"in_hapmap3",
        opt("ld_block_id", org.apache.spark.sql.types.LongType),
        opt("load_batch_id", org.apache.spark.sql.types.StringType),
        $"gnomad_nfe_af", $"gnomad_afr_af", $"gnomad_eas_af",
        $"beta", $"standard_error", $"p_value")
  }

  /** A6 — `variant_qc_summary` single-row rollup
    * (`views/prs_views.py:85-111`). */
  def variantQcSummary(variants: DataFrame): DataFrame = {
    import variants.sparkSession.implicits._
    val prsReady = prsReadyPredicate
    variants.agg(
      count(lit(1)).as("total_variants"),
      sum(when($"in_hapmap3" === true, 1).otherwise(0)).as("hapmap3_variants"),
      sum(when($"info_score" >= 0.6, 1).otherwise(0)).as("high_info_variants"),
      sum(when($"call_rate" >= 0.98, 1).otherwise(0)).as("high_callrate_variants"),
      sum(when($"hwe_p" > 1e-6, 1).otherwise(0)).as("hwe_pass_variants"),
      sum(when($"maf" >= 0.01, 1).otherwise(0)).as("common_variants"),
      sum(when(prsReady, 1).otherwise(0)).as("prs_ready_variants"))
  }

  /** A7 — `chromosome_variant_counts` (`views/prs_views.py:113-131`). */
  def chromosomeVariantCounts(variants: DataFrame): DataFrame = {
    import variants.sparkSession.implicits._
    variants.groupBy($"chrom")
      .agg(
        count(lit(1)).as("n_variants"),
        sum(when($"in_hapmap3" === true, 1).otherwise(0)).as("n_hapmap3"),
        sum(when($"in_hapmap3" === true && $"info_score" >= 0.6, 1).otherwise(0))
          .as("n_prs_ready"))
      .orderBy($"chrom")
  }

  /** Refresh orchestration (`views/prs_views.py:133-159`): recompute each
    * view and persist as parquet under `baseDir/<view>`, returning
    * per-view wall seconds. Views are summary-sized (the store itself is
    * what's chrom-partitioned), so they write unpartitioned. */
  def refresh(baseDir: String, views: Map[String, DataFrame]): Map[String, Double] =
    views.map { case (name, df) =>
      val t0 = System.nanoTime()
      df.write.mode("overwrite").parquet(s"$baseDir/$name")
      name -> (System.nanoTime() - t0) / 1e9
    }
}
