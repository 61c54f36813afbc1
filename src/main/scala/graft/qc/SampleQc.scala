package graft.qc

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.functions.GenomicsFunctions

/** Per-sample QC aggregation (SURVEY §2.6 A4): call rate, het/hom ratio,
  * Ti/Tv, X-het sex inference, inbreeding F, singleton count, qc_pass —
  * mirrors `qc/sample_qc.py` over our (genotypes long × per-variant QC)
  * model instead of the reference's per-sample variants table; the
  * metrics are definitionally identical.
  *
  * One groupBy(sample_id) pass: every metric is a conditional sum/avg, so
  * partial aggregation handles the fan-in; the per-variant inputs (maf,
  * mac, variant_type) are computed once by VariantQc and joined on the
  * site key before aggregating.
  */
object SampleQc {

  final case class Config(
      maleXHetThreshold: Double = 0.05,
      femaleXHetThreshold: Double = 0.15,
      minCallRate: Double = 0.99,
      maxContamination: Double = 0.025,
      xParStart: Long = 2781479L,
      xParEnd: Long = 155701383L)

  /** Compute per-sample metrics.
    *
    * @param genotypes VcfReader.genotypes output
    * @param variantQc VariantQc.fromGenotypes output (same VCF) — supplies
    *                  maf/mac per site for F and singleton computation
    */
  def compute(genotypes: DataFrame, variantQc: DataFrame,
              config: Config = Config()): DataFrame = {
    import genotypes.sparkSession.implicits._

    val cls = VariantQc.genotypeClass($"gt", $"a1", $"a2")
    val joined = genotypes
      .withColumn("_cls", cls)
      .join(variantQc.select($"chrom", $"pos", $"ref", $"alt", $"maf", $"mac"),
        Seq("chrom", "pos", "ref", "alt"), "left")
      .withColumn("_is_snp", length($"ref") === 1 && length($"alt") === 1)
      .withColumn("_titv", GenomicsFunctions.tiTvClass($"ref", $"alt"))
      .withColumn("_called", $"_cls" =!= "missing")
      .withColumn("_carries_alt", $"_cls".isin("het", "hom_alt"))
      .withColumn("_on_x",
        GenomicsFunctions.bareChrom($"chrom") === "X" &&
          $"pos" > config.xParStart && $"pos" < config.xParEnd)

    val agg = joined.groupBy($"sample_id").agg(
      count(lit(1)).as("n_total"),
      sum(when($"_called", 1).otherwise(0)).as("n_called"),
      sum(when($"_called" && $"_is_snp", 1).otherwise(0)).as("n_snp"),
      sum(when($"_cls" === "het", 1).otherwise(0)).as("n_het"),
      sum(when($"_cls" === "hom_alt", 1).otherwise(0)).as("n_hom_var"),
      avg($"dp".cast(DoubleType)).as("mean_dp"),
      avg($"gq".cast(DoubleType)).as("mean_gq"),
      // Ti/Tv over carried SNPs (`_compute_ti_tv_for_sample`)
      sum(when($"_carries_alt" && $"_titv" === "transition", 1).otherwise(0)).as("_ti"),
      sum(when($"_carries_alt" && $"_titv" === "transversion", 1).otherwise(0)).as("_tv"),
      // X heterozygosity inside the non-PAR window (`:469-492`)
      sum(when($"_on_x", 1).otherwise(0)).as("_x_total"),
      sum(when($"_on_x" && $"_cls" === "het", 1).otherwise(0)).as("_x_het"),
      // expected het Σ 2·maf·(1−maf) over the sample's CALLED sites —
      // the reference sums over every row with a maf (`:494-505`,
      // missing calls included), which inflates F = 1 − obs/exp by
      // exactly the missingness rate (50% missing ⇒ F ≈ 0.5 for a
      // perfectly HWE-consistent sample). Deliberate deviation: F is
      // an observed-vs-expected ratio and both sides must condition on
      // the same rows.
      sum(when($"_called" && $"maf".isNotNull && !isnan($"maf"),
        lit(2.0) * $"maf" * (lit(1.0) - $"maf"))).as("_expected_het"),
      // singletons: sample carries the alt and site MAC == 1 (`:507-519`)
      sum(when($"_carries_alt" && $"mac" === 1, 1).otherwise(0)).as("n_singleton"))

    agg
      .withColumn("call_rate",
        when($"n_total" === 0, 0.0).otherwise($"n_called".cast(DoubleType) / $"n_total"))
      .withColumn("het_hom_ratio",
        when($"n_hom_var" === 0, lit(null).cast(DoubleType))
          .otherwise($"n_het".cast(DoubleType) / $"n_hom_var"))
      .withColumn("ti_tv_ratio",
        when($"_tv" === 0, lit(null).cast(DoubleType))
          .otherwise($"_ti".cast(DoubleType) / $"_tv"))
      // NULL when the sample has no non-PAR chrX rows — the reference
      // defaults to 0.0 (`:491`), which its infer_sex then reads as
      // hemizygosity and calls EVERY sample in an autosome-only panel
      // 'M'. Deliberate deviation: absence of X data is not evidence of
      // maleness; no data → unknown.
      .withColumn("x_het_rate",
        when($"_x_total" > 0, $"_x_het".cast(DoubleType) / $"_x_total")
          .otherwise(lit(null).cast(DoubleType)))
      .withColumn("sex_inferred",
        when($"x_het_rate".isNull, "unknown")
          .when($"x_het_rate" <= config.maleXHetThreshold, "M")
          .when($"x_het_rate" >= config.femaleXHetThreshold, "F")
          .otherwise("unknown"))
      .withColumn("f_inbreeding",
        when($"_expected_het".isNull || $"_expected_het" === 0.0, lit(null).cast(DoubleType))
          .otherwise(lit(1.0) - $"n_het" / $"_expected_het"))
      // qc_pass rule (`qc/sample_qc.py:172-210`; generated column
      // `qc/schema.py:36-40`): contamination/sex unknown → pass
      .withColumn("qc_pass", $"call_rate" >= config.minCallRate)
      .drop("_ti", "_tv", "_x_total", "_x_het", "_expected_het")
  }

  /** A5 per-batch roll-up (`qc/schema.py:74-97`): pass/fail counts plus
    * median call rate.
    *
    * `approxMedian`: exact `percentile` holds every group value in
    * memory — fine at cohort sizes, a per-group memory risk at 100×.
    * The scale path is `approx_percentile` (t-digest, bounded memory,
    * partial-aggregatable); exact stays the default for oracle parity.
    */
  def batchSummary(sampleQc: DataFrame, approxMedian: Boolean = false): DataFrame = {
    import sampleQc.sparkSession.implicits._
    val median =
      if (approxMedian) expr("approx_percentile(call_rate, 0.5, 10000)")
      else expr("percentile(call_rate, 0.5)")
    sampleQc.agg(
      count(lit(1)).as("n_samples"),
      sum(when($"qc_pass", 1).otherwise(0)).as("n_pass"),
      sum(when(!$"qc_pass", 1).otherwise(0)).as("n_fail"),
      avg($"call_rate").as("mean_call_rate"),
      median.as("median_call_rate"),
      min($"call_rate").as("min_call_rate"),
      max($"call_rate").as("max_call_rate"),
      // the reference's sample_qc_summary also averages these three
      // (`qc/schema.py:85-87`); its n_sex_discordant / n_contaminated
      // read contamination machinery that is out of scope here
      // (documented on the A4/A5 COVERAGE rows)
      avg($"het_hom_ratio").as("mean_het_hom_ratio"),
      avg($"ti_tv_ratio").as("mean_ti_tv_ratio"),
      avg($"f_inbreeding").as("mean_f_inbreeding"))
  }
}
