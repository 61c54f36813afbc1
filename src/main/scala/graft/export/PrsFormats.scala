package graft.export

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** PRS-tool exports (SURVEY K6 — `export/prs_formats.py`): the four
  * downstream formats as join+filter+orderBy+select pipelines. Each
  * builder returns the ordered DataFrame with the exact column names the
  * tool expects; `writeTsv` materializes a single TSV file (these exports
  * feed single-node PRS tools, so one output file is the contract — the
  * heavy lifting upstream stays distributed and only the final ordered
  * result is coalesced).
  */
object PrsFormats {

  /** Export-time variant filter (F5 — `export/prs_formats.py:20-56`). */
  final case class VariantFilter(
      hapmap3Only: Boolean = false,
      minInfo: Option[Double] = None,
      minMaf: Option[Double] = None)

  private def applyFilter(df: DataFrame, vf: VariantFilter): DataFrame = {
    import df.sparkSession.implicits._
    var out = df
    if (vf.hapmap3Only) out = out.filter($"in_hapmap3" === true)
    vf.minInfo.foreach(m => out = out.filter($"info_score" >= m))
    vf.minMaf.foreach(m => out = out.filter($"maf" >= m))
    out
  }

  /** Inputs: gwas stats already matched (carry variant_id,
    * effect_allele, other_allele, beta, standard_error, p_value) and
    * variants (variant_id, chrom, pos, rs_id [+ filter columns]).
    *
    * The variants side is deduplicated to ONE row per variant_id first:
    * a multi-file cohort store carries a shared site once per batch, and
    * our content-keyed ids give those copies the same variant_id — a
    * plain join would emit one SNP line per batch, which PRS tools
    * reject (the reference's serial-id matching reaches exactly one row,
    * `gwas/loader.py` best-priority reduction). min_by over the full
    * column struct makes the pick deterministic even if batch copies
    * diverge in a QC column; partial-aggregatable, one shuffle of the
    * export dimension. */
  private def joined(stats: DataFrame, variants: DataFrame,
                     vf: VariantFilter): DataFrame = {
    import stats.sparkSession.implicits._
    val rest = variants.columns.filter(_ != "variant_id").map(col).toSeq
    val one = variants.groupBy($"variant_id")
      .agg(min_by(struct(rest: _*), struct(rest: _*)).as("_r"))
      .select($"variant_id" +: variants.columns.filter(_ != "variant_id")
        .map(c => col(s"_r.$c").as(c)): _*)
    applyFilter(stats.join(one, Seq("variant_id")), vf)
  }

  /** PLINK 2.0 --score: `SNP A1 BETA` (`export/prs_formats.py:91-138`). */
  def plinkScore(stats: DataFrame, variants: DataFrame,
                 vf: VariantFilter = VariantFilter()): DataFrame = {
    import stats.sparkSession.implicits._
    joined(stats, variants, vf)
      .filter($"rs_id".isNotNull && $"beta".isNotNull)
      .orderBy($"chrom", $"pos")
      .select($"rs_id".as("SNP"), $"effect_allele".as("A1"), $"beta".as("BETA"))
  }

  /** PRS-CS: `SNP A1 A2 BETA SE` or `SNP A1 A2 BETA P`
    * (`export/prs_formats.py:141-201`). */
  def prsCs(stats: DataFrame, variants: DataFrame, useSe: Boolean = true,
            vf: VariantFilter = VariantFilter()): DataFrame = {
    import stats.sparkSession.implicits._
    val base = joined(stats, variants, vf)
      .filter($"rs_id".isNotNull && $"beta".isNotNull && $"other_allele".isNotNull)
      .orderBy($"chrom", $"pos")
    val last: (Column, String) =
      if (useSe) ($"standard_error", "SE") else ($"p_value", "P")
    base.select($"rs_id".as("SNP"), $"effect_allele".as("A1"),
      $"other_allele".as("A2"), $"beta".as("BETA"), last._1.as(last._2))
  }

  /** LDpred2 bigsnpr: `chr pos a0 a1 beta beta_se n_eff`; chrom bare,
    * per-study scalar n_eff = 4/(1/cases+1/controls) or sample_size
    * (`export/prs_formats.py:204-263`, n_eff `:66-88`). */
  def ldpred2(stats: DataFrame, variants: DataFrame,
              nCases: Option[Long], nControls: Option[Long], sampleSize: Option[Long],
              vf: VariantFilter = VariantFilter()): DataFrame = {
    import stats.sparkSession.implicits._
    val nEff: Double = (nCases, nControls) match {
      case (Some(c), Some(k)) if c > 0 && k > 0 => 4.0 / (1.0 / c + 1.0 / k)
      case _ => sampleSize.map(_.toDouble).getOrElse(0.0)
    }
    joined(stats, variants, vf)
      .filter($"beta".isNotNull && $"standard_error".isNotNull && $"other_allele".isNotNull)
      .orderBy($"chrom", $"pos")
      .select(
        graft.functions.GenomicsFunctions.bareChrom($"chrom").as("chr"),
        $"pos",
        $"other_allele".as("a0"),
        $"effect_allele".as("a1"),
        $"beta",
        $"standard_error".as("beta_se"),
        format_string("%.0f", lit(nEff)).as("n_eff"))
  }

  /** PRSice-2: `SNP A1 A2 BETA SE P` (`export/prs_formats.py:266-321`). */
  def prsice2(stats: DataFrame, variants: DataFrame,
              vf: VariantFilter = VariantFilter()): DataFrame = {
    import stats.sparkSession.implicits._
    joined(stats, variants, vf)
      .filter($"rs_id".isNotNull && $"beta".isNotNull &&
        $"standard_error".isNotNull && $"other_allele".isNotNull)
      .orderBy($"chrom", $"pos")
      .select($"rs_id".as("SNP"), $"effect_allele".as("A1"),
        $"other_allele".as("A2"), $"beta".as("BETA"),
        $"standard_error".as("SE"), $"p_value".as("P"))
  }

  /** K5 — single-file TSV with header (tool contract). */
  def writeTsv(df: DataFrame, path: String): Unit =
    df.coalesce(1).write.mode("overwrite")
      .option("sep", "\t").option("header", "true")
      .csv(path)
}
