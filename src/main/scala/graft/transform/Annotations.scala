package graft.transform

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Annotation extraction transforms (SURVEY §2.3 T6/T10/T11).
  *
  * Worst-consequence selection runs entirely inside one projection using
  * higher-order functions (split → filter → aggregate-fold) — the
  * reference's per-row Python loop (`vcf_parser.py:460-508`) becomes a
  * Catalyst expression with no shuffle and no UDF.
  */
object Annotations {

  /** IMPACT severity rank: HIGH(0) < MODERATE < LOW < MODIFIER(3);
    * unknown → 3 (`vcf_parser.py:465,487`). */
  private def impactRank(entry: Column, idxImpact: Int): Column =
    if (idxImpact < 0) lit(3)
    else {
      val imp = element_at(entry, idxImpact + 1)
      when(imp === "HIGH", 0).when(imp === "MODERATE", 1)
        .when(imp === "LOW", 2).otherwise(3)
    }

  /** Left-fold keeping the first entry with strictly-lower rank — same
    * first-wins tie behavior as the reference's `rank < best_rank` loop. */
  private def bestByRank(entries: Column, idxImpact: Int): Column =
    aggregate(entries, lit(null).cast(ArrayType(StringType)),
      (best, x) =>
        when(best.isNull || impactRank(x, idxImpact) < impactRank(best, idxImpact), x)
          .otherwise(best))

  /** VEP CSQ worst consequence for this ALT (`_parse_csq`,
    * `vcf_parser.py:460-482`): entries must have exactly |fields| values
    * and Allele == alt. Returns the winning entry as array<string>.
    * Native codegen'd expression; `csqBestHof` is the differential twin. */
  def csqBest(fields: Seq[String], csq: Column, alt: Column): Option[Column] =
    if (fields.isEmpty) None
    else Some(graft.functions.ConsequenceExpression.csqWorst(csq, alt, fields))

  /** SnpEff ANN worst consequence (`_parse_ann`, `vcf_parser.py:484-508`):
    * entries need ≥4 values; empty Allele matches any ALT. Native
    * codegen'd expression; `annBestHof` is the differential twin. */
  def annBest(fields: Seq[String], ann: Column, alt: Column): Option[Column] =
    if (fields.isEmpty) None
    else Some(graft.functions.ConsequenceExpression.annWorst(ann, alt, fields))

  /** HOF-fold form of csqBest — kept as the differential-test oracle for
    * the native expression. */
  def csqBestHof(fields: Seq[String], csq: Column, alt: Column): Option[Column] = {
    if (fields.isEmpty) None
    else {
      val idxAllele = fields.indexOf("Allele")
      val idxImpact = fields.indexOf("IMPACT")
      val entries = filter(
        transform(split(csq, ","), s => split(s, "\\|")),
        a => {
          val sizeOk = size(a) === fields.length
          if (idxAllele >= 0) sizeOk && element_at(a, idxAllele + 1) === alt else sizeOk
        })
      Some(when(csq.isNotNull, bestByRank(entries, idxImpact)))
    }
  }

  /** HOF-fold form of annBest — kept as the differential-test oracle for
    * the native expression. */
  def annBestHof(fields: Seq[String], ann: Column, alt: Column): Option[Column] = {
    if (fields.isEmpty) None
    else {
      val idxAllele = fields.indexOf("Allele")
      val idxImpact = fields.indexOf("Annotation_Impact")
      val entries = filter(
        transform(split(ann, ","), s => split(s, "\\|")),
        a => {
          val sizeOk = size(a) >= 4
          if (idxAllele >= 0) {
            val al = element_at(a, idxAllele + 1)
            sizeOk && (al.isNull || al === "" || al === alt)
          } else sizeOk
        })
      Some(when(ann.isNotNull, bestByRank(entries, idxImpact)))
    }
  }

  /** Project one named sub-field out of a winning entry array. */
  def subField(best: Column, fields: Seq[String], name: String): Column = {
    val idx = fields.indexOf(name)
    if (idx < 0) lit(null).cast(StringType)
    else element_at(best, idx + 1)
  }

  /** A bare VCF Flag key is surfaced by our reader as key→null; an
    * explicit value is truthy for "true"/"1"/"yes"/non-zero
    * (`parsers/imputation.py:158-169`). */
  private def truthyFlag(m: Column, key: String): Column =
    map_contains_key(m, key) && (
      element_at(m, key).isNull ||
      lower(element_at(m, key)).isin("true", "1", "yes") ||
      coalesce(element_at(m, key).cast(DoubleType) =!= 0.0, lit(false)))

  /** First element of a (possibly comma-joined) value, as double —
    * `_safe_float` over list-or-scalar (`parsers/imputation.py:142-156`). */
  private def firstDouble(m: Column, key: String): Column =
    element_at(split(element_at(m, key), ","), 1).cast(DoubleType)

  /** T11: per-source imputation metric columns over the sliced `info` map
    * (`parsers/imputation.py:172-225`). `source` is resolved on the driver
    * (header sniff or explicit), so this is a static projection.
    */
  def withImputationMetrics(df: DataFrame, source: String): DataFrame = {
    import df.sparkSession.implicits._
    val m = $"info"
    val (score, r2, imputed, typed, src) = source match {
      case "minimac4" =>
        val r = firstDouble(m, "R2")
        (r, r, truthyFlag(m, "IMPUTED"), truthyFlag(m, "TYPED"), lit("minimac4"))
      case "beagle" =>
        val r = firstDouble(m, "DR2")
        val imp = truthyFlag(m, "IMP")
        // Beagle typed-inference: DR2 ≥ 1 ∧ ¬IMP (`imputation.py:210-213`)
        (r, r, imp, coalesce(r >= 1.0 && !imp, lit(false)), lit("beagle"))
      case "impute2" =>
        val r = firstDouble(m, "INFO")
        (r, r, r.isNotNull, lit(false), lit("impute2"))
      case _ =>
        (lit(null).cast(DoubleType), lit(null).cast(DoubleType),
          lit(false), lit(false), lit(null).cast(StringType))
    }
    df.withColumn("info_score", score)
      .withColumn("imputation_r2", r2)
      .withColumn("is_imputed", imputed)
      .withColumn("is_typed", typed)
      .withColumn("imputation_source", src)
  }

  // ---- T10: ClinVar significance normalization (`type_mapping.py:90-138`) ----

  private val ClinvarMap: Map[String, String] = Map(
    "Benign" -> "benign",
    "Likely_benign" -> "likely_benign",
    "Uncertain_significance" -> "vus",
    "Likely_pathogenic" -> "likely_pathogenic",
    "Pathogenic" -> "pathogenic",
    "Conflicting_interpretations_of_pathogenicity" -> "conflicting",
    "drug_response" -> "drug_response",
    "risk_factor" -> "risk_factor",
    "association" -> "association",
    "protective" -> "protective",
    "not_provided" -> "not_provided",
    "other" -> "other")

  /** Precedence: pathogenic > likely_pathogenic > benign (only when no
    * part mentions "pathogenic" at all — faithful to the reference's
    * substring check) > likely_benign > conflicting > first part. */
  def normalizeClinvar(raw: String): String = {
    if (raw == null || raw.isEmpty) return "not_provided"
    val parts = raw.replace("/", ",").split(",").map(_.trim)
      .map(p => ClinvarMap.getOrElse(p, p.toLowerCase))
    if (parts.contains("pathogenic")) "pathogenic"
    else if (parts.contains("likely_pathogenic")) "likely_pathogenic"
    else if (parts.contains("benign") && !parts.mkString(",").contains("pathogenic")) "benign"
    else if (parts.contains("likely_benign")) "likely_benign"
    else if (parts.contains("conflicting")) "conflicting"
    else if (parts.nonEmpty) parts.head
    else "not_provided"
  }

  /** Worst of a list of IMPACT strings (`type_mapping.py:144-161`). */
  def worstImpact(impacts: Seq[String]): String = {
    if (impacts == null || impacts.isEmpty) return "MODIFIER"
    Seq("HIGH", "MODERATE", "LOW", "MODIFIER").find(impacts.contains)
      .getOrElse(impacts.head)
  }

  val normalizeClinvarUdf = udf(normalizeClinvar _)

  def register(spark: SparkSession): Unit = {
    spark.udf.register("normalize_clinvar", normalizeClinvar _)
    spark.udf.register("worst_impact", (xs: Seq[String]) => worstImpact(xs))
  }
}
