package graft.transform

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions.udf

/** vt-style variant normalization (Tan et al., Bioinformatics 2015):
  * left-align + parsimony. Semantics mirror the reference implementation
  * (`src/vcf_pg_loader/normalizer.py:13-201`), reimplemented as pure Scala
  * and exposed as a Spark UDF returning a struct.
  *
  * Phase 1 right-trims shared trailing bases (left-extending from a
  * reference genome when an allele would empty — only when a genome is
  * supplied, as in the reference). Phase 2 left-trims shared leading bases
  * while every allele is longer than 1.
  */
object Normalizer {

  /** Access to reference genome bases for left-extension (0-based, end
    * exclusive) — mirrors `normalizer.py:6-11`. */
  trait ReferenceGenome extends Serializable {
    def fetch(chrom: String, start: Long, end: Long): String
  }

  final case class Result(pos: Long, ref: String, alt: String, wasNormalized: Boolean)

  /** Normalize one (pos, ref, alts) site; mirrors `normalize_variant`
    * (`normalizer.py:88-128`). */
  def normalize(chrom: String, pos0: Long, ref0: String, alts0: Seq[String],
                genome: Option[ReferenceGenome] = None): (Long, String, Seq[String]) = {
    if (ref0 == null || ref0.isEmpty || alts0 == null || alts0.isEmpty)
      return (pos0, ref0, alts0)
    var alleles: Array[String] = (ref0.toUpperCase +: alts0.map(_.toUpperCase)).toArray
    var pos = pos0

    // Phase 1: right-trim or left-extend (`normalizer.py:13-63`).
    var done = false
    while (!done) {
      var rightTrim = true
      var leftExtend = false
      var i = 0
      while (i < alleles.length && !leftExtend) {
        val a = alleles(i)
        if (a.isEmpty) { rightTrim = false; leftExtend = true }
        else if (a.charAt(a.length - 1) != alleles(0).charAt(alleles(0).length - 1))
          rightTrim = false
        i += 1
      }
      if (pos == 1 && alleles.exists(_.length == 1)) rightTrim = false

      if (!rightTrim && !leftExtend) done = true
      else {
        if (rightTrim) alleles = alleles.map(a => a.substring(0, a.length - 1))
        if (leftExtend) {
          if (genome.isEmpty || pos <= 1) done = true
          else {
            pos -= 1
            val base = genome.get.fetch(chrom, pos - 1, pos).toUpperCase
            alleles = alleles.map(base + _)
          }
        }
      }
    }

    // Phase 2: left-trim for parsimony (`normalizer.py:66-85`).
    var trimming = true
    while (trimming) {
      if (alleles.exists(_.length <= 1)) trimming = false
      else {
        val first = alleles(0).charAt(0)
        if (alleles.forall(_.charAt(0) == first)) {
          alleles = alleles.map(_.substring(1)); pos += 1
        } else trimming = false
      }
    }

    (pos, alleles(0), alleles.tail.toSeq)
  }

  /** Fast necessary-and-sufficient normalization check
    * (`normalizer.py:131-157`). */
  def isNormalized(ref: String, alts: Seq[String]): Boolean = {
    if (ref == null || ref.isEmpty || alts == null || alts.isEmpty) return true
    val alleles = ref.toUpperCase +: alts.map(_.toUpperCase)
    if (alleles.filter(_.nonEmpty).map(_.last).distinct.size == 1) return false
    if (alleles.map(_.length).min == 1) return true
    alleles.map(_.head).distinct.size > 1
  }

  /** snp / indel / mnp / sv classification (`normalizer.py:160-180`). */
  def classify(ref: String, alt: String): String = {
    if (alt.startsWith("<") && alt.endsWith(">")) "sv"
    else if (ref.length == 1 && alt.length == 1) "snp"
    else if (ref.length != alt.length) "indel"
    else "mnp"
  }

  /** Biallelic decomposition helper (`normalizer.py:183-201`); on the
    * DataFrame path this is `posexplode(split(alt, ","))` — see VcfReader. */
  def decompose(chrom: String, pos: Long, ref: String, alts: Seq[String])
      : Seq[(String, Long, String, String)] =
    alts.filter(a => a != null && a.nonEmpty).map(a => (chrom, pos, ref, a))

  // ---- Spark surface ----

  /** Reference UDF form of (pos, ref, alt) → struct(pos, ref, alt,
    * was_normalized) — kept as the differential-test oracle for the
    * native expression that replaced it in the parse path. */
  val normalizeUdf = udf { (pos: Long, ref: String, alt: String) =>
    val (p, r, as) = normalize("", pos, ref, Seq(alt), None)
    val a = if (as.nonEmpty) as.head else alt
    Result(p, r, a, p != pos || r != ref || a != alt)
  }

  val classifyUdf = udf { (ref: String, alt: String) => classify(ref, alt) }

  val isNormalizedUdf = udf { (ref: String, alt: String) =>
    isNormalized(ref, Seq(alt))
  }

  /** Applied post-decomposition, exactly where the reference normalizes
    * (`vcf_parser.py:311-325`). Native codegen'd expression (see
    * NormalizeExpression) — pure per-row work inside a single projection,
    * no shuffle, no whole-stage-codegen barrier. */
  def normalizeCol(pos: Column, ref: Column, alt: Column): Column =
    graft.functions.NormalizeExpression.normalizeVariant(pos, ref, alt)

  /** Register SQL-callable forms: normalize_variant / classify_variant /
    * is_normalized. */
  def register(spark: SparkSession): Unit = {
    graft.functions.NormalizeExpression.register(spark)
    spark.udf.register("classify_variant", (ref: String, alt: String) => classify(ref, alt))
    spark.udf.register("is_normalized", (ref: String, alt: String) => isNormalized(ref, Seq(alt)))
  }
}
