package graft.functions

import graft.SparkSpec
import graft.transform.Annotations
import org.apache.spark.sql.functions._

class ConsequenceExpressionSpec extends SparkSpec {
  import spark.implicits._

  private val CsqFields = Seq("Allele", "Consequence", "IMPACT", "SYMBOL",
    "Gene", "Feature", "HGVSc", "HGVSp")
  private val AnnFields = Seq("Allele", "Annotation", "Annotation_Impact",
    "Gene_Name", "Gene_ID", "Feature_Type", "Feature_ID")

  private def compare(rows: Seq[(String, String)], fields: Seq[String],
                      csqShape: Boolean): Unit = {
    val df = rows.toDF("raw", "alt")
    val native =
      if (csqShape) Annotations.csqBest(fields, $"raw", $"alt").get
      else Annotations.annBest(fields, $"raw", $"alt").get
    val hof =
      if (csqShape) Annotations.csqBestHof(fields, $"raw", $"alt").get
      else Annotations.annBestHof(fields, $"raw", $"alt").get
    val out = df.select($"raw", $"alt", native.as("n"), hof.as("h"))
      .collect()
    out.foreach { r =>
      assert(r.getAs[Any]("n") == r.getAs[Any]("h"),
        s"mismatch for raw='${r.getString(0)}' alt='${r.getString(1)}': " +
          s"native=${r.getAs[Any]("n")} hof=${r.getAs[Any]("h")}")
    }
  }

  test("hand-picked CSQ shapes match the HOF twin") {
    def e(allele: String, impact: String, tag: String) =
      s"$allele|missense_variant|$impact|GENE$tag|ENSG$tag|ENST$tag|c.$tag|p.$tag"
    compare(Seq(
      (e("A", "MODERATE", "1"), "A"),                       // single match
      (s"${e("A", "LOW", "1")},${e("A", "HIGH", "2")}", "A"), // HIGH beats LOW
      (s"${e("A", "HIGH", "1")},${e("A", "HIGH", "2")}", "A"), // first-wins tie
      (s"${e("C", "HIGH", "1")},${e("A", "LOW", "2")}", "A"),  // allele filter
      (e("A", "MODERATE", "1"), "G"),                        // no allele match → null
      ("A|too|short", "A"),                                  // wrong field count → null
      ("", "A"),                                             // empty string → null
      (s"${e("A", "banana", "1")},${e("A", "LOW", "2")}", "A"), // unknown impact ranks 3
      (e("A", "MODERATE", "1") + ",", "A"),                  // trailing comma
      (e("a", "HIGH", "1"), "A")),                           // case-sensitive allele
      CsqFields, csqShape = true)
  }

  test("hand-picked ANN shapes match the HOF twin") {
    compare(Seq(
      ("A|stop_gained|HIGH|G1|ENSG1|transcript|T1", "A"),
      ("|stop_gained|HIGH|G1", "A"),                         // empty allele matches any
      ("C|stop_gained|HIGH|G1,A|syn|LOW|G2", "A"),           // allele filter, ≥4 fields
      ("A|x|HIGH", "A"),                                     // 3 fields → dropped
      ("A|syn|LOW|G1|extra|fields|ok|here|9|10", "A"),       // >minSize fields fine
      ("", "A")),
      AnnFields, csqShape = false)
  }

  test("seeded random CSQ/ANN sweep matches the HOF twin (800 rows; GRAFT_FUZZ_N scales)") {
    val rnd = new scala.util.Random(7777)
    val fuzzN = sys.env.getOrElse("GRAFT_FUZZ_N", "800").toInt
    val alleles = Seq("A", "C", "G", "T", "")
    val impacts = Seq("HIGH", "MODERATE", "LOW", "MODIFIER", "weird", "")
    def entry(nFields: Int) =
      (0 until nFields).map { i =>
        if (i == 0) alleles(rnd.nextInt(alleles.length))
        else if (i == 2) impacts(rnd.nextInt(impacts.length))
        else if (rnd.nextBoolean()) s"f$i" else ""
      }.mkString("|")
    def raw() = {
      val n = 1 + rnd.nextInt(4)
      (0 until n).map { _ =>
        // mostly well-formed, some wrong-arity entries
        val fields = if (rnd.nextDouble() < 0.25) 1 + rnd.nextInt(12)
                     else CsqFields.length
        entry(fields)
      }.mkString(",")
    }
    val rows = (0 until fuzzN).map(_ => (raw(), alleles(rnd.nextInt(4))))
    compare(rows, CsqFields, csqShape = true)
    compare(rows, AnnFields, csqShape = false)
  }

  test("fixture corpus worst-consequence is unchanged by the native expression") {
    // the ANN fixture exercised by the driver's vcf_worst_consequence
    val vcf = fixture("snpeff/cancer.ann.vcf")
    val df = graft.vcf.VcfReader.variants(spark, vcf)
    val rows = df.select($"gene", $"impact").filter($"gene".isNotNull).collect()
    assert(rows.nonEmpty)
    // differential over the corpus's real raw ANN strings
    val header = graft.vcf.VcfHeader.read(spark, vcf)
    assert(header.annFields.nonEmpty)
    val raw = spark.read.text(vcf)
      .filter(!$"value".startsWith("#"))
      .select(
        regexp_extract($"value", "ANN=([^;\\t]+)", 1).as("raw"),
        split(split($"value", "\t").getItem(4), ",").getItem(0).as("alt"))
      .filter($"raw" =!= "")
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq
    assert(raw.nonEmpty)
    compare(raw, header.annFields, csqShape = false)
  }

  test("synthetic ANN corpus: extraction filters alleles and picks the worst impact") {
    val vcf = java.nio.file.Files.createTempFile("syn_ann", ".vcf").toString
    graft.vcf.SyntheticVcf.write(vcf, 400, annFrac = 0.5, seed = 99L)
    val df = graft.vcf.VcfReader.variants(spark, vcf)
    val annotated = df.filter($"gene".isNotNull)
    val n = annotated.count()
    assert(n > 100, s"expected ~half the sites annotated, got $n")
    // impacts come only from the generator's vocabulary; the cross-allele
    // noise entries (gene NONE*, allele Z) must never win
    val impacts = annotated.select($"impact").distinct()
      .collect().map(_.getString(0)).toSet
    assert(impacts.subsetOf(Set("HIGH", "MODERATE", "LOW", "MODIFIER")))
    assert(annotated.filter($"gene".startsWith("NONE")).count() == 0)
    // native output equals the HOF twin over the whole corpus
    val header = graft.vcf.VcfHeader.read(spark, vcf)
    val raw = spark.read.text(vcf)
      .filter(!$"value".startsWith("#"))
      .select(regexp_extract($"value", "ANN=([^;\\t]+)", 1).as("raw"),
        split(split($"value", "\t").getItem(4), ",").getItem(0).as("alt"))
      .filter($"raw" =!= "")
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq
    compare(raw, header.annFields, csqShape = false)
  }
}
