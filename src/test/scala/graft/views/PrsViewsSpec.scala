package graft.views

import java.nio.file.Files
import graft.SparkSpec
import org.apache.spark.sql.functions._

class PrsViewsSpec extends SparkSpec {
  import spark.implicits._

  private def variants = Seq(
    // variant_id, chrom, pos, ref, alt, rs_id, info_score, call_rate, hwe_p, maf, aaf, in_hapmap3
    (1L, "chr1", 100L, "A", "G", "rs1", 0.9, 0.99, 0.5, 0.2, 0.2, true),   // prs-ready
    (2L, "chr1", 200L, "C", "T", "rs2", 0.4, 0.99, 0.5, 0.2, 0.2, true),   // low info
    (3L, "chr2", 300L, "G", "A", "rs3", 0.9, 0.99, 0.5, 0.001, 0.001, true), // rare
    (4L, "chr2", 400L, "T", "C", "rs4", 0.9, 0.99, 0.5, 0.3, 0.7, false)   // not hapmap3
  ).toDF("variant_id", "chrom", "pos", "ref", "alt", "rs_id", "info_score",
    "call_rate", "hwe_p", "maf", "aaf", "in_hapmap3")

  test("prs_candidate_variants: F4 filter + frequency pivot + stats inner join") {
    val freqs = Seq(
      (1L, "NFE", "gnomAD_v3", 0.21), (1L, "AFR", "gnomAD_v3", 0.15),
      (1L, "NFE", "other_source", 0.99), // wrong source filtered out
      (2L, "NFE", "gnomAD_v3", 0.4)
    ).toDF("variant_id", "population", "source", "af")
    val stats = Seq((1L, 0.05, 0.01, 1e-8), (3L, 0.02, 0.01, 1e-4))
      .toDF("variant_id", "beta", "standard_error", "p_value")

    val view = PrsViews.prsCandidateVariants(variants, freqs, stats).cache()
    // only variant 1 passes F4 AND has stats
    assert(view.count() == 1)
    val r = view.head()
    assert(r.getAs[Long]("variant_id") == 1L)
    assert(math.abs(r.getAs[Double]("gnomad_nfe_af") - 0.21) < 1e-12)
    assert(math.abs(r.getAs[Double]("gnomad_afr_af") - 0.15) < 1e-12)
    assert(r.isNullAt(r.fieldIndex("gnomad_eas_af")))
    assert(math.abs(r.getAs[Double]("beta") - 0.05) < 1e-12)
  }

  test("variant_qc_summary counts all predicate combinations") {
    val s = PrsViews.variantQcSummary(variants).head()
    assert(s.getAs[Long]("total_variants") == 4)
    assert(s.getAs[Long]("hapmap3_variants") == 3)
    assert(s.getAs[Long]("high_info_variants") == 3)
    assert(s.getAs[Long]("common_variants") == 3)
    assert(s.getAs[Long]("prs_ready_variants") == 1)
  }

  test("chromosome_variant_counts") {
    val c = PrsViews.chromosomeVariantCounts(variants).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(c("chr1") == (2L, 2L))
    assert(c("chr2") == (2L, 1L))
  }

  test("refresh persists views as parquet and reports timings") {
    val dir = Files.createTempDirectory("views").toString
    val t = PrsViews.refresh(dir, Map(
      "variant_qc_summary" -> PrsViews.variantQcSummary(variants)))
    assert(t.keySet == Set("variant_qc_summary"))
    assert(spark.read.parquet(s"$dir/variant_qc_summary").count() == 1)
  }
}

class ImputationSpec extends SparkSpec {
  import spark.implicits._

  private def writeVcf(headerExtra: String, rows: String): String = {
    val f = Files.createTempFile("imp", ".vcf")
    Files.writeString(f,
      s"""##fileformat=VCFv4.2
         |$headerExtra
         |#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO
         |$rows
         |""".stripMargin)
    f.toString
  }

  test("minimac4: R2 score + IMPUTED/TYPED flags") {
    val vcf = writeVcf(
      "##source=Minimac4\n##INFO=<ID=R2,Number=1,Type=Float,Description=\"r2\">\n" +
        "##INFO=<ID=IMPUTED,Number=0,Type=Flag,Description=\"\">\n" +
        "##INFO=<ID=TYPED,Number=0,Type=Flag,Description=\"\">",
      "chr1\t100\t.\tA\tG\t50\tPASS\tR2=0.95;IMPUTED\nchr1\t200\t.\tC\tT\t50\tPASS\tR2=0.99;TYPED")
    val df = graft.vcf.VcfReader.variants(spark, vcf).orderBy($"pos").cache()
    val r1 = df.head()
    assert(math.abs(r1.getAs[Double]("info_score") - 0.95) < 1e-9)
    assert(r1.getAs[Boolean]("is_imputed") && !r1.getAs[Boolean]("is_typed"))
    assert(r1.getAs[String]("imputation_source") == "minimac4")
    val r2 = df.collect()(1)
    assert(!r2.getAs[Boolean]("is_imputed") && r2.getAs[Boolean]("is_typed"))
  }

  test("beagle: DR2 with typed inference DR2>=1 and not IMP") {
    val vcf = writeVcf(
      "##source=beagle5.4\n##INFO=<ID=DR2,Number=1,Type=Float,Description=\"\">\n" +
        "##INFO=<ID=IMP,Number=0,Type=Flag,Description=\"\">",
      "chr1\t100\t.\tA\tG\t50\tPASS\tDR2=1.0\nchr1\t200\t.\tC\tT\t50\tPASS\tDR2=0.8;IMP")
    val df = graft.vcf.VcfReader.variants(spark, vcf).orderBy($"pos").collect()
    assert(df(0).getAs[Boolean]("is_typed") && !df(0).getAs[Boolean]("is_imputed"))
    assert(df(1).getAs[Boolean]("is_imputed") && !df(1).getAs[Boolean]("is_typed"))
    assert(df(1).getAs[String]("imputation_source") == "beagle")
  }

  test("F1: min-info-score filter keeps nulls, drops low scores") {
    val vcf = writeVcf(
      "##INFO=<ID=R2,Number=1,Type=Float,Description=\"\">",
      "chr1\t100\t.\tA\tG\t50\tPASS\tR2=0.95\n" +
        "chr1\t200\t.\tC\tT\t50\tPASS\tR2=0.3\n" +
        "chr1\t300\t.\tG\tA\t50\tPASS\tDP=10")
    val df = graft.vcf.VcfReader.variants(spark, vcf,
      graft.vcf.VcfReader.Options(minInfoScore = Some(0.6)))
    val kept = df.select($"pos").collect().map(_.getLong(0)).sorted
    assert(kept.toSeq == Seq(100L, 300L)) // 0.3 dropped; null passes
  }

  test("T10 ClinVar normalization vectors") {
    import graft.transform.Annotations.normalizeClinvar
    assert(normalizeClinvar("Pathogenic") == "pathogenic")
    assert(normalizeClinvar("Likely_pathogenic") == "likely_pathogenic")
    assert(normalizeClinvar("Benign/Likely_benign") == "benign" ||
      normalizeClinvar("Benign/Likely_benign") == "likely_benign")
    assert(normalizeClinvar("Pathogenic/Likely_pathogenic") == "pathogenic")
    assert(normalizeClinvar("Uncertain_significance") == "vus")
    assert(normalizeClinvar("") == "not_provided")
    assert(normalizeClinvar(null) == "not_provided")
    assert(normalizeClinvar("Conflicting_interpretations_of_pathogenicity") == "conflicting")
    // precedence: any pathogenic part wins over benign
    assert(normalizeClinvar("Benign,Pathogenic") == "pathogenic")
    import graft.transform.Annotations.worstImpact
    assert(worstImpact(Seq("LOW", "HIGH", "MODERATE")) == "HIGH")
    assert(worstImpact(Nil) == "MODIFIER")
  }

  test("annotation-query escape hatch: temp views + spark.sql") {
    val v = graft.vcf.VcfReader.variants(spark, fixture("hapmap3_overlap.vcf"))
    graft.query.Annotator.registerViews(v, Seq.empty)
    val n = spark.sql("SELECT COUNT(*) FROM variants WHERE chrom = 'chr1'")
      .head().getLong(0)
    assert(n == 7)
  }
}
