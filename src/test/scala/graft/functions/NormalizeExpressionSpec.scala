package graft.functions

import graft.SparkSpec
import graft.transform.Normalizer
import org.apache.spark.sql.functions._

class NormalizeExpressionSpec extends SparkSpec {
  import spark.implicits._

  private def viaExpr(rows: Seq[(Long, String, String)]) =
    rows.toDF("pos", "ref", "alt")
      .select(NormalizeExpression.normalizeVariant($"pos", $"ref", $"alt").as("n"))
      .select($"n.pos", $"n.ref", $"n.alt", $"n.wasNormalized")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getBoolean(3)))
      .toSeq

  private def viaUdf(rows: Seq[(Long, String, String)]) =
    rows.toDF("pos", "ref", "alt")
      .select(Normalizer.normalizeUdf($"pos", $"ref", $"alt").as("n"))
      .select($"n.pos", $"n.ref", $"n.alt", $"n.wasNormalized")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getBoolean(3)))
      .toSeq

  test("hand-picked shapes match the UDF twin exactly") {
    val rows = Seq[(Long, String, String)](
      (500L, "A", "G"),            // normalized SNP (fast path)
      (1001L, "ATT", "AT"),        // right-trim deletion
      (1000L, "GCAT", "GTAT"),     // left-trim parsimony
      (100L, "CAGT", "CAT"),       // both-side trim
      (200L, "AT", "ATT"),         // insertion right-trim
      (400L, "att", "at"),         // lower-case input
      (400L, "a", "g"),            // lower-case already-parsimonious SNP
      (1L, "AT", "T"),             // pos==1 guard
      (1L, "ATT", "GTT"),          // pos==1, trims to len-1 then stops
      (300L, "A", "<DEL>"),        // symbolic ALT
      (300L, "AAAA", "AA"),        // repeat collapse
      (300L, "ACACAC", "AC"),      // microsatellite
      (42L, "N", "A"),             // N base
      (7L, "A", "A"))              // degenerate ref==alt
    assert(viaExpr(rows) == viaUdf(rows))
  }

  test("seeded random allele sweep matches the UDF twin (1000 pairs; GRAFT_FUZZ_N scales)") {
    val n = sys.env.getOrElse("GRAFT_FUZZ_N", "1000").toInt
    val rnd = new scala.util.Random(4242)
    val bases = "ACGTacgtn"
    def allele() = {
      val len = 1 + rnd.nextInt(8)
      (0 until len).map(_ => bases(rnd.nextInt(bases.length))).mkString
    }
    val rows = (0 until n).map { _ =>
      val pos = (1 + rnd.nextInt(5)).toLong match {
        case 1L => 1L // keep a healthy share at the pos==1 guard
        case _  => (1 + rnd.nextInt(1000000)).toLong
      }
      (pos, allele(), allele())
    }
    assert(viaExpr(rows) == viaUdf(rows))
  }

  test("SQL registration and null propagation") {
    NormalizeExpression.register(spark)
    val r = spark.sql(
      "SELECT normalize_variant(1001L, 'ATT', 'AT') AS n").select("n.*").head()
    assert(r.getLong(0) == 1001L && r.getString(1) == "AT" &&
      r.getString(2) == "A" && r.getBoolean(3))
    // int pos is implicitly cast
    val i = spark.sql(
      "SELECT normalize_variant(1001, 'ATT', 'AT') AS n").select("n.pos").head()
    assert(i.getLong(0) == 1001L)
    val n = spark.sql(
      "SELECT normalize_variant(5L, CAST(NULL AS STRING), 'A') AS n").head()
    assert(n.isNullAt(0))
  }

  test("normalized parse plan has no UDF barrier (single codegen span to the scan)") {
    val vcf = java.nio.file.Files.createTempFile("norm_expr", ".vcf").toString
    graft.vcf.SyntheticVcf.write(vcf, 200)
    val df = graft.vcf.VcfReader.variants(spark, vcf,
      graft.vcf.VcfReader.Options(normalize = true))
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("ScalaUDF"), s"UDF barrier survived:\n$plan")
    // and the result is sane
    assert(df.filter($"normalized").count() > 0)
  }
}
