package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._

/** Randomized soak of the per-key import path: a seeded sequence of
  * import-gwas calls (three studies, two file versions each, arbitrary
  * re-import order) with compactions interleaved must keep gwas_stats
  * exactly equal to a driver-side model — per study, the row count and
  * beta sum of the LAST imported version, nothing else. This is the
  * sequence-level guard for the surgical dropKeyFiles + append replace
  * (and its interaction with compact's key-clustered rewrites): a drop
  * that misses files, unlinks another study's, or double-lands a batch
  * diverges from the model immediately. */
class ImportSoakSpec extends SparkSpec {
  import spark.implicits._

  test("randomized import/re-import/compact sequences match the per-study model (seeded)") {
    val rng = new scala.util.Random(99173L)
    val db = Files.createTempDirectory("importsoak").toString
    Graft.run(spark, Array("load", fixture("hapmap3_overlap.vcf"), "--db", db))
    val dir = Files.createTempDirectory("importsoaktsv")
    // every row matches a store variant by construction (fixture
    // positions/alleles), so the model needs no matching logic
    val sites = Seq(
      ("1", 752566L, "A", "G", "rs3094315"),
      ("1", 752721L, "G", "A", "rs3131972"))
    // (study, version) -> (path, nRows, sumBeta)
    val versions = (for {
      s <- Seq("ST_A", "ST_B", "ST_C")
      v <- Seq(0, 1)
    } yield {
      val n = 1 + (s.hashCode.abs + v) % 2 // 1 or 2 rows, deterministic
      val rows = (0 until n).map { i =>
        val (c, p, ea, oa, rs) = sites(i)
        val beta = (s.hashCode.abs % 7 + v * 10 + i) / 100.0
        (s"$c\t$p\t$ea\t$oa\t1e-6\t$beta\t0.01\t0.25\t$rs", beta)
      }
      val path = dir.resolve(s"${s}_v$v.tsv")
      Files.write(path, (Seq("CHR\tPOS\tEA\tOA\tPVAL\tBETA\tSE\tEAF\tSNP")
        ++ rows.map(_._1)).mkString("\n").getBytes)
      (s, v) -> ((path.toString, n.toLong, rows.map(_._2).sum))
    }).toMap
    val live = scala.collection.mutable.Map[String, (Long, Double)]()

    def check(): Unit = {
      val got = spark.read.parquet(s"$db/gwas_stats")
        .groupBy($"study_accession")
        .agg(count(lit(1)).as("n"), sum($"beta").as("sb"))
        .collect()
        .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
      assert(got.keySet == live.keySet.toSet,
        s"studies ${got.keySet} != model ${live.keySet}")
      live.foreach { case (s, (n, sb)) =>
        val (gn, gsb) = got(s)
        assert(gn == n, s"$s: $gn rows != model $n")
        assert(math.abs(gsb - sb) < 1e-12, s"$s: beta sum $gsb != model $sb")
      }
      assert(spark.read.parquet(s"$db/studies").count() == live.size.toLong)
    }

    (0 until 10).foreach { _ =>
      val s = Seq("ST_A", "ST_B", "ST_C")(rng.nextInt(3))
      val v = rng.nextInt(2)
      val (path, n, sb) = versions((s, v))
      Graft.run(spark, Array("import-gwas", path, "--db", db,
        "--study-accession", s))
      live(s) = (n, sb)
      if (rng.nextDouble() < 0.3)
        Graft.run(spark, Array("compact", "--db", db,
          "--tables", "gwas_stats"))
      check()
    }
  }
}
