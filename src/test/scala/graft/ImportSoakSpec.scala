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

  test("randomized composite-key frequency imports match the per-(source,subset) model (seeded)") {
    // the (source, subset) COMPOSITE replace key: re-importing one
    // combination must replace exactly its own rows — a conjunction bug
    // in dropKeyFiles (dropping per-key instead of per-pair) or a
    // compact that destroys key purity diverges from the model at once
    val rng = new scala.util.Random(55441L)
    val db = Files.createTempDirectory("freqsoak").toString
    Graft.run(spark, Array("load", fixture("hapmap3_overlap.vcf"), "--db", db))
    val dir = Files.createTempDirectory("freqsoakvcf")
    // two content versions: AF values differ, so the model tracks af sum
    val vcfs = Seq(0, 1).map { v =>
      val p = dir.resolve(s"freq_v$v.vcf")
      Files.writeString(p,
        s"""##fileformat=VCFv4.2
           |##INFO=<ID=AF_nfe,Number=A,Type=Float,Description="nfe">
           |##INFO=<ID=AF_afr,Number=A,Type=Float,Description="afr">
           |##INFO=<ID=AC_nfe,Number=A,Type=Integer,Description="nfe">
           |#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO
           |chr1\t752566\trs3094315\tA\tG\t50\tPASS\tAF_nfe=0.${v}1;AF_afr=0.${v}2;AC_nfe=${v + 1}
           |chr1\t752721\trs3131972\tG\tA\t50\tPASS\tAF_nfe=0.${v}3;AF_afr=0.${v}4;AC_nfe=${v + 2}
           |""".stripMargin)
      // 2 variants × 2 populations; af sum from the literals above
      v -> ((p.toString, 4L, 0.10 * v * 4 + 0.01 + 0.02 + 0.03 + 0.04))
    }.toMap
    val combos = for (s <- Seq("gnomAD_v3", "gnomAD_v4"); x <- Seq("all", "controls"))
      yield (s, x)
    val live = scala.collection.mutable.Map[(String, String), (Long, Double)]()

    def check(): Unit = {
      val got = spark.read.parquet(s"$db/population_frequencies")
        .groupBy($"source", $"subset")
        .agg(count(lit(1)).as("n"), sum($"af").as("sa"))
        .collect()
        .map(r => (r.getString(0), r.getString(1)) ->
          ((r.getLong(2), r.getDouble(3)))).toMap
      assert(got.keySet == live.keySet.toSet,
        s"combos ${got.keySet} != model ${live.keySet}")
      live.foreach { case (k, (n, sa)) =>
        val (gn, gsa) = got(k)
        assert(gn == n, s"$k: $gn rows != model $n")
        assert(math.abs(gsa - sa) < 1e-9, s"$k: af sum $gsa != model $sa")
      }
    }

    (0 until 10).foreach { _ =>
      val (src, sub) = combos(rng.nextInt(combos.length))
      val v = rng.nextInt(2)
      val (path, n, sa) = vcfs(v)
      Graft.run(spark, Array("import-frequencies", path, "--db", db,
        "--source", src, "--subset", sub))
      live((src, sub)) = (n, sa)
      if (rng.nextDouble() < 0.3)
        Graft.run(spark, Array("compact", "--db", db,
          "--tables", "population_frequencies"))
      check()
    }
  }
}
