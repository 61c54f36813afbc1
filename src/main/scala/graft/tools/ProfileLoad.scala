package graft.tools

import org.apache.spark.sql.SparkSession

/** Load-verb profiler: runs the bench's `vcf_load_100k` shape (fresh-db
  * load of a 100k-variant synthetic VCF) N times under the bench's Spark
  * config and prints the LoadProgress per-stage breakdown each run —
  * the tool the r8 verdict asked for to find where `vcf_load_100k`'s
  * ~2.7 s over the engine's r6 best went. Also runs cohort appends so
  * the append path's stages are visible side by side.
  *
  * Usage: sbt "runMain graft.tools.ProfileLoad [nRuns]"
  */
object ProfileLoad {
  def main(args: Array[String]): Unit = {
    // the run count is the first NUMERIC arg — `ProfileLoad --1m` alone
    // must not NumberFormatException on the flag
    val n = args.find(_.forall(_.isDigit)).map(_.toInt).getOrElse(3)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.files.maxPartitionBytes", "4194304")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def rmrf(p: java.io.File): Unit = {
      if (p.isDirectory) Option(p.listFiles()).foreach(_.foreach(rmrf))
      p.delete(); ()
    }

    val vcfPath = "/tmp/graft_bench_100k.vcf"
    if (!java.nio.file.Files.exists(java.nio.file.Paths.get(vcfPath)))
      graft.vcf.SyntheticVcf.write(vcfPath, 100000)
    val warmupVcf = "/tmp/graft_bench_warmup.vcf"
    if (!java.nio.file.Files.exists(java.nio.file.Paths.get(warmupVcf)))
      graft.vcf.SyntheticVcf.write(warmupVcf, 1000)

    // JVM/codegen warmup on a small load (untimed)
    rmrf(new java.io.File("/tmp/graft_prof_warm"))
    graft.Graft.run(spark, Array("load", warmupVcf, "--db", "/tmp/graft_prof_warm"))

    println("==== fresh-db loads (vcf_load_100k shape) ====")
    (1 to n).foreach { i =>
      rmrf(new java.io.File("/tmp/graft_prof_db"))
      val t0 = System.nanoTime()
      graft.Graft.run(spark, Array("load", vcfPath, "--db", "/tmp/graft_prof_db"))
      println(f"run $i total ${(System.nanoTime() - t0) / 1e9}%.2fs")
    }

    if (args.contains("--1m")) {
      println("==== fresh-db 1M load (scaling check) ====")
      val vcf1m = "/tmp/graft_bench_1m.vcf"
      if (!java.nio.file.Files.exists(java.nio.file.Paths.get(vcf1m)))
        graft.vcf.SyntheticVcf.write(vcf1m, 1000000)
      rmrf(new java.io.File("/tmp/graft_prof_db1m"))
      val t0 = System.nanoTime()
      graft.Graft.run(spark, Array("load", vcf1m, "--db", "/tmp/graft_prof_db1m"))
      println(f"1m load total ${(System.nanoTime() - t0) / 1e9}%.2fs")
    }

    println("==== cohort appends (vcf_load_cohort_append shape) ====")
    val cohortDb = "/tmp/graft_prof_cohortdb"
    rmrf(new java.io.File(cohortDb))
    graft.Graft.run(spark, Array("load", vcfPath, "--db", cohortDb))
    (0 until n).foreach { i =>
      val p = s"/tmp/graft_bench_cohort_$i.vcf"
      if (!java.nio.file.Files.exists(java.nio.file.Paths.get(p)))
        graft.vcf.SyntheticVcf.write(p, 100000, seed = 1000L + i)
      val t0 = System.nanoTime()
      graft.Graft.run(spark, Array("load", p, "--db", cohortDb))
      println(f"append $i total ${(System.nanoTime() - t0) / 1e9}%.2fs")
    }
    spark.stop()
  }
}
