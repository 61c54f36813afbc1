package graft.tools

/** Scratch profiler for the load verb (run via Test/runMain). Not a test. */
object ProfileLoad {
  def main(args: Array[String]): Unit = {
    val spark = graft.Tables.session()
    spark.conf.set("spark.sql.files.maxPartitionBytes", "4194304")
    spark.sparkContext.setLogLevel("WARN")
    val vcf = "/tmp/graft_bench_100k.vcf"
    if (!java.nio.file.Files.exists(java.nio.file.Paths.get(vcf)))
      graft.vcf.SyntheticVcf.write(vcf, 100000)
    val warm = "/tmp/graft_bench_warmup.vcf"
    if (!java.nio.file.Files.exists(java.nio.file.Paths.get(warm)))
      graft.vcf.SyntheticVcf.write(warm, 1000)
    def rmrf(f: java.io.File): Unit = {
      if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(rmrf))
      f.delete(); ()
    }
    rmrf(new java.io.File("/tmp/prof_warm_db"))
    graft.Graft.run(spark, Array("load", warm, "--db", "/tmp/prof_warm_db"))
    rmrf(new java.io.File("/tmp/prof_warm_db"))
    (1 to 6).foreach { i =>
      rmrf(new java.io.File("/tmp/prof_load_db"))
      val t0 = System.nanoTime()
      graft.Graft.run(spark, Array("load", vcf, "--db", "/tmp/prof_load_db"))
      println(f"ROUND $i total: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
