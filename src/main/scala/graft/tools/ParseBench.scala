package graft.tools

import org.apache.spark.sql.SparkSession

/** Isolated VCF parse microbenchmark (diagnostic main). Uses the same
  * full-materialization harness as Bench — `count()` would let Catalyst
  * prune the INFO-map/CSQ/normalize work out of the timed plan.
  */
object ParseBench {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.sql.files.maxPartitionBytes", "8388608")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t(name: String)(body: => Unit): Unit = {
      val t0 = System.nanoTime()
      body
      println(f"[parsebench] $name: ${(System.nanoTime() - t0) / 1e9}%.2fs")
    }
    import graft.Bench.materialize
    import graft.vcf.VcfReader
    if (!java.nio.file.Files.exists(java.nio.file.Paths.get("/tmp/graft_bench_warmup.vcf")))
      graft.vcf.SyntheticVcf.write("/tmp/graft_bench_warmup.vcf", 1000)
    if (!java.nio.file.Files.exists(java.nio.file.Paths.get("/tmp/graft_bench_100k.vcf")))
      graft.vcf.SyntheticVcf.write("/tmp/graft_bench_100k.vcf", 100000)
    if (!java.nio.file.Files.exists(java.nio.file.Paths.get("/tmp/graft_bench_1m.vcf")))
      graft.vcf.SyntheticVcf.write("/tmp/graft_bench_1m.vcf", 1000000)
    t("warmup_1k")(materialize(VcfReader.variants(spark, "/tmp/graft_bench_warmup.vcf")))
    t("100k")(materialize(VcfReader.variants(spark, "/tmp/graft_bench_100k.vcf")))
    t("100k_norm")(materialize(VcfReader.variants(spark, "/tmp/graft_bench_100k.vcf",
      VcfReader.Options(normalize = true))))
    t("1m")(materialize(VcfReader.variants(spark, "/tmp/graft_bench_1m.vcf")))
    t("1m_norm")(materialize(VcfReader.variants(spark, "/tmp/graft_bench_1m.vcf",
      VcfReader.Options(normalize = true))))
    t("1m_norm_again")(materialize(VcfReader.variants(spark, "/tmp/graft_bench_1m.vcf",
      VcfReader.Options(normalize = true))))
    spark.stop()
  }
}
