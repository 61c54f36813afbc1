package graft.tools

import org.apache.spark.sql.SparkSession

/** Isolated VCF parse microbenchmark (diagnostic main). */
object ParseBench {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t(name: String)(body: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = body
      println(f"[parsebench] $name: ${(System.nanoTime() - t0) / 1e9}%.2fs n=$n")
    }
    t("warmup_1k")(graft.vcf.VcfReader.variants(spark, "/tmp/graft_bench_warmup.vcf").count())
    t("100k")(graft.vcf.VcfReader.variants(spark, "/tmp/graft_bench_100k.vcf").count())
    t("100k_norm")(graft.vcf.VcfReader.variants(spark, "/tmp/graft_bench_100k.vcf",
      graft.vcf.VcfReader.Options(normalize = true)).count())
    t("1m")(graft.vcf.VcfReader.variants(spark, "/tmp/graft_bench_1m.vcf").count())
    t("1m_norm")(graft.vcf.VcfReader.variants(spark, "/tmp/graft_bench_1m.vcf",
      graft.vcf.VcfReader.Options(normalize = true)).count())
    t("1m_norm_again")(graft.vcf.VcfReader.variants(spark, "/tmp/graft_bench_1m.vcf",
      graft.vcf.VcfReader.Options(normalize = true)).count())
    spark.stop()
  }
}
