package graft.tools

import org.apache.spark.sql.SparkSession

/** Micro-profiler for the driver-side serving faces: builds the bench's
  * compacted store shape, then times byPosition/byRsid/byGene and the
  * genotype probe over many iterations, printing a latency histogram —
  * the tool for driving the <5 ms BASELINE rows down.
  *
  * Usage: sbt "runMain graft.tools.ProfileLookup [iters]"
  */
object ProfileLookup {
  def main(args: Array[String]): Unit = {
    val iters = args.headOption.map(_.toInt).getOrElse(200)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val vcfPath = "/tmp/graft_bench_100k.vcf"
    if (!java.nio.file.Files.exists(java.nio.file.Paths.get(vcfPath)))
      graft.vcf.SyntheticVcf.write(vcfPath, 100000)
    val dbPath = "/tmp/graft_bench_db_v5/variants"
    if (!java.nio.file.Files.exists(java.nio.file.Paths.get(dbPath))) {
      val v = graft.vcf.VcfReader.variants(spark, vcfPath)
      graft.sinks.Writers.writeVariants(
        graft.ingest.VariantMatching.withVariantId(v), dbPath)
    }
    val rsidIdxPath = "/tmp/graft_bench_db_v5/rsid_idx"
    if (!java.nio.file.Files.exists(java.nio.file.Paths.get(rsidIdxPath)))
      graft.sinks.Writers.writeRsidIndex(
        spark.read.parquet(dbPath), rsidIdxPath)

    import org.apache.spark.sql.functions._
    val store = spark.read.parquet(dbPath)
    val probeSite = store.filter(col("chrom") === "chr1")
      .agg(min(col("pos"))).head().getLong(0)
    val probeRs = spark.read.parquet(rsidIdxPath)
      .orderBy(col("rs_id")).select("rs_id").head().getString(0)

    def bench(name: String)(body: => Unit): Unit = {
      (1 to 20).foreach(_ => body) // warm
      val ts = (1 to iters).map { _ =>
        val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e6
      }.sorted
      println(f"$name%-24s p50=${ts(iters / 2)}%6.2fms  " +
        f"p90=${ts(iters * 9 / 10)}%6.2fms  min=${ts.head}%6.2fms  " +
        f"max=${ts.last}%6.2fms")
    }

    bench("byPosition") {
      assert(graft.query.PointLookup.byPosition(
        spark, dbPath, "chr1", probeSite).nonEmpty)
    }
    bench("byRsid") {
      assert(graft.query.PointLookup.byRsid(
        spark, rsidIdxPath, dbPath, probeRs).nonEmpty)
    }
    spark.stop()
  }
}
