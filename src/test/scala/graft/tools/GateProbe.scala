package graft.tools

import org.apache.spark.sql.functions._

/** r19 instrument for the minhash verify-gate (r18 verdict #1): print,
  * for each relation shape the driver bench actually feeds
  * minhashCandidatePairsFromSignatures, BOTH size signals — the
  * optimizer's whole-plan stats.sizeInBytes (the r18 gate key) and the
  * sum of leaf-relation stats (the candidate r19 key) — against the
  * 64 MB threshold, so "which branch engaged" becomes a committed fact
  * instead of an inference. Run: sbt "Test/runMain graft.tools.GateProbe"
  */
object GateProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors.toString)
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.files.maxPartitionBytes", "4194304")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val threshold = 64L * 1024 * 1024

    def report(label: String, withSig: org.apache.spark.sql.DataFrame): Unit = {
      val plan = withSig.queryExecution.optimizedPlan
      val whole = plan.stats.sizeInBytes
      val leaves = plan.collectLeaves().map(_.stats.sizeInBytes).sum
      println(f"[gate] $label%-28s whole=$whole%,20d leaves=$leaves%,16d " +
        s"whole>=64MB=${whole >= threshold} leaves>=64MB=${leaves >= threshold}")
    }

    // p07/p15/p16/p20's lazy composition at sf0.1 (the sig relation the
    // gate sees is minhashSignatures(corpus))
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val d = graft.Tables(spark, sfDir).documents.filter($"doc_id" < 200)
    val mutated = d.filter($"doc_id" < 20)
      .select(($"doc_id" + 1000000).as("doc_id"),
        concat($"text", lit(" appended tail token")).as("text"))
    val corpus = d.select($"doc_id", $"text").union(mutated)
    report("p07_lazy_sf0.1",
      graft.pipeline.Dedup.minhashSignatures(corpus, "text", "doc_id", 3, 64))

    // p17's staged relation at sf0.1
    val p17Dir = "/tmp/graft_gateprobe_p17_sigs"
    graft.pipeline.Dedup.minhashSignatures(corpus, "text", "doc_id", 3, 64)
      .write.mode("overwrite").parquet(p17Dir)
    report("p17_staged_sf0.1", spark.read.parquet(p17Dir))

    // the bench scale rows' staged relations at 100k and 1m (corpora are
    // the bench's own /tmp files if present)
    Seq("100k", "1m").foreach { label =>
      val cdir = s"/tmp/graft_bench_scale_$label"
      if (java.nio.file.Files.exists(java.nio.file.Paths.get(cdir))) {
        val docs = spark.read.parquet(cdir).select("doc_id", "text")
        val sdir = s"/tmp/graft_gateprobe_sigs_$label"
        if (!java.nio.file.Files.exists(java.nio.file.Paths.get(sdir)))
          graft.pipeline.Dedup.writeSignatures(
            graft.pipeline.Dedup.minhashSignatures(
              docs, "text", "doc_id", 3, 64), sdir)
        report(s"staged_$label", spark.read.parquet(sdir))
        // the lazy shape at the same scale, for the whole-vs-leaf gap
        report(s"lazy_$label",
          graft.pipeline.Dedup.minhashSignatures(docs, "text", "doc_id", 3, 64))
      } else println(s"[gate] $cdir absent — run the bench first")
    }
    spark.stop()
  }
}
