package graft.tools

import org.apache.spark.sql.functions._

/** r18 fine-grained split of the minhash PAIRS stage at 10M docs (the
  * cost center PairsProfile localizes to ~37 s): band generation alone,
  * + the one shuffle/sort/streamed-runs pass, + distinct, vs the full
  * path with the two est_jaccard verification joins. One-off probe.
  * Run: sbt "Test/runMain graft.tools.MhStageProbe"
  */
object MhStageProbe {
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
    def t[A](label: String)(body: => A): A = {
      val t0 = System.nanoTime(); val r = body
      println(f"[mhs] $label ${(System.nanoTime() - t0) / 1e9}%.1f s"); r
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    val sigDir = "/tmp/graft_pp_sigs" // written by PairsProfile
    val sigs = spark.read.parquet(sigDir)
    val filtered = sigs.filter(col("doc_id").isNotNull &&
      col("_sig").isNotNull && element_at(col("_sig"), 1).isNotNull)

    (1 to 2).foreach { rep =>
      t(s"bands_only_$rep")(noop(
        graft.pipeline.Dedup.lshBands(filtered, "_sig", 16, 4)))
      t(s"bands_sorted_pairs_$rep") {
        val bands = graft.pipeline.Dedup.lshBands(filtered, "_sig", 16, 4)
        noop(graft.pipeline.Dedup.pairsFromBandsSorted(
          bands, "doc_id", org.apache.spark.sql.types.LongType, Some(500)))
      }
      t(s"plus_distinct_$rep") {
        val bands = graft.pipeline.Dedup.lshBands(filtered, "_sig", 16, 4)
        noop(graft.pipeline.Dedup.pairsFromBandsSorted(
          bands, "doc_id", org.apache.spark.sql.types.LongType, Some(500))
          .distinct())
      }
      // construction INSIDE the timer: the r18 path checkpoints eagerly,
      // so building the DataFrame runs the pair pipeline (the bench's
      // timed bodies construct inside the timer too)
      var full: org.apache.spark.sql.DataFrame = null
      t(s"full_$rep") {
        full = graft.pipeline.Dedup.minhashCandidatePairsFromSignatures(
          sigs, maxBucketSize = Some(500))
        noop(full)
      }
      if (rep == 1) {
        val ex = full.queryExecution.executedPlan.toString
        Seq("ReusedExchange", "Exchange", "SortMergeJoin",
          "BroadcastHashJoin", "Scan parquet", "ShuffledHashJoin",
          "AQEShuffleRead").foreach { k =>
          println(s"[mhs] plan $k = ${k.r.findAllIn(ex).length}")
        }
        println(ex.linesIterator.filter(l => l.contains("Join") ||
          l.contains("Exchange") || l.contains("Scan parquet"))
          .mkString("\n"))
      }
    }
    spark.stop()
  }
}
