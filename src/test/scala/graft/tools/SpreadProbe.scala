package graft.tools

import org.apache.spark.sql.SparkSession

/** A/B harness for the r18 scan-spread optimization (Tables.spread):
  * times each named declared query with spark.graft.spread=false (the
  * pre-r18 single-task scan stage) and =true (one round-robin exchange
  * when planned splits < slots), interleaved in one JVM so host drift
  * hits both shapes equally. Companion to VotePassProbe/StripCostProbe.
  *
  * Usage: sbt "Test/runMain graft.tools.SpreadProbe [sfDir] [rounds] [names...]"
  */
object SpreadProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val rounds = args.drop(1).headOption.map(_.toInt).getOrElse(5)
    val names =
      if (args.length > 2) args.drop(2).toSeq
      else Seq("q01_pricing_summary", "q02_revenue_by_priority",
        "q05_groups_semijoin", "q09_interval_join", "p03_doc_quality",
        "p05_ngram_jaccard_adjacent", "p07_minhash_pairs", "p09_lang_id",
        "p15_dedup_clusters")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.files.maxPartitionBytes", "4194304")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time(body: => Unit): Double = {
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
    }
    def med(xs: Seq[Double]): Double = xs.sorted.apply(xs.length / 2)

    names.foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      // warm both shapes once (JIT/codegen)
      Seq("false", "true").foreach { v =>
        spark.conf.set("spark.graft.spread", v)
        graft.Bench.materialize(fn(spark, sfDir))
      }
      val off = scala.collection.mutable.ArrayBuffer[Double]()
      val on = scala.collection.mutable.ArrayBuffer[Double]()
      (1 to rounds).foreach { _ =>
        spark.conf.set("spark.graft.spread", "false")
        off += time(graft.Bench.materialize(fn(spark, sfDir)))
        spark.conf.set("spark.graft.spread", "true")
        on += time(graft.Bench.materialize(fn(spark, sfDir)))
      }
      println(f"[spread] $name%-28s off=${med(off.toSeq)}%.3f on=${med(on.toSeq)}%.3f " +
        f"delta=${med(on.toSeq) - med(off.toSeq)}%+.3f " +
        s"(raw off=${off.map(t => f"$t%.2f").mkString(",")} " +
        s"on=${on.map(t => f"$t%.2f").mkString(",")})")
    }
    spark.stop()
  }
}
