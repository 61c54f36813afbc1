package graft.tools

import org.apache.spark.sql.SparkSession

/** A/B harness for the r18 10x relational scale shapes, same-JVM
  * interleaved (VotePassProbe pattern):
  *   - q05Shape at 10x with spark.graft.spread on/off — does the
  *     keyed spread still pay when the fact is 6M rows in ~3 real
  *     tasks?
  *   - q14Shape at 10x with spark.sql.join.preferSortMergeJoin
  *     true/false — SMJ (two sorts) vs shuffled-hash for the
  *     fact-to-orders join whose dims stay broadcast (guide §3.1).
  *
  * Usage: sbt "Test/runMain graft.tools.ScaleShapesProbe [relDir] [sfDir] [rounds]"
  */
object ScaleShapesProbe {
  def main(args: Array[String]): Unit = {
    val relDir = args.headOption.getOrElse("/tmp/graft_bench_scale_rel_sf0.1")
    val sfDir = args.drop(1).headOption.getOrElse("/root/testdata/sf0.1")
    val rounds = args.drop(2).headOption.map(_.toInt).getOrElse(4)
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
    val t = graft.Tables(spark, sfDir)
    val li10 = spark.read.parquet(s"$relDir/lineitem")
    val ord10 = spark.read.parquet(s"$relDir/orders")
    // warm page cache
    li10.write.format("noop").mode("overwrite").save()
    ord10.write.format("noop").mode("overwrite").save()

    def time(body: => Unit): Double = {
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
    }
    def med(xs: Seq[Double]): Double = xs.sorted.apply(xs.length / 2)

    def ab(label: String, key: String, a: String, b: String)(body: => Unit): Unit = {
      Seq(a, b).foreach { v => spark.conf.set(key, v); body } // warm both
      val ta = scala.collection.mutable.ArrayBuffer[Double]()
      val tb = scala.collection.mutable.ArrayBuffer[Double]()
      (1 to rounds).foreach { _ =>
        spark.conf.set(key, a); ta += time(body)
        spark.conf.set(key, b); tb += time(body)
      }
      spark.conf.unset(key)
      println(f"[scale] $label%-24s $a=${med(ta.toSeq)}%.2f $b=${med(tb.toSeq)}%.2f " +
        s"(raw $a=${ta.map(x => f"$x%.2f").mkString(",")} " +
        s"$b=${tb.map(x => f"$x%.2f").mkString(",")})")
    }

    ab("q05_10x spread", "spark.graft.spread", "false", "true") {
      graft.Bench.materialize(graft.queries.Relational.q05Shape(li10))
    }
    ab("q14_10x preferSMJ", "spark.sql.join.preferSortMergeJoin", "true", "false") {
      graft.Bench.materialize(graft.queries.Relational.q14Shape(
        li10, ord10, t.part, t.supplier))
    }
    ab("q14_1x preferSMJ", "spark.sql.join.preferSortMergeJoin", "true", "false") {
      graft.Bench.materialize(graft.queries.Relational.q14Shape(
        t.lineitem, t.orders, t.part, t.supplier))
    }
    ab("q02_1x preferSMJ", "spark.sql.join.preferSortMergeJoin", "true", "false") {
      graft.Bench.materialize(graft.SparkEntry.queries(
        "q02_revenue_by_priority")(spark, sfDir))
    }
    spark.stop()
  }
}
