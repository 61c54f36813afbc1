package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway A/B harness for the r17 tr-casing fix: isolates the cost
  * of the per-token combining-dot strip (`translate(lower(t), "̇",
  * "")`) against the plain `lower(t)` stopword count on the sf0.1
  * documents corpus, interleaved in one JVM. Run when a p09 bench
  * drift needs to be split into "strip cost" vs "session drift".
  *
  * Usage: sbt "Test/runMain graft.tools.StripCostProbe [sfDir] [rounds]"
  */
object StripCostProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val rounds = args.drop(1).headOption.map(_.toInt).getOrElse(6)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.pipeline.TextAnalysis

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("text")).cache()
    println(s"docs: ${docs.count()}")

    val stops = TextAnalysis.TrStopwords
    val toks = TextAnalysis.tokens(col("text"))
    // A: plain lower (the pre-r17 tr count shape)
    val plain = sum(size(filter(toks, t => lower(t).isin(stops: _*))))
    // B: strip the combining dot after lowering (the r17 shape)
    val strip = sum(size(filter(toks, t =>
      translate(lower(t), "̇", "").isin(stops: _*))))
    // C: the full 11-family vote, current code (p09's hot subtree)
    val full = count(TextAnalysis.langIdWithMargin(col("text")))

    def time(label: String, c: org.apache.spark.sql.Column): Double = {
      val t0 = System.nanoTime()
      docs.select(c).collect()
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"  $label%-6s $dt%.3f s")
      dt
    }
    val acc = scala.collection.mutable.Map[String, List[Double]]()
      .withDefaultValue(Nil)
    (1 to rounds).foreach { r =>
      println(s"round $r")
      for ((l, c) <- Seq(("plain", plain), ("strip", strip), ("full", full)))
        acc(l) ::= time(l, c)
    }
    def med(xs: List[Double]) = xs.sorted.apply(xs.size / 2)
    println(f"medians: plain=${med(acc("plain"))}%.3f " +
      f"strip=${med(acc("strip"))}%.3f full=${med(acc("full"))}%.3f " +
      f"strip_delta=${med(acc("strip")) - med(acc("plain"))}%.3f")
    spark.stop()
  }
}
