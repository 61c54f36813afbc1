package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** A/B harness for the r18 single-pass langId vote: times the
  * pre-r18 11-traversal count shape (one `size(filter(toks,
  * lower(t).isin(...)))` per family), the r18 single-`aggregate`
  * shape, and the full langIdWithMargin column (p09's hot subtree) on
  * the sf0.1 documents corpus, interleaved in one JVM. Companion to
  * StripCostProbe (the r17 tr-strip A/B).
  *
  * Usage: sbt "Test/runMain graft.tools.VotePassProbe [sfDir] [rounds]"
  */
object VotePassProbe {
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

    val toks = TextAnalysis.tokens(col("text"))
    // A: 11 filter traversals (pre-r18 shape, the differential twin)
    val eleven = sum(element_at(
      TextAnalysis.langVoteCountsMultiPass(toks), 1))
    // B: one aggregate traversal (r18 shape)
    val one = sum(element_at(TextAnalysis.langVoteCounts(toks), 1))
    // C: the full langId column as p09 runs it
    val full = count(TextAnalysis.langIdWithMargin(col("text")))

    def time(label: String, c: org.apache.spark.sql.Column): Double = {
      val t0 = System.nanoTime()
      docs.select(c).collect()
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"  $label%-7s $dt%.3f s")
      dt
    }
    val acc = scala.collection.mutable.Map[String, List[Double]]()
      .withDefaultValue(Nil)
    (1 to rounds).foreach { r =>
      println(s"round $r")
      for ((l, c) <- Seq(("eleven", eleven), ("one", one), ("full", full)))
        acc(l) ::= time(l, c)
    }
    def med(xs: List[Double]) = xs.sorted.apply(xs.size / 2)
    println(f"medians: eleven=${med(acc("eleven"))}%.3f " +
      f"one=${med(acc("one"))}%.3f full=${med(acc("full"))}%.3f " +
      f"one_pass_delta=${med(acc("one")) - med(acc("eleven"))}%.3f")
    spark.stop()
  }
}
