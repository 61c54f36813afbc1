package graft.tools

import org.apache.spark.sql.functions._

/** One-off stage split of minhash signature computation at 10M docs:
  * tokenize vs HOF shingling vs hashing vs the parquet write. Run via
  * `sbt "Test/runMain graft.tools.SigProfile"`. */
object SigProfile {
  def main(args: Array[String]): Unit = {
    val spark = graft.Tables.session()
    def t[A](label: String)(body: => A): A = {
      val t0 = System.nanoTime(); val r = body
      println(f"[sp] $label ${(System.nanoTime() - t0) / 1e9}%.1f s"); r
    }
    val docs = spark.read.parquet("/tmp/graft_bench_scale_10m")
      .select("doc_id", "text")
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    t("read_only")(noop(docs))
    t("tokens")(noop(docs.select(col("doc_id"),
      graft.pipeline.TextAnalysis.tokens(col("text")).as("t"))))
    t("shingles")(noop(docs.select(col("doc_id"),
      graft.pipeline.TextAnalysis.wordShingles(
        graft.pipeline.TextAnalysis.tokens(col("text")), 3).as("s"))))
    t("signatures_noop")(noop(
      graft.pipeline.Dedup.minhashSignatures(docs, "text", "doc_id", 3, 64)))
    val dir = "/tmp/graft_sp_sigs"
    def rm(p: java.io.File): Unit = {
      if (p.isDirectory) p.listFiles.foreach(rm); p.delete(); ()
    }
    rm(new java.io.File(dir))
    t("signatures_parquet")(graft.pipeline.Dedup.writeSignatures(
      graft.pipeline.Dedup.minhashSignatures(docs, "text", "doc_id", 3, 64),
      dir))
    spark.stop()
  }
}
