package graft.tools

import org.apache.spark.sql.functions._

/** Throwaway measurement harness for IVF recall@k at bench scale
  * (VERDICT r13 next-round #4): recall of `ivfTopK` against
  * `bruteForceTopK` ground truth on the 1M bench corpus, for the
  * trained and sampled quantizers across nProbe settings — the numbers
  * DEPLOY.md's nCentroids/nProbe guidance cites. Not part of the bench
  * protocol (the bench carries the single gated recall row).
  */
object RecallProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.Tables.session()
    val corpus = spark.read.parquet(
      args.headOption.getOrElse("/tmp/graft_bench_scale_1m"))
    val vecs = corpus.select(col("doc_id").as("vec_id"), col("embedding"))
    val n = vecs.count()
    val queries = vecs.filter(col("vec_id") % (n / 100) === 0)
    val truth = graft.pipeline.Similarity
      .bruteForceTopK(vecs, queries, k = 10)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    println(s"[recallprobe] n=$n queries=${queries.count()} truth=${truth.size}")
    val trained = graft.pipeline.Similarity.kmeansCentroids(vecs, 64)
    def recallOf(df: org.apache.spark.sql.DataFrame): Double =
      df.select("query_id", "neighbor_id").collect()
        .count(r => truth.contains((r.getLong(0), r.getLong(1)))) /
        truth.size.toDouble
    for (nProbe <- Seq(1, 2, 4, 8); (tag, cents) <-
           Seq("trained" -> Some(trained), "sampled" -> None)) {
      val t0 = System.nanoTime()
      val r = recallOf(graft.pipeline.Similarity.ivfTopK(
        vecs, queries, k = 10, nCentroids = 64, nProbe = nProbe,
        centroids = cents))
      println(f"[recallprobe] quantizer=$tag nProbe=$nProbe " +
        f"recall@10=$r%.4f wall=${(System.nanoTime() - t0) / 1e9}%.1f")
    }
    spark.stop()
  }
}
