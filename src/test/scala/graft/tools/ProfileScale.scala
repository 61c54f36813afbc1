package graft.tools

import org.apache.spark.sql.functions._

/** Scratch driver for the bench's pipeline scale-stress rows. Not a test. */
object ProfileScale {
  def main(args: Array[String]): Unit = {
    val spark = graft.Tables.session()
    spark.sparkContext.setLogLevel("WARN")
    def time(body: => Unit): Double = {
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
    }
    def scaleCorpus(n: Long, dir: String): Unit = {
      if (java.nio.file.Files.exists(java.nio.file.Paths.get(dir))) return
      val vocab = 50000
      val hot = 2000L
      val baseId = col("id") - when(col("id") % 50 === 1, 1).otherwise(0)
      def word(seed: org.apache.spark.sql.Column,
               j: org.apache.spark.sql.Column) =
        concat(lit("w"), pmod(xxhash64(seed * 1000003L + j), lit(vocab)))
      val text = when(col("id") < hot,
        lit((0 until 12).map(j => s"hot$j").mkString(" ")))
        .otherwise(concat_ws(" ",
          concat_ws(" ", transform(sequence(lit(0), lit(10)),
            j => word(baseId, j))),
          word(col("id"), lit(11))))
      val emb = transform(sequence(lit(0), lit(63)), j =>
        ((pmod(xxhash64((col("id") % 20) * 64L + j), lit(2001)) - 1000L)
          .cast("double") / 1000.0 +
         (pmod(xxhash64(col("id") * 64L + j), lit(2001)) - 1000L)
           .cast("double") / 10000.0).cast("float"))
      spark.range(n)
        .select(col("id").as("doc_id"), text.as("text"), emb.as("embedding"))
        .write.parquet(dir)
    }
    val sizes = Seq(("100k", 100000L), ("1m", 1000000L))
    sizes.foreach { case (label, n) => scaleCorpus(n, s"/tmp/graft_bench_scale_$label") }
    sizes.foreach { case (label, n) =>
      val corpus = spark.read.parquet(s"/tmp/graft_bench_scale_$label")
      val docs = corpus.select("doc_id", "text")
      val vecs = corpus.select(col("doc_id").as("vec_id"), col("embedding"))
      val queries = vecs.filter(col("vec_id") % (n / 100) === 0)
      def pairs() = graft.pipeline.Dedup.minhashCandidatePairs(
        docs, maxBucketSize = Some(500))
      val t1 = time {
        val nP = pairs().count()
        println(s"[$label] pairs=$nP")
        assert(nP < 500000, s"skew cap failed: $nP")
      }
      println(f"[$label] minhash_pairs: $t1%.1f s")
      val t2 = time {
        val nc = graft.pipeline.Dedup.clusterPairs(pairs()).count()
        println(s"[$label] clustered=$nc")
        assert(nc > 0)
      }
      println(f"[$label] dedup_cluster: $t2%.1f s")
      val t3 = time {
        val cents = graft.pipeline.Similarity.kmeansCentroids(vecs, 64)
        val nT = graft.pipeline.Similarity.ivfTopK(vecs, queries, k = 10,
          nCentroids = 64, nProbe = 4, centroids = Some(cents)).count()
        println(s"[$label] topk=$nT queries=${queries.count()}")
        assert(nT >= queries.count() * 10)
      }
      println(f"[$label] ivf_topk: $t3%.1f s")
    }
    spark.stop()
  }
}
