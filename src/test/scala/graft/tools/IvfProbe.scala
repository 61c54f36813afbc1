package graft.tools

import org.apache.spark.sql.functions._

/** Throwaway measurement harness for the 10M IVF bench row's run-to-run
  * spread (VERDICT r10 next-round #4): N consecutive full runs, with
  * per-stage wall times (train / assign+lists / probe+rank) printed so a
  * moving stage is attributable. Not part of the bench protocol.
  */
object IvfProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.Tables.session()
    val runs = args.headOption.map(_.toInt).getOrElse(3)
    val corpus = spark.read.parquet("/tmp/graft_bench_scale_10m")
    val vecs = corpus.select(col("doc_id").as("vec_id"), col("embedding"))
    val queries = vecs.filter(col("vec_id") % 100000L === 0)
    def t[A](body: => A): (A, Double) = {
      val t0 = System.nanoTime(); val r = body
      (r, (System.nanoTime() - t0) / 1e9)
    }
    (1 to runs).foreach { i =>
      val ((cents, nQ), tTrain) = t {
        val c = graft.pipeline.Similarity.kmeansCentroids(vecs, 64)
        (c, queries.count())
      }
      val (n, tFull) = t {
        graft.pipeline.Similarity.ivfTopK(vecs, queries, k = 10,
          nCentroids = 64, nProbe = 4, centroids = Some(cents)).count()
      }
      println(f"[ivfprobe] run=$i train=$tTrain%.1f full=$tFull%.1f " +
        s"rows=$n queries=$nQ")
    }
    spark.stop()
  }
}
