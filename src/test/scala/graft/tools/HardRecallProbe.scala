package graft.tools

import org.apache.spark.sql.functions._

/** Throwaway measurement harness for IVF recall@k on a HARD corpus
  * (VERDICT r14 next-round #2): the bench's 1M scale corpus has 20
  * well-separated base patterns — IVF's best case, where every dial
  * measures recall 1.0000 (RecallProbe). This probe builds a 1M corpus
  * with NO cluster structure — i.i.d. uniform noise in [-1,1]^64, where
  * corpus vectors are near-orthogonal to every query and the true
  * top-k is decided by noise-level cosine differences spread across
  * centroid boundaries — plus PLANTED near-neighbors (5 per query at
  * perturbation eps=0.15, the near-dup regime a training pipeline
  * actually hunts), and measures ivfTopK recall@10 against brute-force
  * ground truth across nProbe x trained/sampled at the benched
  * nCentroids=64. Reported separately:
  *   - recall@10 on the full truth set (planted + noise-tail rows);
  *   - planted-only recall (of truth rows that ARE planted neighbors
  *     or the query itself, how many IVF returned) — the number that
  *     matters for dedup/retrieval use.
  * Numbers land in DEPLOY.md next to the best-case 1.0000 table. Not
  * part of the bench protocol (the bench keeps its gated recall row on
  * the standard corpus).
  *
  * Usage: sbt "Test/runMain graft.tools.HardRecallProbe [n]"
  */
object HardRecallProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.Tables.session()
    val n = args.headOption.map(_.toLong).getOrElse(1000000L)
    // n >= 1000 keeps qStride > plantsPerQuery: below that, "planted"
    // ids spill into neighboring queries' strides and the planted
    // classifier mislabels them (ProbeCorpora.hardCorpus also rejects
    // such a construction)
    require(n >= 1000, s"need n >= 1000 (one query per n/100 rows, 5 " +
      s"plants per stride), got $n")
    val dim = 64
    val qStride = n / 100 // 100 queries
    val plantsPerQuery = 5
    val eps = 0.15

    // corpus construction + planted classifier shared with the bench's
    // recall_hard gate (graft.tools.ProbeCorpora) so probe and gate can
    // never drift apart
    val vecs = graft.tools.ProbeCorpora.hardCorpus(spark, n, dim,
      qStride, plantsPerQuery, eps)
    val queries = vecs.filter(col("vec_id") % qStride === 0)
    val nQ = queries.count()

    val truthRows = graft.pipeline.Similarity
      .bruteForceTopK(vecs, queries, k = 10)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val truth = truthRows.toSet
    val planted = graft.tools.ProbeCorpora.isPlantedNeighbor(plantsPerQuery) _
    val truthPlanted = truthRows.filter { case (q, nb) => planted(q, nb) }.toSet
    println(s"[hardrecall] n=$n dim=$dim queries=$nQ eps=$eps " +
      s"truth=${truth.size} planted_in_truth=${truthPlanted.size} " +
      f"planted_frac=${truthPlanted.size.toDouble / truth.size}%.3f")

    val trained = graft.pipeline.Similarity.kmeansCentroids(vecs, 64)
    for (nProbe <- Seq(1, 2, 4, 8, 16); (tag, cents) <-
           Seq("trained" -> Some(trained), "sampled" -> None)) {
      val t0 = System.nanoTime()
      val got = graft.pipeline.Similarity.ivfTopK(
        vecs, queries, k = 10, nCentroids = 64, nProbe = nProbe,
        centroids = cents)
        .select("query_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1)))
      val recall = got.count(truth.contains) / truth.size.toDouble
      val plantedRecall = got.count(truthPlanted.contains) /
        truthPlanted.size.toDouble
      println(f"[hardrecall] quantizer=$tag nProbe=$nProbe " +
        f"recall@10=$recall%.4f planted_recall=$plantedRecall%.4f " +
        f"wall=${(System.nanoTime() - t0) / 1e9}%.1f")
    }
    spark.stop()
  }
}
