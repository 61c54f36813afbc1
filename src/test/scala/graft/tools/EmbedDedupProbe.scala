package graft.tools

import org.apache.spark.sql.functions._

/** Throwaway measurement harness for embedding near-dup AT SCALE: the
  * other dedup paths carry measured 10M wall-times (minhash staged
  * ~26-42 s, cluster formation ~2-4 s, IVF ~10-13 s) but
  * `Dedup.embeddingNearDup` — now CLI-reachable via
  * `dedup --method embedding` — had scale evidence only by argument
  * (same one-shuffle bucket-grouped shape). This probe measures the
  * full verb composition (pairs → clusterPairs → dropNearDuplicates
  * count) on an n-vector corpus of i.i.d. uniform noise with one
  * planted near-duplicate per 1,000 vectors (eps=0.15 → cosine ≈ 0.99,
  * comfortably over the 0.95 threshold), planes sized by the DEPLOY
  * rule planes ≈ log2(n / targetBucket) with targetBucket = 500.
  * Numbers land in COVERAGE/DEPLOY next to the sibling operators'.
  *
  * Usage: sbt "Test/runMain graft.tools.EmbedDedupProbe [n] [bands]"
  * A third arg `staged` measures the r16 staged path instead: one-time
  * embeddingBuckets write, then per-sweep pairs-from-staged cost at two
  * thresholds vs the live path's two full recomputations — the
  * staged-vs-live 10M point DEPLOY cites.
  */
object EmbedDedupProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.Tables.session()
    val n = args.headOption.map(_.toLong).getOrElse(10000000L)
    val bands = args.lift(1).map(_.toInt).getOrElse(1)
    val dim = 64
    val planes = math.ceil(math.log(n / 500.0) / math.log(2)).toInt
    val eps = 0.15

    def u(seed: org.apache.spark.sql.Column, j: org.apache.spark.sql.Column) =
      (pmod(xxhash64(seed * 64L + j), lit(2000001L)) - 1000000L)
        .cast("double") / 1000000.0
    // ids with id % 1000 == 1 perturb the previous id's vector: one
    // planted near-dup pair per 1,000 vectors (n/1000 true pairs)
    val isPlanted = col("id") % 1000L === 1L
    val base = when(isPlanted, col("id") - 1).otherwise(col("id"))
    val emb = transform(sequence(lit(0), lit(dim - 1)), j =>
      (u(base, j) +
        when(isPlanted, u(col("id"), j) * eps).otherwise(lit(0.0)))
        .cast("float"))
    val vecs = spark.range(n)
      .select(col("id").as("vec_id"), emb.as("embedding"))
      .localCheckpoint() // generation excluded from the operator timing
    println(s"[embdedup] n=$n dim=$dim planes=$planes bands=$bands " +
      s"eps=$eps expected_pairs~${n / 1000}")

    def timed[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[embdedup] $label wall=${(System.nanoTime() - t0) / 1e9}%.1f")
      r
    }
    if (args.lift(2).contains("staged")) {
      val dir = s"/tmp/graft_embprobe_staged_$n"
      val fs = new org.apache.hadoop.fs.Path(dir)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.delete(new org.apache.hadoop.fs.Path(dir), true)
      timed("stage(write buckets)") {
        graft.pipeline.Dedup.writeSignatures(
          graft.pipeline.Dedup.embeddingBuckets(
            vecs, planes = planes, dim = dim, bands = bands), dir)
      }
      val staged = spark.read.parquet(dir)
      // one threshold at 10M (each pairs run is ~3 min there — the
      // two-threshold sweep is the 1M measurement); two at smaller n
      val thresholds = if (n >= 5000000L) Seq(0.95) else Seq(0.95, 0.97)
      for (t <- thresholds) {
        val nS = timed(s"staged pairs(count) t=$t") {
          graft.pipeline.Dedup.embeddingNearDupFromBuckets(staged, t,
            maxBucketSize = Some(2000)).count()
        }
        val nL = timed(s"live pairs(count) t=$t") {
          graft.pipeline.Dedup.embeddingNearDup(vecs, t, planes = planes,
            dim = dim, maxBucketSize = Some(2000), bands = bands).count()
        }
        assert(nS == nL, s"staged/live diverged at t=$t: $nS vs $nL")
        println(s"[embdedup] t=$t pairs=$nS (staged == live)")
      }
      spark.stop()
      return
    }
    val pairs = graft.pipeline.Dedup.embeddingNearDup(
      vecs, threshold = 0.95, planes = planes, dim = dim,
      maxBucketSize = Some(2000), bands = bands)
    val nPairs = timed("pairs(count)") { pairs.count() }
    println(s"[embdedup] pairs=$nPairs recall_of_planted~=" +
      f"${nPairs.toDouble / (n / 1000)}%.3f (sign-bucket misses + " +
      "noise-coincidence pairs move this off 1.0)")
    val cl = timed("clusterPairs") {
      graft.pipeline.Dedup.clusterPairs(pairs)
    }
    val kept = timed("dropNearDuplicates(count)") {
      graft.pipeline.Dedup.dropNearDuplicates(vecs, cl, "vec_id").count()
    }
    println(s"[embdedup] kept=$kept dropped=${n - kept}")
    spark.stop()
  }
}
