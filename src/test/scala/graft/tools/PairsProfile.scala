package graft.tools

import org.apache.spark.sql.functions._

/** One-off stage profile of the minhash PAIRS stage at 10M docs (the
  * post-signature part of the staged bench row): how much of it is the
  * band shuffle + bucket grouping vs the two est_jaccard verification
  * joins back into the signature relation. Not part of the bench
  * protocol; run via `sbt "Test/runMain graft.tools.PairsProfile"`. */
object PairsProfile {
  def main(args: Array[String]): Unit = {
    val spark = graft.Tables.session()
    def t[A](label: String)(body: => A): A = {
      val t0 = System.nanoTime(); val r = body
      println(f"[pp] $label ${(System.nanoTime() - t0) / 1e9}%.1f s"); r
    }
    val sigDir = "/tmp/graft_pp_sigs"
    if (!new java.io.File(sigDir).exists()) {
      val docs = spark.read.parquet("/tmp/graft_bench_scale_10m")
        .select("doc_id", "text")
      t("sig_write")(graft.pipeline.Dedup.writeSignatures(
        graft.pipeline.Dedup.minhashSignatures(docs, "text", "doc_id", 3, 64),
        sigDir))
    }
    val sigs = spark.read.parquet(sigDir)
    t("sig_scan_only")(sigs.agg(count(lit(1))).head())
    // bands + buckets + raw pairs, NO jaccard verification
    val bandsOnly = t("bands_buckets_pairs") {
      val bands = graft.pipeline.Dedup.lshBands(
        sigs.filter(col("doc_id").isNotNull && col("_sig").isNotNull),
        "_sig", 16, 4, "doc_id")
      val buckets = bands.groupBy(col("band_idx"), col("band_hash"))
        .agg(sort_array(collect_list(col("doc_id"))).as("_ids"))
        .filter(size(col("_ids")).between(2, 500))
      val n = size(col("_ids"))
      buckets
        .select(explode(flatten(transform(col("_ids"), (a, i) =>
          transform(slice(col("_ids"), i + lit(2), n - i - lit(1)),
            b => struct(a.as("id_a"), b.as("id_b")))))).as("_p"))
        .select(col("_p.id_a"), col("_p.id_b")).distinct()
        .count()
    }
    println(s"[pp] raw pairs = $bandsOnly")
    // the full path (bands + buckets + pairs + 2 jaccard joins)
    val full = t("full_pairs") {
      graft.pipeline.Dedup.minhashCandidatePairsFromSignatures(
        sigs, maxBucketSize = Some(500)).count()
    }
    println(s"[pp] full pairs = $full")
    spark.stop()
  }
}
