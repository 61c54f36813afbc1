package graft.tools

import org.apache.spark.sql.functions._

/** One-off measurement harness for the 10M-doc minhash pairs row
  * (not a test): times the pipeline stages independently against the
  * bench corpus so re-execution overhead is visible. Run via
  * `sbt "Test/runMain graft.tools.MinhashProbe [staged|full]"`.
  */
object MinhashProbe {
  def main(args: Array[String]): Unit = {
    val mode = args.headOption.getOrElse("staged")
    // mirror Bench's session exactly (4 MB splits, AQE, 32 shuffle
    // partitions) so the measurement predicts the gated bench row
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master(s"local[${Runtime.getRuntime.availableProcessors}]")
      .config("spark.sql.shuffle.partitions",
        Runtime.getRuntime.availableProcessors.toString)
      .config("spark.sql.files.maxPartitionBytes", "4194304")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet("/tmp/graft_bench_scale_10m")
      .select("doc_id", "text")
    def t[A](label: String)(body: => A): A = {
      val t0 = System.nanoTime(); val r = body
      println(f"[mh] $label ${(System.nanoTime() - t0) / 1e9}%.1f s"); r
    }
    def rm(p: String): Unit = {
      val d = new java.io.File(p)
      if (d.exists) { d.listFiles.foreach(_.delete()); d.delete() }
    }
    mode match {
      case "plan" =>
        val small = spark.read.parquet("/tmp/graft_bench_scale_100k")
          .select("doc_id", "text")
        val df = graft.pipeline.Dedup.minhashCandidatePairs(
          small, maxBucketSize = Some(500))
        df.agg(count(lit(1))).head()
        val ex = df.queryExecution.executedPlan.toString
        val reused = "ReusedExchange".r.findAllIn(ex).length
        val scans = "Scan parquet".r.findAllIn(ex).length
        val aggs = "HashAggregate".r.findAllIn(ex).length
        println(s"[mh] plan reusedExchange=$reused parquetScans=$scans hashAggs=$aggs")
        println(ex.linesIterator.filter(l =>
          l.contains("Exchange") || l.contains("Scan parquet") ||
          l.contains("Join")).mkString("\n"))
      case "ab" =>
        // interleaved lazy-vs-staged at 1M in ONE JVM: the host has
        // multi-minute stall windows, so only adjacent same-process
        // samples are comparable
        val d1m = spark.read.parquet("/tmp/graft_bench_scale_1m")
          .select("doc_id", "text")
        val sigDir = "/tmp/graft_probe_ab_sigs"
        val pairDir = "/tmp/graft_probe_ab_pairs"
        (1 to 3).foreach { rep =>
          rm(pairDir)
          t(s"lazy_$rep") {
            graft.pipeline.Dedup.minhashCandidatePairs(
              d1m, maxBucketSize = Some(500)).write.parquet(pairDir)
          }
          rm(sigDir); rm(pairDir)
          t(s"staged_$rep") {
            graft.pipeline.Dedup.writeSignatures(
              graft.pipeline.Dedup.minhashSignatures(d1m, "text", "doc_id", 3, 64),
              sigDir)
            graft.pipeline.Dedup.minhashCandidatePairsFromSignatures(
              spark.read.parquet(sigDir), maxBucketSize = Some(500))
              .write.parquet(pairDir)
          }
          rm(sigDir); rm(pairDir)
        }
      case "stages" =>
        // stage-level split of the staged 10M pairs path: bucket
        // grouping+pair-gen vs distinct vs est-jaccard verification
        val sigDir = "/tmp/graft_probe_sigs"
        rm(sigDir)
        t("sig_write") {
          graft.pipeline.Dedup.writeSignatures(
            graft.pipeline.Dedup.minhashSignatures(docs, "text", "doc_id", 3, 64),
            sigDir)
        }
        val sigs = spark.read.parquet(sigDir)
        val bandsAll = graft.pipeline.Dedup.lshBands(sigs, "_sig", 16, 4)
        val buckets = bandsAll.groupBy(col("band_idx"), col("band_hash"))
          .agg(sort_array(collect_list(col("doc_id"))).as("_ids"))
          .filter(size(col("_ids")).between(2, 500))
        val nn = size(col("_ids"))
        val rawPairs = buckets
          .select(explode(flatten(transform(col("_ids"), (a, i) =>
            transform(slice(col("_ids"), i + lit(2), nn - i - lit(1)),
              b => struct(a.as("id_a"), b.as("id_b")))))).as("_p"))
          .select(col("_p.id_a"), col("_p.id_b"))
        // materialize the raw pairs so distinct_write times ONLY
        // distinct+write — a lazy rawPairs would re-execute the whole
        // bucket/pair-gen upstream inside the next timer and
        // double-charge it
        val rawDir = "/tmp/graft_probe_rawpairs"
        rm(rawDir)
        t("bucket_pairgen") {
          rawPairs.write.parquet(rawDir)
          println(s"[mh] raw_pairs ${spark.read.parquet(rawDir).count()}")
        }
        val pairDir = "/tmp/graft_probe_pairs"
        rm(pairDir)
        t("distinct_write") {
          spark.read.parquet(rawDir).distinct().write.parquet(pairDir)
        }
        rm(rawDir)
        val pairs = spark.read.parquet(pairDir)
        val sigA = sigs.select(col("doc_id").as("id_a"), col("_sig").as("sig_a"))
        val sigB = sigs.select(col("doc_id").as("id_b"), col("_sig").as("sig_b"))
        t("verify_join") {
          pairs.join(sigA, "id_a").join(sigB, "id_b")
            .withColumn("est_jaccard",
              size(filter(zip_with(col("sig_a"), col("sig_b"),
                (a, b) => a === b), x => x)).cast("double") / size(col("sig_a")))
            .agg(count(lit(1))).head()
        }
        rm(sigDir); rm(pairDir)
      case "staged3" =>
        // three back-to-back staged runs in one JVM, each bracketed by
        // the same fixed-work parallel CPU probe Bench uses — min over
        // probe-clean repeats is the honest statistic on this host
        def spin(seed: Long): Long = {
          var x = 0x9E3779B97F4A7C15L ^ seed
          var i = 0
          while (i < 300000000) { x ^= x << 13; x ^= x >>> 7; x ^= x << 17; i += 1 }
          x
        }
        def probe(): Double = {
          val t0 = System.nanoTime()
          val cores = Runtime.getRuntime.availableProcessors()
          val sink = new java.util.concurrent.atomic.AtomicLong()
          val ths = (0 until cores).map { i =>
            val th = new Thread(() => { sink.addAndGet(spin(i.toLong)); () })
            th.start(); th
          }
          ths.foreach(_.join())
          (System.nanoTime() - t0) / 1e9
        }
        (1 to 3).foreach { rep =>
          val sigDir = "/tmp/graft_probe_sigs"
          val pairDir = "/tmp/graft_probe_pairs"
          rm(sigDir); rm(pairDir)
          println(f"[mh] probe_pre_$rep ${probe()}%.2f")
          t(s"staged_total_$rep") {
            graft.pipeline.Dedup.writeSignatures(
              graft.pipeline.Dedup.minhashSignatures(docs, "text", "doc_id", 3, 64),
              sigDir)
            graft.pipeline.Dedup.minhashCandidatePairsFromSignatures(
              spark.read.parquet(sigDir), maxBucketSize = Some(500))
              .write.parquet(pairDir)
          }
          println(f"[mh] probe_post_$rep ${probe()}%.2f")
          rm(sigDir); rm(pairDir)
        }
      case "sorted_stages" =>
        // decompose the sorted-run pairs path: band row production vs
        // shuffle+sort vs the streaming pair scan vs the grouped twin
        val sigDir = "/tmp/graft_probe_sigs"
        if (!new java.io.File(sigDir).exists())
          t("sig_write") {
            graft.pipeline.Dedup.writeSignatures(
              graft.pipeline.Dedup.minhashSignatures(docs, "text", "doc_id", 3, 64),
              sigDir)
          }
        val sigs = spark.read.parquet(sigDir)
        t("sig_scan") { sigs.write.format("noop").mode("overwrite").save() }
        val bands = graft.pipeline.Dedup.lshBands(
          sigs.filter(col("doc_id").isNotNull && col("_sig").isNotNull),
          "_sig", 16, 4, "doc_id")
        t("bands_noop") { bands.write.format("noop").mode("overwrite").save() }
        val sorted = bands
          .select(col("band_idx").cast("int").as("band_idx"), col("band_hash"),
            col("doc_id").cast("long").as("_id"))
          // hash-first sort key, exactly as pairsFromBandsSorted orders it
          // (idx-first would defeat the 8-byte radix prefix and measure a
          // sort shape the production path never runs)
          .repartition(col("band_idx"), col("band_hash"))
          .sortWithinPartitions(col("band_hash"), col("band_idx"), col("_id"))
        t("bands_shuffle_sort_noop") {
          sorted.write.format("noop").mode("overwrite").save()
        }
        t("sorted_pairs_noop") {
          graft.pipeline.Dedup.pairsFromBandsSorted(bands, "doc_id",
            org.apache.spark.sql.types.LongType, Some(500))
            .write.format("noop").mode("overwrite").save()
        }
        t("grouped_pairs_noop") {
          graft.pipeline.Dedup.pairsFromBandsGrouped(bands, "doc_id",
            Some(500)).write.format("noop").mode("overwrite").save()
        }
      case "full" =>
        t("pairs_full") {
          graft.pipeline.Dedup.minhashCandidatePairs(docs,
            maxBucketSize = Some(500)).agg(count(lit(1))).head()
        }
      case _ =>
        val sigDir = "/tmp/graft_probe_sigs"
        val pairDir = "/tmp/graft_probe_pairs"
        rm(sigDir); rm(pairDir)
        t("staged_total") {
          t("sig_write") {
            graft.pipeline.Dedup.writeSignatures(
              graft.pipeline.Dedup.minhashSignatures(docs, "text", "doc_id", 3, 64),
              sigDir)
          }
          t("pairs_write") {
            graft.pipeline.Dedup.minhashCandidatePairsFromSignatures(
              spark.read.parquet(sigDir), maxBucketSize = Some(500))
              .write.parquet(pairDir)
          }
        }
        println(s"[mh] pairs_n ${spark.read.parquet(pairDir).count()}")
        rm(sigDir); rm(pairDir)
    }
    spark.stop()
  }
}
