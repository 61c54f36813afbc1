package graft.tools

import org.apache.spark.sql.functions._

/** Measurement harness for VERDICT r13 next-round #3: would a
  * pre-shuffle singleton-bucket filter pay for itself on the staged
  * minhash pairs path? At 10M docs the pairs stage is ~entirely one
  * 160M-row band shuffle+sort, yet >99.8% of shuffled rows are
  * singletons (their (band_idx, band_hash) bucket has one member) —
  * no pair can come from them.
  *
  * Prototype: a SUPERSET-exact "seen at least twice" filter with
  * bounded memory — per-partition bitmap pairs (`seen` = cells hit,
  * `dup` = cells hit twice locally), merged with a carry-save
  * accumulator so a cell set in >=2 partitions' `seen` maps (or any
  * `dup`) marks a potential duplicate. False positives only (bitmap
  * collisions pass extra singletons through; the run scan drops them),
  * NO false negatives (a real duplicate always hits the same cell
  * twice). The filtered path then re-scans the signature relation and
  * shuffles only surviving band rows.
  *
  * Run: `sbt "Test/runMain graft.tools.PrefilterProbe [mBits]"`.
  */
object PrefilterProbe {
  /** Mix (band_hash, band_idx) into a bitmap cell index. The multiply-
    * xor finalizer spreads the already-uniform xxhash64 band hash so
    * truncation to log2m bits stays uniform. */
  def cell(bandHash: Long, bandIdx: Int, log2m: Int): Int = {
    var h = bandHash ^ (bandIdx.toLong * 0x9E3779B97F4A7C15L)
    h ^= (h >>> 33); h *= 0xFF51AFD7ED558CCDL; h ^= (h >>> 33)
    (h >>> (64 - log2m)).toInt
  }

  def main(args: Array[String]): Unit = {
    val log2m = args.headOption.map(_.toInt).getOrElse(30) // 2^30 cells = 128 MB/bitmap
    val buildParts = args.lift(1).map(_.toInt).getOrElse(8)
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master(s"local[${Runtime.getRuntime.availableProcessors}]")
      .config("spark.sql.shuffle.partitions",
        Runtime.getRuntime.availableProcessors.toString)
      .config("spark.sql.files.maxPartitionBytes", "4194304")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      // the sketch reduce ships buildParts × 2 × (2^log2m / 8) bytes of
      // task results — already past the 1g default at 10M docs, itself
      // a data point for the scale verdict
      .config("spark.driver.maxResultSize", "8g")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def t[A](label: String)(body: => A): A = {
      val t0 = System.nanoTime(); val r = body
      println(f"[prefilter] $label ${(System.nanoTime() - t0) / 1e9}%.1f s"); r
    }
    def rm(p: String): Unit = {
      val d = new java.io.File(p)
      if (d.exists) { d.listFiles.foreach(_.delete()); d.delete() }
    }

    val docs = spark.read.parquet("/tmp/graft_bench_scale_10m")
      .select("doc_id", "text")
    val sigDir = "/tmp/graft_prefilter_sigs"
    if (!new java.io.File(sigDir).exists())
      t("sig_write") {
        graft.pipeline.Dedup.writeSignatures(
          graft.pipeline.Dedup.minhashSignatures(docs, "text", "doc_id", 3, 64),
          sigDir)
      }
    val sigs = spark.read.parquet(sigDir)
    def bands = graft.pipeline.Dedup.lshBands(sigs, "_sig", 16, 4)

    // ---- baseline: the current sorted-run path, pairs only ----
    val baseDir = "/tmp/graft_prefilter_base"
    rm(baseDir)
    t("baseline_pairs") {
      graft.pipeline.Dedup.pairsFromBandsSorted(bands, "doc_id",
        org.apache.spark.sql.types.LongType, Some(500))
        .distinct().write.parquet(baseDir)
    }
    println(s"[prefilter] baseline_rows ${spark.read.parquet(baseDir).count()}")

    // ---- prototype: bitmap build + merge + filtered sorted-run ----
    val filtDir = "/tmp/graft_prefilter_filt"
    rm(filtDir)
    val words = 1 << (log2m - 6)
    t("prefiltered_pairs_total") {
      val dupBitmap = t("  bitmap_build+merge") {
        // fewer, fatter partitions for the bitmap pass: each task holds
        // two 2^log2m-bit arrays, so 8 concurrent tasks bound transient
        // memory at 8 × 2 × (m/8) bytes
        val perPart = bands
          .select(col("band_idx"), col("band_hash")).coalesce(buildParts)
          .as[(Int, Long)].rdd.mapPartitions { it =>
            val seen = new Array[Long](words)
            val dup = new Array[Long](words)
            it.foreach { case (idx, h) =>
              val c = cell(h, idx, log2m)
              val w = c >>> 6; val bit = 1L << (c & 63)
              if ((seen(w) & bit) != 0L) dup(w) |= bit else seen(w) |= bit
            }
            Iterator.single((seen, dup))
          }
        // carry-save merge via rdd.reduce: partitions build in ONE
        // parallel job (toLocalIterator would run them as sequential
        // single-partition jobs — measured 4.5x slower than the scan
        // itself); merges fold (ones, twice) pairs associatively
        val (_, twice) = perPart
          .reduce { case ((onesA, twiceA), (onesB, twiceB)) =>
            var w = 0
            while (w < words) {
              twiceA(w) |= twiceB(w) | (onesA(w) & onesB(w))
              onesA(w) |= onesB(w)
              w += 1
            }
            (onesA, twiceA)
          }
        twice
      }
      val bc = spark.sparkContext.broadcast(dupBitmap)
      val keep = udf { (idx: Int, h: Long) =>
        val c = cell(h, idx, log2m)
        (bc.value(c >>> 6) & (1L << (c & 63))) != 0L
      }
      val filtered = bands.filter(keep(col("band_idx"), col("band_hash")))
      t("  filtered_sorted_pairs") {
        graft.pipeline.Dedup.pairsFromBandsSorted(filtered, "doc_id",
          org.apache.spark.sql.types.LongType, Some(500))
          .distinct().write.parquet(filtDir)
      }
      val survivors = filtered.count()
      println(s"[prefilter] band_rows_surviving $survivors")
    }

    // bit-identical pair sets (the whole point: superset filter + run
    // scan must lose nothing)
    val a = spark.read.parquet(baseDir)
    val b = spark.read.parquet(filtDir)
    val onlyA = a.except(b).count(); val onlyB = b.except(a).count()
    println(s"[prefilter] pairs_base=${a.count()} pairs_filt=${b.count()} " +
      s"only_base=$onlyA only_filt=$onlyB")
    assert(onlyA == 0 && onlyB == 0, "PAIR SETS DIVERGED")
    rm(baseDir); rm(filtDir)
    spark.stop()
  }
}
