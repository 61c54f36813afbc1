package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.MapType

/** Driver-run benchmark: headline queries on SPARK_GRAFT_SF_DIR plus the
  * VCF parsing-throughput benchmarks that correspond to BASELINE.md's
  * published numbers. Prints ONE JSON line:
  * {"metric":"total","value":N,"unit":"sec","queries":{...},"sf":...}.
  *
  * Measurement honesty (the round-2 verdict's gate):
  *
  *   - Every timed query is FULLY MATERIALIZED: `count()` lets Catalyst
  *     prune everything the count doesn't need (the INFO-map build, CSQ/ANN
  *     extraction and the normalize UDF all vanished from the round-2 parse
  *     plans), so timings here hash every output column of every row
  *     (`xxhash64(struct(*))`, maps via `to_json`) — the same work the
  *     reference's 106K var/s figure pays when it builds VariantRecords.
  *   - Timing-sensitive metrics run FIVE INTERLEAVED ROUNDS (A B C, A B C,
  *     … — not AAA BBB CCC): this host shows sporadic multi-core stalls
  *     (observed 40x wall variance: the same materialized 1M-variant parse
  *     measured 165.6s and then 3.8s back-to-back), and repeats of one
  *     metric can land entirely inside a single stall window. The reported
  *     value is the per-metric median across rounds, which survives two
  *     stalled rounds out of five.
  *   - ALL raw per-run times are emitted under "raw", plus a fixed-work
  *     single-thread CPU probe ("cpu_probe" — 3e8 xorshift64 steps) timed
  *     once per round: if the host stalls, the probe shows it in the
  *     artifact itself.
  */
object Bench {

  /** Force full evaluation of every output column: hash each row's columns
    * (MapType via to_json — hash() on maps is disallowed/order-unstable)
    * and reduce to one driver-side long. Nothing prunable remains. */
  def materialize(df: DataFrame): Unit = {
    val cols = df.schema.fields.map { f =>
      if (f.dataType.isInstanceOf[MapType]) to_json(col(f.name)) else col(f.name)
    }
    df.select(xxhash64(struct(cols: _*)).as("_h")).agg(sum("_h")).collect()
    ()
  }

  /** Fixed-work single-thread probe (~0.3s unstalled): xorshift64 steps,
    * result consumed so the loop can't be dead-code-eliminated. */
  private def cpuProbe(): Long = {
    var x = 0x9E3779B97F4A7C15L
    var i = 0
    while (i < 300000000) { x ^= x << 13; x ^= x >>> 7; x ^= x << 17; i += 1 }
    x
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      // single-file synthetic VCFs are ~115 MB: the default 128 MB split
      // size gives a ONE-partition (single-core) scan. 8 MB splits spread
      // the parse across cores — the local analogue of the many-file
      // parallelism a real cohort has at scale.
      .config("spark.sql.files.maxPartitionBytes", "8388608")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time(body: => Unit): Double = {
      val t0 = System.nanoTime()
      body
      (System.nanoTime() - t0) / 1e9
    }

    // Pre-touch a file into page cache so the first timed run doesn't pay
    // cold-disk I/O that the later runs don't.
    def preTouch(path: String): Unit = {
      val in = new java.io.FileInputStream(path)
      val buf = new Array[Byte](1 << 20)
      try { while (in.read(buf) > 0) () } finally in.close()
    }

    val raw = scala.collection.mutable.LinkedHashMap[String, scala.collection.mutable.ArrayBuffer[Double]]()
    def record(name: String, t: Double): Unit =
      raw.getOrElseUpdate(name, scala.collection.mutable.ArrayBuffer[Double]()) += t
    def median(name: String): Double = {
      val ts = raw(name).sorted
      ts(ts.length / 2)
    }

    val results = scala.collection.mutable.LinkedHashMap[String, Double]()

    // ---- headline set: sf-scaled relational + pipeline queries ----
    val headline =
      (graft.queries.Relational.queries.keys ++ graft.queries.Pipeline.queries.keys)
        .toSeq.sorted

    // Warm the JVM/codegen paths once so first-query JIT cost doesn't
    // pollute the measurements.
    materialize(SparkEntry.queries("q01_pricing_summary")(spark, sfDir))

    headline.foreach { name =>
      val fn = SparkEntry.queries(name)
      results(name) =
        try {
          val t = time(materialize(fn(spark, sfDir)))
          record(name, t); t
        } catch { case _: Throwable => -1.0 }
    }
    // A5 scale path: the batch-summary percentile via approx_percentile
    // (t-digest, bounded memory) instead of the oracle-parity exact form —
    // the shape q07 would run at 100x (SampleQc.batchSummary(approxMedian)).
    results("q07_percentile_approx") = try {
      val t = time {
        val ev = Tables(spark, sfDir).events
        materialize(ev.groupBy(col("event_type")).agg(
          expr("approx_percentile(value, 0.5, 10000)").as("p50"),
          expr("approx_percentile(value, 0.95, 10000)").as("p95"),
          count(lit(1)).as("n")))
      }
      record("q07_percentile_approx", t); t
    } catch { case _: Throwable => -1.0 }

    // ---- VCF parse + latency metrics: interleaved rounds ----
    val vcfPath = "/tmp/graft_bench_100k.vcf"
    if (!java.nio.file.Files.exists(java.nio.file.Paths.get(vcfPath)))
      graft.vcf.SyntheticVcf.write(vcfPath, 100000)
    val warmupVcf = "/tmp/graft_bench_warmup.vcf"
    if (!java.nio.file.Files.exists(java.nio.file.Paths.get(warmupVcf)))
      graft.vcf.SyntheticVcf.write(warmupVcf, 1000)
    val vcf1m = "/tmp/graft_bench_1m.vcf"
    if (!java.nio.file.Files.exists(java.nio.file.Paths.get(vcf1m)))
      graft.vcf.SyntheticVcf.write(vcf1m, 1000000)
    materialize(graft.vcf.VcfReader.variants(spark, warmupVcf))
    materialize(graft.vcf.VcfReader.genotypes(spark, warmupVcf))
    preTouch(vcfPath)
    preTouch(vcf1m)

    // chrom-partitioned store + rsID secondary projection for the
    // query-latency rows (BASELINE.md lookup/region rows). v2: ids/schema
    // changed since round 1 — a stale cached store must not serve lookups.
    val dbPath = "/tmp/graft_bench_db_v2/variants"
    if (!java.nio.file.Files.exists(java.nio.file.Paths.get(dbPath))) {
      val v = graft.vcf.VcfReader.variants(spark, vcfPath)
      graft.sinks.Writers.writeVariants(
        graft.ingest.VariantMatching.withVariantId(v), dbPath)
    }
    val rsidIdxPath = "/tmp/graft_bench_db_v2/rsid_idx"
    if (!java.nio.file.Files.exists(java.nio.file.Paths.get(rsidIdxPath)))
      graft.sinks.Writers.writeRsidIndex(
        spark.read.parquet(dbPath), rsidIdxPath)
    val store = spark.read.parquet(dbPath)
    val rsidIdx = spark.read.parquet(rsidIdxPath)
    // warm the store read path once
    store.filter(col("chrom") === "chr2" && col("pos") === 1L).collect()
    rsidIdx.filter(col("rs_id") === "rs1").count()

    val interleaved: Seq[(String, () => Unit)] = Seq(
      "vcf_parse_100k" -> (() =>
        materialize(graft.vcf.VcfReader.variants(spark, vcfPath))),
      "vcf_parse_100k_norm" -> (() =>
        materialize(graft.vcf.VcfReader.variants(spark, vcfPath,
          graft.vcf.VcfReader.Options(normalize = true)))),
      "vcf_genotypes_100k" -> (() =>
        materialize(graft.vcf.VcfReader.genotypes(spark, vcfPath))),
      // 1M-variant parse (normalize on): the full-GIAB-scale comparison
      // point (BASELINE: ~4M variants at 20-50K var/s).
      "vcf_parse_1m_norm" -> (() =>
        materialize(graft.vcf.VcfReader.variants(spark, vcf1m,
          graft.vcf.VcfReader.Options(normalize = true)))),
      // point lookups collect the full hit rows (the reference's SELECT *
      // point-query shape), scans hash-materialize
      "lookup_single_pos" -> (() => {
        store.filter(col("chrom") === "chr1" && col("pos") === 110000L)
          .collect(); ()
      }),
      // rsID probe via the secondary projection (row-group-pruned sorted
      // scan), then the full row from the main store with chrom/pos
      // partition pruning — the reference's HASH-index probe shape
      "lookup_rsid" -> (() => {
        val hit = rsidIdx.filter(col("rs_id") === "rs5000000")
          .select("chrom", "pos").collect()
        hit.foreach { r =>
          store.filter(col("chrom") === r.getString(0) &&
            col("pos") === r.getLong(1) && col("rs_id") === "rs5000000")
            .collect()
        }
      }),
      "region_100kb" -> (() =>
        materialize(store.filter(col("chrom") === "chr1" &&
          col("pos").between(1000000L, 1100000L)))),
      "complex_filter_50k" -> (() =>
        materialize(store.filter(col("chrom") === "chr2" &&
          col("qual") > 500 && col("variant_type") === "snp" &&
          col("info").getItem("DP").cast("int") > 100))))

    (1 to 5).foreach { _ =>
      record("cpu_probe", time { if (cpuProbe() == 0) println("") })
      interleaved.foreach { case (name, body) => record(name, time(body())) }
    }
    record("cpu_probe", time { if (cpuProbe() == 0) println("") })
    interleaved.foreach { case (name, _) => results(name) = median(name) }

    // throughput forms of the parse metrics (what BASELINE.md quotes)
    results("vcf_parse_100k_var_s") = 100000.0 / results("vcf_parse_100k")
    results("vcf_parse_1m_var_s") = 1000000.0 / results("vcf_parse_1m_norm")

    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val rawJson = raw.map { case (k, ts) =>
      "\"" + k + "\":" + ts.map(t => f"$t%.3f").mkString("[", ",", "]")
    }.mkString("{", ",", "}")
    // derived throughput metrics are not seconds — keep them out of total
    val total = results.collect {
      case (k, v) if v >= 0 && !k.endsWith("_var_s") => v
    }.sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"raw":$rawJson,"sf":"$sfDir"}""")
    spark.stop()
  }
}
