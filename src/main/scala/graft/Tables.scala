package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Lazy accessors for the driver-generated parquet tables under one
  * scale-factor directory (see TESTDATA.md). All reads go through
  * `spark.read.parquet` so Catalyst gets full pushdown/pruning.
  */
final class Tables(spark: SparkSession, dir: String) {
  private def t(name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  lazy val region: DataFrame = t("region")
  lazy val nation: DataFrame = t("nation")
  lazy val customer: DataFrame = t("customer")
  lazy val supplier: DataFrame = t("supplier")
  lazy val part: DataFrame = t("part")
  lazy val orders: DataFrame = t("orders")
  lazy val lineitem: DataFrame = t("lineitem")
  /** events.ts is TIMESTAMP(NANOS) parquet, which Spark only reads as a
    * long (spark.sql.legacy.parquet.nanosAsLong); convert to a proper
    * microsecond TimestampType here so downstream operators see a
    * timestamp (same truncation DuckDB applies to nanos).
    */
  lazy val events: DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = t("events")
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        // integer division: ns-since-epoch > 2^53 would lose precision
        // through double arithmetic
        df.withColumn("ts",
          org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
      case _ => df
    }
  }
  lazy val documents: DataFrame = t("documents")
  lazy val embeddings: DataFrame = t("embeddings")
}

object Tables {
  def apply(spark: SparkSession, dir: String): Tables = new Tables(spark, dir)

  /** Scale-adaptive scan spreading (r18 optimization; guide §2.5 "input
    * skew" / §6 input-split sizing): when a relation's PLANNED scan
    * parallelism is below the session's task slots, insert one
    * round-robin exchange so the per-row work downstream (expression
    * evaluation, partial aggregation, broadcast-join probing) uses every
    * slot instead of the one task a single-file, single-row-group input
    * yields — parquet cannot split below a row group, so a small
    * driver-generated table is otherwise a one-core scan stage no matter
    * the cluster size. The decision derives from the input layout
    * (file bytes vs `spark.sql.files.maxPartitionBytes`) against the
    * runtime slot count: at scale, where the scan already carries at
    * least as many splits as slots, this is the identity and no exchange
    * is added. Disable with spark.graft.spread=false (the A/B dial the
    * SpreadProbe uses).
    *
    * Semantics-neutral by construction: a round-robin repartition only
    * changes row placement, every aggregate downstream is either exact
    * (decimal sums, counts, min/max) or order-canonicalized (sort_array,
    * sorted outputs), and Spark's sort-before-repartition keeps the
    * placement deterministic under retries.
    *
    * The planned-split estimate intentionally uses byte math, not
    * parquet footers: it errs toward spreading (a 12 MB single-row-group
    * file plans 3 splits but scans as 1 task; both sit far below any
    * real slot count), and reading footers at plan time would cost more
    * than the exchange it avoids.
    */
  def spread(df: DataFrame): DataFrame =
    if (underParallel(df)) df.repartition(df.sparkSession.sparkContext.defaultParallelism)
    else df

  /** [[spread]] keyed on the downstream join/aggregation key: instead of
    * a round-robin exchange ADDED to the plan, a hash exchange the
    * downstream operators REUSE — a groupBy/join clustered by a subset
    * of `keys` then needs no exchange of its own, and two plan branches
    * repartitioned identically share one shuffle via ReusedExchange.
    * Hash placement is also retry-deterministic for free, so unlike the
    * round-robin form it pays no local sort-before-repartition. The
    * partition count is EXPLICIT: a bare repartition(cols) is
    * AQE-coalescible, and on a kilobyte-scale local table AQE folds it
    * back to one post-shuffle partition — measured: the un-pinned form
    * lost every win on the documents table (19 KB/partition, coalesced
    * to 1) while keeping the exchange cost. Same identity-at-scale
    * condition as [[spread]]. */
  def spreadBy(df: DataFrame, keys: org.apache.spark.sql.Column*): DataFrame =
    if (underParallel(df))
      df.repartition(df.sparkSession.sparkContext.defaultParallelism, keys: _*)
    else df

  private def underParallel(df: DataFrame): Boolean = {
    val spark = df.sparkSession
    if (!spark.conf.get("spark.graft.spread", "true").toBoolean) return false
    val slots = spark.sparkContext.defaultParallelism
    val maxPB = math.max(1L, spark.sessionState.conf.filesMaxPartitionBytes)
    val plannedSplits = df.inputFiles.map { p =>
      val path = try new java.net.URI(p).getPath catch { case _: Throwable => p }
      val len = new java.io.File(path).length // 0 if unreadable → spread
      math.max(1L, (len + maxPB - 1) / maxPB)
    }.sum
    plannedSplits < slots
  }

  /** Builds a session configured the way this engine expects: AQE on,
    * shuffle partitions sized for the local core count (never the 200
    * default), UTC for oracle parity. On a real cluster the same builder
    * is used with a cluster master; nothing here is local-mode-specific.
    */
  def session(master: String = s"local[${Runtime.getRuntime.availableProcessors}]",
              shufflePartitions: Int = 32): SparkSession = {
    val spark = SparkSession.builder()
      .master(master)
      .appName("graft")
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
