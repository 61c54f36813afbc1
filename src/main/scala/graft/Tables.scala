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
