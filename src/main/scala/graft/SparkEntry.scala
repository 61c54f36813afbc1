package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` aggregates every operator module's query catalog; each entry
  * takes `(spark, sfDir)` and reads its inputs from the driver-generated
  * parquet under sfDir. `oracleSql` carries the DuckDB-equivalent SQL for
  * the SQL-expressible subset (the driver's correctness gate).
  */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q01_pricing_summary")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    graft.queries.Relational.queries ++ graft.queries.VcfQueries.queries ++
      graft.queries.Pipeline.queries

  /** For each key in queries, equivalent SQL runnable by DuckDB — over
    * the sf parquet tables for the relational/pipeline set, and over the
    * public VCF fixtures (line-mode read_csv) for the genomics set. */
  def oracleSql: Map[String, String] =
    graft.queries.Relational.oracle ++ graft.queries.Pipeline.oracle ++
      graft.queries.VcfOracles.oracle
}
