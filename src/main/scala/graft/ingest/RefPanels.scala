package graft.ingest

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Reference-panel readers (SURVEY S6/S7).
  *
  * Both tables are small (HapMap3 ≈ 1.4M rows, LD blocks ≈ 1.7k rows) and
  * exist to be broadcast against the variants table — the readers return
  * plain DataFrames; `broadcast()` is applied at the join sites in
  * VariantMatching / LdBlocks.
  */
object RefPanels {

  /** HapMap3 SNP set TSV: `rsid chrom position a1 a2`, gz-aware
    * (`references/hapmap3.py:116-183`; chrom stored bare). */
  def hapmap3(spark: SparkSession, path: String): DataFrame =
    spark.read.option("sep", "\t").option("header", "true").csv(path)
      .select(
        trim(col("rsid")).as("rsid"),
        regexp_replace(trim(col("chrom")), "^chr", "").as("chrom"),
        trim(col("position")).cast(LongType).as("position"),
        upper(trim(col("a1"))).as("a1"),
        upper(trim(col("a2"))).as("a2"))

  /** LD-blocks BED with header `chrom start end [block_id] [n_snps_1kg]`
    * (`references/ld_blocks.py:46-133`): chrom normalized bare,
    * population upper-cased, build → GRChXX form. A deterministic
    * block_id surrogate is derived from the natural key so downstream
    * joins don't depend on load order (SURVEY §7 risk 4).
    */
  def ldBlocks(spark: SparkSession, path: String, population: String,
               build: String = "grch37",
               source: String = "Berisa_Pickrell_2016"): DataFrame = {
    val pop = population.toUpperCase
    val buildNorm = {
      val b = build.toUpperCase
      if (b.startsWith("GRCH")) s"GRCh${b.substring(4)}" else b
    }
    val raw = spark.read.option("sep", "\t").option("header", "true").csv(path)
    val nSnps =
      if (raw.columns.contains("n_snps_1kg")) col("n_snps_1kg").cast(IntegerType)
      else lit(null).cast(IntegerType)
    raw.select(
      regexp_replace(trim(col("chrom")), "^chr", "").as("chrom"),
      trim(col("start")).cast(LongType).as("start_pos"),
      trim(col("end")).cast(LongType).as("end_pos"),
      nSnps.as("n_snps"))
      .withColumn("population", lit(pop))
      .withColumn("genome_build", lit(buildNorm))
      .withColumn("source", lit(source))
      .withColumn("block_id",
        graft.functions.GenomicsFunctions.stableId(
          col("chrom"), col("start_pos"), col("end_pos"),
          col("population"), col("genome_build"), col("source")))
  }

  /** A11 LD-block stats (`references/ld_blocks.py:221-268`). */
  def ldBlockStats(blocks: DataFrame): DataFrame = {
    import blocks.sparkSession.implicits._
    blocks.groupBy($"population", $"genome_build", $"source")
      .agg(
        count(lit(1)).as("n_blocks"),
        min($"start_pos").as("min_start"),
        max($"end_pos").as("max_end"),
        avg($"n_snps").as("avg_n_snps"))
      .orderBy($"population", $"genome_build", $"source")
  }
}
