package graft.ingest

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** J5 — LD-block interval-containment join
  * (`references/ld_blocks.py:151-219`: `int8range(start,end,'[]') @> pos`).
  *
  * Scale shape: the block table is ~1.7k rows, so [[assignBlocks]] is a
  * broadcast nested-loop join with a non-equi predicate — the
  * Spark-native equivalent of the reference's GiST range index probe; the
  * probe side streams and nothing shuffles. When an interval table
  * outgrows broadcast, [[assignBlocksBinned]] is the same operator as a
  * binned shuffle equi-join.
  */
object LdBlocks {

  /** Assign ld_block_id to variants; only rows whose current ld_block_id
    * is null are (re)assigned when the column pre-exists, mirroring the
    * reference's `WHERE ld_block_id IS NULL` update. Inclusive bounds
    * `[start, end]` match `int8range(..,'[]')`.
    */
  def assignBlocks(variants: DataFrame, blocks: DataFrame,
                   population: String, build: String = "GRCh37"): DataFrame = {
    import variants.sparkSession.implicits._
    val filtered = blocks
      .filter($"population" === population.toUpperCase &&
        $"genome_build" === build)
      .select($"chrom".as("b_chrom"), $"start_pos".as("b_start"),
        $"end_pos".as("b_end"), $"block_id".as("b_block_id"))

    val hasExisting = variants.columns.contains("ld_block_id")
    val base = if (hasExisting) variants.withColumnRenamed("ld_block_id", "_prev_block")
               else variants.withColumn("_prev_block", lit(null).cast("long"))

    dedupeBlockMatches(base
      .withColumn("_rid", monotonically_increasing_id())
      .join(broadcast(filtered),
        graft.functions.GenomicsFunctions.bareChrom($"chrom") === $"b_chrom" &&
          $"pos" >= $"b_start" && $"pos" <= $"b_end" &&
          $"_prev_block".isNull,
        "left"))
      .withColumn("ld_block_id", coalesce($"_prev_block", $"b_block_id"))
      .drop("b_chrom", "b_start", "b_end", "b_block_id", "_prev_block")
  }

  /** One block per variant, row count preserved. Contiguous
    * Berisa-Pickrell blocks share boundary positions, and the inclusive
    * `[start, end]` containment (the reference's
    * `int8range(..,'[]') @> pos`, `ld_blocks.py:188`) matches BOTH
    * blocks there — the reference's UPDATE can only SET one value per
    * row (arbitrary), but a join DUPLICATES the variant row, and the
    * `annotate-ld-blocks` verb would persist the duplicate into the
    * store. Keep the deterministic best match: smallest (start, id). */
  private def dedupeBlockMatches(joined: DataFrame): DataFrame = {
    import joined.sparkSession.implicits._
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"_rid")
      .orderBy($"b_start".asc_nulls_last, $"b_block_id".asc_nulls_last)
    joined.withColumn("_rn", row_number().over(w))
      .filter($"_rn" === 1)
      .drop("_rid", "_rn")
  }

  /** The at-scale form of [[assignBlocks]]: fixed-width genomic binning
    * recovers a shuffle EQUI-join when the interval table outgrows
    * broadcast (many populations × builds × fine-grained blocks, or any
    * future interval source). Each variant maps to exactly one bin
    * (`pos / binSize`); each block explodes to every bin it overlaps, so
    * a (variant, block) containment pair meets in exactly one
    * (chrom, bin) bucket — no duplicate matches — and the residual range
    * predicate filters within the bucket. Both sides shuffle on the
    * high-cardinality (chrom, bin) key; nothing broadcasts, nothing
    * nested-loops. Semantics are identical to [[assignBlocks]]
    * (asserted in LdBlocksSpec).
    *
    * binSize trades shuffle width against explode factor: 1 Mb ≈ the
    * median LD-block span (`references/ld_blocks.py` data), so blocks
    * explode to ~2 bins on average.
    */
  def assignBlocksBinned(variants: DataFrame, blocks: DataFrame,
                         population: String, build: String = "GRCh37",
                         binSize: Long = 1000000L): DataFrame = {
    import variants.sparkSession.implicits._
    val exploded = blocks
      .filter($"population" === population.toUpperCase &&
        $"genome_build" === build)
      .select($"chrom".as("b_chrom"), $"start_pos".as("b_start"),
        $"end_pos".as("b_end"), $"block_id".as("b_block_id"))
      .withColumn("b_bin",
        explode(sequence(($"b_start" / binSize).cast("long"),
          ($"b_end" / binSize).cast("long"))))

    val hasExisting = variants.columns.contains("ld_block_id")
    val base = if (hasExisting) variants.withColumnRenamed("ld_block_id", "_prev_block")
               else variants.withColumn("_prev_block", lit(null).cast("long"))

    dedupeBlockMatches(base
      .withColumn("_rid", monotonically_increasing_id())
      .withColumn("_bare_chrom", graft.functions.GenomicsFunctions.bareChrom($"chrom"))
      .withColumn("_bin", ($"pos" / binSize).cast("long"))
      .join(exploded,
        $"_bare_chrom" === $"b_chrom" && $"_bin" === $"b_bin" &&
          $"pos" >= $"b_start" && $"pos" <= $"b_end" &&
          $"_prev_block".isNull,
        "left"))
      .withColumn("ld_block_id", coalesce($"_prev_block", $"b_block_id"))
      .drop("b_chrom", "b_start", "b_end", "b_block_id", "b_bin",
        "_prev_block", "_bare_chrom", "_bin")
  }

  /** J11 — `variant_ld_block_summary` view (`references/schema.py:61-76`). */
  def blockSummary(blocks: DataFrame, variants: DataFrame): DataFrame = {
    import blocks.sparkSession.implicits._
    blocks
      .join(variants.select($"ld_block_id", $"pos"), $"block_id" === $"ld_block_id", "left")
      .groupBy($"block_id", $"chrom", $"start_pos", $"end_pos", $"population")
      .agg(count($"pos").as("n_variants"))
      .orderBy($"chrom", $"start_pos")
  }
}
