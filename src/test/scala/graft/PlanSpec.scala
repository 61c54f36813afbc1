package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Physical-plan assertions (the Spark analogue of the reference's
  * `verify_partition_pruning`, `partitions.py:49-96`): pushdown reaches
  * the parquet scan, dimension joins broadcast, the VCF read pipeline
  * stays shuffle-free, and hot paths stay inside whole-stage codegen.
  * These guard the 100 TB plan shape, not just correctness.
  */
class PlanSpec extends SparkSpec {
  import spark.implicits._

  private def plan(df: DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("q01: shipdate filter pushes down to the parquet scan") {
    val df = SparkEntry.queries("q01_pricing_summary")(spark, sfDir)
    val p = plan(df)
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate"),
      s"no pushed filter in:\n$p")
  }

  test("q01: column pruning — scan reads only needed lineitem columns") {
    val df = SparkEntry.queries("q01_pricing_summary")(spark, sfDir)
    val p = plan(df)
    // l_orderkey/l_partkey etc. must NOT be read
    assert(!p.contains("l_partkey"), "scan reads pruned column l_partkey")
    assert(p.contains("l_returnflag"))
  }

  test("q15: dimension joins are broadcast hash joins") {
    val df = SparkEntry.queries("q15_region_rollup")(spark, sfDir)
    val p = plan(df)
    assert(p.contains("BroadcastHashJoin"), s"no BHJ in:\n$p")
    assert(!p.contains("SortMergeJoin"), "dimension join degenerated to SMJ")
  }

  test("q09: interval join is a broadcast nested-loop, not a cartesian") {
    val df = SparkEntry.queries("q09_interval_join")(spark, sfDir)
    val p = plan(df)
    assert(p.contains("BroadcastNestedLoopJoin"), s"no BNLJ in:\n$p")
    assert(!p.contains("CartesianProduct"))
  }

  test("VCF variants pipeline is shuffle-free (single narrow stage)") {
    val df = graft.vcf.VcfReader.variants(spark, fixture("multiallelic.vcf"))
    val p = plan(df)
    assert(!p.contains("Exchange"), s"unexpected shuffle in VCF scan:\n$p")
  }

  test("VCF genotypes pipeline is shuffle-free") {
    val df = graft.vcf.VcfReader.genotypes(spark, fixture("with_annotations.vcf"))
    val p = plan(df)
    assert(!p.contains("Exchange"), s"unexpected shuffle in genotypes scan:\n$p")
  }

  test("PRS scoring joins weights via broadcast") {
    val g = graft.vcf.VcfReader.genotypes(spark, fixture("with_annotations.vcf"))
      .withColumn("variant_id", graft.ingest.VariantMatching.variantIdCol(
        $"chrom", $"pos", $"ref", $"alt_raw"))
    val w = Seq((1L, 0.5)).toDF("variant_id", "effect_weight")
    val p = plan(graft.prs.PrsScoring.score(g, w))
    assert(p.contains("BroadcastHashJoin"), s"weights join not broadcast:\n$p")
  }

  test("hapmap3 flagging broadcasts the panel") {
    val v = graft.vcf.VcfReader.variants(spark, fixture("hapmap3_overlap.vcf"))
    val panel = graft.ingest.RefPanels.hapmap3(spark, fixture("hapmap3_test.tsv"))
    val p = plan(graft.ingest.VariantMatching.flagHapmap3(v, panel))
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastExchange"),
      s"panel not broadcast:\n$p")
  }

  test("pricing summary aggregates inside whole-stage codegen") {
    val df = SparkEntry.queries("q01_pricing_summary")(spark, sfDir)
    df.collect() // finalize the adaptive plan so codegen spans are visible
    // WSCG stages render as "*(n) Operator" in the executed-plan string
    val finalPlan = df.queryExecution.executedPlan.collectFirst {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan.toString
    }.getOrElse(plan(df))
    assert(finalPlan.contains("*(1)"), s"no codegen stage in:\n$finalPlan")
  }

  test("rsID secondary projection: probe pushes rs_id to the scan of a sorted covering table") {
    val dir = java.nio.file.Files.createTempDirectory("rsididx").toString
    val v = graft.ingest.VariantMatching.withVariantId(
      graft.vcf.VcfReader.variants(spark, fixture("hapmap3_overlap.vcf")))
    graft.sinks.Writers.writeRsidIndex(v, s"$dir/rsid_idx")
    val idx = spark.read.parquet(s"$dir/rsid_idx")
    val probe = idx.filter($"rs_id" === "rs3094315")
    val p = plan(probe)
    assert(p.contains("PushedFilters: [IsNotNull(rs_id), EqualTo(rs_id,rs3094315)]"),
      s"rs_id probe not pushed down:\n$p")
    // the projection is COVERING: the full variant schema rides along so a
    // point probe never needs a second trip into the main store
    assert(Set("rs_id", "chrom", "pos", "ref", "alt", "variant_id",
      "variant_type", "qual").subsetOf(idx.columns.toSet))
    // partial-index predicate: only rs_id-bearing rows are projected
    assert(idx.filter($"rs_id".isNull).count() == 0)
    assert(probe.count() == 1)
  }

  test("gene covering projection: probe pushes gene and serves the INCLUDE columns") {
    val dir = java.nio.file.Files.createTempDirectory("geneidx").toString
    val vcf = s"$dir/ann.vcf"
    graft.vcf.SyntheticVcf.write(vcf, 2000, seed = 11L, annFrac = 0.6)
    val v = graft.ingest.VariantMatching.withVariantId(
      graft.vcf.VcfReader.variants(spark, vcf))
    graft.sinks.Writers.writeGeneIndex(v, s"$dir/gene_idx")
    val idx = spark.read.parquet(s"$dir/gene_idx")
    val someGene = idx.orderBy($"gene").select($"gene").head().getString(0)
    val probe = idx.filter($"gene" === someGene)
    val p = plan(probe)
    assert(p.contains(s"EqualTo(gene,$someGene)"), s"gene probe not pushed down:\n$p")
    // the reference's INCLUDE list (pos, ref, alt, impact) rides along
    assert(idx.columns.toSet == Set("gene", "chrom", "pos", "ref", "alt",
      "impact", "consequence", "variant_id"))
    assert(idx.filter($"gene".isNull).count() == 0)
    assert(probe.count() ==
      v.filter($"gene" === someGene).count())
  }

  test("store scan: a chrom filter prunes hive partitions, pos pushes to the scan") {
    // the Spark-side analogue of the reference's verify_partition_pruning
    // (`partitions.py:49-96`): an analytical region scan over the K1
    // layout must hit ONE chrom directory (PartitionFilters) and push
    // the pos bounds into the parquet scan (PushedFilters) — at 100 TB
    // this is the difference between reading one chromosome and reading
    // the store
    val dir = java.nio.file.Files.createTempDirectory("prunestore").toString
    val v = graft.ingest.VariantMatching.withVariantId(
      graft.vcf.VcfReader.variants(spark, fixture("hapmap3_overlap.vcf")))
    graft.sinks.Writers.writeVariants(v, s"$dir/variants")
    val scan = spark.read.parquet(s"$dir/variants")
      .filter($"chrom" === "chr1" && $"pos" >= 752000L && $"pos" <= 850000L)
    val p = plan(scan)
    assert(p.contains("PartitionFilters") && p.contains("chrom"),
      s"no chrom partition filter in:\n$p")
    assert(p.contains("GreaterThanOrEqual(pos,752000)") &&
      p.contains("LessThanOrEqual(pos,850000)"),
      s"pos bounds not pushed:\n$p")
    assert(scan.count() == v.filter($"chrom" === "chr1" &&
      $"pos".between(752000L, 850000L)).count())
  }

  test("text analysis quality columns stay codegen'd (no UDF barrier)") {
    val df = graft.pipeline.TextAnalysis.withQuality(Tables(spark, sfDir).documents)
    val p = plan(df)
    assert(!p.contains("BatchEvalPython"))
    assert(p.contains("WholeStageCodegen") || p.contains("Project"))
  }

  test("annotator fold join shuffles variants once — later sources reuse the " +
    "(chrom,pos,ref,alt) partitioning, so N sources cost N+1 exchanges, not 2N") {
    // non-literal keys (literals constant-fold out of the join key) and
    // broadcast disabled, so the fold plans as the SMJ chain it would be
    // for gnomAD-sized sources at scale
    val mk = (tag: String) => spark.range(0, 100000)
      .selectExpr("concat('chr', id % 2 + 1) as chrom", "id as pos",
        "substr('ACGT', cast(id % 4 + 1 as int), 1) as ref",
        "substr('TGCA', cast(id % 4 + 1 as int), 1) as alt",
        s"cast(id as double) as ${tag}_af")
    val variants = mk("v").drop("v_af")
    val sources = Seq(
      graft.query.Annotator.Source("s1", mk("s1"), Seq("s1_af")),
      graft.query.Annotator.Source("s2", mk("s2"), Seq("s2_af")),
      graft.query.Annotator.Source("s3", mk("s3"), Seq("s3_af")))
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val p = plan(graft.query.Annotator.annotate(variants, sources))
      val exchanges = "Exchange hashpartitioning".r.findAllIn(p).length
      assert(p.contains("SortMergeJoin"), s"expected SMJ chain in:\n$p")
      assert(exchanges == sources.length + 1,
        s"expected ${sources.length + 1} exchanges (variants shuffled once), " +
          s"got $exchanges in:\n$p")
    } finally
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
  }

  test("annotator does NOT force-broadcast sources by default (gnomAD-sized " +
    "sources would OOM the driver); broadcast stays the opt-in hint") {
    // a statically-unsized source (no parquet stats): only an explicit
    // hint may plan it as a broadcast join
    val big = spark.range(0, 1000000)
      .selectExpr("'chr1' as chrom", "id as pos", "'A' as ref", "'G' as alt",
        "cast(id % 100 as double) / 100 as src_af")
    val variants = Tables(spark, sfDir).lineitem
      .selectExpr("'chr1' as chrom", "l_orderkey as pos", "'A' as ref",
        "'G' as alt")
    val src = graft.query.Annotator.Source("gnomad", big, Seq("src_af"))
    val noHint = plan(graft.query.Annotator.annotate(variants, Seq(src)))
    assert(!noHint.contains("BroadcastHashJoin"),
      s"default plan force-broadcasts the source:\n$noHint")
    val hinted = plan(graft.query.Annotator.annotate(variants, Seq(src),
      broadcastSources = true))
    assert(hinted.contains("BroadcastHashJoin"), s"hint ignored:\n$hinted")
  }
}
