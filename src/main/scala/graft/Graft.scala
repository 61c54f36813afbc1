package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Thin CLI mapping the reference's verbs (`cli.py:245-2490`) onto the
  * library. The "database" is a parquet directory layout:
  *
  *   <db>/variants/         chrom-partitioned variants (K1)
  *   <db>/genotypes/        genotype long table
  *   <db>/gwas_stats/       matched summary stats
  *   <db>/prs_weights/      matched PGS weights
  *   <db>/ledger/           load-audit ledger (idempotent reload)
  *   <db>/views/<name>/     materialized views
  *
  * Usage: graft.Graft <verb> [args] — run with `sbt "runMain graft.Graft
  * load sample.vcf --db /tmp/db"`.
  */
object Graft {

  private def arg(args: Array[String], flag: String): Option[String] = {
    val i = args.indexOf(flag)
    if (i >= 0 && i + 1 < args.length) Some(args(i + 1)) else None
  }
  private def has(args: Array[String], flag: String): Boolean = args.contains(flag)

  def main(args: Array[String]): Unit = {
    if (args.isEmpty) { usage(); sys.exit(1) }
    val spark = Tables.session()
    graft.qc.Hwe.register(spark)
    graft.functions.GenomicsFunctions.register(spark)
    graft.functions.VectorExpressions.register(spark)
    graft.functions.SimHashExpression.register(spark)
    graft.transform.Normalizer.register(spark)
    graft.transform.Annotations.register(spark)
    try run(spark, args) finally spark.stop()
  }

  def run(spark: SparkSession, args: Array[String]): Unit = {
    import spark.implicits._
    val verb = args.head
    val db = arg(args, "--db").getOrElse("/tmp/graft_db")
    def variants = spark.read.parquet(s"$db/variants")

    verb match {
      case "load" =>
        val vcf = args(1)
        val ledger = new graft.audit.Audit.Ledger(spark, s"$db/ledger")
        val hash = graft.audit.Audit.fileSha256(vcf)
        val existing = ledger.checkExisting(hash)
        if (existing.isDefined && !has(args, "--force-reload")) {
          println(s"skip: file already loaded (batch ${existing.get})")
          return
        }
        val batchId = java.util.UUID.randomUUID().toString
        // PHI scan before any load work (`loader.py:275-298`): the header
        // is the PHI surface (CommandLine, Descriptions, sample names);
        // --fail-on-phi aborts, otherwise findings go to the ledger note.
        var ledgerNote = ""
        if (has(args, "--phi-scan")) {
          val headerLines = graft.vcf.VcfHeader.readHeaderLines(spark, vcf)
          val scanned = graft.transform.PhiSanitizer.sanitizeHeader(headerLines)
          if (scanned.redactions.nonEmpty) {
            val cats = scanned.redactions.map(_.category).distinct.sorted
            ledgerNote = s"phi_scan: ${scanned.redactions.length} findings " +
              cats.mkString("(", ",", ")")
            println(s"WARNING: PHI detected in VCF header: " +
              s"${scanned.redactions.length} items ${cats.mkString(",")}")
            if (has(args, "--fail-on-phi"))
              sys.error(s"PHI detected in VCF file " +
                s"(${scanned.redactions.length} findings). " +
                "Drop --fail-on-phi to load anyway.")
          } else ledgerNote = "phi_scan: clean"
        }
        val opts = graft.vcf.VcfReader.Options(
          normalize = has(args, "--normalize"),
          humanGenome = !has(args, "--no-human-genome"),
          minInfoScore = arg(args, "--min-info-score").map(_.toDouble))
        var v = graft.vcf.VcfReader.variants(spark, vcf, opts)
          .withColumn("load_batch_id", lit(batchId))
        val header = graft.vcf.VcfHeader.read(spark, vcf)
        if (header.samples.nonEmpty) {
          var g = graft.vcf.VcfReader.genotypes(spark, vcf, opts.humanGenome)
            .withColumn("load_batch_id", lit(batchId))
          // Sample anonymization (`loader.py:326+`, phi/anonymizer):
          // deterministic ANON_<sha256[:12]> ids; the vault mapping keeps
          // only the digest, never the original id (cli.py:5299).
          if (has(args, "--anonymize")) {
            val anonId = concat(lit("ANON_"),
              substring(sha2($"sample_id", 256), 1, 12))
            g.select($"sample_id").distinct()
              .select(anonId.as("anon_id"),
                sha2($"sample_id", 256).as("original_sha256"),
                lit(batchId).as("load_batch_id"))
              .write.mode("append").parquet(s"$db/phi_vault/sample_id_mapping")
            g = g.withColumn("sample_id", anonId)
          }
          // join on the full decomposed key — (chrom,pos,ref) alone would
          // row-multiply sites that share a position across ALTs
          val qc = graft.qc.VariantQc.fromGenotypes(g)
          v = v.join(qc.drop("n_samples"),
            Seq("chrom", "pos", "ref", "alt"), "left")
          g.write.mode("append").parquet(s"$db/genotypes")
        }
        val prevBatch = if (has(args, "--force-reload")) existing else None
        val base = prevBatch match {
          case Some(b) if new java.io.File(s"$db/variants").exists() =>
            // materialize before overwriting the directory we read from
            graft.audit.Audit.dropBatch(variants, b).unionByName(v, true)
              .localCheckpoint()
          case _ => v
        }
        graft.sinks.Writers.writeVariants(
          graft.ingest.VariantMatching.withVariantId(base), s"$db/variants",
          mode = "overwrite")
        val n = spark.read.parquet(s"$db/variants").count()
        ledger.append(graft.audit.Audit.LedgerEntry(batchId, vcf, hash,
          "completed", n, new java.sql.Timestamp(System.currentTimeMillis()),
          ledgerNote))
        println(s"loaded $n variants (batch $batchId)")

      case "validate" =>
        val dups = variants.groupBy($"chrom", $"pos", $"ref", $"alt")
          .count().filter($"count" > 1).count()
        println(s"variants=${variants.count()} duplicate_sites=$dups")

      case "import-gwas" =>
        val stats = graft.ingest.GwasReader.read(spark, args(1))
        val matched = graft.ingest.VariantMatching.matchToVariants(stats, variants)
        // J3: harmonize orientation against the matched variant's alleles,
        // with AF-proximity rescue for strand-ambiguous SNPs
        // (`gwas/loader.py:115-190`)
        val vAlleles = variants.select($"variant_id", $"ref".as("_v_ref"),
          $"alt".as("_v_alt"), $"info"("AF").cast("double").as("_v_af"))
        val harmonized = matched.filter($"variant_id".isNotNull)
          .join(vAlleles, Seq("variant_id"), "left")
          .withColumn("_h", graft.ingest.VariantMatching.harmonizeAlleles(
            $"effect_allele", $"other_allele", $"_v_ref", $"_v_alt",
            $"effect_allele_frequency", $"_v_af"))
          .withColumn("is_effect_allele_alt", $"_h.is_effect_allele_alt")
          .withColumn("is_strand_flipped", $"_h.is_flipped")
          .drop("_h", "_v_ref", "_v_alt", "_v_af")
        harmonized.write.mode("overwrite").parquet(s"$db/gwas_stats")
        val n = matched.count()
        val m = matched.filter($"variant_id".isNotNull).count()
        println(s"imported=$n matched=$m unmatched=${n - m}")

      case "import-pgs" =>
        val (meta, weights) = graft.ingest.PgsReader.read(spark, args(1))
        val matched = graft.ingest.VariantMatching.matchToVariants(
          weights, variants, chromCol = "chr_name", posCol = "chr_position")
        matched.filter($"variant_id".isNotNull)
          .write.mode("overwrite").parquet(s"$db/prs_weights")
        println(s"pgs=${meta.pgsId} matched=${matched.filter($"variant_id".isNotNull).count()}")

      case "import-frequencies" =>
        // `cli.py:1193-1291`: parse gnomAD-style INFO population fields
        // into the long population_frequencies table; compute popmax
        // (bottlenecked ASJ/FIN excluded) and attach it to variants.
        val source = arg(args, "--source").getOrElse("gnomAD_v3")
        val subset = arg(args, "--subset").getOrElse("all")
        val prefix = arg(args, "--prefix").getOrElse("")
        val freqVcf = graft.vcf.VcfReader.variants(spark, args(1))
        val long = graft.transform.PopulationFreq.toLong(
          freqVcf, source = source, prefix = prefix, subset = subset)
        long.write.mode("overwrite").parquet(s"$db/population_frequencies")
        val nFreq = spark.read.parquet(s"$db/population_frequencies").count()
        if (!has(args, "--no-update-popmax") &&
            new java.io.File(s"$db/variants").exists()) {
          val pm = graft.transform.PopulationFreq.popmax(
            spark.read.parquet(s"$db/population_frequencies"))
          val updated = variants
            .drop("popmax_af", "popmax_population")
            .join(pm, Seq("variant_id"), "left")
            .localCheckpoint() // cut lineage before overwriting the source dir
          graft.sinks.Writers.writeVariants(updated, s"$db/variants")
        }
        println(s"imported $nFreq population-frequency rows (source=$source)")

      case "load-reference" =>
        val panel = graft.ingest.RefPanels.hapmap3(spark, args(1))
        val flagged = graft.ingest.VariantMatching.flagHapmap3(variants, panel)
          .localCheckpoint() // cut lineage before overwriting the source dir
        graft.sinks.Writers.writeVariants(flagged, s"$db/variants")
        println(s"flagged in_hapmap3=${variants.filter($"in_hapmap3").count()}")

      case "annotate-ld-blocks" =>
        val blocks = graft.ingest.RefPanels.ldBlocks(spark, args(1),
          arg(args, "--population").getOrElse("EUR"),
          arg(args, "--build").getOrElse("grch37"))
        val assigned = graft.ingest.LdBlocks.assignBlocks(variants, blocks,
          arg(args, "--population").getOrElse("EUR"),
          arg(args, "--build").map(b => graft.ingest.PgsReader.normalizeBuild(b))
            .getOrElse("GRCh37"))
          .localCheckpoint() // cut lineage before overwriting the source dir
        graft.sinks.Writers.writeVariants(assigned, s"$db/variants")
        println("ld blocks assigned")

      case "compute-sample-qc" =>
        val g = spark.read.parquet(s"$db/genotypes")
        val sqc = graft.qc.SampleQc.compute(g, graft.qc.VariantQc.fromGenotypes(g))
        sqc.write.mode("overwrite").parquet(s"$db/sample_qc")
        graft.qc.SampleQc.batchSummary(sqc).show()

      case "refresh-views" =>
        val timings = graft.views.PrsViews.refresh(s"$db/views", Map(
          "variant_qc_summary" -> graft.views.PrsViews.variantQcSummary(variants),
          "chromosome_variant_counts" -> graft.views.PrsViews.chromosomeVariantCounts(variants)))
        timings.foreach { case (n, t) => println(f"$n refreshed in $t%.2fs") }

      case "load-annotation" =>
        // S8: annotation VCF → <db>/anno_<name>/ with the echtvar field
        // config applied (cli.py annotation-load face)
        val name = arg(args, "--name").getOrElse(
          sys.error("load-annotation needs --name"))
        val config = arg(args, "--config") match {
          case Some(p) => graft.ingest.AnnotationLoader.loadFieldConfig(p)
          case None    => sys.error("load-annotation needs --config <json>")
        }
        val src = graft.ingest.AnnotationLoader.load(spark, args(1), config)
        src.write.mode("overwrite").parquet(s"$db/anno_$name")
        println(s"loaded annotation source $name " +
          s"(${spark.read.parquet(s"$db/anno_$name").count()} sites, " +
          s"fields ${config.map(_.alias).mkString(",")})")

      case "annotate" =>
        // J1 query face (annotator.py:28-60, cli.py:1363-1452): variants
        // LEFT JOIN each named source from the db layout. Duplicate field
        // names across sources resolve first-wins, mirroring the
        // reference's field→alias first-claim (_qualify_filter_fields);
        // with unique top-level columns the filter needs no qualification.
        val sources = arg(args, "--anno").map(_.split(",").toSeq)
          .getOrElse(Seq.empty)
        val claimed = scala.collection.mutable.Set[String]()
        val srcDfs = sources.map { name =>
          val df = spark.read.parquet(s"$db/anno_$name")
          val fields = df.columns.toSeq
            .filterNot(graft.query.Annotator.JoinKey.contains)
            .filterNot(claimed.contains)
          claimed ++= fields
          graft.query.Annotator.Source(name, df, fields)
        }
        val filterExpr = arg(args, "--filter")
        val out = graft.query.Annotator.annotate(variants, srcDfs,
          filterExpr, limit = arg(args, "--limit").map(_.toInt))
        arg(args, "--output") match {
          case Some(p) => graft.sinks.Writers.writeTsv(out, p)
          case None    => out.show(20, truncate = false)
        }

      case "annotation-query" =>
        variants.createOrReplaceTempView("variants")
        spark.sql(args(1)).show(50, truncate = false)

      case "export-plink" | "export-prscs" | "export-ldpred2" | "export-prsice" =>
        val stats = spark.read.parquet(s"$db/gwas_stats")
          .withColumn("beta", coalesce($"beta", log($"odds_ratio")))
        val vf = graft.export.PrsFormats.VariantFilter(
          hapmap3Only = has(args, "--hapmap3-only"),
          minInfo = arg(args, "--min-info").map(_.toDouble),
          minMaf = arg(args, "--min-maf").map(_.toDouble))
        val vSel = variants.select("variant_id", "chrom", "pos", "rs_id")
        val out = verb match {
          case "export-plink"   => graft.export.PrsFormats.plinkScore(stats, vSel, vf)
          case "export-prscs"   => graft.export.PrsFormats.prsCs(stats, vSel, vf = vf)
          case "export-ldpred2" => graft.export.PrsFormats.ldpred2(stats, vSel,
            arg(args, "--n-cases").map(_.toLong), arg(args, "--n-controls").map(_.toLong),
            arg(args, "--sample-size").map(_.toLong), vf)
          case _                => graft.export.PrsFormats.prsice2(stats, vSel, vf)
        }
        graft.sinks.Writers.writeTsv(out, args(1))
        println(s"exported ${out.count()} rows to ${args(1)}")

      case "benchmark" =>
        Bench.main(Array.empty)

      case other =>
        println(s"unknown verb: $other"); usage(); sys.exit(1)
    }
  }

  private def usage(): Unit = println(
    """graft <verb> [options]
      |  load <vcf> --db DIR [--normalize] [--force-reload] [--min-info-score X]
      |       [--phi-scan] [--fail-on-phi] [--anonymize]
      |  validate --db DIR
      |  import-gwas <tsv> --db DIR
      |  import-pgs <scoring-file> --db DIR
      |  load-reference <hapmap3-tsv> --db DIR
      |  annotate-ld-blocks <bed> --db DIR [--population EUR] [--build grch37]
      |  compute-sample-qc --db DIR
      |  refresh-views --db DIR
      |  load-annotation <vcf> --name NAME --config cfg.json --db DIR
      |  annotate --db DIR [--anno a,b] [--filter EXPR] [--limit N] [--output PATH]
      |  annotation-query "<sql>" --db DIR
      |  export-plink|export-prscs|export-ldpred2|export-prsice <out> --db DIR
      |  benchmark""".stripMargin)
}
