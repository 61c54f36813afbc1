package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.vcf.VcfReader
import graft.qc.{SampleQc, VariantQc}

/** VCF-domain operator queries (SURVEY §2.1/§2.3/§2.6) over the reference
  * repo's public test fixtures. Every key here carries a DuckDB oracle in
  * `VcfOracles` (since round 2): the oracle SQL re-derives the expected
  * result from independently staged inputs, so the driver's correctness
  * gate hash-compares rows+schema for all of them (see COVERAGE.md's
  * preamble for the documented reference deviations the oracles mirror).
  * ScalaTest differential specs additionally pin the parsing/UDF
  * semantics. The sfDir parameter is unused — inputs are VCF files.
  */
object VcfQueries {

  private val fixtures = "/root/reference/tests/fixtures"

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // S1+T1-T4: scan + multi-allelic decomposition + per-ALT INFO slicing
    "vcf_scan_decompose" -> { (s, _) =>
      import s.implicits._
      VcfReader.variants(s, s"$fixtures/multiallelic.vcf")
        .select($"chrom", $"pos", $"ref", $"alt", $"alt_idx", $"n_alts",
          $"info"("AF").as("af_sliced"), $"variant_type")
    },

    // T6: ANN worst-consequence annotation extraction
    "vcf_worst_consequence" -> { (s, _) =>
      import s.implicits._
      VcfReader.variants(s, s"$fixtures/snpeff/cancer.ann.vcf")
        .select($"chrom", $"pos", $"ref", $"alt", $"gene", $"impact",
          $"consequence", $"hgvs_c", $"hgvs_p", $"transcript")
        .filter($"gene".isNotNull)
    },

    // T5: vt normalization over an indel corpus that actually exercises
    // right-trim, left-trim, the pos=1 guard and the no-genome
    // empty-allele stop (multiallelic.vcf's alleles are all already
    // parsimonious, which made this a no-op check)
    "vcf_normalize" -> { (s, _) =>
      import s.implicits._
      val norm = writeNormFixture()
      VcfReader.variants(s, norm, VcfReader.Options(normalize = true))
        .select($"chrom", $"pos", $"ref", $"alt", $"normalized",
          $"original_pos", $"original_ref", $"original_alt")
    },

    // T12-T14 + F3: genotype long table (driver-facing: array columns
    // stringified — the harness canonicalizer can't hash raw arrays)
    "vcf_genotypes" -> { (s, _) =>
      import s.implicits._
      VcfReader.genotypes(s, s"$fixtures/with_annotations.vcf")
        .select($"chrom", $"pos", $"ref", $"alt", $"alt_idx", $"n_alts",
          $"sample_id", $"gt", $"phased", $"a1", $"a2", $"gq", $"dp",
          concat_ws(",", $"ad").as("ad_csv"), $"ds",
          concat_ws(",", $"gp").as("gp_csv"),
          $"dosage", $"allele_balance", $"passes_adj")
    },

    // A1-A3: per-variant QC with HWE
    "vcf_variant_qc" -> { (s, _) =>
      val g = VcfReader.genotypes(s, s"$fixtures/with_annotations.vcf")
      VariantQc.fromGenotypes(g)
    },

    // A4: per-sample QC
    "vcf_sample_qc" -> { (s, _) =>
      val g = VcfReader.genotypes(s, s"$fixtures/with_annotations.vcf")
      SampleQc.compute(g, VariantQc.fromGenotypes(g))
    },

    // J9: de novo anti-join — child carries the alt, neither parent does
    "vcf_denovo_antijoin" -> { (s, _) =>
      import s.implicits._
      val g = VcfReader.genotypes(s, s"$fixtures/with_annotations.vcf")
      val carriers = g
        .withColumn("_cls", VariantQc.genotypeClass($"gt", $"a1", $"a2"))
        .filter($"_cls".isin("het", "hom_alt"))
        .select($"chrom", $"pos", $"ref", $"alt", $"sample_id")
      val key = Seq("chrom", "pos", "ref", "alt")
      carriers.filter($"sample_id" === "HG002")
        .join(carriers.filter($"sample_id" === "HG003").select(key.map(col): _*),
          key, "left_anti")
        .join(carriers.filter($"sample_id" === "HG004").select(key.map(col): _*),
          key, "left_anti")
    },

    // S1 over bgzip: compressed scan end-to-end
    "vcf_gz_scan" -> { (s, _) =>
      import s.implicits._
      VcfReader.variants(s, s"$fixtures/gnomad_subset.vcf.gz")
        .select($"chrom", $"pos", $"ref", $"alt", $"rs_id", $"qual", $"variant_type")
    },

    // S5 + J2: PGS scoring file matched to variants with priority fallback
    "vcf_pgs_match" -> { (s, _) =>
      import s.implicits._
      val v = VcfReader.variants(s, s"$fixtures/hapmap3_overlap.vcf")
      val (_, weights) = graft.ingest.PgsReader.read(s, s"$fixtures/pgs_test_beta.txt")
      graft.ingest.VariantMatching.matchToVariants(
        weights, v, chromCol = "chr_name", posCol = "chr_position")
        .select($"rsid", $"chr_name", $"chr_position", $"effect_allele",
          $"other_allele", $"effect_weight", $"variant_id", $"match_type")
    },

    // S6 + J4: HapMap3 panel flagging with allele/complement matching
    "vcf_hapmap3_flag" -> { (s, _) =>
      import s.implicits._
      val v = VcfReader.variants(s, s"$fixtures/hapmap3_overlap.vcf")
      val panel = graft.ingest.RefPanels.hapmap3(s, s"$fixtures/hapmap3_test.tsv")
      graft.ingest.VariantMatching.flagHapmap3(v, panel)
        .select($"chrom", $"pos", $"ref", $"alt", $"rs_id",
          $"variant_id", $"in_hapmap3", $"hapmap3_rsid")
    },

    // S7 + J5 + J11: LD-block interval assignment + block summary
    "vcf_ld_blocks" -> { (s, _) =>
      import s.implicits._
      val v = VcfReader.variants(s, s"$fixtures/hapmap3_overlap.vcf")
      val blocks = graft.ingest.RefPanels.ldBlocks(
        s, s"$fixtures/ld_blocks_eur_grch37.bed", "EUR", "grch37")
      val assigned = graft.ingest.LdBlocks.assignBlocks(v, blocks, "EUR")
      graft.ingest.LdBlocks.blockSummary(blocks, assigned)
    },

    // J5 scale path: the SAME interval-containment semantics as
    // vcf_ld_blocks, through the binned shuffle equi-join (the plan a
    // broadcast-too-big interval table gets at 100 TB)
    "vcf_ld_blocks_binned" -> { (s, _) =>
      import s.implicits._
      val v = VcfReader.variants(s, s"$fixtures/hapmap3_overlap.vcf")
      val blocks = graft.ingest.RefPanels.ldBlocks(
        s, s"$fixtures/ld_blocks_eur_grch37.bed", "EUR", "grch37")
      val assigned = graft.ingest.LdBlocks.assignBlocksBinned(v, blocks, "EUR")
      graft.ingest.LdBlocks.blockSummary(blocks, assigned)
    },

    // F2: echtvar filter expression compiled into a Catalyst predicate
    "vcf_filter_expression" -> { (s, _) =>
      import s.implicits._
      val v = VcfReader.variants(s, s"$fixtures/gnomad_subset.vcf.gz")
      graft.query.FilterExpression.applyFilter(v,
        "qual > 100 && rs_id IS NOT NULL && variant_type == 'snp'")
        .select($"chrom", $"pos", $"ref", $"alt", $"rs_id", $"qual")
    },

    // A9/J6: PRS score = per-sample Σ(weight × dosage) with GT fallback.
    // Runs over the trio fixture, whose chr5 site is multi-allelic
    // (ALT=G,T): both sides key by the DECOMPOSED alt, so each ALT's
    // weight meets its own per-ALT genotype rows (the round-1 alt_raw
    // keying silently zeroed multi-allelic contributions).
    "vcf_prs_score" -> { (s, _) =>
      import s.implicits._
      val trio = writeTrioFixture()
      val g = VcfReader.genotypes(s, trio)
        .withColumn("variant_id", graft.ingest.VariantMatching.variantIdCol(
          $"chrom", $"pos", $"ref", $"alt"))
      val weights = VcfReader.variants(s, trio)
        .select(graft.ingest.VariantMatching.variantIdCol(
          $"chrom", $"pos", $"ref", $"alt").as("variant_id"),
          coalesce($"info"("AF").cast("double"), lit(0.1)).as("effect_weight"))
      graft.prs.PrsScoring.score(g, weights)
    },

    // K6: PLINK --score export format (join+filter+orderBy+select)
    "vcf_export_plink" -> { (s, _) =>
      import s.implicits._
      val v = graft.ingest.VariantMatching.withVariantId(
        VcfReader.variants(s, s"$fixtures/hapmap3_overlap.vcf"))
      val (_, w) = graft.ingest.PgsReader.read(s, s"$fixtures/pgs_test_beta.txt")
      val matched = graft.ingest.VariantMatching.matchToVariants(
        w, v, chromCol = "chr_name", posCol = "chr_position")
        .filter($"variant_id".isNotNull)
        .withColumn("beta", $"effect_weight")
      graft.export.PrsFormats.plinkScore(
        matched, v.select($"variant_id", $"chrom", $"pos", $"rs_id"))
    },

    // S9 + A10: gnomAD wide→long unpivot + popmax (bottlenecked excluded)
    "vcf_popmax" -> { (s, _) =>
      val vcf = writeGnomadStyleFixture()
      val v = VcfReader.variants(s, vcf)
      val long = graft.transform.PopulationFreq.toLong(v)
      graft.transform.PopulationFreq.popmax(long)
    },

    // A6: variant_qc_summary matview pipeline over trio QC metrics
    "vcf_qc_summary" -> { (s, _) =>
      import s.implicits._
      val g = VcfReader.genotypes(s, s"$fixtures/with_annotations.vcf")
      val qc = VariantQc.fromGenotypes(g)
        .withColumn("in_hapmap3", lit(false))
        .withColumn("info_score", lit(null).cast("double"))
      graft.views.PrsViews.variantQcSummary(qc)
    },

    // S8 + J1: dynamic annotation source folded onto variants with an
    // echtvar filter expression
    "vcf_annotation_join" -> { (s, _) =>
      import s.implicits._
      val cfgPath = {
        val p = java.nio.file.Paths.get("/tmp/graft_anno_cfg.json")
        if (!java.nio.file.Files.exists(p))
          java.nio.file.Files.writeString(p,
            """[{"field": "AC", "alias": "src_ac"}, {"field": "AF", "alias": "src_af", "multiplier": 10}]""")
        p.toString
      }
      val cfg = graft.ingest.AnnotationLoader.loadFieldConfig(cfgPath)
      val anno = graft.ingest.AnnotationLoader.load(s, s"$fixtures/gnomad_subset.vcf.gz", cfg)
      val v = VcfReader.variants(s, s"$fixtures/gnomad_subset.vcf.gz")
        .select($"chrom", $"pos", $"ref", $"alt", $"rs_id")
      // deterministic top-N: sort on the site key before limiting (a bare
      // limit returns an arbitrary — unverifiable — subset)
      graft.query.Annotator.annotate(v,
        Seq(graft.query.Annotator.Source("gnomad", anno, Seq("src_ac", "src_af"))),
        filterExpr = Some("src_af IS NOT NULL"))
        .orderBy($"chrom", $"pos", $"ref", $"alt")
        .limit(1000)
    },

    // A13: validation duplicate-site check (`cli.py:548-570`)
    "vcf_validate_dups" -> { (s, _) =>
      import s.implicits._
      val v = VcfReader.variants(s, s"$fixtures/gnomad_subset.vcf.gz")
      v.groupBy($"chrom", $"pos", $"ref", $"alt")
        .count()
        .withColumn("is_dup", $"count" > 1)
        .agg(count(lit(1)).as("n_sites"),
          sum(when($"is_dup", 1).otherwise(0)).as("n_dup_sites"))
    },

    // Trio inheritance patterns (acceptance-test narratives): autosomal
    // recessive + compound het over a deterministic trio
    "vcf_inheritance" -> { (s, _) =>
      import s.implicits._
      val trio = writeTrioFixture()
      val g = VcfReader.genotypes(s, trio)
      val v = VcfReader.variants(s, trio)
      val ar = graft.qc.Inheritance.autosomalRecessive(g, "CHILD", "FATHER", "MOTHER")
        .select($"chrom", $"pos", $"ref", $"alt", lit("autosomal_recessive").as("pattern"))
      val dn = graft.qc.Inheritance.deNovo(g, "CHILD", "FATHER", "MOTHER")
        .select($"chrom", $"pos", $"ref", $"alt", lit("de_novo").as("pattern"))
      val ch = graft.qc.Inheritance.compoundHet(g, v, "CHILD", "FATHER", "MOTHER")
        .select($"chrom", $"pos", $"ref", $"alt", lit("compound_het").as("pattern"))
      ar.unionByName(dn).unionByName(ch).orderBy($"chrom", $"pos", $"alt", $"pattern")
    },

    // J10 reference-CTE shape: genes with ≥2 variants, at least one HIGH
    // (`test_database_queries.py:196-218`) over the SnpEff-annotated corpus
    "vcf_compound_het_impact" -> { (s, _) =>
      graft.qc.Inheritance.compoundHetByImpact(
        VcfReader.variants(s, s"$fixtures/snpeff/cancer.ann.vcf"))
    },

    // S2/S3: header scan + annotation sub-schema discovery, surfaced as a
    // relational (kind, id, number, vtype) catalog so the driver can
    // verify the parse against the raw header lines
    "vcf_header_info" -> { (s, _) =>
      import s.implicits._
      val h = graft.vcf.VcfHeader.read(s, s"$fixtures/snpeff/cancer.ann.vcf")
      val rows =
        h.infoFields.values.toSeq.sortBy(_.id).map(m =>
          ("INFO", m.id, m.number, m.tpe)) ++
        h.formatFields.values.toSeq.sortBy(_.id).map(m =>
          ("FORMAT", m.id, m.number, m.tpe)) ++
        h.annFields.zipWithIndex.map { case (f, i) =>
          ("ANN_FIELD", f, (i + 1).toString, null: String) } ++
        h.csqFields.zipWithIndex.map { case (f, i) =>
          ("CSQ_FIELD", f, (i + 1).toString, null: String) } ++
        h.samples.zipWithIndex.map { case (n, i) =>
          ("SAMPLE", n, (i + 1).toString, null: String) } ++
        Seq(("IMPUTATION_SOURCE", h.imputationSource, null: String, null: String))
      rows.toDF("kind", "id", "number", "vtype")
    },

    // S4 + J2 + J3: GWAS-SSF scan matched to variants with priority and
    // full allele harmonization including the AF-proximity rescue for
    // strand-ambiguous SNPs
    "vcf_gwas_match" -> { (s, _) =>
      import s.implicits._
      val (vcf, tsv) = writeGwasFixtures()
      val v = VcfReader.variants(s, vcf)
      val stats = graft.ingest.GwasReader.read(s, tsv)
      val matched = graft.ingest.VariantMatching.matchToVariants(stats, v)
      val vAf = v.select(
        graft.ingest.VariantMatching.variantIdCol(
          $"chrom", $"pos", $"ref", $"alt").as("variant_id"),
        $"ref".as("v_ref"), $"alt".as("v_alt"),
        $"info"("AF").cast("double").as("v_af"))
      matched.join(vAf, Seq("variant_id"), "left")
        .withColumn("h", graft.ingest.VariantMatching.harmonizeAlleles(
          $"effect_allele", $"other_allele", $"v_ref", $"v_alt",
          $"effect_allele_frequency", $"v_af"))
        .select($"rsid", $"chromosome", $"base_pair_location",
          $"effect_allele", $"other_allele", $"effect_allele_frequency",
          $"variant_id", $"match_type",
          $"h.is_match".as("is_match"), $"h.is_flipped".as("is_flipped"),
          $"h.is_effect_allele_alt".as("is_effect_allele_alt"))
    },

    // T11: imputation metrics for minimac4 (R2/IMPUTED/TYPED) and Beagle
    // (DR2/IMP + the DR2>=1 ∧ ¬IMP typed rule), sources auto-sniffed
    "vcf_imputation" -> { (s, _) =>
      import s.implicits._
      val (mini, beagle) = writeImputationFixtures()
      def slice(path: String) = VcfReader.variants(s, path)
        .select($"chrom", $"pos", $"ref", $"alt", $"info_score",
          $"imputation_r2", $"is_imputed", $"is_typed", $"imputation_source")
      slice(mini).unionByName(slice(beagle))
    },

    // T10: ClinVar significance normalization precedence
    "vcf_clinvar" -> { (s, _) =>
      import s.implicits._
      val vcf = writeClinvarFixture()
      VcfReader.variants(s, vcf)
        .select($"chrom", $"pos", $"ref", $"alt", $"clinvar_sig",
          graft.transform.Annotations.normalizeClinvarUdf($"clinvar_sig")
            .as("clinvar_norm"))
    },

    // T13: dosage — DS passthrough (Number=A sliced per ALT) and the GP
    // biallelic-triple fallback, over a multi-allelic fixture
    "vcf_dosage" -> { (s, _) =>
      import s.implicits._
      val vcf = writeDosageFixture()
      VcfReader.genotypes(s, vcf)
        .select($"chrom", $"pos", $"ref", $"alt", $"alt_idx", $"n_alts",
          $"sample_id", $"gt", $"a1", $"a2", $"ds",
          concat_ws(",", $"gp").as("gp_csv"), $"dosage")
    },

    // T6 (CSQ branch): VEP CSQ worst-consequence over a real
    // VEP-annotated corpus whose Allele field matches the decomposed ALT
    // (cancer.ann.vcf covers the SnpEff ANN branch)
    "vcf_csq_scan" -> { (s, _) =>
      import s.implicits._
      VcfReader.variants(s, s"$fixtures/annotated_ranked.vcf.gz")
        .select($"chrom", $"pos", $"ref", $"alt", $"rs_id",
          $"gene", $"impact", $"consequence", $"hgvs_c", $"hgvs_p")
    },

    // S1 robustness: structural-variant corpus — symbolic alleles
    // (<DEL>/<DUP>/<INV>), END extraction, sv classification
    "vcf_sv_scan" -> { (s, _) =>
      import s.implicits._
      VcfReader.variants(s, s"$fixtures/genmod_sv.vcf.gz")
        .select($"chrom", $"pos", $"alt", $"end_pos", $"variant_type",
          concat_ws(";", $"filter").as("filters"))
    },

    // A12: per-chromosome partition stats over the multi-chrom SV corpus
    "vcf_partition_stats" -> { (s, _) =>
      graft.views.Dashboards.partitionStats(
        VcfReader.variants(s, s"$fixtures/genmod_sv.vcf.gz"))
    },

    // A12 + F7: genotype-table stats plus the dosage-range
    // CHECK-constraint violation count over the DS/GP fixture
    "vcf_genotype_stats" -> { (s, _) =>
      import s.implicits._
      val g = VcfReader.genotypes(s, writeDosageFixture())
      graft.views.Dashboards.genotypeStats(g)
        .crossJoin(graft.views.Dashboards.dosageViolations(g)
          .agg(count(lit(1)).as("n_dosage_violations")))
    },

    // J12: PGS score listing — scores joined to matched weights
    "vcf_pgs_listing" -> { (s, _) =>
      import s.implicits._
      val v = VcfReader.variants(s, s"$fixtures/hapmap3_overlap.vcf")
      val (meta, weights) = graft.ingest.PgsReader.read(s, s"$fixtures/pgs_test_beta.txt")
      val matched = graft.ingest.VariantMatching.matchToVariants(
        weights, v, chromCol = "chr_name", posCol = "chr_position")
      val scores = Seq(meta.pgsId).toDF("pgs_id")
      graft.views.Dashboards.pgsScoreListing(scores, matched)
    },

    // J7 + F4 + §2.12: the prs_candidate_variants matview, end-to-end —
    // variants + per-ALT QC + HapMap3 flagging + population frequencies +
    // matched GWAS stats through the full matview join graph. The fixture
    // mixes passing sites with each single-filter failure (low info
    // score, not-in-panel, maf=0) and a no-GWAS site dropped by the
    // inner join.
    "vcf_prs_candidates" -> { (s, _) =>
      import s.implicits._
      val (vcf, panelTsv, gwasTsv) = writePrsCandidateFixtures()
      val v = VcfReader.variants(s, vcf)
      val g = VcfReader.genotypes(s, vcf)
      val qc = VariantQc.fromGenotypes(g).drop("n_samples")
      val merged = v.join(qc, Seq("chrom", "pos", "ref", "alt"), "left")
      val panel = graft.ingest.RefPanels.hapmap3(s, panelTsv)
      val flagged = graft.ingest.VariantMatching.flagHapmap3(merged, panel)
      val popFreqs = graft.transform.PopulationFreq.toLong(v)
      val gwas = graft.ingest.GwasReader.read(s, gwasTsv)
      val stats = graft.ingest.VariantMatching.matchToVariants(gwas, flagged)
        .filter($"variant_id".isNotNull)
        .select($"variant_id", $"beta", $"standard_error", $"p_value")
      graft.views.PrsViews.prsCandidateVariants(flagged, popFreqs, stats)
    },

    // T15: chunked file SHA-256 (the idempotent-reload identity key)
    "vcf_file_hash" -> { (s, _) =>
      import s.implicits._
      val p = s"$fixtures/multiallelic.vcf"
      Seq((p, graft.audit.Audit.fileSha256(p))).toDF("path", "sha256")
    },

    // F1: info-score pushdown load filter — null scores pass, scored rows
    // must clear the threshold (`vcf_parser.py:634-650`)
    "vcf_info_score_filter" -> { (s, _) =>
      import s.implicits._
      val (mini, _) = writeImputationFixtures()
      VcfReader.variants(s, mini,
        VcfReader.Options(minInfoScore = Some(0.9)))
        .select($"chrom", $"pos", $"ref", $"alt", $"info_score")
    },

    // K2 + K3: dedupe-on-insert and upsert merge semantics over
    // deterministic tables, tagged by mode
    "vcf_upsert" -> { (s, _) =>
      import s.implicits._
      val existing = Seq(
        ("chr1", 100L, "A", "G", 10.0),
        ("chr1", 200L, "C", "T", 20.0),
        ("chr2", 300L, "G", "A", 30.0)).toDF("chrom", "pos", "ref", "alt", "qual")
      val incoming = Seq(
        ("chr1", 200L, "C", "T", 99.0),   // conflicts: upsert wins, ignore loses
        ("chr3", 400L, "T", "C", 40.0),   // new row: both keep
        ("chr3", 400L, "T", "C", 40.0))   // in-batch dup (identical): BOTH dedupe
        .toDF("chrom", "pos", "ref", "alt", "qual")
      val keys = Seq("chrom", "pos", "ref", "alt")
      graft.sinks.Writers.upsert(existing, incoming, keys)
        .withColumn("mode", lit("upsert"))
        .unionByName(graft.sinks.Writers.insertIgnore(existing, incoming, keys)
          .withColumn("mode", lit("insert_ignore")))
    },

    // K4 + §2.13: delete-then-insert reload over a deterministic
    // two-batch store with a status-bearing ledger (`loader.py:182-252`).
    // checkExisting resolves the LATEST COMPLETED batch for the file hash
    // (failed / in_progress rows are invisible to the skip check),
    // dropBatch deletes its rows, and the incoming batch unions in.
    "vcf_reload_ledger" -> { (s, _) =>
      import s.implicits._
      val vDir = "/tmp/graft_reload_variants.parquet"
      val lDir = "/tmp/graft_reload_ledger.parquet"
      Seq(
        ("chr1", 100L, "A", "G", "b1"),
        ("chr1", 200L, "C", "T", "b1"),
        ("chr2", 300L, "G", "A", "b2"),
        ("chr2", 400L, "T", "C", "b2"))
        .toDF("chrom", "pos", "ref", "alt", "load_batch_id")
        .coalesce(1).write.mode("overwrite").parquet(vDir)
      def ts(ms: Long) = new java.sql.Timestamp(ms)
      Seq(
        graft.audit.Audit.LedgerEntry("b1", "a.vcf", "hashA", "completed", 2L, ts(1000L)),
        graft.audit.Audit.LedgerEntry("b2", "b.vcf", "hashB", "completed", 2L, ts(2000L)),
        graft.audit.Audit.LedgerEntry("b3", "a.vcf", "hashA", "failed", 0L, ts(3000L)),
        graft.audit.Audit.LedgerEntry("b4", "a.vcf", "hashA", "in_progress", 0L, ts(4000L)))
        .toDF().coalesce(1).write.mode("overwrite").parquet(lDir)
      val ledger = new graft.audit.Audit.Ledger(s, lDir)
      val prev = ledger.checkExisting("hashA")
        .getOrElse(sys.error("ledger must resolve b1"))
      val incoming = Seq(
        ("chr1", 100L, "A", "G", "b5"),
        ("chr1", 250L, "C", "G", "b5"))
        .toDF("chrom", "pos", "ref", "alt", "load_batch_id")
      graft.audit.Audit.dropBatch(s.read.parquet(vDir), prev)
        .unionByName(incoming)
        .groupBy($"load_batch_id")
        .agg(count(lit(1)).as("n_variants"))
        .orderBy($"load_batch_id")
    },

    // §2.13 append-only multi-file cohort THROUGH THE CLI VERB: two
    // DIFFERENT VCFs loaded sequentially into one db must both survive —
    // one batch per file, each ledger row recording its own batch's
    // contribution (`loader.py:244-252,547-560`). The oracle derives the
    // expected per-file decomposed counts INDEPENDENTLY from the fixture
    // VCFs, so a load that replaced the store with the newest file (the
    // round-7 defect) loses file A's row here and hash-mismatches.
    "vcf_multi_file_cohort" -> { (s, _) =>
      import s.implicits._
      val db = "/tmp/graft_multi_cohort_db"
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(rm))
        f.delete()
      }
      rm(new java.io.File(db))
      val fixtures = "/root/reference/tests/fixtures"
      graft.Graft.run(s, Array("load", s"$fixtures/multiallelic.vcf", "--db", db))
      graft.Graft.run(s, Array("load", s"$fixtures/with_annotations.vcf", "--db", db))
      val store = s.read.parquet(s"$db/variants")
        .groupBy($"load_batch_id").agg(count(lit(1)).as("store_rows"))
      val ledger = s.read.parquet(s"$db/ledger")
        .filter($"status" === "completed")
        .select($"load_batch_id",
          regexp_extract($"file_path", "([^/]+)$", 1).as("file_name"),
          $"n_variants".as("ledger_rows"))
      store.join(ledger, Seq("load_batch_id"))
        .select($"file_name", $"store_rows", $"ledger_rows")
        .orderBy($"file_name")
    },

    // Fact-table import analogue of the cohort key: per-study replace
    // THROUGH THE CLI VERB is delete-then-insert on exactly one study's
    // rows (the reference's DELETE WHERE study_id, `gwas/loader.py`) —
    // importing A, then B, then A with CHANGED betas must leave exactly
    // A-new and B. Every TSV row matches a store variant by construction
    // (positions/alleles from the fixture VCF), so the oracle re-derives
    // the expected table from the TSVs alone; a replace that dropped the
    // other study, duplicated the re-import, or kept stale A rows
    // diverges in n_rows or sum_beta.
    "vcf_import_replace" -> { (s, _) =>
      import s.implicits._
      val db = "/tmp/graft_import_replace_db"
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(rm))
        f.delete()
      }
      rm(new java.io.File(db))
      graft.Graft.run(s, Array("load",
        "/root/reference/tests/fixtures/hapmap3_overlap.vcf", "--db", db))
      def writeTsv(path: String, rows: Seq[String]): Unit = {
        val w = new java.io.PrintWriter(path)
        try {
          w.println("CHR\tPOS\tEA\tOA\tPVAL\tBETA\tSE\tEAF\tSNP")
          rows.foreach(w.println)
        } finally w.close()
      }
      writeTsv("/tmp/graft_import_replace_a1.tsv", Seq(
        "1\t752566\tA\tG\t1e-8\t0.05\t0.01\t0.25\trs3094315",
        "1\t752721\tG\tA\t1e-6\t0.02\t0.01\t0.40\trs3131972"))
      writeTsv("/tmp/graft_import_replace_a2.tsv", Seq(
        "1\t752566\tA\tG\t1e-8\t0.07\t0.01\t0.25\trs3094315",
        "1\t752721\tG\tA\t1e-6\t0.04\t0.01\t0.40\trs3131972"))
      writeTsv("/tmp/graft_import_replace_b.tsv", Seq(
        "1\t752566\tA\tG\t1e-4\t0.01\t0.01\t0.25\trs3094315"))
      graft.Graft.run(s, Array("import-gwas",
        "/tmp/graft_import_replace_a1.tsv", "--db", db,
        "--study-accession", "GCST_A"))
      graft.Graft.run(s, Array("import-gwas",
        "/tmp/graft_import_replace_b.tsv", "--db", db,
        "--study-accession", "GCST_B"))
      graft.Graft.run(s, Array("import-gwas",
        "/tmp/graft_import_replace_a2.tsv", "--db", db,
        "--study-accession", "GCST_A"))
      s.read.parquet(s"$db/gwas_stats")
        .groupBy($"study_accession")
        .agg(count(lit(1)).as("n_rows"), sum($"beta").as("sum_beta"))
        .orderBy($"study_accession")
    },

    // S10: the synthetic VCF generator is deterministic for a given seed —
    // generate, parse, and let the oracle re-derive the decomposed rows
    // from the same /tmp file (Number=A AF slicing included)
    "vcf_synthetic_scan" -> { (s, _) =>
      import s.implicits._
      val p = "/tmp/graft_synth_50.vcf"
      graft.vcf.SyntheticVcf.write(p, 50, samples = Seq("S1", "S2"), seed = 7L)
      VcfReader.variants(s, p)
        .select($"chrom", $"pos", $"ref", $"alt", $"alt_idx", $"n_alts",
          $"rs_id", $"qual", $"info"("DP").cast("int").as("dp"),
          $"info"("AF").as("af_sliced"), $"variant_type")
    },

    // K1: chrom-partitioned store round trip — writeVariants partitions by
    // chrom and sorts by pos; reading the directory back (partition column
    // restored from the hive layout) must reproduce the rows bit-for-bit
    "vcf_store_roundtrip" -> { (s, _) =>
      import s.implicits._
      val dir = "/tmp/graft_store_roundtrip"
      val df = Seq(
        ("chr1", 100L, "A", "G", 10.0),
        ("chr1", 50L, "C", "T", 20.0),
        ("chr2", 300L, "G", "A", 30.0),
        ("chr10", 7L, "T", "C", 40.0)).toDF("chrom", "pos", "ref", "alt", "qual")
      graft.sinks.Writers.writeVariants(df, dir)
      s.read.parquet(dir).select($"chrom", $"pos", $"ref", $"alt", $"qual")
        .orderBy($"chrom", $"pos")
    },

    // K1d: gene covering projection — writeGeneIndex keeps only annotated
    // rows with the reference's INCLUDE columns, gene-sorted. The INPUT
    // rows land in a separate parquet and the oracle re-derives the
    // expected projection (filter + select + sort) from THAT, so a
    // writer row-selection bug (dropping eligible rows) fails the key —
    // the Spark side reads back the writer's output.
    "vcf_gene_index" -> { (s, _) =>
      import s.implicits._
      val inDir = "/tmp/graft_gene_index_input"
      val dir = "/tmp/graft_gene_index"
      Seq(
        ("chr1", 100L, "A", "G", Some("BRCA2"), Some("HIGH"), Some("stop_gained"), 1L),
        ("chr1", 200L, "C", "T", Some("TP53"), Some("MODERATE"), Some("missense_variant"), 2L),
        ("chr2", 300L, "G", "A", Some("BRCA2"), Some("LOW"), Some("synonymous_variant"), 3L),
        ("chr2", 400L, "T", "C", None: Option[String], None: Option[String], None: Option[String], 4L))
        .toDF("chrom", "pos", "ref", "alt", "gene", "impact", "consequence", "variant_id")
        .coalesce(1).write.mode("overwrite").parquet(inDir)
      graft.sinks.Writers.writeGeneIndex(s.read.parquet(inDir), dir)
      s.read.parquet(dir).filter($"gene" === "BRCA2")
        .select($"gene", $"chrom", $"pos", $"ref", $"alt",
          $"impact", $"consequence", $"variant_id")
        .orderBy($"chrom", $"pos")
    },

    // K1b: rsID covering projection — writeRsidIndex keeps rs_id-bearing
    // rows with EVERY column (the full row serves from one probe), sorted
    // by rs_id. As with vcf_gene_index, the oracle re-derives the
    // expectation from the separately written INPUT parquet, so the key
    // is self-contained against writer row-selection bugs.
    "vcf_rsid_index" -> { (s, _) =>
      import s.implicits._
      val inDir = "/tmp/graft_rsid_index_input"
      val dir = "/tmp/graft_rsid_index"
      Seq(
        ("chr1", 100L, "A", "G", Some("rs1"), 10.0, "snp"),
        ("chr1", 200L, "C", "T", None: Option[String], 20.0, "snp"),
        ("chr2", 300L, "G", "GA", Some("rs2"), 30.0, "indel"),
        ("chr2", 400L, "T", "C", Some("rs1"), 40.0, "snp"))
        .toDF("chrom", "pos", "ref", "alt", "rs_id", "qual", "variant_type")
        .coalesce(1).write.mode("overwrite").parquet(inDir)
      graft.sinks.Writers.writeRsidIndex(s.read.parquet(inDir), dir)
      s.read.parquet(dir).filter($"rs_id" === "rs1")
        .select($"chrom", $"pos", $"ref", $"alt", $"rs_id", $"qual", $"variant_type")
        .orderBy($"chrom", $"pos")
    },

    // K5: TSV sink round trip — complex columns (info map, filter array)
    // JSON-stringify on write; the RFC-4180 output must read back
    // identically in any standard reader (the oracle uses DuckDB's)
    "vcf_tsv_roundtrip" -> { (s, _) =>
      import s.implicits._
      val dir = "/tmp/graft_tsv_roundtrip"
      val df = Seq(
        ("chr1", 100L, Map("DP" -> "30", "AF" -> "0.5"),
          Seq("q10", "lowconf"), 1.5),
        ("chr2", 200L, Map("DP" -> "7"), Seq.empty[String], 2.5))
        .toDF("chrom", "pos", "info", "filter", "score")
      graft.sinks.Writers.writeTsv(df, dir)
      s.read.option("sep", "\t").option("header", "true")
        .option("escape", "\"").csv(dir)
        .select($"chrom", $"pos".cast("long").as("pos"), $"info", $"filter",
          $"score".cast("double").as("score"))
        .orderBy($"chrom")
    },

    // J13: sample id-map join — genotypes keyed by sample natural key
    // joined to the (broadcast, sample-count-sized) attribute dimension,
    // then cohort-grouped (the reference's sample_id_map join face)
    "vcf_sample_join" -> { (s, _) =>
      import s.implicits._
      val g = Seq(
        ("chr1", 100L, "S1", 2.0), ("chr1", 100L, "S2", 1.0),
        ("chr1", 200L, "S1", 0.0), ("chr1", 200L, "S3", 1.0))
        .toDF("chrom", "pos", "sample_id", "dosage")
      val dim = Seq(
        ("S1", "EUR", "case"), ("S2", "AFR", "control"), ("S3", "EUR", "control"))
        .toDF("sample_id", "ancestry", "phenotype")
      g.join(broadcast(dim), Seq("sample_id"), "left")
        .groupBy($"ancestry", $"phenotype")
        .agg(count(lit(1)).as("n_gt"), sum($"dosage").as("dose_sum"))
        .orderBy($"ancestry", $"phenotype")
    },

    // K6 + F5 + A14: LDpred2 export — bare-chrom projection, per-study
    // n_eff = 4/(1/cases+1/controls), and the export-time variant filter
    // (hapmap3-only + min MAF) over the matview fixture pipeline
    "vcf_export_ldpred2" -> { (s, _) =>
      import s.implicits._
      val (vcf, panelTsv, gwasTsv) = writePrsCandidateFixtures()
      val v = VcfReader.variants(s, vcf)
      val qc = VariantQc.fromGenotypes(VcfReader.genotypes(s, vcf)).drop("n_samples")
      val flagged = graft.ingest.VariantMatching.flagHapmap3(
        v.join(qc, Seq("chrom", "pos", "ref", "alt"), "left"),
        graft.ingest.RefPanels.hapmap3(s, panelTsv))
      val gwas = graft.ingest.GwasReader.read(s, gwasTsv)
      val stats = graft.ingest.VariantMatching.matchToVariants(gwas, flagged)
        .filter($"variant_id".isNotNull)
        .select($"variant_id", $"effect_allele", $"other_allele",
          $"beta", $"standard_error", $"p_value")
      graft.export.PrsFormats.ldpred2(stats,
        flagged.select($"variant_id", $"chrom", $"pos", $"rs_id",
          $"in_hapmap3", $"maf"),
        nCases = Some(1000L), nControls = Some(2000L), sampleSize = None,
        vf = graft.export.PrsFormats.VariantFilter(
          hapmap3Only = true, minMaf = Some(0.01)))
    },

    // T9: FILTER split — PASS/'.' mean no failed filters, otherwise the
    // ';'-separated failure list, over gnomAD's real FILTER values
    "vcf_filter_split" -> { (s, _) =>
      import s.implicits._
      VcfReader.variants(s, s"$fixtures/gnomad_subset.vcf.gz")
        .select($"chrom", $"pos", $"ref", $"alt",
          concat_ws(";", $"filter").as("filters"),
          size($"filter").as("n_failed"))
    },

    // S11: TOML config scan — sectioned keys flattened to dotted form
    "vcf_toml_config" -> { (s, _) =>
      import s.implicits._
      val p = java.nio.file.Paths.get("/tmp/graft_config.toml")
      java.nio.file.Files.writeString(p,
        """# graft pipeline config
          |title = "graft"
          |[load]
          |batch_size = 10000   # rows per batch
          |normalize = true
          |min_info_score = 0.6
          |[export]
          |format = 'plink'
          |""".stripMargin)
      val cfg = graft.config.GraftConfig.load(p.toString)
      cfg.values.toSeq.sortBy(_._1).toDF("key", "value")
    },

    // §2.10: audit hash chain build + verification round trip
    "vcf_audit_chain" -> { (s, _) =>
      import s.implicits._
      val audit = Seq(
        (1L, "2024-01-01T00:00:00", "load", "pipeline", "load_vcf", true),
        (2L, "2024-01-01T01:00:00", "qc", "pipeline", "sample_qc", true),
        (3L, "2024-01-01T02:00:00", "export", "pipeline", "export_plink", true)
      ).toDF("audit_id", "event_time", "event_type", "user_name", "action", "success")
      graft.audit.Audit.verifyChain(graft.audit.Audit.withChainHashes(audit))
        .select($"audit_id", $"entry_hash", $"previous_hash", $"chain_valid")
    }
  )

  /** Deterministic trio VCF mirroring the reference's acceptance fixture
    * (de novo, autosomal-recessive, compound-het sites) plus a
    * multi-allelic site (chr5, ALT=G,T with Number=A AF) that exercises
    * per-ALT genotype decomposition end-to-end. */
  private[graft] def writeTrioFixture(): String = {
    val p = java.nio.file.Paths.get("/tmp/graft_trio.vcf")
    // always overwrite: a stale cached copy from a previous run would
    // silently pin old fixture content
    locally {
      java.nio.file.Files.writeString(p,
        """##fileformat=VCFv4.2
          |##INFO=<ID=SYMBOL,Number=1,Type=String,Description="gene">
          |##INFO=<ID=AF,Number=A,Type=Float,Description="alt AF">
          |##FORMAT=<ID=GT,Number=1,Type=String,Description="Genotype">
          |#CHROM	POS	ID	REF	ALT	QUAL	FILTER	INFO	FORMAT	CHILD	FATHER	MOTHER
          |chr1	1000	.	A	G	50	PASS	SYMBOL=GENE0;AF=0.5	GT	0/1	0/0	0/0
          |chr2	2000	.	C	T	50	PASS	SYMBOL=GENE2;AF=0.25	GT	1/1	0/1	0/1
          |chr3	3000	.	G	A	50	PASS	SYMBOL=GENE1;AF=0.125	GT	0/1	0/1	0/0
          |chr3	3100	.	T	C	50	PASS	SYMBOL=GENE1;AF=0.4	GT	0/1	0/0	0/1
          |chr4	4000	.	A	C	50	PASS	SYMBOL=GENE3;AF=0.3	GT	0/1	0/1	0/0
          |chr5	5000	.	A	G,T	50	PASS	SYMBOL=GENE4;AF=0.3,0.2	GT	1/2	0/1	0/2
          |""".stripMargin)
    }
    p.toString
  }

  /** Indel corpus for vcf_normalize: right-trim, left-trim, combined,
    * the pos=1 parsimony guard, and the no-genome empty-allele stop
    * (`normalizer.py:13-85` edge cases). */
  private[graft] def writeNormFixture(): String = {
    val p = java.nio.file.Paths.get("/tmp/graft_norm.vcf")
    locally {
      java.nio.file.Files.writeString(p,
        """##fileformat=VCFv4.2
          |#CHROM	POS	ID	REF	ALT	QUAL	FILTER	INFO
          |chr1	100	.	GCC	GCA	50	PASS	.
          |chr1	200	.	AT	ATT	50	PASS	.
          |chr1	300	.	A	G	50	PASS	.
          |chr1	400	.	CTCC	CCC	50	PASS	.
          |chr2	500	.	GCGC	GCGA,GCGT	50	PASS	.
          |chr3	1	.	AT	TT	50	PASS	.
          |chrM	1	.	C	CAC	50	PASS	.
          |chr4	700	.	A	CA	50	PASS	.
          |""".stripMargin)
    }
    p.toString
  }

  /** Variants VCF + GWAS-SSF TSV covering every match/harmonization
    * branch: direct, swapped, complement-only (rsid fallback), ambiguous
    * with AF rescue in both directions, ambiguous unresolvable, a
    * position-miss rsid fallback, and two multi-base rsid matches (rs700
    * reverse-pair indel, rs800 MNP reverse pair) that must NOT
    * strand-flip or AF-rescue — the reference's complement is a
    * whole-allele dict and its ambiguity test is single-base-set only
    * (`gwas/loader.py:68-77`), so a per-char translate would wrongly
    * harmonize both. */
  private[graft] def writeGwasFixtures(): (String, String) = {
    val vcf = java.nio.file.Paths.get("/tmp/graft_gwas_variants.vcf")
    java.nio.file.Files.writeString(vcf,
      """##fileformat=VCFv4.2
        |##INFO=<ID=AF,Number=A,Type=Float,Description="alt AF">
        |#CHROM	POS	ID	REF	ALT	QUAL	FILTER	INFO
        |chr1	100	rs100	A	G	50	PASS	AF=0.3
        |chr1	200	rs200	C	T	50	PASS	AF=0.4
        |chr1	300	rs300	G	A	50	PASS	AF=0.2
        |chr1	400	rs400	A	T	50	PASS	AF=0.25
        |chr1	500	rs500	C	G	50	PASS	AF=0.6
        |chr1	600	rs600	G	C	50	PASS	AF=0.5
        |chr1	700	rs700	AT	C	50	PASS	AF=0.3
        |chr1	800	rs800	GG	CC	50	PASS	AF=0.3
        |""".stripMargin)
    val tsv = java.nio.file.Paths.get("/tmp/graft_gwas_stats.tsv")
    java.nio.file.Files.writeString(tsv,
      """chromosome	base_pair_location	effect_allele	other_allele	p_value	beta	standard_error	eaf	rsid
        |1	100	G	A	1e-8	0.12	0.01	0.31	rs100
        |1	200	C	T	1e-7	-0.08	0.02	0.42	rs200
        |1	300	T	C	1e-6	0.05	0.01	0.19	rs300
        |1	400	A	T	1e-5	0.02	0.01	0.3	rs400
        |1	500	A	T	1e-4	0.01	0.01	0.58	rs500
        |1	500	T	A	1e-4	0.01	0.01	0.15
        |1	600	G	C	1e-3	0.03	0.01	0.5	rs600
        |1	999	G	A	1e-2	0.04	0.01	0.3	rs100
        |1	700	TA	G	1e-3	0.02	0.01	0.3	rs700
        |1	800	AT	TA	1e-3	0.02	0.01	0.31	rs800
        | 	900	A	G	1e-3	0.02	0.01	0.3	rs100
        |""".stripMargin)
    (vcf.toString, tsv.toString)
  }

  /** Minimac4- and Beagle-style imputed VCFs (source auto-sniff via
    * ##source; Beagle's multi-allelic DR2 exercises Number=A slicing). */
  private[graft] def writeImputationFixtures(): (String, String) = {
    val mini = java.nio.file.Paths.get("/tmp/graft_imp_minimac.vcf")
    java.nio.file.Files.writeString(mini,
      """##fileformat=VCFv4.2
        |##source=Minimac4
        |##INFO=<ID=R2,Number=1,Type=Float,Description="r2">
        |##INFO=<ID=IMPUTED,Number=0,Type=Flag,Description="">
        |##INFO=<ID=TYPED,Number=0,Type=Flag,Description="">
        |#CHROM	POS	ID	REF	ALT	QUAL	FILTER	INFO
        |chr1	100	.	A	G	50	PASS	R2=0.85;IMPUTED
        |chr1	200	.	C	T	50	PASS	R2=0.99;TYPED
        |chr1	300	.	G	A	50	PASS	.
        |""".stripMargin)
    val beagle = java.nio.file.Paths.get("/tmp/graft_imp_beagle.vcf")
    java.nio.file.Files.writeString(beagle,
      """##fileformat=VCFv4.2
        |##source=beagle5.4
        |##INFO=<ID=DR2,Number=A,Type=Float,Description="dr2">
        |##INFO=<ID=IMP,Number=0,Type=Flag,Description="">
        |#CHROM	POS	ID	REF	ALT	QUAL	FILTER	INFO
        |chr2	100	.	A	G	50	PASS	DR2=0.75;IMP
        |chr2	200	.	C	T	50	PASS	DR2=1.0
        |chr2	300	.	G	A	50	PASS	DR2=0.5
        |chr2	400	.	T	G,C	50	PASS	DR2=1.0,0.4;IMP
        |""".stripMargin)
    (mini.toString, beagle.toString)
  }

  /** CLNSIG precedence corpus (`type_mapping.py:90-138` cases). */
  private[graft] def writeClinvarFixture(): String = {
    val p = java.nio.file.Paths.get("/tmp/graft_clinvar.vcf")
    java.nio.file.Files.writeString(p,
      """##fileformat=VCFv4.2
        |##INFO=<ID=CLNSIG,Number=1,Type=String,Description="clinvar">
        |#CHROM	POS	ID	REF	ALT	QUAL	FILTER	INFO
        |chr1	100	.	A	G	50	PASS	CLNSIG=Pathogenic
        |chr1	200	.	C	T	50	PASS	CLNSIG=Likely_pathogenic
        |chr1	300	.	G	A	50	PASS	CLNSIG=Benign
        |chr1	400	.	T	C	50	PASS	CLNSIG=Likely_benign
        |chr1	500	.	A	C	50	PASS	CLNSIG=Uncertain_significance
        |chr1	600	.	C	G	50	PASS	CLNSIG=Conflicting_interpretations_of_pathogenicity
        |chr1	700	.	G	T	50	PASS	CLNSIG=Pathogenic/Likely_pathogenic
        |chr1	800	.	T	A	50	PASS	CLNSIG=Benign,drug_response
        |chr1	900	.	A	T	50	PASS	CLNSIG=Likely_benign,risk_factor
        |chr1	1000	.	C	A	50	PASS	CLNSIG=drug_response
        |chr1	1100	.	G	C	50	PASS	DP=10
        |""".stripMargin)
    p.toString
  }

  /** DS/GP dosage fixture: single-alt DS passthrough + GP fallback, and a
    * multi-allelic line exercising the Number=A DS slice and the
    * Number=G GP biallelic-triple per ALT. */
  private[graft] def writeDosageFixture(): String = {
    val p = java.nio.file.Paths.get("/tmp/graft_dosage.vcf")
    java.nio.file.Files.writeString(p,
      """##fileformat=VCFv4.2
        |##FORMAT=<ID=GT,Number=1,Type=String,Description="gt">
        |##FORMAT=<ID=DS,Number=A,Type=Float,Description="dosage">
        |##FORMAT=<ID=GP,Number=G,Type=Float,Description="probs">
        |#CHROM	POS	ID	REF	ALT	QUAL	FILTER	INFO	FORMAT	S1	S2	S3
        |chr1	100	.	A	G	50	PASS	.	GT:DS:GP	0/1:0.9:0.1,0.7,0.2	0/0:.:0.8,0.15,0.05	1/1
        |chr1	200	.	C	T,G	50	PASS	.	GT:DS:GP	1/2:0.5,1.2:0.1,0.2,0.3,0.15,0.05,0.2	0/1:.:0.6,0.3,0.02,0.05,0.02,0.01	0/2
        |""".stripMargin)
    p.toString
  }

  /** VCF + HapMap3 panel + GWAS TSV for the prs_candidate_variants
    * matview: R2 info scores, per-ALT QC from 4 samples, panel overlap,
    * population AFs, and GWAS rows in direct orientation. */
  private[graft] def writePrsCandidateFixtures(): (String, String, String) = {
    val vcf = java.nio.file.Paths.get("/tmp/graft_prscand.vcf")
    java.nio.file.Files.writeString(vcf,
      """##fileformat=VCFv4.2
        |##INFO=<ID=R2,Number=1,Type=Float,Description="imputation r2">
        |##INFO=<ID=AF_nfe,Number=A,Type=Float,Description="">
        |##INFO=<ID=AF_afr,Number=A,Type=Float,Description="">
        |##INFO=<ID=AF_eas,Number=A,Type=Float,Description="">
        |##FORMAT=<ID=GT,Number=1,Type=String,Description="gt">
        |#CHROM	POS	ID	REF	ALT	QUAL	FILTER	INFO	FORMAT	SA	SB	SC	SD
        |chr1	100	rs1	A	G	50	PASS	R2=0.9;AF_nfe=0.2;AF_afr=0.1	GT	0/1	0/1	0/0	0/0
        |chr1	200	rs2	C	T	50	PASS	R2=0.4;AF_nfe=0.3	GT	0/1	0/0	0/0	0/0
        |chr1	300	rs3	G	A	50	PASS	R2=0.95;AF_afr=0.2	GT	0/1	0/1	0/0	0/0
        |chr1	400	rs4	T	C	50	PASS	R2=0.8;AF_eas=0.05	GT	0/0	0/0	0/0	0/0
        |chr1	500	rs5	A	C	50	PASS	R2=0.9;AF_eas=0.4	GT	0/1	0/1	1/1	0/0
        |chr1	600	rs6	G	T	50	PASS	R2=0.9;AF_nfe=0.1	GT	0/1	0/0	0/0	0/0
        |""".stripMargin)
    val panel = java.nio.file.Paths.get("/tmp/graft_prscand_panel.tsv")
    java.nio.file.Files.writeString(panel,
      """rsid	chrom	position	a1	a2
        |rs1	1	100	A	G
        |rs2	1	200	C	T
        |rs4	1	400	T	C
        |rs5	1	500	A	C
        |rs6	1	600	G	T
        |""".stripMargin)
    val gwas = java.nio.file.Paths.get("/tmp/graft_prscand_gwas.tsv")
    java.nio.file.Files.writeString(gwas,
      """chromosome	base_pair_location	effect_allele	other_allele	p_value	beta	standard_error
        |1	100	G	A	1e-8	0.12	0.01
        |1	200	T	C	1e-7	0.08	0.02
        |1	300	A	G	1e-6	0.05	0.01
        |1	400	C	T	1e-5	0.02	0.01
        |1	500	C	A	1e-4	0.04	0.015
        |""".stripMargin)
    (vcf.toString, panel.toString, gwas.toString)
  }

  /** Test hook: the gnomAD-style fixture path (also used by the
    * import-frequencies CLI round-trip spec). */
  private[graft] def writeGnomadFixtureForTest(): String = writeGnomadStyleFixture()

  /** gnomAD-style population-field VCF used by vcf_popmax (the public
    * gnomad_subset fixture declares but doesn't populate these fields). */
  private def writeGnomadStyleFixture(): String = {
    val p = java.nio.file.Paths.get("/tmp/graft_gnomad_style.vcf")
    locally {
      java.nio.file.Files.writeString(p,
        """##fileformat=VCFv4.2
          |##INFO=<ID=AF,Number=A,Type=Float,Description="AF">
          |##INFO=<ID=AC_afr,Number=A,Type=Integer,Description="">
          |##INFO=<ID=AN_afr,Number=1,Type=Integer,Description="">
          |##INFO=<ID=AF_afr,Number=A,Type=Float,Description="">
          |##INFO=<ID=AF_nfe,Number=A,Type=Float,Description="">
          |##INFO=<ID=AF_eas,Number=A,Type=Float,Description="">
          |##INFO=<ID=AF_fin,Number=A,Type=Float,Description="">
          |##INFO=<ID=nhomalt_afr,Number=A,Type=Integer,Description="">
          |#CHROM	POS	ID	REF	ALT	QUAL	FILTER	INFO
          |chr1	100	rs1	A	G	50	PASS	AF=0.1;AC_afr=20;AN_afr=100;AF_afr=0.2;AF_nfe=0.05;AF_fin=0.9;nhomalt_afr=3
          |chr1	200	rs2	C	T	50	PASS	AF=0.2;AF_nfe=0.4;AF_eas=0.35;AF_fin=0.95
          |chr2	300	rs3	G	A	50	PASS	AF=0.3;AF_afr=0.01;AF_nfe=0.02
          |""".stripMargin)
    }
    p.toString
  }
}
