package graft.ingest

import java.nio.file.Files
import graft.SparkSpec
import graft.query.FilterExpression
import graft.transform.PopulationFreq
import graft.prs.PrsScoring
import org.apache.spark.sql.functions._

class GwasReaderSpec extends SparkSpec {
  import spark.implicits._

  private def writeTsv(lines: String*): String = {
    val f = Files.createTempFile("gwas", ".tsv")
    Files.writeString(f, lines.mkString("\n") + "\n")
    f.toString
  }

  test("alias normalization and typed parse") {
    val p = writeTsv(
      "CHR\tPOS\tEA\tOA\tPVAL\tBETA\tSE\tEAF\tN\tSNP",
      "1\t1000000\ta\tg\t1e-8\t0.05\t0.01\t0.25\t50000.0\trs123",
      "chr2\t2000000\tT\tC\t0.5\t-0.01\t0.02\t\t\trs456")
    val df = GwasReader.read(spark, p)
    assert(df.columns.toSet.contains("chromosome"))
    val r = df.orderBy($"base_pair_location").head()
    assert(r.getAs[String]("chromosome") == "1")
    assert(r.getAs[Long]("base_pair_location") == 1000000L)
    assert(r.getAs[String]("effect_allele") == "A") // upper-cased
    assert(r.getAs[Double]("p_value") == 1e-8)
    assert(r.getAs[Int]("n") == 50000) // int(float(x))
    assert(r.getAs[String]("rsid") == "rs123")
  }

  test("two source headers mapping to one canonical name keep one column") {
    // a GWAS TSV carrying BOTH 'snp' and 'rsid' must not rename both
    // onto 'rsid' (duplicate columns → every later col() reference is
    // ambiguous and the read crashes); first-wins
    val p = java.nio.file.Files.createTempFile("gwas_dup", ".tsv")
    java.nio.file.Files.writeString(p,
      "snp\trsid\tchromosome\tbase_pair_location\teffect_allele\tother_allele\tbeta\tp_value\n" +
      "mk1\trs42\t1\t1000\tA\tG\t0.1\t0.05\n")
    val df = GwasReader.read(spark, p.toString)
    assert(df.columns.count(_ == "rsid") == 1)
    assert(df.select("rsid").head().getString(0) == "rs42")
  }

  test("missing required column raises") {
    val p = writeTsv("chr\tpos\tea\tpval", "1\t100\tA\t0.5")
    val e = intercept[GwasReader.GwasParseError](GwasReader.read(spark, p))
    assert(e.getMessage.contains("other_allele"))
  }

  test("blank required values drop the row; blank optionals are NULL not empty") {
    // get_value (`gwas/loader.py:249-256`) strips and treats "" as
    // missing — a whitespace-only chromosome/allele is an absent value
    // (the reference aborts the file; the documented deviation here is
    // a row-level drop), and a blank optional lands as NULL
    val p = writeTsv(
      "chr\tpos\tea\toa\tpval\trsid",
      "1\t100\tA\tG\t0.5\trs1",
      " \t200\tA\tG\t0.5\trs2",   // blank chromosome -> dropped
      "1\t300\t \tG\t0.5\trs3",   // blank effect allele -> dropped
      "1\t400\tA\t \t0.5\trs4")   // blank OTHER allele -> kept, NULL oa
    val df = GwasReader.read(spark, p)
    val rows = df.select($"rsid", $"other_allele").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(rows.keySet == Set("rs1", "rs4"))
    assert(rows("rs4") == null)
  }
}

class PgsReaderSpec extends SparkSpec {
  import spark.implicits._

  test("metadata header + aliased body") {
    val (meta, body) = PgsReader.read(spark, fixture("pgs_test_beta.txt"))
    assert(meta.pgsId == "PGS000001")
    assert(PgsReader.normalizeBuild(meta.genomeBuild) == "GRCh38")
    assert(meta.weightType.contains("beta"))
    assert(meta.nVariants.contains(10))
    val r = body.filter($"rsid" === "rs3094315").head()
    assert(r.getAs[String]("chr_name") == "1")
    assert(r.getAs[Long]("chr_position") == 752566L)
    assert(math.abs(r.getAs[Double]("effect_weight") - 0.0234) < 1e-12)
    assert(r.getAs[String]("pgs_id") == "PGS000001")
  }

  test("odds-ratio weights are stored RAW; weight_type is metadata only") {
    // the reference never transforms effect_weight — weight_type=OR /
    // log(OR) is recorded on the score row and the value is inserted
    // as-is (`prs/pgs_catalog.py:286-342`, `prs/loader.py:113`); an
    // invented ln(OR) conversion would silently change every PRS score
    // computed from an OR-typed file
    val (meta, body) = PgsReader.read(spark, fixture("pgs_test_or.txt"))
    assert(meta.pgsId == "PGS000002")
    assert(meta.weightType.contains("OR"))
    val w = body.filter($"rsid" === "rs3094315").head()
      .getAs[Double]("effect_weight")
    assert(math.abs(w - 1.12) < 1e-12, s"OR weight must stay raw, got $w")
  }

  test("weight rows missing effect_allele or effect_weight are dropped; blanks are missing") {
    val p = java.nio.file.Files.createTempFile("pgs", ".txt")
    java.nio.file.Files.writeString(p,
      """###PGS CATALOG SCORING FILE
        |#pgs_id=PGS999999
        |#genome_build=GRCh38
        |rsID	chr_name	chr_position	effect_allele	other_allele	effect_weight
        |rs1	1	100	A	G	0.5
        |rs2	1	200	 	G	0.4
        |rs3	1	300	C	G
        |rs4	 	400	G	A	0.3
        |""".stripMargin)
    val (_, body) = PgsReader.read(spark, p.toString)
    val rows = body.select($"rsid", $"chr_name").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    // rs2 (blank effect_allele) and rs3 (blank weight) drop; rs4 keeps
    // the row but its whitespace-only chr_name is NULL, not " "
    assert(rows.keySet == Set("rs1", "rs4"))
    assert(rows("rs4") == null)
  }
}

class RefPanelsSpec extends SparkSpec {
  import spark.implicits._

  test("hapmap3 TSV loads bare-chrom typed rows") {
    val p = RefPanels.hapmap3(spark, fixture("hapmap3_test.tsv"))
    assert(p.count() == 25)
    val r = p.filter($"rsid" === "rs3094315").head()
    assert(r.getAs[String]("chrom") == "1")
    assert(r.getAs[Long]("position") == 752566L)
    assert(r.getAs[String]("a1") == "G" && r.getAs[String]("a2") == "A")
  }

  test("LD blocks BED with population/build normalization") {
    val b = RefPanels.ldBlocks(spark, fixture("ld_blocks_eur_grch37.bed"), "eur", "grch37")
    assert(b.count() > 0)
    val r = b.orderBy($"start_pos").head()
    assert(r.getAs[String]("population") == "EUR")
    assert(r.getAs[String]("genome_build") == "GRCh37")
    assert(r.getAs[Long]("start_pos") == 10583L)
    val stats = RefPanels.ldBlockStats(b).head()
    assert(stats.getAs[Long]("n_blocks") == b.count())
  }
}

class VariantMatchingSpec extends SparkSpec {
  import spark.implicits._

  private lazy val variants = Seq(
    ("chr1", 100L, "A", "G", "rs1"),
    ("chr1", 200L, "C", "T", "rs2"),
    ("chr2", 300L, "G", "GA", null.asInstanceOf[String])
  ).toDF("chrom", "pos", "ref", "alt", "rs_id")

  test("priority: direct beats swapped beats rsid") {
    val stats = Seq(
      // direct: (oa,ea) == (ref,alt)
      ("1", 100L, "G", "A", null.asInstanceOf[String]),
      // swapped: (ea,oa) == (ref,alt)
      ("1", 200L, "C", "T", null.asInstanceOf[String]),
      // no positional match; rsid fallback
      ("1", 999L, "A", "G", "rs2"),
      // unmatched
      ("3", 1L, "A", "G", null.asInstanceOf[String])
    ).toDF("chromosome", "base_pair_location", "effect_allele", "other_allele", "rsid")

    val m = VariantMatching.matchToVariants(stats, variants).cache()
    val byPos = m.collect().map(r =>
      (r.getAs[Long]("base_pair_location"), r.getAs[String]("match_type"))).toMap
    assert(byPos(100L) == "direct")
    assert(byPos(200L) == "swapped")
    assert(byPos(999L) == "rsid")
    assert(byPos(1L) == null)
    // matched variant_id equals the deterministic surrogate of the variant
    val vids = VariantMatching.withVariantId(variants)
      .select($"pos", $"variant_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val got = m.filter($"base_pair_location" === 100L).head().getAs[Long]("variant_id")
    assert(got == vids(100L))
  }

  test("matching is stable under repartitioning of the stats input") {
    // the row id is content-derived, so re-evaluating the stats lineage
    // with a different partitioning (repartition here; AQE re-plans at
    // scale) must not change any match — positional ids would
    val stats = Seq(
      ("1", 100L, "G", "A", null.asInstanceOf[String]),
      ("1", 200L, "C", "T", null.asInstanceOf[String]),
      ("1", 999L, "A", "G", "rs2"),
      ("3", 1L, "A", "G", null.asInstanceOf[String]),
      // a fully duplicated row: both copies must survive with the match
      ("1", 100L, "G", "A", null.asInstanceOf[String])
    ).toDF("chromosome", "base_pair_location", "effect_allele", "other_allele", "rsid")

    def summarize(df: org.apache.spark.sql.DataFrame) =
      df.select($"base_pair_location", $"match_type", $"variant_id")
        .collect().map(r => (r.getLong(0), r.getString(1),
          if (r.isNullAt(2)) -1L else r.getLong(2))).sorted.toSeq

    val plain = summarize(VariantMatching.matchToVariants(stats, variants))
    val shuffled = summarize(
      VariantMatching.matchToVariants(stats.repartition(7), variants))
    assert(plain == shuffled)
    assert(plain.length == 5) // duplicates preserved, not collapsed
    assert(plain.count(t => t._1 == 100L && t._2 == "direct") == 2)
  }

  test("isEffectAlleleAlt harmonization directions") {
    val df = Seq(
      ("G", "A", "A", "G", Some(true)),   // ea==alt, oa==ref
      ("A", "G", "A", "G", Some(false)),  // ea==ref
      ("C", "T", "A", "G", Some(true)),   // complement: C→G alt, T→A ref
      ("G", "A", "T", "C", Some(false)),  // complement hits ref
      ("A", "G", "A", "C", None)          // unmatched in any orientation
    ).toDF("ea", "oa", "ref", "alt", "exp")
    val rows = df.withColumn("m",
      VariantMatching.isEffectAlleleAlt($"ea", $"oa", $"ref", $"alt")).collect()
    assert(rows(0).getAs[Boolean]("m") == true)
    assert(rows(1).getAs[Boolean]("m") == false)
    assert(rows(2).getAs[Boolean]("m") == true)
    assert(rows(4).isNullAt(rows(4).fieldIndex("m")))
  }

  test("harmonizeAlleles: direct/flip/AF-proximity rescue (gwas/loader.py:115-190 vectors)") {
    // (ea, oa, ref, alt, eaf, vcfAf) -> (is_match, is_flipped, is_effect_allele_alt)
    val df = Seq(
      ("A", "G", "G", "A", None, None),                 // direct: match, ea==alt
      ("T", "C", "G", "A", None, None),                 // strand flip: match, flipped
      ("A", "T", "A", "T", Some(0.3), Some(0.7)),       // ambiguous, set matches -> direct branch
      ("ATG", "A", "C", "T", None, None),               // incompatible
      ("A", "T", "C", "G", Some(0.28), Some(0.3)),      // ambiguous mismatch, |EAF-AF|<0.1 -> EA=ALT
      ("A", "T", "C", "G", Some(0.65), Some(0.3)),      // flipped freq within 0.1 -> EA=REF
      ("A", "T", "C", "G", Some(0.5), Some(0.2)),       // neither within 0.1 -> no match
      ("A", "T", "C", "G", None, Some(0.3))             // ambiguous, no EAF -> no match
    ).toDF("ea", "oa", "ref", "alt", "eaf", "vcfaf")
    val rows = df.withColumn("h", VariantMatching.harmonizeAlleles(
        $"ea", $"oa", $"ref", $"alt", $"eaf", $"vcfaf"))
      .select($"h.is_match", $"h.is_flipped", $"h.is_effect_allele_alt").collect()
    def triple(i: Int) = (rows(i).getBoolean(0),
      if (rows(i).isNullAt(1)) null else rows(i).getBoolean(1),
      if (rows(i).isNullAt(2)) null else rows(i).getBoolean(2))
    assert(triple(0) == ((true, false, true)))
    assert(triple(1) == ((true, true, true)))
    assert(triple(2) == ((true, false, false)))
    assert(triple(3) == ((false, null, null)))
    assert(triple(4) == ((true, false, true)))
    assert(triple(5) == ((true, false, false)))
    assert(triple(6) == ((false, null, null)))
    assert(triple(7) == ((false, null, null)))
  }

  test("harmonizeAlleles: multi-base alleles never strand-flip or AF-rescue") {
    // the reference's complement_allele (gwas/loader.py:74-77) is a
    // WHOLE-ALLELE dict lookup — "TA" complements to "TA", not "AT" — and
    // is_strand_ambiguous (:68-72) is set-equality with {A,T}/{C,G}, so
    // indel/MNP pairs are neither complementable nor ambiguous. A
    // per-character translate would wrongly flip row 0 and AF-rescue
    // row 1.
    val df = Seq(
      ("TA", "G", "AT", "C", None, None),               // per-char comp would "flip"
      ("AT", "TA", "GG", "CC", Some(0.31), Some(0.3)),  // per-char comp(AT)=TA==oa would AF-rescue
      ("AT", "C", "AT", "C", None, None),               // multi-base direct still matches
      ("AT", "C", "C", "AT", Some(0.3), Some(0.3))      // multi-base swapped still matches
    ).toDF("ea", "oa", "ref", "alt", "eaf", "vcfaf")
    val rows = df.withColumn("h", VariantMatching.harmonizeAlleles(
        $"ea", $"oa", $"ref", $"alt", $"eaf", $"vcfaf"))
      .select($"h.is_match", $"h.is_flipped", $"h.is_effect_allele_alt").collect()
    def triple(i: Int) = (rows(i).getBoolean(0),
      if (rows(i).isNullAt(1)) null else rows(i).getBoolean(1),
      if (rows(i).isNullAt(2)) null else rows(i).getBoolean(2))
    assert(triple(0) == ((false, null, null)))
    assert(triple(1) == ((false, null, null)))
    assert(triple(2) == ((true, false, false)))
    assert(triple(3) == ((true, false, true)))
  }

  test("hapmap3 flagging: multi-base complement arm collapses to exact (no per-char flag)") {
    import org.apache.spark.sql.functions.lit
    val v = Seq(("chr1", 100L, "AT", "C"), ("chr1", 200L, "A", "G"))
      .toDF("chrom", "pos", "ref", "alt")
      .withColumn("rs_id", lit(null).cast("string"))
    // panel entry (TA, G) at pos 100 is the per-char translate of the
    // variant's (AT, C) — hapmap3.py's dict complement leaves "AT"
    // unchanged, so this must NOT flag; the single-base complement at
    // pos 200 (panel holds T/C = complement of A/G) must flag
    val panel = Seq(("rsX", "1", 100L, "TA", "G"), ("rsY", "1", 200L, "T", "C"))
      .toDF("rsid", "chrom", "position", "a1", "a2")
    val flagged = VariantMatching.flagHapmap3(v, panel).cache()
    assert(!flagged.filter($"pos" === 100L).head().getAs[Boolean]("in_hapmap3"),
      "multi-base reverse pair must not complement-match")
    assert(flagged.filter($"pos" === 200L).head().getAs[Boolean]("in_hapmap3"))
  }

  test("hapmap3 flagging on overlap fixture") {
    val v = graft.vcf.VcfReader.variants(spark, fixture("hapmap3_overlap.vcf"))
    val panel = RefPanels.hapmap3(spark, fixture("hapmap3_test.tsv"))
    val flagged = VariantMatching.flagHapmap3(v, panel).cache()
    // first 5 sites in the fixture are exact hapmap3 entries
    val hit = flagged.filter($"in_hapmap3")
    assert(hit.count() >= 5)
    assert(flagged.filter($"pos" === 752566L).head().getAs[String]("hapmap3_rsid") == "rs3094315")
    // non-panel site not flagged
    assert(!flagged.filter($"pos" === 850000L).head().getAs[Boolean]("in_hapmap3"))
  }

  test("LD block interval assignment") {
    val v = Seq(("chr1", 11000L, "A", "G"), ("chr1", 2000000L, "C", "T"),
      ("chr9", 11000L, "A", "G"))
      .toDF("chrom", "pos", "ref", "alt")
    val blocks = RefPanels.ldBlocks(spark, fixture("ld_blocks_eur_grch37.bed"), "EUR")
    val assigned = LdBlocks.assignBlocks(v, blocks, "EUR").cache()
    val b1 = assigned.filter($"pos" === 11000L && $"chrom" === "chr1").head()
    assert(!b1.isNullAt(b1.fieldIndex("ld_block_id"))) // inside block 1
    val b2 = assigned.filter($"pos" === 2000000L).head()
    assert(!b2.isNullAt(b2.fieldIndex("ld_block_id"))) // block 2
    assert(b1.getAs[Long]("ld_block_id") != b2.getAs[Long]("ld_block_id"))
    val none = assigned.filter($"chrom" === "chr9").head()
    assert(none.isNullAt(none.fieldIndex("ld_block_id"))) // chr9 has no blocks in EUR file? (file covers chr1..)
  }

  test("a variant on a shared block boundary assigns ONE block, row count kept") {
    // contiguous blocks share boundary positions under inclusive
    // containment; the join must not duplicate the variant row (the
    // reference's UPDATE can't — our join previously could, and the
    // annotate-ld-blocks verb persists the result into the store)
    val blocks = Seq(
      ("1", 100L, 200L, "EUR", "GRCh37", 11L),
      ("1", 200L, 300L, "EUR", "GRCh37", 22L))
      .toDF("chrom", "start_pos", "end_pos", "population", "genome_build", "block_id")
    val v = Seq(("chr1", 200L, "A", "G"), ("chr1", 150L, "C", "T"))
      .toDF("chrom", "pos", "ref", "alt")
    Seq(LdBlocks.assignBlocks(v, blocks, "EUR"),
        LdBlocks.assignBlocksBinned(v, blocks, "EUR")).foreach { out =>
      assert(out.count() == 2, "boundary match duplicated a variant row")
      val boundary = out.filter($"pos" === 200L).head()
      // deterministic smallest (start, id): the earlier block wins
      assert(boundary.getAs[Long]("ld_block_id") == 11L)
    }
  }

  test("binned LD assignment ≡ broadcast interval join, and plans as a " +
    "shuffle equi-join (the broadcast-too-big scale path)") {
    val v = graft.vcf.VcfReader.variants(spark, fixture("hapmap3_overlap.vcf"))
    val blocks = RefPanels.ldBlocks(spark, fixture("ld_blocks_eur_grch37.bed"), "EUR")
    val bnlj = LdBlocks.assignBlocks(v, blocks, "EUR")
      .select($"chrom", $"pos", $"ref", $"alt", $"ld_block_id")
    val binned = LdBlocks.assignBlocksBinned(v, blocks, "EUR")
      .select($"chrom", $"pos", $"ref", $"alt", $"ld_block_id")
    assert(binned.exceptAll(bnlj).count() == 0)
    assert(bnlj.exceptAll(binned).count() == 0)
    // binning crosses boundaries: a variant whose bin differs from its
    // block's start bin still matches (block 2 spans 1,200,001-3,500,000;
    // pos 2,000,000 sits in bin 2 while the block starts in bin 1)
    val vCross = Seq(("chr1", 2000000L, "C", "T"))
      .toDF("chrom", "pos", "ref", "alt")
    val crossBin = LdBlocks.assignBlocksBinned(vCross, blocks, "EUR").head()
    assert(!crossBin.isNullAt(crossBin.fieldIndex("ld_block_id")))
    // with broadcast off the binned form must stay an equi-join — no
    // nested loop, no cartesian
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val p = LdBlocks.assignBlocksBinned(v, blocks, "EUR")
        .queryExecution.executedPlan.toString
      assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin"),
        s"binned join not an equi-join:\n$p")
      assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"))
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("fuzz: harmonization matches literal twins of BOTH reference complement semantics (seeded)") {
    // The reference carries two complement semantics: gwas/loader.py's
    // WHOLE-ALLELE dict lookup (`loader.py:74-77`, used by
    // compute_is_effect_allele_alt :80-114 and harmonize_alleles
    // :115-190) and validation/sql_functions.py's PER-CHARACTER
    // TRANSLATE (`sql_functions.py:214-216`, used by alleles_match
    // :182-227). Each engine path must track ITS cited twin on random
    // allele pairs — including the boundary inputs where the two
    // semantics disagree (indels, MNPs, ambiguous A/T-C/G).

    // ---- literal Scala twins of the Python/plpgsql reference ----
    // gwas/loader.py:74-77
    def complementWhole(a: String): String = {
      val u = a.toUpperCase
      Map("A" -> "T", "T" -> "A", "C" -> "G", "G" -> "C").getOrElse(u, u)
    }
    // gwas/loader.py:68-72
    def ambiguousTwin(a1: String, a2: String): Boolean = {
      val p = Set(a1.toUpperCase, a2.toUpperCase)
      p == Set("A", "T") || p == Set("C", "G")
    }
    // gwas/loader.py:80-114
    def effectAltTwin(ea: String, oa: String, ref: String, alt: String): Option[Boolean] = {
      val (e, o, r, a) = (ea.toUpperCase, oa.toUpperCase, ref.toUpperCase, alt.toUpperCase)
      if (e == a && o == r) Some(true)
      else if (e == r && o == a) Some(false)
      else {
        val (ec, oc) = (complementWhole(e), complementWhole(o))
        if (ec == a && oc == r) Some(true)
        else if (ec == r && oc == a) Some(false)
        else None
      }
    }
    // gwas/loader.py:115-190 → (is_match, is_flipped, is_effect_allele_alt)
    def harmonizeTwin(ea: String, oa: String, ref: String, alt: String,
        eaf: Option[Double], af: Option[Double])
        : (Boolean, Option[Boolean], Option[Boolean]) = {
      val (e, o, r, a) = (ea.toUpperCase, oa.toUpperCase, ref.toUpperCase, alt.toUpperCase)
      if (Set(e, o) == Set(r, a)) (true, Some(false), Some(e == a))
      else {
        val (ec, oc) = (complementWhole(e), complementWhole(o))
        if (Set(ec, oc) == Set(r, a)) (true, Some(true), Some(ec == a))
        else if (ambiguousTwin(e, o) && eaf.isDefined && af.isDefined) {
          val fdDirect = math.abs(eaf.get - af.get)
          val fdFlipped = math.abs((1 - eaf.get) - af.get)
          if (fdDirect < 0.1) (true, Some(false), Some(true))
          else if (fdFlipped < 0.1) (true, Some(false), Some(false))
          else (false, None, None)
        } else (false, None, None)
      }
    }
    // validation/sql_functions.py:214-216
    def translateTwin(s: String): String = s.toUpperCase.map {
      case 'A' => 'T'; case 'C' => 'G'; case 'G' => 'C'; case 'T' => 'A'
      case c => c
    }
    // validation/sql_functions.py:182-227 (NULL-strict)
    def allelesMatchTwin(ref1: String, alt1: String, ref2: String, alt2: String)
        : Option[Boolean] =
      if (ref1 == null || alt1 == null || ref2 == null || alt2 == null) None
      else {
        val (r1, a1, r2, a2) = (ref1.toUpperCase, alt1.toUpperCase,
          ref2.toUpperCase, alt2.toUpperCase)
        val (r1c, a1c) = (translateTwin(r1), translateTwin(a1))
        Some((r1 == r2 && a1 == a2) || (r1 == a2 && a1 == r2) ||
          (r1c == r2 && a1c == a2) || (r1c == a2 && a1c == r2))
      }

    // ---- seeded generator biased toward the disagreement boundary ----
    val rnd = new scala.util.Random(20260814L)
    val bases = Array("A", "C", "G", "T")
    def allele(): String = rnd.nextInt(10) match {
      case 0 | 1 | 2 | 3 | 4 => bases(rnd.nextInt(4))                  // SNP
      case 5 => bases(rnd.nextInt(4)).toLowerCase                      // case noise
      case 6 | 7 => (1 to 2 + rnd.nextInt(3))                          // MNP/indel
        .map(_ => bases(rnd.nextInt(4))).mkString
      case 8 => Seq("AT", "TA", "CG", "GC")(rnd.nextInt(4))            // reverse-pair bait
      case _ => Seq("<DEL>", "N", "*")(rnd.nextInt(3))                 // symbolic
    }
    def freq(): Option[Double] =
      if (rnd.nextInt(4) == 0) None
      else Some(math.rint(rnd.nextDouble() * 100) / 100)
    val cases = (1 to 4000).map { i =>
      // quarter of the rows force near-miss structure: derive (ref, alt)
      // from (ea, oa) by swap / whole-complement / per-char-translate so
      // every branch (incl. the two-semantics disagreements) is exercised
      val (ea, oa) = (allele(), allele())
      val (ref, alt) = rnd.nextInt(8) match {
        case 0 => (oa, ea)
        case 1 => (complementWhole(ea), complementWhole(oa))
        case 2 => (translateTwin(ea), translateTwin(oa))
        case 3 => (translateTwin(oa), translateTwin(ea))
        case _ => (allele(), allele())
      }
      (i.toLong, ea, oa, ref, alt, freq(), freq())
    }
    val df = cases.toDF("id", "ea", "oa", "ref", "alt", "eaf", "vcfaf")
    val got = df.select($"id",
        VariantMatching.isEffectAlleleAlt($"ea", $"oa", $"ref", $"alt").as("eaa"),
        VariantMatching.harmonizeAlleles(
          $"ea", $"oa", $"ref", $"alt", $"eaf", $"vcfaf").as("h"),
        graft.functions.GenomicsFunctions.allelesMatch(
          $"ea", $"oa", $"ref", $"alt").as("am"))
      .select($"id", $"eaa", $"h.is_match", $"h.is_flipped",
        $"h.is_effect_allele_alt", $"am")
      .collect().map(r => r.getLong(0) -> (
        if (r.isNullAt(1)) None else Some(r.getBoolean(1)),
        r.getBoolean(2),
        if (r.isNullAt(3)) None else Some(r.getBoolean(3)),
        if (r.isNullAt(4)) None else Some(r.getBoolean(4)),
        if (r.isNullAt(5)) None else Some(r.getBoolean(5)))).toMap
    var disagreements = 0
    cases.foreach { case (id, ea, oa, ref, alt, eaf, af) =>
      val (gEaa, gMatch, gFlip, gHEaa, gAm) = got(id)
      val label = s"case $id: ea=$ea oa=$oa ref=$ref alt=$alt eaf=$eaf af=$af"
      assert(gEaa == effectAltTwin(ea, oa, ref, alt), s"isEffectAlleleAlt $label")
      val (tMatch, tFlip, tEaa) = harmonizeTwin(ea, oa, ref, alt, eaf, af)
      assert(gMatch == tMatch, s"harmonize.is_match $label")
      assert(gFlip == tFlip, s"harmonize.is_flipped $label")
      assert(gHEaa == tEaa, s"harmonize.is_effect_allele_alt $label")
      assert(gAm == allelesMatchTwin(ea, oa, ref, alt), s"allelesMatch $label")
      // count rows where the two complement semantics genuinely diverge —
      // the generator must hit the boundary, not just agreeable SNPs
      val wholeMatch = harmonizeTwin(ea, oa, ref, alt, None, None)._1
      if (allelesMatchTwin(ea, oa, ref, alt).contains(true) != wholeMatch)
        disagreements += 1
    }
    assert(disagreements > 50,
      s"generator missed the dual-semantics boundary: only $disagreements")
    // NULL-strictness of the SQL twin rides through the column form
    val nulls = Seq((null.asInstanceOf[String], "A", "A", "T"))
      .toDF("r1", "a1", "r2", "a2")
      .select(graft.functions.GenomicsFunctions.allelesMatch(
        $"r1", $"a1", $"r2", $"a2").as("m")).head()
    assert(nulls.isNullAt(0))
  }
}

class FilterExpressionSpec extends SparkSpec {
  import spark.implicits._

  test("operator translation") {
    val fields = Set("gnomad_af", "clinvar_sig")
    assert(FilterExpression.parse("gnomad_af < 0.01 && clinvar_sig == 'Pathogenic'", fields) ==
      "gnomad_af < 0.01 AND clinvar_sig = 'Pathogenic'")
    assert(FilterExpression.parse("gnomad_af < 0.01 || gnomad_af IS NULL", fields) ==
      "gnomad_af < 0.01 OR gnomad_af IS NULL")
    assert(FilterExpression.parse("clinvar_sig != 'Benign'", fields) ==
      "clinvar_sig <> 'Benign'")
    assert(FilterExpression.parse("", fields) == "TRUE")
    // operators inside string literals must survive intact
    assert(FilterExpression.parse("clinvar_sig == 'A==B&&C'", fields) ==
      "clinvar_sig = 'A==B&&C'")
  }

  test("validation errors") {
    val fields = Set("af")
    assert(FilterExpression.validate("unknown_field < 1", fields)
      .exists(_.contains("Unknown field")))
    assert(FilterExpression.validate("(af < 1", fields)
      .contains("Unbalanced parentheses"))
    assert(FilterExpression.validate("af == 'open", fields)
      .contains("Unclosed string literal"))
    assert(FilterExpression.validate("af < 0.01 && af IS NOT NULL", fields).isEmpty)
  }

  test("applyFilter executes through Catalyst") {
    val df = Seq((0.001, "Pathogenic"), (0.5, "Benign")).toDF("gnomad_af", "clinvar_sig")
    val out = FilterExpression.applyFilter(df,
      "gnomad_af < 0.01 && clinvar_sig == 'Pathogenic'")
    assert(out.count() == 1)
    intercept[IllegalArgumentException] {
      FilterExpression.applyFilter(df, "nope == 1")
    }
  }
}

class PrsScoringSpec extends SparkSpec {
  import spark.implicits._

  test("per-sample weighted dosage sum with GT fallback") {
    val genotypes = Seq(
      // variant_id, sample, dosage, a1, a2
      (1L, "S1", Some(1.0), Some(0), Some(1)),
      (2L, "S1", None, Some(1), Some(1)),      // fallback → 2
      (1L, "S2", Some(0.0), Some(0), Some(0)),
      (2L, "S2", None, None, None)             // missing → excluded
    ).toDF("variant_id", "sample_id", "dosage", "a1", "a2")
    val weights = Seq((1L, 0.5), (2L, -0.25)).toDF("variant_id", "effect_weight")
    val s = PrsScoring.score(genotypes, weights).collect()
      .map(r => r.getAs[String]("sample_id") ->
        (r.getAs[Double]("prs_score"), r.getAs[Long]("n_variants_used"))).toMap
    assert(math.abs(s("S1")._1 - (0.5 * 1.0 + -0.25 * 2.0)) < 1e-12)
    assert(s("S1")._2 == 2)
    assert(math.abs(s("S2")._1 - 0.0) < 1e-12)
    assert(s("S2")._2 == 1)
  }
}

class PopulationFreqSpec extends SparkSpec {
  import spark.implicits._

  test("gnomAD wide INFO unpivots to long rows; popmax excludes bottlenecked") {
    // the gnomad_subset fixture declares population fields in the header
    // but its body rows don't carry them — synthesize a gnomAD-style VCF
    val vcf = Files.createTempFile("gnomad_style", ".vcf")
    Files.writeString(vcf,
      """##fileformat=VCFv4.2
        |##INFO=<ID=AF,Number=A,Type=Float,Description="AF">
        |##INFO=<ID=AC_afr,Number=A,Type=Integer,Description="">
        |##INFO=<ID=AN_afr,Number=1,Type=Integer,Description="">
        |##INFO=<ID=AF_afr,Number=A,Type=Float,Description="">
        |##INFO=<ID=AF_nfe,Number=A,Type=Float,Description="">
        |##INFO=<ID=AF_fin,Number=A,Type=Float,Description="">
        |##INFO=<ID=nhomalt_afr,Number=A,Type=Integer,Description="">
        |#CHROM	POS	ID	REF	ALT	QUAL	FILTER	INFO
        |chr1	100	rs1	A	G	50	PASS	AF=0.1;AC_afr=20;AN_afr=100;AF_afr=0.2;AF_nfe=0.05;AF_fin=0.9;nhomalt_afr=3
        |chr1	200	rs2	C	T	50	PASS	AF=0.2;AF_nfe=0.4;AF_fin=0.95
        |""".stripMargin)
    val v = graft.vcf.VcfReader.variants(spark, vcf.toString).cache()
    val long = PopulationFreq.toLong(v).cache()
    // rs1 → AFR,NFE,FIN rows; rs2 → NFE,FIN rows
    assert(long.count() == 5)
    val afr = long.filter($"pos" === 100L && $"population" === "AFR").head()
    assert(afr.getAs[Int]("ac") == 20 && afr.getAs[Int]("an") == 100)
    assert(math.abs(afr.getAs[Double]("af") - 0.2) < 1e-9)
    assert(afr.getAs[Int]("hom_count") == 3)
    val pm = PopulationFreq.popmax(long).cache()
    // FIN excluded: rs1 popmax = AFR 0.2 (not FIN 0.9); rs2 = NFE 0.4
    val byVid = pm.collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getString(2))).toMap
    assert(byVid.values.toSet == Set((0.2, "AFR"), (0.4, "NFE")))
  }

  test("popmax af ties break on the FULL population name") {
    // AFR vs AMR share a first character: a first-char tiebreak leaves
    // the winner nondeterministic across partitionings (and divergent
    // from the oracle's ORDER BY af DESC, population ASC)
    val long = Seq(
      (1L, "AMR", 0.25), (1L, "AFR", 0.25), (1L, "NFE", 0.10))
      .toDF("variant_id", "population", "af")
    val pm = PopulationFreq.popmax(long).head()
    assert(pm.getAs[String]("popmax_population") == "AFR")
    assert(pm.getAs[Double]("popmax_af") == 0.25)
  }
}
