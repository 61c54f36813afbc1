package graft.vcf

import graft.SparkSpec
import org.apache.spark.sql.functions._

class VcfHeaderSpec extends SparkSpec {

  test("parses INFO/FORMAT declarations with Number specs") {
    val h = VcfHeader.read(spark, fixture("multiallelic.vcf"))
    assert(h.infoFields("AF") == VcfFieldMeta("AF", "A", "Float",
      "Allele frequency, for each ALT allele, in the same order as listed"))
    assert(h.infoFields("culprit").number == "1")
    assert(h.formatFields("GT").tpe == "String")
    assert(h.samples == Seq("14211109415", "14211109355", "14212109543"))
    assert(h.contigs == Seq("1"))
  }

  test("quoted descriptions with commas don't split fields") {
    val m = VcfHeader.parseFieldDefinition(
      """ID=AD,Number=.,Type=Integer,Description="Allelic depths for the ref and alt alleles, in order"""")
    assert(m.contains(VcfFieldMeta("AD", ".", "Integer",
      "Allelic depths for the ref and alt alleles, in order")))
  }

  test("ANN header discovered from snpeff fixture") {
    val h = VcfHeader.read(spark, fixture("snpeff/test.ann.vcf"))
    assert(h.annFields.nonEmpty)
    assert(h.annFields.take(4) == Seq("Allele", "Annotation", "Annotation_Impact", "Gene_Name"))
  }

  test("gzipped header reads through codec") {
    val h = VcfHeader.read(spark, fixture("gnomad_subset.vcf.gz"))
    assert(h.infoFields.nonEmpty)
  }
}

class VcfReaderSpec extends SparkSpec {
  import spark.implicits._

  test("multi-allelic decomposition yields one row per ALT with sliced Number=A INFO") {
    val df = VcfReader.variants(spark, fixture("multiallelic.vcf"), VcfReader.Options())
      .cache()
    // 2 body lines: 1 single-ALT + 1 with 7 ALTs → 8 records
    assert(df.count() == 8)
    val multi = df.filter($"pos" === 2049437L).orderBy($"alt_idx")
      .select($"alt", $"info"("AF"), $"info"("culprit"), $"n_alts")
      .collect()
    assert(multi.length == 7)
    assert(multi(0).getString(0) == "CCTTTTTTTT")
    assert(multi(0).getString(1) == "0.152") // AF sliced per-ALT (Number=A)
    assert(multi(1).getString(1) == "0.09")
    assert(multi.forall(_.getString(2) == "DP")) // Number=1 untouched
    assert(df.filter($"pos" === 54712L).select($"info"("culprit")).head.getString(0) == "MQRankSum")
  }

  test("chrom normalization, rs_id/qual/filter handling") {
    val df = VcfReader.variants(spark, fixture("multiallelic.vcf"))
    val r = df.orderBy($"pos").head()
    assert(r.getAs[String]("chrom") == "chr1")
    assert(r.getAs[String]("rs_id") == null) // ID '.'
    assert(math.abs(r.getAs[Double]("qual") - 4104.83) < 1e-9)
    assert(r.getAs[scala.collection.Seq[String]]("filter").isEmpty) // PASS → []
    assert(r.getAs[String]("variant_type") == "snp")
  }

  test("ANN worst-consequence extraction picks highest impact for matching allele") {
    val df = VcfReader.variants(spark, fixture("snpeff/cancer.ann.vcf"))
      .filter($"pos" === 69091L).orderBy($"alt_idx").cache()
    val rows = df.select($"alt", $"gene", $"impact", $"consequence").collect()
    // ALT G has a HIGH start_lost entry in ANN; ALT C only mismatched alleles
    val g = rows.find(_.getString(0) == "G").get
    assert(g.getString(1) == "OR4F5")
    assert(g.getString(2) == "HIGH")
    assert(g.getString(3) == "start_lost")
  }

  test("ANN extraction on single-allele snpeff fixture") {
    val df = VcfReader.variants(spark, fixture("snpeff/test.ann.vcf"))
    val r = df.filter($"pos" === 10469L).head()
    assert(r.getAs[String]("gene") == "DDX11L1")
    assert(r.getAs[String]("impact") == "MODIFIER")
  }

  test("normalization integrates post-decomposition") {
    val df = VcfReader.variants(spark, fixture("multiallelic.vcf"),
      VcfReader.Options(normalize = true))
    // C>CCTTTTTTTT insertion: already minimal but ends identical? C vs
    // CCTTTTTTTT right-trim requires same trailing base: C vs T differ → unchanged
    val r = df.filter($"pos" === 2049437L && $"alt_idx" === 0).head()
    assert(!r.getAs[Boolean]("normalized"))
    assert(df.filter($"normalized").count() >= 0)
  }

  test("genotypes long table: GT parse, dosage, allele balance, ADJ") {
    val g = VcfReader.genotypes(spark, fixture("with_annotations.vcf")).cache()
    // 4 sites × 3 samples
    assert(g.count() == 12)
    val r = g.filter($"pos" === 15752321L && $"sample_id" === "HG002").head()
    assert(r.getAs[String]("gt") == "0/1")
    assert(!r.getAs[Boolean]("phased"))
    assert(r.getAs[Int]("a1") == 0 && r.getAs[Int]("a2") == 1)
    assert(r.getAs[Int]("dp") == 175)
    assert(r.getAs[Int]("gq") == 99)
    assert(r.getAs[scala.collection.Seq[Int]]("ad").toSeq == Seq(106, 69))
    // AB = 69/175
    assert(math.abs(r.getAs[Double]("allele_balance") - 69.0 / 175.0) < 1e-12)
    assert(r.getAs[Boolean]("passes_adj"))
    val missing = g.filter($"gt" === "./.")
    assert(missing.count() == 0) // trio fixture has no missing GTs
  }

  test("Number=R and Number=G slicing for multi-allelic sites") {
    // AD is Number=R ([ref, this-alt]); PL is Number=G: the VCF spec
    // orders diploid genotypes by F(j,k) = k(k+1)/2 + j, so alt a's
    // biallelic triple is indices {0, a(a+1)/2, a(a+1)/2 + a}. (The
    // reference's het term uses a instead of a(a+1)/2 — a spec
    // deviation its tests never reach; see VcfReader.slicedInfoMap.)
    val vcf = java.nio.file.Files.createTempFile("numrg", ".vcf")
    java.nio.file.Files.writeString(vcf,
      """##fileformat=VCFv4.2
        |##INFO=<ID=ADI,Number=R,Type=Integer,Description="per-allele depth">
        |##INFO=<ID=PLI,Number=G,Type=Integer,Description="likelihoods">
        |##INFO=<ID=DP,Number=1,Type=Integer,Description="depth">
        |#CHROM	POS	ID	REF	ALT	QUAL	FILTER	INFO
        |chr1	100	.	A	G,T	50	PASS	ADI=10,20,30;PLI=0,1,2,3,4,5;DP=60
        |""".stripMargin)
    val df = VcfReader.variants(spark, vcf.toString).orderBy($"alt_idx").cache()
    val rows = df.select($"alt", $"info"("ADI"), $"info"("PLI"), $"info"("DP")).collect()
    // alt G (idx 0): R → [v0, v1]; G → [pl0, pl1, pl2]
    assert(rows(0).getString(1) == "10,20")
    assert(rows(0).getString(2) == "0,1,2")
    // alt T (a=2): R → [v0, v2]; G → [pl0, pl3, pl5]
    //   (het (0,2) = 2·3/2 = 3; hom (2,2) = 3 + 2 = 5)
    assert(rows(1).getString(1) == "10,30")
    assert(rows(1).getString(2) == "0,3,5")
    // Number=1 untouched on both
    assert(rows.forall(_.getString(3) == "60"))
  }

  test("gz VCF reads end-to-end") {
    val df = VcfReader.variants(spark, fixture("gnomad_subset.vcf.gz"))
    assert(df.count() > 0)
    assert(df.filter($"chrom".startsWith("chr")).count() == df.count())
  }

  test("randomized GT per-ALT remap and DS slicing match the biallelic convention (seeded fuzz)") {
    // 100 random records × 1-3 ALTs × 3 samples with random GTs
    // (diploid / haploid / missing / phased): the decomposed row for alt
    // k must carry a1/a2 remapped by the bcftools-norm convention
    // (allele==k → 1, other non-missing → 0, '.' → null) and the k-th
    // DS value — the index arithmetic where the reference's own het-slot
    // bug lived, swept across shapes a fixed fixture can't cover
    val rnd = new scala.util.Random(880880L)
    final case class S(gt: String, ds: Seq[String])
    final case class Rec(pos: Long, alts: Seq[String], samples: Seq[S])
    val recs = (0 until 100).map { i =>
      val nAlt = 1 + rnd.nextInt(3)
      val alts = (0 until nAlt).map(j => Seq("C", "G", "T")(j))
      val samples = (0 until 3).map { _ =>
        def allele(): String =
          if (rnd.nextInt(8) == 0) "." else rnd.nextInt(nAlt + 1).toString
        val gt =
          if (rnd.nextInt(10) == 0) allele() // haploid
          else s"${allele()}${if (rnd.nextBoolean()) "|" else "/"}${allele()}"
        val ds = (0 until nAlt).map(_ =>
          if (rnd.nextInt(6) == 0) "." else f"${rnd.nextDouble() * 2}%.2f")
        S(gt, ds)
      }
      Rec(20000L + i * 10, alts, samples)
    }
    val vcf = java.nio.file.Files.createTempFile("fuzzgt", ".vcf")
    val sb = new StringBuilder
    sb ++= "##fileformat=VCFv4.2\n"
    sb ++= "##FORMAT=<ID=GT,Number=1,Type=String,Description=\"gt\">\n"
    sb ++= "##FORMAT=<ID=DS,Number=A,Type=Float,Description=\"ds\">\n"
    sb ++= "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\tS1\tS2\tS3\n"
    recs.foreach { r =>
      sb ++= s"chr1\t${r.pos}\t.\tA\t${r.alts.mkString(",")}\t50\tPASS\t.\tGT:DS"
      r.samples.foreach(s => sb ++= s"\t${s.gt}:${s.ds.mkString(",")}")
      sb ++= "\n"
    }
    java.nio.file.Files.writeString(vcf, sb.toString)
    val got = VcfReader.genotypes(spark, vcf.toString)
      .select($"pos", $"alt_idx", $"sample_id", $"a1", $"a2", $"ds")
      .collect().map { r =>
        (r.getLong(0), r.getInt(1), r.getString(2)) ->
          ((if (r.isNullAt(3)) null else Int.box(r.getInt(3))),
           (if (r.isNullAt(4)) null else Int.box(r.getInt(4))),
           (if (r.isNullAt(5)) null else Double.box(r.getDouble(5))))
      }.toMap
    recs.foreach { rec =>
      rec.alts.indices.foreach { idx =>
        val k = idx + 1
        rec.samples.zipWithIndex.foreach { case (s, si) =>
          val parts = s.gt.split("[/|]")
          def remap(a: String): Integer =
            if (a == ".") null else if (a.toInt == k) 1 else 0
          val expA1 = remap(parts(0))
          val expA2 = if (parts.length < 2) null else remap(parts(1))
          val expDs: java.lang.Double =
            if (s.ds(idx) == ".") null else s.ds(idx).toDouble
          val key = (rec.pos, idx, s"S${si + 1}")
          assert(got.contains(key), s"missing genotype row $key")
          val (a1, a2, ds) = got(key)
          assert(a1 == expA1 && a2 == expA2,
            s"$key gt=${s.gt} k=$k: got ($a1,$a2), want ($expA1,$expA2)")
          assert((ds == null && expDs == null) ||
            (ds != null && expDs != null && math.abs(ds - expDs) < 1e-9),
            s"$key ds: got $ds, want $expDs")
        }
      }
    }
  }

  test("randomized Number=A/R/G slicing matches the spec formulas (seeded fuzz)") {
    // 120 random records × 1-4 ALTs with random values (incl. '.'
    // missing entries and negatives): the decomposed row for alt index a
    // (1-based) must carry A→[v(a-1)], R→[v0, va],
    // G→[g0, g(a(a+1)/2), g(a(a+1)/2 + a)] — the fixed-vector test
    // above pins one case; this sweeps the index arithmetic across ALT
    // counts the way a fixed fixture can't
    val rnd = new scala.util.Random(77077L)
    val alleles = Seq("A", "C", "G", "T")
    def value(): String =
      if (rnd.nextInt(10) == 0) "."
      else if (rnd.nextBoolean()) rnd.nextInt(200).toString
      else f"${rnd.nextDouble() * 4 - 2}%.3f"
    final case class Rec(pos: Long, ref: String, alts: Seq[String],
                         a: Seq[String], r: Seq[String], g: Seq[String])
    val recs = (0 until 120).map { i =>
      val ref = alleles(rnd.nextInt(4))
      val nAlt = 1 + rnd.nextInt(4)
      // distinct single-base alts (may include MNP-ish strings too)
      val alts = (0 until nAlt).map(j =>
        if (rnd.nextInt(5) == 0) alleles(rnd.nextInt(4)) + alleles(rnd.nextInt(4))
        else alleles((alleles.indexOf(ref) + 1 + j) % 4) + (if (j >= 3) j.toString else ""))
        .distinct
      val n = alts.length
      Rec(10000L + i * 10, ref, alts,
        a = Seq.fill(n)(value()),
        r = Seq.fill(n + 1)(value()),
        g = Seq.fill((n + 1) * (n + 2) / 2)(value()))
    }
    val vcf = java.nio.file.Files.createTempFile("fuzzarg", ".vcf")
    val sb = new StringBuilder
    sb ++= "##fileformat=VCFv4.2\n"
    sb ++= "##INFO=<ID=FA,Number=A,Type=String,Description=\"a\">\n"
    sb ++= "##INFO=<ID=FR,Number=R,Type=String,Description=\"r\">\n"
    sb ++= "##INFO=<ID=FG,Number=G,Type=String,Description=\"g\">\n"
    sb ++= "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\n"
    recs.foreach { rec =>
      sb ++= s"chr1\t${rec.pos}\t.\t${rec.ref}\t${rec.alts.mkString(",")}\t50\tPASS\t"
      sb ++= s"FA=${rec.a.mkString(",")};FR=${rec.r.mkString(",")};FG=${rec.g.mkString(",")}\n"
    }
    java.nio.file.Files.writeString(vcf, sb.toString)
    val got = VcfReader.variants(spark, vcf.toString)
      .select($"pos", $"alt_idx", $"info"("FA").as("fa"),
        $"info"("FR").as("fr"), $"info"("FG").as("fg"))
      .collect().map(r => (r.getLong(0), r.getInt(1)) ->
        ((r.getString(2), r.getString(3), r.getString(4)))).toMap
    recs.foreach { rec =>
      rec.alts.indices.foreach { idx =>
        val a = idx + 1 // 1-based alt index
        val het = a * (a + 1) / 2
        val exp = (rec.a(idx), s"${rec.r(0)},${rec.r(a)}",
          s"${rec.g(0)},${rec.g(het)},${rec.g(het + a)}")
        val key = (rec.pos, idx)
        assert(got.contains(key), s"missing decomposed row $key")
        assert(got(key) == exp,
          s"pos=${rec.pos} alt#$a (${rec.alts(idx)} of ${rec.alts.length}): " +
            s"got ${got(key)}, want $exp")
      }
    }
  }

  test("triallelic GP slices to the spec triple; dosage from the het/hom slots") {
    // spec ordering for alts T,G: 0/0,0/1,1/1,0/2,1/2,2/2 — alt G (a=2)
    // takes {gp[0], gp[3], gp[5]} and dosage = gp[3] + 2·gp[5]
    val vcf = java.nio.file.Files.createTempFile("gdose", ".vcf")
    java.nio.file.Files.writeString(vcf,
      """##fileformat=VCFv4.2
        |##FORMAT=<ID=GT,Number=1,Type=String,Description="gt">
        |##FORMAT=<ID=GP,Number=G,Type=Float,Description="probs">
        |#CHROM	POS	ID	REF	ALT	QUAL	FILTER	INFO	FORMAT	S1
        |chr1	200	.	C	T,G	50	PASS	.	GT:GP	1/2:0.1,0.2,0.3,0.15,0.05,0.2
        |""".stripMargin)
    val g = VcfReader.genotypes(spark, vcf.toString)
      .orderBy($"alt_idx").collect()
    assert(g.length == 2)
    // alt T (a=1): triple {gp[0],gp[1],gp[2]} → dosage 0.2 + 2·0.3
    assert(math.abs(g(0).getAs[Double]("dosage") - 0.8) < 1e-9)
    // alt G (a=2): triple {gp[0],gp[3],gp[5]} → dosage 0.15 + 2·0.2
    assert(math.abs(g(1).getAs[Double]("dosage") - 0.55) < 1e-9)
  }

  test("genotypes drops the same malformed lines the variants scan drops") {
    val vcf = java.nio.file.Files.createTempFile("malg", ".vcf")
    java.nio.file.Files.writeString(vcf,
      """##fileformat=VCFv4.2
        |##FORMAT=<ID=GT,Number=1,Type=String,Description="gt">
        |#CHROM	POS	ID	REF	ALT	QUAL	FILTER	INFO	FORMAT	S1
        |chr1	100	.	A	G	50	PASS	.	GT	0/1
        |chr1	notanumber	.	A	G	50	PASS	.	GT	0/1
        |chr1	300	.		G	50	PASS	.	GT	0/1
        |""".stripMargin)
    val v = VcfReader.variants(spark, vcf.toString)
    val g = VcfReader.genotypes(spark, vcf.toString)
    assert(v.count() == 1 && g.count() == 1,
      s"v=${v.count()} g=${g.count()} — orphan genotype rows would join no variant")
  }

  test("multi-allelic het calls face the ADJ allele-balance criterion") {
    // 0/2 is heterozygous: AB below 0.2 must fail ADJ exactly as 0/1
    // does (the reference's biallelic HET_GENOTYPES whitelist waves
    // these through — genotype_loader.py:22)
    val vcf = java.nio.file.Files.createTempFile("adjm", ".vcf")
    java.nio.file.Files.writeString(vcf,
      """##fileformat=VCFv4.2
        |##FORMAT=<ID=GT,Number=1,Type=String,Description="gt">
        |##FORMAT=<ID=GQ,Number=1,Type=Integer,Description="gq">
        |##FORMAT=<ID=DP,Number=1,Type=Integer,Description="dp">
        |##FORMAT=<ID=AD,Number=R,Type=Integer,Description="ad">
        |#CHROM	POS	ID	REF	ALT	QUAL	FILTER	INFO	FORMAT	S1	S2
        |chr1	100	.	A	G,T	50	PASS	.	GT:GQ:DP:AD	0/2:99:50:47,0,3	1/2:99:50:2,24,24
        |""".stripMargin)
    val g = VcfReader.genotypes(spark, vcf.toString).cache()
    // S1: 0/2 with AB = 3/50 = 0.06 < 0.2 → fails ADJ on every ALT row
    assert(g.filter($"sample_id" === "S1").collect()
      .forall(!_.getAs[Boolean]("passes_adj")))
    // S2: 1/2 with AB = 48/50 ≥ 0.2 → passes
    assert(g.filter($"sample_id" === "S2").collect()
      .forall(_.getAs[Boolean]("passes_adj")))
  }

  test("chrom normalization strips the chr prefix case-insensitively") {
    val vcf = java.nio.file.Files.createTempFile("casec", ".vcf")
    java.nio.file.Files.writeString(vcf,
      """##fileformat=VCFv4.2
        |#CHROM	POS	ID	REF	ALT	QUAL	FILTER	INFO
        |Chr17	100	.	A	G	50	PASS	DP=1
        |CHR17	200	.	C	T	50	PASS	DP=1
        |chr17	300	.	G	A	50	PASS	DP=1
        |17	400	.	T	C	50	PASS	DP=1
        |""".stripMargin)
    val chroms = VcfReader.variants(spark, vcf.toString)
      .select($"chrom").distinct().collect().map(_.getString(0))
    assert(chroms.toSeq == Seq("chr17"),
      s"mixed-case contigs split into ${chroms.mkString(",")}")
  }

  test("haploid calls keep their single-allele gt and count as homs in QC") {
    // male chrX/Y and MT calls are haploid: GT '1' must not collapse to
    // the half-missing '1/.' (which QC would then skip — every
    // hemizygous site would report n_called=0)
    val vcf = java.nio.file.Files.createTempFile("haploid", ".vcf")
    java.nio.file.Files.writeString(vcf,
      """##fileformat=VCFv4.2
        |##FORMAT=<ID=GT,Number=1,Type=String,Description="gt">
        |#CHROM	POS	ID	REF	ALT	QUAL	FILTER	INFO	FORMAT	S1	S2	S3
        |chrX	100	.	A	G	50	PASS	.	GT	1	0	0/1
        |""".stripMargin)
    val g = graft.vcf.VcfReader.genotypes(spark, vcf.toString).cache()
    val gts = g.select($"sample_id", $"gt").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(gts == Map("S1" -> "1", "S2" -> "0", "S3" -> "0/1"), gts.toString)
    val qc = graft.qc.VariantQc.fromGenotypes(g).head()
    assert(qc.getAs[Int]("n_hom_alt") == 1, "haploid '1' must count hom_alt")
    assert(qc.getAs[Int]("n_hom_ref") == 1, "haploid '0' must count hom_ref")
    assert(qc.getAs[Int]("n_het") == 1)
  }

  test("variants/genotypes accept a glob over a many-file cohort directory") {
    val dir = java.nio.file.Files.createTempDirectory("cohortglob")
    Seq("a", "b").zipWithIndex.foreach { case (n, i) =>
      java.nio.file.Files.writeString(dir.resolve(s"$n.vcf"),
        s"""##fileformat=VCFv4.2
           |##FORMAT=<ID=GT,Number=1,Type=String,Description="gt">
           |#CHROM	POS	ID	REF	ALT	QUAL	FILTER	INFO	FORMAT	S1
           |chr1	${100 + i}	.	A	G	50	PASS	.	GT	0/1
           |""".stripMargin)
    }
    assert(VcfReader.variants(spark, s"$dir/*.vcf").count() == 2)
    assert(VcfReader.genotypes(spark, s"$dir/*.vcf").count() == 2)
  }

  test("cohort shards with divergent #CHROM sample columns fail the header read") {
    // genotype sample ids are POSITIONAL from the first shard's header:
    // silently accepting a shard with different sample columns would
    // misattribute every one of its genotype rows to the wrong sample
    val dir = java.nio.file.Files.createTempDirectory("cohortbadglob")
    def shard(name: String, samples: String): Unit = {
      java.nio.file.Files.writeString(dir.resolve(name),
        s"""##fileformat=VCFv4.2
           |##FORMAT=<ID=GT,Number=1,Type=String,Description="gt">
           |#CHROM	POS	ID	REF	ALT	QUAL	FILTER	INFO	FORMAT	$samples
           |chr1	100	.	A	G	50	PASS	.	GT	0/1
           |""".stripMargin)
      ()
    }
    shard("a.vcf", "S1\tS2")
    shard("b.vcf", "S2\tS1") // same set, different ORDER — still positional
    val e = intercept[RuntimeException] {
      graft.vcf.VcfHeader.read(spark, s"$dir/*.vcf")
    }
    assert(e.getMessage.contains("disagree on #CHROM sample columns"))
    // identical shards still read fine through the verification
    shard("b.vcf", "S1\tS2")
    assert(graft.vcf.VcfHeader.read(spark, s"$dir/*.vcf").samples ==
      Seq("S1", "S2"))
  }
}
