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
    // AD is Number=R ([ref, this-alt]); PL is Number=G (biallelic triple
    // [idx00, idx_0alt, idx_altalt] with idx_altalt = (i+1)(i+2)/2+(i+1))
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
    // alt T (idx 1): R → [v0, v2]; G → [pl0, pl2, pl5]
    //   (idx_0alt = alt_idx+1 = 2; idx_altalt = (2·3)/2 + 2 = 5)
    assert(rows(1).getString(1) == "10,30")
    assert(rows(1).getString(2) == "0,2,5")
    // Number=1 untouched on both
    assert(rows.forall(_.getString(3) == "60"))
  }

  test("gz VCF reads end-to-end") {
    val df = VcfReader.variants(spark, fixture("gnomad_subset.vcf.gz"))
    assert(df.count() > 0)
    assert(df.filter($"chrom".startsWith("chr")).count() == df.count())
  }
}
