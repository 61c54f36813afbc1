package graft.vcf

import graft.SparkSpec
import graft.transform.Normalizer
import org.apache.spark.sql.functions._

/** Corpus-wide invariants over the public real-data fixtures: the reader
  * must decompose every fixture consistently with an independently
  * computed per-line ALT count, and e2e normalization must leave every
  * record in a provably-normalized state (mirrors the reference's
  * roundtrip/e2e suites without hardcoding environment-fragile counts).
  */
class FixtureCorpusSpec extends SparkSpec {
  import spark.implicits._

  private val corpus = Seq(
    "multiallelic.vcf", "with_annotations.vcf", "hapmap3_overlap.vcf",
    "gnomad_subset.vcf.gz", "dbsnp_subset.vcf.gz", "mills_indels.vcf.gz",
    "snpeff/test.ann.vcf", "snpeff/cancer.ann.vcf", "gridss_sv.vcf",
    "sarscov2.vcf.gz",
    // caller-specific corpora: somatic (Mutect2, Strelka), long-read
    // repeats (PacBio), SV (genmod/Manta), VEP-ranked, SnpEff variants
    "mutect2_chr22.vcf.gz", "strelka_snvs_chr22.vcf.gz",
    "strelka_indels_chr22.vcf.gz", "pacbio_repeats.vcf.gz",
    "genmod_sv.vcf.gz", "annotated_ranked.vcf.gz",
    "snpeff/test.EFF_V2.vcf", "snpeff/test.chr22.ann.subset.vcf",
    "snpeff/test_vcf_ann_plus_sign.vcf")

  test("decomposed record count equals the independent per-line ALT count") {
    corpus.foreach { name =>
      val path = fixture(name)
      val expected = spark.read.text(path)
        .filter(!$"value".startsWith("#") && length($"value") > 0)
        .select(split($"value", "\t").as("f"))
        .filter(size($"f") >= 8 && $"f".getItem(1).cast("long").isNotNull)
        .select(size(filter(split($"f".getItem(4), ","),
          a => a =!= "" && a =!= ".")).as("n"))
        .agg(sum($"n")).head().getLong(0)
      val got = VcfReader.variants(spark, path).count()
      assert(got == expected, s"$name: decomposed $got != expected $expected")
    }
  }

  test("per-ALT genotype rows = decomposed variants x samples on multi-sample corpora") {
    Seq("with_annotations.vcf", "mutect2_chr22.vcf.gz",
      "strelka_snvs_chr22.vcf.gz").foreach { name =>
      val path = fixture(name)
      val nSamples = VcfHeader.read(spark, path).samples.size
      assert(nSamples > 0, s"$name: expected sample columns")
      val nVariants = VcfReader.variants(spark, path).count()
      val nGeno = VcfReader.genotypes(spark, path).count()
      assert(nGeno == nVariants * nSamples,
        s"$name: genotypes $nGeno != variants $nVariants x samples $nSamples")
    }
  }

  test("empty VCF (header only) yields zero rows, not an error") {
    assert(VcfReader.variants(spark, fixture("empty.vcf.gz")).count() == 0)
  }

  test("malformed lines are skipped when skipMalformed is on") {
    val vcf = java.nio.file.Files.createTempFile("malformed", ".vcf")
    java.nio.file.Files.writeString(vcf,
      """##fileformat=VCFv4.2
        |#CHROM	POS	ID	REF	ALT	QUAL	FILTER	INFO
        |chr1	100	.	A	G	50	PASS	DP=10
        |chr1	not_a_pos	.	A	G	50	PASS	DP=10
        |chr1	200	.	A
        |chr1	300	.	A	T	50	PASS	DP=12
        |""".stripMargin)
    val df = VcfReader.variants(spark, vcf.toString)
    assert(df.count() == 2)
    val loose = VcfReader.variants(spark, vcf.toString,
      VcfReader.Options(skipMalformed = false))
    assert(loose.count() > 2)
  }

  test("e2e normalization over a real indel corpus") {
    val df = VcfReader.variants(spark, fixture("mills_indels.vcf.gz"),
      VcfReader.Options(normalize = true)).cache()
    val total = df.count()
    assert(total > 0)
    // Every output is either provably normalized or stuck in the
    // documented genome-less empty-allele state
    val bad = df.filter(
      !Normalizer.isNormalizedUdf($"ref", $"alt") &&
      length($"ref") > 0 && length($"alt") > 0).count()
    assert(bad == 0, s"$bad records not normalized")
    // normalization tracking: changed rows carry their original identity
    val changed = df.filter($"normalized")
    assert(changed.filter($"original_ref".isNull).count() == 0)
  }

  test("SV and symbolic alleles classify as sv and survive decomposition") {
    val df = VcfReader.variants(spark, fixture("gridss_sv.vcf"))
    assert(df.count() > 0)
    // gridss emits breakend notation; symbolic <...> alleles classify sv
    val gvcf = VcfReader.variants(spark, fixture("gvcf_sample.vcf.gz"))
    assert(gvcf.filter($"alt" === "<NON_REF>" && $"variant_type" === "sv").count() > 0)
  }

  test("non-human contigs keep their names without chr mangling") {
    val df = VcfReader.variants(spark, fixture("sarscov2.vcf.gz"),
      VcfReader.Options(humanGenome = false))
    assert(df.count() > 0)
    assert(df.filter($"chrom".startsWith("chr")).count() == 0)
  }
}
