package graft.vcf

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** GIAB v4.2.1 HG002 chr21 golden counts, pinned from the reference's
  * published expectations (`tests/benchmark/README.md:17-48`):
  * 55,210 raw VCF lines → 55,812 decomposed records, 46,489 SNPs (83.3%) +
  * 9,323 indels (16.7%) — the bcftools `view -H | wc -l` /
  * `norm -m -any` ground truth. Data-present guard mirrors the
  * reference's skip (`tests/benchmark/test_giab_benchmark.py:30-33`): the
  * GIAB VCF is external data this environment may not carry, so the test
  * cancels rather than fabricating a stand-in.
  */
class GiabGoldenSpec extends SparkSpec {

  private val candidates: Seq[String] = Seq(
    sys.env.get("GRAFT_GIAB_DIR").map(_ + "/HG002_chr21.vcf.gz"),
    Some("/root/testdata/giab/HG002_chr21.vcf.gz"),
    Some(sys.props.getOrElse("user.home", "/root") +
      "/.cache/giab/HG002_chr21.vcf.gz")).flatten

  private val giab = candidates.find(p => new java.io.File(p).exists())

  test("GIAB HG002 chr21: 55,210 lines -> 55,812 decomposed; 46,489 SNPs + 9,323 indels") {
    assume(giab.isDefined, "GIAB HG002 chr21 data not available")
    val path = giab.get

    val rawLines = spark.read.text(path)
      .filter(!col("value").startsWith("#") && length(col("value")) > 0)
      .count()
    assert(rawLines == 55210L)

    val v = VcfReader.variants(spark, path)
    assert(v.count() == 55812L)

    val byType = v.groupBy("variant_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byType.getOrElse("snp", 0L) == 46489L)
    assert(byType.getOrElse("indel", 0L) == 9323L)
  }
}
