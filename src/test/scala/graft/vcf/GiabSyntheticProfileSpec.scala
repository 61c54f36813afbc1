package graft.vcf

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Executes the GIAB golden-count INVARIANTS on synthetic data, so they
  * run in every environment (GiabGoldenSpec pins the published HG002
  * chr21 numbers — 55,210 raw lines → 55,812 decomposed, 83.3% SNPs,
  * `tests/benchmark/README.md:17-32` — but cancels wherever the GIAB
  * download is absent, i.e. always in this sandbox).
  *
  * The corpus is a ~50k-line SyntheticVcf with a GIAB-shaped profile
  * (multi-allelic density chosen so decomposed/raw ≈ 1.011, indel
  * fraction so SNPs ≈ 83%), and the expectations are COMPUTED, not
  * hardcoded: an independent driver-side line scan — the `bcftools
  * view -H | wc -l` / `norm -m -any` analogue the reference's README
  * derives its numbers from — re-derives the raw-line count, per-ALT
  * decomposition count, and per-type counts from the file text, and the
  * distributed parse must match them EXACTLY. The GIAB-profile bands
  * then assert the corpus actually exercises the same regime as the
  * real chr21 data (decomposition ratio ~1.011, SNP share ~83%).
  */
class GiabSyntheticProfileSpec extends SparkSpec {

  test("GIAB-profile corpus: decomposition and type counts match an independent line oracle; ratios match GIAB") {
    val dir = java.nio.file.Files.createTempDirectory("giabsynth")
    val path = dir.resolve("giab_profile.vcf").toString
    val nLines = 50000
    SyntheticVcf.write(path, nLines, samples = Seq("HG002"), seed = 4221L,
      multiAllelicFrac = 0.0075, indelFrac = 0.105)

    // independent oracle: plain text scan, no VcfReader code involved
    var rawLines = 0L
    var decomposed = 0L
    val byType = scala.collection.mutable.Map[String, Long]()
      .withDefaultValue(0L)
    val src = scala.io.Source.fromFile(path)
    try {
      src.getLines().filterNot(_.startsWith("#")).filter(_.nonEmpty)
        .foreach { line =>
          rawLines += 1
          val f = line.split("\t", -1)
          val ref = f(3)
          f(4).split(",").filter(a => a.nonEmpty && a != ".").foreach { alt =>
            decomposed += 1
            val t =
              if (alt.startsWith("<") && alt.endsWith(">")) "sv"
              else if (ref.length == 1 && alt.length == 1) "snp"
              else if (ref.length != alt.length) "indel"
              else "mnp"
            byType(t) += 1
          }
        }
    } finally src.close()
    assert(rawLines == nLines.toLong)

    // the distributed parse must agree with the line oracle EXACTLY
    val v = VcfReader.variants(spark, path)
    assert(v.count() == decomposed,
      s"decomposed count: parse ${v.count()} != oracle $decomposed")
    val parsedByType = v.groupBy("variant_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    Seq("snp", "indel", "mnp", "sv").foreach { t =>
      assert(parsedByType.getOrElse(t, 0L) == byType(t),
        s"$t: parse ${parsedByType.getOrElse(t, 0L)} != oracle ${byType(t)}")
    }

    // GIAB-regime bands (HG002 chr21: 55,812/55,210 = 1.0109 decomposed
    // per raw line; 46,489/55,812 = 83.3% SNPs): the corpus must sit in
    // the same regime or the exact checks above prove nothing about
    // multi-allelic decomposition at GIAB density
    val ratio = decomposed.toDouble / rawLines
    assert(math.abs(ratio - 1.0109) < 0.005,
      s"decomposition ratio $ratio outside the GIAB band (1.0109±0.005)")
    val snpShare = byType("snp").toDouble / decomposed
    assert(math.abs(snpShare - 0.833) < 0.03,
      s"SNP share $snpShare outside the GIAB band (0.833±0.03)")
    // multi-allelic sites present in ~GIAB density (the decomposition
    // under test is not vacuous)
    val multiSites = v.filter(col("n_alts") > 1)
      .select("chrom", "pos", "ref").distinct().count()
    assert(multiSites > 0.004 * nLines && multiSites < 0.012 * nLines,
      s"multi-allelic site count $multiSites outside the GIAB-ish band")
  }
}
