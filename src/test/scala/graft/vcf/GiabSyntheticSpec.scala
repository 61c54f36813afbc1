package graft.vcf

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** The GIAB golden-count invariants executed on SYNTHETIC data.
  *
  * `GiabGoldenSpec` pins the reference's published HG002-chr21 numbers
  * (55,210 raw lines → 55,812 decomposed, 83.3% SNPs / 16.7% indels —
  * `tests/benchmark/README.md:17-48`) but cancels forever in an
  * environment without the GIAB download, so the invariants it guards
  * (multi-allelic decomposition is exactly sum-of-ALTs; type
  * classification partitions the records) would otherwise go
  * unexecuted. This spec runs the SAME invariants on a ~50k-line
  * GIAB-profile synthetic corpus (multi-allelic density and indel
  * fraction chosen to land in GIAB's ranges), with ground truth
  * COMPUTED — not hardcoded — by an independent plain-text parse of the
  * generated file using the reference's own rules:
  * decomposed = Σ per-line ALT count (`vcf_parser.py` splits every ALT
  * into its own record) and type per (ref, alt) from
  * `normalizer.py:160-180` (snp: both length 1; indel: lengths differ;
  * mnp: equal length >1; sv: symbolic ALT).
  */
class GiabSyntheticSpec extends SparkSpec {

  test("GIAB-profile corpus: decomposition and type counts match an independent text-level oracle") {
    val path = java.nio.file.Files.createTempDirectory("giabsynth")
      .resolve("giab_profile.vcf").toString
    // GIAB chr21 shape: ~1.1% of sites multi-allelic
    // (55,812/55,210 = 1.0109 expansion) and a ~83% SNP fraction
    // (indelFrac 0.10 lands there after both ref- and alt-side draws)
    SyntheticVcf.write(path, 50000, seed = 421L,
      multiAllelicFrac = 0.011, indelFrac = 0.10)

    // ---- independent oracle: plain-text scan, reference rules ----
    var rawLines = 0L
    var expectedDecomposed = 0L
    var expSnp = 0L
    var expIndel = 0L
    var expMnp = 0L
    val src = scala.io.Source.fromFile(path)
    try src.getLines().foreach { line =>
      if (!line.startsWith("#") && line.nonEmpty) {
        rawLines += 1
        val f = line.split("\t", -1)
        val ref = f(3)
        f(4).split(",").foreach { alt =>
          expectedDecomposed += 1
          if (alt.startsWith("<") && alt.endsWith(">")) ()
          else if (ref.length == 1 && alt.length == 1) expSnp += 1
          else if (ref.length != alt.length) expIndel += 1
          else expMnp += 1
        }
      }
    } finally src.close()

    // the corpus must genuinely exercise the invariants at GIAB shape
    assert(rawLines == 50000L)
    assert(expectedDecomposed > rawLines, "no multi-allelic sites generated")
    val expansion = expectedDecomposed.toDouble / rawLines
    assert(expansion > 1.005 && expansion < 1.03,
      f"expansion $expansion%.4f outside the GIAB-like band")
    val snpFrac = expSnp.toDouble / expectedDecomposed
    assert(snpFrac > 0.70 && snpFrac < 0.90,
      f"snp fraction $snpFrac%.3f outside the GIAB-like band")

    // ---- engine under test ----
    val v = VcfReader.variants(spark, path)
    assert(v.count() == expectedDecomposed,
      "decomposed record count != sum of per-line ALT counts")
    val byType = v.groupBy("variant_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byType.getOrElse("snp", 0L) == expSnp)
    assert(byType.getOrElse("indel", 0L) == expIndel)
    assert(byType.getOrElse("mnp", 0L) == expMnp)
    assert(byType.values.sum == expectedDecomposed)

    // alt_idx within each site must enumerate 0..n_alts-1 exactly —
    // the per-ALT slicing contract decomposition feeds (T1-T4)
    val badIdx = v.groupBy(col("chrom"), col("pos"), col("ref"))
      .agg(countDistinct(col("alt_idx")).as("n_idx"),
        max(col("alt_idx")).as("max_idx"), count(lit(1)).as("n"))
      .filter(col("n_idx") =!= col("n") ||
        col("max_idx") =!= col("n") - 1)
      .count()
    assert(badIdx == 0L, "alt_idx does not enumerate 0..n-1 per site")
  }
}
