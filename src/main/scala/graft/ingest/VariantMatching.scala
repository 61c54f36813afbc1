package graft.ingest

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.functions.GenomicsFunctions._

/** Variant-matching joins (SURVEY J2/J3/J4 + J5).
  *
  * The reference loads the ENTIRE variants table into a driver-side dict
  * (`utils/variant_matching.py:72-106`) and probes it per TSV record —
  * fine for one node, impossible at 100 TB. Here the same semantics are a
  * distributed join: candidate orientation keys are exploded with a
  * priority (direct=1, swapped=2), joined once on the position key, and
  * the best priority per input row wins; the rsID fallback is a second
  * join consulted only via coalesce order. Priority semantics exactly
  * mirror `match_variant` (`utils/variant_matching.py:26-69`): direct
  * orientation beats swapped beats rsID.
  */
object VariantMatching {

  /** Deterministic surrogate variant id from the natural key (bare chrom,
    * pos, REF, ALT) — stable across jobs/partitions, unlike
    * monotonically_increasing_id (SURVEY §7 risk 4), and engine-portable
    * (md5-derived, reproducible by the DuckDB oracle). */
  def variantIdCol(chrom: Column, pos: Column, ref: Column, alt: Column): Column =
    stableId(graft.functions.GenomicsFunctions.bareChrom(chrom), pos, upper(ref), upper(alt))

  def withVariantId(variants: DataFrame): DataFrame = {
    import variants.sparkSession.implicits._
    variants.withColumn("variant_id",
      variantIdCol($"chrom", $"pos", $"ref", $"alt"))
  }

  /** J2: match summary-stat rows (GWAS or PGS weights) to variants.
    *
    * Input `stats` must carry chromosome/position/effect_allele/
    * other_allele (+ optional rsid); `variants` must carry
    * chrom/pos/ref/alt (+ rs_id). Output = stats plus `variant_id`,
    * `matched_ref`, `matched_alt`, `match_type`
    * ('direct'|'swapped'|'rsid'|null).
    */
  def matchToVariants(stats: DataFrame, variants: DataFrame,
                      chromCol: String = "chromosome",
                      posCol: String = "base_pair_location",
                      eaCol: String = "effect_allele",
                      oaCol: String = "other_allele",
                      rsidCol: String = "rsid"): DataFrame = {
    import stats.sparkSession.implicits._

    val v = withVariantId(variants)
      .select(
        graft.functions.GenomicsFunctions.bareChrom(col("chrom")).as("m_chrom"),
        col("pos").as("m_pos"),
        upper(col("ref")).as("m_ref"),
        upper(col("alt")).as("m_alt"),
        col("variant_id").as("m_vid"),
        col("rs_id").as("m_rsid"))

    // One row id per stat record for the best-priority reduction, derived
    // from the ROW'S CONTENT (md5 of the json-serialized row), not from
    // monotonically_increasing_id: `s` is evaluated more than once in this
    // plan (as `candidates` and as the left side of the final join), and a
    // partition-order change between those evaluations (repartition, AQE
    // re-plan, non-deterministic scan split order) would silently mis-join
    // positional ids. Content ids are stable under any partitioning.
    // Fully duplicate stat rows share an id by construction — harmless:
    // they produce identical candidate sets, the best-priority reduction
    // is keyed per id, and the final left join re-attaches the same (and
    // correct) match to each copy without changing row counts.
    val s = stats.withColumn("_sid",
      md5(to_json(struct(stats.columns.map(col): _*))))

    val ea = upper(col(eaCol))
    val oa = upper(col(oaCol))
    val candidates = s
      .filter(col(oaCol).isNotNull && col(oaCol) =!= "")
      .select(
        $"_sid",
        graft.functions.GenomicsFunctions.bareChrom(col(chromCol)).as("j_chrom"),
        col(posCol).as("j_pos"),
        explode(array(
          struct(oa.as("j_ref"), ea.as("j_alt"), lit(1).as("prio")),
          struct(ea.as("j_ref"), oa.as("j_alt"), lit(2).as("prio")))).as("c"))
      .select($"_sid", $"j_chrom", $"j_pos",
        $"c.j_ref", $"c.j_alt", $"c.prio")

    val posMatch = candidates
      .join(v,
        $"j_chrom" === $"m_chrom" && $"j_pos" === $"m_pos" &&
          $"j_ref" === $"m_ref" && $"j_alt" === $"m_alt")
      .groupBy($"_sid")
      .agg(min_by(struct($"m_vid", $"m_ref", $"m_alt", $"prio"), $"prio").as("best"))
      .select($"_sid",
        $"best.m_vid".as("pos_vid"), $"best.m_ref".as("pos_ref"),
        $"best.m_alt".as("pos_alt"), $"best.prio".as("pos_prio"))

    val rsMatch =
      if (!stats.columns.contains(rsidCol)) null
      else v.filter($"m_rsid".isNotNull)
        .groupBy($"m_rsid")
        .agg(min($"m_vid").as("rs_vid"))

    val joined0 = s.join(posMatch, Seq("_sid"), "left")
    val joined =
      if (rsMatch == null) joined0
        .withColumn("rs_vid", lit(null).cast(LongType))
      else joined0.join(rsMatch, col(rsidCol) === $"m_rsid", "left").drop("m_rsid")

    joined
      .withColumn("variant_id", coalesce($"pos_vid", $"rs_vid"))
      .withColumn("match_type",
        when($"pos_prio" === 1, "direct")
          .when($"pos_prio" === 2, "swapped")
          .when($"rs_vid".isNotNull, "rsid"))
      .withColumn("matched_ref", $"pos_ref")
      .withColumn("matched_alt", $"pos_alt")
      .drop("_sid", "pos_vid", "pos_ref", "pos_alt", "pos_prio", "rs_vid")
  }

  /** J3 harmonization direction: is the effect allele the VCF ALT?
    * Mirrors `compute_is_effect_allele_alt` (`gwas/loader.py:80-114`):
    * direct orientation, then strand-complemented; null when unmatched.
    * Complement is the loader's WHOLE-ALLELE form (`loader.py:74-77` —
    * multi-base alleles pass through unchanged, so indels never
    * strand-flip; see GenomicsFunctions.complementAllele). Pure column
    * expression applied inside the join projection. */
  def isEffectAlleleAlt(ea: Column, oa: Column, ref: Column, alt: Column): Column = {
    val (e, o, r, a) = (upper(ea), upper(oa), upper(ref), upper(alt))
    val (ec, oc) = (complementAllele(ea), complementAllele(oa))
    when(e === a && o === r, lit(true))
      .when(e === r && o === a, lit(false))
      .when(ec === a && oc === r, lit(true))
      .when(ec === r && oc === a, lit(false))
      .otherwise(lit(null).cast(BooleanType))
  }

  /** J3 full harmonization with AF-proximity rescue for strand-ambiguous
    * SNPs — behavioral twin of `harmonize_alleles`
    * (`gwas/loader.py:115-190`): direct allele-set match, then
    * strand-complemented, then — for A/T, C/G GWAS pairs whose set
    * matches neither orientation — |EAF − VCF ALT AF| < 0.1 keeps the
    * effect allele as ALT, |(1−EAF) − VCF ALT AF| < 0.1 as REF.
    * Returns struct(is_match, is_flipped, is_effect_allele_alt,
    * harmonized_effect_allele, harmonized_other_allele); pure column
    * expression, evaluated inside the join projection.
    */
  def harmonizeAlleles(ea: Column, oa: Column, ref: Column, alt: Column,
                       eaf: Column, vcfAltAf: Column): Column = {
    val (e, o) = (upper(ea), upper(oa))
    val (r, a) = (upper(ref), upper(alt))
    // WHOLE-ALLELE complement (`loader.py:74-77`): multi-base alleles
    // pass through unchanged, so an indel pair never strand-flips —
    // (TA,G) vs VCF (AT,C) is NO match, where a per-char translate
    // would invent a flipped one
    val (ec, oc) = (complementAllele(ea), complementAllele(oa))
    val directSet = (e === r && o === a) || (e === a && o === r)
    val compSet = (ec === r && oc === a) || (ec === a && oc === r)
    // single-base A/T and C/G pairs only (`loader.py:68-72` frozenset):
    // the complement IS the swap, so orientation needs the AF rescue
    val ambiguous = graft.functions.GenomicsFunctions.isStrandAmbiguous(e, o)
    val fdDirect = abs(eaf - vcfAltAf)
    val fdFlipped = abs(lit(1.0) - eaf - vcfAltAf)
    val freqUsable = ambiguous && eaf.isNotNull && vcfAltAf.isNotNull

    def result(m: Boolean, flipped: Column, eaAlt: Column, he: Column, ho: Column) =
      struct(lit(m).as("is_match"), flipped.as("is_flipped"),
        eaAlt.as("is_effect_allele_alt"),
        he.as("harmonized_effect_allele"), ho.as("harmonized_other_allele"))

    when(directSet, result(m = true, lit(false), e === a, e, o))
      .when(compSet, result(m = true, lit(true), ec === a, ec, oc))
      .when(freqUsable && fdDirect < 0.1,
        result(m = true, lit(false), lit(true), e, o))
      .when(freqUsable && fdDirect >= 0.1 && fdFlipped < 0.1,
        result(m = true, lit(false), lit(false), e, o))
      .otherwise(result(m = false,
        lit(null).cast(BooleanType), lit(null).cast(BooleanType),
        lit(null).cast(StringType), lit(null).cast(StringType)))
  }

  /** J4 HapMap3 flagging: broadcast the panel, join on (bare chrom, pos),
    * accept exact allele-set match or (for non-ambiguous SNPs) the
    * complemented set (`references/hapmap3.py:53-107`); first match per
    * variant with exact-match priority. Adds in_hapmap3 + hapmap3_rsid.
    */
  def flagHapmap3(variants: DataFrame, panel: DataFrame): DataFrame = {
    import variants.sparkSession.implicits._
    val vk = withVariantId(variants)

    val ref = upper($"ref")
    val alt = upper($"alt")
    val exactMatch = (ref === $"a1" && alt === $"a2") || (ref === $"a2" && alt === $"a1")
    // WHOLE-ALLELE complement (`references/hapmap3.py:41-44` dict form):
    // indel/MNP alleles pass through unchanged, so the complement arm
    // collapses to the exact arm for them rather than inventing a
    // per-char-translated flag
    val refC = complementAllele($"ref")
    val altC = complementAllele($"alt")
    val compMatch = !isStrandAmbiguous($"ref", $"alt") &&
      ((refC === $"a1" && altC === $"a2") || (refC === $"a2" && altC === $"a1"))

    val matches = vk
      .join(broadcast(panel),
        graft.functions.GenomicsFunctions.bareChrom(vk("chrom")) === panel("chrom") &&
          vk("pos") === panel("position") &&
          (exactMatch || compMatch))
      .groupBy($"variant_id")
      .agg(min_by($"rsid", struct(when(exactMatch, 0).otherwise(1), $"rsid")).as("hapmap3_rsid"))

    vk.join(matches, Seq("variant_id"), "left")
      .withColumn("in_hapmap3", $"hapmap3_rsid".isNotNull)
  }
}
