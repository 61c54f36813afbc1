package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Scalar genomics function surface (SURVEY §2.9) — everything here is a
  * native Column expression (codegen'd, no UDF), with SQL registrations
  * for the `spark.sql` passthrough face. Each mirrors a reference
  * plpgsql/Python twin in `validation/sql_functions.py`.
  */
object GenomicsFunctions {

  /** Strand complement via PER-CHARACTER translation — the semantics of
    * the reference's SQL `alleles_match` twin
    * (`validation/sql_functions.py:214-216`: `TRANSLATE(r1,'ACGT','TGCA')`)
    * and of `prs/pgs_catalog.py:173-176` (per-base join). NOT the right
    * complement for the GWAS-loader/HapMap3 paths — see
    * [[complementAllele]]. */
  def complement(allele: Column): Column =
    translate(upper(allele), "ACGT", "TGCA")

  /** Strand complement with WHOLE-ALLELE semantics — the reference's
    * `complement_allele` in `gwas/loader.py:74-77` and
    * `references/hapmap3.py:41-44`: a dict lookup of the entire allele
    * string, so only single-base A/C/G/T complement and every other
    * allele (indels, MNPs, symbolic) passes through unchanged — i.e.
    * indels are never strand-flipped. The reference carries BOTH
    * semantics (its SQL twin translates per character); callers here pick
    * the one their cited reference path uses. Returns the UPPERED allele
    * on pass-through, matching the reference call sites (they upper()
    * before complementing). */
  def complementAllele(allele: Column): Column = {
    val u = upper(allele)
    when(u.isin("A", "C", "G", "T"), translate(u, "ACGT", "TGCA"))
      .otherwise(u)
  }

  /** Allele harmonization check: direct, swapped, complement, or
    * complement-swapped match; NULL-strict
    * (`validation/sql_functions.py:182-227`). */
  def allelesMatch(ref1: Column, alt1: Column, ref2: Column, alt2: Column): Column = {
    val (r1, a1) = (upper(ref1), upper(alt1))
    val (r2, a2) = (upper(ref2), upper(alt2))
    val r1c = complement(ref1)
    val a1c = complement(alt1)
    when(ref1.isNull || alt1.isNull || ref2.isNull || alt2.isNull, lit(null).cast(BooleanType))
      .otherwise(
        (r1 === r2 && a1 === a2) || (r1 === a2 && a1 === r2) ||
        (r1c === r2 && a1c === a2) || (r1c === a2 && a1c === r2))
  }

  /** A/T and C/G pairs are strand-ambiguous: their complement equals the
    * swap, so orientation can't be resolved from alleles alone. The
    * reference tests SET equality of the whole alleles against {A,T} and
    * {C,G} (`references/hapmap3.py:47-50`, `gwas/loader.py:68-72`,
    * `prs/pgs_catalog.py:147-151` — identical frozenset form in all
    * three), so ONLY single-base pairs are ever ambiguous; a multi-base
    * reverse pair like (AT, TA) is not (and per [[complementAllele]] is
    * not complementable either). */
  def isStrandAmbiguous(ref: Column, alt: Column): Column = {
    val (r, a) = (upper(ref), upper(alt))
    (r === "A" && a === "T") || (r === "T" && a === "A") ||
      (r === "C" && a === "G") || (r === "G" && a === "C")
  }

  /** Allele frequency from a dosage array: AVG(d)/2 ignoring NULLs, NULL
    * when no valid entries (`validation/sql_functions.py:159-166`). */
  def afFromDosages(dosages: Column): Column = {
    val valid = filter(dosages, d => d.isNotNull)
    when(dosages.isNull || size(valid) === 0, lit(null).cast(DoubleType))
      .otherwise(
        aggregate(valid, lit(0.0), (acc, d) => acc + d) / (size(valid) * 2.0))
  }

  /** Effective sample size for case-control studies:
    * 4·cases·controls/(cases+controls); NULL when either is 0
    * (`validation/sql_functions.py:169-179`, `export/prs_formats.py:66-88`). */
  def nEff(nCases: Column, nControls: Column): Column =
    when(nCases === 0 || nControls === 0 || nCases.isNull || nControls.isNull,
      lit(null).cast(DoubleType))
      .otherwise(lit(4.0) * nCases * nControls / (nCases + nControls))

  /** Transition/transversion classification for SNPs
    * (`qc/sample_qc.py:80-117`; transitions A↔G, C↔T). */
  def tiTvClass(ref: Column, alt: Column): Column = {
    val r = upper(ref)
    val a = upper(alt)
    // null allele first AND explicitly: a NULL ref makes every condition
    // below evaluate to SQL NULL (not true), which would fall through
    // both when() branches into otherwise("transversion") — a null-allele
    // row must classify NULL, not deflate the Ti/Tv ratio
    when(r.isNull || a.isNull ||
        length(r) =!= 1 || length(a) =!= 1 || r === a,
        lit(null).cast(StringType))
      .when((r === "A" && a === "G") || (r === "G" && a === "A") ||
            (r === "C" && a === "T") || (r === "T" && a === "C"), "transition")
      .otherwise("transversion")
  }

  /** Strip the `chr` prefix for bare-format matching
    * (`utils/variant_matching.py:6-23`, `export/prs_formats.py:59-63`). */
  def bareChrom(chrom: Column): Column =
    regexp_replace(chrom, "^chr", "")

  /** Deterministic 60-bit surrogate id from natural-key columns: the
    * leading 15 hex chars of md5 over the ':'-joined key. Engine-portable
    * (md5 is standardized, unlike xxhash64), so external oracles can
    * reproduce ids bit-for-bit: DuckDB twin is
    * `CAST(('0x' || substr(md5(k1||':'||...),1,15)) AS BIGINT)`. */
  def stableId(cols: Column*): Column =
    conv(substring(md5(concat_ws(":", cols: _*)), 1, 15), 16, 10).cast(LongType)

  /** Register the SQL-callable set (plus Hwe.register / Normalizer
    * .register elsewhere) so `spark.sql` queries can use the same surface
    * the reference installs into Postgres
    * (`validation/sql_functions.py:20-26`). */
  def register(spark: SparkSession): Unit = {
    val r = spark.sessionState.functionRegistry

    spark.udf.register("alleles_match",
      (ref1: String, alt1: String, ref2: String, alt2: String) =>
        allelesMatchScala(ref1, alt1, ref2, alt2).map(java.lang.Boolean.valueOf).orNull)
    spark.udf.register("af_from_dosages",
      (ds: Seq[java.lang.Double]) => {
        val valid = if (ds == null) Seq.empty else ds.filter(_ != null).map(_.doubleValue)
        if (valid.isEmpty) null else java.lang.Double.valueOf(valid.sum / (2.0 * valid.size))
      })
    spark.udf.register("n_eff",
      (c: java.lang.Integer, k: java.lang.Integer) => {
        if (c == null || k == null || c == 0 || k == 0) null
        else java.lang.Double.valueOf(4.0 * c.toDouble * k.toDouble / (c.toDouble + k.toDouble))
      })
    val _ = r // reserved for native Expression registration if needed
  }

  /** Pure twin for differential tests (`alleles_match_python`,
    * `validation/sql_functions.py:276-305`). */
  def allelesMatchScala(ref1: String, alt1: String, ref2: String, alt2: String): Option[Boolean] = {
    if (ref1 == null || alt1 == null || ref2 == null || alt2 == null) return None
    val comp = Map('A' -> 'T', 'C' -> 'G', 'G' -> 'C', 'T' -> 'A')
    def cmp(s: String) = s.map(c => comp.getOrElse(c, c))
    val (r1, a1, r2, a2) = (ref1.toUpperCase, alt1.toUpperCase, ref2.toUpperCase, alt2.toUpperCase)
    Some((r1 == r2 && a1 == a2) || (r1 == a2 && a1 == r2) ||
      (cmp(r1) == r2 && cmp(a1) == a2) || (cmp(r1) == a2 && cmp(a1) == r2))
  }
}
