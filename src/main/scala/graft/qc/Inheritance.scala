package graft.qc

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Mendelian-inheritance pattern queries over a trio (SURVEY J9/J10 +
  * the acceptance-test narratives,
  * `tests/acceptance/test_cross_sample_queries.py:63-131`,
  * `tests/integration/test_database_queries.py:90-218`).
  *
  * All operate on the genotypes long table; each sample's genotype class
  * is derived once and the trio comparison is a self-join on the site
  * key — at scale this is one shuffle on (chrom,pos,ref,alt_raw) with the
  * per-sample slices co-partitioned.
  */
object Inheritance {

  private def classified(genotypes: DataFrame): DataFrame = {
    import genotypes.sparkSession.implicits._
    genotypes.withColumn("_cls", VariantQc.genotypeClass($"gt", $"a1", $"a2"))
  }

  private val key = Seq("chrom", "pos", "ref", "alt")

  private def sampleSlice(g: DataFrame, sample: String, alias: String): DataFrame = {
    import g.sparkSession.implicits._
    g.filter($"sample_id" === sample)
      .select(key.map(col) :+ col("_cls").as(s"${alias}_cls"): _*)
  }

  /** J9 — de novo: child carries the alt; neither parent does (either
    * anti-join formulation or the trio-wide join; this one returns the
    * parent classes for review). */
  def deNovo(genotypes: DataFrame, child: String, father: String,
             mother: String): DataFrame = {
    import genotypes.sparkSession.implicits._
    val g = classified(genotypes)
    sampleSlice(g, child, "child")
      .join(sampleSlice(g, father, "father"), key, "left")
      .join(sampleSlice(g, mother, "mother"), key, "left")
      .filter($"child_cls".isin("het", "hom_alt") &&
        (coalesce($"father_cls", lit("missing")) === "hom_ref" ||
          coalesce($"father_cls", lit("missing")) === "missing") &&
        (coalesce($"mother_cls", lit("missing")) === "hom_ref" ||
          coalesce($"mother_cls", lit("missing")) === "missing"))
  }

  /** Autosomal-recessive candidates: child hom_alt, both parents het
    * (`test_cross_sample_queries.py:85-105`). */
  def autosomalRecessive(genotypes: DataFrame, child: String, father: String,
                         mother: String): DataFrame = {
    import genotypes.sparkSession.implicits._
    val g = classified(genotypes)
    sampleSlice(g, child, "child")
      .join(sampleSlice(g, father, "father"), key)
      .join(sampleSlice(g, mother, "mother"), key)
      .filter($"child_cls" === "hom_alt" &&
        $"father_cls" === "het" && $"mother_cls" === "het")
  }

  /** J10 — compound-het candidates: a gene with ≥2 distinct child-het
    * variants where at least one is inherited from each parent
    * (`test_database_queries.py:196-218`; gene comes from the annotated
    * variants table, joined on the site key). */
  def compoundHet(genotypes: DataFrame, variants: DataFrame, child: String,
                  father: String, mother: String): DataFrame = {
    import genotypes.sparkSession.implicits._
    val g = classified(genotypes)
    val sites = g.filter($"sample_id" === child && $"_cls" === "het")
      .select(key.map(col): _*)
      .join(sampleSlice(g, father, "father"), key, "left")
      .join(sampleSlice(g, mother, "mother"), key, "left")
      .withColumn("from_father",
        $"father_cls".isin("het", "hom_alt") &&
          !coalesce($"mother_cls", lit("hom_ref")).isin("het", "hom_alt"))
      .withColumn("from_mother",
        $"mother_cls".isin("het", "hom_alt") &&
          !coalesce($"father_cls", lit("hom_ref")).isin("het", "hom_alt"))
      .join(variants.select($"chrom", $"pos", $"ref", $"alt", $"gene")
        .dropDuplicates("chrom", "pos", "ref", "alt"),
        Seq("chrom", "pos", "ref", "alt"), "left")
      .filter($"gene".isNotNull)

    val genes = sites.groupBy($"gene")
      .agg(count(lit(1)).as("n_variants"),
        sum($"from_father".cast("int")).as("n_from_father"),
        sum($"from_mother".cast("int")).as("n_from_mother"))
      .filter($"n_variants" >= 2 && $"n_from_father" >= 1 && $"n_from_mother" >= 1)

    sites.join(genes.select($"gene"), Seq("gene"), "left_semi")
      .select($"gene", $"chrom", $"pos", $"ref", $"alt",
        $"from_father", $"from_mother")
  }

  /** J10 (reference CTE shape) — compound-het candidates from the
    * annotated variants table alone: genes carrying ≥2 variants of which
    * at least one is impact='HIGH'; returns every variant of a
    * qualifying gene (`tests/integration/test_database_queries.py:196-218`).
    * Complements the trio-aware parent-of-origin form above; two
    * broadcastable semi-joins on gene, no wide shuffle. */
  def compoundHetByImpact(variants: DataFrame): DataFrame = {
    import variants.sparkSession.implicits._
    val geneVariants = variants.filter($"gene".isNotNull)
      .select($"gene", $"chrom", $"pos", $"ref", $"alt", $"impact")
    val genesWithHigh = geneVariants.filter($"impact" === "HIGH")
      .select($"gene").distinct()
    val genesMulti = geneVariants.groupBy($"gene")
      .agg(count(lit(1)).as("n")).filter($"n" >= 2).select($"gene")
    geneVariants
      .join(genesWithHigh, Seq("gene"), "left_semi")
      .join(genesMulti, Seq("gene"), "left_semi")
      .orderBy($"gene", $"pos")
  }
}
