package graft.transform

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** gnomAD-style population frequencies (SURVEY S9 + A10 —
  * `annotations/population_freq.py`).
  *
  * The wide INFO fields `AC_/AN_/AF_/nhomalt_/faf95_{POP}` (7 populations,
  * case- and prefix-tolerant key search) unpivot into long rows via an
  * inline/explode of a struct array — one narrow projection, no shuffle;
  * popmax is then a single `max_by` aggregation excluding bottlenecked
  * populations.
  */
object PopulationFreq {

  val Populations: Seq[String] = Seq("AFR", "AMR", "ASJ", "EAS", "FIN", "NFE", "SAS")
  val Bottlenecked: Set[String] = Set("ASJ", "FIN")

  /** Case/prefix-tolerant INFO lookup: tries `{prefix}KEY_POP`,
    * `{prefix}KEY_pop`, `KEY_POP`, `KEY_pop` in order
    * (`population_freq.py:64-133`). */
  private def popField(info: Column, prefix: String, key: String, pop: String): Column = {
    val keys = Seq(s"$prefix${key}_$pop", s"$prefix${key}_${pop.toLowerCase}",
      s"${key}_$pop", s"${key}_${pop.toLowerCase}").distinct
    coalesce(keys.map(k => element_at(info, k)): _*)
  }

  /** Unpivot a variants DataFrame (with the sliced `info` map) to the
    * long `population_frequencies` schema: one row per variant ×
    * population with any data, keyed by the deterministic variant_id.
    */
  def toLong(variants: DataFrame, source: String = "gnomAD_v3",
             prefix: String = "", subset: String = "all"): DataFrame = {
    import variants.sparkSession.implicits._
    val withId = graft.ingest.VariantMatching.withVariantId(variants)

    val popStructs = Populations.map { pop =>
      struct(
        lit(pop).as("population"),
        popField($"info", prefix, "AC", pop).cast(IntegerType).as("ac"),
        popField($"info", prefix, "AN", pop).cast(IntegerType).as("an"),
        popField($"info", prefix, "AF", pop).cast(DoubleType).as("af"),
        popField($"info", prefix, "nhomalt", pop).cast(IntegerType).as("hom_count"),
        popField($"info", prefix, "faf95", pop).cast(DoubleType).as("faf_95"))
    }

    withId
      .select($"variant_id", $"chrom", $"pos", $"ref", $"alt",
        explode(array(popStructs: _*)).as("p"))
      .select($"variant_id", $"chrom", $"pos", $"ref", $"alt",
        $"p.population", $"p.ac", $"p.an", $"p.af", $"p.hom_count", $"p.faf_95")
      // a population row exists only when any of ac/an/af is present
      .filter($"ac".isNotNull || $"an".isNotNull || $"af".isNotNull)
      .withColumn("source", lit(source))
      .withColumn("subset", lit(subset))
  }

  /** A10 popmax: max AF across populations excluding {ASJ, FIN}, with the
    * winning population (`population_freq.py:172-216`). `max_by` over the
    * long rows — ties broken toward the smaller population name for
    * determinism.
    */
  def popmax(longFreqs: DataFrame, excludeBottlenecked: Boolean = true): DataFrame = {
    import longFreqs.sparkSession.implicits._
    val filtered =
      if (excludeBottlenecked) longFreqs.filter(!$"population".isin(Bottlenecked.toSeq: _*))
      else longFreqs
    filtered
      .filter($"af".isNotNull)
      .groupBy($"variant_id")
      // min_by over (-af, population): af descending, then the FULL
      // population name ascending — a first-character tiebreak would
      // leave AFR-vs-AMR (or any shared-initial pair) af ties
      // nondeterministic across partitionings, diverging from the
      // oracle's ORDER BY af DESC, population ASC
      .agg(min_by(struct($"af", $"population"),
        struct((lit(-1.0) * $"af").as("neg_af"), $"population")).as("m"))
      .select($"variant_id", $"m.af".as("popmax_af"), $"m.population".as("popmax_population"))
  }
}
