package graft.ingest

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.vcf.VcfReader

/** Dynamic annotation sources (SURVEY S8/K2 + §1.3 dynamic schemas).
  *
  * An echtvar-compatible JSON field config drives the annotation table
  * schema at runtime (`annotation_config.py:16-116`); the VCF scan reuses
  * the S1 reader and projects the configured INFO fields with per-ALT
  * slicing already applied, typed casts, and missing-value defaults
  * (`annotation_loader.py:92-223`). Dedup-on-insert (the reference's
  * staging + ON CONFLICT DO NOTHING) is `dropDuplicates` on the site key.
  */
object AnnotationLoader {

  final case class FieldConfig(
      field: String,
      alias: String,
      fieldType: String,            // Integer | Float | String
      missingValue: Option[Double],
      missingString: String,
      multiplier: Int,
      description: String)

  /** Type inference hints mirror `_infer_field_type`
    * (`annotation_config.py:90-103`). */
  private def inferType(field: String, hasMultiplier: Boolean,
                        hasMissingString: Boolean): String = {
    if (hasMultiplier) "Float"
    else if (hasMissingString) "String"
    else field.toUpperCase match {
      case "FILTER" => "String"
      case "AF" | "AF_POPMAX" | "AF_CONTROLS_AND_BIOBANKS" => "Float"
      case _ => "Integer"
    }
  }

  /** Parse the echtvar JSON config (Jackson ships with Spark). */
  def loadFieldConfig(path: String): Seq[FieldConfig] = {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val root = mapper.readTree(new java.io.File(path))
    require(root.isArray, "Configuration must be a JSON array")
    root.elements().asScala.map { item =>
      require(item.has("field") && item.has("alias"),
        "Each item must have 'field' and 'alias' keys")
      val mult = if (item.has("multiplier")) item.get("multiplier").asInt(1) else 1
      FieldConfig(
        field = item.get("field").asText(),
        alias = item.get("alias").asText(),
        fieldType = inferType(item.get("field").asText(),
          mult != 1, item.has("missing_string")),
        missingValue = if (item.has("missing_value"))
          Some(item.get("missing_value").asDouble()) else None,
        missingString = if (item.has("missing_string"))
          item.get("missing_string").asText() else ".",
        multiplier = mult,
        description = if (item.has("description")) item.get("description").asText() else "")
    }.toSeq
  }

  /** Column for one configured field over the reader's output
    * (`_extract_field_value`, `annotation_loader.py:174-223`): FILTER is
    * special-cased; others read the (already per-ALT-sliced) info map,
    * cast by type, defaulting to missing_value / missing_string.
    *
    * Documented deviation on multi-valued fields: the reference indexes
    * the raw cyvcf2 tuple with `value[alt_idx]` regardless of the
    * declared Number (`annotation_loader.py:205-209` — which mis-slices
    * Number=R, whose index 0 is the REF slot), where this reader slices
    * per the declared Number first (spec F(j,k) for G) and numeric
    * extraction then takes the first sliced element. For Number=A —
    * every numeric field in echtvar-style configs (AF/AC/nhomalt) —
    * the two agree exactly.
    */
  private def fieldColumn(cfg: FieldConfig): Column = {
    if (cfg.field.equalsIgnoreCase("FILTER")) {
      // our reader surfaces PASS/'.' as []; the reference stores
      // `missing_string or "PASS"` (`annotation_loader.py:190-193`) —
      // the default "." is truthy in that expression, so only an
      // explicitly EMPTY missing_string falls back to "PASS"
      when(size(col("filter")) === 0,
        lit(if (cfg.missingString.isEmpty) "PASS" else cfg.missingString))
        .otherwise(array_join(col("filter"), ";"))
        .as(cfg.alias)
    } else {
      val raw = element_at(col("info"), cfg.field)
      val first = element_at(split(raw, ","), 1)
      cfg.fieldType match {
        case "Float" =>
          coalesce(first.cast(DoubleType),
            cfg.missingValue.map(lit(_)).getOrElse(lit(null)).cast(DoubleType))
            .as(cfg.alias)
        case "Integer" =>
          coalesce(first.cast(DoubleType).cast(IntegerType),
            cfg.missingValue.map(v => lit(v.toInt)).getOrElse(lit(null)).cast(IntegerType))
            .as(cfg.alias)
        case _ =>
          coalesce(raw, lit(cfg.missingString)).as(cfg.alias)
      }
    }
  }

  /** Build an annotation-source DataFrame keyed (chrom,pos,ref,alt) with
    * one aliased column per configured field; duplicates on the key are
    * dropped (K2). */
  def load(spark: SparkSession, vcfPath: String, config: Seq[FieldConfig],
           humanGenome: Boolean = true): DataFrame = {
    val v = VcfReader.variants(spark, vcfPath,
      VcfReader.Options(humanGenome = humanGenome))
    v.select((Seq(col("chrom"), col("pos"), col("ref"), col("alt"),
      col("filter"), col("info")) ): _*)
      .select((Seq(col("chrom"), col("pos"), col("ref"), col("alt")) ++
        config.map(fieldColumn)): _*)
      .dropDuplicates("chrom", "pos", "ref", "alt")
  }

  /** The runtime StructType for a source (dynamic-schema regime §1.3). */
  def schemaFor(config: Seq[FieldConfig]): StructType = {
    val base = Seq(
      StructField("chrom", StringType), StructField("pos", LongType),
      StructField("ref", StringType), StructField("alt", StringType))
    StructType(base ++ config.map { c =>
      val t = c.fieldType match {
        case "Float"   => DoubleType
        case "Integer" => IntegerType
        case _         => StringType
      }
      StructField(c.alias, t)
    })
  }
}
