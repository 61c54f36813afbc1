package graft.ingest

import java.io.{BufferedReader, InputStreamReader}
import scala.collection.mutable

import org.apache.hadoop.fs.Path
import org.apache.hadoop.io.compress.CompressionCodecFactory
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** PGS Catalog scoring-file scan (SURVEY S5 — `prs/pgs_catalog.py:28-342`):
  * `#key=value` metadata header read once on the driver, aliased TSV body
  * read distributed with `comment='#'`.
  */
object PgsReader {

  final case class PgsParseError(message: String) extends Exception(message)

  final case class PgsMetadata(
      pgsId: String,
      genomeBuild: String,
      traitName: Option[String] = None,
      traitOntologyId: Option[String] = None,
      publicationPmid: Option[String] = None,
      weightType: Option[String] = None,
      nVariants: Option[Int] = None,
      reportingAncestry: Option[String] = None)

  val BuildAliases: Map[String, String] = Map(
    "hg38" -> "GRCh38", "hg19" -> "GRCh37", "grch38" -> "GRCh38", "grch37" -> "GRCh37")

  def normalizeBuild(build: String): String =
    BuildAliases.getOrElse(build.toLowerCase, build)

  /** `prs/pgs_catalog.py:27-57` column alias map. */
  val ColumnAliases: Map[String, String] = Map(
    "rsid" -> "rsid", "rs_id" -> "rsid", "snp" -> "rsid",
    "chr_name" -> "chr_name", "chrom" -> "chr_name", "chromosome" -> "chr_name",
    "chr_position" -> "chr_position", "pos" -> "chr_position", "position" -> "chr_position",
    "effect_allele" -> "effect_allele", "a1" -> "effect_allele", "ea" -> "effect_allele",
    "other_allele" -> "other_allele", "a2" -> "other_allele", "oa" -> "other_allele",
    "nea" -> "other_allele",
    "effect_weight" -> "effect_weight", "weight" -> "effect_weight", "beta" -> "effect_weight",
    "allelefrequency_effect" -> "allele_frequency", "eaf" -> "allele_frequency",
    "freq" -> "allele_frequency",
    "is_interaction" -> "is_interaction", "is_haplotype" -> "is_haplotype",
    "is_dominant" -> "is_dominant", "is_recessive" -> "is_recessive",
    "locus_name" -> "locus_name", "gene" -> "locus_name")

  /** Read the leading `#` comment block on the driver. */
  def readHeaderLines(spark: SparkSession, path: String): Seq[String] = {
    val hPath = new Path(path)
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = hPath.getFileSystem(conf)
    val codec = new CompressionCodecFactory(conf).getCodec(hPath)
    val rawIn = fs.open(hPath)
    val in = if (codec != null) codec.createInputStream(rawIn) else rawIn
    val reader = new BufferedReader(new InputStreamReader(in, "UTF-8"))
    try {
      val lines = mutable.ArrayBuffer[String]()
      var line = reader.readLine()
      while (line != null && line.startsWith("#")) {
        lines += line
        line = reader.readLine()
      }
      lines.toSeq
    } finally reader.close()
  }

  /** `parse_pgs_header` (`prs/pgs_catalog.py:60-115`): `###` section
    * markers ignored; `#key=value` pairs collected; pgs_id + genome_build
    * required. */
  def parseHeader(lines: Seq[String]): PgsMetadata = {
    val meta = mutable.Map[String, String]()
    lines.foreach { l =>
      if (!l.startsWith("###") && l.startsWith("#")) {
        val body = l.drop(1).trim
        val i = body.indexOf('=')
        if (i > 0) meta(body.substring(0, i).trim.toLowerCase) = body.substring(i + 1).trim
      }
    }
    if (!meta.contains("pgs_id")) throw PgsParseError("Missing required header field: pgs_id")
    if (!meta.contains("genome_build"))
      throw PgsParseError("Missing required header field: genome_build")
    PgsMetadata(
      pgsId = meta("pgs_id"),
      genomeBuild = meta("genome_build"),
      traitName = meta.get("trait_name"),
      traitOntologyId = meta.get("trait_ontology_id"),
      publicationPmid = meta.get("publication_pmid"),
      weightType = meta.get("weight_type"),
      nVariants = meta.get("n_variants").flatMap(v => scala.util.Try(v.toInt).toOption),
      reportingAncestry = meta.get("reporting_ancestry"))
  }

  def readMetadata(spark: SparkSession, path: String): PgsMetadata =
    parseHeader(readHeaderLines(spark, path))

  /** Body scan: aliased columns, typed weights. Weights are stored RAW
    * regardless of `#weight_type` — the reference records weight_type as
    * score metadata only and never transforms effect_weight
    * (`prs/pgs_catalog.py:286-342` parses the value as-is;
    * `prs/loader.py:113` inserts it unchanged; its tests pin
    * `weight_type=OR` / `log(OR)` as metadata round trips). Rows missing
    * effect_allele or effect_weight are dropped — the row-filter twin of
    * the reference's per-row `PGSParseError` (documented deviation:
    * strict-abort there, null-and-drop here, as on the GWAS scan). Empty
    * strings are missing values (`get_value`, `pgs_catalog.py:287-294`). */
  def read(spark: SparkSession, path: String): (PgsMetadata, DataFrame) = {
    val meta = readMetadata(spark, path)
    val raw = spark.read
      .option("sep", "\t").option("header", "true").option("comment", "#")
      .csv(path)
    // first-wins aliasing (see GwasReader.read): two source headers
    // mapping to one canonical name must not produce duplicate columns
    val renamed = raw.columns.foldLeft(raw) { (df, c) =>
      val n = c.toLowerCase.trim
      val canonical = ColumnAliases.getOrElse(n, n)
      if (canonical != c && df.columns.contains(canonical)) df
      else df.withColumnRenamed(c, canonical)
    }
    def opt(c: String, t: DataType): org.apache.spark.sql.Column =
      if (renamed.columns.contains(c)) nullif(trim(col(c)), lit("")).cast(t)
      else lit(null).cast(t)

    val body = renamed.select(
      opt("rsid", StringType).as("rsid"),
      opt("chr_name", StringType).as("chr_name"),
      opt("chr_position", LongType).as("chr_position"),
      upper(opt("effect_allele", StringType)).as("effect_allele"),
      upper(opt("other_allele", StringType)).as("other_allele"),
      opt("effect_weight", DoubleType).as("effect_weight"),
      opt("allele_frequency", DoubleType).as("allele_frequency"),
      opt("locus_name", StringType).as("locus_name"))
      .withColumn("pgs_id", lit(meta.pgsId))
      .filter(col("effect_allele").isNotNull && col("effect_weight").isNotNull)
    (meta, body)
  }
}
