package graft.ingest

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** GWAS-SSF summary-statistics TSV scan (SURVEY S4 —
  * `gwas/loader.py:18-50,203-316`): header alias normalization
  * (case-insensitive, the reference's 23-entry alias map),
  * required-column validation, typed casts. The scan itself is
  * `spark.read.csv`, so schema validation is driver-side metadata work
  * and the data path stays distributed.
  */
object GwasReader {

  final case class GwasParseError(message: String) extends Exception(message)

  val RequiredColumns: Set[String] =
    Set("chromosome", "base_pair_location", "effect_allele", "other_allele", "p_value")

  /** `gwas/loader.py:27-50`, applied to lower-cased trimmed headers. */
  val ColumnAliases: Map[String, String] = Map(
    "chr" -> "chromosome", "chrom" -> "chromosome",
    "pos" -> "base_pair_location", "position" -> "base_pair_location",
    "bp" -> "base_pair_location",
    "a1" -> "effect_allele", "ea" -> "effect_allele",
    "a2" -> "other_allele", "oa" -> "other_allele", "nea" -> "other_allele",
    "pval" -> "p_value", "pvalue" -> "p_value", "p" -> "p_value",
    "se" -> "standard_error",
    "eaf" -> "effect_allele_frequency", "freq" -> "effect_allele_frequency",
    "maf" -> "effect_allele_frequency",
    "or" -> "odds_ratio",
    "n" -> "n", "n_total" -> "n",
    "rs" -> "rsid", "snp" -> "rsid", "marker" -> "rsid")

  def normalizeColumn(name: String): String = {
    val n = name.toLowerCase.trim
    ColumnAliases.getOrElse(n, n)
  }

  def read(spark: SparkSession, path: String): DataFrame = {
    val raw = spark.read
      .option("sep", "\t").option("header", "true")
      .csv(path)

    // first-wins aliasing: a TSV carrying BOTH 'snp' and 'rsid' (marker
    // name plus rsid — common) must not rename both onto one canonical
    // name, which would make every later col("rsid") reference ambiguous
    // and crash the read
    val renamed = raw.columns.foldLeft(raw) { (df, c) =>
      val canonical = normalizeColumn(c)
      if (canonical != c && df.columns.contains(canonical)) df
      else df.withColumnRenamed(c, canonical)
    }

    val missing = RequiredColumns -- renamed.columns.toSet
    if (missing.nonEmpty)
      throw GwasParseError(s"Missing required columns: ${missing.toSeq.sorted.mkString(", ")}")

    // `get_value` (`loader.py:249-256`) strips then treats the EMPTY
    // string as missing — a whitespace-only chromosome or allele is
    // absent, not a "" value, so the required-value filter below drops
    // the row (the reference aborts; see the documented deviation on the
    // S4 COVERAGE row: malformed/missing values there raise
    // GWASParseError for the whole file, here they null out and the
    // row-level filter applies)
    def blankNull(c: org.apache.spark.sql.Column) = nullif(trim(c), lit(""))
    def opt(c: String, t: DataType): org.apache.spark.sql.Column =
      if (renamed.columns.contains(c)) blankNull(col(c)).cast(t)
      else lit(null).cast(t)

    renamed.select(
      blankNull(col("chromosome")).as("chromosome"),
      blankNull(col("base_pair_location")).cast(LongType).as("base_pair_location"),
      upper(blankNull(col("effect_allele"))).as("effect_allele"),
      upper(blankNull(col("other_allele"))).as("other_allele"),
      blankNull(col("p_value")).cast(DoubleType).as("p_value"),
      opt("rsid", StringType).as("rsid"),
      opt("beta", DoubleType).as("beta"),
      opt("odds_ratio", DoubleType).as("odds_ratio"),
      opt("standard_error", DoubleType).as("standard_error"),
      opt("effect_allele_frequency", DoubleType).as("effect_allele_frequency"),
      // int(float(x)) semantics for sample sizes (`loader.py:268-276`)
      opt("n", DoubleType).cast(IntegerType).as("n"),
      opt("n_cases", DoubleType).cast(IntegerType).as("n_cases"),
      opt("info", DoubleType).as("info_score"))
      .filter(col("chromosome").isNotNull && col("base_pair_location").isNotNull &&
        col("effect_allele").isNotNull && col("p_value").isNotNull)
  }
}
