package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Text-analysis operators for large-scale training-data pipelines:
  * tokenization, quality scoring, language ID, fingerprinting. All are
  * native column expressions (whole-stage codegen; zero UDFs, zero
  * shuffles) — at 100 TB these run at scan speed inside the same stage as
  * the parquet read.
  */
object TextAnalysis {

  /** Whitespace tokens with empties dropped. */
  def tokens(text: Column): Column =
    filter(split(text, "\\s+"), t => t =!= "")

  /** BPE-ish subword proxy: word pieces + isolated punctuation
    * (`\w+|[^\w\s]`), the standard pre-tokenizer shape. */
  def bpeishTokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit("\\w+|[^\\w\\s]"), lit(0)))

  val EnStopwords: Seq[String] = Seq("the", "a", "an", "and", "or", "of", "to",
    "in", "is", "are", "was", "it", "that", "this", "for", "on", "with", "as")
  val DeStopwords: Seq[String] = Seq("der", "die", "das", "und", "oder", "von",
    "zu", "in", "ist", "sind", "war", "es", "dass", "für", "auf", "mit", "als", "ein", "eine")
  val FrStopwords: Seq[String] = Seq("le", "la", "les", "et", "ou", "de", "du",
    "à", "en", "est", "sont", "était", "il", "que", "ce", "pour", "sur", "avec", "un", "une")
  val EsStopwords: Seq[String] = Seq("el", "la", "los", "las", "y", "o", "de",
    "del", "a", "en", "es", "son", "era", "que", "este", "para", "sobre", "con", "un", "una")
  val PtStopwords: Seq[String] = Seq("o", "a", "os", "as", "e", "ou", "de",
    "do", "da", "em", "é", "são", "era", "que", "este", "para", "sobre", "com", "um", "uma")
  val ItStopwords: Seq[String] = Seq("il", "lo", "la", "i", "gli", "le", "e",
    "o", "di", "del", "della", "in", "è", "sono", "era", "che", "questo", "per", "su", "con", "un", "una")
  val NlStopwords: Seq[String] = Seq("de", "het", "een", "en", "of", "van",
    "te", "in", "is", "zijn", "was", "dat", "dit", "voor", "op", "met", "als")

  private def stopwordCount(toks: Column, stops: Seq[String]): Column =
    size(filter(toks, t => lower(t).isin(stops: _*)))

  /** Quality metrics + composite score (length / punctuation / stopword
    * ratios — the standard C4/Gopher-style cheap filters). */
  def withQuality(df: DataFrame, textCol: String = "text"): DataFrame = {
    val text = col(textCol)
    val toks = tokens(text)
    df.withColumn("n_chars", length(text))
      .withColumn("n_tokens", size(toks))
      .withColumn("mean_token_len",
        when(size(toks) > 0,
          aggregate(toks, lit(0L), (acc, t) => acc + length(t)).cast(DoubleType) / size(toks)))
      .withColumn("punct_ratio",
        when(length(text) > 0,
          length(regexp_replace(text, "[^.,!?;:]", "")).cast(DoubleType) / length(text)))
      .withColumn("upper_ratio",
        when(length(text) > 0,
          length(regexp_replace(text, "[^A-Z]", "")).cast(DoubleType) / length(text)))
      .withColumn("stopword_ratio",
        when(size(toks) > 0,
          stopwordCount(toks, EnStopwords).cast(DoubleType) / size(toks)))
      .withColumn("quality_score",
        (when(col("n_tokens").between(5, 100000), 0.25).otherwise(0.0) +
         when(col("mean_token_len").between(2.0, 12.0), 0.25).otherwise(0.0) +
         when(col("punct_ratio") < 0.2, 0.25).otherwise(0.0) +
         when(col("upper_ratio") < 0.3, 0.25).otherwise(0.0)))
  }

  /** Language ID: script detection for CJK/Cyrillic/Arabic/Hangul, then a
    * stopword vote among SEVEN latin-script languages (en/de/fr/es/pt/it/
    * nl — the dominant web-corpus set) — the classic cheap n-gram-free
    * heuristic, entirely in codegen'd expressions. Returns a struct of
    * `lang` and `lang_margin`: for a script-detected language the margin
    * is the winning script's character ratio; for a latin-script vote it
    * is the gap between the best and second-best stopword ratios (0.0 on
    * a tie or with no evidence — ties break in list order, en first).
    * BOUNDARY: languages outside these 12 resolve to whichever family
    * shares the most function words, with a near-zero margin — filter on
    * `lang_margin` when precision matters. */
  def langIdWithMargin(text: Column): Column = {
    val n = greatest(length(text), lit(1))
    def scriptRatio(pattern: String): Column =
      length(regexp_replace(text, pattern, "")).cast(DoubleType) / n
    // regexp_replace keeps only the script chars when we strip its complement
    val han = lit(1.0) - scriptRatio("[\\x{4e00}-\\x{9fff}]")
    val kana = lit(1.0) - scriptRatio("[\\x{3040}-\\x{30ff}]")
    val hangul = lit(1.0) - scriptRatio("[\\x{ac00}-\\x{d7af}]")
    val cyr = lit(1.0) - scriptRatio("[\\x{0400}-\\x{04ff}]")
    val arab = lit(1.0) - scriptRatio("[\\x{0600}-\\x{06ff}]")

    val toks = tokens(text)
    val nToks = greatest(size(toks), lit(1))
    val en = stopwordCount(toks, EnStopwords).cast(DoubleType) / nToks
    val de = stopwordCount(toks, DeStopwords).cast(DoubleType) / nToks
    val fr = stopwordCount(toks, FrStopwords).cast(DoubleType) / nToks
    val es = stopwordCount(toks, EsStopwords).cast(DoubleType) / nToks
    val pt = stopwordCount(toks, PtStopwords).cast(DoubleType) / nToks
    val it = stopwordCount(toks, ItStopwords).cast(DoubleType) / nToks
    val nl = stopwordCount(toks, NlStopwords).cast(DoubleType) / nToks
    // sorted ascending: element 7 = best, element 6 = runner-up — the
    // margin form an external SQL oracle can reproduce bit-for-bit
    val sortedRatios = sort_array(array(en, de, fr, es, pt, it, nl))
    val latinBest = element_at(sortedRatios, 7)
    val latinMargin = latinBest - element_at(sortedRatios, 6)

    // null/empty first: an empty text makes every script ratio 1.0 (the
    // n = max(length, 1) guard divides 0 stripped chars by 1), which
    // would otherwise classify "" as whatever script branch fires first,
    // and a NULL text would fall through every null-valued condition
    // into the final otherwise
    val lang = when(text.isNull || length(text) === 0, "unknown")
      .when(kana > 0.05, "ja")
      .when(han > 0.3, "zh")
      .when(hangul > 0.3, "ko")
      .when(cyr > 0.3, "ru")
      .when(arab > 0.3, "ar")
      .when(latinBest === lit(0.0), "unknown")
      .when(latinBest === en, "en")
      .when(latinBest === de, "de")
      .when(latinBest === fr, "fr")
      .when(latinBest === es, "es")
      .when(latinBest === pt, "pt")
      .when(latinBest === it, "it")
      .otherwise("nl")
    val margin = when(text.isNull || length(text) === 0, lit(0.0))
      .when(kana > 0.05, kana)
      .when(han > 0.3, han)
      .when(hangul > 0.3, hangul)
      .when(cyr > 0.3, cyr)
      .when(arab > 0.3, arab)
      .when(latinBest === lit(0.0), lit(0.0))
      .otherwise(latinMargin)
    struct(lang.as("lang"), margin.as("lang_margin"))
  }

  /** The predicted language alone (see [[langIdWithMargin]] for the
    * margin-bearing form and the 12-language boundary). Catalyst's
    * SimplifyExtractValueOps collapses the struct-then-field shape, so
    * this costs the same as computing the label directly. */
  def langIdCol(text: Column): Column =
    langIdWithMargin(text).getField("lang")

  /** Slice of md5(c) parsed as a long — the engine-portable hash
    * primitive (md5 is standardized; xxhash64 is Spark-specific and
    * unverifiable by an external oracle). `len` ≤ 15 keeps the value in
    * positive signed-64 range. Codegen'd builtins, still scan-speed. */
  private[pipeline] def md5Bits(c: Column, start: Int, len: Int): Column =
    conv(substring(md5(c), start, len), 16, 10).cast(LongType)

  /** Whole-document fingerprint: 60-bit md5-derived hash of the
    * normalized text (rolling-hash analogue for content identity),
    * reproducible in any engine with md5. Collapse whitespace FIRST and
    * trim LAST: Spark's trim strips only spaces, so trimming first
    * leaves leading/trailing tabs/newlines that collapse into edge
    * spaces — "a b" and "a b\n" would fingerprint differently. */
  def fingerprint(text: Column): Column =
    md5Bits(lower(trim(regexp_replace(text, "\\s+", " "))), 1, 15)

  /** Word k-shingles as space-joined strings (basis for minhash /
    * jaccard). Documents shorter than k words yield their single joined
    * form. */
  def wordShingles(toks: Column, k: Int): Column =
    when(size(toks) >= k,
      transform(sequence(lit(0), size(toks) - k),
        i => array_join(slice(toks, i + 1, lit(k)), " ")))
      .otherwise(array(array_join(toks, " ")))
}
