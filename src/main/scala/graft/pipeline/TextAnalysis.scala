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
    * (`\w+|[^\w\s]`), the standard pre-tokenizer shape. NULL text →
    * NULL count (the bare `size()` spelling leaks Spark's legacy
    * size(NULL) = -1 when ANSI is off — found by the r18 adversarial
    * corpus gate, tools/adversarial_corpus.py). */
  def bpeishTokenCount(text: Column): Column =
    when(text.isNotNull,
      size(regexp_extract_all(text, lit("\\w+|[^\\w\\s]"), lit(0))))

  /** Whitespace token count, NULL-safe: NULL text → NULL, not the
    * legacy size(NULL) = -1. */
  def tokenCount(text: Column): Column =
    when(text.isNotNull, size(tokens(text)))

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
  // The r15 LangIdProbe measured the 7-family boundary: pl→it and ro→es
  // misattributions at near-zero margin (sv/tr resolved to unknown).
  // These four families close that leak. Selection rule: function words
  // only, and NO ENGLISH HOMOGRAPHS — a word that is also common English
  // vocabulary ("men", "go", "care", "ale", "ten", "till") would hand
  // the new family votes on every English document, including the
  // synthetic English-salad corpora where a single stray vote flips an
  // "unknown" prediction.
  val SvStopwords: Seq[String] = Seq("och", "att", "det", "som", "en", "är",
    "av", "för", "på", "med", "ett", "var", "han", "hon", "inte", "jag",
    "vi", "om")
  // "i" (Polish "and") is deliberately absent despite being the most
  // common Polish word: lowered English "I" collides with it (the same
  // collision ItStopwords already carries), and since Italian counts
  // "i" too it adds ZERO pl-vs-it discrimination on Polish text — only
  // runner-up noise on English prose.
  val PlStopwords: Seq[String] = Seq("w", "z", "na", "się", "jest",
    "nie", "że", "od", "po", "za", "był", "było", "byli", "jak", "co")
  val TrStopwords: Seq[String] = Seq("ve", "bir", "bu", "çok", "için",
    "ile", "ama", "onu", "bence", "daha", "gibi", "sonra", "kadar", "biz",
    "ne", "değil")
  val RoStopwords: Seq[String] = Seq("și", "în", "de", "la", "cu", "pe",
    "este", "sunt", "un", "o", "nu", "mai", "pentru", "din", "ce", "dar",
    "că", "după", "ar", "fost", "să")

  private def stopwordCount(toks: Column, stops: Seq[String]): Column =
    size(filter(toks, t => lower(t).isin(stops: _*)))

  /** tr family only: dotted capital İ (U+0130) lowercases under Unicode
    * default casing to "i" + COMBINING U+0307, so sentence-initial
    * Turkish function words ("İçin", "İle") would fail the exact match
    * above — strip the combining dot after lowering. Deliberately NOT
    * applied globally: a standalone Turkish "İ" stripped to bare "i"
    * would hand Italian (whose list carries "i") a vote. DuckDB's LOWER
    * produces the same combining form, and the p09 oracle mirrors the
    * strip (REPLACE(LOWER(x), CHR(775), '')). */
  private def stopwordCountTr(toks: Column, stops: Seq[String]): Column =
    size(filter(toks, t =>
      translate(lower(t), "\u0307", "").isin(stops: _*)))

  /** The eleven latin-script vote families in priority order:
    * (stopwords, tie-break priority, language code). Priority
    * reproduces the en-first when-chain order of the original 4-family
    * form on exact ratio ties. */
  private[pipeline] val LatinFamilies: Seq[(Seq[String], Int, String)] =
    Seq((EnStopwords, 11, "en"), (DeStopwords, 10, "de"),
      (FrStopwords, 9, "fr"), (EsStopwords, 8, "es"),
      (PtStopwords, 7, "pt"), (ItStopwords, 6, "it"),
      (NlStopwords, 5, "nl"), (SvStopwords, 4, "sv"),
      (PlStopwords, 3, "pl"), (TrStopwords, 2, "tr"),
      (RoStopwords, 1, "ro"))

  /** Per-family stopword hit counts over the token array in ONE
    * traversal: lower every token once (`transform`, bound so the
    * lowered array materializes once), then a single `aggregate` pass
    * carries an 11-wide count array, each token adding its 0/1
    * membership per family \u2014 the family tests inside the lambda read
    * the lowered token as a variable, so the per-token cost is one
    * lower + one tr dot-strip + 11 set probes. The pre-r18 shape ran
    * 11 separate `size(filter(toks, lower(t).isin(...)))` traversals
    * (one per family), re-lowering every token 11\u00d7 in interpreted HOF
    * lambdas; [[langVoteCountsMultiPass]] keeps that shape as the
    * differential twin (VotePassProbe measures the difference, the
    * fuzz spec pins equality). */
  private[graft] def langVoteCounts(toks: Column): Column =
    bindOnce(transform(toks, t => lower(t))) { lows =>
      aggregate(lows, array(LatinFamilies.map(_ => lit(0)): _*),
        (acc, lt) => array(LatinFamilies.zipWithIndex.map {
          case ((stops, _, code), i) =>
            val key =
              if (code == "tr") translate(lt, "\u0307", "") else lt
            element_at(acc, i + 1) + when(key.isin(stops: _*), 1)
              .otherwise(0)
        }: _*))
    }

  /** The pre-r18 11-traversal vote shape \u2014 [[langVoteCounts]]'s
    * differential twin (spec-pinned equal on the unicode fuzz corpus;
    * kept for the A/B probe and as the readable spelling of the
    * semantics). */
  private[graft] def langVoteCountsMultiPass(toks: Column): Column =
    array(LatinFamilies.map { case (stops, _, code) =>
      if (code == "tr") stopwordCountTr(toks, stops)
      else stopwordCount(toks, stops)
    }: _*)

  /** Quality metrics + composite score (length / punctuation / stopword
    * ratios — the standard C4/Gopher-style cheap filters).
    *
    * All seven metrics are computed inside ONE bound expression (see
    * [[bindOnce]]): the naive per-column spelling re-ran the regex
    * tokenizer up to ~11x per row — each column referencing `toks`
    * re-evaluates the split (HOFs are interpreted, no subexpression
    * elimination), and CollapseProject inlines the metric columns into
    * quality_score's CASEs on top. The struct column is referenced once
    * per output field, which CollapseProject leaves uninlined (the
    * producer expression is non-cheap) — computed once per row;
    * identical values, so the p03 oracle is unchanged. */
  def withQuality(df: DataFrame, textCol: String = "text"): DataFrame = {
    val text = col(textCol)
    val q = bindOnce(tokens(text)) { toks =>
      bindOnce(struct(
        length(text).as("n_chars"),
        size(toks).as("n_tokens"),
        aggregate(toks, lit(0L), (acc, t) => acc + length(t)).as("tok_chars"),
        stopwordCount(toks, EnStopwords).as("stops"),
        length(regexp_replace(text, "[^.,!?;:]", "")).as("punct"),
        length(regexp_replace(text, "[^A-Z]", "")).as("upper"))) { s =>
        val nCh = s.getField("n_chars")
        val nTok = s.getField("n_tokens")
        val mean =
          when(nTok > 0, s.getField("tok_chars").cast(DoubleType) / nTok)
        val punct = when(nCh > 0, s.getField("punct").cast(DoubleType) / nCh)
        val upper = when(nCh > 0, s.getField("upper").cast(DoubleType) / nCh)
        val stopr = when(nTok > 0, s.getField("stops").cast(DoubleType) / nTok)
        // NULL text → NULL n_tokens (size() of the null token array is
        // the legacy -1 with ANSI off); every OTHER field already
        // null-propagates through its when-guards, and quality_score's
        // four otherwise(0.0) branches deliberately score a NULL
        // document 0.0 on both engine and oracle (CASE..ELSE fires)
        struct(nCh.as("n_chars"),
          when(text.isNotNull, nTok).as("n_tokens"),
          mean.as("mean_token_len"), punct.as("punct_ratio"),
          upper.as("upper_ratio"), stopr.as("stopword_ratio"),
          (when(nTok.between(5, 100000), 0.25).otherwise(0.0) +
           when(mean.between(2.0, 12.0), 0.25).otherwise(0.0) +
           when(punct < 0.2, 0.25).otherwise(0.0) +
           when(upper < 0.3, 0.25).otherwise(0.0)).as("quality_score"))
      }
    }
    df.withColumn("_q", q)
      .withColumn("n_chars", col("_q.n_chars"))
      .withColumn("n_tokens", col("_q.n_tokens"))
      .withColumn("mean_token_len", col("_q.mean_token_len"))
      .withColumn("punct_ratio", col("_q.punct_ratio"))
      .withColumn("upper_ratio", col("_q.upper_ratio"))
      .withColumn("stopword_ratio", col("_q.stopword_ratio"))
      .withColumn("quality_score", col("_q.quality_score"))
      .drop("_q")
  }

  /** Evaluate `c` ONCE per row and feed the bound value to `f` — the
    * `transform(array(c), λ)` single-element idiom. Higher-order
    * functions are interpreted (outside whole-stage codegen and its
    * subexpression elimination), so an expensive subtree referenced
    * from several branches of a CASE re-evaluates per reference;
    * binding it as a lambda variable makes every reference a variable
    * read. Measured on langIdWithMargin: the unbound 7-family form
    * re-evaluated the tokenize+filter tree up to ~10x per row (p09 at
    * sf0.1: ~5-6 s vs ~1.5 s for the old 4-family form); bound, the
    * wider vote costs about what the narrow one did. */
  private[pipeline] def bindOnce(c: Column)(f: Column => Column): Column =
    element_at(transform(array(c), f), 1)

  /** Language ID: script detection for CJK/Cyrillic/Arabic/Hangul, then a
    * stopword vote among ELEVEN latin-script languages (en/de/fr/es/pt/
    * it/nl + sv/pl/tr/ro since r16 — the r15 probe's measured
    * out-of-set leak, closed by giving the leaking languages their own
    * families) — the classic cheap n-gram-free heuristic, built from
    * pure SQL expressions (no UDF; the CASE sits in interpreted HOF
    * lambdas via [[bindOnce]] so every expensive subtree evaluates
    * exactly once per row). Returns a struct of `lang` and
    * `lang_margin`: for a script-detected language the margin is the
    * winning script's character ratio; for a latin-script vote it is
    * the gap between the best and second-best stopword ratios (0.0 on
    * a tie or with no evidence — ties break in list order, en first;
    * the four new families sit BELOW the original seven, so any text
    * the old classifier labeled confidently keeps its label on ties).
    * BOUNDARY: languages outside these 16 resolve to whichever family
    * shares the most function words, with a near-zero margin (da→sv,
    * cs→pl are the measured nearest neighbors) — filter on
    * `lang_margin` when precision matters. */
  def langIdWithMargin(text: Column): Column = {
    val n = greatest(length(text), lit(1))
    def scriptRatio(pattern: String): Column =
      lit(1.0) - length(regexp_replace(text, pattern, "")).cast(DoubleType) / n
    // regexp_replace keeps only the script chars when we strip its
    // complement

    bindOnce(tokens(text)) { toks =>
      val nToks = greatest(size(toks), lit(1))
      // ONE traversal computes all 11 hit counts (r18; the prior
      // per-family filter shape re-walked and re-lowered the token
      // array 11×, measured by VotePassProbe), bound so best and
      // runner-up below share it. (ratio, priority, code) structs
      // sorted ascending: the last element is the winning language —
      // on ratio ties the HIGHEST priority sorts last, reproducing the
      // en-first when-chain order of the 4-family form; the runner-up
      // ratio (for the margin) is order-insensitive. An external SQL
      // oracle reproduces the same values from a plain sorted ratio
      // list.
      bindOnce(langVoteCounts(toks)) { cnts =>
      val sorted = sort_array(array(LatinFamilies.zipWithIndex.map {
        case ((_, prio, code), i) =>
          struct((element_at(cnts, i + 1).cast(DoubleType) / nToks)
            .as("r"), lit(prio).as("p"), lit(code).as("c"))
      }: _*))
      // bind every expensive piece — 5 script regex ratios, the sorted
      // vote (its best and runner-up) — so the CASE branches below read
      // variables instead of re-running regexes and token filters
      bindOnce(struct(
        scriptRatio("[\\x{3040}-\\x{30ff}]").as("kana"),
        scriptRatio("[\\x{4e00}-\\x{9fff}]").as("han"),
        scriptRatio("[\\x{ac00}-\\x{d7af}]").as("hangul"),
        scriptRatio("[\\x{0400}-\\x{04ff}]").as("cyr"),
        scriptRatio("[\\x{0600}-\\x{06ff}]").as("arab"),
        element_at(sorted, 11).as("best"),
        element_at(sorted, 10).as("second"))) { s =>
        val kana = s.getField("kana"); val han = s.getField("han")
        val hangul = s.getField("hangul"); val cyr = s.getField("cyr")
        val arab = s.getField("arab")
        val best = s.getField("best"); val second = s.getField("second")
        val bestR = best.getField("r")
        // null/empty first: an empty text makes every script ratio 1.0
        // (the n = max(length, 1) guard divides 0 stripped chars by 1),
        // which would otherwise classify "" as whatever script branch
        // fires first, and a NULL text would fall through every
        // null-valued condition into the final otherwise
        val lang = when(text.isNull || length(text) === 0, "unknown")
          .when(kana > 0.05, "ja")
          .when(han > 0.3, "zh")
          .when(hangul > 0.3, "ko")
          .when(cyr > 0.3, "ru")
          .when(arab > 0.3, "ar")
          .when(bestR === lit(0.0), "unknown")
          .otherwise(best.getField("c"))
        val margin = when(text.isNull || length(text) === 0, lit(0.0))
          .when(kana > 0.05, kana)
          .when(han > 0.3, han)
          .when(hangul > 0.3, hangul)
          .when(cyr > 0.3, cyr)
          .when(arab > 0.3, arab)
          .when(bestR === lit(0.0), lit(0.0))
          .otherwise(bestR - second.getField("r"))
        struct(lang.as("lang"), margin.as("lang_margin"))
      }
      }
    }
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
    * jaccard). Documents with 1 to k-1 words yield their single joined
    * form; ZERO words yield the EMPTY set and a NULL token array stays
    * NULL. The pre-r18 spelling gave an empty document the shingle set
    * {""} — a real set that made every empty document a near-duplicate
    * of every other: jaccard 1.0, a shared minhash signature, and at
    * corpus scale a single quadratic pair bucket over every
    * empty/whitespace-only document (found by the adversarial corpus
    * gate, tools/adversarial_corpus.py; the DuckDB oracles already
    * excluded them because ARRAY_TO_STRING([]) is NULL there and
    * LIST_DISTINCT drops it). Zero shingles = no content evidence =
    * excluded from every pair path. */
  def wordShingles(toks: Column, k: Int): Column =
    when(toks.isNull, lit(null).cast(ArrayType(StringType)))
      .when(size(toks) === 0, slice(toks, 1, 0))
      .when(size(toks) >= k,
        transform(sequence(lit(0), size(toks) - k),
          i => array_join(slice(toks, i + 1, lit(k)), " ")))
      .otherwise(array(array_join(toks, " ")))
}
