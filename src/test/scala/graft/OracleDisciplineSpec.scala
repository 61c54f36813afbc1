package graft

import org.scalatest.funsuite.AnyFunSuite

/** Tripwire for the oracle-emulation discipline (r17 verdict #1).
  *
  * Three engine↔oracle divergence classes were found in r17, each
  * invisible on the shared testdata (which is İ-free, Σ-free and
  * VT-free):
  *   1. DuckDB LOWER is Unicode SIMPLE-mapping; Java/Spark lower() is
  *      FULL-mapping (İ → i + U+0307). Oracles must pre-substitute
  *      CHR(304) before LOWER (or strip CHR(775) after, the tr form).
  *   2. Java applies the Final_Sigma context rule; RE2/DuckDB does not
  *      (emulated in p10; pinned by tools/casing_parity_probe.py).
  *   3. Java's regex \s includes vertical tab U+000B; RE2's does not.
  *      Oracle tokenizer classes must spell it: [\s\x0b]+, [^\w\s\x0b].
  *   4. (r18, found by tools/adversarial_corpus.py on an NBSP-only
  *      document) DuckDB's ONE-argument trim strips every Unicode Zs
  *      space separator (NBSP, figure/ideographic/ogham spaces...);
  *      Spark's trim strips ASCII 0x20 only. Free-text oracles must
  *      spell the charset: trim(x, ' ').
  *
  * The emulations are hand-maintained strings scattered across the
  * committed oracle SQL — a NEW oracle written with a bare '\s+' or a
  * bare LOWER(tok) would re-open a class silently (it would even pass
  * the driver gate on divergence-free testdata, exactly how the first
  * three stayed invisible for 16 rounds). This spec scans EVERY oracle
  * the driver runs (SparkEntry.oracleSql: the resource .sql files plus
  * the inline maps) and fails on the bare forms. The dynamic half of
  * the discipline — do the emulated expressions actually match Java
  * semantics? — is tools/casing_parity_probe.py, which reads the
  * expressions from the committed files and differential-tests them
  * against CPython; tools/run_tests.sh runs it per round.
  */
class OracleDisciplineSpec extends AnyFunSuite {

  /** Offsets of `\s` occurrences not immediately followed by `\x0b` —
    * a whitespace class that diverges from the engine's Java `\s` on
    * vertical-tab-bearing text (class 3). */
  private[graft] def wsViolations(sql: String): Seq[Int] =
    raw"\\s".r.findAllMatchIn(sql).map(_.start).filter { i =>
      !sql.startsWith("\\x0b", i + 2)
    }.toSeq

  /** Balanced-paren argument of the call whose opening paren is at
    * `open`, respecting single-quoted SQL literals. */
  private def parenArg(sql: String, open: Int): String = {
    var i = open
    var depth = 0
    var inStr = false
    while (i < sql.length) {
      val c = sql.charAt(i)
      if (inStr) {
        if (c == '\'') {
          if (i + 1 < sql.length && sql.charAt(i + 1) == '\'') i += 1
          else inStr = false
        }
      } else c match {
        case '\'' => inStr = true
        case '(' => depth += 1
        case ')' =>
          depth -= 1
          if (depth == 0) return sql.substring(open + 1, i)
        case _ =>
      }
      i += 1
    }
    sql.substring(open + 1)
  }

  /** Offsets of LOWER( calls in a free-text oracle that neither
    * pre-substitute the dotted I (CHR(304) inside the argument) nor
    * strip the combining dot after (the tr form: the LOWER is wrapped
    * as REPLACE(LOWER(x), CHR(775), ...)) — class 1. */
  private[graft] def lowerViolations(sql: String): Seq[Int] =
    raw"(?i)LOWER\(".r.findAllMatchIn(sql).map(_.start).filter { i =>
      val open = i + 5
      val arg = parenArg(sql, open)
      val hasPreSub = arg.toUpperCase.contains("CHR(304)")
      // tr form: REPLACE(LOWER(x), CHR(775), '') — look just past the
      // matching close paren for the CHR(775) strip
      val close = open + 1 + arg.length
      val after = sql.substring(math.min(close, sql.length),
        math.min(close + 16, sql.length))
      val trForm = after.toUpperCase.replaceAll("\\s", "")
        .startsWith("),CHR(775)")
      !hasPreSub && !trForm
    }.toSeq

  /** Offsets of ONE-argument trim( calls — DuckDB's default charset is
    * every Unicode Zs space separator while Spark's trim strips ASCII
    * 0x20 only (class 4); free-text oracles must spell trim(x, ' ').
    * ltrim/rtrim are excluded by the preceding-letter guard (they share
    * the same default but no committed free-text oracle uses them; add
    * them here if one ever does). */
  private[graft] def trimViolations(sql: String): Seq[Int] =
    raw"(?i)(?<![a-z])trim\(".r.findAllMatchIn(sql).map(_.start).filter {
      i =>
        val arg = parenArg(sql, i + 4)
        // a compliant call has a TOP-level comma separating the
        // explicit charset argument
        var depth = 0
        var inStr = false
        var topComma = false
        var j = 0
        while (j < arg.length && !topComma) {
          val c = arg.charAt(j)
          if (inStr) { if (c == '\'') inStr = false }
          else c match {
            case '\'' => inStr = true
            case '(' => depth += 1
            case ')' => depth -= 1
            case ',' if depth == 0 => topComma = true
            case _ =>
          }
          j += 1
        }
        !topComma
    }.toSeq

  /** An oracle is in scope for the casing rule when it reads the
    * free-text corpus; VCF-domain oracles lower ASCII-constrained
    * header/INFO fields where simple and full mappings agree. */
  private def freeText(sql: String): Boolean =
    sql.toLowerCase.contains("documents")

  test("scanner self-test: planted bare forms are flagged") {
    // whitespace: the exact shapes a new tokenizer oracle would use
    assert(wsViolations(raw"REGEXP_SPLIT_TO_ARRAY(text, '\s+')").nonEmpty)
    assert(wsViolations(raw"REGEXP_EXTRACT_ALL(text, '\w+|[^\w\s]')").nonEmpty)
    assert(wsViolations(raw"regexp_replace(text, '[\s\x0b]+', ' ', 'g')").isEmpty)
    assert(wsViolations(raw"'\w+|[^\w\s\x0b]'").isEmpty)
    // casing: bare LOWER over a token vs the two sanctioned forms
    assert(lowerViolations("LIST_CONTAINS(['the'], LOWER(x))").nonEmpty)
    assert(lowerViolations("lower(trim(p))").nonEmpty)
    assert(lowerViolations(
      "LOWER(REPLACE(x, CHR(304), CHR(105) || CHR(775)))").isEmpty)
    assert(lowerViolations("REPLACE(LOWER(x), CHR(775), '')").isEmpty)
    // nested: an outer compliant LOWER must not excuse an inner bare one
    assert(lowerViolations(
      "LOWER(REPLACE(LOWER(x), CHR(304), CHR(105) || CHR(775)))")
      .sizeIs == 1)
    // trim: DuckDB's 1-arg default strips Unicode Zs, Spark's only 0x20
    assert(trimViolations("trim(regexp_replace(text, '[\\s\\x0b]+', ' ', 'g'))").nonEmpty)
    assert(trimViolations("TRIM(x)").nonEmpty)
    assert(trimViolations("trim(regexp_replace(text, '[\\s\\x0b]+', ' ', 'g'), ' ')").isEmpty)
    assert(trimViolations("ltrim(x) || rtrim(y)").isEmpty) // different fns
    assert(trimViolations("trim(f(a, b))").nonEmpty) // inner comma ≠ charset
  }

  test("every embedding oracle carries the similarity-domain filter") {
    // a new embedding oracle written without the dom CTE would pass on
    // the shared corpus (finite, non-zero vectors only) and silently
    // diverge — or hard-error in DuckDB — the moment a NULL/NaN/zero
    // vector appears (r18 adversarial-embeddings find). The engine
    // twin is Similarity.finiteVectorPredicate at every operator entry.
    for ((key, sql) <- SparkEntry.oracleSql.toSeq.sortBy(_._1)
         if sql.toLowerCase.contains("embeddings")) {
      assert(sql.contains("isfinite(") && sql.contains("> 0"),
        s"oracle $key reads embeddings without the similarity-domain " +
          "filter (isfinite(Σx²) AND Σx² > 0 — see any p12-p23 dom CTE)")
    }
  }

  test("every free-text oracle trim carries an explicit ASCII charset") {
    for ((key, sql) <- SparkEntry.oracleSql.toSeq.sortBy(_._1)
         if freeText(sql)) {
      val bad = trimViolations(sql)
      assert(bad.isEmpty,
        s"oracle $key has a 1-argument trim( at offset(s) $bad over " +
          "free text — DuckDB's default charset strips every Unicode " +
          "Zs space separator (NBSP, ideographic space, ...) while " +
          "Spark's trim strips ASCII 0x20 only; spell it trim(x, ' ')")
    }
  }

  test("every committed oracle uses the Java-\\s whitespace class") {
    for ((key, sql) <- SparkEntry.oracleSql.toSeq.sortBy(_._1)) {
      val bad = wsViolations(sql)
      assert(bad.isEmpty,
        s"oracle $key has a bare \\s class at offset(s) $bad — Java's " +
          "\\s includes U+000B, RE2's does not; spell it [\\s\\x0b]")
    }
  }

  test("every free-text oracle LOWER carries the full-casing emulation") {
    for ((key, sql) <- SparkEntry.oracleSql.toSeq.sortBy(_._1)
         if freeText(sql)) {
      val bad = lowerViolations(sql)
      assert(bad.isEmpty,
        s"oracle $key has a bare LOWER( at offset(s) $bad over free " +
          "text — DuckDB lowers İ to i, Java to i+U+0307; " +
          "pre-substitute CHR(304) (or strip CHR(775) after, tr form)")
    }
  }

  test("oracle resource directory has no stray unregistered files") {
    // a .sql file not in VcfOracles.names is dead weight at best and a
    // stale twin of a live oracle at worst; the scans above only see
    // registered oracles, so unregistered files would dodge the tripwire
    val dir = new java.io.File("src/main/resources/oracles")
    assume(dir.isDirectory, "run from the repo root to scan resources")
    val onDisk = dir.listFiles.map(_.getName)
      .filter(_.endsWith(".sql")).map(_.stripSuffix(".sql")).toSet
    val registered = graft.queries.VcfOracles.names.toSet
    assert(onDisk == registered,
      s"unregistered: ${(onDisk -- registered).toSeq.sorted}; " +
        s"missing: ${(registered -- onDisk).toSeq.sorted}")
  }
}
