package graft.transform

import scala.util.matching.Regex

import graft.sinks.DbFs

/** Custom PHI pattern persistence (`cli.py:5823-5880` phi patterns add +
  * `phi/patterns.py:224-240` load_custom_patterns): user-defined detection
  * patterns live in a TOML file of `[[patterns]]` tables (the reference's
  * default file name is phi_patterns.toml) and are merged into the builtin
  * registry by later scans. Validation mirrors the reference: severity must
  * be one of critical/high/medium/low (`patterns.py:26-28`), and the regex
  * must compile — both rejected at add time AND at load time (a hand-edited
  * file gets the same errors `PHIPattern.from_dict` would raise).
  *
  * Driver-side file IO on a small config file — same single-node shape as
  * the reference's tomllib/tomli_w round trip.
  */
object PhiPatternRegistry {

  import PhiSanitizer.{PhiPattern, Severities}

  /** Validate + compile one pattern the way `PHIPattern.from_dict` +
    * `phi_patterns_add` do: severity vocabulary first, then regex compile;
    * case_insensitive folds into the compiled regex as an inline flag. */
  def make(name: String, pattern: String, severity: String,
      description: String, caseInsensitive: Boolean = false): PhiPattern = {
    if (!Severities.contains(severity))
      sys.error(s"Invalid severity: $severity. " +
        s"Must be one of: ${Severities.mkString(", ")}")
    if (pattern.isEmpty)
      sys.error("Invalid regex pattern: empty pattern matches at every " +
        "position")
    val src = if (caseInsensitive) "(?i)" + pattern else pattern
    val compiled =
      try src.r
      catch { case e: java.util.regex.PatternSyntaxException =>
        sys.error(s"Invalid regex pattern: ${e.getMessage}") }
    PhiPattern(name, compiled, severity, description)
  }

  /** Parse one value: a quoted string (escapes honored; anything after
    * the closing quote must be whitespace or a `#` comment), or a bare
    * token with any trailing comment stripped. Scanning to the CLOSING
    * quote — rather than requiring the raw value to end with one — is
    * what makes a hand-edited `pattern = "x" # note` parse as `x`
    * instead of silently compiling a regex that includes the quotes and
    * comment and matches nothing; an unterminated string or trailing
    * garbage errors loudly, the same contract as the reference's
    * from_dict validation. */
  private def parseValue(v: String, line: String): String = {
    val t = v.trim
    if (t.startsWith("\"")) {
      val out = new StringBuilder
      var i = 1
      var closed = false
      while (i < t.length && !closed) {
        val c = t.charAt(i)
        if (c == '\\' && i + 1 < t.length) {
          t.charAt(i + 1) match {
            case '\\' => out += '\\'
            case '"'  => out += '"'
            case 't'  => out += '\t'
            case 'n'  => out += '\n'
            case 'r'  => out += '\r'
            case o    => out += '\\'; out += o
          }
          i += 2
        } else if (c == '"') { closed = true; i += 1 }
        else { out += c; i += 1 }
      }
      if (!closed)
        sys.error(s"Unterminated string in pattern config line: $line")
      val rest = t.substring(i).trim
      if (rest.nonEmpty && !rest.startsWith("#"))
        sys.error(s"Trailing content after string in pattern config line: $line")
      out.toString
    } else {
      val hash = t.indexOf('#')
      (if (hash >= 0) t.substring(0, hash) else t).trim
    }
  }

  private def quote(v: String): String =
    "\"" + v.flatMap {
      case '\\' => "\\\\"
      case '"'  => "\\\""
      case '\t' => "\\t"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case c    => c.toString
    } + "\""

  /** Raw (pre-compile) fields of one [[patterns]] table. */
  final case class RawPattern(name: String, pattern: String, severity: String,
      description: String, caseInsensitive: Boolean)

  private def parseRaw(lines: Seq[String]): Seq[RawPattern] = {
    val out = scala.collection.mutable.ArrayBuffer[RawPattern]()
    var cur: scala.collection.mutable.Map[String, String] = null
    def flush(): Unit = if (cur != null) {
      out += RawPattern(
        cur.getOrElse("name", ""),
        cur.getOrElse("pattern", ""),
        cur.getOrElse("severity", ""),
        cur.getOrElse("description", ""),
        cur.get("case_insensitive").contains("true"))
      cur = null
    }
    lines.foreach { raw =>
      // a '#' inside a QUOTED value is content, not a comment —
      // parseValue decides per value instead of line-level stripping
      val t = raw.trim
      if (t == "[[patterns]]") { flush(); cur = scala.collection.mutable.Map() }
      else if (cur != null && t.nonEmpty && !t.startsWith("#")) {
        val i = t.indexOf('=')
        if (i > 0) {
          val key = t.substring(0, i).trim
          cur(key) = parseValue(t.substring(i + 1), t)
        }
      }
    }
    flush()
    out.toSeq
  }

  /** Load + validate every custom pattern in the file; errors name the
    * offending entry. Missing file is an error (the reference raises
    * FileNotFoundError — `patterns.py:225-226`). */
  def load(path: String): Seq[PhiPattern] = {
    val text = DbFs.readString(path).getOrElse(
      sys.error(s"Pattern config not found: $path"))
    val lines = text.split("\n", -1).toSeq
    parseRaw(lines).map { r =>
      if (r.name.isEmpty) sys.error(s"Pattern entry missing name in $path")
      // empty regex compiles fine but zero-width-matches at every char
      // position, flooding every scan — a hand-edited entry missing its
      // pattern key must error, mirroring the missing-name check
      if (r.pattern.isEmpty)
        sys.error(s"Pattern entry '${r.name}' missing pattern in $path")
      make(r.name, r.pattern, r.severity, r.description, r.caseInsensitive)
    }
  }

  /** Append one validated pattern to the config file (creating it if
    * absent), preserving existing entries — the reference's read-modify-
    * write (`cli.py:5857-5878`). Written atomically via temp + move so a
    * crash can't truncate an existing registry. */
  def append(path: String, name: String, pattern: String, severity: String,
      description: String, caseInsensitive: Boolean = false): Unit = {
    make(name, pattern, severity, description, caseInsensitive) // validate
    val existing = DbFs.readString(path)
      .map(t => parseRaw(t.split("\n", -1).toSeq)).getOrElse(Nil)
    val all = existing :+
      RawPattern(name, pattern, severity, description, caseInsensitive)
    val body = all.map { r =>
      val ci = if (r.caseInsensitive) "case_insensitive = true\n" else ""
      s"""[[patterns]]
         |name = ${quote(r.name)}
         |pattern = ${quote(r.pattern)}
         |severity = ${quote(r.severity)}
         |description = ${quote(r.description)}
         |$ci""".stripMargin
    }.mkString("\n")
    DbFs.writeStringAtomic(path, body)
  }
}
