package graft.transform

import scala.util.matching.Regex

/** PHI header sanitization (SURVEY §2.9 — `phi/header_sanitizer.py` +
  * `phi/patterns.py`): regex redaction of identifying strings from VCF
  * header lines. Driver-side string work (headers are small); the same
  * patterns are usable as `regexp_replace` columns if PHI could appear in
  * data rows. Pattern set mirrors the reference's built-ins: SSN, MRN,
  * patient ids, emails, phone numbers, DOB markers, date literals, card
  * numbers, IPs, home paths, accession ids.
  */
object PhiSanitizer {

  final case class Redaction(pattern: String, category: String)

  val BuiltinPatterns: Seq[(Regex, String)] = Seq(
    ("""\b\d{3}-\d{2}-\d{4}\b""".r, "ssn"),
    ("""\b(?:MRN|mrn)[:\s]?\d+\b""".r, "mrn"),
    ("""(?i)\b(?:patient|subject|case)[_-]?(?:id|num(?:ber)?)[:\s=]?\S+""".r, "patient_id"),
    ("""\b[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}\b""".r, "email"),
    ("""\b(?:\+1[-.\s]?)?\(?\d{3}\)?[-.\s]?\d{3}[-.\s]?\d{4}\b""".r, "phone"),
    ("""(?i)\b(?:dob|date[_\s]?of[_\s]?birth|birth[_\s]?date)[:\s=]?\S+""".r, "dob"),
    ("""\b(?:0?[1-9]|1[0-2])/(?:0?[1-9]|[12]\d|3[01])/(?:19|20)\d{2}\b""".r, "date_us"),
    ("""\b(?:19|20)\d{2}-(?:0[1-9]|1[0-2])-(?:0[1-9]|[12]\d|3[01])\b""".r, "date_iso"),
    ("""\b(?:(?:25[0-5]|2[0-4]\d|[01]?\d\d?)\.){3}(?:25[0-5]|2[0-4]\d|[01]?\d\d?)\b""".r, "ip"),
    ("""/(?:home|Users)/[a-zA-Z][a-zA-Z0-9._-]*/""".r, "home_path"),
    ("""(?i)\b(?:accession|acc)[:\s=]?\S+""".r, "accession"))

  /** Header keys that are never redacted (tool provenance, not PHI). */
  val PreserveLinePrefixes: Seq[String] =
    Seq("##fileformat", "##INFO", "##FORMAT", "##FILTER", "##ALT", "##contig")

  final case class SanitizedHeader(lines: Seq[String], redactions: Seq[Redaction])

  def sanitizeLine(line: String): (String, Seq[Redaction]) = {
    if (PreserveLinePrefixes.exists(line.startsWith)) (line, Nil)
    else {
      var out = line
      val hits = scala.collection.mutable.ArrayBuffer[Redaction]()
      BuiltinPatterns.foreach { case (re, cat) =>
        if (re.findFirstIn(out).isDefined) {
          re.findAllIn(out).toSeq.foreach(m => hits += Redaction(m, cat))
          out = re.replaceAllIn(out, "[REDACTED]")
        }
      }
      (out, hits.toSeq)
    }
  }

  def sanitizeHeader(lines: Seq[String]): SanitizedHeader = {
    val results = lines.map(sanitizeLine)
    SanitizedHeader(results.map(_._1), results.flatMap(_._2))
  }
}
