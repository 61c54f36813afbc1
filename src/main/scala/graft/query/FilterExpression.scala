package graft.query

import scala.collection.mutable
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.expr

/** echtvar-style filter expression compiler (SURVEY F2 —
  * `expression.py:20-235`): `&&`→AND, `||`→OR, `==`→=, `!=`→<>, IS
  * [NOT] NULL, quoted string + numeric literals, paren/quote validation,
  * field-existence check against the target DataFrame's columns. The
  * compiled string goes through `expr(...)` so Catalyst plans (and pushes
  * down) the predicate like any native filter.
  */
object FilterExpression {

  private val OperatorMap: Seq[(String, String)] =
    Seq("&&" -> "AND", "||" -> "OR", "==" -> "=", "!=" -> "<>")

  private val ComparisonOps: Set[String] =
    Set("<", "<=", ">", ">=", "==", "!=", "=", "<>")

  /** Compile to a Spark-SQL boolean expression string; throws
    * IllegalArgumentException with all validation errors otherwise.
    *
    * The SQL is rebuilt from the token stream, applying the operator map
    * only to non-string tokens — the reference's whole-string
    * `str.replace` (`expression.py:60-66`) corrupts operators inside
    * quoted literals (`gene == 'A==B'` → `'A = B'`), which is a bug, not
    * behavior worth preserving. */
  def parse(expression: String, availableFields: Set[String]): String = {
    if (expression == null || expression.trim.isEmpty) return "TRUE"
    val errors = validate(expression, availableFields)
    if (errors.nonEmpty)
      throw new IllegalArgumentException(s"Invalid expression: ${errors.mkString("; ")}")
    val opMap = OperatorMap.toMap
    tokenize(expression)
      .map { t =>
        if (t.nonEmpty && (t.head == '"' || t.head == '\'')) t
        else opMap.getOrElse(t, t)
      }
      // mkString(" ") already single-spaces the token stream; a trailing
      // replaceAll("\\s+") could only ever touch whitespace INSIDE quoted
      // string literals — corrupting the literal ('A  B' → 'A B'), the
      // exact bug class the token-map rebuild exists to avoid
      .mkString(" ").trim
  }

  /** Validation errors: unknown fields, unbalanced parens, unclosed
    * strings (`expression.py:79-128`). */
  def validate(expression: String, availableFields: Set[String]): Seq[String] = {
    if (expression == null || expression.trim.isEmpty) return Nil
    val errors = mutable.ArrayBuffer[String]()

    tokenize(expression).foreach { token =>
      if (isIdentifier(token) &&
        !Set("IS", "NULL", "NOT", "AND", "OR", "TRUE", "FALSE").contains(token.toUpperCase) &&
        !availableFields.contains(token))
        errors += s"Unknown field: '$token'"
    }

    // parens inside quoted literals are data, not grammar — track string
    // state so note == '(intronic' doesn't read as unbalanced
    var depth = 0
    var reported = false
    var inStr = false
    var strCh: Char = 0
    expression.foreach { c =>
      if (inStr) { if (c == strCh) inStr = false }
      else if (c == '"' || c == '\'') { inStr = true; strCh = c }
      else if (c == '(') depth += 1
      else if (c == ')') depth -= 1
      if (depth < 0 && !reported) { errors += "Unbalanced parentheses"; reported = true }
    }
    if (depth != 0 && !reported) errors += "Unbalanced parentheses"

    var inString = false
    var stringChar: Char = 0
    expression.foreach { c =>
      if ((c == '"' || c == '\'') && !inString) { inString = true; stringChar = c }
      else if (c == stringChar && inString) { inString = false; stringChar = 0 }
    }
    if (inString) errors += "Unclosed string literal"

    errors.toSeq
  }

  /** Tokenizer mirroring `expression.py:130-194`. */
  private[query] def tokenize(expression: String): Seq[String] = {
    val tokens = mutable.ArrayBuffer[String]()
    val cur = new StringBuilder
    var inString = false
    var stringChar: Char = 0
    def flush(): Unit = if (cur.nonEmpty) { tokens += cur.result(); cur.clear() }

    var i = 0
    while (i < expression.length) {
      val c = expression.charAt(i)
      if ((c == '"' || c == '\'') && !inString) {
        flush(); inString = true; stringChar = c; cur += c
      } else if (inString && c == stringChar) {
        cur += c; tokens += cur.result(); cur.clear(); inString = false; stringChar = 0
      } else if (inString) {
        cur += c
      } else if (c == ' ' || c == '\t' || c == '\n') {
        flush()
      } else if (c == '(' || c == ')') {
        flush(); tokens += c.toString
      } else if ("<>=!".contains(c)) {
        flush()
        if (i + 1 < expression.length && expression.charAt(i + 1) == '=') {
          tokens += s"$c="; i += 1
        } else tokens += c.toString
      } else if (c == '&' && i + 1 < expression.length && expression.charAt(i + 1) == '&') {
        flush(); tokens += "&&"; i += 1
      } else if (c == '|' && i + 1 < expression.length && expression.charAt(i + 1) == '|') {
        flush(); tokens += "||"; i += 1
      } else {
        cur += c
      }
      i += 1
    }
    flush()
    tokens.toSeq
  }

  private[query] def isIdentifier(token: String): Boolean = {
    if (token.isEmpty) return false
    if (token.head == '"' || token.head == '\'') return false
    if (scala.util.Try(token.toDouble).isSuccess) return false
    if (ComparisonOps.contains(token) || Set("&&", "||", "(", ")").contains(token)) return false
    token.replace("_", "").forall(_.isLetterOrDigit) && token.replace("_", "").nonEmpty
  }

  /** Field names referenced by an expression (`expression.py:214-235`). */
  def extractFields(expression: String): Set[String] = {
    if (expression == null || expression.isEmpty) return Set.empty
    tokenize(expression).filter(isIdentifier)
      .filterNot(t => Set("IS", "NULL", "NOT", "AND", "OR", "TRUE", "FALSE")
        .contains(t.toUpperCase))
      .toSet
  }

  /** Apply a compiled expression as a DataFrame filter. */
  def applyFilter(df: DataFrame, expression: String): DataFrame =
    df.filter(expr(parse(expression, df.columns.toSet)))
}
