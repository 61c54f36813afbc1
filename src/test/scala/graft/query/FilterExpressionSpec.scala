package graft.query

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import graft.SparkSpec

/** Property round-trip for the echtvar filter compiler (F2, reference
  * grammar `expression.py:20-235`): generate random expression ASTs,
  * render them to echtvar syntax — including string literals containing
  * `(`, `&&`, `==`, the other quote character, and doubled spaces, the
  * corruption classes the token-map rebuild exists to prevent — compile
  * with `FilterExpression.parse`, run through Spark, and compare
  * against a direct three-valued-logic evaluation of the same AST over
  * the same rows. A whole-string replace (the reference's
  * `expression.py:60-66` approach) fails this property immediately. */
class FilterExpressionSpec extends SparkSpec {

  // ---- tiny AST ----
  private sealed trait Exp
  private case class Cmp(field: String, op: String, lit: Any) extends Exp
  private case class IsNull(field: String, not: Boolean) extends Exp
  private case class Bin(op: String, l: Exp, r: Exp) extends Exp // && / ||

  private val numFields = Seq("af", "dp")
  private val strFields = Seq("gene", "note")

  /** String literal contents exercising every corruption class the
    * compiler must not touch inside quotes. */
  private val nastyStrings = Seq(
    "BRCA2", "A==B", "x && y", "a || b", "(intronic", "close)", "A  B",
    "it's", "say \"hi\"", "a != b", "<= weird", "", "AND", "null")

  private val numLits = Seq(0.0, 0.25, 0.5, 1.0, 12, 30, 100)

  private def genExp(rng: scala.util.Random, depth: Int): Exp =
    if (depth <= 0 || rng.nextDouble() < 0.4) {
      rng.nextInt(3) match {
        case 0 =>
          val f = numFields(rng.nextInt(numFields.length))
          val op = Seq("<", "<=", ">", ">=", "==", "!=")(rng.nextInt(6))
          Cmp(f, op, numLits(rng.nextInt(numLits.length)))
        case 1 =>
          val f = strFields(rng.nextInt(strFields.length))
          val op = Seq("==", "!=", "<", ">")(rng.nextInt(4))
          Cmp(f, op, nastyStrings(rng.nextInt(nastyStrings.length)))
        case _ =>
          IsNull((numFields ++ strFields)(rng.nextInt(4)), rng.nextBoolean())
      }
    } else {
      val op = if (rng.nextBoolean()) "&&" else "||"
      Bin(op, genExp(rng, depth - 1), genExp(rng, depth - 1))
    }

  /** Render to echtvar syntax with random parenthesization/spacing. */
  private def render(e: Exp, rng: scala.util.Random): String = {
    val s = e match {
      case Cmp(f, op, lit: String) =>
        // pick a quote char the content doesn't contain (the grammar has
        // no escape sequences — neither does the reference's)
        val q = if (!lit.contains('\'')) "'"
                else if (!lit.contains('"')) "\""
                else return render(Cmp(f, op, "fallback"), rng)
        s"$f $op $q$lit$q"
      case Cmp(f, op, lit) => s"$f $op $lit"
      case IsNull(f, true)  => s"$f IS NOT NULL"
      case IsNull(f, false) => s"$f IS NULL"
      case Bin(op, l, r) =>
        // children are ALWAYS parenthesized: the AST's grouping is the
        // ground truth, so the rendering must not let SQL's AND-binds-
        // tighter precedence regroup an unparenthesized mix
        s"( ${render(l, rng)} ) $op ( ${render(r, rng)} )"
    }
    if (rng.nextDouble() < 0.5) s"( $s )" else s
  }

  /** Direct SQL three-valued-logic evaluation: None = NULL. */
  private def eval(e: Exp, row: Map[String, Any]): Option[Boolean] = e match {
    case IsNull(f, not) =>
      val isNull = row(f) == null
      Some(if (not) !isNull else isNull)
    case Cmp(f, op, lit) =>
      Option(row(f)).map { v =>
        val c: Int = (v, lit) match {
          case (s: String, l: String) => s.compareTo(l)
          case (n, l) =>
            val d = n match { case i: Int => i.toDouble; case d: Double => d }
            val ld = l match { case i: Int => i.toDouble; case d: Double => d }
            java.lang.Double.compare(d, ld)
        }
        op match {
          case "<" => c < 0; case "<=" => c <= 0
          case ">" => c > 0; case ">=" => c >= 0
          case "==" => c == 0; case "!=" => c != 0
        }
      }
    case Bin("&&", l, r) =>
      (eval(l, row), eval(r, row)) match {
        case (Some(false), _) | (_, Some(false)) => Some(false)
        case (Some(true), Some(true))            => Some(true)
        case _                                   => None
      }
    case Bin(_, l, r) =>
      (eval(l, row), eval(r, row)) match {
        case (Some(true), _) | (_, Some(true)) => Some(true)
        case (Some(false), Some(false))        => Some(false)
        case _                                 => None
      }
  }

  test("random ASTs round-trip: compiled filter matches direct 3VL evaluation") {
    val rng = new scala.util.Random(20260814L)
    // rows covering nulls and every nasty string as DATA too
    val rows = (nastyStrings.zipWithIndex.map { case (s, i) =>
      Row(i.toLong, 0.05 * i, if (i % 4 == 0) null else Integer.valueOf(10 * i),
        s, if (i % 3 == 0) null else s.reverse)
    } ++ Seq(
      Row(100L, null, Integer.valueOf(30), null, "x"),
      Row(101L, 0.25, null, "BRCA2", null),
      Row(102L, 1.0, Integer.valueOf(100), "A==B", "(intronic")))
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("af", DoubleType),
      StructField("dp", IntegerType), StructField("gene", StringType),
      StructField("note", StringType)))
    val df = spark.createDataFrame(
      new java.util.ArrayList[Row](scala.jdk.CollectionConverters
        .SeqHasAsJava(rows).asJava), schema).cache()
    df.count()
    val rowMaps = rows.map(r => Map[String, Any](
      "id" -> r.get(0), "af" -> r.get(1), "dp" -> r.get(2),
      "gene" -> r.get(3), "note" -> r.get(4)))

    (1 to 300).foreach { i =>
      val ast = genExp(rng, 3)
      val rendered = render(ast, rng)
      val compiled = FilterExpression.parse(rendered, df.columns.toSet)
      val got = FilterExpression.applyFilter(df, rendered)
        .select("id").collect().map(_.getLong(0)).toSet
      val want = rowMaps.filter(m => eval(ast, m).contains(true))
        .map(_("id").asInstanceOf[Long]).toSet
      assert(got == want,
        s"iteration $i: AST $ast\nrendered: $rendered\ncompiled: $compiled\n" +
          s"spark=$got direct=$want")
    }
  }

  test("validation still rejects what the grammar rejects") {
    val fields = Set("af", "gene")
    assert(FilterExpression.validate("af > 0.5 (", fields).nonEmpty)
    assert(FilterExpression.validate("gene == 'open", fields).nonEmpty)
    assert(FilterExpression.validate("nope == 1", fields)
      .exists(_.contains("Unknown field")))
    // parens/operators INSIDE quotes are data, not grammar
    assert(FilterExpression.validate("gene == '(a && b'", fields).isEmpty)
  }
}
