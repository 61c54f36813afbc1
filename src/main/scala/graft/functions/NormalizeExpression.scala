package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.sql.graftbridge.ColumnBridge

/** Static single-ALT normalization kernel, callable from generated code.
  *
  * Same semantics as `graft.transform.Normalizer.normalize` specialized to
  * one ALT and no reference genome (the shape the parse path uses —
  * `vcf_parser.py:311-325` normalizes post-decomposition, one ALT at a
  * time; left-extension needs a genome, which the reference also only
  * applies when one is configured). Differentially tested against the
  * general implementation in NormalizeExpressionSpec.
  */
object NormalizeUtil {

  /** Matches the field surface of `Normalizer.Result` so
    * `_norm.pos/ref/alt/wasNormalized` consumers are unchanged. */
  val schema: StructType = StructType(Seq(
    StructField("pos", LongType, nullable = false),
    StructField("ref", StringType, nullable = true),
    StructField("alt", StringType, nullable = true),
    StructField("wasNormalized", BooleanType, nullable = false)))

  private def allUpper(u: UTF8String): Boolean = {
    val n = u.numBytes
    var i = 0
    while (i < n) {
      val b = u.getByte(i)
      // non-ASCII bytes (negative as signed) also disqualify: a
      // non-ASCII lowercase letter must take the slow path so the
      // uppercasing matches the UDF twin byte-for-byte
      if (b < 0 || (b >= 'a' && b <= 'z')) return false
      i += 1
    }
    true
  }

  /** Zero-allocation fast path: both alleles non-empty, already
    * upper-case, and provably parsimonious+left-aligned (trailing bases
    * differ, and either some allele is length 1 or the leading bases
    * differ) — the vast majority of real rows (SNPs and clean indels).
    * When it returns true the slow path would be an identity mapping. */
  private def provablyNormalized(ref: UTF8String, alt: UTF8String): Boolean = {
    val rn = ref.numBytes
    val an = alt.numBytes
    if (rn == 0 || an == 0) return false
    if (!allUpper(ref) || !allUpper(alt)) return false
    if (ref.getByte(rn - 1) == alt.getByte(an - 1)) return false
    rn == 1 || an == 1 || ref.getByte(0) != alt.getByte(0)
  }

  /** (pos, ref, alt) → InternalRow(pos', ref', alt', wasNormalized).
    * Mirrors `Normalizer.normalize("", pos, ref, Seq(alt), None)` +
    * the `Result` construction of the old UDF. */
  def normalizeStruct(pos: Long, ref: UTF8String, alt: UTF8String): InternalRow = {
    if (provablyNormalized(ref, alt))
      return new GenericInternalRow(Array[Any](pos, ref, alt, false))

    val ref0 = ref.toString
    val alt0 = alt.toString
    // empty-REF guard (`normalizer.py:88-91`): originals pass through
    if (ref0.isEmpty)
      return new GenericInternalRow(Array[Any](pos, ref, alt, false))

    var r = ref0.toUpperCase
    var a = alt0.toUpperCase
    var p = pos

    // Phase 1: right-trim (`normalizer.py:13-63`). Left-extension would
    // need a genome; without one an emptied allele stops the loop, as in
    // the general implementation.
    var done = false
    while (!done) {
      if (r.isEmpty || a.isEmpty) done = true
      else if (r.charAt(r.length - 1) != a.charAt(a.length - 1)) done = true
      else if (p == 1 && (r.length == 1 || a.length == 1)) done = true
      else {
        r = r.substring(0, r.length - 1)
        a = a.substring(0, a.length - 1)
      }
    }

    // Phase 2: left-trim for parsimony (`normalizer.py:66-85`).
    var trimming = true
    while (trimming) {
      if (r.length <= 1 || a.length <= 1) trimming = false
      else if (r.charAt(0) == a.charAt(0)) {
        r = r.substring(1); a = a.substring(1); p += 1
      } else trimming = false
    }

    val was = p != pos || r != ref0 || a != alt0
    if (!was) new GenericInternalRow(Array[Any](pos, ref, alt, false))
    else new GenericInternalRow(Array[Any](
      p, UTF8String.fromString(r), UTF8String.fromString(a), true))
  }
}

/** Native codegen'd normalization (SURVEY custom-operator tier (b)):
  * replaces the Scala UDF in the parse hot path. The UDF was the one
  * whole-stage-codegen barrier left in `VcfReader.variants(normalize=true)`
  * — `vcf_parse_1m_norm`'s measured plan — paying a catalyst↔Scala
  * conversion plus a `Result` encoder per row. The generated code calls
  * the static kernel directly on unsafe UTF8Strings; the common
  * already-normalized row allocates nothing but the 4-slot row.
  */
case class NormalizeVariant(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (LongType, StringType, StringType) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"normalize_variant expects (bigint, string, string), got $other")
    }

  override def dataType: DataType = NormalizeUtil.schema
  override def nullable: Boolean = true
  override def prettyName: String = "normalize_variant"

  override def nullSafeEval(pos: Any, ref: Any, alt: Any): Any =
    NormalizeUtil.normalizeStruct(pos.asInstanceOf[Long],
      ref.asInstanceOf[UTF8String], alt.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (p, r, a) =>
      s"${ev.value} = graft.functions.NormalizeUtil.normalizeStruct($p, $r, $a);")

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): NormalizeVariant =
    copy(first = newFirst, second = newSecond, third = newThird)
}

object NormalizeExpression {

  /** Column surface: struct(pos, ref, alt, wasNormalized). */
  def normalizeVariant(pos: Column, ref: Column, alt: Column): Column =
    ColumnBridge.column(NormalizeVariant(
      ColumnBridge.expression(pos),
      ColumnBridge.expression(ref),
      ColumnBridge.expression(alt)))

  /** SQL registration: `normalize_variant(pos, ref, alt)`; integral pos
    * is widened to bigint (ImplicitCastInputTypes is private[sql]). */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "normalize_variant",
      exprs => NormalizeVariant(
        if (exprs(0).dataType == LongType) exprs(0) else Cast(exprs(0), LongType),
        exprs(1), exprs(2)), "built-in")
}
