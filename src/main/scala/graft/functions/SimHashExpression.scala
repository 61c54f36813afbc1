package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.sql.graftbridge.ColumnBridge

/** Static SimHash kernel, callable from generated code (Scala objects
  * emit static forwarders). Token hash = leading 60 bits of md5 — the
  * same engine-portable primitive the rest of the dedup family uses, so
  * the DuckDB oracle reproduces signatures bit-for-bit.
  */
object SimHashUtil {

  private val md5 = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  def tokenHash60(bytes: Array[Byte]): Long = {
    val md = md5.get()
    md.reset()
    val d = md.digest(bytes)
    var h = 0L
    var j = 0
    while (j < 15) {
      h = (h << 4) | ((d(j / 2) >> (if (j % 2 == 0) 4 else 0)) & 0xf)
      j += 1
    }
    h
  }

  /** 64-bit SimHash over a NON-EMPTY ArrayData of UTF8String tokens
    * (null tokens skipped). Empty input is the caller's problem: the
    * [[SimHash64]] expression maps it to NULL — a token-less document
    * has no feature evidence, and the pre-r18 constant 0L gave every
    * empty/whitespace-only document the same signature, co-bucketing
    * them all at hamming 0 (r18 adversarial corpus find; the DuckDB
    * oracle's token CTE never emitted them). */
  def simhash64(tokens: ArrayData): Long = {
    val n = tokens.numElements()
    if (n == 0) return 0L
    val votes = new Array[Int](64)
    var t = 0
    while (t < n) {
      if (!tokens.isNullAt(t)) {
        val h = tokenHash60(tokens.getUTF8String(t).getBytes)
        var i = 0
        while (i < 64) {
          if (((h >>> i) & 1L) == 1L) votes(i) += 1 else votes(i) -= 1
          i += 1
        }
      }
      t += 1
    }
    var sig = 0L
    var i = 0
    while (i < 64) { if (votes(i) > 0) sig |= (1L << i); i += 1 }
    sig
  }
}

/** Native codegen'd SimHash expression (SURVEY custom-operator tier (b)):
  * replaces the round-1 Scala UDF — no Row↔Scala conversion, no closure
  * serialization; the generated code calls the static kernel directly on
  * the unsafe array. Semantics identical to `Dedup.simhash64`
  * (differential-tested), so the p08 oracle is unaffected.
  */
case class SimHash64(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"simhash64 expects array<string>, got $other")
    }

  // empty token array → NULL, not a signature: a token-less document
  // has no features to hash, and the old constant 0L made every
  // empty/whitespace-only document a hamming-0 "near-duplicate" of
  // every other — one quadratic bucket at corpus scale (r18
  // adversarial corpus find). simhashChunkRows' existing null drop
  // then excludes them from banding.
  override def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    if (a.numElements() == 0) null else SimHashUtil.simhash64(a)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => s"""
      if ($a.numElements() == 0) {
        ${ev.isNull} = true;
      } else {
        ${ev.value} = graft.functions.SimHashUtil.simhash64($a);
      }""")

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

object SimHashExpression {

  /** Column surface: 64-bit SimHash of a token-array column. */
  def simhash64(tokens: Column): Column =
    ColumnBridge.column(SimHash64(ColumnBridge.expression(tokens)))

  /** SQL registration: `simhash64(tokens)`. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "simhash64", exprs => SimHash64(exprs.head), "built-in")
}
