package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.sql.graftbridge.ColumnBridge

/** Static MinHash kernel, callable from generated code.
  *
  * Signature math is EXACTLY the relational formulation it replaces
  * (`Dedup.minhashSignatures`, which the DuckDB oracle reproduces
  * bit-for-bit): per shingle, h1/h2 are the first/second 12 hex chars
  * of its md5 parsed base-16 — i.e. big-endian bytes 0-5 and 6-11 of
  * the digest, each < 2^48 — and slot i of the signature is
  * `min(h1 + i·h2)` over the document's shingles (h1 + 63·h2 < 2^54,
  * no overflow). `min` is duplicate-insensitive, so the old plan's
  * `array_distinct` needs no counterpart here.
  */
object MinHashUtil {

  private val md5 = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** 48-bit big-endian slice of `d` starting at byte `off` — identical
    * to `conv(substring(hex, 2·off+1, 12), 16, 10)` on the md5 hex
    * string. */
  private def bits48(d: Array[Byte], off: Int): Long = {
    var v = 0L
    var i = off
    while (i < off + 6) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
    v
  }

  /** 64-slot (or `numHashes`-slot) MinHash signature over an ArrayData
    * of UTF8String shingles. Null shingles are skipped (they hashed to
    * null and fell out of every `min` in the relational form); when NO
    * valid shingle exists the signature is all-null — the same
    * [null,…] the old groupBy produced for such a document. */
  def signature(shingles: ArrayData, numHashes: Int): GenericArrayData = {
    val n = shingles.numElements()
    val mins = new Array[Long](numHashes)
    java.util.Arrays.fill(mins, Long.MaxValue)
    var any = false
    val md = md5.get()
    var s = 0
    while (s < n) {
      if (!shingles.isNullAt(s)) {
        any = true
        md.reset()
        val d = md.digest(shingles.getUTF8String(s).getBytes)
        val h1 = bits48(d, 0)
        val h2 = bits48(d, 6)
        var i = 0
        var v = h1 // h1 + i*h2, accumulated additively
        while (i < numHashes) {
          if (v < mins(i)) mins(i) = v
          v += h2
          i += 1
        }
      }
      s += 1
    }
    if (!any)
      new GenericArrayData(new Array[Any](numHashes)) // all-null slots
    else
      new GenericArrayData(mins.map(java.lang.Long.valueOf)
        .asInstanceOf[Array[Any]])
  }
}

/** Native codegen'd MinHash signature expression (SURVEY custom-operator
  * tier (b)). Replaces the explode → md5 per shingle → 64-way min
  * aggregate plan shape: that computed the same hashes but materialized
  * ~n_shingles rows per document and SHUFFLED every per-document
  * aggregation buffer (64 longs/doc — multi-GB at 10M docs) through the
  * groupBy, where a signature is a pure per-row function of the
  * document's own shingles. This expression is a bare map: zero explode,
  * zero shuffle, one md5 per shingle in a tight loop. Differential twin
  * in DedupSpec pins bit-for-bit equality with the relational form.
  */
case class MinHashSignature(child: Expression, numHashes: Int)
    extends UnaryExpression {

  require(numHashes > 0, s"minhash_signature: numHashes must be > 0")

  override def dataType: DataType = ArrayType(LongType, containsNull = true)
  override def nullable: Boolean = true

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"minhash_signature expects array<string>, got $other")
    }

  override def nullSafeEval(input: Any): Any =
    MinHashUtil.signature(input.asInstanceOf[ArrayData], numHashes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.MinHashUtil.signature($a, $numHashes);")

  override protected def withNewChildInternal(newChild: Expression): MinHashSignature =
    copy(child = newChild)
}

object MinHashExpression {

  /** Column surface: MinHash signature of a shingle-array column. */
  def minhashSignature(shingles: Column, numHashes: Int): Column =
    ColumnBridge.column(MinHashSignature(
      ColumnBridge.expression(shingles), numHashes))

  /** SQL registration: `minhash_signature(shingles, n)` (n must be a
    * foldable integer). */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "minhash_signature", exprs => MinHashSignature(exprs.head,
        exprs(1).eval().asInstanceOf[Int]), "built-in")
}
