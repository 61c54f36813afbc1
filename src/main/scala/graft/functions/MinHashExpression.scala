package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
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

  /** The [null,…] signature of a document with NO hashable shingle:
    * NULL text (null token array → the [null] shingle whose md5 is
    * null in the relational form) and, since r18, the EMPTY token
    * array too — an empty document has no shingles, so "min over the
    * shingle hashes" is vacuous. Pre-r18 the empty case hashed the
    * empty string as a real shingle, giving every empty/whitespace-only
    * document the SAME signature: they all co-bucketed in every band
    * and formed one quadratic candidate bucket at corpus scale (found
    * by tools/adversarial_corpus.py; the DuckDB oracle already excluded
    * them). All-null signatures are dropped before banding in
    * Dedup.minhashCandidatePairsFromSignatures. */
  def allNullSignature(numHashes: Int): GenericArrayData =
    new GenericArrayData(new Array[Any](numHashes))

  /** `numHashes`-slot MinHash signature straight from a document's
    * TOKEN array: each word k-shingle is hashed by streaming its token
    * bytes (space-separated, null tokens skipped — `array_join`
    * semantics) into one md5, WITHOUT materializing the shingle
    * strings. The shingle set matches `TextAnalysis.wordShingles`
    * exactly: a sliding window of k tokens when the array has ≥ k
    * elements, the single all-tokens joined form for 1..k-1 elements,
    * and the all-null signature for ZERO elements (no shingles — see
    * [[allNullSignature]]; pre-r18 this hashed `""` as a real shingle,
    * co-bucketing every empty document). Motivation: the Spark-side
    * `transform(sequence…, array_join(slice…))` shingling runs through
    * INTERPRETED higher-order functions and measured 32 s of the 48 s
    * signature stage at 10M docs (`tools.SigProfile`); this streams the
    * same bytes in a tight loop. */
  def signatureFromTokens(tokens: ArrayData, shingleK: Int,
                          numHashes: Int): ArrayData = {
    val n = tokens.numElements()
    val mins = new Array[Long](numHashes)
    java.util.Arrays.fill(mins, Long.MaxValue)
    val md = md5.get()
    val space = ' '.toByte

    def hashWindow(start: Int, len: Int): Unit = {
      md.reset()
      var first = true
      var i = start
      while (i < start + len) {
        if (!tokens.isNullAt(i)) {
          if (!first) md.update(space)
          md.update(tokens.getUTF8String(i).getBytes)
          first = false
        }
        i += 1
      }
      val d = md.digest()
      val h1 = bits48(d, 0)
      val h2 = bits48(d, 6)
      var j = 0
      var v = h1 // h1 + j*h2, accumulated additively
      while (j < numHashes) {
        if (v < mins(j)) mins(j) = v
        v += h2
        j += 1
      }
    }

    if (n == 0) return allNullSignature(numHashes)
    if (n >= shingleK) {
      var i = 0
      while (i <= n - shingleK) { hashWindow(i, shingleK); i += 1 }
    } else hashWindow(0, n)
    // primitive-backed array data: the boxed form
    // (GenericArrayData over Long.valueOf) allocated numHashes boxes
    // per DOCUMENT — 640M objects at 10M docs, pure GC churn
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(mins)
  }
}

/** Native codegen'd MinHash signature expression (SURVEY custom-operator
  * tier (b)) over a document's TOKEN array. Replaces two generations of
  * plan shape: the explode → md5 per shingle → 64-way min aggregate
  * (which shuffled every per-document aggregation buffer through its
  * groupBy — multi-GB at 10M docs), and then the interpreted-HOF
  * shingling that fed it (32 of 48 s at 10M docs). This expression is a
  * bare map that streams shingle bytes straight into md5: zero explode,
  * zero shuffle, zero shingle-string materialization. A NULL token
  * array yields the all-null signature (never a null array), exactly
  * what the relational form produced for a null-text document.
  * Differential twin in DedupSpec pins bit-for-bit equality with the
  * relational form.
  */
case class MinHashSignature(child: Expression, shingleK: Int, numHashes: Int)
    extends UnaryExpression {

  require(shingleK > 0, s"minhash_signature: shingleK must be > 0")
  require(numHashes > 0, s"minhash_signature: numHashes must be > 0")

  override def dataType: DataType = ArrayType(LongType, containsNull = true)
  override def nullable: Boolean = false

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"minhash_signature expects array<string> tokens, got $other")
    }

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) MinHashUtil.allNullSignature(numHashes)
    else MinHashUtil.signatureFromTokens(
      v.asInstanceOf[ArrayData], shingleK, numHashes)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    import org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral
    val childGen = child.genCode(ctx)
    ev.copy(
      code = code"""
        ${childGen.code}
        org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} =
          ${childGen.isNull}
            ? graft.functions.MinHashUtil.allNullSignature($numHashes)
            : graft.functions.MinHashUtil.signatureFromTokens(
                ${childGen.value}, $shingleK, $numHashes);
      """,
      isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSignature =
    copy(child = newChild)
}

object MinHashExpression {

  /** Column surface: MinHash signature of a token-array column. */
  def minhashSignature(tokens: Column, shingleK: Int,
                       numHashes: Int): Column =
    ColumnBridge.column(MinHashSignature(
      ColumnBridge.expression(tokens), shingleK, numHashes))

  /** SQL registration: `minhash_signature(tokens, k, n)` (k and n must
    * be foldable integers). Arity and foldability are checked here so a
    * misuse surfaces as an analysis-time message instead of an obscure
    * IndexOutOfBounds/ClassCast from inside the builder; any integral
    * literal type (tinyint..bigint) is accepted via Number#intValue. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "minhash_signature", { exprs =>
        require(exprs.length == 3,
          s"minhash_signature expects 3 arguments (tokens, shingle_k, " +
            s"num_hashes), got ${exprs.length}")
        def intArg(i: Int, name: String): Int = {
          val e = exprs(i)
          require(e.foldable,
            s"minhash_signature: $name must be a foldable integer literal")
          e.eval() match {
            case n: java.lang.Number => n.intValue()
            case other => throw new IllegalArgumentException(
              s"minhash_signature: $name must be an integer, got $other")
          }
        }
        MinHashSignature(exprs.head, intArg(1, "shingle_k"),
          intArg(2, "num_hashes"))
      }, "built-in")
}
