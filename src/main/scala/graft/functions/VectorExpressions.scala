package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.sql.graftbridge.ColumnBridge

/** Native Catalyst expression for the ANN hot path (SURVEY custom-operator
  * tier (b): a codegen'd `Expression` beats a UDF beats interpreted HOFs).
  *
  * `zip_with` + `aggregate` folds evaluate through the interpreted
  * higher-order-function path — fine for one-off columns, but a dot
  * product runs once per (query, candidate) pair in similarity search.
  * This expression emits a tight primitive loop via `doGenCode` (with an
  * equivalent interpreted `nullSafeEval`), supporting float and double
  * element arrays. Sum order is left-to-right, identical to the HOF fold
  * and the DuckDB oracle.
  */
case class VectorDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  private def elemIsFloat(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case _                       => false
  }

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(dt: DataType) = dt match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"vec_dot expects array<float|double>, got ${left.dataType} / ${right.dataType}")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    // length mismatch → NULL, matching the zip_with+aggregate HOF twin
    // (whose null-padding poisons the fold): a 384-dim query against a
    // 768-dim corpus must not rank neighbors on a silently truncated
    // partial dot product
    if (x.numElements() != y.numElements()) return null
    val n = x.numElements()
    val lf = elemIsFloat(left)
    val rf = elemIsFloat(right)
    var sum = 0.0
    var i = 0
    while (i < n) {
      if (!x.isNullAt(i) && !y.isNullAt(i)) {
        val xv = if (lf) x.getFloat(i).toDouble else x.getDouble(i)
        val yv = if (rf) y.getFloat(i).toDouble else y.getDouble(i)
        sum += xv * yv
      }
      i += 1
    }
    sum
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val lGet = if (elemIsFloat(left)) "getFloat" else "getDouble"
    val rGet = if (elemIsFloat(right)) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val sum = ctx.freshName("sum")
      s"""
         |if ($a.numElements() != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  int $n = $a.numElements();
         |  double $sum = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if (!$a.isNullAt($i) && !$b.isNullAt($i)) {
         |      $sum += (double) $a.$lGet($i) * (double) $b.$rGet($i);
         |    }
         |  }
         |  ${ev.value} = $sum;
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VectorDot =
    copy(left = newLeft, right = newRight)
}

/** Driver-collected coarse-quantizer centroids, embedded into the
  * [[NearestCentroid]] expression as a task-shipped reference object —
  * the IVF assignment's build side. Bounded by construction (nCentroids
  * vectors, the same driver-side budget `kmeansCentroids` already
  * spends), sorted ascending by id so the tie-break "smaller cent_id
  * wins" is the natural first-seen-kept of the scan loop.
  *
  * Arithmetic parity contract (pinned by IvfSpec's differential twin):
  * every score is computed EXACTLY as the former crossJoin+groupBy-max
  * plan computed it — dot products left-to-right in double skipping null
  * elements ([[VectorDot]] semantics, length mismatch ⇒ null score),
  * cosine as `dot / (rowNorm * centNorm)` guarded by `norm > 0` on both
  * sides, scores rounded to 5 decimals with Spark's own `Round`
  * semantics for doubles (`BigDecimal.valueOf(d).setScale(5, HALF_UP)`,
  * NaN/Inf passthrough), comparisons under Spark's double ordering (NaN
  * greatest), ties broken toward the smaller centroid id, and an
  * all-null score row (null/zero-norm/mismatched vector) assigned to
  * the smallest centroid id — the exact value `max(struct(score,
  * -cent_id))` produced.
  */
final class CentroidSet private (
    val ids: Array[Long],
    private val vecs: Array[Array[Double]],
    private val masks: Array[Array[Boolean]],
    private val norms: Array[Double]) extends Serializable {

  def minId: Long = ids(0)
  def size: Int = ids.length

  /** Per-centroid "every element valid": lets the hot dot loop skip the
    * mask check entirely for the (universal in practice) dense case. */
  private val dense: Array[Boolean] = masks.map(m => m.forall(identity))

  /** Spark's own double ordering (NaN greatest, NaN == NaN, ±0 equal). */
  private def cmp(a: Double, b: Double): Int =
    org.apache.spark.sql.catalyst.util.SQLOrderingUtil.compareDoubles(a, b)

  /** Spark's `d > 0` under SQL comparison semantics: NaN is GREATER
    * than every double (verified empirically in both the interpreted
    * and codegen paths — `NaN > 0.0` is true in each), so a NaN norm
    * PASSES the positivity guard and its NaN score then outranks every
    * finite score. Java's primitive `>` would silently skip such a
    * centroid and diverge from the plan this expression replaced. */
  private def sqlGtZero(d: Double): Boolean =
    d > 0 || java.lang.Double.isNaN(d)

  /** Argmax-cosine centroid id for one row vector (see class doc for the
    * exact parity semantics). Called once per corpus row from generated
    * code. The hot path bulk-copies the row vector ONCE into a primitive
    * array — the naive loop pays nCentroids×dim virtual ArrayData
    * accessor calls per row (4096 at 64×64), the copy pays dim — and
    * skips the element mask for dense centroids. Arithmetic is
    * IDENTICAL (same conversions, same left-to-right order); rows with
    * null elements take the accessor path with the same per-element
    * null skipping as before. */
  def assign(arr: ArrayData, elemIsFloat: Boolean): Long = {
    val n = arr.numElements()
    var hasNull = false
    var i = 0
    while (i < n && !hasNull) {
      if (arr.isNullAt(i)) hasNull = true
      i += 1
    }
    if (hasNull) return assignWithAccessors(arr, elemIsFloat)
    val row = new Array[Double](n)
    var j = 0
    if (elemIsFloat) while (j < n) { row(j) = arr.getFloat(j).toDouble; j += 1 }
    else while (j < n) { row(j) = arr.getDouble(j); j += 1 }
    var self = 0.0
    j = 0
    while (j < n) { self += row(j) * row(j); j += 1 }
    val rowNorm = math.sqrt(self)
    var bestIdx = -1
    var bestRounded = 0.0
    var c = 0
    while (c < ids.length) {
      val cv = vecs(c)
      // dim mismatch ⇒ VectorDot returns null ⇒ the centroid's score is
      // null and it is skipped, like a zero-norm side
      if (cv.length == n && sqlGtZero(rowNorm) && sqlGtZero(norms(c))) {
        var dot = 0.0
        if (dense(c)) {
          var k = 0
          while (k < n) { dot += row(k) * cv(k); k += 1 }
        } else {
          val mask = masks(c)
          var k = 0
          while (k < n) { if (mask(k)) dot += row(k) * cv(k); k += 1 }
        }
        val rawScore = dot / (rowNorm * norms(c))
        // round-before-compare parity with round(_cd, 5), paying the
        // BigDecimal only when the candidate can actually reach the
        // incumbent: |round5(x) − x| ≤ 5e-6 + ulp(x)/2, so a raw score
        // more than 6e-6 + ulp below the incumbent's ROUNDED value
        // cannot win or tie (the ulp term keeps the bound valid at any
        // magnitude, not just cosine scale). NaN compares false here
        // and falls through to the exact path (Spark's double ordering
        // ranks NaN above everything).
        if (bestIdx < 0 ||
            !(rawScore + 6e-6 + Math.ulp(rawScore) < bestRounded)) {
          val rounded = CentroidSet.round5(rawScore)
          if (bestIdx < 0 || cmp(rounded, bestRounded) > 0) {
            bestIdx = c
            bestRounded = rounded
          }
        }
      }
      c += 1
    }
    if (bestIdx < 0) ids(0) else ids(bestIdx)
  }

  /** Accessor-path twin of [[assign]] for row vectors carrying null
    * elements (null positions contribute nothing to either dot —
    * VectorDot semantics). */
  private def assignWithAccessors(arr: ArrayData, elemIsFloat: Boolean): Long = {
    val n = arr.numElements()
    var self = 0.0
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val v = if (elemIsFloat) arr.getFloat(i).toDouble else arr.getDouble(i)
        self += v * v
      }
      i += 1
    }
    val rowNorm = math.sqrt(self)
    var bestIdx = -1
    var bestRounded = 0.0
    var c = 0
    while (c < ids.length) {
      val cv = vecs(c)
      if (cv.length == n && sqlGtZero(rowNorm) && sqlGtZero(norms(c))) {
        val mask = masks(c)
        var dot = 0.0
        var j = 0
        while (j < n) {
          if (mask(j) && !arr.isNullAt(j)) {
            val v = if (elemIsFloat) arr.getFloat(j).toDouble
                    else arr.getDouble(j)
            dot += v * cv(j)
          }
          j += 1
        }
        val rawScore = dot / (rowNorm * norms(c))
        if (bestIdx < 0 ||
            !(rawScore + 6e-6 + Math.ulp(rawScore) < bestRounded)) {
          val rounded = CentroidSet.round5(rawScore)
          if (bestIdx < 0 || cmp(rounded, bestRounded) > 0) {
            bestIdx = c
            bestRounded = rounded
          }
        }
      }
      c += 1
    }
    if (bestIdx < 0) ids(0) else ids(bestIdx)
  }
}

object CentroidSet {

  /** Spark `Round(d, 5)` for doubles, replicated from the codegen
    * template (`RoundBase.doGenCode`): NaN/Inf pass through, otherwise
    * string-based BigDecimal HALF_UP — `BigDecimal.valueOf`, NOT the
    * exact-binary `new BigDecimal(double)`, which rounds differently at
    * decimal halfway points. Parity is spec-pinned against Spark's own
    * `round` over a halfway-point battery. */
  def round5(d: Double): Double =
    if (java.lang.Double.isNaN(d) || java.lang.Double.isInfinite(d)) d
    else java.math.BigDecimal.valueOf(d)
      .setScale(5, java.math.RoundingMode.HALF_UP).doubleValue()

  /** Build from collected (cent_id, vector) rows; vector elements may be
    * boxed Float/Double or null (null elements masked out of every dot,
    * [[VectorDot]] semantics); a null vector becomes a zero-norm entry
    * that can never win — exactly the null `_cent_norm` the former plan
    * gave it. Rows are sorted ascending by id here so the assign loop's
    * first-seen-kept tie-break means "smaller cent_id wins". */
  def fromRows(rows: Seq[(Long, Seq[Any])]): CentroidSet = {
    require(rows.nonEmpty, "CentroidSet: no centroids")
    val sorted = rows.sortBy(_._1)
    val ids = sorted.map(_._1).toArray
    val vecs = new Array[Array[Double]](sorted.length)
    val masks = new Array[Array[Boolean]](sorted.length)
    val norms = new Array[Double](sorted.length)
    sorted.zipWithIndex.foreach { case ((_, raw), c) =>
      val seq = if (raw == null) Seq.empty[Any] else raw
      val vec = new Array[Double](seq.length)
      val mask = new Array[Boolean](seq.length)
      var self = 0.0
      seq.zipWithIndex.foreach { case (e, j) =>
        e match {
          case null => // masked
          case f: Float => vec(j) = f.toDouble; mask(j) = true
          case d: Double => vec(j) = d; mask(j) = true
          case f: java.lang.Float => vec(j) = f.toDouble; mask(j) = true
          case d: java.lang.Double => vec(j) = d.doubleValue(); mask(j) = true
          case other => sys.error(s"CentroidSet: non-numeric element $other")
        }
        if (mask(j)) self += vec(j) * vec(j)
      }
      vecs(c) = vec
      masks(c) = mask
      norms(c) = if (raw == null) 0.0 else math.sqrt(self)
    }
    new CentroidSet(ids, vecs, masks, norms)
  }
}

/** Per-row argmax-cosine centroid assignment (the IVF inverted-list
  * build), as a codegen'd expression over a driver-collected
  * [[CentroidSet]]. Replaces the corpus×nCentroids crossJoin +
  * groupBy-max plan shape: that pipeline materialized 640M joined rows
  * at 10M docs × 64 centroids AND shuffled the whole corpus (vectors
  * included) through the per-id hash aggregate; this expression is a
  * bare map — zero shuffle, zero extra rows, the flops in one tight
  * loop. Never null: degenerate rows (null vector, zero norm, dimension
  * mismatch against every centroid) assign to the smallest centroid id,
  * exactly as `max(struct(score, -cent_id))` resolved an all-null score
  * set. */
case class NearestCentroid(child: Expression, cents: CentroidSet)
    extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = false

  private def elemIsFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _                       => false
  }

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"nearest_centroid expects array<float|double>, got $other")
    }

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) cents.minId
    else cents.assign(v.asInstanceOf[ArrayData], elemIsFloat)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    import org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral
    val ref = ctx.addReferenceObj("centroids", cents,
      classOf[CentroidSet].getName)
    val childGen = child.genCode(ctx)
    ev.copy(
      code = code"""
        ${childGen.code}
        long ${ev.value} = ${childGen.isNull}
          ? ${cents.minId}L
          : $ref.assign(${childGen.value}, $elemIsFloat);
      """,
      isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): NearestCentroid =
    copy(child = newChild)
}

object VectorExpressions {

  /** Column surface: dot product of two numeric-array columns. */
  def vecDot(a: Column, b: Column): Column =
    ColumnBridge.column(VectorDot(ColumnBridge.expression(a),
      ColumnBridge.expression(b)))

  /** Column surface: argmax-cosine centroid id for a vector column. */
  def nearestCentroid(vec: Column, cents: CentroidSet): Column =
    ColumnBridge.column(NearestCentroid(ColumnBridge.expression(vec), cents))

  /** SQL registration: `vec_dot(a, b)`. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "vec_dot", exprs => VectorDot(exprs(0), exprs(1)), "built-in")
}
