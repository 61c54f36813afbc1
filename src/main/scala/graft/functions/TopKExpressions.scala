package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.sql.graftbridge.ColumnBridge

/** Map-side partial top-k for the ANN ranking tails (SURVEY custom-
  * operator tier (b)).
  *
  * The window form — `row_number() over (partition by query_id order by
  * round(cosine, 5) desc, neighbor_id)` — shuffles EVERY scored
  * candidate to |queries| reducers: at 10M docs × 100 queries × nProbe/
  * nCentroids that is ~60M rows crammed into 100 sort partitions, a
  * parallelism cap and a skew point that only worsens at cluster scale.
  * This aggregate keeps a bounded k-heap per (partition, query) and
  * shuffles only the per-partition survivors (≤ k × maps × queries
  * rows) through the standard partial/final ObjectHashAggregate pair —
  * the scale-correct distributed-top-k shape.
  *
  * Ordering parity with the window it replaces, bit-for-bit
  * (spec-pinned by a differential twin in PipelineSpec):
  *   - sort key is `round(score, 5)` DESC — rounded through
  *     [[CentroidSet.round5]], the same string-based BigDecimal HALF_UP
  *     Spark's `Round` applies, NaN/Inf passthrough;
  *   - double comparison is Spark's SQL ordering (NaN greatest);
  *   - DESC null ordering is NullsLast: a null score loses to every
  *     non-null score;
  *   - ties (equal rounded score, or both null) break toward the
  *     smaller neighbor_id, null ids first (ASC NullsFirst);
  *   - ranks are 1-based positions in that total order.
  * The raw score is carried through unrounded, so output values are
  * bit-identical to the window's.
  */
object TopKByScore {

  /** One buffered candidate. `rounded` caches round5(score) — computed
    * at most once per SURVIVING candidate (see the admission guard). */
  final class Entry(val idNull: Boolean, val id: Long,
                    val scoreNull: Boolean, val score: Double,
                    val rounded: Double) extends Serializable

  /** Spark's own double ordering (NaN greatest, NaN == NaN, ±0 equal). */
  private[functions] def cmpDouble(a: Double, b: Double): Int =
    org.apache.spark.sql.catalyst.util.SQLOrderingUtil.compareDoubles(a, b)

  /** Total order of the window's ORDER BY: negative when `a` ranks
    * before (better than) `b`. */
  private[functions] def rankCompare(a: Entry, b: Entry): Int = {
    // round(score,5) DESC NULLS LAST
    if (a.scoreNull != b.scoreNull) return if (a.scoreNull) 1 else -1
    if (!a.scoreNull) {
      val c = cmpDouble(a.rounded, b.rounded)
      if (c != 0) return -c // larger rounded score first
    }
    // neighbor_id ASC NULLS FIRST
    if (a.idNull != b.idNull) return if (a.idNull) -1 else 1
    if (a.idNull) 0 else java.lang.Long.compare(a.id, b.id)
  }

  /** Bounded worst-at-head heap of the k best entries. */
  final class TopKBuffer(val k: Int) extends Serializable {
    val heap = new java.util.PriorityQueue[Entry](
      math.max(1, math.min(k, 1024)),
      // reversed rank order: the WORST surviving entry at the head
      (x: Entry, y: Entry) => -rankCompare(x, y))

    def offer(idNull: Boolean, id: Long, scoreNull: Boolean,
              score: Double): Unit = {
      if (heap.size() < k) {
        val rounded = if (scoreNull) 0.0 else CentroidSet.round5(score)
        heap.add(new Entry(idNull, id, scoreNull, score, rounded))
      } else {
        val worst = heap.peek()
        // admission guard, same bound as CentroidSet.assign: round5
        // moves a value by at most 5e-6 + ulp(score)/2, so a non-null
        // score more than 6e-6 + ulp below the worst survivor's ROUNDED
        // key can never displace it — the BigDecimal runs only for
        // genuine contenders. The ulp term keeps the bound valid at ANY
        // magnitude (above ~1e10 the double ulp alone exceeds 6e-6 and
        // a fixed margin could skip a candidate whose rounded key ties
        // the worst survivor and wins the id tie-break). NaN/±Inf
        // arithmetic compares false and falls through to the exact path
        // (NaN ranks above everything). A null score can only displace
        // a null worst (by smaller id); no rounding involved.
        if (!scoreNull && !worst.scoreNull &&
            score + 6e-6 + Math.ulp(score) < worst.rounded) return
        val rounded = if (scoreNull) 0.0 else CentroidSet.round5(score)
        val cand = new Entry(idNull, id, scoreNull, score, rounded)
        if (rankCompare(cand, worst) < 0) {
          heap.poll()
          heap.add(cand)
        }
      }
    }

    def mergeIn(other: TopKBuffer): TopKBuffer = {
      val it = other.heap.iterator()
      while (it.hasNext) {
        val e = it.next()
        if (heap.size() < k) heap.add(e)
        else if (rankCompare(e, heap.peek()) < 0) { heap.poll(); heap.add(e) }
      }
      this
    }

    /** Entries in rank order (best first). */
    def sortedEntries(): Array[Entry] = {
      val arr = heap.toArray(new Array[Entry](heap.size()))
      java.util.Arrays.sort(arr, (x: Entry, y: Entry) => rankCompare(x, y))
      arr
    }
  }

  val elementType: StructType = StructType(Seq(
    StructField("neighbor_id", LongType, nullable = true),
    StructField("cosine", DoubleType, nullable = true)))
}

/** `top_k_by_score(score, id, k)` — the k best (id, score) pairs of the
  * group as an array of structs in rank order; see [[TopKByScore]] for
  * the exact ordering contract. Surfaced through `Similarity.rankTopK`,
  * which posexplodes the array back into the window-shaped
  * (neighbor_id, cosine, rank) rows. */
case class TopKByScoreAgg(
    scoreExpr: Expression, idExpr: Expression, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKByScore.TopKBuffer] {

  require(k > 0, s"top_k_by_score: k must be positive, got $k")

  override def children: Seq[Expression] = Seq(scoreExpr, idExpr)
  override def nullable: Boolean = false
  override def dataType: DataType =
    ArrayType(TopKByScore.elementType, containsNull = false)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (scoreExpr.dataType, idExpr.dataType) match {
      case (DoubleType, LongType) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (s, i) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"top_k_by_score expects (double, bigint), got ($s, $i)")
    }

  override def createAggregationBuffer(): TopKByScore.TopKBuffer =
    new TopKByScore.TopKBuffer(k)

  override def update(buf: TopKByScore.TopKBuffer,
                      input: InternalRow): TopKByScore.TopKBuffer = {
    val s = scoreExpr.eval(input)
    val i = idExpr.eval(input)
    buf.offer(
      idNull = i == null,
      id = if (i == null) 0L else i.asInstanceOf[Long],
      scoreNull = s == null,
      score = if (s == null) 0.0 else s.asInstanceOf[Double])
    buf
  }

  override def merge(a: TopKByScore.TopKBuffer,
                     b: TopKByScore.TopKBuffer): TopKByScore.TopKBuffer =
    a.mergeIn(b)

  override def eval(buf: TopKByScore.TopKBuffer): Any = {
    val entries = buf.sortedEntries()
    new GenericArrayData(entries.map { e =>
      InternalRow(
        if (e.idNull) null else java.lang.Long.valueOf(e.id),
        if (e.scoreNull) null else java.lang.Double.valueOf(e.score))
    }.asInstanceOf[Array[Any]])
  }

  override def serialize(buf: TopKByScore.TopKBuffer): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    val entries = buf.sortedEntries()
    out.writeInt(buf.k)
    out.writeInt(entries.length)
    entries.foreach { e =>
      out.writeBoolean(e.idNull); out.writeLong(e.id)
      out.writeBoolean(e.scoreNull); out.writeDouble(e.score)
      out.writeDouble(e.rounded)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): TopKByScore.TopKBuffer = {
    val in = new java.io.DataInputStream(
      new java.io.ByteArrayInputStream(bytes))
    val kk = in.readInt()
    val n = in.readInt()
    val buf = new TopKByScore.TopKBuffer(kk)
    var i = 0
    while (i < n) {
      val idNull = in.readBoolean(); val id = in.readLong()
      val scoreNull = in.readBoolean(); val score = in.readDouble()
      val rounded = in.readDouble()
      buf.heap.add(new TopKByScore.Entry(idNull, id, scoreNull, score, rounded))
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(offset: Int): TopKByScoreAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): TopKByScoreAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKByScoreAgg =
    copy(scoreExpr = newChildren(0), idExpr = newChildren(1))

  override def prettyName: String = "top_k_by_score"
}

object TopKExpressions {

  /** Column surface: array of the group's k best (neighbor_id, cosine)
    * structs in rank order. `id` must be bigint, `score` double. */
  def topKByScore(score: Column, id: Column, k: Int): Column =
    ColumnBridge.column(TopKByScoreAgg(ColumnBridge.expression(score),
      ColumnBridge.expression(id), k).toAggregateExpression())
}
