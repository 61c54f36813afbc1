package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.sql.graftbridge.ColumnBridge

/** Static worst-consequence kernel, callable from generated code.
  *
  * One pass over the raw CSQ/ANN INFO string: entries are comma-separated,
  * fields pipe-separated (both with trailing empties kept, matching
  * Spark's `split` limit=-1); an entry qualifies by field count and
  * allele, and the first entry with a strictly lower IMPACT rank wins —
  * the reference's `rank < best_rank` loop (`vcf_parser.py:460-508`).
  * Only the winning entry is materialized into an array.
  */
object ConsequenceUtil {

  /** HIGH(0) < MODERATE(1) < LOW(2) < anything else(3). */
  private def rankOf(s: String, from: Int, until: Int): Int = {
    val n = until - from
    if (n == 4 && s.regionMatches(from, "HIGH", 0, 4)) 0
    else if (n == 8 && s.regionMatches(from, "MODERATE", 0, 8)) 1
    else if (n == 3 && s.regionMatches(from, "LOW", 0, 3)) 2
    else 3
  }

  /** Best entry of `raw` for `alt`, or null if none qualifies.
    *
    * @param minSize           required field count (exact for CSQ, lower
    *                          bound for ANN)
    * @param exactSize         CSQ: entries must have exactly minSize fields
    * @param idxAllele         0-based Allele field index, -1 = no check
    * @param idxImpact         0-based IMPACT field index, -1 = rank 3 for all
    * @param emptyAlleleMatches ANN: empty/absent Allele matches any ALT
    */
  def worstEntry(raw: UTF8String, alt: UTF8String, minSize: Int,
                 exactSize: Boolean, idxAllele: Int, idxImpact: Int,
                 emptyAlleleMatches: Boolean): ArrayData = {
    val s = raw.toString
    val altS = alt.toString
    val len = s.length
    var bestStart = -1
    var bestEnd = -1
    var bestRank = -1

    var entryStart = 0
    var i = 0
    while (i <= len) {
      if (i == len || s.charAt(i) == ',') {
        val entryEnd = i
        // field boundaries within [entryStart, entryEnd)
        var nFields = 1
        var j = entryStart
        while (j < entryEnd) { if (s.charAt(j) == '|') nFields += 1; j += 1 }
        val sizeOk = if (exactSize) nFields == minSize else nFields >= minSize
        if (sizeOk) {
          // locate a 0-based field's [from, until) within the entry
          def field(idx: Int): (Int, Int) = {
            var from = entryStart
            var seen = 0
            var k = entryStart
            while (seen < idx && k < entryEnd) {
              if (s.charAt(k) == '|') { seen += 1; from = k + 1 }
              k += 1
            }
            var until = from
            while (until < entryEnd && s.charAt(until) != '|') until += 1
            (from, until)
          }
          val alleleOk =
            if (idxAllele < 0) true
            else if (idxAllele >= nFields) emptyAlleleMatches // absent ≡ null
            else {
              val (f, u) = field(idxAllele)
              (emptyAlleleMatches && f == u) ||
                (u - f == altS.length && s.regionMatches(f, altS, 0, altS.length))
            }
          if (alleleOk) {
            val r =
              if (idxImpact < 0 || idxImpact >= nFields) 3
              else { val (f, u) = field(idxImpact); rankOf(s, f, u) }
            if (bestStart < 0 || r < bestRank) {
              bestStart = entryStart; bestEnd = entryEnd; bestRank = r
            }
          }
        }
        entryStart = i + 1
      }
      i += 1
    }

    if (bestStart < 0) null
    else {
      // split the winning entry on '|', trailing empties kept
      val out = scala.collection.mutable.ArrayBuffer[Any]()
      var from = bestStart
      var k = bestStart
      while (k <= bestEnd) {
        if (k == bestEnd || s.charAt(k) == '|') {
          out += UTF8String.fromString(s.substring(from, k))
          from = k + 1
        }
        k += 1
      }
      new GenericArrayData(out.toArray)
    }
  }
}

/** Native codegen'd worst-consequence selection (SURVEY custom-operator
  * tier (b)): replaces the split→transform→filter→aggregate HOF chain,
  * which evaluates interpreted per row outside whole-stage codegen and
  * materializes every entry's field array just to discard all but one.
  * Field indices come from the driver-parsed header (S3), so they are
  * compile-time constants in the generated code. The HOF forms remain in
  * `transform.Annotations` as differential-test twins.
  */
case class WorstEntry(left: Expression, right: Expression, minSize: Int,
                      exactSize: Boolean, idxAllele: Int, idxImpact: Int,
                      emptyAlleleMatches: Boolean) extends BinaryExpression {

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, StringType) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"worst_entry expects (string, string), got $other")
    }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "worst_entry"

  override def nullSafeEval(raw: Any, alt: Any): Any =
    ConsequenceUtil.worstEntry(raw.asInstanceOf[UTF8String],
      alt.asInstanceOf[UTF8String], minSize, exactSize, idxAllele, idxImpact,
      emptyAlleleMatches)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (c, a) => s"""
      ${ev.value} = graft.functions.ConsequenceUtil.worstEntry(
        $c, $a, $minSize, $exactSize, $idxAllele, $idxImpact, $emptyAlleleMatches);
      ${ev.isNull} = ${ev.value} == null;
    """)

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): WorstEntry =
    copy(left = newLeft, right = newRight)
}

object ConsequenceExpression {

  /** VEP CSQ worst entry: exact field count, strict allele equality. */
  def csqWorst(csq: Column, alt: Column, fields: Seq[String]): Column =
    ColumnBridge.column(WorstEntry(
      ColumnBridge.expression(csq), ColumnBridge.expression(alt),
      minSize = fields.length, exactSize = true,
      idxAllele = fields.indexOf("Allele"),
      idxImpact = fields.indexOf("IMPACT"),
      emptyAlleleMatches = false))

  /** SnpEff ANN worst entry: ≥4 fields, empty/absent allele matches any. */
  def annWorst(ann: Column, alt: Column, fields: Seq[String]): Column =
    ColumnBridge.column(WorstEntry(
      ColumnBridge.expression(ann), ColumnBridge.expression(alt),
      minSize = 4, exactSize = false,
      idxAllele = fields.indexOf("Allele"),
      idxImpact = fields.indexOf("Annotation_Impact"),
      emptyAlleleMatches = true))
}
