package graft.query

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** J1 — the annotate query face (`annotator.py:28-270`): variants LEFT
  * JOIN each annotation source on (chrom,pos,ref,alt), echtvar filter
  * expression compiled to a Catalyst predicate, optional limit.
  *
  * The reference synthesizes SQL with N LEFT JOINs and lets Postgres
  * plan; here the fold of DataFrame joins hands Catalyst the same shape —
  * filters on source fields push into the join. Broadcast is an OPT-IN
  * hint (`broadcastSources = true`) for verified dimension-sized
  * annotations: a gnomAD-sized source is not dimension-sized, and
  * force-broadcasting it would OOM the driver at scale, so by default
  * AQE decides from runtime sizes.
  */
object Annotator {

  /** One registered annotation source: a DataFrame keyed
    * (chrom,pos,ref,alt) whose payload columns are already aliased
    * (AnnotationLoader applies the field-config aliases at load). */
  final case class Source(name: String, df: DataFrame, fields: Seq[String])

  val JoinKey: Seq[String] = Seq("chrom", "pos", "ref", "alt")

  /** Fold LEFT JOINs over sources; `filterExpr` is an echtvar expression
    * validated against the joined column set (fields qualified by their
    * aliases, `annotator.py:249-270`). */
  def annotate(variants: DataFrame, sources: Seq[Source],
               filterExpr: Option[String] = None,
               selectFields: Option[Seq[String]] = None,
               limit: Option[Int] = None,
               broadcastSources: Boolean = false): DataFrame = {
    val joined = sources.foldLeft(variants) { (acc, src) =>
      val payload = src.df.select((JoinKey.map(col) ++ src.fields.map(col)): _*)
      val right = if (broadcastSources) broadcast(payload) else payload
      acc.join(right, JoinKey, "left")
    }
    val filtered = filterExpr match {
      case Some(e) => FilterExpression.applyFilter(joined, e)
      case None    => joined
    }
    val projected = selectFields match {
      case Some(fs) => filtered.select(fs.map(col): _*)
      case None     => filtered
    }
    limit.map(projected.limit).getOrElse(projected)
  }

  /** The raw-SQL escape hatch (`annotation-query --sql`,
    * `cli.py:1454-1501`): register tables as temp views and let the user
    * query them — Catalyst IS the planner. */
  def registerViews(variants: DataFrame, sources: Seq[Source]): Unit = {
    variants.createOrReplaceTempView("variants")
    sources.foreach(s => s.df.createOrReplaceTempView(s"anno_${s.name}"))
  }
}
