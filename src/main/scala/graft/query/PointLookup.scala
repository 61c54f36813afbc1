package graft.query

import scala.collection.mutable.ArrayBuffer

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileStatus, Path}
import org.apache.parquet.HadoopReadOptions
import org.apache.parquet.example.data.Group
import org.apache.parquet.example.data.simple.convert.GroupRecordConverter
import org.apache.parquet.filter2.compat.FilterCompat
import org.apache.parquet.filter2.predicate.{FilterApi, FilterPredicate}
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.metadata.ParquetMetadata
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.parquet.io.ColumnIOFactory
import org.apache.parquet.io.api.Binary
import org.apache.spark.sql.SparkSession

/** Driver-side point lookups on the parquet store — the serving-layer
  * analogue of the reference's indexed point SELECTs
  * (`tests/performance/test_query_latency.py:50-83`, B-tree/HASH probes).
  *
  * A Spark job pays scheduler+task+collect latency (~50-100 ms on a warm
  * local session) regardless of how little data it touches; a Postgres
  * index probe is <5 ms. This path closes that gap without a database:
  * the store layout already IS the index — chrom partition directories
  * (K1) bound the files to open, pos-sorted row groups mean row-group
  * statistics prune to the group containing the probed key, and column
  * indexes narrow the read to the pages overlapping it (pages are kept
  * small at write time — `Writers.writeVariants`). File footers are
  * cached across probes keyed by (path, mtime, length), the same role
  * Postgres's shared buffers play for index pages, so a warm probe reads
  * only the matching pages. No Spark job is launched. The rsID face
  * probes the slim rs_id-sorted secondary projection (K1b) first, then
  * the main store by (chrom,pos).
  *
  * Scale note: latency is O(files-in-one-partition-directory), flat in
  * total store size as long as per-chrom file counts are kept sane by
  * compaction — the discipline any parquet serving layer requires. This
  * is a point-serving face; analytical scans still go through Spark.
  */
object PointLookup {

  /** All rows with the given (chrom, pos); values rendered as strings
    * (nested map/list columns in a compact k=v / comma form). */
  def byPosition(spark: SparkSession, store: String, chrom: String,
                 pos: Long): Seq[Map[String, String]] =
    read(spark, new Path(s"$store/chrom=$chrom"),
      FilterApi.eq(FilterApi.longColumn("pos"), java.lang.Long.valueOf(pos)))
      .map(_ + ("chrom" -> chrom)) // the partition column isn't in the files

  /** rsID probe via the secondary projection, then the main store. */
  def byRsid(spark: SparkSession, rsidIndex: String, store: String,
             rsId: String): Seq[Map[String, String]] = {
    val hits = read(spark, new Path(rsidIndex),
      FilterApi.eq(FilterApi.binaryColumn("rs_id"), Binary.fromString(rsId)))
    // the index has one row per decomposed (site, ALT); probe each SITE once
    hits.map(h => (h("chrom"), h("pos").toLong)).distinct.flatMap {
      case (chrom, pos) =>
        byPosition(spark, store, chrom, pos)
          .filter(_.get("rs_id").contains(rsId))
    }
  }

  /** Footer cache: (mtime, length, parsed footer) by path. Immutable
    * store files (parquet is write-once) make staleness checkable from
    * FileStatus alone; a rewritten file gets a new mtime/length. */
  private val footerCache =
    new java.util.concurrent.ConcurrentHashMap[String, (Long, Long, ParquetMetadata)]()

  private def footerFor(conf: Configuration, status: FileStatus): ParquetMetadata = {
    val key = status.getPath.toString
    val cached = footerCache.get(key)
    if (cached != null && cached._1 == status.getModificationTime &&
        cached._2 == status.getLen) cached._3
    else {
      val r = ParquetFileReader.open(HadoopInputFile.fromStatus(status, conf))
      val f = try r.getFooter finally r.close()
      footerCache.put(key, (status.getModificationTime, status.getLen, f))
      f
    }
  }

  private def read(spark: SparkSession, dir: Path,
                   pred: FilterPredicate): Seq[Map[String, String]] = {
    val conf = spark.sessionState.newHadoopConf()
    val fs = dir.getFileSystem(conf)
    if (!fs.exists(dir)) return Nil
    val files = fs.listStatus(dir).toSeq
      .filter(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
    val filter = FilterCompat.get(pred)
    files.flatMap { status =>
      val footer = footerFor(conf, status)
      val inputFile = HadoopInputFile.fromStatus(status, conf)
      val options = HadoopReadOptions.builder(conf, status.getPath)
        .withRecordFilter(filter).build()
      // footer injected: the constructor prunes row groups against the
      // predicate (stats/dictionary), readNextFilteredRowGroup applies
      // column-index page pruning — only overlapping pages are decoded
      val reader = new ParquetFileReader(
        inputFile, footer, options, inputFile.newStream())
      try {
        val schema = footer.getFileMetaData.getSchema
        val columnIO = new ColumnIOFactory(footer.getFileMetaData.getCreatedBy)
          .getColumnIO(schema)
        val out = ArrayBuffer[Map[String, String]]()
        var pages = reader.readNextFilteredRowGroup()
        while (pages != null) {
          val rr = columnIO.getRecordReader(
            pages, new GroupRecordConverter(schema), filter)
          var i = 0L
          val n = pages.getRowCount
          while (i < n) {
            val g = rr.read()
            if (g != null && !rr.shouldSkipCurrentRecord) out += groupToMap(g)
            i += 1
          }
          pages = reader.readNextFilteredRowGroup()
        }
        out.toSeq
      } finally reader.close()
    }
  }

  /** Render one parquet Group generically: primitives via their string
    * form, nested groups (Spark's map key_value / list element shapes)
    * flattened to k=v or value lists joined with ','. Null fields are
    * absent from the map. */
  private def groupToMap(g: Group): Map[String, String] = {
    val t = g.getType
    (0 until t.getFieldCount).flatMap { i =>
      val n = g.getFieldRepetitionCount(i)
      if (n == 0) None
      else {
        val rendered = (0 until n).map(render(g, i, _)).mkString(",")
        Some(t.getFieldName(i) -> rendered)
      }
    }.toMap
  }

  private def render(g: Group, field: Int, idx: Int): String = {
    if (g.getType.getType(field).isPrimitive) g.getValueToString(field, idx)
    else {
      val sub = g.getGroup(field, idx)
      val st = sub.getType
      val parts = (0 until st.getFieldCount).flatMap { i =>
        val n = sub.getFieldRepetitionCount(i)
        (0 until n).map(render(sub, i, _))
      }
      // a map's key_value renders as key=value; list wrappers collapse
      if (st.getFieldCount == 2 && parts.length == 2) s"${parts(0)}=${parts(1)}"
      else parts.mkString(",")
    }
  }
}
