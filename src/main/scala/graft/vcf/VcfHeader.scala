package graft.vcf

import java.io.{BufferedReader, InputStreamReader}
import scala.collection.mutable

import org.apache.hadoop.fs.Path
import org.apache.hadoop.io.compress.CompressionCodecFactory
import org.apache.spark.sql.SparkSession

/** One INFO/FORMAT field declaration: `##INFO=<ID=AC,Number=A,Type=Integer,
  * Description="...">`. Number ∈ {0,1,N,A,R,G,.} drives per-ALT slicing.
  * Mirrors the reference header model (`vcf_parser.py:104-270`).
  */
final case class VcfFieldMeta(id: String, number: String, tpe: String, description: String) {
  def isFlag: Boolean = tpe == "Flag" || number == "0"
  def isArray: Boolean = number match {
    case "0" | "1" => false
    case _         => true
  }
}

/** Parsed VCF header: field declarations, samples, contigs, the CSQ/ANN
  * annotation sub-schemas, and the detected imputation source.
  */
final case class VcfHeaderInfo(
    infoFields: Map[String, VcfFieldMeta],
    formatFields: Map[String, VcfFieldMeta],
    samples: Seq[String],
    contigs: Seq[String],
    csqFields: Seq[String],
    annFields: Seq[String],
    imputationSource: String,
    lines: Seq[String]) {

  def infoKeysWithNumber(spec: String): Seq[String] =
    infoFields.valuesIterator.filter(_.number == spec).map(_.id).toSeq.sorted
}

/** Driver-side VCF header parsing. The header is a bounded prefix of the
  * file, so it is read once on the driver (through the Hadoop filesystem +
  * codec stack, so any scheme/compression Spark can scan also works here);
  * the body scan stays fully distributed in VcfReader.
  *
  * Reference behavior: `vcf_parser.py:104-270` (incl. the quoted-comma
  * field splitter `_parse_field_definition:240-270`, CSQ `Format:`
  * discovery `:159-170`, ANN quoted format with 16-field fallback
  * `:45-62,172-188`) and imputation-source detection
  * (`parsers/imputation.py:83-112`).
  */
object VcfHeader {

  /** Default SnpEff ANN sub-fields (public SnpEff "ANN field" spec), used
    * when the header's ANN Description carries no explicit format. */
  val AnnDefaultFields: Seq[String] = Seq(
    "Allele", "Annotation", "Annotation_Impact", "Gene_Name", "Gene_ID",
    "Feature_Type", "Feature_ID", "Transcript_BioType", "Rank", "HGVS.c",
    "HGVS.p", "cDNA.pos/cDNA.length", "CDS.pos/CDS.length", "AA.pos/AA.length",
    "Distance", "ERRORS/WARNINGS/INFO")

  /** Read header lines (## + #CHROM) from the start of the file.
    *
    * The body scan (spark.read.text) accepts globs and directories for
    * many-file cohort layouts; the full header (INFO/FORMAT metadata) is
    * resolved from the lexicographically first matching shard. Genotype
    * sample ids are assigned POSITIONALLY from that header's #CHROM
    * line, so "shards share a header" is not assumed — it is VERIFIED:
    * every expanded shard's #CHROM sample columns are read (a bounded
    * prefix each, one driver-side open per shard, once per load) and the
    * load FAILS if any shard's sample set or order differs — otherwise
    * every genotype row of the divergent shard would be silently
    * attributed to the wrong sample. */
  def readHeaderLines(spark: SparkSession, path: String): Seq[String] = {
    val conf = spark.sparkContext.hadoopConfiguration
    val asked = new Path(path)
    val fs = asked.getFileSystem(conf)
    val expanded: Seq[Path] = {
      val matches =
        try Option(fs.globStatus(asked)).getOrElse(Array.empty)
        catch { case scala.util.control.NonFatal(_) => Array.empty[org.apache.hadoop.fs.FileStatus] }
      matches.flatMap { st =>
        if (st.isDirectory)
          fs.listStatus(st.getPath).filter(_.isFile)
            .filterNot(_.getPath.getName.startsWith("."))
        else Array(st)
      }.map(_.getPath).sortBy(_.toString).toSeq
    }
    def headerOf(p: Path): Seq[String] = {
      val codec = new CompressionCodecFactory(conf).getCodec(p)
      val raw = fs.open(p)
      val in = if (codec != null) codec.createInputStream(raw) else raw
      val reader = new BufferedReader(new InputStreamReader(in, "UTF-8"))
      try {
        val lines = mutable.ArrayBuffer[String]()
        var line = reader.readLine()
        var done = false
        while (line != null && !done) {
          if (line.startsWith("#")) {
            lines += line
            if (line.startsWith("#CHROM")) done = true
          } else done = true
          if (!done) line = reader.readLine()
        }
        lines.toSeq
      } finally reader.close()
    }
    expanded match {
      case Seq() =>
        headerOf(asked) // single missing file: fs.open fails
      case Seq(single) => headerOf(single)
      case many =>
        val first = headerOf(many.head)
        val want = first.find(_.startsWith("#CHROM"))
        // bounded-parallel verification: each probe is one bounded-prefix
        // read, but a 10k-shard cohort on an object store would pay
        // 10k×RTT serially — 16 concurrent probes keep the check
        // O(shards/16) without unbounded driver threads
        import scala.concurrent.{Await, ExecutionContext, Future}
        import scala.concurrent.duration.Duration
        val pool = java.util.concurrent.Executors.newFixedThreadPool(
          math.min(16, many.size))
        implicit val ec: ExecutionContext =
          ExecutionContext.fromExecutorService(pool)
        try {
          val checks = many.tail.map { p =>
            Future(p -> headerOf(p).find(_.startsWith("#CHROM")))
          }
          checks.foreach { f =>
            val (p, got) = Await.result(f, Duration.Inf)
            if (got != want)
              sys.error(s"cohort shards disagree on #CHROM sample columns: " +
                s"${many.head} vs $p — genotype sample ids are positional, " +
                "so mixed-sample shards cannot load as one layout; load " +
                "the shards as separate files instead")
          }
        } finally pool.shutdown()
        first
    }
  }

  def read(spark: SparkSession, path: String): VcfHeaderInfo =
    parse(readHeaderLines(spark, path))

  def parse(lines: Seq[String]): VcfHeaderInfo = {
    val info = mutable.LinkedHashMap[String, VcfFieldMeta]()
    val format = mutable.LinkedHashMap[String, VcfFieldMeta]()
    val contigs = mutable.ArrayBuffer[String]()
    var samples: Seq[String] = Nil

    lines.foreach { line =>
      if (line.startsWith("##INFO=<") && line.endsWith(">"))
        parseFieldDefinition(line.substring("##INFO=<".length, line.length - 1))
          .foreach(m => info(m.id) = m)
      else if (line.startsWith("##FORMAT=<") && line.endsWith(">"))
        parseFieldDefinition(line.substring("##FORMAT=<".length, line.length - 1))
          .foreach(m => format(m.id) = m)
      else if (line.startsWith("##contig=<") && line.endsWith(">"))
        parseKeyValues(line.substring("##contig=<".length, line.length - 1))
          .get("ID").foreach(contigs += _)
      else if (line.startsWith("#CHROM")) {
        val cols = line.split("\t")
        if (cols.length > 9) samples = cols.drop(9).toSeq
      }
    }

    VcfHeaderInfo(
      infoFields = info.toMap,
      formatFields = format.toMap,
      samples = samples,
      contigs = contigs.toSeq,
      csqFields = csqFieldsFrom(info.get("CSQ")),
      annFields = annFieldsFrom(info.get("ANN")),
      imputationSource = detectImputationSource(lines),
      lines = lines)
  }

  /** Quote-aware split of `ID=AC,Number=A,Type=Integer,Description="a, b"`
    * (commas inside quoted descriptions must not split). */
  private[vcf] def parseKeyValues(s: String): Map[String, String] = {
    val parts = mutable.ArrayBuffer[String]()
    val cur = new StringBuilder
    var inQuotes = false
    s.foreach {
      case '"'              => inQuotes = !inQuotes; cur += '"'
      case ',' if !inQuotes => parts += cur.result(); cur.clear()
      case c                => cur += c
    }
    if (cur.nonEmpty) parts += cur.result()
    parts.flatMap { p =>
      val i = p.indexOf('=')
      if (i < 0) None
      else {
        val k = p.substring(0, i)
        var v = p.substring(i + 1)
        if (k == "Description" && v.length >= 2 && v.startsWith("\"") && v.endsWith("\""))
          v = v.substring(1, v.length - 1)
        Some(k -> v)
      }
    }.toMap
  }

  private[vcf] def parseFieldDefinition(s: String): Option[VcfFieldMeta] = {
    val kv = parseKeyValues(s)
    kv.get("ID").map { id =>
      VcfFieldMeta(id, kv.getOrElse("Number", "."), kv.getOrElse("Type", "String"),
        kv.getOrElse("Description", ""))
    }
  }

  /** VEP CSQ: Description ends with `... Format: A|B|C`. */
  private def csqFieldsFrom(meta: Option[VcfFieldMeta]): Seq[String] =
    meta.map(_.description) match {
      case Some(desc) if desc.contains("Format:") =>
        desc.split("Format:").last.trim.stripPrefix("\"").stripSuffix("\"")
          .split("\\|").toSeq
      case _ => Nil
    }

  /** SnpEff ANN: format quoted inside the Description with single quotes;
    * falls back to the canonical 16-field list. */
  private def annFieldsFrom(meta: Option[VcfFieldMeta]): Seq[String] =
    meta match {
      case None => Nil
      case Some(m) =>
        val desc = m.description
        val start = desc.indexOf('\'')
        val end = desc.lastIndexOf('\'')
        if (start >= 0 && end > start && desc.contains("|"))
          desc.substring(start + 1, end).split("\\|").map(_.trim).toSeq
        else AnnDefaultFields
    }

  /** Minimac4 / Beagle / IMPUTE2 detection (`parsers/imputation.py:83-112`). */
  private[vcf] def detectImputationSource(lines: Seq[String]): String = {
    val header = lines.mkString("\n")
    val lower = header.toLowerCase
    if (lower.contains("minimac") || lower.contains("michigan imputation server")) "minimac4"
    else if (lower.contains("beagle")) "beagle"
    else if (lower.contains("impute2")) "impute2"
    else if (header.contains("##INFO=<ID=R2,")) "minimac4"
    else if (header.contains("##INFO=<ID=DR2,")) "beagle"
    else if ("##INFO=<ID=INFO,[^\\n]*Type=Float".r.findFirstIn(header).isDefined) "impute2"
    else "unknown"
  }
}
