package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, and per-partition decode / feature-
  * extract operators.
  *
  * The Spark-side shape is real and tested — schema, partitioning,
  * iterator-based batch processing via typed `mapPartitions` (the
  * Scala-native equivalent of the mapInPandas batch contract: one
  * decoder init per partition, streaming over rows). The actual codec
  * call is STUBBED with a deterministic fake because no image/audio
  * libraries ship in this environment — `decodeStub` is the single seam
  * where a real decoder (e.g. javax.imageio / ffmpeg bindings) plugs in.
  */
object Multimodal {

  final case class MediaRow(
      media_id: Long,
      media_type: String,      // image | audio | video
      content: Array[Byte],    // opaque payload
      source: String,
      width: Option[Int],      // typed metadata (nullable)
      height: Option[Int],
      duration_ms: Option[Long])

  final case class MediaFeatures(
      media_id: Long,
      media_type: String,
      n_bytes: Long,
      content_hash: Long,
      // stub "decoded" features: deterministic from the payload
      feature_vec: Array[Float],
      n_frames_sampled: Int)

  /** Demo media table synthesized from the documents table: each text
    * payload becomes an opaque binary blob with typed metadata. At scale
    * this is `spark.read.parquet` over (id, binary, metadata) shards. */
  def mediaFromDocuments(docs: DataFrame): Dataset[MediaRow] = {
    import docs.sparkSession.implicits._
    docs.select(
      col("doc_id").as("media_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (pmod(col("doc_id"), lit(3)) + 1).cast(IntegerType)).as("media_type"),
      encode(col("text"), "utf-8").as("content"),
      col("source"),
      when(pmod(col("doc_id"), lit(3)) === 0, (pmod(col("doc_id"), lit(512)) + 32).cast(IntegerType))
        .as("width"),
      when(pmod(col("doc_id"), lit(3)) === 0, (pmod(col("doc_id"), lit(256)) + 32).cast(IntegerType))
        .as("height"),
      when(pmod(col("doc_id"), lit(3)) =!= 0, (pmod(col("doc_id"), lit(60000)) + 1000).cast(LongType))
        .as("duration_ms")
    ).as[MediaRow]
  }

  /** STUB decoder: stands in for the real image/audio codec. Produces a
    * deterministic 16-dim feature vector from payload bytes so the
    * pipeline shape (batch iteration, schema, partitioning) is fully
    * exercisable. Replace the body with a real decode to productionize.
    */
  private def decodeStub(content: Array[Byte], mediaType: String): (Array[Float], Int) = {
    var h = 1125899906842597L
    var i = 0
    while (i < content.length) { h = 31 * h + content(i); i += 1 }
    val vec = Array.tabulate(16) { d =>
      val hd = h ^ (0x9e3779b97f4a7c15L * (d + 1))
      (hd % 1000L).toFloat / 1000.0f
    }
    val frames = mediaType match {
      case "video" => math.max(1, (content.length / 64) % 16)
      case "audio" => math.max(1, (content.length / 128) % 8)
      case _       => 1
    }
    (vec, frames)
  }

  /** 60-bit md5-derived content hash — engine-portable (a SQL oracle
    * reproduces it as the leading 15 hex chars of md5), unlike a
    * JVM-specific polynomial hash. */
  private def contentHash60(content: Array[Byte]): Long = {
    val d = java.security.MessageDigest.getInstance("MD5").digest(content)
    var h = 0L
    var j = 0
    while (j < 15) {
      h = (h << 4) | ((d(j / 2) >> (if (j % 2 == 0) 4 else 0)) & 0xf)
      j += 1
    }
    h
  }

  /** Per-partition feature extraction: one decoder "session" per
    * partition, streaming over its rows — the batch shape a real codec
    * needs (matches the mapInPandas contract from the PySpark world). */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // real impl: initialize decoder/codec context once here
      rows.map { r =>
        val (vec, frames) = decodeStub(r.content, r.media_type)
        MediaFeatures(r.media_id, r.media_type, r.content.length.toLong,
          contentHash60(r.content), vec, frames)
      }
    }
  }

  /** Resize/frame-sample plumbing: metadata-level transform with the
    * payload untouched (the real operator rewrites `content`; the stub
    * keeps the plan shape: narrow projection, no shuffle). */
  def frameSamplePlan(media: Dataset[MediaRow], everyNthFrame: Int): DataFrame = {
    import media.sparkSession.implicits._
    media.toDF()
      .filter($"media_type" === "video")
      .withColumn("sample_every", lit(everyNthFrame))
      .withColumn("est_frames",
        greatest((col("duration_ms") / 33).cast(IntegerType), lit(1)))
      .withColumn("n_samples",
        greatest((col("est_frames") / everyNthFrame).cast(IntegerType), lit(1)))
  }
}
