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
  * decoder init per partition, streaming over rows). Decoding is REAL
  * for the formats the JDK ships codecs for — PNG/JPEG/BMP/GIF via
  * `javax.imageio` (16-dim 4x4 mean-luminance grid features) and PCM
  * WAV via `javax.sound.sampled` (16-segment RMS energy envelope) — no
  * external libraries needed. Payloads in any other container (video:
  * no JDK codec exists) fall back to `decodeStub`, the single seam
  * where an ffmpeg-style binding would plug in; the `decoder` column
  * records which path each row took.
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
      n_bytes: Option[Long],   // None = payload ABSENT (null content) —
      content_hash: Option[Long], // distinct from a 0-byte payload,
                               // whose hash is the real empty-bytes hash
      feature_vec: Array[Float],
      n_frames_sampled: Int,
      decoder: String)        // imageio | wav_pcm | ffmpeg | stub

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

  /** Decoded payload: dims for images, duration for audio, and a 16-dim
    * feature vector (luminance grid / RMS envelope). */
  final case class Decoded(featureVec: Array[Float], nFrames: Int,
                           decoder: String)

  private val ImageMagics: Seq[Array[Byte]] = Seq(
    Array(0x89.toByte, 'P', 'N', 'G'),                        // PNG
    Array(0xFF.toByte, 0xD8.toByte, 0xFF.toByte),             // JPEG
    Array('B'.toByte, 'M'.toByte),                            // BMP
    Array('G'.toByte, 'I'.toByte, 'F'.toByte, '8'.toByte))    // GIF

  private def startsWith(content: Array[Byte], magic: Array[Byte]): Boolean =
    content.length >= magic.length &&
      magic.indices.forall(i => content(i) == magic(i))

  private def isRiffWave(c: Array[Byte]): Boolean =
    c.length >= 12 && c(0) == 'R' && c(1) == 'I' && c(2) == 'F' && c(3) == 'F' &&
      c(8) == 'W' && c(9) == 'A' && c(10) == 'V' && c(11) == 'E'

  /** REAL image decode (JDK `javax.imageio`): 4x4 mean-luminance grid as
    * the 16-dim feature vector, pixel-subsampled so a huge image costs
    * O(4096) reads, not O(w*h). */
  private def decodeImage(content: Array[Byte]): Option[Decoded] = {
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(content))
    if (img == null) None
    else {
      val (w, h) = (img.getWidth, img.getHeight)
      if (w <= 0 || h <= 0) None
      else {
        val sum = new Array[Float](16)
        val cnt = new Array[Int](16)
        val stepX = math.max(1, w / 64)
        val stepY = math.max(1, h / 64)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val rgb = img.getRGB(x, y)
            val lum = (0.299f * ((rgb >> 16) & 0xff) +
              0.587f * ((rgb >> 8) & 0xff) + 0.114f * (rgb & 0xff)) / 255.0f
            val cell = math.min(3, y * 4 / h) * 4 + math.min(3, x * 4 / w)
            sum(cell) += lum
            cnt(cell) += 1
            x += stepX
          }
          y += stepY
        }
        val vec = Array.tabulate(16)(i => if (cnt(i) == 0) 0f else sum(i) / cnt(i))
        Some(Decoded(vec, 1, "imageio"))
      }
    }
  }

  /** REAL audio decode (JDK `javax.sound.sampled`, PCM WAV): 16-segment
    * RMS energy envelope over the normalized samples. */
  private def decodeWav(content: Array[Byte]): Option[Decoded] = {
    val in = try javax.sound.sampled.AudioSystem.getAudioInputStream(
      new java.io.ByteArrayInputStream(content))
    catch { case _: Exception => return None }
    try {
      val fmt = in.getFormat
      if (fmt.getEncoding != javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED ||
          fmt.getSampleSizeInBits != 16) None
      else {
        val bytes = in.readAllBytes()
        val n = bytes.length / 2
        if (n == 0) None
        else {
          val sumSq = new Array[Double](16)
          val cnt = new Array[Int](16)
          val order = if (fmt.isBigEndian) java.nio.ByteOrder.BIG_ENDIAN
                      else java.nio.ByteOrder.LITTLE_ENDIAN
          val buf = java.nio.ByteBuffer.wrap(bytes).order(order).asShortBuffer()
          var i = 0
          while (i < n) {
            val s = buf.get(i) / 32768.0
            val seg = math.min(15, i * 16 / n)
            sumSq(seg) += s * s
            cnt(seg) += 1
            i += 1
          }
          val vec = Array.tabulate(16) { i =>
            if (cnt(i) == 0) 0f else math.sqrt(sumSq(i) / cnt(i)).toFloat
          }
          Some(Decoded(vec, n, "wav_pcm"))
        }
      }
    } finally in.close()
  }

  /** MP4/MOV (ftyp), Matroska/WebM (EBML), AVI (RIFF) container magics —
    * the gate for the external-binary video seam, so arbitrary non-media
    * blobs never pay a process spawn. */
  private def isVideoContainer(c: Array[Byte]): Boolean =
    (c.length >= 12 && c(4) == 'f' && c(5) == 't' && c(6) == 'y' && c(7) == 'p') ||
      (c.length >= 4 && c(0) == 0x1A.toByte && c(1) == 0x45.toByte &&
        c(2) == 0xDF.toByte && c(3) == 0xA3.toByte) ||
      (c.length >= 12 && c(0) == 'R' && c(1) == 'I' && c(2) == 'F' &&
        c(3) == 'F' && c(8) == 'A' && c(9) == 'V' && c(10) == 'I')

  /** Probed once per JVM (executor-side too: each executor JVM probes its
    * own PATH). With an `ffmpeg` binary present, video decode is REAL;
    * absent, video payloads fall back to `decodeStub`. */
  lazy val ffmpegAvailable: Boolean =
    try {
      val p = new ProcessBuilder("ffmpeg", "-version")
        .redirectErrorStream(true).start()
      p.getInputStream.readAllBytes()
      p.waitFor() == 0
    } catch { case _: Exception => false }

  /** REAL video decode via an external `ffmpeg` binary (the productionized
    * form of the former stub seam): every frame is scaled to the same 4x4
    * grayscale grid the image path uses, and the 16-dim feature vector is
    * the per-cell mean over frames. The payload goes through a temp file
    * (most containers need seekable input); stderr is discarded so the
    * single stdout read can't deadlock. Returns None when ffmpeg is
    * absent or the payload doesn't decode — the caller stubs. */
  private def decodeVideoFfmpeg(content: Array[Byte]): Option[Decoded] = {
    if (!ffmpegAvailable) return None
    val tmp = java.nio.file.Files.createTempFile("graft_media", ".bin")
    try {
      java.nio.file.Files.write(tmp, content)
      val p = new ProcessBuilder("ffmpeg", "-v", "error", "-i", tmp.toString,
        "-vf", "scale=4:4", "-f", "rawvideo", "-pix_fmt", "gray", "-")
        .redirectError(ProcessBuilder.Redirect.DISCARD)
        .start()
      p.getOutputStream.close()
      // Bounded decode: ffmpeg runs on UNTRUSTED blobs, and a crafted or
      // pathological payload bearing a valid container magic must not
      // hang the executor task (an unbounded readAllBytes/waitFor would
      // block the whole stage). Output is drained on a side thread with
      // a byte cap (past the cap ffmpeg blocks on the full pipe and the
      // timeout reaps it); the task thread waits a wall-clock bound and
      // destroyForcibly on expiry unblocks the drain via pipe close.
      val maxOutBytes = 64 * 1024 * 1024 // 16 B/frame -> 4M frames, ample
      val buf = new java.io.ByteArrayOutputStream()
      val drain = new Thread(() => {
        try {
          val in = p.getInputStream
          val chunk = new Array[Byte](64 * 1024)
          var n = in.read(chunk)
          while (n >= 0 && buf.size <= maxOutBytes) {
            buf.write(chunk, 0, n); n = in.read(chunk)
          }
        } catch { case _: Exception => () }
      }, "graft-ffmpeg-drain")
      drain.setDaemon(true)
      drain.start()
      val finished = p.waitFor(30, java.util.concurrent.TimeUnit.SECONDS)
      if (!finished) p.destroyForcibly()
      drain.join(5000) // happens-before for buf; bounded even if stuck
      val out = buf.toByteArray
      // a capped drain means TRUNCATED output: when the remainder fit in
      // the OS pipe buffer ffmpeg still exits 0, so exit status alone
      // would accept stats computed over a cut-off frame stream — treat
      // hitting the cap as a failed decode, never as data
      val truncated = out.length > maxOutBytes
      val ok = finished && p.exitValue() == 0 && !truncated
      val nFrames = out.length / 16
      if (!ok || nFrames == 0) None
      else {
        val vec = new Array[Float](16)
        var f = 0
        while (f < nFrames) {
          var c = 0
          while (c < 16) { vec(c) += (out(f * 16 + c) & 0xff) / 255.0f; c += 1 }
          f += 1
        }
        var c = 0
        while (c < 16) { vec(c) /= nFrames; c += 1 }
        Some(Decoded(vec, nFrames, "ffmpeg"))
      }
    } catch { case _: Exception => None }
    finally java.nio.file.Files.deleteIfExists(tmp)
  }

  /** Dispatch on container magic: JDK-decodable payloads get the real
    * decode; video containers go through the ffmpeg seam when the binary
    * is present; everything else returns None for the caller's stub
    * fallback. */
  def decode(content: Array[Byte]): Option[Decoded] =
    try {
      if (ImageMagics.exists(startsWith(content, _))) decodeImage(content)
      else if (isRiffWave(content)) decodeWav(content)
      else if (isVideoContainer(content)) decodeVideoFfmpeg(content)
      else None
    } catch { case _: Exception => None } // corrupt container → fallback

  /** STUB decoder: the fallback for payloads the JDK has no codec for
    * (video containers; corrupt/unknown media). Produces a deterministic
    * 16-dim feature vector from payload bytes so the pipeline shape
    * (batch iteration, schema, partitioning) is fully exercisable.
    * An ffmpeg-style binding replaces this body to productionize.
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

  /** Per-partition feature extraction: one decoder "session" per
    * partition, streaming over its rows — the batch shape a real codec
    * needs (matches the mapInPandas contract from the PySpark world).
    * A NULL payload (e.g. a null source text upstream) is treated as an
    * empty one rather than NPE-ing the task: decode() would swallow its
    * own NPE into None, but the stub fallback and the length/hash fields
    * dereference content unguarded. The content hash is the shared
    * 60-bit md5 kernel (`SimHashUtil.tokenHash60`) — engine-portable,
    * one implementation. */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // per-partition scope: a codec needing init/teardown hooks in here
      rows.map { r =>
        // NULL content = payload ABSENT: size and hash are NULL (the
        // r18 adversarial gate caught the old empty-bytes coalesce,
        // which hashed every missing payload to the SAME value as a
        // genuinely 0-byte file — at scale that turns "a billion rows
        // with a missing blob" into one giant exact-dup cluster). The
        // decode stub still runs on empty bytes so the feature/frame
        // plumbing keeps its shape on such rows.
        val absent = r.content == null
        val content = if (absent) Array.emptyByteArray else r.content
        val (vec, frames, decoder) = decode(content) match {
          case Some(d) => (d.featureVec, d.nFrames, d.decoder)
          case None =>
            val (v, f) = decodeStub(content, r.media_type)
            (v, f, "stub")
        }
        MediaFeatures(r.media_id, r.media_type,
          if (absent) None else Some(content.length.toLong),
          if (absent) None
          else Some(graft.functions.SimHashUtil.tokenHash60(content)),
          vec, frames, decoder)
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
