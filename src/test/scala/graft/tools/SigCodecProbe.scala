package graft.tools

import org.apache.spark.sql.functions._

/** r18 codec A/B for the staged signature relation: md5-derived longs
  * are near-incompressible, so snappy (the session default) may be pure
  * CPU. Times write+scan for snappy / zstd / uncompressed, interleaved.
  * Run: sbt "Test/runMain graft.tools.SigCodecProbe"
  */
object SigCodecProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors.toString)
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.files.maxPartitionBytes", "4194304")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t(body: => Unit): Double = {
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
    }
    def rm(p: java.io.File): Unit = {
      if (p.isDirectory) p.listFiles.foreach(rm); p.delete(); ()
    }
    // reuse the materialized sig relation as the write SOURCE so the
    // probe times parquet encode/decode, not the signature math
    val src = spark.read.parquet("/tmp/graft_pp_sigs")
    (1 to 2).foreach { rep =>
      Seq("snappy", "zstd", "uncompressed").foreach { codec =>
        val dir = s"/tmp/graft_sig_codec_$codec"
        rm(new java.io.File(dir))
        val w = t {
          src.write.option("parquet.block.size", (32 * 1024 * 1024).toString)
            .option("compression", codec).parquet(dir)
        }
        val r = t {
          spark.read.parquet(dir).write.format("noop")
            .mode("overwrite").save()
        }
        val gb = new java.io.File(dir).listFiles.map(_.length).sum / 1e9
        println(f"[codec] rep$rep $codec%-12s write=$w%.1f s scan=$r%.1f s size=$gb%.1f GB")
      }
    }
    spark.stop()
  }
}
