package graft.config

import scala.collection.mutable
import scala.io.Source

/** S11 — CLI TOML config scan (`config.py:1-251`). The reference reads a
  * flat TOML file of `[section]` tables with scalar keys; this parser
  * covers that subset (strings, ints, floats, booleans; comments;
  * dotted lookup "section.key"). Pure driver-side Scala.
  */
object GraftConfig {

  final case class Config(values: Map[String, String]) {
    def get(key: String): Option[String] = values.get(key)
    def getInt(key: String): Option[Int] = values.get(key).flatMap(v => v.toIntOption)
    def getDouble(key: String): Option[Double] = values.get(key).flatMap(_.toDoubleOption)
    def getBoolean(key: String): Option[Boolean] = values.get(key).map(_ == "true")
  }

  def parse(lines: Seq[String]): Config = {
    val out = mutable.LinkedHashMap[String, String]()
    var section = ""
    lines.foreach { raw =>
      val line = raw.takeWhile(_ != '#').trim
      if (line.nonEmpty) {
        if (line.startsWith("[") && line.endsWith("]"))
          section = line.substring(1, line.length - 1).trim
        else {
          val i = line.indexOf('=')
          if (i > 0) {
            val key = line.substring(0, i).trim
            var v = line.substring(i + 1).trim
            if ((v.startsWith("\"") && v.endsWith("\"")) ||
                (v.startsWith("'") && v.endsWith("'")))
              v = v.substring(1, v.length - 1)
            val full = if (section.isEmpty) key else s"$section.$key"
            out(full) = v
          }
        }
      }
    }
    Config(out.toMap)
  }

  def load(path: String): Config = {
    val src = Source.fromFile(path, "UTF-8")
    try parse(src.getLines().toSeq) finally src.close()
  }
}
