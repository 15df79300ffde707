package graft.sinks

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import java.io.BufferedWriter
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._

/** K7 — the reference's formatted text sink (main.cpp:226-266): a header
  * line then one `word -> count` row per line.
  *
  * Two modes:
  *   - [[write]]: distributed — Spark text writer, one part file per
  *     partition. This is the 100 TB path; the header is a driver-side
  *     `_HEADER` sidecar so the data write stays fully parallel.
  *   - [[writeSingleFile]]: exact reference file shape (header + rows in
  *     one ordered file). Streams via toLocalIterator — only for
  *     driver-sized outputs (the reference itself is single-node here).
  */
object FormattedTextSink {

  val HeaderAlpha = "=== Final Word Counts (A → Z) ==="
  val HeaderFreq  = "=== Final Word Counts (High → Low) ==="

  /** Distributed write of pre-formatted single-column rows. */
  def write(lines: DataFrame, dir: String, header: String): Unit = {
    lines.write.mode("overwrite").text(dir)
    Files.writeString(Paths.get(dir, "_HEADER"), header + "\n")
  }

  /** Single ordered file matching the reference byte-for-byte
    * (main.cpp:231-233,262-265). Preserves the DataFrame's sort order. */
  def writeSingleFile(sorted: DataFrame, path: String, header: String): Unit = {
    val rows = sorted.select(
      concat(col("word"), lit(" -> "), col("cnt").cast("string")))
    val p: Path = Paths.get(path)
    if (p.getParent != null) Files.createDirectories(p.getParent)
    val w: BufferedWriter = Files.newBufferedWriter(p, StandardCharsets.UTF_8)
    try {
      w.write(header); w.newLine()
      rows.toLocalIterator().asScala.foreach { r =>
        w.write(r.getString(0)); w.newLine()
      }
    } finally w.close()
  }
}
