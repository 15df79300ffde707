package graft

import java.nio.file.Files

import graft.sources.{Formats, Tables}

/** End-to-end reference-binary parity (text file in → two formatted
  * output files) and file-format round-trips. */
class AppAndFormatsSpec extends SparkSpec {

  test("WordCountApp reproduces the reference's two output files exactly") {
    val dir = Files.createTempDirectory("graft-app")
    val input = dir.resolve("input.txt")
    Files.writeString(input,
      """the quick brown fox
        |the lazy dog; the end.
        |Fox fox!
        |""".stripMargin)
    WordCountApp.main(Array(input.toString, dir.toString))
    val alpha = Files.readString(dir.resolve("output.txt"))
    val freq = Files.readString(dir.resolve("output2.txt"))
    // golden: byte order (capitals first), case-sensitive counts
    assert(alpha ==
      """=== Final Word Counts (A → Z) ===
        |Fox -> 1
        |brown -> 1
        |dog -> 1
        |end -> 1
        |fox -> 2
        |lazy -> 1
        |quick -> 1
        |the -> 3
        |""".stripMargin)
    assert(freq ==
      """=== Final Word Counts (High → Low) ===
        |the -> 3
        |fox -> 2
        |Fox -> 1
        |brown -> 1
        |dog -> 1
        |end -> 1
        |lazy -> 1
        |quick -> 1
        |""".stripMargin)
  }

  test("csv and jsonl round-trip the orders table with explicit schema") {
    val orders = Tables.table(spark, sfDir, "orders")
    val sorted = orders.orderBy("o_orderkey")
    val want = sorted.collect().map(_.toString).toSeq

    val csvDir = Files.createTempDirectory("graft-csv").toString
    Formats.writeCsv(sorted, csvDir)
    val backCsv = Formats.readCsv(spark, csvDir, orders.schema)
      .orderBy("o_orderkey").collect().map(_.toString).toSeq
    assert(backCsv == want)

    val jsonDir = Files.createTempDirectory("graft-json").toString
    Formats.writeJsonl(sorted, jsonDir)
    val backJson = Formats.readJsonl(spark, jsonDir, orders.schema)
      .orderBy("o_orderkey").collect().map(_.toString).toSeq
    assert(backJson == want)

    val orcDir = Files.createTempDirectory("graft-orc").toString
    Formats.writeOrc(sorted, orcDir)
    val backOrc = Formats.readOrc(spark, orcDir)
      .orderBy("o_orderkey").collect().map(_.toString).toSeq
    assert(backOrc == want)
  }

  test("jsonl quarantine: malformed lines isolated, clean rows parse") {
    import org.apache.spark.sql.types._
    val dir = Files.createTempDirectory("graft-jsonl-q").toString
    Files.writeString(java.nio.file.Paths.get(dir, "data.jsonl"),
      """{"id": 1, "name": "ok"}
        |{"id": 2, "name": "also ok"}
        |{"id": 3, "name": BROKEN
        |not json at all
        |{"id": 4, "name": "fine"}
        |""".stripMargin)
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("name", StringType)))
    val read = Formats.readJsonlWithQuarantine(spark, dir, schema)
    import spark.implicits._
    assert(read.clean.as[(Long, String)].collect().sorted.toSeq ==
      Seq((1L, "ok"), (2L, "also ok"), (4L, "fine")))
    val bad = read.quarantined.as[String].collect()
    assert(bad.length == 2)
    assert(bad.exists(_.contains("BROKEN")) &&
      bad.exists(_.contains("not json")))
    read.release() // cache dropped; lanes were already materialized
  }
}
