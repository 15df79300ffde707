package graft

import graft.operators.WordCount
import graft.sinks.FormattedTextSink
import org.apache.spark.sql.functions._

import java.nio.file.Files

/** End-to-end word-count pipeline on tiny in-memory fixtures and the
  * sf0.001 documents table. Goldens hand-computed per the reference
  * semantics (case-sensitive, digits/punct delimit). */
class WordCountSpec extends SparkSpec {
  import spark.implicits._

  private val fixture = Seq(
    "hello world hello",
    "Han han HAN",
    "well-known foo.bar,baz!",
    "abc123def 42",
    "",
    "hello"
  ).toDF("text")

  test("counts match hand-computed golden") {
    val got = WordCount.counts(fixture, col("text"))
      .as[(String, Long)].collect().toMap
    val want = Map(
      "hello" -> 3L, "world" -> 1L, "Han" -> 1L, "han" -> 1L, "HAN" -> 1L,
      "well" -> 1L, "known" -> 1L, "foo" -> 1L, "bar" -> 1L, "baz" -> 1L,
      "abc" -> 1L, "def" -> 1L)
    assert(got == want)
  }

  test("alphabetical order is byte order") {
    val words = WordCount.alphabetical(fixture, col("text"))
      .select("word").as[String].collect().toSeq
    assert(words == words.sorted) // String.compareTo = UTF-16 code-unit; ASCII-safe
    assert(words.head == "HAN")   // uppercase sorts before lowercase (byte order)
  }

  test("frequency order with (cnt DESC, word ASC) tie-break") {
    val rows = WordCount.byFrequency(fixture, col("text"))
      .as[(String, Long)].collect().toSeq
    assert(rows.head == ("hello", 3L))
    val ties = rows.filter(_._2 == 1L).map(_._1)
    assert(ties == ties.sorted)
  }

  test("case-folded frequency merges Han/han/HAN (README comparison use case)") {
    val got = WordCount.byFrequencyFolded(fixture, col("text"))
      .as[(String, Long)].collect().toSeq
    assert(got.head == ("han", 3L) || got.head == ("hello", 3L))
    val m = got.toMap
    assert(m("han") == 3L && !m.contains("Han") && !m.contains("HAN"))
    // tie-break still (cnt DESC, word ASC)
    val ties = got.filter(_._2 == 1L).map(_._1)
    assert(ties == ties.sorted)
  }

  test("topK returns k highest") {
    val top = WordCount.topK(fixture, col("text"), 1).as[(String, Long)].collect()
    assert(top.toSeq == Seq(("hello", 3L)))
  }

  test("formatted sink writes header + 'word -> count' rows") {
    val dir = Files.createTempDirectory("graft-sink").toString
    val path = s"$dir/output.txt"
    FormattedTextSink.writeSingleFile(
      WordCount.byFrequency(fixture, col("text")), path,
      FormattedTextSink.HeaderFreq)
    val lines = Files.readAllLines(java.nio.file.Paths.get(path))
    assert(lines.get(0) == "=== Final Word Counts (High → Low) ===")
    assert(lines.get(1) == "hello -> 3")
    assert(lines.size() == 13) // header + 12 distinct words
  }

  test("sf0.001 documents: freq query nonempty, conserved total") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val counts = WordCount.counts(docs, col("text"))
    val totalFromCounts = counts.agg(sum("cnt")).as[Long].head()
    val totalTokens = WordCount.words(docs, col("text")).count()
    assert(totalFromCounts == totalTokens && totalTokens > 0)
  }

  test("byte-exact UDF and regex path agree on the ASCII test corpus") {
    graft.functions.Tokenizer.registerUdfs(spark)
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val viaUdf = docs
      .select(explode(call_udf("tokenize_bytes", col("text"))).as("word"))
      .groupBy("word").count()
    val viaRegex = WordCount.counts(docs, col("text"))
      .withColumnRenamed("cnt", "count")
    assert(viaUdf.exceptAll(viaRegex).isEmpty &&
      viaRegex.exceptAll(viaUdf).isEmpty)
  }
}
