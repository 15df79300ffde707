package graft

import graft.operators.WordCount
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver contract — one entry per implemented operator (SURVEY.md §2),
  * each with a DuckDB-runnable oracle where SQL-expressible.
  *
  * Column names are aliased identically in the Spark query and the
  * oracle SQL (the driver sorts columns by name before hashing), and
  * every query ends in a total ORDER BY so row order is deterministic
  * on both engines.
  */
object SparkEntry {

  private def documents(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/documents.parquet")

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    WordCount.byFrequency(
      documents(spark, "/root/testdata/sf0.001"), col("text"))

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // S1+T2+A3/X4+O6+tie-break: the reference's frequency output.
    "q_wordcount_freq" -> ((s, dir) =>
      WordCount.byFrequency(documents(s, dir), col("text"))),
    // O5: alphabetical output (byte order = std::string <).
    "q_wordcount_alpha" -> ((s, dir) =>
      WordCount.alphabetical(documents(s, dir), col("text"))),
    // README's comparison use case: top-k head of the frequency output.
    "q_wordcount_topk" -> ((s, dir) =>
      WordCount.topK(documents(s, dir), col("text"), 20)),
    // K7: formatted sink rows ("word -> count").
    "q_wordcount_fmt" -> ((s, dir) =>
      WordCount.formatted(
        WordCount.byFrequency(documents(s, dir), col("text")))),
  )

  /** DuckDB oracle per query (same table names, same column aliases,
    * same total order). Test corpus is ASCII so `[^a-zA-Z]+` in DuckDB
    * and `[^\p{L}]+` in Spark tokenize identically. */
  def oracleSql: Map[String, String] = Map(
    "q_wordcount_freq" ->
      """SELECT word, count(*) AS cnt
        |FROM (SELECT unnest(regexp_split_to_array(text, '[^a-zA-Z]+')) AS word
        |      FROM documents) t
        |WHERE word <> ''
        |GROUP BY word
        |ORDER BY cnt DESC, word""".stripMargin,
    "q_wordcount_alpha" ->
      """SELECT word, count(*) AS cnt
        |FROM (SELECT unnest(regexp_split_to_array(text, '[^a-zA-Z]+')) AS word
        |      FROM documents) t
        |WHERE word <> ''
        |GROUP BY word
        |ORDER BY word""".stripMargin,
    "q_wordcount_topk" ->
      """SELECT word, count(*) AS cnt
        |FROM (SELECT unnest(regexp_split_to_array(text, '[^a-zA-Z]+')) AS word
        |      FROM documents) t
        |WHERE word <> ''
        |GROUP BY word
        |ORDER BY cnt DESC, word
        |LIMIT 20""".stripMargin,
    "q_wordcount_fmt" ->
      """SELECT word || ' -> ' || CAST(cnt AS VARCHAR) AS line
        |FROM (SELECT word, count(*) AS cnt
        |      FROM (SELECT unnest(regexp_split_to_array(text, '[^a-zA-Z]+')) AS word
        |            FROM documents) t
        |      WHERE word <> ''
        |      GROUP BY word)
        |ORDER BY cnt DESC, word""".stripMargin,
  )
}
