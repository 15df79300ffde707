package graft

import graft.operators.WordCount
import graft.sources.Tables.documents
import org.apache.spark.sql.functions.col
import scala.util.Random

class HeavyHittersSpec extends SparkSpec {
  import spark.implicits._

  test("no-eviction regime: summary equals exact counts") {
    val docs = documents(spark, sfDir)
    val got = WordCount.heavyHitters(docs, col("text"), capacity = 64)
      .as[(String, Long)].collect().toSeq
    val want = WordCount.byFrequency(docs, col("text"))
      .as[(String, Long)].collect().toSeq
    assert(got == want)
  }

  test("eviction regime: the MG guarantee holds under merge") {
    // one heavy word at ~1/3 of the stream, 300 distinct noise words,
    // capacity far below the dictionary — decrements must happen
    val rnd = new Random(7)
    val lines = Seq.fill(3000) {
      if (rnd.nextInt(3) == 0) "heavy" else s"noise${rnd.nextInt(300)}"
    }
    val df = lines.grouped(50).map(_.mkString(" ")).toSeq.toDF("text")
    val capacity = 16
    val n = lines.size
    val trueHeavy = lines.count(_ == "heavy").toLong
    val got = WordCount.heavyHitters(df, col("text"), capacity)
      .as[(String, Long)].collect().toMap
    assert(got.size <= capacity)
    // freq(heavy) ~ n/3 > n/(capacity+1): must be present...
    assert(got.contains("heavy"))
    // ...with a count that is an underestimate by at most n/(cap+1)
    assert(got("heavy") <= trueHeavy)
    assert(got("heavy") >= trueHeavy - n / (capacity + 1))
  }

  test("summary survives serialize/deserialize round-trip") {
    import graft.functions.HeavyHitters
    import org.apache.spark.unsafe.types.UTF8String
    val agg = HeavyHitters(null, capacity = 8)
    val buf = agg.createAggregationBuffer()
    Seq("a", "b", "a", "c").foreach { w =>
      buf.update(UTF8String.fromString(w),
        buf.getOrElse(UTF8String.fromString(w), 0L) + 1)
    }
    val back = agg.deserialize(agg.serialize(buf))
    assert(back == buf)
  }
}
