package graft

import graft.functions.GraftFunctions

class GraftFunctionsSpec extends SparkSpec {
  import spark.implicits._

  GraftFunctions.register(spark)

  test("graft_dot from SQL") {
    val r = spark.sql(
      "SELECT graft_dot(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d")
      .as[Double].head()
    assert(r == 11.0)
  }

  test("graft_text_profile from SQL") {
    val r = spark.sql(
      "SELECT graft_text_profile('ab 12 c!') AS p").select("p.*")
      .as[(Int, Int, Int)].head()
    assert(r == ((3, 4, 6))) // ws tokens, bpe tokens (ab|12|c|!), non-ws
  }

  test("graft_shingles and graft_all_pairs from SQL") {
    val sh = spark.sql("SELECT graft_shingles('a b c d', 2) AS s")
      .as[Seq[String]].head()
    assert(sh == Seq("a b", "b c", "c d"))
    val pairs = spark.sql(
      "SELECT graft_all_pairs(array(1, 2, 3)) AS p").select("p")
      .as[Seq[(Int, Int)]].head()
    assert(pairs == Seq((1, 2), (1, 3), (2, 3)))
  }

  test("graft_all_pairs over-65k input fails actionably, not with a JVM error") {
    val e = intercept[Exception] {
      spark.sql("SELECT graft_all_pairs(sequence(1, 70000))").collect()
    }
    assert(e.getMessage.contains("graft_all_pairs"))
    assert(e.getMessage.contains("maxBucket"))
  }

  test("graft_kll from SQL: quantiles of 1..1000 within rank error") {
    val r = spark.sql(
      "SELECT graft_kll(CAST(id AS DOUBLE), array(0.5d, 0.95d), 200) AS q " +
        "FROM range(1, 1001)")
      .as[Seq[Double]].head()
    assert(r.length == 2)
    // k=200 rank error ~1.65%: p50 of 1..1000 within [480, 520],
    // p95 within [930, 970]
    assert(r(0) >= 480 && r(0) <= 520, s"p50 ${r(0)}")
    assert(r(1) >= 930 && r(1) <= 970, s"p95 ${r(1)}")
    val e = intercept[Exception] {
      spark.sql("SELECT graft_kll(1.0d, id, 200) FROM range(1)").collect()
    }
    assert(e.getMessage.contains("constant array<double>"))
  }

  test("foldable int args resolve; wrong arity raises a clear error") {
    val sh = spark.sql("SELECT graft_shingles('a b c', 1 + 1) AS s")
      .as[Seq[String]].head()
    assert(sh == Seq("a b", "b c"))
    val e = intercept[Exception] {
      spark.sql("SELECT graft_dot(array(1.0d))").collect()
    }
    assert(e.getMessage.contains("graft_dot expects 2 argument"))
  }

  test("graft_token_stats and graft_rolling_fp from SQL") {
    val ts = spark.sql(
      "SELECT graft_token_stats('a b a c a') AS q").select("q.*")
      .as[(Long, Long, Long, Long, Long)].head()
    assert(ts == ((5L, 3L, 3L, 4L, 4L))) // 'a b','b a','a c','c a' all distinct
    val fp = spark.sql(
      "SELECT size(graft_rolling_fp('abcdefghij', 4, 2)) AS n")
      .as[Int].head()
    assert(fp >= 1)
  }

  test("graft_text_dhash and graft_phrase_hits from SQL") {
    // dHash: gated under 72 code points -> 0; a 72+-char ramp hashes
    val z = spark.sql("SELECT graft_text_dhash('short') AS h")
      .as[Long].head()
    assert(z == 0L)
    val ramp = ('a' to 'z').mkString * 3 // 78 chars
    val h = spark.sql(s"SELECT graft_text_dhash('$ramp') AS h")
      .as[Long].head()
    assert(h == graft.functions.TextDHash.dhash(
      org.apache.spark.unsafe.types.UTF8String.fromString(ramp)))
    // phrase: overlapping count 2, first pos 0 -> (2L << 32) | 1
    val p = spark.sql(
      "SELECT graft_phrase_hits('a b a b a', 'a b a') AS p")
      .as[Long].head()
    assert(p == ((2L << 32) | 1L))
    assert(spark.sql("SELECT graft_phrase_hits('x y', 'a b') AS p")
      .as[Long].head() == 0L)
  }

  test("GraftExtensions wires every kernel into a fresh session") {
    // a fresh session state has no graft temp functions...
    val s2 = spark.newSession()
    intercept[Exception] {
      s2.sql("SELECT graft_dot(array(1.0d), array(1.0d))").collect()
    }
    // ...until the extensions' registrations are applied through the
    // same registerFunctions path the session builder uses for
    // spark.sql.extensions=graft.functions.GraftExtensions
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new graft.functions.GraftExtensions()(ext)
    org.apache.spark.sql.graft.ColumnBridge.applyExtensions(s2, ext)
    val d = s2.sql(
      "SELECT graft_dot(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d")
      .collect()(0).getDouble(0)
    assert(d == 11.0)
    val n = s2.sql("SELECT graft_token_stats('a b a').n_tokens AS n")
      .collect()(0).getLong(0)
    assert(n == 3L)
    // function metadata resolves too (DESCRIBE works)
    assert(s2.sql("DESCRIBE FUNCTION graft_dot").count() > 0)
  }

  test("graft_heavy_hitters aggregates from SQL") {
    Seq("a", "b", "a", "c", "a").toDF("w").createOrReplaceTempView("words")
    val top = spark.sql(
      "SELECT graft_heavy_hitters(w, 8) AS hh FROM words")
      .selectExpr("inline(hh)")
      .as[(String, Long)].collect().toSeq
    assert(top == Seq(("a", 3L), ("b", 1L), ("c", 1L)))
  }
}
