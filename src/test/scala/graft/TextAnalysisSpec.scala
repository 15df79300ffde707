package graft

import graft.functions.TextAnalysis
import graft.operators.TextOps
import org.apache.spark.sql.functions._

class TextAnalysisSpec extends SparkSpec {

  test("repetition signals: hand-computed values through the query path") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a a a b"),         // top1=3 (a), top2=2 ("a a"), top3=1
      (2L, "x y x y x"),       // top1=3 (x), top2=2 ("x y"), top3=2
      (3L, "one two three"),   // no repetition at all
      (4L, "solo"),            // single token: no grams
      (5L, ""),                // empty text: all zeros
    ).toDF("doc_id", "text")
    val got = TextOps.repetitionSignals(docs)
      .as[(Long, Long, Long, Long, Long, Long, Long, Long)]
      .collect().toSeq
    assert(got == Seq(
      //  id  n  t1 t2 t3 dw d2 rep
      (1L, 4L, 3L, 2L, 1L, 3L, 2L, 1L), // "a a" covers 2/3 > 20% of 2-grams
      (2L, 5L, 3L, 2L, 2L, 5L, 4L, 1L), // every token is a repeated word
      (3L, 3L, 1L, 1L, 1L, 0L, 0L, 1L), // top2*5=5 > n-1=2: short-doc flag
      (4L, 1L, 1L, 0L, 0L, 0L, 0L, 0L), // n<=1: 2-gram clause guarded off
      (5L, 0L, 0L, 0L, 0L, 0L, 0L, 0L),
    ))
  }

  test("TextProfile single-pass counts match the regex definitions") {
    import graft.functions.{TextAnalysis, TextProfile}
    import org.apache.spark.sql.functions.{col, regexp_count, lit}
    import org.apache.spark.sql.graft.ColumnBridge
    import spark.implicits._
    val texts = Seq(
      "hello world", "  leading and trailing  ", "", "   ",
      "abc123def", "a1!b2?c", "tabs\tand\nnewlines\r\nhere",
      "héllo wörld über café", "42 + 7 = 49!!", "one",
      "mixed: 3.14, x_y-z (q)", "ça va? très bien!",
    )
    val df = texts.toDF("text")
    val profiled = df.select(
      ColumnBridge.column(TextProfile(ColumnBridge.expression(col("text")))).as("p"),
      regexp_count(col("text"), lit(TextAnalysis.WsTokenRegex)).as("ws"),
      regexp_count(col("text"), lit(TextAnalysis.BpeTokenRegex)).as("bpe"),
      (org.apache.spark.sql.functions.length(col("text"))
        - regexp_count(col("text"), lit("\\s"))).as("nonws"))
    profiled.collect().foreach { r =>
      val p = r.getStruct(0)
      assert(p.getInt(0) == r.getInt(1), s"ws mismatch: $r")
      assert(p.getInt(1) == r.getInt(2), s"bpe mismatch: $r")
      assert(p.getInt(2) == r.getInt(3), s"nonws mismatch: $r")
    }
  }
  import spark.implicits._

  private val docs = Seq(
    (1L, "the cat sat on the mat", "en", "src0", 22L),
    (2L, "el que los las y en por", "es", "src1", 23L),
    (3L, "xyzzy plugh", "zz", "src0", 11L),
    (4L, "a b!! 12 cd3", "en", "src1", 12L),
  ).toDF("doc_id", "text", "lang", "source", "n_chars")

  test("token counts: whitespace vs BPE-ish segmentation") {
    val rows = TextOps.textStats(docs)
      .select("doc_id", "n_tokens_ws", "n_tokens_bpe")
      .as[(Long, Long, Long)].collect()
    // "a b!! 12 cd3": ws = [a, b!!, 12, cd3] = 4;
    // bpe = [a, b, !!, 12, cd, 3] = 6
    assert(rows.find(_._1 == 4L).get == ((4L, 4L, 6L)))
  }

  test("language ID picks the max stopword list, unknown when none") {
    val got = TextOps.langIdQuery(docs)
      .select("doc_id", "lang_pred").as[(Long, String)].collect().toMap
    assert(got(1L) == "en")
    assert(got(2L) == "es")
    assert(got(3L) == "unknown")
  }

  test("langMix: per-line ID, dominant language, minority share") {
    import spark.implicits._
    val mixed = Seq(
      // 3 en lines + 1 es line -> en dominant, 2500 bp minority
      (1L, "the cat and the dog\nel gato y el perro\nit is a test\nto be and to do"),
      // pure en, with an empty line that must not count
      (2L, "the a and of\n\nto in is it"),
      // tie 1-1 between en and es -> en wins (earlier in the list)
      (3L, "the cat and dog\nel gato y perro")
    ).toDF("doc_id", "text")
    val got = graft.operators.TextOps.langMix(mixed)
      .as[(Long, Long, String, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    assert(got(1L) == ((1L, 4L, "en", 3L, 2500L)))
    assert(got(2L) == ((2L, 2L, "en", 2L, 0L)))
    assert(got(3L) == ((3L, 2L, "en", 1L, 5000L)))
  }

  test("langMix on the lined corpus: lines conserve, shares in range") {
    import spark.implicits._
    val corpus = spark.read.parquet(s"$sfDir/documents.parquet")
    val rows = TextOps.langMixQuery(corpus)
      .as[(Long, Long, String, Long, Long)].collect()
    assert(rows.length == corpus.count())
    rows.foreach { case (_, nLines, _, nMajor, minorBp) =>
      assert(nLines >= 1 && nMajor >= 1 && nMajor <= nLines)
      assert(minorBp == (nLines - nMajor) * 10000 / nLines)
    }
    // the lined twin actually produces multi-line docs
    assert(rows.exists(_._2 > 1))
  }

  test("quality score in [0,1], lower for stopword-heavy docs") {
    val q = TextOps.textQuality(docs)
      .select("doc_id", "quality").as[(Long, Double)].collect().toMap
    q.values.foreach(v => assert(v >= 0.0 && v <= 1.0))
    // doc 1: 6 tokens, 2 stopwords ("the"×2), 17 letters / 22 chars:
    // (6/50) * (1 - 2/6) * (17/22) = 0.0618182 -> 0.0618
    assert(q(1L) == 0.0618)
  }

  test("md5 fingerprint matches known digest") {
    val fp = TextOps.fingerprints(
      Seq((1L, "hello", "en", "s", 5L))
        .toDF("doc_id", "text", "lang", "source", "n_chars"))
      .select("fp_md5").as[String].head()
    assert(fp == "5d41402abc4b2a76b9719d911017c592")
  }

  test("shingles: 2-grams of 4 tokens = 3 shingles; short docs = none") {
    val s = Seq("w x y z", "w").toDF("text")
      .select(TextAnalysis.shingles(col("text"), 2).as("sh"))
      .as[Seq[String]].collect()
    assert(s(0) == Seq("w x", "x y", "y z"))
    assert(s(1) == Seq.empty)
  }

  test("langStats groups by (lang, source) with conserved doc count") {
    val r = TextOps.langStats(docs)
    assert(r.agg(sum("n_docs")).as[Long].head() == 4L)
  }

  test("portable winnowing matches a Scala brute force on the corpus") {
    import spark.implicits._
    val k = 8; val w = 4
    def md5h(s: String): Long = java.lang.Long.parseLong(
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(15), 16)
    def winnow(text: String): Seq[(Long, Long)] = {
      // index by CODEPOINTS, not UTF-16 units — the kernel (and Spark
      // substr/length, and DuckDB) count codepoints, so a UTF-16 model
      // would spuriously diverge on astral chars.
      val cp = text.codePoints().toArray
      val n = cp.length - k + 1
      if (n <= 0) Nil
      else {
        val hs = (0 until n).map(i => md5h(new String(cp, i, k)))
        val sel = scala.collection.mutable.SortedSet[Int]()
        for (e <- math.min(w, n) - 1 until n) {
          val lo = math.max(0, e - w + 1)
          var best = lo
          for (i <- lo + 1 to e)
            if (hs(i) < hs(best) || (hs(i) == hs(best) && i > best)) best = i
          sel += best
        }
        sel.toSeq.map(i => (i.toLong, hs(i)))
      }
    }
    val corpus = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text").filter($"doc_id" < 40)
    val expect = corpus.collect().flatMap { r =>
      winnow(r.getString(1)).map { case (p, h) => (r.getLong(0), p, h) }
    }.toSet
    val got = TextOps.rollingFingerprintsPortable(corpus, k, w)
      .as[(Long, Long, Long)].collect().toSet
    assert(got == expect)
    assert(got.nonEmpty)
    // third formulation: declarative window functions agree with both
    val viaWindows = TextOps.winnowedViaWindows(corpus, k, w)
      .as[(Long, Long, Long)].collect().toSet
    assert(viaWindows == expect)
  }

  test("PMI collocations: planted adjacent pair outranks its reverse") {
    import spark.implicits._
    val docs = Seq(
      (1L, Seq.fill(10)("aa bb").mkString(" "), "en", "s", 0L),
      (2L, "cc cc cc dd dd dd cc dd", "en", "s", 0L),
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val r = TextOps.collocations(docs, minCount = 5, k = 10)
      .as[(String, Long, Double)].collect().map(t => t._1 -> t).toMap
    // "aa bb" occurs 10x (every adjacency), "bb aa" 9x — both pass
    // minCount; the always-adjacent direction scores strictly higher
    assert(r.contains("aa bb") && r.contains("bb aa"))
    assert(r("aa bb")._2 == 10L && r("bb aa")._2 == 9L)
    assert(r("aa bb")._3 > r("bb aa")._3)
    assert(!r.keySet.exists(_.startsWith("cc"))) // below minCount
  }

  test("portable winnowing indexes by codepoints, not UTF-16 units") {
    import spark.implicits._
    // astral-plane chars are 2 UTF-16 units but 1 codepoint; the kernel
    // and the substr-based window formulation agree only if both count
    // codepoints (and never split surrogate pairs into the md5 input)
    val docs = Seq(
      (1L, "😀😁😂abcdefgh😄 xyz"),
      (2L, "abc 😀 def ghij"),
    ).toDF("doc_id", "text")
    val kernel = TextOps.rollingFingerprintsPortable(docs, 4, 2)
      .as[(Long, Long, Long)].collect().toSet
    val windows = TextOps.winnowedViaWindows(docs, 4, 2)
      .as[(Long, Long, Long)].collect().toSet
    assert(kernel == windows)
    assert(kernel.nonEmpty)
  }

  test("oovRate: hand-computed shares, duplicate vocab rows ignored, " +
    "vocab side broadcast") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b zz a", "s1"),   // 4 tokens, 1 oov (zz)
      (2L, "zz yy", "s1"),      // 2 tokens, 2 oov
      (3L, "a a a", "s2"))      // 3 tokens, 0 oov
      .toDF("doc_id", "text", "source")
    // duplicate vocab entries must not double-count matched tokens
    val vocab = Seq("a", "b", "a").toDF("term")
    val got = TextOps.oovRate(docs, vocab)
      .as[(String, Long, Long, Long)].collect().toSeq
    // s1: 6 tokens, 3 oov -> 5000 bp; s2: 3 tokens, 0 oov -> 0 bp
    assert(got == Seq(("s1", 6L, 3L, 5000L), ("s2", 3L, 0L, 0L)))
    // the vocab relation joins broadcast — no shuffle on the big side
    val plan = TextOps.oovRate(docs, vocab)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
  }

  /** Plain-Scala Levenshtein — the spec's independent witness for
    * vocabEditPairs (two-row DP, no library). */
  private def lev(a: String, b: String): Int = {
    var prev = (0 to b.length).toArray
    for (i <- 1 to a.length) {
      val cur = new Array[Int](b.length + 1)
      cur(0) = i
      for (j <- 1 to b.length)
        cur(j) = math.min(math.min(cur(j - 1) + 1, prev(j) + 1),
          prev(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      prev = cur
    }
    prev(b.length)
  }

  test("vocabEditPairs: planted typo families, exact distances") {
    import spark.implicits._
    val docs = Seq(
      (1L, "tokenizer filter spark query pipeline"),
      (2L, "tokenzer filler sprak query pipeline"),   // del, sub, transpose
      (3L, "quarry pipeline pipeline zzzz"),          // quarry~query d=2
    ).toDF("doc_id", "text")
    val got = TextOps.vocabEditPairs(docs, maxDist = 2, minLen = 4)
      .as[(String, String, Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4, r._5)).toMap
    // deletion (d=1), substitution (d=1), transposition (d=2 in plain
    // Levenshtein — no Damerau move), and a 2-edit sub+insert pair
    assert(got(("tokenizer", "tokenzer"))._1 == 1L)
    assert(got(("filler", "filter"))._1 == 1L)
    assert(got(("spark", "sprak"))._1 == 2L)
    assert(got(("quarry", "query"))._1 == 2L)
    // frequencies ride along: pipeline appears 3x but pairs with
    // nothing within distance 2 of it
    assert(!got.keySet.exists(p => p._1 == "pipeline" || p._2 == "pipeline"))
    // counts are the corpus frequencies (query occurs twice)
    assert(got(("quarry", "query"))._3 == 2L)
    // pairs are (a < b)-canonical and within-distance only
    got.keys.foreach { case (a, b) => assert(a < b) }
    got.foreach { case ((a, b), (d, _, _)) => assert(lev(a, b) == d && d <= 2) }
  }

  test("vocabEditPairs == brute-force levenshtein join on the corpus") {
    import spark.implicits._
    val corpus = spark.read.parquet(s"$sfDir/documents.parquet")
    val vocab = corpus
      .select(explode(TextAnalysis.wsTokens(col("text"))).as("w"))
      .filter(length(col("w")) >= 4)
      .groupBy("w").count().as[(String, Long)].collect().toMap
    val expected = (for {
      a <- vocab.keys; b <- vocab.keys if a < b
      d = lev(a, b) if d <= 2
    } yield (a, b) -> (d.toLong, vocab(a), vocab(b))).toMap
    val got = TextOps.vocabEditPairs(corpus, maxDist = 2, minLen = 4)
      .as[(String, String, Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4, r._5)).toMap
    assert(got == expected)
    assert(got.nonEmpty) // the corpus must actually exercise the path
    // maxDist = 1 is the strict subset at distance 1
    val got1 = TextOps.vocabEditPairs(corpus, maxDist = 1, minLen = 4)
      .as[(String, String, Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4, r._5)).toMap
    assert(got1 == expected.filter(_._2._1 <= 1L))
  }

  test("vocabEditPairs rejects a minLen that opens the skew trap") {
    import spark.implicits._
    val docs = Seq((1L, "ab cd")).toDF("doc_id", "text")
    intercept[IllegalArgumentException] {
      TextOps.vocabEditPairs(docs, maxDist = 2, minLen = 3)
    }
    intercept[IllegalArgumentException] {
      TextOps.vocabEditPairs(docs, maxDist = 3)
    }
  }
}
