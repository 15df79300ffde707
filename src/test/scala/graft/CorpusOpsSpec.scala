package graft

import graft.operators.CorpusOps
import org.apache.spark.sql.functions._

class CorpusOpsSpec extends SparkSpec {
  import spark.implicits._

  private def corpus = spark.read.parquet(s"$sfDir/documents.parquet")

  test("stratified sample is deterministic and respects per-stratum rates") {
    val s1 = CorpusOps.stratifiedHashSample(corpus,
      Map("en" -> 10), defaultPct = 50)
    val s2 = CorpusOps.stratifiedHashSample(corpus.repartition(7),
      Map("en" -> 10), defaultPct = 50)
    // same rows regardless of physical layout (hash-threshold, not rand)
    assert(s1.exceptAll(s2).isEmpty && s2.exceptAll(s1).isEmpty)
    val byLang = s1.groupBy("lang").count().as[(String, Long)]
      .collect().toMap
    val totals = corpus.groupBy("lang").count().as[(String, Long)]
      .collect().toMap
    // en downsampled to ~10%, others ~50% (binomial slack)
    assert(byLang("en").toDouble / totals("en") < 0.25)
    assert(byLang("es").toDouble / totals("es") > 0.3)
    // boundary rates: 0 keeps nothing, 100 keeps everything
    assert(CorpusOps.stratifiedHashSample(corpus, Map(), 0).count() == 0)
    assert(CorpusOps.stratifiedHashSample(corpus, Map(), 100).count() ==
      corpus.count())
  }

  test("decontaminationSpans: same flagged pairs as decontaminate, " +
      "positions locate the quoted passage") {
    // doc 1 quotes bench 100's middle verbatim (a real leak: hits
    // packed in a short span); doc 2 shares scattered common phrases
    val benchTxt = "alpha beta gamma delta epsilon zeta eta"
    val docs = Seq(
      (1L, "intro words here " + "beta gamma delta epsilon" + " outro tail"),
      (2L, "alpha beta stuff unrelated x y z gamma delta more things"),
      (3L, "nothing in common at all"))
      .toDF("doc_id", "text")
    val bench = Seq((100L, benchTxt)).toDF("doc_id", "text")
    val spans = CorpusOps.decontaminationSpans(docs, bench)
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> r).toMap
    val flags = CorpusOps.decontaminate(docs, bench)
      .as[(Long, Long, Long)].collect().map(r => (r._1, r._2) -> r._3).toMap
    // identical flagged pairs and n_shared
    assert(spans.keySet == flags.keySet)
    spans.foreach { case (k, v) => assert(v._3 == flags(k)) }
    // doc 1: "beta gamma delta epsilon" = 2 shared 3-grams starting
    // at token 3 and 4 -> packed span
    val d1 = spans((1L, 100L))
    assert(d1._3 == 2L && d1._4 == 2L)
    assert(d1._5 == 3L && d1._6 == 4L && d1._7 == 4L) // 4-3+n
    // doc 3 shares nothing: never flagged
    assert(!spans.keySet.exists(_._1 == 3L))
    // corpus slice: flagged pairs agree with the boolean operator
    val base = corpus.filter(col("doc_id") % 97 =!= 0)
    val bslice = corpus.filter(col("doc_id") % 97 === 0)
    val got = CorpusOps.decontaminationSpans(base, bslice)
      .select("doc_id", "bench_id", "n_shared")
    val want = CorpusOps.decontaminate(base, bslice)
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
  }

  test("topFractionByGroup == the naive per-group window, threshold ties by id") {
    // the operator's whole claim: histogram-threshold selection keeps
    // EXACTLY the rows a row_number window over (score DESC, id ASC)
    // keeps, at a sort bounded by score cardinality instead of rows
    val scored = CorpusOps.qualityCalibrated(corpus, keepBp = 2500)
    val base = corpus
      .select(col("doc_id"), col("source"),
        graft.functions.TextAnalysis.wsTokens(col("text")).as("toks"),
        col("text"))
      .select(col("doc_id"), col("source"),
        size(col("toks")).as("n"),
        graft.functions.TextAnalysis.stopwordCount(col("toks"),
          graft.functions.TextAnalysis.LangStopwords.head._2).as("sc"),
        graft.functions.TextAnalysis.alphaRatio(col("text")).as("ar"))
      .select(col("doc_id"), col("source"),
        floor(least(lit(1.0), col("n").cast("double") / lit(50.0))
          * (lit(1.0) - col("sc").cast("double") / col("n"))
          * col("ar") * lit(10000.0) + lit(0.5)).cast("long").as("score"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("source").orderBy(col("score").desc, col("doc_id").asc)
    val k = base.groupBy("source").agg(count(lit(1)).as("n"))
      .select(col("source"), expr("(n * 2500 + 9999) DIV 10000").as("k"))
    val naive = base.withColumn("rn", row_number().over(w))
      .join(k, "source").filter(col("rn") <= col("k"))
      .select(col("doc_id"), col("source"), col("score"))
    assert(scored.exceptAll(naive).isEmpty && naive.exceptAll(scored).isEmpty)
    assert(scored.count() > 0)
  }

  test("topFractionByGroup: exact ceil quotas, ties kept by smallest id") {
    // group g: 5 rows all score 7 (pure tie stratum), keep 40% -> 2
    // rows, the two smallest ids; group h: distinct scores, ceil(0.4*3)
    // = 2 -> top-2 scores; group i: one row, ceil(0.4) = 1 -> kept
    val rows = Seq(
      (1L, "g", 7L), (2L, "g", 7L), (3L, "g", 7L), (4L, "g", 7L),
      (5L, "g", 7L),
      (10L, "h", 1L), (11L, "h", 9L), (12L, "h", 5L),
      (20L, "i", 0L)).toDF("id", "grp", "score")
    val got = CorpusOps.topFractionByGroup(rows, keepBp = 4000)
      .as[(Long, String, Long)].collect().toSet
    assert(got == Set((1L, "g", 7L), (2L, "g", 7L),
      (11L, "h", 9L), (12L, "h", 5L), (20L, "i", 0L)))
    // keepBp = 10000 keeps every row, including whole tie strata
    assert(CorpusOps.topFractionByGroup(rows, 10000).count() == 9)
  }

  test("topFractionByGroup == naive window on seeded random tie-heavy data") {
    // scores drawn from a tiny range so tie strata dominate — the
    // regime where the threshold/tie-quota arithmetic can break
    for (seed <- 1 to 3; keepBp <- Seq(1, 2500, 9999)) {
      val rnd = new scala.util.Random(1000 * seed + keepBp)
      val rows = Seq.tabulate(200)(i =>
        (i.toLong, s"g${rnd.nextInt(4)}", rnd.nextInt(5).toLong))
      val df = rows.toDF("id", "grp", "score")
      val got = CorpusOps.topFractionByGroup(df, keepBp)
        .as[(Long, String, Long)].collect().toSet
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("grp").orderBy(col("score").desc, col("id").asc)
      val k = df.groupBy("grp").agg(count(lit(1)).as("n"))
        .select(col("grp"),
          expr(s"(n * $keepBp + 9999) DIV 10000").as("k"))
      val want = df.withColumn("rn", row_number().over(w))
        .join(k, "grp").filter(col("rn") <= col("k"))
        .select("id", "grp", "score")
        .as[(Long, String, Long)].collect().toSet
      assert(got == want, s"seed=$seed keepBp=$keepBp")
    }
  }

  test("quota sample: exact quota per stratum, deterministic under layout") {
    val q1 = CorpusOps.quotaSample(corpus, quota = 20)
    val q2 = CorpusOps.quotaSample(corpus.repartition(9), quota = 20)
    assert(q1.exceptAll(q2).isEmpty && q2.exceptAll(q1).isEmpty)
    val perLang = q1.groupBy("lang").count().as[(String, Long)]
      .collect().toMap
    val sizes = corpus.groupBy("lang").count().as[(String, Long)]
      .collect().toMap
    sizes.foreach { case (lang, n) =>
      assert(perLang(lang) == math.min(20L, n), lang)
    }
    // quota larger than every stratum -> identity
    assert(CorpusOps.quotaSample(corpus, 100000).count() == corpus.count())
  }

  test("corpusHealth: planted duplicates and gate failures roll up") {
    val long = (1 to 60).map(i => s"w$i").mkString(" ")
    val docs = Seq(
      (1L, long, "en", "a"),          // passes gates
      (2L, long, "en", "a"),          // exact dup of 1
      (3L, "tiny doc", "de", "a"),    // fails min-tokens
      (4L, long + " x", "en", "b"))   // unique, passes
      .toDF("doc_id", "text", "lang", "source")
    val r = CorpusOps.corpusHealth(docs).collect()
      .map(x => x.getString(0) -> x).toMap
    val a = r("a")
    assert(a.getLong(1) == 3 && a.getLong(2) == 2)      // docs, distinct
    assert(a.getLong(3) == 1L * 10000 / 3)              // dup basis points
    assert(a.getLong(5) == 2 && a.getLong(6) == 2)      // passes, langs
    val b = r("b")
    assert(b.getLong(1) == 1 && b.getLong(3) == 0 && b.getLong(5) == 1)
    // and the pass counts agree with qualityRules on the real corpus
    val health = CorpusOps.corpusHealth(corpus)
      .select("source", "n_pass").as[(String, Long)].collect().toMap
    val direct = CorpusOps.qualityRules(corpus)
      .join(corpus.select("doc_id", "source"), "doc_id")
      .filter(col("pass")).groupBy("source").count()
      .as[(String, Long)].collect().toMap
    assert(health.filter(_._2 > 0) == direct)
  }

  test("quotaSampleAgg: identical rows to the window form, any quota") {
    for (q <- Seq(1, 7, 20, 100000)) {
      val a = CorpusOps.quotaSampleAgg(corpus, q)
      val b = CorpusOps.quotaSample(corpus, q)
      assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty,
        s"quota=$q diverges")
    }
    // and the heap is what runs: partial aggregation before the exchange
    val p = CorpusOps.quotaSampleAgg(corpus, 5)
      .queryExecution.executedPlan.toString
    assert(p.contains("partial_graft_top_k"),
      s"no partial heap aggregate in:\n$p")
    assert(!p.contains("Window"), s"window sort crept back in:\n$p")
  }

  test("tfIdf: k rows per doc, corpus-wide terms score zero") {
    val docs = Seq(
      (1L, "apple banana apple cherry"),
      (2L, "banana date date date"),
      (3L, "apple banana elder fig"),
    ).toDF("doc_id", "text")
    val r = CorpusOps.tfIdf(docs, k = 2)
      .as[(Long, String, Long, Double)].collect()
    assert(r.count(_._1 == 1L) == 2)
    // banana appears in every doc -> idf 0 -> never outranks rare terms
    assert(!r.exists(t => t._2 == "banana" && t._4 > 0.0))
    // doc 2's top term is its dominant rare word
    val doc2 = r.filter(_._1 == 2L).sortBy(-_._4)
    assert(doc2.head._2 == "date")
    // deterministic tie-break: equal-score terms ordered alphabetically
    val doc3 = r.filter(_._1 == 3L)
    assert(doc3.map(_._2).sorted.sameElements(doc3.map(_._2)))
  }

  test("TokenStats kernel equals the exploded-regex formulation on the corpus") {
    import graft.functions.TextAnalysis.wsTokens
    val relational = corpus
      .select(col("doc_id"), explode(wsTokens(col("text"))).as("w"))
      .groupBy("doc_id", "w").agg(count("*").as("tf"))
      .groupBy("doc_id").agg(
        sum("tf").as("n_tokens"),
        count("*").as("n_distinct_tokens"),
        max("tf").as("max_tf"))
      .as[(Long, Long, Long, Long)].collect().map(t => t._1 -> t).toMap
    val grams = corpus
      .select(col("doc_id"),
        graft.functions.TextAnalysis.shingles(col("text"), 2).as("sh"))
      .select(col("doc_id"), size(col("sh")).cast("long").as("n2"),
        size(array_distinct(col("sh"))).cast("long").as("d2"))
      .as[(Long, Long, Long)].collect().map(t => t._1 -> t).toMap
    val kernel = CorpusOps.qualityRules(corpus)
      .as[(Long, Long, Long, Long, Long, Long, Boolean)].collect()
    assert(kernel.length == corpus.count())
    kernel.foreach { case (id, nTok, nDist, maxTf, n2, dup2, _) =>
      val r = relational(id)
      assert((nTok, nDist, maxTf) == ((r._2, r._3, r._4)), s"doc $id tokens")
      val g = grams(id)
      assert((n2, n2 - dup2) == ((g._2, g._3)), s"doc $id grams")
    }
  }

  test("quality rules: integer metrics and gate flags") {
    val docs = Seq(
      (1L, ("word " * 100).trim),              // one token repeated: fails dominance + repetition
      (2L, (1 to 100).map(i => s"tok$i").mkString(" ")), // all distinct: passes
      (3L, "too short"),                        // fails min tokens
    ).toDF("doc_id", "text")
    val r = CorpusOps.qualityRules(docs)
      .select("doc_id", "n_tokens", "max_tf", "n_2grams", "n_dup_2grams", "pass")
      .as[(Long, Long, Long, Long, Long, Boolean)].collect()
      .map(t => t._1 -> t).toMap
    assert(r(1L) == ((1L, 100L, 100L, 99L, 98L, false)))
    assert(r(2L) == ((2L, 100L, 1L, 99L, 0L, true)))
    assert(r(3L) == ((3L, 2L, 1L, 1L, 0L, false)))
    // corpus split is non-degenerate
    val pass = CorpusOps.qualityRules(corpus).filter(col("pass")).count()
    assert(pass > 0 && pass < corpus.count())
  }

  test("chunkCdc == Scala witness; shift-resistant after an insertion") {
    def h60(s: String): Long = java.lang.Long.parseLong(
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
        .take(15), 16)
    val divisor = 8L; val maxLen = 24
    // independent witness: sequential CDC walk per document
    def cdc(text: String): Seq[(Long, Long, String)] = {
      val toks = "\\S+".r.findAllIn(text).toSeq
      val out = scala.collection.mutable.ArrayBuffer.empty[Seq[String]]
      var cur = scala.collection.mutable.ArrayBuffer.empty[String]
      toks.foreach { t =>
        cur += t
        if (h60(t) % divisor == 0L || cur.length == maxLen) {
          out += cur.toSeq; cur = scala.collection.mutable.ArrayBuffer()
        }
      }
      if (cur.nonEmpty) out += cur.toSeq
      out.zipWithIndex.map { case (c, i) =>
        (i.toLong, c.length.toLong, c.mkString(" ")) }.toSeq
    }
    val docs = corpus.select("doc_id", "text").as[(Long, String)].collect()
    val got = CorpusOps.chunkCdc(corpus, divisor, maxLen)
      .as[(Long, Long, Long, String)].collect()
      .groupBy(_._1).view
      .mapValues(_.sortBy(_._2).map(r => (r._2, r._3, r._4)).toSeq).toMap
    docs.foreach { case (id, text) =>
      assert(got.getOrElse(id, Nil) == cdc(text), s"doc $id") }
    // both boundary kinds must actually bind on this corpus
    assert(got.values.flatten.exists(_._2 == maxLen.toLong)) // forced cut
    assert(got.values.exists(_.size > 1))                    // content cut
    // token conservation + in-order reconstruction
    docs.foreach { case (id, text) =>
      val toks = "\\S+".r.findAllIn(text).mkString(" ")
      assert(got.getOrElse(id, Nil).map(_._3).mkString(" ") == toks)
    }
    // THE CDC property: prepend tokens to a doc — chunks after the
    // first content boundary are byte-identical (fixed-stride
    // chunking would shift every one of them)
    val (bigId, bigText) = docs.maxBy(_._2.length)
    val edited = "inserted tokens at the front " + bigText
    val before = cdc(bigText).map(_._3)
    val after = cdc(edited).map(_._3)
    assert(before.nonEmpty && after.nonEmpty)
    // drop everything up to and including the first chunk whose
    // content differs; the remainder must match exactly
    val tailLen = before.reverse.zip(after.reverse)
      .takeWhile { case (a, b) => a == b }.length
    assert(tailLen >= before.length - 5,
      s"only $tailLen/${before.length} chunks survived the insertion")
    // and the operator agrees with the witness on the edited doc
    val editedDf = Seq((bigId, edited)).toDF("doc_id", "text")
    val gotEdited = CorpusOps.chunkCdc(editedDf, divisor, maxLen)
      .as[(Long, Long, Long, String)].collect()
      .sortBy(_._2).map(r => (r._2, r._3, r._4)).toSeq
    assert(gotEdited == cdc(edited))
  }

  test("chunking covers every token once, with exact overlap carry") {
    val ck = 8; val ov = 2; val stride = ck - ov
    val docs = Seq(
      (1L, (1 to 20).map(i => s"t$i").mkString(" ")), // 20 tokens -> 3 chunks
      (2L, "a b c"),                                  // short -> 1 chunk
      (3L, (1 to 8).map(i => s"s$i").mkString(" ")),  // == budget -> 1 chunk
    ).toDF("doc_id", "text")
    val r = CorpusOps.chunkTokens(docs, ck, ov)
      .as[(Long, Long, Long, String)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2)).toMap
    // ceil((20-2)/6) = 3 chunks; reconstruction drops the 2-token overlap
    assert(r(1L).map(_._2).sameElements(Seq(0L, 1L, 2L)))
    val rebuilt = r(1L).head._4.split(" ") ++
      r(1L).tail.flatMap(_._4.split(" ").drop(ov))
    assert(rebuilt.sameElements((1 to 20).map(i => s"t$i")))
    // chunk starts: every consecutive pair shares exactly `ov` tokens
    r(1L).sliding(2).foreach { case Array(a, b) =>
      assert(a._4.split(" ").takeRight(ov)
        .sameElements(b._4.split(" ").take(ov)))
    }
    assert(r(2L).map(t => (t._2, t._3, t._4)).sameElements(
      Seq((0L, 3L, "a b c"))))
    assert(r(3L).length == 1 && r(3L).head._3 == 8L)
    // corpus-wide invariant: token conservation (sum of new tokens)
    val corpusChunks = CorpusOps.chunkTokens(corpus, 64, 8)
      .as[(Long, Long, Long, String)].collect()
    val newTokens = corpusChunks.map(c =>
      if (c._2 == 0L) c._3 else c._3 - 8).sum
    val total = corpus.select(
      sum(size(graft.functions.TextAnalysis.wsTokens(col("text")))))
      .as[Long].head()
    assert(newTokens == total)
  }

  test("decontamination flags exactly the docs overlapping the benchmark") {
    val bench = Seq((100L, "alpha beta gamma delta epsilon zeta"))
      .toDF("doc_id", "text")
    val docs = Seq(
      (1L, "x alpha beta gamma delta y"),     // shares 2 shingles
      (2L, "alpha beta unrelated words here"), // shares 0 (no full 3-gram run)
      (3L, "totally different content here now"),
    ).toDF("doc_id", "text")
    val r = CorpusOps.decontaminate(docs, bench, n = 3, minShared = 2)
      .as[(Long, Long, Long)].collect()
    assert(r.toSeq == Seq((1L, 100L, 2L)))
    // corpus query returns overlaps and the benchmark plan broadcasts
    val q = CorpusOps.decontaminateQuery(corpus)
    assert(q.count() > 0)
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"))
  }

  test("topicTag: sorted distinct topics, hit counts, unmatched absent, " +
    "broadcast dictionary") {
    val tax = Seq(("b_topic", "cat"), ("a_topic", "dog"),
      ("a_topic", "wolf")).toDF("topic", "keyword")
    val docs = Seq(
      (1L, "cat dog cat bird"), // both topics; 3 keyword hits
      (2L, "wolf wolf"),        // a_topic only, twice
      (3L, "bird fish"),        // no match -> absent
    ).toDF("doc_id", "text")
    val r = CorpusOps.topicTag(docs, tax)
      .as[(Long, String, Long)].collect().toSeq
    // topic list is SORTED (a_topic before b_topic despite match order)
    assert(r == Seq((1L, "a_topic,b_topic", 3L), (2L, "a_topic", 2L)))
    // the harness dictionary broadcasts and the rare 'dup' topic only
    // tags some docs
    val q = CorpusOps.topicTagQuery(corpus)
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"))
    val withDup = q.filter(col("topics").contains("dedup")).count()
    assert(withDup > 0 && withDup < q.count())
  }

  test("topicTagPhrases: multi-word hits, overlaps count per position, " +
    "one scan") {
    val tax = Seq(("t_pair", "a a"), ("t_word", "b")).toDF("topic", "keyword")
    val docs = Seq(
      (1L, "a a a b"),  // "a a" at positions 1 and 2 (overlap), "b" once
      (2L, "a b a"),    // "b" only (no adjacent a pair)
      (3L, "c c"),      // no match -> absent
    ).toDF("doc_id", "text")
    val r = CorpusOps.topicTagPhrases(docs, tax)
      .as[(Long, String, Long)].collect().toSeq
    assert(r == Seq((1L, "t_pair,t_word", 3L), (2L, "t_word", 1L)))
    // the harness query reads the corpus once: both length classes
    // ride one projection -> a single FileScan and a single Generate
    val q = CorpusOps.topicTagPhrasesQuery(corpus)
    val plan = q.queryExecution.executedPlan.toString
    assert("FileScan".r.findAllIn(plan).size == 1,
      s"phrase classes must share one corpus scan:\n$plan")
    assert("Generate".r.findAllIn(plan).size == 1,
      s"phrase classes must share one explode:\n$plan")
    assert(plan.contains("BroadcastHashJoin"))
  }

  test("trainNaiveBayes: hand-computed weights, marker bucket wins, " +
    "confusion exact, empty class fails loudly") {
    def lg2(x: Double) = math.log(x) / math.log(2)
    // pos docs carry "spam"; 6 pos tokens, 5 neg tokens, dim 64
    val ex = Seq(
      (1L, "spam a b", 1), (2L, "spam spam a", 1),
      (3L, "a b c", 0), (4L, "b c", 0),
    ).toDF("doc_id", "text", "y")
    val m = CorpusOps.trainNaiveBayes(ex)
    val rows = m.as[(Long, Long, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    // intercept: 2 vs 2 docs -> bias 0
    assert(rows(-1L) == ((2L, 2L, 0L)))
    // the spam bucket: c_pos=3, c_neg=0
    val spamBucket = ex.sparkSession.range(1).select(
      org.apache.spark.sql.functions.pmod(
        graft.functions.TextAnalysis.md5Hash60(lit("spam")), lit(64L)))
      .as[Long].head()
    val expW = math.round(10000.0 * (lg2(3 + 1) - lg2(6 + 64) -
      lg2(0 + 1) + lg2(5 + 64)))
    assert(rows(spamBucket) == ((3L, 0L, expW)))
    // counts conserve token totals
    assert(rows.filterKeys(_ >= 0).values.map(_._1).sum == 6L)
    assert(rows.filterKeys(_ >= 0).values.map(_._2).sum == 5L)
    // the fixture separates perfectly
    val conf = CorpusOps.naiveBayesConfusion(ex, m)
      .as[(Long, Long, Long)].collect().toSet
    assert(conf == Set((0L, 0L, 2L), (1L, 1L, 2L)))
    // one-class input fails loudly
    val oneClass = Seq((1L, "a", 1), (2L, "b", 1)).toDF("doc_id", "text", "y")
    intercept[Exception] {
      CorpusOps.trainNaiveBayes(oneClass).collect()
    }
  }

  test("NB marker probe on the corpus: marker bucket has the top " +
    "weight, no false positives") {
    val m = CorpusOps.trainNaiveBayesQuery(corpus).localCheckpoint()
    val dupBucket = spark.range(1).select(
      org.apache.spark.sql.functions.pmod(
        graft.functions.TextAnalysis.md5Hash60(lit("dup")), lit(64L)))
      .as[Long].head()
    val top = m.filter(col("bucket") >= 0)
      .orderBy(col("w_int").desc).select("bucket").as[Long].head()
    assert(top == dupBucket)
    val conf = CorpusOps.naiveBayesEvalQuery(corpus)
      .as[(Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(conf.getOrElse((0L, 1L), 0L) == 0L) // no false positives
    assert(conf.getOrElse((1L, 1L), 0L) >= 1L) // finds real markers
  }

  test("applyVocab: top-K cut deterministic, OOV -> <unk>, counts audit") {
    // counts: a=2, b=2, c=2, d=1; top-2 by (cnt DESC, word) = a, b
    val docs = Seq((1L, "a a b c"), (2L, "b c d"))
      .toDF("doc_id", "text")
    val r = CorpusOps.applyVocab(docs, topK = 2)
      .as[(Long, String, Long, Long)].collect().toSeq
    assert(r == Seq(
      (1L, "a a b <unk>", 4L, 1L),
      (2L, "b <unk> <unk>", 3L, 2L)))
    // full-vocabulary cut is the identity rewrite, zero unks
    val full = CorpusOps.applyVocab(corpus, topK = 1000)
    assert(full.filter(col("n_unk") =!= 0L).isEmpty)
    val orig = corpus.select(col("doc_id"),
      array_join(expr("regexp_extract_all(text, '\\\\S+', 0)"), " ")
        .as("norm"))
    assert(full.join(orig, "doc_id")
      .filter(col("unk_text") =!= col("norm")).isEmpty)
  }

  test("corpusDiff: all four statuses with exact membership") {
    val before = Seq((1L, "x"), (2L, "y"), (3L, "z")).toDF("doc_id", "text")
    val after = Seq((2L, "y"), (3L, "z2"), (4L, "w")).toDF("doc_id", "text")
    val r = CorpusOps.corpusDiff(before, after)
      .as[(String, Long, Long, Long)].collect().toSeq
    assert(r == Seq(
      ("added", 1L, 4L, 4L), ("changed", 1L, 3L, 3L),
      ("removed", 1L, 1L, 1L), ("same", 1L, 2L, 2L)))
    // the harness split binds every status on the corpus
    val q = CorpusOps.corpusDiffQuery(corpus)
      .select("status").as[String].collect().toSet
    assert(q == Set("added", "removed", "changed", "same"))
  }

  test("preferencePairs: heap plan == window witness, margins positive, " +
    "partial aggregation pinned") {
    val got = CorpusOps.preferencePairs(corpus, k = 5)
    // in-repo window-form witness (the oracle's shape)
    val scored = corpus
      .select(col("source"), col("doc_id"),
        expr("explode(regexp_extract_all(text, '\\\\S+', 0))").as("word"))
      .select(col("source"), col("doc_id"),
        pmod(graft.functions.TextAnalysis.md5Hash60(col("word")),
          lit(1024L)).as("bucket"))
      .join(CorpusOps.linearModelWeights(spark, 1024), "bucket")
      .groupBy("source", "doc_id").agg(sum("w_int").as("s_int"))
    val wB = org.apache.spark.sql.expressions.Window.partitionBy("source")
      .orderBy(col("s_int").desc, col("doc_id").asc)
    val wR = org.apache.spark.sql.expressions.Window.partitionBy("source")
      .orderBy(col("s_int").asc, col("doc_id").asc)
    val b = scored.withColumn("rn", row_number().over(wB))
      .filter(col("rn") <= 5)
      .select(col("source"), col("rn"), col("doc_id").as("chosen_doc"),
        col("s_int").as("s_c"))
    val r = scored.withColumn("rn", row_number().over(wR))
      .filter(col("rn") <= 5)
      .select(col("source"), col("rn"),
        col("doc_id").as("rejected_doc"), col("s_int").as("s_r"))
    val want = b.join(r, Seq("source", "rn"))
      .filter(col("s_c") > col("s_r"))
      .select(col("source"), col("rn").cast("long").as("pair_idx"),
        col("chosen_doc"), col("rejected_doc"),
        (col("s_c") - col("s_r")).as("margin"))
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
    assert(got.filter(col("margin") <= 0).isEmpty)
    // the heap partial-aggregates map-side (the window form cannot)
    val plan = got.queryExecution.executedPlan.toString
    assert(plan.contains("partial_graft_top_k"),
      s"best/worst heaps must partial-aggregate:\n$plan")
  }

  test("bloom decontamination: identical output, codegen probe, real pruning") {
    // identical to the exact operator on the harness corpus (FPs are
    // removed by the verify join) — the oracle-equality claim, locally
    val exact = CorpusOps.decontaminateQuery(corpus)
    val bloom = CorpusOps.decontaminateBloomQuery(corpus)
    assert(exact.exceptAll(bloom).isEmpty && bloom.exceptAll(exact).isEmpty)
    assert(bloom.count() == exact.count() && bloom.count() > 0)
    // the probe is the codegen'd catalyst predicate, not a UDF
    val plan = bloom.queryExecution.executedPlan.toString
    assert(plan.contains("might_contain"), "bloom probe missing from plan")
    assert(!plan.contains("BatchEvalPython") && !plan.contains("ScalaUDF"))
    // pruning: the pre-filter must drop most of the (clean) corpus
    // shingle stream before the join — the whole point of the filter
    val docs = corpus.filter(pmod(col("doc_id"), lit(97)) =!= 0)
    val bench = corpus.filter(pmod(col("doc_id"), lit(97)) === 0)
    val docsSh = graft.operators.Dedup.shingleIndex(docs, 3)
    val allSh = docsSh.count()
    val kept = docsSh.filter(CorpusOps.shingleBloomProbe(bench, 3)).count()
    assert(kept * 2 < allSh,
      s"bloom kept $kept of $allSh corpus shingles — no pruning")
  }

  test("PII redaction scrubs emails and phones, counts match") {
    val df = Seq(
      (1L, "mail me at a.b+c@test-x.org or call 555-123-4567 now"),
      (2L, "no pii here"),
      (3L, "two mails x@y.io z@w.ai and 111-222-3333 999-888-7777"),
    ).toDF("doc_id", "text")
    val r = CorpusOps.redactPii(df)
      .select("doc_id", "n_emails", "n_phones", "clean")
      .as[(Long, Int, Int, String)].collect().map(t => t._1 -> t).toMap
    assert(r(1L)._2 == 1 && r(1L)._3 == 1)
    assert(r(1L)._4 == "mail me at <EMAIL> or call <PHONE> now")
    assert(r(2L) == ((2L, 0, 0, "no pii here")))
    assert(r(3L)._2 == 2 && r(3L)._3 == 2)
    assert(!r.values.exists(t => t._4.contains("@") || t._4.matches(".*\\d{3}-\\d{3}-\\d{4}.*")))
  }

  test("piiQuery plants and scrubs exactly one email and phone per doc") {
    val q = CorpusOps.piiQuery(corpus)
    assert(q.filter(col("n_emails") =!= 1 || col("n_phones") =!= 1).count() == 0)
    assert(q.count() == corpus.count())
  }

  test("theta source overlap: exact regime equals set arithmetic") {
    val got = CorpusOps.sourceOverlapSketch(corpus)
      .as[(String, String, Long, Long, Long, Long)].collect().toSeq
    // brute force: per-source distinct shingle sets on the driver
    // (sf0.001 is small), then literal set algebra
    val bySource = corpus
      .select(col("source"),
        explode(graft.functions.TextAnalysis.shingles(col("text"), 3))
          .as("sh"))
      .as[(String, String)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val want = bySource.keys.toSeq.sorted.combinations(2).map {
      case Seq(a, b) =>
        val (sa, sb) = (bySource(a), bySource(b))
        (a, b, sa.size.toLong, sb.size.toLong,
          (sa intersect sb).size.toLong, (sa union sb).size.toLong)
    }.toSeq
    assert(got.nonEmpty && got == want)
    // the measure is non-trivial on this corpus: some pair overlaps
    assert(got.exists(_._5 > 0), "no source pair shares any shingle")
  }

  test("theta sampling regime: bounded error; exact-regime slice union is exact") {
    // 100k distinct values through a k=256 sketch (far past nominal):
    // relative standard error ~1/sqrt(k-1) ~ 6.3%, assert 4 sigma
    val n = 100000L
    val est = spark.range(n)
      .agg(theta_sketch_estimate(
        theta_sketch_agg(col("id").cast("string"), 8)).as("e"))
      .as[Long].head()
    assert(math.abs(est - n).toDouble / n < 0.25,
      s"theta estimate $est vs $n out of bounds")
    // mergeability in the exact regime: union of 4 per-slice sketches
    // == the true distinct count, exactly — the persist-per-slice,
    // union-later shape sourceOverlapSketch's doc promises
    val viaSlices = spark.range(10000)
      .withColumn("slice", pmod(col("id"), lit(4)))
      .groupBy("slice")
      .agg(theta_sketch_agg(col("id").cast("string"), 16).as("sk"))
      .agg(theta_sketch_estimate(theta_union_agg(col("sk"), 16)).as("e"))
      .as[Long].head()
    assert(viaSlices == 10000L)
  }

  test("overlap answered from PERSISTED sketches matches the direct run") {
    // the 100 TB operating mode: build the per-source sketch relation
    // once, store it as plain parquet (binary column), answer overlap
    // later from the stored index with zero corpus access
    val dir = java.nio.file.Files
      .createTempDirectory("graft-theta-idx").toString
    CorpusOps.sourceSketches(corpus).write.mode("overwrite").parquet(dir)
    val fromStore = CorpusOps.overlapFromSketches(spark.read.parquet(dir))
    val direct = CorpusOps.sourceOverlapSketch(corpus)
    assert(direct.exceptAll(fromStore).isEmpty &&
      fromStore.exceptAll(direct).isEmpty)
  }

  test("theta union stays exact past the union default nominal (4096)") {
    // two sources x 3000 disjoint one-shingle docs: each side's sketch
    // is exact, and the UNION (6000 > the 4096 default nominal of
    // 2-arg theta_union) must be exact too — this is the fixture that
    // catches a union expression not inheriting the operator's lgK
    // (caught live at the 10x rehearsal: n_union -1.7% while every
    // other column stayed exact)
    val docs = spark.range(6000).selectExpr(
      "id AS doc_id",
      "concat('tok', id, ' mid', id, ' end', id) AS text",
      "IF(id % 2 = 0, 'sa', 'sb') AS source")
    val got = CorpusOps.sourceOverlapSketch(docs)
      .as[(String, String, Long, Long, Long, Long)].head()
    assert(got == (("sa", "sb", 3000L, 3000L, 0L, 6000L)))
  }

  test("mergeSourceSketches: incremental fold == from-scratch build, " +
      "and the aggregate union inherits lgK past the default nominal") {
    // the delta-ingest shape: base and delta slices each sketch
    // themselves; the per-source union must answer overlap exactly as
    // one build over everything (shared shingles dedup across slices)
    val base = corpus.filter(col("doc_id") % 4 =!= 0)
    val delta = corpus.filter(col("doc_id") % 4 === 0)
    val merged = CorpusOps.overlapFromSketches(
      CorpusOps.mergeSourceSketches(Seq(
        CorpusOps.sourceSketches(base),
        CorpusOps.sourceSketches(delta))).localCheckpoint())
    val scratch = CorpusOps.sourceOverlapSketch(corpus)
    assert(merged.exceptAll(scratch).isEmpty &&
      scratch.exceptAll(merged).isEmpty)
    // the r5 union-nominal trap, aggregate form: 5000 distinct
    // shingles PER SOURCE split across slices exceed theta_union_agg's
    // default nominal (4096) — the fold must stay exact because it
    // inherits the build lgK
    val docs = spark.range(10000).selectExpr(
      "id AS doc_id",
      "concat('tok', id, ' mid', id, ' end', id) AS text",
      "IF(id % 2 = 0, 'sa', 'sb') AS source")
    val folded = CorpusOps.mergeSourceSketches(Seq(
      CorpusOps.sourceSketches(docs.filter(col("doc_id") < 5000)),
      CorpusOps.sourceSketches(docs.filter(col("doc_id") >= 5000))))
      .select(col("source"),
        theta_sketch_estimate(col("sk")).cast("long").as("e"))
      .as[(String, Long)].collect().toMap
    assert(folded == Map("sa" -> 5000L, "sb" -> 5000L))
  }

  test("model quality score: hand-recomputed on a tiny fixture") {
    val df = Seq((1L, "aa bb aa"), (2L, "cc"), (3L, "")).toDF("doc_id", "text")
    val got = CorpusOps.modelQualityScore(df, dim = 64, biasE4 = -500L)
      .as[(Long, Long, Double, Boolean)].collect().toSeq
    def wInt(word: String): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(word.getBytes("UTF-8")).map("%02x".format(_)).mkString
      val bucket = java.lang.Long.parseLong(hex.take(15), 16) % 64
      (bucket * 2654435761L) % 2001L - 1000L
    }
    val s1 = 2 * wInt("aa") + wInt("bb") - 500L
    val s2 = wInt("cc") - 500L
    val want = Seq(
      (1L, 3L, s1 / 10000.0, s1 > 0),
      (2L, 1L, s2 / 10000.0, s2 > 0))
    // doc 3 has no tokens -> no score row (matches the oracle's join)
    assert(got.map(r => (r._1, r._2, r._4)) == want.map(r => (r._1, r._2, r._4)))
    got.zip(want).foreach { case (g, w) =>
      assert(math.abs(g._3 - w._3) < 1e-9) }
  }

  test("model quality score is partition-invariant (integer sums)") {
    val a = CorpusOps.modelQualityScore(corpus)
    val b = CorpusOps.modelQualityScore(corpus.repartition(13))
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }

  test("dsirLogRatios: hand-computed add-one log ratios on a 2-doc corpus") {
    // target doc1 = "x x", raw-only doc2 = "y":
    //   vocab x: rcnt 2, tcnt 2; y: rcnt 1, tcnt 0; rtot 3, ttot 2, V 2
    //   score(doc1) = log2((2+1)/(2+2)) - log2((2+1)/(3+2)) = log2(5/4)
    //   score(doc2) = log2((0+1)/(2+2)) - log2((1+1)/(3+2)) = log2(5/8)
    val docs = Seq((1L, "x x", "en"), (2L, "y", "de"))
      .toDF("doc_id", "text", "lang")
    val got = CorpusOps.dsirLogRatios(docs, col("lang") === "en")
      .as[(Long, Long, Double)].collect().toSeq
    def r4(x: Double) = math.round(x * 10000) / 10000.0
    assert(got == Seq(
      (1L, 2L, r4(math.log(5.0 / 4) / math.log(2))),
      (2L, 1L, r4(math.log(5.0 / 8) / math.log(2)))))
  }

  test("dsirLogRatios: target-like docs outrank off-target, layout-stable") {
    val scored = CorpusOps.dsirLogRatios(corpus, col("lang") === "en")
    val byLang = scored.join(corpus.select("doc_id", "lang"), "doc_id")
      .groupBy("lang").agg(avg("dsir_logratio").as("m"))
      .as[(String, Double)].collect().toMap
    // the target slice must score higher on average than every other
    // lang — the ranking signal DSIR selection relies on
    byLang.filter(_._1 != "en").foreach { case (l, m) =>
      assert(byLang("en") > m, s"en ${byLang("en")} !> $l $m") }
    val again = CorpusOps.dsirLogRatios(corpus.repartition(13),
      col("lang") === "en")
    assert(scored.exceptAll(again).isEmpty && again.exceptAll(scored).isEmpty)
  }

  test("dsirTopK: rank agrees with the full weight relation") {
    val top = CorpusOps.dsirTopK(corpus, col("lang") === "en", 25)
      .as[(Long, Long, Long, Double)].collect()
    assert(top.length == 25 && top.map(_._1).toSeq == (1L to 25L))
    val want = CorpusOps.dsirLogRatios(corpus, col("lang") === "en")
      .orderBy(col("dsir_logratio").desc, col("doc_id").asc).limit(25)
      .select("doc_id").as[Long].collect().toSeq
    assert(top.map(_._2).toSeq == want)
    // scores are non-increasing down the ranking
    assert(top.map(_._4).toSeq.reverse == top.map(_._4).toSeq.reverse.sorted)
  }

  /** Brute-force md5Hash60 (first 15 hex digits of md5, base-16). */
  private def h60(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    java.lang.Long.parseLong(
      d.map(b => f"$b%02x").mkString.take(15), 16)
  }

  test("weightedSample: key is the exact max-of-w hash race, layout-" +
    "deterministic, and weight raises inclusion odds") {
    val docs = corpus.withColumn("wt0",
      when(col("doc_id") % 5 === 0, 10L).otherwise(1L))
    val s1 = CorpusOps.weightedSample(docs, k = 20, col("wt0"))
    val rows = s1.as[(Long, Long, Long)].collect()
    assert(rows.length == 20 && rows.map(_._1).toSeq == rows.map(_._1).toSeq.sorted)
    // keys replay exactly as max_{j<=w} md5Hash60(id:j)
    for ((id, wt, key) <- rows)
      assert(key == (1L to wt).map(j => h60(s"$id:$j")).max)
    // deterministic under physical layout
    val s2 = CorpusOps.weightedSample(docs.repartition(11), 20, col("wt0"))
    assert(s1.exceptAll(s2).isEmpty && s2.exceptAll(s1).isEmpty)
    // weight-10 docs are 1/5 of the corpus but hold ~10x the per-doc
    // odds: they must dominate the sample (p(win) ~ 10/14 per slot;
    // binomial slack leaves >= 8 of 20 a safe floor)
    assert(rows.count(_._2 == 10L) >= 8,
      s"heavy docs under-represented: ${rows.count(_._2 == 10L)}/20")
    // out-of-range weight fails the job loudly, at the row
    val bad = corpus.withColumn("wt0", lit(0L))
    val ex = intercept[Exception] {
      CorpusOps.weightedSample(bad, 5, col("wt0")).collect()
    }
    assert(ex.getMessage.contains("weightedSample") ||
      Option(ex.getCause).exists(_.getMessage.contains("weightedSample")))
  }

  test("bm25: hand-computed scores on a 3-doc corpus") {
    // N = 3, dl = (4, 4, 2), avgdl = 10/3. Query {x, y}:
    //   df(x) = 2 (docs 1, 2), df(y) = 1 (doc 1).
    val docs = Seq(
      (1L, "x y x b"), (2L, "x c c c"), (3L, "d d"))
      .toDF("doc_id", "text")
    val got = CorpusOps.bm25(docs, terms = Seq("x", "y"), k = 3)
      .as[(Long, Double)].collect().toMap
    val k1 = 1.2; val b = 0.75; val avgdl = 10.0 / 3
    def idf(df: Int) = math.log(1 + (3 - df + 0.5) / (df + 0.5))
    def w(tf: Long, dl: Long, df: Int) = idf(df) *
      (tf * (k1 + 1)) / (tf + k1 * (1 - b + b * dl / avgdl))
    def r4(x: Double) = BigDecimal(x)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got.keySet == Set(1L, 2L))
    assert(got(1L) == r4(w(2, 4, 2) + w(1, 4, 1)))
    assert(got(2L) == r4(w(1, 4, 2)))
    // doc 3 holds no query term: absent, not zero-scored
  }

  test("bm25: dl counts ALL tokens, top-k cuts on rounded score") {
    // docs 1 and 2 have identical query-term counts; doc 2 is longer,
    // so BM25's length normalization must rank doc 1 above it — that
    // only happens if dl is computed before the term filter.
    val docs = Seq(
      (1L, "x a"), (2L, "x a a a a a a a"), (3L, "x b"))
      .toDF("doc_id", "text")
    val r = CorpusOps.bm25(docs, terms = Seq("x"), k = 2)
      .as[(Long, Double)].collect().toMap
    // k = 2 keeps the two short docs (tie on score, doc_id tie-break
    // keeps 1 and 3 over nothing — both score equal and above doc 2)
    assert(r.keySet == Set(1L, 3L) && r(1L) == r(3L))
    val layout = CorpusOps.bm25(corpus, Seq("spark", "window"), k = 10)
    val layout2 = CorpusOps.bm25(corpus.repartition(17),
      Seq("spark", "window"), k = 10)
    assert(layout.collect().toSeq == layout2.collect().toSeq)
  }

  test("lineDedup: planted banner lines drop everywhere, order and " +
    "empty docs preserved") {
    val banner = "SUBSCRIBE TO OUR NEWSLETTER"
    val docs = Seq(
      (1L, s"$banner\nalpha beta\ngamma"),
      (2L, s"delta\n$banner\nepsilon"),
      (3L, s"zeta\n$banner"),
      (4L, banner), // only boilerplate: survives empty
      (5L, "eta\ntheta")).toDF("doc_id", "text")
    val got = CorpusOps.lineDedup(docs, maxCount = 3L)
      .as[(Long, Long, Long, String)].collect().toSeq
    assert(got == Seq(
      (1L, 3L, 2L, "alpha beta\ngamma"),
      (2L, 3L, 2L, "delta\nepsilon"),
      (3L, 2L, 1L, "zeta"),
      (4L, 1L, 0L, ""),
      (5L, 2L, 2L, "eta\ntheta")))
    // threshold is total occurrences: a doc repeating its own line
    // 3x trips the cap even though only one doc carries it
    val selfRep = Seq((1L, "spam\nspam\nspam\nkeep"), (2L, "other"))
      .toDF("doc_id", "text")
    val s = CorpusOps.lineDedup(selfRep, maxCount = 3L)
      .as[(Long, Long, Long, String)].collect().toSeq
    assert(s == Seq((1L, 4L, 1L, "keep"), (2L, 1L, 1L, "other")))
    // determinism under layout on the real corpus (lined twin)
    val lined = corpus.withColumn("text",
      regexp_replace(col("text"), lit(" value "), lit(" value\n")))
    val l1 = CorpusOps.lineDedup(lined, maxCount = 3L).collect().toSeq
    val l2 = CorpusOps.lineDedup(lined.repartition(11), maxCount = 3L)
      .collect().toSeq
    assert(l1 == l2 && l1.nonEmpty)
    // the harness threshold BINDS on the corpus: some doc loses a line
    assert(l1.map(_.getLong(2)).sum < l1.map(_.getLong(1)).sum)
  }

  test("applyChangeset: upserts replace, deletes remove, untouched pass") {
    val snap = Seq((1L, "a", "s"), (2L, "b", "s"), (3L, "c", "s"),
      (4L, "d", "s")).toDF("doc_id", "text", "source")
    val changes = Seq(
      (2L, "upsert", "B2", "s2"),   // replace
      (3L, "delete", null, null),   // remove
      (9L, "upsert", "new", "s9")). // insert
      toDF("doc_id", "op", "text", "source")
    val got = CorpusOps.applyChangeset(snap, changes)
      .as[(Long, String, String)].collect().sortBy(_._1).toSeq
    assert(got == Seq((1L, "a", "s"), (2L, "B2", "s2"),
      (4L, "d", "s"), (9L, "new", "s9")))
  }

  test("applyChangeset is idempotent: applying the same changeset twice = once") {
    val snap = corpus.select("doc_id", "text", "source")
    val changes = corpus.filter(col("doc_id") % 11 === 0)
      .select(col("doc_id"), lit("upsert").as("op"),
        concat(col("text"), lit(" v2")).as("text"), col("source"))
      .unionByName(corpus.filter(col("doc_id") % 13 === 0 &&
          col("doc_id") % 11 =!= 0)
        .select(col("doc_id"), lit("delete").as("op"),
          lit(null).cast("string").as("text"),
          lit(null).cast("string").as("source")))
    val once = CorpusOps.applyChangeset(snap, changes)
    val twice = CorpusOps.applyChangeset(once, changes)
    val a = once.orderBy("doc_id").collect().map(_.toSeq).toSeq
    val b = twice.orderBy("doc_id").collect().map(_.toSeq).toSeq
    assert(a == b && a.nonEmpty)
  }

  test("tokenBudgetSelect: a larger budget strictly extends a smaller one") {
    val small = CorpusOps.tokenBudgetSelect(corpus, 3000L)
      .select("doc_id").as[Long].collect().toSet
    val large = CorpusOps.tokenBudgetSelect(corpus, 9000L)
      .select("doc_id").as[Long].collect().toSet
    assert(small.nonEmpty && small.subsetOf(large) && large.size > small.size)
  }

  test("changesetQuery: both paths bind on the corpus; merge is consistent") {
    val n = corpus.count()
    val rows = CorpusOps.changesetQuery(corpus)
      .as[(Long, String, String)].collect()
    val ids = corpus.select("doc_id").as[Long].collect().toSet
    val deleted = ids.filter(i => i % 13 == 0 && i % 11 != 0)
    val edited = ids.filter(_ % 11 == 0)
    assert(deleted.nonEmpty && edited.nonEmpty) // both paths bind
    assert(rows.length == n - deleted.size)
    assert(rows.map(_._1).toSet == ids -- deleted)
    // edited docs changed fingerprint, untouched kept theirs
    val baseFp = corpus.selectExpr("doc_id", "md5(text)")
      .as[(Long, String)].collect().toMap
    rows.foreach { case (id, _, fp) =>
      if (edited(id)) assert(fp != baseFp(id)) else assert(fp == baseFp(id))
    }
  }

  test("tokenBudgetSelect: greedy by score, boundary doc kept, budget binds") {
    val budget = 5000L
    val rows = CorpusOps.tokenBudgetSelect(corpus, budget)
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(rows.nonEmpty)
    // the budget BINDS on the corpus (not everything selected)
    assert(rows.length < corpus.count())
    // greedy order: scores non-increasing, cum_before = running total
    assert(rows.map(_._3) == rows.map(_._3).sorted.reverse)
    var cum = 0L
    rows.foreach { case (_, nt, _, before) =>
      assert(before == cum && before < budget)
      cum += nt
    }
    // boundary rule: the last doc may cross the line, so the total is
    // >= budget but the total BEFORE the last doc is under it
    assert(cum >= budget || rows.length == corpus.count())
    // brute-force witness on the same integer scores
    val scored = corpus.selectExpr("doc_id",
        "CAST(size(regexp_extract_all(text, '\\\\S+', 0)) AS LONG) AS nt",
        "CAST(size(array_distinct(regexp_extract_all(text, '\\\\S+', 0))) AS LONG) AS nd")
      .selectExpr("doc_id", "nt", "nd * 10000 DIV nt AS score_bp")
      .as[(Long, Long, Long)].collect()
    val greedy = scored.sortBy(t => (-t._3, t._1))
      .scanLeft((0L, 0L, 0L, 0L)) { case ((_, _, _, acc), (id, nt, sc)) =>
        (id, nt, sc, acc + nt) }
      .drop(1)
      .takeWhile { case (_, nt, _, cumAfter) => cumAfter - nt < budget }
      .map { case (id, nt, sc, cumAfter) => (id, nt, sc, cumAfter - nt) }
    assert(rows == greedy.toSeq)
    // deterministic under layout
    val again = CorpusOps.tokenBudgetSelect(corpus.repartition(13), budget)
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(again == rows)
  }

  test("phraseSearch: overlapping matches, hand positions, and " +
      "self-join witness parity on the corpus") {
    // overlapping matches both count: 'a b a b a' has 'a b a' at 0, 2
    val hand = Seq(
      (1L, "a b a b a", "en", "s", 9L),
      (2L, "x a b a y", "en", "s", 9L),
      (3L, "a b b a x", "en", "s", 9L), // no match
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val got = CorpusOps.phraseSearch(hand, Seq("a", "b", "a"))
      .as[(Long, Long, Long)].collect().toSeq
    assert(got == Seq((1L, 2L, 0L), (2L, 1L, 1L)))
    // corpus: lead-window formulation == plain-Scala sliding witness
    val phrase = Seq("hash", "row")
    val want = corpus.select("doc_id", "text").as[(Long, String)]
      .collect().flatMap { case (id, t) =>
        val toks = t.split("\\s+").filter(_.nonEmpty)
        val hits = toks.sliding(2).zipWithIndex
          .collect { case (w, i) if w.toSeq == phrase => i }.toSeq
        if (hits.isEmpty) None
        else Some((id, hits.size.toLong, hits.min.toLong))
      }.sortBy(_._1).toSeq
    val gotC = CorpusOps.phraseSearch(corpus, phrase)
      .as[(Long, Long, Long)].collect().toSeq
    assert(gotC == want)
    assert(gotC.nonEmpty, "the corpus should contain the test phrase")
    // the stream-safe pure projection is answer-identical to the
    // window form — on the corpus AND on the overlap fixture
    assert(CorpusOps.phraseMatchProjected(corpus, phrase)
      .as[(Long, Long, Long)].collect().toSeq == gotC)
    assert(CorpusOps.phraseMatchProjected(hand, Seq("a", "b", "a"))
      .as[(Long, Long, Long)].collect().toSeq == got)
  }

  test("proximitySearch: range window == brute-force pair witness") {
    val hand = Seq(
      (1L, "h x x r h", "en", "s", 9L), // h@0-r@3 out(>3)? |3-0|=3 in; h@4-r@3 in
      (2L, "r x x x h", "en", "s", 9L), // |4-0|=4 out
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val gotH = CorpusOps.proximitySearch(hand, "h", "r", window = 3)
      .as[(Long, Long, Long)].collect().toSeq
    assert(gotH == Seq((1L, 2L, 2L)))
    val (anchor, near, ws) = ("hash", "row", 3)
    val want = corpus.select("doc_id", "text").as[(Long, String)]
      .collect().flatMap { case (id, t) =>
        val toks = t.split("\\s+").filter(_.nonEmpty).zipWithIndex
        val as = toks.collect { case (w, i) if w == anchor => i }
        val ns = toks.collect { case (w, i) if w == near => i }
        val perAnchor = as.map(a => ns.count(n => math.abs(n - a) <= ws))
          .filter(_ > 0)
        if (perAnchor.isEmpty) None
        else Some((id, perAnchor.length.toLong, perAnchor.sum.toLong))
      }.sortBy(_._1).toSeq
    val got = CorpusOps.proximitySearch(corpus, anchor, near, ws)
      .as[(Long, Long, Long)].collect().toSeq
    assert(got == want)
    assert(got.nonEmpty, "the corpus should contain near pairs")
  }

  test("positionalPostings: ordered positions, occurrence counts") {
    val hand = Seq(
      (1L, "b a b b", "en", "s", 7L),
      (2L, "a a", "en", "s", 3L),
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val got = CorpusOps.positionalPostings(hand, Seq("a", "b"))
      .as[(String, Long, Long, String)].collect().toSeq
    assert(got == Seq(
      ("a", 1L, 1L, "1"), ("a", 2L, 2L, "0,1"),
      ("b", 1L, 3L, "0,2,3")))
  }
}
