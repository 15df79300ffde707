package graft

import graft.operators.TrainingOps
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class TrainingOpsSpec extends SparkSpec {
  import spark.implicits._

  private def corpus = spark.read.parquet(s"$sfDir/documents.parquet")

  private def docsDf(rows: (Long, String)*) =
    rows.toDF("doc_id", "text").withColumn("source", lit("s"))

  // ---- passages / passage dedup --------------------------------------

  test("passages: token conservation, window sizing, count") {
    val p = TrainingOps.passages(corpus, passageTokens = 16)
    // rebuilding every doc from ALL its passages restores the token
    // stream exactly
    val rebuilt = p.groupBy("doc_id")
      .agg(array_join(transform(
        sort_array(collect_list(struct(col("p_idx"), col("p_text")))),
        s => s.getField("p_text")), " ").as("again"))
    val orig = corpus.select(col("doc_id"),
      array_join(expr("regexp_extract_all(text, '\\\\S+', 0)"), " ")
        .as("norm"))
    assert(rebuilt.join(orig, "doc_id")
      .filter(col("again") =!= col("norm")).isEmpty)
    // every passage is 1..16 tokens; only a doc's LAST passage may be
    // short
    val sized = p.withColumn("n", size(split(col("p_text"), " ")))
    assert(sized.filter(col("n") < 1 || col("n") > 16).isEmpty)
    val maxIdx = p.groupBy("doc_id").agg(max("p_idx").as("m"))
    assert(sized.join(maxIdx, "doc_id")
      .filter(col("n") < 16 && col("p_idx") =!= col("m")).isEmpty)
  }

  test("passageDedup keeps exactly the first occurrence per fingerprint") {
    // doc 1: A B; doc 2: B C; doc 3: A (4-token windows)
    val a = "a1 a2 a3 a4"; val b = "b1 b2 b3 b4"; val c = "c1 c2 c3 c4"
    val d = TrainingOps.passageDedup(
      docsDf((1L, s"$a $b"), (2L, s"$b $c"), (3L, a)), passageTokens = 4)
    val kept = d.filter(col("keep")).select("doc_id", "p_idx")
      .as[(Long, Long)].collect().toSet
    assert(kept == Set((1L, 0L), (1L, 1L), (2L, 1L)))
    // keep flags are a property of content+id, not physical layout
    val d2 = TrainingOps.passageDedup(
      docsDf((1L, s"$a $b"), (2L, s"$b $c"), (3L, a)).repartition(7),
      passageTokens = 4)
    assert(d.exceptAll(d2).isEmpty && d2.exceptAll(d).isEmpty)
  }

  test("passageRebuild drops repeated passages, keeps order, empties " +
      "full duplicates") {
    val a = "a1 a2 a3 a4"; val b = "b1 b2 b3 b4"; val c = "c1 c2 c3 c4"
    val r = TrainingOps.passageRebuild(
      docsDf((1L, s"$a $b"), (2L, s"$b $c"), (3L, a)), passageTokens = 4)
      .as[(Long, Long, Long, String)].collect()
      .map(t => t._1 -> ((t._2, t._3, t._4))).toMap
    assert(r(1L) == ((2L, 2L, s"$a $b")))     // untouched, order kept
    assert(r(2L) == ((2L, 1L, c)))            // duplicate b dropped
    assert(r(3L) == ((1L, 0L, "")))           // fully duplicate -> empty
  }

  test("passage dedup on the corpus: kept tokens = distinct passages") {
    val d = TrainingOps.passageDedup(corpus, passageTokens = 16)
    val nKept = d.filter(col("keep")).count()
    val nDistinct = TrainingOps.passages(corpus, 16)
      .select("p_text").distinct().count()
    assert(nKept == nDistinct)
  }

  // ---- shared winnowed fingerprints ----------------------------------

  test("sharedFingerprints finds cross-doc repeats and only those") {
    val shared = "zqxjkwvz" // 8 chars -> one gram, unique spelling
    val docs = docsDf(
      (1L, s"unique-one $shared tail-one"),
      (2L, s"other-text $shared tail-two"),
      (3L, "nothing in common here at all"))
    val fp = TrainingOps.sharedFingerprints(docs, k = 8, w = 4)
    // every reported fp really does appear in >= 2 docs
    val out = fp.as[(Long, Long, Long, Long, Long)].collect()
    assert(out.nonEmpty && out.forall(_._2 >= 2))
    // the planted shared substring is among them: doc ids 1 and 2
    assert(out.exists(r => r._4 == 1L && r._5 == 2L))
    // doc 3 shares no 8-gram with anyone -> never appears as min/max
    assert(!out.exists(r => r._4 == 3L || r._5 == 3L))
  }

  // ---- unigram surprisal ---------------------------------------------

  test("lmSurprisal matches the hand-computed unigram model") {
    def lg2(x: Double) = math.log(x) / math.log(2)
    // vocab: a=3, b=2, total=5
    val d1 = (3 * (lg2(5) - lg2(3)) + 1 * (lg2(5) - lg2(2))) / 4
    val d2 = lg2(5) - lg2(2)
    val got = TrainingOps.lmSurprisal(docsDf((1L, "a a a b"), (2L, "b")))
      .as[(Long, Long, Double)].collect().map(t => t._1 -> (t._2, t._3))
      .toMap
    assert(got(1L)._1 == 4L && got(2L)._1 == 1L)
    assert(math.abs(got(1L)._2 - d1) < 1e-3)
    assert(math.abs(got(2L)._2 - d2) < 1e-3)
    assert(got.size == 2)
  }

  test("lmSurprisal is layout-invariant and bounded") {
    val s1 = TrainingOps.lmSurprisal(corpus)
    val s2 = TrainingOps.lmSurprisal(corpus.repartition(13))
    assert(s1.exceptAll(s2).isEmpty && s2.exceptAll(s1).isEmpty)
    // 0 <= bits <= log2(total tokens): uniform-rarest bound
    val total = corpus.select(
      sum(size(expr("regexp_extract_all(text, '\\\\S+', 0)"))))
      .as[Long].head()
    val bound = math.log(total.toDouble) / math.log(2)
    assert(s1.filter(col("bits_per_tok") < 0 ||
      col("bits_per_tok") > bound).isEmpty)
  }

  test("lmBigramBits matches the hand-computed add-one bigram model") {
    def lg2(x: Double) = math.log(x) / math.log(2)
    // docs: "a b b", "b a", "c". Unigram vocab {a,b,c} -> V=3 (the
    // bigram-less doc 3 still counts into V). Global bigrams each
    // cnt=1; contexts a->1, b->2.
    val got = TrainingOps.lmBigramBits(
      docsDf((1L, "a b b"), (2L, "b a"), (3L, "c")))
      .as[(Long, Long, Double)].collect().map(t => t._1 -> (t._2, t._3))
      .toMap
    // doc 1: (a,b): log2(1+3)-log2(2)=1; (b,b): log2(2+3)-log2(2)
    val d1 = (1.0 + (lg2(5) - lg2(2))) / 2
    val d2 = lg2(5) - lg2(2)
    assert(got.size == 2) // doc 3 has no bigram to score
    assert(got(1L)._1 == 2L && got(2L)._1 == 1L)
    assert(math.abs(got(1L)._2 - d1) < 1e-3)
    assert(math.abs(got(2L)._2 - d2) < 1e-3)
  }

  test("perplexityBuckets == the single-window ntile it refuses to plan") {
    // the distributed rank + integer ntile arithmetic must reproduce
    // SQL ntile exactly, remainder distribution included — pin against
    // Spark's own (single-partition) window on the corpus, which has
    // n % 3 != 0 scoreable docs at sf0.001
    val bits = TrainingOps.lmBigramBits(corpus)
    val w = Window.orderBy(col("bits_per_big").asc, col("doc_id").asc)
    val want = bits.withColumn("ppl_bucket", ntile(3).over(w).cast("long"))
    val got = TrainingOps.perplexityBuckets(corpus, buckets = 3)
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
    // and it is layout-invariant
    val got13 = TrainingOps.perplexityBuckets(corpus.repartition(13))
    assert(got13.exceptAll(got).isEmpty && got.exceptAll(got13).isEmpty)
  }

  test("perplexityBuckets: more buckets than rows degenerates to rank") {
    val got = TrainingOps.perplexityBuckets(
      docsDf((1L, "a b b"), (2L, "b a"), (3L, "c")), buckets = 5)
      .select("doc_id", "ppl_bucket").as[(Long, Long)].collect().toMap
    // 2 scoreable docs into 5 buckets: ntile gives ranks 1 and 2.
    // doc 1 ((1+log2(2.5))/2 ~ 1.16 bits) sorts below doc 2
    // (log2(2.5)+1 ~ 1.32 bits)
    assert(got == Map(1L -> 1L, 2L -> 2L))
  }

  // ---- token-budget mixture sampling ---------------------------------

  test("tokenBudgetSample: budgets bind, boundary doc kept, unlisted " +
      "sources excluded") {
    val weights = Map("src0" -> 4L, "src1" -> 3L, "src2" -> 2L,
      "src3" -> 1L)
    val out = TrainingOps.tokenBudgetSample(corpus, 3000L, weights)
    val per = out.groupBy("source")
      .agg(sum("n_tok").as("tot"), max("cum_tok").as("mx"),
        count("*").as("n"))
      .as[(String, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    val budgets = Map("src0" -> 1200L, "src1" -> 900L, "src2" -> 600L,
      "src3" -> 300L)
    // only listed sources appear
    assert(per.keySet == budgets.keySet)
    budgets.foreach { case (s, b) =>
      val (tot, mx, _) = per(s)
      assert(tot == mx, s)
      // quota met (the boundary doc crossed the line) but never met
      // before the last doc: dropping it would leave the budget short
      val lastTok = out.filter(col("source") === s)
        .orderBy(desc("cum_tok")).select("n_tok").as[Long].head()
      assert(tot >= b, s)
      assert(tot - lastTok < b, s)
    }
    // layout invariance
    val out2 = TrainingOps.tokenBudgetSample(corpus.repartition(11),
      3000L, weights)
    assert(out.exceptAll(out2).isEmpty && out2.exceptAll(out).isEmpty)
  }

  // ---- training shards ------------------------------------------------

  test("trainingShards: distributed rank == single-partition rank") {
    val got = TrainingOps.trainingShards(corpus, shardSize = 100)
    // independent witness: the naive unpartitioned window (fine at
    // test scale) must agree exactly with the range-partitioned rank
    val naive = corpus
      .select(col("doc_id"),
        size(expr("regexp_extract_all(text, '\\\\S+', 0)"))
          .cast("long").as("n_tok"),
        conv(substring(md5(col("doc_id").cast("string")), 1, 15), 16, 10)
          .cast("long").as("h"))
      .withColumn("rn",
        row_number().over(Window.orderBy(col("h"), col("doc_id")))
          .cast("long") - 1L)
      .select(col("doc_id"), expr("rn DIV 100").as("shard_id"),
        (col("rn") % 100).as("pos"), col("n_tok"))
    assert(got.exceptAll(naive).isEmpty && naive.exceptAll(got).isEmpty)
    // and it survives a hostile input layout
    val got2 = TrainingOps.trainingShards(corpus.repartition(17), 100)
    assert(got.exceptAll(got2).isEmpty && got2.exceptAll(got).isEmpty)
  }

  test("packSequences: conservation, full sequences, boundary splits") {
    val got = TrainingOps.packSequences(corpus, seqLen = 64)
    val rows = got.select("seq_id", "seq_off", "doc_id", "tok_start", "n_tok")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    val totalTok = corpus
      .select(sum(size(expr("regexp_extract_all(text, '\\\\S+', 0)"))
        .cast("long"))).as[Long].head()
    // token conservation: pieces partition the corpus token stream
    assert(rows.map(_._5).sum == totalTok)
    // every sequence except the last holds exactly seqLen tokens,
    // starting at offset 0 with contiguous pieces
    val bySeq = rows.groupBy(_._1).toSeq.sortBy(_._1)
    assert(bySeq.map(_._1) == (0L until bySeq.length).toSeq)
    bySeq.dropRight(1).foreach { case (_, ps) =>
      assert(ps.map(_._5).sum == 64L) }
    bySeq.foreach { case (_, ps) =>
      val sorted = ps.sortBy(_._2)
      assert(sorted.head._2 == 0L)
      sorted.sliding(2).foreach {
        case Seq(a, b) => assert(a._2 + a._5 == b._2)
        case _ => ()
      }
    }
    // docs longer than seqLen MUST split across sequences
    assert(rows.groupBy(_._3).exists(_._2.size > 1))
    // piece text token count matches the claimed n_tok
    val textOk = got.filter(
      size(expr("regexp_extract_all(piece_text, '\\\\S+', 0)")).cast("long")
        =!= col("n_tok")).count()
    assert(textOk == 0)
  }

  test("packSequences: distributed prefix sums == single-window witness") {
    val got = TrainingOps.packSequences(corpus, seqLen = 64)
      .select("seq_id", "seq_off", "doc_id", "tok_start", "n_tok")
    val naive = corpus
      .select(col("doc_id"),
        size(expr("regexp_extract_all(text, '\\\\S+', 0)"))
          .cast("long").as("n_tok"),
        conv(substring(md5(col("doc_id").cast("string")), 1, 15), 16, 10)
          .cast("long").as("h"))
      .filter(col("n_tok") > 0)
      .withColumn("cum0",
        coalesce(sum("n_tok").over(Window.orderBy(col("h"), col("doc_id"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("seq_id", explode(sequence(
        expr("cum0 DIV 64"), expr("(cum0 + n_tok - 1) DIV 64"))))
      .select(col("seq_id"),
        (greatest(col("cum0"), col("seq_id") * 64) - col("seq_id") * 64)
          .as("seq_off"),
        col("doc_id"),
        greatest(lit(0L), col("seq_id") * 64 - col("cum0")).as("tok_start"),
        (least(col("cum0") + col("n_tok"), (col("seq_id") + 1) * 64) -
          greatest(col("cum0"), col("seq_id") * 64)).as("n_tok"))
    assert(got.exceptAll(naive).isEmpty && naive.exceptAll(got).isEmpty)
    val got2 = TrainingOps.packSequences(corpus.repartition(17), seqLen = 64)
      .select("seq_id", "seq_off", "doc_id", "tok_start", "n_tok")
    assert(got.exceptAll(got2).isEmpty && got2.exceptAll(got).isEmpty)
  }

  test("curationPipeline: stage invariants hold end-to-end") {
    import graft.operators.{CorpusOps, Dedup}
    val out = TrainingOps.curationPipeline(corpus)
    val outDocs = out.select("doc_id").distinct()
      .as[Long].collect().toSet
    assert(outDocs.nonEmpty)
    // no benchmark doc ever reaches the output
    assert(outDocs.forall(_ % 97 != 0))
    // every output doc passed the quality gate...
    val passed = CorpusOps.qualityRules(
      corpus.filter(pmod(col("doc_id"), lit(97)) =!= 0))
      .filter(col("pass")).select("doc_id").as[Long].collect().toSet
    assert(outDocs.subsetOf(passed))
    // ...survived dedup (is its fingerprint's first occurrence)...
    val survivors = Dedup.dropDuplicatesKeepFirst(
      corpus.filter(pmod(col("doc_id"), lit(97)) =!= 0))
      .select("doc_id").as[Long].collect().toSet
    assert(outDocs.subsetOf(survivors))
    // ...and is not contaminated against the bench slice
    val contaminated = CorpusOps.decontaminateQuery(corpus)
      .select("doc_id").distinct().as[Long].collect().toSet
    assert(outDocs.intersect(contaminated).isEmpty)
    // packing invariant carries through: all sequences except the
    // last hold exactly 64 tokens
    val bySeq = out.select("seq_id", "n_tok").as[(Long, Long)].collect()
      .groupBy(_._1).toSeq.sortBy(_._1)
    bySeq.dropRight(1).foreach { case (_, ps) =>
      assert(ps.map(_._2).sum == 64L) }
  }

  test("curationFunnel rows equal the stage relations computed directly") {
    import graft.operators.{CorpusOps, Dedup}
    val f = TrainingOps.curationFunnel(corpus)
      .as[(Int, String, Long, Long, Long)].collect()
    assert(f.map(_._2).toSeq == Seq("ingest", "quality_gate",
      "exact_dedup", "decontaminate", "mix_budget"))
    // attrition is monotone and the drop column is exactly the deltas
    f.sliding(2).foreach { case Array(a, b) =>
      assert(b._3 <= a._3 && b._5 == a._3 - b._3)
      assert(b._4 <= a._4)
    }
    assert(f.head._5 == 0L)
    // recompute each stage with the public operators and compare
    val base = corpus.filter(pmod(col("doc_id"), lit(97)) =!= 0)
    def nAndTok(df: org.apache.spark.sql.DataFrame): (Long, Long) = {
      val r = df.agg(count(lit(1)),
        coalesce(sum(size(graft.functions.TextAnalysis
          .wsTokens(col("text"))).cast("long")), lit(0L))).head
      (r.getLong(0), r.getLong(1))
    }
    assert((f(0)._3, f(0)._4) == nAndTok(base))
    val gated = base.join(CorpusOps.qualityRules(base)
      .filter(col("pass")).select("doc_id"), Seq("doc_id"), "left_semi")
    assert((f(1)._3, f(1)._4) == nAndTok(gated))
    val deduped = Dedup.dropDuplicatesKeepFirst(gated)
    assert((f(2)._3, f(2)._4) == nAndTok(deduped))
    // mix stage: never exceeds the clean stage, and something survives
    assert(f(4)._3 > 0 && f(4)._3 <= f(3)._3)
  }

  test("paddingAudit: hand buckets, exact waste, loud overflow") {
    val docs = Seq(
      (1L, (1 to 3).map(i => s"a$i").mkString(" ")),    // 3 -> 16
      (2L, (1 to 16).map(i => s"b$i").mkString(" ")),   // 16 -> 16 exact
      (3L, (1 to 17).map(i => s"c$i").mkString(" ")),   // 17 -> 32
      (4L, (1 to 100).map(i => s"d$i").mkString(" ")))  // 100 -> 128
      .toDF("doc_id", "text")
    val r = TrainingOps.paddingAudit(docs)
      .as[(Long, Long, Long, Long, Long)].collect()
      .map(x => x._1 -> x).toMap
    // bucket 16: 2 docs, 19 tokens, 13 padding, waste 13*1e4/32 = 4062
    assert(r(16L) == ((16L, 2L, 19L, 13L, 4062L)))
    assert(r(32L) == ((32L, 1L, 17L, 15L, 4687L)))
    assert(r(128L) == ((128L, 1L, 100L, 28L, 2187L)))
    assert(r.size == 3)
    // a doc over the top rung fails loudly, never silently truncates
    val over = Seq((9L, (1 to 40).map(i => s"x$i").mkString(" ")))
      .toDF("doc_id", "text")
    val e = intercept[Exception] {
      TrainingOps.paddingAudit(over, buckets = Seq(16L, 32L)).collect()
    }
    assert(e.getMessage.contains("paddingAudit") ||
      e.getCause.getMessage.contains("paddingAudit"))
  }

  test("deleteRepackPlan: only shards holding deleted docs repack") {
    // 12 docs, shardSize 4 -> shards 0..2 in md5-permuted order; the
    // delete set is chosen AFTER looking at the layout so one shard
    // stays clean deterministically
    val docs = (1L to 12L).map(i => (i, s"tok$i two three")).toSeq
      .toDF("doc_id", "text")
    val layout = TrainingOps.trainingShards(docs, shardSize = 4)
      .select("doc_id", "shard_id").as[(Long, Long)].collect().toMap
    val inShard0 = layout.filter(_._2 == 0L).keys.toSeq.sorted.take(2)
    val deletes = inShard0.toDF("doc_id")
    val plan = TrainingOps.deleteRepackPlan(docs, deletes, shardSize = 4)
      .as[(Long, Long, Long, Long, Long, String)].collect()
    assert(plan.map(_._1).toSeq == Seq(0L, 1L, 2L))
    assert(plan.map(_._2).sum == 12L)
    assert(plan.map(_._3).sum == 2L)
    val byShard = plan.map(p => p._1 -> p).toMap
    assert(byShard(0L)._3 == 2L && byShard(0L)._6 == "repack")
    assert(byShard(0L)._5 == 6L) // 2 deleted docs x 3 tokens
    Seq(1L, 2L).foreach { sh =>
      assert(byShard(sh)._3 == 0L && byShard(sh)._5 == 0L &&
        byShard(sh)._6 == "keep")
    }
    // empty delete set: every shard keeps; unknown ids are ignored
    val none = TrainingOps.deleteRepackPlan(docs,
      Seq(999L).toDF("doc_id"), shardSize = 4)
      .as[(Long, Long, Long, Long, Long, String)].collect()
    assert(none.forall(p => p._3 == 0L && p._6 == "keep"))
    assert(none.map(_._2).sum == 12L)
  }

  test("shardSummary: full shards except the tail, order chain present") {
    val n = corpus.count()
    val s = TrainingOps.shardSummary(corpus, shardSize = 100)
      .as[(Long, Long, Long, String)].collect()
    assert(s.map(_._2).sum == n)
    val full = s.dropRight(1)
    assert(full.forall(_._2 == 100L))
    assert(s.last._2 == (if (n % 100 == 0) 100L else n % 100))
    assert(s.forall(_._4.length == 32)) // md5 hex
    // shard ids are contiguous from 0
    assert(s.map(_._1).toSeq == (0L until s.length).toSeq)
  }

  test("writeShards: hive-partitioned by shard, maxRecordsPerFile bounds " +
      "file size, round-trips") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft-shards").toString
    TrainingOps.writeShards(corpus, dir, shardSize = 100,
      maxRecordsPerFile = 40)
    val back = spark.read.parquet(dir)
    val want = TrainingOps.trainingShards(corpus, 100)
    assert(back.count() == want.count())
    assert(want.exceptAll(
      back.select("doc_id", "shard_id", "pos", "n_tok")).isEmpty)
    // physical layout: one dir per shard; >= ceil(100/40) = 3 files is
    // NOT required (a task may hold fewer rows of a shard), but no
    // single file may exceed the cap
    val files = new java.io.File(dir).listFiles()
      .filter(_.getName.startsWith("shard_id="))
    assert(files.length == want.select("shard_id").distinct().count())
    for (f <- files; p <- f.listFiles()
        if p.getName.endsWith(".parquet")) {
      assert(spark.read.parquet(p.getAbsolutePath).count() <= 40)
    }
  }

  test("temperatureMix: sqrt-weight budgets bind per source, boundary kept") {
    // sources with 100 vs 400 total tokens -> sqrt weights 1:2, so a
    // 300-token budget splits 100/200
    val docs = (
      (1 to 10).map(i => (i.toLong, "a", Seq.fill(10)("t").mkString(" "))) ++
      (11 to 30).map(i => (i.toLong, "b", Seq.fill(20)("t").mkString(" ")))
    ).toDF("doc_id", "source", "text")
    val kept = TrainingOps.temperatureMix(docs, budget = 300L)
      .as[(Long, String, Long, Long)].collect()
    val bySrc = kept.groupBy(_._2).view.mapValues(_.map(_._3).sum).toMap
    // budgets: 300*1/3 = 100 and 300*2/3 = 200; doc sizes divide them
    // exactly, so the boundary doc lands exactly on the line
    assert(bySrc == Map("a" -> 100L, "b" -> 200L))
    // cum_tok within each source is the running total in the kept order
    kept.groupBy(_._2).foreach { case (_, rows) =>
      val sorted = rows.sortBy(_._4)
      assert(sorted.map(_._3).scanLeft(0L)(_ + _).tail.toSeq ==
        sorted.map(_._4).toSeq)
    }
    // deterministic under physical layout
    val again = TrainingOps.temperatureMix(docs.repartition(7), 300L)
      .as[(Long, String, Long, Long)].collect()
    assert(kept.sortBy(_._1).toSeq == again.sortBy(_._1).toSeq)
  }

  test("temperatureMix: boundary doc that crosses the line is kept") {
    // one source, docs of 7 tokens each, budget 10: the doc that
    // crosses 10 is kept (cum_before 7 < 10), the next is cut
    val docs = (1 to 5)
      .map(i => (i.toLong, "s", Seq.fill(7)("t").mkString(" ")))
      .toDF("doc_id", "source", "text")
    val kept = TrainingOps.temperatureMix(docs, budget = 10L)
      .as[(Long, String, Long, Long)].collect()
    // weight = round(sqrt(35)*1e4); budget_s = 10*w DIV w = 10
    assert(kept.map(_._3).sum == 14L) // two 7-token docs
    assert(kept.map(_._4).max == 14L)
  }

  test("temperatureMix: integer overflow guard fails loudly") {
    val docs = Seq((1L, "s", Seq.fill(100)("t").mkString(" ")))
      .toDF("doc_id", "source", "text")
    val e = intercept[Exception] {
      TrainingOps.temperatureMix(docs, budget = Long.MaxValue / 2)
        .collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("overflows")), e.toString)
  }

  // ---- duplicated spans ----------------------------------------------

  test("duplicatedSpans: partial repeats merge into maximal spans, " +
    "hand-checked") {
    // doc 1 and doc 2 share tokens s0..s5 at different offsets; each
    // doc's remaining tokens are unique. With w = 4, the duplicated
    // windows in doc 1 start at 0, 1, 2 (covering tokens 0..5) and in
    // doc 2 at 2, 3, 4 (covering tokens 2..7) — one merged span each.
    val shared = (0 until 6).map(i => s"s$i").mkString(" ")
    val docs = docsDf(
      (1L, s"$shared u1 u2 u3 u4"),
      (2L, s"v1 v2 $shared w1 w2"),
      (3L, "x1 x2 x3 x4 x5 x6 x7 x8")) // no repeats: absent from output
    val got = TrainingOps.duplicatedSpans(docs, w = 4)
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq((1L, 0L, 5L, 6L, 3L), (2L, 2L, 7L, 6L, 3L)))
  }

  test("duplicatedSpans: separated repeats stay separate spans; " +
    "touching spans merge") {
    // doc 2 repeats doc 1's a-block at tokens 0..3 and b-block at
    // tokens 8..11 with a unique 4-token gap — two spans, not one.
    val a = "a1 a2 a3 a4"; val b = "b1 b2 b3 b4"
    val twoSpans = docsDf(
      (1L, s"$a z1 z2 z3 z4 $b"),
      (2L, s"$a y1 y2 y3 y4 $b"))
    val got = TrainingOps.duplicatedSpans(twoSpans, w = 4)
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq(
      (1L, 0L, 3L, 4L, 1L), (1L, 8L, 11L, 4L, 1L),
      (2L, 0L, 3L, 4L, 1L), (2L, 8L, 11L, 4L, 1L)))
    // zero-gap adjacency (span ends at t, next starts at t+1) merges:
    // doc 2 carries both blocks back-to-back but NOT the joint window,
    // so the blocks' windows touch without overlapping.
    val touching = docsDf(
      (1L, s"$a q1 q2 q3 q4"), (2L, s"p1 p2 p3 p4 $b"),
      (3L, s"$a $b"))
    val spans3 = TrainingOps.duplicatedSpans(touching, w = 4)
      .filter(col("doc_id") === 3L)
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(spans3 == Seq((3L, 0L, 7L, 8L, 2L)))
  }

  test("duplicatedSpans: deterministic under layout; exact-dup docs " +
    "span their whole length") {
    val spans = TrainingOps.duplicatedSpans(corpus, w = 16)
    val again = TrainingOps.duplicatedSpans(corpus.repartition(13), w = 16)
    val s1 = spans.collect().toSeq
    assert(s1 == again.collect().toSeq && s1.nonEmpty)
    // spans sit inside their documents, and a span of n tokens holds
    // exactly its duplicated windows when maximal: n_windows is the
    // span's window count only if EVERY window inside is duplicated —
    // which is how exact-dup docs present (span = whole doc,
    // n_windows = n - w + 1). Check both bounds against real token
    // counts.
    val nTok = corpus.select(col("doc_id"),
      size(graft.functions.TextAnalysis.wsTokens(col("text")))
        .cast("long").as("n_tok"))
    val joined = spans.join(nTok, "doc_id")
      .as[(Long, Long, Long, Long, Long, Long)].collect()
    assert(joined.nonEmpty)
    joined.foreach { case (_, s, e, n, nw, nt) =>
      assert(s >= 0 && e < nt && n == e - s + 1 && nw <= n - 16 + 1)
    }
    // at least one whole-document span exists (the planted exact dups)
    assert(joined.exists { case (_, s, e, _, nw, nt) =>
      s == 0 && e == nt - 1 && nw == nt - 16 + 1 })
  }

  // ---- span corruption -----------------------------------------------

  /** 60-bit md5 integer, the test-side twin of md5Hash60. */
  private def h60(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    java.lang.Long.parseLong(
      d.map(b => f"$b%02x").mkString.take(15), 16)
  }

  test("spanCorruption: exact strings on a hand doc, short tail block " +
    "passes through, empty doc survives") {
    // 12 tokens: block 0 full (10 tokens, masks 3 at j = h % 8),
    // block 1 has 2 tokens < spanTokens: unmasked.
    val toks = (0 until 12).map(i => s"w$i")
    val docs = docsDf((7L, toks.mkString(" ")), (8L, ""))
    val got = TrainingOps.spanCorruption(docs, blockTokens = 10,
      spanTokens = 3).as[(Long, Long, String, String)].collect().toSeq
    val j = (h60("7:0") % 8).toInt
    val masked = (toks.take(j) :+ "<extra_id_0>") ++
      toks.slice(j + 3, 10) ++ toks.drop(10)
    val target = s"<extra_id_0> ${toks.slice(j, j + 3).mkString(" ")}"
    assert(got == Seq(
      (7L, 1L, masked.mkString(" "), target),
      (8L, 0L, "", "")))
  }

  test("spanCorruption: masked + target reconstruct every corpus doc") {
    val pairs = TrainingOps.spanCorruption(corpus)
      .as[(Long, Long, String, String)].collect()
    val original = corpus.select(col("doc_id"), col("text"))
      .as[(Long, String)].collect().toMap
    assert(pairs.nonEmpty && pairs.exists(_._2 > 0))
    pairs.foreach { case (id, nSpans, masked, target) =>
      // parse "<extra_id_b> t1 t2 t3 <extra_id_b'> ..." into spans
      val sentinel = "<extra_id_\\d+>".r
      val ids = sentinel.findAllIn(target).toSeq
      assert(ids.size == nSpans && ids.distinct == ids, s"doc $id")
      val bodies = sentinel.split(target).toSeq // leading "" when spans
      val spanOf = ids.zip(bodies.drop(1).map(_.trim)).toMap
      val rebuilt = masked.split(" ").filter(_.nonEmpty).flatMap { t =>
        spanOf.get(t) match {
          case Some(body) => body.split(" ").toSeq
          case None => Seq(t)
        }
      }
      val want = original(id).split("\\s+").filter(_.nonEmpty).toSeq
      assert(rebuilt.toSeq == want, s"doc $id failed to reconstruct")
    }
    // deterministic under physical layout
    val again = TrainingOps.spanCorruption(corpus.repartition(13))
      .as[(Long, Long, String, String)].collect()
    assert(pairs.sortBy(_._1).toSeq == again.sortBy(_._1).toSeq)
  }

  // ---- curriculum interleave -----------------------------------------

  test("curriculumInterleave: positions cycle tiers round-robin and " +
    "equal the brute-force window computation") {
    val rows = TrainingOps.curriculumInterleave(corpus, nBuckets = 3)
      .as[(Long, Long, Long, Long)].collect().toSeq
    val n = corpus.count()
    assert(rows.length == n)
    // positions are unique and every position p sits in tier p mod 3
    assert(rows.map(_._1).distinct.length == rows.length)
    assert(rows.forall { case (p, _, b, _) => p % 3 == b })
    // brute-force witness: rank by (n_tokens, doc_id) -> tertile,
    // shuffle within tier by the same md5 hash, interleave
    val scored = corpus.select(col("doc_id"),
        size(expr("regexp_extract_all(text, '\\\\S+', 0)")).cast("long")
          .as("n_tokens"),
        conv(substring(md5(concat(lit("cur:"), col("doc_id"))), 1, 15),
          16, 10).cast("long").as("h"))
      .as[(Long, Long, Long)].collect()
    val ranked = scored.sortBy(t => (t._2, t._1)).zipWithIndex
    val tiers = ranked.map { case ((id, nt, h), r) =>
      (id, nt, h, r.toLong * 3 / n) }
    val expect = tiers.groupBy(_._4).toSeq.flatMap { case (b, ts) =>
      ts.sortBy(t => (t._3, t._1)).zipWithIndex.map { case (t, rib) =>
        (rib.toLong * 3 + b, t._1, b, t._2) }
    }.sortBy(_._1)
    assert(rows == expect)
    // deterministic under layout
    val again = TrainingOps.curriculumInterleave(corpus.repartition(13),
      nBuckets = 3).as[(Long, Long, Long, Long)].collect().toSeq
    assert(again == rows)
  }

  test("curriculumInterleave: nBuckets=1 is plain hash-shuffle order") {
    val rows = TrainingOps.curriculumInterleave(corpus, nBuckets = 1)
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(rows.map(_._1) == rows.indices.map(_.toLong))
    assert(rows.forall(_._3 == 0L))
  }

  /** Scala witness of the UniMax waterfilling (sequential greedy, the
    * definition the closed form must reproduce): sources ascending by
    * cap; each takes min(cap, remaining DIV sourcesLeft), remainder
    * +1s to the first takers among the uncapped. */
  private def unimaxQuotas(ntok: Seq[(String, Long)], budget: Long,
      maxEpochs: Int): Map[String, Long] = {
    val byCap = ntok.map { case (s, n) => (s, n * maxEpochs) }
      .sortBy { case (s, c) => (c, s) }
    val capped = scala.collection.mutable.Map.empty[String, Long]
    var rest = byCap
    var remaining = budget
    // peel off capped sources until every survivor takes the share
    var changed = true
    while (changed) {
      changed = false
      rest = rest.filter { case (s, c) =>
        // c*|rest| <= remaining  ⟺  c <= remaining DIV |rest|
        if (c <= remaining / rest.size) {
          capped += s -> c; remaining -= c; changed = true; false
        } else true
      }
    }
    val share = if (rest.isEmpty) 0L else remaining / rest.size
    val rem = if (rest.isEmpty) 0L else remaining % rest.size
    val uncapped = rest.zipWithIndex.map { case ((s, _), j) =>
      s -> (share + (if (j < rem) 1L else 0L)) }
    capped.toMap ++ uncapped
  }

  test("unimaxMix: hand allocation — caps, even split, +1 remainder") {
    // a:4 tokens, b:10, c:10 tokens; E=1; budget relative 80% of 24 =
    // 19. Ascending caps: a(4): 4*3=12 <= 19 -> capped. Remaining 15
    // over {b,c}: share 7 rem 1 -> b gets 8, c gets 7.
    val d = Seq(
      (1L, "t1 t2 t3 t4", "a"),
      (2L, "u1 u2 u3 u4 u5", "b"), (3L, "u6 u7 u8 u9 u10", "b"),
      (4L, "v1 v2 v3 v4 v5", "c"), (5L, "v6 v7 v8 v9 v10", "c"),
    ).toDF("doc_id", "text", "source")
    val got = TrainingOps.unimaxMix(d, budgetPerMille = 800, maxEpochs = 1)
      .as[(Long, String, Long, Long)].collect().toSeq
    val quota = got.groupBy(_._2).view.mapValues(_.map(_._4).sum).toMap
    // doc-level copies: a takes its full (single) epoch; b/c keep-
    // while windows stop after the boundary doc of the partial pass
    assert(quota == Map("a" -> 1L, "b" -> 2L, "c" -> 2L))
    // token-level: per-source selected mass is quota to within the
    // kept boundary doc
    val mass = got.groupBy(_._2).view
      .mapValues(g => g.map(r => r._3 * r._4).sum).toMap
    val want = unimaxQuotas(Seq("a" -> 4L, "b" -> 10L, "c" -> 10L),
      budget = 19L, maxEpochs = 1)
    assert(want == Map("a" -> 4L, "b" -> 8L, "c" -> 7L))
    for ((s, q) <- want)
      assert(mass(s) >= q && mass(s) - q < 5L,
        s"source $s mass ${mass(s)} vs quota $q (boundary overshoot only)")
  }

  test("unimaxMix: multi-epoch copies and witness parity on sf0.001") {
    val got = TrainingOps.unimaxMix(corpus).collect()
    assert(got.nonEmpty)
    // witness: per-source token totals -> greedy waterfilling quotas
    val ntok = corpus.select(col("source"),
      size(split(trim(col("text")), "\\s+")).cast("long").as("n"))
      .groupBy("source").agg(sum("n").as("nt"))
      .as[(String, Long)].collect().toSeq
    val t = ntok.map(_._2).sum
    val want = unimaxQuotas(ntok, t * 1800L / 1000L, maxEpochs = 2)
    val mass = got.groupBy(_.getString(1)).view.mapValues(
      _.map(r => r.getLong(2) * r.getLong(3)).sum).toMap
    val maxDoc = corpus.select(max(size(split(trim(col("text")), "\\s+"))))
      .head.getInt(0).toLong
    for ((s, q) <- want if q > 0)
      assert(mass(s) >= q && mass(s) - q <= maxDoc,
        s"source $s mass ${mass(s)} vs quota $q")
    // budget 1.8x total with a 2-epoch cap: every doc of a CAPPED
    // source appears exactly twice (full quota = cap = 2 epochs)
    val capped = want.filter { case (s, q) =>
      q == ntok.toMap.apply(s) * 2 }.keySet
    assert(got.filter(r => capped(r.getString(1)))
      .forall(_.getLong(3) == 2L))
  }
}
