package graft

import graft.operators.Bpe
import org.apache.spark.sql.functions._

class BpeSpec extends SparkSpec {
  import spark.implicits._

  private def corpus = spark.read.parquet(s"$sfDir/documents.parquet")

  private def docsDf(rows: (Long, String)*) =
    rows.toDF("doc_id", "text")

  // ---- plain-Scala reference BPE (independent witness) ---------------

  private type Rule = (Long, String, String, String, Long)

  private def refMergeWord(syms: Vector[String], a: String,
      b: String): Vector[String] =
    syms.foldLeft(Vector.empty[String]) { (acc, s) =>
      if (acc.nonEmpty && acc.last == a && s == b)
        acc.init :+ (a + b)
      else acc :+ s
    }

  private def refBpe(texts: Seq[String], nMerges: Int, minCount: Long)
      : (Seq[Rule], Map[String, Vector[String]]) = {
    val wordCnt = texts.flatMap(_.split("\\s+").filter(_.nonEmpty))
      .groupBy(identity).map { case (w, ws) => w -> ws.size.toLong }
    var syms: Map[String, Vector[String]] = wordCnt.keysIterator
      .map(w => w -> (w.map(_.toString).toVector :+ "</w>")).toMap
    val rules = scala.collection.mutable.ArrayBuffer.empty[Rule]
    var done = false
    while (rules.size < nMerges && !done) {
      val pairCnt = scala.collection.mutable.Map
        .empty[(String, String), Long]
      for ((w, s) <- syms; (x, y) <- s.zip(s.tail))
        pairCnt((x, y)) = pairCnt.getOrElse((x, y), 0L) + wordCnt(w)
      if (pairCnt.isEmpty) done = true
      else {
        val ((a, b), cnt) = pairCnt.minBy { case ((x, y), c) =>
          (-c, x, y)
        }
        if (cnt < minCount) done = true
        else {
          rules += ((rules.size + 1L, a, b, a + b, cnt))
          syms = syms.map { case (w, s) => w -> refMergeWord(s, a, b) }
        }
      }
    }
    (rules.toSeq, syms)
  }

  // ---- tests ---------------------------------------------------------

  test("pairCounts: weighted positional pairs on a hand fixture") {
    // "ab ab cb": words ab(x2), cb(x1); symbols a,b,</w> / c,b,</w>
    val got = Bpe.pairCounts(Bpe.wordSymbols(docsDf((1L, "ab ab cb"))))
      .as[(String, String, Long)].collect().toSet
    assert(got == Set(("a", "b", 2L), ("c", "b", 1L),
      ("b", "</w>", 3L)))
  }

  test("train == plain-Scala reference BPE, rule for rule, on the corpus") {
    val texts = corpus.select("text").as[String].collect().toSeq
    val (wantRules, wantSyms) = refBpe(texts, nMerges = 30, minCount = 2L)
    val (gotRulesDf, gotSegDf) = Bpe.train(corpus, nMerges = 30)
    val gotRules = gotRulesDf.orderBy("rank")
      .as[Rule].collect().toSeq
    assert(gotRules == wantRules)
    // the segmented vocabulary matches the reference's word-by-word
    val gotSyms = gotSegDf.select("word", "syms")
      .as[(String, Seq[String])].collect()
      .map { case (w, s) => w -> s.toVector }.toMap
    assert(gotSyms == wantSyms)
  }

  test("greedy left-to-right merge: 'aaa' + (a,a) -> [aa, a]") {
    // one word "aaa" x3 and "ab" x1: top pair is (a,a) cnt 6
    // (two positions per occurrence); greedy application must yield
    // [aa, a, </w>] — the overlapping middle 'a' must not fuse twice
    val docs = docsDf((1L, "aaa aaa aaa ab"))
    val (rules, seg) = Bpe.train(docs, nMerges = 1, minCount = 1L)
    val r = rules.as[Rule].collect()
    assert(r.length == 1 && r(0)._2 == "a" && r(0)._3 == "a" &&
      r(0)._5 == 6L)
    val aaa = seg.filter(col("word") === "aaa").select("syms")
      .as[Seq[String]].head()
    assert(aaa == Seq("aa", "a", "</w>"))
  }

  test("segmented symbols always reconstruct the word") {
    val (_, seg) = Bpe.train(corpus, nMerges = 10)
    val bad = seg.filter(
      concat_ws("", col("syms")) =!= concat(col("word"), lit("</w>")))
    assert(bad.isEmpty)
  }

  test("encode == training's own segmentation; documents reconstruct") {
    val (rulesDf, seg) = Bpe.train(corpus, nMerges = 15)
    val rules = rulesDf.orderBy("rank").select("s1", "s2")
      .as[(String, String)].collect().toSeq
    val enc = Bpe.encode(corpus, rules)
    // per-word segmentation equals the trainer's final state: rebuild
    // each doc's piece stream from the trainer's segmented relation
    val want = corpus
      .select(col("doc_id"),
        posexplode(graft.functions.TextAnalysis.wsTokens(col("text")))
          .as(Seq("pos", "word")))
      .join(seg.select("word", "syms"), "word")
      .groupBy("doc_id")
      .agg(array_join(flatten(transform(
        sort_array(collect_list(struct(col("pos"), col("syms")))),
        s => s.getField("syms"))), " ").as("bpe_text"))
    assert(enc.select("doc_id", "bpe_text").exceptAll(want).isEmpty &&
      want.exceptAll(enc.select("doc_id", "bpe_text")).isEmpty)
    // drop piece boundaries, turn each </w> marker back into a word
    // boundary: the token stream reconstructs exactly
    val rebuilt = enc.select(col("doc_id"),
      trim(regexp_replace(
        regexp_replace(col("bpe_text"), " ", ""), "</w>", " "))
        .as("again"))
    val orig = corpus.select(col("doc_id"),
      array_join(expr("regexp_extract_all(text, '\\\\S+', 0)"), " ")
        .as("norm"))
    assert(rebuilt.join(orig, "doc_id")
      .filter(col("again") =!= col("norm")).isEmpty)
    // fertility is sane: at least one piece per word
    assert(enc.filter(col("fertility_bp") < 10000L).isEmpty)
  }

  test("batched rounds preserve exact greedy order under conflicts") {
    // Adversarial for batching: stale ranking (a,b)=10, (b,</w>)=10,
    // (c,d)=9 — rank 2 CONFLICTS with rank 1 (shares b) and ties its
    // count, and after merging (a,b) the NEW pair (ab,</w>) cnt 10
    // overtakes the disjoint (c,d). A batcher that skipped conflicts
    // and kept (c,d) in the same round would emit rank 2 = (c,d);
    // exact greedy demands (ab,</w>). Also exercises the strict-
    // count truncation fallback (accepted prefix empties on the tie).
    val text = (Seq.fill(5)("xab") ++ Seq.fill(5)("ab") ++
      Seq.fill(9)("cd")).mkString(" ")
    val docs = docsDf((1L, text))
    val (wantRules, wantSyms) = refBpe(Seq(text), nMerges = 4,
      minCount = 2L)
    val (gotRulesDf, gotSegDf) = Bpe.train(docs, nMerges = 4)
    assert(gotRulesDf.orderBy("rank").as[Rule].collect().toSeq
      == wantRules)
    assert(wantRules.map(r => (r._2, r._3)) ==
      Seq(("a", "b"), ("ab", "</w>"), ("c", "d"), ("cd", "</w>")))
    val gotSyms = gotSegDf.select("word", "syms")
      .as[(String, Seq[String])].collect()
      .map { case (w, s) => w -> s.toVector }.toMap
    assert(gotSyms == wantSyms)
  }

  test("minCount stops training early on a tiny corpus") {
    // every word unique -> every pair count 1 < minCount 2
    val (rules, _) = Bpe.train(docsDf((1L, "xy zw")), nMerges = 5,
      minCount = 2L)
    assert(rules.isEmpty)
  }
}
