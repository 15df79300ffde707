package graft

import graft.operators.WordPiece
import org.apache.spark.sql.functions._

/** Pins WordPiece training rule-for-rule against a plain-Scala
  * likelihood-argmax witness (the [[BpeSpec]]/[[UnigramSpec]]
  * convention for argmax-loop operators with no closed SQL form),
  * plus greedy longest-match encode parity and the `[UNK]` path. */
class WordPieceSpec extends SparkSpec {
  import spark.implicits._

  private def corpus = spark.read.parquet(s"$sfDir/documents.parquet")

  // ---- plain-Scala witness: identical arithmetic, identical ties --

  private object Witness {
    val E12 = BigInt(10).pow(12)

    def symbolize(w: String): Vector[String] =
      w.substring(0, 1) +:
        (1 until w.length).map(i => "##" + w.substring(i, i + 1)).toVector

    def wordCounts(texts: Seq[String]): Map[String, Long] =
      texts.flatMap(_.split("\\s+").filter(_.nonEmpty))
        .groupBy(identity).map { case (w, o) => w -> o.size.toLong }

    /** (s1, s2, cnt, c1, c2, score_e12) for every adjacent pair —
      * multiplicity-weighted symbol totals, E12 floor quotient, the
      * operator's exact integer arithmetic. */
    def scored(wf: Map[String, (Vector[String], Long)])
        : Seq[(String, String, Long, Long, Long, Long)] = {
      val pc = scala.collection.mutable.Map
        .empty[(String, String), Long].withDefaultValue(0L)
      val sc = scala.collection.mutable.Map
        .empty[String, Long].withDefaultValue(0L)
      for ((_, (ss, c)) <- wf) {
        ss.foreach(s => sc(s) += c)
        for (i <- 0 until ss.length - 1) pc((ss(i), ss(i + 1))) += c
      }
      pc.toSeq.map { case ((a, b), cnt) =>
        val score = (BigInt(cnt) * E12) / (BigInt(sc(a)) * BigInt(sc(b)))
        (a, b, cnt, sc(a), sc(b), score.toLong)
      }
    }

    /** Greedy left-to-right single-merge application — the operator's
      * `aggregate` fold: the merged symbol becomes the new tail and
      * cannot immediately re-merge as `a`. */
    def applyMerge(ss: Vector[String], a: String, b: String)
        : Vector[String] = {
      val merged = a + b.stripPrefix("##")
      ss.foldLeft(Vector.empty[String]) { (acc, s) =>
        if (acc.nonEmpty && acc.last == a && s == b)
          acc.init :+ merged
        else acc :+ s
      }
    }

    def train(texts: Seq[String], nMerges: Int, minCount: Long = 2L)
        : Seq[(Long, String, String, String, Long, Long)] = {
      var wf = wordCounts(texts).map { case (w, c) =>
        w -> (symbolize(w), c) }
      val rules = scala.collection.mutable.ArrayBuffer
        .empty[(Long, String, String, String, Long, Long)]
      var done = false
      while (rules.length < nMerges && !done) {
        val ranked = scored(wf)
          .sortBy { case (a, b, _, _, _, s) => (-s, a, b) }
        if (ranked.isEmpty || ranked.head._3 < minCount) done = true
        else {
          val (a, b, cnt, _, _, s) = ranked.head
          rules += ((rules.length + 1L, a, b, a + b.stripPrefix("##"),
            cnt, s))
          wf = wf.map { case (w, (ss, c)) => w -> (applyMerge(ss, a, b), c) }
        }
      }
      rules.toSeq
    }

    /** Greedy longest-match-first segmentation (max piece length
      * maxL), whole word [UNK] on any positional miss. */
    def segment(word: String, vocab: Set[String], maxL: Int)
        : (Seq[String], Boolean) = {
      var pos = 0
      val out = scala.collection.mutable.ArrayBuffer.empty[String]
      var unk = false
      while (pos < word.length) {
        val cands = (math.min(maxL, word.length - pos) to 1 by -1)
          .map { l =>
            val raw = word.substring(pos, pos + l)
            (l, if (pos == 0) raw else "##" + raw)
          }.find { case (_, p) => vocab.contains(p) }
        cands match {
          case Some((l, p)) => out += p; pos += l
          case None => unk = true; pos += 1
        }
      }
      (if (unk) Seq("[UNK]") else out.toSeq, unk)
    }
  }

  test("train matches the plain-Scala likelihood-argmax witness") {
    val got = WordPiece.train(corpus, nMerges = 20)
      .as[(Long, String, String, String, Long, Long)].collect().toSeq
    val texts = corpus.select("text").as[String].collect().toSeq
    val want = Witness.train(texts, nMerges = 20)
    assert(got == want)
    assert(got.size == 20, "corpus must support 20 merges")
    // likelihood ranking is NOT frequency ranking: at least one rule
    // must differ from what raw pair counts would have picked — the
    // one semantic distinction from BPE actually binds
    val bpeFirst = Witness.scored(Witness.wordCounts(texts).map {
      case (w, c) => w -> (Witness.symbolize(w), c) })
      .sortBy { case (a, b, cnt, _, _, _) => (-cnt, a, b) }.head
    assert((got.head._2, got.head._3) != (bpeFirst._1, bpeFirst._2),
      "first WordPiece rule should diverge from the BPE argmax here")
  }

  test("scores move non-monotonically across merges (why no batching)") {
    // after merging the argmax pair, some OTHER pair's score must
    // RISE (its symbol totals shrank) — the property that makes
    // Bpe-style disjoint-prefix batching unsound for WordPiece
    val texts = corpus.select("text").as[String].collect().toSeq
    var wf = Witness.wordCounts(texts).map { case (w, c) =>
      w -> (Witness.symbolize(w), c) }
    val before = Witness.scored(wf)
      .map { case (a, b, _, _, _, s) => (a, b) -> s }.toMap
    val top = Witness.scored(wf)
      .sortBy { case (a, b, _, _, _, s) => (-s, a, b) }.head
    wf = wf.map { case (w, (ss, c)) =>
      w -> (Witness.applyMerge(ss, top._1, top._2), c) }
    val after = Witness.scored(wf)
      .map { case (a, b, _, _, _, s) => (a, b) -> s }.toMap
    assert(after.exists { case (k, s) =>
      before.get(k).exists(s > _) }, "some score must rise post-merge")
  }

  test("encode: greedy longest-match parity on sf0.001 + injected pieces") {
    val extras = Seq("ta", "##ble", "sc", "##an", "wind", "##ow",
      "val", "##ue", "the", "##ast", "me")
    val got = WordPiece.encode(corpus, extras)
      .as[(Long, String, Long, Long, Long, Long)].collect().toSeq
    val docs = corpus.select("doc_id", "text").as[(Long, String)]
      .collect().toMap
    val vocab = docs.values
      .flatMap(_.split("\\s+").filter(_.nonEmpty)).toSet
      .flatMap((w: String) => Witness.symbolize(w)) ++ extras
    val maxL = (1 +: extras.map(_.stripPrefix("##").length)).max
    assert(got.map(_._1).toSet == docs.keySet)
    for ((id, wp, nP, nUnk, nT, fert) <- got) {
      val toks = docs(id).split("\\s+").filter(_.nonEmpty).toSeq
      val segs = toks.map(t => Witness.segment(t, vocab, maxL))
      assert(wp == segs.flatMap(_._1).mkString(" "),
        s"doc $id segmentation diverged")
      assert(nP == segs.map(_._1.size).sum && nT == toks.size)
      assert(nUnk == 0, "self-derived char vocab covers every word")
      assert(fert == nP * 10000L / nT)
      // multi-char pieces actually bind somewhere in the corpus
    }
    assert(got.exists(_._2.split(" ").exists(_.length > 2)),
      "at least one injected multi-char piece must match")
  }

  test("encode [UNK] path: frozen train vocab, out-of-vocab serve char") {
    val trainDocs = Seq((1L, "abc abd")).toDF("doc_id", "text")
    val serveDocs = Seq((10L, "abc axc zb")).toDF("doc_id", "text")
    val got = WordPiece.encode(serveDocs, Seq("ab"),
      vocabDocs = Some(trainDocs))
      .as[(Long, String, Long, Long, Long, Long)].collect().toSeq
    assert(got.size == 1)
    val (_, wp, nP, nUnk, nT, _) = got.head
    // train chars: bare a, ##b, ##c, ##d (+ injected "ab").
    // "abc" -> ab ##c; "axc" -> x misses (##x not in vocab) -> [UNK];
    // "zb" -> bare z misses -> [UNK]
    assert(wp == "ab ##c [UNK] [UNK]")
    assert(nP == 4 && nUnk == 2 && nT == 3)
  }
}
