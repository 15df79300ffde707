package graft

import graft.operators.Unigram
import org.apache.spark.sql.functions._

/** Pins unigram-LM tokenizer training piece-for-piece against a
  * plain-Scala hard-EM trainer (the [[BpeSpec]] convention for
  * argmax-loop operators with no closed SQL form), plus document
  * reconstruction through encode. */
class UnigramSpec extends SparkSpec {
  import spark.implicits._

  private def corpus = spark.read.parquet(s"$sfDir/documents.parquet")

  // ---- plain-Scala witness: identical arithmetic, identical ties --

  /** Integer E4 Mitchell log2 — the operator's exact arithmetic
    * (Unigram.mlog2Sql): b*10^4 + (n - 2^b)*10^4 / 2^b, floor-log2
    * via bit position, all integer. */
  private def ml(n: Long): Long = {
    val b = 63 - java.lang.Long.numberOfLeadingZeros(n)
    b * 10000L + ((n - (1L << b)) * 10000L) / (1L << b)
  }

  private class Witness(maxPieceLen: Int) {
    def substrs(w: String): Seq[String] =
      for {
        i <- 0 until w.length
        l <- 1 to math.min(maxPieceLen, w.length - i)
      } yield w.substring(i, i + l)

    def seed(wordCnt: Map[String, Long]): Map[String, Long] =
      wordCnt.toSeq.flatMap { case (w, c) => substrs(w).map(_ -> c) }
        .groupBy(_._1).map { case (p, o) => p -> o.map(_._2).sum }

    def topWithChars(rel: Map[String, Long], k: Int): Map[String, Long] =
      (rel.toSeq.sortBy { case (p, c) => (-c, p) }.take(k) ++
        rel.filter(_._1.length == 1)).toMap

    def weights(rel: Map[String, Long]): Map[String, Long] = {
      val t = rel.values.sum; val v = rel.size
      rel.map { case (p, c) => p -> (ml(c + 1) - ml(t + v)) }
    }

    /** Same DP as the operator: integer scores, sentinel -10^8,
      * (score, last-piece-len) lexicographic max. */
    def viterbi(word: String, w: Map[String, Long]): Seq[String] = {
      val n = word.length
      val best = new Array[(Long, Int)](n + 1)
      best(0) = (0L, 0)
      for (i <- 1 to n) {
        var b = (-100000000L, 0)
        for (len <- 1 to math.min(maxPieceLen, i)) {
          val piece = word.substring(i - len, i)
          w.get(piece).foreach { wp =>
            val sc = best(i - len)._1 + wp
            if (sc > b._1 || (sc == b._1 && len > b._2)) b = (sc, len)
          }
        }
        best(i) = b
      }
      var pos = n
      val ps = scala.collection.mutable.ArrayBuffer.empty[String]
      while (pos > 0) {
        val bl = best(pos)._2
        ps += word.substring(pos - bl, pos)
        pos -= bl
      }
      ps.reverse.toSeq
    }

    def emRound(wordCnt: Map[String, Long],
        pieces: Map[String, Long]): Map[String, Long] = {
      val w = weights(pieces)
      val used = wordCnt.toSeq.flatMap { case (word, c) =>
        viterbi(word, w).map(_ -> c) }
        .groupBy(_._1).map { case (p, o) => p -> o.map(_._2).sum }
      pieces.map { case (p, _) => p -> used.getOrElse(p, 0L) }
    }

    def train(wordCnt: Map[String, Long], vocabSize: Int,
        seedSize: Int, emRounds: Int): Seq[(String, Long, Long)] = {
      var pieces = topWithChars(seed(wordCnt), seedSize)
      for (_ <- 1 to emRounds) pieces = emRound(wordCnt, pieces)
      val pruned = topWithChars(pieces, vocabSize)
      val last = emRound(wordCnt, pruned)
      val w = weights(last)
      last.toSeq.sortBy { case (p, c) => (-c, p) }
        .map { case (p, c) => (p, c, w(p)) }
    }
  }

  private def wordCounts(df: org.apache.spark.sql.DataFrame) =
    df.select(explode(split(trim(col("text")), "\\s+")).as("w"))
      .filter(col("w") =!= "")
      .groupBy("w").agg(count(lit(1)).as("c"))
      .as[(String, Long)].collect().toMap

  test("train matches the plain-Scala hard-EM witness on sf0.001") {
    val got = Unigram.train(corpus)
      .as[(String, Long, Long)].collect().toSeq
    val want = new Witness(4).train(wordCounts(corpus),
      vocabSize = 60, seedSize = 200, emRounds = 2)
    assert(got == want)
    // the cut binds (corpus has more candidate pieces than vocab) and
    // multi-char pieces actually win slots — a tokenizer, not a
    // char-splitter
    assert(got.exists(_._1.length > 1))
    assert(got.count(_._2 > 0) > 10)
  }

  test("encode: segmentation parity, doc reconstruction, fertility") {
    val pieces = Unigram.train(corpus)
    val got = Unigram.encode(corpus, pieces)
      .as[(Long, String, Long, Long, Long)].collect().toSeq
    val w = new Witness(4)
    val pieceW = pieces.as[(String, Long, Long)].collect()
      .map { case (p, _, wt) => p -> wt }.toMap
    val docs = corpus.select("doc_id", "text").as[(Long, String)]
      .collect().toMap
    assert(got.map(_._1).toSet == docs.keySet)
    for ((id, uni, nP, nT, fert) <- got) {
      val toks = docs(id).split("\\s+").filter(_.nonEmpty).toSeq
      val segs = toks.map(t => w.viterbi(t, pieceW))
      assert(uni == segs.flatten.mkString(" "),
        s"doc $id segmentation diverged")
      // pieces concatenate back to the exact token stream
      assert(uni.split(" ").mkString == toks.mkString)
      assert(nP == segs.map(_.size).sum && nT == toks.size)
      assert(fert == nP * 10000L / nT)
    }
  }

  test("injected-table encode (the q_unigram_encode_injected regime) " +
      "matches the Scala Viterbi witness") {
    // chars at weight 10 (coverage) + the harness's fixed multi-char
    // pieces; multi-level competition must actually bind somewhere
    val multi = Seq("th" -> 500L, "the" -> 900L, "an" -> 400L,
      "ing" -> 800L, "er" -> 350L)
    val chars = corpus
      .select(explode(split(trim(col("text")), "\\s+")).as("w"))
      .filter(col("w") =!= "")
      .select(explode(split(col("w"), "")).as("piece"))
      .distinct().select(col("piece"), lit(10L).as("w"))
    val table = chars.unionByName(multi.toDF("piece", "w"))
    val got = Unigram.encode(corpus, table)
      .as[(Long, String, Long, Long, Long)].collect().toSeq
    val wit = new Witness(4)
    val pieceW = table.as[(String, Long)].collect().toMap
    val docs = corpus.select("doc_id", "text").as[(Long, String)]
      .collect().toMap
    var multiBound = false
    for ((id, uni, nP, nT, _) <- got) {
      val toks = docs(id).split("\\s+").filter(_.nonEmpty).toSeq
      val segs = toks.map(t => wit.viterbi(t, pieceW))
      assert(uni == segs.flatten.mkString(" "),
        s"doc $id diverged from the witness under the injected table")
      assert(nP == segs.map(_.size).sum && nT == toks.size)
      if (segs.exists(_.exists(_.length > 1))) multiBound = true
    }
    assert(multiBound, "no multi-char piece ever won — the injected " +
      "regime would be a trivial char splitter")
  }

  test("hand corpus: seeding, coverage, and the (sc, len) tie-break") {
    // 'abab' dominates: 'ab' should win a slot and beat char splits
    val d = Seq((1L, "abab abab abab b"), (2L, "abab ab"))
      .toDF("doc_id", "text")
    val trained = Unigram.train(d, vocabSize = 3, seedSize = 6,
      emRounds = 2)
      .as[(String, Long, Long)].collect().toSeq
    val w = trained.map { case (p, _, wt) => p -> wt }.toMap
    // every char still present (coverage floor)
    assert(Set("a", "b").subsetOf(w.keySet))
    val wit = new Witness(4)
    assert(wit.viterbi("abab", w) ==
      Unigram.encode(d.limit(1), Unigram.train(d, vocabSize = 3,
        seedSize = 6, emRounds = 2))
        .as[(Long, String, Long, Long, Long)].collect()
        .head._2.split(" ").take(wit.viterbi("abab", w).size).toSeq)
    // and the witness agrees with the operator end-to-end
    assert(trained == wit.train(wordCounts(d), vocabSize = 3,
      seedSize = 6, emRounds = 2))
  }
}
