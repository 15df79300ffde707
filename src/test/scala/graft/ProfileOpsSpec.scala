package graft

import graft.operators.ProfileOps
import org.apache.spark.sql.functions._

class ProfileOpsSpec extends SparkSpec {
  import spark.implicits._

  private def corpus = spark.read.parquet(s"$sfDir/documents.parquet")

  test("embeddingProfile: exact E6 moments, dead-dim flag, " +
      "truncated mean on negative sums") {
    val embs = Seq(
      (1L, Array(0.5f, -0.3f, 0.0001f)),
      (2L, Array(0.25f, -0.4f, 0.0002f)),
      (3L, Array(-0.1f, -0.5f, 0.0001f)))
      .toDF("vec_id", "embedding")
    val r = ProfileOps.embeddingProfile(embs)
      .as[(Long, Long, Long, Long, Long, Long, Long, Boolean)]
      .collect().map(x => x._1 -> x).toMap
    // plain-Scala witness over the identical quantization
    def q(f: Float): Long = math.floor(f.toDouble * 1e6).toLong
    val cols = Seq(
      Seq(0.5f, 0.25f, -0.1f), Seq(-0.3f, -0.4f, -0.5f),
      Seq(0.0001f, 0.0002f, 0.0001f)).map(_.map(q))
    cols.zipWithIndex.foreach { case (vs, d) =>
      val row = r(d.toLong)
      assert(row._2 == 3L && row._3 == vs.sum)
      assert(row._4 == vs.min && row._5 == vs.max)
      assert(row._6 == vs.map(v => v * v).sum)
      assert(row._7 == vs.sum / 3L) // Scala / truncates like Spark DIV
    }
    // dim 1 has a NEGATIVE sum: the truncated mean must not floor
    assert(r(1L)._3 < 0L && r(1L)._7 == r(1L)._3 / 3L)
    // dim 2 varies by < 1000 E6 units -> dead; the live dims are not
    assert(r(2L)._8 && !r(0L)._8 && !r(1L)._8)
    // corpus slice: every dimension sees every row
    val embsReal = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val prof = ProfileOps.embeddingProfile(embsReal)
    assert(prof.count() == 64)
    assert(prof.select(min("n")).head.getLong(0) == embsReal.count())
  }

  test("correlationMatrix: exact +/-1 on linear columns, BigInt " +
      "witness on noise, zero-variance to 0, layout-invariant") {
    val df = Seq(
      (1.00, 2.00, -1.00, 5.0, 0.37),
      (2.00, 4.00, -2.00, 5.0, 0.91),
      (3.00, 6.00, -3.00, 5.0, 0.12),
      (4.00, 8.00, -4.00, 5.0, 0.55),
    ).toDF("x", "y2x", "yneg", "const", "z")
    val got = ProfileOps.correlationMatrix(df,
      Seq("x", "y2x", "yneg", "const", "z"))
      .as[(String, String, Double)].collect()
      .map { case (a, b, r) => (a, b) -> r }.toMap
    assert(got(("x", "y2x")) == 1.0)     // y = 2x exactly
    assert(got(("x", "yneg")) == -1.0)   // y = -x exactly
    assert(got(("x", "const")) == 0.0)   // zero variance -> 0 rule
    // BigInt witness for the noisy pair — identical integer moments
    val xs = Seq(100L, 200L, 300L, 400L).map(BigInt(_))
    val zs = Seq(37L, 91L, 12L, 55L).map(BigInt(_))
    val n = BigInt(4)
    val num = (n * xs.zip(zs).map { case (a, b) => a * b }.sum -
      xs.sum * zs.sum).toDouble
    val den =
      math.sqrt((n * xs.map(v => v * v).sum - xs.sum * xs.sum).toDouble) *
      math.sqrt((n * zs.map(v => v * v).sum - zs.sum * zs.sum).toDouble)
    val want = BigDecimal(num / den)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got(("x", "z")) == want)
    // integer moments commute: any layout gives identical output
    assert(ProfileOps.correlationMatrix(df.repartition(7),
      Seq("x", "y2x", "yneg", "const", "z"))
      .as[(String, String, Double)].collect().toSeq ==
      ProfileOps.correlationMatrix(df,
        Seq("x", "y2x", "yneg", "const", "z"))
        .as[(String, String, Double)].collect().toSeq)
  }

  test("profileTable: exact stats, native-type min/max, null accounting") {
    val df = Seq[(java.lang.Long, String)](
      (99L, "b"), (100L, "a"), (100L, null), (null, "a"))
      .toDF("n", "s")
    val p = ProfileOps.profileTable(df).collect()
      .map(r => r.getString(0) -> r).toMap
    val n = p("n")
    assert(n.getLong(1) == 4 && n.getLong(2) == 1) // rows, nulls
    assert(n.getLong(3) == 2) // distinct excludes nulls
    // min/max aggregated natively THEN cast: 99 < 100 numerically,
    // while a pre-cast string min would pick "100"
    assert(n.getString(4) == "99" && n.getString(5) == "100")
    val s = p("s")
    assert(s.getLong(2) == 1 && s.getLong(3) == 2)
    assert(s.getString(4) == "a" && s.getString(5) == "b")
  }

  test("profileTable: approxDistinct tracks exact within HLL error") {
    val exact = ProfileOps.profileTable(corpus)
      .select("col_name", "n_distinct").as[(String, Long)].collect().toMap
    val approx = ProfileOps.profileTable(corpus, approxDistinct = true)
      .select("col_name", "n_distinct").as[(String, Long)].collect().toMap
    exact.foreach { case (c, nd) =>
      assert(math.abs(approx(c) - nd) <= math.max(1L, (nd * 0.08).toLong),
        s"$c: approx ${approx(c)} vs exact $nd")
    }
    // and column selection restricts the output
    assert(ProfileOps.profileTable(corpus, Seq("lang")).count() == 1)
  }

  test("keySkew: rank order, basis-point shares, null bucket visible") {
    val df = (Seq.fill(6)("a") ++ Seq.fill(3)("b") ++
      Seq.fill(3)(null: String) ++ Seq("c")).toDF("k")
    val top = ProfileOps.keySkew(df, "k", 3).collect()
    assert(top.map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L))
    // cnt=6 -> a; tie at cnt=3 -> NULLS FIRST puts the null bucket
    // ahead of "b" (the explicit cross-engine tie-break)
    assert(top(0).getString(1) == "a" && top(0).getLong(2) == 6)
    assert(top(1).isNullAt(1) && top(1).getLong(2) == 3)
    assert(top(2).getString(1) == "b")
    // shares: 6/13 and 3/13 in integer basis points (floor)
    assert(top(0).getLong(3) == 6L * 10000 / 13)
    assert(top(1).getLong(3) == 3L * 10000 / 13)
  }

  test("histogramInt: hand-computed bins, edge-bin clamping") {
    val df = Seq(0L, 49L, 50L, 99L, 100L, 599L, -5L, 700L).toDF("v")
    val h = ProfileOps.histogramInt(df, "v", nBins = 12, lo = 0L, hi = 600L)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2),
        r.getLong(3))).toMap
    // bin 0 covers [0,50): values 0, 49, and the clamped -5
    assert(h(0L) == ((0L, 50L, 3L)))
    // bin 1 covers [50,100): 50 and 99
    assert(h(1L) == ((50L, 100L, 2L)))
    assert(h(2L) == ((100L, 150L, 1L)))
    // top bin holds the in-range max AND the clamped overflow
    assert(h(11L) == ((550L, 600L, 2L)))
    assert(h.values.map(_._3).sum == df.count())
  }

  test("histogramInt: corpus lengths — counts conserve, bins ordered") {
    val h = ProfileOps.histogramInt(corpus, "n_chars", 12, 0L, 600L)
      .collect()
    assert(h.map(_.getLong(3)).sum ==
      corpus.filter(col("n_chars").isNotNull).count())
    assert(h.map(_.getLong(0)).toSeq == h.map(_.getLong(0)).sorted.toSeq)
  }

  test("vocabGrowth == brute-force hash-order accumulation") {
    import spark.implicits._
    val step = 20L
    // independent witness: order docs by the same engine-neutral hash,
    // walk them accumulating the distinct-unit set, snapshot per step
    val docs = corpus.select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    def h60(s: String): Long = java.lang.Long.parseLong(
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
        .take(15), 16)
    val ordered = docs.sortBy { case (id, _) => (h60(id.toString), id) }
    def unitsOf(text: String, n: Int): Seq[String] = {
      val t = "\\S+".r.findAllIn(text).toSeq
      if (n == 1) t else t.sliding(n).filter(_.length == n)
        .map(_.mkString(" ")).toSeq
    }
    def brute(n: Int): Seq[(Long, Long, Long, Long)] = {
      val seen = scala.collection.mutable.Set.empty[String]
      val curve =
        scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long)]
      var newAtCp = 0L
      ordered.zipWithIndex.foreach { case ((_, text), i) =>
        val before = seen.size
        seen ++= unitsOf(text, n)
        newAtCp += seen.size - before
        val rank = i + 1L
        if (rank % step == 0 || rank == ordered.length) {
          val cp = (rank + step - 1) / step
          if (newAtCp > 0) curve += ((cp, rank, newAtCp))
          newAtCp = 0L
        }
      }
      curve.zip(curve.scanLeft(0L)(_ + _._3).drop(1))
        .map { case ((cp, nd, nw), cum) => (cp, nd, nw, cum) }.toSeq
    }
    for (n <- Seq(1, 2)) {
      val expected = brute(n)
      val got = ProfileOps.vocabGrowth(corpus, step, n)
        .as[(Long, Long, Long, Long)].collect().toSeq
      assert(got == expected, s"n=$n")
      // empty checkpoints are absent (the histogramInt convention), so
      // coverage is checked on totals: final cumulative count IS the
      // corpus-wide distinct-unit count, per-checkpoint news sum to it
      val vocabSize =
        docs.flatMap(d => unitsOf(d._2, n)).toSet.size.toLong
      assert(got.last._4 == vocabSize, s"n=$n")
      assert(got.map(_._3).sum == vocabSize, s"n=$n")
      // Heaps-law shape: the first checkpoint is the largest single
      // contributor on any natural-ish corpus
      assert(got.head._3 == got.map(_._3).max, s"n=$n")
      // layout independence: identical under a different partitioning
      val reparted = ProfileOps.vocabGrowth(corpus.repartition(7), step, n)
        .as[(Long, Long, Long, Long)].collect().toSeq
      assert(reparted == expected, s"n=$n")
    }
  }

  test("profileDrift: per-column deltas, schema drift survives, null-safe flag") {
    import spark.implicits._
    val before = Seq((1L, "x", 10L), (2L, "y", 20L), (3L, null, 30L))
      .toDF("id", "s", "v")
    val after = Seq((1L, "x"), (2L, "z"), (4L, "z"), (5L, "w"))
      .toDF("id", "s") // column v dropped: schema drift
    val got = ProfileOps.profileDrift(before, after).collect()
      .map(r => r.getString(0) -> r).toMap
    val id = got("id")
    assert(id.getLong(1) == 3 && id.getLong(2) == 4)   // rows
    assert(id.getLong(5) == 3 && id.getLong(6) == 4)   // distinct
    assert(id.getBoolean(7))                            // max 3 -> 5
    val s = got("s")
    assert(s.getLong(3) == 1 && s.getLong(4) == 0)      // nulls
    assert(s.getBoolean(7))                             // max y -> z
    val v = got("v")                                    // dropped column
    assert(v.getLong(1) == 3 && v.isNullAt(2))
    assert(v.getBoolean(7))                             // present -> absent
    // identical snapshots: nothing changes
    val same = ProfileOps.profileDrift(before, before).collect()
    assert(same.forall(!_.getBoolean(7)))
  }

  test("distributionDrift: hand-computed PSI terms; identical snapshots -> 0") {
    val a = Seq("x", "x", "x", "y").toDF("k")
    val b = Seq("x", "y", "y", "z").toDF("k")
    val got = ProfileOps.distributionDrift(a, b, Seq("k")).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2),
        r.getDouble(3))).toMap
    // Laplace-smoothed over 3 buckets, totals 4+3=7 each side:
    // p_a = (cnt_a+1)/7, p_b = (cnt_b+1)/7
    def psi(ca: Long, cb: Long): Double = {
      val pa = (ca + 1).toDouble / 7; val pb = (cb + 1).toDouble / 7
      BigDecimal((pa - pb) * math.log(pa / pb))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    assert(got("x") == ((3L, 1L, psi(3, 1))))
    assert(got("y") == ((1L, 2L, psi(1, 2))))
    assert(got("z") == ((0L, 1L, psi(0, 1))))
    // every term is non-negative; a bucket present on one side only
    // still gets finite mass
    assert(got.values.forall(_._3 >= 0.0))
    // identical snapshots: zero drift in every bucket
    val same = ProfileOps.distributionDrift(a, a, Seq("k")).collect()
    assert(same.forall(_.getDouble(3) == 0.0))
  }

  test("distributionDrift is symmetric: psi(a,b) == psi(b,a) per bucket") {
    // (p-q)·ln(p/q) is symmetric under p<->q — swapping the snapshots
    // must flip the count columns and leave every PSI term unchanged
    val before = corpus.filter(col("doc_id") % 7 =!= 0)
    val after = corpus.filter(col("doc_id") % 5 =!= 0)
    val ab = ProfileOps.distributionDrift(before, after, Seq("source"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    val ba = ProfileOps.distributionDrift(after, before, Seq("source"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(ab.keySet == ba.keySet && ab.nonEmpty)
    ab.foreach { case (k, (ca, cb, psi)) =>
      assert(ba(k) == ((cb, ca, psi)), s"bucket $k not symmetric")
    }
  }

  test("distributionDrift on the corpus: multi-key, layout-independent") {
    val before = corpus.filter(col("doc_id") % 7 =!= 0)
      .withColumn("len_bucket", expr("n_chars DIV 100"))
    val after = corpus.filter(col("doc_id") % 5 =!= 0)
      .withColumn("len_bucket", expr("n_chars DIV 100"))
    val keys = Seq("source", "len_bucket")
    val got = ProfileOps.distributionDrift(before, after, keys).collect()
    assert(got.nonEmpty && got.forall(_.getDouble(4) >= 0.0))
    val reparted = ProfileOps.distributionDrift(
      before.repartition(7), after.repartition(3), keys).collect()
    assert(got.map(_.toSeq).toSeq == reparted.map(_.toSeq).toSeq)
  }
}
