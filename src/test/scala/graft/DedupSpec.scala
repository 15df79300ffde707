package graft

import graft.operators.Dedup
import org.apache.spark.sql.functions._

class DedupSpec extends SparkSpec {
  import spark.implicits._

  // doc 1/2 identical; doc 3 a near-dup of 1 (one word changed);
  // doc 4 unrelated.
  private val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
  private val docs = Seq(
    (1L, base, "en", "s", 10L),
    (2L, base, "en", "s", 10L),
    (3L, base.replace("epsilon", "omega"), "en", "s", 10L),
    (4L, "one two three four five six seven eight nine ten", "en", "s", 10L),
  ).toDF("doc_id", "text", "lang", "source", "n_chars")

  test("exact dedup groups identical texts, keeps min doc_id") {
    val r = Dedup.exact(docs).as[(String, Long, Long)].collect()
    assert(r.length == 3)
    val dupGroup = r.find(_._3 == 2L).get
    assert(dupGroup._2 == 1L)
  }

  test("ngram Jaccard finds identical pair at 1.0, near-dup pair in between") {
    val got = Dedup.ngramJaccard(docs, n = 3, threshold = 0.3)
      .as[(Long, Long, Double)].collect().toSeq
    val asMap = got.map(r => (r._1, r._2) -> r._3).toMap
    assert(asMap((1L, 2L)) == 1.0)
    assert(asMap.contains((1L, 3L)) && asMap((1L, 3L)) < 1.0)
    assert(!asMap.keySet.exists { case (a, b) => a == 4L || b == 4L })
  }

  test("minhash LSH (verified) equals exact ngram Jaccard on sf0.001 corpus") {
    val corpus = spark.read.parquet(s"$sfDir/documents.parquet")
    val exact = Dedup.ngramJaccard(corpus, n = 3, threshold = 0.8)
    val lsh = Dedup.minhashLsh(corpus, n = 3, threshold = 0.8)
    assert(exact.count() == lsh.count())
    assert(exact.exceptAll(lsh).isEmpty && lsh.exceptAll(exact).isEmpty)
    assert(exact.count() > 0, "corpus should contain planted near-dups")
  }

  test("prefix-filtered AllPairs == uncapped exact Jaccard; boundary pair found") {
    // planted boundary: B = A minus its first word -> 5 vs 4 trigrams
    // sharing 4, J = 4/5 = 0.8 EXACTLY. If the prefix arithmetic ever
    // over-shortened (the IEEE ceil(0.8*5)=5 hazard the integer DIV
    // avoids), this is the pair that would vanish.
    val boundary = Seq(
      (10L, "w1 w2 w3 w4 w5 w6 w7", "en", "s", 20L),
      (11L, "w2 w3 w4 w5 w6 w7", "en", "s", 17L),
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val fix = docs.unionByName(boundary)
    val exactF = Dedup.ngramJaccard(fix, n = 3, threshold = 0.8,
      maxDocFreq = 0L)
    val prefF = Dedup.ngramJaccardPrefix(fix, n = 3, threshold = 0.8)
    assert(prefF.exceptAll(exactF).isEmpty && exactF.exceptAll(prefF).isEmpty)
    assert(prefF.as[(Long, Long, Double)].collect()
      .contains((10L, 11L, 0.8)), "the J = 0.8 boundary pair must survive")
    // and on the real corpus, at a lower threshold too (longer prefixes)
    val corpus = spark.read.parquet(s"$sfDir/documents.parquet")
    for (t <- Seq(0.8, 0.5)) {
      val exact = Dedup.ngramJaccard(corpus, n = 3, threshold = t,
        maxDocFreq = 0L)
      val pref = Dedup.ngramJaccardPrefix(corpus, n = 3, threshold = t)
      assert(exact.exceptAll(pref).isEmpty && pref.exceptAll(exact).isEmpty,
        s"prefix join must equal uncapped exact at t=$t")
    }
    assert(Dedup.ngramJaccardPrefix(corpus, n = 3, threshold = 0.8)
      .count() > 0, "corpus should contain planted near-dups")
  }

  test("containment: catches the quoted-doc case Jaccard misses; " +
      "directions independent; brute-force parity on sf0.001") {
    // doc 2 = doc 1 verbatim inside 14 extra words: c(1->2) = 1.0
    // while J = 4/18 = 0.22 — invisible to any Jaccard threshold
    val host = "h1 h2 h3 h4 h5 h6 h7 a b c d e f h8 h9 h10 h11 h12 h13 h14"
    val fix = Seq(
      (1L, "a b c d e f", "en", "s", 11L),
      (2L, host, "en", "s", host.length.toLong),
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val got = Dedup.ngramContainment(fix, n = 3, threshold = 0.9)
      .as[(Long, Long, Double)].collect().toSeq
    assert(got == Seq((1L, 2L, 1.0)), s"got $got")
    // and Jaccard at the same threshold indeed misses it
    assert(Dedup.ngramJaccard(fix, n = 3, threshold = 0.9,
      maxDocFreq = 0L).count() == 0)
    // corpus: every emitted direction equals the brute-force ratio
    val corpus = spark.read.parquet(s"$sfDir/documents.parquet")
    val sets = corpus.select("doc_id", "text").as[(Long, String)]
      .collect().map { case (id, t) =>
        id -> t.split("\\s+").filter(_.nonEmpty).sliding(3)
          .filter(_.size == 3).map(_.mkString(" ")).toSet
      }.filter(_._2.nonEmpty).toMap
    // df <= 1000 never binds at sf0.001, so brute force is exact here
    val want = (for {
      (a, sa) <- sets.toSeq; (b, sb) <- sets.toSeq if a != b
      common = sa.intersect(sb).size
      if common.toLong * 10000 >= sa.size.toLong * 9000
    } yield (a, b, BigDecimal(common.toDouble / sa.size)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble))
      .sortBy(r => (r._1, r._2))
    val gotC = Dedup.ngramContainment(corpus, n = 3, threshold = 0.9)
      .as[(Long, Long, Double)].collect().toSeq
    assert(gotC == want)
    assert(gotC.nonEmpty, "corpus should contain containment cases")
  }

  test("MinHashMins kernel == plain-Scala witness on the corpus") {
    // the witness re-derives every doc's component minima from first
    // principles: \S+ tokens, 3-gram space-joined shingles, first 15
    // hex chars of md5 as the 60-bit base hash, the kernel's own
    // affine wrap-mix constants, signed min
    import graft.functions.MinHashMins
    val corpus = spark.read.parquet(s"$sfDir/documents.parquet")
    val got = corpus.select(col("doc_id"),
        org.apache.spark.sql.graft.ColumnBridge.column(
          MinHashMins(org.apache.spark.sql.graft.ColumnBridge
            .expression(col("text")), 3, 16)).as("m"))
      .filter(col("m").isNotNull)
      .as[(Long, Seq[Long])].collect().toMap
    val md = java.security.MessageDigest.getInstance("MD5")
    def h60(s: String): Long = {
      val hex = md.digest(s.getBytes("UTF-8"))
        .map(b => f"$b%02x").mkString.take(15)
      java.lang.Long.parseLong(hex, 16)
    }
    val want = corpus.select("doc_id", "text").as[(Long, String)]
      .collect().flatMap { case (id, t) =>
        val sh = t.split("\\s+").filter(_.nonEmpty).sliding(3)
          .filter(_.size == 3).map(_.mkString(" ")).toSeq
        if (sh.isEmpty) None
        else Some(id -> (0 until 16).map(i =>
          sh.map(s => h60(s) * MinHashMins.a(i) + MinHashMins.b(i)).min))
      }.toMap
    assert(got.keySet == want.keySet)
    got.foreach { case (id, m) => assert(m == want(id), s"doc $id") }
  }

  test("corpusDiversity: exact on a planted 0/1-Jaccard corpus; " +
      "tracks brute-force mean J on sf0.001") {
    // 3 identical docs + 2 unrelated: mean pairwise J = 3/10 exactly,
    // and the minhash estimator is EXACT when every J is 0 or 1
    val planted = Seq(
      (1L, "a b c d e f", "en", "s", 11L),
      (2L, "a b c d e f", "en", "s", 11L),
      (3L, "a b c d e f", "en", "s", 11L),
      (4L, "p q r s t u", "en", "s", 11L),
      (5L, "v w x y z zz", "en", "s", 12L),
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val got = Dedup.corpusDiversity(planted)
      .as[(Long, Long, Long, Long, Long)].collect().head
    assert(got == ((5L, 10L, 16L, 48L, 300000L)),
      s"planted diversity mismatch: $got")
    // per-source form: the duplicated source reports 3/10 exactly,
    // clean sources 0; a single-doc source reports 0 pairs
    val bySrc = Dedup.sourceDiversity(planted
      .withColumn("source",
        org.apache.spark.sql.functions.when(
          col("doc_id") <= 3, "dup").otherwise(
          org.apache.spark.sql.functions.concat(
            org.apache.spark.sql.functions.lit("s"), col("doc_id")))))
      .as[(String, Long, Long, Long, Long)].collect().toSeq
    assert(bySrc == Seq(
      ("dup", 3L, 3L, 48L, 1000000L),
      ("s4", 1L, 0L, 0L, 0L), ("s5", 1L, 0L, 0L, 0L)))
    // estimator vs brute-force truth on the corpus
    val corpus = spark.read.parquet(s"$sfDir/documents.parquet")
    val est = Dedup.corpusDiversity(corpus)
      .as[(Long, Long, Long, Long, Long)].collect().head
    val sets = corpus.select("doc_id", "text").as[(Long, String)]
      .collect().map { case (id, t) =>
        id -> t.split("\\s+").filter(_.nonEmpty).sliding(3)
          .filter(_.size == 3).map(_.mkString(" ")).toSet
      }.filter(_._2.nonEmpty)
    val js = for {
      i <- sets.indices; j <- (i + 1) until sets.length
    } yield {
      val (a, b) = (sets(i)._2, sets(j)._2)
      a.intersect(b).size.toDouble / a.union(b).size
    }
    val truth = js.sum / js.size
    assert(est._1 == sets.length && est._2 == js.size.toLong)
    assert(math.abs(est._5 / 1e6 - truth) < 0.02,
      s"estimate ${est._5 / 1e6} vs truth $truth")
  }

  test("ngram cosine: identical pair at 1.0; equals brute force on sf0.001") {
    val got = Dedup.ngramCosine(docs, n = 3, threshold = 0.3)
      .as[(Long, Long, Double)].collect().toSeq
    val asMap = got.map(r => (r._1, r._2) -> r._3).toMap
    assert(asMap((1L, 2L)) == 1.0)
    assert(asMap.contains((1L, 3L)) && asMap((1L, 3L)) < 1.0)
    // weighted semantics: frequency vectors, verified against a
    // driver-side brute force over the whole sf0.001 corpus
    val corpus = spark.read.parquet(s"$sfDir/documents.parquet")
    val gotC = Dedup.ngramCosine(corpus, n = 3, threshold = 0.8)
      .as[(Long, Long, Double)].collect().toSet
    def grams(t: String): Map[String, Long] =
      t.split("\\s+").filter(_.nonEmpty).sliding(3).filter(_.length == 3)
        .map(_.mkString(" ")).toSeq.groupBy(identity)
        .map { case (g, o) => g -> o.size.toLong }
    val vecs = corpus.select("doc_id", "text").as[(Long, String)]
      .collect().map { case (id, t) => id -> grams(t) }
      .filter(_._2.nonEmpty).sortBy(_._1)
    val want = (for {
      i <- vecs.indices; j <- (i + 1) until vecs.length
      (ia, va) = vecs(i); (ib, vb) = vecs(j)
      dot = va.keySet.intersect(vb.keySet).toSeq
        .map(g => va(g) * vb(g)).sum
      cos = dot.toDouble / (math.sqrt(va.values.map(x => x * x).sum
        .toDouble) * math.sqrt(vb.values.map(x => x * x).sum.toDouble))
      if cos >= 0.8
    } yield (ia, ib,
      BigDecimal(cos).setScale(4, BigDecimal.RoundingMode.HALF_UP)
        .toDouble)).toSet
    assert(gotC == want)
    assert(gotC.nonEmpty)
  }

  test("incremental exact: drops vs-base and within-batch dups, keeps first") {
    val baseCorpus = Seq(
      (1L, "aa bb cc", "en", "s", 8L),
      (2L, "dd ee ff", "en", "s", 8L),
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val batch = Seq(
      (10L, "aa bb cc", "en", "s", 8L), // re-delivery of base doc 1
      (11L, "gg hh ii", "en", "s", 8L), // new
      (12L, "gg hh ii", "en", "s", 8L), // within-batch dup of 11
      (13L, "jj kk ll", "en", "s", 8L), // new
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val got = Dedup.incrementalExact(baseCorpus, batch)
    assert(got.select("doc_id").as[Long].collect().toSeq == Seq(11L, 13L))
    assert(got.columns.contains("fp_md5"))
  }

  test("incremental near-dup probe equals exact cross-set Jaccard on sf0.001") {
    val corpus = spark.read.parquet(s"$sfDir/documents.parquet")
    val baseCorpus = corpus.filter(pmod(col("doc_id"), lit(4)) =!= 0)
    val batch = corpus.filter(pmod(col("doc_id"), lit(4)) === 0)
    val got = Dedup.incrementalNearDupPairs(baseCorpus, batch)
      .as[(Long, Long, Double)].collect().toSet
    // exact witness: the uncapped self-join pairs that cross the split,
    // re-oriented to (batch, base)
    val exact = Dedup.ngramJaccard(corpus, n = 3, threshold = 0.8,
        maxDocFreq = 0)
      .as[(Long, Long, Double)].collect()
      .filter { case (a, b, _) => (a % 4 == 0) != (b % 4 == 0) }
      .map { case (a, b, j) =>
        if (a % 4 == 0) (a, b, j) else (b, a, j) }
      .toSet
    assert(got == exact)
    assert(got.nonEmpty, "split should leave cross-set near-dup pairs")
  }

  test("incremental simhash probe equals the exact cross-set Hamming join") {
    import graft.functions.TextAnalysis.md5Hash60
    val corpus = spark.read.parquet(s"$sfDir/documents.parquet")
    val baseCorpus = corpus.filter(pmod(col("doc_id"), lit(4)) =!= 0)
    val batch = corpus.filter(pmod(col("doc_id"), lit(4)) === 0)
    val got = Dedup.incrementalSimhashPairs(baseCorpus, batch)
      .as[(Long, Long, Long)].collect().toSet
    // exact witness: full portable-fingerprint cross join (banding is
    // exhaustive for hamming <= 3, so the probe must find everything)
    val fp = Dedup.simhash(corpus, bits = 60, hasher = md5Hash60)
      .as[(Long, Long)].collect().toMap
    val exact = (for {
      (q, qh) <- fp if q % 4 == 0
      (b, bh) <- fp if b % 4 != 0
      d = java.lang.Long.bitCount(qh ^ bh) if d <= 3
    } yield (q, b, d.toLong)).toSet
    assert(got == exact)
    // sides are clean: every left id is batch, every right id is base
    got.foreach { case (q, b, _) =>
      assert(q % 4 == 0 && b % 4 != 0, s"pair ($q, $b) leaks a side") }
  }

  test("simhashProjection == aggregate simhash on repetition-heavy and " +
      "non-ASCII texts") {
    import graft.functions.TextAnalysis.md5Hash60
    // duplicate tokens must vote once PER OCCURRENCE (multiset ±1
    // sums), and non-ASCII tokens must hash identically on both paths
    val docs = Seq(
      (1L, ("spam " * 50).trim),
      (2L, "unique words only here"),
      (3L, "héllo wörld héllo wörld héllo ßeta"),
      (4L, "a b a b a b a b a c"),
      (5L, "solo")).toDF("doc_id", "text")
    val viaAgg = Dedup.simhash(docs, bits = 60, hasher = md5Hash60)
      .as[(Long, Long)].collect().toMap
    val viaProj = docs.select($"doc_id",
      Dedup.simhashProjection($"text").as("sh"))
      .as[(Long, Long)].collect().toMap
    viaAgg.foreach { case (id, sh) =>
      assert(viaProj(id) == sh, s"doc $id diverges") }
  }

  test("splitIncremental plants bind: survivors are exactly the fresh docs") {
    val corpus = spark.read.parquet(s"$sfDir/documents.parquet")
    val (baseCorpus, batch) = Dedup.splitIncremental(corpus)
    val fresh = corpus.filter(pmod(col("doc_id"), lit(4)) === 0)
    val nDupNew = fresh.filter(pmod(col("doc_id"), lit(5)) === 0).count()
    val nRedel =
      baseCorpus.filter(pmod(col("doc_id"), lit(7)) === 1).count()
    assert(nDupNew > 0 && nRedel > 0, "both plant kinds must exist")
    assert(batch.count() == fresh.count() + nDupNew + nRedel)
    val surv = Dedup.incrementalExact(baseCorpus, batch)
    assert(surv.select("doc_id").as[Long].collect().toSet ==
      fresh.select("doc_id").as[Long].collect().toSet)
  }

  test("simhash: identical docs collide, hamming 0") {
    val pairs = Dedup.simhashPairs(docs, maxHamming = 3)
      .as[(Long, Long, Int)].collect().toSeq
    assert(pairs.exists(p => p._1 == 1L && p._2 == 2L && p._3 == 0))
  }

  test("simhash near-dup has small distance; maxDocFreq caps fanout") {
    val sh = Dedup.simhash(docs).as[(Long, Long)].collect().toMap
    val ham13 = java.lang.Long.bitCount(sh(1L) ^ sh(3L))
    val ham14 = java.lang.Long.bitCount(sh(1L) ^ sh(4L))
    assert(ham13 < ham14)
    // maxDocFreq=1 drops every shared shingle -> no pairs survive
    val capped = Dedup.ngramJaccard(docs, 3, 0.1, maxDocFreq = 1)
    assert(capped.count() == 0)
  }

  test("skew guard surfaces when it binds: observed metric + stopShingles audit") {
    // maxDocFreq=2 drops the df=3 shingles docs 1/2/3 share. The run
    // must SAY so — dropped_shingles rides the df-count pass that runs
    // anyway (no extra job), readable straight off the caller's
    // queryExecution — and stopShingles materializes the dropped rows.
    val capped = Dedup.ngramJaccard(docs, 3, 0.1, maxDocFreq = 2)
    capped.collect()
    val row = capped.queryExecution.observedMetrics(Dedup.SKEW_GUARD_METRIC)
    val dropped = row.getAs[Long]("dropped_shingles")
    assert(dropped > 0, s"cap binds on this fixture, metric says $dropped")
    assert(row.getAs[Long]("distinct_shingles") > dropped)
    assert(row.getAs[Long]("max_df") == 3L) // deepest posting list: docs 1,2,3
    // the audit relation lists exactly the dropped (shingle, df) rows
    val stops = Dedup.stopShingles(docs, 3, maxDocFreq = 2)
      .as[(String, Long)].collect()
    assert(stops.length == dropped)
    assert(stops.forall(_._2 > 2))
    // an unbinding cap reports zero — silence means genuinely lossless
    val loose = Dedup.ngramJaccard(docs, 3, 0.1, maxDocFreq = 100)
    loose.collect()
    assert(loose.queryExecution.observedMetrics(Dedup.SKEW_GUARD_METRIC)
      .getAs[Long]("dropped_shingles") == 0L)
    // the documented caveat: a cap that empties the RESULT lets AQE
    // empty-relation propagation erase the metrics node — the metric
    // is absent, and stopShingles is the audit that still works. If
    // this assert starts failing, Spark keeps metrics through empty
    // propagation and the docstring caveat can go.
    val emptied = Dedup.ngramJaccard(docs, 3, 0.1, maxDocFreq = 1)
    assert(emptied.collect().isEmpty)
    assert(!emptied.queryExecution.observedMetrics
      .contains(Dedup.SKEW_GUARD_METRIC))
    assert(Dedup.stopShingles(docs, 3, maxDocFreq = 1).count() > 0)
  }

  test("portable simhash: engine-neutral hash value; banding equals brute force") {
    // the value DuckDB computes for ('0x' || substr(md5('hello'),1,15))::BIGINT
    val h = docs.select(graft.functions.TextAnalysis.md5Hash60(lit("hello")))
      .as[Long].head()
    assert(h == 419982666956583591L)
    val corpus = spark.read.parquet(s"$sfDir/documents.parquet")
    val fp = Dedup.simhash(corpus, bits = 60,
      hasher = graft.functions.TextAnalysis.md5Hash60)
      .as[(Long, Long)].collect().toMap
    val brute = (for {
      (a, ha) <- fp.toSeq; (b, hb) <- fp.toSeq if a < b
      ham = java.lang.Long.bitCount(ha ^ hb) if ham <= 3
    } yield (a, b, ham)).toSet
    val banded = Dedup.simhashPairsPortable(corpus)
      .as[(Long, Long, Int)].collect().toSet
    assert(banded == brute)
    assert(banded.nonEmpty) // identical planted dups collide at hamming 0
  }

  test("simhashKernel == aggregate witness fingerprints, both hash modes; " +
      "token-less docs drop like the aggregate") {
    import graft.functions.TextAnalysis.md5Hash60
    val corpus = spark.read.parquet(s"$sfDir/documents.parquet")
    // portable md5-60 mode (the oracled face)
    val kMd5 = Dedup.simhashKernel(corpus, bits = 60, portable = true)
      .as[(Long, Long)].collect().toMap
    val wMd5 = Dedup.simhash(corpus, bits = 60, hasher = md5Hash60)
      .as[(Long, Long)].collect().toMap
    assert(kMd5 == wMd5)
    // production xxhash64 mode (the slice-hash offset path)
    val kXx = Dedup.simhashKernel(corpus, bits = 64, portable = false)
      .as[(Long, Long)].collect().toMap
    val wXx = Dedup.simhash(corpus).as[(Long, Long)].collect().toMap
    assert(kXx == wXx)
    // empty / whitespace-only / null docs: the aggregate form emits no
    // row (explode of an empty token array) — the kernel must match;
    // the streaming projection folds the same docs to fingerprint 0
    val edge = Seq((1L, ""), (2L, " \t\n "), (3L, "tok"), (4L, null))
      .toDF("doc_id", "text")
    assert(Dedup.simhashKernel(edge, bits = 60, portable = true)
      .select("doc_id").as[Long].collect().toSet == Set(3L))
    val proj = edge.select($"doc_id",
      Dedup.simhashProjection($"text").as("sh"))
      .as[(Long, Long)].collect().toMap
    assert(proj(1L) == 0L && proj(2L) == 0L && proj(4L) == 0L &&
      proj(3L) != 0L)
  }

  test("embedding LSH near-dup: subset of exact pairs, high recall") {
    val embs = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val exact = Dedup.embeddingNearDup(embs, threshold = 0.4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Dedup.embeddingNearDupLsh(embs, threshold = 0.4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh.subsetOf(exact)) // every emitted pair is exact-verified
    assert(exact.nonEmpty)
    assert(lsh.size >= exact.size * 9 / 10, // OR-amplified recall
      s"recall ${lsh.size}/${exact.size}")
  }

  test("injected axis-plane LSH == the plain-Scala sign-bucket witness") {
    // the harness regime (q_dedup_embedding_lsh): table t's bucket bit
    // j is sign(v[4t+j]); a pair is a candidate iff it shares a bucket
    // in ANY of the 4 tables, and survives iff its exact cosine >= t
    val embs = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val planes = Seq.tabulate(4)(t => Seq.tabulate(4)(j =>
      Seq.tabulate(64)(i => if (i == 4 * t + j) 1.0 else 0.0)))
    val lsh = Dedup.embeddingNearDupLsh(embs, threshold = 0.4,
      planes = Some(planes))
    val got = lsh.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // the candidate-volume telemetry rides the run: implied pair
    // fan-out bounds the verified output, and no bucket hit the cap
    val metric = lsh.queryExecution
      .observedMetrics(Dedup.lshCandidateMetricName(4, 4, 42L))
    assert(metric.getAs[Long]("bucket_pairs") >= got.size)
    assert(metric.getAs[Long]("skipped_buckets") == 0L)
    assert(metric.getAs[Int]("max_bucket") > 1)
    val vecs = embs.collect().map(r => r.getLong(0) ->
      r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    def bucket(v: Array[Double], t: Int): Int =
      (0 until 4).map(j => if (v(4 * t + j) > 0) 1 << j else 0).sum
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1
      }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    val ids = vecs.keys.toSeq.sorted
    val want = (for {
      ai <- ids.indices; bi <- (ai + 1) until ids.length
      a = ids(ai); b = ids(bi)
      if (0 until 4).exists(t => bucket(vecs(a), t) == bucket(vecs(b), t))
      if cos(vecs(a), vecs(b)) >= 0.4
    } yield (a, b)).toSet
    assert(got == want)
    assert(want.nonEmpty)
    // incremental mode under the same planes: the batch (vec_id % 4
    // == 0) probing the base's bucket index must emit exactly the
    // witness's CROSS-SET co-bucket pairs above threshold — and
    // nothing base-base or batch-batch
    val incr = Dedup.incrementalEmbeddingNearDup(
      embs.filter(col("vec_id") % 4 =!= 0),
      embs.filter(col("vec_id") % 4 === 0),
      threshold = 0.4, planes = Some(planes))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val wantIncr = (for {
      q <- ids if q % 4 == 0; b <- ids if b % 4 != 0
      if (0 until 4).exists(t => bucket(vecs(q), t) == bucket(vecs(b), t))
      if cos(vecs(q), vecs(b)) >= 0.4
    } yield (q, b)).toSet
    assert(incr == wantIncr)
    assert(incr.nonEmpty)
    assert(incr.forall { case (q, b) => q % 4 == 0 && b % 4 != 0 })
    // ragged injected tables are rejected, not silently mis-bucketed
    intercept[IllegalArgumentException] {
      Dedup.embeddingNearDupLsh(embs, threshold = 0.4,
        planes = Some(Seq(planes.head, planes(1).take(2))))
    }
    intercept[IllegalArgumentException] {
      Dedup.incrementalEmbeddingNearDup(embs, embs, threshold = 0.4,
        planes = Some(Seq(planes.head, planes(1).take(2))))
    }
    intercept[IllegalArgumentException] {
      graft.operators.Similarity.lshTopK(embs, col("vec_id") < 2, k = 3,
        planes = Some(Seq(planes.head, planes(1).take(2))))
    }
  }

  test("production-threshold LSH (cos>=0.9): full recall, real pruning") {
    import graft.functions.Vectors
    val planted = Dedup.plantNearDups(
      spark.read.parquet(s"$sfDir/embeddings.parquet"))
    val n = planted.count()
    val exact = Dedup.embeddingNearDup(planted, threshold = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // every planted vector pairs with its source at cos >= 0.999
    assert(exact.size >= (n / 6).toInt && exact.nonEmpty)
    val lsh = Dedup.embeddingNearDupLsh(planted, threshold = 0.9,
        nPlanes = 16, nTables = 32)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh.subsetOf(exact)) // exact-verified candidates
    assert(lsh.size * 100 >= exact.size * 99, // >= 99% recall
      s"recall ${lsh.size}/${exact.size}")
    // pruning: in THIS regime (16-bit codes) the candidate relation is
    // a sliver of the n^2/2 all-pairs space — the whole point of the
    // operator at 100 TB; at the low-threshold 4-bit regime it is not
    // (documented honestly on embeddingNearDupLsh).
    val e = planted.select(col("vec_id"),
      Vectors.toDoubleVec(col("embedding")).as("v"))
    val cands = Dedup.embeddingLshCandidates(e, nPlanes = 16, nTables = 32)
      .count()
    val allPairs = n * (n - 1) / 2
    assert(cands >= lsh.size, "candidates must cover every emitted pair")
    assert(cands * 10 < allPairs,
      s"candidates $cands not << $allPairs all-pairs")
  }

  test("semantic dedup: nCells=1 equals the global rule; cells only lose pairs") {
    val embs = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val planted = Dedup.plantNearDups(embs)
    val all = planted.select("vec_id").as[Long].collect().toSet
    // global drop rule from the exact pair relation: drop every vector
    // with a smaller-id neighbor at cos >= t
    val droppedGlobal = Dedup.embeddingNearDup(planted, threshold = 0.9)
      .select("vec_b").as[Long].collect().toSet
    val expectGlobal = (all -- droppedGlobal).toSeq.sorted
    // nCells = 1: every vector shares the one cell -> exactly global
    val oneCell = Dedup.semanticDedup(planted, threshold = 0.9, nCells = 1)
      .as[Long].collect().toSeq
    assert(oneCell == expectGlobal)
    // planted copies all have a smaller-id source at cos >= 0.999, so
    // the global rule keeps exactly the original corpus
    val originals = embs.select("vec_id").as[Long].collect().toSet
    assert(expectGlobal.toSet == originals)
    // partitioned: cells can only MISS cross-cell pairs, never invent
    // drops — survivors are a superset; near-parallel planted pairs
    // land in the same cell almost always, so the overshoot is tiny
    val cells = Dedup.semanticDedup(planted, threshold = 0.9, nCells = 4)
      .as[Long].collect().toSet
    assert(expectGlobal.toSet.subsetOf(cells))
    val missed = cells.size - expectGlobal.size
    assert(missed <= (all.size - originals.size) / 10,
      s"$missed planted pairs straddled cells — centroid geometry broke")
  }

  test("cross-source dup matrix: count arithmetic and attribution") {
    // s1: two identical docs; s2: one exact copy of them + one
    // near-dup; s3: unrelated. Exact pairs never materialize — the
    // counts below are pure c*(c-1)/2 / c_a*c_b arithmetic.
    val d = Seq(
      (1L, base, "en", "s1", 10L),
      (2L, base, "en", "s1", 10L),
      (5L, base, "en", "s2", 10L),
      (6L, base.replace("epsilon", "omega"), "en", "s2", 10L),
      (7L, "one two three four five six seven eight nine ten", "en", "s3", 10L),
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val got = Dedup.crossSourceDupMatrix(d, n = 3, threshold = 0.3)
      .as[(String, String, Long, Long)].collect().toSeq
    assert(got == Seq(
      ("s1", "s1", 1L, 1L),   // C(2,2)=1 exact; (1,2) near
      ("s1", "s2", 2L, 4L),   // 2*1 exact; (1,5)(1,6)(2,5)(2,6) near
      ("s2", "s2", 0L, 1L),   // (5,6) near only
    ))
  }

  test("cross-source dup matrix equals brute force on planted sf0.001") {
    val corpus = spark.read.parquet(s"$sfDir/documents.parquet")
    val planted = Dedup.plantCrossSourceDups(corpus)
    val got = Dedup.crossSourceDupMatrix(planted)
      .as[(String, String, Long, Long)].collect().toSeq
    // brute force over the collected planted corpus
    val rows = planted.select("doc_id", "text", "source")
      .as[(Long, String, String)].collect()
    def sh(t: String): Set[String] =
      t.split("\\s+").filter(_.nonEmpty).sliding(3).filter(_.length == 3)
        .map(_.mkString(" ")).toSet
    val shs = rows.map { case (id, t, _) => id -> sh(t) }.toMap
    val src = rows.map { case (id, _, s) => id -> s }.toMap
    def key(a: Long, b: Long): (String, String) = {
      val (x, y) = (src(a), src(b))
      if (x <= y) (x, y) else (y, x)
    }
    val exact = rows.groupBy(_._2).values.flatMap { g =>
      val ids = g.map(_._1).toSeq
      for (i <- ids.indices; j <- i + 1 until ids.size)
        yield key(ids(i), ids(j))
    }.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val ids = rows.map(_._1).sorted
    val near = (for {
      i <- ids.indices.iterator; j <- (i + 1 until ids.length).iterator
      a = ids(i); b = ids(j)
      sa = shs(a); sb = shs(b)
      if sa.nonEmpty && sb.nonEmpty
      inter = (sa & sb).size
      if inter.toDouble / (sa.size + sb.size - inter) >= 0.8
    } yield key(a, b)).toSeq
      .groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val expect = (exact.keySet ++ near.keySet).toSeq.sorted.map { k =>
      (k._1, k._2, exact.getOrElse(k, 0L), near.getOrElse(k, 0L)) }
    assert(got == expect)
    // both halves bind: planted mirror copies create cross-source
    // exact pairs, re-deliveries create within-source ones
    assert(got.exists(r => r._1 != r._2 && r._3 > 0))
    assert(got.exists(r => r._1 == r._2 && r._3 > 0))
    assert(got.exists(_._4 > 0))
  }

  test("embedding near-dup picks parallel vectors only") {
    val embs = Seq(
      (1L, Array(1.0f, 0.0f, 0.0f), 0),
      (2L, Array(0.99f, 0.1f, 0.0f), 0),
      (3L, Array(0.0f, 1.0f, 0.0f), 1),
    ).toDF("vec_id", "embedding", "label")
    val got = Dedup.embeddingNearDup(embs, 0.9)
      .as[(Long, Long, Double)].collect().toSeq
    assert(got.map(r => (r._1, r._2)) == Seq((1L, 2L)))
    assert(got.head._3 > 0.99)
  }
}
