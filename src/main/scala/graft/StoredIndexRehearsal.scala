package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale rehearsal for the STORED-INDEX probe path
  * (sources/DedupIndexStore): at harness SF the stored probes are
  * oracle-gated; this main measures what storage buys at scale — the
  * per-ingest cost of probing a persisted bucketed index vs the
  * inline operator that rebuilds the base index every call. Three
  * numbers per face:
  *
  *   inline — the full incremental operator (index rebuilt + probe)
  *   build  — one-time: build the index and persist it bucketed
  *   stored — probe the persisted tables only
  *
  * A deployment pays `build` once per corpus version and `stored` per
  * ingest; the inline form pays ~(build + probe) per ingest. The gap
  * between `inline` and `stored` is the re-derivation a 100 TB corpus
  * cannot afford.
  *
  * Usage: `sbt "runMain graft.StoredIndexRehearsal [sfDir]"`,
  * optionally SPARK_GRAFT_FACES=exact,minhash,simhash. Raise
  * SPARK_DRIVER_MEM only as far as the decade needs (16g carries the
  * 100x documents set) — oversized lazy heaps cost parallel
  * first-touch page faults on virtualized hosts (PERF.md §"Driver
  * heap").
  * Prints one JSON line per (face, arm). */
object StoredIndexRehearsal {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/tmp/testdata/sf10")
    val only = sys.env.get("SPARK_GRAFT_FACES")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val buckets = sys.env.getOrElse("SPARK_GRAFT_IDX_BUCKETS", "32").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.operators.Dedup
    import graft.sources.DedupIndexStore
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val base = docs.filter(pmod(col("doc_id"), lit(4)) =!= 0)
    val batch = docs.filter(pmod(col("doc_id"), lit(4)) === 0)
    // optional arm filter (prefix match; unset = all arms) — lets a
    // decade re-run measure only NEW arms without re-paying committed
    // ones. Arms that CONSUME another arm's product (stored probes
    // need 'build', seg serves/compacts need their append arm, the
    // segment-count probes need seg9_append_total) guard with need()/
    // require below: filtering out a producer yields a loud error row
    // naming it, never an NPE or a silently mislabeled measurement.
    val onlyArms = sys.env.get("SPARK_GRAFT_ARMS")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    def need[T](x: T, producer: String): T = {
      require(x != null,
        s"producer arm '$producer' filtered out by SPARK_GRAFT_ARMS")
      x
    }
    def arm(face: String, name: String)(body: => Long): Unit = {
      if (!onlyArms.forall(_.exists(name.startsWith))) return
      val t0 = System.nanoTime()
      try {
        val n = body
        val sec = (System.nanoTime() - t0) / 1e9
        println(f"""{"face":"$face","arm":"$name","sec":$sec%.1f,"rows":$n}""")
      } catch { case e: Throwable =>
        val msg = String.valueOf(e.getMessage).takeWhile(_ != '\n')
          .replace("\\", "\\\\").replace("\"", "\\\"")
        println(s"""{"face":"$face","arm":"$name","error":"$msg"}""")
      }
    }
    def face(name: String)(body: => Unit): Unit =
      if (only.forall(_.contains(name))) body
    // .count() materializes the probe work on the executors (the
    // terminal orderBy is elided identically in both arms)
    face("exact") {
      arm("exact", "inline") { Dedup.incrementalExact(base, batch).count() }
      var idx: DedupIndexStore.ExactIndex = null
      arm("exact", "build") {
        idx = DedupIndexStore.writeExactIndex(base, buckets = buckets)
        spark.table(idx.table).count()
      }
      arm("exact", "stored") {
        DedupIndexStore.probeExact(spark, need(idx, "build"), batch).count()
      }
      // PROBE COST vs SEGMENT COUNT (the postings/ivfpq ladder for
      // the fingerprint family): base + 15 sub-batch segments; the
      // anti-join probe at each power of two unions + repartitions
      // that many fp tables, so the curve measures what the union
      // fence costs as the list grows.
      var segIdx: DedupIndexStore.SegmentedExact = null
      arm("exact", "seg16_append_total") {
        val b0 = DedupIndexStore.writeExactSegmented(base,
          buckets = buckets)
        segIdx = (0 until 15).foldLeft(b0) { (acc, i) =>
          DedupIndexStore.appendExactSegment(acc,
            docs.filter(pmod(col("doc_id"), lit(4)) === 0 &&
              pmod(col("doc_id"), lit(60)) === (i * 4)),
            buckets = buckets)
        }
        segIdx.segments.size.toLong
      }
      Seq(1, 2, 4, 8, 16).foreach { n =>
        arm("exact", s"seg_probe_n$n") {
          require(segIdx != null,
            "'seg16_append_total' filtered out by SPARK_GRAFT_ARMS")
          DedupIndexStore.probeExactSeg(spark,
            DedupIndexStore.SegmentedExact(segIdx.segments.take(n)),
            batch).count()
        }
      }
    }
    face("minhash") {
      arm("minhash", "inline") {
        Dedup.incrementalNearDupPairs(base, batch).count()
      }
      var idx: DedupIndexStore.MinhashIndex = null
      arm("minhash", "build") {
        idx = DedupIndexStore.writeMinhashIndex(base, buckets = buckets)
        spark.table(idx.bucketsTable).count()
      }
      arm("minhash", "stored") {
        DedupIndexStore.probeMinhash(spark, need(idx, "build"), batch).count()
      }
      // PROBE COST vs SEGMENT COUNT for the BANDED family (r13
      // verdict item 3): the knee=4 trigger was measured on the
      // union-fence families (postings / exact-fp), whose probes
      // explode the unioned rows directly; the banded probes differ —
      // they sum the STORED n_members per bucket across the fenced
      // union BEFORE exploding (the probe-time global cap), so their
      // read-amplification curve gets its own ladder.
      var segIdx: DedupIndexStore.SegmentedMinhash = null
      arm("minhash", "seg16_append_total") {
        val b0 = DedupIndexStore.writeMinhashSegmented(base,
          buckets = buckets)
        segIdx = (0 until 15).foldLeft(b0) { (acc, i) =>
          DedupIndexStore.appendMinhashSegment(acc,
            docs.filter(pmod(col("doc_id"), lit(4)) === 0 &&
              pmod(col("doc_id"), lit(60)) === (i * 4)),
            buckets = buckets)
        }
        segIdx.segments.size.toLong
      }
      Seq(1, 2, 4, 8, 16).foreach { n =>
        arm("minhash", s"seg_probe_n$n") {
          DedupIndexStore.probeMinhashSeg(spark,
            DedupIndexStore.SegmentedMinhash(
              need(segIdx, "seg16_append_total").segments.take(n)),
            batch).count()
        }
      }
      arm("minhash", "seg16_compact_probe") {
        val c = DedupIndexStore.compactMinhashSegments(spark,
          need(segIdx, "seg16_append_total"), buckets = buckets)
        DedupIndexStore.probeMinhash(spark, c, batch).count()
      }
    }
    face("simhash") {
      arm("simhash", "inline") {
        Dedup.incrementalSimhashPairs(base, batch).count()
      }
      var idx: DedupIndexStore.SimhashIndex = null
      arm("simhash", "build") {
        idx = DedupIndexStore.writeSimhashIndex(base, buckets = buckets)
        spark.table(idx.table).count()
      }
      arm("simhash", "stored") {
        DedupIndexStore.probeSimhash(spark, need(idx, "build"), batch).count()
      }
      // the banded seg ladder (see the minhash face's note)
      var segIdx: DedupIndexStore.SegmentedSimhash = null
      arm("simhash", "seg16_append_total") {
        val b0 = DedupIndexStore.writeSimhashSegmented(base,
          buckets = buckets)
        segIdx = (0 until 15).foldLeft(b0) { (acc, i) =>
          DedupIndexStore.appendSimhashSegment(acc,
            docs.filter(pmod(col("doc_id"), lit(4)) === 0 &&
              pmod(col("doc_id"), lit(60)) === (i * 4)),
            buckets = buckets)
        }
        segIdx.segments.size.toLong
      }
      Seq(1, 2, 4, 8, 16).foreach { n =>
        arm("simhash", s"seg_probe_n$n") {
          DedupIndexStore.probeSimhashSeg(spark,
            DedupIndexStore.SegmentedSimhash(
              need(segIdx, "seg16_append_total").segments.take(n)),
            batch).count()
        }
      }
      arm("simhash", "seg16_compact_probe") {
        val c = DedupIndexStore.compactSimhashSegments(spark,
          need(segIdx, "seg16_append_total"), buckets = buckets)
        DedupIndexStore.probeSimhash(spark, c, batch).count()
      }
    }
    // Text retrieval served from the stored positional index
    // (sources/PostingsStore): inline = corpus-scan operators, build =
    // one-time postings + doclens persist, stored = serve from the
    // tables (identical rows), refresh = fold an accepted batch into a
    // base index at O(index) cost (v1 build over the base is paid
    // outside the timed arm — it is the same work "build" already
    // measures).
    face("postings") {
      import graft.operators.CorpusOps
      import graft.sources.PostingsStore
      val phrase = Seq("window", "fast", "query")
      val terms = Seq("spark", "window", "scan")
      arm("postings", "inline_phrase") {
        CorpusOps.phraseSearch(docs, phrase).count()
      }
      arm("postings", "inline_bm25") { CorpusOps.bm25(docs, terms).count() }
      var idx: PostingsStore.PostingsIndex = null
      arm("postings", "build") {
        idx = PostingsStore.writePostings(docs, buckets = buckets)
        spark.table(idx.table).count()
      }
      arm("postings", "stored_phrase") {
        PostingsStore.phraseSearch(spark, need(idx, "build"), phrase).count()
      }
      arm("postings", "stored_bm25") {
        PostingsStore.bm25Search(spark, need(idx, "build"), terms).count()
      }
      lazy val v1 = PostingsStore.writePostings(base, buckets = buckets)
      // (the maint_stream arm below passes the same bucket count, so
      // its internal base build is this registry entry, not a rebuild
      // inside the timed window)
      arm("postings", "refresh") {
        val v2 = PostingsStore.refreshPostings(spark, v1, batch,
          buckets = buckets)
        spark.table(v2.table).count()
      }
      // the drained maintenance LOOP (q_phrase_index_stream's shape):
      // v1 reuses the registry hit from the refresh arm's base build,
      // so this times the STREAM half - 3 foreachBatch refresh folds
      // over the delta replay plus the final stored serve
      arm("postings", "maint_stream") {
        graft.streaming.EventStreams.drainPostingsMaintenance(
          base, batch, phrase, buckets = buckets).count()
      }
      // THE SEGMENT REGIME (q_phrase_search_seg's shape): the same
      // accepted quarter lands as an appended segment — tokenize the
      // batch only, never touch the base pair. seg_append vs refresh
      // is the O(batch) vs O(index) fold-cost comparison; at each
      // decade the refresh arm grows with the corpus while the append
      // arm grows with the batch alone.
      var v2s: PostingsStore.SegmentedPostings = null
      arm("postings", "seg_append") {
        v2s = PostingsStore.appendSegment(
          PostingsStore.SegmentedPostings(Seq(v1)), batch,
          buckets = buckets)
        spark.table(v2s.segments.last.table).count()
      }
      arm("postings", "seg_phrase") {
        PostingsStore.phraseSearchSeg(spark, need(v2s, "seg_append"), phrase).count()
      }
      arm("postings", "seg_bm25") {
        PostingsStore.bm25SearchSeg(spark, need(v2s, "seg_append"), terms).count()
      }
      // the LSM third verb: merge the segment list back to one pair
      // (O(index), but over the STORED rows — no re-tokenize)
      arm("postings", "compact") {
        val c = PostingsStore.compactSegments(spark, need(v2s, "seg_append"),
          buckets = buckets)
        spark.table(c.table).count()
      }
      // the drained SEGMENT loop (q_phrase_index_seg_stream's shape):
      // 3 foreachBatch O(batch) appends + the final segment serve
      arm("postings", "seg_maint_stream") {
        graft.streaming.EventStreams.drainPostingsSegMaintenance(
          base, batch, phrase, buckets = buckets).count()
      }
      // FIXED-BATCH decade contrast — the honest O(batch)-vs-O(index)
      // measurement: the quarter-split arms above grow batch AND base
      // together, so both folds scale linearly and only their ratio
      // differs. Here the mod is raised 10x per decade
      // (SPARK_GRAFT_FIXED_BATCH_MOD = 4 / 40 / 400 / 4000) so the
      // batch stays ~constant-size while the base grows: the id-merge
      // refresh must grow ~linearly per decade (it rewrites the whole
      // index) while the segment append stays FLAT (it tokenizes the
      // batch alone). The v1 base builds are paid outside the arms.
      val fbMod = sys.env.getOrElse("SPARK_GRAFT_FIXED_BATCH_MOD", "4")
        .toInt
      val fbBase = docs.filter(pmod(col("doc_id"), lit(fbMod)) =!= 0)
      val fbBatch = docs.filter(pmod(col("doc_id"), lit(fbMod)) === 0)
      lazy val v1fb = PostingsStore.writePostings(fbBase, buckets = buckets)
      arm("postings", s"refresh_fixed_mod$fbMod") {
        val v2 = PostingsStore.refreshPostings(spark, v1fb, fbBatch,
          buckets = buckets)
        spark.table(v2.table).count()
      }
      arm("postings", s"seg_append_fixed_mod$fbMod") {
        val v2 = PostingsStore.appendSegment(
          PostingsStore.SegmentedPostings(Seq(v1fb)), fbBatch,
          buckets = buckets)
        spark.table(v2.segments.last.table).count()
      }
      // PROBE COST vs SEGMENT COUNT — the read-amplification curve
      // compaction exists to reset, measured on the 1/2/4/8/16
      // doubling ladder (r12 verdict item 5: the knee of this curve
      // is the compactIfOver trigger threshold). The batch quarter
      // lands as 15 sub-batch segments (16-segment list incl. base);
      // the phrase probes at every power of two, then compaction
      // folds the full list to one pair and the probe is re-timed.
      // Each probe reads one bucket-pruned scan per segment per slot,
      // so probe cost grows ~linearly in segment count above a fixed
      // floor; the knee is where the per-segment slope overtakes the
      // floor.
      val subs = (0 until 15).map(i =>
        docs.filter(pmod(col("doc_id"), lit(4)) === 0 &&
          pmod(col("doc_id"), lit(60)) === (i * 4)))
      var segList = PostingsStore.SegmentedPostings(Seq(v1))
      arm("postings", "seg16_append_total") {
        subs.foreach { b =>
          segList = PostingsStore.appendSegment(segList, b,
            buckets = buckets)
        }
        segList.segments.size.toLong
      }
      def needSegs(n: Int): PostingsStore.SegmentedPostings = {
        require(segList.segments.size >= n,
          s"only ${segList.segments.size} segments built — " +
            "'seg16_append_total' filtered out by SPARK_GRAFT_ARMS")
        PostingsStore.SegmentedPostings(segList.segments.take(n))
      }
      def probeAt(n: Int): Long =
        PostingsStore.phraseSearchSeg(spark, needSegs(n), phrase).count()
      Seq(1, 2, 4, 8, 16).foreach { n =>
        arm("postings", s"seg_probe_n$n") { probeAt(n) }
      }
      var compacted: PostingsStore.PostingsIndex = null
      arm("postings", "seg16_compact") {
        compacted = PostingsStore.compactSegments(spark, needSegs(16),
          buckets = buckets)
        spark.table(compacted.table).count()
      }
      arm("postings", "compact_probe") {
        PostingsStore.phraseSearch(spark, need(compacted, "seg16_compact"), phrase).count()
      }
    }
    face("embedding") {
      // PRODUCTION SRP geometry (the StreamScaleRehearsal embedding
      // face's lesson): the harness's 4x4 injected axis planes stop
      // discriminating past ~100k vectors; 16 planes x 32 tables
      // holds bucket occupancy ~n/65536 per table.
      // planted near-dups (idOffset past any make_sf replica shift) so
      // the exact-cosine verify join carries real work at threshold
      // 0.9 — raw scaled gaussians produce zero pairs there and the
      // rehearsal would time only the bucket join. The offset is ≡ 1
      // (mod 4) ON PURPOSE: a multiple of 4 preserves the %4 split
      // parity and every planted pair lands same-side (zero cross-set
      // rows); +1 rotates the parity so plants straddle the split.
      val e = Dedup.plantNearDups(
        spark.read.parquet(s"$sfDir/embeddings.parquet"),
        idOffset = 1000000001L)
      val eBase = e.filter(pmod(col("vec_id"), lit(4)) =!= 0)
      val eBatch = e.filter(pmod(col("vec_id"), lit(4)) === 0)
      val tables = (0 until 32).map(t =>
        graft.operators.Similarity.hyperplanes(16, 64, 42L + t))
      arm("embedding", "inline") {
        Dedup.incrementalEmbeddingNearDup(eBase, eBatch,
          threshold = 0.9, planes = Some(tables)).count()
      }
      var idx: DedupIndexStore.EmbeddingIndex = null
      arm("embedding", "build") {
        idx = DedupIndexStore.writeEmbeddingIndex(eBase, tables,
          buckets = buckets)
        spark.table(idx.bucketsTable).count()
      }
      arm("embedding", "stored") {
        DedupIndexStore.probeEmbedding(spark, idx, eBatch,
          threshold = 0.9, tables = tables).count()
      }
      // the banded seg ladder (see the minhash face's note); the
      // planted ids (1e9+) keep %60 sub-batch splits disjoint
      var segIdx: DedupIndexStore.SegmentedEmbedding = null
      arm("embedding", "seg16_append_total") {
        val b0 = DedupIndexStore.writeEmbeddingSegmented(eBase, tables,
          buckets = buckets)
        segIdx = (0 until 15).foldLeft(b0) { (acc, i) =>
          DedupIndexStore.appendEmbeddingSegment(acc,
            e.filter(pmod(col("vec_id"), lit(4)) === 0 &&
              pmod(col("vec_id"), lit(60)) === (i * 4)),
            tables, buckets = buckets)
        }
        segIdx.segments.size.toLong
      }
      Seq(1, 2, 4, 8, 16).foreach { n =>
        arm("embedding", s"seg_probe_n$n") {
          val s16 = need(segIdx, "seg16_append_total")
          DedupIndexStore.probeEmbeddingSeg(spark,
            DedupIndexStore.SegmentedEmbedding(s16.segments.take(n),
              s16.planesDigest),
            eBatch, threshold = 0.9, tables = tables).count()
        }
      }
      arm("embedding", "seg16_compact_probe") {
        val c = DedupIndexStore.compactEmbeddingSegments(spark,
          need(segIdx, "seg16_append_total"), buckets = buckets)
        DedupIndexStore.probeEmbedding(spark, c, eBatch,
          threshold = 0.9, tables = tables).count()
      }
    }
    // PQ serving: the trained codebooks are the model (trained once,
    // outside the arms — both arms inject them, the production
    // shape); inline re-ENCODES the corpus to m-byte codes per query
    // batch, stored reads the persisted code relation. The rerank
    // touches raw vectors identically in both arms.
    face("pq") {
      import graft.operators.Similarity
      import graft.sources.AnnIndexStore
      val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
      val cbs = Similarity.pqCodebooks(
        e.select(col("vec_id"),
          graft.functions.Vectors.toDoubleVec(col("embedding")).as("v")),
        m = 8, k = 16, dim = 64)
      arm("pq", "inline") {
        Similarity.pqTopK(e, col("vec_id") < 5, k = 10, m = 8,
          refine = 4, dim = 64, codebooks = Some(cbs)).count()
      }
      var idx: AnnIndexStore.PqIndex = null
      arm("pq", "build") {
        idx = AnnIndexStore.writePqIndex(e, cbs, buckets = buckets)
        spark.table(idx.codesTable).count()
      }
      arm("pq", "stored") {
        AnnIndexStore.probePq(spark, idx,
          e.filter(col("vec_id") < 5), k = 10, refine = 4).count()
      }
    }
    // IVF-PQ serving: the trained model (centroids + residual
    // codebooks) injected into both arms; inline re-assigns and
    // re-encodes the corpus per query batch, stored reads only the
    // probed cells' code files; refresh appends the batch quarter as
    // a segment (O(batch) - contrast the postings/dedup O(index)
    // merges).
    face("ivfpq") {
      import graft.operators.Similarity
      import graft.sources.AnnIndexStore
      val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
      val ev = e.select(col("vec_id"),
        graft.functions.Vectors.toDoubleVec(col("embedding")).as("v"))
      val cents = Similarity.ivfCentroids(ev, 16, 2)
      // residual-trained codebooks - the model must quantize what it
      // will encode (ivfPqTopK's own discipline); raw-vector training
      // would systematically degrade ADC quality at this geometry
      val cbs = Similarity.ivfPqCodebooks(ev, cents, m = 8,
        kCodes = 16, dim = 64)
      arm("ivfpq", "inline") {
        Similarity.ivfPqTopK(e, col("vec_id") < 5, k = 10, nCells = 16,
          nProbe = 4, m = 8, refine = 4, dim = 64,
          centroids = Some(cents), codebooks = Some(cbs)).count()
      }
      var idx: AnnIndexStore.IvfPqIndex = null
      arm("ivfpq", "build") {
        idx = AnnIndexStore.writeIvfPqIndex(e, cents, cbs,
          buckets = buckets)
        spark.read.parquet(idx.paths.head).count()
      }
      arm("ivfpq", "stored") {
        AnnIndexStore.probeIvfPq(spark, idx,
          e.filter(col("vec_id") < 5), k = 10, nProbe = 4,
          refine = 4).count()
      }
      // refresh is measured against a base-quarter split (v1 build
      // paid outside the arm — same work "build" measures); the arm
      // is the O(batch) segment append alone
      val v1 = AnnIndexStore.writeIvfPqIndex(
        e.filter(pmod(col("vec_id"), lit(4)) =!= 0), cents, cbs,
        buckets = buckets)
      arm("ivfpq", "refresh") {
        val v2 = AnnIndexStore.refreshIvfPqIndex(spark, v1,
          e.filter(pmod(col("vec_id"), lit(4)) === 0),
          buckets = buckets)
        spark.read.parquet(v2.paths.last).count()
      }
      // PROBE COST vs SEGMENT COUNT for the ANN family (the postings
      // ladder's shape, r12 verdict item 5): the batch quarter lands
      // as 15 sub-batch segments on top of the base (16-segment
      // list); the probe at each power of two reads nProbe pruned
      // cells per segment plus one rerank join per vecs table.
      var segIdx: AnnIndexStore.IvfPqIndex = null
      arm("ivfpq", "seg16_append_total") {
        segIdx = (0 until 15).foldLeft(v1) { (acc, i) =>
          AnnIndexStore.refreshIvfPqIndex(spark, acc,
            e.filter(pmod(col("vec_id"), lit(4)) === 0 &&
              pmod(col("vec_id"), lit(60)) === (i * 4)),
            buckets = buckets)
        }
        segIdx.paths.size.toLong
      }
      def needAnnSegs(n: Int): AnnIndexStore.IvfPqIndex = {
        require(segIdx != null && segIdx.paths.size >= n,
          "'seg16_append_total' filtered out by SPARK_GRAFT_ARMS")
        AnnIndexStore.IvfPqIndex(segIdx.paths.take(n),
          segIdx.vecsTables.take(n), segIdx.centroids, segIdx.codebooks)
      }
      Seq(1, 2, 4, 8, 16).foreach { n =>
        arm("ivfpq", s"seg_probe_n$n") {
          AnnIndexStore.probeIvfPq(spark, needAnnSegs(n),
            e.filter(col("vec_id") < 5), k = 10, nProbe = 4,
            refine = 4).count()
        }
      }
      arm("ivfpq", "seg16_compact_probe") {
        val c = AnnIndexStore.compactIvfPqIndex(spark, needAnnSegs(16),
          buckets = buckets)
        AnnIndexStore.probeIvfPq(spark, c,
          e.filter(col("vec_id") < 5), k = 10, nProbe = 4,
          refine = 4).count()
      }
      // the drained maintenance LOOP (q_ann_ivfpq_stream's shape):
      // 3 foreachBatch segment appends over the delta replay plus the
      // final stored serve (v1 reuses the refresh arm's registry hit)
      arm("ivfpq", "maint_stream") {
        graft.streaming.EventStreams.drainIvfPqMaintenance(
          e.filter(pmod(col("vec_id"), lit(4)) =!= 0),
          e.filter(pmod(col("vec_id"), lit(4)) === 0),
          e.filter(col("vec_id") < 5), cents, cbs, k = 10,
          nProbe = 4, refine = 4, buckets = buckets).count()
      }
    }
    spark.stop()
  }
}
