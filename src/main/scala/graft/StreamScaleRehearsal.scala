package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale rehearsal for the four streaming incremental-dedup ingest
  * faces (round-9 verdict item 3): replay the ingest half of the
  * given dataset as micro-batches through each stream and time the
  * full execution with the EXECUTOR-SIDE count sink
  * ([[graft.streaming.EventStreams.replayThroughCountSink]]) — the
  * corpus-scale sink shape. The harness queries keep the memory-sink
  * drain (bounded output at harness SF, needed for the oracle
  * compare); this main exists because a 100x exact-dedup output is
  * most of the ingest corpus, which no driver-collected sink should
  * ever hold.
  *
  * Usage: `sbt "runMain graft.StreamScaleRehearsal [sfDir]"`,
  * optionally `SPARK_GRAFT_FACES=exact,minhash` to restrict. Prints
  * one JSON line per face: seconds + output rows. */
object StreamScaleRehearsal {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/tmp/testdata/sf10")
    val only = sys.env.get("SPARK_GRAFT_FACES")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.operators.Dedup
    import graft.streaming.EventStreams
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    def face(name: String)(body: => Long): Unit =
      if (only.forall(_.contains(name))) {
        val t0 = System.nanoTime()
        try {
          val n = body
          val sec = (System.nanoTime() - t0) / 1e9
          println(f"""{"face":"$name","sec":$sec%.1f,"rows":$n}""")
        } catch { case e: Throwable =>
          // getMessage can be null (NPE here would kill the rehearsal
          // instead of reporting the face), and the text must be
          // JSON-escaped or the emitted line is unparseable
          val msg = String.valueOf(e.getMessage).takeWhile(_ != '\n')
            .replace("\\", "\\\\").replace("\"", "\\\"")
          println(s"""{"face":"$name","error":"$msg"}""")
        }
      }
    face("exact") {
      // idOffset raised past the replica sets' shifted doc ids (the
      // 100x set tops out at ~9.9M; the harness sets at thousands)
      val (base, batch) = Dedup.splitIncremental(docs,
        idOffset = 1000000000L)
      val baseFps = base
        .select(graft.functions.TextAnalysis.fingerprintMd5(col("text"))
          .as("fp_md5"))
        .distinct()
      EventStreams.replayThroughCountSink(batch, "doc_id",
        s => EventStreams.incrementalDedupStream(s, baseFps))
    }
    face("minhash") {
      EventStreams.replayThroughCountSink(
        docs.filter(pmod(col("doc_id"), lit(4)) === 0), "doc_id",
        s => EventStreams.incrementalNearDupStream(s,
          docs.filter(pmod(col("doc_id"), lit(4)) =!= 0)))
    }
    face("simhash") {
      EventStreams.replayThroughCountSink(
        docs.filter(pmod(col("doc_id"), lit(4)) === 0), "doc_id",
        s => EventStreams.incrementalSimhashStream(s,
          docs.filter(pmod(col("doc_id"), lit(4)) =!= 0)))
    }
    // --- watermarked-aggregation / COMPLETE-mode drains (r10 verdict
    // item 2: the memory-sink harness drains of these faces are
    // output-linear — the session face held 955k session rows in the
    // driver at 10x; these rehearse the same streams through the
    // executor-side count sink at any scale) ---
    lazy val events = graft.sources.Tables.events(spark, sfDir)
    val YearUs = 31536000000000L
    import spark.implicits._
    face("session") {
      val slim = events.select(col("user_id"), col("ts"))
        .withColumn("__ord", unix_micros(col("ts")))
      val maxUs = slim.agg(max(col("__ord"))).head().getLong(0)
      val sentinel = Seq((-1L, maxUs + YearUs)).toDF("user_id", "__ord")
        .select(col("user_id"),
          timestamp_micros(col("__ord")).as("ts"), col("__ord"))
      EventStreams.replayThroughCountSink(slim, "__ord",
        s => EventStreams.sessionCounts(s.drop("__ord")),
        tail = Some(sentinel))
    }
    face("anomaly") {
      val stats = graft.operators.EventOps.rateStats(events)
        .as[(String, Long, Long, Long)].collect().toSeq
      val slim = events
        .select(col("ts"), col("event_type"), col("value"))
        .withColumn("__ord", unix_micros(col("ts")))
      val maxUs = slim.agg(max(col("__ord"))).head().getLong(0)
      val sentinel =
        Seq(("__watermark_sentinel__", 0.0d, maxUs + YearUs))
          .toDF("event_type", "value", "__ord")
          .select(timestamp_micros(col("__ord")).as("ts"),
            col("event_type"), col("value"), col("__ord"))
      EventStreams.replayThroughCountSink(slim, "__ord",
        s => EventStreams.rateAnomalyStream(s.drop("__ord"), stats,
          watermark = Some("1 hour")),
        tail = Some(sentinel))
    }
    // the r11 custom-state serve faces: per-key buffered state
    // (flatMapGroupsWithState) and the stream-stream join — their
    // state is watermark-bounded by construction; these rehearsals
    // measure the per-decade cost of carrying it
    def eventSlim = events
      .select(col("user_id"), col("ts"), col("event_id"),
        col("event_type"))
      .withColumn("__ord", unix_micros(col("ts")))
    def eventSentinel(tp: String) = {
      val maxUs = eventSlim.agg(max(col("__ord"))).head().getLong(0)
      Seq((-1L, maxUs + YearUs, -1L, tp))
        .toDF("user_id", "__ord", "event_id", "event_type")
        .select(col("user_id"), timestamp_micros(col("__ord")).as("ts"),
          col("event_id"), col("event_type"), col("__ord"))
    }
    face("transitions") {
      EventStreams.replayThroughCountSink(eventSlim, "__ord",
        s => EventStreams.typeTransitionsStream(s.drop("__ord")).toDF(),
        tail = Some(eventSentinel("__watermark_sentinel__")))
    }
    face("asof") {
      EventStreams.replayThroughCountSink(eventSlim, "__ord",
        s => EventStreams.asofEnrichStream(s.drop("__ord")).toDF(),
        tail = Some(eventSentinel("click")))
    }
    face("attribution") {
      EventStreams.replayThroughCountSink(eventSlim, "__ord",
        s => EventStreams.purchaseAttribution(s.drop("__ord")))
    }
    face("customsession") {
      val slim = events.select(col("user_id"), col("ts"))
        .withColumn("__ord", unix_micros(col("ts")))
      val maxUs = slim.agg(max(col("__ord"))).head().getLong(0)
      val sentinel = Seq((-1L, maxUs + YearUs)).toDF("user_id", "__ord")
        .select(col("user_id"),
          timestamp_micros(col("__ord")).as("ts"), col("__ord"))
      EventStreams.replayThroughCountSink(slim, "__ord",
        s => EventStreams.userSessions(s.drop("__ord")).toDF(),
        tail = Some(sentinel))
    }
    face("decay") {
      // mapGroupsWithState — Update mode; state is the per-type day
      // HISTOGRAM (bounded at <= 50*halfLife entries per type by the
      // lossless clamp compaction), so 100x data must NOT grow it
      EventStreams.replayThroughCountSink(eventSlim, "__ord",
        s => EventStreams.decayedCountsStream(s.drop("__ord")).toDF(),
        mode = org.apache.spark.sql.streaming.OutputMode.Update())
    }
    face("wordcount") {
      // COMPLETE-mode exact counts: state and per-trigger emission are
      // VOCABULARY-sized — the documented contrast with the heavy
      // (Misra-Gries) face; the rehearsal measures that growth
      EventStreams.replayThroughCountSink(
        docs.select(col("doc_id"), col("text")), "doc_id",
        s => EventStreams.wordCountStream(s, textCol = "text"),
        mode = org.apache.spark.sql.streaming.OutputMode.Complete())
    }
    face("heavy") {
      // COMPLETE mode: the count sink receives the capacity-bounded
      // Misra-Gries summary per trigger — at rehearsal scale the
      // summary is APPROXIMATE by design (vocabulary > capacity);
      // what is measured is throughput and that state stays at
      // `capacity` entries, not the oracle regime
      EventStreams.replayThroughCountSink(
        docs.select(col("doc_id"), col("text")), "doc_id",
        s => EventStreams.heavyHittersStream(s, 1024, textCol = "text"),
        mode = org.apache.spark.sql.streaming.OutputMode.Complete())
    }
    face("embedding") {
      val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
      // PRODUCTION SRP geometry (32 tables x 16 planes -> 65k buckets
      // per table), NOT the harness's injected 4x4 axis planes: those
      // exist so the oracle is closed-form, but 64 total buckets stop
      // discriminating past ~100k vectors — every bucket crowds
      // toward maxBucket and the candidate explode converges to
      // all-pairs (the 100x run died spilling ~10^10 candidate rows).
      // Bucket count must scale with corpus size; 65k/table holds
      // bucket occupancy ~n/65536 per table.
      EventStreams.replayThroughCountSink(
        e.filter(pmod(col("vec_id"), lit(4)) === 0), "vec_id",
        s => EventStreams.incrementalEmbeddingStream(s,
          e.filter(pmod(col("vec_id"), lit(4)) =!= 0),
          threshold = 0.4))
    }
    // The cluster-map maintenance loop (q_dedup_cc_stream's fold loop,
    // r11 verdict item 2): the UNTIMED prep mines the near-dup pairs
    // and clusters the base — a deployment's map and edge stream both
    // already exist; what this face measures is the FOLD cost of a
    // scale-factor's worth of delta edges against a scale-factor's
    // base map. Per-fold blast radius (the incremental_cc_fold
    // observed metric) is captured via a QueryExecutionListener and
    // printed next to the timing; the returned pinned-RDD delta must
    // be 0 (rolling localCheckpoint releases every predecessor).
    if (only.forall(_.contains("clustermap"))) {
      import graft.operators.Clustering
      val ccMetrics =
        new java.util.concurrent.ConcurrentLinkedQueue[String]()
      spark.listenerManager.register(
        new org.apache.spark.sql.util.QueryExecutionListener {
          override def onSuccess(funcName: String,
              qe: org.apache.spark.sql.execution.QueryExecution,
              durationNs: Long): Unit =
            qe.observedMetrics.get(Clustering.INCR_CC_METRIC)
              .foreach { row =>
                ccMetrics.add(s"""{"quotient_edges":${row.getLong(0)},""" +
                  s""""base_endpoints_a":${row.getLong(1)},""" +
                  s""""base_endpoints_b":${row.getLong(2)}}""")
              }
          override def onFailure(funcName: String,
              qe: org.apache.spark.sql.execution.QueryExecution,
              error: Exception): Unit = ()
        })
      val pairs = Dedup.ngramJaccard(docs, n = 3, threshold = 0.8)
        .select(col("doc_a"), col("doc_b")).localCheckpoint()
      val baseA = pmod(col("doc_a"), lit(4)) =!= 0
      val baseB = pmod(col("doc_b"), lit(4)) =!= 0
      val baseAssign = Clustering.clustersFromPairs(
          pairs.filter(baseA && baseB),
          docs.filter(pmod(col("doc_id"), lit(4)) =!= 0)
            .select(col("doc_id")))
        .localCheckpoint()
      val delta = pairs.filter(!baseA || !baseB).localCheckpoint()
      var pinned = -1
      face("clustermap") {
        val (n, p) =
          EventStreams.rehearseClusterMapFold(baseAssign, delta)
        pinned = p
        n
      }
      // listener delivery is async; give the bus a moment to drain
      Thread.sleep(2000)
      import scala.jdk.CollectionConverters._
      println(s"""{"face":"clustermap_folds","pinned_rdd_delta":$pinned,""" +
        s""""folds":[${ccMetrics.asScala.mkString(",")}]}""")
    }
    spark.stop()
  }
}
