package graft

import graft.operators.{MediaRow, MultiModal}
import graft.sources.Tables.documents

class MultiModalSpec extends SparkSpec {
  import spark.implicits._

  private def media = MultiModal.asMedia(documents(spark, sfDir))

  test("payload is the UTF-8 bytes of text; meta reports byte length") {
    val df = Seq((1L, "héllo"), (2L, "")).toDF("doc_id", "text")
    val meta = MultiModal.mediaMeta(MultiModal.asMedia(df)).collect()
    // 'é' is 2 bytes in UTF-8 → 6 bytes total, not 5 chars
    assert(meta(0).getAs[Long]("n_bytes") == 6L)
    assert(meta(1).getAs[Long]("n_bytes") == 0L)
    assert(meta(0).getAs[String]("mime") == "audio/wav") // 1 % 3
  }

  test("frames with every=1 reassemble to the full payload hex") {
    val df = Seq((7L, "x" * 150)).toDF("doc_id", "text")
    val frames = MultiModal.frameSample(MultiModal.asMedia(df),
      frameBytes = 64, every = 1).collect()
    assert(frames.length == 3) // ceil(150/64)
    val reassembled = frames.sortBy(_.getAs[Long]("frame_idx"))
      .map(_.getAs[String]("frame_hex")).mkString
    assert(reassembled == "78" * 150)
    // tail frame is short, not padded
    assert(frames.last.getAs[String]("frame_hex").length == (150 - 128) * 2)
  }

  test("frame sampling keeps every 2nd frame") {
    val idx = MultiModal.frameSample(media, frameBytes = 64, every = 2)
      .select("frame_idx").as[Long].collect()
    assert(idx.nonEmpty && idx.forall(_ % 2 == 0))
  }

  test("decodeFeatures is deterministic and histogram-normalized") {
    val a = MultiModal.decodeFeatures(media, batchSize = 8).collect()
      .sortBy(_.doc_id)
    val b = MultiModal.decodeFeatures(media, batchSize = 64,
      parallelism = Some(2)).collect().sortBy(_.doc_id)
    // same features regardless of batch shape or partitioning
    assert(a.length == b.length && a.length == media.count())
    a.zip(b).foreach { case (x, y) =>
      assert(x.doc_id == y.doc_id && x.features.sameElements(y.features))
    }
    a.foreach { f =>
      assert(f.features.length == MultiModal.FakeCodec.Bins)
      assert(f.width >= 16 && f.height >= 16)
      if (f.n_bytes > 0)
        assert(math.abs(f.features.sum - 1f) < 1e-3)
    }
  }

  test("featureQuery serializes exact integer bin counts") {
    val rows = MultiModal.featureQuery(media).collect()
    assert(rows.length == media.count())
    val csv = rows.head.getAs[String]("features_csv")
    val parts = csv.split(",")
    assert(parts.length == MultiModal.FakeCodec.Bins)
    assert(parts.forall(_.matches("""\d+""")))
    // counts recovered from the normalized typed path must equal the
    // raw byte histogram, bin for bin, and sum to n_bytes
    val typed = MultiModal.decodeFeatures(media).collect()
      .map(f => f.doc_id -> f).toMap
    val payloads = media.select("doc_id", "payload").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Array[Byte]]("payload"))
      .toMap
    rows.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val counts = r.getAs[String]("features_csv").split(",").map(_.toLong)
      val bytes = payloads(id)
      val expect = new Array[Long](MultiModal.FakeCodec.Bins)
      bytes.foreach(b => expect((b & 0xff) / 16) += 1L)
      assert(counts.sameElements(expect),
        s"doc $id: counts do not round-trip the byte histogram")
      assert(counts.sum == r.getAs[Long]("n_bytes"))
      // and the normalized typed value reproduces from the counts
      val f = typed(id)
      counts.zip(f.features).foreach { case (c, fl) =>
        if (f.n_bytes > 0)
          assert(math.abs(fl - c.toFloat / f.n_bytes) < 1e-6f)
      }
    }
  }

  test("resize normalizes every payload to the byte budget") {
    val out = MultiModal.resizeStub(media, w = 8, h = 8).collect()
    assert(out.nonEmpty)
    assert(out.forall(_.payload.length == 64))
    // prefix preserved for payloads that were truncated
    val orig = media.select("doc_id", "payload").collect()
      .map(r => r.getLong(0) -> r.getAs[Array[Byte]](1)).toMap
    out.foreach { r =>
      val o = orig(r.doc_id)
      val n = math.min(o.length, 64)
      assert(r.payload.take(n).sameElements(o.take(n)))
    }
  }

  test("decodeImage + decodeImageFeatures: real PNGs through the batched path") {
    // render tiny PNGs in-memory with ImageIO itself (the JDK encoder),
    // so the test needs no fixture files and no external codec
    def png(w: Int, h: Int, rgb: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, rgb)
      val bos = new java.io.ByteArrayOutputStream()
      assert(javax.imageio.ImageIO.write(img, "png", bos))
      bos.toByteArray
    }
    // 1x1 pure white: all luma mass in the top histogram bin
    val (w1, h1, hist1) = MultiModal.decodeImage(png(1, 1, 0xffffff))
    assert(w1 == 1 && h1 == 1)
    assert(hist1.last == 1f && hist1.init.forall(_ == 0f))
    // 3x2 pure black: bottom bin
    val (w2, h2, hist2) = MultiModal.decodeImage(png(3, 2, 0x000000))
    assert(w2 == 3 && h2 == 2)
    assert(hist2.head == 1f && hist2.tail.forall(_ == 0f))
    // distributed batched path: image rows decode, the audio row is
    // filtered out before the codec ever sees its (undecodable) bytes
    val rows = Seq(
      MediaRow(1L, "image/png", png(1, 1, 0xffffff)),
      MediaRow(2L, "image/png", png(4, 3, 0x000000)),
      MediaRow(3L, "audio/wav", Array[Byte](1, 2, 3)))
    val out = MultiModal.decodeImageFeatures(rows.toDF(), batchSize = 2)
      .collect().sortBy(_.doc_id)
    assert(out.map(_.doc_id).toSeq == Seq(1L, 2L))
    assert(out(1).width == 4 && out(1).height == 3)
    assert(out.forall(f => math.abs(f.features.sum - 1f) < 1e-3))
    // undecodable bytes under an image mime raise loudly, not silently
    intercept[Exception] {
      MultiModal.decodeImageFeatures(
        Seq(MediaRow(9L, "image/png", Array[Byte](0, 1, 2))).toDF()).collect()
    }
  }

  test("imageDHash: real PNGs — small edits stay within hamming 3, " +
      "unrelated images differ, banded pairs find the planted family") {
    val rnd = new scala.util.Random(42)
    def noisyPng(seed: Int, w: Int = 36, h: Int = 32,
        edit: Option[(Int, Int, Int)] = None): Array[Byte] = {
      val r = new scala.util.Random(seed)
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w)
        img.setRGB(x, y, r.nextInt(0x1000000))
      edit.foreach { case (x, y, rgb) => img.setRGB(x, y, rgb) }
      val bos = new java.io.ByteArrayOutputStream()
      assert(javax.imageio.ImageIO.write(img, "png", bos))
      bos.toByteArray
    }
    val base = noisyPng(1)
    // identical content re-encoded: hamming 0
    assert(MultiModal.imageDHash(base) ==
      MultiModal.imageDHash(noisyPng(1)))
    // a single-pixel edit moves one box average: at most the two
    // comparisons that box participates in can flip
    val edited = noisyPng(1, edit = Some((17, 15, 0xffffff)))
    val hamEdit = java.lang.Long.bitCount(
      MultiModal.imageDHash(base) ^ MultiModal.imageDHash(edited))
    assert(hamEdit <= 2)
    // independent noise images land far apart (64 coin-flip bits)
    val other = noisyPng(2)
    assert(java.lang.Long.bitCount(
      MultiModal.imageDHash(base) ^ MultiModal.imageDHash(other)) > 10)
    // too small to grid → loud failure, the quarantine rule
    intercept[Exception] {
      MultiModal.imageDHash(noisyPng(3, w = 8, h = 8))
    }
    // distributed: batched hashes + banded pairs == brute force over
    // a family of edited copies and unrelated noise
    val imgs = (0 until 6).map(i =>
      MediaRow(10L + i, "image/png",
        noisyPng(7, edit = Some((i % 6 * 5, i % 4 * 7, 0x123456))))) ++
      (0 until 4).map(i => MediaRow(50L + i, "image/png",
        noisyPng(100 + i))) :+
      MediaRow(99L, "audio/wav", Array[Byte](1, 2))
    val hashes = MultiModal.imageDHashes(imgs.toDF(), batchSize = 3)
    val got = MultiModal.dHashPairs(hashes)
      .as[(Long, Long, Int)].collect().toSeq
    val hs = hashes.as[(Long, Long)].collect().sortBy(_._1)
    val brute = for {
      i <- hs.indices; j <- i + 1 until hs.length
      ham = java.lang.Long.bitCount(hs(i)._2 ^ hs(j)._2)
      if ham <= 3
    } yield (hs(i)._1, hs(j)._1, ham)
    assert(got == brute.toSeq)
    assert(got.nonEmpty, "edited family should produce near pairs")
    rnd.nextInt() // keep the seeded rng referenced
  }

  test("textDHashes: SQL grid equals a plain-Scala dHash witness") {
    val texts = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text").as[(Long, String)].collect()
    val got = MultiModal.textDHashes(
      texts.toSeq.toDF("doc_id", "text")).as[(Long, Long)]
      .collect().toMap
    def witness(t: String): Long = {
      val cp = t.map(_.toInt.toLong).toArray
      val n = cp.length
      var hash = 0L
      for (r <- 0 until 8) {
        val lo = r * n / 8; val hi = (r + 1) * n / 8
        val m = hi - lo
        val row = (0 until 9).map { c =>
          val a = lo + c * m / 9; val b = lo + (c + 1) * m / 9
          cp.slice(a, b).sum / (b - a)
        }
        for (c <- 0 until 8)
          if (row(c + 1) > row(c)) hash |= 1L << (r * 8 + c)
      }
      hash
    }
    val eligible = texts.filter(_._2.length >= 72)
    assert(got.keySet == eligible.map(_._1).toSet)
    eligible.foreach { case (id, t) =>
      assert(got(id) == witness(t), s"doc $id dhash diverged") }
  }

  test("codec batch entry point sees decoder-sized batches") {
    val rows = (1L to 10L).map(i => MediaRow(i, "image/png", Array[Byte](i.toByte)))
    val batches = rows.iterator.grouped(4).map(_.size).toSeq
    assert(batches == Seq(4, 4, 2)) // the shape decodeFeatures feeds FakeCodec
    assert(MultiModal.FakeCodec.decodeBatch(rows).map(_.doc_id) == (1L to 10L))
  }

  /** Minimal canonical RIFF/WAVE writer for fixtures: 16-bit PCM. */
  private def wavBytes(rate: Int, ch: Int,
      samples: Array[Short]): Array[Byte] = {
    val dataLen = samples.length * 2
    val bb = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.putInt(0x46464952); bb.putInt(36 + dataLen) // "RIFF", riff size
    bb.putInt(0x45564157)                          // "WAVE"
    bb.putInt(0x20746d66); bb.putInt(16)           // "fmt ", chunk size
    bb.putShort(1); bb.putShort(ch.toShort)        // PCM, channels
    bb.putInt(rate); bb.putInt(rate * ch * 2)      // rate, byte rate
    bb.putShort((ch * 2).toShort); bb.putShort(16) // block align, bits
    bb.putInt(0x61746164); bb.putInt(dataLen)      // "data"
    samples.foreach(bb.putShort)
    bb.array()
  }

  test("real WAV decode through the batched path: rate, frames, exact RMS") {
    // mono 8 kHz square wave at amplitude 1000: RMS is exactly 1000
    val mono = wavBytes(8000, 1,
      Array.tabulate(80)(i => if (i % 2 == 0) 1000 else -1000)
        .map(_.toShort))
    // stereo 16 kHz: 40 frames of (300, -400) -> RMS = sqrt((9+16)/2)*100
    val stereo = wavBytes(16000, 2,
      Array.tabulate(80)(i => if (i % 2 == 0) 300 else -400).map(_.toShort))
    val media = Seq(
      MediaRow(1L, "audio/wav", mono),
      MediaRow(2L, "audio/wav", stereo),
      MediaRow(3L, "image/png", Array[Byte](1, 2))) // filtered out
    val out = MultiModal.decodeWavFeatures(media.toDF(), batchSize = 2)
      .collect().sortBy(_.doc_id)
    assert(out.map(_.doc_id).toSeq == Seq(1L, 2L))
    val m = out(0)
    assert(m.sample_rate == 8000 && m.n_channels == 1 && m.n_frames == 80)
    assert(m.duration_us == 10000) // 80 frames / 8 kHz
    assert(m.rms == 1000.0)        // exact: constant-magnitude samples
    val s = out(1)
    assert(s.sample_rate == 16000 && s.n_channels == 2 && s.n_frames == 40)
    assert(s.duration_us == 2500)
    assert(math.abs(s.rms - math.sqrt((9.0 + 16.0) / 2) * 100) < 1e-9)
    // garbage under an audio mime raises loudly
    intercept[Exception] {
      MultiModal.decodeWavFeatures(
        Seq(MediaRow(9L, "audio/wav", Array[Byte](0, 1, 2))).toDF())
        .collect()
    }
  }
}
