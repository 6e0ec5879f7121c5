package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** mapPartitions decode plumbing: shape, determinism, stream behavior. */
class MediaSpec extends SparkTestBase {

  test("decode emits fixed-shape L1-normalized features for every row") {
    val rows = Media.mediaDataset(spark, sfDir)
    val feats = Media.decode(rows)
    val n = rows.count()
    assert(feats.count() === n)
    val sample = feats.limit(50).collect()
    sample.foreach { f =>
      assert(f.features.length === 16)
      assert(math.abs(f.features.sum - 1f) < 1e-3, "histogram must be L1-normalized")
      assert(f.n_bytes > 0)
    }
  }

  test("decode is deterministic across runs") {
    val a = Media.decode(Media.mediaDataset(spark, sfDir))
      .orderBy("doc_id").limit(20).collect().map(f => (f.doc_id, f.features.toSeq))
    val b = Media.decode(Media.mediaDataset(spark, sfDir))
      .orderBy("doc_id").limit(20).collect().map(f => (f.doc_id, f.features.toSeq))
    assert(a.toSeq === b.toSeq)
  }

  test("feature aggregation downstream never touches payloads") {
    import spark.implicits._
    val agg = Media.decode(Media.mediaDataset(spark, sfDir))
      .groupBy($"lang")
      .agg(count(lit(1)).as("n"), avg(element_at($"features", 7)).as("avg_bin7"))
    assert(agg.count() > 0)
    // schema of the shuffled side is narrow: no binary column survives
    assert(!agg.schema.fields.exists(_.dataType.typeName == "binary"))
  }

  test("codec seam: bytes touched exactly once, payloads never cross the shuffle") {
    import spark.implicits._
    val rows = Media.mediaDataset(spark, sfDir)
    val totalPayloadBytes = rows.select(sum(length($"payload"))).head().getLong(0)
    val featureRows = rows.count()
    assert(totalPayloadBytes > 100000L, "fixture must carry real payload volume")

    // bytes-touched accumulator INSIDE the codec seam + a listener counting
    // what actually crosses the shuffle — the map-side-only guarantee is
    // measured, not assumed
    val touched = spark.sparkContext.longAccumulator("media-bytes-touched")
    val countingCodec = new MediaCodec {
      override def decode(p: Array[Byte]): Array[Float] = {
        touched.add(p.length); Media.decodeStub(p)
      }
    }
    val shuffleBytes = new java.util.concurrent.atomic.AtomicLong()
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit =
        shuffleBytes.addAndGet(sc.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten)
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      val agg = Media.decode(rows, countingCodec)
        .groupBy($"lang").agg(count(lit(1)).as("n"),
          avg(element_at($"features", 3)).as("avg_bin3"))
      assert(agg.collect().map(_.getLong(1)).sum === featureRows)
      // listener events are async — wait for the counters to settle
      val deadline = System.currentTimeMillis() + 10000
      var last = -1L
      while (System.currentTimeMillis() < deadline &&
             (shuffleBytes.get() != last || last == 0L)) {
        last = shuffleBytes.get(); Thread.sleep(300)
      }
      assert(touched.value === totalPayloadBytes,
        "every payload byte decoded exactly once — no re-decode, none skipped")
      assert(shuffleBytes.get() > 0, "the aggregation must actually shuffle")
      assert(shuffleBytes.get() < totalPayloadBytes / 10,
        s"shuffle carried ${shuffleBytes.get()} bytes for $totalPayloadBytes " +
          "payload bytes — payloads must stay map-side")
      assert(shuffleBytes.get() <= featureRows * 200,
        "shuffled volume must scale with (narrow) feature rows, not payloads")
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  // ---- real image decode on the seam (javax.imageio, JDK-native) ----------

  /** An in-memory PNG: left half black, right half at the given gray
    * level — known luminance per 4×4 grid cell, so the decoded features
    * are exactly predictable. */
  private def png(w: Int, h: Int, rightGray: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val g = if (x < w / 2) 0 else rightGray
        img.setRGB(x, y, (g << 16) | (g << 8) | g)
        x += 1
      }
      y += 1
    }
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
  }

  test("ImageIoCodec decodes real PNG pixels into the expected luminance grid") {
    import spark.implicits._
    val rows = spark.createDataset(Seq(
      Media.MediaRow(1L, png(64, 64, 255), "en"),
      Media.MediaRow(2L, png(64, 64, 128), "de")))
    val feats = Media.decode(rows, Media.ImageIoCodec)
      .collect().map(f => f.doc_id -> f.features).toMap
    // left two grid columns pure black (0), right two at gray/255
    val f1 = feats(1L)
    assert(f1.length == 16)
    (0 until 16).foreach { c =>
      val expected = if (c % 4 < 2) 0f else 1f
      assert(math.abs(f1(c) - expected) < 1e-3,
        s"cell $c: got ${f1(c)}, want $expected")
    }
    val f2 = feats(2L)
    (0 until 16).foreach { c =>
      val expected = if (c % 4 < 2) 0f else 128f / 255f
      assert(math.abs(f2(c) - expected) < 1e-3)
    }
  }

  test("real decode keeps the map-side-only guarantee: pixels never shuffle") {
    import spark.implicits._
    // 200 real PNGs generated EXECUTOR-side after the only shuffle (a
    // repartition of bare ids) — payload bytes must never cross a wire.
    // Per-pixel noise keeps the PNGs poorly compressible (~20KB each) so
    // payload volume dwarfs the narrow aggregation shuffle.
    val rows = spark.range(1, 201).repartition(4).map { i =>
      val img = new java.awt.image.BufferedImage(
        96, 96, java.awt.image.BufferedImage.TYPE_INT_RGB)
      var y = 0
      while (y < 96) {
        var x = 0
        while (x < 96) {
          val g = (x * 31 + y * 17 + i.toInt * 7) % 256
          img.setRGB(x, y, (g << 16) | (g << 8) | g)
          x += 1
        }
        y += 1
      }
      val out = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", out)
      Media.MediaRow(i, out.toByteArray, if (i % 2 == 0) "en" else "de")
    }
    val totalPayloadBytes = rows.select(sum(length($"payload"))).head().getLong(0)
    val shuffleBytes = new java.util.concurrent.atomic.AtomicLong()
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit =
        shuffleBytes.addAndGet(sc.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten)
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      val agg = Media.decode(rows, Media.ImageIoCodec)
        .groupBy($"lang").agg(count(lit(1)).as("n"),
          avg(element_at($"features", 16)).as("avg_right"))
      val counts = agg.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(counts("en") == 100 && counts("de") == 100)
      val deadline = System.currentTimeMillis() + 10000
      var last = -1L
      while (System.currentTimeMillis() < deadline &&
             (shuffleBytes.get() != last || last == 0L)) {
        last = shuffleBytes.get(); Thread.sleep(300)
      }
      assert(shuffleBytes.get() > 0, "the aggregation must actually shuffle")
      assert(shuffleBytes.get() < totalPayloadBytes / 10,
        s"shuffle carried ${shuffleBytes.get()} of $totalPayloadBytes " +
          "payload bytes — real decoded pixels must stay map-side")
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  test("a non-image payload fails the real codec loudly") {
    import spark.implicits._
    val rows = spark.createDataset(Seq(
      Media.MediaRow(1L, "not an image".getBytes, "en")))
    val ex = intercept[Exception](Media.decode(rows, Media.ImageIoCodec).collect())
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(ex).exists(_.contains("not a decodable image")))
  }

  test("resize pools 16-dim features to 4 dims preserving mass") {
    import spark.implicits._
    val feats = Media.decode(Media.mediaDataset(spark, sfDir))
    val resized = Media.resizeFeatures(feats, 4).limit(20).collect()
    resized.foreach { r =>
      val v = r.getSeq[Float](2)
      assert(v.length === 4)
      // average pooling of an L1-normalized histogram sums to 1/stride
      assert(math.abs(v.sum - 0.25f) < 1e-3)
    }
  }

  test("frame sampling keeps every stride-th fixed-size frame") {
    import spark.implicits._
    val one = Media.mediaDataset(spark, sfDir).filter($"doc_id" === 0)
    val payloadLen = one.collect()(0).payload.length
    val frames = Media.sampleFrames(one, frameBytes = 32, stride = 2).collect()
    val totalFrames = (payloadLen + 31) / 32
    val expected = (0 until totalFrames).count(_ % 2 == 0)
    assert(frames.length === expected)
    assert(frames.forall(_.getInt(2) <= 32))
  }

  test("WavCodec parses a real RIFF/PCM16 container to closed-form features") {
    val wav = Media.syntheticWav(sampleRate = 16000, nSamples = 3200,
      ampQ = 12345, halfPeriod = 4)
    val f = Media.WavCodec.decode(wav)
    assert(f(0) === 16000f && f(1) === 3200f)
    assert(f(2) === 12345f, "peak of a square wave is its amplitude")
    assert(f(3) === ((3200 - 1) / 4).toFloat, "one sign flip per half period")
    // every time segment of a square wave has mean |amplitude| == amp
    assert((4 until 16).forall(i => f(i) === 12345f))
  }

  test("WavCodec skips intermediate RIFF chunks (LIST/fact) like real encoders emit") {
    val base = Media.syntheticWav(8000, 100, 5000, 2)
    // splice a LIST chunk between fmt and data: RIFF(12) + fmt(8+16) = 36
    val info = "INFOisft".getBytes("US-ASCII") // 8 bytes of payload
    val out = java.nio.ByteBuffer.allocate(base.length + 8 + info.length)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put(base, 0, 36)
    out.put("LIST".getBytes("US-ASCII")).putInt(info.length).put(info)
    out.put(base, 36, base.length - 36)
    val f = Media.WavCodec.decode(out.array())
    assert(f(0) === 8000f && f(1) === 100f && f(2) === 5000f)
  }

  test("WavCodec refuses non-WAV and non-PCM16 payloads loudly") {
    intercept[IllegalArgumentException](
      Media.WavCodec.decode("not audio at all".getBytes))
    intercept[IllegalArgumentException](
      Media.WavCodec.decode(Media.syntheticPng(8, 8, 100)))
    // a stereo header is structurally valid RIFF but unsupported
    val mono = Media.syntheticWav(8000, 100, 1000, 2)
    mono(22) = 2 // channels field in the fmt chunk
    intercept[IllegalArgumentException](Media.WavCodec.decode(mono))
  }

  test("VideoCodec samples and really decodes every stride-th frame") {
    val vid = Media.syntheticVideo(16, 16, Seq(10, 60, 110, 160, 210, 250))
    val f = Media.VideoCodec(stride = 2).decode(vid)
    assert(f(0) === 6f && f(1) === 3f)
    assert(math.round(f(2)) === 10 && math.round(f(3)) === 110 &&
      math.round(f(4)) === 210, "sampled frames are 0, 2, 4")
    // stride 1 decodes everything
    val all = Media.VideoCodec(stride = 1).decode(vid)
    assert(all(1) === 6f && math.round(all(7)) === 250)
    intercept[IllegalArgumentException](
      Media.VideoCodec().decode("not a video".getBytes))
  }

  test("averageHash: closed-form quadrant hashes; one-quadrant edit leaves 3 of 4 bands") {
    def hash(g0: Int, g1: Int, g2: Int, g3: Int): Int =
      Media.averageHash(Media.ImageIoCodec.decode(
        Media.quadPng(64, 64, g0, g1, g2, g3)))
    val h1 = hash(200, 0, 0, 0)
    // quadrant 0 (top-left) covers grid cells {0, 1, 4, 5}
    assert(h1 === ((1 << 0) | (1 << 1) | (1 << 4) | (1 << 5)),
      s"single-bright-quadrant hash must be closed-form, got ${h1.toBinaryString}")
    // brightness jitter that keeps every quadrant on its side of the mean
    // is hash-invariant — the perceptual property
    assert(hash(180, 20, 0, 0) === h1)
    // lighting ONE more quadrant flips exactly that quadrant's 4 bits...
    val h3 = hash(200, 200, 0, 0)
    assert(Integer.bitCount(h1 ^ h3) === 4)
    // ...which the quadrant-aligned bands localize: 3 of 4 bands identical
    // (the pigeonhole guarantee the q205 candidate join keys on)
    val shared = Media.ahashBands(h1).zip(Media.ahashBands(h3))
      .count { case (a, b) => a == b }
    assert(shared === 3, s"one-quadrant edit must leave 3 shared bands, got $shared")
    // bands partition the hash bits exactly
    val b = Media.ahashBands(h1)
    assert(b.map(Integer.bitCount).sum === Integer.bitCount(h1))
  }
}
