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
}
