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
