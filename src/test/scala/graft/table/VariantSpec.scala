package graft.table

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** VARIANT columns (Spark 4 parse_json / variant_get) in graft tables,
  * protocol-gated as Delta gates the variantType table feature: the
  * commit that FIRST carries a variant schema upgrades the protocol in
  * that same commit (no window where a foreign reader could misread), and
  * the generic reader gate refuses the table on any build whose supported
  * feature set lacks variantType. */
class VariantSpec extends SparkTestBase {
  import spark.implicits._

  test("creating a variant table gates the protocol in commit 0") {
    val t = GraftTable.create(spark, tmpDir("variant-create-"),
      Seq((1L, """{"k":7,"s":"x"}"""), (2L, """{"k":9}"""))
        .toDF("id", "js").withColumn("v", parse_json($"js")))
    val p = t.snapshot.protocol
    assert(p.readerFeatures.contains("variantType"))
    assert(p.writerFeatures.contains("variantType"))
    assert(p.minReaderVersion >= 2 && p.minWriterVersion >= 2)
    // the upgrade rides commit 0 itself — not a follow-up commit
    assert(t.latestVersion == 0L)
  }

  test("variant values round-trip through the log and match the string path") {
    val dir = tmpDir("variant-rt-")
    GraftTable.create(spark, dir,
      Seq((1L, """{"k":7,"nested":{"a":1}}"""), (2L, """{"k":9,"nested":{"a":2}}"""),
          (3L, """{"s":"no k"}"""))
        .toDF("id", "js").withColumn("v", parse_json($"js")))
    // a FRESH handle (cold caches): schema survives the schemaString
    // round-trip and the files decode through the normal batch scan
    val back = GraftTable.forPath(spark, dir).toDF
    assert(back.schema("v").dataType == VariantType)
    val rows = back
      .select($"id",
        variant_get($"v", "$.k", "long").as("kv"),
        get_json_object($"js", "$.k").cast("long").as("ks"),
        variant_get($"v", "$.nested.a", "long").as("na"))
      .orderBy($"id").collect()
    assert(rows.map(r => (r.getLong(0), Option(r.get(1)), Option(r.get(3)))).toSeq ==
      Seq((1L, Some(7L), Some(1L)), (2L, Some(9L), Some(2L)), (3L, None, None)))
    // shredded-vs-string parity, row by row
    rows.foreach(r => assert(r.get(1) == r.get(2),
      s"variant_get and get_json_object diverged on id ${r.getLong(0)}"))
  }

  test("schema evolution into variant upgrades the protocol in the same commit") {
    val t = GraftTable.create(spark, tmpDir("variant-evolve-"),
      Seq((1L, "a")).toDF("id", "s"))
    assert(!t.snapshot.protocol.readerFeatures.contains("variantType"))
    t.addColumn("v", VariantType)
    val s = t.snapshot
    assert(s.protocol.readerFeatures.contains("variantType"),
      "ADD COLUMNS of a variant column must gate the feature")
    // the SAME commit carries both the evolved schema and the upgrade
    val actions = t.log.readVersion(s.version)
    assert(actions.exists(_.isInstanceOf[Protocol]))
    assert(actions.collectFirst { case m: MetaData => m }
      .exists(_.schemaString.contains("\"variant\"")))
  }

  test("appends to a variant table flow through conform unharmed") {
    val dir = tmpDir("variant-append-")
    val t = GraftTable.create(spark, dir,
      Seq((1L, """{"k":7}""")).toDF("id", "js").withColumn("v", parse_json($"js")))
    t.append(Seq((2L, """{"k":9}""")).toDF("id", "js")
      .withColumn("v", parse_json($"js")))
    val got = t.toDF.select($"id", variant_get($"v", "$.k", "long").as("k"))
      .orderBy($"id").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == Seq((1L, 7L), (2L, 9L)))
  }

  test("streaming a variant table through the graft source") {
    val dir = tmpDir("variant-stream-")
    GraftTable.create(spark, dir,
      Seq((1L, """{"k":7}"""), (2L, """{"k":9}"""))
        .toDF("id", "js").withColumn("v", parse_json($"js")))
    val q = spark.readStream.format("graft").load(dir)
      .select($"id", variant_get($"v", "$.k", "long").as("k"))
      .writeStream.format("memory").queryName("variant_stream")
      .option("checkpointLocation", tmpDir("variant-stream-ckpt-"))
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination(60000)
    val got = spark.table("variant_stream").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq
    assert(got == Seq((1L, 7L), (2L, 9L)))
  }

  test("a protocol requiring an unknown reader feature refuses loudly") {
    // the refusal a pre-variant build gives a variant table is the generic
    // reader gate; pin it with a feature no build supports
    val dir = tmpDir("variant-foreign-")
    val t = GraftTable.create(spark, dir, Seq((1L, "a")).toDF("id", "s"))
    val s = t.snapshot
    t.log.commit(s.version + 1, Seq(
      Protocol(minReaderVersion = 2, minWriterVersion = 2,
        readerFeatures = Seq("variantTypeV9"),
        writerFeatures = Seq("variantTypeV9")),
      CommitInfo(s.version + 1, t.log.nextTimestamp(), "UPGRADE", Map.empty)))
    val e = intercept[GraftProtocolException] {
      GraftTable.forPath(spark, dir).toDF.count()
    }
    assert(e.getMessage.contains("variantTypeV9"))
  }
  test("shred stats prune files, survive the parquet checkpoint, and strict gets never prune") {
    val dir = tmpDir("variant-shred-")
    val t = GraftTable.create(spark, dir,
      Seq.empty[(Long, String)].toDF("id", "js")
        .withColumn("v", parse_json($"js")).select($"id", $"v"))
    t.setProperty("variant.shred.paths", "v:$.k:long")
    t.setProperty("checkpoint.format", "json")
    // 12 appends (crosses the checkpoint interval), each a narrow k range
    (0 until 12).foreach { i =>
      t.append(Seq((i * 10L, s"""{\"k\":${i * 10}}"""),
                   (i * 10L + 9, s"""{\"k\":${i * 10 + 9}}"""))
        .toDF("id", "js").coalesce(1)
        .withColumn("v", parse_json($"js")).select($"id", $"v"))
    }
    val pred = expr("try_variant_get(v, '$.k', 'long') >= 100")
    val snap = t.snapshot
    assert(snap.files.size === 12)
    val pruned = t.prunedFiles(snap, pred)
    assert(pruned.size === 2, s"expected 2 surviving files, got ${pruned.size}")
    // answers agree with the unpruned read (skipping is I/O-only)
    assert(t.scan(pred).count() ===
      t.toDF.filter(pred).count())
    // a FRESH log folding through the checkpoint keeps the shred stats
    val t2 = GraftTable.forPath(spark, dir)
    assert(t2.log.snapshotAt(t2.latestVersion).files
      .forall(_.minValues.keys.exists(_.startsWith("__shred_"))),
      "shred stats must round-trip the checkpoint")
    assert(t2.prunedFiles(t2.snapshot, pred).size === 2)
    // STRICT variant_get must never consult shred stats (try-semantics
    // stats could silence a cast error a strict read would throw)
    val strict = expr("variant_get(v, '$.k', 'long') >= 100")
    assert(t2.prunedFiles(t2.snapshot, strict).size === 12,
      "strict variant_get must not prune")
    // a type-mismatched try get reads DIFFERENT stats (type is in the key)
    val otherType = expr("try_variant_get(v, '$.k', 'string') >= '100'")
    assert(t2.prunedFiles(t2.snapshot, otherType).size === 12,
      "a differently-typed get must not reuse the long stats")
  }
}
