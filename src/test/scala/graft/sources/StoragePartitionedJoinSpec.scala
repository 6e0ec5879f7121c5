package graft.sources

import graft.SparkTestBase
import graft.table.GraftTable
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Storage-partitioned joins (GraftKeyGroupedScan): two graft tables
  * Hive-partitioned on the join key must plan a fact-fact equi-join with
  * ZERO shuffle exchange — Spark 4's SPJ path over the scan's
  * KeyGroupedPartitioning — and every eligible/ineligible shape must keep
  * exact result parity with the V1 bridge path.
  */
class StoragePartitionedJoinSpec extends SparkTestBase {

  private lazy val (pathA, pathB): (String, String) = {
    import spark.implicits._
    val docs = graft.Tables.documents(spark, sfDir)
    val pa = tmpDir("spj-a-") + "/t"
    val pb = tmpDir("spj-b-") + "/t"
    GraftTable.create(spark, pa,
      docs.select($"doc_id", $"lang", $"n_chars"), partitionBy = Seq("lang"))
    GraftTable.create(spark, pb,
      docs.select($"doc_id", $"lang",
        size(split($"text", " ")).cast("long").as("n_tokens")),
      partitionBy = Seq("lang"))
    (pa, pb)
  }

  private def a: DataFrame = spark.read.format("graft").load(pathA)
  private def b: DataFrame = spark.read.format("graft").load(pathB)

  private def withConfs(pairs: (String, String)*)(body: => Unit): Unit = {
    val saved = pairs.map { case (k, _) =>
      // a conf defined without a default reads back null — unset, not set-null
      k -> scala.util.Try(spark.conf.get(k)).toOption.flatMap(Option(_)) }
    try { pairs.foreach { case (k, v) => spark.conf.set(k, v) }; body }
    finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  private def executed(df: DataFrame): String = {
    df.collect()
    df.queryExecution.executedPlan.toString
  }

  test("fact-fact join on (partKey, id): zero shuffle, sort-merge, co-located") {
    withConfs(
      "spark.sql.requireAllClusterKeysForCoPartition" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1") {
      val p = executed(a.join(b, Seq("lang", "doc_id")))
      assert(!p.contains("Exchange"), s"SPJ join must not shuffle:\n${p.take(1500)}")
      assert(p.contains("SortMergeJoin"), "expected a co-located sort-merge join")
      assert(p.contains("BatchScan"), "both sides must plan the key-grouped scan")
    }
  }

  test("rollup join on the partition key: zero exchange end-to-end (ambient co-partition conf)") {
    withConfs(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1") {
      import spark.implicits._
      val df = a.groupBy($"lang").agg(count(lit(1)).as("n_docs"))
        .join(b.groupBy($"lang").agg(sum($"n_tokens").as("toks")), Seq("lang"))
      val p = executed(df)
      assert(!p.contains("Exchange"),
        s"per-partition rollup + join must plan no exchange:\n${p.take(1500)}")
    }
  }

  test("same-key aggregation elides its exchange under fully ambient confs") {
    import spark.implicits._
    val p = executed(a.groupBy($"lang").agg(sum($"n_chars").as("c")))
    assert(!p.contains("Exchange hashpartitioning"),
      s"groupBy(partition key) must reuse the storage partitioning:\n${p.take(1500)}")
  }

  test("result parity: SPJ path equals the V1 bridge path row-for-row") {
    import spark.implicits._
    def q(df1: DataFrame, df2: DataFrame): Array[(Long, String, Long, Long)] =
      df1.join(df2, Seq("lang", "doc_id"))
        .select($"doc_id", $"lang", $"n_chars", $"n_tokens")
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
        .sortBy(t => (t._1, t._2))
    val spj = q(a, b)
    var v1: Array[(Long, String, Long, Long)] = null
    withConfs("spark.graft.spj.enabled" -> "false") {
      val p = a.join(b, Seq("lang", "doc_id")).queryExecution.executedPlan.toString
      assert(!p.contains("BatchScan"), "kill switch must restore the V1 path")
      v1 = q(a, b)
    }
    assert(spj.sameElements(v1), "SPJ and V1 reads must agree exactly")
  }

  test("deletion vectors compose: tombstoned rows vanish from the SPJ read") {
    import spark.implicits._
    val pd = tmpDir("spj-dv-") + "/t"
    val t = GraftTable.create(spark, pd,
      graft.Tables.documents(spark, sfDir).select($"doc_id", $"lang", $"n_chars"),
      partitionBy = Seq("lang"))
    t.setProperty("deletionVectors.enabled", "true")
    t.delete($"doc_id" % 3 === 0)
    val got = spark.read.format("graft").load(pd)
      .select($"doc_id").collect().map(_.getLong(0)).sorted
    val want = t.toDF.select($"doc_id").collect().map(_.getLong(0)).sorted
    assert(got.sameElements(want), "DV-masked SPJ scan must match the table read")
    assert(got.forall(_ % 3 != 0))
  }

  test("catalog front door: SQL join of two registered partitioned tables plans SPJ") {
    GraftCatalog.register(spark, tmpDir("spj-cat-wh-"), name = "spjcat")
    spark.sql(s"CREATE TABLE spjcat.default.a USING graft LOCATION '$pathA'")
    spark.sql(s"CREATE TABLE spjcat.default.b USING graft LOCATION '$pathB'")
    withConfs(
      "spark.sql.requireAllClusterKeysForCoPartition" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1") {
      val df = spark.sql(
        """SELECT x.doc_id, x.lang, x.n_chars, y.n_tokens
          |FROM spjcat.default.a x JOIN spjcat.default.b y
          |ON x.lang = y.lang AND x.doc_id = y.doc_id""".stripMargin)
      val p = executed(df)
      assert(!p.contains("Exchange"), s"catalog SPJ join must not shuffle:\n${p.take(1500)}")
      assert(p.contains("SortMergeJoin"))
    }
  }

  test("time travel rides the key-grouped scan: versionAsOf serves the pinned snapshot") {
    import spark.implicits._
    val pt = tmpDir("spj-tt-") + "/t"
    val t = GraftTable.create(spark, pt,
      graft.Tables.documents(spark, sfDir).select($"doc_id", $"lang", $"n_chars"),
      partitionBy = Seq("lang"))
    val v0 = t.toDF.count()
    t.delete($"doc_id" % 2 === 0)
    val old = spark.read.format("graft").option("versionAsOf", 0).load(pt)
    assert(old.queryExecution.executedPlan.toString.contains("BatchScan"),
      "a pinned partitioned read still plans the key-grouped scan")
    assert(old.count() === v0, "versionAsOf must serve the pre-delete snapshot")
    assert(spark.read.format("graft").load(pt).count() < v0)
    // and the pinned snapshot still groups by key (exchange-free agg)
    val agg = old.groupBy($"lang").agg(sum($"n_chars"))
    agg.collect()
    assert(!agg.queryExecution.executedPlan.toString
      .contains("Exchange hashpartitioning"))
  }

  test("schema evolution decodes through the key-grouped scan: pre-evolution files read null") {
    import spark.implicits._
    val pe = tmpDir("spj-evo-") + "/t"
    val t = GraftTable.create(spark, pe,
      Seq((1L, "en", 10L), (2L, "fr", 20L)).toDF("doc_id", "lang", "n_chars"),
      partitionBy = Seq("lang"))
    t.append(Seq((3L, "en", 30L, 0.9), (4L, "fr", 40L, 0.4))
      .toDF("doc_id", "lang", "n_chars", "quality"), mergeSchema = true)
    val df = spark.read.format("graft").load(pe)
    assert(df.queryExecution.executedPlan.toString.contains("BatchScan"),
      "the evolved partitioned table still serves the key-grouped scan")
    val got = df.select($"doc_id", $"quality").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1))))
      .toMap
    assert(got === Map(1L -> None, 2L -> None, 3L -> Some(0.9), 4L -> Some(0.4)),
      "files written before the evolution must decode the new column as null")
    // and the evolved column aggregates exchange-free on the partition key
    val agg = df.groupBy($"lang").agg(count($"quality").as("n"))
    assert(agg.collect().map(r => r.getString(0) -> r.getLong(1)).toMap ===
      Map("en" -> 1L, "fr" -> 1L))
  }

  test("timestamp partition keys: event-time fact-fact join plans zero shuffle, V1 parity") {
    import spark.implicits._
    // hour-truncated event time as the partition key — the Hive dirs carry
    // formatted timestamps ("ts_h=2024-01-01 07%3A00%3A00"), the round-12
    // exclusion this decoder now serves
    val ev = graft.Tables.events(spark, sfDir)
      .withColumn("ts_h", date_trunc("HOUR", $"ts"))
    val pt1 = tmpDir("spj-ts-a-") + "/t"
    val pt2 = tmpDir("spj-ts-b-") + "/t"
    GraftTable.create(spark, pt1,
      ev.select($"event_id", $"ts_h", $"value"), partitionBy = Seq("ts_h"))
    GraftTable.create(spark, pt2,
      ev.select($"event_id", $"ts_h", $"user_id"), partitionBy = Seq("ts_h"))
    val ta = spark.read.format("graft").load(pt1)
    val tb = spark.read.format("graft").load(pt2)
    withConfs(
      "spark.sql.requireAllClusterKeysForCoPartition" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1") {
      val joined = ta.join(tb, Seq("ts_h", "event_id"))
      val p = executed(joined)
      assert(p.contains("BatchScan"), "timestamp keys must now take the SPJ scan")
      assert(!p.contains("Exchange"),
        s"event-time co-partitioned join must not shuffle:\n${p.take(1500)}")
    }
    // parity: the SPJ read of the timestamp key equals the V1 read exactly
    def rows(df: DataFrame) = df.select($"event_id", $"ts_h", $"value")
      .collect().map(r => (r.getLong(0), r.getTimestamp(1).getTime, r.getDouble(2)))
      .sortBy(t => (t._1, t._2))
    val spj = rows(ta)
    withConfs("spark.graft.spj.enabled" -> "false") {
      assert(!ta.queryExecution.executedPlan.toString.contains("BatchScan"))
      assert(rows(ta).sameElements(spj),
        "SPJ and V1 timestamp partition decode must agree exactly")
    }
  }

  test("ineligible shapes fall back to the V1 bridge: unpartitioned + _file projection") {
    import spark.implicits._
    val pu = tmpDir("spj-flat-") + "/t"
    GraftTable.create(spark, pu,
      graft.Tables.documents(spark, sfDir).select($"doc_id", $"lang", $"n_chars"))
    val flat = spark.read.format("graft").load(pu)
    assert(!flat.queryExecution.executedPlan.toString.contains("BatchScan"),
      "unpartitioned tables keep the V1 path")
    // metadata-column projections must keep the V1 machinery that binds them
    val withFile = a.select($"doc_id", col("_file"))
    assert(!withFile.queryExecution.executedPlan.toString.contains("BatchScan"),
      "_file projection keeps the V1 path")
    assert(withFile.collect().forall(_.getString(1).nonEmpty))
  }
}
