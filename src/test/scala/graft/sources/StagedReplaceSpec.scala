package graft.sources

import java.nio.file.{Files, Paths}

import graft.SparkTestBase
import graft.table.GraftTable
import org.apache.spark.sql.functions._

/** StagingTableCatalog: CREATE TABLE AS SELECT, REPLACE TABLE AS SELECT,
  * and CREATE OR REPLACE are ATOMIC — the query's files are written
  * invisibly first, one log commit publishes them, and a failure anywhere
  * before that commit leaves the previous table byte-identical. */
class StagedReplaceSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val wh = tmpDir("staged-wh-")
  private def sql(q: String) = spark.sql(q)
  private lazy val registered: Unit =
    GraftCatalog.register(spark, wh, name = "scat")

  test("CTAS creates atomically via the staging protocol") {
    registered
    sql("CREATE TABLE scat.default.ctas USING graft AS SELECT 1 AS id, 'a' AS name")
    assert(sql("SELECT * FROM scat.default.ctas").collect().map(_.getInt(0)).toSeq == Seq(1))
    val t = GraftTable.forPath(spark, s"$wh/default/ctas")
    assert(t.history().select("operation").head().getString(0) == "CREATE TABLE AS SELECT")
  }

  test("REPLACE TABLE AS SELECT swaps schema and data in one commit; history survives") {
    registered
    sql("CREATE TABLE scat.default.rep (id INT, v STRING) USING graft")
    sql("INSERT INTO scat.default.rep VALUES (1, 'one'), (2, 'two')")
    val preVersion = GraftTable.forPath(spark, s"$wh/default/rep").latestVersion
    sql("REPLACE TABLE scat.default.rep USING graft AS " +
      "SELECT CAST(10 AS BIGINT) AS k, 3.5D AS score")
    val t = GraftTable.forPath(spark, s"$wh/default/rep")
    // one commit did the whole swap
    assert(t.latestVersion == preVersion + 1)
    assert(t.snapshot.schema.fieldNames.toSeq == Seq("k", "score"))
    assert(sql("SELECT k FROM scat.default.rep").as[Long].collect().toSeq == Seq(10L))
    // time travel across the replace boundary still serves the OLD table
    assert(sql(s"SELECT * FROM scat.default.rep VERSION AS OF $preVersion")
      .columns.toSeq == Seq("id", "v"))
    assert(sql(s"SELECT * FROM scat.default.rep VERSION AS OF $preVersion").count() == 2)
  }

  test("a failing RTAS query leaves the old table fully intact") {
    registered
    sql("CREATE TABLE scat.default.safe (id INT, v STRING) USING graft")
    sql("INSERT INTO scat.default.safe VALUES (1, 'keep')")
    val before = GraftTable.forPath(spark, s"$wh/default/safe").latestVersion
    intercept[Exception] {
      // raise_error fires mid-query, after the write has started planning
      sql("REPLACE TABLE scat.default.safe USING graft AS " +
        "SELECT id, CAST(raise_error('boom') AS STRING) AS v " +
        "FROM scat.default.safe")
    }
    val t = GraftTable.forPath(spark, s"$wh/default/safe")
    assert(t.latestVersion == before, "no commit may land from a failed RTAS")
    assert(sql("SELECT v FROM scat.default.safe").as[String].collect().toSeq == Seq("keep"))
    // no orphaned staged files grew the directory beyond the live set + log
    val live = t.snapshot.files.map(_.path).toSet
    val onDisk = Files.walk(Paths.get(t.path)).iterator()
    var orphans = 0
    while (onDisk.hasNext) {
      val p = onDisk.next()
      val rel = Paths.get(t.path).relativize(p).toString
      if (rel.endsWith(".parquet") && !rel.startsWith("_delta_log") &&
          !live.contains(rel)) orphans += 1
    }
    assert(orphans == 0, s"$orphans staged file(s) leaked")
  }

  test("REPLACE TABLE on a missing table rejects; CREATE OR REPLACE creates") {
    registered
    intercept[Exception](
      sql("REPLACE TABLE scat.default.ghost USING graft AS SELECT 1 AS id"))
    sql("CREATE OR REPLACE TABLE scat.default.ghost USING graft AS SELECT 1 AS id")
    assert(sql("SELECT * FROM scat.default.ghost").count() == 1)
    sql("CREATE OR REPLACE TABLE scat.default.ghost USING graft AS " +
      "SELECT 2 AS id UNION ALL SELECT 3")
    assert(sql("SELECT id FROM scat.default.ghost ORDER BY id")
      .collect().map(_.getInt(0)).toSeq == Seq(2, 3))
  }
}
