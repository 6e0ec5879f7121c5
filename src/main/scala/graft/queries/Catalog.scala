package graft.queries

import java.util.concurrent.ConcurrentHashMap

import graft.sources.GraftCatalog
import org.apache.spark.sql.SparkSession

/** SQL-catalog front door, oracle-checked: graft tables addressed BY NAME
  * from `spark.sql` — the reference's `spark.sql.catalog` bootstrap line
  * (spark_project.py:11-13) re-expressed as a DSv2 `TableCatalog`
  * (sources/GraftCatalog.scala). Both queries run PURE SQL end to end:
  * DDL, DML and reads never touch the DataFrame API, which is exactly the
  * surface a Spark SQL user hits first.
  */
object CatalogQueries {

  /** One warehouse + catalog registration per JVM; fixtures memoized like
    * every other table scenario (Verify and Bench re-run builders). */
  private val cache = new ConcurrentHashMap[String, String]()

  private def registered(s: SparkSession): Unit =
    cache.computeIfAbsent("warehouse", _ => {
      val wh = graft.Scratch.dir("graft-sql-wh-").toString
      GraftCatalog.register(s, wh)
      wh
    })

  private def sfx(dir: String): String = dir.replaceAll("[^A-Za-z0-9]+", "_")

  val all: Seq[(String, Q)] = Seq(

    // ---- Name-based SQL over a CTAS-created catalog table --------------------------
    // CREATE TABLE ... USING graft AS SELECT loads orders into the
    // warehouse; the measured query aggregates BY NAME through the DSv2
    // scan (filter + column pushdown feed the same stats-pruning path as
    // GraftTable.scan). The oracle runs the identical SQL on the raw
    // parquet — proving the catalog round trip (CTAS write → log →
    // name-resolved read) is lossless.
    "q133_catalog_sql_agg" -> Q(
      (s, dir) => {
        registered(s)
        val t = s"graft.default.orders_${sfx(dir)}"
        cache.computeIfAbsent(s"ctas:$dir", _ => {
          s.sql(s"""CREATE TABLE $t USING graft AS
                   |SELECT o_orderkey, o_orderstatus, o_orderpriority, o_totalprice
                   |FROM parquet.`$dir/orders.parquet`""".stripMargin)
          t
        })
        s.sql(
          s"""SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n_orders,
             |  ${Exact.sqlSumExact("o_totalprice")} AS total_price
             |FROM $t
             |WHERE o_totalprice > 50000.0
             |GROUP BY o_orderstatus, o_orderpriority
             |ORDER BY o_orderstatus, o_orderpriority""".stripMargin)
      },
      s"""SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n_orders,
         |  ${Exact.sqlSumExact("o_totalprice")} AS total_price
         |FROM orders
         |WHERE o_totalprice > 50000.0
         |GROUP BY o_orderstatus, o_orderpriority
         |ORDER BY o_orderstatus, o_orderpriority""".stripMargin),

    // ---- SQL time travel across a DDL+DML history ----------------------------------
    // The golden-scenario shape (q70/q71) driven ENTIRELY through SQL:
    // CREATE, two INSERTs, a DELETE — then every version read back with
    // `VERSION AS OF` and tagged, so one result pins the whole history.
    // The literal-VALUES oracle is the ground truth of each snapshot.
    "q134_sql_time_travel" -> Q(
      (s, _) => {
        registered(s)
        val t = "graft.default.people_tt"
        cache.computeIfAbsent("people_tt", _ => {
          s.sql(s"CREATE TABLE $t (id INT, firstname STRING, lastname STRING) USING graft")
          s.sql(s"INSERT INTO $t VALUES (1, 'James', 'Bond'), " +
            "(2, 'Alice', 'Rogers'), (3, 'Joe', 'Bloggs')") // v1
          s.sql(s"INSERT INTO $t VALUES (4, 'New', 'Person')") // v2
          s.sql(s"DELETE FROM $t WHERE id = 1 OR id = 3") // v3
          t
        })
        s.sql(
          s"""SELECT 1 AS v, * FROM $t VERSION AS OF 1
             |UNION ALL SELECT 2 AS v, * FROM $t VERSION AS OF 2
             |UNION ALL SELECT 3 AS v, * FROM $t
             |ORDER BY v, id""".stripMargin)
      },
      """SELECT * FROM (VALUES
        |  (1, 1, 'James', 'Bond'), (1, 2, 'Alice', 'Rogers'), (1, 3, 'Joe', 'Bloggs'),
        |  (2, 1, 'James', 'Bond'), (2, 2, 'Alice', 'Rogers'), (2, 3, 'Joe', 'Bloggs'),
        |  (2, 4, 'New', 'Person'),
        |  (3, 2, 'Alice', 'Rogers'), (3, 4, 'New', 'Person'))
        |AS t(v, id, firstname, lastname) ORDER BY v, id""".stripMargin),

    // ---- The reference's golden DML scenario, driven by PURE SQL ------------------
    // q70 replays api.py:88-107 through the Scala table API; this replays
    // the IDENTICAL scenario through nothing but spark.sql statements —
    // CREATE, seed INSERT, the same MERGE INTO (update one + insert one),
    // the same DELETE — and must land on the identical final state. MERGE
    // and UPDATE arrive via SupportsRowLevelOperations (group-based
    // copy-on-write rewrite, one atomic commit); DELETE via the
    // translatable-filter fast path. The history tail in the output pins
    // that each statement became exactly one commit of the right kind.
    "q136_sql_golden_dml" -> Q(
      (s, _) => {
        registered(s)
        val t = "graft.default.people_dml"
        cache.computeIfAbsent("people_dml", _ => {
          s.sql(s"CREATE TABLE $t (id INT, firstname STRING, lastname STRING) USING graft")
          s.sql(s"INSERT INTO $t VALUES (1, 'James', 'Bond'), " +
            "(2, 'Alice', 'Rogers'), (3, 'Joe', 'Bloggs')") // v1
          s.sql(s"""MERGE INTO $t t
                   |USING (SELECT * FROM VALUES (2, 'Alice', 'Smith'), (4, 'New', 'Person')
                   |       AS s(id, firstname, lastname)) s
                   |ON t.id = s.id
                   |WHEN MATCHED THEN UPDATE SET t.firstname = s.firstname, t.lastname = s.lastname
                   |WHEN NOT MATCHED THEN INSERT (id, firstname, lastname)
                   |  VALUES (s.id, s.firstname, s.lastname)""".stripMargin) // v2
          s.sql(s"DELETE FROM $t WHERE id = 1 OR id = 3") // v3
          t
        })
        s.sql(s"SELECT * FROM $t ORDER BY id")
      },
      """SELECT * FROM (VALUES (2, 'Alice', 'Smith'), (4, 'New', 'Person'))
        |AS t(id, firstname, lastname) ORDER BY id""".stripMargin),
  )
}
