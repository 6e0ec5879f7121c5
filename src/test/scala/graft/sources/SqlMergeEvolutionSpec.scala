package graft.sources

import graft.SparkTestBase
import graft.table.GraftTable

/** Spark 4's `MERGE INTO ... WITH SCHEMA EVOLUTION` SQL spelling: the
  * analyzer derives source-only columns as AddColumn changes against the
  * catalog (metadata-only commit), then the merge itself runs against the
  * evolved schema — mirroring the native API's withSchemaEvolution(). */
class SqlMergeEvolutionSpec extends SparkTestBase {

  private lazy val wh = tmpDir("sqlmerge-wh-")
  private def sql(q: String) = spark.sql(q)
  private lazy val registered: Unit =
    GraftCatalog.register(spark, wh, name = "mcat")

  test("MERGE INTO ... WITH SCHEMA EVOLUTION lands the evolved column") {
    registered
    sql("CREATE TABLE mcat.default.evo (id INT, name STRING) USING graft")
    sql("INSERT INTO mcat.default.evo VALUES (1, 'ann'), (2, 'bob')")
    sql("""MERGE WITH SCHEMA EVOLUTION INTO mcat.default.evo t
          |USING (SELECT 2 AS id, 'bob2' AS name, 20 AS score
          |       UNION ALL SELECT 4, 'dan', 40) s
          |ON t.id = s.id
          |WHEN MATCHED THEN UPDATE SET *
          |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    val rows = sql("SELECT id, name, score FROM mcat.default.evo ORDER BY id").collect()
    assert(rows.map(_.getInt(0)).toSeq == Seq(1, 2, 4))
    assert(rows.map(_.getString(1)).toSeq == Seq("ann", "bob2", "dan"))
    assert(rows(0).isNullAt(2), "pre-evolution row reads the new column as null")
    assert(rows(1).getInt(2) == 20 && rows(2).getInt(2) == 40)
    // the evolution itself was an additive metadata-only commit
    val t = GraftTable.forPath(spark, s"$wh/default/evo")
    assert(t.snapshot.schema.fieldNames.toSeq == Seq("id", "name", "score"))
    assert(t.history().collect().exists(_.getString(2) == "ADD COLUMNS"))
  }

  test("without the clause, the schema never evolves (extra source columns ignored)") {
    registered
    sql("CREATE TABLE mcat.default.noevo (id INT, name STRING) USING graft")
    sql("INSERT INTO mcat.default.noevo VALUES (1, 'ann')")
    // Spark's DSv2 merge semantics: UPDATE SET * binds the TARGET's
    // columns; a source-only column is ignored unless WITH SCHEMA
    // EVOLUTION opts in — the table's schema must stay untouched
    sql("""MERGE INTO mcat.default.noevo t
          |USING (SELECT 1 AS id, 'x' AS name, 9 AS score) s
          |ON t.id = s.id
          |WHEN MATCHED THEN UPDATE SET *""".stripMargin)
    assert(sql("SELECT * FROM mcat.default.noevo").columns.toSeq == Seq("id", "name"))
    assert(sql("SELECT name FROM mcat.default.noevo").head().getString(0) == "x")
    val t = GraftTable.forPath(spark, s"$wh/default/noevo")
    assert(!t.history().collect().exists(_.getString(2) == "ADD COLUMNS"))
  }
}
