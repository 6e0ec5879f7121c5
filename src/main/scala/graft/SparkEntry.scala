package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Query registry: each module under `graft.queries` contributes named
  * queries with (where SQL-expressible) a DuckDB oracle twin. Hash-based
  * sketch ops legitimately omit the oracle and are covered by scalatest.
  */
object SparkEntry {

  /** All query modules, in inventory order (SURVEY.md §2-C / §2-D).
    * private[graft] so the spec can assert name uniqueness — a duplicate
    * name would silently drop a query at the `.toMap`. */
  private[graft] def modules: Seq[(String, Q)] =
    Relational.all ++ Events.all ++ Text.all ++ Dedup.all ++ Similarity.all ++
      Sampling.all ++ Multimodal.all ++ TableQueries.all ++ Streaming.all ++
      Retrieval.all ++ GraphQueries.all ++ Privacy.all ++ Interchange.all ++
      DataQuality.all ++ CatalogQueries.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q01_pricing_summary")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    modules.map { case (name, q) => name -> q.build }.toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    modules.collect { case (name, Q(_, Some(sql))) => name -> sql }.toMap
}
