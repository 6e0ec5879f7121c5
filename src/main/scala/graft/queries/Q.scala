package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One named engine query: a Spark builder plus (optionally) its ANSI-SQL
  * twin for the driver's DuckDB oracle. `oracle = None` ⇒ the op is not
  * SQL-expressible identically (e.g. hash-based sketches) and gets the
  * driver's weaker rows-only check plus a scalatest spec.
  */
final case class Q(build: (SparkSession, String) => DataFrame, oracle: Option[String])

object Q {
  def apply(build: (SparkSession, String) => DataFrame, sql: String): Q =
    Q(build, Some(sql))
}
