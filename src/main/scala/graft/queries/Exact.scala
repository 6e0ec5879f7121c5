package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deterministic-aggregation helpers shared by all oracle-checked queries.
  *
  * Why: `SUM(double)` is accumulation-order dependent, so Spark (parallel,
  * partial+final agg) and the DuckDB oracle (sequential) can disagree in the
  * low bits — and the driver's correctness gate is a *hash* compare, so "close"
  * is a fail. The synthetic data carries 2-decimal doubles (TESTDATA/FIXTURES),
  * so we cast each row to DECIMAL(18,2) first, aggregate exactly in decimal
  * (order-independent integer arithmetic), and cast the final scalar back to
  * DOUBLE. Both engines then produce bit-identical doubles.
  *
  * Scale note: decimal agg is still a codegen'd one-pass hash aggregate with
  * map-side partial aggregation — the exactness costs nothing architectural
  * at 100 TB (slightly wider agg buffers, same shuffle shape).
  */
object Exact {
  /** Per-row normalization of a 2-decimal double column. */
  def dec(c: Column): Column = c.cast("decimal(18,2)")

  /** Exact SUM over a 2-decimal double column, returned as DOUBLE.
    * DuckDB twin: CAST(SUM(CAST(x AS DECIMAL(18,2))) AS DOUBLE) */
  def sumExact(c: Column): Column = sum(dec(c)).cast("double")

  /** Exact AVG = exact decimal SUM divided (in double) by COUNT.
    * DuckDB twin: CAST(SUM(CAST(x AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) */
  def avgExact(c: Column): Column = sum(dec(c)).cast("double") / count(lit(1))

  /** Exact revenue term: price * (1 - discount) computed wholly in decimal.
    * DuckDB twin:
    *   CAST(x AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(d AS DECIMAL(18,2))) */
  def discPrice(price: Column, discount: Column): Column =
    dec(price) * (lit(1).cast("decimal(18,2)") - dec(discount))

  /** SQL fragments for the DuckDB oracle, mirroring the helpers above. */
  def sqlDec(x: String): String      = s"CAST($x AS DECIMAL(18,2))"
  def sqlSumExact(x: String): String = s"CAST(SUM(${sqlDec(x)}) AS DOUBLE)"
  def sqlAvgExact(x: String): String = s"CAST(SUM(${sqlDec(x)}) AS DOUBLE) / COUNT(*)"
  def sqlDiscPrice(p: String, d: String): String =
    s"${sqlDec(p)} * (CAST(1 AS DECIMAL(18,2)) - ${sqlDec(d)})"
}
