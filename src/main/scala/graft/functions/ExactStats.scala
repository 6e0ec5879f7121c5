package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Typed UDAF surface: exact population variance over 2-decimal doubles.
  *
  * The naive streaming formulations (Welford, plain double sums) are
  * accumulation-order dependent — useless under a hash-compare oracle and
  * irreproducible across partitionings. This Aggregator keeps the power
  * sums in DECIMAL (order-independent integer arithmetic), so any partition
  * layout produces the same buffer; only the final variance is evaluated in
  * doubles, with a fixed expression shape the DuckDB oracle mirrors
  * literally.
  *
  * Also the merge-tree property matters at scale: `merge` is associative
  * and commutative over exact decimals, so partial aggregation (map-side
  * combine) is safe — this is what a custom sketch needs to survive a
  * 1000-executor shuffle.
  */
object ExactStats {

  final case class VarBuf(n: Long, sum: BigDecimal, sumsq: BigDecimal)

  class ExactVarPop extends Aggregator[java.lang.Double, VarBuf, java.lang.Double] {
    private def dec(v: Double): BigDecimal =
      BigDecimal(v).setScale(2, BigDecimal.RoundingMode.HALF_UP)

    override def zero: VarBuf = VarBuf(0L, BigDecimal(0), BigDecimal(0))

    override def reduce(b: VarBuf, v: java.lang.Double): VarBuf =
      if (v == null) b
      else {
        val d = dec(v)
        VarBuf(b.n + 1, b.sum + d, b.sumsq + d * d)
      }

    override def merge(a: VarBuf, b: VarBuf): VarBuf =
      VarBuf(a.n + b.n, a.sum + b.sum, a.sumsq + b.sumsq)

    override def finish(b: VarBuf): java.lang.Double =
      if (b.n == 0) null
      else {
        // fixed double expression shape, mirrored by the oracle SQL:
        // (sumsq - sum*sum/n) / n
        val s = b.sum.toDouble
        val sq = b.sumsq.toDouble
        (sq - s * s / b.n) / b.n
      }

    override def bufferEncoder: Encoder[VarBuf] = Encoders.product[VarBuf]
    override def outputEncoder: Encoder[java.lang.Double] = Encoders.DOUBLE
  }

  /** Column form: exact var_pop for 2-decimal double columns. */
  val exactVarPop: org.apache.spark.sql.expressions.UserDefinedFunction =
    udaf(new ExactVarPop, Encoders.DOUBLE)

  def varPop2dp(c: Column): Column = exactVarPop(c)

  /** Oracle twin of finish(): same double expression over exact decimal sums. */
  def sqlVarPop2dp(x: String): String =
    s"""(CAST(SUM(CAST($x AS DECIMAL(18,2)) * CAST($x AS DECIMAL(18,2))) AS DOUBLE)
       | - CAST(SUM(CAST($x AS DECIMAL(18,2))) AS DOUBLE)
       |   * CAST(SUM(CAST($x AS DECIMAL(18,2))) AS DOUBLE) / COUNT($x))
       | / COUNT($x)""".stripMargin.replaceAll("\n", "")
}
