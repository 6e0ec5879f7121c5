package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for each left row, the single most recent right row with
  * `right.ts <= left.ts`, per key — the time-series join Spark has no
  * native operator for (DuckDB/kdb ASOF JOIN, Pandas merge_asof).
  *
  * Implementation is the union-merge formulation, NOT a range self-join:
  * tag both sides, union, and run one `last_value(ignoreNulls)` window over
  * (key, ts). Cost is a single shuffle on the key + a sort within
  * partitions — O((|L|+|R|) log) per key group, versus the quadratic
  * per-key blowup of the naive `L join R on key and r.ts <= l.ts` +
  * row_number formulation. At 100 TB the union-merge is the only shape
  * that survives: it never materializes candidate pairs.
  */
object AsOfJoin {

  /** Join `left` to the latest `right` row at-or-before the left timestamp.
    *
    * @param keys     equi-join key column names (present on both sides)
    * @param leftTs   event-time column on the left
    * @param rightTs  event-time column on the right
    * @param rightVal right-side value columns to carry (null when no match)
    */
  def asof(left: DataFrame, right: DataFrame, keys: Seq[String],
           leftTs: String, rightTs: String, rightVal: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    val l = left
      .withColumn("__ts", col(leftTs))
      .withColumn("__side", lit(1)) // right rows sort before left at equal ts
      .withColumns(rightVal.map(c => s"__r_$c" -> lit(null)).toMap)
    val r = right
      .withColumn("__ts", col(rightTs))
      .withColumn("__side", lit(0))
      .withColumns(rightVal.map(c => s"__r_$c" -> col(c)).toMap)
      .select((keys ++ Seq("__ts", "__side") ++ rightVal.map(c => s"__r_$c"))
        .map(col).toSeq: _*)
    val unioned = l.select((keys ++ Seq("__ts", "__side") ++ rightVal.map(c => s"__r_$c")
        ++ leftCols.filterNot(keys.contains)).distinct.map(col).toSeq: _*)
      .unionByName(r, allowMissingColumns = true)

    // one window pass: latest non-null right value at or before this row
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__ts"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = rightVal.foldLeft(unioned) { (df, c) =>
      df.withColumn(s"__asof_$c", last(col(s"__r_$c"), ignoreNulls = true).over(w))
    }
    filled
      .filter(col("__side") === 1) // keep left rows only
      .select((leftCols.map(col) ++
        rightVal.map(c => col(s"__asof_$c").as(s"asof_$c"))).toSeq: _*)
  }
}
