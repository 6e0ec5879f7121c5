package graft

import graft.functions.{DotProduct, HammingDistance}
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

/** Session extension wiring: registers the native graft expressions for SQL
  * use (`SELECT vec_dot(a, b)`). Activate with
  * `.config("spark.sql.extensions", "graft.GraftExtensions")` or pass the
  * builder through `GraftExtensions.install`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("vec_dot"),
      new ExpressionInfo(classOf[DotProduct].getName, "vec_dot"),
      children => DotProduct(children.head, children(1))))
    ext.injectFunction((
      new FunctionIdentifier("hamming"),
      new ExpressionInfo(classOf[HammingDistance].getName, "hamming"),
      children => HammingDistance(children.head, children(1))))
  }
}
