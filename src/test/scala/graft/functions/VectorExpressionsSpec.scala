package graft.functions

import graft.SparkTestBase
import graft.functions.VectorFunctions.vecDot
import org.apache.spark.sql.functions._

/** Native DotProduct: equality with the interpreted HOF formulation
  * (bit-for-bit), null/length semantics, SQL registration, codegen path. */
class VectorExpressionsSpec extends SparkTestBase {

  private lazy val vecs = {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    (0 until 100).map(i => (i.toLong, Array.fill(64)(rnd.nextDouble() * 2 - 1)))
      .toDF("id", "v")
  }

  test("matches interpreted aggregate/zip_with bit-for-bit") {
    import spark.implicits._
    val both = vecs.as("a").crossJoin(vecs.as("b")).limit(2000)
      .withColumn("native", vecDot($"a.v", $"b.v"))
      .withColumn("hof",
        expr("aggregate(zip_with(a.v, b.v, (x, y) -> x * y), 0d, (acc, x) -> acc + x)"))
    assert(both.filter($"native" =!= $"hof" ||
      $"native".isNull =!= $"hof".isNull).count() === 0)
  }

  test("null element and length mismatch yield null") {
    import spark.implicits._
    val df = Seq(
      (Array[java.lang.Double](1.0, 2.0), Array[java.lang.Double](3.0, 4.0)),
      (Array[java.lang.Double](1.0, null), Array[java.lang.Double](3.0, 4.0))
    ).toDF("a", "b")
    val r = df.select(vecDot($"a", $"b").as("d")).collect()
    assert(r(0).getDouble(0) === 11.0)
    assert(r(1).isNullAt(0))
    val mismatch = Seq((Array(1.0, 2.0), Array(1.0))).toDF("a", "b")
      .select(vecDot($"a", $"b")).collect()
    assert(mismatch(0).isNullAt(0))
  }

  test("SQL registration via GraftExtensions injectFunction") {
    // same registry mechanism GraftExtensions wires into new sessions
    new GraftExtensionsInstaller().install(spark)
    val r = spark.sql("SELECT vec_dot(array(1d, 2d, 3d), array(4d, 5d, 6d)) AS d").collect()
    assert(r(0).getDouble(0) === 32.0)
  }

  test("hamming: codegen matches interpreted zip_with count; null/length semantics") {
    import spark.implicits._
    import graft.functions.VectorFunctions.hamming
    val rnd = new scala.util.Random(3)
    val bits = (0 until 60).map(i => (i.toLong, Array.fill(64)(rnd.nextInt(2))))
      .toDF("id", "b")
    val both = bits.as("x").crossJoin(bits.as("y")).limit(1500)
      .withColumn("native", hamming($"x.b", $"y.b"))
      .withColumn("hof", expr("size(filter(zip_with(x.b, y.b, (p, q) -> p != q), t -> t))"))
    assert(both.filter($"native" =!= $"hof").count() === 0)
    val mismatch = Seq((Array(1, 0), Array(1))).toDF("a", "b")
      .select(hamming($"a", $"b")).collect()
    assert(mismatch(0).isNullAt(0))
    // SQL registration
    new GraftExtensionsInstaller().install(spark)
    assert(spark.sql("SELECT hamming(array(1,0,1), array(1,1,1)) AS h")
      .collect()(0).getInt(0) === 1)
  }

  test("float-array input coerces and matches double math") {
    import spark.implicits._
    val f = Seq((Array(1.5f, 2.5f), Array(2.0f, 4.0f))).toDF("a", "b")
      .select(vecDot(expr("transform(a, x -> cast(x as double))"),
                     expr("transform(b, x -> cast(x as double))")).as("d"))
    assert(f.collect()(0).getDouble(0) === (1.5f.toDouble * 2.0f.toDouble + 2.5f.toDouble * 4.0f.toDouble))
  }
}

/** Test helper: applies the GraftExtensions function injection to an
  * already-built session (extensions normally hook at builder time). */
class GraftExtensionsInstaller {
  def install(spark: org.apache.spark.sql.SparkSession): Unit = {
    import org.apache.spark.sql.catalyst.FunctionIdentifier
    import org.apache.spark.sql.catalyst.expressions.ExpressionInfo
    spark.sessionState.functionRegistry.registerFunction(
      new FunctionIdentifier("vec_dot"),
      new ExpressionInfo(classOf[DotProduct].getName, "vec_dot"),
      children => DotProduct(children.head, children(1)))
    spark.sessionState.functionRegistry.registerFunction(
      new FunctionIdentifier("hamming"),
      new ExpressionInfo(classOf[HammingDistance].getName, "hamming"),
      children => HammingDistance(children.head, children(1)))
  }
}
