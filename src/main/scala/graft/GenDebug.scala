package graft
import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
object GenDebug {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions","4")
      .config("spark.sql.session.timeZone","UTC")
      .config("spark.ui.enabled","false").config("spark.sql.extensions","graft.GraftExtensions").config("spark.sql.warehouse.dir", java.nio.file.Files.createTempDirectory("gwh-").toString).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val schema = StructType(Seq(
      StructField("id", IntegerType, false),
      StructField("ts", TimestampType, false),
      StructField("v", IntegerType, false)))
    def ts(d: Int, h: Int) = java.sql.Timestamp.valueOf(f"2024-03-$d%02d $h%02d:00:00")
    import scala.jdk.CollectionConverters._
    val df = spark.createDataFrame(Seq(
      Row(1, ts(1,5), 10), Row(2, ts(1,18), 20), Row(3, ts(2,9), 30), Row(4, ts(3,9), 40)).asJava, schema)
    val t = graft.table.GraftTable.create(spark, java.nio.file.Files.createTempDirectory("gdbg-").toString,
      df, partitionBy = Seq("day"), generated = Map("day" -> "cast(date_trunc('DAY', ts) as date)"))
    t.snapshot.files.foreach(f => println(s"${f.path} min=${f.minValues} max=${f.maxValues} pv=${f.partitionValues}"))
    val pruned = t.prunedFiles(t.snapshot, col("ts") < lit(ts(2,0)))
    println(s"pruned=${pruned.size} of ${t.snapshot.files.size}")
    spark.stop()
  }
}
