package graft

import org.apache.spark.sql.SparkSession

/** Cross-process concurrency probe: a standalone JVM that appends
  * `nAppends` one-row commits to an existing GraftTable. Each row is
  * (writer_id, seq), so a lost commit is directly observable as a missing
  * (writer, seq) pair. Launched by ConcurrencySpec in a SECOND JVM (via
  * tools/run.sh) racing the in-process writer — exercising the CREATE_NEW
  * commit protocol across OS processes, not just threads.
  *
  * Usage: tools/run.sh graft.RaceWriter <tablePath> <writerId> <nAppends>
  */
object RaceWriter {
  def main(args: Array[String]): Unit = {
    val Array(tablePath, writerId, n) = args
    val spark = SparkSession.builder()
      .master("local[2]")
      .config("spark.sql.shuffle.partitions", 2)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val t = graft.table.GraftTable.forPath(spark, tablePath)
    (1 to n.toInt).foreach { i =>
      t.append(Seq((writerId, i)).toDF("writer", "seq"))
    }
    spark.stop()
  }
}
