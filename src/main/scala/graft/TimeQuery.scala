package graft
import org.apache.spark.sql.SparkSession

/** Per-query timing harness: runs the named queries `reps` times each in one
  * session and prints every wall-clock sample — for separating real per-query
  * cost from run-to-run scatter (streaming queries especially carry 2-4 s of
  * fixed checkpoint/state machinery with high variance). Usage:
  *   tools/run.sh graft.TimeQuery q83_stream_stream_join [more...]
  * Env: SPARK_GRAFT_SF_DIR (default sf0.1), SPARK_GRAFT_CPUS (default 32),
  * SPARK_GRAFT_REPS (default 3).
  */
object TimeQuery {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "3").toInt
    val shuffle = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", cpus)
    require(args.nonEmpty, "pass query names")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", shuffle)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (name <- args; i <- 1 to reps) {
      val t0 = System.nanoTime()
      val n = SparkEntry.queries(name)(spark, sfDir).count()
      println(f"$name run $i: ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
    }
    spark.stop()
  }
}
