package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode

/** Batch plan auditor for the optimization rounds: dumps
  * `explain("formatted")` for every declared batch query to one file per
  * query under PLANS_DIR (default plans/audit), plus a one-line summary per
  * query (Exchange count, join strategies, scan count) on stdout — the
  * measurement step of the optimization guide §1 applied to the whole
  * surface at once.
  *
  * Streaming queries are skipped: their `build` RUNS the full micro-batch
  * pipeline and returns the sink's files, so the "plan" would be a bare file
  * scan while the dump pays seconds of state-store work per query.
  */
object ExplainAll {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val outDir = sys.env.getOrElse("PLANS_DIR", "plans/audit")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    val names =
      if (args.nonEmpty) args.toSeq
      else SparkEntry.queries.keys.toSeq.sorted.filterNot(_.contains("stream"))
    names.foreach { n =>
      try {
        val df = SparkEntry.queries(n)(spark, sfDir)
        val txt = df.queryExecution.explainString(ExplainMode.fromString("formatted"))
        java.nio.file.Files.write(
          java.nio.file.Paths.get(outDir, s"$n.txt"), txt.getBytes("UTF-8"))
        def c(p: String) = p.r.findAllIn(txt).length
        println(f"$n%-35s exch=${c("Exchange")}%2d reuseExch=${c("ReusedExchange")}%2d " +
          f"smj=${c("SortMergeJoin")}%2d bhj=${c("BroadcastHashJoin")}%2d " +
          f"bnl=${c("BroadcastNestedLoop")}%2d cart=${c("CartesianProduct")}%2d " +
          f"scans=${c("Scan ")}%2d agg=${c("HashAggregate")}%2d subq=${c("Subquery")}%2d")
      } catch {
        case e: Throwable =>
          println(s"$n EXPLAIN-FAILED: ${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(120)}")
      }
    }
    spark.stop()
  }
}
