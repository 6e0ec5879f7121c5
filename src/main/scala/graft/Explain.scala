package graft
import org.apache.spark.sql.SparkSession

/** Plan auditor: prints `explain("formatted")` for the named queries (or a
  * default audit set) — used to keep physical plans honest: filters pushed
  * into scans, small dims broadcast, top-k as TakeOrderedAndProject, wide
  * whole-stage-codegen spans.
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val names = if (args.nonEmpty) args.toSeq
      else Seq("q01_pricing_summary", "q02_filter_project", "q03_top_revenue_orders",
               "q04_region_rollup", "q10_topk", "q45_embedding_neardup")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      println(s"\n========== $n ==========")
      SparkEntry.queries(n)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
