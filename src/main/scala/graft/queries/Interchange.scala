package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Source-format interchange: the engine reads more than its native
  * parquet. q98 exports an events projection as JSON-lines to scratch and
  * reads it back with an explicit schema (the production posture — schema
  * inference is a full extra pass at 100 TB and type-unstable); the
  * aggregate over the round-tripped data must equal the aggregate over the
  * original parquet, which is what the oracle (running on the ORIGINAL
  * table) checks. Doubles survive the text round-trip exactly: Spark
  * writes the shortest representation that parses back to the identical
  * bits.
  */
object Interchange {
  import Exact._

  /** One export per (JVM, format, sfDir). */
  private val exported = new java.util.concurrent.ConcurrentHashMap[String, String]()

  private def jsonlDir(s: SparkSession, dir: String): String =
    exported.computeIfAbsent(s"json:$dir", _ => {
      val out = graft.Scratch.dir("graft-jsonl-").resolve("events").toString
      Tables.events(s, dir)
        .select(col("event_id"), col("user_id"), col("event_type"), col("value"))
        .write.mode("overwrite").json(out)
      out
    })

  private def csvDir(s: SparkSession, dir: String): String =
    exported.computeIfAbsent(s"csv:$dir", _ => {
      val out = graft.Scratch.dir("graft-csv-").resolve("customer").toString
      Tables.customer(s, dir)
        .select(col("c_custkey"), col("c_name"), col("c_acctbal"), col("c_mktsegment"))
        .write.mode("overwrite").option("header", "true").csv(out)
      out
    })

  private val eventsSchema = StructType(Seq(
    StructField("event_id", LongType), StructField("user_id", LongType),
    StructField("event_type", StringType), StructField("value", DoubleType)))

  private val customerSchema = StructType(Seq(
    StructField("c_custkey", LongType), StructField("c_name", StringType),
    StructField("c_acctbal", DoubleType), StructField("c_mktsegment", StringType)))

  val all: Seq[(String, Q)] = Seq(

    // ---- JSON-lines source round-trip -----------------------------------------
    "q98_jsonl_roundtrip" -> Q(
      (s, dir) => {
        import s.implicits._
        s.read.schema(eventsSchema).json(jsonlDir(s, dir))
          .groupBy($"event_type")
          .agg(count(lit(1)).as("n"),
               countDistinct($"user_id").as("n_users"),
               sumExact($"value").as("sum_value"),
               min($"event_id").as("min_event"))
          .orderBy($"event_type")
      },
      s"""SELECT event_type, COUNT(*) AS n, COUNT(DISTINCT user_id) AS n_users,
         |  ${sqlSumExact("value")} AS sum_value, MIN(event_id) AS min_event
         |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin),

    // ---- CSV source round-trip ---------------------------------------------------
    // Same posture as q98 for the other ubiquitous text format: export a
    // customer projection as headered CSV, read it back with an explicit
    // schema (never inference — a full extra pass at 100 TB), and require
    // the aggregate over the round-trip to equal the aggregate over the
    // original parquet (the oracle runs on the ORIGINAL table). Doubles
    // survive because Spark writes shortest-round-trip representations;
    // quoting covers embedded delimiters.
    "q110_csv_roundtrip" -> Q(
      (s, dir) => {
        import s.implicits._
        s.read.schema(customerSchema).option("header", "true").csv(csvDir(s, dir))
          .groupBy($"c_mktsegment")
          .agg(count(lit(1)).as("n"),
               countDistinct($"c_custkey").as("n_keys"),
               sumExact($"c_acctbal").as("sum_bal"),
               min($"c_name").as("min_name"))
          .orderBy($"c_mktsegment")
      },
      s"""SELECT c_mktsegment, COUNT(*) AS n, COUNT(DISTINCT c_custkey) AS n_keys,
         |  ${sqlSumExact("c_acctbal")} AS sum_bal, MIN(c_name) AS min_name
         |FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin),

    // ---- Nested denormalization (order → array<struct> of its line items) --------
    // The document-oriented export shape: line items nest INSIDE their
    // order as an array of structs sorted by line number (what a JSON/
    // training-example emitter produces), then the nested form is consumed
    // with higher-order functions only — size, an aggregate() lambda over
    // quantities, the first element after sort. The oracle computes the
    // same figures from the FLAT join, proving the nesting lossless and
    // the nested consumption equal to relational aggregation. Scale shape:
    // collect_list shuffles once on l_orderkey and each array is bounded
    // by its own order's size (≤7 items) — never a corpus-wide collect;
    // quantities are integer-valued doubles, so the lambda sums exact
    // longs (no decimal typing inside the lambda needed).
    "q118_nested_export" -> Q(
      (s, dir) => {
        import s.implicits._
        val nested = Tables.lineitem(s, dir)
          .select($"l_orderkey", $"l_linenumber", $"l_quantity", $"l_extendedprice")
          .groupBy($"l_orderkey")
          .agg(array_sort(collect_list(struct($"l_linenumber", $"l_quantity", $"l_extendedprice"))).as("items"))
        Tables.orders(s, dir)
          .select($"o_orderkey", $"o_orderstatus")
          .join(nested, $"o_orderkey" === $"l_orderkey")
          .select($"o_orderkey", $"o_orderstatus",
            size($"items").cast("long").as("n_items"),
            expr("aggregate(items, 0L, (acc, x) -> acc + cast(x.l_quantity as long))").as("sum_qty"),
            $"items"(0)("l_linenumber").as("first_line"))
          .orderBy($"o_orderkey")
      },
      """SELECT o_orderkey, o_orderstatus, COUNT(*) AS n_items,
        |  CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
        |  CAST(min(l_linenumber) AS INTEGER) AS first_line
        |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        |GROUP BY 1, 2 ORDER BY o_orderkey""".stripMargin),
  )
}
