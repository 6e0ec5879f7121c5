package graft.queries

import graft.Tables
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Relational operator inventory (SURVEY.md §2-C): scans, projection,
  * filters, equi/broadcast/semi/anti joins, hash aggregation, distinct
  * aggregation, window functions, sort/limit/top-k, set ops, string / date /
  * math / conditional / JSON scalar functions.
  *
  * All plans are declarative DataFrame API — Catalyst supplies pushdown,
  * pruning, join selection (broadcast for the small dims), partial+final
  * aggregation and whole-stage codegen. Every query ends in a total ORDER BY
  * so the oracle hash-compare is deterministic.
  *
  * Reference grounding: the reference itself performs only a max-aggregation
  * over history (api.py:75) and the joins/filters implicit in Delta
  * MERGE/DELETE (api.py:92-107); this module is the §2-C extension surface
  * mandated by BASELINE.json's north star, sized for the driver testdata.
  */
/** Typed rows for q87 (top-level so Spark derives stable Encoders). */
final case class CustomerSlim(c_custkey: Long, c_nationkey: Int, c_acctbal: Double)
final case class TopAccount(nation: Int, rank: Long, custkey: Long, acctbal: Double)

object Relational {
  import Exact._

  val all: Seq[(String, Q)] = Seq(

    // ---- Flagship: TPC-H Q1-style pricing summary --------------------------
    // Scan → filter (pushed to parquet) → 2-phase hash agg on 6 tiny groups →
    // sort. At 100 TB: map-side partial agg reduces the shuffle to
    // #groups × #tasks rows; no skew possible with 6 groups.
    "q01_pricing_summary" -> Q(
      (s, dir) => {
        import s.implicits._
        Tables.lineitem(s, dir)
          .filter($"l_shipdate" <= lit("2000-01-01").cast("timestamp"))
          .groupBy($"l_returnflag", $"l_linestatus")
          .agg(
            sumExact($"l_quantity").as("sum_qty"),
            sumExact($"l_extendedprice").as("sum_base_price"),
            sum(discPrice($"l_extendedprice", $"l_discount")).cast("double").as("sum_disc_price"),
            avgExact($"l_quantity").as("avg_qty"),
            avgExact($"l_extendedprice").as("avg_price"),
            avgExact($"l_discount").as("avg_disc"),
            count(lit(1)).as("count_order"))
          .orderBy($"l_returnflag", $"l_linestatus")
      },
      s"""SELECT l_returnflag, l_linestatus,
         |  ${sqlSumExact("l_quantity")} AS sum_qty,
         |  ${sqlSumExact("l_extendedprice")} AS sum_base_price,
         |  CAST(SUM(${sqlDiscPrice("l_extendedprice", "l_discount")}) AS DOUBLE) AS sum_disc_price,
         |  ${sqlAvgExact("l_quantity")} AS avg_qty,
         |  ${sqlAvgExact("l_extendedprice")} AS avg_price,
         |  ${sqlAvgExact("l_discount")} AS avg_disc,
         |  COUNT(*) AS count_order
         |FROM lineitem
         |WHERE l_shipdate <= TIMESTAMP '2000-01-01'
         |GROUP BY l_returnflag, l_linestatus
         |ORDER BY l_returnflag, l_linestatus""".stripMargin),

    // ---- Projection + selective filter (pushdown showcase) -----------------
    // Row-level double arithmetic is IEEE-identical across engines, so the
    // per-row revenue needs no decimal detour.
    "q02_filter_project" -> Q(
      (s, dir) => {
        import s.implicits._
        Tables.lineitem(s, dir)
          .filter($"l_shipdate" >= lit("1996-01-01").cast("timestamp") &&
                  $"l_shipdate" <  lit("1997-01-01").cast("timestamp") &&
                  $"l_discount".between(0.02, 0.08) && $"l_quantity" < 25)
          .select($"l_orderkey", $"l_linenumber", $"l_extendedprice", $"l_discount",
                  ($"l_extendedprice" * (lit(1.0) - $"l_discount")).as("revenue"))
          .orderBy($"l_orderkey", $"l_linenumber")
      },
      """SELECT l_orderkey, l_linenumber, l_extendedprice, l_discount,
        |  l_extendedprice * (1.0 - l_discount) AS revenue
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
        |  AND l_discount BETWEEN 0.02 AND 0.08 AND l_quantity < 25
        |ORDER BY l_orderkey, l_linenumber""".stripMargin),

    // ---- 3-way join + agg + top-k (TPC-H Q3 shape) --------------------------
    // customer (small) is broadcast; orders⋈lineitem is the one real shuffle
    // join on the fact keys. Top-k plans as TakeOrderedAndProject — no global
    // sort of the aggregate at any scale.
    "q03_top_revenue_orders" -> Q(
      (s, dir) => {
        import s.implicits._
        val c = Tables.customer(s, dir).filter($"c_mktsegment" === "BUILDING")
        val o = Tables.orders(s, dir)
        val l = Tables.lineitem(s, dir)
        l.join(o, $"l_orderkey" === $"o_orderkey")
          .join(broadcast(c), $"o_custkey" === $"c_custkey")
          .groupBy($"o_orderkey", date_format($"o_orderdate", "yyyy-MM-dd").as("orderdate"))
          .agg(sum(discPrice($"l_extendedprice", $"l_discount")).cast("double").as("revenue"))
          .orderBy($"revenue".desc, $"o_orderkey")
          .limit(10)
      },
      s"""SELECT o_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
         |  CAST(SUM(${sqlDiscPrice("l_extendedprice", "l_discount")}) AS DOUBLE) AS revenue
         |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |WHERE c_mktsegment = 'BUILDING'
         |GROUP BY o_orderkey, orderdate
         |ORDER BY revenue DESC, o_orderkey
         |LIMIT 10""".stripMargin),

    // ---- Star-schema rollup over broadcast dimension chain -----------------
    // nation and region are tiny at every scale factor — explicit broadcast
    // keeps the whole dim chain shuffle-free; only the customer agg shuffles.
    "q04_region_rollup" -> Q(
      (s, dir) => {
        import s.implicits._
        Tables.customer(s, dir)
          .join(broadcast(Tables.nation(s, dir)), $"c_nationkey" === $"n_nationkey")
          .join(broadcast(Tables.region(s, dir)), $"n_regionkey" === $"r_regionkey")
          .groupBy($"r_name")
          .agg(count(lit(1)).as("n_customers"),
               sumExact($"c_acctbal").as("sum_acctbal"),
               avgExact($"c_acctbal").as("avg_acctbal"))
          .orderBy($"r_name")
      },
      s"""SELECT r_name, COUNT(*) AS n_customers,
         |  ${sqlSumExact("c_acctbal")} AS sum_acctbal,
         |  ${sqlAvgExact("c_acctbal")} AS avg_acctbal
         |FROM customer JOIN nation ON c_nationkey = n_nationkey
         |JOIN region ON n_regionkey = r_regionkey
         |GROUP BY r_name ORDER BY r_name""".stripMargin),

    // ---- Left-semi join (EXISTS) --------------------------------------------
    "q05_semi_join" -> Q(
      (s, dir) => {
        import s.implicits._
        val deep = Tables.lineitem(s, dir).filter($"l_discount" >= 0.09)
        val o = Tables.orders(s, dir)
        o.join(deep, o("o_orderkey") === deep("l_orderkey"), "left_semi")
          .select($"o_orderkey", $"o_orderstatus", $"o_totalprice")
          .orderBy($"o_orderkey")
      },
      """SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
        |WHERE EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_orderkey = o_orderkey AND l_discount >= 0.09)
        |ORDER BY o_orderkey""".stripMargin),

    // ---- Left-anti join (NOT EXISTS) ----------------------------------------
    "q06_anti_join" -> Q(
      (s, dir) => {
        import s.implicits._
        val o = Tables.orders(s, dir)
        val c = Tables.customer(s, dir)
        c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
          .select($"c_custkey", $"c_name", $"c_mktsegment")
          .orderBy($"c_custkey")
      },
      """SELECT c_custkey, c_name, c_mktsegment FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |ORDER BY c_custkey""".stripMargin),

    // ---- Distinct aggregation ------------------------------------------------
    // COUNT(DISTINCT) expands to a two-stage agg in Spark; exact here, with
    // approx_count_distinct exercised in q07b (no oracle — HLL is
    // implementation-defined).
    "q07_distinct_agg" -> Q(
      (s, dir) => {
        import s.implicits._
        Tables.orders(s, dir)
          .groupBy($"o_orderstatus")
          .agg(count(lit(1)).as("n_orders"),
               countDistinct($"o_custkey").as("n_customers"),
               countDistinct($"o_orderpriority").as("n_priorities"),
               sumExact($"o_totalprice").as("sum_price"))
          .orderBy($"o_orderstatus")
      },
      s"""SELECT o_orderstatus, COUNT(*) AS n_orders,
         |  COUNT(DISTINCT o_custkey) AS n_customers,
         |  COUNT(DISTINCT o_orderpriority) AS n_priorities,
         |  ${sqlSumExact("o_totalprice")} AS sum_price
         |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin),

    // approx_count_distinct: HLL++ sketch — deterministic within Spark but not
    // oracle-comparable to DuckDB's approx. Rows-only check + scalatest bound.
    "q07b_approx_distinct" -> Q(
      (s, dir) => {
        import s.implicits._
        Tables.lineitem(s, dir)
          .groupBy($"l_returnflag")
          .agg(approx_count_distinct($"l_partkey").as("approx_parts"),
               countDistinct($"l_partkey").as("exact_parts"))
          .orderBy($"l_returnflag")
      },
      None),

    // ---- Window: ranking (top-2 orders per customer) -------------------------
    "q08_window_rank" -> Q(
      (s, dir) => {
        import s.implicits._
        val w = Window.partitionBy($"o_custkey").orderBy($"o_totalprice".desc, $"o_orderkey")
        Tables.orders(s, dir)
          .withColumn("rn", row_number().over(w))
          .filter($"rn" <= 2)
          .select($"o_custkey", $"rn", $"o_orderkey", $"o_totalprice")
          .orderBy($"o_custkey", $"rn")
      },
      """SELECT o_custkey, rn, o_orderkey, o_totalprice FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    ROW_NUMBER() OVER (PARTITION BY o_custkey
        |                       ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |  FROM orders) WHERE rn <= 2
        |ORDER BY o_custkey, rn""".stripMargin),

    // ---- Window: running aggregate + lag -------------------------------------
    // Explicit ROWS frame; decimal accumulation keeps the running sum exact.
    // The synthetic lineitem REUSES (l_orderkey, l_linenumber) pairs
    // (~118k duplicates at sf0.1), so the window order includes every
    // value column: any remaining ties are full-duplicate rows, for which
    // lag/running assignments are order-invariant as a multiset.
    "q09_window_running" -> Q(
      (s, dir) => {
        import s.implicits._
        val ord = Window.partitionBy($"l_suppkey")
          .orderBy($"l_shipdate", $"l_orderkey", $"l_linenumber",
                   $"l_quantity", $"l_extendedprice", $"l_discount")
        val frame = ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        Tables.lineitem(s, dir)
          .withColumn("running_qty", sum(dec($"l_quantity")).over(frame).cast("double"))
          .withColumn("prev_qty", lag($"l_quantity", 1).over(ord))
          .select($"l_suppkey", $"l_orderkey", $"l_linenumber", $"l_quantity",
                  $"running_qty", $"prev_qty")
          .orderBy($"l_suppkey", $"l_orderkey", $"l_linenumber", $"running_qty")
      },
      """SELECT l_suppkey, l_orderkey, l_linenumber, l_quantity,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) OVER (
        |    PARTITION BY l_suppkey ORDER BY l_shipdate, l_orderkey, l_linenumber,
        |                                    l_quantity, l_extendedprice, l_discount
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_qty,
        |  LAG(l_quantity, 1) OVER (
        |    PARTITION BY l_suppkey ORDER BY l_shipdate, l_orderkey, l_linenumber,
        |                                    l_quantity, l_extendedprice, l_discount) AS prev_qty
        |FROM lineitem
        |ORDER BY l_suppkey, l_orderkey, l_linenumber, running_qty""".stripMargin),

    // ---- Sort / limit / top-k -------------------------------------------------
    // orderBy+limit plans as TakeOrderedAndProject: per-partition heap top-k,
    // then a k-row merge on the driver — O(k) memory at any data size.
    "q10_topk" -> Q(
      (s, dir) => {
        import s.implicits._
        Tables.lineitem(s, dir)
          .select($"l_orderkey", $"l_linenumber", $"l_extendedprice", $"l_quantity")
          // l_quantity in the sort: (orderkey, linenumber) pairs repeat in
          // the synthetic data, so the boundary row must be totally ordered
          // over every OUTPUT column or the k-th pick is engine-dependent
          .orderBy($"l_extendedprice".desc, $"l_orderkey", $"l_linenumber", $"l_quantity")
          .limit(15)
      },
      """SELECT l_orderkey, l_linenumber, l_extendedprice, l_quantity
        |FROM lineitem
        |ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber, l_quantity
        |LIMIT 15""".stripMargin),

    // ---- Set operations: UNION ALL / INTERSECT / EXCEPT ------------------------
    "q11_set_ops" -> Q(
      (s, dir) => {
        import s.implicits._
        val o = Tables.orders(s, dir)
        def custsIn(y: Int) =
          o.filter(year($"o_orderdate") === y).select($"o_custkey").distinct()
        val both   = custsIn(1996).intersect(custsIn(1997)).withColumn("tag", lit("both"))
        val only96 = custsIn(1996).except(custsIn(1997)).withColumn("tag", lit("only96"))
        both.unionAll(only96)
          .select($"tag", $"o_custkey")
          .orderBy($"tag", $"o_custkey")
      },
      """WITH y96 AS (SELECT DISTINCT o_custkey FROM orders WHERE year(o_orderdate) = 1996),
        |     y97 AS (SELECT DISTINCT o_custkey FROM orders WHERE year(o_orderdate) = 1997)
        |SELECT 'both' AS tag, o_custkey FROM (SELECT * FROM y96 INTERSECT SELECT * FROM y97)
        |UNION ALL
        |SELECT 'only96' AS tag, o_custkey FROM (SELECT * FROM y96 EXCEPT SELECT * FROM y97)
        |ORDER BY tag, o_custkey""".stripMargin),

    // ---- Multiset set ops: INTERSECT ALL / EXCEPT ALL ------------------------------
    // Bag semantics (multiplicities preserved): a customer with 3 orders in
    // 1996 and 1 in 1997 keeps 2 rows under EXCEPT ALL — the semantics
    // dedup-by-subtraction pipelines need. Same shuffle shape as the
    // distinct variants (hash on the compared columns).
    "q11b_set_ops_all" -> Q(
      (s, dir) => {
        import s.implicits._
        val o = Tables.orders(s, dir)
        def custs(y: Int) =
          o.filter(year($"o_orderdate") === y).select($"o_custkey")
        val both   = custs(1996).intersectAll(custs(1997)).withColumn("tag", lit("both"))
        val only96 = custs(1996).exceptAll(custs(1997)).withColumn("tag", lit("only96"))
        both.unionAll(only96)
          .select($"tag", $"o_custkey")
          .orderBy($"tag", $"o_custkey")
      },
      """WITH y96 AS (SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1996),
        |     y97 AS (SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1997)
        |SELECT 'both' AS tag, o_custkey FROM (SELECT * FROM y96 INTERSECT ALL SELECT * FROM y97)
        |UNION ALL
        |SELECT 'only96' AS tag, o_custkey FROM (SELECT * FROM y96 EXCEPT ALL SELECT * FROM y97)
        |ORDER BY tag, o_custkey""".stripMargin),

    // ---- String functions -------------------------------------------------------
    "q12_string_funcs" -> Q(
      (s, dir) => {
        import s.implicits._
        Tables.part(s, dir)
          .select(
            $"p_partkey",
            upper($"p_name").as("name_upper"),
            length($"p_name").as("name_len"),
            substring($"p_name", 1, 5).as("name_pfx"),
            concat($"p_brand", lit(":"), $"p_type").as("brand_type"),
            regexp_replace($"p_name", " ", "_").as("name_snake"),
            element_at(split($"p_type", " "), 1).as("type_head"))
          .filter($"p_name".contains("a") || $"p_name".startsWith("b"))
          .orderBy($"p_partkey")
      },
      """SELECT p_partkey,
        |  upper(p_name) AS name_upper,
        |  length(p_name) AS name_len,
        |  substring(p_name, 1, 5) AS name_pfx,
        |  p_brand || ':' || p_type AS brand_type,
        |  replace(p_name, ' ', '_') AS name_snake,
        |  split_part(p_type, ' ', 1) AS type_head
        |FROM part
        |WHERE contains(p_name, 'a') OR starts_with(p_name, 'b')
        |ORDER BY p_partkey""".stripMargin),

    // ---- Date/time functions -----------------------------------------------------
    "q13_date_funcs" -> Q(
      (s, dir) => {
        import s.implicits._
        Tables.orders(s, dir)
          .groupBy(year($"o_orderdate").as("y"),
                   month($"o_orderdate").as("m"),
                   date_format(date_trunc("month", $"o_orderdate"), "yyyy-MM-dd").as("month_start"))
          .agg(count(lit(1)).as("n_orders"),
               sumExact($"o_totalprice").as("sum_price"),
               countDistinct(dayofmonth($"o_orderdate")).as("active_days"))
          .orderBy($"y", $"m")
      },
      s"""SELECT year(o_orderdate) AS y, month(o_orderdate) AS m,
         |  strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month_start,
         |  COUNT(*) AS n_orders,
         |  ${sqlSumExact("o_totalprice")} AS sum_price,
         |  COUNT(DISTINCT day(o_orderdate)) AS active_days
         |FROM orders GROUP BY 1, 2, 3 ORDER BY y, m""".stripMargin),

    // ---- Math functions (IEEE-exact subset: ceil/floor/abs/sqrt/mod) --------------
    "q14_math_funcs" -> Q(
      (s, dir) => {
        import s.implicits._
        Tables.lineitem(s, dir)
          .filter($"l_linenumber" === 1)
          .select(
            $"l_orderkey",
            ceil($"l_extendedprice").as("price_ceil"),
            floor($"l_extendedprice").as("price_floor"),
            abs($"l_discount" - 0.05).as("disc_dev"),
            sqrt($"l_quantity").as("qty_sqrt"),
            ($"l_quantity" * $"l_quantity").as("qty_sq"),
            ($"l_orderkey" % 7).as("key_mod7"))
          .orderBy($"l_orderkey")
      },
      """SELECT l_orderkey,
        |  CAST(ceil(l_extendedprice) AS BIGINT) AS price_ceil,
        |  CAST(floor(l_extendedprice) AS BIGINT) AS price_floor,
        |  abs(l_discount - 0.05) AS disc_dev,
        |  sqrt(l_quantity) AS qty_sqrt,
        |  l_quantity * l_quantity AS qty_sq,
        |  l_orderkey % 7 AS key_mod7
        |FROM lineitem WHERE l_linenumber = 1
        |ORDER BY l_orderkey""".stripMargin),

    // ---- Conditional / null handling ------------------------------------------------
    "q15_case_null" -> Q(
      (s, dir) => {
        import s.implicits._
        Tables.supplier(s, dir)
          .withColumn("bal_bucket",
            when($"s_acctbal" < 0, "negative")
              .when($"s_acctbal" < 5000, "mid")
              .otherwise("high"))
          .withColumn("nk_or_default", coalesce(nullif($"s_nationkey", lit(0)), lit(-1)))
          .groupBy($"bal_bucket")
          .agg(count(lit(1)).as("n"),
               sumExact($"s_acctbal").as("sum_bal"),
               min($"nk_or_default").as("min_nk"))
          .orderBy($"bal_bucket")
      },
      s"""SELECT CASE WHEN s_acctbal < 0 THEN 'negative'
         |            WHEN s_acctbal < 5000 THEN 'mid'
         |            ELSE 'high' END AS bal_bucket,
         |  COUNT(*) AS n,
         |  ${sqlSumExact("s_acctbal")} AS sum_bal,
         |  MIN(coalesce(nullif(s_nationkey, 0), -1)) AS min_nk
         |FROM supplier GROUP BY 1 ORDER BY bal_bucket""".stripMargin),

    // ---- ROLLUP (grouping sets) -----------------------------------------------
    // Hierarchical totals in one pass: (year, status), (year), (). Spark
    // plans a single Expand + hash agg — no re-scan per level; grouping_id
    // disambiguates subtotal rows from genuine NULL groups.
    "q16_rollup" -> Q(
      (s, dir) => {
        import s.implicits._
        Tables.orders(s, dir)
          .rollup(year($"o_orderdate").as("y"), $"o_orderstatus")
          .agg(count(lit(1)).as("n_orders"),
               sumExact($"o_totalprice").as("sum_price"),
               grouping_id().as("gid"))
          .orderBy($"gid", $"y", $"o_orderstatus")
      },
      s"""SELECT year(o_orderdate) AS y, o_orderstatus,
         |  COUNT(*) AS n_orders,
         |  ${sqlSumExact("o_totalprice")} AS sum_price,
         |  GROUPING(year(o_orderdate), o_orderstatus) AS gid
         |FROM orders
         |GROUP BY ROLLUP (year(o_orderdate), o_orderstatus)
         |ORDER BY gid, y, o_orderstatus""".stripMargin),

    // ---- CUBE (all grouping-set combinations) -----------------------------------
    // Same single-pass Expand + hash agg as rollup, but over all 4 subsets of
    // the grouping keys: (year, status), (year), (status), (). grouping_id
    // separates subtotal rows from genuine NULL groups.
    "q18_cube" -> Q(
      (s, dir) => {
        import s.implicits._
        Tables.orders(s, dir)
          .cube(year($"o_orderdate").as("y"), $"o_orderstatus")
          .agg(count(lit(1)).as("n_orders"),
               sumExact($"o_totalprice").as("sum_price"),
               grouping_id().as("gid"))
          .orderBy($"gid", $"y", $"o_orderstatus")
      },
      s"""SELECT year(o_orderdate) AS y, o_orderstatus,
         |  COUNT(*) AS n_orders,
         |  ${sqlSumExact("o_totalprice")} AS sum_price,
         |  GROUPING(year(o_orderdate), o_orderstatus) AS gid
         |FROM orders
         |GROUP BY CUBE (year(o_orderdate), o_orderstatus)
         |ORDER BY gid, y, o_orderstatus""".stripMargin),

    // ---- Correlated scalar + IN subqueries (SQL front door) ---------------------
    // Catalyst decorrelates both subqueries into joins (no per-row
    // re-execution); the same text runs in DuckDB. Exact decimal MAX keeps
    // the equality comparison engine-portable.
    "q17_subqueries" -> Q(
      (s, dir) => {
        Tables.orders(s, dir).createOrReplaceTempView("orders_v")
        Tables.customer(s, dir).createOrReplaceTempView("customer_v")
        s.sql("""
          SELECT o_orderkey, o_custkey
          FROM orders_v o
          WHERE CAST(o_totalprice AS DECIMAL(18,2)) =
                (SELECT MAX(CAST(i.o_totalprice AS DECIMAL(18,2)))
                 FROM orders_v i WHERE i.o_custkey = o.o_custkey)
            AND o_custkey IN (SELECT c_custkey FROM customer_v
                              WHERE c_mktsegment = 'BUILDING')
          ORDER BY o_orderkey""")
      },
      """SELECT o_orderkey, o_custkey
        |FROM orders o
        |WHERE CAST(o_totalprice AS DECIMAL(18,2)) =
        |      (SELECT MAX(CAST(i.o_totalprice AS DECIMAL(18,2)))
        |       FROM orders i WHERE i.o_custkey = o.o_custkey)
        |  AND o_custkey IN (SELECT c_custkey FROM customer
        |                    WHERE c_mktsegment = 'BUILDING')
        |ORDER BY o_orderkey""".stripMargin),

    // ---- Custom typed Aggregator (UDAF surface): exact var_pop -------------------
    "q19_custom_agg_variance" -> Q(
      (s, dir) => {
        import s.implicits._
        import graft.functions.ExactStats
        Tables.lineitem(s, dir)
          .groupBy($"l_returnflag")
          .agg(ExactStats.varPop2dp($"l_quantity").as("var_qty"),
               sqrt(ExactStats.varPop2dp($"l_quantity")).as("stddev_qty"),
               count(lit(1)).as("n"))
          .orderBy($"l_returnflag")
      },
      s"""SELECT l_returnflag,
         |  ${graft.functions.ExactStats.sqlVarPop2dp("l_quantity")} AS var_qty,
         |  sqrt(${graft.functions.ExactStats.sqlVarPop2dp("l_quantity")}) AS stddev_qty,
         |  COUNT(*) AS n
         |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin),

    // ---- Salted skew join == plain join (cross-engine) ---------------------------
    // The salting transform must be semantically invisible; the oracle is
    // the PLAIN join in DuckDB, so any salting bug (lost/duplicated rows)
    // fails the hash compare.
    "q27_salted_join" -> Q(
      (s, dir) => {
        import s.implicits._
        val l = Tables.lineitem(s, dir)
          .select($"l_orderkey", $"l_linenumber", $"l_quantity")
        val o = Tables.orders(s, dir)
          .filter($"o_orderpriority" === "1-URGENT")
          .select($"o_orderkey".as("l_orderkey"), $"o_orderstatus")
        graft.operators.SkewJoin.saltedInnerJoin(l, o, "l_orderkey", saltFactor = 8)
          .groupBy($"o_orderstatus")
          .agg(count(lit(1)).as("n"), sumExact($"l_quantity").as("sum_qty"))
          .orderBy($"o_orderstatus")
      },
      s"""SELECT o_orderstatus, COUNT(*) AS n, ${sqlSumExact("l_quantity")} AS sum_qty
         |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         |WHERE o_orderpriority = '1-URGENT'
         |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin),

    // ---- Percentiles (exact, sort-based) + string distance -----------------------
    // percentile() sorts within each group; l_quantity is integer-valued so
    // linear interpolation lands on exact .0/.5 doubles in both engines.
    "q28_percentiles" -> Q(
      (s, dir) => {
        import s.implicits._
        Tables.lineitem(s, dir)
          .groupBy($"l_returnflag")
          .agg(expr("percentile(l_quantity, 0.5)").as("med_qty"),
               expr("percentile(l_quantity, 0.9)").as("p90_qty"),
               min($"l_quantity").as("min_qty"),
               max($"l_quantity").as("max_qty"))
          .orderBy($"l_returnflag")
      },
      """SELECT l_returnflag,
        |  quantile_cont(l_quantity, 0.5) AS med_qty,
        |  quantile_cont(l_quantity, 0.9) AS p90_qty,
        |  MIN(l_quantity) AS min_qty, MAX(l_quantity) AS max_qty
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin),

    // ---- Edit distance (fuzzy matching primitive) ---------------------------------
    "q29_edit_distance" -> Q(
      (s, dir) => {
        import s.implicits._
        Tables.nation(s, dir)
          .crossJoin(Tables.region(s, dir))
          .select($"n_name", $"r_name", levenshtein($"n_name", $"r_name").as("lev"))
          .filter($"lev" <= 8)
          .orderBy($"n_name", $"r_name")
      },
      """SELECT n_name, r_name, levenshtein(n_name, r_name) AS lev
        |FROM nation CROSS JOIN region
        |WHERE levenshtein(n_name, r_name) <= 8
        |ORDER BY n_name, r_name""".stripMargin),

    // ---- Range join (pure inequality predicate) via bin-bucketed equi join --------
    // "Orders in flight at each month start": interval per order =
    // [o_orderdate, max(l_shipdate)] (its fulfillment span), probes = the
    // distinct order months; the join predicate is BETWEEN only — no equi
    // key, the relational shape Spark has no native operator for. Scale
    // shape: both sides map to 365-day bins — an interval explodes to every
    // bin it overlaps (span/365 + 1 rows, bounded), a probe to exactly one,
    // so each qualifying pair meets in precisely one bin (no dedup) — and
    // the join becomes an EQUI join on a fixed-width int key with the exact
    // BETWEEN as a residual filter. No BroadcastNestedLoop / cartesian: with
    // both sides large this is one hash shuffle, the plan that survives
    // 100 TB. The oracle is the plain inequality join in DuckDB, so the
    // binning rewrite is verified to lose/duplicate nothing (same policy as
    // q27's salting).
    "q47_range_join" -> Q(
      (s, dir) => {
        import s.implicits._
        // Round 17 (guide §2.3 — shuffle/join fewer rows): 365-day bins
        // against month-grain probes fanned every interval out to ~12
        // probe months per bin before the residual BETWEEN filter; 32-day
        // bins keep the equi-join fan-out at ~1 probe per bin for the same
        // lossless rewrite (an interval still explodes every bin it
        // touches, a probe month still lands in exactly one bin), cutting
        // the joined row count ~5× with identical survivors.
        val binDays = 32
        val day0 = to_date(lit("1970-01-01"))
        val iv = Tables.orders(s, dir)
          .join(Tables.lineitem(s, dir).groupBy($"l_orderkey").agg(max($"l_shipdate").as("iv_end")),
            $"o_orderkey" === $"l_orderkey")
          .select($"o_totalprice", $"o_orderdate".as("iv_start"), $"iv_end")
          .withColumn("bin", explode(sequence(
            floor(datediff(to_date($"iv_start"), day0) / binDays),
            floor(datediff(to_date($"iv_end"), day0) / binDays))))
        val probes = Tables.orders(s, dir)
          .select(date_trunc("month", $"o_orderdate").as("m")).distinct()
          .withColumn("bin", floor(datediff(to_date($"m"), day0) / binDays))
        iv.join(probes, "bin")
          .filter($"m" >= $"iv_start" && $"m" <= $"iv_end")
          .groupBy($"m")
          .agg(count(lit(1)).as("n_open"), sumExact($"o_totalprice").as("open_value"))
          .select(date_format($"m", "yyyy-MM-dd").as("month_start"), $"n_open", $"open_value")
          .orderBy($"month_start")
      },
      s"""WITH iv AS (
         |  SELECT o.o_totalprice, o.o_orderdate AS iv_start, mx.iv_end
         |  FROM orders o JOIN (SELECT l_orderkey, max(l_shipdate) AS iv_end
         |                      FROM lineitem GROUP BY 1) mx
         |    ON o.o_orderkey = mx.l_orderkey),
         |probes AS (SELECT DISTINCT date_trunc('month', o_orderdate) AS m FROM orders)
         |SELECT strftime(m, '%Y-%m-%d') AS month_start, COUNT(*) AS n_open,
         |  ${sqlSumExact("o_totalprice")} AS open_value
         |FROM probes JOIN iv ON m >= iv_start AND m <= iv_end
         |GROUP BY m ORDER BY month_start""".stripMargin),

    // ---- Ranking window surface: ntile / percent_rank / cume_dist -----------------
    // Completes the window-function inventory beyond q08/q09 (rank, lag,
    // running sums). The ORDER BY is total (acctbal, custkey) — ntile
    // assigns by row position, so any tie left to the engine would produce
    // cross-engine divergence (same discipline as q09/q10, see README).
    "q55_window_ranks" -> Q(
      (s, dir) => {
        import s.implicits._
        val w = Window.partitionBy($"c_nationkey").orderBy($"c_acctbal", $"c_custkey")
        Tables.customer(s, dir)
          .select($"c_custkey", $"c_nationkey",
            ntile(4).over(w).cast("long").as("wealth_quartile"),
            percent_rank().over(w).as("pr"),
            cume_dist().over(w).as("cd"),
            first_value($"c_custkey").over(w).as("poorest_key"))
          .orderBy($"c_custkey")
      },
      """SELECT c_custkey, c_nationkey,
        |  ntile(4) OVER w AS wealth_quartile,
        |  percent_rank() OVER w AS pr,
        |  cume_dist() OVER w AS cd,
        |  first_value(c_custkey) OVER w AS poorest_key
        |FROM customer
        |WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal, c_custkey)
        |ORDER BY c_custkey""".stripMargin),

    // ---- Mergeable distinct-count sketches (HLL partial + union rollup) -----------
    // The 100-TB pre-aggregation pattern approx_count_distinct (q07b) can't
    // express: per-nation Datasketches HLL partials materialized once, then
    // ROLLED UP to region level by sketch union — re-aggregation without
    // touching the raw data again (a cube of exact count-distincts can't be
    // rolled up; sketches can). Deterministic for fixed input+lgK, but the
    // sketch internals have no DuckDB twin → rows-only driver check +
    // SketchRollupSpec (union estimate within 2% of exact, and equal to
    // the unpartitioned sketch of the same data).
    "q58_hll_rollup" -> Q(
      (s, dir) => {
        import s.implicits._
        val partials = Tables.customer(s, dir)
          .groupBy($"c_nationkey")
          .agg(expr("hll_sketch_agg(c_custkey, 12)").as("sk"))
        partials
          .join(broadcast(Tables.nation(s, dir)), $"c_nationkey" === $"n_nationkey")
          .groupBy($"n_regionkey")
          .agg(expr("hll_sketch_estimate(hll_union_agg(sk))").cast("long").as("est_customers"))
          .join(broadcast(Tables.region(s, dir)), $"n_regionkey" === $"r_regionkey")
          .select($"r_name", $"est_customers")
          .orderBy($"r_name")
      },
      None),

    // ---- Typed Dataset path: case-class Encoder + groupByKey.flatMapGroups --------
    // The Dataset[T] API surface: rows decode into a case class, group
    // logic runs as plain Scala per key (here: top-2 accounts per nation
    // under a TOTAL order — ties on acctbal break by custkey, the q09/q10
    // determinism discipline). flatMapGroups is the Scala analogue of
    // applyInPandas grouped-map: one shuffle on the key, arbitrary typed
    // logic per group, no state on the driver. Costs one
    // serialize/deserialize boundary vs the window-function form (its
    // oracle) — the price of typed logic; use it when the per-group code
    // can't be expressed in columns.
    "q87_typed_topk" -> Q(
      (s, dir) => {
        import s.implicits._
        val ds = Tables.customer(s, dir)
          .select($"c_custkey", $"c_nationkey", $"c_acctbal")
          .as[CustomerSlim]
        ds.groupByKey(_.c_nationkey)
          .flatMapGroups { (nation: Int, it: Iterator[CustomerSlim]) =>
            it.toSeq
              .sortBy(c => (-c.c_acctbal, c.c_custkey))
              .take(2)
              .zipWithIndex
              .map { case (c, i) => TopAccount(nation, i + 1L, c.c_custkey, c.c_acctbal) }
          }
          .toDF()
          .orderBy($"nation", $"rank")
      },
      """SELECT c_nationkey AS nation,
        |  CAST(row_number() OVER w AS BIGINT) AS rank,
        |  c_custkey AS custkey, c_acctbal AS acctbal
        |FROM customer
        |WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey)
        |QUALIFY rank <= 2
        |ORDER BY nation, rank""".stripMargin),

    // ---- Fuzzy string join (record linkage) with length-band candidates -----------
    // Near-match pairs over the DISTINCT name vocabulary, edit distance
    // <= 2. Scale shape: levenshtein(a,b) <= 2 implies |len(a)-len(b)| <= 2,
    // so one side explodes to its 5-length neighborhood and the join is an
    // EQUI join on length — never an all-pairs product — with the exact
    // levenshtein as the residual filter (each pair meets exactly once:
    // the build side carries its single true length). At web scale the
    // band key gains a q-gram prefix (same pattern, tighter buckets). The
    // oracle is the UNbanded inequality join, so the banding is verified
    // lossless (q27/q47 policy).
    "q59_fuzzy_name_join" -> Q(
      (s, dir) => {
        import s.implicits._
        val names = Tables.part(s, dir).select($"p_name").distinct()
        val probe = names.select($"p_name".as("a"),
          explode(sequence(length($"p_name") - 2, length($"p_name") + 2)).as("len"))
        val build = names.select($"p_name".as("b"), length($"p_name").as("len"))
        probe.join(build, "len")
          .filter($"a" < $"b" && levenshtein($"a", $"b") <= 2)
          .select($"a", $"b", levenshtein($"a", $"b").cast("long").as("lev"))
          .orderBy($"a", $"b")
      },
      """WITH n AS (SELECT DISTINCT p_name FROM part)
        |SELECT a.p_name AS a, b.p_name AS b,
        |  levenshtein(a.p_name, b.p_name) AS lev
        |FROM n a JOIN n b
        |  ON a.p_name < b.p_name AND levenshtein(a.p_name, b.p_name) <= 2
        |ORDER BY a, b""".stripMargin),

    // ---- Mergeable-histogram quantile estimation -----------------------------------
    // The quantile SKETCH the exact percentile (q28) can't be at 100 TB:
    // exact percentiles need the sorted values per group; a fixed 100-bin
    // histogram is constant-size per group, merges by addition across
    // partitions (same algebra as q93's CMS grid), and answers any quantile
    // by linear interpolation inside the covering bin. Unlike t-digest/
    // GK sketches (impl-defined internals), the bin counts are plain
    // integers and the interpolation is one fixed double expression, so the
    // whole sketch AND its estimates are oracle-checked. Estimation error
    // is bounded by bin width (spec asserts vs exact percentiles).
    "q99_histogram_quantiles" -> Q(
      (s, dir) => {
        import s.implicits._
        val binW = 1100.0
        val h = Tables.lineitem(s, dir)
          .groupBy($"l_returnflag".as("flag"),
            least(lit(99), floor($"l_extendedprice" / binW)).cast("int").as("bin"))
          .agg(count(lit(1)).as("c"))
        // Round 17 (guide §1.2/§2.4): per-flag totals ride a whole-partition
        // window over the SAME flag exchange the cumulative sum already
        // needs (no tot join, the histogram aggregates once), and each
        // quantile picks its covering bin via min(struct(bin, est)) over the
        // rows passing its cum-threshold — the identical first-qualifying-
        // bin the old filter + row_number + self-join selected, in ONE
        // aggregation. The whole sketch is now scan → histogram agg → one
        // flag-keyed window pass → final agg.
        val w = Window.partitionBy($"flag").orderBy($"bin")
        val cum = h.withColumn("cum", sum($"c").over(w))
          .withColumn("n", sum($"c").over(Window.partitionBy($"flag")))
        def est(p: Double) = min(when($"cum" >= $"n" * p,
          struct($"bin", round(
            $"bin" * binW + lit(binW) * (($"n" * p - ($"cum" - $"c")) / $"c"), 6).as("v"))))
        cum.groupBy($"flag")
          .agg(est(0.5).getField("v").as("p50_est"),
               est(0.95).getField("v").as("p95_est"))
          .orderBy($"flag")
      },
      """WITH h AS (
        |  SELECT l_returnflag AS flag,
        |    CAST(least(99, floor(l_extendedprice / 1100.0)) AS INTEGER) AS bin,
        |    COUNT(*) AS c
        |  FROM lineitem GROUP BY 1, 2),
        |t AS (SELECT flag, CAST(SUM(c) AS BIGINT) AS n FROM h GROUP BY 1),
        |cum AS (
        |  SELECT h.flag, bin, c,
        |    CAST(SUM(c) OVER (PARTITION BY h.flag ORDER BY bin) AS BIGINT) AS cum, n
        |  FROM h JOIN t USING (flag)),
        |p50 AS (
        |  SELECT flag, round(bin * 1100.0 + 1100.0 * ((n * 0.5 - (cum - c)) / c), 6) AS p50_est,
        |    ROW_NUMBER() OVER (PARTITION BY flag ORDER BY bin) AS rn
        |  FROM cum WHERE cum >= n * 0.5),
        |p95 AS (
        |  SELECT flag, round(bin * 1100.0 + 1100.0 * ((n * 0.95 - (cum - c)) / c), 6) AS p95_est,
        |    ROW_NUMBER() OVER (PARTITION BY flag ORDER BY bin) AS rn
        |  FROM cum WHERE cum >= n * 0.95)
        |SELECT p50.flag, p50_est, p95_est
        |FROM p50 JOIN p95 ON p50.flag = p95.flag AND p50.rn = 1 AND p95.rn = 1
        |ORDER BY p50.flag""".stripMargin),

    // ---- Portable HLL: distinct-count sketch rollup, fully oracle-checked --------
    // The same partial → union → estimate shape as q58, but on a
    // from-scratch HyperLogLog whose every step is exact integer
    // arithmetic both engines share: bucket = low 6 bits of the portable
    // md5-60bit hash; rho = leading-zero rank of the remaining 54 bits
    // (via length(bin(w)) — no floating log); registers = MAX(rho), which
    // is what makes sketches union by MAX across any partitioning
    // (per-nation partials here, exactly q58's rollup); the harmonic sum
    // is computed as Σ 2^(55−rho) — an exact BIGINT (≤ 2^60) — so the
    // only floating step is the final alpha·m²·2^55 / S division, bit-
    // identical cross-engine. No small-range correction (it needs ln,
    // which is not portable): below ~2.5m keys the raw estimate biases
    // high, which the spec documents by asserting accuracy at sf0.01
    // scale. Spark's Datasketches HLL (q58) stays as the built-in
    // surface; this row proves the rollup algebra end-to-end.
    "q101_portable_hll" -> Q(
      (s, dir) => {
        import s.implicits._
        val h = "cast(conv(substring(md5(cast(c_custkey as string)), 1, 15), 16, 10) as bigint)"
        val hashed = Tables.customer(s, dir)
          .select($"c_nationkey", expr(h).as("h"))
          .select($"c_nationkey", ($"h" % 64).cast("int").as("bucket"),
            expr("shiftright(h, 6)").as("w"))
          .withColumn("rho",
            when($"w" === 0, lit(55)).otherwise(lit(55) - length(expr("bin(w)"))))
        // partial: per-nation registers (the shippable sketch)
        val partials = hashed.groupBy($"c_nationkey", $"bucket")
          .agg(max($"rho").as("r"))
        // union: MAX per (region, bucket) over the nation partials
        val unioned = partials
          .join(broadcast(Tables.nation(s, dir)), $"c_nationkey" === $"n_nationkey")
          .groupBy($"n_regionkey", $"bucket")
          .agg(max($"r").as("r"))
        val est = unioned.groupBy($"n_regionkey")
          .agg((sum(expr("shiftleft(cast(1 as bigint), 55 - r)")) +
                (lit(64) - count(lit(1))) * lit(36028797018963968L)).as("s_scaled"),
               count(lit(1)).as("nz"))
          .select($"n_regionkey", $"s_scaled", $"nz",
            round(lit(0.709) * 4096 * lit(36028797018963968L) / $"s_scaled", 3).as("hll_est"))
        est.join(broadcast(Tables.region(s, dir)), $"n_regionkey" === $"r_regionkey")
          .select($"r_name", $"hll_est", $"s_scaled", $"nz")
          .orderBy($"r_name")
      },
      """WITH hashed AS (
        |  SELECT c_nationkey,
        |    CAST(CAST(('0x' || substring(md5(CAST(c_custkey AS VARCHAR)), 1, 15)) AS BIGINT) % 64 AS INTEGER) AS bucket,
        |    CAST(('0x' || substring(md5(CAST(c_custkey AS VARCHAR)), 1, 15)) AS BIGINT) >> 6 AS w
        |  FROM customer),
        |rho AS (
        |  SELECT c_nationkey, bucket,
        |    CASE WHEN w = 0 THEN 55 ELSE 55 - length(bin(w)) END AS rho
        |  FROM hashed),
        |partials AS (
        |  SELECT c_nationkey, bucket, MAX(rho) AS r FROM rho GROUP BY 1, 2),
        |unioned AS (
        |  SELECT n_regionkey, bucket, MAX(r) AS r
        |  FROM partials JOIN nation ON c_nationkey = n_nationkey
        |  GROUP BY 1, 2),
        |est AS (
        |  SELECT n_regionkey,
        |    CAST(SUM(CAST(1 AS BIGINT) << (55 - r)) +
        |         (64 - COUNT(*)) * 36028797018963968 AS BIGINT) AS s_scaled,
        |    COUNT(*) AS nz
        |  FROM unioned GROUP BY 1)
        |SELECT r_name,
        |  round(0.709 * 4096 * 36028797018963968 / s_scaled, 3) AS hll_est,
        |  s_scaled, nz
        |FROM est JOIN region ON n_regionkey = r_regionkey
        |ORDER BY r_name""".stripMargin),

    // ---- Runtime-filter join: broadcast bit-set prune + exact rescore -------------
    // The two-phase shape of Spark's own runtime bloom-filter join, built
    // explicitly so the prune is visible and portable: (1) the selective
    // dim's key set folds to DISTINCT buckets (key mod 65536 — a one-hash
    // bit-set; a k-hash bloom generalizes, sized ~10 bits/key), which
    // always broadcasts (≤64Ki entries regardless of fact size); the fact
    // scan semi-joins it map-side, so non-matching fact rows die BEFORE
    // the shuffle instead of after it. (2) survivors (matches + the
    // bit-set's false positives) rescore with the exact semi-join, so the
    // result is semantically identical to the plain semi-join — which is
    // exactly what the oracle asserts. At 100 TB phase 1 is the difference
    // between shuffling the whole fact table and shuffling the ~selectivity
    // fraction that survives the broadcast prune.
    "q102_bitset_prune_join" -> Q(
      (s, dir) => {
        import s.implicits._
        val dim = Tables.customer(s, dir)
          .filter($"c_mktsegment" === "AUTOMOBILE" && $"c_acctbal" > 9000)
          .select($"c_custkey")
        val buckets = dim.select(($"c_custkey" % 65536).as("bk")).distinct()
        Tables.orders(s, dir)
          .join(broadcast(buckets), $"o_custkey" % 65536 === $"bk", "left_semi")
          .join(dim, $"o_custkey" === $"c_custkey", "left_semi")
          .groupBy($"o_orderpriority")
          .agg(count(lit(1)).as("n_orders"), sumExact($"o_totalprice").as("sum_total"))
          .orderBy($"o_orderpriority")
      },
      """SELECT o_orderpriority, COUNT(*) AS n_orders,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_total
        |FROM orders
        |WHERE o_custkey IN (SELECT c_custkey FROM customer
        |                    WHERE c_mktsegment = 'AUTOMOBILE' AND c_acctbal > 9000)
        |GROUP BY 1 ORDER BY 1""".stripMargin),

    // ---- ANSI null-semantics pin ----------------------------------------------------
    // The null traps engines disagree on in the wild, pinned cross-engine
    // in one row: NOT IN against a NULL-free subquery is a plain anti
    // join; the SAME query with one NULL in the subquery returns ZERO rows
    // (ANSI three-valued logic — x <> NULL is UNKNOWN for every x); the
    // null-safe comparator (<=> / IS NOT DISTINCT FROM) vs plain equality;
    // COUNT(col) skipping NULLs vs COUNT(*); AVG over an empty set being
    // NULL, never 0. A dedup/curation pipeline joins and anti-joins on
    // nullable keys constantly — these semantics are load-bearing.
    "q126_null_semantics" -> Q(
      (s, dir) => {
        Tables.orders(s, dir).createOrReplaceTempView("orders_v")
        Tables.customer(s, dir).createOrReplaceTempView("customer_v")
        s.sql("""
          SELECT
            (SELECT COUNT(*) FROM orders_v WHERE o_custkey NOT IN
               (SELECT c_custkey FROM customer_v WHERE c_acctbal > 5000)) AS n_not_in_clean,
            (SELECT COUNT(*) FROM orders_v WHERE o_custkey NOT IN
               (SELECT CASE WHEN c_acctbal < 0 THEN NULL ELSE c_custkey END
                FROM customer_v)) AS n_not_in_nullable,
            (SELECT COUNT(*) FROM orders_v
             WHERE NOT (nullif(o_orderstatus, 'P') <=> NULL)) AS n_not_p,
            (SELECT COUNT(nullif(o_orderstatus, 'P')) FROM orders_v) AS n_count_col,
            (SELECT AVG(CAST(CASE WHEN 1 = 0 THEN 1 END AS DOUBLE))
             FROM orders_v) AS avg_empty
        """)
      },
      """SELECT
        |  (SELECT COUNT(*) FROM orders WHERE o_custkey NOT IN
        |     (SELECT c_custkey FROM customer WHERE c_acctbal > 5000)) AS n_not_in_clean,
        |  (SELECT COUNT(*) FROM orders WHERE o_custkey NOT IN
        |     (SELECT CASE WHEN c_acctbal < 0 THEN NULL ELSE c_custkey END
        |      FROM customer)) AS n_not_in_nullable,
        |  (SELECT COUNT(*) FROM orders
        |   WHERE NOT (nullif(o_orderstatus, 'P') IS NOT DISTINCT FROM NULL)) AS n_not_p,
        |  (SELECT COUNT(nullif(o_orderstatus, 'P')) FROM orders) AS n_count_col,
        |  (SELECT AVG(CAST(CASE WHEN 1 = 0 THEN 1 END AS DOUBLE))
        |   FROM orders) AS avg_empty""".stripMargin),

    // ---- Join/agg key skew profile (the diagnosis BEFORE salting) ------------------
    // The operator you run before choosing a skew mitigation: the per-key
    // frequency distribution of a prospective shuffle key. Emits, per key
    // column: distinct keys, min/median/p99/max per-key rowcounts, and the
    // heaviest key's share of all rows — share ≥ 1/partitions means one
    // reducer inherits a straggler and q27's salting (or AQE skew join)
    // applies. Shape: one partial+final count per key + a tiny percentile
    // over the COUNTS (bounded by distinct keys, not rows). All figures
    // are exact-integer-derived; the share is one double division, 6dp.
    "q124_skew_profile" -> Q(
      (s, dir) => {
        import s.implicits._
        def profile(keyed: org.apache.spark.sql.DataFrame, label: String) = {
          val counts = keyed.groupBy($"k").agg(count(lit(1)).as("n"))
          counts.agg(
              lit(label).as("key_col"),
              count(lit(1)).as("n_keys"),
              sum($"n").as("n_rows"),
              min($"n").as("min_n"),
              expr("percentile(n, 0.5)").as("med_n"),
              expr("percentile(n, 0.99)").as("p99_n"),
              max($"n").as("max_n"))
            .withColumn("top_share", round($"max_n" / $"n_rows", 6))
        }
        profile(Tables.lineitem(s, dir).select($"l_orderkey".as("k")), "l_orderkey")
          .unionByName(profile(
            Tables.events(s, dir).select($"user_id".as("k")), "user_id"))
          .orderBy($"key_col")
      },
      """WITH lo AS (SELECT l_orderkey AS k, COUNT(*) AS n FROM lineitem GROUP BY 1),
        |ev AS (SELECT user_id AS k, COUNT(*) AS n FROM events GROUP BY 1),
        |p AS (
        |  SELECT 'l_orderkey' AS key_col, COUNT(*) AS n_keys,
        |    CAST(SUM(n) AS BIGINT) AS n_rows, MIN(n) AS min_n,
        |    quantile_cont(n, 0.5) AS med_n, quantile_cont(n, 0.99) AS p99_n,
        |    MAX(n) AS max_n
        |  FROM lo
        |  UNION ALL
        |  SELECT 'user_id', COUNT(*), CAST(SUM(n) AS BIGINT), MIN(n),
        |    quantile_cont(n, 0.5), quantile_cont(n, 0.99), MAX(n)
        |  FROM ev)
        |SELECT key_col, n_keys, n_rows, min_n, med_n, p99_n, max_n,
        |  round(max_n / CAST(n_rows AS DOUBLE), 6) AS top_share
        |FROM p ORDER BY key_col""".stripMargin),

    // ---- EXISTS / NOT EXISTS through the SQL front door ---------------------------
    // The three-valued-logic-safe twin of q17's IN subqueries: EXISTS
    // ignores NULLs in the inner relation (where NOT IN famously returns
    // zero rows on one inner NULL — q126's lesson), so it is the shape
    // production SQL should reach for. Catalyst plans both as semi/anti
    // joins — no per-row subquery re-execution; the anti side shuffles on
    // the same key as the semi side, so at 100 TB both ride one exchange
    // pattern instead of a correlated loop.
    "q174_exists_subquery" -> Q(
      (s, dir) => {
        Tables.orders(s, dir).createOrReplaceTempView("orders_v")
        Tables.customer(s, dir).createOrReplaceTempView("customer_v")
        s.sql("""
          SELECT c_custkey, c_mktsegment
          FROM customer_v c
          WHERE EXISTS (SELECT 1 FROM orders_v o
                        WHERE o.o_custkey = c.c_custkey
                          AND CAST(o.o_totalprice AS DECIMAL(18,2)) > 100000.00)
            AND NOT EXISTS (SELECT 1 FROM orders_v o
                            WHERE o.o_custkey = c.c_custkey
                              AND o.o_orderstatus = 'F')
          ORDER BY c_custkey""")
      },
      """SELECT c_custkey, c_mktsegment
        |FROM customer c
        |WHERE EXISTS (SELECT 1 FROM orders o
        |              WHERE o.o_custkey = c.c_custkey
        |                AND CAST(o.o_totalprice AS DECIMAL(18,2)) > 100000.00)
        |  AND NOT EXISTS (SELECT 1 FROM orders o
        |                  WHERE o.o_custkey = c.c_custkey
        |                    AND o.o_orderstatus = 'F')
        |ORDER BY c_custkey""".stripMargin),

    // ---- LATERAL subquery (top-2 orders per customer via SQL) ---------------------
    // The SQL spelling of per-group top-k: a correlated LATERAL derived
    // table with ORDER BY ... LIMIT 2 per outer row. Catalyst de-correlates
    // this into a window/limit over the joined relation rather than
    // re-running the subquery per customer — the plan a 100-TB per-entity
    // top-k needs. Prices compare as DECIMAL(18,2) (the Exact discipline),
    // ties break on o_orderkey, so the kept set is deterministic.
    "q175_lateral_topk" -> Q(
      (s, dir) => {
        Tables.orders(s, dir).createOrReplaceTempView("orders_v")
        Tables.customer(s, dir).createOrReplaceTempView("customer_v")
        s.sql("""
          SELECT c.c_custkey, t.o_orderkey,
                 CAST(t.top_price AS DOUBLE) AS top_price
          FROM customer_v c JOIN LATERAL (
            SELECT o_orderkey,
                   CAST(o_totalprice AS DECIMAL(18,2)) AS top_price
            FROM orders_v o
            WHERE o.o_custkey = c.c_custkey
            ORDER BY top_price DESC, o_orderkey
            LIMIT 2) t
          ORDER BY c_custkey, top_price DESC, o_orderkey""")
      },
      """SELECT c.c_custkey, t.o_orderkey, t.top_price
        |FROM customer c JOIN LATERAL (
        |  SELECT o_orderkey,
        |         CAST(o_totalprice AS DECIMAL(18,2)) AS top_price
        |  FROM orders o
        |  WHERE o.o_custkey = c.c_custkey
        |  ORDER BY top_price DESC, o_orderkey
        |  LIMIT 2) t ON TRUE
        |ORDER BY c_custkey, top_price DESC, o_orderkey""".stripMargin),
  )
}
