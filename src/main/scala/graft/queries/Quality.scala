package graft.queries

import graft.Tables
import org.apache.spark.sql.functions._

/** Data-contract validation: the expectations suite a pipeline runs against
  * every batch before publishing it downstream — uniqueness, referential
  * integrity, value domains/ranges, and cross-field consistency, emitted as
  * one report row per check.
  *
  * Scale shape: all per-table checks FUSE into one aggregate pass over that
  * table (`stack` fans the single result row out into report rows), so the
  * suite costs one scan per table plus one broadcast anti-join per FK check
  * — not one scan per check. Every count is exact integer arithmetic.
  *
  * The synthetic corpus genuinely fails two contracts (duplicate lineitem
  * PKs, lineitems shipped before their order date) — the report shows real
  * violations, not a vacuous all-green.
  */
object DataQuality {

  val all: Seq[(String, Q)] = Seq(

    "q107_dq_report" -> Q(
      (s, dir) => {
        import s.implicits._
        val li = Tables.lineitem(s, dir).agg(
            count(lit(1)).as("n"),
            sum(($"l_quantity" < 1 || $"l_quantity" > 50).cast("long")).as("qty_v"),
            sum(($"l_discount" < 0 || $"l_discount" > 0.1).cast("long")).as("disc_v"),
            (count(lit(1)) - countDistinct(struct($"l_orderkey", $"l_linenumber"))).as("dup_v"))
          .select(expr("stack(3, " +
            "'lineitem_discount_range', n, disc_v, " +
            "'lineitem_pk_unique', n, dup_v, " +
            "'lineitem_qty_range', n, qty_v) AS (check_name, n_checked, n_violations)"))
        val ord = Tables.orders(s, dir).agg(
            count(lit(1)).as("n"),
            (count(lit(1)) - countDistinct($"o_orderkey")).as("dup_v"),
            sum((!$"o_orderstatus".isin("O", "F", "P")).cast("long")).as("dom_v"))
          .select(expr("stack(2, " +
            "'orders_pk_unique', n, dup_v, " +
            "'orders_status_domain', n, dom_v) AS (check_name, n_checked, n_violations)"))
        val doc = Tables.documents(s, dir).agg(
            count(lit(1)).as("n"),
            sum(($"n_chars" =!= length($"text")).cast("long")).as("len_v"))
          .select(lit("documents_nchars_consistent").as("check_name"),
            $"n".as("n_checked"), $"len_v".as("n_violations"))
        // FK orphans via anti-join. NO broadcast hint on the key side:
        // orders/customer keys grow LINEARLY with the corpus (billions of
        // rows at 100 TB) — a forced hint OOMs instead of degrading.
        // Catalyst auto-broadcasts while the side is under the threshold
        // and falls back to a shuffled anti-join beyond it.
        val fkOrd = Tables.orders(s, dir).join(
            Tables.customer(s, dir).select($"c_custkey"),
            $"o_custkey" === $"c_custkey", "left_anti")
          .agg(count(lit(1)).as("n_violations"))
          .select(lit("orders_fk_customer").as("check_name"),
            lit(null).cast("long").as("n_checked"), $"n_violations")
        // FK orphans + ship-before-order from ONE left join (guide §1.2 /
        // this module's one-scan doctrine): an unmatched lineitem surfaces
        // exactly once with a null o_orderkey (= the old anti-join count),
        // a matched one carries its order's date (the old inner join,
        // multiplicity included — duplicate order PKs expand identically);
        // previously this pair of checks scanned and joined lineitem↔orders
        // twice. Values are unchanged row-for-row.
        val liOrd = Tables.lineitem(s, dir).select($"l_orderkey", $"l_shipdate")
          .join(Tables.orders(s, dir).select($"o_orderkey", $"o_orderdate"),
            $"l_orderkey" === $"o_orderkey", "left")
          .agg(
            coalesce(sum($"o_orderkey".isNull.cast("long")), lit(0L)).as("fk_v"),
            coalesce(sum($"o_orderkey".isNotNull.cast("long")), lit(0L)).as("ship_n"),
            coalesce(sum(($"l_shipdate" < $"o_orderdate").cast("long")), lit(0L)).as("ship_v"))
          .select(expr("stack(2, " +
            "'lineitem_fk_orders', cast(null as bigint), fk_v, " +
            "'lineitem_ship_after_order', ship_n, ship_v) " +
            "AS (check_name, n_checked, n_violations)"))
        li.unionByName(ord).unionByName(doc)
          .unionByName(fkOrd).unionByName(liOrd)
          .withColumn("pass", $"n_violations" === 0)
          .orderBy($"check_name")
      },
      """SELECT check_name, n_checked, n_violations, n_violations = 0 AS pass
        |FROM (
        |  SELECT 'lineitem_discount_range' AS check_name, COUNT(*) AS n_checked,
        |    CAST(SUM(CASE WHEN l_discount < 0 OR l_discount > 0.1 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_violations FROM lineitem
        |  UNION ALL
        |  SELECT 'lineitem_pk_unique', COUNT(*),
        |    COUNT(*) - COUNT(DISTINCT (l_orderkey, l_linenumber)) FROM lineitem
        |  UNION ALL
        |  SELECT 'lineitem_qty_range', COUNT(*),
        |    CAST(SUM(CASE WHEN l_quantity < 1 OR l_quantity > 50 THEN 1 ELSE 0 END) AS BIGINT)
        |    FROM lineitem
        |  UNION ALL
        |  SELECT 'orders_pk_unique', COUNT(*),
        |    COUNT(*) - COUNT(DISTINCT o_orderkey) FROM orders
        |  UNION ALL
        |  SELECT 'orders_status_domain', COUNT(*),
        |    CAST(SUM(CASE WHEN o_orderstatus NOT IN ('O','F','P') THEN 1 ELSE 0 END) AS BIGINT)
        |    FROM orders
        |  UNION ALL
        |  SELECT 'documents_nchars_consistent', COUNT(*),
        |    CAST(SUM(CASE WHEN n_chars != length(text) THEN 1 ELSE 0 END) AS BIGINT)
        |    FROM documents
        |  UNION ALL
        |  SELECT 'lineitem_fk_orders', NULL,
        |    CAST((SELECT COUNT(*) FROM lineitem
        |          WHERE l_orderkey NOT IN (SELECT o_orderkey FROM orders)) AS BIGINT)
        |  UNION ALL
        |  SELECT 'orders_fk_customer', NULL,
        |    CAST((SELECT COUNT(*) FROM orders
        |          WHERE o_custkey NOT IN (SELECT c_custkey FROM customer)) AS BIGINT)
        |  UNION ALL
        |  SELECT 'lineitem_ship_after_order', COUNT(*),
        |    CAST(SUM(CASE WHEN l_shipdate < o_orderdate THEN 1 ELSE 0 END) AS BIGINT)
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |) t ORDER BY check_name""".stripMargin),
  )
}
