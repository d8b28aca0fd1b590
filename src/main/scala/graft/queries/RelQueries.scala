package graft.queries

import org.apache.spark.sql.functions._

import graft.operators.StatOps.cents
import graft.tables.Tables

/** Relational analytics over the TPC-H-ish tables — bench headliners and
  * coverage for scan/filter/agg/join/top-k shapes. Money columns are
  * 2-decimal doubles; all sums go through the exact-cents path so the
  * DuckDB hash comparison is bit-deterministic (SURVEY §7.4(7)).
  */
object RelQueries {

  /** l_discount is a 2-decimal fraction; as integer percent 0..100. */
  private val discPct = "CAST(ROUND(l_discount*100, 0) AS BIGINT)"
  private val epCents = "CAST(ROUND(l_extendedprice*100, 0) AS BIGINT)"
  private val qtyCents = "CAST(ROUND(l_quantity*100, 0) AS BIGINT)"

  val defs: Map[String, QueryDef] = Map(

    // Pricing summary (TPC-H Q1 shape): scan+filter+hash agg.
    "q1_agg" -> QueryDef(
      s"""SELECT l_returnflag, l_linestatus,
         |  SUM($qtyCents) / 100.0 AS sum_qty,
         |  SUM($epCents) / 100.0 AS sum_base,
         |  CAST(SUM($epCents * (100 - $discPct)) AS BIGINT) / 10000.0 AS sum_disc,
         |  SUM($qtyCents) / 100.0 / COUNT(*) AS avg_qty,
         |  CAST(COUNT(*) AS BIGINT) AS cnt
         |FROM lineitem
         |GROUP BY l_returnflag, l_linestatus
         |ORDER BY l_returnflag, l_linestatus""".stripMargin) { (s, dir) =>
      Tables.table(s, dir, "lineitem")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          (sum(cents(col("l_quantity"))) / 100.0).as("sum_qty"),
          (sum(cents(col("l_extendedprice"))) / 100.0).as("sum_base"),
          (sum(cents(col("l_extendedprice")) * (lit(100L) - cents(col("l_discount"))))
            / 10000.0).as("sum_disc"),
          (sum(cents(col("l_quantity"))) / 100.0 / count(lit(1))).as("avg_qty"),
          count(lit(1)).as("cnt"))
        .orderBy("l_returnflag", "l_linestatus")
    },

    // Top-k: total order then limit — TakeOrderedAndProject, no full sort.
    "q_topk_orders" -> QueryDef(
      s"""SELECT o_orderkey, o_custkey, o_totalprice FROM orders
         |ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""".stripMargin) { (s, dir) =>
      Tables.table(s, dir, "orders")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .limit(10)
    },

    // Dim⋈fact with explicit broadcast of the small side.
    "q_join_agg" -> QueryDef(
      s"""SELECT c_mktsegment, CAST(COUNT(*) AS BIGINT) AS cnt,
         |  SUM(CAST(ROUND(o_totalprice*100, 0) AS BIGINT)) / 100.0 AS revenue
         |FROM orders JOIN customer ON o_custkey = c_custkey
         |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin) { (s, dir) =>
      val orders = Tables.table(s, dir, "orders")
      val customer = Tables.table(s, dir, "customer")
      orders.join(broadcast(customer), col("o_custkey") === col("c_custkey"))
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("cnt"),
          (sum(cents(col("o_totalprice"))) / 100.0).as("revenue"))
        .orderBy("c_mktsegment")
    },

    // Anti-join (NOT EXISTS): customers with no high-value order.
    "q_anti_join" -> QueryDef(
      s"""SELECT c_mktsegment, CAST(COUNT(*) AS BIGINT) AS cnt
         |FROM customer
         |WHERE NOT EXISTS (SELECT 1 FROM orders
         |                  WHERE o_custkey = c_custkey AND o_totalprice > 300000)
         |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin) { (s, dir) =>
      Tables.table(s, dir, "customer")
        .join(Tables.table(s, dir, "orders").filter(col("o_totalprice") > 300000),
          col("c_custkey") === col("o_custkey"), "left_anti")
        .groupBy("c_mktsegment").agg(count(lit(1)).as("cnt"))
        .orderBy("c_mktsegment")
    },

    // Multi-way join through the dimension chain with two broadcasts.
    "q_nation_revenue" -> QueryDef(
      s"""SELECT n_name, CAST(COUNT(*) AS BIGINT) AS cnt,
         |  SUM(CAST(ROUND(o_totalprice*100, 0) AS BIGINT)) / 100.0 AS revenue
         |FROM orders
         |JOIN customer ON o_custkey = c_custkey
         |JOIN nation ON c_nationkey = n_nationkey
         |GROUP BY n_name ORDER BY n_name""".stripMargin) { (s, dir) =>
      Tables.table(s, dir, "orders")
        .join(broadcast(Tables.table(s, dir, "customer")),
          col("o_custkey") === col("c_custkey"))
        .join(broadcast(Tables.table(s, dir, "nation")),
          col("c_nationkey") === col("n_nationkey"))
        .groupBy("n_name")
        .agg(count(lit(1)).as("cnt"),
          (sum(cents(col("o_totalprice"))) / 100.0).as("revenue"))
        .orderBy("n_name")
    })
}
