package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Relational-core anchors (SURVEY.md §2.2/2.3/2.4): grouped aggregation
 * with exact decimal arithmetic, broadcast star join, union.
 * These exercise predicate pushdown, column pruning and broadcast planning
 * on the classic tables. */
object RelationalQueries {

  val q: Map[String, (SparkSession, String) => DataFrame] = Map(
    // TPC-H Q1-shaped pricing summary. Sums in DECIMAL(18,2)/(38,4): exact,
    // order-insensitive; doubles derived only at the end.
    "q1_pricing" -> ((s, dir) =>
      s.read
        .parquet(s"$dir/lineitem.parquet")
        .filter(col("l_shipdate") <= lit("1998-09-02"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum(col("l_quantity").cast("decimal(18,2)")).cast("double").as("sum_qty"),
          sum(col("l_extendedprice").cast("decimal(18,2)")).cast("double").as("sum_base_price"),
          sum(col("l_extendedprice").cast("decimal(18,2)") *
            (lit(1).cast("decimal(18,2)") - col("l_discount").cast("decimal(18,2)")))
            .cast("double").as("sum_disc_price"),
          count(lit(1)).as("count_order"))
        .withColumn(
          "avg_qty",
          col("sum_qty") / col("count_order").cast("double"))),

    // Star join: revenue per nation. Dimensions (nation, customer) are
    // small relative to facts → explicit broadcast hints; at production
    // scale orders is the only shuffled side.
    "q_nation_revenue" -> ((s, dir) => {
      val orders = s.read.parquet(s"$dir/orders.parquet")
      val customer = broadcast(s.read.parquet(s"$dir/customer.parquet"))
      val nation = broadcast(s.read.parquet(s"$dir/nation.parquet"))
      orders
        .join(customer, col("o_custkey") === col("c_custkey"))
        .join(nation, col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(
          sum(col("o_totalprice").cast("decimal(18,2)")).cast("double").as("revenue"),
          count(lit(1)).as("n_orders"))
    }),

    // Filter + projection pushdown anchor: high-value open orders.
    "q_filter_orders" -> ((s, dir) =>
      s.read
        .parquet(s"$dir/orders.parquet")
        .filter(col("o_orderstatus") === "O" && col("o_totalprice") > 400000.0)
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))),

    // Set op: UNION ALL of two disjoint slices + distinct count per side
    // (ancestor: ConcatDataset union, data/builder/_base.py:71-83).
    "q_union_sources" -> ((s, dir) => {
      val ev = s.read.parquet(s"$dir/events.parquet")
      val a = ev
        .filter(col("event_type") === "purchase")
        .select(col("user_id"), lit("purchase").as("side"))
      val b = ev
        .filter(col("event_type") === "error")
        .select(col("user_id"), lit("error").as("side"))
      a.unionByName(b)
        .groupBy(col("side"))
        .agg(countDistinct(col("user_id")).as("n_users"), count(lit(1)).as("n_rows"))
    })
  )

  val oracle: Map[String, String] = Map(
    "q1_pricing" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
        |           (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
        |    AS sum_disc_price,
        |  count(*) AS count_order,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
        |    / CAST(count(*) AS DOUBLE) AS avg_qty
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        |GROUP BY 1, 2""".stripMargin,
    "q_nation_revenue" ->
      """SELECT n_name,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
        |  count(*) AS n_orders
        |FROM orders
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY 1""".stripMargin,
    "q_filter_orders" ->
      """SELECT o_orderkey, o_custkey, o_totalprice
        |FROM orders
        |WHERE o_orderstatus = 'O' AND o_totalprice > 400000.0""".stripMargin,
    "q_union_sources" ->
      """SELECT side, count(DISTINCT user_id) AS n_users, count(*) AS n_rows
        |FROM (
        |  SELECT user_id, 'purchase' AS side FROM events WHERE event_type = 'purchase'
        |  UNION ALL
        |  SELECT user_id, 'error' AS side FROM events WHERE event_type = 'error')
        |GROUP BY 1""".stripMargin
  )
}
