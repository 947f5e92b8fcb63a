package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.funcs._
import graft.ir.Expr._
import graft.model.Model

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Each `queries` entry exercises one operator from SURVEY.md §2 through the
  * graft Model API; `oracleSql` holds the DuckDB-equivalent ANSI SQL the
  * driver checks against at sf0.01.
  */
object SparkEntry {

  private def m(dir: String, table: String): Model = Model.parquet(dir, table)

  /** Flagship query on sf=0.001; driver smoke-checks rows>0.
    * Sales-by-year-equivalent from the reference README (README.md:47-66):
    * events aggregated by year with a count measure. */
  def entry(spark: SparkSession): DataFrame = {
    val dir = "/root/testdata/sf0.001"
    m(dir, "events")
      .aggregate(
        groups = Seq(col("ts").byYear.named("ts_year")),
        measures = Seq(count().named("count")))
      .sort(col("ts_year"))
      .run(spark)
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // --- TableNameSource scan + PickSource (SURVEY §2.1) ---
    "q_scan_pick" -> ((s, dir) =>
      m(dir, "region").pick(col("r_regionkey"), col("r_name"))
        .sort(col("r_regionkey")).run(s)),

    // --- FilterSource (σ) ---
    "q_filter" -> ((s, dir) =>
      m(dir, "lineitem")
        .filter(col("l_quantity") > lit(45.0) && col("l_returnflag") === lit("R"))
        .pick(col("l_orderkey"), col("l_linenumber"), col("l_quantity"))
        .sort(col("l_orderkey")).sort(col("l_linenumber"))
        .run(s)),

    // --- AggregateSource (γ): the TPC-H Q1 shape ---
    "q1_agg" -> ((s, dir) =>
      m(dir, "lineitem")
        .aggregate(
          groups = Seq(col("l_returnflag"), col("l_linestatus")),
          measures = Seq(
            sum(col("l_quantity")).named("sum_qty"),
            sum(col("l_extendedprice")).named("sum_base_price"),
            avg(col("l_discount")).named("avg_disc"),
            count().named("count_order")))
        .sort(col("l_returnflag")).sort(col("l_linestatus"))
        .run(s)),

    // --- global aggregate (zero groups) ---
    "q_agg_global" -> ((s, dir) =>
      m(dir, "orders")
        .aggregate(measures = Seq(
          count().named("n"),
          sum(col("o_totalprice")).named("total"),
          max(col("o_orderdate")).named("last_order")))
        .run(s)),

    // --- SortSource + LimitSource (offset) ---
    "q_sort_limit" -> ((s, dir) =>
      m(dir, "customer")
        .sort(col("c_acctbal"), dir = "desc")
        .sort(col("c_custkey"))
        .limit(50, offset = 10)
        .pick(col("c_custkey"), col("c_name"), col("c_acctbal"))
        .run(s)),

    // --- UnionSource ---
    "q_union_all" -> ((s, dir) => {
      val hi = m(dir, "part").filter(col("p_size") >= lit(48))
        .pick(col("p_partkey"), col("p_name"))
      val lo = m(dir, "part").filter(col("p_size") <= lit(2))
        .pick(col("p_partkey"), col("p_name"))
      hi.unionAll(lo).sort(col("p_partkey")).run(s)
    }),

    // --- GranularityColumnExpression (by_month; Sunday-based week too) ---
    "q_granularity" -> ((s, dir) =>
      m(dir, "orders")
        .aggregate(
          groups = Seq(
            col("o_orderdate").byMonth.named("month"),
            col("o_orderdate").byWeek.named("week")),
          measures = Seq(count().named("n")))
        .sort(col("month")).sort(col("week"))
        .run(s)),

    // --- JoinOneSource: lazy LEFT join through a named relation ---
    "q_join_one" -> ((s, dir) => {
      val customer = m(dir, "customer").withPrimaryKey(col("c_custkey"))
      val orders = m(dir, "orders")
        .withJoinOne(customer, named = "customer", foreignKey = col("o_custkey"))
      orders
        .aggregate(
          groups = Seq(orders.rel("customer").attr("c_mktsegment").named("segment")),
          measures = Seq(
            count().named("n_orders"),
            sum(col("o_totalprice")).named("revenue")))
        .sort(col("segment"))
        .run(s)
    }),
  )

  /** For each key in `queries`, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Column names must match exactly. */
  def oracleSql: Map[String, String] = Map(
    "q_scan_pick" ->
      "SELECT r_regionkey, r_name FROM region ORDER BY r_regionkey",
    "q_filter" ->
      """SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
         WHERE l_quantity > 45.0 AND l_returnflag = 'R'
         ORDER BY l_orderkey, l_linenumber""",
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
                sum(l_quantity) AS sum_qty,
                sum(l_extendedprice) AS sum_base_price,
                avg(l_discount) AS avg_disc,
                count(*) AS count_order
         FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2""",
    "q_agg_global" ->
      """SELECT count(*) AS n, sum(o_totalprice) AS total,
                max(o_orderdate) AS last_order
         FROM orders""",
    "q_sort_limit" ->
      """SELECT c_custkey, c_name, c_acctbal FROM
         (SELECT * FROM customer ORDER BY c_acctbal DESC, c_custkey
          LIMIT 50 OFFSET 10) t""",
    "q_union_all" ->
      """SELECT * FROM (
           SELECT p_partkey, p_name FROM part WHERE p_size >= 48
           UNION ALL
           SELECT p_partkey, p_name FROM part WHERE p_size <= 2
         ) t ORDER BY p_partkey""",
    "q_granularity" ->
      """SELECT date_trunc('month', o_orderdate) AS month,
                date_trunc('week', o_orderdate + INTERVAL 1 DAY) - INTERVAL 1 DAY AS week,
                count(*) AS n
         FROM orders GROUP BY 1, 2 ORDER BY 1, 2""",
    "q_join_one" ->
      """SELECT c.c_mktsegment AS segment, count(*) AS n_orders,
                sum(o.o_totalprice) AS revenue
         FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey
         GROUP BY 1 ORDER BY 1""",
  )
}
