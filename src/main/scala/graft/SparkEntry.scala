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

  /** Money-sum de-flaker: sum double amounts as exact decimal, then one
    * rounding back to double. Plain sum(double) is summation-order dependent
    * (Spark partial aggregates vs the DuckDB oracle diverge in the last few
    * ulps — the round-1 `q_join_one` hash failure); decimal summation is
    * associative so both sides agree bit-for-bit. Oracles mirror with
    * CAST(sum(CAST(x AS DECIMAL(18,2))) AS DOUBLE). */
  private def moneySum(e: graft.ir.Expr): graft.ir.Expr =
    cast(sum(cast(e, "decimal(18,2)")), "double")

  /** Order-independent mean: exact decimal sum divided by count, identical
    * on the oracle side as CAST(sum(CAST(x AS DECIMAL(18,9))) AS DOUBLE)/count(*). */
  private def exactAvg(e: graft.ir.Expr): graft.ir.Expr =
    cast(sum(cast(e, "decimal(18,9)")), "double") / count()

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
            moneySum(col("l_quantity")).named("sum_qty"),
            moneySum(col("l_extendedprice")).named("sum_base_price"),
            exactAvg(col("l_discount")).named("avg_disc"),
            count().named("count_order")))
        .sort(col("l_returnflag")).sort(col("l_linestatus"))
        .run(s)),

    // --- global aggregate (zero groups) ---
    "q_agg_global" -> ((s, dir) =>
      m(dir, "orders")
        .aggregate(measures = Seq(
          count().named("n"),
          moneySum(col("o_totalprice")).named("total"),
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
            moneySum(col("o_totalprice")).named("revenue")))
        .sort(col("segment"))
        .run(s)
    }),

    // --- multi-hop join chain with dropUnmatched (INNER) + theta condition ---
    "q_join_chain" -> ((s, dir) => {
      val nation = m(dir, "nation").withPrimaryKey(col("n_nationkey"))
      val customer = m(dir, "customer").withPrimaryKey(col("c_custkey"))
        .withJoinOne(nation, named = "nation", foreignKey = col("c_nationkey"))
      val cWithNation = customer.pick(
        col("c_custkey"), col("c_acctbal"),
        customer.rel("nation").attr("n_name").named("nation_name"))
        .withPrimaryKey(col("c_custkey"))
      val orders = m(dir, "orders")
        .withJoinOne(cWithNation, named = "cust", foreignKey = col("o_custkey"),
          dropUnmatched = true)
      orders
        .filter(orders.rel("cust").attr("c_acctbal") > lit(9990.0))
        .aggregate(
          groups = Seq(orders.rel("cust").attr("nation_name").named("nation_name")),
          measures = Seq(count().named("n")))
        .sort(col("nation_name"))
        .run(s)
    }),

    // --- SqlTextSource (raw-SQL scan) ---
    "q_sql_text" -> ((s, dir) => {
      s.read.parquet(s"$dir/supplier.parquet").createOrReplaceTempView("supplier_v")
      Model.sqlQuery(
        "SELECT s_nationkey, s_acctbal FROM supplier_v WHERE s_acctbal > 5000")
        .aggregate(
          groups = Seq(col("s_nationkey")),
          measures = Seq(count().named("n"), moneySum(col("s_acctbal")).named("bal")))
        .sort(col("s_nationkey"))
        .run(s)
    }),

    // --- CasesColumnExpression ---
    "q_cases" -> ((s, dir) =>
      m(dir, "customer")
        .aggregate(
          groups = Seq(cases(
            Seq(
              (col("c_acctbal") < lit(0.0)) -> lit("negative"),
              (col("c_acctbal") < lit(5000.0)) -> lit("low")),
            lit("high")).named("bal_bucket")),
          measures = Seq(count().named("n")))
        .sort(col("bal_bucket"))
        .run(s)),

    // --- count_if / distinct / count(x) ---
    "q_count_if" -> ((s, dir) =>
      m(dir, "orders")
        .aggregate(
          groups = Seq(col("o_orderpriority")),
          measures = Seq(
            countIf(col("o_orderstatus") === lit("F")).named("n_f"),
            countIf(col("o_totalprice") > lit(100000.0)).named("n_big"),
            countDistinct(col("o_custkey")).named("n_cust"),
            count(col("o_orderkey")).named("n")))
        .sort(col("o_orderpriority"))
        .run(s)),

    // --- binary-op arithmetic incl. floorDiv (fixed reference gap) ---
    "q_arith" -> ((s, dir) =>
      m(dir, "lineitem")
        .filter(col("l_orderkey") <= lit(100L))
        .pick(
          col("l_orderkey"),
          col("l_linenumber"),
          (col("l_extendedprice") * (lit(1.0) - col("l_discount"))).named("net"),
          (col("l_extendedprice") * (lit(1.0) - col("l_discount")) *
            (lit(1.0) + col("l_tax"))).named("gross"),
          (col("l_quantity") + lit(1.0)).named("qplus"),
          (col("l_partkey") floorDiv lit(100L)).named("bucket"))
        .sort(col("l_orderkey")).sort(col("l_linenumber"))
        .run(s)),

    // --- NULL-aware IN over literal values ---
    "q_in_values" -> ((s, dir) =>
      m(dir, "orders")
        // nullif-style derived column so NULL handling is actually exercised
        .pick(
          col("o_orderkey"),
          cases(Seq((col("o_orderstatus") === lit("P")) -> lit(null)),
            col("o_orderstatus")).named("status_or_null"))
        .filter(ColRef("status_or_null").in(Seq("F", null)))
        .sort(col("o_orderkey"))
        .run(s)),

    // --- IN (model subquery): top-3 brands by part count ---
    "q_in_model" -> ((s, dir) => {
      val top = m(dir, "part")
        .aggregate(groups = Seq(col("p_brand")), measures = Seq(count().named("n")))
        .sort(col("n"), dir = "desc").sort(col("p_brand"))
        .limit(3)
      m(dir, "part")
        .filter(InModel(col("p_brand"), top, col("p_brand")))
        .aggregate(groups = Seq(col("p_brand")), measures = Seq(count().named("n")))
        .sort(col("p_brand"))
        .run(s)
    }),

    // --- bucket_other (top-N breakout, literal list) ---
    "q_bucket_other" -> ((s, dir) =>
      m(dir, "part")
        .aggregate(
          groups = Seq(
            bucketOther(col("p_brand"), Seq("Brand#11", "Brand#22", "Brand#33"))
              .named("brand_group")),
          measures = Seq(count().named("n"),
            moneySum(col("p_retailprice")).named("price_sum")))
        .sort(col("brand_group"))
        .run(s)),

    // --- scalar subquery: orders above average price ---
    "q_scalar_subquery" -> ((s, dir) => {
      val avgPrice = m(dir, "orders")
        .aggregate(measures = Seq(avg(col("o_totalprice")).named("a")))
      m(dir, "orders")
        .filter(col("o_totalprice") > scalar(avgPrice))
        .aggregate(measures = Seq(count().named("n"),
          min(col("o_totalprice")).named("min_price")))
        .run(s)
    }),

    // --- EXISTS(model) ---
    "q_exists" -> ((s, dir) => {
      val bigOrders = m(dir, "orders").filter(col("o_totalprice") > lit(400000.0))
      m(dir, "region")
        .filter(exists(bigOrders))
        .pick(col("r_regionkey"), col("r_name"))
        .sort(col("r_regionkey"))
        .run(s)
    }),

    // --- LIKE / ILIKE / contains ---
    "q_like" -> ((s, dir) =>
      m(dir, "part")
        .filter(col("p_type").like("%BRASS%") ||
          col("p_name").contains("green") ||
          col("p_brand").ilike("brand#4%"))
        .aggregate(measures = Seq(count().named("n")))
        .run(s)),

    // --- diff_seconds (Databricks recipe: unix_timestamp difference) ---
    "q_diff_seconds" -> ((s, dir) =>
      m(dir, "events")
        .aggregate(
          groups = Seq(col("event_type")),
          measures = Seq(
            avg(diffSeconds(col("ts"), col("ts").byDay)).named("avg_secs_in_day"),
            count().named("n")))
        .sort(col("event_type"))
        .run(s)),

    // --- format_timestamp: python tokens incl. %Q quarter splice ---
    "q_format_ts" -> ((s, dir) =>
      m(dir, "orders")
        .aggregate(
          groups = Seq(
            FormatTs(col("o_orderdate"), "%Y-%m").named("ym"),
            FormatTs(col("o_orderdate"), "Q%Q/%Y").named("quarter_label")),
          measures = Seq(count().named("n")))
        .sort(col("ym"))
        .run(s)),

    // --- temporal predicates (is_this_week etc.) with pinned now() ---
    "q_temporal_preds" -> ((s, dir) => {
      val at = java.time.Instant.parse("2024-01-15T12:00:00Z")
      m(dir, "events")
        .aggregate(measures = Seq(
          countIf(isToday(col("ts"), at)).named("n_today"),
          countIf(isYesterday(col("ts"), at)).named("n_yesterday"),
          countIf(isThisWeek(col("ts"), at)).named("n_this_week"),
          countIf(isLastWeek(col("ts"), at)).named("n_last_week"),
          countIf(isThisMonth(col("ts"), at)).named("n_this_month"),
          countIf(isThisQuarter(col("ts"), at)).named("n_this_quarter"),
          countIf(isThisYear(col("ts"), at)).named("n_this_year")))
        .run(s)
    }),

    // --- interval arithmetic: shipdate within 90 days after order date ---
    "q_interval" -> ((s, dir) => {
      val orders = m(dir, "orders").withPrimaryKey(col("o_orderkey"))
      val li = m(dir, "lineitem")
        .withJoinOne(orders, named = "ord", foreignKey = col("l_orderkey"))
      li.filter(col("l_shipdate") <=
          AddInterval(li.rel("ord").attr("o_orderdate"), interval(90, "day"), negate = false))
        .aggregate(measures = Seq(count().named("n")))
        .run(s)
    }),

    // --- cast ---
    "q_cast" -> ((s, dir) =>
      m(dir, "lineitem")
        .filter(col("l_orderkey") <= lit(500L))
        .pick(
          col("l_orderkey"),
          col("l_linenumber"),
          cast(col("l_quantity"), "bigint").named("qty_int"),
          cast(col("l_linenumber"), "double").named("ln_dbl"))
        .sort(col("l_orderkey")).sort(col("l_linenumber"))
        .run(s)),

    // --- fold (unpivot wide→long) ---
    "q_fold" -> ((s, dir) =>
      m(dir, "orders")
        .aggregate(
          groups = Seq(col("o_orderpriority")),
          measures = Seq(
            countIf(col("o_orderstatus") === lit("O")).named("n_open"),
            countIf(col("o_orderstatus") === lit("F")).named("n_fulfilled"),
            countIf(col("o_orderstatus") === lit("P")).named("n_pending")))
        .fold(
          ids = Seq(col("o_orderpriority")),
          values = Seq(col("n_open"), col("n_fulfilled"), col("n_pending")),
          keyName = "status", valueName = "n")
        .sort(col("o_orderpriority")).sort(col("status"))
        .run(s)),

    // --- raw SQL fragment escape hatch (column(sql=...)) ---
    "q_raw_sql" -> ((s, dir) =>
      m(dir, "customer")
        .aggregate(
          groups = Seq(sql("substring(c_name, 1, 9)").named("name_prefix")),
          measures = Seq(count().named("n")))
        .sort(col("name_prefix"))
        .limit(20)
        .run(s)),

    // =============== event analytics (match_steps family) ===============

    // --- match_steps: per-user greedy step timestamps + last matched step ---
    "q_match_steps" -> ((s, dir) => {
      val matched = m(dir, "events")
        .withActivitySchema(group = col("user_id"), timestamp = col("ts"),
          eventKey = col("event_type"))
        .matchSteps(Seq[graft.model.StepSpec]("view", "click", "purchase"))
      matched.pick(
        col("user_id"),
        matched.rel("view").attr("ts").named("view_ts"),
        matched.rel("click").attr("ts").named("click_ts"),
        matched.rel("purchase").attr("ts").named("purchase_ts"),
        matched.attr("last_matched_step_name"),
        matched.attr("last_matched_step_index"))
        .sort(col("user_id"))
        .run(s)
    }),

    // --- funnel (top_of_funnel as named total row) ---
    "q_funnel" -> ((s, dir) =>
      m(dir, "events")
        .withActivitySchema(col("user_id"), col("ts"), col("event_type"))
        .funnel(Seq[graft.model.StepSpec]("view", "click", "purchase"),
          topOfFunnel = "users")
        .run(s)),

    // --- funnel with time limit ---
    "q_funnel_time_limit" -> ((s, dir) =>
      m(dir, "events")
        .withActivitySchema(col("user_id"), col("ts"), col("event_type"))
        .funnel(Seq[graft.model.StepSpec]("view", "click", "purchase"),
          timeLimit = interval(7, "day"), topOfFunnel = "users")
        .run(s)),

    // --- funnel partitioned by start-event month ---
    "q_funnel_partition" -> ((s, dir) =>
      m(dir, "events")
        .withActivitySchema(col("user_id"), col("ts"), col("event_type"))
        .funnel(Seq[graft.model.StepSpec]("view", "click", "purchase"),
          partitionStartEvents = Seq(col("ts").byMonth.named("month")))
        .run(s)),

    // --- funnel_conversion_rate ---
    "q_funnel_rate" -> ((s, dir) =>
      m(dir, "events")
        .withActivitySchema(col("user_id"), col("ts"), col("event_type"))
        .funnelConversionRate(Seq[graft.model.StepSpec]("view", "click", "purchase"))
        .run(s)),
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
                CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
                CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
                CAST(sum(CAST(l_discount AS DECIMAL(18,9))) AS DOUBLE) / count(*) AS avg_disc,
                count(*) AS count_order
         FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2""",
    "q_agg_global" ->
      """SELECT count(*) AS n,
                CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total,
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
                CAST(sum(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
         FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey
         GROUP BY 1 ORDER BY 1""",
    "q_join_chain" ->
      """SELECT n.n_name AS nation_name, count(*) AS n
         FROM orders o
         JOIN customer c ON o.o_custkey = c.c_custkey
         LEFT JOIN nation n ON c.c_nationkey = n.n_nationkey
         WHERE c.c_acctbal > 9990.0
         GROUP BY 1 ORDER BY 1""",
    "q_sql_text" ->
      """SELECT s_nationkey, count(*) AS n,
                CAST(sum(CAST(s_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS bal
         FROM supplier WHERE s_acctbal > 5000
         GROUP BY 1 ORDER BY 1""",
    "q_cases" ->
      """SELECT CASE WHEN c_acctbal < 0.0 THEN 'negative'
                     WHEN c_acctbal < 5000.0 THEN 'low'
                     ELSE 'high' END AS bal_bucket, count(*) AS n
         FROM customer GROUP BY 1 ORDER BY 1""",
    "q_count_if" ->
      """SELECT o_orderpriority,
                CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_f,
                CAST(sum(CASE WHEN o_totalprice > 100000.0 THEN 1 ELSE 0 END) AS BIGINT) AS n_big,
                count(DISTINCT o_custkey) AS n_cust,
                count(o_orderkey) AS n
         FROM orders GROUP BY 1 ORDER BY 1""",
    "q_arith" ->
      """SELECT l_orderkey, l_linenumber,
                l_extendedprice * (1.0 - l_discount) AS net,
                l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax) AS gross,
                l_quantity + 1.0 AS qplus,
                CAST(floor(l_partkey / 100) AS BIGINT) AS bucket
         FROM lineitem WHERE l_orderkey <= 100
         ORDER BY l_orderkey, l_linenumber""",
    "q_in_values" ->
      """SELECT o_orderkey,
                CASE WHEN o_orderstatus = 'P' THEN NULL ELSE o_orderstatus END AS status_or_null
         FROM orders
         WHERE o_orderstatus = 'F' OR o_orderstatus = 'P'
         ORDER BY o_orderkey""",
    "q_in_model" ->
      """SELECT p_brand, count(*) AS n FROM part
         WHERE p_brand IN (
           SELECT p_brand FROM part GROUP BY 1
           ORDER BY count(*) DESC, p_brand LIMIT 3)
         GROUP BY 1 ORDER BY 1""",
    "q_bucket_other" ->
      """SELECT CASE WHEN p_brand IN ('Brand#11','Brand#22','Brand#33')
                     THEN p_brand ELSE 'Other' END AS brand_group,
                count(*) AS n,
                CAST(sum(CAST(p_retailprice AS DECIMAL(18,2))) AS DOUBLE) AS price_sum
         FROM part GROUP BY 1 ORDER BY 1""",
    "q_scalar_subquery" ->
      """SELECT count(*) AS n, min(o_totalprice) AS min_price
         FROM orders
         WHERE o_totalprice > (SELECT avg(o_totalprice) FROM orders)""",
    "q_exists" ->
      """SELECT r_regionkey, r_name FROM region
         WHERE EXISTS (SELECT 1 FROM orders WHERE o_totalprice > 400000.0)
         ORDER BY r_regionkey""",
    "q_like" ->
      """SELECT count(*) AS n FROM part
         WHERE p_type LIKE '%BRASS%' OR p_name LIKE '%green%'
            OR p_brand ILIKE 'brand#4%'""",
    "q_diff_seconds" ->
      """SELECT event_type,
                avg(floor(epoch(ts)) - floor(epoch(date_trunc('day', ts)))) AS avg_secs_in_day,
                count(*) AS n
         FROM events GROUP BY 1 ORDER BY 1""",
    "q_format_ts" ->
      """SELECT strftime(o_orderdate, '%Y-%m') AS ym,
                'Q' || CAST(quarter(o_orderdate) AS VARCHAR) || '/' ||
                  strftime(o_orderdate, '%Y') AS quarter_label,
                count(*) AS n
         FROM orders GROUP BY 1, 2 ORDER BY 1""",
    "q_temporal_preds" ->
      """SELECT
           CAST(sum(CASE WHEN ts >= TIMESTAMP '2024-01-15' AND ts < TIMESTAMP '2024-01-16' THEN 1 ELSE 0 END) AS BIGINT) AS n_today,
           CAST(sum(CASE WHEN ts >= TIMESTAMP '2024-01-14' AND ts < TIMESTAMP '2024-01-15' THEN 1 ELSE 0 END) AS BIGINT) AS n_yesterday,
           CAST(sum(CASE WHEN ts >= TIMESTAMP '2024-01-14' AND ts < TIMESTAMP '2024-01-21' THEN 1 ELSE 0 END) AS BIGINT) AS n_this_week,
           CAST(sum(CASE WHEN ts >= TIMESTAMP '2024-01-07' AND ts < TIMESTAMP '2024-01-14' THEN 1 ELSE 0 END) AS BIGINT) AS n_last_week,
           CAST(sum(CASE WHEN ts >= TIMESTAMP '2024-01-01' AND ts < TIMESTAMP '2024-02-01' THEN 1 ELSE 0 END) AS BIGINT) AS n_this_month,
           CAST(sum(CASE WHEN ts >= TIMESTAMP '2024-01-01' AND ts < TIMESTAMP '2024-04-01' THEN 1 ELSE 0 END) AS BIGINT) AS n_this_quarter,
           CAST(sum(CASE WHEN ts >= TIMESTAMP '2024-01-01' AND ts < TIMESTAMP '2025-01-01' THEN 1 ELSE 0 END) AS BIGINT) AS n_this_year
         FROM events""",
    "q_interval" ->
      """SELECT count(*) AS n
         FROM lineitem l LEFT JOIN orders o ON l.l_orderkey = o.o_orderkey
         WHERE l.l_shipdate <= o.o_orderdate + INTERVAL 90 DAY""",
    "q_cast" ->
      """SELECT l_orderkey, l_linenumber,
                CAST(l_quantity AS BIGINT) AS qty_int,
                CAST(l_linenumber AS DOUBLE) AS ln_dbl
         FROM lineitem WHERE l_orderkey <= 500
         ORDER BY l_orderkey, l_linenumber""",
    "q_fold" ->
      """SELECT o_orderpriority, status, n FROM (
           SELECT o_orderpriority, 'n_open' AS status,
                  CAST(sum(CASE WHEN o_orderstatus='O' THEN 1 ELSE 0 END) AS BIGINT) AS n
           FROM orders GROUP BY 1
           UNION ALL
           SELECT o_orderpriority, 'n_fulfilled',
                  CAST(sum(CASE WHEN o_orderstatus='F' THEN 1 ELSE 0 END) AS BIGINT)
           FROM orders GROUP BY 1
           UNION ALL
           SELECT o_orderpriority, 'n_pending',
                  CAST(sum(CASE WHEN o_orderstatus='P' THEN 1 ELSE 0 END) AS BIGINT)
           FROM orders GROUP BY 1
         ) t ORDER BY o_orderpriority, status""",
    "q_raw_sql" ->
      """SELECT substring(c_name, 1, 9) AS name_prefix, count(*) AS n
         FROM customer GROUP BY 1 ORDER BY 1 LIMIT 20""",
    "q_match_steps" -> (FunnelCtes +
      """SELECT u.user_id, s0.t0 AS view_ts, s1.t1 AS click_ts, s2.t2 AS purchase_ts,
           CASE WHEN s2.t2 IS NOT NULL THEN 'purchase'
                WHEN s1.t1 IS NOT NULL THEN 'click'
                WHEN s0.t0 IS NOT NULL THEN 'view' END AS last_matched_step_name,
           CAST(CASE WHEN s2.t2 IS NOT NULL THEN 2
                WHEN s1.t1 IS NOT NULL THEN 1
                WHEN s0.t0 IS NOT NULL THEN 0 END AS BIGINT) AS last_matched_step_index
         FROM (SELECT DISTINCT user_id FROM events) u
         LEFT JOIN s0 USING (user_id) LEFT JOIN s1 USING (user_id)
         LEFT JOIN s2 USING (user_id)
         ORDER BY user_id"""),
    "q_funnel" -> (FunnelCtes +
      """SELECT step, entities FROM (
           SELECT 'users' AS step, count(DISTINCT user_id) AS entities, 0 AS si FROM events
           UNION ALL SELECT 'view', (SELECT count(*) FROM s0), 1
           UNION ALL SELECT 'click', (SELECT count(*) FROM s1), 2
           UNION ALL SELECT 'purchase', (SELECT count(*) FROM s2), 3
         ) t ORDER BY si"""),
    "q_funnel_time_limit" -> (FunnelCtes +
      """, j AS (
           SELECT s0.user_id, s0.t0,
                  CASE WHEN epoch(s1.t1) - epoch(s0.t0) < 604800 THEN s1.t1 END AS t1,
                  CASE WHEN epoch(s2.t2) - epoch(s0.t0) < 604800 THEN s2.t2 END AS t2
           FROM s0 LEFT JOIN s1 USING (user_id) LEFT JOIN s2 USING (user_id))
         SELECT step, entities FROM (
           SELECT 'users' AS step, count(DISTINCT user_id) AS entities, 0 AS si FROM events
           UNION ALL SELECT 'view', (SELECT count(t0) FROM j), 1
           UNION ALL SELECT 'click', (SELECT count(t1) FROM j), 2
           UNION ALL SELECT 'purchase', (SELECT count(t2) FROM j), 3
         ) t ORDER BY si"""),
    "q_funnel_partition" ->
      """WITH p0 AS (
           SELECT user_id, date_trunc('month', ts) AS month, min(ts) AS t0
           FROM events WHERE event_type = 'view' GROUP BY 1, 2),
         c1 AS (
           SELECT p0.user_id, p0.month, min(e.ts) AS t1
           FROM events e JOIN p0 ON e.user_id = p0.user_id AND e.ts > p0.t0
           WHERE e.event_type = 'click' GROUP BY 1, 2),
         c2 AS (
           SELECT c1.user_id, c1.month, min(e.ts) AS t2
           FROM events e JOIN c1 ON e.user_id = c1.user_id AND e.ts > c1.t1
           WHERE e.event_type = 'purchase' GROUP BY 1, 2),
         sel AS (
           SELECT p0.month, p0.t0, c1.t1, c2.t2
           FROM p0 LEFT JOIN c1 USING (user_id, month)
                   LEFT JOIN c2 USING (user_id, month))
         SELECT month, step, entities FROM (
           SELECT month, 'view' AS step, count(t0) AS entities, 0 AS si FROM sel GROUP BY 1
           UNION ALL SELECT month, 'click', count(t1), 1 FROM sel GROUP BY 1
           UNION ALL SELECT month, 'purchase', count(t2), 2 FROM sel GROUP BY 1
         ) t ORDER BY month, si""",
    "q_funnel_rate" -> (FunnelCtes +
      """, j AS (
           SELECT s0.user_id, s0.t0, s1.t1, s2.t2
           FROM s0 LEFT JOIN s1 USING (user_id) LEFT JOIN s2 USING (user_id))
         SELECT count(t2) / count(t0) AS rate,
                count(t0) AS startedCount,
                count(t2) AS convertedCount,
                avg(floor(epoch(t2)) - floor(epoch(t0))) AS avgSecondsToConvert
         FROM j"""),
  )

  /** Shared greedy first-after step CTEs for the events funnel oracles:
    * step k = first matching event strictly after step k-1's match
    * ((user_id, ts) is unique in the events table, so ts-ordering equals
    * event-index ordering). */
  private val FunnelCtes: String =
    """WITH s0 AS (
         SELECT user_id, min(ts) AS t0 FROM events
         WHERE event_type = 'view' GROUP BY 1),
       s1 AS (
         SELECT e.user_id, min(e.ts) AS t1
         FROM events e JOIN s0 ON e.user_id = s0.user_id AND e.ts > s0.t0
         WHERE e.event_type = 'click' GROUP BY 1),
       s2 AS (
         SELECT e.user_id, min(e.ts) AS t2
         FROM events e JOIN s1 ON e.user_id = s1.user_id AND e.ts > s1.t1
         WHERE e.event_type = 'purchase' GROUP BY 1)
    """
}
