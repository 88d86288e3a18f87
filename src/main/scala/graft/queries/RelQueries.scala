package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Classic relational queries over the larger TPC-H-ish tables — the
  * scan/filter/broadcast-join/aggregate fundamentals (SURVEY §2.3-2.5,
  * §2.7) exercised at the sf's largest table (lineitem).
  *
  * `l_shipdate`/`o_orderdate` are micros-precision TIMESTAMP_NTZ (unlike
  * `events.ts`, which is NANOS); both engines compare against the same
  * timestamp literal.
  */
object RelQueries {
  import QueryUtil.scanParallel

  private def t(s: SparkSession, dir: String, name: String) =
    s.read.parquet(s"$dir/$name.parquet")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "rel_pricing_summary" -> ((s, dir) =>
      // Q1-shape: one big scan, predicate pushed to parquet, partial+final
      // hash aggregation on a low-cardinality key. Money sums run in EXACT
      // decimal (order-independent — double sums of 1e9-magnitude groups
      // drift wider than any rounding boundary) and surface as double.
      scanParallel(t(s, dir, "lineitem"), s)
        .filter(expr("l_shipdate <= TIMESTAMP_NTZ '1998-09-02 00:00:00'"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          expr("CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)").as("sum_qty"),
          expr("CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)")
            .as("sum_base_price"),
          expr("CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * " +
            "(CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)")
            .as("sum_disc_price"),
          count(lit(1)).as("count_order"))),

    "rel_top_customers" -> ((s, dir) => {
      // Q3-shape: big fact joined to two smaller tables (Catalyst/AQE picks
      // broadcast for the dimension side), revenue top-10
      val li = scanParallel(t(s, dir, "lineitem"), s)
      val orders = t(s, dir, "orders")
      val cust = t(s, dir, "customer")
      li.join(orders, col("l_orderkey") === col("o_orderkey"))
        .join(cust, col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_custkey"), col("c_name"))
        .agg(expr("CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * " +
          "(CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)")
          .as("revenue"))
        .orderBy(col("revenue").desc, col("c_custkey").asc)
        .limit(10)
    }),

    "rel_region_supplier_stats" -> ((s, dir) =>
      // star-join over broadcastable dims: supplier -> nation -> region
      t(s, dir, "supplier")
        .join(broadcast(t(s, dir, "nation")), col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(t(s, dir, "region")), col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("r_name"))
        .agg(count(lit(1)).as("n_suppliers"),
          round(sum(col("s_acctbal")), 2).as("total_acctbal"))),

    "rel_rollup_pricing" -> ((s, dir) =>
      // multi-level summary via ROLLUP: per (flag, status), per flag, and
      // grand total in ONE aggregation pass (Catalyst expands the grouping
      // sets; exact decimal sums as in rel_pricing_summary)
      scanParallel(t(s, dir, "lineitem"), s)
        .filter(expr("l_shipdate <= TIMESTAMP_NTZ '1998-09-02 00:00:00'"))
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(
          expr("CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)").as("sum_qty"),
          count(lit(1)).as("count_order"))),

    "rel_nation_top_suppliers" -> ((s, dir) => {
      // per-group top-k via ranking window: fact scan -> broadcast dim join
      // -> supplier-grain aggregate (map-side partials) -> a window over the
      // ALREADY-AGGREGATED supplier rows. The window input is |suppliers|,
      // not |lineitem| — ranking after aggregation is what keeps the sort
      // state bounded at 100 TB.
      import org.apache.spark.sql.expressions.Window
      val li = scanParallel(t(s, dir, "lineitem"), s)
      val rev = li.join(broadcast(t(s, dir, "supplier")),
          col("l_suppkey") === col("s_suppkey"))
        .groupBy(col("s_nationkey"), col("s_suppkey"), col("s_name"))
        .agg(expr("CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * " +
          "(CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)")
          .as("revenue"))
      val w = Window.partitionBy(col("s_nationkey"))
        .orderBy(col("revenue").desc, col("s_suppkey").asc)
      rev.withColumn("rnk", row_number().over(w).cast("long"))
        .filter(col("rnk") <= 3)
        .join(broadcast(t(s, dir, "nation")), col("s_nationkey") === col("n_nationkey"))
        .select(col("n_name"), col("s_suppkey"), col("s_name"),
          col("revenue"), col("rnk"))
    }))

  val oracles: Map[String, String] = Map(
    "rel_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        |       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
        |       count(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        |GROUP BY 1, 2""".stripMargin,

    "rel_top_customers" ->
      """SELECT c_custkey, c_name,
        |       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |GROUP BY 1, 2
        |ORDER BY revenue DESC, c_custkey ASC
        |LIMIT 10""".stripMargin,

    "rel_region_supplier_stats" ->
      """SELECT r_name, count(*) AS n_suppliers,
        |       round(sum(s_acctbal), 2) AS total_acctbal
        |FROM supplier
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY 1""".stripMargin,

    "rel_rollup_pricing" ->
      """SELECT l_returnflag, l_linestatus,
        |       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |       count(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        |GROUP BY ROLLUP (l_returnflag, l_linestatus)""".stripMargin,

    "rel_nation_top_suppliers" ->
      """WITH rev AS (
        |  SELECT s_nationkey, s_suppkey, s_name,
        |         CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
        |  FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
        |  GROUP BY 1, 2, 3
        |)
        |SELECT n_name, s_suppkey, s_name, revenue,
        |       CAST(row_number() OVER (PARTITION BY s_nationkey
        |                               ORDER BY revenue DESC, s_suppkey ASC) AS BIGINT) AS rnk
        |FROM rev JOIN nation ON s_nationkey = n_nationkey
        |QUALIFY rnk <= 3""".stripMargin)
}
