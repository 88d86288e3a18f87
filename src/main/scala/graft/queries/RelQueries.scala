package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Classic relational queries over the larger TPC-H-ish tables — the
  * scan/filter/broadcast-join/aggregate fundamentals (SURVEY §2.3-2.5,
  * §2.7) exercised at the sf's largest table (lineitem).
  *
  * `l_shipdate`/`o_orderdate` are micros-precision TIMESTAMP_NTZ (unlike
  * `events.ts`, which [[graft.queries.CdcQueries]] normalizes to epoch
  * NANOS); both engines compare against the same timestamp literal.
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

    "rel_sql_correlated" -> ((s, dir) => {
      // the SQL front door under the gate: a correlated scalar subquery,
      // which Catalyst decorrelates into an aggregate + join — the plan a
      // 100 TB run needs (a per-row subplan would be quadratic). Also
      // exercises spark.sql + temp views as the user-facing API surface.
      t(s, dir, "part").createOrReplaceTempView("part")
      s.sql("""SELECT p_brand, p_partkey, p_retailprice FROM part
              |WHERE p_retailprice = (SELECT max(p2.p_retailprice)
              |                       FROM part p2 WHERE p2.p_brand = part.p_brand)
              |""".stripMargin)
    }),

    "rel_salted_join" -> ((s, dir) => {
      // skew-mitigated join under the correctness gate: the salted
      // replicate-and-spread scheme must be row-for-row equivalent to the
      // plain join (the oracle IS the plain join) — salting changes the
      // reducer layout, never the result. Tiebreaker = l_partkey (per-row
      // variety), salts=8 spreads each hot order key across 8 reducers.
      val li = scanParallel(t(s, dir, "lineitem"), s)
        .select(col("l_orderkey").as("o_orderkey"), col("l_partkey"),
          col("l_extendedprice"), col("l_discount"))
      val orders = t(s, dir, "orders").select("o_orderkey", "o_orderpriority")
      graft.ops.SkewUtil.saltedJoin(li, orders, "o_orderkey", "l_partkey", salts = 8)
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n"),
          expr("CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * " +
            "(CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)")
            .as("revenue"))
    }),

    "rel_pivot" -> ((s, dir) =>
      // wide reshaping in ONE aggregation pass: pivot with an explicit value
      // list (no extra distinct-values job) compiles to a single
      // partial+final agg with per-value filters — never a per-value scan.
      // Absent cells surface as 0, matching the SQL FILTER formulation.
      t(s, dir, "orders")
        .groupBy(year(col("o_orderdate")).as("o_year"))
        .pivot("o_orderstatus", Seq("F", "O", "P"))
        .agg(count(lit(1)))
        .select(col("o_year"), coalesce(col("F"), lit(0L)).as("n_f"),
          coalesce(col("O"), lit(0L)).as("n_o"), coalesce(col("P"), lit(0L)).as("n_p"))),

    "rel_profile" -> ((s, dir) => {
      // data-quality profile: per-column null and exact-distinct counts in
      // one pass (Catalyst plans the multi-distinct via Expand — one scan,
      // #cols-way row expansion; the approximate version of this profile is
      // `sketch_profile`), unpivoted to a row per column via stack()
      val c = t(s, dir, "customer")
      val cols = c.columns.toSeq
      val aggs = cols.flatMap(n => Seq(
        sum(when(col(n).isNull, 1L).otherwise(0L)).as(s"${n}_nulls"),
        countDistinct(col(n)).as(s"${n}_distinct")))
      val one = c.agg(aggs.head, aggs.tail: _*)
      val stackArgs = cols.map(n => s"'$n', ${n}_nulls, ${n}_distinct").mkString(", ")
      one.select(expr(
        s"stack(${cols.size}, $stackArgs) AS (col_name, n_nulls, n_distinct)"))
    }),

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

    "rel_sql_correlated" ->
      """SELECT p_brand, p_partkey, p_retailprice FROM part
        |WHERE p_retailprice = (SELECT max(p2.p_retailprice)
        |                       FROM part p2 WHERE p2.p_brand = part.p_brand)""".stripMargin,

    "rel_salted_join" ->
      """SELECT o_orderpriority, count(*) AS n,
        |       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY 1""".stripMargin,

    "rel_pivot" ->
      """SELECT year(o_orderdate) AS o_year,
        |       count(*) FILTER (o_orderstatus = 'F') AS n_f,
        |       count(*) FILTER (o_orderstatus = 'O') AS n_o,
        |       count(*) FILTER (o_orderstatus = 'P') AS n_p
        |FROM orders GROUP BY 1""".stripMargin,

    "rel_profile" ->
      """SELECT 'c_custkey' AS col_name,
        |       count(*) - count(c_custkey) AS n_nulls,
        |       count(DISTINCT c_custkey) AS n_distinct FROM customer
        |UNION ALL
        |SELECT 'c_name', count(*) - count(c_name), count(DISTINCT c_name) FROM customer
        |UNION ALL
        |SELECT 'c_nationkey', count(*) - count(c_nationkey), count(DISTINCT c_nationkey) FROM customer
        |UNION ALL
        |SELECT 'c_acctbal', count(*) - count(c_acctbal), count(DISTINCT c_acctbal) FROM customer
        |UNION ALL
        |SELECT 'c_mktsegment', count(*) - count(c_mktsegment), count(DISTINCT c_mktsegment) FROM customer""".stripMargin,

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
