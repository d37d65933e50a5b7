package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Relational operator surface (SURVEY.md §2.2-§2.5) re-expressed as
  * declarative DataFrame plans, mirroring the reference's DataSet API
  * coverage (`/root/reference` flink-java DataSet.java): projection,
  * filter, distinct, union, grouped/global aggregation, all join
  * flavors, cross, min/maxBy, first-n, sort/limit.
  *
  * Scale notes embedded per query. Every query takes (spark, sfDir)
  * and returns a DataFrame whose schema matches the paired DuckDB
  * oracle in [[graft.SparkEntry.oracleSql]] column-for-column.
  * Outputs are deterministically ordered; aggregated doubles are
  * rounded to 2 decimals (the reference's own 0.01 tolerance policy,
  * TestMatrixMultiplication.java:88) so hash comparison is stable
  * across summation orders.
  */
object Relational {

  /** TPC-H Q1 analogue (reference example relational/TPCHQuery3.java
    * family): scan → filter (pushed to parquet) → hash aggregate with
    * partial (map-side) agg → tiny sorted output. At 100 TB: single
    * shuffle on (returnflag, linestatus), ~6 groups — partial agg
    * collapses virtually all traffic.
    */
  def q01Pricing(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") <= lit("1997-09-02").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        round(sum(col("l_quantity")), 2).as("sum_qty"),
        round(sum(col("l_extendedprice")), 2).as("sum_base_price"),
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("sum_disc_price"),
        round(avg(col("l_quantity")), 2).as("avg_qty"),
        round(avg(col("l_discount")), 4).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))

  val q01Sql: String =
    """SELECT l_returnflag, l_linestatus,
      |  round(sum(l_quantity), 2)                          AS sum_qty,
      |  round(sum(l_extendedprice), 2)                     AS sum_base_price,
      |  round(sum(l_extendedprice * (1 - l_discount)), 2)  AS sum_disc_price,
      |  round(avg(l_quantity), 2)                          AS avg_qty,
      |  round(avg(l_discount), 4)                          AS avg_disc,
      |  count(*)                                           AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '1997-09-02 00:00:00'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  /** Global (ungrouped) aggregation — the reference's AllReduce path
    * (AllReduceDriver.java, IoT.java:62-80 global MIN/MAX/SUM/AVG).
    * Spark computes this as partial agg per partition + single-row
    * final merge: no shuffle of data, only of 1-row partials.
    */
  def q02GlobalAgg(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir).agg(
      round(min(col("value")), 2).as("min_v"),
      round(max(col("value")), 2).as("max_v"),
      round(sum(col("value")), 2).as("sum_v"),
      round(avg(col("value")), 2).as("avg_v"),
      count(lit(1)).as("cnt"))

  val q02Sql: String =
    """SELECT round(min(value),2) AS min_v, round(max(value),2) AS max_v,
      |  round(sum(value),2) AS sum_v, round(avg(value),2) AS avg_v,
      |  count(*) AS cnt
      |FROM events""".stripMargin

  /** TPC-H Q3 analogue (reference relational/TPCHQuery3.java:108-163):
    * 3-way join with pre-join filters. customer is small → Catalyst
    * broadcasts it; orders⋈lineitem shuffles on orderkey. At 100 TB,
    * AQE turns the post-filter orders side into a broadcast when it
    * fits; otherwise sort-merge with both sides partitioned once.
    */
  def q03Shipping(spark: SparkSession, dir: String): DataFrame = {
    val cutoff = lit("1995-03-15").cast("timestamp")
    val cust = Tables.customer(spark, dir).filter(col("c_mktsegment") === "BUILDING")
    val ord = Tables.orders(spark, dir).filter(col("o_orderdate") < cutoff)
    val li = Tables.lineitem(spark, dir).filter(col("l_shipdate") > cutoff)
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"))
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"))
      .select(col("l_orderkey"),
        round(col("revenue"), 2).as("revenue"),
        col("o_orderdate").cast("timestamp").cast("long").as("o_orderdate_epoch"))
      .orderBy(desc("revenue"), col("l_orderkey"))
      .limit(10)
  }

  val q03Sql: String =
    """SELECT l_orderkey,
      |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
      |  CAST(epoch(o_orderdate) AS BIGINT) AS o_orderdate_epoch
      |FROM customer, orders, lineitem
      |WHERE c_mktsegment = 'BUILDING'
      |  AND c_custkey = o_custkey AND l_orderkey = o_orderkey
      |  AND o_orderdate < TIMESTAMP '1995-03-15 00:00:00'
      |  AND l_shipdate  > TIMESTAMP '1995-03-15 00:00:00'
      |GROUP BY l_orderkey, o_orderdate
      |ORDER BY revenue DESC, l_orderkey
      |LIMIT 10""".stripMargin

  /** Projection + filter (MapDriver / FilterDescriptor surface,
    * DataSet.java:213,306): both the predicate and the 3-column
    * read-schema reach the parquet scan (PushedFilters / ReadSchema),
    * so at 100 TB only matching row-groups and 3 columns are read.
    */
  def q04FilterProject(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .filter(col("l_quantity") >= 45 && col("l_discount") > 0.05)
      .select(col("l_orderkey"), col("l_linenumber"),
        (col("l_extendedprice") * (lit(1) - col("l_discount"))).as("net_price"))
      .orderBy(col("l_orderkey"), col("l_linenumber"))

  // net_price left unrounded on purpose: a single IEEE multiply is
  // bit-identical across engines, while round() half-way tie-breaking
  // is not (prices land exactly on .005 boundaries).
  val q04Sql: String =
    """SELECT l_orderkey, l_linenumber,
      |  l_extendedprice * (1 - l_discount) AS net_price
      |FROM lineitem
      |WHERE l_quantity >= 45 AND l_discount > 0.05
      |ORDER BY l_orderkey, l_linenumber""".stripMargin

  /** distinct (DataSet.java:631): shuffle-dedup on the projected key.
    * At scale: partial distinct per partition before shuffle (Spark
    * plans HashAggregate(partial)→Exchange→HashAggregate(final)).
    */
  def q05Distinct(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir)
      .select(col("c_mktsegment"), col("c_nationkey"))
      .distinct()
      .orderBy(col("c_mktsegment"), col("c_nationkey"))

  val q05Sql: String =
    """SELECT DISTINCT c_mktsegment, c_nationkey FROM customer
      |ORDER BY c_mktsegment, c_nationkey""".stripMargin

  /** union (DataSet.java:1276 — bag union, no dedup) of two filtered
    * projections, then aggregate. Union is a zero-shuffle operator in
    * Spark; partitions concatenate.
    */
  def q06Union(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    val hi = o.filter(col("o_totalprice") > 200000)
      .select(col("o_custkey"), lit("hi").as("band"), col("o_totalprice").as("price"))
    val lo = o.filter(col("o_totalprice") < 10000)
      .select(col("o_custkey"), lit("lo").as("band"), col("o_totalprice").as("price"))
    hi.union(lo)
      .groupBy(col("band"))
      .agg(count(lit(1)).as("n"), round(sum(col("price")), 2).as("total"))
      .orderBy(col("band"))
  }

  val q06Sql: String =
    """SELECT band, count(*) AS n, round(sum(price),2) AS total FROM (
      |  SELECT o_custkey, 'hi' AS band, o_totalprice AS price FROM orders WHERE o_totalprice > 200000
      |  UNION ALL
      |  SELECT o_custkey, 'lo' AS band, o_totalprice AS price FROM orders WHERE o_totalprice < 10000
      |) GROUP BY band ORDER BY band""".stripMargin

  /** Outer join (DataSet.java:876-1006): customers with their order
    * stats, keeping order-less customers (NULL-filled). Broadcast the
    * aggregated per-customer stats if small; at 100 TB both sides
    * shuffle on custkey once.
    */
  def q07OuterJoin(spark: SparkSession, dir: String): DataFrame = {
    val ord = Tables.orders(spark, dir)
      .groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("n_orders"), round(sum(col("o_totalprice")), 2).as("spend"))
    Tables.customer(spark, dir)
      .join(ord, col("c_custkey") === col("o_custkey"), "left_outer")
      .select(col("c_custkey"),
        coalesce(col("n_orders"), lit(0L)).as("n_orders"),
        coalesce(col("spend"), lit(0.0)).as("spend"))
      .orderBy(col("c_custkey"))
  }

  val q07Sql: String =
    """SELECT c_custkey,
      |  coalesce(n_orders, 0) AS n_orders,
      |  coalesce(spend, 0.0)  AS spend
      |FROM customer LEFT JOIN (
      |  SELECT o_custkey, count(*) AS n_orders, round(sum(o_totalprice),2) AS spend
      |  FROM orders GROUP BY o_custkey
      |) ON c_custkey = o_custkey
      |ORDER BY c_custkey""".stripMargin

  /** Semi + anti join (absent from the reference DataSet API, present
    * in its Table layer — SURVEY §2.4): customers WITH at least one
    * high-value order (semi) and nations with NO supplier (anti).
    * left_semi/left_anti avoid materializing the right side's columns.
    */
  def q08SemiJoin(spark: SparkSession, dir: String): DataFrame = {
    val big = Tables.orders(spark, dir).filter(col("o_totalprice") > 150000)
    Tables.customer(spark, dir)
      .join(big, col("c_custkey") === col("o_custkey"), "left_semi")
      .select(col("c_custkey"), col("c_mktsegment"))
      .orderBy(col("c_custkey"))
  }

  val q08Sql: String =
    """SELECT c_custkey, c_mktsegment FROM customer
      |WHERE EXISTS (SELECT 1 FROM orders
      |              WHERE o_custkey = c_custkey AND o_totalprice > 150000)
      |ORDER BY c_custkey""".stripMargin

  def q09AntiJoin(spark: SparkSession, dir: String): DataFrame = {
    val bulkSales = Tables.lineitem(spark, dir)
      .filter(col("l_quantity") >= 45)
    Tables.part(spark, dir)
      .join(bulkSales, col("p_partkey") === col("l_partkey"), "left_anti")
      .select(col("p_partkey"), col("p_name"))
      .orderBy(col("p_partkey"))
  }

  val q09Sql: String =
    """SELECT p_partkey, p_name FROM part
      |WHERE NOT EXISTS (SELECT 1 FROM lineitem
      |                  WHERE l_partkey = p_partkey
      |                    AND l_quantity >= 45)
      |ORDER BY p_partkey""".stripMargin

  /** Cross join (DataSet.java:1091 cross/crossWithTiny/crossWithHuge):
    * region × nation — tiny×small, planned as BroadcastNestedLoopJoin.
    * Never cross big×big; the reference's tiny/huge hints map to
    * Spark's broadcast side selection.
    */
  def q10Cross(spark: SparkSession, dir: String): DataFrame =
    Tables.region(spark, dir).crossJoin(Tables.nation(spark, dir))
      .select(col("r_regionkey"), col("n_nationkey"),
        (col("n_regionkey") === col("r_regionkey")).cast("int").as("same_region"))
      .orderBy(col("r_regionkey"), col("n_nationkey"))

  val q10Sql: String =
    """SELECT r_regionkey, n_nationkey,
      |  CAST(n_regionkey = r_regionkey AS INT) AS same_region
      |FROM region CROSS JOIN nation
      |ORDER BY r_regionkey, n_nationkey""".stripMargin

  /** min_by/max_by element selection (UnsortedGrouping.java:231-253
    * minBy/maxBy): per nation, the supplier with the highest account
    * balance. Single hash-agg, no window/sort needed.
    */
  def q11MaxBy(spark: SparkSession, dir: String): DataFrame =
    Tables.supplier(spark, dir)
      .groupBy(col("s_nationkey"))
      .agg(max_by(col("s_name"), col("s_acctbal")).as("best_supp"),
        round(max(col("s_acctbal")), 2).as("best_bal"),
        min_by(col("s_name"), col("s_acctbal")).as("worst_supp"))
      .orderBy(col("s_nationkey"))

  val q11Sql: String =
    """SELECT s_nationkey,
      |  max_by(s_name, s_acctbal) AS best_supp,
      |  round(max(s_acctbal), 2)  AS best_bal,
      |  min_by(s_name, s_acctbal) AS worst_supp
      |FROM supplier GROUP BY s_nationkey
      |ORDER BY s_nationkey""".stripMargin

  /** first-n per group (UnsortedGrouping.java:212 first(n) after
    * sortGroup): top-3 orders per customer by price via window
    * row_number — one shuffle on the partition key, ranking streams
    * within each partition.
    */
  def q12FirstN(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(desc("o_totalprice"), col("o_orderkey"))
    Tables.orders(spark, dir)
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 3)
      .select(col("o_custkey"), col("rk"), col("o_orderkey"), col("o_totalprice"))
      .orderBy(col("o_custkey"), col("rk"))
  }

  val q12Sql: String =
    """SELECT o_custkey, rk, o_orderkey, o_totalprice FROM (
      |  SELECT o_custkey, o_orderkey, o_totalprice,
      |    row_number() OVER (PARTITION BY o_custkey
      |                       ORDER BY o_totalprice DESC, o_orderkey) AS rk
      |  FROM orders)
      |WHERE rk <= 3
      |ORDER BY o_custkey, rk""".stripMargin

  /** Global sort + limit (sortPartition/first — SURVEY §2.5; Spark's
    * orderBy is a superset of Flink's partition-local sort). TakeOrdered
    * at the physical layer: no full global sort materialized for the
    * limit.
    */
  def q13TopK(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .orderBy(desc("l_extendedprice"), col("l_orderkey"), col("l_linenumber"))
      .select(col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"))
      .limit(25)

  val q13Sql: String =
    """SELECT l_orderkey, l_linenumber, l_extendedprice
      |FROM lineitem
      |ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber
      |LIMIT 25""".stripMargin

  /** TPC-H Q10 analogue (reference relational/TPCHQuery10.java):
    * 4-way join + group agg, returned-items revenue per customer and
    * nation. nation broadcast; lineitem filter pushed down.
    */
  def q14Returns(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir).filter(col("l_returnflag") === "R")
    li.join(Tables.orders(spark, dir), col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(spark, dir), col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(spark, dir)), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("c_custkey"), col("c_name"), col("n_name"))
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"))
      .orderBy(desc("revenue"), col("c_custkey"))
      .limit(20)
  }

  val q14Sql: String =
    """SELECT c_custkey, c_name, n_name,
      |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
      |FROM lineitem, orders, customer, nation
      |WHERE l_returnflag = 'R' AND l_orderkey = o_orderkey
      |  AND o_custkey = c_custkey AND c_nationkey = n_nationkey
      |GROUP BY c_custkey, c_name, n_name
      |ORDER BY revenue DESC, c_custkey
      |LIMIT 20""".stripMargin

  /** TPC-H Q5 analogue: 5-way join through the region→nation→
    * customer/supplier star with local-supplier condition. nation and
    * region broadcast (tiny dims); customer/orders/lineitem shuffle
    * on their join keys once each; AQE may collapse further.
    */
  def q44LocalSupplier(spark: SparkSession, dir: String): DataFrame = {
    val nat = Tables.nation(spark, dir)
    val reg = Tables.region(spark, dir).filter(col("r_name") === "ASIA")
    nat.join(broadcast(reg), col("n_regionkey") === col("r_regionkey"))
      .join(Tables.customer(spark, dir), col("c_nationkey") === col("n_nationkey"))
      .join(Tables.orders(spark, dir), col("o_custkey") === col("c_custkey"))
      .join(Tables.lineitem(spark, dir), col("l_orderkey") === col("o_orderkey"))
      .join(Tables.supplier(spark, dir),
        col("l_suppkey") === col("s_suppkey") && col("s_nationkey") === col("c_nationkey"))
      .groupBy(col("n_name"))
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy(desc("revenue"), col("n_name"))
  }

  val q44Sql: String =
    """SELECT n_name,
      |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
      |  count(*) AS n_items
      |FROM region, nation, customer, orders, lineitem, supplier
      |WHERE r_name = 'ASIA' AND n_regionkey = r_regionkey
      |  AND c_nationkey = n_nationkey AND o_custkey = c_custkey
      |  AND l_orderkey = o_orderkey AND l_suppkey = s_suppkey
      |  AND s_nationkey = c_nationkey
      |GROUP BY n_name
      |ORDER BY revenue DESC, n_name""".stripMargin

  /** TPC-H Q6 analogue (forecast-revenue): pure scan-filter-agg — the
    * predicate triple reaches the parquet row-group stats, so at
    * 100 TB only qualifying row groups are read at all; no shuffle
    * beyond the single-row partial merge.
    */
  def q45ForecastRevenue(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1997-01-01").cast("timestamp") &&
        col("l_discount") >= 0.03 && col("l_discount") <= 0.05 &&
        col("l_quantity") < 24)
      .agg(round(sum(col("l_extendedprice") * col("l_discount")), 2).as("revenue"),
        count(lit(1)).as("n_items"))

  val q45Sql: String =
    """SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue,
      |  count(*) AS n_items
      |FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      |  AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
      |  AND l_discount BETWEEN 0.03 AND 0.05 AND l_quantity < 24""".stripMargin

  /** Top-3 order prices per customer through the engine's custom
    * physical operator ([[graft.plans.TopKPerKey]]: partial heaps →
    * exchange → final heaps, shuffling ≤ k rows per partition-key
    * instead of every row like the window-rank form in q12). Output
    * projects (key, value) only — the retained value multiset is
    * exact regardless of boundary-tie row identity, so it hash-checks
    * against the window-rank oracle.
    */
  def q46TopKCustom(spark: SparkSession, dir: String): DataFrame =
    graft.plans.TopK.topKPerKey(Tables.orders(spark, dir), 3,
        col("o_totalprice"), col("o_custkey"))
      .select(col("o_custkey"), col("o_totalprice"))
      .orderBy(col("o_custkey"), desc("o_totalprice"))

  val q46Sql: String =
    """SELECT o_custkey, o_totalprice FROM (
      |  SELECT o_custkey, o_totalprice,
      |    row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC) AS rk
      |  FROM orders)
      |WHERE rk <= 3
      |ORDER BY o_custkey, o_totalprice DESC""".stripMargin

  /** Rollup (multi-level aggregate in one pass — absent from the
    * reference DataSet API, SURVEY §2.3; Spark computes all grouping
    * sets in a single shuffle via an expand node). */
  def q47Rollup(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(round(sum(col("l_quantity")), 2).as("sum_qty"),
        count(lit(1)).as("n"),
        grouping_id().as("gid"))
      .orderBy(col("gid"), col("l_returnflag"), col("l_linestatus"))

  val q47Sql: String =
    """SELECT l_returnflag, l_linestatus,
      |  round(sum(l_quantity), 2) AS sum_qty,
      |  count(*) AS n,
      |  GROUPING(l_returnflag, l_linestatus) AS gid
      |FROM lineitem
      |GROUP BY ROLLUP (l_returnflag, l_linestatus)
      |ORDER BY gid, l_returnflag, l_linestatus""".stripMargin

  /** Analytic window functions (lag + running sum — the reference has
    * no window-function layer at all; its closest shape is sorted
    * group iteration). One shuffle on the partition key; rows stream
    * through the frame in orderkey order.
    */
  def q48WindowAnalytics(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_orderkey"))
    Tables.orders(spark, dir)
      .filter(col("o_custkey") < 100)
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
        coalesce(lag(col("o_totalprice"), 1).over(w), lit(0.0)).as("prev_price"),
        round(sum(col("o_totalprice")).over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)), 2).as("cum_spend"))
      .orderBy(col("o_custkey"), col("o_orderkey"))
  }

  val q48Sql: String =
    """SELECT o_custkey, o_orderkey, o_totalprice,
      |  coalesce(lag(o_totalprice, 1) OVER w, 0.0) AS prev_price,
      |  round(sum(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderkey
      |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS cum_spend
      |FROM orders
      |WHERE o_custkey < 100
      |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderkey)
      |ORDER BY o_custkey, o_orderkey""".stripMargin

  /** Exact interpolated percentiles per group (no analogue in the
    * reference at all; Spark's sort-based `percentile` matches
    * DuckDB's quantile_cont linear interpolation). The 100 TB form
    * is `percentile_approx` (t-digest, mergeable partials) — exact
    * percentile requires a per-group sort and is the demonstrative
    * baseline here.
    */
  def q49Percentiles(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .groupBy(col("l_returnflag"))
      .agg(
        round(expr("percentile(l_extendedprice, 0.5)"), 4).as("p50"),
        round(expr("percentile(l_extendedprice, 0.9)"), 4).as("p90"),
        count(lit(1)).as("n"))
      .orderBy(col("l_returnflag"))

  val q49Sql: String =
    """SELECT l_returnflag,
      |  round(quantile_cont(l_extendedprice, 0.5), 4) AS p50,
      |  round(quantile_cont(l_extendedprice, 0.9), 4) AS p90,
      |  count(*) AS n
      |FROM lineitem GROUP BY l_returnflag
      |ORDER BY l_returnflag""".stripMargin

  /** Set intersection (Table.java:899 `intersect` — INTERSECT
    * DISTINCT semantics; the reference's planner lowers it to a
    * distinct coGroup, DataSetMinus.scala's twin). Spark plans a
    * left-semi hash join after per-side distinct partials — one
    * shuffle per side on the full row as key. Scale: both sides
    * shuffle once; distinct partials keep the exchange narrow.
    *
    * Mkt-segment/nation pairs that appear among both high- and
    * low-balance customers.
    */
  def q58Intersect(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir)
    val rich = c.filter(col("c_acctbal") > 5000)
      .select(col("c_mktsegment"), col("c_nationkey"))
    val poor = c.filter(col("c_acctbal") < 0)
      .select(col("c_mktsegment"), col("c_nationkey"))
    rich.intersect(poor)
      .orderBy(col("c_mktsegment"), col("c_nationkey"))
  }

  val q58Sql: String =
    """SELECT c_mktsegment, c_nationkey FROM customer WHERE c_acctbal > 5000
      |INTERSECT
      |SELECT c_mktsegment, c_nationkey FROM customer WHERE c_acctbal < 0
      |ORDER BY c_mktsegment, c_nationkey""".stripMargin

  /** Bag difference (Table.java:849 `minusAll` — EXCEPT ALL keeps
    * multiplicity: a row occurring n times left and m times right
    * survives max(n-m, 0) times). Spark's exceptAll plans this as a
    * count-tagged aggregate + generate — one shuffle, no join blowup.
    * The set-semantics twin (`minus`, Table.java:830) is the same
    * plan without the multiplicity bookkeeping.
    *
    * Per-supplier shipment multiset minus its returned shipments:
    * suppliers keep one row per non-returned shipment.
    */
  def q59ExceptAll(spark: SparkSession, dir: String): DataFrame = {
    val l = Tables.lineitem(spark, dir).filter(col("l_suppkey") < 40)
    val all = l.select(col("l_suppkey"))
    val returned = l.filter(col("l_returnflag") === "R").select(col("l_suppkey"))
    all.exceptAll(returned)
      .groupBy(col("l_suppkey"))
      .agg(count(lit(1)).as("n_kept"))
      .orderBy(col("l_suppkey"))
  }

  val q59Sql: String =
    """SELECT l_suppkey, count(*) AS n_kept FROM (
      |  SELECT l_suppkey FROM lineitem WHERE l_suppkey < 40
      |  EXCEPT ALL
      |  SELECT l_suppkey FROM lineitem WHERE l_suppkey < 40 AND l_returnflag = 'R'
      |) GROUP BY l_suppkey ORDER BY l_suppkey""".stripMargin

  /** WebLogAnalysis composition (WebLogAnalysis.java:111-133): filter
    * one input by keyword, a second by a rank threshold, a third by a
    * date window; join the first two, then coGroup-anti-join the
    * third. Re-expressed on the TPC-H-ish tables: keyword-named parts
    * (documents) joined to their over-threshold revenue (ranks),
    * anti-joined against parts returned in the window (visits). The
    * reference's AntiJoinVisits coGroup (:233-245 — emit left when
    * right group is empty) is exactly Spark's left_anti, which skips
    * materializing the right side's columns entirely.
    *
    * Scale: revenue agg is the only wide shuffle (map-side partials);
    * the filtered part list and returned-key projection are narrow
    * and broadcast-able; anti join shuffles only 8-byte keys.
    */
  def q60WebLog(spark: SparkSession, dir: String): DataFrame = {
    val l = Tables.lineitem(spark, dir)
    val docs = Tables.part(spark, dir)
      .filter(col("p_name").contains("red"))
      .select(col("p_partkey"))
    // Join the (broadcast-size) keyword-filtered key list BEFORE the
    // wide agg so the revenue shuffle carries only matching parts.
    val ranks = l.join(broadcast(docs), col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_partkey"))
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"))
      .filter(col("revenue") > 50000)
    val visits = l
      .filter(col("l_returnflag") === "R" && col("l_quantity") >= 45 &&
        col("l_shipdate") >= lit("1996-01-01").cast("timestamp"))
      .select(col("l_partkey").as("v_partkey"))
    ranks
      .join(visits, col("p_partkey") === col("v_partkey"), "left_anti")
      .select(col("p_partkey"), col("revenue"))
      .orderBy(col("p_partkey"))
  }

  val q60Sql: String =
    """SELECT p_partkey, revenue FROM (
      |  SELECT p_partkey, round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
      |  FROM part JOIN lineitem ON p_partkey = l_partkey
      |  WHERE p_name LIKE '%red%'
      |  GROUP BY p_partkey
      |  HAVING round(sum(l_extendedprice * (1 - l_discount)), 2) > 50000
      |)
      |WHERE NOT EXISTS (
      |  SELECT 1 FROM lineitem
      |  WHERE l_partkey = p_partkey AND l_returnflag = 'R' AND l_quantity >= 45
      |    AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00')
      |ORDER BY p_partkey""".stripMargin

  /** Large-volume orders (TPC-H Q18 shape): HAVING-filtered IN
    * subquery + 3-way join + re-aggregation — the one query here
    * that enters through `spark.sql`, because a relational engine's
    * user surface includes SQL text and the IN-subquery is its
    * natural habitat. Catalyst rewrites the IN to a left-semi join
    * (RewritePredicateSubquery), so the plan is the same
    * agg → semi-join → join pyramid a DataFrame formulation yields:
    * the HAVING agg shuffles lineitem once on orderkey with map-side
    * partials, the qualifying-order key list semi-joins orders, and
    * the final per-order agg reuses the orderkey clustering.
    * Quantity sums are integer-valued doubles — exact in IEEE at any
    * fold order, so the HAVING threshold can't flake cross-engine.
    */
  val Q64MinQty = 250

  def q64LargeOrders(spark: SparkSession, dir: String): DataFrame = {
    Tables.customer(spark, dir).createOrReplaceTempView("g_customer")
    Tables.orders(spark, dir).createOrReplaceTempView("g_orders")
    Tables.lineitem(spark, dir).createOrReplaceTempView("g_lineitem")
    spark.sql(
      s"""SELECT c_custkey, o_orderkey, o_totalprice, sum(l_quantity) AS total_qty
         |FROM g_customer JOIN g_orders ON c_custkey = o_custkey
         |JOIN g_lineitem ON o_orderkey = l_orderkey
         |WHERE o_orderkey IN (
         |  SELECT l_orderkey FROM g_lineitem
         |  GROUP BY l_orderkey HAVING sum(l_quantity) > $Q64MinQty)
         |GROUP BY c_custkey, o_orderkey, o_totalprice
         |ORDER BY o_totalprice DESC, o_orderkey
         |LIMIT 20""".stripMargin)
  }

  val q64Sql: String =
    s"""SELECT c_custkey, o_orderkey, o_totalprice, sum(l_quantity) AS total_qty
       |FROM customer JOIN orders ON c_custkey = o_custkey
       |JOIN lineitem ON o_orderkey = l_orderkey
       |WHERE o_orderkey IN (
       |  SELECT l_orderkey FROM lineitem
       |  GROUP BY l_orderkey HAVING sum(l_quantity) > $Q64MinQty)
       |GROUP BY c_custkey, o_orderkey, o_totalprice
       |ORDER BY o_totalprice DESC, o_orderkey
       |LIMIT 20""".stripMargin

  // ---------------------------------------------------------------- q79
  /** Min-cost supplier per part (the TPC-H Q2 core shape, adapted to
    * this schema's lineitem-derived unit costs): a CORRELATED SCALAR
    * subquery — the one subquery rewrite q64's IN form doesn't
    * exercise. Catalyst's RewriteCorrelatedScalarSubquery turns the
    * correlated `= (SELECT min ...)` into a per-part aggregate joined
    * back on the correlation key, so the physical plan is one
    * costs-shuffle on (part, supp), one min-agg shuffle on part, and
    * an equi-join — no per-row re-execution, which is the property
    * that matters at 100 TB. Unit costs stay RAW doubles: each is one
    * division and min() picks, not sums, so both engines hold
    * bit-identical values — rounding them would reintroduce the
    * HALF_UP/HALF_EVEN cross-engine mismatch (verify-skill rule).
    */
  def q79MinCostSupplier(spark: SparkSession, dir: String): DataFrame = {
    Tables.lineitem(spark, dir).createOrReplaceTempView("g79_lineitem")
    spark.sql(
      """WITH costs AS (
        |  SELECT l_partkey AS partkey, l_suppkey AS suppkey,
        |    min(l_extendedprice / l_quantity) AS unit_cost
        |  FROM g79_lineitem GROUP BY l_partkey, l_suppkey)
        |SELECT c.partkey, c.suppkey, c.unit_cost
        |FROM costs c
        |WHERE c.unit_cost = (SELECT min(c2.unit_cost) FROM costs c2
        |                     WHERE c2.partkey = c.partkey)
        |ORDER BY c.partkey, c.suppkey""".stripMargin)
  }

  val q79Sql: String =
    """WITH costs AS (
      |  SELECT l_partkey AS partkey, l_suppkey AS suppkey,
      |    min(l_extendedprice / l_quantity) AS unit_cost
      |  FROM lineitem GROUP BY l_partkey, l_suppkey)
      |SELECT c.partkey, c.suppkey, c.unit_cost
      |FROM costs c
      |WHERE c.unit_cost = (SELECT min(c2.unit_cost) FROM costs c2
      |                     WHERE c2.partkey = c.partkey)
      |ORDER BY c.partkey, c.suppkey""".stripMargin

  // ---------------------------------------------------------------- q80
  /** Full CUBE over (returnflag, linestatus) — all four grouping sets
    * where q47's ROLLUP produces three, distinguished by
    * grouping_id. Same single-shuffle expansion: Spark expands the
    * sets map-side and aggregates once keyed by (gid, keys), so the
    * cube costs one pass regardless of set count. */
  def q80Cube(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .cube(col("l_returnflag"), col("l_linestatus"))
      .agg(round(sum(col("l_quantity")), 2).as("sum_qty"),
        count(lit(1)).as("n"),
        grouping_id().as("gid"))
      .orderBy(col("gid"), col("l_returnflag"), col("l_linestatus"))

  val q80Sql: String =
    """SELECT l_returnflag, l_linestatus,
      |  round(sum(l_quantity), 2) AS sum_qty,
      |  count(*) AS n,
      |  GROUPING(l_returnflag, l_linestatus) AS gid
      |FROM lineitem
      |GROUP BY CUBE (l_returnflag, l_linestatus)
      |ORDER BY gid, l_returnflag, l_linestatus""".stripMargin

  // ---------------------------------------------------------------- q81
  /** Pivot — long-to-wide on a FIXED value list (the only scalable
    * form: an unlisted pivot needs a pre-pass collecting distinct
    * values to the driver). Catalyst compiles it to one hash-agg of
    * conditional partials — the same plan as the oracle's explicit
    * CASE sums, one shuffle keyed by user. */
  val PivotTypes = Seq("click", "error", "purchase", "signup", "view")

  def q81Pivot(spark: SparkSession, dir: String): DataFrame = {
    val wide = Tables.events(spark, dir)
      .groupBy(col("user_id"))
      .pivot("event_type", PivotTypes)
      .agg(count(lit(1)))
    wide.select(col("user_id") +:
        PivotTypes.map(t => coalesce(col(t), lit(0L)).as(s"n_$t")): _*)
      .orderBy(col("user_id"))
  }

  val q81Sql: String = {
    val sums = PivotTypes.map(t =>
      s"sum(CASE WHEN event_type = '$t' THEN 1 ELSE 0 END)::BIGINT AS n_$t").mkString(",\n  ")
    s"""SELECT user_id,
       |  $sums
       |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin
  }

  // ---------------------------------------------------------------- q82
  /** Unpivot/melt — wide-to-long, the inverse reshape of q81: the
    * three customer measure columns become (measure, value) rows.
    * Spark's `unpivot` plans an Expand (each input row emits one row
    * per measure in place), so the reshape is zero-shuffle — only the
    * presentation sort exchanges. The oracle states the same thing as
    * UNION ALL of one SELECT per measure. */
  def q82Unpivot(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir)
      .select(col("c_custkey"), col("c_acctbal"),
        col("c_nationkey").cast("double").as("c_nation_d"),
        col("c_custkey").cast("double").as("c_key_d"))
      .unpivot(Array(col("c_custkey")),
        Array(col("c_acctbal"), col("c_nation_d"), col("c_key_d")),
        "measure", "value")
      .orderBy(col("c_custkey"), col("measure"))

  val q82Sql: String =
    """SELECT c_custkey, measure, value FROM (
      |  SELECT c_custkey, 'c_acctbal' AS measure, c_acctbal AS value FROM customer
      |  UNION ALL
      |  SELECT c_custkey, 'c_nation_d', c_nationkey::DOUBLE FROM customer
      |  UNION ALL
      |  SELECT c_custkey, 'c_key_d', c_custkey::DOUBLE FROM customer)
      |ORDER BY c_custkey, measure""".stripMargin

  // ---------------------------------------------------------------- q88
  /** GROUPING SETS — the general form of q47's rollup / q80's cube
    * (an explicit, non-hierarchical set list: flag×status detail,
    * per-flag subtotal, grand total — skipping the per-status slice a
    * cube would add). Catalyst plans one Expand over the scan feeding
    * a single hash-agg, so the three groupings cost one shuffle, not
    * three scans; the oracle's GROUPING SETS is evaluated natively by
    * DuckDB. grouping() flags are cast BIGINT to pin the cross-engine
    * schema. */
  def q88GroupingSets(spark: SparkSession, dir: String): DataFrame = {
    Tables.lineitem(spark, dir).createOrReplaceTempView("g88_lineitem")
    spark.sql(
      """SELECT l_returnflag, l_linestatus,
        |  CAST(grouping(l_returnflag) AS BIGINT) AS g_rf,
        |  CAST(grouping(l_linestatus) AS BIGINT) AS g_ls,
        |  count(*) AS n, round(sum(l_quantity), 2) AS sum_qty
        |FROM g88_lineitem
        |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())""".stripMargin)
  }

  val q88Sql: String =
    """SELECT l_returnflag, l_linestatus,
      |  CAST(grouping(l_returnflag) AS BIGINT) AS g_rf,
      |  CAST(grouping(l_linestatus) AS BIGINT) AS g_ls,
      |  count(*) AS n, round(sum(l_quantity), 2) AS sum_qty
      |FROM lineitem
      |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())""".stripMargin

  // ---------------------------------------------------------------- q91
  /** Rank-family analytic windows — ntile / percent_rank / cume_dist
    * complete the window-function surface next to q48's lag/running
    * sum and q12/q46's row_number. The window orders by
    * (o_totalprice, o_orderkey) — UNIQUE within each customer — so
    * ntile bucket boundaries are deterministic cross-engine (ntile
    * splits ties by physical row order; an orderBy with ties would
    * diverge between engines). percent_rank and cume_dist are single
    * integer divisions — bit-identical, emitted unrounded. Per-key
    * window sort, no global sort: scales like q12.
    */
  def q91RankFamily(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice"), col("o_orderkey"))
    Tables.orders(spark, dir)
      .filter(col("o_custkey") < 100)
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
        ntile(4).over(w).as("quartile"),
        percent_rank().over(w).as("pct_rank"),
        cume_dist().over(w).as("cume"))
      .orderBy(col("o_custkey"), col("o_orderkey"))
  }

  val q91Sql: String =
    """SELECT o_custkey, o_orderkey, o_totalprice,
      |  ntile(4) OVER w AS quartile,
      |  percent_rank() OVER w AS pct_rank,
      |  cume_dist() OVER w AS cume
      |FROM orders
      |WHERE o_custkey < 100
      |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice, o_orderkey)
      |ORDER BY o_custkey, o_orderkey""".stripMargin

  // ---------------------------------------------------------------- q94
  /** Second-moment statistical aggregates — corr / covar_samp /
    * stddev_samp / var_samp per group, the numeric-profiling pass a
    * feature-engineering pipeline runs before normalization. All four
    * are single-pass mergeable co-moment aggregations (partial
    * Welford-style states merge associatively), so they keep the q01
    * shape: map-side partials, one 3-group exchange. Both engines
    * accumulate co-moments in doubles with different merge orders —
    * outputs are rounded like any aggregated sum (correlation is
    * scale-free: 6 decimals; the rest 2).
    */
  def q94StatAggregates(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .groupBy(col("l_returnflag"))
      .agg(
        count(lit(1)).as("n"),
        round(corr(col("l_quantity"), col("l_extendedprice")), 6).as("corr_qp"),
        round(covar_samp(col("l_quantity"), col("l_extendedprice")), 2).as("covar_qp"),
        round(stddev_samp(col("l_quantity")), 6).as("std_qty"),
        round(var_samp(col("l_extendedprice")), 2).as("var_price"))
      .orderBy(col("l_returnflag"))

  val q94Sql: String =
    """SELECT l_returnflag, count(*) AS n,
      |  round(corr(l_quantity, l_extendedprice), 6) AS corr_qp,
      |  round(covar_samp(l_quantity, l_extendedprice), 2) AS covar_qp,
      |  round(stddev_samp(l_quantity), 6) AS std_qty,
      |  round(var_samp(l_extendedprice), 2) AS var_price
      |FROM lineitem
      |GROUP BY l_returnflag
      |ORDER BY l_returnflag""".stripMargin

  // ---------------------------------------------------------------- q96
  /** Bloom-prefiltered semi join — the sketch-accelerates-but-never-
    * changes-results pattern: probe rows are pruned by a broadcast
    * Bloom filter built from the small side
    * ([[graft.operators.Sketches.bloomPrefilter]]), then EXACTLY
    * verified by the real semi join, so false positives cost time,
    * never correctness — the oracle is the plain semi join. At 100 TB
    * the filter kills ~80% of probe I/O-to-shuffle volume here before
    * the exchange (Catalyst's InjectRuntimeFilter plants the same
    * trick automatically for joins it can see; this operator is the
    * explicit form for multi-stage pipelines). RelationalSpec asserts
    * prefilter+verify ≡ plain semi join and that pruning happens.
    */
  val Q96MinPrice = 400000.0

  def q96BloomSemiJoin(spark: SparkSession, dir: String): DataFrame = {
    val hi = Tables.orders(spark, dir)
      .filter(col("o_totalprice") > Q96MinPrice).select(col("o_orderkey"))
    val pre = graft.operators.Sketches.bloomPrefilter(hi, "o_orderkey", 100000L, 0.01)(col("l_orderkey"))
    Tables.lineitem(spark, dir)
      .filter(pre)
      .join(hi, col("l_orderkey") === col("o_orderkey"), "left_semi")
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"), round(sum(col("l_extendedprice")), 2).as("revenue"))
      .orderBy(col("l_returnflag"))
  }

  val q96Sql: String =
    s"""SELECT l_returnflag, count(*) AS n,
       |  round(sum(l_extendedprice), 2) AS revenue
       |FROM lineitem
       |WHERE l_orderkey IN (
       |  SELECT o_orderkey FROM orders WHERE o_totalprice > $Q96MinPrice)
       |GROUP BY l_returnflag
       |ORDER BY l_returnflag""".stripMargin

  // ---------------------------------------------------------------- q97
  /** Schema-evolution union — `unionByName(allowMissingColumns)`
    * merges corpus snapshots whose schemas drifted (an old snapshot
    * without `lang`, a new one with an extra `quality` column):
    * columns align BY NAME, absentees fill with NULL. The positional
    * `union` (q06) would silently mis-align these. Plans as one
    * zero-shuffle Project-per-side + Union; the oracle states the
    * same contract with DuckDB's UNION ALL BY NAME. */
  def q97UnionByName(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val oldSnap = docs.filter(col("doc_id") % 3 === 0)
      .select(col("doc_id"), col("source"), col("n_chars"))
    val newSnap = docs.filter(col("doc_id") % 3 =!= 0)
      .select(col("doc_id"), col("source"), col("lang"), col("n_chars"),
        (col("n_chars") > 300).cast("int").as("quality"))
    oldSnap.unionByName(newSnap, allowMissingColumns = true)
      .orderBy(col("doc_id"))
  }

  val q97Sql: String =
    """SELECT * FROM (
      |  SELECT doc_id, source, n_chars
      |  FROM documents WHERE doc_id % 3 = 0
      |  UNION ALL BY NAME
      |  SELECT doc_id, source, lang, n_chars,
      |    (n_chars > 300)::INT AS quality
      |  FROM documents WHERE doc_id % 3 <> 0)
      |ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- q100
  /** Order-priority check (TPC-H Q4 shape): EXISTS correlated on the
    * join key PLUS a non-equi outer reference (l_shipdate >
    * o_orderdate) — Catalyst plans the DataFrame left-semi with the
    * mixed condition directly: one equi-keyed shuffle, the non-equi
    * part evaluated in the join, no per-row subquery re-execution.
    * Dates live only in predicates; output is (priority, count). */
  def q100OrderPriority(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
      .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
    val l = Tables.lineitem(spark, dir).select(col("l_orderkey"), col("l_shipdate"))
    o.join(l, col("o_orderkey") === col("l_orderkey") &&
        col("l_shipdate") > col("o_orderdate"), "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_orders"))
      .orderBy(col("o_orderpriority"))
  }

  val q100Sql: String =
    """SELECT o_orderpriority, count(*) AS n_orders
      |FROM orders
      |WHERE o_orderdate >= TIMESTAMP '1996-01-01'
      |  AND o_orderdate < TIMESTAMP '1997-01-01'
      |  AND EXISTS (SELECT 1 FROM lineitem
      |              WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
      |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  // ---------------------------------------------------------------- q101
  /** Shipping mix (TPC-H Q12 shape): conditional case-sums over an
    * order–lineitem join, partial-aggregated before the one
    * returnflag-keyed shuffle. Counts cast to BIGINT on the DuckDB
    * side — sum(int) is HUGEINT there (the q72 lesson). */
  def q101PriorityShipmix(spark: SparkSession, dir: String): DataFrame = {
    val hi = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    Tables.orders(spark, dir)
      .join(Tables.lineitem(spark, dir), col("o_orderkey") === col("l_orderkey"))
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1997-01-01").cast("timestamp"))
      .groupBy(col("l_returnflag"))
      .agg(sum(when(hi, 1L).otherwise(0L)).as("high_count"),
        sum(when(hi, 0L).otherwise(1L)).as("low_count"))
      .orderBy(col("l_returnflag"))
  }

  val q101Sql: String =
    """SELECT l_returnflag,
      |  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
      |               THEN 1 ELSE 0 END) AS BIGINT) AS high_count,
      |  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
      |               THEN 0 ELSE 1 END) AS BIGINT) AS low_count
      |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
      |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      |  AND l_shipdate < TIMESTAMP '1997-01-01'
      |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  // ---------------------------------------------------------------- q102
  /** Disjunctive-predicate revenue (TPC-H Q19 shape): three OR'd
    * brand/size/quantity branches across a part–lineitem join. The
    * join key is still the pure equi p_partkey = l_partkey, so
    * Catalyst keeps a broadcast/shuffled hash join and evaluates the
    * disjunction as a post-join filter — the shape that degrades to a
    * nested loop if the ORs are (wrongly) folded into the join
    * condition. Revenue is one rounded aggregated sum. */
  def q102DisjunctiveRevenue(spark: SparkSession, dir: String): DataFrame = {
    def branch(brand: String, sLo: Int, sHi: Int, qLo: Int, qHi: Int): org.apache.spark.sql.Column =
      col("p_brand") === brand && col("p_size").between(sLo, sHi) &&
        col("l_quantity").between(qLo, qHi)
    Tables.lineitem(spark, dir)
      .join(Tables.part(spark, dir), col("p_partkey") === col("l_partkey"))
      .filter(branch("Brand#1", 1, 15, 1, 20) ||
        branch("Brand#2", 10, 30, 10, 30) ||
        branch("Brand#3", 20, 50, 20, 50))
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"))
  }

  val q102Sql: String =
    """SELECT round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
      |FROM lineitem JOIN part ON p_partkey = l_partkey
      |WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 20)
      |   OR (p_brand = 'Brand#2' AND p_size BETWEEN 10 AND 30 AND l_quantity BETWEEN 10 AND 30)
      |   OR (p_brand = 'Brand#3' AND p_size BETWEEN 20 AND 50 AND l_quantity BETWEEN 20 AND 50)""".stripMargin

  // ---------------------------------------------------------------- q103
  /** Waiting suppliers (TPC-H Q21 shape, adapted: "late" = shipped
    * more than 60 days after order date): the dual correlated
    * subquery — EXISTS another supplier on the order AND NOT EXISTS
    * another LATE supplier on it, the second correlating on TWO outer
    * relations (l1 and orders). Enters through `spark.sql` like
    * q64/q79: Catalyst's RewritePredicateSubquery turns the pair into
    * a left-semi plus a left-anti join on orderkey, both equi-keyed
    * shuffles — never a per-row re-execution. */
  def q103WaitingSupplier(spark: SparkSession, dir: String): DataFrame = {
    Tables.supplier(spark, dir).createOrReplaceTempView("g103_supplier")
    Tables.orders(spark, dir).createOrReplaceTempView("g103_orders")
    Tables.lineitem(spark, dir).createOrReplaceTempView("g103_lineitem")
    spark.sql(
      """SELECT s_name, count(*) AS numwait
        |FROM g103_supplier JOIN g103_lineitem l1 ON s_suppkey = l1.l_suppkey
        |JOIN g103_orders ON o_orderkey = l1.l_orderkey
        |WHERE o_orderstatus = 'F'
        |  AND l1.l_shipdate > o_orderdate + INTERVAL 60 DAY
        |  AND EXISTS (SELECT 1 FROM g103_lineitem l2
        |              WHERE l2.l_orderkey = l1.l_orderkey
        |                AND l2.l_suppkey <> l1.l_suppkey)
        |  AND NOT EXISTS (SELECT 1 FROM g103_lineitem l3
        |                  WHERE l3.l_orderkey = l1.l_orderkey
        |                    AND l3.l_suppkey <> l1.l_suppkey
        |                    AND l3.l_shipdate > o_orderdate + INTERVAL 60 DAY)
        |GROUP BY s_name
        |ORDER BY numwait DESC, s_name
        |LIMIT 20""".stripMargin)
  }

  val q103Sql: String =
    """SELECT s_name, CAST(count(*) AS BIGINT) AS numwait
      |FROM supplier JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
      |JOIN orders ON o_orderkey = l1.l_orderkey
      |WHERE o_orderstatus = 'F'
      |  AND l1.l_shipdate > o_orderdate + INTERVAL 60 DAY
      |  AND EXISTS (SELECT 1 FROM lineitem l2
      |              WHERE l2.l_orderkey = l1.l_orderkey
      |                AND l2.l_suppkey <> l1.l_suppkey)
      |  AND NOT EXISTS (SELECT 1 FROM lineitem l3
      |                  WHERE l3.l_orderkey = l1.l_orderkey
      |                    AND l3.l_suppkey <> l1.l_suppkey
      |                    AND l3.l_shipdate > o_orderdate + INTERVAL 60 DAY)
      |GROUP BY s_name
      |ORDER BY numwait DESC, s_name
      |LIMIT 20""".stripMargin

  // ---------------------------------------------------------------- q112
  /** Customer order-count distribution (TPC-H Q13 shape): LEFT OUTER
    * join with an extra predicate IN THE JOIN CONDITION (non-urgent
    * orders only — a filter in the WHERE would wrongly drop the
    * zero-order customers), a per-customer count, then a second
    * aggregation over the counts. Two shuffles (custkey, then the
    * tiny n_orders domain); partial aggregation collapses both. The
    * zero-order customers ride the NULL side of the outer join —
    * count(o_orderkey) ignores NULLs, exactly the Q13 trap. */
  def q112CustDistribution(spark: SparkSession, dir: String): DataFrame = {
    val perCust = Tables.customer(spark, dir)
      .join(Tables.orders(spark, dir),
        col("c_custkey") === col("o_custkey") &&
          col("o_orderpriority") =!= "1-URGENT", "left_outer")
      .groupBy(col("c_custkey"))
      .agg(count(col("o_orderkey")).as("n_orders"))
    perCust.groupBy(col("n_orders"))
      .agg(count(lit(1)).as("n_custs"))
      .orderBy(col("n_custs").desc, col("n_orders").desc)
  }

  val q112Sql: String =
    """SELECT n_orders, CAST(count(*) AS BIGINT) AS n_custs
      |FROM (SELECT c_custkey, CAST(count(o_orderkey) AS BIGINT) AS n_orders
      |      FROM customer LEFT OUTER JOIN orders
      |        ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
      |      GROUP BY c_custkey)
      |GROUP BY n_orders
      |ORDER BY n_custs DESC, n_orders DESC""".stripMargin

  // ---------------------------------------------------------------- q113
  /** Dormant rich customers (TPC-H Q22 shape): customers above the
    * mean positive account balance with no RECENT orders (none since
    * 1999 — the unrestricted anti join is empty at every sf, which
    * would make the row a vacuous pass) — a scalar-aggregate
    * threshold plus an anti join, grouped by nation. The threshold is
    * computed in EXACT integer cents (`round(sum(x*100))` is a whole
    * number both engines agree on; the single division that follows
    * is one IEEE op — the q18 avg trick) because a raw avg() of
    * doubles is summation-order-dependent and a boundary customer
    * could flip sides between engines. The threshold relation is one
    * row — Catalyst broadcasts it; the anti join shuffles on custkey. */
  def q113DormantRich(spark: SparkSession, dir: String): DataFrame = {
    val cust = Tables.customer(spark, dir)
    val thr = cust.filter(col("c_acctbal") > 0)
      .agg((round(sum(col("c_acctbal") * 100), 0) / (count(lit(1)) * lit(100.0))).as("thr"))
    cust.crossJoin(broadcast(thr))
      .filter(col("c_acctbal") > col("thr"))
      .join(Tables.orders(spark, dir)
          .filter(col("o_orderdate") >= lit("1999-01-01").cast("timestamp")),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy(col("c_nationkey").as("nation"))
      .agg(count(lit(1)).as("n_custs"), round(sum(col("c_acctbal")), 2).as("total_bal"))
      .orderBy(col("nation"))
  }

  val q113Sql: String =
    """WITH thr AS (
      |  SELECT round(sum(c_acctbal * 100), 0) / (count(*) * 100.0) AS thr
      |  FROM customer WHERE c_acctbal > 0)
      |SELECT c_nationkey AS nation, CAST(count(*) AS BIGINT) AS n_custs,
      |  round(sum(c_acctbal), 2) AS total_bal
      |FROM customer, thr
      |WHERE c_acctbal > thr
      |  AND NOT EXISTS (SELECT 1 FROM orders
      |                  WHERE o_custkey = c_custkey
      |                    AND o_orderdate >= TIMESTAMP '1999-01-01')
      |GROUP BY c_nationkey
      |ORDER BY c_nationkey""".stripMargin

  // ---------------------------------------------------------------- q114
  /** Promo revenue share (TPC-H Q14 shape): conditional aggregation
    * over a part–lineitem join in one pass — promo and total revenue
    * from the same scan, no second join. Both sums are rounded to
    * cents BEFORE the share is derived (summation order is
    * engine-dependent; the rounded sums are the cross-engine contract)
    * and the share is emitted in parts-per-million via
    * `floor(x + 0.5)` — pure IEEE, no HALF_UP/HALF_EVEN tie rule to
    * diverge on. */
  def q114PromoRevenue(spark: SparkSession, dir: String): DataFrame = {
    val rev = col("l_extendedprice") * (lit(1) - col("l_discount"))
    Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1996-07-01").cast("timestamp"))
      .join(Tables.part(spark, dir), col("p_partkey") === col("l_partkey"))
      .agg(
        round(sum(when(col("p_type") === "PROMO", rev).otherwise(lit(0.0))), 2).as("promo_rev"),
        round(sum(rev), 2).as("total_rev"))
      .withColumn("promo_ppm",
        floor(lit(1000000.0) * col("promo_rev") / col("total_rev") + 0.5).cast("long"))
  }

  val q114Sql: String =
    """WITH sums AS (
      |  SELECT
      |    round(sum(CASE WHEN p_type = 'PROMO'
      |              THEN l_extendedprice * (1 - l_discount) ELSE 0 END), 2) AS promo_rev,
      |    round(sum(l_extendedprice * (1 - l_discount)), 2) AS total_rev
      |  FROM lineitem JOIN part ON p_partkey = l_partkey
      |  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      |    AND l_shipdate < TIMESTAMP '1996-07-01')
      |SELECT promo_rev, total_rev,
      |  CAST(floor(1000000.0 * promo_rev / total_rev + 0.5) AS BIGINT) AS promo_ppm
      |FROM sums""".stripMargin

  // ---------------------------------------------------------------- q115
  /** Small-quantity revenue (TPC-H Q17 shape): a correlated SCALAR
    * subquery — each lineitem row compares against 20% of ITS part's
    * average quantity. Enters through `spark.sql` so Catalyst's
    * RewriteCorrelatedScalarSubquery is exercised: the rewrite is one
    * per-part aggregate joined back on partkey — never a per-row
    * re-execution. The threshold math is exact cross-engine:
    * quantities are integer-valued, so sum() is an exact integer in
    * any order and avg = one IEEE division both engines repeat
    * bit-identically (the identical-fold rule). Output rounds the
    * aggregated revenue only. */
  def q115SmallQuantity(spark: SparkSession, dir: String): DataFrame = {
    Tables.lineitem(spark, dir).createOrReplaceTempView("g115_lineitem")
    Tables.part(spark, dir).createOrReplaceTempView("g115_part")
    spark.sql(
      """SELECT round(sum(l_extendedprice), 2) AS total_rev, count(*) AS n_li
        |FROM g115_lineitem JOIN g115_part ON p_partkey = l_partkey
        |WHERE p_brand = 'Brand#1'
        |  AND l_quantity < 0.2 * (SELECT avg(l_quantity) FROM g115_lineitem l2
        |                          WHERE l2.l_partkey = g115_lineitem.l_partkey)""".stripMargin)
  }

  val q115Sql: String =
    """SELECT round(sum(l_extendedprice), 2) AS total_rev,
      |  CAST(count(*) AS BIGINT) AS n_li
      |FROM lineitem JOIN part ON p_partkey = l_partkey
      |WHERE p_brand = 'Brand#1'
      |  AND l_quantity < 0.2 * (SELECT avg(l_quantity) FROM lineitem l2
      |                          WHERE l2.l_partkey = lineitem.l_partkey)""".stripMargin

  // ---------------------------------------------------------------- q121
  /** National market share (TPC-H Q8 shape): the share of one
    * supplier nation in a region's order revenue per ship year — a
    * six-relation join pyramid (lineitem–orders–customer–nation–
    * region on the demand side, supplier–nation on the supply side)
    * where every dimension chain broadcasts and only the
    * lineitem–orders equi-join shuffles. Share derived with the q114
    * device: cents-rounded sums, tie-free ppm via floor(x+0.5). */
  def q121MarketShare(spark: SparkSession, dir: String): DataFrame = {
    val n1 = Tables.nation(spark, dir)
      .select(col("n_nationkey").as("s_nk"), col("n_name").as("supp_nation"))
    val custSide = Tables.customer(spark, dir)
      .join(broadcast(Tables.nation(spark, dir)), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(spark, dir).filter(col("r_name") === "ASIA")),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("c_custkey"))
    val rev = col("l_extendedprice") * (lit(1) - col("l_discount"))
    Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
      .join(Tables.orders(spark, dir), col("l_orderkey") === col("o_orderkey"))
      .join(custSide, col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.supplier(spark, dir)), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(n1), col("s_nationkey") === col("s_nk"))
      .groupBy(year(col("l_shipdate")).as("l_year"))
      .agg(
        round(sum(when(col("supp_nation") === "NATION_2", rev).otherwise(lit(0.0))), 2)
          .as("nation_rev"),
        round(sum(rev), 2).as("total_rev"))
      .withColumn("share_ppm",
        floor(lit(1000000.0) * col("nation_rev") / col("total_rev") + 0.5).cast("long"))
      .orderBy(col("l_year"))
  }

  val q121Sql: String =
    """WITH sums AS (
      |  SELECT year(l_shipdate) AS l_year,
      |    round(sum(CASE WHEN n1.n_name = 'NATION_2'
      |              THEN l_extendedprice * (1 - l_discount) ELSE 0 END), 2) AS nation_rev,
      |    round(sum(l_extendedprice * (1 - l_discount)), 2) AS total_rev
      |  FROM lineitem
      |  JOIN orders ON l_orderkey = o_orderkey
      |  JOIN customer ON o_custkey = c_custkey
      |  JOIN nation n2 ON c_nationkey = n2.n_nationkey
      |  JOIN region ON n2.n_regionkey = r_regionkey AND r_name = 'ASIA'
      |  JOIN supplier ON l_suppkey = s_suppkey
      |  JOIN nation n1 ON s_nationkey = n1.n_nationkey
      |  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      |    AND l_shipdate < TIMESTAMP '1998-01-01'
      |  GROUP BY 1)
      |SELECT l_year, nation_rev, total_rev,
      |  CAST(floor(1000000.0 * nation_rev / total_rev + 0.5) AS BIGINT) AS share_ppm
      |FROM sums ORDER BY l_year""".stripMargin

  // ---------------------------------------------------------------- q122
  /** Volume shipping (TPC-H Q7 shape): bilateral trade between two
    * REGIONS by ship year — supplier region on one side, customer
    * region (through orders) on the other, both directions kept.
    * (Nation-level pairs are vacuous at sf0.001 — a 25×25 pair grid
    * over ~6k lineitems; regions keep the two-sided dimension-pair
    * shape non-empty at every scale.) The pair predicate prunes
    * BEFORE the join pyramid via the broadcast dimension filters;
    * only lineitem–orders shuffles. */
  def q122VolumeShipping(spark: SparkSession, dir: String): DataFrame = {
    val pair = Seq("ASIA", "EUROPE")
    def sideRegion(alias: String): DataFrame =
      Tables.nation(spark, dir)
        .join(broadcast(Tables.region(spark, dir).filter(col("r_name").isin(pair: _*))),
          col("n_regionkey") === col("r_regionkey"))
        .select(col("n_nationkey").as(s"${alias}_nk"), col("r_name").as(alias))
    val sn = Tables.supplier(spark, dir)
      .join(broadcast(sideRegion("supp_region")), col("s_nationkey") === col("supp_region_nk"))
      .select(col("s_suppkey"), col("supp_region"))
    val cn = Tables.customer(spark, dir)
      .join(broadcast(sideRegion("cust_region")), col("c_nationkey") === col("cust_region_nk"))
      .select(col("c_custkey"), col("cust_region"))
    Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
      .join(Tables.orders(spark, dir), col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(sn), col("l_suppkey") === col("s_suppkey"))
      .join(cn, col("o_custkey") === col("c_custkey"))
      .filter(col("supp_region") =!= col("cust_region"))
      .groupBy(col("supp_region"), col("cust_region"), year(col("l_shipdate")).as("l_year"))
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"),
        count(lit(1)).as("n_li"))
      .orderBy(col("supp_region"), col("cust_region"), col("l_year"))
  }

  val q122Sql: String =
    """SELECT r1.r_name AS supp_region, r2.r_name AS cust_region,
      |  year(l_shipdate) AS l_year,
      |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
      |  CAST(count(*) AS BIGINT) AS n_li
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN supplier ON l_suppkey = s_suppkey
      |JOIN nation n1 ON s_nationkey = n1.n_nationkey
      |JOIN region r1 ON n1.n_regionkey = r1.r_regionkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation n2 ON c_nationkey = n2.n_nationkey
      |JOIN region r2 ON n2.n_regionkey = r2.r_regionkey
      |WHERE r1.r_name IN ('ASIA', 'EUROPE')
      |  AND r2.r_name IN ('ASIA', 'EUROPE')
      |  AND r1.r_name <> r2.r_name
      |  AND l_shipdate >= TIMESTAMP '1996-01-01'
      |  AND l_shipdate < TIMESTAMP '1998-01-01'
      |GROUP BY 1, 2, 3
      |ORDER BY 1, 2, 3""".stripMargin

  // ---------------------------------------------------------------- q130
  /** Top supplier (TPC-H Q15): the revenue view — per-supplier
    * revenue over a one-quarter ship window — and the supplier(s)
    * hitting its maximum. The classic view+scalar-subquery shape
    * becomes one suppkey-keyed hash-agg (map-side partials, ~|supplier|
    * rows out), a 1-row max broadcast, and a broadcast supplier join —
    * nothing shuffles except the scan's agg exchange, at any scale.
    * The max-equality compare runs on EXACT INTEGER CENTS
    * (`round(sum(rev*100), 0)` — the q113 device): a raw double max
    * vs double sum equality is summation-order-dependent and could
    * drop/duplicate the winner cross-engine; ties (multiple suppliers
    * at the max) are kept on BOTH engines by construction. The cents
    * divide back to currency in ONE IEEE division for output. */
  def q130TopSupplier(spark: SparkSession, dir: String): DataFrame = {
    val rev = Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1996-04-01").cast("timestamp"))
      .groupBy(col("l_suppkey"))
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount")) * 100), 0)
        .as("rev_cents"))
    val mx = rev.agg(max(col("rev_cents")).as("mx"))
    rev.crossJoin(broadcast(mx))
      .filter(col("rev_cents") === col("mx"))
      .join(broadcast(Tables.supplier(spark, dir)),
        col("l_suppkey") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"),
        (col("rev_cents") / 100.0).as("total_revenue"))
      .orderBy(col("s_suppkey"))
  }

  val q130Sql: String =
    """WITH revenue AS (
      |  SELECT l_suppkey AS supplier_no,
      |    round(sum(l_extendedprice * (1 - l_discount) * 100), 0) AS rev_cents
      |  FROM lineitem
      |  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      |    AND l_shipdate < TIMESTAMP '1996-04-01'
      |  GROUP BY l_suppkey)
      |SELECT s_suppkey, s_name, rev_cents / 100.0 AS total_revenue
      |FROM supplier JOIN revenue ON s_suppkey = supplier_no
      |WHERE rev_cents = (SELECT max(rev_cents) FROM revenue)
      |ORDER BY s_suppkey""".stripMargin

  // ------------------------------------------- q167-q171: the last
  // five TPC-H shapes. The testdata ships no PARTSUPP table, so the
  // supply relation is DERIVED from lineitem — one row per observed
  // (part, supplier) pair with supply_cost = the minimum unit price
  // ever charged (min of identical per-row divisions: bit-identical
  // cross-engine, the identical-fold rule). With it, all 22 TPC-H
  // query shapes are graded.

  /** Shared adapted-PARTSUPP for the oracles: (l_partkey, l_suppkey,
    * supply_cost). The Spark plans derive the same relation INSIDE
    * their pipelines (pre-filtered aggregation in q167, a window over
    * the facts' own lineage in q168) so no plan pays an unpruned
    * corpus-wide aggregate; the oracle states the unfiltered form and
    * lets DuckDB's optimizer do as it likes. */
  private val supplySql: String =
    """supply AS (
      |  SELECT l_partkey, l_suppkey,
      |    min(l_extendedprice / l_quantity) AS supply_cost
      |  FROM lineitem GROUP BY 1, 2)""".stripMargin

  // ---------------------------------------------------------------- q167
  /** Minimum-cost supplier (TPC-H Q2 shape): for each mid-size
    * LARGE/SMALL part, the EUROPE supplier(s) charging the minimal
    * supply cost — the classic correlated-min subquery, planned as
    * one window-min over the region-filtered candidate set (a single
    * (part, supp)-keyed shuffle; part and supplier dims broadcast).
    * Both dimension filters apply BELOW the supply aggregation —
    * per-(part, supp) costs only involve that pair's own rows, so
    * pre-filtering prunes the shuffle without changing any kept
    * cost; at 100 TB the agg sees the filtered sliver, not the
    * corpus. The min-equality compare runs on the raw doubles: both
    * engines pick min() over identical division results, so the
    * winner set is bit-stable. */
  def q167MinCostSupplier(spark: SparkSession, dir: String): DataFrame = {
    val parts = Tables.part(spark, dir)
      .filter(col("p_size").between(10, 20) &&
        col("p_type").isin("LARGE", "SMALL"))
      .select(col("p_partkey"), col("p_type"))
    val euro = Tables.supplier(spark, dir)
      .join(broadcast(Tables.nation(spark, dir)
        .join(broadcast(Tables.region(spark, dir).filter(col("r_name") === "EUROPE")),
          col("n_regionkey") === col("r_regionkey"))),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("s_acctbal"), col("s_name"), col("n_name"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("p_partkey"))
    Tables.lineitem(spark, dir)
      .join(broadcast(parts), col("l_partkey") === col("p_partkey"))
      .join(broadcast(euro), col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("p_partkey"), col("s_suppkey"),
        col("p_type"), col("s_acctbal"), col("s_name"), col("n_name"))
      .agg(min(col("l_extendedprice") / col("l_quantity")).as("supply_cost"))
      .withColumn("mn", min(col("supply_cost")).over(w))
      .filter(col("supply_cost") === col("mn"))
      .select(col("s_acctbal"), col("s_name"), col("n_name"),
        col("p_partkey"), col("p_type"), col("s_suppkey"), col("supply_cost"))
      .orderBy(desc("s_acctbal"), col("n_name"), col("s_name"),
        col("p_partkey"), col("s_suppkey"))
      .limit(100)
  }

  val q167Sql: String =
    s"""WITH $supplySql
       |SELECT s_acctbal, s_name, n_name, p_partkey, p_type, s_suppkey,
       |  supply_cost
       |FROM supply
       |JOIN part ON l_partkey = p_partkey
       |JOIN supplier ON l_suppkey = s_suppkey
       |JOIN nation ON s_nationkey = n_nationkey
       |JOIN region ON n_regionkey = r_regionkey
       |WHERE p_size BETWEEN 10 AND 20 AND p_type IN ('LARGE', 'SMALL')
       |  AND r_name = 'EUROPE'
       |  AND supply_cost = (
       |    SELECT min(s2.supply_cost) FROM supply s2
       |    JOIN supplier sp ON s2.l_suppkey = sp.s_suppkey
       |    JOIN nation n2 ON sp.s_nationkey = n2.n_nationkey
       |    JOIN region r2 ON n2.n_regionkey = r2.r_regionkey
       |    WHERE s2.l_partkey = supply.l_partkey AND r2.r_name = 'EUROPE')
       |ORDER BY s_acctbal DESC, n_name, s_name, p_partkey, s_suppkey
       |LIMIT 100""".stripMargin

  // ---------------------------------------------------------------- q168
  /** Product-type profit (TPC-H Q9 shape): per (supplier nation,
    * order year), the profit over 'widget' parts — revenue minus
    * supply_cost·quantity with the derived supply relation standing
    * in for PARTSUPP. The supply cost rides a window over the
    * filtered facts' OWN lineage (filtering by part keeps every row
    * of a kept part, so the per-(part, supp) min is unchanged) — a
    * join-back to a fresh supply aggregate would re-scan lineitem,
    * the exchange-reuse regression class q85 pinned. One (part,
    * supp) window shuffle, one orderkey shuffle, nation broadcast,
    * ~25×7-row agg. */
  def q168ProductProfit(spark: SparkSession, dir: String): DataFrame = {
    val parts = Tables.part(spark, dir)
      .filter(col("p_name").like("%widget%")).select(col("p_partkey"))
    val wps = org.apache.spark.sql.expressions.Window
      .partitionBy(col("l_partkey"), col("l_suppkey"))
    Tables.lineitem(spark, dir)
      .join(broadcast(parts), col("l_partkey") === col("p_partkey"))
      .withColumn("supply_cost",
        min(col("l_extendedprice") / col("l_quantity")).over(wps))
      .join(Tables.orders(spark, dir).select(col("o_orderkey"), col("o_orderdate")),
        col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(Tables.supplier(spark, dir)
          .join(broadcast(Tables.nation(spark, dir)),
            col("s_nationkey") === col("n_nationkey"))
          .select(col("s_suppkey"), col("n_name"))),
        col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("n_name").as("nation"), year(col("o_orderdate")).as("o_year"))
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount")) -
        col("supply_cost") * col("l_quantity")), 2).as("sum_profit"))
      .orderBy(col("nation"), desc("o_year"))
  }

  val q168Sql: String =
    s"""WITH $supplySql
       |SELECT n_name AS nation, year(o_orderdate) AS o_year,
       |  round(sum(l_extendedprice * (1 - l_discount)
       |    - supply_cost * l_quantity), 2) AS sum_profit
       |FROM lineitem
       |JOIN part ON l_partkey = p_partkey
       |JOIN supply ON lineitem.l_partkey = supply.l_partkey
       |           AND lineitem.l_suppkey = supply.l_suppkey
       |JOIN orders ON l_orderkey = o_orderkey
       |JOIN supplier ON lineitem.l_suppkey = s_suppkey
       |JOIN nation ON s_nationkey = n_nationkey
       |WHERE p_name LIKE '%widget%'
       |GROUP BY 1, 2
       |ORDER BY nation, o_year DESC""".stripMargin

  // ---------------------------------------------------------------- q169
  /** Important supply (TPC-H Q11 shape): parts whose total supplied
    * value exceeds 1.2× the average part's — the group-sum +
    * global-threshold scalar-subquery shape. All arithmetic EXACT:
    * per-part value in integer cents (the q113/q130 device), the
    * threshold as the integer cross-multiply value·n_parts·5 >
    * total·6, so membership can never flip on summation order. One
    * part-keyed agg + a 1-row broadcast. */
  def q169ImportantSupply(spark: SparkSession, dir: String): DataFrame = {
    val pv = Tables.lineitem(spark, dir)
      .groupBy(col("l_partkey"))
      .agg(round(sum(col("l_extendedprice") * 100), 0).cast("long").as("cents"))
    val tot = pv.agg(sum(col("cents")).as("tot"), count(lit(1)).as("np"))
    pv.crossJoin(broadcast(tot))
      .filter(col("cents") * col("np") * 5 > col("tot") * 6)
      .select(col("l_partkey"), (col("cents") / 100.0).as("part_value"))
      .orderBy(desc("part_value"), col("l_partkey"))
  }

  val q169Sql: String =
    """WITH pv AS (
      |  SELECT l_partkey,
      |    CAST(round(sum(l_extendedprice * 100), 0) AS BIGINT) AS cents
      |  FROM lineitem GROUP BY 1),
      |t AS (SELECT CAST(sum(cents) AS BIGINT) AS tot,
      |             CAST(count(*) AS BIGINT) AS np FROM pv)
      |SELECT l_partkey, cents / 100.0 AS part_value
      |FROM pv, t
      |WHERE cents * np * 5 > tot * 6
      |ORDER BY part_value DESC, l_partkey""".stripMargin

  // ---------------------------------------------------------------- q170
  /** Parts/supplier relationship (TPC-H Q16 shape): distinct
    * suppliers per (brand, type, size) over the derived supply
    * relation, excluding low-balance suppliers (the complaint filter
    * adapted — no comment column ships) and one excluded brand-size
    * band. The supply relation's costs aren't consulted, so the plan
    * is just the size-filtered facts (broadcast-pruned BEFORE any
    * exchange) deduplicated to (part, supp) and counted — exact
    * integers throughout. */
  def q170SupplierRelationship(spark: SparkSession, dir: String): DataFrame = {
    val excluded = Tables.supplier(spark, dir)
      .filter(col("s_acctbal") < 2000).select(col("s_suppkey").as("x_supp"))
    Tables.lineitem(spark, dir)
      .join(broadcast(Tables.part(spark, dir)
          .filter(col("p_size").isin(5, 10, 15, 20, 25, 30, 35, 40))),
        col("l_partkey") === col("p_partkey"))
      .join(broadcast(excluded), col("l_suppkey") === col("x_supp"), "left_anti")
      .select(col("p_brand"), col("p_type"), col("p_size"), col("l_suppkey"))
      .groupBy(col("p_brand"), col("p_type"), col("p_size"))
      .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
      .orderBy(desc("supplier_cnt"), col("p_brand"), col("p_type"), col("p_size"))
  }

  val q170Sql: String =
    s"""WITH $supplySql
       |SELECT p_brand, p_type, p_size,
       |  CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
       |FROM supply
       |JOIN part ON l_partkey = p_partkey
       |WHERE p_size IN (5, 10, 15, 20, 25, 30, 35, 40)
       |  AND l_suppkey NOT IN (
       |    SELECT s_suppkey FROM supplier WHERE s_acctbal < 2000)
       |GROUP BY 1, 2, 3
       |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin

  // ---------------------------------------------------------------- q171
  /** Potential part promotion (TPC-H Q20 shape): NATION_3 suppliers
    * of 'red' parts whose all-time supplied quantity exceeds 2.2×
    * what they shipped in 1996 — the nested IN + correlated-agg
    * shape as two conditional sums in ONE (part, supp) agg (no
    * join-back) and a semi join to suppliers. Quantities are whole
    * doubles → exact longs; the 2.2× threshold is the integer
    * cross-multiply qty·10 > shipped·22. */
  def q171PromotionSuppliers(spark: SparkSession, dir: String): DataFrame = {
    val redParts = Tables.part(spark, dir)
      .filter(col("p_name").like("red%")).select(col("p_partkey"))
    val y96 = col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
      col("l_shipdate") < lit("1997-01-01").cast("timestamp")
    val qualifying = Tables.lineitem(spark, dir)
      .join(broadcast(redParts), col("l_partkey") === col("p_partkey"))
      .groupBy(col("l_partkey"), col("l_suppkey"))
      .agg(sum(col("l_quantity")).cast("long").as("qty"),
        coalesce(sum(when(y96, col("l_quantity"))), lit(0.0)).cast("long").as("q96"))
      .filter(col("qty") * 10 > col("q96") * 22)
      .select(col("l_suppkey")) // left_semi below dedups — no distinct
    Tables.supplier(spark, dir)
      .join(broadcast(Tables.nation(spark, dir).filter(col("n_name") === "NATION_3")),
        col("s_nationkey") === col("n_nationkey"))
      .join(qualifying, col("s_suppkey") === col("l_suppkey"), "left_semi")
      .select(col("s_suppkey"), col("s_name"))
      .orderBy(col("s_name"), col("s_suppkey"))
  }

  val q171Sql: String =
    """WITH q AS (
      |  SELECT l_partkey, l_suppkey,
      |    CAST(sum(l_quantity) AS BIGINT) AS qty,
      |    CAST(coalesce(sum(CASE WHEN l_shipdate >= TIMESTAMP '1996-01-01'
      |      AND l_shipdate < TIMESTAMP '1997-01-01'
      |      THEN l_quantity END), 0) AS BIGINT) AS q96
      |  FROM lineitem
      |  WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'red%')
      |  GROUP BY 1, 2)
      |SELECT s_suppkey, s_name
      |FROM supplier
      |JOIN nation ON s_nationkey = n_nationkey
      |WHERE n_name = 'NATION_3'
      |  AND s_suppkey IN (SELECT l_suppkey FROM q WHERE qty * 10 > q96 * 22)
      |ORDER BY s_name, s_suppkey""".stripMargin

  // --------------------------------------------------------------- q196
  /** The SALTED skew join, graded for result-equivalence: the same
    * lineitem⋈orders aggregate computed through
    * [[graft.operators.Partitioning.saltedJoin]] (salt the big side,
    * replicate the small side per salt, join on (key, salt)) must
    * equal a plain equi-join — the oracle IS the plain join, so the
    * DuckDB gate proves the skew-mitigation technique is
    * semantics-preserving on real tables, not just on the spec's
    * synthetic frame. Salting is the manual fallback for skew beyond
    * AQE's sort-merge split (it also fixes skewed shuffled-hash and
    * aggregate-feeding joins); the graded plan pays the replicated
    * small side (8 salts × orders-subset) to spread any hot orderkey
    * over 8 reducers. */
  def q196SaltedJoin(spark: SparkSession, dir: String): DataFrame = {
    val big = Tables.lineitem(spark, dir)
      .select(col("l_orderkey").as("okey"),
        col("l_extendedprice"), col("l_quantity"))
    val small = Tables.orders(spark, dir)
      .filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_orderkey").as("okey"), col("o_orderpriority"))
    graft.operators.Partitioning.saltedJoin(big, small, "okey", salts = 8)
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_items"),
        round(sum(col("l_extendedprice")), 2).as("revenue"),
        sum(col("l_quantity")).cast("double").as("qty"))
      .orderBy(col("o_orderpriority"))
  }

  val q196Sql: String =
    """SELECT o.o_orderpriority,
      |  count(*) AS n_items,
      |  round(sum(l.l_extendedprice), 2) AS revenue,
      |  CAST(sum(l.l_quantity) AS DOUBLE) AS qty
      |FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
      |WHERE o.o_orderpriority = '1-URGENT'
      |GROUP BY o.o_orderpriority
      |ORDER BY o.o_orderpriority""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q196_salted_join" -> (q196SaltedJoin _),
    "q121_market_share" -> (q121MarketShare _),
    "q122_volume_shipping" -> (q122VolumeShipping _),
    "q130_top_supplier" -> (q130TopSupplier _),
    "q167_min_cost_supplier" -> (q167MinCostSupplier _),
    "q168_product_profit" -> (q168ProductProfit _),
    "q169_important_supply" -> (q169ImportantSupply _),
    "q170_supplier_relationship" -> (q170SupplierRelationship _),
    "q171_promotion_suppliers" -> (q171PromotionSuppliers _),
    "q112_cust_distribution" -> (q112CustDistribution _),
    "q113_dormant_rich" -> (q113DormantRich _),
    "q114_promo_revenue" -> (q114PromoRevenue _),
    "q115_small_quantity" -> (q115SmallQuantity _),
    "q100_order_priority" -> (q100OrderPriority _),
    "q101_priority_shipmix" -> (q101PriorityShipmix _),
    "q102_disjunctive_revenue" -> (q102DisjunctiveRevenue _),
    "q103_waiting_supplier" -> (q103WaitingSupplier _),
    "q97_union_by_name" -> (q97UnionByName _),
    "q96_bloom_semi_join" -> (q96BloomSemiJoin _),
    "q94_stat_aggregates" -> (q94StatAggregates _),
    "q91_rank_family" -> (q91RankFamily _),
    "q88_grouping_sets" -> (q88GroupingSets _),
    "q79_min_cost_supplier" -> (q79MinCostSupplier _),
    "q80_cube" -> (q80Cube _),
    "q81_pivot" -> (q81Pivot _),
    "q82_unpivot" -> (q82Unpivot _),
    "q01_pricing_summary" -> (q01Pricing _),
    "q02_global_agg" -> (q02GlobalAgg _),
    "q03_shipping_priority" -> (q03Shipping _),
    "q04_filter_project" -> (q04FilterProject _),
    "q05_distinct" -> (q05Distinct _),
    "q06_union" -> (q06Union _),
    "q07_outer_join" -> (q07OuterJoin _),
    "q08_semi_join" -> (q08SemiJoin _),
    "q09_anti_join" -> (q09AntiJoin _),
    "q10_cross" -> (q10Cross _),
    "q11_min_max_by" -> (q11MaxBy _),
    "q12_first_n_per_group" -> (q12FirstN _),
    "q13_top_k" -> (q13TopK _),
    "q14_returned_revenue" -> (q14Returns _),
    "q44_local_supplier" -> (q44LocalSupplier _),
    "q45_forecast_revenue" -> (q45ForecastRevenue _),
    "q46_topk_custom" -> (q46TopKCustom _),
    "q47_rollup" -> (q47Rollup _),
    "q48_window_analytics" -> (q48WindowAnalytics _),
    "q49_percentiles" -> (q49Percentiles _),
    "q58_intersect" -> (q58Intersect _),
    "q59_except_all" -> (q59ExceptAll _),
    "q60_weblog" -> (q60WebLog _),
    "q64_large_orders" -> (q64LargeOrders _))

  def oracles: Map[String, String] = Map(
    "q196_salted_join" -> q196Sql,
    "q121_market_share" -> q121Sql,
    "q122_volume_shipping" -> q122Sql,
    "q130_top_supplier" -> q130Sql,
    "q167_min_cost_supplier" -> q167Sql,
    "q168_product_profit" -> q168Sql,
    "q169_important_supply" -> q169Sql,
    "q170_supplier_relationship" -> q170Sql,
    "q171_promotion_suppliers" -> q171Sql,
    "q112_cust_distribution" -> q112Sql,
    "q113_dormant_rich" -> q113Sql,
    "q114_promo_revenue" -> q114Sql,
    "q115_small_quantity" -> q115Sql,
    "q100_order_priority" -> q100Sql,
    "q101_priority_shipmix" -> q101Sql,
    "q102_disjunctive_revenue" -> q102Sql,
    "q103_waiting_supplier" -> q103Sql,
    "q97_union_by_name" -> q97Sql,
    "q96_bloom_semi_join" -> q96Sql,
    "q94_stat_aggregates" -> q94Sql,
    "q91_rank_family" -> q91Sql,
    "q88_grouping_sets" -> q88Sql,
    "q79_min_cost_supplier" -> q79Sql,
    "q80_cube" -> q80Sql,
    "q81_pivot" -> q81Sql,
    "q82_unpivot" -> q82Sql,
    "q01_pricing_summary" -> q01Sql,
    "q02_global_agg" -> q02Sql,
    "q03_shipping_priority" -> q03Sql,
    "q04_filter_project" -> q04Sql,
    "q05_distinct" -> q05Sql,
    "q06_union" -> q06Sql,
    "q07_outer_join" -> q07Sql,
    "q08_semi_join" -> q08Sql,
    "q09_anti_join" -> q09Sql,
    "q10_cross" -> q10Sql,
    "q11_min_max_by" -> q11Sql,
    "q12_first_n_per_group" -> q12Sql,
    "q13_top_k" -> q13Sql,
    "q14_returned_revenue" -> q14Sql,
    "q44_local_supplier" -> q44Sql,
    "q45_forecast_revenue" -> q45Sql,
    "q46_topk_custom" -> q46Sql,
    "q47_rollup" -> q47Sql,
    "q48_window_analytics" -> q48Sql,
    "q49_percentiles" -> q49Sql,
    "q58_intersect" -> q58Sql,
    "q59_except_all" -> q59Sql,
    "q60_weblog" -> q60Sql,
    "q64_large_orders" -> q64Sql)
}
