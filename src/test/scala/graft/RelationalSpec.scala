package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local session for all specs (one per suite, lazy). */
trait SparkSpec { self: AnyFunSuite =>
  lazy val spark: SparkSession = TestSpark.spark
  val sf: String = "/root/testdata/sf0.001"
}

object TestSpark {
  lazy val spark: SparkSession = {
    val s = graft.engine.GraftSession.local("graft-test", "4")
    s
  }
}

class RelationalSpec extends AnyFunSuite with SparkSpec {

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracle-declared query has a queries entry") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracleSql without queries: $missing")
  }

  test("all queries run non-empty on sf0.001") {
    val allowEmpty = Set("q09_anti_join") // anti-join may legitimately be empty at tiny SF
    SparkEntry.queries.foreach { case (name, fn) =>
      val n = fn(spark, sf).count()
      assert(allowEmpty(name) || n > 0, s"$name returned 0 rows")
    }
  }

  test("q01 aggregates match a hand computation") {
    import org.apache.spark.sql.functions._
    val got = graft.operators.Relational.q01Pricing(spark, sf)
    val total = got.agg(sum("count_order")).head.getLong(0)
    val expected = spark.read.parquet(s"$sf/lineitem.parquet")
      .filter(col("l_shipdate") <= lit("1997-09-02").cast("timestamp")).count()
    assert(total == expected)
  }

  test("q03 plan broadcasts the customer side") {
    val plan = graft.operators.Relational.q03Shipping(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastExchange"))
  }

  test("q58 intersect equals distinct semi-join of the two sides") {
    import org.apache.spark.sql.functions._
    val c = spark.read.parquet(s"$sf/customer.parquet")
    val rich = c.filter(col("c_acctbal") > 5000).select("c_mktsegment", "c_nationkey").distinct()
    val poor = c.filter(col("c_acctbal") < 0).select("c_mktsegment", "c_nationkey").distinct()
    val viaSemi = rich.join(poor, Seq("c_mktsegment", "c_nationkey"), "left_semi")
      .orderBy("c_mktsegment", "c_nationkey")
    val got = graft.operators.Relational.q58Intersect(spark, sf)
    assert(got.collect().toSeq == viaSemi.collect().toSeq)
  }

  test("q59 exceptAll keeps max(n-m, 0) multiplicity per key") {
    import org.apache.spark.sql.functions._
    val l = spark.read.parquet(s"$sf/lineitem.parquet").filter(col("l_suppkey") < 40)
    val expected = l.groupBy("l_suppkey")
      .agg((count(lit(1)) - count(when(col("l_returnflag") === "R", 1))).as("n_kept"))
      .filter(col("n_kept") > 0)
      .orderBy("l_suppkey")
    val got = graft.operators.Relational.q59ExceptAll(spark, sf)
    assert(got.collect().toSeq == expected.collect().toSeq)
  }

  test("q64's IN subquery rewrites to a semi join, not a nested loop") {
    val plan = graft.operators.Relational.q64LargeOrders(spark, sf)
      .queryExecution.optimizedPlan.toString
    assert(plan.contains("LeftSemi"), s"expected semi-join rewrite in:\n$plan")
    assert(!plan.toLowerCase.contains("nestedloop"))
  }

  test("as-of join equals the brute-force latest-at-or-before lookup") {
    import org.apache.spark.sql.functions._
    val ev = graft.sources.Tables.events(spark, sf)
    val clicks = ev.filter(col("event_type") === "click")
      .select("event_id", "user_id", "ts").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2) / 1000))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), expr("ts div 1000").as("ts"), col("value"))
      .groupBy("user_id", "ts").agg(max("value").as("v")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val expected = clicks.map { case (id, u, t) =>
      val prior = purchases.filter(p => p._1 == u && p._2 <= t)
      if (prior.isEmpty) (id, 0.0, -1L)
      else { val best = prior.maxBy(_._2); (id, best._3, best._2) }
    }.sortBy(_._1).toSeq
    val got = graft.operators.AsOfJoin.q66AsOfJoin(spark, sf).collect()
      .map(r => (r.getLong(0), r.getDouble(3), r.getLong(4))).toSeq
    assert(got == expected)
    assert(got.nonEmpty && got.exists(_._3 >= 0), "no as-of match exercised")
  }

  test("binned range join equals the brute-force trailing-window scan") {
    import org.apache.spark.sql.functions._
    val ev = graft.sources.Tables.events(spark, sf)
    val clicks = ev.filter(col("event_type") === "click")
      .select("event_id", "user_id", "ts").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2) / 1000))
    val views = ev.filter(col("event_type") === "view")
      .select("user_id", "ts", "value").collect()
      .map(r => (r.getLong(0), r.getLong(1) / 1000, r.getDouble(2)))
    val w = graft.operators.RangeJoin.WindowUs
    val expected = clicks.map { case (id, u, t) =>
      val in = views.filter(v => v._1 == u && v._2 >= t - w && v._2 <= t)
      (id, in.length.toLong, math.rint(in.map(_._3).sum * 100) / 100)
    }.sortBy(_._1).toSeq
    val got = graft.operators.RangeJoin.q67RangeJoin(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(3), r.getDouble(4))).toSeq
    assert(got == expected)
    assert(got.exists(_._2 > 0), "no trailing-window match exercised")
  }

  test("q04 pushes filters to the parquet scan") {
    val plan = graft.operators.Relational.q04FilterProject(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(l_quantity)") || plan.contains("GreaterThanOrEqual(l_quantity"))
  }

  test("q79's correlated scalar subquery is rewritten to an aggregate join") {
    // RewriteCorrelatedScalarSubquery must leave NO per-row subquery
    // execution behind — the plan is agg + equi-join or it doesn't scale
    val plan = graft.operators.Relational.q79MinCostSupplier(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("ScalarSubquery"), s"per-row subquery survived:\n$plan")
    assert(plan.contains("Join"), "expected the rewritten aggregate join")
  }

  test("q96's bloom prefilter prunes probe rows but never changes the join result") {
    import org.apache.spark.sql.functions._
    val R = graft.operators.Relational
    val lineitem = spark.read.parquet(s"$sf/lineitem.parquet")
    val hi = spark.read.parquet(s"$sf/orders.parquet")
      .filter(col("o_totalprice") > R.Q96MinPrice).select(col("o_orderkey"))
    // the prefilter passes every true match (no false negatives)...
    val pre = graft.operators.Sketches.bloomPrefilter(hi, "o_orderkey", 100000L, 0.01)(col("l_orderkey"))
    val exactMatches = lineitem
      .join(hi, col("l_orderkey") === col("o_orderkey"), "left_semi").count()
    val preCount = lineitem.filter(pre).count()
    assert(preCount >= exactMatches, "bloom dropped a true match")
    // ...and actually prunes the probe side
    assert(preCount < lineitem.count(), "prefilter pruned nothing")
    // end-to-end: prefilter + exact verify ≡ plain semi join aggregate
    val viaBloom = R.q96BloomSemiJoin(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq
    val plain = lineitem
      .join(hi, col("l_orderkey") === col("o_orderkey"), "left_semi")
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"), round(sum(col("l_extendedprice")), 2).as("revenue"))
      .orderBy(col("l_returnflag")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(viaBloom == plain)
  }

  test("q81's pivot compiles to one aggregation pass, not per-value scans") {
    val plan = graft.operators.Relational.q81Pivot(spark, sf)
      .queryExecution.executedPlan.toString
    // Spark pivots as two stacked aggregations (by (user, type), then
    // PivotFirst by user) + the output sort — 3 exchanges, but still
    // ONE scan; a per-value union of scans would show one per type
    assert(plan.split("Exchange").length - 1 <= 3, s"too many exchanges:\n$plan")
    assert(plan.split("Scan parquet").length - 1 == 1, "pivot must scan events once")
  }
}
