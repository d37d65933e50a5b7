package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.plans.TopK
import graft.sources.Tables

class TopKSpec extends AnyFunSuite with SparkSpec {

  test("topKPerKey keeps the same value multiset as window row_number") {
    val orders = Tables.orders(spark, sf)
    val custom = TopK.topKPerKey(orders, 3, col("o_totalprice"), col("o_custkey"))
      .select(col("o_custkey"), col("o_totalprice"))
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted.toSeq).toMap
    val w = Window.partitionBy(col("o_custkey")).orderBy(desc("o_totalprice"))
    val viaWindow = orders
      .withColumn("rk", row_number().over(w)).filter(col("rk") <= 3)
      .select(col("o_custkey"), col("o_totalprice"))
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted.toSeq).toMap
    assert(custom == viaWindow)
    assert(custom.nonEmpty)
  }

  test("global top-k (no keys) equals orderBy-limit values") {
    val li = Tables.lineitem(spark, sf)
    val custom = TopK.topKPerKey(li, 25, col("l_extendedprice"))
      .select("l_extendedprice").collect().map(_.getDouble(0)).sorted.toSeq
    val viaSort = li.orderBy(desc("l_extendedprice")).limit(25)
      .select("l_extendedprice").collect().map(_.getDouble(0)).sorted.toSeq
    assert(custom == viaSort)
  }

  test("plan shows partial and final phases around one exchange") {
    val plan = TopK.topKPerKey(Tables.orders(spark, sf), 3,
      col("o_totalprice"), col("o_custkey")).queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerKeyPartial"), plan)
    assert(plan.contains("TopKPerKeyFinal"), plan)
    assert(plan.split("Exchange").length == 2, s"expected exactly 1 exchange:\n$plan")
    // partial must run BELOW the exchange (map-side)
    assert(plan.indexOf("TopKPerKeyFinal") < plan.indexOf("Exchange"))
    assert(plan.indexOf("Exchange") < plan.indexOf("TopKPerKeyPartial"))
  }

  test("null order values are dropped, k larger than group is fine") {
    import spark.implicits._
    val df = Seq(("a", Some(1.0)), ("a", None), ("b", Some(5.0)))
      .toDF("k", "v")
    val out = TopK.topKPerKey(df, 10, col("v"), col("k"))
      .collect().map(r => (r.getString(0), r.getDouble(1))).toSet
    assert(out == Set(("a", 1.0), ("b", 5.0)))
  }
}
