package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.analytics.Iterative

class IterativeSpec extends AnyFunSuite with SparkSpec {

  test("q22 matmul is the 32x32 Gram block with symmetric-free dots") {
    val rows = Iterative.q22MatMul(spark, sf).collect()
    assert(rows.length == 32 * 32)
    // dot(a, b) for unit-ish embeddings stays bounded
    assert(rows.forall(r => math.abs(r.getDouble(2)) < 64))
  }

  test("q22 matmul plan broadcasts B and has no shuffle exchange") {
    val plan = Iterative.q22MatMul(spark, sf).queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastExchange"))
  }

  test("q23 kmeans partitions all events into 4 ordered clusters") {
    val rows = Iterative.q23KMeans(spark, sf).collect()
    assert(rows.map(_.getInt(0)).toSeq == Seq(0, 1, 2, 3))
    val n = rows.map(_.getLong(1)).sum
    assert(n == spark.read.parquet(s"$sf/events.parquet").count())
    // centroids strictly increasing for 1-D kmeans with ordered init
    val cents = rows.map(_.getDouble(2)).toSeq
    assert(cents == cents.sorted)
  }

  test("q24 logreg confusion matrix partitions lineitem") {
    val r = Iterative.q24LogReg(spark, sf).head()
    val total = r.getLong(4) + r.getLong(5) + r.getLong(6) + r.getLong(7)
    assert(total == spark.read.parquet(s"$sf/lineitem.parquet").count())
    val acc = r.getDouble(8)
    assert(acc > 0.5 && acc <= 1.0) // label depends on a feature: better than chance
  }

  test("q25 dft: k=0 bin equals the plain signal sum") {
    val re0 = Iterative.q25Dft(spark, sf).filter(col("k") === 0).head.getDouble(1)
    val expected = spark.read.parquet(s"$sf/events.parquet")
      .orderBy("event_id").limit(64).agg(round(sum("value"), 4)).head.getDouble(0)
    assert(math.abs(re0 - expected) < 1e-9)
  }

  test("q26 pi estimate lands near pi with exact integer arithmetic") {
    val r = Iterative.q26Pi(spark, sf).head()
    assert(r.getLong(0) == Iterative.piN)
    assert(math.abs(r.getDouble(2) - math.Pi) < 0.01)
  }

  test("q27 vadd doubles every component exactly") {
    val out = Iterative.q27VAdd(spark, sf).filter(col("vec_id") === 7)
      .orderBy(col("idx")).collect().map(_.getDouble(2)).toSeq
    val in = spark.read.parquet(s"$sf/embeddings.parquet")
      .filter(col("vec_id") === 7).head.getSeq[Float](1)
    assert(out == in.map(x => x.toDouble + x.toDouble))
  }

  test("q99 linreg: two GD steps beat the zero model and slope is positive") {
    import org.apache.spark.sql.functions._
    val r = graft.analytics.Iterative.q99LinReg(spark, sf).head()
    val (t0, t1, mse) = (r.getDouble(0), r.getDouble(1), r.getDouble(2))
    // price grows with quantity on this data: learned slope must be positive
    assert(t1 > 0.0, s"slope $t1")
    // fitting must beat predicting zero (the initial model)
    val zeroMse = spark.read.parquet(s"$sf/lineitem.parquet")
      .select((col("l_extendedprice") / 100000.0).as("y"))
      .agg(avg(col("y") * col("y"))).head.getDouble(0)
    assert(mse < zeroMse, s"mse $mse not below zero-model $zeroMse")
  }

  test("Iterate.loopDF truncates lineage via localCheckpoint") {
    val out = graft.engine.Iterate.loopDF(spark.range(10).toDF("v"), 6, checkpointEvery = 2) {
      (df, _) => df.withColumn("v", col("v") + 1)
    }
    assert(out.agg(sum("v")).head.getLong(0) == (6L * 10 + 45))
    // after a checkpoint the logical plan no longer stacks 6 projects
    assert(out.queryExecution.optimizedPlan.toString.contains("LogicalRDD") ||
      out.queryExecution.optimizedPlan.toString.length < 2000)
  }

  test("Iterate.loopDFUntil stops at the convergence criterion, not maxIter") {
    // doubling walk capped by a threshold criterion — Flink's
    // closeWith(result, terminationCriterion) shape
    val (out, steps) = graft.engine.Iterate.loopDFUntil(
      spark.range(1).toDF("v"), maxIter = 50) { (df, _) =>
      df.withColumn("v", col("v") * 2 + 1)
    } { (df, _) => df.agg(max("v")).head.getLong(0) >= 100 }
    assert(steps == 7, s"2^k-1 crosses 100 at k=7, ran $steps")
    assert(out.head.getLong(0) == 127L)
    // maxIter still bounds a never-converging criterion
    val (_, capped) = graft.engine.Iterate.loopDFUntil(
      spark.range(1).toDF("v"), maxIter = 3) { (df, _) => df } { (_, _) => false }
    assert(capped == 3)
  }
}
