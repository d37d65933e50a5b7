package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The reference's dual-run acceleration harness
  * (TestMatrixMultiplication.java:80-101: run the workload on the
  * accelerated path and the plain path, compare within 0.01) applied
  * to the phase-6 kernel-project prototype. */
class DotKernelSpec extends AnyFunSuite with SparkSpec {

  private def matmul(s: SparkSession): DataFrame = {
    graft.plans.Functions.register(s)
    val emb = s.read.parquet(s"$sf/embeddings.parquet")
    val a = emb.filter(col("vec_id") < 32)
      .select(col("vec_id").as("i"), col("embedding").as("ea"))
    val b = emb.filter(col("vec_id") >= 32 && col("vec_id") < 64)
      .select(col("vec_id").as("j"), col("embedding").as("eb"))
    a.join(broadcast(b))
      .select(col("i"), col("j"), expr("graft_dot(ea, eb)").as("v"))
      .orderBy(col("i"), col("j"))
  }

  private def planString(df: DataFrame): String = {
    df.collect() // force AQE to finalize before reading the plan
    df.queryExecution.executedPlan.toString
  }

  test("kernel-project rule swaps the plan and matches codegen within the reference tolerance") {
    val kernel = spark.newSession()
    kernel.conf.set(graft.plans.DotKernelProjectRule.EnabledKey, "true")

    val plain = matmul(spark)
    assert(!planString(plain).contains("DotKernelProject"),
      "kernel exec must stay off by default")
    val swapped = matmul(kernel)
    assert(planString(swapped).contains("DotKernelProject"),
      "enabled session must plan the kernel operator:\n" + planString(swapped))

    val base = plain.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val kern = swapped.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(base.length == kern.length && base.nonEmpty)
    base.zip(kern).foreach { case ((i1, j1, v1), (i2, j2, v2)) =>
      assert(i1 == i2 && j1 == j2)
      // the reference accepts |delta| <= 0.01 across devices; the JVM
      // kernel shares codegen's fold order, so demand bit equality
      assert(v1 == v2, s"($i1,$j1): codegen $v1 vs kernel $v2")
    }
  }

  test("nested dot products keep the codegen path") {
    val kernel = spark.newSession()
    kernel.conf.set(graft.plans.DotKernelProjectRule.EnabledKey, "true")
    graft.plans.Functions.register(kernel)
    val emb = kernel.read.parquet(s"$sf/embeddings.parquet")
    val df = emb.select(col("vec_id"),
      round(expr("graft_dot(embedding, embedding)"), 4).as("n2"))
    assert(!planString(df).contains("DotKernelProject"))
    assert(df.count() > 0)
  }
}
