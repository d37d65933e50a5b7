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

  test("graft_cosine swaps through the same seam, bit-equal to codegen") {
    def cosTopPairs(s: SparkSession): DataFrame = {
      graft.plans.Functions.register(s)
      val emb = s.read.parquet(s"$sf/embeddings.parquet")
      val a = emb.filter(col("vec_id") < 24)
        .select(col("vec_id").as("i"), col("embedding").as("ea"))
      val b = emb.filter(col("vec_id") >= 24 && col("vec_id") < 48)
        .select(col("vec_id").as("j"), col("embedding").as("eb"))
      a.join(broadcast(b))
        .select(col("i"), col("j"), expr("graft_cosine(ea, eb)").as("c"))
        .orderBy(col("i"), col("j"))
    }
    val kernel = spark.newSession()
    kernel.conf.set(graft.plans.DotKernelProjectRule.EnabledKey, "true")
    val plain = cosTopPairs(spark)
    assert(!planString(plain).contains("DotKernelProject"))
    val swapped = cosTopPairs(kernel)
    assert(planString(swapped).contains("DotKernelProject"),
      "enabled session must route graft_cosine through the kernel operator:\n" +
        planString(swapped))
    val base = plain.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val kern = swapped.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(base.length == kern.length && base.nonEmpty)
    base.zip(kern).foreach { case ((i1, j1, v1), (i2, j2, v2)) =>
      assert(i1 == i2 && j1 == j2)
      assert(v1 == v2, s"($i1,$j1): codegen $v1 vs kernel $v2")
    }
  }

  test("mixed dot + cosine projection runs both kernels in one operator") {
    val kernel = spark.newSession()
    kernel.conf.set(graft.plans.DotKernelProjectRule.EnabledKey, "true")
    graft.plans.Functions.register(kernel)
    graft.plans.Functions.register(spark)
    def q(s: SparkSession): Array[(Long, Double, Double)] = {
      val emb = s.read.parquet(s"$sf/embeddings.parquet").filter(col("vec_id") < 64)
      val df = emb.select(col("vec_id"),
          expr("graft_dot(embedding, embedding)").as("d"),
          expr("graft_cosine(embedding, embedding)").as("c"))
        .orderBy("vec_id")
      df.collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
    }
    val base = q(spark)
    val kern = q(kernel)
    assert(base.length == kern.length)
    base.zip(kern).foreach { case (bt, kt) =>
      assert(bt == kt, s"codegen $bt vs kernel $kt")
    }
    // self-cosine: na==nb==s bit-wise, but sqrt(na)*sqrt(na) can be an
    // ulp off na, so the quotient is 1.0 ± 1 ulp — not exactly 1.0
    assert(kern.forall { case (_, d, c) =>
      d >= 0.0 && (d == 0.0 || math.abs(c - 1.0) < 1e-14) })
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
