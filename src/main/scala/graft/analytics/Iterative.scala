package graft.analytics

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** The reference's seven benchmark workloads (SURVEY.md §2.8 —
  * `/root/reference` flink-examples-batch tornadovm/ + clustering/ +
  * exus/) re-expressed as deterministic Spark plans over the driver
  * testdata, each with a DuckDB oracle.
  *
  * Iterative workloads (KMeans, LogisticRegression) follow the MLlib
  * pattern: tiny model state lives on the driver, is folded through
  * [[graft.engine.Iterate.loop]], and re-enters each superstep as
  * literals (a broadcast of k doubles); the data never collects. To
  * keep the driver's hash-compare stable across engines, model state
  * is rounded to 6 decimals after every superstep — FP noise dies at
  * each step instead of compounding (the reference's own answer to
  * cross-device noise is a 0.01 tolerance,
  * TestMatrixMultiplication.java:88).
  */
object Iterative {

  private def r6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** [[graft.engine.Localize]] with the working-set unpersist as the
    * release action — see that object for the why. */
  private def localized(spark: SparkSession, result: DataFrame,
      cached: DataFrame*): DataFrame =
    graft.engine.Localize(result) { cached.foreach(_.unpersist(blocking = false)) }

  // ---------------------------------------------------------------- q22
  /** Matrix multiply (TestMatrixMultiplication.java:59-78): C = A×Bᵀ
    * for A = embeddings[0,32), B = embeddings[32,64). The reference
    * broadcasts matrix B to every worker and dot-products row-wise;
    * here B is a Spark `broadcast` side of a nested-loop join and the
    * dot product is the native codegen expression
    * [[graft.plans.DotProduct]] (ascending-index fold ⇒ deterministic
    * sum order). At 100 TB: A streams, B stays a broadcast — no
    * shuffle at all.
    */
  def q22MatMul(spark: SparkSession, dir: String): DataFrame = {
    graft.plans.Functions.register(spark)
    val emb = Tables.embeddings(spark, dir)
    val a = emb.filter(col("vec_id") < 32).select(col("vec_id").as("i"), col("embedding").as("ea"))
    val b = emb.filter(col("vec_id") >= 32 && col("vec_id") < 64)
      .select(col("vec_id").as("j"), col("embedding").as("eb"))
    a.crossJoin(broadcast(b))
      .select(col("i"), col("j"),
        round(call_function("graft_dot", col("ea"), col("eb")), 4).as("dot"))
      .orderBy(col("i"), col("j"))
  }

  val q22Sql: String =
    """SELECT a.vec_id AS i, b.vec_id AS j,
      |  round(list_sum(list_transform(range(64),
      |    k -> CAST(a.embedding[k+1] AS DOUBLE) * CAST(b.embedding[k+1] AS DOUBLE))), 4) AS dot
      |FROM embeddings a CROSS JOIN embeddings b
      |WHERE a.vec_id < 32 AND b.vec_id >= 32 AND b.vec_id < 64
      |ORDER BY i, j""".stripMargin

  // ---------------------------------------------------------------- q23
  /** KMeans (clustering/KMeans.java:118-129): k=4 1-D clustering of
    * `events.value`, 3 supersteps, fixed init. Each superstep is the
    * reference's map(SelectNearestCenter, broadcast centroids) →
    * groupBy(cid) → CentroidAccumulator/Averager pipeline collapsed
    * into one hash-agg job; the 4-double model is driver state.
    * Nearest-center argmin is `array_min` over (distance, cid) structs
    * — lexicographic, so ties break to the lowest cid on both engines.
    */
  private def kmeansCidExpr(cs: Array[Double]): Column =
    array_min(array(cs.zipWithIndex.toIndexedSeq.map { case (c, i) =>
      struct(abs(col("value") - lit(c)).as("d"), lit(i).as("cid"))
    }: _*)).getField("cid")

  /** The q23 training loop (persisted working set + 3 supersteps of
    * assign/average over fixed init), shared between the graded query
    * and the kernel-seam restatement of its assign step. */
  private def kmeansFit(spark: SparkSession, dir: String): (DataFrame, Array[Double]) = {
    // cache the working set: every superstep (plus the final
    // assignment) re-scans it — memory-resident like MLlib's kmeans
    val ev = Tables.events(spark, dir).select(col("event_id"), col("value"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val cents = graft.engine.Iterate.loop(Array(50.0, 150.0, 250.0, 350.0), 3) { (cs, _) =>
      val upd = ev.withColumn("cid", kmeansCidExpr(cs))
        .groupBy("cid").agg(avg("value").as("c"))
        .collect()
        .map(r => r.getInt(0) -> r6(r.getDouble(1))).toMap
      cs.indices.map(i => upd.getOrElse(i, cs(i))).toArray
    }
    (ev, cents)
  }

  def q23KMeans(spark: SparkSession, dir: String): DataFrame = {
    val (ev, cents) = kmeansFit(spark, dir)
    def cidExpr(cs: Array[Double]): Column = kmeansCidExpr(cs)
    val centMap = map(cents.zipWithIndex.toIndexedSeq.flatMap { case (c, i) => Seq(lit(i), lit(c)) }: _*)
    localized(spark, ev.withColumn("cid", cidExpr(cents))
      .groupBy(col("cid"))
      .agg(count(lit(1)).as("n"))
      .withColumn("centroid", element_at(centMap, col("cid")))
      .select(col("cid"), col("n"), col("centroid"))
      .orderBy(col("cid")), ev)
  }

  val q23Sql: String =
    """WITH c0(cid, c) AS (VALUES (0, 50.0), (1, 150.0), (2, 250.0), (3, 350.0)),
      |a1 AS (SELECT e.event_id, e.value,
      |         CAST(min([abs(e.value - c.c), CAST(c.cid AS DOUBLE)])[2] AS INT) AS cid
      |       FROM events e CROSS JOIN c0 c GROUP BY e.event_id, e.value),
      |c1 AS (SELECT p.cid, coalesce(round(u.c, 6), p.c) AS c FROM c0 p
      |       LEFT JOIN (SELECT cid, avg(value) AS c FROM a1 GROUP BY cid) u ON p.cid = u.cid),
      |a2 AS (SELECT e.event_id, e.value,
      |         CAST(min([abs(e.value - c.c), CAST(c.cid AS DOUBLE)])[2] AS INT) AS cid
      |       FROM events e CROSS JOIN c1 c GROUP BY e.event_id, e.value),
      |c2 AS (SELECT p.cid, coalesce(round(u.c, 6), p.c) AS c FROM c1 p
      |       LEFT JOIN (SELECT cid, avg(value) AS c FROM a2 GROUP BY cid) u ON p.cid = u.cid),
      |a3 AS (SELECT e.event_id, e.value,
      |         CAST(min([abs(e.value - c.c), CAST(c.cid AS DOUBLE)])[2] AS INT) AS cid
      |       FROM events e CROSS JOIN c2 c GROUP BY e.event_id, e.value),
      |c3 AS (SELECT p.cid, coalesce(round(u.c, 6), p.c) AS c FROM c2 p
      |       LEFT JOIN (SELECT cid, avg(value) AS c FROM a3 GROUP BY cid) u ON p.cid = u.cid),
      |af AS (SELECT e.event_id,
      |         CAST(min([abs(e.value - c.c), CAST(c.cid AS DOUBLE)])[2] AS INT) AS cid
      |       FROM events e CROSS JOIN c3 c GROUP BY e.event_id, e.value)
      |SELECT af.cid, count(*) AS n, any_value(c3.c) AS centroid
      |FROM af JOIN c3 ON af.cid = c3.cid
      |GROUP BY af.cid ORDER BY af.cid""".stripMargin

  // ---------------------------------------------------------------- q24
  /** Logistic regression, batch gradient descent
    * (exus/LogisticRegression.java:44-92: iterate(map SubUpdate →
    * reduce UpdateAccumulator → map Update), then Predict → Evaluate
    * confusion matrix → ComputeMetrics). Here: 2 supersteps of
    * full-batch GD on lineitem (label = quantity > 25, features
    * quantity/50, discount*10, extendedprice/1e5 + bias), weights are
    * 4 driver doubles rounded per step; one agg job per superstep
    * computes all 4 gradient components (single pass, partial agg —
    * the reference needs a map+reduce pair per step). Final job emits
    * weights, confusion counts and accuracy/F1.
    */
  def q24LogReg(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir).select(
      (col("l_quantity") / 50.0).as("x1"),
      (col("l_discount") * 10.0).as("x2"),
      (col("l_extendedprice") / 100000.0).as("x3"),
      when(col("l_quantity") > 25, 1.0).otherwise(0.0).as("y"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val lr = 2.0
    def z(w: Array[Double]): Column =
      lit(w(0)) + lit(w(1)) * col("x1") + lit(w(2)) * col("x2") + lit(w(3)) * col("x3")
    val w = graft.engine.Iterate.loop(Array(0.0, 0.0, 0.0, 0.0), 2) { (ws, _) =>
      val p = lit(1.0) / (lit(1.0) + exp(-z(ws)))
      val g = li.agg(
        avg((p - col("y"))).as("g0"),
        avg((p - col("y")) * col("x1")).as("g1"),
        avg((p - col("y")) * col("x2")).as("g2"),
        avg((p - col("y")) * col("x3")).as("g3")).first()
      Array.tabulate(4)(i => r6(ws(i) - lr * g.getDouble(i)))
    }
    val pred = (z(w) > 0).cast("int")
    val yi = col("y").cast("int")
    localized(spark, li.agg(
      sum(when(pred === 1 && yi === 1, 1L).otherwise(0L)).as("tp"),
      sum(when(pred === 1 && yi === 0, 1L).otherwise(0L)).as("fp"),
      sum(when(pred === 0 && yi === 1, 1L).otherwise(0L)).as("fn"),
      sum(when(pred === 0 && yi === 0, 1L).otherwise(0L)).as("tn"))
      .select(
        lit(w(0)).as("w0"), lit(w(1)).as("w1"), lit(w(2)).as("w2"), lit(w(3)).as("w3"),
        col("tp"), col("fp"), col("fn"), col("tn"),
        round((col("tp") + col("tn")) / (col("tp") + col("fp") + col("fn") + col("tn")).cast("double"), 4).as("accuracy")), li)
  }

  /** Oracle: identical GD unrolled as CTEs; iteration 1 has w=0 so
    * sigmoid is exactly 0.5 (no transcendentals); iteration 2 uses
    * exp() on both engines with weights equalized by the per-step
    * round(6). */
  val q24Sql: String =
    """WITH f AS (SELECT l_quantity/50.0 AS x1, l_discount*10.0 AS x2,
      |                  l_extendedprice/100000.0 AS x3,
      |                  CASE WHEN l_quantity > 25 THEN 1.0 ELSE 0.0 END AS y
      |           FROM lineitem),
      |w1 AS (SELECT round(0 - 2.0*avg(0.5 - y), 6)      AS w0,
      |              round(0 - 2.0*avg((0.5 - y)*x1), 6) AS w1,
      |              round(0 - 2.0*avg((0.5 - y)*x2), 6) AS w2,
      |              round(0 - 2.0*avg((0.5 - y)*x3), 6) AS w3
      |       FROM f),
      |w2 AS (SELECT round(w1.w0 - 2.0*avg(1.0/(1.0+exp(-(w1.w0 + w1.w1*x1 + w1.w2*x2 + w1.w3*x3))) - y), 6)      AS w0,
      |              round(w1.w1 - 2.0*avg((1.0/(1.0+exp(-(w1.w0 + w1.w1*x1 + w1.w2*x2 + w1.w3*x3))) - y)*x1), 6) AS w1,
      |              round(w1.w2 - 2.0*avg((1.0/(1.0+exp(-(w1.w0 + w1.w1*x1 + w1.w2*x2 + w1.w3*x3))) - y)*x2), 6) AS w2,
      |              round(w1.w3 - 2.0*avg((1.0/(1.0+exp(-(w1.w0 + w1.w1*x1 + w1.w2*x2 + w1.w3*x3))) - y)*x3), 6) AS w3
      |       FROM f, w1 GROUP BY w1.w0, w1.w1, w1.w2, w1.w3),
      |cm AS (SELECT
      |  sum(CASE WHEN (w0 + w1*x1 + w2*x2 + w3*x3) > 0 AND y = 1.0 THEN 1 ELSE 0 END)::BIGINT AS tp,
      |  sum(CASE WHEN (w0 + w1*x1 + w2*x2 + w3*x3) > 0 AND y = 0.0 THEN 1 ELSE 0 END)::BIGINT AS fp,
      |  sum(CASE WHEN (w0 + w1*x1 + w2*x2 + w3*x3) <= 0 AND y = 1.0 THEN 1 ELSE 0 END)::BIGINT AS fn,
      |  sum(CASE WHEN (w0 + w1*x1 + w2*x2 + w3*x3) <= 0 AND y = 0.0 THEN 1 ELSE 0 END)::BIGINT AS tn
      |  FROM f, w2)
      |SELECT w2.w0, w2.w1, w2.w2, w2.w3, cm.tp, cm.fp, cm.fn, cm.tn,
      |  round((cm.tp + cm.tn) / CAST(cm.tp + cm.fp + cm.fn + cm.tn AS DOUBLE), 4) AS accuracy
      |FROM w2, cm""".stripMargin

  // ---------------------------------------------------------------- q99
  /** Linear regression by batch gradient descent — the reference's
    * stock ML example (`flink-examples-batch ml/LinearRegression.java`:
    * iterate { map SubUpdate (broadcast params) → reduce sum → map
    * Update }), the last §2.8 stock example: fit
    * y ≈ θ0 + θ1·x on (quantity, price), 2 supersteps with the same
    * driver-state/broadcast-literal shape as q24 — gradients are one
    * partial-aggregated avg pass per step, θ re-enters as literals
    * (no lineage growth), model state rounded per superstep (HALF_UP
    * on both engines) so the oracle's unrolled CTEs match bit-for-bit.
    * Residual MSE is reported the same way.
    */
  def q99LinReg(spark: SparkSession, dir: String): DataFrame = {
    val pts = Tables.lineitem(spark, dir).select(
      (col("l_quantity") / 50.0).as("x"),
      (col("l_extendedprice") / 100000.0).as("y"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val alpha = 0.5
    def pred(ts: Array[Double]): Column = lit(ts(0)) + lit(ts(1)) * col("x")
    val t = graft.engine.Iterate.loop(Array(0.0, 0.0), 2) { (ts, _) =>
      val g = pts.agg(
        avg(pred(ts) - col("y")).as("g0"),
        avg((pred(ts) - col("y")) * col("x")).as("g1")).first()
      Array(r6(ts(0) - alpha * g.getDouble(0)), r6(ts(1) - alpha * g.getDouble(1)))
    }
    val e = pred(t) - col("y")
    localized(spark, pts.agg(round(avg(e * e), 6).as("mse"))
      .select(lit(t(0)).as("theta0"), lit(t(1)).as("theta1"), col("mse")), pts)
  }

  val q99Sql: String =
    """WITH f AS (SELECT l_quantity/50.0 AS x, l_extendedprice/100000.0 AS y
      |           FROM lineitem),
      |s1 AS (SELECT round(0 - 0.5*avg(0 + 0*x - y), 6)     AS t0,
      |              round(0 - 0.5*avg((0 + 0*x - y)*x), 6) AS t1
      |       FROM f),
      |s2 AS (SELECT round(s1.t0 - 0.5*avg(s1.t0 + s1.t1*x - y), 6)     AS t0,
      |              round(s1.t1 - 0.5*avg((s1.t0 + s1.t1*x - y)*x), 6) AS t1
      |       FROM f, s1 GROUP BY s1.t0, s1.t1)
      |SELECT s2.t0 AS theta0, s2.t1 AS theta1,
      |  round(avg((s2.t0 + s2.t1*x - y)*(s2.t0 + s2.t1*x - y)), 6) AS mse
      |FROM f, s2 GROUP BY s2.t0, s2.t1""".stripMargin

  // ---------------------------------------------------------------- q25
  /** DFT (TestDFT.java:83-84,151-177): out[k] = Σₙ x[n]·cos(2πkn/N),
    * −Σₙ x[n]·sin(2πkn/N) over the first N=64 event values. The
    * reference maps over indices with the whole signal broadcast;
    * here spark.range(64) × broadcast(signal) → one hash-agg.
    */
  def q25Dft(spark: SparkSession, dir: String): DataFrame = {
    val sig = Tables.events(spark, dir)
      .orderBy(col("event_id")).limit(64)
      .select((row_number().over(Window.orderBy(col("event_id"))) - 1).as("n"), col("value"))
    val ks = spark.range(64).select(col("id").cast("int").as("k"))
    val ang = lit(2.0) * lit(math.Pi) * col("k") * col("n") / lit(64.0)
    ks.crossJoin(broadcast(sig))
      .groupBy(col("k"))
      // `+ 0.0` after rounding collapses IEEE −0.0 to +0.0 (a −0.0 shows
      // up whenever the sine sum rounds to zero) so hashes agree.
      .agg((round(sum(col("value") * cos(ang)), 4) + lit(0.0)).as("re"),
        (round(-sum(col("value") * sin(ang)), 4) + lit(0.0)).as("im"))
      .orderBy(col("k"))
  }

  val q25Sql: String =
    """WITH sig AS (
      |  SELECT row_number() OVER (ORDER BY event_id) - 1 AS n, value
      |  FROM events ORDER BY event_id LIMIT 64),
      |ks AS (SELECT unnest(range(64)) AS k)
      |SELECT k,
      |  round(sum(value * cos(2.0 * pi() * k * n / 64.0)), 4) + 0.0  AS re,
      |  round(-sum(value * sin(2.0 * pi() * k * n / 64.0)), 4) + 0.0 AS im
      |FROM ks CROSS JOIN sig
      |GROUP BY k ORDER BY k""".stripMargin

  /** q25's DFT restated as the reference's ACTUAL device shape
    * (TestDFT.java:151-177: a map over output indices with the whole
    * signal broadcast, each index computing a signal-length dot) so
    * it can route through the [[graft.plans.DotKernelProjectRule]]
    * accelerator seam: per k row, two array&lt;float&gt; columns —
    * the 64-sample signal (a broadcast literal, the reference's
    * broadcast set) and the cos / negated-sin wave for k — projected
    * through top-level `graft_dot` aliases. With the seam flag off
    * this runs whole-stage codegen over [[graft.plans.DotProduct]];
    * with it on, the batch kernel — DotKernelSpec dual-runs both and
    * checks against graded q25 within the reference's 0.01 gate
    * (float wave/signal vs q25's double path). The im wave carries
    * the minus sign so BOTH outputs stay top-level kernel aliases
    * (a `-graft_dot(…)` wrapper would disqualify the projection). */
  def dftViaDotKernel(spark: SparkSession, dir: String): DataFrame = {
    graft.plans.Functions.register(spark)
    // 64 samples: bounded model state, the reference broadcasts the
    // same signal to every map instance
    val sig: Seq[Float] = Tables.events(spark, dir)
      .orderBy(col("event_id")).limit(64)
      .select(col("value")).collect().map(_.getDouble(0).toFloat).toSeq
    val ks = spark.range(64).select(col("id").cast("int").as("k"))
    def ang(n: Column) = lit(2.0) * lit(math.Pi) * col("k") * n / lit(64.0)
    ks.select(col("k"), typedLit(sig).as("sig"),
        transform(sequence(lit(0), lit(63)), n => cos(ang(n)).cast("float")).as("cw"),
        transform(sequence(lit(0), lit(63)), n => (-sin(ang(n))).cast("float")).as("nsw"))
      .selectExpr("k", "graft_dot(sig, cw) AS re", "graft_dot(sig, nsw) AS im")
      .orderBy(col("k"))
  }

  /** q22's MatMul restated as the reference's ACTUAL device shape
    * (TestMatrixMultiplication.java:159-187 `TestMatrixMul.map`: each
    * row of A maps to a FULL output row — one dot against every
    * broadcast-matrix column, `matrix2` read from a broadcast
    * variable in open()): one projection per A row emitting the 32
    * per-B-row dots as top-level `graft_dot` aliases, B collected
    * once into array literals (32×64 floats — bounded model state,
    * the reference's broadcast set). SIXTH seam-covered reference
    * workload class — the map side of workload #1, the only one of
    * the seven whose inner loop the dot-kernel seam didn't already
    * cover (q22 itself grades the join-shaped restatement with ONE
    * dot per row pair; the device kernel batches all 32). With the
    * seam flag off this runs whole-stage codegen over
    * [[graft.plans.DotProduct]]; with it on, the batch kernel —
    * DotKernelSpec dual-runs both bit-equal and checks each dot
    * against graded q22 within the reference's 0.01 dual-run gate.
    * Returns (dot batch, B vec_ids in alias order). */
  private[graft] def matmulDotBatch(
      spark: SparkSession, dir: String): (DataFrame, Array[Long]) = {
    graft.plans.Functions.register(spark)
    val emb = Tables.embeddings(spark, dir)
    val bRows = emb.filter(col("vec_id") >= 32 && col("vec_id") < 64)
      .select(col("vec_id"), col("embedding"))
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1))
      .sortBy(_._1)
    val a = emb.filter(col("vec_id") < 32)
      .select(col("vec_id").as("i"), col("embedding").as("ea"))
    val lifted = a.select(
      Seq(col("i"), col("ea")) ++ bRows.zipWithIndex.map { case ((_, v), j) =>
        typedLit(v).as(s"bw$j") }: _*)
    val dotted = lifted.selectExpr(
      Seq("i") ++ bRows.indices.map(j => s"graft_dot(ea, bw$j) AS d$j"): _*)
    (dotted, bRows.map(_._1))
  }

  /** q23's ASSIGN step (KMeans.java:118-129 SelectNearestCenter: a
    * map over points with the centroids broadcast, each point scored
    * against every centroid) restated as the device shape GPU kmeans
    * actually uses — distances via DOT PRODUCTS:
    * argmin_c ‖x−c‖² = argmin_c (c·c − 2·x·c), the x·x term constant
    * per point. One projection emits the K per-centroid dots as
    * top-level `graft_dot` aliases (the kernel batch — the c²/2
    * offset and argmin live in the NEXT projection, because an
    * arithmetic wrapper around the dot would disqualify the kernel
    * projection, same as the DFT's negated-sin device); the argmin
    * reuses q23's lexicographic struct-min tie rule. Fifth
    * seam-covered reference workload class: DotKernelSpec dual-runs
    * kernel-on vs codegen (bit-equal — same float fold) and both vs
    * graded q23's cluster counts. */
  def kmeansAssignViaDotKernel(spark: SparkSession, dir: String): DataFrame = {
    val (dotted, cents, ev) = kmeansDotBatch(spark, dir)
    // the device→host handoff: materialize the kernel's output batch
    // BEFORE the host-side argmin consumes it. Structurally required,
    // not just faithful — Catalyst's CollapseProject would otherwise
    // inline each dot into the argmin's struct arithmetic, and a
    // wrapped kernel expression no longer qualifies as a top-level
    // projection (the DFT restatement never hit this because its dots
    // ARE the final output columns). The batch is (event_id, K
    // doubles) — model-assignment-sized, never corpus-wide columns.
    val batch = dotted.localCheckpoint(true)
    val centMap = map(cents.zipWithIndex.toIndexedSeq.flatMap {
      case (c, i) => Seq(lit(i), lit(c)) }: _*)
    localized(spark, batch
      .select(col("event_id"),
        array_min(array(cents.zipWithIndex.toIndexedSeq.map { case (c, i) =>
          struct((lit(c * c) - lit(2.0) * col(s"d$i")).as("s"), lit(i).as("cid"))
        }: _*)).getField("cid").as("cid"))
      .groupBy(col("cid"))
      .agg(count(lit(1)).as("n"))
      .withColumn("centroid", element_at(centMap, col("cid")))
      .select(col("cid"), col("n"), col("centroid"))
      .orderBy(col("cid")), ev)
  }

  /** The kernel stage behind [[kmeansAssignViaDotKernel]]: per point
    * one top-level `graft_dot` alias per broadcast centroid — the
    * batch the seam spec asserts plans as a DotKernelProject.
    * Returns (dot batch, centroids, the persisted working set to
    * release after the read). */
  private[graft] def kmeansDotBatch(
      spark: SparkSession, dir: String): (DataFrame, Array[Double], DataFrame) = {
    graft.plans.Functions.register(spark)
    val (ev, cents) = kmeansFit(spark, dir)
    val lifted = ev.select(
      Seq(col("event_id"), array(col("value").cast("float")).as("xv")) ++
        cents.zipWithIndex.map { case (c, i) =>
          typedLit(Seq(c.toFloat)).as(s"cw$i") }: _*)
    val dotted = lifted.selectExpr(
      Seq("event_id") ++ cents.indices.map(i => s"graft_dot(xv, cw$i) AS d$i"): _*)
    (dotted, cents, ev)
  }

  // ---------------------------------------------------------------- q26
  /** Pi estimation (TestPiEstimation.java:52-58): the reference maps
    * an LCG sample per index and sum-reduces the in-circle count.
    * Same shape: range(1M) → integer-hash point in [0,2³⁰)² →
    * exact integer in-circle test → count. All arithmetic is integer
    * and identical across engines — no FP tolerance needed at all.
    * Scales embarrassingly: range splits per partition, one partial
    * count each.
    */
  val piN = 1000000L
  def q26Pi(spark: SparkSession, dir: String): DataFrame = {
    val xi = (col("id") * 2654435761L) % 1073741824L
    val yi = ((col("id") + 7919L) * 2246822519L) % 1073741824L
    spark.range(piN)
      .select(xi.as("xi"), yi.as("yi"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("xi") * col("xi") + col("yi") * col("yi") <= 1152921504606846976L, 1L)
          .otherwise(0L)).as("cnt"))
      .select(col("n"), col("cnt"),
        (lit(4.0) * col("cnt") / col("n")).as("pi_est"))
  }

  val q26Sql: String =
    s"""SELECT count(*)::BIGINT AS n,
      |  sum(CASE WHEN xi*xi + yi*yi <= 1152921504606846976 THEN 1 ELSE 0 END)::BIGINT AS cnt,
      |  4.0 * sum(CASE WHEN xi*xi + yi*yi <= 1152921504606846976 THEN 1 ELSE 0 END)::BIGINT
      |      / count(*) AS pi_est
      |FROM (SELECT (i*2654435761) % 1073741824 AS xi,
      |             ((i+7919)*2246822519) % 1073741824 AS yi
      |      FROM range($piN) t(i))""".stripMargin

  // ---------------------------------------------------------------- q27
  /** Vector addition (TestVectorAddition.java:66-68: map (f0, f1+f1)):
    * elementwise v+v per embedding — double addition is exact here
    * (one exponent step), so values hash-match bit-for-bit. Output is
    * exploded to one scalar row per element `(vec_id, idx, v)`: the
    * grading harness sorts result frames by every column and cannot
    * hash array cells, and the exploded form compares each element
    * exactly without any cross-engine float-to-string formatting.
    * Pure narrow map + generate: no shuffle, whole-stage codegen.
    */
  def q27VAdd(spark: SparkSession, dir: String): DataFrame =
    Tables.embeddings(spark, dir)
      .select(col("vec_id"), posexplode(col("embedding")).as(Seq("idx", "x")))
      .select(col("vec_id"), col("idx").cast("long").as("idx"),
        (col("x").cast("double") + col("x").cast("double")).as("v"))
      .orderBy(col("vec_id"), col("idx"))

  val q27Sql: String =
    """SELECT vec_id,
      |  unnest(range(len(embedding))) AS idx,
      |  unnest(list_transform(embedding, x -> CAST(x AS DOUBLE) + CAST(x AS DOUBLE))) AS v
      |FROM embeddings ORDER BY vec_id, idx""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q22_matmul" -> (q22MatMul _),
    "q23_kmeans" -> (q23KMeans _),
    "q24_logreg" -> (q24LogReg _),
    "q99_linreg" -> (q99LinReg _),
    "q25_dft" -> (q25Dft _),
    "q26_pi" -> (q26Pi _),
    "q27_vadd" -> (q27VAdd _))

  def oracles: Map[String, String] = Map(
    "q22_matmul" -> q22Sql,
    "q23_kmeans" -> q23Sql,
    "q24_logreg" -> q24Sql,
    "q99_linreg" -> q99Sql,
    "q25_dft" -> q25Sql,
    "q26_pi" -> q26Sql,
    "q27_vadd" -> q27Sql)
}
