package graft.engine

import org.apache.spark.sql.DataFrame

/** Driver-side iteration helper — the Spark-idiomatic replacement for
  * the reference's `IterativeDataSet`/`DeltaIteration` dataflow nodes
  * (`/root/reference` flink-java DataSet.java:1191,1241 and
  * flink-runtime iterative/task/IterationHeadTask.java et al.).
  *
  * Flink runs supersteps inside the dataflow with a sync barrier per
  * iteration; Spark has no iteration operator, so the idiomatic form
  * (same as MLlib) is a driver loop re-submitting jobs. Two hazards at
  * scale, both handled here:
  *
  *   - lineage growth: each superstep stacks a plan on top of the
  *     last; after tens of steps analysis/codegen time dominates and a
  *     lost-partition recompute replays the whole history. We truncate
  *     with `localCheckpoint` every `checkpointEvery` steps.
  *   - tiny driver state (e.g. k centroids) is better carried as plain
  *     Scala values re-broadcast into literals each step than as a
  *     DataFrame — see [[graft.analytics.Iterative]].
  */
object Iterate {

  /** Fold a plain driver-side state through n supersteps. */
  def loop[A](init: A, n: Int)(step: (A, Int) => A): A =
    (1 to n).foldLeft(init)(step)

  /** Iterate a DataFrame-valued superstep with periodic lineage
    * truncation (eager localCheckpoint). */
  def loopDF(init: DataFrame, n: Int, checkpointEvery: Int = 5)(
      step: (DataFrame, Int) => DataFrame): DataFrame = {
    var cur = init
    for (i <- 1 to n) {
      cur = step(cur, i)
      if (checkpointEvery > 0 && i % checkpointEvery == 0)
        cur = cur.localCheckpoint(true)
    }
    cur
  }

  /** Bulk iteration with a termination criterion — Flink's
    * `IterativeDataSet.closeWith(result, terminationCriterion)` and
    * `registerAggregationConvergenceCriterion` (reference flink-java
    * DataSet.java:1191; flink-core aggregators/
    * ConvergenceCriterion.java): after each superstep, `converged`
    * inspects the (checkpointed) new state and the step index; the
    * loop stops at the first true, or after `maxIter`. The state is
    * checkpointed EVERY superstep here — the criterion is a driver-
    * side action on it, so an uncheckpointed lineage would replay
    * history once per convergence probe (the twice-read rule).
    * Returns (state, stepsRun). */
  def loopDFUntil(init: DataFrame, maxIter: Int)(
      step: (DataFrame, Int) => DataFrame)(
      converged: (DataFrame, Int) => Boolean): (DataFrame, Int) = {
    var cur = init.localCheckpoint(true)
    var i = 0
    var done = false
    while (i < maxIter && !done) {
      cur = step(cur, i + 1).localCheckpoint(true)
      i += 1
      done = converged(cur, i)
    }
    (cur, i)
  }

  /** Delta-iteration shape (ConnectedComponents-style): iterate while
    * the workset is non-empty, up to maxIter. `step` maps
    * (solution, workset) → (solution', workset'); both are
    * checkpointed each superstep so the convergence count() doesn't
    * replay history.
    */
  def delta(solution: DataFrame, workset: DataFrame, maxIter: Int)(
      step: (DataFrame, DataFrame) => (DataFrame, DataFrame)): DataFrame = {
    var sol = solution.localCheckpoint(true)
    var ws = workset.localCheckpoint(true)
    var i = 0
    while (i < maxIter && !ws.isEmpty) {
      val (s2, w2) = step(sol, ws)
      sol = s2.localCheckpoint(true)
      ws = w2.localCheckpoint(true)
      i += 1
    }
    sol
  }
}
