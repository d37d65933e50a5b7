package graft.engine

import org.apache.spark.sql.DataFrame

/** Run a tiny-result plan NOW and hand its rows back as a local
  * relation, releasing whatever distributed state backed it
  * (persisted working sets, per-block broadcasts) via `release`.
  * The pattern behind every iterative/model-building query: without
  * it each invocation leaks pinned executor state into the session —
  * harmless once, ruinous across a 100-query bench loop. Only for
  * results that are small by construction (model rows, thresholded
  * pair sets); corpus-sized outputs must stay distributed. */
object Localize {
  def apply(result: DataFrame)(release: => Unit): DataFrame = {
    val rows = result.collect()
    release
    result.sparkSession.createDataFrame(
      java.util.Arrays.asList(rows: _*), result.schema)
  }
}
