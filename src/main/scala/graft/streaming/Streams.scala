package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming surface (SURVEY.md §2.6 — the reference's
  * stock Flink DataStream layer: `/root/reference`
  * flink-streaming-java datastream/ + windowing/assigners/).
  *
  * Every transform here takes an unbounded DataFrame/Dataset and
  * declares an incremental plan — the same Catalyst operators as the
  * batch forms in [[graft.operators.Windows]], so batch and stream
  * share semantics (and tests cross-check them). Watermarks bound
  * state; late data beyond the watermark is dropped (Flink's
  * allowed-lateness side output has no Structured Streaming analogue
  * — documented gap, unused by the benchmarks).
  */
object Streams {

  case class Ev(event_id: Long, ts: Timestamp, user_id: Long,
      event_type: String, value: Double)

  /** Unbounded read of the events table (file-stream source over the
    * scale dir; one file today, a growing directory in production —
    * same plan either way). */
  def eventsStream(spark: SparkSession, sfDir: String): DataFrame =
    spark.readStream
      .schema("event_id BIGINT, ts BIGINT, user_id BIGINT, event_type STRING, value DOUBLE, props STRING")
      .option("pathGlobFilter", "events.parquet")
      .parquet(sfDir)
      .withColumn("ts", expr("timestamp_micros(ts div 1000)"))

  /** Tumbling 5-minute windows per event_type with a 10-minute
    * watermark (TumblingEventTimeWindows + the IoT per-window agg,
    * SparkWorks.java:312-346). State per open window only; partial
    * aggregation runs before the stateful store exactly as in batch.
    */
  def tumbling(events: DataFrame): DataFrame =
    events.withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "5 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"), min(col("value")).as("min_v"),
        max(col("value")).as("max_v"), round(sum(col("value")), 2).as("sum_v"))

  /** Sliding 10/5-minute windows (SlidingEventTimeWindows). */
  def sliding(events: DataFrame): DataFrame =
    events.withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "10 minutes", "5 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sum_v"))

  /** Session windows, 30-minute gap (EventTimeSessionWindows —
    * dynamic merge of overlapping [ts, ts+gap) ranges). */
  def session(events: DataFrame): DataFrame =
    events.withWatermark("ts", "30 minutes")
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
      .agg(count(lit(1)).as("n_events"), round(sum(col("value")), 2).as("sum_v"))

  /** Streaming exact-dedup on event_id within the watermark horizon —
    * the unbounded form of [[graft.pipeline.Dedup.q28ExactDedup]];
    * state is bounded by the watermark. */
  def dedup(events: DataFrame): DataFrame =
    events.withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark("event_id")

  /** Count windows (reference KeyedStream.countWindow,
    * KeyedStream.java:653) — no Structured Streaming built-in, so a
    * custom stateful operator: per key, emit one row per completed
    * batch of `size` events. State = (window index, count, sum) — 24
    * bytes per key, watermark-free (count windows never expire in
    * Flink either).
    */
  case class CountWinState(winIdx: Long, n: Long, sum: Double)
  case class CountWin(user_id: Long, win_idx: Long, n: Long, sum_v: Double)

  def countWindow(events: Dataset[Ev], size: Int): Dataset[CountWin] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[CountWinState, CountWin](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (uid: Long, it: Iterator[Ev], state: GroupState[CountWinState]) =>
          var s = state.getOption.getOrElse(CountWinState(0L, 0L, 0.0))
          val out = scala.collection.mutable.ArrayBuffer.empty[CountWin]
          // deterministic intra-batch order for the spec's asserts
          it.toSeq.sortBy(_.event_id).foreach { e =>
            s = CountWinState(s.winIdx, s.n + 1, s.sum + e.value)
            if (s.n == size) {
              out += CountWin(uid, s.winIdx, s.n, math.rint(s.sum * 100) / 100)
              s = CountWinState(s.winIdx + 1, 0L, 0.0)
            }
          }
          state.update(s)
          out.iterator
      }
  }

  /** Interval join (reference KeyedStream.intervalJoin,
    * KeyedStream.java:425): each left event joins right events of the
    * same user within [0, +5 minutes) of its timestamp. Watermarks on
    * BOTH sides plus the time-range condition let the state store
    * evict rows once the range can no longer match — the required
    * shape for unbounded stream-stream joins.
    */
  def intervalJoin(left: DataFrame, right: DataFrame,
      joinType: String = "inner"): DataFrame = {
    // rename BEFORE watermarking: aliasing afterwards would mint new
    // attributes without the watermark metadata and the time-range
    // join would never emit
    val l = left
      .select(col("event_id").as("l_id"), col("user_id").as("l_user"),
        col("ts").as("l_ts"), col("value").as("l_value"))
      .withWatermark("l_ts", "10 minutes")
    val r = right
      .select(col("event_id").as("r_id"), col("user_id").as("r_user"),
        col("ts").as("r_ts"), col("value").as("r_value"))
      .withWatermark("r_ts", "10 minutes")
    // outer flavors emit the null-padded row only once the watermark
    // proves no match can still arrive — supported since both sides
    // are watermarked and the condition bounds the wait
    l.join(r,
      col("l_user") === col("r_user") &&
        col("r_ts") >= col("l_ts") &&
        col("r_ts") < col("l_ts") + expr("INTERVAL 5 MINUTES") &&
        col("l_id") =!= col("r_id"),
      joinType)
  }

  /** Broadcast-state pattern (reference BroadcastConnectedStream): a
    * slow-changing dimension joined onto the stream — in Spark a plain
    * stream-static join; the static side broadcasts into every
    * micro-batch. */
  def enrich(events: DataFrame, dim: DataFrame): DataFrame =
    events.join(org.apache.spark.sql.functions.broadcast(dim), Seq("user_id"), "left_outer")

  /** foreachBatch sink (the reference's side-output / multi-sink
    * answer, SURVEY.md §2.6): each micro-batch lands as a batch
    * DataFrame with its batch id, so one stream can feed several
    * batch writers transactionally-enough (idempotent by batchId). */
  def toForeachBatch(df: DataFrame, name: String)(
      handle: (DataFrame, Long) => Unit): org.apache.spark.sql.streaming.StreamingQuery =
    df.writeStream.queryName(name)
      .outputMode(OutputMode.Append())
      .foreachBatch(handle)
      .start()

  /** Streaming top-level demo: tumbling agg of the events file stream
    * written to an in-memory sink; returns the query result table
    * after processing everything available (used by specs/smoke, not
    * the batch gate). */
  def runTumblingOnce(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    val q = tumbling(eventsStream(spark, sfDir))
      .writeStream.format("memory").queryName(name)
      .outputMode(OutputMode.Append()).start()
    q.processAllAvailable()
    q.stop()
    spark.table(name)
  }
}
