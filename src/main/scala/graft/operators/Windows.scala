package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Event-time window aggregation surface (SURVEY.md §2.6 — the
  * reference's windowing assigners under
  * `/root/reference` flink-streaming-java windowing/assigners/ and the
  * IoT benchmark's 5-minute bucketing, SparkWorks.java:312-346):
  * tumbling, sliding and session windows on the `events` table, plus
  * the declarative two-phase outlier pipeline (IoT.java:124-153).
  *
  * These are the BATCH forms; graft.streaming runs the same plans as
  * Structured Streaming queries. `events.ts` arrives as epoch-nanos
  * LongType (TESTDATA parquet is TIMESTAMP(NANOS)); we convert with
  * integer arithmetic (`div`) so bucket boundaries are exact.
  */
object Windows {

  /** events with a proper TimestampType `ts_us` column (micros). */
  private def eventsTs(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir).withColumn("ts_us", expr("timestamp_micros(ts div 1000)"))

  /** Tumbling 5-minute windows per event_type — the IoT per-window
    * MIN/MAX/SUM/AVG/COUNT pipeline. One shuffle on (window, type);
    * partial aggregation collapses each partition to ≤ one row per
    * (window, type) before the exchange, so 100 TB of events shuffles
    * only #windows × #types rows per partition.
    */
  def q18Tumbling(spark: SparkSession, dir: String): DataFrame =
    eventsTs(spark, dir)
      .groupBy(window(col("ts_us"), "5 minutes"), col("event_type"))
      // avg computed as exact-cents / count: `value` is cent-precise, so
      // round(sum(value*100)) is an exact integer and the single division
      // is bit-identical across engines — unlike round(avg(...), 2), which
      // hits .005 ties on tiny windows where Spark (HALF_UP on decimal
      // string) and DuckDB (binary double) disagree.
      .agg(
        count(lit(1)).as("n"),
        min(col("value")).as("min_v"),
        max(col("value")).as("max_v"),
        round(sum(col("value")), 2).as("sum_v"),
        (round(sum(col("value") * 100), 0) / (count(lit(1)) * lit(100.0))).as("avg_v"))
      .select(col("window.start").cast("long").as("w_start"), col("event_type"),
        col("n"), col("min_v"), col("max_v"), col("sum_v"), col("avg_v"))
      .orderBy(col("w_start"), col("event_type"))

  val q18Sql: String =
    """SELECT (epoch_us(ts) // 300000000) * 300 AS w_start, event_type,
      |  count(*) AS n,
      |  min(value) AS min_v,
      |  max(value) AS max_v,
      |  round(sum(value), 2) AS sum_v,
      |  round(sum(value * 100), 0) / (count(*) * 100.0) AS avg_v
      |FROM events
      |GROUP BY 1, 2
      |ORDER BY 1, 2""".stripMargin

  /** Sliding windows: 10-minute length, 5-minute slide, per
    * event_type. Spark expands each event into length/slide = 2
    * window replicas before the aggregation — the same fan-out the
    * oracle materializes explicitly.
    */
  def q19Sliding(spark: SparkSession, dir: String): DataFrame =
    eventsTs(spark, dir)
      .groupBy(window(col("ts_us"), "10 minutes", "5 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sum_v"))
      .select(col("window.start").cast("long").as("w_start"), col("event_type"),
        col("n"), col("sum_v"))
      .orderBy(col("w_start"), col("event_type"))

  val q19Sql: String =
    """SELECT ((epoch_us(ts) // 300000000) - k) * 300 AS w_start, event_type,
      |  count(*) AS n, round(sum(value), 2) AS sum_v
      |FROM events CROSS JOIN (VALUES (0), (1)) AS offsets(k)
      |GROUP BY 1, 2
      |ORDER BY 1, 2""".stripMargin

  /** Session windows (EventTimeSessionWindows, 30-minute gap) per
    * user: a new session starts when the gap since the previous event
    * of that user is ≥ 30 min. Spark's session_window merges windows
    * whose [ts, ts+gap) ranges overlap — identical semantics.
    */
  def q20Session(spark: SparkSession, dir: String): DataFrame =
    eventsTs(spark, dir)
      .groupBy(col("user_id"), session_window(col("ts_us"), "30 minutes"))
      .agg(
        count(lit(1)).as("n_events"),
        round(sum(col("value")), 2).as("sum_v"))
      .select(col("user_id"),
        col("session_window.start").cast("long").as("sess_start"),
        col("n_events"), col("sum_v"))
      .orderBy(col("user_id"), col("sess_start"))

  val q20Sql: String =
    """WITH flagged AS (
      |  SELECT user_id, value, event_id, epoch_us(ts) AS t_us,
      |    CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER w >= 1800000000
      |         OR lag(epoch_us(ts)) OVER w IS NULL THEN 1 ELSE 0 END AS new_sess
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
      |), sessions AS (
      |  SELECT user_id, value, t_us,
      |    sum(new_sess) OVER (PARTITION BY user_id ORDER BY t_us, event_id
      |                        ROWS UNBOUNDED PRECEDING) AS sess_id
      |  FROM flagged)
      |SELECT user_id, min(t_us) // 1000000 AS sess_start,
      |  count(*) AS n_events, round(sum(value), 2) AS sum_v
      |FROM sessions
      |GROUP BY user_id, sess_id
      |ORDER BY user_id, sess_start""".stripMargin

  /** Declarative two-phase outlier detection — the 100 TB-safe form
    * of [[Typed.q17GroupReduceOutliers]] (same oracle): per-user
    * stats via one hash-agg, broadcast the tiny stats table back onto
    * the stream, filter. No group buffering, no window sort.
    */
  def q21OutliersJoin(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir).select(col("event_id"), col("user_id"), col("value"))
    val stats = ev.groupBy(col("user_id").as("s_uid"))
      .agg(avg(col("value")).as("mu"),
        when(count(lit(1)) < 2, lit(0.0)).otherwise(stddev_samp(col("value"))).as("sigma"))
    ev.join(broadcast(stats), col("user_id") === col("s_uid"))
      .filter(abs(col("value") - col("mu")) > lit(2) * col("sigma"))
      .select(col("event_id"), col("user_id"), col("value"))
      .orderBy(col("event_id"))
  }

  // ---------------------------------------------------------------- q83
  /** Time-series resampling with gap fill — the telemetry op between
    * raw events and a dashboard/model: regularize each user's stream
    * onto an hourly grid spanning their own activity window, count
    * events per cell, and FORWARD-FILL the per-hour metric across
    * silent hours (IGNORE NULLS running last). Plan: one hourly
    * hash-agg keyed by (user, hour), a per-user grid explode from the
    * tiny bounds relation (sequence is bounded by each user's span in
    * hours, never event count), a left join back, and one user-keyed
    * window — every shuffle is user-keyed, so 100 TB of telemetry
    * scales by users × span, not events. The carried metric is the
    * hourly MAX — an exact pick of one input double, bit-identical
    * across engines with no rounding. An hourly MEAN would need
    * rounding, and cells here hold 1-2 events, exactly where
    * HALF_UP/HALF_EVEN tie-breaking diverges cross-engine (it did,
    * at sf0.01).
    */
  val ResampleHourNs: Long = 3600L * 1000000000L

  def q83Resample(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .select(col("user_id"), expr(s"ts div ${ResampleHourNs}L").as("hour"), col("value"))
    val hourly = ev.groupBy(col("user_id"), col("hour"))
      .agg(count(lit(1)).as("n"), max(col("value")).as("v"))
    val grid = hourly.groupBy(col("user_id").as("g_uid"))
      .agg(min(col("hour")).as("h0"), max(col("hour")).as("h1"))
      .select(col("g_uid"), explode(sequence(col("h0"), col("h1"))).as("hour"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("g_uid")).orderBy(col("hour"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    grid.join(hourly, col("g_uid") === hourly("user_id") && grid("hour") === hourly("hour"),
        "left_outer")
      .select(col("g_uid").as("user_id"), grid("hour").as("hour"),
        coalesce(col("n"), lit(0L)).as("n_events"), col("v"))
      .withColumn("v_fill", last(col("v"), ignoreNulls = true).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("user_id"))
          .orderBy(col("hour")).rowsBetween(
            org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)))
      .drop("v")
      .orderBy(col("user_id"), col("hour"))
  }

  val q83Sql: String =
    s"""WITH e AS (SELECT user_id, epoch_ns(ts) // $ResampleHourNs AS hour, value
       |           FROM events),
       |hourly AS (SELECT user_id, hour, count(*) AS n, max(value) AS v
       |           FROM e GROUP BY user_id, hour),
       |grid AS (SELECT user_id, unnest(generate_series(h0, h1)) AS hour
       |         FROM (SELECT user_id, min(hour) AS h0, max(hour) AS h1
       |               FROM hourly GROUP BY user_id))
       |SELECT g.user_id, g.hour, coalesce(h.n, 0) AS n_events,
       |  last_value(h.v IGNORE NULLS) OVER (PARTITION BY g.user_id ORDER BY g.hour
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS v_fill
       |FROM grid g LEFT JOIN hourly h ON g.user_id = h.user_id AND g.hour = h.hour
       |ORDER BY g.user_id, g.hour""".stripMargin

  // ---------------------------------------------------------------- q92
  /** Batch sessionization via gap islands — the manual (lag → flag →
    * running sum) twin of q20's `session_window`, emitting what q20
    * cannot: the ordered per-session EVENT-TYPE SEQUENCE, i.e. the
    * sample shape a behavioral-pretraining pipeline feeds a model
    * (session → "view view click purchase"), plus duration. The
    * islands form is also the portable one — q20's oracle already
    * states it in SQL; here both engines run it.
    *
    * Scale shape: one shuffle on user_id; both window passes (lag,
    * running sum) reuse that sort; the session agg re-keys by
    * (user, sess_id). Session state is bounded by the gap rule, and
    * the sequence agg sorts only within one session's rows.
    */
  def q92Sessionize(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id")).orderBy(col("t_us"), col("event_id"))
    val ev = Tables.events(spark, dir)
      .select(col("user_id"), col("event_id"), col("event_type"),
        expr("ts div 1000").as("t_us"))
    val lagged = lag(col("t_us"), 1).over(w)
    val sess = ev
      .withColumn("new_sess",
        when(col("t_us") - lagged >= 1800000000L || lagged.isNull, 1).otherwise(0))
      .withColumn("sess_id", sum(col("new_sess")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    sess.groupBy(col("user_id"), col("sess_id"))
      .agg(min(col("t_us")).as("min_us"), max(col("t_us")).as("max_us"),
        count(lit(1)).as("n_events"),
        concat_ws(" ", transform(
          sort_array(collect_list(struct(col("t_us"), col("event_id"), col("event_type")))),
          s => s.getField("event_type"))).as("seq"))
      .select(col("user_id"), expr("min_us div 1000000").as("sess_start"),
        col("n_events"), expr("(max_us - min_us) div 1000000").as("duration_s"),
        col("seq"))
      .orderBy(col("user_id"), col("sess_start"))
  }

  val q92Sql: String =
    """WITH flagged AS (
      |  SELECT user_id, event_id, event_type, epoch_us(ts) AS t_us,
      |    CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER w >= 1800000000
      |         OR lag(epoch_us(ts)) OVER w IS NULL THEN 1 ELSE 0 END AS new_sess
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
      |), sessions AS (
      |  SELECT user_id, event_id, event_type, t_us,
      |    sum(new_sess) OVER (PARTITION BY user_id ORDER BY t_us, event_id
      |                        ROWS UNBOUNDED PRECEDING) AS sess_id
      |  FROM flagged)
      |SELECT user_id, min(t_us) // 1000000 AS sess_start,
      |  count(*) AS n_events,
      |  (max(t_us) - min(t_us)) // 1000000 AS duration_s,
      |  string_agg(event_type, ' ' ORDER BY t_us, event_id) AS seq
      |FROM sessions
      |GROUP BY user_id, sess_id
      |ORDER BY user_id, sess_start""".stripMargin

  // ---------------------------------------------------------------- q93
  /** Trailing time-RANGE window — per event, the count and value sum
    * of the SAME USER's events in the preceding hour (inclusive):
    * `RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW` over
    * epoch-micros. The frame is time-based, so it is well-defined
    * under timestamp ties (all tie rows join the frame in both
    * engines — no order-dependence), unlike a ROWS frame. This is the
    * windowed-aggregation view of what q67's range JOIN computes
    * pairwise; per-user sort, one shuffle, state is one sliding frame
    * per user.
    */
  val TrailMicros = 3600000000L

  def q93TrailingWindow(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id")).orderBy(col("t_us"))
      .rangeBetween(-TrailMicros, 0)
    Tables.events(spark, dir)
      .select(col("user_id"), col("event_id"), expr("ts div 1000").as("t_us"), col("value"))
      .select(col("user_id"), col("event_id"), col("t_us"),
        count(lit(1)).over(w).as("n_trail"),
        round(sum(col("value")).over(w), 2).as("sum_trail"))
  }

  val q93Sql: String =
    s"""SELECT user_id, event_id, epoch_us(ts) AS t_us,
       |  count(*) OVER w AS n_trail,
       |  round(sum(value) OVER w, 2) AS sum_trail
       |FROM events
       |WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
       |             RANGE BETWEEN $TrailMicros PRECEDING AND CURRENT ROW)""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q93_trailing_window" -> (q93TrailingWindow _),
    "q92_sessionize" -> (q92Sessionize _),
    "q83_resample" -> (q83Resample _),
    "q18_window_tumbling" -> (q18Tumbling _),
    "q19_window_sliding" -> (q19Sliding _),
    "q20_session_window" -> (q20Session _),
    "q21_outliers_join" -> (q21OutliersJoin _))

  def oracles: Map[String, String] = Map(
    "q93_trailing_window" -> q93Sql,
    "q92_sessionize" -> q92Sql,
    "q83_resample" -> q83Sql,
    "q18_window_tumbling" -> q18Sql,
    "q19_window_sliding" -> q19Sql,
    "q20_session_window" -> q20Sql,
    "q21_outliers_join" -> Typed.q17Sql)
}
