package graft.operators

import org.apache.spark.sql.{DataFrame, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Typed custom aggregation — the reference's GroupCombineFunction /
  * combineGroup semantics (`/root/reference` flink-java
  * DataSet.java:521, AllGroupCombineDriver.java): an explicit
  * partial-aggregate that merges across partitions before the final
  * reduce. Spark's `Aggregator[IN, BUF, OUT]` is the exact analogue:
  * `reduce` runs map-side per partition (the "combine"), `merge`
  * combines partials across the shuffle, `finish` runs once per key —
  * so the shuffle carries one 24-byte buffer per (partition, key)
  * instead of the rows.
  */
object Aggregators {

  /** One-pass moment sketch: (n, Σx, Σx²) → (count, mean, sample
    * stddev). The buffer is the combineGroup partial. */
  case class Moments(n: Long, sum: Double, sumSq: Double)
  case class Stats(n: Long, mean: Double, stddev: Double)

  class StatsAgg extends Aggregator[Double, Moments, Stats] {
    override def zero: Moments = Moments(0L, 0.0, 0.0)
    override def reduce(b: Moments, x: Double): Moments =
      Moments(b.n + 1, b.sum + x, b.sumSq + x * x)
    override def merge(a: Moments, b: Moments): Moments =
      Moments(a.n + b.n, a.sum + b.sum, a.sumSq + b.sumSq)
    override def finish(m: Moments): Stats = {
      val mean = m.sum / m.n
      val variance = if (m.n < 2) 0.0 else (m.sumSq - m.sum * m.sum / m.n) / (m.n - 1)
      Stats(m.n, mean, math.sqrt(math.max(variance, 0.0)))
    }
    override def bufferEncoder: Encoder[Moments] = Encoders.product[Moments]
    override def outputEncoder: Encoder[Stats] = Encoders.product[Stats]
  }

  // ---------------------------------------------------------------- q43
  /** Per-event-type value statistics through the typed Aggregator.
    * Results are rounded to 4 decimals — partials merge in shuffle
    * order, so the raw moments differ across engines in the last ulp
    * (exactly why the oracle applies the same sum-of-squares formula,
    * not Welford).
    */
  def q43AggregatorStats(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val statsCol = new StatsAgg().toColumn
    Tables.events(spark, dir)
      .select(col("event_type"), col("value")).as[(String, Double)]
      .groupByKey(_._1)
      .mapValues(_._2)
      .agg(statsCol.name("stats"))
      .select(col("key").as("event_type"),
        col("stats.n").as("n"),
        round(col("stats.mean"), 4).as("mean"),
        round(col("stats.stddev"), 4).as("stddev"))
      .orderBy(col("event_type"))
  }

  val q43Sql: String =
    """SELECT event_type, count(*) AS n,
      |  round(sum(value) / count(*), 4) AS mean,
      |  round(sqrt(greatest((sum(value*value) - sum(value)*sum(value)/count(*))
      |                        / (count(*) - 1), 0.0)), 4) AS stddev
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q43_aggregator_stats" -> (q43AggregatorStats _))

  def oracles: Map[String, String] = Map(
    "q43_aggregator_stats" -> q43Sql)
}
