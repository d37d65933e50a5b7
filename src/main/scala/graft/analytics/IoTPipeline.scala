package graft.analytics

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.sources.Formats

/** The reference's IoT sensor-analytics benchmark as one composed
  * program (`/root/reference` IoT.java:59-153 + SparkWorks.java:
  * 81-196,312-456): raw sensor CSV → parse → 5-minute buckets →
  * per-(device, window) MIN/MAX/SUM/AVG/COUNT → outlier detection
  * (|v − μ| > 2σ against per-device stats) → CSV sinks.
  *
  * Differences from the reference, on purpose (SURVEY.md §7 hard
  * parts): no driver-side collect() between stages (the reference
  * collects intermediate lists, which caps its scale at driver
  * memory); the running-average reduce abuse (IoT.java:116-122) is
  * replaced by exact avg(); both sinks stream from executors.
  */
object IoTPipeline {

  val InputSchema: StructType = StructType(Seq(
    StructField("device", StringType),
    StructField("ts_ms", LongType),
    StructField("value", DoubleType)))

  /** 5-minute bucket width in millis / bucket start unit in seconds. */
  val WindowMs = 300000L

  /** Parse + bucket: the TimestampMapFunction 5-minute truncation
    * (SparkWorks.java:330-339) as integer division on epoch millis. */
  def bucketed(raw: DataFrame): DataFrame =
    raw.select(col("device"),
      ((col("ts_ms") / lit(WindowMs)).cast("long") * (WindowMs / 1000)).as("w_start"),
      col("value"))

  /** Parse with malformed-row counting via a Spark accumulator — the
    * reference's accumulator surface (SURVEY §1,
    * SerializedListAccumulator.java; Flink jobs report parse-reject
    * counts the same way). Rows with null device/ts/value are dropped
    * and counted. Accumulator updates in a TRANSFORMATION are
    * per-execution (recomputation double-counts), so the parsed frame
    * is persisted here and the count is accurate after its first
    * action.
    */
  def bucketedCounted(raw: DataFrame): (DataFrame, org.apache.spark.util.LongAccumulator) = {
    val bad = raw.sparkSession.sparkContext.longAccumulator("iot.malformed")
    import raw.sparkSession.implicits._
    val Seq(iDev, iTs, iVal) = Seq("device", "ts_ms", "value").map(raw.schema.fieldIndex)
    val winMs = WindowMs
    val parsed = raw.flatMap { r =>
      if (r.isNullAt(iDev) || r.isNullAt(iTs) || r.isNullAt(iVal)) { bad.add(1); Iterator.empty }
      else Iterator((r.getString(iDev), r.getLong(iTs) / winMs * (winMs / 1000), r.getDouble(iVal)))
    }(org.apache.spark.sql.Encoders.product[(String, Long, Double)])
      .toDF("device", "w_start", "value")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    (parsed, bad)
  }

  /** Per-(device, window) aggregate — one hash-agg, map-side partial. */
  def windowStats(b: DataFrame): DataFrame =
    b.groupBy(col("device"), col("w_start"))
      .agg(count(lit(1)).as("n"),
        min(col("value")).as("min_v"), max(col("value")).as("max_v"),
        round(sum(col("value")), 2).as("sum_v"),
        round(avg(col("value")), 4).as("avg_v"))

  /** Outliers |v−μ| > 2σ per device (IoT.java:124-153's reduceGroup,
    * as the scale-safe stats-join — same shape as q21). */
  def outliers(b: DataFrame): DataFrame = {
    val stats = b.groupBy(col("device").as("s_dev"))
      .agg(avg(col("value")).as("mu"),
        when(count(lit(1)) < 2, lit(0.0)).otherwise(stddev_samp(col("value"))).as("sigma"))
    b.join(broadcast(stats), col("device") === col("s_dev"))
      .filter(abs(col("value") - col("mu")) > lit(2) * col("sigma"))
      .select(col("device"), col("w_start"), col("value"))
  }

  /** Full batch pipeline: sensor CSV in, two CSV sinks out.
    * Returns (windowStats, outliers) for inspection. */
  def run(spark: SparkSession, inputCsv: String, outDir: String): (DataFrame, DataFrame) = {
    val raw = Formats.readCsv(spark, inputCsv, InputSchema)
    val b = bucketed(raw)
    val stats = windowStats(b)
    val outl = outliers(b)
    Formats.writeCsv(stats, s"$outDir/window_stats", header = true)
    Formats.writeCsv(outl, s"$outDir/outliers", header = true)
    (stats, outl)
  }

  /** Streaming variant of the stats stage on the same plan shape
    * (SparkWorks' deployment target), fed by any streaming source of
    * InputSchema rows. */
  def runStreaming(sensorStream: DataFrame): DataFrame =
    bucketed(sensorStream)
      .withColumn("ts", expr("timestamp_seconds(w_start)"))
      .withWatermark("ts", "10 minutes")
      .groupBy(col("device"), col("ts"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sum_v"))
}
