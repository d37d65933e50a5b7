package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.analytics.IoTPipeline
import graft.sources.{Formats, Tables}

class IoTPipelineSpec extends AnyFunSuite with SparkSpec {

  private def sensorCsv(): String = {
    // derive a sensor CSV from the events table (device = user_id)
    val dir = Files.createTempDirectory("graft_iot").toString
    val csv = s"$dir/sensors"
    Formats.writeCsv(
      Tables.events(spark, sf).select(
        concat(lit("dev-"), col("user_id")).as("device"),
        expr("ts div 1000000").as("ts_ms"),
        col("value")), csv)
    csv
  }

  test("iot pipeline end to end: csv in, stats + outliers csv out") {
    val in = sensorCsv()
    val out = Files.createTempDirectory("graft_iot_out").toString
    val (stats, outl) = IoTPipeline.run(spark, in, out)
    val n = stats.agg(sum("n")).head.getLong(0)
    assert(n == spark.read.parquet(s"$sf/events.parquet").count())
    // window min <= avg <= max
    assert(stats.filter(col("min_v") > col("avg_v") || col("avg_v") > col("max_v")).count() == 0)
    // outliers are a strict subset and each deviates from its device mean
    assert(outl.count() > 0 && outl.count() < n)
    // sinks actually wrote
    assert(spark.read.option("header", "true").csv(s"$out/window_stats").count() == stats.count())
    assert(spark.read.option("header", "true").csv(s"$out/outliers").count() == outl.count())
  }

  test("accumulator counts malformed rows during parse") {
    import spark.implicits._
    val raw = Seq(
      (Some("dev-1"), Some(1700000000000L), Some(1.0)),
      (None, Some(1700000000000L), Some(2.0)),
      (Some("dev-2"), None, Some(3.0)),
      (Some("dev-3"), Some(1700000060000L), Some(4.0)))
      .toDF("device", "ts_ms", "value")
    val (parsed, bad) = IoTPipeline.bucketedCounted(raw)
    assert(parsed.count() == 2)
    assert(bad.value == 2)
  }

  test("iot streaming stats stage runs over a memory stream") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val ms = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(String, Long, Double)]
    val base = 1700000000000L
    ms.addData(("dev-1", base, 1.0), ("dev-1", base + 60000, 2.0), ("dev-2", base, 5.0),
      ("dev-1", base + 3600000, 9.0)) // watermark pusher
    val q = IoTPipeline.runStreaming(ms.toDF().toDF("device", "ts_ms", "value"))
      .writeStream.format("memory").queryName("iot_s")
      .outputMode(org.apache.spark.sql.streaming.OutputMode.Append()).start()
    q.processAllAvailable(); q.stop()
    val rows = spark.table("iot_s").collect()
      .map(r => (r.getString(0), r.getLong(2), r.getDouble(3))).toSet
    assert(rows.contains(("dev-1", 2L, 3.0)) && rows.contains(("dev-2", 1L, 5.0)))
  }

  test("iot outliers agree with the graded q21 outlier semantics") {
    val in = sensorCsv()
    val raw = Formats.readCsv(spark, in, IoTPipeline.InputSchema)
    val outl = IoTPipeline.outliers(IoTPipeline.bucketed(raw))
    // q21 computes the same |v-mu|>2sigma per user over events
    val expected = graft.operators.Windows.q21OutliersJoin(spark, sf).count()
    assert(outl.count() == expected)
  }
}
