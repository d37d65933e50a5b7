package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Tables

/** Regression spec for the `events.ts` physical-form contract.
  *
  * The driver fixture has shipped `ts` as parquet TIMESTAMP(NANOS)
  * (surfaced by Spark as epoch-nanos LongType via `nanosAsLong`) in
  * rounds 1-4, then as timestamp[us] TIMESTAMP_NTZ in round 5 — which
  * silently crashed all 13 event-time queries. [[Tables.events]] now
  * normalizes both forms to the engine-wide epoch-nanos LongType
  * contract; this spec writes the same instants in each physical form
  * and asserts the normalized reads are identical, so the next fixture
  * flip fails HERE instead of in the driver's correctness run.
  */
class TablesSpec extends AnyFunSuite with SparkSpec {

  test("events.ts normalizes to identical epoch-nanos from LONG and TIMESTAMP_NTZ fixtures") {
    import spark.implicits._
    val micros = Seq(
      1704067798778549L, // 2024-01-01 00:09:58.778549 UTC
      1704068166738090L,
      0L,                // epoch boundary
      1704153599999999L) // end-of-day boundary, sub-second max
    val rows = micros.zipWithIndex.map { case (us, i) =>
      (i.toLong, us, i.toLong % 2, s"t$i", i * 1.5, "{}")
    }

    val longDir = Files.createTempDirectory("graft_ev_long").toString + "/ev"
    rows.map { case (id, us, uid, et, v, p) => (id, us * 1000L, uid, et, v, p) }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$longDir/events.parquet")

    val ntzDir = Files.createTempDirectory("graft_ev_ntz").toString + "/ev"
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .withColumn("ts", timestamp_micros(col("ts")).cast(TimestampNTZType))
      .write.parquet(s"$ntzDir/events.parquet")

    val fromLong = Tables.events(spark, longDir)
    val fromNtz = Tables.events(spark, ntzDir)
    assert(fromLong.schema("ts").dataType == LongType)
    assert(fromNtz.schema("ts").dataType == LongType)

    val a = fromLong.select("event_id", "ts").as[(Long, Long)].collect().sortBy(_._1)
    val b = fromNtz.select("event_id", "ts").as[(Long, Long)].collect().sortBy(_._1)
    assert(a.sameElements(b), s"normalized ts diverged:\n long=${a.toSeq}\n ntz =${b.toSeq}")
    assert(a.map(_._2).toSeq == micros.map(_ * 1000L))
  }

  test("events.ts of an unsupported physical type fails loudly, not silently") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_ev_bad").toString + "/ev"
    Seq((1L, "not-a-time", 2L, "x", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$dir/events.parquet")
    val e = intercept[IllegalStateException](Tables.events(spark, dir))
    assert(e.getMessage.contains("events.ts"))
  }

  test("parquet schema evolution: mergeSchema unions columns across batches") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_evolve").toString + "/t"
    Seq((1L, "a")).toDF("id", "v1").write.parquet(dir)
    Seq((2L, 3.5)).toDF("id", "v2").write.mode("append").parquet(dir)
    val merged = spark.read.option("mergeSchema", "true").parquet(dir)
    assert(merged.columns.sorted.toSeq == Seq("id", "v1", "v2"))
    // merged column order depends on file listing order — pin it by name
    val rows = merged.select("id", "v1", "v2").orderBy("id").collect()
    assert(rows.length == 2 && rows(0).isNullAt(2) && rows(1).isNullAt(1))
  }

  test("driver fixture events table meets the epoch-nanos contract end-to-end") {
    // whatever physical form the current fixture uses, consumers see
    // LongType nanos and bucket math works (q18's 5-minute buckets)
    val ev = Tables.events(spark, sf)
    assert(ev.schema("ts").dataType == LongType)
    val buckets = graft.operators.Windows.q18Tumbling(spark, sf)
    assert(buckets.count() > 0)
  }
}
