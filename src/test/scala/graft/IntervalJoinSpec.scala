package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.Streams
import graft.streaming.Streams.Ev

class IntervalJoinSpec extends AnyFunSuite with SparkSpec {

  // keep event times far from epoch 0: a streaming query's initial
  // watermark is 0, and near-epoch rows can be dropped as late
  private val base = 1700000000000L
  private def ts(min: Int): Timestamp = new Timestamp(base + min * 60000L)

  test("stream-stream interval join matches events within [0, 5min) per user") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val l = MemoryStream[Ev]
    val r = MemoryStream[Ev]
    l.addData(Ev(1, ts(0), 1, "a", 1.0), Ev(2, ts(10), 1, "a", 2.0), Ev(3, ts(0), 2, "a", 3.0))
    r.addData(Ev(11, ts(2), 1, "b", 1.5), // joins event 1 (within 5min, same user)
      Ev(12, ts(8), 1, "b", 2.5), // joins nothing (1: too late, 2: too early)
      Ev(13, ts(30), 3, "b", 9.9)) // different user
    val q = Streams.intervalJoin(l.toDF(), r.toDF()).writeStream
      .format("memory").queryName("ij").outputMode(OutputMode.Append()).start()
    q.processAllAvailable(); q.stop()
    val pairs = spark.table("ij").select("l_id", "r_id").collect()
      .map(row => (row.getLong(0), row.getLong(1))).toSet
    assert(pairs == Set((1L, 11L)))
  }

  test("windowed stream join pairs only same-key same-window elements") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val l = MemoryStream[Ev]
    val r = MemoryStream[Ev]
    // window-ALIGNED base (multiple of 5 min), unlike the shared
    // `base`: tumbling boundaries sit at epoch multiples of the width
    val ab = 1700000100000L
    def tsA(min: Int): Timestamp = new Timestamp(ab + min * 60000L)
    l.addData(Ev(1, tsA(1), 1, "a", 1.0),  // window [0,5) user 1
      Ev(2, tsA(6), 1, "a", 2.0),          // window [5,10) user 1
      Ev(3, tsA(1), 2, "a", 3.0))          // window [0,5) user 2
    r.addData(Ev(11, tsA(4), 1, "b", 1.5), // pairs with 1 (same window+user)
      Ev(12, tsA(5), 1, "b", 2.5),         // pairs with 2 ([5,10))
      Ev(13, tsA(4), 3, "b", 9.9))         // user with no left events
    val q = Streams.windowJoin(l.toDF(), r.toDF()).writeStream
      .format("memory").queryName("wj").outputMode(OutputMode.Append()).start()
    q.processAllAvailable(); q.stop()
    val pairs = spark.table("wj").select("l_id", "r_id").collect()
      .map(row => (row.getLong(0), row.getLong(1))).toSet
    assert(pairs == Set((1L, 11L), (2L, 12L)))
  }

  test("left-outer interval join emits unmatched rows after watermark closes them") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val l = MemoryStream[Ev]
    val r = MemoryStream[Ev]
    l.addData(Ev(1, ts(0), 1, "a", 1.0), Ev(2, ts(10), 2, "a", 2.0))
    r.addData(Ev(11, ts(2), 1, "b", 1.5))
    val q = Streams.intervalJoin(l.toDF(), r.toDF(), "left_outer").writeStream
      .format("memory").queryName("ijo").outputMode(OutputMode.Append()).start()
    q.processAllAvailable()
    // push watermarks far past event 2's join window on BOTH sides
    l.addData(Ev(99, ts(600), 9, "a", 0.0))
    r.addData(Ev(98, ts(600), 9, "b", 0.0))
    q.processAllAvailable()
    l.addData(Ev(97, ts(1200), 9, "a", 0.0))
    r.addData(Ev(96, ts(1200), 9, "b", 0.0))
    q.processAllAvailable(); q.stop()
    val rows = spark.table("ijo").collect()
      .map(row => (row.getLong(0), Option(row.get(4)).map(_.toString))).toSet
    // event 1 matched 11; event 2 (no right rows in window) appears null-padded
    assert(rows.contains((1L, Some("11"))))
    assert(rows.contains((2L, None)))
  }

  test("windowed coGroup emits one-sided buckets the window join drops") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val l = MemoryStream[Ev]
    val r = MemoryStream[Ev]
    val ab = 1700000100000L
    def tsA(min: Int): Timestamp = new Timestamp(ab + min * 60000L)
    l.addData(Ev(1, tsA(1), 1, "a", 1.0), Ev(2, tsA(2), 1, "a", 2.0),
      Ev(3, tsA(200), 9, "a", 0.0)) // watermark pusher
    r.addData(Ev(11, tsA(3), 1, "b", 3.0),
      Ev(12, tsA(1), 2, "b", 4.0), // user 2 has NO left events
      Ev(13, tsA(200), 9, "b", 0.0))
    val q = Streams.windowCoGroup(l.toDF(), r.toDF()).writeStream
      .format("memory").queryName("wcg").outputMode(OutputMode.Append()).start()
    q.processAllAvailable(); q.stop()
    val rows = spark.table("wcg").collect()
      .map(row => (row.getLong(0), row.getSeq[Double](2), row.getSeq[Double](3)))
      .filter(_._1 != 9).toSet
    assert(rows == Set(
      (1L, Seq(1.0, 2.0), Seq(3.0)), // both sides in the bucket
      (2L, Seq(), Seq(4.0))))        // right-only bucket survives
  }

  test("control versions order numerically: v10 beats v9") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_ctrlv").toString + "/rules"
    // raw lexicographic max would pick v9 here and join stale rules
    Streams.publishControl(Seq((1L, "old")).toDF("user_id", "rule"), dir, "9")
    Streams.publishControl(Seq((1L, "new")).toDF("user_id", "rule"), dir, "10")
    assert(Streams.latestControlVersion(spark, dir) == "v10")
  }

  test("control-side updates apply from the next micro-batch on") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft_ctrl").toString + "/rules"
    Streams.publishControl(Seq((1L, "allow")).toDF("user_id", "rule"), dir, "0001")
    val ms = MemoryStream[Ev]
    val seen = new java.util.concurrent.ConcurrentLinkedQueue[(Long, String)]()
    val q = Streams.enrichWithControl(ms.toDF(), dir, "ctrl") { b =>
      b.select("event_id", "rule").collect()
        .foreach(r => seen.add((r.getLong(0), r.getString(1))))
    }
    ms.addData(Ev(1, ts(0), 1, "a", 1.0))
    q.processAllAvailable()
    // a NEW version published between batches is visible from the
    // next on; the old version's files stay untouched for in-flight
    // readers
    Streams.publishControl(Seq((1L, "deny")).toDF("user_id", "rule"), dir, "0002")
    ms.addData(Ev(2, ts(1), 1, "a", 2.0))
    q.processAllAvailable(); q.stop()
    assert(seen.toArray(Array.empty[(Long, String)]).toSet ==
      Set((1L, "allow"), (2L, "deny")))
  }

  test("stream enrich with a broadcast static dimension") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val s = MemoryStream[Ev]
    s.addData(Ev(1, ts(0), 1, "a", 1.0), Ev(2, ts(1), 2, "a", 2.0), Ev(3, ts(2), 9, "a", 3.0))
    val dim = Seq((1L, "gold"), (2L, "silver")).toDF("user_id", "tier")
    val q = Streams.enrich(s.toDF(), dim).writeStream
      .format("memory").queryName("enr").outputMode(OutputMode.Append()).start()
    q.processAllAvailable(); q.stop()
    val got = spark.table("enr").select("event_id", "tier").collect()
      .map(row => (row.getLong(0), Option(row.getString(1)))).toSet
    assert(got == Set((1L, Some("gold")), (2L, Some("silver")), (3L, None)))
  }
}
