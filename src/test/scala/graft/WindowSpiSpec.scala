package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.Streams.Ev
import graft.streaming.{Streams, WindowSpi}
import graft.streaming.WindowSpi._

/** The trigger/evictor SPI must reproduce the hand-fused operators
  * element-for-element — each fused form is one composition point in
  * the SPI's space, so equivalence is the strongest cheap oracle. */
class WindowSpiSpec extends AnyFunSuite with SparkSpec {

  private def ts(min: Int): Timestamp = new Timestamp(min * 60000L)

  private val evs: Seq[Ev] =
    Seq(1.0, 2.0, 7.0, 11.0, 13.0, 16.0, 20.0, 3.0, 9.5, 4.25).zipWithIndex.map {
      case (v, i) => Ev(i + 1, ts(i + 1), 1, "a", v)
    } ++ Seq(5.0, 8.0, 2.0, 6.0, 30.0).zipWithIndex.map {
      case (v, i) => Ev(100 + i, ts(i + 1), 2, "b", v)
    }

  private def runSpi(name: String, trigger: GraftTrigger, evictor: GraftEvictor,
      batches: Seq[Seq[Ev]]): Set[(Long, Long, Long, Double)] = {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val ms = MemoryStream[Ev]
    val q = WindowSpi.globalWindow(ms.toDS(), trigger, evictor).writeStream
      .format("memory").queryName(name).outputMode(OutputMode.Append()).start()
    batches.foreach { b => ms.addData(b: _*); q.processAllAvailable() }
    q.stop()
    spark.table(name).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
  }

  // split mid-stream so every equivalence also covers cross-batch state
  private val batches = Seq(evs.take(6), evs.drop(6))

  test("CountTrigger + CountEvictor reproduces the fused sliding count window") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val ms = MemoryStream[Ev]
    val q = Streams.slidingCountWindow(ms.toDS(), size = 3, slide = 2).writeStream
      .format("memory").queryName("spi_fused_scw").outputMode(OutputMode.Append()).start()
    batches.foreach { b => ms.addData(b: _*); q.processAllAvailable() }
    q.stop()
    val fused = spark.table("spi_fused_scw").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
    val spi = runSpi("spi_scw", CountTrigger(2), CountEvictor(3), batches)
    assert(spi == fused && spi.nonEmpty)
  }

  test("PurgingTrigger(CountTrigger) with no evictor reproduces the tumbling count window") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val ms = MemoryStream[Ev]
    val q = Streams.countWindow(ms.toDS(), 3).writeStream
      .format("memory").queryName("spi_fused_cw").outputMode(OutputMode.Append()).start()
    batches.foreach { b => ms.addData(b: _*); q.processAllAvailable() }
    q.stop()
    val fused = spark.table("spi_fused_cw").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
    val spi = runSpi("spi_cw", PurgingTrigger(CountTrigger(3)), NoEvictor, batches)
    assert(spi == fused && spi.nonEmpty)
  }

  test("DeltaTrigger + CountEvictor reproduces the fused delta window") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val ms = MemoryStream[Ev]
    val q = Streams.deltaWindow(ms.toDS(), threshold = 5.0, size = 3).writeStream
      .format("memory").queryName("spi_fused_dw").outputMode(OutputMode.Append()).start()
    batches.foreach { b => ms.addData(b: _*); q.processAllAvailable() }
    q.stop()
    // fused emits (user, fire_idx, trigger_v, n, sum); SPI emits
    // (user, fire_idx, n, sum) — compare on the common projection
    val fused = spark.table("spi_fused_dw").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(3), r.getDouble(4))).toSet
    val spi = runSpi("spi_dw", DeltaTrigger(5.0), CountEvictor(3), batches)
    assert(spi == fused && spi.nonEmpty)
  }

  test("globalWindow equals a single-pass driver simulator on random traces and batch splits") {
    // the strategy logic is hand-traced elsewhere; THIS property pins
    // the Spark plumbing — state round-trip, intra-batch ordering,
    // arbitrary micro-batch boundaries — against one in-memory fold
    val rnd = new scala.util.Random(42)
    for (trial <- 1 to 3) {
      val n = 30 + rnd.nextInt(20)
      val vals = Vector.fill(n)(math.rint(rnd.nextDouble() * 4000 - 1000) / 10)
      val trigger: GraftTrigger = rnd.nextInt(3) match {
        case 0 => CountTrigger(1 + rnd.nextInt(4))
        case 1 => DeltaTrigger(1.0 + rnd.nextInt(20))
        case _ => PurgingTrigger(CountTrigger(1 + rnd.nextInt(4)))
      }
      val evictor: GraftEvictor = rnd.nextInt(3) match {
        case 0 => CountEvictor(1 + rnd.nextInt(5))
        case 1 => TimeEvictor((1 + rnd.nextInt(5)) * 60000L)
        case _ => NoEvictor
      }
      val events = vals.zipWithIndex.map { case (v, i) => Ev(i + 1, ts(i + 1), 1, "a", v) }
      // random micro-batch boundaries
      val cut1 = 1 + rnd.nextInt(n - 2)
      val cut2 = cut1 + 1 + rnd.nextInt(n - cut1 - 1)
      val split = Seq(events.take(cut1), events.slice(cut1, cut2), events.drop(cut2))

      // driver simulator: the same strategy objects, one fold, no Spark
      var regs = TriggerRegs()
      var buf = Vector.empty[WinElem]
      var fired = 0L
      val expect = Set.newBuilder[(Long, Long, Long, Double)]
      events.foreach { e =>
        val elem = WinElem(e.event_id, e.ts.getTime, e.value)
        buf :+= elem
        val (res, r2) = trigger.onElement(elem, regs)
        regs = r2
        if (res.fire) {
          val kept = evictor.evict(buf)
          expect += ((1L, fired, kept.length.toLong,
            math.rint(kept.map(_.value).sum * 100) / 100))
          fired += 1
          buf = kept
        }
        if (res.purge) buf = Vector.empty
      }
      val got = runSpi(s"spi_prop_$trial", trigger, evictor, split)
      assert(got == expect.result(),
        s"trial $trial trigger=$trigger evictor=$evictor cuts=($cut1,$cut2)")
    }
  }

  test("TimeEvictor keeps only the trailing event-time span at fire, per a hand trace") {
    // user 2 values 5,8,2,6,30 at minutes 1..5; CountTrigger(5) fires
    // once on the 5th element; TimeEvictor(2min) evicts ts <= 5min-2min
    // = minute 3 and older (Flink's inclusive evict cutoff), keeping
    // minutes 4,5 -> (6,30): n=2, sum=36
    val spi = runSpi("spi_te", CountTrigger(5), TimeEvictor(2 * 60000L),
      Seq(evs.filter(_.user_id == 2)))
    assert(spi == Set((2L, 0L, 2L, 36.0)))
  }
}
