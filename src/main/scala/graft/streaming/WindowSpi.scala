package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.streaming.Streams.Ev

/** General trigger/evictor SPI over a keyed global window — the
  * reference's WindowedStream.trigger/evictor surface
  * (`/root/reference` flink-streaming-java WindowedStream.java:137,190
  * with windowing/triggers/ and windowing/evictors/) re-expressed as
  * strategy objects driving ONE `flatMapGroupsWithState` state
  * machine. [[Streams.countWindow]], [[Streams.slidingCountWindow]]
  * and [[Streams.deltaWindow]] are the hand-fused forms of the three
  * common compositions; this SPI exists for the migrant whose job
  * composes its OWN trigger and evictor — WindowSpiSpec proves the
  * compositions reproduce the fused operators element-for-element.
  *
  * Semantics kept from Flink:
  *  - the window buffer holds every element since the last purge;
  *  - `onElement` returns fire/purge like TriggerResult;
  *  - the evictor runs at fire time, BEFORE emission (evictBefore),
  *    and its trimming persists into window state;
  *  - a non-purging trigger with no bounding evictor grows state, in
  *    Flink and here alike — production pairs CountEvictor /
  *    TimeEvictor or a PurgingTrigger, exactly as Flink's docs warn.
  */
object WindowSpi {

  /** Element view handed to triggers/evictors (event time in ms). */
  case class WinElem(event_id: Long, ts_ms: Long, value: Double)

  /** Fire/purge verdict — Flink's TriggerResult. */
  final case class TriggerResult(fire: Boolean, purge: Boolean)
  object TriggerResult {
    val Continue: TriggerResult = TriggerResult(fire = false, purge = false)
    val Fire: TriggerResult = TriggerResult(fire = true, purge = false)
    val FireAndPurge: TriggerResult = TriggerResult(fire = true, purge = true)
  }

  /** The trigger's per-key registers. One fixed shape keeps the state
    * encodable by Spark: a counter, a seeded flag, and a reference
    * value cover the count/delta/threshold trigger family (Flink's
    * equivalents keep the same registers in ReducingState/ValueState). */
  case class TriggerRegs(count: Long = 0L, seeded: Boolean = false, ref: Double = 0.0)

  trait GraftTrigger extends Serializable {
    /** Called once per element in event_id order. */
    def onElement(e: WinElem, regs: TriggerRegs): (TriggerResult, TriggerRegs)
  }

  /** CountTrigger.of(n): fire every n-th element, counter resets on fire. */
  case class CountTrigger(n: Long) extends GraftTrigger {
    require(n > 0, s"CountTrigger needs n > 0, got $n")
    override def onElement(e: WinElem, regs: TriggerRegs): (TriggerResult, TriggerRegs) = {
      val c = regs.count + 1
      if (c >= n) (TriggerResult.Fire, regs.copy(count = 0L))
      else (TriggerResult.Continue, regs.copy(count = c))
    }
  }

  /** DeltaTrigger.of(threshold, |a-b|): fire when the delta vs the
    * element that LAST fired exceeds the threshold; the first element
    * seeds without firing; the reference point advances only on fire. */
  case class DeltaTrigger(threshold: Double) extends GraftTrigger {
    require(threshold > 0, s"DeltaTrigger needs threshold > 0, got $threshold")
    override def onElement(e: WinElem, regs: TriggerRegs): (TriggerResult, TriggerRegs) =
      if (!regs.seeded) (TriggerResult.Continue, regs.copy(seeded = true, ref = e.value))
      else if (math.abs(e.value - regs.ref) > threshold)
        (TriggerResult.Fire, regs.copy(ref = e.value))
      else (TriggerResult.Continue, regs)
  }

  /** PurgingTrigger.of(inner): FIRE becomes FIRE_AND_PURGE. */
  case class PurgingTrigger(inner: GraftTrigger) extends GraftTrigger {
    override def onElement(e: WinElem, regs: TriggerRegs): (TriggerResult, TriggerRegs) = {
      val (r, s) = inner.onElement(e, regs)
      (if (r.fire) TriggerResult.FireAndPurge else r, s)
    }
  }

  trait GraftEvictor extends Serializable {
    /** Trim the window buffer at fire time (arrival order preserved). */
    def evict(buf: Vector[WinElem]): Vector[WinElem]
  }

  /** Keep everything (Flink: no evictor configured). */
  case object NoEvictor extends GraftEvictor {
    override def evict(buf: Vector[WinElem]): Vector[WinElem] = buf
  }

  /** CountEvictor.of(size): keep the newest `size` elements. */
  case class CountEvictor(size: Int) extends GraftEvictor {
    require(size > 0, s"CountEvictor needs size > 0, got $size")
    override def evict(buf: Vector[WinElem]): Vector[WinElem] = buf.takeRight(size)
  }

  /** TimeEvictor.of(windowMs): evict elements with event time AT OR
    * BEFORE maxTs − windowMs (Flink's cutoff is inclusive on the
    * evict side — an element exactly windowMs older than the newest
    * goes). */
  case class TimeEvictor(windowMs: Long) extends GraftEvictor {
    require(windowMs > 0, s"TimeEvictor needs windowMs > 0, got $windowMs")
    override def evict(buf: Vector[WinElem]): Vector[WinElem] =
      if (buf.isEmpty) buf
      else { val hi = buf.map(_.ts_ms).max; buf.filter(_.ts_ms > hi - windowMs) }
  }

  case class SpiWinState(regs: TriggerRegs, buf: Seq[WinElem], fired: Long)
  case class SpiWin(user_id: Long, fire_idx: Long, n: Long, sum_v: Double)

  /** GlobalWindows + trigger + evictor: per key, buffer elements;
    * when the trigger fires, evict, emit count+sum over the surviving
    * window contents, persist the trimmed buffer; purge clears it. */
  def globalWindow(events: Dataset[Ev], trigger: GraftTrigger,
      evictor: GraftEvictor): Dataset[SpiWin] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[SpiWinState, SpiWin](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (uid: Long, it: Iterator[Ev], state: GroupState[SpiWinState]) =>
          var s = state.getOption.getOrElse(SpiWinState(TriggerRegs(), Vector.empty, 0L))
          val out = scala.collection.mutable.ArrayBuffer.empty[SpiWin]
          it.toSeq.sortBy(_.event_id).foreach { e =>
            val elem = WinElem(e.event_id, e.ts.getTime, e.value)
            var buf = s.buf.toVector :+ elem
            val (res, regs) = trigger.onElement(elem, s.regs)
            var fired = s.fired
            if (res.fire) {
              val kept = evictor.evict(buf)
              out += SpiWin(uid, fired, kept.length,
                math.rint(kept.map(_.value).sum * 100) / 100)
              fired += 1
              buf = kept // evictBefore trims the persisted window state
            }
            if (res.purge) buf = Vector.empty
            s = SpiWinState(regs, buf, fired)
          }
          state.update(s)
          out.iterator
      }
  }
}
