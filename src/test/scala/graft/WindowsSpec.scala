package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Windows

class WindowsSpec extends AnyFunSuite with SparkSpec {

  test("q92 gap-island sessions agree with q20's session_window partitioning") {
    val islands = Windows.q92Sessionize(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))
    val sw = Windows.q20Session(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // same gap rule ⇒ same sessions: identical (user, sess_start, n_events) sets
    assert(islands.map(t => (t._1, t._2, t._3)).toSet == sw.toSet)
    islands.foreach { case (_, _, n, dur, seq) =>
      // the emitted sequence has exactly one token per event in the session
      assert(seq.split(" ").length == n)
      assert(dur >= 0 && dur < 24 * 3600)
    }
  }

  test("resample emits a dense per-user hourly grid with correct forward fill") {
    val rows = Windows.q83Resample(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val events = graft.sources.Tables.events(spark, sf)
      .selectExpr("user_id", s"ts div ${Windows.ResampleHourNs}L as hour", "value")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val byUser = events.groupBy(_._1)
    rows.groupBy(_._1).foreach { case (uid, rs) =>
      val hours = rs.map(_._2).sorted
      val (lo, hi) = (byUser(uid).map(_._2).min, byUser(uid).map(_._2).max)
      // grid is DENSE over the user's own activity span
      assert(hours.toSeq == (lo to hi), s"user $uid grid has gaps")
      rs.foreach { case (_, hour, n, vFill) =>
        val cell = byUser(uid).filter(_._2 == hour)
        assert(n == cell.length, s"user $uid hour $hour count")
        // forward fill: hourly max of the latest non-empty cell <= hour
        val lastNonEmpty = byUser(uid).filter(_._2 <= hour)
          .groupBy(_._2).maxBy(_._1)._2
        assert(vFill == lastNonEmpty.map(_._3).max, s"user $uid hour $hour fill")
      }
    }
    assert(rows.exists(_._3 == 0), "fixture sanity: at least one silent hour filled")
  }
}
