package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Typed, Windows}

class TypedSpec extends AnyFunSuite with SparkSpec {

  test("typed flatMap wordcount equals declarative explode plan") {
    val typed = Typed.wordCountTyped(spark, sf).collect().toSeq
    val decl = Typed.q15WordCount(spark, sf).collect().toSeq
    assert(typed == decl)
  }

  test("flatMapGroups outliers equal declarative stats-join outliers") {
    val grouped = Typed.q17GroupReduceOutliers(spark, sf).collect().map(_.getLong(0)).toSeq
    val joined = Windows.q21OutliersJoin(spark, sf).collect().map(_.getLong(0)).toSeq
    assert(grouped == joined)
    assert(grouped.nonEmpty)
  }

  test("session windows never overlap per user") {
    val rows = Windows.q20Session(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    rows.groupBy(_._1).foreach { case (_, sess) =>
      val starts = sess.map(_._2).sorted
      assert(starts.distinct.length == starts.length)
    }
  }

  test("sliding windows double-count each event exactly twice") {
    import org.apache.spark.sql.functions._
    val total = Windows.q19Sliding(spark, sf).agg(sum("n")).head.getLong(0)
    val nEvents = spark.read.parquet(s"$sf/events.parquet").count()
    assert(total == 2 * nEvents)
  }
}
