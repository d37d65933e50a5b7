package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Partitioning
import graft.sources.{Formats, Tables}

object AsyncProbe {
  val peak = new java.util.concurrent.atomic.AtomicInteger(0)
  val cur = new java.util.concurrent.atomic.AtomicInteger(0)
  def reset(): Unit = { peak.set(0); cur.set(0) }
}

class FormatsSpec extends AnyFunSuite with SparkSpec {

  private def tmp(name: String): String =
    Files.createTempDirectory(s"graft_$name").toString + "/out"

  test("csv sink/source roundtrip preserves rows with explicit schema") {
    val dir = tmp("csv")
    val orig = Tables.nation(spark, sf).orderBy("n_nationkey")
    Formats.writeCsv(orig, dir, delimiter = "|", header = true)
    val schema = StructType(Seq(
      StructField("n_nationkey", LongType), StructField("n_name", StringType),
      StructField("n_regionkey", LongType), StructField("n_comment", StringType)))
    val back = Formats.readCsv(spark, dir, schema, delimiter = "|", header = true)
    assert(back.count() == orig.count())
    assert(back.agg(sum("n_regionkey")).head.getLong(0) ==
      orig.agg(sum("n_regionkey")).head.getLong(0))
  }

  test("text sink/source roundtrip") {
    val dir = tmp("text")
    import spark.implicits._
    val lines = Tables.documents(spark, sf).select("text").as[String]
    Formats.writeText(lines, dir)
    assert(Formats.readText(spark, dir).count() == lines.count())
  }

  test("parquet stage roundtrip (the reference's binary stage format)") {
    val dir = tmp("pq")
    val orig = Tables.orders(spark, sf)
    Formats.writeParquet(orig, dir)
    val back = Formats.readParquet(spark, dir)
    assert(back.schema == orig.schema)
    assert(back.count() == orig.count())
  }

  test("orc sink/source roundtrip with pushed filters") {
    val dir = tmp("orc")
    val orig = Tables.nation(spark, sf)
    Formats.writeOrc(orig, dir)
    val back = Formats.readOrc(spark, dir)
    assert(back.schema == orig.schema)
    assert(back.count() == orig.count())
    val plan = back.filter(col("n_regionkey") === 1)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("n_regionkey"))
  }

  test("avro sink/source roundtrip preserves schema and rows") {
    val dir = tmp("avro")
    val orig = Tables.nation(spark, sf)
    Formats.writeAvro(orig, dir)
    val back = Formats.readAvro(spark, dir)
    assert(back.schema == orig.schema)
    assert(back.orderBy(col("n_nationkey")).collect().toSeq ==
      orig.orderBy(col("n_nationkey")).collect().toSeq)
    // avro is row-oriented: filters prune row groups via stats only;
    // the read must at least survive a pushed predicate unharmed
    assert(back.filter(col("n_regionkey") === 1).count() ==
      orig.filter(col("n_regionkey") === 1).count())
  }

  test("xml sink/source roundtrip preserves schema and rows") {
    val dir = tmp("xml")
    val orig = Tables.nation(spark, sf)
    Formats.writeXml(orig, dir, rowTag = "nation")
    val back = Formats.readXml(spark, dir, orig.schema, rowTag = "nation")
    assert(back.schema == orig.schema)
    assert(back.orderBy(col("n_nationkey")).collect().toSeq ==
      orig.orderBy(col("n_nationkey")).collect().toSeq)
  }

  test("jdbc sink/source roundtrip against an embedded DB, pushdown + partitioned read") {
    val url = "jdbc:duckdb:" + tmp("duck") + ".db"
    val driver = "org.duckdb.DuckDBDriver"
    val orig = Tables.nation(spark, sf)
    // single writer: one embedded-DB file wants one connection; at
    // scale `writers` throttles the connection count instead
    Formats.writeJdbc(orig, url, "nation_rt", driver, writers = 1)
    val back = Formats.readJdbc(spark, url, "nation_rt", driver)
    assert(back.count() == orig.count())
    assert(back.agg(sum("n_regionkey")).head.getLong(0) ==
      orig.agg(sum("n_regionkey")).head.getLong(0))
    // predicate reaches the remote query, not a post-scan filter
    val plan = back.filter(col("n_regionkey") === 1)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("n_regionkey"))
    // range-partitioned read fans out into parallel per-range queries
    val part = Formats.readJdbc(spark, url, "nation_rt", driver,
      partitionOn = Some(("n_nationkey", 0L, 25L, 4)))
    assert(part.rdd.getNumPartitions == 4)
    assert(part.count() == orig.count())
  }

  test("graft-log custom format: roundtrip is exactly-once under any splitSize") {
    import spark.implicits._
    val dir = tmp("gl")
    val orig = (0 until 300).map { i =>
      (1700000000000L + i * 1000L, if (i % 7 == 0) "ERROR" else "INFO", s"event number $i with text")
    }.toDF("ts", "level", "message")
    Formats.writeGraftLog(orig.repartition(3), dir)
    val expectSum = orig.agg(sum("ts")).head.getLong(0)
    // Brutal split sizes: boundaries land mid-line, at line starts, at
    // newlines — the partial-line protocol must keep every line
    // exactly once regardless.
    for (split <- Seq(7L, 64L, 1000L, 4L << 20)) {
      val back = Formats.readGraftLog(spark, dir, splitSize = split)
      assert(back.count() == 300, s"splitSize=$split lost or duplicated rows")
      assert(back.agg(sum("ts")).head.getLong(0) == expectSum, s"splitSize=$split")
    }
    // Small splits genuinely fan out the scan.
    assert(Formats.readGraftLog(spark, dir, splitSize = 64).rdd.getNumPartitions > 3)
  }

  test("graft-log write fails fast on unrepresentable rows") {
    import spark.implicits._
    // newline in message: the format cannot escape it, so the write
    // must error, not silently rewrite the payload
    val nl = Seq((1L, "INFO", "line one\nline two")).toDF("ts", "level", "message")
    assertThrows[Exception] { Formats.writeGraftLog(nl, tmp("gl_nl")) }
    // '|' / lowercase in level would shift the message on read
    val lvl = Seq((1L, "IN|FO", "ok")).toDF("ts", "level", "message")
    assertThrows[Exception] { Formats.writeGraftLog(lvl, tmp("gl_lvl")) }
  }

  test("graft-log scan reports skipped malformed lines as a SQL metric") {
    val dir = Files.createTempDirectory("graft_gl5").toString
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, "a.log"),
      "100|INFO|ok\njunk line\n|||\n101|WARN|fine\n".getBytes("UTF-8"))
    val df = Formats.readGraftLog(spark, dir)
    // collect() (not count()) so the metrics land on THIS plan
    // instance — count() builds its own QueryExecution
    assert(df.collect().length == 2)
    val scan = df.queryExecution.executedPlan.collect {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b
    }.head
    assert(scan.metrics.contains("malformedLines"), "metric not registered")
    assert(scan.metrics("malformedLines").value == 2,
      s"expected 2 skipped lines, got ${scan.metrics("malformedLines").value}")
  }

  test("graft-log listing skips '.'-prefixed hidden files like '_'-prefixed ones") {
    val dir = Files.createTempDirectory("graft_gl4").toString
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, "a.log"),
      "100|INFO|real\n".getBytes("UTF-8"))
    // binary junk in conventional hidden names must not be scanned
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, ".a.log.crc"),
      Array[Byte](0, 1, 2, 3, 10, 99))
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, "_SUCCESS"), Array.empty[Byte])
    val rows = Formats.readGraftLog(spark, dir).collect()
    assert(rows.map(_.getString(2)).toSeq == Seq("real"))
  }

  test("graft-log reader tolerates CRLF, malformed lines, and empty files") {
    val dir = Files.createTempDirectory("graft_gl3").toString
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, "a.log"),
      "100|INFO|ok\r\n101|WARN|crlf line\r\nnot a record\n|||\nxyz|INFO|bad ts\n102|INFO|tail no newline"
        .getBytes("UTF-8"))
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, "empty.log"), Array.empty[Byte])
    for (split <- Seq(5L, 1000L)) {
      val rows = graft.sources.Formats.readGraftLog(spark, dir, splitSize = split)
        .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).sortBy(_._1)
      assert(rows.toSeq == Seq((100L, "INFO", "ok"), (101L, "WARN", "crlf line"),
        (102L, "INFO", "tail no newline")), s"splitSize=$split")
    }
  }

  test("graft-log scan prunes columns and fully absorbs pushed filters") {
    import spark.implicits._
    val dir = tmp("gl2")
    val orig = (0 until 100).map { i =>
      (1700000000000L + i, if (i % 5 == 0) "WARN" else "DEBUG", s"m$i")
    }.toDF("ts", "level", "message")
    Formats.writeGraftLog(orig, dir)

    val pruned = Formats.readGraftLog(spark, dir).select("level")
    val leafOut = pruned.queryExecution.executedPlan.collectLeaves().head.output.map(_.name)
    assert(leafOut == Seq("level"), s"scan materialized $leafOut")

    val filtered = Formats.readGraftLog(spark, dir)
      .filter($"level" === "WARN" && $"ts" >= 1700000000050L)
    assert(filtered.count() == 10)
    val residual = filtered.queryExecution.executedPlan.collect {
      case f: org.apache.spark.sql.execution.FilterExec => f
    }
    assert(residual.isEmpty, "source should have absorbed all filters")
  }

  test("collection sources and sequence") {
    import spark.implicits._
    assert(Formats.fromElements(spark, Seq((1, "a"), (2, "b"))).count() == 2)
    assert(Formats.sequence(spark, 1, 100).agg(sum("id")).head.getLong(0) == 5050)
  }

  test("partitioned layout prunes directories on partition predicate") {
    val dir = tmp("part")
    Formats.writePartitioned(Tables.orders(spark, sf)
      .withColumn("stat", col("o_orderstatus")), dir, Seq("stat"))
    val pruned = spark.read.parquet(dir).filter(col("stat") === "O")
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(stat"), plan)
    assert(pruned.count() ==
      Tables.orders(spark, sf).filter(col("o_orderstatus") === "O").count())
  }

  test("bucketed tables join without any exchange") {
    // orphan locations from a previous run in this JVM block saveAsTable
    val warehouse = spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:")
    Seq("orders_bkt", "cust_bkt").foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val loc = new java.io.File(s"$warehouse/$t")
      if (loc.exists()) {
        import scala.reflect.io.Directory
        new Directory(loc).deleteRecursively()
      }
    }
    Formats.writeBucketed(Tables.orders(spark, sf), "orders_bkt", 4, "o_custkey")
    Formats.writeBucketed(
      Tables.customer(spark, sf).select(col("c_custkey"), col("c_mktsegment")),
      "cust_bkt", 4, "c_custkey")
    val joined = spark.table("orders_bkt")
      .join(spark.table("cust_bkt"), col("o_custkey") === col("c_custkey"))
    val n = joined.count()
    assert(n == Tables.orders(spark, sf)
      .join(Tables.customer(spark, sf), col("o_custkey") === col("c_custkey")).count())
    // co-located layout: neither side shuffles; broadcast must be off
    // to observe the bucketed SMJ path
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val plan = spark.table("orders_bkt")
        .join(spark.table("cust_bkt"), col("o_custkey") === col("c_custkey"))
        .queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), plan)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", (64L * 1024 * 1024).toString)
  }

  test("hash partition positions rows by key with one exchange") {
    val df = Partitioning.byHash(Tables.orders(spark, sf), 8, col("o_custkey"))
    assert(df.rdd.getNumPartitions == 8)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("hashpartitioning"))
    // a groupBy on the same key reuses the partitioning: no second exchange
    val agg = df.groupBy("o_custkey").count()
    val aggPlan = agg.queryExecution.executedPlan.toString
    assert(aggPlan.split("Exchange").length == 2, s"extra exchange in:\n$aggPlan")
  }

  test("zipWithIndex labels contiguously across partitions; zipWithUniqueId stays unique") {
    val orders = Tables.orders(spark, sf).select(col("o_orderkey"), col("o_custkey"))
    // pin 4 range partitions (sf0.001 is small enough for AQE to coalesce
    // to 1, which would vacuously pass a parallelism check)
    val labeled = Partitioning.zipWithIndexOrdered(orders, col("o_orderkey"), numPartitions = 4)
    // parallelism survives: labeling must NOT collapse to one partition
    assert(labeled.rdd.getNumPartitions == 4, "zipWithIndex lost the pinned partitioning")
    val rows = labeled.select(col("idx"), col("o_orderkey")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    assert(rows.map(_._1).toSeq == (0L until rows.length).toSeq, "index not contiguous from 0")
    // index order is exactly key order
    assert(rows.map(_._2).toSeq == rows.map(_._2).sorted.toSeq)
    val uids = Partitioning.zipWithUniqueId(orders).select(col("uid")).collect().map(_.getLong(0))
    assert(uids.distinct.length == uids.length, "uid collision")
  }

  test("range partition + local sort yields globally sorted buckets") {
    val df = Partitioning.sortedBuckets(Tables.orders(spark, sf), 4, col("o_orderkey"))
    assert(df.queryExecution.executedPlan.toString.contains("rangepartitioning"))
    import spark.implicits._
    val perPart = df.select(col("o_orderkey"))
      .mapPartitions(it => Iterator(it.map(_.getLong(0)).toSeq))
      .collect().filter(_.nonEmpty)
    // each partition locally sorted
    perPart.foreach(p => assert(p == p.sorted))
    // and partition key-ranges do not overlap (global order across buckets)
    val ranges = perPart.map(p => (p.head, p.last)).sortBy(_._1)
    ranges.sliding(2).foreach {
      case Array((_, hi), (lo, _)) => assert(hi <= lo)
      case _ =>
    }
  }

  test("asyncMapOrdered preserves input order with bounded concurrency") {
    import spark.implicits._
    import scala.concurrent.duration._
    // static holder: closure-serialized AtomicIntegers would be task
    // copies; in local mode a static field is genuinely shared
    val peak = AsyncProbe.peak
    AsyncProbe.reset()
    val input = spark.range(0, 200).repartition(2)
      .sortWithinPartitions("id").as[Long] // known ascending order per partition
    val out = graft.operators.AsyncOps.asyncMapOrdered(
      input, capacity = 4, timeout = 30.seconds) { i =>
      val c = AsyncProbe.cur.incrementAndGet()
      AsyncProbe.peak.accumulateAndGet(c, math.max)
      Thread.sleep(1)
      AsyncProbe.cur.decrementAndGet()
      i * 2
    }
    val perPart = out.mapPartitions(it => Iterator(it.toSeq)).collect()
    // order preserved within each partition (Flink orderedWait semantics)
    perPart.foreach { p => assert(p == p.sorted) }
    assert(perPart.map(_.size).sum == 200)
    assert(peak.get() <= 2 * 4) // 2 partitions x capacity
    assert(peak.get() >= 2) // genuinely concurrent
  }

  test("asyncMapUnordered emits in completion order: slow heads don't block") {
    import spark.implicits._
    import scala.concurrent.duration._
    val input = spark.range(0, 40).coalesce(1).sortWithinPartitions("id").as[Long]
    // the FIRST element of each in-flight window sleeps long; ordered
    // semantics would emit it first anyway — unordered must let the
    // fast ones overtake it
    val out = graft.operators.AsyncOps.asyncMapUnordered(
      input, capacity = 8, timeout = 30.seconds) { i =>
      if (i % 8 == 0) Thread.sleep(120) else Thread.sleep(1)
      i
    }
    val seq = out.mapPartitions(it => Iterator(it.toSeq)).collect().head
    assert(seq.toSet == (0L until 40L).toSet, "no result lost or duplicated")
    assert(seq != seq.sorted, "completion order must be able to overtake input order")
    // every slow element is overtaken by at least one later fast one
    val posOfSlow = seq.indexOf(0L)
    assert(seq.take(posOfSlow).exists(_ > 0L), s"fast results should precede slow head: $seq")
  }

  test("custom partitioner routes rows by the computed expression") {
    import spark.implicits._
    val df = spark.range(0, 1000).toDF("id")
    // route on id mod 4 → at most 4 non-empty partitions, and all
    // rows sharing a routing value land in the same partition
    val routed = Partitioning.custom(df, 8, col("id") % 4)
    val placement = routed.select(col("id") % 4)
      .mapPartitions(it => Iterator.single(it.map(_.getLong(0)).toSet))
      .collect().filter(_.nonEmpty)
    assert(placement.length <= 4)
    assert(placement.flatten.toSet == Set(0L, 1L, 2L, 3L))
    // no two partitions share a routing value
    assert(placement.map(_.size).sum == placement.flatten.toSet.size)
    assert(routed.count() == 1000)
  }

  test("rebalance evens out partition sizes") {
    val skewed = Tables.lineitem(spark, sf).repartition(1)
    val even = Partitioning.rebalance(skewed, 8)
    import spark.implicits._
    val sizes = even.mapPartitions(it => Iterator(it.size)).collect()
    assert(sizes.length == 8)
    assert(sizes.max - sizes.min <= math.max(2, sizes.max / 4))
  }
}
