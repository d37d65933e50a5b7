package graft

import org.scalatest.funsuite.AnyFunSuite

/** Contract tests for the bench metric line — the driver's log
  * capture keeps only the last ~2000 chars of stdout, so the line
  * must always fit, and the compact qNN keys must never collide. No
  * Spark session needed. */
class BenchSpec extends AnyFunSuite {

  test("short metric keys are unique across the whole query registry") {
    val names = SparkEntry.queries.keys.toSeq
    val shorts = names.map(Bench.shortKey)
    assert(shorts.distinct.size == names.size,
      s"colliding qNN prefixes: ${shorts.groupBy(identity).filter(_._2.size > 1).keys}")
    assert(shorts.forall(_.matches("q\\d+")), "every query name must start qNN_")
  }

  test("metric line fits the tail-capture budget even with worst-case values") {
    // worst case: every query slow — still must leave headroom for
    // sbt's trailing [success] line (~80 chars observed) inside the
    // ~2000-char tail window; values >= 100s drop their (noise)
    // centiseconds, 10-100s keep one decimal
    // worst case: every query at fmt's widest rendering (99.99 ->
    // "100.0", 5 chars). The line must NEVER exceed the tail budget:
    // past LineBudget the fastest queries fold into an "others"
    // count+total while every slow/crashed query stays individual.
    val names = SparkEntry.queries.keys.toSeq.sorted
    val worst = names.map(_ -> 99.99)
    val line = Bench.jsonLine(worst, "/root/testdata/sf0.1")
    assert(line.length <= Bench.LineBudget,
      s"metric line ${line.length} chars — budget enforcement broken")
    // truncation keeps a summary whose count covers what was dropped
    if (line.contains(""""others"""")) {
      val n = """"others":\{"n":(\d+)""".r.findFirstMatchIn(line).get.group(1).toInt
      assert(n > 0 && n < names.size)
    }
    // mixed timings: the SLOW queries always survive truncation
    val mixed = names.zipWithIndex.map { case (nm, i) =>
      nm -> (if (i % 20 == 0) 50.0 else 0.05)
    }
    val mline = Bench.jsonLine(mixed, "/x")
    assert(mline.length <= Bench.LineBudget)
    mixed.filter(_._2 == 50.0).foreach { case (nm, _) =>
      assert(mline.contains("\"" + Bench.shortKey(nm) + "\":50.0"), nm)
    }
    val secs = Bench.jsonLine(Seq("q01_x" -> 999.99), "/x")
    assert(secs.contains(""""q01":1000"""), "slow queries render without decimals")
    // past 1000 s the value degrades to magnitude-only e-notation --
    // still valid JSON, never more than 11 chars per entry
    val absurd = Bench.jsonLine(Seq("q01_x" -> 99999.99), "/x")
    assert(absurd.contains(""""q01":1e+05"""), absurd)
    assert(line.startsWith("""{"metric":"total"""") && line.endsWith("}"))
    // crashed queries (-1) must not corrupt the JSON shape
    val withCrash = Bench.jsonLine(Seq("q01_x" -> -1.0, "q02_y" -> 1.5), "/x")
    assert(withCrash.contains(""""q01":-1.00""") && withCrash.contains(""""q02":1.50"""))
    // the total excludes crashed queries, and the crash is COUNTED in
    // the headline so cross-round total compares can't misread
    // "queries crashed" as "got faster"
    assert(withCrash.contains(""""value":1.50""") && withCrash.contains(""""failed":1"""))
    assert(line.contains(""""failed":0"""))
    // deadline-guard truncation must be visible in the headline (a
    // truncated run must never read as a speedup) and absent otherwise
    val part = Bench.jsonLine(Seq("q01_x" -> 1.0), "/x", skipped = 7)
    assert(part.contains(""""skipped":7"""), part)
    assert(!withCrash.contains("skipped"))
  }

  test("every reference benchmark maps to a registered query") {
    val shorts = SparkEntry.queries.keys.map(Bench.shortKey).toSet
    Bench.RefBenchmarks.foreach { case (name, q) =>
      assert(shorts.contains(q), s"ref benchmark $name maps to missing query $q")
    }
    val line = Bench.jsonLine(SparkEntry.queries.keys.toSeq.sorted.map(_ -> 1.0), "/x")
    assert(line.contains(""""ref":{"matmul":1.00"""))
  }
}
