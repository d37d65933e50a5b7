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
    // the artifact must say WHICH rows were skipped (r15 verdict #4:
    // the identities lived only on a truncated stderr line)
    val named = Bench.jsonLine(Seq("q01_x" -> 1.0), "/x", skipped = 2,
      skippedq = Seq("q62", "q191"))
    assert(named.contains(""""skippedq":["q62","q191"]"""), named)
    // a pathological skip list degrades to the cap, count stays honest
    val many = Bench.jsonLine(Seq("q01_x" -> 1.0), "/x", skipped = 100,
      skippedq = (1 to 100).map(i => s"q$i"))
    assert(many.contains(""""skipped":100"""), many)
    assert(many.count(_ == '[') == 1 &&
      many.split("\"skippedq\":\\[")(1).takeWhile(_ != ']')
        .count(_ == ',') == Bench.SkipListCap - 1, many)
  }

  test("budget walk order: refs, then the expensive head, then cheapest-first") {
    val names = Seq("q22_matmul", "q23_kmeans", "q25_dft", "q24_logreg",
      "q21_iot", "q26_pi", "q27_vadd",
      "q125_hits", "q01_cheap", "q50_mid", "q99_new")
    val prior = Map("q125_hits" -> 98.0, "q01_cheap" -> 0.2, "q50_mid" -> 1.0,
      "q22_matmul" -> 0.3, "q23_kmeans" -> 1.5, "q25_dft" -> 0.4,
      "q24_logreg" -> 1.2, "q21_iot" -> 0.5, "q26_pi" -> 0.2, "q27_vadd" -> 0.2)
    val order = Bench.orderForBudget(names, prior)
    // the seven BASELINE analogues lead, in RefBenchmarks order, so a
    // budget-truncated run can never ship an empty "ref" sub-map again
    assert(order.take(7) == Seq("q22_matmul", "q23_kmeans", "q25_dft",
      "q24_logreg", "q21_iot", "q26_pi", "q27_vadd"), order.take(7))
    // with few names everything with a prior is "the expensive head"
    // (descending), then the no-prior query; the r10/r11 failure mode
    // (the priciest family never measured) is structurally gone
    assert(order.drop(7) == Seq("q125_hits", "q50_mid", "q01_cheap", "q99_new"),
      order.drop(7))
    // a realistic mix: the head takes the ExpensiveHead priciest, the
    // remainder ascends by cost with no-prior queries at the median
    val many = names ++ (1 to 12).map(i => f"q6$i%02d_mid")
    val priorMany = prior ++ (1 to 12).map(i => f"q6$i%02d_mid" -> (2.0 + i))
    val om = Bench.orderForBudget(many, priorMany)
    val head = om.slice(7, 7 + Bench.ExpensiveHead)
    assert(head.head == "q125_hits", s"priciest first in the head: $head")
    assert(head.size == Bench.ExpensiveHead)
    val restCosts = om.drop(7 + Bench.ExpensiveHead)
      .filter(priorMany.contains).map(priorMany)
    assert(restCosts == restCosts.sorted, "tail ascends by prior cost")
    // a no-prior query can never occupy the expensive head
    assert(!head.contains("q99_new"))
    // with no prior at all, order degrades to name order after the refs
    val bare = Bench.orderForBudget(names, Map.empty)
    assert(bare.drop(7) == Seq("q01_cheap", "q125_hits", "q50_mid", "q99_new"))
    // every name survives the reorder exactly once
    assert(order.sorted == names.sorted && om.sorted == many.sorted)
  }

  test("staleness rotation: driver-measured rows yield to stale ones (r12 #1)") {
    val refs = Seq("q22_matmul", "q23_kmeans", "q25_dft", "q24_logreg",
      "q21_iot", "q26_pi", "q27_vadd")
    // 40 non-ref rows with priors 1..40: the expensive pool is the
    // top ExpensivePool=30 (indices 10..39), the pre-rotation head
    // would be the top 10 (indices 30..39)
    val rest = (1 to 40).map(i => f"q2$i%02d_x")
    val prior = (refs.map(_ -> 0.3) ++
      rest.zipWithIndex.map { case (n, i) => n -> (i + 1.0) }).toMap
    // a loaded previous round measured exactly refs + the 10 priciest
    // (what r12 actually did: 17/198)
    val measured = rest.takeRight(10).map(n => Bench.shortKey(n) -> 12).toMap
    val order = Bench.orderForBudget(refs ++ rest, prior,
      Bench.DriverHistory(measured, Set.empty))
    assert(order.take(7) == refs, "refs always lead")
    val head = order.slice(7, 7 + Bench.ExpensiveHead)
    // the head rotates: NEXT-priciest never-measured pool rows (ranks
    // 21-30), priciest first — disjoint from last round's head
    assert(head == rest.slice(20, 30).reverse, head)
    assert(head.toSet.intersect(measured.keySet.map(s => rest.find(
      n => Bench.shortKey(n) == s).get)).isEmpty,
      "r13's head must be disjoint from r12's measured head")
    // the tail walks stale rows first (cheapest-first within a
    // staleness class); last round's measured rows walk LAST
    assert(order.drop(7 + Bench.ExpensiveHead) ==
      rest.slice(0, 20) ++ rest.slice(30, 40), order.drop(17))
    // nothing lost or duplicated
    assert(order.sorted == (refs ++ rest).sorted)
    // and with NO measurement history the order is the legacy
    // cost-based walk (priciest head, cheapest-first tail)
    val legacy = Bench.orderForBudget(refs ++ rest, prior)
    assert(legacy.slice(7, 7 + Bench.ExpensiveHead) ==
      rest.takeRight(10).reverse)
    // crashed-last rows LEAD the head regardless of staleness — the
    // r12 q41/q119 scenario: their -1 rows needed a manual
    // exoneration run; now the next artifact answers automatically
    val crashed = Set(Bench.shortKey(rest(2)), Bench.shortKey(rest(35)))
    val oc = Bench.orderForBudget(refs ++ rest, prior,
      Bench.DriverHistory(measured, crashed))
    // priciest crashed row first, then the other; then stale pool rows
    assert(oc.slice(7, 9) == Seq(rest(35), rest(2)), oc.slice(7, 9))
    assert(oc.slice(9, 7 + Bench.ExpensiveHead).forall(n =>
      !crashed.contains(Bench.shortKey(n))))
    assert(oc.sorted == (refs ++ rest).sorted)
  }

  test("readDriverMeasured: both artifact vintages, -1 stays stale, later wins") {
    val dir = java.nio.file.Files.createTempDirectory("bench_rounds")
    def put(name: String, body: String): Unit =
      java.nio.file.Files.writeString(dir.resolve(name), body)
    try {
      // r01 vintage: full names inside the escaped tail string
      put("BENCH_r01.json",
        """{"n":1,"tail":"{\"queries\":{\"q01_alpha\":0.5,\"q41_pagerank\":2.0}}"}""")
      // r12 vintage: short keys; q41 crashed (-1); stderr line and
      // ref sub-map must NOT count as measurements
      put("BENCH_r12.json",
        """{"n":12,"tail":"[error] [bench] q99_zzz 9.9\n{\"queries\":{\"q41\":-1.00,\"q62\":29.0},\"ref\":{\"matmul\":0.38}}"}""")
      put("not_a_bench.json", """{"queries":{"q77":1.0}}""")
      // an editor/merge backup must NOT be parsed as a second
      // round-12 artifact (anchored filename match — r13 review)
      put("BENCH_r12.json.bak", """{"tail":"{\"queries\":{\"q88\":1.0}}"}""")
      val h = Bench.readDriverHistory(dir.toString)
      // q41: measured r01, ATTEMPTED (crashed) r12 → lastMeasured
      // stays 1 AND it is flagged crashed-last, so the rotation
      // retries it first (the r12 q41/q119 scenario)
      assert(h.lastMeasured == Map("q01" -> 1, "q41" -> 1, "q62" -> 12), h)
      assert(h.crashedLast == Set("q41"), h.crashedLast)
      // missing directory → empty, no throw
      val none = Bench.readDriverHistory("/nonexistent/nope")
      assert(none.lastMeasured.isEmpty && none.crashedLast.isEmpty)
    } finally {
      import scala.jdk.CollectionConverters._
      val s = java.nio.file.Files.walk(dir)
      try s.iterator().asScala.toSeq.reverse
        .foreach(p => java.nio.file.Files.deleteIfExists(p))
      finally s.close()
    }
  }

  test("prior sidecar parse tolerates crashes and junk, keyed by full name") {
    val f = java.nio.file.Files.createTempFile("bench", ".json")
    java.nio.file.Files.writeString(f,
      """{"sf": "/x", "runs": 2, "queries": {
        |  "q01_alpha": 1.519,
        |  "q02_crashed": -1.000,
        |  "q125_hits": 98.065
        |}}""".stripMargin)
    val prior = try Bench.readPriorSidecar(f.toString)
      finally java.nio.file.Files.deleteIfExists(f)
    // the crashed row (-1) is dropped: a crash is not a cost estimate
    assert(prior == Map("q01_alpha" -> 1.519, "q125_hits" -> 98.065))
    // missing file → empty map, no throw
    assert(Bench.readPriorSidecar("/nonexistent/nope.json").isEmpty)
  }

  test("median of odd/even/empty sequences") {
    assert(Bench.median(Seq(3.0, 1.0, 2.0)) == 2.0)
    assert(Bench.median(Seq(1.0, 2.0, 3.0, 4.0)) == 2.5)
    assert(Bench.median(Nil) == 0.0)
  }

  test("non-default runs setting is visible in the metric line") {
    val two = Bench.jsonLine(Seq("q01_x" -> 1.0), "/x", runs = 2)
    assert(two.contains(""""runs":2"""), two)
    val one = Bench.jsonLine(Seq("q01_x" -> 1.0), "/x", runs = 1)
    assert(!one.contains("runs"), one)
  }

  test("overflow fold keeps every crash individual, never in 'others'") {
    // enough queries that the line MUST fold, with one crash buried
    // among the fastest values — the crash must survive the fold
    // (review finding: +MaxValue sorted crashes into the dropped
    // suffix, the exact inversion of the stated intent)
    val many = (1 to 400).map(i => f"q$i%03d_x" -> 0.05) :+ ("q999_dead" -> -1.0)
    val line = Bench.jsonLine(many, "/x")
    assert(line.length <= Bench.LineBudget)
    assert(line.contains(""""q999":-1.00"""), line.takeRight(300))
    assert(line.contains(""""others""""), "fixture must actually overflow")
  }

  test("prior sidecar is ignored when its recorded sf differs") {
    val f = java.nio.file.Files.createTempFile("bench_sf", ".json")
    java.nio.file.Files.writeString(f,
      """{"sf": "/tmp/graft_sf1", "queries": { "q01_alpha": 15.0 }}""")
    try {
      assert(Bench.readPriorSidecar(f.toString,
        expectSf = "/root/testdata/sf0.1").isEmpty,
        "cross-sf priors would predict 10x real cost and starve admission")
      assert(Bench.readPriorSidecar(f.toString,
        expectSf = "/tmp/graft_sf1") == Map("q01_alpha" -> 15.0))
      assert(Bench.readPriorSidecar(f.toString) == Map("q01_alpha" -> 15.0),
        "no expectation -> accept (local tooling)")
    } finally java.nio.file.Files.deleteIfExists(f)
  }

  test("per-run watchdog deadline: spike-capped at K x predicted, floored, bounded") {
    // r11 verdict #1: q84 was admitted at a 1.6 s prediction, spiked
    // to 57.9 s against a remaining-budget-only deadline (~100 s),
    // and starved the 34 costliest queries. The deadline is now
    // min(remaining, max(5, SpikeK x predictedOne)).
    assert(Bench.SpikeK == 8.0)
    // the r11 q84 scenario: 1.6 s predicted, ~100 s remaining — the
    // spike now costs at most 12.8 s, not 57.9
    assert(Bench.runDeadline(100.0, 1.6) == 12.8)
    // tiny predictions are floored at 5 s (startup jitter must not
    // kill sub-second queries)
    assert(Bench.runDeadline(100.0, 0.1) == 5.0)
    // the remaining budget is always the upper bound
    assert(Bench.runDeadline(10.0, 5.0) == 10.0)
    // a spike-cap deadline is strictly below remaining exactly when
    // the cap binds — the walk-continues-vs-blown discriminator
    assert(Bench.runDeadline(100.0, 1.6) < 100.0)
    assert(!(Bench.runDeadline(10.0, 5.0) < 10.0))
    // the cap engages ONLY for queries with their OWN prior: a
    // median-estimated new query killed at 8x median writes -1,
    // crashes are dropped from priors, and the query starves forever
    // (bit q191/q193 on their first bench run)
    assert(Bench.deadlineFor(100.0, Some(1.6), 1.0) == 12.8)
    assert(Bench.deadlineFor(100.0, Some(1.6), 2.0) == 25.6,
      "inflation scales the cap")
    assert(Bench.deadlineFor(100.0, None, 1.0) == 100.0,
      "no own prior -> full remaining budget, never the median cap")
  }

  test("end-of-walk retry: spike-kills remeasured once, everything else stands (r14 #1)") {
    val rows = Seq("q01_a" -> -1.0, "q02_b" -> 2.0, "q03_c" -> -1.0,
      "q04_d" -> -1.0)
    val spike = Set("q01_a", "q04_d")
    var ran = List.empty[String]
    val out = Bench.retryPass(rows, spike, () => false, () => 100.0,
      n => { ran ::= n; if (n == "q04_d") -1.0 else 3.25 })
    // the spike-killed row is remeasured (the r14 q62/q125/q191
    // scenario); the plain crash row (q03) is untouched — its -1
    // carries real information; a retry that fails AGAIN stays -1
    assert(out == Seq("q01_a" -> 3.25, "q02_b" -> 2.0, "q03_c" -> -1.0,
      "q04_d" -> -1.0))
    assert(ran.reverse == List("q01_a", "q04_d"))
    // genuine budget exhaustion: nothing reruns, the -1 stands
    var ran2 = 0
    val out2 = Bench.retryPass(rows, spike, () => false, () => 1.0,
      _ => { ran2 += 1; 9.9 })
    assert(out2 == rows && ran2 == 0)
    // a blown walk deadline (or dying SparkContext) blocks all retries
    val out3 = Bench.retryPass(rows, spike, () => true, () => 100.0,
      _ => fail("must not run"))
    assert(out3 == rows)
    // the budget is re-read PER retry: the first retry may eat what
    // the second needed
    var budget = 20.0
    val out4 = Bench.retryPass(rows, spike, () => false, () => budget,
      n => { budget -= 18.0; 4.0 })
    assert(out4 == Seq("q01_a" -> 4.0, "q02_b" -> 2.0, "q03_c" -> -1.0,
      "q04_d" -> -1.0))
    // eligibility floor pinned
    assert(Bench.retryEligible(true, false, Bench.RetryFloorSec))
    assert(!Bench.retryEligible(true, false, 4.9))
    assert(!Bench.retryEligible(false, false, 100.0))
    assert(!Bench.retryEligible(true, true, 100.0))
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
