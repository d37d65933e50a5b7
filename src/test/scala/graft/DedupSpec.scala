package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.Dedup

class DedupSpec extends AnyFunSuite with SparkSpec {

  test("exact dedup keeps one canonical id per distinct text") {
    val kept = Dedup.q28ExactDedup(spark, sf)
    val distinctTexts = spark.read.parquet(s"$sf/documents.parquet")
      .select("text").distinct().count()
    assert(kept.count() == distinctTexts)
    assert(kept.agg(sum("n_copies")).head.getLong(0) ==
      spark.read.parquet(s"$sf/documents.parquet").count())
  }

  test("minhash LSH finds the same pairs as exact n-gram jaccard") {
    // LSH at s>=0.8 has >=93% per-pair recall; on the planted corpus
    // (all true pairs ~0.98) it should find every exact pair.
    val lsh = Dedup.q29MinhashLsh(spark, sf).select("doc_a", "doc_b").collect().toSet
    val exact = Dedup.q32NgramJaccard(spark, sf).select("doc_a", "doc_b").collect().toSet
    assert(lsh == exact)
    assert(exact.nonEmpty)
  }

  test("q32 graded df-cap prunes postings but keeps the >=0.8 pair set at this sf") {
    // the graded cap (5) is deliberately NON-neutral — it drops the
    // df>5 shingles (max df here is 9) so the posting join stays
    // linear, and jaccard VALUES shift slightly (sizes are computed
    // over the capped universe, on both engines identically). The
    // >=0.8 PAIR SET is what must survive: hot shingles connect
    // boilerplate, not near-dups, so no true pair is lost at this sf.
    def pairs(maxDf: Int) = Dedup.q32NgramJaccard(spark, sf, maxDf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val capped = pairs(Dedup.MaxDf)
    assert(capped == pairs(Int.MaxValue))
    assert(capped.nonEmpty)
  }

  test("q32 df-cap of 1 prunes every cross-doc posting") {
    // a posting can only join across docs if its shingle has df >= 2,
    // so cap 1 empties the candidate space — the pruning is real
    assert(Dedup.q32NgramJaccard(spark, sf, 1).count() == 0)
  }

  test("LSH bucket cap at the graded default is result-neutral on this corpus") {
    // no test-corpus (band,key) bucket approaches 1000 members, so
    // the cap drops nothing: capped == uncapped for both band styles
    def p29(cap: Int) = Dedup.q29MinhashLsh(spark, sf, cap).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    def p31(cap: Int) = Dedup.q31SimHashPairs(spark, sf, cap).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val c29 = p29(Dedup.MaxBucket)
    val c31 = p31(Dedup.MaxBucket)
    assert(c29 == p29(Int.MaxValue) && c29.nonEmpty)
    assert(c31 == p31(Int.MaxValue) && c31.nonEmpty)
  }

  test("LSH bucket cap prunes a forced hot bucket but keeps honest pairs") {
    // five byte-identical boilerplate docs collide in EVERY band
    // bucket (size 5); one genuine near-dup pair shares its own
    // buckets (size 2). Cap 4 must kill the boilerplate bucket before
    // pair expansion while the honest pair survives.
    import spark.implicits._
    val boiler = (0L until 5L).map(i => (i, "the quick brown fox jumps over the lazy dog again and again"))
    val nearDup = Seq(
      (10L, "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda"),
      (11L, "alpha beta gamma delta epsilon zeta eta theta iota kappa mu"))
    val docs = (boiler ++ nearDup).toDF("doc_id", "text")
    val bands = Dedup.bandKeysOf(Dedup.minhashSigOf(Dedup.shingleHashesOf(docs)))
    val uncapped = Dedup.bucketCandidates(bands, Int.MaxValue).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val capped = Dedup.bucketCandidates(bands, 4).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val boilerPairs = for (a <- 0L until 5L; b <- (a + 1) until 5L) yield (a, b)
    assert(boilerPairs.toSet.subsetOf(uncapped))
    assert(capped.intersect(boilerPairs.toSet).isEmpty)
    assert(capped.contains((10L, 11L)), s"honest pair lost: $capped")
  }

  test("near-dup pairs have near-identical simhash fingerprints") {
    val sig = Dedup.q30SimHash(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val pairs = Dedup.q29MinhashLsh(spark, sf).collect()
    pairs.foreach { p =>
      val d = java.lang.Long.bitCount(sig(p.getLong(0)) ^ sig(p.getLong(1)))
      assert(d <= 10, s"pair ${p.getLong(0)},${p.getLong(1)} hamming $d")
    }
  }

  test("simhash banding catches every pair within the hamming bound") {
    // pigeonhole guarantee: banded result == quadratic scan result
    val sig = Dedup.q30SimHash(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val brute = (for {
      (ida, ha) <- sig; (idb, hb) <- sig if ida < idb
      d = java.lang.Long.bitCount(ha ^ hb) if d <= Dedup.HammingMax
    } yield (ida, idb, d)).toSet
    val banded = Dedup.q31SimHashPairs(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(banded == brute)
  }

  test("embedding cosine pairs are symmetric-free and above threshold") {
    val rows = Dedup.q33EmbeddingCosine(spark, sf).collect()
    assert(rows.forall(r => r.getLong(0) < r.getLong(1)))
    assert(rows.forall(_.getDouble(2) >= Dedup.CosineThreshold))
  }

  test("cluster resolution keeps exactly one canonical doc per near-dup cluster") {
    val pairs = Dedup.q29MinhashLsh(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val clusters = Dedup.q62DedupClusters(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    val rep = clusters.map(c => c._1 -> c._2).toMap
    // one row per doc appearing in any pair
    assert(clusters.map(_._1).toSet == pairs.flatMap(p => Seq(p._1, p._2)).toSet)
    // representatives are minimal and self-representing
    clusters.foreach { case (doc, r, keep) =>
      assert(r <= doc)
      assert(rep(r) == r, s"rep $r of $doc is not its own rep")
      assert((keep == 1) == (doc == r))
    }
    // both ends of every near-dup pair resolved to the same cluster
    pairs.foreach { case (a, b) =>
      assert(rep(a) == rep(b), s"pair ($a,$b) split across clusters")
    }
    // convergence witness: propagation is idempotent once converged,
    // so one extra superstep must be a no-op — proves ClusterSteps
    // exceeds every cluster diameter in this corpus
    val plusOne = Dedup.q62DedupClusters(spark, sf, Dedup.ClusterSteps + 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(plusOne == clusters.toSet)
  }

  test("q203 star resolution: spanning edges only, q62-identical clusters on testdata") {
    val pairs = Dedup.q29MinhashLsh(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val star = Dedup.q203ClusterStar(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    val rep = star.map(c => c._1 -> c._2).toMap
    // same keep-invariants as q62: minimal self-representing reps
    star.foreach { case (doc, r, keep) =>
      assert(r <= doc && rep(r) == r && (keep == 1) == (doc == r))
    }
    // on testdata (no bucket ever near the cap, replicas verify
    // symmetrically) the star components coincide with q62's
    // all-pairs components — the deep-cluster corpora where they pay
    // off differently are the SCALE.md sf10 rehearsal's
    val allPairs = Dedup.q62DedupClusters(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(star.toSet == allPairs, "star vs all-pairs clusters diverged on testdata")
    // convergence witness, as for q62 (at the star unroll depth —
    // StarSteps doubles ClusterSteps because hub paths double hops)
    val plusOne = Dedup.q203ClusterStar(spark, sf, Dedup.StarSteps + 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(plusOne == star.toSet)
    // star edges ⊆ q29's verified pairs, ACTUALLY pinned (r13
    // review: the doc claimed this but no assertion held it): every
    // verified star edge must appear in the all-pairs verified set
    // (the cap never binds on testdata), and there must be strictly
    // fewer star edges than all-pairs once any cluster exceeds 2
    val starEdges = Dedup.starVerifiedPairs(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(starEdges.nonEmpty && starEdges.subsetOf(pairs),
      s"unverified/non-q29 star edges: ${starEdges -- pairs}")
    val comps = star.groupBy(_._2).values.map(_.map(_._1).toSet).toSeq
    if (comps.exists(_.size > 2))
      assert(starEdges.size < pairs.size,
        "star must span with fewer edges than the all-pairs listing")
  }

  test("incremental dedup drops exactly the batch docs near-dup-linked to the corpus") {
    val pairs = Dedup.q29MinhashLsh(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    def isNew(id: Long) = id % 10 >= 8
    val expectDrops = pairs.flatMap { case (a, b) =>
      Seq(a -> b, b -> a).collect { case (n, o) if isNew(n) && !isNew(o) => n -> o }
    }.groupBy(_._1).map { case (n, os) => n -> os.map(_._2).min }
    val got = Dedup.q78IncrementalDedup(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    // one row per batch doc, keep XOR matched
    val batchIds = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id").collect().map(_.getLong(0)).filter(isNew).toSet
    assert(got.map(_._1).toSet == batchIds)
    got.foreach { case (id, matchedOld, keep) =>
      expectDrops.get(id) match {
        case Some(o) => assert(keep == 0 && matchedOld == o, s"doc $id should drop vs $o")
        case None    => assert(keep == 1 && matchedOld == -1L, s"doc $id should keep")
      }
    }
    assert(expectDrops.nonEmpty, "fixture sanity: some batch doc must collide")
  }

  test("streaming incremental dedup equals the batch q78 verdicts across micro-batches") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), col("text"))
    val corpus = docs.filter(col("doc_id") % 10 < 8)
    val incoming = docs.filter(col("doc_id") % 10 >= 8).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val index = graft.pipeline.Dedup.buildIndex(corpus)
    try {
      val seen = new java.util.concurrent.ConcurrentLinkedQueue[(Long, Long, Int)]()
      val ms = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)]
      val q = graft.streaming.Streams.streamingIncrementalDedup(
        ms.toDF().toDF("doc_id", "text"), index, "inc_dedup") { verdicts =>
        verdicts.collect().foreach(r => seen.add((r.getLong(0), r.getLong(1), r.getInt(2))))
      }
      // two micro-batches: the corpus index must serve both without
      // recomputation and verdicts must not depend on batch boundaries
      val (first, second) = incoming.splitAt(incoming.length / 2)
      ms.addData(first); q.processAllAvailable()
      ms.addData(second); q.processAllAvailable()
      q.stop()
      val streamed = seen.toArray(Array.empty[(Long, Long, Int)]).sortBy(_._1)
      val batchTwin = Dedup.q78IncrementalDedup(spark, sf).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).sortBy(_._1)
      assert(streamed.toSeq == batchTwin.toSeq)
    } finally index.unpersist()
  }

  test("composed ingest pipeline (gate → redact → dedup) equals its batch twin across micro-batches") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), col("text"))
    val corpus = docs.filter(col("doc_id") % 10 < 8)
    // incoming: the held-out docs plus two synthetic PII-bearing rows
    val incoming = docs.filter(col("doc_id") % 10 >= 8).collect()
      .map(r => (r.getLong(0), r.getString(1))) ++ Seq(
      (990001L, "mail me at intake.alpha@example.com " + ("data row value table " * 10)),
      (990002L, "call 555-8142 about " + ("batch window query plan " * 10)))
    val index = graft.pipeline.Dedup.buildIndex(corpus)
    try {
      val seen = new java.util.concurrent.ConcurrentLinkedQueue[(Long, Double, String, Long, Int)]()
      val ms = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)]
      val q = graft.streaming.Streams.ingestPipeline(
        ms.toDF().toDF("doc_id", "text"), index, 0.5, "ingest_pipe") { out =>
        out.collect().foreach(r => seen.add(
          (r.getLong(0), r.getDouble(2), r.getString(1), r.getLong(3), r.getInt(4))))
      }
      val (first, second) = incoming.splitAt(incoming.length / 2)
      ms.addData(first.toSeq); q.processAllAvailable()
      ms.addData(second.toSeq); q.processAllAvailable()
      q.stop()
      val streamed = seen.toArray(Array.empty[(Long, Double, String, Long, Int)]).sortBy(_._1)
      val twin = graft.streaming.Streams.ingestBatchTwin(
        incoming.toSeq.toDF("doc_id", "text"), index, 0.5).collect()
        .map(r => (r.getLong(0), r.getDouble(2), r.getString(1), r.getLong(3), r.getInt(4)))
        .sortBy(_._1)
      assert(streamed.toSeq == twin.toSeq)
      // the gate actually gates: some docs fall below the 0.5 threshold
      assert(streamed.length < incoming.length)
      // PII never reaches the sink; the synthetic rows survive as new docs
      val byId = streamed.map(t => t._1 -> t).toMap
      Seq(990001L, 990002L).foreach { id =>
        byId.get(id).foreach { t =>
          assert(!t._3.contains("@") && !t._3.contains("555-"), s"doc $id leaked PII")
          assert(t._5 == 1 && t._4 == -1L, s"doc $id is novel, must keep")
        }
      }
      assert(Seq(990001L, 990002L).exists(byId.contains),
        "fixture sanity: at least one PII row must pass the gate")
    } finally index.unpersist()
  }

  test("contamination hits truly share the claimed distinct shingles") {
    import org.apache.spark.sql.functions._
    val hits = Dedup.q63Contamination(spark, sf).collect()
    assert(hits.nonEmpty)
    val sh = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"),
        array_distinct(graft.functions.Portable.shingles(col("text"))).as("shs"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1).toSet).toMap
    hits.foreach { r =>
      val (doc, bench, n, bs) = (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
      assert(doc >= Dedup.BenchIdMax && bench < Dedup.BenchIdMax)
      assert(n >= Dedup.MinSharedShingles && n <= bs)
      assert(sh(doc).intersect(sh(bench)).size == n,
        s"doc $doc vs bench $bench: claimed $n shared shingles")
    }
  }

  test("q111 span excision: token accounting, subsequence property, corpus-wide marking") {
    val orig = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val cleaned = Dedup.q111DedupSpans(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    assert(cleaned.length == orig.size)
    var removedAny = 0
    var fullyRemoved = 0
    cleaned.foreach { case (id, nRemoved, clean) =>
      val origToks = orig(id).split(" ", -1)
      val cleanToks = if (clean.isEmpty) Array.empty[String] else clean.split(" ", -1)
      // every removed token is accounted for, none invented
      assert(cleanToks.length + nRemoved == origToks.length,
        s"doc $id: ${cleanToks.length} kept + $nRemoved removed != ${origToks.length}")
      // kept tokens are a subsequence of the original (excision only)
      var j = 0
      cleanToks.foreach { t =>
        j = origToks.indexOf(t, j)
        assert(j >= 0, s"doc $id: cleaned token '$t' out of order vs original")
        j += 1
      }
      if (nRemoved > 0) removedAny += 1
      if (nRemoved > 0 && cleanToks.isEmpty) fullyRemoved += 1
    }
    // the synthetic corpus HAS boilerplate: some docs lose spans, the
    // pure-template ones vanish entirely, most docs stay untouched
    assert(removedAny > 0 && fullyRemoved > 0 && removedAny < cleaned.length)
  }

  test("blocked fuzzy join equals brute-force levenshtein on random near-dup strings") {
    import spark.implicits._
    // deterministic vocabulary with planted near-duplicates: base
    // words plus 1-2-edit mutations (substitution, deletion, insert)
    val rnd = new scala.util.Random(42)
    val alpha = "abcdefghij"
    def word(): String = (1 to (5 + rnd.nextInt(6))).map(_ => alpha(rnd.nextInt(alpha.length))).mkString
    // 30 bases (was 60): the brute-force side is quadratic and this
    // test dominated suite wall-time on a loaded box (round-9
    // verdict #3); the short-name fallback regime is still exercised
    // — asserted below — so coverage is unchanged.
    val bases = Seq.fill(30)(word()).distinct
    val mutated = bases.flatMap { w =>
      val i = rnd.nextInt(w.length)
      val sub = w.updated(i, alpha(rnd.nextInt(alpha.length)))
      val del = w.take(i) + w.drop(i + 1)
      val ins = w.take(i) + alpha(rnd.nextInt(alpha.length)) + w.drop(i)
      Seq(sub, del, ins).filter(_.length >= Dedup.FuzzyQ)
    }
    val names = (bases ++ mutated).distinct
    // the fixture must keep BOTH regimes live: names with ≤ q·K
    // distinct grams take the small-block cross, longer ones the
    // gram-prefix join (a trim that lost either would silently
    // weaken the blocked ≡ brute-force claim)
    def nGrams(w: String) =
      w.sliding(Dedup.FuzzyQ).toSet.size
    assert(names.exists(w => w.length >= Dedup.FuzzyQ && nGrams(w) <= Dedup.FuzzyQ * Dedup.FuzzyK),
      "fixture lost the short-name (small-block) regime")
    assert(names.exists(nGrams(_) > Dedup.FuzzyQ * Dedup.FuzzyK),
      "fixture lost the gram-prefix regime")
    val got = Dedup.fuzzyJoin(names.toDF("name"), Dedup.FuzzyQ, Dedup.FuzzyK)
      .collect().map(r => (r.getString(0), r.getString(1), r.getInt(2))).toSet
    // brute force over all pairs with an independent levenshtein
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) => if (j == 0) i else if (i == 0) j else 0)
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val want = (for {
      a <- names; b <- names if a < b
      dist = lev(a, b) if dist <= Dedup.FuzzyK
    } yield (a, b, dist)).toSet
    assert(want.nonEmpty, "fixture must plant near-duplicate pairs")
    assert(got == want, s"missing=${(want -- got).take(5)} extra=${(got -- want).take(5)}")
  }

  test("winnow pairs equal a scala recomputation from the fingerprint sets") {
    val fps = graft.pipeline.TextAnalysis.winnowFingerprint(
        spark.read.parquet(s"$sf/documents.parquet").select(col("doc_id"), col("text")))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toSet).toMap
    val df = fps.toSeq.flatMap { case (d, s) => s.map(_ -> d) }
      .groupBy(_._1).view.mapValues(_.size).toMap
    val rare = fps.view.mapValues(_.filter(df(_) <= Dedup.WinnowDfCap)).toMap
    val ids = fps.keys.toSeq.sorted
    val want = (for {
      a <- ids; b <- ids if a < b
      shared = rare(a).intersect(rare(b)).size if shared >= Dedup.WinnowMinShared
    } yield (a, b, shared.toLong)).toSet
    val got = Dedup.q178WinnowPairs(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(want.nonEmpty, "corpus must contain overlapping docs at this threshold")
    assert(got == want)
  }

  test("SessionCache.hasEntries tracks pinned relations for the bench cleanup gate") {
    // Bench skips its between-queries cleanup when nothing is pinned
    // (the round-9 window fix) — the probe must flip exactly with the
    // memoized relations' lifecycle
    graft.engine.SessionCache.invalidateAll(spark)
    assert(!graft.engine.SessionCache.hasEntries(spark))
    Dedup.q178WinnowPairs(spark, sf).count()
    assert(graft.engine.SessionCache.hasEntries(spark),
      "q178's fingerprint relation must register in SessionCache")
    graft.engine.SessionCache.invalidateAll(spark)
    assert(!graft.engine.SessionCache.hasEntries(spark))
  }

  test("streaming winnow dedup equals the one-shot probe and a scala recompute across micro-batches") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), col("text"))
    val corpus = docs.filter(col("doc_id") % 10 < 8)
    val incoming = docs.filter(col("doc_id") % 10 >= 8).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val index = Dedup.buildWinnowIndex(corpus)
    try {
      val seen = new java.util.concurrent.ConcurrentLinkedQueue[(Long, Long, Int)]()
      val ms = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)]
      val q = graft.streaming.Streams.streamingWinnowDedup(
        ms.toDF().toDF("doc_id", "text"), index, "winnow_dedup") { verdicts =>
        verdicts.collect().foreach(r => seen.add((r.getLong(0), r.getLong(1), r.getInt(2))))
      }
      // two micro-batches: verdicts must not depend on batch
      // boundaries (the index's df census is frozen by construction)
      val (first, second) = incoming.splitAt(incoming.length / 2)
      ms.addData(first.toSeq); q.processAllAvailable()
      ms.addData(second.toSeq); q.processAllAvailable()
      q.stop()
      val streamed = seen.toArray(Array.empty[(Long, Long, Int)]).sortBy(_._1)
      val oneShot = Dedup.winnowAgainst(index,
          docs.filter(col("doc_id") % 10 >= 8)).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).sortBy(_._1)
      assert(streamed.toSeq == oneShot.toSeq)
      // independent scala recompute from the fingerprint VALUE sets:
      // corpus-frozen df cap, shared ≥ WinnowMinShared, min corpus id
      val fps = graft.pipeline.TextAnalysis.winnowFingerprint(docs)
        .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toSet).toMap
      def isNew(id: Long) = id % 10 >= 8
      val corpusDf = fps.toSeq.filterNot(t => isNew(t._1))
        .flatMap { case (d, s) => s.map(_ -> d) }
        .groupBy(_._1).view.mapValues(_.size).toMap
      val hot = corpusDf.filter(_._2 > Dedup.WinnowDfCap).keySet
      val want = incoming.map(_._1).sorted.map { nid =>
        val nfp = fps(nid) -- hot
        val matches = fps.keys.filter(oid => !isNew(oid) &&
          ((fps(oid) -- hot) intersect nfp).size >= Dedup.WinnowMinShared)
        if (matches.isEmpty) (nid, -1L, 1) else (nid, matches.min, 0)
      }
      assert(streamed.toSeq == want.toSeq)
      assert(want.exists(_._3 == 0), "fixture sanity: some batch doc must match a corpus passage")
    } finally index.unpersist()
  }

  test("q207 banded media near-dup equals the brute-force quadratic on the same signatures") {
    // the band-recall pin: pigeonhole says d <= 5 over 6 bands always
    // shares a band, so the banded join must find EXACTLY what an
    // all-pairs Hamming scan finds — same contract q31 has for text,
    // here for the media dHash (including the injected re-encodes)
    import graft.pipeline.Multimodal
    val sig = Multimodal.dHashSignatures(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val brute = (for {
      (a, ha) <- sig
      (b, hb) <- sig
      if a < b
      d = java.lang.Long.bitCount(ha ^ hb)
      if d <= Dedup.HammingMax
    } yield (a, b, d)).toSet
    val banded = Multimodal.q207MediaNearDup(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1),
        r.getAs[Number]("hamming").intValue)).toSet
    assert(banded == brute,
      s"banded ${banded.size} vs brute ${brute.size}; " +
        s"missed: ${(brute -- banded).take(3)} extra: ${(banded -- brute).take(3)}")
    // fixture sanity: both re-encode classes actually graded —
    // brightness shifts are dHash-INVARIANT (exactly Hamming 0),
    // noise perturbations must also surface, 0 < d <= 5 or d == 0
    // a must be an ORIGINAL doc: a bright-vs-noise pair of the same
    // doc also differs by exactly VariantBright
    val bright = brute.filter { case (a, b, _) =>
      a < Multimodal.VariantBright && b == a + Multimodal.VariantBright }
    assert(bright.nonEmpty && bright.forall(_._3 == 0),
      s"brightness re-encode must hash identically: ${bright.take(3)}")
    assert(brute.exists { case (a, b, _) =>
      b == a + Multimodal.VariantNoise })
    assert(brute.exists(_._3 > 0), "some pair must verify at nonzero Hamming")
  }

  test("decoder seam: real PGM/PPM decode shares signatures and pairs with the stub") {
    import graft.pipeline.Multimodal
    import Multimodal.MediaRecord
    // --- the decoder itself, against hand-built netpbm payloads ---
    def pgm(samples: Array[Int], w: Int): Array[Byte] =
      s"P5 # a comment\n$w ${samples.length / w} 255\n".getBytes("US-ASCII") ++
        samples.map(_.toByte)
    val gray = Array(0, 7, 128, 255, 64, 200) // >127 exercises unsigned
    assert(Multimodal.PpmDecoder(pgm(gray, 3)).toSeq == gray.toSeq)
    // P6: RGB folds to integer BT.601 luma
    val rgb = Array(255, 0, 0, 0, 255, 0, 0, 0, 255, 10, 20, 30)
    val p6 = "P6\n2 2\n255\n".getBytes("US-ASCII") ++ rgb.map(_.toByte)
    assert(Multimodal.PpmDecoder(p6).toSeq ==
      Seq(299 * 255 / 1000, 587 * 255 / 1000, 114 * 255 / 1000,
        (299 * 10 + 587 * 20 + 114 * 30) / 1000))
    // garbage, truncation, >8-bit maxval: EMPTY, never garbage samples
    assert(Multimodal.PpmDecoder("not an image".getBytes).isEmpty)
    assert(Multimodal.PpmDecoder(pgm(gray, 3).dropRight(1)).isEmpty)
    assert(Multimodal.PpmDecoder("P5 2 2 65535\n....".getBytes).isEmpty)
    // adversarial header: w*h overflows Int to NEGATIVE (46341^2),
    // which used to sneak past the truncation check into a
    // NegativeArraySizeException (r15 advice) — must decode EMPTY
    assert(Multimodal.PpmDecoder("P5 46341 46341 255\n..".getBytes).isEmpty)
    assert(Multimodal.PpmDecoder("P6 46341 46341 255\n..".getBytes).isEmpty)
    // and a wrap-to-small-positive product (2^16 x 2^16 = 0 in Int)
    assert(Multimodal.PpmDecoder("P5 65536 65536 255\n..".getBytes).isEmpty)
    // --- the seam: re-encode the graded catalog's payloads as PGM,
    // decode with the REAL decoder, and the whole signature relation
    // (variants included) must equal the stub path byte-for-byte —
    // every stage downstream of the samples is shared code, so the
    // banding plan cannot fork on the decoder ---
    import spark.implicits._
    val stubCat = Multimodal.mediaCatalog(spark, sf).as[MediaRecord]
    val pgmCat = stubCat.map(m => m.copy(payload =
      if (m.payload.isEmpty) m.payload else pgm(m.payload.map(_ & 0xff), 1)))
    val viaStub = Multimodal.dHashSignaturesOf(stubCat, Multimodal.StubDecoder)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val viaPpm = Multimodal.dHashSignaturesOf(pgmCat, Multimodal.PpmDecoder)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(viaStub.nonEmpty && viaPpm == viaStub,
      s"decoder changed the signature relation: ${(viaStub -- viaPpm).take(3)}")
    // --- the AUDIO decoder, against hand-built RIFF/WAVE payloads ---
    // 8-bit mono: samples are the data bytes, unsigned
    assert(Multimodal.WavDecoder(
      Multimodal.wavEncode(gray, stereo = false)).toSeq == gray.toSeq)
    // 8-bit stereo with L == R: the channel mean reproduces the sample
    assert(Multimodal.WavDecoder(
      Multimodal.wavEncode(gray, stereo = true)).toSeq == gray.toSeq)
    // 16-bit mono: little-endian signed folds to the unsigned high
    // byte ((v + 32768) >> 8): -32768 -> 0, 0 -> 128, 32767 -> 255
    val pcm16 = Array[Int](-32768, 0, 32767)
    val bb16 = java.nio.ByteBuffer.allocate(44 + 6)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb16.put("RIFF".getBytes).putInt(36 + 6).put("WAVE".getBytes)
      .put("fmt ".getBytes).putInt(16).putShort(1).putShort(1)
      .putInt(8000).putInt(16000).putShort(2).putShort(16)
      .put("data".getBytes).putInt(6)
    pcm16.foreach(v => bb16.putShort(v.toShort))
    assert(Multimodal.WavDecoder(bb16.array()).toSeq == Seq(0, 128, 255))
    // garbage, truncation, torn frame, non-PCM: EMPTY, never garbage
    assert(Multimodal.WavDecoder("not audio at all".getBytes).isEmpty)
    assert(Multimodal.WavDecoder(
      Multimodal.wavEncode(gray, stereo = false).dropRight(1)).isEmpty)
    val nonPcm = Multimodal.wavEncode(gray, stereo = false)
    nonPcm(20) = 3 // audioFormat = IEEE float
    assert(Multimodal.WavDecoder(nonPcm).isEmpty)
    // and the GRADED real-decoder rows (q215 netpbm / q218 WAV, both
    // wire paths each) serve the exact q207 pairs
    def pairs(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1),
        r.getAs[Number]("hamming").intValue)).toSet
    val viaStubPairs = pairs(Multimodal.q207MediaNearDup(spark, sf))
    assert(viaStubPairs.nonEmpty)
    assert(pairs(Multimodal.q215PpmNearDup(spark, sf)) == viaStubPairs)
    assert(pairs(Multimodal.q218WavNearDup(spark, sf)) == viaStubPairs)
  }

  test("q214 maintained media index serves the exact graded q207 pairs") {
    // the q210 precedent: the streamed-and-maintained signature index
    // must answer the near-dup surface exactly like the from-scratch
    // build (the oracle already proves it vs SQL; this pins row-level
    // equality with the GRADED q207 relation inside one session)
    import graft.pipeline.Multimodal
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1),
        r.getAs[Number]("hamming").intValue)).toSet
    val maintained = rows(Multimodal.q214StreamingMediaIndex(spark, sf))
    val rebuilt = rows(Multimodal.q207MediaNearDup(spark, sf))
    assert(maintained.nonEmpty && maintained == rebuilt,
      s"missing ${(rebuilt -- maintained).take(3)} " +
        s"extra ${(maintained -- rebuilt).take(3)}")
  }

  test("q211 star cluster resolution equals union-find over the graded q207 pairs") {
    // r14 verdict #5's pin: the star-edge resolution (linear output,
    // uncapped buckets) must produce the SAME components, canonical
    // reps and casualties as a driver-side union-find over the graded
    // all-pairs q207 graph — media dedup's scale path may not change
    // the decision. (Same caveat as q203: a non-transitive bucket
    // could split a component; this asserts the fixture regime, where
    // re-encodes verify symmetrically, really does coincide.)
    import graft.pipeline.Multimodal
    val pairs = Multimodal.q207MediaNearDup(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    // smaller root wins every union, so each final root IS its
    // component's min — exactly the min-label canonical rep
    val nodes = pairs.flatMap(p => Seq(p._1, p._2)).distinct
    val want = nodes.map(n => (n, find(n), if (n == find(n)) 1 else 0)).toSet
    val got = Multimodal.q211MediaClusterStar(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(got == want,
      s"star resolution diverged from union-find: " +
        s"missing ${(want -- got).take(3)} extra ${(got -- want).take(3)}")
    // fixture sanity: resolution is non-trivial — some cluster holds
    // 3+ members (an original plus BOTH its injected variants), so
    // transitivity through the hub is actually exercised
    val sizes = want.groupBy(_._2).map(_._2.size)
    assert(sizes.exists(_ >= 3), s"largest cluster ${sizes.max}")
  }
}
