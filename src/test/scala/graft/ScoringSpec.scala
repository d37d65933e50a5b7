package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.Scoring

/** Semantic checks for the corpus scoring/mixing layer: each operator
  * is recomputed brute-force in driver-side Scala over the sf0.001
  * corpus (500 docs — trivially small) and compared, so a Spark-side
  * plan bug can't hide behind an oracle that shares its SQL shape.
  */
class ScoringSpec extends AnyFunSuite with SparkSpec {

  /** Driver-side twin of [[graft.functions.Portable.h60]]. */
  private def h60s(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
    val hex = d.map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.substring(0, 15), 16)
  }

  private lazy val docs: Seq[(Long, String, String, String)] =
    spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text", "lang", "source").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getString(3))).toSeq

  private def tokens(text: String): Seq[String] =
    text.split(" ").toSeq.filter(_.nonEmpty)

  private def grams(text: String, w: Int): Seq[String] = {
    val ws = text.split(" ").toSeq // unfiltered — mirrors Portable.shingles
    if (ws.length < w) Seq.empty
    else (0 to ws.length - w).map(i => ws.slice(i, i + w).mkString(" "))
  }

  test("q84 DSIR weights match a driver-side recomputation") {
    val toks = docs.flatMap { case (id, text, lang, _) =>
      tokens(text).map(t => (id, lang, h60s(t) % Scoring.DsirBuckets))
    }
    val sc = toks.groupBy(_._3).view.mapValues(_.size.toLong).toMap
    val tcs = toks.filter(_._2 == "en").groupBy(_._3).view.mapValues(_.size.toLong).toMap
    val sTot = toks.size.toDouble
    val tTot = toks.count(_._2 == "en").toDouble
    val b = Scoring.DsirBuckets.toDouble
    def lr(bk: Long): Double =
      math.log((tcs.getOrElse(bk, 0L) + 1.0) / (tTot + b)) -
        math.log((sc(bk) + 1.0) / (sTot + b))
    val expected = toks.groupBy(_._1).view.mapValues(_.map(t => lr(t._3)).sum).toMap

    val got = Scoring.q84ImportanceWeight(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got.keySet == expected.keySet)
    got.foreach { case (id, w) =>
      assert(math.abs(w - expected(id)) <= 0.011, s"doc $id: $w vs ${expected(id)}")
    }
    // the weighting must discriminate: not all docs identical
    assert(got.values.toSet.size > 10)
  }

  test("q85 duplicate-5gram fraction matches a driver-side posting list") {
    val perDoc = docs.map { case (id, text, _, _) =>
      id -> grams(text, 5).map(h60s).toSet
    }.filter(_._2.nonEmpty).toMap
    val df = perDoc.values.flatten.groupBy(identity).view.mapValues(_.size).toMap
    val rows = Scoring.q85DupNgramFraction(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(rows.map(_._1).toSet == perDoc.keySet)
    rows.foreach { case (id, nGrams, nDup, frac) =>
      val g = perDoc(id)
      val dup = g.count(df(_) >= 2)
      assert(nGrams == g.size, s"doc $id n_grams")
      assert(nDup == dup, s"doc $id n_dup")
      assert(math.abs(frac - dup.toDouble / g.size) < 1e-12)
      assert(nDup <= nGrams && frac >= 0.0 && frac <= 1.0)
    }
  }

  test("q86 classifier: prob in (0,1), keep consistent, matches recompute") {
    def w(b: Long): Double = ((b * 2654435761L) % 1000003L % 2001L - 1000L) / 1000.0
    val rows = Scoring.q86QualityClassifier(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
    assert(rows.length == docs.length)
    val byId = docs.map(d => d._1 -> d._2).toMap
    rows.foreach { case (id, nTok, prob, keep) =>
      val ts = tokens(byId(id)).map(t => w(h60s(t) % Scoring.ClfBuckets))
      assert(nTok == ts.size)
      val exp = 1.0 / (1.0 + math.exp(ts.sum / ts.size * -8.0))
      assert(prob > 0.0 && prob < 1.0)
      assert(math.abs(prob - exp) <= 1.1e-4, s"doc $id: $prob vs $exp")
      assert(keep == (if (prob > 0.5) 1 else 0))
    }
  }

  test("q87 mixture sampling fills each source's α=0.5 quota exactly") {
    val counts = docs.groupBy(_._4).view.mapValues(_.size).toMap
    val wsum = counts.values.map(n => math.sqrt(n.toDouble)).sum
    val quota = counts.map { case (s, n) =>
      s -> math.floor(math.sqrt(n.toDouble) / wsum * Scoring.MixBudget + 0.5).toLong
    }
    val rows = Scoring.q87MixtureSample(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2).toLong, r.getLong(3)))
    val kept = rows.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    quota.foreach { case (s, q) =>
      assert(kept.getOrElse(s, 0L) == math.min(q, counts(s).toLong), s"source $s")
    }
    // α < 1 flattens the mix: no source exceeds ~2× its fair share of the budget
    val fair = Scoring.MixBudget.toDouble / counts.size
    assert(kept.values.forall(_ <= 2 * fair), s"mix too skewed: $kept")
    // total lands within per-source rounding slack of the budget
    assert(math.abs(rows.length - Scoring.MixBudget) <= counts.size / 2)
  }

  test("q88 grouping sets: subtotal tree is self-consistent") {
    val rows = Relational88Rows()
    val total = rows.filter(r => r.gRf == 1 && r.gLs == 1)
    assert(total.size == 1)
    val perFlag = rows.filter(r => r.gRf == 0 && r.gLs == 1)
    val detail = rows.filter(r => r.gRf == 0 && r.gLs == 0)
    assert(total.head.n == detail.map(_.n).sum)
    assert(total.head.n == perFlag.map(_.n).sum)
    perFlag.foreach { f =>
      assert(f.n == detail.filter(_.rf == f.rf).map(_.n).sum, s"flag ${f.rf}")
    }
    // no per-status slice was requested — grouping sets ≠ cube
    assert(!rows.exists(r => r.gRf == 1 && r.gLs == 0))
  }

  private case class G88(rf: String, gRf: Long, gLs: Long, n: Long)
  private def Relational88Rows(): Seq[G88] =
    graft.operators.Relational.q88GroupingSets(spark, sf).collect().toSeq
      .map(r => G88(Option(r.getString(0)).getOrElse("∅"), r.getLong(2), r.getLong(3), r.getLong(4)))

  test("q89 tf-idf: ≤3 ranked keywords per doc, scores non-increasing, plan caps under the shuffle") {
    val q = Scoring.q89TfIdfKeywords(spark, sf)
    val rows = q.collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2), r.getDouble(3)))
    rows.groupBy(_._1).foreach { case (id, rs) =>
      val sorted = rs.sortBy(_._2)
      assert(sorted.map(_._2).toSeq == (1 to sorted.length), s"doc $id ranks")
      assert(sorted.length <= 3)
      sorted.sliding(2).foreach {
        case Array(a, b) => assert(a._4 >= b._4, s"doc $id scores out of order")
        case _           =>
      }
    }
    // the rank<=3 filter must reach the window as a group limit
    assert(q.queryExecution.executedPlan.toString.contains("WindowGroupLimit"))
  }

  test("classifyText (narrow single-expression form) is bit-equal to q86's batch plan") {
    import org.apache.spark.sql.functions._
    val batch = Scoring.q86QualityClassifier(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val narrow = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), Scoring.classifyText(col("text")).as("p")).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(narrow.keySet == batch.keySet)
    narrow.foreach { case (id, p) => assert(p == batch(id), s"doc $id") }
  }

  test("classifyText lifts to a stream unchanged (batch/stream equivalence)") {
    import org.apache.spark.sql.functions._
    implicit val ctx = spark.sqlContext
    import spark.implicits._
    val sample = docs.take(40).map(d => (d._1, d._2))
    val ms = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)]
    ms.addData(sample.take(20)); ms.addData(sample.drop(20))
    val q = ms.toDF().toDF("id", "t")
      .select(col("id"), Scoring.classifyText(col("t")).as("p"))
      .writeStream.format("memory").queryName("clf_stream")
      .outputMode(org.apache.spark.sql.streaming.OutputMode.Append()).start()
    try q.processAllAvailable() finally q.stop()
    val streamed = spark.table("clf_stream").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val batch = Scoring.q86QualityClassifier(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(streamed.size == sample.length)
    streamed.foreach { case (id, p) => assert(p == batch(id), s"doc $id") }
  }

  test("q91 rank family: quartiles balanced, pct_rank/cume consistent per group") {
    val rows = graft.operators.Relational.q91RankFamily(spark, sf).collect()
      .map(r => (r.getLong(0), r.getDouble(2), r.getInt(3), r.getDouble(4), r.getDouble(5)))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (ck, rs) =>
      val n = rs.length
      // ntile balance: bucket sizes differ by at most 1
      val sizes = rs.groupBy(_._3).view.mapValues(_.size).toMap
      assert(sizes.values.max - sizes.values.min <= 1, s"cust $ck ntile skew")
      // cume_dist of the max-price row is exactly 1.0
      val sorted = rs.sortBy(r => (r._2))
      assert(sorted.last._5 == 1.0, s"cust $ck cume")
      // pct_rank: 0 for the first row, (n-1)/(n-1)=1 for the last when n>1
      assert(sorted.head._4 == 0.0, s"cust $ck first pct_rank")
      if (n > 1) assert(sorted.last._4 == 1.0, s"cust $ck last pct_rank")
      // quartile is non-decreasing in price order
      sorted.sliding(2).foreach {
        case Array(a, b) => assert(a._3 <= b._3, s"cust $ck quartile order")
        case _           =>
      }
    }
  }

  test("q95 curriculum buckets: value-ordered, exhaustive, near-quartile sized") {
    val rows = Scoring.q95CurriculumBuckets(spark, sf).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getInt(2), r.getInt(3), r.getDouble(4)))
      .sortBy(_._1)
    assert(rows.map(_._1).toSeq == (1 to rows.length))
    assert(rows.map(_._2).sum == docs.length)
    // buckets partition the value range: no overlap between adjacent buckets
    rows.sliding(2).foreach {
      case Array(a, b) => assert(a._4 <= b._3, s"buckets ${a._1}/${b._1} overlap")
      case _           =>
    }
    // quartile cuts: each bucket holds roughly a quarter (ties may skew)
    rows.foreach { case (b, n, mn, mx, avg) =>
      assert(n >= docs.length / 8 && n <= docs.length / 2, s"bucket $b size $n")
      assert(avg >= mn && avg <= mx)
    }
  }

  test("q181 per-source KL drift matches a driver-side recomputation") {
    val k = Scoring.DsirBuckets
    val bucketed = docs.flatMap { case (_, text, _, src) =>
      tokens(text).map(t => (src, (h60s(t) % k).toInt)) }
    val bySrc = bucketed.groupBy(_._1)
    val corpusCnt = bucketed.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val n = bucketed.size.toLong
    val want = bySrc.map { case (src, rows) =>
      val cs = rows.groupBy(_._2).view.mapValues(_.size.toLong).toMap
      val ns = rows.size.toLong
      val kl = (0 until k).map { b =>
        val p = (cs.getOrElse(b, 0L) + 1.0) / (ns + k.toDouble)
        val q = (corpusCnt.getOrElse(b, 0L) + 1.0) / (n + k.toDouble)
        p * math.log(p / q)
      }.sum
      src -> (ns, kl)
    }
    val got = Scoring.q181SourceDrift(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(got.keySet == want.keySet)
    want.foreach { case (src, (ns, kl)) =>
      assert(got(src)._1 == ns, s"$src n_tokens")
      assert(math.abs(got(src)._2 - kl) < 1.1e-6, s"$src kl: got ${got(src)._2} want $kl")
    }
    // KL is non-negative and SOME source must diverge from the mix
    assert(want.values.forall(_._2 >= -1e-12))
    assert(want.values.exists(_._2 > 1e-4), "fixture sanity: corpus has no drift signal at all")
  }

  test("q187 BM25 top-20 matches a driver-side fold; q188 blends it with cosine") {
    // driver-side BM25 over the same corpus and query
    val byDoc = docs.map { case (id, text, _, _) => id -> tokens(text) }
      .filter(_._2.nonEmpty)
    val nDocs = byDoc.size.toDouble
    val avgdl = byDoc.map(_._2.size).sum.toDouble / nDocs
    val dfm = Scoring.Bm25Query.map { t =>
      t -> byDoc.count(_._2.contains(t)).toDouble }.toMap
    val want = byDoc.map { case (id, ts) =>
      val dl = ts.size.toDouble
      val s = Scoring.Bm25Query.map { t =>
        val tf = ts.count(_ == t).toDouble
        if (tf == 0 || dfm(t) == 0) 0.0
        else math.log((nDocs - dfm(t) + 0.5) / (dfm(t) + 0.5) + 1.0) *
          (tf * (Scoring.Bm25K1 + 1.0)) /
          (tf + Scoring.Bm25K1 * (1.0 - Scoring.Bm25B +
            Scoring.Bm25B * dl / avgdl))
      }.sum
      id -> s
    }.filter(_._2 > 0)
      .sortBy { case (id, s) =>
        (-BigDecimal(s).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble, id) }
      .take(20)
    val got = Scoring.q187Bm25(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getDouble(1))
    assert(got.map(_._1).toSeq == want.map(_._1), s"got $got want $want")
    got.zip(want).foreach { case ((_, g), (_, w)) =>
      assert(math.abs(g - w) < 1.1e-6) }
    // the hybrid rerank keeps candidate lexical order only where
    // cosine agrees; sanity: 10 rows, hybrid in [0, ~1.0001+], and
    // every returned doc is a BM25 candidate
    val hyb = Scoring.q188HybridRerank(spark, sf).collect()
    assert(hyb.length == 10)
    val candIds = Scoring.bm25Scores(spark, sf)
      .orderBy(org.apache.spark.sql.functions.col("bm25").desc,
        org.apache.spark.sql.functions.col("doc_id"))
      .limit(Scoring.HybridCand).collect().map(_.getLong(0)).toSet
    hyb.foreach { r =>
      assert(candIds.contains(r.getLong(0)))
      assert(r.getDouble(3) >= -1.0 && r.getDouble(3) <= 1.5)
      // blend arithmetic holds row by row against its own parts
      val mx = got.map(_._2).max
      assert(math.abs(r.getDouble(3) -
        BigDecimal(0.5 * r.getDouble(1) / mx + 0.5 * r.getDouble(2))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1.1e-6)
    }
  }

  test("q190 retrieval eval metrics match a driver-side recomputation") {
    def r6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    // relevance grade: distinct query terms present (0-3)
    val rel = docs.map { case (id, text, _, _) =>
      id -> Scoring.Bm25Query.count(tokens(text).contains(_))
    }.filter(_._2 > 0).toMap
    def dcg(ranked: Seq[Long]): Double =
      ranked.zipWithIndex.map { case (id, i) =>
        val gain = ((1 << rel.getOrElse(id, 0)) - 1).toDouble
        r6(gain / (math.log(i + 2.0) / math.log(2.0)))
      }.sum
    val idcg = dcg(rel.toSeq.sortBy { case (id, g) => (-g, id) }
      .take(Scoring.EvalK).map(_._1))
    val totrel = rel.size.toDouble
    // the three ranked lists from the graded rankings themselves
    // (their own specs/oracles pin the scores; this spec pins the
    // METRIC fold over them)
    val lists = Map(
      "bm25" -> Scoring.q187Bm25(spark, sf).collect()
        .map(_.getLong(0)).take(Scoring.EvalK).toSeq,
      "hybrid" -> Scoring.q188HybridRerank(spark, sf).collect()
        .map(_.getLong(0)).take(Scoring.EvalK).toSeq,
      "rrf" -> Scoring.q189RrfFusion(spark, sf).collect()
        .map(_.getLong(0)).take(Scoring.EvalK).toSeq)
    val got = Scoring.q190RetrievalEval(spark, sf).collect()
      .map(r => r.getString(0) ->
        (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    assert(got.keySet == Set("bm25", "hybrid", "rrf"))
    lists.foreach { case (sys, ranked) =>
      val (gn, gr, gp) = got(sys)
      val nrel = ranked.count(rel.getOrElse(_, 0) > 0).toDouble
      assert(math.abs(gn - (if (idcg > 0) r6(dcg(ranked) / idcg) else 0.0)) < 1.1e-6,
        s"$sys ndcg: got $gn")
      assert(math.abs(gr - (if (totrel > 0) r6(nrel / totrel) else 0.0)) < 1.1e-6,
        s"$sys recall: got $gr")
      assert(math.abs(gp - r6(nrel / Scoring.EvalK)) < 1.1e-6,
        s"$sys precision: got $gp")
      assert(gn >= 0.0 && gn <= 1.0 && gr >= 0.0 && gr <= 1.0)
    }
    // the fixture must actually exercise relevance (query terms DO
    // appear in the corpus) or every metric degenerates to 0
    assert(totrel > 0 && idcg > 0)
  }

  test("q194/q195 multi-query BM25 + eval metrics match a driver-side recomputation") {
    def r6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    // driver-side BM25 shared stats (whole corpus, as in the q187 twin)
    val byDoc = docs.map { case (id, text, _, _) => id -> tokens(text) }
      .filter(_._2.nonEmpty)
    val nDocs = byDoc.size.toDouble
    val avgdl = byDoc.map(_._2.size).sum.toDouble / nDocs
    def bm25For(terms: Seq[String]): Map[Long, Double] = {
      val dfm = terms.map(t => t -> byDoc.count(_._2.contains(t)).toDouble).toMap
      byDoc.map { case (id, ts) =>
        val dl = ts.size.toDouble
        id -> terms.map { t =>
          val tf = ts.count(_ == t).toDouble
          if (tf == 0 || dfm(t) == 0) 0.0
          else math.log((nDocs - dfm(t) + 0.5) / (dfm(t) + 0.5) + 1.0) *
            (tf * (Scoring.Bm25K1 + 1.0)) /
            (tf + Scoring.Bm25K1 * (1.0 - Scoring.Bm25B +
              Scoring.Bm25B * dl / avgdl))
        }.sum
      }.filter(_._2 > 0).toMap
    }
    def rankOf(scores: Map[Long, Double]): Seq[Long] =
      scores.toSeq.sortBy { case (id, s) => (-r6(s), id) }.map(_._1)
    // q194: top-5 per query equals the per-query fold
    val got194 = Scoring.q194Bm25Multi(spark, sf).collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
    Scoring.EvalQuerySets.foreach { case (qid, terms) =>
      val want = rankOf(bm25For(terms)).take(Scoring.MultiTopK)
      val gotQ = got194.filter(_._1 == qid).sortBy(_._2).map(_._3).toSeq
      assert(gotQ == want, s"qid $qid: got $gotQ want $want")
    }
    // q195: per-query nDCG/MRR/AP over the same top-10 lists
    val got195 = Scoring.q195MultiqueryEval(spark, sf).collect()
      .map(r => r.getInt(0) ->
        (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    Scoring.EvalQuerySets.foreach { case (qid, terms) =>
      val rel = docs.map { case (id, text, _, _) =>
        id -> terms.count(tokens(text).contains(_)) }.filter(_._2 > 0).toMap
      val ranked = rankOf(bm25For(terms)).take(Scoring.EvalK)
      def dcg(ids: Seq[Long]): Double = ids.zipWithIndex.map { case (id, i) =>
        r6((((1 << rel.getOrElse(id, 0)) - 1).toDouble) /
          (math.log(i + 2.0) / math.log(2.0)))
      }.sum
      val idcg = dcg(rel.toSeq.sortBy { case (id, g) => (-g, id) }
        .take(Scoring.EvalK).map(_._1))
      val relFlags = ranked.map(rel.getOrElse(_, 0) > 0)
      val mrr = relFlags.zipWithIndex.collectFirst {
        case (true, i) => 1.0 / (i + 1) }.getOrElse(0.0)
      val ap = {
        var cum = 0; var s = 0.0
        relFlags.zipWithIndex.foreach { case (f, i) =>
          if (f) { cum += 1; s += cum.toDouble / (i + 1) } }
        s / math.min(rel.size, Scoring.EvalK)
      }
      val (gn, gm, ga) = got195(qid)
      assert(math.abs(gn - (if (idcg > 0) r6(dcg(ranked) / idcg) else 0.0)) < 1.1e-6,
        s"qid $qid ndcg: $gn")
      assert(math.abs(gm - r6(mrr)) < 1.1e-6, s"qid $qid mrr: $gm vs $mrr")
      assert(math.abs(ga - r6(ap)) < 1.1e-6, s"qid $qid ap: $ga vs $ap")
      assert(rel.nonEmpty && idcg > 0, s"qid $qid fixture must have relevance")
    }
  }

  test("q197 index upsert REPLACES a re-ingested doc's postings (anti-join path)") {
    // the graded corpus has unique doc_ids, so the DuckDB gate alone
    // never exercises replacement — feed a modified duplicate here
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(StructField("doc_id", LongType),
      StructField("text", StringType)))
    def df(rows: (Long, String)*) = spark.createDataFrame(
      java.util.Arrays.asList(rows.map(r => Row(r._1, r._2)): _*), schema)
    val index0 = Scoring.tfdOf(df(1L -> "alpha beta alpha", 2L -> "gamma"))
    val batchDocs = df(1L -> "delta", 3L -> "beta beta")
    val got = Scoring.upsertPostings(index0, batchDocs, Scoring.tfdOf(batchDocs))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    val scratch = Scoring.tfdOf(df(1L -> "delta", 2L -> "gamma", 3L -> "beta beta"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(got == scratch, s"upsert $got vs from-scratch $scratch")
    // doc 1's OLD postings (alpha, beta) must be gone, not merged
    assert(!got.exists { case (id, t, _) => id == 1L && t != "delta" })
    // a re-ingested doc whose NEW text has zero tokens must also lose
    // its stale postings (r12 review: keying the anti-join on the
    // tokenized postings instead of the raw batch ids missed this)
    val emptied = df(1L -> "")
    val got2 = Scoring.upsertPostings(index0, emptied, Scoring.tfdOf(emptied))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(got2 == Set((2L, "gamma", 1L)),
      s"emptied doc 1 must vanish from the index, got $got2")
  }

  test("q199 dense upsert: re-ingested vector replaces its row; empty batch is identity") {
    // the dense maintainer's replacement edges (r12 verdict #3),
    // through the same upsertByKey the streaming q199 uses — the
    // graded catalog has unique vec_ids so the gate alone never
    // exercises replacement
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(StructField("vec_id", LongType),
      StructField("cell", IntegerType),
      StructField("embedding", ArrayType(FloatType))))
    def df(rows: (Long, Int, Float)*) = spark.createDataFrame(
      java.util.Arrays.asList(rows.map(r => Row(r._1, r._2, Seq(r._3))): _*),
      schema)
    def snap(d: org.apache.spark.sql.DataFrame) = d.collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getSeq[Float](2).head)).toSet
    val index0 = df((1L, 3, 0.1f), (2L, 5, 0.2f))
    // re-ingested vector 1 arrives with a DIFFERENT embedding and
    // lands in a different cell: its OLD row must be replaced, not
    // joined by a second assignment
    val batch = df((1L, 7, 0.9f))
    val got = snap(graft.pipeline.Scoring.upsertByKey(
      index0, batch.select("vec_id"), batch, "vec_id"))
    assert(got == Set((1L, 7, 0.9f), (2L, 5, 0.2f)), got)
    // an empty trigger must be the identity on the stored state
    val empty = df()
    val got2 = snap(graft.pipeline.Scoring.upsertByKey(
      index0, empty.select("vec_id"), empty, "vec_id"))
    assert(got2 == snap(index0), got2)
  }

  test("q202 hard negatives: dense top candidates minus full-overlap positives, hardest first") {
    import org.apache.spark.sql.functions.col
    val got = Scoring.q202HardNegatives(spark, sf).collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
    assert(got.nonEmpty, "mined pool must not be empty (the any-overlap bug)")
    // driver-side relevance: full-overlap positives per query
    val full = Scoring.EvalQuerySets.map { case (qid, ts) =>
      qid -> docs.filter { case (_, text, _, _) =>
        val tk = tokens(text).toSet
        ts.forall(tk.contains)
      }.map(_._1).toSet
    }.toMap
    // driver-side dense candidates: cosine of each catalog vector to
    // the query's own vector, top DenseCand
    val vecs = spark.read.parquet(s"$sf/embeddings.parquet")
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray)
      .toMap
    def norm(a: Array[Double]) = math.sqrt(a.map(x => x * x).sum)
    def cosr(a: Array[Double], b: Array[Double]) = BigDecimal(
      a.zip(b).map { case (x, y) => x * y }.sum / (norm(a) * norm(b)))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    Scoring.EvalQuerySets.foreach { case (qid, _) =>
      val qv = vecs(qid.toLong)
      val top = vecs.toSeq.filter(_._1 != qid.toLong)
        .map { case (d, e) => (d, cosr(e, qv)) }
        .sortBy { case (d, c) => (-c, d) }.take(Scoring.DenseCand)
      val expect = top.filterNot { case (d, _) => full(qid).contains(d) }
        .take(Scoring.HardK)
        .zipWithIndex.map { case ((d, c), i) => (qid, i + 1, d, c) }
      val mined = got.filter(_._1 == qid).sortBy(_._2).toSeq
      assert(mined == expect, s"qid $qid: $mined vs $expect")
      // and no mined negative is ever a full-overlap positive
      assert(mined.forall { case (_, _, d, _) => !full(qid).contains(d) })
    }
  }

  test("q206 routed negatives: shared positives excluded, scores exact, recall floor vs q202") {
    import org.apache.spark.sql.functions.col
    val routedRows = Scoring.q206HardNegativesRouted(spark, sf).collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
    assert(routedRows.nonEmpty, "routed mining must not be empty")
    // ranks contiguous from 1 per query
    routedRows.groupBy(_._1).foreach { case (q, rs) =>
      assert(rs.map(_._2).sorted.toSeq == (1 to rs.length), s"qid $q ranks")
    }
    // the SHARED positives relation really is excluded
    val pos = Scoring.fullOverlapPositives(spark, sf).collect()
      .map(r => (r.getInt(0), r.getLong(1))).toSet
    assert(routedRows.forall { case (q, _, d, _) => !pos((q, d)) })
    // every routed cosine equals the EXACT full-scan cosine for that
    // pair (routing changes which candidates are reachable, never
    // their scores) — recomputed driver-side at the routed 4dp grain
    val vecs = spark.read.parquet(s"$sf/embeddings.parquet")
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray)
      .toMap
    def norm(a: Array[Double]) = math.sqrt(a.map(x => x * x).sum)
    def cos4(a: Array[Double], b: Array[Double]) = BigDecimal(
      a.zip(b).map { case (x, y) => x * y }.sum / (norm(a) * norm(b)))
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    routedRows.foreach { case (q, _, d, c) =>
      assert(cos4(vecs(d), vecs(q.toLong)) == c, s"($q,$d): routed $c")
    }
    // recall floor vs the exact miner: probing NProbe/NCells of the
    // catalog must still recover at least half the exact negatives —
    // the same envelope the q61 ANN family documents
    val exact = Scoring.q202HardNegatives(spark, sf).collect()
      .map(r => (r.getInt(0), r.getLong(2))).toSet
    val routed = routedRows.map { case (q, _, d, _) => (q, d) }.toSet
    val hits = routed.intersect(exact).size
    assert(hits * 2 >= exact.size,
      s"routed recall collapsed: $hits of ${exact.size} exact negatives")
  }

  test("q182 bigram vocabulary growth matches a driver-side recomputation") {
    val first = scala.collection.mutable.Map.empty[Long, Long]
    docs.foreach { case (id, text, _, _) =>
      val d = id % 10
      grams(text, 2).foreach { g =>
        val h = h60s(g)
        if (!first.contains(h) || first(h) > d) first(h) = d
      }
    }
    val wantNew = first.values.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val got = Scoring.q182VocabGrowth(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.map(_._1).toSeq == got.map(_._1).toSeq.sorted)
    got.foreach { case (d, nNew, _) => assert(nNew == wantNew(d), s"decile $d") }
    // cumulative column is the running sum and ends at the full vocab
    assert(got.map(_._2).sum == first.size.toLong)
    assert(got.last._3 == first.size.toLong)
    got.foldLeft(0L) { case (acc, (_, nNew, cum)) =>
      assert(cum == acc + nNew); cum }
    assert(got.length >= 5, "fixture sanity: the bigram curve must actually grow across batches")
  }

  test("streaming drift monitor equals the one-shot probe and ranks planted drift above in-distribution") {
    import org.apache.spark.sql.functions._
    implicit val ctx = spark.sqlContext
    import spark.implicits._
    val corpus = spark.read.parquet(s"$sf/documents.parquet").select(col("text"))
    val ref = Scoring.buildDriftRef(corpus)
    assert(ref.length == Scoring.DsirBuckets && math.abs(ref.sum - 1.0) < 1e-9)
    // batch 1: in-distribution (a corpus slice); batch 2: planted
    // drift (one word repeated — the template-takeover failure mode)
    val inDist = docs.take(40).map(_._2)
    val drifted = Seq.fill(40)(Seq.fill(30)("driftword").mkString(" "))
    val seen = scala.collection.mutable.Map.empty[Long, (Long, Double)]
    val ms = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[String]
    val q = graft.streaming.Streams.streamingDriftMonitor(
      ms.toDF().toDF("text"), ref, "drift_mon") { (id, verdict) =>
      val r = verdict.collect()(0)
      seen(id) = (r.getLong(0), r.getDouble(1))
    }
    try {
      ms.addData(inDist); q.processAllAvailable()
      ms.addData(drifted); q.processAllAvailable()
    } finally q.stop()
    assert(seen.size == 2)
    // streaming == one-shot driftAgainst on the same batch
    Seq(0L -> inDist, 1L -> drifted).foreach { case (id, batch) =>
      val r = Scoring.driftAgainst(ref, batch.toDF("text")).collect()(0)
      assert(seen(id) == ((r.getLong(0), r.getDouble(1))), s"batch $id")
    }
    // the planted-drift batch must score far above the corpus slice
    assert(seen(1L)._2 > seen(0L)._2 + 0.5,
      s"drift ${seen(1L)._2} vs in-dist ${seen(0L)._2}")
  }

  test("q90 bigram perplexity matches a driver-side LM recomputation") {
    val toks = docs.flatMap(d => tokens(d._2))
    val c1 = toks.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val v = toks.distinct.size.toDouble
    val allBg = docs.flatMap(d => grams(d._2, 2))
    val c2 = allBg.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val expected = docs.map { case (id, text, _, _) =>
      val bgs = grams(text, 2).filter(b => c1.contains(b.split(" ")(0)))
      id -> bgs.map(b => -math.log((c2(b) + 1.0) / (c1(b.split(" ")(0)) + v)))
    }.filter(_._2.nonEmpty).toMap
    val rows = Scoring.q90BigramPerplexity(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(rows.map(_._1).toSet == expected.keySet)
    rows.foreach { case (id, n, nll) =>
      val e = expected(id)
      assert(n == e.size, s"doc $id n_bigrams")
      assert(nll > 0.0)
      assert(math.abs(nll - e.sum / e.size) <= 0.011, s"doc $id nll")
    }
  }
}
