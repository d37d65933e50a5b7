package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.Portable._
import graft.sources.Tables

/** Text-analysis operators for training-data curation over the
  * `documents` table: language identification (stopword-profile
  * heuristic), quality scoring (length/lexical-diversity/stopword
  * ratios), token counting (whitespace + regex sub-token), and
  * document fingerprinting (bottom-k sketch of character n-gram
  * hashes).
  *
  * Everything is a narrow per-row projection — no shuffle at all
  * except optional final ordering — so these run at scan speed on any
  * corpus size; the expressions stay inside whole-stage codegen (no
  * UDFs).
  */
object TextAnalysis {

  // ---------------------------------------------------------------- q36
  /** Language ID: count stopword hits per language profile, predict
    * the best-scoring language with a fixed priority order on ties.
    * (On this synthetic corpus every language shares one vocabulary,
    * so the interesting property is determinism, not accuracy.)
    */
  val Profiles: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("der", "die", "das", "und", "zu", "ist"),
    "en" -> Seq("the", "a", "of", "and", "to", "is"),
    "es" -> Seq("el", "la", "de", "y", "en", "es"),
    "fr" -> Seq("le", "la", "de", "et", "les", "est"),
    "zh" -> Seq("de5", "shi4", "zai4", "le5", "he2", "you3"))

  private def hitCount(words: Column, profile: Seq[String]): Column =
    size(filter(words, w => array_contains(array(profile.map(lit): _*), w)))

  def q36LangId(spark: SparkSession, dir: String): DataFrame = {
    val words = split(col("text"), " ")
    val scored = Tables.documents(spark, dir).select(
      (Seq(col("doc_id"), col("lang")) ++
        Profiles.map { case (l, p) => hitCount(words, p).as(s"s_$l") }): _*)
    // argmax with first-wins tie-break in profile order (de,en,es,fr,zh)
    val langs = Profiles.map(_._1)
    val pred = langs.zipWithIndex.foldRight(lit(langs.last): Column) { case ((l, _), rest) =>
      val others = langs.filter(_ != l).map(o => col(s"s_$l") >= col(s"s_$o")).reduce(_ && _)
      when(others, lit(l)).otherwise(rest)
    }
    scored.select(col("doc_id"), pred.as("lang_pred"),
        (pred === col("lang")).cast("int").as("is_correct"))
      .orderBy(col("doc_id"))
  }

  val q36Sql: String = {
    val langs = Profiles.map(_._1)
    val scores = Profiles.map { case (l, p) =>
      val arr = p.map(w => s"'$w'").mkString("[", ", ", "]")
      s"len(list_filter(str_split(text, ' '), w -> list_contains($arr, w))) AS s_$l"
    }.mkString(",\n  ")
    val pred = langs.map { l =>
      val conds = langs.filter(_ != l).map(o => s"s_$l >= s_$o").mkString(" AND ")
      s"WHEN $conds THEN '$l'"
    }.mkString("CASE ", "\n    ", s" ELSE '${langs.last}' END")
    s"""WITH scored AS (SELECT doc_id, lang,
       |  $scores
       |  FROM documents)
       |SELECT doc_id, $pred AS lang_pred,
       |  CAST(($pred) = lang AS INT) AS is_correct
       |FROM scored ORDER BY doc_id""".stripMargin
  }

  // ---------------------------------------------------------------- q37
  /** Quality scoring: word count, type/token ratio (lexical
    * diversity), English-stopword ratio, mean word length — combined
    * into one bounded score. All ratios are exact rational arithmetic
    * over integer counts (single IEEE division each), so no rounding
    * tolerance is needed until the final blend.
    */
  def q37Quality(spark: SparkSession, dir: String): DataFrame = {
    val words = split(col("text"), " ")
    val en = Profiles.toMap.apply("en")
    Tables.documents(spark, dir).select(
      col("doc_id"),
      size(words).as("n_words"),
      (size(array_distinct(words)) / size(words).cast("double")).as("ttr"),
      (size(filter(words, w => array_contains(array(en.map(lit): _*), w)))
        / size(words).cast("double")).as("stop_ratio"),
      ((length(col("text")) - size(words) + 1) / size(words).cast("double")).as("avg_word_len"))
      .withColumn("quality",
        round(lit(0.4) * col("ttr") + lit(0.3) * (lit(1.0) - col("stop_ratio")) +
          lit(0.3) * least(col("avg_word_len") / lit(8.0), lit(1.0)), 6))
      .orderBy(col("doc_id"))
  }

  val q37Sql: String = {
    val en = Profiles.toMap.apply("en").map(w => s"'$w'").mkString("[", ", ", "]")
    s"""SELECT doc_id,
       |  len(w) AS n_words,
       |  len(list_distinct(w)) / CAST(len(w) AS DOUBLE) AS ttr,
       |  len(list_filter(w, x -> list_contains($en, x))) / CAST(len(w) AS DOUBLE) AS stop_ratio,
       |  (length(text) - len(w) + 1) / CAST(len(w) AS DOUBLE) AS avg_word_len,
       |  round(0.4 * (len(list_distinct(w)) / CAST(len(w) AS DOUBLE))
       |      + 0.3 * (1.0 - len(list_filter(w, x -> list_contains($en, x))) / CAST(len(w) AS DOUBLE))
       |      + 0.3 * least(((length(text) - len(w) + 1) / CAST(len(w) AS DOUBLE)) / 8.0, 1.0), 6) AS quality
       |FROM (SELECT doc_id, text, str_split(text, ' ') AS w FROM documents)
       |ORDER BY doc_id""".stripMargin
  }

  // ---------------------------------------------------------------- q38
  /** Token counting: whitespace tokens and a BPE-ish sub-token count
    * (letter runs, digit runs, single other chars) via
    * regexp_extract_all — the standard "how many tokens is this
    * corpus" pre-pass, one narrow projection.
    */
  def q38TokenCount(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir).select(
      col("doc_id"),
      size(split(col("text"), " ")).as("ws_tokens"),
      size(expr("regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]', 0)")).as("sub_tokens"),
      length(col("text")).as("n_chars"))
      .withColumn("chars_per_token",
        round(col("n_chars") / col("sub_tokens").cast("double"), 6))
      .orderBy(col("doc_id"))

  val q38Sql: String =
    """SELECT doc_id,
      |  len(str_split(text, ' ')) AS ws_tokens,
      |  len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS sub_tokens,
      |  length(text) AS n_chars,
      |  round(length(text) / CAST(len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS DOUBLE), 6) AS chars_per_token
      |FROM documents ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- q39
  /** Document fingerprinting: bottom-4 sketch over character 8-gram
    * hashes — a compact order-independent signature whose pairwise
    * overlap estimates containment (the winnowing/MOSS family). One
    * projection; the sketch (4 longs) is what ships to any
    * downstream join, never the text.
    */
  val GramLen = 8
  val SketchK = 4

  def q39Fingerprint(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir).select(col("doc_id"),
      // guard like Portable.shingles: sequence() descends for texts
      // shorter than GramLen; the oracle's range() yields [] there.
      // The sketch ships as a comma-joined string, not array<bigint>:
      // the grading harness sorts by every output column and can't
      // hash array cells. Integer-to-string rendering is identical
      // across engines, so the hash check stays exact.
      when(length(col("text")) >= GramLen,
        array_join(transform(
          slice(array_sort(array_distinct(transform(
            expr(s"transform(sequence(1, length(text) - ${GramLen - 1}), i -> substr(text, i, $GramLen))"),
            g => h60(g)))), 1, SketchK),
          x => x.cast("string")), ","))
        .otherwise(lit("")).as("sketch"))
      .orderBy(col("doc_id"))

  val q39Sql: String =
    s"""SELECT doc_id,
       |  array_to_string((list_sort(list_distinct([${h60Sql("text[i:i+" + (GramLen - 1) + "]")}
       |    for i in range(1, length(text) - ${GramLen - 2})])))[1:$SketchK], ',') AS sketch
       |FROM documents ORDER BY doc_id""".stripMargin

  /** Winnowing fingerprint (the robust upgrade over q39's global
    * bottom-k, standard for plagiarism/near-dup detection; Schleimer,
    * Wilkerson & Aiken, SIGMOD'03): hash the POSITIONAL gram
    * sequence, slide a window of [[WinnowW]] consecutive hashes, keep
    * each window's MINIMUM. The guarantee q39's global bottom-k
    * cannot give: any shared substring of ≥ WinnowW+GramLen−1 chars
    * contributes at least one COMMON selected hash between two
    * documents (both sides select the minimum of the same
    * fully-shared hash window). Operates on any (doc_id, text) frame;
    * narrow projection, scan speed, output is the distinct
    * selected-hash set — a VALUE set, so unlike per-window argmin
    * POSITIONS it needs no tie-break and has an exact SQL twin
    * (graded q177).
    */
  val WinnowW = 8

  def winnowFingerprint(docs: DataFrame): DataFrame = {
    // CPU-bound per-doc work (one md5 per gram position): spread
    // small-file inputs to core-count parallelism first —
    // graft.engine.Cpu.spread is a no-op at real corpus scale
    graft.engine.Cpu.spread(docs).select(col("doc_id"),
      graft.functions.WinnowFp.winnowFp(col("text"), GramLen, WinnowW).as("fp"))
  }

  /** Exploded `(doc_id, fp)` winnow rows — THE way to flatten
    * [[winnowFingerprint]]. Uses `explode_outer` + an isNotNull
    * post-filter instead of plain `explode`: for a non-outer
    * Generate, Catalyst's InferFiltersFromGenerate adds
    * `size(graft_winnow_fp(text)) > 0` and pushes it below the
    * spread exchange into the scan stage — the entire kernel (the
    * dominant cost) evaluated a SECOND time, pinned to however few
    * tasks the file split into (at sf0.1: one task carrying 100% of
    * the digest work; this, not the md5s, was q177's wall-clock).
    * The outer form cannot be inferred on; the null row an empty
    * fingerprint array produces is dropped right after, so the
    * output rows are identical. */
  def winnowExploded(docs: DataFrame): DataFrame =
    winnowFingerprint(docs)
      .select(col("doc_id"), explode_outer(col("fp")).as("fp"))
      .filter(col("fp").isNotNull)

  /** The compositional (built-in HOF) form of [[winnowFingerprint]],
    * kept as the semantic twin PipelineSpec pins the native
    * [[graft.functions.WinnowFp]] against bit-for-bit. NOT on any
    * query path: higher-order functions evaluate interpreted, and the
    * `hs` array feeding the window lambda gets re-walked per window —
    * ~WinnowW× the digest work plus interpreter overhead made this
    * form two orders of magnitude slower at sf0.1 (it is what
    * actually overran the round-9 driver bench window mid-q177). */
  private[graft] def winnowFingerprintCompositional(docs: DataFrame): DataFrame = {
    val grams = expr(
      s"transform(sequence(1, length(text) - ${GramLen - 1}), i -> substr(text, i, $GramLen))")
    docs
      .select(col("doc_id"), col("text"), transform(grams, g => h60(g)).as("hs"))
      .select(col("doc_id"),
        when(length(col("text")) >= GramLen + WinnowW - 1,
          array_distinct(transform(
            sequence(lit(1), size(col("hs")) - (WinnowW - 1)),
            w => array_min(slice(col("hs"), w, lit(WinnowW))))))
          .otherwise(expr("CAST(array() AS ARRAY<BIGINT>)")).as("fp"))
  }

  // ---------------------------------------------------------------- q177
  /** Graded winnowing surface: [[winnowFingerprint]] exploded to one
    * (doc_id, fp) row per selected fingerprint. The window-min VALUE
    * set is pure integer algebra over [[graft.functions.Portable.h60]]
    * hashes, so the DuckDB oracle reproduces it bit-for-bit as a list
    * comprehension (`list_min` over inclusive slices — the same
    * windows as the Spark `slice`). Docs shorter than
    * GramLen+WinnowW−1 select nothing on both engines.
    */
  def q177WinnowFingerprint(spark: SparkSession, dir: String): DataFrame =
    winnowExploded(Tables.documents(spark, dir).select(col("doc_id"), col("text")))
      .orderBy(col("doc_id"), col("fp"))

  val q177Sql: String =
    s"""WITH hs AS (SELECT doc_id,
       |    [${h60Sql(s"text[i:i+${GramLen - 1}]")} for i in range(1, length(text) - ${GramLen - 2})] AS hs
       |  FROM documents WHERE length(text) >= ${GramLen + WinnowW - 1})
       |SELECT doc_id,
       |  unnest(list_distinct([list_min(hs[w:w+${WinnowW - 1}]) for w in range(1, len(hs) - ${WinnowW - 2})])) AS fp
       |FROM hs ORDER BY doc_id, fp""".stripMargin

  // ---------------------------------------------------------------- q179
  /** Character-entropy quality signal (low-entropy text is repeated
    * boilerplate / padding; near-uniform entropy is encoded noise —
    * both standard corpus-filter axes alongside q37's ratio features
    * and [[compressionRatio]]). Shannon entropy in bits over the char
    * histogram of the first [[EntropyK]] chars (the bounded-prefix
    * posture: the signal saturates quickly and the cost per doc stays
    * O(EntropyK) regardless of doc length). Computed as
    * log2(n) − Σ c·log2(c) / n so one two-level aggregate suffices;
    * map-side partial aggs collapse the per-(doc,char) counts before
    * either shuffle. Transcendental output → rounded (4 decimals) on
    * BOTH engines, per the cross-engine libm rule.
    */
  val EntropyK = 256

  def q179CharEntropy(spark: SparkSession, dir: String): DataFrame =
    // spread: the 256-wide char expansion is CPU-bound per doc — at
    // sf1 the whole 12.8M-row generate otherwise runs on the file's
    // ONE split (measured 8.5 s; spread ≈ core-count × faster)
    graft.engine.Cpu.spread(Tables.documents(spark, dir))
      // contract (mirrored in the SQL): empty docs get NO entropy row.
      // Without the filter, Spark's sequence(1, 0) is the DESCENDING
      // [1, 0] → two '' chars → a spurious 0.0 row, while DuckDB's
      // range(1, 1) is empty — a latent cross-engine divergence
      // (round-9 advice).
      .filter(length(col("text")) >= 1)
      // explode_OUTER: plain explode lets InferFiltersFromGenerate
      // push a size(transform(...)) > 0 filter into the scan — the
      // whole 256-substr expansion evaluated a second time (the q177
      // lesson). The array is never empty after the length filter, so
      // the outer form emits identical rows and nothing is inferred.
      .select(col("doc_id"), explode_outer(expr(
        s"transform(sequence(1, least(length(text), $EntropyK)), i -> substr(text, i, 1))")).as("ch"))
      .groupBy(col("doc_id"), col("ch"))
      .agg(count(lit(1)).cast("double").as("c"))
      .groupBy(col("doc_id"))
      .agg(round(log2(sum(col("c"))) - sum(col("c") * log2(col("c"))) / sum(col("c")), 4)
        .as("entropy"))
      .orderBy(col("doc_id"))

  val q179Sql: String =
    s"""WITH ch AS (SELECT doc_id, unnest([text[i:i] for i in range(1, least(length(text), $EntropyK) + 1)]) AS ch
       |  FROM documents WHERE length(text) >= 1),
       |hist AS (SELECT doc_id, ch, count(*)::DOUBLE AS c FROM ch GROUP BY doc_id, ch)
       |SELECT doc_id, round(log2(sum(c)) - sum(c * log2(c)) / sum(c), 4) AS entropy
       |FROM hist GROUP BY doc_id ORDER BY doc_id""".stripMargin

  /** Compression-ratio quality signal (the CCNet/RefinedWeb-style
    * repetition proxy: machine-generated and boilerplate text
    * deflates far below natural prose). One Deflater per PARTITION,
    * reset per row — codec init amortized the same way q40's media
    * decoder is; output is raw vs deflated byte counts, the ratio is
    * the caller's division. No SQL twin (zlib), spec-verified;
    * narrow projection, scan speed.
    */
  def compressionRatio(docs: DataFrame): DataFrame = {
    import docs.sparkSession.implicits._
    docs.select(col("doc_id"), col("text")).as[(Long, String)]
      .mapPartitions { it =>
        val deflater = new java.util.zip.Deflater(java.util.zip.Deflater.BEST_SPEED)
        val buf = new Array[Byte](1 << 16)
        it.map { case (id, text) =>
          val in = text.getBytes("UTF-8")
          deflater.reset()
          deflater.setInput(in)
          deflater.finish()
          var out = 0L
          while (!deflater.finished()) out += deflater.deflate(buf)
          (id, in.length.toLong, out)
        }
      }
      .toDF("doc_id", "raw_bytes", "deflate_bytes")
      .orderBy(col("doc_id"))
  }

  // ---------------------------------------------------------------- q50
  /** Sequence packing for training batches: assign documents (in
    * doc_id order) to fixed token-budget context windows by running
    * token count — the offset-packing variant (bin = cumulative
    * tokens ÷ budget). The global cumsum is computed two-phase so no
    * single task ever holds the corpus: per-chunk window cumsum
    * (chunk = doc_id range), then each chunk's starting offset from
    * the tiny chunk-totals relation broadcast back. Exact integer
    * arithmetic, identical to the oracle's single global window.
    */
  val PackBudget = 512
  val PackChunk = 10000L

  def q50SequencePacking(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), size(split(col("text"), " ")).as("tokens"),
        (col("doc_id") / PackChunk).cast("long").as("chunk"))
    val wChunk = Window.partitionBy(col("chunk")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val inChunk = docs.withColumn("cum_in_chunk", sum(col("tokens")).over(wChunk))
    // one row per chunk — a single-partition window over THIS relation
    // is fine at any corpus size
    val wTotals = Window.orderBy(col("chunk"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val offsets = docs.groupBy(col("chunk")).agg(sum(col("tokens")).as("t"))
      .withColumn("offset", sum(col("t")).over(wTotals) - col("t"))
      .select(col("chunk").as("o_chunk"), col("offset"))
    inChunk.join(broadcast(offsets), col("chunk") === col("o_chunk"))
      .select(col("doc_id"), col("tokens"),
        ((col("cum_in_chunk") + col("offset") - col("tokens")) / PackBudget)
          .cast("long").as("bin"))
      .orderBy(col("doc_id"))
  }

  val q50Sql: String =
    s"""SELECT doc_id, tokens,
       |  CAST(floor((cum - tokens) / $PackBudget) AS BIGINT) AS bin
       |FROM (SELECT doc_id, len(str_split(text, ' ')) AS tokens,
       |        sum(len(str_split(text, ' '))) OVER (ORDER BY doc_id
       |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
       |      FROM documents)
       |ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- q51
  /** Stratified sampling by language with deterministic hash
    * thresholds — the scalable alternative to reservoir sampling:
    * membership is a pure function of content (md5 bucket < per-lang
    * quota), so the sample is reproducible, join-free, and stable
    * under re-runs and repartitioning. Quotas: en 20%, others 50%.
    */
  def q51StratifiedSample(spark: SparkSession, dir: String): DataFrame = {
    val bucket = h60(col("text")) % 100
    val quota = when(col("lang") === "en", 20).otherwise(50)
    Tables.documents(spark, dir)
      .filter(bucket < quota)
      .select(col("doc_id"), col("lang"), bucket.as("bucket"))
      .orderBy(col("doc_id"))
  }

  val q51Sql: String =
    s"""SELECT doc_id, lang, ${h60Sql("text")} % 100 AS bucket
       |FROM documents
       |WHERE ${h60Sql("text")} % 100 < (CASE WHEN lang = 'en' THEN 20 ELSE 50 END)
       |ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- q53
  /** Text normalization — the canonical pre-dedup cleaning stage:
    * lowercase, strip non-alphanumerics, collapse runs of whitespace,
    * trim. Pure narrow projection; emits the cleaned text plus a
    * changed flag so pipelines can measure cleaning impact.
    */
  def q53Normalize(spark: SparkSession, dir: String): DataFrame = {
    val cleaned = trim(regexp_replace(
      regexp_replace(lower(col("text")), "[^a-z0-9 ]", ""), " +", " "))
    Tables.documents(spark, dir)
      .select(col("doc_id"), cleaned.as("clean_text"),
        (cleaned =!= col("text")).cast("int").as("changed"),
        length(cleaned).as("n_chars_clean"))
      .orderBy(col("doc_id"))
  }

  val q53Sql: String =
    """SELECT doc_id,
      |  trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'),
      |       ' +', ' ', 'g')) AS clean_text,
      |  CAST(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'),
      |       ' +', ' ', 'g')) <> text AS INT) AS changed,
      |  length(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'),
      |       ' +', ' ', 'g'))) AS n_chars_clean
      |FROM documents ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- q54
  /** Capstone curation: the composed keep/drop decision a corpus
    * pipeline makes per document — quality threshold AND sampling
    * quota AND not a near-duplicate (exact-dup loser by content
    * hash: keep only the smallest doc_id per identical text). One
    * pass plus the dedup agg; each predicate is itself a graded
    * operator (q37, q51, q28), composed here the way a user would.
    */
  val QualityMin = 0.5

  def q54Curate(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val quality = q37Quality(spark, dir).select(col("doc_id").as("q_id"), col("quality"))
    val canonical = docs.groupBy(md5(col("text")).as("h"))
      .agg(min(col("doc_id")).as("keep_id"))
      .select(col("keep_id"))
    docs
      .join(quality, col("doc_id") === col("q_id"))
      .join(canonical, col("doc_id") === col("keep_id"), "left_semi")
      .filter(col("quality") >= QualityMin)
      .filter(h60(col("text")) % 100 < when(col("lang") === "en", 20).otherwise(50))
      .select(col("doc_id"), col("lang"), col("quality"))
      .orderBy(col("doc_id"))
  }

  val q54Sql: String = {
    val en = Profiles.toMap.apply("en").map(w => s"'$w'").mkString("[", ", ", "]")
    s"""WITH quality AS (
       |  SELECT doc_id,
       |    round(0.4 * (len(list_distinct(w)) / CAST(len(w) AS DOUBLE))
       |        + 0.3 * (1.0 - len(list_filter(w, x -> list_contains($en, x))) / CAST(len(w) AS DOUBLE))
       |        + 0.3 * least(((length(text) - len(w) + 1) / CAST(len(w) AS DOUBLE)) / 8.0, 1.0), 6) AS quality
       |  FROM (SELECT doc_id, text, str_split(text, ' ') AS w FROM documents)),
       |canonical AS (SELECT min(doc_id) AS keep_id FROM documents GROUP BY md5(text))
       |SELECT d.doc_id, d.lang, q.quality
       |FROM documents d
       |JOIN quality q ON d.doc_id = q.doc_id
       |WHERE d.doc_id IN (SELECT keep_id FROM canonical)
       |  AND q.quality >= $QualityMin
       |  AND ${h60Sql("d.text")} % 100 < (CASE WHEN d.lang = 'en' THEN 20 ELSE 50 END)
       |ORDER BY d.doc_id""".stripMargin
  }

  // ---------------------------------------------------------------- q68
  /** Intra-document repetition signal (the Gopher-style "fraction of
    * duplicate n-grams" quality gate): total vs distinct 3-gram
    * counts per document, plus the most repeated single gram's
    * multiplicity. Heavily repetitive documents (boilerplate,
    * template spam, degenerate generations) show a wide
    * total−distinct gap and a tall max multiplicity; downstream
    * filters threshold on these. All-integer output — the ratio is
    * the caller's division. Narrow per-doc projection, zero shuffle
    * beyond the presentation sort; runs at scan speed on any corpus.
    */
  def q68Repetition(spark: SparkSession, dir: String): DataFrame = {
    val grams = shingles(col("text"))
    Tables.documents(spark, dir)
      .select(col("doc_id"),
        size(grams).cast("long").as("n_grams"),
        size(array_distinct(grams)).cast("long").as("n_distinct"),
        // modal gram multiplicity = longest run in the sorted gram
        // array, folded in one pass (interpreted higher-order fold —
        // fine here: bounded by grams/doc, not corpus size, same
        // budget class as the q39 per-char lambdas)
        aggregate(
          array_sort(grams),
          struct(lit(0L).as("best"), lit(0L).as("run"), lit("").as("prev")),
          (acc, g) => {
            val run = when(g === acc.getField("prev"), acc.getField("run") + 1).otherwise(lit(1L))
            struct(greatest(acc.getField("best"), run).as("best"), run.as("run"), g.as("prev"))
          },
          acc => acc.getField("best")).as("max_gram_count"))
      .orderBy(col("doc_id"))
  }

  val q68Sql: String =
    s"""WITH g AS (SELECT doc_id, ${shinglesSql("text")} AS grams FROM documents),
       |e AS (SELECT doc_id, unnest(grams) AS gram FROM g),
       |m AS (SELECT doc_id, max(c) AS max_gram_count FROM (
       |        SELECT doc_id, gram, count(*) AS c FROM e GROUP BY doc_id, gram)
       |      GROUP BY doc_id)
       |SELECT g.doc_id, len(grams) AS n_grams,
       |  len(list_distinct(grams)) AS n_distinct,
       |  coalesce(m.max_gram_count, 0) AS max_gram_count
       |FROM g LEFT JOIN m ON g.doc_id = m.doc_id
       |ORDER BY g.doc_id""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q68_repetition" -> (q68Repetition _),
    "q36_langid" -> (q36LangId _),
    "q37_quality_score" -> (q37Quality _),
    "q38_token_count" -> (q38TokenCount _),
    "q39_fingerprint" -> (q39Fingerprint _),
    "q177_winnow_fingerprint" -> (q177WinnowFingerprint _),
    "q179_char_entropy" -> (q179CharEntropy _),
    "q50_sequence_packing" -> (q50SequencePacking _),
    "q51_stratified_sample" -> (q51StratifiedSample _),
    "q53_normalize" -> (q53Normalize _),
    "q54_curate" -> (q54Curate _))

  def oracles: Map[String, String] = Map(
    "q68_repetition" -> q68Sql,
    "q36_langid" -> q36Sql,
    "q37_quality_score" -> q37Sql,
    "q38_token_count" -> q38Sql,
    "q39_fingerprint" -> q39Sql,
    "q177_winnow_fingerprint" -> q177Sql,
    "q179_char_entropy" -> q179Sql,
    "q50_sequence_packing" -> q50Sql,
    "q51_stratified_sample" -> q51Sql,
    "q53_normalize" -> q53Sql,
    "q54_curate" -> q54Sql)
}
