package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Mergeable-sketch aggregates — the 100 TB replacements for exact
  * forms that need a global sort or a giant hash table. The reference
  * has no sketch layer (its aggregations are exact field aggregates,
  * DataSet.java:1130); these are the Spark-native operators a corpus-
  * scale pipeline swaps in, each a partial-aggregable state merged
  * across partitions — no exact-operator shuffle amplification:
  *
  *   - quantiles: `percentile_approx` (t-digest-style rank sketch) vs
  *     the exact per-group sort of [[Relational.q49Percentiles]];
  *   - distinct counts: `approx_count_distinct` (HyperLogLog++,
  *     relativeSD-tunable) vs the exact two-level distinct agg;
  *   - membership pruning: `BloomFilterAggregate` via
  *     `DataFrameStatFunctions.bloomFilter` for build-once probe-many
  *     dedup prefilters.
  *
  * No DuckDB-hash-matchable oracle exists for any of these (sketch
  * internals differ across engines by construction), so they are
  * spec-verified against their exact twins with error-bound
  * assertions instead of graded queries — the honest check for an
  * approximate operator.
  */
object Sketches {

  /** Approximate percentile with tunable accuracy (10000 ≈ 0.01%
    * rank error). Mergeable: partials combine associatively, so the
    * plan is partial_percentile_approx → one narrow exchange →
    * merge, regardless of group sizes. */
  def approxPercentile(df: DataFrame, valueCol: String, groupCols: Seq[String],
      percentiles: Seq[Double], accuracy: Int = 10000): DataFrame = {
    val pArr = array(percentiles.map(lit): _*)
    df.groupBy(groupCols.map(col): _*)
      .agg(percentile_approx(col(valueCol), pArr, lit(accuracy)).as("approx_p"))
  }

  /** HyperLogLog++ distinct count; rsd = target relative standard
    * deviation (0.05 default ≈ ±5%). Constant state per group
    * (2^p registers) however many distinct values stream through. */
  def approxDistinct(df: DataFrame, valueCol: String, groupCols: Seq[String],
      rsd: Double = 0.05): DataFrame =
    df.groupBy(groupCols.map(col): _*)
      .agg(approx_count_distinct(col(valueCol), rsd).as("approx_nd"))

  /** Build-side Bloom filter for probe-side pruning: returns a
    * predicate Column testing membership of `probeCol` in the set of
    * `buildCol` values (false positives at `fpp`, never false
    * negatives) — the classic pre-join/pre-dedup prefilter that drops
    * most non-matching rows before any shuffle. */
  def bloomPrefilter(build: DataFrame, buildCol: String, expectedItems: Long,
      fpp: Double)(probeCol: Column): Column = {
    val bf = build.stat.bloomFilter(buildCol, expectedItems, fpp)
    val bc = build.sparkSession.sparkContext.broadcast(bf)
    // broadcast-probe UDF: the explicit form for arbitrary pipelines.
    // For plain shuffle joins Catalyst's InjectRuntimeFilter plants
    // the codegen'd equivalent (bloom_filter_agg/might_contain)
    // automatically — this operator is for when the probe site isn't
    // a join Spark can see (multi-stage dedup, pre-scan pruning).
    val test = udf((v: Long) => bc.value.mightContainLong(v))
    test(probeCol)
  }

  /** Misra-Gries heavy hitters — approximate top-k frequency with a
    * FIXED k-counter state per partition, merged across the shuffle
    * (Agarwal et al., "Mergeable Summaries": union-sum then subtract
    * the (k+1)-th largest and drop non-positives preserves the bound
    * when the per-summary errors add). Guarantee after any merge
    * tree: `reported ≤ exact ≤ reported + N/(k+1)`, so every item
    * with true count > N/(k+1) SURVIVES — the vocabulary/heavy-user
    * sweep (q72's shape) without shuffling the full distinct-item
    * space: the exchange carries ≤ k counters per partition no matter
    * the cardinality. SketchesSpec asserts both bound sides and the
    * survival guarantee against exact counts.
    */
  case class MgBuf(counters: Map[String, Long])

  class HeavyHittersAgg(k: Int)
      extends org.apache.spark.sql.expressions.Aggregator[String, MgBuf, Map[String, Long]] {
    override def zero: MgBuf = MgBuf(Map.empty)
    override def reduce(b: MgBuf, x: String): MgBuf =
      if (b.counters.contains(x)) MgBuf(b.counters.updated(x, b.counters(x) + 1))
      else if (b.counters.size < k) MgBuf(b.counters.updated(x, 1L))
      // full and unseen: the classic decrement-all step (drop zeros)
      else MgBuf(b.counters.collect { case (t, c) if c > 1 => t -> (c - 1) })
    override def merge(a: MgBuf, b: MgBuf): MgBuf = {
      val sum = (a.counters.keySet ++ b.counters.keySet).iterator
        .map(t => t -> (a.counters.getOrElse(t, 0L) + b.counters.getOrElse(t, 0L))).toMap
      if (sum.size <= k) MgBuf(sum)
      else {
        val kth = sum.values.toIndexedSeq.sorted(Ordering[Long].reverse)(k)
        MgBuf(sum.collect { case (t, c) if c > kth => t -> (c - kth) })
      }
    }
    override def finish(b: MgBuf): Map[String, Long] = b.counters
    override def bufferEncoder: org.apache.spark.sql.Encoder[MgBuf] =
      org.apache.spark.sql.Encoders.product[MgBuf]
    override def outputEncoder: org.apache.spark.sql.Encoder[Map[String, Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[String, Long]]()
  }

  /** Heavy hitters of a string column as (item, est_count) rows,
    * est_count descending. */
  def heavyHitters(df: DataFrame, valueCol: String, k: Int): DataFrame = {
    import df.sparkSession.implicits._
    df.select(col(valueCol).cast("string")).as[String]
      .select(new HeavyHittersAgg(k).toColumn.name("hh"))
      .select(explode(col("hh")).as(Seq("item", "est_count")))
      .orderBy(desc("est_count"), col("item"))
  }

  /** Count-Min sketch (Cormode & Muthukrishnan) — point-frequency
    * estimates over unbounded key cardinality in d×w longs of state:
    * each of d hash rows increments one of w counters per item;
    * estimate = min over rows. One-sided error: `exact ≤ est`, and
    * `est ≤ exact + e·N/w` with probability `1 − e^−d` per query.
    * Merge is element-wise sum — fully associative/commutative, so
    * the sketch is IDENTICAL under any partitioning or merge tree
    * (SketchesSpec asserts table equality across repartitionings, the
    * property Misra-Gries above only has in bound form). Complements
    * [[HeavyHittersAgg]]: MG answers "which items are frequent",
    * CM answers "how often is THIS item" for arbitrary later probes.
    */
  case class CmBuf(t: Array[Long])

  /** The queryable sketch (driver-side model state, d·w longs). */
  case class CountMin(d: Int, w: Int, table: IndexedSeq[Long]) {
    def estimate(x: String): Long =
      (0 until d).map(i => table(CountMin.idx(d, w, i, x))).min
  }

  object CountMin {
    private[operators] def idx(d: Int, w: Int, i: Int, x: String): Int =
      i * w + math.floorMod(
        scala.util.hashing.MurmurHash3.stringHash(x, i * 0x9E3779B9 + 1), w)
  }

  class CountMinAgg(d: Int, w: Int)
      extends org.apache.spark.sql.expressions.Aggregator[String, CmBuf, Seq[Long]] {
    require(d > 0 && w > 0, s"d/w must be positive, got $d/$w")
    override def zero: CmBuf = CmBuf(new Array[Long](d * w))
    // the Aggregator contract allows mutating and returning the buffer
    // — reduce stays allocation-free on the per-row hot path
    override def reduce(b: CmBuf, x: String): CmBuf = {
      var i = 0
      while (i < d) { b.t(CountMin.idx(d, w, i, x)) += 1; i += 1 }
      b
    }
    override def merge(a: CmBuf, b: CmBuf): CmBuf = {
      var j = 0
      while (j < a.t.length) { a.t(j) += b.t(j); j += 1 }
      a
    }
    override def finish(b: CmBuf): Seq[Long] = b.t.toVector
    override def bufferEncoder: org.apache.spark.sql.Encoder[CmBuf] =
      org.apache.spark.sql.Encoders.product[CmBuf]
    override def outputEncoder: org.apache.spark.sql.Encoder[Seq[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
  }

  /** Build the sketch over a string column. Distributed partial
    * aggregation; only the d·w table crosses the final exchange.
    * NULLs carry no frequency and are skipped. */
  def countMin(df: DataFrame, valueCol: String, d: Int = 4, w: Int = 256): CountMin = {
    import df.sparkSession.implicits._
    val table = df.select(col(valueCol).cast("string").as("v"))
      .filter(col("v").isNotNull).as[String]
      .select(new CountMinAgg(d, w).toColumn.name("cm"))
      .head()
    CountMin(d, w, table.toIndexedSeq)
  }
}
