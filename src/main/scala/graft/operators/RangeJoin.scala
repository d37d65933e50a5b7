package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Range (band) join — each left row matches right rows of the same
  * key whose timestamp falls in the trailing window [t − width, t].
  * The streaming sibling is the interval join
  * ([[graft.streaming.Streams.intervalJoin]], reference
  * KeyedStream.java:425); this is its bounded/batch form, which Spark
  * would otherwise plan as a join with a non-equi condition — per
  * key, a rescan of the right side for every left row.
  *
  * The scalable shape is BINNING: bucket both sides by
  * `ts div width`; a right row inside a left row's trailing window
  * can only sit in the left row's bucket or the one before it, so the
  * left side probes exactly two buckets via an exploded equi-join on
  * (key, bucket), and the exact range predicate filters the slack
  * afterwards. One shuffle per side on (key, bucket), candidate
  * volume ≈ 2× the matching rows, never a per-row rescan — the same
  * trick Structured Streaming's watermarked interval join applies to
  * bound its state.
  */
object RangeJoin {

  /** Generic operator: rows of `left` paired with `right` rows where
    * `right.ts ∈ [left.ts − width, left.ts]` and keys match. Returns
    * the matched pairs (inner semantics); aggregate or left-join back
    * for windowed-count shapes. */
  def trailingRange(left: DataFrame, right: DataFrame, key: String,
      leftTs: String, rightTs: String, width: Long): DataFrame = {
    require(width > 0, s"width must be positive, got $width")
    require(leftTs != rightTs,
      s"leftTs and rightTs are both '$leftTs' — rename one side first, " +
        "or the join condition below becomes ambiguous")
    // integer FLOOR division (never FP "/", and never `div`, which
    // truncates toward zero): a negative timestamp must land in the
    // bucket BELOW, or matches straddling zero are silently dropped.
    // floor(a/w) for w>0 == (a - pmod(a, w)) div w, exact on longs.
    def bucket(c: String) = expr(s"(`$c` - pmod(`$c`, ${width}L)) div ${width}L")
    val probes = left
      .withColumn("__rj_probe", explode(array(bucket(leftTs), bucket(leftTs) - 1)))
    val binned = right.withColumn("__rj_bucket", bucket(rightTs))
    probes.join(binned,
        probes(key) === binned(key) && col("__rj_probe") === col("__rj_bucket"))
      .filter(col(rightTs) >= col(leftTs) - width && col(rightTs) <= col(leftTs))
      .drop("__rj_probe", "__rj_bucket")
      .drop(binned(key))
  }

  // ---------------------------------------------------------------- q67
  /** Per click: how many views (and their value sum) the same user
    * produced in the preceding 10 minutes — the trailing-window
    * activity feature every clickstream pipeline derives. Clicks with
    * a quiet window survive with zeros via the join-back.
    */
  val WindowUs: Long = 10L * 60 * 1000 * 1000

  def q67RangeJoin(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir).withColumn("ts", expr("ts div 1000"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id"), col("user_id"), col("ts"))
    val views = ev.filter(col("event_type") === "view")
      .select(col("user_id"), col("ts").as("tv"), col("value"))
    val matched = trailingRange(clicks, views, "user_id", "ts", "tv", WindowUs)
      .groupBy(col("event_id"))
      .agg(count(lit(1)).as("n_views"), round(sum(col("value")), 2).as("sum_views"))
    clicks.join(matched, Seq("event_id"), "left_outer")
      .select(col("event_id"), col("user_id"), col("ts").as("ts_us"),
        coalesce(col("n_views"), lit(0L)).as("n_views"),
        coalesce(col("sum_views"), lit(0.0)).as("sum_views"))
      .orderBy(col("event_id"))
  }

  val q67Sql: String =
    s"""WITH c AS (SELECT event_id, user_id, epoch_us(ts) AS t
       |           FROM events WHERE event_type = 'click'),
       |v AS (SELECT user_id, epoch_us(ts) AS tv, value
       |      FROM events WHERE event_type = 'view')
       |SELECT c.event_id, c.user_id, c.t AS ts_us,
       |  count(v.tv) AS n_views,
       |  round(coalesce(sum(v.value), 0.0), 2) AS sum_views
       |FROM c LEFT JOIN v
       |  ON c.user_id = v.user_id AND v.tv >= c.t - $WindowUs AND v.tv <= c.t
       |GROUP BY c.event_id, c.user_id, c.t
       |ORDER BY c.event_id""".stripMargin

  /** Interval-OVERLAP join: pairs where [ls, le] ∩ [rs, re] ≠ ∅
    * (inclusive bounds). Scalable shape, same binning family as
    * [[trailingRange]]: each side explodes over the buckets its
    * interval spans (cost ∝ interval length / width, pick `width` ≈
    * typical interval length), candidates equi-join on the bucket,
    * the exact overlap predicate filters slack, and each matching
    * pair is kept exactly ONCE — in the bucket containing the
    * overlap's start (`greatest(ls, rs)`), the standard dedup rule
    * that avoids a distinct over the pair output. No per-row rescans
    * at any size; either side may be fact-scale. */
  def intervalOverlap(left: DataFrame, right: DataFrame,
      ls: String, le: String, rs: String, re: String, width: Long): DataFrame = {
    require(width > 0, s"width must be positive, got $width")
    require(Set(ls, le, rs, re).size == 4,
      s"bound columns must be distinct names ($ls, $le, $rs, $re) — " +
        "rename a side first, or the post-join predicates are ambiguous")
    def bkt(c: String) = s"((`$c` - pmod(`$c`, ${width}L)) div ${width}L)"
    // inverted intervals (end < start) denote the empty set — drop
    // them BEFORE the explode: sequence() would happily descend and
    // the overlap predicate could still pass on garbage input
    val probes = left.filter(col(ls) <= col(le))
      .withColumn("__io_b", explode(expr(s"sequence(${bkt(ls)}, ${bkt(le)})")))
    val binned = right.filter(col(rs) <= col(re))
      .withColumn("__io_b2", explode(expr(s"sequence(${bkt(rs)}, ${bkt(re)})")))
    probes.join(binned, col("__io_b") === col("__io_b2"))
      .filter(col(ls) <= col(re) && col(rs) <= col(le))
      .filter(col("__io_b") ===
        expr(s"((greatest(`$ls`, `$rs`) - pmod(greatest(`$ls`, `$rs`), ${width}L)) div ${width}L)"))
      .drop("__io_b", "__io_b2")
  }

  // --------------------------------------------------------------- q157
  /** Shipments overlapping promo windows: each lineitem's transit
    * interval — [shipdate, shipdate + 1 + qty % 14] epoch days, the
    * derived deterministic receipt lag (the fixture omits
    * l_receiptdate) — overlap-joined against a generated 24-window
    * promo calendar (30-day windows every 90 days from 1993-01-01 =
    * day 8401), then count + exact integer quantity per window — the
    * campaign-attribution shape. Bucket width 32 days ≈ both sides'
    * interval lengths, so each side explodes over ≤ 2-3 buckets. */
  val PromoStart = 8401L // DATE '1993-01-01' in epoch days
  val PromoLen = 29L
  val PromoEvery = 90L
  val PromoN = 24L
  val IoWidth = 32L

  def q157IntervalOverlap(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
      .select(col("l_quantity").cast("long").as("qty"),
        datediff(col("l_shipdate").cast("date"), lit("1970-01-01").cast("date"))
          .cast("long").as("s1"))
      .withColumn("e1", col("s1") + 1L + col("qty") % 14L)
    val promo = spark.range(PromoN).select(col("id").as("p"),
      (lit(PromoStart) + col("id") * PromoEvery).as("s2"),
      (lit(PromoStart) + col("id") * PromoEvery + PromoLen).as("e2"))
    intervalOverlap(li, promo, "s1", "e1", "s2", "e2", IoWidth)
      .groupBy(col("p"))
      .agg(count(lit(1)).as("n_lines"), sum(col("qty")).as("sum_qty"))
      .orderBy(col("p"))
  }

  val q157Sql: String =
    s"""WITH li AS (
       |  SELECT CAST(l_quantity AS BIGINT) AS qty,
       |    CAST(l_shipdate AS DATE) - DATE '1970-01-01' AS s1,
       |    CAST(l_shipdate AS DATE) - DATE '1970-01-01'
       |      + 1 + CAST(l_quantity AS BIGINT) % 14 AS e1
       |  FROM lineitem),
       |promo AS (
       |  SELECT p, $PromoStart + p * $PromoEvery AS s2,
       |         $PromoStart + p * $PromoEvery + $PromoLen AS e2
       |  FROM range($PromoN) t(p))
       |SELECT CAST(p AS BIGINT) AS p, CAST(count(*) AS BIGINT) AS n_lines,
       |  CAST(sum(qty) AS BIGINT) AS sum_qty
       |FROM li JOIN promo ON s1 <= e2 AND s2 <= e1
       |GROUP BY p ORDER BY p""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q67_range_join" -> (q67RangeJoin _),
    "q157_interval_overlap" -> (q157IntervalOverlap _))

  def oracles: Map[String, String] = Map(
    "q67_range_join" -> q67Sql,
    "q157_interval_overlap" -> q157Sql)
}
