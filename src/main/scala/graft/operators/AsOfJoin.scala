package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** As-of join — for every left row, the single right row with the
  * greatest timestamp at-or-before the left row's, per key. The
  * reference's closest surface is the streaming interval join
  * (KeyedStream.java:425), whose batch "latest state as of t" variant
  * Spark lacks as a built-in.
  *
  * The implementation is the UNION-SORT form, not a range join: tag
  * both sides, union by name, and run one `last(_, ignoreNulls)` over
  * a (key, ts, side) window frame — right rows sort before left rows
  * at equal ts, so "at-or-before" ties resolve to matched. Cost is a
  * single shuffle on the key (the window's partition), linear in
  * rows; a range-condition join would rescan the right side per left
  * row (O(n·m) per key at worst) and a broadcast range join caps the
  * right side's size — this form does neither. Skewed keys spread via
  * the same AQE/salting paths as any window query.
  */
object AsOfJoin {

  /** Generic operator: left keeps all columns; each `rightVals`
    * column v arrives as `asof_v` (null when no right row matches).
    * `right` must be unique per (key, ts) — pre-aggregate if not, or
    * the nearest of the duplicates wins nondeterministically.
    *
    * `direction` — "backward" (default: greatest right ts at-or-
    * before, pandas merge_asof's default) or "forward" (smallest
    * right ts at-or-after). `toleranceUs` — maximum |gap|; a match
    * farther away nulls out (merge_asof `tolerance`). Both variants
    * stay the one-shuffle union-sort form: only the window frame
    * direction and the equal-ts tie rule flip (backward: right rows
    * sort BEFORE left at equal ts; forward: after), so "at-or-X"
    * ties resolve to matched either way.
    */
  /** Shared preamble: tag the sides and union with ONE record struct
    * per right row — `(matched ts, value columns...)` picked
    * ATOMICALLY, so a null right value column can never desync from
    * its own row's timestamp in the tolerance/nearest decisions
    * (review finding: per-column ignoreNulls picks could pair an
    * older value with a newer row's gap). Matched-row semantics,
    * pandas merge_asof's: you get the matched row's value, null
    * included. */
  private def taggedUnion(left: DataFrame, right: DataFrame, key: String,
      ts: String, rightVals: Seq[String], lSide: Int): DataFrame = {
    val l = left.withColumn("__asof_side", lit(lSide))
    val r = right.select((key +: ts +: rightVals).map(col): _*)
      .withColumn("__asof_rec",
        struct(col(ts).as("__rts") +: rightVals.map(col): _*))
      .select(col(key), col(ts), col("__asof_rec"))
      .withColumn("__asof_side", lit(1 - lSide))
    l.unionByName(r, allowMissingColumns = true)
  }

  def asOf(left: DataFrame, right: DataFrame, key: String, ts: String,
      rightVals: Seq[String], direction: String = "backward",
      toleranceUs: Option[Long] = None): DataFrame = {
    require(Set("backward", "forward", "nearest")(direction),
      s"direction must be backward|forward|nearest, got $direction")
    if (direction == "nearest")
      return asOfNearest(left, right, key, ts, rightVals, toleranceUs)
    val backward = direction == "backward"
    val lSide = if (backward) 1 else 0
    val u = taggedUnion(left, right, key, ts, rightVals, lSide)
    val w0 = Window.partitionBy(col(key)).orderBy(col(ts), col("__asof_side"))
    val w =
      if (backward) w0.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      else w0.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val rec =
      if (backward) last(col("__asof_rec"), ignoreNulls = true).over(w)
      else first(col("__asof_rec"), ignoreNulls = true).over(w)
    val rts = col("__m").getField("__rts")
    val gap = if (backward) col(ts) - rts else rts - col(ts)
    u.withColumn("__m", rec)
      .filter(col("__asof_side") === lSide)
      .transform { df =>
        toleranceUs.fold(df)(tol =>
          df.withColumn("__m", when(rts.isNotNull && gap <= tol, col("__m"))))
      }
      .select(col("*") +:
        rightVals.map(v => col("__m").getField(v).as(s"asof_$v")): _*)
      .drop("__asof_side", "__asof_rec", "__m")
  }

  /** `direction = "nearest"` (pandas merge_asof parity): whichever of
    * the backward and forward candidate ROWS is closer in |gap| wins;
    * ties resolve BACKWARD (deterministic — and free: at equal ts the
    * right row sorts before the left, so the backward frame sees the
    * gap-0 match and wins the tie by rule). STILL one shuffle — both
    * frames read the same sorted partition. */
  private def asOfNearest(left: DataFrame, right: DataFrame, key: String,
      ts: String, rightVals: Seq[String], toleranceUs: Option[Long]): DataFrame = {
    val u = taggedUnion(left, right, key, ts, rightVals, lSide = 1)
    val w0 = Window.partitionBy(col(key)).orderBy(col(ts), col("__asof_side"))
    val wb = w0.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wf = w0.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val bRts = col("__b").getField("__rts")
    val fRts = col("__f").getField("__rts")
    val bGap = col(ts) - bRts
    val fGap = fRts - col(ts)
    val bOk = bRts.isNotNull && toleranceUs.fold(lit(true))(t => bGap <= t)
    val fOk = fRts.isNotNull && toleranceUs.fold(lit(true))(t => fGap <= t)
    val useB = bOk && (!fOk || bGap <= fGap)
    u.withColumn("__b", last(col("__asof_rec"), ignoreNulls = true).over(wb))
      .withColumn("__f", first(col("__asof_rec"), ignoreNulls = true).over(wf))
      .filter(col("__asof_side") === 1)
      .withColumn("__m", when(useB, col("__b")).when(fOk, col("__f")))
      .select(col("*") +:
        rightVals.map(v => col("__m").getField(v).as(s"asof_$v")): _*)
      .drop("__asof_side", "__asof_rec", "__b", "__f", "__m")
  }

  // ---------------------------------------------------------------- q66
  /** Each click event joined as-of to the same user's most recent
    * purchase: the canonical "attach latest state to every fact"
    * query (attribution, price-as-of-trade, feature lookback).
    * Purchases are pre-aggregated per (user, ts) so both engines
    * resolve duplicate-timestamp ties identically; the matched
    * purchase's timestamp rides along as a second value column.
    * Timestamps are truncated to epoch-MICROS before the join on the
    * Spark side (`ts div 1000`): DuckDB timestamps carry microsecond
    * precision, so nanosecond keys would group/compare differently
    * across engines. Integer ordering, no FP or timezone hazards.
    */
  def q66AsOfJoin(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      // integer div, NOT "/": e18-scale nanos exceed double's 53-bit
      // mantissa, so FP division would corrupt low digits
      .withColumn("ts", expr("ts div 1000"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id"), col("user_id"), col("ts"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .groupBy(col("user_id"), col("ts")).agg(max(col("value")).as("pval"))
      .withColumn("pts", col("ts"))
    asOf(clicks, purchases, "user_id", "ts", Seq("pval", "pts"))
      .select(col("event_id"), col("user_id"), col("ts").as("ts_us"),
        coalesce(col("asof_pval"), lit(0.0)).as("last_purchase"),
        coalesce(col("asof_pts"), lit(-1L)).as("purchase_ts_us"))
      .orderBy(col("event_id"))
  }

  val q66Sql: String =
    """WITH r AS (SELECT user_id, ts, max(value) AS pval
      |           FROM events WHERE event_type = 'purchase'
      |           GROUP BY user_id, ts),
      |l AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'click')
      |SELECT l.event_id, l.user_id, epoch_us(l.ts) AS ts_us,
      |  coalesce(r.pval, 0.0) AS last_purchase,
      |  coalesce(epoch_us(r.ts), -1) AS purchase_ts_us
      |FROM l ASOF LEFT JOIN r
      |  ON l.user_id = r.user_id AND l.ts >= r.ts
      |ORDER BY event_id""".stripMargin

  // --------------------------------------------------------------- q156
  /** FORWARD as-of with a tolerance window: each click joined to the
    * same user's NEXT signup, nulled out when it is more than
    * [[FwdTolUs]] away — pandas `merge_asof(direction='forward',
    * tolerance=...)`, the "time-to-conversion within the attribution
    * window" query. Same one-shuffle union-sort plan as q66, frame
    * direction flipped. */
  val FwdTolUs: Long = 48L * 3600L * 1000000L

  def q156AsOfForward(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir).withColumn("ts", expr("ts div 1000"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id"), col("user_id"), col("ts"))
    val signups = ev.filter(col("event_type") === "signup")
      .groupBy(col("user_id"), col("ts")).agg(max(col("value")).as("sval"))
      .withColumn("sts", col("ts"))
    asOf(clicks, signups, "user_id", "ts", Seq("sval", "sts"),
        direction = "forward", toleranceUs = Some(FwdTolUs))
      .select(col("event_id"), col("user_id"), col("ts").as("ts_us"),
        coalesce(col("asof_sval"), lit(-1.0)).as("next_signup_val"),
        coalesce(col("asof_sts"), lit(-1L)).as("signup_ts_us"))
      .orderBy(col("event_id"))
  }

  val q156Sql: String =
    s"""WITH r AS (SELECT user_id, ts, max(value) AS sval
       |           FROM events WHERE event_type = 'signup'
       |           GROUP BY user_id, ts),
       |l AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'click')
       |SELECT l.event_id, l.user_id, epoch_us(l.ts) AS ts_us,
       |  CASE WHEN r.ts IS NOT NULL
       |         AND epoch_us(r.ts) - epoch_us(l.ts) <= $FwdTolUs
       |       THEN r.sval ELSE -1.0 END AS next_signup_val,
       |  CASE WHEN r.ts IS NOT NULL
       |         AND epoch_us(r.ts) - epoch_us(l.ts) <= $FwdTolUs
       |       THEN epoch_us(r.ts) ELSE -1 END AS signup_ts_us
       |FROM l ASOF LEFT JOIN r
       |  ON l.user_id = r.user_id AND l.ts <= r.ts
       |ORDER BY event_id""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q66_asof_join" -> (q66AsOfJoin _),
    "q156_asof_forward" -> (q156AsOfForward _))

  def oracles: Map[String, String] = Map(
    "q66_asof_join" -> q66Sql,
    "q156_asof_forward" -> q156Sql)
}
