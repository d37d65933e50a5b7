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
  def asOf(left: DataFrame, right: DataFrame, key: String, ts: String,
      rightVals: Seq[String], direction: String = "backward",
      toleranceUs: Option[Long] = None): DataFrame = {
    require(Set("backward", "forward", "nearest")(direction),
      s"direction must be backward|forward|nearest, got $direction")
    if (direction == "nearest")
      return asOfNearest(left, right, key, ts, rightVals, toleranceUs)
    val backward = direction == "backward"
    val (lSide, rSide) = if (backward) (1, 0) else (0, 1)
    val vals = rightVals :+ "__rts"
    val l = left.withColumn("__asof_side", lit(lSide))
    val r = right.select((key +: ts +: rightVals).map(col): _*)
      .withColumn("__rts", col(ts))
      .toDF(key +: ts +: vals.map("__asof_" + _): _*)
      .withColumn("__asof_side", lit(rSide))
    val u = l.unionByName(r, allowMissingColumns = true)
    val w0 = Window.partitionBy(col(key)).orderBy(col(ts), col("__asof_side"))
    val w =
      if (backward) w0.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      else w0.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    def pick(c: org.apache.spark.sql.Column) =
      if (backward) last(c, ignoreNulls = true).over(w)
      else first(c, ignoreNulls = true).over(w)
    val gap =
      if (backward) col(ts) - col("asof___rts") else col("asof___rts") - col(ts)
    vals.foldLeft(u) { (df, v) =>
        df.withColumn(s"asof_$v", pick(col(s"__asof_$v")))
      }
      .filter(col("__asof_side") === lSide)
      .transform { df =>
        toleranceUs.fold(df) { tol =>
          rightVals.foldLeft(df) { (d, v) =>
            d.withColumn(s"asof_$v",
              when(col("asof___rts").isNotNull && gap <= tol, col(s"asof_$v")))
          }
        }
      }
      .drop("__asof_side")
      .drop("asof___rts")
      .drop(vals.map("__asof_" + _): _*)
  }

  /** `direction = "nearest"` (pandas merge_asof parity): whichever of
    * the backward and forward candidates is closer in |gap| wins;
    * ties resolve BACKWARD (deterministic — and free: at equal ts the
    * right row sorts before the left, so the backward frame sees the
    * gap-0 match and wins the tie by rule). STILL one shuffle — both
    * frames read the same sorted partition. */
  private def asOfNearest(left: DataFrame, right: DataFrame, key: String,
      ts: String, rightVals: Seq[String], toleranceUs: Option[Long]): DataFrame = {
    val vals = rightVals :+ "__rts"
    val l = left.withColumn("__asof_side", lit(1))
    val r = right.select((key +: ts +: rightVals).map(col): _*)
      .withColumn("__rts", col(ts))
      .toDF(key +: ts +: vals.map("__asof_" + _): _*)
      .withColumn("__asof_side", lit(0))
    val u = l.unionByName(r, allowMissingColumns = true)
    val w0 = Window.partitionBy(col(key)).orderBy(col(ts), col("__asof_side"))
    val wb = w0.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wf = w0.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val withPicks = vals.foldLeft(u) { (df, v) =>
      df.withColumn(s"__b_$v", last(col(s"__asof_$v"), ignoreNulls = true).over(wb))
        .withColumn(s"__f_$v", first(col(s"__asof_$v"), ignoreNulls = true).over(wf))
    }
    val bGap = col(ts) - col("__b___rts")
    val fGap = col("__f___rts") - col(ts)
    val bOk = col("__b___rts").isNotNull &&
      toleranceUs.fold(lit(true))(t => bGap <= t)
    val fOk = col("__f___rts").isNotNull &&
      toleranceUs.fold(lit(true))(t => fGap <= t)
    val useB = bOk && (!fOk || bGap <= fGap)
    rightVals.foldLeft(withPicks) { (df, v) =>
        df.withColumn(s"asof_$v",
          when(useB, col(s"__b_$v")).when(fOk, col(s"__f_$v")))
      }
      .filter(col("__asof_side") === 1)
      .drop("__asof_side")
      .drop(vals.flatMap(v => Seq(s"__asof_$v", s"__b_$v", s"__f_$v")): _*)
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
