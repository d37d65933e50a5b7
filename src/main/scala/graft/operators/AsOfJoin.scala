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
    * column v arrives as `asof_v` (null when no right row precedes).
    * `right` must be unique per (key, ts) — pre-aggregate if not, or
    * the latest of the duplicates wins nondeterministically.
    */
  def asOf(left: DataFrame, right: DataFrame, key: String, ts: String,
      rightVals: Seq[String]): DataFrame = {
    val l = left.withColumn("__asof_side", lit(1))
    val r = right.select((key +: ts +: rightVals).map(col): _*)
      .toDF(key +: ts +: rightVals.map("__asof_" + _): _*)
      .withColumn("__asof_side", lit(0))
    val u = l.unionByName(r, allowMissingColumns = true)
    val w = Window.partitionBy(col(key)).orderBy(col(ts), col("__asof_side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    rightVals.foldLeft(u) { (df, v) =>
        df.withColumn(s"asof_$v", last(col(s"__asof_$v"), ignoreNulls = true).over(w))
      }
      .filter(col("__asof_side") === 1)
      .drop("__asof_side")
      .drop(rightVals.map("__asof_" + _): _*)
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

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q66_asof_join" -> (q66AsOfJoin _))

  def oracles: Map[String, String] = Map(
    "q66_asof_join" -> q66Sql)
}
