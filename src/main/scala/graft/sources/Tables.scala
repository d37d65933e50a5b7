package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, unix_micros}
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Table catalog over the driver testdata layout (`TESTDATA.md`): one
  * parquet file per table under a scale-factor directory.
  *
  * Mirrors the source surface of the reference
  * (`/root/reference` flink-java ExecutionEnvironment.java:449-628 —
  * text/CSV/primitives/custom input formats): here every bounded scan
  * is a Spark DataSource-V2 read, so column pruning and predicate
  * pushdown reach the file format for free.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Per-(session, path) schema memo (r17 optimization, guide §6):
    * every un-schema'd `spark.read.parquet` pays a fresh footer
    * inference on the driver, and a full bench walk issues ~600 table
    * loads over the same ten immutable files. The memo caches only
    * METADATA (a StructType, bytes), never data or results; the first
    * load per session still infers, so a re-shipped fixture with a
    * different physical schema (the events.ts nanos/NTZ flip) is
    * picked up by every fresh session exactly as before. Keyed by
    * session identity so a long-lived JVM cycling sessions cannot
    * serve a stale session's inference to a new one with different
    * reader conf (nanosAsLong). */
  private val schemaCache = scala.collection.concurrent.TrieMap
    .empty[(Int, String), (SparkSession, org.apache.spark.sql.types.StructType)]

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    val path = s"$sfDir/$name.parquet"
    // identity-hash key + eq check, the SessionCache posture: a hash
    // collision with a dead session must never serve its schema
    val key = (System.identityHashCode(spark), path)
    schemaCache.get(key) match {
      case Some((s, sch)) if s eq spark => spark.read.schema(sch).parquet(path)
      case _ =>
        schemaCache.filterInPlace { case (_, (s, _)) => !s.sparkContext.isStopped }
        val df = spark.read.parquet(path)
        schemaCache.put(key, (spark, df.schema))
        df
    }
  }

  def region(s: SparkSession, d: String): DataFrame     = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame     = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame   = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame     = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame   = load(s, d, "lineitem")
  /** events with `ts` normalized to the engine-wide contract:
    * **epoch-nanoseconds LongType**. The driver fixture has shipped
    * `ts` as parquet TIMESTAMP(NANOS) (Spark surfaces LongType via
    * `nanosAsLong`) and as timestamp[us] TIMESTAMP_NTZ; every window /
    * as-of / range / sessionize consumer does exact integer bucket
    * math on nanos, so both physical forms converge here. NTZ wall
    * clock is interpreted in the session time zone — GraftSession pins
    * it to UTC, matching DuckDB's `epoch_us`/`epoch_ns` on the naive
    * timestamp, so Spark and the oracle see identical instants. */
  def events(s: SparkSession, d: String): DataFrame = {
    val raw = load(s, d, "events")
    raw.schema("ts").dataType match {
      case LongType => raw
      case TimestampNTZType | TimestampType =>
        raw.withColumn("ts", unix_micros(col("ts").cast(TimestampType)) * 1000L)
      case other =>
        throw new IllegalStateException(
          s"events.ts: expected epoch-nanos LONG or TIMESTAMP[_NTZ], got $other")
    }
  }
  def documents(s: SparkSession, d: String): DataFrame  = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")

  /** Register all tables as temp views so queries can be written in SQL.
    * `events` registers the ts-normalized form (see [[events]]). */
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    names.foreach { n =>
      val df = if (n == "events") events(spark, sfDir) else load(spark, sfDir, n)
      df.createOrReplaceTempView(n)
    }
}
