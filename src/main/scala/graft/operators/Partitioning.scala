package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Partitioning / physical-distribution surface (SURVEY.md §2.5 —
  * `/root/reference` flink-java DataSet.java:1292-1465:
  * partitionByHash, partitionByRange (sampled), partitionCustom,
  * rebalance, sortPartition).
  *
  * In Spark these are plan properties, not data transforms — they
  * exist to position data for a later stateful op or a partitioned
  * write. The library exposes them with the scale guidance inline;
  * PartitioningSpec asserts the resulting physical properties
  * (outputPartitioning, exchange count) rather than row content,
  * which they do not change.
  */
object Partitioning {

  /** partitionByHash (DataSet.java:1292): co-locate rows by key —
    * position a hot join/agg key once, reuse across stages. */
  def byHash(df: DataFrame, n: Int, keys: Column*): DataFrame =
    df.repartition(n, keys: _*)

  /** partitionByRange + sampling rewrite (DataSet.java:1332,
    * RangePartitionRewriter.java): Spark samples boundaries the same
    * way; combined with sortWithinPartitions this is the
    * write-sorted-buckets pattern for downstream merge scans. */
  def byRange(df: DataFrame, n: Int, keys: Column*): DataFrame =
    df.repartitionByRange(n, keys: _*)

  /** partitionCustom (DataSet.java:1375): custom routing = hash
    * partition on a computed routing expression. */
  def custom(df: DataFrame, n: Int, route: Column): DataFrame =
    df.repartition(n, route)

  /** rebalance (DataSet.java:1420): round-robin to break skew before
    * an expensive narrow stage. */
  def rebalance(df: DataFrame, n: Int): DataFrame =
    df.repartition(n)

  /** sortPartition (DataSet.java:1436) — partition-local sort, NOT a
    * global sort: no range exchange, each partition sorts
    * independently (Flink's DataSet API has no global sort at all;
    * Spark's orderBy is a superset). */
  def sortPartition(df: DataFrame, keys: Column*): DataFrame =
    df.sortWithinPartitions(keys: _*)

  /** The composed idiom: range-partition + local sort = globally
    * ordered bucket files (what the reference's
    * partitionByRange+sortPartition chains achieve), e.g. for a
    * sorted parquet layout consumed by merge joins. */
  def sortedBuckets(df: DataFrame, n: Int, key: Column): DataFrame =
    sortPartition(byRange(df, n, key), key)

  /** Salted equi-join for skewed keys: the big side gets a random-ish
    * but DETERMINISTIC salt (hash of the whole row modulo `salts`),
    * the small side is replicated once per salt value, and the join
    * key becomes (key, salt) — a hot key's rows now spread over
    * `salts` reducers instead of one. This is the manual fallback for
    * skew beyond what AQE's skew-join split handles (AQE only splits
    * sort-merge partitions; salting also fixes skewed shuffled-hash
    * and aggregate-feeding joins).
    */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
      salts: Int, joinType: String = "inner"): DataFrame = {
    // right/full outer are NOT expressible this way: an unmatched
    // small-side key exists once per salt replica and would emit
    // `salts` null-padded duplicates
    val normalized = joinType.toLowerCase.replace("_", "")
    require(Set("inner", "left", "leftouter", "leftsemi", "leftanti").contains(normalized),
      s"saltedJoin supports inner/left-flavored joins only, got $joinType")
    val saltedBig = big.withColumn("__salt",
      pmod(hash(big.columns.toIndexedSeq.map(col): _*), lit(salts)))
    val replicated = small
      .withColumn("__salt", explode(sequence(lit(0), lit(salts - 1))))
    saltedBig.join(replicated,
        saltedBig(key) === replicated(key) &&
          saltedBig("__salt") === replicated("__salt"), joinType)
      .drop(replicated(key)).drop("__salt")
  }

  /** zipWithIndex (reference `DataSetUtils.java:89`): contiguous
    * global row index WITHOUT a single-partition window. The
    * reference's algorithm — count per partition, broadcast prefix
    * offsets, label per partition — is exactly what Spark's
    * `RDD.zipWithIndex` runs (one count job + one labeling pass), so
    * this composes range-partition + in-partition sort for a total
    * order, then labels. The naive `row_number() OVER (ORDER BY ...)`
    * (the oracle's statement of the same result) collapses all rows
    * into ONE window partition at scale; this form keeps
    * parallelism — the only global coordination is the tiny per-
    * partition count array.
    */
  def zipWithIndexOrdered(df: DataFrame, order: Column, indexCol: String = "idx",
      numPartitions: Int = 0): DataFrame = {
    // numPartitions = 0 → let Spark/AQE size the range exchange (the
    // default for real corpora); a positive n pins it (specs, small data)
    val ranged = if (numPartitions > 0) df.repartitionByRange(numPartitions, order)
      else df.repartitionByRange(order)
    val sorted = ranged.sortWithinPartitions(order)
    val schema = org.apache.spark.sql.types.StructType(
      sorted.schema.fields :+
        org.apache.spark.sql.types.StructField(indexCol, org.apache.spark.sql.types.LongType, nullable = false))
    val labeled = sorted.rdd.zipWithIndex().map { case (row, i) =>
      org.apache.spark.sql.Row.fromSeq(row.toSeq :+ i)
    }
    sorted.sparkSession.createDataFrame(labeled, schema)
  }

  /** zipWithUniqueId (reference `DataSetUtils.java:149`): unique but
    * non-contiguous 64-bit labels with ZERO coordination — the
    * reference bit-packs (taskId, localCounter); Spark's
    * `monotonically_increasing_id()` packs (partitionId << 33) +
    * localCounter, the same construction as a codegen'd expression. */
  def zipWithUniqueId(df: DataFrame, indexCol: String = "uid"): DataFrame =
    df.withColumn(indexCol, monotonically_increasing_id())

  /** q98: graded zipWithIndex — label orders by o_orderkey; the
    * oracle states the result as row_number()-1, which is only
    * feasible FOR THE ORACLE because DuckDB runs single-node; the
    * graded plan is the distributed labeling above. */
  def q98ZipWithIndex(spark: org.apache.spark.sql.SparkSession, dir: String): DataFrame =
    zipWithIndexOrdered(
      graft.sources.Tables.orders(spark, dir).select(col("o_orderkey"), col("o_custkey")),
      col("o_orderkey"))

  val q98Sql: String =
    """SELECT o_orderkey, o_custkey,
      |  row_number() OVER (ORDER BY o_orderkey) - 1 AS idx
      |FROM orders""".stripMargin

  def queries: Map[String, (org.apache.spark.sql.SparkSession, String) => DataFrame] = Map(
    "q98_zip_with_index" -> (q98ZipWithIndex _))

  def oracles: Map[String, String] = Map(
    "q98_zip_with_index" -> q98Sql)
}
