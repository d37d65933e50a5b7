package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset, SaveMode, SparkSession}
import org.apache.spark.sql.types.StructType

/** Bounded source/sink format surface (SURVEY.md §2.1 —
  * `/root/reference` flink-java ExecutionEnvironment.java:449-628 and
  * DataSet.java:1527-1815): text, CSV (delimiter/header/schema
  * options, the reference's CsvReader builder), JSON, parquet (its
  * TypeSerializer binary stage format), plus collection sources and
  * the collect/count sinks.
  *
  * Thin, explicit wrappers over DataSource V2 — every reader takes an
  * explicit schema (never inferSchema: at 100 TB schema inference is
  * a full extra pass) and every writer goes through the same
  * `SaveMode` surface as the reference's `WriteMode`.
  */
object Formats {

  // ------------------------------------------------------------ sources
  /** readTextFile (ExecutionEnvironment.java:449): one string row per
    * line. */
  def readText(spark: SparkSession, path: String): Dataset[String] =
    spark.read.textFile(path)

  /** readCsvFile + CsvReader options (ExecutionEnvironment.java:556,
    * CsvReader.java: fieldDelimiter / ignoreFirstLine / types). */
  def readCsv(spark: SparkSession, path: String, schema: StructType,
      delimiter: String = ",", header: Boolean = false): DataFrame =
    spark.read
      .option("delimiter", delimiter)
      .option("header", header.toString)
      .schema(schema)
      .csv(path)

  def readJson(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).json(path)

  /** The reference's TypeSerializerInputFormat binary stage
    * (LogisticRegression.java:44-59) — parquet is the idiomatic
    * schema-defined binary stage format. */
  def readParquet(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** fromCollection / fromElements (ExecutionEnvironment.java:658-748). */
  def fromElements[T <: Product : org.apache.spark.sql.Encoder](
      spark: SparkSession, elems: Seq[T]): Dataset[T] =
    spark.createDataset(elems)

  /** generateSequence(from, to) (ExecutionEnvironment.java:816). */
  def sequence(spark: SparkSession, from: Long, to: Long): Dataset[java.lang.Long] =
    spark.range(from, to + 1).as(org.apache.spark.sql.Encoders.LONG)

  // -------------------------------------------------------------- sinks
  /** writeAsText (DataSet.java:1527). */
  def writeText(ds: Dataset[String], path: String,
      mode: SaveMode = SaveMode.Overwrite): Unit =
    ds.write.mode(mode).text(path)

  /** writeAsCsv (DataSet.java:1599, CsvOutputFormat). */
  def writeCsv(df: DataFrame, path: String, delimiter: String = ",",
      header: Boolean = false, mode: SaveMode = SaveMode.Overwrite): Unit =
    df.write.mode(mode)
      .option("delimiter", delimiter)
      .option("header", header.toString)
      .csv(path)

  def writeParquet(df: DataFrame, path: String,
      mode: SaveMode = SaveMode.Overwrite): Unit =
    df.write.mode(mode).parquet(path)

  /** Hive-style partitioned layout (`path/col=value/...`): the data-
    * lake form of the reference's partitioned sinks — downstream
    * scans with a predicate on the partition column prune whole
    * directories before reading a byte. Keep partition columns
    * low-cardinality (date, source); high-cardinality keys belong in
    * bucketing instead. */
  def writePartitioned(df: DataFrame, path: String, partitionCols: Seq[String],
      mode: SaveMode = SaveMode.Overwrite): Unit =
    df.write.mode(mode).partitionBy(partitionCols: _*).parquet(path)

  /** Bucketed catalog table: rows pre-hashed into `buckets` files by
    * key, so equi-joins and aggregations between tables bucketed the
    * same way run WITHOUT any shuffle — the 100 TB answer for a join
    * key used by every pipeline run (amortize one layout write across
    * all downstream joins). */
  def writeBucketed(df: DataFrame, table: String, buckets: Int, key: String,
      mode: SaveMode = SaveMode.Overwrite): Unit =
    df.write.mode(mode).bucketBy(buckets, key).sortBy(key).saveAsTable(table)
}
