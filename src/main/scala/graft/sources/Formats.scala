package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset, SaveMode, SparkSession}
import org.apache.spark.sql.types.StructType

/** Bounded source/sink format surface (SURVEY.md §2.1 —
  * `/root/reference` flink-java ExecutionEnvironment.java:449-628 and
  * DataSet.java:1527-1815): text, CSV (delimiter/header/schema
  * options, the reference's CsvReader builder), JSON, parquet (its
  * TypeSerializer binary stage format), ORC, an embedded-tested JDBC
  * source/sink (flink-connector-jdbc), plus collection sources and
  * the collect/count sinks. Avro (flink-formats/flink-avro) is the
  * remaining format gap: Spark's avro support lives in the external
  * `spark-avro` module, which this distribution doesn't ship.
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

  /** ORC (the reference `flink-formats/flink-orc` input format) —
    * built into Spark; columnar + predicate pushdown like parquet. */
  def readOrc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)

  /** Avro (the reference `flink-formats/flink-avro` AvroInputFormat).
    * Spark 4's spark-sql jar ships the implementation classes
    * (AvroFileFormat/AvroDeserializer) but NOT the service-loader
    * registration for the short name "avro" — that lives in the
    * external spark-avro package. Loading by fully-qualified class
    * name bypasses the registry, so the row-oriented container format
    * works with no extra dependency. */
  val AvroFormat = "org.apache.spark.sql.avro.AvroFileFormat"

  def readAvro(spark: SparkSession, path: String): DataFrame =
    spark.read.format(AvroFormat).load(path)

  /** XML (the reference ecosystem reads feed/config XML through
    * custom input formats; Spark ≥4.0 ships the XML data source in
    * spark-sql). `rowTag` names the repeated record element; schema
    * passed explicitly like every other format here — inference is a
    * full extra pass at 100 TB. */
  def readXml(spark: SparkSession, path: String, schema: StructType,
      rowTag: String = "row"): DataFrame =
    spark.read.option("rowTag", rowTag).schema(schema).format("xml").load(path)

  def writeXml(df: DataFrame, path: String, rowTag: String = "row"): Unit =
    df.write.mode("overwrite").option("rowTag", rowTag).format("xml").save(path)

  /** JDBC source (the reference `flink-connectors/flink-connector-jdbc`
    * JdbcInputFormat). `partitionOn` splits the read into
    * `numPartitions` range-parallel queries — without it a JDBC scan
    * is one executor-side connection, which at scale is a straggler
    * by construction. Filters and projections push into the remote
    * query (asserted in FormatsSpec). */
  def readJdbc(spark: SparkSession, url: String, table: String,
      driver: String,
      partitionOn: Option[(String, Long, Long, Int)] = None): DataFrame = {
    DuckDbDialect.ensureRegistered()
    val r = spark.read.format("jdbc")
      .option("url", url)
      .option("dbtable", table)
      .option("driver", driver)
    partitionOn.fold(r) { case (column, lo, hi, n) =>
      r.option("partitionColumn", column)
        .option("lowerBound", lo).option("upperBound", hi)
        .option("numPartitions", n)
    }.load()
  }

  /** Custom input format (InputFormat SPI / ExecutionEnvironment
    * .java:599 createInput) — the in-house [[GraftLogSource]]
    * DataSource V2: byte-range splits with the partial-line protocol,
    * column pruning, level/ts filter pushdown. `splitSize` bounds a
    * single reader's work (Flink's createInputSplits(minNumSplits)). */
  def readGraftLog(spark: SparkSession, path: String,
      splitSize: Long = 4L << 20): DataFrame =
    spark.read.format("graft-log")
      .option("splitSize", splitSize.toString)
      .load(path)

  /** Sink half of the graft-log format: `ts|LEVEL|message` lines.
    * The format has no escaping by design — that is what makes it
    * splittable by newline scan alone — so rows that cannot be
    * represented losslessly FAIL the write rather than being silently
    * rewritten: a write-then-read roundtrip is byte-identical or it
    * doesn't happen. Rejected: null fields (concat_ws would silently
    * skip them, shifting fields), newlines anywhere (would split the
    * record), and a level containing '|' or lowercase (would shift
    * the message on read). */
  def writeGraftLog(df: DataFrame, path: String,
      saveMode: SaveMode = SaveMode.Overwrite): Unit = {
    import org.apache.spark.sql.functions.{col, concat_ws, lit, raise_error, when}
    val line = concat_ws("|", col("ts").cast("string"), col("level"), col("message"))
    val checked = when(
      col("ts").isNull || col("level").isNull || col("message").isNull,
      raise_error(lit("graft-log: null ts/level/message")).cast("string"))
      .when(col("message").rlike("[\\r\\n]") || !col("level").rlike("^[A-Z]+$"),
        raise_error(concat_ws(" ", lit("graft-log: unrepresentable row at ts"),
          col("ts").cast("string"))).cast("string"))
      .otherwise(line)
    df.select(checked.as("value")).write.mode(saveMode).text(path)
  }

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

  def writeOrc(df: DataFrame, path: String,
      mode: SaveMode = SaveMode.Overwrite): Unit =
    df.write.mode(mode).orc(path)

  /** Avro sink (flink-avro AvroOutputFormat). */
  def writeAvro(df: DataFrame, path: String,
      mode: SaveMode = SaveMode.Overwrite): Unit =
    df.write.mode(mode).format(AvroFormat).save(path)

  /** JDBC sink (flink-connector-jdbc JdbcOutputFormat): each input
    * partition writes over its own connection in batched inserts.
    * Repartition to the DB's comfortable writer count first — at
    * 1000 executors an unthrottled write is a connection storm. */
  def writeJdbc(df: DataFrame, url: String, table: String, driver: String,
      mode: SaveMode = SaveMode.Overwrite, writers: Int = 0): Unit = {
    DuckDbDialect.ensureRegistered()
    val out = if (writers > 0) df.repartition(writers) else df
    out.write.format("jdbc")
      .option("url", url)
      .option("dbtable", table)
      .option("driver", driver)
      .mode(mode)
      .save()
  }

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
