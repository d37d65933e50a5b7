package graft.sources

import java.util

import scala.collection.mutable.ArrayBuffer

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.{DataSourceRegister, EqualTo, Filter, GreaterThan, GreaterThanOrEqual, IsNotNull, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** Custom input format (the reference's `InputFormat` SPI —
  * flink-core .../api/common/io/InputFormat.java: createInputSplits /
  * open / nextRecord, consumed via ExecutionEnvironment.java:562
  * `readFile` / :599 `createInput`), re-expressed as a Spark
  * DataSource V2 `TableProvider`.
  *
  * The format itself is a line-oriented log record,
  * `epochMillis|LEVEL|message`, deliberately NOT splittable at
  * arbitrary offsets — which is exactly the interesting case at
  * 100 TB. Splits are planned as byte ranges of `splitSize` (like
  * FileInputFormat.createInputSplits), and each reader applies the
  * standard partial-line protocol: a split that does not start at
  * byte 0 discards everything up to the first newline, and a line
  * belongs to the split containing its FIRST byte (readers run past
  * their range end to finish the last line). Every byte is consumed
  * exactly once, any splitSize, any file layout.
  *
  * The scan also implements the two pushdowns that matter for a
  * columnar-era source: required-column pruning (a `select(level)`
  * never materializes message strings) and filter pushdown for
  * level-equality and ts-range predicates (applied inside the reader;
  * Spark drops its own Filter node for fully-handled predicates —
  * asserted in FormatsSpec).
  */
class GraftLogSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-log"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    GraftLogSource.schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new GraftLogTable

  override def supportsExternalMetadata(): Boolean = false
}

object GraftLogSource {
  val schema: StructType = StructType(Seq(
    StructField("ts", LongType, nullable = false),
    StructField("level", StringType, nullable = false),
    StructField("message", StringType, nullable = false)))
}

private[sources] class GraftLogTable extends Table with SupportsRead {
  override def name(): String = "graft-log"
  override def schema(): StructType = GraftLogSource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new GraftLogScanBuilder(options)
}

private[sources] class GraftLogScanBuilder(options: CaseInsensitiveStringMap)
    extends ScanBuilder with SupportsPushDownRequiredColumns with SupportsPushDownFilters {

  private var required: StructType = GraftLogSource.schema
  private var pushed: Array[Filter] = Array.empty

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  /** Accept level-equality and ts-range filters; everything else is
    * returned for Spark to evaluate post-scan. */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (ours, rest) = filters.partition {
      case EqualTo("level", _: String) => true
      case GreaterThan("ts", _: Long) | GreaterThanOrEqual("ts", _: Long) |
           LessThan("ts", _: Long) | LessThanOrEqual("ts", _: Long) => true
      // All three fields are parsed non-null; IsNotNull is vacuously
      // true, and accepting it lets Spark drop its post-scan Filter.
      case IsNotNull("ts") | IsNotNull("level") | IsNotNull("message") => true
      case _ => false
    }
    pushed = ours
    rest
  }

  override def pushedFilters(): Array[Filter] = pushed

  override def build(): Scan =
    new GraftLogScan(options.get("path"),
      Option(options.get("splitSize")).map(_.toLong).getOrElse(4L << 20),
      required, pushed)
}

/** The session's Hadoop configuration, flattened to a serializable
  * map so executors rebuild an equivalent Configuration — scheme-
  * specific settings (s3a credentials, kerberos, fs.defaultFS) must
  * reach both the driver's file listing and the executors' opens. */
private[sources] object HadoopConfSnapshot {
  import scala.jdk.CollectionConverters._

  def capture(): Map[String, String] = {
    val conf = org.apache.spark.sql.SparkSession.active.sessionState.newHadoopConf()
    conf.iterator().asScala.map(e => e.getKey -> e.getValue).toMap
  }

  def restore(entries: Map[String, String]): Configuration = {
    val conf = new Configuration(false)
    entries.foreach { case (k, v) => conf.set(k, v) }
    conf
  }
}

private[sources] class GraftLogScan(path: String, splitSize: Long,
    required: StructType, pushed: Array[Filter]) extends Scan with Batch {

  require(path != null, "graft-log requires a path (e.g. .load(dir))")
  require(splitSize > 0, s"splitSize must be positive, got $splitSize")

  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"graft-log path=$path splitSize=$splitSize pushed=${pushed.mkString(",")}"

  /** Driver-side split planning (FileInputFormat.createInputSplits):
    * every file is carved into [start, start+splitSize) byte ranges.
    * File listing happens once, here; executors receive only
    * (path, start, end) triples. */
  private val hadoopConf: Map[String, String] = HadoopConfSnapshot.capture()

  override def planInputPartitions(): Array[InputPartition] = {
    val fs = FileSystem.get(new Path(path).toUri, HadoopConfSnapshot.restore(hadoopConf))
    // the standard Hadoop hidden-file convention excludes BOTH
    // '_' (markers like _SUCCESS) and '.' (in-progress/.crc/metadata)
    // prefixes; scanning a .crc would silently yield zero rows of
    // binary noise
    val statuses = fs.listStatus(new Path(path))
      .filter { s =>
        val n = s.getPath.getName
        s.isFile && !n.startsWith("_") && !n.startsWith(".")
      }
    statuses.flatMap { s =>
      val len = s.getLen
      (0L until math.max(len, 1L) by splitSize).map { start =>
        GraftLogPartition(s.getPath.toString, start, math.min(start + splitSize, len))
      }
    }.toArray[InputPartition]
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new GraftLogReaderFactory(required.fieldNames, pushed, hadoopConf)

  /** Malformed lines are skipped, not crashed on — but silence would
    * make real corruption invisible, so the skip count surfaces as a
    * first-class SQL metric (Spark UI: "malformed lines skipped"). */
  override def supportedCustomMetrics(): Array[org.apache.spark.sql.connector.metric.CustomMetric] =
    Array(new MalformedLinesMetric)
}

private[sources] class MalformedLinesMetric
    extends org.apache.spark.sql.connector.metric.CustomSumMetric {
  override def name(): String = "malformedLines"
  override def description(): String = "malformed lines skipped"
}

private[sources] case class GraftLogPartition(file: String, start: Long, end: Long)
  extends InputPartition

private[sources] class GraftLogReaderFactory(fields: Array[String], pushed: Array[Filter],
    hadoopConf: Map[String, String]) extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new GraftLogReader(partition.asInstanceOf[GraftLogPartition], fields, pushed, hadoopConf)
}

/** Executor-side reader for one byte-range split. */
private[sources] class GraftLogReader(split: GraftLogPartition, fields: Array[String],
    pushed: Array[Filter], hadoopConf: Map[String, String])
    extends PartitionReader[InternalRow] {

  private val raw = {
    val p = new Path(split.file)
    val fs = FileSystem.get(p.toUri, HadoopConfSnapshot.restore(hadoopConf))
    val stream = fs.open(p)
    if (split.start > 0) stream.seek(split.start)
    stream
  }
  // buffer AFTER seeking: byte-at-a-time reads against a raw
  // FSDataInputStream would pay a virtual (on HDFS, synchronized)
  // call per byte — ~4M calls per default split
  private val in = new java.io.BufferedInputStream(raw, 64 * 1024)

  // Position of the NEXT unread byte, tracked manually so the
  // line-ownership rule (first byte inside [start, end)) is exact.
  private var pos: Long = split.start
  private var current: InternalRow = _
  private var done = false
  private var malformed: Long = 0L

  // A split starting mid-file discards everything up to and including
  // the first newline — even when the split happens to start exactly
  // at a line start (that line belongs to the PREVIOUS split, which
  // reads one line past its end; the LineRecordReader protocol).
  if (split.start > 0) skipToLineStart()

  private def skipToLineStart(): Unit = {
    var b = in.read()
    while (b != -1 && b != '\n') { pos += 1; b = in.read() }
    if (b == -1) done = true else pos += 1
  }

  /** Reads one raw line starting at `pos`; returns null at EOF or
    * once past the range. Ownership rule: a line whose first byte is
    * at position p is read by the split with start < p <= end (and by
    * the first split when p == 0), so `pos == end` still reads — the
    * mirror image of the next split's unconditional first-line skip.
    * Consumes the trailing newline; tolerates CRLF and a final
    * unterminated line. */
  private def readLine(): String = {
    if (done || pos > split.end) return null
    val buf = new ArrayBuffer[Byte](64)
    var b = in.read()
    if (b == -1) { done = true; return null }
    while (b != -1 && b != '\n') { buf += b.toByte; pos += 1; b = in.read() }
    if (b == '\n') pos += 1 else done = true
    val n = if (buf.nonEmpty && buf.last == '\r') buf.length - 1 else buf.length
    new String(buf.toArray, 0, n, "UTF-8")
  }

  private def keep(ts: Long, level: String): Boolean = pushed.forall {
    case EqualTo("level", v: String) => level == v
    case GreaterThan("ts", v: Long) => ts > v
    case GreaterThanOrEqual("ts", v: Long) => ts >= v
    case LessThan("ts", v: Long) => ts < v
    case LessThanOrEqual("ts", v: Long) => ts <= v
    case _ => true
  }

  override def next(): Boolean = {
    var line = readLine()
    while (line != null) {
      if (line.nonEmpty) {
        val parts = line.split("\\|", 3)
        // toLongOption, not a digit test: an all-digit string can
        // still overflow Long, and a malformed line must skip, not
        // crash the scan
        val tsOpt = if (parts.length == 3) parts(0).toLongOption else None
        if (tsOpt.isDefined) {
          val ts = tsOpt.get
          if (keep(ts, parts(1))) {
            current = new GenericInternalRow(fields.map {
              case "ts" => ts: Any
              case "level" => UTF8String.fromString(parts(1))
              case "message" => UTF8String.fromString(parts(2))
            })
            return true
          }
        } else malformed += 1
      }
      line = readLine()
    }
    false
  }

  override def get(): InternalRow = current
  override def close(): Unit = in.close()

  override def currentMetricsValues(): Array[org.apache.spark.sql.connector.metric.CustomTaskMetric] =
    Array(new org.apache.spark.sql.connector.metric.CustomTaskMetric {
      override def name(): String = "malformedLines"
      override def value(): Long = malformed
    })
}
