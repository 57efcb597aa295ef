package graft.sources

import java.util

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import graft.model.LogEvent
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.{EqualTo, Filter, In, IsNotNull}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 connector for the reference's JSONL event log
  * (`rime_logger/assets/input_habit_logger.lua:168-176` writes it; both
  * reference consumers scan it line by line).
  *
  * Usage: `spark.read.format("graft.sources.EventLogSource")
  * .load(path)`. Fixed [[LogEvent.schema]] (never inferred, SURVEY
  * §1.5), blank/corrupt lines skipped like `analyzer.go:65-74`.
  *
  * What makes this the 100 TB shape rather than a toy:
  *   - **byte-range splits**: the file is divided into ~`splitBytes`
  *     ranges; each reader seeks to its start and snaps to the next
  *     line boundary (the reader owning the preceding range finishes
  *     the straddling line), so a single giant log parallelizes across
  *     executors exactly like Hadoop text splits;
  *   - **source-level column pruning** (`SupportsPushDownRequiredColumns`):
  *     only requested fields are extracted from each JSON object;
  *   - **source-level filter pushdown** (`SupportsPushDownFilters`):
  *     `event_type = 'x'` / IN / IsNotNull are applied DURING the scan
  *     before a row is materialized — the fused scan-time commit filter
  *     of `analyzer.go:77-79`, pushed through the connector API.
  */
class EventLogSource extends TableProvider {

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    LogEvent.schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new EventLogTable(properties.get("path"))

  override def supportsExternalMetadata(): Boolean = false
}

private[sources] class EventLogTable(path: String)
    extends Table with SupportsRead
    with org.apache.spark.sql.connector.catalog.SupportsWrite {
  require(path != null, "path option is required")
  override def name(): String = s"eventlog($path)"
  override def schema(): StructType = LogEvent.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ,
      TableCapability.MICRO_BATCH_READ,
      TableCapability.BATCH_WRITE, TableCapability.TRUNCATE)
  override def newScanBuilder(options: CaseInsensitiveStringMap)
      : ScanBuilder =
    new EventLogScanBuilder(path,
      Option(options.get("splitBytes")).map(_.toLong)
        .getOrElse(EventLogSource.DefaultSplitBytes),
      Option(options.get("maxBytesPerTrigger")).map(_.toLong))
  override def newWriteBuilder(
      info: org.apache.spark.sql.connector.write.LogicalWriteInfo)
      : org.apache.spark.sql.connector.write.WriteBuilder =
    new EventLogWriteBuilder(path)
}

object EventLogSource {
  val DefaultSplitBytes: Long = 32L * 1024 * 1024

  /** Filters this source evaluates during the scan: equality/IN on
    * event_type plus IsNotNull on any column. */
  private[sources] def pushable(f: Filter): Boolean = f match {
    case EqualTo("event_type", _: String) => true
    case In("event_type", vs) => vs.forall(_.isInstanceOf[String])
    case IsNotNull(_) => true
    case _ => false
  }
}

private[sources] class EventLogScanBuilder(path: String, splitBytes: Long,
                                           maxBytesPerTrigger: Option[Long])
    extends ScanBuilder with SupportsPushDownRequiredColumns
    with SupportsPushDownFilters {
  require(splitBytes > 0, s"splitBytes must be positive, got $splitBytes")
  require(maxBytesPerTrigger.forall(_ > 0),
    "maxBytesPerTrigger must be positive")

  private var required: StructType = LogEvent.schema
  private var pushed: Array[Filter] = Array.empty

  override def pruneColumns(requiredSchema: StructType): Unit =
    // preserve our field order; accept any subset
    required = StructType(LogEvent.schema.fields
      .filter(f => requiredSchema.fieldNames.contains(f.name)))

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (take, rest) = filters.partition(EventLogSource.pushable)
    pushed = take
    // pushed filters are evaluated exactly at the source, so only the
    // remainder needs re-evaluation by Spark
    rest
  }

  override def pushedFilters(): Array[Filter] = pushed

  override def build(): Scan = new EventLogScan(path, required, pushed,
    splitBytes, maxBytesPerTrigger)
}

private[sources] class EventLogScan(path: String, required: StructType,
                                    pushed: Array[Filter],
                                    splitBytes: Long,
                                    maxBytesPerTrigger: Option[Long] = None)
    extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def toMicroBatchStream(checkpointLocation: String)
      : org.apache.spark.sql.connector.read.streaming.MicroBatchStream =
    new EventLogMicroBatchStream(path, required, pushed, splitBytes,
      maxBytesPerTrigger)
  override def description(): String =
    s"EventLogScan($path, pushed=[${pushed.mkString(",")}])"

  override def planInputPartitions(): Array[InputPartition] = {
    // a file reads as itself; a directory reads its visible files
    // (dot/underscore-prefixed temp and marker files skipped — the
    // write path's uncommitted parts are never visible to readers)
    val root = new java.io.File(path)
    val files =
      if (root.isDirectory)
        root.listFiles().filter(f => f.isFile &&
          !f.getName.startsWith(".") && !f.getName.startsWith("_"))
          .sortBy(_.getName).toSeq
      else Seq(root)
    val parts = files.flatMap { f =>
      val len = f.length()
      if (len == 0) Seq.empty
      else (0L until len by splitBytes).map { start =>
        EventLogPartition(f.getPath, start, math.min(start + splitBytes, len))
      }
    }
    parts.toArray // empty file/dir → zero partitions → empty scan
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new EventLogReaderFactory(required, pushed)
}

private[sources] case class EventLogPartition(path: String, start: Long,
                                              end: Long)
    extends InputPartition

private[sources] class EventLogReaderFactory(required: StructType,
                                             pushed: Array[Filter])
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] =
    new EventLogPartitionReader(p.asInstanceOf[EventLogPartition],
      required, pushed)
}

/** Reads `[start, end)` of the file: seeks to `start`, snaps forward to
  * the next line boundary (unless at 0), and keeps reading lines while
  * the line's FIRST byte lies before `end` — the standard text-split
  * contract (each line belongs to the split containing its first byte,
  * so straddling lines are read exactly once). */
private[sources] class EventLogPartitionReader(p: EventLogPartition,
                                               required: StructType,
                                               pushed: Array[Filter])
    extends PartitionReader[InternalRow] {

  private val mapper = new ObjectMapper()
  private val raf = new java.io.RandomAccessFile(p.path, "r")
  // seek BEFORE wrapping in the buffered stream; the s-1 convention
  // makes line ownership exact: a reader with start > 0 begins at
  // start-1 and discards through the first newline — if byte start-1
  // IS a newline the discard consumes only it, so a line beginning
  // exactly at `start` is still read here and not by the previous
  // split (which stops once a line STARTS at or past its end).
  private val seekFrom: Long = if (p.start > 0) p.start - 1 else 0L
  raf.seek(seekFrom)
  private val in = new java.io.BufferedInputStream(
    new java.io.FileInputStream(raf.getFD))
  private var pos: Long = {
    var cur = seekFrom
    if (p.start > 0) {
      var b = in.read()
      cur += 1
      while (b != -1 && b != '\n') { b = in.read(); cur += 1 }
      if (b == -1) cur -= 1 // hit EOF, nothing consumed past it
    }
    cur
  }
  private var current: InternalRow = _

  private val eventTypeEq: Option[Set[String]] = {
    val eqs = pushed.collect {
      case EqualTo("event_type", v: String) => Set(v)
      case In("event_type", vs) => vs.map(_.asInstanceOf[String]).toSet
    }
    if (eqs.isEmpty) None else Some(eqs.reduce(_ intersect _))
  }
  private val notNullCols: Array[String] =
    pushed.collect { case IsNotNull(c) => c }
  // fixed for the reader's lifetime: int index arrays so the per-line
  // hot loop never does string-keyed fieldIndex lookups
  private val notNullIdx: Array[Int] =
    notNullCols.map(LogEvent.schema.fieldIndex)
  private val projIdx: Array[Int] =
    required.fields.map(f => LogEvent.schema.fieldIndex(f.name))

  private def readLine(): Option[String] = {
    if (pos >= p.end) return None // next line starts in another split
    val sb = new java.io.ByteArrayOutputStream()
    var b = in.read()
    var n = 0L
    while (b != -1 && b != '\n') { sb.write(b); n += 1; b = in.read() }
    if (b == -1 && n == 0) None
    else {
      pos += n + (if (b == '\n') 1 else 0)
      Some(new String(sb.toByteArray, "UTF-8"))
    }
  }

  /** A present, non-null JSON value of the wrong shape for its field
    * type. Like the built-in PERMISSIVE reader (and Go's
    * `json.Unmarshal`, `analyzer.go:70-74`), a type mismatch rejects
    * the whole LINE, never silently nulls one field. */
  private object CorruptLine extends Exception {
    override def fillInStackTrace(): Throwable = this
  }

  private def field(node: JsonNode, name: String,
                    dt: DataType): Any = {
    val v = node.get(name)
    if (v == null || v.isNull) null
    else dt match {
      // StringType accepts any value as its JSON text — the built-in
      // reader's behavior for string fields
      case StringType => UTF8String.fromString(
        if (v.isTextual) v.asText() else v.toString)
      case IntegerType =>
        if (v.isIntegralNumber && v.canConvertToInt) Int.box(v.asInt())
        else throw CorruptLine
      case ArrayType(StringType, _) =>
        if (!v.isArray) throw CorruptLine
        else new GenericArrayData(v.elements().asScala.map { e =>
          if (e.isNull) null // null ELEMENTS stay null, as built-in
          else UTF8String.fromString(
            if (e.isTextual) e.asText() else e.toString)
        }.toArray[Any])
      case _ => null
    }
  }

  private def parse(line: String): Option[InternalRow] = {
    val trimmed = line.trim
    if (trimmed.isEmpty) return None // analyzer.go:65-67
    val node =
      try mapper.readTree(trimmed)
      catch { case _: Exception => return None } // analyzer.go:70-74
    if (node == null || !node.isObject) return None
    // pushed scan-time filters (fused commit filter, analyzer.go:77-79)
    // — must agree exactly with how `field` materializes the column
    // (non-textual JSON values render as their JSON text)
    eventTypeEq.foreach { allowed =>
      val et = node.get("event_type")
      if (et == null || et.isNull) return None
      val rendered = if (et.isTextual) et.asText() else et.toString
      if (!allowed.contains(rendered)) return None
    }
    try {
      // validate + materialize the FULL record regardless of the
      // projection (Go unmarshals the whole struct, analyzer.go:70-74;
      // corrupt-line detection must not depend on which columns a
      // query happens to read — count(*) sees the same row set)
      val full = LogEvent.schema.fields.map(f =>
        field(node, f.name, f.dataType))
      // pushed IsNotNull is checked against the MATERIALIZED value,
      // so a coercion can never smuggle a null through a consumed
      // filter, whether or not the filter column is projected
      var j = 0
      while (j < notNullIdx.length) {
        if (full(notNullIdx(j)) == null) return None
        j += 1
      }
      val row = new org.apache.spark.sql.catalyst.expressions
        .GenericInternalRow(required.length)
      var i = 0
      while (i < required.length) {
        row.update(i, full(projIdx(i)))
        i += 1
      }
      Some(row)
    } catch { case CorruptLine => None }
  }

  override def next(): Boolean = {
    while (true) {
      readLine() match {
        case None => return false
        case Some(line) =>
          parse(line) match {
            case Some(r) => current = r; return true
            case None => // skipped line; keep scanning
          }
      }
    }
    false
  }

  override def get(): InternalRow = current
  override def close(): Unit = { in.close(); raf.close() }
}
