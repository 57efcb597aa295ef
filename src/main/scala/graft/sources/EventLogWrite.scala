package graft.sources

import java.io.File
import java.nio.file.{Files, Paths, StandardCopyOption}
import java.util.UUID

import com.fasterxml.jackson.databind.ObjectMapper
import graft.model.LogEvent
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.types._

/** DataSource V2 WRITE path for the JSONL event log (T8/K3 through the
  * connector API): each task serializes its partition to a hidden
  * `.part-<partition>-<uuid>.tmp` file in the target directory and
  * reports the name in its commit message; the driver's job-level
  * `commit` renames every temp to its final name, `abort` deletes
  * them. A failed/speculated task's leftovers are never renamed, so
  * readers only ever see fully-written files — the standard
  * rename-on-commit protocol for non-transactional stores.
  *
  * Null fields are OMITTED from the JSON object (the producer's
  * `omitempty` behavior, `input_habit_logger.lua:151-160` +
  * `analyzer.go:17-24`), which is exactly what the tolerant read side
  * expects back.
  */
private[sources] class EventLogWriteBuilder(path: String)
    extends WriteBuilder with SupportsTruncate {

  private var doTruncate = false

  override def truncate(): WriteBuilder = { doTruncate = true; this }

  override def build(): Write = new Write {
    override def toBatch: BatchWrite =
      new EventLogBatchWrite(path, doTruncate)
  }
}

private[sources] class EventLogBatchWrite(path: String, truncate: Boolean)
    extends BatchWrite {

  override def createBatchWriterFactory(info: PhysicalWriteInfo)
      : DataWriterFactory = {
    val dir = new File(path)
    dir.mkdirs()
    new EventLogWriterFactory(path)
  }

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val dir = new File(path)
    if (truncate) dir.listFiles()
      .filter(f => f.getName.endsWith(".jsonl") && f.isFile)
      .foreach(_.delete())
    messages.foreach {
      case EventLogCommit(tmpName, finalName) =>
        Files.move(Paths.get(path, tmpName), Paths.get(path, finalName),
          StandardCopyOption.ATOMIC_MOVE)
      case _ =>
    }
    sweepOrphans()
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit = {
    messages.foreach {
      case EventLogCommit(tmpName, _) =>
        Files.deleteIfExists(Paths.get(path, tmpName))
      case _ =>
    }
    sweepOrphans()
  }

  /** A task killed before producing a commit message (executor death,
    * zapped speculative attempt) leaves a `.part-*.tmp` nobody ever
    * names again; without a sweep they accumulate forever. Safe under
    * the single-writer-per-directory contract of this sink: at job
    * commit/abort, every committed temp has already been renamed or
    * deleted, so any remaining `.tmp` is an orphan of THIS job. */
  private def sweepOrphans(): Unit =
    Option(new File(path).listFiles()).getOrElse(Array.empty)
      .filter(f => f.isFile && f.getName.startsWith(".part-") &&
        f.getName.endsWith(".tmp"))
      .foreach(_.delete())
}

private[sources] case class EventLogCommit(tmpName: String,
                                           finalName: String)
    extends WriterCommitMessage

private[sources] class EventLogWriterFactory(path: String)
    extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long)
      : DataWriter[InternalRow] =
    new EventLogDataWriter(path, partitionId)
}

private[sources] class EventLogDataWriter(path: String, partitionId: Int)
    extends DataWriter[InternalRow] {

  private val uuid = UUID.randomUUID().toString
  private val finalName = f"part-$partitionId%05d-$uuid.jsonl"
  private val tmpName = s".$finalName.tmp"
  private val out = new java.io.BufferedWriter(
    new java.io.OutputStreamWriter(
      new java.io.FileOutputStream(new File(path, tmpName)), "UTF-8"))
  private val mapper = new ObjectMapper()

  override def write(row: InternalRow): Unit = {
    val node = mapper.createObjectNode()
    LogEvent.schema.fields.zipWithIndex.foreach { case (f, i) =>
      if (!row.isNullAt(i)) f.dataType match {
        case StringType => node.put(f.name, row.getUTF8String(i).toString)
        case IntegerType => node.put(f.name, row.getInt(i))
        case ArrayType(StringType, _) =>
          val arr = node.putArray(f.name)
          val data = row.getArray(i)
          (0 until data.numElements()).foreach { j =>
            if (!data.isNullAt(j))
              arr.add(data.getUTF8String(j).toString)
          }
        case _ =>
      }
    }
    out.write(mapper.writeValueAsString(node))
    out.write("\n")
  }

  override def commit(): WriterCommitMessage = {
    out.close()
    EventLogCommit(tmpName, finalName)
  }

  override def abort(): Unit = {
    out.close()
    Files.deleteIfExists(Paths.get(path, tmpName))
  }

  override def close(): Unit = ()
}
