package graft.sources

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReaderFactory}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream,
  Offset, ReadLimit, SupportsAdmissionControl}
import org.apache.spark.sql.sources.Filter
import org.apache.spark.sql.types.StructType

/** Micro-batch streaming read of the growing JSONL log (SURVEY §2.1
  * S4 through the connector API): an offset is simply a byte position
  * in the append-only file; each micro-batch reads `[start, end)`
  * with the SAME line-ownership convention as the batch splits
  * ([[EventLogPartitionReader]]'s s−1 seek), so a line straddling an
  * offset capture is consumed exactly once — by the batch owning its
  * first byte — even though offsets land at arbitrary byte positions.
  *
  * A partial line at the file's current end (producer mid-append)
  * fails JSON parse in this batch and is skipped; the next batch
  * discards its remainder while seeking the first newline — the
  * producer's line-atomic append (`input_habit_logger.lua:168-176`)
  * makes this a non-event in practice, and a torn write degrades to
  * one skipped (corrupt) line, never a duplicate.
  *
  * State is the offset alone (stored in the checkpoint by the
  * engine); the source itself is stateless across restarts.
  */
private[graft] case class EventLogOffset(pos: Long) extends Offset {
  override def json(): String = s"""{"pos":$pos}"""
}

private[graft] class EventLogMicroBatchStream(
    path: String,
    required: StructType,
    pushed: Array[Filter],
    splitBytes: Long,
    maxBytesPerTrigger: Option[Long] = None)
    extends MicroBatchStream with SupportsAdmissionControl {

  // the streaming offset model is a byte position in ONE append-only
  // file (the reference's actual log shape); a directory of parts has
  // no single growing offset — fail fast instead of reading the
  // directory inode as if it were data
  require(!new java.io.File(path).isDirectory,
    s"streaming read needs a single append-only file, got directory $path")
  require(splitBytes > 0, s"splitBytes must be positive, got $splitBytes")

  private val mapper = new ObjectMapper()

  override def initialOffset(): Offset = EventLogOffset(0L)

  override def latestOffset(): Offset =
    EventLogOffset(new java.io.File(path).length())

  /** Admission control: without a cap, a stream started against an
    * existing large log makes the whole backlog ONE micro-batch —
    * hours of work before the first checkpoint, full reprocessing on
    * any failure, and one giant batch hitting downstream stateful
    * operators' per-batch bounds. `maxBytesPerTrigger` caps each
    * batch's byte range; the engine keeps scheduling batches until the
    * backlog drains. */
  override def getDefaultReadLimit: ReadLimit = ReadLimit.allAvailable()

  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val s = start.asInstanceOf[EventLogOffset].pos
    val len = new java.io.File(path).length()
    val capped = maxBytesPerTrigger
      .map(m => math.min(len, s + m)).getOrElse(len)
    EventLogOffset(math.max(capped, s))
  }

  override def deserializeOffset(json: String): Offset =
    EventLogOffset(mapper.readTree(json).get("pos").asLong())

  override def commit(end: Offset): Unit = () // nothing to release

  override def planInputPartitions(start: Offset,
                                   end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[EventLogOffset].pos
    val e = end.asInstanceOf[EventLogOffset].pos
    if (e <= s) Array.empty
    else (s until e by splitBytes).map { from =>
      EventLogPartition(path, from, math.min(from + splitBytes, e))
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new EventLogReaderFactory(required, pushed)

  override def stop(): Unit = ()
}
