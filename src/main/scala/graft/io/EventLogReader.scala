package graft.io

import graft.model.LogEvent
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StringType

/** Tolerant scan over the append-only JSONL event log.
  *
  * Reproduces the consumer scan semantics of
  * `cli-go/internal/analyzer/analyzer.go:51-87`:
  *   - blank lines skipped (`analyzer.go:65-67`) — the Spark JSON source
  *     drops empty lines natively;
  *   - malformed lines skipped, never fatal (`analyzer.go:70-74`) —
  *     PERMISSIVE mode routes them to a corrupt-record column which we
  *     filter out;
  *   - explicit closed schema, never inference — mirrors Go's fixed
  *     `LogEvent` struct dropping unknown keys (SURVEY §1.5).
  *
  * At 100 TB the scan is embarrassingly parallel: the JSON source splits
  * by file/line ranges, the schema is fixed (no sampling pass), and the
  * commit filter + column pruning push into the scan stage.
  */
object EventLogReader {

  val CorruptCol = "_corrupt_record"

  /** The ONE tolerant-read recipe, shared by the batch and streaming
    * paths so their corrupt-line semantics cannot drift: explicit
    * schema + PERMISSIVE corrupt column on the reader, then
    * [[tolerantFilter]] on the result. */
  val TolerantSchema: org.apache.spark.sql.types.StructType =
    LogEvent.schema.add(CorruptCol, StringType)
  val TolerantOptions: Map[String, String] = Map(
    "mode" -> "PERMISSIVE",
    "columnNameOfCorruptRecord" -> CorruptCol)

  /** Corrupt line ⇒ corrupt col non-null and all schema cols null;
    * requiring a non-null event_type also drops `{}`-style empties
    * (the producer never writes an event without its type:
    * input_habit_logger.lua:128). */
  def tolerantFilter(df: DataFrame): DataFrame =
    df.filter(col(CorruptCol).isNull && col("event_type").isNotNull)
      .drop(CorruptCol)

  /** Full tolerant scan: all event types, corrupt lines dropped. */
  def readJsonl(spark: SparkSession, path: String): DataFrame =
    tolerantFilter(spark.read
      .schema(TolerantSchema)
      .options(TolerantOptions)
      .json(path))

  /** Scan fused with the commit filter — the shape `analyzer.go:77-79`
    * hand-fuses; in Spark the predicate lands in the scan stage via
    * Catalyst pushdown. */
  def readCommits(spark: SparkSession, path: String): DataFrame =
    readJsonl(spark, path).filter(col("event_type") === LogEvent.TextCommitted)

  /** Same log persisted as parquet (the driver fixtures' format). */
  def readParquet(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)
}
