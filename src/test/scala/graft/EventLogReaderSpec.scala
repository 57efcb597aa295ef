package graft

import graft.io.EventLogReader
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

class EventLogReaderSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("tolerant scan skips corrupt and blank lines, keeps all valid events") {
    val path = Fixtures.writeJsonl(Fixtures.mixedLog).toString
    val df = EventLogReader.readJsonl(spark, path)
    // 14 commits + session_start/end + input_state_changed + error = 18;
    // 2 blank + 2 corrupt lines dropped (analyzer.go:65-74 semantics)
    assert(df.count() === 18)
    assert(!df.columns.contains(EventLogReader.CorruptCol))
  }

  test("fused commit scan returns exactly the text_committed events") {
    val path = Fixtures.writeJsonl(Fixtures.mixedLog).toString
    val commits = EventLogReader.readCommits(spark, path)
    assert(commits.count() === 14)
    assert(commits.filter(col("event_type") =!= "text_committed").count() === 0)
  }

  test("preset-sparse rows read as nulls under the closed schema") {
    val path = Fixtures.writeJsonl(Fixtures.commitLines).toString
    val df = EventLogReader.readCommits(spark, path)
    // normal-preset rows (first two) have no rank → null, not error
    assert(df.filter(col("selected_candidate_rank").isNull).count() === 2)
    // unknown JSON keys would be dropped; known-but-absent are null
    assert(df.schema.fieldNames.toSeq ===
      graft.model.LogEvent.schema.fieldNames.toSeq)
  }

  test("empty log yields an empty DataFrame, not a failure") {
    val path = Fixtures.writeJsonl(Seq("")).toString
    assert(EventLogReader.readJsonl(spark, path).count() === 0)
  }
}
