package graft.model

import org.apache.spark.sql.types._

/** The reference's closed event record.
  *
  * Mirrors the 9-field `LogEvent` struct of
  * `cli-go/internal/analyzer/analyzer.go:15-25`: the authoritative
  * projection schema every query types against. `selected_candidate_rank`
  * is nullable (Go `*int`) with sentinel semantics (analyzer.go:109-122):
  *   - null  → field absent / filtered by preset → excluded everywhere
  *   - -1    → direct commit without candidate selection
  *   - >= 0  → index of the chosen candidate in global (cross-page) order,
  *             0 = first choice
  */
final case class LogEvent(
    event_type: String,
    timestamp: String,
    committed_text: Option[String],
    input_sequence_at_commit: Option[String],
    selection_method: Option[String],
    selected_candidate_rank: Option[Int],
    source_input_buffer: Option[String],
    source_candidates_list: Option[Seq[String]],
    source_first_candidate: Option[String])

object LogEvent {

  /** Explicit superset schema — never inferred (SURVEY §1.5).
    *
    * The log is schema-sparse by construction: a per-event-type field mask
    * is applied at write time (`input_habit_logger.lua:151-160`), so the
    * same `text_committed` event carries 3 fields under the `normal`
    * preset and 8 under `advanced`. Reading with this fixed schema makes
    * absent fields null, matching Go's `omitempty` pointer fields.
    *
    * `timestamp` stays a string for fidelity (analyzer.go:24 never parses
    * it); event-time ops derive a typed column on demand.
    */
  val schema: StructType = StructType(Seq(
    StructField("event_type", StringType),
    StructField("timestamp", StringType),
    StructField("committed_text", StringType),
    StructField("input_sequence_at_commit", StringType),
    StructField("selection_method", StringType),
    StructField("selected_candidate_rank", IntegerType),
    StructField("source_input_buffer", StringType),
    StructField("source_candidates_list", ArrayType(StringType)),
    StructField("source_first_candidate", StringType)))

  /** Discriminator values (`input_habit_logger.lua`, SURVEY §1.2). */
  val TextCommitted = "text_committed"
  val InputStateChanged = "input_state_changed"
  val SessionStart = "session_start"
  val SessionEnd = "session_end"
  val ErrorEvent = "error"

  /** `selection_method` labels (`input_habit_logger.lua:254-263`). */
  val FirstChoiceSpace = "first_choice_space"
  val NthChoiceSpace = "nth_choice_space"
  val DirectCommitNoMenu = "direct_commit_no_menu"
  val Unknown = "unknown"

  /** Candidate page size used in rank arithmetic
    * (`input_habit_logger.lua:223`). */
  val PageSize = 6

  /** Default cap on recorded candidates (`input_habit_logger.lua:202`). */
  val MaxCandidates = 5
}
