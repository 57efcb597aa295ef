package graft.ops

import graft.model.LogEvent
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The reference's core column predicates and derivations, encoded once
  * (SURVEY §7.4 risk #1: null-vs-sentinel rank semantics must not be
  * re-derived ad hoc at each call site).
  *
  * All of these are plain Catalyst expressions — fully codegen'd, no UDFs
  * (SURVEY §2.7: zero UDFs required for reference parity).
  */
object EventOps {

  /** `selected_candidate_rank` — Go `*int` ≘ nullable int column. */
  val rank: Column = col("selected_candidate_rank")

  /** Commit events only (`cli.py:277`, fused in `analyzer.go:77-79`). */
  val isCommit: Column = col("event_type") === LogEvent.TextCommitted

  /** Real candidate selections (`cli.py:285`, `analyzer.go:116-118`).
    * Null-rejecting `>=` matches both pandas (NaN >= 0 is False) and Go
    * (nil ranks skipped at `analyzer.go:109-112`) for free. */
  val isSelection: Column = rank >= 0

  /** Direct commits without menu selection (`cli.py:305`,
    * `analyzer.go:119-122`). */
  val isDirectCommit: Column = rank === -1

  /** First-choice hit (`cli.py:291`, `analyzer.go:147-150`). */
  val isFirstChoice: Column = rank === 0

  /** Top-3 hit — evaluated on the selection subset (`cli.py:292`,
    * `analyzer.go:152-155`). */
  val isTop3: Column = isSelection && rank < 3

  /** Mispredictions exported by export-misses (`cli.py:327`,
    * `analyzer.go:220-222`). */
  val isMiss: Column = rank > 0

  /** Reciprocal-rank accuracy score `1 / (rank + 1)` (`cli.py:293`,
    * `analyzer.go:157-158`), defined ONLY for real selections: null
    * rank AND the -1 direct-commit sentinel both yield null — both
    * references compute the score strictly over the rank>=0 subset,
    * and the guard keeps ANSI mode from aborting on 1/(−1+1). */
  val accuracyScore: Column =
    when(rank >= 0, lit(1.0) / (rank + 1))

  /** Selection-method classification (`input_habit_logger.lua:254-263`):
    * space commit → first/nth by rank; digit key → the key name itself
    * (`"nth_choice_number_" .. key_action`); no pending key and no input
    * buffer → direct commit; anything else → unknown. */
  def selectionMethod(rankCol: Column, keyAction: Column,
                      inputBuffer: Column): Column =
    when(keyAction === "space" && rankCol === 0, LogEvent.FirstChoiceSpace)
      .when(keyAction === "space", LogEvent.NthChoiceSpace)
      .when(keyAction.rlike("^[1-9]$"),
        concat(lit("nth_choice_number_"), keyAction))
      .when(keyAction.isNull && inputBuffer.isNull,
        LogEvent.DirectCommitNoMenu)
      .otherwise(LogEvent.Unknown)

  /** Event-subtype classification of keypress events
    * (`input_habit_logger.lua:325-341`): Up/Down/Page_Up/Page_Down/Next →
    * menu_navigation; Escape → input_rejected; Control_Left/Right with
    * the control modifier → manual_segmentation; single-char key or
    * BackSpace → buffer_edit; else other_key. */
  def eventSubtype(keyRepr: Column, hasCtrlModifier: Column): Column =
    when(keyRepr.isin("Up", "Down", "Page_Up", "Page_Down", "Next"),
      "menu_navigation")
      .when(keyRepr === "Escape", "input_rejected")
      .when(keyRepr.isin("Control_Left", "Control_Right") && hasCtrlModifier,
        "manual_segmentation")
      .when(length(keyRepr) === 1 || keyRepr === "BackSpace", "buffer_edit")
      .otherwise("other_key")

  /** P6: defensive column intersection (`cli.py:341`) — select only the
    * desired columns that actually exist, in order. With the fixed read
    * schema absent fields are null, but ad-hoc frames (e.g. re-loaded
    * reports) may genuinely lack columns. */
  def selectExisting(df: org.apache.spark.sql.DataFrame,
                     desired: Seq[String]): org.apache.spark.sql.DataFrame = {
    val have = df.columns.toSet
    df.select(desired.filter(have).map(col): _*)
  }

  /** Rank derivation from a commit snapshot (`input_habit_logger.lua:226-252`):
    * pending key "space" → 0-based position of the committed text in the
    * last visible candidate list + page*6, falling back to page*6 when
    * not found; pending digit N → page*6 + (N-1); no pending key → -1
    * (direct commit). `array_position` is 1-based and 0/null when
    * absent, matching the fallback branch. */
  def deriveRank(committed: Column, candidates: Column, pageIndex: Column,
                 keyAction: Column): Column = {
    val local = array_position(candidates, committed)
    val pageBase = pageIndex * LogEvent.PageSize
    when(keyAction.rlike("^[1-9]$"),
      pageBase + keyAction.cast("int") - 1)
      .when(keyAction === "space",
        when(local > 0, pageBase + local.cast("int") - 1)
          .otherwise(pageBase))
      .otherwise(-1)
  }
}
