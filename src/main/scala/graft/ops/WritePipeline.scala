package graft.ops

import graft.config.LoggerPreset
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The producer's write-time filter/projection cascade
  * (`input_habit_logger.lua:126-163`), re-expressed as plain Catalyst
  * filters and a masking projection — i.e. SURVEY §2.2 P8 (field mask)
  * and P9 (predicate cascade). Applied before a JSONL sink it yields
  * exactly the preset-sparse logs the consumers read.
  *
  * Steps mirror the lua numbering:
  *   1. master switch + per-event-type enable (`:127`, `:131`)
  *   2. `log_only_non_first_choice`: commits need rank >= 1; null or < 1
  *      dropped (`:134-136`)
  *   3. event types without field rules are dropped entirely (`:139-140`)
  *   4. input_state_changed subtype allow-list (`:143-148`) — empty list
  *      drops them all (the shipped presets' actual behavior)
  *   5. field mask: disallowed fields null out (`:151-160`)
  *   6. empty-event drop: at least one masked field non-null (`:163`)
  *   7. write-time timestamp is the sink's job (`:166-167`, see
  *      streaming/batch writers)
  */
object WritePipeline {

  def applyPreset(events: DataFrame, preset: LoggerPreset): DataFrame = {
    if (!preset.enabled) return events.limit(0) // lua:127 master switch

    val et = col("event_type")
    val enabledTypes =
      preset.logEvents.collect { case (t, true) => t }.toSeq
    val step1 = events.filter(et.isin(enabledTypes: _*))

    val step2 =
      if (!preset.logOnlyNonFirstChoice) step1
      else step1.filter(et =!= "text_committed" ||
        col("selected_candidate_rank") >= 1) // null-rejecting, lua:134-136

    val typesWithRules = preset.logFields.keySet.toSeq
    // session/error markers carry no data fields; lua drops them at step 3
    // when no field rules exist, and so do we.
    val step3 = step2.filter(et.isin(typesWithRules: _*))

    val step4 = {
      // an ABSENT column is a nil subtype, not an exemption: the lua
      // drops a nil subtype that is not in the allow list
      // (lua:143-148), so a re-loaded frame without the column must
      // filter exactly like one with all-null values
      val subtype =
        if (step3.columns.contains("event_subtype")) col("event_subtype")
        else lit(null).cast("string")
      val allowed = preset.logFields
        .getOrElse("input_state_changed", graft.config.EventFieldRules(Set.empty))
        .subtypeAllowList.toSeq
      step3.filter(et =!= "input_state_changed" ||
        (if (allowed.isEmpty) lit(false)
         else subtype.isin(allowed: _*)))
    }

    val dataCols = step4.columns.filterNot(c =>
      c == "event_type" || c == "timestamp")
    def maskCol(c: String): Column = {
      val allowCond = preset.logFields.collect {
        case (t, rules) if rules.fields.contains(c) => et === t
      }.reduceOption(_ || _).getOrElse(lit(false))
      when(allowCond, col(c)).otherwise(lit(null)).as(c)
    }
    val keep = Seq(col("event_type")) ++
      (if (step4.columns.contains("timestamp")) Seq(col("timestamp")) else Nil)
    val step5 = step4.select(keep ++ dataCols.map(maskCol): _*)

    if (dataCols.isEmpty) step5
    else step5.filter(dataCols.map(col(_).isNotNull).reduce(_ || _)) // lua:163
  }
}
