package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One event on the funnel's input: (user, type, event-time ns). */
final case class FunnelEvent(user_id: Long, event_type: String, ts: Long)

/** Per-user funnel progress: the first-qualifying timestamp of each
  * completed stage (ns). */
final case class FunnelState(t1: Option[Long], t2: Option[Long],
                             t3: Option[Long])

/** A stage completion emitted downstream. */
final case class StageHit(user_id: Long, stage: String, ts: Long)

/** Streaming form of the q30 sequential funnel (view → click within
  * `deadlineNs` → purchase within `deadlineNs`, first-qualifying):
  * a per-user state machine over `flatMapGroupsWithState`, emitting a
  * [[StageHit]] the moment a user completes a stage — the live-funnel
  * dashboard shape, where the batch query is the daily report.
  *
  * State per user is three optional longs — O(1); for unbounded user
  * populations pass `idleTimeout` to evict idle users (the
  * RankRederivation eviction pattern). Events are processed in
  * event-time order WITHIN each micro-batch (per-group sort, same as
  * RankRederivation); cross-batch disorder needs watermark buffering
  * upstream (StreamAsOfJoin's approach) — with in-order delivery the
  * emitted stage sets match the batch query exactly, which
  * FunnelStreamSpec proves differentially on the driver fixtures. */
object FunnelStream {

  val HourNs: Long = 3600L * 1000 * 1000 * 1000

  /** The per-user step function — pure, unit-testable through
    * `TestGroupState`, shared by the streaming wiring. With an
    * `idleTimeout`, a user idle past it is evicted on the timeout
    * wake (the RankRederivation eviction pattern — state for an
    * unbounded user population must not grow forever). */
  def processUser(user: Long, events: Iterator[FunnelEvent],
                  state: GroupState[FunnelState], deadlineNs: Long,
                  idleTimeout: Option[String] = None): Iterator[StageHit] = {
    if (state.hasTimedOut) {
      state.remove()
      return Iterator.empty
    }
    var st = state.getOption.getOrElse(FunnelState(None, None, None))
    val hits = scala.collection.mutable.Buffer[StageHit]()
    events.toSeq.sortBy(_.ts).foreach { e =>
      e.event_type match {
        case "view" if st.t1.isEmpty =>
          st = st.copy(t1 = Some(e.ts))
          hits += StageHit(user, "1_view", e.ts)
        case "click" if st.t1.nonEmpty && st.t2.isEmpty &&
            e.ts > st.t1.get && e.ts < st.t1.get + deadlineNs =>
          st = st.copy(t2 = Some(e.ts))
          hits += StageHit(user, "2_click", e.ts)
        case "purchase" if st.t2.nonEmpty && st.t3.isEmpty &&
            e.ts > st.t2.get && e.ts < st.t2.get + deadlineNs =>
          st = st.copy(t3 = Some(e.ts))
          hits += StageHit(user, "3_purchase", e.ts)
        case _ => ()
      }
    }
    state.update(st)
    // a TestGroupState without a configured timeout rejects the call;
    // the streaming wiring always configures one when idleTimeout is
    // set, so the Try only guards the unit-test harness
    idleTimeout.foreach(d =>
      scala.util.Try(state.setTimeoutDuration(d)))
    hits.iterator
  }

  /** Wire the step function over a (possibly streaming) event set.
    * `idleTimeout` (e.g. `Some("1 hour")`) turns on per-user state
    * eviction for unbounded user populations. */
  def stageHits(events: Dataset[FunnelEvent],
                deadlineNs: Long = HourNs,
                idleTimeout: Option[String] = None): Dataset[StageHit] = {
    implicit val stateEnc = Encoders.product[FunnelState]
    implicit val outEnc = Encoders.product[StageHit]
    val conf = idleTimeout
      .map(_ => GroupStateTimeout.ProcessingTimeTimeout())
      .getOrElse(GroupStateTimeout.NoTimeout)
    events.groupByKey(_.user_id)(Encoders.scalaLong)
      .flatMapGroupsWithState(OutputMode.Append, conf)(
        (u: Long, it: Iterator[FunnelEvent],
         s: GroupState[FunnelState]) =>
          processUser(u, it, s, deadlineNs, idleTimeout))
  }
}
