package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions.{col, lit}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout,
  OutputMode}

/** One tagged event of either stream: side "L" (the stream being
  * enriched) or "R" (the reference stream). */
final case class AsOfSideEvent(user_id: Long, ts: Timestamp, side: String,
                               id: Long)

/** Per-key join state. `rights`/`pendingLefts` are (tsMs, id) pairs,
  * kept sorted ascending. Bounded: after every batch `pendingLefts`
  * holds only lefts above the watermark, and `rights` holds rights
  * above the watermark plus AT MOST ONE at-or-below it (the only one
  * any future left can match — see eviction note in [[StreamAsOfJoin]]). */
final case class StreamAsOfState(rights: Seq[(Long, Long)],
                                 pendingLefts: Seq[(Long, Long)])

/** A left event with its as-of match (the latest right id with
  * `right.ts <= left.ts`, ties by id, same key), or None. */
final case class AsOfAttributed(user_id: Long, left_id: Long, ts: Timestamp,
                                asof_id: Option[Long])

/** STREAM-STREAM as-of join — the temporal join Structured Streaming
  * does not ship (its interval join emits every right in a window, not
  * the latest-at-or-before one; [[graft.ops.AsOfJoin.asofStaticRight]]
  * covers only a static right side).
  *
  * Event-time correctness: a left row cannot be emitted when it
  * ARRIVES — a right row with an earlier event time may still be in
  * flight. Each left is therefore buffered until the watermark passes
  * its timestamp (all earlier rights have then arrived, by the
  * watermark contract), then emitted with the latest right at-or-before
  * it. An out-of-order right that arrives between the left's arrival
  * and its maturation is matched correctly — the case every eager
  * implementation gets wrong (spec-proved).
  *
  * Bounded state via a safe eviction invariant: once every left with
  * `ts <= W` has been emitted, a future left (`ts > W`) matches either
  * a right with `ts > W` or the LATEST right with `ts <= W` — all
  * older rights are dominated and dropped. So state per key is the
  * in-flight horizon of each stream plus one row, independent of
  * stream length. Keys idle longer than `idleTtl` after their last
  * pending left matures are evicted entirely (the Flink temporal-join
  * state-TTL trade: an as-of probe after an eviction-length idle gap
  * loses pre-gap history).
  */
object StreamAsOfJoin {

  /** Pure per-key step, unit-testable with `TestGroupState`. */
  def process(idleTtlMs: Long)(key: Long, it: Iterator[AsOfSideEvent],
                               gs: GroupState[StreamAsOfState])
      : Iterator[AsOfAttributed] = {
    val st = gs.getOption.getOrElse(StreamAsOfState(Nil, Nil))
    // batch mode has no watermark: everything matures immediately
    val w = scala.util.Try(gs.getCurrentWatermarkMs())
      .getOrElse(Long.MaxValue)
    val evs = it.toSeq
    // pure TTL wake (timed out, no new events, nothing pending): the
    // key has been idle for idleTtl since its last left matured. Drop
    // the PRE-GAP history (rights at or below the watermark) — but an
    // in-flight right ABOVE the watermark has not matured and must
    // survive the wake, or an on-time left arriving next would
    // silently mis-join to None.
    if (gs.hasTimedOut && evs.isEmpty && st.pendingLefts.isEmpty) {
      val future = st.rights.filter(_._1 > w)
      if (future.isEmpty) gs.remove()
      else {
        gs.update(StreamAsOfState(future, Nil))
        gs.setTimeoutTimestamp(math.max(w + idleTtlMs, w + 1))
      }
      return Iterator.empty
    }
    val rights = (st.rights ++
      evs.collect { case e if e.side == "R" => (e.ts.getTime, e.id) })
      .sorted
    val pend = (st.pendingLefts ++
      evs.collect { case e if e.side == "L" => (e.ts.getTime, e.id) })
      .sorted
    val (ready, wait) = pend.partition(_._1 <= w)
    // match BEFORE evicting: a ready left may need a right older than
    // the newest at-or-below-W one
    val out = ready.map { case (lts, lid) =>
      val m = rights.takeWhile(_._1 <= lts).lastOption
      AsOfAttributed(key, lid, new Timestamp(lts), m.map(_._2))
    }
    val (mature, future) = rights.partition(_._1 <= w)
    val keep = mature.lastOption.toSeq ++ future
    if (wait.isEmpty && keep.isEmpty) gs.remove()
    else {
      gs.update(StreamAsOfState(keep, wait))
      if (w != Long.MaxValue) {
        // wake when the earliest pending left matures; idle keys get a
        // TTL wake that clears the lingering right history
        val target = wait.headOption.map(_._1).getOrElse(w + idleTtlMs)
        gs.setTimeoutTimestamp(math.max(target, w + 1))
      }
    }
    out.iterator
  }

  /** Join two streaming frames, each with columns
    * (user_id long, ts timestamp, event_id long). `delay` is the
    * watermark (bounds both lateness tolerance and state size);
    * output is append-mode: each left exactly once, when it matures. */
  def asofStream(left: DataFrame, right: DataFrame,
                 delay: String = "10 seconds",
                 idleTtl: String = "1 hour"): Dataset[AsOfAttributed] = {
    val spark = left.sparkSession
    import spark.implicits._
    def side(df: DataFrame, tag: String) =
      df.withWatermark("ts", delay)
        .select(col("user_id"), col("ts"), lit(tag).as("side"),
          col("event_id").as("id"))
        .as[AsOfSideEvent]
    val ttlMs = Durations.toMillis(idleTtl)
    side(left, "L").union(side(right, "R"))
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.EventTimeTimeout())(process(ttlMs))
  }
}
