package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom stateful streaming: gap-based sessionization with
  * `flatMapGroupsWithState` — the engine's demonstration of arbitrary per-key state
  * beyond windowed aggregates (SURVEY.md §2.9 notes the reference needs none; this is
  * the beyond-reference scale path for clickstream-style training data).
  *
  * State per user is ONE open session (id, last-seen) — O(keys) state, bounded
  * regardless of stream length; closed sessions are emitted incrementally.
  */
object SessionStream {

  case class Ev(user_id: Long, ts_us: Long)
  case class OpenSession(sessionId: Long, startUs: Long, lastUs: Long, n: Long)
  case class SessionOut(user_id: Long, session_id: Long, start_us: Long,
                        end_us: Long, n_events: Long)

  val GapUs: Long = 30L * 60 * 1000000

  /** Per-user session update: sort the micro-batch's events, extend or split
    * sessions on the 30-min gap, emit every CLOSED session, keep the open one in
    * state. */
  def updateSessions(userId: Long, events: Iterator[Ev],
                     state: GroupState[OpenSession]): Iterator[SessionOut] = {
    val sorted = events.toSeq.sortBy(_.ts_us)
    if (sorted.isEmpty) return Iterator.empty
    var open = state.getOption.getOrElse(
      OpenSession(1L, sorted.head.ts_us, sorted.head.ts_us - GapUs - 1, 0L))
    val closed = scala.collection.mutable.ArrayBuffer.empty[SessionOut]
    sorted.foreach { e =>
      if (e.ts_us - open.lastUs > GapUs) {
        if (open.n > 0)
          closed += SessionOut(userId, open.sessionId, open.startUs, open.lastUs, open.n)
        open = OpenSession(open.sessionId + (if (open.n > 0) 1 else 0),
          e.ts_us, e.ts_us, 1L)
      } else {
        open = open.copy(lastUs = e.ts_us, n = open.n + 1)
      }
    }
    state.update(open)
    closed.iterator
  }

  /** File-source stream -> stateful sessionization. Returns closed sessions. */
  def closedSessions(spark: SparkSession, dir: String): Dataset[SessionOut] = {
    import spark.implicits._
    EventStream.eventSource(spark, dir) // ts normalized via the EventsTs seam
      .select(col("user_id"), expr("ts div 1000").as("ts_us")).as[Ev]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.NoTimeout)(updateSessions)
  }
}
