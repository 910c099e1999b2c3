package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom stateful streaming: gap-based sessionization with
  * `flatMapGroupsWithState` — the streaming twin of the batch
  * `sessionize` query. A session closes when no event arrives for
  * `gapSeconds` past the watermark; state per user is one open-session
  * summary (bounded, watermark-evicted).
  */
object StatefulSessions {

  case class SessionEvent(user_id: Long, ts: Timestamp)
  case class OpenSession(start: Long, last: Long, n: Long)
  case class SessionOut(user_id: Long, session_start: Timestamp,
                        session_end: Timestamp, n_events: Long)

  /** Sessionize a stream with columns (user_id: long, ts: timestamp).
    * `withWatermark` must already be applied by the caller (the delay
    * bounds how late events may arrive). Emits one row per CLOSED
    * session (append mode). */
  def sessionizeStream(events: Dataset[SessionEvent],
                       gapSeconds: Long): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    val gapMs = gapSeconds * 1000L

    def flush(userId: Long, s: OpenSession): SessionOut =
      SessionOut(userId, new Timestamp(s.start), new Timestamp(s.last), s.n)

    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[OpenSession, SessionOut](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (userId: Long, it: Iterator[SessionEvent], state: GroupState[OpenSession]) =>
          if (state.hasTimedOut) {
            val out = state.getOption.map(flush(userId, _)).toSeq
            state.remove()
            out.iterator
          } else {
            val sorted = it.map(_.ts.getTime).toSeq.sorted
            var open = state.getOption
            val closed = Seq.newBuilder[SessionOut]
            sorted.foreach { t =>
              open match {
                case Some(s) if t - s.last <= gapMs =>
                  // out-of-order (within-watermark) events may extend
                  // the session backwards as well as forwards
                  open = Some(s.copy(start = math.min(s.start, t),
                    last = math.max(s.last, t), n = s.n + 1))
                case Some(s) =>
                  closed += flush(userId, s)
                  open = Some(OpenSession(t, t, 1))
                case None =>
                  open = Some(OpenSession(t, t, 1))
              }
            }
            open.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s.last + gapMs)
            }
            closed.result().iterator
          }
      }
  }

  /** Column-name adapter for DataFrame callers. */
  def sessionizeStreamDF(df: DataFrame, tsCol: String, userCol: String,
                         watermarkDelay: String, gapSeconds: Long): Dataset[SessionOut] = {
    import df.sparkSession.implicits._
    sessionizeStream(
      df.selectExpr(s"CAST($userCol AS LONG) AS user_id",
          s"CAST($tsCol AS TIMESTAMP) AS ts")
        .withWatermark("ts", watermarkDelay)
        .as[SessionEvent],
      gapSeconds)
  }
}
