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

/** Streaming CUSUM drift alarms — the online twin of
  * [[graft.operators.TimeSeries.cusum]]. The batch prefix identity
  * S_i = P_i − min_{j≤i} P_j (P_0 = 0) makes the streaming state
  * TWO LONGS per key — the running prefix sum and its running
  * minimum — so a key's state never grows with its history: the ideal
  * `flatMapGroupsWithState` shape (a naive "replay the window" state
  * would buffer events forever).
  *
  * Ordering contract: events are processed in (event time, tie) order
  * WITHIN each micro-batch and in batch order across batches — the
  * online-CUSUM semantic. On an in-order source this is bit-identical
  * to the batch operator (spec-proven, including alarms whose
  * accumulation spans a batch boundary); an event arriving after a
  * later event's batch is folded in where it lands, the standard
  * online-monitoring trade (a drift alarm must not wait for
  * stragglers; re-run the batch operator for the forensic answer). */
/** Streaming twin of [[graft.operators.TimeSeries.rateLimit]] — the
  * live quota gate: per key, admit the first `maxPerWindow` events of
  * each tumbling event-time window, carrying TWO LONGS of state per
  * key (current window start, admitted count) no matter how long the
  * stream runs. Same admission law as the batch operator, so a
  * replayed/batch audit can re-derive every live decision. An event
  * arriving AFTER its window's state was advanced is dropped — the
  * conservative quota answer (never over-admit); under in-order
  * per-key delivery (the watermarked, event-time-sorted regime) that
  * branch never fires and stream ≡ batch exactly. */
object StatefulRateLimit {

  case class RateEvent(user_id: Long, ts: Timestamp, event_id: Long)
  case class RateState(windowStart: Long, admitted: Long)
  case class Admission(user_id: Long, event_id: Long,
                       window_start: Timestamp, admitted: Int)

  def rateLimitStream(events: Dataset[RateEvent], maxPerWindow: Int,
                      windowMs: Long): Dataset[Admission] = {
    import events.sparkSession.implicits._
    require(maxPerWindow >= 1, s"need maxPerWindow >= 1, got $maxPerWindow")
    require(windowMs > 0, s"need windowMs > 0, got $windowMs")
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[RateState, Admission](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (uid: Long, it: Iterator[RateEvent], state: GroupState[RateState]) =>
          var st = state.getOption.getOrElse(RateState(Long.MinValue, 0L))
          val out = Seq.newBuilder[Admission]
          it.toSeq.sortBy(e => (e.ts.getTime, e.event_id)).foreach { e =>
            val w = Math.floorDiv(e.ts.getTime, windowMs) * windowMs
            if (w > st.windowStart) st = RateState(w, 0L)
            val admit = w == st.windowStart && st.admitted < maxPerWindow
            if (admit) st = RateState(st.windowStart, st.admitted + 1)
            out += Admission(uid, e.event_id, new Timestamp(w),
              if (admit) 1 else 0)
          }
          state.update(st)
          out.result().iterator
      }
  }
}

object StatefulCusum {

  case class CusumEvent(user_id: Long, ts: Timestamp, event_id: Long, cents: Long)
  /** Running prefix sum and its minimum — min(0, min P_j) folded in
    * by starting minP at 0 (= P_0). */
  case class CusumState(p: Long, minP: Long)
  case class CusumAlarm(user_id: Long, event_id: Long, cusum: Long)

  def cusumStream(events: Dataset[CusumEvent], refCents: Long,
                  thresholdCents: Long): Dataset[CusumAlarm] = {
    import events.sparkSession.implicits._
    require(thresholdCents > 0, s"need thresholdCents > 0, got $thresholdCents")
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[CusumState, CusumAlarm](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (uid: Long, it: Iterator[CusumEvent], state: GroupState[CusumState]) =>
          var st = state.getOption.getOrElse(CusumState(0L, 0L))
          val out = Seq.newBuilder[CusumAlarm]
          it.toSeq.sortBy(e => (e.ts.getTime, e.event_id)).foreach { e =>
            val p = st.p + (e.cents - refCents)
            val minP = math.min(st.minP, p)
            st = CusumState(p, minP)
            // st.minP ≤ 0 always (starts at P_0 = 0), so S = p − minP
            val s = p - st.minP
            if (s >= thresholdCents) out += CusumAlarm(uid, e.event_id, s)
          }
          state.update(st)
          out.result().iterator
      }
  }
}
