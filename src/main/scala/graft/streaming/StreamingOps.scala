package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming analogues of the batch training-data operators: exact dedup and
  * sessionization over unbounded inputs. Both are bounded-state by
  * construction (watermark evicts dedup keys; event-time timeout closes
  * sessions) — the two things that make a streaming operator survive an
  * unbounded 100 TB/day feed. */
object StreamingOps {

  /** Streaming exact dedup: first occurrence of each normalized-text
    * fingerprint within the watermark horizon survives; later duplicates are
    * dropped. `dropDuplicatesWithinWatermark` keys state by fingerprint and
    * EVICTS entries older than the watermark — state stays
    * O(docs per horizon), not O(stream). The fingerprint is the same
    * md5 as batch `Dedup.exactGroups`, so batch and stream agree. */
  def dedupStream(docs: DataFrame, tsCol: String = "event_ts",
                  textCol: String = "text", horizon: String = "1 hour"): DataFrame =
    docs.withColumn("fingerprint", graft.ops.TextStats.fingerprint(col(textCol)))
      .withWatermark(tsCol, horizon)
      .dropDuplicatesWithinWatermark("fingerprint")

  case class SessionOut(user_id: String, session_start: Timestamp,
                        session_end: Timestamp, n_events: Long)
  // public: the GroupState encoder's generated code constructs it reflectively
  case class SessionState(start: Long, last: Long, n: Long)

  /** Streaming sessionization (the unbounded analogue of batch q10): events
    * grouped per user; a session closes when no event arrives within
    * `gapSec` of the last one, enforced by an EVENT-TIME timeout so state is
    * evicted by the watermark clock, not wall time. Emits one row per closed
    * session (Append semantics via flatMapGroupsWithState). */
  def sessionizeStream(events: Dataset[(String, Timestamp)], gapSec: Long = 1800,
                       watermark: String = "1 hour"): Dataset[SessionOut] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.toDF("user_id", "ts")
      .withWatermark("ts", watermark)
      .as[(String, Timestamp)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (user: String, rows: Iterator[(String, Timestamp)], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            // watermark passed last+gap: the open session is closed and emitted
            val s = state.get
            state.remove()
            Iterator.single(SessionOut(user, new Timestamp(s.start), new Timestamp(s.last), s.n))
          } else {
            val ts = rows.map(_._2.getTime).toArray.sorted
            var closed = List.empty[SessionOut]
            var cur = state.getOption
            ts.foreach { t =>
              cur match {
                case Some(s) if t - s.last <= gapSec * 1000 =>
                  cur = Some(SessionState(s.start, math.max(s.last, t), s.n + 1))
                case Some(s) =>
                  closed ::= SessionOut(user, new Timestamp(s.start), new Timestamp(s.last), s.n)
                  cur = Some(SessionState(t, t, 1))
                case None =>
                  cur = Some(SessionState(t, t, 1))
              }
            }
            cur.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s.last + gapSec * 1000)
            }
            closed.reverseIterator
          }
      }
  }
}
