package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom stateful streaming operators via the arbitrary-state API
  * (KeyValueGroupedDataset.flatMapGroupsWithState) — the piece of the
  * stream-processor surface that windowed aggregation can't express:
  * per-key state machines with explicit timeout-driven emission.
  *
  * `sessionizeStream` maintains one open session per user and emits a
  * SessionSummary when the gap timeout expires (event-time timeout,
  * watermark-driven). State is O(active users), partitioned by the
  * grouping key — the standard scalable shape; nothing accumulates
  * per-event.
  */
object StatefulOps {

  final case class EventIn(user_id: Long, ts_us: Long, value: Double)
  final case class SessionState(
      start_us: Long, last_us: Long, n: Long, total: Double)
  final case class SessionSummary(
      user_id: Long, start_us: Long, end_us: Long, n_events: Long,
      total_value: Double)

  /** Batch-mode reference implementation (same semantics, pure SQL) —
    * used by specs to pin the streaming operator's output. */
  def sessionizeBatch(events: DataFrame, gapUs: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy("ts_us")
    val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events
      .withColumn("new_session",
        when(col("ts_us") - lag("ts_us", 1).over(w) > gapUs, 1)
          .when(lag("ts_us", 1).over(w).isNull, 1).otherwise(0))
      .withColumn("session_id", sum("new_session").over(run))
      .groupBy("user_id", "session_id")
      .agg(min("ts_us").as("start_us"), max("ts_us").as("end_us"),
        count(lit(1)).as("n_events"),
        sum("value").as("total_value"))
      .drop("session_id")
  }

  /** Streaming sessionization with event-time timeouts. Emits a session
    * once the watermark passes its last event + gap. */
  def sessionizeStream(
      events: Dataset[EventIn], gapUs: Long): Dataset[SessionSummary] = {
    import events.sparkSession.implicits._

    def update(
        userId: Long,
        rows: Iterator[EventIn],
        state: GroupState[SessionState]): Iterator[SessionSummary] = {
      val sorted = rows.toSeq.sortBy(_.ts_us)
      var out = List.empty[SessionSummary]

      if (state.hasTimedOut) {
        val s = state.get
        out ::= SessionSummary(userId, s.start_us, s.last_us, s.n, s.total)
        state.remove()
      }

      var cur = state.getOption
      sorted.foreach { e =>
        cur match {
          case Some(s) if e.ts_us - s.last_us <= gapUs =>
            cur = Some(SessionState(s.start_us, e.ts_us, s.n + 1,
              s.total + e.value))
          case Some(s) =>
            out ::= SessionSummary(userId, s.start_us, s.last_us, s.n, s.total)
            cur = Some(SessionState(e.ts_us, e.ts_us, 1, e.value))
          case None =>
            cur = Some(SessionState(e.ts_us, e.ts_us, 1, e.value))
        }
      }
      cur.foreach { s =>
        state.update(s)
        // event-time timeout: fire when watermark passes last event + gap
        state.setTimeoutTimestamp((s.last_us + gapUs) / 1000)
      }
      out.reverseIterator
    }

    events
      .withColumn("ts", timestamp_micros(col("ts_us")))
      .withWatermark("ts", "30 minutes")
      .as[EventIn]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(update)
  }
}
