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

  final case class TypedEvent(user_id: Long, ts_us: Long, event_type: String)
  /** Per-user funnel progress: `times(k)` is the step-k conversion µs
    * (-1 while unreached). Emitted once, when the user's state times
    * out past the watermark. */
  final case class FunnelProgress(user_id: Long, times: Seq[Long])

  /** Streaming ordered funnel — the per-key state-machine formulation
    * of [[graft.operators.Behavior.funnel]]: step k converts at the
    * first event matching `steps(k)` STRICTLY AFTER the step-(k-1)
    * conversion. Within a micro-batch events process in ts order, so
    * the state machine reproduces the batch mins exactly; across
    * batches the watermark gives the usual streaming guarantee (an
    * event older than a batch it arrives after is a late arrival —
    * same contract as every streaming funnel). One conversion-time
    * vector per ACTIVE user is the whole state: O(users × depth),
    * partitioned by the grouping key.
    *
    * Emission is timeout-driven (event-time): a user's vector is final
    * only once the watermark passes their last activity + `quietUs`.
    * The aq27-style per-step aggregate happens downstream in batch —
    * streaming emits per-user facts, the cheap summary runs on read.
    */
  def funnelStream(
      events: Dataset[TypedEvent],
      steps: Seq[String],
      quietUs: Long = 3600L * 1000000L): Dataset[FunnelProgress] = {
    import events.sparkSession.implicits._

    def update(
        userId: Long,
        rows: Iterator[TypedEvent],
        state: GroupState[FunnelProgress]): Iterator[FunnelProgress] = {
      if (state.hasTimedOut) {
        val s = state.get
        state.remove()
        return Iterator.single(s)
      }
      val times = state.getOption
        .map(_.times.toArray)
        .getOrElse(Array.fill(steps.length)(-1L))
      var lastTs = -1L
      rows.toSeq.sortBy(_.ts_us).foreach { e =>
        lastTs = math.max(lastTs, e.ts_us)
        var k = 0
        while (k < steps.length) {
          // ascending k: one event can never satisfy two steps (the
          // strictly-after test fails against its own timestamp)
          if (times(k) < 0 && e.event_type == steps(k) &&
            (k == 0 || (times(k - 1) >= 0 && e.ts_us > times(k - 1))))
            times(k) = e.ts_us
          k += 1
        }
      }
      state.update(FunnelProgress(userId, times.toSeq))
      if (lastTs >= 0) state.setTimeoutTimestamp((lastTs + quietUs) / 1000)
      Iterator.empty
    }

    events
      .withColumn("ts", timestamp_micros(col("ts_us")))
      .withWatermark("ts", "30 minutes")
      .as[TypedEvent]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(update)
  }

  final case class AttrEvent(user_id: Long, ts_us: Long, event_id: Long,
      event_type: String, value: Double)
  /** One attributed conversion fact: `lag_us = -1` marks the
    * unattributed arm (no touch inside the lookback window). */
  final case class Attribution(user_id: Long, ts_us: Long, channel: String,
      value: Double, lag_us: Long)
  /** Streaming-attribution state: the user's most recent touch. */
  final case class TouchState(touch_ts: Long, touch_type: String)

  /** Streaming last-touch attribution — the per-key state-machine
    * formulation of [[graft.operators.Behavior.lastTouchAttribution]]:
    * state is ONE record per active user (their most recent touch), a
    * conversion emits its attribution fact immediately, and the
    * channel summary aggregates the facts downstream in batch. Within
    * a micro-batch events fold in `(ts, id)` order, so the
    * strictly-preceding contract matches the batch window exactly;
    * across batches the state carries the last touch forward.
    *
    * State is bounded two ways: O(active users) × one small record,
    * AND an event-time timeout at `quietUs` past the user's last
    * activity. Requiring `quietUs >= lookbackUs` makes the timeout
    * SEMANTICS-FREE: a state old enough to drop is outside any future
    * conversion's lookback window by the watermark guarantee, so
    * eviction can never change an attribution. */
  def attributionStream(
      events: Dataset[AttrEvent],
      conversionType: String,
      touchTypes: Set[String],
      lookbackUs: Long,
      quietUs: Long): Dataset[Attribution] = {
    require(quietUs >= lookbackUs,
      "quietUs must cover the lookback window (eviction stays semantics-free)")
    import events.sparkSession.implicits._

    def update(
        userId: Long,
        rows: Iterator[AttrEvent],
        state: GroupState[TouchState]): Iterator[Attribution] = {
      if (state.hasTimedOut) { state.remove(); return Iterator.empty }
      var touch = state.getOption.orNull
      val out = scala.collection.mutable.ArrayBuffer.empty[Attribution]
      var lastTs = -1L
      rows.toSeq.sortBy(e => (e.ts_us, e.event_id)).foreach { e =>
        if (e.ts_us > lastTs) lastTs = e.ts_us
        if (e.event_type == conversionType) {
          if (touch != null && touch.touch_ts >= e.ts_us - lookbackUs)
            out += Attribution(userId, e.ts_us, touch.touch_type, e.value,
              e.ts_us - touch.touch_ts)
          else
            out += Attribution(userId, e.ts_us, "unattributed", e.value, -1L)
        }
        if (touchTypes.contains(e.event_type))
          touch = TouchState(e.ts_us, e.event_type)
      }
      if (touch != null) state.update(touch)
      if (lastTs >= 0) state.setTimeoutTimestamp((lastTs + quietUs) / 1000)
      out.iterator
    }

    events
      .withColumn("ts", timestamp_micros(col("ts_us")))
      .withWatermark("ts", "30 minutes")
      .as[AttrEvent]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(update)
  }
}
