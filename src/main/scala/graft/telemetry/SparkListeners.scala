package graft.telemetry

import scala.collection.mutable

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.streaming.StreamingQueryListener
import org.apache.spark.sql.util.QueryExecutionListener

/** Engine-level execution metrics per completed query — the analog of
  * the reference's automatic collection around every event execution
  * (nexus/telemetry/logger.py:121-240, which wraps handlers with
  * timing/status capture so metrics never depend on handler
  * cooperation). On Spark the engine-level hook is the listener bus:
  * a [[QueryExecutionListener]] observes every DataFrame/Dataset
  * action, a [[StreamingQueryListener]] every micro-batch. */
final case class QueryMetrics(
    name: String,          // action name (count/collect/save/...) or stream name
    queryId: String,       // execution id / streaming (id, batchId)
    durationSec: Double,
    status: String,        // "completed" | "failed"
    error: Option[String],
    rowsRead: Long,        // sum of leaf scan output rows
    bytesRead: Long,       // sum of leaf scan file sizes (where exposed)
    rowsOut: Option[Long]) // root operator output rows, where exposed

/** Bridges Spark's listener buses into the Signals bus and the
  * MetricsPublisher family, so engine-level metrics flow through the
  * same pipes as the runner's own lifecycle metrics.
  *
  * Batch: every action emits signal `query_execution_end` and publishes
  * an [[EventMetrics]] (event name = `spark:<action>`). Streaming:
  * every micro-batch progress emits `streaming_query_progress` and
  * publishes `stream:<queryName>`; termination emits
  * `streaming_query_terminated` with the error, if any.
  *
  * Attach once per session; [[SparkTelemetryBridge.close]] detaches
  * both listeners (the spec attaches around a scope — leaked listeners
  * would double-count in shared sessions). Listener delivery is
  * asynchronous on Spark's bus thread, so observers polling a
  * publisher must allow for a small delay ([[BufferPublisher]] +
  * retry-loop in PublisherSpec). */
final class SparkTelemetryBridge private (
    spark: SparkSession,
    publisher: MetricsPublisher) extends AutoCloseable {

  private val collected = mutable.Buffer.empty[QueryMetrics]

  private def record(m: QueryMetrics): Unit = {
    collected.synchronized { collected += m }
    val now = System.currentTimeMillis()
    publisher.publish(EventMetrics(
      eventName = m.name,
      taskId = m.queryId,
      startMs = now - (m.durationSec * 1000).toLong,
      endMs = now,
      status = m.status,
      error = m.error,
      retryCount = 0))
  }

  /** Engine metrics collected so far (listener-sourced, no handler
    * cooperation) — the queryable counterpart of MetricsCollector. */
  def metrics: Seq[QueryMetrics] = collected.synchronized(collected.toSeq)

  /** Metrics as a DataFrame — engine telemetry lands in any sink like
    * any other table (same contract as MetricsCollector.toDF). */
  def toDF: org.apache.spark.sql.DataFrame = {
    val rows = metrics.map(m => (m.name, m.queryId, m.durationSec,
      m.status, m.error.orNull, m.rowsRead, m.bytesRead,
      m.rowsOut.map(java.lang.Long.valueOf).orNull))
    spark.createDataFrame(rows).toDF(
      "name", "query_id", "duration_sec", "status", "error",
      "rows_read", "bytes_read", "rows_out")
  }

  /** Flatten the executed plan through the adaptive wrappers: under AQE
    * the root is an AdaptiveSparkPlanExec LEAF whose real plan hangs off
    * `executedPlan`, and materialized stages hide behind QueryStageExec
    * leaves — `collectLeaves()` on the root would see only wrappers and
    * never reach a scan. */
  private def flatten(p: org.apache.spark.sql.execution.SparkPlan)
      : Seq[org.apache.spark.sql.execution.SparkPlan] = {
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    val children = p match {
      case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
      case q: QueryStageExec => Seq(q.plan)
      case _ => p.children
    }
    p +: children.flatMap(flatten)
  }

  private def scanTotals(qe: QueryExecution): (Long, Long, Option[Long]) = {
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    val nodes = flatten(qe.executedPlan)
    val scans = nodes.collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b
      case r: org.apache.spark.sql.execution.RowDataSourceScanExec => r
    }
    val rowsRead = scans.flatMap(_.metrics.get("numOutputRows"))
      .map(_.value).sum
    val bytesRead = scans.flatMap(l =>
      l.metrics.get("filesSize").orElse(l.metrics.get("bytesRead")))
      .map(_.value).sum
    val top = qe.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    val rowsOut = top.metrics.get("numOutputRows").map(_.value)
    (rowsRead, bytesRead, rowsOut)
  }

  private val batchListener = new QueryExecutionListener {
    override def onSuccess(
        funcName: String, qe: QueryExecution, durationNs: Long): Unit = {
      val (rowsRead, bytesRead, rowsOut) = scanTotals(qe)
      val m = QueryMetrics(s"spark:$funcName", qe.id.toString,
        durationNs / 1e9, "completed", None, rowsRead, bytesRead, rowsOut)
      Signals.emit("query_execution_end", Map(
        "event_name" -> m.name, "task_id" -> m.queryId,
        "duration_sec" -> m.durationSec, "rows_read" -> rowsRead,
        "bytes_read" -> bytesRead))
      record(m)
    }
    override def onFailure(
        funcName: String, qe: QueryExecution, error: Exception): Unit = {
      val m = QueryMetrics(s"spark:$funcName", qe.id.toString,
        0.0, "failed", Option(error).map(_.toString), 0L, 0L, None)
      Signals.emit("query_execution_end", Map(
        "event_name" -> m.name, "task_id" -> m.queryId,
        "error" -> m.error.getOrElse("")))
      record(m)
    }
  }

  private val streamListener = new StreamingQueryListener {
    override def onQueryStarted(
        e: StreamingQueryListener.QueryStartedEvent): Unit =
      Signals.emit("streaming_query_started", Map(
        "event_name" -> s"stream:${Option(e.name).getOrElse(e.id.toString)}",
        "task_id" -> e.id.toString))

    override def onQueryProgress(
        e: StreamingQueryListener.QueryProgressEvent): Unit = {
      val p = e.progress
      val name = s"stream:${Option(p.name).getOrElse(p.id.toString)}"
      val durSec = Option(p.durationMs.get("triggerExecution"))
        .map(_.longValue / 1000.0).getOrElse(0.0)
      // sinks that can't count report -1, not 0 — map that to None
      val m = QueryMetrics(name, s"${p.id}#${p.batchId}", durSec,
        "completed", None, p.numInputRows, 0L,
        Option(p.sink).map(_.numOutputRows).filter(_ >= 0))
      Signals.emit("streaming_query_progress", Map(
        "event_name" -> name, "task_id" -> m.queryId,
        "batch_id" -> p.batchId, "rows_in" -> p.numInputRows,
        "duration_sec" -> durSec))
      record(m)
    }

    override def onQueryTerminated(
        e: StreamingQueryListener.QueryTerminatedEvent): Unit =
      Signals.emit("streaming_query_terminated", Map(
        "task_id" -> e.id.toString,
        "error" -> e.exception.getOrElse("")))
  }

  private def attach(): Unit = {
    spark.listenerManager.register(batchListener)
    spark.streams.addListener(streamListener)
  }

  def close(): Unit = {
    spark.listenerManager.unregister(batchListener)
    spark.streams.removeListener(streamListener)
  }
}

object SparkTelemetryBridge {
  /** Attach both listeners, publishing every engine metric through
    * `publisher`. Close the returned bridge to detach. */
  def attach(spark: SparkSession,
      publisher: MetricsPublisher = new ConsolePublisher): SparkTelemetryBridge = {
    val b = new SparkTelemetryBridge(spark, publisher)
    b.attach()
    b
  }
}
