package graft.telemetry

import scala.collection.concurrent.TrieMap
import scala.collection.mutable

/** Lifecycle signal bus — the analog of the reference's SoftSignal
  * observer framework (nexus/signal/signals.py:16-285) with the same
  * signal names. Listeners are plain functions; `connect` returns a
  * handle for disconnect. Thread-safe: foreachBatch workers emit from
  * executor-side driver threads.
  */
object Signals {
  type Payload = Map[String, Any]
  type Listener = Payload => Unit

  /** The reference's named lifecycle signals
    * (nexus/signal/signals.py:213-285). */
  val names: Seq[String] = Seq(
    "pipeline_pre_init", "pipeline_post_init", "pipeline_execution_start",
    "pipeline_execution_end", "pipeline_stop", "pipeline_shutdown",
    "event_init", "event_execution_init", "event_execution_start",
    "event_execution_end", "event_execution_retry",
    "event_execution_retry_done", "event_execution_cancelled",
    "event_execution_aborted")

  private val listeners =
    TrieMap.empty[String, mutable.Buffer[(Long, Listener)]]
  private val counter = new java.util.concurrent.atomic.AtomicLong()

  def connect(signal: String, fn: Listener): Long = {
    val id = counter.incrementAndGet()
    listeners.getOrElseUpdate(signal, mutable.Buffer.empty).synchronized {
      listeners(signal) += ((id, fn))
    }
    id
  }

  def disconnect(signal: String, id: Long): Unit =
    listeners.get(signal).foreach(b => b.synchronized {
      val i = b.indexWhere(_._1 == id); if (i >= 0) b.remove(i)
    })

  def emit(signal: String, payload: Payload): Unit =
    listeners.get(signal).foreach(b => b.synchronized(b.toList).foreach {
      case (_, fn) => try fn(payload) catch { case _: Throwable => () }
    })
}

/** Per-event execution metrics — the EventMetrics dataclass
  * (nexus/telemetry/logger.py:22-60). */
final case class EventMetrics(
    eventName: String,
    taskId: String,
    startMs: Long,
    endMs: Long,
    status: String, // "completed" | "failed"
    error: Option[String],
    retryCount: Int) {
  def durationSec: Double = (endMs - startMs) / 1000.0
}

/** Collects EventMetrics off the signal bus and answers the reference's
  * telemetry rollups (nexus/telemetry/reporter.py:38-60): failed events,
  * slow events, retry stats.
  */
final class MetricsCollector {
  private val buf = mutable.Buffer.empty[EventMetrics]
  private val starts = TrieMap.empty[String, Long]
  private val retries = TrieMap.empty[String, Int]

  private val h1 = Signals.connect("event_execution_start", { p =>
    starts.put(p("task_id").toString, System.currentTimeMillis())
  })
  private val h2 = Signals.connect("event_execution_retry", { p =>
    retries.updateWith(p("task_id").toString)(c => Some(c.getOrElse(0) + 1))
  })
  private val h3 = Signals.connect("event_execution_end", { p =>
    val tid = p("task_id").toString
    val err = p.get("error").collect { case s: String => s }
    buf.synchronized {
      buf += EventMetrics(
        eventName = p("event_name").toString,
        taskId = tid,
        startMs = starts.getOrElse(tid, System.currentTimeMillis()),
        endMs = System.currentTimeMillis(),
        status = if (err.isDefined) "failed" else "completed",
        error = err,
        retryCount = retries.getOrElse(tid, 0))
    }
  })

  def metrics: Seq[EventMetrics] = buf.synchronized(buf.toSeq)
  def failedEvents: Seq[EventMetrics] = metrics.filter(_.status == "failed")
  def slowEvents(thresholdSec: Double): Seq[EventMetrics] =
    metrics.filter(_.durationSec > thresholdSec)
  def totalRetries: Int = metrics.map(_.retryCount).sum

  /** Metrics as a Dataset — the reference's telemetry rollups
    * (failed/slow/retry stats) become plain DataFrame queries, and the
    * collection writes to any sink like any other table. */
  def toDF(spark: org.apache.spark.sql.SparkSession)
      : org.apache.spark.sql.DataFrame = {
    val rows = metrics.map(m => (m.eventName, m.taskId, m.startMs, m.endMs,
      m.durationSec, m.status, m.error.orNull, m.retryCount))
    spark.createDataFrame(rows).toDF(
      "event_name", "task_id", "start_ms", "end_ms", "duration_sec",
      "status", "error", "retry_count")
  }

  def close(): Unit = {
    Signals.disconnect("event_execution_start", h1)
    Signals.disconnect("event_execution_retry", h2)
    Signals.disconnect("event_execution_end", h3)
  }
}

/** Metrics publishers — the pluggable publisher surface
  * (nexus/telemetry/publisher.py: Elasticsearch / Prometheus / Grafana
  * / Composite). This environment has zero egress, so the concrete
  * transports are local (console, JSONL file, in-memory buffer); a
  * network publisher implements the same one-method trait. Composite
  * fans out and isolates per-publisher failures, like the reference.
  */
trait MetricsPublisher {
  def publish(m: EventMetrics): Unit
}

final class ConsolePublisher extends MetricsPublisher {
  def publish(m: EventMetrics): Unit =
    println(s"[metrics] ${m.eventName} ${m.status} ${m.durationSec}s " +
      s"retries=${m.retryCount}${m.error.map(e => s" error=$e").getOrElse("")}")
}

/** Append-only JSONL file — the shape a log shipper would tail. */
final class JsonFilePublisher(path: String) extends MetricsPublisher {
  private def esc(s: String) =
    s.flatMap { case '"' => "\\\""; case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"; case c => c.toString }
  def publish(m: EventMetrics): Unit = synchronized {
    val line =
      s"""{"event":"${esc(m.eventName)}","task_id":"${esc(m.taskId)}",""" +
        s""""status":"${m.status}","duration_sec":${m.durationSec},""" +
        s""""retries":${m.retryCount}""" +
        m.error.map(e => s""","error":"${esc(e)}"""").getOrElse("") + "}\n"
    java.nio.file.Files.writeString(java.nio.file.Paths.get(path), line,
      java.nio.file.StandardOpenOption.CREATE,
      java.nio.file.StandardOpenOption.APPEND)
  }
}

final class BufferPublisher extends MetricsPublisher {
  private val buf = scala.collection.mutable.Buffer.empty[EventMetrics]
  def publish(m: EventMetrics): Unit = synchronized { buf += m }
  def published: Seq[EventMetrics] = synchronized(buf.toSeq)
}

/** Fan-out with per-target failure isolation
  * (nexus/telemetry/publisher.py CompositePublisher). */
final class CompositePublisher(targets: Seq[MetricsPublisher])
    extends MetricsPublisher {
  def publish(m: EventMetrics): Unit =
    targets.foreach(t => try t.publish(m) catch { case _: Throwable => () })
}

/** Bridges the signal bus to publishers: every completed event metric is
  * published as it happens. */
final class PublishingCollector(publisher: MetricsPublisher)
    extends AutoCloseable {
  private val inner = new MetricsCollector
  private val seen = new java.util.concurrent.atomic.AtomicInteger(0)
  private val h = Signals.connect("event_execution_end", { _ =>
    val ms = inner.metrics
    var i = seen.get()
    while (i < ms.size) { publisher.publish(ms(i)); i += 1 }
    seen.set(ms.size)
  })
  def metrics: Seq[EventMetrics] = inner.metrics
  def close(): Unit = { Signals.disconnect("event_execution_end", h); inner.close() }
}
