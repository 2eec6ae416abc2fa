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

/** One JSON rendering of EventMetrics shared by every JSON-speaking
  * publisher (file, bulk-NDJSON, Grafana) — a field added to
  * EventMetrics lands in all sinks at once instead of silently
  * diverging across hand-rolled copies. */
private[telemetry] object MetricsJson {
  def esc(s: String): String =
    s.flatMap { case '"' => "\\\""; case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"; case c => c.toString }

  def render(m: EventMetrics): String =
    s"""{"event":"${esc(m.eventName)}","task_id":"${esc(m.taskId)}",""" +
      s""""status":"${m.status}","duration_sec":${m.durationSec},""" +
      s""""start_ms":${m.startMs},"retries":${m.retryCount}""" +
      m.error.map(e => s""","error":"${esc(e)}"""").getOrElse("") + "}"
}

final class ConsolePublisher extends MetricsPublisher {
  def publish(m: EventMetrics): Unit =
    println(s"[metrics] ${m.eventName} ${m.status} ${m.durationSec}s " +
      s"retries=${m.retryCount}${m.error.map(e => s" error=$e").getOrElse("")}")
}

/** Append-only JSONL file — the shape a log shipper would tail. */
final class JsonFilePublisher(path: String) extends MetricsPublisher {
  def publish(m: EventMetrics): Unit = synchronized {
    java.nio.file.Files.writeString(java.nio.file.Paths.get(path),
      MetricsJson.render(m) + "\n",
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

/** Prometheus publisher (nexus/telemetry/publisher.py
  * PrometheusPublisher): the same two instruments — an
  * `event_duration_seconds` histogram labeled (event_name, status) and
  * an `event_retries_total` counter labeled (event_name) — rendered in
  * the text exposition format and servable from a scrape endpoint.
  * No client library in the image, so the registry is implemented
  * directly: cumulative histogram buckets, `+Inf` bound, label-value
  * escaping per the exposition spec. `render` is pure for tests and
  * file export; `serve` binds GET /metrics on the JDK HttpServer. */
final class PrometheusPublisher(
    buckets: Seq[Double] = Seq(0.005, 0.01, 0.025, 0.05, 0.1, 0.25, 0.5,
      1.0, 2.5, 5.0, 10.0)) extends MetricsPublisher with AutoCloseable {

  private val sorted = buckets.sorted
  // (event, status) -> (per-bucket counts, count, sum)
  private val durations = scala.collection.mutable.LinkedHashMap
    .empty[(String, String), (Array[Long], Long, Double)]
  private val retries =
    scala.collection.mutable.LinkedHashMap.empty[String, Long]
  private var server: Option[com.sun.net.httpserver.HttpServer] = None

  def publish(m: EventMetrics): Unit = synchronized {
    val key = (m.eventName, m.status)
    val (bs, n, s) = durations.getOrElseUpdate(key,
      (new Array[Long](sorted.size), 0L, 0.0))
    sorted.indices.foreach(i => if (m.durationSec <= sorted(i)) bs(i) += 1)
    durations(key) = (bs, n + 1, s + m.durationSec)
    if (m.retryCount > 0)
      retries(m.eventName) = retries.getOrElse(m.eventName, 0L) + m.retryCount
  }

  private def esc(v: String): String = v.flatMap {
    case '\\' => "\\\\"; case '"' => "\\\""; case '\n' => "\\n"
    case c => c.toString
  }
  private def num(d: Double): String =
    if (d == d.floor && !d.isInfinite) d.toLong.toString else d.toString

  /** Text exposition format (the body a Prometheus scrape reads). */
  def render: String = synchronized {
    val sb = new StringBuilder
    sb.append("# HELP event_duration_seconds Duration of event execution\n")
    sb.append("# TYPE event_duration_seconds histogram\n")
    durations.foreach { case ((event, status), (bs, n, sum)) =>
      val base = s"""event_name="${esc(event)}",status="${esc(status)}""""
      sorted.indices.foreach { i =>
        sb.append(s"""event_duration_seconds_bucket{$base,le="${num(sorted(i))}"} ${bs(i)}\n""")
      }
      sb.append(s"""event_duration_seconds_bucket{$base,le="+Inf"} $n\n""")
      sb.append(s"""event_duration_seconds_sum{$base} $sum\n""")
      sb.append(s"""event_duration_seconds_count{$base} $n\n""")
    }
    sb.append("# HELP event_retries_total Number of event retries\n")
    sb.append("# TYPE event_retries_total counter\n")
    retries.foreach { case (event, n) =>
      sb.append(s"""event_retries_total{event_name="${esc(event)}"} $n\n""")
    }
    sb.toString
  }

  /** Bind a scrape endpoint; returns the bound port (0 = ephemeral). */
  def serve(port: Int = 0): Int = synchronized {
    val s = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", port), 0)
    s.createContext("/metrics", (ex: com.sun.net.httpserver.HttpExchange) => {
      val body = render.getBytes("UTF-8")
      ex.getResponseHeaders.set("Content-Type",
        "text/plain; version=0.0.4; charset=utf-8")
      ex.sendResponseHeaders(200, body.length)
      ex.getResponseBody.write(body)
      ex.close()
    })
    s.start()
    server = Some(s)
    s.getAddress.getPort
  }

  def close(): Unit = synchronized { server.foreach(_.stop(0)); server = None }
}

/** Elasticsearch-style bulk publisher (nexus/telemetry/publisher.py
  * ElasticsearchPublisher): metrics accumulate into an NDJSON bulk body
  * — an `{"index":{"_index":...}}` action line followed by the document
  * — and POST to the endpoint once `batchSize` is reached (plus an
  * explicit `flush`, and flush-on-close). Transport failures are
  * swallowed after `flush` returns false: telemetry must never take
  * down the pipeline (same isolation contract as CompositePublisher).
  */
final class BulkHttpPublisher(
    endpoint: String,
    index: String = "graft-metrics",
    batchSize: Int = 50) extends MetricsPublisher with AutoCloseable {
  require(batchSize > 0, "batchSize must be positive")
  private val pending = scala.collection.mutable.Buffer.empty[String]

  // one client for the publisher's lifetime — HttpClient pools
  // connections; building one per flush leaked a thread pool per call
  private lazy val client = java.net.http.HttpClient.newHttpClient()

  def publish(m: EventMetrics): Unit = {
    val toSend = synchronized {
      pending +=
        s"""{"index":{"_index":"${MetricsJson.esc(index)}"}}\n${MetricsJson.render(m)}"""
      if (pending.size >= batchSize) drain() else None
    }
    toSend.foreach(post)
  }

  /** POST the pending batch; true when the endpoint accepted it. The
    * batch is dropped either way — a lossy-but-bounded buffer, never an
    * unbounded retry queue inside a worker. The buffer is snapshot-and-
    * cleared UNDER the monitor but the POST runs OUTSIDE it, so a slow
    * endpoint (10s timeout) never stalls concurrent publishers or a
    * CompositePublisher fan-out on the hot path. */
  def flush(): Boolean = synchronized(drain()) match {
    case None       => true
    case Some(body) => post(body)
  }

  /** Must hold the monitor. Snapshot the pending batch and clear it. */
  private def drain(): Option[String] =
    if (pending.isEmpty) None
    else {
      val body = pending.mkString("\n") + "\n"
      pending.clear()
      Some(body)
    }

  private def post(body: String): Boolean =
    try {
      val req = java.net.http.HttpRequest
        .newBuilder(java.net.URI.create(endpoint))
        .timeout(java.time.Duration.ofSeconds(10))
        .header("Content-Type", "application/x-ndjson")
        .POST(java.net.http.HttpRequest.BodyPublishers.ofString(body))
        .build()
      val resp = client.send(req,
        java.net.http.HttpResponse.BodyHandlers.discarding())
      resp.statusCode() >= 200 && resp.statusCode() < 300
    } catch { case _: Throwable => false }

  def pendingCount: Int = synchronized(pending.size)
  def close(): Unit = flush()
}

/** Grafana-Cloud-style publisher (nexus/telemetry/publisher.py
  * GrafanaCloudPublisher:183-227): one authenticated JSON POST per
  * metric to `{baseUrl}/{orgSlug}/events` with a Bearer token — the
  * reference session's `Authorization` header and URL layout, on the
  * shared JDK HttpClient. Failures are swallowed and counted
  * (`failureCount`): telemetry must never take down the pipeline. In
  * production `baseUrl` is
  * `https://grafana-<region>.grafana.net/api/v1/metrics`; specs point
  * it at a local stub. */
final class GrafanaCloudPublisher(
    baseUrl: String,
    apiKey: String,
    orgSlug: String) extends MetricsPublisher {
  private lazy val client = java.net.http.HttpClient.newHttpClient()
  private val failures = new java.util.concurrent.atomic.AtomicInteger(0)

  def failureCount: Int = failures.get()

  def publish(m: EventMetrics): Unit = {
    val body = MetricsJson.render(m)
    try {
      val req = java.net.http.HttpRequest
        .newBuilder(java.net.URI.create(s"$baseUrl/$orgSlug/events"))
        .timeout(java.time.Duration.ofSeconds(10))
        .header("Authorization", s"Bearer $apiKey")
        .header("Content-Type", "application/json")
        .POST(java.net.http.HttpRequest.BodyPublishers.ofString(body))
        .build()
      val resp = client.send(req,
        java.net.http.HttpResponse.BodyHandlers.discarding())
      if (resp.statusCode() < 200 || resp.statusCode() >= 300)
        failures.incrementAndGet()
    } catch { case _: Throwable => failures.incrementAndGet() }
  }
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
