package graft.telemetry

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession
import graft.core._

class PublisherSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("publishing collector streams metrics to composite targets") {
    val buf = new BufferPublisher
    val file = java.nio.file.Files.createTempFile("graft-metrics", ".jsonl")
    val pub = new CompositePublisher(Seq(
      buf,
      new JsonFilePublisher(file.toString),
      new MetricsPublisher { // failing target must not break the others
        def publish(m: EventMetrics): Unit = throw new RuntimeException("down")
      }))
    val collector = new PublishingCollector(pub)
    try {
      val reg = new EventRegistry
      reg.registerTransform("Ok")(_ => Seq(1).toDF("v"))
      reg.register("Boom") { _ => throw new RuntimeException("nope") }
      Pipeline.fromPointy("pub", "Ok -> Boom", reg).start(spark)

      assert(buf.published.size == 2)
      assert(buf.published.map(_.eventName) == Seq("Ok", "Boom"))
      assert(buf.published.last.status == "failed")

      val lines = java.nio.file.Files.readAllLines(file)
      assert(lines.size() == 2)
      assert(lines.get(1).contains("\"status\":\"failed\""))
      assert(lines.get(1).contains("\"event\":\"Boom\""))
    } finally collector.close()
  }

  test("prometheus publisher renders the text exposition format") {
    val pub = new PrometheusPublisher(buckets = Seq(0.1, 1.0))
    def m(name: String, status: String, durMs: Long, retries: Int) =
      EventMetrics(name, "t1", 1000, 1000 + durMs, status, None, retries)
    pub.publish(m("Fetch", "completed", 50, 0))    // <= 0.1
    pub.publish(m("Fetch", "completed", 500, 2))   // <= 1.0
    pub.publish(m("Fetch", "failed", 5000, 1))     // > all buckets
    pub.publish(m("Odd\"name\\x", "completed", 10, 0))
    val out = pub.render
    assert(out.contains("# HELP event_duration_seconds"))
    assert(out.contains("# TYPE event_duration_seconds histogram"))
    // cumulative buckets: 1 under 0.1, 2 under 1.0, 2 under +Inf
    assert(out.contains(
      """event_duration_seconds_bucket{event_name="Fetch",status="completed",le="0.1"} 1"""))
    assert(out.contains(
      """event_duration_seconds_bucket{event_name="Fetch",status="completed",le="1"} 2"""))
    assert(out.contains(
      """event_duration_seconds_bucket{event_name="Fetch",status="completed",le="+Inf"} 2"""))
    assert(out.contains(
      """event_duration_seconds_count{event_name="Fetch",status="failed"} 1"""))
    // retries accumulate across publishes
    assert(out.contains("""event_retries_total{event_name="Fetch"} 3"""))
    // label escaping per the exposition spec
    assert(out.contains("""event_name="Odd\"name\\x""""))
  }

  test("prometheus publisher serves GET /metrics") {
    val pub = new PrometheusPublisher()
    try {
      pub.publish(EventMetrics("E", "t", 0, 100, "completed", None, 0))
      val port = pub.serve()
      val body = graft.sources.HttpSource.fetchString(
        s"http://127.0.0.1:$port/metrics")
      assert(body.contains(
        """event_duration_seconds_count{event_name="E",status="completed"} 1"""))
    } finally pub.close()
  }

  test("bulk publisher posts NDJSON batches and flushes on close") {
    val received = scala.collection.mutable.Buffer.empty[String]
    val server = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/_bulk", (ex: com.sun.net.httpserver.HttpExchange) => {
      received.synchronized {
        received += new String(ex.getRequestBody.readAllBytes(), "UTF-8")
      }
      ex.sendResponseHeaders(200, -1); ex.close()
    })
    server.start()
    try {
      val url = s"http://127.0.0.1:${server.getAddress.getPort}/_bulk"
      val pub = new BulkHttpPublisher(url, index = "m", batchSize = 2)
      pub.publish(EventMetrics("A", "t1", 0, 100, "completed", None, 0))
      assert(pub.pendingCount == 1 && received.isEmpty) // below batch size
      pub.publish(EventMetrics("B", "t2", 0, 250, "failed", Some("x"), 2))
      assert(pub.pendingCount == 0 && received.size == 1) // batch fired
      val lines = received.head.trim.split("\n")
      assert(lines.length == 4) // action+doc per metric
      assert(lines(0) == """{"index":{"_index":"m"}}""")
      assert(lines(1).contains(""""event":"A"""") &&
        lines(1).contains(""""status":"completed""""))
      assert(lines(3).contains(""""error":"x"""") &&
        lines(3).contains(""""retries":2"""))
      pub.publish(EventMetrics("C", "t3", 0, 50, "completed", None, 0))
      pub.close() // flush-on-close delivers the partial batch
      assert(received.size == 2 && received(1).contains(""""event":"C""""))
    } finally server.stop(0)
  }

  private def awaitCond(timeoutMs: Long = 15000)(cond: => Boolean): Boolean = {
    val deadline = System.currentTimeMillis() + timeoutMs
    while (!cond && System.currentTimeMillis() < deadline) Thread.sleep(50)
    cond
  }

  test("spark listener bridge publishes engine metrics for a batch query") {
    val buf = new BufferPublisher
    val bridge = SparkTelemetryBridge.attach(spark, buf)
    try {
      val n = graft.Tables.load(spark, "/root/testdata/sf0.001", "region")
        .filter(org.apache.spark.sql.functions.col("r_regionkey") >= 0)
        .count()
      assert(n > 0)
      // listener delivery is async on the bus thread
      assert(awaitCond()(bridge.metrics.exists(_.name.startsWith("spark:"))),
        "no listener-sourced batch metric arrived")
      val m = bridge.metrics.find(m =>
        m.name.startsWith("spark:") && m.rowsRead >= n).get
      assert(m.status == "completed" && m.error.isEmpty)
      assert(m.durationSec > 0)
      assert(m.bytesRead > 0, "scan bytes not captured")
      // the same metric reached the publisher as an EventMetrics
      assert(awaitCond()(buf.published.exists(_.eventName == m.name)))
      // and the collected metrics sink as a DataFrame
      val mdf = bridge.toDF
      assert(mdf.columns.toSeq == Seq("name", "query_id", "duration_sec",
        "status", "error", "rows_read", "bytes_read", "rows_out"))
      assert(mdf.filter(org.apache.spark.sql.functions.col("rows_read") >= n)
        .count() >= 1)
    } finally bridge.close()
  }

  test("spark listener bridge publishes engine metrics per micro-batch") {
    val buf = new BufferPublisher
    val bridge = SparkTelemetryBridge.attach(spark, buf)
    val sink = java.nio.file.Files.createTempDirectory("graft-listener").toString
    try {
      val src = graft.streaming.StreamRunner
        .parquetStream(spark, "/root/testdata/sf0.001/region.parquet")
      val q = src.writeStream
        .queryName("listener_probe")
        .format("parquet")
        .option("path", s"$sink/out")
        .option("checkpointLocation", s"$sink/ckpt")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      assert(awaitCond()(bridge.metrics.exists(m =>
        m.name == "stream:listener_probe" && m.rowsRead > 0)),
        "no listener-sourced micro-batch metric arrived")
      val m = bridge.metrics
        .find(m => m.name == "stream:listener_probe" && m.rowsRead > 0).get
      assert(m.status == "completed")
      assert(m.queryId.contains("#")) // (stream id, batch id) identity
      assert(awaitCond()(buf.published.exists(
        _.eventName == "stream:listener_probe")))
    } finally bridge.close()
  }

  test("grafana-cloud publisher posts authed JSON per metric") {
    val seen = scala.collection.mutable.Buffer.empty[(String, String, String)]
    val server = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/api/v1/metrics",
      (ex: com.sun.net.httpserver.HttpExchange) => {
        seen.synchronized {
          seen += ((ex.getRequestURI.getPath,
            ex.getRequestHeaders.getFirst("Authorization"),
            new String(ex.getRequestBody.readAllBytes(), "UTF-8")))
        }
        ex.sendResponseHeaders(200, -1); ex.close()
      })
    server.start()
    try {
      val base =
        s"http://127.0.0.1:${server.getAddress.getPort}/api/v1/metrics"
      val pub = new GrafanaCloudPublisher(base, "sekret", "acme")
      pub.publish(EventMetrics("Fetch", "t1", 0, 120, "completed", None, 1))
      assert(seen.size == 1 && pub.failureCount == 0)
      val (path, auth, body) = seen.head
      assert(path == "/api/v1/metrics/acme/events")
      assert(auth == "Bearer sekret")
      assert(body.contains("\"event\":\"Fetch\"") &&
        body.contains("\"retries\":1"))
      // failures are swallowed and counted, never thrown
      val dead = new GrafanaCloudPublisher("http://127.0.0.1:1", "k", "o")
      dead.publish(EventMetrics("X", "t", 0, 1, "completed", None, 0))
      assert(dead.failureCount == 1)
    } finally server.stop(0)
  }

  test("bulk publisher swallows transport failures") {
    // nothing listens on this port: publish/flush must not throw
    val pub = new BulkHttpPublisher("http://127.0.0.1:1/_bulk", batchSize = 1)
    pub.publish(EventMetrics("A", "t", 0, 100, "completed", None, 0))
    assert(!pub.flush() || pub.pendingCount == 0)
    pub.close()
  }
}
