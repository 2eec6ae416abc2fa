package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestSession
import graft.core._

class StreamingSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  val sf = "/root/testdata/sf0.001"

  test("batch chunking: range(10) size 3 -> [3,3,3,1] (reference semantics)") {
    val batches = BatchProcessors.listBatch((0 until 10).toSeq, 3).toSeq
    assert(batches.map(_.toList) ==
      Seq(List(0, 1, 2), List(3, 4, 5), List(6, 7, 8), List(9)))
  }

  test("byte chunks: fixed-size slices of a stream") {
    val in = new java.io.ByteArrayInputStream("abcdefghijk".getBytes)
    val chunks = BatchProcessors.byteChunks(in, 5).map(new String(_)).toSeq
    assert(chunks == Seq("abcde", "fghij", "k"))
  }

  test("BatchPipeline round-robin zips fields that exhaust independently") {
    val reg = new EventRegistry
    val seen = scala.collection.mutable.Buffer.empty[(Any, Any)]
    reg.register("Consume") { ctx =>
      seen += ((ctx.inputs.get("xs"), ctx.inputs.get("ys")))
      (true, ctx.spark.emptyDataFrame)
    }
    val bp = new BatchPipeline(() => Pipeline.fromPointy("bt", "Consume", reg,
      fields = Seq(
        InputField("xs", batchSize = Some(2)),
        InputField("ys", batchSize = Some(3)))))
    val out = bp.execute(spark, Map(
      "xs" -> Seq(1, 2, 3, 4, 5, 6), "ys" -> Seq("a", "b", "c", "d")))
    // xs → 3 batches of 2; ys → 2 batches of 3; round-robin: 3 tuples,
    // ys absent in the 3rd (None fill semantics)
    assert(out.metrics.total == 3)
    assert(out.metrics.succeeded == 3)
    assert(seen.size == 3)
    assert(seen(0) == (Some(Seq(1, 2)), Some(Seq("a", "b", "c"))))
    assert(seen(1) == (Some(Seq(3, 4)), Some(Seq("d"))))
    assert(seen(2) == (Some(Seq(5, 6)), None))
  }

  test("BatchPipeline with no batched fields runs the template once") {
    val reg = new EventRegistry
    reg.registerTransform("One")(_ => Seq(1).toDF("v"))
    val bp = new BatchPipeline(() => Pipeline.fromPointy("bt1", "One", reg))
    val out = bp.execute(spark)
    assert(out.metrics.total == 1 && out.metrics.successRate == 1.0)
  }

  test("windowed agg over a stream equals the batch aggregation") {
    val stream = StreamRunner
      .parquetStream(spark, s"$sf/events.parquet")
    val agg = StreamRunner.windowedAgg(stream, "ts", "1 hour", "1 hour", None,
      Seq("event_type"), Seq(count(lit(1)).as("n")))
    val qn = s"win_${System.nanoTime()}"
    val q = agg.writeStream.outputMode("complete").format("memory")
      .queryName(qn)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination()
    val streamed = spark.table(qn)
      .select(col("window.start").as("h"), col("event_type"), col("n"))
    val batch = graft.Tables.load(spark, sf, "events")
      .groupBy(date_trunc("hour", col("ts")).as("h"), col("event_type"))
      .agg(count(lit(1)).as("n"))
    assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty)
  }

  test("session windows produce gap-separated sessions") {
    val rows = Seq(
      (1L, "2024-01-01 00:00:00"), (1L, "2024-01-01 00:10:00"),
      (1L, "2024-01-01 02:00:00"), (2L, "2024-01-01 00:00:00"))
      .toDF("user_id", "s").withColumn("ts", col("s").cast("timestamp"))
    val stream = {
      // memory-source-free path: run session_window in batch mode (the
      // expression works identically; stateful eviction is the streaming
      // difference, not the window assignment)
      rows.groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
        .agg(count(lit(1)).as("n"))
    }
    val out = stream.select("user_id", "n").orderBy("user_id", "n").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(out == Seq((1L, 1L), (1L, 2L), (2L, 1L)))
  }

  test("foreachBatch runs the pipeline per micro-batch with batch input") {
    val reg = new EventRegistry
    val batchCounts = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    reg.register("PerBatch") { ctx =>
      val df = ctx.input[org.apache.spark.sql.DataFrame]("batch")
      batchCounts.add(df.count())
      (true, df)
    }
    val tmp = java.nio.file.Files.createTempDirectory("graft-ckpt").toString
    val stream = StreamRunner.parquetStream(spark, s"$sf/events.parquet")
    val q = StreamRunner.runPipelinePerBatch(stream,
      () => Pipeline.fromPointy("sb", "PerBatch", reg), tmp)
    q.awaitTermination()
    val total = batchCounts.toArray(Array.empty[java.lang.Long]).map(_.toLong).sum
    assert(total == graft.Tables.load(spark, sf, "events").count())
  }

  test("metrics collector sees event lifecycle signals incl. retries") {
    val collector = new graft.telemetry.MetricsCollector
    try {
      val reg = new EventRegistry
      var calls = 0
      reg.register("Shaky", retry = Some(RetryPolicy(maxAttempts = 3, backoffFactor = 0))) { ctx =>
        calls += 1
        if (calls < 2) throw new RuntimeException("once")
        (true, Seq(1).toDF("v"))
      }
      reg.register("Dies") { ctx => throw new RuntimeException("always") }
      Pipeline.fromPointy("tm", "Shaky -> Dies", reg).start(spark)
      val m = collector.metrics
      assert(m.size == 2)
      assert(collector.totalRetries == 1)
      assert(collector.failedEvents.map(_.eventName) == Seq("Dies"))
      // metrics as a queryable Dataset (telemetry rollups as DataFrames)
      val df = collector.toDF(spark)
      assert(df.filter(col("status") === "failed").count() == 1)
      assert(df.filter(col("retry_count") > 0).count() == 1)
    } finally collector.close()
  }

  test("scheduler fires interval jobs") {
    val sched = new Scheduler
    try {
      val hits = new java.util.concurrent.CountDownLatch(2)
      sched.every(1)(hits.countDown())
      assert(hits.await(5, java.util.concurrent.TimeUnit.SECONDS))
    } finally sched.shutdown()
  }

  test("crash between sink commit and checkpoint: restart does not " +
    "double-apply (applyBatchOnce end to end)") {
    import org.apache.spark.sql.DataFrame
    import graft.operators.Materialized
    val tmp = java.nio.file.Files
      .createTempDirectory("graft-replay-spec").toString
    // two micro-batches (pinned mtimes → pinned batch order)
    Seq(1L, 2L, 3L).toDF("v").coalesce(1)
      .write.mode("overwrite").parquet(s"$tmp/in/b1")
    Seq(10L, 20L).toDF("v").coalesce(1)
      .write.mode("overwrite").parquet(s"$tmp/in/b2")
    val now = System.currentTimeMillis()
    Seq(s"$tmp/in/b1", s"$tmp/in/b2").zipWithIndex.foreach { case (d, i) =>
      val walk = java.nio.file.Files.walk(java.nio.file.Paths.get(d))
      try walk.forEach(f =>
        java.nio.file.Files.setLastModifiedTime(f,
          java.nio.file.attribute.FileTime.fromMillis(now - (1 - i) * 60000L)))
      finally walk.close()
    }
    val store = new graft.sources.ResultStore(spark, s"$tmp/store")
    // crash exactly in the at-least-once window: AFTER the guarded view
    // commit of batch 1, BEFORE foreachBatch returns (so the engine
    // never checkpoints batch 1 and must replay it on restart)
    val crashArmed = new java.util.concurrent.atomic.AtomicBoolean(true)
    def runStream(): org.apache.spark.sql.streaming.StreamingQuery =
      spark.readStream
        .schema(Seq(1L).toDF("v").schema)
        .option("maxFilesPerTrigger", "1").parquet(s"$tmp/in/*")
        .writeStream
        .option("checkpointLocation", s"$tmp/ckpt")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .foreachBatch { (batch: DataFrame, batchId: Long) =>
          Materialized.applyBatchOnce(store, "mv", "crash-spec", batchId) {
            val delta = batch.agg(sum("v").as("s"))
            if (store.hasSchema("mv"))
              store.read("mv").unionByName(delta)
                .agg(sum("s").as("s"))
            else delta
          }
          if (batchId == 1L && crashArmed.compareAndSet(true, false))
            throw new RuntimeException("crash after commit (deliberate)")
          ()
        }
        .start()
    intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      runStream().awaitTermination()
    }
    // restart from the same checkpoint: the engine REPLAYS batch 1; the
    // guard must absorb it, not double-add 30
    runStream().awaitTermination()
    assert(store.read("mv").head().getLong(0) == 36L)
    assert(store.committedMeta("mv") ==
      Map("stream_id" -> "crash-spec", "batch_id" -> "1"))
  }

  test("quarantineStream: split equals the one-shot partition for any " +
      "batch split; rows preserved; replay idempotent; NULL violates; " +
      "ONE commit per batch carries both arms") {
    val rows = Seq((1L, "ok alpha"), (2L, "bad"), (3L, "ok beta"),
      (4L, null.asInstanceOf[String]), (5L, "ok gamma"))
      .toDF("doc_id", "text")
    // violation: fewer than 2 tokens — doc 2 fails, doc 4's NULL text
    // makes the predicate NULL and must count as a violation
    def viol = !(size(graft.functions.TextFunctions
      .wsTokens(lower(col("text")))) >= 2)
    def run(nFiles: Int): (graft.sources.ResultStore, String) = {
      val tmp = java.nio.file.Files.createTempDirectory("graft-quar")
        .toString
      rows.repartition(nFiles).write.mode("overwrite").parquet(s"$tmp/in")
      val store = new graft.sources.ResultStore(spark, s"$tmp/store")
      StreamRunner.quarantineStream(
        StreamRunner.parquetStream(spark, s"$tmp/in", 1),
        viol, "doc_id", store, "routed", s"$tmp/ckpt")
        .awaitTermination()
      (store, tmp)
    }
    def ids(df: org.apache.spark.sql.DataFrame) =
      df.select("doc_id").as[Long].collect().toSet
    for (n <- Seq(1, 3)) {
      val (store, tmp) = run(n)
      assert(ids(StreamRunner.cleanRows(store, "routed")) ==
        Set(1L, 3L, 5L), s"split $n")
      assert(ids(StreamRunner.quarantinedRows(store, "routed")) ==
        Set(2L, 4L), s"split $n")
      // quarantined rows keep their full payload (inspectable), and
      // the views drop the routing column
      assert(StreamRunner.quarantinedRows(store, "routed")
        .filter(col("doc_id") === 2L)
        .select("text").as[String].head() == "bad")
      assert(!StreamRunner.cleanRows(store, "routed").columns
        .contains(StreamRunner.ArmCol))
      // BOTH arms committed through ONE generation flip per batch:
      // version numbers are monotonic one-per-commit, so the committed
      // version number ≤ the batch count proves no batch paid two
      // commits (the two-table design's doubled constants), and a torn
      // batch can never show one arm's rows without the other's
      assert(store.committedVersion("routed").get.drop(1).toLong <= n,
        store.committedVersion("routed").toString)
      // a fresh checkpoint replays every batch: set-union idempotence
      // must leave the table unchanged
      StreamRunner.quarantineStream(
        StreamRunner.parquetStream(spark, s"$tmp/in", 1),
        viol, "doc_id", store, "routed", s"$tmp/ckpt2")
        .awaitTermination()
      assert(store.count("routed") == 5L)
    }
    // an all-valid corpus: the quarantine VIEW is empty, not an error
    val tmp = java.nio.file.Files.createTempDirectory("graft-quar").toString
    Seq((1L, "a b c")).toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$tmp/in")
    val store = new graft.sources.ResultStore(spark, s"$tmp/store")
    StreamRunner.quarantineStream(
      StreamRunner.parquetStream(spark, s"$tmp/in", 1),
      viol, "doc_id", store, "routed", s"$tmp/ckpt")
      .awaitTermination()
    assert(ids(StreamRunner.cleanRows(store, "routed")) == Set(1L))
    assert(StreamRunner.quarantinedRows(store, "routed").isEmpty)
  }
}
