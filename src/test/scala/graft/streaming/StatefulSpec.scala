package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestSession

/** Stateful streaming semantics. Batch separation is forced by running
  * two sequential AvailableNow queries over a shared checkpoint (a
  * single AvailableNow run may fold all files into one micro-batch, and
  * the watermark only advances BETWEEN batches). File sink — the memory
  * sink cannot resume from a checkpoint. */
class StatefulSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  val gapUs = 30L * 60 * 1000000 // 30 min
  // 2024-01-01 00:00 UTC in µs — NEVER use epoch-0 event times: they sit
  // at the initial watermark and get dropped as late
  val t0 = 1704067200L * 1000000
  val minute = 60L * 1000000

  private def drainSessionize(in: String, out: String, ckpt: String): Unit = {
    val schema = Seq(StatefulOps.EventIn(0L, 0L, 0.0)).toDF().schema
    val stream = spark.readStream.schema(schema)
      .parquet(s"$in/*").as[StatefulOps.EventIn]
    val q = StatefulOps.sessionizeStream(stream, gapUs).toDF()
      .writeStream.outputMode("append").format("parquet")
      .option("path", out).option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination()
  }

  test("streaming sessionization (flatMapGroupsWithState) with event-time timeouts") {
    val dir = java.nio.file.Files.createTempDirectory("graft-sess").toString
    val (in, out, ckpt) = (s"$dir/in", s"$dir/out", s"$dir/ckpt")

    Seq(
      StatefulOps.EventIn(1L, t0, 1.0),
      StatefulOps.EventIn(1L, t0 + 10 * minute, 2.0),
      StatefulOps.EventIn(2L, t0 + 5 * minute, 5.0))
      .toDF().coalesce(1).write.parquet(s"$in/b1")
    drainSessionize(in, out, ckpt) // batch 1: all sessions open, none emitted

    Seq(
      StatefulOps.EventIn(1L, t0 + 200 * minute, 3.0),
      StatefulOps.EventIn(3L, t0 + 210 * minute, 7.0))
      .toDF().coalesce(1).write.parquet(s"$in/b2")
    drainSessionize(in, out, ckpt) // batch 2: watermark → 180min

    val got = spark.read.parquet(out)
      .select("user_id", "n_events", "total_value")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

    // u1's first session closes by gap on the 200min event (n=2, 3.0);
    // u2's lone session times out once the watermark (180min) passes
    // last+gap=35min (n=1, 5.0); the 200/210min sessions remain open.
    assert(got == Set((1L, 2L, 3.0), (2L, 1L, 5.0)))
  }

  test("batch reference implementation agrees with q11-style sessionization") {
    val events = graft.Tables.load(spark, "/root/testdata/sf0.001", "events")
      .select(col("user_id"), unix_micros(col("ts")).as("ts_us"), col("value"))
    val ref = StatefulOps.sessionizeBatch(events, gapUs)
    val q11 = graft.SparkEntry.queries("q11_sessionize")(
      spark, "/root/testdata/sf0.001")
    assert(ref.count() == q11.count())
    val a = ref.groupBy("user_id").count().orderBy("user_id").collect().toSeq
    val b = q11.groupBy("user_id").count().orderBy("user_id").collect().toSeq
    assert(a == b)
  }

  test("watermark drops late data beyond the threshold in windowed aggs") {
    val dir = java.nio.file.Files.createTempDirectory("graft-late").toString
    val (in, out, ckpt) = (s"$dir/in", s"$dir/out", s"$dir/ckpt")
    val base = java.sql.Timestamp.valueOf("2024-01-01 10:00:00")
    def ts(min: Int) = new java.sql.Timestamp(base.getTime + min * 60000L)

    def drain(): Unit = {
      val schema = Seq((1L, ts(0), 1.0)).toDF("user_id", "ts", "value").schema
      val stream = spark.readStream.schema(schema).parquet(s"$in/*")
      val agg = stream
        .withWatermark("ts", "10 minutes")
        .groupBy(window(col("ts"), "1 hour"))
        .agg(sum("value").as("total"))
      val q = agg.select(col("window.start").as("win_start"), col("total"))
        .writeStream.outputMode("append").format("parquet")
        .option("path", out).option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
      q.awaitTermination()
    }

    // batch 1 pushes the watermark to 19:50 (600min - 10min)
    Seq((1L, ts(0), 1.0), (2L, ts(600), 1.0)).toDF("user_id", "ts", "value")
      .coalesce(1).write.parquet(s"$in/b1")
    drain()
    // batch 2 arrives hours behind the watermark → must be dropped
    Seq((3L, ts(5), 99.0)).toDF("user_id", "ts", "value")
      .coalesce(1).write.parquet(s"$in/b2")
    drain()

    val finalized = spark.read.parquet(out)
      .collect().map(r => (r.getTimestamp(0).toString, r.getDouble(1))).toMap
    // the 10:00 window finalized with ONLY the on-time row; the late
    // 99.0 was discarded, not merged
    assert(finalized.get("2024-01-01 10:00:00.0").contains(1.0),
      s"got $finalized")
  }

  test("funnelStream: state advances across batches, strictly-after holds") {
    val dir = java.nio.file.Files.createTempDirectory("graft-funnel").toString
    val (in, out, ckpt) = (s"$dir/in", s"$dir/out", s"$dir/ckpt")
    val steps = Seq("view", "click", "purchase")

    def drain(): Unit = {
      val schema = Seq(StatefulOps.TypedEvent(0L, 0L, "")).toDF().schema
      val stream = spark.readStream.schema(schema)
        .parquet(s"$in/*").as[StatefulOps.TypedEvent]
      val q = StatefulOps.funnelStream(stream, steps).toDF()
        .writeStream.outputMode("append").format("parquet")
        .option("path", out).option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
      q.awaitTermination()
    }

    // u1 converts fully in batch 1; u2's click PRECEDES their view (must
    // not count); u3 views in batch 1 and clicks in batch 2 — the state
    // machine must carry t1 across the batch boundary
    Seq(
      StatefulOps.TypedEvent(1L, t0, "view"),
      StatefulOps.TypedEvent(1L, t0 + minute, "click"),
      StatefulOps.TypedEvent(1L, t0 + 2 * minute, "purchase"),
      StatefulOps.TypedEvent(2L, t0, "click"),
      StatefulOps.TypedEvent(2L, t0 + minute, "view"),
      StatefulOps.TypedEvent(3L, t0, "view"))
      .toDF().coalesce(1).write.parquet(s"$in/b1")
    drain()
    Seq(
      StatefulOps.TypedEvent(3L, t0 + 5 * minute, "click"),
      StatefulOps.TypedEvent(-1L, t0 + 1000 * minute, "view"))
      .toDF().coalesce(1).write.parquet(s"$in/b2")
    drain() // sentinel watermark closes every real user's state

    val got = spark.read.parquet(out).filter(col("user_id") >= 0)
      .select("user_id", "times")
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(got == Map(
      1L -> Seq(t0, t0 + minute, t0 + 2 * minute),
      2L -> Seq(t0 + minute, -1L, -1L),
      3L -> Seq(t0, t0 + 5 * minute, -1L)))

    // and the emitted facts reproduce the batch funnel aggregate
    val ev = Seq(
      (1L, t0, "view"), (1L, t0 + minute, "click"),
      (1L, t0 + 2 * minute, "purchase"),
      (2L, t0, "click"), (2L, t0 + minute, "view"),
      (3L, t0, "view"), (3L, t0 + 5 * minute, "click"))
      .toDF("user_id", "ts_us", "event_type")
    val batch = graft.operators.Behavior.funnel(ev, "user_id", "ts_us",
        steps.map(n => n -> (col("event_type") === n)))
      .select("step", "n_users").collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    val stream = Map(
      1 -> got.values.count(_(0) >= 0).toLong,
      2 -> got.values.count(_(1) >= 0).toLong,
      3 -> got.values.count(_(2) >= 0).toLong)
    assert(stream == batch)
  }

  test("attributionStream: facts match batch, state carries across batches") {
    val dir = java.nio.file.Files.createTempDirectory("graft-attr").toString
    val (in, out, ckpt) = (s"$dir/in", s"$dir/out", s"$dir/ckpt")
    val look = 10 * minute

    def drain(): Unit = {
      val schema =
        Seq(StatefulOps.AttrEvent(0L, 0L, 0L, "", 0.0)).toDF().schema
      val stream = spark.readStream.schema(schema)
        .parquet(s"$in/*").as[StatefulOps.AttrEvent]
      val q = StatefulOps.attributionStream(stream, "purchase",
        Set("click", "view"), lookbackUs = look, quietUs = look).toDF()
        .writeStream.outputMode("append").format("parquet")
        .option("path", out).option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
      q.awaitTermination()
    }

    // b1: u1 clicks then purchases (in window); u2 views early (their
    // purchase lands in b2, OUTSIDE the window); u3 clicks — their b2
    // purchase attributes purely through carried state
    val b1 = Seq(
      StatefulOps.AttrEvent(1L, t0, 10L, "click", 0.0),
      StatefulOps.AttrEvent(1L, t0 + minute, 11L, "purchase", 5.0),
      StatefulOps.AttrEvent(2L, t0, 20L, "view", 0.0),
      StatefulOps.AttrEvent(3L, t0 + 8 * minute, 30L, "click", 0.0))
    b1.toDF().coalesce(1).write.parquet(s"$in/b1")
    drain()
    val b2 = Seq(
      StatefulOps.AttrEvent(2L, t0 + 15 * minute, 21L, "purchase", 7.0),
      StatefulOps.AttrEvent(3L, t0 + 12 * minute, 31L, "purchase", 3.0),
      StatefulOps.AttrEvent(4L, t0 + 12 * minute, 40L, "purchase", 1.0))
    b2.toDF().coalesce(1).write.parquet(s"$in/b2")
    drain()

    val got = spark.read.parquet(out)
      .collect().map(r => (r.getAs[Long]("user_id"),
        r.getAs[String]("channel"), r.getAs[Long]("lag_us"))).toSet
    assert(got == Set(
      (1L, "click", minute),
      (2L, "unattributed", -1L), // view 15 min before: outside 10-min window
      (3L, "click", 4 * minute), // carried across the batch boundary
      (4L, "unattributed", -1L)))

    // the same events through the batch operator yield the same facts
    val ev = (b1 ++ b2).map(e =>
      (e.user_id, e.ts_us, e.event_id, e.event_type, e.value))
      .toDF("user_id", "ts_us", "event_id", "event_type", "value")
    val batch = graft.operators.Behavior.lastTouchAttribution(
      ev, "user_id", "ts_us", "event_id", "event_type", "value",
      "purchase", Seq("click", "view"), look)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val streamAgg = got.groupBy(_._2).map { case (c, g) => (c, g.size.toLong) }
    assert(streamAgg.toSet == batch)
  }
}
