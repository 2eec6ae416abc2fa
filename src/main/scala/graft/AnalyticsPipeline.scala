package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core._
import graft.operators.{Behavior, Lineage}

/** The behavioral-analytics story composed through the Pointy DSL —
  * the round-6 event operators doing end-to-end work under the
  * reference's pipeline semantics (conditional routing included):
  *
  *   Load |-> HealthGate (0 -> Alert, 1 |-> Attribute) |-> ShareReport
  *
  *  - HealthGate fails the stream when errors dominate (error fraction
  *    >= `maxErrorFrac`) — the reference's conditional descriptor
  *    routing an unhealthy firehose to the Alert arm instead of
  *    polluting revenue attribution;
  *  - Attribute runs last-touch attribution over the healthy stream
  *    ([[Behavior.lastTouchAttribution]] — 7-day lookback, purchase
  *    conversions, click/view/signup touches);
  *  - ShareReport adds each channel's revenue share of the total. The
  *    share divides the two 2dp-rounded DOUBLES (each backed by an
  *    exact decimal sum), so any engine replaying the chain gets the
  *    identical quotient — no decimal-division scale rules in play.
  */
object AnalyticsPipeline {

  val pointy: String =
    "Load |-> HealthGate (0 -> Alert, 1 |-> Attribute) |-> ShareReport"

  def registry(sfDir: String, maxErrorFrac: Double = 0.5): EventRegistry = {
    val reg = new EventRegistry

    reg.registerTransform("Load") { ctx =>
      Tables.load(ctx.spark, sfDir, "events").select(
        col("user_id"), unix_micros(col("ts")).as("ts_us"),
        col("event_id"), col("event_type"), col("value"))
    }

    reg.register("HealthGate") { ctx =>
      val in = ctx.previousContent.get.transform(Lineage.cutLocal)
      val probe = in.agg(
        count(lit(1)).as("total"),
        count(when(col("event_type") === "error", 1)).as("errors")).head()
      val (total, errors) = (probe.getLong(0), probe.getLong(1))
      (total == 0 || errors.toDouble / total < maxErrorFrac, in)
    }

    reg.registerTransform("Attribute") { ctx =>
      Behavior.lastTouchAttribution(
        ctx.previousContent.get, "user_id", "ts_us", "event_id",
        "event_type", "value",
        conversionType = "purchase",
        touchTypes = Seq("click", "view", "signup"),
        lookbackUs = 604800000000L)
    }

    reg.registerTransform("Alert") { ctx =>
      import ctx.spark.implicits._
      Seq(("error_flood", System.currentTimeMillis() / 1000))
        .toDF("alert", "at_epoch_s")
    }

    reg.registerTransform("ShareReport") { ctx =>
      val in = ctx.previousContent.get
      if (in.columns.contains("alert")) in
      else {
        val channels = Lineage.cutLocal(in)
        // decimal total: the per-channel 2dp doubles sum EXACTLY in
        // any partition order (a raw double sum could straddle a
        // rounding boundary run-to-run)
        val total = broadcast(channels.agg(
          sum(col("revenue").cast("decimal(18,2)")).as("__total_rev")))
        channels.crossJoin(total)
          .withColumn("revenue_share",
            round(col("revenue") / col("__total_rev").cast("double"), 6))
          .drop("__total_rev")
          .orderBy("channel")
      }
    }
    reg
  }

  def run(spark: SparkSession, sfDir: String,
      maxErrorFrac: Double = 0.5): DataFrame = {
    val lineage = Pipeline
      .fromPointy("analytics", pointy, registry(sfDir, maxErrorFrac))
      .start(spark)
    lineage.finalResult.content
      .getOrElse(sys.error(
        s"analytics produced no content; state=${lineage.finalState}"))
  }
}
