package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core._

/** The SURVEY §7.2 minimum end-to-end slice, exercising the whole core:
  * Pointy parse → stage graph → registry → runner (pipe + conditional +
  * evaluation + sink) over the events table.
  *
  *   Load |-> Process |-> Aggregate (0 -> Alert, 1 -> Summarize)
  *
  * Every stage returns a lazy DataFrame; the only action is the caller's.
  */
object Flagship {

  val pointy: String =
    "Load |-> Process |-> Aggregate (0 -> Alert, 1 |-> Summarize)"

  def registry(sfDir: String): EventRegistry = {
    val reg = new EventRegistry

    reg.registerTransform("Load") { ctx =>
      Tables.load(ctx.spark, sfDir, "events")
    }

    // filter DSL compiled to Catalyst predicates (pushed to the scan)
    reg.registerTransform("Process") { ctx =>
      val df = ctx.previousContent.get
      graft.query.ResultSet
        .filterDf(df, "event_type__isnull" -> false, "value__gte" -> 0.0)
        .select("event_id", "ts", "user_id", "event_type", "value")
    }

    reg.registerTransform("Aggregate") { ctx =>
      ctx.previousContent.get
        .groupBy("event_type")
        .agg(
          count(lit(1)).as("n_events"),
          round(sum(col("value").cast("decimal(18,4)")), 2)
            .cast("double").as("total_value"),
          round(sum(col("value").cast("decimal(18,4)")).cast("double")
            / count(lit(1)), 4).as("avg_value"))
        .orderBy("event_type")
    }

    reg.registerTransform("Summarize") { ctx =>
      ctx.previousContent.get
    }

    reg.registerTransform("Alert") { ctx =>
      import ctx.spark.implicits._
      Seq(("aggregate_failed", System.currentTimeMillis() / 1000))
        .toDF("alert", "at_epoch_s")
    }

    reg
  }

  /** Run the flagship pipeline; returns the final stage's content. */
  def run(spark: SparkSession, sfDir: String): DataFrame = {
    val pipeline = Pipeline.fromPointy("flagship", pointy, registry(sfDir))
    val lineage = pipeline.start(spark)
    lineage.finalResult.content
      .getOrElse(sys.error(s"flagship produced no content; state=${lineage.finalState}"))
  }
}
