package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** The analytics pipeline's conditional doing real work: a healthy
  * event stream flows health gate → attribution → share report; an
  * error-flooded stream routes to the Alert arm at the gate. */
class AnalyticsPipelineSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("healthy stream yields channel shares summing to ~1") {
    val out = AnalyticsPipeline.run(spark, "/root/testdata/sf0.001")
    val rows = out.collect()
    assert(rows.nonEmpty)
    assert(out.columns.contains("revenue_share"))
    val shares = rows.map(_.getAs[Double]("revenue_share"))
    assert(math.abs(shares.sum - 1.0) < 1e-4, shares.mkString(","))
    // channels are the touch types + the unattributed arm, nothing else
    val chans = rows.map(_.getAs[String]("channel")).toSet
    assert(chans.subsetOf(Set("click", "view", "signup", "unattributed")))
  }

  test("error flood routes to the Alert arm at the health gate") {
    val dir = java.nio.file.Files.createTempDirectory("graft-alert").toString
    (1 to 100).map { i =>
      val tpe = if (i % 10 == 0) "purchase" else "error"
      (i.toLong, i.toLong % 7, tpe, 1.0, i.toLong * 1000000L)
    }.toDF("event_id", "user_id", "event_type", "value", "ts_us")
      .withColumn("ts", timestamp_micros(col("ts_us"))).drop("ts_us")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = AnalyticsPipeline.run(spark, dir)
    val rows = out.collect()
    assert(rows.length == 1)
    assert(rows.head.getAs[String]("alert") == "error_flood")
  }
}
