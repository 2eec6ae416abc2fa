package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Scan-boundary timestamp normalization ([[Tables.normalizeTs]]):
  * whatever the parquet writer encoded — legacy long nanos, NTZ
  * micros, or an instant — `ts` must arrive as ONE canonical micros
  * TimestampType whose µs-epoch values do not depend on the host
  * JVM's default time zone (the session zone is pinned to UTC in
  * [[Sessions.tune]]; a cluster's executors do NOT all share the
  * driver's /etc/localtime). */
class TablesSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._
  private val sf = "/root/testdata/sf0.001"

  test("events.ts loads as TimestampType with stable micros") {
    val df = Tables.load(spark, sf, "events")
    assert(df.schema("ts").dataType ==
      org.apache.spark.sql.types.TimestampType)
    assert(df.filter(col("ts").isNull).count() == 0)
  }

  test("ts micros are identical under a non-UTC JVM default time zone") {
    val underUtc = Tables.load(spark, sf, "events")
      .agg(sum(unix_micros(col("ts"))), min(unix_micros(col("ts"))))
      .head()
    val prev = java.util.TimeZone.getDefault
    try {
      java.util.TimeZone.setDefault(
        java.util.TimeZone.getTimeZone("Australia/Eucla")) // UTC+8:45
      val shifted = Tables.load(spark, sf, "events")
        .agg(sum(unix_micros(col("ts"))), min(unix_micros(col("ts"))))
        .head()
      assert(shifted == underUtc,
        "ts epoch values drifted with the JVM default time zone")
    } finally java.util.TimeZone.setDefault(prev)
  }

  test("normalizeTs handles long nanos, NTZ micros, and is a no-op otherwise") {
    // long nanos arm (legacy fixture shape)
    val nanos = Seq((1L, 1700000000123456789L)).toDF("id", "ts")
    val n = Tables.normalizeTs(nanos).select(unix_micros(col("ts"))).head()
    assert(n.getLong(0) == 1700000000123456L)
    // NTZ arm: a wall-clock literal must read as the same instant in UTC
    val ntz = Seq((1L, "2024-03-01T06:30:00")).toDF("id", "s")
      .select(col("id"), col("s").cast("timestamp_ntz").as("ts"))
    val u = Tables.normalizeTs(ntz).select(unix_micros(col("ts"))).head()
    assert(u.getLong(0) == 1709274600000000L)
    // no ts column: untouched
    val plain = Seq((1L, "x")).toDF("id", "v")
    assert(Tables.normalizeTs(plain).schema == plain.schema)
  }
}
