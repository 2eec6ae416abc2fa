package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** HLL++ approximate distinct counts stay inside their error bounds
  * against the exact counts. The gate queries are aq10a (exact counts,
  * hash-matched) and aq10b (bound flags, hash-matched); this spec pins
  * the TIGHTER observed error directly on the estimates. */
class ApproxSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("approx_count_distinct within 10% of exact on real data") {
    val rows = Tables.load(spark, "/root/testdata/sf0.001", "lineitem")
      .groupBy("l_returnflag")
      .agg(
        countDistinct(col("l_partkey")).as("exact_parts"),
        approx_count_distinct(col("l_partkey")).as("approx_parts"),
        countDistinct(col("l_suppkey")).as("exact_supps"),
        approx_count_distinct(col("l_suppkey"), rsd = 0.01)
          .as("approx_supps_1pct"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val exact = r.getAs[Long]("exact_parts").toDouble
      val approx = r.getAs[Long]("approx_parts").toDouble
      assert(math.abs(approx - exact) / exact < 0.10,
        s"default-rsd estimate off by >10%: $approx vs $exact")
      val exactS = r.getAs[Long]("exact_supps").toDouble
      val approxS = r.getAs[Long]("approx_supps_1pct").toDouble
      assert(math.abs(approxS - exactS) / exactS < 0.05,
        s"1%-rsd estimate off by >5%: $approxS vs $exactS")
    }
  }

  test("aq10b bound flags all true at test scale") {
    val rows = SparkEntry.queries("aq10b_approx_bounded")(
      spark, "/root/testdata/sf0.001").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Boolean]("approx_parts_ok"), r.toString)
      assert(r.getAs[Boolean]("approx_supps_ok"), r.toString)
    }
  }
}
