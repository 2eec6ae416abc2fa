package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** HLL++ approximate distinct counts stay inside their error bounds
  * against the exact counts (the rows-only aq10 query's semantics). */
class ApproxSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("approx_count_distinct within 10% of exact on real data") {
    val rows = SparkEntry.queries("aq10_approx_distinct")(
      spark, "/root/testdata/sf0.001").collect()
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
}
