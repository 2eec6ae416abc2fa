package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestSession

/** Count-min sketch: the no-underestimate invariant (the load-bearing
  * property for sketch-prefilter + exact-verify), exact heavy-hitter
  * equality vs the naive groupBy, and prefilter selectivity on a
  * skewed fixture. The sf-scale replay against DuckDB is aq31's gate. */
class SketchSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // skewed fixture: keys 0..9 appear 100x each, keys 10..1009 once
  private lazy val skewed = (
    (0 until 10).flatMap(k => Seq.fill(100)(k.toLong)) ++
      (10 until 1010).map(_.toLong)
  ).toDF("k")

  test("estimate never underestimates the true count, even undersized") {
    // deliberately tiny width -> heavy collisions -> estimates inflate,
    // but none may ever dip below the true count
    val truth = skewed.groupBy("k").count()
    val table = Sketch.cmsBuild(skewed, col("k"), depth = 3, width = 16)
    val checked = truth
      .withColumn("est", Sketch.cmsEstimate(table, col("k"), 3, 16))
      .filter(col("est") < col("count"))
      .count()
    assert(checked == 0L, "found keys whose estimate < true count")
  }

  test("heavy hitters equal the naive groupBy-having exactly") {
    val got = Sketch.heavyHitters(skewed, "k", threshold = 50L,
        depth = 4, width = 1 << 12)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val want = skewed.groupBy("k").agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= 50).orderBy("k")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == want && got.size == 10)
  }

  test("adequately-sized sketch prefilters most of the tail") {
    val table = Sketch.cmsBuild(skewed, col("k"), depth = 4, width = 1 << 12)
    val kept = skewed
      .filter(Sketch.cmsEstimate(table, col("k"), 4, 1 << 12) >= 50)
      .count()
    // 1000 hot rows must survive; the 1000 singleton rows should mostly
    // vanish (2000/4096 expected collision mass per cell is << 50)
    assert(kept >= 1000L, "prefilter dropped true heavy-hitter rows")
    assert(kept <= 1100L, s"prefilter kept $kept rows - not selective")
  }

  test("driver state is exactly depth*width cells") {
    val table = Sketch.cmsBuild(skewed, col("k"), depth = 5, width = 64)
    assert(table.length == 5 * 64)
    // total mass per seed row equals the row count
    val rows = skewed.count()
    (0 until 5).foreach { i =>
      assert(table.slice(i * 64, (i + 1) * 64).sum == rows)
    }
  }
}
