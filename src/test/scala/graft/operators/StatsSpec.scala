package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestSession

/** Welch A/B statistics against hand-computed values; the sf-scale
  * DuckDB replay runs in the aq50 gate. */
class StatsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("tukeyOutliers: hand-computed fences, nulls excluded") {
    // values 1..10 plus 100: q1 = 3.5, q3 = 8.5, fences [-4, 16] →
    // exactly the 100 is outside; a NULL row counts nowhere
    val rows = (1 to 10).map(i => ("g", Some(i.toDouble))) :+
      (("g", Some(100.0))) :+ (("g", None: Option[Double]))
    val out = Stats.tukeyOutliers(rows.toDF("grp", "v"), "v", Seq("grp"))
      .collect()(0)
    assert((out.getLong(1), out.getDouble(2), out.getDouble(3),
      out.getLong(4)) == ((11L, 3.5, 8.5, 1L)))
    assert(out.getDouble(5) == 0.090909)
  }

  test("abTest: hand-computed Welch z, thin arm yields NULL") {
    // group g: A = [1,2,3] (m=2, s²=1/3·3? → var=1), B = [2,4] (m=3,
    // var=2): z = (2-3)/sqrt(1/3 + 1) = -0.8660
    // group h: B has one row → z undefined (NULL)
    val d = Seq(
      ("g", true, 1.0), ("g", true, 2.0), ("g", true, 3.0),
      ("g", false, 2.0), ("g", false, 4.0),
      ("h", true, 5.0), ("h", true, 7.0), ("h", false, 6.0))
      .toDF("grp", "is_a", "v")
    val out = Stats.abTest(d, "v", col("is_a"), Seq("grp"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4),
        if (r.isNullAt(5)) None else Some(r.getDouble(5))))
    assert(out.toSeq == Seq(
      ("g", 3L, 2L, 2.0, 3.0, Some(-0.866)),
      ("h", 2L, 1L, 6.0, 6.0, None)))
  }
}
