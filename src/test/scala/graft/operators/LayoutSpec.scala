package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestSession

/** Z-order layout micro-fixtures: the Morton interleave against
  * hand-computed bit patterns, and the clustering property the curve
  * exists for — each quadrant's min/max rectangle is tight on BOTH
  * keys (a linear sort gives full-span ranges on the second key).
  * The sf-scale DuckDB replay runs in the q36 gate. */
class LayoutSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("morton interleave matches hand-computed bit patterns") {
    // a=5 (101b) at even positions -> 1+4*0+16*1 = 17
    // b=3 (011b) at odd positions  -> 2+8*1+32*0 = 10  => z=27
    val out = Seq((5L, 3L), (0L, 0L), (7L, 7L)).toDF("a", "b")
      .select(Layout.morton(col("a"), col("b"), 3).as("z"))
      .collect().map(_.getLong(0)).sorted
    assert(out.toSeq == Seq(0L, 27L, 63L))
  }

  test("zorder quadrants are tight rectangles on BOTH keys") {
    // full 16x16 grid, 4-bit keys, 2-bit quadrants -> 16 quadrants,
    // each exactly a 4x4 rectangle: max-min == 3 on both dimensions.
    val grid = spark.range(256)
      .select((col("id") % 16).as("a"), (col("id") / 16).cast("long").as("b"))
    val out = Layout.zorderLayout(grid.toDF(), "a", "b",
      bits = 4, quadBits = 2).collect()
    assert(out.length == 16)
    out.foreach { r =>
      assert(r.getAs[Long]("n_rows") == 16L)
      assert(r.getAs[Long]("max_a") - r.getAs[Long]("min_a") == 3L)
      assert(r.getAs[Long]("max_b") - r.getAs[Long]("min_b") == 3L)
    }
  }

  test("zorder normalizes against the observed min — offset keys land identically") {
    // shifting both keys by a constant must not change the layout
    val grid = spark.range(64)
      .select((col("id") % 8).as("a"), (col("id") / 8).cast("long").as("b"))
    val base = Layout.zorderLayout(grid.toDF(), "a", "b", 3, 1)
      .select("file_id", "n_rows").collect().map(r => (r.getLong(0), r.getLong(1)))
    val shifted = Layout.zorderLayout(
      grid.select((col("a") + 1000).as("a"), (col("b") + 77).as("b")),
      "a", "b", 3, 1)
      .select("file_id", "n_rows").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(base.toSeq == shifted.toSeq)
  }
}
