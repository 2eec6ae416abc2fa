package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import graft.SparkTestSession

/** The fused CosineArgmax kernel must be BIT-identical to the
  * per-centroid typedLit struct-max formulation it replaced (the k-means
  * gates replay whole trajectories in SQL — any drift in rounding,
  * tie-break, or NaN order breaks aq33/sq14/sq10). */
class VectorKernelSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  /** The pre-kernel formulation, kept verbatim as the reference. */
  private def refArgmax(
      vec: Column, centroids: Seq[(Long, Array[Float])]): Column = {
    val scored = centroids.map { case (cid, cvec) =>
      struct(
        round(VectorExpressions.float_cosine(vec, typedLit(cvec)), 4)
          .as("sim"),
        lit(-cid).as("neg_cell"))
    }
    val best = array_max(array(scored: _*))
    struct(best.getField("sim").as("sim"),
      (-best.getField("neg_cell")).as("cell_id"))
  }

  test("kernel matches the typedLit struct-max on real embeddings") {
    val emb = graft.Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val cents = emb.orderBy("vec_id").limit(16)
      .select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray)).toSeq
    val both = emb.select(
      col("vec_id"),
      refArgmax(col("embedding"), cents).as("ref"),
      VectorExpressions.cosine_argmax_struct(col("embedding"), cents)
        .as("got"),
      struct(
        VectorExpressions.cosine_argmax_sim(col("embedding"), cents)
          .as("sim"),
        VectorExpressions.cosine_argmax_id(col("embedding"), cents)
          .as("cell_id")).as("got2"))
      .collect()
    assert(both.nonEmpty)
    both.foreach { r =>
      val ref = r.getStruct(1)
      Seq(r.getStruct(2), r.getStruct(3)).foreach { got =>
        assert(ref.getDouble(0) == got.getDouble(0),
          s"sim drift for vec ${r.getLong(0)}: ${ref.getDouble(0)} vs ${got.getDouble(0)}")
        assert(ref.getLong(1) == got.getLong(1),
          s"cell drift for vec ${r.getLong(0)}: ${ref.getLong(1)} vs ${got.getLong(1)}")
      }
    }
  }

  test("ties break to the lowest cell id") {
    // two IDENTICAL centroids under different ids force an exact tie
    val cents = Seq(
      (7L, Array(1f, 0f)), (3L, Array(1f, 0f)), (9L, Array(0f, 1f)))
    val vecs = Seq((1L, Seq(2f, 0f)))
      .toDF("id", "v").withColumn("v", col("v").cast("array<float>"))
    val row = vecs.select(
      refArgmax(col("v"), cents).as("ref"),
      VectorExpressions.cosine_argmax_id(col("v"), cents).as("got_id"))
      .head()
    assert(row.getStruct(0).getLong(1) == 3L && row.getLong(1) == 3L)
  }

  test("zero vectors: kernel is NaN-tolerant where typedLit form errored") {
    // 0/0 through the Column formulation hits ANSI DIVIDE_BY_ZERO — the
    // old path could not process a zero-norm vector at all. The kernel
    // computes in primitive doubles: every sim is NaN, the NaN total
    // order makes the comparison a tie everywhere, and the lowest cell
    // id wins deterministically.
    val cents = Seq((7L, Array(1f, 0f)), (3L, Array(0f, 1f)))
    val vecs = Seq((1L, Seq(0f, 0f)))
      .toDF("id", "v").withColumn("v", col("v").cast("array<float>"))
    intercept[Exception](
      vecs.select(refArgmax(col("v"), cents)).collect())
    val row = vecs.select(
      VectorExpressions.cosine_argmax_id(col("v"), cents).as("id"),
      VectorExpressions.cosine_argmax_sim(col("v"), cents).as("sim"))
      .head()
    assert(row.getLong(0) == 3L)
    assert(row.getDouble(1).isNaN)
  }

  test("round4 mirrors Spark round(x, 4) including NaN/infinity") {
    val xs = Seq(0.12345, 0.123449999, -0.00005, 1.0 / 3.0, -2.5e-5,
      Double.NaN, Double.PositiveInfinity, Double.NegativeInfinity)
    val viaSpark = xs.toDF("x").select(round(col("x"), 4)).collect()
      .map(_.getDouble(0))
    xs.zip(viaSpark).foreach { case (x, want) =>
      val got = VectorExpressions.round4(x)
      assert(got == want || (got.isNaN && want.isNaN),
        s"round4($x) = $got, Spark round = $want")
    }
  }
}
