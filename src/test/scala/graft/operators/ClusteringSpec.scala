package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

/** Deterministic Lloyd k-means micro-fixtures; the sf-scale trajectory
  * replay against the unrolled DuckDB oracle runs in the aq33 gate. */
class ClusteringSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("two obvious groups separate and shares sum to 1") {
    val d = Seq(
      (0L, Seq(1.0f, 0.0f)), (1L, Seq(0.0f, 1.0f)),   // seeds
      (2L, Seq(0.9f, 0.1f)), (3L, Seq(0.95f, 0.05f)),
      (4L, Seq(0.1f, 0.9f)), (5L, Seq(0.05f, 0.95f))).toDF("vec_id", "v")
    val out = Clustering.kmeansCellStats(d, "vec_id", "v", k = 2, iters = 2)
      .collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    assert(out.map(_._1).toSeq == Seq(0L, 1L))
    assert(out.map(_._2).toSeq == Seq(3L, 3L))
    assert(out.map(_._3).sum == 1.0)
    out.foreach(r => assert(r._4 > 0.0 && r._4 <= 1.0001))
  }

  test("an empty cell keeps its seed centroid and reports zero share") {
    // all vectors identical: cosine ties everywhere, lowest cell wins,
    // cell 1 never receives a member
    val d = (0L to 4L).map(i => (i, Seq(1.0f, 1.0f))).toDF("vec_id", "v")
    val out = Clustering.kmeansCellStats(d, "vec_id", "v", k = 2, iters = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(out.toSeq == Seq((0L, 5L, 1.0), (1L, 0L, 0.0)))
  }

  test("powerIterationScores finds the dominant axis") {
    // variance concentrated on axis 0: the fitted direction must score
    // the on-axis vectors far above the off-axis one, signs opposite
    // for opposite vectors
    val d = Seq(
      (1L, Seq(10.0f, 0.1f)), (2L, Seq(-10.0f, 0.1f)),
      (3L, Seq(9.5f, -0.1f)), (4L, Seq(0.0f, 1.0f)))
      .toDF("vec_id", "v")
    val out = Clustering.powerIterationScores(d, "vec_id", "v",
        iters = 3, topK = 4)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(math.abs(out(1L)) > 9 && math.abs(out(2L)) > 9 &&
      math.abs(out(3L)) > 9)
    assert(math.abs(out(4L)) < 1.0, s"off-axis vector scored ${out(4L)}")
    assert(out(1L) * out(2L) < 0, "opposite vectors must score opposite signs")
    assert(out(1L) * out(3L) > 0, "aligned vectors must score same sign")
  }

  test("powerIterationScores topK orders by |score| with id tie-break") {
    val d = (1L to 6L).map(i => (i, Seq(i.toFloat, 0f))).toDF("vec_id", "v")
    val got = Clustering.powerIterationScores(d, "vec_id", "v",
        iters = 2, topK = 3)
      .collect().map(_.getLong(0)).toSeq
    assert(got == Seq(6L, 5L, 4L))
  }

  test("cellQuality: planted tight clusters score near-1 cohesion") {
    // two orthogonal families of near-identical vectors: each cell's
    // members hug their centroid, so avg_sim ~ 1 and min_sim high;
    // counts partition the corpus
    val rnd = new scala.util.Random(5)
    def jitter(base: Array[Float]) =
      base.map(x => x + (rnd.nextFloat() - 0.5f) * 0.01f)
    val a = Array(1f, 0f, 0f, 0f)
    val b = Array(0f, 1f, 0f, 0f)
    val d = ((1L to 20L).map(i => (i, jitter(a))) ++
      (21L to 40L).map(i => (i, jitter(b))))
      .toDF("vec_id", "v")
    val out = Clustering.cellQuality(d, "vec_id", "v", k = 2, iters = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3)))
    assert(out.map(_._2).sum == 40L, "members partition the corpus")
    assert(out.forall(_._3 >= 0.99), s"tight cells must cohere: ${out.toSeq}")
    assert(out.forall(c => c._4 <= c._3 && c._3 <= 1.0))
  }

  test("softsignRegression: hand-computed two-point trajectory") {
    // (x=1, y=1), (x=-1, y=0), lr=0.5:
    // r1: m=0, sig=0.5 -> g_b=0, g_x=-1, correct=1; w=(0, 0.25)
    // r2: m=±0.25, sig=0.6/0.4 -> g_x=-0.8, correct=2; w=(0, 0.45)
    val df = Seq((1.0, 1.0), (-1.0, 0.0)).toDF("x", "label")
    val got = Clustering.softsignRegression(
      df, Seq("x"), "label", iterations = 2, learningRate = 0.5)
      .as[(Int, Long, Double, Double)].collect().toSeq
    assert(got == Seq((1, 1L, 0.0, 0.25), (2, 2L, 0.0, 0.45)),
      got.toString)
  }

  test("daviesBouldin: zero-scatter orthogonal clusters score 0; " +
      "looser clusters score higher") {
    // two clusters of exact copies on orthogonal axes: every member
    // sits ON its centroid (scatter 0) and M = 1 − cos = 1 → DB = 0
    val tight = Seq(
      (0L, Seq(1.0f, 0.0f)), (1L, Seq(0.0f, 1.0f)), // seeds
      (2L, Seq(1.0f, 0.0f)), (3L, Seq(0.0f, 1.0f)),
      (4L, Seq(1.0f, 0.0f)), (5L, Seq(0.0f, 1.0f))).toDF("vec_id", "v")
    val got = Clustering.daviesBouldin(tight, "vec_id", "v",
        k = 2, iters = 1)
      .as[(Long, Option[Double])].collect().head
    assert(got == ((2L, Some(0.0))), got.toString)
    // spread members off their centroids: scatter > 0 → DB > 0
    val loose = Seq(
      (0L, Seq(1.0f, 0.0f)), (1L, Seq(0.0f, 1.0f)),
      (2L, Seq(0.9f, 0.1f)), (3L, Seq(0.1f, 0.9f)),
      (4L, Seq(0.95f, 0.05f)), (5L, Seq(0.05f, 0.95f)))
      .toDF("vec_id", "v")
    val l = Clustering.daviesBouldin(loose, "vec_id", "v",
        k = 2, iters = 1)
      .as[(Long, Option[Double])].collect().head
    assert(l._1 == 2L && l._2.exists(_ > 0.0), l.toString)
  }
}
