package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions.col
import graft.SparkTestSession

class FeaturesSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("looTargetEncode: leave-one-out means, singleton global fallback") {
    val df = Seq(
      (1L, "a", Some(10.0)), (2L, "a", Some(20.0)), (3L, "a", Some(30.0)),
      (4L, "b", Some(40.0)))
      .toDF("id", "k", "y")
    // output order is unspecified (no global sort inside the operator)
    val got = Features.looTargetEncode(df, "id", "k", "y")
      .as[(Long, String, Long, Option[Double])].collect().toSeq.sortBy(_._1)
    assert(got == Seq(
      (1L, "a", 3L, Some(25.0)),   // (60-10)/2
      (2L, "a", 3L, Some(20.0)),   // (60-20)/2
      (3L, "a", 3L, Some(15.0)),   // (60-30)/2
      (4L, "b", 1L, Some(25.0))),  // singleton -> global mean 100/4
      got.toString)
  }

  test("looTargetEncode: NULL labels subtract nothing; all-null key falls back") {
    val df = Seq(
      (1L, "a", Some(10.0)), (2L, "a", None),
      (3L, "c", None))
      .toDF("id", "k", "y")
    val got = Features.looTargetEncode(df, "id", "k", "y")
      .as[(Long, String, Long, Option[Double])].collect().toSeq.sortBy(_._1)
    assert(got == Seq(
      // id 1 is the only label in 'a': LOO denominator 0 -> global mean
      (1L, "a", 1L, Some(10.0)),
      // id 2 has no own label: plain key mean of the others = 10
      (2L, "a", 1L, Some(10.0)),
      // 'c' has no labels at all: global mean
      (3L, "c", 0L, Some(10.0))), got.toString)
  }

  test("looTargetEncode: NULL keys survive and take the global-mean fallback") {
    val df = Seq(
      (1L, Some("a"), Some(2.0)), (2L, Some("a"), Some(4.0)),
      (3L, Option.empty[String], Some(9.0)))
      .toDF("id", "k", "y")
    val got = Features.looTargetEncode(df, "id", "k", "y")
      .as[(Long, Option[String], Long, Option[Double])]
      .collect().toSeq.sortBy(_._1)
    assert(got == Seq(
      (1L, Some("a"), 2L, Some(4.0)),
      (2L, Some("a"), 2L, Some(2.0)),
      // the NULL-key row is NOT dropped: n_key 0, global mean 15/3
      (3L, None, 0L, Some(5.0))), got.toString)
  }

  test("woeIv: hand-computed WoE, IV total, one-sided bucket NULLs") {
    // X: 3 pos / 1 neg, Y: 1 pos / 3 neg (G = N = 4):
    // WoE_X = ln(3) = 1.098612, WoE_Y = -1.098612;
    // IV = 0.5*1.098612 + 0.5*1.098612 = 1.098612
    val df = (Seq.fill(3)(("X", true)) ++ Seq(("X", false)) ++
      Seq(("Y", true)) ++ Seq.fill(3)(("Y", false))).toDF("b", "y")
    val got = Features.woeIv(df, "b", col("y"))
      .as[(String, Long, Long, Option[Double], Double)].collect().toSeq
    assert(got == Seq(
      ("X", 3L, 1L, Some(1.098612), 1.098612),
      ("Y", 1L, 3L, Some(-1.098612), 1.098612)), got.toString)
    // a one-sided bucket has undefined WoE and adds nothing to IV
    val withZ = (Seq.fill(3)(("X", true)) ++ Seq(("X", false)) ++
      Seq(("Y", true)) ++ Seq.fill(3)(("Y", false)) ++
      Seq.fill(2)(("Z", true))).toDF("b", "y")
    val z = Features.woeIv(withZ, "b", col("y"))
      .as[(String, Long, Long, Option[Double], Double)].collect().toSeq
    assert(z.find(_._1 == "Z").get._4.isEmpty, z.toString)
    assert(z.map(_._5).distinct.size == 1 && !z.head._5.isNaN, z.toString)
  }
}
