package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestSession

/** Interval-overlap join: exact-once reporting across shared buckets,
  * closed-interval endpoint semantics, and a seeded differential
  * against the brute-force cross-join — the oracle-grade check that
  * grid blocking is lossless. The sf-scale replay against DuckDB runs
  * in the aq38 gate. */
class IntervalsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def iv(rows: (Long, Long, Long)*) =
    rows.toDF("id", "start_us", "end_us")

  test("pair sharing many buckets reports exactly once") {
    // bucket width 10: both intervals span buckets 0..9 — the pair
    // overlaps in every one of them but must come out once
    val l = iv((1L, 0L, 99L))
    val r = iv((2L, 5L, 95L))
    val out = Intervals.overlapJoin(l, r, "start_us", "end_us", bucketUs = 10L)
      .collect()
    assert(out.length == 1)
    assert(out(0).getAs[Long]("overlap_us") == 90L)
  }

  test("touching endpoints count as overlap (closed intervals)") {
    val l = iv((1L, 0L, 50L))
    val r = iv((2L, 50L, 80L), (3L, 51L, 80L))
    val out = Intervals.overlapJoin(l, r, "start_us", "end_us", bucketUs = 10L)
      .select("r_id", "overlap_us").as[(Long, Long)].collect().toSet
    assert(out == Set((2L, 0L)), "r3 starts after l1 ends — no pair")
  }

  test("seeded differential vs brute-force cross join") {
    val rnd = new scala.util.Random(7)
    def gen(n: Int, idBase: Long) = (0 until n).map { i =>
      val s = rnd.nextInt(1000).toLong
      (idBase + i, s, s + 1 + rnd.nextInt(120))
    }
    val l = iv(gen(60, 100L): _*)
    val r = iv(gen(60, 900L): _*)
    // bucket width deliberately smaller than max interval length so
    // multi-bucket replication + exact-once dedup are both exercised
    val fast = Intervals.overlapJoin(l, r, "start_us", "end_us", bucketUs = 32L)
      .select("l_id", "r_id", "overlap_us")
      .as[(Long, Long, Long)].collect().toSet
    val brute = l.toDF("l_id", "ls", "le")
      .crossJoin(r.toDF("r_id", "rs", "re"))
      .filter(col("ls") <= col("re") && col("rs") <= col("le"))
      .select(col("l_id"), col("r_id"),
        (least(col("le"), col("re")) - greatest(col("ls"), col("rs")))
          .as("overlap_us"))
      .as[(Long, Long, Long)].collect().toSet
    assert(brute.nonEmpty, "fixture degenerate: no overlapping pairs")
    assert(fast == brute)
  }

  test("carry columns ride along with l_/r_ prefixes") {
    val l = Seq((1L, 0L, 10L, "a")).toDF("id", "start_us", "end_us", "tag")
    val r = Seq((2L, 5L, 15L, "b")).toDF("id", "start_us", "end_us", "tag")
    val out = Intervals.overlapJoin(l, r, "start_us", "end_us", bucketUs = 100L)
    assert(out.columns.toSet ==
      Set("l_id", "l_start_us", "l_end_us", "l_tag",
        "r_id", "r_start_us", "r_end_us", "r_tag", "overlap_us"))
    assert(out.select("l_tag", "r_tag").as[(String, String)].head() == ("a", "b"))
  }
}
