package graft

import org.scalatest.funsuite.AnyFunSuite

/** Every registered query must EXECUTE end-to-end at sf0.001.
  *
  * Round-5 post-mortem: a testdata re-encode (TIMESTAMP(NANOS) →
  * TIMESTAMP_NTZ micros) broke 11 registered queries at analysis time
  * and nothing in-repo went red — Verify prints per-query errors to
  * stderr and exits 0, Bench catches Throwable and records a fast wall
  * time, so the breakage only surfaced in the driver's correctness
  * gate. This spec closes that hole: one test per `SparkEntry.queries`
  * entry, forcing a full `count()` (analysis + execution), so ANY
  * query that throws turns `sbt test` red with the query's name.
  */
class AllQueriesSmokeSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"$name executes at sf0.001") {
      val n = fn(spark, sf).count()
      assert(n >= 0L)
    }
  }

  test("every oracle key has a registered query") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracles without queries: $orphans")
  }

  test("flagship entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0L)
  }
}
