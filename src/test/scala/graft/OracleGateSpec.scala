package graft

import org.scalatest.funsuite.AnyFunSuite

/** The gate that would have caught the round-7 aq59 slip LOCALLY: any
  * query registered since the last committed driver-correctness
  * artifact (CORRECTNESS_r*.json) runs through the REAL DuckDB compare
  * (tools/check.py, the driver's own harness) at sf0.001 inside
  * `sbt test` — so "register late, ship unverified" now fails the
  * build instead of the round. Queries already covered by a committed
  * artifact are skipped (the driver re-verifies them every round). */
class OracleGateSpec extends AnyFunSuite {

  test("queries new since the last committed CORRECTNESS artifact " +
      "pass the DuckDB oracle at sf0.001") {
    val latest = Option(new java.io.File(".").listFiles()).get
      .filter(_.getName.matches("CORRECTNESS_r\\d+\\.json"))
      .sortBy(_.getName).lastOption
    val known: Set[String] = latest.map { f =>
      val s = java.nio.file.Files.readString(f.toPath)
      "\"([A-Za-z0-9_]+)\"\\s*:\\s*\\{".r
        .findAllMatchIn(s).map(_.group(1)).toSet
    }.getOrElse(Set.empty)
    val fresh = SparkEntry.queries.keys.filterNot(known).toSeq.sorted
    if (fresh.nonEmpty) {
      info(s"new queries since ${latest.map(_.getName).getOrElse("-")}: " +
        fresh.mkString(", "))
      val out = java.nio.file.Files
        .createTempDirectory("graft-oracle-gate").toString
      val failures = Verify.run(
        SparkTestSession.spark, "/root/testdata/sf0.001", out,
        SparkEntry.queries.toSeq.filter(q => fresh.contains(q._1)),
        SparkEntry.oracleSql.filter(q => fresh.contains(q._1)))
      assert(failures.isEmpty, s"query execution failures: $failures")
      import scala.sys.process._
      val log = new StringBuilder
      val code = Process(Seq("python3", "tools/check.py",
        "/root/testdata/sf0.001", out))
        .!(ProcessLogger(l => log.append(l).append('\n'),
          l => log.append(l).append('\n')))
      assert(code == 0,
        s"DuckDB oracle mismatch for new queries:\n$log")
    }
  }
}
