package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.{DataFrame, SparkSession}
import java.nio.file.{Files, Paths}

/** The correctness-dump loop must surface failures, not swallow them:
  * a throwing query gets a `failures.json` row and a non-empty return
  * (main turns that into exit 1), and healthy queries still dump. */
class VerifySpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  private def scratch(): String =
    Files.createTempDirectory("graft-verify-spec").toString

  test("run() returns empty failures and writes artifacts on success") {
    val out = scratch()
    val reg: Seq[(String, (SparkSession, String) => DataFrame)] = Seq(
      "ok_region" -> ((s: SparkSession, dir: String) =>
        Tables.load(s, dir, "region")))
    val failures = Verify.run(spark, sf, out, reg,
      Map("ok_region" -> "SELECT * FROM region"))
    assert(failures.isEmpty)
    assert(Files.exists(Paths.get(s"$out/ok_region")))
    assert(Files.readString(Paths.get(s"$out/failures.json")) == "{}")
    assert(Files.readString(Paths.get(s"$out/oracle_sql.json"))
      .contains("ok_region"))
  }

  test("run() records a throwing query in failures.json and its return") {
    val out = scratch()
    val reg: Seq[(String, (SparkSession, String) => DataFrame)] = Seq(
      "ok_region" -> ((s: SparkSession, dir: String) =>
        Tables.load(s, dir, "region")),
      "boom" -> ((s: SparkSession, _: String) =>
        s.sql("SELECT raise_error('deliberate verify-spec failure')")))
    val failures = Verify.run(spark, sf, out, reg, Map.empty)
    assert(failures.keySet == Set("boom"))
    assert(failures("boom").contains("deliberate verify-spec failure") ||
      failures("boom").nonEmpty)
    val manifest = Files.readString(Paths.get(s"$out/failures.json"))
    assert(manifest.contains("\"boom\""))
    // the healthy query still dumped — one bad query must not starve the rest
    assert(Files.exists(Paths.get(s"$out/ok_region")))
  }
}
