package graft

import org.scalatest.funsuite.AnyFunSuite

/** The maintenance pipeline's conditional doing real work: a
  * fragmented ingest triggers compaction (file count collapses), a
  * high threshold routes to the skip arm — content identical on both. */
class MaintenancePipelineSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def files(root: String): Int =
    new graft.sources.ResultStore(spark, root).dataFileCount("li")

  test("fragmented ingest compacts; skip arm leaves files; content equal") {
    val sf = "/root/testdata/sf0.001"
    val rootA = java.nio.file.Files.createTempDirectory("graft-mntA").toString
    val a = MaintenancePipeline.run(spark, sf, rootA, maxFiles = 10)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(files(rootA) <= 2, s"compaction must collapse files: ${files(rootA)}")

    val rootB = java.nio.file.Files.createTempDirectory("graft-mntB").toString
    val b = MaintenancePipeline.run(spark, sf, rootB, maxFiles = 1000)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(files(rootB) > 10, "skip arm must leave the fragmentation")
    assert(a == b, "report content must be identical on both arms")
  }
}
