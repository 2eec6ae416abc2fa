package graft

import org.scalatest.funsuite.AnyFunSuite

/** The export pipeline's conditional doing real work: a normal corpus
  * flows dedup → repetition gate → packing → per-split summary; a
  * boilerplate corpus (every doc one token repeated) collapses at the
  * gate and routes to Reject. */
class ExportPipelineSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("normal corpus packs and summarizes per split") {
    val out = ExportPipeline.run(spark, "/root/testdata/sf0.001")
    val rows = out.collect()
    val splits = rows.map(_.getAs[String]("split")).toSet
    assert(splits.subsetOf(Set("train", "val", "test")) && splits.nonEmpty)
    // bins partition the token stream: total tokens across splits must
    // cover (n_bins-ish) * 512 within one window's slack
    val totalTokens = rows.map(_.getAs[Long]("total_tokens")).sum
    val totalBins = rows.map(_.getAs[Long]("n_bins")).sum
    assert(totalTokens > 0 && totalBins >= totalTokens / 512)
  }

  test("boilerplate collapse routes to the Reject branch") {
    val dir = java.nio.file.Files.createTempDirectory("graft-export").toString
    // every doc is one token repeated 40x (distinct texts so dedup keeps
    // them): dup_token_frac ~0.975 for all -> 0% survive -> Reject
    (1 to 50).map(i => (i.toLong, Seq.fill(40)(s"tok$i").mkString(" ")))
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = ExportPipeline.run(spark, dir)
    val rows = out.collect()
    assert(rows.length == 1)
    assert(rows.head.getAs[String]("alert") == "repetition_collapse")
  }
}
