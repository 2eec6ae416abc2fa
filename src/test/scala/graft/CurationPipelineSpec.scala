package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** The curation pipeline's CONDITIONAL actually conditioning: a healthy
  * corpus flows to split/summary; a collapsed one (quality gate kills
  * more than half) routes to the Reject branch and surfaces the alert. */
class CurationPipelineSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("healthy corpus flows through split to the summary") {
    val out = CurationPipeline.run(spark, "/root/testdata/sf0.001")
    val splits = out.select("split").collect().map(_.getString(0)).toSet
    assert(splits.subsetOf(Set("train", "val", "test")) && splits.nonEmpty)
  }

  test("quality collapse routes to the Reject branch") {
    val dir = java.nio.file.Files.createTempDirectory("graft-curation").toString
    // junk corpus: no stopwords, all punctuation/digits → quality ~0 for
    // every doc → surviving fraction 0% < 50% → failure branch
    // no stopwords, 15-char tokens (mean token length > 10), all
    // punctuation → every quality term is 0
    (1 to 50).map(i => (i.toLong, s"@@@@@@@@@@@@@@@ ############### %%%%%%%%%%%%$i"))
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = CurationPipeline.run(spark, dir)
    val rows = out.collect()
    assert(rows.length == 1)
    assert(rows.head.getAs[String]("alert") == "quality_collapse")
  }
}
