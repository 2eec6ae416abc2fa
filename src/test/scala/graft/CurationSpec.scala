package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

class CurationSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("the full fluent chain runs and monotonically filters") {
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val n0 = docs.count()
    val c1 = Curation(docs).dedupExact()
    val n1 = c1.df.count()
    val c2 = c1.dropNearDups(threshold = 0.8)
    val n2 = c2.df.count()
    val c3 = c2.filterQuality(0.3).filterRepetition(maxDupTokenFrac = 0.65)
    val n3 = c3.df.count()
    assert(n1 <= n0 && n2 <= n1 && n3 <= n2 && n3 > 0,
      s"counts $n0 -> $n1 -> $n2 -> $n3")

    val labeled = c3.scrubPii().split().df
    assert(labeled.columns.contains("split"))
    assert(labeled.count() == n3) // scrub and split drop nothing

    val packed = c3.pack(budget = 512L)
    assert(packed.count() == n3)
    assert(packed.columns.toSet ==
      Set("doc_id", "n_tokens", "start_offset", "bin_id", "spans_boundary"))

    val shuffled = c3.exportShuffled()
    assert(shuffled.count() == n3)
    // ranks are a permutation of 1..n
    val ranks = shuffled.select("shuffle_rank").collect().map(_.getLong(0))
    assert(ranks.sorted.toSeq == (1L to n3).toSeq)
  }

  test("facade steps agree with the gate operators they wrap") {
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val viaFacade = Curation(docs).dedupExact().df
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val direct = operators.Dedup.exact(docs, "doc_id", "text")
      .filter(col("is_canonical")).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(viaFacade == direct)
  }
}
