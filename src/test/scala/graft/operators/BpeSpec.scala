package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestSession

/** BPE merge training against hand-computed fixtures; the sf-scale
  * replay against the unrolled DuckDB oracle runs in the aq32 gate. */
class BpeSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("MergeBigram is greedy left-to-right, non-overlapping") {
    val d = Seq(
      (1L, Seq("x", "x", "x")),
      (2L, Seq("a", "x", "y", "x")),
      (3L, Seq("y", "x")),
      (4L, Seq("x"))).toDF("id", "sym")
    val gotXX = d.select(col("id"),
        Bpe.mergeBigram(col("sym"), "x", "x").as("m"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(gotXX(1L) == Seq("xx", "x"))
    assert(gotXX(4L) == Seq("x"))
    val gotXY = d.select(col("id"),
        Bpe.mergeBigram(col("sym"), "x", "y").as("m"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(gotXY(2L) == Seq("a", "xy", "x"))
    assert(gotXY(3L) == Seq("y", "x"))
  }

  test("learnMerges reproduces the hand-computed merge sequence") {
    // histogram: aaab ×2, ba ×1
    //   iter1 pairs: aa:4 ab:2 ba:1            -> (a,a,4);  aaab -> aa|a|b
    //   iter2 pairs: (aa,a):2 (a,b):2 (b,a):1  -> tie on 2, 'a' < 'aa'
    //                                          -> (a,b,2);  -> aa|ab
    //   iter3 pairs: (aa,ab):2 (b,a):1         -> (aa,ab,2)
    //   iter4 pairs: (b,a):1                   -> (b,a,1)
    //   iter5: no pairs left -> stops at 4 of the requested 6
    val d = Seq((1L, "aaab aaab ba")).toDF("id", "text")
    val got = Bpe.learnMerges(d, "text", 6)
      .collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
      .toSeq
    assert(got == Seq(
      (1, "a", "a", 4L), (2, "a", "b", 2L),
      (3, "aa", "ab", 2L), (4, "b", "a", 1L)))
  }

  test("tokenCounts segments with learned merges: hand-checked counts") {
    // merges learned on "aaab aaab ba": (a,a), (a,b), (aa,ab), (b,a)
    //   "aaab": [a,a,a,b] -> [aa,a,b] -> [aa,ab] -> [aaab]   = 1 token
    //   "ba":   [b,a]     -> (b,a)                -> [ba]    = 1 token
    //   "aab":  [a,a,b]   -> [aa,b]   (no (a,b): pair is (aa,b)) = 2
    val train = Seq((1L, "aaab aaab ba")).toDF("id", "text")
    val merges = Bpe.learnMerges(train, "text", 6)
      .collect().map(r => (r.getString(1), r.getString(2))).toSeq
    val score = Seq((10L, "aaab ba aab")).toDF("id", "text")
    val out = Bpe.tokenCounts(score, "id", "text", merges).collect()
    assert(out.length == 1)
    assert((out(0).getLong(1), out(0).getLong(2)) == ((3L, 4L)))
    // per-word segment counts directly
    val lens = Seq("aaab", "ba", "aab").toDF("w")
      .select(col("w"), Bpe.bpeSegmentCount(col("w"), merges).as("n"))
      .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    assert(lens == Map("aaab" -> 1, "ba" -> 1, "aab" -> 2))
  }

  test("non-lowercase and non-alpha tokens are excluded from training") {
    val d = Seq((1L, "AB ab ab 12 a-b")).toDF("id", "text")
    // only "ab" (from AB lowered + two literal) survives the [a-z]+ gate
    val got = Bpe.learnMerges(d, "text", 1).collect()
    assert(got.length == 1)
    assert((got(0).getString(1), got(0).getString(2), got(0).getLong(3)) ==
      ("a", "b", 3L))
  }

  test("fertility: hand-checked tokens-per-word under a fixed merge") {
    import spark.implicits._
    // merge (a,a): "aa" → 1 token, "ab" → [a, b] = 2, "b" → 1
    val d = Seq(("s1", "aa aa ab"), ("s2", "b"))
      .toDF("source", "text")
    val got = Bpe.fertility(d, "source", "text", Seq(("a", "a")))
      .as[(String, Long, Long, Double)].collect().toSeq
    assert(got == Seq(("s1", 3L, 4L, 1.333333), ("s2", 1L, 1L, 1.0)),
      got.toString)
  }
}
