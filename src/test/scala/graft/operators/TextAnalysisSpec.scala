package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

class TextAnalysisSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("repetitionSignals computes exact known values") {
    val docs = Seq(
      // 6 tokens, 3 distinct -> dup 0.5; top bigram "a b" x2 of
      // 11 chars -> 2*3/11
      (1L, "a b a b c c"),
      // all distinct -> dup 0.0; every bigram count 1, tie breaks to
      // the lexicographically smallest: "one two"
      (2L, "one two three"),
      // single token: no bigram row -> empty top, zero fracs
      (3L, "solo"),
      // case folding: "X x" tokenizes to [x, x]
      (4L, "X x")
    ).toDF("doc_id", "text")

    val r = TextAnalysis.repetitionSignals(docs, "doc_id", "text")
      .orderBy("doc_id")
      .collect()
      .map(x => (x.getLong(0), x.getInt(1), x.getDouble(2),
        x.getString(3), x.getLong(4), x.getDouble(5)))

    assert(r(0) == ((1L, 6, 0.5, "a b", 2L,
      math.rint(2 * 3.0 / 11 * 10000) / 10000)))
    assert(r(1) == ((2L, 3, 0.0, "one two", 1L,
      math.rint(1 * 7.0 / 13 * 10000) / 10000)))
    assert(r(2) == ((3L, 1, 0.0, "", 0L, 0.0)))
    assert(r(3) == ((4L, 2, 0.5, "x x", 1L,
      math.rint(1 * 3.0 / 3 * 10000) / 10000)))
  }

  test("unigramSurprisal ranks rare-token soup above common text") {
    // "the the the ..." tokens dominate the corpus -> low surprisal;
    // doc 3's tokens are unique -> ln(N/1) each, the maximum possible
    val docs = Seq(
      (1L, "the the the the the the"),
      (2L, "the the the cat"),
      (3L, "zq1 zq2 zq3")
    ).toDF("doc_id", "text")
    val r = TextAnalysis.unigramSurprisal(docs, "doc_id", "text")
      .orderBy("doc_id").collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getDouble(2)))
    val n = 13.0 // corpus tokens
    assert(r(0)._2 == 6 && r(1)._2 == 4 && r(2)._2 == 3)
    // doc 1: all "the" (c=9): ln(13/9)
    assert(math.abs(r(0)._3 - math.rint(math.log(n / 9) * 100) / 100) < 1e-9)
    // doc 3: three singletons: ln(13)
    assert(math.abs(r(2)._3 - math.rint(math.log(n) * 100) / 100) < 0.011)
    assert(r(2)._3 > r(1)._3 && r(1)._3 > r(0)._3)
  }

  test("shingleNovelty scores unique content 1, shared boilerplate 0") {
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon"),       // all trigrams unique
      (2L, "shared boilerplate words here exactly"),
      (3L, "shared boilerplate words here exactly"), // verbatim copy of 2
      // half borrowed from doc 2's trigrams, half original
      (4L, "shared boilerplate words here exactly plus fresh original tail"))
      .toDF("doc_id", "text")
    val r = TextAnalysis.shingleNovelty(docs, "doc_id", "text")
      .orderBy("doc_id").collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getDouble(2))).toList
    assert(r(0) == (1L, 3L, 1.0))       // 3 trigrams, all df=1
    assert(r(1)._3 == 0.0 && r(2)._3 == 0.0) // copies: every trigram df>=2
    // doc 4: 7 trigrams, the 3 borrowed ones have df=3, the 4 with new
    // words are unique -> novelty 4/7
    assert(r(3)._2 == 7L && math.abs(r(3)._3 - math.rint(4.0 / 7 * 10000) / 10000) < 1e-9)
  }

  test("repetitionSignals tie-break is the smallest bigram, not plan order") {
    // "b a b a": bigrams [b a, a b, b a] -> "b a" wins on count;
    // "c d c d e c d": "c d" x3 beats "d c" x2 and "d e"/"e c" x1
    val docs = Seq((1L, "b a b a"), (2L, "c d c d e c d"))
      .toDF("doc_id", "text")
    val r = TextAnalysis.repetitionSignals(docs, "doc_id", "text")
      .orderBy("doc_id").collect()
    assert(r(0).getString(3) == "b a" && r(0).getLong(4) == 2L)
    assert(r(1).getString(3) == "c d" && r(1).getLong(4) == 3L)
  }

  test("removeBoilerplateLines drops cross-doc lines, keeps order") {
    val docs = Seq(
      (1L, "unique one\nCOOKIE BANNER\nunique two"),
      (2L, "COOKIE BANNER\nother content\nFOOTER\nother content"),
      (3L, "FOOTER\nCOOKIE BANNER"), // all boilerplate -> empty, not missing
      (4L, "solo line")
    ).toDF("doc_id", "text")
    val out = TextAnalysis.removeBoilerplateLines(docs, "doc_id", "text")
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(out(0) == ((1L, "unique one\nunique two", 2L, 1L)))
    // within-doc duplicate of a line no OTHER doc has is KEPT twice,
    // in original positions (df counts distinct docs, not occurrences)
    assert(out(1) == ((2L, "other content\nother content", 2L, 2L)))
    assert(out(2) == ((3L, "", 0L, 2L)))
    assert(out(3) == ((4L, "solo line", 1L, 0L)))
    // deterministic across partitionings
    val again = TextAnalysis.removeBoilerplateLines(
      docs.repartition(5), "doc_id", "text")
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(again.toSeq == out.toSeq)
    // a higher df cap keeps lines under it
    val relaxed = TextAnalysis.removeBoilerplateLines(
      docs, "doc_id", "text", maxDf = 2)
      .orderBy("doc_id").collect()
    assert(relaxed(2).getString(1) == "FOOTER") // df=2 survives maxDf=2
  }
}
