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

  test("tokenKlDivergence: exactly zero on self, known value on a split") {
    val docs = Seq((1L, "a a b"), (2L, "a b b c")).toDF("doc_id", "text")
    val self = TextAnalysis.tokenKlDivergence(docs, docs, "text").head()
    // ln(1) terms round to exact zero — no float residue
    assert(self.getDouble(0) == 0.0)
    assert(self.getLong(1) == 7L && self.getLong(2) == 7L &&
      self.getLong(3) == 3L)
    // P = doc 1: p(a)=2/3, p(b)=1/3; Q: counts a=3, b=3, c=1 over 7
    val kl = TextAnalysis.tokenKlDivergence(
      docs.filter($"doc_id" === 1), docs, "text").head()
    val expected = (2.0 / 3) * math.log(2.0 * 7 / (3 * 3)) +
      (1.0 / 3) * math.log(1.0 * 7 / (3 * 3))
    assert(math.abs(kl.getDouble(0) - expected) < 1e-5, kl.getDouble(0))
    assert(kl.getLong(1) == 3L && kl.getLong(2) == 7L && kl.getLong(3) == 2L)
  }

  test("zipfProfile: exact slope and TTR on a known distribution") {
    // one group, counts a=4 b=2 c=1 -> ranks 1,2,3
    val docs = Seq((1L, "s1", "a a b c"), (2L, "s1", "a a b"))
      .toDF("doc_id", "source", "text")
    val r = TextAnalysis.zipfProfile(docs, "source", "text").head()
    val xs = Seq(1.0, 2.0, 3.0).map(math.log)
    val ys = Seq(4.0, 2.0, 1.0).map(math.log)
    val n = 3.0
    val (sx, sy) = (xs.sum, ys.sum)
    val sxy = xs.zip(ys).map { case (a, b) => a * b }.sum
    val sxx = xs.map(a => a * a).sum
    val slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    assert(r.getString(0) == "s1")
    assert(math.abs(r.getDouble(1) - slope) < 1e-5, r.getDouble(1))
    assert(r.getLong(2) == 3L && r.getLong(3) == 7L)
    assert(math.abs(r.getDouble(4) - 3.0 / 7) < 1e-5)
  }

  test("zipfProfile: topN cuts the fit, groups stay independent") {
    val docs = Seq(
      (1L, "s1", "a a a a b b c"), // fit over top-2: a(4),b(2)
      (2L, "s2", "x y")            // uniform counts, tie-break on token
    ).toDF("doc_id", "source", "text")
    val r = TextAnalysis.zipfProfile(docs, "source", "text", topN = 2)
      .orderBy("source").collect()
    // s1 slope over (ln1,ln4),(ln2,ln2): exact two-point slope
    val s1 = (math.log(2) - math.log(4)) / (math.log(2) - math.log(1))
    assert(math.abs(r(0).getDouble(1) - s1) < 1e-5)
    assert(r(0).getLong(2) == 3L && r(0).getLong(3) == 7L)
    // s2: both counts 1 -> ys all 0 -> slope 0; ttr = 2/2
    assert(r(1).getDouble(1) == 0.0)
    assert(r(1).getDouble(4) == 1.0)
  }

  test("zipfProfile: degenerate single-token group yields NULL slope, not NaN") {
    val docs = Seq((1L, "s1", "x x x")).toDF("doc_id", "source", "text")
    val r = TextAnalysis.zipfProfile(docs, "source", "text").head()
    assert(r.isNullAt(1), r)
    assert(r.getLong(2) == 1L && r.getLong(3) == 3L)
  }

  test("vocabCoverage: exact ranks, counts, cumulative coverage") {
    val docs = Seq((1L, "a a a b"), (2L, "b c A")).toDF("doc_id", "text")
    // case-folded counts: a=4, b=2, c=1; total 7
    val r = TextAnalysis.vocabCoverage(docs, "text", topN = 2)
      .orderBy("rank").collect()
      .map(x => (x.getLong(0), x.getString(1), x.getLong(2), x.getDouble(3)))
    assert(r.toSeq == Seq(
      (1L, "a", 4L, math.rint(4.0 / 7 * 1e6) / 1e6),
      (2L, "b", 2L, math.rint(6.0 / 7 * 1e6) / 1e6)))
  }

  test("removeBoilerplateLines keeps NULL-text docs (as empty), never drops them") {
    val docs = Seq((1L, "keep me\nBANNER"), (2L, "BANNER\nme too"),
      (3L, null: String)).toDF("doc_id", "text")
    val r = TextAnalysis.removeBoilerplateLines(docs, "doc_id", "text")
      .orderBy("doc_id").collect()
    assert(r.length == 3) // null-text doc 3 still present
    assert(r(0).getString(1) == "keep me" && r(1).getString(1) == "me too")
    assert(r(2).getString(1) == "") // null treated as empty, not missing
  }

  test("NULL docs do not poison blank-line frequency for other docs") {
    // doc 1 has a genuine paragraph-separator blank line; docs 2 and 3
    // are NULL — they must not make "" cross the maxDf cap
    val docs = Seq((1L, "a\n\nb"), (2L, null: String), (3L, null: String))
      .toDF("doc_id", "text")
    val r = TextAnalysis.removeBoilerplateLines(docs, "doc_id", "text")
      .orderBy("doc_id").collect()
    assert(r(0).getString(1) == "a\n\nb", r(0).getString(1))
    assert(r(1).getString(1) == "" && r(1).getLong(2) == 0L &&
      r(1).getLong(3) == 0L)
  }

  test("removeBoilerplateLines shuffle-join mode agrees with broadcast mode") {
    val docs = Seq((1L, "a\nCHROME"), (2L, "CHROME\nb"), (3L, "c"))
      .toDF("doc_id", "text")
    val bc = TextAnalysis.removeBoilerplateLines(docs, "doc_id", "text")
      .orderBy("doc_id").collect().toSeq
    val sj = TextAnalysis.removeBoilerplateLines(docs, "doc_id", "text",
      broadcastFlags = false).orderBy("doc_id").collect().toSeq
    assert(bc == sj)
  }

  test("modelQualityScore: exact sigmoid on known features, empty-doc gate") {
    val docs = Seq((1L, "the the the"), (2L, "")).toDF("doc_id", "text")
    val r = TextAnalysis.modelQualityScore(docs, "doc_id", "text")
      .orderBy("doc_id").collect()
    // doc 1: stop_ratio 1.0, mtl 3.0, noise 0, log_len ln(4)
    val z1 = -2.0 + 4.0 * 1.0 + 0.6 * math.log(4.0) - 0.0 + 0.15 * 3.0
    assert(math.abs(r(0).getDouble(1) - 1.0 / (1.0 + math.exp(-z1))) < 1e-5)
    assert(r(0).getBoolean(2))
    // empty doc: all features zero -> z = bias -> score < 0.5 -> rejected
    assert(math.abs(r(1).getDouble(1) - 1.0 / (1.0 + math.exp(2.0))) < 1e-5)
    assert(!r(1).getBoolean(2))
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

  test("bigramNll matches the hand-computed smoothed bigram model") {
    // corpus: d1 = "a a b", d2 = "a b", d3 = "solo"
    // V = 3 (a, b, solo — vocab spans the WHOLE corpus, bigram-less
    // docs included); c(a,a)=1 c(a,b)=2 c(a)=3; alpha = 0.5:
    // p(a|a) = 1.5/4.5 = 1/3, p(b|a) = 2.5/4.5 = 5/9
    // d1: (round6(-ln 1/3) + round6(-ln 5/9)) / 2
    //   = (1.098612 + 0.587787) / 2 = 0.8432
    // d2: 0.587787 / 1 = 0.5878
    val d = Seq((1L, "a a b"), (2L, "a b"), (3L, "solo"))
      .toDF("doc_id", "text")
    val out = TextAnalysis.bigramNll(d, "doc_id", "text")
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(out == Seq((1L, 2L, 0.8432), (2L, 1L, 0.5878)))
    // <2-token docs have no bigram events and are absent
    assert(!out.exists(_._1 == 3L))
  }

  test("contaminationSpans finds the longest verbatim run, not scattered hits") {
    val bench = Seq((100L, "a b c d e f")).toDF("doc_id", "text")
    val corpus = Seq(
      (1L, "x x a b c d e x x"),  // run of 3 shingles -> span 5 tokens
      (2L, "a b c z z c d e"),    // two scattered single matches -> span 3
      (3L, "q r s t")             // clean
    ).toDF("doc_id", "text")
    val out = Dedup.contaminationSpans(corpus, "doc_id", "text",
        bench, "text")
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq
    assert(out == Seq(
      (1L, 7L, 3L, 5L), (2L, 6L, 1L, 3L), (3L, 2L, 0L, 0L)))
  }

  test("qualityRuleFilter: per-rule attribution and keep verdict") {
    val stops = Seq("the", "data")
    val docs = Seq(
      // passes everything: 7 words, mwl=29/7=4.1429, 2 stop hits,
      // distinct 7/7, top share 1/7=0.1429
      (1L, "data lakes scale with the grid fast"),
      // wc (3 words), stop (1 hit), top (2/3=0.6667); mwl=4.0 passes
      // on the inclusive bound
      (2L, "data word word"),
      // mwl 39/10=3.9, rep 3/10=0.3, top 8/10=0.8; 2 stop hits pass
      (3L, "the data word word word word word word word word"),
      // mwl 2.0 and no stop hits; distinct 1.0 + top 1/8 pass
      (4L, "ab cd ef gh ij kl mn op"))
      .toDF("doc_id", "text")
    val out = TextAnalysis.qualityRuleFilter(
      docs, "doc_id", "text", stops,
      minWords = 5, maxWords = 90)
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("fails"),
        r.getAs[Boolean]("keep"))).toSeq
    assert(out == Seq(
      (1L, "", true),
      (2L, "wc,stop,top", false),
      (3L, "mwl,rep,top", false),
      (4L, "mwl,stop", false)))
  }

  test("wordEntropy: hand-computed nats, uniform hits norm 1, constant 0") {
    val docs = Seq(
      (1L, "a a b b"),      // H = ln2 = 0.693147, norm exactly 1
      (2L, "a a a a"),      // single word: H = 0, norm 0 (V = 1 guard)
      (3L, "a a a b"))      // -(0.75 ln .75 + 0.25 ln .25) = 0.562335
      .toDF("doc_id", "text")
    val out = TextAnalysis.wordEntropy(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4))).toMap
    assert(out(1L) == ((4L, 2L, 0.693147, 1.0)))
    assert(out(2L) == ((4L, 1L, 0.0, 0.0)))
    assert(out(3L)._3 == 0.562335)
    assert(out(3L)._4 > 0.8 && out(3L)._4 < 0.82)
  }

  test("qualityRuleFilter: top_share is the mode count over n_words") {
    val out = TextAnalysis.qualityRuleFilter(
      Seq((1L, "b b b a a c")).toDF("doc_id", "text"),
      "doc_id", "text", Seq("the"), minWords = 1)
      .select("top_share", "distinct_ratio", "n_words").collect()(0)
    assert(out.getAs[Double]("top_share") == 0.5) // 3 of 6
    assert(out.getAs[Double]("distinct_ratio") == 0.5)
    assert(out.getAs[Int]("n_words") == 6)
  }

  test("readability: hand-computed Flesch / FK-grade") {
    // "the cat sat. it ran!": 5 words, 2 sentence runs (. and !),
    // 1 vowel group per word -> 5 syllables. wps=2.5, spw=1.0:
    //   flesch = 206.835 - 1.015*2.5 - 84.6*1.0 = 119.6975
    //   fk     = 0.39*2.5 + 11.8*1.0 - 15.59   = -2.815
    val out = TextAnalysis.readability(
      Seq((1L, "the cat sat. it ran!")).toDF("doc_id", "text"),
      "doc_id", "text").collect()(0)
    assert(out.getAs[Int]("n_words") == 5)
    assert(out.getAs[Int]("n_sentences") == 2)
    assert(out.getAs[Long]("n_syllables") == 5L)
    assert(out.getAs[Double]("flesch") == 119.6975)
    assert(out.getAs[Double]("fk_grade") == -2.815)
  }

  test("readability: vowelless words floor at 1 syllable, no-punct text is 1 sentence") {
    // "psst hmm" — zero vowel groups in both words, floor 1 each;
    // "burrito" — vowel groups u,i,o -> 3.
    val out = TextAnalysis.readability(
      Seq((1L, "psst hmm"), (2L, "burrito")).toDF("doc_id", "text"),
      "doc_id", "text").collect()
    assert(out(0).getAs[Int]("n_sentences") == 1)
    assert(out(0).getAs[Long]("n_syllables") == 2L)
    assert(out(1).getAs[Long]("n_syllables") == 3L)
  }

  test("keywords: smoothed TF-IDF ranks, ubiquitous terms score zero") {
    // N=2; df: a=1 b=2 c=1. idf(a)=idf(c)=ln(3/2), idf(b)=ln(3/3)=0.
    val docs = Seq((1L, "a a b"), (2L, "b c")).toDF("doc_id", "text")
    val out = TextAnalysis.keywords(docs, "doc_id", "text", topK = 3)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2),
        r.getLong(3), r.getDouble(4)))
    assert(out.toSeq == Seq(
      (1L, 1, "a", 2L, 0.81093),
      (1L, 2, "b", 1L, 0.0),
      (2L, 1, "c", 1L, 0.405465),
      (2L, 2, "b", 1L, 0.0)))
  }

  test("pmiCollocations: hand-computed PMI, count floor, tie order") {
    // unigrams: a=2 b=2 c=1 d=1 (N=6); bigrams: (a,b)×2 (b,a)×1 (c,d)×1
    // (N=4). pmi(c,d)=ln(36/4)=2.197225, pmi(a,b)=ln(72/16)=1.504077,
    // pmi(b,a)=ln(36/16)=0.81093 — rarer pairs rank higher, the PMI
    // signature.
    val docs = Seq((1L, "a b a b"), (2L, "c d")).toDF("doc_id", "text")
    val out = TextAnalysis
      .pmiCollocations(docs, "doc_id", "text", minCount = 1L, topK = 10)
      .collect().map(r => (r.getString(0), r.getString(1),
        r.getLong(2), r.getDouble(3)))
    assert(out.toSeq == Seq(
      ("c", "d", 1L, 2.197225),
      ("a", "b", 2L, 1.504077),
      ("b", "a", 1L, 0.81093)))
    // minCount floor drops everything below it
    val floored = TextAnalysis
      .pmiCollocations(docs, "doc_id", "text", minCount = 2L, topK = 10)
      .collect()
    assert(floored.map(r => (r.getString(0), r.getString(1))).toSeq ==
      Seq(("a", "b")))
    // bigrams never cross document boundaries: (b,c) does not exist
    assert(!out.exists(p => p._1 == "b" && p._2 == "c"))
  }

  test("zipfFit: three-word corpus matches a driver OLS replay") {
    // freqs a:4 b:2 c:1 -> ranks 1,2,3
    val docs = Seq((1L, "a a b a c a b")).toDF("doc_id", "text")
    val got = TextAnalysis.zipfFit(docs, "text").head()
    def r(x: Double, s: Int) = java.math.BigDecimal.valueOf(x)
      .setScale(s, java.math.RoundingMode.HALF_UP).doubleValue()
    val pts = Seq((1, 4), (2, 2), (3, 1)).map { case (rk, f) =>
      (r(math.log(rk.toDouble), 6), r(math.log(f.toDouble), 6))
    }
    val n = pts.size
    def dsum(xs: Seq[Double]) = xs.map(BigDecimal(_)).sum.toDouble
    val (sx, sy) = (dsum(pts.map(_._1)), dsum(pts.map(_._2)))
    val sxy = dsum(pts.map(p => r(p._1 * p._2, 10)))
    val sxx = dsum(pts.map(p => r(p._1 * p._1, 10)))
    val slope = r((n * sxy - sx * sy) / (n * sxx - sx * sx), 6)
    val intercept = r((sy - slope * sx) / n, 6)
    assert(got.getLong(0) == 3L)
    assert(got.getDouble(1) == slope && got.getDouble(2) == intercept,
      s"$got vs ($slope, $intercept)")
    // near-Zipf corpus: slope is negative and steep-ish
    assert(got.getDouble(1) < -0.5)
  }

  test("textRank: symmetric two-word graph is the 0.5/0.5 fixed point; " +
      "empty tokens and self-pairs drop") {
    // "a  b a": the double space makes an empty token (dropped), the
    // distance-2 pair (a,a) is a self-pair (dropped) — what remains is
    // the symmetric a↔b graph, whose pageRank fixed point is 0.5/0.5,
    // ties broken alphabetically
    val docs = Seq((1L, "a  b a")).toDF("doc_id", "text")
    val got = TextAnalysis.textRank(docs, "doc_id", "text")
      .as[(String, Double)].collect().toSeq
    assert(got == Seq(("a", 0.5), ("b", 0.5)), got.toString)
  }

  test("jensenShannon: hand-computed mixture terms, disjoint = ln 2") {
    val docs = Seq(
      ("g1", "a a b b"), ("g2", "a a a a"), ("g3", "c"))
      .toDF("lang", "text")
    val got = TextAnalysis.jensenShannon(docs, "lang", "text")
      .as[(String, String, Long, Long, Double)].collect().toSeq
    // (g1,g2): 1/2[.5 ln(2/3) + .5 ln 2] + 1/2[1 ln(4/3)] = 0.215762;
    // disjoint distributions hit the JSD ceiling ln 2 = 0.693147
    assert(got == Seq(
      ("g1", "g2", 2L, 1L, 0.215762),
      ("g1", "g3", 3L, 0L, 0.693147),
      ("g2", "g3", 2L, 0L, 0.693147)), got.toString)
    // identical distributions: exactly zero
    val same = TextAnalysis.jensenShannon(
      Seq(("x", "a b"), ("y", "a b")).toDF("lang", "text"),
      "lang", "text").as[(String, String, Long, Long, Double)]
      .collect().head
    assert(same._5 == 0.0, same.toString)
  }

  test("kneserNeyBigrams: hand-computed discount and continuation mass") {
    // corpus "a b", "a b", "a c": c(a,b)=2, c(a,c)=1, c(a·)=3,
    // N1+(a·)=2, N1+(·b)=N1+(·c)=1, N1+(··)=2, D=0.75:
    //   p(b|a) = (1.25 + 0.75*2*0.5)/3 = 2/3
    //   p(c|a) = (0.25 + 0.75*2*0.5)/3 = 1/3
    val docs = Seq("a b", "a b", "a c").toDF("text")
    val got = TextAnalysis.kneserNeyBigrams(docs, "text")
      .as[(String, String, Long, Double)].collect().toSeq
    assert(got == Seq(
      ("a", "b", 2L, 0.666667),
      ("a", "c", 1L, 0.333333)), got.toString)
    // discounted mass + continuation mass is a proper distribution:
    // sum over observed continuations stays <= 1 for every context
    assert(got.map(_._4).sum <= 1.0 + 1e-9)
    // topK caps the table deterministically (count desc, then words)
    val top1 = TextAnalysis.kneserNeyBigrams(docs, "text", topK = 1)
      .as[(String, String, Long, Double)].collect().toSeq
    assert(top1 == Seq(("a", "b", 2L, 0.666667)), top1.toString)
  }

  test("negativeSamplingTable: exact ^0.75 shares, draws partition " +
    "the table, deterministic") {
    // tokens a:3, b:1 → wu_a = round(√(3·√3), 8)·1e8 = 227950706,
    // wu_b = 1e8; Z = 327950706 → share_a = 0.695077, share_b = 0.304923
    val docs = Seq("a a a b").toDF("text")
    val got = TextAnalysis.negativeSamplingTable(docs, "text",
      vocabSize = 10, draws = 1000, topK = 10)
      .as[(String, Long, Double)].collect().toSeq
    assert(got.map(_._1).sorted == Seq("a", "b"))
    val byTok = got.map(t => t._1 -> t).toMap
    assert(byTok("a")._3 ==
      math.rint(227950706.0 / 327950706.0 * 1e6) / 1e6)
    assert(byTok("b")._3 ==
      math.rint(100000000.0 / 327950706.0 * 1e6) / 1e6)
    // every draw lands in exactly one bucket, heavy token drawn more
    assert(got.map(_._2).sum == 1000L, got.toString)
    assert(byTok("a")._2 > byTok("b")._2)
    // bit-identical across runs
    val again = TextAnalysis.negativeSamplingTable(docs, "text",
      vocabSize = 10, draws = 1000, topK = 10)
      .as[(String, Long, Double)].collect().toSeq
    assert(got == again)
  }

  test("heapsFit: first-seen vocabulary growth and the 2-point fit") {
    // checkpoints at ids 2 and 4: N(2)=4,V(2)=3; N(4)=7,V(4)=4 ->
    // beta = slope of (ln4,ln3)-(ln7,ln4) via the least-squares
    // pipeline = 0.514071, log_k = 0.385958
    val docs = Seq((1L, "a b"), (2L, "a c"), (3L, "a b"), (4L, "d"))
      .toDF("doc_id", "text")
    val got = TextAnalysis.heapsFit(docs, "doc_id", "text",
        checkpoints = 2)
      .as[(Long, Long, Long, Option[Double], Option[Double])]
      .collect().toSeq
    assert(got == Seq(
      (2L, 4L, 3L, Some(0.514071), Some(0.385958)),
      (4L, 7L, 4L, Some(0.514071), Some(0.385958))), got.toString)
    // a single populated checkpoint cannot support a slope: explicit
    // NULL fit (rounded sums leave the denominator a hair off zero,
    // so the guard is on the point count, not den)
    val one = TextAnalysis.heapsFit(
      Seq((5L, "a b c")).toDF("doc_id", "text"), "doc_id", "text",
      checkpoints = 3)
      .as[(Long, Long, Long, Option[Double], Option[Double])]
      .collect().toSeq
    assert(one == Seq((5L, 3L, 3L, None, None)), one.toString)
  }

  test("burstiness: hand-computed Fano factors, absent docs count as zero") {
    // D=3 docs. 'a': counts (2,1,0) -> C=3, S2=5, mean=1,
    // fano = (5/3 - 1)/1 = 0.666667; 'b': (1,1,1) -> fano 0 (even)
    val docs = Seq((1L, "a a b"), (2L, "a b"), (3L, "b"))
      .toDF("doc_id", "text")
    val got = TextAnalysis.burstiness(docs, "doc_id", "text")
      .as[(String, Long, Long, Double)].collect().toSeq
    assert(got == Seq(
      ("a", 2L, 3L, 0.666667),
      ("b", 3L, 3L, 0.0)), got.toString)
    // topN cuts on (count desc, token)
    val cut = TextAnalysis.burstiness(docs, "doc_id", "text", topN = 1)
      .as[(String, Long, Long, Double)].collect().toSeq
    assert(cut.map(_._1) == Seq("a"), cut.toString)
  }

  test("entropyRate: templated vs varied bigrams, hand-computed entropies") {
    // g1 "a b a b": bigrams (a,b)x2, (b,a) -> H(W2|W1) = 0 (every w1
    // fully determines w2); H(W1) = (2/3)ln(3/2) + (1/3)ln3 = 0.636514
    // g2 "a b a c": (a,b),(b,a),(a,c) -> H_cond = (2/3)ln2 = 0.462098,
    // same margin -> ratio 0.725982
    val docs = Seq(("g1", "a b a b"), ("g2", "a b a c"))
      .toDF("src", "text")
    val got = TextAnalysis.entropyRate(docs, "src", "text")
      .as[(String, Long, Double, Double, Option[Double])].collect().toSeq
    assert(got == Seq(
      ("g1", 3L, 0.0, 0.636514, Some(0.0)),
      ("g2", 3L, 0.462098, 0.636514, Some(0.725982))), got.toString)
    // a one-token group has no bigrams and is absent
    val tiny = TextAnalysis.entropyRate(
      Seq(("g", "solo")).toDF("src", "text"), "src", "text")
    assert(tiny.count() == 0)
  }

  test("goodTuring: count-of-counts, Turing r*, unseen mass, Katz cutoff") {
    // counts: a=3, b=2, c=2, d=1 -> N=8, N1=1, N2=2, N3=1
    val docs = Seq("a a a b b c", "c d").toDF("text")
    val got = TextAnalysis.goodTuring(docs, "text")
      .as[(Long, Long, Long, Option[Double], Double)].collect().toSeq
    assert(got == Seq(
      (1L, 1L, 2L, Some(4.0), 0.125),   // r* = 2*2/1
      (2L, 2L, 1L, Some(1.5), 0.125),   // r* = 3*1/2
      (3L, 1L, 0L, None, 0.125)),       // N4 = 0 -> undefined, not 0
      got.toString)
    // the maxR cutoff drops the sparse high-count region
    val cut = TextAnalysis.goodTuring(docs, "text", maxR = 2)
      .as[(Long, Long, Long, Option[Double], Double)].collect().toSeq
    assert(cut.map(_._1) == Seq(1L, 2L), cut.toString)
    // n-gram units are the MULTISET of sliding windows: "a b a b"
    // gives bigrams {a b, b a, a b} -> counts 2 and 1; docs shorter
    // than n contribute nothing
    val bi = TextAnalysis.goodTuring(
      Seq("a b a b", "x").toDF("text"), "text", ngram = 2)
      .as[(Long, Long, Long, Option[Double], Double)].collect().toSeq
    assert(bi == Seq(
      (1L, 1L, 1L, Some(2.0), 0.333333),   // r* = 2*1/1
      (2L, 1L, 0L, None, 0.333333)), bi.toString)
  }

  test("chao1: hand-computed richness, zero-doubleton form defined") {
    val docs = Seq(
      ("g", "a a b c"),     // counts a:2 b:1 c:1 -> V=3 n1=2 n2=1
      ("h", "x y"))         // V=2 n1=2 n2=0 -> 2 + 2*1/2 = 3.0
      .toDF("source", "text")
    val got = TextAnalysis.chao1(docs, "source", "text")
      .as[(String, Long, Long, Long, Double)].collect().toSeq
    assert(got == Seq(
      ("g", 3L, 2L, 1L, 3.5),   // 3 + 2*1/(2*(1+1))
      ("h", 2L, 2L, 0L, 3.0)), got.toString)
  }

  test("vocabOverlap: hand-computed Jaccard; zero-overlap pairs absent") {
    val docs = Seq(
      ("a", "x y z"), ("b", "y z w"), ("c", "q"))
      .toDF("source", "text")
    val got = TextAnalysis.vocabOverlap(docs, "source", "text")
      .as[(String, String, Long, Long, Long, Double)].collect().toSeq
    // a∩b = {y,z}: J = 2/(3+3-2) = 0.5; c shares nothing -> no row
    assert(got == Seq(("a", "b", 3L, 3L, 2L, 0.5)), got.toString)
  }

  test("sttr: full windows only, mean of per-window TTRs") {
    val docs = Seq(
      (1L, "s1", "a b a b a b"),  // windows [a b a] [b a b]: TTR 2/3 each
      (2L, "s1", "x y z w"),      // [x y z]: TTR 1.0; trailing w dropped
      (3L, "s2", "p q"))          // no full window: source absent
      .toDF("doc_id", "source", "text")
    val got = TextAnalysis.sttr(docs, "doc_id", "source", "text", chunk = 3)
      .as[(String, Long, Double)].collect().toSeq
    // (0.666667 + 0.666667 + 1.0) / 3
    assert(got == Seq(("s1", 3L, 0.777778)), got.toString)
  }

  test("simpsonDiversity: hand-computed lambda, all-singleton NULL " +
      "inverse, sub-2-token groups absent") {
    val docs = Seq(
      ("s", "a a a b"),  // a:3 b:1 -> rep 6, N(N-1) 12 -> 0.5, eff 2.0
      ("t", "a b"),      // all singletons -> 0.0, eff NULL
      ("u", "a"))        // 1 token: absent
      .toDF("source", "text")
    val got = TextAnalysis.simpsonDiversity(docs, "source", "text")
      .as[(String, Long, Long, Double, Option[Double])].collect().toSeq
    assert(got == Seq(
      ("s", 2L, 4L, 0.5, Some(2.0)),
      ("t", 2L, 2L, 0.0, None)), got.toString)
  }

  test("dupNgramStats: repeated 3-grams count all their occurrences") {
    // "a b a b a": grams (a b a)(b a b)(a b a) -> 3 grams, 2 dup occs
    val docs = Seq((1L, "a b a b a"), (2L, "w x y z"), (3L, "a b"))
      .toDF("doc_id", "text")
    val got = TextAnalysis.dupNgramStats(docs, "doc_id", "text")
      .as[(Long, Long, Long, Double)].collect().toSeq
    assert(got == Seq((1L, 3L, 2L, 0.666667), (2L, 2L, 0L, 0.0)),
      got.toString) // doc 3 too short for a 3-gram
  }

  test("hellinger: identical distributions 0, disjoint pair kept at 1") {
    // p = q = (2/3, 1/3): BC = 2/3 + 1/3 = 1 (exact in 10dp decimals)
    // → H = 0; source c shares nothing with a or b → restored rows
    // with BC = 0, H = 1
    val docs = Seq(("a", "x x y"), ("b", "x x y"), ("c", "zz"))
      .toDF("source", "text")
    val got = TextAnalysis.hellinger(docs, "source", "text")
      .as[(String, String, Long, Double, Double)].collect().toSeq
    assert(got == Seq(
      ("a", "b", 2L, 1.0, 0.0),
      ("a", "c", 0L, 0.0, 1.0),
      ("b", "c", 0L, 0.0, 1.0)), got.toString)
  }

  test("perplexityBuckets: quartile cuts partition 1/2/1 on four " +
      "distinct scores; short docs excluded") {
    // four docs with pairwise-distinct bigram NLLs in one source:
    // p25 lands inside (x1, x2) → head = 1 doc, p75 inside (x3, x4)
    // → middle = 2, tail = 1; the 1-token doc has no bigram and drops
    val d = Seq(
      (1L, "s", "a a a a a a a a"),
      (2L, "s", "a a b a a b"),
      (3L, "s", "c d c e"),
      (4L, "s", "f g h i j"),
      (5L, "s", "solo")).toDF("doc_id", "source", "text")
    val got = TextAnalysis.perplexityBuckets(d, "doc_id", "source", "text")
      .as[(String, String, Long, Double)].collect().toSeq
    assert(got.map(r => (r._2, r._3)) ==
      Seq(("head", 1L), ("middle", 2L), ("tail", 1L)), got.toString)
    assert(got.map(_._3).sum == 4L)
  }

  test("emd1d: unit shift moves unit mass; identical distributions 0") {
    // A lengths [1,1,3], B = [2,2,4]: every point of B is A shifted by
    // one → EMD = 1 exactly; C equals A → EMD(A, C) = 0
    val d = Seq(("a", 1L), ("a", 1L), ("a", 3L),
      ("b", 2L), ("b", 2L), ("b", 4L),
      ("c", 1L), ("c", 1L), ("c", 3L)).toDF("g", "len")
    val got = TextAnalysis.emd1d(d, "g", "len")
      .as[(String, String, Long, Long, Option[Double])].collect().toSeq
    assert(got == Seq(
      ("a", "b", 3L, 3L, Some(1.0)),
      ("a", "c", 3L, 3L, Some(0.0)),
      ("b", "c", 3L, 3L, Some(1.0))), got.toString)
  }
}
