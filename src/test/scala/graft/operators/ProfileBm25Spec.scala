package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestSession

/** Micro-fixtures for the column profiler and BM25 scorer; sf-scale
  * DuckDB replays run in the aq34/tq14 gates. */
class ProfileBm25Spec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("profile: null counts, exact distincts, typed ranges") {
    val d = Seq((1L, Some("a")), (2L, None), (2L, None))
      .toDF("k", "s")
    val out = Profile.profile(d).collect()
      .map(r => r.getString(0) -> r).toMap
    val k = out("k")
    assert(k.getLong(1) == 3 && k.getLong(2) == 0 && k.getLong(3) == 2)
    assert(k.getDouble(4) == 1.0 && k.getDouble(5) == 2.0)
    assert(k.isNullAt(6) && k.isNullAt(7))
    val s = out("s")
    assert(s.getLong(2) == 2 && s.getLong(3) == 1)
    assert(s.isNullAt(4) && s.getString(6) == "a" && s.getString(7) == "a")
  }

  test("bm25 matches a pure-Scala reference on a tiny corpus") {
    val docs = Seq(
      (1L, "merge merge window"),
      (2L, "window stream x"),
      (3L, "a b c d"))
    val terms = Seq("merge", "window", "stream")
    val (k1, b) = (1.2, 0.75)
    // reference computation with the operator's exact rounding contract
    val n = docs.size.toDouble
    val avgdl = BigDecimal(docs.map(_._2.split("\\s+").length).sum / n)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val tf = docs.flatMap { case (id, t) =>
      t.split("\\s+").filter(terms.contains).map(tok => (id, tok))
    }.groupBy(identity).map { case ((id, tok), v) => (id, tok, v.size) }
    val dfm = tf.groupBy(_._2).map { case (tok, v) => tok -> v.size.toDouble }
    val expect = tf.groupBy(_._1).map { case (id, rows) =>
      val dl = docs.find(_._1 == id).get._2.split("\\s+").length
      val score = rows.map { case (_, tok, f) =>
        val idf = math.log((n - dfm(tok) + 0.5) / (dfm(tok) + 0.5) + 1)
        val raw = idf * (f * (k1 + 1)) /
          (f + k1 * (1 - b + b * dl / avgdl))
        BigDecimal(raw).setScale(6, BigDecimal.RoundingMode.HALF_UP)
      }.sum
      id -> score.setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val got = Similarity.bm25Search(docs.toDF("doc_id", "text"),
        "doc_id", "text", terms, k1, b, k = 10)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got == expect)
    // d3 matches no term and must be absent
    assert(!got.contains(3L))
  }

  test("integrityAudit: nulls are not violations, orphans counted distinct") {
    import org.apache.spark.sql.functions.col
    // child keys: 1, 2, 2, NULL, 9, 9 against parent {1, 2, 3}:
    // 6 rows, 1 null (not a violation), 2 orphan rows, 1 distinct orphan
    val child = Seq(Option(1L), Option(2L), Option(2L), None,
      Option(9L), Option(9L)).toDF("k")
    val parent = Seq(1L, 2L, 3L).toDF("pk")
    val clean = Seq(1L, 2L).toDF("k2")
    val out = Profile.integrityAudit(Seq(
      Profile.FkCheck("dirty", child, "k", parent, "pk"),
      Profile.FkCheck("clean", clean, "k2", parent, "pk")))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getBoolean(5)))
    assert(out.toSeq == Seq(
      ("clean", 2L, 0L, 0L, 0L, true),
      ("dirty", 6L, 1L, 2L, 1L, false)))
  }

  test("histogram: edges, max lands in the last bin, constant column") {
    // values 0..10 in 5 bins of width 2: bins get [0,1] [2,3] [4,5]
    // [6,7] [8,9,10] — the max value clamps into the last bin
    val d = (0 to 10).map(_.toDouble).toDF("v")
    val out = Profile.histogram(d, "v", nBins = 5)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2),
        r.getLong(3)))
    assert(out.toSeq == Seq(
      (0L, 0.0, 2.0, 2L), (1L, 2.0, 4.0, 2L), (2L, 4.0, 6.0, 2L),
      (3L, 6.0, 8.0, 2L), (4L, 8.0, 10.0, 3L)))
    // nulls drop; a constant column degenerates to one bucket
    val const = Seq(Some(7.0), Some(7.0), None).toDF("v")
    val c = Profile.histogram(const, "v", nBins = 4).collect()
    assert(c.length == 1 && c(0).getLong(0) == 0L && c(0).getLong(3) == 2L)
  }

  test("lDiversity: homogeneity fails distinct-l; skew passes distinct-l " +
      "but fails entropy-l") {
    def r6(x: Double) = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    // g1: uniform over 3 languages — passes both at l=3.
    // g2: ONE language (homogeneity attack) — fails both.
    // g3: 3 languages but 98/1/1 — distinct-l passes, entropy-l fails
    //     (entropy ≈ 0.112 < ln 3 ≈ 1.0986): the case distinct-l misses
    val rows =
      (1 to 4).flatMap(_ => Seq(("g1", "en"), ("g1", "fr"), ("g1", "de"))) ++
      (1 to 12).map(_ => ("g2", "en")) ++
      ((1 to 98).map(_ => ("g3", "en")) :+ ("g3", "fr") :+ ("g3", "de"))
    val got = Profile.lDiversity(rows.toDF("grp", "lang"),
      Seq("grp"), "lang", l = 3)
      .as[(String, Long, Long, Double, Boolean, Boolean)]
      .collect().map(r => r._1 -> r).toMap
    assert(got("g1") == (("g1", 12L, 3L, r6(math.log(3.0)), true, true)),
      got("g1").toString)
    assert(got("g2") == (("g2", 12L, 1L, 0.0, false, false)),
      got("g2").toString)
    val g3 = got("g3")
    assert(g3._3 == 3L && g3._5 && !g3._6 && g3._4 < 0.2, g3.toString)
  }

  test("tCloseness: a group diverging from the population flags even " +
      "when diverse; absent values contribute their global mass") {
    // population: 50% en / 50% fr across two groups.
    // g1 mirrors it (tvd 0) — ok. g2 is all-en (tvd = 0.5) — flagged;
    // its missing fr must contribute the global 0.5, or tvd reads 0.25
    val rows = (1 to 10).map(_ => ("g1", "en")) ++
      (1 to 10).map(_ => ("g1", "fr")) ++
      (1 to 10).map(_ => ("g2", "en")) ++
      (1 to 10).map(_ => ("g2", "fr")) ++
      (1 to 20).map(_ => ("g3", "en"))
    // population: en 40/60, fr 20/60 ... compute directly instead:
    val got = Profile.tCloseness(rows.toDF("grp", "lang"),
      Seq("grp"), "lang", t = 0.2)
      .as[(String, Long, Double, Boolean)].collect()
      .map(r => r._1 -> r).toMap
    // global: en 40/60 = 2/3, fr 20/60 = 1/3.
    // g1 = g2 = (10/20, 10/20): tvd = (|1/2-2/3| + |1/2-1/3|)/2 = 1/6
    // g3 = all en: tvd = (|1-2/3| + |0-1/3|)/2 = 1/3 — the absent-fr
    // arm carries 1/3; dropping it would halve the distance
    def r6(x: Double) = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got("g1") == (("g1", 20L, r6(1.0 / 6), true)), got("g1").toString)
    assert(got("g2") == (("g2", 20L, r6(1.0 / 6), true)), got("g2").toString)
    assert(got("g3") == (("g3", 20L, r6(1.0 / 3), false)), got("g3").toString)
  }

  test("kAnonymityRisk: only sub-k groups surface; k-anonymous is empty") {
    val d = (Seq.fill(5)(("a", "x")) ++ Seq.fill(2)(("a", "y")) :+
      (("b", "x"))).toDF("lang", "src")
    val out = Profile.kAnonymityRisk(d, Seq("lang", "src"), k = 3L)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(out.toSeq == Seq(("a", "y", 2L), ("b", "x", 1L)))
    assert(Profile.kAnonymityRisk(d, Seq("lang", "src"), k = 2L)
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq ==
      Seq(("b", "x")))
  }

  test("additiveMerge: merged MV equals full recompute on any split") {
    import Materialized._
    val rnd = new scala.util.Random(31)
    val rows = (1 to 300).map { i =>
      (s"k${rnd.nextInt(7)}", rnd.nextInt(1000).toLong, rnd.nextInt(100))
    }
    def summarize(part: Seq[(String, Long, Int)]) =
      part.toDF("k", "v", "w").groupBy("k")
        .agg(count(lit(1)).as("n"),
          sum(col("v").cast("decimal(18,4)")).as("s"),
          min("w").as("mn"), max("w").as("mx"))
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getString(0), r.getLong(1),
        r.getDecimal(2).stripTrailingZeros(), r.getInt(3), r.getInt(4)))
        .sortBy(_._1).toSeq
    val full = canon(summarize(rows))
    for (cut <- Seq(0, 1, 150, 299, 300)) {
      val (a, b) = rows.splitAt(cut)
      val merged = additiveMerge(summarize(a), summarize(b), Seq("k"),
        Seq(CountCol("n"), SumCol("s"), MinCol("mn"), MaxCol("mx")))
      assert(canon(merged) == full, s"diverged at split $cut")
    }
  }

  test("deltaJoinMerge: incremental join view equals full recompute " +
    "on any append split") {
    import Materialized._
    val rnd = new scala.util.Random(47)
    // both sides share a key space so joins hit; duplicates on both
    // sides exercise the bag semantics (a join view is a multiset)
    val aRows = (1 to 120).map(i =>
      (rnd.nextInt(15).toLong, s"a$i", rnd.nextInt(100)))
    val bRows = (1 to 80).map(i =>
      (rnd.nextInt(15).toLong, s"b$i"))
    def aDf(p: Seq[(Long, String, Int)]) = p.toDF("k", "a_tag", "a_val")
    def bDf(p: Seq[(Long, String)]) = p.toDF("k", "b_tag")
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getString(1),
        r.getInt(2), r.getString(3))).sortBy(t => (t._1, t._2, t._4)).toSeq
    val full = canon(aDf(aRows).join(bDf(bRows), Seq("k")))
    for ((ca, cb) <- Seq((0, 0), (120, 80), (60, 40), (1, 79), (119, 1))) {
      val (aOld, aDelta) = aRows.splitAt(ca)
      val (bOld, bDelta) = bRows.splitAt(cb)
      val view = aDf(aOld).join(bDf(bOld), Seq("k"))
      val merged = deltaJoinMerge(view,
        aDf(aOld), aDf(aDelta), bDf(bOld), bDf(bDelta), Seq("k"))
      assert(canon(merged) == full, s"diverged at split ($ca, $cb)")
    }
  }

  test("giniConcentration: even split 0, single holder (n-1)/n") {
    val df = Seq(
      ("even", 1L, 5L), ("even", 2L, 5L), ("even", 3L, 5L),
      ("even", 4L, 5L),
      ("onep", 5L, 0L), ("onep", 6L, 0L), ("onep", 7L, 0L),
      ("onep", 8L, 10L)).toDF("g", "id", "v")
    val got = Profile.giniConcentration(df, "g", "id", "v")
      .as[(String, Long, Long, Double)].collect().toSeq
    assert(got == Seq(
      ("even", 4L, 20L, 0.0),
      ("onep", 4L, 10L, 0.75)), got.toString)
    // an all-zero group has no defined concentration: NULL, not an
    // ANSI divide-by-zero crash
    val z = Profile.giniConcentration(
      Seq(("z", 1L, 0L), ("z", 2L, 0L)).toDF("g", "id", "v"),
      "g", "id", "v").collect()
    assert(z.length == 1 && z.head.isNullAt(3), z.mkString)
  }

  test("apportion: seats sum exactly; largest remainders win; key ties") {
    // weights 5,3,2 over 7 seats: quotas 3.571/2.143/1.429 ->
    // bases 3/2/1 (6), leftover 1 goes to the largest remainder (a: 4)
    val df = Seq(("a", 5L), ("b", 3L), ("c", 2L)).toDF("k", "w")
    val got = Profile.apportion(df, "k", "w", seats = 7L)
      .as[(String, Long, Long)].collect().toSeq
    assert(got == Seq(("a", 5L, 4L), ("b", 3L, 2L), ("c", 2L, 1L)),
      got.toString)
    assert(got.map(_._3).sum == 7L)
    // equal remainders break on the key: 1,1 over 3 seats -> a gets 2
    val tie = Profile.apportion(
      Seq(("a", 1L), ("b", 1L)).toDF("k", "w"), "k", "w", seats = 3L)
      .as[(String, Long, Long)].collect().toSeq
    assert(tie == Seq(("a", 1L, 2L), ("b", 1L, 1L)), tie.toString)
  }

  test("apportion: zero total weight and negative weights fail loudly") {
    def msgs(body: => Unit): String = {
      val e = intercept[Exception](body)
      Iterator.iterate(e: Throwable)(_.getCause)
        .takeWhile(_ != null).map(_.getMessage).mkString(" | ")
    }
    // all-zero weights: an explicit message, not an opaque ANSI
    // divide-by-zero from `__qn div __W`
    val zero = msgs(Profile.apportion(
      Seq(("a", 0L), ("b", 0L)).toDF("k", "w"), "k", "w", 5L).collect())
    assert(zero.contains("total weight must be positive"), zero)
    // a negative weight corrupts the remainder rank: rejected per-row
    val neg = msgs(Profile.apportion(
      Seq(("a", 3L), ("b", -1L)).toDF("k", "w"), "k", "w", 5L).collect())
    assert(neg.contains("negative weight"), neg)
    // seats * weight overflowing a long names the key and the inputs —
    // not ANSI's anonymous ARITHMETIC_OVERFLOW
    val ovf = msgs(Profile.apportion(
      Seq(("a", 1L), ("big", Long.MaxValue / 2)).toDF("k", "w"),
      "k", "w", 5L).collect())
    assert(ovf.contains("overflows a long") && ovf.contains("big"), ovf)
    // ...and the guard threshold is exact: the largest non-overflowing
    // weight still apportions
    val edge = Profile.apportion(
      Seq(("a", Long.MaxValue / 5)).toDF("k", "w"), "k", "w", 5L)
      .as[(String, Long, Long)].collect().toSeq
    assert(edge == Seq(("a", Long.MaxValue / 5, 5L)), edge.toString)
  }

  test("benfordAudit: digit extraction, zero-count digits, chi2 replay") {
    // digits: 1.5 -> 1, 19 -> 1, 23 -> 2, 9.99 -> 9; 0.5 floors to 0
    // and is excluded (no leading digit)
    val df = Seq(1.5, 19.0, 23.0, 9.99, 0.5).toDF("v")
    val got = Profile.benfordAudit(df, "v").collect()
    assert(got.length == 9)
    val byDigit = got.map(r => r.getInt(0) ->
      (r.getLong(1), r.getDouble(2), r.getDouble(3))).toMap
    assert(byDigit(1)._1 == 2L && byDigit(2)._1 == 1L &&
      byDigit(9)._1 == 1L)
    assert((3 to 8).forall(d => byDigit(d)._1 == 0L))
    // driver replay of the exact arithmetic (Spark round = BigDecimal
    // valueOf + HALF_UP)
    def rnd(x: Double, s: Int): Double =
      java.math.BigDecimal.valueOf(x)
        .setScale(s, java.math.RoundingMode.HALF_UP).doubleValue()
    val terms = (1 to 9).map { d =>
      val p = math.log10(1.0 + 1.0 / d)
      val nExp = 4.0 * p
      val n = byDigit(d)._1
      assert(byDigit(d)._2 == rnd(nExp, 2), s"n_expected digit $d")
      rnd((n - nExp) * (n - nExp) / nExp, 6)
    }
    val total = rnd(terms.map(t => BigDecimal(t)).sum.toDouble, 6)
    assert(got.forall(_.getDouble(4) == total))
  }

  test("fleissKappa: hand-computed 3-item fixture, unanimous NULL, " +
    "rater-count contract raises") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // items: (k,k,k) P=1, (k,k,d) P=1/3, (d,d,d) P=1 →
    // A=14 B=18 C=41 D=81 → p_bar=14/18, p_e=41/81, κ=396/720=0.55
    val votes = Seq(
      (1L, "k"), (1L, "k"), (1L, "k"),
      (2L, "k"), (2L, "k"), (2L, "d"),
      (3L, "d"), (3L, "d"), (3L, "d")).toDF("item", "vote")
    val r = Profile.fleissKappa(votes, "item", "vote", raters = 3)
      .collect()(0)
    assert((r.getLong(0), r.getInt(1), r.getLong(2)) == ((3L, 3, 2L)))
    assert((r.getDouble(3), r.getDouble(4), r.getDouble(5)) ==
      ((0.777778, 0.506173, 0.55)), r.toString)
    // unanimous single category: P̄ = P̄_e = 1 → κ undefined (NULL)
    val u = Seq((1L, "k"), (1L, "k"), (1L, "k"),
      (2L, "k"), (2L, "k"), (2L, "k")).toDF("item", "vote")
    val ru = Profile.fleissKappa(u, "item", "vote", 3).collect()(0)
    assert((ru.getDouble(3), ru.getDouble(4)) == ((1.0, 1.0)))
    assert(ru.isNullAt(5), ru.toString)
    // an item with the wrong vote count violates the Fleiss contract
    val bad = votes.filter(!(col("item") === 2L && col("vote") === "d"))
    val e = intercept[Exception] {
      Profile.fleissKappa(bad, "item", "vote", 3).collect()
    }
    assert(e.getMessage.contains("expected 3") ||
      e.getCause != null && e.getCause.getMessage.contains("expected 3"),
      e.getMessage)
  }

  test("expectations: NULL evaluations count as violations; clean " +
      "rules report ok") {
    import Profile.Expectation
    val d = Seq(Some(1.0), Some(2.0), None, Some(99.0)).toDF("v")
    val got = Profile.expectations(Seq(
      Expectation("v_in_range", d, !col("v").between(1.0, 10.0)),
      Expectation("v_exists", d, lit(false))))
      .as[(String, Long, Long, Boolean)].collect().toSeq
    // NULL BETWEEN → NULL violation → coalesced to a violation; 99
    // violates outright → 2 of 4
    assert(got == Seq(("v_exists", 4L, 0L, true),
      ("v_in_range", 4L, 2L, false)), got.toString)
  }
}
