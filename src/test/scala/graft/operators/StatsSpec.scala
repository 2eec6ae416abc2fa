package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestSession

/** Welch A/B statistics against hand-computed values; the sf-scale
  * DuckDB replay runs in the aq50 gate. */
class StatsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("tukeyOutliers: hand-computed fences, nulls excluded") {
    // values 1..10 plus 100: q1 = 3.5, q3 = 8.5, fences [-4, 16] →
    // exactly the 100 is outside; a NULL row counts nowhere
    val rows = (1 to 10).map(i => ("g", Some(i.toDouble))) :+
      (("g", Some(100.0))) :+ (("g", None: Option[Double]))
    val out = Stats.tukeyOutliers(rows.toDF("grp", "v"), "v", Seq("grp"))
      .collect()(0)
    assert((out.getLong(1), out.getDouble(2), out.getDouble(3),
      out.getLong(4)) == ((11L, 3.5, 8.5, 1L)))
    assert(out.getDouble(5) == 0.090909)
  }

  test("abTest: hand-computed Welch z, thin arm yields NULL") {
    // group g: A = [1,2,3] (m=2, s²=1/3·3? → var=1), B = [2,4] (m=3,
    // var=2): z = (2-3)/sqrt(1/3 + 1) = -0.8660
    // group h: B has one row → z undefined (NULL)
    val d = Seq(
      ("g", true, 1.0), ("g", true, 2.0), ("g", true, 3.0),
      ("g", false, 2.0), ("g", false, 4.0),
      ("h", true, 5.0), ("h", true, 7.0), ("h", false, 6.0))
      .toDF("grp", "is_a", "v")
    val out = Stats.abTest(d, "v", col("is_a"), Seq("grp"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4),
        if (r.isNullAt(5)) None else Some(r.getDouble(5))))
    assert(out.toSeq == Seq(
      ("g", 3L, 2L, 2.0, 3.0, Some(-0.866)),
      ("h", 2L, 1L, 6.0, 6.0, None)))
  }

  test("holtSmoothing: hand-computed level/trend/forecast recursion") {
    // α=0.5, β=0.25, y=[4,8,6]:
    // t1: l=4 b=0 f=null
    // t2: f=4;  l=.5·8+.5·4=6;     b=.25·(6−4)+.75·0=0.5;  resid=4
    // t3: f=6.5; l=.5·6+.5·6.5=6.25; b=.25·0.25+.75·0.5=0.4375; resid=−0.5
    val series = Seq(("k", 1L, 4.0), ("k", 2L, 8.0), ("k", 3L, 6.0))
      .toDF("key", "t", "y")
    val out = Stats.holtSmoothing(series, "key", "t", "y", 1L, 2L, 1L, 4L)
      .collect().map(r => (r.getLong(1), r.getDouble(3), r.getDouble(4),
        Option(r.get(5)).map(_.asInstanceOf[Double]),
        Option(r.get(6)).map(_.asInstanceOf[Double]))).toSeq
    assert(out == Seq(
      (1L, 4.0, 0.0, None, None),
      (2L, 6.0, 0.5, Some(4.0), Some(4.0)),
      (3L, 6.25, 0.4375, Some(6.5), Some(-0.5))), out.toString)
    // singleton series: degenerate-free init
    val one = Stats.holtSmoothing(
      Seq(("s", 1L, 9.0)).toDF("key", "t", "y"), "key", "t", "y",
      1L, 2L, 1L, 4L)
      .head()
    assert(one.getDouble(3) == 9.0 && one.getDouble(4) == 0.0 &&
      one.isNullAt(5))
  }

  test("dispersionIndex: constant series 0, bursty series > 1") {
    val us = 3600000000L
    val rows =
      Seq.fill(2)(("a", 0L * us)) ++ Seq.fill(2)(("a", 1L * us)) ++
        Seq.fill(2)(("a", 2L * us)) ++
        Seq.fill(1)(("b", 0L * us)) ++ Seq.fill(5)(("b", 1L * us))
    val got = Stats.dispersionIndex(
      rows.toDF("event_type", "ts_us"), "event_type", "ts_us")
      .as[(String, Long, Long, Double)].collect().toSeq
    // a: (3·12 − 36)/(3·6) = 0; b: (2·26 − 36)/(2·6) = 16/12
    assert(got == Seq(("a", 3L, 6L, 0.0), ("b", 2L, 6L, 1.333333)),
      got.toString)
  }

  test("periodicity: period-2 series peaks at lag 2; constant series " +
      "never peaks") {
    val rows =
      (0L until 10L).map(t => ("p", t, if (t % 2 == 0) 1L else 5L)) ++
        (0L until 10L).map(t => ("c", t, 3L))
    val got = Stats.periodicity(rows.toDF("key", "t", "y"),
      "key", "t", "y", maxLag = 3)
      .as[(String, Long, Long, Option[Double], Boolean)].collect().toSeq
    val p = got.filter(_._1 == "p")
    assert(p.map(x => (x._2, x._4, x._5)) == Seq(
      (1L, Some(-1.0), false),
      (2L, Some(1.0), true),
      (3L, Some(-1.0), false)), p.toString)
    val c = got.filter(_._1 == "c")
    assert(c.forall(x => x._4.isEmpty && !x._5), c.toString)
  }

  test("holtWinters: hand-computed level/trend/seasonal recursion " +
      "(incl. a floor tie)") {
    // m=2, α=1/2, β=1/4, γ=1/2, y=[4,8,6,10] — micro-unit trace:
    // t1: l=4 b=0 seas=[0,0]
    // t2: sm=0 f=4  l=6     b=0.5      s=1       resid=4
    // t3: sm=0 f=6.5 l=6.25 b=0.4375   s=-0.125  resid=-0.5
    // t4: sm=1 f=7.6875 l=7.84375
    //     b = floor(2906250/4)µ = 0.726562  <- exact floor tie (.5)
    //     s=1.578125 resid=2.3125
    val series = Seq(("k", 1L, 4.0), ("k", 2L, 8.0), ("k", 3L, 6.0),
      ("k", 4L, 10.0)).toDF("key", "t", "y")
    val out = Stats.holtWinters(series, "key", "t", "y", period = 2,
      1L, 2L, 1L, 4L, 1L, 2L)
      .collect().map(r => (r.getLong(1), r.getDouble(3), r.getDouble(4),
        r.getDouble(5),
        Option(r.get(6)).map(_.asInstanceOf[Double]),
        Option(r.get(7)).map(_.asInstanceOf[Double]))).toSeq
    assert(out == Seq(
      (1L, 4.0, 0.0, 0.0, None, None),
      (2L, 6.0, 0.5, 1.0, Some(4.0), Some(4.0)),
      (3L, 6.25, 0.4375, -0.125, Some(6.5), Some(-0.5)),
      (4L, 7.84375, 0.726562, 1.578125, Some(7.6875), Some(2.3125))),
      out.toString)
  }

  test("mannKendall: hand-computed S, tie-killed variance, z, trend") {
    val s = Seq(
      // a: strictly increasing -> S = 6, no ties, z = 5/sqrt(156/18)
      ("a", 1L, 1L), ("a", 2L, 2L), ("a", 3L, 3L), ("a", 4L, 4L),
      // b: constant -> S = 0, variance 0 -> NULL z/trend
      ("b", 1L, 5L), ("b", 2L, 5L), ("b", 3L, 5L),
      // c: strictly decreasing, n = 3 -> S = -3, z = -2/sqrt(66/18)
      ("c", 1L, 5L), ("c", 2L, 3L), ("c", 3L, 1L))
      .toDF("k", "t", "y")
    val got = Stats.mannKendall(s, "k", "t", "y")
      .as[(String, Long, Long, Option[Double], Option[String])]
      .collect().toSeq
    assert(got == Seq(
      ("a", 4L, 6L, Some(1.698416), Some("none")),
      ("b", 3L, 0L, None, None),
      ("c", 3L, -3L, Some(-1.044466), Some("none"))), got.toString)
  }

  test("mannKendall: fractional metrics keep their order (no long truncation)") {
    // 1.2 < 1.9 < 2.5 < 3.1 — a silent cast to long would collapse
    // 1.2/1.9 into a tie and 2.5 into 2, changing S and Var(S)
    val s = Seq(("f", 1L, 1.2), ("f", 2L, 1.9), ("f", 3L, 2.5),
      ("f", 4L, 3.1)).toDF("k", "t", "y")
    val got = Stats.mannKendall(s, "k", "t", "y")
      .as[(String, Long, Long, Option[Double], Option[String])]
      .collect().toSeq
    assert(got == Seq(("f", 4L, 6L, Some(1.698416), Some("none"))),
      got.toString)
  }

  test("theilSen: median pairwise slope and median-residual intercept") {
    // slopes of (1,1),(2,3),(3,2): 2, 0.5, -1 -> median 0.5;
    // residuals y - 0.5t: 0.5, 2, 0.5 -> median 0.5
    val s = Seq(("a", 1L, 1L), ("a", 2L, 3L), ("a", 3L, 2L))
      .toDF("k", "t", "y")
    val got = Stats.theilSen(s, "k", "t", "y")
      .as[(String, Long, Double, Double)].collect().toSeq
    assert(got == Seq(("a", 3L, 0.5, 0.5)), got.toString)
    // a single-point series has no pairs and is excluded
    val single = Stats.theilSen(
      Seq(("z", 1L, 9L)).toDF("k", "t", "y"), "k", "t", "y")
    assert(single.count() == 0)
    // fractional metrics survive on the 6dp micro-unit grid: slopes of
    // (1,0.5),(2,2.0),(3,2.5) are 1.5, 1.0, 0.5 -> median 1.0;
    // residuals -0.5, 0, -0.5 -> intercept -0.5 (truncation would have
    // folded 0.5 and 2.5 onto 0 and 2)
    val frac = Stats.theilSen(
      Seq(("f", 1L, 0.5), ("f", 2L, 2.0), ("f", 3L, 2.5))
        .toDF("k", "t", "y"), "k", "t", "y")
      .as[(String, Long, Double, Double)].collect().toSeq
    assert(frac == Seq(("f", 3L, 1.0, -0.5)), frac.toString)
  }

  test("mannWhitney: hand-computed U with ties and tie-corrected z") {
    // A = {1, 2}, B = {2, 3}: U_A = 0 + 0.5 + 0 + 0 = 0.5;
    // sigma = sqrt(4/12 * (5 - 6/12)) = sqrt(1.5); z = -1.5/sigma
    val df = Seq(("A", 1.0), ("A", 2.0), ("B", 2.0), ("B", 3.0))
      .toDF("arm", "v")
    val got = Stats.mannWhitney(df, "arm", "v", "A", "B")
      .as[(Long, Long, Double, Option[Double])].collect().toSeq
    assert(got == Seq((2L, 2L, 0.5, Some(-1.224745))), got.toString)
    // a missing cohort: NULL z, zero counts survive
    val miss = Stats.mannWhitney(df, "arm", "v", "A", "C")
      .as[(Long, Long, Double, Option[Double])].collect().toSeq
    assert(miss == Seq((2L, 0L, 0.0, None)), miss.toString)
  }

  test("ksTest: hand-computed max CDF gap with a tie") {
    // A = {1,2}, B = {2,3}: CDF gaps at 1, 2, 3 are 0.5, 0.5, 0 ->
    // D = 0.5, KS = 0.5 * sqrt(4/4) = 0.5
    val df = Seq(("A", 1.0), ("A", 2.0), ("B", 2.0), ("B", 3.0))
      .toDF("arm", "v")
    val got = Stats.ksTest(df, "arm", "v", "A", "B")
      .as[(Long, Long, Option[Double], Option[Double])].collect().toSeq
    assert(got == Seq((2L, 2L, Some(0.5), Some(0.5))), got.toString)
    // degenerate: a missing cohort -> NULL stats, counts survive
    val m = Stats.ksTest(df, "arm", "v", "A", "C")
      .as[(Long, Long, Option[Double], Option[Double])].collect().toSeq
    assert(m == Seq((2L, 0L, None, None)), m.toString)
  }

  test("chi2Independence: hand-computed 2x2 chi2, dof, Cramer's V") {
    // counts: (a,0)=10 (a,1)=10 (b,0)=10 (b,1)=30 -> chi2 = 3.75,
    // V = sqrt(3.75/60) = 0.25
    val rows = Seq.fill(10)(("a", 0)) ++ Seq.fill(10)(("a", 1)) ++
      Seq.fill(10)(("b", 0)) ++ Seq.fill(30)(("b", 1))
    val got = Stats.chi2Independence(rows.toDF("r", "c"), "r", "c")
      .as[(Long, Long, Long, Long, Double, Option[Double])]
      .collect().toSeq
    assert(got == Seq((60L, 2L, 2L, 1L, 3.75, Some(0.25))), got.toString)
  }

  test("chi2Independence: an EMPTY cell still contributes its E term") {
    // (a,0)=10 (a,1)=10 (b,0)=20, (b,1) UNOBSERVED: margins ra=20
    // rb=20 c0=30 c1=10, E = 15,5,15,5; terms (10-15)^2/15 = 5/3,
    // (10-5)^2/5 = 5, (20-15)^2/15 = 5/3, (0-5)^2/5 = 5 ->
    // chi2 = 40/3 = 13.333334 (6dp-rounded terms), V = sqrt(chi2/40).
    // Summing only observed cells would report 25/3 and miss a THIRD
    // of the statistic.
    val rows = Seq.fill(10)(("a", 0)) ++ Seq.fill(10)(("a", 1)) ++
      Seq.fill(20)(("b", 0))
    val got = Stats.chi2Independence(rows.toDF("r", "c"), "r", "c")
      .as[(Long, Long, Long, Long, Double, Option[Double])]
      .collect().toSeq
    assert(got.head._1 == 40L && got.head._5 == 13.333334 &&
      got.head._6 == Some(0.57735), got.toString)
  }

  test("effectSize: hand-computed pooled d and Hedges correction") {
    // A = {1,2,3} (mean 2, var 1), B = {4,6} (mean 5, var 2):
    // sp2 = 4/3, d = -3/sqrt(4/3) = -2.598076,
    // g = d * (1 - 3/11) = -1.88951
    val df = Seq((true, 1.0), (true, 2.0), (true, 3.0),
      (false, 4.0), (false, 6.0)).map { case (a, v) => ("g", a, v) }
      .toDF("g", "arm", "v")
    val got = Stats.effectSize(df, "v", col("arm"), Seq("g"))
      .as[(String, Long, Long, Double, Double,
        Option[Double], Option[Double])].collect().toSeq
    assert(got == Seq(("g", 3L, 2L, 2.0, 5.0,
      Some(-2.598076), Some(-1.88951))), got.toString)
    // a 1-observation arm: means survive, d/g NULL
    val thin = Stats.effectSize(
      Seq(("g", true, 1.0), ("g", false, 2.0), ("g", false, 3.0))
        .toDF("g", "arm", "v"), "v", col("arm"), Seq("g"))
      .as[(String, Long, Long, Double, Double,
        Option[Double], Option[Double])].collect().head
    assert(thin._4 == 1.0 && thin._5 == 2.5 &&
      thin._6.isEmpty && thin._7.isEmpty, thin.toString)
  }

  test("mcnemar: hand-computed discordant cells, NULL when concordant") {
    // 10 pairs: b = 3 (x only), c = 1 (y only), 4 both, 2 neither:
    // chi2 = (3-1)^2/4 = 1.0; corrected = (|2|-1)^2/4 = 0.25
    val rows = Seq.fill(3)((true, false)) ++ Seq((false, true)) ++
      Seq.fill(4)((true, true)) ++ Seq.fill(2)((false, false))
    val got = Stats.mcnemar(
      rows.map { case (x, y) => ("g", x, y) }.toDF("g", "x", "y"),
      Seq("g"), col("x"), col("y"))
      .as[(String, Long, Long, Long, Option[Double], Option[Double])]
      .collect().head
    assert(got == (("g", 10L, 3L, 1L, Some(1.0), Some(0.25))), got.toString)
    // fully concordant: b + c = 0 -> NULL statistics, not a crash
    val conc = Stats.mcnemar(
      Seq(("g", true, true), ("g", false, false)).toDF("g", "x", "y"),
      Seq("g"), col("x"), col("y"))
      .as[(String, Long, Long, Long, Option[Double], Option[Double])]
      .collect().head
    assert(conc._5.isEmpty && conc._6.isEmpty, conc.toString)
  }

  test("cochranArmitage: hand-computed trend z, degenerate-dose NULL") {
    // doses 1,2,3 with (n=4, r=1),(4,2),(4,3): N=12, R=6, T=14,
    // S1=24, S2=56; num = 14-12 = 2, var = .25*(56-48) = 2,
    // z = 2/sqrt(2) = 1.414214
    val rows = (1 to 4).map(i => (1, i <= 1)) ++
      (1 to 4).map(i => (2, i <= 2)) ++ (1 to 4).map(i => (3, i <= 3))
    val got = Stats.cochranArmitage(
      rows.map { case (d, s) => ("g", d, s) }.toDF("g", "d", "s"),
      Seq("g"), scoreCol = col("d"), successCol = col("s"))
      .as[(String, Long, Long, Option[Double])].collect().head
    assert(got == (("g", 12L, 6L, Some(1.414214))), got.toString)
    // single dose level: variance 0 -> NULL z
    val flat = Stats.cochranArmitage(
      Seq(("g", 2, true), ("g", 2, false)).toDF("g", "d", "s"),
      Seq("g"), col("d"), col("s"))
      .as[(String, Long, Long, Option[Double])].collect().head
    assert(flat._4.isEmpty, flat.toString)
  }

  test("gini: uniform 0, max concentration (n-1)/n, zero-mass NULL") {
    val df = Seq(
      ("u", 1.0), ("u", 1.0), ("u", 1.0), ("u", 1.0), // uniform -> 0
      ("c", 0.0), ("c", 0.0), ("c", 0.0), ("c", 4.0), // one holder
      ("z", 0.0), ("z", 0.0)) // zero mass -> NULL
      .toDF("g", "v")
    val got = Stats.gini(df, "g", "v")
      .as[(String, Long, Option[Double])].collect().toSeq
    assert(got == Seq(
      ("c", 4L, Some(0.75)), ("u", 4L, Some(0.0)), ("z", 2L, None)),
      got.toString)
  }

  test("gini: non-string group column and opt-in uniqueness assert " +
      "both survive tied values") {
    // LONG group ids (groupedRank's offset frame must be type-generic,
    // not g.asInstanceOf[String]) + the tie-heavy value profile gini
    // is FOR, with the uniqueness assert switched on: the tieInvariant
    // bypass must keep valid runs alive
    val df = Seq(
      (7L, 1.0), (7L, 1.0), (7L, 1.0), (7L, 1.0),
      (9L, 0.0), (9L, 0.0), (9L, 0.0), (9L, 4.0))
      .toDF("src", "v")
    val prev = spark.conf.getOption("spark.graft.rank.assertUnique")
    spark.conf.set("spark.graft.rank.assertUnique", "true")
    try {
      val got = Stats.gini(df, "src", "v")
        .as[(Long, Long, Option[Double])].collect().toSeq
      assert(got == Seq((7L, 4L, Some(0.0)), (9L, 4L, Some(0.75))),
        got.toString)
    } finally prev match {
      case Some(v) => spark.conf.set("spark.graft.rank.assertUnique", v)
      case None => spark.conf.unset("spark.graft.rank.assertUnique")
    }
  }

  test("psi: zero on identical distributions, positive and finite on " +
      "shift, swap-symmetric") {
    def rows(ref: Seq[Long], cur: Seq[Long]) =
      (ref.map(b => ("g", b, true)) ++ cur.map(b => ("g", b, false)))
        .toDF("g", "b", "r")
    def run(df: org.apache.spark.sql.DataFrame) =
      Stats.psi(df, Seq("g"), col("b"), col("r"))
        .as[(String, Long, Long, Long, Option[Double])].collect().head
    // identical → every term is (0)·ln(1) = 0 exactly
    val same = run(rows(Seq(0, 0, 1, 1), Seq(0, 0, 1, 1)))
    assert(same == (("g", 4L, 4L, 2L, Some(0.0))), same.toString)
    // shifted mass → positive PSI; a cur-only bucket stays FINITE
    // (Laplace smoothing — no epsilon convention, no NaN)
    val moved = run(rows(Seq(0, 0, 0, 0), Seq(0, 1, 1, 2)))
    assert(moved._5.exists(_ > 0.1), moved.toString)
    // PSI is symmetric in (ref, cur): both factors negate together
    val ab = run(rows(Seq(0, 0, 1), Seq(0, 1, 1)))
    val ba = run(rows(Seq(0, 1, 1), Seq(0, 0, 1)))
    assert(ab._5 == ba._5, s"$ab vs $ba")
  }

  test("cohenKappa: perfect 1, symmetric disagreement -1, degenerate NULL") {
    def run(cells: Seq[(String, String, Long)]) =
      Stats.cohenKappa(cells.toDF("a", "b", "n"), "a", "b", "n")
        .as[(Long, Double, Double, Option[Double])].collect().head
    val perfect = run(Seq(("x", "x", 3L), ("y", "y", 7L)))
    assert(perfect._2 == 1.0 && perfect._4 == Some(1.0), perfect.toString)
    // all off-diagonal with symmetric margins: po=0, pe=0.5 → κ = −1
    val opposite = run(Seq(("x", "y", 1L), ("y", "x", 1L)))
    assert(opposite == ((2L, 0.0, 0.5, Some(-1.0))), opposite.toString)
    // one label on both sides: pe = 1 → NULL, not a division crash
    val degen = run(Seq(("x", "x", 5L)))
    assert(degen._4.isEmpty, degen.toString)
  }

  test("theil: uniform 0, hand-computed 2-value split, x<=0 excluded") {
    val df = Seq(
      ("u", 2.0), ("u", 2.0), ("u", 2.0), ("u", 2.0),
      ("h", 1.0), ("h", 3.0),
      ("z", 0.0), ("z", -1.0))
      .toDF("g", "v")
    val got = Stats.theil(df, "g", "v")
      .as[(String, Long, Option[Double])].collect().toSeq
    // h: μ=2, T = ((0.5·ln0.5) + (1.5·ln1.5))/2 = 0.130812
    assert(got == Seq(("h", 2L, Some(0.130812)), ("u", 4L, Some(0.0))),
      got.toString)
  }

  test("kendallTau: perfect ±1, tie-balanced 0, degenerate NULL") {
    def run(pts: Seq[(Long, Long)]) =
      Stats.kendallTau(pts.map { case (x, y) => ("g", x, y) }
        .toDF("g", "x", "y"), "g", "x", "y")
        .as[(String, Long, Option[Double])].collect().head
    assert(run(Seq((1L, 1L), (2L, 2L), (3L, 3L)))._3 == Some(1.0))
    assert(run(Seq((1L, 3L), (2L, 2L), (3L, 1L)))._3 == Some(-1.0))
    // P = Q = 1 with ties on both axes → exactly 0
    assert(run(Seq((1L, 1L), (1L, 2L), (2L, 1L), (2L, 2L)))._3 == Some(0.0))
    // all x tied: no orderable pairs → NULL, not a division crash
    assert(run(Seq((1L, 1L), (1L, 2L), (1L, 3L)))._3.isEmpty)
  }

  test("concordance: gamma ignores ties, Somers' D penalizes " +
      "dependent-side ties, degenerate NULLs") {
    def run(pts: Seq[(Long, Long)]) =
      Stats.concordance(pts.map { case (x, y) => ("g", x, y) }
        .toDF("g", "x", "y"), "g", "x", "y")
        .as[(String, Long, Option[Double], Option[Double])].collect().head
    // perfect orders
    assert(run(Seq((1L, 1L), (2L, 2L), (3L, 3L))) ==
      (("g", 3L, Some(1.0), Some(1.0))))
    assert(run(Seq((1L, 3L), (2L, 2L), (3L, 1L))) ==
      (("g", 3L, Some(-1.0), Some(-1.0))))
    // x-tie: P=1 Q=0, gamma 1; n0=3 Tx=1 -> D = 1/2
    assert(run(Seq((1L, 1L), (1L, 2L), (2L, 2L))) ==
      (("g", 3L, Some(1.0), Some(0.5))))
    // all pairs tied on y: P+Q=0 -> gamma NULL; D = 0/(n0-Tx) = 0
    assert(run(Seq((1L, 5L), (2L, 5L), (3L, 5L))) ==
      (("g", 3L, None, Some(0.0))))
    // all x tied: no orderable pairs AND n0 = Tx -> both NULL
    assert(run(Seq((1L, 1L), (1L, 2L))) == (("g", 2L, None, None)))
  }

  test("histogramQuantiles: interpolated estimates, rank clamped into " +
      "[1, N]") {
    // width 10: b0 n=4, b1 n=4, b2 n=2 (N = 10)
    val cells = Seq(("k", 0L, 4L), ("k", 1L, 4L), ("k", 2L, 2L))
      .toDF("key", "bucket", "n")
    val got = Stats.histogramQuantiles(cells, "key", "bucket", "n",
      width = 10.0, probs = Seq(0.01, 0.5, 0.9, 0.99),
      capBucket = Some(2L))
      .as[(String, Double, Long, Double, Boolean)].collect().toSeq
    assert(got == Seq(
      ("k", 0.01, 0L, 2.5, false),  // r clamps up to 1 -> 0 + 10*(1-0)/4
      ("k", 0.5, 1L, 12.5, false),  // r=5 -> 10 + 10*(5-4)/4
      ("k", 0.9, 2L, 25.0, true),   // r=9 -> 20 + 10*(9-8)/2, cap bucket
      ("k", 0.99, 2L, 30.0, true)), // r=10 -> LOWER BOUND: clamped mass
      got.toString)
    // without a declared cap no estimate is flagged (every bucket is a
    // genuine interior bucket to this reader)
    val uncapped = Stats.histogramQuantiles(cells, "key", "bucket", "n",
      width = 10.0, probs = Seq(0.99))
      .as[(String, Double, Long, Double, Boolean)].collect().toSeq
    assert(uncapped == Seq(("k", 0.99, 2L, 30.0, false)))
  }

  test("pettitt: level shift found at the true break, constant series " +
      "K=0 p=1") {
    // [1,1,1,5,5,5]: U_t = [-3,-6,-9,-6,-3,0], K = 9 at t = 3
    val df = (1L to 6L).map(t => ("g", t, if (t <= 3) 1.0 else 5.0))
      .toDF("g", "t", "v")
    val got = Stats.pettitt(df, "g", "t", "v")
      .as[(String, Long, Long, Long, Double)].collect().head
    val p6 = java.math.BigDecimal.valueOf(
      2.0 * math.exp(-6.0 * 81.0 / (216.0 + 36.0)))
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
    assert(got == (("g", 6L, 9L, 3L, p6)), got.toString)
    // a constant series has no break anywhere: K = 0, p capped at 1,
    // argmax ties resolve to the EARLIEST split
    val flat = Stats.pettitt(
      (1L to 5L).map(t => ("g", t, 2.0)).toDF("g", "t", "v"),
      "g", "t", "v")
      .as[(String, Long, Long, Long, Double)].collect().head
    assert(flat == (("g", 5L, 0L, 1L, 1.0)), flat.toString)
  }

  test("pettitt/spearman: identical under any session shuffle width " +
      "(the r16 derived range-kernel width)") {
    // the derived width narrows the range kernels when the input is
    // provably small — rank statistics must be width-independent
    val df = (1L to 40L).flatMap(t => Seq(
      ("a", t, (t * 7 % 11).toDouble), ("b", t, (t % 3).toDouble)))
      .toDF("g", "t", "v")
    val xy = df.withColumn("y", col("v") * -1 + col("t") % 5)
    def at[T](n: Int)(body: => Array[T]): Array[T] =
      Lineage.withShufflePartitions(spark, n)(body)
    val p1 = at(1)(Stats.pettitt(df, "g", "t", "v").collect())
    val p32 = at(32)(Stats.pettitt(df, "g", "t", "v").collect())
    assert(p1.toSeq == p32.toSeq)
    val s1 = at(1)(Stats.spearman(xy, "g", "v", "y").collect())
    val s32 = at(32)(Stats.spearman(xy, "g", "v", "y").collect())
    assert(s1.toSeq == s32.toSeq)
  }

  test("poissonRateTest: hand-computed conditional z, empty-window NULL") {
    // days 0..19, split at 10: t1 = t2 = 10, p = 0.5;
    // k1 = 2, k2 = 10 -> z = (2 - 6)/sqrt(3) = -2.309401
    val df = (Seq(0L, 5L) ++ (10L to 19L)).map(("g", _)).toDF("g", "d")
    val got = Stats.poissonRateTest(df, "g", "d", splitDay = 10L)
      .as[(String, Long, Long, Option[Double], Option[Double],
        Option[Double])].collect().head
    assert(got == (("g", 2L, 10L, Some(0.2), Some(1.0),
      Some(-2.309401))), got.toString)
    // all data on one side of the split: that window has no exposure
    val oneSided = Stats.poissonRateTest(
      (10L to 15L).map(("g", _)).toDF("g", "d"), "g", "d", splitDay = 10L)
      .as[(String, Long, Long, Option[Double], Option[Double],
        Option[Double])].collect().head
    assert(oneSided._2 == 0L && oneSided._6.isEmpty, oneSided.toString)
  }

  test("jonckheereTerpstra: hand-computed z, direction, degenerate NULLs") {
    def run(pts: Seq[(Long, Double)]) =
      Stats.jonckheereTerpstra(pts.map { case (o, v) => ("g", o, v) }
        .toDF("g", "o", "v"), "g", "o", "v")
        .as[(String, Long, Long, Long, Long, Option[Double])]
        .collect().head
    // o1=[1,2] < o2=[3,4]: JT=4 (jt4=16), E=2 (ejt4=8), Var=120/72,
    // z = 2/sqrt(5/3) = 1.549193
    assert(run(Seq((1L, 1.0), (1L, 2.0), (2L, 3.0), (2L, 4.0))) ==
      (("g", 4L, 2L, 16L, 8L, Some(1.549193))))
    // reversed: same magnitude, negative
    assert(run(Seq((1L, 3.0), (1L, 4.0), (2L, 1.0), (2L, 2.0))) ==
      (("g", 4L, 2L, 0L, 8L, Some(-1.549193))))
    // everything tied: numerator 0 AND variance exactly 0 -> NULL
    assert(run(Seq((1L, 5.0), (1L, 5.0), (2L, 5.0), (2L, 5.0))) ==
      (("g", 4L, 2L, 8L, 8L, None)))
    // one ordered group: no pairs at all -> NULL
    assert(run(Seq((1L, 1.0), (1L, 2.0), (1L, 3.0))) ==
      (("g", 3L, 1L, 0L, 0L, None)))
  }

  test("welchAnova: hand-computed F/df2; zero-variance strata excluded") {
    val df = Seq(
      ("a", 1.0), ("a", 2.0), ("a", 3.0),  // n=3 m=2 s2=1   w=3
      ("b", 4.0), ("b", 6.0))              // n=2 m=5 s2=2   w=1
      .toDF("g", "v")
    val got = Stats.welchAnova(df, "g", "v")
      .as[(Long, Long, Option[Double], Option[Double])].collect().head
    // W=4, m*=2.75, A=[3(.75)^2 + (2.25)^2]/1 = 6.75, k=2 -> B=1;
    // lam=(.25)^2/2+(.75)^2/1=0.59375, df2=3/(3*0.59375)
    assert(got == ((2L, 5L, Some(6.75), Some(1.684211))), got.toString)
    // a constant stratum carries no weight-able variance: k drops to 1
    // and the readouts are NULL, not a crash
    val deg = Stats.welchAnova(
      Seq(("a", 1.0), ("a", 2.0), ("a", 3.0),
        ("z", 7.0), ("z", 7.0), ("z", 7.0)).toDF("g", "v"), "g", "v")
      .as[(Long, Long, Option[Double], Option[Double])].collect().head
    assert(deg == ((1L, 3L, None, None)), deg.toString)
  }

  test("neymanAllocation: weight = n*sd, degenerate strata get zero") {
    val df = Seq(
      ("A", 1.0), ("A", 2.0), ("A", 3.0), // n=3, sd=1 -> w=3
      ("B", 4.0), ("B", 4.0), ("B", 4.0), ("B", 4.0), // sd=0 -> w=0
      ("C", 0.0), ("C", 2.0)) // n=2, sd=sqrt(2) -> w=2.8284271247
      .toDF("g", "v")
    val got = Stats.neymanAllocation(df, Seq("g"), "v", budget = 1000L)
      .as[(String, Long, Double, Double)].collect().toSeq
    def r6(x: Double) =
      java.math.BigDecimal.valueOf(x).setScale(6,
        java.math.RoundingMode.HALF_UP).doubleValue()
    val wC = 2.8284271247
    assert(got == Seq(
      ("A", 3L, 1.0, r6(1000.0 * 3.0 / (3.0 + wC))),
      ("B", 4L, 0.0, 0.0),
      ("C", 2L, r6(math.sqrt(2.0)), r6(1000.0 * wC / (3.0 + wC)))),
      got.toString)
    // allocations conserve the budget (degenerate strata need none)
    assert(math.abs(got.map(_._4).sum - 1000.0) < 1e-4)
  }

  test("fold hot-key guard fires with key context, off by default") {
    val s = (1 to 5).map(i => ("hotkey", i.toLong, i.toDouble))
      .toDF("k", "t", "y")
    // off by default: nothing set, the 5-point series folds fine
    assert(Stats.ewmaChart(s, "k", "t", "y", 1, 5).count() == 5)
    spark.conf.set("spark.graft.fold.maxSeriesLength", "3")
    try {
      def chain(t: Throwable): String = Iterator.iterate(t)(_.getCause)
        .takeWhile(_ != null).map(x => String.valueOf(x.getMessage))
        .mkString(" | ")
      val e = intercept[Throwable](
        Stats.ewmaChart(s, "k", "t", "y", 1, 5).collect())
      assert(chain(e).contains("maxSeriesLength=3") &&
        chain(e).contains("key=hotkey"), chain(e))
      // the whole family shares the guard
      val e2 = intercept[Throwable](
        Stats.holtSmoothing(s, "k", "t", "y", 1, 2, 1, 2).collect())
      assert(chain(e2).contains("maxSeriesLength=3"), chain(e2))
      val e3 = intercept[Throwable](
        Stats.holtWinters(s, "k", "t", "y", period = 2,
          1, 2, 1, 2, 1, 2).collect())
      assert(chain(e3).contains("maxSeriesLength=3"), chain(e3))
      // a series within the bound passes with the flag on
      spark.conf.set("spark.graft.fold.maxSeriesLength", "10")
      assert(Stats.ewmaChart(s, "k", "t", "y", 1, 5).count() == 5)
    } finally spark.conf.unset("spark.graft.fold.maxSeriesLength")
  }

  test("twoProportion: hand-computed pooled z and continuity correction") {
    // A: 4/10, B: 2/10 -> pooled 0.3, se = sqrt(0.3*0.7*0.2),
    // z = 0.2/se = 0.9759; corrected |d| = 0.2 - 0.1 -> z_c = 0.488
    val rows = Seq.fill(4)(("g", true, true)) ++
      Seq.fill(6)(("g", true, false)) ++
      Seq.fill(2)(("g", false, true)) ++ Seq.fill(8)(("g", false, false))
    val got = Stats.twoProportion(rows.toDF("g", "arm", "conv"),
      converted = col("conv"), armA = col("arm"), groupCols = Seq("g"))
      .as[(String, Long, Long, Long, Long, Double, Double,
        Option[Double], Option[Double])].collect().toSeq
    assert(got == Seq(("g", 10L, 10L, 4L, 2L, 0.4, 0.2,
      Some(0.9759), Some(0.488))), got.toString)
    // an all-converted frame has zero pooled variance: NULL z
    val flat = Stats.twoProportion(
      Seq(("g", true, true), ("g", false, true)).toDF("g", "arm", "conv"),
      col("conv"), col("arm"), Seq("g"))
      .as[(String, Long, Long, Long, Long, Double, Double,
        Option[Double], Option[Double])].collect().head
    assert(flat._8.isEmpty && flat._9.isEmpty, flat.toString)
  }

  test("cmhTest: hand-computed stratified chi2 and pooled odds ratio") {
    // stratum s1: a=4 b=1 c=2 d=3 -> E=3, dev=1, V=600/900, ad/n=1.2,
    // bc/n=0.2; s2: a=3 b=3 c=1 d=3 -> E=2.4, dev=0.6, V=576/900,
    // ad/n=0.9, bc/n=0.3. chi2 = (1.6-0.5)^2 / 1.3066666667 = 0.92602,
    // OR_MH = 2.1/0.5 = 4.2
    def stratum(s: String, a: Int, b: Int, c: Int, d: Int) =
      Seq.fill(a)((s, true, true)) ++ Seq.fill(b)((s, true, false)) ++
        Seq.fill(c)((s, false, true)) ++ Seq.fill(d)((s, false, false))
    val df = (stratum("s1", 4, 1, 2, 3) ++ stratum("s2", 3, 3, 1, 3))
      .toDF("s", "exp", "out")
    val got = Stats.cmhTest(df, "s", col("exp"), col("out"))
      .as[(Long, Long, Option[Double], Option[Double])].collect().toSeq
    assert(got == Seq((2L, 20L, Some(0.92602), Some(4.2))), got.toString)
    // a 1-row stratum (V undefined) is excluded, not a crash
    val tiny = Stats.cmhTest(
      (stratum("s1", 4, 1, 2, 3) ++ Seq(("s3", true, true)))
        .toDF("s", "exp", "out"), "s", col("exp"), col("out"))
      .as[(Long, Long, Option[Double], Option[Double])].collect().head
    assert(tiny._1 == 1L && tiny._2 == 10L, tiny.toString)
  }

  test("brownForsythe: hand-computed median-centered F; degenerate NULLs") {
    // A = {1,3} median 2 -> z {1,1}; B = {2,6,10} median 6 -> z {4,0,4}
    // zbar_A=1, zbar_B=8/3, grand 2; SSB = 2*1 + 3*(2/3)^2 = 10/3,
    // SSW = 0 + (32 - 64/3) = 32/3; F = 3 * (10/32) = 0.9375
    val df = Seq(("A", 1.0), ("A", 3.0), ("B", 2.0), ("B", 6.0),
      ("B", 10.0)).toDF("g", "v")
    val got = Stats.brownForsythe(df, "g", "v")
      .as[(Long, Long, Option[Double])].collect().toSeq
    assert(got == Seq((2L, 5L, Some(0.9375))), got.toString)
    // one group: k < 2 -> NULL F, counts survive
    val one = Stats.brownForsythe(
      Seq(("A", 1.0), ("A", 3.0)).toDF("g", "v"), "g", "v")
      .as[(Long, Long, Option[Double])].collect().toSeq
    assert(one == Seq((1L, 2L, None)), one.toString)
    // identical spreads WITH within-group variation: SSB = 0 -> F = 0
    val flat = Stats.brownForsythe(
      Seq(("A", 0.0), ("A", 2.0), ("A", 4.0),
        ("B", 10.0), ("B", 12.0), ("B", 14.0)).toDF("g", "v"), "g", "v")
      .as[(Long, Long, Option[Double])].collect().toSeq
    assert(flat == Seq((2L, 6L, Some(0.0))), flat.toString)
    // zero within-group variation (every z equal): F is 0/0 -> NULL
    val zeroW = Stats.brownForsythe(
      Seq(("A", 0.0), ("A", 2.0), ("B", 10.0), ("B", 12.0))
        .toDF("g", "v"), "g", "v")
      .as[(Long, Long, Option[Double])].collect().toSeq
    assert(zeroW == Seq((2L, 4L, None)), zeroW.toString)
  }

  test("ewmaChart: integer fold, hand-computed limit, flag pattern") {
    // alpha = 1/2: ewma of 0,4,0,8 = 0,2,1,4.5 (exact micro-units);
    // mu = 3, var = (80 - 36)/3, sigma = sqrt(44/3); lSigma = 0.5 ->
    // limit = 0.5*sqrt(1/3)*sigma = 1.105542; devs 3,1,2,1.5 ->
    // flags T,F,T,T
    val s = Seq(("a", 1L, 0.0), ("a", 2L, 4.0), ("a", 3L, 0.0),
      ("a", 4L, 8.0)).toDF("k", "t", "y")
    val got = Stats.ewmaChart(s, "k", "t", "y", 1L, 2L, lSigma = 0.5)
      .as[(String, Long, Double, Double, Double, Option[Double], Option[Boolean])]
      .collect().toSeq
    assert(got.map(_._4) == Seq(0.0, 2.0, 1.0, 4.5), got.toString)
    assert(got.map(_._5) == Seq(3.0, 1.0, 2.0, 1.5), got.toString)
    assert(got.forall(_._6 == Some(1.105542)), got.toString)
    assert(got.map(_._7) == Seq(Some(true), Some(false), Some(true),
      Some(true)), got.toString)
    // single-point series: no variance -> NULL limit, NULL flag
    val single = Stats.ewmaChart(
      Seq(("z", 1L, 5.0)).toDF("k", "t", "y"), "k", "t", "y", 1L, 2L)
      .as[(String, Long, Double, Double, Double, Option[Double], Option[Boolean])]
      .collect().head
    assert(single._4 == 5.0 && single._6.isEmpty && single._7.isEmpty,
      single.toString)
  }

  test("invNorm: known quantiles, symmetry, tail branches") {
    assert(math.abs(Stats.invNorm(0.975) - 1.9599639845) < 1e-8)
    assert(math.abs(Stats.invNorm(0.5)) < 1e-12)
    assert(math.abs(Stats.invNorm(0.01) + 2.3263478740) < 1e-8)
    for (p <- Seq(0.001, 0.02, 0.3, 0.7, 0.98, 0.999))
      assert(math.abs(Stats.invNorm(p) + Stats.invNorm(1.0 - p)) < 1e-9,
        s"symmetry at $p")
  }

  test("bhSelect: rejection prefix, the BH rescue property, empty family") {
    // m=4, alpha=0.05: thresholds 2.4977, 2.2414, 2.0829, 1.9600.
    // flags T,T,F,F -> kmax=2 -> ranks 1..2 significant
    val t1 = Seq(("a", 3.0), ("b", 2.5), ("c", 2.0), ("d", 0.5))
      .toDF("k", "z")
    val got = Stats.bhSelect(t1, "k", "z")
      .as[(String, Double, Long, Double, Boolean)].collect().toSeq
    assert(got.map(r => (r._1, r._3, r._5)) ==
      Seq(("a", 1L, true), ("b", 2L, true), ("c", 3L, false),
        ("d", 4L, false)), got.toString)
    // the BH step-up rescue: only rank 4 clears ITS threshold, which
    // rescues every rank above it — all four significant
    val t2 = Seq(("a", 2.0), ("b", 1.97), ("c", 1.965), ("d", 1.96))
      .toDF("k", "z")
    val rescue = Stats.bhSelect(t2, "k", "z")
      .as[(String, Double, Long, Double, Boolean)].collect().toSeq
    assert(rescue.forall(_._5), rescue.toString)
    // thresholds in the plan are EXACTLY the driver-computed ladder
    assert(rescue.map(_._4) ==
      Stats.bhThresholds(4, 0.05).map(_._2), rescue.toString)
    // empty family: empty result, key type preserved, no crash
    assert(Stats.bhSelect(
      Seq.empty[(String, Option[Double])].toDF("k", "z"), "k", "z")
      .count() == 0)
  }

  test("cuped: hand-computed theta, adjusted means, z, variance reduction") {
    // A: (1,3),(2,5); B: (3,4),(4,6). Pooled theta = 16/20 = 0.8;
    // adj means 4.8 / 4.2; vadj = 0.72 each arm;
    // z = 0.6/sqrt(0.72) = 0.7071; vr = 1 - 1.44/4 = 0.64
    val units = Seq(
      (0L, 1.0, 3.0), (2L, 2.0, 5.0), (1L, 3.0, 4.0), (3L, 4.0, 6.0))
      .toDF("uid", "x", "y")
    val got = Stats.cuped(units, "x", "y", col("uid") % 2 === 0)
      .as[(Long, Long, Option[Double], Option[Double], Option[Double],
        Option[Double], Option[Double])].collect().toSeq
    assert(got == Seq((2L, 2L, Some(0.8), Some(4.8), Some(4.2),
      Some(0.7071), Some(0.64))), got.toString)
    // zero covariate variance: every guard NULLs, no divide-by-zero
    val flat = Stats.cuped(
      Seq((0L, 1.0, 3.0), (2L, 1.0, 5.0), (1L, 1.0, 4.0), (3L, 1.0, 6.0))
        .toDF("uid", "x", "y"), "x", "y", col("uid") % 2 === 0)
      .as[(Long, Long, Option[Double], Option[Double], Option[Double],
        Option[Double], Option[Double])].collect().head
    assert(flat._3.isEmpty && flat._6.isEmpty, flat.toString)
    // a unit with a NULL covariate or NULL metric is excluded from the
    // COUNTS too (counting it while the sums null-skip would bias
    // theta and every adjusted statistic): same readout as the clean
    // 4-unit fixture
    val withNulls = Seq(
      (0L, Some(1.0), Some(3.0)), (2L, Some(2.0), Some(5.0)),
      (1L, Some(3.0), Some(4.0)), (3L, Some(4.0), Some(6.0)),
      (4L, None, Some(9.0)), (5L, Some(9.0), None))
      .toDF("uid", "x", "y")
    val nn = Stats.cuped(withNulls, "x", "y", col("uid") % 2 === 0)
      .as[(Long, Long, Option[Double], Option[Double], Option[Double],
        Option[Double], Option[Double])].collect().toSeq
    assert(nn == Seq((2L, 2L, Some(0.8), Some(4.8), Some(4.2),
      Some(0.7071), Some(0.64))), nn.toString)
  }

  test("kruskalWallis: hand-computed H, tie correction, degenerate NULLs") {
    // A = {1,2}, B = {3,4}: R_A = 3, R_B = 7 ->
    // H = 12/20 * (9/2 + 49/2) - 15 = 2.4; no ties -> h_adj = h
    val clean = Stats.kruskalWallis(
      Seq(("A", 1.0), ("A", 2.0), ("B", 3.0), ("B", 4.0)).toDF("g", "v"),
      "g", "v").as[(Long, Long, Option[Double], Option[Double])]
      .collect().toSeq
    assert(clean == Seq((2L, 4L, Some(2.4), Some(2.4))), clean.toString)
    // A = {1,1}, B = {2}: tie at 1 -> H = 1.5, corr = 0.75 -> H' = 2.0
    val tied = Stats.kruskalWallis(
      Seq(("A", 1.0), ("A", 1.0), ("B", 2.0)).toDF("g", "v"),
      "g", "v").as[(Long, Long, Option[Double], Option[Double])]
      .collect().toSeq
    assert(tied == Seq((2L, 3L, Some(1.5), Some(2.0))), tied.toString)
    // single group -> NULL; all values tied -> h = 0 with NULL h_adj
    val one = Stats.kruskalWallis(
      Seq(("A", 1.0), ("A", 2.0)).toDF("g", "v"), "g", "v")
      .as[(Long, Long, Option[Double], Option[Double])].collect().head
    assert(one._3.isEmpty && one._4.isEmpty, one.toString)
    val allTied = Stats.kruskalWallis(
      Seq(("A", 5.0), ("B", 5.0), ("C", 5.0)).toDF("g", "v"), "g", "v")
      .as[(Long, Long, Option[Double], Option[Double])].collect().head
    assert(allTied._3.contains(0.0) && allTied._4.isEmpty, allTied.toString)
  }

  test("driftByWindow: hand-computed per-window chi2, grid completion") {
    // tot: a=20, b=40, N=60. w1 (10,10): chi2 = 1.666667 + 0.833333;
    // w2 (10,30): 0.833333 + 0.416667 -> 1.25
    val counts = Seq(
      (1L, "a", 10L), (1L, "b", 10L),
      (2L, "a", 10L), (2L, "b", 30L))
      .toDF("w", "t", "o")
    val got = Stats.driftByWindow(counts, "w", "t", "o", critical = 2.0)
      .as[(Long, Long, Double, Boolean)].collect().toSeq
    assert(got == Seq((1L, 20L, 2.5, true), (2L, 40L, 1.25, false)),
      got.toString)
    // a window MISSING a category still owes its expected mass:
    // w2 sees only 'a' -> the absent 'b' cell enters with o = 0
    val miss = Seq((1L, "a", 5L), (1L, "b", 5L), (2L, "a", 10L))
      .toDF("w", "t", "o")
    // tot: a=15, b=5, N=20; w2 nw=10: E_a = 7.5, E_b = 2.5 ->
    // chi2_w2 = (10-7.5)^2/7.5 + (0-2.5)^2/2.5 = 0.833333 + 2.5
    val m = Stats.driftByWindow(miss, "w", "t", "o", critical = 3.0)
      .as[(Long, Long, Double, Boolean)].collect().toSeq
    assert(m(1) == ((2L, 10L, 3.333333, true)), m.toString)
  }

  test("spearman: perfect, inverse, and tie-averaged correlations") {
    val df = Seq(
      ("g", 1.0, 1.0), ("g", 2.0, 2.0), ("g", 3.0, 3.0),   // rho = 1
      ("h", 1.0, 3.0), ("h", 2.0, 2.0), ("h", 3.0, 1.0),   // rho = -1
      // t: x = 1,1,2 / y = 1,2,2 -> Ax = Ay = 18, sum d2^2 = 6 -> 0.5
      ("t", 1.0, 1.0), ("t", 1.0, 2.0), ("t", 2.0, 2.0),
      // z: all x tied -> zero rank variance -> NULL
      ("z", 7.0, 1.0), ("z", 7.0, 2.0))
      .toDF("grp", "x", "y")
    val got = Stats.spearman(df, "grp", "x", "y")
      .as[(String, Long, Option[Double])].collect().toSeq
    assert(got == Seq(
      ("g", 3L, Some(1.0)), ("h", 3L, Some(-1.0)),
      ("t", 3L, Some(0.5)), ("z", 2L, None)), got.toString)
  }

  test("auc: hand-computed midrank AUC, one-class group yields NULL") {
    // g: pos scores [3, 2], neg [1, 2] — pairwise wins 3 + tie 0.5
    // of 4 comparisons → AUC 0.875, Gini 0.75.
    // h: positives only → undefined (NULL auc/gini).
    val df = Seq(
      ("g", true, 3.0), ("g", true, 2.0),
      ("g", false, 1.0), ("g", false, 2.0),
      ("h", true, 1.0), ("h", true, 2.0))
      .toDF("grp", "label", "score")
    val got = Stats.auc(df, col("label"), "score", Seq("grp"))
      .as[(String, Long, Long, Option[Double], Option[Double])]
      .collect().toSeq
    assert(got == Seq(
      ("g", 2L, 2L, Some(0.875), Some(0.75)),
      ("h", 2L, 0L, None, None)), got.toString)
  }

  test("brierDecomposition: Murphy identity on a two-bin fixture") {
    // bin0 (p = 0.2): outcomes 0,0,1 → ō = 0.333333, p̄ = 0.2;
    // bin1 (p = 0.8): outcome 1 → ō = 1, p̄ = 0.8; N = 4, ō = 0.5.
    // brier = (0.04+0.04+0.64+0.04)/4 = 0.19
    // REL = (3·0.133333² + 0.2²)/4 = 0.023333
    // RES = (3·0.166667² + 0.5²)/4 = 0.083333, UNC = 0.25
    // identity: 0.023333 − 0.083333 + 0.25 = 0.19 ✓
    val df = Seq(
      (0.2, false), (0.2, false), (0.2, true), (0.8, true))
      .toDF("p", "label")
    val got = Stats.brierDecomposition(df, col("label"), "p", bins = 2)
      .as[(Long, Long, Double, Double, Double, Double, Double)]
      .collect().toSeq
    assert(got == Seq((4L, 2L, 0.5, 0.19, 0.023333, 0.083333, 0.25)),
      got.toString)
  }

  test("poissonBootstrap: integer thresholds, constant-metric collapse, " +
    "exact floor-division mean") {
    // thresholds are ⌊cdf·2³²⌋ of Poisson(1): T0/2³² ≈ e⁻¹, monotone
    val ts = Stats.poissonThresholds()
    assert(math.abs(ts.head.toDouble / 4294967296.0 -
      math.exp(-1.0)) < 1e-9)
    assert(ts == ts.sorted && ts.distinct == ts)
    // a CONSTANT metric is invariant to the weights: every replicate
    // mean equals the constant exactly, so the CI collapses and the
    // bootstrap SE is exactly 0
    val const = (1L to 40L).map(i => ("g", i, 2.5)).toDF("grp", "id", "v")
    val c = Stats.poissonBootstrap(const, "id", "v", Seq("grp"),
      replicates = 16).collect()(0)
    assert((c.getDouble(3), c.getDouble(4), c.getDouble(5),
      c.getDouble(6)) == ((2.5, 2.5, 2.5, 0.0)), c.toString)
    // point estimate is the exact micro-unit floor division:
    // (70000·100) div 3 = 2333333 → 2.333333
    val tri = Seq(("g", 1L, 1.0), ("g", 2L, 2.0), ("g", 3L, 4.0))
      .toDF("grp", "id", "v")
    val m = Stats.poissonBootstrap(tri, "id", "v", Seq("grp"),
      replicates = 8).collect()(0)
    assert(m.getDouble(3) == 2.333333, m.toString)
    assert(m.getLong(1) == 3L)
    // deterministic: a second run is bit-identical
    val r1 = Stats.poissonBootstrap(tri, "id", "v", Seq("grp"), 8)
      .collect().toSeq
    val r2 = Stats.poissonBootstrap(tri, "id", "v", Seq("grp"), 8)
      .collect().toSeq
    assert(r1 == r2)
  }

  test("did: hand-computed 2x2 cells, thin cell keeps DiD but NULLs se") {
    // T pre [1,2] m=1.5 v=.5 | T post [4,6] m=5 v=2
    // C pre [1,3] m=2  v=2  | C post [2,4] m=3 v=2
    // DiD = (5−1.5)−(3−2) = 2.5; se = √3.25 = 1.802776; z = 1.3868
    val df = Seq(
      (true, false, 1.0), (true, false, 2.0),
      (true, true, 4.0), (true, true, 6.0),
      (false, false, 1.0), (false, false, 3.0),
      (false, true, 2.0), (false, true, 4.0))
      .toDF("tr", "post", "v")
    val r = Stats.did(df, "v", col("tr"), col("post")).collect()(0)
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ==
      ((2L, 2L, 2L, 2L)))
    assert((r.getDouble(8), r.getDouble(9), r.getDouble(10)) ==
      ((2.5, 1.802776, 1.3868)), r.toString)
    // a 1-row cell (T post = [4]): DiD = (4−1.5)−(3−2) = 1.5 still
    // defined from the means, se/z NULL
    val thin = Stats.did(df.filter(!(col("tr") && col("post") &&
        col("v") === 6.0)), "v", col("tr"), col("post")).collect()(0)
    assert(thin.getDouble(8) == 1.5)
    assert(thin.isNullAt(9) && thin.isNullAt(10), thin.toString)
  }

  test("mutualInformation: identical = ln2/NMI 1, independent = 0, " +
    "constant column NULLs NMI") {
    // X == Y (2 levels, balanced): I = H = ln 2 → NMI = 1
    val dep = Seq(("a", "a"), ("a", "a"), ("b", "b"), ("b", "b"))
      .toDF("x", "y")
    val d = Stats.mutualInformation(dep, "x", "y").collect()(0)
    assert((d.getLong(0), d.getLong(1), d.getLong(2)) == ((4L, 2L, 2L)))
    assert((d.getDouble(3), d.getDouble(4), d.getDouble(5),
      d.getDouble(6)) == ((0.693147, 0.693147, 0.693147, 1.0)),
      d.toString)
    // X ⊥ Y uniform 2×2: every cell term ln(1) = 0 → I = 0, NMI = 0
    val ind = Seq(("a", "u"), ("a", "v"), ("b", "u"), ("b", "v"))
      .toDF("x", "y")
    val i = Stats.mutualInformation(ind, "x", "y").collect()(0)
    assert((i.getDouble(5), i.getDouble(6)) == ((0.0, 0.0)), i.toString)
    // constant Y: H(Y) = 0 → the NMI denominator is NULL-guarded
    val const = Seq(("a", "u"), ("b", "u")).toDF("x", "y")
    val c = Stats.mutualInformation(const, "x", "y").collect()(0)
    assert(c.getDouble(4) == 0.0 && c.isNullAt(6), c.toString)
  }

  test("mdeAnalysis: hand-computed MDE off the abTest fixture arms") {
    // A = [1,2,3] (var 1), B = [2,4] (var 2): se = √(1/3 + 1) = √(4/3)
    val d = Seq(("g", true, 1.0), ("g", true, 2.0), ("g", true, 3.0),
      ("g", false, 2.0), ("g", false, 4.0)).toDF("grp", "is_a", "v")
    val z = Stats.mdeZSum(0.05, 0.8)
    val se = math.sqrt(1.0 / 3 + 1.0)
    val r = Stats.mdeAnalysis(d, "v", col("is_a"), Seq("grp")).collect()(0)
    assert((r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4))
      == ((3L, 2L, 2.0, 3.0)))
    assert(r.getDouble(5) == math.rint(se * 1e6) / 1e6)
    assert(r.getDouble(6) == math.rint(z * se * 1e6) / 1e6)
    // pooled mean 12/5 = 2.4
    assert(r.getDouble(7) == math.rint(z * se / 2.4 * 1e6) / 1e6)
    assert(r.getLong(8) == math.ceil(z * z * 3.0).toLong)
    // a thin arm NULLs the variance-side readouts
    val thin = Stats.mdeAnalysis(d.filter(col("is_a") ||
      col("v") === 2.0), "v", col("is_a"), Seq("grp")).collect()(0)
    assert(thin.isNullAt(5) && thin.isNullAt(8), thin.toString)
  }

  test("robustMeans: rank-interval trim with a tie spanning the cut") {
    // 1,1,3..9,100 (n=10, k=1): mean 14.4; trimmed (ranks 2..9)
    // 43/8 = 5.375; winsorized 43 + 1·vlo(1) + 1·vhi(9) = 53 → 5.3
    val vs = Seq(1.0, 1.0, 3.0, 4.0, 5.0, 6.0, 7.0, 8.0, 9.0, 100.0)
    val df = vs.map(("g", _)).toDF("grp", "v")
    val r = Stats.robustMeans(df, "v", Seq("grp"), trim = 0.1)
      .collect()(0)
    assert((r.getLong(1), r.getLong(2)) == ((10L, 1L)))
    assert((r.getDouble(3), r.getDouble(4), r.getDouble(5)) ==
      ((14.4, 5.375, 5.3)), r.toString)
    // k = 0 (tiny group): all three means coincide with the mean
    val tiny = Seq(("h", 2.0), ("h", 4.0)).toDF("grp", "v")
    val t = Stats.robustMeans(tiny, "v", Seq("grp"), 0.1).collect()(0)
    assert((t.getLong(2), t.getDouble(3), t.getDouble(4),
      t.getDouble(5)) == ((0L, 3.0, 3.0, 3.0)), t.toString)
  }

  test("brierDecomposition: out-of-range probability raises") {
    val df = Seq((1.2, true)).toDF("p", "label")
    val e = intercept[Exception] {
      Stats.brierDecomposition(df, col("label"), "p").collect()
    }
    assert(e.getMessage.contains("outside [0, 1]") ||
      e.getCause != null &&
        e.getCause.getMessage.contains("outside [0, 1]"),
      e.getMessage)
  }

  test("durbinWatson: hand d = 0.6 on a monotone ramp, constant NULL") {
    // [1,2,3,4]: diffs 1e4 x3 -> num 4*3e8; den 4*30e8 - (1e5)^2 = 2e9
    val df = (1L to 4L).map(t => ("g", t, t.toDouble)).toDF("g", "t", "v")
    val got = Stats.durbinWatson(df, "g", "t", "v")
      .as[(String, Long, Option[Double])].collect().head
    assert(got == (("g", 4L, Some(0.6))), got.toString)
    val flat = Stats.durbinWatson(
      (1L to 4L).map(t => ("g", t, 2.0)).toDF("g", "t", "v"), "g", "t", "v")
      .as[(String, Long, Option[Double])].collect().head
    assert(flat == (("g", 4L, None)), flat.toString) // zero variance
  }

  test("runsTest: perfectly alternating series z, median ties dropped") {
    // [1,2,1,2]: median 1.5, signs 0101 -> runs 4, n1 = n2 = 2,
    // E[R] = 3, Var = 2/3 -> z = 1/sqrt(2/3) = 1.224745
    val df = Seq(("g", 1L, 1.0), ("g", 2L, 2.0), ("g", 3L, 1.0),
      ("g", 4L, 2.0)).toDF("g", "t", "v")
    val got = Stats.runsTest(df, "g", "t", "v")
      .as[(String, Long, Long, Long, Option[Double])].collect().head
    assert(got == (("g", 2L, 2L, 4L, Some(1.224745))), got.toString)
    // exact-median rows drop: [1,2,3] median 2 -> sequence [0,1]
    val odd = Stats.runsTest(
      Seq(("g", 1L, 1.0), ("g", 2L, 2.0), ("g", 3L, 3.0))
        .toDF("g", "t", "v"), "g", "t", "v")
      .as[(String, Long, Long, Long, Option[Double])].collect().head
    assert(odd._2 == 1L && odd._3 == 1L && odd._4 == 2L, odd.toString)
  }

  test("cochranQ: textbook k=2 grid gives Q = 1, all-zero subjects " +
    "change nothing") {
    // s1:{a}, s2:{a,b} -> C = [2,1], R = [1,2] -> Q = (2*5-9)/(6-5) = 1
    val df = Seq((1L, "a", true), (2L, "a", true), (2L, "b", true),
      (3L, "a", false)).toDF("s", "t", "hit")
    val got = Stats.cochranQ(df, "s", "t", "hit")
      .as[(Long, Long, Option[Double], Long)].collect().head
    // n_subjects counts subjects PRESENT in the input (3 here — the
    // all-failure subject appears); Q is provably invariant to
    // all-zero rows (they contribute 0 to every sufficient statistic),
    // which is exactly what this fixture pins
    assert(got == ((2L, 3L, Some(1.0), 1L)), got.toString)
    val noZero = Stats.cochranQ(df.filter(col("hit")), "s", "t", "hit")
      .as[(Long, Long, Option[Double], Long)].collect().head
    assert(noZero._3 == Some(1.0), noZero.toString)
  }

  test("grubbs: hand G = 1.5 with the offending value, n < 3 NULL") {
    // [1,1,1,5]: s = 2, max|v - mean| = 3 -> G = 1.5, outlier 5.0
    val df = Seq(("g", 1.0), ("g", 1.0), ("g", 1.0), ("g", 5.0))
      .toDF("g", "v")
    val got = Stats.grubbs(df, "g", "v")
      .as[(String, Long, Option[Double], Double)].collect().head
    assert(got == (("g", 4L, Some(1.5), 5.0)), got.toString)
    val tiny = Stats.grubbs(Seq(("g", 1.0), ("g", 2.0)).toDF("g", "v"),
      "g", "v").as[(String, Long, Option[Double], Double)].collect().head
    assert(tiny._3.isEmpty, tiny.toString)
  }

  test("friedman: textbook chi2 = 4 on two concordant blocks, " +
    "incomplete blocks drop") {
    // blocks with ranks [1,2,3] twice: R = [2,4,6] -> chi2 = 4, df 2
    val df = Seq(
      ("b1", "x", 1.0), ("b1", "y", 2.0), ("b1", "z", 3.0),
      ("b2", "x", 1.0), ("b2", "y", 5.0), ("b2", "z", 9.0),
      ("b3", "x", 7.0) // incomplete: must not contribute
    ).toDF("b", "t", "v")
    val got = Stats.friedman(df, "b", "t", "v")
      .as[(Long, Long, Option[Double], Long)].collect().head
    assert(got == ((3L, 2L, Some(4.0), 2L)), got.toString)
    // fully tied blocks: C = 0 -> NULL
    val tied = Stats.friedman(Seq(
      ("b", "x", 1.0), ("b", "y", 1.0), ("b", "z", 1.0))
      .toDF("b", "t", "v"), "b", "t", "v")
      .as[(Long, Long, Option[Double], Long)].collect().head
    assert(tied._3.isEmpty, tied.toString)
  }

  test("relativeRisk: hand 2x2 RR = 2 with Katz CI, zero cells NULL") {
    // exposed: 10 events / 30 total; unexposed: 5 / 30 -> RR = 2
    val rows =
      (1 to 10).map(_ => ("g", true, true)) ++
      (1 to 20).map(_ => ("g", true, false)) ++
      (1 to 5).map(_ => ("g", false, true)) ++
      (1 to 25).map(_ => ("g", false, false))
    val got = Stats.relativeRisk(rows.toDF("g", "ex", "ev"),
      "g", "ex", "ev")
      .as[(String, Long, Long, Long, Long, Option[Double],
        Option[Double], Option[Double])].collect().head
    assert((got._1, got._2, got._3, got._4, got._5) ==
      (("g", 10L, 20L, 5L, 25L)))
    assert(got._6 == Some(2.0), got.toString)
    // se = sqrt(1/10 - 1/30 + 1/5 - 1/30) = sqrt(7/30)
    val se = math.sqrt(7.0 / 30.0)
    def r6(x: Double) = java.math.BigDecimal.valueOf(x)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
    assert(got._7 == Some(r6(math.exp(math.log(2.0) - 1.96 * se))))
    assert(got._8 == Some(r6(math.exp(math.log(2.0) + 1.96 * se))))
    // a = 0: ratio undefined -> NULLs, counts still reported
    val zero = Stats.relativeRisk(Seq(("g", true, false),
      ("g", false, true)).toDF("g", "ex", "ev"), "g", "ex", "ev")
      .as[(String, Long, Long, Long, Long, Option[Double],
        Option[Double], Option[Double])].collect().head
    assert(zero._6.isEmpty && zero._7.isEmpty && zero._8.isEmpty)
  }

  test("oddsRatio: hand-computed OR and Woolf CI, zero cell yields NULL") {
    // a=2, b=1, c=1, d=2 → OR = 4; se = sqrt(1/2+1+1+1/2) = sqrt(3)
    val d = Seq(
      ("g", true, true), ("g", true, true), ("g", true, false),
      ("g", false, true), ("g", false, false), ("g", false, false))
      .toDF("g", "ex", "ev")
    val got = Stats.oddsRatio(d, "g", "ex", "ev")
      .as[(String, Long, Long, Long, Long, Option[Double],
        Option[Double], Option[Double])].collect().head
    assert((got._2, got._3, got._4, got._5) == ((2L, 1L, 1L, 2L)))
    assert(got._6 == Some(4.0))
    assert(got._7 == Some(0.134186) && got._8 == Some(119.2371), got)
    // any zero cell → NULL (Woolf has every cell in a denominator)
    val z = Stats.oddsRatio(Seq(("g", true, true), ("g", false, true),
      ("g", false, false)).toDF("g", "ex", "ev"), "g", "ex", "ev")
      .as[(String, Long, Long, Long, Long, Option[Double],
        Option[Double], Option[Double])].collect().head
    assert(z._6.isEmpty && z._7.isEmpty && z._8.isEmpty)
  }

  test("cliffsDelta: hand-computed pair counts; missing cohort NULL") {
    // A = [1,2,3], B = [2,0]: gt=4, lt=1, ties=1 → δ = (4−1)/6 = 0.5
    val d = Seq(("g", true, 1.0), ("g", true, 2.0), ("g", true, 3.0),
      ("g", false, 2.0), ("g", false, 0.0),
      ("h", true, 5.0))
      .toDF("g", "ca", "v")
    val got = Stats.cliffsDelta(d, "g", "ca", "v")
      .as[(String, Long, Long, Option[Double])].collect().toSeq
    assert(got == Seq(("g", 3L, 2L, Some(0.5)), ("h", 1L, 0L, None)))
    // identical distributions → δ = 0 exactly (and pinned to +0.0)
    val sym = Stats.cliffsDelta(
      Seq(("g", true, 1.0), ("g", false, 1.0), ("g", true, 2.0),
        ("g", false, 2.0)).toDF("g", "ca", "v"), "g", "ca", "v")
      .as[(String, Long, Long, Option[Double])].collect().head
    assert(sym._4 == Some(0.0) &&
      !(1.0 / sym._4.get).isNegInfinity)
  }

  test("jarqueBera: symmetric sample → zero skew, hand kurtosis; " +
      "degenerate groups NULL") {
    // [1,2,3,4] → cents 100..400: g1 = 0, g2 = −1.36, JB = 0.308267
    val d = Seq(("g", 1.0), ("g", 2.0), ("g", 3.0), ("g", 4.0),
      ("one", 5.0), ("flat", 2.0), ("flat", 2.0))
    val got = Stats.jarqueBera(d.toDF("g", "v"), "g", "v")
      .as[(String, Long, Option[Double], Option[Double], Option[Double])]
      .collect().map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    assert(got("g") == ((4L, Some(0.0), Some(-1.36), Some(0.308267))))
    assert(got("one") == ((1L, None, None, None)))  // n < 2
    assert(got("flat") == ((2L, None, None, None))) // zero variance
  }

  test("bartlett: equal variances → T = 0; zero-variance group " +
      "excluded from k") {
    // g1 = [1,2,3], g2 = [4,5,6]: both var 1 → Sp² = 1, T = 0 exactly;
    // c = [7,7] has var 0 and must drop from the test, not poison it
    val d = Seq(("g1", 1.0), ("g1", 2.0), ("g1", 3.0),
      ("g2", 4.0), ("g2", 5.0), ("g2", 6.0), ("c", 7.0), ("c", 7.0))
      .toDF("g", "v")
    val got = Stats.bartlett(d, "g", "v")
      .as[(Long, Long, Option[Double], Long)].collect().head
    assert(got == ((2L, 6L, Some(0.0), 1L)), got)
    // a single surviving group → NULL statistic
    val one = Stats.bartlett(Seq(("g", 1.0), ("g", 2.0)).toDF("g", "v"),
      "g", "v").as[(Long, Long, Option[Double], Long)].collect().head
    assert(one._1 == 1L && one._3.isEmpty)
  }

  test("pageTrend: perfect monotone trend hits max L, z = 2; " +
      "incomplete blocks excluded") {
    // two blocks, three ordered treatments, values increasing with the
    // treatment key in both blocks: L = 1·2+2·4+3·6 = 28 (the maximum),
    // E[L] = 24, Var[L] = 4 → z = 2. Block b3 misses treatment t3 and
    // must not count.
    val d = Seq(("b1", "t1", 1.0), ("b1", "t2", 2.0), ("b1", "t3", 3.0),
      ("b2", "t1", 4.0), ("b2", "t2", 5.0), ("b2", "t3", 6.0),
      ("b3", "t1", 9.0), ("b3", "t2", 1.0))
      .toDF("b", "t", "v")
    val got = Stats.pageTrend(d, "b", "t", "v")
      .as[(Long, Long, Option[Double], Option[Double])].collect().head
    assert(got == ((3L, 2L, Some(28.0), Some(2.0))), got)
    // reversed order → minimum L = 1·6+2·4+3·2 = 20, z = −2
    val rev = Stats.pageTrend(
      Seq(("b1", "t1", 3.0), ("b1", "t2", 2.0), ("b1", "t3", 1.0),
        ("b2", "t1", 6.0), ("b2", "t2", 5.0), ("b2", "t3", 4.0))
        .toDF("b", "t", "v"), "b", "t", "v")
      .as[(Long, Long, Option[Double], Option[Double])].collect().head
    assert(rev == ((3L, 2L, Some(20.0), Some(-2.0))), rev)
  }

  test("tostEquivalence: hand-computed one-sided z pair; the verdict " +
      "flips with the margin") {
    // A = [1,2,3] (m=2, va=1/3), B = [2,4] (m=3, vb=1): diff = −1,
    // se = sqrt(4/3). δ=2 → z_lo = 0.866 < z_crit → NOT equivalent;
    // δ=5 → z_lo = 3.4641, z_hi = 5.1962 → equivalent
    val d = Seq(("g", true, 1.0), ("g", true, 2.0), ("g", true, 3.0),
      ("g", false, 2.0), ("g", false, 4.0)).toDF("grp", "is_a", "v")
    def run(m: Double) = Stats.tostEquivalence(
        d, "v", col("is_a"), Seq("grp"), margin = m)
      .as[(String, Long, Long, Double, Option[Double], Option[Double],
        Option[Boolean])].collect().head
    val narrow = run(2.0)
    assert((narrow._2, narrow._3, narrow._4) == ((3L, 2L, -1.0)))
    assert(narrow._5 == Some(0.866) && narrow._6 == Some(2.5981),
      narrow.toString)
    assert(narrow._7 == Some(false))
    val wide = run(5.0)
    assert(wide._5 == Some(3.4641) && wide._6 == Some(5.1962),
      wide.toString)
    assert(wide._7 == Some(true))
    // a one-row arm → NULL z and NULL verdict
    val thin = Stats.tostEquivalence(
      Seq(("g", true, 1.0), ("g", true, 2.0), ("g", false, 3.0))
        .toDF("grp", "is_a", "v"),
      "v", col("is_a"), Seq("grp"), margin = 2.0)
      .as[(String, Long, Long, Double, Option[Double], Option[Double],
        Option[Boolean])].collect().head
    assert(thin._5.isEmpty && thin._7.isEmpty)
  }

  test("cronbachAlpha: parallel items score 1; incomplete subjects drop") {
    // items move identically across subjects → α = 1 exactly
    val d = Seq((1L, "i1", 1.0), (1L, "i2", 1.0),
      (2L, "i1", 2.0), (2L, "i2", 2.0),
      (3L, "i1", 9.0)) // subject 3 misses i2 → excluded
      .toDF("s", "i", "v")
    val got = Stats.cronbachAlpha(d, "s", "i", "v")
      .as[(Long, Long, Option[Double])].collect().head
    assert(got == ((2L, 2L, Some(1.0))), got.toString)
    // uncorrelated-ish items: α < 1; zero total variance → NULL
    val flat = Stats.cronbachAlpha(
      Seq((1L, "i1", 1.0), (1L, "i2", 2.0),
        (2L, "i1", 2.0), (2L, "i2", 1.0)).toDF("s", "i", "v"),
      "s", "i", "v")
      .as[(Long, Long, Option[Double])].collect().head
    assert(flat._3.isEmpty, // totals both 3 → S²_total = 0
      flat.toString)
  }

  test("moodMedian: perfect separation maxes chi2 and V") {
    // a = [1,2] below the pooled median 2.5, b = [3,4] above →
    // chi2 = 4 (every cell deviates by 1 from E = 1), V = 1
    val d = Seq(("a", 1.0), ("a", 2.0), ("b", 3.0), ("b", 4.0))
      .toDF("g", "v")
    val got = Stats.moodMedian(d, "g", "v")
      .as[(Long, Long, Long, Long, Double, Option[Double])]
      .collect().head
    assert(got == ((4L, 2L, 2L, 1L, 4.0, Some(1.0))), got.toString)
    // exact ties at the median drop: [1,2,3] per group → median 2
    // rows with v = 2 vanish from the table
    val ties = Stats.moodMedian(
      Seq(("a", 1.0), ("a", 2.0), ("b", 2.0), ("b", 3.0)).toDF("g", "v"),
      "g", "v")
      .as[(Long, Long, Long, Long, Double, Option[Double])]
      .collect().head
    assert(got._1 == 4L && ties._1 == 2L, ties.toString)
  }

  test("ljungBox: alternating series hits the hand ACF and LB = 16; " +
      "degenerate groups NULL") {
    // v = [1,−1,1,−1,1,−1]: mean 0 → r1 = −5/6, r2 = 2/3, r3 = −1/2,
    // LB = 6·8·(r1²/5 + r2²/4 + r3²/3) = 16
    val d = (1 to 6).map(t => ("g", t.toLong,
      if (t % 2 == 1) 1.0 else -1.0)) ++
      Seq(("flat", 1L, 2.0), ("flat", 2L, 2.0), ("flat", 3L, 2.0),
        ("flat", 4L, 2.0)) ++
      (1 to 3).map(t => ("short", t.toLong, t.toDouble))
    val got = Stats.ljungBox(d.toDF("g", "t", "v"), "g", "t", "v",
        maxLag = 3)
      .as[(String, Long, Option[Double], Option[Double], Option[Double],
        Option[Double], Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5, r._6, r._7))).toMap
    assert(got("g") == ((6L, Some(-0.833333), Some(0.666667),
      Some(-0.5), Some(16.0), 3L)), got("g").toString)
    // constant series: zero variance → every readout NULL
    assert(got("flat") == ((4L, None, None, None, None, 3L)))
    // n = 3: r3 needs n > 3 → NULL, and so does LB
    val s = got("short")
    assert(s._1 == 3L && s._2.isDefined && s._3.isDefined &&
      s._4.isEmpty && s._5.isEmpty, s.toString)
  }

  test("seasonalMannKendall: within-season trends add; hand z") {
    def r6(x: Double) = java.math.BigDecimal.valueOf(x)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
    // two seasons, four points each, strictly increasing within each:
    // S = 6+6 = 12, Var = 2·(4·3·13) = 312, z = (12−1)/√(312/18)
    val d = (for {
      season <- Seq(0L, 1L); i <- 1 to 4
    } yield ("g", season, season + 2L * i, (10 * season + i).toDouble))
      .toDF("key", "season", "t", "y")
    val got = Stats.seasonalMannKendall(d, "key", "season", "t", "y")
      .as[(String, Long, Long, Long, Option[Double], Option[String])]
      .collect().head
    val expZ = r6(11.0 / math.sqrt(312.0 / 18.0))
    assert(got == (("g", 8L, 2L, 12L, Some(expZ), Some("increasing"))),
      got.toString)
    // up-then-down within every season: the +1 and −1 pairs cancel
    // (S = 0, trend none) while the tie pair exercises the correction
    val wiggle = Seq(1.0, 2.0, 1.0)
    val cyc = (for {
      season <- 0L to 1L; i <- 0 to 2
    } yield ("c", season, season + 7L * i, wiggle(i) + 10 * season))
      .toDF("key", "season", "t", "y")
    val c = Stats.seasonalMannKendall(cyc, "key", "season", "t", "y")
      .as[(String, Long, Long, Long, Option[Double], Option[String])]
      .collect().head
    assert(c._4 == 0L && c._5 == Some(0.0) && c._6 == Some("none"),
      c.toString)
  }

  test("partialCorrelation: hand moments; perfect confounder NULLs " +
      "the partial") {
    // x=[1,2,3,4], y=[2,4,5,4], z=[1,1,2,2] → r_xy=0.718185,
    // r_xz=0.894427, r_yz=0.688247, r_xy·z=0.316228
    val d = Seq(("g", 1.0, 2.0, 1.0), ("g", 2.0, 4.0, 1.0),
      ("g", 3.0, 5.0, 2.0), ("g", 4.0, 4.0, 2.0))
      .toDF("g", "x", "y", "z")
    val got = Stats.partialCorrelation(d, "g", "x", "y", "z")
      .as[(String, Long, Option[Double], Option[Double], Option[Double],
        Option[Double])].collect().head
    assert(got == (("g", 4L, Some(0.718185), Some(0.894427),
      Some(0.688247), Some(0.316228))), got.toString)
    // z == x: r_xz = 1 → the partial's denominator hits 0 → NULL,
    // the pairwise r's stay reported
    val conf = Stats.partialCorrelation(
      Seq(("g", 1.0, 2.0, 1.0), ("g", 2.0, 4.0, 2.0),
        ("g", 3.0, 5.0, 3.0)).toDF("g", "x", "y", "z"),
      "g", "x", "y", "z")
      .as[(String, Long, Option[Double], Option[Double], Option[Double],
        Option[Double])].collect().head
    assert(conf._4 == Some(1.0) && conf._6.isEmpty, conf.toString)
  }

  test("icc: perfectly separated subjects score 1 with zero within-MS") {
    // a = [1,1], b = [5,5]: MSW = 0 → ICC = 1; MSB = 16 by hand
    val d = Seq(("a", 1.0), ("a", 1.0), ("b", 5.0), ("b", 5.0))
      .toDF("s", "v")
    val got = Stats.icc(d, "s", "v")
      .as[(Long, Long, Option[Double], Option[Double], Option[Double])]
      .collect().head
    assert(got == ((2L, 4L, Some(16.0), Some(0.0), Some(1.0))),
      got.toString)
    // one subject → NULL everything that needs between-variance df
    val one = Stats.icc(Seq(("a", 1.0), ("a", 2.0)).toDF("s", "v"),
      "s", "v")
      .as[(Long, Long, Option[Double], Option[Double], Option[Double])]
      .collect().head
    assert(one._1 == 1L && one._5.isEmpty, one.toString)
  }

  test("weightedKappa: hand-computed quadratic-weight ratio; perfect " +
      "agreement scores 1") {
    // cells (0,0)=2, (0,2)=1, (2,2)=2: Do = 4, margins give De = 52,
    // κ_w = 1 − 5·4/52 = 0.615385
    val cells = Seq((0L, 0L, 2L), (0L, 2L, 1L), (2L, 2L, 2L))
      .toDF("a", "b", "o")
    val got = Stats.weightedKappa(cells, "a", "b", "o")
      .as[(Long, Option[Double])].collect().head
    assert(got == ((5L, Some(0.615385))), got.toString)
    val perfect = Stats.weightedKappa(
      Seq((0L, 0L, 3L), (1L, 1L, 2L)).toDF("a", "b", "o"), "a", "b", "o")
      .as[(Long, Option[Double])].collect().head
    assert(perfect == ((5L, Some(1.0))), perfect.toString)
    // all mass on one (a, b) pair: expected disagreement 0 → NULL
    val degen = Stats.weightedKappa(
      Seq((1L, 1L, 4L)).toDF("a", "b", "o"), "a", "b", "o")
      .as[(Long, Option[Double])].collect().head
    assert(degen._2.isEmpty, degen.toString)
  }

  test("krippendorffAlpha: textbook units; singletons excluded") {
    // u1=[a,a], u2=[a,b], u3=[b,b], u4=[a] (dropped):
    // Do = (0+2+0)/6 = 1/3, De = (36−18)/30 = 0.6, α = 0.444444
    val r = Seq((1L, "a"), (1L, "a"), (2L, "a"), (2L, "b"),
      (3L, "b"), (3L, "b"), (4L, "a")).toDF("u", "c")
    val got = Stats.krippendorffAlpha(r, "u", "c")
      .as[(Long, Long, Double, Double, Option[Double])].collect().head
    assert(got == ((3L, 6L, 0.333333, 0.6, Some(0.444444))),
      got.toString)
    // unanimous ratings: Do = 0 → α = 1
    val unan = Stats.krippendorffAlpha(
      Seq((1L, "a"), (1L, "a"), (2L, "b"), (2L, "b")).toDF("u", "c"),
      "u", "c")
      .as[(Long, Long, Double, Double, Option[Double])].collect().head
    assert(unan._5 == Some(1.0), unan.toString)
  }

  test("smdBalance: hand pooled-SD difference; imbalance verdict flips") {
    def r6(x: Double) = java.math.BigDecimal.valueOf(x)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
    // x: A=[1,2,3] (var 1), B=[2,4] (var 2) → smd = −1/√1.5;
    // y identical across arms → smd 0, balanced
    val d = Seq((true, 1.0, 5.0), (true, 2.0, 5.0), (true, 3.0, 5.0),
      (false, 2.0, 5.0), (false, 4.0, 5.0)).toDF("arm", "x", "y")
    val got = Stats.smdBalance(d, col("arm"), Seq("x", "y"))
      .as[(String, Long, Long, Double, Double, Option[Double],
        Option[Boolean])].collect()
      .map(r => r._1 -> ((r._6, r._7))).toMap
    assert(got("x") == ((Some(r6(-1.0 / math.sqrt(1.5))), Some(false))),
      got("x").toString)
    // y has zero pooled variance → NULL smd, NULL verdict
    assert(got("y") == ((None, None)), got("y").toString)
    val bal = Stats.smdBalance(
      Seq((true, 1.0), (true, 2.0), (false, 1.0), (false, 2.0))
        .toDF("arm", "x"), col("arm"), Seq("x"))
      .as[(String, Long, Long, Double, Double, Option[Double],
        Option[Boolean])].collect().head
    assert(bal._6 == Some(0.0) && bal._7 == Some(true), bal.toString)
  }

  test("hillTailIndex: hand geometric-tail alpha; thin groups NULL") {
    // top-3 of [1/2, 1/4, 1/8, ...]: Σ ln ratios = ln4 + ln2 = 3ln2
    // → α̂ = 2/(3 ln 2) = 0.961797 at k = 2
    val d = (1 to 6).map(i => ("g", math.pow(2.0, -i), i.toLong)) ++
      Seq(("thin", 1.0, 1L), ("thin", 0.5, 2L))
    val got = Stats.hillTailIndex(d.toDF("g", "v", "id"),
        "g", "v", "id", k = 2)
      .as[(String, Long, Double, Option[Double])].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got("g") == ((2L, 0.125, Some(0.961797))), got("g").toString)
    // "thin" has only 2 positive values: no (k+1)-th order stat → no
    // threshold row, the group drops entirely
    assert(!got.contains("thin"), got.toString)
    // all-tied top values: Σ ln(1) = 0 → NULL alpha, threshold kept
    val tied = Stats.hillTailIndex(
      (1 to 5).map(i => ("t", 7.0, i.toLong)).toDF("g", "v", "id"),
      "g", "v", "id", k = 2)
      .as[(String, Long, Double, Option[Double])].collect().head
    assert(tied._3 == 7.0 && tied._4.isEmpty, tied.toString)
  }

  test("forecastAccuracy: hand MAPE/sMAPE/MASE over the holt fixture") {
    // y = [4, 8, 6] under α=1/2, β=1/4: forecasts [–, 4, 6.5],
    // residuals [–, 4, −0.5] → MAPE (0.5 + 0.0833…)/2 = 0.291667,
    // sMAPE (8/12 + 0.08)/2 = 0.373333, MASE 2.25/3 = 0.75
    val series = Seq(("k", 1L, 4.0), ("k", 2L, 8.0), ("k", 3L, 6.0))
      .toDF("key", "t", "y")
    val got = Stats.forecastAccuracy(
      Stats.holtSmoothing(series, "key", "t", "y", 1L, 2L, 1L, 4L),
      "key")
      .as[(String, Long, Option[Double], Option[Double], Option[Double])]
      .collect().head
    assert(got == (("k", 2L, Some(0.291667), Some(0.373333),
      Some(0.75))), got.toString)
    // a constant series: zero naive MAE → MASE NULL, MAPE 0
    val flat = Stats.forecastAccuracy(
      Stats.holtSmoothing(Seq(("c", 1L, 5.0), ("c", 2L, 5.0),
        ("c", 3L, 5.0)).toDF("key", "t", "y"), "key", "t", "y",
        1L, 2L, 1L, 4L), "key")
      .as[(String, Long, Option[Double], Option[Double], Option[Double])]
      .collect().head
    assert(flat._3 == Some(0.0) && flat._5.isEmpty, flat.toString)
  }

  test("wilcoxonSignedRank: textbook W+, mid-rank ties, zeros drop") {
    def r6(x: Double) = java.math.BigDecimal.valueOf(x)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
    // diffs [1,−2,3,−4,5] (plus a dropped 0): W+ = 1+3+5 = 9,
    // z = (9 − 7.5)/√13.75
    val d = Seq(("g", 1.0), ("g", -2.0), ("g", 3.0), ("g", -4.0),
      ("g", 5.0), ("g", 0.0)).toDF("g", "d")
    val got = Stats.wilcoxonSignedRank(d, "g", "d")
      .as[(String, Long, Double, Option[Double])].collect().head
    assert(got == (("g", 5L, 9.0, Some(r6(1.5 / math.sqrt(13.75))))),
      got.toString)
    // all-tied magnitudes [1, 1, −1]: mid-rank 2 each → W+ = 4,
    // Var(2W+) = (8·3·4·7 − 4·24)/48 = 12 → z = 2/√12
    val ties = Stats.wilcoxonSignedRank(
      Seq(("t", 1.0), ("t", 1.0), ("t", -1.0)).toDF("g", "d"), "g", "d")
      .as[(String, Long, Double, Option[Double])].collect().head
    assert(ties == (("t", 3L, 4.0, Some(r6(2.0 / math.sqrt(12.0))))),
      ties.toString)
  }

  test("signTest: exact binomial counts, zeros drop, balanced is +0") {
    // diffs [2, −1, 3, 0]: n = 3 (the 0 drops), S+ = 2,
    // z = (4 − 3)/√3
    val d = Seq(("g", 2.0), ("g", -1.0), ("g", 3.0), ("g", 0.0))
      .toDF("g", "d")
    def r6(x: Double) = java.math.BigDecimal.valueOf(x)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
    val got = Stats.signTest(d, "g", "d")
      .as[(String, Long, Long, Option[Double])].collect().head
    assert(got == (("g", 3L, 2L, Some(r6(1.0 / math.sqrt(3.0))))),
      got.toString)
    // perfectly balanced signs → z exactly +0
    val bal = Stats.signTest(
      Seq(("b", 1.0), ("b", -1.0)).toDF("g", "d"), "g", "d")
      .as[(String, Long, Long, Option[Double])].collect().head
    assert(bal._4 == Some(0.0) && !(1.0 / bal._4.get).isNegInfinity,
      bal.toString)
  }

  test("matthewsCorrelation: hand confusion cells; all-keep predictor " +
      "scores 0.95 accuracy but NULL MCC") {
    // tp=4, fp=1, fn=2, tn=3: MCC = (12−2)/√(5·6·4·5) = 10/√600
    def r6(x: Double) = java.math.BigDecimal.valueOf(x)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
    val d = (Seq.fill(4)((true, true)) ++ Seq.fill(1)((true, false)) ++
      Seq.fill(2)((false, true)) ++ Seq.fill(3)((false, false)))
      .toDF("p", "l")
    val got = Stats.matthewsCorrelation(d, "p", "l")
      .as[(Long, Long, Long, Long, Long, Option[Double], Option[Double])]
      .collect().head
    assert(got == ((10L, 4L, 1L, 2L, 3L, Some(0.7),
      Some(r6(10.0 / math.sqrt(600.0))))), got.toString)
    // the imbalance trap: predict-all-keep on a 19/20 keep corpus —
    // accuracy looks great, MCC is undefined (an empty margin)
    val trap = (Seq.fill(19)((true, true)) ++ Seq((true, false)))
      .toDF("p", "l")
    val t = Stats.matthewsCorrelation(trap, "p", "l")
      .as[(Long, Long, Long, Long, Long, Option[Double], Option[Double])]
      .collect().head
    assert(t._6 == Some(0.95) && t._7.isEmpty, t.toString)
  }

  test("binaryGateReport: hand P/R/F1/J; F1 from exact cells") {
    // tp=4, fp=1, fn=2, tn=3: P = 0.8, R = 2/3, F1 = 8/11,
    // J = 2/3 + 3/4 − 1
    def r6(x: Double) = java.math.BigDecimal.valueOf(x)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
    val d = (Seq.fill(4)((true, true)) ++ Seq.fill(1)((true, false)) ++
      Seq.fill(2)((false, true)) ++ Seq.fill(3)((false, false)))
      .toDF("p", "l")
    val got = Stats.binaryGateReport(d, "p", "l")
      .as[(Long, Long, Long, Long, Long, Option[Double], Option[Double],
        Option[Double], Option[Double])].collect().head
    assert(got == ((10L, 4L, 1L, 2L, 3L, Some(0.8), Some(r6(2.0 / 3.0)),
      Some(r6(8.0 / 11.0)), Some(r6(2.0 / 3.0 + 3.0 / 4.0 - 1.0)))),
      got.toString)
    // never-keep predictor: precision undefined (empty margin), the
    // rest defined
    val never = Seq((false, true), (false, false)).toDF("p", "l")
    val n = Stats.binaryGateReport(never, "p", "l")
      .as[(Long, Long, Long, Long, Long, Option[Double], Option[Double],
        Option[Double], Option[Double])].collect().head
    assert(n._6.isEmpty && n._7 == Some(0.0) && n._9 == Some(0.0),
      n.toString)
  }

  test("cohensH: extreme proportions give h = π, equal give +0") {
    val d = Seq(("g", true, true), ("g", true, true),
      ("g", false, false), ("g", false, false),
      ("e", true, true), ("e", true, false),
      ("e", false, true), ("e", false, false))
      .toDF("g", "ca", "ev")
    val got = Stats.cohensH(d, "g", "ca", "ev")
      .as[(String, Long, Long, Option[Double], Option[Double],
        Option[Double])].collect()
      .map(r => r._1 -> ((r._4, r._5, r._6))).toMap
    assert(got("g") == ((Some(1.0), Some(0.0), Some(3.141593))),
      got("g").toString)
    val e = got("e")
    assert(e._3 == Some(0.0) && !(1.0 / e._3.get).isNegInfinity,
      e.toString)
  }

  test("passAtK: unbiased product form — hand C(n-c,k)/C(n,k); " +
      "fewer-failures-than-k gives exact 1; n < k excluded") {
    // A: n=6 c=2 k=3 -> 1 - C(4,3)/C(6,3) = 1 - 4/20 = 0.8
    // B: n=3 c=0 -> 1 - C(3,3)/C(3,3) = 0
    // C: n=2 < k -> excluded (undefined, never faked)
    // D: n=3 c=1 -> n-c=2 < k -> clamped zero factor -> exactly 1
    val rows =
      Seq.fill(2)(("A", true)) ++ Seq.fill(4)(("A", false)) ++
      Seq.fill(3)(("B", false)) ++ Seq.fill(2)(("C", true)) ++
      (("D", true) +: Seq.fill(2)(("D", false)))
    val got = Stats.passAtK(rows.toDF("task", "ok"), "task", "ok", k = 3)
      .as[(String, Long, Long, Double, Double)].collect().toSeq
    assert(got == Seq(
      ("A", 6L, 2L, 0.333333, 0.8),
      ("B", 3L, 0L, 0.0, 0.0),
      ("D", 3L, 1L, 0.333333, 1.0)), got.toString)
  }

  test("conformalThreshold: exact-integer rank, deterministic order " +
      "statistic, live coverage audit; too-small calibration is NULL") {
    // g: 7 calibration scores 1..7 at alpha = 1/4:
    //   r = ceil(8 * 3/4) = 6 -> q_hat = 6.0; test 1..8 -> 6/8 covered
    // h: 2 calibration scores at alpha = 1/4: r = ceil(3 * 3/4) = 3 > n
    //   -> NULL threshold and coverage (not enough calibration data)
    val cal = ((1 to 7).map(i => ("g", i.toDouble, i.toLong)) ++
      Seq(("h", 1.0, 1L), ("h", 2.0, 2L))).toDF("g", "s", "id")
    val test_ = ((1 to 8).map(i => ("g", i.toDouble, 100L + i)) ++
      Seq(("h", 1.0, 201L))).toDF("g", "s", "id")
    val got = Stats.conformalThreshold(cal, test_, "g", "s", "id",
      alphaNum = 1, alphaDen = 4)
      .as[(String, Long, Long, Option[Double], Long, Option[Double])]
      .collect().toSeq
    assert(got == Seq(
      ("g", 7L, 6L, Some(6.0), 8L, Some(0.75)),
      ("h", 2L, 3L, None, 1L, None)), got.toString)
  }
}
