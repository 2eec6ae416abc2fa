package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestSession

/** Behavioral analytics (funnel / transitions / retention / gap-fill)
  * against hand-computed micro-fixtures, plus the Bloom-prefiltered
  * join's equality + selectivity contract. The sf-scale replay against
  * DuckDB runs in the aq27-aq30/dq17 gate. */
class BehaviorSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def ev(rows: (Long, Long, String)*) =
    rows.toDF("user_id", "ts_us", "event_type")
      .withColumn("event_id", monotonically_increasing_id())

  test("funnel: strictly-after ordering, re-orderings don't count") {
    // u1 completes view->click->purchase; u2 clicks BEFORE viewing (the
    // click must not count); u3 views only; u4 clicks at the same µs as
    // the view (strictly-after excludes it)
    val e = ev(
      (1L, 100L, "view"), (1L, 200L, "click"), (1L, 400L, "purchase"),
      (2L, 300L, "click"), (2L, 500L, "view"),
      (3L, 100L, "view"),
      (4L, 100L, "view"), (4L, 100L, "click"))
    val out = Behavior.funnel(e, "user_id", "ts_us", Seq(
      "view" -> (col("event_type") === "view"),
      "click" -> (col("event_type") === "click"),
      "purchase" -> (col("event_type") === "purchase")))
      .collect().map(r => (r.getInt(0), r.getLong(2))).toSeq
    assert(out == Seq((1, 4L), (2, 1L), (3, 1L)))
  }

  test("funnel: lag averages the per-user step gaps in seconds") {
    // two converters: gaps 2s and 4s -> avg 3.0s
    val e = ev(
      (1L, 0L, "view"), (1L, 2000000L, "click"),
      (2L, 0L, "view"), (2L, 4000000L, "click"))
    val out = Behavior.funnel(e, "user_id", "ts_us", Seq(
      "view" -> (col("event_type") === "view"),
      "click" -> (col("event_type") === "click")))
      .collect()
    assert(out(0).isNullAt(3), "step 1 has no lag")
    assert(out(1).getDouble(3) == 3.0)
  }

  test("transitionMatrix: counts and per-source probabilities") {
    // u1: a->b->a ; u2: a->b  => transitions a->b x2, b->a x1
    val e = ev(
      (1L, 1L, "a"), (1L, 2L, "b"), (1L, 3L, "a"),
      (2L, 1L, "a"), (2L, 2L, "b"))
    val out = Behavior
      .transitionMatrix(e, "user_id", "ts_us", "event_type", "event_id")
      .collect().map(r =>
        (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    assert(out.toSeq == Seq(("a", "b", 2L, 1.0), ("b", "a", 1L, 1.0)))
  }

  test("transitionMatrix: timestamp ties break on the id column") {
    val e = Seq(
      (1L, 5L, "x", 10L), (1L, 5L, "y", 11L), (1L, 5L, "z", 12L))
      .toDF("user_id", "ts_us", "event_type", "event_id")
    val out = Behavior
      .transitionMatrix(e, "user_id", "ts_us", "event_type", "event_id")
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq
    assert(out == Seq(("x", "y"), ("y", "z")))
  }

  test("cohortRetention: day-0 retention is 1.0, later cells exact") {
    val day = 86400000000L
    val e = Seq(
      // cohort day 0: u1 active days 0,1 ; u2 active day 0 only
      (1L, 0L), (1L, day + 5L), (2L, 10L),
      // cohort day 1: u3 active days 1, 3
      (3L, day + 1L), (3L, 3 * day + 1L))
      .toDF("user_id", "us")
      .withColumn("ts", timestamp_micros(col("us")))
    val out = Behavior.cohortRetention(e, "user_id", "ts")
      .collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq
    assert(out == Seq(
      (0L, 0L, 2L, 1.0), (0L, 1L, 1L, 0.5),
      (1L, 0L, 1L, 1.0), (1L, 2L, 1L, 1.0)))
  }

  test("gapFillHourly: gaps carry the last observed value forward") {
    val h = 3600000000L
    val e = Seq(
      ("m", 0L, 10.0), ("m", 1L, 2.0),      // hour 0: 12.0
      ("m", 3 * h + 1L, 7.0))               // hour 3: 7.0; hours 1-2 gap
      .toDF("k", "us", "value")
      .withColumn("ts", timestamp_micros(col("us")))
    val out = Behavior.gapFillHourly(e, "k", "ts", "value")
      .collect().map(r => (r.getLong(1), r.getLong(2),
        Option(r.get(3)), r.getDouble(4), r.getBoolean(5))).toSeq
    assert(out == Seq(
      (0L, 2L, Some(12.0), 12.0, false),
      (h, 0L, None, 12.0, true),
      (2 * h, 0L, None, 12.0, true),
      (3 * h, 1L, Some(7.0), 7.0, false)))
  }

  test("gapFillHourly: each key densifies over its OWN span") {
    val h = 3600000000L
    val e = Seq(("a", 0L, 1.0), ("a", 2 * h, 1.0), ("b", 5 * h, 2.0))
      .toDF("k", "us", "value")
      .withColumn("ts", timestamp_micros(col("us")))
    val out = Behavior.gapFillHourly(e, "k", "ts", "value")
      .groupBy("k").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out == Map("a" -> 3L, "b" -> 1L))
  }

  test("bloom join equals the plain join and thins the probe side") {
    val probe = (1 to 20000).map(i => (i.toLong % 500, i)).toDF("pk", "v")
    val build = Seq(1L, 7L, 13L, 499L).toDF("bk")
    val expected = probe.join(build, col("pk") === col("bk"))
      .select("pk", "v").collect().map(r => (r.getLong(0), r.getInt(1))).sorted
    val got = BloomJoin.join(probe, build, "pk", "bk",
        expectedItems = 10L, numBits = 1L << 14)
      .select("pk", "v").collect().map(r => (r.getLong(0), r.getInt(1))).sorted
    assert(got.toSeq == expected.toSeq)
    // the prefilter alone keeps the true matches and drops most others
    val pred = BloomJoin.mightContain(build, "bk", col("pk"),
      expectedItems = 10L, numBits = 1L << 14)
    val kept = probe.filter(pred).count()
    assert(kept >= expected.length, "bloom must never drop a true match")
    assert(kept < 20000 / 10,
      s"bloom kept $kept of 20000 probe rows — not selective")
  }

  test("rateAnomalies flags only the spike hour, hand-computed z") {
    // one series: nine hours with 1 event, one hour with 100 events.
    // s1=109 s2=10009 h=10 mean=10.9 var=(10009-109*10.9)/9=980.1
    // z_spike=(100-10.9)/sqrt(980.1)=2.84605... -> 2.846
    val hourUs = 3600000000L
    val rows = (0 until 9).map(h => (h * hourUs + 5L, "login")) ++
      (0 until 100).map(i => (9 * hourUs + i, "login"))
    val e = rows.toDF("us", "event_type")
      .withColumn("ts", timestamp_micros(col("us")))
    val out = Behavior.rateAnomalies(e, "event_type", "ts", zThresh = 2.0)
      .collect()
    assert(out.length == 1)
    assert(out(0).getAs[Long]("n") == 100L)
    assert(out(0).getAs[Double]("z") == 2.846)
    assert(out(0).getAs[Double]("mean_n") == 10.9)
  }

  test("rateAnomalies drops unscorable series (one hour / zero variance)") {
    val hourUs = 3600000000L
    val rows =
      Seq((5L, "single")) ++ // one observed hour: no variance possible
        (0 until 4).flatMap(h => Seq((h * hourUs + 1, "flat"),
          (h * hourUs + 2, "flat"))) // constant 2/hour: variance 0
    val e = rows.toDF("us", "event_type")
      .withColumn("ts", timestamp_micros(col("us")))
    assert(Behavior.rateAnomalies(e, "event_type", "ts").count() == 0)
  }

  test("decayWeights is the BigDecimal-exact 10dp power table") {
    assert(Behavior.decayWeights(0.75, 4) ==
      Seq("1.0000000000", "0.7500000000", "0.5625000000", "0.4218750000"))
    assert(Behavior.decayWeights(0.5, 3) ==
      Seq("1.0000000000", "0.5000000000", "0.2500000000"))
  }

  test("decayedHourlyRate: hand-computed decayed sums, gaps skip terms") {
    // type a: 2 events in hour 0, 1 in hour 1, 1 in hour 3 (hour 2 empty).
    // decay 0.5, horizon 3 (weights 1, 0.5, 0.25):
    //   h0: 2*1                  = 2.0
    //   h1: 1*1 + 2*0.5          = 2.0
    //   h3: 1*1 + 1*0.25 (h1 at offset 2; empty h2 contributes nothing)
    //                            = 1.25
    val hourUs = 3600000000L
    val rows = Seq(0L * hourUs, 0L * hourUs + 7, 1L * hourUs + 3,
      3L * hourUs + 9).map(us => (us, "a"))
    val e = rows.toDF("us", "event_type")
      .withColumn("ts", timestamp_micros(col("us")))
    val out = Behavior
      .decayedHourlyRate(e, "event_type", "ts", decay = 0.5,
        horizonHours = 3)
      .collect()
      .map(r => (r.getAs[Long]("hour_us") / hourUs, r.getAs[Long]("n"),
        r.getAs[Double]("decayed_rate")))
    assert(out.toSeq ==
      Seq((0L, 2L, 2.0), (1L, 1L, 2.0), (3L, 1L, 1.25)))
  }

  test("topPaths: prefix depth, (ts,id) tie-break, count-desc/path order") {
    // u1 and u2 both travel a>b>c (u2 has a 4th event that must not
    // count); u3 emits b only; u4 has two events at the SAME µs — the
    // lower event_id must come first in the path.
    val rows = Seq(
      (1L, 10L, "a", 100L), (1L, 20L, "b", 101L), (1L, 30L, "c", 102L),
      (2L, 10L, "a", 200L), (2L, 20L, "b", 201L), (2L, 30L, "c", 202L),
      (2L, 40L, "d", 203L),
      (3L, 10L, "b", 300L),
      (4L, 10L, "y", 402L), (4L, 10L, "x", 401L))
    val e = rows.toDF("user_id", "us", "event_type", "event_id")
      .withColumn("ts", timestamp_micros(col("us")))
    val out = Behavior
      .topPaths(e, "user_id", "ts", "event_type", "event_id",
        depth = 3, topK = 10)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(out.toSeq == Seq(("a>b>c", 2L), ("b", 1L), ("x>y", 1L)))
  }

  test("dwellTime: gaps attribute to the earlier event's type") {
    // u1: a(0) -> b(2s) -> a(5s): a dwells 2s, b dwells 3s; final a
    // contributes nothing. u2: b(0) -> b(4s): b dwells 4s.
    val e = ev(
      (1L, 0L, "a"), (1L, 2000000L, "b"), (1L, 5000000L, "a"),
      (2L, 0L, "b"), (2L, 4000000L, "b"))
    val out = Behavior.dwellTime(e, "user_id", "ts_us", "event_type",
      "event_id")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3)))
    assert(out.toSeq == Seq(
      ("a", 1L, 2.0, 2.0),
      ("b", 2L, 7.0, 3.5)))
  }

  test("absorptionPropensity: hand-computed 4-step value iteration") {
    // chain: a→b (always), b→purchase (2/3) | b→c (1/3), c→b (always).
    // p1(b)=2/3; p2(a)=p2(c)=2/3, p2(b)=2/3; p3(b)=2/3+1/3·2/3=8/9;
    // p4: a=b=c=8/9 → 0.888889 at 6dp, purchase pinned at 1.
    val e = ev(
      (1L, 1L, "a"), (1L, 2L, "b"), (1L, 3L, "purchase"),
      (2L, 1L, "a"), (2L, 2L, "b"),
      (3L, 1L, "b"), (3L, 2L, "purchase"),
      (4L, 1L, "c"), (4L, 2L, "b"), (4L, 3L, "c"))
    val out = Behavior.absorptionPropensity(
      e, "user_id", "ts_us", "event_type", "event_id",
      conversionType = "purchase", steps = 4)
      .collect().map(r => (r.getString(0), r.getDouble(1))).toMap
    assert(out == Map(
      "a" -> 0.888889, "b" -> 0.888889, "c" -> 0.888889,
      "purchase" -> 1.0))
  }

  test("markovAttribution: gatekeeper channel gets full credit") {
    // every conversion flows through 'a'; 'b' is never on a converting
    // path: removing a kills all conversions (effect 1), removing b
    // changes nothing (effect 0) — walks die, no renormalization
    val e = ev(
      (1L, 1L, "a"), (1L, 2L, "purchase"),
      (2L, 1L, "a"), (2L, 2L, "purchase"),
      (3L, 1L, "b"), (3L, 2L, "x"))
    val out = Behavior.markovAttribution(
      e, "user_id", "ts_us", "event_type", "event_id",
      conversionType = "purchase", channels = Seq("a", "b"), steps = 4)
      .collect().map(r => (r.getString(0), r.getDouble(1),
        r.getDouble(2), r.getDouble(3)))
    assert(out.toSeq == Seq(
      ("a", 0.0, 1.0, 1.0),
      ("b", 0.666667, 0.0, 0.0)))
  }

  test("cohortLtv: decimal cumulative revenue and per-user LTV") {
    val day = 86400000000L
    // cohort day 0 = {u1, u2}; cohort day 1 = {u3}
    val rows = Seq(
      (1L, 0L, "signup", 0.0), (1L, 1L, "purchase", 10.0),
      (1L, 2 * day, "purchase", 5.0),
      (2L, 2L, "view", 0.0), (2L, 2 * day + 1, "purchase", 1.0),
      (3L, day, "purchase", 2.0))
    val e = rows.toDF("user_id", "ts_us", "event_type", "value")
    val out = Behavior.cohortLtv(
      e, "user_id", "ts_us", "event_type", "value", "purchase")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5)))
    assert(out.toSeq == Seq(
      (0L, 0L, 2L, 10.0, 10.0, 5.0),
      (0L, 2L, 2L, 6.0, 16.0, 8.0),
      (1L, 0L, 1L, 2.0, 2.0, 2.0)))
  }

  test("cusumChangepoints: hand-computed trajectory, level shift fires") {
    // 8 hours of counts [1,1,1,1,5,5,5,5], slack 0: T=8, total=24,
    // d = 8x-24 = [-16×4, +16×4]; P = -16,-32,-48,-64,-48,-32,-16,0;
    // S = P - min(0, runmin P) = 0,0,0,0,16,32,48,64. thr=2 counts →
    // alarm when S > 16: hours 5,6,7 → 3 alarms, first at hour 5.
    val hour = 3600000000L
    val rows = (0 until 8).flatMap { h =>
      val x = if (h < 4) 1 else 5
      (0 until x).map(i => (h.toLong * hour + i, "a"))
    }
    val e = rows.toDF("ts_us", "event_type")
      .withColumn("ts", timestamp_micros(col("ts_us")))
    val out = Behavior.cusumChangepoints(e, "event_type", "ts",
      slackCounts = 0L, thresholdCounts = 2L).collect()
    assert(out.length == 1)
    val r = out(0)
    assert((r.getLong(1), r.getLong(2), r.getLong(3)) == ((8L, 24L, 3L)))
    assert(r.getLong(4) == 5L * hour, "first alarm at hour 5")
    assert(r.getLong(5) == 64L)
  }

  test("cusumChangepoints: gap hours count as zero on the grid") {
    // hours 0 and 2 have 2 events each, hour 1 is a gap: T=3, total=4,
    // d = 3x-4 = [2,-4,2]; P = 2,-2,0; S = 2,0,2. thr 0 → alarms at
    // hours 0 and 2.
    val hour = 3600000000L
    val rows = Seq((0L, "a"), (1L, "a"),
      (2L * hour, "a"), (2L * hour + 1, "a"))
    val e = rows.toDF("ts_us", "event_type")
      .withColumn("ts", timestamp_micros(col("ts_us")))
    val out = Behavior.cusumChangepoints(e, "event_type", "ts",
      slackCounts = 0L, thresholdCounts = 0L).collect()
    val r = out(0)
    assert((r.getLong(1), r.getLong(3), r.getLong(4), r.getLong(5)) ==
      ((3L, 2L, 0L, 2L)))
  }

  test("activeUsers: DAU exact, WAU unions the trailing window") {
    val day = 86400000000L
    val rows = Seq((1L, 0L), (2L, 1L), (2L, day + 2L), (1L, 8L * day))
    val e = rows.toDF("user_id", "ts_us")
    val out = Behavior.activeUsers(e, "user_id", "ts_us", windowDays = 7)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq == Seq((0L, 2L, 2L), (1L, 1L, 2L), (8L, 1L, 1L)))
  }

  test("activeUsers: pre-1970 epochs bucket by FLOOR division") {
    // -1µs is day -1 under floor division (DuckDB //, Math.floorDiv);
    // Spark's truncating `div` would put it in day 0 and merge the two
    // users into one DAU bucket
    val rows = Seq((1L, -1L), (2L, 0L))
    val e = rows.toDF("user_id", "ts_us")
    val out = Behavior.activeUsers(e, "user_id", "ts_us", windowDays = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq == Seq((-1L, 1L, 1L), (0L, 1L, 2L)))
  }

  test("floorDivExpr matches Math.floorDiv across signs") {
    val d = 7L
    val xs = Seq(-15L, -8L, -7L, -1L, 0L, 1L, 6L, 7L, 13L)
    val got = xs.toDF("x")
      .selectExpr("x", Behavior.floorDivExpr("x", d) + " AS fd")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    xs.foreach(x => assert(got(x) == Math.floorDiv(x, d),
      s"x=$x: got ${got(x)}, want ${Math.floorDiv(x, d)}"))
  }

  test("rfmSegments: integer-derived buckets, best gets 5, n=1 pins 1") {
    val day = 86400000000L
    // 5 purchasers with strictly increasing recency/frequency/monetary
    // alignment: user k purchases k+1 times of value 10, last on day k
    // (so user 4 is most recent, most frequent, highest monetary)
    val rows = for {
      u <- 0 to 4
      i <- 0 to u
    } yield (u.toLong, i.toLong * day + u, "purchase", 10.0)
    val e = (rows :+ ((9L, 9L * day, "view", 0.0)))
      .toDF("user_id", "ts_us", "event_type", "value")
    val out = Behavior.rfmSegments(
      e, "user_id", "ts_us", "event_type", "value", "purchase")
      .collect().map(r => (r.getLong(0), r.getLong(4), r.getLong(5),
        r.getLong(6), r.getLong(7))).toSeq
    // ref day = 9 (the view); user 4: recency 9-4=5 days is the most
    // recent → r=5; also f=5, m=5 → rfm 555. user 0: oldest, fewest,
    // least → 111. Interior users hit buckets 2/3/4 exactly.
    assert(out == Seq((0L, 1L, 1L, 1L, 111L), (1L, 2L, 2L, 2L, 222L),
      (2L, 3L, 3L, 3L, 333L), (3L, 4L, 4L, 4L, 444L),
      (4L, 5L, 5L, 5L, 555L)), out.toString)
    // single purchaser: every score pins to bucket 1 (n = 1 guard)
    val solo = Seq((7L, 0L, "purchase", 3.0))
      .toDF("user_id", "ts_us", "event_type", "value")
    val r1 = Behavior.rfmSegments(
      solo, "user_id", "ts_us", "event_type", "value", "purchase").head()
    assert((r1.getLong(4), r1.getLong(5), r1.getLong(6)) == ((1L, 1L, 1L)))
  }

  test("kaplanMeier: censored user shrinks the risk set without dying") {
    val day = 86400000000L
    // u1, u4 purchase at duration 1; u2 at duration 3; u3 never
    // purchases and is last seen at duration 2 (censored there).
    // Risk sets (desc-cumulative exits): t=1 → 4, t=3 → 1.
    // survival: t=1: 1·(1−2/4)=0.5; t=3: 0.5·(1−1/1)=0.0.
    val rows = Seq(
      (1L, 0L, "view"), (1L, 1L * day, "purchase"),
      (2L, 0L, "view"), (2L, 3L * day, "purchase"),
      (3L, 0L, "view"), (3L, 2L * day, "view"),
      (4L, 0L, "view"), (4L, 1L * day, "purchase"))
      .toDF("user_id", "ts_us", "event_type")
    val out = Behavior.kaplanMeier(
      rows, "user_id", "ts_us", col("event_type") === "purchase")
      .collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq
    assert(out == Seq((1L, 2L, 4L, 0.5), (3L, 1L, 1L, 0.0)), out.toString)
  }

  test("shapleyAttribution: hand-computed two-channel game") {
    // conv by touched set: {A}:6, {B}:2, {A,B}:4, {}:1
    // v(∅)=1 v(A)=7 v(B)=3 v(AB)=13
    // 2φ_A = (v(A)−v(∅)) + (v(AB)−v(B)) = 6+10 = 16 → φ_A = 8
    // 2φ_B = (v(B)−v(∅)) + (v(AB)−v(A)) = 2+6  = 8  → φ_B = 4
    // φ_A + φ_B = 12 = v(AB) − v(∅) (efficiency)
    def journey(u: Long, touches: Seq[String], conv: Int) =
      touches.map(t => (u, t)) ++ Seq.fill(conv)((u, "buy"))
    val rows =
      journey(1, Seq("A"), 6) ++ journey(2, Seq("B"), 2) ++
      journey(3, Seq("A", "B"), 4) ++ journey(4, Seq.empty, 1)
    val out = Behavior.shapleyAttribution(
      rows.toDF("user_id", "event_type"), "user_id", "event_type",
      conversionType = "buy", channels = Seq("A", "B"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(out.toSeq == Seq(("A", 16L, 8.0), ("B", 8L, 4.0)), out.toSeq)
  }

  test("lastTouchAttribution: window, last-wins, ties, unattributed") {
    // u1 click 50s before purchase (in 60s window) -> click, lag 50s
    // u2 view 100s before purchase (outside window) -> unattributed
    // u3 purchase with no touch at all              -> unattributed
    // u4 click then view then error then purchase   -> view (last touch
    //    wins, non-touch 'error' doesn't steal it), lag 10s
    // u5 click at the SAME µs as the purchase, lower id -> attributed
    //    (strictly-preceding is (ts, id) row order), lag 0
    val rows = Seq(
      (1L, 100000000L, "click", 0.0, 10L),
      (1L, 150000000L, "purchase", 10.0, 11L),
      (2L, 0L, "view", 0.0, 20L),
      (2L, 100000000L, "purchase", 5.0, 21L),
      (3L, 50L, "purchase", 1.0, 30L),
      (4L, 10000000L, "click", 0.0, 40L),
      (4L, 20000000L, "view", 0.0, 41L),
      (4L, 25000000L, "error", 0.0, 42L),
      (4L, 30000000L, "purchase", 2.0, 43L),
      (5L, 100000000L, "click", 0.0, 50L),
      (5L, 100000000L, "purchase", 3.0, 51L))
    val e = rows.toDF("user_id", "ts_us", "event_type", "value", "event_id")
    val out = Behavior.lastTouchAttribution(
      e, "user_id", "ts_us", "event_id", "event_type", "value",
      conversionType = "purchase",
      touchTypes = Seq("click", "view", "signup"),
      lookbackUs = 60000000L)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        if (r.isNullAt(3)) None else Some(r.getDouble(3))))
    assert(out.toSeq == Seq(
      ("click", 2L, 13.0, Some(25.0)),
      ("unattributed", 2L, 6.0, None),
      ("view", 1L, 2.0, Some(10.0))))
  }

  test("funnelWilson: hand-computed interval, empty-prev transitions drop") {
    // 4 users view; 1 converts to click strictly after; none purchase.
    // p = 0.25, n = 4, z = 1.96 — replay the exact expression here
    val ev = Seq(
      (1L, 10L, "view"), (2L, 10L, "view"), (3L, 10L, "view"),
      (4L, 10L, "view"), (1L, 20L, "click"))
      .toDF("user_id", "ts_us", "event_type")
    val got = Behavior.funnelWilson(ev, "user_id", "ts_us", Seq(
      "view" -> ($"event_type" === "view"),
      "click" -> ($"event_type" === "click"),
      "purchase" -> ($"event_type" === "purchase")))
      .collect().map(r => (r.getInt(0).toLong, r.getString(1),
        r.getLong(2), r.getLong(3), r.getDouble(4), r.getDouble(5),
        r.getDouble(6)))
      .toSeq
    def rnd(x: Double) = java.math.BigDecimal.valueOf(x)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
    val (p, n, z) = (0.25, 4.0, 1.96)
    val z2 = z * z
    val center = p + z2 / (2.0 * n)
    val margin = z * math.sqrt((p * (1.0 - p)) / n + z2 / (4.0 * n * n))
    val lo = rnd((center - margin) / (1.0 + z2 / n))
    val hi = rnd((center + margin) / (1.0 + z2 / n))
    // the click->purchase transition has n_prev = 1 > 0 and 0
    // conversions: rate 0, lo 0 — present; nothing drops here, but a
    // zero-user PREVIOUS step would (inner join + n_prev > 0)
    assert(got.length == 2, got.toString)
    assert(got.head == (2L, "click", 4L, 1L, 0.25, lo, hi), got.toString)
    assert(got(1)._1 == 3L && got(1)._4 == 0L && got(1)._5 == 0.0)
  }

  test("seasonalProfile: median and MAD are outlier-immune per cell") {
    val us = 3600000000L
    // hod 0: hourly counts 1, 3, 10 (the 10 is the outlier a mean
    // profile would absorb) -> median 3, deviations {2,0,7} -> MAD 2
    // hod 1: counts 2, 4 -> median 3.0, deviations {1,1} -> MAD 1
    val rows =
      Seq.fill(1)((0L * us)) ++ Seq.fill(3)(24L * us) ++
        Seq.fill(10)(48L * us) ++
        Seq.fill(2)(1L * us) ++ Seq.fill(4)(25L * us)
    val ev = rows.map(ts => ("a", ts)).toDF("event_type", "ts_us")
    val got = Behavior.seasonalProfile(ev, "event_type", "ts_us")
      .as[(String, Long, Long, Double, Double)].collect().toSeq
    assert(got == Seq(
      ("a", 0L, 3L, 3.0, 2.0),
      ("a", 1L, 2L, 3.0, 1.0)), got.toString)
  }

  test("sequencePatterns: contiguous runs, support vs occurrences, " +
      "ts tie-break, minUsers cut") {
    // u1: a b a b   (bigram a>b twice — 1 user, 2 occurrences)
    // u2: a b c     (trigram a>b>c; ts tie at 20 broken by event_id)
    val ev = Seq(
      (1L, 10L, 100L, "a"), (1L, 20L, 101L, "b"),
      (1L, 30L, 102L, "a"), (1L, 40L, 103L, "b"),
      (2L, 10L, 200L, "a"), (2L, 20L, 201L, "b"), (2L, 20L, 202L, "c"))
      .toDF("user_id", "ts_us", "event_id", "event_type")
    val got = Behavior.sequencePatterns(
      ev, "user_id", "ts_us", "event_type", "event_id", maxLen = 3)
      .as[(Int, String, Long, Long)].collect().toSeq
    assert(got == Seq(
      (2, "a>b", 2L, 3L),
      (2, "b>a", 1L, 1L),
      (2, "b>c", 1L, 1L),
      (3, "a>b>a", 1L, 1L),
      (3, "a>b>c", 1L, 1L),
      (3, "b>a>b", 1L, 1L)), got.toString)
    // support threshold keeps only the cross-user pattern
    val cut = Behavior.sequencePatterns(
      ev, "user_id", "ts_us", "event_type", "event_id",
      maxLen = 3, minUsers = 2L)
      .as[(Int, String, Long, Long)].collect().toSeq
    assert(cut == Seq((2, "a>b", 2L, 3L)), cut.toString)
  }

  test("sequencePatterns: NULL types poison runs; '>' in a type fails loudly") {
    // NULL in the middle of u1's timeline must NOT fabricate an a>b run:
    // a and NULL are not a pattern, NULL and b are not a pattern, and a
    // and b were never contiguous — zero patterns survive
    val withNull = Seq(
      (1L, 10L, 100L, Some("a")), (1L, 20L, 101L, None),
      (1L, 30L, 102L, Some("b")))
      .toDF("user_id", "ts_us", "event_id", "event_type")
    val got = Behavior.sequencePatterns(
      withNull, "user_id", "ts_us", "event_type", "event_id", maxLen = 2)
      .as[(Int, String, Long, Long)].collect().toSeq
    assert(got.isEmpty, got.toString)
    // ...and runs fully on either side of the NULL still count
    val flank = Seq(
      (1L, 10L, 100L, Some("a")), (1L, 20L, 101L, Some("b")),
      (1L, 30L, 102L, None),
      (1L, 40L, 103L, Some("a")), (1L, 50L, 104L, Some("b")))
      .toDF("user_id", "ts_us", "event_id", "event_type")
    val fgot = Behavior.sequencePatterns(
      flank, "user_id", "ts_us", "event_type", "event_id", maxLen = 3)
      .as[(Int, String, Long, Long)].collect().toSeq
    assert(fgot == Seq((2, "a>b", 1L, 2L)), fgot.toString)

    // a type containing the separator would merge distinct patterns:
    // enforced in the row path, not just documented
    val bad = Seq(
      (1L, 10L, 100L, "a>b"), (1L, 20L, 101L, "c"))
      .toDF("user_id", "ts_us", "event_id", "event_type")
    val e = intercept[Exception] {
      Behavior.sequencePatterns(
        bad, "user_id", "ts_us", "event_type", "event_id", maxLen = 2)
        .collect()
    }
    val msgs = Iterator.iterate(e: Throwable)(_.getCause)
      .takeWhile(_ != null).map(_.getMessage).mkString(" | ")
    assert(msgs.contains("separator"), msgs)
  }

  test("logRank: mirrored cohorts score exactly 0; one-sided deaths " +
      "hit the hand chi2") {
    val day = 86400000000L
    // A = {1: dies day 1→2, 2: censored day 5}; B mirrors exactly →
    // at the one event time O1 = E1 → chi2 = +0
    val sym = Seq(
      (1L, 0L, "visit"), (1L, 2 * day, "purchase"),
      (2L, 0L, "visit"), (2L, 5 * day, "visit"),
      (3L, 0L, "visit"), (3L, 2 * day, "purchase"),
      (4L, 0L, "visit"), (4L, 5 * day, "visit"))
      .toDF("user_id", "ts_us", "event_type")
    val got = Behavior.logRank(sym, "user_id", "ts_us",
        col("event_type") === "purchase",
        armOf = col("user_id") <= 2L)
      .as[(Long, Long, Double, Option[Double])].collect().head
    assert(got == ((1L, 1L, 1.0, Some(0.0))), got.toString)
    // every A dies at day 1, every B survives to day 5:
    // e1 = 2·2/4 = 1, v = 2·(1/2)(1/2)·2/3 → chi2 = 1/0.3333333333 → 3
    val asym = Seq(
      (1L, 0L, "visit"), (1L, 1 * day, "purchase"),
      (3L, 0L, "visit"), (3L, 1 * day, "purchase"),
      (2L, 0L, "visit"), (2L, 5 * day, "visit"),
      (4L, 0L, "visit"), (4L, 5 * day, "visit"))
      .toDF("user_id", "ts_us", "event_type")
    val a = Behavior.logRank(asym, "user_id", "ts_us",
        col("event_type") === "purchase",
        armOf = col("user_id") % 2 === 1L)
      .as[(Long, Long, Double, Option[Double])].collect().head
    assert(a == ((1L, 2L, 1.0, Some(3.0))), a.toString)
  }
}
