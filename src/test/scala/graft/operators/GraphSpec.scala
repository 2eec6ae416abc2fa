package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

/** PageRank: fixed-point sanity, mass conservation on undirected
  * graphs, dangling-node semantics, and a seeded differential against
  * a driver-side replay of the exact 12dp-pinned arithmetic — the
  * oracle-grade check that the distributed trajectory matches the
  * scalar one bit-for-bit. The sf-scale DuckDB replay runs in the
  * aq44 gate. */
class GraphSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def run(edges: Seq[(Long, Long)], iters: Int = 3) =
    Graph.pageRank(edges.toDF("src", "dst"), iters)
      .as[(Long, Double)].collect().toMap

  /** Driver-side replay of pageRank's exact arithmetic (same
    * Java-BigDecimal HALF_UP rounding Spark's `round` uses, same
    * decimal contribution sums). */
  private def ref(
      edges: Seq[(Long, Long)], iters: Int,
      damping: Double = 0.85): Map[Long, Double] = {
    def r12(x: Double): Double =
      java.math.BigDecimal.valueOf(x)
        .setScale(12, java.math.RoundingMode.HALF_UP).doubleValue()
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct
    val n = nodes.size.toDouble
    val outdeg = edges.groupBy(_._1).view.mapValues(_.size).toMap
    var rank = nodes.map(_ -> r12(1.0 / n)).toMap
    for (_ <- 1 to iters) {
      val contrib = scala.collection.mutable.Map[Long, BigDecimal]()
        .withDefaultValue(BigDecimal(0))
      for ((s, d) <- edges)
        contrib(d) += BigDecimal(java.math.BigDecimal.valueOf(
          r12(rank(s) / outdeg(s))))
      rank = nodes.map(nd => nd ->
        r12((1.0 - damping) / n + damping * contrib(nd).toDouble)).toMap
    }
    rank
  }

  test("two-node cycle is a fixed point at 0.5 / 0.5") {
    val r = run(Seq((1L, 2L), (2L, 1L)), iters = 4)
    assert(r == Map(1L -> 0.5, 2L -> 0.5))
  }

  test("undirected graph conserves rank mass (sum == 1 up to rounding)") {
    val und = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L))
    val edges = und ++ und.map(_.swap)
    val r = run(edges)
    // per-node ranks are 12dp-pinned (≤ 0.5e-12 rounding each); the
    // map-iteration double sum adds order-dependent ulp noise on top,
    // so the bound carries a 1e-15 fp-summation epsilon
    assert(math.abs(r.values.sum - 1.0) < r.size * 1e-12 + 1e-15)
    // the degree-3 hub outranks the degree-1 leaf
    assert(r(3L) > r(4L))
  }

  test("dangling node keeps teleport share, redistributes nothing") {
    // 1 → 2 only: node 2 is dangling. Hand trajectory (N=2):
    //   r0 = 0.5 / 0.5
    //   r1: rank(1) = round(0.15/2, 12) = 0.075 (no inbound),
    //       rank(2) = round(0.075 + 0.85·0.5, 12) = 0.5
    //   r2: rank(2) = round(0.075 + 0.85·0.075, 12) = 0.13875
    val r = run(Seq((1L, 2L)), iters = 2)
    assert(r(1L) == 0.075)
    assert(r(2L) == 0.13875)
    // dangling mass leaks by design — the simplified formulation
    assert(r.values.sum < 1.0)
  }

  test("seeded differential vs driver-side exact replay") {
    val rnd = new scala.util.Random(11)
    val edges = (0 until 400).map { _ =>
      (rnd.nextInt(40).toLong, rnd.nextInt(40).toLong)
    }.filter(e => e._1 != e._2)
    val got = run(edges, iters = 3)
    val want = ref(edges, iters = 3)
    assert(got.keySet == want.keySet)
    val diffs = got.keys.filter(k => got(k) != want(k))
    assert(diffs.isEmpty,
      s"ranks differ at ${diffs.take(5).map(k => (k, got(k), want(k)))}")
  }

  test("triangleStats: hand-computed counts, clustering ppm, dedup") {
    // triangle {1,2,3}, triangle {2,3,4}, pendant 5 on 1 — fed with
    // duplicates and reversed duplicates (must dedup to one edge each)
    val edges = Seq((1L, 2L), (2L, 1L), (1L, 3L), (2L, 3L), (2L, 4L),
      (3L, 4L), (1L, 5L), (5L, 1L), (1L, 2L))
    val got = Graph.triangleStats(edges.toDF("src", "dst"))
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq(
      (1L, 3L, 1L, 333333L),   // 2e6·1 / (3·2)
      (2L, 3L, 2L, 666666L),
      (3L, 3L, 2L, 666666L),
      (4L, 2L, 1L, 1000000L),  // both neighbors connected
      (5L, 1L, 0L, 0L)),       // degree < 2: coefficient pinned 0
      got.toString)
  }

  test("kCore: peel trajectory and the bounded-rounds contract") {
    // triangle {1,2,3} + chain 3-4-5
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 4L), (4L, 5L))
    // 3 rounds reach the fixed point: round 1 drops 5 (deg 1),
    // round 2 drops 4 (deg 1 without 5), round 3 stable {1,2,3}
    val core = Graph.kCore(edges.toDF("src", "dst"), k = 2, rounds = 3)
      .as[(Long, Long)].collect().toSeq
    assert(core == Seq((1L, 2L), (2L, 2L), (3L, 2L)), core.toString)
    // rounds = 1 stops short: 4 survives round 1 but its reported
    // final-subgraph degree dips below k — the documented contract
    val one = Graph.kCore(edges.toDF("src", "dst"), k = 2, rounds = 1)
      .as[(Long, Long)].collect().toSeq
    assert(one == Seq((1L, 2L), (2L, 2L), (3L, 3L), (4L, 1L)),
      one.toString)
  }

  test("hits: hand-traced 2-iteration hub/authority trajectory") {
    // edges 1->10, 1->11, 2->10. Round 1: a = (10: 2/3, 11: 1/3),
    // h = (1: 0.6, 2: 0.4). Round 2: a_raw = (10: 1.0, 11: 0.6),
    // t = 1.6 -> a = (10: 0.625, 11: 0.375); h_raw = (1: 1.0,
    // 2: 0.625), t = 1.625 -> h = (1: 1/1.625, 2: 0.625/1.625)
    val edges = Seq((1L, 10L), (1L, 11L), (2L, 10L)).toDF("src", "dst")
    val got = Graph.hits(edges, iterations = 2)
      .as[(String, Long, Double)].collect().toSeq
      .sortBy(r => (r._1, r._2)).toSeq
    assert(got == Seq(
      ("authority", 10L, 0.625), ("authority", 11L, 0.375),
      ("hub", 1L, 0.615384615385), ("hub", 2L, 0.384615384615)),
      got.toString)
    // L1 mass: each side sums to ~1 after normalization
    val mass = got.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
    assert(mass.values.forall(v => math.abs(v - 1.0) < 1e-9), mass.toString)
  }

  test("iterative trajectories: bounded job count, AQE flag restored") {
    // AQE turns every exchange into its own query-stage job — pure
    // scheduling tax on |V|-row score frames (aq92 measured 48 jobs
    // with AQE vs 18 after the scoped-off window; wall time followed).
    // Pin an upper bound so a regression back to per-stage jobs fails
    // loudly, and prove the session flag is restored (even the set
    // case: the operator must not clobber a caller's explicit choice).
    val sc = spark.sparkContext
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    val edges = (1L to 200L).map(i => (i % 20, i % 31)).toDF("src", "dst")
    val jobs = new java.util.concurrent.atomic.AtomicInteger
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          s: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
    }
    sc.addSparkListener(listener)
    try {
      Graph.hits(edges, iterations = 3).count()
      var last = -1
      var cur = jobs.get
      while (cur != last) { Thread.sleep(400); last = cur; cur = jobs.get }
      // 3 rounds × (2 aggregate/broadcast actions + 2 eager cuts) +
      // setup + the final count — anything near the AQE-on regime
      // (~45+) means the scoped-off window regressed
      assert(cur <= 25, s"hits(3) ran $cur jobs — scheduling regressed")
      assert(spark.conf.get("spark.sql.adaptive.enabled") == "true")
      // pageRank keeps its window too — A/B'd at sf0.1 (r12): wrapped
      // 12 jobs / 3.16-3.26 s steady vs unwrapped 36 jobs /
      // 3.85-4.12 s. Unlike kCore (whose rounds shrink a genuinely
      // edge-sized frame and AQE coalescing won), aq44's 587k-edge
      // contrib join is small enough per round that scheduling tax
      // dominates — the boundary metric is per-round BYTES MOVED vs
      // job overhead, not the frame's nominal kind. Pin it like hits.
      jobs.set(0)
      Graph.pageRank(edges, iterations = 3).count()
      last = -1
      cur = jobs.get
      while (cur != last) { Thread.sleep(400); last = cur; cur = jobs.get }
      assert(cur <= 20, s"pageRank(3) ran $cur jobs — scheduling regressed")
      assert(spark.conf.get("spark.sql.adaptive.enabled") == "true")
    } finally {
      sc.removeSparkListener(listener)
      spark.conf.unset("spark.sql.adaptive.enabled")
    }
  }

  test("minLabelPropagate: bounded sweeps carry the min label exactly " +
    "r hops") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (5L, 6L))
      .toDF("src", "dst")
    // one sweep: each node sees distance-1 labels only
    val r1 = Graph.minLabelPropagate(edges, rounds = 1)
      .as[(Long, Long)].collect().toSeq
    assert(r1 == Seq((1L, 2L), (5L, 2L), (2L, 1L), (3L, 1L)), r1.toString)
    // three sweeps cover the whole 4-chain
    val r3 = Graph.minLabelPropagate(edges, rounds = 3)
      .as[(Long, Long)].collect().toSeq
    assert(r3 == Seq((1L, 4L), (5L, 2L)), r3.toString)
  }

  test("graph trajectories use reliable checkpoints when a checkpoint " +
    "dir is set — identical results, files written, scope release safe") {
    // the 100-TB mode: with a checkpoint dir configured every
    // RoundScope cut (rounds AND the finish) must route through
    // reliable checkpoints — results identical to local mode, and the
    // scope's deterministic release of intermediates must not disturb
    // a consumer of the returned (checkpointed) frame
    val sc = spark.sparkContext
    val dir = java.nio.file.Files.createTempDirectory("graft-gckpt").toString
    val edges = (1L to 200L).map(i => (i % 20, i % 31)).toDF("src", "dst")
    def run(): (Seq[(Long, Double)], Seq[(String, Long, Double)]) = (
      Graph.pageRank(edges, iterations = 3)
        .as[(Long, Double)].collect().toSeq.sortBy(_._1),
      Graph.hits(edges, iterations = 2)
        .as[(String, Long, Double)].collect().toSeq.sortBy(r => (r._1, r._2))
    )
    val before = run()
    sc.setCheckpointDir(dir)
    try {
      val withReliable = run()
      assert(withReliable == before)
      val wrote = java.nio.file.Files.walk(java.nio.file.Paths.get(dir))
        .filter(java.nio.file.Files.isRegularFile(_)).count()
      assert(wrote > 0, "no reliable checkpoint files written")
    } finally {
      val f = sc.getClass.getDeclaredField("checkpointDir")
      f.setAccessible(true)
      f.set(sc, None)
      assert(sc.getCheckpointDir.isEmpty)
    }
  }

  test("assortativity: a star is perfectly disassortative, a regular " +
      "graph has no mixing to correlate") {
    // star 1—{2,3,4}: every edge joins deg 3 to deg 1 → r = −1
    val star = Seq((1L, 2L), (1L, 3L), (1L, 4L)).toDF("a", "b")
    val got = Graph.assortativity(star)
      .as[(Long, Long, Option[Double])].collect().head
    assert(got == ((4L, 3L, Some(-1.0))), got.toString)
    // 4-cycle: all degrees 2 → zero degree variance → NULL
    val cycle = Seq((1L, 2L), (2L, 3L), (3L, 4L), (1L, 4L))
      .toDF("a", "b")
    val reg = Graph.assortativity(cycle)
      .as[(Long, Long, Option[Double])].collect().head
    assert(reg == ((4L, 4L, None)), reg.toString)
  }
}
