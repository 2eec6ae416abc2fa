package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench noise guard (Bench.needsRemeasure / arbitrateSecondPass)
  * — born from the round-10 driver bench, where a loaded window
  * poisoned aq5_json's warmup AND both timed runs (6.32 s recorded vs
  * 0.47 s steady, 19×). The guard arbitrates any fresh median >1.5×
  * the committed artifact (>3× below the 0.3 s noise floor); r11 set
  * the 1.5× (1.9–2.8× noise rows slipped under a 3× trigger and
  * inflated their own next-round baseline). r12 proved the SAME-WINDOW
  * re-measure insufficient: one sustained loaded window poisoned an
  * alphabetically contiguous band (aq45–aq56, up to 7.6× steady) and
  * the inline re-measure ran inside that same window — so arbitration
  * is now a SECOND PASS that runs only after the full sweep ends. */
class BenchGuardSpec extends AnyFunSuite {

  test("noise spike second-passes back to steady state") {
    // committed 0.47s, loaded-window fresh median 6.32s (the aq5_json
    // shape); the second pass lands at steady state and wins the min
    var remeasured = List.empty[String]
    val got = Bench.arbitrateSecondPass(
      Seq("aq5_json" -> 6.32, "q1_agg" -> 0.45),
      Map("aq5_json" -> 0.47, "q1_agg" -> 0.44),
      n => { remeasured ::= n; 0.51 })
    assert(remeasured == List("aq5_json")) // untriggered rows untouched
    assert(got("aq5_json") == 0.51 && got("q1_agg") == 0.45)
  }

  test("sustained loaded window: every triggered row re-measures AFTER " +
    "the sweep completes, so a same-window inline re-measure cannot " +
    "launder the band through") {
    // the r12 failure shape: the sweep runs alphabetically, a sustained
    // window inflates a contiguous band (aq45..aq56 at 4-8x committed),
    // and an INLINE re-measure taken during the same band would also
    // be inflated. Model time explicitly: the window covers the whole
    // sweep (ticks 0..N) and has ended by the time the second pass
    // runs — arbitrateSecondPass only ever invokes `remeasure` after
    // receiving the COMPLETE fresh sequence, which is the temporal
    // separation the r12 inline guard lacked.
    val committed = Map("aq45" -> 0.32, "aq55" -> 0.30, "aq56" -> 1.12,
      "zz_last" -> 0.50)
    // simulate the box clock: the loaded window spans ticks [0, 8) —
    // the whole alphabetical sweep INCLUDING any inline re-measures —
    // and lifts only before the second pass. Any measurement taken
    // inside the window is 5x inflated.
    var tick = 0
    def loaded = tick <= 8
    def measureOnBox(name: String): Double = {
      val steady = Map("aq45" -> 0.33, "aq55" -> 0.31, "aq56" -> 1.15,
        "zz_last" -> 0.52)(name)
      tick += 1
      if (loaded) steady * 5 else steady
    }
    // the sweep measures every query inside the window
    val fresh = Seq("aq45", "aq55", "aq56", "zz_last").map { n =>
      val m = measureOnBox(n)
      // an INLINE re-measure (the r12 guard) would still be inside the
      // window — min of two poisoned medians stays poisoned
      if (Bench.needsRemeasure(m, committed.get(n)))
        assert(math.min(m, measureOnBox(n)) > 3 * committed(n),
          "inline same-window arbitration must fail here by construction")
      n -> m
    }
    // the second pass runs after the window lifted: every triggered
    // row (all four — the whole band) corrects to steady state
    val arbitrated = Bench.arbitrateSecondPass(fresh, committed, measureOnBox)
    assert(arbitrated("aq45") == 0.33 && arbitrated("aq55") == 0.31 &&
      arbitrated("aq56") == 1.15 && arbitrated("zz_last") == 0.52)
  }

  test("real regression survives the second pass") {
    // code got genuinely 5× slower: the second-pass median is slow too
    // and the regression is REPORTED, not laundered away
    val got = Bench.arbitrateSecondPass(
      Seq("q" -> 2.5), Map("q" -> 0.5), _ => 2.4)
    assert(got("q") == 2.4) // min of two honest slow medians
  }

  test("no re-measure inside 1.5×, for new queries, or vs a 0 committed") {
    var called = false
    val boom = (_: String) => { called = true; 0.0 }
    assert(Bench.arbitrateSecondPass(
      Seq("a" -> 0.7), Map("a" -> 0.5), boom)("a") == 0.7)  // 1.4× ok
    assert(Bench.arbitrateSecondPass(
      Seq("b" -> 9.9), Map.empty, boom)("b") == 9.9)        // fresh query
    assert(Bench.arbitrateSecondPass(
      Seq("c" -> 9.9), Map("c" -> 0.0), boom)("c") == 9.9)  // degenerate
    assert(!called)
  }

  test("the 1.5-3x band re-measures (the r11 slip), tiny queries don't") {
    // sq22's r11 shape: committed 4.47 steady, loaded fresh 7.04
    // (1.6×) — under the old 3× trigger this wrote through and
    // inflated the baseline; now it arbitrates
    var remeasured = 0
    val got = Bench.arbitrateSecondPass(
      Seq("sq22" -> 7.04), Map("sq22" -> 4.47),
      _ => { remeasured += 1; 4.5 })
    assert(remeasured == 1 && got("sq22") == 4.5)
    // below the 0.3s noise floor 1.5× is sub-100ms jitter: 3× applies
    var called = false
    assert(Bench.arbitrateSecondPass(
      Seq("t" -> 0.25), Map("t" -> 0.13),
      _ => { called = true; 0.0 })("t") == 0.25) // 1.9× but tiny
    assert(!called)
  }

  test("committedQueries parses the artifact line, skipping err rows") {
    val line = """{"metric":"total","value":12.3,"unit":"sec",""" +
      """"queries":{"q1_agg":0.47,"aq5_json":1.2e-1,"st2_broken":"err",""" +
      """"dq7_x":2.0},"first_run":{"q1_agg":0.5},"sf":"/x"}"""
    val got = Bench.committedQueries(line)
    assert(got == Map("q1_agg" -> 0.47, "aq5_json" -> 0.12, "dq7_x" -> 2.0))
    assert(Bench.committedQueries("not json").isEmpty)
    assert(Bench.committedQueries("").isEmpty)
  }

  test("the committed artifact itself parses and covers the registry") {
    val text = java.nio.file.Files.readString(
      java.nio.file.Paths.get("bench_results.json"))
    val got = Bench.committedQueries(text)
    // every parsed value is a sane wall time; coverage vs the registry
    // is RepoHygieneSpec's assertion — here we pin that the guard's
    // parser sees the same artifact the driver writes
    assert(got.nonEmpty)
    assert(got.values.forall(v => v > 0.0 && v < 600.0))
    assert(got.keySet.subsetOf(SparkEntry.queries.keySet))
  }
}
