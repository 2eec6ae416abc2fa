package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Behavioral analytics over an event stream table `(user, ts, type,
  * value, ...)` — the ordered-sequence operators every product/ops
  * pipeline runs on its event firehose: funnels, transition matrices,
  * cohort retention, and gap-filled time series. The reference routes
  * events through per-event handlers and conditional descriptors
  * (`nexus/task.py:1050-1165`); these operators are the corresponding
  * *set-oriented* formulations, declared as DataFrame plans so Catalyst
  * schedules them scale-out.
  *
  * Scale shapes (each documented per method):
  *   - every shuffle is keyed on the entity (user / series key), never
  *     on a global order;
  *   - ordered logic runs inside per-entity window partitions (bounded
  *     by one entity's history, the same invariant q11's sessionize
  *     relies on);
  *   - outputs are small aggregates (steps / type pairs / cohort cells
  *     / series points), so nothing here materializes row-per-event
  *     results.
  */
object Behavior {

  /** FLOOR-division SQL fragment for integer bucketing, `⌊x / d⌋`.
    *
    * Spark's `div` truncates toward zero while DuckDB's `//` (and
    * Python's `//`, java.lang.Math.floorDiv) floors — they disagree on
    * every negative operand, so a pre-1970 µs epoch would land one
    * bucket apart between engine and oracle and silently shift
    * trailing-window semantics. `(x - pmod(x, d)) div d` is exact floor
    * division in pure integer arithmetic: `pmod` is non-negative, the
    * difference is exactly divisible by `d`, so the truncating `div`
    * never actually truncates. (A `floor(x / d)` double formulation is
    * NOT safe: µs epochs exceed a double's exact-integer range after
    * the division's rounding at exact-multiple boundaries.)
    *
    * Domain: `x > Long.MinValue + d` — the subtraction overflows within
    * `d` of Long.MinValue (a µs epoch in year ≈ −292 million; every
    * representable timestamp is far inside the bound). */
  def floorDivExpr(x: String, d: Long): String =
    floorDivExpr(x, s"${d}L")

  /** Column-denominator overload (denominator must be positive). */
  def floorDivExpr(x: String, d: String): String =
    s"((($x) - pmod($x, $d)) div ($d))"

  /** Per-step converted-user frames `(user, __t, __lag_us)` — the
    * shared machinery behind [[funnel]] and [[funnelLagPercentiles]]
    * (one helper so the two gates can never drift on the
    * strictly-after semantics). */
  private def funnelConverted(
      events: DataFrame,
      userCol: String,
      tsCol: String,
      steps: Seq[(String, Column)]): Seq[(String, DataFrame)] = {
    require(steps.nonEmpty, "funnel needs at least one step")
    var converted: DataFrame = null
    steps.map { case (name, pred) =>
      converted =
        if (converted == null)
          events.filter(pred)
            .groupBy(col(userCol))
            .agg(min(col(tsCol)).as("__t"))
            .withColumn("__lag_us", lit(null).cast("long"))
            .transform(Lineage.cutLocal)
        else {
          val prev = converted.select(col(userCol), col("__t").as("__tprev"))
          events.filter(pred)
            .join(prev, userCol)
            .filter(col(tsCol) > col("__tprev"))
            .groupBy(col(userCol))
            .agg(min(col(tsCol)).as("__t"), min(col("__tprev")).as("__tp"))
            .withColumn("__lag_us", col("__t") - col("__tp"))
            .transform(Lineage.cutLocal)
        }
      (name, converted)
    }
  }

  /** Ordered conversion funnel: for each user, step k counts only if an
    * event matching `steps(k)` occurs STRICTLY AFTER the user's step
    * k-1 time (the standard "ordered funnel" semantics — re-orderings
    * don't count). Returns one row per step:
    * `(step, step_name, n_users, avg_lag_sec)` where `avg_lag_sec` is
    * the mean seconds from the previous step's conversion time (NULL
    * for step 1).
    *
    * `tsCol` must be a NUMERIC µs-epoch column (`unix_micros(ts)`), not
    * a raw timestamp: the strictly-after comparison then happens on the
    * same integers in every engine (a nanosecond-precision engine would
    * otherwise order two events that a µs engine sees as simultaneous).
    *
    * Scale shape: one aggregate per step, each a shuffle keyed on
    * `userCol` — after the first step every join/agg is co-partitioned
    * on the user key, so AQE reuses the partitioning; the events scan
    * for step k carries the step predicate down to the source (only
    * matching rows leave the scan). Funnel depth is the number of
    * passes, which is a constant (3-5 in practice), NOT a function of
    * data size. Per-step frames feed two consumers (the step count and
    * the next step's join) — cut locally so the shuffle runs once.
    */
  def funnel(
      events: DataFrame,
      userCol: String,
      tsCol: String,
      steps: Seq[(String, Column)]): DataFrame = {
    val perStep = funnelConverted(events, userCol, tsCol, steps)
      .zipWithIndex.map { case ((name, converted), i) =>
        // integer sum / integer count, divided once in double: the same
        // IEEE operations in the oracle engine, so the rounding agrees
        converted.agg(
          count(lit(1)).as("n_users"),
          round(sum(col("__lag_us")).cast("double") /
            count(col("__lag_us")) / 1e6, 2).as("avg_lag_sec"))
          .select(lit(i + 1).as("step"), lit(name).as("step_name"),
            col("n_users"), col("avg_lag_sec"))
      }
    perStep.reduce(_.unionByName(_)).orderBy("step")
  }

  /** Engine-portable Wilson score bound (Wilson 1927) as a SQL
    * expression string — `p`/`n` are expressions for the observed
    * proportion and trial count, `sign` is `+`/`-` for the upper/lower
    * bound, and `dbl` renders a double literal for the target engine
    * (`x + "d"` for Spark, `x + "::double"` for DuckDB — BOTH parse
    * bare decimal literals as DECIMAL, which would change the
    * arithmetic). sqrt is IEEE-correctly-rounded (not libm-drifting),
    * so the identical expression text yields identical doubles. */
  def wilsonBoundSql(
      p: String, n: String, sign: String, dbl: String => String): String = {
    val z = dbl("1.96")
    val z2 = s"($z * $z)"
    val center = s"(($p) + $z2 / (${dbl("2.0")} * $n))"
    val margin = s"($z * sqrt((($p) * (${dbl("1.0")} - ($p))) / $n" +
      s" + $z2 / (${dbl("4.0")} * $n * $n)))"
    // `+ 0.0` pins the signed zero (Readout.pin's rule, in SQL text):
    // a lower bound whose true value is a tiny negative rounds to
    // -0.0 in DuckDB but +0.0 through Spark's BigDecimal round —
    // hash-distinct. The same text runs on both engines, so the pin
    // lands on both at once.
    s"round(($center $sign $margin) / (${dbl("1.0")} + $z2 / $n), 6)" +
      s" + ${dbl("0.0")}"
  }

  /** Per-transition funnel conversion rates with Wilson 95% intervals
    * — the uncertainty readout [[funnel]]'s raw counts lack: a 10%
    * step-drop on 40 users is noise, on 40k users a finding. One row
    * per transition: `(step, step_name, n_prev, n_conv, rate,
    * wilson_lo, wilson_hi)`; transitions from an empty previous step
    * are dropped (no defined rate).
    *
    * Determinism contract: counts are the [[funnel]] integers; rate
    * and both bounds are ONE fixed-order double expression over them
    * ([[wilsonBoundSql]] — the identical text runs in the oracle), z
    * pinned at 1.96.
    *
    * Scale shape: [[funnel]]'s user-keyed step joins; the Wilson
    * arithmetic runs on the k-row step-count frame. */
  def funnelWilson(
      events: DataFrame,
      userCol: String,
      tsCol: String,
      steps: Seq[(String, Column)]): DataFrame = {
    val counts = funnel(events, userCol, tsCol, steps)
      .select(col("step"), col("step_name"), col("n_users"))
    val prev = counts.select((col("step") + 1).as("step"),
      col("n_users").as("n_prev"))
    val p = "(cast(n_conv as double) / cast(n_prev as double))"
    val n = "(cast(n_prev as double))"
    counts
      .withColumnRenamed("n_users", "n_conv")
      .join(prev, "step")
      .filter(col("n_prev") > 0)
      .select(col("step"), col("step_name"), col("n_prev"), col("n_conv"),
        expr(s"round($p, 6)").as("rate"),
        expr(wilsonBoundSql(p, n, "-", x => x + "d")).as("wilson_lo"),
        expr(wilsonBoundSql(p, n, "+", x => x + "d")).as("wilson_hi"))
      .orderBy("step")
  }

  /** Time-to-convert DISTRIBUTION per funnel transition: exact
    * interpolated percentiles (Spark `percentile` == DuckDB
    * `quantile_cont`) of the per-user step lag in seconds — the tail
    * readout behind "the median converts in minutes, the p90 takes a
    * day" that a mean ([[funnel]]'s avg_lag_sec) hides. One row per
    * transition (steps 2..k): `(step, step_name, n_users, p50_sec,
    * p90_sec)`. Same strictly-after machinery as [[funnel]] via the
    * shared step builder.
    *
    * Scale shape: identical to [[funnel]] (user-keyed step joins);
    * each percentile aggregate is one pass over that step's
    * |converted| rows. */
  def funnelLagPercentiles(
      events: DataFrame,
      userCol: String,
      tsCol: String,
      steps: Seq[(String, Column)]): DataFrame = {
    require(steps.length >= 2, "need at least one transition")
    val perStep = funnelConverted(events, userCol, tsCol, steps)
      .zipWithIndex.drop(1).map { case ((name, converted), i) =>
        converted.agg(
          count(lit(1)).as("n_users"),
          round(percentile(col("__lag_us").cast("double") / 1e6,
            lit(0.5)), 3).as("p50_sec"),
          round(percentile(col("__lag_us").cast("double") / 1e6,
            lit(0.9)), 3).as("p90_sec"))
          .select(lit(i + 1).as("step"), lit(name).as("step_name"),
            col("n_users"), col("p50_sec"), col("p90_sec"))
      }
    perStep.reduce(_.unionByName(_)).orderBy("step")
  }

  /** `(from_type, to_type, n)` consecutive-pair counts per user
    * timeline — THE ordering contract ((ts, id) order, lead window)
    * behind [[transitionMatrix]], [[absorptionPropensity]], and
    * [[markovAttribution]], kept in one place so a tie-break or
    * normalization change can never diverge the three.
    * `includeStart` adds one synthetic `('start' → first event)` pair
    * per user (the attribution chain's entry state). */
  private def journeyPairs(
      events: DataFrame,
      userCol: String,
      tsCol: String,
      typeCol: String,
      idCol: String,
      includeStart: Boolean): DataFrame = {
    val w = Window.partitionBy(userCol).orderBy(tsCol, idCol)
    val seq0 = events
      .select(col(userCol), col(tsCol), col(idCol), col(typeCol))
      .withColumn("__next", lead(typeCol, 1).over(w))
      .withColumn("__rn", row_number().over(w))
    // two consumers when start rows are added — cut so the window
    // shuffle runs once (pruned to one consumer otherwise)
    val s0 = if (includeStart) Lineage.cutLocal(seq0) else seq0
    val body = s0.filter(col("__next").isNotNull)
      .select(col(typeCol).as("from_type"), col("__next").as("to_type"))
    val withStart =
      if (includeStart)
        body.unionByName(s0.filter(col("__rn") === 1)
          .select(lit("start").as("from_type"), col(typeCol).as("to_type")))
      else body
    withStart.groupBy("from_type", "to_type").agg(count(lit(1)).as("n"))
  }

  /** First-order transition matrix: counts of consecutive
    * `(event_type -> next event_type)` pairs within each user's
    * timeline, plus the per-source transition probability. Ties on the
    * timestamp break on `idCol` so the sequence is deterministic.
    * Terminal events (no successor) are dropped.
    *
    * Scale shape: ONE shuffle keyed on the user for the lead() window
    * (partition size = one user's history), then an aggregate on the
    * (from, to) pair — cardinality |types|², with map-side partials.
    * The probability denominator reuses the same aggregate via a
    * window over `from_type` (|types| partitions, trivially bounded).
    */
  def transitionMatrix(
      events: DataFrame,
      userCol: String,
      tsCol: String,
      typeCol: String,
      idCol: String): DataFrame = {
    val pairs = journeyPairs(events, userCol, tsCol, typeCol, idCol,
      includeStart = false)
    val byFrom = Window.partitionBy("from_type")
    pairs
      .withColumn("p",
        round(col("n").cast("double") / sum("n").over(byFrom), 6))
      .orderBy("from_type", "to_type")
  }

  /** Contiguous sequential-pattern support mining — the bounded-length
    * cousin of PrefixSpan (Pei et al. 2001) for event funnels: every
    * CONTIGUOUS run of 2..`maxLen` event types inside a user's
    * timeline is a pattern, reported with its distinct-user support
    * and total occurrence count. Extends [[transitionMatrix]] (k = 2
    * counts) with longer runs and the support dimension marketing
    * funnel mining actually filters on. Patterns are `>`-joined type
    * strings; a type containing the separator would silently merge
    * distinct patterns, so the guard is ENFORCED in the row path
    * (raise_error — it rides the type projection, unprunable). NULL
    * event types stay IN the window and poison every run they touch
    * (`concat` nulls out on any NULL operand, unlike `concat_ws` which
    * skips them): filtering them out before the window would make the
    * events on either side of a dropped event read as contiguous — a
    * run that never happened. A NULL event is a real position in the
    * timeline; it just supports no pattern.
    *
    * Scale shape: ONE shuffle keyed on the user for the lead() window
    * (the transitionMatrix layout, reused for every k), then one
    * aggregate per pattern — cardinality ≤ Σ|types|^k, map-side
    * partials; the distinct-user count shuffles (pattern, user) pairs
    * already deduped map-side. */
  def sequencePatterns(
      events: DataFrame,
      userCol: String,
      tsCol: String,
      typeCol: String,
      idCol: String,
      maxLen: Int = 3,
      minUsers: Long = 1L): DataFrame = {
    require(maxLen >= 2 && maxLen <= 5, "maxLen in [2, 5]")
    val w = Window.partitionBy(col(userCol))
      .orderBy(col(tsCol), col(idCol))
    val safeType = when(col(typeCol).contains(">"),
      raise_error(concat(
        lit("sequencePatterns: event type contains the '>' separator: "),
        col(typeCol)))).otherwise(col(typeCol))
    val leads = events.select(
      (col(userCol).as("__u") +: safeType.as("__t0") +:
        (1 until maxLen).map(i =>
          lead(col(typeCol), i).over(w).as(s"__t$i"))): _*)
    val runs = (2 to maxLen).map { k =>
      val parts = (0 until k).map(i => col(s"__t$i"))
      // concat, NOT concat_ws: a NULL anywhere in the k-tuple (a
      // NULL-type event mid-run, or the run hanging past the end of
      // the timeline) nulls the whole pattern, which the filter drops
      val pat = concat(parts.flatMap(p => Seq(lit(">"), p)).tail: _*)
      leads.select(col("__u"), lit(k).as("k"), pat.as("pattern"))
        .filter(col("pattern").isNotNull)
    }.reduce(_ unionByName _)
    runs
      .groupBy("k", "pattern")
      .agg(countDistinct(col("__u")).as("n_users"),
        count(lit(1)).as("n_occurrences"))
      .filter(col("n_users") >= minUsers)
      .orderBy("k", "pattern")
  }

  /** Robust hour-of-day seasonal profile per series — the MEDIAN-based
    * companion to the mean-based detectors (aq40's z-scores break on
    * one outlier hour; medians don't): hourly counts fold into 24
    * hour-of-day cells per key, each reporting its exact interpolated
    * median and MAD (median absolute deviation). The profile is the
    * robust baseline ops teams alarm against ("Tuesday 3am is
    * normally ~12 events ± 2").
    *
    * Determinism contract: hour indexes are integer floor-divs;
    * medians are exact interpolated percentiles (Spark `percentile`
    * == DuckDB `quantile_cont`, the aq6 precedent); deviations are
    * |integer − half-integer| doubles, exact in IEEE, so the MAD
    * percentile interpolates exact quarters — no rounding needed
    * anywhere.
    *
    * Scale shape: one (key, hour)-keyed count over events, then two
    * percentile aggregates over the |keys|·24-bounded cell frame and
    * one co-keyed join between them — nothing event-sized past the
    * first aggregate. Returns
    * `(key, hod, n_hours, median_n, mad)`. */
  def seasonalProfile(
      events: DataFrame,
      keyCol: String,
      tsCol: String,
      period: Int = 24,
      bucketUs: Long = 3600000000L): DataFrame = {
    require(period >= 2, "period must be at least 2 buckets")
    val hourly = events
      .select(col(keyCol).as("key"),
        expr(floorDivExpr(tsCol, bucketUs)).as("t"))
      .groupBy("key", "t").agg(count(lit(1)).as("n"))
      .withColumn("hod", expr(s"pmod(t, $period)"))
      .transform(Lineage.cutLocal)
    val med = hourly.groupBy("key", "hod")
      .agg(count(lit(1)).as("n_hours"),
        expr("percentile(n, 0.5)").as("median_n"))
    hourly.join(med, Seq("key", "hod"))
      .withColumn("__dev", abs(col("n").cast("double") - col("median_n")))
      .groupBy(col("key"), col("hod"), col("n_hours"), col("median_n"))
      .agg(expr("percentile(__dev, 0.5)").as("mad"))
      .orderBy("key", "hod")
  }

  /** Daily cohort retention: users are cohorted by their first-seen day
    * and each `(cohort_day, day_offset)` cell counts the distinct users
    * of that cohort active `day_offset` days later, with the retention
    * rate against the cohort size. Days are integer µs-epoch day
    * indexes so both engines agree exactly.
    *
    * Scale shape: first-seen and per-day activity are both aggregates
    * keyed on the user (one shuffle, co-partitioned join between them),
    * then a (cohort, offset) aggregate whose cardinality is bounded by
    * span² — calendar cells, not data rows. `countDistinct` inside the
    * cell is exact and shuffles only (cohort, offset, user) triples
    * that were already distinct per day.
    */
  def cohortRetention(
      events: DataFrame,
      userCol: String,
      tsCol: String): DataFrame = {
    // integer floor-div, not double `/` + cast: engine-exact at any epoch
    val day = expr(floorDivExpr(s"unix_micros($tsCol)", 86400000000L))
    val activity = events
      .select(col(userCol), day.as("__day"))
      .distinct()
      .transform(Lineage.cutLocal)
    val cohorts = activity
      .groupBy(col(userCol))
      .agg(min("__day").as("cohort_day"))
    val sizes = cohorts.groupBy("cohort_day")
      .agg(count(lit(1)).as("cohort_users"))
    activity
      .join(cohorts, userCol)
      .groupBy(col("cohort_day"), (col("__day") - col("cohort_day")).as("day_offset"))
      .agg(count(lit(1)).as("n_active"))
      .join(sizes, "cohort_day")
      .select(col("cohort_day"), col("day_offset"), col("n_active"),
        round(col("n_active").cast("double") / col("cohort_users"), 6)
          .as("retention"))
      .orderBy("cohort_day", "day_offset")
  }

  /** Gap-filled hourly series per key: aggregate `valueCol` per
    * (key, hour), then densify each key's series over its own
    * [min, max] hour span and forward-fill the last observed value into
    * the gaps. Output: `(key, hour_us, n, value, filled_value, is_gap)`
    * — `value` is NULL on gap rows, `filled_value` carries the fill.
    *
    * Scale shape: the observation aggregate shuffles on (key, hour)
    * with map-side partials; the grid is `sequence()` + explode off the
    * per-key span aggregate (rows generated scale with calendar span,
    * not event count); the forward fill is a per-key ordered window
    * whose partition is one key's series — bounded by span. Nothing
    * orders globally. For a 100 TB corpus the series-key cardinality
    * (metrics, devices) dwarfs the per-key span, which is exactly the
    * partitioning this plan exploits.
    */
  def gapFillHourly(
      events: DataFrame,
      keyCol: String,
      tsCol: String,
      valueCol: String): DataFrame = {
    val hourUs = unix_micros(date_trunc("hour", col(tsCol)))
    val obs = events
      .groupBy(col(keyCol), hourUs.as("hour_us"))
      .agg(count(lit(1)).as("n"),
        round(sum(col(valueCol).cast("decimal(18,4)")), 2)
          .cast("double").as("value"))
      .transform(Lineage.cutLocal)
    val grid = obs.groupBy(col(keyCol))
      .agg(min("hour_us").as("__mn"), max("hour_us").as("__mx"))
      .select(col(keyCol),
        explode(sequence(col("__mn"), col("__mx"), lit(3600000000L)))
          .as("hour_us"))
    val w = Window.partitionBy(keyCol).orderBy("hour_us")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid
      .join(obs, Seq(keyCol, "hour_us"), "left")
      .select(col(keyCol), col("hour_us"),
        coalesce(col("n"), lit(0L)).as("n"),
        col("value"),
        last("value", ignoreNulls = true).over(w).as("filled_value"),
        col("n").isNull.as("is_gap"))
      .orderBy(keyCol, "hour_us")
  }

  /** Volume-anomaly detection per series: hourly event counts per key,
    * z-scored against that key's own mean/stddev, keeping the hours
    * with `|z| >= zThresh`. The monitoring primitive every ingest
    * pipeline runs over its firehose (spike/outage detection).
    *
    * Exactness: counts are integers, so Σn and Σn² are exact longs; the
    * sample variance `(Σn² - (Σn)²/h) / (h-1)` and the z-score then use
    * the SAME IEEE double expression tree as the SQL twin (division and
    * sqrt are correctly-rounded), and the comparison happens on the
    * 4dp-rounded z both engines agree on. Keys with under two observed
    * hours or zero variance can't be scored and are dropped.
    *
    * Scale shape: the hourly aggregate shuffles once on (key, hour)
    * with map-side partials; the per-key moment aggregate reuses that
    * partitioning collapsed to |keys| rows, which broadcast back onto
    * the hourly frame — no second data-sized shuffle. Output is the
    * anomalous hours only.
    */
  def rateAnomalies(
      events: DataFrame,
      keyCol: String,
      tsCol: String,
      zThresh: Double = 2.0): DataFrame = {
    val hourly = events
      .groupBy(col(keyCol),
        unix_micros(date_trunc("hour", col(tsCol))).as("hour_us"))
      .agg(count(lit(1)).as("n"))
      .transform(Lineage.cutLocal)
    val moments = hourly.groupBy(col(keyCol)).agg(
      count(lit(1)).as("__h"),
      sum("n").as("__s1"),
      sum(col("n") * col("n")).as("__s2"))
    val mean = col("__s1").cast("double") / col("__h")
    val variance =
      (col("__s2").cast("double") - col("__s1").cast("double") * mean) /
        (col("__h") - 1)
    hourly.join(broadcast(moments), Seq(keyCol))
      .filter(col("__h") >= 2 && variance > 0)
      .select(col(keyCol), col("hour_us"), col("n"),
        round(mean, 4).as("mean_n"),
        Readout.pin((col("n").cast("double") - mean) / sqrt(variance), 4).as("z"))
      .filter(abs(col("z")) >= zThresh)
      .orderBy(keyCol, "hour_us")
  }

  /** Exponentially-decayed trailing hourly rate per series (EWMA-style
    * smoothing with a finite horizon): for each (key, hour), the decayed
    * sum Σ_{j=0..horizon-1} n(hour−j)·decay^j over that key's hourly
    * counts. The smoothing primitive behind rate limiting, trend
    * dashboards, and drift monitors — a finite-horizon formulation
    * because an infinite-memory EWMA is a sequential recurrence, which
    * has no scale-out plan; a 12-hour horizon at decay 0.75 carries
    * 96.8% of the infinite sum's weight.
    *
    * Exactness: decay weights are NOT computed with pow() at runtime —
    * libm pow differs across engines in the last ulp for non-dyadic
    * bases. Weights are BigDecimal-exact powers of `decay` rounded to
    * 10dp, embedded as decimal literals on BOTH sides (same pattern as
    * pq5's embedded power table); each term n·w is an exact decimal
    * product, the sum is order-independent decimal addition, and only
    * the final value rounds to 6dp double.
    *
    * Scale shape: one (key, hour) count aggregate with map-side
    * partials; the decayed sum is an equi-join of the hourly frame
    * against `horizon` exploded offsets — a `horizon`× multiplication
    * of the HOURLY frame (bounded by keys × time span, never by input
    * rows), no range join, no per-key window collect. At 100 TB the
    * hourly frame is still tiny; the event scan is the only data-sized
    * pass. */
  def decayedHourlyRate(
      events: DataFrame,
      keyCol: String,
      tsCol: String,
      decay: Double = 0.75,
      horizonHours: Int = 12): DataFrame = {
    require(horizonHours >= 1 && decay > 0 && decay < 1)
    val weights = decayWeights(decay, horizonHours)
    val hourly = events
      .groupBy(col(keyCol),
        unix_micros(date_trunc("hour", col(tsCol))).as("hour_us"))
      .agg(count(lit(1)).as("n"))
      .transform(Lineage.cutLocal)
    val wLit = array(weights.map(w => lit(new java.math.BigDecimal(w))): _*)
    val offsets = hourly
      .select(col(keyCol), col("hour_us"),
        explode(sequence(lit(0), lit(horizonHours - 1))).as("__off"))
      .select(col(keyCol), col("hour_us"), col("__off"),
        (col("hour_us") - col("__off") * lit(3600000000L)).as("__src_hour"),
        element_at(wLit, col("__off") + 1).as("__w"))
    offsets
      .join(hourly.select(col(keyCol), col("hour_us").as("__src_hour"),
        col("n").as("__src_n")), Seq(keyCol, "__src_hour"))
      .groupBy(col(keyCol), col("hour_us"))
      .agg(sum((col("__src_n").cast("decimal(18,0)") * col("__w"))
        .cast("decimal(28,10)")).as("__s"),
        max(when(col("__off") === 0, col("__src_n"))).as("n"))
      .select(col(keyCol), col("hour_us"), col("n"),
        round(col("__s").cast("double"), 6).as("decayed_rate"))
      .orderBy(keyCol, "hour_us")
  }

  /** The 10dp-rounded decay weight table (index = hour offset), shared
    * with the SQL oracle generator so both engines sum identical
    * decimals. */
  def decayWeights(decay: Double, horizon: Int): Seq[String] = {
    val d = new java.math.BigDecimal(decay.toString)
    (0 until horizon).map(k =>
      d.pow(k).setScale(10, java.math.RoundingMode.HALF_UP).toPlainString)
  }

  /** Top-k ordered event-type paths ("user journeys"): each user's
    * first `depth` event types in (ts, id) order joined with `>`, then
    * the most common paths with user counts. The exploratory analytics
    * primitive behind onboarding analysis — where aq28's transition
    * matrix is the Markov view (pairs, memoryless), this is the exact
    * prefix view.
    *
    * Scale shape: one shuffle keyed on the user; each user's events
    * collect inside their group and sort locally (bounded by one user's
    * history — the same invariant sessionize relies on), then slice to
    * `depth` BEFORE the path aggregate, so the path frame is |users|
    * rows of ≤depth strings. The final top-k is a TakeOrdered, never a
    * global sort. Ordering ties break on the event id, so the path is
    * deterministic under µs-identical timestamps. */
  def topPaths(
      events: DataFrame,
      userCol: String,
      tsCol: String,
      typeCol: String,
      idCol: String,
      depth: Int = 3,
      topK: Int = 20): DataFrame = {
    val tsUs = unix_micros(col(tsCol))
    val paths = events
      .select(col(userCol), struct(tsUs.as("t"), col(idCol).as("i"),
        col(typeCol).as("e")).as("__ev"))
      .groupBy(col(userCol))
      .agg(array_join(
        expr(s"transform(slice(array_sort(collect_list(__ev)), 1, $depth)," +
          " x -> x.e)"), ">").as("path"))
    paths.groupBy(col("path"))
      .agg(count(lit(1)).as("n_users"))
      .orderBy(col("n_users").desc, col("path"))
      .limit(topK)
  }

  /** k-step conversion propensity by Markov absorption: from the
    * first-order transition matrix ([[transitionMatrix]]'s counts,
    * row-normalized), the probability of REACHING the conversion state
    * within `k` steps starting from each state — value iteration over
    * the absorbing chain,
    *
    *   p_0(s) = [s = conv],
    *   p_i(s) = [s = conv] + (1 − [s = conv]) · Σ_t T(s,t)·p_{i−1}(t),
    *
    * the state-level "how close is this event to converting" signal
    * behind Markov attribution models. Each T(s,t)·p term rounds to
    * 12dp and sums as DECIMAL; each round's p pins to 12dp — the same
    * trajectory-pinning contract as PageRank, so the whole iteration
    * replays bit-exactly (the oracle unrolls one CTE per step).
    *
    * Scale shape: the chain itself is |types|² rows — the ONLY
    * data-sized work is the one lead() window building the counts;
    * every iteration is a join over the tiny matrix. */
  def absorptionPropensity(
      events: DataFrame,
      userCol: String,
      tsCol: String,
      typeCol: String,
      idCol: String,
      conversionType: String,
      steps: Int): DataFrame = {
    require(steps >= 1, "need at least one step")
    val trans = Lineage.cutLocal(
      transitionMatrix(events, userCol, tsCol, typeCol, idCol)
        .withColumn("t_prob",
          col("n").cast("double") /
            sum(col("n")).over(Window.partitionBy("from_type")))
        .select("from_type", "to_type", "t_prob"))
    val states = Lineage.cutLocal(
      trans.select(col("from_type").as("state"))
        .unionByName(trans.select(col("to_type").as("state")))
        .distinct())
    valueIterate(trans, states, conversionType, steps)
      .select(col("state"), round(col("p"), 6).as("p_convert"))
      .orderBy("state")
  }

  /** `steps` rounds of the 12dp-pinned absorbing value iteration over
    * `trans (from_type, to_type, t_prob)` — shared by
    * [[absorptionPropensity]] and [[markovAttribution]]. Returns
    * `(state, p)` with p pinned to 12dp per round. */
  private def valueIterate(
      trans: DataFrame,
      states: DataFrame,
      conversionType: String,
      steps: Int): DataFrame = {
    var p: DataFrame = states.withColumn("p",
      when(col("state") === conversionType, 1.0).otherwise(0.0))
    for (i <- 1 to steps) {
      val reach = trans
        .join(p.select(col("state").as("to_type"), col("p")), "to_type")
        .groupBy(col("from_type").as("state"))
        .agg(sum(round(col("t_prob") * col("p"), 12)
          .cast("decimal(38,12)")).as("__r"))
      val next = states
        .join(reach, Seq("state"), "left")
        .withColumn("p",
          when(col("state") === conversionType, 1.0)
            .otherwise(round(coalesce(col("__r").cast("double"),
              lit(0.0)), 12)))
        .drop("__r")
      // round fusion (see Lineage.FuseRounds): each step references the
      // previous p exactly once over a |types|²-row matrix — cutting
      // every step bought only a scheduled job per step, times every
      // removal trajectory markovAttribution runs (aq54 measured 75
      // jobs/run pre-fusion, the worst scheduling-sensitivity in the
      // iterative band)
      p = if (i % Lineage.FuseRounds == 0) Lineage.cutLocal(next) else next
    }
    p
  }

  /** Markov removal-effect attribution (Anderl et al. 2014 — the
    * data-driven alternative to last-touch): journeys become an
    * absorbing chain with a synthetic `start` state; each channel's
    * credit is its REMOVAL EFFECT, `1 − p_removed/p_base`, where
    * p_base is the k-step start→conversion propensity and p_removed
    * the same with every transition touching the channel deleted
    * (walks through it die — no renormalization, the standard
    * convention). Shares normalize the effects. Returns
    * `(channel, p_removed, removal_effect, share)`.
    *
    * Same 12dp-pinned value iteration as [[absorptionPropensity]]
    * (shared loop), so base and every removal trajectory replay
    * bit-exactly; the share divides 6dp effects by their exact
    * decimal sum.
    *
    * Scale shape: ONE lead() window over events builds the pairs;
    * everything after — base + |channels| filtered iterations — joins
    * |types|²-row matrices. */
  def markovAttribution(
      events: DataFrame,
      userCol: String,
      tsCol: String,
      typeCol: String,
      idCol: String,
      conversionType: String,
      channels: Seq[String],
      steps: Int): DataFrame = {
    require(channels.nonEmpty, "need at least one channel")
    require(!channels.contains(conversionType) && !channels.contains("start"),
      "channels must not include the conversion or start state")
    val pairs = journeyPairs(events, userCol, tsCol, typeCol, idCol,
      includeStart = true)
    val trans = Lineage.cutLocal(pairs
      .withColumn("t_prob", col("n").cast("double") /
        sum(col("n")).over(Window.partitionBy("from_type")))
      .select("from_type", "to_type", "t_prob"))
    val states = Lineage.cutLocal(
      trans.select(col("from_type").as("state"))
        .unionByName(trans.select(col("to_type").as("state"))).distinct())
    def startP(t: DataFrame): DataFrame =
      valueIterate(t, states, conversionType, steps)
        .filter(col("state") === "start").select(col("p"))
    val base = broadcast(startP(trans).select(col("p").as("__p_base")))
    val removed = channels.map { c =>
      startP(trans.filter(col("from_type") =!= c && col("to_type") =!= c))
        .select(lit(c).as("channel"), col("p").as("p_removed"))
    }.reduce(_.unionByName(_))
    val withEffect = Lineage.cutLocal(removed.crossJoin(base)
      .withColumn("removal_effect",
        round(lit(1.0) - col("p_removed") / col("__p_base"), 6)))
    val total = broadcast(withEffect.agg(
      sum(col("removal_effect").cast("decimal(18,6)")).as("__tot")))
    withEffect.crossJoin(total)
      .select(col("channel"),
        round(col("p_removed"), 6).as("p_removed"),
        col("removal_effect"),
        round(col("removal_effect") / col("__tot").cast("double"), 6)
          .as("share"))
      .orderBy("channel")
  }

  /** GENERATED DuckDB oracle for [[markovAttribution]] — the base and
    * every per-channel removal trajectory unrolled. */
  def markovAttributionOracleSql(
      conversionType: String, channels: Seq[String], steps: Int): String = {
    def chain(prefix: String, transCte: String): String = {
      val sb = new StringBuilder
      sb.append(s""",
${prefix}p0 AS (
  SELECT state, CASE WHEN state = '$conversionType' THEN 1.0::double
       ELSE 0.0::double END AS p
  FROM states
)""")
      for (i <- 1 to steps) sb.append(s""",
${prefix}r$i AS (
  SELECT t.from_type AS state,
         sum(round(t.t_prob * p.p, 12)::decimal(38,12)) AS r
  FROM $transCte t JOIN ${prefix}p${i - 1} p ON t.to_type = p.state
  GROUP BY 1
), ${prefix}p$i AS (
  SELECT s.state, CASE WHEN s.state = '$conversionType' THEN 1.0::double
       ELSE round(coalesce(r.r::double, 0.0::double), 12) END AS p
  FROM states s LEFT JOIN ${prefix}r$i r USING (state)
)""")
      sb.toString
    }
    val removalChains = channels.zipWithIndex.map { case (c, i) =>
      s""",
t$i AS (
  SELECT * FROM trans WHERE from_type != '$c' AND to_type != '$c'
)""" + chain(s"c${i}_", s"t$i")
    }.mkString
    val effRows = channels.zipWithIndex.map { case (c, i) =>
      s"  SELECT '$c' AS channel,\n" +
        s"         (SELECT p FROM c${i}_p$steps WHERE state = 'start')" +
        s" AS p_removed"
    }.mkString("\n  UNION ALL\n")
    s"""WITH seqd AS (
  SELECT user_id, event_type,
         lead(event_type) OVER (PARTITION BY user_id
           ORDER BY epoch_us(ts), event_id) AS nxt,
         row_number() OVER (PARTITION BY user_id
           ORDER BY epoch_us(ts), event_id) AS rn
  FROM events
), pairs AS (
  SELECT from_type, to_type, count(*)::bigint AS n FROM (
    SELECT event_type AS from_type, nxt AS to_type FROM seqd
    WHERE nxt IS NOT NULL
    UNION ALL
    SELECT 'start', event_type FROM seqd WHERE rn = 1)
  GROUP BY 1, 2
), trans AS (
  SELECT from_type, to_type,
         n::double / sum(n) OVER (PARTITION BY from_type) AS t_prob
  FROM pairs
), states AS (
  SELECT DISTINCT state FROM (
    SELECT from_type AS state FROM trans
    UNION ALL SELECT to_type FROM trans)
)""" + chain("b_", "trans") + removalChains + s""",
eff AS (
$effRows
), eff2 AS (
  SELECT channel, p_removed,
         round(1.0::double - p_removed
               / (SELECT p FROM b_p$steps WHERE state = 'start'), 6)
           AS removal_effect
  FROM eff
), tot AS (SELECT sum(removal_effect::decimal(18,6)) AS t FROM eff2)
SELECT channel, round(p_removed, 6) AS p_removed, removal_effect,
       round(removal_effect / (SELECT t FROM tot)::double, 6) AS share
FROM eff2
ORDER BY channel"""
  }

  /** GENERATED DuckDB oracle for [[absorptionPropensity]] over the
    * events table — one CTE per unrolled value-iteration step. */
  def absorptionOracleSql(conversionType: String, steps: Int): String = {
    val rounds = (1 to steps).map { i =>
      s"""|, r$i AS (
          |  SELECT t.from_type AS state,
          |         sum(round(t.t_prob * p.p, 12)::decimal(38,12)) AS r
          |  FROM trans t JOIN p${i - 1} p ON t.to_type = p.state
          |  GROUP BY 1
          |), p$i AS (
          |  SELECT s.state,
          |         CASE WHEN s.state = '$conversionType' THEN 1.0::double
          |              ELSE round(coalesce(r.r::double, 0.0::double), 12)
          |         END AS p
          |  FROM states s LEFT JOIN r$i r USING (state)
          |)""".stripMargin
    }.mkString("\n")
    s"""|WITH seq AS (
        |  SELECT event_type AS from_type,
        |         lead(event_type) OVER (PARTITION BY user_id
        |           ORDER BY epoch_us(ts), event_id) AS to_type
        |  FROM events
        |), pairs AS (
        |  SELECT from_type, to_type, count(*)::bigint AS n FROM seq
        |  WHERE to_type IS NOT NULL GROUP BY 1, 2
        |), trans AS (
        |  SELECT from_type, to_type,
        |         n::double / sum(n) OVER (PARTITION BY from_type) AS t_prob
        |  FROM pairs
        |), states AS (
        |  SELECT DISTINCT state FROM (
        |    SELECT from_type AS state FROM trans
        |    UNION ALL SELECT to_type FROM trans)
        |), p0 AS (
        |  SELECT state,
        |         CASE WHEN state = '$conversionType' THEN 1.0::double
        |              ELSE 0.0::double END AS p
        |  FROM states
        |)
        |$rounds
        |SELECT state, round(p, 6) AS p_convert
        |FROM p$steps
        |ORDER BY state""".stripMargin
  }

  /** Cohort lifetime value: revenue per `(cohort day, day offset)`
    * cell with the running cumulative and per-user LTV — the revenue
    * companion to [[cohortRetention]] (retention says who came back,
    * LTV says what they were worth by day N). Revenue sums are exact
    * DECIMAL, the cumulative is a DECIMAL window sum (order-exact),
    * and the per-user LTV is INTEGER floor arithmetic — cents·100
    * div cohort size, rendered at 4dp — because `round(cum/n, 4)` on
    * a double lands on exact .00005 boundaries (any 2dp total divided
    * by an even cohort) where engines' rounding modes diverge;
    * truncation has no boundary. Every figure engine-exact.
    *
    * `tsCol` must be a NUMERIC µs-epoch column.
    *
    * Scale shape: one user-keyed cohort aggregate, one
    * (cohort, offset) revenue aggregate riding a broadcast-friendly
    * cohort join, and a cumulative window bounded by one cohort's
    * offsets. */
  def cohortLtv(
      events: DataFrame,
      userCol: String,
      tsCol: String,
      typeCol: String,
      valueCol: String,
      conversionType: String): DataFrame = {
    val ev = Lineage.cutLocal(events.select(col(userCol).as("__u"),
      expr(floorDivExpr(tsCol, 86400000000L)).as("day_idx"),
      col(typeCol).as("__t"), col(valueCol).as("__v")))
    val cohort = Lineage.cutLocal(
      ev.groupBy("__u").agg(min("day_idx").as("c")))
    val sizes = cohort.groupBy("c").agg(count(lit(1)).as("n_users"))
    val rev = ev.filter(col("__t") === conversionType)
      .join(cohort, "__u")
      .groupBy(col("c"), (col("day_idx") - col("c")).as("offset"))
      .agg(sum(col("__v").cast("decimal(18,4)")).as("__rev"))
    val w = Window.partitionBy("c").orderBy("offset")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    rev
      .withColumn("__cum", sum(col("__rev")).over(w))
      .join(sizes, "c")
      .withColumn("__cents", (round(col("__cum"), 2) * 100).cast("long"))
      .select(col("c").as("cohort_day"), col("offset"), col("n_users"),
        round(col("__rev"), 2).cast("double").as("revenue"),
        round(col("__cum"), 2).cast("double").as("cum_revenue"),
        (expr(floorDivExpr("__cents * 100", "n_users")) / lit(10000.0))
          .as("ltv_per_user"))
      .orderBy("cohort_day", "offset")
  }

  /** Sliding-window active users (DAU / WAU): per observed day, the
    * distinct users active that day and within the trailing
    * `windowDays` window — the standard engagement pair, computed
    * WITHOUT a per-day distinct-union loop: the distinct `(day, user)`
    * pair set explodes each pair forward into every window it serves
    * (windowDays×, bounded), and one distinct-count per target day
    * finishes it. Output keeps only days that actually occur.
    *
    * `tsCol` must be a NUMERIC µs-epoch column.
    *
    * Scale shape: the pair distinct is one shuffle on (day, user); the
    * explode is a constant windowDays-fold of the PAIR frame (already
    * deduplicated — far smaller than raw events); the count-distinct
    * per day shuffles pairs once more. No global windows. */
  def activeUsers(
      events: DataFrame,
      userCol: String,
      tsCol: String,
      windowDays: Int = 7): DataFrame = {
    require(windowDays >= 1, "windowDays must be positive")
    val pairs = Lineage.cutLocal(events
      .select(expr(floorDivExpr(tsCol, 86400000000L)).as("day_idx"),
        col(userCol).as("__u"))
      .distinct())
    val wau = pairs
      .select(explode(sequence(col("day_idx"),
        col("day_idx") + lit(windowDays - 1))).as("day_idx"), col("__u"))
      .groupBy("day_idx")
      .agg(countDistinct(col("__u")).as("wau"))
    val dau = pairs.groupBy("day_idx").agg(count(lit(1)).as("dau"))
    // the inner join with dau keeps exactly the observed days — the
    // explode's phantom future days have no dau row and drop here
    dau.join(wau, "day_idx")
      .select("day_idx", "dau", "wau")
      .orderBy("day_idx")
  }

  /** CUSUM changepoint detection over per-series hourly rates — the
    * classic sequential drift detector (Page 1954), run here as the
    * pipeline-monitoring alarm "did this event stream's rate shift?".
    * For each series the hourly counts `x_t` (gap hours count 0, on
    * the series' own min..max hour grid) feed the one-sided CUSUM
    *
    *   S_t = max(0, S_{t-1} + (x_t − mean − slack)),  alarm: S_t > h.
    *
    * Everything runs in INTEGER units scaled by the series length `T`
    * (`d_t = T·x_t − total − T·slack`), so the whole trajectory is
    * exact in any engine — no floating-point state. The recursion is
    * evaluated by the prefix-sum identity
    *
    *   S_t = P_t − min(0, min_{j≤t} P_j),   P_t = Σ_{i≤t} d_i,
    *
    * i.e. a window prefix sum plus a running min — pure relational
    * operators, NO sequential fold, so each series' trajectory
    * computes inside one window partition (bounded by that series'
    * hour span) and the plan scales like any other windowed query.
    *
    * Returns one row per series:
    * `(series, n_hours, total, n_alarms, first_alarm_hour, max_stat)`
    * — `max_stat` is the peak S_t in T-scaled units (divide by
    * `n_hours` for count units); `first_alarm_hour` is the µs-epoch
    * hour of the first alarm, NULL when none fire.
    *
    * Scale shape: one (series, hour) aggregate, a sequence() grid that
    * scales with the SPAN not the row count, one series-keyed window,
    * and a |series|-ary final aggregate. */
  def cusumChangepoints(
      events: DataFrame,
      keyCol: String,
      tsCol: String,
      slackCounts: Long,
      thresholdCounts: Long): DataFrame = {
    val hourUs = unix_micros(date_trunc("hour", col(tsCol)))
    val obs = Lineage.cutLocal(events
      .groupBy(col(keyCol), hourUs.as("hour_us"))
      .agg(count(lit(1)).as("x")))
    val grid = obs.groupBy(col(keyCol))
      .agg(min("hour_us").as("__mn"), max("hour_us").as("__mx"),
        sum("x").as("__total"),
        (((max("hour_us") - min("hour_us")) / lit(3600000000L)) + 1)
          .cast("long").as("__t"))
      .select(col(keyCol), col("__total"), col("__t"),
        explode(sequence(col("__mn"), col("__mx"), lit(3600000000L)))
          .as("hour_us"))
    val wRun = Window.partitionBy(keyCol).orderBy("hour_us")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val series = grid
      .join(obs, Seq(keyCol, "hour_us"), "left")
      .withColumn("__x", coalesce(col("x"), lit(0L)))
      .withColumn("__d",
        col("__t") * col("__x") - col("__total") -
          col("__t") * lit(slackCounts))
      .withColumn("__p", sum(col("__d")).over(wRun))
      .withColumn("__s",
        col("__p") - least(lit(0L), min(col("__p")).over(wRun)))
      .withColumn("__alarm", col("__s") > col("__t") * lit(thresholdCounts))
    series
      .groupBy(col(keyCol).as("series"))
      .agg(
        count(lit(1)).as("n_hours"),
        first(col("__total")).as("total"),
        sum(when(col("__alarm"), 1L).otherwise(0L)).as("n_alarms"),
        min(when(col("__alarm"), col("hour_us"))).as("first_alarm_hour"),
        max(col("__s")).as("max_stat"))
      .orderBy("series")
  }

  /** Dwell-time analysis: the time between consecutive events in a
    * user's timeline, attributed to the EARLIER event's type — "how
    * long do users sit on each step" (screen-time / stage-latency
    * analytics; the duration complement of [[transitionMatrix]]'s
    * counts). Terminal events (no successor) contribute no interval.
    * Returns one row per type:
    * `(event_type, n_intervals, total_dwell_sec, avg_dwell_sec)` —
    * integer-µs sums divided once in double, so engines agree exactly.
    *
    * Scale shape: ONE shuffle keyed on the user for the lead() window
    * (partition = one user's history), then a |types|-ary aggregate
    * with map-side partials. */
  def dwellTime(
      events: DataFrame,
      userCol: String,
      tsCol: String,
      typeCol: String,
      idCol: String): DataFrame = {
    val w = Window.partitionBy(userCol).orderBy(tsCol, idCol)
    events
      .select(col(userCol), col(tsCol), col(idCol), col(typeCol))
      .withColumn("__next_ts", lead(tsCol, 1).over(w))
      .filter(col("__next_ts").isNotNull)
      .withColumn("__dwell_us", col("__next_ts") - col(tsCol))
      .groupBy(col(typeCol).as("event_type"))
      .agg(
        count(lit(1)).as("n_intervals"),
        round(sum(col("__dwell_us")).cast("double") / 1e6, 2)
          .as("total_dwell_sec"),
        round(sum(col("__dwell_us")).cast("double") /
          count(lit(1)) / 1e6, 2).as("avg_dwell_sec"))
      .orderBy("event_type")
  }

  /** Last-touch conversion attribution: each conversion event credits
    * the user's most recent PRECEDING touch event (strictly earlier in
    * `(ts, id)` order — simultaneous-µs ties break on the id, same
    * determinism contract as [[transitionMatrix]]) within `lookbackUs`;
    * conversions with no touch in the window land in the
    * `'unattributed'` bucket. Returns one row per channel:
    * `(channel, n_conversions, revenue, avg_lag_sec)` — revenue is a
    * DECIMAL(18,4) sum (order-independent) rendered as a rounded
    * double, the lag mean an integer-µs sum divided once in double, so
    * any engine replaying the same rows agrees exactly.
    *
    * `tsCol` must be a NUMERIC µs-epoch column (`unix_micros(ts)`).
    *
    * Scale shape: ONE shuffle, keyed on the user, for the
    * carry-last-touch window (partition = one user's history; the
    * struct carries ts+type in a single `last(ignoreNulls)` pass so the
    * two fields can never disagree about which row they came from);
    * the channel aggregate is |channels|-ary with map-side partials.
    * Nothing materializes per-event output — the frame collapses to
    * conversions at the filter, then to channels at the aggregate. */
  def lastTouchAttribution(
      events: DataFrame,
      userCol: String,
      tsCol: String,
      idCol: String,
      typeCol: String,
      valueCol: String,
      conversionType: String,
      touchTypes: Seq[String],
      lookbackUs: Long): DataFrame = {
    require(touchTypes.nonEmpty, "need at least one touch type")
    val w = Window.partitionBy(userCol).orderBy(tsCol, idCol)
      .rowsBetween(Window.unboundedPreceding, -1)
    val isTouch = col(typeCol).isInCollection(touchTypes)
    val attributed = col("__t").isNotNull &&
      col("__t.ts") >= col(tsCol) - lit(lookbackUs)
    events
      .select(col(userCol), col(tsCol), col(idCol), col(typeCol),
        col(valueCol))
      .withColumn("__t",
        last(when(isTouch,
          struct(col(tsCol).as("ts"), col(typeCol).as("tp"))),
          ignoreNulls = true).over(w))
      .filter(col(typeCol) === conversionType)
      .withColumn("channel",
        when(attributed, col("__t.tp")).otherwise(lit("unattributed")))
      .withColumn("__lag_us",
        when(attributed, col(tsCol) - col("__t.ts")))
      .groupBy("channel")
      .agg(
        count(lit(1)).as("n_conversions"),
        round(sum(col(valueCol).cast("decimal(18,4)")), 2)
          .cast("double").as("revenue"),
        round(sum(col("__lag_us")).cast("double") /
          count(col("__lag_us")) / 1e6, 2).as("avg_lag_sec"))
      .orderBy("channel")
  }

  /** RFM segmentation — the classic customer-value triage: per
    * purchasing user, Recency (days since last purchase, against the
    * corpus' max event day), Frequency (purchase count), Monetary
    * (decimal revenue), each scored into `nBuckets` quantile buckets
    * (1 = worst, nBuckets = best) plus the combined `rfm` code.
    *
    * Determinism contract: bucket boundaries are INTEGER-derived —
    * `1 + ((rank−1)·nBuckets) div (n−1)` capped at nBuckets, with a
    * unique (metric, user) rank order — the aq20 percent-rank trick, so
    * every engine draws identical cuts (no ntile, whose remainder
    * distribution is engine-defined; n = 1 pins bucket 1).
    *
    * Scale shape: one user-keyed aggregate over purchases (map-side
    * partial), a broadcast 1-row max-day, then three
    * [[Packing.globalRankBy]] passes over the lineage-cut |users|
    * frame — distributed range-partition prefix-sum ranks, NO
    * single-partition sort anywhere (the aq39 discipline; the previous
    * formulation's three no-partition `rank()` windows serialized the
    * whole purchaser frame through one task each). Nothing event-sized
    * past the first aggregate. */
  def rfmSegments(
      events: DataFrame,
      userCol: String,
      tsCol: String,
      typeCol: String,
      valueCol: String,
      purchaseType: String,
      nBuckets: Int = 5): DataFrame = {
    require(nBuckets >= 1, "nBuckets must be positive")
    val day = floorDivExpr(tsCol, 86400000000L)
    val refRow = events.select(expr(day).as("__d")).agg(max("__d")).first()
    require(!refRow.isNullAt(0),
      "rfmSegments: events frame is empty (no reference day)")
    val refDay = refRow.getLong(0)
    // rank-kernel width from the PRE-cut events frame (an upper bound
    // on the per-user aggregate; post-cut LogicalRDD stats are
    // unknown): the session width over a provably-small frame is
    // hundreds of near-empty tasks across the three rank passes
    // (aq56 measured 244 tasks for 0.2 MB of total shuffle); the
    // clamp keeps the session width at scale
    val parts = Some(Lineage.iterPartitions(events))
    val perUser = events.filter(col(typeCol) === purchaseType)
      .groupBy(col(userCol).as("user_id"))
      .agg((lit(refDay) - max(expr(day))).as("recency_days"),
        count(lit(1)).as("frequency"),
        sum(col(valueCol).cast("decimal(18,4)")).as("__mon"))
      .transform(Lineage.cutLocal)
    val n = perUser.count()
    // NULLS LAST explicitly on every order: Spark defaults ASC to
    // nulls-FIRST while DuckDB defaults to nulls-LAST, so an all-NULL
    // monetary user would otherwise shift every m bucket between
    // engine and oracle. user_id — a groupBy key of perUser, unique BY
    // CONSTRUCTION — rides every order, satisfying globalRankBy's
    // uniqueness precondition without needing the debug assertion
    // (passed anyway for `spark.graft.rank.assertUnique` runs).
    def rk(metric: String, order: Column, name: String): DataFrame =
      Packing.globalRankBy(perUser.select(col("user_id"), col(metric)),
        Seq(order, col("user_id")), name,
        numParts = parts, uniqueCols = Seq(col("user_id")))
        .select("user_id", name)
    val ranked = perUser
      .join(rk("recency_days", col("recency_days").desc_nulls_last,
        "__rk_r"), "user_id")
      .join(rk("frequency", col("frequency").asc_nulls_last,
        "__rk_f"), "user_id")
      .join(rk("__mon", col("__mon").asc_nulls_last, "__rk_m"), "user_id")
    def bucket(rkCol: String): Column =
      if (n == 1) lit(1L)
      else least(lit(nBuckets.toLong),
        lit(1L) + expr(floorDivExpr(
          s"($rkCol - 1) * $nBuckets", s"${n}L - 1L")))
    ranked.select(col("user_id"), col("recency_days"), col("frequency"),
        round(col("__mon"), 2).cast("double").as("monetary"),
        bucket("__rk_r").as("r"),
        bucket("__rk_f").as("f"),
        bucket("__rk_m").as("m"))
      .withColumn("rfm", col("r") * 100 + col("f") * 10 + col("m"))
      .orderBy("user_id")
  }

  /** Shapley-value attribution (Shapley 1953, applied to channels as in
    * Zhao et al. 2018) — the coalition-game alternative to last-touch
    * (aq45) and Markov removal effects (aq54): each user's journey
    * contributes its conversions to the characteristic value of the
    * channel SET it touched, `v(S) = Σ_{T ⊆ S} conv(T)`, and channel i
    * earns the exact Shapley value
    *
    *   k!·φᵢ = Σ_{S ⊆ C∖{i}} |S|!·(k−|S|−1)!·(v(S∪{i}) − v(S)),
    *
    * a fair division with φ summing to `v(C) − v(∅)` (untouched
    * conversions stay unattributed). Output per channel:
    * `(channel, phi_scaled, credit)` where `phi_scaled = k!·φᵢ` is an
    * exact INTEGER (conversion counts times factorial weights — no
    * float in the game) and `credit = round(phi_scaled / k!, 6)` is one
    * integer division in double, identical in any engine.
    *
    * Scale shape: ONE user-keyed aggregate over events (map-side
    * partial) then a ≤2^k-row group aggregate; the Shapley sum runs on
    * the driver over that bounded table (like the count-min readout) —
    * `require(k ≤ 12)` keeps the lattice at ≤4096 rows by contract. */
  def shapleyAttribution(
      events: DataFrame,
      userCol: String,
      typeCol: String,
      conversionType: String,
      channels: Seq[String]): DataFrame = {
    require(channels.nonEmpty && channels.size <= 12,
      "1..12 channels (the subset lattice is 2^k)")
    require(channels.distinct.size == channels.size, "duplicate channel")
    require((conversionType +: channels).forall(c =>
      !c.contains("'") && !c.contains(",")),
      "channel/conversion names must not contain ' or , (the touched " +
        "set is a comma-joined string and the oracle renders names as " +
        "SQL literals)")
    val spark = events.sparkSession
    val sorted = channels.sorted
    val touched = concat_ws(",", sort_array(collect_set(
      when(col(typeCol).isin(channels: _*), col(typeCol)))))
    val convBySet = events
      .groupBy(col(userCol))
      .agg(touched.as("__set"),
        sum(when(col(typeCol) === conversionType, 1L).otherwise(0L))
          .as("__conv"))
      .groupBy("__set").agg(sum("__conv").as("__conv"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val k = sorted.size
    // conv(T) keyed by bitmask over the sorted channel list
    val convByMask = convBySet.map { case (s, c) =>
      val mask = s.split(",").filter(_.nonEmpty)
        .map(t => 1 << sorted.indexOf(t)).sum
      mask -> c
    }
    // v(S) = Σ_{T ⊆ S} conv(T) for EVERY mask at once via the
    // sum-over-subsets DP (k·2^k) — the naive per-lookup lattice scan
    // was k·4^k map scans at the driver (~10^8 entry checks at the
    // contractual k = 12)
    val vArr = Array.ofDim[Long](1 << k)
    convByMask.foreach { case (m, c) => vArr(m) += c }
    for (i <- 0 until k; m <- 0 until (1 << k))
      if ((m & (1 << i)) != 0) vArr(m) += vArr(m ^ (1 << i))
    def v(mask: Int): Long = vArr(mask)
    val fact = (0 to k).map(i => (1 to i).foldLeft(1L)(_ * _))
    val rows = sorted.zipWithIndex.map { case (ch, i) =>
      val bit = 1 << i
      var phiScaled = 0L
      var s = 0
      while (s < (1 << k)) {
        if ((s & bit) == 0) {
          val size = Integer.bitCount(s)
          phiScaled += fact(size) * fact(k - size - 1) * (v(s | bit) - v(s))
        }
        s += 1
      }
      (ch, phiScaled,
        BigDecimal(phiScaled).bigDecimal
          .divide(java.math.BigDecimal.valueOf(fact(k)),
            6, java.math.RoundingMode.HALF_UP).doubleValue())
    }
    import spark.implicits._
    rows.toDF("channel", "phi_scaled", "credit").orderBy("channel")
  }

  /** GENERATED DuckDB oracle for [[shapleyAttribution]]: the subset
    * lattice unrolled — one value per subset, the exact integer
    * factorial-weighted sum per channel, and the same single decimal
    * division for the credit. */
  def shapleyOracleSql(
      conversionType: String, channels: Seq[String]): String = {
    require((conversionType +: channels).forall(c =>
      !c.contains("'") && !c.contains(",")),
      "channel/conversion names must not contain ' or , (rendered as " +
        "SQL literals and comma-joined set strings)")
    val sorted = channels.sorted
    val k = sorted.size
    val fact = (0 to k).map(i => (1 to i).foldLeft(1L)(_ * _))
    def setStr(mask: Int): String =
      sorted.zipWithIndex.filter { case (_, i) => (mask & (1 << i)) != 0 }
        .map(_._1).mkString(",")
    // v(S): sum of conv over observed sets T ⊆ S — expressed as an IN
    // list of the subset's own sub-lattice strings
    def vExpr(mask: Int): String = {
      val subs = (0 to mask).filter(t => (t & ~mask) == 0)
        .map(t => s"'${setStr(t)}'").distinct.mkString(", ")
      s"(SELECT coalesce(sum(c), 0) FROM sets WHERE t IN ($subs))"
    }
    val vCtes = (0 until (1 << k)).map(m => s"v$m AS (SELECT ${vExpr(m)} AS v)")
    val chRows = sorted.zipWithIndex.map { case (ch, i) =>
      val bit = 1 << i
      val terms = (0 until (1 << k)).filter(s => (s & bit) == 0).map { s =>
        val w = fact(Integer.bitCount(s)) * fact(k - Integer.bitCount(s) - 1)
        s"$w * ((SELECT v FROM v${s | bit}) - (SELECT v FROM v$s))"
      }.mkString(" + ")
      s"SELECT '$ch' AS channel, ($terms)::bigint AS phi_scaled"
    }.mkString("\nUNION ALL\n")
    s"""WITH per_user AS (
       |  SELECT user_id,
       |    coalesce(string_agg(DISTINCT event_type, ',' ORDER BY event_type)
       |      FILTER (WHERE event_type IN (${sorted.map(c => s"'$c'").mkString(", ")})), '') AS t,
       |    sum(CASE WHEN event_type = '$conversionType' THEN 1 ELSE 0 END)::bigint AS conv
       |  FROM events GROUP BY user_id
       |), sets AS (
       |  SELECT t, sum(conv)::bigint AS c FROM per_user GROUP BY 1
       |), ${vCtes.mkString(",\n")},
       |phi AS (
       |$chRows
       |)
       |SELECT channel, phi_scaled,
       |       round(phi_scaled / ${fact(k)}.0, 6) AS credit
       |FROM phi
       |ORDER BY channel""".stripMargin
  }

  /** Kaplan–Meier time-to-event survival (Kaplan & Meier 1958) — the
    * censoring-aware answer to "how long until a user converts":
    * per user, the clock starts at their FIRST event day; the "death"
    * is their first day matching `eventPred` (e.g. first purchase);
    * users who never match are CENSORED at their last observed day —
    * they shrink the risk set without counting as conversions, the
    * property naive conversion curves get wrong. Output is one row per
    * conversion duration `t` (days since first activity): conversions
    * `d`, at-risk `n` (users observed ≥ t days), and
    * `survival` = Π_{tᵢ≤t} (1 − dᵢ/nᵢ) — the probability of remaining
    * unconverted past `t`.
    *
    * Determinism contract: the product folds left-to-right with the
    * running value RE-ROUNDED to 6dp each step. Every step's input is
    * then a 6dp-grid double times an exact IEEE ratio — bit-identical
    * in any engine — so the whole curve replays exactly (a DuckDB
    * recursive CTE is the oracle twin; `exp(sum(ln))` formulations are
    * NOT portable, ulp drift in libm crosses rounding boundaries).
    *
    * Scale shape: one user-keyed aggregate over events (map-side
    * partial), then everything is |durations|-sized: the at-risk counts
    * are a cumulative sum over per-duration exit counts (no
    * |durations|×|users| join), and the fold runs over one collected
    * |durations|-bounded array inside an `aggregate` HOF — no driver
    * loop, no UDF. */
  def kaplanMeier(
      events: DataFrame,
      userCol: String,
      tsCol: String,
      eventPred: Column): DataFrame = {
    val day = floorDivExpr(tsCol, 86400000000L)
    val perUser = events
      .groupBy(col(userCol))
      .agg(min(expr(day)).as("__birth"),
        max(expr(day)).as("__last"),
        min(when(eventPred, expr(day))).as("__ev"))
      .select(
        (coalesce(col("__ev"), col("__last")) - col("__birth")).as("t"),
        col("__ev").isNotNull.as("__death"))
    // per-duration exit counts; cumulative from the longest duration
    // down gives the at-risk count without a durations×users join
    val perDur = perUser.groupBy("t")
      .agg(count(lit(1)).as("__ended"),
        sum(when(col("__death"), 1L).otherwise(0L)).as("d"))
    val wRisk = Window.orderBy(col("t").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val steps = perDur
      .withColumn("n", sum(col("__ended")).over(wRisk))
      .filter(col("d") > 0)
      .select("t", "d", "n")
    // fold to the survival curve: ordered (t,d,n) steps accumulate
    // s' = round(s · (1 − d/n), 6) through one |days|-bounded array
    steps
      .agg(sort_array(collect_list(struct(col("t"), col("d"), col("n"))))
        .as("__steps"))
      .select(explode(expr(
        """aggregate(
          |  __steps,
          |  cast(array() as array<struct<t:bigint,d:bigint,n:bigint,survival:double>>),
          |  (acc, x) -> array_append(acc, named_struct(
          |    't', x.t, 'd', x.d, 'n', x.n,
          |    'survival',
          |    round(coalesce(try_element_at(acc, -1).survival, 1.0d)
          |          * (1.0d - cast(x.d as double) / cast(x.n as double)), 6)))
          |)""".stripMargin)).as("__r"))
      .select(col("__r.t").as("t"), col("__r.d").as("d"),
        col("__r.n").as("n"), col("__r.survival").as("survival"))
      .orderBy("t")
  }

  /** Log-rank test (Mantel 1966) — the significance companion to
    * [[kaplanMeier]]: two cohorts' whole SURVIVAL CURVES compared,
    * censoring handled exactly (a difference-in-conversion-rates
    * readout silently drops the censored users; the log-rank counts
    * them at risk until they leave):
    *
    *   O₁ = Σ_t d₁t,   E₁ = Σ_t dt·n₁t/nt,
    *   V = Σ_t dt·(n₁t/nt)·(n₂t/nt)·(nt−dt)/(nt−1),
    *   χ² = (O₁ − E₁)²/V   (~χ²₁ under H₀).
    *
    * `armOf` assigns the cohort from the USER key (evaluated after
    * the per-user collapse, so membership is stable by construction).
    *
    * Determinism contract: per-user durations/deaths and all
    * at-risk/event counts are exact integers (the kaplanMeier
    * machinery, cohort-split); each E/V term is a fixed-order double
    * rounded (8/10dp) into a DECIMAL sum over the event-time grid
    * (time order differs between engines); χ² pins once. NULL when
    * V = 0 (no comparable event times).
    *
    * Scale shape: one per-user aggregate, one per-duration aggregate,
    * the KM descending cumulative window over the DAYS-bounded
    * duration grid, a 1-row readout. Returns ONE row
    * `(n_times, o1, e1, chi2)`. */
  def logRank(
      events: DataFrame,
      userCol: String,
      tsCol: String,
      eventPred: Column,
      armOf: Column): DataFrame = {
    val day = floorDivExpr(tsCol, 86400000000L)
    val perUser = events
      .groupBy(col(userCol))
      .agg(min(expr(day)).as("__birth"),
        max(expr(day)).as("__last"),
        min(when(eventPred, expr(day))).as("__ev"))
      .select(armOf.as("__a"),
        (coalesce(col("__ev"), col("__last")) - col("__birth")).as("t"),
        col("__ev").isNotNull.as("__death"))
    val perDur = perUser.groupBy("t").agg(
      sum(when(col("__a"), 1L).otherwise(0L)).as("__e1"),
      sum(when(!col("__a"), 1L).otherwise(0L)).as("__e2"),
      sum(when(col("__a") && col("__death"), 1L).otherwise(0L)).as("d1"),
      sum(when(!col("__a") && col("__death"), 1L).otherwise(0L)).as("d2"))
    val wRisk = Window.orderBy(col("t").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val st = perDur
      .withColumn("n1", sum(col("__e1")).over(wRisk))
      .withColumn("n2", sum(col("__e2")).over(wRisk))
      .filter(col("d1") + col("d2") > 0L)
      .select(col("d1"), col("d2"), col("n1"), col("n2"),
        (col("n1") + col("n2")).as("nt"),
        (col("d1") + col("d2")).as("dt"))
    def d(c: Column) = c.cast("double")
    val e1t = d(col("dt")) * d(col("n1")) / d(col("nt"))
    val vt = d(col("dt")) * (d(col("n1")) / d(col("nt"))) *
      (d(col("n2")) / d(col("nt"))) *
      (d(col("nt")) - d(col("dt"))) / (d(col("nt")) - 1.0)
    val agg = st.agg(
      count(lit(1)).as("n_times"), sum(col("d1")).as("o1"),
      sum(round(e1t, 8).cast("decimal(28,8)")).as("__e1s"),
      sum(when(col("nt") > 1L, round(vt, 10).cast("decimal(28,10)"))
        .otherwise(lit(0).cast("decimal(28,10)"))).as("__vs"))
    agg.select(col("n_times"), col("o1"),
      Readout.pin(col("__e1s").cast("double"), 6).as("e1"),
      when(col("__vs").cast("double") > 0.0,
        Readout.pin((col("o1").cast("double") -
          col("__e1s").cast("double")) *
          (col("o1").cast("double") - col("__e1s").cast("double")) /
          col("__vs").cast("double"), 6)).as("chi2"))
  }

}
