package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Experimentation statistics — the A/B-test readout every
  * product/ops event pipeline ends in: per metric group, compare the
  * two assignment arms with Welch's unequal-variance z statistic
  *
  *   z = (m_A − m_B) / sqrt(s²_A/n_A + s²_B/n_B).
  *
  * Numeric contract: per-arm Σv is an exact DECIMAL(18,4) sum and Σv²
  * an exact DECIMAL sum of 8dp-rounded squares, so every downstream
  * double expression (means, sample variances, z) computes from
  * bit-identical inputs with a fixed operation order — any engine
  * replaying the same rows produces the same rounded statistics.
  * (The z is reported without the Welch–Satterthwaite dof — at event
  * counts the normal approximation is the operative readout.)
  */
object Stats {

  /** Tukey-fence outlier report per group: quartiles, the classic
    * `1.5·IQR` fences, and how many observations fall outside them —
    * the box-plot screening rule every metrics pipeline runs before
    * trusting a mean. Returns
    * `(group..., n, q1, q3, n_outliers, outlier_rate)`.
    *
    * Determinism contract: quartiles are exact interpolated
    * percentiles (Spark `percentile` == DuckDB `quantile_cont`); the
    * fences are fixed-order double expressions of them, and every
    * comparison runs on raw doubles — identical in any engine. NULL
    * values count in neither n nor the outliers.
    *
    * Scale shape: one percentile aggregate over the group keys, the
    * |groups|-row quartile frame broadcast back, one counting
    * aggregate — two passes, no data-sized shuffle beyond them. */
  def tukeyOutliers(
      df: DataFrame,
      metricCol: String,
      groupCols: Seq[String]): DataFrame = {
    require(groupCols.nonEmpty, "need at least one group column")
    val v = col(metricCol)
    val stats = broadcast(df.filter(v.isNotNull)
      .groupBy(groupCols.map(col): _*)
      .agg(percentile(v, lit(0.25)).as("__q1"),
        percentile(v, lit(0.75)).as("__q3")))
    val iqr = col("__q3") - col("__q1")
    val lo = col("__q1") - lit(1.5) * iqr
    val hi = col("__q3") + lit(1.5) * iqr
    df.filter(v.isNotNull)
      .join(stats, groupCols)
      .groupBy(groupCols.map(col): _*)
      .agg(
        count(lit(1)).as("n"),
        Readout.pin(first(col("__q1")), 4).as("q1"),
        Readout.pin(first(col("__q3")), 4).as("q3"),
        count(when(v < lo || v > hi, 1)).as("n_outliers"))
      .withColumn("outlier_rate",
        round(col("n_outliers").cast("double") / col("n"), 6))
      .orderBy(groupCols.map(col): _*)
  }

  /** One row per group:
    * `(group..., n_a, n_b, mean_a, mean_b, welch_z)` — `armA` selects
    * arm A rows, everything else is arm B; NULL metric values count in
    * neither arm (n, Σv, and Σv² all skip them, so they can never
    * skew a mean). Groups where either arm has fewer than 2
    * observations, or where both arms are constant (the
    * decimal-rounded Σv² can put the computed variance a hair below
    * zero — sqrt of that is NaN here and a hard error in some SQL
    * engines), yield NULL z.
    *
    * Scale shape: ONE conditional aggregate over the group keys with
    * map-side partials — no pivot, no second pass, no join. */
  def abTest(
      df: DataFrame,
      metricCol: String,
      armA: Column,
      groupCols: Seq[String]): DataFrame = {
    require(groupCols.nonEmpty, "need at least one group column")
    val v = col(metricCol)
    val dec = v.cast("decimal(18,4)")
    val sq = round(v * v, 8).cast("decimal(28,8)")
    val agg = df.groupBy(groupCols.map(col): _*)
      .agg(
        count(when(armA, v)).as("n_a"),
        count(when(!armA, v)).as("n_b"),
        sum(when(armA, dec)).as("__sv_a"),
        sum(when(!armA, dec)).as("__sv_b"),
        sum(when(armA, sq)).as("__ss_a"),
        sum(when(!armA, sq)).as("__ss_b"))
    def mean(sv: Column, n: Column) = sv.cast("double") / n
    val (na, nb) = (col("n_a"), col("n_b"))
    val (ma, mb) = (mean(col("__sv_a"), na), mean(col("__sv_b"), nb))
    val va = (col("__ss_a").cast("double") - na * ma * ma) / (na - 1) / na
    val vb = (col("__ss_b").cast("double") - nb * mb * mb) / (nb - 1) / nb
    agg.select(
      groupCols.map(col) ++ Seq(
        na, nb,
        Readout.pin(ma, 6).as("mean_a"),
        Readout.pin(mb, 6).as("mean_b"),
        when(na >= 2 && nb >= 2 && va + vb > 0.0,
          Readout.pin((ma - mb) / sqrt(va + vb), 4)).as("welch_z")): _*)
      .orderBy(groupCols.map(col): _*)
  }


  /** CUPED variance reduction (Deng, Xu, Kohavi & Walker, WSDM 2013) —
    * the industry-standard A/B sensitivity booster beside [[abTest]]'s
    * plain Welch z: each unit's metric is adjusted by its PRE-period
    * covariate,
    *
    *   Ỹ = Y − θ·(X − X̄),   θ = cov(X, Y) / var(X)  (pooled),
    *
    * which removes the between-user variance the experiment didn't
    * cause; the Welch z then runs on the adjusted metric. Reported
    * with the achieved variance reduction (the whole point — a
    * var_reduction of 0.4 means ~40% fewer users for the same power).
    *
    * Determinism contract: all eleven sufficient statistics (per-arm
    * n, Σx, Σy, Σxy, Σx², Σy²) are exact DECIMAL sums of exact
    * decimal products (x·y at scale 8 is exact — the abTest Σv²
    * discipline); θ rounds to 6dp and every downstream expression
    * (adjusted means, adjusted variances, z) derives from the ROUNDED
    * θ in one fixed operation order — identical in any engine.
    * Units with a NULL covariate OR a NULL metric are excluded
    * ENTIRELY (counts and sums alike) — counting them while the sums
    * null-skip would silently bias θ, the adjusted means, and
    * var_reduction. Degenerate inputs (an arm under 2 units, zero
    * covariate variance, zero adjusted variance) yield NULL z.
    *
    * Scale shape: ONE unit-keyed aggregate builds (x, y) per unit,
    * then ONE conditional aggregate over the units — no pivot, no
    * join, map-side partials throughout (the abTest shape with a
    * covariate bolted on). Returns ONE row
    * `(n_a, n_b, theta, mean_adj_a, mean_adj_b, z_adj,
    * var_reduction)`. */
  def cuped(
      units: DataFrame,
      xCol: String,
      yCol: String,
      armA: Column): DataFrame = {
    val x = col(xCol).cast("decimal(18,4)")
    val y = col(yCol).cast("decimal(18,4)")
    // products of the (18,4)-CAST columns: (18,4)×(18,4) → (37,8),
    // inside Spark's 38-digit cap, so the scale-8 product is EXACT —
    // multiplying the raw inputs would overflow the cap and silently
    // round the result type's scale down (engine-divergent)
    val xy = round(x * y, 8).cast("decimal(28,8)")
    val xx = round(x * x, 8).cast("decimal(28,8)")
    val yy = round(y * y, 8).cast("decimal(28,8)")
    // a unit missing either column contributes to NO statistic — the
    // arm counts must stay consistent with the null-skipping sums
    val agg = units
      .filter(col(xCol).isNotNull && col(yCol).isNotNull)
      .agg(
      count(when(armA, lit(1))).as("n_a"),
      count(when(!armA, lit(1))).as("n_b"),
      sum(when(armA, x)).as("__sx_a"), sum(when(!armA, x)).as("__sx_b"),
      sum(when(armA, y)).as("__sy_a"), sum(when(!armA, y)).as("__sy_b"),
      sum(when(armA, xy)).as("__sxy_a"), sum(when(!armA, xy)).as("__sxy_b"),
      sum(when(armA, xx)).as("__sxx_a"), sum(when(!armA, xx)).as("__sxx_b"),
      sum(when(armA, yy)).as("__syy_a"), sum(when(!armA, yy)).as("__syy_b"))
    val (na, nb) = (col("n_a"), col("n_b"))
    // ANSI + codegen CSE trap: a division inside `when(ok, ...)` can
    // still be hoisted and evaluated eagerly as a common subexpression
    // — every denominator must be NULL-guarded at the source (NULL
    // division is silent; zero division throws)
    val (naS, nbS) = (when(na >= 2L, na), when(nb >= 2L, nb))
    val nP = (na + nb).cast("double")
    def d(c: String) = col(c).cast("double")
    val (sxP, syP) = ((col("__sx_a") + col("__sx_b")).cast("double"),
      (col("__sy_a") + col("__sy_b")).cast("double"))
    val (sxyP, sxxP) = ((col("__sxy_a") + col("__sxy_b")).cast("double"),
      (col("__sxx_a") + col("__sxx_b")).cast("double"))
    val thDen = nP * sxxP - sxP * sxP
    val th = Readout.pin((nP * sxyP - sxP * syP) /
      when(thDen > 0.0, thDen), 6)
    val (xma, xmb) = (d("__sx_a") / naS, d("__sx_b") / nbS)
    val (yma, ymb) = (d("__sy_a") / naS, d("__sy_b") / nbS)
    val xmP = sxP / when(nP > 0.0, nP)
    def vy(syy: String, n: Column, ym: Column) =
      (d(syy) - n * ym * ym) / (n - 1)
    def cv(sxy: String, n: Column, xm: Column, ym: Column) =
      (d(sxy) - n * xm * ym) / (n - 1)
    def vx(sxx: String, n: Column, xm: Column) =
      (d(sxx) - n * xm * xm) / (n - 1)
    val (vyA, vyB) = (vy("__syy_a", naS, yma), vy("__syy_b", nbS, ymb))
    val vadjA = vyA - lit(2.0) * th * cv("__sxy_a", naS, xma, yma) +
      th * th * vx("__sxx_a", naS, xma)
    val vadjB = vyB - lit(2.0) * th * cv("__sxy_b", nbS, xmb, ymb) +
      th * th * vx("__sxx_b", nbS, xmb)
    val diff = (yma - ymb) - th * (xma - xmb)
    val sq = vadjA / naS + vadjB / nbS
    val vyS = vyA + vyB
    val ok = na >= 2L && nb >= 2L && thDen > 0.0
    agg.select(na, nb,
      when(ok, th).as("theta"),
      when(ok, Readout.pin(yma - th * (xma - xmP), 6)).as("mean_adj_a"),
      when(ok, Readout.pin(ymb - th * (xmb - xmP), 6)).as("mean_adj_b"),
      when(ok && sq > 0.0,
        Readout.pin(diff / sqrt(when(sq > 0.0, sq)), 4)).as("z_adj"),
      when(ok && vyS > 0.0,
        Readout.pin(lit(1.0) - (vadjA + vadjB) / when(vyS > 0.0, vyS), 6))
        .as("var_reduction"))
  }

  /** Opt-in hot-key guard for the recursive-fold family
    * ([[holtSmoothing]] / [[holtWinters]] / [[ewmaChart]]): each
    * series rides `collect_list` into ONE task — correct (a
    * sequential recursion is inherently per-series) and bounded by
    * the time grid in every gate query, but an adversarial key
    * distribution would serialize silently. Set
    * `spark.graft.fold.maxSeriesLength=N` to fail loudly WITH the
    * offending key instead (off by default — the
    * `Packing.assertUniqueIfEnabled` pattern). The raise_error is
    * embedded INTO the consumed `__pts` column — a guard in a side
    * column would be pruned away (the sequencePatterns lesson). */
  private def guardFoldSeries(df: DataFrame, keyCol: String): DataFrame =
    df.sparkSession.conf.getOption("spark.graft.fold.maxSeriesLength")
      .map(_.toInt).fold(df) { m =>
        df.withColumn("__pts",
          when(size(col("__pts")) > m,
            raise_error(concat(
              lit("recursive-fold series exceeds " +
                s"spark.graft.fold.maxSeriesLength=$m: key="),
              col(keyCol).cast("string"),
              lit(", length="), size(col("__pts")).cast("string"),
              lit(" — a hot key serializes into one task; re-key or " +
                "coarsen the series"))))
            .otherwise(col("__pts")))
      }


  /** Holt double exponential smoothing (Holt 1957) per series — the
    * forecasting baseline beside the DETECTORS (CUSUM, Tukey fences,
    * rate anomalies): level/trend recursions over an ordered series,
    *
    *   f_t = l_{t−1} + b_{t−1}                                (t ≥ 2)
    *   l_t = α·y_t + (1−α)·(l_{t−1} + b_{t−1})
    *   b_t = β·(l_t − l_{t−1}) + (1−β)·b_{t−1},
    *
    * initialized `l₁ = y₁, b₁ = 0` (degenerate-free for length-1
    * series; the first forecast is at t = 2). Output one row per input
    * point: `(key, t, y, level, trend, forecast, residual)` with
    * forecast/residual NULL at t = 1.
    *
    * Determinism contract: α and β are taken as exact integer
    * rationals (`αn/αd`, `βn/βd`) and the WHOLE fold runs in
    * micro-unit (1e−6) BIGINT fixed point — `yµ = floor(y·10⁶)`, each
    * step a floor-divided integer expression — so no engine-dependent
    * double rounding exists anywhere in the recursion. (The previous
    * formulation re-rounded doubles to a 6dp grid each step; with
    * dyadic α/β the recursion lands on exact `.5` grid midpoints
    * constantly, where Spark's shortest-decimal-repr HALF_UP
    * `round(double, 6)` and DuckDB's binary-double rounding disagree —
    * 177/3385 divergent rows at sf0.01. Integer state has no ties to
    * round, the same lesson as cohortLtv's integer floor and
    * spanDedup's packed-BIGINT min.) The output doubles are single
    * IEEE divisions of exactly-representable integers by 10⁶ —
    * bit-identical in any engine.
    *
    * Scale shape: one shuffle keyed on the series key; each series
    * folds inside an `aggregate` HOF over its own collected array —
    * bounded by one series' length (the gapfill/CUSUM grid bound),
    * never by corpus size. No driver loop, no UDF. */
  def holtSmoothing(
      series: DataFrame,
      keyCol: String,
      tCol: String,
      yCol: String,
      alphaNum: Long,
      alphaDen: Long,
      betaNum: Long,
      betaDen: Long): DataFrame = {
    require(alphaDen > 0 && alphaNum > 0 && alphaNum <= alphaDen,
      "alpha = alphaNum/alphaDen must lie in (0, 1]")
    require(betaDen > 0 && betaNum >= 0 && betaNum <= betaDen,
      "beta = betaNum/betaDen must lie in [0, 1]")
    // Exact floor division for possibly-negative numerators (Spark
    // `div` truncates toward zero; `pmod` makes it a floor).
    def fd(x: String, d: Long): String =
      s"((($x) - pmod(($x), ${d}L)) div ${d}L)"
    val prev = "element_at(acc, -1)"
    val fu = s"($prev.lu + $prev.bu)"             // forecast, micro-units
    val lu = fd(s"${alphaNum}L * p.yu + ${alphaDen - alphaNum}L * $fu",
      alphaDen)
    val bu = fd(
      s"${betaNum}L * (($lu) - $prev.lu) + ${betaDen - betaNum}L * $prev.bu",
      betaDen)
    series
      .groupBy(col(keyCol))
      .agg(sort_array(collect_list(struct(
        col(tCol).cast("long").as("t"),
        col(yCol).cast("double").as("y")))).as("__pts"))
      .transform(guardFoldSeries(_, keyCol))
      .select(col(keyCol), explode(expr(
        s"""aggregate(
           |  transform(__pts, q -> named_struct(
           |    't', q.t, 'y', q.y,
           |    'yu', cast(floor(q.y * 1000000.0d) as bigint))),
           |  cast(array() as array<struct<
           |    t:bigint,y:double,yu:bigint,lu:bigint,bu:bigint,
           |    fu:bigint>>),
           |  (acc, p) -> array_append(acc,
           |    if(size(acc) = 0,
           |      named_struct(
           |        't', p.t, 'y', p.y, 'yu', p.yu,
           |        'lu', p.yu, 'bu', 0L,
           |        'fu', cast(null as bigint)),
           |      named_struct(
           |        't', p.t, 'y', p.y, 'yu', p.yu,
           |        'lu', $lu,
           |        'bu', $bu,
           |        'fu', $fu)))
           |)""".stripMargin)).as("__r"))
      .select(col(keyCol), col("__r.t").as("t"), col("__r.y").as("y"),
        (col("__r.lu") / lit(1000000.0d)).as("level"),
        (col("__r.bu") / lit(1000000.0d)).as("trend"),
        (col("__r.fu") / lit(1000000.0d)).as("forecast"),
        ((col("__r.yu") - col("__r.fu")) / lit(1000000.0d)).as("residual"))
      .orderBy(keyCol, "t")
  }

  /** EWMA control chart (Roberts 1959) per series — the
    * small-persistent-shift DETECTOR between [[graft.operators
    * .Behavior]]'s CUSUM (cumulative drift) and the per-point z-score
    * rate anomalies: the exponentially weighted moving average
    *
    *   s₁ = y₁,   s_t = α·y_t + (1−α)·s_{t−1}
    *
    * flagged when it strays past the asymptotic control limit
    * L·σ̂·√(α/(2−α)) from the series mean — the classic SPC chart, and
    * the standard "is this metric quietly drifting" monitor over
    * per-source quality scores or event rates.
    *
    * Determinism contract: α is an exact integer rational and the
    * fold runs in micro-unit BIGINT fixed point with pmod floor
    * division (the [[holtSmoothing]] recursion discipline — no double
    * rounding anywhere in the state); μ̂ and σ̂ come from exact
    * DECIMAL sufficient statistics (the abTest Σv/Σv² discipline);
    * the limit multiplier L·√(α/(2−α)) is ONE driver-computed double
    * literal shared with the oracle; deviation and limit both round
    * to 6dp before the flag comparison. Series with n < 2 or zero
    * variance report NULL limit and NULL flag.
    *
    * Scale shape: one series-keyed shuffle for the fold (per-series
    * work bounded by series length), one keyed aggregate for the
    * sufficient statistics, one |keys|-row broadcast join back.
    * Output one row per input point:
    * `(key, t, y, ewma, deviation, control_limit, flagged)`. */
  def ewmaChart(
      series: DataFrame,
      keyCol: String,
      tCol: String,
      yCol: String,
      alphaNum: Long,
      alphaDen: Long,
      lSigma: Double = 3.0): DataFrame = {
    require(alphaDen > 0 && alphaNum > 0 && alphaNum <= alphaDen,
      "alpha = alphaNum/alphaDen must lie in (0, 1]")
    require(lSigma > 0, "lSigma must be positive")
    def fd(x: String, d: Long): String =
      s"((($x) - pmod(($x), ${d}L)) div ${d}L)"
    val prev = "element_at(acc, -1)"
    val su = fd(s"${alphaNum}L * p.yu + ${alphaDen - alphaNum}L * $prev.su",
      alphaDen)
    val folded = series
      .groupBy(col(keyCol))
      .agg(sort_array(collect_list(struct(
        col(tCol).cast("long").as("t"),
        col(yCol).cast("double").as("y")))).as("__pts"))
      .transform(guardFoldSeries(_, keyCol))
      .select(col(keyCol), explode(expr(
        s"""aggregate(
           |  transform(__pts, q -> named_struct(
           |    't', q.t, 'y', q.y,
           |    'yu', cast(floor(q.y * 1000000.0d) as bigint))),
           |  cast(array() as array<struct<t:bigint,y:double,yu:bigint,
           |    su:bigint>>),
           |  (acc, p) -> array_append(acc, named_struct(
           |    't', p.t, 'y', p.y, 'yu', p.yu,
           |    'su', if(size(acc) = 0, p.yu, $su))))""".stripMargin))
        .as("__r"))
    val v = col(yCol).cast("decimal(18,4)")
    val sq = round(col(yCol) * col(yCol), 8).cast("decimal(28,8)")
    val stats = series.groupBy(col(keyCol)).agg(
      count(when(col(yCol).isNotNull, 1L)).as("__n"),
      sum(v).as("__sv"), sum(sq).as("__ss"))
    val mu = col("__sv").cast("double") / col("__n").cast("double")
    val varY = (col("__ss").cast("double") -
      col("__n").cast("double") * mu * mu) /
      (when(col("__n") >= 2L, col("__n")) - 1L).cast("double")
    // the asymptotic limit multiplier is ONE driver double, shared
    // verbatim with the generated oracle (Double.toString round-trips)
    val factor =
      lSigma * math.sqrt(alphaNum.toDouble / (2.0 * alphaDen - alphaNum))
    val lim = when(varY > 0.0, round(lit(factor) * sqrt(varY), 6))
    val dev = round(abs(col("__r.su") / lit(1000000.0d) - mu), 6)
    folded.join(broadcast(stats), Seq(keyCol))
      .select(col(keyCol), col("__r.t").as("t"), col("__r.y").as("y"),
        (col("__r.su") / lit(1000000.0d)).as("ewma"),
        dev.as("deviation"),
        lim.as("control_limit"),
        (dev > lim).as("flagged"))
      .orderBy(keyCol, "t")
  }

  /** Holt–Winters ADDITIVE triple exponential smoothing (Winters
    * 1960) per series — [[holtSmoothing]] plus a seasonal component of
    * `period` m:
    *
    *   f_t = l_{t−1} + b_{t−1} + s_{t−m}
    *   l_t = α·(y_t − s_{t−m}) + (1−α)·(l_{t−1} + b_{t−1})
    *   b_t = β·(l_t − l_{t−1}) + (1−β)·b_{t−1}
    *   s_t = γ·(y_t − l_t) + (1−γ)·s_{t−m},
    *
    * initialized `l₁ = y₁, b₁ = 0, s = m zeros` (the cold-start
    * contract: seasonality is LEARNED from zero rather than seeded
    * from a warm-up window — fully defined for any series length, and
    * exactly mirrored in the oracle). Seasonal indexing is positional:
    * every input row advances the season by one slot (regularize gaps
    * upstream with the gapfill operator when the grid matters).
    *
    * Determinism contract: same as [[holtSmoothing]] — α/β/γ as exact
    * integer rationals, the whole fold in micro-unit BIGINT fixed
    * point with pmod floor division, the seasonal ring carried as an
    * integer array; no double rounding exists anywhere in the
    * recursion. [[holtWintersOracleSql]] generates the DuckDB replay
    * (recursive CTE carrying the seasonal ring as a LIST).
    *
    * Scale shape: identical to [[holtSmoothing]] — one series-keyed
    * shuffle, per-series fold bounded by series length (state adds m
    * BIGINTs). Output per row:
    * `(key, t, y, level, trend, seasonal, forecast, residual)`,
    * forecast/residual NULL at t = 1. */
  def holtWinters(
      series: DataFrame,
      keyCol: String,
      tCol: String,
      yCol: String,
      period: Int,
      alphaNum: Long, alphaDen: Long,
      betaNum: Long, betaDen: Long,
      gammaNum: Long, gammaDen: Long): DataFrame = {
    require(period >= 2 && period <= 512, "period in [2, 512]")
    require(alphaDen > 0 && alphaNum > 0 && alphaNum <= alphaDen,
      "alpha = alphaNum/alphaDen must lie in (0, 1]")
    require(betaDen > 0 && betaNum >= 0 && betaNum <= betaDen,
      "beta = betaNum/betaDen must lie in [0, 1]")
    require(gammaDen > 0 && gammaNum >= 0 && gammaNum <= gammaDen,
      "gamma = gammaNum/gammaDen must lie in [0, 1]")
    def fd(x: String, d: Long): String =
      s"((($x) - pmod(($x), ${d}L)) div ${d}L)"
    val prev = "element_at(acc, -1)"
    val sm = s"element_at($prev.seas, 1)"
    val fu = s"($prev.lu + $prev.bu + $sm)"
    val lu = fd(
      s"${alphaNum}L * (p.yu - $sm) + ${alphaDen - alphaNum}L * " +
        s"($prev.lu + $prev.bu)", alphaDen)
    val bu = fd(
      s"${betaNum}L * (($lu) - $prev.lu) + ${betaDen - betaNum}L * $prev.bu",
      betaDen)
    val su = fd(
      s"${gammaNum}L * (p.yu - ($lu)) + ${gammaDen - gammaNum}L * $sm",
      gammaDen)
    val zeros = Seq.fill(period)("0L").mkString("array(", ", ", ")")
    series
      .groupBy(col(keyCol))
      .agg(sort_array(collect_list(struct(
        col(tCol).cast("long").as("t"),
        col(yCol).cast("double").as("y")))).as("__pts"))
      .transform(guardFoldSeries(_, keyCol))
      .select(col(keyCol), explode(expr(
        s"""aggregate(
           |  transform(__pts, q -> named_struct(
           |    't', q.t, 'y', q.y,
           |    'yu', cast(floor(q.y * 1000000.0d) as bigint))),
           |  cast(array() as array<struct<
           |    t:bigint,y:double,yu:bigint,lu:bigint,bu:bigint,
           |    seas:array<bigint>,fu:bigint>>),
           |  (acc, p) -> array_append(acc,
           |    if(size(acc) = 0,
           |      named_struct(
           |        't', p.t, 'y', p.y, 'yu', p.yu,
           |        'lu', p.yu, 'bu', 0L, 'seas', $zeros,
           |        'fu', cast(null as bigint)),
           |      named_struct(
           |        't', p.t, 'y', p.y, 'yu', p.yu,
           |        'lu', $lu,
           |        'bu', $bu,
           |        'seas', concat(slice($prev.seas, 2, ${period - 1}),
           |                       array($su)),
           |        'fu', $fu)))
           |)""".stripMargin)).as("__r"))
      .select(col(keyCol), col("__r.t").as("t"), col("__r.y").as("y"),
        (col("__r.lu") / lit(1000000.0d)).as("level"),
        (col("__r.bu") / lit(1000000.0d)).as("trend"),
        (element_at(col("__r.seas"), period) / lit(1000000.0d))
          .as("seasonal"),
        (col("__r.fu") / lit(1000000.0d)).as("forecast"),
        ((col("__r.yu") - col("__r.fu")) / lit(1000000.0d)).as("residual"))
      .orderBy(keyCol, "t")
  }

  /** Index of dispersion (Fano factor) per series — the burstiness
    * screen beside the detectors: variance-to-mean ratio of the
    * series' bucket counts. Poisson-like arrivals sit near 1; bursty
    * series (bot storms, batch jobs masquerading as users) blow past
    * it; over-regular ones (heartbeats) sit below.
    *
    * Determinism contract: `D = (n·Σx² − (Σx)²) / (n·Σx)` — three
    * exact integer sufficient statistics, ONE division of sub-2⁵³
    * doubles rounded to 6dp, identical in any engine (this is the
    * sample-variance·(n−1)/mean·n rescaling — the ratio of integer
    * quadratics, no intermediate float). Zero-sum series yield NULL.
    *
    * Scale shape: one bucket aggregate over events, one |keys|-row
    * aggregate. Returns `(key, n_buckets, total, dispersion)`. */
  def dispersionIndex(
      events: DataFrame,
      keyCol: String,
      tsCol: String,
      bucketUs: Long = 3600000000L): DataFrame = {
    val hourly = events
      .select(col(keyCol).as("key"),
        expr(Behavior.floorDivExpr(tsCol, bucketUs)).as("t"))
      .groupBy("key", "t").agg(count(lit(1)).as("x"))
    hourly.groupBy("key")
      .agg(count(lit(1)).as("n_buckets"),
        sum(col("x")).as("total"),
        sum(col("x") * col("x")).as("__sxx"))
      .select(col("key"), col("n_buckets"), col("total"),
        when(col("total") > 0, round(
          (col("n_buckets") * col("__sxx") - col("total") * col("total"))
            .cast("double") /
            (col("n_buckets") * col("total")).cast("double"), 6))
          .as("dispersion"))
      .orderBy("key")
  }

  /** Lag-k autocorrelation sweep per series — the periodicity
    * detector that picks [[holtWinters]]' season length m: for every
    * lag k ≤ `maxLag`, the Pearson correlation of the series against
    * itself shifted by k over the overlapping support. A daily cycle
    * on hourly counts peaks at k = 24; the report is the full
    * `(key, lag, n, r)` sweep (|keys|·maxLag rows) with `is_peak`
    * marking each key's best lag.
    *
    * Determinism contract: all six sufficient statistics (n, Σx, Σy,
    * Σxy, Σx², Σy²) are EXACT integer sums over integer counts; the
    * correlation is one fixed-order double expression of them (exact
    * below 2⁵³, sqrt IEEE-correctly-rounded) rounded to 6dp —
    * identical in any engine. Zero-variance windows yield NULL r and
    * never peak.
    *
    * Scale shape: the lag explode multiplies the SERIES GRID (hours ×
    * keys — gapfill-bounded, never event-sized) by maxLag, one
    * (key, t)-keyed self-join, one (key, lag) aggregate; the peak flag
    * is a |keys|-row broadcast argmax join, no window. */
  def periodicity(
      series: DataFrame,
      keyCol: String,
      tCol: String,
      yCol: String,
      maxLag: Int): DataFrame = {
    require(maxLag >= 1 && maxLag <= 512, "maxLag in [1, 512]")
    val base = Lineage.cutLocal(series.select(col(keyCol).as("key"),
      col(tCol).cast("long").as("t"), col(yCol).cast("long").as("y")))
    val left = base
      .select(col("key"), col("t"), col("y").as("x"),
        explode(expr(s"sequence(1L, ${maxLag}L)")).as("lag"))
      .select(col("key"), (col("t") + col("lag")).as("t"), col("x"),
        col("lag"))
    val stats = left
      .join(base.select(col("key"), col("t"), col("y")), Seq("key", "t"))
      .groupBy("key", "lag")
      .agg(count(lit(1)).as("n"),
        sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(col("x") * col("y")).as("sxy"),
        sum(col("x") * col("x")).as("sxx"),
        sum(col("y") * col("y")).as("syy"))
    val num = (col("n") * col("sxy") - col("sx") * col("sy"))
      .cast("double")
    val den = sqrt((col("n") * col("sxx") - col("sx") * col("sx"))
      .cast("double")) *
      sqrt((col("n") * col("syy") - col("sy") * col("sy"))
        .cast("double"))
    val sweep = Lineage.cutLocal(stats.select(col("key"), col("lag"),
      col("n"),
      when(den > 0.0, Readout.pin(num / den, 6)).as("r")))
    // per-key peak via a broadcast argmax frame (max over the struct
    // orders by r then by the NEGATED lag -> smallest lag wins ties)
    val peaks = sweep.filter(col("r").isNotNull)
      .groupBy("key")
      .agg(max(struct(col("r"), (-col("lag")).as("nl"))).as("__b"))
      .select(col("key"), col("__b.r").as("__pr"),
        (-col("__b.nl")).as("__pl"))
    sweep.join(broadcast(peaks), Seq("key"), "left")
      .select(col("key"), col("lag"), col("n"), col("r"),
        (col("r").isNotNull && col("__pr").isNotNull &&
          col("r") === col("__pr") && col("lag") === col("__pl"))
          .as("is_peak"))
      .orderBy("key", "lag")
  }

  /** GENERATED DuckDB oracle for [[holtWinters]] over per-key hourly
    * counts of `events` (the aq61 gate shape): the same integer
    * recursion as a recursive CTE, seasonal ring carried as a LIST,
    * floor division written out with the explicit pmod form (DuckDB
    * `//` truncates toward zero on negatives). */
  def holtWintersOracleSql(
      keyExpr: String,
      bucketUs: Long,
      period: Int,
      alphaNum: Long, alphaDen: Long,
      betaNum: Long, betaDen: Long,
      gammaNum: Long, gammaDen: Long): String = {
    def fd(x: String, d: Long): String =
      s"((($x) - (((($x) % $d) + $d) % $d)) // $d)"
    val sm = "h.seas[1]"
    val lu = fd(
      s"$alphaNum * (x.yu - $sm) + ${alphaDen - alphaNum} * (h.lu + h.bu)",
      alphaDen)
    val bu = fd(
      s"$betaNum * (($lu) - h.lu) + ${betaDen - betaNum} * h.bu", betaDen)
    val su = fd(
      s"$gammaNum * (x.yu - ($lu)) + ${gammaDen - gammaNum} * $sm", gammaDen)
    val zeros = Seq.fill(period)("0").mkString("[", ", ", "]")
    s"""WITH RECURSIVE s AS (
       |  SELECT $keyExpr AS key, epoch_us(ts) // $bucketUs AS t,
       |         count(*)::bigint AS n
       |  FROM events GROUP BY 1, 2
       |), o AS (
       |  SELECT key, t, n::double AS y,
       |         floor(n::double * 1000000.0)::bigint AS yu,
       |         row_number() OVER (PARTITION BY key ORDER BY t) AS rn
       |  FROM s
       |), h AS (
       |  SELECT key, t, y, yu,
       |         yu AS lu, 0::bigint AS bu, $zeros::bigint[] AS seas,
       |         NULL::bigint AS fu, rn
       |  FROM o WHERE rn = 1
       |  UNION ALL
       |  SELECT x.key, x.t, x.y, x.yu,
       |         $lu,
       |         $bu,
       |         list_concat(h.seas[2:], [$su]),
       |         h.lu + h.bu + $sm,
       |         x.rn
       |  FROM o x JOIN h ON x.key = h.key AND x.rn = h.rn + 1
       |)
       |SELECT key, t, y,
       |       lu / 1000000.0 AS level, bu / 1000000.0 AS trend,
       |       seas[$period] / 1000000.0 AS seasonal,
       |       fu / 1000000.0 AS forecast,
       |       (yu - fu) / 1000000.0 AS residual
       |FROM h
       |ORDER BY key, t""".stripMargin
  }

  /** Mann–Kendall trend test (Mann 1945; Kendall 1975) per series —
    * the NONPARAMETRIC monotone-trend detector that complements the
    * model-based smoothers ([[holtSmoothing]] fits a trend,
    * [[periodicity]] finds cycles; this answers "is the series going
    * somewhere at all" with no distributional assumption):
    *
    *   S = Σ_{i<j} sign(y_j − y_i),
    *   Var(S) = [n(n−1)(2n+5) − Σ_t t(t−1)(2t+5)] / 18  (t = tie sizes),
    *   z = (S − sign(S)) / √Var(S)   (0 when S = 0).
    *
    * Determinism contract: the metric is quantized to the 6dp
    * micro-unit grid (decimal HALF_UP — a documented measurement grid,
    * NOT a silent integer truncation: 1.2 and 1.9 stay distinct;
    * sign() and tie structure below 1e−6 resolution collapse, which a
    * rank test tolerates by construction); S and the 18·Var(S)
    * numerator are then EXACT integers; z is one fixed-order double
    * expression of them rounded to 6dp — identical in any engine.
    * Degenerate series (n < 2, or all values tied → Var = 0) report
    * NULL z and NULL trend.
    *
    * Scale shape: ONE key-equi self-join over the series grid
    * (time-bounded per key — buckets × keys, never event-sized: the
    * periodicity discipline), each key's O(n²) pairs collapsing
    * map-side into one S row; the tie/variance pass is a (key, y)
    * aggregate over the same grid. Returns
    * `(key, n, s_stat, z, trend)`. */
  def mannKendall(
      series: DataFrame,
      keyCol: String,
      tCol: String,
      yCol: String): DataFrame = {
    val base = Lineage.cutLocal(series.select(col(keyCol).as("key"),
      col(tCol).cast("long").as("t"),
      (col(yCol).cast("decimal(24,6)") * 1000000).cast("long").as("y")))
    val s = base.as("i").join(base.as("j"),
        col("i.key") === col("j.key") && col("i.t") < col("j.t"))
      .groupBy(col("i.key").as("key"))
      .agg(sum(when(col("j.y") > col("i.y"), 1L)
        .when(col("j.y") < col("i.y"), -1L).otherwise(0L)).as("__s"))
    val ties = base.groupBy("key", "y").agg(count(lit(1)).as("__tc"))
      .groupBy("key")
      .agg(sum(col("__tc")).as("n"),
        sum(col("__tc") * (col("__tc") - 1L) *
          (lit(2L) * col("__tc") + 5L)).as("__tt"))
    val var18 = col("n") * (col("n") - 1L) * (lit(2L) * col("n") + 5L) -
      col("__tt")
    val sd = sqrt(var18.cast("double") / 18.0)
    val sStat = coalesce(col("__s"), lit(0L))
    val z = when(var18 <= 0L, lit(null))
      .when(sStat > 0L, Readout.pin((sStat - 1L).cast("double") / sd, 6))
      .when(sStat < 0L, Readout.pin((sStat + 1L).cast("double") / sd, 6))
      .otherwise(lit(0.0))
    ties.join(s, Seq("key"), "left")
      .withColumn("z", z)
      .select(col("key"), col("n"), sStat.as("s_stat"), col("z"),
        when(col("z").isNull, lit(null))
          .when(col("z") > 1.96, lit("increasing"))
          .when(col("z") < -1.96, lit("decreasing"))
          .otherwise(lit("none")).as("trend"))
      .orderBy("key")
  }

  /** Theil–Sen robust trend estimator (Theil 1950; Sen 1968) per
    * series — the median of all pairwise slopes, with the companion
    * median-residual intercept: up to ~29% arbitrarily-corrupted
    * points leave the fit unmoved, where the OLS slope chases every
    * outlier. The natural partner of [[mannKendall]] (detect a trend,
    * then estimate it robustly).
    *
    * Determinism contract: the metric is quantized to the 6dp
    * micro-unit grid (decimal HALF_UP, the [[mannKendall]] contract —
    * fractional values survive; integral values are bit-unchanged
    * since Δyµ/(Δt·10⁶) and yµ/10⁶ round the SAME real quotients IEEE
    * rounds for Δy/Δt and y); each slope is ONE double division of
    * exact longs (IEEE-identical anywhere); the median is Spark
    * `percentile` == DuckDB `quantile_cont` (the aq6 precedent) over
    * those exact doubles; the slope rounds to 6dp BEFORE the residual
    * pass so the intercept derives from the same number in any
    * engine. Series with fewer than 2 points have no pairs and are
    * excluded.
    *
    * Scale shape: the same key-equi pair join over the time-bounded
    * series grid as [[mannKendall]], one percentile aggregate per key,
    * then a |keys|-row broadcast back onto the grid for the residual
    * percentile. Returns `(key, n_pairs, slope, intercept)`. */
  def theilSen(
      series: DataFrame,
      keyCol: String,
      tCol: String,
      yCol: String): DataFrame = {
    val base = Lineage.cutLocal(series.select(col(keyCol).as("key"),
      col(tCol).cast("long").as("t"),
      (col(yCol).cast("decimal(24,6)") * 1000000).cast("long").as("y")))
    val med = base.as("i").join(base.as("j"),
        col("i.key") === col("j.key") && col("i.t") < col("j.t"))
      .select(col("i.key").as("key"),
        ((col("j.y") - col("i.y")).cast("double") /
          ((col("j.t") - col("i.t")) * 1000000L).cast("double")).as("__m"))
      .groupBy("key")
      .agg(count(lit(1)).as("n_pairs"),
        Readout.pin(expr("percentile(__m, 0.5)"), 6).as("slope"))
    val intercept = base.join(broadcast(med), Seq("key"))
      .select(col("key"),
        (col("y").cast("double") / 1000000.0 -
          col("slope") * col("t").cast("double"))
          .as("__r"))
      .groupBy("key")
      .agg(Readout.pin(expr("percentile(__r, 0.5)"), 6).as("intercept"))
    med.join(intercept, Seq("key"))
      .select("key", "n_pairs", "slope", "intercept")
      .orderBy("key")
  }

  /** Mann–Whitney U rank-sum test (Mann & Whitney 1947) — the
    * nonparametric two-cohort comparison beside [[abTest]]'s Welch t
    * (means assume the metric is well-behaved; ranks don't care):
    * does cohort A's metric stochastically dominate cohort B's?
    *
    *   2·U_A = Σ_v n_A(v) · (2·#{B below v} + n_B(v)),
    *   z = ((2U_A − n_A·n_B)/2) / σ,
    *   σ = √( n_A·n_B/12 · ( (n+1) − Σ(t³−t)/(n(n−1)) ) ).
    *
    * Determinism contract: 2U (half-ranks cleared) and every tie term
    * are EXACT integers carried as decimal(38,0) (a 100 TB cohort
    * pair overflows a long: n_A·n_B alone can pass 2⁶³); z is one
    * fixed-order double expression rounded to 6dp. A missing cohort
    * or an all-tied sample (σ = 0) reports NULL z.
    *
    * Scale shape: events collapse to the per-VALUE frame first (one
    * aggregate, map-side partials) — the running B-count then runs
    * over the measurement GRID (distinct metric values: price cents,
    * score grid — bounded by the instrument, never row-sized), the
    * one place an ordered no-partition window is honest (the
    * count-min readout reasoning); one final 1-row aggregate.
    * Returns ONE row `(n_a, n_b, u_stat, z)` — u_stat = U_A as a
    * double (half-integer under ties; the exact 2U integer stays
    * internal, so the readout never depends on engine hugeint/decimal
    * dtype rendering). */
  def mannWhitney(
      df: DataFrame,
      groupCol: String,
      valueCol: String,
      groupA: String,
      groupB: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val perValue = df
      .filter(col(groupCol).isin(groupA, groupB) &&
        col(valueCol).isNotNull)
      .groupBy(col(valueCol).as("__v"))
      .agg(
        sum(when(col(groupCol) === groupA, 1L).otherwise(0L)).as("__na"),
        sum(when(col(groupCol) === groupB, 1L).otherwise(0L)).as("__nb"))
    val w = Window.orderBy("__v")
      .rowsBetween(Window.unboundedPreceding, -1)
    val dec = "decimal(38,0)"
    perValue
      .withColumn("__cb", coalesce(sum(col("__nb")).over(w), lit(0L)))
      .agg(
        sum(col("__na")).as("n_a"),
        sum(col("__nb")).as("n_b"),
        sum(col("__na").cast(dec) *
          (lit(2L) * col("__cb") + col("__nb")).cast(dec)).as("u2"),
        sum(((col("__na") + col("__nb")).cast(dec) *
          (col("__na") + col("__nb")).cast(dec) *
          (col("__na") + col("__nb")).cast(dec) -
          (col("__na") + col("__nb")).cast(dec)).cast(dec)).as("__t3"))
      .select(col("n_a"), col("n_b"),
        round(col("u2").cast("double") / 2.0, 1).as("u_stat"),
        when(col("n_a") === 0L || col("n_b") === 0L ||
            col("n_a") + col("n_b") < 2L, lit(null))
          .otherwise({
            val n = (col("n_a") + col("n_b")).cast("double")
            val prod = col("n_a").cast(dec) * col("n_b").cast(dec)
            val sigma = sqrt(prod.cast("double") / 12.0 *
              ((n + 1.0) - col("__t3").cast("double") /
                (n * (n - 1.0))))
            when(sigma > 0.0, Readout.pin(
              ((col("u2") - prod).cast("double") / 2.0) / sigma, 6))
          }).as("z"))
  }

  /** Two-sample Kolmogorov–Smirnov test — the DISTRIBUTION-shape
    * companion to [[mannWhitney]] (U detects location shift; KS
    * detects any difference: spread, shape, tails): the maximum gap
    * between the two empirical CDFs,
    *
    *   D = max_v |F_A(v) − F_B(v)|,
    *   KS = D·√(n_A·n_B/(n_A+n_B)).
    *
    * Determinism contract: the gap is carried as the exact integer
    * |c_A·n_B − c_B·n_A| (cross-multiplied cumulative counts,
    * decimal(38,0) — the common denominator never materializes as a
    * float); D and KS are fixed-order double expressions of exact
    * integers rounded to 6dp. An empty cohort reports NULL.
    *
    * Scale shape: identical to [[mannWhitney]] — one per-VALUE
    * aggregate (map-side partials), cumulative counts over the
    * measurement-grid value frame, one 1-row readout. Returns ONE row
    * `(n_a, n_b, d_stat, ks_stat)`. */
  def ksTest(
      df: DataFrame,
      groupCol: String,
      valueCol: String,
      groupA: String,
      groupB: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val dec = "decimal(38,0)"
    val perValue = df
      .filter(col(groupCol).isin(groupA, groupB) &&
        col(valueCol).isNotNull)
      .groupBy(col(valueCol).as("__v"))
      .agg(
        sum(when(col(groupCol) === groupA, 1L).otherwise(0L)).as("__na"),
        sum(when(col(groupCol) === groupB, 1L).otherwise(0L)).as("__nb"))
    val w = Window.orderBy("__v")
      .rowsBetween(Window.unboundedPreceding, 0)
    val whole = Window.orderBy("__v")
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val prod = (col("n_a").cast(dec) * col("n_b").cast(dec)).cast("double")
    val d = col("__maxd").cast("double") / prod
    val ok = col("n_a") > 0L && col("n_b") > 0L
    perValue
      .withColumn("__ca", sum(col("__na")).over(w))
      .withColumn("__cb", sum(col("__nb")).over(w))
      .withColumn("__ta", sum(col("__na")).over(whole))
      .withColumn("__tb", sum(col("__nb")).over(whole))
      .agg(
        max(col("__ta")).as("n_a"),
        max(col("__tb")).as("n_b"),
        max(abs(col("__ca").cast(dec) * col("__tb").cast(dec) -
          col("__cb").cast(dec) * col("__ta").cast(dec))).as("__maxd"))
      .select(col("n_a"), col("n_b"),
        when(ok, round(d, 6)).as("d_stat"),
        when(ok, round(
          d * sqrt(prod / (col("n_a") + col("n_b")).cast("double")), 6))
          .as("ks_stat"))
  }

  /** χ² test of independence over a two-way contingency table — "does
    * the row factor depend on the column factor" (event mix by
    * day-of-week, language by source): O_rc vs E_rc = rowTot·colTot/N,
    * with the effect size reported as Cramér's V.
    *
    * Determinism contract: every count is exact; E and each cell term
    * are fixed-order double expressions; terms round to 6dp and sum
    * as DECIMAL (order-independent — the tq8 discipline, since cell
    * order differs between engines); V derives from the already-
    * rounded χ². Returns ONE row
    * `(n, n_rows, n_cols, dof, chi2, cramers_v)`.
    *
    * Scale shape: one (row, col) aggregate over the data (map-side
    * partials), then joins over the COMPLETE r×c grid (row margins ×
    * column margins, observed cells left-joined in with O coalesced to
    * 0 — omitting the unobserved cells would drop their (0−E)²/E = E
    * terms and understate χ², exactly the hole [[driftByWindow]]
    * completes its grid for) — |rows|·|cols| dimension-bounded; the
    * margins are aggregates of the cell frame, never a second data
    * pass. */
  def chi2Independence(
      df: DataFrame,
      rowCol: String,
      colCol: String): DataFrame = {
    val cells = Lineage.cutLocal(df
      .filter(col(rowCol).isNotNull && col(colCol).isNotNull)
      .groupBy(col(rowCol).as("__r"), col(colCol).as("__c"))
      .agg(count(lit(1)).as("__o")))
    val rt = cells.groupBy("__r").agg(sum("__o").as("__rt"))
    val ct = cells.groupBy("__c").agg(sum("__o").as("__ct"))
    val tot = broadcast(cells.agg(sum("__o").as("__n"),
      countDistinct(col("__r")).as("__nr"),
      countDistinct(col("__c")).as("__nc")))
    val e = (col("__rt") * col("__ct")).cast("double") /
      col("__n").cast("double")
    val term = (col("__o").cast("double") - e) *
      (col("__o").cast("double") - e) / e
    rt.crossJoin(broadcast(ct))
      .join(cells, Seq("__r", "__c"), "left")
      .withColumn("__o", coalesce(col("__o"), lit(0L)))
      .crossJoin(tot)
      .select(col("__n"), col("__nr"), col("__nc"),
        round(term, 6).cast("decimal(18,6)").as("__term"))
      .groupBy("__n", "__nr", "__nc")
      .agg(sum("__term").as("__chi2"))
      .select(col("__n").as("n"), col("__nr").as("n_rows"),
        col("__nc").as("n_cols"),
        ((col("__nr") - 1L) * (col("__nc") - 1L)).as("dof"),
        col("__chi2").cast("double").as("chi2"),
        when((col("__nr") - 1L) * (col("__nc") - 1L) > 0L,
          round(sqrt(col("__chi2").cast("double") /
            (col("__n").cast("double") *
              least(col("__nr") - 1L, col("__nc") - 1L).cast("double"))),
            6)).as("cramers_v"))
  }

  /** Acklam's rational approximation of the standard-normal inverse
    * CDF (Acklam 2003; |ε| < 1.15e−9) — DRIVER-side only: [[bhSelect]]
    * turns its p-value cutoffs into z THRESHOLD literals, so the data
    * path never touches erf/exp (the softsign libm-free discipline). */
  private[operators] def invNorm(p: Double): Double = {
    require(p > 0.0 && p < 1.0, s"invNorm domain (0,1), got $p")
    val a = Array(-3.969683028665376e+01, 2.209460984245205e+02,
      -2.759285104469687e+02, 1.383577518672690e+02,
      -3.066479806614716e+01, 2.506628277459239e+00)
    val b = Array(-5.447609879822406e+01, 1.615858368580409e+02,
      -1.556989798598866e+02, 6.680131188771972e+01,
      -1.328068155288572e+01)
    val c = Array(-7.784894002430293e-03, -3.223964580411365e-01,
      -2.400758277161838e+00, -2.549732539343734e+00,
      4.374664141464968e+00, 2.938163982698783e+00)
    val d = Array(7.784695709041462e-03, 3.224671290700398e-01,
      2.445134137142996e+00, 3.754408661907416e+00)
    val pl = 0.02425
    if (p < pl) {
      val q = math.sqrt(-2.0 * math.log(p))
      (((((c(0) * q + c(1)) * q + c(2)) * q + c(3)) * q + c(4)) * q + c(5)) /
        ((((d(0) * q + d(1)) * q + d(2)) * q + d(3)) * q + 1.0)
    } else if (p <= 1.0 - pl) {
      val q = p - 0.5; val r = q * q
      (((((a(0) * r + a(1)) * r + a(2)) * r + a(3)) * r + a(4)) * r + a(5)) *
        q /
        (((((b(0) * r + b(1)) * r + b(2)) * r + b(3)) * r + b(4)) * r + 1.0)
    } else {
      val q = math.sqrt(-2.0 * math.log(1.0 - p))
      -(((((c(0) * q + c(1)) * q + c(2)) * q + c(3)) * q + c(4)) * q + c(5)) /
        ((((d(0) * q + d(1)) * q + d(2)) * q + d(3)) * q + 1.0)
    }
  }

  /** The BH z-threshold ladder for `m` two-sided tests at level
    * `alpha`: t_k = Φ⁻¹(1 − k·α/(2m)), k = 1..m — shared by the Spark
    * plan and the generated oracle so both compare against the SAME
    * literals. */
  private[operators] def bhThresholds(
      m: Int, alpha: Double): Seq[(Int, Double)] =
    (1 to m).map(k => k -> invNorm(1.0 - alpha * k / (2.0 * m)))

  /** Benjamini–Hochberg FDR selection (Benjamini & Hochberg 1995) over
    * a family of two-sided z tests — the multiple-testing correction
    * every metrics sweep needs once it tests MANY cells (5 event types
    * × a z each: at α = 0.05 one false alarm per 20 cells is the
    * EXPECTED behavior of uncorrected tests): order by |z|, find the
    * largest k with p_(k) ≤ k·α/m, reject exactly ranks 1..k.
    *
    * The p-value comparison is rewritten on the z SCALE:
    * p_(k) ≤ k·α/m  ⟺  |z|_(k) ≥ Φ⁻¹(1 − k·α/(2m)), with the m
    * threshold literals computed ON THE DRIVER ([[invNorm]]) and
    * embedded in BOTH plans — the data path contains comparisons
    * against literals only, no erf/exp anywhere (the libm-free
    * discipline; an engine-side normal CDF would be the one
    * cross-engine float hazard in the operator).
    *
    * Scale shape: `tests` is a FAMILY of test results — dimension-
    * sized by contract (one row per metric cell, like the count-min
    * readout), so the driver count, the |z| rank window, and the
    * m-row broadcast threshold join are all bounded by the family
    * size, never by data. Returns
    * `(key..., z, bh_rank, threshold, significant)` ordered by rank. */
  def bhSelect(
      tests: DataFrame,
      keyCol: String,
      zCol: String,
      alpha: Double = 0.05,
      maxTests: Int = 100000): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(alpha > 0.0 && alpha < 1.0, "alpha in (0, 1)")
    val spark = tests.sparkSession
    val base = Lineage.cutLocal(
      tests.filter(col(zCol).isNotNull)
        .select(col(keyCol).as("key"), col(zCol).cast("double").as("z")))
    val m = base.count()
    require(m <= maxTests,
      s"bhSelect: $m tests exceed maxTests=$maxTests — the test family " +
        "must be dimension-sized (metric cells), not data-sized")
    if (m == 0) {
      // preserve the key column's type in the empty frame
      return base.withColumn("bh_rank", lit(0L))
        .withColumn("threshold", lit(0.0))
        .withColumn("significant", lit(false))
        .limit(0)
    }
    import spark.implicits._
    val th = broadcast(bhThresholds(m.toInt, alpha)
      .map { case (k, t) => (k.toLong, t) }.toDF("bh_rank", "threshold"))
    val ranked = base
      .withColumn("bh_rank", row_number()
        .over(Window.orderBy(abs(col("z")).desc, col("key"))).cast("long"))
      .join(th, Seq("bh_rank"))
      .withColumn("__flag", abs(col("z")) >= col("threshold"))
    val w = Window.orderBy("bh_rank")
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    ranked
      .withColumn("__kmax", max(when(col("__flag"), col("bh_rank"))).over(w))
      .select(col("key"), col("z"), col("bh_rank"), col("threshold"),
        (col("__kmax").isNotNull &&
          col("bh_rank") <= coalesce(col("__kmax"), lit(0L)))
          .as("significant"))
      .orderBy("bh_rank")
  }

  /** GENERATED DuckDB oracle tail for [[bhSelect]]: given a CTE named
    * `tests(key, z)`, replays the rank, the SAME driver-computed
    * threshold literals, and the suffix rejection rule. */
  private[graft] def bhOracleTail(m: Int, alpha: Double): String = {
    val values = bhThresholds(m, alpha)
      .map { case (k, t) => s"($k, $t::double)" }.mkString(", ")
    s"""th(bh_rank, threshold) AS (VALUES $values),
       |r AS (
       |  SELECT key, z,
       |         row_number() OVER (ORDER BY abs(z) DESC, key) AS bh_rank
       |  FROM tests WHERE z IS NOT NULL
       |), f AS (
       |  SELECT r.key, r.z, r.bh_rank, th.threshold,
       |         (abs(r.z) >= th.threshold) AS flag
       |  FROM r JOIN th USING (bh_rank)
       |), k AS (
       |  SELECT max(CASE WHEN flag THEN bh_rank END) AS kmax FROM f
       |)
       |SELECT key, z, bh_rank::bigint AS bh_rank, threshold,
       |       coalesce(bh_rank <= kmax, false) AS significant
       |FROM f CROSS JOIN k
       |ORDER BY bh_rank""".stripMargin
  }

  /** Kruskal–Wallis H test (Kruskal & Wallis 1952) — [[mannWhitney]]
    * generalized to k groups: do ANY of the cohorts' value
    * distributions differ? Rank sums per group over the combined
    * sample, tie-corrected:
    *
    *   H = 12/(n(n+1)) · Σ_g R_g²/n_g − 3(n+1),
    *   H' = H / (1 − Σ(t³−t)/(n³−n)).
    *
    * Determinism contract: rank sums are carried DOUBLED (2R_g =
    * Σ_v n_gv·(2·below_v + t_v + 1), always integers) in
    * decimal(38,0); each group's R_g²/n_g quotient rounds to 6dp and
    * sums as DECIMAL (group order differs between engines); H and the
    * correction are fixed-order double expressions. Degenerate inputs
    * (n < 2, every value tied, or a single group) report NULL.
    *
    * Scale shape: the [[mannWhitney]] grid discipline — one (group,
    * value) aggregate, combined-tie counts from the value margin, the
    * running below-count over the measurement GRID, one group
    * aggregate and one 1-row readout. Returns ONE row
    * `(n_groups, n, h, h_adj)`. */
  def kruskalWallis(
      df: DataFrame,
      groupCol: String,
      valueCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val dec = "decimal(38,0)"
    val gv = Lineage.cutLocal(df
      .filter(col(groupCol).isNotNull && col(valueCol).isNotNull)
      .groupBy(col(groupCol).as("__g"), col(valueCol).as("__v"))
      .agg(count(lit(1)).as("__c")))
    val w = Window.orderBy("__v")
      .rowsBetween(Window.unboundedPreceding, -1)
    val vm = gv.groupBy("__v").agg(sum("__c").as("__t"))
      .withColumn("__below", coalesce(sum(col("__t")).over(w), lit(0L)))
    val perGroup = gv.join(vm, Seq("__v"))
      .groupBy("__g")
      .agg(sum(col("__c")).as("__ng"),
        sum(col("__c").cast(dec) *
          (lit(2L) * col("__below") + col("__t") + 1L).cast(dec))
          .as("__r2"))
      // q_g = R_g²/n_g = (2R_g)²/(4·n_g): one fixed-order double per
      // group, rounded BEFORE the cross-group sum
      .select(col("__ng"), round(
        (col("__r2") * col("__r2")).cast("double") /
          (lit(4L).cast(dec) * col("__ng").cast(dec)).cast("double"), 6)
        .cast("decimal(28,6)").as("__q"))
    val ties = vm.agg(
      sum((col("__t").cast(dec) * col("__t").cast(dec) *
        col("__t").cast(dec) - col("__t").cast(dec)).cast(dec)).as("__tt"))
    val nD = col("n").cast("double")
    val h = lit(12.0) * col("__sq").cast("double") /
      (nD * (nD + 1.0)) - lit(3.0) * (nD + 1.0)
    val corr = lit(1.0) - col("__tt").cast("double") /
      (col("n").cast(dec) * col("n").cast(dec) * col("n").cast(dec) -
        col("n").cast(dec)).cast("double")
    perGroup
      .agg(count(lit(1)).as("n_groups"), sum("__ng").as("n"),
        sum("__q").as("__sq"))
      .crossJoin(broadcast(ties))
      .select(col("n_groups"), col("n"),
        when(col("n_groups") >= 2L && col("n") >= 2L, round(h, 6)).as("h"),
        when(col("n_groups") >= 2L && col("n") >= 2L && corr > 0.0,
          round(round(h, 6) / corr, 6)).as("h_adj"))
  }

  /** Per-window distribution drift against the pooled reference — the
    * monitor an ingestion pipeline alarms on ("today's event mix no
    * longer looks like the corpus"): for each window, the χ²
    * goodness-of-fit of its category counts against the all-window
    * category shares,
    *
    *   E_wt = n_w · tot_t / N,   χ²_w = Σ_t (o_wt − E_wt)² / E_wt,
    *
    * flagged `drifted` above the caller's critical value (pick it for
    * the family's dof = |types|−1; e.g. 9.488 at dof 4, α = 0.05).
    * Windows missing a category contribute that category's FULL
    * expected mass (o = 0), as the statistic requires.
    *
    * Determinism contract: counts are exact integers; E and each term
    * are fixed-order double expressions; terms round to 6dp and sum as
    * DECIMAL (the aq75 discipline); the flag compares the
    * already-rounded χ². Scale shape: everything past `counts` is the
    * window × category GRID — one |types|-row broadcast, one 1-row
    * broadcast, one window aggregate; the grid completion is a
    * grid-sized cross of windows × categories, never event rows.
    * Returns `(window, n, chi2, drifted)` per window. */
  def driftByWindow(
      counts: DataFrame,
      windowCol: String,
      typeCol: String,
      nCol: String,
      critical: Double): DataFrame = {
    val cells = Lineage.cutLocal(counts.select(
      col(windowCol).as("__w"), col(typeCol).as("__t"),
      col(nCol).cast("long").as("__o")))
    val ref = broadcast(cells.groupBy("__t").agg(sum("__o").as("__tot")))
    val total = broadcast(cells.agg(sum("__o").as("__n")))
    val perWindow = cells.groupBy("__w").agg(sum("__o").as("__nw"))
    // complete the grid: a window missing a category still owes its
    // expected mass — cross the window frame with the category frame
    val grid = perWindow.crossJoin(ref)
      .join(cells, Seq("__w", "__t"), "left")
      .withColumn("__o", coalesce(col("__o"), lit(0L)))
    val e = (col("__nw") * col("__tot")).cast("double") /
      col("__n").cast("double")
    val term = (col("__o").cast("double") - e) *
      (col("__o").cast("double") - e) / e
    grid.crossJoin(total)
      .select(col("__w"), col("__nw"),
        round(term, 6).cast("decimal(18,6)").as("__term"))
      .groupBy("__w", "__nw")
      .agg(sum("__term").cast("double").as("chi2"))
      .select(col("__w").as("window_key"), col("__nw").as("n"),
        col("chi2"), (col("chi2") > critical).as("drifted"))
      .orderBy("window_key")
  }

  /** Spearman rank correlation per group, tie-corrected — the
    * monotone-association companion to Pearson (aq8 reports `corr`;
    * Spearman survives any monotone transform and ignores outlier
    * magnitude). Average ranks are carried DOUBLED (`2r` is always an
    * integer — ties average to half-integers), so the whole
    * computation stays integer until one final expression:
    *
    *   ρ = (Ax + Ay − 3·Σd²₂) / (2·√(Ax·Ay)),
    *   Ax = (n³−n) − Σ(t³−t),   d₂ = 2rₓ − 2r_y,
    *
    * (the Pearson-on-average-ranks identity with every /12 and /4
    * cleared). Sums ride decimal(38,0) — n³ passes 2⁶³ around n ≈ 2M
    * per group. ρ rounds to 6dp; a group with zero rank variance on
    * either side (all x tied, or n < 2) reports NULL.
    *
    * Determinism contract: min-ranks are exact integers
    * (2r = 2·minrank + tiecount − 1); the final expression is
    * fixed-order double. Scale shape: rows collapse to per-(group,
    * value) count frames (one aggregate each side); the running
    * below-count comes from [[Packing.groupedPrefixSum]] — a
    * range-partitioned two-phase prefix sum whose per-task sort is
    * bounded by the RANGE PARTITION, never by a group's grid. That
    * matters because a ranked metric is often a derived per-entity
    * aggregate (unique per row), making the per-group grid DATA-sized:
    * a plain `Window.partitionBy(group).orderBy(value)` would then
    * sort each whole group in a single task — the no-partition-window
    * scale-killer divided by |groups|. Two grid-keyed joins back; one
    * group aggregate. Returns `(group, n, rho)`. */
  def spearman(
      df: DataFrame,
      groupCol: String,
      xCol: String,
      yCol: String): DataFrame = {
    val dec = "decimal(38,0)"
    // range-kernel width from the PRE-cut input (post-cut LogicalRDD
    // stats are unknown/inflated): session width over a provably-small
    // grid is near-empty-task tax (aq77 measured 215 tasks for 1.6 MB
    // of shuffle); the clamp keeps the session width at scale
    val parts = Some(Lineage.iterPartitions(df))
    val rows = Lineage.cutLocal(df
      .filter(col(xCol).isNotNull && col(yCol).isNotNull)
      .select(col(groupCol).as("__g"), col(xCol).as("__x"),
        col(yCol).as("__y")))
    def rankFrame(vc: String): DataFrame = {
      val grid = rows.groupBy(col("__g"), col(vc).as("__v"))
        .agg(count(lit(1)).as("__tc"))
      Packing.groupedPrefixSum(grid, "__g", "__v", "__tc", "__cum",
          numParts = parts)
        // 2·avgRank = 2·(below + 1) + (tc − 1) = 2·below + tc + 1,
        // below = inclusive cumulative − own tie count
        .select(col("__g"), col("__v"),
          (lit(2L) * (col("__cum") - col("__tc")) + col("__tc") + 1L)
            .as("__r2"),
          col("__tc"))
    }
    val rx = rankFrame("__x")
    val ry = rankFrame("__y")
    def tieSum(f: DataFrame): DataFrame = f.groupBy("__g")
      .agg(sum((col("__tc").cast(dec) * col("__tc").cast(dec) *
        col("__tc").cast(dec) - col("__tc").cast(dec)).cast(dec))
        .as("__tt"))
    val joined = rows
      .join(rx.select(col("__g"), col("__v").as("__x"),
        col("__r2").as("__ux")), Seq("__g", "__x"))
      .join(ry.select(col("__g"), col("__v").as("__y"),
        col("__r2").as("__uy")), Seq("__g", "__y"))
      .groupBy("__g")
      .agg(count(lit(1)).as("n"),
        sum(((col("__ux") - col("__uy")) * (col("__ux") - col("__uy")))
          .cast(dec)).as("__sd"))
    val a = (col("n").cast(dec) * col("n").cast(dec) * col("n").cast(dec) -
      col("n").cast(dec)).cast(dec)
    joined
      .join(tieSum(rx).withColumnRenamed("__tt", "__tx"), Seq("__g"))
      .join(tieSum(ry).withColumnRenamed("__tt", "__ty"), Seq("__g"))
      .select(col("__g").as("group_key"), col("n"), {
        val ax = (a - col("__tx")).cast(dec)
        val ay = (a - col("__ty")).cast(dec)
        when(ax > 0 && ay > 0, Readout.pin(
          (ax + ay - lit(3).cast(dec) * col("__sd")).cast("double") /
            (lit(2.0) * sqrt(ax.cast("double") * ay.cast("double"))), 6))
          .as("rho")
      })
      .orderBy("group_key")
  }

  /** Tie-corrected ROC AUC per group — the rank-sum identity
    * AUC = (R⁺ − n⁺(n⁺+1)/2) / (n⁺·n⁻) with midrank ties, i.e. the
    * probability a random positive outscores a random negative
    * (ties count ½). This is the standard readout for a model-based
    * quality filter: score every document, label a held-out slice,
    * and gate the filter's threshold on its AUC per segment.
    *
    * Determinism contract: the [[mannWhitney]] grid discipline —
    * doubled rank sums 2R⁺ = Σ_v n⁺_v·(2·below_v + t_v + 1) are exact
    * integers in decimal(38,0)/hugeint; AUC is ONE double division of
    * exact integers rounded to 6dp, and the Gini coefficient derives
    * from the ROUNDED AUC (2·auc − 1, re-rounded). A group missing
    * either class reports NULL.
    *
    * Scale shape: one (group, score) grid aggregate (map-side
    * partials — the grid is measurement-resolution-sized, not
    * data-sized), a GROUP-PARTITIONED cumulative window over the
    * grid, one group aggregate. No data-sized shuffle beyond the
    * grid build; no global sort. Returns one row per group:
    * `(group..., n_pos, n_neg, auc, gini)`. */
  def auc(
      df: DataFrame,
      positive: Column,
      scoreCol: String,
      groupCols: Seq[String]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(groupCols.nonEmpty, "need at least one group column")
    val dec = "decimal(38,0)"
    val grid = df
      .filter(col(scoreCol).isNotNull)
      .groupBy(groupCols.map(col) :+ col(scoreCol).as("__v"): _*)
      .agg(
        sum(when(positive, 1L).otherwise(0L)).as("__np"),
        sum(when(positive, 0L).otherwise(1L)).as("__nn"))
    val w = Window.partitionBy(groupCols.map(col): _*).orderBy("__v")
      .rowsBetween(Window.unboundedPreceding, -1)
    val agg = grid
      .withColumn("__below",
        coalesce(sum(col("__np") + col("__nn")).over(w), lit(0L)))
      .groupBy(groupCols.map(col): _*)
      .agg(
        sum("__np").as("n_pos"),
        sum("__nn").as("n_neg"),
        sum(col("__np").cast(dec) *
          (lit(2L) * col("__below") + col("__np") + col("__nn") +
            lit(1L)).cast(dec)).as("__r2"))
    val np = col("n_pos")
    val nn = col("n_neg")
    val num = (col("__r2") -
      np.cast(dec) * (np.cast(dec) + lit(1L).cast(dec))).cast("double")
    // NULL-guarded denominator (never a bare /0 — ANSI throws and
    // codegen CSE can hoist the division past the outer when)
    val den = when(np > 0L && nn > 0L,
      (lit(2L).cast(dec) * np.cast(dec) * nn.cast(dec)).cast("double"))
    agg
      .withColumn("auc", round(num / den, 6))
      .withColumn("gini",
        when(col("auc").isNotNull, Readout.pin(lit(2.0) * col("auc") - 1.0, 6)))
      .select(groupCols.map(col) ++
        Seq(np, nn, col("auc"), col("gini")): _*)
      .orderBy(groupCols.map(col): _*)
  }

  /** Brier score with Murphy's (1973) decomposition — calibration
    * quality of a probabilistic classifier, binned reliability-diagram
    * style: Brier = REL − RES + UNC where over `bins` equi-width
    * probability bins
    *
    *   REL = Σ_k n_k·(ō_k − p̄_k)² / N   (calibration error),
    *   RES = Σ_k n_k·(ō_k − ō)² / N     (discrimination),
    *   UNC = ō·(1 − ō)                  (base-rate entropy),
    *
    * plus the direct Brier mean Σ(p − o)²/N as the cross-check the
    * identity only approximately satisfies once binned. The gate a
    * model-based quality filter needs beside [[auc]]: AUC ranks,
    * Brier/REL says whether the probabilities themselves are usable
    * as sampling weights.
    *
    * Determinism contract: per-row addends (p, p², (p−o)²) round to
    * 8dp and sum as DECIMAL; per-bin means ō_k, p̄_k round to 6dp
    * BEFORE the cross-bin terms (bin order differs between engines);
    * the per-bin terms n_k·(diff)² round to 8dp and sum as DECIMAL;
    * every readout is a fixed-order double expression of those.
    * Denominators are NULL-guarded (empty input → NULL row, not an
    * ANSI divide error).
    *
    * Scale shape: one row-level projection (bin id = ⌊p·bins⌋), one
    * bins-sized aggregate with map-side partials, one 1-row readout
    * off the broadcast bin frame — no data-sized shuffle at all.
    * Returns ONE row
    * `(n, n_pos, o_rate, brier, reliability, resolution,
    * uncertainty)`. */
  def brierDecomposition(
      df: DataFrame,
      positive: Column,
      probCol: String,
      bins: Int = 10): DataFrame = {
    require(bins >= 2 && bins <= 10000, "bins in [2, 10000]")
    val p = col(probCol).cast("double")
    val o = when(positive, 1.0).otherwise(0.0)
    val dec8 = (c: Column) => round(c, 8).cast("decimal(28,8)")
    val binned = df
      .filter(p.isNotNull)
      // the guard must ride the USED bin column or pruning drops it
      // (the qualitySurvivors coalesce-to-0 idiom)
      .withColumn("__bin",
        least(floor(p * bins).cast("long"), lit(bins - 1L)) +
          coalesce(when(p < 0.0 || p > 1.0, raise_error(
            lit(s"brierDecomposition: $probCol outside [0, 1]")))
            .cast("long"), lit(0L)))
      .select(col("__bin"), dec8(p).as("__p"),
        when(positive, 1L).otherwise(0L).as("__o"),
        dec8((p - o) * (p - o)).as("__sq"))
    val perBin = binned.groupBy("__bin").agg(
      count(lit(1)).as("__nk"),
      sum("__p").as("__sp"),
      sum("__o").as("__ok"),
      sum("__sq").as("__ssq"))
    val nkD = when(col("__nk") > 0L, col("__nk").cast("double"))
    val pbar = round(col("__sp").cast("double") / nkD, 6)
    val obar = round(col("__ok").cast("double") / nkD, 6)
    val totals = perBin
      .select(col("__nk"), col("__ok"), col("__ssq"),
        pbar.as("__pb"), obar.as("__ob"))
      .agg(sum("__nk").as("n"), sum("__ok").as("n_pos"),
        sum("__ssq").as("__ssqt"),
        collect_list(struct(col("__nk"), col("__pb"), col("__ob")))
          .as("__cells"))
    // global base rate from exact totals, rounded once
    val nD = when(col("n") > 0L, col("n").cast("double"))
    val orate = round(col("n_pos").cast("double") / nD, 6)
    // re-explode the ≤bins cells against the 1-row totals frame so the
    // cross-bin terms see the ROUNDED global rate (no second job)
    totals
      .withColumn("o_rate", orate)
      .select(col("n"), col("n_pos"), col("o_rate"), col("__ssqt"),
        explode_outer(col("__cells")).as("__c"))
      .select(col("n"), col("n_pos"), col("o_rate"), col("__ssqt"),
        col("__c.__nk").as("__nk"), col("__c.__pb").as("__pb"),
        col("__c.__ob").as("__ob"))
      .groupBy("n", "n_pos", "o_rate", "__ssqt")
      .agg(
        sum(dec8(col("__nk").cast("double") *
          (col("__ob") - col("__pb")) * (col("__ob") - col("__pb"))))
          .as("__rel"),
        sum(dec8(col("__nk").cast("double") *
          (col("__ob") - col("o_rate")) * (col("__ob") - col("o_rate"))))
          .as("__res"))
      .select(col("n"), col("n_pos"), col("o_rate"),
        round(col("__ssqt").cast("double") / nD, 6).as("brier"),
        round(col("__rel").cast("double") / nD, 6).as("reliability"),
        round(col("__res").cast("double") / nD, 6).as("resolution"),
        when(col("o_rate").isNotNull,
          round(col("o_rate") * (lit(1.0) - col("o_rate")), 6))
          .as("uncertainty"))
  }

  /** Integer thresholds ⌊CDF_Poisson(1)(k)·2³²⌋ for k = 0..maxK —
    * DRIVER-computed once (the bhSelect literal discipline) so the
    * data path of [[poissonBootstrap]] compares the 32-bit md5 hash
    * against shared integer literals: no float appears anywhere in
    * either engine's row path. */
  private[graft] def poissonThresholds(maxK: Int = 8): Seq[Long] = {
    val e1 = math.exp(-1.0)
    var fact = 1.0
    var cdf = 0.0
    (0 to maxK).map { k =>
      if (k > 0) fact *= k
      cdf += e1 / fact
      math.floor(cdf * 4294967296.0).toLong
    }
  }

  /** The weight CASE for [[poissonBootstrap]]'s generated oracle:
    * given a column expression holding the 32-bit hash, emit the
    * SAME threshold literals the Spark plan embeds. */
  private[graft] def poissonWeightCaseSql(hCol: String): String = {
    val whens = poissonThresholds().zipWithIndex
      .map { case (t, k) => s"WHEN $hCol < $t THEN $k" }.mkString(" ")
    s"(CASE $whens ELSE 9 END)::bigint"
  }

  /** Poisson bootstrap confidence intervals (Chamandy et al., Google
    * 2012 — "Estimating uncertainty for massive data streams"): the
    * ONLY bootstrap that works at cluster scale, because resampling
    * n-out-of-n is replaced by an independent Poisson(1) weight per
    * (row, replicate) — one pass, no resampling shuffle, map-side
    * partial aggregation all the way down. Reports each group's mean
    * with percentile CI bounds and the bootstrap SE over B replicate
    * means.
    *
    * Determinism contract: the row path is ENTIRELY integer — the
    * uniform is the first-8-hex md5 integer of `id:replicate` (the
    * dq22 portable-signature discipline), the Poisson(1) inverse-CDF
    * comparison uses driver-computed ⌊cdf·2³²⌋ literals embedded in
    * both plans ([[poissonThresholds]]), values ride as exact 4dp
    * micro-units, replicate means are micro-unit FLOOR divisions
    * (exact integers — never a rounded double: the aq59 lesson), CI
    * bounds are order statistics at integer ranks
    * ⌊q·(m−1)⌋+1, and every readout is one fixed-order double
    * expression of exact integers. Weight-starved replicates (total
    * weight 0) drop out of the rank frame.
    *
    * `idCol` must be NON-NULL: the kernel returns a NULL weight
    * vector for a null id and `posexplode` then drops the row from
    * the replicate frame, while the generated oracle's CASE keeps it
    * at weight 9 (`ELSE 9` — the old md5-chain's null fallthrough).
    * No registered caller feeds nullable ids; a new caller with
    * nullable ids must pre-filter or pre-coalesce them explicitly on
    * BOTH sides.
    *
    * Scale shape: explode ×B feeds ONE (group, replicate) aggregate
    * with map-side partials (shuffle rows = |groups|·B per map
    * partition, never data-sized), group-partitioned rank windows
    * over B-row frames, and a |groups|-row broadcast join against
    * the exact totals. Returns one row per group:
    * `(group..., n, n_reps, mean, boot_lo, boot_hi, boot_se)`. */
  def poissonBootstrap(
      df: DataFrame,
      idCol: String,
      valueCol: String,
      groupCols: Seq[String],
      replicates: Int = 64): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(groupCols.nonEmpty, "need at least one group column")
    require(replicates >= 8 && replicates <= 256,
      "replicates in [8, 256] — B beyond ~100 buys almost nothing")
    val dec = "decimal(38,0)"
    // Spread with the replicate fan-out as weight: the ×B explode and
    // its per-(row, replicate) md5 draw otherwise run inside a possibly
    // single-task scan stage — measured 6.2 s of single-core compute on
    // the sf0.1 bench at local[32] (guide §2.5; see Spread)
    val base = Spread(df, replicates.toDouble, col(idCol))
      .filter(col(valueCol).isNotNull)
      .select(groupCols.map(col) :+
        col(idCol).cast("string").as("__id") :+
        (round(col(valueCol), 4).cast("decimal(18,4)") * 10000)
          .cast("long").as("__vu"): _*)
    // the per-(row, replicate) draw runs as ONE compiled pass per row
    // (StatKernelExpressions.PoissonWeights — digest and buffer reused
    // across all B replicates, no hex round-trip), bit-identical to
    // the previous conv(substring(md5(...),1,8),16,10)-vs-thresholds
    // chain it replaced; posexplode's pos IS the replicate index
    val rep = base
      .select(groupCols.map(col) :+ col("__vu") :+
        posexplode(graft.functions.StatKernelExpressions.poisson_weights(
          col("__id"), replicates, poissonThresholds()))
          .as(Seq("__b", "__w")): _*)
      .groupBy(groupCols.map(col) :+ col("__b"): _*)
      .agg(sum(col("__w")).as("__wn"),
        sum((col("__w") * col("__vu")).cast(dec)).as("__wsv"))
      .withColumn("__rm",
        when(col("__wn") > 0L, expr("(__wsv * 100) div __wn")))
    val wP = Window.partitionBy(groupCols.map(col): _*)
    val ranked = rep
      .filter(col("__rm").isNotNull)
      .withColumn("__i",
        row_number().over(wP.orderBy(col("__rm"), col("__b"))))
      .withColumn("__m", count(lit(1)).over(wP))
      .withColumn("__loi", expr("(25 * (__m - 1)) div 1000 + 1"))
      .withColumn("__hii", expr("(975 * (__m - 1)) div 1000 + 1"))
    val ci = ranked
      .groupBy(groupCols.map(col): _*)
      .agg(
        count(lit(1)).as("n_reps"),
        max(when(col("__i") === col("__loi"), col("__rm"))).as("__rml"),
        max(when(col("__i") === col("__hii"), col("__rm"))).as("__rmh"),
        sum(col("__rm").cast(dec)).as("__srm"),
        sum((col("__rm").cast(dec) * col("__rm").cast(dec))).as("__srm2"),
        max(col("__m")).as("__mm"))
    val totals = base
      .groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("n"), sum(col("__vu").cast(dec)).as("__svu"))
    val m = col("__mm").cast(dec)
    val varNum = (m * col("__srm2") - col("__srm") * col("__srm"))
      .cast("double")
    val varDen = when(col("__mm") >= 2L,
      (m * (col("__mm") - 1).cast(dec)).cast("double"))
    totals
      .join(broadcast(ci), groupCols)
      .withColumn("mean",
        expr("(__svu * 100) div n").cast("double") / 1000000.0)
      .withColumn("boot_lo", col("__rml").cast("double") / 1000000.0)
      .withColumn("boot_hi", col("__rmh").cast("double") / 1000000.0)
      .withColumn("boot_se",
        round(sqrt(varNum / varDen) / 1000000.0, 8))
      .select(groupCols.map(col) ++ Seq(col("n"), col("n_reps"),
        col("mean"), col("boot_lo"), col("boot_hi"), col("boot_se")): _*)
      .orderBy(groupCols.map(col): _*)
  }

  /** Difference-in-differences (Card & Krueger 1994 lineage) — the
    * quasi-experimental readout when assignment wasn't randomized:
    * compare the treated group's pre→post change against the control
    * group's,
    *
    *   DiD = (m_T,post − m_T,pre) − (m_C,post − m_C,pre),
    *
    * with the repeated-cross-section SE √(Σ_cells s²_c/n_c) and its
    * z. The parallel-trends companion to [[abTest]]/[[cuped]].
    *
    * Determinism contract: the [[abTest]] discipline across the four
    * cells — Σv exact DECIMAL(18,4), Σv² exact decimal sums of
    * 8dp-rounded squares, cell means 6dp-rounded with DiD composed
    * from the ROUNDED means in one fixed order; variances use the
    * raw-ratio means; denominators NULL-guarded; any cell under 2
    * observations yields NULL se/z (the DiD itself needs only
    * non-empty cells). ONE conditional aggregate, one-row output:
    * `(n_t_pre, n_t_post, n_c_pre, n_c_post, mean_t_pre, mean_t_post,
    * mean_c_pre, mean_c_post, did, se, z)`. */
  def did(
      df: DataFrame,
      metricCol: String,
      treated: Column,
      post: Column): DataFrame = {
    val v = col(metricCol)
    val vDec = v.cast("decimal(18,4)")
    val vSq = round(v * v, 8).cast("decimal(28,8)")
    val cells = Seq(
      "t_pre" -> (treated && !post), "t_post" -> (treated && post),
      "c_pre" -> (!treated && !post), "c_post" -> (!treated && post))
    val aggs = cells.flatMap { case (s, p) =>
      Seq(count(when(p, v)).as(s"n_$s"),
        sum(when(p, vDec)).as(s"__sv_$s"),
        sum(when(p, vSq)).as(s"__ss_$s"))
    }
    val agg = df.agg(aggs.head, aggs.tail: _*)
    def n(s: String) = col(s"n_$s")
    // NULL-guarded raw-ratio mean (the CSE-hoist rule: guard the
    // denominator itself, never just the surrounding when)
    def mr(s: String) =
      col(s"__sv_$s").cast("double") / when(n(s) > 0L, n(s))
    def m6(s: String) = Readout.pin(mr(s), 6)
    def vr(s: String) =
      (col(s"__ss_$s").cast("double") - n(s) * mr(s) * mr(s)) /
        when(n(s) >= 2L, n(s) - 1)
    val didc = Readout.pin((m6("t_post") - m6("t_pre")) -
      (m6("c_post") - m6("c_pre")), 6)
    val seSq = vr("t_post") / n("t_post") + vr("t_pre") / n("t_pre") +
      vr("c_post") / n("c_post") + vr("c_pre") / n("c_pre")
    agg.select(
      n("t_pre"), n("t_post"), n("c_pre"), n("c_post"),
      m6("t_pre").as("mean_t_pre"), m6("t_post").as("mean_t_post"),
      m6("c_pre").as("mean_c_pre"), m6("c_post").as("mean_c_post"),
      didc.as("did"),
      round(sqrt(seSq), 6).as("se"),
      Readout.pin(didc / when(sqrt(seSq) > 0.0, sqrt(seSq)), 4).as("z"))
  }

  /** Φ⁻¹(1−α/2) + Φ⁻¹(power) — the two-sided z-sum for
    * [[mdeAnalysis]], DRIVER-computed ([[invNorm]]) and embedded as
    * the SAME literal in the Spark plan and the generated oracle. */
  private[graft] def mdeZSum(alpha: Double, power: Double): Double =
    invNorm(1.0 - alpha / 2.0) + invNorm(power)

  /** Power / minimum-detectable-effect analysis per metric group —
    * the question every experiment review asks BEFORE shipping a
    * test: with this traffic and variance, what's the smallest lift
    * we could even see? And how many units per arm would the target
    * effect need?
    *
    *   MDE = (z_{1−α/2} + z_{power})·√(s²_A/n_A + s²_B/n_B),
    *   n_req = ⌈(z_{1−α/2} + z_{power})²·(s²_A + s²_B)/Δ²⌉.
    *
    * The experimentation-suite closer beside [[abTest]] (the readout),
    * [[cuped]] (sensitivity), [[did]] (quasi-experiments),
    * [[bhSelect]] (multiplicity) and [[poissonBootstrap]]
    * (uncertainty).
    *
    * Determinism contract: the z-sum is ONE driver literal
    * ([[mdeZSum]], Acklam — no erf/exp in any engine); variances come
    * from the abTest exact-decimal sufficient statistics; every
    * readout is a fixed-order double expression rounded at 6dp
    * (n_req: ceil to a long); denominators NULL-guarded (thin arms,
    * non-positive pooled mean). Returns one row per group:
    * `(group..., n_a, n_b, mean_a, mean_b, se, mde_abs, mde_rel,
    * n_required)`. */
  def mdeAnalysis(
      df: DataFrame,
      metricCol: String,
      armA: Column,
      groupCols: Seq[String],
      alpha: Double = 0.05,
      power: Double = 0.8,
      targetEffect: Double = 1.0): DataFrame = {
    require(groupCols.nonEmpty, "need at least one group column")
    require(targetEffect > 0.0, "targetEffect must be positive")
    val zSum = mdeZSum(alpha, power)
    val v = col(metricCol)
    val dec = v.cast("decimal(18,4)")
    val sq = round(v * v, 8).cast("decimal(28,8)")
    val agg = df.groupBy(groupCols.map(col): _*)
      .agg(
        count(when(armA, v)).as("n_a"),
        count(when(!armA, v)).as("n_b"),
        sum(when(armA, dec)).as("__sv_a"),
        sum(when(!armA, dec)).as("__sv_b"),
        sum(when(armA, sq)).as("__ss_a"),
        sum(when(!armA, sq)).as("__ss_b"))
    val (na, nb) = (col("n_a"), col("n_b"))
    val ma = col("__sv_a").cast("double") / when(na > 0L, na)
    val mb = col("__sv_b").cast("double") / when(nb > 0L, nb)
    val va = (col("__ss_a").cast("double") - na * ma * ma) /
      when(na >= 2L, na - 1)
    val vb = (col("__ss_b").cast("double") - nb * mb * mb) /
      when(nb >= 2L, nb - 1)
    val se = sqrt(va / na + vb / nb)
    val mp = (col("__sv_a") + col("__sv_b")).cast("double") /
      when(na + nb > 0L, na + nb)
    agg.select(groupCols.map(col) ++ Seq(
      na, nb,
      Readout.pin(ma, 6).as("mean_a"),
      Readout.pin(mb, 6).as("mean_b"),
      round(se, 6).as("se"),
      round(lit(zSum) * se, 6).as("mde_abs"),
      Readout.pin(lit(zSum) * se / when(mp > 0.0, mp), 6).as("mde_rel"),
      ceil(lit(zSum) * lit(zSum) * (va + vb) /
        lit(targetEffect * targetEffect)).cast("long")
        .as("n_required")): _*)
      .orderBy(groupCols.map(col): _*)
  }

  /** Trimmed and winsorized means per group — the robust location
    * estimates every metrics pipeline wants once the tail is heavy
    * (a single whale inflates the mean; the 10%-trimmed mean ignores
    * it, the winsorized mean clamps it to the cut values — Tukey's
    * recommendations, cf. [[tukeyOutliers]] which only REPORTS the
    * tail).
    *
    * Trim convention: k = ⌊trim·n⌋ observations drop from EACH end
    * (rank order, ties by value); winsorizing replaces them with the
    * order statistics at ranks k+1 and n−k.
    *
    * Determinism contract: NO float touches the cut decision — the
    * value grid's cumulative counts give every row an exact rank
    * interval [below+1, below+c]; k = (⌊trim·1000⌉·n) div 1000 is
    * integer; the kept copies per value are an integer interval
    * intersection; cut values are the rows whose interval covers
    * ranks k+1 / n−k (located by integer comparison, ONE row each);
    * sums ride micro-unit integers in decimal(38,0)/hugeint and the
    * means are floor divisions read out as /10⁶ doubles (the aq84
    * discipline).
    *
    * Scale shape: the Mann–Whitney grid shape — one (group, value)
    * aggregate (map-side partials), a GROUP-PARTITIONED cumulative
    * window over the measurement grid, a |groups|-row broadcast
    * totals join, one group aggregate. Returns one row per group:
    * `(group..., n, k_trim, mean, trimmed_mean, winsorized_mean)`. */
  def robustMeans(
      df: DataFrame,
      metricCol: String,
      groupCols: Seq[String],
      trim: Double = 0.1): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(groupCols.nonEmpty, "need at least one group column")
    val tp = math.round(trim * 1000.0)
    require(tp >= 1 && tp < 500, "trim in (0.001, 0.5)")
    val dec = "decimal(38,0)"
    val grid = df
      .filter(col(metricCol).isNotNull)
      .select(groupCols.map(col) :+
        (round(col(metricCol), 4).cast("decimal(18,4)") * 10000)
          .cast("long").as("__vu"): _*)
      .groupBy(groupCols.map(col) :+ col("__vu"): _*)
      .agg(count(lit(1)).as("__c"))
    val w = Window.partitionBy(groupCols.map(col): _*).orderBy("__vu")
      .rowsBetween(Window.unboundedPreceding, -1)
    val totals = broadcast(grid
      .groupBy(groupCols.map(col): _*)
      .agg(sum("__c").as("n"))
      .withColumn("__k", expr(s"($tp * n) div 1000")))
    val rows = grid
      .withColumn("__below", coalesce(sum(col("__c")).over(w), lit(0L)))
      .join(totals, groupCols)
    val kept = greatest(
      least(col("__below") + col("__c"), col("n") - col("__k")) -
        greatest(col("__below"), col("__k")), lit(0L))
    val agg = rows.groupBy(groupCols.map(col): _*).agg(
      first(col("n")).as("n"),
      first(col("__k")).as("k_trim"),
      sum(col("__c").cast(dec) * col("__vu").cast(dec)).as("__svu"),
      sum(kept.cast(dec) * col("__vu").cast(dec)).as("__ksum"),
      max(when(col("__below") <= col("__k") &&
        col("__below") + col("__c") > col("__k"), col("__vu")))
        .as("__vlo"),
      max(when(col("__below") <= col("n") - col("__k") - 1 &&
        col("__below") + col("__c") >= col("n") - col("__k"),
        col("__vu"))).as("__vhi"))
    val k = col("k_trim").cast(dec)
    agg
      .withColumn("__ws", col("__ksum") + k * col("__vlo").cast(dec) +
        k * col("__vhi").cast(dec))
      .select(groupCols.map(col) ++ Seq(
        col("n"), col("k_trim"),
        (expr("(__svu * 100) div n").cast("double") / 1000000.0)
          .as("mean"),
        (expr("(__ksum * 100) div (n - 2 * k_trim)").cast("double") /
          1000000.0).as("trimmed_mean"),
        (expr("(__ws * 100) div n").cast("double") / 1000000.0)
          .as("winsorized_mean")): _*)
      .orderBy(groupCols.map(col): _*)
  }

  /** Mutual information between two categorical columns, with the
    * marginal entropies and the normalized MI
    * (NMI = I/√(H(X)·H(Y)), Strehl & Ghosh 2002) — the
    * feature-selection / redundancy readout: how much does knowing X
    * tell you about Y? NMI ≈ 1 flags a feature pair carrying the same
    * signal (drop one); MI against the label ranks features.
    *
    *   I(X;Y) = Σ_xy (n_xy/N)·ln(n_xy·N/(n_x·n_y)),
    *   H(X) = Σ_x (n_x/N)·ln(N/n_x).
    *
    * Determinism contract: the KL/JSD discipline — every addend is a
    * fixed-order double expression of exact integer counts rounded to
    * 10dp and summed as DECIMAL (cell order differs between engines);
    * readouts round to 6dp; NMI derives from the ROUNDED I, H(X),
    * H(Y) with a NULL-guarded denominator (a constant column has
    * H = 0 → NULL NMI).
    *
    * Scale shape: ONE (x, y) contingency aggregate (map-side
    * partials, |X|·|Y|-cell-sized), margins re-aggregated FROM the
    * cell frame (never a second data pass — the cell frame is
    * lineage-cut), broadcast margin joins, three 1-row readouts
    * crossed at the end. Returns ONE row
    * `(n, k_x, k_y, h_x, h_y, mi_nats, nmi)`. */
  def mutualInformation(
      df: DataFrame,
      xCol: String,
      yCol: String): DataFrame = {
    val dec10 = (c: Column) => round(c, 10).cast("decimal(28,10)")
    val cells = Lineage.cutLocal(
      df.filter(col(xCol).isNotNull && col(yCol).isNotNull)
        .groupBy(col(xCol).as("__x"), col(yCol).as("__y"))
        .agg(count(lit(1)).as("__nxy")))
    val mx = Lineage.cutLocal(
      cells.groupBy("__x").agg(sum("__nxy").as("__nx")))
    val my = Lineage.cutLocal(
      cells.groupBy("__y").agg(sum("__nxy").as("__ny")))
    val nF = broadcast(cells.agg(sum("__nxy").as("__n")))
    def entropy(m: DataFrame, cnt: String, out: String) =
      m.crossJoin(nF)
        .select(dec10((col(cnt).cast("double") / col("__n")) *
          log(col("__n").cast("double") / col(cnt))).as("__t"))
        .agg(Readout.pin(sum(col("__t")).cast("double"), 6).as(out))
    val miF = cells
      .join(broadcast(mx), Seq("__x"))
      .join(broadcast(my), Seq("__y"))
      .crossJoin(nF)
      .select(dec10((col("__nxy").cast("double") / col("__n")) *
        log((col("__nxy").cast("double") * col("__n")) /
          (col("__nx").cast("double") * col("__ny")))).as("__t"))
      .agg(Readout.pin(sum(col("__t")).cast("double"), 6).as("mi_nats"))
    val kF = cells.agg(
      sum("__nxy").as("n"),
      count_distinct(col("__x")).as("k_x"),
      count_distinct(col("__y")).as("k_y"))
    kF.crossJoin(broadcast(entropy(mx, "__nx", "h_x")))
      .crossJoin(broadcast(entropy(my, "__ny", "h_y")))
      .crossJoin(broadcast(miF))
      .withColumn("nmi", Readout.pin(col("mi_nats") /
        when(sqrt(col("h_x") * col("h_y")) > 0.0,
          sqrt(col("h_x") * col("h_y"))), 6))
      .select("n", "k_x", "k_y", "h_x", "h_y", "mi_nats", "nmi")
  }

  /** Cohen's d / Hedges' g standardized effect size per group — the
    * magnitude readout that [[abTest]]'s z deliberately is not (a z
    * says "real"; d says "big enough to care about" — at 100 TB every
    * difference is significant and ONLY effect size ranks launches):
    *
    *   d = (m₁ − m₂) / s_pooled,
    *   s²_pooled = ((n₁−1)s₁² + (n₂−1)s₂²) / (n₁+n₂−2),
    *   g = d·(1 − 3/(4(n₁+n₂) − 9))   (the small-sample bias factor).
    *
    * Determinism contract: the abTest exact-decimal sufficient
    * statistics (Σv as decimal(18,4), Σv² rounded to 8dp
    * decimal(28,8)); means, variances, d and g are fixed-order double
    * expressions rounded to 6dp. Arms under 2 observations or zero
    * pooled variance report NULL d and g.
    *
    * Scale shape: ONE conditional aggregate over the group keys with
    * map-side partials (the abTest shape). Returns one row per group:
    * `(group..., n_a, n_b, mean_a, mean_b, cohens_d, hedges_g)`. */
  def effectSize(
      df: DataFrame,
      metricCol: String,
      armA: Column,
      groupCols: Seq[String]): DataFrame = {
    require(groupCols.nonEmpty, "need at least one group column")
    val v = col(metricCol)
    val dec = v.cast("decimal(18,4)")
    val sq = round(v * v, 8).cast("decimal(28,8)")
    val agg = df.groupBy(groupCols.map(col): _*)
      .agg(
        count(when(armA, v)).as("n_a"),
        count(when(!armA, v)).as("n_b"),
        sum(when(armA, dec)).as("__sv_a"),
        sum(when(!armA, dec)).as("__sv_b"),
        sum(when(armA, sq)).as("__ss_a"),
        sum(when(!armA, sq)).as("__ss_b"))
    val (na, nb) = (col("n_a").cast("double"), col("n_b").cast("double"))
    // means show for ANY non-empty arm (abTest parity); only the
    // variances need n >= 2 — both denominators NULL-guarded at the
    // source (the cuped CSE lesson)
    val ma = col("__sv_a").cast("double") / when(col("n_a") > 0L, na)
    val mb = col("__sv_b").cast("double") / when(col("n_b") > 0L, nb)
    val (naS, nbS) = (when(col("n_a") >= 2L, na), when(col("n_b") >= 2L, nb))
    val va = (col("__ss_a").cast("double") - na * ma * ma) / (naS - 1.0)
    val vb = (col("__ss_b").cast("double") - nb * mb * mb) / (nbS - 1.0)
    val sp2 = ((na - 1.0) * va + (nb - 1.0) * vb) / (na + nb - 2.0)
    val d = (ma - mb) / sqrt(when(sp2 > 0.0, sp2))
    val corr = lit(1.0) - lit(3.0) / (lit(4.0) * (na + nb) - 9.0)
    agg.select(
      groupCols.map(col) ++ Seq(
        col("n_a"), col("n_b"),
        Readout.pin(ma, 6).as("mean_a"),
        Readout.pin(mb, 6).as("mean_b"),
        Readout.pin(d, 6).as("cohens_d"),
        Readout.pin(d * corr, 6).as("hedges_g")): _*)
      .orderBy(groupCols.map(col): _*)
  }

  /** Two-proportion z-test with Yates continuity correction — the
    * conversion-rate comparison that [[abTest]]'s Welch z is NOT
    * (Welch treats the metric as continuous; a 0/1 conversion wants
    * the pooled-proportion variance), per group:
    *
    *   z  = (p₁ − p₂) / √(p̂(1−p̂)(1/n₁ + 1/n₂)),   p̂ pooled,
    *   z_c = the same with |p₁ − p₂| reduced by (1/2n₁ + 1/2n₂),
    *         floored at 0, sign restored.
    *
    * Determinism contract: conversion counts are exact integers; the
    * proportions and both z's are fixed-order double expressions of
    * them (p's rounded to 6dp for the readout, z's computed from the
    * RAW ratios and rounded to 4dp). Groups with an empty arm or a
    * degenerate pooled variance (p̂ ∈ {0, 1}) report NULL z.
    *
    * Scale shape: ONE conditional aggregate over the group keys with
    * map-side partials — the abTest shape on 0/1 outcomes. Returns one
    * row per group:
    * `(group..., n_a, n_b, conv_a, conv_b, p_a, p_b, z, z_corrected)`. */
  def twoProportion(
      df: DataFrame,
      converted: Column,
      armA: Column,
      groupCols: Seq[String]): DataFrame = {
    require(groupCols.nonEmpty, "need at least one group column")
    val agg = df.groupBy(groupCols.map(col): _*)
      .agg(
        sum(when(armA, 1L).otherwise(0L)).as("n_a"),
        sum(when(!armA, 1L).otherwise(0L)).as("n_b"),
        sum(when(armA && converted, 1L).otherwise(0L)).as("conv_a"),
        sum(when(!armA && converted, 1L).otherwise(0L)).as("conv_b"))
    val (na, nb) = (col("n_a").cast("double"), col("n_b").cast("double"))
    // empty arms NULL the denominators at the source (the cuped CSE
    // lesson: a hoisted division must not see a zero)
    val (naS, nbS) = (when(col("n_a") > 0L, na), when(col("n_b") > 0L, nb))
    val p1 = col("conv_a").cast("double") / naS
    val p2 = col("conv_b").cast("double") / nbS
    val pp = (col("conv_a") + col("conv_b")).cast("double") /
      when(col("n_a") + col("n_b") > 0L, na + nb)
    val se2 = pp * (lit(1.0) - pp) * (lit(1.0) / naS + lit(1.0) / nbS)
    val se = sqrt(when(se2 > 0.0, se2))
    val cc = lit(0.5) / naS + lit(0.5) / nbS
    val dAbs = greatest(abs(p1 - p2) - cc, lit(0.0))
    val sign = when(p1 >= p2, lit(1.0)).otherwise(lit(-1.0))
    agg.select(
      groupCols.map(col) ++ Seq(
        col("n_a"), col("n_b"), col("conv_a"), col("conv_b"),
        round(p1, 6).as("p_a"), round(p2, 6).as("p_b"),
        Readout.pin((p1 - p2) / se, 4).as("z"),
        Readout.pin(sign * dAbs / se, 4).as("z_corrected")): _*)
      .orderBy(groupCols.map(col): _*)
  }

  /** Cochran–Mantel–Haenszel test (Cochran 1954; Mantel & Haenszel
    * 1959) — the stratified 2×2 association test: does exposure move
    * the outcome AFTER pooling across strata, weighting each stratum
    * by its own size? This is the Simpson's-paradox-proof readout an
    * experiment platform needs whenever a simple pooled 2×2 would mix
    * strata with different base rates (arm × purchase pooled across
    * day-of-week, filter × pass-rate across sources):
    *
    *   χ²_CMH = (|Σ_k (a_k − E_k)| − ½)² / Σ_k V_k   (continuity-corr.),
    *   E_k = r1·c1/n,   V_k = r1·r0·c1·c0 / (n²(n−1)),
    *   OR_MH = Σ_k(a_k·d_k/n_k) / Σ_k(b_k·c_k/n_k)   (pooled odds ratio).
    *
    * Determinism contract: the 2×2 cells are exact integers; each
    * stratum's deviation, variance, and OR terms are fixed-order
    * double expressions rounded to 10dp and summed as DECIMAL
    * (stratum order differs between engines — the tq8 discipline);
    * the readouts are fixed-order doubles of those exact sums rounded
    * to 6dp. Strata with n < 2 (V undefined) are excluded; χ² is NULL
    * when ΣV = 0, OR_MH NULL when its denominator is 0; the squared
    * deviation is floored at 0 (|Σdev| < ½ under the correction).
    *
    * Scale shape: ONE conditional aggregate over the stratum key
    * (map-side partials, dimension-sized output), then a strata-sized
    * readout — nothing data-sized past the first aggregate. Returns
    * ONE row `(n_strata, n, chi2_cmh, or_mh)`. */
  def cmhTest(
      df: DataFrame,
      stratumCol: String,
      exposed: Column,
      outcome: Column): DataFrame = {
    val cells = df.filter(col(stratumCol).isNotNull)
      .groupBy(col(stratumCol).as("__s"))
      .agg(
        sum(when(exposed && outcome, 1L).otherwise(0L)).as("a"),
        sum(when(exposed && !outcome, 1L).otherwise(0L)).as("b"),
        sum(when(!exposed && outcome, 1L).otherwise(0L)).as("c"),
        sum(when(!exposed && !outcome, 1L).otherwise(0L)).as("d"))
    val n = (col("a") + col("b") + col("c") + col("d")).cast("double")
    val r1 = (col("a") + col("b")).cast("double")
    val r0 = (col("c") + col("d")).cast("double")
    val c1 = (col("a") + col("c")).cast("double")
    val c0 = (col("b") + col("d")).cast("double")
    val dec10 = (x: Column) => round(x, 10).cast("decimal(28,10)")
    val terms = cells
      .filter(col("a") + col("b") + col("c") + col("d") >= 2L)
      .select(
        (col("a") + col("b") + col("c") + col("d")).as("__n"),
        dec10(col("a").cast("double") - r1 * c1 / n).as("__dev"),
        dec10(r1 * r0 * c1 * c0 / (n * n * (n - 1.0))).as("__v"),
        dec10(col("a").cast("double") * col("d").cast("double") / n)
          .as("__ad"),
        dec10(col("b").cast("double") * col("c").cast("double") / n)
          .as("__bc"))
    val sums = terms.agg(
      count(lit(1)).as("n_strata"),
      sum("__n").as("n"),
      sum("__dev").as("__sdev"), sum("__v").as("__sv"),
      sum("__ad").as("__sad"), sum("__bc").as("__sbc"))
    val devAbs = greatest(
      abs(col("__sdev").cast("double")) - 0.5, lit(0.0))
    sums.select(col("n_strata"), col("n"),
      when(col("__sv").cast("double") > 0.0, round(
        devAbs * devAbs / col("__sv").cast("double"), 6)).as("chi2_cmh"),
      when(col("__sbc").cast("double") > 0.0, round(
        col("__sad").cast("double") / col("__sbc").cast("double"), 6))
        .as("or_mh"))
  }

  /** Brown–Forsythe test (Brown & Forsythe 1974) — Levene's
    * variance-equality test on MEDIAN-centered deviations: are the
    * groups' spreads equal? This guards the homoscedasticity
    * assumption behind pooled comparisons (a significant F says
    * "compare these cohorts with Welch/rank machinery, not pooled
    * variance"), with the median centering making it robust to the
    * skewed metrics (revenue, latency) that break the mean-centered
    * original:
    *
    *   z_ij = |x_ij − median_j|,
    *   F = [(N−k)/(k−1)] · Σ_j n_j(z̄_j − z̄)² / Σ_j Σ_i (z_ij − z̄_j)².
    *
    * Determinism contract: medians are exact interpolated percentiles
    * (Spark `percentile` == DuckDB `quantile_cont`, the aq6
    * precedent); each deviation rounds to 6dp decimal so Σz and Σz²
    * are EXACT decimal sums (z² at scale 12 stays under the 38-digit
    * cap); the between/within terms are fixed-order doubles of those
    * exact sums rounded to 10dp decimal before the cross-group sum
    * (group order differs between engines); F is one fixed-order
    * double readout rounded to 6dp. Degenerate inputs (k < 2, N ≤ k,
    * zero within-group variation) report NULL F.
    *
    * Scale shape: one percentile aggregate per group key, a broadcast
    * |groups|-row join back for the deviations, ONE sufficient-stats
    * aggregate (map-side partials), then a groups-sized readout.
    * Returns ONE row `(k, n, f_stat)`. */
  def brownForsythe(
      df: DataFrame,
      groupCol: String,
      valueCol: String): DataFrame = {
    val rows = Lineage.cutLocal(df
      .filter(col(groupCol).isNotNull && col(valueCol).isNotNull)
      .select(col(groupCol).as("__g"),
        col(valueCol).cast("double").as("__v")))
    val med = rows.groupBy("__g")
      .agg(expr("percentile(__v, 0.5)").as("__med"))
    val z = rows.join(broadcast(med), Seq("__g"))
      .select(col("__g"),
        round(abs(col("__v") - col("__med")), 6)
          .cast("decimal(18,6)").as("__z"))
    val per = z.groupBy("__g").agg(
      count(lit(1)).as("__n"),
      sum(col("__z")).as("__sz"),
      sum((col("__z") * col("__z")).cast("decimal(38,12)")).as("__szz"))
    // NOTE: Spark resolution is case-insensitive — total-frame names
    // must not collide with the per-group names modulo case
    val tot = broadcast(per.agg(
      sum("__n").as("__nt"),
      sum("__sz").as("__szt"),
      count(lit(1)).as("__kt")))
    val dec10 = (x: Column) => round(x, 10).cast("decimal(28,10)")
    val zbar = col("__sz").cast("double") / col("__n").cast("double")
    val zbarAll = col("__szt").cast("double") / col("__nt").cast("double")
    val grouped = per.crossJoin(tot)
      .select(col("__nt"), col("__kt"),
        dec10(col("__n").cast("double") *
          (zbar - zbarAll) * (zbar - zbarAll)).as("__ssb"),
        dec10(col("__szz").cast("double") -
          col("__n").cast("double") * zbar * zbar).as("__ssw"))
      .groupBy("__nt", "__kt")
      .agg(sum("__ssb").as("__ssbt"), sum("__ssw").as("__sswt"))
    grouped.select(
      col("__kt").as("k"), col("__nt").as("n"),
      when(col("__kt") >= 2L && col("__nt") > col("__kt") &&
          col("__sswt").cast("double") > 0.0,
        round(((col("__nt") - col("__kt")).cast("double") /
          (col("__kt") - 1L).cast("double")) *
          (col("__ssbt").cast("double") / col("__sswt").cast("double")), 6))
        .as("f_stat"))
  }

  /** McNemar's test for PAIRED binary outcomes (McNemar 1947) — "did
    * the same units flip between condition X and condition Y": the
    * within-subject companion to [[twoProportion]]'s independent-arm
    * z. Only the DISCORDANT cells carry signal — b = X-only,
    * c = Y-only — and the statistic is χ² = (b−c)²/(b+c) with the
    * Edwards continuity variant (max(|b−c|−1, 0))²/(b+c). The
    * canonical retention/repeat-behavior readout ("users active early
    * but not late vs late but not early") over any paired per-unit
    * bool frame.
    *
    * Determinism contract: b and c are exact integer counts from ONE
    * conditional aggregate; both statistics are single divisions of
    * exact integers rounded to 6dp; b + c = 0 reports NULL (no
    * discordance, no test) — the guard lives in the DENOMINATOR (the
    * cuped CSE lesson).
    *
    * Scale shape: one group-keyed conditional aggregate over the
    * caller's unit frame; output is groups-sized. */
  def mcnemar(
      units: DataFrame,
      groupCols: Seq[String],
      xCol: Column,
      yCol: Column): DataFrame = {
    require(groupCols.nonEmpty, "need at least one group column")
    val agg = units.groupBy(groupCols.map(col): _*).agg(
      count(lit(1)).as("n_pairs"),
      count(when(xCol && !yCol, 1L)).as("b"),
      count(when(!xCol && yCol, 1L)).as("c"))
    val bd = col("b").cast("double")
    val cd = col("c").cast("double")
    val den = when(col("b") + col("c") > 0L, bd + cd)
    val adj = greatest(abs(bd - cd) - 1.0, lit(0.0))
    agg.select(
      groupCols.map(col) ++ Seq(
        col("n_pairs"), col("b"), col("c"),
        round((bd - cd) * (bd - cd) / den, 6).as("chi2"),
        round(adj * adj / den, 6).as("chi2_corrected")): _*)
      .orderBy(groupCols.map(col): _*)
  }

  /** Cochran–Armitage trend test (Cochran 1954, Armitage 1955) — "does
    * success probability MOVE MONOTONICALLY with an ordered dose":
    * the ordered-category refinement of [[chi2Independence]] (which
    * ignores level order). Scores are the caller's integer dose
    * levels; the statistic is
    *
    *   z = (T − p̄·S₁) / √(p̄(1−p̄)(S₂ − S₁²/N))
    *
    * with T = Σ s·[success], S₁ = Σ s, S₂ = Σ s², all EXACT BIGINT
    * sums from one conditional aggregate — no per-level frame, no
    * pivot. The classic does-quality-decay-with-bucket screen.
    *
    * Determinism contract: every sufficient statistic is an exact
    * integer; the double readout evaluates in ONE pinned order shared
    * with the oracle; degenerate variance (all same dose, or p̄ ∈
    * {0,1}) reports NULL via the denominator guard.
    *
    * Scale shape: one group-keyed aggregate; output is groups-sized. */
  def cochranArmitage(
      df: DataFrame,
      groupCols: Seq[String],
      scoreCol: Column,
      successCol: Column): DataFrame = {
    require(groupCols.nonEmpty, "need at least one group column")
    val s = scoreCol.cast("long")
    val agg = df.groupBy(groupCols.map(col): _*).agg(
      count(lit(1)).as("n"),
      count(when(successCol, 1L)).as("r"),
      sum(when(successCol, s).otherwise(lit(0L))).as("__t"),
      sum(s).as("__s1"),
      sum(s * s).as("__s2"))
    val nd = col("n").cast("double")
    val p = col("r").cast("double") / nd
    val num = col("__t").cast("double") - p * col("__s1").cast("double")
    val varr = p * (lit(1.0) - p) *
      (col("__s2").cast("double") -
        col("__s1").cast("double") * col("__s1").cast("double") / nd)
    agg.select(
      groupCols.map(col) ++ Seq(
        col("n"), col("r"),
        Readout.pin(num / sqrt(when(varr > 0.0, varr)), 6).as("z_trend")): _*)
      .orderBy(groupCols.map(col): _*)
  }

  /** Gini concentration coefficient per group — "how concentrated is
    * the value mass" (spend per priority class, tokens per source):
    *
    *   G = (2·Σᵢ i·vᵢ − (n+1)·Σᵢ vᵢ) / (n·Σᵢ vᵢ),  v ascending
    *
    * over non-negative values. The ranks come from
    * [[graft.operators.Packing.groupedRank]] — range partition +
    * local row_number + broadcast prefix offsets — NEVER a
    * per-group global window (a group is data-sized; one task must
    * not sort it). Σ i·vᵢ is TIE-INVARIANT: equal values occupy a
    * fixed rank block whatever their internal order, so the sum —
    * and G — is well-defined without a unique tie-break even when
    * range boundaries split a run of equal values.
    *
    * Determinism contract: values ride decimal(18,4), rank products
    * decimal(37,4) — exact, order-independent sums; G is one pinned
    * double expression rounded to 6dp; an empty or zero-mass group
    * reports NULL via the denominator guard.
    *
    * Scale shape: one range shuffle for the ranks (groupedRank's
    * two-phase prefix discipline), one group aggregate. */
  def gini(
      df: DataFrame,
      groupCol: String,
      valueCol: String): DataFrame = {
    val vals = df
      .filter(col(valueCol).isNotNull)
      .select(col(groupCol), col(valueCol).cast("double").as("__v"))
    // tieInvariant: equal values are NORMAL gini input and the Σ i·v
    // readout is proven tie-invariant above — the opt-in uniqueness
    // assert must not abort valid runs
    val ranked = graft.operators.Packing.groupedRank(
      vals, groupCol, "__v", carryCols = Nil, tieInvariant = true)
    val dec = col("__v").cast("decimal(18,4)")
    val agg = ranked.groupBy(col(groupCol)).agg(
      count(lit(1)).as("n"),
      sum(dec).as("__sv"),
      sum((col("rank").cast("decimal(18,0)") * dec)
        .cast("decimal(38,4)")).as("__siv"))
    val nd = col("n").cast("double")
    val sv = col("__sv").cast("double")
    val den = when(sv > 0.0, nd * sv)
    agg.select(col(groupCol), col("n"),
      round((lit(2.0) * col("__siv").cast("double") - (nd + 1.0) * sv) / den, 6)
        .as("gini"))
      .orderBy(groupCol)
  }

  /** Population Stability Index (the credit-risk drift standard) —
    * "has this metric's DISTRIBUTION moved between a reference and a
    * current period": PSI = Σ_buckets (p_cur − p_ref)·ln(p_cur/p_ref)
    * over a caller-bucketed value grid. The monitoring companion to
    * [[driftByWindow]]'s chi² (which tests significance; PSI is the
    * magnitude convention with the 0.1/0.25 action thresholds). Rule
    * of thumb the operator exists to serve: re-examine a feature at
    * PSI > 0.1, retrain past 0.25.
    *
    * Determinism contract: bucket cells are exact integer counts from
    * ONE conditional aggregate over the (group, bucket) grid;
    * Laplace-smoothed shares p = (c+1)/(n+k) (k = the group's
    * observed-bucket count) make every term finite and well-defined
    * with zero-count sides — no epsilon convention to drift between
    * engines; each term rounds to 10dp decimal(28,10) before the
    * bucket-order-independent sum; PSI reads out at 6dp.
    *
    * Scale shape: one grouped aggregate to the bucket grid, one
    * groups-sized join back, one grouped sum. */
  def psi(
      df: DataFrame,
      groupCols: Seq[String],
      bucketCol: Column,
      isRef: Column): DataFrame = {
    require(groupCols.nonEmpty, "need at least one group column")
    val cells = df.groupBy(groupCols.map(col) :+ bucketCol.as("__b"): _*)
      .agg(count(when(isRef, 1L)).as("__cr"),
        count(when(!isRef, 1L)).as("__cc"))
    val tot = cells.groupBy(groupCols.map(col): _*).agg(
      sum("__cr").as("n_ref"), sum("__cc").as("n_cur"),
      count(lit(1)).as("n_buckets"))
    val pr = (col("__cr") + 1L).cast("double") /
      (col("n_ref") + col("n_buckets")).cast("double")
    val pc = (col("__cc") + 1L).cast("double") /
      (col("n_cur") + col("n_buckets")).cast("double")
    val term = round((pc - pr) * log(pc / pr), 10).cast("decimal(28,10)")
    cells.join(tot, groupCols)
      .select(groupCols.map(col) :+ col("n_ref") :+ col("n_cur") :+
        col("n_buckets") :+ term.as("__term"): _*)
      .groupBy((groupCols.map(col) :+ col("n_ref") :+ col("n_cur") :+
        col("n_buckets")): _*)
      .agg(round(sum("__term").cast("double"), 6).as("psi"))
      .orderBy(groupCols.map(col): _*)
  }

  /** Cohen's kappa over a PRE-AGGREGATED confusion frame
    * `(aCol, bCol, nCol)` — chance-corrected agreement between two
    * labelers/detectors (declared metadata vs a content detector, two
    * dedup detectors, human vs model labels): κ = (p_o − p_e)/(1 − p_e)
    * with p_o the diagonal share and p_e the chance agreement from the
    * margins. The single-number summary on top of a confusion matrix
    * (tq24's lang-confusion cells are the canonical feed).
    *
    * Determinism contract: diagonal and margin sums are exact BIGINTs;
    * the margin cross-products ride decimal(38,0) (≤ N², exact); p_o,
    * p_e and κ are pinned double expressions rounded at 6dp;
    * degenerate p_e = 1 (single label on both sides) reports NULL via
    * the denominator guard.
    *
    * Scale shape: the cells frame is label-alphabet-sized — margins,
    * the diagonal and the cross-product all derive from it without
    * touching data again. */
  def cohenKappa(
      cells: DataFrame,
      aCol: String,
      bCol: String,
      nCol: String): DataFrame = {
    val base = Lineage.cutLocal(cells.select(
      col(aCol).as("__a"), col(bCol).as("__b"),
      col(nCol).cast("long").as("__o")))
    val ra = base.groupBy("__a").agg(sum("__o").as("__ra"))
    val cb = base.groupBy("__b").agg(sum("__o").as("__cb"))
    val cross = ra.join(cb, col("__a") === col("__b"))
      .agg(sum((col("__ra").cast("decimal(19,0)") *
        col("__cb").cast("decimal(19,0)")).cast("decimal(38,0)"))
        .as("__pe_sum"))
    val agg = base.agg(
      sum("__o").as("n"),
      sum(when(col("__a") === col("__b"), col("__o")).otherwise(0L))
        .as("__diag"))
    val nd = col("n").cast("double")
    val po = col("__diag").cast("double") / nd
    val pe = coalesce(col("__pe_sum").cast("double"), lit(0.0)) / (nd * nd)
    agg.crossJoin(broadcast(cross))
      .select(col("n"),
        round(po, 6).as("p_observed"),
        round(pe, 6).as("p_expected"),
        Readout.pin((po - pe) / when(pe < 1.0, lit(1.0) - pe), 6).as("kappa"))
  }

  /** Wilcoxon signed-rank test (Wilcoxon 1945) per group — the PAIRED
    * nonparametric: each unit measured twice (before/after, split
    * halves), did the distribution of within-unit differences shift?
    * [[mannWhitney]] compares two independent cohorts; THIS uses each
    * unit as its own control, which is why it finds shifts the
    * unpaired test drowns in between-unit variance:
    *
    *   W⁺ = Σ rank(|dᵢ|) over positive dᵢ  (zeros dropped, mid-ranks),
    *   z = (W⁺ − n(n+1)/4) / √(n(n+1)(2n+1)/24 − Σ(t³−t)/48).
    *
    * Determinism contract: differences quantize to 10⁻⁶ via a decimal
    * cast (engine-portable HALF_UP); ranks are the ×2-scaled mid-rank
    * counting trick over the per-group |d| GRID (the [[friedman]]
    * discipline — no tie-break needed, no row-sized window), so 2W⁺
    * and the ×48-scaled variance are EXACT decimal integers; z is one
    * pinned division. NULL when no nonzero pairs or zero variance.
    *
    * Scale shape: one per-unit aggregate, one per-(group, |d|) grid
    * aggregate (map-side partials), a per-group grid window, a
    * |groups|-row readout. Returns `(group_key, n, w_plus, z)`. */
  def wilcoxonSignedRank(
      pairs: DataFrame,
      groupCol: String,
      diffCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val dec = "decimal(38,0)"
    val du = (round(col(diffCol).cast("double"), 6)
      .cast("decimal(18,6)") * 1000000).cast("long")
    val cells = pairs
      .filter(col(diffCol).isNotNull)
      .select(col(groupCol).as("__g"), du.as("__du"))
      .filter(col("__du") =!= 0L)
      .groupBy(col("__g"), abs(col("__du")).as("__a"))
      .agg(count(lit(1)).as("__t"),
        sum(when(col("__du") > 0L, 1L).otherwise(0L)).as("__p"))
    val below = Window.partitionBy("__g").orderBy("__a")
      .rowsBetween(Window.unboundedPreceding, -1)
    val agg = cells
      .withColumn("__cb", coalesce(sum(col("__t")).over(below), lit(0L)))
      .groupBy("__g")
      .agg(
        sum(col("__t")).as("n"),
        // 2·W+ = Σ_pos (2·below + t + 1) summed per positive diff
        sum((col("__p").cast(dec) *
          (lit(2L) * col("__cb") + col("__t") + 1L).cast(dec)).cast(dec))
          .as("__w2"),
        sum((col("__t").cast(dec) * col("__t").cast(dec) *
          col("__t").cast(dec) - col("__t").cast(dec)).cast(dec))
          .as("__tt"))
    val n = col("n").cast(dec)
    val nD = col("n").cast("double")
    // ×48-scaled exact variance of 2W+: 8·n(n+1)(2n+1) − 4·Σ(t³−t)
    // (Var(2W+) = 4·Var(W+); ·48 keeps it integral)
    val v48 = (lit(8L).cast(dec) * n * (n + lit(1L).cast(dec)) *
      (lit(2L).cast(dec) * n + lit(1L).cast(dec)) -
      lit(4L).cast(dec) * col("__tt")).cast(dec)
    val e2 = nD * (nD + 1.0) / 2.0
    agg.select(col("__g").as("group_key"), col("n"),
      round(col("__w2").cast("double") / 2.0, 1).as("w_plus"),
      when(col("n") >= 1L && v48.cast("double") > 0.0,
        Readout.pin((col("__w2").cast("double") - e2) /
          sqrt(v48.cast("double") / 48.0), 6)).as("z"))
      .orderBy("group_key")
  }

  /** Matthews correlation coefficient — the single-number agreement
    * audit between two binary verdicts (a cheap model gate vs the
    * expensive rule gate, a new filter vs the incumbent) that, unlike
    * accuracy, survives class imbalance (predicting all-keep on a 95%
    * keep corpus scores 0.95 accuracy and 0 MCC):
    *
    *   MCC = (TP·TN − FP·FN) / √((TP+FP)(TP+FN)(TN+FP)(TN+FN)).
    *
    * Determinism contract: the four cells are exact integers; the
    * numerator and the two margin-pair products carry as
    * decimal(38,0) (a 3·10⁹-row margin pair already passes 2⁶³;
    * pairing the four margins two-by-two keeps each product inside
    * decimal(38,0) to ~10⁹ rows per cell, the documented bound); MCC
    * is one pinned division. NULL when any margin is empty.
    *
    * Scale shape: one join-free aggregate of four conditional counts
    * (the caller aligns pred and label on one frame) — map-side
    * partials, 1 row out. Returns ONE row
    * `(n, tp, fp, fn, tn, accuracy, mcc)`. */
  def matthewsCorrelation(
      df: DataFrame,
      predCol: String,
      labelCol: String): DataFrame = {
    val dec = "decimal(38,0)"
    val p = col(predCol).cast("boolean")
    val l = col(labelCol).cast("boolean")
    val agg = df.filter(p.isNotNull && l.isNotNull).agg(
      count(when(p && l, 1L)).as("tp"),
      count(when(p && !l, 1L)).as("fp"),
      count(when(!p && l, 1L)).as("fn"),
      count(when(!p && !l, 1L)).as("tn"))
    val num = (col("tp").cast(dec) * col("tn").cast(dec)).cast(dec) -
      (col("fp").cast(dec) * col("fn").cast(dec)).cast(dec)
    val p1 = ((col("tp") + col("fp")).cast(dec) *
      (col("tp") + col("fn")).cast(dec)).cast(dec)
    val p2 = ((col("tn") + col("fp")).cast(dec) *
      (col("tn") + col("fn")).cast(dec)).cast(dec)
    val n = col("tp") + col("fp") + col("fn") + col("tn")
    agg.select(n.as("n"), col("tp"), col("fp"), col("fn"), col("tn"),
      when(n > 0L, Readout.pin(
        (col("tp") + col("tn")).cast("double") / n.cast("double"), 6))
        .as("accuracy"),
      when(p1 > 0L && p2 > 0L, Readout.pin(
        num.cast("double") /
          sqrt(p1.cast("double") * p2.cast("double")), 6)).as("mcc"))
  }

  /** Binary-gate quality report — precision/recall/F1/Youden's J of a
    * predicted verdict against a reference one: the decomposed view
    * beside [[matthewsCorrelation]]'s single number (MCC says HOW WELL
    * the gates agree; this says in WHICH DIRECTION they disagree —
    * a cheap filter that under-keeps needs a different fix than one
    * that over-keeps).
    *
    * Determinism contract: exact cells; every ratio is one pinned
    * fixed-order expression; F1 derives from the exact cells directly
    * (2TP/(2TP+FP+FN) — never from the rounded P and R); NULL where
    * the defining margin is empty.
    *
    * Scale shape: one aggregate of four conditional counts — 1 row.
    * Returns `(n, tp, fp, fn, tn, precision, recall, f1, youden_j)`. */
  def binaryGateReport(
      df: DataFrame,
      predCol: String,
      labelCol: String): DataFrame = {
    val p = col(predCol).cast("boolean")
    val l = col(labelCol).cast("boolean")
    val agg = df.filter(p.isNotNull && l.isNotNull).agg(
      count(when(p && l, 1L)).as("tp"),
      count(when(p && !l, 1L)).as("fp"),
      count(when(!p && l, 1L)).as("fn"),
      count(when(!p && !l, 1L)).as("tn"))
    def d(c: Column) = c.cast("double")
    val n = col("tp") + col("fp") + col("fn") + col("tn")
    val prec = d(col("tp")) / d(col("tp") + col("fp"))
    val rec = d(col("tp")) / d(col("tp") + col("fn"))
    val spec = d(col("tn")) / d(col("tn") + col("fp"))
    agg.select(n.as("n"), col("tp"), col("fp"), col("fn"), col("tn"),
      when(col("tp") + col("fp") > 0L, Readout.pin(prec, 6))
        .as("precision"),
      when(col("tp") + col("fn") > 0L, Readout.pin(rec, 6)).as("recall"),
      when(lit(2L) * col("tp") + col("fp") + col("fn") > 0L,
        Readout.pin(d(lit(2L) * col("tp")) /
          d(lit(2L) * col("tp") + col("fp") + col("fn")), 6)).as("f1"),
      when(col("tp") + col("fn") > 0L && col("tn") + col("fp") > 0L,
        Readout.pin(rec + spec - lit(1.0), 6)).as("youden_j"))
  }

  /** Paired sign test per group — the assumption-free floor under
    * [[wilcoxonSignedRank]] (signed-rank assumes the difference
    * distribution is symmetric; the sign test assumes NOTHING beyond
    * independent pairs): S⁺ ~ Bin(n, ½) under H₀,
    * z = (2S⁺ − n)/√n. Report both — when they disagree, the
    * asymmetry itself is the finding. Zero differences drop (the
    * canonical treatment, as in the signed-rank).
    *
    * Determinism contract: counts are exact integers; z is one pinned
    * fixed-order double. NULL on n = 0.
    *
    * Scale shape: one grouped aggregate — map-side partials, |groups|
    * rows. Returns `(group_key, n, s_plus, z)`. */
  def signTest(
      pairs: DataFrame,
      groupCol: String,
      diffCol: String): DataFrame = {
    val d = col(diffCol).cast("double")
    val agg = pairs
      .filter(col(diffCol).isNotNull && d =!= 0.0)
      .groupBy(col(groupCol).as("group_key"))
      .agg(count(lit(1)).as("n"),
        sum(when(d > 0.0, 1L).otherwise(0L)).as("s_plus"))
    agg.select(col("group_key"), col("n"), col("s_plus"),
      when(col("n") > 0L, Readout.pin(
        (lit(2.0) * col("s_plus") - col("n")) /
          sqrt(col("n").cast("double")), 6)).as("z"))
      .orderBy("group_key")
  }

  /** Forecast-accuracy scorecard over a [[holtSmoothing]] (or any
    * forecast/actual) frame — MAPE, sMAPE and MASE per series: the
    * readout that decides whether the forecaster is EARNING its keep
    * (MASE < 1 beats the naive lag-1 forecast; MAPE/sMAPE are the
    * percentage forms dashboards quote). Input needs `(key, t, y,
    * forecast, residual)` — exactly holtSmoothing's output.
    *
    * Determinism contract: every per-row term rounds (6/8dp) into a
    * DECIMAL sum (row order differs between engines); ratios divide
    * once, pinned. MAPE skips zero actuals, sMAPE skips zero
    * denominators, MASE is NULL when the naive MAE is 0 (a constant
    * series makes every scale-free comparison meaningless).
    *
    * Scale shape: one lag window per series (bounded by series length
    * — the same invariant the holt fold itself relies on) + one
    * |keys|-ary aggregate. Returns
    * `(key, n_scored, mape, smape, mase)`. */
  def forecastAccuracy(
      scored: DataFrame,
      keyCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(keyCol).orderBy("t")
    val f = col("forecast")
    val hasF = f.isNotNull
    val withPrev = scored.withColumn("__py", lag(col("y"), 1).over(w))
    val agg = withPrev.groupBy(col(keyCol).as("key")).agg(
      count(when(hasF, 1L)).as("n_scored"),
      sum(when(hasF, round(abs(col("residual")), 6)
        .cast("decimal(28,6)"))).as("__sae"),
      sum(when(hasF && col("y") > 0.0,
        round(abs(col("residual")) / col("y"), 8)
          .cast("decimal(28,8)"))).as("__sape"),
      count(when(hasF && col("y") > 0.0, 1L)).as("__nape"),
      sum(when(hasF && abs(f) + abs(col("y")) > 0.0,
        round(lit(2.0) * abs(f - col("y")) /
          (abs(f) + abs(col("y"))), 8).cast("decimal(28,8)")))
        .as("__ssm"),
      count(when(hasF && abs(f) + abs(col("y")) > 0.0, 1L)).as("__nsm"),
      sum(when(col("__py").isNotNull,
        round(abs(col("y") - col("__py")), 6).cast("decimal(28,6)")))
        .as("__snv"),
      count(when(col("__py").isNotNull, 1L)).as("__nd"))
    val mae = col("__sae").cast("double") / col("n_scored")
    val naive = col("__snv").cast("double") / col("__nd")
    agg.select(col("key"), col("n_scored"),
      when(col("__nape") > 0L, Readout.pin(
        col("__sape").cast("double") / col("__nape"), 6)).as("mape"),
      when(col("__nsm") > 0L, Readout.pin(
        col("__ssm").cast("double") / col("__nsm"), 6)).as("smape"),
      when(col("n_scored") > 0L && col("__nd") > 0L && naive > 0.0,
        Readout.pin(mae / naive, 6)).as("mase"))
      .orderBy("key")
  }

  /** Hill tail-index estimator (Hill 1975) per group — "how heavy is
    * this metric's tail": α̂ = k / Σᵢ₌₁..k ln(x₍ᵢ₎/x₍ₖ₊₁₎) over the top
    * k+1 order statistics. α ≤ 2 means infinite variance — means and
    * z-tests on such a metric are fiction, the readout that tells you
    * to switch to [[mannWhitney]]/[[theilSen]]/quantiles; it is also
    * the pre-flight check before trusting [[tukeyOutliers]] fences.
    *
    * Determinism contract: the top-(k+1) selection orders by the raw
    * value with an id tie-break (exact); each ln ratio rounds to 10dp
    * and DECIMAL-sums (order stats arrive in engine order); α̂ is one
    * pinned division. Groups with fewer than k+1 positive values, a
    * non-positive threshold, or a zero sum (all top values tied)
    * report NULL.
    *
    * Scale shape: the per-group top-(k+1) is a rank window over the
    * group partition filtered to k+1 rows — at 100 TB swap in a
    * per-partition TakeOrdered tree (Spark's sort-based window already
    * short-circuits with the rank filter pushed); everything after is
    * (k+1)·|groups| rows. Returns `(group_key, k, threshold, alpha)`. */
  def hillTailIndex(
      df: DataFrame,
      groupCol: String,
      valueCol: String,
      idCol: String,
      k: Int = 50): DataFrame = {
    require(k >= 2, "need k >= 2 tail points")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("__g")
      .orderBy(col("__v").desc, col("__id"))
    val top = Lineage.cutLocal(df
      .filter(col(valueCol).isNotNull && col(valueCol) > 0.0)
      .select(col(groupCol).as("__g"),
        col(valueCol).cast("double").as("__v"), col(idCol).as("__id"))
      .withColumn("__r", row_number().over(w))
      .filter(col("__r") <= k + 1))
    val thr = top.filter(col("__r") === k + 1)
      .select(col("__g"), col("__v").as("__xk"))
    top.filter(col("__r") <= k)
      .join(thr, Seq("__g"))
      .select(col("__g"),
        col("__xk"),
        round(log(col("__v") / col("__xk")), 10)
          .cast("decimal(28,10)").as("__t"))
      .groupBy("__g")
      .agg(first(col("__xk")).as("__thr"), count(lit(1)).as("__n"),
        sum(col("__t")).as("__s"))
      .select(col("__g").as("group_key"), lit(k).cast("long").as("k"),
        round(col("__thr"), 4).as("threshold"),
        when(col("__n") === k.toLong && col("__thr") > 0.0 &&
            col("__s").cast("double") > 0.0,
          Readout.pin(lit(k.toDouble) / col("__s").cast("double"), 6))
          .as("alpha"))
      .orderBy("group_key")
  }

  /** Standardized mean difference balance table (the propensity-score
    * / causal-inference covariate audit): for each covariate,
    * SMD = (m_a − m_b) / √((s²_a + s²_b)/2) between the two cohorts —
    * the scale-free imbalance number a difference-in-means readout
    * ([[abTest]], [[cuped]], aq85's DiD) is only trustworthy when
    * small; |SMD| ≤ 0.1 is the conventional "balanced" line reported
    * as the verdict column.
    *
    * Determinism contract: the [[abTest]] exact decimal sufficient
    * statistics per covariate; SAMPLE variances (not the SE form —
    * SMD standardizes by spread, not precision); every readout one
    * pinned fixed-order expression. Degenerate arms (n < 2 or zero
    * pooled variance) report NULL smd and NULL verdict.
    *
    * Scale shape: one grouped aggregate per covariate (map-side
    * partials, |covariates| passes over the projection — each scans
    * only its own column), unioned to the |covariates|-row table.
    * Returns `(covariate, n_a, n_b, mean_a, mean_b, smd, balanced)`. */
  def smdBalance(
      df: DataFrame,
      armA: Column,
      covariates: Seq[String]): DataFrame = {
    require(covariates.nonEmpty, "need at least one covariate")
    covariates.map { c =>
      val v = col(c)
      val dec = v.cast("decimal(18,4)")
      val sq = round(v * v, 8).cast("decimal(28,8)")
      val agg = df.agg(
        count(when(armA, v)).as("n_a"),
        count(when(!armA, v)).as("n_b"),
        sum(when(armA, dec)).as("__sv_a"),
        sum(when(!armA, dec)).as("__sv_b"),
        sum(when(armA, sq)).as("__ss_a"),
        sum(when(!armA, sq)).as("__ss_b"))
      val (na, nb) = (col("n_a"), col("n_b"))
      val ma = col("__sv_a").cast("double") / na
      val mb = col("__sv_b").cast("double") / nb
      val va = (col("__ss_a").cast("double") - na * ma * ma) / (na - 1)
      val vb = (col("__ss_b").cast("double") - nb * mb * mb) / (nb - 1)
      val pooled = (va + vb) / 2.0
      val ok = na >= 2 && nb >= 2 && pooled > 0.0
      val smd = (ma - mb) / sqrt(pooled)
      agg.select(lit(c).as("covariate"), na, nb,
        Readout.pin(ma, 6).as("mean_a"),
        Readout.pin(mb, 6).as("mean_b"),
        when(ok, Readout.pin(smd, 6)).as("smd"),
        when(ok, Readout.pin(abs(smd), 6) <= 0.1).as("balanced"))
    }.reduce(_.unionByName(_)).orderBy("covariate")
  }

  /** Weighted Cohen's kappa (Cohen 1968) over an ORDINAL confusion
    * grid — [[cohenKappa]] scores a near-miss (bucket 3 vs 4) as harshly
    * as a gross one (0 vs 9); the weighted form discounts disagreement
    * by (a−b)², which is what ordinal labels (quality tiers, spend
    * deciles, severity grades) actually need:
    *
    *   κ_w = 1 − Σ(a−b)²·o_ab·n / Σ(a−b)²·r_a·c_b.
    *
    * The usual 1 − d²/(k−1)² weights cancel their (k−1)² through the
    * ratio, so BOTH sums here are EXACT decimal(38,0) integers and
    * κ_w is ONE pinned division — no per-cell float anywhere (a
    * determinism luxury the additive po/pe form doesn't have).
    * Categories must be integral; NULL when the expected disagreement
    * is 0 (all mass on one category pair).
    *
    * Scale shape: the [[cohenKappa]] shape — cells in, margins as
    * aggregates of the cell frame, one grid²-bounded margin cross and
    * two 1-row readouts. Returns ONE row `(n, kappa_w)`. */
  def weightedKappa(
      cells: DataFrame,
      aCol: String,
      bCol: String,
      nCol: String): DataFrame = {
    val dec = "decimal(38,0)"
    val base = Lineage.cutLocal(cells.select(
      col(aCol).cast("long").as("__a"), col(bCol).cast("long").as("__b"),
      col(nCol).cast("long").as("__o")))
    val d2 = (col("__a") - col("__b")) * (col("__a") - col("__b"))
    val obs = base.agg(
      sum(col("__o")).as("n"),
      sum((d2.cast(dec) * col("__o").cast(dec)).cast(dec)).as("__do"))
    val ra = base.groupBy("__a").agg(sum("__o").as("__ra"))
    val cb = base.groupBy("__b").agg(sum("__o").as("__cb"))
    val exp = ra.crossJoin(cb)
      .agg(sum((d2.cast(dec) * (col("__ra").cast(dec) *
        col("__cb").cast(dec)).cast(dec)).cast(dec)).as("__de"))
    obs.crossJoin(broadcast(exp))
      .select(col("n"),
        when(col("__de") > 0L,
          Readout.pin(lit(1.0) -
            (col("n").cast(dec) * col("__do")).cast("double") /
            col("__de").cast("double"), 6)).as("kappa_w"))
  }

  /** Krippendorff's alpha, nominal data (Krippendorff 2004) — the
    * annotation-reliability standard that [[cohenKappa]] (exactly 2
    * raters, no missing) and [[Profile.fleissKappa]] (fixed rater
    * count) can't cover: ANY number of raters per unit, missing
    * ratings welcome — which is what real labeling pipelines produce:
    *
    *   D_o = (1/N)·Σ_u [Σ_c n_uc(m_u − n_uc)]/(m_u − 1),
    *   D_e = (1/(N(N−1)))·Σ_c n_c(N − n_c),
    *   α = 1 − D_o/D_e.
    *
    * Determinism contract: all pair counts are exact integers; each
    * unit's D_o term is a fixed-order double rounded to 8dp and
    * DECIMAL-summed (unit order differs between engines — the
    * bartlett discipline; terms are ≤ m_u, so the 8dp grid is far
    * inside double exactness); D_e is exact-integer until one double
    * division; α pins once. Units with fewer than 2 ratings carry no
    * disagreement information and are excluded entirely (the
    * canonical treatment). NULL when D_e = 0.
    *
    * Scale shape: one (unit, category) count pass (map-side
    * partials), per-unit and per-category aggregates of that frame,
    * two 1-row readouts — nothing row-sized after the first pass.
    * Returns ONE row `(n_units, n_ratings, d_o, d_e, alpha)`. */
  def krippendorffAlpha(
      ratings: DataFrame,
      unitCol: String,
      valueCol: String): DataFrame = {
    val dec = "decimal(38,0)"
    val cells = Lineage.cutLocal(ratings
      .filter(col(valueCol).isNotNull)
      .groupBy(col(unitCol).as("__u"), col(valueCol).as("__c"))
      .agg(count(lit(1)).as("__n")))
    val units = Lineage.cutLocal(cells.groupBy("__u")
      .agg(sum(col("__n")).as("__m"),
        sum((col("__n").cast(dec) * col("__n").cast(dec)).cast(dec))
          .as("__sq"))
      .filter(col("__m") >= 2L))
    // Σ_c n_uc(m_u − n_uc) = m_u² − Σ n_uc²  (exact integers)
    val doTerm = ((col("__m").cast(dec) * col("__m").cast(dec))
      .cast(dec) - col("__sq")).cast("double") /
      (col("__m").cast("double") - 1.0)
    val obs = units.agg(
      count(lit(1)).as("n_units"), sum(col("__m")).as("n_ratings"),
      sum(round(doTerm, 8).cast("decimal(28,8)")).as("__dos"))
    val cats = cells.join(units.select("__u"), Seq("__u"), "left_semi")
      .groupBy("__c").agg(sum(col("__n")).as("__nc"))
      .agg(sum((col("__nc").cast(dec) * col("__nc").cast(dec))
        .cast(dec)).as("__nc2"))
    val nD = col("n_ratings").cast("double")
    val dO = col("__dos").cast("double") / nD
    val dE = ((col("n_ratings").cast(dec) * col("n_ratings").cast(dec))
      .cast(dec) - col("__nc2")).cast("double") / (nD * (nD - 1.0))
    obs.crossJoin(broadcast(cats))
      .select(col("n_units"), col("n_ratings"),
        Readout.pin(dO, 6).as("d_o"),
        Readout.pin(dE, 6).as("d_e"),
        when(dE > 0.0, Readout.pin(lit(1.0) - dO / dE, 6)).as("alpha"))
  }

  /** Theil T inequality index per group — the entropy-based
    * concentration measure beside [[gini]]: T = (1/n)·Σ (x/μ)·ln(x/μ)
    * over positive values; 0 = perfectly even, ln(n) = one holder.
    * Unlike Gini it needs NO rank pass — one aggregate for μ, one
    * per-row term, one sum — which at 100 TB is the difference between
    * a range shuffle and none; it is also additively decomposable
    * (between + within), which is why mixture audits prefer it.
    *
    * Determinism contract: μ comes from an exact decimal(18,4) sum;
    * each row term rounds to 10dp decimal(28,10) before the
    * order-independent sum; the readout is one division rounded at
    * 6dp. Non-positive values are excluded (T is defined on x > 0);
    * an empty group reports no row, a zero-variance group reports 0. */
  def theil(
      df: DataFrame,
      groupCol: String,
      valueCol: String): DataFrame = {
    val vals = df
      .filter(col(valueCol).isNotNull && col(valueCol) > 0.0)
      .select(col(groupCol), col(valueCol).cast("double").as("__v"))
    val mu = vals.groupBy(col(groupCol)).agg(
      count(lit(1)).as("n"),
      sum(col("__v").cast("decimal(18,4)")).as("__sv"))
    val m = col("__sv").cast("double") / col("n").cast("double")
    val term = round((col("__v") / m) * log(col("__v") / m), 10)
      .cast("decimal(28,10)")
    vals.join(broadcast(mu), Seq(groupCol))
      .select(col(groupCol), col("n"), term.as("__term"))
      .groupBy(col(groupCol), col("n"))
      .agg(Readout.pin(sum("__term").cast("double") / col("n").cast("double"), 6)
        .as("theil_t"))
      .orderBy(groupCol)
  }

  /** Kendall's τ-b rank correlation per group, tie-corrected — the
    * concordance companion to [[spearman]]: P−Q over the geometric
    * mean of tie-adjusted pair counts. CONTRACT: computed on the
    * (x, y) VALUE-CELL grid, so x and y must be discrete or
    * caller-bucketed (hours, priority levels, score buckets) — the
    * concordance join is grid²-bounded, which is the scalable shape;
    * a continuous metric makes the grid data-sized and belongs to
    * [[spearman]] (whose prefix-sum ranks avoid any pairwise pass).
    *
    * Determinism contract: cell counts, concordant/discordant pair
    * products, and all tie terms are exact decimal(38,0) integers;
    * τ-b is one pinned double expression rounded at 6dp; degenerate
    * groups (all ties on either axis) report NULL via the guard.
    *
    * Scale shape: one grouped aggregate to the cell grid, one
    * grid-bounded self-join (never row-pairs), dimension-sized
    * readouts. */
  def kendallTau(
      df: DataFrame,
      groupCol: String,
      xCol: String,
      yCol: String): DataFrame = {
    val dec = "decimal(38,0)"
    val cells = Lineage.cutLocal(df
      .filter(col(xCol).isNotNull && col(yCol).isNotNull)
      .groupBy(col(groupCol).as("__g"), col(xCol).as("__x"),
        col(yCol).as("__y"))
      .agg(count(lit(1)).as("__n")))
    val pq = cells.as("a")
      .join(cells.as("b"),
        col("a.__g") === col("b.__g") && col("a.__x") < col("b.__x"))
      .groupBy(col("a.__g").as("__g"))
      .agg(
        sum(when(col("a.__y") < col("b.__y"),
          (col("a.__n").cast(dec) * col("b.__n").cast(dec)).cast(dec))
          .otherwise(lit(0).cast(dec))).as("__p"),
        sum(when(col("a.__y") > col("b.__y"),
          (col("a.__n").cast(dec) * col("b.__n").cast(dec)).cast(dec))
          .otherwise(lit(0).cast(dec))).as("__q"))
    def tiePairs(vc: String, out: String): DataFrame = cells
      .groupBy(col("__g"), col(vc)).agg(sum("__n").as("__c"))
      .groupBy("__g")
      .agg((sum((col("__c").cast(dec) * (col("__c") - 1L).cast(dec))
        .cast(dec)) / 2L).cast(dec).as(out))
    val tot = cells.groupBy("__g").agg(sum("__n").as("n"))
    val n0 = ((col("n").cast(dec) * (col("n") - 1L).cast(dec)).cast(dec) /
      2L).cast(dec)
    tot
      .join(pq, Seq("__g"), "left")
      .join(tiePairs("__x", "__t1"), Seq("__g"))
      .join(tiePairs("__y", "__t2"), Seq("__g"))
      .select(col("__g").as("group_key"), col("n"), {
        val dx = (n0 - col("__t1")).cast("double")
        val dy = (n0 - col("__t2")).cast("double")
        Readout.pin((coalesce(col("__p"), lit(0).cast(dec)) -
          coalesce(col("__q"), lit(0).cast(dec))).cast("double") /
          sqrt(when(dx > 0.0 && dy > 0.0, dx * dy)), 6).as("tau_b")
      })
      .orderBy("group_key")
  }

  /** Ordinal concordance readouts — Goodman–Kruskal gamma (1954) and
    * Somers' D(y|x) (1962) — off the same value-cell grid as
    * [[kendallTau]]: γ = (P−Q)/(P+Q) ignores ties entirely (the
    * "among pairs that order at all, how consistently" readout);
    * D(y|x) = (P−Q)/(n₀−Tx) penalizes ties on the DEPENDENT side
    * only — the credit-scoring concordance standard (for a binary y
    * it equals 2·AUC−1, the Gini coefficient of the ROC). Together
    * with τ-b they are the three tie conventions over one set of
    * sufficient statistics, so they share one plan.
    *
    * Determinism contract: P, Q, n₀ and Tx are exact integers (pair
    * products ride decimal(38,0), the kendallTau discipline); the two
    * readouts are single divisions rounded at 6dp; a group with no
    * orderable pairs (P+Q = 0) or all-tied x reports NULL via the
    * denominator guards.
    *
    * Scale shape: one grouped aggregate to the cell grid, one
    * grid-bounded self-join (never row-pairs), dimension-sized
    * readouts — [[kendallTau]]'s shape exactly. */
  def concordance(
      df: DataFrame,
      groupCol: String,
      xCol: String,
      yCol: String): DataFrame = {
    val dec = "decimal(38,0)"
    val cells = Lineage.cutLocal(df
      .filter(col(xCol).isNotNull && col(yCol).isNotNull)
      .groupBy(col(groupCol).as("__g"), col(xCol).as("__x"),
        col(yCol).as("__y"))
      .agg(count(lit(1)).as("__n")))
    val pq = cells.as("a")
      .join(cells.as("b"),
        col("a.__g") === col("b.__g") && col("a.__x") < col("b.__x"))
      .groupBy(col("a.__g").as("__g"))
      .agg(
        sum(when(col("a.__y") < col("b.__y"),
          (col("a.__n").cast(dec) * col("b.__n").cast(dec)).cast(dec))
          .otherwise(lit(0).cast(dec))).as("__p"),
        sum(when(col("a.__y") > col("b.__y"),
          (col("a.__n").cast(dec) * col("b.__n").cast(dec)).cast(dec))
          .otherwise(lit(0).cast(dec))).as("__q"))
    val tx = cells
      .groupBy(col("__g"), col("__x")).agg(sum("__n").as("__c"))
      .groupBy("__g")
      .agg((sum((col("__c").cast(dec) * (col("__c") - 1L).cast(dec))
        .cast(dec)) / 2L).cast(dec).as("__tx"))
    val tot = cells.groupBy("__g").agg(sum("__n").as("n"))
    val n0 = ((col("n").cast(dec) * (col("n") - 1L).cast(dec)).cast(dec) /
      2L).cast(dec)
    val p = coalesce(col("__p"), lit(0).cast(dec))
    val q = coalesce(col("__q"), lit(0).cast(dec))
    tot
      .join(pq, Seq("__g"), "left")
      .join(tx, Seq("__g"))
      .select(col("__g").as("group_key"), col("n"),
        Readout.pin((p - q).cast("double") /
          when((p + q).cast("double") > 0.0, (p + q).cast("double")), 6)
          .as("gamma"),
        Readout.pin((p - q).cast("double") /
          when((n0 - col("__tx")).cast("double") > 0.0,
            (n0 - col("__tx")).cast("double")), 6).as("somers_d"))
      .orderBy("group_key")
  }

  /** Quantile readout over a FIXED-GRID histogram — the consumer that
    * makes [[graft.streaming.Registries.incrementalHistogram]]'s
    * mergeable cells actionable: per key, the p-quantile estimate by
    * linear interpolation inside the covering bucket
    * (est = bucket·width + width·(r − cumBefore)/count,
    * r = clamp(⌈p·N⌉, 1, N)). This is how a quantile dashboard reads
    * a 100 TB corpus without touching it — the registry holds
    * |keys|·|buckets| rows, merged additively forever, and the
    * quantile error is bounded by the bucket width by construction.
    *
    * Determinism contract: N, cumulative counts, and the rank r are
    * exact integers (⌈p·N⌉ on a double product of a literal p — both
    * engines compute the identical double); the covering bucket is
    * the FIRST with cum ≥ r; the estimate is one fixed-order double
    * expression rounded at 6dp.
    *
    * Scale shape: one per-key window over the bucket GRID (≤ the
    * histogram's maxBucket+1 rows per key — bounded, never
    * data-sized), one broadcast probs frame, one covering-bucket
    * argmin. Input is `(key, bucket, n)` cells; returns
    * `(key, p, bucket, quantile_est)`. */
  def histogramQuantiles(
      cells: DataFrame,
      keyCol: String,
      bucketCol: String,
      nCol: String,
      width: Double,
      probs: Seq[Double],
      capBucket: Option[Long] = None): DataFrame = {
    require(width > 0.0, "bucket width must be positive")
    require(probs.nonEmpty && probs.forall(p => p > 0.0 && p <= 1.0),
      "probs must lie in (0, 1]")
    import org.apache.spark.sql.expressions.Window
    val spark = cells.sparkSession
    import spark.implicits._
    val w = Window.partitionBy(col("__k")).orderBy(col("__b"))
    val cum = cells
      .select(col(keyCol).as("__k"), col(bucketCol).as("__b"),
        col(nCol).cast("long").as("__n"))
      .withColumn("__cum", sum(col("__n")).over(w))
      .withColumn("__tot", sum(col("__n")).over(
        Window.partitionBy(col("__k"))))
    val ps = broadcast(probs.toDF("p"))
    val r = least(col("__tot"),
      greatest(lit(1L), ceil(col("p") * col("__tot").cast("double"))))
    val covering = cum.crossJoin(ps)
      .withColumn("__r", r)
      .filter(col("__cum") >= col("__r"))
      .groupBy(col("__k"), col("p"))
      .agg(min(struct(col("__b"), col("__cum"), col("__n"), col("__r")))
        .as("__c"))
    covering.select(col("__k").as(keyCol), col("p"),
      col("__c.__b").as(bucketCol),
      round(col("__c.__b").cast("double") * width +
        lit(width) *
          (col("__c.__r") - (col("__c.__cum") - col("__c.__n")))
            .cast("double") / col("__c.__n").cast("double"), 6)
        .as("quantile_est"),
      // cap caveat made visible: the histogram's top bucket holds ALL
      // mass at or above cap·width (incrementalHistogram clamps there),
      // so a quantile covered by it interpolates inside
      // [cap·width, (cap+1)·width] and can understate a heavy tail by
      // an unbounded amount — the estimate is only a LOWER BOUND.
      // Callers that know the grid's cap pass it and get the flag;
      // without one every estimate is a genuine interior bucket.
      capBucket.map(c => (col("__c.__b") >= c).as("capped"))
        .getOrElse(lit(false).as("capped")))
      .orderBy(keyCol, "p")
  }

  /** Pettitt changepoint test (Pettitt 1979) — "did this series'
    * distribution SHIFT at some unknown point, and where": the
    * rank-based CUSUM U_t = Σ_{i≤t}Σ_{j>t} sgn(Xᵢ−Xⱼ), maximized
    * over every split point t, with the standard approximate p-value
    * 2·exp(−6K²/(n³+n²)). Nonparametric where [[cusum]] tracks a
    * known reference mean — this finds the single most likely break
    * with no distributional assumption, the data-quality question
    * behind "when did this source's quality regime change".
    *
    * Computed via the rank identity U_t = 2Σ_{i≤t}Rᵢ − t(n+1)
    * (average ranks on ties — Rᵢ over the whole group), so the whole
    * test is two prefix sums: value-order (the tie-averaged rank
    * grid, [[spearman]]'s machinery) and time-order (the running
    * Σ2Rᵢ). `ordCol` must be unique within each group (pack a unique
    * id behind the timestamp — the [[graft.operators.Packing
    * .groupedPrefixSum]] contract).
    *
    * Determinism contract: 2·avg-ranks, prefix sums, t(n+1), K and
    * the argmax are exact integers; ties on |U_t| break to the
    * EARLIEST split; the p-value is one pinned double expression
    * rounded at 6dp and capped at 1.
    *
    * Scale shape: one grid aggregate + two RANGE-PARTITIONED prefix
    * sums (never a per-group single-task sort — the no-partition
    * window trap), one data-sized grid join, one grouped argmax.
    * Returns `(group_key, n, k_stat, change_rank, p_value)` —
    * change_rank is the 1-based time index t* of the maximizing
    * split. */
  def pettitt(
      df: DataFrame,
      groupCol: String,
      ordCol: String,
      valueCol: String): DataFrame = {
    // range-kernel width from the PRE-cut input (post-cut LogicalRDD
    // stats are unknown/inflated — the aq44 discipline): the session
    // width over a provably-small frame is hundreds of near-empty
    // tasks per kernel stage (measured on aq109: 244 tasks for 8.8 MB
    // of shuffle); at scale the clamp keeps the session width
    val parts = Some(Lineage.iterPartitions(df))
    val rows = Lineage.cutLocal(df
      .filter(col(ordCol).isNotNull && col(valueCol).isNotNull)
      .select(col(groupCol).as("__g"), col(ordCol).as("__o"),
        col(valueCol).as("__v")))
    // tie-averaged rank grid, ×2 so ties stay integer (spearman's)
    val grid = rows.groupBy(col("__g"), col("__v"))
      .agg(count(lit(1)).as("__tc"))
    val r2 = Packing.groupedPrefixSum(grid, "__g", "__v", "__tc", "__cum",
        numParts = parts)
      .select(col("__g"), col("__v"),
        (lit(2L) * (col("__cum") - col("__tc")) + col("__tc") + 1L)
          .as("__r2"))
    val withRank = rows.join(r2, Seq("__g", "__v"))
    val t = Packing.groupedRank(withRank, "__g", "__o",
      carryCols = Seq("__r2"), numParts = parts)
    val s2 = Packing.groupedPrefixSum(t, "__g", "__o", "__r2", "__s2",
      numParts = parts)
    val nPer = s2.groupBy("__g").agg(count(lit(1)).as("n"))
    val u = s2.join(broadcast(nPer), Seq("__g"))
      .withColumn("__u", col("__s2") - col("rank") * (col("n") + 1L))
    val agg = u.groupBy(col("__g"), col("n"))
      .agg(max(struct(abs(col("__u")).as("k"), (-col("rank")).as("__nr")))
        .as("__best"))
    val nd = col("n").cast("double")
    val kd = col("__best.k").cast("double")
    agg.select(col("__g").as("group_key"), col("n"),
      col("__best.k").as("k_stat"),
      (-col("__best.__nr")).as("change_rank"),
      round(least(lit(1.0),
        lit(2.0) * exp(lit(-6.0) * kd * kd / (nd * nd * nd + nd * nd))),
        6).as("p_value"))
      .orderBy("group_key")
  }

  /** Two-sample Poisson rate test via binomial conditioning — "did
    * this group's EVENT RATE change between two exposure windows":
    * given K = k₁+k₂ total events, under equal rates k₁ is
    * Binomial(K, p) with p = t₁/(t₁+t₂) set by the EXPOSURES alone
    * (Przyborowski & Wilenski 1940 — the uniformly-standard exact
    * conditioning; the large-sample z below is its normal
    * approximation). The count-data companion to
    * [[twoProportionTest]]: proportions compare per-UNIT shares,
    * this compares per-TIME rates under unequal window lengths —
    * ingestion-rate and error-rate monitoring's native shape.
    *
    * Determinism contract: k₁/k₂/t₁/t₂ are exact integers (exposures
    * derive from the data's min/max day and the split day — one
    * broadcast 1-row aggregate); rates and z are pinned double
    * expressions rounded at 6dp; degenerate inputs (either window
    * empty of exposure, or K = 0) report NULL z via the guards.
    *
    * Scale shape: one conditional grouped aggregate + a broadcast
    * exposure row — dimension-sized output, nothing pairwise. */
  def poissonRateTest(
      df: DataFrame,
      groupCol: String,
      dayCol: String,
      splitDay: Long): DataFrame = {
    val d = col(dayCol)
    val counts = df
      .filter(d.isNotNull)
      .groupBy(col(groupCol))
      .agg(count(when(d < splitDay, 1L)).as("k1"),
        count(when(d >= splitDay, 1L)).as("k2"))
    val expo = broadcast(df.filter(d.isNotNull).agg(
      (lit(splitDay) - min(d)).cast("long").as("__t1"),
      (max(d) + 1L - lit(splitDay)).cast("long").as("__t2")))
    val t1 = col("__t1").cast("double")
    val t2 = col("__t2").cast("double")
    val kk = (col("k1") + col("k2")).cast("double")
    val p = t1 / (t1 + t2)
    val ok = col("__t1") > 0L && col("__t2") > 0L
    counts.crossJoin(expo)
      .select(col(groupCol), col("k1"), col("k2"),
        when(ok, round(col("k1").cast("double") / t1, 6)).as("rate1"),
        when(ok, round(col("k2").cast("double") / t2, 6)).as("rate2"),
        when(ok && kk > 0.0,
          Readout.pin((col("k1").cast("double") - kk * p) /
            sqrt(when(kk * p * (lit(1.0) - p) > 0.0,
              kk * p * (lit(1.0) - p))), 6)).as("z"))
      .orderBy(groupCol)
  }

  /** Jonckheere–Terpstra trend test (Jonckheere 1954) — "does the
    * value distribution shift MONOTONICALLY across ordered groups"
    * (hours of day, dose levels, document-age buckets): the sum of
    * Mann–Whitney U statistics over every ordered group pair, against
    * its null mean, with the tie-corrected large-sample variance
    * (Hollander & Wolfe 1999). Strictly sharper than per-pair MW or
    * unordered Kruskal–Wallis when the alternative IS ordered — the
    * trend companion to [[mannKendall]] (which orders by time, not by
    * group).
    *
    * Everything integer rides a ×4 scaling so tied cross-group pairs
    * (worth ½) stay exact: `jt4` = 4·JT, `ejt4` = 4·E[JT] = n²−Σn_g².
    *
    * Determinism contract: jt4/ejt4 and every variance ingredient
    * (Σn_g(n_g−1)(2n_g+5) over groups, Σt(t−1)(2t+5) over value-tie
    * runs, the B/C products) are exact decimal(38,0) integers; z is
    * ONE fixed-order double expression over them rounded at 6dp, NULL
    * when the variance degenerates (all one group, all values tied,
    * or n < 3).
    *
    * Scale shape: one grouped aggregate to the (group, ord, value)
    * cell grid, one grid²-bounded ordered-pair join (never row
    * pairs), two cell-frame aggregates for the tie terms,
    * dimension-sized readouts — the [[kendallTau]] family shape. */
  def jonckheereTerpstra(
      df: DataFrame,
      groupCol: String,
      ordCol: String,
      valueCol: String): DataFrame = {
    val dec = "decimal(38,0)"
    val cells = Lineage.cutLocal(df
      .filter(col(ordCol).isNotNull && col(valueCol).isNotNull)
      .groupBy(col(groupCol).as("__g"), col(ordCol).as("__o"),
        col(valueCol).as("__v"))
      .agg(count(lit(1)).as("__n")))
    val jt = cells.as("a")
      .join(cells.as("b"),
        col("a.__g") === col("b.__g") && col("a.__o") < col("b.__o"))
      .groupBy(col("a.__g").as("__g"))
      .agg(sum(
        when(col("a.__v") < col("b.__v"),
          (col("a.__n").cast(dec) * col("b.__n").cast(dec) * 4L).cast(dec))
          .when(col("a.__v") === col("b.__v"),
            (col("a.__n").cast(dec) * col("b.__n").cast(dec) * 2L)
              .cast(dec))
          .otherwise(lit(0).cast(dec))).as("jt4"))
    def polys(c: Column) = Seq(
      (c * (c - 1L) * (c * 2L + 5L)).cast(dec),  // x(x-1)(2x+5)
      (c * (c - 1L) * (c - 2L)).cast(dec),       // x(x-1)(x-2)
      (c * (c - 1L)).cast(dec))                  // x(x-1)
    val groups = cells
      .groupBy("__g", "__o").agg(sum("__n").as("__c"))
      .groupBy("__g").agg(
        count(lit(1)).as("n_groups"),
        sum(col("__c")).as("n"),
        sum(col("__c").cast(dec) * col("__c").cast(dec)).cast(dec)
          .as("__sq"),
        sum(polys(col("__c").cast(dec))(0)).as("__ga"),
        sum(polys(col("__c").cast(dec))(1)).as("__gb"),
        sum(polys(col("__c").cast(dec))(2)).as("__gc"))
    val ties = cells
      .groupBy("__g", "__v").agg(sum("__n").as("__t"))
      .groupBy("__g").agg(
        sum(polys(col("__t").cast(dec))(0)).as("__ta"),
        sum(polys(col("__t").cast(dec))(1)).as("__tb"),
        sum(polys(col("__t").cast(dec))(2)).as("__tc"))
    val nD = col("n").cast(dec)
    val a = (nD * (nD - 1L) * (nD * 2L + 5L)).cast(dec) -
      col("__ga") - col("__ta")
    val ejt4 = (nD * nD).cast(dec) - col("__sq")
    val nd = col("n").cast("double")
    val d3 = nd * (nd - 1.0) * (nd - 2.0)
    val d1 = nd * (nd - 1.0)
    // NULL-guard the denominators themselves (ANSI: double /0 throws,
    // /NULL is silent — the cuped lesson): n < 3 groups degrade to a
    // NULL variance, never a DIVIDE_BY_ZERO
    val var16 = lit(16.0) * (
      a.cast("double") / 72.0 +
      (col("__gb").cast(dec) * col("__tb").cast(dec)).cast("double") /
        when(d3 > 0.0, lit(36.0) * d3) +
      (col("__gc").cast(dec) * col("__tc").cast(dec)).cast("double") /
        when(d1 > 0.0, lit(8.0) * d1))
    groups
      .join(jt, Seq("__g"), "left")
      .join(ties, Seq("__g"))
      .select(col("__g").as("group_key"), col("n"), col("n_groups"),
        coalesce(col("jt4"), lit(0).cast(dec)).cast("long").as("jt4"),
        ejt4.cast("long").as("ejt4"),
        when(col("n") >= 3L,
          Readout.pin((coalesce(col("jt4"), lit(0).cast(dec)) - ejt4)
            .cast("double") /
            sqrt(when(var16 > 0.0, var16)), 6)).as("z"))
      .orderBy("group_key")
  }

  /** Welch's one-way ANOVA (Welch 1951) — "do the group means differ"
    * without the equal-variance assumption classical ANOVA needs (and
    * corpus sources never satisfy): weights wₕ = nₕ/sₕ², the weighted
    * grand mean m* = Σwₕmₕ/W, and
    *
    *   F = [Σwₕ(mₕ−m*)²/(k−1)] / [1 + 2(k−2)/(k²−1)·Λ],
    *   Λ = Σ(1−wₕ/W)²/(nₕ−1),  df₂ = (k²−1)/(3Λ).
    *
    * The parametric companion to [[kruskalWallis]] (ranks) and
    * [[brownForsythe]] (spread): one tests location on values, one on
    * ranks, one tests scale. Groups with n < 2 or zero variance carry
    * no weight-able variance and are EXCLUDED from k (documented
    * Welch convention — their sₕ² = 0 would send wₕ → ∞).
    *
    * Determinism contract: per-group n/Σv/Σv² ride exact decimals
    * (the abTest discipline); every cross-group sum rounds its
    * per-group addend to 10dp decimal(28,10) first (group order
    * differs between engines); F and df₂ are pinned double readouts
    * at 6dp, NULL when k < 2 via the guards. Returns ONE row
    * `(k, n, f_stat, df2)`.
    *
    * Scale shape: one grouped aggregate to the strata frame
    * (dimension-sized), two strata-frame aggregates, one readout. */
  def welchAnova(
      df: DataFrame,
      groupCol: String,
      valueCol: String): DataFrame = {
    val v = col(valueCol)
    val g = df
      .filter(v.isNotNull)
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("__n"),
        sum(v.cast("decimal(18,4)")).as("__sv"),
        sum(round(v * v, 8).cast("decimal(28,8)")).as("__ss"))
    val nd = col("__n").cast("double")
    val m = col("__sv").cast("double") / nd
    val s2 = (col("__ss").cast("double") - nd * m * m) / (nd - 1.0)
    val dec10 = (c: Column) => round(c, 10).cast("decimal(28,10)")
    // keep only weight-able groups: n >= 2 and positive variance
    val strata = Lineage.cutLocal(g
      .filter(col("__n") >= 2L)
      .select(col("__n"), m.as("__m"), s2.as("__s2"))
      .filter(col("__s2") > 0.0)
      .withColumn("__w", col("__n").cast("double") / col("__s2")))
    val w1 = broadcast(strata.agg(
      count(lit(1)).as("k"), sum("__n").as("n"),
      sum(dec10(col("__w"))).as("__sw"),
      sum(dec10(col("__w") * col("__m"))).as("__swm")))
    val mstar = (col("__swm").cast("double") / col("__sw").cast("double"))
      .as("__mstar")
    val w2 = strata.crossJoin(w1.select(col("__sw"), mstar))
      .select(
        dec10(col("__w") * (col("__m") - col("__mstar")) *
          (col("__m") - col("__mstar"))).as("__num"),
        dec10(((lit(1.0) - col("__w") / col("__sw").cast("double")) *
          (lit(1.0) - col("__w") / col("__sw").cast("double"))) /
          (col("__n").cast("double") - 1.0)).as("__lam"))
      .agg(sum("__num").as("__a"), sum("__lam").as("__l"))
    val kd = col("k").cast("double")
    val lam = col("__l").cast("double")
    w1.select(col("k"), col("n")).crossJoin(broadcast(w2))
      .select(col("k"), col("n"),
        when(col("k") >= 2L,
          round((col("__a").cast("double") / (kd - 1.0)) /
            (lit(1.0) + lit(2.0) * (kd - 2.0) / (kd * kd - 1.0) * lam),
            6)).as("f_stat"),
        when(col("k") >= 2L && lam > 0.0,
          round((kd * kd - 1.0) / (lit(3.0) * lam), 6)).as("df2"))
  }

  /** Neyman-optimal sample allocation across strata (Neyman 1934) —
    * "given a labeling/eval budget of n units, how many should each
    * stratum get": aₕ = n·NₕSₕ / Σ NₕSₕ, proportional to stratum size
    * × stratum standard deviation, which minimizes the variance of
    * the stratified mean at fixed n. The planning step BEFORE
    * [[graft.operators.Sampling.capPerGroup]]/hash-sampling realize
    * the draw — equal allocation over-samples homogeneous strata,
    * proportional allocation over-samples low-variance big ones.
    *
    * Determinism contract: counts and Σv/Σv² ride exact decimals
    * (the abTest discipline); each stratum weight NₕSₕ rounds to
    * 10dp decimal(28,10) before the group-order-independent total;
    * shares and allocations are pinned double expressions rounded at
    * 6dp. Degenerate strata (n < 2 or zero variance) carry weight 0
    * and allocation 0 — they need no sample to know their mean.
    *
    * Scale shape: one grouped aggregate to the strata frame
    * (dimension-sized), one broadcast total, one readout. */
  def neymanAllocation(
      df: DataFrame,
      groupCols: Seq[String],
      valueCol: String,
      budget: Long): DataFrame = {
    require(groupCols.nonEmpty, "need at least one group column")
    require(budget > 0, "budget must be positive")
    val v = col(valueCol)
    val agg = df.groupBy(groupCols.map(col): _*).agg(
      count(when(v.isNotNull, 1L)).as("n"),
      sum(v.cast("decimal(18,4)")).as("__sv"),
      sum(round(v * v, 8).cast("decimal(28,8)")).as("__ss"))
    val nd = col("n").cast("double")
    val m = col("__sv").cast("double") / when(col("n") > 0L, nd)
    val varr = (col("__ss").cast("double") - nd * m * m) /
      (when(col("n") >= 2L, nd) - 1.0)
    val sd = sqrt(when(varr > 0.0, varr))
    val weighted = agg.withColumn("__w",
      coalesce(round(nd * sd, 10).cast("decimal(28,10)"),
        lit(0).cast("decimal(28,10)")))
    val tot = broadcast(weighted.agg(sum("__w").as("__wt")))
    weighted.crossJoin(tot)
      .select(groupCols.map(col) ++ Seq(
        col("n"),
        round(coalesce(sd, lit(0.0)), 6).as("stddev"),
        round(lit(budget).cast("double") *
          col("__w").cast("double") /
          when(col("__wt").cast("double") > 0.0,
            col("__wt").cast("double")), 6).as("allocated")): _*)
      .orderBy(groupCols.map(col): _*)
  }

  /** Durbin–Watson lag-1 autocorrelation statistic per group —
    * "are this series' residuals independent, or does each value echo
    * the previous one": d = Σ_{t≥2}(e_t − e_{t−1})² / Σ e_t², e = v −
    * group mean. d ≈ 2 means independent, → 0 positive
    * autocorrelation, → 4 negative — the standard post-regression /
    * drift-monitoring residual check.
    *
    * Determinism contract: values ride 4dp micro-unit BIGINTs; the
    * mean CANCELS in consecutive differences, so the numerator is
    * Σ(Δvu)² on exact integers, and the denominator uses the identity
    * n·Σe² = n·Σvu² − (Σvu)² — also exact. One pinned double division
    * at the readout; NULL on a constant series (zero variance) or
    * n < 2.
    *
    * Scale shape: NO per-group global window — the time ranks come
    * from [[graft.operators.Packing.groupedRank]] (range partition +
    * local row_number + broadcast offsets), and the lag pairing is an
    * equi-join on (group, rank) = (group, rank+1). `ordCol` must be
    * unique within each group (the groupedRank contract — pack a
    * unique id behind the timestamp). Returns
    * `(group_key, n, dw)`. */
  def durbinWatson(
      df: DataFrame,
      groupCol: String,
      ordCol: String,
      valueCol: String): DataFrame = {
    val rows = df
      .filter(col(valueCol).isNotNull && col(ordCol).isNotNull)
      .select(col(groupCol).as("__g"), col(ordCol).as("__o"),
        (round(col(valueCol).cast("double"), 4).cast("decimal(18,4)") *
          10000).cast("long").as("__vu"))
    val ranked = Lineage.cutLocal(
      graft.operators.Packing.groupedRank(rows, "__g", "__o", Seq("__vu")))
    val lagged = ranked.select(col("__g"), col("rank"), col("__vu"))
      .join(ranked.select(col("__g"), (col("rank") + 1L).as("rank"),
        col("__vu").as("__prev")), Seq("__g", "rank"))
    val num = lagged.groupBy(col("__g")).agg(
      sum(((col("__vu") - col("__prev")).cast("decimal(19,0)") *
        (col("__vu") - col("__prev")).cast("decimal(19,0)"))
        .cast("decimal(38,0)")).as("__sd2"))
    val base = rows.groupBy(col("__g")).agg(
      count(lit(1)).as("n"),
      sum(col("__vu").cast("decimal(38,0)")).as("__svu"),
      sum((col("__vu").cast("decimal(19,0)") *
        col("__vu").cast("decimal(19,0)")).cast("decimal(38,0)"))
        .as("__svu2"))
    val den = (col("n").cast("decimal(38,0)") * col("__svu2") -
      col("__svu") * col("__svu")).cast("double")
    base.join(num, Seq("__g"), "left")
      .select(col("__g").as("group_key"), col("n"),
        when(col("n") >= 2L, Readout.pin(
          (col("n").cast("decimal(38,0)") *
            coalesce(col("__sd2"), lit(0).cast("decimal(38,0)")))
            .cast("double") / when(den > 0.0, den), 6)).as("dw"))
      .orderBy("group_key")
  }

  /** Wald–Wolfowitz runs test per group — "is this sequence random, or
    * do above/below-median values clump": the series dichotomizes
    * against its group median (exact-tie rows dropped, the standard
    * treatment), R = number of sign runs in time order, compared to
    * E[R] = 2·n1·n2/n + 1 with the exact variance. A clumping source
    * (regime-switching quality, batched ingestion) shows R far below
    * E[R] — the nonparametric drift smell test beside [[cusum]] and
    * [[pettitt]].
    *
    * Determinism contract: medians are `percentile` doubles (Spark ==
    * DuckDB bit-for-bit on interpolation), run/side counts exact
    * integers through the same groupedRank + (g, rank)-join shape as
    * [[durbinWatson]] (re-ranked AFTER the tie drop, so runs count
    * over the surviving sequence); z is one pinned double, NULL when
    * either side is empty or the variance is 0.
    *
    * Returns `(group_key, n1, n2, runs, z)`. */
  def runsTest(
      df: DataFrame,
      groupCol: String,
      ordCol: String,
      valueCol: String): DataFrame = {
    val vals = df
      .filter(col(valueCol).isNotNull && col(ordCol).isNotNull)
      .select(col(groupCol).as("__g"), col(ordCol).as("__o"),
        col(valueCol).cast("double").as("__v"))
    val med = vals.groupBy("__g")
      .agg(expr("percentile(__v, 0.5)").as("__med"))
    val signed = vals.join(broadcast(med), Seq("__g"))
      .filter(col("__v") =!= col("__med"))
      .select(col("__g"), col("__o"),
        when(col("__v") > col("__med"), 1L).otherwise(0L).as("__s"))
    val ranked = Lineage.cutLocal(
      graft.operators.Packing.groupedRank(signed, "__g", "__o",
        Seq("__s")))
    val flips = ranked.select(col("__g"), col("rank"), col("__s"))
      .join(ranked.select(col("__g"), (col("rank") + 1L).as("rank"),
        col("__s").as("__ps")), Seq("__g", "rank"))
      .groupBy("__g")
      .agg(sum(when(col("__s") =!= col("__ps"), 1L).otherwise(0L))
        .as("__flips"))
    val sides = ranked.groupBy("__g").agg(
      sum(col("__s")).as("n1"),
      sum(lit(1L) - col("__s")).as("n2"))
    val n1d = col("n1").cast("double")
    val n2d = col("n2").cast("double")
    val nd = n1d + n2d
    val eR = lit(2.0) * n1d * n2d / nd + 1.0
    val varR = (lit(2.0) * n1d * n2d * (lit(2.0) * n1d * n2d - nd)) /
      (nd * nd * (nd - 1.0))
    sides.join(flips, Seq("__g"), "left")
      .select(col("__g").as("group_key"), col("n1"), col("n2"),
        (coalesce(col("__flips"), lit(0L)) + 1L).as("runs"),
        when(col("n1") >= 1L && col("n2") >= 1L && (col("n1") + col("n2")) >= 2L,
          Readout.pin(
            ((coalesce(col("__flips"), lit(0L)) + 1L).cast("double") - eR) /
              sqrt(when(varR > 0.0, varR)), 6)).as("z"))
      .orderBy("group_key")
  }

  /** Cochran's Q — "do these k binary treatments have the same success
    * rate across subjects" (the k-treatment generalization of McNemar,
    * [[mcnemar]]): Q = (k−1)·(k·ΣC_j² − (ΣC_j)²) / (k·ΣR_i − ΣR_i²),
    * C_j = per-treatment success totals, R_i = per-subject success
    * totals, over the complete subject×treatment incidence grid
    * (absent cells are failures). χ²(k−1) under H0.
    *
    * Determinism contract: every sufficient statistic is an exact
    * integer (decimal(38,0) squares); Q is one pinned double division,
    * NULL when the denominator is 0 (all-success/all-failure rows
    * carry no information).
    *
    * Scale shape: two aggregates over the incidence frame (by subject,
    * by treatment) — subjects are data-sized but only their SUMS
    * cross the driver boundary (single-row readout), treatments are
    * dimension-sized. Returns one row
    * `(k, n_subjects, q_stat, df)`. */
  def cochranQ(
      df: DataFrame,
      subjectCol: String,
      treatmentCol: String,
      successCol: String): DataFrame = {
    val inc = df.select(col(subjectCol).as("__s"),
      col(treatmentCol).as("__t"),
      when(col(successCol).cast("boolean"), 1L).otherwise(0L).as("__x"))
      .groupBy("__s", "__t")
      .agg(max(col("__x")).as("__x"))
    val k = inc.agg(countDistinct(col("__t")).as("k"))
    val byTreat = inc.groupBy("__t").agg(sum("__x").as("__c"))
      .agg(sum(col("__c").cast("decimal(38,0)")).as("__sc"),
        sum((col("__c").cast("decimal(19,0)") *
          col("__c").cast("decimal(19,0)")).cast("decimal(38,0)"))
          .as("__sc2"))
    val bySubj = inc.groupBy("__s").agg(sum("__x").as("__r"))
      .agg(count(lit(1)).as("n_subjects"),
        sum(col("__r").cast("decimal(38,0)")).as("__sr"),
        sum((col("__r").cast("decimal(19,0)") *
          col("__r").cast("decimal(19,0)")).cast("decimal(38,0)"))
          .as("__sr2"))
    val kd = col("k").cast("decimal(38,0)")
    val num = (kd - 1).cast("decimal(38,0)") *
      (kd * col("__sc2") - col("__sc") * col("__sc"))
    val den = (kd * col("__sr") - col("__sr2")).cast("double")
    k.crossJoin(byTreat).crossJoin(bySubj)
      .select(col("k"), col("n_subjects"),
        Readout.pin(num.cast("double") / when(den > 0.0, den), 6)
          .as("q_stat"),
        (col("k") - 1L).as("df"))
  }

  /** Grubbs' test per group — "is this group's most extreme value a
    * statistical outlier": G = max|v − x̄| / s, with the offending
    * value alongside. The single-point complement to
    * [[tukeyOutliers]]' fence counting — a data-quality triage readout
    * ("which source produced THE spike").
    *
    * Determinism contract: the max deviation rides exact micro-unit
    * integers (max|n·vu − Σvu| — scaling by n avoids the double mean),
    * the argmax value breaks ties to the LARGER value via a struct
    * max; G is one pinned double expression, NULL for n < 3 or zero
    * variance.
    *
    * Scale shape: one grouped aggregate, no window, no collect.
    * Returns `(group_key, n, g_stat, outlier_value)`. */
  def grubbs(
      df: DataFrame,
      groupCol: String,
      valueCol: String): DataFrame = {
    val rows = df.filter(col(valueCol).isNotNull)
      .select(col(groupCol).as("__g"),
        (round(col(valueCol).cast("double"), 4).cast("decimal(18,4)") *
          10000).cast("long").as("__vu"))
    val agg = rows.groupBy("__g").agg(
      count(lit(1)).as("n"),
      sum(col("__vu").cast("decimal(38,0)")).as("__svu"),
      sum((col("__vu").cast("decimal(19,0)") *
        col("__vu").cast("decimal(19,0)")).cast("decimal(38,0)"))
        .as("__svu2"))
    val dev = rows.join(agg.select(col("__g"), col("n"), col("__svu")),
      Seq("__g"))
      .select(col("__g"),
        struct(
          abs((col("n").cast("decimal(38,0)") * col("__vu")
            .cast("decimal(38,0)") - col("__svu")).cast("decimal(38,0)"))
            .as("__ad"),
          col("__vu")).as("__p"))
      .groupBy("__g").agg(max(col("__p")).as("__m"))
    val nd = col("n").cast("double")
    val varScaled = (col("n").cast("decimal(38,0)") * col("__svu2") -
      col("__svu") * col("__svu")).cast("double")
    agg.join(dev, Seq("__g"))
      .select(col("__g").as("group_key"), col("n"),
        when(col("n") >= 3L, Readout.pin(
          col("__m.__ad").cast("double") /
            (nd * sqrt(when(varScaled > 0.0, varScaled) /
              (nd * (nd - 1.0)))), 6)).as("g_stat"),
        Readout.pin(col("__m.__vu").cast("double") / 10000.0, 4)
          .as("outlier_value"))
      .orderBy("group_key")
  }

  /** Friedman rank test — "do k treatments differ when measured on the
    * same blocks" (the rank-based repeated-measures ANOVA; the
    * k-treatment sibling of the paired [[wilcoxonSignedRank]] family
    * and the block-designed counterpart of [[kruskalWallis]]):
    * treatments are ranked WITHIN each complete block, χ²_F compares
    * per-treatment rank sums to their null mean, with the standard
    * tie-correction factor C = 1 − ΣT/(n·(k³−k)).
    *
    * Determinism contract: cell values aggregate as exact
    * decimal(18,4) sums and rank by exact decimal comparison; ranks
    * ride the ×2-scaled average-rank integers (the aq72-aq79 rank
    * discipline), tie masses Σ(t³−t) are exact; χ²_F is ONE pinned
    * double expression, NULL when k < 2, no complete block exists, or
    * every block is fully tied (C ≤ 0). Incomplete blocks (a missing
    * treatment cell) are dropped — Friedman is defined on complete
    * blocks.
    *
    * Scale shape: one (block, treatment) aggregate, a k²-bounded
    * within-block self-join for ranks (k is dimension-sized), exact
    * integer sums to a single-row readout. Returns
    * `(k, n_blocks, chi2_f, df)`. */
  def friedman(
      df: DataFrame,
      blockCol: String,
      treatCol: String,
      valueCol: String): DataFrame = {
    val cells = Lineage.cutLocal(df
      .filter(col(valueCol).isNotNull)
      .groupBy(col(blockCol).as("__b"), col(treatCol).as("__t"))
      .agg(sum(col(valueCol).cast("decimal(18,4)")).as("__v")))
    val kf = broadcast(cells.agg(countDistinct(col("__t")).as("k")))
    val complete = Lineage.cutLocal(cells
      .join(broadcast(cells.groupBy("__b")
        .agg(count(lit(1)).as("__bk")).crossJoin(kf)
        .filter(col("__bk") === col("k")).select("__b")), Seq("__b")))
    // x2-scaled average rank within the block: 2*cntLess + cntEqIncl + 1
    val r2 = complete.as("x").join(complete.as("y"), col("x.__b") === col("y.__b"))
      .groupBy(col("x.__b").as("__b"), col("x.__t").as("__t"))
      .agg((lit(2L) * sum(when(col("y.__v") < col("x.__v"), 1L).otherwise(0L)) +
        sum(when(col("y.__v") === col("x.__v"), 1L).otherwise(0L)) + 1L)
        .as("__r2"))
    val perTreat = r2.groupBy("__t")
      .agg(sum(col("__r2").cast("decimal(38,0)")).as("__s2"))
      .agg(count(lit(1)).as("__kt"),
        sum((col("__s2") * col("__s2")).cast("decimal(38,0)")).as("__sr2q"))
    val blocks = complete.groupBy("__b").agg(count(lit(1)).as("__cnt"))
      .agg(count(lit(1)).as("n_blocks"))
    val ties = complete.groupBy("__b", "__v").agg(count(lit(1)).as("__tc"))
      .agg(coalesce(sum((col("__tc").cast("decimal(19,0)") *
        col("__tc").cast("decimal(19,0)") * col("__tc").cast("decimal(19,0)") -
        col("__tc").cast("decimal(19,0)")).cast("decimal(38,0)")),
        lit(0).cast("decimal(38,0)")).as("__tm"))
    val kd = col("k").cast("double")
    val nd = col("n_blocks").cast("double")
    val c = lit(1.0) - col("__tm").cast("double") /
      (nd * (kd * kd * kd - kd))
    val raw = lit(12.0) * (col("__sr2q").cast("double") / 4.0) /
      (nd * kd * (kd + 1.0)) - lit(3.0) * nd * (kd + 1.0)
    kf.crossJoin(blocks).crossJoin(perTreat).crossJoin(ties)
      .select(col("k"), col("n_blocks"),
        when(col("k") >= 2L && col("n_blocks") >= 1L,
          Readout.pin(raw / when(c > 0.0, c), 6)).as("chi2_f"),
        (col("k") - 1L).as("df"))
  }

  /** Relative risk with the Katz log-normal 95% CI — the 2×2 cohort
    * readout ([[twoProportion]] reports the difference z; this reports
    * the RATIO with its interval, the form dose/exposure questions are
    * asked in): RR = (a/(a+b)) / (c/(c+d)) over the exposed/unexposed
    * × event/no-event counts, CI = exp(ln RR ± 1.96·√(1/a − 1/(a+b) +
    * 1/c − 1/(c+d))).
    *
    * Determinism contract: the four cells are exact integers; RR and
    * both bounds are pinned single double expressions with the
    * division order written identically in the oracle. NULL when
    * either margin is empty or a log/CI cell (a or c) is zero.
    *
    * Scale shape: one grouped aggregate of four conditional counts.
    * Returns `(group_key, a, b, c, d, rr, rr_lo, rr_hi)`. */
  def relativeRisk(
      df: DataFrame,
      groupCol: String,
      exposedCol: String,
      eventCol: String): DataFrame = {
    val ex = col(exposedCol).cast("boolean")
    val ev = col(eventCol).cast("boolean")
    val agg = df.groupBy(col(groupCol).as("group_key")).agg(
      count(when(ex && ev, 1L)).as("a"),
      count(when(ex && !ev, 1L)).as("b"),
      count(when(!ex && ev, 1L)).as("c"),
      count(when(!ex && !ev, 1L)).as("d"))
    val (a, b, c, d) = (col("a").cast("double"), col("b").cast("double"),
      col("c").cast("double"), col("d").cast("double"))
    val ok = col("a") > 0L && col("c") > 0L &&
      (col("a") + col("b")) > 0L && (col("c") + col("d")) > 0L
    val rr = (a / (a + b)) / (c / (c + d))
    val se = sqrt(lit(1.0) / a - lit(1.0) / (a + b) +
      lit(1.0) / c - lit(1.0) / (c + d))
    agg.select(col("group_key"), col("a"), col("b"), col("c"), col("d"),
      when(ok, Readout.pin(rr, 6)).as("rr"),
      when(ok, Readout.pin(exp(log(rr) - lit(1.96) * se), 6)).as("rr_lo"),
      when(ok, Readout.pin(exp(log(rr) + lit(1.96) * se), 6)).as("rr_hi"))
      .orderBy("group_key")
  }

  /** Odds ratio with the Woolf (1955) log-normal 95% CI — the 2×2
    * companion to [[relativeRisk]] for case-control shaped questions
    * (RR needs cohort denominators; OR = (a·d)/(b·c) is margin-free
    * and is what logistic coefficients exponentiate to):
    * CI = exp(ln OR ± 1.96·√(1/a + 1/b + 1/c + 1/d)).
    *
    * Determinism contract: the four cells are exact integers; OR and
    * both bounds are pinned single double expressions with the
    * multiplication/division order written identically in the oracle.
    * NULL when ANY cell is zero (every cell sits in a Woolf
    * denominator — the usual Haldane +0.5 correction is a different
    * estimator, not silently substituted here).
    *
    * Scale shape: one grouped aggregate of four conditional counts —
    * map-side partials, |groups| rows, nothing else moves.
    * Returns `(group_key, a, b, c, d, odds_ratio, or_lo, or_hi)`. */
  def oddsRatio(
      df: DataFrame,
      groupCol: String,
      exposedCol: String,
      eventCol: String): DataFrame = {
    val ex = col(exposedCol).cast("boolean")
    val ev = col(eventCol).cast("boolean")
    val agg = df.groupBy(col(groupCol).as("group_key")).agg(
      count(when(ex && ev, 1L)).as("a"),
      count(when(ex && !ev, 1L)).as("b"),
      count(when(!ex && ev, 1L)).as("c"),
      count(when(!ex && !ev, 1L)).as("d"))
    val (a, b, c, d) = (col("a").cast("double"), col("b").cast("double"),
      col("c").cast("double"), col("d").cast("double"))
    val ok = col("a") > 0L && col("b") > 0L &&
      col("c") > 0L && col("d") > 0L
    val or = (a * d) / (b * c)
    val se = sqrt(lit(1.0) / a + lit(1.0) / b +
      lit(1.0) / c + lit(1.0) / d)
    agg.select(col("group_key"), col("a"), col("b"), col("c"), col("d"),
      when(ok, Readout.pin(or, 6)).as("odds_ratio"),
      when(ok, Readout.pin(exp(log(or) - lit(1.96) * se), 6)).as("or_lo"),
      when(ok, Readout.pin(exp(log(or) + lit(1.96) * se), 6)).as("or_hi"))
      .orderBy("group_key")
  }

  /** Cliff's delta (Cliff 1993) — the ordinal effect size the
    * Mann–Whitney z hides: δ = (#{a>b} − #{a<b}) / (n_a·n_b) ∈ [−1, 1],
    * per group. Reads directly as "probability a random A exceeds a
    * random B, minus the reverse" — the magnitude readout to pair with
    * [[mannWhitney]]'s significance.
    *
    * Determinism contract: both pair counts are EXACT integers carried
    * as decimal(38,0) (n_a·n_b can pass 2⁶³ at 100 TB); δ is one
    * division of exact integers pinned to 6dp. A group missing either
    * cohort reports NULL δ.
    *
    * Scale shape: the [[mannWhitney]] shape per group — one (group,
    * value) aggregate with map-side partials, then a cumulative count
    * over each group's measurement GRID (per-group ordered window,
    * partitioned by group — never a global sort), one |groups|-row
    * readout. Returns `(group_key, n_a, n_b, delta)`. */
  def cliffsDelta(
      df: DataFrame,
      groupCol: String,
      cohortCol: String,
      valueCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val dec = "decimal(38,0)"
    val inA = col(cohortCol).cast("boolean")
    val perValue = df
      .filter(col(valueCol).isNotNull && col(cohortCol).isNotNull)
      .groupBy(col(groupCol).as("group_key"), col(valueCol).as("__v"))
      .agg(
        sum(when(inA, 1L).otherwise(0L)).as("__na"),
        sum(when(!inA, 1L).otherwise(0L)).as("__nb"))
    val below = Window.partitionBy("group_key").orderBy("__v")
      .rowsBetween(Window.unboundedPreceding, -1)
    perValue
      .withColumn("__cb", coalesce(sum(col("__nb")).over(below), lit(0L)))
      .groupBy("group_key")
      .agg(
        sum(col("__na")).as("n_a"),
        sum(col("__nb")).as("n_b"),
        sum((col("__na").cast(dec) * col("__cb").cast(dec)).cast(dec))
          .as("__gt"),
        sum((col("__na").cast(dec) *
          (col("__cb") + col("__nb")).cast(dec)).cast(dec)).as("__le"))
      .select(col("group_key"), col("n_a"), col("n_b"),
        when(col("n_a") > 0L && col("n_b") > 0L,
          Readout.pin(
            (col("__gt").cast("double") -
              (col("n_a").cast(dec) * col("n_b").cast(dec) -
                col("__le")).cast("double")) /
              (col("n_a").cast(dec) * col("n_b").cast(dec)).cast("double"),
            6)).as("delta"))
      .orderBy("group_key")
  }

  /** Jarque–Bera normality test (Jarque & Bera 1980) per group —
    * skewness g₁, excess kurtosis g₂, and JB = n/6·(g₁² + g₂²/4): the
    * one-pass "is this metric even close to normal" gate to run BEFORE
    * trusting any t/z readout on it.
    *
    * Determinism contract: values quantize to integer cents
    * (floor(v·100) — floor, not round: engines disagree on half-away
    * vs half-even for doubles) and the four power sums Σvᵢ..Σvᵢ⁴ are
    * EXACT decimal(38,0) integers (cents ≤ 10⁶ keep Σv⁴ under 10³⁸ at
    * 10¹² rows/group); every moment is then ONE fixed-order double
    * expression of those exact sums, pinned to 6dp. Groups with n < 2
    * or zero variance report NULL.
    *
    * Scale shape: one grouped aggregate with map-side partials —
    * |groups| rows out, no second pass (central moments come from raw
    * power sums algebraically, not from a mean-subtracting re-scan).
    * Returns `(group_key, n, skewness, kurtosis, jb)`. */
  def jarqueBera(
      df: DataFrame,
      groupCol: String,
      valueCol: String): DataFrame = {
    val dec = "decimal(38,0)"
    val v = floor(col(valueCol).cast("double") * lit(100.0)).cast(dec)
    val agg = df.filter(col(valueCol).isNotNull)
      .groupBy(col(groupCol).as("group_key"))
      .agg(
        count(lit(1)).as("n"),
        sum(v).as("__s1"),
        sum((v * v).cast(dec)).as("__s2"),
        sum((v * v * v).cast(dec)).as("__s3"),
        sum((v * v * v * v).cast(dec)).as("__s4"))
    val n = col("n").cast("double")
    val m = col("__s1").cast("double") / n
    val r2 = col("__s2").cast("double") / n
    val r3 = col("__s3").cast("double") / n
    val r4 = col("__s4").cast("double") / n
    val m2 = r2 - m * m
    val m3 = r3 - lit(3.0) * m * r2 + lit(2.0) * m * m * m
    val m4 = r4 - lit(4.0) * m * r3 + lit(6.0) * m * m * r2 -
      lit(3.0) * m * m * m * m
    val g1 = m3 / sqrt(m2 * m2 * m2)
    val g2 = m4 / (m2 * m2) - lit(3.0)
    val ok = col("n") >= 2L && m2 > 0.0
    agg.select(col("group_key"), col("n"),
      when(ok, Readout.pin(g1, 6)).as("skewness"),
      when(ok, Readout.pin(g2, 6)).as("kurtosis"),
      when(ok, Readout.pin(
        n / 6.0 * (g1 * g1 + g2 * g2 / 4.0), 6)).as("jb"))
      .orderBy("group_key")
  }

  /** Bartlett's test of variance homogeneity (Bartlett 1937) across k
    * groups — the precondition check classical ANOVA assumes and
    * [[welchAnova]] exists to avoid; reporting it makes the
    * equal-variance assumption AUDITABLE instead of silent:
    *
    *   T = ((N−k)·ln S²_p − Σ(nᵢ−1)·ln S²ᵢ) / C,
    *   C = 1 + (Σ 1/(nᵢ−1) − 1/(N−k)) / (3(k−1)),  df = k−1.
    *
    * Determinism contract: per-group variances come from exact
    * integer-cent power sums (the [[jarqueBera]] quantization) as
    * fixed-order double expressions; the three cross-group sums
    * (Σ(nᵢ−1)S²ᵢ for the pooled variance, Σ(nᵢ−1)ln S²ᵢ, Σ1/(nᵢ−1))
    * round each group's term to 8/10dp and sum as DECIMAL —
    * order-independent, since group order differs between engines
    * (the brier-decomposition discipline). Groups with n < 2 or zero
    * variance are excluded from the test (standard practice — their
    * ln S²ᵢ is undefined); T is NULL when fewer than 2 groups remain.
    *
    * Scale shape: one grouped aggregate (map-side partials) to the
    * |groups|-row frame, then a 1-row readout. Returns ONE row
    * `(k, n, t_stat, df)`. */
  def bartlett(
      df: DataFrame,
      groupCol: String,
      valueCol: String): DataFrame = {
    val dec = "decimal(38,0)"
    val v = floor(col(valueCol).cast("double") * lit(100.0)).cast(dec)
    val per = df.filter(col(valueCol).isNotNull)
      .groupBy(col(groupCol).as("__g"))
      .agg(count(lit(1)).as("__n"), sum(v).as("__s1"),
        sum((v * v).cast(dec)).as("__s2"))
      .filter(col("__n") >= 2L)
    val nd = col("__n").cast("double")
    // sample variance in VALUE units (cents² / 1e4), exact-int core
    val varI = (nd * col("__s2").cast("double") -
      col("__s1").cast("double") * col("__s1").cast("double")) /
      (nd * (nd - 1.0)) / lit(10000.0)
    val terms = per
      .withColumn("__var", varI)
      .filter(col("__var") > 0.0)
      .select(col("__n"),
        round((nd - 1.0) * col("__var"), 6)
          .cast("decimal(38,6)").as("__ssw"),
        round((nd - 1.0) * log(col("__var")), 8)
          .cast("decimal(38,8)").as("__lnw"),
        round(lit(1.0) / (nd - 1.0), 10)
          .cast("decimal(38,10)").as("__inv"))
      .agg(count(lit(1)).as("k"), sum(col("__n")).as("n"),
        sum(col("__ssw")).as("__ssws"), sum(col("__lnw")).as("__lnws"),
        sum(col("__inv")).as("__invs"))
    val kd = col("k").cast("double")
    val nk = (col("n") - col("k")).cast("double")
    val sp2 = col("__ssws").cast("double") / nk
    val cC = lit(1.0) +
      (col("__invs").cast("double") - lit(1.0) / nk) / (lit(3.0) * (kd - 1.0))
    terms.select(col("k"), col("n"),
      when(col("k") >= 2L && sp2 > 0.0,
        Readout.pin((nk * log(sp2) - col("__lnws").cast("double")) / cC, 6))
        .as("t_stat"),
      (col("k") - 1L).as("df"))
  }

  /** Page's trend test (Page 1963) for ordered alternatives on the
    * [[friedman]] layout — Friedman asks "do the k treatments differ
    * at all"; Page asks the sharper "do they INCREASE in a hypothesized
    * order" (dose levels, priority tiers, time buckets):
    *
    *   L = Σⱼ j·Rⱼ  (j = the treatment's hypothesized rank, Rⱼ its
    *   within-block rank sum),  E[L] = N·k(k+1)²/4,
    *   Var[L] = N·k²(k+1)(k²−1)/144,  z = (L − E[L]) / √Var[L].
    *
    * Determinism contract: ranks are the ×2-scaled mid-rank counting
    * trick ([[friedman]]'s — no window, no tie-break), so 2L is an
    * EXACT decimal(38,0) integer; z is one fixed-order double
    * expression, pinned to 6dp. Mid-ranks under ties keep E[L] exact
    * and make the no-ties variance conservative (the standard
    * treatment — documented, not corrected). Incomplete blocks are
    * excluded (as in [[friedman]]); k < 2 or no complete blocks
    * report NULL.
    *
    * The treatment order j comes from `orderExpr` evaluated per
    * treatment (dense rank over the k-sized treatment dimension — a
    * broadcast frame, never a data-sized sort).
    *
    * Scale shape: identical to [[friedman]] — per-block cell
    * aggregate, block-grid self-join bounded by k per block, k-row
    * and 1-row readouts. Returns ONE row `(k, n_blocks, l_stat, z)`. */
  def pageTrend(
      df: DataFrame,
      blockCol: String,
      treatCol: String,
      valueCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val dec = "decimal(38,0)"
    val cells = Lineage.cutLocal(df
      .filter(col(valueCol).isNotNull)
      .groupBy(col(blockCol).as("__b"), col(treatCol).as("__t"))
      .agg(sum(col(valueCol).cast("decimal(18,4)")).as("__v")))
    val kf = broadcast(cells.agg(countDistinct(col("__t")).as("k")))
    val complete = Lineage.cutLocal(cells
      .join(broadcast(cells.groupBy("__b")
        .agg(count(lit(1)).as("__bk")).crossJoin(kf)
        .filter(col("__bk") === col("k")).select("__b")), Seq("__b")))
    val r2 = complete.as("x")
      .join(complete.as("y"), col("x.__b") === col("y.__b"))
      .groupBy(col("x.__b").as("__b"), col("x.__t").as("__t"))
      .agg((lit(2L) * sum(when(col("y.__v") < col("x.__v"), 1L)
        .otherwise(0L)) +
        sum(when(col("y.__v") === col("x.__v"), 1L).otherwise(0L)) + 1L)
        .as("__r2"))
    // j = the treatment's hypothesized position: dense rank over the
    // k-sized treatment dimension (ascending natural order of the key)
    val order = broadcast(complete.select("__t").distinct()
      .withColumn("__j",
        dense_rank().over(Window.orderBy("__t")).cast("long")))
    val l2 = r2.join(order, Seq("__t"))
      .agg(coalesce(sum((col("__j").cast(dec) * col("__r2").cast(dec))
        .cast(dec)), lit(0).cast(dec)).as("__l2"))
    val blocks = complete.groupBy("__b").agg(count(lit(1)).as("__c"))
      .agg(count(lit(1)).as("n_blocks"))
    val kd = col("k").cast("double")
    val nd = col("n_blocks").cast("double")
    val lD = col("__l2").cast("double") / 2.0
    val eL = nd * kd * (kd + 1.0) * (kd + 1.0) / 4.0
    val varL = nd * kd * kd * (kd + 1.0) * (kd * kd - 1.0) / 144.0
    kf.crossJoin(blocks).crossJoin(l2)
      .select(col("k"), col("n_blocks"),
        when(col("n_blocks") >= 1L, round(lD, 1)).as("l_stat"),
        when(col("k") >= 2L && col("n_blocks") >= 1L,
          Readout.pin((lD - eL) / sqrt(varL), 6)).as("z"))
  }

  /** The one-sided z critical value TOST tests against (α = 0.05) —
    * a DRIVER-side Acklam literal shared by the Spark plan and the
    * generated oracle (the [[bhSelect]] threshold discipline: the
    * data path compares against the SAME constant in both engines). */
  def tostZCrit: Double =
    BigDecimal(invNorm(0.95)).setScale(6,
      BigDecimal.RoundingMode.HALF_UP).toDouble

  /** TOST equivalence test (Schuirmann 1987, two one-sided tests) —
    * [[abTest]] asks "is there a difference"; THIS asks the question
    * an A/A check, a migration, or a cheaper-variant rollout actually
    * needs: "is the difference provably SMALLER than a margin δ".
    * Absence of significance is not equivalence — TOST is:
    *
    *   z_lo = (Δ + δ) / se,   z_hi = (δ − Δ) / se,
    *   equivalent ⇔ min(z_lo, z_hi) > z₀.₉₅  (both one-sided tests
    *   reject at α = 0.05),   Δ = mean_a − mean_b, Welch se.
    *
    * Determinism contract: the [[abTest]] sufficient statistics
    * (exact decimal sums, Σv² at scale 8); Δ and both z pinned with
    * the operation order written identically in the oracle; the
    * critical value is ONE driver literal ([[tostZCrit]]) embedded in
    * both plans. Degenerate groups (an arm under 2, zero variance)
    * report NULL z and NULL verdict.
    *
    * Scale shape: one grouped aggregate — map-side partials, |groups|
    * rows. Returns `(group_key..., n_a, n_b, diff, z_lo, z_hi,
    * equivalent)`. */
  def tostEquivalence(
      df: DataFrame,
      metricCol: String,
      armA: Column,
      groupCols: Seq[String],
      margin: Double): DataFrame = {
    require(groupCols.nonEmpty, "need at least one group column")
    require(margin > 0.0, "equivalence margin must be positive")
    val v = col(metricCol)
    val dec = v.cast("decimal(18,4)")
    val sq = round(v * v, 8).cast("decimal(28,8)")
    val agg = df.groupBy(groupCols.map(col): _*)
      .agg(
        count(when(armA, v)).as("n_a"),
        count(when(!armA, v)).as("n_b"),
        sum(when(armA, dec)).as("__sv_a"),
        sum(when(!armA, dec)).as("__sv_b"),
        sum(when(armA, sq)).as("__ss_a"),
        sum(when(!armA, sq)).as("__ss_b"))
    val (na, nb) = (col("n_a"), col("n_b"))
    val ma = col("__sv_a").cast("double") / na
    val mb = col("__sv_b").cast("double") / nb
    val va = (col("__ss_a").cast("double") - na * ma * ma) / (na - 1) / na
    val vb = (col("__ss_b").cast("double") - nb * mb * mb) / (nb - 1) / nb
    val ok = na >= 2 && nb >= 2 && va + vb > 0.0
    val se = sqrt(va + vb)
    val zLo = ((ma - mb) + lit(margin)) / se
    val zHi = (lit(margin) - (ma - mb)) / se
    agg.select(
      groupCols.map(col) ++ Seq(
        na, nb,
        Readout.pin(ma - mb, 6).as("diff"),
        when(ok, Readout.pin(zLo, 4)).as("z_lo"),
        when(ok, Readout.pin(zHi, 4)).as("z_hi"),
        when(ok, Readout.pin(zLo, 4) > lit(tostZCrit) &&
          Readout.pin(zHi, 4) > lit(tostZCrit)).as("equivalent")): _*)
      .orderBy(groupCols.map(col): _*)
  }

  /** Cronbach's alpha (Cronbach 1951) over a subject × item score
    * grid — internal-consistency reliability: do the k items measure
    * one underlying trait (per-rater quality scores, per-heuristic
    * doc signals), or is the composite score noise:
    *
    *   α = k/(k−1) · (1 − Σᵢ S²ᵢ / S²_total),
    *
    * with S²ᵢ the per-item variance over subjects and S²_total the
    * variance of each subject's item-sum. Only COMPLETE subjects
    * (all k items present) enter — a missing cell would silently
    * shrink that subject's total.
    *
    * Determinism contract: cell scores are exact decimal sums scaled
    * to integer 10⁻⁴-units (decimal(38,0) — the friedman cell
    * discipline); per-item and total variances are fixed-order double
    * expressions of exact sums; the k per-item variances round to 6dp
    * and DECIMAL-sum (item order differs between engines — the
    * bartlett discipline); α is one pinned expression. NULL when
    * k < 2, fewer than 2 complete subjects, or S²_total = 0.
    *
    * Scale shape: one (subject, item) cell aggregate (map-side
    * partials), the friedman complete-block machinery (k-sized
    * broadcast), then k-ary and |subjects|-ary aggregates — nothing
    * row-sized moves after the first pass. Returns ONE row
    * `(k, n_subjects, alpha)`. */
  def cronbachAlpha(
      df: DataFrame,
      subjectCol: String,
      itemCol: String,
      valueCol: String): DataFrame = {
    val dec = "decimal(38,0)"
    val cells = Lineage.cutLocal(df
      .filter(col(valueCol).isNotNull)
      .groupBy(col(subjectCol).as("__s"), col(itemCol).as("__i"))
      .agg((sum(col(valueCol).cast("decimal(18,4)")) * 10000)
        .cast(dec).as("__c")))
    val kf = broadcast(cells.agg(countDistinct(col("__i")).as("k")))
    val complete = Lineage.cutLocal(cells
      .join(broadcast(cells.groupBy("__s")
        .agg(count(lit(1)).as("__sk")).crossJoin(kf)
        .filter(col("__sk") === col("k")).select("__s")), Seq("__s")))
    val nf = broadcast(complete.select("__s").distinct()
      .agg(count(lit(1)).as("n_subjects")))
    def sampleVar(n: Column, s1: Column, s2: Column) =
      (n.cast("double") * s2.cast("double") -
        s1.cast("double") * s1.cast("double")) /
        (n.cast("double") * (n.cast("double") - 1.0))
    val itemVars = complete.groupBy("__i")
      .agg(count(lit(1)).as("__n"), sum(col("__c")).as("__s1"),
        sum((col("__c") * col("__c")).cast(dec)).as("__s2"))
      .select(round(sampleVar(col("__n"), col("__s1"), col("__s2")), 6)
        .cast("decimal(38,6)").as("__vi"))
      .agg(sum(col("__vi")).as("__svi"))
    val totals = complete.groupBy("__s")
      .agg(sum(col("__c")).as("__t"))
      .agg(count(lit(1)).as("__nt"), sum(col("__t")).as("__t1"),
        sum((col("__t") * col("__t")).cast(dec)).as("__t2"))
    val vt = sampleVar(col("__nt"), col("__t1"), col("__t2"))
    val kd = col("k").cast("double")
    kf.crossJoin(nf).crossJoin(broadcast(itemVars)).crossJoin(totals)
      .select(col("k"), col("n_subjects"),
        when(col("k") >= 2L && col("n_subjects") >= 2L && vt > 0.0,
          Readout.pin(kd / (kd - 1.0) *
            (lit(1.0) - col("__svi").cast("double") / vt), 6)).as("alpha"))
  }

  /** Mood's median test — the coarsest, most outlier-proof k-group
    * location test ([[kruskalWallis]] uses full rank information;
    * Mood only asks "is each group above or below the POOLED
    * median", which survives any monotone contamination): a χ² of
    * independence on the group × {above, below} table, exact-tie
    * rows dropped (the standard treatment, as in [[runsTest]]).
    *
    * Determinism contract: the pooled median is a `percentile` double
    * (Spark == DuckDB quantile_cont bit-for-bit on interpolation —
    * the aq51 precedent); everything after is [[chi2Independence]]'s
    * exact counts and decimal-summed cell terms.
    *
    * Scale shape: one broadcast 1-row median aggregate, then the
    * chi2Independence shape (one (group, side) count pass, grid
    * joins). Returns ONE row `(n, n_rows, n_cols, dof, chi2,
    * cramers_v)`. */
  def moodMedian(
      df: DataFrame,
      groupCol: String,
      valueCol: String): DataFrame = {
    val rows = df.filter(col(valueCol).isNotNull &&
      col(groupCol).isNotNull)
    val med = broadcast(rows.agg(
      expr(s"percentile($valueCol, 0.5)").as("__med")))
    val sides = rows.crossJoin(med)
      .withColumn("__side",
        when(col(valueCol) > col("__med"), "above")
          .when(col(valueCol) < col("__med"), "below"))
      .filter(col("__side").isNotNull)
    chi2Independence(sides, groupCol, "__side")
  }

  /** Ljung–Box portmanteau test (Ljung & Box 1978) per group — "is
    * this series white noise, or does ANY autocorrelation up to lag m
    * survive": the whole-spectrum companion to [[durbinWatson]]'s
    * lag-1 readout,
    *
    *   r_j = Σ(v_t−v̄)(v_{t+j}−v̄) / Σ(v_t−v̄)²,
    *   LB  = n(n+2) · Σ_{j=1..m} r_j²/(n−j)   (~χ²_m under H₀).
    *
    * Determinism contract: the mean never materializes — multiplying
    * r_j through by n² makes numerator and denominator EXACT
    * decimal(38,0) integers of micro-unit sums
    * (n²·Σv_t·v_{t+j} − n·S·(A_j+B_j) + (n−j)·S², with A_j/B_j the
    * exact head/tail-trimmed sums; the [[durbinWatson]] quantization);
    * each r_j is one exact-integer division and LB is a fixed-order
    * expansion over j. Headroom: |v|·10⁴ ≤ 10⁷ keeps n²·Σv² under
    * 10³⁸ to n ≈ 10⁹ rows per group — beyond that, pre-aggregate the
    * series (the registry path) before testing. NULL r_j when n ≤ j;
    * NULL LB when n ≤ m or the variance is 0.
    *
    * Scale shape: ranks ride groupedRank (range partition + broadcast
    * offsets — never a per-group single-task sort); each lag is one
    * (group, rank+j) equi-join of the ranked frame against itself
    * (m small and fixed); everything aggregates to |groups| rows.
    * Returns `(group_key, n, r1..r_m, lb, df)`. */
  def ljungBox(
      df: DataFrame,
      groupCol: String,
      ordCol: String,
      valueCol: String,
      maxLag: Int = 3): DataFrame = {
    require(maxLag >= 1 && maxLag <= 6, "maxLag in [1, 6]")
    val dec = "decimal(38,0)"
    val rows = df
      .filter(col(valueCol).isNotNull && col(ordCol).isNotNull)
      .select(col(groupCol).as("__g"), col(ordCol).as("__o"),
        (round(col(valueCol).cast("double"), 4).cast("decimal(18,4)") *
          10000).cast("long").as("__vu"))
    val ranked = Lineage.cutLocal(
      graft.operators.Packing.groupedRank(rows, "__g", "__o", Seq("__vu"))
        .select(col("__g"), col("rank"), col("__vu")))
    val base = ranked.groupBy("__g").agg(
      count(lit(1)).as("n"),
      sum(col("__vu").cast(dec)).as("__s1"),
      sum((col("__vu").cast(dec) * col("__vu").cast(dec)).cast(dec))
        .as("__s2"))
    // head/tail-trimmed sums per lag, with n joined back onto the rows
    val withN = ranked.join(base.select(col("__g"), col("n")), Seq("__g"))
    val trimCols = (1 to maxLag).flatMap { j =>
      Seq(
        sum(when(col("rank") <= j, col("__vu").cast(dec))
          .otherwise(lit(0).cast(dec))).as(s"__head$j"),
        sum(when(col("rank") > col("n") - j, col("__vu").cast(dec))
          .otherwise(lit(0).cast(dec))).as(s"__tail$j"))
    }
    val trims = withN.groupBy("__g").agg(trimCols.head, trimCols.tail: _*)
    // one equi-join per lag: Σ v_t · v_{t+j}
    val crosses = (1 to maxLag).map { j =>
      ranked.select(col("__g"), (col("rank") + j).as("rank"),
          col("__vu").as("__prev"))
        .join(ranked, Seq("__g", "rank"))
        .groupBy("__g")
        .agg(coalesce(sum((col("__vu").cast(dec) *
          col("__prev").cast(dec)).cast(dec)),
          lit(0).cast(dec)).as(s"__x$j"))
    }
    val joined = crosses.foldLeft(base.join(trims, Seq("__g")))(
      (acc, c) => acc.join(c, Seq("__g"), "left"))
    val n = col("n").cast(dec)
    val nD = col("n").cast("double")
    val den = (n * (n * col("__s2") - col("__s1") * col("__s1"))
      .cast(dec)).cast(dec)
    def rj(j: Int): Column = {
      val aj = (col("__s1") - col(s"__tail$j")).cast(dec)
      val bj = (col("__s1") - col(s"__head$j")).cast(dec)
      val num = ((n * n).cast(dec) * coalesce(col(s"__x$j"),
        lit(0).cast(dec)) -
        (n * col("__s1")).cast(dec) * (aj + bj).cast(dec) +
        ((n - lit(j).cast(dec)).cast(dec) *
          (col("__s1") * col("__s1")).cast(dec)).cast(dec)).cast(dec)
      when(col("n") > j && den.cast("double") > 0.0,
        num.cast("double") / den.cast("double"))
    }
    val lb = nD * (nD + 2.0) * (1 to maxLag)
      .map(j => rj(j) * rj(j) / (nD - j.toDouble))
      .reduce(_ + _)
    joined.select(
      Seq(col("__g").as("group_key"), col("n")) ++
        (1 to maxLag).map(j =>
          when(col("n") > j && den.cast("double") > 0.0,
            Readout.pin(rj(j), 6)).as(s"r$j")) ++
        Seq(
          when(col("n") > maxLag && den.cast("double") > 0.0,
            Readout.pin(lb, 6)).as("lb"),
          lit(maxLag).cast("long").as("df")): _*)
      .orderBy("group_key")
  }

  /** Seasonal Mann–Kendall trend test (Hirsch & Slack 1984) — the
    * [[mannKendall]] that survives seasonality: a strong weekly/daily
    * cycle reads as noise (or worse, as trend) to plain MK, so pairs
    * are compared only WITHIN each season (Mondays with Mondays) and
    * the per-season S and tie-corrected variances ADD:
    *
    *   S = Σ_s S_s,   Var = Σ_s Var_s,   z with the ±1 continuity
    *   correction on the summed S.
    *
    * Determinism contract: the [[mannKendall]] 10⁻⁶-unit metric
    * quantization; S and every variance numerator are exact integers —
    * the variance products carry as decimal(38,0) (a 10⁹-point season
    * overflows the long n³ term plain MK tolerates at gate scale);
    * z is one pinned fixed-order double. Zero summed variance → NULL.
    *
    * Scale shape: the pair join gains the season key (pairs bounded
    * by Σ_s n_s² per group — strictly FEWER than plain MK's n²), tie
    * masses aggregate per (group, season) then per group. Returns
    * `(key, n, n_seasons, s_stat, z, trend)`. */
  def seasonalMannKendall(
      series: DataFrame,
      keyCol: String,
      seasonCol: String,
      tCol: String,
      yCol: String): DataFrame = {
    val dec = "decimal(38,0)"
    val base = Lineage.cutLocal(series.select(col(keyCol).as("key"),
      col(seasonCol).as("season"),
      col(tCol).cast("long").as("t"),
      (col(yCol).cast("decimal(24,6)") * 1000000).cast("long").as("y")))
    val s = base.as("i").join(base.as("j"),
        col("i.key") === col("j.key") &&
          col("i.season") === col("j.season") && col("i.t") < col("j.t"))
      .groupBy(col("i.key").as("key"))
      .agg(sum(when(col("j.y") > col("i.y"), 1L)
        .when(col("j.y") < col("i.y"), -1L).otherwise(0L)).as("__s"))
    val perSeason = base.groupBy("key", "season", "y")
      .agg(count(lit(1)).as("__tc"))
      .groupBy("key", "season")
      .agg(sum(col("__tc")).as("__ns"),
        sum((col("__tc").cast(dec) * (col("__tc") - 1L).cast(dec) *
          (lit(2L) * col("__tc") + 5L).cast(dec)).cast(dec)).as("__tt"))
    val agg = perSeason
      .select(col("key"), col("__ns"),
        ((col("__ns").cast(dec) * (col("__ns") - 1L).cast(dec) *
          (lit(2L) * col("__ns") + 5L).cast(dec)).cast(dec) -
          col("__tt")).as("__v18"))
      .groupBy("key")
      .agg(sum(col("__ns")).as("n"), count(lit(1)).as("n_seasons"),
        sum(col("__v18")).as("__var18"))
    val sd = sqrt(col("__var18").cast("double") / 18.0)
    val sStat = coalesce(col("__s"), lit(0L))
    val z = when(col("__var18") <= 0L, lit(null))
      .when(sStat > 0L, Readout.pin((sStat - 1L).cast("double") / sd, 6))
      .when(sStat < 0L, Readout.pin((sStat + 1L).cast("double") / sd, 6))
      .otherwise(lit(0.0))
    agg.join(s, Seq("key"), "left")
      .withColumn("z", z)
      .select(col("key"), col("n"), col("n_seasons"), sStat.as("s_stat"),
        col("z"),
        when(col("z").isNull, lit(null))
          .when(col("z") > 1.96, lit("increasing"))
          .when(col("z") < -1.96, lit("decreasing"))
          .otherwise(lit("none")).as("trend"))
      .orderBy("key")
  }

  /** Partial correlation (first-order) per group — the correlation
    * between x and y with a confounder z HELD CONSTANT: the
    * spurious-correlation check every observational metric readout
    * needs (x and y both trend with time-of-day; are they related
    * beyond that?):
    *
    *   r_xy·z = (r_xy − r_xz·r_yz) / √((1 − r_xz²)(1 − r_yz²)).
    *
    * Determinism contract: all nine moment sums are EXACT decimal
    * sums of decimal(18,4)-quantized values (the aq8 discipline);
    * each pairwise r is one fixed-order double expression in the
    * n-multiplied form (n·Σxy − ΣxΣy over the √ product — no /n
    * ordering surface); the partial r derives from the three UNROUNDED
    * r's and pins once. NULL when any variance or the partial
    * denominator is ≤ 0 (a |r| of exactly 1 makes the partial
    * undefined). Returns
    * `(group_key, n, r_xy, r_xz, r_yz, r_xy_z)`. */
  def partialCorrelation(
      df: DataFrame,
      groupCol: String,
      xCol: String,
      yCol: String,
      zCol: String): DataFrame = {
    val xd = col(xCol).cast("decimal(18,4)")
    val yd = col(yCol).cast("decimal(18,4)")
    val zd = col(zCol).cast("decimal(18,4)")
    val agg = df
      .filter(col(xCol).isNotNull && col(yCol).isNotNull &&
        col(zCol).isNotNull)
      .groupBy(col(groupCol).as("group_key"))
      .agg(count(lit(1)).as("n"),
        sum(xd).cast("double").as("sx"),
        sum(yd).cast("double").as("sy"),
        sum(zd).cast("double").as("sz"),
        sum(xd * xd).cast("double").as("sxx"),
        sum(yd * yd).cast("double").as("syy"),
        sum(zd * zd).cast("double").as("szz"),
        sum(xd * yd).cast("double").as("sxy"),
        sum(xd * zd).cast("double").as("sxz"),
        sum(yd * zd).cast("double").as("syz"))
    val n = col("n").cast("double")
    def varN(s: Column, ss: Column) = n * ss - s * s
    def r(sab: Column, sa: Column, sb: Column,
        saa: Column, sbb: Column) =
      (n * sab - sa * sb) / sqrt(varN(sa, saa) * varN(sb, sbb))
    val rxy = r(col("sxy"), col("sx"), col("sy"), col("sxx"), col("syy"))
    val rxz = r(col("sxz"), col("sx"), col("sz"), col("sxx"), col("szz"))
    val ryz = r(col("syz"), col("sy"), col("sz"), col("syy"), col("szz"))
    val okBase = col("n") >= 3L &&
      varN(col("sx"), col("sxx")) > 0.0 &&
      varN(col("sy"), col("syy")) > 0.0 &&
      varN(col("sz"), col("szz")) > 0.0
    val den = (lit(1.0) - rxz * rxz) * (lit(1.0) - ryz * ryz)
    agg.select(col("group_key"), col("n"),
      when(okBase, Readout.pin(rxy, 6)).as("r_xy"),
      when(okBase, Readout.pin(rxz, 6)).as("r_xz"),
      when(okBase, Readout.pin(ryz, 6)).as("r_yz"),
      when(okBase && den > 0.0,
        Readout.pin((rxy - rxz * ryz) / sqrt(den), 6)).as("r_xy_z"))
      .orderBy("group_key")
  }

  /** Intraclass correlation ICC(1,1) (one-way random effects) — "how
    * much of the metric's variance lives BETWEEN subjects vs within
    * them": the continuous-data reliability companion to
    * [[cronbachAlpha]] (repeated orders per customer, repeated scores
    * per document), and the number that decides whether per-subject
    * aggregation is even meaningful:
    *
    *   ICC = (MS_B − MS_W) / (MS_B + (k₀−1)·MS_W),
    *   k₀ = (N − Σnᵢ²/N) / (k−1)   (unbalanced-design group size).
    *
    * Determinism contract: per-subject counts and 10⁻⁴-unit sums are
    * exact; each subject's SSW/SSB contribution is a fixed-order
    * double rounded and DECIMAL-summed across subjects (order differs
    * between engines — the bartlett discipline) at 2dp, NOT the usual
    * 6: the terms are mean-SQUARES of a money-scaled metric (~10¹⁰),
    * and rounding a double to 6dp above ~10⁹ needs x·10⁶ > 2⁵³ — the
    * engines' rounding paths diverge there, so the grid must stay
    * within the exact-integer range (10¹⁰·10² ≪ 2⁵³). Same reasoning
    * pins ms_between/ms_within at 2dp; the unitless ICC pins at 6dp.
    * Σnᵢ² is an exact decimal. NULL when k < 2, N ≤ k (no
    * within-variance df), or the denominator is 0.
    *
    * Scale shape: one (subject) aggregate from per-row map-side
    * partials, one 1-row readout — subjects never cross the driver.
    * Returns ONE row `(k_subjects, n, ms_between, ms_within, icc)`. */
  def icc(
      df: DataFrame,
      subjectCol: String,
      valueCol: String): DataFrame = {
    val dec = "decimal(38,0)"
    val v = (col(valueCol).cast("decimal(18,4)") * 10000).cast(dec)
    val per = df.filter(col(valueCol).isNotNull)
      .groupBy(col(subjectCol).as("__s"))
      .agg(count(lit(1)).as("__n"), sum(v).as("__s1"),
        sum((v * v).cast(dec)).as("__s2"))
    val nd = col("__n").cast("double")
    // per-subject sums in VALUE units (micro-units² / 1e8)
    val ssw = (col("__s2").cast("double") -
      col("__s1").cast("double") * col("__s1").cast("double") / nd) /
      lit(1e8)
    val sbTerm = (col("__s1").cast("double") *
      col("__s1").cast("double") / nd) / lit(1e8)
    val agg = per.agg(
      count(lit(1)).as("k"), sum(col("__n")).as("n"),
      sum(col("__s1")).as("__st"),
      sum((col("__n").cast(dec) * col("__n").cast(dec)).cast(dec))
        .as("__nn"),
      sum(round(ssw, 2).cast("decimal(38,2)")).as("__ssw"),
      sum(round(sbTerm, 2).cast("decimal(38,2)")).as("__sbt"))
    val kD = col("k").cast("double")
    val nD = col("n").cast("double")
    val ssb = col("__sbt").cast("double") -
      (col("__st").cast("double") * col("__st").cast("double") / nD) /
      lit(1e8)
    val msb = ssb / (kD - 1.0)
    val msw = col("__ssw").cast("double") / (nD - kD)
    val k0 = (nD - col("__nn").cast("double") / nD) / (kD - 1.0)
    val ok = col("k") >= 2L && col("n") > col("k")
    val den = msb + (k0 - 1.0) * msw
    agg.select(col("k").as("k_subjects"), col("n"),
      when(ok, Readout.pin(msb, 2)).as("ms_between"),
      when(ok, Readout.pin(msw, 2)).as("ms_within"),
      when(ok && den > 0.0, Readout.pin((msb - msw) / den, 6))
        .as("icc"))
  }

  /** Cohen's h (Cohen 1988) — the effect size for two PROPORTIONS
    * ([[twoProportion]] reports the z; h reports the MAGNITUDE on the
    * arcsine-stabilized scale where a given h means the same thing at
    * any base rate — the number power calculators actually take):
    *
    *   h = 2·arcsin(√p₁) − 2·arcsin(√p₂).
    *
    * Determinism contract: the proportions are exact-integer ratios;
    * h is one fixed-order double expression (asin/sqrt are IEEE-
    * correctly-rounded on both engines' libm for these magnitudes,
    * the exp/ln acceptance) pinned to 6dp. Empty cohorts → NULL.
    *
    * Scale shape: one grouped aggregate of four conditional counts.
    * Returns `(group_key, n_a, n_b, p_a, p_b, h)`. */
  def cohensH(
      df: DataFrame,
      groupCol: String,
      cohortCol: String,
      eventCol: String): DataFrame = {
    val inA = col(cohortCol).cast("boolean")
    val ev = col(eventCol).cast("boolean")
    val agg = df.groupBy(col(groupCol).as("group_key")).agg(
      count(when(inA, 1L)).as("n_a"),
      count(when(!inA, 1L)).as("n_b"),
      count(when(inA && ev, 1L)).as("__ka"),
      count(when(!inA && ev, 1L)).as("__kb"))
    val pa = col("__ka").cast("double") / col("n_a").cast("double")
    val pb = col("__kb").cast("double") / col("n_b").cast("double")
    val ok = col("n_a") > 0L && col("n_b") > 0L
    agg.select(col("group_key"), col("n_a"), col("n_b"),
      when(ok, Readout.pin(pa, 6)).as("p_a"),
      when(ok, Readout.pin(pb, 6)).as("p_b"),
      when(ok, Readout.pin(
        lit(2.0) * asin(sqrt(pa)) - lit(2.0) * asin(sqrt(pb)), 6))
        .as("h"))
      .orderBy("group_key")
  }

  /** pass@k estimator (Chen et al. 2021, the Codex paper's unbiased
    * form) per task: from n samples of which c are correct,
    *
    *   pass@k = 1 − C(n−c, k)/C(n, k)
    *          = 1 − Π_{i=0..k−1} (n−c−i)/(n−i)
    *
    * — the standard "would at least one of k draws succeed"
    * number every code/eval pipeline reports, computed as the
    * UNBIASED product form (never the naive 1−(1−c/n)^k, which is
    * biased for small n). Tasks with n < k are excluded (the
    * estimator is undefined there — surface them separately, don't
    * fake a number); n−c < k (fewer failures than draws) gives an
    * exact 1 via the clamped zero factor.
    *
    * Determinism contract: n and c are exact counts; the k-term
    * product is UNROLLED at k fixed factors evaluated left-to-right —
    * the same IEEE double sequence in any engine (the oracle writes
    * the same factor chain) — and pass@k pins at 6dp; pass@1 = c/n
    * pins beside it.
    *
    * Scale shape: one grouped count aggregate (map-side partials) +
    * a scalar k-factor expression; output |tasks| rows. Returns
    * `(task, n, c, pass_at_1, pass_at_k)`. */
  def passAtK(
      df: DataFrame,
      taskCol: String,
      correctCol: String,
      k: Int): DataFrame = {
    require(k >= 1, "k must be positive")
    val agg = df.groupBy(col(taskCol).as("task")).agg(
      count(lit(1)).as("n"),
      count(when(col(correctCol).cast("boolean"), 1L)).as("c"))
    val nd = col("n").cast("double")
    val cd = col("c").cast("double")
    val prod = (0 until k).foldLeft(lit(1.0)) { (acc, i) =>
      acc * (greatest(nd - cd - i.toDouble, lit(0.0)) / (nd - i.toDouble))
    }
    agg.filter(col("n") >= k.toLong)
      .select(col("task"), col("n"), col("c"),
        Readout.pin(cd / nd, 6).as("pass_at_1"),
        Readout.pin(lit(1.0) - prod, 6).as("pass_at_k"))
      .orderBy("task")
  }

  /** Split-conformal calibration (Vovk et al.; Angelopoulos & Bates
    * 2023 tutorial form) per group: from n CALIBRATION nonconformity
    * scores, the threshold is the ⌈(n+1)(1−α)⌉-th smallest score —
    * predictions whose score is ≤ q̂ form a set with ≥ 1−α coverage
    * guarantee, distribution-free. Reported beside the EMPIRICAL
    * coverage of q̂ on a held-out test split, so the gate doubles as
    * a live audit of the guarantee (the eval-pipeline shape: gate
    * model outputs at q̂, verify coverage on fresh data). Groups
    * where the rank exceeds n (n too small for the α) report a NULL
    * threshold and coverage — the honest "not enough calibration
    * data" signal.
    *
    * Determinism contract: the rank r = ⌈(n+1)(1−α)⌉ is computed in
    * exact integer arithmetic from α expressed as a RATIONAL
    * (`alphaNum`/`alphaDen`, e.g. 1/10): r = n+1 − ⌊(n+1)·aN/aD⌋
    * when (n+1)·aN mod aD == 0 else n+1 − ⌊…⌋ … — equivalently
    * ⌈(n+1)(aD−aN)/aD⌉ = ((n+1)·(aD−aN) + aD − 1) div aD — never a
    * float ceil whose boundary could differ; the r-th smallest score
    * orders by (score, id) so duplicate scores pick deterministically;
    * scores are the caller's (pre-round them); coverage = exact
    * test-side counts, pinned.
    *
    * Scale shape: one rank window over the calibration partition
    * (per-group), one broadcast of the |groups|-sized threshold
    * frame, one test-side aggregate. Returns
    * `(group_key, n_cal, r, q_hat, n_test, coverage)`. */
  def conformalThreshold(
      calibration: DataFrame,
      test: DataFrame,
      groupCol: String,
      scoreCol: String,
      idCol: String,
      alphaNum: Int,
      alphaDen: Int): DataFrame = {
    require(alphaNum > 0 && alphaNum < alphaDen,
      "alpha must be a rational in (0, 1)")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("group_key")
      .orderBy(col("__s"), col("__id"))
    val cal = calibration.select(col(groupCol).as("group_key"),
      col(scoreCol).as("__s"), col(idCol).as("__id"))
      .withColumn("__r", row_number().over(w))
      .withColumn("__n", count(lit(1)).over(
        Window.partitionBy("group_key").rowsBetween(
          Window.unboundedPreceding, Window.unboundedFollowing)))
    // r = ceil((n+1)(1-α)) in exact integers: ((n+1)(aD−aN) + aD−1) div aD
    // (SQL `div` — Column `/` on longs is DOUBLE division)
    val need = expr(s"((__n + 1) * ${(alphaDen - alphaNum).toLong} + " +
      s"${(alphaDen - 1).toLong}) div ${alphaDen.toLong}")
    val thresholds = cal
      .withColumn("__need", need)
      .groupBy("group_key")
      .agg(max(col("__n")).as("n_cal"),
        max(col("__need")).as("r"),
        max(when(col("__r") === col("__need"), col("__s"))).as("q_hat"))
    val cover = test.select(col(groupCol).as("group_key"),
      col(scoreCol).as("__ts"))
      .join(broadcast(thresholds), Seq("group_key"))
      .groupBy("group_key")
      .agg(count(lit(1)).as("n_test"),
        count(when(col("__ts") <= col("q_hat"), 1L)).as("__nc"))
    thresholds.join(cover, Seq("group_key"), "left")
      .select(col("group_key"), col("n_cal"), col("r"), col("q_hat"),
        coalesce(col("n_test"), lit(0L)).as("n_test"),
        when(col("q_hat").isNotNull && col("n_test") > 0L, Readout.pin(
          col("__nc").cast("double") / col("n_test"), 6)).as("coverage"))
      .orderBy("group_key")
  }
}
