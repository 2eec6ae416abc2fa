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
        round(first(col("__q1")), 4).as("q1"),
        round(first(col("__q3")), 4).as("q3"),
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
        round(ma, 6).as("mean_a"),
        round(mb, 6).as("mean_b"),
        when(na >= 2 && nb >= 2 && va + vb > 0.0,
          round((ma - mb) / sqrt(va + vb), 4)).as("welch_z")): _*)
      .orderBy(groupCols.map(col): _*)
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
      when(den > 0.0, round(num / den, 6)).as("r")))
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
}
