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
    *   f_t = round6(l_{t−1} + b_{t−1})                        (t ≥ 2)
    *   l_t = round6(α·y_t + (1−α)·(l_{t−1} + b_{t−1}))
    *   b_t = round6(β·(l_t − l_{t−1}) + (1−β)·b_{t−1}),
    *
    * initialized `l₁ = y₁, b₁ = 0` (degenerate-free for length-1
    * series; the first forecast is at t = 2). Output one row per input
    * point: `(key, t, y, level, trend, forecast, residual)` with
    * forecast/residual NULL at t = 1.
    *
    * Determinism contract: the per-step 6dp re-round keeps every state
    * on a decimal grid, so each step is IEEE arithmetic on grid doubles
    * — bit-identical in any engine; the oracle replays the recursion as
    * a recursive CTE (the same portable-fold discipline as the
    * Kaplan–Meier curve).
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
      alpha: Double,
      beta: Double): DataFrame = {
    require(alpha > 0 && alpha <= 1, "alpha in (0, 1]")
    require(beta >= 0 && beta <= 1, "beta in [0, 1]")
    series
      .groupBy(col(keyCol))
      .agg(sort_array(collect_list(struct(
        col(tCol).cast("long").as("t"),
        col(yCol).cast("double").as("y")))).as("__pts"))
      .select(col(keyCol), explode(expr(
        s"""aggregate(
           |  __pts,
           |  cast(array() as array<struct<
           |    t:bigint,y:double,level:double,trend:double,
           |    forecast:double,residual:double>>),
           |  (acc, p) -> array_append(acc,
           |    if(size(acc) = 0,
           |      named_struct(
           |        't', p.t, 'y', p.y, 'level', p.y, 'trend', 0.0d,
           |        'forecast', cast(null as double),
           |        'residual', cast(null as double)),
           |      named_struct(
           |        't', p.t, 'y', p.y,
           |        'level', round($alpha * p.y + ${1 - alpha} *
           |          (element_at(acc, -1).level
           |           + element_at(acc, -1).trend), 6),
           |        'trend', round($beta *
           |          (round($alpha * p.y + ${1 - alpha} *
           |             (element_at(acc, -1).level
           |              + element_at(acc, -1).trend), 6)
           |           - element_at(acc, -1).level)
           |          + ${1 - beta} * element_at(acc, -1).trend, 6),
           |        'forecast', round(element_at(acc, -1).level
           |          + element_at(acc, -1).trend, 6),
           |        'residual', round(p.y - round(element_at(acc, -1).level
           |          + element_at(acc, -1).trend, 6), 6))))
           |)""".stripMargin)).as("__r"))
      .select(col(keyCol), col("__r.t").as("t"), col("__r.y").as("y"),
        col("__r.level").as("level"), col("__r.trend").as("trend"),
        col("__r.forecast").as("forecast"),
        col("__r.residual").as("residual"))
      .orderBy(keyCol, "t")
  }
}
