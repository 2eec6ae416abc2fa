package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** ML feature engineering over the engine's frames — the transforms a
  * training-data pipeline applies between curation and export. Each
  * follows the repo's determinism contract (exact decimal sufficient
  * statistics, fixed-order double readouts) so features are
  * reproducible across engines and runs.
  */
object Features {

  /** Leakage-safe (leave-one-out) target encoding of a categorical
    * key: each row's encoding is the mean label of every OTHER row
    * sharing its key,
    *
    *   enc_i = (Σ_k y − y_i) / (n_k − 1),
    *
    * falling back to the global mean when the key is a singleton
    * (n_k = 1 — the LOO mean of nothing) or NULL (a NULL key matches
    * no per-key aggregate row; the join is a LEFT join so those rows
    * survive and take the fallback too, with n_key reported as 0
    * instead of silently vanishing). The standard high-cardinality
    * categorical feature that naive per-key mean encoding gets WRONG:
    * including a row's own label leaks the target into its feature and
    * inflates validation scores (the classic CatBoost/Kaggle trap).
    *
    * Determinism contract: per-key Σy and the global Σy are exact
    * DECIMAL(18,4) sums (order-independent); each encoding is one
    * fixed-order double expression of exact decimals, rounded to 6dp —
    * identical in any engine.
    *
    * Scale shape: ONE key aggregate (map-side partials) shuffle-joined
    * back on the key — co-partitioned with the aggregate's own
    * partitioning, no second data shuffle; the global mean is a
    * broadcast 1-row aggregate. High-cardinality keys are the POINT
    * (that's why one hot fails) and cost nothing extra: the join is
    * key-hashed either way. Output order is UNSPECIFIED (no global
    * sort — a data-sized orderBy here would be a single-partition
    * bottleneck at scale; callers that need a presentation order sort
    * the bounded frame they keep). Returns the id, the key, `n_key`,
    * and `enc`. */
  def looTargetEncode(
      df: DataFrame,
      idCol: String,
      keyCol: String,
      labelCol: String): DataFrame = {
    val y = col(labelCol).cast("decimal(18,4)")
    val perKey = df.groupBy(col(keyCol))
      .agg(count(when(col(labelCol).isNotNull, 1)).as("n_key"),
        sum(y).as("__sk"))
    val global = broadcast(df.agg(
      sum(y).as("__sg"),
      count(when(col(labelCol).isNotNull, 1)).as("__ng")))
    df.select(col(idCol), col(keyCol), y.as("__y"))
      .join(perKey, Seq(keyCol), "left")
      .crossJoin(global)
      .select(col(idCol), col(keyCol),
        coalesce(col("n_key"), lit(0L)).as("n_key"), {
        // a NULL-label row subtracts nothing (its own label never
        // entered __sk): its encoding is the plain key mean
        val denom = coalesce(col("n_key"), lit(0L)) -
          when(col("__y").isNotNull, 1L).otherwise(0L)
        val num = col("__sk") - coalesce(col("__y"), lit(0).cast("decimal(18,4)"))
        when(denom > 0L,
          round(num.cast("double") / denom.cast("double"), 6))
          .when(col("__ng") > 0L,
            round(col("__sg").cast("double") /
              col("__ng").cast("double"), 6))
          .as("enc")
      })
  }

  /** Weight-of-evidence encoding + information value (the classic
    * credit-scoring feature screen; Siddiqi 2006) — per feature
    * bucket, how strongly does the bucket separate positives from
    * negatives, and in aggregate is the feature worth keeping:
    *
    *   WoE_b = ln( (g_b/G) / (n_b/N) ),
    *   IV    = Σ_b (g_b/G − n_b/N) · WoE_b,
    *
    * with g/n the bucket's positive/negative counts and G/N the
    * totals. The monotone-log sibling of [[graft.operators.Stats
    * .mutualInformation]]'s feature ranking, and the encoding itself
    * doubles as a leakage-prone-but-standard categorical transform
    * (unlike [[looTargetEncode]] it is aggregate-level, so
    * leave-one-out is unnecessary).
    *
    * Determinism contract: counts are exact integers; WoE is one
    * fixed-order double expression rounded to 6dp; each IV addend is
    * the ROUNDED WoE times exact-count ratios, rounded to 10dp
    * decimal before the cross-bucket sum (bucket order differs
    * between engines — the tq8 discipline); IV re-rounds to 6dp. A
    * one-sided bucket (zero positives or zero negatives) has
    * undefined WoE: NULL, and it contributes nothing to IV (the
    * standard treatment short of arbitrary smoothing — callers who
    * want Laplace smoothing pre-add pseudo-rows).
    *
    * Scale shape: ONE conditional aggregate over the bucket key
    * (map-side partials, dimension-sized), broadcast 1-row totals,
    * and a buckets-sized window for the IV total (the benford
    * chi2_total pattern). Returns one row per bucket:
    * `(bucket, n_pos, n_neg, woe, iv)` with iv repeated per row. */
  def woeIv(
      df: DataFrame,
      bucketCol: String,
      positive: Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val buckets = df.filter(col(bucketCol).isNotNull)
      .groupBy(col(bucketCol).as("bucket"))
      .agg(
        sum(when(positive, 1L).otherwise(0L)).as("n_pos"),
        sum(when(positive, 0L).otherwise(1L)).as("n_neg"))
    val tot = broadcast(buckets.agg(
      sum("n_pos").as("__G"), sum("n_neg").as("__N")))
    // an all-positive (or all-negative) frame zeroes a TOTAL: guard
    // the denominators themselves (ANSI + CSE can evaluate a division
    // hoisted out of its `when` — the cuped lesson); NULL ratios then
    // NULL the woe/term quietly, leaving iv = 0
    val pg = col("n_pos").cast("double") /
      when(col("__G") > 0L, col("__G").cast("double"))
    val pn = col("n_neg").cast("double") /
      when(col("__N") > 0L, col("__N").cast("double"))
    val woe = when(col("n_pos") > 0L && col("n_neg") > 0L,
      round(log(pg / pn), 6))
    buckets.crossJoin(tot)
      .select(col("bucket"), col("n_pos"), col("n_neg"),
        woe.as("woe"),
        round((pg - pn) * woe, 10).cast("decimal(28,10)").as("__term"))
      .withColumn("iv",
        round(coalesce(
          sum("__term").over(Window.partitionBy()).cast("double"),
          lit(0.0)), 6))
      .drop("__term")
      .orderBy("bucket")
  }
}
