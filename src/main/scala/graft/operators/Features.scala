package graft.operators

import org.apache.spark.sql.DataFrame
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
}
