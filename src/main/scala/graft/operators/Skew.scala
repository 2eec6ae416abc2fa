package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for hot keys.
  *
  * AQE's skew-join splitting covers sort-merge joins at runtime, but two
  * cases still need explicit salting at 100 TB:
  *
  *  - a shuffle join whose build side is too big to broadcast while the
  *    probe side has a handful of dominant keys (one reducer drowns);
  *  - `collect_list`-style aggregations where partial aggregation cannot
  *    shrink the hot key's data.
  *
  * `saltedJoin` explodes the small side `saltFactor`× (each row tagged
  * with every salt) and tags the big side with a DETERMINISTIC salt
  * derived from row content — not rand(), so retried tasks and replayed
  * stages salt identically — then joins on (key, salt): the hot key's
  * rows spread over `saltFactor` reducers.
  *
  * `twoPhaseAgg` does salt → partial agg → final agg for algebraic
  * aggregates whose partials combine (sum/count/min/max).
  */
object Skew {

  /** Deterministic pseudo-salt in [0, saltFactor) from arbitrary row
    * content columns. */
  def salt(saltFactor: Int, from: Column*): Column =
    pmod(xxhash64(from: _*), lit(saltFactor)).cast("int")

  /** Equi-join `big ⋈ small` on `key`, spreading each big-side key over
    * `saltFactor` partitions. `small` is replicated saltFactor× — use
    * when it exceeds the broadcast threshold but a saltFactor-fold copy
    * is still cheap next to the skewed shuffle it avoids. */
  def saltedJoin(
      big: DataFrame,
      small: DataFrame,
      key: String,
      saltFactor: Int,
      saltFrom: Seq[String],
      joinType: String = "inner"): DataFrame = {
    val saltedBig = big.withColumn("__salt",
      salt(saltFactor, saltFrom.map(col): _*))
    val replicated = small.withColumn("__salt",
      explode(sequence(lit(0), lit(saltFactor - 1))))
    saltedBig.join(replicated, Seq(key, "__salt"), joinType)
      .drop("__salt")
  }

  /** Two-phase aggregation: group by (keys, salt) first, then combine.
    * `partials` aggregate raw rows; `finals` combine partial columns.
    * Example: sum(x) → partial sum(x) as s, final sum(s). */
  def twoPhaseAgg(
      df: DataFrame,
      keys: Seq[String],
      saltFactor: Int,
      saltFrom: Seq[String],
      partials: Seq[Column],
      finals: Seq[Column]): DataFrame = {
    val salted = df.withColumn("__salt",
      salt(saltFactor, saltFrom.map(col): _*))
    salted
      .groupBy((keys :+ "__salt").map(col): _*)
      .agg(partials.head, partials.tail: _*)
      .groupBy(keys.map(col): _*)
      .agg(finals.head, finals.tail: _*)
  }
}
