package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental maintenance of ALGEBRAIC aggregates — the
  * materialized-view pattern every serving layer runs on its event
  * firehose: keep a small grouped summary, fold each new batch into it
  * by MERGING aggregate states instead of recomputing from history.
  * Sound exactly for the algebraic/commutative aggregate classes
  * (sum, count, min, max — and anything derivable from them: avg,
  * rates, ratios), which is why the API admits only those merge rules.
  *
  * The companion gate (q38) proves the contract the pattern lives on:
  * `merge(mv(old events), agg(new events)) == agg(all events)` — the
  * oracle IS the full recompute.
  *
  * Scale shape: the merge shuffles only the two SUMMARY frames (|keys|
  * rows each), never raw history — the whole point at 100 TB, where
  * the event log is unreadable in a maintenance window but the MV is
  * dimension-sized. Decimal sums keep the merged values bit-equal to a
  * full recompute regardless of batch split or partition order.
  */
object Materialized {

  /** Merge rule for one aggregate column of the view. */
  sealed trait MergeRule { def name: String }
  case class SumCol(name: String) extends MergeRule
  case class CountCol(name: String) extends MergeRule
  case class MinCol(name: String) extends MergeRule
  case class MaxCol(name: String) extends MergeRule

  /** Fold `delta` (a summary with the same shape) into `mv`: group
    * keys align by name, every aggregate column merges by its rule.
    * Keys present in only one side pass through (count/sum columns in
    * the other side contribute nothing — union semantics). */
  def additiveMerge(
      mv: DataFrame,
      delta: DataFrame,
      keyCols: Seq[String],
      rules: Seq[MergeRule]): DataFrame = {
    require(keyCols.nonEmpty, "need at least one group key")
    require(rules.nonEmpty, "need at least one aggregate column")
    val aggs = rules.map {
      case SumCol(c)   => sum(col(c)).as(c)
      case CountCol(c) => sum(col(c)).as(c) // counts merge by summing
      case MinCol(c)   => min(col(c)).as(c)
      case MaxCol(c)   => max(col(c)).as(c)
    }
    mv.unionByName(delta)
      .groupBy(keyCols.map(col): _*)
      .agg(aggs.head, aggs.tail: _*)
  }
}
