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

  /** Incremental maintenance of a JOIN view over APPEND-ONLY inputs —
    * the other classic IVM class beside [[additiveMerge]]'s aggregates:
    * for `V = A ⋈ B` and appended batches ΔA / ΔB,
    *
    *   V' = V ∪ (ΔA ⋈ B) ∪ (A ⋈ ΔB) ∪ (ΔA ⋈ ΔB)
    *
    * (the delta-join identity: every new output row involves at least
    * one delta row, so the A⋈B bulk is NEVER recomputed). `aOld`/`bOld`
    * are the PRE-append snapshots; the companion gate (q48) proves
    * `deltaJoinMerge == full recompute` with the oracle as the full
    * join.
    *
    * Scale shape: the three delta terms each involve one delta-sized
    * side — at 100 TB the deltas are batch-sized while A/B are
    * corpus-sized, so AQE broadcasts the delta side and the old view is
    * appended to, not rebuilt. Updates/deletes need CDC multiplicities
    * (+1/−1 bag algebra) — that extension is the documented boundary;
    * append-only is the event-log case this engine feeds on. */
  def deltaJoinMerge(
      view: DataFrame,
      aOld: DataFrame,
      aDelta: DataFrame,
      bOld: DataFrame,
      bDelta: DataFrame,
      keys: Seq[String]): DataFrame = {
    require(keys.nonEmpty, "need at least one join key")
    view
      .unionByName(aDelta.join(bOld, keys))
      .unionByName(aOld.join(bDelta, keys))
      .unionByName(aDelta.join(bDelta, keys))
  }

  /** EXACTLY-ONCE guard for non-idempotent foreachBatch view sinks:
    * commit `merge` to `schema` tagged with `(streamId, batchId)`, or
    * skip when the committed generation already carries this stream's
    * id at this batch (or a later one).
    *
    * Why it exists: Structured Streaming's foreachBatch is
    * at-least-once — a crash between the sink's commit and the
    * checkpoint commit makes the engine REPLAY the micro-batch on
    * restart. Idempotent sinks (key-upsert, min-merge registries)
    * absorb the replay; ADDITIVE merges ([[additiveMerge]],
    * [[deltaJoinMerge]]) would double-apply it. The ids ride in the
    * store's commit metadata (`ResultStore.overwriteWithMeta`), so ids
    * and data flip atomically together — there is no window where a
    * consumer sees one without the other.
    *
    * `streamId` scopes the guard to one logical stream (Delta's
    * txnAppId pattern): batch ids only dedupe WITHIN a stream id, so a
    * rebuild from a fresh checkpoint under a NEW streamId applies from
    * batch 0 instead of being silently skipped by a stale marker.
    * Deleting a checkpoint while KEEPING the streamId means "continue
    * the same logical stream" — replays of already-applied ids skip,
    * which is the contract's point. Returns whether the batch was
    * applied.
    *
    * Atomicity: the guard re-evaluates against the committed metadata
    * INSIDE the store's `_LOCK` exclusive section
    * ([[graft.sources.ResultStore.overwriteWithMetaIf]]), so two
    * concurrent writers (a zombie driver during failover, two streams
    * pointed at one schema) can never both pass it — the loser's
    * staged write is refused at the pointer flip. */
  def applyBatchOnce(
      store: graft.sources.ResultStore,
      schema: String,
      streamId: String,
      batchId: Long)(merge: => DataFrame): Boolean = {
    def fresh(meta: Map[String, String]): Boolean =
      !meta.get("batch_id").map(_.toLong)
        .filter(_ => meta.get("stream_id").contains(streamId))
        .exists(_ >= batchId)
    if (!fresh(store.committedMeta(schema))) false
    else store.overwriteWithMetaIf(schema, merge,
      Map("stream_id" -> streamId, "batch_id" -> batchId.toString))(fresh)
  }
}
