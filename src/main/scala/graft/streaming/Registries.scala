package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.Lineage

/** Incremental ADDITIVE registries over the versioned store — the
  * third registry shape beside [[graft.operators.Dedup
  * .incrementalDedup]] (min-merge, idempotent) and
  * [[graft.operators.Dedup.incrementalNearDup]] (set-union,
  * idempotent): running per-key sufficient statistics (doc counts,
  * token counts, char counts) that a continuously-ingesting corpus
  * pipeline reads instead of re-aggregating 100 TB — mixture weights,
  * source caps, and quality dashboards all start from this table.
  *
  * An additive merge is NOT replay-idempotent, so unlike the dedup
  * registries each commit carries a PER-STREAM latest-batch map in
  * the store's atomic commit metadata (`txn.<stream_id> → batch_id`,
  * the Delta `txnAppId`/`txnVersion` shape) and a replayed
  * micro-batch is skipped ([[graft.operators.Materialized
  * .applyBatchOnce]]'s contract, riding the FILE-PRUNED commit
  * instead of a full-table overwrite). A MAP, not a single last
  * pair: two streams interleaving on one schema would otherwise
  * erase each other's marker, and the first stream's replayed batch
  * would apply its additive delta TWICE. Every commit carries all
  * existing `txn.*` entries forward ([[graft.sources.ResultStore
  * .committedMeta]] returns only the committed generation's map).
  * Commit cost is bounded by the batch's key footprint:
  * the registry lives range-partitioned on the key, the batch's
  * delta aggregate reads back only its own keys' stored rows
  * (`readForKeys`) and the sum commits through `upsertPruned`.
  *
  * Invariant (what makes it oracle-able): addition is associative and
  * commutative and every row contributes exactly once, so the final
  * registry equals the one-shot batch aggregate of the whole corpus
  * for ANY batch split, arrival order, or at-least-once replay. */
object Registries {

  /** Per-source corpus statistics registry: `keyCol → (n_docs,
    * n_tokens, n_chars)`, merged additively per micro-batch. */
  def incrementalSourceStats(
      stream: DataFrame,
      keyCol: String,
      textCol: String,
      store: graft.sources.ResultStore,
      schema: String,
      streamId: String,
      checkpoint: String,
      registryPartitions: Int = 8,
      onCommit: (String, graft.sources.PrunedCommit) => Unit = (_, _) => ())
      : org.apache.spark.sql.streaming.StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        // batch-sized frames throughout: AQE off for the burst
        // (Lineage.withoutAqe's measured rationale)
        Lineage.withoutAqe(batch.sparkSession) {
        val meta = store.committedMeta(schema)
        val replayed = meta.get(s"txn.$streamId").map(_.toLong)
          .exists(_ >= batchId)
        if (!replayed) {
          val delta = Lineage.cutLocal(batch
            .select(col(keyCol).as("key"),
              graft.functions.TextFunctions.tokenCount(col(textCol))
                .as("__tk"),
              length(col(textCol)).cast("long").as("__ch"))
            .groupBy("key").agg(
              count(lit(1)).as("n_docs"),
              sum("__tk").as("n_tokens"),
              sum("__ch").as("n_chars")))
          val src =
            if (!store.hasSchema(schema))
              delta.repartitionByRange(registryPartitions, col("key"))
            else
              // additive merge against ONLY the stored rows for this
              // batch's keys — both sides batch-sized
              store.readForKeys(schema, delta, "key")
                .unionByName(delta)
                .groupBy("key").agg(
                  sum("n_docs").as("n_docs"),
                  sum("n_tokens").as("n_tokens"),
                  sum("n_chars").as("n_chars"))
          // carry every stream's marker forward — the commit's meta
          // REPLACES the generation's map wholesale
          val txns = meta.filter(_._1.startsWith("txn.")) +
            (s"txn.$streamId" -> batchId.toString)
          val stats = store.upsertPruned(schema, src, "key", meta = txns)
          onCommit(schema, stats)
        }
        }
      }
      .start()
}
