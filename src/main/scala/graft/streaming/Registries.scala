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
    additiveRegistry(stream, store, schema, streamId, checkpoint,
      registryPartitions, onCommit,
      deltaOf = batch => batch
        .select(col(keyCol).as("key"),
          graft.functions.TextFunctions.tokenCount(col(textCol))
            .as("__tk"),
          length(col(textCol)).cast("long").as("__ch"))
        .groupBy("key").agg(
          count(lit(1)).as("n_docs"),
          sum("__tk").as("n_tokens"),
          sum("__ch").as("n_chars")),
      groupCols = Seq("key"),
      statCols = Seq("n_docs", "n_tokens", "n_chars"))

  /** Per-key value HISTOGRAM registry on a fixed bucket grid:
    * `key → (bucket, n)` counts merged additively per micro-batch —
    * the distribution-shaped sibling of [[incrementalSourceStats]]'s
    * scalar sums, feeding quantile dashboards and drift monitors
    * ([[graft.operators.Stats.psi]] consumes exactly this cell shape)
    * without re-scanning the corpus. The grid is FIXED
    * (⌊v/width⌋ capped at `maxBucket`, the curriculumSchedule
    * rationale): a data-derived quantile grid would need a rank pass
    * and would drift between batches, breaking additivity — fixed
    * cells are mergeable forever.
    *
    * Same machinery end to end: per-stream `txn.` replay map, pruned
    * point-read of the batch's keys, file-pruned upsert. Bucket cells
    * ride WITH their key (the merge groups on (key, bucket)), so the
    * registry stays laid out and pruned on `key` alone. */
  def incrementalHistogram(
      stream: DataFrame,
      keyCol: String,
      valueCol: String,
      width: Double,
      store: graft.sources.ResultStore,
      schema: String,
      streamId: String,
      checkpoint: String,
      maxBucket: Long = 63L,
      registryPartitions: Int = 8,
      onCommit: (String, graft.sources.PrunedCommit) => Unit = (_, _) => ())
      : org.apache.spark.sql.streaming.StreamingQuery = {
    require(width > 0.0, "bucket width must be positive")
    require(maxBucket >= 0L, "maxBucket must be non-negative")
    additiveRegistry(stream, store, schema, streamId, checkpoint,
      registryPartitions, onCommit,
      deltaOf = batch => batch
        .filter(col(valueCol).isNotNull)
        .select(col(keyCol).as("key"),
          least(greatest(floor(col(valueCol).cast("double") / width)
            .cast("long"), lit(0L)), lit(maxBucket)).as("bucket"))
        .groupBy("key", "bucket").agg(count(lit(1)).as("n")),
      groupCols = Seq("key", "bucket"),
      statCols = Seq("n"))
  }

  /** Vocabulary count registry: `token → n`, merged additively per
    * micro-batch — the heavy-hitter/vocabulary side of the registry
    * family ([[incrementalSourceStats]] keys on the source,
    * [[incrementalHistogram]] on (key, bucket); THIS keys on the token
    * itself). A continuously-ingesting corpus reads its top-k tokens,
    * stopword candidates, and vocabulary growth off this table instead
    * of re-tokenizing 100 TB; exact counts, so the top-k readout is a
    * TakeOrdered over the registry — no sketch error to argue about.
    *
    * Same machinery end to end: per-stream `txn.` replay map, pruned
    * point-read of the batch's OWN tokens (the registry lives
    * range-partitioned on the token, so a batch touches only the files
    * its vocabulary lands in), file-pruned upsert. The registry is
    * vocabulary-sized — Heaps' law keeps that sublinear in the corpus. */
  def incrementalTokenCounts(
      stream: DataFrame,
      textCol: String,
      store: graft.sources.ResultStore,
      schema: String,
      streamId: String,
      checkpoint: String,
      registryPartitions: Int = 8,
      onCommit: (String, graft.sources.PrunedCommit) => Unit = (_, _) => ())
      : org.apache.spark.sql.streaming.StreamingQuery =
    additiveRegistry(stream, store, schema, streamId, checkpoint,
      registryPartitions, onCommit,
      deltaOf = batch => batch
        .select(explode(graft.functions.TextFunctions
          .wsTokens(lower(col(textCol)))).as("key"))
        .groupBy("key").agg(count(lit(1)).as("n")),
      groupCols = Seq("key"),
      statCols = Seq("n"))

  /** Adjacent-bigram count registry: `"v w" → (v, w, n)`, merged
    * additively per micro-batch — the collocation side of the
    * vocabulary registry ([[incrementalTokenCounts]]); together the
    * two answer PMI/collocation dashboards off the registries instead
    * of re-tokenizing the corpus (the st20 composition). The v/w
    * components ride WITH the key (functionally dependent, the
    * histogram-bucket pattern) so the PMI join needs no string
    * splitting; the registry stays laid out and pruned on the bigram
    * key alone, bounded by distinct bigrams. */
  def incrementalBigramCounts(
      stream: DataFrame,
      textCol: String,
      store: graft.sources.ResultStore,
      schema: String,
      streamId: String,
      checkpoint: String,
      registryPartitions: Int = 8,
      onCommit: (String, graft.sources.PrunedCommit) => Unit = (_, _) => ())
      : org.apache.spark.sql.streaming.StreamingQuery =
    additiveRegistry(stream, store, schema, streamId, checkpoint,
      registryPartitions, onCommit,
      deltaOf = batch => {
        val tk = graft.functions.TextFunctions
          .wsTokens(lower(col(textCol)))
        batch.select(tk.as("__tk"))
          .filter(size(col("__tk")) >= 2)
          .select(
            slice(col("__tk"), lit(1), size(col("__tk")) - 1).as("__vs"),
            slice(col("__tk"), lit(2), size(col("__tk")) - 1).as("__ws"))
          .select(explode(arrays_zip(col("__vs"), col("__ws"))).as("__p"))
          .select(col("__p.__vs").as("v"), col("__p.__ws").as("w"))
          .select(concat(col("v"), lit(" "), col("w")).as("key"),
            col("v"), col("w"))
          .groupBy("key", "v", "w").agg(count(lit(1)).as("n"))
      },
      groupCols = Seq("key", "v", "w"),
      statCols = Seq("n"))

  /** The shared additive-registry micro-batch skeleton: per-stream
    * `txn.<stream_id>` replay map (carried forward wholesale on every
    * commit), batch delta aggregate, key-pruned read-back of ONLY the
    * batch's stored rows, additive re-aggregate, file-pruned upsert.
    * `groupCols` must start with "key" — the registry's layout,
    * pruning, and upsert key.
    *
    * Concurrency contract: commits to one schema must be SERIALIZED
    * across streams. The txn map is read at batch start and written
    * wholesale at commit (read-modify-write), so two streams
    * committing truly concurrently to one schema could erase each
    * other's marker. Spark already serializes the batches of a single
    * stream; multiple streams may interleave on one schema (each
    * commit carries all `txn.*` entries forward) but must not commit
    * at the same instant — a deployment that needs that takes the
    * [[graft.sources.ResultStore.transact]] marker-CAS path, where a
    * racing commit loses the slot and rebases instead. */
  private def additiveRegistry(
      stream: DataFrame,
      store: graft.sources.ResultStore,
      schema: String,
      streamId: String,
      checkpoint: String,
      registryPartitions: Int,
      onCommit: (String, graft.sources.PrunedCommit) => Unit,
      deltaOf: DataFrame => DataFrame,
      groupCols: Seq[String],
      statCols: Seq[String])
      : org.apache.spark.sql.streaming.StreamingQuery = {
    require(groupCols.headOption.contains("key"),
      "groupCols must lead with the registry key")
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        // batch-sized frames throughout: AQE off for the burst
        // (Lineage.withoutAqe's measured rationale)
        Lineage.withoutAqe(batch.sparkSession) {
        val meta = store.committedMeta(schema)
        // replay guard: the per-stream `txn.<id>` map, FALLING BACK to
        // the pre-r12 single (stream_id, batch_id) pair — a registry
        // whose last commit predates the map upgrade replays its last
        // micro-batch after a restart and must still be caught, or the
        // additive delta double-applies; the first post-upgrade commit
        // writes the map form and the legacy pair goes dormant
        val lastCommitted = meta.get(s"txn.$streamId")
          .orElse(if (meta.get("stream_id").contains(streamId))
            meta.get("batch_id") else None)
        val replayed = lastCommitted.map(_.toLong).exists(_ >= batchId)
        if (!replayed) {
          val delta = Lineage.cutLocal(deltaOf(batch))
          val src =
            if (!store.hasSchema(schema))
              delta.repartitionByRange(registryPartitions, col("key"))
            else
              // additive merge against ONLY the stored rows for this
              // batch's keys — both sides batch-sized
              store.readForKeys(schema, delta, "key")
                .unionByName(delta)
                .groupBy(groupCols.map(col): _*)
                .agg(sum(statCols.head).as(statCols.head),
                  statCols.tail.map(c => sum(c).as(c)): _*)
          // carry every stream's marker forward — the commit's meta
          // REPLACES the generation's map wholesale. A legacy pair is
          // UPGRADED into the map here (lowest precedence): dropping
          // it would disarm the old stream's guard on its next replay
          val legacy = (meta.get("stream_id"), meta.get("batch_id")) match {
            case (Some(sid), Some(b)) => Map(s"txn.$sid" -> b)
            case _ => Map.empty[String, String]
          }
          val txns = legacy ++ meta.filter(_._1.startsWith("txn.")) +
            (s"txn.$streamId" -> batchId.toString)
          val stats = store.upsertPruned(schema, src, "key", meta = txns)
          onCommit(schema, stats)
        }
        }
      }
      .start()
  }
}
