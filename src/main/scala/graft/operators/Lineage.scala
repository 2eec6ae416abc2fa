package graft.operators

import org.apache.spark.sql.DataFrame

/** Lineage-cut discipline shared by every operator that materializes a
  * frame consumed more than once (multi-consumer one-shot cuts) or
  * iterated over (loops): a RELIABLE checkpoint (HDFS/object-store
  * write) when the session has a checkpoint dir configured — on a real
  * cluster a lost executor must not kill a multi-hour job, because
  * localCheckpoint blocks die with their executor — and a local
  * checkpoint otherwise (local mode, tests: no storage round-trip).
  *
  * The reliable path persists BEFORE checkpointing (an unpersisted
  * reliable checkpoint recomputes the frame's whole plan for the write
  * job — documented Spark behavior) and unpersists after; superseded
  * checkpoint files are GC-collected when
  * `spark.cleaner.referenceTracking.cleanCheckpoints` is on
  * (Sessions.tune sets it).
  */
private[graft] object Lineage {

  /** Eager cut: reliable checkpoint when a dir is configured, eager
    * localCheckpoint otherwise. Use before loops and wherever the next
    * consumer is not an immediate aggregate. */
  def cut(df: DataFrame): DataFrame =
    if (df.sparkSession.sparkContext.getCheckpointDir.isDefined) {
      val cached = df.persist(
        org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val out = cached.checkpoint()
      cached.unpersist(blocking = false)
      out
    } else df.localCheckpoint()

  /** Lazy cut for a frame whose very next consumer is an action
    * (aggregate / count / the loop's convergence checksum): the LAZY
    * local checkpoint materializes during that action's own job, so the
    * cut costs ZERO extra jobs. The reliable-checkpoint path stays
    * eager: a lost-executor-safe write should not be deferred into
    * whatever action happens next. */
  def cutLazy(df: DataFrame): DataFrame =
    if (df.sparkSession.sparkContext.getCheckpointDir.isDefined) cut(df)
    else df.localCheckpoint(false)
}
