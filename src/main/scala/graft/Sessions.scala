package graft

import org.apache.spark.sql.SparkSession

/** Session defaults shared by Verify / Bench / tests.
  *
  * These mirror what a production deployment would set cluster-wide:
  * AQE on (runtime re-planning, skew-join handling), shuffle partitions
  * sized to the executor count instead of the 200 default, UTC session
  * time, and the legacy nanos conf so TIMESTAMP(NANOS) parquet (the
  * events table) loads as Long instead of erroring.
  */
object Sessions {
  def tune(b: SparkSession.Builder): SparkSession.Builder = b
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
    // iterative operators checkpoint per round when a checkpoint dir is
    // configured; let the ContextCleaner delete superseded round files
    .config("spark.cleaner.referenceTracking.cleanCheckpoints", "true")
    // the ContextCleaner only unregisters shuffles/broadcasts when a GC
    // proves them unreachable, and its own GC kick defaults to every
    // 30 MINUTES — a long-lived driver running hundreds of queries
    // accumulates thousands of dead shuffle registrations and broadcast
    // blocks between kicks, and every later multi-stage job pays for
    // them (the r14 driver sweep measured aq44 at 8.6× its isolated
    // steady; the gradient was monotone in session age). One minute
    // bounds the backlog at ~a query's worth; the periodic System.gc()
    // runs on the cleaner thread, off every query's timed path.
    .config("spark.cleaner.periodicGC.interval", "1min")
    // The app/SQL status stores retain finished-job roll-ups, per-task
    // rows, and — per SQL execution — the full formatted plan string
    // plus its metric graph, sized for a human browsing a UI (1000
    // jobs / 1000 stages / 100k tasks / 1000 SQL executions). This
    // library's iterative operators launch dozens of executions per
    // query, so a long-lived driver fills those stores within a few
    // queries and then holds them for the session: pure heap pressure
    // (and, with async tracking, trimming that lags behind exactly the
    // many-small-jobs bursts that overflow it) taxing repeat runs of
    // multi-job queries — the r15 driver sweep measured aq44 at 4×
    // its quiet steady with run3 > run1 > isolated. Nobody is
    // browsing: keep minutes of history, not hours. The status APIs
    // stay functional, just with a shorter horizon.
    .config("spark.ui.retainedJobs", "100")
    .config("spark.ui.retainedStages", "100")
    .config("spark.ui.retainedTasks", "2000")
    .config("spark.ui.retainedDeadExecutors", "10")
    .config("spark.sql.ui.retainedExecutions", "25")

  def local(cpus: String, appName: String): SparkSession = {
    val s = tune(SparkSession.builder()
      .master(s"local[$cpus]")
      .appName(appName)
      .config("spark.sql.shuffle.partitions", cpus))
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
