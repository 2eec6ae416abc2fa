package graft.tools

/** Dev probe: WHERE does a streaming query's per-batch driver time go?
  * Attaches a [[org.apache.spark.sql.streaming.StreamingQueryListener]]
  * and sums each progress event's `durationMs` sections across the
  * run's micro-batches:
  *
  *   triggerExecution — whole batch wall (superset of the rest),
  *   addBatch         — sink/foreachBatch body incl. its Spark jobs,
  *   getBatch / latestOffset — source-side planning + listing,
  *   queryPlanning    — per-batch analysis/optimization of the plan,
  *   walCommit / commitOffsets — offset + commit WAL writes.
  *
  * The residual (wall − Σ triggerExecution) is stream start/stop +
  * driver work outside triggers.
  *
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
  *     sbt "runMain graft.tools.StWhere st16_incremental_stats"
  */
object StWhere {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.Sessions.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"), "graft-stwhere")
    sys.env.get("SPARK_GRAFT_EXTRA_CONF").foreach(_.split(";")
      .map(_.trim).filter(_.contains("=")).foreach { kv =>
        val Array(k, v) = kv.split("=", 2)
        spark.conf.set(k, v)
      })
    graft.Tables.load(spark, sfDir, "region").groupBy("r_name").count().count()
    val warm = sys.env.getOrElse("SPARK_GRAFT_WHERE_WARMUP", "1") == "1"
    for (name <- args) {
      val fn = graft.SparkEntry.queries(name)
      if (warm) {
        try fn(spark, sfDir).count()
        catch { case t: Throwable => System.err.println(s"warmup $name: $t") }
        releaseState(spark)
      }
      val sections = new java.util.concurrent.ConcurrentHashMap[String, Long]()
      val batches = new java.util.concurrent.atomic.AtomicInteger
      val listener = new org.apache.spark.sql.streaming.StreamingQueryListener {
        override def onQueryStarted(
            e: org.apache.spark.sql.streaming.StreamingQueryListener
              .QueryStartedEvent): Unit = ()
        override def onQueryProgress(
            e: org.apache.spark.sql.streaming.StreamingQueryListener
              .QueryProgressEvent): Unit = {
          batches.incrementAndGet()
          e.progress.durationMs.forEach { (k, v) =>
            sections.merge(k, v.longValue(), (a, b) => a + b)
          }
        }
        override def onQueryTerminated(
            e: org.apache.spark.sql.streaming.StreamingQueryListener
              .QueryTerminatedEvent): Unit = ()
      }
      spark.streams.addListener(listener)
      val t0 = System.nanoTime()
      try fn(spark, sfDir).count()
      catch { case t: Throwable => System.err.println(s"run $name: $t") }
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(1000) // let the async listener bus drain
      spark.streams.removeListener(listener)
      val parts = sections.entrySet().toArray
        .map(_.asInstanceOf[java.util.Map.Entry[String, Long]])
        .sortBy(-_.getValue)
        .map(en => f"${en.getKey}=${en.getValue / 1e3}%.2fs")
        .mkString(" ")
      println(f"[stwhere] $name wall $wall%.2f batches ${batches.get} $parts")
      releaseState(spark)
    }
    spark.stop()
  }

  private def releaseState(
      spark: org.apache.spark.sql.SparkSession): Unit = {
    spark.sharedState.cacheManager.clearCache()
    spark.sparkContext.getPersistentRDDs.values
      .foreach(_.unpersist(blocking = true))
    spark.catalog.listTables().collect()
      .filter(t => t.isTemporary && t.name.contains("_out_"))
      .foreach(t => spark.catalog.dropTempView(t.name))
  }
}
