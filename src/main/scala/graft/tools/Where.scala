package graft.tools

import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}

/** Dev probe: WHERE does a query's wall-clock go? For each named query
  * (after a session warmup run absorbing codegen), one instrumented
  * run reports
  *
  *   wall      — driver-observed wall seconds,
  *   jobs/stages/tasks — scheduling volume,
  *   jobWall   — Σ per-job (end − start): wall spent inside Spark jobs
  *               (gaps to `wall` = driver-side planning/analysis/
  *               between-action work),
  *   taskTime  — Σ task executorRunTime (compute, all cores),
  *   sched     — Σ task schedulerDelay-ish (launch − deser − run),
  *   fetch     — Σ shuffle fetch wait,
  *   shufMB    — shuffle bytes written,
  *   gc        — Σ task JVM GC time.
  *
  * jobWall ≫ taskTime/cores ⇒ scheduling-bound (many tiny tasks);
  * wall ≫ jobWall ⇒ driver-bound (planning, driver-side loops).
  *
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
  *     sbt "runMain graft.tools.Where sq22_assoc_rules aq84_poisson_bootstrap"
  */
object Where {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.Sessions.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"), "graft-where")
    // dev A/B knob: SPARK_GRAFT_EXTRA_CONF="key=value;key=value"
    sys.env.get("SPARK_GRAFT_EXTRA_CONF").foreach(_.split(";")
      .map(_.trim).filter(_.contains("=")).foreach { kv =>
        val Array(k, v) = kv.split("=", 2)
        spark.conf.set(k, v)
      })
    graft.Tables.load(spark, sfDir, "region").groupBy("r_name").count().count()
    val warm = sys.env.getOrElse("SPARK_GRAFT_WHERE_WARMUP", "1") == "1"
    println("[where] name wall jobs stages tasks jobWall taskTime fetch shufMB gc")
    for (name <- args) {
      val fn = graft.SparkEntry.queries(name)
      if (warm) {
        try fn(spark, sfDir).count()
        catch { case t: Throwable => System.err.println(s"warmup $name: $t") }
        releaseState(spark)
      }
      val jobs = new AtomicInteger
      val stages = new AtomicInteger
      val tasks = new AtomicInteger
      val jobWall = new AtomicLong
      val taskTime = new AtomicLong
      val fetchWait = new AtomicLong
      val shufWrite = new AtomicLong
      val gc = new AtomicLong
      val jobStart = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
      val listener = new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            s: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
          jobs.incrementAndGet()
          jobStart.put(s.jobId, s.time)
        }
        override def onJobEnd(
            e: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
          val t0 = jobStart.remove(e.jobId)
          if (t0 != 0L) jobWall.addAndGet(e.time - t0)
        }
        override def onStageCompleted(
            s: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit =
          stages.incrementAndGet()
        override def onTaskEnd(
            t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
          tasks.incrementAndGet()
          val m = t.taskMetrics
          if (m != null) {
            taskTime.addAndGet(m.executorRunTime)
            fetchWait.addAndGet(m.shuffleReadMetrics.fetchWaitTime)
            shufWrite.addAndGet(m.shuffleWriteMetrics.bytesWritten)
            gc.addAndGet(m.jvmGCTime)
          }
        }
      }
      spark.sparkContext.addSparkListener(listener)
      val t0 = System.nanoTime()
      try fn(spark, sfDir).count()
      catch { case t: Throwable => System.err.println(s"run $name: $t") }
      val wall = (System.nanoTime() - t0) / 1e9
      // drain the async bus until counters stabilize
      var last = (-1, -1)
      var cur = (jobs.get, tasks.get)
      while (cur != last) { Thread.sleep(500); last = cur; cur = (jobs.get, tasks.get) }
      spark.sparkContext.removeSparkListener(listener)
      println(f"[where] $name $wall%.2f ${jobs.get} ${stages.get} " +
        f"${tasks.get} ${jobWall.get / 1e3}%.2f ${taskTime.get / 1e3}%.2f " +
        f"${fetchWait.get / 1e3}%.2f ${shufWrite.get / 1e6}%.1f " +
        f"${gc.get / 1e3}%.2f")
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
