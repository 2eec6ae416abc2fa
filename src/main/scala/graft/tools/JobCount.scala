package graft.tools

/** Spark-job counter for named registry queries — the plan-discipline
  * probe behind "job count measurably down" claims: scheduling
  * overhead on iterative operators (HITS, PageRank, k-means) is jobs
  * × fixed latency, so the JOB COUNT is the honest readout, not a
  * wall-clock sample on a contended box.
  *
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
  *     sbt "runMain graft.tools.JobCount aq92_hits aq44_pagerank"
  *
  * Prints one `[jobs] <name> <count>` line per query (first execution
  * after a session-wide warmup; the listener bus is drained by polling
  * until the count is stable — bus delivery is async). */
object JobCount {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.Sessions.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"), "graft-jobcount")
    // A/B probe: SPARK_GRAFT_AQE=0 disables adaptive execution, to
    // separate AQE stage-job scheduling from the plan's own actions
    if (sys.env.get("SPARK_GRAFT_AQE").contains("0"))
      spark.conf.set("spark.sql.adaptive.enabled", "false")
    graft.Tables.load(spark, sfDir, "region").groupBy("r_name").count().count()
    for (name <- args) {
      val jobs = new java.util.concurrent.atomic.AtomicInteger
      val listener = new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            s: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
          jobs.incrementAndGet()
      }
      spark.sparkContext.addSparkListener(listener)
      graft.SparkEntry.queries(name)(spark, sfDir).count()
      var last = -1
      var cur = jobs.get
      while (cur != last) { Thread.sleep(500); last = cur; cur = jobs.get }
      spark.sparkContext.removeSparkListener(listener)
      println(s"[jobs] $name $cur")
    }
    spark.stop()
  }
}
