package graft.tools

/** Dev probe: per-JOB call sites and walls for one query — names which
  * actions a multi-action operator (micro-batch store merges) actually
  * launches, so action-reduction work targets the real list.
  *
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
  *     sbt "runMain graft.tools.JobTrace st16_incremental_stats"
  */
object JobTrace {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.Sessions.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"), "graft-jobtrace")
    graft.Tables.load(spark, sfDir, "region").groupBy("r_name").count().count()
    for (name <- args) {
      val fn = graft.SparkEntry.queries(name)
      try fn(spark, sfDir).count()
      catch { case t: Throwable => System.err.println(s"warmup $name: $t") }
      val rows = new java.util.concurrent.ConcurrentLinkedQueue[String]()
      val t00 = System.nanoTime()
      val starts = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String, Int)]()
      val listener = new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            s: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
          val site = Option(s.properties)
            .flatMap(p => Option(p.getProperty("callSite.short")))
            .getOrElse("?")
          starts.put(s.jobId,
            (s.time, site, s.stageInfos.map(_.numTasks).sum))
        }
        override def onJobEnd(
            e: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
          Option(starts.remove(e.jobId)).foreach { case (t0, site, nt) =>
            rows.add(f"[job] ${(t0 - t00 / 1) / 1e9}%.0f id=${e.jobId}%3d " +
              f"${(e.time - t0) / 1e3}%7.3fs tasks=$nt%4d  $site")
          }
        }
      }
      spark.sparkContext.addSparkListener(listener)
      val t0 = System.nanoTime()
      try fn(spark, sfDir).count()
      catch { case t: Throwable => System.err.println(s"run $name: $t") }
      val wall = (System.nanoTime() - t0) / 1e9
      var last = -1
      var cur = rows.size()
      while (cur != last) { Thread.sleep(500); last = cur; cur = rows.size() }
      spark.sparkContext.removeSparkListener(listener)
      println(s"===== $name wall=$wall jobs=${rows.size()}")
      rows.toArray.map(_.toString).foreach(println)
    }
    spark.stop()
  }
}
