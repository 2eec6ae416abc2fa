package graft

/** Dev tool: dump the formatted physical plan of one query (or all).
  * Usage: runMain graft.Explain [queryName] [sfDir]
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val spark = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"), "graft-explain")
    spark.sparkContext.setLogLevel("ERROR")
    val names =
      if (args.nonEmpty && args(0) != "all") Seq(args(0))
      else SparkEntry.queries.keys.toSeq.sorted
    // SPARK_GRAFT_EXPLAIN_EXECUTED=1: run the query and print the
    // EXECUTED plan (simple mode), whose *(n) prefixes show the
    // realized WholeStageCodegen spans — the pre-execution formatted
    // dump can't (AQE plans print isFinalPlan=false, no codegen ids)
    val executed = sys.env.get("SPARK_GRAFT_EXPLAIN_EXECUTED").contains("1")
    names.foreach { name =>
      println(s"\n========== $name ==========")
      try {
        val df = SparkEntry.queries(name)(spark, sfDir)
        if (executed) {
          df.count()
          println(df.queryExecution.executedPlan.toString)
        } else println(df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode))
      }
      catch { case e: Throwable => println(s"explain failed: $e") }
    }
    spark.stop()
  }
}
