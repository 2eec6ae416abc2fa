package graft.tools
import graft.{Sessions, SparkEntry, Tables}
object RepeatBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Sessions.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"), "graft-repeat")
    Tables.load(spark, sfDir, "region").groupBy("r_name").count().count()
    val names = args.toSeq
    for (name <- names; i <- 1 to 3) {
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir).count()
      println(f"[repeat] $name run$i ${(System.nanoTime()-t0)/1e9}%.2fs")
    }
    spark.stop()
  }
}
