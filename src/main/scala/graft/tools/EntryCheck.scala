package graft.tools
object EntryCheck {
  def main(args: Array[String]): Unit = {
    val spark = graft.Sessions.local("4", "entry-check")
    val n = graft.SparkEntry.entry(spark).count()
    println(s"[entry] rows=$n")
    spark.stop()
  }
}
