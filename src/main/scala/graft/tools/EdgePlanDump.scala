package graft.tools

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.FormattedMode

/** Dev evidence tool: the aq60/aq62/aq132 graph gates build their
  * co-ordered-parts edge list and then CUT lineage before iterating,
  * so the registered query's own `.explain` shows only a
  * `Scan ExistingRDD` — the edge-build plan (where the r16 self-join →
  * generator-expansion rework lives) is invisible from the final
  * frame. This dumps both shapes' formatted plans over the real
  * lineitem table:
  *
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
  *     sbt "runMain graft.tools.EdgePlanDump"
  *
  * "before" is the replaced two-sided self-join, kept here verbatim as
  * the documented old shape; "after" is [[graft.Queries
  * .coOrderedPartPairs]] itself (the shipped code path).
  */
object EdgePlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.Sessions.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"), "graft-edgeplan")
    spark.sparkContext.setLogLevel("ERROR")
    val li = graft.Tables.load(spark, sfDir, "lineitem")
    val d = li.select(col("l_orderkey"), col("l_partkey")).distinct()
    val before = d.as("x").join(d.as("y"),
        col("x.l_orderkey") === col("y.l_orderkey") &&
          col("x.l_partkey") < col("y.l_partkey"))
      .select(col("x.l_partkey").as("a"), col("y.l_partkey").as("b"))
    val after = graft.Queries.coOrderedPartPairs(li)
    println("========== co_ordered_part_pairs BEFORE (self-join) ==========")
    println(before.queryExecution.explainString(FormattedMode))
    println("========== co_ordered_part_pairs AFTER (generator) ==========")
    println(after.queryExecution.explainString(FormattedMode))

    // The sq20/sq22 kept-baskets build (Similarity.keptBaskets) sits
    // ABOVE a lineage cut, so the registered queries' plan files only
    // show the post-cut ExistingRDD. Both shapes inlined here verbatim
    // (before = the wave-1 distinct + collect_list; after = the
    // shipped collect_set body) over the real events basket frame.
    val ev = li
      .join(graft.Tables.load(spark, sfDir, "orders"),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("o_custkey").as("u"), col("l_partkey").as("i"))
    val bBefore = ev.distinct().groupBy("u")
      .agg(sort_array(collect_list(col("i"))).as("__xs"))
      .filter(size(col("__xs")) <= 1000)
    val bAfter = ev.groupBy("u")
      .agg(sort_array(collect_set(col("i"))).as("__xs"))
      .filter(size(col("__xs")) <= 1000)
    println("========== kept_baskets BEFORE (distinct + collect_list) ==========")
    println(bBefore.queryExecution.explainString(FormattedMode))
    println("========== kept_baskets AFTER (collect_set) ==========")
    println(bAfter.queryExecution.explainString(FormattedMode))
    spark.stop()
  }
}
