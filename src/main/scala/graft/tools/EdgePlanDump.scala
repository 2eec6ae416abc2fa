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
    // over the real basket frame: "shipped" = the two-pass distinct +
    // collect_list (KEPT — the one-pass collect_set measured 25%
    // slower at local[32], map-side set-buffer churn; r16 A/B in
    // OPTIMIZATION_r16.md §8), "rejected" = that one-pass form.
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
    println("========== kept_baskets SHIPPED (distinct + collect_list) ==========")
    println(bBefore.queryExecution.explainString(FormattedMode))
    println("========== kept_baskets REJECTED (one-pass collect_set) ==========")
    println(bAfter.queryExecution.explainString(FormattedMode))

    // The rank-kernel width pins (pettitt/spearman/rfm): the kernels'
    // repartitionByRange exchanges also sit below a lineage cut, so the
    // registered queries' plans show only the post-cut ExistingRDD.
    // This dumps the exchange the kernels build, at the session default
    // width (before) and at the derived width (after), over the real
    // events grid frame the aq109/aq77 kernels range-partition.
    val grid = graft.Tables.load(spark, sfDir, "events")
      .filter(col("value").isNotNull)
      .groupBy(col("event_type").as("__g"), col("value").as("__v"))
      .agg(count(lit(1)).as("__tc"))
    val sessionW = spark.sessionState.conf.numShufflePartitions
    val derivedW = graft.operators.Lineage.iterPartitions(
      graft.Tables.load(spark, sfDir, "events"))
    val kBefore = grid.repartitionByRange(sessionW, col("__g"), col("__v"))
      .sortWithinPartitions("__g", "__v")
    val kAfter = grid.repartitionByRange(derivedW, col("__g"), col("__v"))
      .sortWithinPartitions("__g", "__v")
    println(s"========== rank_kernel_exchange BEFORE (session width $sessionW) ==========")
    println(kBefore.queryExecution.explainString(FormattedMode))
    println(s"========== rank_kernel_exchange AFTER (derived width $derivedW) ==========")
    println(kAfter.queryExecution.explainString(FormattedMode))

    // The r17 portable-MinHash kernel (TextKernelExpressions
    // .PortableMinHash) replaced a two-stage HOF chain inside
    // Dedup.portableSigs, which sits below the audit queries' lineage
    // cuts — invisible from the registered queries' plan files. Both
    // shapes inlined verbatim over the real documents table: "before"
    // is the r16 chain, printed as its two arms (the md5-hex
    // projection that a localCheckpoint cut materialized — its only
    // job was stopping CollapseProject from re-inlining the md5 into
    // the k-hash lambda — then the k interpreted HOF lambdas over the
    // cut's ExistingRDD scan); "after" mirrors the shipped
    // portableSigs body: ONE compiled kernel over the live scan, no
    // materialization anywhere.
    val pp = 2147483647L
    val kh = 8
    val spreadDocs = graft.operators.Spread(
        graft.Tables.load(spark, sfDir, "documents"), col("doc_id"))
      .select(col("doc_id").as("id"),
        graft.operators.Dedup.shingleSet(col("text"), 3).as("sh"))
      .filter(size(col("sh")) > 0)
    val xsArm = spreadDocs.select(col("id"), transform(col("sh"), s =>
      conv(substring(md5(s), 1, 8), 16, 10).cast("long") % pp).as("__xs"))
    val sigBefore = graft.operators.Lineage.cutLocal(xsArm)
      .select(col("id"),
        transform(sequence(lit(0), lit(kh - 1)), i => {
          val a = (i.cast("long") * 2L + 1L) * 1597334677L % pp
          val b = (i.cast("long") * 40503L + 7L) % pp
          array_min(transform(col("__xs"), x => (a * x + b) % pp))
        }).as("sig"))
    val sigAfter = spreadDocs.select(col("id"),
      graft.functions.TextKernelExpressions
        .portable_minhash(col("sh"), kh).as("sig"))
    println("========== portable_sigs BEFORE arm 1 (md5-hex projection, materialized at the cut) ==========")
    println(xsArm.queryExecution.explainString(FormattedMode))
    println("========== portable_sigs BEFORE arm 2 (k interpreted HOF lambdas over the cut) ==========")
    println(sigBefore.queryExecution.explainString(FormattedMode))
    println("========== portable_sigs AFTER (one fused kernel over the live scan, no cut) ==========")
    println(sigAfter.queryExecution.explainString(FormattedMode))
    spark.stop()
  }
}
