package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The r16 optimization seams: Spread (adaptive input
  * parallelization), Lineage.iterPartitions (adaptive AQE-off shuffle
  * width), the PoissonWeights kernel, and the basket pair-expansion
  * rework — each pinned against the formulation it replaced. */
class SpreadSpec extends AnyFunSuite {
  lazy val spark = graft.SparkTestSession.spark
  import spark.implicits._

  private def exchanges(df: org.apache.spark.sql.DataFrame): Int = {
    df.collect()
    def deep(p: org.apache.spark.sql.execution.SparkPlan)
        : Seq[org.apache.spark.sql.execution.SparkPlan] =
      Seq(p) ++ (p.children ++ p.subqueries).flatMap(deep) ++ (p match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          deep(a.executedPlan)
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
          deep(q.plan)
        case _ => Nil
      })
    deep(df.queryExecution.executedPlan).count(
      _.isInstanceOf[org.apache.spark.sql.execution.exchange.ShuffleExchangeLike])
  }

  test("Spread fires on a small scan and is values-identical") {
    val dir = java.nio.file.Files.createTempDirectory("spread").toString
    // ~50k incompressible-ish rows ≈ a few MB on disk: small enough to
    // sit under the 256 MB cap, big enough that 64 KB/partition wants
    // more than one partition
    spark.range(50000).select(col("id"), md5(col("id").cast("string")).as("s"))
      .coalesce(1).write.mode("overwrite").parquet(dir)
    val base = spark.read.parquet(dir)
    val out = Spread(base, col("id"))
    // small leaf → an explicit keyed repartition appears
    assert(out.rdd.getNumPartitions >= 2)
    assert(out.orderBy("id").collect().toSeq ==
      base.orderBy("id").collect().toSeq)
  }

  test("Spread no-ops when the cap marks the input large (the 100 TB arm)") {
    val dir = java.nio.file.Files.createTempDirectory("spread").toString
    (1L to 100L).toDF("id").coalesce(1).write.mode("overwrite").parquet(dir)
    val base = spark.read.parquet(dir)
    spark.conf.set("spark.graft.spread.smallInputBytes", "0")
    try assert(Spread(base, col("id")).queryExecution.logical eq
      base.queryExecution.logical)
    finally spark.conf.unset("spark.graft.spread.smallInputBytes")
  }

  test("Spread no-ops on unknown (lineage-cut default) leaf statistics") {
    // a localCheckpoint of an in-memory frame reports no honest leaf
    // bytes — Spread must degrade to a no-op, never guess
    val cut = Lineage.cutLocal((1L to 50L).toDF("id"))
    val bytes = cut.queryExecution.optimizedPlan.collectLeaves()
      .map(_.stats.sizeInBytes).sum
    val out = Spread(cut, col("id"))
    if (bytes >= BigInt(256L << 20))
      assert(out.queryExecution.logical eq cut.queryExecution.logical)
  }

  test("iterPartitions derives from leaf bytes and clamps to the session") {
    val dir = java.nio.file.Files.createTempDirectory("iterp").toString
    (1L to 1000L).toDF("id").coalesce(1).write.mode("overwrite").parquet(dir)
    val small = spark.read.parquet(dir)
    val k = Lineage.iterPartitions(small)
    val session = spark.conf.get("spark.sql.shuffle.partitions").toInt
    assert(k >= 1 && k <= session)
    // a tiny parquet leaf sits far under 4 MB → one partition
    assert(k == 1)
  }

  test("PoissonWeights equals the built-in md5/conv chain bit-for-bit") {
    val ts = Stats.poissonThresholds()
    val ids = Seq("7", "42", "event:9001", "x").toDF("id")
    val kernel = ids.select(col("id"),
      posexplode(graft.functions.StatKernelExpressions.poisson_weights(
        col("id"), 16, ts)).as(Seq("b", "w")))
    val h = conv(substring(md5(concat(col("id"), lit(":"),
      col("b").cast("string"))), 1, 8), 16, 10).cast("long")
    val chain = ts.zipWithIndex.tail
      .foldLeft(when(h < lit(ts.head), 0L)) {
        case (c, (t, k)) => c.when(h < lit(t), k.toLong)
      }.otherwise(9L)
    val joined = ids
      .select(col("id"), explode(sequence(lit(0), lit(15))).as("b"))
      .withColumn("w_chain", chain)
      .join(kernel, Seq("id", "b"))
    assert(joined.filter(col("w_chain") =!= col("w")).count() == 0)
    assert(joined.count() == 4 * 16)
  }

  test("coOrderedPartPairs equals the orderkey self-join it replaced") {
    // the graph-gate edge build (aq60/aq62/aq132): pair MULTISET must
    // match the old x.l_orderkey = y.l_orderkey AND x.l_partkey <
    // y.l_partkey self-join — including cross-order duplicate pairs
    val li = Seq(
      (100L, 1L), (100L, 2L), (100L, 3L), (100L, 2L),
      (200L, 2L), (200L, 3L),
      (300L, 1L), (300L, 2L), (300L, 3L), (300L, 4L),
      (400L, 7L)).toDF("l_orderkey", "l_partkey")
    val d = li.distinct()
    val oldPairs = d.as("x").join(d.as("y"),
        col("x.l_orderkey") === col("y.l_orderkey") &&
          col("x.l_partkey") < col("y.l_partkey"))
      .groupBy(col("x.l_partkey").as("a"), col("y.l_partkey").as("b"))
      .agg(count(lit(1)).as("n"))
    val newPairs = graft.Queries.coOrderedPartPairs(li)
      .groupBy("a", "b").agg(count(lit(1)).as("n"))
    val mismatch = oldPairs.join(newPairs, Seq("a", "b"), "full_outer")
      .filter(oldPairs("n").isNull || newPairs("n").isNull ||
        oldPairs("n") =!= newPairs("n"))
    assert(mismatch.count() == 0)
    assert(newPairs.agg(sum("n")).as[Long].head() == 3L + 1L + 6L)
  }

  test("heavy users are cut BEFORE the basket collect buffers any array") {
    val baskets = ((1 to 30).map(i => (1L, i.toLong)) ++
      Seq((2L, 1L), (2L, 2L))).toDF("u", "i")
    val kept = Similarity.keptBasketsPlan(baskets, "u", "i", 10)
    kept.collect()
    // behaviorally: user 1 (30 distinct items > 10) never surfaces
    assert(kept.select("u").as[Long].collect().toSeq == Seq(2L))
    // structurally: the window-count Filter sits BELOW the
    // collect_list aggregate (a descendant prints after its ancestor
    // in the plan tree), so an over-limit user's rows are discarded
    // in the window's spillable buffer before any array aggregation
    // buffer (non-spillable) sees them
    val s = kept.queryExecution.executedPlan.toString
    val agg = s.indexOf("collect_list")
    val cut = s.indexOf("__n")
    assert(agg >= 0 && cut >= 0 && agg < cut,
      s"expected the __n heavy-user Filter below the collect aggregate:\n$s")
  }

  test("basket pair expansion equals the u-keyed self-join it replaced") {
    val baskets = Seq(
      (1L, 10L), (1L, 11L), (1L, 12L), (1L, 10L),
      (2L, 11L), (2L, 12L),
      (3L, 10L), (3L, 11L), (3L, 12L), (3L, 13L),
      (4L, 99L)).toDF("u", "i")
    val b = baskets.distinct()
    val oldPairs = b.as("a").join(b.as("b"),
        col("a.u") === col("b.u") && col("a.i") < col("b.i"))
      .groupBy(col("a.i").as("x"), col("b.i").as("y"))
      .agg(count(lit(1)).as("n"))
    val rules = Similarity.associationRules(
      baskets, "u", "i", minSupport = 1L, maxPerUser = 10, topK = 1000)
    // every directed rule's joint support equals the self-join count
    val oldDirected = oldPairs.select(col("x").as("antecedent"),
        col("y").as("consequent"), col("n"))
      .unionByName(oldPairs.select(col("y").as("antecedent"),
        col("x").as("consequent"), col("n")))
    val mismatch = rules.select("antecedent", "consequent", "n_both")
      .join(oldDirected, Seq("antecedent", "consequent"), "full_outer")
      .filter(col("n_both").isNull || col("n").isNull ||
        col("n_both") =!= col("n"))
    assert(mismatch.count() == 0)
  }
}
