package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestSession

class SkewSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("saltedJoin equals the plain join on skewed data") {
    // 90% of rows share one key — the classic hot-key shape
    val big = (1 to 2000).map(i =>
      (if (i % 10 == 0) i.toLong else 1L, i)).toDF("k", "v")
    val small = Seq((1L, "hot"), (10L, "a"), (20L, "b")).toDF("k", "name")
    val plain = big.join(small, Seq("k")).orderBy("v")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2)))
    val salted = Skew.saltedJoin(big, small, "k", 8, Seq("v")).orderBy("v")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2)))
    assert(salted.toSeq == plain.toSeq)
    assert(plain.count(_._1 == 1L) == 1800)
  }

  test("salted rows of a hot key actually spread across salts") {
    val big = Seq.fill(1000)((1L, "x")).toDF("k", "v")
      .withColumn("v", concat(col("v"), monotonically_increasing_id()))
    val salts = big.withColumn("s", Skew.salt(8, col("v")))
      .select("s").distinct().count()
    assert(salts >= 6, s"expected hot key spread over most of 8 salts, got $salts")
  }

  test("salt is deterministic across recomputation and repartitioning") {
    val df = (1 to 500).map(i => (i.toLong, s"row$i")).toDF("k", "v")
    val a = df.withColumn("s", Skew.salt(16, col("v")))
      .select("k", "s").collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val b = df.repartition(7).withColumn("s", Skew.salt(16, col("v")))
      .select("k", "s").collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(a == b)
  }

  test("twoPhaseAgg combines partials to the exact plain-agg result") {
    val li = graft.Tables.load(spark, "/root/testdata/sf0.001", "lineitem")
    val plain = li.groupBy("l_returnflag")
      .agg(sum("l_quantity").as("q"), count(lit(1)).as("n"),
        max("l_extendedprice").as("m"))
      .orderBy("l_returnflag").collect().map(_.toSeq)
    val twoPhase = Skew.twoPhaseAgg(li,
      keys = Seq("l_returnflag"),
      saltFactor = 8,
      saltFrom = Seq("l_orderkey", "l_linenumber"),
      partials = Seq(sum("l_quantity").as("q"), count(lit(1)).as("n"),
        max("l_extendedprice").as("m")),
      finals = Seq(sum("q").as("q"), sum("n").as("n"), max("m").as("m")))
      .orderBy("l_returnflag").collect().map(_.toSeq)
    assert(twoPhase.toSeq == plain.toSeq)
  }
}
