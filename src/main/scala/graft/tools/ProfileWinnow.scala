package graft.tools

import org.apache.spark.sql.functions._
import graft.{Sessions, Tables}

/** Dev scratch: stage timing for dq15 winnowing. Not library surface. */
object ProfileWinnow {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = Sessions.local("32", "graft-profile-winnow")
    Tables.load(spark, sfDir, "region").groupBy("r_name").count().count()
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[pw] $name%-22s ${(System.nanoTime() - t0) / 1e9}%7.2fs rows=$n")
    }
    val df = Tables.load(spark, sfDir, "documents")
    val toks = graft.functions.TextFunctions.wsTokens(lower(col("text")))
    val grams = transform(
      sequence(lit(0), size(col("__tk")) - 3),
      i => array_join(slice(col("__tk"), i + 1, lit(3)), " "))
    val hashes = transform(col("__grams"),
      g => conv(substring(md5(g), 1, 8), 16, 10).cast("long"))
    val fps = when(size(col("__h")) <= 4,
        array(array_min(col("__h"))))
      .otherwise(array_distinct(transform(
        sequence(lit(0), size(col("__h")) - 4),
        p => array_min(slice(col("__h"), p + 1, lit(4))))))
    val d1 = df.select(col("doc_id").as("id"), toks.as("__tk"))
      .filter(size(col("__tk")) >= 3)
    time("tokens")(d1.count())
    val d2 = d1.select(col("id"), grams.as("__grams"))
    time("grams")(d2.count())
    val d3 = d2.select(col("id"), hashes.as("__h"))
    time("hashes")(d3.count())
    val d4 = d3.select(col("id"), fps.as("__fp")).localCheckpoint(false)
    time("fingerprints")(d4.count())
    val inv = d4.select(col("id"), size(col("__fp")).as("n"),
      explode(col("__fp")).as("fp")).localCheckpoint(false)
    time("inverted")(inv.count())
    time("fp df histogram")(inv.groupBy("fp").count()
      .select(max(col("count"))).head().getLong(0))
    val w = org.apache.spark.sql.expressions.Window.partitionBy("fp")
    val capped = inv.withColumn("__df", count(lit(1)).over(w))
      .filter(col("__df") <= 50).drop("__df").localCheckpoint(false)
    time("capped inv")(capped.count())
    val pairs = graft.operators.Dedup.bucketPairs(
      capped, Seq("fp"), extraCols = Seq("n"))
    time("bucket pairs")(pairs.count())
    val out = pairs
      .groupBy(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .agg(count(lit(1)).as("shared_fps"),
        min(col("a.n")).as("__na"), min(col("b.n")).as("__nb"))
      .filter(col("shared_fps") >= 2)
    time("pair agg")(out.count())
    spark.stop()
  }
}
