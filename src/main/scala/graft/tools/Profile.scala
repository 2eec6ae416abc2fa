package graft.tools

import org.apache.spark.sql.functions._
import graft.{Sessions, Tables}

/** Dev scratch: time individual stages of the hot bench queries.
  * Not part of the library surface. */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = Sessions.local("32", "graft-profile")
    // warmup
    Tables.load(spark, sfDir, "region").groupBy("r_name").count().count()

    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[profile] $name%-28s ${(System.nanoTime() - t0) / 1e9}%6.2fs  rows=$n")
    }

    val docs0 = Tables.load(spark, sfDir, "documents")
    val docs = docs0.select(col("doc_id").as("id"),
      graft.operators.Dedup.shingleSet(col("text"), 3).as("sh"))
      .filter(size(col("sh")) > 0)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    time("docs persist")(docs.count())

    val inverted = docs.select(col("id"), size(col("sh")).as("n"),
      explode(col("sh")).as("shingle"))
    time("inverted")(inverted.count())

    val freq = inverted.groupBy("shingle").agg(count(lit(1)).as("__freq"))
    time("freq")(freq.count())

    import org.apache.spark.sql.expressions.Window
    val wDoc = Window.partitionBy("id").orderBy(col("__freq"), col("shingle"))
    val prefix = inverted
      .join(freq, "shingle")
      .withColumn("__rk", row_number().over(wDoc))
      .filter(col("__rk") <= col("n") - ceil(lit(0.9) * col("n")) + 1)
      .filter(col("__freq") > 1)
      .select("id", "shingle")
    time("prefix")(prefix.count())

    val pairsDf = prefix.groupBy("shingle")
      .agg(sort_array(collect_list(col("id"))).as("ids"))
      .filter(size(col("ids")) > 1)
      .select(col("ids"), posexplode(col("ids")))
      .select(col("col").as("id_a"),
        explode(slice(col("ids"), col("pos") + 2, size(col("ids")))).as("id_b"))
      .dropDuplicates("id_a", "id_b")
    time("candidates")(pairsDf.count())

    val inter = size(array_intersect(col("sh_a"), col("sh_b"))).cast("double")
    val uni = (size(col("sh_a")) + size(col("sh_b"))).cast("double") - inter
    val out = pairsDf
      .join(docs.select(col("id").as("id_a"), col("sh").as("sh_a")), "id_a")
      .join(docs.select(col("id").as("id_b"), col("sh").as("sh_b")), "id_b")
      .withColumn("jaccard", round(inter / uni, 4))
      .filter(col("jaccard") >= 0.9)
      .select("id_a", "id_b", "jaccard")
    time("verify")(out.count())

    time("dq3 end-to-end")(graft.operators.Dedup.ngramJaccardPairs(
      docs0, "doc_id", "text", 3, 0.9).count())
    time("dq3 again")(graft.operators.Dedup.ngramJaccardPairs(
      docs0, "doc_id", "text", 3, 0.9).count())

    time("aq4 end-to-end")(graft.SparkEntry.queries("aq4_tfidf")(spark, sfDir).count())
    time("aq4 again")(graft.SparkEntry.queries("aq4_tfidf")(spark, sfDir).count())
    spark.stop()
  }
}
