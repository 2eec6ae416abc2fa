package graft.tools

import graft.{Sessions, Tables}
import org.apache.spark.sql.functions._

/** Dev-only stage decomposition for dq18 (TF-IDF cosine pairs):
  * times each intermediate frame so the expensive stage is measured,
  * not guessed. */
object ProfileTfidf {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Sessions.local("8", "graft-profile-tfidf")
    Tables.load(spark, sfDir, "region").count()
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[tfidf] $label ${(System.nanoTime() - t0) / 1e9}%.2fs")
      r
    }
    for (rnd <- 1 to 2) {
      println(s"== round $rnd")
      val df = Tables.load(spark, sfDir, "documents")
      val grams = df.select(col("doc_id").as("id"),
        explode(graft.functions.TextKernelExpressions
          .word_ngrams_only(col("text"), 3)).as("tok"))
      time("grams")(grams.count())
      val tf = grams.groupBy("id", "tok").agg(count(lit(1)).as("__tf"))
      time("tf")(tf.count())
      val tfc = tf.transform(graft.operators.Lineage.cutLocal)
      time("tf cutLocal")(tfc.count())
      val nDocs = broadcast(tfc.select("id").distinct()
        .agg(count(lit(1)).cast("double").as("__n")))
      val dfx = tfc.groupBy("tok").agg(count(lit(1)).as("__df"))
        .filter(col("__df") <= 1000)
      time("dfx")(dfx.count())
      val w0 = tfc.join(dfx, "tok").crossJoin(nDocs)
        .select(col("id"), col("tok"),
          round(col("__tf") * log(col("__n") / col("__df")), 6)
            .cast("decimal(18,6)").as("w"))
      time("w")(w0.count())
      val w = w0.transform(graft.operators.Lineage.cutLocal)
      time("w cutLocal")(w.count())
      val norms = w.groupBy("id").agg(sum(col("w") * col("w")).as("__n2"))
      time("norms")(norms.count())
      val pairs = graft.operators.Dedup.bucketPairs(
        w, Seq("tok"), extraCols = Seq("w"))
      time("bucketPairs")(pairs.count())
      val dots = pairs
        .groupBy(col("a.id").as("id_a"), col("b.id").as("id_b"))
        .agg(sum(col("a.w") * col("b.w")).as("__dot"))
      time("dots")(dots.count())
      val fin = dots
        .join(norms.select(col("id").as("id_a"), col("__n2").as("__na")),
          "id_a")
        .join(norms.select(col("id").as("id_b"), col("__n2").as("__nb")),
          "id_b")
        .withColumn("cosine", round(col("__dot").cast("double") /
          (sqrt(col("__na").cast("double")) * sqrt(col("__nb").cast("double"))),
          4))
        .filter(col("cosine") >= 0.6)
      time("final")(fin.count())
    }
    spark.stop()
  }
}
