package graft.tools

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.{Sessions, Tables}
import graft.operators.Similarity
import graft.functions.VectorExpressions.{float_dot, float_norm}

/** Dev harness: recall@k grid for the IVF ANN paths vs brute force.
  * Usage: runMain graft.tools.ProfileIvf [sfDir] */
object ProfileIvf {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = Sessions.local("8", "graft-ivf")
    val emb = Tables.load(spark, sfDir, "embeddings")
    val queries = emb.filter(col("vec_id") < 10)
    val k = 5
    val bf = Similarity.bruteForceTopK(emb, queries, "vec_id", "embedding", k)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    def recall(ann: DataFrame): Double = {
      val a = ann.select("query_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      (bf & a).size.toDouble / bf.size
    }

    // k-means centroids fitted once per cell count
    for (cells <- Seq(8, 16, 32)) {
      val (kIdx, kCents) =
        Similarity.ivfIndexKMeans(emb, "vec_id", "embedding", cells)
      val cents = kCents.collect()
        .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))

      // strategy variants share one assignment expression builder
      def scoreCells(vec: Column, byEuclid: Boolean): Seq[(Long, Column)] =
        cents.toSeq.map { case (cid, cv) =>
          val cn = math.sqrt(cv.map(x => x.toDouble * x).sum)
          val dot = float_dot(vec, typedLit(cv))
          val s = if (byEuclid) dot - lit(cn * cn / 2.0)
                  else dot / (float_norm(vec) * lit(cn))
          (cid, round(s, 4))
        }
      def argmaxCell(vec: Column, byEuclid: Boolean): Column = {
        val scored = scoreCells(vec, byEuclid).map { case (cid, s) =>
          struct(s.as("sim"), lit(-cid).as("neg_cell")) }
        -array_max(array(scored: _*)).getField("neg_cell")
      }
      // top-2 cells for spilled assignment
      def top2Cells(vec: Column, byEuclid: Boolean): Column = {
        val scored = scoreCells(vec, byEuclid).map { case (cid, s) =>
          struct(s.as("sim"), lit(-cid).as("neg_cell")) }
        slice(reverse(array_sort(array(scored: _*))), 1, 2)
      }

      def probeAndRank(indexed: DataFrame, byEuclid: Boolean,
          nProbe: Int): DataFrame = {
        import org.apache.spark.sql.expressions.Window
        val q = queries.select(col("vec_id").as("query_id"),
          col("embedding").as("qv"), float_norm(col("embedding")).as("qn"))
        val probed = q.withColumn("cells",
          slice(reverse(array_sort(array(scoreCells(col("qv"), byEuclid)
            .map { case (cid, s) =>
              struct(s.as("sim"), lit(-cid).as("neg_cell")) }: _*))),
            1, nProbe))
          .select(col("query_id"), col("qv"), col("qn"),
            explode(col("cells")).as("cs"))
          .withColumn("cell_id", -col("cs.neg_cell"))
          .drop("cs")
        val wRank = Window.partitionBy("query_id").orderBy(
          col("cosine").desc, col("neighbor_id"))
        broadcast(probed)
          .join(indexed.withColumnRenamed("vec_id", "neighbor_id"), "cell_id")
          .filter(col("query_id") =!= col("neighbor_id"))
          // spilled assignment can surface the same pair from two cells;
          // dedup BEFORE ranking or duplicates waste top-k slots
          .dropDuplicates("query_id", "neighbor_id")
          .withColumn("cosine", round(
            float_dot(col("qv"), col("embedding")) /
              (col("qn") * float_norm(col("embedding"))), 4))
          .withColumn("rank", row_number().over(wRank))
          .filter(col("rank") <= k)
      }

      val cosIdx = emb.withColumn("cell_id", argmaxCell(col("embedding"), false))
      val eucIdx = emb.withColumn("cell_id", argmaxCell(col("embedding"), true))
      val spillIdx = emb.withColumn("c2", top2Cells(col("embedding"), true))
        .select(col("vec_id"), col("embedding"), explode(col("c2")).as("cs"))
        .withColumn("cell_id", -col("cs.neg_cell"))
        .drop("cs")

      for (nProbe <- Seq(2, 4, 6, 8)) {
        val rCos = recall(probeAndRank(cosIdx, false, nProbe))
        val rEuc = recall(probeAndRank(eucIdx, true, nProbe))
        val rSpill = recall(probeAndRank(spillIdx, true, nProbe))
        println(f"[ivf] cells=$cells%2d nProbe=$nProbe%2d " +
          f"cos=$rCos%.2f euclid=$rEuc%.2f euclid+spill2=$rSpill%.2f")
      }
    }
    spark.stop()
  }
}
