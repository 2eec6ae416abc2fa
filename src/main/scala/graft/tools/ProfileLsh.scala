package graft.tools

import org.apache.spark.sql.functions._
import graft.functions.VectorExpressions._

/** Dev scratch: stage timings for the embedding near-dup LSH path. */
object ProfileLsh {
  def main(args: Array[String]): Unit = {
    val spark = graft.Sessions.local("32", "prof-lsh")
    spark.sparkContext.setLogLevel("ERROR")
    val base = graft.Tables.load(spark, "/root/testdata/sf0.1", "embeddings")
      .select("vec_id", "embedding")
    val pert = base.select((col("vec_id") + lit(1000000L)).as("vec_id"),
      concat(array((element_at(col("embedding"), 1) * lit(1.5)).cast("float")),
        slice(col("embedding"), 2, 10000)).as("embedding"))
    val e = base.unionByName(pert)
    def time(n: String)(f: => Long): Unit = {
      val t0 = System.nanoTime; val r = f
      println(f"PROF $n ${(System.nanoTime - t0) / 1e9}%.2f s rows=$r")
    }
    val t = 0.9; val r0 = 16
    val p1 = 1.0 - math.acos(t) / math.Pi
    val bands = math.ceil(math.log(1e5) / math.pow(p1, r0)).toInt
    println(s"PROF bands $bands")
    val rnd = new scala.util.Random(42L)
    val planes = Array.fill(bands * r0 * 64)(rnd.nextGaussian().toFloat)
    time("repart-check")(e.rdd.getNumPartitions)
    val src = e.repartition(32)
    val sigs = src.select(col("vec_id").as("id"), col("embedding").as("v"),
      float_norm(col("embedding")).as("nrm"),
      float_rhp_bands(col("embedding"), planes, 64, bands, r0).as("keys")).persist()
    time("sigs")(sigs.count())
    time("sigs2")(sigs.count())
    val banded = sigs.select(col("id"), posexplode(col("keys")))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "key")
    time("banded")(banded.count())
    val cand0 = graft.operators.Dedup.bucketPairs(banded, Seq("band", "key"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
    time("rawpairs")(cand0.count())
    val cand = cand0.dropDuplicates("id_a", "id_b")
    time("dedup")(cand.count())
    val out = cand
      .join(sigs.select(col("id").as("id_a"), col("v").as("va"), col("nrm").as("na")), "id_a")
      .join(sigs.select(col("id").as("id_b"), col("v").as("vb"), col("nrm").as("nb")), "id_b")
      .withColumn("cosine", round(float_dot(col("va"), col("vb")) / (col("na") * col("nb")), 4))
      .filter(col("cosine") >= t)
    time("verify")(out.count())
    spark.stop()
  }
}
