package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Similarity search over embedding columns (`Array[Float]`).
  *
  * Two paths:
  *  - brute-force cosine top-k: exact; the query side is small and
  *    broadcast, so the plan is a broadcast nested-loop join + per-query
  *    top-k window — linear in corpus size, embarrassingly parallel,
  *    and the right baseline at any scale;
  *  - IVF (inverted-file) ANN: corpus bucketed by nearest centroid at
  *    write time; a query probes only its `nProbe` nearest cells,
  *    cutting scanned vectors by ~K/nProbe. Centroids here are seeded
  *    deterministically (first K vectors by id) — at production scale
  *    they would come from a k-means fit, but the bucketing/probing
  *    plumbing is identical.
  *
  * Dot products use `zip_with` + `aggregate` over doubles — built-in,
  * codegen'd, no UDF. Cosines are rounded to 4 dp BEFORE ranking with an
  * id tie-break, so rankings are reproducible across engines and runs.
  */
object Similarity {

  /** Cosine similarity of two float-array columns, computed in double.
    * Uses the native codegen expressions (graft.functions
    * .VectorExpressions) — a tight primitive loop instead of per-pair
    * array materialization; same left-to-right double accumulation as
    * the composable form, so oracle parity is unchanged. */
  def cosine(a: Column, b: Column): Column =
    graft.functions.VectorExpressions.float_cosine(a, b)

  /** Exact top-k neighbors for each query vector. `queries` should be
    * small (it is broadcast); `corpus` can be arbitrarily large. Self
    * matches are excluded. */
  def bruteForceTopK(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import graft.functions.VectorExpressions.{float_dot, float_norm}
    // norms computed once per side, not per pair
    val q = broadcast(queries.select(
      col(idCol).as("query_id"), col(vecCol).as("qv"),
      float_norm(col(vecCol)).as("qn")))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"),
      float_norm(col(vecCol)).as("cn"))
    val scored = q.crossJoin(c)
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine",
        round(float_dot(col("qv"), col("cv")) / (col("qn") * col("cn")), 4))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cosine").desc, col("neighbor_id"))
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "cosine", "rank")
  }

  /** All pairs with cosine >= threshold. Brute force (all-pairs) — exact
    * and oracle-able; for planet-scale corpora swap the candidate
    * generation for `Dedup.simhashPairs`-style LSH bucketing and keep
    * the same verification. */
  def nearDupPairs(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      threshold: Double): DataFrame = {
    import graft.functions.VectorExpressions.{float_dot, float_norm}
    val a = corpus.select(col(idCol).as("id_a"), col(vecCol).as("va"),
      float_norm(col(vecCol)).as("na"))
    val b = corpus.select(col(idCol).as("id_b"), col(vecCol).as("vb"),
      float_norm(col(vecCol)).as("nb"))
    a.crossJoin(b)
      .filter(col("id_a") < col("id_b"))
      .withColumn("cosine",
        round(float_dot(col("va"), col("vb")) / (col("na") * col("nb")), 4))
      .filter(col("cosine") >= threshold)
      .select("id_a", "id_b", "cosine")
  }

  /** IVF index with k-means-fitted centroids (spark.ml KMeans, fixed
    * seed): returns (vector rows with cell_id, centroid table). Cluster
    * quality beats seed-vector centroids, so probes recall more for the
    * same nProbe. The fit is one pass over a sampled/bounded corpus in
    * production; assignment is a broadcast nearest-centroid scan. */
  def ivfIndexKMeans(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      numCells: Int,
      seed: Long = 42L): (DataFrame, DataFrame) = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.{array_to_vector, vector_to_array}
    val withVec = corpus.withColumn("__features",
      array_to_vector(col(vecCol).cast("array<double>")))
    // random init (one job) instead of k-means|| (initSteps distributed
    // sampling rounds), bounded iterations: centroid quality for IVF
    // probing converges long before the default 20 — at production scale
    // the fit would also run on a bounded SAMPLE of the corpus
    val model = new KMeans()
      .setK(numCells).setSeed(seed).setFeaturesCol("__features")
      .setPredictionCol("cell_id")
      .setInitMode("random").setMaxIter(10)
      .fit(withVec.coalesce(8))
    val indexed = model.transform(withVec).drop("__features")
    val centroids = corpus.sparkSession.createDataFrame(
      model.clusterCenters.zipWithIndex.map { case (c, i) =>
        (i, c.toArray.map(_.toFloat))
      }.toSeq).toDF("cell_id", "centroid")
    (indexed, centroids)
  }

  /** ANN top-k through a k-means IVF index. */
  def ivfKMeansTopK(
      indexed: DataFrame,
      centroids: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      nProbe: Int,
      k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import graft.functions.VectorExpressions.{float_dot, float_norm}
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"),
      float_norm(col(vecCol)).as("qn"))
    val wProbe = Window.partitionBy("query_id").orderBy(
      col("csim").desc, col("cell_id"))
    val probes = broadcast(q.crossJoin(broadcast(centroids))
      .withColumn("csim", round(cosine(col("qv"), col("centroid")), 4))
      .withColumn("pr", row_number().over(wProbe))
      .filter(col("pr") <= nProbe)
      .select("query_id", "qv", "qn", "cell_id"))

    val wRank = Window.partitionBy("query_id").orderBy(
      col("cosine").desc, col("neighbor_id"))
    probes.join(indexed.withColumnRenamed(idCol, "neighbor_id"), "cell_id")
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine", round(
        float_dot(col("qv"), col(vecCol)) /
          (col("qn") * float_norm(col(vecCol))), 4))
      .withColumn("rank", row_number().over(wRank))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "cosine", "rank")
  }

  /** Assign every corpus vector to its nearest centroid cell.
    * Deterministic seed centroids: the `numCells` lowest-id vectors. */
  def ivfIndex(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      numCells: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val centroids = broadcast(
      corpus.orderBy(col(idCol)).limit(numCells)
        .select(col(idCol).as("cell_id"), col(vecCol).as("centroid")))
    val w = Window.partitionBy(col(idCol)).orderBy(
      col("sim").desc, col("cell_id"))
    corpus.select(col(idCol), col(vecCol))
      .crossJoin(centroids)
      .withColumn("sim", round(cosine(col(vecCol), col("centroid")), 4))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") === 1)
      .select(col(idCol), col(vecCol), col("cell_id"))
  }

  /** ANN top-k through the IVF index: each query probes its `nProbe`
    * nearest cells and ranks only vectors in those cells. */
  def ivfTopK(
      index: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      numCells: Int,
      nProbe: Int,
      k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val centroids = broadcast(
      index.filter(col(idCol) === col("cell_id"))
        .select(col("cell_id"), col(vecCol).as("centroid")))

    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
    val wProbe = Window.partitionBy("query_id").orderBy(
      col("csim").desc, col("cell_id"))
    val probes = broadcast(q.crossJoin(centroids)
      .withColumn("csim", round(cosine(col("qv"), col("centroid")), 4))
      .withColumn("pr", row_number().over(wProbe))
      .filter(col("pr") <= nProbe)
      .select("query_id", "qv", "cell_id"))

    val wRank = Window.partitionBy("query_id").orderBy(
      col("cosine").desc, col("neighbor_id"))
    probes.join(index.withColumnRenamed(idCol, "neighbor_id"), "cell_id")
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine", round(cosine(col("qv"), col(vecCol)), 4))
      .withColumn("rank", row_number().over(wRank))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "cosine", "rank")
  }
}
