package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deterministic Lloyd k-means over an embedding column — the
  * clustering stage of cluster-balanced data mixing (group a corpus by
  * embedding cell, then sample per cell to flatten the topic
  * distribution; the shape used by cluster-dedup/cluster-sampling
  * curation recipes).
  *
  * Spark ML's KMeans stays available for quality-seeking fits
  * ([[Similarity.ivfIndexKMeans]]); THIS variant trades fit quality for
  * full determinism — seed centroids are the `k` lowest-id vectors,
  * similarity is round(cosine, 4) with lowest-cell tie-break, centroid
  * updates round to 6 decimals then float — which makes every Lloyd
  * round exactly replayable in an external SQL engine (the aq33 gate
  * unrolls the same rounds in DuckDB).
  *
  * Scale shape per round: assignment is a map-side projection (inline
  * argmax over k codegen cosine kernels — no crossJoin, no shuffle);
  * the update is ONE aggregate bounded by k × dim groups whose result
  * (the next centroid table) is the only driver state. `iters` rounds
  * cost `iters` bounded shuffles + `iters + 1` corpus passes — no
  * pass is ever quadratic, and nothing scales with corpus size except
  * the embarrassingly-parallel projections. The double `avg` inside
  * the update is the one cross-engine drift surface (same accepted
  * residual risk as sq3/aq8); everything after it is order-pinned
  * arithmetic.
  */
object Clustering {

  /** Seed + fit: `iters` Lloyd rounds from the k lowest-id vectors
    * (shared by [[kmeansCellStats]] and [[cellQuality]] so the two
    * gates replay the SAME trajectory). Returns `(base, centroids)`
    * where base is the lineage-cut `(id, v)` frame. */
  private def lloydFit(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      iters: Int): (DataFrame, Seq[(Long, Array[Float])]) = {
    require(k > 0 && iters >= 0, "k and iters must be positive")
    val dim = corpus.select(size(col(vecCol))).head().getInt(0)

    var cents: Seq[(Long, Array[Float])] = corpus
      .orderBy(col(idCol)).limit(k)
      .select(col(idCol).cast("long"), col(vecCol))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray)).toSeq
    // re-key cells 0..k-1 (seed ids are arbitrary; cell ids must be
    // dense and engine-independent)
    cents = cents.sortBy(_._1).zipWithIndex.map { case ((_, v), i) =>
      (i.toLong, v)
    }

    val base = Lineage.cutLocal(
      corpus.select(col(idCol).as("id"), col(vecCol).as("v")))

    for (_ <- 1 to iters) {
      // one k×dim-bounded aggregate; round(avg, 6) then float pins the
      // next round's centroid bits on both engines
      val updates = base
        .select(Similarity.cosineArgmaxCell(col("v"), cents).as("cell_id"),
          posexplode(col("v")))
        .groupBy(col("cell_id"), col("pos"))
        .agg(round(avg(col("col").cast("double")), 6)
          .cast("float").as("m"))
        .collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getFloat(2)))
        .groupBy(_._1)
      cents = cents.map { case (cid, prev) =>
        updates.get(cid) match {
          case Some(rows) =>
            val arr = new Array[Float](dim)
            rows.foreach { case (_, d, m) => arr(d) = m }
            (cid, arr)
          case None => (cid, prev) // empty cell keeps its centroid
        }
      }
    }
    (base, cents)
  }

  /** `iters` assign+update rounds from the k lowest-id seeds, then a
    * final assignment under the refined centroids. Returns one row per
    * cell: (cell_id, n_vecs, share, centroid_norm). */
  def kmeansCellStats(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      iters: Int): DataFrame = {
    val spark = corpus.sparkSession
    val (base, cents) = lloydFit(corpus, idCol, vecCol, k, iters)

    val counts = Lineage.cutLocal(base
      .select(Similarity.cosineArgmaxCell(col("v"), cents).as("cell_id"))
      .groupBy("cell_id").agg(count(lit(1)).as("n_vecs")))
    // share denominator as a broadcast 1-row aggregate (the sq6
    // pattern) — not a partitionless window, which funnels the frame
    // to one partition
    val totals = broadcast(counts.agg(sum(col("n_vecs")).as("__total")))
    import spark.implicits._
    val norms = cents.map { case (cid, v) =>
      var s = 0.0
      var i = 0
      while (i < v.length) { s += v(i).toDouble * v(i).toDouble; i += 1 }
      (cid, BigDecimal(math.sqrt(s)).setScale(4,
        BigDecimal.RoundingMode.HALF_UP).toDouble)
    }.toDF("cell_id", "centroid_norm")
    counts
      .crossJoin(totals)
      .withColumn("share", round(col("n_vecs") / col("__total"), 4))
      .drop("__total")
      .join(broadcast(norms), Seq("cell_id"), "right")
      .select(col("cell_id"), coalesce(col("n_vecs"), lit(0L)).as("n_vecs"),
        coalesce(col("share"), lit(0.0)).as("share"), col("centroid_norm"))
      .orderBy("cell_id")
  }

  /** Per-cell cohesion report over the SAME deterministic trajectory
    * as [[kmeansCellStats]]: each vector's 4dp cosine to its chosen
    * centroid, aggregated per cell — `(cell_id, n_vecs, avg_sim,
    * min_sim)`. The clustering-quality probe behind "are these cells
    * tight enough to sample from": loose cells (low avg, low min) are
    * topic mixtures a cluster-balanced mixer should split further.
    * avg_sim is a decimal sum of 4dp sims divided once in double —
    * exact in any engine; empty cells emit no row (they have no
    * members to measure).
    *
    * Scale shape: the fit is [[lloydFit]] (bounded aggregates); the
    * report adds one map-side argmax projection + a k-ary aggregate. */
  def cellQuality(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      iters: Int): DataFrame = {
    val (base, cents) = lloydFit(corpus, idCol, vecCol, k, iters)
    base
      .select(Similarity.cosineArgmaxCellWithSim(col("v"), cents).as("b"))
      .select(col("b.cell_id").as("cell_id"), col("b.sim").as("sim"))
      .groupBy("cell_id")
      .agg(
        count(lit(1)).as("n_vecs"),
        round(sum(col("sim").cast("decimal(18,4)")).cast("double") /
          count(lit(1)), 6).as("avg_sim"),
        min("sim").as("min_sim"))
      .orderBy("cell_id")
  }

  /** Davies–Bouldin index (Davies & Bouldin 1979) over the SAME
    * deterministic trajectory as [[kmeansCellStats]] — the
    * scatter-vs-separation cluster-validity readout ([[cellQuality]]
    * measures cohesion per cell; DB asks the harder "is each cluster
    * also FAR from its most confusable neighbor"):
    *
    *   S_i = avg distance of members to centroid i (1 − cosine),
    *   M_ij = 1 − cos(c_i, c_j),   R_ij = (S_i + S_j) / M_ij,
    *   DB = (1/k)·Σ_i max_{j≠i} R_ij   — lower is better.
    *
    * Determinism contract: member distances are exact 4dp decimals
    * (1 − the pinned assignment cosine, decimal-summed — the
    * [[cellQuality]] discipline) with S_i rounded to 6dp; centroid
    * distances are driver-computed on the k×dim codebook with the
    * SAME sequential dot/norm order and 4dp rounding the oracle's
    * list_sum replay uses; per-cell maxima round to 8dp and
    * decimal-sum (cell order differs between engines). Coincident
    * centroids (M ≤ 0 at 4dp) are excluded pairwise — their R is
    * unbounded by construction; a cell left with no valid pair drops
    * from the average. Empty cells have no S and drop too (standard).
    *
    * Scale shape: the fit is [[lloydFit]] (bounded aggregates); the
    * readout adds one map-side argmax projection, a k-ary aggregate,
    * and k²-sized broadcast frames — nothing else moves. Returns ONE
    * row `(n_cells, db_index)`. */
  def daviesBouldin(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      iters: Int): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val (base, cents) = lloydFit(corpus, idCol, vecCol, k, iters)
    val scat = Lineage.cutLocal(base
      .select(Similarity.cosineArgmaxCellWithSim(col("v"), cents).as("b"))
      .select(col("b.cell_id").as("cell_id"), col("b.sim").as("sim"))
      .groupBy("cell_id")
      .agg(round(sum((lit(1.0) - col("sim")).cast("decimal(18,4)"))
        .cast("double") / count(lit(1)), 6).as("__s")))
    // centroid-pair distances on the driver codebook — the same
    // sequential dot/norm/round order as the oracle's list_sum replay
    def norm(v: Array[Float]): Double = {
      var s = 0.0; var i = 0
      while (i < v.length) { s += v(i).toDouble * v(i).toDouble; i += 1 }
      math.sqrt(s)
    }
    def dot(a: Array[Float], b: Array[Float]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i).toDouble * b(i).toDouble; i += 1 }
      s
    }
    val ms = for {
      (ci, vi) <- cents; (cj, vj) <- cents if ci < cj
    } yield (ci, cj, 1.0 - BigDecimal(dot(vi, vj) / (norm(vi) * norm(vj)))
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
    val m = broadcast(ms.toDF("__ci", "__cj", "__m"))
    scat.as("x").join(scat.as("y"),
        col("x.cell_id") =!= col("y.cell_id"))
      .join(m,
        least(col("x.cell_id"), col("y.cell_id")) === col("__ci") &&
          greatest(col("x.cell_id"), col("y.cell_id")) === col("__cj"))
      .filter(col("__m") > 0.0)
      .groupBy(col("x.cell_id").as("__cell"))
      .agg(max((col("x.__s") + col("y.__s")) / col("__m")).as("__d"))
      .agg(count(lit(1)).as("n_cells"),
        sum(round(col("__d"), 8).cast("decimal(28,8)")).as("__ds"))
      .select(col("n_cells"),
        when(col("n_cells") > 0L,
          Readout.pin(col("__ds").cast("double") /
            col("n_cells").cast("double"), 6)).as("db_index"))
  }

  /** DuckDB replay of [[daviesBouldin]] — same unrolled trajectory,
    * the scatter/separation tail. */
  def dbOracleSql(k: Int, iters: Int): String =
    trajectorySql(k, iters) + s""",
      |scat AS (
      |  SELECT cell_id, count(*)::bigint AS n,
      |    round(sum((1.0 - sim)::decimal(18,4))::double / count(*), 6)
      |      AS s
      |  FROM af GROUP BY 1
      |), cm AS (
      |  SELECT a.cell_id AS ci, b.cell_id AS cj,
      |    1.0 - round(list_sum(list_transform(list_zip(a.cv, b.cv),
      |          p -> p[1] * p[2])) / (a.cn * b.cn), 4) AS m
      |  FROM c$iters a JOIN c$iters b ON a.cell_id < b.cell_id
      |), r AS (
      |  SELECT x.cell_id, max((x.s + y.s) / cm.m) AS d
      |  FROM scat x JOIN scat y ON x.cell_id != y.cell_id
      |  JOIN cm ON cm.ci = least(x.cell_id, y.cell_id)
      |         AND cm.cj = greatest(x.cell_id, y.cell_id)
      |  WHERE cm.m > 0.0
      |  GROUP BY 1
      |)
      |SELECT count(*)::bigint AS n_cells,
      |  CASE WHEN count(*) > 0 THEN
      |    round(sum(round(d, 8)::decimal(28,8))::double /
      |      count(*)::double, 6) + 0.0
      |  END AS db_index
      |FROM r""".stripMargin

  /** DuckDB replay of [[kmeansCellStats]] — `iters` unrolled Lloyd
    * rounds over the embeddings table. Generated next to the engine
    * code so the two stay one edit apart. */
  def oracleSql(k: Int, iters: Int): String =
    trajectorySql(k, iters) + s""",
      |cnt AS (
      |  SELECT cell_id, count(*)::bigint AS n_vecs FROM af GROUP BY 1
      |)
      |SELECT c.cell_id,
      |       coalesce(cnt.n_vecs, 0)::bigint AS n_vecs,
      |       coalesce(round(cnt.n_vecs / (SELECT sum(n_vecs) FROM cnt), 4),
      |                0.0) AS share,
      |       round(c.cn, 4) AS centroid_norm
      |FROM c$iters c LEFT JOIN cnt USING (cell_id)
      |ORDER BY cell_id""".stripMargin

  /** DuckDB replay of [[cellQuality]] — same unrolled trajectory, the
    * per-cell cohesion tail. */
  def qualityOracleSql(k: Int, iters: Int): String =
    trajectorySql(k, iters) + s"""
      |SELECT cell_id, count(*)::bigint AS n_vecs,
      |       round(sum(sim::decimal(18,4))::double / count(*), 6)
      |         AS avg_sim,
      |       min(sim) AS min_sim
      |FROM af GROUP BY 1
      |ORDER BY cell_id""".stripMargin

  /** Shared CTE chain: seeds → `iters` Lloyd rounds → final assignment
    * `af(vec_id, cell_id, sim)` under the refined centroids `c$iters`. */
  private def trajectorySql(k: Int, iters: Int): String = {
    val sb = new StringBuilder
    sb.append(
      s"""WITH e AS (
         |  SELECT vec_id, list_transform(embedding, x -> x::double) AS v
         |  FROM embeddings
         |), n AS (
         |  SELECT vec_id, v,
         |         sqrt(list_sum(list_transform(v, x -> x * x))) AS nrm
         |  FROM e
         |), seeds AS (
         |  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cell_id, v, nrm
         |  FROM (SELECT vec_id, v, nrm FROM n ORDER BY vec_id LIMIT $k)
         |), c0 AS (SELECT cell_id, v AS cv, nrm AS cn FROM seeds)""".stripMargin)
    for (i <- 1 to iters) {
      val prev = s"c${i - 1}"
      sb.append(s""",
        |s$i AS (
        |  SELECT n.vec_id, c.cell_id,
        |         round(list_sum(list_transform(list_zip(n.v, c.cv),
        |                 p -> p[1] * p[2])) / (n.nrm * c.cn), 4) AS sim
        |  FROM n CROSS JOIN $prev c
        |), a$i AS (
        |  SELECT vec_id, cell_id FROM (
        |    SELECT vec_id, cell_id, row_number() OVER (
        |      PARTITION BY vec_id ORDER BY sim DESC, cell_id) AS rk
        |    FROM s$i) WHERE rk = 1
        |), u$i AS (
        |  SELECT a.cell_id, x.dim,
        |         round(avg(x.val), 6)::float::double AS m
        |  FROM a$i a JOIN (
        |    SELECT vec_id, unnest(v) AS val,
        |           generate_subscripts(v, 1) AS dim
        |    FROM e) x USING (vec_id)
        |  GROUP BY 1, 2
        |), c$i AS (
        |  SELECT cell_id, cv, sqrt(list_sum(list_transform(cv,
        |           x -> x * x))) AS cn
        |  FROM (SELECT cell_id, list(m ORDER BY dim) AS cv
        |        FROM u$i GROUP BY 1)
        |  UNION ALL
        |  SELECT cell_id, cv, cn FROM $prev
        |  WHERE cell_id NOT IN (SELECT cell_id FROM u$i)
        |)""".stripMargin)
    }
    val last = s"c$iters"
    sb.append(s""",
      |sf AS (
      |  SELECT n.vec_id, c.cell_id,
      |         round(list_sum(list_transform(list_zip(n.v, c.cv),
      |                 p -> p[1] * p[2])) / (n.nrm * c.cn), 4) AS sim
      |  FROM n CROSS JOIN $last c
      |), af AS (
      |  SELECT vec_id, cell_id, sim FROM (
      |    SELECT vec_id, cell_id, sim, row_number() OVER (
      |      PARTITION BY vec_id ORDER BY sim DESC, cell_id) AS rk
      |    FROM sf) WHERE rk = 1
      |)""".stripMargin)
    sb.toString
  }

  private def round6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** Top principal direction by deterministic power iteration, scoring
    * every vector by its projection — the embedding-drift / dominant-
    * axis diagnostic (and the 1-component core of PCA whitening).
    * Gram-matrix-free: each round is one corpus pass computing
    * `u = Σ_i (x_i · w) x_i`, then a driver-side normalize of the
    * dim-length vector. Determinism pinning (the aq33 recipe): dots
    * round to 6dp; the rank-one update terms round to 6dp and sum as
    * DECIMAL (order-independent); the normalized direction rounds to
    * 6dp then FLOAT, so every round's direction is bit-replayable in an
    * external SQL engine ([[pcaOracleSql]] unrolls the same rounds).
    *
    * Scale shape: `iters + 1` corpus passes, each a codegen
    * [[graft.functions.VectorExpressions.FloatDot]] projection plus one
    * aggregate bounded by `dim` groups; driver state is `dim` doubles.
    * Nothing is quadratic and no pass shuffles more than dim rows.
    * Returns the `topK` vectors by |projection| (TakeOrdered — no
    * global sort): (vec_id, score).
    */
  def powerIterationScores(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      iters: Int,
      topK: Int): DataFrame = {
    require(iters >= 1 && topK >= 1, "iters and topK must be positive")
    import graft.functions.VectorExpressions.float_dot
    val dim = corpus.select(size(col(vecCol))).head().getInt(0)
    val base = Lineage.cutLocal(
      corpus.select(col(idCol).as("vec_id"), col(vecCol).as("v")))

    var w: Array[Float] =
      Array.fill(dim)(round6(1.0 / math.sqrt(dim.toDouble)).toFloat)
    for (_ <- 1 to iters) {
      val u = new Array[Double](dim)
      base
        .select(round(float_dot(col("v"), typedLit(w)), 6).as("p"),
          posexplode(col("v")))
        .groupBy("pos")
        .agg(sum(round(col("p") * col("col").cast("double"), 6)
          .cast("decimal(28,6)")).as("u"))
        .collect()
        .foreach(r => u(r.getInt(0)) = r.getDecimal(1).doubleValue())
      // ascending-index fold, like the SQL twin's ORDER BY dim list_sum
      var s = 0.0
      var j = 0
      while (j < dim) { s += u(j) * u(j); j += 1 }
      val nrm = math.sqrt(s)
      w = u.map(x => round6(x / nrm).toFloat)
    }
    base
      .select(col("vec_id"), round(float_dot(col("v"), typedLit(w)), 6)
        .as("score"))
      .orderBy(abs(col("score")).desc, col("vec_id"))
      .limit(topK)
  }

  /** DuckDB replay of [[powerIterationScores]] — `iters` unrolled
    * power-iteration rounds. Generated next to the engine code so the
    * two stay one edit apart. */
  def pcaOracleSql(dim: Int, iters: Int, topK: Int): String = {
    val c0 = BigDecimal(round6(1.0 / math.sqrt(dim.toDouble)))
      .setScale(6).toString
    val sb = new StringBuilder
    sb.append(
      s"""WITH e AS (
         |  SELECT vec_id, list_transform(embedding, x -> x::double) AS v
         |  FROM embeddings
         |), x AS (
         |  SELECT vec_id, unnest(v) AS val, generate_subscripts(v, 1) AS dim
         |  FROM e
         |), w0 AS (
         |  SELECT list_transform(range(1, ${dim + 1}),
         |           i -> $c0::float::double) AS w)""".stripMargin)
    for (i <- 1 to iters) {
      val prev = s"w${i - 1}"
      sb.append(s""",
        |p$i AS (
        |  SELECT e.vec_id,
        |         round(list_sum(list_transform(list_zip(e.v, $prev.w),
        |                 p -> p[1] * p[2])), 6) AS p
        |  FROM e CROSS JOIN $prev
        |), u$i AS (
        |  SELECT x.dim, sum(round(p$i.p * x.val, 6)::decimal(28,6)) AS u
        |  FROM p$i JOIN x USING (vec_id)
        |  GROUP BY 1
        |), n$i AS (
        |  SELECT sqrt(list_sum(list_transform(
        |           list(u::double ORDER BY dim), y -> y * y))) AS nrm
        |  FROM u$i
        |), w$i AS (
        |  SELECT list(round(u$i.u::double / n$i.nrm, 6)::float::double
        |           ORDER BY u$i.dim) AS w
        |  FROM u$i, n$i)""".stripMargin)
    }
    sb.append(s"""
      |SELECT e.vec_id,
      |       round(list_sum(list_transform(list_zip(e.v, w$iters.w),
      |               p -> p[1] * p[2])), 6) AS score
      |FROM e CROSS JOIN w$iters
      |ORDER BY abs(score) DESC, vec_id
      |LIMIT $topK""".stripMargin)
    sb.toString
  }

  /** In-engine binary classifier training by batch gradient descent —
    * the "learn a quality/language gate from the corpus' own signals"
    * primitive, beside k-means (aq33) and PCA (sq10) in the
    * deterministic-trajectory family. The squashing function is the
    * SOFTSIGN sigmoid `σ(m) = 0.5·(1 + m/(1+|m|))` — pure rational
    * arithmetic, NO libm call anywhere (exp/log drift across engines;
    * softsign is IEEE add/mul/div/abs, bit-identical everywhere), so
    * the whole trajectory replays exactly.
    *
    * Per round: margins from the previous weights (a fixed-order
    * linear expression), per-row gradient terms `round((σ−y)·xⱼ, 6)`
    * DECIMAL-summed (order-independent), weights updated
    * `wⱼ ← round(wⱼ − lr·(gⱼ/n), 12)` — the pageRank 12dp-pin
    * discipline. Output one row per round:
    * `(round, n_correct, w_0..w_k)` where `n_correct` counts
    * `margin ≥ 0 ⇔ y = 1` under the PRE-update weights (an integer —
    * exact) and the weights are AFTER the round's update.
    *
    * Scale shape: the feature frame is built once and lineage-cut;
    * each round is ONE map-side-combined aggregate (k+1 decimal sums
    * + a count); driver state is k+1 doubles (the aq33 centroid
    * discipline). Rounds and k are small constants by contract. */
  def softsignRegression(
      features: DataFrame,
      featureCols: Seq[String],
      labelCol: String,
      iterations: Int,
      learningRate: Double): DataFrame = {
    require(iterations >= 1 && iterations <= 16, "iterations in [1, 16]")
    require(featureCols.nonEmpty && featureCols.size <= 16,
      "1..16 features")
    val spark = features.sparkSession
    val cols = "__bias" +: featureCols
    val base = Lineage.cutLocal(features
      .select((lit(1.0).as("__bias") +: featureCols.map(col) :+
        col(labelCol).cast("double").as("__y")): _*))
    def r12(x: Double): Double = java.math.BigDecimal.valueOf(x)
      .setScale(12, java.math.RoundingMode.HALF_UP).doubleValue()
    var w = Vector.fill(cols.size)(0.0)
    val rows = Vector.newBuilder[org.apache.spark.sql.Row]
    for (t <- 1 to iterations) {
      // margin under the PRE-update weights, fixed evaluation order;
      // Double.toString round-trips, D-suffixed literals stay double
      val m = cols.zipWithIndex
        .map { case (c, i) => s"(${w(i)}d * $c)" }.mkString(" + ")
      val sig = s"(0.5d * (1.0d + ($m) / (1.0d + abs($m))))"
      val aggs =
        cols.map(c => expr(
          s"sum(cast(round(($sig - __y) * $c, 6) as decimal(18,6)))")
          .as(s"__g_$c")) :+
          sum(when(expr(s"(($m) >= 0.0d) = (__y = 1.0d)"), 1L)
            .otherwise(0L)).as("__correct") :+
          count(lit(1)).as("__n")
      val row = base.agg(aggs.head, aggs.tail: _*).head()
      val n = row.getAs[Long]("__n")
      require(n > 0, "softsignRegression: empty feature frame")
      val g = cols.map(c =>
        Option(row.getAs[java.math.BigDecimal](s"__g_$c"))
          .map(_.doubleValue()).getOrElse(0.0))
      w = Vector.tabulate(cols.size)(i =>
        r12(w(i) - learningRate * (g(i) / n)))
      rows += org.apache.spark.sql.Row.fromSeq(
        t +: row.getAs[Long]("__correct") +: w)
    }
    import org.apache.spark.sql.types._
    val schema = StructType(
      StructField("round", IntegerType) ::
        StructField("n_correct", LongType) ::
        cols.toList.map(c => StructField(
          if (c == "__bias") "w_bias" else s"w_$c", DoubleType)))
    spark.createDataFrame(
      scala.jdk.CollectionConverters.SeqHasAsJava(rows.result()).asJava,
      schema).orderBy("round")
  }

  /** Train with [[softsignRegression]], then score EVERY row with the
    * final round's weights and report per-group confusion counts
    * `(grp, n, n_pred_pos, n_correct)` — the "did the learned gate
    * generalize per language/source" readout. The margin under the
    * final weights is the same fixed-order expression the last
    * training round used, so scoring replays exactly. */
  def softsignScore(
      features: DataFrame,
      featureCols: Seq[String],
      labelCol: String,
      groupCol: String,
      iterations: Int,
      learningRate: Double): DataFrame = {
    val fin = softsignRegression(features, featureCols, labelCol,
      iterations, learningRate)
      .filter(col("round") === iterations).head()
    val terms = s"(${fin.getAs[Double]("w_bias")}d * 1.0d)" +:
      featureCols.map(c => s"(${fin.getAs[Double](s"w_$c")}d * $c)")
    val m = terms.mkString(" + ")
    features
      .groupBy(col(groupCol).as("grp"))
      .agg(count(lit(1)).as("n"),
        sum(when(expr(s"($m) >= 0.0d"), 1L).otherwise(0L))
          .as("n_pred_pos"),
        sum(when(expr(s"(($m) >= 0.0d) = " +
          s"(cast($labelCol as double) = 1.0d)"), 1L).otherwise(0L))
          .as("n_correct"))
      .orderBy("grp")
  }

  private def softsignOutName(n: String) =
    if (n == "b") "w_bias" else s"w_$n"

  /** The shared training CTE chain: `f` (features + label), `nn`, and
    * per round `g$t` / `w$t`. `extraFCols` lets a scoring oracle carry
    * grouping columns through `f`. */
  private def softsignTrainCtes(
      table: String,
      featureExprs: Seq[(String, String)],
      labelExpr: String,
      iterations: Int,
      learningRate: Double,
      extraFCols: String = ""): String = {
    val names = "b" +: featureExprs.map(_._1)
    val fCols = "1.0::double AS b, " +
      featureExprs.map { case (n, e) => s"($e)::double AS $n" }
        .mkString(", ") + s", ($labelExpr)::double AS y" + extraFCols
    def wRef(t: Int, n: String) =
      if (t == 0) "0.0::double"
      else s"(SELECT ${softsignOutName(n)} FROM w$t)"
    def margin(t: Int) =
      names.map(n => s"(${wRef(t, n)} * $n)").mkString(" + ")
    val rounds = (1 to iterations).map { t =>
      val m = margin(t - 1)
      val sig = s"(0.5 * (1.0 + ($m) / (1.0 + abs($m))))"
      val gs = names.map(n =>
        s"sum(round(($sig - y) * $n, 6)::decimal(18,6)) AS g_$n")
        .mkString(",\n         ")
      val ws = names.map(n =>
        s"round(${wRef(t - 1, n)} - $learningRate * " +
          s"((SELECT g_$n FROM g$t)::double / (SELECT n FROM nn)), 12)" +
          s" AS ${softsignOutName(n)}").mkString(",\n         ")
      s""", g$t AS MATERIALIZED (
         |  SELECT $gs,
         |         sum(CASE WHEN (($m) >= 0.0) = (y = 1.0)
         |                  THEN 1 ELSE 0 END)::bigint AS correct
         |  FROM f
         |), w$t AS MATERIALIZED (
         |  SELECT $ws
         |)""".stripMargin
    }.mkString("\n")
    s"""WITH f AS MATERIALIZED (SELECT $fCols FROM $table),
       |nn AS (SELECT count(*)::bigint AS n FROM f)
       |$rounds""".stripMargin
  }

  /** GENERATED DuckDB oracle for [[softsignRegression]]: the gradient
    * rounds unrolled — per round one gradient CTE (the same
    * 6dp-rounded decimal sums) and one weight CTE (the same 12dp
    * update from scalar subqueries) — the aq33/aq44
    * unrolled-trajectory discipline. `featureExprs` are
    * `(name, duckdb expression)`; all mixed decimal literals promote
    * to double exactly, matching the Spark side's D-suffixed ones. */
  def softsignRegressionOracleSql(
      table: String,
      featureExprs: Seq[(String, String)],
      labelExpr: String,
      iterations: Int,
      learningRate: Double): String = {
    val names = "b" +: featureExprs.map(_._1)
    val sel = (1 to iterations).map { t =>
      s"SELECT $t AS round, (SELECT correct FROM g$t) AS n_correct, " +
        names.map(n =>
          s"(SELECT ${softsignOutName(n)} FROM w$t) AS " +
            softsignOutName(n)).mkString(", ")
    }.mkString("\nUNION ALL\n")
    softsignTrainCtes(table, featureExprs, labelExpr, iterations,
      learningRate) + s"\n$sel\nORDER BY round"
  }

  /** GENERATED DuckDB oracle for the sq19 gate: train (the same
    * unrolled rounds), then score every row with the FINAL weights and
    * report the per-`groupExpr` confusion counts. */
  def softsignScoreOracleSql(
      table: String,
      featureExprs: Seq[(String, String)],
      labelExpr: String,
      groupExpr: String,
      iterations: Int,
      learningRate: Double): String = {
    val names = "b" +: featureExprs.map(_._1)
    val m = names.map(n =>
      s"((SELECT ${softsignOutName(n)} FROM w$iterations) * $n)")
      .mkString(" + ")
    softsignTrainCtes(table, featureExprs, labelExpr, iterations,
      learningRate, extraFCols = s", ($groupExpr) AS grp") +
      s"""|
          |SELECT grp, count(*)::bigint AS n,
          |       sum(CASE WHEN ($m) >= 0.0 THEN 1 ELSE 0 END)::bigint
          |         AS n_pred_pos,
          |       sum(CASE WHEN (($m) >= 0.0) = (y = 1.0)
          |                THEN 1 ELSE 0 END)::bigint AS n_correct
          |FROM f
          |GROUP BY grp
          |ORDER BY grp""".stripMargin
  }
}
