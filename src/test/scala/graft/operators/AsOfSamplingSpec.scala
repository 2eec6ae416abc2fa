package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestSession

class AsOfSamplingSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("asOfJoin picks the latest right row at-or-before each left row") {
    val left = Seq((1L, 10L, "p1"), (1L, 20L, "p2"), (2L, 5L, "p3"))
      .toDF("k", "t", "ev")
    val right = Seq((1L, 10L, 100.0), (1L, 15L, 150.0), (2L, 9L, 90.0))
      .toDF("k", "t", "rv")
    val out = AsOf.asOfJoin(left, right, "k", "t", Seq("rv"))
      .orderBy("k", "t").collect()
      .map(r => (r.getAs[String]("ev"), Option(r.getAs[Any]("asof_rv"))))
    // p1 at t=10 sees the simultaneous right row (<= semantics);
    // p2 at t=20 sees t=15; p3 at t=5 has no prior right row
    assert(out.toSeq == Seq(
      ("p1", Some(100.0)), ("p2", Some(150.0)), ("p3", None)))
  }

  test("rangeJoin assigns each value to its [lo, hi) band") {
    val facts = Seq(0.0, 49.9, 50.0, 299.9).toDF("v")
    val bands = Seq(("a", 0.0, 50.0), ("b", 50.0, 300.0))
      .toDF("band", "lo", "hi")
    val got = AsOf.rangeJoin(facts, bands, "v", "lo", "hi")
      .orderBy("v").collect().map(_.getAs[String]("band")).toSeq
    assert(got == Seq("a", "a", "b", "b"))
  }

  test("hash split is deterministic, disjoint, exhaustive, and ~proportional") {
    val docs = graft.Tables.load(spark, "/root/testdata/sf0.01", "documents")
    val s1 = Sampling.split(docs, "doc_id", "graft", 900, 50)
    val s2 = Sampling.split(docs.repartition(13), "doc_id", "graft", 900, 50)
    val m1 = s1.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val m2 = s2.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(m1 == m2) // partitioning-independent
    assert(m1.values.sum == docs.count())
    val trainFrac = m1("train").toDouble / docs.count()
    assert(trainFrac > 0.85 && trainFrac < 0.95, s"train frac $trainFrac")
    // per-row assignment stability
    val a1 = s1.select("doc_id", "split").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val a2 = s2.select("doc_id", "split").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(a1 == a2)
  }

  test("deterministicSample keeps a stable ~perMille subset") {
    val docs = graft.Tables.load(spark, "/root/testdata/sf0.01", "documents")
    val s = Sampling.deterministicSample(docs, "doc_id", "salt1", 100)
    val n = s.count()
    assert(n > 20 && n < 100, s"expected ~50 of 500, got $n")
    assert(s.count() == Sampling.deterministicSample(
      docs.repartition(7), "doc_id", "salt1", 100).count())
    // different salt → different subset
    val other = Sampling.deterministicSample(docs, "doc_id", "salt2", 100)
    assert(other.select("doc_id").collect().toSet !=
      s.select("doc_id").collect().toSet)
  }

  test("weightedSample keeps ~weight fraction, reproducibly") {
    val df = spark.range(4000).toDF("id")
    val keepHalf = Sampling.weightedSample(df, "id", "w", lit(0.5))
    val n = keepHalf.count()
    assert(n > 1700 && n < 2300, s"~2000 expected, got $n")
    assert(keepHalf.collect().toSet ==
      Sampling.weightedSample(df.repartition(9), "id", "w", lit(0.5))
        .collect().toSet)
    assert(Sampling.weightedSample(df, "id", "w", lit(0.0)).count() == 0)
    assert(Sampling.weightedSample(df, "id", "w", lit(1.0)).count() == 4000)
  }

  test("capPerGroup keeps at most cap rows per group, hash-chosen") {
    val docs = graft.Tables.load(spark, "/root/testdata/sf0.01", "documents")
      .select("doc_id", "source")
    val capped = Sampling.capPerGroup(docs, "source", "doc_id", "cap", 10)
    val sizes = capped.groupBy("source").count().collect()
      .map(_.getLong(1))
    assert(sizes.forall(_ <= 10) && sizes.max == 10)
    // deterministic across partitioning
    val again = Sampling.capPerGroup(
      docs.repartition(7), "source", "doc_id", "cap", 10)
    assert(capped.select("doc_id").collect().map(_.getLong(0)).toSet ==
      again.select("doc_id").collect().map(_.getLong(0)).toSet)
    // a cap above the group size keeps everything
    assert(Sampling.capPerGroup(docs, "source", "doc_id", "cap", 1000)
      .count() == docs.count())
  }

  test("mixtureResample rebalances toward the target domain mixture") {
    // skewed corpus: 900 of "web", 60 of "books", 40 of "code"
    val docs = ((1 to 900).map(i => (i.toLong, "web")) ++
      (1001 to 1060).map(i => (i.toLong, "books")) ++
      (2001 to 2040).map(i => (i.toLong, "code"))).toDF("doc_id", "source")
    val out = Sampling.mixtureResample(docs, "source", "doc_id", "mix19")
    val kept = out.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // uniform target = 1000/3 ≈ 333 per domain: web downsamples to
    // ~333 (hash-Bernoulli, allow sampling noise), small domains keep
    // EVERY row (rate clamps at 1 — no upsampling)
    assert(kept("books") == 60L && kept("code") == 40L)
    assert(kept("web") > 260 && kept("web") < 400, s"web kept ${kept("web")}")
    // reproducible: same salt, same kept set, any partitioning
    val again = Sampling.mixtureResample(
      docs.repartition(7), "source", "doc_id", "mix19")
    assert(out.select("doc_id").collect().map(_.getLong(0)).toSet ==
      again.select("doc_id").collect().map(_.getLong(0)).toSet)
    // explicit shares steer the mixture; shares for absent groups are
    // ignored rather than erroring
    val tilted = Sampling.mixtureResample(docs, "source", "doc_id", "mix19",
      targetShares = Map("web" -> 0.05, "books" -> 0.95, "ghost" -> 1.0))
    val tk = tilted.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(tk("books") == 60L) // 0.95*1000 > 60 → clamp keeps all
    assert(tk("web") < 100, s"web kept ${tk("web")} at 5% share")
    assert(!tk.contains("code")) // no share → rate 0
    // a NULL group key (unlabeled domain) is its own group, not an NPE
    val withNull = docs.withColumn("source",
      when(col("doc_id") <= 20, lit(null).cast("string"))
        .otherwise(col("source")))
    val nullKept = Sampling.mixtureResample(withNull, "source", "doc_id", "mix19")
    assert(nullKept.filter(col("source").isNull).count() == 20) // 250-share clamps
  }

  test("temperatureResample flattens the head domain, keeps the tail whole") {
    // 900 "web" vs 60 "books" vs 40 "code" — p^0.5 targets pull the
    // head down while the tail's clamped rate keeps every row
    val docs = ((1 to 900).map(i => (i.toLong, "web")) ++
      (1001 to 1060).map(i => (i.toLong, "books")) ++
      (2001 to 2040).map(i => (i.toLong, "code"))).toDF("doc_id", "source")
    val kept = Sampling.temperatureResample(docs, "source", "doc_id", "t1")
      .groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(kept("books") == 60L && kept("code") == 40L)
    // sqrt targets: w = sqrt(0.9)/W ≈ 0.613 → web rate ≈ 0.68
    assert(kept("web") > 520 && kept("web") < 700, s"web kept ${kept("web")}")
    // alpha = 1 reproduces the observed mixture: every rate is 1
    assert(Sampling.temperatureResample(docs, "source", "doc_id", "t1",
      alpha = 1.0).count() == 1000L)
    // flatter alpha downsamples the head harder
    val flat = Sampling.temperatureResample(docs, "source", "doc_id", "t1",
      alpha = 0.25).groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(flat("web") < kept("web"))
  }

  test("topQuantilePerGroup cuts each group at the score quantile, ties by id") {
    val docs = Seq(
      (1L, "a", 0.9), (2L, "a", 0.8), (3L, "a", 0.7), (4L, "a", 0.7),
      (5L, "a", 0.5), (6L, "a", 0.4), (7L, "a", 0.3), (8L, "a", 0.2),
      (9L, "a", 0.1), (10L, "a", 0.05),
      (11L, "b", 0.6), (12L, "b", 0.4))
      .toDF("doc_id", "source", "q")
    val out = Sampling.topQuantilePerGroup(docs, "source", col("q"), "doc_id", 0.30)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    // group a (n=10): percent_rank = (rank-1)/9 <= 0.3 -> ranks 1..3
    // (docs 1,2,3 — doc 3 beats the tied doc 4 on id); group b (n=2):
    // ranks at pr 0 and 1 -> only doc 11
    assert(out == Set(1L, 2L, 3L, 11L))
    // frac = 1 keeps everything
    assert(Sampling.topQuantilePerGroup(docs, "source", col("q"), "doc_id", 1.0)
      .count() == 12)
  }

  test("groupedSplit keeps every group in one split") {
    val docs = graft.Tables.load(spark, "/root/testdata/sf0.01", "documents")
      .select("doc_id", "source")
    val out = Sampling.groupedSplit(docs, "source", "gs", 900, 50)
    val perGroup = out.groupBy("source")
      .agg(countDistinct(col("split")).as("n")).collect().map(_.getLong(1))
    assert(perGroup.forall(_ == 1L)) // no group straddles splits
    assert(out.count() == docs.count())
    // same salt → same assignment under any partitioning
    val again = Sampling.groupedSplit(docs.repartition(7), "source", "gs", 900, 50)
    assert(out.select("doc_id", "split").collect().toSet ==
      again.select("doc_id", "split").collect().toSet)
  }

  test("tokenBudgetSelect keeps the maximal hash-ordered prefix per group") {
    val docs = Seq(
      (1L, "a", 500L), (2L, "a", 700L), (3L, "a", 400L), (4L, "a", 900L),
      (5L, "b", 3000L), (6L, "b", 100L))
      .toDF("doc_id", "source", "n_tokens")
    val out = Sampling.tokenBudgetSelect(
      docs, "source", "doc_id", "n_tokens", "tbs", budget = 1500L)
    val kept = out.collect()
      .map(r => r.getString(1) -> (r.getLong(0), r.getLong(2)))
      .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    // every group stays within budget
    assert(kept.values.forall(_.map(_._2).sum <= 1500L))
    // maximality: the next doc in hash order would overshoot — verify
    // against the same ordering the operator uses
    val orderA = Sampling.hashBucket(col("doc_id"), "tbs", 1 << 30)
    val hashOrder = docs.filter(col("source") === "a")
      .orderBy(orderA, col("doc_id"))
      .collect().map(r => (r.getLong(0), r.getLong(2)))
    val keptA = kept.getOrElse("a", Array.empty).map(_._1).toSet
    var cum = 0L
    hashOrder.foreach { case (id, n) =>
      cum += n
      assert(keptA.contains(id) == (cum <= 1500L), s"doc $id at cum $cum")
    }
    // group b: the 3000-token doc blocks everything after it in hash
    // order (monotone cumsum — greedy prefix, not knapsack)
    assert(kept.getOrElse("b", Array.empty).map(_._2).sum <= 1500L)
  }

  test("diversitySample caps every semantic cell and stays deterministic") {
    val emb = graft.Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val out = Similarity.diversitySample(
      emb, "vec_id", "embedding", numCells = 16, cap = 5, salt = "divs")
    val perCell = out.groupBy("cell_id").count().collect().map(_.getLong(1))
    assert(perCell.forall(_ <= 5) && perCell.max == 5)
    assert(out.count() < emb.count()) // something was actually capped
    // kept rows are a subset of the corpus with their true cell labels
    val cells = Similarity.ivfIndex(emb, "vec_id", "embedding", 16)
      .select("vec_id", "cell_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    out.select("vec_id", "cell_id").collect().foreach { r =>
      assert(cells(r.getLong(0)) == r.getLong(1))
    }
    val again = Similarity.diversitySample(
      emb.repartition(5), "vec_id", "embedding", 16, 5, "divs")
    assert(out.select("vec_id").collect().map(_.getLong(0)).toSet ==
      again.select("vec_id").collect().map(_.getLong(0)).toSet)
  }

  test("mixtureReport: exact shares and entropy on a known mixture") {
    // a: 6 tokens, b: 2 tokens -> shares 0.75/0.25,
    // entropy = -(0.75 ln 0.75 + 0.25 ln 0.25)
    val docs = Seq(
      ("a", "t t t"), ("a", "t t t"), ("b", "t t")
    ).toDF("source", "text")
    val r = Sampling.mixtureReport(docs, "source", "text")
      .orderBy("source").collect()
    assert(r(0).getString(0) == "a" && r(0).getLong(1) == 2L &&
      r(0).getLong(2) == 6L && r(0).getDouble(3) == 0.75)
    assert(r(1).getString(0) == "b" && r(1).getLong(1) == 1L &&
      r(1).getLong(2) == 2L && r(1).getDouble(3) == 0.25)
    val expected = -(0.75 * math.log(0.75) + 0.25 * math.log(0.25))
    assert(math.abs(r(0).getDouble(4) - expected) < 1e-6)
    assert(r(0).getDouble(4) == r(1).getDouble(4)) // corpus-level constant
  }

  test("importanceWeights ranks target-like raw docs first") {
    // target talks about "spark query engine"; raw doc 10 mirrors that
    // vocabulary, 11 shares half, 12 is disjoint.
    val docs = Seq(
      (1L, "t", "spark query engine spark query engine"),
      (2L, "t", "spark query engine runs fast"),
      (10L, "r", "spark query engine tuning spark query"),
      (11L, "r", "spark bicycle repair manual pages"),
      (12L, "r", "bicycle repair manual chapter seven")
    ).toDF("doc_id", "grp", "text")
    val out = Sampling.importanceWeights(docs, "doc_id", "text",
        isTarget = col("grp") === "t", buckets = 1024, salt = "s",
        topK = 10)
      .orderBy("rank").collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(10L, 11L, 12L))
    val w = out.map(_.getAs[Double]("weight"))
    assert(w(0) > w(1) && w(1) > w(2))
    assert(out.map(_.getAs[Int]("rank")).toSeq == Seq(1, 2, 3))
    // n_grams = unigrams + bigrams with multiplicity
    assert(out(0).getAs[Long]("n_grams") == 6L + 5L)
  }

  test("importanceWeights topK truncates by weight then id") {
    val docs = Seq(
      (1L, true, "alpha beta"),
      (10L, false, "alpha beta"),
      (11L, false, "alpha beta"),
      (12L, false, "gamma delta")
    ).toDF("doc_id", "t", "text")
    val out = Sampling.importanceWeights(docs, "doc_id", "text",
        isTarget = col("t"), buckets = 256, salt = "s", topK = 2)
      .orderBy("rank").collect()
    // 10 and 11 tie on weight; id breaks the tie; 12 truncated
    assert(out.map(_.getLong(0)).toSeq == Seq(10L, 11L))
  }

  test("waterFillBudget: all-saturated, mixed boundary, all-level") {
    def run(b: Long) = Sampling.waterFillBudget(
      Seq(("a", 10L), ("b", 30L), ("c", 100L)).toDF("source", "nt"),
      "source", "nt", budget = b)
      .as[(String, Long, Double, Boolean)].collect().toSeq
    // budget covers every cap: everyone saturated, nothing cut
    assert(run(200L) == Seq(("a", 10L, 10.0, true), ("b", 30L, 30.0, true),
      ("c", 100L, 100.0, true)))
    // mixed: a and b saturate, c is cut to the level (90-40)/1 = 50
    assert(run(90L) == Seq(("a", 10L, 10.0, true), ("b", 30L, 30.0, true),
      ("c", 100L, 50.0, false)))
    // tiny budget: nobody saturates, common level 21/3 = 7
    assert(run(21L) == Seq(("a", 10L, 7.0, false), ("b", 30L, 7.0, false),
      ("c", 100L, 7.0, false)))
    // conservation: allocations sum to the budget when it binds
    assert(run(90L).map(_._3).sum == 90.0)
  }

  test("effectiveSampleSize: uniform weights lossless, skew shrinks ESS") {
    val df = Seq(
      ("u", 1.0), ("u", 1.0), ("u", 1.0), ("u", 1.0), // ESS = n
      ("s", 3.0), ("s", 1.0),                          // (4²)/10 = 1.6
      ("z", 0.0), ("z", -2.0))                         // excluded
      .toDF("g", "w")
    val got = Sampling.effectiveSampleSize(df, "g", "w")
      .as[(String, Long, Double, Double)].collect().toSeq
    assert(got == Seq(("s", 2L, 1.6, 1.25), ("u", 4L, 4.0, 1.0)),
      got.toString)
  }

  test("effectiveSampleSize: uniformly tiny weights still report " +
      "ESS = n, not NULL") {
    // weights of 1e-5 square to 1e-10 — an 8dp square sum would
    // underflow to zero and report NULL; the 12dp decimal(38,12)
    // scale keeps Σw² exact here
    val df = Seq(
      ("t", 1e-5), ("t", 1e-5), ("t", 1e-5), ("t", 1e-5))
      .toDF("g", "w")
    val got = Sampling.effectiveSampleSize(df, "g", "w")
      .as[(String, Long, Option[Double], Option[Double])].collect().toSeq
    assert(got == Seq(("t", 4L, Some(4.0), Some(1.0))), got.toString)
  }

  test("horvitzThompson: certainty sampling reproduces the exact total " +
      "with zero variance; partial weights match a driver replay") {
    // π = 1 keeps everything: HT total == actual total, se = 0
    val full = (1L to 5L).map(i => ("s", i, i.toDouble * 10))
      .toDF("g", "id", "y")
    val sure = Sampling.horvitzThompson(full, "g", "id", "ht-spec",
        lit(1.0), "y")
      .as[(String, Long, Long, Double, Option[Double], Option[Double])]
      .collect().head
    assert(sure == (("s", 5L, 5L, 150.0, Some(150.0), Some(0.0))),
      sure.toString)
    // π = 0.5: the kept set is the salted-hash draw — replay it
    // driver-side and check the estimate is exactly Σ y/π over it
    val part = Sampling.horvitzThompson(full, "g", "id", "ht-spec",
        lit(0.5), "y")
      .as[(String, Long, Long, Double, Option[Double], Option[Double])]
      .collect().head
    val keptIds = full
      .filter(Sampling.hashBucket(col("id"), "ht-spec", 1000000)
        .cast("double") / 1e6 < 0.5)
      .select("id").as[Long].collect().toSet
    val expTotal = keptIds.toSeq.map(i => i * 10.0 / 0.5).sum
    assert(part._3 == keptIds.size.toLong)
    assert(part._5 == Some(BigDecimal(expTotal).setScale(2,
      BigDecimal.RoundingMode.HALF_UP).toDouble), part.toString)
    // π > 1 is a certainty inclusion: capped at 1, so the estimate
    // reproduces the exact total with zero variance — never a
    // negative variance term leaking into ht_se
    val over = Sampling.horvitzThompson(full, "g", "id", "ht-spec",
        lit(2.0), "y")
      .as[(String, Long, Long, Double, Option[Double], Option[Double])]
      .collect().head
    assert(over == (("s", 5L, 5L, 150.0, Some(150.0), Some(0.0))),
      over.toString)
  }
}
