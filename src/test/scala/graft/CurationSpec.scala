package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

class CurationSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("the full fluent chain runs and monotonically filters") {
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val n0 = docs.count()
    val c1 = Curation(docs).dedupExact()
    val n1 = c1.df.count()
    val c2 = c1.dropNearDups(threshold = 0.8)
    val n2 = c2.df.count()
    val c3 = c2.filterQuality(0.3).filterRepetition(maxDupTokenFrac = 0.65)
    val n3 = c3.df.count()
    assert(n1 <= n0 && n2 <= n1 && n3 <= n2 && n3 > 0,
      s"counts $n0 -> $n1 -> $n2 -> $n3")

    val labeled = c3.scrubPii().split().df
    assert(labeled.columns.contains("split"))
    assert(labeled.count() == n3) // scrub and split drop nothing

    val packed = c3.pack(budget = 512L)
    assert(packed.count() == n3)
    assert(packed.columns.toSet ==
      Set("doc_id", "n_tokens", "start_offset", "bin_id", "spans_boundary"))

    val shuffled = c3.exportShuffled()
    assert(shuffled.count() == n3)
    // ranks are a permutation of 1..n
    val ranks = shuffled.select("shuffle_rank").collect().map(_.getLong(0))
    assert(ranks.sorted.toSeq == (1L to n3).toSeq)
  }

  test("facade steps agree with the gate operators they wrap") {
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val viaFacade = Curation(docs).dedupExact().df
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val direct = operators.Dedup.exact(docs, "doc_id", "text")
      .filter(col("is_canonical")).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(viaFacade == direct)
  }

  test("removeBoilerplate rewrites text in place and keeps other columns") {
    import spark.implicits._
    val docs = Seq(
      (1L, "keep me\nSHARED", "web"),
      (2L, "SHARED\nme too", "web")).toDF("doc_id", "text", "source")
    val out = Curation(docs).removeBoilerplate().df.orderBy("doc_id")
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("text"),
        r.getAs[String]("source")))
    assert(out.toSeq == Seq((1L, "keep me", "web"), (2L, "me too", "web")))
  }

  test("decontaminate / rebalance / quantile / novelty steps compose") {
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val n0 = docs.count()
    // benchmark = every 47th doc's text: those docs (and their verbatim
    // twins) must vanish; the corpus shrinks but stays non-empty
    val bench = docs.filter(col("doc_id") % 47 === 0)
      .select(col("doc_id").as("bench_id"), col("text"))
    val clean = Curation(docs).decontaminate(bench)
    val cleanIds = clean.df.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(!cleanIds.exists(_ % 47 == 0))
    assert(cleanIds.nonEmpty && cleanIds.size < n0)
    // re-running decontamination is a fixpoint
    assert(clean.decontaminate(bench).df.count() == cleanIds.size)

    val rebalanced = Curation(docs).rebalance("source")
    val kept = rebalanced.df.groupBy("source").count().collect()
      .map(_.getLong(1))
    assert(kept.forall(_ > 0) && rebalanced.df.count() <= n0)

    val top = Curation(docs).topQualityQuantile("source", 0.3)
    assert(top.df.count() < n0 && top.df.count() > 0)
    assert(top.df.columns.toSeq == docs.columns.toSeq) // helper col dropped

    val novel = Curation(docs).filterNovelty(0.05)
    assert(novel.df.count() > 0 && novel.df.count() <= n0)
    assert(novel.df.columns.toSeq == docs.columns.toSeq)

    val grouped = Curation(docs).splitByGroup("source").df
    assert(grouped.groupBy("source")
      .agg(countDistinct(col("split")).as("n"))
      .collect().forall(_.getLong(1) == 1L))

    val budgeted = Curation(docs).tokenBudgetPerGroup("source", 500L)
    assert(budgeted.df.count() > 0 && budgeted.df.count() < n0)
    assert(budgeted.df.columns.toSeq == docs.columns.toSeq) // helper dropped
  }

  test("removeBoilerplate preserves column ORDER, not just the column set") {
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val out = Curation(docs).removeBoilerplate().df
    assert(out.columns.toSeq == docs.columns.toSeq,
      s"${out.columns.toSeq} vs ${docs.columns.toSeq}")
  }

  test("round-5 terminals and model filter agree with their operators") {
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val n0 = docs.count()

    val kept = Curation(docs).filterModelQuality(0.5)
    val scored = graft.operators.TextAnalysis
      .modelQualityScore(docs, "doc_id", "text")
    assert(kept.df.count() == scored.filter(col("keep")).count())
    assert(kept.df.columns.toSeq == docs.columns.toSeq)

    assert(Curation(docs).profileBy("source").count() ==
      docs.select("source").distinct().count())
    assert(Curation(docs).mixtureReport("source").count() ==
      docs.select("source").distinct().count())
    assert(Curation(docs).vocabCoverage(10).count() <= 10)
    val drift = Curation(docs).driftVs(docs).head()
    assert(drift.getDouble(0) == 0.0) // KL(corpus || itself) is exactly 0
    assert(Curation(docs).similarityHistogram(0.7).count() >= 0)
    val buckets = Curation(docs).lengthBuckets()
    assert(buckets.agg(sum("n_docs")).head().getLong(0) <= n0)

    // local matches: identical docs in the corpus share all fingerprints
    assert(Curation(docs).localMatches(minShared = 1).count() > 0)
    // contamination of the corpus against its own slice is complete
    val bench = docs.filter(col("doc_id") % 47 === 0)
    val cont = Curation(docs).contaminationVs(bench).head()
    assert(cont.getDouble(2) == 1.0) // every bench shingle is in corpus
  }

  test("semantic dedup and DSIR selection facade steps agree with operators") {
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val emb = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")

    val kept = Curation(docs).dropSemanticDups(
      emb, numCells = 8, threshold = 0.3).df
    val survivors = graft.operators.Similarity.semanticDedup(
      emb, "vec_id", "embedding", numCells = 8, threshold = 0.3)
    // facade keeps exactly: docs minus embedded-and-not-surviving ids
    val droppedIds = emb.select(col("vec_id").as("doc_id"))
      .join(survivors.select(col("vec_id").as("doc_id")),
        Seq("doc_id"), "left_anti")
    val expected = docs.join(droppedIds, Seq("doc_id"), "left_anti")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept.select("doc_id").collect().map(_.getLong(0)).toSet
      == expected)
    assert(kept.columns.toSeq == docs.columns.toSeq)

    val target = docs.filter(col("source") === "src0")
      .select((col("doc_id") + 5000000).as("doc_id"), col("text"))
    val selected = Curation(docs.filter(col("source") =!= "src0"))
      .selectLikeTarget(target, topK = 50).df
    assert(selected.count() == 50)
    assert(selected.columns.toSeq == docs.columns.toSeq)
    // selected docs come from the pool, never the target
    assert(selected.filter(col("doc_id") >= 5000000).count() == 0)
  }
}
