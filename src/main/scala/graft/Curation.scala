package graft

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions
import graft.operators.{Dedup, Packing, Sampling, Similarity, TextAnalysis}

/** Fluent corpus-curation facade: the LLM-data operators as one lazy,
  * chainable API over any (id, text) DataFrame. Each step returns a new
  * `Curation` wrapping a transformed plan — nothing executes until an
  * action, so Catalyst fuses the whole chain. The DSL pipelines
  * (CurationPipeline, ExportPipeline) compose the same operators with
  * control flow; this facade is the programmatic one-liner:
  *
  * {{{
  * Curation(docs)
  *   .dedupExact()
  *   .dropNearDups(threshold = 0.8)
  *   .filterQuality(0.3)
  *   .filterRepetition(maxDupTokenFrac = 0.65)
  *   .scrubPii()
  *   .capPerGroup("source", cap = 10000)
  *   .split()
  *   .df
  * }}}
  */
final case class Curation(
    df: DataFrame,
    idCol: String = "doc_id",
    textCol: String = "text") {

  private def next(d: DataFrame): Curation = copy(df = d)

  /** Keep the canonical (lowest-id) doc per content fingerprint. */
  def dedupExact(): Curation = next(
    Dedup.exact(df, idCol, textCol)
      .filter(col("is_canonical"))
      .drop("is_canonical", "fingerprint"))

  /** Drop near-duplicates: MinHash-LSH pairs → connected components →
    * keep only cluster canonicals and unclustered docs. */
  def dropNearDups(threshold: Double = 0.8): Curation = {
    val pairs = Dedup.minhashLshPairs(df, idCol, textCol,
      threshold = threshold)
    val losers = Dedup.duplicateClusters(pairs)
      .filter(col("doc_id") =!= col("cluster_id"))
      .select(col("doc_id").as(idCol))
    next(df.join(losers, Seq(idCol), "left_anti"))
  }

  /** Keep docs with quality score >= min (C4/Gopher-style). */
  def filterQuality(min: Double): Curation =
    next(df.filter(TextFunctions.qualityScore(col(textCol)) >= min))

  /** Drop docs contaminated by a benchmark set: any doc near-containing
    * a benchmark item's shingles (GPT-3-style decontamination). The
    * benchmark side broadcasts — the corpus never shuffles. */
  def decontaminate(
      benchmark: DataFrame, benchId: String = "bench_id",
      benchText: String = "text", threshold: Double = 0.8): Curation = {
    val hits = Dedup.crossContainmentPairs(
        df, idCol, textCol, benchmark, benchId, benchText,
        threshold = threshold)
      .select(col("doc_id").as(idCol)).distinct()
    next(df.join(hits, Seq(idCol), "left_anti"))
  }

  /** Keep each group's top `frac` quantile by quality score. */
  def topQualityQuantile(groupCol: String, frac: Double): Curation =
    next(Sampling.topQuantilePerGroup(
      df.withColumn("__q", TextFunctions.qualityScore(col(textCol))),
      groupCol, col("__q"), idCol, frac).drop("__q"))

  /** Resample toward a target group mixture (uniform by default). */
  def rebalance(groupCol: String,
      targetShares: Map[String, Double] = Map.empty,
      salt: String = "mix"): Curation =
    next(Sampling.mixtureResample(df, groupCol, idCol, salt, targetShares))

  /** Drop boilerplate: duplicate-token fraction must stay below the cap. */
  def filterRepetition(maxDupTokenFrac: Double): Curation = {
    val signals = TextAnalysis.repetitionSignals(df, idCol, textCol)
      .select(col(idCol), col("dup_token_frac"))
    next(df.join(signals, Seq(idCol))
      .filter(col("dup_token_frac") < maxDupTokenFrac)
      .drop("dup_token_frac"))
  }

  /** Keep docs whose shingle novelty (fraction of corpus-unique
    * n-grams) is at least `min` — drops boilerplate assemblies. Docs
    * too short to carry a shingle have no signal and are KEPT (same
    * no-evidence-keeps contract as decontaminate), hence the outer
    * join + coalesce rather than an inner join that would silently
    * drop them even at min = 0. */
  def filterNovelty(min: Double): Curation = {
    val nov = TextAnalysis.shingleNovelty(df, idCol, textCol)
      .select(col("doc_id").as(idCol), col("novelty"))
    next(df.join(nov, Seq(idCol), "left_outer")
      .filter(coalesce(col("novelty"), lit(1.0)) >= min)
      .drop("novelty"))
  }

  /** Redact emails / IPs / phone numbers in place. */
  def scrubPii(): Curation =
    next(df.withColumn(textCol, TextFunctions.redactPii(col(textCol))))

  /** Strip lines occurring in more than `maxDf` docs (CCNet-style
    * boilerplate removal); the text column is rewritten in place (same
    * schema, same column ORDER — downstream positional consumers rely
    * on it) and fully-boilerplate or NULL-text docs keep an empty
    * string, never vanish. */
  def removeBoilerplate(maxDf: Long = 1, sep: String = "\n"): Curation = {
    val cleaned = TextAnalysis
      .removeBoilerplateLines(df, idCol, textCol, maxDf, sep)
      .select(col(idCol), col("clean_text"))
    val joined = df.join(cleaned, Seq(idCol), "inner")
    next(joined.select(df.columns.map(c =>
      if (c == textCol) col("clean_text").as(textCol) else col(c)): _*))
  }

  /** At most `cap` docs per group, hash-chosen (unbiased draw). */
  def capPerGroup(groupCol: String, cap: Int, salt: String = "cap"): Curation =
    next(Sampling.capPerGroup(df, groupCol, idCol, salt, cap))

  /** Keep each doc with probability `weight` (deterministic hash draw). */
  def sampleWeighted(weight: Column, salt: String = "wsamp"): Curation =
    next(Sampling.weightedSample(df, idCol, salt, weight))

  /** Add a reproducible train/val/test column. */
  def split(salt: String = "graft", trainPerMille: Int = 900,
      valPerMille: Int = 50): Curation =
    next(Sampling.split(df, idCol, salt, trainPerMille, valPerMille))

  /** Group-aware split: every row of a group shares one split label —
    * near-dups inside a site/domain can't straddle train/test. */
  def splitByGroup(groupCol: String, salt: String = "graft",
      trainPerMille: Int = 900, valPerMille: Int = 50): Curation =
    next(Sampling.groupedSplit(df, groupCol, salt, trainPerMille, valPerMille))

  /** Keep ~`budget` tokens per group (greedy hash-ordered prefix). */
  def tokenBudgetPerGroup(groupCol: String, budget: Long,
      salt: String = "tb"): Curation = {
    val counted = df.withColumn("__nt",
      TextFunctions.tokenCount(col(textCol)).cast("long"))
    next(Sampling.tokenBudgetSelect(
      counted, groupCol, idCol, "__nt", salt, budget).drop("__nt"))
  }

  /** Keep docs the fixed linear quality model scores >= min — the
    * classifier-filter stage as a pure per-row predicate (no join, no
    * shuffle). */
  def filterModelQuality(min: Double = 0.5): Curation =
    next(df.filter(TextAnalysis.modelScoreColumn(col(textCol)) >= min))

  /** Terminal: per-group corpus-health profile (Zipf slope, type-token
    * ratio). */
  def profileBy(groupCol: String, topN: Int = 100): DataFrame =
    TextAnalysis.zipfProfile(df, groupCol, textCol, topN)

  /** Terminal: mixture-design report — per-group doc/token counts,
    * token share, corpus token-distribution entropy. */
  def mixtureReport(groupCol: String): DataFrame =
    Sampling.mixtureReport(df, groupCol, textCol)

  /** Terminal: top-N vocabulary with cumulative corpus coverage
    * (tokenizer sizing). */
  def vocabCoverage(topN: Int = 100): DataFrame =
    TextAnalysis.vocabCoverage(df, textCol, topN)

  /** Terminal: KL(this corpus || reference) over unigram distributions —
    * did the chain skew the data vs `reference`? */
  def driftVs(reference: DataFrame): DataFrame =
    TextAnalysis.tokenKlDivergence(df, reference, textCol)

  /** Terminal: exact-Jaccard similarity histogram — the curve that
    * calibrates a dedup threshold (run on a hash-sample at scale). */
  def similarityHistogram(minJaccard: Double = 0.7): DataFrame =
    Dedup.jaccardHistogram(df, idCol, textCol, minJaccard = minJaccard)

  /** Terminal: winnowing local-match pairs (MOSS) — docs sharing local
    * runs the global-similarity dedups miss (quotes, embedded pages). */
  def localMatches(minShared: Int = 2,
      maxFpDf: Option[Int] = None): DataFrame =
    Dedup.winnowingPairs(df, idCol, textCol,
      minShared = minShared, maxFpDf = maxFpDf)

  /** Terminal: cross-corpus n-gram overlap vs a benchmark — the scalar
    * contamination metric (decontaminate() removes WHICH; this is HOW
    * MUCH). */
  def contaminationVs(benchmark: DataFrame): DataFrame =
    Dedup.ngramOverlapStats(benchmark, df, textCol)

  /** Drop semantic near-duplicates (SemDeDup) using an embeddings
    * side table keyed by this corpus's ids: IVF cells bound the
    * quadratic check; the min-id exemplar of each within-cell dup
    * group survives. Docs without an embedding row are kept (no
    * evidence they duplicate anything). */
  def dropSemanticDups(
      embeddings: DataFrame, vecIdCol: String = "vec_id",
      vecCol: String = "embedding", numCells: Int = 256,
      threshold: Double = 0.95): Curation = {
    val dropped = embeddings.select(col(vecIdCol).as(idCol), col(vecCol))
      .join(Similarity.semanticDedup(
          embeddings, vecIdCol, vecCol, numCells, threshold)
        .select(col(vecIdCol).as(idCol)), Seq(idCol), "left_anti")
      .select(col(idCol))
    next(df.join(dropped, Seq(idCol), "left_anti"))
  }

  /** Keep only the `topK` docs most like `target` under DSIR hashed
    * n-gram importance weights (the data-selection move: score the raw
    * pool against a high-quality slice, keep the best). `target` rows
    * must carry the same id/text columns; they are the model's
    * positive side and are NOT returned. */
  def selectLikeTarget(
      target: DataFrame, topK: Int,
      buckets: Int = 65536, salt: String = "dsir"): Curation = {
    val pool = df.select(col(idCol), col(textCol), lit(false).as("__t"))
      .unionByName(
        target.select(col(idCol), col(textCol), lit(true).as("__t")))
    val kept = Sampling.importanceWeights(
        pool, idCol, textCol, isTarget = col("__t"),
        buckets = buckets, salt = salt, topK = topK)
      .select(col(idCol))
    next(df.join(kept, Seq(idCol), "left_semi"))
  }

  /** Terminal: length-bucket padding economics for batched training. */
  def lengthBuckets(
      caps: Seq[Int] = Seq(16, 32, 64, 128, 256, 512, 1024)): DataFrame =
    Packing.lengthBuckets(df, textCol, caps)

  /** Terminal: overlapping context-window chunks (window/stride in
    * tokens) — the long-document training layout. */
  def chunk(window: Int, stride: Int): DataFrame =
    Packing.chunkByTokens(df, idCol, textCol, window, stride)

  /** Terminal: sequence packing (global offset, bin, boundary flag)
    * for the surviving docs, BPE-ish token counts. */
  def pack(budget: Long = 4096L): DataFrame =
    Packing.packSequences(
      df.select(col(idCol),
        TextFunctions.bpeishTokenCount(col(textCol)).as("n_tokens")),
      idCol, "n_tokens", budget)

  /** Terminal: deterministic export-shuffle rank per surviving doc. */
  def exportShuffled(salt: String = "shuf"): DataFrame =
    Packing.globalRank(
      df.withColumn("__h",
        md5(concat(lit(salt), col(idCol).cast("string")).cast("binary"))),
      "__h", Seq(idCol))
      .select(col(idCol), col("rank").as("shuffle_rank"))
}
