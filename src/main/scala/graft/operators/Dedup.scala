package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** Deduplication operators for large-scale corpus curation.
  *
  * Four families (BASELINE.json LLM-data-pipeline extensions):
  *
  *  - exact:   hash-groupBy on a content fingerprint — one shuffle on the
  *             fingerprint, the optimal plan at any scale;
  *  - minhash: shingle → minhash signature → banded LSH → bucket join →
  *             exact-Jaccard verification. No cartesian product anywhere:
  *             candidate generation is an equi-join on (band, key);
  *  - simhash: 64-bit signature with banded Hamming search;
  *  - exact n-gram Jaccard: inverted-index similarity join (join on
  *             shared shingle, count co-occurrences) — exact, and the
  *             oracle for the approximate paths.
  *
  * All built from built-in expressions (codegen'd); signatures are
  * computed per-document in a single projection (embarrassingly
  * parallel). At 100 TB the only shuffles are the band-bucket join
  * (explode factor = number of bands) and the final pair groupBy. Skew
  * guard: `maxShingleDf` drops shingles shared by more than that many
  * documents from the inverted index — stopword-like shingles generate
  * quadratic pair blowup and carry no discriminative signal.
  */
object Dedup {

  /** Cut lineage on an iterative frame: a RELIABLE checkpoint (HDFS/
    * object-store write) when the session has a checkpoint dir
    * configured — on a real cluster a lost executor must not kill a
    * multi-hour iterative job, because localCheckpoint blocks die with
    * their executor — and a localCheckpoint otherwise (local mode,
    * tests: no storage round-trip). Lineage must be CUT either way:
    * iterative self-reference doubles the logical plan per round.
    *
    * The reliable path persists BEFORE checkpointing (an unpersisted
    * reliable checkpoint recomputes the round's whole plan for the
    * write job — documented Spark behavior) and unpersists after;
    * superseded per-round checkpoint files are GC-collected when
    * `spark.cleaner.referenceTracking.cleanCheckpoints` is on
    * (Sessions.tune sets it). */
  private def cutLineage(df: DataFrame): DataFrame =
    if (df.sparkSession.sparkContext.getCheckpointDir.isDefined) {
      val cached = df.persist(
        org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val cut = cached.checkpoint()
      cached.unpersist(blocking = false)
      cut
    } else df.localCheckpoint()

  /** [[cutLineage]] for the inside of an iterative loop whose very next
    * statement is an aggregate over the frame (convergence checksum /
    * label sum): the LAZY local checkpoint materializes during that
    * aggregate's own action, so each round costs ONE job instead of two
    * (eager-checkpoint job + aggregate job) — at test scale the rounds
    * are all fixed job overhead, so this halves the loop's wall time.
    * The reliable-checkpoint path stays eager: a lost-executor-safe
    * write should not be deferred into whatever action happens next. */
  private def cutLineageLazy(df: DataFrame): DataFrame =
    if (df.sparkSession.sparkContext.getCheckpointDir.isDefined) cutLineage(df)
    else df.localCheckpoint(false)

  /** Survivor marking for exact dedup: canonical = lowest id per
    * normalized-content fingerprint (deterministic at any parallelism). */
  def exact(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val fp = TextFunctions.fingerprint(col(textCol))
    val w = Window.partitionBy(col("__fp")).orderBy(col(idCol))
    df.withColumn("__fp", fp)
      .withColumn("is_canonical", row_number().over(w) === 1)
      .withColumn("fingerprint", col("__fp"))
      .drop("__fp")
  }

  /** Word-shingle set (distinct n-grams, lower-cased). Native kernel —
    * one compiled pass per document (the composable HOF version costs
    * ~2ms/doc interpreted; see TextKernelExpressions). */
  def shingleSet(text: Column, n: Int): Column =
    graft.functions.TextKernelExpressions.word_shingles(text, n)

  /** MinHash signature: for each of `numHashes` seeded hash functions,
    * the minimum xxhash64 over the shingle set. Null when the document
    * has no shingles (shorter than n tokens). */
  def minhashSignature(shingles: Column, numHashes: Int): Column =
    graft.functions.TextKernelExpressions.minhash_sig(shingles, numHashes)

  /** Candidate pairs via banded LSH over minhash signatures, verified
    * with exact Jaccard. With numHashes=64, bands=16 (r=4) the miss
    * probability at J >= 0.8 is (1-0.8^4)^16 < 1e-4 and at J >= 0.95
    * ~1e-12 — the verified output matches the exact similarity join in
    * practice while candidate generation stays an equi-join.
    */
  def minhashLshPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      shingleN: Int = 3,
      numHashes: Int = 64,
      bands: Int = 16,
      threshold: Double = 0.8): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val r = numHashes / bands

    val docs = df
      .select(col(idCol).as("id"), shingleSet(col(textCol), shingleN).as("sh"))
      .filter(size(col("sh")) > 0)
      .localCheckpoint(false)

    // one THIN row per (doc, band) — the shingle arrays stay out of the
    // bucket join and the pair dedup shuffle; they are joined back only
    // for the (few) surviving candidates
    val banded = docs
      .withColumn("sig", minhashSignature(col("sh"), numHashes))
      .select(col("id"),
        posexplode(transform(sequence(lit(0), lit(bands - 1)),
          b => concat_ws(",", transform(slice(col("sig"), b * r + 1, lit(r)),
            v => v.cast("string"))))))
      .withColumnRenamed("pos", "band")
      .withColumnRenamed("col", "band_key")

    val cand = bucketPairs(banded, Seq("band", "band_key"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .dropDuplicates("id_a", "id_b")
    verifyJaccard(cand, docs, threshold)
  }

  /** In-bucket pair expansion: one shuffle (groupBy on the bucket key)
    * instead of a two-sided self-join, and the upstream signature kernel
    * runs once instead of twice. Pairs are the ordered combinations of
    * each bucket's id-sorted item list, generated by a double explode
    * (both codegen generators — no interpreted lambdas). Output columns
    * `a`/`b` are structs of (id ++ extraCols) with a.id < b.id.
    *
    * Skew safety: `collect_list` holds one bucket in a single
    * (non-spillable) aggregation buffer, so buckets above
    * `maxBucketInMemory` rows — boilerplate explosions where thousands
    * of near-identical docs share a signature — take the classic
    * self-join path instead, which is quadratic in OUTPUT rows but
    * spills through the shuffle. The bucket-size window rides the same
    * hash partitioning the groupBy needs, so the split adds no extra
    * shuffle to the common path. */
  private[graft] def bucketPairs(
      rows: DataFrame,
      bucketCols: Seq[String],
      extraCols: Seq[String] = Nil,
      maxBucketInMemory: Int = 10000): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val item = struct((col("id") +: extraCols.map(col)): _*)
    val bk = bucketCols.map(col)
    // oversized-bucket detection via a partitionBy-only window count:
    // it rides the SAME hash shuffle the groupBy needs, evaluates the
    // upstream (signature kernels, prefix ranking) exactly once, and
    // WindowExec spills its per-group buffer — a separate count
    // aggregate would recompute the whole upstream for the probe
    val sized = rows.withColumn("__bn",
      count(lit(1)).over(Window.partitionBy(bk: _*)))

    val small = sized.filter(col("__bn") <= maxBucketInMemory)
      .groupBy(bk: _*)
      .agg(sort_array(collect_list(item)).as("xs"))
      .filter(size(col("xs")) > 1)
      .select(col("xs"), posexplode(col("xs")))
      .select(col("col").as("a"),
        explode(slice(col("xs"), col("pos") + 2, size(col("xs")))).as("b"))

    val big = sized.filter(col("__bn") > maxBucketInMemory)
    val bigPairs = big.select(bk :+ item.as("a"): _*)
      .join(big.select(bk :+ item.as("b"): _*), bucketCols)
      .filter(col("a.id") < col("b.id"))
      .select("a", "b")

    small.union(bigPairs)
  }

  /** Exact-Jaccard verification of candidate (id_a, id_b) pairs against
    * the full shingle sets. */
  private def verifyJaccard(
      candidates: DataFrame, docs: DataFrame, threshold: Double): DataFrame = {
    val inter = size(array_intersect(col("sh_a"), col("sh_b"))).cast("double")
    val uni = (size(col("sh_a")) + size(col("sh_b"))).cast("double") - inter
    candidates
      .join(docs.select(col("id").as("id_a"), col("sh").as("sh_a")), "id_a")
      .join(docs.select(col("id").as("id_b"), col("sh").as("sh_b")), "id_b")
      .withColumn("jaccard", round(inter / uni, 4))
      .filter(col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")
  }

  /** Exact n-gram Jaccard similarity join via inverted index: explode
    * distinct shingles, equi-join on shingle, count co-occurrences, then
    * |A∩B| / (|A|+|B|-|A∩B|). Exact (recall 1) — the oracle for the LSH
    * path. `maxShingleDf` drops ultra-common shingles (df > cap) from
    * pair GENERATION only; Jaccard is still computed on full sets, so
    * results are exact as long as every qualifying pair shares at least
    * one sub-cap shingle. Pass None for strict exactness. */
  def ngramJaccardPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      shingleN: Int = 3,
      threshold: Double = 0.8,
      maxShingleDf: Option[Int] = None): DataFrame = {
    import org.apache.spark.sql.expressions.Window

    // lazily checkpointed: the shingle kernel would otherwise re-run for
    // the inverted index, the frequency count, and both verification
    // joins. localCheckpoint (not persist) so the blocks are GC-released
    // when the result is dropped — a lazy operator can never unpersist
    // on its caller's behalf, and pinned cache entries would accumulate
    // across queries and micro-batches.
    val docs = df.select(col(idCol).as("id"),
      shingleSet(col(textCol), shingleN).as("sh"))
      .filter(size(col("sh")) > 0)
      .localCheckpoint(false)

    var inverted = docs.select(col("id"), size(col("sh")).as("n"),
      explode(col("sh")).as("shingle"))
    maxShingleDf.foreach { cap =>
      val dfCount = Window.partitionBy("shingle")
      inverted = inverted
        .withColumn("__df", count(lit(1)).over(dfCount))
        .filter(col("__df") <= cap).drop("__df")
    }

    // Verification accepts round(J,4) >= t, i.e. true J >= t - 5e-5 —
    // every pruning bound below must use that effective threshold, or a
    // pair just under t that ROUNDS to t gets pruned here yet accepted
    // by the oracle. The extra 1e-6 inside ceil() keeps double error on
    // an exactly-integer product from bumping the bound a whole unit.
    val tEff = threshold - 0.00005

    // PPJoin-style prefix filtering (Xiao et al., WWW'08): order each
    // document's shingles by ascending global frequency; if
    // J(A,B) >= t then |A∩B| >= ceil(t·|A|), so any qualifying partner
    // shares at least one of A's first (|A| - ceil(t·|A|) + 1) shingles.
    // Only prefixes enter the pair-generation join — candidate volume
    // drops ~(1-t)² while staying EXACT (verification uses full sets).
    val freq = inverted.groupBy("shingle").agg(count(lit(1)).as("__freq"))
    val wDoc = Window.partitionBy("id").orderBy(col("__freq"), col("shingle"))
    val prefix = inverted
      .join(freq, "shingle")
      .withColumn("__rk", row_number().over(wDoc))
      .filter(col("__rk") <=
        col("n") - ceil(lit(tEff) * col("n") - lit(1e-6)) + 1)
      // a globally-unique shingle cannot be shared, so it generates no
      // candidates — drop AFTER ranking (order must include it) for a
      // typically large, still-exact cut
      .filter(col("__freq") > 1)
      .select("id", "n", "shingle")

    // PPJoin length filter: J(A,B) >= t forces t·|A| <= |B| <= |A|/t,
    // so size-incompatible pairs die before the dedup shuffle and the
    // verification join (at t=0.9 this cuts candidates ~2×)
    val sized = bucketPairs(prefix, Seq("shingle"), extraCols = Seq("n"))
      .filter(least(col("a.n"), col("b.n")) >=
        ceil(lit(tEff) * greatest(col("a.n"), col("b.n")) - lit(1e-6)))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .dropDuplicates("id_a", "id_b")
    verifyJaccard(sized, docs, threshold)
  }

  /** Threshold-calibration curve: histogram of exact n-gram Jaccard over
    * all candidate pairs with J >= `minJaccard` — the distribution a
    * curation run inspects to PICK its dedup threshold before committing
    * to one (a cliff in the histogram separates near-dup families from
    * background similarity). Buckets are [b/10, (b+1)/10) lower bounds;
    * J = 1.0 lands in its own 1.0 bucket.
    *
    * Scale shape: inherits [[ngramJaccardPairs]]'s prefix+length-filtered
    * candidate generation (lower thresholds prune less — that is
    * inherent to asking a wider question), then collapses to a ≤11-row
    * histogram with map-side partial aggregation — the pair set never
    * collects. The bucket index floors `10*J + 1e-6`: J is already
    * rounded to 4dp, so the epsilon only absorbs binary representation
    * error and cannot lift a true 0.X999 into the next bucket. */
  def jaccardHistogram(
      df: DataFrame,
      idCol: String,
      textCol: String,
      shingleN: Int = 3,
      minJaccard: Double = 0.5,
      maxShingleDf: Option[Int] = None): DataFrame =
    ngramJaccardPairs(df, idCol, textCol, shingleN, minJaccard, maxShingleDf)
      .select(floor(col("jaccard") * 10 + 1e-6).cast("int").as("__b"))
      .groupBy("__b").agg(count(lit(1)).as("n_pairs"))
      .select((col("__b") / 10.0).as("bucket_lo"), col("n_pairs"))

  /** Directional containment join: pairs (a, b) where a's shingle set is
    * (near-)contained in b's — |A∩B| / |A| >= t. Catches the
    * quote-with-boilerplate and excerpt-of-larger-doc duplicates that
    * symmetric Jaccard misses (|B| >> |A| drives J down but not
    * containment). Prefix filtering applies on the CONTAINED side only
    * (if |A∩B| >= t·|A|, a partner shares one of A's first
    * |A| - ceil(t·|A|) + 1 rarest shingles), so candidates join A's
    * prefix against the inverted index; verification uses full
    * sets and is exact.
    *
    * Scale guard (`maxShingleDf`): candidate volume is
    * Σ_s prefixCount(s)·df(s), so a shingle duplicated across a huge
    * boilerplate family (df in the tens of thousands) makes the
    * candidate join quadratic in the family size. Shingles with
    * df > cap are dropped from BOTH join sides during candidate
    * generation only — results stay exact as long as every qualifying
    * pair shares at least one sub-cap shingle in the contained side's
    * prefix. A family of thousands of identical docs trips the cap and
    * loses its (quadratic, non-discriminative) pairs — run `exact`
    * dedup FIRST, as CurationPipeline does, so byte-identical families
    * never reach this operator. Residual hot keys below the cap are
    * split at runtime by AQE's skew-join handling (Sessions.tune).
    *
    * The default is None (exact) — capping silently drops pairs whose
    * only shared prefix shingle is super-cap, so it is an explicit
    * opt-in at scale-sensitive call sites (ScaleStress passes 1000 for
    * the 2000-copy boilerplate family), never a surprise default. */
  def containmentPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      shingleN: Int = 3,
      threshold: Double = 0.9,
      maxShingleDf: Option[Int] = None): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val docs = df.select(col(idCol).as("id"),
      shingleSet(col(textCol), shingleN).as("sh"))
      .filter(size(col("sh")) > 0)
      .localCheckpoint(false)

    val inverted = docs.select(col("id"), size(col("sh")).as("n"),
      explode(col("sh")).as("shingle"))

    // same rounding slack as the Jaccard path: verification accepts
    // round(c,4) >= t, i.e. true containment >= t - 5e-5
    val tEff = threshold - 0.00005
    val freq = inverted.groupBy("shingle").agg(count(lit(1)).as("__freq"))
    val cap = maxShingleDf.map(lit(_)).getOrElse(lit(Long.MaxValue))
    // the df-annotated inverted index feeds BOTH candidate sides —
    // checkpoint it once so the shingle-shuffle join doesn't run twice
    val invFreq = inverted.join(freq, "shingle").localCheckpoint(false)
    // prefix ranking must see ALL shingles (the bound counts positions),
    // so the df cap filters after ranking, alongside the df>1 cut
    val wDoc = Window.partitionBy("id").orderBy(col("__freq"), col("shingle"))
    val prefix = invFreq
      .withColumn("__rk", row_number().over(wDoc))
      .filter(col("__rk") <=
        col("n") - ceil(lit(tEff) * col("n") - lit(1e-6)) + 1)
      .filter(col("__freq") > 1 && col("__freq") <= cap)
      .select(col("id").as("id_a"), col("shingle"))

    // index side drops super-cap shingles too — this is the bound that
    // keeps per-shingle join volume <= prefixCount(s) * cap
    val index = invFreq
      .filter(col("__freq") <= cap)
      .select(col("id").as("id_b"), col("shingle"))

    val candidates = prefix
      .join(index, "shingle")
      .filter(col("id_a") =!= col("id_b"))
      .select("id_a", "id_b")
      .dropDuplicates("id_a", "id_b")

    val inter = size(array_intersect(col("sh_a"), col("sh_b"))).cast("double")
    candidates
      .join(docs.select(col("id").as("id_a"), col("sh").as("sh_a")), "id_a")
      .join(docs.select(col("id").as("id_b"), col("sh").as("sh_b")), "id_b")
      .withColumn("containment", round(inter / size(col("sh_a")), 4))
      .filter(col("containment") >= threshold)
      .select("id_a", "id_b", "containment")
  }

  /** EXACT substring duplicates: pairs (id_a, id_b) where A's token
    * sequence appears CONTIGUOUSLY inside B's — quoted articles, pages
    * embedded in crawls, prompt+completion pairs sharing the prompt.
    * Shingle-set containment of 1.0 is NECESSARY for a token-substring
    * (every word n-gram of A occurs in B), so candidates come from the
    * same prefix-filtered containment index as [[containmentPairs]] and
    * only surviving candidates ever rejoin their text — the exact
    * contiguity check never touches the corpus cross-product. The
    * comparison runs on case-folded, space-normalized token streams
    * with sentinel padding — the SAME normalization the shingle
    * candidates use — so token boundaries are respected ("a b" is not
    * inside "aa bb"). Docs with fewer than `shingleN` tokens have no
    * shingles and are not detected (same floor as every shingle
    * operator). */
  def substringPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      shingleN: Int = 3,
      maxShingleDf: Option[Int] = None): DataFrame = {
    val cands = containmentPairs(df, idCol, textCol, shingleN,
      threshold = 1.0, maxShingleDf = maxShingleDf)
    val norm = df.select(col(idCol), concat(lit(" "),
      array_join(
        graft.functions.TextFunctions.wsTokens(lower(col(textCol))), " "),
      lit(" ")).as("__norm"))
    cands
      .join(norm.select(col(idCol).as("id_a"), col("__norm").as("__na")), "id_a")
      .join(norm.select(col(idCol).as("id_b"), col("__norm").as("__nb")), "id_b")
      .filter(col("__nb").contains(col("__na")))
      .select("id_a", "id_b")
  }

  /** Incremental (streaming) exact dedup against a persisted registry:
    * each micro-batch fingerprints its documents, merges them into the
    * store's (fingerprint → canonical doc_id) table keeping the MINIMUM
    * id per fingerprint, and commits atomically. The min-merge makes
    * the final registry identical to a one-shot batch dedup of the
    * whole corpus REGARDLESS of arrival order or batch boundaries —
    * the invariant that lets a continuously-ingesting pipeline answer
    * "is this new doc a duplicate of anything ever seen" with one
    * registry lookup, no reprocessing. At scale the same foreachBatch
    * body runs against a Delta/Iceberg MERGE instead of the
    * copy-on-write store (the store's documented swap point); state is
    * one thin row per distinct document, not the corpus. */
  def incrementalDedup(
      stream: DataFrame,
      idCol: String,
      textCol: String,
      store: graft.sources.ResultStore,
      schema: String,
      checkpoint: String): org.apache.spark.sql.streaming.StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val mins = batch
          .select(col(idCol).cast("long").as("doc_id"),
            TextFunctions.fingerprint(col(textCol)).as("fingerprint"))
          .groupBy("fingerprint").agg(min("doc_id").as("doc_id"))
        val merged =
          if (!store.hasSchema(schema)) mins
          else store.read(schema).unionByName(mins)
            .groupBy("fingerprint").agg(min("doc_id").as("doc_id"))
        store.overwrite(schema, merged)
      }
      .start()

  /** Cross-corpus contamination join (decontamination): pairs
    * (doc, bench) where a benchmark item's shingle set is near-contained
    * in a corpus document — |B∩D| / |B| >= t. The GPT-3-style
    * train/test decontamination check: a training doc that embeds a
    * benchmark example (verbatim or lightly edited) must be caught even
    * when the doc is far larger than the example.
    *
    * Scale shape: the benchmark side is SMALL by nature (eval sets),
    * so its exploded inverted index is BROADCAST — the 100 TB corpus
    * explodes its shingles map-side, joins without shuffling the
    * corpus, and only matching (doc, bench, shingle) rows enter the
    * one groupBy shuffle. The shared-shingle count over distinct
    * shingle sets IS |B∩D| exactly, so the result is exact — no
    * candidate/verify split needed. */
  def crossContainmentPairs(
      corpus: DataFrame,
      corpusId: String,
      corpusText: String,
      benchmark: DataFrame,
      benchId: String,
      benchText: String,
      shingleN: Int = 3,
      threshold: Double = 0.8): DataFrame = {
    val bIndex = broadcast(benchmark
      .select(col(benchId).as("bench_id"),
        shingleSet(col(benchText), shingleN).as("sh"))
      .filter(size(col("sh")) > 0)
      .select(col("bench_id"), size(col("sh")).as("bn"),
        explode(col("sh")).as("shingle")))
    val cSh = corpus.select(col(corpusId).as("doc_id"),
      explode(shingleSet(col(corpusText), shingleN)).as("shingle"))
    cSh.join(bIndex, "shingle")
      .groupBy("doc_id", "bench_id", "bn")
      .agg(count(lit(1)).as("inter"))
      .withColumn("contamination",
        round(col("inter").cast("double") / col("bn"), 4))
      .filter(col("contamination") >= threshold)
      .select("doc_id", "bench_id", "contamination")
  }

  /** Duplicate clusters = connected components over a near-dup pair
    * graph: every doc in a component gets `cluster_id` = the component's
    * minimum id (the canonical survivor), plus the component size.
    *
    * Algorithm: iterative min-label propagation — each round every node
    * takes the minimum label among itself and its neighbors; converges in
    * O(component diameter) rounds (near-dup components are clique-like,
    * so 2-3 rounds in practice). Each round is one equi-join + one
    * groupBy-min, both shuffling on node id, with results persisted and
    * the convergence check riding the same materialization. For chain-shaped
    * components (diameter >> rounds) use `duplicateClustersStar` —
    * the Kiveris et al. large-star/small-star contraction below, which
    * converges in O(log n) rounds with the same output contract.
    *
    * Only ids that appear in `pairs` are returned (docs with no near-dup
    * are their own singleton cluster — callers can left-join this result
    * and coalesce to the doc's own id). */
  def duplicateClusters(
      pairs: DataFrame,
      idA: String = "id_a",
      idB: String = "id_b",
      maxRounds: Int = 50): DataFrame =
    duplicateClustersWithRounds(pairs, idA, idB, maxRounds)._1

  /** [[duplicateClusters]] plus the number of propagation rounds it
    * took — the observable that lets specs/stress pin the O(diameter)
    * bound against star contraction's O(log n). */
  private[graft] def duplicateClustersWithRounds(
      pairs: DataFrame,
      idA: String = "id_a",
      idB: String = "id_b",
      maxRounds: Int = 50): (DataFrame, Int) = {
    import org.apache.spark.storage.StorageLevel
    // Materialize the pair plan ONCE and cut its lineage before anything
    // references it twice: the symmetric edge union reads it from both
    // branches, and every propagation round re-joins it — an unpersisted
    // plan here re-executes the whole upstream candidate-generation +
    // verification subplan per reference (measured: dq7 went 39.8s→~dq6
    // level once this was a checkpoint). localCheckpoint (not persist):
    // a cache entry still carries the full logical plan; the lineage
    // must be CUT so round-over-round plans stay constant-size.
    val e = cutLineage(pairs.select(col(idA).cast("long").as("src"),
      col(idB).cast("long").as("dst")))
    // A clean corpus is a valid input: zero pairs → zero clusters (the
    // seed aggregation would otherwise produce an empty labels frame
    // whose decimal sum is NULL and NPE the convergence compare).
    if (e.isEmpty) {
      val spark = pairs.sparkSession
      import spark.implicits._
      return (Seq.empty[(Long, Long, Long)]
        .toDF("doc_id", "cluster_id", "cluster_size"), 0)
    }
    val edges = e.union(e.select(col("dst").as("src"), col("src").as("dst")))
      .persist(StorageLevel.MEMORY_AND_DISK)
    // localCheckpoint (not persist): iterative self-reference doubles the
    // logical plan every round — the lineage must be CUT, not just cached.
    // On a real cluster use reliable checkpoints (setCheckpointDir) so a
    // lost executor can't kill a multi-hour job.
    // Seed with min(id, neighbors) directly — for the clique-like
    // components near-dup graphs produce, that alone is often converged.
    var labels = cutLineageLazy(edges.groupBy(col("src").as("id"))
      .agg(least(first(col("src")), min(col("dst"))).as("label")))
    // labels only ever decrease, so sum(label) is strictly monotone and
    // equality means convergence — no per-round join against the old
    // labels just to count changes
    def labelSum(df: DataFrame): java.math.BigDecimal =
      df.agg(coalesce(sum(col("label").cast("decimal(38,0)")),
        lit(java.math.BigDecimal.ZERO))).head().getDecimal(0)
    var prevSum = labelSum(labels)
    var round = 0
    var converged = false
    while (!converged && round < maxRounds) {
      val prop = edges.join(labels, edges("dst") === labels("id"))
        .select(edges("src").as("id"), col("label"))
      val next = cutLineageLazy(labels.union(prop)
        .groupBy("id").agg(min("label").as("label")))
      val s = labelSum(next)
      converged = s.compareTo(prevSum) == 0
      prevSum = s
      labels = next
      round += 1
    }
    edges.unpersist(blocking = false)
    // a silent partial result would split components invisibly — refuse
    if (!converged) throw new IllegalStateException(
      s"duplicateClusters: label propagation did not converge within " +
        s"$maxRounds rounds (graph diameter exceeds the budget); raise " +
        s"maxRounds or use duplicateClustersStar (O(log n) rounds)")
    val sizes = labels.groupBy("label").agg(count(lit(1)).as("cluster_size"))
    (labels.join(sizes, "label")
      .select(col("id").as("doc_id"), col("label").as("cluster_id"),
        col("cluster_size")), round)
  }

  /** Connected components by alternating large-star/small-star
    * contraction (Kiveris et al., "Connected Components in MapReduce and
    * Beyond", SoCC'14) — the planet-scale path `duplicateClusters`
    * documents: O(log n) rounds regardless of component DIAMETER, where
    * min-label propagation needs O(diameter) rounds and dies on chain-
    * shaped components (e.g. containment chains A⊂B⊂C⊂...). Same
    * output contract as duplicateClusters: (doc_id, cluster_id =
    * component min, cluster_size), only ids present in `pairs`.
    *
    * Each round: large-star points every node's larger neighbors at the
    * neighborhood minimum; small-star re-roots each node's smaller
    * neighbors (and itself) at their minimum. Both are one groupBy-min +
    * one join, shuffling on node id; edges stay (child > parent) after
    * round one, so the edge count is bounded by the node count.
    * Convergence = the edge SET is stable across a round, checked by an
    * order-independent content checksum: (count, Σ xxhash64(u,v) as
    * decimal). A plain (Σu, Σv) triple can collide on distinct edge
    * sets ({(3,1),(4,2)} vs {(4,1),(3,2)}); hashing each edge before
    * summing makes such a collision require equal multiset hash sums —
    * vanishing probability — while staying one cheap aggregate (no
    * extra except() join per round). */
  def duplicateClustersStar(
      pairs: DataFrame,
      idA: String = "id_a",
      idB: String = "id_b",
      maxRounds: Int = 50): DataFrame =
    duplicateClustersStarWithRounds(pairs, idA, idB, maxRounds)._1

  /** [[duplicateClustersStar]] plus the number of contraction rounds —
    * specs/stress pin the O(log n) bound with it (a path graph of
    * diameter d must converge in ~log2(d) rounds, not d). */
  private[graft] def duplicateClustersStarWithRounds(
      pairs: DataFrame,
      idA: String = "id_a",
      idB: String = "id_b",
      maxRounds: Int = 50): (DataFrame, Int) = {
    val e0 = cutLineage(pairs
      .select(col(idA).cast("long").as("u"), col(idB).cast("long").as("v"))
      .filter(col("u") =!= col("v")))
    if (e0.isEmpty) {
      val spark = pairs.sparkSession
      import spark.implicits._
      return (Seq.empty[(Long, Long, Long)]
        .toDF("doc_id", "cluster_id", "cluster_size"), 0)
    }

    def largeStar(edges: DataFrame): DataFrame = {
      val sym = edges.union(edges.select(col("v").as("u"), col("u").as("v")))
      val mins = sym.groupBy("u")
        .agg(least(first(col("u")), min(col("v"))).as("m"))
      sym.join(mins, "u")
        .filter(col("v") > col("u"))
        .select(col("v").as("u"), col("m").as("v"))
        .dropDuplicates("u", "v")
    }

    def smallStar(edges: DataFrame): DataFrame = {
      // after largeStar every edge is (child u, parent v) with u > v.
      // No dedup here: each input edge emits at most one row (+one per
      // node from `mins`), so the output is bounded by edges + nodes
      // with or without it — duplicates cost one bounded-multiplicity
      // round-trip and largeStar's own dropDuplicates renormalizes next
      // round, which is cheaper than an extra (u,v) shuffle every round.
      // At the fixpoint every node carries exactly one (node, min) row,
      // so the multiset checksum still detects convergence exactly.
      val mins = edges.groupBy("u").agg(min(col("v")).as("m"))
      val e = edges.join(mins, "u")
      e.filter(col("v") =!= col("m"))
        .select(col("v").as("u"), col("m").as("v"))
        .union(mins.select(col("u"), col("m").as("v")))
    }

    def checksum(edges: DataFrame): (Long, java.math.BigDecimal) = {
      val r = edges.agg(
        count(lit(1)),
        coalesce(sum(xxhash64(col("u"), col("v")).cast("decimal(38,0)")),
          lit(java.math.BigDecimal.ZERO))).head()
      (r.getLong(0), r.getDecimal(1))
    }

    var edges = cutLineageLazy(smallStar(largeStar(e0)))
    var prev = checksum(edges)
    var round = 1
    var converged = false
    while (!converged && round < maxRounds) {
      val next = cutLineageLazy(smallStar(largeStar(edges)))
      val s = checksum(next)
      converged = s._1 == prev._1 && s._2.compareTo(prev._2) == 0
      prev = s
      edges = next
      round += 1
    }
    if (!converged) throw new IllegalStateException(
      s"duplicateClustersStar: contraction did not converge within " +
        s"$maxRounds rounds")

    val labels = edges.select(col("u").as("id"), col("v").as("label"))
      .union(edges.select(col("v").as("id"), col("v").as("label")))
      .groupBy("id").agg(min(col("label")).as("label"))
    val sizes = labels.groupBy("label").agg(count(lit(1)).as("cluster_size"))
    (labels.join(sizes, "label")
      .select(col("id").as("doc_id"), col("label").as("cluster_id"),
        col("cluster_size")), round)
  }

  /** 64-bit SimHash from whitespace tokens: per-bit vote of each token's
    * xxhash64 (seed 42), bit set iff the vote is positive. Native kernel
    * (TextKernelExpressions.SimHash) — one compiled pass per document. */
  def simhash64(text: Column): Column =
    graft.functions.TextKernelExpressions.simhash(text)

  /** Engine-portable SimHash signatures: per-token 64-bit hash = the
    * first 16 hex chars of md5(lower token), carried as two unsigned
    * 32-bit halves in longs (hi, lo) so no step ever overflows signed
    * 64-bit — which lets a DuckDB oracle replay the signature exactly
    * (xxhash64 of the fast kernel has no SQL twin; md5 does). Same
    * vote semantics as the kernel: per-bit ±1 across token occurrences,
    * bit set iff the vote is positive. */
  def simhashMd5Sigs(
      df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = df.select(col(idCol).as("id"),
      explode(filter(split(lower(col(textCol)), "\\s+"),
        t => length(t) > 0)).as("tok"))
    val hashed = toks.select(col("id"),
      conv(substring(md5(col("tok")), 1, 8), 16, 10).cast("long").as("hi"),
      conv(substring(md5(col("tok")), 9, 8), 16, 10).cast("long").as("lo"))
    def bit(c: Column, j: Int): Column =
      shiftright(c, j).bitwiseAND(lit(1L))
    val aggs =
      (0 until 32).map(j => sum(bit(col("lo"), j) * 2 - 1).as(s"vl$j")) ++
      (0 until 32).map(j => sum(bit(col("hi"), j) * 2 - 1).as(s"vh$j"))
    val votes = hashed.groupBy("id").agg(aggs.head, aggs.tail: _*)
    def assemble(prefix: String): Column =
      (0 until 32).map(j =>
        when(col(s"$prefix$j") > 0, lit(1L << j)).otherwise(lit(0L)))
        .reduce(_ + _)
    votes.select(col("id"),
      assemble("vh").as("sig_hi"), assemble("vl").as("sig_lo"))
  }

  /** Near-dup pairs over the md5 SimHash signatures — the same
    * pigeonhole banding as [[simhashPairs]] on the (hi, lo) form.
    * Fully DuckDB-oracled in the gate (dq4); the xxhash64 kernel path
    * stays the fast default, pinned by the DedupSimilaritySpec
    * differential. */
  def simhashPairsMd5(
      df: DataFrame,
      idCol: String,
      textCol: String,
      maxDist: Int = 3,
      maxBucketInMemory: Int = 10000): DataFrame = {
    val sigs = simhashMd5Sigs(df, idCol, textCol)
    val banded = sigs.select(col("id"), col("sig_hi"), col("sig_lo"),
      posexplode(array(
        col("sig_lo").bitwiseAND(lit(0xffffL)),
        shiftright(col("sig_lo"), 16).bitwiseAND(lit(0xffffL)),
        col("sig_hi").bitwiseAND(lit(0xffffL)),
        shiftright(col("sig_hi"), 16).bitwiseAND(lit(0xffffL)))))
      .withColumnRenamed("pos", "band")
      .withColumnRenamed("col", "chunk")
    bucketPairs(banded, Seq("band", "chunk"),
        extraCols = Seq("sig_hi", "sig_lo"),
        maxBucketInMemory = maxBucketInMemory)
      .withColumn("hamming",
        (bit_count(col("a.sig_hi").bitwiseXOR(col("b.sig_hi"))) +
          bit_count(col("a.sig_lo").bitwiseXOR(col("b.sig_lo"))))
          .cast("long"))
      .filter(col("hamming") <= maxDist)
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"), col("hamming"))
      .dropDuplicates("id_a", "id_b")
  }

  /** Near-dup pairs by SimHash Hamming distance <= maxDist — see
    * [[hammingPairs64]] for the pigeonhole machinery. */
  def simhashPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      maxDist: Int = 3,
      chunks: Int = 4,
      maxBucketInMemory: Int = 10000): DataFrame =
    hammingPairs64(
      df.select(col(idCol).as("id"), simhash64(col(textCol)).as("sig")),
      "id", "sig", maxDist, chunks, maxBucketInMemory)

  /** Near-dup pairs over ANY precomputed 64-bit signature column
    * (SimHash for text, dHash for images, any locality-preserving
    * fingerprint) by Hamming distance <= maxDist, found by the
    * pigeonhole trick: split the signature into `chunks` bands — any
    * pair within maxDist (< chunks) collides on at least one intact
    * band, so candidate generation is an equi-join on (band, chunk),
    * never a cartesian. */
  def hammingPairs64(
      sigs: DataFrame,
      idCol: String,
      sigCol: String,
      maxDist: Int = 3,
      chunks: Int = 4,
      maxBucketInMemory: Int = 10000): DataFrame = {
    require(maxDist < chunks,
      s"pigeonhole needs maxDist < chunks (got $maxDist >= $chunks)")
    val s0 = sigs.select(col(idCol).as("id"), col(sigCol).as("sig"))
    val width = 64 / chunks
    val banded = s0.select(col("id"), col("sig"),
      posexplode(transform(sequence(lit(0), lit(chunks - 1)),
        c => call_function("shiftright", col("sig"), c * width)
          .bitwiseAND(lit((1L << width) - 1)))))
      .withColumnRenamed("pos", "band")
      .withColumnRenamed("col", "chunk")

    // one-shuffle in-bucket expansion carrying the signature through the
    // struct so Hamming is computed inline (pairs are cut by distance
    // BEFORE the dedup shuffle)
    bucketPairs(banded, Seq("band", "chunk"), extraCols = Seq("sig"),
        maxBucketInMemory = maxBucketInMemory)
      .withColumn("hamming",
        bit_count(col("a.sig").bitwiseXOR(col("b.sig"))).cast("long"))
      .filter(col("hamming") <= maxDist)
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"), col("hamming"))
      .dropDuplicates("id_a", "id_b")
  }
}
