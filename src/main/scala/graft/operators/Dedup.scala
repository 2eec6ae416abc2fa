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
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

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

    val candidates = banded.as("x")
      .join(banded.as("y"),
        col("x.band") === col("y.band") &&
          col("x.band_key") === col("y.band_key") &&
          col("x.id") < col("y.id"))
      .select(col("x.id").as("id_a"), col("y.id").as("id_b"))
      .dropDuplicates("id_a", "id_b")

    verifyJaccard(candidates, docs, threshold)
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

    // cached: the shingle kernel would otherwise re-run for the inverted
    // index, the frequency count, and both verification joins
    val docs = df.select(col(idCol).as("id"),
      shingleSet(col(textCol), shingleN).as("sh"))
      .filter(size(col("sh")) > 0)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    var inverted = docs.select(col("id"), size(col("sh")).as("n"),
      explode(col("sh")).as("shingle"))
    maxShingleDf.foreach { cap =>
      val dfCount = Window.partitionBy("shingle")
      inverted = inverted
        .withColumn("__df", count(lit(1)).over(dfCount))
        .filter(col("__df") <= cap).drop("__df")
    }

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
      .filter(col("__rk") <= col("n") - ceil(lit(threshold) * col("n")) + 1)
      // a globally-unique shingle cannot be shared, so it generates no
      // candidates — drop AFTER ranking (order must include it) for a
      // typically large, still-exact cut
      .filter(col("__freq") > 1)
      .select("id", "shingle")

    val candidates = prefix.as("x")
      .join(prefix.as("y"),
        col("x.shingle") === col("y.shingle") && col("x.id") < col("y.id"))
      .select(col("x.id").as("id_a"), col("y.id").as("id_b"))
      .dropDuplicates("id_a", "id_b")

    verifyJaccard(candidates, docs, threshold)
  }

  /** 64-bit SimHash from whitespace tokens: per-bit vote of each token's
    * xxhash64 (seed 42), bit set iff the vote is positive. Native kernel
    * (TextKernelExpressions.SimHash) — one compiled pass per document. */
  def simhash64(text: Column): Column =
    graft.functions.TextKernelExpressions.simhash(text)

  /** Near-dup pairs by SimHash Hamming distance <= maxDist, found by the
    * pigeonhole trick: split the 64-bit signature into `chunks` bands —
    * any pair within maxDist (< chunks) collides on at least one intact
    * band, so candidate generation is again an equi-join on (band,
    * 16-bit chunk), never a cartesian. */
  def simhashPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      maxDist: Int = 3,
      chunks: Int = 4): DataFrame = {
    val sigs = df.select(col(idCol).as("id"),
      simhash64(col(textCol)).as("sig"))

    val width = 64 / chunks
    val banded = sigs.select(col("id"), col("sig"),
      posexplode(transform(sequence(lit(0), lit(chunks - 1)),
        c => call_function("shiftright", col("sig"), c * width)
          .bitwiseAND(lit((1L << width) - 1)))))
      .withColumnRenamed("pos", "band")
      .withColumnRenamed("col", "chunk")

    val a = banded.select(col("band"), col("chunk"),
      col("id").as("id_a"), col("sig").as("sig_a"))
    val b = banded.select(col("band"), col("chunk"),
      col("id").as("id_b"), col("sig").as("sig_b"))

    a.join(b, Seq("band", "chunk"))
      .filter(col("id_a") < col("id_b"))
      .dropDuplicates("id_a", "id_b")
      .withColumn("hamming", bit_count(col("sig_a").bitwiseXOR(col("sig_b"))))
      .filter(col("hamming") <= maxDist)
      .select("id_a", "id_b", "hamming")
  }
}
