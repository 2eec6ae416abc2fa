package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Count-min sketch built as a distributed aggregate, probed as a
  * folded literal — the "sketch-prefilter, exact-verify" pattern for
  * frequency queries over keys whose distinct cardinality is far too
  * large to count exactly up front. The reference counts events by
  * routing each through a handler (`nexus/task.py:1050-1165`, one
  * visit per event); at 100 TB the set-oriented equivalent of "which
  * keys are hot?" must not shuffle every key: the sketch pass reduces
  * the full scan to `depth × width` cells with map-side partials, and
  * the exact pass then shuffles ONLY rows whose key might clear the
  * threshold.
  *
  * Guarantee: a count-min estimate NEVER underestimates (every bucket a
  * key hashes to counts at least all of that key's occurrences), so
  * filtering on `estimate >= T` keeps a superset of the true heavy
  * hitters and the exact count behind it returns EXACTLY the keys with
  * `count >= T` — bit-identical to the naive full groupBy, at a
  * fraction of the shuffle. False positives cost shuffle bytes, never
  * correctness (the same contract as [[BloomJoin]]).
  *
  * Driver state is the sketch itself: `depth*width` longs (4×65536 =
  * 2 MiB at the defaults) — bounded by the requested sketch size, never
  * by data volume. Width trades driver memory against prefilter
  * selectivity: collision noise adds ~`rows/width` per cell (before the
  * min over seeds), so size `width >> rows/threshold` to make the
  * prefilter bite.
  */
object Sketch {

  /** Bucket index of `key` under seed `i`: xxhash64 with the seed mixed
    * in as an extra hashed column, folded mod width (pmod: xxhash64 is
    * signed). The SAME expression builds and probes the sketch — any
    * drift between the two would break the no-underestimate guarantee.
    */
  private def bucket(key: Column, seed: Int, width: Int): Column =
    pmod(xxhash64(key, lit(seed)), lit(width.toLong))

  /** One-pass distributed build: each row contributes one increment per
    * seed (a `depth`-way posexplode), aggregated to `(seed, bucket)`
    * cells with map-side partial counts — the shuffle carries at most
    * `depth*width` cells per map partition regardless of row count.
    * Returns the dense `depth*width` table (seed-major), collected to
    * the driver: cell `(i, b)` lives at `i*width + b`.
    */
  def cmsBuild(df: DataFrame, key: Column, depth: Int, width: Int): Array[Long] = {
    require(depth >= 1 && width >= 2, s"bad sketch shape ${depth}x$width")
    val buckets = array((0 until depth).map(i => bucket(key, i, width)): _*)
    val cells = df
      .select(posexplode(buckets).as(Seq("seed", "bucket")))
      .groupBy("seed", "bucket")
      .agg(count(lit(1)).as("n"))
      .collect()
    val table = new Array[Long](depth * width)
    cells.foreach { r =>
      table(r.getInt(0) * width + r.getLong(1).toInt) = r.getLong(2)
    }
    table
  }

  /** Estimate expression over a previously-built table: min over seeds
    * of the key's cell counts. The table folds into the plan as ONE
    * array literal (O(1) `element_at` lookups, whole-stage codegen), so
    * probing costs `depth` hashes per row with no join and no shuffle —
    * usable as a pre-exchange filter anywhere a Column fits.
    */
  def cmsEstimate(table: Array[Long], key: Column, depth: Int, width: Int): Column = {
    require(table.length == depth * width,
      s"table length ${table.length} != ${depth}x$width")
    val litTable = typedlit(table)
    (0 until depth)
      .map(i => element_at(litTable,
        (bucket(key, i, width) + lit(i.toLong * width) + 1).cast("int")))
      .reduce(least(_, _))
  }

  /** Exact heavy hitters `count(keyCol) >= threshold`, sketch-assisted:
    * pass 1 builds the sketch (full scan, tiny shuffle), pass 2 filters
    * rows by the folded estimate BEFORE the exact groupBy, and the
    * final HAVING keeps exactly the true heavy hitters. Output:
    * `(keyCol, cnt)` ordered by key.
    */
  def heavyHitters(
      df: DataFrame,
      keyCol: String,
      threshold: Long,
      depth: Int = 4,
      width: Int = 1 << 16): DataFrame = {
    val table = cmsBuild(df, col(keyCol), depth, width)
    df.filter(cmsEstimate(table, col(keyCol), depth, width) >= threshold)
      .groupBy(keyCol)
      .agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= threshold)
      .orderBy(keyCol)
  }
}
