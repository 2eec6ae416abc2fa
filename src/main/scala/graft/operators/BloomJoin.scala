package graft.operators

import org.apache.spark.sql.{Column, DataFrame, GraftSqlBridge}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.functions._

/** Bloom-prefiltered join: build a Bloom filter over the build side's
  * join keys as a DISTRIBUTED aggregate (partials merged by OR — the
  * same `BloomFilterAggregate` Spark's own runtime row-level filtering
  * injects, `InjectRuntimeFilter`), then probe-filter the stream side
  * BEFORE its shuffle. False positives are harmless — the exact join
  * still runs — so the result is bit-identical to the plain join while
  * the shuffle moves only rows that might match.
  *
  * This is the explicit, composable form of what AQE's runtime filter
  * does opportunistically: at 100 TB a selective dimension predicate
  * (say 1% of orders) means the fact-side shuffle drops ~99% of its
  * bytes, which is usually the whole cost of the join. The filter is a
  * byte-array literal folded into codegen (`might_contain` on
  * xxhash64), so the probe costs one hash per row, pre-exchange.
  *
  * Driver state is the serialized Bloom filter itself (numBits/8 bytes,
  * default 1 MiB for 1M items at 3% fpp) — bounded by the requested
  * sketch size, never by data volume.
  */
object BloomJoin {

  /** Serialized Bloom filter over `keyCol` (hashed with xxhash64). */
  private def buildFilterBytes(
      build: DataFrame,
      keyCol: String,
      expectedItems: Long,
      numBits: Long): Array[Byte] = {
    val hashed = xxhash64(col(keyCol))
    val agg = new BloomFilterAggregate(
      GraftSqlBridge.toExpression(hashed),
      Literal(expectedItems), Literal(numBits))
      .toAggregateExpression()
    val row = build
      .select(GraftSqlBridge.toColumn(agg).as("bf"))
      .head()
    row.getAs[Array[Byte]]("bf")
  }

  /** Predicate `might_contain(bloom(build.keyCol), xxhash64(probeKey))`
    * usable as a pre-shuffle filter on the probe side. */
  def mightContain(
      build: DataFrame,
      buildKey: String,
      probeKey: Column,
      expectedItems: Long = 1000000L,
      numBits: Long = 8388608L): Column = {
    val bytes = buildFilterBytes(build, buildKey, expectedItems, numBits)
    GraftSqlBridge.toColumn(BloomFilterMightContain(
      Literal(bytes),
      GraftSqlBridge.toExpression(xxhash64(probeKey))))
  }

  /** Inner join with the probe side Bloom-prefiltered on the join key.
    * Exactly equal to `probe.join(build, probe(probeKey) ===
    * build(buildKey))` — the Bloom pass only thins the probe shuffle.
    */
  def join(
      probe: DataFrame,
      build: DataFrame,
      probeKey: String,
      buildKey: String,
      expectedItems: Long = 1000000L,
      numBits: Long = 8388608L): DataFrame = {
    val pred = mightContain(build, buildKey, col(probeKey),
      expectedItems, numBits)
    probe.filter(pred)
      .join(build, col(probeKey) === col(buildKey))
  }
}
