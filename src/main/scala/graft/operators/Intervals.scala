package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Interval-overlap join — pairs `(l, r)` whose `[start, end]` ranges
  * intersect — an operator Spark has no native plan for (a raw
  * `l.start <= r.end AND r.start <= l.end` condition degenerates to
  * BroadcastNestedLoop/cartesian). The standard scale-out formulation
  * decomposes time into fixed-width grid buckets:
  *
  *   1. each interval replicates to every bucket its span touches
  *      (`sequence(start div W, end div W)` + explode — replication
  *      factor 1 + len/W, bounded when intervals are short relative to
  *      the bucket width);
  *   2. the join becomes an EQUI-join on the bucket id, so it hash-
  *      partitions and AQE handles it like any other shuffle join;
  *   3. a pair that shares several buckets would duplicate, so each
  *      pair is kept only in the bucket containing the OVERLAP START
  *      (`greatest(l.start, r.start) div W == bucket`) — dedup by
  *      construction, no `distinct` shuffle afterwards.
  *
  * This is the interval-join shape streaming engines use for
  * stream-stream joins (Flink's interval join buckets by time the same
  * way); cf. reference `nexus/task.py` conditional event routing, which
  * has no set-oriented analogue. Pick `bucketUs` near the typical
  * interval length: too small inflates replication, too large piles
  * intervals into one bucket (a hot-hour bucket is the skew knob — at
  * 100 TB salt the bucket id with a shard suffix on the dense side, the
  * same treatment q22 applies to its hot keys).
  *
  * Columns: both inputs need `(startCol, endCol)` as µs-epoch longs;
  * every other column rides along prefixed `l_` / `r_`. Output adds
  * `overlap_us = min(ends) - max(starts)` (≥ 0; touching endpoints
  * count as overlap, matching the closed-interval SQL predicate).
  */
object Intervals {

  def overlapJoin(
      left: DataFrame,
      right: DataFrame,
      startCol: String,
      endCol: String,
      bucketUs: Long = 3600L * 1000000L): DataFrame = {
    require(bucketUs > 0, "bucketUs must be positive")

    def explodeBuckets(df: DataFrame, prefix: String): DataFrame = {
      val renamed = df.columns.foldLeft(df)((d, c) =>
        d.withColumnRenamed(c, s"$prefix$c"))
      // integer `div`, not `/`: Spark's `/` is double division, and a
      // double quotient at 10^15 µs epochs can land on the wrong side
      // of a bucket boundary
      renamed.withColumn("__bucket",
        explode(sequence(
          expr(s"$prefix$startCol div ${bucketUs}L"),
          expr(s"$prefix$endCol div ${bucketUs}L"))))
    }

    val l = explodeBuckets(left, "l_")
    val r = explodeBuckets(right, "r_")
    val ls = col(s"l_$startCol"); val le = col(s"l_$endCol")
    val rs = col(s"r_$startCol"); val re = col(s"r_$endCol")

    l.join(r, Seq("__bucket"))
      .filter(ls <= re && rs <= le &&
        // report each pair exactly once: in the overlap-start bucket
        expr(s"greatest(l_$startCol, r_$startCol) div ${bucketUs}L") ===
          col("__bucket"))
      .drop("__bucket")
      .withColumn("overlap_us", least(le, re) - greatest(ls, rs))
  }
}
