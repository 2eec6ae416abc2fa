package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus snapshot lifecycle: diff two versions of a table by content
  * checksum — the primitive behind incremental corpus refresh (recrawl
  * vs last snapshot: process only what changed, re-run dedup/curation
  * incrementally instead of from scratch).
  *
  * The reference (`nexus/`) has no snapshot machinery; this is a
  * training-data-pipeline extension in the spirit of its result-store
  * versioning (cf. graft.sources.ResultStore's versioned-dir commits,
  * which give you the two snapshots to diff).
  */
object Snapshot {

  /** Row-level diff of two corpus snapshots keyed by `idCol`: emits one
    * row per id whose membership or content changed — `added` (id only
    * in `newDf`), `removed` (only in `oldDf`), `changed` (both, but the
    * content checksum differs). Unchanged ids are filtered out, so the
    * output is the incremental work-list, not a full copy.
    *
    * Scale shape: each side is projected to thin (id, checksum) rows
    * BEFORE the full-outer join, so the shuffle carries two columns per
    * row regardless of document width — at 100 TB the join moves ids
    * and 16-byte hashes, not text. The checksum is computed map-side in
    * the scan projection (codegen'd, no extra pass). One shuffle per
    * side, hash-join on id; with both snapshots bucketed by id (the
    * ResultStore layout) the exchange disappears entirely.
    *
    * `checksum` is any deterministic Column over the content columns —
    * xxhash64(...) for production (fastest, 8 bytes), md5(concat_ws(...))
    * when the result must be replayable by an external engine (the
    * dq4 SimHash fast-vs-oracle discipline, Dedup.scala:606).
    */
  def diff(
      oldDf: DataFrame,
      newDf: DataFrame,
      idCol: String,
      checksum: Column): DataFrame = {
    // membership comes from explicit per-side presence flags, NOT from
    // checksum nullability — a checksum over NULL content is itself NULL
    // (e.g. md5 of a NULL text) and must not masquerade as absence; the
    // content compare is null-safe for the same reason (NULL content on
    // both sides is unchanged, NULL vs non-NULL is changed)
    val o = oldDf.select(col(idCol), checksum.as("__old_ck"),
      lit(true).as("__in_old"))
    val n = newDf.select(col(idCol), checksum.as("__new_ck"),
      lit(true).as("__in_new"))
    o.join(n, Seq(idCol), "full_outer")
      .select(col(idCol),
        when(col("__in_old").isNull, lit("added"))
          .when(col("__in_new").isNull, lit("removed"))
          .when(!(col("__old_ck") <=> col("__new_ck")), lit("changed"))
          .otherwise(lit("unchanged")).as("status"))
      .filter(col("status") =!= "unchanged")
  }

  /** Incremental recompute of a deterministic per-row derivation when a
    * snapshot changes: keep `prior` results for unchanged rows, drop
    * removed/changed ones, and run `compute` only over the added/changed
    * rows of `newDf`. For any deterministic row-local `compute`, the
    * result equals `compute(newDf)` run from scratch — the invariant
    * the gate oracles (q34) — while touching only the delta.
    *
    * Scale shape: [[diff]]'s thin full-outer join finds the delta; the
    * delta id-sets BROADCAST into an anti-join (prune prior) and a
    * semi-join (select redo rows), so neither the prior results nor the
    * new corpus shuffles — the whole refresh is one thin diff plus
    * map-side work. The broadcast assumes the delta is small relative
    * to the corpus, which is the regime incremental refresh exists for;
    * when most of the corpus changed, run `compute(newDf)` directly. */
  def incrementalRefresh(
      prior: DataFrame,
      oldDf: DataFrame,
      newDf: DataFrame,
      idCol: String,
      checksum: Column)(compute: DataFrame => DataFrame): DataFrame = {
    val delta = diff(oldDf, newDf, idCol, checksum)
      .transform(Lineage.cutLocal) // feeds both id-sets below; diff runs once
    val stale = delta.filter(col("status") =!= "added").select(idCol)
    val redo = delta.filter(col("status") =!= "removed").select(idCol)
    prior.join(broadcast(stale), Seq(idCol), "left_anti")
      .unionByName(compute(newDf.join(broadcast(redo), Seq(idCol),
        "left_semi")))
  }
}
