package graft.query

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.core.{EventResult, MultiValueError}

/** The queryable result collection (nexus/result.py:162-467), Spark-native.
  *
  * Holds the driver-side EventResult records (meta + lazy content
  * DataFrame). Set semantics are by result id: `add` unions/merges by id
  * (nexus/result.py:210-221), `discard` removes by id (result.py:228-238).
  *
  * Two query surfaces:
  *   - driver-side: `filterMeta`, `get`, `first` over the small meta
  *     records (one per event execution);
  *   - Spark-side: `content` (the union of all content DataFrames) and
  *     `where(...)` applying the Django-style filter DSL as Catalyst
  *     predicates — this is the path that scales, and it stays lazy.
  */
final class ResultSet private (private val items: Vector[EventResult]) {

  def results: Vector[EventResult] = items
  def size: Int = items.size
  def isEmpty: Boolean = items.isEmpty
  def nonEmpty: Boolean = items.nonEmpty
  def ids: Vector[String] = items.map(_.meta.id)
  def containsId(id: String): Boolean = items.exists(_.meta.id == id)

  /** Union by id; right-hand entries win on collision (dict.update). */
  def add(other: ResultSet): ResultSet = {
    val merged = scala.collection.mutable.LinkedHashMap.empty[String, EventResult]
    items.foreach(r => merged(r.meta.id) = r)
    other.items.foreach(r => merged(r.meta.id) = r)
    new ResultSet(merged.values.toVector)
  }

  def add(r: EventResult): ResultSet = add(new ResultSet(Vector(r)))

  def discard(id: String): ResultSet =
    new ResultSet(items.filterNot(_.meta.id == id))

  def discard(other: ResultSet): ResultSet = {
    val gone = other.ids.toSet
    new ResultSet(items.filterNot(r => gone.contains(r.meta.id)))
  }

  def copy(): ResultSet = new ResultSet(items)

  /** Driver-side filter over meta fields (id fast-path included,
    * nexus/result.py:286-291). */
  def filterMeta(p: EventResult => Boolean): ResultSet =
    new ResultSet(items.filter(p))

  def filterByEvent(eventName: String): ResultSet =
    filterMeta(_.meta.eventName.equalsIgnoreCase(eventName))

  def first(): Option[EventResult] = items.headOption

  /** Exactly-one semantics (nexus/result.py:247-259). */
  def get(p: EventResult => Boolean): EventResult = {
    val hits = items.filter(p)
    if (hits.isEmpty) throw new NoSuchElementException("No result found matching filters")
    if (hits.size > 1)
      throw MultiValueError(s"More than one result found: ${hits.size}!=1")
    hits.head
  }

  /** Union of all successful content DataFrames, schema-aligned with
    * unionByName(allowMissingColumns) — the reference's bag-union merge of
    * parallel branches (nexus/result.py:210-221) without a join. */
  def content: Option[DataFrame] = {
    val dfs = items.filterNot(_.meta.error).flatMap(_.content)
    dfs.reduceOption((a, b) => a.unionByName(b, allowMissingColumns = true))
  }

  /** All content (error payloads included), each row tagged with its
    * event_name / task_id / error meta columns. */
  def dataFrame: Option[DataFrame] = {
    val dfs = items.flatMap { r =>
      r.content.map {
        _.withColumn("__event_name", lit(r.meta.eventName))
          .withColumn("__task_id", lit(r.meta.taskId))
          .withColumn("__error", lit(r.meta.error))
      }
    }
    dfs.reduceOption((a, b) => a.unionByName(b, allowMissingColumns = true))
  }

  /** Spark-side filter DSL over the merged content: the scaling analog of
    * ResultSet.filter(**kwargs). */
  def where(filters: (String, Any)*): Option[DataFrame] =
    content.map(df => df.filter(FilterDsl.compileAll(df, filters)))
}

object ResultSet {
  val empty: ResultSet = new ResultSet(Vector.empty)
  def apply(rs: Seq[EventResult]): ResultSet = {
    // last-in wins per id, preserving first-seen insertion order
    val m = scala.collection.mutable.LinkedHashMap.empty[String, EventResult]
    rs.foreach(r => m(r.meta.id) = r)
    new ResultSet(m.values.toVector)
  }

  /** DataFrame-native filter entry point: apply the DSL to any DataFrame. */
  def filterDf(df: DataFrame, filters: (String, Any)*): DataFrame =
    df.filter(FilterDsl.compileAll(df, filters))

  /** DataFrame analog of `ResultSet.add`: union by id, RIGHT side wins
    * on collisions (dict.update semantics, nexus/result.py:210-221).
    * One anti-join + union — the winning side never passes through a
    * dedup shuffle. */
  def unionById(left: DataFrame, right: DataFrame,
      idCols: Seq[String]): DataFrame =
    left.join(right.select(idCols.map(col): _*), idCols, "left_anti")
      .unionByName(right)

  /** DataFrame analog of `ResultSet.discard(other)`: drop rows whose id
    * appears in `gone` (nexus/result.py:228-238). */
  def discardById(df: DataFrame, gone: DataFrame,
      idCols: Seq[String]): DataFrame =
    df.join(gone.select(idCols.map(col): _*), idCols, "left_anti")

  def filterColumn(df: DataFrame, filters: (String, Any)*): Column =
    FilterDsl.compileAll(df, filters)
}
