package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import graft.query.FilterDsl

/** Key-value result store — the KeyValueStoreBackendBase surface
  * (nexus/backends/store.py:11-81: exists / insert / update / delete /
  * get / filter_record / count) re-expressed over Spark's columnar sinks.
  *
  * A "store" is a directory of parquet per schema name (swap the format
  * string for "delta"/"iceberg"/"jdbc" in production — the API is
  * format-agnostic). Point reads and filter reads compile the same
  * Django-style DSL as ResultSet (§2.3) into pushdown predicates, so a
  * `filterRecords` over 100 TB reads only the row groups the predicate
  * admits. Upsert is copy-on-write merge by key — the parquet analog of
  * the reference's per-key UPDATE; swap to MERGE INTO on a table format
  * for transactional upserts at scale.
  */
final class ResultStore(spark: SparkSession, root: String) {

  private def path(schema: String) = s"$root/$schema"

  private def exists0(schema: String): Boolean =
    new java.io.File(path(schema)).exists()

  def insert(schema: String, df: DataFrame): Unit =
    df.write.mode(SaveMode.Append).parquet(path(schema))

  def overwrite(schema: String, df: DataFrame): Unit =
    df.write.mode(SaveMode.Overwrite).parquet(path(schema))

  def read(schema: String): DataFrame = spark.read.parquet(path(schema))

  def exists(schema: String, keyCol: String, key: Any): Boolean =
    exists0(schema) && !read(schema).filter(col(keyCol) === lit(key)).isEmpty

  /** Exactly-one read (KeyError / MultiValueError semantics as in
    * ResultSet.get, nexus/result.py:247-259). */
  def get(schema: String, filters: (String, Any)*): org.apache.spark.sql.Row = {
    val hits = filterRecords(schema, filters: _*).take(2)
    if (hits.isEmpty)
      throw new NoSuchElementException(s"No record matching $filters")
    if (hits.length > 1)
      throw graft.core.MultiValueError(s"More than one record for $filters")
    hits.head
  }

  /** Filter-DSL read; predicates land in PushedFilters on the scan. */
  def filterRecords(schema: String, filters: (String, Any)*): DataFrame = {
    val df = read(schema)
    df.filter(FilterDsl.compileAll(df, filters))
  }

  def count(schema: String): Long = read(schema).count()

  /** Copy-on-write upsert by key: new rows win over stored rows. */
  def upsert(schema: String, df: DataFrame, keyCol: String): Unit = {
    val merged =
      if (!exists0(schema)) df
      else read(schema).join(df.select(keyCol), Seq(keyCol), "left_anti")
        .unionByName(df, allowMissingColumns = true)
    // write via temp dir then swap, since the source is also the sink
    val tmp = path(schema) + "__tmp"
    merged.write.mode(SaveMode.Overwrite).parquet(tmp)
    val dst = new java.io.File(path(schema))
    if (dst.exists()) {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm)
        f.delete()
      }
      rm(dst)
    }
    new java.io.File(tmp).renameTo(dst)
  }

  /** MERGE INTO semantics over the copy-on-write store (the Delta/
    * Iceberg `MERGE` shape, which this parquet store emulates — swap the
    * body for a real `MERGE INTO` when a transactional format is on the
    * classpath): source rows matching by key UPDATE the stored row
    * (source wins), optionally DELETE it instead when `deleteWhen`
    * holds on the source row, and non-matching source rows INSERT.
    * One anti-join + one filtered union, single rewrite. */
  def merge(
      schema: String,
      source: DataFrame,
      keyCol: String,
      deleteWhen: Option[org.apache.spark.sql.Column] = None): Unit = {
    if (!exists0(schema)) {
      val insert = deleteWhen.map(c => source.filter(!c)).getOrElse(source)
      overwrite(schema, insert)
      return
    }
    // stored rows keyed by ANY source row drop out (anti-join); the
    // update/insert rows re-enter unless delete-marked — so a matched-
    // and-marked key disappears entirely, exactly MERGE's DELETE arm
    val stored = read(schema)
    val survivors = stored.join(source.select(keyCol), Seq(keyCol), "left_anti")
    val incoming = deleteWhen.map(c => source.filter(!c)).getOrElse(source)
    val merged = survivors.unionByName(incoming, allowMissingColumns = true)
    val tmp = path(schema) + "__tmp"
    merged.write.mode(SaveMode.Overwrite).parquet(tmp)
    val dst = new java.io.File(path(schema))
    if (dst.exists()) {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm)
        f.delete()
      }
      rm(dst)
    }
    new java.io.File(tmp).renameTo(dst)
  }

  /** Delete by predicate (copy-on-write). */
  def delete(schema: String, filters: (String, Any)*): Unit = {
    val df = read(schema)
    val keep = df.filter(!FilterDsl.compileAll(df, filters))
    val tmp = path(schema) + "__tmp"
    keep.write.mode(SaveMode.Overwrite).parquet(tmp)
    val dst = new java.io.File(path(schema))
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rm)
      f.delete()
    }
    rm(dst)
    new java.io.File(tmp).renameTo(dst)
  }

  /** Streaming upsert sink: foreachBatch → upsert per micro-batch
    * (the reference's store-backed pipeline persistence,
    * nexus/mixins/backend.py:151-174, under streaming). */
  def streamingUpsert(
      stream: DataFrame, schema: String, keyCol: String,
      checkpoint: String): org.apache.spark.sql.streaming.StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        upsert(schema, batch, keyCol)
      }
      .start()

  /** Streaming MERGE sink: each micro-batch applies the full
    * update/insert/delete arms — a change-data-capture stream (upserts
    * + tombstones) lands in the store with one foreachBatch. */
  def streamingMerge(
      stream: DataFrame, schema: String, keyCol: String,
      checkpoint: String,
      deleteWhen: Option[org.apache.spark.sql.Column] = None)
      : org.apache.spark.sql.streaming.StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        merge(schema, batch, keyCol, deleteWhen)
      }
      .start()
}
