package graft.sources

import java.sql.DriverManager
import java.util.Properties

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import graft.query.FilterDsl

/** JDBC-backed key-value result store — the external-database member of
  * the KeyValueStoreBackendBase family (nexus/backends/store.py:11-81;
  * SQL semantics mirrored from nexus/backends/stores/sqlite_store.py:
  * insert/update/delete/get/filter_record/count plus the Django-style
  * `field__op` filter compiler at sqlite_store.py:245-313).
  *
  * Reads go through `spark.read.jdbc`, so FilterDsl predicates compile
  * into the JDBC source's pushed filters and execute INSIDE the
  * database (the scan's `PushedFilters` — asserted in SourcesSpec);
  * `readPartitioned` shards a large table across executors on a numeric
  * column, which is the scale path for bulk loads. Writes use Spark's
  * JDBC sink; upsert/delete are read-merge-swap via a temp table and a
  * transactional-enough DROP+RENAME (swap to a MERGE statement on
  * engines that support it — same caveat as the parquet store's
  * copy-on-write).
  *
  * Tested against embedded Derby (the only JDBC engine in the image);
  * `renameSql` is a dialect hook because table-rename DDL is the one
  * non-portable statement this class needs (Derby/MySQL
  * `RENAME TABLE a TO b`, Postgres `ALTER TABLE a RENAME TO b`).
  */
final class JdbcResultStore(
    spark: SparkSession,
    url: String,
    connProps: Map[String, String] = Map.empty,
    writeOptions: Map[String, String] = Map.empty,
    renameSql: (String, String) => String =
      (a, b) => s"RENAME TABLE $a TO $b") {

  private def jprops: Properties = {
    val p = new Properties()
    connProps.foreach { case (k, v) => p.setProperty(k, v) }
    p
  }

  private def withConn[A](f: java.sql.Connection => A): A = {
    val c = DriverManager.getConnection(url, jprops)
    try f(c) finally c.close()
  }

  /** Case-insensitive table existence via JDBC metadata (Derby stores
    * unquoted identifiers upper-case; Postgres lower-case). */
  def tableExists(schema: String): Boolean = withConn { c =>
    val md = c.getMetaData
    Seq(schema, schema.toUpperCase, schema.toLowerCase).distinct.exists { n =>
      val rs = md.getTables(null, null, n, null)
      try rs.next() finally rs.close()
    }
  }

  def insert(schema: String, df: DataFrame): Unit =
    df.write.mode(SaveMode.Append).options(writeOptions)
      .jdbc(url, schema, jprops)

  def overwrite(schema: String, df: DataFrame): Unit =
    df.write.mode(SaveMode.Overwrite).options(writeOptions)
      .jdbc(url, schema, jprops)

  def read(schema: String): DataFrame = spark.read.jdbc(url, schema, jprops)

  /** Parallel read sharded on a numeric/date column — one executor per
    * stride. This, not a single-connection scan, is how a large table
    * enters the cluster. */
  def readPartitioned(
      schema: String, partitionCol: String,
      lower: Long, upper: Long, numPartitions: Int): DataFrame =
    spark.read.jdbc(url, schema, partitionCol, lower, upper,
      numPartitions, jprops)

  def exists(schema: String, keyCol: String, key: Any): Boolean =
    tableExists(schema) && !read(schema).filter(col(keyCol) === lit(key)).isEmpty

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

  /** Filter-DSL read; predicates push into the database's WHERE. */
  def filterRecords(schema: String, filters: (String, Any)*): DataFrame = {
    val df = read(schema)
    df.filter(FilterDsl.compileAll(df, filters))
  }

  def count(schema: String): Long = read(schema).count()

  /** Upsert by key: new rows win over stored rows. Read-merge into a
    * temp table, then swap via DROP + RENAME so the source table is
    * never read and truncated in the same plan. */
  def upsert(schema: String, df: DataFrame, keyCol: String): Unit = {
    if (!tableExists(schema)) { insert(schema, df); return }
    val merged = read(schema)
      .join(df.select(keyCol), Seq(keyCol), "left_anti")
      .unionByName(df, allowMissingColumns = true)
    swapIn(schema, merged)
  }

  /** Delete by predicate (read-filter-swap). */
  def delete(schema: String, filters: (String, Any)*): Unit = {
    val df = read(schema)
    swapIn(schema, df.filter(!FilterDsl.compileAll(df, filters)))
  }

  private def swapIn(schema: String, rows: DataFrame): Unit = {
    val tmp = schema + "__tmp"
    rows.write.mode(SaveMode.Overwrite).options(writeOptions)
      .jdbc(url, tmp, jprops)
    withConn { c =>
      val st = c.createStatement()
      try {
        st.execute(s"DROP TABLE $schema")
        st.execute(renameSql(tmp, schema))
      } finally st.close()
    }
  }

  /** Streaming upsert sink: foreachBatch → upsert per micro-batch. */
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
}
