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
  * column, which is the scale path for bulk loads.
  *
  * Upsert is a real `MERGE INTO` on dialects that support it (Derby
  * 10.11+, Postgres 15+, Oracle, SQL Server, DB2, H2 — auto-detected
  * from the URL, overridable via `useMerge`): the source lands in a
  * staging table, one atomic MERGE applies the update/insert arms to
  * the live table — which is never dropped, so concurrent readers and
  * crashes both see a complete table — and the staging table is
  * dropped. On other dialects it falls back to read-merge-swap via a
  * temp table, with DROP + RENAME executed in a single transaction
  * where the engine allows transactional DDL (Derby, Postgres); engines
  * that auto-commit DDL (MySQL) keep a small non-atomic window there —
  * documented, and exactly why the MERGE path is the default.
  *
  * Table names are validated against `[A-Za-z_][A-Za-z0-9_]*` before
  * entering any DDL string (no identifier injection); column names in
  * generated MERGE SQL are double-quoted with the DataFrame's exact
  * case, matching how Spark's JDBC writer creates them.
  *
  * Tested against embedded Derby (the only JDBC engine in the image);
  * `renameSql` is a dialect hook because table-rename DDL is the one
  * non-portable statement the fallback needs (Derby/MySQL
  * `RENAME TABLE a TO b`, Postgres `ALTER TABLE a RENAME TO b`).
  */
final class JdbcResultStore(
    spark: SparkSession,
    url: String,
    connProps: Map[String, String] = Map.empty,
    writeOptions: Map[String, String] = Map.empty,
    renameSql: (String, String) => String =
      (a, b) => s"RENAME TABLE $a TO $b",
    useMerge: Option[Boolean] = None) {

  private val mergeEnabled =
    useMerge.getOrElse(JdbcResultStore.dialectSupportsMerge(url))

  private def checkIdent(name: String): String = {
    require(name.matches("[A-Za-z_][A-Za-z0-9_]*"),
      s"illegal table identifier: '$name'")
    name
  }

  /** Write options with the `createTableColumnTypes` hint pruned to the
    * columns the frame actually carries — a narrowing batch (or a
    * staging table for one) must not fail because the store-wide hint
    * names a column absent from this particular write. */
  private def optionsFor(df: DataFrame): Map[String, String] =
    writeOptions.get("createTableColumnTypes") match {
      case Some(spec) =>
        val cols = df.columns.map(_.toLowerCase).toSet
        // split on TOP-LEVEL commas only — "amount DECIMAL(18,6)" is one
        // entry, not two
        val entries = {
          val out = scala.collection.mutable.Buffer.empty[String]
          val sb = new StringBuilder
          var depth = 0
          spec.foreach {
            case '(' => depth += 1; sb.append('(')
            case ')' => depth -= 1; sb.append(')')
            case ',' if depth == 0 => out += sb.toString.trim; sb.clear()
            case c => sb.append(c)
          }
          if (sb.nonEmpty) out += sb.toString.trim
          out.toSeq
        }
        val kept = entries
          .filter(e => cols.contains(e.split("\\s+")(0).toLowerCase))
        if (kept.isEmpty) writeOptions - "createTableColumnTypes"
        else writeOptions + ("createTableColumnTypes" -> kept.mkString(", "))
      case None => writeOptions
    }

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
    df.write.mode(SaveMode.Append).options(optionsFor(df))
      .jdbc(url, checkIdent(schema), jprops)

  def overwrite(schema: String, df: DataFrame): Unit =
    df.write.mode(SaveMode.Overwrite).options(optionsFor(df))
      .jdbc(url, checkIdent(schema), jprops)

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

  /** Upsert by key: new rows win over stored rows. MERGE INTO where the
    * dialect supports it; read-merge-swap fallback otherwise. The MERGE
    * path requires the DataFrame's columns to be a subset of the live
    * table's — schema WIDENING (new columns) needs a table rewrite, so
    * it routes to the swap fallback automatically, as does a dialect
    * whose server rejects MERGE with a syntax error at runtime (e.g.
    * Postgres < 15 behind a jdbc:postgresql URL — detection is by URL
    * prefix, the server's word is final).
    *
    * Within-batch key conflicts resolve to ONE row per key on every
    * dialect, chosen deterministically by row-content hash — a
    * DataFrame carries no row order, so "last event wins" is not
    * expressible here; ordered CDC should reduce on its sequence
    * column (max_by) before calling upsert. */
  def upsert(schema: String, df: DataFrame, keyCol: String): Unit = {
    checkIdent(schema)
    // a keyed upsert stores ONE row per key on every dialect and on
    // the very first batch: dedup within-batch conflicts up front
    // (deterministically, by content hash — DataFrames carry no row
    // order, so "last event wins" needs a sequence column reduced by
    // the CALLER; see scaladoc) so the MERGE and swap paths agree
    // instead of MERGE raising a cardinality violation while the
    // fallback stored both rows
    val deduped = dedupByKey(df, keyCol)
    if (!tableExists(schema)) { insert(schema, deduped); return }
    if (mergeEnabled && !mergeRuntimeDisabled) {
      val widens = {
        val existing = read(schema).columns.map(_.toLowerCase).toSet
        df.columns.exists(c => !existing.contains(c.toLowerCase))
      }
      if (!widens) {
        try { mergeUpsert(schema, deduped, keyCol); return }
        catch {
          // SQLState 42xxx = syntax/access violation: the SERVER has no
          // MERGE (e.g. Postgres < 15 behind a jdbc:postgresql URL) —
          // fall back for good. Anything else (deadlock, timeout,
          // connection drop) is transient and must surface, not
          // silently downgrade every future upsert to the swap path.
          case e: java.sql.SQLException
              if Option(e.getSQLState).exists(_.startsWith("42")) =>
            mergeRuntimeDisabled = true
        }
      }
    }
    swapIn(schema, mergeColumns(read(schema), deduped, keyCol))
  }

  /** MERGE column semantics for the swap fallback: matched rows take
    * the SOURCE value for columns the source carries and KEEP the
    * stored value otherwise (a narrowing batch must not null-out
    * untouched columns — MERGE's UPDATE arm never does); source-only
    * columns widen the table with NULL for unmatched stored rows. The
    * result is identical to what the MERGE path stores, so the dialect
    * choice is invisible in the data. */
  private def mergeColumns(
      stored: DataFrame, source0: DataFrame, keyCol0: String): DataFrame = {
    // canonicalize to the stored table's column CASE (Derby/Oracle fold
    // unquoted DDL to uppercase) — a case-only difference is the same
    // column, not a widening; otherwise the swap would materialize both
    // a "V" and a "v" and later reads die on ambiguous references
    val storedByLc = stored.columns.map(c => c.toLowerCase -> c).toMap
    val source = source0.select(source0.columns.map(c =>
      col(c).as(storedByLc.getOrElse(c.toLowerCase, c))): _*)
    val keyCol = storedByLc.getOrElse(keyCol0.toLowerCase, keyCol0)
    val storedCols = stored.columns.filterNot(_ == keyCol)
    val sourceCols = source.columns.filterNot(_ == keyCol)
    val allCols = (storedCols ++ sourceCols.filterNot(storedCols.contains)).toSeq
    val t = stored.as("t")
    val s = source.as("s")
    def sel(has: String => Boolean, side: String) =
      col(keyCol) +: allCols.map(c =>
        if (has(c)) col(s"$side.$c").as(c) else lit(null).as(c))
    val survivors = t.join(s.select(keyCol), Seq(keyCol), "left_anti")
      .select(sel(storedCols.contains, "t"): _*)
    val matched = t.join(s, Seq(keyCol))
      .select(col(keyCol) +: allCols.map(c =>
        if (sourceCols.contains(c)) col(s"s.$c").as(c)
        else col(s"t.$c").as(c)): _*)
    val inserts = s.join(t.select(keyCol), Seq(keyCol), "left_anti")
      .select(sel(sourceCols.contains, "s"): _*)
    survivors.unionByName(matched).unionByName(inserts)
  }

  @volatile private var mergeRuntimeDisabled = false

  /** Per-invocation staging suffix: two concurrent upserts to the same
    * schema must not share one staging table (each would overwrite the
    * other's staged rows mid-MERGE). The random token makes the name
    * unique across store instances and processes, the counter within
    * one; the stage is dropped in the same `finally`, with a fresh-
    * connection retry if the MERGE connection died — a stranded table
    * needs a hard crash or a server unreachable at cleanup time (and
    * is clobbered by no one; sweep '<schema>__stage_%' after outages). */
  private val stageToken =
    java.util.UUID.randomUUID().toString.replace("-", "").take(8)
  private val stageCounter = new java.util.concurrent.atomic.AtomicLong(0L)

  /** One row per key, chosen deterministically by row-content hash. */
  private def dedupByKey(df: DataFrame, keyCol: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keyCol)
      .orderBy(xxhash64(df.columns.map(col): _*))
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
  }

  /** Atomic MERGE INTO upsert: stage the (already key-deduped) source
    * rows, apply both arms in one statement (atomic in the database —
    * the live table is never dropped or truncated), drop the staging
    * table. */
  private def mergeUpsert(schema: String, df: DataFrame, keyCol: String): Unit = {
    val stage = checkIdent(
      schema + "__stage_" + stageToken + "_" + stageCounter.incrementAndGet())
    def q(c: String) = "\"" + c.replace("\"", "\"\"") + "\""
    val cols = df.columns
    val setCols = cols.filterNot(_ == keyCol)
    val matchedArm =
      if (setCols.isEmpty) ""
      else "WHEN MATCHED THEN UPDATE SET " +
        setCols.map(c => s"${q(c)} = s.${q(c)}").mkString(", ") + " "
    val sql =
      s"MERGE INTO $schema t USING $stage s ON t.${q(keyCol)} = s.${q(keyCol)} " +
      matchedArm +
      s"WHEN NOT MATCHED THEN INSERT (${cols.map(q).mkString(", ")}) " +
      s"VALUES (${cols.map(c => s"s.${q(c)}").mkString(", ")})"
    // once the writer has run at all, the stage table may exist (Spark's
    // JDBC writer creates it before inserting — a failed insert batch
    // still leaves it behind), so the whole write+merge region shares
    // one cleanup scope
    var dropped = false
    try {
      df.write.mode(SaveMode.Overwrite).options(optionsFor(df))
        .jdbc(url, stage, jprops)
      withConn { c =>
        val st = c.createStatement()
        try {
          st.executeUpdate(sql)
        } finally {
          try { st.execute(s"DROP TABLE $stage"); dropped = true }
          catch { case _: java.sql.SQLException => () }
          st.close()
        }
      }
    } catch {
      case scala.util.control.NonFatal(e) =>
        // a failure after table creation but outside the in-connection
        // finally (staging write died mid-insert, connection refused,
        // connection died mid-MERGE taking the DROP with it) must not
        // strand the uniquely-named stage table — retry the drop on a
        // fresh connection unless the inner finally already did it.
        // Best-effort: if the server itself is down nothing can clean up
        // now (sweep '<schema>__stage_%' after outages).
        if (!dropped) {
          try withConn { c =>
            val st = c.createStatement()
            try st.execute(s"DROP TABLE $stage") finally st.close()
          } catch { case scala.util.control.NonFatal(_) => () }
        }
        throw e
    }
  }

  /** Delete by predicate (read-filter-swap). */
  def delete(schema: String, filters: (String, Any)*): Unit = {
    val df = read(schema)
    swapIn(schema, df.filter(!FilterDsl.compileAll(df, filters)))
  }

  /** Swap-in fallback: write the replacement rows to a temp table, then
    * DROP + RENAME in one transaction (rolled back together on failure
    * where the dialect supports transactional DDL). */
  private def swapIn(schema: String, rows: DataFrame): Unit = {
    checkIdent(schema)
    val tmp = checkIdent(schema + "__tmp")
    rows.write.mode(SaveMode.Overwrite).options(optionsFor(rows))
      .jdbc(url, tmp, jprops)
    withConn { c =>
      c.setAutoCommit(false)
      val st = c.createStatement()
      try {
        st.execute(s"DROP TABLE $schema")
        st.execute(renameSql(tmp, schema))
        c.commit()
      } catch {
        case e: Throwable => c.rollback(); throw e
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

object JdbcResultStore {
  /** Dialects with a standard `MERGE INTO` (Derby since 10.11, Postgres
    * since 15, Oracle, SQL Server, DB2, H2). MySQL/SQLite use
    * non-standard upsert syntax and take the swap fallback. */
  def dialectSupportsMerge(url: String): Boolean =
    Seq("jdbc:derby:", "jdbc:postgresql:", "jdbc:oracle:",
      "jdbc:sqlserver:", "jdbc:db2:", "jdbc:h2:")
      .exists(url.startsWith)
}
