package graft.sources

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types.StructType
import graft.core.{ObjectDoesNotExist, ObjectExistError}
import graft.query.FilterDsl

/** In-process KV store — the Redis-analog member of the store family
  * (nexus/backends/stores/redis_store.py:9-120: one hash per schema,
  * hexists/hlen/hset/hdel, with insert refusing existing keys and
  * update/delete refusing missing ones). This environment has zero
  * egress, so the transport is a process-local concurrent hash playing
  * the same role Redis plays beside the bulk columnar stores:
  * low-latency point reads/writes of SMALL state (pipeline metadata,
  * offsets, dedup registers) — never bulk data, which belongs in the
  * parquet/JDBC stores. A networked deployment swaps the map for a
  * Redis client behind this same surface; every method here maps 1:1
  * onto a Redis hash command (noted per method).
  *
  * Spark interop: `read` exposes a schema's records as a DataFrame
  * (driver-local state, so `createDataFrame` is correct, not a
  * scale problem), `filterRecords` applies the same Django-style
  * filter DSL as every other store, and `streamingUpsert` drains a
  * stream's micro-batches into the hash via foreachBatch.
  */
final class InMemoryKvStore(
    spark: SparkSession,
    maxRecordsPerSchema: Int = InMemoryKvStore.DefaultMaxRecordsPerSchema) {

  // schema name -> (row schema, key -> row)
  private val schemas =
    TrieMap.empty[String, (StructType, TrieMap[String, Row])]

  /** Driver-memory guard: this is a CONTROL-PLANE store (metadata,
    * offsets, dedup registers) and every write collects onto the
    * driver — someone pointing a corpus at it must fail loudly, not
    * OOM the driver. The bound is enforced BEFORE materializing the
    * batch (`limit(cap+1)` caps the collect itself) and again on the
    * post-merge schema size. */
  private def collectBounded(schema: String, df: DataFrame): Array[Row] = {
    val rows = df.limit(maxRecordsPerSchema + 1).collect()
    if (rows.length > maxRecordsPerSchema) throw new IllegalStateException(
      s"InMemoryKvStore batch for schema '$schema' exceeds " +
        s"$maxRecordsPerSchema records — this store is driver-local " +
        "control-plane state; bulk data belongs in the parquet/JDBC stores")
    rows
  }

  /** Callers hold the store monitor. */
  private def checkCapacity(
      schema: String, t: TrieMap[String, Row], newKeys: Int): Unit = {
    if (t.size + newKeys > maxRecordsPerSchema) throw new IllegalStateException(
      s"InMemoryKvStore schema '$schema' would grow to " +
        s"${t.size + newKeys} records (cap $maxRecordsPerSchema) — " +
        "this store is driver-local control-plane state; bulk data " +
        "belongs in the parquet/JDBC stores")
  }

  /** Validate + align already-collected rows to the stored row schema
    * WITHOUT creating the schema entry — a refused batch must leave a
    * fresh store truly untouched (no empty table registered under the
    * refused batch's schema); registration happens separately, after
    * validation succeeds. The same (name, type) set in any order
    * reorders IN MEMORY (no Spark job under the lock); a different
    * column set or drifted types refuse — rows written under a
    * reordered/widened/retyped schema would otherwise read back
    * positionally under the original StructType. Callers hold the
    * store monitor (see [[writeLock]]). */
  private def alignOnly(schema: String, dfSchema: StructType, rows: Array[Row])
      : (Array[Row], Option[TrieMap[String, Row]], StructType) =
    schemas.get(schema) match {
      case None => (rows, None, dfSchema)
      case Some((stored, t)) =>
        def sig(s: StructType) = s.fields.map(f => (f.name, f.dataType)).toSet
        require(sig(dfSchema) == sig(stored),
          s"schema mismatch for '$schema': stored ${stored.simpleString}" +
            s", got ${dfSchema.simpleString}")
        if (stored.fieldNames.sameElements(dfSchema.fieldNames))
          (rows, Some(t), stored)
        else {
          val perm = stored.fieldNames.map(dfSchema.fieldIndex)
          val re = rows.map(r =>
            new org.apache.spark.sql.catalyst.expressions.GenericRowWithSchema(
              perm.map(i => r.get(i)), stored): Row)
          (re, Some(t), stored)
        }
    }

  private def register(schema: String, dfSchema: StructType)
      : TrieMap[String, Row] =
    schemas.getOrElseUpdate(schema, (dfSchema, TrieMap.empty))._2

  private def aligned(schema: String, dfSchema: StructType, rows: Array[Row])
      : (Array[Row], TrieMap[String, Row], StructType) = {
    val (r, tOpt, stored) = alignOnly(schema, dfSchema, rows)
    (r, tOpt.getOrElse(register(schema, dfSchema)), stored)
  }

  /** Deterministic content rendering for within-batch conflict
    * resolution: Row.toString on a binary column prints the array's
    * identity hash, which differs per JVM allocation — render arrays by
    * value so a replayed micro-batch always keeps the same row. Each
    * field rendering is LENGTH-PREFIXED so distinct rows always render
    * distinctly — a separator alone stays ambiguous when a string value
    * contains the separator character itself. */
  private def stableKey(r: Row): String =
    (0 until r.length).map { i =>
      val s = r.get(i) match {
        case b: Array[Byte] => java.util.Arrays.toString(b)
        case a: Array[_]    => a.mkString("[", ",", "]")
        case v              => String.valueOf(v)
      }
      s"${s.length}:$s"
    }.mkString("|")

  /** All batch mutations serialize on the store monitor: validation and
    * mutation are one atomic step (a refused batch cannot interleave
    * with a concurrent writer and both succeed — the HSETNX contract),
    * and schema creation is race-free. Reads stay lock-free on the
    * TrieMap. Driver-local small state; a coarse lock is the right
    * trade — and no Spark action ever runs under it. */
  private def writeLock[A](f: => A): A = synchronized(f)

  private def existing(schema: String): TrieMap[String, Row] =
    schemas.getOrElse(schema,
      throw ObjectDoesNotExist(s"No schema '$schema'"))._2

  /** HEXISTS. */
  def exists(schema: String, key: Any): Boolean =
    schemas.get(schema).exists(_._2.contains(key.toString))

  /** HLEN. */
  def count(schema: String): Long =
    schemas.get(schema).map(_._2.size.toLong).getOrElse(0L)

  /** HSET with NX semantics per record: refuses keys that already
    * exist (insert_record, redis_store.py:24-38). Validates the WHOLE
    * batch (intra-batch and against the store) before mutating, so a
    * refused insert leaves the store exactly as it was. */
  def insert(schema: String, df: DataFrame, keyCol: String): Unit = {
    val collected = collectBounded(schema, df) // Spark action OUTSIDE the lock
    writeLock {
      val (rows, tOpt, stored) = alignOnly(schema, df.schema, collected)
      val ki = stored.fieldIndex(keyCol)
      val keys = rows.map(_.get(ki).toString)
      val dup = keys.diff(keys.distinct).headOption
        .orElse(keys.find(k => tOpt.exists(_.contains(k))))
      dup.foreach(k => throw ObjectExistError(
        s"Record '$k' already exists in schema '$schema'"))
      tOpt.foreach(t => checkCapacity(schema, t, keys.length))
      // only a VALID batch registers a fresh schema
      val t = tOpt.getOrElse(register(schema, df.schema))
      rows.zip(keys).foreach { case (r, k) => t.put(k, r) }
    }
  }

  /** HSET only over existing fields (update_record, redis_store.py:40-54).
    * Same all-or-nothing contract as insert. */
  def update(schema: String, df: DataFrame, keyCol: String): Unit = {
    existing(schema)
    val collected = collectBounded(schema, df)
    writeLock {
      val (rows, t, stored) = aligned(schema, df.schema, collected)
      val ki = stored.fieldIndex(keyCol)
      val keys = rows.map(_.get(ki).toString)
      keys.find(k => !t.contains(k)).foreach(k => throw ObjectDoesNotExist(
        s"Record '$k' does not exist in schema '$schema'"))
      // same deterministic within-batch conflict rule as upsert
      rows.groupBy(_.get(ki).toString).foreach { case (k, rs) =>
        t.put(k, rs.minBy(stableKey))
      }
    }
  }

  /** Unconditional HSET — the upsert arm streaming sinks want.
    * Within-batch duplicate keys reduce to ONE row chosen
    * deterministically by row content (collect order depends on
    * partitioning, so "last put wins" would make a replayed micro-batch
    * store a different value under different parallelism — the same
    * contract JdbcResultStore.upsert pins). */
  def upsert(schema: String, df: DataFrame, keyCol: String): Unit = {
    val collected = collectBounded(schema, df)
    writeLock {
      val (rows, t, stored) = aligned(schema, df.schema, collected)
      val ki = stored.fieldIndex(keyCol)
      val byKey = rows.groupBy(_.get(ki).toString)
      checkCapacity(schema, t, byKey.keysIterator.count(!t.contains(_)))
      byKey.foreach { case (k, rs) =>
        t.put(k, rs.minBy(stableKey))
      }
    }
  }

  /** HDEL (delete_record, redis_store.py:56-63). */
  def deleteRecord(schema: String, key: Any): Unit = {
    val t = existing(schema)
    if (t.remove(key.toString).isEmpty)
      throw ObjectDoesNotExist(
        s"Record '$key' does not exist in schema '$schema'")
  }

  /** HGET (get_record, redis_store.py:81-96). */
  def get(schema: String, key: Any): Row =
    existing(schema).getOrElse(key.toString,
      throw ObjectDoesNotExist(
        s"Record '$key' does not exist in schema '$schema'"))

  /** All records of a schema as a DataFrame (HSCAN → rows). */
  def read(schema: String): DataFrame = {
    val (rowSchema, t) = schemas.getOrElse(schema,
      throw ObjectDoesNotExist(s"No schema '$schema'"))
    spark.createDataFrame(
      java.util.Arrays.asList(t.values.toArray: _*), rowSchema)
  }

  /** Filter-DSL read over the scanned records (filter_record,
    * redis_store.py:98-120) — same `field__op` compiler as the parquet
    * and JDBC stores, evaluated by Spark over the driver-local rows. */
  def filterRecords(schema: String, filters: (String, Any)*): DataFrame = {
    val df = read(schema)
    df.filter(FilterDsl.compileAll(df, filters))
  }

  /** Streaming upsert sink: foreachBatch → HSET per micro-batch. */
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

object InMemoryKvStore {
  /** Generous for control-plane state (offsets, registers, metadata),
    * far below anything that dents a driver heap; constructor-tunable. */
  val DefaultMaxRecordsPerSchema: Int = 1000000
}
