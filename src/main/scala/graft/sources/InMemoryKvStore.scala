package graft.sources

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types.{DataType, StructType}
import graft.core.{ObjectDoesNotExist, ObjectExistError}
import graft.query.FilterDsl

/** The transport surface under [[InMemoryKvStore]]: the Redis hash
  * commands the reference's store drives
  * (nexus/backends/stores/redis_store.py:9-120 — one hash per schema,
  * hexists/hlen/hset/hdel, plus a full-hash scan for reads). Values are
  * opaque bytes; the store owns the row codec. A networked deployment
  * implements this trait over a real Redis endpoint (each method IS the
  * like-named command; `hgetall` maps to a cursored HSCAN drain) and
  * passes it to the store's constructor — the in-process
  * [[InMemoryHashClient]] is the default, playing the same role Redis
  * plays beside the bulk columnar stores in a zero-egress environment.
  *
  * Atomicity note: the store serializes its check-then-write batches on
  * a process-local monitor, which is complete for the in-process client.
  * A remote implementation shared by several processes would wrap those
  * batches in MULTI/WATCH (or a Lua script) — that swap lives entirely
  * behind this trait.
  */
trait KvHashClient {
  /** Run `f` exclusively against this endpoint: the store's
    * check-then-write batches execute inside it, so the HSETNX/capacity
    * contracts hold across EVERY handle sharing one client (a per-store
    * monitor would let two handles over one endpoint race). The default
    * serializes on the client instance — correct for any in-process
    * sharing; a networked implementation overrides with its endpoint's
    * primitive (MULTI/WATCH, a Lua script, or a lock key). */
  def withLock[A](f: => A): A = synchronized(f)
  /** HEXISTS. */
  def hexists(hash: String, field: String): Boolean
  /** HGET. */
  def hget(hash: String, field: String): Option[Array[Byte]]
  /** HSET (multi-field). */
  def hset(hash: String, kvs: Iterable[(String, Array[Byte])]): Unit
  /** HDEL; true when the field existed. */
  def hdel(hash: String, field: String): Boolean
  /** HLEN (0 for a missing hash). */
  def hlen(hash: String): Long
  /** HKEYS. */
  def hkeys(hash: String): Seq[String]
  /** Full-hash read (HSCAN drained to completion). */
  def hgetall(hash: String): Seq[(String, Array[Byte])]
}

/** Process-local [[KvHashClient]]: one concurrent map per hash. */
final class InMemoryHashClient extends KvHashClient {
  private val hashes = TrieMap.empty[String, TrieMap[String, Array[Byte]]]
  private def table(hash: String): Option[TrieMap[String, Array[Byte]]] =
    hashes.get(hash)
  def hexists(hash: String, field: String): Boolean =
    table(hash).exists(_.contains(field))
  def hget(hash: String, field: String): Option[Array[Byte]] =
    table(hash).flatMap(_.get(field))
  def hset(hash: String, kvs: Iterable[(String, Array[Byte])]): Unit = {
    val t = hashes.getOrElseUpdate(hash, TrieMap.empty)
    kvs.foreach { case (k, v) => t.put(k, v) }
  }
  def hdel(hash: String, field: String): Boolean =
    table(hash).exists(_.remove(field).isDefined)
  def hlen(hash: String): Long = table(hash).map(_.size.toLong).getOrElse(0L)
  def hkeys(hash: String): Seq[String] =
    table(hash).map(_.keysIterator.toSeq).getOrElse(Seq.empty)
  def hgetall(hash: String): Seq[(String, Array[Byte])] =
    table(hash).map(_.iterator.toSeq).getOrElse(Seq.empty)
}

/** KV store over a [[KvHashClient]] — the Redis-analog member of the
  * store family (nexus/backends/stores/redis_store.py:9-120: one hash
  * per schema, with insert refusing existing keys and update/delete
  * refusing missing ones). The client endpoint is a constructor arg
  * (default: in-process), so the reference's "point the store at a
  * Redis URL" deployment is the same one-line swap here. Row schemas
  * travel THROUGH the client (a reserved metadata hash), so two store
  * handles over one endpoint interoperate.
  *
  * Scope: low-latency point reads/writes of SMALL state (pipeline
  * metadata, offsets, dedup registers) — never bulk data, which belongs
  * in the parquet/JDBC stores.
  *
  * Spark interop: `read` exposes a schema's records as a DataFrame
  * (driver-local state, so `createDataFrame` is correct, not a
  * scale problem), `filterRecords` applies the same Django-style
  * filter DSL as every other store, and `streamingUpsert` drains a
  * stream's micro-batches into the hash via foreachBatch.
  */
final class InMemoryKvStore(
    spark: SparkSession,
    maxRecordsPerSchema: Int = InMemoryKvStore.DefaultMaxRecordsPerSchema,
    client: KvHashClient = new InMemoryHashClient) {
  import InMemoryKvStore.MetaHash

  // local StructType cache over the client-resident schema registry
  private val schemaCache = TrieMap.empty[String, StructType]

  private def schemaOf(schema: String): Option[StructType] =
    schemaCache.get(schema).orElse {
      client.hget(MetaHash, schema).map { bytes =>
        val st = DataType.fromJson(new String(bytes, "UTF-8"))
          .asInstanceOf[StructType]
        schemaCache.put(schema, st)
        st
      }
    }

  private def requireSchema(schema: String): StructType =
    schemaOf(schema).getOrElse(
      throw ObjectDoesNotExist(s"No schema '$schema'"))

  private def checkName(schema: String): Unit =
    require(schema != MetaHash, s"schema name '$MetaHash' is reserved")

  /** Row codec: SCHEMA-DRIVEN, not Java serialization — each value is
    * written per its StructType field type (null bit + primitive /
    * length-prefixed payload, containers recursively). The StructType
    * is stored ONCE per schema in the metadata hash, so records carry
    * no schema overhead. Behind a networked [[KvHashClient]] the bytes
    * read back are ENDPOINT-CONTROLLED — an ObjectInputStream here
    * would hand that endpoint a driver-side gadget-chain surface;
    * this codec can only ever produce the schema's declared shapes
    * (malformed bytes throw, they never execute). */
  private def encode(r: Row, st: StructType): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.writeByte(InMemoryKvStore.CodecVersion.toInt)
    st.fields.zipWithIndex.foreach { case (f, i) =>
      InMemoryKvStore.writeValue(out, f.dataType,
        if (r.isNullAt(i)) null else r.get(i))
    }
    out.close()
    bos.toByteArray
  }

  private def decode(bytes: Array[Byte], st: StructType): Row = {
    val in = new java.io.DataInputStream(
      new java.io.ByteArrayInputStream(bytes))
    val version = in.readByte()
    if (version != InMemoryKvStore.CodecVersion)
      throw new java.io.StreamCorruptedException(
        s"InMemoryKvStore codec: record format version $version is not " +
          s"the supported version ${InMemoryKvStore.CodecVersion} — the " +
          "value was written by an incompatible (legacy or newer) codec; " +
          "re-persist it through this store's upsert path")
    val values = st.fields.map(f =>
      InMemoryKvStore.readValue(in, f.dataType))
    new org.apache.spark.sql.catalyst.expressions.GenericRowWithSchema(
      values.asInstanceOf[Array[Any]], st)
  }

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
  private def checkCapacity(schema: String, newKeys: Int): Unit = {
    val size = client.hlen(schema)
    if (size + newKeys > maxRecordsPerSchema) throw new IllegalStateException(
      s"InMemoryKvStore schema '$schema' would grow to " +
        s"${size + newKeys} records (cap $maxRecordsPerSchema) — " +
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
      : (Array[Row], Boolean, StructType) =
    schemaOf(schema) match {
      case None => (rows, false, dfSchema)
      case Some(stored) =>
        def sig(s: StructType) = s.fields.map(f => (f.name, f.dataType)).toSet
        require(sig(dfSchema) == sig(stored),
          s"schema mismatch for '$schema': stored ${stored.simpleString}" +
            s", got ${dfSchema.simpleString}")
        if (stored.fieldNames.sameElements(dfSchema.fieldNames))
          (rows, true, stored)
        else {
          val perm = stored.fieldNames.map(dfSchema.fieldIndex)
          val re = rows.map(r =>
            new org.apache.spark.sql.catalyst.expressions.GenericRowWithSchema(
              perm.map(i => r.get(i)), stored): Row)
          (re, true, stored)
        }
    }

  private def register(schema: String, dfSchema: StructType): Unit = {
    client.hset(MetaHash, Seq(schema -> dfSchema.json.getBytes("UTF-8")))
    schemaCache.put(schema, dfSchema)
  }

  private def aligned(schema: String, dfSchema: StructType, rows: Array[Row])
      : (Array[Row], StructType) = {
    val (r, exists, stored) = alignOnly(schema, dfSchema, rows)
    if (!exists) register(schema, dfSchema)
    (r, stored)
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

  /** All batch mutations serialize through the CLIENT's lock:
    * validation and mutation are one atomic step (a refused batch
    * cannot interleave with a concurrent writer and both succeed — the
    * HSETNX contract), schema creation is race-free, and the guarantee
    * holds across every store handle sharing one endpoint (a per-store
    * monitor would not survive the multi-handle deployment shape).
    * Reads stay lock-free. Driver-local small state; a coarse lock is
    * the right trade — and no Spark action ever runs under it. */
  private def writeLock[A](f: => A): A = client.withLock(f)

  /** HEXISTS. */
  def exists(schema: String, key: Any): Boolean =
    client.hexists(schema, key.toString)

  /** HLEN. */
  def count(schema: String): Long = client.hlen(schema)

  /** HSET with NX semantics per record: refuses keys that already
    * exist (insert_record, redis_store.py:24-38). Validates the WHOLE
    * batch (intra-batch and against the store) before mutating, so a
    * refused insert leaves the store exactly as it was. */
  def insert(schema: String, df: DataFrame, keyCol: String): Unit = {
    checkName(schema)
    val collected = collectBounded(schema, df) // Spark action OUTSIDE the lock
    writeLock {
      val (rows, schemaExists, stored) = alignOnly(schema, df.schema, collected)
      val ki = stored.fieldIndex(keyCol)
      val keys = rows.map(_.get(ki).toString)
      // ONE key snapshot per batch (not a round trip per key — a
      // remote endpoint pays per command)
      val existing =
        if (schemaExists) client.hkeys(schema).toSet else Set.empty[String]
      val dup = keys.diff(keys.distinct).headOption
        .orElse(keys.find(existing.contains))
      dup.foreach(k => throw ObjectExistError(
        s"Record '$k' already exists in schema '$schema'"))
      if (schemaExists) checkCapacity(schema, keys.length)
      // only a VALID batch registers a fresh schema
      if (!schemaExists) register(schema, df.schema)
      client.hset(schema, rows.zip(keys).map { case (r, k) => k -> encode(r, stored) })
    }
  }

  /** HSET only over existing fields (update_record, redis_store.py:40-54).
    * Same all-or-nothing contract as insert. */
  def update(schema: String, df: DataFrame, keyCol: String): Unit = {
    checkName(schema)
    requireSchema(schema)
    val collected = collectBounded(schema, df)
    writeLock {
      val (rows, stored) = aligned(schema, df.schema, collected)
      val ki = stored.fieldIndex(keyCol)
      val keys = rows.map(_.get(ki).toString)
      val existing = client.hkeys(schema).toSet
      keys.find(!existing.contains(_)).foreach(k =>
        throw ObjectDoesNotExist(
          s"Record '$k' does not exist in schema '$schema'"))
      // same deterministic within-batch conflict rule as upsert
      client.hset(schema, rows.groupBy(_.get(ki).toString)
        .map { case (k, rs) => k -> encode(rs.minBy(stableKey), stored) })
    }
  }

  /** Unconditional HSET — the upsert arm streaming sinks want.
    * Within-batch duplicate keys reduce to ONE row chosen
    * deterministically by row content (collect order depends on
    * partitioning, so "last put wins" would make a replayed micro-batch
    * store a different value under different parallelism — the same
    * contract JdbcResultStore.upsert pins). */
  def upsert(schema: String, df: DataFrame, keyCol: String): Unit = {
    checkName(schema)
    val collected = collectBounded(schema, df)
    writeLock {
      val (rows, stored) = aligned(schema, df.schema, collected)
      val ki = stored.fieldIndex(keyCol)
      val byKey = rows.groupBy(_.get(ki).toString)
      val existing = client.hkeys(schema).toSet
      checkCapacity(schema,
        byKey.keysIterator.count(!existing.contains(_)))
      client.hset(schema,
        byKey.map { case (k, rs) => k -> encode(rs.minBy(stableKey), stored) })
    }
  }

  /** HDEL (delete_record, redis_store.py:56-63). */
  def deleteRecord(schema: String, key: Any): Unit = {
    requireSchema(schema)
    if (!client.hdel(schema, key.toString))
      throw ObjectDoesNotExist(
        s"Record '$key' does not exist in schema '$schema'")
  }

  /** HGET (get_record, redis_store.py:81-96). */
  def get(schema: String, key: Any): Row = {
    val st = requireSchema(schema)
    client.hget(schema, key.toString)
      .map(decode(_, st))
      .getOrElse(throw ObjectDoesNotExist(
        s"Record '$key' does not exist in schema '$schema'"))
  }

  /** All records of a schema as a DataFrame (HSCAN → rows). */
  def read(schema: String): DataFrame = {
    val st = requireSchema(schema)
    val rows = client.hgetall(schema).map { case (_, v) => decode(v, st) }
    spark.createDataFrame(
      java.util.Arrays.asList(rows.toArray: _*), st)
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

  /** Reserved metadata hash carrying each schema's StructType JSON. */
  val MetaHash: String = "__graft_schemas__"

  /** Record format tag, the FIRST byte of every encoded value — a
    * legacy (pre-tag ObjectOutputStream) or future-codec record fails
    * decode with an explicit version message instead of opaque
    * EOF/garbage errors. Bump on any wire-format change. */
  val CodecVersion: Byte = 1

  import org.apache.spark.sql.types._
  import java.io.{DataInputStream, DataOutputStream}

  /** One value of external-row type `dt`: a null bit, then the typed
    * payload (fixed-width primitives; length-prefixed UTF-8 / bytes;
    * containers recursively). Timestamps normalize to epoch micros
    * (Spark's own precision) and dates to epoch days, accepting both
    * the java.sql and java.time external classes. */
  private[sources] def writeValue(
      out: DataOutputStream, dt: DataType, v: Any): Unit = {
    out.writeBoolean(v == null)
    if (v == null) return
    dt match {
      case BooleanType => out.writeBoolean(v.asInstanceOf[Boolean])
      case ByteType => out.writeByte(v.asInstanceOf[Byte].toInt)
      case ShortType => out.writeShort(v.asInstanceOf[Short].toInt)
      case IntegerType => out.writeInt(v.asInstanceOf[Int])
      case LongType => out.writeLong(v.asInstanceOf[Long])
      case FloatType => out.writeFloat(v.asInstanceOf[Float])
      case DoubleType => out.writeDouble(v.asInstanceOf[Double])
      case StringType =>
        val b = v.toString.getBytes("UTF-8")
        out.writeInt(b.length); out.write(b)
      case BinaryType =>
        val b = v.asInstanceOf[Array[Byte]]
        out.writeInt(b.length); out.write(b)
      case TimestampType =>
        val micros = v match {
          case t: java.sql.Timestamp =>
            Math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000L
          case i: java.time.Instant =>
            i.getEpochSecond * 1000000L + i.getNano / 1000L
        }
        out.writeLong(micros)
      case DateType =>
        val days = v match {
          case d: java.sql.Date => d.toLocalDate.toEpochDay
          case d: java.time.LocalDate => d.toEpochDay
        }
        out.writeLong(days)
      case _: DecimalType =>
        val bd = v match {
          case b: java.math.BigDecimal => b
          case b: scala.math.BigDecimal => b.bigDecimal
        }
        val s = bd.toPlainString.getBytes("UTF-8")
        out.writeInt(s.length); out.write(s)
      case ArrayType(et, _) =>
        val elems: Seq[Any] = v match {
          case s: scala.collection.Seq[_] => s.toSeq
          case a: Array[_] => a.toSeq
        }
        out.writeInt(elems.length)
        elems.foreach(writeValue(out, et, _))
      case MapType(kt, vt, _) =>
        val m = v.asInstanceOf[scala.collection.Map[Any, Any]]
        out.writeInt(m.size)
        m.foreach { case (k, mv) =>
          writeValue(out, kt, k); writeValue(out, vt, mv)
        }
      case st: StructType =>
        val r = v.asInstanceOf[Row]
        st.fields.zipWithIndex.foreach { case (f, i) =>
          writeValue(out, f.dataType, if (r.isNullAt(i)) null else r.get(i))
        }
      case other => throw new IllegalArgumentException(
        s"InMemoryKvStore codec: unsupported field type $other")
    }
  }

  /** Length/count prefix, validated BEFORE allocation: the bytes behind
    * a networked [[KvHashClient]] are endpoint-controlled, so a negative
    * prefix (NegativeArraySizeException) or a ~2^31 prefix (a 2 GB
    * driver allocation) is a cheap DoS unless bounded. Every encoded
    * payload byte and every container element costs ≥ 1 byte on the
    * wire, so `remaining bytes` is a sound upper bound for both. */
  private def readLength(
      in: DataInputStream, what: String): Int = {
    val n = in.readInt()
    val remaining = in.available()
    if (n < 0 || n > remaining)
      throw new java.io.StreamCorruptedException(
        s"InMemoryKvStore codec: corrupt $what prefix $n " +
          s"(only $remaining bytes remain in the record)")
    n
  }

  private[sources] def readValue(in: DataInputStream, dt: DataType): Any = {
    if (in.readBoolean()) return null
    dt match {
      case BooleanType => in.readBoolean()
      case ByteType => in.readByte()
      case ShortType => in.readShort()
      case IntegerType => in.readInt()
      case LongType => in.readLong()
      case FloatType => in.readFloat()
      case DoubleType => in.readDouble()
      case StringType =>
        val b = new Array[Byte](readLength(in, "string length")); in.readFully(b)
        new String(b, "UTF-8")
      case BinaryType =>
        val b = new Array[Byte](readLength(in, "binary length")); in.readFully(b)
        b
      case TimestampType =>
        val micros = in.readLong()
        val ts = new java.sql.Timestamp(
          Math.floorDiv(micros, 1000000L) * 1000L)
        ts.setNanos((Math.floorMod(micros, 1000000L) * 1000L).toInt)
        ts
      case DateType =>
        java.sql.Date.valueOf(java.time.LocalDate.ofEpochDay(in.readLong()))
      case _: DecimalType =>
        val b = new Array[Byte](readLength(in, "decimal length")); in.readFully(b)
        new java.math.BigDecimal(new String(b, "UTF-8"))
      case ArrayType(et, _) =>
        Seq.fill(readLength(in, "array count"))(readValue(in, et))
      case MapType(kt, vt, _) =>
        Seq.fill(readLength(in, "map count"))(
          (readValue(in, kt), readValue(in, vt))).toMap
      case st: StructType =>
        new org.apache.spark.sql.catalyst.expressions.GenericRowWithSchema(
          st.fields.map(f => readValue(in, f.dataType)).asInstanceOf[Array[Any]],
          st)
      case other => throw new IllegalArgumentException(
        s"InMemoryKvStore codec: unsupported field type $other")
    }
  }
}
