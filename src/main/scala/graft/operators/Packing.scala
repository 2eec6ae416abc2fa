package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing for LLM pretraining exports: documents are laid out
  * as one concatenated token stream in a deterministic order and chunked
  * into fixed-size context windows ("concat-then-chunk" packing). Each
  * document gets its global token offset, its context-window id, and a
  * flag for straddling a window boundary.
  *
  * Scale shape: the naive plan is `sum() OVER (ORDER BY id)` — a GLOBAL
  * ordered window, which Spark executes in ONE partition (the classic
  * scale-killer). Instead this runs the textbook distributed prefix sum:
  * range-partition by id, local cumsum per partition (each partition
  * sorts independently), collect ONE row per partition (the per-
  * partition token totals — bounded driver metadata, same shape Spark's
  * own range partitioner collects), and broadcast-join the partition
  * prefix offsets back. No stage touches more than its own partition's
  * rows.
  */
object Packing {

  /** Debug-flag uniqueness assertion for the rank helpers: the prefix-
    * sum ranks are only deterministic when the (composite) order key is
    * UNIQUE — equal keys may split across range-partition boundaries,
    * making their relative ranks partition-dependent with no error.
    * Production call sites guarantee uniqueness by construction (mix a
    * unique id into the order); set `spark.graft.rank.assertUnique=true`
    * to pay one extra aggregate per rank call and fail loudly instead
    * of silently when wiring a NEW call site. */
  private def assertUniqueIfEnabled(
      df: DataFrame, keyCols: Seq[Column], where: String): Unit = {
    val enabled = df.sparkSession.conf
      .getOption("spark.graft.rank.assertUnique").contains("true")
    if (enabled && keyCols.nonEmpty) {
      val r = df.agg(count(lit(1)).as("n"),
        countDistinct(struct(keyCols: _*)).as("d")).first()
      val (n, d) = (r.getLong(0), r.getLong(1))
      require(n == d,
        s"$where: order key is not unique ($n rows, $d distinct keys) — " +
          "ranks across range-partition boundaries would be " +
          "partition-dependent; mix a unique id into the order")
    }
  }

  /** Assign each row a global token offset and context-window id.
    *
    * @param df        input with a unique orderable id and a token count
    * @param idCol     deterministic layout order (and output key)
    * @param tokensCol per-document token count (>= 0)
    * @param budget    context window size in tokens
    * @param numParts  layout partitions (defaults to the session's
    *                  shuffle parallelism)
    */
  def packSequences(
      df: DataFrame,
      idCol: String,
      tokensCol: String,
      budget: Long,
      numParts: Option[Int] = None): DataFrame = {
    require(budget > 0, "budget must be positive")
    val spark = df.sparkSession
    val parts = numParts.getOrElse(spark.sessionState.conf.numShufflePartitions)

    // localCheckpoint (lazy): the partition-totals collect and the final
    // plan both consume this shuffle — checkpoint so the range partition
    // + sort runs once, and blocks GC-release with the plan.
    val sorted = df
      .select(col(idCol), col(tokensCol).cast("long").as("__tok"))
      .repartitionByRange(parts, col(idCol))
      .sortWithinPartitions(idCol)
      .withColumn("__pid", spark_partition_id())
      .transform(Lineage.cutLocal)

    // one row per partition -> exclusive prefix offsets, broadcast back
    val partTotals = sorted.groupBy(col("__pid"))
      .agg(sum(col("__tok")).as("__ptotal"))
      .collect()
      .map(r => (r.getInt(0), r.getLong(1)))
      .sortBy(_._1)
    val offsets = partTotals.scanLeft((0, 0L)) {
      case ((_, acc), (pid, tot)) => (pid, acc + tot)
    }.sliding(2).collect { case Array((_, acc), (pid, _)) => (pid, acc) }.toSeq
    val offsetDf = spark.createDataFrame(offsets)
      .toDF("__pid", "__offset")

    // local exclusive cumsum inside each range partition + its offset
    val w = Window.partitionBy("__pid").orderBy(idCol)
      .rowsBetween(Window.unboundedPreceding, -1)
    sorted
      .withColumn("__local_excl", coalesce(sum(col("__tok")).over(w), lit(0L)))
      .join(broadcast(offsetDf), Seq("__pid"))
      .select(
        col(idCol),
        col("__tok").as("n_tokens"),
        (col("__local_excl") + col("__offset")).as("start_offset"))
      .withColumn("bin_id", expr(s"start_offset div $budget"))
      .withColumn("spans_boundary",
        col("bin_id") =!=
          expr(s"(start_offset + greatest(n_tokens, 1L) - 1L) div $budget"))
  }

  /** Overlapping context-window chunking: split each document's token
    * stream into windows of `window` tokens starting every `stride`
    * tokens (stride < window → overlap, the standard long-document
    * training shape). One row in, ceil(n/stride) rows out.
    *
    * Scale shape: a pure projection + explode — ZERO shuffles, no
    * state, embarrassingly parallel (PlanShapeSpec pins the
    * no-exchange plan). Chunk k of a doc with n tokens covers tokens
    * [k*stride, min(k*stride + window, n)); every token is covered and
    * the final partial window is kept. Empty documents produce no
    * chunks. */
  def chunkByTokens(
      df: DataFrame,
      idCol: String,
      textCol: String,
      window: Int,
      stride: Int): DataFrame = {
    require(window > 0 && stride > 0 && stride <= window,
      s"need 0 < stride <= window (got window=$window stride=$stride)")
    val tk = graft.functions.TextFunctions.wsTokens(col(textCol))
    df.select(col(idCol), tk.as("__tk"))
      .filter(size(col("__tk")) > 0)
      .select(col(idCol), col("__tk"),
        posexplode(transform(
          sequence(lit(0), ((size(col("__tk")) - 1) / stride).cast("int")),
          k => array_join(slice(col("__tk"), k * stride + 1, lit(window)), " "))))
      .select(col(idCol),
        col("pos").as("chunk_no"),
        col("col").as("chunk_text"),
        least(lit(window), size(col("__tk")) - col("pos") * stride)
          .as("n_tokens"))
  }

  /** Length-bucketed batching profile: assign each document to the
    * smallest capacity bucket that holds its token count, and report
    * per-bucket padding economics — the standard pre-flight for bucketed
    * (pad-to-bucket) training/inference batching, where padding waste is
    * compute burned on pad tokens. Documents longer than the largest cap
    * land in that cap's bucket truncated (tokens beyond the cap counted
    * as `n_tokens_truncated`); empty documents are excluded (a batcher
    * never schedules them).
    *
    * Scale shape: the token count and bucket are per-row projections
    * (codegen'd, no data movement); the only shuffle is the final
    * aggregate on the bucket key — cardinality = number of caps, with
    * map-side partials. All-integer arithmetic until the final rounded
    * ratios, so the result is engine-exact. */
  def lengthBuckets(
      df: DataFrame,
      textCol: String,
      caps: Seq[Int] = Seq(16, 32, 64, 128, 256, 512, 1024)): DataFrame = {
    require(caps.nonEmpty && caps == caps.sorted && caps == caps.distinct,
      s"caps must be ascending and distinct (got $caps)")
    val n = size(graft.functions.TextFunctions.wsTokens(col(textCol)))
    val bucket = caps.init.foldRight(lit(caps.last)) { (cap, rest) =>
      when(col("__n") <= cap, lit(cap)).otherwise(rest)
    }
    df.select(n.as("__n"))
      .filter(col("__n") > 0)
      .select(bucket.as("bucket_cap"), col("__n"))
      .select(col("bucket_cap"),
        least(col("__n"), col("bucket_cap")).as("__kept"),
        greatest(col("__n") - col("bucket_cap"), lit(0)).as("__cut"))
      .groupBy("bucket_cap")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("__kept")).as("n_tokens"),
        sum(col("bucket_cap") - col("__kept")).as("n_pad"),
        round(sum(col("bucket_cap") - col("__kept")).cast("double") /
          (count(lit(1)) * col("bucket_cap").cast("double")).cast("double"), 6)
          .as("pad_frac"),
        count(when(col("__cut") > 0, 1)).as("n_docs_truncated"),
        sum(col("__cut")).as("n_tokens_truncated"))
  }

  /** Global 1-based rank by `orderCol` without a global-ordered window —
    * the same distributed prefix sum as packSequences, counting rows
    * instead of tokens: range partition on the order key, local
    * row_number, plus each partition's broadcast row-count offset.
    *
    * The canonical use is the deterministic EXPORT SHUFFLE of a training
    * corpus: order by a salted content hash and the rank is a
    * reproducible global shuffle position, computed scale-out.
    *
    * Precondition: `orderCol` values are unique (a hash with the id
    * mixed in) — equal keys may split across range-partition boundaries,
    * which would make their relative ranks partition-dependent. */
  def globalRank(
      df: DataFrame,
      orderCol: String,
      carryCols: Seq[String],
      numParts: Option[Int] = None): DataFrame = {
    val spark = df.sparkSession
    assertUniqueIfEnabled(df, Seq(col(orderCol)), "globalRank")
    val parts = numParts.getOrElse(spark.sessionState.conf.numShufflePartitions)
    val sorted = df
      .select((orderCol +: carryCols).map(col): _*)
      .repartitionByRange(parts, col(orderCol))
      .sortWithinPartitions(orderCol)
      .withColumn("__pid", spark_partition_id())
      .transform(Lineage.cutLocal)

    val counts = sorted.groupBy(col("__pid"))
      .agg(count(lit(1)).as("__n"))
      .collect()
      .map(r => (r.getInt(0), r.getLong(1)))
      .sortBy(_._1)
    val offsets = counts.scanLeft((0, 0L)) {
      case ((_, acc), (pid, n)) => (pid, acc + n)
    }.sliding(2).collect { case Array((_, acc), (pid, _)) => (pid, acc) }.toSeq
    val offsetDf = spark.createDataFrame(offsets).toDF("__pid", "__offset")

    val w = Window.partitionBy("__pid").orderBy(orderCol)
    sorted
      .withColumn("__local_rank", row_number().over(w).cast("long"))
      .join(broadcast(offsetDf), Seq("__pid"))
      .select((orderCol +: carryCols).map(col) :+
        (col("__local_rank") + col("__offset")).as("rank"): _*)
  }

  /** [[globalRank]] generalized to a composite sort order (mixed
    * directions, e.g. `recency DESC, user ASC`): range partition on
    * the order expressions, local row_number per partition, plus each
    * partition's broadcast row-count offset — a global 1-based rank
    * with NO single-partition sort anywhere. Returns `df`'s columns
    * plus `rankName`.
    *
    * Precondition: the composite key is unique (mix a unique id into
    * the order) — equal keys may split across range-partition
    * boundaries, which would make their relative ranks
    * partition-dependent SILENTLY. Pass the plain (direction-free) key
    * columns as `uniqueCols` and set `spark.graft.rank.assertUnique`
    * to fail loudly instead when wiring a new call site. */
  def globalRankBy(
      df: DataFrame,
      orderCols: Seq[Column],
      rankName: String,
      numParts: Option[Int] = None,
      uniqueCols: Seq[Column] = Nil): DataFrame = {
    val spark = df.sparkSession
    assertUniqueIfEnabled(df, uniqueCols, "globalRankBy")
    val parts = numParts.getOrElse(spark.sessionState.conf.numShufflePartitions)
    val sorted = df
      .repartitionByRange(parts, orderCols: _*)
      .sortWithinPartitions(orderCols: _*)
      .withColumn("__pid", spark_partition_id())
      .transform(Lineage.cutLocal)

    val counts = sorted.groupBy(col("__pid"))
      .agg(count(lit(1)).as("__n"))
      .collect()
      .map(r => (r.getInt(0), r.getLong(1)))
      .sortBy(_._1)
    val offsets = counts.scanLeft((0, 0L)) {
      case ((_, acc), (pid, n)) => (pid, acc + n)
    }.sliding(2).collect { case Array((_, acc), (pid, _)) => (pid, acc) }.toSeq
    val offsetDf = spark.createDataFrame(offsets).toDF("__pid", "__offset")

    val w = Window.partitionBy("__pid").orderBy(orderCols: _*)
    sorted
      .withColumn("__local_rank", row_number().over(w).cast("long"))
      .join(broadcast(offsetDf), Seq("__pid"))
      .withColumn(rankName, col("__local_rank") + col("__offset"))
      .drop("__pid", "__local_rank", "__offset")
  }

  /** Per-group 1-based rank by `orderCol` without a per-group global
    * window — [[globalRank]]'s prefix sum keyed by group: range
    * partition on (group, order key) so each group's rows are sorted-
    * contiguous across partitions, local row_number per (partition,
    * group), then each (partition, group)'s broadcast count offset.
    * Driver state is |partitions| × |groups| counts — groups here are
    * corpus SOURCES (tens to hundreds), not data-sized.
    *
    * Precondition: `orderCol` unique within each group (same contract
    * as globalRank) — UNLESS the caller's readout is tie-invariant
    * (any run of equal values still occupies one contiguous rank
    * block, in partition-dependent internal order), in which case it
    * passes `tieInvariant = true` to skip the opt-in uniqueness
    * assertion (e.g. [[graft.operators.Stats.gini]], whose Σ i·v sum
    * is proven tie-invariant in its scaladoc). */
  def groupedRank(
      df: DataFrame,
      groupCol: String,
      orderCol: String,
      carryCols: Seq[String],
      numParts: Option[Int] = None,
      tieInvariant: Boolean = false): DataFrame = {
    val spark = df.sparkSession
    if (!tieInvariant) {
      assertUniqueIfEnabled(df, Seq(col(groupCol), col(orderCol)),
        "groupedRank")
    }
    val parts = numParts.getOrElse(spark.sessionState.conf.numShufflePartitions)
    val sorted = df
      .select((groupCol +: orderCol +: carryCols).map(col): _*)
      .repartitionByRange(parts, col(groupCol), col(orderCol))
      .sortWithinPartitions(groupCol, orderCol)
      .withColumn("__pid", spark_partition_id())
      .transform(Lineage.cutLocal)

    val counts = sorted.groupBy(col("__pid"), col(groupCol))
      .agg(count(lit(1)).as("__n"))
      .collect()
      .map(r => (r.getInt(0), r.get(1), r.getLong(2)))
    // exclusive prefix offsets per group over ascending partition id
    val offsets = counts.groupBy(_._2).iterator.flatMap { case (g, rows) =>
      rows.sortBy(_._1).scanLeft((0, g, 0L, 0L)) {
        case ((_, _, acc, n0), (pid, _, n)) => (pid, g, acc + n0, n)
      }.drop(1).map { case (pid, grp, acc, _) =>
        org.apache.spark.sql.Row(pid, grp, acc)
      }
    }.toSeq
    // schema-generic offset frame (groups are not always strings —
    // same discipline as groupedPrefixSum)
    val offSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField(
        "__pid", org.apache.spark.sql.types.IntegerType, nullable = false),
      sorted.schema(groupCol),
      org.apache.spark.sql.types.StructField(
        "__offset", org.apache.spark.sql.types.LongType, nullable = false)))
    val offsetDf = spark.createDataFrame(
      spark.sparkContext.parallelize(offsets, 1), offSchema)

    val w = Window.partitionBy("__pid", groupCol).orderBy(orderCol)
    sorted
      .withColumn("__local_rank", row_number().over(w).cast("long"))
      .join(broadcast(offsetDf), Seq("__pid", groupCol))
      .select((groupCol +: orderCol +: carryCols).map(col) :+
        (col("__local_rank") + col("__offset")).as("rank"): _*)
  }

  /** Per-group inclusive prefix SUM of an integral weight column by
    * `orderCol` without a per-group global window — [[groupedRank]]'s
    * two-phase shape generalized from row counts to weights: range
    * partition on (group, order key), local cumulative sum per
    * (partition, group), plus each (partition, group)'s broadcast
    * EXCLUSIVE weight-sum offset. The per-task sort is bounded by the
    * RANGE PARTITION, never by a group's size — this is the scale path
    * for rank statistics whose per-group value grid is data-sized
    * (a derived per-entity metric is unique per row, so
    * `Window.partitionBy(group).orderBy(value)` would sort a whole
    * group in one task; see [[graft.operators.Stats.spearman]]).
    *
    * Driver state is |partitions| × |groups| weight sums — groups are
    * dimension-sized (nations, sources), not data-sized. Weights must
    * be LONG (exact integer partials; the caller's counts already
    * are). Returns `df`'s columns plus `prefixName` = the inclusive
    * per-group running sum in `orderCol` order.
    *
    * Precondition: `orderCol` unique within each group (the
    * [[groupedRank]] contract — equal keys could split across range
    * partitions). Grid frames built by a (group, value) aggregate
    * satisfy this by construction. */
  def groupedPrefixSum(
      df: DataFrame,
      groupCol: String,
      orderCol: String,
      weightCol: String,
      prefixName: String = "prefix",
      numParts: Option[Int] = None): DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.{IntegerType, LongType, StructField, StructType}
    val spark = df.sparkSession
    assertUniqueIfEnabled(df, Seq(col(groupCol), col(orderCol)),
      "groupedPrefixSum")
    val parts = numParts.getOrElse(spark.sessionState.conf.numShufflePartitions)
    val sorted = df
      .repartitionByRange(parts, col(groupCol), col(orderCol))
      .sortWithinPartitions(groupCol, orderCol)
      .withColumn("__pid", spark_partition_id())
      .transform(Lineage.cutLocal)

    val sums = sorted.groupBy(col("__pid"), col(groupCol))
      .agg(sum(col(weightCol)).as("__n"))
      .collect()
      .map(r => (r.getInt(0), r.get(1), r.getLong(2)))
    // exclusive prefix offsets per group over ascending partition id
    val offsets = sums.groupBy(_._2).iterator.flatMap { case (g, rows) =>
      rows.sortBy(_._1).scanLeft((0, g, 0L, 0L)) {
        case ((_, _, acc, n0), (pid, _, n)) => (pid, g, acc + n0, n)
      }.drop(1).map { case (pid, grp, acc, _) => Row(pid, grp, acc) }
    }.toSeq
    // schema-generic offset frame (groups are not always strings)
    val offSchema = StructType(Seq(
      StructField("__pid", IntegerType, nullable = false),
      sorted.schema(groupCol),
      StructField("__offset", LongType, nullable = false)))
    val offsetDf = spark.createDataFrame(
      spark.sparkContext.parallelize(offsets, 1), offSchema)

    val w = Window.partitionBy("__pid", groupCol).orderBy(orderCol)
      .rowsBetween(Window.unboundedPreceding, 0)
    sorted
      .withColumn("__local", sum(col(weightCol)).over(w))
      .join(broadcast(offsetDf), Seq("__pid", groupCol))
      .withColumn(prefixName, col("__local") + col("__offset"))
      .drop("__pid", "__local", "__offset")
  }

  /** Curriculum-ordered export schedule — easy-to-hard training order
    * (Bengio et al. 2009) with a deterministic within-level shuffle:
    * difficulty quantizes onto a FIXED bucket grid (⌊d/width⌋ capped
    * at `maxBucket` — a data-derived quantile cut would need a rank
    * pass of its own; a fixed grid is scale-free and stable across
    * corpus refreshes), and the global position comes from
    * [[globalRankBy]] over (bucket, salted content hash, id) — a
    * range-partitioned prefix sum, NO single-partition sort anywhere.
    * The id mixed into the order makes the composite key unique (the
    * globalRankBy contract). Returns
    * `(id, difficulty, bucket, position)` — feed straight into the
    * packing/sharding exporters. */
  def curriculumSchedule(
      df: DataFrame,
      idCol: String,
      difficultyCol: String,
      bucketWidth: Long,
      maxBucket: Long,
      salt: String): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    require(maxBucket >= 0, "maxBucket must be non-negative")
    val base = df.select(col(idCol),
      col(difficultyCol).cast("long").as("difficulty"),
      least(expr(s"cast($difficultyCol as bigint) div $bucketWidth"),
        lit(maxBucket)).as("bucket"),
      md5(concat(lit(salt), col(idCol).cast("string")).cast("binary"))
        .as("__h"))
    globalRankBy(base,
      Seq(col("bucket"), col("__h"), col(idCol)), "position",
      uniqueCols = Seq(col(idCol)))
      .select(col(idCol), col("difficulty"), col("bucket"),
        col("position"))
  }

  /** Content-defined chunking over a text column
    * ([[graft.functions.TextKernelExpressions.CdcChunks]]): boundaries
    * from a rolling content hash, so edits shift chunk boundaries only
    * LOCALLY and unchanged regions keep their chunk fingerprints — the
    * primitive behind dedup-friendly storage and incremental re-chunking
    * of a refreshed corpus (fixed-size chunking invalidates every chunk
    * after an insertion; pq3's token windows are the model-context
    * variant, this is the byte/content variant).
    *
    * Output: one row per chunk — (id, chunk_idx, start, chunk_len,
    * chunk_fp), fp = 32-bit md5 prefix of the chunk text (the dq4
    * portable-hash discipline). Scale shape: a pure per-row projection +
    * explode — ZERO shuffles; chunk fingerprints feed the usual
    * exact-dedup groupBy downstream. */
  def cdcChunks(
      df: DataFrame,
      idCol: String,
      textCol: String,
      w: Int = 8,
      divisor: Int = 64): DataFrame = {
    val chunks = graft.functions.TextKernelExpressions
      .cdc_chunks(col("__t"), w, divisor)
    df.select(col(idCol), col(textCol).as("__t"))
      .filter(length(col("__t")) > 0)
      .select(col(idCol), col("__t"), posexplode(chunks))
      .select(col(idCol),
        (col("pos") + 1).as("chunk_idx"),
        col("col.start").as("start"),
        col("col.len").as("chunk_len"),
        conv(substring(md5(
          col("__t").substr(col("col.start"), col("col.len"))), 1, 8),
          16, 10).cast("long").as("chunk_fp"))
  }

  /** DuckDB replay of [[cdcChunks]] (generated beside the engine code):
    * the same window hash as an unrolled lag-free list expression with
    * the identical mod-2^64 power table. */
  def cdcOracleSql(w: Int, divisor: Int): String = {
    val pw = new Array[Long](w)
    pw(0) = 1L
    for (k <- 1 until w) pw(k) = pw(k - 1) * 31L
    // Σ_{k<w} code(p−k)·31^k as explicit HUGEINT terms (powers emitted
    // unsigned, matching Java long wrap-around)
    val terms = (0 until w).map(k =>
      s"ord(text[p - $k])::hugeint * ${java.lang.Long.toUnsignedString(pw(k))}::hugeint")
      .mkString(" + ")
    s"""WITH d AS (
       |  SELECT doc_id, text, length(text) AS l
       |  FROM documents WHERE length(text) > 0
       |), b AS (
       |  SELECT doc_id, text,
       |         list_filter(range($w, l), p ->
       |           (($terms) % 18446744073709551616::hugeint)
       |             % $divisor = ${divisor - 1}) AS bs, l
       |  FROM d
       |), cuts AS (
       |  SELECT doc_id, text,
       |         list_prepend(0, list_append(bs, l)) AS cs
       |  FROM b
       |)
       |SELECT doc_id, j AS chunk_idx,
       |       (cs[j] + 1)::int AS start,
       |       (cs[j + 1] - cs[j])::int AS chunk_len,
       |       ('0x' || substr(md5(substr(text, cs[j] + 1, cs[j + 1] - cs[j])),
       |                       1, 8))::bigint AS chunk_fp
       |FROM cuts, unnest(range(1, len(cs))) t(j)
       |ORDER BY doc_id, chunk_idx""".stripMargin
  }

  /** Z-order (Morton) interleave of two 16-bit dimensions — the
    * multi-dimensional data-layout key behind lake-house `OPTIMIZE
    * ZORDER`: rows sorted by `zvalue` cluster BOTH dimensions at once,
    * so min/max file statistics prune on either predicate (a single-
    * column sort prunes only its own column). Caller pre-buckets each
    * dimension into `[0, 65536)` (pmod / range-bucket); the interleave
    * is the classic 4-step mask spread, pure integer bit arithmetic —
    * portable to any engine verbatim.
    *
    * Scale shape: a per-row projection — ZERO shuffles here; the
    * subsequent `repartitionByRange(zvalue)` + write is where the
    * layout lands (pq2's export-shuffle discipline). */
  def zOrderKey(
      df: DataFrame,
      aCol: String,
      bCol: String,
      outCol: String = "zvalue"): DataFrame = {
    def spread(c: Column): Column = {
      var x = c.cast("long")
      x = x.bitwiseOR(shiftleft(x, 8)).bitwiseAND(lit(0x00FF00FFL))
      x = x.bitwiseOR(shiftleft(x, 4)).bitwiseAND(lit(0x0F0F0F0FL))
      x = x.bitwiseOR(shiftleft(x, 2)).bitwiseAND(lit(0x33333333L))
      x = x.bitwiseOR(shiftleft(x, 1)).bitwiseAND(lit(0x55555555L))
      x
    }
    df.withColumn(outCol,
      spread(col(aCol)).bitwiseOR(shiftleft(spread(col(bCol)), 1)))
  }

  /** The same 4-step Morton spread as a SQL expression string over
    * `x` — shared by the DuckDB oracle (operators `<<`, `&`, `|` are
    * identical integer ops there). */
  def zOrderSpreadSql(x: String): String = {
    var e = s"($x)"
    for ((shift, mask) <- Seq((8, 0x00FF00FFL), (4, 0x0F0F0F0FL),
        (2, 0x33333333L), (1, 0x55555555L)))
      e = s"((($e | ($e << $shift)) & $mask))"
    e
  }

  /** Fill-in-the-middle example construction (Bavarian et al. 2022,
    * the FIM recipe code models train on): each document's token
    * stream splits into prefix / middle / suffix at RATIONAL
    * fractions (integer arithmetic on the token count — never a float
    * boundary that could round differently), and the training example
    * is re-serialized in PSM order
    * `<PRE> prefix <SUF> suffix <MID> middle` so the model learns to
    * infill. Emits the exact segment token counts and an md5 of the
    * serialized example — the content witness an export pipeline
    * verifies end-to-end without shipping the text through the gate.
    *
    * Fractions: prefix = ⌊n·pNum/pDen⌋ tokens, middle the next
    * ⌊n·mEndNum/mEndDen⌋ − prefix tokens (mEnd is the CUMULATIVE cut),
    * suffix the rest; empty segments serialize as empty strings
    * (short docs degrade gracefully). Docs with zero tokens drop.
    *
    * Scale shape: one map-side projection per doc (tokenize, two
    * integer cuts, three joins + one hash) — no shuffle at all until
    * the caller aggregates. Returns `(id, n_tokens, n_prefix,
    * n_middle, n_suffix, fim_md5)`. */
  def fimSplit(
      df: DataFrame,
      idCol: String,
      textCol: String,
      pNum: Int = 2, pDen: Int = 5,
      mEndNum: Int = 7, mEndDen: Int = 10): DataFrame = {
    require(pNum > 0 && pNum < pDen, "prefix fraction in (0, 1)")
    require(mEndNum > 0 && mEndNum <= mEndDen, "middle-end cut in (0, 1]")
    require(pNum.toLong * mEndDen < mEndNum.toLong * pDen,
      "middle-end cut must sit past the prefix cut")
    val tk = graft.functions.TextFunctions.wsTokens(col(textCol))
    df.select(col(idCol), tk.as("__tk"))
      .withColumn("__n", size(col("__tk")).cast("long"))
      .filter(col("__n") >= 1L)
      .withColumn("__np", expr(s"(__n * $pNum) div $pDen"))
      .withColumn("__ne", expr(s"(__n * $mEndNum) div $mEndDen"))
      .select(col(idCol),
        col("__n").as("n_tokens"),
        col("__np").as("n_prefix"),
        (col("__ne") - col("__np")).as("n_middle"),
        (col("__n") - col("__ne")).as("n_suffix"),
        md5(concat(
          lit("<PRE>"),
          array_join(slice(col("__tk"), lit(1), col("__np").cast("int")),
            " "),
          lit("<SUF>"),
          array_join(slice(col("__tk"), col("__ne").cast("int") + 1,
            (col("__n") - col("__ne")).cast("int")), " "),
          lit("<MID>"),
          array_join(slice(col("__tk"), col("__np").cast("int") + 1,
            (col("__ne") - col("__np")).cast("int")), " ")))
          .as("fim_md5"))
      .orderBy(idCol)
  }
}
