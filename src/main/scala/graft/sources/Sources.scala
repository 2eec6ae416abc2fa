package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Input sources — the FileInputDataField / FileProxy surface
  * (nexus/fields.py:364-430, 12-221) re-expressed as Spark readers.
  *
  * The reference hands events a lazy file handle and chunk iterator; the
  * Spark analog is a DataFrame whose scan is already chunked, columnar,
  * and pushdown-capable. `binaryFiles` covers the opaque-payload case
  * (media blobs); `textChunks` reproduces the fixed-size byte-chunk
  * semantics for legacy handlers.
  */
object Sources {

  def parquet(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  def csv(spark: SparkSession, path: String,
      header: Boolean = true, schema: Option[StructType] = None): DataFrame = {
    val r = spark.read.option("header", header.toString)
    schema.fold(r.option("inferSchema", "true"))(r.schema).csv(path)
  }

  def json(spark: SparkSession, path: String,
      schema: Option[StructType] = None): DataFrame = {
    val r = spark.read
    schema.fold(r)(r.schema).json(path)
  }

  def text(spark: SparkSession, path: String): DataFrame =
    spark.read.text(path)

  /** Whole files as (path, modificationTime, length, content) binary rows
    * — the FileProxy analog for opaque payloads. */
  def binaryFiles(spark: SparkSession, pathGlob: String): DataFrame =
    spark.read.format("binaryFile").load(pathGlob)

  /** Fixed-size byte chunks of each file (the
    * file_stream_batch_processor semantics,
    * nexus/default_batch_processors.py:28-54) as (path, chunk_no, chunk)
    * rows — distributed, one task per file. */
  def binaryChunks(spark: SparkSession, pathGlob: String,
      chunkSize: Int = 10240): DataFrame = {
    import org.apache.spark.sql.functions._
    val files = binaryFiles(spark, pathGlob)
    files.select(col("path"), posexplode(
        transform(
          sequence(lit(0),
            ((length(col("content")) - 1) / chunkSize).cast("int")),
          i => call_function("substring",
            col("content"), i * chunkSize + 1, lit(chunkSize)))))
      .withColumnRenamed("pos", "chunk_no")
      .withColumnRenamed("col", "chunk")
  }

  /** In-memory rows (the InputDataField collection case). */
  def fromRows[T <: Product : scala.reflect.runtime.universe.TypeTag](
      spark: SparkSession, rows: Seq[T]): DataFrame =
    spark.createDataFrame(rows)
}
