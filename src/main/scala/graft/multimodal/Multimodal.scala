package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column support: image/audio/video as opaque BINARY columns
  * with a typed metadata struct, processed by per-partition batch
  * kernels.
  *
  * The Spark-side plumbing is real and tested — schemas, partitioning,
  * the `mapPartitions` kernel signature, and the batch shape (kernels
  * consume fixed-size row batches, the JVM analog of Arrow record
  * batches under `mapInPandas`). The actual codec work is STUBBED with
  * deterministic fakes (this container ships no image/audio libraries):
  * `FakeCodec` derives pixel/sample data from the bytes themselves, so
  * every downstream op (resize, frame sampling, feature extraction) is
  * reproducible and assertable. Swapping in a real codec changes ONE
  * function and no plumbing.
  *
  * Scale notes: kernels are embarrassingly parallel per partition; media
  * bytes never hit the driver; feature extraction emits fixed-width
  * float vectors that feed graft.operators.Similarity unchanged.
  */
object Multimodal {

  /** Typed metadata carried beside every media payload. */
  val mediaMetaSchema: StructType = StructType(Seq(
    StructField("format", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("sample_rate", IntegerType),
    StructField("duration_ms", LongType)))

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType),
    StructField("bytes", BinaryType),
    StructField("meta", mediaMetaSchema)))

  /** Rows per kernel batch — the `maxRecordsPerBatch` analog. */
  val KernelBatchSize = 64

  /** Build a media table from any table with an id and a binary-able
    * column (the container has no real media files; documents' UTF-8
    * bytes stand in). Kind assignment and metadata are deterministic. */
  def mediaFromDocuments(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      element_at(lit(Array("image", "audio", "video")),
        (col("doc_id") % 3).cast("int") + 1).as("kind"),
      col("text").cast("binary").as("bytes"))
      .withColumn("meta", struct(
        when(col("kind") === "image", "png")
          .when(col("kind") === "audio", "wav")
          .otherwise("mp4").as("format"),
        when(col("kind") === "image",
          (length(col("bytes")) % 64 + 16).cast("int")).as("width"),
        when(col("kind") === "image",
          (length(col("bytes")) % 48 + 16).cast("int")).as("height"),
        when(col("kind") === "audio", lit(16000)).cast("int").as("sample_rate"),
        (length(col("bytes")).cast("long") * 10).as("duration_ms")))

  // -------------------------------------------------------------------
  // STUB CODEC — deterministic fakes in place of real decoders.
  // -------------------------------------------------------------------
  object FakeCodec {
    /** "Decode" an image: an 8x8 grayscale grid where pixel (i) is a
      * rolling byte mix — a stand-in for real pixel decode. */
    def decodeImage(bytes: Array[Byte]): Array[Int] = {
      val px = new Array[Int](64)
      var acc = 17
      var i = 0
      while (i < bytes.length) {
        val slot = i % 64
        acc = (acc * 31 + (bytes(i) & 0xff)) & 0x7fffffff
        px(slot) = (px(slot) + acc) & 0xff
        i += 1
      }
      px
    }

    /** "Resample" audio: mean absolute byte value per fixed-width chunk. */
    def decodeAudio(bytes: Array[Byte], frames: Int): Array[Double] = {
      val out = new Array[Double](frames)
      if (bytes.isEmpty) return out
      val w = math.max(1, bytes.length / frames)
      var f = 0
      while (f < frames) {
        var s = 0L; var n = 0
        var i = f * w
        while (i < math.min(bytes.length, (f + 1) * w)) {
          s += math.abs(bytes(i).toInt); n += 1; i += 1
        }
        out(f) = if (n == 0) 0.0 else s.toDouble / n
        f += 1
      }
      out
    }

    /** Feature vector: `dim` floats derived from seeded rolling hashes of
      * the payload, L2-normalized — a deterministic embedding fake. */
    def features(bytes: Array[Byte], dim: Int): Array[Float] = {
      val v = new Array[Float](dim)
      var d = 0
      while (d < dim) {
        var h = 1125899906842597L + d * 2654435761L
        var i = 0
        while (i < bytes.length) {
          h = h * 31 + (bytes(i) & 0xff); i += 1
        }
        v(d) = ((h >>> 11) % 2048).toFloat / 1024.0f - 1.0f
        d += 1
      }
      val norm = math.sqrt(v.map(x => x.toDouble * x).sum).toFloat
      if (norm > 0) v.map(_ / norm) else v
    }
  }

  final case class MediaFeature(media_id: Long, kind: String, embedding: Array[Float])
  final case class ImagePixels(media_id: Long, width: Int, height: Int, pixels: Array[Int])
  final case class Frame(media_id: Long, frame_no: Int, frame_bytes: Array[Byte])

  /** Per-partition batched kernel runner: groups the partition iterator
    * into fixed-size batches (the Arrow batch shape) and applies the
    * kernel batch-at-a-time. Lazy — no partition materialization. */
  def mapBatches[T, U](it: Iterator[T], batchSize: Int)(
      kernel: Seq[T] => Iterator[U]): Iterator[U] =
    it.grouped(batchSize).flatMap(kernel)

  /** Decode stage: media → fixed-width feature vectors via the batched
    * partition kernel. Output feeds Similarity.bruteForceTopK as-is. */
  def extractFeatures(media: DataFrame, dim: Int = 64): Dataset[MediaFeature] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select("media_id", "kind", "bytes")
      .as[(Long, String, Array[Byte])]
      .mapPartitions { it =>
        mapBatches(it, KernelBatchSize) { batch =>
          batch.iterator.map { case (id, kind, bytes) =>
            MediaFeature(id, kind, FakeCodec.features(
              Option(bytes).getOrElse(Array.empty), dim))
          }
        }
      }
  }

  /** Image decode + resize to an 8x8 fake-pixel grid. */
  def decodeAndResizeImages(media: DataFrame): Dataset[ImagePixels] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.filter(col("kind") === "image")
      .select("media_id", "bytes")
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        mapBatches(it, KernelBatchSize) { batch =>
          batch.iterator.map { case (id, bytes) =>
            ImagePixels(id, 8, 8,
              FakeCodec.decodeImage(Option(bytes).getOrElse(Array.empty)))
          }
        }
      }
  }

  final case class AudioEnvelope(media_id: Long, sample_rate: Int,
      envelope: Array[Double])

  /** Audio resample: each audio row becomes a fixed-width amplitude
    * envelope (stub decode, real batched-kernel plumbing). Output feeds
    * fixed-width downstream ops (similarity, quality gates) directly. */
  def resampleAudio(media: DataFrame, frames: Int = 32): Dataset[AudioEnvelope] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.filter(col("kind") === "audio")
      .select(col("media_id"), col("bytes"),
        col("meta.sample_rate").as("sample_rate"))
      .as[(Long, Array[Byte], Int)]
      .mapPartitions { it =>
        mapBatches(it, KernelBatchSize) { batch =>
          batch.iterator.map { case (id, bytes, sr) =>
            AudioEnvelope(id, sr,
              FakeCodec.decodeAudio(Option(bytes).getOrElse(Array.empty), frames))
          }
        }
      }
  }

  /** Frame sampling for video rows: every `stride`-th fixed-size chunk of
    * the payload becomes a frame (flatMap — one row in, many out). */
  def sampleFrames(
      media: DataFrame,
      frameBytes: Int = 256,
      stride: Int = 4): Dataset[Frame] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.filter(col("kind") === "video")
      .select("media_id", "bytes")
      .as[(Long, Array[Byte])]
      .flatMap { case (id, bytes) =>
        val b = Option(bytes).getOrElse(Array.empty)
        b.grouped(frameBytes).zipWithIndex.collect {
          case (chunk, i) if i % stride == 0 => Frame(id, i, chunk)
        }
      }
  }
}
