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
  * batches under `mapInPandas`). IMAGES decode for REAL via
  * [[ImageIoCodec]] (javax.imageio — pure JVM, ships in the JDK:
  * PNG/JPEG/GIF/BMP) and WAV AUDIO decodes for REAL via [[WavCodec]]
  * (javax.sound.sampled — also JDK-shipped). Compressed audio and
  * video codec work stays STUBBED with deterministic fakes
  * (`FakeCodec` — the container ships no mp3/ogg/video libraries):
  * pixel/sample data derives from the bytes themselves, so every
  * downstream op (resize, frame sampling, feature extraction) is
  * reproducible and assertable. Swapping in a real codec changes ONE
  * function and no plumbing, exactly as the image and WAV paths
  * demonstrate.
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

  // -------------------------------------------------------------------
  // REAL IMAGE CODEC — javax.imageio (pure JVM, ships in the JDK).
  // Images are the one modality this environment can decode for real;
  // audio/video keep the documented FakeCodec boundary (no codec libs
  // in the container).
  // -------------------------------------------------------------------
  object ImageIoCodec {
    import java.awt.image.BufferedImage

    // ImageIO defaults to a DISK-backed stream cache: one temp file per
    // decode, pure churn for byte-array payloads on a busy executor
    javax.imageio.ImageIO.setUseCache(false)

    /** Deterministic test/gate image: a gradient pattern where pixel
      * (x, y) has gray g = (id*7 + x*11 + y*ySlope + offset) mod 256
      * stored as r=g=b (TYPE_INT_RGB → PNG is a lossless byte-exact
      * round trip; TYPE_BYTE_GRAY would gamma-convert under getRGB).
      * Because g has a closed form in (id, x, y), a SQL oracle can
      * replay the full real encode→decode→box-filter chain without
      * decoding anything itself. `offset` shifts brightness (the
      * near-duplicate knob for perceptual-hash gates); ySlope=0 keeps
      * the mm5 column-stripe form. */
    def stripePng(mediaId: Long, w: Int, h: Int,
        offset: Long = 0L, ySlope: Int = 0,
        xSlope: Long = 11L): Array[Byte] = {
      val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
      var x = 0
      while (x < w) {
        var y = 0
        while (y < h) {
          val g = (((mediaId * 7 + x * xSlope + y.toLong * ySlope + offset)
            % 256 + 256) % 256).toInt
          img.setRGB(x, y, (g << 16) | (g << 8) | g)
          y += 1
        }
        x += 1
      }
      val out = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", out)
      out.toByteArray
    }

    /** Real decode; None for bytes no installed reader accepts — a
      * 100 TB corpus always contains corrupt media, and one bad file
      * must drop, not kill the job. */
    def decode(bytes: Array[Byte]): Option[BufferedImage] =
      try Option(javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(bytes)))
      catch { case scala.util.control.NonFatal(_) => None }

    /** Integer luma (ITU-R BT.601 weights, floor division) — exact and
      * engine-portable, unlike float luma. */
    def luma(rgb: Int): Int = {
      val r = (rgb >> 16) & 0xff; val g = (rgb >> 8) & 0xff; val b = rgb & 0xff
      (299 * r + 587 * g + 114 * b) / 1000
    }

    /** Full luma plane in one bulk read per row — per-pixel getRGB goes
      * through the color model on every call, ~10x slower on real-sized
      * images. Row-major, length w*h. */
    def lumaPlane(img: BufferedImage): Array[Int] = {
      val w = img.getWidth; val h = img.getHeight
      val out = new Array[Int](w * h)
      val row = new Array[Int](w)
      var y = 0
      while (y < h) {
        img.getRGB(0, y, w, 1, row, 0, w)
        var x = 0
        while (x < w) { out(y * w + x) = luma(row(x)); x += 1 }
        y += 1
      }
      out
    }

    /** Box-filter downsample of the luma plane to a gw x gh grid:
      * cell value = floor(mean of covered pixels). Explicit integer
      * loop, not Graphics2D scaling — deterministic on every JVM. */
    def grayGrid(img: BufferedImage, gw: Int, gh: Int): Array[Int] = {
      val w = img.getWidth; val h = img.getHeight
      val plane = lumaPlane(img)
      val out = new Array[Int](gw * gh)
      var cy = 0
      while (cy < gh) {
        val y0 = cy * h / gh; val y1 = math.max(y0 + 1, (cy + 1) * h / gh)
        var cx = 0
        while (cx < gw) {
          val x0 = cx * w / gw; val x1 = math.max(x0 + 1, (cx + 1) * w / gw)
          var s = 0L; var n = 0
          var y = y0
          while (y < math.min(y1, h)) {
            var x = x0
            while (x < math.min(x1, w)) { s += plane(y * w + x); n += 1; x += 1 }
            y += 1
          }
          out(cy * gw + cx) = (s / n).toInt
          cx += 1
        }
        cy += 1
      }
      out
    }
  }

  final case class GridCell(media_id: Long, width: Int, height: Int,
      cy: Int, cx: Int, gray: Int)

  /** Deterministic REAL-PNG media table: one stripe-pattern PNG per id,
    * encoded on the executors through the batched kernel (media bytes
    * never touch the driver). Pairs with [[decodeImageGrid]] for an
    * end-to-end real encode→decode gate whose expected values have a
    * closed form in (id, x). */
  def stripeImages(
      ids: DataFrame, idCol: String, w: Int, h: Int,
      pattern: Option[org.apache.spark.sql.Column] = None,
      offset: Option[org.apache.spark.sql.Column] = None,
      ySlope: Int = 0,
      xSlope: Option[org.apache.spark.sql.Column] = None): DataFrame = {
    val spark = ids.sparkSession
    import spark.implicits._
    ids.select(col(idCol).cast("long"),
        pattern.getOrElse(col(idCol)).cast("long"),
        offset.getOrElse(lit(0L)).cast("long"),
        xSlope.getOrElse(lit(11L)).cast("long"))
      .as[(Long, Long, Long, Long)]
      .mapPartitions { it =>
        mapBatches(it, KernelBatchSize) { batch =>
          batch.iterator.map { case (id, pat, off, xs) =>
            (id, ImageIoCodec.stripePng(pat, w, h, off, ySlope, xs))
          }
        }
      }
      .toDF("media_id", "bytes")
  }

  final case class ImageHash(media_id: Long, dhash: Long)

  /** Perceptual image hash (dHash): REAL decode, box-filter the luma
    * plane to a (gw+1) x gh grid, one bit per horizontal gradient —
    * bit (r*gw + c) set iff cell(r, c+1) > cell(r, c). Brightness and
    * contrast shifts preserve gradients, so near-identical images land
    * within a small Hamming distance; pair them with
    * `Dedup.hammingPairs64` (pigeonhole banding — never a cartesian).
    * The image analog of SimHash for text: the dedup operator a
    * multimodal training corpus needs. Undecodable payloads drop. */
  def imageDHash(media: DataFrame, gw: Int = 8, gh: Int = 8): Dataset[ImageHash] = {
    require(gw * gh <= 64, "dHash must fit in 64 bits")
    val spark = media.sparkSession
    import spark.implicits._
    media.select("media_id", "bytes")
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        mapBatches(it, KernelBatchSize) { batch =>
          batch.iterator.flatMap { case (id, bytes) =>
            ImageIoCodec.decode(Option(bytes).getOrElse(Array.empty)).map { img =>
              val grid = ImageIoCodec.grayGrid(img, gw + 1, gh)
              var h = 0L
              var r = 0
              while (r < gh) {
                var c = 0
                while (c < gw) {
                  if (grid(r * (gw + 1) + c + 1) > grid(r * (gw + 1) + c))
                    h |= 1L << (r * gw + c)
                  c += 1
                }
                r += 1
              }
              ImageHash(id, h)
            }
          }
        }
      }
  }

  /** REAL image decode + box-filter resize through the same batched
    * partition kernel as the stub paths: PNG/JPEG bytes → luma grid
    * cells, one row per cell. Undecodable payloads drop (flatMap), so a
    * corrupt file costs one row, never the job. */
  def decodeImageGrid(
      media: DataFrame, gridW: Int = 8, gridH: Int = 8): Dataset[GridCell] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select("media_id", "bytes")
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        mapBatches(it, KernelBatchSize) { batch =>
          batch.iterator.flatMap { case (id, bytes) =>
            ImageIoCodec.decode(Option(bytes).getOrElse(Array.empty)).iterator
              .flatMap { img =>
                val grid = ImageIoCodec.grayGrid(img, gridW, gridH)
                (0 until gridH).iterator.flatMap(cy => (0 until gridW).map(cx =>
                  GridCell(id, img.getWidth, img.getHeight, cy, cx,
                    grid(cy * gridW + cx))))
              }
          }
        }
      }
  }

  final case class ImageStats(media_id: Long, width: Int, height: Int,
      luma_sum: Long, luma_sumsq: Long, luma_min: Int, luma_max: Int)

  /** Full-resolution luma statistics per image over the REAL codec —
    * the standard dark/flat-image quality gate for a multimodal corpus
    * (filter on mean brightness and min-max contrast before paying for
    * feature extraction). All outputs are integer-EXACT (sums, not
    * means — callers derive mean/variance with their own rounding
    * policy), so they replay bit-for-bit in any engine. Undecodable
    * payloads drop. */
  def imageStats(media: DataFrame): Dataset[ImageStats] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select("media_id", "bytes")
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        mapBatches(it, KernelBatchSize) { batch =>
          batch.iterator.flatMap { case (id, bytes) =>
            ImageIoCodec.decode(Option(bytes).getOrElse(Array.empty)).map { img =>
              val plane = ImageIoCodec.lumaPlane(img)
              var s = 0L; var ss = 0L
              var mn = 255; var mx = 0
              var i = 0
              while (i < plane.length) {
                val g = plane(i)
                s += g; ss += g.toLong * g
                if (g < mn) mn = g
                if (g > mx) mx = g
                i += 1
              }
              ImageStats(id, img.getWidth, img.getHeight, s, ss, mn, mx)
            }
          }
        }
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

  // -------------------------------------------------------------------
  // REAL AUDIO CODEC — javax.sound.sampled (pure JVM, ships in the
  // JDK: WAV/AIFF/AU containers, PCM payloads). WAV joins images as a
  // modality this environment decodes for REAL; compressed audio
  // (mp3/ogg) and video keep the documented FakeCodec boundary.
  // -------------------------------------------------------------------
  object WavCodec {

    /** Deterministic test/gate waveform: sample t of media `id` is the
      * integer closed form ((id*7 + t*11) mod 4001) − 2000 — the audio
      * analog of [[ImageIoCodec.stripePng]]'s gradient. Integer-modular
      * (no float sin), so a SQL oracle replays the full real
      * encode→decode→stats chain without decoding anything itself. */
    def patternSamples(id: Long, n: Int): Array[Short] = {
      val out = new Array[Short](n)
      var t = 0
      while (t < n) {
        out(t) = (((id * 7 + t.toLong * 11) % 4001) - 2000).toShort
        t += 1
      }
      out
    }

    /** Encode PCM16 mono little-endian samples as a WAV (RIFF) file —
      * the 44-byte canonical header + payload, written by hand so the
      * encoder has zero dependencies and a fixed byte layout. */
    def encodeWav(samples: Array[Short], sampleRate: Int): Array[Byte] = {
      val dataLen = samples.length * 2
      val buf = java.nio.ByteBuffer.allocate(44 + dataLen)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
        .put("WAVE".getBytes("US-ASCII"))
        .put("fmt ".getBytes("US-ASCII")).putInt(16)
        .putShort(1)                       // PCM
        .putShort(1)                       // mono
        .putInt(sampleRate)
        .putInt(sampleRate * 2)            // byte rate
        .putShort(2)                       // block align
        .putShort(16)                      // bits per sample
        .put("data".getBytes("US-ASCII")).putInt(dataLen)
      var i = 0
      while (i < samples.length) { buf.putShort(samples(i)); i += 1 }
      buf.array()
    }

    /** REAL decode via AudioSystem: container + format parsing is the
      * JDK's, not ours. Returns (sampleRate, samples) for 16-bit PCM;
      * None for bytes no installed reader accepts or non-16-bit
      * payloads — corrupt media drops a row, never the job. */
    def decode(bytes: Array[Byte]): Option[(Int, Array[Short])] =
      try {
        val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(bytes))
        try {
          val fmt = ais.getFormat
          if (fmt.getSampleSizeInBits != 16 ||
              fmt.getEncoding !=
                javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED)
            None
          else {
            val raw = ais.readAllBytes()
            val bb = java.nio.ByteBuffer.wrap(raw).order(
              if (fmt.isBigEndian) java.nio.ByteOrder.BIG_ENDIAN
              else java.nio.ByteOrder.LITTLE_ENDIAN)
            val ch = fmt.getChannels
            val nFrames = raw.length / (2 * ch)
            val out = new Array[Short](nFrames)
            var f = 0
            while (f < nFrames) {
              out(f) = bb.getShort(f * 2 * ch) // channel 0
              f += 1
            }
            Some((fmt.getSampleRate.toInt, out))
          }
        } finally ais.close()
      } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** Deterministic REAL-WAV media table: one pattern waveform per id,
    * encoded on the executors through the batched kernel. Pairs with
    * [[decodeAudioStats]] for an end-to-end real encode→decode gate
    * whose expected values have a closed form in (id, t). */
  def patternWavs(
      ids: DataFrame, idCol: String, nSamples: org.apache.spark.sql.Column,
      sampleRate: Int = 16000,
      muteLead: org.apache.spark.sql.Column = lit(0),
      muteTail: org.apache.spark.sql.Column = lit(0)): DataFrame = {
    val spark = ids.sparkSession
    import spark.implicits._
    // muteLead/muteTail zero that many leading/trailing samples BEFORE
    // the encode — deterministic silence regions for trim/VAD gates,
    // still closed-form replayable (CASE over the sample index)
    ids.select(col(idCol).cast("long"), nSamples.cast("int"),
      muteLead.cast("int"), muteTail.cast("int"))
      .as[(Long, Int, Int, Int)]
      .mapPartitions { it =>
        mapBatches(it, KernelBatchSize) { batch =>
          batch.iterator.map { case (id, n, lead, tail) =>
            val s = WavCodec.patternSamples(id, n)
            var i = 0
            while (i < math.min(lead, n)) { s(i) = 0; i += 1 }
            i = math.max(0, n - tail)
            while (i < n) { s(i) = 0; i += 1 }
            (id, WavCodec.encodeWav(s, sampleRate))
          }
        }
      }
      .toDF("media_id", "bytes")
  }

  /** Leading/trailing-silence trim boundaries from [[audioFrameFeatures]]
    * output: per clip, the frame count, voiced-frame count, and the
    * first/last frame whose energy reaches `energyThreshold` — the
    * cut points a trim pass applies (NULL boundaries = an all-silent
    * clip the pipeline drops). Pure bounded aggregate, zero shuffles
    * beyond the |clips|-ary groupBy. */
  def silenceTrim(frames: DataFrame, energyThreshold: Long): DataFrame = {
    val voiced = col("energy") >= energyThreshold
    frames.groupBy("media_id")
      .agg(
        count(lit(1)).as("n_frames"),
        sum(when(voiced, 1L).otherwise(0L)).as("n_voiced"),
        min(when(voiced, col("frame_no"))).as("first_voiced"),
        max(when(voiced, col("frame_no"))).as("last_voiced"))
      .orderBy("media_id")
  }

  final case class AudioStats(media_id: Long, sample_rate: Int,
      n_samples: Long, amp_sum: Long, amp_sumsq: Long,
      amp_min: Int, amp_max: Int)

  /** Full-stream sample statistics per audio row over the REAL codec —
    * the silence/clipping quality gate for an audio corpus (mean level,
    * dynamic range) in integer-EXACT form, the audio analog of
    * [[imageStats]]. Undecodable payloads drop. */
  def decodeAudioStats(media: DataFrame): Dataset[AudioStats] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select("media_id", "bytes")
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        mapBatches(it, KernelBatchSize) { batch =>
          batch.iterator.flatMap { case (id, bytes) =>
            WavCodec.decode(Option(bytes).getOrElse(Array.empty)).map {
              case (sr, samples) =>
                var s = 0L; var ss = 0L
                var mn = Int.MaxValue; var mx = Int.MinValue
                var i = 0
                while (i < samples.length) {
                  val v = samples(i).toInt
                  s += v; ss += v.toLong * v
                  if (v < mn) mn = v
                  if (v > mx) mx = v
                  i += 1
                }
                AudioStats(id, sr, samples.length.toLong, s, ss,
                  if (samples.isEmpty) 0 else mn,
                  if (samples.isEmpty) 0 else mx)
            }
          }
        }
      }
  }

  final case class AudioFrameRow(media_id: Long, frame_no: Int, n: Int,
      energy: Long, zero_crossings: Int, peak: Int)

  /** Frame-level audio features over the REAL codec: each decoded
    * stream tiles into fixed `frameLen`-sample windows (10 ms at 16 kHz
    * with the default 160) reducing to integer-EXACT per-frame energy
    * (Σv²), zero-crossing count (sign flips between consecutive
    * in-frame samples — the classic voiced/unvoiced discriminator),
    * and peak amplitude — the standard VAD / silence-trim front end of
    * an audio curation pipeline. A trailing partial frame keeps its
    * true `n`. Undecodable payloads drop (one row lost, never the
    * job). All stats are integers, so the whole frame table is
    * hash-comparable against a closed-form waveform replay.
    *
    * Scale shape: pure batched partition kernel — zero shuffles; rows
    * out = rows in × frames-per-clip (bounded by clip length / 160). */
  def audioFrameFeatures(
      media: DataFrame, frameLen: Int = 160): Dataset[AudioFrameRow] = {
    require(frameLen > 0, "frameLen must be positive")
    val spark = media.sparkSession
    import spark.implicits._
    media.select("media_id", "bytes")
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        mapBatches(it, KernelBatchSize) { batch =>
          batch.iterator.flatMap { case (id, bytes) =>
            WavCodec.decode(Option(bytes).getOrElse(Array.empty)).iterator
              .flatMap { case (_, samples) =>
                val nFrames = (samples.length + frameLen - 1) / frameLen
                (0 until nFrames).iterator.map { f =>
                  val start = f * frameLen
                  val end = math.min(start + frameLen, samples.length)
                  var e = 0L; var zc = 0; var peak = 0
                  var i = start
                  while (i < end) {
                    val v = samples(i).toInt
                    e += v.toLong * v
                    val a = if (v < 0) -v else v
                    if (a > peak) peak = a
                    if (i > start &&
                      (v >= 0) != (samples(i - 1).toInt >= 0)) zc += 1
                    i += 1
                  }
                  AudioFrameRow(id, f, end - start, e, zc, peak)
                }
              }
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

  final case class FrameGridRow(video_id: Long, frame_no: Int, grid: Array[Int])

  /** REAL decode of per-frame images into luma grids, keyed by
    * (video, frame) — the per-frame half of [[sceneCuts]]. Undecodable
    * frames drop (a corrupt frame costs one row, never the job). */
  def frameGrids(
      frames: DataFrame, gridW: Int = 8, gridH: Int = 8): Dataset[FrameGridRow] = {
    val spark = frames.sparkSession
    import spark.implicits._
    frames.select("video_id", "frame_no", "bytes")
      .as[(Long, Int, Array[Byte])]
      .mapPartitions { it =>
        mapBatches(it, KernelBatchSize) { batch =>
          batch.iterator.flatMap { case (vid, f, bytes) =>
            ImageIoCodec.decode(Option(bytes).getOrElse(Array.empty)).map(img =>
              FrameGridRow(vid, f, ImageIoCodec.grayGrid(img, gridW, gridH)))
          }
        }
      }
  }

  /** Scene-cut detection over decoded frame sequences: each adjacent
    * frame pair's luma grids are compared by SAD (sum of absolute cell
    * differences — the classic shot-boundary signal), and a cut fires
    * where SAD exceeds `sadThreshold`. Integer-exact end to end (luma,
    * box filter, SAD all integer), so the verdict replays in any
    * engine.
    *
    * Scale shape: decode is a per-row partition kernel (no shuffle);
    * the ONLY shuffle keys on the video id for the lag() window, whose
    * partition is one video's frame list — bounded by clip length, the
    * same invariant sessionization relies on. Nothing compares frames
    * across videos. Frame 0 of each video has no predecessor and is
    * not scored. */
  def sceneCuts(
      frames: DataFrame,
      gridW: Int = 8,
      gridH: Int = 8,
      sadThreshold: Long = 1000L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("video_id").orderBy("frame_no")
    frameGrids(frames, gridW, gridH).toDF()
      .withColumn("__prev", lag("grid", 1).over(w))
      .filter(col("__prev").isNotNull)
      .select(col("video_id"), col("frame_no"),
        expr("""aggregate(zip_with(grid, __prev, (a, b) -> abs(a - b)),
               |0L, (s, x) -> s + x)""".stripMargin).as("sad"))
      .withColumn("is_cut", col("sad") > sadThreshold)
      .orderBy("video_id", "frame_no")
  }

  /** Static/duplicate-frame video audit over decoded frame sequences —
    * the cheapest video-quality gate there is: a clip whose frames are
    * (near-)all identical is a still image wearing a video container
    * (slideshows, corrupted encodes, placeholder loops) and carries no
    * temporal signal worth training on. Frames are compared by their
    * EXACT luma grids ([[frameGrids]] — integer box-filtered cells),
    * so "duplicate" means bit-identical content at grid resolution and
    * the verdict replays in any engine; [[sceneCuts]] answers the
    * complementary "where does it change" question.
    *
    * Scale shape: decode is a per-row partition kernel; the only
    * shuffle groups on (video, grid) then video — both bounded by
    * clip length. Returns `(video_id, n_frames, n_distinct,
    * dup_ratio, is_static)`. */
  def staticVideoAudit(
      frames: DataFrame,
      gridW: Int = 8,
      gridH: Int = 8): DataFrame = {
    frameGrids(frames, gridW, gridH).toDF()
      .groupBy("video_id", "grid")
      .agg(count(lit(1)).as("__n"))
      .groupBy("video_id")
      .agg(sum(col("__n")).as("n_frames"),
        count(lit(1)).as("n_distinct"))
      .select(col("video_id"), col("n_frames"), col("n_distinct"),
        graft.operators.Readout.pin(
          lit(1.0) - col("n_distinct").cast("double") /
            col("n_frames").cast("double"), 6).as("dup_ratio"),
        (col("n_distinct") === 1L && col("n_frames") > 1L)
          .as("is_static"))
      .orderBy("video_id")
  }

  // -------------------------------------------------------------------
  // CONTAINER CODEC — real MP4 box trees and Ogg pages, pure JVM.
  // -------------------------------------------------------------------

  /** Real compressed-media CONTAINER structure without frame decode:
    * writes spec-valid MP4 box trees (ftyp/moov/mvhd/trak/tkhd/mdia/
    * mdhd/hdlr/minf/stbl/stsd/mdat, ISO 14496-12 layout) and Ogg pages
    * (RFC 3533 framing with real page CRCs + a Vorbis identification
    * header), and parses them back — duration, track layout, codec
    * tags, stream parameters. This shrinks the [[FakeCodec]] boundary
    * to frame DECODE only: a corpus-audit pipeline can inventory real
    * mp4/ogg files (what's in this bucket? how many hours? which
    * codecs? truncated?) with no codec library at all, because
    * container metadata lives in the framing, not the frames.
    *
    * The parser is defensive the way a 100 TB crawl requires: every
    * box/page is bounds-checked, unknown boxes skip by size, 64-bit
    * largesize and size-to-end boxes are handled, Ogg page CRCs are
    * verified — a container either parses cleanly or returns None
    * (land it in a quarantine bucket, don't crash the executor). */
  object ContainerCodec {

    final case class ContainerInfo(
        container: String, codecs: String, tracks: Int, channels: Int,
        sampleRate: Int, durationMs: Long, units: Int, payloadBytes: Long)

    // ---- byte helpers (big-endian for MP4, little-endian for Ogg) ----
    private def be16(v: Int): Array[Byte] =
      Array(((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
    private def be32(v: Long): Array[Byte] =
      Array(((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
        ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
    private def le32(v: Long): Array[Byte] =
      Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
        ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
    private def le64(v: Long): Array[Byte] =
      le32(v & 0xffffffffL) ++ le32(v >>> 32)
    private def ascii(s: String): Array[Byte] =
      s.getBytes(java.nio.charset.StandardCharsets.US_ASCII)
    private def u32(b: Array[Byte], off: Int): Long =
      ((b(off) & 0xffL) << 24) | ((b(off + 1) & 0xffL) << 16) |
        ((b(off + 2) & 0xffL) << 8) | (b(off + 3) & 0xffL)
    private def u64(b: Array[Byte], off: Int): Long =
      (u32(b, off) << 32) | u32(b, off + 4)
    private def leU32(b: Array[Byte], off: Int): Long =
      (b(off) & 0xffL) | ((b(off + 1) & 0xffL) << 8) |
        ((b(off + 2) & 0xffL) << 16) | ((b(off + 3) & 0xffL) << 24)
    private def leU64(b: Array[Byte], off: Int): Long =
      leU32(b, off) | (leU32(b, off + 4) << 32)
    private def fourcc(b: Array[Byte], off: Int): String =
      new String(b, off, 4, java.nio.charset.StandardCharsets.US_ASCII)

    // ---- MP4 writer ----
    private def box(tpe: String, parts: Array[Byte]*): Array[Byte] = {
      val payload = parts.foldLeft(Array.empty[Byte])(_ ++ _)
      be32(8L + payload.length) ++ ascii(tpe) ++ payload
    }
    private def full(version: Int, flags: Int): Array[Byte] =
      Array((version & 0xff).toByte, ((flags >> 16) & 0xff).toByte,
        ((flags >> 8) & 0xff).toByte, (flags & 0xff).toByte)
    private val unityMatrix: Array[Byte] =
      be32(0x00010000L) ++ be32(0) ++ be32(0) ++
        be32(0) ++ be32(0x00010000L) ++ be32(0) ++
        be32(0) ++ be32(0) ++ be32(0x40000000L)

    private def trak(
        trackId: Int, handler: String, codec: String,
        durTicks: Long): Array[Byte] = {
      val tkhd = box("tkhd", full(0, 7), be32(0), be32(0), be32(trackId),
        be32(0), be32(durTicks), new Array[Byte](8), be16(0), be16(0),
        be16(if (handler == "soun") 0x0100 else 0), be16(0), unityMatrix,
        be32(0), be32(0))
      val mdhd = box("mdhd", full(0, 0), be32(0), be32(0), be32(1000),
        be32(durTicks), be16(0x55c4), be16(0))
      val hdlr = box("hdlr", full(0, 0), be32(0), ascii(handler),
        new Array[Byte](12), Array[Byte](0))
      val entry = be32(16) ++ ascii(codec) ++ new Array[Byte](6) ++ be16(1)
      val stsd = box("stsd", full(0, 0), be32(1), entry)
      box("trak", tkhd, box("mdia", mdhd, hdlr,
        box("minf", box("stbl", stsd))))
    }

    /** Spec-valid minimal MP4: `isom` brand, movie + per-track
      * timescale 1000 (so `durationTicks` IS milliseconds), one video
      * track (`avc1`), an optional audio track (`mp4a`), and the
      * payload as `mdat`. */
    def encodeMp4(
        durationTicks: Long,
        audioTrack: Boolean,
        payload: Array[Byte]): Array[Byte] = {
      val ftyp = box("ftyp", ascii("isom"), be32(0x200), ascii("isom"),
        ascii("mp42"))
      val mvhd = box("mvhd", full(0, 0), be32(0), be32(0), be32(1000),
        be32(durationTicks), be32(0x00010000L), be16(0x0100), be16(0),
        new Array[Byte](8), unityMatrix, new Array[Byte](24),
        be32(if (audioTrack) 3 else 2))
      val traks = trak(1, "vide", "avc1", durationTicks) ++
        (if (audioTrack) trak(2, "soun", "mp4a", durationTicks)
         else Array.empty[Byte])
      ftyp ++ box("moov", mvhd ++ traks) ++ box("mdat", payload)
    }

    // ---- Ogg writer (RFC 3533) ----
    private val crcTable: Array[Int] = {
      val t = new Array[Int](256)
      var i = 0
      while (i < 256) {
        var r = i << 24
        var j = 0
        while (j < 8) {
          r = if ((r & 0x80000000) != 0) (r << 1) ^ 0x04c11db7 else r << 1
          j += 1
        }
        t(i) = r
        i += 1
      }
      t
    }
    /** The Ogg page CRC: forward CRC-32, poly 0x04C11DB7, zero init,
      * no reflection, no final xor — computed over the page with the
      * CRC field zeroed. */
    def oggCrc(b: Array[Byte]): Int = {
      var crc = 0
      var i = 0
      while (i < b.length) {
        crc = (crc << 8) ^ crcTable(((crc >>> 24) ^ (b(i) & 0xff)) & 0xff)
        i += 1
      }
      crc
    }
    private def lacing(len: Int): Array[Byte] =
      Array.fill(len / 255)(255.toByte) ++ Array((len % 255).toByte)

    private def page(
        headerType: Int, granule: Long, serial: Int, seq: Int,
        payload: Array[Byte]): Array[Byte] = {
      val segs = lacing(payload.length)
      require(segs.length <= 255,
        s"page payload ${payload.length} B needs ${segs.length} lacing " +
          "segments (RFC 3533 caps a page at 255) — split into more pages")
      val full = ascii("OggS") ++ Array[Byte](0, headerType.toByte) ++
        le64(granule) ++ le32(serial.toLong & 0xffffffffL) ++
        le32(seq.toLong) ++ le32(0) ++
        Array((segs.length & 0xff).toByte) ++ segs ++ payload
      val crc = oggCrc(full)
      System.arraycopy(le32(crc.toLong & 0xffffffffL), 0, full, 22, 4)
      full
    }

    /** Spec-valid Ogg/Vorbis stream: a BOS page carrying the Vorbis
      * identification header (channels + sample rate), then
      * `bodyPages` payload pages splitting `payload` contiguously,
      * granule positions rising to `granule` on the EOS page. Every
      * page carries its real CRC. */
    def encodeOggVorbis(
        serial: Int, channels: Int, rate: Int, granule: Long,
        bodyPages: Int, payload: Array[Byte]): Array[Byte] = {
      require(bodyPages >= 1, "at least one body page")
      val idHeader = Array[Byte](1) ++ ascii("vorbis") ++ le32(0) ++
        Array((channels & 0xff).toByte) ++ le32(rate.toLong) ++
        le32(0) ++ le32(0) ++ le32(0) ++ Array(0xb8.toByte, 1.toByte)
      val out = new java.io.ByteArrayOutputStream()
      out.write(page(0x02, 0L, serial, 0, idHeader))
      var k = 0
      while (k < bodyPages) {
        val from = (payload.length.toLong * k / bodyPages).toInt
        val to = (payload.length.toLong * (k + 1) / bodyPages).toInt
        val g = granule * (k + 1) / bodyPages
        val ht = if (k == bodyPages - 1) 0x04 else 0
        out.write(page(ht, g, serial, k + 1,
          java.util.Arrays.copyOfRange(payload, from, to)))
        k += 1
      }
      out.toByteArray
    }

    // ---- MPEG audio (MP3) writer ----
    /** MPEG-1 Layer III bitrate table (kbps), indexed by the 4-bit
      * header field — public ISO 11172-3 constants. */
    private val mp3BitrateKbps = Array(
      0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, 0)
    private val mp3SampleRate = Array(44100, 48000, 32000, 0)

    private def syncsafe(v: Int): Array[Byte] =
      Array(((v >> 21) & 0x7f).toByte, ((v >> 14) & 0x7f).toByte,
        ((v >> 7) & 0x7f).toByte, (v & 0x7f).toByte)

    /** Spec-valid CBR MP3: an ID3v2.3 tag carrying `tagBody` (a real
      * syncsafe-sized tag — the payload vehicle, like mdat/Ogg body
      * pages), then `frames` MPEG-1 Layer III frame headers with
      * correct frame lengths (144·bitrate/sampleRate, zero padding)
      * and deterministic frame bodies. */
    def encodeMp3(
        bitrateIdx: Int, srIdx: Int, mono: Boolean, frames: Int,
        tagBody: Array[Byte]): Array[Byte] = {
      require(bitrateIdx >= 1 && bitrateIdx <= 14, "bitrate index 1..14")
      require(srIdx >= 0 && srIdx <= 2, "sample-rate index 0..2")
      require(frames >= 1, "at least one frame")
      require(tagBody.length < (1 << 28), "ID3v2 syncsafe size is 28-bit")
      val out = new java.io.ByteArrayOutputStream()
      out.write(ascii("ID3"))
      out.write(Array[Byte](3, 0, 0))
      out.write(syncsafe(tagBody.length))
      out.write(tagBody)
      val frameLen =
        144 * (mp3BitrateKbps(bitrateIdx) * 1000) / mp3SampleRate(srIdx)
      var i = 0
      while (i < frames) {
        // 0xFF 0xFB = sync + MPEG-1 + Layer III + no CRC
        out.write(Array[Byte](0xff.toByte, 0xfb.toByte,
          ((bitrateIdx << 4) | (srIdx << 2)).toByte,
          (if (mono) 0xc0 else 0x00).toByte))
        var j = 4
        while (j < frameLen) { out.write((i * 31 + j * 7) & 0xff); j += 1 }
        i += 1
      }
      out.toByteArray
    }

    private def parseMp3(b: Array[Byte]): Option[ContainerInfo] = {
      // ID3v2 header: "ID3" + version(2) + flags(1) + syncsafe size(4)
      if (b.length < 10) return None
      val tagBytes = ((b(6) & 0x7f) << 21) | ((b(7) & 0x7f) << 14) |
        ((b(8) & 0x7f) << 7) | (b(9) & 0x7f)
      var off = 10 + tagBytes
      if (off > b.length) return None
      var frames = 0
      var kbps = 0
      var rate = 0
      var channels = 0
      while (off < b.length) {
        if (off + 4 > b.length || (b(off) & 0xff) != 0xff ||
            (b(off + 1) & 0xe0) != 0xe0) return None
        val versionBits = (b(off + 1) >> 3) & 3
        val layerBits = (b(off + 1) >> 1) & 3
        if (versionBits != 3 || layerBits != 1) return None // MPEG-1 L3
        val bIdx = (b(off + 2) >> 4) & 15
        val sIdx = (b(off + 2) >> 2) & 3
        val padding = (b(off + 2) >> 1) & 1
        if (bIdx < 1 || bIdx > 14 || sIdx > 2) return None
        kbps = mp3BitrateKbps(bIdx)
        rate = mp3SampleRate(sIdx)
        channels = if (((b(off + 3) >> 6) & 3) == 3) 1 else 2
        val frameLen = 144 * (kbps * 1000) / rate + padding
        if (frameLen < 4 || off + frameLen > b.length) return None
        frames += 1
        off += frameLen
      }
      if (frames == 0 || off != b.length) None
      // MPEG-1 Layer III: 1152 samples per frame
      else Some(ContainerInfo("mp3", "mp3", 1, channels, rate,
        frames.toLong * 1152 * 1000 / rate, frames, tagBytes.toLong))
    }

    // ---- parsers ----
    /** Dispatch on the container magic; None for anything that does
      * not parse CLEANLY end-to-end (quarantine, not crash). */
    def parse(bytes: Array[Byte]): Option[ContainerInfo] = {
      val b = Option(bytes).getOrElse(Array.empty)
      if (b.length >= 12 && fourcc(b, 4) == "ftyp") parseMp4(b)
      else if (b.length >= 27 && fourcc(b, 0) == "OggS") parseOgg(b)
      else if (b.length >= 10 && b(0) == 'I' && b(1) == 'D' && b(2) == '3')
        parseMp3(b)
      else None
    }

    private def parseMp4(b: Array[Byte]): Option[ContainerInfo] = {
      var boxes = 0
      var tracks = 0
      var timescale = 0L
      var dur = 0L
      var payloadBytes = 0L
      var ok = true
      val handlers = scala.collection.mutable.ArrayBuffer.empty[String]
      val codecs = scala.collection.mutable.ArrayBuffer.empty[String]
      def walk(start: Int, end: Int): Unit = {
        var off = start
        while (ok && off + 8 <= end) {
          var size = u32(b, off)
          var hdr = 8
          val tpe = fourcc(b, off + 4)
          if (size == 1L) { // 64-bit largesize
            if (off + 16 > end) { ok = false; return }
            size = u64(b, off + 8); hdr = 16
          } else if (size == 0L) size = (end - off).toLong // to end
          if (size < hdr || off + size > end) { ok = false; return }
          boxes += 1
          val e = (off + size).toInt
          tpe match {
            case "moov" | "mdia" | "minf" | "stbl" => walk(off + hdr, e)
            case "trak" => tracks += 1; walk(off + hdr, e)
            case "mvhd" if off + hdr + 20 <= e =>
              if ((b(off + hdr) & 0xff) == 1) { // v1: 64-bit times
                if (off + hdr + 32 <= e) {
                  timescale = u32(b, off + hdr + 20)
                  dur = u64(b, off + hdr + 24)
                } else ok = false
              } else {
                timescale = u32(b, off + hdr + 12)
                dur = u32(b, off + hdr + 16)
              }
            case "hdlr" if off + hdr + 12 <= e =>
              handlers += fourcc(b, off + hdr + 8)
            case "stsd" if off + hdr + 16 <= e =>
              if (u32(b, off + hdr + 4) >= 1L)
                codecs += fourcc(b, off + hdr + 12)
            case "mdat" => payloadBytes += size - hdr
            case _ => ()
          }
          off = e
        }
        if (off != end) ok = false
      }
      walk(0, b.length)
      if (!ok || timescale <= 0L) None
      else Some(ContainerInfo("mp4", codecs.mkString("+"), tracks, 0, 0,
        dur * 1000L / timescale, boxes, payloadBytes))
    }

    private def parseOgg(b: Array[Byte]): Option[ContainerInfo] = {
      var off = 0
      var pages = 0
      var payloadBytes = 0L
      var lastGranule = 0L
      var channels = 0
      var rate = 0
      var sawVorbis = false
      var ok = true
      val serials = scala.collection.mutable.Set.empty[Long]
      while (ok && off < b.length) {
        if (off + 27 > b.length || fourcc(b, off) != "OggS" ||
            b(off + 4) != 0) { ok = false }
        else {
          val headerType = b(off + 5) & 0xff
          val granule = leU64(b, off + 6)
          val serial = leU32(b, off + 14)
          val nsegs = b(off + 26) & 0xff
          if (off + 27 + nsegs > b.length) ok = false
          else {
            var plen = 0
            var s = 0
            while (s < nsegs) { plen += b(off + 27 + s) & 0xff; s += 1 }
            val end = off + 27 + nsegs + plen
            if (end > b.length) ok = false
            else {
              val pg = java.util.Arrays.copyOfRange(b, off, end)
              val expect = leU32(b, off + 22)
              pg(22) = 0; pg(23) = 0; pg(24) = 0; pg(25) = 0
              if ((oggCrc(pg).toLong & 0xffffffffL) != expect) ok = false
              else {
                pages += 1
                serials += serial
                val p = off + 27 + nsegs
                if ((headerType & 0x02) != 0) {
                  if (plen >= 30 && b(p) == 1 &&
                      new String(b, p + 1, 6,
                        java.nio.charset.StandardCharsets.US_ASCII) ==
                        "vorbis") {
                    sawVorbis = true
                    channels = b(p + 11) & 0xff
                    rate = leU32(b, p + 12).toInt
                  }
                } else payloadBytes += plen
                if (granule > lastGranule) lastGranule = granule
                off = end
              }
            }
          }
        }
      }
      if (!ok || pages == 0) None
      else Some(ContainerInfo("ogg",
        if (sawVorbis) "vorbis" else "", serials.size, channels, rate,
        if (rate > 0) lastGranule * 1000L / rate else 0L, pages,
        payloadBytes))
    }
  }

  final case class ContainerMeta(
      media_id: Long, container: String, codecs: String, tracks: Int,
      channels: Int, sample_rate: Int, duration_ms: Long, units: Int,
      payload_bytes: Long)

  /** Synthesize a REAL container per row from `(media_id, bytes)`:
    * even ids become MP4 (audio track when id % 4 == 0, duration
    * 1000 + 7·|payload| mod 9000 ms), odd ids Ogg/Vorbis (rate
    * 8000 + (id%4)·4000, channels 1 + (id/2)%2, granule 160·|payload|,
    * 1 + |payload|%4 body pages). Deterministic in (id, payload) so an
    * oracle can recompute every parsed field closed-form — while the
    * bytes on the wire are spec-valid containers a real demuxer would
    * accept. Encode is a batched partition kernel; bytes never hit the
    * driver. */
  def packContainers(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id").cast("long"), col("bytes"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        mapBatches(it, KernelBatchSize) { batch =>
          batch.iterator.map { case (id, payloadN) =>
            val payload = Option(payloadN).getOrElse(Array.empty)
            val len = payload.length
            val bytes =
              if (id % 2 == 0)
                ContainerCodec.encodeMp4(
                  1000L + len.toLong * 7 % 9000,
                  audioTrack = id % 4 == 0, payload)
              else
                ContainerCodec.encodeOggVorbis(
                  serial = id.toInt,
                  channels = (1 + (id / 2) % 2).toInt,
                  rate = (8000 + (id % 4) * 4000).toInt,
                  granule = len.toLong * 160,
                  bodyPages = (1 + len % 4).toInt,
                  payload)
            (id, bytes)
          }
        }
      }
      .toDF("media_id", "bytes")
  }

  /** [[packContainers]] for MPEG audio: every row becomes a spec-valid
    * CBR MP3 — bitrate 128/192/320 kbps by id%3, 44.1 kHz, mono on odd
    * ids, 2 + |payload|%7 frames, the payload riding in a real ID3v2
    * tag. Deterministic in (id, payload) for the closed-form oracle;
    * the bytes satisfy a real MPEG frame-sync walk. */
  def packMp3(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id").cast("long"), col("bytes"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        mapBatches(it, KernelBatchSize) { batch =>
          batch.iterator.map { case (id, payloadN) =>
            val payload = Option(payloadN).getOrElse(Array.empty)
            (id, ContainerCodec.encodeMp3(
              bitrateIdx = Array(9, 11, 14)((id % 3).toInt),
              srIdx = 0,
              mono = id % 2 == 1,
              frames = 2 + payload.length % 7,
              tagBody = payload))
          }
        }
      }
      .toDF("media_id", "bytes")
  }

  /** Container-metadata inventory — the corpus audit a training-data
    * pipeline runs before spending a single decode cycle: per media
    * row, the container kind, codec tags, track/channel layout, sample
    * rate, duration, page/box count, and payload bytes, parsed from
    * the real container framing ([[ContainerCodec.parse]]). Rows that
    * do not parse cleanly are dropped (quarantine them by anti-join if
    * needed). A batched partition kernel: embarrassingly parallel, no
    * shuffle, no codec library. */
  def containerMeta(media: DataFrame): Dataset[ContainerMeta] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select("media_id", "bytes")
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        mapBatches(it, KernelBatchSize) { batch =>
          batch.iterator.flatMap { case (id, bytes) =>
            ContainerCodec.parse(bytes).map(i =>
              ContainerMeta(id, i.container, i.codecs, i.tracks,
                i.channels, i.sampleRate, i.durationMs, i.units,
                i.payloadBytes))
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
