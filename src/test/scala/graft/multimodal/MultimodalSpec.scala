package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestSession

class MultimodalSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  val sf = "/root/testdata/sf0.001"
  private def media =
    Multimodal.mediaFromDocuments(graft.Tables.load(spark, sf, "documents"))

  test("media table has typed binary + metadata schema") {
    val m = media
    assert(m.schema("bytes").dataType ==
      org.apache.spark.sql.types.BinaryType)
    val meta = m.schema("meta").dataType
      .asInstanceOf[org.apache.spark.sql.types.StructType]
    assert(meta.fieldNames.toSeq ==
      Seq("format", "width", "height", "sample_rate", "duration_ms"))
    // kind partitions the corpus deterministically
    val kinds = m.groupBy("kind").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(kinds.keySet == Set("image", "audio", "video"))
  }

  test("feature extraction is deterministic, unit-norm, similarity-ready") {
    val f1 = Multimodal.extractFeatures(media, dim = 16).collect()
      .map(m => m.media_id -> m.embedding.toSeq).toMap
    val f2 = Multimodal.extractFeatures(media.repartition(7), dim = 16)
      .collect().map(m => m.media_id -> m.embedding.toSeq).toMap
    assert(f1 == f2) // partitioning-independent
    f1.values.take(5).foreach { v =>
      val norm = math.sqrt(v.map(x => x.toDouble * x).sum)
      assert(math.abs(norm - 1.0) < 1e-5)
    }
  }

  test("kernel batch shape: batches capped at KernelBatchSize") {
    val sizes = scala.collection.mutable.Buffer.empty[Int]
    val it = (1 to 150).iterator
    val out = Multimodal.mapBatches(it, 64) { batch =>
      sizes += batch.size; batch.iterator
    }.toList
    assert(out == (1 to 150).toList)
    assert(sizes.toSeq == Seq(64, 64, 22))
  }

  test("image decode + resize yields fixed 8x8 grids with byte-range pixels") {
    val px = Multimodal.decodeAndResizeImages(media).collect()
    assert(px.nonEmpty)
    px.take(10).foreach { p =>
      assert(p.pixels.length == 64)
      assert(p.pixels.forall(v => v >= 0 && v <= 255))
    }
  }

  test("frame sampling strides through video payloads") {
    val frames = Multimodal.sampleFrames(media, frameBytes = 64, stride = 2)
    val byId = frames.collect().groupBy(_.media_id)
    assert(byId.nonEmpty)
    byId.values.take(5).foreach { fs =>
      assert(fs.map(_.frame_no).forall(_ % 2 == 0))
      assert(fs.forall(_.frame_bytes.length <= 64))
    }
    // a video shorter than frameBytes*stride still yields frame 0
    val vids = media.filter(col("kind") === "video").count()
    assert(byId.size.toLong == vids)
  }

  test("audio resample yields one fixed-width envelope per audio row") {
    val env = Multimodal.resampleAudio(media, frames = 32).collect()
    assert(env.length ==
      media.filter(col("kind") === "audio").count())
    env.take(10).foreach { e =>
      assert(e.envelope.length == 32)
      assert(e.envelope.forall(v => v >= 0.0 && v <= 255.0))
      assert(e.sample_rate == 16000)
    }
    // deterministic across partitionings
    val env2 = Multimodal.resampleAudio(media.repartition(7), frames = 32)
      .collect().map(e => e.media_id -> e.envelope.toSeq).toMap
    assert(env.forall(e => env2(e.media_id) == e.envelope.toSeq))
  }

  test("REAL image codec: PNG encode→decode round-trips byte-exact") {
    // TYPE_INT_RGB + PNG is lossless: decoded luma of the stripe
    // pattern must equal the closed form g(id, x) = (id*7 + x*11) % 256
    val bytes = Multimodal.ImageIoCodec.stripePng(5L, 32, 16)
    val img = Multimodal.ImageIoCodec.decode(bytes).get
    assert(img.getWidth == 32 && img.getHeight == 16)
    for (x <- 0 until 32; y <- Seq(0, 7, 15)) {
      val expected = ((5L * 7 + x * 11) % 256).toInt
      assert(Multimodal.ImageIoCodec.luma(img.getRGB(x, y)) == expected,
        s"pixel ($x,$y)")
    }
    // box filter: each 8x8 cell of the 32x16 image covers 4 cols x 2
    // rows → floor(2*(g0+g1+g2+g3)/8), independent of cy
    val grid = Multimodal.ImageIoCodec.grayGrid(img, 8, 8)
    for (cy <- 0 until 8; cx <- 0 until 8) {
      val s = (0 until 4).map(i => ((5L * 7 + (cx * 4 + i) * 11) % 256)).sum
      assert(grid(cy * 8 + cx) == (s * 2 / 8).toInt, s"cell ($cy,$cx)")
    }
    // non-divisible dims still cover every cell with >= 1 pixel
    val odd = Multimodal.ImageIoCodec.decode(
      Multimodal.ImageIoCodec.stripePng(9L, 13, 7)).get
    val g2 = Multimodal.ImageIoCodec.grayGrid(odd, 8, 8)
    assert(g2.length == 64 && g2.forall(v => v >= 0 && v <= 255))
  }

  test("dHash is brightness-invariant away from wrap columns, order-stable") {
    // same pattern, +4 brightness: every gradient survives unless a
    // pixel wraps mod 256 — pick a pattern whose values stay below 252
    // in the sampled grid? Simpler: exact twins must hash identically,
    // and hashes must not depend on partitioning.
    val ids = (0L until 20L).map(i => Tuple1(i))
    val df = spark.createDataFrame(ids).toDF("media_id")
    val media = Multimodal.stripeImages(df, "media_id", 36, 16,
      pattern = Some(expr("media_id DIV 2")), ySlope = 5,
      xSlope = Some(expr("3 + media_id DIV 2")))
    val h1 = Multimodal.imageDHash(media).collect()
      .map(h => h.media_id -> h.dhash).toMap
    // exact twins (same pattern, zero offset) hash identically
    (0L until 20L by 2).foreach(i => assert(h1(i) == h1(i + 1), s"twins $i"))
    // different patterns hash apart (Hamming > 3 for at least most)
    val far = (0L until 18L by 2).count(i =>
      java.lang.Long.bitCount(h1(i) ^ h1(i + 2)) > 3)
    assert(far >= 7, s"only $far of 9 non-twin neighbors hash apart")
    // deterministic across partitionings
    val h2 = Multimodal.imageDHash(media.repartition(7)).collect()
      .map(h => h.media_id -> h.dhash).toMap
    assert(h1 == h2)
    // pure brightness shift with no wrap in any sampled pixel: pattern
    // id 0 (xSlope 3, ySlope 5) peaks at 3*35+5*15 = 180 < 251, so a
    // +4 offset wraps nothing and the dHash is bit-identical
    val base = Multimodal.stripeImages(df.limit(1), "media_id", 36, 16,
      pattern = Some(lit(0L)), ySlope = 5, xSlope = Some(lit(3L)))
    val bright = Multimodal.stripeImages(df.limit(1), "media_id", 36, 16,
      pattern = Some(lit(0L)), offset = Some(lit(4L)), ySlope = 5,
      xSlope = Some(lit(3L)))
    assert(Multimodal.imageDHash(base).head().dhash ==
      Multimodal.imageDHash(bright).head().dhash)
  }

  test("imageStats is integer-exact: constant image has known sums") {
    // constant color c = (5*7) % 256 = 35 over 32x16 = 512 px
    val flat = Multimodal.stripeImages(Seq(Tuple1(5L)).toDF("media_id"),
      "media_id", 32, 16, xSlope = Some(lit(0L)))
    val s = Multimodal.imageStats(flat).head()
    assert(s.luma_sum == 35L * 512)
    assert(s.luma_sumsq == 35L * 35 * 512)
    assert(s.luma_min == 35 && s.luma_max == 35)
    assert(s.width == 32 && s.height == 16)
  }

  test("REAL image decode pipeline drops corrupt payloads, keeps the rest") {
    val good = Multimodal.stripeImages(
      Seq(1L, 2L, 3L).toDF("media_id"), "media_id", 32, 16)
    val corrupt = Seq((99L, Array[Byte](1, 2, 3, 4)),
      (98L, Array.empty[Byte])).toDF("media_id", "bytes")
    val out = Multimodal.decodeImageGrid(
      good.unionByName(corrupt).repartition(5), gridW = 8, gridH = 8)
    val byId = out.collect().groupBy(_.media_id)
    // 64 cells per decodable image; corrupt rows vanish, job survives
    assert(byId.keySet == Set(1L, 2L, 3L))
    assert(byId.values.forall(_.length == 64))
    assert(byId(2L).forall(c => c.width == 32 && c.height == 16))
  }

  test("WAV codec round-trips PCM16 samples byte-exactly") {
    val samples = Multimodal.WavCodec.patternSamples(7L, 1000)
    val wav = Multimodal.WavCodec.encodeWav(samples, 16000)
    val Some((sr, decoded)) = Multimodal.WavCodec.decode(wav)
    assert(sr == 16000)
    assert(decoded.toSeq == samples.toSeq)
    // closed form spot checks: t=0 -> (49 % 4001) - 2000, t=500
    assert(samples(0) == (7 * 7 % 4001 - 2000).toShort)
    assert(samples(500) == ((7 * 7 + 500 * 11) % 4001 - 2000).toShort)
  }

  test("WAV decode takes channel 0 of stereo and honors sample rate") {
    // interleave two channels: ch0 = pattern, ch1 = zeros
    val ch0 = Multimodal.WavCodec.patternSamples(3L, 64)
    val inter = new Array[Short](128)
    ch0.zipWithIndex.foreach { case (v, i) => inter(2 * i) = v }
    // hand-build a stereo header: reuse encodeWav then patch channels,
    // byte rate, and block align (offsets per the canonical RIFF layout)
    val mono = Multimodal.WavCodec.encodeWav(inter, 8000)
    val bb = java.nio.ByteBuffer.wrap(mono)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.putShort(22, 2.toShort)  // channels
    bb.putInt(28, 8000 * 4)     // byte rate
    bb.putShort(32, 4.toShort)  // block align
    val Some((sr, decoded)) = Multimodal.WavCodec.decode(mono)
    assert(sr == 8000)
    assert(decoded.toSeq == ch0.toSeq)
  }

  test("REAL audio decode pipeline drops corrupt payloads, keeps the rest") {
    val good = Multimodal.patternWavs(
      Seq(1L, 2L, 3L).toDF("media_id"), "media_id", nSamples = lit(100))
    val corrupt = Seq((99L, Array[Byte](82, 73, 70, 70)),
      (98L, Array.empty[Byte])).toDF("media_id", "bytes")
    val out = Multimodal.decodeAudioStats(
      good.unionByName(corrupt).repartition(5)).collect()
    assert(out.map(_.media_id).toSet == Set(1L, 2L, 3L))
    assert(out.forall(_.n_samples == 100L))
    assert(out.forall(_.sample_rate == 16000))
    // stats match a direct fold of the closed-form samples
    val s1 = Multimodal.WavCodec.patternSamples(1L, 100).map(_.toInt)
    val r1 = out.find(_.media_id == 1L).get
    assert(r1.amp_sum == s1.map(_.toLong).sum)
    assert(r1.amp_min == s1.min && r1.amp_max == s1.max)
  }

  test("sceneCuts: identical frames score SAD 0, pattern jumps fire cuts") {
    // one video: frames 0-1 identical, frame 2 a different pattern,
    // frame 3 back near 2 with +1 brightness (small drift, no cut)
    val frames = Seq(
      (1L, 0, 10L, 0L), (1L, 1, 10L, 0L), (1L, 2, 200L, 0L),
      (1L, 3, 200L, 1L),
      // second video: all identical — lag must not cross videos
      (2L, 0, 10L, 0L), (2L, 1, 10L, 0L))
      .toDF("video_id", "frame_no", "pat", "off")
    val media = frames.select(col("video_id"), col("frame_no"),
      col("pat"), col("off"))
    val withBytes = Multimodal.stripeImages(
        media.select(
          (col("video_id") * 100 + col("frame_no")).as("media_id"),
          col("pat"), col("off")),
        "media_id", 32, 16,
        pattern = Some(col("pat")), offset = Some(col("off")),
        ySlope = 5, xSlope = Some(lit(7L)))
      .select((col("media_id") / 100).cast("long").as("video_id"),
        (col("media_id") % 100).cast("int").as("frame_no"), col("bytes"))
    val out = Multimodal.sceneCuts(withBytes, sadThreshold = 500L)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getBoolean(3)))
    val byKey = out.map(r => (r._1, r._2) -> (r._3, r._4)).toMap
    assert(byKey((1L, 1)) == ((0L, false)), "identical frames: SAD 0")
    assert(byKey((1L, 2))._2, "pattern jump must cut")
    assert(!byKey((1L, 3))._2 && byKey((1L, 3))._1 > 0,
      "small drift: nonzero SAD, no cut")
    assert(byKey((2L, 1)) == ((0L, false)))
    assert(out.length == 4, "frame 0 of each video is unscored")
  }

  test("staticVideoAudit: a frozen clip flags static, a cutty clip " +
      "keeps its distinct grids, singleton frames never flag") {
    // video 1: three identical frames → static; video 2: three
    // distinct patterns → 0 dup; video 3: one frame → not static
    val frames = Seq(
      (1L, 0, 10L, 0L), (1L, 1, 10L, 0L), (1L, 2, 10L, 0L),
      (2L, 0, 10L, 0L), (2L, 1, 90L, 0L), (2L, 2, 200L, 0L),
      (3L, 0, 50L, 0L))
      .toDF("video_id", "frame_no", "pat", "off")
    val withBytes = Multimodal.stripeImages(
        frames.select(
          (col("video_id") * 100 + col("frame_no")).as("media_id"),
          col("pat"), col("off")),
        "media_id", 32, 16,
        pattern = Some(col("pat")), offset = Some(col("off")),
        ySlope = 5, xSlope = Some(lit(7L)))
      .select((col("media_id") / 100).cast("long").as("video_id"),
        (col("media_id") % 100).cast("int").as("frame_no"), col("bytes"))
    val out = Multimodal.staticVideoAudit(withBytes)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getBoolean(4))))
      .toMap
    assert(out(1L) == ((3L, 1L, 0.666667, true)), out(1L).toString)
    assert(out(2L) == ((3L, 3L, 0.0, false)), out(2L).toString)
    assert(out(3L) == ((1L, 1L, 0.0, false)), out(3L).toString)
  }

  test("silenceTrim: boundaries, all-silent clips, muted encode e2e") {
    // direct frame table: energies [0,5,9,0] at thr 5 → voiced 1..2
    val frames = Seq(
      (1L, 0, 160, 0L, 0, 0), (1L, 1, 160, 5L, 0, 0),
      (1L, 2, 160, 9L, 0, 0), (1L, 3, 160, 0L, 0, 0),
      (2L, 0, 160, 0L, 0, 0))
      .toDF("media_id", "frame_no", "n", "energy", "zero_crossings", "peak")
    val out = Multimodal.silenceTrim(frames, energyThreshold = 5L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) -1 else r.getInt(3),
        if (r.isNullAt(4)) -1 else r.getInt(4)))
    assert(out.toSeq == Seq((1L, 4L, 2L, 1, 2), (2L, 1L, 0L, -1, -1)))

    // end to end through the REAL codec: one muted leading frame
    val media = Multimodal.patternWavs(
      Seq(3L).toDF("media_id"), "media_id", nSamples = lit(320),
      muteLead = lit(160))
    val fr = Multimodal.audioFrameFeatures(media, frameLen = 160).toDF()
    val t = Multimodal.silenceTrim(fr, energyThreshold = 1L).collect()(0)
    assert((t.getLong(1), t.getLong(2), t.getInt(3), t.getInt(4)) ==
      ((2L, 1L, 1, 1)))
  }

  test("audioFrameFeatures: hand-computed frames, partial tail, drops") {
    // samples: [1000,-1000,1000,-1000 | 0,5] with frameLen=4 →
    // frame 0: n=4 energy=4e6 zc=3 peak=1000
    // frame 1: n=2 energy=25  zc=0 (0 and 5 are both non-negative)
    val wav = Multimodal.WavCodec.encodeWav(
      Array[Short](1000, -1000, 1000, -1000, 0, 5), 16000)
    val corrupt = Array[Byte](82, 73, 70, 70)
    val media = Seq((7L, wav), (99L, corrupt)).toDF("media_id", "bytes")
    val out = Multimodal.audioFrameFeatures(media, frameLen = 4)
      .collect().sortBy(_.frame_no)
    assert(out.map(_.media_id).toSet == Set(7L), "corrupt payload drops")
    assert(out.length == 2)
    assert((out(0).n, out(0).energy, out(0).zero_crossings, out(0).peak) ==
      ((4, 4000000L, 3, 1000)))
    assert((out(1).n, out(1).energy, out(1).zero_crossings, out(1).peak) ==
      ((2, 25L, 0, 5)))
    // zero crossings never count across the frame boundary: the
    // (-1000, 0) flip at samples 3→4 appears in neither frame
    assert(out.map(_.zero_crossings).sum == 3)
  }

  test("ContainerCodec: MP4 encode→parse round-trips duration, track " +
    "layout, codec tags, box count, and mdat bytes") {
    val payload = Array.tabulate[Byte](300)(i => (i * 7).toByte)
    val one = Multimodal.ContainerCodec.encodeMp4(
      4321L, audioTrack = false, payload)
    val i1 = Multimodal.ContainerCodec.parse(one).get
    assert(i1.container == "mp4" && i1.codecs == "avc1" &&
      i1.tracks == 1 && i1.durationMs == 4321L && i1.units == 12 &&
      i1.payloadBytes == 300L)
    val two = Multimodal.ContainerCodec.encodeMp4(
      9999L, audioTrack = true, payload)
    val i2 = Multimodal.ContainerCodec.parse(two).get
    assert(i2.codecs == "avc1+mp4a" && i2.tracks == 2 &&
      i2.durationMs == 9999L && i2.units == 20)
  }

  test("ContainerCodec: MP4 parser handles 64-bit largesize and " +
    "size-to-end boxes, quarantines truncation and bad sizes") {
    val payload = Array.tabulate[Byte](64)(_.toByte)
    val b = Multimodal.ContainerCodec.encodeMp4(1000L, false, payload)
    // rewrite the trailing mdat as a largesize box (size=1 + 64-bit)
    val mdatOff = b.length - (8 + 64)
    assert(new String(b, mdatOff + 4, 4, "US-ASCII") == "mdat")
    val large = b.take(mdatOff) ++
      Array[Byte](0, 0, 0, 1) ++ "mdat".getBytes("US-ASCII") ++
      Array[Byte](0, 0, 0, 0, 0, 0, 0, (16 + 64).toByte) ++
      payload
    val li = Multimodal.ContainerCodec.parse(large).get
    assert(li.payloadBytes == 64L && li.units == 12)
    // size=0 means "extends to the end of the enclosing box"
    val toEnd = b.take(mdatOff) ++
      Array[Byte](0, 0, 0, 0) ++ "mdat".getBytes("US-ASCII") ++ payload
    assert(Multimodal.ContainerCodec.parse(toEnd).get.payloadBytes == 64L)
    // truncation and an overrunning box size both quarantine (None),
    // never crash or return partial rows
    assert(Multimodal.ContainerCodec.parse(b.dropRight(10)).isEmpty)
    val overrun = b.clone()
    overrun(mdatOff) = 0x7f.toByte // mdat size now exceeds the buffer
    assert(Multimodal.ContainerCodec.parse(overrun).isEmpty)
  }

  test("ContainerCodec: Ogg encode→parse recovers stream parameters, " +
    "page count, granule duration, and payload bytes; a corrupt page " +
    "CRC quarantines") {
    val payload = Array.tabulate[Byte](600)(i => (i * 13).toByte)
    val b = Multimodal.ContainerCodec.encodeOggVorbis(
      serial = 77, channels = 2, rate = 16000, granule = 48000L,
      bodyPages = 3, payload)
    val i = Multimodal.ContainerCodec.parse(b).get
    assert(i.container == "ogg" && i.codecs == "vorbis" &&
      i.tracks == 1 && i.channels == 2 && i.sampleRate == 16000)
    assert(i.durationMs == 3000L) // 48000 samples @ 16 kHz
    assert(i.units == 4 && i.payloadBytes == 600L)
    // flip one payload byte: that page's CRC no longer verifies →
    // strict parse quarantines the container
    val corrupt = b.clone()
    corrupt(b.length - 1) = (corrupt(b.length - 1) ^ 0x5a).toByte
    assert(Multimodal.ContainerCodec.parse(corrupt).isEmpty)
    // a 255-multiple payload needs the trailing 0 lacing value —
    // round-trip proves the segment-table convention
    val exact = Multimodal.ContainerCodec.encodeOggVorbis(
      1, 1, 8000, 1600L, 1, new Array[Byte](510))
    assert(Multimodal.ContainerCodec.parse(exact).get.payloadBytes == 510L)
  }

  test("ContainerCodec: MP3 encode→parse recovers bitrate-derived " +
    "frame walk, channel mode, tag size, and sample duration; " +
    "truncated frames and broken syncs quarantine") {
    val tag = Array.tabulate[Byte](200)(i => (i * 3).toByte)
    val b = Multimodal.ContainerCodec.encodeMp3(
      bitrateIdx = 9, srIdx = 0, mono = false, frames = 5, tagBody = tag)
    val i = Multimodal.ContainerCodec.parse(b).get
    assert(i.container == "mp3" && i.codecs == "mp3" && i.tracks == 1)
    assert(i.channels == 2 && i.sampleRate == 44100)
    assert(i.units == 5 && i.payloadBytes == 200L)
    assert(i.durationMs == 5L * 1152 * 1000 / 44100) // 130 ms
    // 128 kbps @ 44.1 kHz → 417-byte frames: total = 10 + 200 + 5·417
    assert(b.length == 10 + 200 + 5 * 417)
    val mono = Multimodal.ContainerCodec.encodeMp3(14, 0, mono = true,
      frames = 2, tagBody = Array.empty)
    val mi = Multimodal.ContainerCodec.parse(mono).get
    assert(mi.channels == 1 && mi.units == 2)
    // a truncated final frame and a corrupted sync both quarantine
    assert(Multimodal.ContainerCodec.parse(b.dropRight(3)).isEmpty)
    val bad = b.clone()
    bad(10 + 200) = 0x00 // first frame's sync byte
    assert(Multimodal.ContainerCodec.parse(bad).isEmpty)
  }

  test("container pipeline: packContainers → containerMeta is exact " +
    "per row and drops non-containers") {
    import spark.implicits._
    val rows = Seq(
      (0L, "even ids pack as mp4"),
      (3L, "odd ids pack as ogg vorbis streams"),
      (4L, "id % 4 == 0 adds the audio track"))
      .toDF("media_id", "text")
      .select(col("media_id"), col("text").cast("binary").as("bytes"))
    val out = Multimodal.containerMeta(Multimodal.packContainers(rows))
      .collect().map(m => m.media_id -> m).toMap
    val l0 = "even ids pack as mp4".getBytes("UTF-8").length
    assert(out(0L).container == "mp4" && out(0L).codecs == "avc1+mp4a" &&
      out(0L).tracks == 2 && out(0L).duration_ms == 1000L + l0 * 7 % 9000)
    val l3 = "odd ids pack as ogg vorbis streams".getBytes("UTF-8").length
    assert(out(3L).container == "ogg" && out(3L).sample_rate == 20000 &&
      out(3L).channels == 2 && out(3L).units == 2 + l3 % 4 &&
      out(3L).duration_ms == l3.toLong * 160 * 1000 / 20000)
    assert(out(4L).codecs == "avc1+mp4a" && out(4L).units == 20)
    // junk bytes (no container magic) are dropped, not crashed on
    val junk = Seq((9L, Array[Byte](1, 2, 3, 4, 5))).toDF("media_id", "bytes")
    assert(Multimodal.containerMeta(junk).count() == 0)
  }
}
