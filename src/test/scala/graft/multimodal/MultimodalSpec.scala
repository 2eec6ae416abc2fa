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
}
