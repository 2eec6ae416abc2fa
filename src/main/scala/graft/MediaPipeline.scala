package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core._
import graft.operators.Lineage

/** The multimodal curation story composed through the Pointy DSL: REAL
  * image decode (javax.imageio) feeding a quality gate and perceptual
  * dedup — the same dataflow semantics q20 proves for text, carrying a
  * binary modality end to end.
  *
  *   LoadMedia |-> QualityGate |-> PerceptualDedup
  *
  *  - LoadMedia materializes a deterministic PNG corpus on executors
  *    (50 twin groups; every 5th group is a flat, low-contrast image);
  *  - QualityGate drops flat images on real decoded min-max contrast
  *    (the mm7 rule — dark/flat filtering before paying for hashing);
  *  - PerceptualDedup dHashes the survivors, pairs them with the
  *    pigeonhole-banded Hamming join, and keeps the LOWEST id of each
  *    near-dup pair set (pairs are emitted id_a < id_b, so the
  *    survivor set is one broadcast anti-join — no cluster pass needed
  *    for pair-shaped twin graphs).
  *
  * Every stage is a lazy DataFrame transform; the PNG bytes are
  * lazily checkpointed once so the encode kernel runs once even though
  * stats and hashing both consume the corpus.
  */
object MediaPipeline {

  val pointy: String = "LoadMedia |-> QualityGate |-> PerceptualDedup"

  def registry(sfDir: String): EventRegistry = {
    val reg = new EventRegistry

    reg.registerTransform("LoadMedia") { ctx =>
      val ids = Tables.load(ctx.spark, sfDir, "documents")
        .filter(col("doc_id") < 100)
        .select(col("doc_id").as("media_id"))
      multimodal.Multimodal.stripeImages(ids, "media_id", 36, 16,
        pattern = Some(expr("media_id DIV 2")),
        offset = Some(when(col("media_id") % 2 === 1 &&
          expr("media_id DIV 2") % 2 === 0, lit(1L)).otherwise(lit(0L))),
        ySlope = 5,
        xSlope = Some(when(expr("media_id DIV 2") % 5 === 0, lit(0L))
          .otherwise(expr("3 + media_id DIV 2"))))
        .transform(Lineage.cutLocal)
    }

    reg.registerTransform("QualityGate") { ctx =>
      val media = ctx.previousContent.get
      val kept = multimodal.Multimodal.imageStats(media).toDF()
        .filter(col("luma_max") - col("luma_min") >= 100)
        .select("media_id")
      media.join(broadcast(kept), Seq("media_id"), "left_semi")
    }

    reg.registerTransform("PerceptualDedup") { ctx =>
      val hashes = multimodal.Multimodal.imageDHash(ctx.previousContent.get)
        .toDF()
        .transform(Lineage.cutLocal) // feeds the pair join AND the anti-join
      val pairs = operators.Dedup.hammingPairs64(
        hashes, "media_id", "dhash", maxDist = 3, chunks = 4)
      hashes.join(
          broadcast(pairs.select(col("id_b").as("media_id")).distinct()),
          Seq("media_id"), "left_anti")
        .select("media_id")
        .orderBy("media_id")
    }

    reg
  }

  def run(spark: SparkSession, sfDir: String): DataFrame = {
    val lineage = Pipeline
      .fromPointy("media-curation", pointy, registry(sfDir))
      .start(spark)
    lineage.finalResult.content.getOrElse(
      sys.error(s"media curation produced no content; state=${lineage.finalState}"))
  }
}
