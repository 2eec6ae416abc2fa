package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core._
import graft.functions.TextFunctions
import graft.operators.{Lineage, Sampling}

/** The end-to-end training-data curation story, composed through the
  * Pointy DSL: the reference's pipeline semantics orchestrating the
  * LLM-data operators this library adds.
  *
  *   Load |-> Dedup |-> QualityFilter (0 -> Reject, 1 |-> Split) |-> Finalize
  *
  *  - Dedup keeps the canonical (lowest-id) doc per content fingerprint;
  *  - QualityFilter keeps docs above a quality threshold and FAILS the
  *    stage (routing to Reject) if the surviving fraction collapses
  *    below 50% — the conditional-branch semantics doing real work;
  *  - Split assigns reproducible train/val/test labels;
  *  - Finalize summarizes per (split) counts.
  *
  * Every stage is a lazy DataFrame transform; only the conditional's
  * health probe forces a bounded mid-pipeline action (the same eager
  * boundary the reference has at every routing decision). The identical
  * composition runs per-micro-batch under
  * StreamRunner.runPipelinePerBatch.
  */
object CurationPipeline {

  val pointy: String =
    "Load |-> Dedup |-> QualityFilter (0 -> Reject, 1 |-> Split) |-> Finalize"

  def registry(sfDir: String): EventRegistry = {
    val reg = new EventRegistry

    reg.registerTransform("Load") { ctx =>
      Tables.load(ctx.spark, sfDir, "documents")
    }

    reg.registerTransform("Dedup") { ctx =>
      operators.Dedup.exact(ctx.previousContent.get, "doc_id", "text")
        .filter(col("is_canonical"))
        .drop("is_canonical", "fingerprint")
    }

    reg.register("QualityFilter") { ctx =>
      // lazily checkpoint the deduped corpus: the health probe forces it
      // now, downstream evaluation (split/summary) restarts from the
      // stored blocks instead of replaying the dedup window, and —
      // unlike persist — the blocks are GC-released after the run, so
      // per-micro-batch executions (StreamRunner.runPipelinePerBatch)
      // cannot accumulate pinned cache entries
      val in = ctx.previousContent.get
        .transform(Lineage.cutLocal)
      val keep = TextFunctions.qualityScore(col("text")) >= 0.3
      val kept = in.filter(keep)
      // driver-side health flag: collapsed corpus → failure branch.
      // One aggregate action computes total and survivors together.
      val probe = in.agg(
        count(lit(1)).as("total"),
        count(when(keep, 1)).as("surviving")).head()
      val (total, surviving) = (probe.getLong(0), probe.getLong(1))
      (total == 0 || surviving.toDouble / total >= 0.5, kept)
    }

    reg.registerTransform("Split") { ctx =>
      Sampling.split(ctx.previousContent.get, "doc_id", "graft", 900, 50)
    }

    reg.registerTransform("Reject") { ctx =>
      import ctx.spark.implicits._
      Seq(("quality_collapse", System.currentTimeMillis() / 1000))
        .toDF("alert", "at_epoch_s")
    }

    reg.registerTransform("Finalize") { ctx =>
      val in = ctx.previousContent.get
      // the sink runs after EITHER branch: a rejected run's "summary"
      // is the alert itself, not a split rollup
      if (in.columns.contains("alert")) in
      else in
        .groupBy("split")
        .agg(
          count(lit(1)).as("n_docs"),
          round(sum(length(col("text"))).cast("double")
            / count(lit(1)), 2).as("avg_chars"))
        .orderBy("split")
    }

    reg
  }

  def run(spark: SparkSession, sfDir: String): DataFrame = {
    val lineage = Pipeline
      .fromPointy("curation", pointy, registry(sfDir))
      .start(spark)
    lineage.finalResult.content
      .getOrElse(sys.error(s"curation produced no content; state=${lineage.finalState}"))
  }
}
