package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core._
import graft.functions.TextFunctions
import graft.operators.{Lineage, Packing, Sampling, TextAnalysis}

/** The training-data EXPORT story, composed through the Pointy DSL —
  * the round-3 operators (repetition gating, sequence packing,
  * reproducible splits) doing end-to-end work under the reference's
  * pipeline semantics, downstream of where CurationPipeline stops:
  *
  *   Load |-> Dedup |-> RepetitionGate (0 -> Reject, 1 |-> Pack) |-> Export
  *
  *  - Dedup keeps the canonical doc per content fingerprint;
  *  - RepetitionGate drops boilerplate-heavy docs (dup-token fraction
  *    >= 0.65) and routes to Reject if fewer than 10% survive;
  *  - Pack lays survivors out as one token stream (BPE-ish counts,
  *    512-token context windows) via the distributed prefix sum;
  *  - Export summarizes per train/val/test split — the split label is a
  *    pure hash of doc_id, so it costs no join at any pipeline position.
  */
object ExportPipeline {

  val pointy: String =
    "Load |-> Dedup |-> RepetitionGate (0 -> Reject, 1 |-> Pack) |-> Export"

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

    reg.register("RepetitionGate") { ctx =>
      val in = ctx.previousContent.get.transform(Lineage.cutLocal)
      val signals = TextAnalysis.repetitionSignals(in, "doc_id", "text")
        .select(col("doc_id"), col("dup_token_frac"))
      // checkpoint the annotated corpus: the health probe forces it and
      // the downstream packing restarts from the stored blocks instead
      // of replaying the signals join
      val annotated = in.join(signals, Seq("doc_id")).transform(Lineage.cutLocal)
      val keep = col("dup_token_frac") < 0.65
      // one aggregate action computes total and survivors together
      val probe = annotated.agg(
        count(lit(1)).as("total"),
        count(when(keep, 1)).as("surviving")).head()
      val (total, surviving) = (probe.getLong(0), probe.getLong(1))
      val kept = annotated.filter(keep).drop("dup_token_frac")
      (total == 0 || surviving.toDouble / total >= 0.1, kept)
    }

    reg.registerTransform("Pack") { ctx =>
      val toks = ctx.previousContent.get.select(col("doc_id"),
        TextFunctions.bpeishTokenCount(col("text")).as("n_tokens"))
      Packing.packSequences(toks, "doc_id", "n_tokens", budget = 512L)
    }

    reg.registerTransform("Reject") { ctx =>
      import ctx.spark.implicits._
      Seq(("repetition_collapse", System.currentTimeMillis() / 1000))
        .toDF("alert", "at_epoch_s")
    }

    reg.registerTransform("Export") { ctx =>
      val in = ctx.previousContent.get
      if (in.columns.contains("alert")) in
      else in
        .groupBy(Sampling.splitLabel(col("doc_id"), "graft", 900, 50)
          .as("split"))
        .agg(
          count(lit(1)).as("n_docs"),
          sum(col("n_tokens")).as("total_tokens"),
          countDistinct(col("bin_id")).as("n_bins"),
          count(when(col("spans_boundary"), 1)).as("n_boundary_docs"))
        .orderBy("split")
    }

    reg
  }

  def run(spark: SparkSession, sfDir: String): DataFrame = {
    val lineage = Pipeline
      .fromPointy("export", pointy, registry(sfDir))
      .start(spark)
    lineage.finalResult.content
      .getOrElse(sys.error(s"export produced no content; state=${lineage.finalState}"))
  }
}
