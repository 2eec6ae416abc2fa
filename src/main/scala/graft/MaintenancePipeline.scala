package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core._
import graft.sources.ResultStore

/** The lakehouse-maintenance story composed through the Pointy DSL —
  * the store infrastructure (versioned appends, OPTIMIZE compaction)
  * doing end-to-end work under the reference's pipeline semantics,
  * with the conditional deciding whether maintenance is needed at all:
  *
  *   Load |-> Ingest |-> CompactGate (0 -> SkipReport, 1 -> Compact)
  *
  *  - Ingest appends per-linenumber batches (each a versioned commit
  *    that hard-links prior files — the append-heavy fragmentation
  *    pattern every lake table suffers);
  *  - CompactGate routes to maintenance only when the data-file count
  *    exceeds `maxFiles` — a healthy table takes the 0 arm and skips
  *    the rewrite entirely;
  *  - Compact bin-packs the small files through the same atomic
  *    commit, then reports; SkipReport reports without rewriting.
  *    Both arms aggregate the stored table — identical content either
  *    way, which is exactly the invariant the oracle checks.
  */
object MaintenancePipeline {

  val pointy: String =
    "Load |-> Ingest |-> CompactGate (0 -> SkipReport, 1 -> Compact)"

  def registry(
      sfDir: String, storeRoot: String, maxFiles: Int): EventRegistry = {
    val reg = new EventRegistry

    reg.registerTransform("Load") { ctx =>
      Tables.load(ctx.spark, sfDir, "lineitem")
        .select("l_orderkey", "l_linenumber", "l_quantity")
    }

    reg.registerTransform("Ingest") { ctx =>
      val s = new ResultStore(ctx.spark, storeRoot)
      val li = ctx.previousContent.get
      (1 to 7).foreach { i =>
        s.insert("li", li.filter(col("l_linenumber") === i).repartition(4))
      }
      s.read("li")
    }

    reg.register("CompactGate") { ctx =>
      // success (code 1) = maintenance NEEDED; the healthy table takes
      // the 0 arm straight to the report
      (new ResultStore(ctx.spark, storeRoot).dataFileCount("li") > maxFiles,
        ctx.previousContent.get)
    }

    def summarize(spark: SparkSession): DataFrame =
      new ResultStore(spark, storeRoot).read("li")
        .groupBy("l_linenumber")
        .agg(count(lit(1)).as("n"),
          round(sum(col("l_quantity").cast("decimal(18,4)")), 2)
            .cast("double").as("qty"))
        .orderBy("l_linenumber")

    reg.registerTransform("Compact") { ctx =>
      val s = new ResultStore(ctx.spark, storeRoot)
      s.compact("li", targetBytes = 256L << 20)
      summarize(ctx.spark)
    }

    // the healthy-table arm: no rewrite, same report off the store
    reg.registerTransform("SkipReport") { ctx => summarize(ctx.spark) }
    reg
  }

  def run(spark: SparkSession, sfDir: String, storeRoot: String,
      maxFiles: Int = 10): DataFrame = {
    val lineage = Pipeline
      .fromPointy("maintenance", pointy,
        registry(sfDir, storeRoot, maxFiles))
      .start(spark)
    lineage.finalResult.content
      .getOrElse(sys.error(
        s"maintenance produced no content; state=${lineage.finalState}"))
  }
}
