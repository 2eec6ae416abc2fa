package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.core._

/** Cross-module integration: the curation pipeline composed through the
  * DSL, run per micro-batch over a document stream, landing in the
  * result store — the full BatchPipeline-at-scale story. */
class IntegrationSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("curation pipeline runs per micro-batch into the result store") {
    val dir = java.nio.file.Files.createTempDirectory("graft-int").toString
    val store = new sources.ResultStore(spark, s"$dir/store")

    // per-batch pipeline: dedup + quality + split on the BATCH input,
    // then append to the store
    val reg = new EventRegistry
    reg.registerTransform("TakeBatch") { ctx =>
      ctx.input[org.apache.spark.sql.DataFrame]("batch")
    }
    reg.registerTransform("Dedup") { ctx =>
      operators.Dedup.exact(ctx.previousContent.get, "doc_id", "text")
        .filter(col("is_canonical")).drop("is_canonical", "fingerprint")
    }
    reg.registerTransform("Split") { ctx =>
      operators.Sampling.split(ctx.previousContent.get, "doc_id", "g", 900, 50)
    }
    reg.registerTransform("Save") { ctx =>
      val out = ctx.previousContent.get.select("doc_id", "split")
      store.insert("curated", out)
      out
    }

    val stream = streaming.StreamRunner
      .parquetStream(spark, "/root/testdata/sf0.001/documents.parquet")
    val q = streaming.StreamRunner.runPipelinePerBatch(
      stream,
      () => Pipeline.fromPointy("cur-batch",
        "TakeBatch |-> Dedup |-> Split |-> Save", reg),
      s"$dir/ckpt")
    q.awaitTermination()

    val total = graft.Tables
      .load(spark, "/root/testdata/sf0.001", "documents").count()
    assert(store.count("curated") == total) // no exact dups in the corpus
    // splits queryable straight off the store with pushdown
    val train = store.filterRecords("curated", "split" -> "train").count()
    assert(train > 0 && train < total)
  }

  test("random pointy chains parse to the expected node count") {
    val rnd = new scala.util.Random(7)
    val ops = Seq("->", "|->", "||")
    (1 to 25).foreach { _ =>
      val n = 2 + rnd.nextInt(30)
      val names = (1 to n).map(i => s"N$i")
      val code = names.zipWithIndex.map { case (nm, i) =>
        val retry = if (rnd.nextInt(5) == 0) s" * ${2 + rnd.nextInt(4)}" else ""
        if (i == 0) nm + retry else s"${ops(rnd.nextInt(3))} $nm$retry"
      }.mkString(" ")
      val root = dsl.StageGraph.build(code)
      assert(root.count == n, s"code=$code")
      assert(root.event == "N1")
    }
  }

  test("random conditional trees route descriptors correctly") {
    val rnd = new scala.util.Random(11)
    (1 to 15).foreach { _ =>
      val extras = (3 to 3 + rnd.nextInt(4)).toSeq
      val code = s"Root(0 -> F, 1 -> S${extras.map(d => s", $d -> E$d").mkString})"
      val root = dsl.StageGraph.build(code)
      assert(root.isConditional)
      assert(root.onFailure.get.event == "F")
      assert(root.onSuccess.get.event == "S")
      extras.foreach(d => assert(root.getDescriptor(d).get.event == s"E$d"))
    }
  }
}
