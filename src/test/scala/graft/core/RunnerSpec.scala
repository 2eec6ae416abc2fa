package graft.core

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestSession

/** End-to-end pipeline execution over Spark: piping, parallel merge,
  * conditional routing, sink drain, goto, retry override, stop. */
class RunnerSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def freshRegistry(): EventRegistry = {
    val reg = new EventRegistry
    reg.registerTransform("Load") { ctx =>
      Seq((1, "a"), (2, "b"), (3, "c")).toDF("id", "tag")
    }
    reg.registerTransform("Double") { ctx =>
      ctx.previousContent.get.withColumn("id", col("id") * 2)
    }
    reg.registerTransform("KeepEven") { ctx =>
      ctx.previousContent.get.filter(col("id") % 2 === 0)
    }
    reg
  }

  test("A |-> B pipes the previous stage's content") {
    val reg = freshRegistry()
    val p = Pipeline.fromPointy("pipe", "Load |-> Double |-> KeepEven", reg)
    val lineage = p.start(spark)
    assert(lineage.finalState == ExecutionState.Finished)
    val rows = lineage.finalResult.content.get.orderBy("id").collect()
    assert(rows.map(_.getInt(0)).toSeq == Seq(2, 4, 6))
  }

  test("A -> B does NOT pipe results (B sees only pipeline inputs)") {
    val reg = freshRegistry()
    var sawPrevious: Option[Any] = Some("unset")
    reg.register("Probe") { ctx => sawPrevious = ctx.previousResult; (true, ctx.spark.emptyDataFrame) }
    Pipeline.fromPointy("seq", "Load -> Probe", reg).start(spark)
    assert(sawPrevious.isEmpty)
  }

  test("|-> with no previous context passes an EMPTY result set") {
    val reg = freshRegistry()
    var got: Option[graft.query.ResultSet] = None
    reg.register("First") { ctx => got = ctx.previousResult; (true, ctx.spark.emptyDataFrame) }
    Pipeline.fromPointy("empty", "First |-> Load", reg).start(spark)
    // First is the root: |-> reads the edge INTO a node; root has none
    assert(got.isEmpty)
    val reg2 = freshRegistry()
    var got2: Option[graft.query.ResultSet] = None
    reg2.register("Second") { ctx => got2 = ctx.previousResult; (true, ctx.spark.emptyDataFrame) }
    Pipeline.fromPointy("empty2", "Load |-> Second", reg2).start(spark)
    assert(got2.exists(_.nonEmpty))
  }

  test("A || B |-> C merges parallel results into one ResultSet") {
    val reg = new EventRegistry
    reg.registerTransform("A")(_ => Seq(1, 2).toDF("v"))
    reg.registerTransform("B")(_ => Seq(3, 4).toDF("v"))
    var mergedCount = -1L
    reg.register("C") { ctx =>
      val prev = ctx.previousResult.get
      assert(prev.size == 2) // two task results in one context
      mergedCount = prev.content.get.count()
      (true, prev.content.get)
    }
    val lineage = Pipeline.fromPointy("par", "A || B |-> C", reg).start(spark)
    assert(mergedCount == 4)
    assert(lineage.steps.size == 2) // (A,B) context + C context
    assert(lineage.steps.head.taskProfiles.size == 2)
  }

  test("conditional routes to failure branch on error, then sink runs") {
    val reg = new EventRegistry
    val ran = scala.collection.mutable.Buffer.empty[String]
    reg.register("Check") { ctx => ran += "Check"; (false, Seq(1).toDF("v")) }
    reg.registerTransform("Bad") { ctx => ran += "Bad"; Seq("bad").toDF("s") }
    reg.registerTransform("Good") { ctx => ran += "Good"; Seq("good").toDF("s") }
    reg.registerTransform("Sink") { ctx => ran += "Sink"; Seq("sink").toDF("s") }
    val lineage = Pipeline
      .fromPointy("cond", "Check(0->Bad,1->Good)->Sink", reg).start(spark)
    assert(ran.toSeq == Seq("Check", "Bad", "Sink"))
    assert(lineage.filterByEvent("Sink").nonEmpty)
  }

  test("conditional routes to success branch when evaluation succeeds") {
    val reg = new EventRegistry
    val ran = scala.collection.mutable.Buffer.empty[String]
    reg.register("Check") { ctx => ran += "Check"; (true, Seq(1).toDF("v")) }
    reg.registerTransform("Bad") { ctx => ran += "Bad"; Seq("bad").toDF("s") }
    reg.registerTransform("Good") { ctx => ran += "Good"; Seq("good").toDF("s") }
    Pipeline.fromPointy("cond2", "Check(0->Bad,1->Good)", reg).start(spark)
    assert(ran.toSeq == Seq("Check", "Good"))
  }

  test("goto jumps to a custom descriptor branch") {
    val reg = new EventRegistry
    val ran = scala.collection.mutable.Buffer.empty[String]
    reg.register("Route") { ctx => ran += "Route"; ctx.goto(3, Seq(9).toDF("v")) }
    reg.registerTransform("Bad") { ctx => ran += "Bad"; Seq(0).toDF("v") }
    reg.registerTransform("Good") { ctx => ran += "Good"; Seq(1).toDF("v") }
    reg.registerTransform("Special") { ctx => ran += "Special"; Seq(3).toDF("v") }
    Pipeline.fromPointy("goto", "Route(0->Bad,1->Good,3->Special)", reg).start(spark)
    assert(ran.toSeq == Seq("Route", "Special"))
  }

  test("goto to unconfigured descriptor cancels the pipeline") {
    val reg = new EventRegistry
    reg.register("Route") { ctx => ctx.goto(7) }
    reg.registerTransform("Bad")(_ => Seq(0).toDF("v"))
    reg.registerTransform("Good")(_ => Seq(1).toDF("v"))
    val lineage =
      Pipeline.fromPointy("goto2", "Route(0->Bad,1->Good)", reg).start(spark)
    assert(lineage.finalState == ExecutionState.Cancelled)
  }

  test("StopProcessingError cancels remaining stages") {
    val reg = new EventRegistry
    val ran = scala.collection.mutable.Buffer.empty[String]
    reg.register("Halt") { ctx => ran += "Halt"; ctx.stopProcessing("enough") }
    reg.registerTransform("Next") { ctx => ran += "Next"; Seq(1).toDF("v") }
    val lineage = Pipeline.fromPointy("stop", "Halt -> Next", reg).start(spark)
    assert(ran.toSeq == Seq("Halt"))
    assert(lineage.finalState == ExecutionState.Cancelled)
  }

  test("retry factor from the DSL overrides max attempts") {
    val reg = new EventRegistry
    var calls = 0
    reg.register("Flaky", retry = Some(RetryPolicy(maxAttempts = 1, backoffFactor = 0))) { ctx =>
      calls += 1
      if (calls < 3) throw new RuntimeException("flaky")
      (true, Seq(1).toDF("v"))
    }
    reg.registerTransform("Done")(_ => Seq(1).toDF("v"))
    val lineage = Pipeline.fromPointy("retry", "3 * Flaky -> Done", reg).start(spark)
    assert(calls == 3)
    assert(lineage.finalState == ExecutionState.Finished)
    assert(lineage.steps.head.errors.isEmpty)
  }

  test("failed event without conditional still routes to onSuccess (reference quirk)") {
    val reg = new EventRegistry
    val ran = scala.collection.mutable.Buffer.empty[String]
    reg.register("Fail") { ctx => ran += "Fail"; (false, Seq(1).toDF("v")) }
    reg.registerTransform("After") { ctx => ran += "After"; Seq(1).toDF("v") }
    Pipeline.fromPointy("quirk", "Fail -> After", reg).start(spark)
    assert(ran.toSeq == Seq("Fail", "After"))
  }

  test("bypass skips process and synthesizes success") {
    val reg = new EventRegistry
    var processed = false
    reg.register(new EventBase {
      override val name = "Bypassed"
      override def canBypass(ctx: EventContext) = Some(Seq(42).toDF("v"))
      override def process(ctx: EventContext) = { processed = true; (true, null) }
    })
    val lineage = Pipeline.fromPointy("bypass", "Bypassed", reg).start(spark)
    assert(!processed)
    assert(lineage.finalResult.first().get.meta.message.contains("bypassed"))
  }

  test("unknown event name fails pipeline construction") {
    intercept[EventDoesNotExist] {
      Pipeline.fromPointy("bad", "Nope -> Load", freshRegistry())
    }
  }

  test("double start without forceRerun raises; forceRerun allowed") {
    val p = Pipeline.fromPointy("once", "Load", freshRegistry())
    p.start(spark)
    intercept[ImproperlyConfigured](p.start(spark))
    p.start(spark, forceRerun = true)
  }

  test("pipelines load from .pty files with case-insensitive discovery") {
    val dir = java.nio.file.Files.createTempDirectory("graft-pty").toString
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$dir/MyEtl.pty"), "Load |-> Double")
    val p = Pipeline.discover("myetl", dir, freshRegistry())
    assert(p.root.event == "Load")
    assert(p.root.onSuccess.get.event == "Double")
    intercept[ImproperlyConfigured](
      Pipeline.discover("missing", dir, freshRegistry()))
  }

  test("required input fields are enforced and defaults fill in") {
    val reg = freshRegistry()
    val p = Pipeline.fromPointy("fields", "Load", reg,
      fields = Seq(
        InputField("path", required = true),
        InputField("limit", default = Some(10))))
    intercept[ImproperlyConfigured](p.start(spark))
    val bound = p.bind(Map("path" -> "/tmp/x"))
    assert(bound("limit") == 10)
  }

  test("typed input fields reject mismatched values") {
    import org.apache.spark.sql.types._
    val p = Pipeline.fromPointy("typed", "Load", freshRegistry(),
      fields = Seq(
        InputField("path", dataType = Some(StringType)),
        InputField("limit", dataType = Some(IntegerType)),
        InputField("tags", dataType = Some(ArrayType(StringType)))))
    // matching values bind
    val ok = p.bind(Map("path" -> "/x", "limit" -> 3, "tags" -> Seq("a")))
    assert(ok("limit") == 3)
    // wrong runtime types are rejected (fields.py:334-343 semantics)
    intercept[ImproperlyConfigured](p.bind(Map("limit" -> "not-a-number")))
    intercept[ImproperlyConfigured](p.bind(Map("path" -> 42)))
  }

  test("a 100k-stage chain executes end-to-end in constant stack") {
    // the reference raises the interpreter recursion limit for deep
    // chains (nexus/utils.py:35-56); the runner's work-list loop needs
    // no -Xss tuning — one StepContext per stage, zero frames per stage
    val reg = new EventRegistry
    val one = Seq(1).toDF("v") // one shared plan: the chain itself is
                               // under test, not 100k plan builds
    reg.registerTransform("E")(_ => one)
    val code = Array.fill(100000)("E").mkString(" -> ")
    val lineage = Pipeline.fromPointy("deep", code, reg).start(spark)
    assert(lineage.finalState == ExecutionState.Finished)
    assert(lineage.steps.size == 100000)
    assert(lineage.finalResult.nonEmpty)
  }
}
