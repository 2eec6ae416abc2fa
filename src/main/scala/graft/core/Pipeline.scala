package graft.core

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types.{DataType, StructField, StructType}
import graft.dsl.{StageGraph, StageNode}

/** Declarative typed input on a pipeline — the analog of InputDataField
  * (nexus/fields.py:234-362): optional Spark DataType (None = untyped,
  * the UNKNOWN sentinel), required-ness, default value.
  */
final case class InputField(
    name: String,
    dataType: Option[DataType] = None,
    required: Boolean = false,
    default: Option[Any] = None,
    batchSize: Option[Int] = None) {

  def toStructField: StructField =
    StructField(name, dataType.getOrElse(org.apache.spark.sql.types.BinaryType),
      nullable = !required)
}

/** A named, composed dataflow pipeline: Pointy source parsed once at
  * construction (the metaclass-parse analog, nexus/pipeline.py:150-202),
  * inputs validated against declared fields (nexus/pipeline.py:235-281),
  * then executed stage-by-stage over Spark by PipelineRunner.
  */
final class Pipeline(
    val name: String,
    val pointy: String,
    val registry: EventRegistry,
    val fields: Seq[InputField] = Nil) {

  /** Parsed once; BadPipelineError analog surfaces as the parser's
    * IllegalArgumentException with line/col context. */
  val root: StageNode = StageGraph.build(pointy)

  // analysis: every referenced event must resolve (reference resolves
  // lazily at execution, nexus/task.py:809-826; we fail fast)
  locally {
    val seen = scala.collection.mutable.Set.empty[String]
    val missing = scala.collection.mutable.Set.empty[String]
    var work: List[StageNode] = List(root)
    while (work.nonEmpty) {
      val n = work.head
      work = work.tail
      if (seen.add(n.id)) {
        if (!registry.contains(n.event)) missing += n.event
        work = n.children.toList ++ work
      }
    }
    if (missing.nonEmpty)
      throw EventDoesNotExist(missing.toSeq.sorted.mkString(", "))
  }

  def inputSchema: StructType = StructType(fields.map(_.toStructField))

  /** Validate + default-fill inputs (nexus/fields.py:334-351): required
    * fields must be present, and values must match the declared Spark
    * type when one is set (the reference's assignment-time type check,
    * fields.py:334-343; None dataType = the UNKNOWN untyped sentinel). */
  def bind(inputs: Map[String, Any]): Map[String, Any] = {
    val withDefaults = fields.flatMap { f =>
      inputs.get(f.name).orElse(f.default).map(f.name -> _)
    }.toMap ++ (inputs -- fields.map(_.name))
    val missing = fields.filter(f => f.required && !withDefaults.contains(f.name))
    if (missing.nonEmpty)
      throw ImproperlyConfigured(
        s"Required input(s) not provided: ${missing.map(_.name).mkString(", ")}")
    fields.foreach { f =>
      for (dt <- f.dataType; v <- withDefaults.get(f.name))
        if (!typeMatches(dt, v))
          throw ImproperlyConfigured(
            s"Input '${f.name}' expects ${dt.simpleString}, got " +
              s"${v.getClass.getSimpleName} ($v)")
    }
    withDefaults
  }

  private def typeMatches(dt: DataType, v: Any): Boolean = {
    import org.apache.spark.sql.types._
    (dt, v) match {
      case (StringType, _: String)               => true
      case (IntegerType, _: Int)                 => true
      case (LongType, _: Long | _: Int)          => true
      case (DoubleType, _: Double | _: Float)    => true
      case (BooleanType, _: Boolean)             => true
      case (BinaryType, _: Array[Byte])          => true
      case (_: ArrayType, _: Seq[_] | _: Array[_]) => true
      case (_: MapType, _: Map[_, _])            => true
      case (_: StructType, _: org.apache.spark.sql.Row) => true
      case _ => false
    }
  }

  @volatile private var runner: Option[PipelineRunner] = None
  @volatile private var executed = false

  /** Run the pipeline. `forceRerun=false` + already ran → error, the
    * EventDone guard (nexus/pipeline.py:304-337). */
  def start(
      spark: SparkSession,
      inputs: Map[String, Any] = Map.empty,
      forceRerun: Boolean = false): ExecutionLineage = synchronized {
    if (executed && !forceRerun)
      throw ImproperlyConfigured(s"Pipeline '$name' already executed (EventDone)")
    executed = true
    graft.telemetry.Signals.emit("pipeline_execution_start",
      Map("pipeline" -> name))
    val r = new PipelineRunner(spark, registry, bind(inputs))
    runner = Some(r)
    val lineage = r.run(root)
    val endSignal = lineage.finalState match {
      case ExecutionState.Cancelled => "pipeline_stop"
      case ExecutionState.Aborted   => "pipeline_shutdown"
      case _                        => "pipeline_execution_end"
    }
    graft.telemetry.Signals.emit(endSignal,
      Map("pipeline" -> name, "state" -> lineage.finalState.toString))
    lineage
  }

  /** Cooperative stop: takes effect before the next stage dispatch
    * (nexus/pipeline.py:362-382). */
  def stop(): Unit = runner.foreach(_.requestStop())

  /** ASCII DAG, the draw_ascii_graph analog (nexus/pipeline.py:414-496). */
  def treeString: String = root.treeString

  /** Graphviz dot output (nexus/translator/dot.py:27-114). */
  def toDot: String = {
    val sb = new StringBuilder(s"digraph ${name.replaceAll("\\W", "_")} {\n")
    def esc(n: StageNode) = s""""${n.event}_${n.id}" [label="${n.event}"]"""
    val seen = scala.collection.mutable.Set.empty[String]
    def walk(n: StageNode): Unit = {
      if (seen.add(n.id)) {
        sb.append("  ").append(esc(n)).append('\n')
        def edge(c: StageNode, lbl: String): Unit = {
          sb.append(s"""  "${n.event}_${n.id}" -> "${c.event}_${c.id}" [label="$lbl"]""")
            .append('\n')
          walk(c)
        }
        n.onFailure.foreach(edge(_, "0"))
        n.onSuccess.foreach(c => edge(c,
          if (n.isConditional) "1" else n.onSuccessPipe.map(_.token).getOrElse("")))
        n.extraDescriptors.foreach { case (d, (_, c)) => edge(c, d.toString) }
        n.sink.foreach(edge(_, "sink"))
      }
    }
    walk(root)
    sb.append("}\n").result()
  }
}

object Pipeline {
  def fromPointy(
      name: String,
      pointy: String,
      registry: EventRegistry,
      fields: Seq[InputField] = Nil): Pipeline =
    new Pipeline(name, pointy, registry, fields)

  /** Load the Pointy source from a `.pty` file — the `Meta.file` path of
    * the reference (nexus/pipeline.py:166-187). */
  def fromPointyFile(
      name: String,
      path: String,
      registry: EventRegistry,
      fields: Seq[InputField] = Nil): Pipeline =
    new Pipeline(name,
      new String(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path)),
        java.nio.charset.StandardCharsets.UTF_8),
      registry, fields)

  /** Directory search for `<name>.pty`, case-insensitive — the metaclass
    * file-discovery path (nexus/pipeline.py:204-219). */
  def discover(
      name: String,
      dir: String,
      registry: EventRegistry,
      fields: Seq[InputField] = Nil): Pipeline = {
    val files = Option(new java.io.File(dir).listFiles()).getOrElse(Array.empty)
    val hit = files.find(f => f.getName.equalsIgnoreCase(s"$name.pty"))
      .getOrElse(throw ImproperlyConfigured(
        s"No pointy file '$name.pty' found in $dir"))
    fromPointyFile(name, hit.getPath, registry, fields)
  }
}
