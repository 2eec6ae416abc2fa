package graft.core

import org.apache.spark.sql.SparkSession
import scala.collection.mutable
import graft.dsl.StageNode
import graft.query.ResultSet

/** One step of the execution lineage — the analog of the reference's
  * EventExecutionContext (nexus/task.py:57-603). Holds the 1..n task
  * profiles executed in this step (n > 1 for a `||` chain), the merged
  * ResultSet, the errors, and the run state.
  */
final class StepContext(
    val taskProfiles: Seq[StageNode],
    val registry: EventRegistry) {

  var state: ExecutionState = ExecutionState.Pending
  private var _results: ResultSet = ResultSet.empty
  private val _errors = mutable.Buffer.empty[PipelineError]
  var previous: Option[StepContext] = None
  var next: Option[StepContext] = None

  def results: ResultSet = _results
  def errors: Seq[PipelineError] = _errors.toSeq
  def addResult(r: EventResult): Unit = _results = _results.add(r)
  def addError(e: PipelineError): Unit = _errors += e

  def eventNames: Seq[String] = taskProfiles.map(_.event)

  /** Parallel chains evaluate with the LAST task's policy
    * (nexus/task.py:387-418). */
  private def evaluator: EvaluationPolicy = {
    val last =
      if (taskProfiles.size == 1) taskProfiles.head
      else taskProfiles
        .find(t => t.pointerTypeToThis.contains(PipeType.Parallelism) &&
          !t.onSuccessPipe.contains(PipeType.Parallelism))
        .getOrElse(taskProfiles.last)
    registry.resolve(last.event).evaluationPolicy
  }

  /** nexus/task.py:230-246: cancelled/aborted force failed=true,
    * success=false. */
  def executionFailed: Boolean =
    if (state == ExecutionState.Cancelled || state == ExecutionState.Aborted) true
    else evaluator.contextEvaluation(
      _results.nonEmpty, _errors.nonEmpty, EvaluationContext.Failure)

  def executionSuccess: Boolean =
    if (state == ExecutionState.Cancelled || state == ExecutionState.Aborted) false
    else evaluator.contextEvaluation(
      _results.nonEmpty, _errors.nonEmpty, EvaluationContext.Success)
}

/** The full (doubly-linked) execution lineage; iterable head→tail with
  * `filterByEvent` (nexus/task.py:113-117, 563-603). */
final class ExecutionLineage(val head: Option[StepContext]) {
  def steps: Vector[StepContext] = {
    val b = Vector.newBuilder[StepContext]
    var cur = head
    while (cur.isDefined) { b += cur.get; cur = cur.get.next }
    b.result()
  }
  def latest: Option[StepContext] = steps.lastOption
  def filterByEvent(name: String): Vector[StepContext] =
    steps.filter(_.eventNames.exists(_.equalsIgnoreCase(name)))
  def finalResult: ResultSet = latest.map(_.results).getOrElse(ResultSet.empty)
  def finalState: ExecutionState =
    latest.map(_.state).getOrElse(ExecutionState.Pending)
}

/** Driver-side executor of a StageNode graph over Spark — the analog of
  * the reference's recursive execute_task (nexus/task.py:1050-1165).
  *
  * Control flow (conditional descriptors, goto, retry, stop) is inherently
  * eager: routing depends on completed stage outcomes. But the DATA path
  * stays lazy — handlers return DataFrames whose plans Catalyst fuses and
  * optimizes end-to-end, and success flags are driver-side Booleans, so a
  * linear pipeline composes into ONE Spark job at the final action. Only a
  * handler that itself runs an action forces materialization. That is the
  * 100 TB discipline: the runner schedules nothing per-row and collects
  * nothing; Spark owns all data movement.
  */
final class PipelineRunner(
    val spark: SparkSession,
    val registry: EventRegistry,
    val inputs: Map[String, Any] = Map.empty) {

  private var headContext: Option[StepContext] = None
  // tail pointer: sink drains read the latest context once per pop, and
  // walking the list from head would be O(stages) per sink on deep chains
  private var tailContext: Option[StepContext] = None
  @volatile private var stopRequested = false

  /** External cancellation (pipeline.stop analog, nexus/pipeline.py:362-382). */
  def requestStop(): Unit = stopRequested = true

  def run(root: StageNode): ExecutionLineage = {
    headContext = None
    tailContext = None
    val sinkQueue = mutable.Stack.empty[StageNode]
    executeTask(Option(root), None, sinkQueue)
    new ExecutionLineage(headContext)
  }

  private def latestContext: Option[StepContext] = tailContext

  /** nexus/task.py:1050-1165 — the reference's recursion (one frame per
    * stage, which is why it raises the interpreter recursion limit,
    * nexus/utils.py:35-56) lowered to a WORK-LIST LOOP: every recursive
    * call there is a tail call, so (task, previous) becomes loop state
    * and a 100k-stage chain runs in constant stack. The LIFO sink drain
    * and switch-routing with the *previous* context are preserved
    * exactly, including the unwinding semantics of the original `return`
    * on cancel/abort: before any sink drain has begun it ends the run
    * with queued sinks dropped (the recursive form unwound every
    * tail-call frame to the top); once draining, it abandons only the
    * current chain and the drain continues with the remaining sinks
    * (the unwind stopped at the drain loop's frame). */
  private def executeTask(
      taskOpt: Option[StageNode],
      previousStart: Option[StepContext],
      sinkQueue: mutable.Stack[StageNode]): Unit = {
    var task: Option[StageNode] = taskOpt
    var previous: Option[StepContext] = previousStart
    var draining = false
    var done = false

    while (!done) task match {
      case None =>
        if (sinkQueue.isEmpty) done = true
        else {
          draining = true
          task = Some(sinkQueue.pop())
          previous = latestContext
        }

      case Some(task0) =>
        // Queue this node's sink for after the conditional region. The
        // reference skips this (and parallel-chain collection) for the ROOT
        // node (nexus/task.py:1073-1100 runs both only under
        // `previous_context is not None`) — an asymmetry we deliberately
        // remove: a root conditional's sink runs, a root `||` chain merges.
        task0.sink.foreach(sinkQueue.push)

        // collect the `||` chain (nexus/task.py:1080-1096)
        val profiles = mutable.Buffer.empty[StageNode]
        var t: StageNode = task0
        while (t != null && t.onSuccessPipe.contains(PipeType.Parallelism)) {
          profiles += t
          t = t.onSuccess.orNull
        }
        val (taskForRouting, ctxProfiles) =
          if (profiles.nonEmpty) { profiles += t; (t, profiles.toSeq) }
          else (task0, Seq(task0))

        val ctx = new StepContext(ctxProfiles, registry)
        previous match {
          case Some(p) => ctx.previous = Some(p); p.next = Some(ctx)
          case None    => headContext = Some(ctx)
        }
        tailContext = Some(ctx)

        val switchRequest = dispatch(ctx)

        if (ctx.state == ExecutionState.Cancelled ||
            ctx.state == ExecutionState.Aborted) {
          if (draining) task = None // abandon this chain, keep draining
          else done = true          // pre-drain: run ends, queued sinks drop
        } else switchRequest match {
          case Some(sw) =>
            val target = taskForRouting.getDescriptor(sw.descriptor)
            if (target.isEmpty)
              throw TaskSwitchingError(
                s"Task cannot switch to task using the descriptor ${sw.descriptor}.")
            // switch branch sees the SAME previous context as the switching
            // task (nexus/task.py:1126-1131)
            task = target
          case None =>
            task =
              if (taskForRouting.isConditional) {
                if (ctx.executionFailed) taskForRouting.onFailure
                else taskForRouting.onSuccess
              } else taskForRouting.onSuccess
            previous = Some(ctx)
        }
    }
  }

  /** Execute every task profile of the step (nexus/task.py:281-535).
    * Parallel profiles are dispatched sequentially on the driver: their
    * DataFrames are lazy, so concurrency comes from Spark's scheduler at
    * action time, not from driver threads. Returns a goto request if any
    * profile raised SwitchTask with a configured descriptor.
    */
  private def dispatch(ctx: StepContext): Option[SwitchTask] = {
    ctx.state = ExecutionState.Executing
    var switchRequest: Option[SwitchTask] = None

    ctx.taskProfiles.foreach { profile =>
      val event = registry.resolve(profile.event)
      graft.telemetry.Signals.emit("event_execution_start",
        Map("event_name" -> profile.event, "task_id" -> profile.id))
      var endError: Option[String] = None

      // `|->` hands the previous step's ResultSet to the handler; for a
      // `||` chain the pipe type is read off the chain head's incoming
      // edge (nexus/task.py:371-377)
      val pointerType =
        if (profile.isParallelNode)
          parallelParent(profile).pointerTypeToThis
        else profile.pointerTypeToThis
      val previousResult =
        if (pointerType.contains(PipeType.PipePointer))
          Some(ctx.previous.map(_.results).getOrElse(ResultSet.empty))
        else None

      val callCtx = EventContext(
        spark, inputs, previousResult, profile.event, profile.id)

      // `A * n` overrides the event's max_attempts (nexus/task.py:119-127)
      val policy: Option[RetryPolicy] = profile.retries match {
        case Some(n) =>
          Some(event.retryPolicy.getOrElse(RetryPolicy()).copy(maxAttempts = n))
        case None => event.retryPolicy
      }

      try {
        if (stopRequested) throw StopProcessingError("stop requested")
        event.canBypass(callCtx) match {
          case Some(data) =>
            ctx.addResult(EventResult(
              error = false, profile.event, profile.id, Some(data),
              message = Some("bypassed")))
          case None =>
            val (status, content) = Retry.run(policy, onRetry = n =>
              graft.telemetry.Signals.emit("event_execution_retry",
                Map("event_name" -> profile.event, "task_id" -> profile.id,
                  "retry_count" -> n)))(event.process(callCtx))
            if (status) {
              ctx.addResult(EventResult(
                error = false, profile.event, profile.id, Option(content)))
              if (event.stopOnSuccess)
                throw StopProcessingError(s"stop_on_success: ${profile.event}")
            } else {
              val r = EventResult(
                error = true, profile.event, profile.id, Option(content))
              ctx.addResult(r)
              ctx.addError(PipelineError(
                s"event returned failure", profile.event, profile.id))
              endError = Some("event returned failure")
              if (event.stopOnError)
                throw StopProcessingError(s"stop_on_error: ${profile.event}")
            }
        }
      } catch {
        case sw: SwitchTask =>
          // goto: record the carried result, then route
          // (nexus/task.py:481-497, 522-535)
          ctx.addResult(EventResult(
            error = false, profile.event, profile.id, sw.result))
          val lastProfile = ctx.taskProfiles.last
          if (lastProfile.extraDescriptors.contains(sw.descriptor))
            switchRequest = Some(sw)
          else {
            ctx.state = ExecutionState.Cancelled
            ctx.addError(PipelineError(
              s"no configured descriptor ${sw.descriptor}",
              profile.event, profile.id))
          }
        case stop: StopProcessingError =>
          ctx.state = ExecutionState.Cancelled
          ctx.addResult(EventResult(
            error = true, profile.event, profile.id, None,
            message = Some(stop.getMessage)))
          ctx.addError(PipelineError(stop.getMessage, profile.event, profile.id,
            Some(stop)))
          endError = Some(stop.getMessage)
          graft.telemetry.Signals.emit("event_execution_cancelled",
            Map("event_name" -> profile.event, "task_id" -> profile.id))
        case scala.util.control.NonFatal(e) =>
          ctx.addResult(EventResult(
            error = true, profile.event, profile.id, None,
            message = Some(e.toString)))
          ctx.addError(PipelineError(e.toString, profile.event, profile.id, Some(e)))
          endError = Some(e.toString)
      }
      graft.telemetry.Signals.emit("event_execution_end",
        Map("event_name" -> profile.event, "task_id" -> profile.id) ++
          endError.map("error" -> _))
    }

    if (ctx.state == ExecutionState.Executing)
      ctx.state = ExecutionState.Finished
    switchRequest
  }

  private def parallelParent(node: StageNode): StageNode =
    node.parent match {
      case Some(p) if p.onSuccessPipe.contains(PipeType.Parallelism) =>
        parallelParent(p)
      case _ => node
    }
}
