package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.query.ResultSet
import scala.collection.concurrent.TrieMap

/** Metadata of one event execution — the only stable record schema in the
  * reference (nexus/result.py:21-31). `content` lives beside it as a lazy
  * DataFrame rather than a pickled payload.
  */
final case class EventResultMeta(
    id: String,
    error: Boolean,
    eventName: String,
    taskId: String,
    processId: Long,
    creationTime: Double,
    message: Option[String] = None)

/** One event execution result: driver-side meta + lazy Spark content. */
final case class EventResult(meta: EventResultMeta, content: Option[DataFrame]) {
  def isError: Boolean = meta.error
}

object EventResult {
  def apply(
      error: Boolean,
      eventName: String,
      taskId: String,
      content: Option[DataFrame],
      message: Option[String] = None): EventResult =
    EventResult(
      EventResultMeta(
        id = java.util.UUID.randomUUID().toString,
        error = error,
        eventName = eventName,
        taskId = taskId,
        processId = ProcessHandle.current().pid(),
        creationTime = System.currentTimeMillis() / 1000.0,
        message = message),
      content)
}

/** Per-invocation context handed to an event handler. Carries the pipeline
  * inputs, the previous stage's ResultSet for `|->` edges
  * (nexus/task.py:371-377), and the goto/stop control verbs
  * (nexus/base.py:456-497, 553-608).
  */
final case class EventContext(
    spark: SparkSession,
    inputs: Map[String, Any],
    previousResult: Option[ResultSet],
    eventName: String,
    taskId: String) {

  def input[T](name: String): T = inputs(name).asInstanceOf[T]
  def inputOpt[T](name: String): Option[T] =
    inputs.get(name).map(_.asInstanceOf[T])

  /** Previous stage's merged content, if any — the common case for `|->`. */
  def previousContent: Option[DataFrame] = previousResult.flatMap(_.content)

  /** Jump to the sibling descriptor branch `d` (2..9) of the current
    * conditional region (nexus/base.py:456-497). */
  def goto(descriptor: Int, result: DataFrame = null): Nothing =
    throw SwitchTask(descriptor, Option(result))

  /** Cancel the whole pipeline (nexus/base.py:553-608). */
  def stopProcessing(reason: String = "stopped by event"): Nothing =
    throw StopProcessingError(reason)
}

/** A unit of work: `process` returns (successFlag, content). The Spark
  * analog of nexus/base.py:364-649 EventBase — row-level logic should be
  * built-in Column expressions inside `content`'s plan, keeping the stage
  * lazy; the Boolean is a driver-side flag, not an action.
  */
trait EventBase {
  /** Registry key; case-insensitive resolution (nexus/task.py:809-826). */
  def name: String = {
    val n = getClass.getSimpleName
    if (n.endsWith("$")) n.dropRight(1) else n
  }

  def process(ctx: EventContext): (Boolean, DataFrame)

  /** None = no retry (reference default: retry only when configured). */
  def retryPolicy: Option[RetryPolicy] = None

  def evaluationPolicy: EvaluationPolicy = EvaluationPolicy.default

  /** Some(data) → skip process() and synthesize a success result
    * (nexus/base.py:499-521 can_bypass_current_event). */
  def canBypass(ctx: EventContext): Option[DataFrame] = None

  /** Raise StopProcessingError after a success / failure outcome
    * (nexus/base.py:553-608 stop_on_success / stop_on_error). */
  def stopOnSuccess: Boolean = false
  def stopOnError: Boolean = false
}

/** Name → event registry; the analog of scanning EventBase subclasses
  * (nexus/base.py:610-614) made explicit. Thread-safe so streaming
  * foreachBatch workers can resolve concurrently.
  */
final class EventRegistry {
  private val events = TrieMap.empty[String, EventBase]

  def register(event: EventBase): this.type = {
    events.put(event.name.toLowerCase, event); this
  }

  /** Function-based registration — the `@event` decorator analog
    * (nexus/decorators.py:12-50). */
  def register(
      eventName: String,
      policy: EvaluationPolicy = EvaluationPolicy.default,
      retry: Option[RetryPolicy] = None,
      haltOnSuccess: Boolean = false,
      haltOnError: Boolean = false)(
      fn: EventContext => (Boolean, DataFrame)): this.type =
    register(new EventBase {
      override val name: String = eventName
      override def process(ctx: EventContext): (Boolean, DataFrame) = fn(ctx)
      override def evaluationPolicy: EvaluationPolicy = policy
      override def retryPolicy: Option[RetryPolicy] = retry
      override def stopOnSuccess: Boolean = haltOnSuccess
      override def stopOnError: Boolean = haltOnError
    })

  /** Sugar: a pure DataFrame transform that always succeeds. */
  def registerTransform(eventName: String)(
      fn: EventContext => DataFrame): this.type =
    register(eventName)(ctx => (true, fn(ctx)))

  def resolve(eventName: String): EventBase =
    events.getOrElse(eventName.toLowerCase, throw EventDoesNotExist(eventName))

  def contains(eventName: String): Boolean =
    events.contains(eventName.toLowerCase)

  def names: Seq[String] = events.values.map(_.name).toSeq.sorted
}

/** Driver-side retry executor (nexus/base.py:155-209): exponential backoff
  * `factor * 2^(n-1)` capped at maxBackoff, retrying only listed exception
  * classes (or all when unlisted); MaxRetryError when exhausted.
  */
object Retry {
  def run[T](policy: Option[RetryPolicy], onRetry: Int => Unit = _ => ())(
      fn: => T): T = policy match {
    case None => fn
    case Some(p) =>
      var retryCount = 0
      var firstCause: Throwable = null
      var out: Option[T] = None
      while (out.isEmpty) {
        if (retryCount >= p.maxAttempts)
          throw MaxRetryError(retryCount, firstCause)
        retryCount += 1
        try out = Some(fn)
        catch {
          case e: MaxRetryError => throw e
          case e: SwitchTask => throw e
          case e: StopProcessingError => throw e
          case scala.util.control.NonFatal(e) if p.isRetryable(e) =>
            if (firstCause == null) firstCause = e
            onRetry(retryCount)
            val backoff = p.backoffTime(retryCount)
            if (backoff > 0) Thread.sleep((backoff * 1000).toLong)
        }
      }
      out.get
  }
}
