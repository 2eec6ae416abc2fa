package graft.core

/* Core model types for the graft dataflow engine.
 *
 * Semantics mirror the reference event-pipeline framework (see SURVEY.md):
 * pipe types between stages (nexus/task.py:637-640), execution states
 * (nexus/task.py:49-55), retry policy with exponential backoff
 * (nexus/base.py:66-147), and the four-policy success evaluation
 * (nexus/base.py:276-361). The execution substrate is Apache Spark:
 * stage payloads are DataFrames and the evaluation needs only
 * driver-side flags, so plans stay lazy across stages.
 * (File-header comment, not scaladoc — it attaches to nothing.)
 */

/** How a stage is connected to its successor (nexus/task.py:637-640). */
sealed abstract class PipeType(val token: String)
object PipeType {
  /** `A -> B`: B starts after A; B sees only pipeline inputs. */
  case object Pointer extends PipeType("->")
  /** `A |-> B`: B receives A's ResultSet as previousResult. */
  case object PipePointer extends PipeType("|->")
  /** `A || B`: A and B run in the same execution context; results merge. */
  case object Parallelism extends PipeType("||")
  /** `A * 3`: retry factor (not a real edge). */
  case object Retry extends PipeType("*")

  def fromToken(tok: String): PipeType = tok match {
    case "->"  => Pointer
    case "|->" => PipePointer
    case "||"  => Parallelism
    case "*"   => Retry
    case other => throw new IllegalArgumentException(s"unknown pipe token '$other'")
  }
}

/** Run state of one execution context (nexus/task.py:49-55). */
sealed trait ExecutionState
object ExecutionState {
  case object Pending   extends ExecutionState
  case object Executing extends ExecutionState
  /** User-requested stop (StopProcessingError / pipeline.stop). */
  case object Cancelled extends ExecutionState
  case object Finished  extends ExecutionState
  /** Error abort. */
  case object Aborted   extends ExecutionState
}

/** Whether the evaluation asks "did it succeed?" or "did it fail?"
  * (nexus/base.py:270-273). */
sealed trait EvaluationContext
object EvaluationContext {
  case object Success extends EvaluationContext
  case object Failure extends EvaluationContext
}

/** The four success-evaluation policies (nexus/base.py:276-361).
  *
  * `hasResults` counts ALL task results (error ones included — the
  * reference adds error results to execution_result too,
  * nexus/task.py:511-520); `hasError` is the error list's non-emptiness.
  */
sealed trait EvaluationPolicy {
  import EvaluationPolicy._

  /** Raw policy predicate (nexus/base.py:297-308). */
  final def evaluate(hasResults: Boolean, hasError: Boolean): Boolean = this match {
    case SuccessOnAllEventsSuccess  => !hasError && hasResults
    case SuccessForPartialSuccess   => hasResults
    case FailureForPartialError     => hasError
    case FailureForAllEventsFailure => !hasResults && hasError
  }

  /** Context-adjusted evaluation (nexus/base.py:310-361): success-flavored
    * policies answer the Success question directly and are negated for the
    * Failure question; failure-flavored policies vice versa. */
  final def contextEvaluation(
      hasResults: Boolean,
      hasError: Boolean,
      context: EvaluationContext): Boolean = {
    val status = evaluate(hasResults, hasError)
    val successFlavored =
      this == SuccessOnAllEventsSuccess || this == SuccessForPartialSuccess
    context match {
      case EvaluationContext.Success => if (successFlavored) status else !status
      case EvaluationContext.Failure => if (successFlavored) !status else status
    }
  }
}
object EvaluationPolicy {
  case object SuccessOnAllEventsSuccess  extends EvaluationPolicy
  case object FailureForPartialError     extends EvaluationPolicy
  case object SuccessForPartialSuccess   extends EvaluationPolicy
  case object FailureForAllEventsFailure extends EvaluationPolicy
  /** Reference default (nexus/base.py:371). */
  val default: EvaluationPolicy = SuccessOnAllEventsSuccess
}

/** Retry policy; defaults mirror nexus/settings.py:5-7 + constants.py:7-11. */
final case class RetryPolicy(
    maxAttempts: Int = 5,
    backoffFactor: Double = 0.05,
    maxBackoff: Double = 100.0,
    retryOnExceptions: Seq[Class[_ <: Throwable]] = Nil) {

  /** Backoff before attempt n+1, given n completed attempts:
    * factor * 2^(n-1), capped; 0 for the first retry
    * (nexus/base.py:121-127). */
  def backoffTime(retryCount: Int): Double =
    if (retryCount <= 1) 0.0
    else math.min(backoffFactor * math.pow(2, retryCount - 1), maxBackoff)

  /** Retryable iff the exception list is empty (retry everything) or the
    * class matches exactly (nexus/base.py:136-147). */
  def isRetryable(e: Throwable): Boolean =
    retryOnExceptions.isEmpty ||
      retryOnExceptions.exists(c => c.isInstance(e) && e.getClass.getName == c.getName)
}

// ---------------------------------------------------------------------------
// Exceptions (nexus/exceptions.py)
// ---------------------------------------------------------------------------

/** Raised when retries are exhausted (nexus/exceptions.py:67-80). */
final case class MaxRetryError(attempt: Int, cause: Throwable)
    extends RuntimeException(
      s"Retryable event is already exhausted after $attempt attempts: ${Option(cause).map(_.toString).getOrElse("")}",
      cause)

/** Raised by a handler to cancel the whole pipeline
  * (nexus/base.py:553-608 stop_on_* → StopProcessingError). */
final case class StopProcessingError(reason: String)
    extends RuntimeException(reason)

/** Raised by `ctx.goto(...)` to jump to a sibling descriptor branch
  * (nexus/exceptions.py:97-115, nexus/base.py:456-497). */
final case class SwitchTask(
    descriptor: Int,
    result: Option[org.apache.spark.sql.DataFrame],
    executeOnEventMethod: Boolean = true)
    extends RuntimeException(s"switch to descriptor $descriptor")

/** Unknown event name at plan build (nexus/exceptions.py EventDoesNotExist). */
final case class EventDoesNotExist(name: String)
    extends RuntimeException(s"'$name' was not found.")

/** Descriptor switch target missing (nexus/task.py:1114-1131). */
final case class TaskSwitchingError(message: String)
    extends RuntimeException(message)

/** ResultSet.get matched more than one row (nexus/result.py:247-259). */
final case class MultiValueError(message: String)
    extends RuntimeException(message)

/** Insert hit an existing key (nexus/exceptions.py ObjectExistError). */
final case class ObjectExistError(message: String)
    extends RuntimeException(message)

/** Update/delete/get missed (nexus/exceptions.py ObjectDoesNotExist). */
final case class ObjectDoesNotExist(message: String)
    extends RuntimeException(message)

/** Pipeline misconfiguration (nexus/exceptions.py ImproperlyConfigured). */
final case class ImproperlyConfigured(message: String)
    extends RuntimeException(message)

/** One recorded stage error (nexus/result.py PipelineError analog). */
final case class PipelineError(
    message: String,
    eventName: String,
    taskId: String,
    cause: Option[Throwable] = None)
