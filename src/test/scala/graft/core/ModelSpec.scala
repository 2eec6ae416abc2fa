package graft.core

import org.scalatest.funsuite.AnyFunSuite

/** Evaluation truth table from tests/unittests/test_base.py:68-107 and the
  * retry backoff formula from nexus/base.py:121-127. */
class ModelSpec extends AnyFunSuite {
  import EvaluationPolicy._

  // _evaluate(results, errors): hasResults = results nonEmpty
  test("SUCCESS_ON_ALL_EVENTS_SUCCESS") {
    assert(SuccessOnAllEventsSuccess.evaluate(hasResults = true, hasError = false))
    assert(!SuccessOnAllEventsSuccess.evaluate(hasResults = true, hasError = true))
  }

  test("FAILURE_FOR_PARTIAL_ERROR") {
    assert(!FailureForPartialError.evaluate(hasResults = true, hasError = false))
    assert(FailureForPartialError.evaluate(hasResults = true, hasError = true))
  }

  test("SUCCESS_FOR_PARTIAL_SUCCESS") {
    assert(SuccessForPartialSuccess.evaluate(hasResults = true, hasError = true))
    assert(!SuccessForPartialSuccess.evaluate(hasResults = false, hasError = true))
  }

  test("FAILURE_FOR_ALL_EVENTS_FAILURE") {
    assert(!FailureForAllEventsFailure.evaluate(hasResults = true, hasError = true))
    assert(FailureForAllEventsFailure.evaluate(hasResults = false, hasError = true))
  }

  test("context evaluation: success-flavored policies answer Success directly") {
    val s = SuccessOnAllEventsSuccess
    assert(s.contextEvaluation(true, false, EvaluationContext.Success))
    assert(!s.contextEvaluation(true, false, EvaluationContext.Failure))
    assert(!s.contextEvaluation(true, true, EvaluationContext.Success))
    assert(s.contextEvaluation(true, true, EvaluationContext.Failure))
  }

  test("context evaluation: failure-flavored policies invert for Success") {
    val f = FailureForPartialError
    assert(!f.contextEvaluation(true, true, EvaluationContext.Success))
    assert(f.contextEvaluation(true, true, EvaluationContext.Failure))
    assert(f.contextEvaluation(true, false, EvaluationContext.Success))
    assert(!f.contextEvaluation(true, false, EvaluationContext.Failure))
  }

  test("backoff formula: factor * 2^(n-1), capped, zero for first retry") {
    val p = RetryPolicy(maxAttempts = 10, backoffFactor = 0.05, maxBackoff = 100)
    assert(p.backoffTime(0) == 0.0)
    assert(p.backoffTime(1) == 0.0)
    assert(p.backoffTime(2) == 0.05 * 2)
    assert(p.backoffTime(3) == 0.05 * 4)
    assert(RetryPolicy(backoffFactor = 50, maxBackoff = 100).backoffTime(5) == 100.0)
  }

  test("retry defaults mirror the reference settings") {
    val p = RetryPolicy()
    assert(p.maxAttempts == 5)
    assert(p.backoffFactor == 0.05)
    assert(p.maxBackoff == 100.0)
    assert(p.retryOnExceptions.isEmpty)
  }

  test("retry loop: succeeds after transient failures, counts attempts") {
    var calls = 0
    val out = Retry.run(Some(RetryPolicy(maxAttempts = 5, backoffFactor = 0.0))) {
      calls += 1
      if (calls < 3) throw new RuntimeException("transient")
      "ok"
    }
    assert(out == "ok" && calls == 3)
  }

  test("retry loop: MaxRetryError after exhaustion, carrying first cause") {
    var calls = 0
    val e = intercept[MaxRetryError] {
      Retry.run(Some(RetryPolicy(maxAttempts = 3, backoffFactor = 0.0))) {
        calls += 1; throw new RuntimeException(s"boom $calls")
      }
    }
    assert(calls == 3)
    assert(e.attempt == 3)
    assert(e.cause.getMessage == "boom 1")
  }

  test("retry loop: non-listed exceptions are not retried") {
    var calls = 0
    intercept[IllegalStateException] {
      Retry.run(Some(RetryPolicy(maxAttempts = 5,
        retryOnExceptions = Seq(classOf[IllegalArgumentException])))) {
        calls += 1; throw new IllegalStateException("not retryable")
      }
    }
    assert(calls == 1)
  }
}
