package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Retry

/** Bounded-retry semantics against a flaky stub: succeeds after transient
  * failures, honors the backoff schedule (injected sleep — no waiting),
  * rethrows the LAST failure once attempts are exhausted, and never
  * swallows fatal errors. */
class RetrySpec extends AnyFunSuite {

  test("returns the first success and sleeps the backoff schedule between attempts") {
    var calls = 0
    var sleeps = Vector.empty[Long]
    val out = Retry.withRetry(times = 5, delayMs = 10L, backoff = 2.0,
      label = "flaky", sleep = sleeps :+= _) {
      calls += 1
      if (calls < 3) sys.error(s"transient #$calls")
      "connected"
    }
    assert(out == "connected")
    assert(calls == 3)           // two failures, third attempt succeeds
    assert(sleeps == Vector(10L, 20L)) // exponential, no sleep after success
  }

  test("no retry on first-attempt success") {
    var calls = 0
    var slept = false
    Retry.withRetry(times = 3, sleep = _ => slept = true) { calls += 1 }
    assert(calls == 1 && !slept)
  }

  test("exhausted attempts rethrow the last failure") {
    var calls = 0
    val e = intercept[RuntimeException] {
      Retry.withRetry(times = 3, delayMs = 1L, label = "down", sleep = _ => ()) {
        calls += 1
        sys.error(s"attempt $calls")
      }
    }
    assert(calls == 3)
    assert(e.getMessage == "attempt 3") // the LAST failure, not the first
  }

  test("fatal errors propagate immediately without retry") {
    var calls = 0
    intercept[OutOfMemoryError] {
      Retry.withRetry(times = 3, sleep = _ => ()) {
        calls += 1
        throw new OutOfMemoryError("fatal")
      }
    }
    assert(calls == 1)
  }
}
