package graft.sources

import scala.util.control.NonFatal

/** Bounded retry with exponential backoff for connection-establishing
  * calls — the reference wraps every DB/broker connect in a retry decorator
  * (etl/utils/retry.py:6-39, fixed delay, bounded attempts, rethrow last).
  *
  * Scope, deliberately narrow: Spark's task scheduler already retries the
  * DATA path (failed tasks re-run on other executors, stages re-attempt),
  * so wrapping transformations here would be redundant. What Spark does
  * NOT retry is driver-side setup — a JDBC connect/schema probe, a stream
  * sink's startup — which is exactly where transient
  * network/database-warmup failures land. Those entry points route
  * through [[withRetry]].
  */
object Retry {

  /** Run `f`, retrying up to `times` total attempts on non-fatal failure,
    * sleeping `delayMs * backoff^(attempt-1)` between attempts; the last
    * failure is rethrown. `sleep` is injectable so specs can assert the
    * schedule without waiting. */
  def withRetry[T](times: Int = 3, delayMs: Long = 1000L, backoff: Double = 2.0,
                   label: String = "operation",
                   sleep: Long => Unit = Thread.sleep)(f: => T): T = {
    var attempt = 1
    var delay = delayMs
    while (true) {
      try {
        return f
      } catch {
        case NonFatal(e) if attempt < times =>
          System.err.println(
            s"[retry] $label attempt $attempt/$times failed: ${e.getMessage}")
          sleep(delay)
          delay = math.max(1L, (delay * backoff).toLong)
          attempt += 1
      }
    }
    throw new IllegalStateException("unreachable")
  }
}
