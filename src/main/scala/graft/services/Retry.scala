package graft.services

/** Bounded retry with exponential backoff — the reference's
  * RetryExecutor (debezium-server-core/.../util/RetryExecutor.java:54-91)
  * and the Fluss sink's defaults (FlussChangeConsumerConfig.java:50-53:
  * 5 attempts / 1000 ms initial / 60000 ms cap / 2.0 multiplier).
  *
  * Spark retries *tasks* wholesale; this is for sink-internal partial
  * retry inside foreachBatch writers (e.g. resubmitting only failed
  * entries, KinesisChangeConsumer.java:166-202), where task-level retry
  * would re-send already-delivered records.
  */
final case class RetryPolicy(maxAttempts: Int = 5,
                             initialIntervalMs: Long = 1000L,
                             maxIntervalMs: Long = 60000L,
                             multiplier: Double = 2.0,
                             retryable: Throwable => Boolean = _ => true)

object Retry {
  /** Run `op`, retrying per policy. `sleeper` is injectable for tests. */
  def apply[T](policy: RetryPolicy, sleeper: Long => Unit = Thread.sleep)(op: Int => T): T = {
    var interval = policy.initialIntervalMs
    var attempt = 1
    while (true) {
      try return op(attempt)
      catch {
        case e: Throwable =>
          if (attempt >= policy.maxAttempts || !policy.retryable(e)) throw e
          sleeper(interval)
          interval = math.min((interval * policy.multiplier).toLong, policy.maxIntervalMs)
          attempt += 1
      }
    }
    throw new IllegalStateException("unreachable")
  }
}
