package graft.sinks

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** Executor-side KV writer — the production path for the
  * Infinispan/Redis semantic family (batch putAll:
  * InfinispanSinkConsumer.java:111-125; Redis streams + pipeline:
  * RedisStreamChangeConsumer.java:158-276). [[KvSink]] remains the
  * driver-side TEST DOUBLE; this sink opens one client per partition
  * via `foreachPartition` and never collects to the driver.
  *
  * Semantics carried over from the reference:
  *  - chunked putAll of `batchSize` entries (Redis XADD pipeline of
  *    500, RedisStreamChangeConsumerConfig.java:21);
  *  - tombstone (null value) = delete (Kafka-compaction semantics);
  *  - ADMISSION CONTROL before each chunk, modeled on Redis'
  *    memory-threshold back-pressure (RedisMemoryThreshold.java:57-102):
  *    the estimated chunk bytes must fit under `memoryRatio` of the
  *    store's remaining memory, else wait-and-retry, else fail the
  *    task (Spark task retry + idempotent put = safe).
  */
final class ForeachKvSink(clientFactory: () => ForeachKvSink.KvClient,
                          batchSize: Int = 500,
                          memoryRatio: Double = 0.85,
                          admissionRetries: Int = 3,
                          sleeper: Long => Unit = Thread.sleep,
                          /** Redis stream message shapes
                            * (RedisStreamChangeConsumer.java:96-118):
                            * compact = value only; extended = value +
                            * headers in one JSON document. */
                          extendedFormat: Boolean = false)
    extends SinkConnector {
  import ForeachKvSink._

  override def name: String = "kv-foreach"
  override def tombstoneSupport: Boolean = true

  override def write(batch: DataFrame, epochId: Long): Unit = {
    val (cf, bs, ratio, retries, sl) =
      (clientFactory, batchSize, memoryRatio, admissionRetries, sleeper)
    val valueCol =
      if (extendedFormat)
        when(col("value").isNull, lit(null).cast("string"))
          .otherwise(to_json(struct(col("value").as("value"), col("headers").as("headers"))))
      else to_json(col("value"))
    batch.select(col("destination"), to_json(col("key")).as("k"), valueCol.as("v"))
      .foreachPartition { (rows: Iterator[Row]) =>
        if (rows.hasNext) {
          val client = cf()
          try {
            rows.grouped(bs).foreach { chunk =>
              val estBytes = chunk.iterator.map(r =>
                r.getString(1).length + (if (r.isNullAt(2)) 0 else r.getString(2).length)).sum.toLong
              ForeachKvSink.admit(client, estBytes, ratio, retries, sl)
              // batch CONSECUTIVE puts per destination, but flush before
              // any tombstone for that destination — a blind
              // puts-then-deletes split would apply a later re-insert
              // before an earlier delete and lose the row
              val pending = scala.collection.mutable.LinkedHashMap[String,
                scala.collection.mutable.ArrayBuffer[(String, String)]]()
              def flush(dest: String): Unit =
                pending.remove(dest).filter(_.nonEmpty).foreach(b => client.putAll(dest, b.toSeq))
              chunk.foreach { r =>
                val dest = r.getString(0)
                if (r.isNullAt(2)) { flush(dest); client.delete(dest, r.getString(1)) }
                else pending.getOrElseUpdate(dest,
                  scala.collection.mutable.ArrayBuffer()) += (r.getString(1) -> r.getString(2))
              }
              pending.keys.toSeq.foreach(flush)
            }
          } finally client.close()
        }
      }
  }

}

object ForeachKvSink {
  /** Minimal KV client contract; implementations must be created by a
    * serializable factory (one instance per partition per epoch). */
  trait KvClient extends AutoCloseable {
    def putAll(destination: String, entries: Seq[(String, String)]): Unit
    def delete(destination: String, key: String): Unit
    /** (used, max) bytes of the destination store, for admission;
      * (0, Long.MaxValue) when the store does not report memory. */
    def memory(): (Long, Long) = (0L, Long.MaxValue)
  }

  /** Executor-side admission gate (RedisMemoryThreshold.java:57-102
    * analog): wait while the store is near capacity, fail the task
    * when retries are exhausted. */
  private[sinks] def admit(client: KvClient, estBytes: Long, ratio: Double,
                           retries: Int, sl: Long => Unit): Unit = {
    var attempt = 0
    while (true) {
      val (used, max) = client.memory()
      if (max == Long.MaxValue || used + estBytes <= max * ratio) return
      attempt += 1
      if (attempt > retries)
        throw new IllegalStateException(
          s"store memory threshold exceeded: used=$used max=$max chunk=$estBytes")
      sl(100L * attempt)
    }
  }
}
