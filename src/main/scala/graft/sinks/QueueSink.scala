package graft.sinks

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.services.{Retry, RetryPolicy}

/** Queue-family delivery sink — the shared contract of the reference's
  * kinesis / sqs / sns / pubsub / pubsublite / rocketmq / rabbitmq
  * sinks, factored once:
  *
  *  - ORDERING KEY precedence: message-group header → record key →
  *    "null.key" (SnsChangeConsumer.java:221-228 header→key→default;
  *    KinesisChangeConsumer.java:156 key else null.key;
  *    PubSubChangeConsumer.java:257-285);
  *  - CHUNKING: ≤ maxBatchSize records per publish call (500 —
  *    KinesisChangeConsumerConfig.java:18,
  *    RedisStreamChangeConsumerConfig.java:21);
  *  - PARTIAL-FAILURE RESUBMIT: only the entries the service rejected
  *    are retried, with backoff, until clean or attempts exhausted
  *    (KinesisChangeConsumer.java:166-202) — Spark task retry alone
  *    would re-send the already-accepted entries.
  *
  * Delivery runs on EXECUTORS via foreachPartition, one client per
  * partition. Per-key ordering: route the upstream frame with
  * hash(key)→partition (functions.Portable.partitionFor, the EventHubs
  * pattern) so each ordering key lives in one partition, then the
  * within-partition record order is preserved through the chunk loop.
  */
object QueueSink {
  /** One outgoing message. */
  final case class Message(destination: String, orderingKey: String, payload: String)

  /** Queue client contract: publish a chunk, return per-message success
    * flags (partial failure = some false). Created per partition by a
    * serializable factory. */
  trait QueueClient extends AutoCloseable {
    def publish(messages: Seq[Message]): Seq[Boolean]
  }

  /** Header carrying an explicit message group / ordering key. */
  val OrderingKeyHeader = "message-group-id"

  /** Ordering-key column with the reference's precedence chain. */
  def orderingKey: Column =
    coalesce(element_at(col("headers"), OrderingKeyHeader),
             to_json(col("key")), lit("null.key"))

  /** Deterministic delivery plan: per destination, records are
    * sequenced by `orderCols` and packed into chunks of
    * `maxBatchSize` — the pure-DataFrame statement of the chunking
    * every queue sink performs, checkable against a SQL oracle
    * (cdc08). The runtime path chunks per partition instead (no
    * global window); this planner exists for bounded replays and
    * for auditing delivery geometry. */
  def planBatches(records: DataFrame, orderCols: Seq[Column], maxBatchSize: Int): DataFrame = {
    val w = Window.partitionBy(col("destination")).orderBy(orderCols: _*)
    records
      .withColumn("ordering_key", orderingKey)
      .withColumn("seq_no", row_number().over(w))
      .withColumn("chunk_id", ((col("seq_no") - 1) / maxBatchSize).cast("int"))
  }

  /** Chunk by record count AND estimated payload bytes — the EventHubs
    * BatchManager contract (debezium-server-eventhubs/.../BatchManager.java:
    * 22-…: per-partition EventDataBatch accumulation with size caps and
    * mid-batch flush when the next event doesn't fit). A single message
    * larger than the byte cap fails fast, like tryAdd rejecting an
    * oversized event. */
  private[sinks] def chunkBySize(ms: Iterator[Message], maxCount: Int,
                                 maxBytes: Long): Iterator[Seq[Message]] =
    new Iterator[Seq[Message]] {
      private val it = ms.buffered
      override def hasNext: Boolean = it.hasNext
      override def next(): Seq[Message] = {
        val chunk = scala.collection.mutable.ArrayBuffer[Message]()
        var bytes = 0L
        var full = false
        while (!full && it.hasNext && chunk.length < maxCount) {
          val sz = it.head.payload.length.toLong
          if (sz > maxBytes)
            throw new IllegalArgumentException(
              s"single message of $sz bytes exceeds the $maxBytes-byte batch cap")
          if (chunk.nonEmpty && bytes + sz > maxBytes) full = true // mid-batch flush
          else { chunk += it.next(); bytes += sz }
        }
        chunk.toSeq
      }
    }

  /** Resubmit loop over one chunk: retries ONLY failed entries.
    * Exposed for direct unit testing. */
  private[sinks] def publishChunk(client: QueueClient, chunk: Seq[Message],
                                  retry: RetryPolicy, sleeper: Long => Unit): Unit = {
    var pending = chunk
    var interval = retry.initialIntervalMs
    var attempt = 1
    while (pending.nonEmpty) {
      val results = client.publish(pending)
      require(results.length == pending.length, "client returned wrong result count")
      val failed = pending.zip(results).collect { case (m, false) => m }
      if (failed.isEmpty) return
      if (attempt >= retry.maxAttempts)
        throw new RuntimeException(
          s"queue delivery failed for ${failed.length}/${chunk.length} entries after $attempt attempts")
      sleeper(interval)
      interval = math.min((interval * retry.multiplier).toLong, retry.maxIntervalMs)
      attempt += 1
      pending = failed
    }
  }
}

final class QueueSink(clientFactory: () => QueueSink.QueueClient,
                      maxBatchSize: Int = 500,
                      maxBatchBytes: Long = 1L << 20, // EventHubs-style size cap
                      retry: RetryPolicy = RetryPolicy(maxAttempts = 5, initialIntervalMs = 10),
                      sleeper: Long => Unit = Thread.sleep)
    extends SinkConnector {
  import QueueSink._

  override def name: String = "queue"
  override def tombstoneSupport: Boolean = false

  override def write(batch: DataFrame, epochId: Long): Unit = {
    val (cf, mb, mbb, rp, sl) = (clientFactory, maxBatchSize, maxBatchBytes, retry, sleeper)
    batch.select(col("destination"), orderingKey.as("okey"), to_json(col("value")).as("payload"))
      .foreachPartition { (rows: Iterator[Row]) =>
        if (rows.hasNext) {
          val client = cf()
          try {
            chunkBySize(rows.map(r => Message(r.getString(0), r.getString(1), r.getString(2))), mb, mbb)
              .foreach(chunk => publishChunk(client, chunk, rp, sl))
          } finally client.close()
        }
      }
  }
}
