package graft.sinks

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import java.util.concurrent.ConcurrentHashMap
import scala.jdk.CollectionConverters._

/** In-memory key-value sink — the Infinispan/Redis semantic family:
  * batch putAll of key→value (InfinispanSinkConsumer.java:111-125),
  * tombstone = delete marker, per-destination namespaces (Redis stream
  * per destination, RedisStreamChangeConsumer.java:158-276).
  *
  * Values are the serialized record value (JSON string); a null value
  * with a non-null key deletes the entry (Kafka-compaction semantics).
  * Test double for any KV destination; `collect` happens here because
  * the store IS the driver-side map — a real KV sink keeps the same
  * write() shape but puts from executors via foreachPartition.
  */
final class KvSink extends SinkConnector {
  override def name: String = "kv"
  override def tombstoneSupport: Boolean = true

  private val stores = new ConcurrentHashMap[String, ConcurrentHashMap[String, String]]()

  override def write(batch: DataFrame, epochId: Long): Unit = {
    val rows = batch.select(
      col("destination"),
      to_json(col("key")).as("k"),
      to_json(col("value")).as("v")).collect()
    rows.foreach { r =>
      val store = stores.computeIfAbsent(r.getString(0), _ => new ConcurrentHashMap[String, String]())
      val k = r.getString(1)
      if (r.isNullAt(2)) store.remove(k) else store.put(k, r.getString(2))
    }
  }

  def get(destination: String, keyJson: String): Option[String] =
    Option(stores.get(destination)).flatMap(s => Option(s.get(keyJson)))

  def size(destination: String): Int =
    Option(stores.get(destination)).map(_.size).getOrElse(0)

  def destinations: Set[String] = stores.keys.asScala.toSet
}
